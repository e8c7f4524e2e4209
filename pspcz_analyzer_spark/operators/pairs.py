"""Unordered self-join pairs (SURVEY J7) and pairwise agreement rates.

The reference builds unordered party pairs per vote by self-joining the
party-majority frame on id_hlasovani and keeping party < party_b
(/root/reference/pspcz_analyzer/services/amendments/coalition_service.py:70-74),
then averages agreement per pair (:76-87). These generalize to any
(group_key, member, value) relation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def unordered_pairs(
    df: DataFrame,
    group_key: str | list[str],
    member_col: str,
    value_cols: list[str] | None = None,
    suffix: str = "_b",
) -> DataFrame:
    """All unordered member pairs within each group.

    Join on the group key, keep ``member < member_b`` — each pair appears
    exactly once. The join shuffles on the group key only; pair explosion is
    per-group (quadratic in group size — fine for small groups like
    parties-per-vote; cap or sample upstream for pathological groups).
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    value_cols = value_cols or []
    cols = keys + [member_col] + value_cols
    a = df.select(*cols)
    b = df.select(
        *keys, *[F.col(c).alias(f"{c}{suffix}") for c in [member_col, *value_cols]]
    )
    return a.join(b, on=keys).filter(F.col(member_col) < F.col(f"{member_col}{suffix}"))


def pair_agreement(
    pairs: DataFrame,
    member_col: str,
    value_col: str,
    suffix: str = "_b",
    rate_col: str = "agreement_rate",
) -> DataFrame:
    """Per unordered pair: mean of (value == value_b) over shared groups.

    Mirrors the coalition agreement-rate aggregate
    (/root/reference/pspcz_analyzer/services/amendments/coalition_service.py:76-87).
    """
    agree = (F.col(value_col) == F.col(f"{value_col}{suffix}")).cast("double")
    return pairs.groupBy(member_col, f"{member_col}{suffix}").agg(
        F.round(F.avg(agree), 6).alias(rate_col),
        F.count(F.lit(1)).alias("shared_groups"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 5,
    bucket_len: int = 1,
    bucket_expr: "F.Column | None" = None,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernández & Stolfo
    1995): candidate pairs are exactly the rows within ``window``
    positions of each other in the GLOBAL (key, id) sort order — the
    classic linear-candidate alternative to an n² comparison, feeding a
    fuzzy scorer (see ``operators/joins.py::fuzzy_best_match``)
    downstream.

    The distributed shape avoids both a global sort and a partition-less
    rank window (either one funnels the table through one task):

    1. rows bucket by the key's first ``bucket_len`` chars; per-bucket
       counts — bounded by the alphabet, a metadata-sized frame — are
       collected once and turned into cumulative OFFSETS, broadcast back;
    2. global_rank = bucket offset + row_number within the bucket
       (a properly partitioned window);
    3. pairing is an EQUI-join on rank-block ``floor(rank / window)``:
       a pair at distance <= window spans at most adjacent blocks, so the
       left side emits its block and successor, the right side its block,
       and the band filter ``0 < rank_b - rank_a <= window`` finishes the
       job. Fanout is 2x rows into a join whose key is uniform by
       construction (block = contiguous rank range) — no hot keys, no
       theta-join, regardless of how skewed the key distribution is.

    Returns (id_a, id_b, key_a, key_b, rank_a, rank_b), each unordered
    pair once (rank_a < rank_b). Deterministic: ties in the sort order
    are broken by ``id_col``.

    ``bucket_expr`` overrides the default first-``bucket_len``-chars
    bucketing; it MUST be a monotone prefix function of the sort key
    (equal bucket => equal leading key bytes, bucket order = key order) —
    e.g. a digit slice of fixed-width keys that share a constant prefix.
    Buckets affect only the physical plan, never pair membership.
    """
    b = (
        bucket_expr if bucket_expr is not None
        else F.substring(F.col(key_col), 1, bucket_len)
    ).alias("__bkt")
    base = df.select(F.col(id_col), F.col(key_col), b)
    counts = sorted(
        (r["__bkt"], r["n"])
        for r in base.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for bkt, n in counts:
        offsets.append((bkt, acc))
        acc += n
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets, f"__bkt string, __off long")
    )
    from pyspark.sql import Window

    from pyspark import StorageLevel

    # Persisted: the ranked frame feeds both sides of the rank-block join;
    # without it the bucket window executes twice (repo convention:
    # persist shared subtrees).
    ranked = (
        base.join(off, "__bkt")
        .withColumn(
            "__rank",
            F.col("__off")
            + F.row_number().over(
                Window.partitionBy("__bkt").orderBy(F.col(key_col), F.col(id_col))
            ),
        )
        .select(id_col, key_col, "__rank")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    blk = F.floor(F.col("__rank") / F.lit(window))
    left = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col(key_col).alias("key_a"),
        F.col("__rank").alias("rank_a"),
        F.explode(F.array(blk, blk + 1)).alias("__blk"),
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col(key_col).alias("key_b"),
        F.col("__rank").alias("rank_b"),
        blk.alias("__blk"),
    )
    d = F.col("rank_b") - F.col("rank_a")
    return (
        left.join(right, "__blk")
        .filter((d > 0) & (d <= window))
        .select("id_a", "id_b", "key_a", "key_b", "rank_a", "rank_b")
    )
