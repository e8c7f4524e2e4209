"""Table profiling: per-column completeness / cardinality / range stats.

The reference eyeballs data health ad hoc (row counts logged at ingest,
``services/data_reader.py:331-376``); a cluster-scale engine wants it as
one operator: a single aggregation pass over the table produces one row
per column with null counts, cardinality, and min/max.

Scale design: ALL per-column statistics compute in ONE ``agg`` (one scan,
partial map-side aggregation). Exact ``countDistinct`` over p columns
makes Catalyst EXPAND the input p-fold before the shuffle — fine for a
handful of columns, deliberate; ``approx=True`` (default) swaps in
HyperLogLog ``approx_count_distinct`` which aggregates all columns with
NO expand and constant memory — the 100 TB path. The wide one-row result
then unpivots to long form with ``stack`` (driver-side-free).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def hot_keys(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Top-k heaviest keys with their share of all rows — the skew probe
    run before deciding to salt a join/aggregation on ``key_col``
    (operators/skew.py::salted_join; AQE handles runtime skew, but a
    standing 'key X is 30% of the fact table' is a layout decision).

    One key-keyed aggregate (map-side combined); the scalar total comes
    from a separate count aggregate on the INPUT, which broadcasts back as
    a one-row join. For the typical probe target (a Parquet scan) that
    second pass is column-pruned to zero columns — row-group metadata
    counts, near-free — and it keeps this function persistence-free: an
    earlier version persisted the counted aggregate to share it between
    the two branches and leaked cached partitions for the session
    lifetime. Callers probing an EXPENSIVE derived frame should persist it
    themselves around the call. Ties break by key for a deterministic
    top-k.
    """
    counted = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("row_share"),
        )
        .orderBy(F.desc("n_rows"), F.asc(key_col))
        .limit(k)
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = True,
) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_val, max_val); min/max rendered as strings so mixed column types
    share one schema."""
    cols = columns or df.columns
    distinct_of = F.approx_count_distinct if approx else F.countDistinct
    exprs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        exprs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct_of(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*exprs)
    parts = ", ".join(
        f"'{c}', __rows, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {parts}) as "
            "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )


def count_min_sketch(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024, salt: str = "cms"
) -> DataFrame:
    """Count-min sketch of ``key_col``'s frequency distribution (Cormode &
    Muthukrishnan 2005): ``d`` hash rows x ``w`` buckets, each cell the
    count of rows hashing there. The fixed-size (d x w) summary answers
    "how often does key X occur" with one-sided error (estimate >= truth,
    overshoot bounded by collisions ~ n/w per row, min over d rows) —
    the standing frequency monitor for a 100 TB stream/ingest where an
    exact per-key count table is itself corpus-sized state.

    Mergeability is the point at scale: sketches of two corpus shards (or
    two ingestion days) SUM cell-wise into the sketch of their union —
    compose with an incremental pipeline by storing one tiny sketch per
    batch. Hashes are the engine-reproducible md5 idiom, so a DuckDB
    oracle replays the build bit-for-bit. ONE explode (d rows per input
    row) + one (row, bucket) aggregate, map-side combined; output is
    exactly d*w cells or fewer (empty cells omitted — they mean 0).
    """
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("__i"), F.col(key_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % w
    )
    return (
        df.select(key_col)
        .withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(d - 1))))
        .withColumn("__b", b)
        .groupBy(F.col("__i").alias("row_idx"), F.col("__b").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Frequency estimates for ``keys`` from a :func:`count_min_sketch`
    built with the SAME (d, w, salt): per key, min over the d cells its
    hashes land in (missing cell = 0). The sketch (<= d*w rows) is
    broadcast — estimating any number of keys never shuffles them.
    Returns (key_col, est_count) with the CMS guarantee
    est_count >= true count."""
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("__i"), F.col(key_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % w
    )
    probes = (
        keys.select(key_col)
        .distinct()
        .withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(d - 1))))
        .withColumn("__b", b)
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (F.col("__i") == F.col("row_idx")) & (F.col("__b") == F.col("bucket")),
            "left",
        )
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def histogram(
    df: DataFrame, col: str, bins: int = 20
) -> DataFrame:
    """Equi-width histogram of a numeric column: ONE pass for the
    (min, max) range (broadcast back as a one-row aggregate — the repo's
    standing scalar pattern), one map-side-combined bin count, densified
    on a bin spine so empty bins report 0 (a histogram with silent holes
    misreads as a different distribution). The profiling primitive behind
    quality-score/length/perplexity distribution dashboards at corpus
    scale — two scans, no UDF, no window.

    Bin ``i`` covers [min + i*w, min + (i+1)*w) with w = (max-min)/bins;
    the max value itself lands in the last bin (standard clamp). A
    constant column degenerates to all rows in bin 0. Returns
    (bin, bin_lo, bin_hi, n) with edges rounded to 6.
    """
    rng = df.agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
    )
    spark = df.sparkSession
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    w = (F.col("__hi") - F.col("__lo")) / bins
    binned = (
        df.select(F.col(col).cast("double").alias("__x"))
        .crossJoin(F.broadcast(rng))
        .select(
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("__x") - F.col("__lo")) / w).cast("int"),
                    F.lit(bins - 1),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(binned, "bin", "left")
        .crossJoin(F.broadcast(rng))
        .select(
            "bin",
            F.round(F.col("__lo") + F.col("bin") * w, 6).alias("bin_lo"),
            F.round(F.col("__lo") + (F.col("bin") + 1) * w, 6).alias("bin_hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("bin")
    )


def equidepth_histogram(
    df: DataFrame, col: str, buckets: int = 10
) -> DataFrame:
    """Equi-DEPTH (equal-frequency) histogram: decile-style buckets each
    holding ~1/``buckets`` of the rows — the histogram optimizers and
    drift monitors actually keep, because equi-width bins collapse under
    skew (one bin takes 90% of a long-tailed column; see the equi-width
    twin :func:`histogram`).

    Scale shape: NO global sort/ntile (a partition-less window is a
    single-task funnel at any scale). Boundaries come from ONE exact
    ``percentile`` aggregate (swap ``percentile_approx`` for the KLL
    sketch at 100 TB — same plan), broadcast back as a one-row frame;
    bucket id is a codegen'd sum of strict comparisons against the
    boundaries; per-bucket count/min/max is one map-side-combined
    aggregate. Boundary ties go to the LOWER bucket (strict >), so
    heavy repeated values keep buckets deterministic, if uneven —
    inherent to equi-depth under ties. Returns
    (bucket 1-based, n, round(lo,6), round(hi,6)).
    """
    fracs = [i / buckets for i in range(1, buckets)]
    bnd = df.agg(
        F.percentile(F.col(col).cast("double"), F.array(*[F.lit(f) for f in fracs])).alias(
            "__b"
        )
    )
    x = F.col("__x")
    bucket = F.lit(1)
    for i in range(len(fracs)):
        bucket = bucket + F.when(x > F.element_at(F.col("__b"), i + 1), 1).otherwise(0)
    return (
        df.select(F.col(col).cast("double").alias("__x"))
        .crossJoin(F.broadcast(bnd))
        .select(bucket.alias("bucket"), "__x")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("__x"), 6).alias("lo"),
            F.round(F.max("__x"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


def hll_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """One Apache DataSketches HLL sketch per key group: (key_cols...,
    hll_sketch BINARY) — the STORABLE form of a distinct count.

    This is the mergeable-distinct primitive for corpus-scale profiling:
    a sketch is ``2^lg_k`` registers (lg_k=14 -> 16 KiB, ~0.8 % relative
    standard error) that aggregates map-side with constant memory, and
    sketches of two table shards / ingestion days UNION into the sketch
    of their union (register-wise max — associative, commutative, no
    rescan). Persist one row per (group, day) and "distinct users ever"
    stays a query over day-count rows, never a rescan of 100 TB of
    history; late data appends one more sketch row. Exact
    ``count_distinct`` by contrast shuffles every distinct value and
    cannot be incrementally maintained without keeping the value set.

    The binary column round-trips through parquet; merge stored sketches
    with :func:`hll_estimate_from`.
    """
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def hll_estimate_from(
    sketches: DataFrame,
    key_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """(key_cols..., n_distinct_est) from stored sketch rows — one
    ``hll_union_agg`` per key group over however many slices were stored.

    Estimate caveat, measured on this Spark build: the union path targets
    the HLL_8 register representation while a direct sketch estimates from
    HLL_4, so a merged estimate can differ from the direct estimate of the
    same stream by a fraction of the error bound (e.g. 9118 vs 9106 on a
    ~9.2k-cardinality probe). Both stay inside the lg_k error envelope of
    the truth; treat them as the SAME number at sketch precision, not as
    bit-equal (asserted with tolerances in test_profile.py).
    """
    return sketches.groupBy(*key_cols).agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg(sketch_col)), 0)
        .cast("long")
        .alias("n_distinct_est")
    )


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group distinct estimate in one pass: (key_cols...,
    n_distinct_est). Composition of :func:`hll_sketches` +
    estimate; use those two directly when the sketches should be stored."""
    return df.groupBy(*key_cols).agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg(value_col, F.lit(lg_k))), 0)
        .cast("long")
        .alias("n_distinct_est")
    )


def quantile_scores(
    df: DataFrame, cols: "list[str]", buckets: int = 5
) -> DataFrame:
    """Per-row 1..``buckets`` quantile score for EACH of ``cols`` —
    the segmentation primitive behind RFM and any score-into-quintiles
    analysis. Same scale shape as :func:`equidepth_histogram` (whose
    boundary parity with DuckDB's quantile_cont is already pinned):
    ONE exact percentile aggregate computes every column's boundaries
    together, broadcasts back as a one-row frame, and each score is a
    codegen'd sum of strict comparisons — no ntile, no global window,
    no per-column pass. Ties at a boundary go to the LOWER bucket
    (strict >). Swap percentile for percentile_approx/KLL at 100 TB —
    the plan shape is unchanged."""
    fracs = [i / buckets for i in range(1, buckets)]
    bnd = df.agg(
        *[
            F.percentile(
                F.col(c).cast("double"),
                F.array(*[F.lit(f) for f in fracs]),
            ).alias(f"__b_{c}")
            for c in cols
        ]
    )
    out = df.crossJoin(F.broadcast(bnd))
    for c in cols:
        score = F.lit(1)
        for i in range(len(fracs)):
            score = score + F.when(
                F.col(c).cast("double") > F.element_at(F.col(f"__b_{c}"), i + 1),
                1,
            ).otherwise(0)
        out = out.withColumn(f"{c}_score", score.cast("int"))
    return out.drop(*[f"__b_{c}" for c in cols])


def population_stability(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — THE drift monitor run between a model's training
    distribution and what production currently feeds it (rule of thumb:
    <0.1 stable, 0.1-0.25 drifting, >0.25 retrain). Equi-width buckets
    over the COMBINED min/max (one scalar aggregate per side, broadcast)
    so both periods bin identically; per-bucket shares are floored at
    ``eps`` (the standard guard — an empty bucket would send ln to
    infinity); contribution = (p - q) * ln(p / q), always >= 0 per
    bucket. Returns one row per bucket (bucket, share_a, share_b,
    psi_term) — sum psi_term for the scalar; keeping the terms shows
    WHERE the distribution moved. Two scans + two bucket aggregates,
    everything else broadcast; the same mergeable shape as
    :func:`histogram`, so per-day sketch rows compose upstream."""
    lo_a, hi_a = "__lo_a", "__hi_a"
    span = (
        df_a.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        )
        .unionByName(
            df_b.agg(
                F.min(F.col(col).cast("double")).alias("lo"),
                F.max(F.col(col).cast("double")).alias("hi"),
            )
        )
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
    )

    def shares(df: DataFrame, name: str) -> DataFrame:
        x = F.col(col).cast("double")
        width = (F.col("hi") - F.col("lo")) / buckets
        b = F.least(
            F.lit(buckets),
            F.greatest(
                F.lit(1),
                (F.floor((x - F.col("lo")) / width) + 1).cast("int"),
            ),
        )
        counted = (
            df.crossJoin(F.broadcast(span))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        total = df.agg(F.count(F.lit(1)).alias("__t"))
        return counted.crossJoin(F.broadcast(total)).select(
            "bucket", (F.col("__n") / F.col("__t")).alias(name)
        )

    grid = span.select(
        F.explode(F.sequence(F.lit(1), F.lit(buckets))).alias("bucket")
    )
    a, b = shares(df_a, "__sa"), shares(df_b, "__sb")
    p = F.greatest(F.coalesce("__sa", F.lit(0.0)), F.lit(eps))
    q = F.greatest(F.coalesce("__sb", F.lit(0.0)), F.lit(eps))
    return (
        grid.join(a, "bucket", "left")
        .join(b, "bucket", "left")
        .select(
            "bucket",
            F.round(p, 6).alias("share_a"),
            F.round(q, 6).alias("share_b"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )
