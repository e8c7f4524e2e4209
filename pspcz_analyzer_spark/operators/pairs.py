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
