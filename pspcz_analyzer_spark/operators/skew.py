"""Skew mitigation: salted joins for pathological key distributions.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one join key dominates so
hard that even split partitions bottleneck (the classic null-key or
celebrity-key case at 100 TB).

Shape: the big side's rows get a deterministic salt in [0, n) derived by
hashing designated columns (no rand() — plans stay reproducible); the
small side is replicated once per salt value; the join key becomes
(key, salt), so one hot key spreads over n shuffle partitions. Result
rows are identical to the unsalted join — only the physical distribution
changes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Join with the big side salted and the small side replicated
    ``num_salts``x. ``salt_from`` names the big-side columns hashed into
    the salt (default: all of them — any per-row-varying subset works)."""
    salt_cols = salt_from or big.columns
    b = big.withColumn(_SALT, F.pmod(F.xxhash64(*salt_cols), F.lit(num_salts)))
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i).cast("long") for i in range(num_salts)]))
    )
    return b.join(s, [*on, _SALT], how).drop(_SALT)
