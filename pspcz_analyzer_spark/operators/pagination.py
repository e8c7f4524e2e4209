"""Top-k and pagination (SURVEY O1-O5).

The reference paginates with sort + slice(offset, per_page) and computes
total_pages from the frame height
(/root/reference/pspcz_analyzer/services/votes_service.py:171-177). Offset
pagination is fine for shallow UI pages; the keyset variant is the pattern
that survives deep pagination at 100 TB (no skip-scan of offset rows).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Spark runs this as TakeOrderedAndProject — per-partition
    heaps + single merge, no full sort shuffle. ``order_by`` must be a total
    order for deterministic results (append a key column)."""
    return df.orderBy(*order_by).limit(k)


def page_offset(
    df: DataFrame, order_by: Sequence[Column], page: int, per_page: int
) -> DataFrame:
    """Offset pagination: 1-based ``page`` of size ``per_page``."""
    return df.orderBy(*order_by).offset((page - 1) * per_page).limit(per_page)


def page_keyset(
    df: DataFrame,
    key: str,
    per_page: int,
    after: int | None = None,
    descending: bool = True,
) -> DataFrame:
    """Keyset pagination on a unique key: WHERE key < last_seen LIMIT n.

    O(page) instead of O(offset+page); the predicate pushes into the Parquet
    scan (min/max row-group pruning), which offset pagination cannot do.
    """
    out = df
    if after is not None:
        out = out.filter(F.col(key) < after if descending else F.col(key) > after)
    order = F.col(key).desc() if descending else F.col(key).asc()
    return out.orderBy(order).limit(per_page)
