"""Ingestion jobs: UNL landing files -> the period-partitioned Parquet lake.

The reference's startup path downloads per-period ZIPs, parses UNL, and
caches Parquet per period
(/root/reference/pspcz_analyzer/services/data_reader.py:169-376); SURVEY
§1 maps that to ONE lake where every fact table carries a ``period``
column and is written ``partitionBy("period")`` — per-period queries then
partition-prune instead of choosing files, and all-period queries are the
same plan without a union loop.

Download/extract (S5/S6) stay out-of-engine per SURVEY; this job starts
from extracted UNL files on disk.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.sources.unl import read_unl

# Tables that are per-period facts (get the period column + partitioning);
# the rest are shared dimensions written unpartitioned.
PERIOD_TABLES = ("hl_hlasovani", "hl_poslanec", "zmatecne")


def ingest_period_tables(
    spark: SparkSession,
    files: dict[str, str | list[str]],
    out_dir: str,
    period: int,
) -> dict[str, int]:
    """Parse the given UNL files (table -> path/glob) for one period and
    merge them into the lake at ``out_dir``. Returns rows written per table.

    Period facts land in ``<out>/<table>/period=<p>/`` via dynamic
    partition overwrite — re-ingesting a period replaces exactly that
    partition, other periods' files are untouched (the reference's
    per-period cache invalidation, lake-shaped).
    """
    counts: dict[str, int] = {}
    for table, path in files.items():
        df = read_unl(spark, path, table=table)
        target = os.path.join(out_dir, table)
        if table in PERIOD_TABLES:
            out = df.withColumn("period", F.lit(period))
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("period")
                .parquet(target)
            )
        else:
            df.write.mode("overwrite").parquet(target)
        counts[table] = spark.read.parquet(target).filter(
            F.lit(True) if table not in PERIOD_TABLES else F.col("period") == period
        ).count()
    return counts


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a fact as a bucketed managed table (Hive-style layout).

    Two facts bucketed on their join key with the same bucket count
    co-locate: Spark plans their join WITHOUT a shuffle on either side
    (verified in tests — no Exchange under the SortMergeJoin). At 100 TB
    this converts the dominant per-query cost of a fact-fact join into a
    one-time layout decision at ingest.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A recycled/fresh session may have lost the catalog entry while the
    # managed LOCATION survived on disk; saveAsTable refuses to adopt an
    # orphan directory (LOCATION_ALREADY_EXISTS), so clear it first.
    import os as _os
    import shutil as _shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    _shutil.rmtree(_os.path.join(wh, table.lower()), ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    col: str,
    num_partitions: int = 16,
) -> None:
    """Persist with a range-partitioned, within-file-sorted layout on
    ``col`` — the lake-layout analog of a clustered index.

    ``repartitionByRange`` gives each output file a DISJOINT ``col``
    range; ``sortWithinPartitions`` orders rows inside each file so every
    Parquet row group's min/max stats span a narrow slice. A range
    predicate on ``col`` then skips whole files and whole row groups via
    pushed-down stats filtering — at 100 TB, a one-day query over a
    year-sorted events lake reads ~1/365th of the bytes instead of
    scanning everything. Write-side cost is one range-exchange (sampled
    boundaries), paid once at ingest.
    """
    (
        df.repartitionByRange(num_partitions, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def load_lake_table(
    spark: SparkSession, out_dir: str, table: str, period: int | None = None
) -> DataFrame:
    """Read a lake table; a period filter on a partitioned fact prunes to
    one directory (PartitionFilters in the scan)."""
    df = spark.read.parquet(os.path.join(out_dir, table))
    if period is not None and "period" in df.columns:
        df = df.filter(F.col("period") == period)
    return df


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 12
) -> "tuple[DataFrame, str]":
    """Attach a Z-order (Morton) key over ``cols`` as column ``__z``.

    Each column is min/max-scaled to a ``bits``-bit integer rank (one tiny
    stats job at write time), then the ranks' bits are interleaved with a
    shift/or expression chain — pure built-ins, fully codegen'd, no UDF.
    Rows close in Z-value are close in EVERY listed dimension, which is
    what makes the multi-column layout below prune on any of them.
    """
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    n = len(cols)
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo = float(stats[f"lo_{c}"] or 0)
        hi = float(stats[f"hi_{c}"] or 0)
        span = (hi - lo) or 1.0
        rank = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top),
            ),
        ).cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(rank, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return df.withColumn("__z", z), "__z"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_partitions: int = 16,
) -> None:
    """Persist with a Z-ordered layout over MULTIPLE columns — the
    multi-dimensional extension of :func:`write_range_sorted`.

    A single-column sort gives disjoint ranges on ONE key; every file
    still spans the FULL range of the others, so predicates on them skip
    nothing. Interleaving the columns' bits makes each output file a
    narrow bounding BOX in every listed dimension: its Parquet min/max
    stats on each column cover a fraction of that column's domain, and a
    point/box predicate on ANY of the columns skips files and row groups
    via the same pushed stats filtering. This is the layout trade behind
    Delta/Iceberg OPTIMIZE ZORDER — here as one range-exchange on the
    Morton key, paid once at ingest. Writers choose ``cols`` as the 2-4
    most-filtered dimensions; more than ~4 dilutes every dimension's
    selectivity (the bits budget splits n ways).
    """
    keyed, zcol = zorder_value(df, cols, bits)
    (
        keyed.repartitionByRange(num_partitions, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def merge_incremental_agg(
    spark: SparkSession,
    summary_path: str,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    applied_marker: str | None = None,
) -> None:
    """Incrementally maintain a per-key additive summary (sum_* + cnt)
    under new data — the 100 TB pattern where re-aggregating the full
    history per batch is the bottleneck.

    The stored state is MERGEABLE (sums and counts; derive averages at
    read time): partial-aggregate the delta, union with the existing
    summary rows, re-aggregate — the plan scans ONLY the delta and the
    (key-cardinality-sized) summary, never the history. The refreshed
    snapshot stages next to the target and swaps in crash-recoverably
    (sources/sinks.py::_swap_in), so a failed batch never leaves a
    half-merged summary and the merge is idempotent per delta batch
    applied exactly once (streaming/corpus.py shows the foreachBatch +
    checkpoint wrapper that guarantees that).
    """
    from pspcz_analyzer_spark.sources.sinks import _swap_in

    partial = delta.groupBy(*keys).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("cnt"),
    )
    if os.path.exists(summary_path):
        existing = spark.read.parquet(summary_path)
        partial = existing.unionByName(partial)
    merged = partial.groupBy(*keys).agg(
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("cnt").alias("cnt"),
    )
    import glob as _glob
    import uuid as _uuid

    stage = f"{summary_path}.__stage_{_uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(stage)
    # Replay protection for at-least-once callers (streaming foreachBatch):
    # applied-batch markers are underscore-prefixed files INSIDE the summary
    # directory, so they swap in atomically WITH the data they describe — a
    # crash can never commit the merge without its marker or vice versa.
    # Existing markers carry forward; Spark ignores _-prefixed files.
    if applied_marker is not None:
        for m in _glob.glob(os.path.join(summary_path, "_applied_*")):
            open(os.path.join(stage, os.path.basename(m)), "w").close()
        open(os.path.join(stage, f"_applied_{applied_marker}"), "w").close()
    _swap_in(stage, summary_path)


def has_applied_marker(summary_path: str, marker: str) -> bool:
    """True iff ``merge_incremental_agg`` already committed this marker —
    the caller-side replay check for at-least-once delivery."""
    return os.path.exists(os.path.join(summary_path, f"_applied_{marker}"))


def _pre_commit_crash_gate() -> None:
    """Test-only fault injection: when PSPCZ_TEST_CRASH_BEFORE_COMMIT is
    set, die as hard as a SIGKILL (os._exit skips every cleanup handler)
    at the instant between stage-build and the _swap_in commit. The
    crash-safety tests run the lake ops in a subprocess with this set and
    assert the table still serves the ORIGINAL complete file set."""
    if os.environ.get("PSPCZ_TEST_CRASH_BEFORE_COMMIT"):
        os._exit(137)


def _link_or_copy(src: str, dst: str) -> None:
    """Hard-link (free, same filesystem) with a copy fallback for
    filesystems that refuse links."""
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _commit_rewrite(
    path: str,
    keep_files: "list[str]",
    staged_files: "list[str]",
    prefix: str,
) -> None:
    """Commit a partial-rewrite of a Parquet directory with NO destructive
    step outside one atomic rename: build the COMPLETE post-op directory
    in a sibling stage (hard-links for the untouched files — zero IO —
    plus renames of the freshly-written replacement files), then swap it
    in via sinks._swap_in. Every crash point leaves a full consistent
    snapshot on disk: before the swap the original dir is untouched;
    during the swap both complete copies exist; after it only the new one
    does. This is the local-FS analog of a Delta/Iceberg commit (new
    manifest referencing old + new files, published in one pointer flip).
    """
    import uuid as _uuid

    from pspcz_analyzer_spark.sources.sinks import _swap_in

    entries = os.listdir(path)
    if "_manifest" in entries:
        # The swap would rebuild the directory UNDER the manifest's feet:
        # its committed versions reference data files this op just
        # replaced. Manifest tables must use the manifest-committed twins
        # (manifest.delete_keys / compact_small_files / optimize_zorder).
        raise ValueError(
            f"{path} is a manifest table; swap-committed rewrites would "
            "orphan its committed versions — use the manifest.* ops"
        )
    stage = f"{path}.__commit_{_uuid.uuid4().hex[:8]}"
    os.makedirs(stage)
    for f in keep_files:
        _link_or_copy(f, os.path.join(stage, os.path.basename(f)))
    # Sidecars (_SUCCESS, _applied_* markers, any non-parquet payload)
    # must survive the swap — the pre-stage directory rebuild replaces
    # the WHOLE dir, so anything not explicitly carried over is dropped.
    for e in entries:
        if e.endswith(".parquet"):
            continue  # data files: kept via keep_files, victims replaced
        src, dst = os.path.join(path, e), os.path.join(stage, e)
        if os.path.isdir(src):
            shutil.copytree(src, dst, copy_function=_link_or_copy)
        else:
            _link_or_copy(src, dst)
    for i, f in enumerate(staged_files):
        os.rename(f, os.path.join(stage, f"{prefix}_{_uuid.uuid4().hex[:8]}_{i}.parquet"))
    _pre_commit_crash_gate()
    _swap_in(stage, path)


def _file_may_contain(
    f: str, key_col: str, key_set: set, open_parquet=None
) -> bool:
    """Driver-side footer-stats pruning: False only when every row group's
    [min, max] range on ``key_col`` provably misses every key (metadata
    read, no data IO). Shared by the swap-committed and manifest-committed
    delete paths; ``open_parquet`` (default local pyarrow) lets the
    manifest path read footers through its fs shim on object stores."""
    import pyarrow.parquet as pq

    meta = (open_parquet or pq.ParquetFile)(f).metadata
    if meta.num_row_groups == 0:
        return False  # zero rows: cannot contain any key
    ci = next(
        (
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == key_col
        ),
        None,
    )
    if ci is None:
        return True  # column missing from stats -> cannot prune
    for g in range(meta.num_row_groups):
        st = meta.row_group(g).column(ci).statistics
        if st is None or st.min is None:
            return True
        # None keys skip the compare: NULL never equi-matches (and
        # None <= str raises TypeError on a mixed key set).
        if any(k is not None and st.min <= k <= st.max for k in key_set):
            return True
    return False


def delete_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: "list",
) -> "tuple[int, int]":
    """Targeted key deletion (the right-to-be-forgotten job): rewrite ONLY
    the files that can contain the keys, leave the rest untouched.

    At 100 TB a delete that rewrites the whole table is a non-starter; on
    a :func:`write_range_sorted` / :func:`write_zordered` layout the
    victim keys cluster into a handful of files, and every Parquet footer
    already carries per-column min/max. Footer stats are read driver-side
    (pyarrow, metadata-only — no data IO), files whose [min, max] range
    misses every key are skipped outright, and the affected files are
    re-read with an isin anti-filter and swapped for their rewrites.

    Crash semantics (:func:`_commit_rewrite`): the complete post-delete
    directory is assembled in a sibling stage (untouched files hard-linked
    in — no data IO — and the rewrites moved in), then published with one
    crash-recoverable swap. No original file is removed before the swap,
    so every failure point serves either the full pre-delete or the full
    post-delete file set — never a partial table. Idempotent: a re-run's
    filter finds nothing left to delete.

    Returns (files_rewritten, rows_deleted).
    """
    import glob as _glob
    import uuid as _uuid

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    key_set = set(keys)
    affected = [f for f in files if _file_may_contain(f, key_col, key_set)]
    if not affected:
        return 0, 0
    src = spark.read.parquet(*affected)
    from pspcz_analyzer_spark.manifest import ISIN_LITERAL_LIMIT

    # None keys never equi-match — and a None literal in the NEGATED
    # isin would three-value-NULL the predicate and drop every row.
    key_set = {k for k in key_set if k is not None}
    if not key_set:
        return 0, 0
    if len(key_set) <= ISIN_LITERAL_LIMIT:
        # isNull arm: NULL-keyed data rows survive (three-valued ~isin
        # would silently drop them on this path only).
        kept = src.filter(
            ~F.col(key_col).isin(*key_set) | F.col(key_col).isNull()
        )
    else:
        # Above the measured In-AST knee (~0.5 ms/literal plan build):
        # anti-join a keys frame instead of a key-shaped expression.
        keys_df = spark.createDataFrame(
            [(k,) for k in key_set], src.select(key_col).schema
        )
        kept = src.join(keys_df, key_col, "left_anti")
    rewrite = f"{path}.__delete_{_uuid.uuid4().hex[:8]}"
    kept.write.mode("overwrite").parquet(rewrite)
    staged = sorted(_glob.glob(os.path.join(rewrite, "*.parquet")))
    # Row accounting from footers alone — no extra Spark actions.
    rows_before = sum(pq.ParquetFile(f).metadata.num_rows for f in affected)
    rows_after = sum(pq.ParquetFile(f).metadata.num_rows for f in staged)
    deleted = rows_before - rows_after
    untouched = [f for f in files if f not in set(affected)]
    _commit_rewrite(path, untouched, staged, "del")
    shutil.rmtree(rewrite, ignore_errors=True)
    return len(affected), deleted


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_col: "str | None" = None,
) -> "tuple[int, int]":
    """Small-file compaction (the OPTIMIZE job of a parquet lake): merge
    files below half the target size into ~`target_bytes` outputs, leaving
    right-sized files untouched.

    Streaming sinks, incremental upserts, and per-batch appends all leak
    small files; at 100 TB the resulting per-file open/footer overhead
    dominates scan time and executor scheduling. Compaction here costs IO
    proportional to the SMALL-file bytes only — large files are never
    read — and the planning pass is driver-side file-size listing
    (metadata, no data IO).

    `sort_col` preserves a :func:`write_range_sorted` layout: small files
    are binned in min-stat order of that column, so each merged output
    covers a contiguous key range and the layout's file-skipping survives
    compaction (bins of adjacent ranges merge into one wider but still
    disjoint range). Without it, files bin in name order.

    Crash semantics, like :func:`delete_keys` (:func:`_commit_rewrite`):
    the complete post-compaction directory is staged (untouched files
    hard-linked, merged outputs moved in) and published with one
    crash-recoverable swap — no victim is removed before the commit, so
    every failure point serves either the full original or the full
    compacted file set. Idempotent: a second run finds nothing below
    threshold. Single-directory scope — partitioned lakes run it per
    partition directory (embarrassingly parallel across an orchestrator's
    workers).

    Returns (files_merged, files_written).
    """
    import glob as _glob
    import uuid as _uuid

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    sizes = {f: os.path.getsize(f) for f in files}
    small = [f for f in files if sizes[f] < target_bytes // 2]
    if len(small) < 2:
        return 0, 0

    if sort_col is not None:

        def min_stat(f: str):
            meta = pq.ParquetFile(f).metadata
            ci = next(
                (
                    i
                    for i in range(meta.num_columns)
                    if meta.row_group(0).column(i).path_in_schema == sort_col
                ),
                None,
            )
            if ci is None:
                return None
            mins = [
                meta.row_group(g).column(ci).statistics.min
                for g in range(meta.num_row_groups)
                if meta.row_group(g).column(ci).statistics is not None
            ]
            return min(mins) if mins else None

        small.sort(key=lambda f: (min_stat(f) is None, min_stat(f)))

    # Greedy contiguous binning to ~target_bytes per output.
    bins: "list[list[str]]" = [[]]
    acc = 0
    for f in small:
        if bins[-1] and acc + sizes[f] > target_bytes:
            bins.append([])
            acc = 0
        bins[-1].append(f)
        acc += sizes[f]
    bins = [b for b in bins if len(b) >= 2]  # singleton bins gain nothing
    if not bins:
        return 0, 0

    rewrite = f"{path}.__compact_{_uuid.uuid4().hex[:8]}"
    os.makedirs(rewrite)
    written = 0
    merged: "list[str]" = []
    for i, b in enumerate(bins):
        out = spark.read.parquet(*b)
        if sort_col is not None:
            out = out.sortWithinPartitions(sort_col)
        out.coalesce(1).write.mode("overwrite").parquet(os.path.join(rewrite, str(i)))
        merged.extend(b)
        written += 1
    staged = sorted(_glob.glob(os.path.join(rewrite, "*", "*.parquet")))
    untouched = [f for f in files if f not in set(merged)]
    _commit_rewrite(path, untouched, staged, "compact")
    shutil.rmtree(rewrite, ignore_errors=True)
    return len(merged), written


def hilbert_value(
    df: DataFrame, cols: list[str], bits: int = 12
) -> "tuple[DataFrame, str]":
    """Attach a 2-D Hilbert-curve key over ``cols`` as column ``__h`` —
    the drop-in alternative to :func:`zorder_value` with strictly better
    locality: consecutive Hilbert cells are always grid-ADJACENT (the
    curve never jumps), while the Morton curve teleports across the
    domain at every power-of-two boundary, widening some files' bounding
    boxes. Databricks' liquid clustering made the same Z->Hilbert move
    for exactly this reason.

    Same rank scaling as Z-order (min/max to ``bits``-bit ints, one tiny
    stats job), then the classic xy->d transform (Hamilton's algorithm,
    the Wikipedia iterative form) unrolled over ``bits`` levels as pure
    column expressions — conditional reflect + swap per level, fully
    codegen'd, no UDF. 2 columns only: the rot/reflect state machine is
    dimension-specific, and 2 is the overwhelmingly common layout case
    (id x time, lat x lon); 3+ dims fall back to :func:`zorder_value`.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_value is 2-D; use zorder_value for 3+ cols")
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1

    def rank(c: str):
        lo = float(stats[f"lo_{c}"] or 0)
        hi = float(stats[f"hi_{c}"] or 0)
        span = (hi - lo) or 1.0
        return (
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top
                    ),
                ),
            )
            .cast("long")
        )

    # One SELECT per level, so each level's expressions reference the
    # previous level's ATTRIBUTES. Substituting the recurrence inline
    # (the naive fold) makes the column AST grow ~4x per level — 4^12
    # nodes at bits=12, which OOMs the driver during column
    # normalization before Catalyst ever sees it.
    base = [c for c in df.columns]
    cur = df.select(
        "*",
        rank(cols[0]).alias("__hx"),
        rank(cols[1]).alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    s = 1 << (bits - 1)
    while s > 0:
        rx = F.when(
            F.col("__hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        ry = F.when(
            F.col("__hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        d2 = F.col("__hd") + F.lit(s) * F.lit(s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        ).cast("long")
        flip = (ry == F.lit(0)) & (rx == F.lit(1))
        x1 = F.when(flip, F.lit(s - 1) - F.col("__hx")).otherwise(F.col("__hx"))
        y1 = F.when(flip, F.lit(s - 1) - F.col("__hy")).otherwise(F.col("__hy"))
        cur = cur.select(
            *base,
            F.when(ry == F.lit(0), y1).otherwise(x1).alias("__hx"),
            F.when(ry == F.lit(0), x1).otherwise(y1).alias("__hy"),
            d2.alias("__hd"),
        )
        s >>= 1
    return cur.select(*base, F.col("__hd").alias("__h")), "__h"
