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
