"""Build a 10x replica of an sf testdata dir for scaling measurements.

Replicates every fact/medium-dim table 10x with a constant key stride
(replica i adds i*STRIDE to every join-key column), which preserves
referential integrity per replica: orders->customer, lineitem->orders/
part/supplier, events.user_id->customer all join exactly as at 1x, and
replica 0 keeps the original ids so literal point-filters in the query
catalog still hit. nation/region (broadcast dims at any scale) copy 1x.

The result is a drop-in sf_dir: ``SPARK_GRAFT_SF_DIR=<out> python
bench.py`` times the full headline set at 10x (SCALING.md's headline
section is produced this way; the corpus-operator section built its own
perturbed documents replica with the same idea).

Usage: python tools/build_scale10.py [src_sf_dir] [out_dir]
       (defaults: /root/testdata/sf0.1 -> /tmp/pspcz_scale10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One stride for every key column keeps cross-table joins consistent
# (all sf0.1 key spaces are far below 10M).
STRIDE = 10_000_000
REPLICAS = 10

# Key columns to offset per table; absent tables are skipped, tables
# mapped to None copy through unchanged.
KEYS: dict[str, list[str] | None] = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(src: str, out: str, stride: int = STRIDE) -> None:
    """``stride`` must exceed the SOURCE's key span: applying the tool
    to its own output (the 100x build for SCALING.md's second decade)
    needs a stride above 10*STRIDE + the original span — pass e.g.
    1_000_000_000 for the second application or replica key ranges
    would collide and silently inflate join fan-out."""
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.catalog import load_table, table_path
    from pspcz_analyzer_spark.session import get_spark

    spark = get_spark(app_name="build_scale10")
    os.makedirs(out, exist_ok=True)
    for name, keys in KEYS.items():
        if not os.path.exists(table_path(src, name)):
            continue
        df = load_table(spark, src, name)
        if keys is None:
            rep = df
        else:
            # explode over replica ids: one scan, 10x output, no union-of-10
            # plan (which would rescan the source per replica).
            # The offset multiply MUST be 64-bit: with a ~1e9 stride the
            # int32 product __r * stride wraps for replicas >= 3 (ANSI
            # off = silent), handing 4 of 10 replicas NEGATIVE key
            # offsets — joins stay consistent (same wrap on every
            # table), but literal key predicates (user_id < 60) sweep
            # whole wrapped replicas. Caught by the r9 wave-3 decade
            # run (events_hourly_resample read 475x on 1000x input).
            off = F.col("__r").cast("long") * F.lit(stride).cast("long")
            rep = (
                df.withColumn(
                    "__r", F.explode(F.lit(list(range(REPLICAS))))
                )
                .select(
                    *[
                        (F.col(c) + off).alias(c)
                        if c in keys
                        else F.col(c)
                        for c in df.columns
                    ]
                )
            )
        rep.write.mode("overwrite").parquet(table_path(out, name))
        print(f"{name}: {'1x copy' if keys is None else f'{REPLICAS}x'}")
    spark.stop()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pspcz_scale10"
    stride = int(sys.argv[3]) if len(sys.argv) > 3 else STRIDE
    build(src, out, stride)
