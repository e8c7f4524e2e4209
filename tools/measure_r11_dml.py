"""Round-11 DML/MERGE decade measurement (r10 verdict ask #4).

SCALING.md's decade tables cover analytics and commit CPU, but the DML
family — the code path that held this build's last two real data-loss
bugs — had no end-to-end wall-time decade. This tool measures it, plus
the negated-isin vs anti-join crossover the ``ISIN_LITERAL_LIMIT``
threshold encodes for the DML *purge* (``tools/measure_isin_knee.py``
measured the knee for scan predicates; the purge adds victim rewrite
I/O around the same predicate).

Method
------
Tables: the sf0.1 ``orders`` table replicated 1x / 10x / 100x with the
``build_scale10`` key-stride scheme (replica i adds i*stride to
``o_orderkey``/``o_custkey``; replica 0 keeps original ids). File count
scales with data (4 / 40 / 400 files) so victim pruning faces a
realistic file population — DML cost at scale is DOMINATED by how many
files the key set touches, and a decade table built over one giant file
would measure rewrite bandwidth only.

Shapes (each on a pristine copy of the table — DML mutates):
  delete_small      delete_keys, 1,000 real keys -> literal-isin purge
  delete_clustered  delete_keys, 1,000 keys from ONE contiguous range
                    on the range-clustered layout -> the stats prune
                    bounds victims by the range, not the table
  delete_big        delete_keys, 50,000 real keys -> anti-join purge
  upsert_dim        upsert, 10,000-row batch (5k updates / 5k inserts)
  merge_cdc         merge_into, 20,000-row CDC source (10k updates,
                    5k tombstone deletes, 5k inserts)

Hash-spread keys (uniform across the keyspace) make every file a
victim at every scale: rewrite volume IS the table — the adversarial
floor, expected to grow ~10x/decade. The clustered shape is the 100 TB
targeted-delete story and should stay ~flat per decade. Batches/sources are materialized to parquet
BEFORE the timer starts, so the timed region is the DML alone. A
flat-to-linear decade then isolates the per-file costs (footer/stats
prune, rewrite) from any superlinear planning term.

Knee: on the 10x table, delete_keys wall time vs key-list size n in
{250, 500, 1k, 2k, 4k, 8k} FORCED down each path (monkeypatched
``ISIN_LITERAL_LIMIT`` = inf / 0), fresh table copy per cell. The
recorded crossover justifies (or re-derives) the production threshold.

Usage: python tools/measure_r11_dml.py [src_sf_dir] [--knee-only|--decade-only]
Prints one JSON line per cell and a final SUMMARY block for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRIDE = 10_000_000
WORK = "/tmp/pspcz_dml_r11"


def _build(spark, src_sf_dir: str, scale: int) -> str:
    """Replicate orders `scale`x into WORK/base{scale}; returns the dir."""
    from pyspark.sql import functions as F

    from pspcz_analyzer_spark.catalog import load_table

    out = os.path.join(WORK, f"base{scale}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    orders = load_table(spark, src_sf_dir, "orders")
    parts = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * STRIDE)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * STRIDE))
        for i in range(scale)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # File count scales with data: victim pruning must face a growing
    # file population, not one ever-fatter file. Range-clustered on the
    # key (the lakehouse layout convention the manifest's zorder/cluster
    # family maintains): per-file [min,max] stay tight, so the
    # delete_clustered shape below can demonstrate the stats prune while
    # the hash-spread shapes still hit every file.
    df.repartitionByRange(4 * scale, "o_orderkey").write.mode(
        "overwrite"
    ).parquet(out)
    return out


def _fresh_table(base_dir: str, tag: str) -> str:
    """Pristine manifest table copy for one measurement cell."""
    t = os.path.join(WORK, f"tbl_{tag}")
    if os.path.exists(t):
        shutil.rmtree(t)
    shutil.copytree(base_dir, t)
    from pspcz_analyzer_spark import manifest as M

    M.manifest_init(t, stat_cols=["o_orderkey"])
    return t


def _real_keys(
    spark, base_dir: str, count: int, where: str | None = None
) -> list[int]:
    """`count` existing o_orderkey values, hash-mod sampled so they
    spread uniformly across the sampled keyspace. Without ``where``
    they span every file (the no-pruning-relief worst case); with a
    range ``where`` (delete_clustered) they stay inside one contiguous
    key range so the stats prune can shrink the victim set."""
    from pyspark.sql import functions as F

    tbl = spark.read.parquet(base_dir)
    if where:
        tbl = tbl.where(where)
    n = tbl.count()
    mod = max(1, n // (count * 2))
    rows = (
        tbl.select("o_orderkey")
        .where(F.pmod(F.hash("o_orderkey"), F.lit(mod)) == 0)
        .limit(count)
        .collect()
    )
    return [int(r[0]) for r in rows]


def _materialize(df, tag: str):
    """Write df to parquet and read back: keeps batch/source construction
    OUT of the timed DML region."""
    p = os.path.join(WORK, f"src_{tag}")
    df.write.mode("overwrite").parquet(p)
    spark = df.sparkSession
    return spark.read.parquet(p)


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def run_decade(spark, src_sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pspcz_analyzer_spark import manifest as M

    results: dict[str, dict[int, float]] = {}
    for scale in (1, 10, 100):
        base = _build(spark, src_sf_dir, scale)

        # delete_small: 1,000 keys, literal-isin purge.
        t = _fresh_table(base, f"ds{scale}")
        ks = _real_keys(spark, base, 1_000)
        dt = _timed(lambda: M.delete_keys(spark, t, "o_orderkey", ks))
        results.setdefault("delete_small", {})[scale] = dt
        print(
            json.dumps({"cell": "delete_small", "scale": scale, "sec": dt}),
            flush=True,
        )

        # delete_clustered: 1,000 keys from ONE contiguous key range
        # (replica 0) on the range-clustered layout — the stats prune
        # keeps the victim set at the handful of files covering that
        # range regardless of table scale. THIS is the targeted-delete
        # shape a 100 TB table sees (a bad partition, one tenant, one
        # day); the hash-spread shapes above are the adversarial floor.
        t = _fresh_table(base, f"dc{scale}")
        ks = _real_keys(
            spark, base, 1_000, where=f"o_orderkey < {STRIDE}"
        )
        dt = _timed(lambda: M.delete_keys(spark, t, "o_orderkey", ks))
        results.setdefault("delete_clustered", {})[scale] = dt
        print(
            json.dumps(
                {"cell": "delete_clustered", "scale": scale, "sec": dt}
            ),
            flush=True,
        )

        # delete_big: 50,000 keys, anti-join purge.
        t = _fresh_table(base, f"db{scale}")
        ks = _real_keys(spark, base, 50_000)
        dt = _timed(lambda: M.delete_keys(spark, t, "o_orderkey", ks))
        results.setdefault("delete_big", {})[scale] = dt
        print(
            json.dumps({"cell": "delete_big", "scale": scale, "sec": dt}),
            flush=True,
        )

        # upsert_dim: 10k-row batch = 5k updated existing rows + 5k new.
        t = _fresh_table(base, f"up{scale}")
        upd_keys = _real_keys(spark, base, 5_000)
        tbl = M.load_manifest_table(spark, t)
        keys_df = spark.createDataFrame(
            [(k,) for k in upd_keys], "o_orderkey long"
        ).withColumn("o_orderkey", F.col("o_orderkey").cast(
            dict(tbl.dtypes)["o_orderkey"]
        ))
        upd = tbl.join(keys_df, "o_orderkey", "left_semi").withColumn(
            "o_orderpriority", F.lit("r11-upsert")
        )
        tmpl = tbl.limit(1).collect()[0]
        ins = spark.range(5_000).select(
            (F.col("id") + F.lit((300 + scale) * STRIDE))
            .cast(dict(tbl.dtypes)["o_orderkey"])
            .alias("o_orderkey"),
            *[
                F.lit(tmpl[c]).alias(c)
                for c in tbl.columns
                if c != "o_orderkey"
            ],
        )
        batch = _materialize(
            upd.unionByName(ins.select(*upd.columns)), f"up{scale}"
        )
        dt = _timed(lambda: M.upsert(spark, batch, t, "o_orderkey"))
        results.setdefault("upsert_dim", {})[scale] = dt
        print(
            json.dumps({"cell": "upsert_dim", "scale": scale, "sec": dt}),
            flush=True,
        )

        # merge_cdc: 20k source = 10k updates + 5k deletes + 5k inserts.
        t = _fresh_table(base, f"mg{scale}")
        mk = _real_keys(spark, base, 15_000)
        key_t = dict(tbl.dtypes)["o_orderkey"]
        src = spark.createDataFrame(
            [(k, "U") for k in mk[:10_000]]
            + [(k, "D") for k in mk[10_000:15_000]]
            + [
                (int((400 + scale) * STRIDE + i), "I")
                for i in range(5_000)
            ],
            "o_orderkey long, op string",
        ).withColumn("o_orderkey", F.col("o_orderkey").cast(key_t))
        # CDC sources carry (key, op) + full row payload for inserts.
        src_full = src
        for c in tbl.columns:
            if c == "o_orderkey":
                continue
            src_full = src_full.withColumn(c, F.lit(tmpl[c]))
        src_full = _materialize(src_full, f"mg{scale}")
        dt = _timed(
            lambda: M.merge_into(
                spark,
                t,
                src_full,
                "o_orderkey",
                when_matched_update={
                    "o_orderpriority": "concat(t.o_orderpriority, '+U')"
                },
                matched_condition="s.op = 'U'",
                when_matched_delete="s.op = 'D'",
                when_not_matched_insert=True,
                not_matched_condition="s.op = 'I'",
            )
        )
        results.setdefault("merge_cdc", {})[scale] = dt
        print(
            json.dumps({"cell": "merge_cdc", "scale": scale, "sec": dt}),
            flush=True,
        )
    return results


def run_knee(spark, src_sf_dir: str) -> dict:
    from pspcz_analyzer_spark import manifest as M

    base = _build(spark, src_sf_dir, 10)
    out: dict[str, dict[int, float]] = {"isin": {}, "antijoin": {}}
    saved = M.ISIN_LITERAL_LIMIT
    try:
        for n in (250, 500, 1_000, 2_000, 4_000, 8_000):
            ks = _real_keys(spark, base, n)
            for path_name, limit in (("isin", 1 << 60), ("antijoin", 0)):
                M.ISIN_LITERAL_LIMIT = limit
                t = _fresh_table(base, f"knee_{path_name}_{n}")
                dt = _timed(
                    lambda: M.delete_keys(spark, t, "o_orderkey", ks)
                )
                out[path_name][n] = dt
                print(
                    json.dumps(
                        {
                            "cell": f"knee_{path_name}",
                            "n_keys": n,
                            "sec": dt,
                        }
                    ),
                    flush=True,
                )
    finally:
        M.ISIN_LITERAL_LIMIT = saved
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.1"
    os.makedirs(WORK, exist_ok=True)
    from pspcz_analyzer_spark.session import get_spark

    spark = get_spark(app_name="measure_r11_dml")
    summary: dict = {}
    if "--knee-only" not in sys.argv:
        summary["decade"] = run_decade(spark, src)
    if "--decade-only" not in sys.argv:
        summary["knee"] = run_knee(spark, src)
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
