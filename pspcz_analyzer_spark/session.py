"""SparkSession factory.

The reference runs a single eager-Polars process with a 2-thread compute pool
(``/root/reference/pspcz_analyzer/middleware.py:16``). Our equivalent of its
hand-tuned execution knobs is a properly configured SparkSession: AQE for
runtime re-planning (skew joins, partition coalescing), Arrow for any
pandas-UDF boundary, and broadcast thresholds sized so dimension tables never
shuffle.

All configs are chosen for a large cluster but work identically on
``local[N]``; tests override ``master`` and shrink shuffle partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf keys that are RUNTIME-settable and required for correct reads even
# under a session this package did not build (the verification driver and
# the local gate construct vanilla SparkSessions). They are applied
# idempotently at the contract boundary — ``plans.query_fns`` wraps every
# registered query with ``ensure_runtime_confs`` — so operator and plan
# bodies never mutate session state themselves, and results cannot depend
# on which query ran first.
RUNTIME_CONFS: dict[str, str] = {
    # Timestamps in testdata are naive; pinning UTC makes NTZ<->LTZ casts
    # identity on the underlying micros (streaming watermark casts included),
    # so results are machine-timezone-independent.
    "spark.sql.session.timeZone": "UTC",
    # Older testdata generations stored events.ts as INT64 TIMESTAMP(NANOS),
    # which Spark's vectorized reader rejects outright; with this conf the
    # raw nanos arrive as long and catalog.load_table rebuilds a
    # (microsecond) timestamp. Current generations write TIMESTAMP(MICROS)
    # (read as TIMESTAMP_NTZ), where the conf is inert.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # UNL files are Windows-1250; Spark 4 whitelists only a few charsets
    # unless legacy JVM charsets are allowed.
    "spark.sql.legacy.javaCharsets": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply ``RUNTIME_CONFS`` to an existing session, idempotently.

    Under a ``get_spark()`` session every key already matches (they are in
    ``_SCALE_CONFS``) and nothing is written; under a caller-supplied
    vanilla session this is the one sanctioned mutation point.
    """
    for k, v in RUNTIME_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    _quiet_noisy_loggers(spark)


def _quiet_noisy_loggers(spark: SparkSession) -> None:
    """Raise the level of known-noisy JVM loggers to ERROR.

    Every batch read through a glob path makes FileStreamSink probe the
    literal glob string for a streaming-metadata directory and WARN-log the
    resulting FileNotFoundException WITH a full stack trace — pure noise
    that pollutes the stderr tail the verification driver scrapes for its
    one-line JSON artifacts. Log levels are process-global cosmetics, not
    query semantics, so this is safe at the contract boundary; best-effort
    because the log4j2 bridge is not part of Spark's public Python API.
    """
    try:
        jvm = spark.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        level = jvm.org.apache.logging.log4j.Level.ERROR
        configurator.setLevel(
            "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink", level
        )
    except Exception:  # noqa: BLE001 — cosmetic; never fail a read over logging
        pass


# Defaults chosen for scale-out correctness; see docstring for rationale.
_SCALE_CONFS: dict[str, str] = {
    **RUNTIME_CONFS,
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/supplier, persons/organs in the
    # reference schema) are tiny even at 100 TB fact scale — broadcast them.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow everywhere Python touches data: pandas UDFs, toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Vote-matrix pivots can be wide (~10^4 distinct votes per period).
    "spark.sql.pivotMaxValues": "100000",
    # Respect partition-size targets when scanning big Parquet.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # NOTE on runtime row-level filters: enabling
    # spark.sql.optimizer.runtime.bloomFilter.enabled +
    # runtimeFilter.semiJoinReduction slowed PLAN COMPILATION ~10x across
    # this 99-query catalog on local mode (measured via the plan-shape test
    # suite), for zero benefit at test scale. On a real 100 TB cluster the
    # bloom-filter conf is worth enabling per-job for selective fact-fact
    # joins; it stays off in the session defaults.
    # ANSI off => lenient casts (invalid -> null), matching the reference's
    # strict=False casts (/root/reference/pspcz_analyzer/data/parser.py:51-57).
    "spark.sql.ansi.enabled": "false",
}


def parse_env_confs(spec: str) -> dict[str, str]:
    """Parse the ``SPARK_GRAFT_CONF`` deployment-lever spec: semicolon-
    separated ``key=value`` pairs, whitespace-tolerant, empty segments and
    keyless pairs ignored. Values may contain ``=`` (only the first splits).
    """
    confs: dict[str, str] = {}
    for pair in spec.split(";"):
        if "=" in pair:
            k, _, v = pair.partition("=")
            if k.strip():
                confs[k.strip()] = v.strip()
    return confs


def get_spark(
    app_name: str = "pspcz_analyzer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` outside a cluster;
    ``shuffle_partitions`` defaults to the core count in local mode (a real
    cluster wants ~2-3x total cores — leave unset there and let AQE coalesce).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    if shuffle_partitions is None:
        # Env override first: scale measurements (SCALING.md's decade
        # runs) need cluster-realistic parallelism — on a real cluster
        # shuffle partitions grow with the data, but a fixed local 32
        # makes every sort partition 10x bigger per decade and reads as
        # a spill-induced superlinear bend that is the HARNESS, not the
        # plan.
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp and env_sp.isdigit():
            shuffle_partitions = int(env_sp)
        else:
            shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # In local mode driver and all executor threads share ONE JVM whose heap
    # defaults to -Xmx1g — 32 task threads plus broadcast builds through 1 GiB
    # is constant GC pressure and OOM-kills broadcast-heavy plans at 10x data.
    # Honored only at JVM launch (getOrCreate on a live session ignores it);
    # on a real cluster spark-submit owns this and the builder value is inert.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    )
    # Deployment-level levers (optimization guide §9: io codec zstd,
    # files.maxPartitionBytes up to 1g for big sequential scans,
    # join.preferSortMergeJoin=false, memoryOverhead sizing) are a
    # property of the CLUSTER, not of these plans — flipping them on
    # local[N] over MB-scale inputs measures harness noise and would
    # desync the bench from the verification driver's environment. They
    # are therefore injected via env (`SPARK_GRAFT_CONF="k=v;k2=v2"`),
    # default EMPTY locally; production values and their rationale live
    # in OPTIMIZATION_r11.md / SCALING.md. Caller extra_confs still win.
    env_confs = parse_env_confs(os.environ.get("SPARK_GRAFT_CONF", ""))
    for k, v in {**_SCALE_CONFS, **env_confs, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
