"""UNL source: pipe-delimited, Windows-1250, headerless, trailing pipe.

Re-expresses the reference's parser semantics
(/root/reference/pspcz_analyzer/data/parser.py:12-86) as a Spark scan:

* no header — column order comes from the schema registry (schemas.py);
* separator ``|`` with NO quoting (stray double quotes are literal data —
  the 1996 files contain them);
* every line ends with a trailing ``|``, producing one extra empty column
  that is dropped;
* everything is read as text, then typed columns are ``trim().cast()``-ed
  with ANSI off, so invalid values become null (the reference's
  ``strict=False``);
* multi-file reads are a single glob scan — union is implicit and the
  work is distributed per file-split, which is the 100 TB-safe shape
  (the reference loops files on one core).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from pspcz_analyzer_spark import schemas

_TRAILING = "__trailing"


def raw_schema(cols: list[str]) -> StructType:
    """All-string read schema with the trailing-pipe extra column."""
    return StructType(
        [StructField(c, StringType(), True) for c in [*cols, _TRAILING]]
    )


def read_unl(
    spark: SparkSession,
    path: str | list[str],
    table: str | None = None,
    cols: list[str] | None = None,
    cast: dict[str, str] | None = None,
) -> DataFrame:
    """Read UNL file(s)/glob(s) into a typed DataFrame.

    Pass ``table`` to pull columns+types from the schema registry, or
    explicit ``cols`` (+ optional ``cast`` of column -> spark type).
    """
    from pspcz_analyzer_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # cp1250 needs legacy javaCharsets (idempotent)
    if table is not None:
        cols = schemas.columns(table)
        cast = schemas.cast_types(table)
    if cols is None:
        raise ValueError("need table or cols")
    # cp1250 is rejected by the CSV reader's charset whitelist unless the
    # legacy javaCharsets conf is on — carried by every sanctioned session
    # (get_spark at build time; plans.query_fns's ensure_runtime_confs shim
    # for vanilla-session callers).
    df = (
        spark.read.schema(raw_schema(cols))
        .options(
            sep="|",
            header=False,
            encoding="windows-1250",
            quote="",  # UNL never quotes; '"' is literal data
            mode="PERMISSIVE",
        )
        .csv(path)
        .drop(_TRAILING)
    )
    for c, t in (cast or {}).items():
        # trim + TRY_CAST == lenient "invalid -> null" semantics (the
        # reference's strict=False) under ANY session: a plain cast only
        # nulls invalid values with ANSI off, and Spark 4 defaults ANSI on,
        # so a vanilla caller session would throw on dirty 1996-era files.
        df = df.withColumn(c, F.expr(f"try_cast(trim(`{c}`) AS {t})"))
    return df
