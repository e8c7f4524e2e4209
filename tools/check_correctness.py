"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf_dir and
compares it with its ``oracle_sql()`` twin on DuckDB: row count, sorted
column names, and an order-insensitive value comparison (rows sorted by all
columns; floats compared to 15 significant digits — effectively exact for
values the repo convention rounds to 2 decimals, and close enough to the
driver's exact value hash that a half-cent engine divergence FAILS here
too; timestamps compared at microseconds). Queries whose oracle is
genuinely approximation-defined may opt into a looser tolerance via
``APPROX_SIG_DIGITS`` below — each entry must say why. Prints one status
line per query plus a summary.

Round-6 lesson: the old 9-sig-digit normalization masked a ±0.03 drift on
a 1.4e9 SUM (Spark vs DuckDB half-cent rounding on DOUBLE), so the local
gate said green while the driver's exact hash said red. Never loosen the
default below 15.

Round-7 lesson (two new checks, both driver-faithful): the driver hashes
PANDAS frames, so (a) its hash is dtype-sensitive — DuckDB ``sum(BIGINT)``
returns HUGEINT which pandas renders float64 (``4.0``) while Spark returns
int64 (``4``): value-equal, hash-red. The gate now derives a numeric KIND
per column (Spark schema vs ``DESCRIBE`` on the oracle, where HUGEINT maps
to FLOAT-kind because that is what the driver's pandas frame holds) and
fails any int-vs-float pairing. (b) Its canonicalizer (``sort_values`` →
``factorize``) crashes on list cells, so an oracle-paired query with a
top-level Array/Struct/Map output column can never be attested — the gate
now hard-fails those on either side (flatten to a CSV/JSON string at the
query edge, see ``order_lines_nested``). DECIMAL pairings are exempt from
the kind check: the repo convention computes money in DECIMAL(18,2) on
both sides and those rows are long-standing driver-green.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Per-query float tolerance opt-outs (sig digits). ONLY for oracles that
# are genuinely approximation-defined; each entry must carry a reason.
# Default for everything else is 15 sig digits (near-exact for doubles).
APPROX_SIG_DIGITS: dict[str, int] = {}


def _norm_cell(v, sig=15):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.{sig}g}")
    # datetime/date -> isoformat (micros); Decimal -> float
    t = type(v).__name__
    if t in ("datetime", "date", "Timestamp"):
        return v.isoformat()
    if t == "Decimal":
        return float(f"{float(v):.{sig}g}")
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x, sig) for x in v)
    return v


# --- driver-faithful representation checks -------------------------------

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
# HUGEINT lands in the driver's pandas frame as float64 — that pandas-facing
# representation (not the SQL type) is what the hash sees.
_DUCK_FLOAT = {"HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL"}


def _duck_kind(t: str) -> str:
    t = t.upper()
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP(", "LIST", "ARRAY")):
        return "nested"
    if t in _DUCK_INT:
        return "i"
    if t in _DUCK_FLOAT:
        return "f"
    if t.startswith("DECIMAL"):
        return "d"
    return "other"


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "nested"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.DecimalType):
        return "d"
    return "other"


def _representation_errors(sdf_schema, duck_types: dict[str, str]) -> list[str]:
    """Driver-twin checks on the RESULT REPRESENTATION (not values):
    top-level nested columns (either side) and int-vs-float kind drift.
    Returns a list of human-readable problems (empty = fine)."""
    errs = []
    s_kinds = {f.name: _spark_kind(f.dataType) for f in sdf_schema.fields}
    d_kinds = {c: _duck_kind(t) for c, t in duck_types.items()}
    for c, k in s_kinds.items():
        if k == "nested":
            errs.append(f"spark column {c!r} is nested (array/struct/map) — "
                        "flatten at the query edge")
    for c, k in d_kinds.items():
        if k == "nested":
            errs.append(f"oracle column {c!r} is nested (list/struct/map) — "
                        "flatten with array_to_string/to_json")
    for c in sorted(set(s_kinds) & set(d_kinds)):
        pair = {s_kinds[c], d_kinds[c]}
        if pair == {"i", "f"}:
            errs.append(
                f"dtype drift on {c!r}: spark={s_kinds[c]} oracle={d_kinds[c]} "
                "(driver hash is dtype-sensitive: 4 != 4.0 — CAST both sides)"
            )
    return errs


def _norm_rows(cols, rows, sig=15):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i], sig) for i in idx) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in idx], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    qs, oracles = E.queries(), E.oracle_sql()
    # Deliberately VANILLA session (no session.py confs): the driver builds
    # its own, so queries must be self-sufficient under one.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("check_correctness")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            duck_types = dict(
                (r[0], r[1])
                for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            )
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        rep_errs = _representation_errors(sdf.schema, duck_types)
        if rep_errs:
            print(f"FAIL {name}: representation: " + "; ".join(rep_errs))
            n_fail += 1
            failures.append(name)
            continue
        sig = APPROX_SIG_DIGITS.get(name, 15)
        sc, sr = _norm_rows(scols, srows, sig)
        dc, dr = _norm_rows(dcols, drows, sig)
        dt = time.time() - t0
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
        elif sr != dr:
            bad = sum(1 for a, b in zip(sr, dr) if a != b)
            print(f"FAIL {name}: {bad}/{len(sr)} rows differ [{dt:.1f}s]")
            for a, b in zip(sr, dr):
                if a != b:
                    print(f"   spark:  {a}\n   oracle: {b}")
                    break
        elif len(sr) == 0:
            # Hash-equal but EMPTY: vacuous — the query proves nothing.
            print(f"FAIL {name}: vacuous (0 rows on both sides) [{dt:.1f}s]")
        else:
            print(f"PASS {name}: {len(sr)} rows [{dt:.1f}s]")
            n_pass += 1
            continue
        n_fail += 1
        failures.append(name)
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
        + (f"; failing: {' '.join(failures)}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
