"""Self-tests for tools/check_correctness.py's normalization.

Round-6 regression: the driver's exact value hash failed three manifest-DML
queries on a ±0.03 drift over a 1.4e9 SUM (Spark HALF_UP vs DuckDB
nearbyint half-cent rounding on DOUBLE), but the local gate normalized
floats to 9 significant digits and called them equal — the builder shipped
"green" code that was red at the driver. These tests pin the fix: the
default tolerance is 15 sig digits, which MUST distinguish the exact pair
of values the driver caught.
"""

import importlib.util
import os
import sys

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load_checker():
    spec = importlib.util.spec_from_file_location(
        "check_correctness", os.path.join(_TOOLS, "check_correctness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_nine_digits_masked_the_r6_driver_failure():
    """The exact r6 values: Spark 1400739732.42 vs oracle 1400739732.39.

    At 9 sig digits both collapse to 1.40073973e9 — equal, i.e. the old
    gate could not see the failure. This documents WHY 9 was wrong.
    """
    m = _load_checker()
    spark_v, oracle_v = 1400739732.42, 1400739732.39
    assert m._norm_cell(spark_v, sig=9) == m._norm_cell(oracle_v, sig=9)


def test_fifteen_digits_reproduces_the_r6_driver_failure():
    """At the new default (15 sig digits) the same pair must DIFFER."""
    m = _load_checker()
    spark_v, oracle_v = 1400739732.42, 1400739732.39
    assert m._norm_cell(spark_v) != m._norm_cell(oracle_v)
    # and a genuine half-cent drift on a row-level value differs too
    assert m._norm_cell(61.73) != m._norm_cell(61.72)


def test_default_sig_is_15_and_optouts_documented():
    m = _load_checker()
    # default path uses 15 sig digits
    assert m._norm_cell(1.2345678901234567) == float("1.23456789012346")
    # opt-out table exists and starts empty — additions need a reason
    assert isinstance(m.APPROX_SIG_DIGITS, dict)


def test_norm_cell_still_canonicalizes_nan_and_decimal():
    from decimal import Decimal

    m = _load_checker()
    assert m._norm_cell(float("nan")) == "NaN"
    assert m._norm_cell(Decimal("61.73")) == 61.73
    assert m._norm_cell((1.0, None)) == (1.0, None)


def test_norm_rows_column_order_insensitive():
    m = _load_checker()
    cols_a, rows_a = m._norm_rows(["b", "a"], [(2.0, 1.0)])
    cols_b, rows_b = m._norm_rows(["a", "b"], [(1.0, 2.0)])
    assert cols_a == cols_b == ["a", "b"]
    assert rows_a == rows_b


def test_representation_check_catches_the_r7_hugeint_drift():
    """The exact r7 `votes_browser_page` signature: DuckDB sum(BIGINT) ->
    HUGEINT (pandas float64) vs Spark LongType. Value-equal, driver
    hash-red — the gate must flag it as a representation error."""
    from pyspark.sql import types as T

    m = _load_checker()
    schema = T.StructType([T.StructField("pro", T.LongType())])
    errs = m._representation_errors(schema, {"pro": "HUGEINT"})
    assert len(errs) == 1 and "dtype drift" in errs[0]
    # ...and CAST AS BIGINT on the oracle side fixes it
    assert m._representation_errors(schema, {"pro": "BIGINT"}) == []


def test_representation_check_rejects_nested_toplevel_columns():
    """The exact r7 `doc_inverted_postings` signature: a top-level
    array<bigint> output crashes the driver's pandas canonicalizer
    (unhashable list) — the gate must reject it on EITHER side."""
    from pyspark.sql import types as T

    m = _load_checker()
    nested = T.StructType(
        [T.StructField("postings", T.ArrayType(T.LongType()))]
    )
    errs = m._representation_errors(nested, {"postings": "BIGINT[]"})
    assert len(errs) == 2 and all("nested" in e for e in errs)
    flat = T.StructType([T.StructField("postings", T.StringType())])
    assert m._representation_errors(flat, {"postings": "VARCHAR"}) == []


def test_representation_check_exempts_decimal_pairings():
    """DECIMAL(18,2)-vs-DOUBLE pairings are the repo's documented money
    convention and long-standing driver-green — no false positive."""
    from pyspark.sql import types as T

    m = _load_checker()
    schema = T.StructType([T.StructField("rev", T.DecimalType(18, 2))])
    assert m._representation_errors(schema, {"rev": "DECIMAL(18,2)"}) == []
    assert m._representation_errors(schema, {"rev": "DOUBLE"}) == []
