"""Text-function tests: diacritic folding parity with NFD stripping (and
DuckDB's strip_accents, which the oracles rely on), tokenization edges,
fingerprint stability."""

from __future__ import annotations

import unicodedata

import duckdb
import pyspark.sql.functions as F
import pytest

from pspcz_analyzer_spark.functions import text as T

CZECH_SAMPLES = [
    "Příliš žluťoučký kůň úpěl ďábelské ódy",
    "Čeněk Šťastný řekl: Žofie, běž!",
    "ŘÍZENÍ LETOVÉHO PROVOZU",
    "plain ascii text 123",
    "",
    "   spaces   and\ttabs\nnewlines  ",
]


def _nfd_fold(s: str) -> str:
    d = unicodedata.normalize("NFD", s)
    return "".join(ch for ch in d if not unicodedata.combining(ch))


@pytest.mark.parametrize("sample", CZECH_SAMPLES)
def test_fold_matches_nfd(spark, sample):
    got = spark.range(1).select(
        T.fold_diacritics(F.lit(sample)).alias("x")
    ).collect()[0]["x"]
    assert got == _nfd_fold(sample)


@pytest.mark.parametrize("sample", CZECH_SAMPLES)
def test_normalize_matches_duckdb_oracle_expr(spark, sample):
    """normalize_text must equal the _NORM DuckDB expression used by every
    text oracle (plans/text.py) on representative Czech input."""
    got = spark.range(1).select(
        T.normalize_text(F.lit(sample)).alias("x")
    ).collect()[0]["x"]
    want = duckdb.sql(
        "SELECT trim(regexp_replace(strip_accents(lower(?)), '\\s+', ' ', 'g'))",
        params=[sample],
    ).fetchone()[0]
    assert got == want


def test_normalize_idempotent(spark):
    s = CZECH_SAMPLES[0]
    once = spark.range(1).select(T.normalize_text(F.lit(s)).alias("x")).collect()[0]["x"]
    twice = spark.range(1).select(
        T.normalize_text(T.normalize_text(F.lit(s))).alias("x")
    ).collect()[0]["x"]
    assert once == twice


@pytest.mark.parametrize(
    "s,expected",
    [("", 0), ("   ", 0), ("one", 1), ("one two  three", 3), ("a\tb\nc", 3)],
)
def test_token_count(spark, s, expected):
    got = spark.range(1).select(T.token_count(F.lit(s)).alias("n")).collect()[0]["n"]
    assert got == expected


@pytest.mark.parametrize(
    "s,expected",
    [
        ("hello world", 2),
        ("hello, world!", 4),  # word , word !
        ("a1b", 3),  # letters split from each digit
        ("", 0),
    ],
)
def test_bpe_ish_token_count(spark, s, expected):
    got = spark.range(1).select(
        T.bpe_ish_token_count(F.lit(s)).alias("n")
    ).collect()[0]["n"]
    assert got == expected


def test_contains_normalized_diacritic_insensitive(spark):
    df = spark.createDataFrame([("Žluťoučký kůň",)], "t string")
    assert df.filter(T.contains_normalized("t", "zlutoucky")).count() == 1
    assert df.filter(T.contains_normalized("t", "KŮŇ")).count() == 1
    assert df.filter(T.contains_normalized("t", "pes")).count() == 0


def test_fingerprint_normalization_invariant(spark):
    df = spark.createDataFrame(
        [("Příliš žluťoučký",), ("  prilis   ZLUTOUCKY ",)], "t string"
    )
    fps = [r["f"] for r in df.select(T.fingerprint("t").alias("f")).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 32
