"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just fixtures. Driver-side string properties run the same
normalization code path the Spark expressions encode; Spark-side checks
sample a bounded number of generated rows per case to keep runtime sane."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# Czech alphabet + ascii + whitespace + punctuation, the domain our corpus uses.
_CZ = "áčďéěíňóřšťúůýžÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ"
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij XYZ0123456789.,!?\"'\t\n" + _CZ)
    ),
    max_size=80,
)


def _nfd_fold(s: str) -> str:
    d = unicodedata.normalize("NFD", s)
    return "".join(ch for ch in d if not unicodedata.combining(ch))


@st.composite
def _norm_pair(draw):
    return draw(TEXT)


class TestNormalizationProperties:
    @settings(max_examples=200, deadline=None)
    @given(TEXT)
    def test_duckdb_strip_accents_matches_nfd_fold(self, s):
        """The oracle-side normalization (strip_accents) must agree with the
        NFD fold our Spark translate table implements, for any text over
        the corpus alphabet — this equivalence is what makes every text
        oracle trustworthy."""
        want = _nfd_fold(s.lower())
        got = duckdb.sql("SELECT strip_accents(lower(?))", params=[s]).fetchone()[0]
        assert got == want

    @settings(max_examples=200, deadline=None)
    @given(TEXT)
    def test_fold_is_idempotent_and_length_preserving(self, s):
        folded = _nfd_fold(s)
        assert _nfd_fold(folded) == folded
        assert len(folded) == len(s)


class TestSparkTextProperties:
    @pytest.fixture(scope="class")
    def samples(self):
        """Deterministic edge-case set evaluated in ONE Spark job
        (per-example Spark jobs would take minutes)."""
        return [
            "", " ", "a  b", "Příliš žluťoučký KŮŇ", 'quote " inside',
            "tab\tand\nnewline", "číslo 123/2024 Sb.", "ŘŠČŘŽÝÁÍÉ", ". , !",
            "x" * 80,
        ]

    def test_normalize_idempotent_and_fold_stable(self, spark, samples):
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.functions.text import normalize_text

        df = spark.createDataFrame([(s,) for s in samples], "t string")
        out = df.select(
            normalize_text("t").alias("once"),
            normalize_text(normalize_text("t")).alias("twice"),
            F.length(normalize_text("t")).alias("len_once"),
        ).collect()
        for r in out:
            assert r["once"] == r["twice"]  # idempotent
            assert " \t" not in r["once"] and "\n" not in r["once"]
            assert r["once"] == r["once"].strip()

    def test_token_count_bounds(self, spark, samples):
        from pspcz_analyzer_spark.functions.text import token_count, tokens

        df = spark.createDataFrame([(s,) for s in samples], "t string")
        import pyspark.sql.functions as F

        rows = df.select(
            "t", token_count("t").alias("n"), F.size(tokens("t")).alias("sz")
        ).collect()
        for r in rows:
            assert r["n"] >= 0
            if r["t"].strip() == "":
                assert r["n"] == 0
            else:
                assert r["n"] == len(r["t"].split())


class TestPaginationProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 7), st.integers(1, 20))
    def test_offset_pages_partition_the_sequence(self, per_page, n_rows):
        """Offset pagination must tile [1..n] exactly: no gaps, no overlaps
        (pure arithmetic property of the page/per_page math)."""
        pages = []
        page = 1
        while (page - 1) * per_page < n_rows:
            lo = (page - 1) * per_page
            hi = min(lo + per_page, n_rows)
            pages.append(list(range(lo + 1, hi + 1)))
            page += 1
        flat = [x for p in pages for x in p]
        assert flat == list(range(1, n_rows + 1))
        assert all(len(p) <= per_page for p in pages)
