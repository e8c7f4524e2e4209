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


# -- strip_html (SURVEY F14) --------------------------------------------------

HTML_SAMPLES = [
    "<p>Sněmovní tisk <b>č. 42</b></p>",
    "<html><head><style>p { color: red }</style><script>if (a < b) alert('x');</script></head>"
    "<body><h1>Zákon</h1><!-- internal note --><p>o &quot;dani&quot; &amp; poplatcích&nbsp;&ndash;&nbsp;novela</p></body></html>",
    "no markup at all",
    "",
    "<ul><li>první</li><li>druhá</li></ul>",
    "text with &amp;lt; double-encoded entity",
    "<a href='http://psp.cz/sqw?o=9&t=42'>odkaz</a> konec",
    "<div>multi\n  line\n\twhitespace</div>   trailing",
    "<P CLASS=\"x\">upper-case tags</P>",
    "<script src='x.js'></script>after empty script",
]


def _stdlib_strip_html(html_text: str) -> str:
    """Oracle: stdlib html.parser walk collecting text outside script/style,
    space-separated, entity-decoded, whitespace-collapsed — the selectolax
    .text(separator=' ', strip=True) + html.unescape behavior the reference
    relies on (steno_scraper.py:93)."""
    import re
    from html.parser import HTMLParser

    class Walk(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.skip = 0
            self.parts: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self.skip:
                self.skip -= 1

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    w = Walk()
    w.feed(html_text)
    return re.sub(r"\s+", " ", " ".join(w.parts)).strip()


@pytest.mark.parametrize("sample", HTML_SAMPLES)
def test_strip_html_matches_stdlib_parser(spark, sample):
    got = spark.range(1).select(
        T.strip_html(F.lit(sample)).alias("x")
    ).collect()[0]["x"]
    assert got == _stdlib_strip_html(sample)


def test_strip_html_batch_column(spark):
    """Applies as a plain column over many rows (the scan-speed contract)."""
    df = spark.createDataFrame(
        [(i, f"<p>doc {i} &amp; <b>more</b></p>") for i in range(100)],
        "id long, raw string",
    )
    rows = df.select("id", T.strip_html("raw").alias("clean")).collect()
    assert all(r["clean"] == f"doc {r['id']} & more" for r in rows)


def test_strip_html_roundtrip_survives_markup_in_text(spark):
    """The doc_html_strip_roundtrip construction must restore the ORIGINAL
    text even when the document itself contains markup-looking content —
    the escape step makes the oracle data-independent."""
    adversarial = [
        "plain words",
        "contains <span>tags</span> inline",
        "already-encoded &amp; and &lt;EOF&gt; entities",
        "lone & ampersand and a < b comparison",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(adversarial)], "i long, text string")
    escaped = F.replace(
        F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
        F.lit("<"),
        F.lit("&lt;"),
    )
    wrapped = F.concat(F.lit('<div class="doc">'), escaped, F.lit("</div> &amp; konec"))
    rows = df.select("i", T.strip_html(wrapped).alias("clean")).collect()
    import re as _re

    for r in rows:
        want = (_re.sub(r"\s+", " ", adversarial[r["i"]]).strip() + " & konec").strip()
        assert r["clean"] == want, adversarial[r["i"]]


class TestGopherFlags:
    """Gopher rule set (Rae et al. 2021): each rule triggered by a planted
    document, the clean document passes all."""

    def test_planted_rule_violations(self, spark):
        from pspcz_analyzer_spark.operators.textual import gopher_quality_flags

        good = (
            "the quick brown fox jumps over the lazy dog and that is a "
            "fine thing to have done with grace " * 4
        )
        rows = [
            (1, good),                                      # clean
            (2, "short text"),                              # word count
            (3, "a b c d e " * 20 + "the of and to"),       # mean word len
            (4, good + "# " * 30),                          # symbol ratio
            (5, "\n".join(["- bullet the of and that"] * 10)),  # bullets
            (6, "\n".join(["so it goes on and on the of..."] * 10)),  # ellipsis
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
        assert out[1]["keep_gopher"] is True
        assert out[2]["ok_word_count"] is False
        assert out[3]["ok_mean_word_len"] is False
        assert out[4]["ok_symbol_ratio"] is False
        assert out[5]["ok_bullet_lines"] is False
        assert out[6]["ok_ellipsis_lines"] is False
        for d in (2, 3, 4, 5, 6):
            assert out[d]["keep_gopher"] is False
        # Flag columns are audit columns: all named rules present.
        assert {c for c in out[1].asDict() if c.startswith("ok_")} == {
            "ok_word_count",
            "ok_mean_word_len",
            "ok_symbol_ratio",
            "ok_bullet_lines",
            "ok_ellipsis_lines",
            "ok_alpha_words",
            "ok_stopwords",
        }


class TestNaiveBayes:
    """nb_train_classify: brute-force parity on a toy corpus, accuracy on
    separable data, prior behavior on empty-feature docs."""

    def _toy(self, spark):
        rows = [
            (0, "a", "red red blue"),
            (2, "a", "red red red green"),
            (4, "b", "blue blue green"),
            (6, "b", "blue green green"),
            (8, "a", "red green"),
        ]
        test = [
            (1, "red red"),
            (3, "blue blue blue"),
            (5, "green red"),
        ]
        return (
            spark.createDataFrame(rows, "doc_id long, lab string, text string"),
            spark.createDataFrame(test, "doc_id long, text string"),
        )

    def _brute(self, train_rows, test_rows, n_buckets=512, s=1.0):
        import hashlib
        import math
        from collections import Counter, defaultdict

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

        by_label = defaultdict(Counter)
        ndocs = Counter()
        for _, lab, text in train_rows:
            ndocs[lab] += 1
            for g in text.split():
                by_label[lab][bucket(g)] += 1
        total = sum(ndocs.values())
        out = {}
        for did, text in test_rows:
            cb = Counter(bucket(g) for g in text.split())
            best = None
            for lab in sorted(by_label):
                t = sum(by_label[lab].values())
                sc = sum(
                    c * math.log((by_label[lab][b] + s) / (t + s * n_buckets))
                    for b, c in cb.items()
                )
                sc = round(sc + math.log(ndocs[lab] / total), 6)
                if best is None or sc > best[1]:
                    best = (lab, sc)
            out[did] = best
        return out

    def test_matches_brute_force(self, spark):
        from pspcz_analyzer_spark.operators.textual import nb_train_classify

        train, test = self._toy(spark)
        got = {
            r["doc_id"]: (r["pred_label"], r["nb_score"])
            for r in nb_train_classify(train, test, "lab").collect()
        }
        want = self._brute(
            [(r["doc_id"], r["lab"], r["text"]) for r in train.collect()],
            [(r["doc_id"], r["text"]) for r in test.collect()],
        )
        assert set(got) == set(want)
        for did in want:
            assert got[did][0] == want[did][0]
            assert abs(got[did][1] - want[did][1]) < 1e-6

    def test_separable_labels_recovered(self, spark):
        from pspcz_analyzer_spark.operators.textual import nb_train_classify

        train, test = self._toy(spark)
        got = {r["doc_id"]: r["pred_label"] for r in nb_train_classify(train, test, "lab").collect()}
        assert got[1] == "a"  # red-dominated
        assert got[3] == "b"  # blue-dominated

    def test_empty_text_doc_is_absent(self, spark):
        from pspcz_analyzer_spark.operators.textual import nb_train_classify

        train, _ = self._toy(spark)
        test = spark.createDataFrame([(9, "   ")], "doc_id long, text string")
        assert nb_train_classify(train, test, "lab").count() == 0


class TestTermPMI:
    def test_matches_brute_force(self, spark):
        import math
        from itertools import combinations

        from pspcz_analyzer_spark.operators.textual import term_pmi_pairs

        docs = [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma"),
            (3, "alpha beta epsilon"),
            (4, "gamma delta epsilon"),
            (5, "alpha delta"),
            (6, "beta gamma delta"),
            (7, "alpha beta delta"),
            (8, "epsilon zeta alpha"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = term_pmi_pairs(
            df, min_df=1, max_df_frac=1.0, per_doc_cap=10, min_pair_df=1, k=100
        ).collect()

        sets = {d: set(t.split()) for d, t in docs}
        n = len(docs)
        vocab = sorted({w for s in sets.values() for w in s})
        cnt = {w: sum(w in s for s in sets.values()) for w in vocab}
        want = {}
        for a, b in combinations(vocab, 2):
            nab = sum(a in s and b in s for s in sets.values())
            if nab:
                want[(a, b)] = (
                    cnt[a], cnt[b], nab,
                    round(math.log(nab * n / (cnt[a] * cnt[b])), 6),
                )
        assert {
            (r["term_a"], r["term_b"]): (r["n_a"], r["n_b"], r["n_ab"], r["pmi"])
            for r in got
        } == want

    def test_caps_bound_fanout_deterministically(self, spark):
        from pspcz_analyzer_spark.operators.textual import term_pmi_pairs

        # One long doc with 6 terms; per_doc_cap=3 keeps the 3 rarest
        # (lowest df, ties by term asc) -> only pairs among those survive.
        docs = [
            (1, "aaa bbb ccc ddd eee fff"),
            (2, "aaa bbb ccc"),
            (3, "aaa bbb"),
            (4, "aaa"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = term_pmi_pairs(
            df, min_df=1, max_df_frac=1.0, per_doc_cap=3, min_pair_df=1, k=100
        ).collect()
        # doc 1 keeps {ddd, eee, fff} (df 1 each); doc 2 keeps {ccc, bbb,
        # aaa}? -> df asc, term asc: ccc(2) bbb(3) aaa(4). So doc2 keeps all 3.
        pairs = {(r["term_a"], r["term_b"]) for r in got}
        assert ("aaa", "bbb") in pairs and ("ddd", "eee") in pairs
        # No pair may cross the capped-out boundary of doc 1.
        assert ("aaa", "fff") not in pairs and ("ccc", "ddd") not in pairs


class TestTextRank:
    def test_hub_word_ranks_highest_and_band_drops_stopword(self, spark):
        from pspcz_analyzer_spark.operators.textual import textrank_keywords

        # "the" appears in every doc (df 4/4) -> dropped by max_df_frac
        # 0.9; "core" is the structural hub of the remaining graph.
        docs = [
            (1, "the core spark engine"),
            (2, "the core query planner"),
            (3, "the core shuffle service"),
            (4, "the lonely footnote"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = textrank_keywords(df, min_df=1, max_df_frac=0.9, k=50).collect()
        terms = [r.term for r in got]
        assert "the" not in terms
        assert terms[0] == "core"  # highest-degree node wins
        # Rank mass over the whole graph sums to ~1 (PageRank invariant;
        # k=50 > vocabulary so nothing is cut).
        assert abs(sum(r.rank for r in got) - 1.0) < 1e-4

    def test_min_df_drops_singletons(self, spark):
        from pspcz_analyzer_spark.operators.textual import textrank_keywords

        docs = [
            (1, "shared words here"),
            (2, "shared words there"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = textrank_keywords(df, min_df=2, max_df_frac=1.0, k=50).collect()
        terms = {r.term for r in got}
        # df: shared=2, words=2, here/there=1 -> singletons dropped; the
        # surviving graph is shared<->words.
        assert terms == {"shared", "words"}

    def test_deterministic_top_k(self, spark):
        from pspcz_analyzer_spark.operators.textual import textrank_keywords

        docs = [(i, "alpha beta gamma delta epsilon") for i in range(6)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        a = [tuple(r) for r in textrank_keywords(df, min_df=1, k=3).collect()]
        b = [tuple(r) for r in textrank_keywords(df, min_df=1, k=3).collect()]
        assert a == b and len(a) == 3
