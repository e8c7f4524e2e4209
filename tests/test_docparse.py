"""Steno-like parser tests: designed documents covering every block kind
(the reference's test_steno_parser.py fixture style)."""

from __future__ import annotations

from pspcz_analyzer_spark.operators.docparse import (
    parse_steno_documents,
    parse_steno_like,
)

DOC = """Pozměňovací návrh A. Hlasování č. 101: přijato.

Pozměňovací návrh B2. Hlasování č. 102: zamítnuto.

Proti předchozímu hlasování byla vznesena námitka. Hlasování č. 103: přijato.

Předsedající přednesl procedurální poznámku bez hlasování.

Nyní budeme hlasovat o návrhu jako celku. Hlasování č. 104: přijato."""


class TestParseStenoLike:
    def test_full_document(self):
        recs = parse_steno_like(7, DOC)
        assert [r["vote_number"] for r in recs] == [101, 102, 103, 104]
        assert [r["letter"] for r in recs] == ["A", "B2", "B2", ""]
        assert [r["outcome"] for r in recs] == [
            "accepted", "rejected", "accepted", "accepted",
        ]

    def test_challenge_links_original_vote(self):
        recs = parse_steno_like(7, DOC)
        chal = recs[2]
        assert chal["is_revote"] is True
        assert chal["original_vote_number"] == 102
        assert chal["letter"] == "B2"  # inherited from the challenged block

    def test_final_vote_flagged(self):
        recs = parse_steno_like(7, DOC)
        assert [r["is_final"] for r in recs] == [False, False, False, True]

    def test_non_vote_blocks_skipped(self):
        # The procedural block (seq 3) emits no record; seq numbering still
        # reflects block positions that DID parse.
        recs = parse_steno_like(7, DOC)
        assert len(recs) == 4

    def test_challenge_without_prior_letter(self):
        doc = "Byla vznesena námitka. Hlasování č. 9: zamítnuto."
        recs = parse_steno_like(1, doc)
        assert recs[0]["letter"] == ""
        assert recs[0]["is_revote"] is False
        assert recs[0]["original_vote_number"] is None

    def test_empty_and_unparseable(self):
        assert parse_steno_like(1, "") == []
        assert parse_steno_like(1, "Jen text bez hlasování.") == []


def test_udtf_distributes(spark):
    docs = spark.createDataFrame(
        [(1, DOC), (2, DOC), (3, "")], "doc_id long, text string"
    ).repartition(3)
    out = parse_steno_documents(docs)
    rows = out.collect()
    assert len(rows) == 8  # 4 records x 2 docs, empty doc contributes none
    assert {r["doc_id"] for r in rows} == {1, 2}
    got = sorted(
        (r["doc_id"], r["vote_number"], r["letter"]) for r in rows
    )
    assert got[0] == (1, 101, "A")
