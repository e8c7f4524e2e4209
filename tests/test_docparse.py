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


class TestParseAmendmentText:
    DOC = """A. Poslanec Ing. Jan Novák, poslanec Petr Svoboda
odůvodnění
A.1. SD 3327
text pododstavce
A.2. SD 3328
B. Poslankyně Marie Dvořáková
bez podbodů
"""

    def test_letters_and_submitters(self):
        from pspcz_analyzer_spark.operators.docparse import parse_amendment_text

        recs = {r["letter"]: r for r in parse_amendment_text(1, self.DOC)}
        assert set(recs) == {"A", "B"}
        assert recs["A"]["submitters"] == ["Jan Novák", "Petr Svoboda"]  # title stripped
        assert recs["A"]["n_subs"] == 2
        assert recs["B"]["submitters"] == ["Marie Dvořáková"]
        assert recs["B"]["n_subs"] == 0

    def test_empty(self):
        from pspcz_analyzer_spark.operators.docparse import parse_amendment_text

        assert parse_amendment_text(1, "no headers here") == []


def _mini_pdf(content: bytes, compress: bool = True) -> bytes:
    """A minimal one-page PDF wrapping ``content`` as its content stream.
    The fallback extractor never consults the xref, but keep the envelope
    honest anyway."""
    import zlib

    if compress:
        body = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        body, filt = content, b""
    obj = (
        b"4 0 obj\n<< %s/Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (filt, len(body), body)
    )
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + obj
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


class TestPdfFallback:
    """S7 without PyMuPDF: the pure-Python Flate/text-operator fallback."""

    CONTENT = (
        b"BT /F1 12 Tf 72 720 Td (A. Poslanec Jan Nov\xc3\xa1k) Tj ET\n"
        b"BT [(A.1.) -250 ( n\\341vrh)] TJ ET\n"
        b"BT <412e322e> Tj ET\n"  # hex string: "A.2."
        b"BT (paren \\(esc\\) and \\\\ back) ' ET\n"
    )

    def test_flate_and_operators(self, spark):
        from pspcz_analyzer_spark.operators.docparse import extract_pdf_text

        df = spark.createDataFrame(
            [(7, _mini_pdf(self.CONTENT))], "doc_id long, content binary"
        )
        text = extract_pdf_text(df).collect()[0]["text"]
        assert "A. Poslanec Jan Nov\u00e1k" in text
        assert "A.1." in text and "\u00e1vrh" in text  # TJ array + octal escape
        assert "A.2." in text  # hex string
        assert "paren (esc) and \\ back" in text

    def test_uncompressed_stream(self, spark):
        from pspcz_analyzer_spark.operators.docparse import extract_pdf_text

        df = spark.createDataFrame(
            [(1, _mini_pdf(b"BT (plain stream) Tj ET", compress=False))],
            "doc_id long, content binary",
        )
        assert "plain stream" in extract_pdf_text(df).collect()[0]["text"]

    def test_no_text_pdf_yields_empty(self, spark):
        from pspcz_analyzer_spark.operators.docparse import extract_pdf_text

        df = spark.createDataFrame(
            [(1, b"%PDF-fake, no streams")], "doc_id long, content binary"
        )
        assert extract_pdf_text(df).collect()[0]["text"] == ""

    def test_encrypted_raises(self, spark):
        import pytest as _pytest

        from pspcz_analyzer_spark.operators.docparse import extract_pdf_text

        df = spark.createDataFrame(
            [(1, b"%PDF-1.4 /Encrypt 9 0 R")], "doc_id long, content binary"
        )
        try:
            import fitz  # noqa: F401  # pragma: no cover
        except ImportError:
            with _pytest.raises(Exception, match="encrypted"):
                extract_pdf_text(df).collect()

    def test_full_s7_chain_binary_to_letters(self, spark):
        """binary PDF -> text -> amendment letter parse, end to end."""
        from pspcz_analyzer_spark.operators.docparse import (
            extract_pdf_text,
            parse_amendment_documents,
        )

        content = (
            b"BT (A. Poslanec Ing. Jan Novak, poslanec Petr Svoboda) Tj ET\n"
            b"BT (A.1. prvni) Tj (A.2. druhy) Tj ET\n"
        )
        df = spark.createDataFrame(
            [(3, _mini_pdf(content))], "doc_id long, content binary"
        )
        recs = parse_amendment_documents(extract_pdf_text(df)).collect()
        assert len(recs) == 1
        assert recs[0]["letter"] == "A"
        assert recs[0]["submitters"] == ["Jan Novak", "Petr Svoboda"]
        assert recs[0]["n_subs"] == 2


def test_chart_sink_gated():
    from pspcz_analyzer_spark.serving.charts import render_bar_chart

    rows = [{"party": "A", "pct": 50.0}, {"party": "B", "pct": 75.0}]
    try:
        import matplotlib  # noqa: F401

        png = render_bar_chart(rows, "party", "pct")  # pragma: no cover
        assert png[:4] == b"\x89PNG"  # pragma: no cover
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="matplotlib"):
            render_bar_chart(rows, "party", "pct")


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


class TestPdfFallbackHardening:
    """Round-4 hardening: payload byte-exactness via /Length, deflate
    streams with awkward trailing bytes, hex strings inside TJ arrays."""

    def test_hex_string_inside_tj_array(self, spark):
        from pspcz_analyzer_spark.operators.docparse import extract_pdf_text

        content = b"BT [(A) -250 <412e332e> -250 (B)] TJ ET"
        df = spark.createDataFrame(
            [(1, _mini_pdf(content))], "doc_id long, content binary"
        )
        text = extract_pdf_text(df).collect()[0]["text"]
        assert "AA.3.B" in text  # hex chunk must not vanish from the array

    def test_embedded_endstream_inside_stream_payload(self, spark):
        """/Length slicing must survive the bytes 'endstream' occurring
        INSIDE the payload (the regex span alone would truncate there)."""
        from pspcz_analyzer_spark.operators.docparse import extract_pdf_text

        content = b"BT (before endstream after) Tj (tail survives) Tj ET"
        df = spark.createDataFrame(
            [(1, _mini_pdf(content, compress=False))],
            "doc_id long, content binary",
        )
        text = extract_pdf_text(df).collect()[0]["text"]
        assert "before endstream after" in text
        assert "tail survives" in text

    def test_deflate_payload_ending_in_newline_byte(self, spark):
        """A compressed payload legitimately ending in 0x0A must decompress
        (the old rstrip of the regex span would eat the real final byte)."""
        import zlib

        from pspcz_analyzer_spark.operators.docparse import extract_pdf_text

        content = None
        for i in range(20000):  # find a payload whose zlib stream ends in \n
            cand = b"BT (needle %d) Tj ET" % i
            if zlib.compress(cand)[-1:] in (b"\n", b"\r"):
                content = cand
                break
        assert content is not None, "no candidate compressed to a \\n tail"
        df = spark.createDataFrame(
            [(1, _mini_pdf(content))], "doc_id long, content binary"
        )
        text = extract_pdf_text(df).collect()[0]["text"]
        assert b"needle" in text.encode() and content.split(b"(")[1].split(b")")[0].decode() in text
