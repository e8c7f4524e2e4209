"""Document-parser UDTFs (SURVEY X2-X4, F6-F9, in-parser W3).

The reference's semantic heart is ~1,000 lines of regex state machines that
turn stenographic-protocol / PDF text into structured amendment-vote rows
(/root/reference/pspcz_analyzer/services/amendments/steno_parser.py:21-152,
415-683, pdf_parser.py:21-125). Per SURVEY §7.2 the non-relational control
flow (challenge blocks inheriting the previous block's letter and linking
its vote number) stays INSIDE the per-document parser rather than being
forced relational.

Spark-first shape: a generic Arrow-batched ``mapInPandas`` UDTF runner —
one document in, many record rows out, documents distributed across
executors, state confined to one document at a time (bounded memory no
matter the corpus size) — plus a concrete steno-like parser implementing
the reference's block semantics:

* a block = paragraph; each voting block carries "Hlasování č. N: outcome";
* amendment letters ("Pozměňovací návrh X") name the proposal voted on;
* challenge blocks ("námitka") are re-votes: they inherit the previous
  block's letter and link the original vote number (carry-forward state);
* the final whole-bill vote is flagged ("jako celku") and carries no letter.

The regexes are this engine's own; the reference's parser is consulted for
BEHAVIOR only (its unit suites define the semantics above).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

RECORD_SCHEMA = (
    "doc_id long, seq int, letter string, vote_number int, outcome string, "
    "is_revote boolean, original_vote_number int, is_final boolean"
)

ParseFn = Callable[[int, str], list[dict[str, Any]]]


def parse_documents(
    df: DataFrame,
    parse_fn: ParseFn,
    schema: str = RECORD_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Generic document-parser UDTF: run ``parse_fn(doc_id, text)`` per row,
    emit its record dicts as rows. Arrow-batched; parser state never spans
    documents, so partitioning is free (hash on any column)."""
    import pandas as pd

    from pspcz_analyzer_spark.operators.partitioning import spread

    # Parsing is Python-CPU-bound and per-document: widen AQE-coalesced or
    # single-file inputs so they can't starve the executors, but let a
    # well-split scan (the 100 TB case — file splits already saturate the
    # cluster) ride its scan partitioning with NO text shuffle. The input
    # contract here is the documents table (scan+projection), so the
    # partition probe is declared safe.
    src = spread(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        scan_shaped=True,
    )
    field_names = [f.split()[0].strip() for f in schema.split(",")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records: list[dict[str, Any]] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                records.extend(parse_fn(int(doc_id), text or ""))
            yield pd.DataFrame(records, columns=field_names)

    return src.mapInPandas(run, schema=schema)


# -- steno-like parser ------------------------------------------------------

_VOTE = re.compile(r"[Hh]lasování\s+č(?:íslo|\.)\s*(\d+)\s*:\s*(přijat\w*|zamítnut\w*)", re.IGNORECASE)
_LETTER = re.compile(r"[Pp]ozměňovací\s+návrh\w*\s+([A-Z]\d?)")
_CHALLENGE = re.compile(r"námitk", re.IGNORECASE)
_FINAL = re.compile(r"jako\s+celku", re.IGNORECASE)


def parse_steno_like(doc_id: int, text: str) -> list[dict[str, Any]]:
    """Blocks -> amendment-vote records with challenge carry-forward
    (the reference's _blocks_to_amendments semantics,
    steno_parser.py:415-478)."""
    records: list[dict[str, Any]] = []
    last_letter = ""
    last_vote: int | None = None
    for seq, block in enumerate(b for b in text.split("\n\n") if b.strip()):
        m = _VOTE.search(block)
        if not m:
            continue
        vote_number = int(m.group(1))
        outcome = "accepted" if m.group(2).lower().startswith("přijat") else "rejected"
        lm = _LETTER.search(block)
        challenge = bool(_CHALLENGE.search(block))
        is_final = bool(_FINAL.search(block))
        if lm:
            letter = lm.group(1)
        elif challenge and last_letter:
            letter = last_letter  # carry-forward: re-vote of the same proposal
        else:
            letter = ""
        records.append(
            {
                "doc_id": doc_id,
                "seq": seq,
                "letter": letter,
                "vote_number": vote_number,
                "outcome": outcome,
                "is_revote": challenge and last_vote is not None,
                "original_vote_number": last_vote if challenge else None,
                "is_final": is_final,
            }
        )
        last_vote = vote_number
        if lm:
            last_letter = lm.group(1)
    return records


def parse_steno_documents(docs: DataFrame) -> DataFrame:
    """Steno-like documents -> amendment-vote record table."""
    return parse_documents(docs, parse_steno_like)


# -- amendment-PDF text parser ---------------------------------------------

LETTER_SCHEMA = (
    "doc_id long, letter string, submitters array<string>, n_subs int"
)

# Letter header "A. Poslanec Jan Novák" / multi-submitter tails; sub-items
# "A.1." with optional document number (pdf_parser.py:21-40 semantics).
_HEADER = re.compile(
    r"^([A-Z])\.\s+[Pp]oslan\w+\s+(.+?)\s*$", re.MULTILINE
)
_SUB_ITEM = re.compile(r"^([A-Z])\.(\d+)\.", re.MULTILINE)
_NAME_SPLIT = re.compile(r"[,\s]+(?:a\s+)?poslan\w+\s+", re.IGNORECASE)
_TITLES = re.compile(r"\b(?:Ing|Mgr|JUDr|MUDr|PhDr|RNDr|doc|prof|Bc|MBA|Ph\.D)\.\s*")


def _clean_name(raw: str) -> str:
    return _TITLES.sub("", raw.strip().rstrip(",.:;")).strip()


def parse_amendment_text(doc_id: int, text: str) -> list[dict[str, Any]]:
    """Amendment-document text -> one record per letter with its submitters
    (academic titles stripped, multi-submitter headers split) and the count
    of its sub-amendments ("A.1." items) — the pdf_parser.py:161-259 shape.

    The PDF->text step itself is ingestion (binary -> text via PyMuPDF
    when installed, else the pure-Python fallback — see extract_pdf_text);
    this parser is the engine-side half and is fully real.
    """
    subs_per_letter: dict[str, int] = {}
    for m in _SUB_ITEM.finditer(text):
        subs_per_letter[m.group(1)] = subs_per_letter.get(m.group(1), 0) + 1
    records = []
    for m in _HEADER.finditer(text):
        letter, raw = m.group(1), m.group(2)
        names = [n for n in (_clean_name(p) for p in _NAME_SPLIT.split(raw)) if n]
        records.append(
            {
                "doc_id": doc_id,
                "letter": letter,
                "submitters": names,
                "n_subs": subs_per_letter.get(letter, 0),
            }
        )
    return records


def parse_amendment_documents(docs: DataFrame) -> DataFrame:
    return parse_documents(docs, parse_amendment_text, schema=LETTER_SCHEMA)


# -- minimal pure-Python PDF text fallback ---------------------------------
#
# PyMuPDF is the preferred S7 codec but absent from some runtimes; this
# fallback handles the dominant text-PDF shape — uncompressed or
# FlateDecode content streams with standard text-showing operators
# (Tj / ' / TJ arrays, literal and hex strings). It does NOT implement
# font/CID decoding (bytes decode as UTF-8-else-Latin-1 best effort),
# other filters (DCT, LZW, ...), or encryption (raises). Layout fidelity
# is line-per-text-block, which is what the downstream regex parsers need
# (they match headers/markers, not positions).

_PDF_STREAM = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# Direct /Length only — "/Length 8 0 R" is an indirect reference whose value
# lives in another object; the lookahead rejects it so we fall back to the
# regex span rather than slicing with an object NUMBER as the byte count.
_PDF_LENGTH = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
# Literal (...) or hex <...> string token — both appear in Tj AND inside
# TJ arrays (hex is the normal output of CID-keyed producers).
_PDF_STRING = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>", re.DOTALL)
# One alternation so Tj / ' singles and TJ arrays surface in DOCUMENT order.
_PDF_SHOW = re.compile(
    rb"(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>)\s*(?:Tj|')"
    rb"|\[((?:\((?:\\.|[^\\()])*\)|[^\]\(])*)\]\s*TJ",
    re.DOTALL,
)
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(lit: bytes) -> bytes:
    """Literal-string body (parens stripped) -> raw bytes per PDF rules
    (named escapes, \\ddd octal, line-continuation backslash)."""
    out, i, n = bytearray(), 0, len(lit)
    while i < n:
        c = lit[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = lit[i + 1 : i + 2]
        if nxt in _PDF_ESCAPES:
            out += _PDF_ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < min(i + 4, n) and lit[j : j + 1].isdigit():
                j += 1
            out.append(int(lit[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2 + (lit[i + 1 : i + 3] == b"\r\n")
        else:
            out += nxt
            i += 2
    return bytes(out)


def _pdf_string_bytes(tok: bytes) -> bytes:
    if tok.startswith(b"("):
        return _pdf_unescape(tok[1:-1])
    hx = re.sub(rb"\s", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"  # PDF pads an odd final digit with zero
    return bytes.fromhex(hx.decode("ascii"))


def _pdf_text_fallback(data: bytes) -> str:
    import zlib

    if b"/Encrypt" in data:
        raise NotImplementedError(
            "encrypted PDF: the pure-Python fallback does not decrypt; "
            "install PyMuPDF or land text via the documents table"
        )
    lines: list[str] = []
    for m in _PDF_STREAM.finditer(data):
        body = m.group(1)
        # The stream dict immediately precedes the 'stream' keyword.
        head = data[max(0, m.start() - 400) : m.start()]
        # A direct /Length gives the EXACT payload size — the regex span
        # ends at the first 'endstream', which truncates any compressed
        # payload that happens to contain those bytes.
        lm = _PDF_LENGTH.search(head)
        if lm:
            body = data[m.start(1) : m.start(1) + int(lm.group(1))]
        if b"/FlateDecode" in head:
            try:
                # decompressobj tolerates trailing bytes (the EOL before
                # 'endstream'), so the payload is never rstrip-mangled —
                # a deflate stream may legitimately END in 0x0A/0x0D.
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" in head:
            continue  # unsupported filter (image codecs etc.)
        if b"Tj" not in body and b"TJ" not in body and b"'" not in body:
            continue
        for m in _PDF_SHOW.finditer(body):
            if m.group(1) is not None:
                raw = _pdf_string_bytes(m.group(1))
            else:
                raw = b"".join(
                    _pdf_string_bytes(tok.group(0))
                    for tok in _PDF_STRING.finditer(m.group(2))
                )
            # Per-chunk decode: one stream can mix producers (UTF-8 text
            # alongside octal-escaped Latin-1), so a whole-stream decode
            # would mojibake the clean chunks.
            try:
                lines.append(raw.decode("utf-8"))
            except UnicodeDecodeError:
                lines.append(raw.decode("latin-1"))
    return "\n".join(lines)


def extract_pdf_text(df: DataFrame, content_col: str = "content") -> DataFrame:
    """PDF binary -> text (SURVEY S7): binary in, text out via Arrow-batched
    mapInPandas. Uses PyMuPDF when installed; otherwise the pure-Python
    Flate/literal-text fallback above (sufficient for the reference's
    text-born amendment PDFs; see its limits in the fallback docstring)."""

    def run(batches):
        try:
            import fitz  # noqa: F401  (PyMuPDF)
        except ImportError:
            fitz = None
        for pdf in batches:
            texts = []
            for blob in pdf[content_col]:
                if fitz is not None:  # pragma: no cover - needs PyMuPDF
                    doc = fitz.open(stream=bytes(blob), filetype="pdf")
                    texts.append("\n".join(page.get_text() for page in doc))
                else:
                    texts.append(_pdf_text_fallback(bytes(blob)))
            out = pdf.drop(columns=[content_col])
            out["text"] = texts
            yield out

    fields = [f"{c} {t}" for c, t in df.drop(content_col).dtypes]
    return df.mapInPandas(run, schema=", ".join([*fields, "text string"]))
