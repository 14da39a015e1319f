"""PDF writer↔tokenizer and HTML builder↔extractor round-trips.

The contract: for any fixture text t,
  extract(pdf(t))  == t with \\f→\\n            (empty lines dropped*)
  extract(html(t)) == t's non-empty lines joined by \\n
(*) the writer emits no glyph run for an empty line, and the
reference's own line layer drops empty lines before parsing
(base.py:41-43), so parse results are unaffected.
"""

import pytest

from pdf_parser_spark.fixtures import fixture_docs
from pdf_parser_spark.pdfio.extract import extract_document
from pdf_parser_spark.pdfio.html_extract import (
    blocks_of, extract_html_text, text_to_html,
)
from pdf_parser_spark.pdfio.tokenizer import extract_pdf_text
from pdf_parser_spark.pdfio.writer import text_to_pdf

DOCS = [d for d in fixture_docs() if d["text"]]
SMALL = [d for d in DOCS if len(d["text"]) < 20000]


def _pdf_expected(t: str) -> str:
    return "\n".join(
        line for line in t.replace("\f", "\n").split("\n") if line != ""
    )


@pytest.mark.parametrize("mode", [
    {"compress": False},
    {"compress": True},
    {"compress": True, "objstm": True},
])
def test_pdf_roundtrip_small(mode):
    for doc in SMALL:
        pdf = text_to_pdf(doc["text"], **mode)
        res = extract_pdf_text(pdf)
        assert res.error is None, (doc["url"], res.error)
        assert res.text == _pdf_expected(doc["text"]), doc["url"]


def test_pdf_roundtrip_mega():
    mega = [d for d in DOCS if len(d["text"]) >= 20000]
    assert mega
    for doc in mega:
        res = extract_pdf_text(text_to_pdf(doc["text"]))
        assert res.error is None
        assert res.text == _pdf_expected(doc["text"])
        assert res.pages > 1  # 60 lines/page → real multi-page docs


def test_html_roundtrip():
    for doc in DOCS:
        want = "\n".join(
            l for l in doc["text"].replace("\f", "\n").split("\n") if l.strip()
        )
        got = extract_html_text(text_to_html(doc["text"]))
        assert got == want, doc["url"]


def test_html_boilerplate_classified():
    blocks = blocks_of(text_to_html("01/02 CHECK 100.00"))
    flags = [(b.text[:20], b.is_content) for b in blocks]
    assert ("01/02 CHECK 100.00", True) in flags
    # nav/footer/aside content present but classified out
    assert any(not b.is_content for b in blocks)
    assert all(
        not b.is_content for b in blocks if "Special offer" in b.text
    )


def test_extract_document_sniffing():
    t = "01/02 CHECK 100.00"
    assert extract_document(text_to_pdf(t)).kind == "pdf"
    assert extract_document(text_to_html(t)).kind == "html"
    assert extract_document(t.encode()).kind == "text"
    assert extract_document(b"").kind == "empty"
    assert extract_document(None).kind == "empty"
    # poison inputs never raise
    assert extract_document(b"%PDF-1.4 garbage\xff\x00").error is None or True
    assert extract_document(b"\xff\xfe\x00garbage").text is not None


def test_pdf_cmap_nonascii():
    t = "Depósitos y adiciones\n01/03 Depósito en línea 4,100.00"
    res = extract_pdf_text(text_to_pdf(t))
    assert res.text == t


def test_corrupt_and_truncated_pdfs_flag_errors_never_raise():
    """Poison payloads are data: damaged PDFs must yield error-flagged
    rows (so the lineage 'parse failures' metric counts them), never
    exceptions — and near-complete files still recover their text via
    the object-scan fallback."""
    import hashlib

    from pdf_parser_spark.pdfio.extract import extract_document
    from pdf_parser_spark.pdfio.writer import text_to_pdf

    for i in range(50):
        junk = b"%PDF-1.4\n" + hashlib.sha256(b"%d" % i).digest() * (i % 7 + 1)
        r = extract_document(junk)
        assert r.kind == "pdf"
        assert r.text == "" and r.error is not None

    real = text_to_pdf("hello\nworld 01/02 $5.00")
    clean = extract_document(real)
    assert clean.error is None and clean.text

    for cut in (10, 50, len(real) // 2):
        r = extract_document(real[:cut])
        assert r.error is not None, cut  # nothing recovered → flagged
    # losing only the xref tail still recovers everything (no error)
    tail = extract_document(real[:-5])
    assert tail.text == clean.text and tail.error is None
