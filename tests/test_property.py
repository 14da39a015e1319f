"""Property-based robustness: arbitrary text can flow through every
parser and the PDF layer without exceptions, and outputs always hold
the normalizer's invariants (amount ≥ 0, direction enum, ISO date
shape, stable date sort).  At 10^12 documents, 'never raises' is a
correctness property, not a nicety.
"""

import re
import string

from hypothesis import given, settings, strategies as st

from pdf_parser_spark.engine.banks import ALL_PARSERS
from pdf_parser_spark.engine.document import parse_document
from pdf_parser_spark.pdfio.extract import extract_document
from pdf_parser_spark.pdfio.html_extract import extract_html_text
from pdf_parser_spark.pdfio.tokenizer import extract_pdf_text
from pdf_parser_spark.pdfio.writer import text_to_pdf

_DATE_RE = re.compile(r"^-?\d{1,6}-\d{2}-\d{2}$")

# statement-ish line soup: dates, amounts, keywords, noise, unicode
_line = st.one_of(
    st.text(alphabet=string.printable, max_size=80),
    st.builds(
        lambda m, d, desc, amt: "%02d/%02d %s %s" % (m, d, desc, amt),
        st.integers(0, 19), st.integers(0, 39),
        st.text(alphabet=string.ascii_letters + " ", max_size=30),
        st.sampled_from(["$1,234.56", "(-42.00)", "63.43-", "0.01",
                         "99,000,000.00", "", "WIRE OUT", "ACH CREDIT"]),
    ),
    st.sampled_from([
        "Deposits and additions", "Retiros electrónicos", "Cargos",
        "Daily ledger balances", "Page 3 of 9", "*start*summary*end*",
        "Wire Transfer Fee 30.00 16.00", "Total deposits and other credits",
        "Savings Activity", "Checking Activity",
    ]),
)
_doc_text = st.lists(_line, max_size=40).map("\n".join)


@settings(max_examples=150, deadline=None)
@given(_doc_text, st.integers(1990, 2100))
def test_parse_document_total_function(text, year):
    bank, txs = parse_document(text, year)
    assert isinstance(bank, str)
    dates = [t["date"] for t in txs]
    assert dates == sorted(dates)  # normalizer's stable date sort
    for t in txs:
        assert t["amount"] >= 0
        assert t["direction"] in ("in", "out", "unknown")
        assert _DATE_RE.match(t["date"]), t["date"]


@settings(max_examples=60, deadline=None)
@given(_doc_text)
def test_every_parser_never_raises(text):
    from pdf_parser_spark.engine.textrules import split_lines

    lines = split_lines(text)
    for name, fn in ALL_PARSERS.items():
        fn(lines, 2024)  # must not raise, any issuer × any text


@settings(max_examples=40, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x024F),
    max_size=400,
))
def test_pdf_roundtrip_arbitrary_text(text):
    """writer→tokenizer round-trips any latin-ish text (chars beyond
    the 1-byte custom font raise a clean ValueError in the writer)."""
    try:
        pdf = text_to_pdf(text)
    except ValueError:
        return  # >127 distinct non-ASCII chars: documented writer limit
    res = extract_pdf_text(pdf)
    assert res.error is None
    want = "\n".join(
        # the writer emits no glyph run for whitespace-only lines, and
        # the y-sweep joins runs with single spaces (kerned TJ form)
        " ".join(l.split()) for l in text.replace("\f", "\n").split("\n")
        if l.split()
    )
    got = "\n".join(" ".join(l.split()) for l in res.text.split("\n")
                    if l.split())
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2000))
def test_extractors_never_raise_on_garbage(payload):
    assert extract_document(payload) is not None
    assert extract_pdf_text(payload).text is not None
    assert extract_html_text(payload) is not None
