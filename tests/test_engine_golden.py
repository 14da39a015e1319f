"""Differential test: our engine vs goldens captured from the reference.

The goldens (tests/golden/expected_tx.json) were produced by executing
the read-only reference implementation over the same fixture corpus
(tools/gen_goldens.py) with the utcnow-year fallback pinned to
warc_ts.year.  Every (bank, date, description, amount, direction) must
match exactly — including float bit patterns (we compare via repr).
"""

import json
import pathlib

import pytest

from pdf_parser_spark.engine.document import parse_document
from pdf_parser_spark.fixtures import fixture_docs

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "expected_tx.json").read_text()
)

DOCS = {d["url"]: d for d in fixture_docs()}


@pytest.mark.parametrize("url", sorted(u for u in GOLDEN if "#" not in u))
def test_document_matches_reference(url):
    doc = DOCS[url]
    expected = GOLDEN[url]
    bank, txs = parse_document(
        doc["text"], doc["warc_ts"].year, issuer=doc["issuer_hint"]
    )
    assert bank == expected["bank"], "issuer detection diverged"
    assert len(txs) == len(expected["txs"]), (
        "tx count %d != %d" % (len(txs), len(expected["txs"]))
    )
    for i, (got, want) in enumerate(zip(txs, expected["txs"])):
        assert got["date"] == want["date"], (i, got, want)
        assert got["description"] == want["description"], (i, got, want)
        # float equality must be exact (bit-identical parse path)
        assert repr(got["amount"]) == repr(float(want["amount"])), (i, got, want)
        assert got["direction"] == want["direction"], (i, got, want)


def test_detection_variant_matches_reference():
    """The unregistered rel layout, parsed via pure detection (→ bofa),
    must also match the reference (the pipeline path exercises this)."""
    for url in GOLDEN:
        if not url.endswith("#detected"):
            continue
        doc = DOCS[url.split("#")[0]]
        want = GOLDEN[url]
        bank, txs = parse_document(doc["text"], doc["warc_ts"].year)
        assert bank == want["bank"]
        assert [
            (t["date"], t["description"], repr(t["amount"]), t["direction"])
            for t in txs
        ] == [
            (t["date"], t["description"], repr(float(t["amount"])),
             t["direction"])
            for t in want["txs"]
        ]


def test_corpus_covers_all_issuers():
    banks = {GOLDEN[u]["bank"] for u in GOLDEN}
    assert banks >= {
        "generic", "ifb", "valley", "mercury", "pnb", "wf", "citi",
        "truist", "bofa", "chase", "bofa_relationship",
    }


def test_rel_header_year_unit():
    """D19: 'for/to Month D, YYYY' header-year extraction (dead in the
    reference's parse flow — detect_year always returns first — but
    part of the public surface, SURVEY.md D19)."""
    from pdf_parser_spark.engine.banks import rel_header_year

    assert rel_header_year(
        "for October 1, 2024 to October 31, 2024") == 2024
    assert rel_header_year("to March 5, 2019 statement") == 2019
    assert rel_header_year("no period header here") is None
    assert rel_header_year("") is None
