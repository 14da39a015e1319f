"""Generate golden expected outputs by executing the READ-ONLY reference
implementation at /root/reference over the fixture corpus.

Dev-time-only tool: the goldens are committed as JSON so the test suite
is standalone (it never imports the reference).  The reference needs
pdfplumber (absent here), so a minimal fake is installed that treats the
"pdf bytes" as utf-8 text with ``\f`` page separators — the reference's
text-layer semantics (join pages with '\n', split lines, normalize) are
untouched.  The reference's nondeterministic ``datetime.utcnow().year``
fallback (base.py:54) is pinned to each fixture's warc_ts year.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import io
import json
import pathlib
import sys
import types

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")
sys.path.insert(0, str(REPO))

# ---- fake pdfplumber: bytes are utf-8 text, \f separates pages ----
fake = types.ModuleType("pdfplumber")


class _Page:
    def __init__(self, text: str):
        self._text = text

    def extract_text(self, **kwargs):
        return self._text

    def extract_tables(self):
        return []


class _Pdf:
    def __init__(self, data: bytes):
        self.pages = [_Page(p) for p in data.decode("utf-8").split("\f")]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _fake_open(file_like):
    data = file_like.read() if hasattr(file_like, "read") else bytes(file_like)
    return _Pdf(data)


fake.open = _fake_open
sys.modules["pdfplumber"] = fake

sys.path.insert(0, str(REFERENCE))

import parsers.base as ref_base  # noqa: E402
from parsers import REGISTRY, detect_bank_from_text  # noqa: E402
from parsers.bofa_relationship import BOFARelationshipParser  # noqa: E402
from parsers.common import normalize_transactions  # noqa: E402

from pdf_parser_spark.fixtures import fixture_docs  # noqa: E402


class _PinnedDatetime:
    """Stand-in for parsers.base.datetime pinning utcnow()."""

    def __init__(self, year: int):
        self._year = year

    def utcnow(self):
        class _Now:
            pass

        now = _Now()
        now.year = self._year
        return now


def run_reference(text: str, warc_year: int, issuer_hint=None):
    pdf_bytes = text.encode("utf-8")
    ref_base.datetime = _PinnedDatetime(warc_year)
    full_text = ref_base.extract_full_text(io.BytesIO(pdf_bytes))
    bank = issuer_hint or detect_bank_from_text(full_text)
    if bank == "bofa_relationship":
        parser = BOFARelationshipParser()
    else:
        parser_cls = REGISTRY.get(bank) or REGISTRY["generic"]
        parser = parser_cls()
    raw = parser.parse(pdf_bytes, full_text)
    txs = normalize_transactions(raw)
    return bank, txs


def main():
    goldens = {}
    for doc in fixture_docs():
        bank, txs = run_reference(
            doc["text"], doc["warc_ts"].year, doc["issuer_hint"]
        )
        goldens[doc["url"]] = {"bank": bank, "txs": txs}
        print("%-55s %-18s %4d txs" % (doc["url"], bank, len(txs)))
        if doc["issuer_hint"]:
            # what pure detection (no hint) yields — the pipeline path
            dbank, dtxs = run_reference(doc["text"], doc["warc_ts"].year)
            goldens[doc["url"] + "#detected"] = {"bank": dbank, "txs": dtxs}
    out = REPO / "tests" / "golden" / "expected_tx.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(goldens, indent=1, ensure_ascii=False))
    print("wrote", out)


if __name__ == "__main__":
    main()
