"""Span offsets per url — the BASELINE north star asks extraction to
"emit main-content text AND span offsets per document".

``extract_spans`` runs the same payload extraction as the fidelity
pipeline and emits one row per non-empty line of the extracted text
with its exact character interval [start, end) into that text, plus a
line digest.  Invariants (pinned by tests and by the parquet-golden
oracle, whose expected rows are derived from the canonical fixture
text INDEPENDENTLY of the extractor):

* ``text[start:end]`` is exactly the span's content (no trimming);
* spans are non-overlapping, strictly increasing, and cover every
  non-empty line once — the original text is reconstructible from the
  spans plus newline positions;
* the per-line sha256 makes spans addressable for span-level lineage
  (training-data attribution, span-dedup) without shipping the text.

Arrow-batched ``mapInPandas``; flatMap-shaped (≫1 row out per doc);
same single-scan/no-per-row-Python rules as the pipeline.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame

SPANS_SCHEMA = (
    "url string, span_no int, start bigint, end bigint,"
    " n_chars int, line_sha256 string"
)


def line_spans(text: str) -> List[Tuple[int, int]]:
    """[start, end) intervals of the non-empty lines of ``text``
    (lines split on \\n; interval excludes the newline)."""
    out: List[Tuple[int, int]] = []
    pos = 0
    for line in text.split("\n"):
        end = pos + len(line)
        if line:
            out.append((pos, end))
        pos = end + 1  # the '\n'
    return out


def extract_spans(pages: DataFrame) -> DataFrame:
    """pages(url, html, text) → one row per non-empty extracted line."""
    from ..pdfio.extract import extract_document

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls, nos, starts, ends, lens, shas = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.html is not None:
                    payload = (bytes(row.html)
                               if not isinstance(row.html, bytes)
                               else row.html)
                    text = extract_document(payload).text
                else:
                    text = row.text or ""
                for k, (s, e) in enumerate(line_spans(text)):
                    urls.append(row.url)
                    nos.append(k)
                    starts.append(s)
                    ends.append(e)
                    lens.append(e - s)
                    shas.append(hashlib.sha256(
                        text[s:e].encode("utf-8")).hexdigest())
            yield pd.DataFrame({
                "url": urls, "span_no": nos, "start": starts, "end": ends,
                "n_chars": lens, "line_sha256": shas,
            })

    return pages.select("url", "html", "text").mapInPandas(
        batches, schema=SPANS_SCHEMA)
