"""Span-offset invariants: exact intervals into the extracted text,
non-overlapping, strictly increasing, reconstructing every non-empty
line — independently recomputed from the canonical fixture text."""

import hashlib

from hypothesis import given, settings, strategies as st

from pdf_parser_spark.fixtures import fixture_docs
from pdf_parser_spark.ops.spans import extract_spans, line_spans
from pdf_parser_spark.pages_source import fixture_pages_df


def _canonical(doc_text, mode):
    t = doc_text.replace("\f", "\n")
    if mode == "pdf":
        return "\n".join(l for l in t.split("\n") if l != "")
    if mode == "html":
        return "\n".join(l for l in t.split("\n") if l.strip())
    return doc_text


def test_line_spans_slice_identity():
    text = "alpha\n\nbeta gamma\n \ndelta"
    spans = line_spans(text)
    assert [text[s:e] for s, e in spans] == ["alpha", "beta gamma",
                                             " ", "delta"]
    # non-overlapping, strictly increasing
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2 and s1 < e1


@given(st.text(max_size=400))
@settings(max_examples=120, deadline=None)
def test_line_spans_invariants_hold_for_arbitrary_text(text):
    spans = line_spans(text)
    prev_end = -1
    for s, e in spans:
        seg = text[s:e]
        assert s < e and "\n" not in seg and seg != ""
        assert s > prev_end
        prev_end = e
    # completeness: the spans are exactly the non-empty lines
    assert [text[s:e] for s, e in spans] == \
        [l for l in text.split("\n") if l]


def test_extract_spans_matches_canonical_text(spark):
    rows = extract_spans(fixture_pages_df(spark)).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    modes = ("pdf", "html", "text")
    for i, doc in enumerate(fixture_docs()):
        canon = _canonical(doc["text"], modes[i % 3])
        got = sorted(by_url.get(doc["url"], []), key=lambda r: r.span_no)
        want = line_spans(canon)
        assert [(r.start, r.end) for r in got] == want, doc["url"]
        for r in got:
            seg = canon[r.start:r.end]
            assert r.n_chars == len(seg)
            assert r.line_sha256 == hashlib.sha256(
                seg.encode("utf-8")).hexdigest()
