"""Materialize the golden-expected outputs of the fidelity pipeline as
parquet fixtures the DuckDB oracle can ``SELECT`` from — turning the
driver's rows-only checks for ``fidelity_pipeline`` and
``extraction_metrics`` into full rows+schema+hash comparisons.

Provenance of each column (what the oracle actually asserts):
* expected_tx.parquet — (url, tx_index, bank, date, description,
  amount, direction): REFERENCE-derived, straight from
  tests/golden/expected_tx.json (produced by executing the read-only
  reference, tools/gen_goldens.py).  The pipeline path uses pure
  detection, so hinted fixtures take their ``#detected`` golden
  variant.
* expected_doc_metrics.parquet —
  - url/bank/tx_count: reference-derived (goldens, detected variant);
  - kind: the fixture payload mode cycle (pdf/html/text);
  - n_chars/text_sha256: INDEPENDENT ground truth — the canonical
    fixture text per payload mode; this is the byte-identical-text
    gate of the BASELINE north rule expressed as an oracle;
  - pages/n_lines: INDEPENDENT ground truth, derived from fixture
    construction parameters — pages from the renderer's page-break
    arithmetic (one physical page per 60 rendered lines per \\f
    chunk, pdfio/writer.PAGE_LINES; html/text payloads are
    single-page), n_lines from the canonical text's non-blank line
    count (the documented normalization contract, reference
    base.py:18-19: NBSP→space then strip).  The engine's own values
    are cross-ASSERTED against these at generation time but never
    stored;
  - blocks_total/blocks_kept: engine-derived tally counters, pinned
    here as regression goldens (disclosed: no independent oracle
    exists for the reference's internal block bookkeeping);
  - error: None for the whole fixture corpus.
* expected_media_features.parquet / expected_media_frames.parquet —
  INDEPENDENT ground truth: feature values and frame hashes computed
  from the ENCODE-side pixel/sample arrays at fixture construction
  (ops/multimodal.fixture_media); the pipeline decodes the payload
  bytes with its own codecs, so matching is a real round-trip check.

Regenerate (after ``tools/gen_goldens.py``) whenever fixtures.py or
the tally semantics change: ``python tools/gen_expected_parquet.py``.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pdf_parser_spark.engine.document import parse_document  # noqa: E402
from pdf_parser_spark.fixtures import fixture_docs  # noqa: E402
from pdf_parser_spark.pages_source import _MODES, fixture_pages_rows  # noqa: E402
from pdf_parser_spark.pdfio.extract import extract_document  # noqa: E402

GOLDEN_DIR = REPO / "tests" / "golden"


def constructed_pages(doc_text: str, mode: str) -> int:
    """Page count from construction parameters alone: the PDF renderer
    emits one physical page per PAGE_LINES rendered lines within each
    ``\\f`` chunk (pdfio/writer.text_to_pdf); html/text are one page."""
    from pdf_parser_spark.pdfio.writer import PAGE_LINES

    if mode != "pdf":
        return 1
    total = 0
    for chunk in doc_text.split("\f"):
        n = max(1, len(chunk.split("\n")))
        total += -(-n // PAGE_LINES)  # ceil
    return total


def constructed_n_lines(canon: str) -> int:
    """Non-blank line count of the canonical text under the documented
    normalization contract (NBSP→space, strip — reference
    base.py:18-19)."""
    return sum(1 for l in canon.split("\n")
               if l.replace("\u00a0", " ").strip())


def canonical_text(doc_text: str, mode: str) -> str:
    """What byte-identical extraction must yield per payload mode
    (same canon as tests/test_pipeline_spark.py::test_text_hash_gate)."""
    t = doc_text.replace("\f", "\n")
    if mode == "pdf":
        return "\n".join(l for l in t.split("\n") if l != "")
    if mode == "html":
        return "\n".join(l for l in t.split("\n") if l.strip())
    return doc_text


def main() -> None:
    golden = json.loads((GOLDEN_DIR / "expected_tx.json").read_text())

    def expected(url):
        return golden.get(url + "#detected", golden[url])

    # ---- expected_tx: reference-derived transaction rows
    tx = {k: [] for k in ("url", "tx_index", "bank", "date",
                          "description", "amount", "direction")}
    docs = fixture_docs()
    for doc in docs:
        want = expected(doc["url"])
        for i, t in enumerate(want["txs"]):
            tx["url"].append(doc["url"])
            tx["tx_index"].append(i)
            tx["bank"].append(want["bank"])
            tx["date"].append(t["date"])
            tx["description"].append(t["description"])
            tx["amount"].append(float(t["amount"]))
            tx["direction"].append(t["direction"])
    tx_schema = pa.schema([
        ("url", pa.string()), ("tx_index", pa.int32()),
        ("bank", pa.string()), ("date", pa.string()),
        ("description", pa.string()), ("amount", pa.float64()),
        ("direction", pa.string()),
    ])
    pq.write_table(pa.table(tx, schema=tx_schema),
                   GOLDEN_DIR / "expected_tx.parquet")
    print("expected_tx.parquet: %d rows" % len(tx["url"]))

    # ---- expected_doc_metrics
    payload_by_url = {r[0]: r[2] for r in fixture_pages_rows()}
    dm = {k: [] for k in ("url", "bank", "kind", "pages", "n_lines",
                          "n_chars", "blocks_total", "blocks_kept",
                          "tx_count", "text_sha256", "error")}
    for i, doc in enumerate(docs):
        mode = _MODES[i % len(_MODES)]
        canon = canonical_text(doc["text"], mode)
        pages = constructed_pages(doc["text"], mode)
        n_lines = constructed_n_lines(canon)
        if mode != "text":
            # cross-check only — the stored value is construction-derived
            extracted = extract_document(payload_by_url[doc["url"]])
            assert extracted.text == canon, doc["url"]
            assert extracted.pages == pages, \
                "%s: extractor pages %d != constructed %d" \
                % (doc["url"], extracted.pages, pages)
        tally: dict = {}
        bank, txs = parse_document(canon, doc["warc_ts"].year, tally=tally)
        want = expected(doc["url"])
        assert bank == want["bank"] and len(txs) == len(want["txs"]), \
            doc["url"]
        assert tally.get("n_lines", 0) == n_lines, \
            "%s: engine n_lines %d != constructed %d" \
            % (doc["url"], tally.get("n_lines", 0), n_lines)
        # blocks_kept: every parser notes blocks_kept exactly once per
        # emitted transaction (incl. the bofa wire-fee multi-emit, which
        # notes per emitted fee), so the stored value derives from the
        # REFERENCE-EXECUTED golden tx count, not from our engine; the
        # engine tally is only cross-checked here (round-4 ADVICE/ask
        # #9).  blocks_total has no construction-side counterpart — it
        # counts parser-internal gather attempts (noise-broken gathers
        # included), a quantity only the block machine itself defines —
        # and stays a documented engine regression pin.
        assert tally.get("blocks_kept", 0) == len(want["txs"]), \
            "%s: engine blocks_kept %d != golden tx count %d" \
            % (doc["url"], tally.get("blocks_kept", 0), len(want["txs"]))
        dm["url"].append(doc["url"])
        dm["bank"].append(want["bank"])
        dm["kind"].append(mode)
        dm["pages"].append(pages)
        dm["n_lines"].append(n_lines)
        dm["n_chars"].append(len(canon))
        dm["blocks_total"].append(tally.get("blocks_total", 0))
        dm["blocks_kept"].append(len(want["txs"]))  # golden-derived
        dm["tx_count"].append(len(want["txs"]))
        dm["text_sha256"].append(
            hashlib.sha256(canon.encode("utf-8")).hexdigest())
        dm["error"].append(None)
    dm_schema = pa.schema([
        ("url", pa.string()), ("bank", pa.string()), ("kind", pa.string()),
        ("pages", pa.int32()), ("n_lines", pa.int32()),
        ("n_chars", pa.int64()), ("blocks_total", pa.int32()),
        ("blocks_kept", pa.int32()), ("tx_count", pa.int32()),
        ("text_sha256", pa.string()), ("error", pa.string()),
    ])
    pq.write_table(pa.table(dm, schema=dm_schema),
                   GOLDEN_DIR / "expected_doc_metrics.parquet")
    print("expected_doc_metrics.parquet: %d rows" % len(dm["url"]))

    # ---- expected spans: derived from the CANONICAL per-mode fixture
    # text (independent of the extractor — the byte-identical-text
    # invariant extended to character intervals)
    from pdf_parser_spark.ops.spans import line_spans
    sp = {k: [] for k in ("url", "span_no", "start", "end", "n_chars",
                          "line_sha256")}
    for i, doc in enumerate(docs):
        canon = canonical_text(doc["text"], _MODES[i % len(_MODES)])
        for k, (s, e) in enumerate(line_spans(canon)):
            sp["url"].append(doc["url"])
            sp["span_no"].append(k)
            sp["start"].append(s)
            sp["end"].append(e)
            sp["n_chars"].append(e - s)
            sp["line_sha256"].append(hashlib.sha256(
                canon[s:e].encode("utf-8")).hexdigest())
    sp_schema = pa.schema([
        ("url", pa.string()), ("span_no", pa.int32()),
        ("start", pa.int64()), ("end", pa.int64()),
        ("n_chars", pa.int32()), ("line_sha256", pa.string()),
    ])
    pq.write_table(pa.table(sp, schema=sp_schema),
                   GOLDEN_DIR / "expected_spans.parquet")
    print("expected_spans.parquet: %d rows" % len(sp["url"]))

    # ---- expected media features / frames (encode-side ground truth)
    from pdf_parser_spark.ops.multimodal import (
        expected_feature_rows, expected_frame_rows,
    )
    feats = expected_feature_rows(60)
    mf_schema = pa.schema([
        ("url", pa.string()), ("media_type", pa.string()),
        ("n_bytes", pa.int64()), ("width", pa.int32()),
        ("height", pa.int32()), ("channels", pa.int32()),
        ("duration_ms", pa.int32()), ("mean_luma", pa.float64()),
        ("sha256", pa.string()), ("decode_error", pa.string()),
    ])
    pq.write_table(
        pa.table({k: [r[k] for r in feats] for k in mf_schema.names},
                 schema=mf_schema),
        GOLDEN_DIR / "expected_media_features.parquet")
    print("expected_media_features.parquet: %d rows" % len(feats))

    frames = expected_frame_rows(60)
    fr_schema = pa.schema([
        ("url", pa.string()), ("frame_no", pa.int32()),
        ("ts_ms", pa.int32()), ("frame_sha256", pa.string()),
    ])
    pq.write_table(
        pa.table({k: [r[k] for r in frames] for k in fr_schema.names},
                 schema=fr_schema),
        GOLDEN_DIR / "expected_media_frames.parquet")
    print("expected_media_frames.parquet: %d rows" % len(frames))

    # ---- expected image near-dup pairs (encode-side brute force)
    from pdf_parser_spark.ops.multimodal import expected_neardup_rows
    nd = expected_neardup_rows(48)
    nd_schema = pa.schema([
        ("url_a", pa.string()), ("url_b", pa.string()),
        ("hamming", pa.int32()),
    ])
    pq.write_table(
        pa.table({k: [r[k] for r in nd] for k in nd_schema.names},
                 schema=nd_schema),
        GOLDEN_DIR / "expected_image_neardup.parquet")
    print("expected_image_neardup.parquet: %d rows" % len(nd))

    # ---- expected audio near-dup pairs (encode-side brute force)
    from pdf_parser_spark.ops.multimodal import expected_audio_neardup_rows
    au = expected_audio_neardup_rows(40)
    pq.write_table(
        pa.table({k: [r[k] for r in au] for k in nd_schema.names},
                 schema=nd_schema),
        GOLDEN_DIR / "expected_audio_neardup.parquet")
    print("expected_audio_neardup.parquet: %d rows" % len(au))

    # ---- expected video sub-clip containment (encode-side brute force)
    from pdf_parser_spark.ops.multimodal import expected_clip_rows
    vc = expected_clip_rows(18)
    vc_schema = pa.schema([
        ("url_outer", pa.string()), ("url_clip", pa.string()),
        ("n_common", pa.int32()), ("n_clip", pa.int32()),
        ("containment_pct", pa.int32()), ("verdict", pa.string()),
    ])
    pq.write_table(
        pa.table({k: [r[k] for r in vc] for k in vc_schema.names},
                 schema=vc_schema),
        GOLDEN_DIR / "expected_video_containment.parquet")
    print("expected_video_containment.parquet: %d rows" % len(vc))

    # ---- expected video scene cuts (encode-side scene plan)
    from pdf_parser_spark.ops.multimodal import expected_scene_rows
    sc = expected_scene_rows(16)
    sc_schema = pa.schema([
        ("url", pa.string()), ("scene_no", pa.int32()),
        ("start_frame", pa.int32()), ("n_frames", pa.int32()),
    ])
    pq.write_table(
        pa.table({k: [r[k] for r in sc] for k in sc_schema.names},
                 schema=sc_schema),
        GOLDEN_DIR / "expected_video_scenes.parquet")
    print("expected_video_scenes.parquet: %d rows" % len(sc))

    # ---- expected PDF link annotations (encode-side request list)
    from pdf_parser_spark.ops.spans import fixture_linked_pages, uri_host
    lk_schema = pa.schema([
        ("url", pa.string()), ("page_no", pa.int32()),
        ("link_no", pa.int32()), ("uri", pa.string()),
        ("uri_host", pa.string()),
    ])
    lrows = [
        {"url": url, "page_no": pno, "link_no": k, "uri": uri,
         "uri_host": uri_host(uri)}
        for url, _, exp in fixture_linked_pages()
        for pno, k, uri in exp
    ]
    pq.write_table(
        pa.table({k: [r[k] for r in lrows] for k in lk_schema.names},
                 schema=lk_schema),
        GOLDEN_DIR / "expected_pdf_links.parquet")
    print("expected_pdf_links.parquet: %d rows" % len(lrows))

    # ---- expected PDF outlines (encode-side request list)
    from pdf_parser_spark.ops.spans import fixture_outlined_pages
    ol_schema = pa.schema([
        ("url", pa.string()), ("item_no", pa.int32()),
        ("level", pa.int32()), ("title", pa.string()),
        ("page_no", pa.int32()),
    ])
    orows = [
        {"url": url, "item_no": k, "level": lv, "title": t,
         "page_no": pg}
        for url, _, exp in fixture_outlined_pages()
        for k, lv, t, pg in exp
    ]
    pq.write_table(
        pa.table({k: [r[k] for r in orows] for k in ol_schema.names},
                 schema=ol_schema),
        GOLDEN_DIR / "expected_pdf_outline.parquet")
    print("expected_pdf_outline.parquet: %d rows" % len(orows))

    # ---- expected AcroForm fields (encode-side request list)
    from pdf_parser_spark.ops.spans import fixture_form_pages
    ff_schema = pa.schema([
        ("url", pa.string()), ("field_no", pa.int32()),
        ("name", pa.string()), ("value", pa.string()),
    ])
    frows = [
        {"url": url, "field_no": k, "name": n, "value": v}
        for url, _, exp in fixture_form_pages()
        for k, n, v in exp
    ]
    pq.write_table(
        pa.table({k: [r[k] for r in frows] for k in ff_schema.names},
                 schema=ff_schema),
        GOLDEN_DIR / "expected_pdf_forms.parquet")
    print("expected_pdf_forms.parquet: %d rows" % len(frows))

    # ---- expected page labels (encode-side request, lookup-table
    # expansion independent of the reader's formatter)
    from pdf_parser_spark.ops.spans import fixture_labeled_pages
    pl_schema = pa.schema([
        ("url", pa.string()), ("page_no", pa.int32()),
        ("label", pa.string()),
    ])
    prows = [
        {"url": url, "page_no": pno, "label": lab}
        for url, _, exp in fixture_labeled_pages()
        for pno, lab in exp
    ]
    pq.write_table(
        pa.table({k: [r[k] for r in prows] for k in pl_schema.names},
                 schema=pl_schema),
        GOLDEN_DIR / "expected_pdf_labels.parquet")
    print("expected_pdf_labels.parquet: %d rows" % len(prows))

    # ---- expected document metadata (encode-side request, literal
    # ISO dates — not the reader's date parser)
    from pdf_parser_spark.ops.spans import fixture_meta_pages
    dm_schema = pa.schema([
        ("url", pa.string()), ("field", pa.string()),
        ("value", pa.string()), ("source", pa.string()),
    ])
    mrows = [
        {"url": url, "field": f, "value": v, "source": src}
        for url, _, exp in fixture_meta_pages()
        for f, v, src in exp
    ]
    pq.write_table(
        pa.table({k: [r[k] for r in mrows] for k in dm_schema.names},
                 schema=dm_schema),
        GOLDEN_DIR / "expected_pdf_meta.parquet")
    print("expected_pdf_meta.parquet: %d rows" % len(mrows))

    # ---- expected PDF table grids (encode-side request grid)
    from pdf_parser_spark.ops.spans import fixture_table_pages
    tg_schema = pa.schema([
        ("url", pa.string()), ("page_no", pa.int32()),
        ("row_no", pa.int32()), ("col_no", pa.int32()),
        ("cell", pa.string()),
    ])
    grows = [
        {"url": url, "page_no": p, "row_no": r, "col_no": c,
         "cell": cell}
        for url, _, exp in fixture_table_pages()
        for p, r, c, cell in exp
    ]
    pq.write_table(
        pa.table({k: [x[k] for x in grows] for k in tg_schema.names},
                 schema=tg_schema),
        GOLDEN_DIR / "expected_pdf_grids.parquet")
    print("expected_pdf_grids.parquet: %d rows" % len(grows))


if __name__ == "__main__":
    main()
