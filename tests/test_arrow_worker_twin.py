"""Round-6 optimization pin: the arrow-native fidelity worker
(pipeline._parse_arrow_batches) must be row-identical to the pandas
twin (_parse_batches) — the rewrite exists purely to cut output-frame
construction cost (pa.nulls vs per-cell object conversion)."""

import pandas as pd
import pyarrow as pa


def _rows_via_pandas(batch_pdf):
    from pdf_parser_spark.pipeline import _parse_batches

    frames = list(_parse_batches(iter([batch_pdf])))
    out = pd.concat(frames, ignore_index=True).astype(object)
    out = out.where(out.notna(), None)
    return sorted(map(tuple, out.values.tolist()))


def _rows_via_arrow(batch_pdf):
    from pdf_parser_spark.pipeline import _parse_arrow_batches

    rb = pa.RecordBatch.from_pandas(batch_pdf, preserve_index=False)
    outs = list(_parse_arrow_batches(iter([rb])))
    rows = []
    for b in outs:
        rows.extend(map(tuple, zip(*[c.to_pylist() for c in b.columns])))
    return sorted(rows)


def test_arrow_worker_matches_pandas_twin():
    from pdf_parser_spark.pages_source import fixture_pages_rows

    rows = fixture_pages_rows(repeat=1)
    batch = pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                        "text", "lang"])
    batch = batch[["url", "warc_ts", "html", "text"]]
    got = _rows_via_arrow(batch)
    want = _rows_via_pandas(batch)
    assert len(got) == len(want) and len(got) > 0
    assert got == want


def test_arrow_worker_null_warc_ts():
    """Null warc_ts arrives as None through Arrow — must hit the 1970
    fallback, mirroring the pandas twin's NaT handling."""
    batch = pd.DataFrame({
        "url": ["u1"],
        "warc_ts": [pd.NaT],
        "html": [None],
        "text": ["chase.com statement\n01/03 Deposit 100.00"],
    })
    got = _rows_via_arrow(batch)
    want = _rows_via_pandas(batch)
    assert got == want
