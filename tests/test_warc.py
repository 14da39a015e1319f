"""WARC ingestion source: wire-format round-trips, malformed-record
tolerance, and the end-to-end demo lifecycle (its dual-engine oracle
parity runs via test_relational.test_oracle_parity[warc_ingest])."""

import gzip
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, n=40):
    return [(r[0], r[1]) for r in
            spark.read.parquet(SF_DIR + "/documents.parquet")
            .select("doc_id", "text").limit(n).collect()]


def test_warc_roundtrip_uncompressed(spark, tmp_path):
    """Plain .warc files: every record comes back with the exact html
    bytes, url, and date the writer rendered."""
    from pdf_parser_spark.warc import (
        read_warc, synth_date, synth_html, synth_url, write_warc_files,
    )

    rows = _docs(spark)
    write_warc_files(rows, str(tmp_path), n_files=3, compress=False)
    got = {r.url: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        r = got[synth_url(doc_id)]
        assert r.error is None
        assert r.warc_date == synth_date(doc_id)
        assert bytes(r.html) == synth_html(doc_id, text).encode("utf-8")
    # per-file record numbering is dense from 0
    by_file = {}
    for r in got.values():
        by_file.setdefault(r.warc_file, []).append(r.rec_no)
    assert len(by_file) == 3
    for recs in by_file.values():
        assert sorted(recs) == list(range(len(recs)))


def test_warc_roundtrip_gzip_members(spark, tmp_path):
    """.warc.gz files are concatenated per-record gzip members (the
    Common Crawl layout); the incremental member iterator must recover
    every record."""
    from pdf_parser_spark.warc import read_warc, write_warc_files

    rows = _docs(spark)
    paths = write_warc_files(rows, str(tmp_path), n_files=2,
                             compress=True)
    # the file really is multi-member gzip, not one stream
    blob = open(paths[0], "rb").read()
    assert blob.count(b"\x1f\x8b\x08") >= len(rows) // 2
    got = read_warc(spark, str(tmp_path)).collect()
    assert len(got) == len(rows)
    assert all(r.error is None for r in got)


def test_warc_malformed_records(spark, tmp_path):
    """Breakage becomes error rows, never task failures: a truncated
    payload, a record without Content-Length, and unframed garbage
    each yield a diagnosable row while intact records still parse."""
    from pdf_parser_spark.warc import _record_bytes, read_warc

    good = _record_bytes("https://example.org/ok", "2024-01-01T00:00:00Z",
                         b"<html>ok</html>")
    truncated = _record_bytes("https://example.org/cut",
                              "2024-01-01T00:00:01Z",
                              b"<html>this body will be cut</html>")[:-30]
    no_len = (b"WARC/1.0\r\n"
              b"WARC-Type: response\r\n"
              b"WARC-Target-URI: https://example.org/nolen\r\n"
              b"\r\n")
    with open(os.path.join(tmp_path, "a.warc"), "wb") as f:
        f.write(good + truncated)
    with open(os.path.join(tmp_path, "b.warc"), "wb") as f:
        f.write(no_len)
    with open(os.path.join(tmp_path, "c.warc"), "wb") as f:
        f.write(b"not a warc record at all")

    rows = {(r.warc_file.rsplit("/", 1)[-1], r.rec_no): r
            for r in read_warc(spark, str(tmp_path)).collect()}
    ok = [r for r in rows.values() if r.error is None]
    assert len(ok) == 1 and ok[0].url == "https://example.org/ok"
    errs = {r.url: r.error for r in rows.values() if r.error}
    assert any("truncated" in e for e in errs.values())
    assert errs.get("https://example.org/nolen") == \
        "missing/bad Content-Length"
    assert any("unframed" in e for e in errs.values())


def test_warc_gzip_resync_after_bad_member(spark, tmp_path):
    """A corrupt record confined to its own gzip member must not eat
    the following members — the member boundary is the
    resynchronisation point."""
    from pdf_parser_spark.warc import _record_bytes, read_warc

    good1 = gzip.compress(_record_bytes(
        "https://example.org/1", "2024-01-01T00:00:01Z", b"<p>1</p>"),
        mtime=0)
    bad = gzip.compress(b"garbage bytes, no WARC header", mtime=0)
    good2 = gzip.compress(_record_bytes(
        "https://example.org/2", "2024-01-01T00:00:02Z", b"<p>2</p>"),
        mtime=0)
    with open(os.path.join(tmp_path, "mix.warc.gz"), "wb") as f:
        f.write(good1 + bad + good2)
    rows = read_warc(spark, str(tmp_path)).collect()
    oks = sorted(r.url for r in rows if r.error is None)
    assert oks == ["https://example.org/1", "https://example.org/2"]
    assert sum(1 for r in rows if r.error) == 1
