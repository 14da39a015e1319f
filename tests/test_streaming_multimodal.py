"""Streaming incremental ingestion + multimodal plumbing."""

import pytest

from pdf_parser_spark.ops.multimodal import (
    fixture_media_df, media_features, sample_frames, strict_decoder,
)
from pdf_parser_spark.pages_source import fixture_pages_df
from pdf_parser_spark.streaming import stream_extraction


def test_stream_availablenow_matches_batch(spark, tmp_path):
    """Two file drops; each AvailableNow pass drains exactly the new
    files; final tables match the batch job's totals."""
    in_dir = str(tmp_path / "pages_in")
    out = str(tmp_path / "stream_out")

    pages = fixture_pages_df(spark)
    first = pages.filter("url not like '%mega%'")
    second = pages.filter("url like '%mega%'")

    first.write.mode("append").parquet(in_dir)
    stream_extraction(spark, in_dir, out)
    from pdf_parser_spark.io_tables import TableIO
    io = TableIO(out)
    docs1 = io.read(spark, "doc_metrics")
    assert docs1.count() == first.count()

    second.write.mode("append").parquet(in_dir)
    stream_extraction(spark, in_dir, out)
    docs2 = io.read(spark, "doc_metrics")
    assert docs2.count() == pages.count()
    # incremental: no url processed twice
    assert docs2.count() == docs2.select("url").distinct().count()
    # batch equivalence on tx counts
    from pdf_parser_spark.pipeline import parse_pages, split_outputs
    txs_batch, _ = split_outputs(parse_pages(pages))
    assert io.read(spark, "transactions").count() == txs_batch.count()


def test_media_features_real_decode_matches_ground_truth(spark):
    """Encode→decode round trip: the pipeline's decoded features must
    equal the construction-time (encode-side) ground truth for every
    row — including the poison rows' decode_error."""
    from pdf_parser_spark.ops.multimodal import fixture_media

    media = fixture_media_df(spark, n=30)
    rows = {r.url: r for r in media_features(media).collect()}
    assert len(rows) == 30
    assert {r.media_type for r in rows.values()} == \
        {"image", "audio", "video"}
    for d in fixture_media(30):
        r, t = rows[d["url"]], d["truth"]
        for k in ("width", "height", "channels", "duration_ms",
                  "mean_luma", "decode_error", "sha256", "n_bytes"):
            assert getattr(r, k) == t[k], (d["url"], k, getattr(r, k), t[k])
    # poison rows exist and surface as decode_error, not task failure
    assert sum(1 for r in rows.values() if r.decode_error) == 3


def test_media_features_strict_decoder_captures_errors(spark):
    media = fixture_media_df(spark, n=9)
    rows = media_features(media, decoder=strict_decoder).collect()
    assert len(rows) == 9
    assert all(r.decode_error and "NotImplementedError" in r.decode_error
               for r in rows)
    assert all(r.width is None for r in rows)  # schema holds under failure


def test_sample_frames_flatmap_shape(spark):
    media = fixture_media_df(spark, n=30)
    frames = sample_frames(media, every_ms=1000, max_frames=8)
    rows = frames.collect()
    videos = [r for r in media.collect() if r.media_type == "video"]
    assert len(rows) >= len(videos)  # ≥1 frame per video, only videos
    assert {r.url.split("/")[-2] for r in rows} == {"video"}
    per_url = {}
    for r in rows:
        per_url.setdefault(r.url, []).append(r.frame_no)
    for url, nos in per_url.items():
        assert sorted(nos) == list(range(len(nos)))  # dense frame index


def test_stream_sessionize_stateful_matches_batch(spark, tmp_path):
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    gap-sessionization over time-ordered micro-batches (one file per
    trigger — state genuinely carries open sessions and the session
    counter across batches) must be row-identical to the batch
    ``events_sessions`` SQL over the same events.  Stream-end flush
    via per-user sentinel events in the last file."""
    import os
    from datetime import timedelta

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import stream_sessionize
    from query_registry import QUERY_SQL

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    # split on WHOLE-SECOND boundaries (see sessionize_state_func's
    # exactness note): a micro-batch boundary must not divide a
    # same-truncated-second tie
    splits = []
    for t in (n // 4, n // 2, 3 * n // 4):
        i = t
        while i < n and int(rows[i].ts.timestamp()) == \
                int(rows[i - 1].ts.timestamp()):
            i += 1
        splits.append(i)
    bounds = [0] + splits + [n]
    parts = [rows[a:b] for a, b in zip(bounds, bounds[1:])]
    users = sorted({r.user_id for r in rows})
    max_ts = max(r.ts for r in rows)
    sentinels = [
        {"event_id": -(k + 1), "ts": max_ts + timedelta(seconds=4000),
         "user_id": u, "event_type": "eos", "value": 0.0, "props": ""}
        for k, u in enumerate(users)
    ]

    input_dir = tmp_path / "events_stream"
    input_dir.mkdir()
    t0 = 1_700_000_000
    chunks = [[r.asDict() for r in p] for p in parts if p] + [sentinels]
    for k, chunk in enumerate(chunks):
        path = str(input_dir / ("part-%02d.parquet" % k))
        tbl = pa.Table.from_pandas(pd.DataFrame(chunk))
        i = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(i, "ts", tbl["ts"].cast(pa.timestamp("us")))
        pq.write_table(tbl, path)
        os.utime(path, (t0 + k, t0 + k))  # oldest-first source order

    stream_sessionize(spark, str(input_dir), str(tmp_path / "ckpt"),
                      "sess_stateful_test")
    got = sorted(
        (r.user_id, r.session_id, r.n_events, repr(r.total_value),
         r.span_sec)
        for r in spark.sql("SELECT * FROM sess_stateful_test").collect())

    ev.createOrReplaceTempView("events")
    want = sorted(
        (r.user_id, r.session_id, r.n_events, repr(r.total_value),
         r.span_sec)
        for r in spark.sql(QUERY_SQL["events_sessions"]["spark"])
        .collect())
    assert len(got) == len(want) and len(got) > 50
    assert got == want


def test_stream_dedup_exact_matches_batch(spark, tmp_path):
    """Streaming ingest dedup (cross-micro-batch dropDuplicates state)
    must keep exactly the batch ``dedup_exact`` keepers.  The dup tier
    (doc_id+1000000 copies of every 5th doc) is fed in a LATER
    micro-batch than every original, so each survivor decision is made
    by state carried across batches, not within-batch ordering — and
    the originals are pairwise-distinct (asserted), so the outcome is
    deterministic."""
    import os

    from pdf_parser_spark.streaming import stream_dedup_exact
    from query_registry import QUERY_SQL

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    assert len({r.text for r in rows}) == len(rows)  # originals distinct
    dup_tier = [r.asDict() | {"doc_id": r.doc_id + 1000000}
                for r in rows if r.doc_id % 5 == 0]
    n = len(rows)
    chunks = [[r.asDict() for r in rows[:n // 3]],
              [r.asDict() for r in rows[n // 3: 2 * n // 3]],
              [r.asDict() for r in rows[2 * n // 3:]],
              dup_tier]

    input_dir = tmp_path / "docs_stream"
    input_dir.mkdir()
    t0 = 1_700_000_000
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    for k, chunk in enumerate(chunks):
        path = str(input_dir / ("part-%02d.parquet" % k))
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(chunk)), path)
        os.utime(path, (t0 + k, t0 + k))  # oldest-first source order

    out_dir = str(tmp_path / "dedup_out")
    stream_dedup_exact(spark, str(input_dir), str(tmp_path / "ckpt_dd"),
                       out_dir)
    got = sorted(
        (r.doc_id, r.content_hash)
        for r in spark.read.parquet(out_dir).collect())

    docs.createOrReplaceTempView("documents")
    batch = spark.sql(QUERY_SQL["dedup_exact"]["spark"]).collect()
    want = sorted((r.doc_id, r.content_hash)
                  for r in batch if r.doc_id == r.keeper_id)
    assert len(got) == len(want) == 500
    assert got == want


def test_stream_dedup_state_survives_restart(spark, tmp_path):
    """Checkpoint resumability of the dedup STATE: drain originals,
    stop, then restart the stream from the same checkpoint with only
    the duplicate tier newly arrived.  If the digest state did not
    survive the restart, every duplicate would re-emit; the second run
    must emit zero rows."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import stream_dedup_exact

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    input_dir = tmp_path / "docs_stream2"
    input_dir.mkdir()
    t0 = 1_700_000_000

    def write(k, chunk):
        path = str(input_dir / ("part-%02d.parquet" % k))
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(chunk)), path)
        os.utime(path, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "dedup_rs_out")
    write(0, [r.asDict() for r in rows])
    stream_dedup_exact(spark, str(input_dir), str(tmp_path / "ckpt_rs"),
                       out_dir)
    assert spark.read.parquet(out_dir).count() == 500

    # duplicates of every 5th doc land AFTER the stream stopped
    write(1, [r.asDict() | {"doc_id": r.doc_id + 1000000}
              for r in rows if r.doc_id % 5 == 0])
    stream_dedup_exact(spark, str(input_dir), str(tmp_path / "ckpt_rs"),
                       out_dir)
    # state reloaded from checkpoint: every duplicate dropped, and the
    # exactly-once sink added nothing
    final = spark.read.parquet(out_dir)
    assert final.count() == 500
    assert final.filter("doc_id >= 1000000").count() == 0


def test_stream_lsh_candidates_match_batch(spark, tmp_path):
    """Streaming MinHash/LSH near-dup candidates (stateful band
    buckets) must equal the batch ``dedup_lsh_pairs`` candidate set
    exactly.  The near-dup tier (every 4th doc, first word dropped,
    doc_id+1000000) arrives in the LAST micro-batch, so every true
    near-dup pair is found via state carried across batches."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import stream_lsh_candidates
    from query_registry import QUERY_SQL

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    # the exact corpus the batch SQL derives (_near_corpus)
    near_tier = [
        r.asDict() | {"doc_id": r.doc_id + 1000000,
                      "text": r.text.split(" ", 1)[1]
                      if " " in r.text else r.text}
        for r in rows if r.doc_id % 4 == 0
    ]
    n = len(rows)
    chunks = [[r.asDict() for r in rows[:n // 2]],
              [r.asDict() for r in rows[n // 2:]],
              near_tier]

    input_dir = tmp_path / "lsh_stream"
    input_dir.mkdir()
    t0 = 1_700_000_000
    for k, chunk in enumerate(chunks):
        path = str(input_dir / ("part-%02d.parquet" % k))
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(chunk)), path)
        os.utime(path, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "lsh_out")
    stream_lsh_candidates(spark, str(input_dir),
                          str(tmp_path / "ckpt_lsh"), out_dir)
    got = {(r.left_id, r.right_id)
           for r in spark.read.parquet(out_dir).collect()}

    docs.createOrReplaceTempView("documents")
    want = {(r.left_id, r.right_id)
            for r in spark.sql(QUERY_SQL["dedup_lsh_pairs"]["spark"])
            .collect()}
    # every near-dup pair straddles a micro-batch boundary by
    # construction (original in batch 0/1, jittered twin in batch 2)
    cross_batch = {(l, r) for l, r in want if r >= 1000000 > l}
    assert len(cross_batch) >= 50
    assert got == want


def test_stream_lsh_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState checkpoint resumability: drain the
    originals, stop, deliver the near-dup tier, restart from the same
    checkpoint — the bucket state reloads, so the union of both runs'
    pairs equals the batch candidate set and the second run emits ONLY
    cross-tier pairs (no recomputation of batch-1 collisions)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import stream_lsh_candidates
    from query_registry import QUERY_SQL

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    input_dir = tmp_path / "lsh_rs_stream"
    input_dir.mkdir()
    t0 = 1_700_000_000

    def write(k, chunk):
        path = str(input_dir / ("part-%02d.parquet" % k))
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(chunk)), path)
        os.utime(path, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "lsh_rs_out")
    ckpt = str(tmp_path / "ckpt_lsh_rs")
    write(0, [r.asDict() for r in rows])
    stream_lsh_candidates(spark, str(input_dir), ckpt, out_dir)
    run1 = {(r.left_id, r.right_id)
            for r in spark.read.parquet(out_dir).collect()}

    write(1, [r.asDict() | {"doc_id": r.doc_id + 1000000,
                            "text": r.text.split(" ", 1)[1]
                            if " " in r.text else r.text}
              for r in rows if r.doc_id % 4 == 0])
    stream_lsh_candidates(spark, str(input_dir), ckpt, out_dir)
    total = {(r.left_id, r.right_id)
             for r in spark.read.parquet(out_dir).collect()}
    run2 = total - run1
    assert run2 and all(r >= 1000000 for _, r in run2)  # only new pairs

    docs.createOrReplaceTempView("documents")
    want = {(r.left_id, r.right_id)
            for r in spark.sql(QUERY_SQL["dedup_lsh_pairs"]["spark"])
            .collect()}
    assert total == want


def test_stream_lsh_redelivery_is_idempotent(spark, tmp_path):
    """A re-delivered document file (replay/backfill) must not emit
    self-pairs, duplicate state entries, or any new candidates — the
    bucket state recognizes existing members."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import stream_lsh_candidates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [r.asDict() for r in
            sorted(docs.collect(), key=lambda r: r.doc_id)][:200]
    input_dir = tmp_path / "lsh_redeliver"
    input_dir.mkdir()
    t0 = 1_700_000_000
    for k, chunk in enumerate([rows, rows]):   # same docs twice
        path = str(input_dir / ("part-%02d.parquet" % k))
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(chunk)), path)
        os.utime(path, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "lsh_redeliver_out")
    stream_lsh_candidates(spark, str(input_dir),
                          str(tmp_path / "ckpt_rd"), out_dir)
    out = spark.read.parquet(out_dir).collect()
    assert all(r.left_id != r.right_id for r in out)  # no self-pairs
    # the replay added nothing: pair multiset == single-delivery pairs
    seen = {}
    for r in out:
        seen[(r.left_id, r.right_id, r.band_no)] = \
            seen.get((r.left_id, r.right_id, r.band_no), 0) + 1
    assert all(v == 1 for v in seen.values())


def test_stream_lsh_bucket_cap_bounds_state_and_emissions(spark,
                                                          tmp_path):
    """Super-bucket guard: identical-text docs all land in the same 4
    buckets; with bucket_cap=5 the stream emits exactly C(5,2) pairs
    per band instead of C(50,2), and later arrivals neither emit nor
    grow state."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import stream_lsh_candidates

    text = "identical boilerplate text shared by every degenerate doc"
    rows = [{"doc_id": i, "text": text, "lang": "en",
             "source": "t", "n_chars": len(text)} for i in range(50)]
    input_dir = tmp_path / "lsh_cap"
    input_dir.mkdir()
    t0 = 1_700_000_000
    for k, chunk in enumerate([rows[:25], rows[25:]]):
        path = str(input_dir / ("part-%02d.parquet" % k))
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(chunk)), path)
        os.utime(path, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "lsh_cap_out")
    stream_lsh_candidates(spark, str(input_dir),
                          str(tmp_path / "ckpt_cap"), out_dir,
                          bucket_cap=5)
    out = spark.read.parquet(out_dir).collect()
    # 4 bands x C(5,2)=10 pairs; uncapped would be 4 x C(50,2)=4900
    assert len(out) == 40
    assert {r.left_id for r in out} | {r.right_id for r in out} == \
        set(range(5))


def _write_event_batches(tmp_path, chunks, name="events_stream"):
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    input_dir = tmp_path / name
    input_dir.mkdir()
    t0 = 1_700_000_000
    for k, chunk in enumerate(chunks):
        path = str(input_dir / ("part-%02d.parquet" % k))
        pdf = pd.DataFrame(chunk)[["event_id", "ts", "user_id",
                                   "event_type", "value", "props"]]
        # Spark reads TIMESTAMP(MICROS); pandas defaults to nanos
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (t0 + k, t0 + k))   # oldest-first source order
    return str(input_dir)


def test_stream_hourly_rollup_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window streaming agg ≡ the batch
    events_hourly_rollup when the watermark admits every event: the
    real corpus arrives in 3 time-ordered micro-batches, every 7th
    middle-third event is withheld and redelivered LATE in the final
    batch (its hours-old window must still be open — cross-batch
    window state), and a far-future sentinel flushes append mode."""
    import datetime

    from pdf_parser_spark.streaming import (
        FLUSH_TYPE, stream_hourly_rollup,
    )
    from query_registry import QUERY_SQL

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = sorted((r.asDict() for r in events.collect()),
                  key=lambda r: r["ts"])
    n = len(rows)
    third = rows[n // 3: 2 * n // 3]
    late = third[::7]
    third = [r for i, r in enumerate(third) if i % 7]
    sentinel = {"event_id": -1,
                "ts": rows[-1]["ts"] + datetime.timedelta(hours=900),
                "user_id": -1, "event_type": FLUSH_TYPE,
                "value": 0.0, "props": ""}
    chunks = [rows[:n // 3], third, rows[2 * n // 3:],
              late + [sentinel]]
    input_dir = _write_event_batches(tmp_path, chunks)

    out_dir = str(tmp_path / "rollup_out")
    stream_hourly_rollup(spark, input_dir, str(tmp_path / "ckpt_hr"),
                         out_dir, watermark="800 hours")
    got = sorted((r.event_type, r.hour_bucket, r.events,
                  repr(r.total_value))
                 for r in spark.read.parquet(out_dir).collect()
                 if r.event_type != FLUSH_TYPE)

    events.createOrReplaceTempView("events")
    want = sorted((r.event_type, r.hour_bucket, r.events,
                   repr(r.total_value))
                  for r in spark.sql(
                      QUERY_SQL["events_hourly_rollup"]["spark"])
                  .collect())
    assert len(got) == len(want) > 0
    assert got == want


def test_stream_hourly_rollup_drops_beyond_watermark(spark, tmp_path):
    """The watermark actually retires state: with a 1-hour bound, an
    event arriving after the watermark passed its window is DROPPED
    and the already-emitted window is never revised — while an equally
    late-ARRIVING event within the bound still lands."""
    import datetime

    from pdf_parser_spark.streaming import (
        FLUSH_TYPE, stream_hourly_rollup,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, value, etype="a"):
        return {"event_id": eid,
                "ts": base + datetime.timedelta(minutes=minutes),
                "user_id": 1, "event_type": etype, "value": value,
                "props": ""}

    batch_a = [ev(1, 10, 1.5), ev(2, 180, 2.0)]
    # spacer batch: runs with watermark 03:00 - 1h = 02:00, which
    # finalizes and emits the [00:00, 01:00) window (Spark applies
    # the late-input filter with a one-batch lag, so the eviction
    # must happen in a batch BEFORE the late row arrives)
    batch_b = [ev(5, 240, 8.0)]
    batch_c = [ev(3, 20, 100.0),    # beyond watermark → dropped
               ev(4, 190, 4.0),     # open window → accepted
               ev(-1, 13 * 60, 0.0, FLUSH_TYPE)]
    input_dir = _write_event_batches(
        tmp_path, [batch_a, batch_b, batch_c])

    out_dir = str(tmp_path / "rollup_wm_out")
    stream_hourly_rollup(spark, input_dir, str(tmp_path / "ckpt_wm"),
                         out_dir, watermark="1 hour")
    got = sorted((r.event_type, r.hour_bucket, r.events, r.total_value)
                 for r in spark.read.parquet(out_dir).collect()
                 if r.event_type != FLUSH_TYPE)
    h0 = int(base.timestamp()) // 3600
    # the h0 window appears EXACTLY once (never revised) and without
    # the dropped late row; both open windows accepted their rows
    assert got == [("a", h0, 1, 1.5), ("a", h0 + 3, 2, 6.0),
                   ("a", h0 + 4, 1, 8.0)]


def test_stream_change_detect_matches_batch_recrawl(spark, tmp_path):
    """Streaming per-url change detection must classify snapshot t1's
    arrivals exactly like the batch recrawl_schedule diff: build the
    SAME two synthesized generations, drain snap0 (everything 'new'),
    STOP, then restart from the checkpoint with snap1 newly arrived —
    the per-host changed/unchanged/new counts of the second run must
    equal the batch op's counters (gone is batch-only by design:
    absence has no arrival event)."""
    import hashlib
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import stream_change_detect
    from query_registry import QUERY_SQL

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)

    def url(doc_id):
        return "h%d.example/p%d" % (doc_id % 40, doc_id)

    def changed(doc_id):
        hid = doc_id % 40
        return (0 if hid % 10 == 7 else 1 if hid % 10 == 3 else
                1 if doc_id % 160 < 40 else 0)

    snap0 = [(url(r.doc_id), 0,
              hashlib.md5(r.text.encode()).hexdigest())
             for r in rows if r.doc_id % 13 != 0]
    snap1 = [(url(r.doc_id), 1, hashlib.md5(
        (r.text + ("|v2" if changed(r.doc_id) else "")).encode())
        .hexdigest()) for r in rows if r.doc_id % 17 != 0]

    input_dir = tmp_path / "snaps"
    input_dir.mkdir()
    t0 = 1_700_000_000

    def write_snap(snap, k):
        path = str(input_dir / ("snap-%02d.parquet" % k))
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(
            snap, columns=["url", "snap_no", "digest"])), path)
        os.utime(path, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt_cd")
    write_snap(snap0, 0)
    stream_change_detect(spark, str(input_dir), ckpt, out_dir)
    first = spark.read.parquet(out_dir).collect()
    assert len(first) == len(snap0)
    assert {r.verdict for r in first} == {"new"}

    write_snap(snap1, 1)                      # restart: state recovered
    stream_change_detect(spark, str(input_dir), ckpt, out_dir)
    second = [r for r in spark.read.parquet(out_dir).collect()
              if r.snap_no == 1]
    assert len(second) == len(snap1)

    got = {}
    for r in second:
        host = r.url.split("/")[0]
        key = {"changed": "n_changed", "unchanged": "n_unchanged",
               "new": "n_new"}[r.verdict]
        got.setdefault(host, {"n_changed": 0, "n_unchanged": 0,
                              "n_new": 0})[key] += 1
    docs.createOrReplaceTempView("documents")
    batch = spark.sql(QUERY_SQL["recrawl_schedule"]["spark"]).collect()
    for b in batch:
        exp = got.get(b.host, {"n_changed": 0, "n_unchanged": 0,
                               "n_new": 0})
        assert (b.n_changed, b.n_unchanged, b.n_new) == \
            (exp["n_changed"], exp["n_unchanged"], exp["n_new"]), b.host
    assert sum(g["n_changed"] for g in got.values()) > 0
    assert sum(g["n_unchanged"] for g in got.values()) > 0


def test_stream_rate_limit_token_bucket(spark, tmp_path):
    """Per-host token bucket: two frontier cycles drained as separate
    micro-batches WITH a checkpoint restart in between.  Pins (1) an
    independent Python recomputation of every verdict and remaining-
    token count (burst spend, whole-token refill, remainder-clock
    carry), (2) cross-batch state: cycle 2's first verdicts depend on
    the tokens cycle 1 spent, (3) the politeness invariant — within
    any (host, refill-window) at most capacity + elapsed//refill
    fetches are granted."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import (
        RATE_CAPACITY, RATE_REFILL_MS, stream_rate_limit,
    )

    hosts = ["a.example", "b.example", "c.example"]
    # cycle 0: a burst of 6 at t=0 (capacity 4 → 2 defers), then two
    # spends at t=2500/2600 consuming BOTH refilled tokens (refill
    # clock advances to 2000; the 500ms remainder carries)
    cyc0, cyc1 = [], []
    rn = 0
    for h in hosts:
        for k in range(6):
            cyc0.append((h, rn, 0, "https://%s/u%d" % (h, rn)))
            rn += 1
        for ts in (2500, 2600):
            cyc0.append((h, rn, ts, "https://%s/u%d" % (h, rn)))
            rn += 1
    # cycle 1 (after restart): t=2900 — only 900ms since the refill
    # clock (2000) → zero whole tokens, DEFER proves the spent bucket
    # crossed the restart; t=4100 refills two
    for h in hosts:
        for ts in (2900, 4100, 4150, 9999):
            cyc1.append((h, rn, ts, "https://%s/u%d" % (h, rn)))
            rn += 1

    input_dir = tmp_path / "reqs"
    input_dir.mkdir()
    t0 = 1_700_000_000

    def write_cycle(rows, k):
        path = str(input_dir / ("cycle-%02d.parquet" % k))
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(
            rows, columns=["host", "req_no", "ts_ms", "url"])), path)
        os.utime(path, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "grants")
    ckpt = str(tmp_path / "ckpt_rl")
    write_cycle(cyc0, 0)
    stream_rate_limit(spark, str(input_dir), ckpt, out_dir)
    write_cycle(cyc1, 1)                     # restart: state recovered
    stream_rate_limit(spark, str(input_dir), ckpt, out_dir)
    got = {r.req_no: (r.verdict, r.tokens_after)
           for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == len(cyc0) + len(cyc1)

    # independent bucket recomputation over the SAME ordered stream
    exp = {}
    for rows in (cyc0, cyc1):
        state = {}
        for h, req_no, ts, _u in sorted(rows,
                                        key=lambda r: (r[0], r[2], r[1])):
            tokens, refill = state.get(
                h, exp.get(("carry", h), (RATE_CAPACITY, None)))
            if refill is None:
                refill = ts
            elif ts > refill:
                g = (ts - refill) // RATE_REFILL_MS
                if tokens + g >= RATE_CAPACITY:
                    tokens, refill = RATE_CAPACITY, ts
                else:
                    tokens += g
                    refill += g * RATE_REFILL_MS
            if tokens >= 1:
                tokens -= 1
                exp[req_no] = ("fetch", tokens)
            else:
                exp[req_no] = ("defer", tokens)
            state[h] = (tokens, refill)
        for h, st in state.items():
            exp[("carry", h)] = st
    exp = {k: v for k, v in exp.items() if not isinstance(k, tuple)}
    assert got == exp
    # burst semantics: exactly capacity fetches then defers at t=0
    for h in hosts:
        burst = [got[r[1]][0] for r in cyc0 if r[0] == h and r[2] == 0]
        assert burst.count("fetch") == RATE_CAPACITY
        assert burst[-2:] == ["defer", "defer"]
    # cross-batch carry: at t=2900 only 400ms passed since the refill
    # clock → still deferred; t=4100 grants again
    by_ts = {(r[0], r[2]): got[r[1]][0] for r in cyc1}
    for h in hosts:
        assert by_ts[(h, 2900)] == "defer"
        assert by_ts[(h, 4100)] == "fetch"


def test_image_ahash_decode_matches_encode_side(spark):
    """Codec independence: ahash64 over the DECODED payload must equal
    ahash64 over the encode-side array for every fixture (PNG and BMP
    paths), and the poison row must surface decode_error, not raise."""
    from pdf_parser_spark.ops.multimodal import (
        ahash64, fixture_images_df, fixture_images_neardup, image_ahash,
    )

    got = {r.url: (r.ahash, r.decode_error)
           for r in image_ahash(fixture_images_df(spark)).collect()}
    for d in fixture_images_neardup():
        if d["pixels"] is None:
            assert got[d["url"]][0] is None
            assert "not a PNG/BMP" in got[d["url"]][1]
        else:
            assert got[d["url"]] == (ahash64(d["pixels"]), None), d["url"]


def test_image_neardup_banded_equals_brute_force(spark):
    """The banded join at hamming<=3 with 4x16-bit bands has EXACT
    recall (pigeonhole) — its pairs must equal the encode-side brute
    force, including the planted -dup/-copy twins AND the one natural
    base-pair collision."""
    from pdf_parser_spark.ops.multimodal import (
        ahash_neardup, expected_neardup_rows, fixture_images_df,
        image_ahash,
    )

    pairs = ahash_neardup(image_ahash(fixture_images_df(spark)))
    got = sorted((r.url_a, r.url_b, r.hamming) for r in pairs.collect())
    exp = sorted((r["url_a"], r["url_b"], r["hamming"])
                 for r in expected_neardup_rows())
    assert got == exp
    assert any(h == 0 for _, _, h in got)       # exact copies
    assert any(h > 0 for _, _, h in got)        # true near-dups


def test_image_neardup_bucket_cap_drops_degenerate_band(spark):
    """Super-bucket guard: a degenerate cluster (many byte-identical
    images -> identical hashes -> one band bucket) is dropped once the
    bucket exceeds the cap, so no quadratic pair blowup — same
    semantics as the text LSH tier's bucket_cap."""
    from pdf_parser_spark.ops.multimodal import (
        MEDIA_SCHEMA, _neardup_image_arrays, ahash_neardup, image_ahash,
    )
    from pdf_parser_spark.ops.media_codecs import png_encode

    arr, _ = _neardup_image_arrays(0)
    rows = [("u%03d" % i, "image", bytearray(png_encode(arr)), None)
            for i in range(20)]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    hashes = image_ahash(media)
    assert ahash_neardup(hashes, bucket_cap=10).count() == 0
    # without the cap the same input yields all C(20,2) pairs
    assert ahash_neardup(hashes, bucket_cap=None).count() == 190


def test_audio_fp_decode_matches_encode_side(spark):
    """Codec independence for the audio tier: audio_fp64 over the
    DECODED WAV must equal audio_fp64 over the encode-side samples for
    every fixture; poison payload surfaces decode_error."""
    from pdf_parser_spark.ops.multimodal import (
        audio_fingerprint, audio_fp64, fixture_audio_df,
        fixture_audio_neardup,
    )

    got = {r.url: (r.afp, r.decode_error)
           for r in audio_fingerprint(fixture_audio_df(spark)).collect()}
    for d in fixture_audio_neardup():
        if d["samples"] is None:
            assert got[d["url"]][0] is None
            assert "not a WAV" in got[d["url"]][1]
        else:
            assert got[d["url"]] == (audio_fp64(d["samples"]), None)


def test_audio_neardup_banded_equals_brute_force(spark):
    """The hash-agnostic banded join over audio fingerprints equals
    encode-side brute force — including agreeing that the one planted
    twin at hamming 4 is NOT a pair at the <=3 threshold."""
    from pdf_parser_spark.ops.multimodal import (
        ahash_neardup, audio_fingerprint, audio_fp64,
        expected_audio_neardup_rows, fixture_audio_df,
        fixture_audio_neardup,
    )

    pairs = ahash_neardup(audio_fingerprint(fixture_audio_df(spark)),
                          hash_col="afp")
    got = sorted((r.url_a, r.url_b, r.hamming) for r in pairs.collect())
    exp = sorted((r["url_a"], r["url_b"], r["hamming"])
                 for r in expected_audio_neardup_rows())
    assert got == exp
    # the just-missed twin really exists (threshold boundary is live)
    fps = {d["url"]: audio_fp64(d["samples"])
           for d in fixture_audio_neardup() if d["samples"] is not None}
    dists = [bin((fps[u] ^ fps[u + "-dup"]) & ((1 << 64) - 1)).count("1")
             for u in fps if u + "-dup" in fps]
    assert any(d > 3 for d in dists) and any(d <= 3 for d in dists)


def test_video_containment_equals_brute_force(spark):
    """Frame-hash sub-clip detection: pipeline pairs (decode -> hash
    every frame -> inverted-index containment) must equal encode-side
    brute force — interior cuts verdict 'subclip', the mostly-
    overlapping -mix twins 'partial' in BOTH directions, unrelated
    videos share zero frames and never pair."""
    from pdf_parser_spark.ops.multimodal import (
        expected_clip_rows, fixture_videos_df, video_clip_containment,
        video_frame_hashes,
    )

    out = video_clip_containment(video_frame_hashes(
        fixture_videos_df(spark)))
    got = sorted(tuple(r) for r in out.collect())
    exp = sorted((r["url_outer"], r["url_clip"], r["n_common"],
                  r["n_clip"], r["containment_pct"], r["verdict"])
                 for r in expected_clip_rows())
    assert got == exp
    verdicts = {g[5] for g in got}
    assert verdicts == {"subclip", "partial"}
    # asymmetry: every -clip pair points clip-ward only
    for outer, clip, *_ , v in got:
        if v == "subclip" and clip.endswith("-clip"):
            assert not outer.endswith("-clip") or outer != clip


def test_video_scene_cuts_matches_encode_plan(spark):
    """Scene segmentation equals the encode-side scene plan exactly
    (scene count, start frames, lengths), and the poison payload
    contributes no rows."""
    from pdf_parser_spark.ops.multimodal import (
        expected_scene_rows, fixture_scenes_df, video_frame_hashes,
        video_scene_cuts,
    )

    got = sorted((r.url, r.scene_no, r.start_frame, r.n_frames)
                 for r in video_scene_cuts(
                     video_frame_hashes(fixture_scenes_df(spark)))
                 .collect())
    want = sorted((d["url"], d["scene_no"], d["start_frame"],
                   d["n_frames"]) for d in expected_scene_rows())
    assert got == want and len(got) > 30
    assert not any("poison" in u for u, *_ in got)


def test_video_scene_cuts_single_shuffle(spark):
    """The window pass and the scene rollup share one url
    hash-partitioning — a second exchange would double the frame-hash
    bytes moved at corpus scale."""
    from pdf_parser_spark.ops.multimodal import (
        fixture_scenes_df, video_frame_hashes, video_scene_cuts,
    )

    plan = video_scene_cuts(
        video_frame_hashes(fixture_scenes_df(spark)))._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
