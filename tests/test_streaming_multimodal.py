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
