"""Multimodal columns: images/audio/video as opaque ``binary`` with
typed metadata; decode / feature-extract / frame-sample as Arrow-
batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the DECODE step is
pluggable: the default ``fake_decoder`` derives deterministic
pseudo-features from the payload digest (real Spark plumbing — schema,
salting, Arrow batch shape — with a stub at the codec boundary);
``strict_decoder`` raises NotImplementedError the way a production
build would surface a missing codec.  Swapping in Pillow/ffmpeg on a
real cluster changes ONE function, no plan changes.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),  # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURES_SCHEMA = (
    "url string, media_type string, n_bytes bigint, width int, height int,"
    " channels int, duration_ms int, mean_luma double, sha256 string,"
    " decode_error string"
)

FRAMES_SCHEMA = (
    "url string, frame_no int, ts_ms int, frame_sha256 string"
)


def fake_decoder(media_type: str, payload: bytes) -> dict:
    """Deterministic stand-in for the codec: pseudo-dimensions and
    luminance derived from the digest.  REPLACE on a real cluster with
    Pillow / torchaudio / pyav — same signature, same schema."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] * 8
    height = 64 + digest[1] * 8
    return {
        "width": width,
        "height": height,
        "channels": 1 + digest[2] % 4,
        "duration_ms": (int.from_bytes(digest[3:6], "big") % 600000
                        if media_type in ("audio", "video") else 0),
        "mean_luma": digest[6] / 255.0,
    }


def strict_decoder(media_type: str, payload: bytes) -> dict:
    raise NotImplementedError(
        "no %s codec in this environment — plug in Pillow/ffmpeg here"
        % media_type
    )


def media_features(
    media: DataFrame,
    decoder: Callable[[str, bytes], dict] = fake_decoder,
) -> DataFrame:
    """Decode+featurize each media row in Arrow batches.  Decoder
    errors never kill the task: they land in ``decode_error`` (poison
    payloads are data, not exceptions, at 10^12 scale)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "url", "media_type", "n_bytes", "width", "height",
                "channels", "duration_ms", "mean_luma", "sha256",
                "decode_error")}
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None \
                    else b""
                feats, err = None, None
                try:
                    feats = decoder(row.media_type, payload)
                except Exception as exc:
                    err = "%s: %s" % (type(exc).__name__, exc)
                out["url"].append(row.url)
                out["media_type"].append(row.media_type)
                out["n_bytes"].append(len(payload))
                out["width"].append(feats["width"] if feats else None)
                out["height"].append(feats["height"] if feats else None)
                out["channels"].append(feats["channels"] if feats else None)
                out["duration_ms"].append(
                    feats["duration_ms"] if feats else None)
                out["mean_luma"].append(feats["mean_luma"] if feats else None)
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                out["decode_error"].append(err)
            yield pd.DataFrame(out)

    pruned = media.select("url", "media_type", "payload")
    return pruned.mapInPandas(batches, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 32) -> DataFrame:
    """Frame sampling plumbing for video rows: emits one row per
    sampled frame (frame content = digest of payload+index until a
    real codec is plugged in).  A flatMap-shaped mapInPandas — output
    cardinality greater than input, same Arrow batching."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls, nos, tss, shas = [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.media_type != "video" or row.payload is None:
                    continue
                payload = bytes(row.payload)
                dur = fake_decoder("video", payload)["duration_ms"]
                n = min(max_frames, max(dur // every_ms, 1))
                for k in range(n):
                    urls.append(row.url)
                    nos.append(k)
                    tss.append(k * every_ms)
                    shas.append(hashlib.sha256(
                        payload + k.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({
                "url": urls, "frame_no": nos, "ts_ms": tss,
                "frame_sha256": shas,
            })

    return media.select("url", "media_type", "payload") \
        .mapInPandas(batches, schema=FRAMES_SCHEMA)


def fixture_media_df(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic opaque payloads for the three modalities."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(b"media-%d" % i).digest() * (8 + i % 17)
        rows.append((
            "https://fixtures.test/media/%s/%04d" % (mt, i), mt,
            bytearray(payload), {"codec": "fake", "idx": str(i)},
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
