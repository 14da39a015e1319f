"""Multimodal columns: images/audio/video as opaque ``binary`` with
typed metadata; decode / feature-extract / frame-sample as Arrow-
batched ``mapInPandas`` stages.

The decode step is REAL (pure-Python/numpy codecs, ops/media_codecs):
PNG (all five scanline filters), 24-bit BMP, PCM WAV, and YUV4MPEG2
raw video.  Fixtures are ENCODED from deterministic pixel/sample
arrays whose ground-truth features are recorded at construction time;
the pipeline then DECODES the payload bytes independently — the oracle
comparison is a genuine encode→decode round trip, not a replay of the
decoder.  Unknown formats surface as ``decode_error`` rows (poison
payloads are data, not exceptions, at 10^12 scale).

``fake_decoder`` (digest-derived pseudo-features) remains available as
an explicit stand-in for formats that need native codecs on a real
cluster; ``strict_decoder`` raises the way a production build surfaces
a missing codec.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .media_codecs import (
    PNG_SIG, bmp_decode, bmp_encode, mean_from_sum, png_decode, png_encode,
    wav_decode, wav_encode, y4m_decode, y4m_encode,
)

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


# ------------------------------------------------------------ decoders
def sniff_decoder(media_type: str, payload: bytes) -> dict:
    """Magic-byte dispatch to the real codecs.  Features:
    * image (PNG/BMP): width/height/channels; mean_luma = exact mean
      over every channel sample / 255.
    * audio (WAV): channels, duration_ms; mean_luma = exact mean |s| of
      int16 samples / 32768 (signal level in the same 0-1 range).
    * video (Y4M): width/height, 3 channels, duration from frame count
      and fps; mean_luma over the Y planes only.
    Anything else raises — callers record it as ``decode_error``."""
    if payload[:8] == PNG_SIG:
        arr = png_decode(payload)
        channels = 1 if arr.ndim == 2 else arr.shape[2]
        return {
            "width": arr.shape[1], "height": arr.shape[0],
            "channels": channels, "duration_ms": 0,
            "mean_luma": mean_from_sum(int(arr.sum(dtype=np.int64)),
                                       arr.size, 255.0),
        }
    if payload[:2] == b"BM":
        arr = bmp_decode(payload)
        return {
            "width": arr.shape[1], "height": arr.shape[0],
            "channels": arr.shape[2], "duration_ms": 0,
            "mean_luma": mean_from_sum(int(arr.sum(dtype=np.int64)),
                                       arr.size, 255.0),
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, framerate, channels = wav_decode(payload)
        nframes = len(samples) // channels
        return {
            "width": None, "height": None, "channels": channels,
            "duration_ms": nframes * 1000 // framerate,
            "mean_luma": mean_from_sum(
                int(np.abs(samples.astype(np.int64)).sum()),
                len(samples), 32768.0),
        }
    if payload[:9] == b"YUV4MPEG2":
        w, h, num, den, frames = y4m_decode(payload)
        ysum = sum(
            int(np.frombuffer(f[:w * h], dtype=np.uint8).sum(dtype=np.int64))
            for f in frames
        )
        return {
            "width": w, "height": h, "channels": 3,
            "duration_ms": len(frames) * 1000 * den // num,
            "mean_luma": mean_from_sum(ysum, len(frames) * w * h, 255.0),
        }
    raise ValueError("unsupported media format")


def fake_decoder(media_type: str, payload: bytes) -> dict:
    """Digest-derived pseudo-features — the documented stand-in for
    formats whose codecs only exist on a real cluster."""
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 64 + digest[0] * 8,
        "height": 64 + digest[1] * 8,
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


# ------------------------------------------------------------ operators
def media_features(
    media: DataFrame,
    decoder: Callable[[str, bytes], dict] = sniff_decoder,
) -> DataFrame:
    """Decode+featurize each media row in Arrow batches.  Decoder
    errors never kill the task: they land in ``decode_error``."""

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


def frame_plan(duration_ms: int, n_frames: int, fps_num: int, fps_den: int,
               every_ms: int, max_frames: int) -> List[Tuple[int, int, int]]:
    """Sampling policy shared by the operator and the ground-truth
    generator: (frame_no, ts_ms, source frame index) per sample —
    one sample per ``every_ms`` of wall time, mapped to the frame
    on-screen at that instant."""
    n = min(max_frames, max(duration_ms // every_ms, 1))
    plan = []
    for k in range(n):
        ts = k * every_ms
        src = min(n_frames - 1, ts * fps_num // (1000 * fps_den))
        plan.append((k, ts, src))
    return plan


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 32) -> DataFrame:
    """REAL frame sampling for Y4M video rows: decodes the container,
    picks the frame on-screen at each sample instant, hashes its raw
    C420 bytes.  A flatMap-shaped mapInPandas — output cardinality
    greater than input, same Arrow batching.  Undecodable videos emit
    no frames (their error surfaces in media_features)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls, nos, tss, shas = [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.media_type != "video" or row.payload is None:
                    continue
                payload = bytes(row.payload)
                try:
                    w, h, num, den, frames = y4m_decode(payload)
                except Exception:
                    continue
                duration_ms = len(frames) * 1000 * den // num
                for k, ts, src in frame_plan(duration_ms, len(frames),
                                             num, den, every_ms, max_frames):
                    urls.append(row.url)
                    nos.append(k)
                    tss.append(ts)
                    shas.append(hashlib.sha256(frames[src]).hexdigest())
            yield pd.DataFrame({
                "url": urls, "frame_no": nos, "ts_ms": tss,
                "frame_sha256": shas,
            })

    return media.select("url", "media_type", "payload") \
        .mapInPandas(batches, schema=FRAMES_SCHEMA)


# ------------------------------------------------------------ fixtures
def _image_arrays(i: int):
    w, h = 24 + (i % 7) * 8, 16 + (i % 5) * 8
    yy, xx = np.mgrid[0:h, 0:w]
    if (i // 3) % 2 == 0:  # grayscale → PNG (filters 0..4 cycled)
        return ((xx * 7 + yy * 13 + i * 29) % 256).astype(np.uint8), "png"
    rgb = np.stack([(xx * 3 + i) % 256, (yy * 5 + i) % 256,
                    (xx + yy + i) % 256], axis=-1).astype(np.uint8)
    return rgb, "bmp"


def _audio_arrays(i: int):
    framerate = 8000
    channels = 1 + (i // 3) % 2
    nframes = 1600 + 320 * (i % 9)
    t = np.arange(nframes * channels, dtype=np.int64)
    samples = (((t * (i + 3) * 2654435761) >> 7) % 24001 - 12000) \
        .astype(np.int16)
    return samples, framerate, channels, nframes


def _video_arrays(i: int):
    w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 8
    n_frames = 4 + (i % 5) * 2
    fps_num, fps_den = 5, 1
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for k in range(n_frames):
        y = ((xx * 11 + yy * 17 + k * 23 + i) % 256).astype(np.uint8)
        u = np.full((h // 2, w // 2), (16 * k + i) % 256, dtype=np.uint8)
        v = np.full((h // 2, w // 2), (32 * k + 2 * i) % 256, dtype=np.uint8)
        frames.append((y, u, v))
    return frames, fps_num, fps_den


def fixture_media(n: int = 60) -> List[dict]:
    """Deterministic media corpus WITH construction-time ground truth.

    Every 10th row is a poison payload in an unknown format (exercises
    the decode_error path).  Each dict carries the row fields plus
    ``truth`` (expected feature values, computed from the ENCODE-side
    arrays — never by running the decoder) and, for videos,
    ``frame_truth`` inputs (raw frame bytes)."""
    out = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        url = "https://fixtures.test/media/%s/%04d" % (mt, i)
        frames_bytes = None
        if i % 10 == 9:  # poison: unknown container
            payload = (b"GARBAGE0"
                       + hashlib.sha256(b"junk-%d" % i).digest() * 3)
            truth = {"width": None, "height": None, "channels": None,
                     "duration_ms": None, "mean_luma": None,
                     "decode_error": "ValueError: unsupported media format"}
            codec = "none"
        elif mt == "image":
            arr, codec = _image_arrays(i)
            payload = png_encode(arr) if codec == "png" else bmp_encode(arr)
            truth = {
                "width": arr.shape[1], "height": arr.shape[0],
                "channels": 1 if arr.ndim == 2 else arr.shape[2],
                "duration_ms": 0,
                "mean_luma": mean_from_sum(int(arr.sum(dtype=np.int64)),
                                           arr.size, 255.0),
                "decode_error": None,
            }
        elif mt == "audio":
            samples, framerate, channels, nframes = _audio_arrays(i)
            payload = wav_encode(samples, framerate, channels)
            codec = "wav"
            truth = {
                "width": None, "height": None, "channels": channels,
                "duration_ms": nframes * 1000 // framerate,
                "mean_luma": mean_from_sum(
                    int(np.abs(samples.astype(np.int64)).sum()),
                    len(samples), 32768.0),
                "decode_error": None,
            }
        else:
            frames, num, den = _video_arrays(i)
            payload = y4m_encode(frames, num, den)
            codec = "y4m"
            w, h = frames[0][0].shape[1], frames[0][0].shape[0]
            ysum = sum(int(f[0].sum(dtype=np.int64)) for f in frames)
            truth = {
                "width": w, "height": h, "channels": 3,
                "duration_ms": len(frames) * 1000 * den // num,
                "mean_luma": mean_from_sum(ysum, len(frames) * w * h, 255.0),
                "decode_error": None,
            }
            frames_bytes = [
                y.tobytes() + u.tobytes() + v.tobytes()
                for y, u, v in frames
            ]
            truth["fps"] = (num, den)
        truth["n_bytes"] = len(payload)
        truth["sha256"] = hashlib.sha256(payload).hexdigest()
        out.append({
            "url": url, "media_type": mt, "payload": payload,
            "meta": {"codec": codec, "idx": str(i)},
            "truth": truth, "frames_bytes": frames_bytes,
        })
    return out


def fixture_media_df(spark: SparkSession, n: int = 60) -> DataFrame:
    rows = [
        (d["url"], d["media_type"], bytearray(d["payload"]), d["meta"])
        for d in fixture_media(n)
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def expected_feature_rows(n: int = 60) -> List[dict]:
    """Ground-truth media_features rows (encode-side)."""
    rows = []
    for d in fixture_media(n):
        t = d["truth"]
        rows.append({
            "url": d["url"], "media_type": d["media_type"],
            "n_bytes": t["n_bytes"], "width": t["width"],
            "height": t["height"], "channels": t["channels"],
            "duration_ms": t["duration_ms"], "mean_luma": t["mean_luma"],
            "sha256": t["sha256"], "decode_error": t["decode_error"],
        })
    return rows


def expected_frame_rows(n: int = 60, every_ms: int = 1000,
                        max_frames: int = 32) -> List[dict]:
    """Ground-truth sample_frames rows (encode-side frame bytes)."""
    rows = []
    for d in fixture_media(n):
        if d["frames_bytes"] is None:
            continue
        num, den = d["truth"]["fps"]
        dur = d["truth"]["duration_ms"]
        for k, ts, src in frame_plan(dur, len(d["frames_bytes"]), num, den,
                                     every_ms, max_frames):
            rows.append({
                "url": d["url"], "frame_no": k, "ts_ms": ts,
                "frame_sha256": hashlib.sha256(
                    d["frames_bytes"][src]).hexdigest(),
            })
    return rows
