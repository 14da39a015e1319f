"""Property-based codec checks: every encode→decode round trip is
lossless for arbitrary array shapes/contents, the sniffer never
misroutes, and corrupt payloads raise (→ decode_error rows) instead of
returning garbage."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pdf_parser_spark.ops.media_codecs import (
    bmp_decode, bmp_encode, png_decode, png_encode, wav_decode, wav_encode,
    y4m_decode, y4m_encode,
)
from pdf_parser_spark.ops.multimodal import sniff_decoder

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _arr(shape, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=shape).astype(np.uint8)


@given(_dims, st.sampled_from([None, 3, 4]), st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_png_round_trip(dims, channels, seed):
    h, w = dims
    shape = (h, w) if channels is None else (h, w, channels)
    a = _arr(shape, seed)
    assert np.array_equal(png_decode(png_encode(a)), a)


@given(_dims, st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_bmp_round_trip(dims, seed):
    h, w = dims
    a = _arr((h, w, 3), seed)
    assert np.array_equal(bmp_decode(bmp_encode(a)), a)


@given(st.integers(1, 5000), st.sampled_from([1, 2]),
       st.sampled_from([8000, 16000, 44100]), st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_wav_round_trip(nframes, channels, rate, seed):
    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=nframes * channels) \
        .astype(np.int16)
    d, fr, ch = wav_decode(wav_encode(s, rate, channels))
    assert np.array_equal(d, s) and fr == rate and ch == channels


@given(st.integers(1, 12), st.integers(1, 6), st.integers(1, 60),
       st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_y4m_round_trip(half_w, half_h, fps, seed):
    w, h = half_w * 2, half_h * 2
    rng = np.random.RandomState(seed)
    frames = [
        (rng.randint(0, 256, (h, w)).astype(np.uint8),
         rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
         rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8))
        for _ in range(rng.randint(1, 6))
    ]
    gw, gh, num, den, fb = y4m_decode(y4m_encode(frames, fps))
    assert (gw, gh, num, den) == (w, h, fps, 1)
    assert len(fb) == len(frames)
    for f, (y, u, v) in zip(fb, frames):
        assert f == y.tobytes() + u.tobytes() + v.tobytes()


@given(st.binary(max_size=64))
@settings(max_examples=60, deadline=None)
def test_sniffer_never_returns_garbage(payload):
    """Arbitrary bytes either decode as a recognized container or
    raise (never a silent wrong answer).  Random short blobs virtually
    never carry a valid magic, so this pins the raise path."""
    try:
        feats = sniff_decoder("image", payload)
    except Exception:
        return
    # if it decoded, the magic must actually have been present
    assert payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"BM" \
        or payload[:4] == b"RIFF" or payload[:9] == b"YUV4MPEG2"
    assert isinstance(feats, dict)
