"""Real, dependency-free media codecs for the multimodal operators.

The container has no Pillow/ffmpeg, but four public formats are fully
parseable with stdlib + numpy:

* PNG  — 8-bit grayscale/RGB/RGBA, non-interlaced; the decoder
  reverses all five scanline filters (None/Sub/Up/Average/Paeth, PNG
  spec §9) and the fixture encoder deliberately cycles them so every
  filter path is exercised.
* BMP  — BITMAPINFOHEADER, 24-bit uncompressed, bottom-up.
* WAV  — PCM via the stdlib ``wave`` module.
* Y4M  — YUV4MPEG2 C420: a real raw-video container (text header +
  ``FRAME`` blocks), so frame sampling decodes actual frame bytes.

Feature math is integer-exact then one IEEE division
(``mean_from_sum``), so encode-side ground truth and decode-side
results are bit-identical doubles across processes.

At 100 TB the decode stage would swap these for native codecs (same
signatures); the Spark-side plumbing in ops/multimodal.py is unchanged
either way.
"""

from __future__ import annotations

import struct
import zlib
from io import BytesIO
from typing import List, Tuple

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def mean_from_sum(total: int, count: int, full_scale: float) -> float:
    """Shared exact-mean formula: integer sum → ONE double division."""
    return float(total) / (count * full_scale)


# --------------------------------------------------------------- PNG
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_encode(pixels: np.ndarray) -> bytes:
    """8-bit gray (h,w) / RGB (h,w,3) / RGBA (h,w,4) → PNG bytes.
    Row filters cycle 0..4 so decoders must implement all of them."""
    if pixels.ndim == 2:
        color_type, channels = 0, 1
    elif pixels.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        color_type, channels = 6, 4
    h, w = pixels.shape[:2]
    raw = pixels.reshape(h, w * channels).astype(np.uint8)
    bpp = channels
    out = bytearray()
    prev = bytes(w * channels)
    for y in range(h):
        row = raw[y].tobytes()
        ft = y % 5
        out.append(ft)
        if ft == 0:
            out += row
        else:
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    pred = _paeth(a, b, c)
                out.append((row[x] - pred) & 0xFF)
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + chunk(b"IEND", b""))


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h,w) or (h,w,channels)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError("unsupported PNG variant (depth=%d interlace=%d)"
                         % (depth, interlace))
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError("unsupported PNG color type %d" % color_type)
    stride = w * channels
    data = zlib.decompress(idat)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    bpp = channels
    recon = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        ft = data[y * (stride + 1)]
        row = bytearray(data[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ft == 2:
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError("bad PNG filter %d" % ft)
        recon[y * stride:(y + 1) * stride] = row
        prev = bytes(row)
    arr = np.frombuffer(bytes(recon), dtype=np.uint8).reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr


# --------------------------------------------------------------- BMP
def bmp_encode(rgb: np.ndarray) -> bytes:
    """(h,w,3) uint8 RGB → 24-bit uncompressed bottom-up BMP."""
    h, w = rgb.shape[:2]
    pad = (4 - (w * 3) % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += rgb[y, :, ::-1].tobytes()  # BGR order
        body += b"\x00" * pad
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + dib + bytes(body)


def bmp_decode(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", payload[10:14])
    dib_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (comp,) = struct.unpack("<I", payload[30:34])
    if dib_size < 40 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant (bpp=%d comp=%d)"
                         % (bpp, comp))
    bottom_up = h > 0
    h = abs(h)
    pad = (4 - (w * 3) % 4) % 4
    stride = w * 3 + pad
    rows = []
    for y in range(h):
        start = offset + y * stride
        row = np.frombuffer(payload[start:start + w * 3],
                            dtype=np.uint8).reshape(w, 3)
        rows.append(row[:, ::-1])  # BGR → RGB
    if bottom_up:
        rows.reverse()
    return np.stack(rows)


# --------------------------------------------------------------- WAV
def wav_encode(samples: np.ndarray, framerate: int,
               channels: int = 1) -> bytes:
    """int16 samples (interleaved if stereo) → PCM WAV bytes."""
    import wave

    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> Tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 interleaved samples, framerate, channels)."""
    import wave

    with wave.open(BytesIO(payload), "rb") as wf:
        channels = wf.getnchannels()
        framerate = wf.getframerate()
        if wf.getsampwidth() != 2:
            raise ValueError("unsupported WAV sample width %d"
                             % wf.getsampwidth())
        frames = wf.readframes(wf.getnframes())
    return np.frombuffer(frames, dtype="<i2"), framerate, channels


# --------------------------------------------------------------- Y4M
def y4m_encode(frames: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
               fps_num: int, fps_den: int = 1) -> bytes:
    """[(Y(h,w), U(h/2,w/2), V(h/2,w/2))] uint8 → YUV4MPEG2 C420."""
    h, w = frames[0][0].shape
    out = bytearray(b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n"
                    % (w, h, fps_num, fps_den))
    for y, u, v in frames:
        out += b"FRAME\n"
        out += y.astype(np.uint8).tobytes()
        out += u.astype(np.uint8).tobytes()
        out += v.astype(np.uint8).tobytes()
    return bytes(out)


def y4m_decode(payload: bytes) -> Tuple[int, int, int, int, List[bytes]]:
    """Y4M bytes → (width, height, fps_num, fps_den, [frame bytes]).
    Frame bytes are the raw C420 planes (Y then U then V)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    w = h = fps_num = fps_den = None
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tok[:1] == b"C" and tok != b"C420":
            raise ValueError("unsupported Y4M chroma %s" % tok.decode())
    if not all(v is not None for v in (w, h, fps_num, fps_den)):
        raise ValueError("Y4M header missing W/H/F")
    frame_size = w * h + 2 * ((w // 2) * (h // 2))
    frames: List[bytes] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        frames.append(payload[fnl + 1:fnl + 1 + frame_size])
        pos = fnl + 1 + frame_size
    return w, h, fps_num, fps_den, frames
