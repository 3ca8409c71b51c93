"""Pure-Python media codecs — real PNG and WAV encode/decode from stdlib.

The container has no PIL/librosa/av, but PNG is just zlib (stdlib) plus
chunk framing/CRC, and WAV is stdlib ``wave`` — so the multimodal stages'
"real" paths (`stages/multimodal.py`) need no third-party codec at all for
these two formats.  This module implements:

- ``encode_png`` / ``decode_png``: 8-bit greyscale / RGB / RGBA,
  non-interlaced.  The encoder emits filter-0 scanlines; the decoder
  implements ALL five PNG filter types (None/Sub/Up/Average/Paeth, PNG
  spec §9) so externally-produced baseline PNGs decode too.  Chunk CRCs
  are verified on decode.
- ``encode_wav`` / ``decode_wav``: PCM16 mono/stereo via stdlib ``wave``.

Everything is deterministic byte-for-byte, which keeps the multimodal
stages' outputs reproducible across runs and nodes (same contract as the
``fake=True`` md5 stubs the CI oracles use).

Reference scope note: the reference repo (boxorange/BioIE-LLM) is
text-only; multimodal columns are part of this repo's training-data
engine brief, not reference parity.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (H,W) | (H,W,1) | (H,W,3) | (H,W,4) → PNG bytes.

    Filter 0 on every scanline: decode is then a pure reshape, and the
    bytes are a deterministic function of the pixels (no heuristic filter
    choice), which matters for content-hash invariants downstream.
    """
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"encode_png: bad shape {arr.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, compress_level)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (H, W*C) uint8."""
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: IDAT length mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        cur = lines[y, 1:].astype(np.int32)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 1:  # Sub — left dependency: sequential per pixel
            rec = cur.copy()
            for i in range(c, stride):
                rec[i] = (rec[i] + rec[i - c]) & 0xFF
        elif f == 3:  # Average
            rec = cur.copy()
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur.copy()
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                ul = prev[i - c] if i >= c else 0
                rec[i] = (rec[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H,W) for greyscale, else (H,W,C).

    8-bit non-interlaced baseline only (the subset ``encode_png`` emits,
    plus Sub/Up/Average/Paeth filtered rows from external encoders).
    Chunk CRCs are verified; raises ``ValueError`` on corruption.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("PNG: bad signature")
    pos = 8
    ihdr = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, interlace={interlace})"
        )
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    c = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    flat = _unfilter(raw, h, w, c)
    arr = flat.reshape(h, w, c)
    return arr[:, :, 0] if c == 1 else arr


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (H,W[,C]) → (height,width[,C]) — pure
    integer index math, deterministic, no resampling kernel choice."""
    h, w = arr.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return arr[ys][:, xs]


def encode_wav(
    samples: np.ndarray, rate: int = 16_000, channels: int | None = None
) -> bytes:
    """int16 samples (n,) mono or (n, channels) → WAV (PCM16) bytes."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16, got {s.dtype}")
    if s.ndim == 1:
        nch = channels or 1
    else:
        nch = s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.reshape(-1).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 array [n] mono / [n, channels], sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"decode_wav: PCM16 only (width={wf.getsampwidth()})"
            )
        nch = wf.getnchannels()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    s = np.frombuffer(frames, dtype=np.int16)
    return (s if nch == 1 else s.reshape(-1, nch)), rate
