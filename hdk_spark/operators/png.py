"""Minimal real PNG codec — pure stdlib (zlib) + numpy.

The container has no PIL/libjpeg/ffmpeg, but PNG needs neither: the
format is zlib-compressed scanlines with 5 per-row predictor filters
(PNG spec, RFC 2083). This implements honest decode/encode for the
common cases so ``multimodal.decode_image(use_real_codec=True)``
operates on REAL pixels:

- decode: 8-bit depth; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five row filters incl. Paeth;
  non-interlaced only (Adam7 raises).
- encode: filter-0 rows, fixed zlib level — enough for round-trips and
  for resize_images to re-emit real bytes.

Per-pixel work is numpy-vectorized along each row; the only Python
loop is over rows (filters have a serial row dependency by design).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return len(data) > 8 and data[:8] == _SIG


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            break


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = bit_depth = interlace = None
    palette = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f = filters[y]
        cur = rows[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub — serial along the row, step by pixel width
            r = cur
            for x in range(ch, stride):
                r[x] = (r[x] + r[x - ch]) & 0xFF
            out[y] = r
        elif f == 2:  # Up — vectorized
            out[y] = (cur + prev) & 0xFF
        elif f == 3:  # Average
            r = cur
            for x in range(stride):
                left = r[x - ch] if x >= ch else 0
                r[x] = (r[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = r
        elif f == 4:  # Paeth
            r = cur
            for x in range(stride):
                a = r[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                r[x] = (r[x] + pr) & 0xFF
            out[y] = r
        else:
            raise ValueError(f"bad PNG filter type {f}")
    img = out.astype(np.uint8).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C∈{1,2,3,4}) array → PNG bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (real pixel work, no deps)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples int16 array of shape (n, channels), rate).
    Stdlib ``wave`` — a real audio decode path with no external codec."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as wf:
        n, ch, sw = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(n)
    if sw != 2:
        raise ValueError(f"unsupported WAV sample width {sw} (only 16-bit)")
    arr = np.frombuffer(frames, dtype="<i2").reshape(-1, ch)
    return arr, rate
