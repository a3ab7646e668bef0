"""Pure-numpy uncompressed-AVI (RIFF 'DIB ') codec — the real video
demux path for this environment (no ffmpeg; compressed codecs remain
an honest boundary, see multimodal.py docstring). Uncompressed AVI is
a plain RIFF container: 'hdrl' carries dimensions, 'movi' carries one
'00db' chunk per frame of bottom-up BGR rows — entirely parseable with
stdlib struct + numpy, no external codec.

Used by multimodal.sample_frames(use_real_codec=True): frame sampling
SEEKS over the chunk index instead of materializing every frame, so
sampling every Nth frame reads ~1/N of the payload bytes into arrays.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_avi", "decode_avi", "iter_frame_chunks", "is_avi"]


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi(frames: "list[np.ndarray]", fps: int = 30) -> bytes:
    """HxWx3 uint8 RGB frames → uncompressed AVI bytes (24-bit DIB,
    bottom-up BGR rows per the format)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, ch = frames[0].shape
    if ch != 3:
        raise ValueError("encode_avi expects RGB frames (HxWx3)")
    payloads = [f[::-1, :, ::-1].tobytes() for f in frames]
    sz = len(payloads[0])
    n = len(frames)
    avih = struct.pack(
        "<14I", int(1e6 / fps), sz * fps, 0, 0x10, n, 0, 1, sz, w, h, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, n, sz, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, sz, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list(b"movi", b"".join(_chunk(b"00db", p) for p in payloads))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk(data: bytes, off: int, end: int):
    while off + 8 <= end:
        fourcc = data[off: off + 4]
        size = struct.unpack("<I", data[off + 4: off + 8])[0]
        yield fourcc, off + 8, size
        off += 8 + size + (size % 2)


def iter_frame_chunks(data: bytes):
    """Yield (frame_idx, byte_offset, size) for every video frame chunk
    plus the (width, height) header — WITHOUT copying frame payloads,
    so a sampler can slice only the frames it keeps."""
    if not is_avi(data):
        raise ValueError("not an AVI file")
    end = 8 + struct.unpack("<I", data[4:8])[0]
    w = h = None
    frames = []
    for fourcc, off, size in _walk(data, 12, min(end, len(data))):
        if fourcc == b"LIST":
            kind = data[off: off + 4]
            if kind == b"hdrl":
                for f2, o2, _s2 in _walk(data, off + 4, off + size):
                    if f2 == b"avih":
                        vals = struct.unpack("<14I", data[o2: o2 + 56])
                        w, h = vals[8], vals[9]
            elif kind == b"movi":
                for f2, o2, s2 in _walk(data, off + 4, off + size):
                    if f2 in (b"00db", b"00dc"):
                        frames.append((len(frames), o2, s2))
    if w is None:
        raise ValueError("AVI missing avih header")
    return w, h, frames


def decode_frame(data: bytes, off: int, size: int, w: int, h: int) -> np.ndarray:
    """One '00db' payload slice → HxWx3 uint8 RGB array."""
    arr = np.frombuffer(data[off: off + size], dtype=np.uint8)
    if arr.size != h * w * 3:
        raise ValueError(
            f"frame chunk has {arr.size} bytes, expected {h * w * 3} "
            "(only 24-bit uncompressed DIB is supported)"
        )
    return arr.reshape(h, w, 3)[::-1, :, ::-1].copy()


def decode_avi(data: bytes) -> "tuple[list[np.ndarray], int, int]":
    """Full decode: (RGB frames, width, height)."""
    w, h, chunks = iter_frame_chunks(data)
    return [decode_frame(data, o, s, w, h) for _i, o, s in chunks], w, h
