"""Baseline JPEG (ITU-T T.81 sequential DCT) codec in pure
numpy + stdlib — closes the image-codec boundary left in round 1
(the environment has no libjpeg/PIL; reference intel/hdk has no media
codec surface at all, its type lattice stops at arrays —
omniscidb/IR/Type.h:23-40).

Scope (the honest contract):

- decode: baseline sequential (SOF0/1) AND progressive (SOF2,
  spectral selection + successive approximation, T.81 Annex G),
  8-bit, grayscale or YCbCr with ARBITRARY sampling factors (4:4:4,
  4:2:0, 4:2:2 — the MCU walk is generic), restart markers, tables
  read from the stream's own DQT/DHT segments. Arithmetic coding,
  hierarchical (SOF5-7/13-15), lossless (SOF3/11) and 12-bit
  precision raise a clear error.
- encode: 4:4:4 (or single-component grayscale) with the Annex K
  quantization tables scaled by libjpeg's quality formula and the
  Annex K Huffman tables. No subsampling on encode keeps the round
  trip exactly block-aligned. ``progressive=True`` emits a SOF2
  scan script (DC first + refine, two AC bands first + refine per
  component, EOB-run coding) — primarily the round-trip witness for
  the progressive decoder, since no external codec exists here.

The per-block transform is vectorized (one matmul pair per block);
the entropy loop is plain Python — this is a correctness/boundary
codec, the Arrow-batched pipeline around it is the scale surface.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_jpeg", "decode_jpeg", "encode_jpeg"]

# ---------------------------------------------------------------------------
# constants (JPEG Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int32,
)

# (bits[1..16], values) — standard tables, Annex K.3
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II basis matrix: D @ block @ D.T is the forward transform
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Huffman helpers
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-coded segment reader with 0xFF00 unstuffing and restart
    marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data) - 1:
            raise ValueError(
                "truncated JPEG stream: entropy-coded data ends "
                "before the scan is complete"
            )
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker — caller resyncs
                raise _RestartMarker(self.pos)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside scan data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in scan data")

    def resync(self) -> None:
        """Skip a restart marker and clear bit state."""
        self.pos += 2
        self.acc = 0
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, pos: int):
        self.pos = pos


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to uint8 pixels: (h, w)
    for grayscale, (h, w, 3) RGB otherwise. Baseline decodes its
    single scan directly to pixels; progressive accumulates every
    scan's contribution into per-component coefficient arrays and
    runs ONE vectorized dequantize+IDCT at EOI."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI marker)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coefs = None  # progressive: per-component zigzag coefficient arrays
    restart_interval = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                table = _build_decode_map(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG "
                f"are supported (got SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            scan_start = pos + seglen
            if not frame["progressive"]:
                scan_tables = {cs: (td, ta) for cs, td, ta in scan_comps}
                return _decode_scan(
                    data, scan_start, frame, scan_tables, qt,
                    huff_dc, huff_ac, restart_interval,
                )
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_progressive_scan(
                data, scan_start, frame, coefs, scan_comps,
                ss, se, ah, al, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen
    if coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
    raise ValueError("no scan data found")


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G: spectral selection + successive
# approximation; per-scan algorithms follow G.1.2/G.2, matching the
# libjpeg decode_mcu_DC/AC_first/refine structure)
# ---------------------------------------------------------------------------


def _mcu_dims(frame) -> tuple[int, int, int, int]:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _block_dims(frame, c) -> tuple[int, int]:
    """Non-interleaved data-unit dims of one component (T.81 A.2.2)."""
    hmax, vmax, _, _ = _mcu_dims(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _alloc_coefs(frame) -> list[np.ndarray]:
    """MCU-padded per-component zigzag coefficient arrays (covers both
    interleaved DC scans and non-interleaved AC scans)."""
    _, _, mcus_x, mcus_y = _mcu_dims(frame)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _skip_restart(reader, data) -> None:
    """Byte-align at a restart boundary and consume the RSTn marker."""
    reader.nbits = 0
    p = reader.pos
    while p + 1 < len(data) and (
        data[p] != 0xFF or not (0xD0 <= data[p + 1] <= 0xD7)
    ):
        p += 1
    if p + 1 >= len(data):
        raise ValueError(
            "truncated JPEG stream: expected RSTn restart marker "
            "before end of entropy-coded data"
        )
    reader.pos = p
    reader.resync()


def _next_marker(data, pos: int) -> int:
    """First real marker at/after pos (skips stuffed FF00 and RSTn)."""
    while pos < len(data) - 1:
        if (
            data[pos] == 0xFF
            and data[pos + 1] != 0x00
            and not (0xD0 <= data[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return len(data)


def _decode_progressive_scan(
    data, pos, frame, coefs, scan_comps, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval,
) -> int:
    comps = frame["comps"]
    idx = {c["id"]: i for i, c in enumerate(comps)}
    reader = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        if len(scan_comps) > 1:
            # interleaved DC scan: MCU walk like baseline
            _, _, mcus_x, mcus_y = _mcu_dims(frame)
            pred = [0] * len(comps)
            mcu = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if (restart_interval and mcu
                            and mcu % restart_interval == 0):
                        _skip_restart(reader, data)
                        pred = [0] * len(comps)
                    for cs, td, _ta in scan_comps:
                        ci = idx[cs]
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coefs[ci][
                                    my * c["v"] + by, mx * c["h"] + bx
                                ]
                                if ah == 0:
                                    t = reader.read_huff(huff_dc[td])
                                    diff = _extend(reader.read_bits(t), t)
                                    pred[ci] += diff
                                    blk[0] = pred[ci] << al
                                else:
                                    if reader.read_bit():
                                        blk[0] |= 1 << al
                    mcu += 1
        else:
            cs, td, _ta = scan_comps[0]
            ci = idx[cs]
            by_n, bx_n = _block_dims(frame, comps[ci])
            pred = 0
            mcu = 0
            for byi in range(by_n):
                for bxi in range(bx_n):
                    if (restart_interval and mcu
                            and mcu % restart_interval == 0):
                        _skip_restart(reader, data)
                        pred = 0
                    blk = coefs[ci][byi, bxi]
                    if ah == 0:
                        t = reader.read_huff(huff_dc[td])
                        pred += _extend(reader.read_bits(t), t)
                        blk[0] = pred << al
                    else:
                        if reader.read_bit():
                            blk[0] |= 1 << al
                    mcu += 1
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scans must be single-component")
        cs, _td, ta = scan_comps[0]
        ci = idx[cs]
        by_n, bx_n = _block_dims(frame, comps[ci])
        table = huff_ac[ta]
        eobrun = 0
        mcu = 0
        for byi in range(by_n):
            for bxi in range(bx_n):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    _skip_restart(reader, data)
                    eobrun = 0
                blk = coefs[ci][byi, bxi]
                if ah == 0:
                    eobrun = _ac_first(reader, blk, ss, se, al, eobrun, table)
                else:
                    eobrun = _ac_refine(reader, blk, ss, se, al, eobrun, table)
                mcu += 1
    return _next_marker(data, reader.pos)


def _ac_first(reader, blk, ss, se, al, eobrun, table) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_huff(table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+ext blocks ending here
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past end of spectral band")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
    return 0


def _ac_refine(reader, blk, ss, se, al, eobrun, table) -> int:
    """Successive-approximation AC refinement (G.1.2.3): one
    correction bit per already-nonzero coefficient, new ±1<<Al
    coefficients inserted at their zero-history positions."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_huff(table)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("refinement scan symbol with s != 1")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        if newval:
                            blk[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _mcu_dims(frame)
    full = []
    for c, zz in zip(comps, coefs):
        by, bx, _ = zz.shape
        nat = np.zeros((by, bx, 64))
        nat[:, :, ZIGZAG] = zz * qt[c["tq"]][None, None, :]
        m = nat.reshape(by, bx, 8, 8)
        pix = np.einsum("ij,abjk,kl->abil", _D.T, m, _D) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0),
                hmax // c["h"], axis=1,
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, scan_tables, qt, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
    pred = [0] * len(comps)
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and consume the RSTn marker (bounded scan;
                # raises ValueError on truncated streams)
                _skip_restart(reader, data)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_tables[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            block = _decode_block(
                                reader, huff_dc[td], huff_ac[ta]
                            )
                        except _RestartMarker:
                            raise ValueError(
                                "restart marker landed mid-MCU"
                            ) from None
                        block[0] += pred[ci]
                        pred[ci] = block[0]
                        deq = np.zeros(64)
                        deq[ZIGZAG] = block * q
                        pix = _D.T @ deq.reshape(8, 8) @ _D + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for c, plane in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table) -> np.ndarray:
    out = np.zeros(64, dtype=np.int64)
    t = reader.read_huff(dc_table)
    out[0] = _extend(reader.read_bits(t), t)
    k = 1
    while k < 64:
        rs = reader.read_huff(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        out[k] = _extend(reader.read_bits(s), s)
        k += 1
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec

    def emit_restart(self, idx: int) -> None:
        """Byte-align and write RSTn (markers are never stuffed)."""
        self.flush()
        self.buf += bytes([0xFF, 0xD0 + (idx % 8)])


def _encode_block(bw, block_zz, pred, dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzagged quantized block; returns new DC."""
    diff = int(block_zz[0]) - pred
    mag = abs(diff)
    n = int(mag).bit_length()
    code, length = dc_codes[n]
    bw.write(code, length)
    if n:
        bw.write(diff if diff >= 0 else diff + (1 << n) - 1, n)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if block_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(block_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        n = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | n]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << n) - 1, n)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(block_zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels ((h, w) grayscale or (h, w, 3) RGB) as a
    baseline JPEG — 4:4:4 by default, 4:2:0 (2×2 box-averaged chroma)
    with ``subsample=True``; the latter exercises the decoder's
    generic sampling-factor MCU walk and is the common web layout.
    ``progressive=True`` emits the same quantized coefficients as a
    SOF2 scan script (interleaved DC first/refine at Al=1→0, per-
    component AC bands 1-5 and 6-63 first/refine with EOB-run coding)
    — the round-trip witness for the progressive decoder; pixels
    decode bit-identically to the baseline encoding of the image.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (baseline) / MCUs-or-blocks (each
    progressive scan) — the round-trip witness for the decoders'
    restart-resync paths (DC predictors and EOB runs reset at every
    marker per T.81 E.2.4/G.1.2.2)."""
    img = np.asarray(img)
    if img.ndim == 2:
        planes = [img.astype(np.float64) - 128.0]
    elif img.ndim == 3 and img.shape[2] == 3:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    else:
        raise ValueError("expected (h,w) grayscale or (h,w,3) RGB")
    h, w = img.shape[:2]
    nc = len(planes)
    ql, qc = _quality_tables(quality)
    qtabs = [ql] + ([qc, qc] if nc == 3 else [])
    if subsample and nc == 3:
        samplings = [(2, 2), (1, 1), (1, 1)]
        for ci in (1, 2):
            p = planes[ci]
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            pp = np.empty((eh, ew))
            pp[:h, :w] = p
            pp[h:, :w] = p[h - 1 : h, :]
            pp[:, w:] = pp[:, w - 1 : w]
            planes[ci] = 0.25 * (
                pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]
            )
    else:
        samplings = [(1, 1)] * nc
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT
    for i, q in enumerate([ql] if nc == 1 else [ql, qc]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i])
        out += q[ZIGZAG].astype(np.uint8).tobytes()
    # SOF0 (baseline) / SOF2 (progressive)
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for i in range(nc):
        hv = (samplings[i][0] << 4) | samplings[i][1]
        out += bytes([i + 1, hv, 0 if i == 0 else 1])

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # quantized zigzag coefficient arrays, one vectorized DCT pass per
    # component (shared by the baseline and progressive writers)
    zz_arrays = []
    for p, (hi, vi), q in zip(planes, samplings, qtabs):
        ph, pw = p.shape
        pp = np.empty((mcus_y * vi * 8, mcus_x * hi * 8))
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[ph - 1 : ph, :]  # edge-replicate padding
        pp[:, pw:] = pp[:, pw - 1 : pw]
        by, bx = mcus_y * vi, mcus_x * hi
        blocks = pp.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,kl->abil", _D, blocks, _D.T)
        zz = np.round(
            coef.reshape(by, bx, 64)[:, :, ZIGZAG] / q[ZIGZAG][None, None, :]
        ).astype(np.int64)
        zz_arrays.append(zz)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        _write_progressive_scans(out, zz_arrays, samplings, h, w,
                                 mcus_x, mcus_y, hmax, vmax,
                                 restart_interval)
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # DHT (standard tables)
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if nc == 3:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tid, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tid])
        out += bytes(bits) + bytes(values)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_codes = [_build_codes(*DC_LUMA)] + [_build_codes(*DC_CHROMA)] * (nc - 1)
    ac_codes = [_build_codes(*AC_LUMA)] + [_build_codes(*AC_CHROMA)] * (nc - 1)
    bw = _BitWriter()
    pred = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.emit_restart(rst)
                rst += 1
                pred = [0] * nc
            for ci in range(nc):
                hi, vi = samplings[ci]
                for by in range(vi):
                    for bx in range(hi):
                        zz = zz_arrays[ci][my * vi + by, mx * hi + bx]
                        pred[ci] = _encode_block(
                            bw, zz, pred[ci], dc_codes[ci], ac_codes[ci]
                        )
            mcu += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (the decoder's round-trip witness)
# ---------------------------------------------------------------------------

# correctness-only Huffman tables valid for EVERY progressive symbol:
# 12 DC categories at 4 bits; all 256 AC symbols (incl. EOBn r=0..14)
# as 255 nine-bit + 1 ten-bit codes (a DHT length count is one byte,
# so 256-at-one-length is unrepresentable) — canonical, all-ones code
# unused, Kraft-satisfying.
_PROG_DC = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
_PROG_AC = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def _write_progressive_scans(out, zz_arrays, samplings, h, w,
                             mcus_x, mcus_y, hmax, vmax,
                             restart_interval: int = 0) -> None:
    nc = len(zz_arrays)
    for tid, (bits, values) in ((0x00, _PROG_DC), (0x10, _PROG_AC)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tid])
        out += bytes(bits) + bytes(values)
    dc_codes = _build_codes(*_PROG_DC)
    ac_codes = _build_codes(*_PROG_AC)

    def sos(comp_ids, ss, se, ah, al):
        ns = len(comp_ids)
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
        for cid in comp_ids:
            out.extend(bytes([cid, 0x00]))  # dc table 0 / ac table 0
        out.extend(bytes([ss, se, (ah << 4) | al]))

    def block_dims(ci):
        hi, vi = samplings[ci]
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        return -(-ch // 8), -(-cw // 8)

    all_ids = list(range(1, nc + 1))
    # 1. DC first, interleaved, Al=1
    sos(all_ids, 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.emit_restart(rst)
                rst += 1
                pred = [0] * nc
            for ci in range(nc):
                hi, vi = samplings[ci]
                for by in range(vi):
                    for bx in range(hi):
                        v = int(zz_arrays[ci][my * vi + by, mx * hi + bx, 0]) >> 1
                        diff = v - pred[ci]
                        pred[ci] = v
                        n = abs(diff).bit_length()
                        code, ln = dc_codes[n]
                        bw.write(code, ln)
                        if n:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << n) - 1, n
                            )
            mcu += 1
    bw.flush()
    out += bw.buf
    # 2. AC firsts per component, two spectral bands, Al=1
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            sos([ci + 1], ss, se, 0, 1)
            bw = _BitWriter()
            _encode_ac_first(bw, zz_arrays[ci], block_dims(ci), ss, se, 1,
                             ac_codes, restart_interval)
            bw.flush()
            out += bw.buf
    # 3. DC refinement, interleaved, Ah=1 Al=0
    sos(all_ids, 0, 0, 1, 0)
    bw = _BitWriter()
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.emit_restart(rst)
                rst += 1
            for ci in range(nc):
                hi, vi = samplings[ci]
                for by in range(vi):
                    for bx in range(hi):
                        bw.write(
                            int(zz_arrays[ci][my * vi + by, mx * hi + bx, 0])
                            & 1,
                            1,
                        )
            mcu += 1
    bw.flush()
    out += bw.buf
    # 4. AC refinements per component, Ah=1 Al=0
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            sos([ci + 1], ss, se, 1, 0)
            bw = _BitWriter()
            _encode_ac_refine(bw, zz_arrays[ci], block_dims(ci), ss, se, 0,
                              ac_codes, restart_interval)
            bw.flush()
            out += bw.buf


def _encode_ac_first(bw, zz, dims, ss, se, al, ac_codes,
                     restart_interval: int = 0) -> None:
    by_n, bx_n = dims
    eobrun = 0
    mcu = 0
    rst = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun & ((1 << r) - 1), r)
            eobrun = 0

    for byi in range(by_n):
        for bxi in range(bx_n):
            if restart_interval and mcu and mcu % restart_interval == 0:
                flush()  # an EOB run may not span a restart interval
                bw.emit_restart(rst)
                rst += 1
            mcu += 1
            blk = zz[byi, bxi]
            vals = []
            for k in range(ss, se + 1):
                v = int(blk[k])
                a = abs(v) >> al
                vals.append(a if v >= 0 else -a)
            last = -1
            for i, v in enumerate(vals):
                if v:
                    last = i
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            r = 0
            for i in range(last + 1):
                v = vals[i]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                n = abs(v).bit_length()
                code, ln = ac_codes[(r << 4) | n]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << n) - 1, n)
                r = 0
            if last < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
    flush()


def _encode_ac_refine(bw, zz, dims, ss, se, al, ac_codes,
                      restart_interval: int = 0) -> None:
    """Successive-approximation AC refinement writer (mirrors libjpeg
    encode_mcu_AC_refine: correction bits buffered across EOB runs)."""
    by_n, bx_n = dims
    eobrun = 0
    mcu = 0
    rst = 0
    be: list[int] = []  # correction bits deferred with the EOB run

    def flush():
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun & ((1 << r) - 1), r)
            eobrun = 0
        for b in be:
            bw.write(b, 1)
        be = []

    for byi in range(by_n):
        for bxi in range(bx_n):
            if restart_interval and mcu and mcu % restart_interval == 0:
                flush()  # drain the EOB run + buffered correction bits
                bw.emit_restart(rst)
                rst += 1
            mcu += 1
            blk = zz[byi, bxi]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            pos = [int(blk[k]) >= 0 for k in range(ss, se + 1)]
            eob = -1
            for i, a in enumerate(absv):
                if a == 1:
                    eob = i
            r = 0
            br: list[int] = []
            for i, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    flush()
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for b in br:
                        bw.write(b, 1)
                    br = []
                if a > 1:
                    br.append(a & 1)
                    continue
                flush()
                code, ln = ac_codes[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if pos[i] else 0, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF:
                    flush()
    flush()
