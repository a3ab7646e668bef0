"""EXIF metadata extraction from JPEG binary columns — the multimodal
curation pass that must NEVER decode pixels: at 100 TB you read the
few-hundred-byte APP1 segment of every image (orientation for
normalization, capture time for dedup/temporal joins, camera
make/model for source profiling, GPS PRESENCE as a PII flag) without
touching the entropy-coded scan data. ``exif_extract`` therefore walks
only the JPEG marker chain up to SOS and parses the TIFF/IFD0
structure inside APP1 — O(header bytes) per image regardless of pixel
count.

Beyond-reference (the reference has no image surface; its binary
columns stop at LIKE on BYTEA). Format per the public specs: JPEG
marker layout ITU-T T.81 §B, EXIF/TIFF structure JEITA CP-3451
(Exif 2.3) — "Exif\\0\\0" + TIFF header (II/MM byte order, magic 42,
IFD0 offset) + 12-byte IFD entries. Both byte orders are parsed and
the builder can plant either, so tests pin endian symmetry.

Totality contract: junk bytes, truncated segments, or absent APP1
never raise — ``has_exif`` records whether an Exif APP1 segment
exists; fields parse to NULL individually when their tag is missing
or the structure is malformed. (A crawl image corpus is mostly junk;
a metadata pass that throws is useless.)

Scale shape: ``exif_extract`` is one Arrow-batched ``mapInPandas``
projection — map-only, no shuffle; the Python kernel is justified
because byte-level TIFF walking has no JVM expression form (the
established codec-op rationale, cf. operators/jpeg.py).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

__all__ = ["build_exif_app1", "parse_exif", "exif_extract", "image_header_info", "image_info_extract", "wav_header_info", "avi_header_info", "media_info_extract"]

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825


def build_exif_app1(
    orientation: int | None = 1,
    datetime: str | None = None,
    make: str | None = None,
    model: str | None = None,
    gps: bool = False,
    big_endian: bool = False,
) -> bytes:
    """A complete APP1 Exif segment (marker + length + payload) with
    the given IFD0 tags — the deterministic planting side of the
    contract row and the endian-symmetry tests. ASCII values are
    NUL-terminated and stored in the data area per the TIFF spec
    (values over 4 bytes live at an offset); SHORT/LONG values pack
    inline left-justified."""
    bo = ">" if big_endian else "<"
    entries: list[tuple[int, int, int, bytes | int]] = []
    data_area = b""

    def ascii_entry(tag: int, s: str) -> None:
        nonlocal data_area
        raw = s.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(raw), raw))

    if make is not None:
        ascii_entry(_TAG_MAKE, make)
    if model is not None:
        ascii_entry(_TAG_MODEL, model)
    if orientation is not None:
        entries.append((_TAG_ORIENTATION, 3, 1, orientation))
    if datetime is not None:
        ascii_entry(_TAG_DATETIME, datetime)
    if gps:
        # pointer to a minimal (empty) GPS IFD in the data area
        entries.append((_TAG_GPS_IFD, 4, 1, None))  # offset patched below

    entries.sort(key=lambda e: e[0])  # TIFF requires ascending tags
    n = len(entries)
    ifd0_off = 8  # right after the TIFF header
    data_off = ifd0_off + 2 + 12 * n + 4

    out_entries = b""
    for tag, typ, cnt, val in entries:
        head = struct.pack(bo + "HHI", tag, typ, cnt)
        if typ == 2:  # ASCII
            if cnt <= 4:
                out_entries += head + val.ljust(4, b"\x00")
            else:
                out_entries += head + struct.pack(bo + "I", data_off + len(data_area))
                data_area += val
        elif typ == 3:  # SHORT, inline left-justified
            out_entries += head + struct.pack(bo + "H", val) + b"\x00\x00"
        else:  # LONG — the GPS IFD pointer
            gps_ifd = struct.pack(bo + "H", 0) + struct.pack(bo + "I", 0)
            out_entries += head + struct.pack(
                bo + "I", data_off + len(data_area)
            )
            data_area += gps_ifd

    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", ifd0_off)
        + struct.pack(bo + "H", n)
        + out_entries
        + struct.pack(bo + "I", 0)  # no IFD1
        + data_area
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def parse_exif(data: bytes) -> dict:
    """Parse the first Exif APP1 segment of a JPEG byte string into
    {has_exif, orientation, datetime, make, model, has_gps}. Total:
    any structural problem degrades to NULL fields, never an
    exception (module docstring)."""
    out = {
        "has_exif": False,
        "orientation": None,
        "datetime": None,
        "make": None,
        "model": None,
        "has_gps": False,
    }
    if not isinstance(data, (bytes, bytearray)) or len(data) < 4:
        return out
    if data[0:2] != b"\xff\xd8":  # not a JPEG
        return out
    pos = 2
    tiff = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: header over
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        seg_end = pos + 2 + seglen
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            out["has_exif"] = True
            tiff = data[pos + 10:min(seg_end, len(data))]
            break
        pos = seg_end
    if tiff is None or len(tiff) < 8:
        return out
    order = tiff[0:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        return out
    try:
        magic, ifd0 = struct.unpack(bo + "HI", tiff[2:8])
        if magic != 42 or ifd0 + 2 > len(tiff):
            return out
        n = struct.unpack(bo + "H", tiff[ifd0:ifd0 + 2])[0]

        def read_ascii(cnt: int, valfield: bytes) -> str | None:
            if cnt <= 4:
                raw = valfield[:cnt]
            else:
                off = struct.unpack(bo + "I", valfield)[0]
                if off + cnt > len(tiff):
                    return None
                raw = tiff[off:off + cnt]
            return raw.split(b"\x00", 1)[0].decode("ascii", "replace")

        for i in range(n):
            e = ifd0 + 2 + 12 * i
            if e + 12 > len(tiff):
                break
            tag, typ, cnt = struct.unpack(bo + "HHI", tiff[e:e + 8])
            val = tiff[e + 8:e + 12]
            if tag == _TAG_ORIENTATION and typ == 3:
                out["orientation"] = struct.unpack(bo + "H", val[:2])[0]
            elif tag == _TAG_DATETIME and typ == 2:
                out["datetime"] = read_ascii(cnt, val)
            elif tag == _TAG_MAKE and typ == 2:
                out["make"] = read_ascii(cnt, val)
            elif tag == _TAG_MODEL and typ == 2:
                out["model"] = read_ascii(cnt, val)
            elif tag == _TAG_GPS_IFD:
                out["has_gps"] = True
    except (struct.error, IndexError):
        pass  # totality: keep whatever parsed before the break
    return out


def exif_extract(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, has_exif, orientation, datetime, make, model, has_gps) for
    every JPEG blob — Arrow-batched mapInPandas over header bytes
    only; pixel data is never entropy-decoded (module docstring)."""
    import pandas as pd

    schema = (
        f"{id_col} long, has_exif boolean, orientation int, "
        "datetime string, make string, model string, has_gps boolean"
    )

    def kernel(batches):
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[id_col], pdf[data_col]):
                r = parse_exif(bytes(blob) if blob is not None else b"")
                recs.append((key, r["has_exif"], r["orientation"],
                             r["datetime"], r["make"], r["model"],
                             r["has_gps"]))
            yield pd.DataFrame(
                recs,
                columns=[id_col, "has_exif", "orientation", "datetime",
                         "make", "model", "has_gps"],
            )

    return df.select(id_col, data_col).mapInPandas(kernel, schema)


def image_header_info(data: bytes) -> dict:
    """Format + dimensions from image HEADER bytes only — the size
    gate every image-curation pipeline runs first (drop icons/
    thumbnails, cap megapixel bombs) and, like :func:`parse_exif`,
    deliberately decode-free: JPEG dims come from the SOF segment
    (ITU-T T.81 §B.2.2 — also exposing ``progressive``, SOF2),
    PNG dims from the IHDR chunk at its spec-fixed offset (RFC 2083
    §3.1). Returns {format: 'jpeg'|'png'|'unknown', width, height,
    progressive}; total on junk (unknown/NULLs)."""
    out = {"format": "unknown", "width": None, "height": None,
           "progressive": None}
    if not isinstance(data, (bytes, bytearray)) or len(data) < 8:
        return out
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        out["format"] = "png"
        if len(data) >= 24 and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            out["width"], out["height"] = w, h
            out["progressive"] = len(data) > 28 and data[28] == 1  # interlace
        return out
    if data[:2] != b"\xff\xd8":
        return out
    out["format"] = "jpeg"
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD9, 0xDA) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            if marker in (0xD9, 0xDA):
                break
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2) and pos + 9 <= len(data):
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            out["width"], out["height"] = w, h
            out["progressive"] = marker == 0xC2
            break
        pos += 2 + seglen
    return out


def image_info_extract(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, format, width, height, progressive) from header bytes via
    one Arrow-batched mapInPandas — the map-only size gate."""
    import pandas as pd

    schema = (
        f"{id_col} long, format string, width int, height int, "
        "progressive boolean"
    )

    def kernel(batches):
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[id_col], pdf[data_col]):
                r = image_header_info(
                    bytes(blob) if blob is not None else b"")
                recs.append((key, r["format"], r["width"], r["height"],
                             r["progressive"]))
            yield pd.DataFrame(
                recs, columns=[id_col, "format", "width", "height",
                               "progressive"])

    return df.select(id_col, data_col).mapInPandas(kernel, schema)


def wav_header_info(data: bytes) -> dict:
    """WAV stream facts from the RIFF header chunks only (never
    reading sample payloads): channels, sample_rate, bits,
    n_samples, duration_ms (integer, floor) — the audio-curation
    duration/rate gate at corpus scale. Total on junk."""
    out = {"channels": None, "sample_rate": None, "bits": None,
           "n_samples": None, "duration_ms": None}
    if (not isinstance(data, (bytes, bytearray)) or len(data) < 12
            or data[:4] != b"RIFF" or data[8:12] != b"WAVE"):
        return out
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"fmt " and pos + 8 + 16 <= len(data):
            (_, ch, rate, _, block, bits) = struct.unpack(
                "<HHIIHH", data[pos + 8:pos + 24])
            fmt = (ch, rate, block, bits)
        elif cid == b"data":
            data_size = size
        if fmt is not None and data_size is not None:
            break
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None:
        return out
    ch, rate, block, bits = fmt
    out.update(channels=ch, sample_rate=rate, bits=bits)
    if data_size is not None and block:
        n = data_size // block
        out["n_samples"] = n
        if rate:
            out["duration_ms"] = n * 1000 // rate
    return out


def avi_header_info(data: bytes) -> dict:
    """AVI stream facts from the avih main header only (frame
    payloads never touched): width, height, n_frames, fps_milli
    (1e6·1000 // µs-per-frame — exact integer milli-fps) and
    duration_ms. Total on junk."""
    out = {"width": None, "height": None, "n_frames": None,
           "fps_milli": None, "duration_ms": None}
    if (not isinstance(data, (bytes, bytearray)) or len(data) < 12
            or data[:4] != b"RIFF" or data[8:12] != b"AVI "):
        return out

    def walk(off: int, end: int):
        while off + 8 <= end:
            cid = data[off:off + 4]
            size = struct.unpack("<I", data[off + 4:off + 8])[0]
            body = off + 8
            if cid == b"LIST":
                got = walk(body + 4, min(body + size, len(data)))
                if got is not None:
                    return got
            elif cid == b"avih" and body + 40 <= len(data):
                return data[body:body + 40]
            off = body + size + (size & 1)
        return None

    avih = walk(12, len(data))
    if avih is None:
        return out
    uspf, _, _, _, frames = struct.unpack("<IIIII", avih[:20])
    w, h = struct.unpack("<II", avih[32:40])
    out.update(width=w, height=h, n_frames=frames)
    if uspf:
        out["fps_milli"] = 1_000_000_000 // uspf
        out["duration_ms"] = frames * uspf // 1000
    return out


def media_info_extract(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
) -> DataFrame:
    """Header-only A/V facts for a binary media column: detects
    WAV/AVI by magic and emits the union schema (id, format,
    channels, sample_rate, n_samples, width, height, n_frames,
    fps_milli, duration_ms) — one Arrow-batched map-only pass, the
    audio/video companion of :func:`image_info_extract`."""
    import pandas as pd

    schema = (
        f"{id_col} long, format string, channels int, sample_rate int, "
        "n_samples long, width int, height int, n_frames long, "
        "fps_milli long, duration_ms long"
    )

    def kernel(batches):
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[id_col], pdf[data_col]):
                b = bytes(blob) if blob is not None else b""
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    r = wav_header_info(b)
                    recs.append((key, "wav", r["channels"],
                                 r["sample_rate"], r["n_samples"], None,
                                 None, None, None, r["duration_ms"]))
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    r = avi_header_info(b)
                    recs.append((key, "avi", None, None, None, r["width"],
                                 r["height"], r["n_frames"], r["fps_milli"],
                                 r["duration_ms"]))
                else:
                    recs.append((key, "unknown") + (None,) * 8)
            yield pd.DataFrame(
                recs, columns=[id_col, "format", "channels", "sample_rate",
                               "n_samples", "width", "height", "n_frames",
                               "fps_milli", "duration_ms"])

    return df.select(id_col, data_col).mapInPandas(kernel, schema)
