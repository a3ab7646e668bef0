"""WARC (Web ARChive, ISO 28500) ingestion — the container format
training-data pipelines actually start from: CommonCrawl publishes
crawl snapshots as WARC files of gzip-compressed records, each holding
one HTTP response (or request/metadata/warcinfo record).

Beyond-reference (intel/hdk reads Arrow/CSV/Parquet only). Pure-stdlib
implementation (bytes parsing + zlib), same contract class as the
PNG/JPEG/AVI codecs: the REAL record/HTTP framing logic, exercised
end-to-end through Arrow-batched kernels, with deterministic builders
so tests and the driver oracle can predict every output byte.

Scale shape: WARC payloads are opaque binary columns; parsing is
map-only ``mapInPandas`` (record-parallel across files, IO-bound — the
right bound for a 100 TB crawl); downstream composes with
``html.html_extract`` → text operators. No shuffle anywhere here.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["build_warc", "parse_warc", "warc_records", "warc_probe"]

_CRLF = b"\r\n"


def build_warc(records: "list[dict]", gzip_per_record: bool = True) -> bytes:
    """Serialize records into a WARC file (WARC/1.0 framing). Each
    record dict: ``warc_type`` (required), ``payload`` bytes, plus any
    of ``target_uri``, ``date``, ``record_id``, ``content_type``.
    ``gzip_per_record=True`` emits one gzip member per record — the
    CommonCrawl layout that makes records independently seekable."""
    out = bytearray()
    for r in records:
        headers = [
            ("WARC-Type", r["warc_type"]),
            ("WARC-Record-ID", r.get("record_id", "<urn:uuid:0>")),
            ("WARC-Date", r.get("date", "2024-01-01T00:00:00Z")),
        ]
        if r.get("target_uri"):
            headers.append(("WARC-Target-URI", r["target_uri"]))
        if r.get("content_type"):
            headers.append(("Content-Type", r["content_type"]))
        payload = r.get("payload", b"")
        headers.append(("Content-Length", str(len(payload))))
        rec = bytearray(b"WARC/1.0\r\n")
        for k, v in headers:
            rec += f"{k}: {v}".encode("utf-8") + _CRLF
        rec += _CRLF + payload + _CRLF + _CRLF
        if gzip_per_record:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(bytes(rec)) + co.flush()
        else:
            out += rec
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (the CommonCrawl
    per-record layout decompresses to the plain WARC stream)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data[pos:])
            out += d.flush()
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member in WARC stream: {e}")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member in WARC stream")
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> "list[dict]":
    """Parse a WARC byte stream (plain or per-record-gzip) into record
    dicts: warc_type, target_uri, date, content_type, payload — and,
    for application/http responses, the inner ``http_status``,
    ``http_content_type``, and ``body`` split out of the HTTP message.
    Raises ValueError on framing violations (bad magic, truncated
    payload) — honest boundaries, like the codecs."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    while pos < len(data):
        # tolerate inter-record padding CRLFs
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC version magic at byte {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without valid Content-Length")
        body_start = hdr_end + 4
        payload = data[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": payload,
            "http_status": None,
            "http_content_type": "",
            "body": payload,
        }
        if rec["content_type"].startswith("application/http"):
            split = payload.find(_CRLF + _CRLF)
            if split >= 0:
                http_lines = payload[:split].split(_CRLF)
                status_parts = http_lines[0].decode(
                    "utf-8", "replace").split()
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    rec["http_status"] = int(status_parts[1])
                for line in http_lines[1:]:
                    k, _, v = line.decode("utf-8", "replace").partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                rec["body"] = payload[split + 4 :]
        records.append(rec)
        pos = body_start + clen
    return records


_WARC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body_len", T.LongType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def warc_records(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "warc_id",
) -> DataFrame:
    """Explode a binary column of WARC files into one row per record
    (id, rec_idx, warc_type, target_uri, warc_date, http_status,
    http_content_type, body_len, body) — the ingest edge of a crawl
    pipeline: follow with a response/status/content-type filter, then
    ``html_extract`` on the body. Map-only Arrow batches; parse cost
    dominates (the right bound for bulk crawl ingest)."""

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[data_col]):
                for i, rec in enumerate(parse_warc(bytes(blob or b""))):
                    rows.append(
                        (
                            int(rid),
                            i,
                            rec["warc_type"],
                            rec["target_uri"],
                            rec["date"],
                            rec["http_status"],
                            rec["http_content_type"],
                            len(rec["body"]),
                            rec["body"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WARC_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(
        parse_batch, _WARC_SCHEMA
    )


def warc_probe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drive the REAL WARC writer+parser end to end per row with
    oracle-predictable output (the progressive-JPEG probe pattern):
    each document becomes a per-record-gzip WARC of a warcinfo record
    plus a 200 HTTP response wrapping the document text; the stream is
    parsed back through :func:`parse_warc` and every record's framing
    fields + body digest are emitted — any regression in gzip-member
    walking, header parsing, Content-Length framing, or HTTP
    splitting changes a digest or a count and fails the value hash.

    Returns (id, rec_idx, warc_type, target_uri, http_status,
    body_len, body_md5)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("rec_idx", T.IntegerType()),
            T.StructField("warc_type", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("http_status", T.IntegerType()),
            T.StructField("body_len", T.LongType()),
            T.StructField("body_md5", T.StringType()),
        ]
    )

    def probe_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                body = (text or "").encode("utf-8")
                http = (
                    b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/plain; charset=utf-8\r\n"
                    b"\r\n" + body
                )
                data = build_warc(
                    [
                        {
                            "warc_type": "warcinfo",
                            "payload": b"software: hdk-spark\r\n",
                            "content_type": "application/warc-fields",
                        },
                        {
                            "warc_type": "response",
                            "target_uri": (
                                f"https://example.com/doc/{int(rid)}"
                            ),
                            "payload": http,
                            "content_type":
                                "application/http;msgtype=response",
                        },
                    ],
                    gzip_per_record=True,
                )
                assert data[:2] == b"\x1f\x8b"  # really the gzip layout
                for i, rec in enumerate(parse_warc(data)):
                    rows.append(
                        (
                            int(rid), i, rec["warc_type"],
                            rec["target_uri"], rec["http_status"],
                            len(rec["body"]),
                            hashlib.md5(rec["body"]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        probe_batch, out_schema
    )
