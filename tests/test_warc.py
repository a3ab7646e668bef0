"""WARC ingest: build/parse round trip (plain + per-record gzip),
HTTP response splitting, framing error boundaries, the Spark record
explode, and composition with HTML extraction."""

import hashlib

import pytest

from hdk_spark.operators import warc


def _sample_records():
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"\r\n"
        b"<html><body><p>hello crawl</p></body></html>"
    )
    return [
        {"warc_type": "warcinfo", "payload": b"software: hdk-spark\r\n",
         "content_type": "application/warc-fields"},
        {"warc_type": "response", "target_uri": "https://example.com/a",
         "payload": http, "content_type": "application/http;msgtype=response",
         "date": "2024-02-03T04:05:06Z"},
        {"warc_type": "request", "target_uri": "https://example.com/a",
         "payload": b"GET /a HTTP/1.1\r\n\r\n",
         "content_type": "application/http;msgtype=request"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    data = warc.build_warc(_sample_records(), gzip_per_record=gz)
    if gz:
        assert data[:2] == b"\x1f\x8b"
    recs = warc.parse_warc(data)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "request"]
    resp = recs[1]
    assert resp["target_uri"] == "https://example.com/a"
    assert resp["date"] == "2024-02-03T04:05:06Z"
    assert resp["http_status"] == 200
    assert resp["http_content_type"].startswith("text/html")
    assert resp["body"] == b"<html><body><p>hello crawl</p></body></html>"
    # warcinfo: no HTTP wrapping -> body is the raw payload
    assert recs[0]["body"] == b"software: hdk-spark\r\n"
    assert recs[0]["http_status"] is None


def test_warc_framing_errors():
    good = warc.build_warc(_sample_records(), gzip_per_record=False)
    with pytest.raises(ValueError, match="magic"):
        warc.parse_warc(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="truncated WARC payload"):
        warc.parse_warc(good[: len(good) - 10])
    with pytest.raises(ValueError, match="gzip"):
        warc.parse_warc(b"\x1f\x8b\x00bogus")


def test_warc_records_explode_and_compose(spark):
    """Two WARC files -> one row per record through the Arrow kernel,
    bodies feed html_extract directly (the crawl ingest pipeline)."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.html import html_extract

    files = []
    for i in range(2):
        recs = _sample_records()
        recs[1]["target_uri"] = f"https://example.com/{i}"
        files.append((i, warc.build_warc(recs)))
    df = spark.createDataFrame(files, "warc_id: long, data: binary")
    out = warc.warc_records(df).collect()
    assert len(out) == 6
    responses = [r for r in out if r["warc_type"] == "response"]
    assert sorted(r["target_uri"] for r in responses) == [
        "https://example.com/0", "https://example.com/1"]
    assert all(r["http_status"] == 200 for r in responses)

    pages = warc.warc_records(df).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    ).select("id", F.col("body").cast("string").alias("html"))
    text = {r["id"]: r["text"]
            for r in html_extract(pages, id_col="id").collect()}
    assert text == {0: "hello crawl", 1: "hello crawl"}
