"""Crawl-ingest front end on hdk_spark — the round-6 operators composed
the way a CommonCrawl-style job chains them, upstream of
scripts/pipeline_demo.py's curation stages:

  WARC records (gzip members, HTTP splitting) → 200/text filter →
  HTML → text extraction (+ title/link counters, robots noindex gate)
  → robots.txt longest-match gate → canonical-URL dedup →
  per-domain cap → per-domain boilerplate line removal → language ID
  (26-lang hashed trigram) → CCNet perplexity buckets (keep
  head+middle)

Run: python scripts/crawl_demo.py [sf_dir]
Prints one JSON line of per-stage row counts.

The core WARC→robots→HTML→lang-ID→dedup→CCNet chain also ships as the
first-class operator ``hdk_spark.operators.crawl.crawl_curate`` (with
its own driver contract rows ``crawl_pipeline`` /
``crawl_pipeline_stages``); this script demonstrates the WIDER funnel
that adds per-domain caps and boilerplate removal between dedup and
language ID.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from __spark_entry__ import load_tables
    from hdk_spark.operators.html import html_extract
    from hdk_spark.operators.text import ccnet_buckets, lang_id_ngram
    from hdk_spark.operators.warc import warc_records
    from hdk_spark.operators.web import (
        domain_boilerplate_removal,
        domain_cap,
        parse_robots,
        robots_filter,
        url_dedup,
    )
    from hdk_spark.session import ensure_shipped, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("crawl_demo")
    ensure_shipped(spark)
    load_tables(spark, sf_dir)
    stats: dict[str, int] = {}

    # 0. synthesize a WARC file per document (writer is the library's
    # own; in production this column comes straight off object storage)
    docs = spark.table("documents")
    from pyspark.sql import types as T

    import pandas as pd

    def to_warc(batches):
        from hdk_spark.operators.warc import build_warc

        for pdf in batches:
            blobs = []
            for rid, text, lang in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"]
            ):
                body = (
                    "<html><head><title>Doc %d</title>%s</head><body>"
                    "<h1>%s</h1><p>%s</p><p>footer site%d legal</p>"
                    '<a href="/next">next</a></body></html>'
                    % (
                        rid,
                        '<meta name="robots" content="noindex">'
                        if rid % 11 == 0 else "",
                        lang,
                        text,
                        rid % 17,
                    )
                ).encode()
                http = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + body
                )
                blobs.append(build_warc([
                    {"warc_type": "response",
                     "target_uri": "https://site%d.com/p/%d%s" % (
                         rid % 17, rid % 85,
                         "?utm_source=x" if rid % 2 == 0 else "/"),
                     "payload": http,
                     "content_type": "application/http;msgtype=response"},
                ]))
            yield pd.DataFrame({"warc_id": pdf["doc_id"], "data": blobs})

    warcs = docs.mapInPandas(
        to_warc, T.StructType([
            T.StructField("warc_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ])
    )

    # 1. WARC → records → 200 text/html responses
    recs = warc_records(warcs)
    pages = recs.filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    ).select(
        F.col("id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("body").cast("string").alias("html"),
    ).persist()
    stats["warc_pages"] = pages.count()

    # 2. HTML → text + counters; drop robots-noindex pages
    extracted = html_extract(pages, html_col="html").join(
        pages.select("doc_id", "url"), "doc_id"
    )
    indexed = extracted.filter(~F.col("noindex")).persist()
    stats["after_noindex_gate"] = indexed.count()

    # 2b. robots.txt gate (every even-numbered site disallows /p)
    robots = spark.range(17).select(
        F.concat(F.lit("site"), F.col("id").cast("string"),
                 F.lit(".com")).alias("reg_domain"),
        F.when(F.col("id") % 2 == 0,
               F.lit("User-agent: *\nDisallow: /p\n"))
        .otherwise(F.lit("User-agent: *\nDisallow: /private\n"))
        .alias("robots_txt"),
    )
    allowed_ids = robots_filter(indexed, parse_robots(robots)).filter(
        F.col("allowed")).select("doc_id")
    indexed = indexed.join(allowed_ids, "doc_id").persist()
    stats["after_robots_gate"] = indexed.count()

    # 3. canonical-URL dedup (utm/trailing-slash variants collapse)
    verdicts = url_dedup(indexed)
    kept_urls = verdicts.filter(~F.col("is_dup")).select("doc_id")
    deduped = indexed.join(kept_urls, "doc_id").persist()
    stats["after_url_dedup"] = deduped.count()

    # 4. per-domain cap
    capped_ids = domain_cap(deduped, max_per_domain=3).filter(
        F.col("kept")
    ).select("doc_id")
    capped = deduped.join(capped_ids, "doc_id").persist()
    stats["after_domain_cap"] = capped.count()

    # 5. per-domain boilerplate line removal
    bp = domain_boilerplate_removal(capped).persist()
    stats["boilerplate_lines_removed"] = int(
        bp.agg(F.sum("n_removed_lines")).collect()[0][0] or 0)
    clean = bp.select("doc_id", F.col("clean_text").alias("text"))

    # 6. language ID + CCNet buckets; keep head+middle
    langs = lang_id_ngram(clean).select(
        "doc_id", F.col("lang").alias("lang_pred")
    )
    bucketed = ccnet_buckets(
        clean.join(langs, "doc_id"), lang_col="lang_pred"
    )
    final = bucketed.filter(F.col("bucket") != "tail")
    stats["final_head_middle"] = final.count()

    print(json.dumps(stats))


if __name__ == "__main__":
    main()
