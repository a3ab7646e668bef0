"""Microbench: canonical_url single-Column form vs the staged
projection chain web._canonical_url_staged ships (r14b, guide §1.3).

The single Column's optimized plan carries every intermediate (trim,
fragment-stripped rest, hostport, tail, the query-param split) once
per consumer INSIDE one canonical_url evaluation — the audited
crawl_pipeline plan showed the param split ×6 and the rest chain ×8 —
and interpreted regex/HOF arguments get no codegen subexpression
elimination. The staged chain materializes each intermediate once per
row behind rand() barriers.

Baseline = the pre-r14b single-Column form (canonical_url, still the
exported helper); candidate = the SHIPPED staged builder
(web._canonical_url_staged, imported). Equality is gated first (edge battery +
200k replicated corpus, null-safe), then interleaved ABBA rounds with
the noop sink.

Run: python scripts/microbench_canonical_staging.py [rounds]
Adopted on: old median 0.507 s vs new 0.425 s (best 0.469 vs 0.343),
7 ABBA rounds, 200k rows — plus the committed plan diffs
(politeness regex ×84→×7, url_canonical_dedup ×20→×6)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import DataFrame, functions as F
from hdk_spark.session import get_spark
from hdk_spark.operators.web import (
    _canonical_url_staged,
    canonical_url,
)

REPLICATE = int(os.environ.get("MB_REPLICATE", "40"))


EDGE = [
    None, "", "   ", "not a url", "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=1&a=2#frag",
    "http://example.com:80/", "http://example.com:8080/x//", "ftp://files.example.org/a",
    "https://www.example.com", "https://example.com/?gclid=1", "https://example.com/?a=1&a=1",
    "https://example.com///", "scheme://h#f", "https://h:443", "https://h:444/p?ref=z&z=9",
]


def main():
    spark = get_spark("mb_canonical")
    sc = spark.sparkContext
    edge = spark.createDataFrame(
        [(i, u) for i, u in enumerate(EDGE)], "doc_id long, url string"
    )
    old_e = edge.select("doc_id", canonical_url(F.col("url")).alias("canonical_url"))
    new_e = _canonical_url_staged(edge, "url", ["doc_id"])
    a = old_e.toPandas().sort_values(["doc_id"]).reset_index(drop=True)
    b = new_e.toPandas().sort_values(["doc_id"]).reset_index(drop=True)
    bad = 0
    for col in a.columns:
        neq = ~((a[col] == b[col]) | (a[col].isna() & b[col].isna()))
        if neq.any():
            bad += int(neq.sum())
            print(a[neq]); print(b[neq])
    print("edges:", "OK" if bad == 0 else f"{bad} MISMATCH")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    urls = (
        docs.select("doc_id")
        .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(REPLICATE)])))
        .repartition(32)
        .select(
            (F.col("doc_id") * 100 + F.col("__r")).alias("doc_id"),
            F.concat(
                F.lit("HTTPS://www.Sub"), (F.col("doc_id") % 97).cast("string"),
                F.lit(".Site"), (F.col("doc_id") % 17).cast("string"),
                F.lit(".com:443/Path/"), (F.col("doc_id") % 85).cast("string"),
                F.lit("/x/?utm_source=x&b="), (F.col("doc_id") % 7).cast("string"),
                F.lit("&a=1#frag"),
            ).alias("url"),
        )
    )
    # full-corpus equality too
    oc = urls.select("doc_id", canonical_url(F.col("url")).alias("c"))
    nc = _canonical_url_staged(urls, "url", ["doc_id"]).withColumnRenamed("canonical_url", "c")
    j = oc.alias("a").join(nc.alias("b"), "doc_id")
    mism = j.filter(~F.col("a.c").eqNullSafe(F.col("b.c"))).count()
    print("corpus mismatches:", mism, "rows:", urls.count())
    if bad or mism:
        sys.exit(1)

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "old": lambda: urls.select("doc_id", canonical_url(F.col("url")).alias("c")),
        "new": lambda: _canonical_url_staged(urls, "url", ["doc_id"]),
    }
    for n, f in variants.items():
        sc.setJobDescription(f"warm {n}")
        run(f())
    res = {n: [] for n in variants}
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for r in range(rounds):
        order = ["old", "new"] if r % 2 == 0 else ["new", "old"]
        for n in order:
            sc.setJobDescription(f"r{r} {n}")
            res[n].append(run(variants[n]()))
    for n, ts in res.items():
        print(f"{n}: best {min(ts):.3f} median {sorted(ts)[len(ts)//2]:.3f} {['%.3f'%x for x in ts]}")
    spark.stop()


main()
