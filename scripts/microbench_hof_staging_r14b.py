"""Microbench: r14 second-wave HOF staging (dedup shingles, LM
positions, URL features, BM25 score) — guide §1.3/§1.5.

scripts/hof_dup_audit_all.py flagged 34 contract rows whose optimized
plans duplicate an expensive interpreted subtree (tokenizer split,
host split, per-term token walks). Four defect mechanisms, each with a
representative pair here (baseline = the PRE-FIX body, verbatim;
candidate = what the operators now ship):

  1. CollapseProject inlining a multi-consumer array alias
     (shingles: sh + n_sh + explode each re-ran the split chain).
  2. In-lambda references to an inlined tokenizer (trigram positions:
     element_at(toks, i) re-ran the split PER ELEMENT — O(tokens²)).
  3. InferFiltersFromGenerate + predicate pushdown substituting the
     whole chain into a scan Filter (explode → size(chain) > 0).
  4. Explicit filters substituted through deterministic projections
     (bm25: the score > 0 filter carried every per-term token walk).

  1. EQUALITY FIRST: baseline vs shipped, null-safe bit-compare on an
     edge battery + the full sf0.01 corpus (row counts + all columns).
  2. Interleaved ABBA rounds on a replicated sf0.1 corpus, noop sink.

Run: python scripts/microbench_hof_staging_r14b.py [rounds] [--eq-only]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdk_spark.operators.dedup import _shingle_frame, _shingles
from hdk_spark.operators.text import tokenize
from hdk_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("MB_REPLICATE", "40"))


# ---------------------------------------------------------------------------
# baselines: PRE-r14 bodies, verbatim
# ---------------------------------------------------------------------------


def shingle_explode_old(df: DataFrame) -> DataFrame:
    """ngram_jaccard_pairs' pre-fix shingle relation (collapsed
    projection + plain explode), down to the exploded (id, n_sh, s)."""
    sh = df.select(
        F.col("doc_id").alias("id"), _shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    return sh.select("id", "n_sh", F.explode("sh").alias("s"))


def shingle_explode_new(df: DataFrame) -> DataFrame:
    """What ngram_jaccard_pairs now builds from (staged + outer)."""
    sh = _shingle_frame(df, "doc_id", "text", 3)
    return sh.select(
        "id", "n_sh", F.explode_outer("sh").alias("s")
    ).filter(F.col("s").isNotNull())


def tri_positions_old(frame: DataFrame) -> DataFrame:
    """trigram_logprob's pre-fix positions() body, verbatim."""
    toks = tokenize(F.lower(F.col("text")))
    n = F.size(toks)
    trip = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.struct(
                F.when(i >= 3, F.element_at(toks, i - 2)).alias("w1"),
                F.when(i >= 2, F.element_at(toks, i - 1)).alias("w2"),
                F.element_at(toks, i).alias("w3"),
            ),
        ),
    )
    return frame.select(F.col("doc_id"), F.explode(trip).alias("t")).select(
        "doc_id",
        F.col("t.w1").alias("w1"),
        F.col("t.w2").alias("w2"),
        F.col("t.w3").alias("w3"),
    )


def tri_positions_new(frame: DataFrame) -> DataFrame:
    """What trigram_logprob's positions() now ships (staged toks +
    explode_outer), verbatim."""
    staged = frame.select(
        F.col("doc_id"), tokenize(F.lower(F.col("text"))).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    trip = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.struct(
                F.when(i >= 3, F.element_at(toks, i - 2)).alias("w1"),
                F.when(i >= 2, F.element_at(toks, i - 1)).alias("w2"),
                F.element_at(toks, i).alias("w3"),
            ),
        ),
    )
    return (
        staged.select(F.col("doc_id"), F.explode_outer(trip).alias("t"))
        .filter(F.col("t").isNotNull())
        .select(
            "doc_id",
            F.col("t.w1").alias("w1"),
            F.col("t.w2").alias("w2"),
            F.col("t.w3").alias("w3"),
        )
    )


def url_features_old(df: DataFrame, url_col: str = "url") -> DataFrame:
    """web.url_features' pre-fix body, verbatim."""
    from hdk_spark.operators.web import _HOST, _PATH, _SCHEME

    def _reg_domain_old(url):
        host = F.regexp_extract(url, _HOST, 1)
        labels = F.split(host, r"\.")
        return F.when(
            F.size(labels) >= 2,
            F.concat_ws(
                ".", F.element_at(labels, -2), F.element_at(labels, -1)
            ),
        ).otherwise(host)

    url = F.col(url_col)
    host = F.regexp_extract(url, _HOST, 1)
    labels = F.split(host, r"\.")
    nlab = F.size(labels)
    reg_domain = _reg_domain_old(url)
    path = F.regexp_extract(url, _PATH, 2)
    depth = F.size(F.filter(F.split(path, "/"), lambda x: x != ""))
    scheme = F.regexp_extract(url, _SCHEME, 1)
    return df.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        reg_domain.alias("reg_domain"),
        F.when(nlab >= 2, F.element_at(labels, -1)).otherwise(F.lit("")).alias("tld"),
        path.alias("path"),
        depth.cast("long").alias("path_depth"),
        (scheme == "https").alias("is_https"),
    )


def bm25_old(df: DataFrame, query_terms: list, k: int = 10) -> DataFrame:
    """search.bm25_topk's pre-fix body, verbatim."""
    import math

    k1, b = 1.2, 0.75
    query_terms = list(dict.fromkeys(query_terms))
    toks = tokenize(F.lower(F.col("text")))
    staged = df.select(F.col("doc_id").alias("id"), toks.alias("__toks")).withColumn(
        "__dl", F.size("__toks")
    )
    stats = staged.agg(
        F.avg("__dl").alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(
                F.array_contains("__toks", t).cast("bigint")
            ).alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ],
    ).collect()[0]
    avgdl, n_docs = float(stats["avgdl"]), int(stats["n_docs"])
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        df_t = int(stats[f"df_{i}"])
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        tf = F.size(F.filter("__toks", lambda x: x == F.lit(t))).cast("double")
        score = score + F.lit(idf) * (
            tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl)))
        )
    return (
        staged.select("id", F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0.0)
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


EDGE_TEXTS = [
    None, "", " ", "one two", "one two three", "one two three four five",
    "the the the the", "a  b\t c\nd", "x" * 300,
    "spark query data join merge spark query",
    "unicode • tokens — here ok fine yes",
]
EDGE_URLS = [
    None, "", "not a url", "https://a.b.c.example.com/x/y/z?q=1",
    "http://example.com", "ftp://files.example.org/a",
    "https://localhost/p", "HTTPS://UPPER.EXAMPLE.COM/Q",
    "https://example.com///deep//path///",
]


def eq_check(a_df: DataFrame, b_df: DataFrame, label: str) -> int:
    cols = a_df.columns
    a = a_df.toPandas().sort_values(cols).reset_index(drop=True)
    b = b_df.toPandas().sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{label}: row count {len(a)} vs {len(b)}"
    bad = 0
    for col in cols:
        av, bv = a[col], b[col]
        neq = ~((av == bv) | (av.isna() & bv.isna()))
        if neq.any():
            bad += int(neq.sum())
            print(f"  {label}/{col}: {int(neq.sum())} mismatches")
            print(a[neq].head(3))
            print(b[neq].head(3))
    print(f"  {label}: {'OK' if bad == 0 else f'{bad} MISMATCHES'} "
          f"({len(a)} rows)")
    return bad


def main() -> None:
    from hdk_spark.operators.search import bm25_topk
    from hdk_spark.operators.web import url_features

    eq_only = "--eq-only" in sys.argv
    argn = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = int(argn[0]) if argn else 5
    spark = get_spark("microbench_hof_staging_r14b")
    sc = spark.sparkContext

    QT = ["spark", "query", "data", "join", "merge"]
    pairs = {
        "shingles": (shingle_explode_old, shingle_explode_new),
        "tri_positions": (tri_positions_old, tri_positions_new),
        "url_features": (
            lambda d: url_features_old(d, "url"),
            lambda d: url_features(d, "url"),
        ),
        "bm25": (
            lambda d: bm25_old(d, QT),
            lambda d: bm25_topk(d, QT, id_col="doc_id", text_col="text"),
        ),
    }

    bad = 0
    edge_docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    edge_urls = spark.createDataFrame(
        [(i, u) for i, u in enumerate(EDGE_URLS)], "doc_id long, url string"
    )
    d01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    u01 = d01.select(
        "doc_id",
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 17).cast("string"),
            F.lit(".com/p/"), (F.col("doc_id") % 85).cast("string"),
        ).alias("url"),
    )
    for name, (base, shipped) in pairs.items():
        edge = edge_urls if name == "url_features" else edge_docs
        full = u01 if name == "url_features" else d01
        sc.setJobDescription(f"eq {name}")
        bad += eq_check(base(edge), shipped(edge), f"{name}/edges")
        bad += eq_check(base(full), shipped(full), f"{name}/sf0.01")

    if bad:
        print(f"\nEQUALITY FAILED ({bad}) — no timing run.")
        spark.stop()
        sys.exit(1)
    if eq_only:
        spark.stop()
        return

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    corpus = (
        docs.select("doc_id", "text")
        .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(REPLICATE)])))
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select("doc_id", "text")
    )
    urls = corpus.select(
        "doc_id",
        F.concat(
            F.lit("https://sub"), (F.col("doc_id") % 97).cast("string"),
            F.lit(".site"), (F.col("doc_id") % 17).cast("string"),
            F.lit(".com/p/"), (F.col("doc_id") % 85).cast("string"),
            F.lit("/x?q=1"),
        ).alias("url"),
    )

    def run(df: DataFrame) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {}
    for name, (base, shipped) in pairs.items():
        src = urls if name == "url_features" else corpus
        variants[f"{name}_old"] = lambda c=base, s=src: c(s)
        variants[f"{name}_new"] = lambda c=shipped, s=src: c(s)

    for name, fn in variants.items():
        sc.setJobDescription(f"warm {name}")
        run(fn())

    results: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(rounds):
        for fam in pairs:
            order = [f"{fam}_old", f"{fam}_new"]
            if r % 2 == 1:
                order.reverse()
            for name in order:
                sc.setJobDescription(f"r{r} {name}")
                results[name].append(run(variants[name]()))

    print(f"\ncorpus rows: {corpus.count()}, rounds: {rounds} (ABBA)")
    for name, ts in results.items():
        ts_s = ", ".join(f"{x:.3f}" for x in ts)
        print(f"  {name:20s} best {min(ts):.3f}  median "
              f"{sorted(ts)[len(ts)//2]:.3f}  [{ts_s}]")

    spark.stop()


if __name__ == "__main__":
    main()
