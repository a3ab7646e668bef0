"""Sparse keyword retrieval (BM25) over the documents table — the
lexical complement of the dense ANN path in operators/similarity.py.

Scale shape (the reason this is NOT an inverted-index join here):

The query side is a handful of literal terms, so per-document term
frequencies are computed map-only with JVM higher-order functions
(``F.filter`` over the token array) — no explode, no (doc, term)
shuffle, no join. The only non-map work is two scalar statistics:

- ``avgdl`` and per-term document frequencies: ONE tiny aggregate
  (k+1 numbers) collected to the driver and folded into the scoring
  expression as literals — the same bounded-driver-action pattern as
  the IVF coarse quantizer (similarity.py). At 100 TB this aggregate
  is a single partial+final count pipeline, the score pass is pure
  codegen, and the result is TakeOrdered(k).

For ad-hoc multi-query workloads, batch the query set and reuse the
statistics — they depend only on the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from hdk_spark.operators.text import tokenize

__all__ = ["bm25_topk"]


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 score for ``query_terms``
    (case-folded whitespace tokens; idf = ln(1 + (N - df + 0.5)/(df +
    0.5)), the Lucene-style non-negative variant).

    Returns (id, score) with score rounded to 6 digits; ties broken by
    id for a deterministic result set.
    """
    toks = tokenize(F.lower(F.col(text_col)))
    staged = df.select(F.col(id_col).alias("id"), toks.alias("__toks")).withColumn(
        "__dl", F.size("__toks")
    )

    # one bounded aggregate: avgdl + per-term document frequencies
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
