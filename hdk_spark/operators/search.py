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
from pyspark.sql.window import Window

from hdk_spark.operators.text import tokenize

__all__ = ["bm25_topk", "build_text_index", "bm25_batch", "rrf_fuse", "merge_text_index", "retrieval_metrics"]


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

    Duplicate query terms are scored ONCE (first occurrence kept):
    the unified convention with :func:`bm25_batch`, whose exploded
    query side is ``.distinct()`` — pinned by the
    bm25_batch(single query) == bm25_topk property test.
    """
    query_terms = list(dict.fromkeys(query_terms))
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

    # staged (r14): ONE token walk per term, materialized into an
    # array column — the previous form inlined each term's
    # size(filter(__toks, …)) walk twice into the score (numerator +
    # denominator), and the .filter(score > 0) was then pushed below
    # the projection with the WHOLE score expression substituted in,
    # re-running every walk a second time per row at the scan
    # (plan-audited: the full tokenize+filter chain sat in both the
    # scan Filter and the Project).
    tfs = F.array(
        *[
            F.size(F.filter("__toks", lambda x: x == F.lit(t))).cast("double")
            for t in query_terms
        ]
    )
    # the appended rand() element is never read (element_at positions
    # 1..T below) — it exists to make the ALIAS expression
    # non-deterministic, which forbids both CollapseProject and
    # PushDownPredicate from substituting the walk array into
    # consumers (a bare rand() barrier column gets column-pruned and
    # the protection evaporates; comparisons like rand() < -1 get
    # constant-folded by the rand-range rule)
    staged2 = staged.select(
        "id", "__dl", F.array_append(tfs, F.rand()).alias("__tfs")
    )
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        df_t = int(stats[f"df_{i}"])
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        tf = F.element_at("__tfs", i + 1)
        score = score + F.lit(idf) * (
            tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl)))
        )

    return (
        staged2.select("id", F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0.0)
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def build_text_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "tuple[DataFrame, DataFrame]":
    """The persistent inverted index of a fixed corpus — the
    build-once/query-many shape a retrieval (RAG) pipeline runs,
    versus :func:`bm25_topk`'s map-only ad-hoc path: returns
    ``(postings, docs)`` where postings = (term, id, tf) and
    docs = (id, dl). Persist/bucket postings BY TERM and docs by id;
    every subsequent :func:`bm25_batch` call is then joins against
    these relations — the corpus text is never re-tokenized.

    Build cost: one token explode + one (id, term) partial-agg
    groupBy — the standard index-build pass, amortized over every
    query batch that follows."""
    toks = tokenize(F.lower(F.col(text_col)))
    staged = df.select(
        F.col(id_col).alias("id"), toks.alias("__toks")
    ).withColumn("dl", F.size("__toks").cast("long"))
    # explode_outer + isNotNull ≡ explode (tokens are never NULL) and
    # keeps InferFiltersFromGenerate from re-running the tokenizer in
    # a pushed-down scan filter (r14, plan-audited ×3)
    postings = (
        staged.select("id", F.explode_outer("__toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return postings, staged.select("id", "dl")


def bm25_batch(
    postings: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-``k`` for a whole BATCH of queries against a
    :func:`build_text_index` index — fully declarative (no driver
    action: corpus stats are 1-row relations broadcast in-plan,
    unlike bm25_topk's literal-folding) and shuffle-frugal:

    - the query batch explodes to (query_id, term) — query-sized;
    - postings are cut to matching terms by ONE AQE-decided equi-join
      on term (a semi-restriction: only postings of queried terms
      flow into scoring, the inverted-index point);
    - per-term idf comes from a term-df groupBy of that already-cut
      relation; dl attaches by doc id; per-(query, doc) scores sum
      QUANTIZED micro-contributions (round(x·1e9) as int64, summed
      exactly) so the aggregation is order-independent — a double sum
      across a shuffle would not be deterministic;
    - one per-query window emits rank ≤ k (score desc, id asc).

    Returns (query_id, id, score, rank); score = micro-sum / 1e9
    rounded to 6 dp. idf = ln(1 + (N − df + 0.5)/(df + 0.5)), the
    Lucene non-negative variant, matching bm25_topk."""
    from pyspark.sql.window import Window

    qt = queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(terms_col).alias("term"),
    ).distinct()
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("__n_docs"),
        F.avg("dl").alias("__avgdl"),
    )
    hits = postings.join(qt, "term")  # AQE decides; query side is tiny
    dfreq = hits.groupBy("qid", "term").agg(
        F.countDistinct("id").cast("long").alias("__df")
    )
    scored = (
        hits.join(dfreq, ["qid", "term"])
        .join(docs, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf = F.col("tf").cast("double")
    contrib = idf * (
        tf * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b)
                             + F.lit(b) * F.col("dl") / F.col("__avgdl")))
    )
    quant = F.round(contrib * F.lit(1e9)).cast("long")
    agg = (
        scored.select("qid", "id", quant.alias("__q"))
        .groupBy("qid", "id")
        .agg(F.sum("__q").cast("long").alias("__score_q"))
        .filter(F.col("__score_q") > 0)
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("__score_q"), F.asc("id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            "id",
            F.round(F.col("__score_q") / F.lit(1e9), 6).alias("score"),
            "rank",
        )
    )


def rrf_fuse(
    results_a: DataFrame,
    results_b: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings (Cormack et
    al. 2009) — the standard hybrid-retrieval combiner for a lexical
    (:func:`bm25_batch`) and a dense (ANN) result set: per (query,
    doc), score = Σ_sources 1/(k0 + rank), then top-``k`` re-rank.
    RRF needs only RANKS, which is why it fuses heterogeneous scorers
    without calibration.

    Determinism: each source contribution is the exact integer
    ``1_000_000_000 div (k0 + rank)`` and the per-(query, doc) sum is
    an int64 aggregate — order-independent across the shuffle (the
    bm25_batch quantization discipline; summing 1/(k0+r) doubles
    would not be). Emitted rrf_score = micro-sum / 1e9 (round6); ties
    break by id. A document present in only one source contributes
    one term — the standard convention.

    Scale shape: one unionAll (no shuffle) + one partial-agg groupBy
    on (query, id) + one per-query window; result sets are k-sized
    per query, so everything downstream of the sources is
    query-batch-sized, not corpus-sized."""
    from pyspark.sql.window import Window

    def leg(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(query_id_col).alias("__q"),
            F.col(id_col).alias("__i"),
            F.expr(f"1000000000 DIV ({int(k0)} + {rank_col})").alias("__c"),
        )

    agg = (
        leg(results_a).unionAll(leg(results_b))
        .groupBy("__q", "__i")
        .agg(F.sum("__c").cast("long").alias("__s"))
    )
    w = Window.partitionBy("__q").orderBy(F.desc("__s"), F.asc("__i"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__q").alias(query_id_col),
            F.col("__i").alias(id_col),
            F.round(F.col("__s") / F.lit(1e9), 6).alias("rrf_score"),
            "rank",
        )
    )


def merge_text_index(
    postings: DataFrame,
    docs: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "append",
) -> "tuple[DataFrame, DataFrame]":
    """Incremental index update — the daily-ingest path of
    :func:`build_text_index`: tokenize ONLY the new documents, then
    union-merge into the existing relations. Two contracts for a doc
    id present in BOTH the old index and ``new_df``:

    - ``mode='append'`` (default): tf and dl ACCUMULATE per (term,
      id) — "the document grew" semantics. WARNING: this matches a
      from-scratch rebuild only when the id sets are DISJOINT; for a
      re-crawled page it silently doubles the page's length and term
      frequencies. Use 'replace' for re-crawl/upsert ingest.
    - ``mode='replace'``: re-ingested ids' OLD postings and docs rows
      are anti-joined away before the merge, so the new tokenization
      wins outright — property-pinned equal to a from-scratch rebuild
      of (old corpus minus re-ingested ids) ∪ new_df.

    Scale shape: at 100 TB the merge groupBy co-partitions with the
    term-bucketed postings, touching history only at shuffle-read;
    'replace' adds one broadcast-sized anti-join (the new-id relation
    is ingest-batch-sized, never corpus-sized)."""
    if mode not in ("append", "replace"):
        raise ValueError(f"mode must be 'append' or 'replace', got {mode!r}")
    new_postings, new_docs = build_text_index(new_df, id_col, text_col)
    if mode == "replace":
        new_ids = new_docs.select("id").distinct()
        postings = postings.join(F.broadcast(new_ids), "id", "left_anti")
        docs = docs.join(F.broadcast(new_ids), "id", "left_anti")
    merged_postings = (
        postings.unionByName(new_postings)
        .groupBy("term", "id")
        .agg(F.sum("tf").cast("long").alias("tf"))
    )
    merged_docs = (
        docs.unionByName(new_docs)
        .groupBy("id")
        .agg(F.sum("dl").cast("long").alias("dl"))
    )
    return merged_postings, merged_docs


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval-quality metrics of a run against graded
    judgments (the TREC evaluation set): P@k, recall@k, reciprocal
    rank, and nDCG@k — what decides whether a bm25/RRF/ANN change
    actually helped. ``run`` is (query, doc, score); ``qrels`` is
    (query, doc, rel) with rel ≥ 1 meaning relevant (graded rels
    feed DCG with their value).

    Determinism discipline: ranks come from (score DESC, doc) — a
    total order; P@k/recall/RR are exact rationals divided once
    through round6; DCG and ideal-DCG terms rel/log2(rank+1) are
    quantized to int64 micro-units (round(x·1e9), the bm25
    convention) before their per-query sums, so aggregation order
    cannot change the value, and nDCG divides the two micro sums.
    Queries with no judged-relevant docs emit NULL recall/ndcg
    (undefined, not zero); RR is 0.0 when no relevant doc is
    retrieved in the top k.

    Returns (query, n_rel, hits_at_k, p_at_k, recall_at_k, rr,
    ndcg_at_k).

    Scale shape: ONE window on the query key cuts the run to top-k
    (rank ≤ k before anything joins); qrels aggregate per query to
    (n_rel, idcg) — a queries-sized relation that broadcasts; the
    judged join is on (query, doc) against only k rows per query.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, d_ = F.col(query_col), F.col(doc_col)
    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(doc_col)
    )
    topk = (
        run.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select(q.alias("__q"), d_.alias("__d"), "__rank")
    )
    jr = qrels.filter(F.col(rel_col) >= 1).select(
        q.alias("__q"), d_.alias("__d"), F.col(rel_col).alias("__rel")
    )
    # ideal DCG: each query's rels sorted descending fill ranks 1..k
    wi = Window.partitionBy("__q").orderBy(F.desc("__rel"), F.asc("__d"))
    micro = lambda rel, rank: F.round(  # noqa: E731
        rel.cast("double") / F.log2(rank.cast("double") + 1) * 1e9
    ).cast("long")
    ideal = (
        jr.withColumn("__irank", F.row_number().over(wi))
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"),
            F.sum(
                F.when(
                    F.col("__irank") <= k,
                    micro(F.col("__rel"), F.col("__irank")),
                ).otherwise(F.lit(0))
            ).alias("__idcg_u"),
        )
    )
    judged = topk.join(jr, ["__q", "__d"], "left")
    per_q = judged.groupBy("__q").agg(
        F.sum(
            F.when(F.col("__rel").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("hits_at_k"),
        F.min(
            F.when(F.col("__rel").isNotNull(), F.col("__rank"))
        ).alias("__first"),
        F.sum(
            F.when(
                F.col("__rel").isNotNull(),
                micro(F.col("__rel"), F.col("__rank")),
            ).otherwise(F.lit(0))
        ).alias("__dcg_u"),
    )
    from hdk_spark.functions.scalar import round6

    out = per_q.join(F.broadcast(ideal), "__q", "left")
    return out.select(
        F.col("__q").alias(query_col),
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "hits_at_k",
        round6(F.col("hits_at_k") / F.lit(float(k))).alias("p_at_k"),
        round6(
            F.when(
                F.col("n_rel") > 0, F.col("hits_at_k") / F.col("n_rel")
            )
        ).alias("recall_at_k"),
        round6(
            F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0))
        ).alias("rr"),
        round6(
            F.when(
                F.col("__idcg_u") > 0,
                F.col("__dcg_u") / F.col("__idcg_u"),
            )
        ).alias("ndcg_at_k"),
    )
