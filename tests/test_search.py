"""BM25 retrieval: ranking sanity vs a pure-Python reference, plan
shape (map-only scoring, no join/explode)."""

import math

from pyspark.sql import functions as F

from hdk_spark.operators.search import bm25_topk


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            tf = tk.count(t)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl)))
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark):
    docs = [
        (1, "spark shuffle join broadcast join join"),
        (2, "window aggregate sort"),
        (3, "join window"),
        (4, "parquet scan filter pushdown"),
        (5, "join"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {r["id"]: r["score"] for r in bm25_topk(df, ["join", "window"], k=10).collect()}
    assert got == _py_bm25(docs, ["join", "window"])


def test_bm25_plan_has_no_join_or_explode(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    p = bm25_topk(df, ["a"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p and "Generate" not in p  # map-only scoring
    assert "TakeOrderedAndProject" in p


def test_distinctive_terms_planted(spark):
    from hdk_spark.operators.text import distinctive_terms

    docs = spark.createDataFrame(
        [
            (1, "a", "common common schnell schnell schnell"),
            (2, "a", "common schnell"),
            (3, "b", "common common rapide rapide"),
            (4, "b", "common rapide"),
        ],
        "doc_id: long, lang: string, text: string",
    )
    out = distinctive_terms(docs, "lang", "text", "doc_id", k=1).collect()
    top = {r["grp"]: r["token"] for r in out}
    # 'common' is in every doc (idf=0); group-exclusive terms win
    assert top == {"a": "schnell", "b": "rapide"}


def test_bm25_batch_matches_single_query_topk(spark):
    """bm25_batch with a one-query batch agrees with the map-only
    bm25_topk: same ranking, scores within the 1e-9 quantization."""
    from __spark_entry__ import load_tables
    from hdk_spark.operators.search import (
        bm25_batch,
        bm25_topk,
        build_text_index,
    )
    from tests.conftest import SF_CORRECT

    load_tables(spark, SF_CORRECT)
    docs_tbl = spark.table("documents")
    single = bm25_topk(docs_tbl, ["hash", "join", "window"], k=15).collect()
    postings, docs = build_text_index(docs_tbl)
    queries = spark.createDataFrame(
        [(0, ["hash", "join", "window"])], "query_id: long, terms: array<string>"
    )
    batch = bm25_batch(postings, docs, queries, k=15).collect()
    assert [r["id"] for r in batch] == [r["id"] for r in single]
    for b_row, s_row in zip(batch, single):
        assert abs(b_row["score"] - s_row["score"]) <= 1e-6


def test_bm25_batch_deterministic_and_per_query_isolation(spark):
    from hdk_spark.operators.search import bm25_batch, build_text_index

    corpus = spark.createDataFrame(
        [(i, f"alpha beta {'gamma ' * (i % 4)}word{i % 3}") for i in range(60)],
        "doc_id: long, text: string",
    )
    postings, docs = build_text_index(corpus)
    queries = spark.createDataFrame(
        [(1, ["gamma"]), (2, ["word1", "alpha"]), (3, ["absentterm"])],
        "query_id: long, terms: array<string>",
    )
    a = sorted(map(tuple, bm25_batch(postings, docs, queries, k=7).collect()))
    p2, d2 = build_text_index(corpus.repartition(13))
    b = sorted(map(tuple, bm25_batch(
        p2, d2, queries.repartition(2), k=7).collect()))
    assert a == b
    qids = {t[0] for t in a}
    assert qids == {1, 2}  # the absent-term query returns nothing
    for qid in qids:
        ranks = [t[3] for t in a if t[0] == qid]
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_rrf_fuse_hand_computed_and_end_to_end(spark):
    from hdk_spark.operators.search import (
        bm25_batch,
        build_text_index,
        rrf_fuse,
    )

    # hand case: doc 1 ranked 1st by A and 2nd by B beats doc 2
    # ranked 2nd/1st only on the id tie-break (scores equal)
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id: long, id: long, rank: long")
    b = spark.createDataFrame(
        [(0, 2, 1), (0, 1, 2), (0, 3, 3)],
        "query_id: long, id: long, rank: long")
    got = rrf_fuse(a, b, k=3).collect()
    s12 = (1_000_000_000 // 61 + 1_000_000_000 // 62) / 1e9
    assert [(r["id"], r["rank"]) for r in got] == [(1, 1), (2, 2), (3, 3)]
    assert got[0]["rrf_score"] == got[1]["rrf_score"] == round(s12, 6)
    assert got[2]["rrf_score"] == round(1_000_000_000 // 63 / 1e9, 6)

    # end-to-end: fuse two bm25 legs (different term sets) — fusion
    # output stays per-query consistent and deterministic
    corpus = spark.createDataFrame(
        [(i, f"alpha {'beta ' * (i % 3)}gamma{i % 4}") for i in range(40)],
        "doc_id: long, text: string")
    postings, docs = build_text_index(corpus)
    q1 = spark.createDataFrame(
        [(0, ["beta"])], "query_id: long, terms: array<string>")
    q2 = spark.createDataFrame(
        [(0, ["gamma1"])], "query_id: long, terms: array<string>")
    ra = bm25_batch(postings, docs, q1, k=5)
    rb = bm25_batch(postings, docs, q2, k=5)
    fused = rrf_fuse(ra, rb, k=10)
    rows = fused.collect()
    assert rows and len({r["id"] for r in rows}) == len(rows)
    again = sorted(map(tuple, rrf_fuse(ra, rb, k=10).collect()))
    assert again == sorted(map(tuple, rows))


def test_merge_text_index_equals_rebuild(spark):
    from hdk_spark.operators.search import build_text_index, merge_text_index

    old = spark.createDataFrame(
        [(i, f"alpha beta word{i % 3}") for i in range(30)],
        "doc_id: long, text: string")
    new = spark.createDataFrame(
        [(i, f"beta gamma word{i % 2}") for i in range(30, 45)],
        "doc_id: long, text: string")
    p_old, d_old = build_text_index(old)
    p_merged, d_merged = merge_text_index(p_old, d_old, new)
    p_full, d_full = build_text_index(old.unionAll(new))
    assert sorted(map(tuple, p_merged.collect())) == sorted(
        map(tuple, p_full.collect()))
    assert sorted(map(tuple, d_merged.collect())) == sorted(
        map(tuple, d_full.collect()))


def test_bm25_duplicate_query_terms_scored_once(spark):
    """Unified duplicate-term convention (VERDICT r8 #3): a repeated
    query term scores once in BOTH bm25_topk and bm25_batch, so the
    single-query equality property holds with dup terms too."""
    from hdk_spark.operators.search import (
        bm25_batch,
        bm25_topk,
        build_text_index,
    )

    corpus = spark.createDataFrame(
        [(i, f"alpha beta {'gamma ' * (i % 4)}word{i % 3}") for i in range(40)],
        "doc_id: long, text: string",
    )
    dup = ["gamma", "alpha", "gamma", "gamma"]
    uniq = ["gamma", "alpha"]
    single_dup = bm25_topk(corpus, dup, k=8).collect()
    single_uniq = bm25_topk(corpus, uniq, k=8).collect()
    assert [tuple(r) for r in single_dup] == [tuple(r) for r in single_uniq]

    postings, docs = build_text_index(corpus)
    queries = spark.createDataFrame(
        [(0, dup)], "query_id: long, terms: array<string>")
    batch = bm25_batch(postings, docs, queries, k=8).collect()
    assert [r["id"] for r in batch] == [r["id"] for r in single_dup]
    for b_row, s_row in zip(batch, single_dup):
        assert abs(b_row["score"] - s_row["score"]) <= 1e-6


def test_merge_text_index_replace_mode(spark):
    """mode='replace': a re-crawled doc id's new tokenization wins
    outright — merged index equals a from-scratch rebuild of the
    replaced corpus (VERDICT r8 #4 / ADVICE r8). mode='append' on the
    same input accumulates (doc-grew semantics), and an unknown mode
    fails fast."""
    import pytest

    from hdk_spark.operators.search import build_text_index, merge_text_index

    old = spark.createDataFrame(
        [(i, f"alpha beta word{i % 3}") for i in range(20)],
        "doc_id: long, text: string")
    # ids 15-19 re-crawled with NEW text; 20-24 genuinely new
    new = spark.createDataFrame(
        [(i, f"gamma delta word{i % 2}") for i in range(15, 25)],
        "doc_id: long, text: string")
    p_old, d_old = build_text_index(old)

    p_rep, d_rep = merge_text_index(p_old, d_old, new, mode="replace")
    rebuilt_corpus = old.filter("doc_id < 15").unionAll(new)
    p_full, d_full = build_text_index(rebuilt_corpus)
    assert sorted(map(tuple, p_rep.collect())) == sorted(
        map(tuple, p_full.collect()))
    assert sorted(map(tuple, d_rep.collect())) == sorted(
        map(tuple, d_full.collect()))

    # append on the SAME overlap doubles the re-ingested docs' dl
    _, d_app = merge_text_index(p_old, d_old, new, mode="append")
    dl_app = {r["id"]: r["dl"] for r in d_app.collect()}
    dl_rep = {r["id"]: r["dl"] for r in d_rep.collect()}
    for i in range(15, 20):
        assert dl_app[i] == dl_rep[i] + 3  # old "alpha beta wordN" = 3 tokens

    with pytest.raises(ValueError, match="mode"):
        merge_text_index(p_old, d_old, new, mode="upsert")


def test_rrf_fusion_recovers_docs_each_leg_misses(spark):
    """WHY hybrid retrieval exists (VERDICT r8 #7): a planted corpus
    where the lexical leg misses a relevant synonym-worded doc (zero
    query-term overlap) and the dense leg's top-k cut misses a
    relevant keyword-worded doc (orthogonal embedding) — the fused
    ranking surfaces BOTH."""
    from hdk_spark.operators.search import bm25_batch, build_text_index, rrf_fuse
    from hdk_spark.operators.similarity import cosine_topk

    # id 0 is the query's own vector (cosine_topk excludes self).
    # 101: keyword match, orthogonal embedding. 102: synonym wording,
    # near-parallel embedding. 201/202: distractors that crowd each
    # leg's k=2 cut.
    rows = [
        (0, "spark shuffle", [1.0, 0.0, 0.0, 0.0]),
        (101, "spark shuffle tuning guide for spark shuffle",
         [0.0, 1.0, 0.0, 0.0]),
        (102, "distributed engine data exchange tuning guide",
         [0.99, 0.1, 0.0, 0.0]),
        (201, "spark notes", [0.0, 0.0, 1.0, 0.0]),
        (202, "unrelated cooking recipe", [0.95, 0.2, 0.1, 0.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id: long, text: string, embedding: array<double>")

    postings, docs = build_text_index(corpus.select("doc_id", "text"))
    queries = spark.createDataFrame(
        [(0, ["spark", "shuffle"])], "query_id: long, terms: array<string>")
    lex = bm25_batch(postings, docs, queries, k=2)
    lex_ids = {r["id"] for r in lex.collect()}
    assert 102 not in lex_ids  # lexical leg blind to the synonym doc

    dense = cosine_topk(
        corpus.select("doc_id", "embedding"), [0], k=2,
        id_col="doc_id", vec_col="embedding",
    ).select(
        F.col("qid").alias("query_id"),
        F.col("neighbor_id").alias("id"),
        F.col("rank").cast("long").alias("rank"),
    )
    dense_ids = {r["id"] for r in dense.collect()}
    assert 101 not in dense_ids  # dense k=2 cut misses the keyword doc

    fused_ids = {r["id"] for r in rrf_fuse(lex, dense, k=4).collect()}
    assert {101, 102} <= fused_ids


def test_retrieval_metrics_reference(spark):
    """P@k / recall@k / RR / nDCG@k against hand arithmetic: graded
    rels feed DCG, ideal ranking fills ranks 1..k, no-hit queries get
    rr = ndcg = 0, unjudged queries get NULL recall/ndcg, k guard,
    repartition determinism."""
    import math

    import pytest

    from hdk_spark.operators.search import retrieval_metrics

    run = ([("q1", f"d{i}", 10.0 - i) for i in range(5)]
           + [("q2", "d0", 5.0), ("q2", "d9", 4.0)]
           + [("q4", "d5", 1.0)])
    qrels = [("q1", "d1", 2), ("q1", "d3", 1), ("q1", "d7", 3),
             ("q2", "dX", 1), ("q3", "d0", 1)]
    r = spark.createDataFrame(run, "query_id: string, doc_id: string, score: double")
    j = spark.createDataFrame(qrels, "query_id: string, doc_id: string, rel: int")
    got = {x["query_id"]: x for x in retrieval_metrics(r, j, k=3).collect()}

    g1 = got["q1"]
    assert (g1["n_rel"], g1["hits_at_k"]) == (3, 1)
    assert g1["p_at_k"] == round(1 / 3, 6) and g1["rr"] == 0.5
    dcg = 2 / math.log2(3)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert abs(g1["ndcg_at_k"] - round(dcg / idcg, 6)) < 2e-6

    g2 = got["q2"]
    assert g2["hits_at_k"] == 0 and g2["rr"] == 0.0 and g2["ndcg_at_k"] == 0.0
    g4 = got["q4"]  # never judged
    assert g4["n_rel"] == 0 and g4["recall_at_k"] is None
    assert g4["ndcg_at_k"] is None
    assert "q3" not in got  # qrels-only queries are not run rows

    again = {x["query_id"]: x
             for x in retrieval_metrics(r.repartition(5), j, k=3).collect()}
    assert again == got

    with pytest.raises(ValueError, match="k"):
        retrieval_metrics(r, j, k=0)
