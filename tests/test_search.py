"""BM25 retrieval: ranking sanity vs a pure-Python reference, plan
shape (map-only scoring, no join/explode)."""

import math

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
