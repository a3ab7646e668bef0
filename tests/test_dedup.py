"""Dedup operator quality tests: the sketch-based operators (minhash
LSH, simhash) are engine-specific (rows-only in the driver contract),
so their quality contract is asserted here instead — recall against the
exact n-gram Jaccard pairs on the same data, plus determinism.
"""

import pytest
from pyspark.sql import functions as F

from hdk_spark.operators import dedup
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def docs(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    return spark.table("documents")


def _pairs(df, cols=("id_a", "id_b")):
    return {(r[cols[0]], r[cols[1]]) for r in df.collect()}


def test_exact_dedup_total_preserved(docs):
    res = dedup.exact_dedup(docs, "text", "doc_id")
    total = res.agg(F.sum("n_dupes")).collect()[0][0]
    assert total == docs.count()
    # keep_ids unique
    assert res.select("keep_id").distinct().count() == res.count()


def test_exact_dedup_digest_equivalent(docs):
    a = dedup.exact_dedup(docs, "text", "doc_id").orderBy("keep_id")
    b = dedup.exact_dedup_digest(docs, "text", "doc_id").orderBy("keep_id")
    assert a.collect() == b.collect()


def test_minhash_recall_against_exact_jaccard(docs):
    """LSH banding at threshold t must recover nearly all pairs whose
    TRUE jaccard is well above t (16 bands x 4 rows: P(candidate) at
    s=0.7 is 1-(1-0.7^4)^16 ~= 0.99)."""
    exact = _pairs(
        dedup.ngram_jaccard_pairs(docs, threshold=0.7)
    )
    got = _pairs(dedup.minhash_lsh_dedup(docs, threshold=0.5))
    if not exact:
        pytest.skip("no high-similarity pairs at this sf")
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} on {len(exact)} true pairs"


def test_minhash_estimates_close_to_true_jaccard(docs):
    est = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in dedup.minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    true = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    common = set(est) & set(true)
    if not common:
        pytest.skip("no overlapping pairs")
    err = [abs(est[p] - true[p]) for p in common]
    assert sum(err) / len(err) < 0.15  # 64-perm estimator standard error


def test_minhash_sql_impl_matches_pandas_impl(docs):
    """The pure-SQL minhash is the executable spec — both impls must
    produce identical signatures (same crc32 base hash + permutations)."""
    small = docs.limit(200)
    a = {r["id"]: list(r["signature"])
         for r in dedup.minhash_signatures(small, impl="pandas").collect()}
    b = {r["id"]: list(r["signature"])
         for r in dedup.minhash_signatures(small, impl="sql").collect()}
    assert a == b


def test_simhash_finds_near_identical_docs(docs, spark):
    """Append a near-identical copy of 5 docs; simhash must pair each
    copy with its source within small hamming distance."""
    base = docs.limit(5)
    copies = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        *[F.col(c) for c in docs.columns if c not in ("doc_id", "text")],
    )
    aug = docs.unionByName(copies)
    pairs = _pairs(dedup.simhash_pairs(aug, max_hamming=6))
    for r in base.collect():
        assert (r["doc_id"], r["doc_id"] + 1_000_000) in pairs


def test_embedding_neardup_lsh_recall(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    emb = spark.table("embeddings")
    exact = _pairs(dedup.embedding_neardup_pairs(emb, threshold=0.9))
    approx = _pairs(dedup.embedding_neardup_pairs(emb, threshold=0.9, use_lsh=True))
    if not exact:
        pytest.skip("no near-dup embeddings at this sf")
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3  # single-table hyperplane LSH loses boundary pairs
    assert approx <= exact  # LSH candidates verified exactly: no false positives
