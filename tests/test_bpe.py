"""BPE trainer/encoder tests: the distributed word-count path must
train the identical merge table as a pure-Python reference over the
same corpus, and encoding must satisfy the reconstruction invariant
(concatenating a word's subword tokens reproduces the word + EOW)."""

import pytest
from pyspark.sql import functions as F

from hdk_spark.operators import bpe
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_SMOKE)
    return spark.table("documents")


def _py_word_counts(texts, min_count):
    counts = {}
    for t in texts:
        for w in (t or "").lower().split():
            counts[w] = counts.get(w, 0) + 1
    return [(w, c) for w, c in counts.items() if c >= min_count]


def test_train_matches_pure_python_reference(spark, docs):
    texts = [r["text"] for r in docs.collect()]
    ref = bpe.bpe_train_from_counts(_py_word_counts(texts, 2), n_merges=50)
    got = bpe.bpe_train(docs, n_merges=50, min_count=2)
    assert got == ref  # identical ordered merge list, ties included


def test_train_deterministic_under_repartition(spark, docs):
    a = bpe.bpe_train(docs.repartition(7), n_merges=30)
    b = bpe.bpe_train(docs.repartition(13), n_merges=30)
    assert a == b


def test_merges_compress_frequent_pairs():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.bpe_train_from_counts(counts, n_merges=10)
    # 'est</w>' family dominates the pair mass (9 occurrences)
    assert merges[0] == ("e", "s")
    joined = {a + b for a, b in merges}
    assert "est" in joined or ("es", "t") in merges


def test_encode_reconstruction_invariant(spark, docs):
    merges = bpe.bpe_train(docs, n_merges=80)
    enc = bpe.bpe_encode(docs.limit(50), merges)
    rows = enc.collect()
    originals = {
        r["doc_id"]: (r["text"] or "").lower().split()
        for r in docs.limit(50).collect()
    }
    for r in rows:
        words = originals[r["id"]]
        assert r["n_tokens"] == len(r["tokens"])
        # re-split the token stream at EOW boundaries → original words
        rebuilt, cur = [], ""
        for t in r["tokens"]:
            cur += t
            if cur.endswith(bpe._EOW):
                rebuilt.append(cur[: -len(bpe._EOW)])
                cur = ""
        assert cur == ""  # every word ends with exactly one EOW
        assert rebuilt == words
    # trained merges actually compress: fewer tokens than characters
    total_tokens = sum(r["n_tokens"] for r in rows)
    total_chars = sum(len(w) + 1 for ws in originals.values() for w in ws)
    assert 0 < total_tokens < total_chars


def test_encode_feeds_sequence_packing(spark, docs):
    """BPE token counts plug into pack_sequences — the tokenize →
    pack composition of a training pipeline."""
    from hdk_spark.operators.packing import pack_sequences

    merges = bpe.bpe_train(docs, n_merges=40)
    enc = bpe.bpe_encode(docs.limit(100), merges).select(
        F.col("id").alias("doc_id"), "n_tokens"
    )
    packed = pack_sequences(enc, "doc_id", "n_tokens", budget=512)
    rows = packed.collect()
    assert len(rows) == 100
    # every pack respects the budget for docs that fit alone
    import collections

    # greedy first-fit may overflow a chunk by at most one document
    per_pack = collections.defaultdict(list)
    for r in rows:
        per_pack[(r["shard"], r["chunk_id"])].append(r["n_tokens"])
    assert all(
        sum(v) <= 512 or sum(v) - max(v) < 512 for v in per_pack.values()
    )
