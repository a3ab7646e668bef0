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


def test_unigram_viterbi_optimal_vs_bruteforce():
    """_viterbi_segment returns the argmax over ALL segmentations
    (score, fewer-pieces, lexicographic tiebreak) — checked by brute
    force on every word up to length 7 over a small alphabet."""
    import itertools
    import math

    from hdk_spark.operators.bpe import _viterbi_segment

    logp = {"a": math.log(0.1), "b": math.log(0.12), "ab": math.log(0.2),
            "ba": math.log(0.18), "aab": math.log(0.15), "bb": math.log(0.09)}
    floor = min(logp.values()) - 10.0

    def brute(word):
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pieces, start = [], 0
            for i, c in enumerate(cuts, 1):
                if c:
                    pieces.append(word[start:i])
                    start = i
            pieces.append(word[start:])
            if any(len(p) > 3 for p in pieces):
                continue
            sc = 0.0
            ok = True
            for p in pieces:
                lp = logp.get(p)
                if lp is None:
                    if len(p) > 1:
                        ok = False
                        break
                    lp = floor
                sc += lp
            if not ok:
                continue
            key = (sc, -len(pieces), tuple(pieces))
            if best is None or key > best:
                best = key
        return list(best[2])

    for n in range(1, 8):
        for word in map("".join, itertools.product("ab", repeat=n)):
            assert _viterbi_segment(word, logp, 3, floor) == brute(word), word


def test_unigram_train_invariants_and_encode(spark):
    """Training: vocab cap respected, all corpus chars covered,
    deterministic; encode: total (OOV chars), reconstructive (concat
    == word), repartition-stable, consistent with driver Viterbi."""
    from hdk_spark.operators.bpe import (
        _viterbi_segment,
        unigram_encode,
        unigram_train,
        unigram_train_from_counts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    v = unigram_train(docs, vocab_size=120, min_count=2)
    assert v == unigram_train(docs.repartition(7), vocab_size=120, min_count=2)
    pieces = {s for s, _ in v}
    assert len([s for s in pieces if len(s) > 1]) <= 120
    enc = unigram_encode(docs, v).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in enc:
        words = (texts[r["id"]] or "").lower().split()
        # reconstruction: pieces concatenate back to the words in order
        assert "".join(r["tokens"]) == "".join(words)
        assert r["n_tokens"] == len(r["tokens"])

    # OOV totality: chars never seen in training fall to the floor path
    import math

    weird = spark.createDataFrame(
        [(0, "données çæ®"), (1, None), (2, "")],
        "doc_id: long, text: string")
    out = {r["id"]: r for r in unigram_encode(weird, v).collect()}
    assert "".join(out[0]["tokens"]) == "donnéesçæ®"
    assert out[1]["tokens"] == [] and out[2]["n_tokens"] == 0

    # pure-count trainer ties are total: identical inputs, identical vocab
    wc = [("abab", 4), ("baba", 4), ("aabb", 2)]
    assert unigram_train_from_counts(wc, 10) == unigram_train_from_counts(
        list(reversed(wc)), 10)


def test_wordpiece_trainer_likelihood_scoring():
    """HF-style WordPiece divergence case: with counts hugs=10 hug=5
    pun=12 pug=4 bun=4, raw pair counts would merge (##u,##g)=19
    first, but the likelihood score count(ab)/(count(a)count(b)) picks
    (##g,##s): 10/(19*10) = 1/19 beats every 1/35 candidate. The
    first learned piece is therefore ##gs."""
    from hdk_spark.operators.bpe import wordpiece_train_from_counts

    v = wordpiece_train_from_counts(
        [("hugs", 10), ("hug", 5), ("pun", 12), ("pug", 4), ("bun", 4)], 3
    )
    alphabet = {"b", "h", "p", "##u", "##g", "##n", "##s"}
    learned = [p for p in v if p not in alphabet]
    assert learned[0] == "##gs"
    # empty corpus / zero merges are total
    assert wordpiece_train_from_counts([], 5) == []
    assert set(wordpiece_train_from_counts([("ab", 1)], 0)) == {"a", "##b"}


def test_wordpiece_encode_invariants(spark):
    """Greedy longest-match: full-coverage words reconstruct exactly
    (strip '##', join); any un-coverable position collapses the WHOLE
    word to [UNK] (even after a matched prefix); words over
    max_word_len are [UNK]; NULL/empty text is total; deterministic
    under repartition."""
    import pytest

    from hdk_spark.operators.bpe import wordpiece_encode

    vocab = ["un", "run", "##n", "##ing", "##ed", "jump", "walk",
             "##s", "over", "##able", "a", "##b"]
    rows = [
        (0, "running jumps walked"),
        (1, "unable walking RUN"),   # lowercased before matching
        (2, "zebra overrun ab"),     # overrun: 'over' matches, then UNK
        (3, None),
        (4, ""),
        (5, "a" * 120),              # > max_word_len
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["id"]: list(r["tokens"])
           for r in wordpiece_encode(df, vocab).collect()}
    assert got[0] == ["run", "##n", "##ing", "jump", "##s", "walk", "##ed"]
    assert got[1] == ["un", "##able", "walk", "##ing", "run"]
    assert got[2] == ["[UNK]", "[UNK]", "a", "##b"]
    assert got[3] == [] and got[4] == []
    assert got[5] == ["[UNK]"]

    # reconstruction for covered words
    for tok_list, text in [(got[0], rows[0][1]), (got[1], rows[1][1])]:
        joined = "".join(t[2:] if t.startswith("##") else " " + t
                         for t in tok_list).strip()
        assert joined == text.lower()

    again = {r["id"]: list(r["tokens"])
             for r in wordpiece_encode(df.repartition(3), vocab).collect()}
    assert again == got

    with pytest.raises(ValueError, match="vocab"):
        wordpiece_encode(df, [])


def test_wordpiece_train_distributed_matches_counts(spark):
    """wordpiece_train == wordpiece_train_from_counts on the exact
    word-frequency table (the distributed pass adds nothing but the
    count aggregation)."""
    from collections import Counter

    from hdk_spark.operators.bpe import (
        wordpiece_train,
        wordpiece_train_from_counts,
    )

    texts = ["the cat sat", "the cat ran", "a cat ran far", "the end"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    wc = Counter(w for t in texts for w in t.split())
    expect = wordpiece_train_from_counts(
        sorted((w, c) for w, c in wc.items() if c >= 2), 10
    )
    got = wordpiece_train(df, n_merges=10, min_count=2)
    assert got == expect
