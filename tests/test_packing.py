

def test_pack_split_exact_fill_and_reconstruction(spark):
    """Splitting contract: every chunk except each shard's last holds
    exactly `budget` tokens; per-doc pieces reconstruct the document
    (contiguous offsets summing to the doc's tokens); the first piece
    agrees with pack_sequences' assignment."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.packing import pack_sequences, pack_sequences_split

    docs = spark.createDataFrame(
        [(i, 3 + (i * 7) % 40) for i in range(300)] + [(999, 0)],
        "doc_id: long, n_tokens: long",
    )
    out = pack_sequences_split(
        docs, "doc_id", "n_tokens", budget=32, n_shards=4, seed=0
    ).collect()

    # per-chunk fill
    fill = {}
    for r in out:
        fill[(r["shard"], r["chunk_id"])] = (
            fill.get((r["shard"], r["chunk_id"]), 0) + r["n_tokens"]
        )
    last = {}
    for (s, c) in fill:
        last[s] = max(last.get(s, -1), c)
    for (s, c), tot in fill.items():
        if c != last[s]:
            assert tot == 32, (s, c, tot)
        else:
            assert 0 < tot <= 32

    # per-doc reconstruction
    toks = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(toks)
    for did, pieces in by_doc.items():
        pieces.sort(key=lambda r: r["piece_index"])
        assert [p["piece_index"] for p in pieces] == list(range(len(pieces)))
        assert sum(p["n_tokens"] for p in pieces) == toks[did]
        off = 0
        for p in pieces:
            assert p["offset"] == off
            off += p["n_tokens"]
        # pieces are consecutive chunks
        cks = [p["chunk_id"] for p in pieces]
        assert cks == list(range(cks[0], cks[0] + len(cks)))

    # first-piece parity with the never-split packer
    whole = {r["doc_id"]: (r["shard"], r["chunk_id"])
             for r in pack_sequences(
                 docs, "doc_id", "n_tokens", budget=32, n_shards=4, seed=0
             ).collect()}
    for did, pieces in by_doc.items():
        p0 = min(pieces, key=lambda r: r["piece_index"])
        assert (p0["shard"], p0["chunk_id"]) == whole[did]

    # zero-token doc: one empty piece
    z = by_doc[999]
    assert len(z) == 1 and z[0]["n_tokens"] == 0

    # determinism under repartition
    again = pack_sequences_split(
        docs.repartition(11), "doc_id", "n_tokens", budget=32,
        n_shards=4, seed=0,
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    import pytest

    with pytest.raises(ValueError, match="budget"):
        pack_sequences_split(docs, "doc_id", "n_tokens", budget=0)


def test_materialize_chunks_reconstructs_shard_streams(spark):
    """Chunk materialization: per shard, concatenating chunk token
    sequences in chunk order reproduces EXACTLY the concatenation of
    its documents' tokens in pack order; every non-final chunk holds
    exactly `budget` tokens; n_docs matches contributing docs;
    repartition-stable."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.packing import materialize_chunks
    from hdk_spark.operators.sampling import hash_bucket

    docs = spark.createDataFrame(
        [(i, [f"t{i}_{j}" for j in range((i * 13) % 29 + 1)])
         for i in range(120)],
        "doc_id: long, tokens: array<string>",
    )
    out = materialize_chunks(
        docs, "doc_id", "tokens", budget=24, n_shards=3, seed=0
    ).collect()

    # fill invariant
    last = {}
    for r in out:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["chunk_id"])
    for r in out:
        if r["chunk_id"] != last[r["shard"]]:
            assert r["n_tokens"] == 24, (r["shard"], r["chunk_id"])
        assert r["n_tokens"] == len(r["tokens"])

    # stream reconstruction per shard
    assign = docs.select(
        "doc_id", "tokens",
        hash_bucket(F.col("doc_id"), 3, 1).alias("shard"),
        hash_bucket(F.col("doc_id"), 1_000_000_007, 0).alias("h"),
    ).collect()
    streams = {}
    for r in sorted(assign, key=lambda r: (r["shard"], r["h"], r["doc_id"])):
        streams.setdefault(r["shard"], []).extend(r["tokens"])
    got = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["chunk_id"])):
        got.setdefault(r["shard"], []).extend(r["tokens"])
    assert got == streams

    # n_docs: count docs whose [start, end) interval meets the chunk
    again = materialize_chunks(
        docs.repartition(11), "doc_id", "tokens", budget=24, n_shards=3,
        seed=0,
    ).collect()
    assert sorted((r["shard"], r["chunk_id"], tuple(r["tokens"]), r["n_docs"])
                  for r in again) == sorted(
        (r["shard"], r["chunk_id"], tuple(r["tokens"]), r["n_docs"])
        for r in out)


def test_pack_stats_invariants(spark):
    """pack_stats vs hand-computed chunk accounting: volumes conserve
    (Σn_docs == input rows, Σn_tokens == Σ input tokens), greedy
    no-split packing overflows by at most one doc per chunk (every
    overflow chunk has >= 2 docs and max overflow < budget + max doc),
    split mode reports zero overflow and fill_ratio 1.0 on full
    chunks; budget guard."""
    import pytest
    from pyspark.sql import functions as F

    from hdk_spark.operators.packing import (
        pack_sequences,
        pack_sequences_split,
        pack_stats,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 3).alias("n_tokens"),
    )
    budget = 128
    packed = pack_sequences(df, "doc_id", "n_tokens",
                            budget=budget, n_shards=4)
    stats = pack_stats(packed, budget).collect()
    assert sorted(r["shard"] for r in stats) == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in stats) == 500
    total_tokens = df.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r["n_tokens"] for r in stats) == total_tokens
    max_doc = df.agg(F.max("n_tokens")).collect()[0][0]
    chunk_tokens = {
        (r["shard"], r["chunk_id"]): r["cnt"]
        for r in packed.groupBy("shard", "chunk_id")
        .agg(F.sum("n_tokens").alias("cnt")).collect()
    }
    for r in stats:
        assert r["max_chunk_tokens"] == max(
            v for (s, _), v in chunk_tokens.items() if s == r["shard"])
        assert r["max_chunk_tokens"] < budget + max_doc
        assert 0 < r["fill_ratio"] < 1.5
        exp_overflow = sum(
            1 for (s, _), v in chunk_tokens.items()
            if s == r["shard"] and v > budget)
        assert r["overflow_chunks"] == exp_overflow

    # split mode: every chunk except a shard's last is EXACTLY full
    split = pack_sequences_split(df, "doc_id", "n_tokens",
                                 budget=budget, n_shards=4)
    cols = split.columns
    tok = "piece_tokens" if "piece_tokens" in cols else "n_tokens"
    sstats = pack_stats(split, budget, tokens_col=tok).collect()
    assert all(r["overflow_chunks"] == 0 for r in sstats)
    assert sum(r["n_tokens"] for r in sstats) == total_tokens
    for r in sstats:
        # all chunks full except possibly the final partial one
        assert r["n_tokens"] >= (r["n_chunks"] - 1) * budget

    with pytest.raises(ValueError, match="budget"):
        pack_stats(packed, 0)
