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


def test_embedding_neardup_lsh_recall_on_planted_dups(spark):
    """Plant near-identical copies (tiny multiplicative perturbation →
    cosine ≈ 0.999) and require the default LSH path to recover ≥90% of
    the pairs the exact path finds, with precision 1 (every LSH pair is
    exactly rescored, so lsh ⊆ exact)."""
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    emb = spark.table("embeddings")
    copies = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (1.0 + 0.05 * F.sin(F.col("vec_id") * 31 + i)),
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(copies)
    exact = _pairs(
        dedup.embedding_neardup_pairs(aug, threshold=0.95, mode="exact")
    )
    planted = {p for p in exact if p[1] == p[0] + 1_000_000}
    assert len(planted) >= emb.count() * 0.9  # the perturbation is small
    lsh = _pairs(dedup.embedding_neardup_pairs(aug, threshold=0.95, dim=64))
    assert lsh <= exact  # exact rescore: no false positives
    recall = len(planted & lsh) / len(planted)
    assert recall >= 0.9, f"LSH recall {recall:.2f} on {len(planted)} planted pairs"


def test_embedding_neardup_lsh_plan_has_no_cartesian(spark):
    """The default (LSH) path must plan as equi-joins only — the whole
    point of the banded bucket join is that no cross join ever appears,
    at any scale."""
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    emb = spark.table("embeddings")
    plan = dedup.embedding_neardup_pairs(
        emb, threshold=0.4, dim=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_hot_shingle_cap_bounds_candidates(spark):
    """A stop-shingle shared by k docs contributes k²/2 candidate rows
    unless capped. With max_doc_freq below k the hot contribution is
    dropped (output empty — the docs share ONLY the hot shingle);
    uncapped, the same corpus pairs quadratically."""
    k = 60
    rows = [(i, f"common stop shingle u{i}a u{i}b u{i}c") for i in range(k)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.0, max_doc_freq=None
    ).count()
    assert uncapped == k * (k - 1) // 2  # quadratic blowup from one shingle
    capped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.0, max_doc_freq=k - 1
    ).count()
    assert capped == 0


def test_ngram_cap_no_effect_below_threshold(docs):
    """On the driver corpus the default cap (1000) never binds (max
    shingle DF is ~7 at sf0.01), so capped and exact results agree —
    this is why the unfiltered SQL oracle stays exact."""
    a = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=1000))
    b = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=None))
    assert a == b


def test_contamination_flags_planted(spark):
    from hdk_spark.operators.dedup import contamination_flags

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox appears"),          # shares 'quick brown fox'
            (3, "completely unrelated content here"),
            (4, "THE QUICK BROWN fox"),                 # case-folded hit
        ],
        "doc_id: long, text: string",
    )
    bench = ["benchmark asks about the quick brown fox today"]
    out = {
        r["id"]: (r["n_overlap"], r["contaminated"])
        for r in contamination_flags(docs, bench, n=3).collect()
    }
    assert out[1][1] and out[2][1] and out[4][1]
    assert out[3] == (0, False)
    assert out[1][0] >= 2  # 'the quick brown' + 'quick brown fox'


def test_contamination_map_only_plan(spark):
    from hdk_spark.operators.dedup import contamination_flags

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    p = contamination_flags(df, ["a b c"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p  # literal-broadcast, map-only


def test_contamination_bloom_superset_of_exact(spark, docs):
    """The Bloom variant must flag EVERY doc the exact variant flags
    (no false negatives — the decontamination safety property), with
    few extra false positives at the default filter size."""
    from hdk_spark.operators.dedup import (
        contamination_flags,
        contamination_flags_bloom,
    )

    # eval set = 5 real corpus docs → those docs are contaminated by
    # construction
    eval_rows = docs.limit(5).collect()
    eval_df = spark.createDataFrame(
        [(r["text"],) for r in eval_rows], "text: string"
    )
    exact = {
        r["id"]
        for r in contamination_flags(
            docs, [r["text"] for r in eval_rows], n=8
        ).collect()
        if r["contaminated"]
    }
    bloom_rows = contamination_flags_bloom(docs, eval_df, n=8).collect()
    bloom = {r["id"] for r in bloom_rows if r["contaminated"]}
    assert exact <= bloom  # no false negatives
    assert {r["doc_id"] for r in eval_rows} <= bloom  # planted docs hit
    n_docs = docs.count()
    fp = len(bloom - exact)
    assert fp <= max(2, n_docs // 50), f"{fp} false positives of {n_docs}"
    # per-shingle hit counts dominate the exact overlap counts
    exact_counts = {
        r["id"]: r["n_overlap"]
        for r in contamination_flags(
            docs, [r["text"] for r in eval_rows], n=8
        ).collect()
    }
    for r in bloom_rows:
        assert r["n_hit_shingles"] >= exact_counts[r["id"]]


def test_contamination_bloom_probe_map_only(spark):
    from hdk_spark.operators.dedup import contamination_flags_bloom

    df = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id: long, text: string")
    ev = spark.createDataFrame([("a b c d e f g h i",)], "text: string")
    # pandas probe (default): pure projection — no join, no shuffle
    out = contamination_flags_bloom(df, ev, n=8)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in p and "Join" not in p
    assert out.collect()[0]["contaminated"]
    # sql probe: projection plus ONE broadcast of the 1-row bitset
    # relation — never a shuffle of the corpus
    out = contamination_flags_bloom(df, ev, n=8, impl="sql")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "BroadcastNestedLoopJoin" in p  # 1-row bitset rides broadcast
    assert out.collect()[0]["contaminated"]


def test_contamination_bloom_impls_identical(spark, docs):
    from hdk_spark.operators.dedup import contamination_flags_bloom

    ev = spark.createDataFrame(
        [(r["text"],) for r in docs.limit(3).collect()], "text: string"
    )
    a = {
        r["id"]: (r["n_hit_shingles"], r["contaminated"])
        for r in contamination_flags_bloom(docs, ev, impl="pandas").collect()
    }
    b = {
        r["id"]: (r["n_hit_shingles"], r["contaminated"])
        for r in contamination_flags_bloom(docs, ev, impl="sql").collect()
    }
    assert a == b  # crc32 double hashing agrees across JVM and Python


def test_contamination_bloom_bit63_word_negative_long(spark):
    """Regression (VERDICT r6 #2): a bitset word with bit 63 set comes
    back from the JVM as a NEGATIVE signed long; the probe must view it
    as uint64 bit-exactly instead of casting (numpy >= 2.1 raises
    OverflowError on negative->uint64). 'w19' was searched so its crc32
    Kirsch-Mitzenmacher position hits 63 mod 64 with m_bits=64."""
    import warnings
    import zlib

    from hdk_spark.operators.dedup import contamination_flags_bloom

    b = b"w19"
    h1, h2 = zlib.crc32(b), zlib.crc32(b"\x01" + b)
    assert any((h1 + i * h2) % 64 == 63 for i in range(4))  # pin the plant
    df = spark.createDataFrame(
        [(1, "w19"), (2, "clean")], "doc_id: long, text: string"
    )
    ev = spark.createDataFrame([("w19",)], "text: string")
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        rows = {
            r["id"]: r["contaminated"]
            for r in contamination_flags_bloom(
                df, ev, n=1, m_bits=64, k_hashes=4, impl="pandas"
            ).collect()
        }
    assert rows[1] is True


def test_bloom_probe_tokenization_matches_jvm_on_unicode_ws(spark):
    """Regression (ADVICE r6): the Python probe must tokenize exactly
    like the JVM build side. NBSP / U+2028 are NOT Java \\s whitespace,
    and leading tabs produce a leading EMPTY token under Spark's
    split(trim(lower(x)), '\\s+') — plain str.split() diverges on both,
    silently breaking the no-false-negatives guarantee."""
    from hdk_spark.operators.dedup import (
        _py_jvm_tokens,
        contamination_flags_bloom,
        eval_contaminated_spans,
        eval_contaminated_spans_bloom,
    )

    nasty = [
        "alpha\u00a0beta gamma delta epsilon",   # NBSP inside a "word"
        "one two\u2028three four five",          # line separator
        "\tlead tab makes empty token here",     # leading empty token
        "plain ascii text with five tokens",
    ]
    # 1. the Python twin agrees with Spark's own tokenization
    df = spark.createDataFrame([(t,) for t in nasty], "text: string")
    jvm = [
        r["toks"]
        for r in df.select(
            F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
        ).collect()
    ]
    assert jvm == [_py_jvm_tokens(t) for t in nasty]

    # 2. doc-level: pandas probe == sql probe on the nasty corpus
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(nasty)], "doc_id: long, text: string"
    )
    ev = spark.createDataFrame([(nasty[0],), (nasty[2],)], "text: string")
    a = {r["id"]: (r["n_hit_shingles"], r["contaminated"])
         for r in contamination_flags_bloom(docs, ev, n=2, impl="pandas").collect()}
    b = {r["id"]: (r["n_hit_shingles"], r["contaminated"])
         for r in contamination_flags_bloom(docs, ev, n=2, impl="sql").collect()}
    assert a == b

    # 3. span-level: Bloom spans still cover exact spans (positions
    # would shift under divergent tokenization)
    exact = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in eval_contaminated_spans(docs, ev, eval_id_col="text",
                                              n=3).collect()}
    bloom = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in eval_contaminated_spans_bloom(docs, ev, eval_id_col="text",
                                                    n=3).collect()}
    for (i, s, e) in exact:
        assert any(i == bi and bs <= s and e <= be for bi, bs, be in bloom), (
            exact, bloom)


def test_py_lower_matches_jvm_lower_for_assigned(spark):
    """Bound the residual casing risk in _py_jvm_tokens (ADVICE r7):
    str.lower() vs F.lower() may diverge only on codepoints CPython's
    bundled Unicode tables don't know yet (category Cn = unassigned) —
    i.e. characters newer than CPython's Unicode version, which cannot
    appear in any corpus CPython can classify. Sweeps U+0020..U+2FFFF
    (all letters live below this: BMP + SMP scripts); any divergence on
    an ASSIGNED codepoint fails, which is the property the bit-exact
    probe/build parity relies on."""
    import unicodedata

    cps = [c for c in range(0x20, 0x30000) if not (0xD800 <= c <= 0xDFFF)]
    df = spark.createDataFrame(
        [(c, chr(c)) for c in cps], "cp: long, s: string"
    )
    rows = df.select("cp", "s", F.lower("s").alias("jl")).collect()
    bad = [
        (r["cp"], unicodedata.category(r["s"]))
        for r in rows
        if r["jl"] != r["s"].lower()
        and unicodedata.category(r["s"]) != "Cn"
    ]
    assert bad == [], f"assigned codepoints with divergent lower(): {bad[:10]}"


def test_incremental_dedup_matches_full_run_cross_pairs(spark):
    from hdk_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_lsh_dedup,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    corpus = docs.filter("doc_id >= 50")
    new = docs.filter("doc_id < 50")

    inc = {
        (min(r["new_id"], r["corpus_id"]), max(r["new_id"], r["corpus_id"])): r["jaccard_est"]
        for r in minhash_dedup_incremental(
            new, minhash_signatures(corpus), threshold=0.5
        ).collect()
    }
    # the full-corpus run restricted to (new, corpus) cross pairs must
    # agree exactly: same signatures -> same bands -> same candidates/est
    full = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in minhash_lsh_dedup(docs, threshold=0.5).collect()
        if (r["id_a"] < 50) != (r["id_b"] < 50)
    }
    assert inc == full and len(inc) > 0


def test_incremental_dedup_broadcasts_new_side(spark):
    from hdk_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        minhash_dedup_incremental(
            docs.filter("doc_id < 10"), minhash_signatures(docs.filter("doc_id >= 10"))
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_dedup_keep_best_semantics(spark):
    from hdk_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 200), (4, 50), (5, 300)],
        "doc_id long, n_chars long",
    )
    # clusters: {1,2,3} (chain), {4} singleton, {5} singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    rows = {
        r["cluster_id"]: (r["keep_id"], r["best_score"], r["n_members"])
        for r in dedup_keep_best(docs, pairs, "doc_id", "n_chars").collect()
    }
    # cluster 1: doc 2 wins on n_chars=300; singletons keep themselves
    assert rows == {1: (2, 300, 3), 4: (4, 50, 1), 5: (5, 300, 1)}


def test_segment_dedup_lines_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "intro line\nCOMMON BOILERPLATE\nunique a"),
            (2, "common boilerplate\nunique b\n\nunique c"),
            (3, "Common Boilerplate"),
            (4, ""),
            (5, "unique d"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(df, max_freq=1).collect()
    }
    # the 3x boilerplate line is removed everywhere, case-insensitively
    assert rows[1]["clean_text"] == "intro line\nunique a"
    assert rows[2]["clean_text"] == "unique b\nunique c"
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 1
    # empty document survives with zero segments
    assert rows[4]["n_segments"] == 0 and rows[4]["n_removed"] == 0
    assert rows[5]["clean_text"] == "unique d" and rows[5]["n_removed"] == 0
    # counts are consistent: removed <= total per doc
    assert all(r["n_removed"] <= r["n_segments"] for r in rows.values())


def test_segment_dedup_words_reassembles_unique_corpus(spark):
    # every segment unique => reassembly is the identity (modulo
    # whitespace normalization)
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(
            df, mode="words", words_per_segment=3, max_freq=1
        ).collect()
    }
    assert rows[1]["clean_text"] == "a b c d e f g"
    assert rows[1]["n_segments"] == 3  # abc|def|g
    assert rows[2]["clean_text"] == "h i j k"
    assert rows[2]["n_segments"] == 2


def test_segment_dedup_no_forced_broadcast(spark, docs):
    # the frequency relation is corpus-derived and unbounded: the plan
    # must not pin a broadcast on it (AQE decides; the unigram-LM
    # lesson from round 3)
    plan = dedup.segment_dedup(
        docs, mode="words", words_per_segment=3, max_freq=2
    )._jdf.queryExecution().toString()
    assert "ResolvedHint" not in plan


def test_segment_dedup_words_matches_python_reference(spark):
    """Property check vs a pure-Python reference over randomized small
    corpora (slicing, whitespace runs, case folding, max_freq edges)."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings, strategies as st

    word = st.sampled_from(["a", "b", "Cc", "dd", "e"])
    doc = st.lists(word, min_size=0, max_size=13).map(" ".join)

    @given(
        texts=st.lists(doc, min_size=1, max_size=8),
        wps=st.sampled_from([1, 2, 3]),
        max_freq=st.sampled_from([1, 2]),
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow,
                               HealthCheck.function_scoped_fixture],
    )
    def check(texts, wps, max_freq):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id: long, text: string"
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_removed"])
            for r in dedup.segment_dedup(
                df, mode="words", words_per_segment=wps, max_freq=max_freq
            ).collect()
        }
        # reference
        seg_lists = []
        for t in texts:
            toks = t.split()
            seg_lists.append(
                [" ".join(toks[i: i + wps]) for i in range(0, len(toks), wps)]
            )
        freq = Counter(s.lower() for segs in seg_lists for s in segs)
        for i, segs in enumerate(seg_lists):
            kept = [s for s in segs if freq[s.lower()] <= max_freq]
            expect = (
                " ".join(kept),
                len(segs),
                sum(1 for s in segs if freq[s.lower()] > max_freq),
            )
            assert got[i] == expect, (i, texts, wps, max_freq)

    check()


# ---------------------------------------------------------------------------
# exact repeated-substring spans (Lee et al. exact-substring dedup)
# ---------------------------------------------------------------------------


def _span_docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta THE QUOTE IS exactly here my "
                "friend and more words follow after that"),
            (2, "totally different opening text the quote is exactly "
                "here my friend closing words differ now"),
            (3, "no shared content in this document at all whatsoever "
                "truly unique tokens only here"),
            (4, "x y the quote is exactly here my friend x y the quote "
                "is exactly here my friend"),
        ],
        "doc_id: long, text: string",
    )


def test_duplicate_spans_cross_doc_and_internal(spark):
    from hdk_spark.operators.dedup import duplicate_spans

    rows = {
        (r["doc_id"], r["span_start"]): r
        for r in duplicate_spans(
            _span_docs(spark), n=5, min_count=2, basis="text"
        ).collect()
    }
    # the shared 7-token quote sits at tokens 4..10 in docs 1 and 2:
    # 3 five-token windows (4, 5, 6) merge into one maximal span
    assert rows[(1, 4)]["span_end"] == 10 and rows[(1, 4)]["n_windows"] == 3
    assert rows[(2, 4)]["span_end"] == 10
    # doc 4 repeats its whole first half: every window duplicated
    assert rows[(4, 0)]["span_end"] == 17 and rows[(4, 0)]["n_windows"] == 10
    # doc 3 shares nothing — no rows
    assert not any(d == 3 for d, _ in rows)


def test_duplicate_spans_hash_basis_matches_text(spark):
    from hdk_spark.operators.dedup import duplicate_spans

    df = _span_docs(spark)
    a = sorted(map(tuple, duplicate_spans(
        df, n=5, min_count=2, basis="text").collect()))
    b = sorted(map(tuple, duplicate_spans(
        df, n=5, min_count=2, basis="xxhash64").collect()))
    assert a == b


def test_remove_duplicate_spans_rewrite(spark):
    from hdk_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    df = _span_docs(spark)
    spans = duplicate_spans(df, n=5, min_count=2, basis="text")
    got = {r["doc_id"]: r for r in remove_duplicate_spans(df, spans).collect()}
    assert got[1]["clean_text"] == (
        "alpha beta gamma delta and more words follow after that"
    )
    assert got[1]["n_removed_tokens"] == 7
    # span-free doc passes through whole (lowercased tokenization)
    assert got[3]["n_removed_tokens"] == 0 and got[3]["n_tokens"] == 14
    # fully-duplicated doc empties out
    assert got[4]["clean_text"] == "" and got[4]["n_removed_tokens"] == 18


def test_duplicate_spans_freq_join_not_forced_broadcast(spark):
    """The window-frequency relation is corpus-derived and unbounded —
    it must never be force-broadcast (the unigram-LM lesson)."""
    from hdk_spark.operators.dedup import duplicate_spans

    p = (
        duplicate_spans(_span_docs(spark), n=5)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "CartesianProduct" not in p
    assert "ResolvedHint" not in p  # no forced broadcast hint anywhere


def test_duplicate_spans_matches_python_reference(spark):
    """Randomized corpora vs a brute-force reference: window counting,
    min_count thresholding, island merging, and the rewrite must agree
    exactly (the segment_dedup reference-test pattern)."""
    import random

    from hdk_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        n = rng.choice([2, 3])
        min_count = rng.choice([2, 3])
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            for _ in range(12)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id: long, text: string"
        )
        got_spans = sorted(
            map(tuple, duplicate_spans(
                df, n=n, min_count=min_count, basis="text").collect())
        )
        got_clean = {
            r["doc_id"]: (r["clean_text"], r["n_tokens"],
                          r["n_removed_tokens"])
            for r in remove_duplicate_spans(
                df, duplicate_spans(df, n=n, min_count=min_count,
                                    basis="text")
            ).collect()
        }
        # brute-force reference
        from collections import Counter

        tok_lists = [t.lower().split() for t in texts]
        freq = Counter(
            " ".join(toks[i : i + n])
            for toks in tok_lists
            for i in range(len(toks) - n + 1)
        )
        exp_spans = []
        exp_clean = {}
        for d, toks in enumerate(tok_lists):
            dup_pos = [
                i for i in range(len(toks) - n + 1)
                if freq[" ".join(toks[i : i + n])] >= min_count
            ]
            spans = []
            for p in dup_pos:
                if spans and p - spans[-1][1] <= n:  # merge: gap <= n starts
                    spans[-1][1] = p
                    spans[-1][2] += 1
                else:
                    spans.append([p, p, 1])
            for s, e_start, cnt in spans:
                exp_spans.append((d, s, e_start + n - 1, cnt))
            covered = set()
            for s, e_start, _cnt in spans:
                covered.update(range(s, e_start + n))
            kept = [t for i, t in enumerate(toks) if i not in covered]
            # docs tokenizing to [''] (empty text) count 1 token like
            # Spark's split-of-empty behavior
            ntok = len(toks) if toks else 1
            exp_clean[d] = (" ".join(kept) if toks else "",
                            ntok, len(covered))
        assert got_spans == sorted(exp_spans), (trial, n, min_count)
        assert got_clean == exp_clean, (trial, n, min_count)


def test_sketch_pr_report_planted_counts(spark):
    """Planted corpus: two exact clones (always found) and one
    moderate-overlap pair the coarse 4-perm sketch can miss — the
    report's counts must reconcile with the two underlying passes."""
    from hdk_spark.operators.dedup import (
        minhash_lsh_dedup,
        ngram_jaccard_pairs,
        sketch_pr_report,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # clone of 1
        (3, "alpha beta gamma delta other words here now"),    # partial
        (4, "totally unrelated content nothing shared at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    kw = dict(n=3, threshold=0.3, num_perm=4, bands=2)
    rep = sketch_pr_report(df, **kw).collect()[0]
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(
        df, n=3, threshold=0.3).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in minhash_lsh_dedup(
        df, **kw).collect()}
    assert rep["n_docs"] == 4
    assert rep["exact_pairs"] == len(exact)
    assert rep["approx_pairs"] == len(approx)
    assert rep["true_pos"] == len(exact & approx)
    assert rep["false_pos"] == len(approx - exact)
    assert rep["false_neg"] == len(exact - approx)
    tp, fp, fn = rep["true_pos"], rep["false_pos"], rep["false_neg"]
    if tp + fp:
        assert rep["precision"] == round(tp / (tp + fp), 6)
    if tp + fn:
        assert rep["recall"] == round(tp / (tp + fn), 6)


# ---------------------------------------------------------------------------
# window-granular eval-set decontamination
# ---------------------------------------------------------------------------


def _decontam_fixture(spark):
    train = spark.createDataFrame(
        [
            # eval phrase "the quick brown fox jumps over" at tokens 3..8
            (1, "aaa bbb ccc the quick brown fox jumps over ddd eee fff"),
            # leads with the eval phrase (tokens 0..5)
            (2, "the quick brown fox jumps over and then some more text"),
            # clean document
            (3, "completely unrelated training material with no leakage"),
            # two separate leaks far apart -> two spans
            (4, "the quick brown fox jumps over x1 x2 x3 x4 x5 x6 x7 x8 "
                "x9 x10 the quick brown fox jumps over"),
        ],
        "doc_id: long, text: string",
    )
    eval_df = spark.createDataFrame(
        [(100, "what does the quick brown fox jumps over mean"),
         (101, "an unrelated eval question about something else")],
        "doc_id: long, text: string",
    )
    return train, eval_df


def test_eval_contaminated_spans_planted(spark):
    from hdk_spark.operators.dedup import eval_contaminated_spans

    train, eval_df = _decontam_fixture(spark)
    rows = {
        (r["doc_id"], r["span_start"]): r
        for r in eval_contaminated_spans(
            train, eval_df, n=4, basis="text"
        ).collect()
    }
    # eval windows of n=4 inside the shared 6-token phrase: 3 windows.
    # doc 1: phrase at tokens 3..8 -> windows at 3,4,5 merge to [3,8]
    assert rows[(1, 3)]["span_end"] == 8 and rows[(1, 3)]["n_windows"] == 3
    # doc 2: phrase at 0..5
    assert rows[(2, 0)]["span_end"] == 5
    # doc 3 clean
    assert not any(d == 3 for d, _ in rows)
    # doc 4: two distant leaks -> two maximal spans (0..5 and 16..21)
    assert rows[(4, 0)]["span_end"] == 5
    assert rows[(4, 16)]["span_end"] == 21
    assert len([k for k in rows if k[0] == 4]) == 2


def test_eval_contaminated_spans_hash_matches_text(spark):
    from hdk_spark.operators.dedup import eval_contaminated_spans

    train, eval_df = _decontam_fixture(spark)
    a = sorted(map(tuple, eval_contaminated_spans(
        train, eval_df, n=4, basis="text").collect()))
    b = sorted(map(tuple, eval_contaminated_spans(
        train, eval_df, n=4, basis="xxhash64").collect()))
    assert a == b


def test_eval_contaminated_spans_removal_composes(spark):
    from hdk_spark.operators.dedup import (
        eval_contaminated_spans,
        remove_duplicate_spans,
    )

    train, eval_df = _decontam_fixture(spark)
    spans = eval_contaminated_spans(train, eval_df, n=4, basis="text")
    got = {r["doc_id"]: r
           for r in remove_duplicate_spans(train, spans).collect()}
    assert got[1]["clean_text"] == "aaa bbb ccc ddd eee fff"
    assert got[1]["n_removed_tokens"] == 6
    assert got[3]["n_removed_tokens"] == 0
    # no eval window remains in any cleaned text
    for r in got.values():
        assert "the quick brown fox" not in r["clean_text"]


def test_eval_contaminated_spans_bloom_superset_of_exact(spark):
    """Bloom spans must COVER every exact span (no false negatives);
    with a roomy filter they are identical."""
    from hdk_spark.operators.dedup import (
        eval_contaminated_spans,
        eval_contaminated_spans_bloom,
    )

    train, eval_df = _decontam_fixture(spark)
    exact = sorted(map(tuple, eval_contaminated_spans(
        train, eval_df, n=4, basis="text").collect()))
    bloom = sorted(map(tuple, eval_contaminated_spans_bloom(
        train, eval_df, n=4, m_bits=1 << 20, k_hashes=4).collect()))
    assert bloom == exact  # FP rate negligible at this size
    # superset even with a deliberately tiny, collision-prone filter
    tiny = eval_contaminated_spans_bloom(
        train, eval_df, n=4, m_bits=1 << 8, k_hashes=2).collect()
    cover = {}
    for r in tiny:
        cover.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    for (doc, s, e, _nw) in exact:
        assert any(bs <= s and e <= be for bs, be in cover.get(doc, [])), (
            doc, s, e, cover)


def test_eval_contaminated_spans_matches_python_reference(spark):
    """Randomized corpora vs a brute-force reference (the
    duplicate_spans reference-test pattern) for the exact operator."""
    import random

    from hdk_spark.operators.dedup import eval_contaminated_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(10)]
    for trial in range(4):
        n = rng.choice([2, 3])
        train_texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
            for _ in range(10)
        ]
        eval_texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
            for _ in range(4)
        ]
        tdf = spark.createDataFrame(
            list(enumerate(train_texts)), "doc_id: long, text: string")
        edf = spark.createDataFrame(
            list(enumerate(eval_texts)), "doc_id: long, text: string")
        got = sorted(map(tuple, eval_contaminated_spans(
            tdf, edf, n=n, basis="text").collect()))

        ewins = set()
        for t in eval_texts:
            toks = t.strip().lower().split()
            for i in range(len(toks) - n + 1):
                ewins.add(" ".join(toks[i : i + n]))
        want = []
        for d, t in enumerate(train_texts):
            toks = t.strip().lower().split()
            hits = [i for i in range(len(toks) - n + 1)
                    if " ".join(toks[i : i + n]) in ewins]
            if not hits:
                continue
            start, prev, cnt = hits[0], hits[0], 1
            for h in hits[1:]:
                if h - prev > n:
                    want.append((d, start, prev + n - 1, cnt))
                    start, cnt = h, 0
                prev = h
                cnt += 1
            want.append((d, start, prev + n - 1, cnt))
        assert got == sorted(want), (trial, n)


def test_eval_contaminated_spans_join_not_forced_broadcast(spark):
    """The eval-window relation is input-derived — AQE decides the join
    strategy, nothing is force-broadcast (the unigram-LM lesson)."""
    from hdk_spark.operators.dedup import eval_contaminated_spans

    train, eval_df = _decontam_fixture(spark)
    p = (
        eval_contaminated_spans(train, eval_df, n=4)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "CartesianProduct" not in p
    assert "ResolvedHint" not in p


def test_eval_contaminated_spans_bloom_corpus_pass_join_free(spark):
    """The Bloom probe never joins the corpus against anything — the
    only shuffle before island merging is the per-document window."""
    from hdk_spark.operators.dedup import eval_contaminated_spans_bloom

    train, eval_df = _decontam_fixture(spark)
    p = (
        eval_contaminated_spans_bloom(train, eval_df, n=4)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" not in p


# ---------------------------------------------------------------------------
# semantic_dedup (SemDedup)
# ---------------------------------------------------------------------------


def _semdedup_fixture(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_semantic_dedup_invariants(spark):
    """One row per input, exactly one keeper per group, groups never
    cross a k-means cluster, group_id is the group's minimum id."""
    from hdk_spark.operators.dedup import semantic_dedup

    emb = _semdedup_fixture(spark)
    out = semantic_dedup(emb, threshold=0.4).persist()
    n = emb.count()
    assert out.count() == n
    rows = out.collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group_id"], []).append(r)
    for gid, members in by_group.items():
        assert sum(m["kept"] for m in members) == 1, gid
        assert len({m["cluster"] for m in members}) == 1, gid
        assert gid == min(m["vec_id"] for m in members), gid


def test_semantic_dedup_lsh_drops_subset_of_exact(spark):
    """LSH candidate generation can only MISS pairs (exact rescore on
    both paths), so its duplicate groups are refinements of the exact
    groups — and the exact keeper, being its whole group's
    (cdist, -id)-max, wins any subgroup containing it. Hence
    dropped(lsh) ⊆ dropped(exact)."""
    from hdk_spark.operators.dedup import semantic_dedup

    emb = _semdedup_fixture(spark)
    exact = semantic_dedup(emb, threshold=0.4, mode="exact")
    lsh = semantic_dedup(
        emb, threshold=0.4, mode="lsh", n_planes=4, n_tables=4
    )
    dropped_exact = {
        r["vec_id"] for r in exact.filter("NOT kept").collect()
    }
    dropped_lsh = {r["vec_id"] for r in lsh.filter("NOT kept").collect()}
    assert dropped_lsh <= dropped_exact
    assert dropped_exact, "fixture produced no duplicate groups"


def test_semantic_dedup_repartition_deterministic(spark):
    """Bit-identical verdicts at any input partitioning (the
    decimal-sum / fixed-fold determinism contract)."""
    from hdk_spark.operators.dedup import semantic_dedup

    emb = _semdedup_fixture(spark)
    a = sorted(
        map(tuple, semantic_dedup(emb, threshold=0.4).collect())
    )
    b = sorted(
        map(
            tuple,
            semantic_dedup(emb.repartition(13), threshold=0.4).collect(),
        )
    )
    assert a == b


def test_split_leakage_audit(spark):
    """Straddling pairs detected across orientations, NULL-safe split
    compare, carried pair columns preserved, summary gate row."""
    from hdk_spark.operators.dedup import split_leakage_audit

    pairs = spark.createDataFrame(
        [(1, 2, 0.97), (3, 4, 0.96), (5, 6, 0.99), (7, 8, 0.95)],
        "id_a: long, id_b: long, cosine: double")
    assign = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (4, "train"),
         (5, "val"), (6, "val"), (7, "train"), (8, None)],
        "doc_id: long, split: string")
    got = {(r["id_a"], r["id_b"]): (r["split_a"], r["split_b"], r["cosine"])
           for r in split_leakage_audit(pairs, assign).collect()}
    assert set(got) == {(1, 2), (7, 8)}  # NULL split != train
    assert got[(1, 2)] == ("train", "val", 0.97)

    s = split_leakage_audit(pairs, assign, summary=True).collect()[0]
    assert (s["n_pairs"], s["n_straddling"]) == (4, 2)
    assert s["pct_straddling"] == 0.5
