"""Deterministic sampling / packing operators: exact counts, stability
under repartitioning, and the packing budget invariant."""

from pyspark.sql import functions as F

from hdk_spark.operators.packing import pack_sequences
from hdk_spark.operators.sampling import (
    hash_sample,
    mixture_sample,
    stratified_sample,
    train_val_split,
)


def _docs(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") % 97 + 3).alias("n_tokens"),
    )


def test_hash_sample_deterministic_and_partition_stable(spark):
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 20, seed=5).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(df.repartition(13), "doc_id", 20, seed=5).collect()
    )
    assert a == b and len(a) > 0
    # roughly the requested rate (hash uniformity, not exactness)
    assert 0.1 < len(a) / 1000 < 0.3


def test_hash_sample_nested_rates(spark):
    # bucket < 10 is a subset of bucket < 30: sample growth is monotone
    df = _docs(spark)
    s10 = {r["doc_id"] for r in hash_sample(df, "doc_id", 10).collect()}
    s30 = {r["doc_id"] for r in hash_sample(df, "doc_id", 30).collect()}
    assert s10 <= s30


def test_stratified_exact_counts(spark):
    df = _docs(spark)
    out = (
        stratified_sample(df, "grp", 7, "doc_id", seed=1)
        .groupBy("grp")
        .count()
        .collect()
    )
    assert {r["count"] for r in out} == {7} and len(out) == 5


def test_stratified_caps_at_stratum_size(spark):
    df = _docs(spark, n=10)  # strata of size 2
    out = stratified_sample(df, "grp", 7, "doc_id").groupBy("grp").count().collect()
    assert all(r["count"] == 2 for r in out)


def test_mixture_weights_zero_and_one(spark):
    df = _docs(spark)
    out = mixture_sample(
        df, "grp", {"0": 1.0, "1": 0.0}, "doc_id", default_weight=0.5
    )
    by_grp = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    assert by_grp["0"] == 200  # weight 1.0 keeps everything
    assert "1" not in by_grp  # weight 0.0 drops everything
    for g in ("2", "3", "4"):  # default 0.5 keeps roughly half
        assert 60 < by_grp[g] < 140


def test_train_val_split_partitions_all_rows(spark):
    df = _docs(spark)
    out = train_val_split(df, "doc_id", train_pct=80, seed=2)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["train"] + counts["val"] == 1000
    assert 700 < counts["train"] < 900
    # same seed → same membership on recompute
    again = {
        r["split"]: r["count"]
        for r in train_val_split(df.repartition(7), "doc_id", 80, seed=2)
        .groupBy("split")
        .count()
        .collect()
    }
    assert again == counts


def test_pack_sequences_budget_invariant(spark):
    df = _docs(spark)
    out = pack_sequences(df, "doc_id", "n_tokens", budget=256, n_shards=4).collect()
    assert len(out) == 1000  # every doc assigned exactly once
    chunks: dict[tuple, list[int]] = {}
    for r in out:
        chunks.setdefault((r["shard"], r["chunk_id"]), []).append(r["n_tokens"])
    for toks in chunks.values():
        # greedy rule: a chunk overflows by at most its last document
        assert sum(toks) - max(toks) < 256
    assert {s for s, _ in chunks} == {0, 1, 2, 3}


def test_pack_sequences_deterministic(spark):
    df = _docs(spark)
    a = sorted(map(tuple, pack_sequences(df, "doc_id", "n_tokens").collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(17), "doc_id", "n_tokens").collect())
    )
    assert a == b


def test_chunk_documents_invariants(spark):
    from hdk_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(100))),  # 100 tokens
            (2, "a b c"),  # shorter than one chunk
            (3, " ".join(f"x{i}" for i in range(32))),  # exactly one chunk
        ],
        "doc_id: long, text: string",
    )
    out = chunk_documents(docs, chunk_tokens=32, stride=16).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 1: ceil((100-32)/16)+1 = 6 chunks; stride-16 overlap between
    # consecutive chunks; non-overlapped reconstruction = original doc
    c1 = by_doc[1]
    assert len(c1) == 6
    assert all(r["n_tokens"] == 32 for r in c1[:-1]) and c1[-1]["n_tokens"] == 20
    for a, b in zip(c1, c1[1:]):
        assert a["chunk_text"].split()[16:] == b["chunk_text"].split()[: a["n_tokens"] - 16]
    rebuilt = c1[0]["chunk_text"].split()
    for r in c1[1:]:
        rebuilt += r["chunk_text"].split()[len(rebuilt) - r["chunk_idx"] * 16 :]
    assert rebuilt == [f"w{i}" for i in range(100)]

    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 32


def test_chunk_documents_map_only_plan(spark):
    from hdk_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    p = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p  # pure explode+slice, no shuffle


def test_shuffle_shards_deterministic_and_partition_stable(spark):
    from hdk_spark.operators.sampling import shuffle_shards

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = shuffle_shards(df, "k", 16, seed=3).collect()
    b = shuffle_shards(df.repartition(13), "k", 16, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rows = {r["k"]: (r["shard"], r["shard_pos"]) for r in a}
    # every row assigned; positions dense 0..n-1 per shard
    assert len(rows) == 2000
    from collections import defaultdict

    per = defaultdict(list)
    for s, p in rows.values():
        per[s].append(p)
    for s, ps in per.items():
        assert sorted(ps) == list(range(len(ps)))
    # hash-uniform shards: no shard more than 2x the mean
    sizes = [len(ps) for ps in per.values()]
    assert max(sizes) < 2 * (2000 / 16)
    # order decorrelated from key order: first shard isn't sorted by key
    s0 = sorted(
        (p for k, (s, p) in rows.items() if s == 0),
    )
    keys_in_order = [
        k for k, (s, p) in sorted(rows.items(), key=lambda kv: kv[1]) if s == 0
    ]
    assert keys_in_order != sorted(keys_in_order)


def test_shuffle_shards_single_exchange(spark):
    from hdk_spark.operators.sampling import shuffle_shards

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    p = shuffle_shards(df, "k", 8)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1


def test_mixture_plan_semantics(spark):
    from hdk_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 50), ("c", 10)],
        ["src", "toks"],
    )
    rows = {
        r["group"]: r
        for r in mixture_plan(
            df, "src", "toks", {"a": 0.5, "b": 0.5}, budget_tokens=100
        ).collect()
    }
    # a: target 50 of 200 available -> 2500 bp, 1 epoch
    assert rows["a"]["rate_bp"] == 2500 and rows["a"]["epochs"] == 1
    # b: target 50 of 50 -> capped 10000 bp, exactly 1 epoch
    assert rows["b"]["rate_bp"] == 10000 and rows["b"]["epochs"] == 1
    # c: not in targets -> zero everywhere
    assert rows["c"]["target_tokens"] == 0 and rows["c"]["rate_bp"] == 0


def test_mixture_plan_upsampling_epochs(spark):
    from hdk_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame([("a", 10)], ["src", "toks"])
    r = mixture_plan(df, "src", "toks", {"a": 1.0}, budget_tokens=25).collect()[0]
    assert r["rate_bp"] == 10000 and r["epochs"] == 3  # ceil(25/10)


def test_token_budget_sample_matches_serial_prefix_sum(spark):
    """The two-phase (bucket offsets + within-bucket windows) prefix
    sum selects EXACTLY the rows the serial single-window cut over the
    (bucket, hash, id) order would — integer sums make them equal, not
    just close."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hdk_spark.operators.sampling import hash_bucket, token_budget_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budgets = {"en": 900, "de": 400}
    got = {
        r["doc_id"]
        for r in token_budget_sample(
            docs, budgets=budgets, default_budget=300, seed=7, n_buckets=8
        ).collect()
    }
    tok = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    ).cast("long")
    serial = docs.select(
        "doc_id",
        "lang",
        tok.alias("tok"),
        hash_bucket(F.col("doc_id"), 1_000_000_007, 7).alias("h"),
        hash_bucket(F.col("doc_id"), 8, 108).alias("b"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("b", "h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget = (
        F.when(F.col("lang") == "de", 400)
        .when(F.col("lang") == "en", 900)
        .otherwise(300)
    )
    want = {
        r["doc_id"]
        for r in serial.withColumn(
            "cum", F.coalesce(F.sum("tok").over(w), F.lit(0))
        )
        .filter(F.col("cum") < budget)
        .collect()
    }
    assert got == want and got


def test_token_budget_sample_budget_semantics(spark):
    """Budget 0 drops the group entirely; removing the last taken doc
    brings every group back under budget (overshoot ≤ one document)."""
    from hdk_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = token_budget_sample(
        docs, budgets={"en": 900, "de": 0}, default_budget=300, seed=7
    )
    rows = out.collect()
    assert not [r for r in rows if r["lang"] == "de"]
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_tokens"])
    budgets = {"en": 900}
    for lang, toks in by_lang.items():
        total = sum(toks)
        assert total - max(toks) < budgets.get(lang, 300)


def test_token_budget_sample_repartition_deterministic(spark):
    from hdk_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        r["doc_id"]
        for r in token_budget_sample(docs, budgets={"en": 900}).collect()
    }
    b = {
        r["doc_id"]
        for r in token_budget_sample(
            docs.repartition(17), budgets={"en": 900}
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# shard_manifest
# ---------------------------------------------------------------------------

def test_shard_manifest_order_independent_digest(spark):
    from hdk_spark.operators.sampling import shard_manifest

    rows = [(i, f"doc {i} body text") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    a = sorted(map(tuple, shard_manifest(df, n_shards=8).collect()))
    # reversed source order + different partitioning -> identical manifest
    b = sorted(map(tuple, shard_manifest(
        df.orderBy(F.desc("doc_id")).repartition(13), n_shards=8
    ).collect()))
    assert a == b
    assert sum(r[1] for r in a) == 200  # n_docs totals the corpus


def test_shard_manifest_detects_content_change(spark):
    from hdk_spark.operators.sampling import shard_manifest

    rows = [(i, f"doc {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    base = {r["shard"]: r["digest"] for r in shard_manifest(df, n_shards=4).collect()}
    tampered = df.withColumn(
        "text", F.when(F.col("doc_id") == 17, F.lit("doc 17 ")).otherwise(F.col("text"))
    )
    got = {r["shard"]: r["digest"] for r in shard_manifest(tampered, n_shards=4).collect()}
    changed = [s for s in base if base[s] != got[s]]
    assert len(changed) == 1  # exactly the shard holding doc 17


def test_shard_manifest_null_text_and_python_twin(spark):
    import hashlib

    from hdk_spark.operators.sampling import shard_manifest

    M, MULT = 2_147_483_647, 2654435761
    rows = [(1, None), (2, ""), (3, "  "), (4, "a b  c")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    [r] = shard_manifest(df, n_shards=1).collect()
    assert (r["n_docs"], r["n_tokens"], r["key_sum"]) == (4, 3, 10)

    def term(k, t):
        h = int(hashlib.md5((t or "").encode()).hexdigest()[:12], 16) % M
        return ((k % M) * MULT + h) % M

    assert r["digest"] == sum(term(k, t) for k, t in rows) % M


def test_shard_manifest_matches_shuffle_shards_assignment(spark):
    from hdk_spark.operators.sampling import shard_manifest, shuffle_shards

    rows = [(i, f"d{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    man = {r["shard"]: r["n_docs"]
           for r in shard_manifest(df, n_shards=8, seed=3).collect()}
    real = {r["shard"]: r["n"]
            for r in shuffle_shards(df, "doc_id", 8, seed=3)
            .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert man == real


def test_export_corpus_shards_match_manifest(spark):
    from hdk_spark.operators.sampling import export_corpus

    rows = [(i, ["en", "de", "fr"][i % 3], f"w{i} " * (i % 9 + 1))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")
    shards, manifest = export_corpus(
        df, "lang", {"en": 150, "de": 80}, n_shards=4, default_budget=60
    )
    real = {
        r["shard"]: (r["n"], r["ks"])
        for r in shards.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("ks")
        ).collect()
    }
    man = {r["shard"]: (r["n_docs"], r["key_sum"]) for r in manifest.collect()}
    assert man == real  # the manifest describes exactly the written shards
    # shard_pos is dense per shard (write-ready order)
    pos = shards.groupBy("shard").agg(
        F.max("shard_pos").alias("mx"), F.count(F.lit(1)).alias("n")
    ).collect()
    assert all(r["mx"] == r["n"] - 1 for r in pos)


def test_token_budget_sample_null_group_default_budget(spark):
    """NULL-group rows are sampled under default_budget instead of
    silently vanishing (ADVICE r8: the offsets equi-join used ==,
    which never matches NULL)."""
    from hdk_spark.operators.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [(i, None if i % 2 else "en", "tok " * 50) for i in range(20)],
        "doc_id: long, lang: string, text: string",
    )
    rows = token_budget_sample(
        docs, budgets={"en": 300}, default_budget=300, seed=7
    ).collect()
    null_toks = [r["n_tokens"] for r in rows if r["lang"] is None]
    assert null_toks, "NULL-group rows must be sampled"
    # overshoot <= one document, same contract as named groups
    assert sum(null_toks) - max(null_toks) < 300


def test_repeat_expand_budget_law(spark):
    """Fractional epochs: copies per id == base + hash-selected extra
    (pure function of id); group totals land within the integer
    rounding envelope of n*num/den; epochs < 1 subsample; copy_idx is
    dense 1..copies; guard on bad fractions; deterministic under
    repartition."""
    import pytest

    from hdk_spark.operators.sampling import hash_bucket, repeat_expand

    rows = [(i, "rare" if i % 3 == 0 else "big") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = repeat_expand(df, "lang", {"rare": (5, 2), "big": (1, 4)})
    got = out.collect()

    from collections import Counter, defaultdict

    per_id = defaultdict(list)
    for r in got:
        per_id[r["doc_id"]].append(r["copy_idx"])
    MULT, MOD = 2654435761, 1_000_000_007
    for i, lang in rows:
        nu, de = (5, 2) if lang == "rare" else (1, 4)
        h = ((i * MULT + 23) % MOD) % MOD % de
        expect = nu // de + (1 if h < nu % de else 0)
        assert len(per_id.get(i, [])) == expect, i
        if expect:
            assert sorted(per_id[i]) == list(range(1, expect + 1))

    c = Counter(r["lang"] for r in got)
    assert abs(c["rare"] - 1000 * 5 / 2) <= 60
    assert abs(c["big"] - 2000 / 4) <= 60

    again = sorted((r["doc_id"], r["copy_idx"])
                   for r in repeat_expand(
                       df.repartition(7), "lang",
                       {"rare": (5, 2), "big": (1, 4)}).collect())
    assert again == sorted((r["doc_id"], r["copy_idx"]) for r in got)

    with pytest.raises(ValueError, match="epochs"):
        repeat_expand(df, "lang", {"rare": (1, 0)})
