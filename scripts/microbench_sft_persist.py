"""Microbench: sft_pack_export's double render (audit flag
chat_sft_export x4, OPTIMIZATION_r14.md "Not yet optimized").

The rendered loss-mask relation `lm` feeds TWO consumers — the pack
plan (pruned to (id, n_tokens)) and the token/mask join-back — so a
single action parses the conversation JSON and flattens the token
stream twice per doc. The pack-plan branch prunes to n_tokens but
still builds the full arrays to size() them.

Variants measured (equality gated first, bit-compare on digests):
  old      — shipped sft_pack_export (double render)
  persist  — lm.persist() inside the operator (crawl persist_stages
             trade: one render + a token-payload cache write/read)
  count    — the pack-plan branch computes n_tokens ARITHMETICALLY
             (aggregate fold: 1 header + size(content tokens) per
             turn, no flatten/arrays), so only the join-back renders;
             no cache, two input scans (the 100 TB-friendly shape)

Input: sf0.1 documents replicated MB_REPLICATE x (default 40 ->
200k rows) with the contract row's planted conversation shape,
PERSISTED AT THE HARNESS LEVEL so the upstream plant costs the same
cache scan for every variant and the timing isolates the render
duplication itself (real inputs are columnar parquet).

Run: python scripts/microbench_sft_persist.py [rounds]

REJECTED on these numbers (r14, 5 ABBA rounds each config):
  contract-sized convs (~30 tok, 200k rows): old median 2.601 s,
    persist 2.660 (WORSE — same verdict as domain_boilerplate's
    internal persist), count 2.481 (~4.6%, only 3/5 pairs — noise).
  heavy convs (MB_EXTRA=150 -> ~470 tok, 100k rows): old median
    4.154, persist 3.706 but with a 29 s spike (the token-payload
    cache thrashes memory — the exact 100 TB hazard), count 4.002
    (overlapping distributions).
The dominant cost is the payload shuffle + collect_list/flatten,
which every variant pays; the render dedup saves <5-10% while either
caching token payloads (persist) or maintaining a second token-count
implementation that must stay exactly in sync with the render
(count). The shipped double render stands.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import DataFrame, functions as F

from hdk_spark.session import get_spark
from hdk_spark.operators.chat import chat_loss_mask, sft_pack_export, _CONV_SCHEMA
from hdk_spark.operators.packing import pack_sequences
from hdk_spark.operators.sampling import hash_bucket

REPLICATE = int(os.environ.get("MB_REPLICATE", "40"))
BUDGET = int(os.environ.get("MB_BUDGET", "2048"))
SHARDS = int(os.environ.get("MB_SHARDS", "16"))
# extra whitespace-separated filler tokens appended to every content —
# the planted contract convs are ~30 tokens; real SFT rows are 100s
EXTRA = int(os.environ.get("MB_EXTRA", "0"))


def _variant(df, mode, budget=BUDGET, n_shards=SHARDS, seed=0,
             id_col="doc_id", conversation_col="conversation"):
    if mode == "old":
        return sft_pack_export(df, conversation_col, id_col, budget,
                               n_shards, seed)
    lm = chat_loss_mask(df, id_col, conversation_col).filter(
        F.col("n_tokens") > 0
    )
    if mode == "persist":
        lm = lm.persist()
        plan_src = lm.select(id_col, "n_tokens")
    else:  # count: arithmetic n_tokens, no arrays on the plan branch
        arr = F.from_json(F.col(conversation_col), _CONV_SCHEMA)
        parsed = arr.isNotNull() & (F.size(arr) > 0) & ~F.exists(
            arr, lambda t: t["role"].isNull()
        )

        def turn_toks(t):
            c = F.coalesce(t["content"], F.lit(""))
            return F.when(
                F.length(F.trim(c)) == 0, F.lit(0)
            ).otherwise(F.size(F.split(F.trim(c), r"\s+")))

        n = F.when(
            parsed,
            F.aggregate(
                arr, F.lit(0), lambda a, t: a + 1 + turn_toks(t)
            ),
        ).otherwise(F.lit(0)).cast("long")
        plan_src = (
            df.select(F.col(id_col), n.alias("n_tokens"))
            .filter(F.col("n_tokens") > 0)
        )
    plan = pack_sequences(plan_src, id_col, "n_tokens",
                          budget=budget, n_shards=n_shards, seed=seed)
    joined = plan.select(id_col, "shard", "chunk_id").join(
        lm.select(
            id_col,
            hash_bucket(F.col(id_col), 1_000_000_007, seed).alias("__h"),
            "tokens", "loss_mask", "n_tokens", "n_trainable",
        ),
        id_col,
    )
    packed = joined.groupBy("shard", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_trainable").cast("long").alias("n_trainable"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__h"), F.col(id_col).alias("__id"),
                    F.col("tokens"), F.col("loss_mask"),
                )
            )
        ).alias("__docs"),
    )
    return packed.select(
        "shard", "chunk_id", "n_docs", "n_tokens", "n_trainable",
        F.flatten(
            F.transform(F.col("__docs"), lambda s: s["tokens"])
        ).alias("tokens"),
        F.flatten(
            F.transform(F.col("__docs"), lambda s: s["loss_mask"])
        ).alias("loss_mask"),
    )


def _digest(out):
    return out.select(
        "shard", "chunk_id", "n_docs", "n_tokens", "n_trainable",
        F.md5(F.encode(F.array_join("tokens", "|"), "utf-8")).alias("td"),
        F.md5(
            F.encode(
                F.array_join(F.transform(
                    "loss_mask", lambda x: x.cast("string")), ""),
                "utf-8",
            )
        ).alias("md"),
    )


def main():
    spark = get_spark("mb_sft_persist")
    sc = spark.sparkContext
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    d = F.col("doc_id")
    pairs = (d % 3 + 1).cast("int")
    conv = F.to_json(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), pairs),
                lambda i: F.array(
                    F.struct(
                        F.lit("user").alias("role"),
                        F.concat(
                            F.lit("ask "), d.cast("string"), F.lit(" part "),
                            i.cast("string"), F.lit(" alpha beta gamma"),
                        ).alias("content"),
                    ),
                    F.struct(
                        F.lit("assistant").alias("role"),
                        F.concat(
                            F.lit("reply "), d.cast("string"), F.lit(" part "),
                            i.cast("string"),
                            F.lit(" one two three four five six"),
                            F.repeat(F.lit(" tok"), EXTRA),
                        ).alias("content"),
                    ),
                ),
            )
        )
    )
    # a sliver of edge rows: NULL / broken JSON / empty array / blank content
    base = (
        docs.select("doc_id")
        .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(REPLICATE)])))
        .select((F.col("doc_id") * 1000 + F.col("__r")).alias("doc_id"))
        .withColumn(
            "conversation",
            F.when(F.col("doc_id") % 997 == 0, F.lit(None).cast("string"))
            .when(F.col("doc_id") % 991 == 0, F.lit("not json"))
            .when(F.col("doc_id") % 983 == 0, F.lit("[]"))
            .when(
                F.col("doc_id") % 977 == 0,
                F.lit('[{"role":"user","content":"   "},'
                      '{"role":"assistant","content":"ok"}]'),
            )
            .otherwise(conv),
        )
        .repartition(32)
        .persist()
    )
    print("input rows:", base.count())

    # equality gate: bit-compare all three variants' digests
    ref = (
        _digest(_variant(base, "old"))
        .toPandas()
        .sort_values(["shard", "chunk_id"])
        .reset_index(drop=True)
    )
    ok = True
    for mode in ("persist", "count"):
        got = (
            _digest(_variant(base, mode))
            .toPandas()
            .sort_values(["shard", "chunk_id"])
            .reset_index(drop=True)
        )
        same = ref.equals(got)
        print(f"equality old vs {mode}:", "OK" if same else "MISMATCH")
        ok &= same
        spark.catalog.clearCache()
        base.persist()
        base.count()
    if not ok:
        sys.exit(1)

    def run(mode):
        df = _variant(base, mode)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # drop the operator-internal cache between runs so each timed
        # pass pays its own cache build (keep the harness input hot)
        spark.catalog.clearCache()
        base.persist()
        base.count()
        return dt

    modes = ["old", "persist", "count"]
    for m in modes:
        sc.setJobDescription(f"warm {m}")
        run(m)
    res = {m: [] for m in modes}
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for r in range(rounds):
        order = modes if r % 2 == 0 else modes[::-1]
        for m in order:
            sc.setJobDescription(f"r{r} {m}")
            res[m].append(run(m))
    for m, ts in res.items():
        print(
            f"{m}: best {min(ts):.3f} median {sorted(ts)[len(ts)//2]:.3f} "
            f"{['%.3f' % x for x in ts]}"
        )
    spark.stop()


main()
