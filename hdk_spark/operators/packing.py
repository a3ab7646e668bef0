"""Sequence packing — assign documents to fixed token-budget chunks,
the batching step between a deduped corpus and a training run.

Greedy sequential packing needs a total order and a running token sum —
a single global ordering window would serialize the whole corpus
through one task. Instead the corpus is split into ``n_shards``
deterministic hash shards and packed *within* each shard:

- the running-sum window partitions by shard → n_shards-way parallel,
  each shard's sort fits one task at any corpus size (choose n_shards
  ≈ corpus_tokens / (executor-task-sized slice));
- document→chunk assignment is a pure function of (key, tokens,
  budget, n_shards, seed): reruns and partition recomputes give the
  identical packing, and the whole thing is ANSI-SQL expressible for
  the oracle;
- a document longer than the budget still gets its own chunk (greedy
  floor((cum - tokens) / budget) never splits documents — split
  upstream if oversize docs must be truncated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from hdk_spark.operators.sampling import hash_bucket

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Assign every row to (shard, chunk_id) such that consecutive rows
    of a shard (in deterministic hash order) share a chunk until the
    token budget fills.

    chunk_id = floor((running_sum - tokens) / budget): a chunk may
    overflow the budget by at most one document (greedy first-fit on a
    fixed order — the standard streaming packing rule).
    """
    h = hash_bucket(F.col(key_col), 1_000_000_007, seed)
    shard = hash_bucket(F.col(key_col), n_shards, seed + 1)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__h"), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("__cum", F.sum(F.col(tokens_col)).over(w))
        .select(
            F.col(key_col),
            F.col("shard").cast("bigint").alias("shard"),
            F.floor(
                (F.col("__cum") - F.col(tokens_col)) / F.lit(budget)
            ).alias("chunk_id"),
            F.col(tokens_col).alias("n_tokens"),
        )
    )
