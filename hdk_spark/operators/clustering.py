"""Distributed k-means over an embedding column — the clustering /
corpus-mapping step of an embedding pipeline (topic bucketing, IVF
coarse quantizers, diversity sampling).

Scale design:

- **Assignment is map-only.** Centroids are k×dim literals folded into
  the plan (k-means centroids are always driver-small); each row's
  nearest centroid is an argmin over k JVM higher-order-function
  distance expressions — no join, no shuffle, no Python.
- **Update is one partial-aggregated groupBy** per iteration (k×dim
  numbers out), collected to the driver — the same bounded-action
  pattern as the IVF quantizer (similarity.py).
- **Deterministic by construction** (unusual for k-means, deliberate
  here): init picks the k rows with the smallest arithmetic key hash
  (recompute-stable, no rand()); per-dimension centroid sums go
  through DECIMAL(20,10) so partial-aggregation order cannot perturb
  the result; distance folds are sequential from 0.0 (IEEE: 0+x == x,
  so any engine's first-element fold agrees bit-for-bit); argmin ties
  break on the lower cluster id. Two engines running this spec produce
  IDENTICAL assignments — the driver's DuckDB oracle does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hdk_spark.operators.sampling import hash_bucket

__all__ = ["kmeans_assignments", "kmeans_centroids"]


def _dist_sq(vec, centroid: list[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(df: DataFrame, id_col: str, vec_col: str, cents: dict[int, list[float]]):
    # argmin via ONE sorted (distance, id) struct array — struct
    # ordering is (d asc, c asc), i.e. ties keep the lower cluster id.
    # A when-chain argmin re-nests every prior distance expression per
    # centroid (tree size doubles each step: fine at k=4, analysis
    # explosion at k=16 — measured as a hang on the IVF quantizer).
    vec = F.col(vec_col)
    entries = F.array(
        *[
            F.struct(
                _dist_sq(vec, cents[cid]).alias("d"),
                F.lit(cid).cast("bigint").alias("c"),
            )
            for cid in sorted(cents)
        ]
    )
    best = F.array_sort(entries)[0]
    # cdist (exact squared distance to the winning centroid) rides along
    # for free — it is the winning struct's sort key. semantic_dedup's
    # keep-farthest-from-centroid rule consumes it; kmeans callers that
    # don't need it project it away.
    return df.select(
        F.col(id_col),
        vec.alias(vec_col),
        best["c"].alias("cluster"),
        best["d"].alias("cdist"),
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> dict[int, list[float]]:
    """Lloyd's k-means, ``iters`` driver-coordinated rounds; returns the
    final centroids {cluster_id: vector}. Every step is exactly
    reproducible across engines (module docstring) — this is also the
    deterministic coarse-quantizer trainer for similarity.ann_ivf_topk's
    oracle-checkable path."""
    dim = len(df.select(vec_col).first()[0])

    init = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("__h", hash_bucket(F.col("__id"), 1_000_000_007, seed))
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )
    cents = {i: [float(x) for x in r["__v"]] for i, r in enumerate(init)}

    for _ in range(iters):
        assigned = _assign(df, id_col, vec_col, cents)
        # exact decimal per-dimension sums -> shuffle-order-independent
        aggs = [
            (
                F.sum(
                    F.element_at(F.col(vec_col), d + 1)
                    .cast("double")
                    .cast("decimal(20,10)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias(f"d{d}")
            for d in range(dim)
        ]
        rows = assigned.groupBy("cluster").agg(*aggs).collect()
        cents = {
            int(r["cluster"]): [float(r[f"d{d}"]) for d in range(dim)] for r in rows
        }
    return cents


def kmeans_assignments(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Lloyd's k-means, ``iters`` driver-coordinated rounds; returns
    (id, cluster) for every row. See module docstring for why every
    step is exactly reproducible across engines."""
    cents = kmeans_centroids(df, k, iters, id_col, vec_col, seed)
    return _assign(df, id_col, vec_col, cents).select(id_col, "cluster")
