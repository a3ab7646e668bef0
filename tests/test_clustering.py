"""k-means: planted-cluster recovery, determinism, map-only assignment
plan."""

from pyspark.sql import functions as F

from hdk_spark.operators.clustering import kmeans_assignments


def _planted(spark):
    # two tight blobs far apart in 4-d
    rows = []
    for i in range(50):
        rows.append((i, [10.0 + (i % 5) * 0.01, 10.0, 10.0, 10.0]))
    for i in range(50, 100):
        rows.append((i, [-10.0, -10.0 - (i % 5) * 0.01, -10.0, -10.0]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_kmeans_recovers_planted_blobs(spark):
    df = _planted(spark)
    out = kmeans_assignments(df, k=2, iters=3).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(out) == 100 and len(by_cluster) == 2
    groups = sorted(by_cluster.values(), key=lambda s: min(s))
    assert groups[0] == set(range(50)) and groups[1] == set(range(50, 100))


def test_kmeans_deterministic_under_repartition(spark):
    df = _planted(spark)
    a = sorted((r["vec_id"], r["cluster"]) for r in kmeans_assignments(df, k=3, iters=2).collect())
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans_assignments(df.repartition(11), k=3, iters=2).collect()
    )
    assert a == b


def test_kmeans_assignment_plan_is_map_only(spark):
    from hdk_spark.operators.clustering import _assign

    df = _planted(spark)
    cents = {0: [10.0, 10.0, 10.0, 10.0], 1: [-10.0, -10.0, -10.0, -10.0]}
    p = _assign(df, "vec_id", "embedding", cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p  # literal centroids, no shuffle
