

def test_ndv_sketch_merge_exact_and_overlap_idempotent(spark):
    """HLL rollup mergeability: merge of disjoint halves == single
    pass EXACTLY; merging OVERLAPPING slices is idempotent (union
    semantics, unlike additive count rollups); estimate-mode error
    stays inside the lgk=12 band at 50k distinct values."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.sketches import (
        merge_ndv_rollups,
        ndv_estimate,
        ndv_rollup,
    )

    big = spark.range(50_000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") * 7919).alias("v")
    )
    single = {r["grp"]: r["ndv"] for r in ndv_estimate(
        ndv_rollup(big, "g", "v")).collect()}
    halves = merge_ndv_rollups(
        ndv_rollup(big.filter("id % 2 = 0"), "g", "v"),
        ndv_rollup(big.filter("id % 2 = 1"), "g", "v"),
    )
    merged = {r["grp"]: r["ndv"] for r in ndv_estimate(halves).collect()}
    assert merged == single
    # overlapping re-ingest: sketch union is idempotent on ndv
    over = merge_ndv_rollups(
        ndv_rollup(big, "g", "v"), ndv_rollup(big.filter("id < 30000"), "g", "v")
    )
    again = {r["grp"]: r["ndv"] for r in ndv_estimate(over).collect()}
    assert again == single
    # error band: 12500 exact per group, lgk=12 -> ~1.6% std err
    for g, est in single.items():
        assert abs(est - 12_500) / 12_500 < 0.05, (g, est)

    import pytest

    with pytest.raises(ValueError, match="at least one"):
        merge_ndv_rollups()
