

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


def test_frequent_items_exact_vs_brute_force(spark):
    """frequent_items == brute-force GROUP BY + HAVING cnt*k > n on a
    skewed corpus, across partition layouts (the MG candidate pass
    must never lose a true heavy hitter); NULLs excluded; k guard."""
    import pytest

    from hdk_spark.operators.sketches import frequent_items

    # skew: 'hot0'/'hot1' huge, a mid tier, and a long unique tail
    rows = []
    for i in range(3000):
        if i % 3 != 2:
            rows.append((i, f"hot{i % 2}"))
        elif i % 9 == 2:
            rows.append((i, f"mid{i % 27}"))
        else:
            rows.append((i, f"tail{i}"))
    rows += [(90000 + j, None) for j in range(10)]
    df = spark.createDataFrame(rows, "id: long, v: string")

    from collections import Counter

    counts = Counter(v for _, v in rows if v is not None)
    n = sum(counts.values())
    for k in (5, 20, 100):
        expect = sorted(
            ((v, c) for v, c in counts.items() if c * k > n),
            key=lambda t: (-t[1], t[0]),
        )
        for parts in (1, 7):
            got = [
                (r["item"], r["cnt"])
                for r in frequent_items(df.repartition(parts), "v", k).collect()
            ]
            assert got == expect, (k, parts)
            assert all(
                r["n_total"] == n
                for r in frequent_items(df.repartition(parts), "v", k).collect()
            )

    with pytest.raises(ValueError, match="k"):
        frequent_items(df, "v", 0)


def test_mg_trim_bound():
    """The trim keeps at most k counters and undercounts any item by
    at most (N - sum(counters)) / (k+1) — the Misra-Gries invariant,
    checked by folding a worst-case adversarial stream."""
    from collections import Counter

    from hdk_spark.operators.sketches import _mg_trim

    stream = [f"x{i % 37}" for i in range(500)] + ["hh"] * 100
    true = Counter(stream)
    k = 10
    counters: dict = {}
    # fold in chunks like the batch kernel does
    for pos in range(0, len(stream), 50):
        for v, c in Counter(stream[pos:pos + 50]).items():
            counters[v] = counters.get(v, 0) + c
        _mg_trim(counters, k)
    assert len(counters) <= k
    slack = (len(stream) - sum(counters.values())) / (k + 1)
    for item, t in true.items():
        assert counters.get(item, 0) >= t - slack - 1e-9
