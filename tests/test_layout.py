"""Z-order layout: locality property (the data-skipping payoff),
cross-engine formula agreement, and plan shape."""

import itertools
import statistics

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hdk_spark.operators.layout import zorder_by, zorder_key, zorder_sql


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(x, y) for x, y in itertools.product(range(64), range(64))]
    return spark.createDataFrame(rows, "x: long, y: long")


def test_zorder_locality_beats_lexicographic(spark, grid):
    """Per-partition min/max ranges must be tight on BOTH columns —
    a lexicographic sort prunes only the leading column."""
    zb = zorder_by(
        grid, ["x", "y"], 16, bits=6, bounds={"x": (0, 63), "y": (0, 63)}
    ).withColumn("pid", F.spark_partition_id())
    stats = (
        zb.groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("rx"),
            (F.max("y") - F.min("y")).alias("ry"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(stats) == 16
    # balanced partitions (range partitioner on a uniform key)
    assert max(s["n"] for s in stats) <= 2 * (64 * 64 / 16)
    # both dims tight: mean range well under half the global 63
    assert statistics.mean(s["rx"] for s in stats) <= 24
    assert statistics.mean(s["ry"] for s in stats) <= 24

    lex = grid.repartitionByRange(16, "x", "y").withColumn(
        "pid", F.spark_partition_id()
    )
    ls = lex.groupBy("pid").agg((F.max("y") - F.min("y")).alias("ry")).collect()
    # lexicographic gives no pruning on y — z-order must beat it
    assert statistics.mean(s["ry"] for s in ls) > 48


def test_zorder_formula_agreement(spark, grid):
    """Spark Column expr == generated SQL on Spark == same SQL on
    DuckDB (the oracle can never drift from the operator)."""
    bounds = {"x": (0, 63), "y": (0, 63)}
    a = {
        (r["x"], r["y"]): r["z"]
        for r in zorder_key(grid, ["x", "y"], 6, bounds).collect()
    }
    zsql = zorder_sql(["x", "y"], [(0, 63), (0, 63)], bits=6)
    grid.createOrReplaceTempView("zgrid")
    b = {
        (r["x"], r["y"]): r["z"]
        for r in spark.sql(f"SELECT x, y, {zsql} AS z FROM zgrid").collect()
    }
    assert a == b
    pdf = pd.DataFrame(
        [(x, y) for x, y in itertools.product(range(64), range(64))],
        columns=["x", "y"],
    )
    d = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(f"SELECT x, y, {zsql} AS z FROM pdf").fetchall()
    }
    assert a == d


def test_zorder_key_map_only_with_literal_bounds(spark, grid):
    """Catalog-known bounds → the key projection is shuffle-free."""
    df = zorder_key(grid, ["x", "y"], 6, {"x": (0, 63), "y": (0, 63)})
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p


def test_zorder_by_single_range_exchange(spark, grid):
    df = zorder_by(grid, ["x", "y"], 8, bits=6,
                   bounds={"x": (0, 63), "y": (0, 63)})
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1 and "rangepartitioning" in p.lower()


def test_zorder_edge_cases(spark):
    df = spark.createDataFrame(
        [(0.0, 5.0), (None, 5.0), (100.0, 5.0)], "a: double, b: double"
    )
    rows = zorder_key(
        df, ["a", "b"], 4, {"a": (0.0, 10.0), "b": (5.0, 5.0)}
    ).collect()
    zs = {r["a"]: r["z"] for r in rows}
    assert zs[None] == 0          # NULL -> low corner
    assert zs[100.0] == zs.get(100.0)  # clamped, no overflow
    # constant column contributes nothing: z must only encode `a`
    assert zs[0.0] == 0
    with pytest.raises(ValueError):
        zorder_key(df, ["a"] * 8, 8)  # 64 bits > int64


def test_zorder_deterministic_under_repartition(spark, grid):
    bounds = {"x": (0, 63), "y": (0, 63)}
    a = sorted(
        map(tuple, zorder_key(grid, ["x", "y"], 6, bounds).collect())
    )
    b = sorted(
        map(
            tuple,
            zorder_key(grid.repartition(7), ["x", "y"], 6, bounds).collect(),
        )
    )
    assert a == b


def test_facade_zorder_write_tightens_file_stats(spark, tmp_path):
    """Result.to_parquet(zorder=...) must produce parquet files whose
    per-file min/max ranges on the clustered columns are tight (the
    data-skipping payoff), and round-trip the exact rows."""
    import glob
    import itertools

    import pyarrow.parquet as pq

    import hdk_spark as hdk

    eng = hdk.init(spark=spark)
    rows = [(x, y) for x, y in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, "x: long, y: long")
    res = eng.sql("SELECT * FROM grid", grid=df)
    out = str(tmp_path / "zo")
    res.to_parquet(out, zorder=["x", "y"], zorder_files=8)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 4
    spans = []
    for f in files:
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans.append((max(xs) - min(xs), max(ys) - min(ys)))
    import statistics

    # both columns tight per file (global span 31)
    assert statistics.mean(s[0] for s in spans) <= 16
    assert statistics.mean(s[1] for s in spans) <= 16
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)

    with pytest.raises(ValueError):
        res.to_parquet(out, zorder=["x"], bucket_by=(4, ["x"]))


def test_compaction_bins_never_split_and_bounded(spark):
    import pytest
    from pyspark.sql import functions as F

    from hdk_spark.operators.layout import compaction_bins

    rows = [(f"f{i:03d}", s) for i, s in enumerate(
        [500, 300, 300, 900, 100, 100, 100, 100, 2000, 50])]
    df = spark.createDataFrame(rows, "path: string, size_bytes: long")
    out = compaction_bins(df, target_bytes=1000).collect()
    by_bin = {}
    for r in sorted(out, key=lambda r: r["path"]):
        by_bin.setdefault(r["bin"], []).append(r["size_bytes"])
    # cumulative rule bin = cum_before // target, files never split:
    # cum_before = 0,500,800,1100,2000,2100,...,2400,4400
    assert by_bin == {
        0: [500, 300, 300],
        1: [900],
        2: [100, 100, 100, 100, 2000],
        4: [50],  # the oversize file skips bin 3 entirely — correct:
                  # a bin is a byte RANGE of the cumulative stream
    }
    with pytest.raises(ValueError):
        compaction_bins(df, target_bytes=0)


def test_compaction_bins_idempotent_replan_and_partitions(spark):
    from pyspark.sql import functions as F

    from hdk_spark.operators.layout import compaction_bins

    rows = [(f"p{i % 3}", f"p{i % 3}/f{i:04d}", (i * 37) % 700 + 1)
            for i in range(200)]
    df = spark.createDataFrame(rows, "part: string, path: string, size_bytes: long")
    a = sorted(map(tuple, compaction_bins(
        df, target_bytes=2000, partition_col="part").collect()))
    b = sorted(map(tuple, compaction_bins(
        df.repartition(7), target_bytes=2000, partition_col="part").collect()))
    assert a == b
    # bins are per-partition: bin 0 exists in every partition
    assert {t[0] for t in a if t[3] == 0} == {"p0", "p1", "p2"}
    # bin totals bounded by target + one file
    import collections
    tot = collections.Counter()
    for part, path, size, bin_, pos in a:
        tot[(part, bin_)] += size
    assert all(v < 2000 + 700 for v in tot.values())
