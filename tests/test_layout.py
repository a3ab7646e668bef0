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
