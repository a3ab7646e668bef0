"""Bucketed co-located joins and salted skew joins: correctness AND
plan-shape (the shuffle must actually disappear / the skew must
actually spread).
"""

import pytest
from pyspark.sql import functions as F

from hdk_spark import partitioning as P
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module", autouse=True)
def tables(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)


def test_bucketed_join_has_no_exchange(spark):
    P.write_bucketed(
        spark.table("orders"), "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    P.write_bucketed(
        spark.table("lineitem"), "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
    joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"])
    # co-located: no shuffle exchange on either side
    p = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "Exchange hashpartitioning" not in p
    # correctness vs the unbucketed join
    expect = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert joined.count() == expect
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_has_no_exchange(spark):
    P.write_bucketed(spark.table("lineitem"), "b_li2", ["l_orderkey"], 8)
    agg = spark.table("b_li2").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    p = agg._sc._jvm.PythonSQLUtils.explainString(agg._jdf.queryExecution(), "formatted")
    assert "Exchange hashpartitioning" not in p
    spark.sql("DROP TABLE IF EXISTS b_li2")


def test_salted_join_matches_plain_join(spark):
    li = spark.table("lineitem").select("l_orderkey", "l_quantity")
    orders = spark.table("orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    salted = P.salted_join(
        li, orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", salt=4
    )
    assert salted.count() == plain.count()
    a = plain.groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("s"))
    b = salted.groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("s"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_join_spreads_hot_key(spark):
    # a pathological 90%-one-key dataset
    hot = spark.range(0, 9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(0, 1000).select(
        (F.col("id") % 100 + 2).alias("k"), F.col("id").alias("v")
    )
    big = hot.unionByName(cold)
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(1, 102)], "k long, d string")
    # this tiny fixture would broadcast (no shuffle → nothing to
    # spread) and AQE would coalesce back to one partition — disable
    # static + adaptive broadcast and coalescing to observe the salted
    # shuffle itself
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        out = P.salted_join(big, dim, "k", salt=8)
        assert out.count() == 10000
        # the hot key's rows must occupy >1 partition after the salted shuffle
        parts = (
            out.filter(F.col("k") == 1)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert parts > 1
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_repartition_by_keys_reused_across_aggs(spark):
    li = P.repartition_by_keys(
        spark.table("lineitem").select("l_orderkey", "l_quantity", "l_extendedprice"),
        ["l_orderkey"],
        16,
    )
    a1 = li.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    # the groupBy can reuse the repartition's hash partitioning: the agg
    # adds no further exchange beyond the explicit one
    p = a1._sc._jvm.PythonSQLUtils.explainString(a1._jdf.queryExecution(), "formatted")
    assert p.count("hashpartitioning(") == 1


def test_dynamic_partition_pruning_on_partitioned_export(spark, tmp_path):
    """Hive-partitioned exports (Result.to_parquet(partition_by=...))
    must get DYNAMIC partition pruning when joined through a filtered
    dimension — at 100 TB this is the mechanism that turns a
    dim-filtered fact join into a scan of only the matching
    partitions. Pin: the fact scan's PartitionFilters carry a
    dynamicpruning expression."""
    from pyspark.sql import functions as F

    import hdk_spark as hdk

    eng = hdk.init(spark=spark)
    fact = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 10).alias("rk"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "fact")
    eng.sql("SELECT * FROM f", f=fact).to_parquet(out, partition_by=["rk"])

    dim = spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "rk: long, name: string"
    )
    q = (
        spark.read.parquet(out)
        .join(dim.filter(F.col("name").isin("r3", "r7")), "rk")
        .groupBy("rk")
        .count()
    )
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p.lower()
    assert sorted(r["rk"] for r in q.collect()) == [3, 7]
