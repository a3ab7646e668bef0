"""As-of and range join operators: semantics vs pandas merge_asof /
plain inequality joins, tolerance behavior, and plan shape (the
bucketized range join must not plan a cartesian product).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hdk_spark.operators.temporal import asof_join, range_join
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module", autouse=True)
def tables(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)


def test_asof_matches_pandas_merge_asof(spark):
    e = spark.table("events").filter(F.col("user_id") < 200)
    left = e.select("event_id", "user_id", "ts")
    right = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cval"))
    )
    got = (
        asof_join(left, right, on="ts", by="user_id", right_cols=["cval"])
        .orderBy("event_id")
        .toPandas()
    )
    lp = left.orderBy("ts", "event_id").toPandas()
    rp = right.orderBy("ts").toPandas()
    expect = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward"
    ).sort_values("event_id").reset_index(drop=True)
    assert list(got["event_id"]) == list(expect["event_id"])
    # float series can't hold None; compare through a NaN sentinel
    assert got["cval_right"].fillna(-1e18).tolist() == expect["cval"].fillna(-1e18).tolist()


def test_asof_tolerance_drops_stale_matches(spark):
    e = spark.table("events").filter(F.col("user_id") < 100)
    left = e.select("event_id", "user_id", "ts")
    right = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    loose = asof_join(left, right, on="ts", by="user_id", right_cols=["pv"])
    tight = asof_join(
        left, right, on="ts", by="user_id", right_cols=["pv"],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    n_loose = loose.filter(F.col("pv_right").isNotNull()).count()
    n_tight = tight.filter(F.col("pv_right").isNotNull()).count()
    assert n_tight <= n_loose
    # every tight match is within the hour
    bad = tight.filter(
        F.col("pv_right").isNotNull()
        & (F.col("ts").cast("long") - F.col("ts_right").cast("long") > 3600)
    )
    assert bad.count() == 0


def test_asof_exact_timestamp_is_matched(spark):
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00")], "id long, k long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 42.0)], "k long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = asof_join(left, right, on="ts", by="k", right_cols=["v"]).collect()[0]
    assert got["v_right"] == 42.0  # <= includes the equal timestamp


def test_range_join_matches_inequality_join(spark):
    li = spark.table("lineitem").select("l_shipdate", "l_quantity").limit(20000)
    ranges = (
        spark.table("orders")
        .select(F.date_trunc("month", "o_orderdate").alias("s"))
        .distinct()
        .withColumn("e", F.col("s") + F.expr("INTERVAL 1 MONTH"))
    )
    got = range_join(li, ranges, "l_shipdate", "s", "e", granularity_seconds=86400 * 10)
    plain = li.join(
        ranges, (F.col("l_shipdate") >= F.col("s")) & (F.col("l_shipdate") < F.col("e"))
    )
    assert got.count() == plain.count()
    a = got.groupBy("s").count().orderBy("s").collect()
    b = plain.groupBy("s").count().orderBy("s").collect()
    assert a == b


def test_joins_avoid_cartesian(spark):
    e = spark.table("events")
    left = e.select("event_id", "user_id", "ts")
    right = e.groupBy("user_id", "ts").agg(F.max("value").alias("v"))
    aj = asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
    p1 = aj._sc._jvm.PythonSQLUtils.explainString(aj._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in p1 and "Join" not in p1  # pure window plan

    ranges = (
        spark.table("orders")
        .select(F.date_trunc("month", "o_orderdate").alias("s"))
        .distinct()
        .withColumn("e", F.col("s") + F.expr("INTERVAL 1 MONTH"))
    )
    rj = range_join(
        spark.table("lineitem").select("l_shipdate"), ranges, "l_shipdate",
        "s", "e", granularity_seconds=86400 * 10,
    )
    p2 = rj._sc._jvm.PythonSQLUtils.explainString(rj._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2


def test_resample_fill_ffill_and_linear(spark):
    from hdk_spark.operators.temporal import resample_fill

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 10.0),
            (1, "2024-01-01 03:20:00", 40.0),   # 3-hour gap at 1h step
            (2, "2024-01-01 05:00:00", 7.0),
        ],
        "key int, ts string, value double",
    ).selectExpr("key", "CAST(ts AS TIMESTAMP) AS ts", "value")

    lin = {
        (r["key"], str(r["grid_ts"])): (r["value"], r["observed"])
        for r in resample_fill(df, "key", "ts", "value", "1 hour", "linear").collect()
    }
    # key 1 grid: 00:00..03:00 — interior points interpolate 10 → 40
    assert lin[(1, "2024-01-01 00:00:00")] == (10.0, True)
    assert lin[(1, "2024-01-01 01:00:00")] == (20.0, False)
    assert lin[(1, "2024-01-01 02:00:00")] == (30.0, False)
    assert lin[(1, "2024-01-01 03:00:00")] == (40.0, True)
    assert lin[(2, "2024-01-01 05:00:00")] == (7.0, True)
    assert len(lin) == 5

    ff = {
        (r["key"], str(r["grid_ts"])): r["value"]
        for r in resample_fill(df, "key", "ts", "value", "1 hour", "ffill").collect()
    }
    assert ff[(1, "2024-01-01 01:00:00")] == 10.0
    assert ff[(1, "2024-01-01 02:00:00")] == 10.0


def test_resample_fill_single_exchange_for_fill(spark):
    from hdk_spark.operators.temporal import resample_fill

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    df = resample_fill(e, "user_id", "ts", "value", "6 hours", "linear")
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    tree = p.split("\n\n")[0]
    # both window passes share the (key, grid_ts) ordering: one Window
    # sort, no extra exchange between the fill windows
    assert "CartesianProduct" not in tree
    assert tree.count("Window") <= 2


def test_funnel_counts_orders_strictly(spark):
    from hdk_spark.operators.temporal import funnel_counts

    df = spark.createDataFrame(
        [
            # u1 completes A→B in order
            (1, "2024-01-01 00:00:00", "A"),
            (1, "2024-01-01 01:00:00", "B"),
            # u2 has B BEFORE A only → must not count at step 2
            (2, "2024-01-01 00:00:00", "B"),
            (2, "2024-01-01 01:00:00", "A"),
            # u3 only A
            (3, "2024-01-01 00:00:00", "A"),
        ],
        "user int, ts string, ev string",
    ).selectExpr("user", "CAST(ts AS TIMESTAMP) AS ts", "ev")
    rows = {
        r["step"]: r["n_keys"]
        for r in funnel_counts(df, "user", "ts", "ev", ["A", "B"]).collect()
    }
    assert rows == {"A": 3, "B": 1}


def test_multi_grain_rollup_grains_consistent(spark):
    """Re-aggregating the hour grain by day must reproduce the day
    grain exactly (decimal sums — no float drift), and each grain's
    event total equals the corpus size."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.temporal import multi_grain_rollup

    ev = spark.table("events")
    out = multi_grain_rollup(ev, "ts", "event_type", "value").cache()
    n = ev.count()
    for g in ("hour", "day", "month"):
        tot = out.filter(F.col("grain") == g).agg(
            F.sum("n_events")).collect()[0][0]
        assert tot == n, g
    day_from_hour = (
        out.filter(F.col("grain") == "hour")
        .groupBy(F.date_trunc("day", "bucket_ts").alias("bucket_ts"),
                 "event_type")
        .agg(F.sum("n_events").alias("n_events"),
             F.round(F.sum("sum_value"), 2).alias("sum_value"))
    )
    day = out.filter(F.col("grain") == "day").select(
        "bucket_ts", "event_type", "n_events",
        F.round("sum_value", 2).alias("sum_value"))
    assert sorted(map(tuple, day_from_hour.collect())) == sorted(
        map(tuple, day.collect()))
    out.unpersist()


def test_multi_grain_rollup_single_exchange(spark):
    from hdk_spark.operators.temporal import multi_grain_rollup

    ev = spark.table("events")
    p = (
        multi_grain_rollup(ev, "ts", "event_type", "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Exchange") == 1 and "Expand" in p and "Join" not in p


def test_merge_rollups_equals_full_rollup(spark):
    """Mergeability: rollup(A) ++ rollup(B) == rollup(A ∪ B) exactly
    (counts and decimal sums are mergeable aggregates)."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.temporal import merge_rollups, multi_grain_rollup

    ev = spark.table("events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_rollups(
        multi_grain_rollup(a, "ts", "event_type", "value"),
        multi_grain_rollup(b, "ts", "event_type", "value"),
    )
    full = multi_grain_rollup(ev, "ts", "event_type", "value")
    key = ["grain", "bucket_ts", "event_type"]
    m = sorted(map(tuple, merged.select(*key, "n_events",
                                        F.round("sum_value", 2)).collect()))
    f = sorted(map(tuple, full.select(*key, "n_events",
                                      F.round("sum_value", 2)).collect()))
    assert m == f


# ---------------------------------------------------------------------------
# retention_cohorts
# ---------------------------------------------------------------------------

def test_retention_cohorts_planted_matrix(spark):
    from hdk_spark.operators.temporal import retention_cohorts

    # u1 first active day 0, returns day 1 and 3 (dup event on day 1);
    # u2 first active day 1 only; u3 first active day 3, returns day 4
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 09:00:00"),
        (1, "2024-01-02 23:00:00"), (1, "2024-01-04 01:00:00"),
        (2, "2024-01-02 12:00:00"),
        (3, "2024-01-04 12:00:00"), (3, "2024-01-05 12:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id: long, s: string").select(
        "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, grain="day").collect()
    }
    d0 = 19723  # 2024-01-01 epoch day
    assert got == {
        (d0, 0): 1, (d0, 1): 1, (d0, 3): 1,   # u1
        (d0 + 1, 0): 1,                        # u2
        (d0 + 3, 0): 1, (d0 + 3, 1): 1,        # u3
    }


def test_retention_cohorts_month_and_week_grain(spark):
    from hdk_spark.operators.temporal import retention_cohorts

    rows = [
        (1, "2024-01-15 00:00:00"), (1, "2024-03-02 00:00:00"),
        (2, "2024-03-20 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id: long, s: string").select(
        "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    m = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, grain="month").collect()
    }
    jan24 = (2024 - 1970) * 12 + 0
    assert m == {(jan24, 0): 1, (jan24, 2): 1, (jan24 + 2, 0): 1}
    w = retention_cohorts(df, grain="week").collect()
    assert sum(r["n_users"] for r in w if r["period_offset"] == 0) == 2


def test_retention_cohorts_deterministic_and_exchange_count(spark):
    import pytest
    from hdk_spark.operators.temporal import retention_cohorts

    rows = [(i % 7, f"2024-01-{(i % 27) + 1:02d} 06:00:00") for i in range(200)]
    df = spark.createDataFrame(rows, "user_id: long, s: string").select(
        "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    a = sorted(map(tuple, retention_cohorts(df, grain="day").collect()))
    b = sorted(map(tuple, retention_cohorts(df.repartition(13), grain="day").collect()))
    assert a == b
    with pytest.raises(ValueError):
        retention_cohorts(df, grain="hour")
    # plan: distinct + cohort groupBy share the user-keyed exchange
    # lineage; no force-broadcast hints anywhere
    p = retention_cohorts(df)._jdf.queryExecution().executedPlan().toString()
    assert "ResolvedHint" not in p and "CartesianProduct" not in p


def test_scd2_history_compression_and_plan(spark):
    """SCD2: consecutive duplicate attribute tuples compress away;
    NULL-safe change detection; valid_to chains to the next version's
    valid_from; open version flagged current; single Exchange (both
    windows share one partitioning+sort); attr guard."""
    import pytest

    from hdk_spark.operators.temporal import scd2_history

    rows = [
        (1, 10, "A", "x"), (1, 20, "A", "x"),
        (1, 30, "B", "x"), (1, 40, "B", "y"), (1, 50, "A", "x"),
        (2, 10, None, "z"), (2, 20, None, "z"), (2, 30, "C", "z"),
        (3, 5, "Q", None),
    ]
    df = spark.createDataFrame(rows, "k: long, ts: long, s: string, p: string")
    out = scd2_history(df, "k", "ts", ["s", "p"])
    got = sorted((r["key"], r["valid_from"], r["valid_to"],
                  r["is_current"], r["s"], r["p"]) for r in out.collect())
    assert got == [
        (1, 10, 30, False, "A", "x"), (1, 30, 40, False, "B", "x"),
        (1, 40, 50, False, "B", "y"), (1, 50, None, True, "A", "x"),
        (2, 10, 30, False, None, "z"), (2, 30, None, True, "C", "z"),
        (3, 5, None, True, "Q", None),
    ]
    # every key has exactly one current version; intervals tile
    by_key = {}
    for r in got:
        by_key.setdefault(r[0], []).append(r)
    for vs in by_key.values():
        assert sum(1 for v in vs if v[3]) == 1
        for a, b in zip(vs, vs[1:]):
            assert a[2] == b[1]

    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both
    assert final.count("Exchange hashpartitioning") == 1
    assert final.count("Sort [") == 1

    again = sorted(
        (r["key"], r["valid_from"], r["valid_to"], r["is_current"],
         r["s"], r["p"])
        for r in scd2_history(df.repartition(5), "k", "ts", ["s", "p"])
        .collect())
    assert again == got

    with pytest.raises(ValueError, match="attr_cols"):
        scd2_history(df, "k", "ts", [])
