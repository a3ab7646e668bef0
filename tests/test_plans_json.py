"""Raw RA-plan entry point tests — the Spark analog of the reference's
Calcite-JSON executor tests (reference python/tests/
test_pyhdk_calcite_json.py, omniscidb/Tests/NoCatalogRelAlgTest.cpp).
The first test replays the reference fixture's plan shape (scan →
filter a>1 AND a<3 → project literal → COUNT(*)) and expects its
golden answer (1 row counted) on the same {a:[1,2,3], b:[10,20,30]}
table."""

import pytest

from hdk_spark.plans import execute_plan


@pytest.fixture(scope="module")
def test_table(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "a int, b int")
    return {"test": df}


def _dec(v):
    return {
        "literal": v,
        "type": "DECIMAL",
        "target_type": "INTEGER",
        "scale": 0,
        "precision": 1,
        "type_scale": 0,
        "type_precision": 10,
    }


def test_reference_filter_count_fixture(spark, test_table):
    """Replays the reference's test_filter_json plan; golden = 1."""
    plan = {
        "rels": [
            {
                "id": "0",
                "relOp": "LogicalTableScan",
                "fieldNames": ["a", "b", "rowid"],
                "table": ["test-db", "test"],
                "inputs": [],
            },
            {
                "id": "1",
                "relOp": "LogicalFilter",
                "condition": {
                    "op": "AND",
                    "operands": [
                        {"op": ">", "operands": [{"input": 0}, _dec(1)]},
                        {"op": "<", "operands": [{"input": 0}, _dec(3)]},
                    ],
                },
            },
            {
                "id": "2",
                "relOp": "LogicalProject",
                "fields": ["$f0"],
                "exprs": [_dec(0)],
            },
            {
                "id": "3",
                "relOp": "LogicalAggregate",
                "fields": ["EXPR$0"],
                "group": [],
                "aggs": [
                    {"agg": "COUNT", "distinct": False, "operands": []}
                ],
            },
        ]
    }
    df = execute_plan(spark, plan, tables=test_table)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["EXPR$0"] == 1


def test_project_arithmetic_and_case(spark, test_table):
    plan = {
        "rels": [
            {
                "relOp": "LogicalTableScan",
                "fieldNames": ["a", "b"],
                "table": ["db", "test"],
                "inputs": [],
            },
            {
                "relOp": "LogicalProject",
                "fields": ["total", "bucket"],
                "exprs": [
                    {"op": "+", "operands": [{"input": 0}, {"input": 1}]},
                    {
                        "op": "CASE",
                        "operands": [
                            {"op": ">", "operands": [{"input": 1}, _dec(15)]},
                            {"literal": "big", "type": "CHAR", "target_type": "VARCHAR"},
                            {"literal": "small", "type": "CHAR", "target_type": "VARCHAR"},
                        ],
                    },
                ],
            },
        ]
    }
    got = {(r["total"], r["bucket"]) for r in execute_plan(spark, plan, tables=test_table).collect()}
    assert got == {(11, "small"), (22, "big"), (33, "big")}


def test_aggregate_group_and_sum(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 5)], "k string, v int"
    )
    plan = {
        "rels": [
            {"relOp": "LogicalTableScan", "fieldNames": ["k", "v"],
             "table": ["db", "t"], "inputs": []},
            {"relOp": "LogicalAggregate", "fields": ["k", "s", "n"],
             "group": [0],
             "aggs": [
                 {"agg": "SUM", "distinct": False, "operands": [1]},
                 {"agg": "COUNT", "distinct": False, "operands": []},
             ]},
        ]
    }
    got = {(r["k"], r["s"], r["n"])
           for r in execute_plan(spark, plan, tables={"t": df}).collect()}
    assert got == {("x", 3, 2), ("y", 5, 1)}


def test_join_and_sort_with_fetch(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, s string")
    right = spark.createDataFrame([(1, 100), (2, 200), (4, 400)], "fk int, v int")
    plan = {
        "rels": [
            {"id": "0", "relOp": "LogicalTableScan", "fieldNames": ["id", "s"],
             "table": ["db", "l"], "inputs": []},
            {"id": "1", "relOp": "LogicalTableScan", "fieldNames": ["fk", "v"],
             "table": ["db", "r"], "inputs": []},
            {"id": "2", "relOp": "LogicalJoin", "joinType": "inner",
             "inputs": ["0", "1"],
             # positional refs: 0,1 = left(id,s); 2,3 = right(fk,v)
             "condition": {"op": "=", "operands": [{"input": 0}, {"input": 2}]}},
            {"id": "3", "relOp": "LogicalProject", "fields": ["s", "v"],
             "exprs": [{"input": 1}, {"input": 3}]},
            {"id": "4", "relOp": "LogicalSort",
             "collation": [{"field": 1, "direction": "DESCENDING", "nulls": "LAST"}],
             "fetch": 1},
        ]
    }
    got = execute_plan(spark, plan, tables={"l": left, "r": right}).collect()
    assert [(r["s"], r["v"]) for r in got] == [("b", 200)]


def test_union_values_distinct(spark):
    plan = {
        "rels": [
            {"id": "0", "relOp": "LogicalValues", "fields": ["x"],
             "tuples": [[_dec(1)], [_dec(2)]]},
            {"id": "1", "relOp": "LogicalValues", "fields": ["x"],
             "tuples": [[_dec(2)], [_dec(3)]]},
            {"id": "2", "relOp": "LogicalUnion", "all": False,
             "inputs": ["0", "1"]},
        ]
    }
    got = sorted(r["x"] for r in execute_plan(spark, plan).collect())
    assert got == [1, 2, 3]


def test_catalyst_optimizes_interpreted_plan(spark, test_table):
    """The interpreter emits a declarative plan — Catalyst must still
    push the filter into the scan-side projection (no black-box
    barrier)."""
    plan = {
        "rels": [
            {"relOp": "LogicalTableScan", "fieldNames": ["a", "b"],
             "table": ["db", "test"], "inputs": []},
            {"relOp": "LogicalFilter",
             "condition": {"op": ">", "operands": [{"input": 0}, _dec(1)]}},
            {"relOp": "LogicalProject", "fields": ["b"], "exprs": [{"input": 1}]},
        ]
    }
    df = execute_plan(spark, plan, tables=test_table)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in physical  # planned as a native Spark filter
    assert [r["b"] for r in sorted(df.collect(), key=lambda r: r["b"])] == [20, 30]


def test_facade_execute_ra(spark):
    import hdk_spark as hdk

    eng = hdk.HDK(spark)
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "a int, b int")
    res = eng.execute_ra(
        {
            "rels": [
                {"relOp": "LogicalTableScan", "fieldNames": ["a", "b"],
                 "table": ["db", "test"], "inputs": []},
                {"relOp": "LogicalFilter",
                 "condition": {"op": ">", "operands": [{"input": 0}, _dec(1)]}},
            ]
        },
        test=df,
    )
    assert res.to_pandas()["a"].tolist() == [2, 3]
