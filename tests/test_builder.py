"""Builder-facade golden-value tests, modeled on the reference's
python/tests/test_pyhdk_api.py (the builder surface is SURVEY.md §2.11).
Each test mirrors a reference test's data + expected output.
"""

import pytest

import hdk_spark


@pytest.fixture(scope="module")
def hdk(spark):
    return hdk_spark.init(spark)


@pytest.fixture(scope="module")
def ht(hdk):
    # the reference's canonical pydict fixture (test_pyhdk_api.py:58)
    return hdk.import_pydict(
        {"id1": [1, 2, 1], "id2": [1, 1, 2], "x": [10, 20, 30], "y": [0, -10, 10]},
        "t_builder",
    )


def rows(res):
    return [tuple(r) for r in res.df.collect()]


def test_import_pydict_schema(ht):
    assert [f.name for f in ht.schema.fields] == ["id1", "id2", "x", "y"]
    assert ht.row_count == 3


def test_proj_by_name_index(ht):
    # reference test_proj (test_pyhdk_api.py:293): ht.proj("x", -1)
    res = ht.scan().proj("x", -1).run()
    assert res.df.columns == ["x", "y"]
    assert sorted(rows(res)) == [(10, 0), (20, -10), (30, 10)]


def test_proj_kwargs_expr(ht):
    n = ht.scan()
    res = n.proj(sum=n["x"] + n["y"]).run()
    assert res.df.columns == ["sum"]
    assert sorted(r[0] for r in res.df.collect()) == [10, 10, 40]


def test_proj_exprs_dict(ht):
    n = ht.scan()
    res = n.proj(exprs={"neg_x": -n["x"]}).run()
    assert sorted(r[0] for r in res.df.collect()) == [-30, -20, -10]


def test_ref_by_index(ht):
    n = ht.scan()
    res = n.proj(n.ref(0), n.ref("x"), n.ref(-1)).run()
    assert res.df.columns == ["id1", "x", "y"]


def test_agg_string_specs(ht):
    # reference test_agg: ht.agg([0, 1], "count", "sum(x)", "min(y)")
    res = ht.scan().agg([0, 1], "count", "sum(x)", "min(y)").run()
    assert res.df.columns == ["id1", "id2", "count", "x_sum", "y_min"]
    assert sorted(rows(res)) == [(1, 1, 1, 10, 0), (1, 2, 1, 30, 10), (2, 1, 1, 20, -10)]


def test_agg_kwargs_mixed(ht):
    n = ht.scan()
    res = n.agg(["id1", "id2"], cnt="count", x_sum=n["x"].sum(), y_min=n["y"].min()).run()
    assert res.df.columns == ["id1", "id2", "cnt", "x_sum", "y_min"]
    assert sorted(rows(res)) == [(1, 1, 1, 10, 0), (1, 2, 1, 30, 10), (2, 1, 1, 20, -10)]


def test_sort_tuples_and_nulls(hdk):
    # reference test_sort fixture (test_pyhdk_api.py:326)
    t = hdk.import_pydict(
        {"x": [1, 2, 1, 2, 1], "y": [1, 1, 2, None, 3], "z": [10, 20, 30, 40, 50]},
        "t_sort",
    )
    res = t.scan().sort("x", ("y", "asc", "first")).run()
    assert rows(res) == [(1, 1, 10), (1, 2, 30), (1, 3, 50), (2, None, 40), (2, 1, 20)]
    res = t.scan().sort(fields={"x": "desc", "y": ("asc", "first")}).run()
    assert rows(res) == [(2, None, 40), (2, 1, 20), (1, 1, 10), (1, 2, 30), (1, 3, 50)]
    res = t.scan().sort(x="desc", y=("desc", "last")).run()
    assert rows(res) == [(2, 1, 20), (2, None, 40), (1, 3, 50), (1, 2, 30), (1, 1, 10)]


def test_sort_limit_offset(hdk):
    t = hdk.table("t_sort")
    res = t.scan().sort("z", limit=2, offset=1).run()
    assert [r[2] for r in res.df.collect()] == [20, 30]


def test_filter_multiple_anded(hdk):
    # reference test_filter (test_pyhdk_api.py:556)
    t = hdk.import_pydict({"a": [1, 2, 3, 4, 5], "b": [5, 4, 3, 2, 1]}, "t_filter")
    n = t.scan()
    res = n.filter((n["a"] > 1).logical_and(n["b"] > 2)).run()
    assert sorted(rows(res)) == [(2, 4), (3, 3)]
    n = t.scan()
    res = n.filter(n["a"] < 4, n["b"] < 5).run()
    assert sorted(rows(res)) == [(2, 4), (3, 3)]


def test_join_implicit_common_columns(hdk):
    # reference test_join (test_pyhdk_api.py:609)
    t1 = hdk.import_pydict({"id": [1, 2, 3], "a": [10, 20, 30]}, "t_j1")
    t2 = hdk.import_pydict({"id": [1, 2, 4], "b": [111, 222, 444]}, "t_j2")
    res = t1.scan().join(t2.scan()).run()
    assert res.df.columns == ["id", "a", "b"]
    assert sorted(rows(res)) == [(1, 10, 111), (2, 20, 222)]


def test_join_how_variants(hdk):
    t1, t2 = hdk.table("t_j1"), hdk.table("t_j2")
    left = t1.scan().join(t2.scan(), how="left").run()
    assert sorted(rows(left), key=lambda r: r[0]) == [
        (1, 10, 111), (2, 20, 222), (3, 30, None)]
    semi = t1.scan().join(t2.scan(), how="semi").run()
    assert sorted(rows(semi)) == [(1, 10), (2, 20)]
    anti = t1.scan().join(t2.scan(), how="anti").run()
    assert sorted(rows(anti)) == [(3, 30)]


def test_join_explicit_cols(hdk):
    t1 = hdk.import_pydict({"k1": [1, 2, 3], "a": [10, 20, 30]}, "t_j3")
    t2 = hdk.import_pydict({"k2": [1, 2, 4], "b": [111, 222, 444]}, "t_j4")
    res = t1.scan().join(t2.scan(), "k1", "k2").run()
    assert sorted(rows(res)) == [(1, 10, 111), (2, 20, 222)]
    assert "k2" not in res.df.columns


def test_join_cond_keeps_all_columns(hdk):
    t1, t2 = hdk.table("t_j3"), hdk.table("t_j4")
    l, r = t1.scan(), t2.scan()
    res = l.join(r, cond=l["k1"] == r["k2"], how="inner").run()
    assert res.df.columns == ["k1", "a", "k2", "b"]


def test_unsupported_join_type_rejected(hdk):
    t1, t2 = hdk.table("t_j1"), hdk.table("t_j2")
    with pytest.raises(ValueError, match="unsupported join type"):
        t1.scan().join(t2.scan(), how="full")


def test_math_and_case(hdk, ht):
    n = ht.scan()
    res = n.proj(
        d=n["x"].truediv(4),
        fd=n["x"].floordiv(4),
        di=n["x"].div(4),
        m=n["x"].mod(7),
        r=hdk.if_then_else(n["y"] > 0, n["x"], n["y"]),
    ).run()
    got = sorted(rows(res))
    assert got == [
        (2.5, 2, 2, 3, 0),
        (5.0, 5, 5, 6, -10),
        (7.5, 7, 7, 2, 30),
    ]


def test_cast_and_cst(hdk, ht):
    n = ht.scan()
    res = n.proj(f=n["x"].cast("fp64"), c=hdk.cst(7), s=hdk.cst("abc")).run()
    r0 = res.df.collect()[0]
    assert isinstance(r0["f"], float) and r0["c"] == 7 and r0["s"] == "abc"


def test_extract_and_date_literals(hdk):
    t = hdk.import_pydict({"d": ["2001-02-03 15:30:45"]}, "t_dates")
    n = t.scan()
    ts = n["d"].cast("timestamp")
    res = n.proj(
        y=ts.extract("year"), mo=ts.extract("month"), h=ts.extract("hour")
    ).run()
    assert rows(res) == [(2001, 2, 15)]


def test_date_add_builder(hdk):
    t = hdk.table("t_dates")
    n = t.scan()
    ts = n["d"].cast("timestamp")
    res = n.proj(plus=ts.add(3, "day"), minus=ts.sub(1, "month")).run()
    r = res.df.collect()[0]
    assert str(r["plus"]).startswith("2001-02-06")
    assert str(r["minus"]).startswith("2001-01-03")


def test_at_is_one_based_and_cardinality(hdk, spark):
    # reference test_at (test_pyhdk_api.py:927): arr[1] is first element
    df = spark.createDataFrame([([10, 20, 30],)], "arr array<int>")
    n = hdk.from_df(df)
    res = n.proj(first=n["arr"].at(1), third=n["arr"][3], n=n["arr"].cardinality()).run()
    assert rows(res) == [(10, 30, 3)]


def test_unnest_builder(hdk, spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, [30])], "id int, arr array<int>")
    n = hdk.from_df(df)
    res = n.proj("id", v=n["arr"].unnest()).run()
    assert sorted(rows(res)) == [(1, 10), (1, 20), (2, 30)]


def test_window_count_over(hdk):
    # reference test_over_order_by / over() (hdk.py:1456 example)
    t = hdk.import_pydict({"a": [1, 2, 1, 2, 1]}, "t_win")
    n = t.scan()
    res = n.proj("a", hdk.count().over(n.ref("a"))).run()
    assert sorted(rows(res)) == [(1, 3), (1, 3), (1, 3), (2, 2), (2, 2)]


def test_window_percent_rank_order_by(hdk):
    # reference order_by() docstring example (hdk.py:1488)
    t = hdk.import_pydict({"a": [4, 2, 1, 3, 5]}, "t_win2")
    n = t.scan()
    res = n.proj("a", hdk.percent_rank().order_by(n.ref("a"))).run()
    assert sorted(rows(res)) == [(1, 0.0), (2, 0.25), (3, 0.5), (4, 0.75), (5, 1.0)]


def test_window_ranking_suite(hdk):
    t = hdk.import_pydict({"g": [1, 1, 1, 2, 2], "v": [10, 20, 20, 5, 7]}, "t_win3")
    n = t.scan()
    res = n.proj(
        "g", "v",
        rn=hdk.row_number().over(n["g"]).order_by(n["v"], n["v"]),
        rk=hdk.rank().over(n["g"]).order_by(n["v"]),
        dr=hdk.dense_rank().over(n["g"]).order_by(n["v"]),
        nt=hdk.ntile(2).over(n["g"]).order_by(n["v"]),
    ).run()
    by_gv = sorted(rows(res))
    assert by_gv == [
        (1, 10, 1, 1, 1, 1),
        (1, 20, 2, 2, 2, 1),
        (1, 20, 3, 2, 2, 2),
        (2, 5, 1, 1, 1, 1),
        (2, 7, 2, 2, 2, 2),
    ]


def test_window_lag_lead_running(hdk):
    t = hdk.import_pydict({"g": [1, 1, 1], "v": [3, 1, 2]}, "t_win4")
    n = t.scan()
    res = (
        n.proj(
            "v",
            prev=n["v"].lag().over(n["g"]).order_by(n["v"]),
            nxt=n["v"].lead().over(n["g"]).order_by(n["v"]),
            run=n["v"].sum().over(n["g"]).order_by(n["v"]),
            fv=n["v"].first_value().over(n["g"]).order_by(n["v"]),
        )
        .sort("v")
        .run()
    )
    assert rows(res) == [
        (1, None, 2, 1, 1),
        (2, 1, 3, 3, 1),
        (3, 2, None, 6, 1),
    ]


def test_agg_quantile_topk_through_builder(hdk):
    t = hdk.import_pydict({"g": [1, 1, 1, 1], "v": [4.0, 1.0, 3.0, 2.0]}, "t_q")
    n = t.scan()
    res = n.agg(
        ["g"],
        med=n["v"].quantile(0.5, "linear"),
        top2=n["v"].top_k(2),
        bot2=n["v"].bottom_k(2),
        sv=n["g"].single_value(),
    ).run()
    r = res.df.collect()[0]
    assert r["med"] == 2.5 and r["top2"] == [4.0, 3.0] and r["bot2"] == [1.0, 2.0]
    assert r["sv"] == 1


def test_run_on_result(hdk, ht):
    # reference test_run_on_res (test_pyhdk_api.py:953)
    res = ht.scan().agg(["id1"], "sum(x)").run()
    res2 = res.scan.filter(res.scan["x_sum"] > 20).run()
    assert sorted(rows(res2)) == [(1, 40)]


def test_head_tail(hdk, ht):
    res = ht.scan().sort("x").run()
    assert [r["x"] for r in res.head(2).df.collect()] == [10, 20]
    assert [r["x"] for r in res.tail(2).df.collect()] == [20, 30]


def test_bitwise_builder(hdk):
    t = hdk.import_pydict({"a": [5, 12]}, "t_bw")
    n = t.scan()
    res = n.proj(
        ba=n["a"].bw_and(6), bo=n["a"].bw_or(6), bx=n["a"].bw_xor(6), bn=n["a"].bw_not()
    ).run()
    assert sorted(rows(res)) == [(4, 7, 3, -6), (4, 14, 10, -13)]


def test_refragmented_view(hdk, ht):
    n = ht.scan().refragmented_view(1, "t_refrag")
    assert n.df.count() == 3
    assert n.df.rdd.getNumPartitions() >= 1


def test_size_and_column_info(ht):
    n = ht.scan()
    assert n.size == 4
    assert n.column_info("x").name == "x"
    assert n.column_info(0).name == "id1"


def test_create_and_drop_table(hdk):
    t = hdk.create_table("t_created", [("a", "int64"), ("b", "text")])
    assert t.row_count == 0
    assert [f.name for f in t.schema.fields] == ["a", "b"]
    hdk.drop_table("t_created")


def test_type_from_str(hdk):
    from pyspark.sql import types as T

    assert hdk.type("int64") == T.LongType()
    assert hdk.type("dec(10,2)") == T.DecimalType(10, 2)
    assert hdk.type("array(fp32)") == T.ArrayType(T.FloatType())
    assert hdk.type("timestamp[ns]") == T.TimestampType()
