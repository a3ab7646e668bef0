"""Randomized differential testing: generate SQL from a constrained
grammar (filters, group-bys, exact aggregates, sorts — arithmetic kept
engine-deterministic), run the SAME text on Spark and DuckDB, and
require identical results. This is the generative extension of the
reference's SQLite-comparator strategy (reference
Tests/ArrowSQLRunner/SQLiteComparator.h) that its fixed corpus lacks.
"""

import os
import pathlib

# Default example budget (VERDICT r14 #1 — the driver's verify budget):
# every grammar keeps its authored example count under HDK_FULL_FUZZ=1
# (run at least once per round; this round's full-count run is recorded
# in OPTIMIZATION_r15.md), but the default suite caps each test at 8
# examples so the whole tests/ run fits the external verify window.
_FULL_FUZZ = os.environ.get("HDK_FULL_FUZZ") == "1"


def _ex(n: int) -> int:
    return n if _FULL_FUZZ else min(n, 8)


import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import SF_CORRECT
from tests.oracle_compare import assert_frames_match, normalize

# deterministic building blocks over lineitem (driver schema has 11
# cols — no l_shipmode/l_comment/l_*date beyond l_shipdate)
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
KEY_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
# l_quantity is integral-valued double → SUM/MIN/MAX exact in fp64
NUM_COLS = ["l_quantity"]

preds = st.one_of(
    st.tuples(st.sampled_from(INT_COLS), st.sampled_from(["<", "<=", ">", ">=", "="]),
              st.integers(min_value=0, max_value=5000)).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    ),
    st.tuples(st.sampled_from(["l_returnflag"]), st.sampled_from(["'A'", "'N'", "'R'"])).map(
        lambda t: f"{t[0]} = {t[1]}"
    ),
    st.tuples(st.sampled_from(INT_COLS), st.integers(min_value=2, max_value=9),
              st.integers(min_value=0, max_value=8)).map(
        lambda t: f"{t[0]} % {t[1]} = {t[2]}"
    ),
    st.sampled_from([
        "l_quantity BETWEEN 10 AND 40",
        "l_linestatus IN ('O', 'F')",
        "l_shipdate < TIMESTAMP '1997-06-01 00:00:00'",
        "l_discount IS NOT NULL",
    ]),
)

aggs = st.lists(
    st.one_of(
        st.just("COUNT(*)"),
        # SUM over ints: DuckDB types it HUGEINT (→ float64 in pandas)
        # while Spark keeps BIGINT — apply the contract determinism
        # rule (CAST AS BIGINT) so value hashes agree cross-engine
        st.sampled_from(INT_COLS).map(lambda c: f"CAST(SUM({c}) AS BIGINT)"),
        st.sampled_from(NUM_COLS).map(lambda c: f"SUM({c})"),
        st.sampled_from(INT_COLS + NUM_COLS).map(lambda c: f"MIN({c})"),
        st.sampled_from(INT_COLS + NUM_COLS).map(lambda c: f"MAX({c})"),
        st.sampled_from(INT_COLS).map(lambda c: f"COUNT(DISTINCT {c})"),
    ),
    min_size=1,
    max_size=4,
    unique=True,
)


@st.composite
def queries(draw):
    where = draw(st.lists(preds, min_size=0, max_size=3))
    keys = draw(st.lists(st.sampled_from(KEY_COLS), min_size=0, max_size=2, unique=True))
    ags = draw(aggs)
    sel = list(keys) + [f"{a} AS c{i}" for i, a in enumerate(ags)]
    sql = f"SELECT {', '.join(sel)} FROM lineitem"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
        sql += " ORDER BY " + ", ".join(keys)
    return sql


@given(sql=queries())
@settings(
    max_examples=_ex(25),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_agg_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# window-function + set-operation grammars (round 2: the shapes the agg
# grammar above cannot reach)
# ---------------------------------------------------------------------------

WIN_FUNCS = [
    "ROW_NUMBER()",
    "RANK()",
    "DENSE_RANK()",
    "COUNT(*)",
    "SUM(l_quantity)",
    "MIN(l_linenumber)",
    "MAX(l_orderkey)",
]


@st.composite
def window_queries(draw):
    fn = draw(st.sampled_from(WIN_FUNCS))
    part = draw(st.sampled_from(KEY_COLS))
    where = draw(st.lists(preds, min_size=1, max_size=2))
    # full deterministic order inside the window: unique tie-break keys
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"{fn} OVER (PARTITION BY {part} ORDER BY l_orderkey, l_linenumber) AS w "
        f"FROM lineitem WHERE " + " AND ".join(where)
    )
    return sql


@given(sql=window_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_window_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


@st.composite
def setop_queries(draw):
    op = draw(st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
    pa = draw(preds)
    pb = draw(preds)
    cols = draw(st.lists(st.sampled_from(KEY_COLS + INT_COLS), min_size=1,
                         max_size=2, unique=True))
    c = ", ".join(cols)
    return (
        f"SELECT {c} FROM lineitem WHERE {pa} {op} "
        f"SELECT {c} FROM lineitem WHERE {pb}"
    )


@given(sql=setop_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_setop_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# date/time grammar (round 3: the NTZ-timestamp regression class — random
# EXTRACT fields, date_trunc units, and interval arithmetic over events.ts,
# identical SQL text on both engines)
# ---------------------------------------------------------------------------

# fields/units verified semantics-identical Spark vs DuckDB in shared
# SQL text (ISO weeks). Day-of-week fields are EXCLUDED — both caught
# by this fuzzer on first run: Spark's EXTRACT(DOW) is Sunday=1
# (DAYOFWEEK) vs DuckDB's Sunday=0, and the ISO form has different
# names (Spark DOW_ISO vs DuckDB ISODOW), so no shared text exists; the
# contract surface maps both explicitly (functions/scalar.py extract
# 'dayofweek'/'isodayofweek', value-checked by date_extract_fields).
EXTRACT_FIELDS = ["YEAR", "QUARTER", "MONTH", "DAY", "HOUR", "MINUTE",
                  "DOY", "WEEK"]
TRUNC_UNITS = ["year", "quarter", "month", "week", "day", "hour", "minute"]
IVL_UNITS = ["DAY", "HOUR", "MINUTE", "MONTH"]

date_exprs = st.one_of(
    st.sampled_from(EXTRACT_FIELDS).map(
        lambda f: f"CAST(EXTRACT({f} FROM ts) AS BIGINT)"
    ),
    st.sampled_from(TRUNC_UNITS).map(lambda u: f"date_trunc('{u}', ts)"),
    st.tuples(st.integers(min_value=1, max_value=30),
              st.sampled_from(IVL_UNITS)).map(
        lambda t: f"ts + INTERVAL {t[0]} {t[1]}"
    ),
)


# DuckDB 1.0.0 footgun (judge-found, round 5): interval COMPARISON
# normalizes 1 MONTH = 30 DAY, 1 DAY = 24 HOUR, 1 HOUR = 60 MINUTE, and
# DuckDB's common-subexpression elimination then collapses two DIFFERENT
# interval additions whose intervals compare equal into ONE expression —
# `SELECT ts + INTERVAL 1 MONTH, ts + INTERVAL 30 DAY` returns the
# month-add for BOTH columns (PRAGMA disable_optimizer yields correct
# answers, proving it's the oracle's optimizer). Spark is correct. The
# grammar must never emit two interval-adds with colliding normalized
# durations in one SELECT; see test_duckdb_interval_cse_regression for
# the pinned falsifying example.
_IVL_NORM_MINUTES = {"MINUTE": 1, "HOUR": 60, "DAY": 24 * 60,
                     "MONTH": 30 * 24 * 60}


def _interval_adds_collide(exprs: list[str]) -> bool:
    import re

    seen: set[int] = set()
    for e in exprs:
        m = re.fullmatch(r"ts \+ INTERVAL (\d+) (\w+)", e)
        if not m:
            continue
        norm = int(m.group(1)) * _IVL_NORM_MINUTES[m.group(2)]
        if norm in seen:
            return True
        seen.add(norm)
    return False


@st.composite
def date_queries(draw):
    exprs = draw(
        st.lists(date_exprs, min_size=1, max_size=3, unique=True).filter(
            lambda es: not _interval_adds_collide(es)
        )
    )
    hi = draw(st.integers(min_value=50, max_value=400))
    sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    return (
        f"SELECT event_id, {sel} FROM events "
        f"WHERE event_id < {hi} ORDER BY event_id"
    )


@given(sql=date_queries())
@settings(
    max_examples=_ex(20),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_date_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


def test_interval_collision_filter():
    # the three normalized-equal pairs DuckDB 1.0.0 CSE-collapses
    assert _interval_adds_collide(
        ["ts + INTERVAL 1 MONTH", "ts + INTERVAL 30 DAY"])
    assert _interval_adds_collide(
        ["ts + INTERVAL 1 DAY", "ts + INTERVAL 24 HOUR"])
    assert _interval_adds_collide(
        ["ts + INTERVAL 2 HOUR", "ts + INTERVAL 120 MINUTE"])
    assert not _interval_adds_collide(
        ["ts + INTERVAL 1 MONTH", "ts + INTERVAL 29 DAY",
         "CAST(EXTRACT(YEAR FROM ts) AS BIGINT)"])


def test_duckdb_interval_cse_regression(spark, duck):
    """Pinned judge falsifying example (round 5): two interval-adds whose
    intervals compare equal in DuckDB 1.0.0 (1 MONTH = 30 DAY under its
    month=30d normalization) get CSE-collapsed by the ORACLE into one
    expression — DuckDB returns Feb 1 for both columns where +30 DAY on a
    Jan 1 timestamp must stay Jan 31. Spark computes both correctly.

    Assert Spark's answer against per-expression (single-select, hence
    CSE-immune) DuckDB oracles instead of the combined SELECT.
    """
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    combined = (
        "SELECT event_id, ts + INTERVAL 1 MONTH AS c0, "
        "ts + INTERVAL 30 DAY AS c1 FROM events "
        "WHERE event_id < 60 ORDER BY event_id"
    )
    spark_pdf = normalize(spark.sql(combined).toPandas())
    o0 = duck.sql(
        "SELECT event_id, ts + INTERVAL 1 MONTH AS c0 FROM events "
        "WHERE event_id < 60 ORDER BY event_id").df()
    o1 = duck.sql(
        "SELECT event_id, ts + INTERVAL 30 DAY AS c1 FROM events "
        "WHERE event_id < 60 ORDER BY event_id").df()
    oracle_pdf = normalize(o0.merge(o1, on="event_id"))
    pd.testing.assert_frame_equal(spark_pdf, oracle_pdf, check_dtype=False)
    # the two columns must actually differ somewhere, otherwise this
    # regression test would pass vacuously even under CSE collapse
    assert (spark_pdf["c0"] != spark_pdf["c1"]).any()


# ---------------------------------------------------------------------------
# string grammar (round 4: the §2.8 string surface — random compositions
# of LOWER/UPPER/TRIM/SUBSTRING/REPLACE/REVERSE/LPAD/||/LENGTH over part
# columns, identical SQL text on both engines; binary collation on both
# sides makes string comparisons portable)
# ---------------------------------------------------------------------------

STR_COLS = ["p_name", "p_brand", "p_type"]

str_exprs = st.one_of(
    st.sampled_from(STR_COLS).map(lambda c: f"LOWER({c})"),
    st.sampled_from(STR_COLS).map(lambda c: f"UPPER({c})"),
    st.sampled_from(STR_COLS).map(lambda c: f"TRIM({c})"),
    st.sampled_from(STR_COLS).map(lambda c: f"REVERSE({c})"),
    st.sampled_from(STR_COLS).map(lambda c: f"CAST(LENGTH({c}) AS BIGINT)"),
    st.tuples(st.sampled_from(STR_COLS),
              st.integers(min_value=1, max_value=6),
              st.integers(min_value=0, max_value=8)).map(
        lambda t: f"SUBSTRING({t[0]}, {t[1]}, {t[2]})"
    ),
    st.tuples(st.sampled_from(STR_COLS),
              st.sampled_from(["a", "e", "o", "an", "ol"]),
              st.sampled_from(["_", "X", ""])).map(
        lambda t: f"REPLACE({t[0]}, '{t[1]}', '{t[2]}')"
    ),
    st.tuples(st.sampled_from(STR_COLS),
              st.integers(min_value=3, max_value=12),
              st.sampled_from(["x", "-"])).map(
        lambda t: f"LPAD({t[0]}, {t[1]}, '{t[2]}')"
    ),
    st.tuples(st.sampled_from(STR_COLS), st.sampled_from(STR_COLS)).map(
        lambda t: f"{t[0]} || '_' || {t[1]}"
    ),
)

str_preds = st.one_of(
    st.tuples(st.sampled_from(STR_COLS),
              st.sampled_from(["%a%", "%ol%", "s%", "%d", "%an%"])).map(
        lambda t: f"{t[0]} LIKE '{t[1]}'"
    ),
    st.tuples(st.sampled_from(STR_COLS),
              st.integers(min_value=5, max_value=30)).map(
        lambda t: f"LENGTH({t[0]}) > {t[1]}"
    ),
    st.tuples(st.sampled_from(STR_COLS),
              st.sampled_from(["'m'", "'c'", "'t'"])).map(
        lambda t: f"LOWER({t[0]}) < {t[1]}"
    ),
)


@st.composite
def str_queries(draw):
    exprs = draw(st.lists(str_exprs, min_size=1, max_size=4, unique=True))
    where = draw(st.lists(str_preds, min_size=0, max_size=2))
    sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    sql = f"SELECT p_partkey, {sel} FROM part"
    if where:
        sql += " WHERE " + " AND ".join(where)
    return sql + " ORDER BY p_partkey LIMIT 500"


@given(sql=str_queries())
@settings(
    max_examples=_ex(25),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_string_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# join + subquery grammar (round 4: the decorrelation surface — random
# two-table equi-joins with INNER/LEFT shapes, IN / NOT IN / EXISTS /
# NOT EXISTS membership subqueries, identical SQL text on both engines;
# every aggregate follows the cross-engine typing rules above)
# ---------------------------------------------------------------------------

# (left, right, join condition, left preds, right preds, left group key)
JOIN_SHAPES = [
    ("orders", "lineitem", "o_orderkey = l_orderkey",
     ["o_totalprice > 100000", "o_orderstatus = 'F'",
      "o_custkey % 7 = 3"],
     ["l_quantity < 25", "l_returnflag = 'R'", "l_linenumber <= 3"],
     "o_orderpriority"),
    ("customer", "orders", "c_custkey = o_custkey",
     ["c_acctbal > 0", "c_nationkey < 12"],
     ["o_totalprice < 150000", "o_orderpriority = '1-URGENT'"],
     "c_mktsegment"),
    ("part", "lineitem", "p_partkey = l_partkey",
     ["p_size IN (1, 5, 9)", "p_retailprice > 1200"],
     ["l_discount >= 0.05", "l_suppkey % 5 = 0"],
     "p_brand"),
]


@st.composite
def join_queries(draw):
    left, right, cond, lpreds, rpreds, key = draw(
        st.sampled_from(JOIN_SHAPES)
    )
    how = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    wl = draw(st.lists(st.sampled_from(lpreds), min_size=0, max_size=2,
                       unique=True))
    # right-side predicates go in ON for LEFT joins (WHERE would turn
    # the join back into INNER — grammar keeps the shapes distinct)
    wr = draw(st.lists(st.sampled_from(rpreds), min_size=0, max_size=1,
                       unique=True))
    on = " AND ".join([cond] + wr)
    right_probe = {"lineitem": "l_orderkey", "orders": "o_orderkey"}.get(
        right, "l_partkey"
    )
    sel = (
        f"SELECT {key}, COUNT(*) AS n, "
        f"COUNT({right_probe}) AS n_matched, "
        f"CAST(SUM(CASE WHEN {right_probe} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched "
        f"FROM {left} {how} {right} ON {on}"
    )
    if wl:
        sel += " WHERE " + " AND ".join(wl)
    sel += f" GROUP BY {key} ORDER BY {key}"
    return sel


@given(sql=join_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_join_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


@st.composite
def subquery_queries(draw):
    form = draw(st.sampled_from(["IN", "NOT IN", "EXISTS", "NOT EXISTS"]))
    outer_pred = draw(st.sampled_from(
        ["o_totalprice > 50000", "o_orderstatus = 'O'", "o_custkey % 3 = 1"]
    ))
    inner_pred = draw(st.sampled_from(
        ["l_quantity > 30", "l_returnflag = 'A'", "l_discount < 0.03",
         "l_linenumber = 1"]
    ))
    if form in ("IN", "NOT IN"):
        member = (
            f"o_orderkey {form} "
            f"(SELECT l_orderkey FROM lineitem WHERE {inner_pred})"
        )
    else:
        member = (
            f"{form} (SELECT 1 FROM lineitem "
            f"WHERE l_orderkey = o_orderkey AND {inner_pred})"
        )
    return (
        f"SELECT o_orderpriority, COUNT(*) AS n, "
        f"CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        f"FROM orders WHERE {outer_pred} AND {member} "
        f"GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )


@given(sql=subquery_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_subquery_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# grouping-sets / rollup / cube grammar (round 5: the multi-grain
# shapes — beyond the reference's rejected GROUP BY extensions — that
# the flat agg grammar cannot reach; NULL grouping keys exercise the
# comparator's null normalization)
# ---------------------------------------------------------------------------


@st.composite
def grouping_queries(draw):
    keys = draw(
        st.lists(st.sampled_from(KEY_COLS), min_size=2, max_size=3,
                 unique=True)
    )
    form = draw(st.sampled_from(["ROLLUP", "CUBE", "SETS"]))
    agg = draw(st.sampled_from(
        ["COUNT(*)", "CAST(SUM(l_orderkey) AS BIGINT)", "SUM(l_quantity)",
         "MIN(l_linenumber)"]
    ))
    where = draw(st.lists(preds, min_size=0, max_size=2))
    having = draw(st.sampled_from([None, "COUNT(*) > 5"]))
    kl = ", ".join(keys)
    if form == "SETS":
        # the full ladder plus the grand total
        sets = ", ".join(f"({k})" for k in keys)
        group = f"GROUPING SETS ({sets}, ({kl}), ())"
    else:
        group = f"{form}({kl})"
    sql = f"SELECT {kl}, {agg} AS a0 FROM lineitem"
    if where:
        sql += " WHERE " + " AND ".join(where)
    sql += f" GROUP BY {group}"
    # documented engine divergence (not an hdk_spark bug): over EMPTY
    # input Spark's grouping sets emit zero rows while DuckDB emits the
    # SQL-standard grand-total row (NULL..., 0) — fence it out so the
    # fuzz compares the shared semantics
    sql += " HAVING COUNT(*) > 0"
    if having:
        sql += f" AND {having}"
    return sql


@given(sql=grouping_queries())
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_grouping_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# window-function grammar (round 6: §2.6's ranking/analytic/running
# surface — the rows with the oldest driver evidence — under random
# composition; identical SQL text on both engines)
# ---------------------------------------------------------------------------
#
# Determinism rules baked into the grammar:
# - the window ORDER BY always ends in the unique event_id, so frame
#   contents (and thus every running/navigation result) are total-order
#   deterministic on both engines;
# - running SUM aggregates only BIGINT expressions (DuckDB evaluates
#   window sums with a segment tree, so float accumulation ASSOCIATION
#   differs from Spark's sequential fold — integer sums are exact under
#   any association); MIN/MAX over doubles are selection, not
#   accumulation, and stay portable.

WIN_PARTS = ["event_type", "user_id % 7", "user_id % 3"]

win_funcs = st.one_of(
    st.just("CAST(ROW_NUMBER() OVER w AS BIGINT)"),
    st.just("CAST(RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT)"),
    st.just("CAST(DENSE_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT)"),
    st.integers(min_value=2, max_value=7).map(
        lambda k: f"CAST(NTILE({k}) OVER w AS BIGINT)"
    ),
    st.integers(min_value=1, max_value=3).map(
        lambda n: f"LAG(event_id, {n}) OVER w"
    ),
    st.integers(min_value=1, max_value=3).map(
        lambda n: f"LEAD(event_id, {n}, -1) OVER w"
    ),
    st.just("CAST(SUM(user_id) OVER w AS BIGINT)"),
    st.just("CAST(COUNT(*) OVER w AS BIGINT)"),
    st.just("MIN(value) OVER w"),
    st.just("MAX(value) OVER w"),
    st.just("FIRST_VALUE(event_id) OVER w"),
    st.just(
        "CAST(SUM(user_id) OVER (PARTITION BY event_type ORDER BY ts, "
        "event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)"
    ),
)


@st.composite
def window_events_queries(draw):
    exprs = draw(st.lists(win_funcs, min_size=1, max_size=3, unique=True))
    part = draw(st.sampled_from(WIN_PARTS))
    hi = draw(st.integers(min_value=100, max_value=600))
    sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    return (
        f"SELECT event_id, {sel} FROM events "
        f"WHERE event_id < {hi} "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY ts, event_id) "
        f"ORDER BY event_id"
    )


@given(sql=window_events_queries())
@settings(
    max_examples=_ex(20),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_window_events_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# join grammar (round 6: random FK join chains + exact aggregates —
# the multi-table shapes the single-table agg grammar cannot reach;
# identical SQL text on both engines, BIGINT-exact aggregates only)
# ---------------------------------------------------------------------------

_JOIN_CHAINS = [
    ("lineitem JOIN orders ON l_orderkey = o_orderkey",
     ["l_returnflag", "o_orderstatus"]),
    ("lineitem JOIN orders ON l_orderkey = o_orderkey "
     "JOIN customer ON o_custkey = c_custkey",
     ["l_returnflag", "o_orderstatus", "c_mktsegment"]),
    ("lineitem JOIN part ON l_partkey = p_partkey",
     ["l_linestatus", "p_brand"]),
    ("lineitem JOIN supplier ON l_suppkey = s_suppkey",
     ["l_returnflag"]),
    ("orders JOIN customer ON o_custkey = c_custkey",
     ["o_orderstatus", "c_mktsegment"]),
]

_JOIN_AGGS = [
    "COUNT(*)",
    "CAST(SUM(l_orderkey) AS BIGINT)",
    "COUNT(DISTINCT l_orderkey)",
    "MIN(l_orderkey)",
    "MAX(l_orderkey)",
]
_JOIN_AGGS_NO_L = [
    "COUNT(*)",
    "CAST(SUM(o_orderkey) AS BIGINT)",
    "COUNT(DISTINCT o_custkey)",
    "MIN(o_orderkey)",
    "MAX(o_orderkey)",
]


@st.composite
def fk_join_queries(draw):
    chain, keys = draw(st.sampled_from(_JOIN_CHAINS))
    has_l = chain.startswith("lineitem")
    ags = draw(
        st.lists(
            st.sampled_from(_JOIN_AGGS if has_l else _JOIN_AGGS_NO_L),
            min_size=1, max_size=3, unique=True,
        )
    )
    gkeys = draw(st.lists(st.sampled_from(keys), min_size=0, max_size=2,
                          unique=True))
    where = []
    if has_l:
        where = draw(st.lists(preds, min_size=0, max_size=2))
    sel = list(gkeys) + [f"{a} AS c{i}" for i, a in enumerate(ags)]
    sql = f"SELECT {', '.join(sel)} FROM {chain}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if gkeys:
        sql += " GROUP BY " + ", ".join(gkeys)
        sql += " ORDER BY " + ", ".join(gkeys)
    return sql


@given(sql=fk_join_queries())
@settings(
    max_examples=_ex(20),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_fk_join_query_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


def test_no_shadowed_top_level_defs():
    """Guard against a module-scope name collision silently killing a test.

    Round 6 regression: a new FK-join grammar re-defined ``join_queries`` /
    ``test_random_join_query_matches_duckdb`` at module scope; Python keeps
    the LAST definition, so the round-4 LEFT-JOIN/null-probe grammar was no
    longer collected by pytest at all while the suite stayed "green".  This
    test parses the module source and fails on ANY duplicated top-level
    function name, so future shadowing fails loudly instead of silently.
    """
    import ast
    import collections

    all_dupes = {}
    for path in sorted(pathlib.Path(__file__).parent.glob("test_*.py")):
        src = path.read_text()
        names = [n.name for n in ast.parse(src).body
                 if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
        dupes = [n for n, c in collections.Counter(names).items() if c > 1]
        if dupes:
            all_dupes[path.name] = dupes
    assert not all_dupes, f"shadowed top-level defs: {all_dupes}"


# ---------------------------------------------------------------------------
# scalar-projection grammar (round 10): CASE/string/conditional scalar
# expressions projected per row — the shapes the agg/window grammars
# never emit. Only engine-deterministic expressions (no float rounding,
# no negative modulo, 1-based substr on both engines).
# ---------------------------------------------------------------------------

SCALAR_EXPRS = [
    "CASE WHEN l_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END",
    "CASE WHEN l_quantity > 25 THEN l_linenumber ELSE -l_linenumber END",
    "length(l_returnflag || l_linestatus)",
    "upper(l_linestatus) || lower(l_returnflag)",
    "substr(l_returnflag || 'xyz', 2, 2)",
    "abs(l_linenumber - 4)",
    "l_orderkey % 97",
    "coalesce(nullif(l_linenumber, 3), -1)",
    "greatest(l_linenumber, 4)",
    "least(l_suppkey, 100)",
    "CAST(l_quantity AS BIGINT) * 3 + l_linenumber",
    "CASE l_returnflag WHEN 'A' THEN 1 WHEN 'N' THEN 2 ELSE 0 END",
]


@st.composite
def scalar_queries(draw):
    exprs = draw(st.lists(st.sampled_from(SCALAR_EXPRS), min_size=1,
                          max_size=3, unique=True))
    where = draw(st.lists(preds, min_size=1, max_size=2))
    sel = ["l_orderkey", "l_linenumber"] + [
        f"{e} AS s{i}" for i, e in enumerate(exprs)
    ]
    return (f"SELECT {', '.join(sel)} FROM lineitem WHERE "
            + " AND ".join(where))


@given(sql=scalar_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_scalar_projection_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# explicit-frame window grammar (round 10): ROWS/RANGE frames over a
# deterministic total order — the contract rows pin fixed frames, this
# fuzzes the frame-bound space differentially.
# ---------------------------------------------------------------------------


@st.composite
def framed_window_queries(draw):
    # (l_orderkey, l_linenumber) is NOT unique in the testdata, so a
    # short ORDER BY leaves frame ties whose results are legitimately
    # engine-dependent. Ordering by the full tuple that INCLUDES every
    # aggregable column makes any remaining ties full duplicates
    # w.r.t. both order and aggregate -> multiset-deterministic.
    order = ("l_orderkey, l_linenumber, l_quantity, l_partkey, "
             "l_suppkey")
    # (fn, needs_bigint_cast): int sums type as HUGEINT in DuckDB
    # (→ float64 in pandas) vs BIGINT in Spark — the cast must wrap
    # the WHOLE window expression (CAST(... OVER (...) AS BIGINT)),
    # same determinism rule as the agg grammar above
    agg, cast_bigint = draw(st.sampled_from(
        [("SUM(l_quantity)", False), ("COUNT(*)", False),
         ("MIN(l_orderkey)", False), ("MAX(l_linenumber)", False),
         ("SUM(l_partkey)", True), ("MAX(l_suppkey)", False)]))
    part = draw(st.sampled_from(KEY_COLS))
    lo = draw(st.integers(min_value=0, max_value=5))
    hi = draw(st.integers(min_value=0, max_value=3))
    frame = draw(st.sampled_from([
        f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW",
        f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    ]))
    where = draw(st.lists(preds, min_size=1, max_size=2))
    win = (f"{agg} OVER (PARTITION BY {part} ORDER BY {order} "
           f"{frame})")
    if cast_bigint:
        win = f"CAST({win} AS BIGINT)"
    return (
        f"SELECT l_orderkey, l_linenumber, {win} AS w "
        f"FROM lineitem WHERE " + " AND ".join(where)
    )


@given(sql=framed_window_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_framed_window_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# join-CONDITION grammar (r11): mixed equi + theta + null-safe ON
# clauses over the FK tables — the one §2.4 shape the fixed join
# grammars above don't fuzz (they vary shapes/aggregates over fixed
# equi conditions; this varies the CONDITION). The FK equi conjunct
# is always present so the plan stays a hash join at any draw (a
# drawn pure-theta ON would BNLJ and the 60k×15k worst case would
# dominate the suite's runtime); theta/null-safe conjuncts attach on
# top. `IS [NOT] DISTINCT FROM` parses identically in Spark and
# DuckDB (checked), and the NULL-injecting CASE operands make the
# null-safe semantics actually bite instead of degenerating to `=`.
# ---------------------------------------------------------------------------

_JC_SHAPES = [
    # (tables-clause left/right, equi conjunct, extra-conjunct pool,
    #  group key, right probe col for matched/unmatched accounting)
    ("orders", "customer", "o_custkey = c_custkey",
     ["o_totalprice < c_acctbal * 50.0",
      "o_orderkey % 7 >= c_custkey % 5",
      "c_acctbal <= o_totalprice",
      ("CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey % 3 END "
       "IS NOT DISTINCT FROM "
       "CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_custkey % 3 END"),
      ("CASE WHEN o_custkey % 2 = 0 THEN NULL ELSE 1 END "
       "IS DISTINCT FROM CASE WHEN c_nationkey % 2 = 0 THEN NULL "
       "ELSE 1 END")],
     "o_orderstatus", "c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey",
     ["l_quantity < o_totalprice / 3000.0",
      "l_linenumber + 1 >= o_orderkey % 5",
      "l_partkey % 11 > o_custkey % 11",
      ("CASE WHEN l_suppkey % 4 = 0 THEN NULL ELSE l_suppkey % 4 END "
       "IS NOT DISTINCT FROM "
       "CASE WHEN o_custkey % 4 = 0 THEN NULL ELSE o_custkey % 4 END")],
     "l_returnflag", "o_orderkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey",
     ["s_acctbal > n_nationkey * 100.0",
      "s_suppkey % 3 <= n_regionkey",
      ("CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_suppkey % 5 END "
       "IS DISTINCT FROM "
       "CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END")],
     "s_nationkey", "n_nationkey"),
    ("customer", "nation", "c_nationkey = n_nationkey",
     ["c_acctbal * 2.0 >= n_nationkey * 300.0",
      "c_custkey % 6 > n_regionkey",
      ("CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_mktsegment END "
       "IS NOT DISTINCT FROM CASE WHEN n_regionkey % 2 = 0 "
       "THEN NULL ELSE c_mktsegment END")],
     "c_mktsegment", "n_nationkey"),
]


@st.composite
def join_condition_queries(draw):
    left, right, equi, pool, key, probe = draw(st.sampled_from(_JC_SHAPES))
    how = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    extras = draw(st.lists(st.sampled_from(pool), min_size=1, max_size=2,
                           unique=True))
    on = " AND ".join([equi] + extras)
    return (
        f"SELECT {key}, COUNT(*) AS n, COUNT({probe}) AS n_matched, "
        f"CAST(SUM(CASE WHEN {probe} IS NULL THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_unmatched, "
        f"CAST(MIN({probe}) AS BIGINT) AS min_probe, "
        f"CAST(MAX({probe}) AS BIGINT) AS max_probe "
        f"FROM {left} {how} {right} ON {on} "
        f"GROUP BY {key} ORDER BY {key}"
    )


@given(sql=join_condition_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_join_condition_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# sort / top-k grammar (round 11: SURVEY §2.7 differentially) — mixed
# ASC/DESC with EXPLICIT NULLS FIRST/LAST on NULL-injecting sort
# expressions, composed with LIMIT/OFFSET. The engines' DEFAULT null
# placement differs (Spark: NULLS FIRST for ASC; DuckDB: NULLS LAST),
# so every key pins placement explicitly — which is exactly the
# reference's collation surface. The trailing (l_orderkey,
# l_linenumber) tie-breaker makes the total order unique, so the
# LIMIT/OFFSET row SELECTION is deterministic and the bit-exact
# compare checks precisely which rows the collation admits.
# ---------------------------------------------------------------------------

_SORT_EXPRS = [
    "CASE WHEN l_partkey % 7 = 0 THEN NULL ELSE l_discount END",
    "CASE WHEN l_suppkey % 5 = 2 THEN NULL ELSE l_returnflag END",
    "l_extendedprice * (1.0 - l_discount)",
    # ISO date STRING (both engines accept the STRING alias; Spark
    # rejects bare VARCHAR): collates identically to the date itself,
    # and sidesteps the date-vs-timestamp pandas dtype mismatch
    "CAST(CAST(l_shipdate AS DATE) AS STRING)",
    "l_quantity",
]

_SORT_PREDS = [
    "l_linenumber <= 4",
    "l_quantity >= 10.0",
    "l_returnflag <> 'R'",
]


@st.composite
def sort_limit_queries(draw):
    n_keys = draw(st.integers(min_value=1, max_value=3))
    exprs = draw(st.lists(st.sampled_from(_SORT_EXPRS), min_size=n_keys,
                          max_size=n_keys, unique=True))
    keys = []
    for i, e in enumerate(exprs):
        d = draw(st.sampled_from(["ASC", "DESC"]))
        p = draw(st.sampled_from(["NULLS FIRST", "NULLS LAST"]))
        keys.append((f"{e} AS k{i}", f"k{i} {d} {p}"))
    where = draw(st.lists(st.sampled_from(_SORT_PREDS), min_size=0,
                          max_size=2, unique=True))
    limit = draw(st.integers(min_value=1, max_value=40))
    offset = draw(st.sampled_from([0, 1, 7, 50, 200]))
    sel = ", ".join([k for k, _ in keys] + ["l_orderkey", "l_linenumber"])
    order = ", ".join([o for _, o in keys] + ["l_orderkey", "l_linenumber"])
    sql = f"SELECT {sel} FROM lineitem"
    if where:
        sql += " WHERE " + " AND ".join(where)
    sql += f" ORDER BY {order} LIMIT {limit}"
    if offset:
        sql += f" OFFSET {offset}"
    return sql


@given(sql=sort_limit_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_sort_limit_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# scalar correlated-subquery grammar (round 11: the projection-side
# decorrelation path — the quantified forms above go through IN/EXISTS
# rewrites, but a scalar subquery in the SELECT list exercises
# Spark's scalar-subquery decorrelation against DuckDB's flattening,
# including the empty-group semantics split: COUNT over an empty
# correlated group is 0, while MAX/MIN/SUM are NULL).
# ---------------------------------------------------------------------------

_SCALAR_SUB_INNER = [
    "l_quantity > 30.0",
    "l_returnflag = 'A'",
    "l_discount < 0.03",
    "l_linenumber <= 2",
]

_SCALAR_SUB_AGGS = [
    ("CAST(COUNT(*) AS BIGINT)", "sub_n"),
    ("MAX(l_quantity)", "sub_max"),
    ("MIN(l_discount)", "sub_min"),
    ("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)",
     "sub_sum"),
]


@st.composite
def scalar_subquery_queries(draw):
    outer_pred = draw(st.sampled_from(
        ["o_totalprice > 150000", "o_orderstatus = 'F'",
         "o_custkey % 5 = 2"]))
    picks = draw(st.lists(st.sampled_from(_SCALAR_SUB_AGGS), min_size=1,
                          max_size=2, unique=True))
    subs = []
    for agg, alias in picks:
        inner = draw(st.sampled_from(_SCALAR_SUB_INNER))
        subs.append(
            f"(SELECT {agg} FROM lineitem "
            f"WHERE l_orderkey = o_orderkey AND {inner}) AS {alias}")
    return (
        "SELECT o_orderkey, "
        "CAST(o_totalprice AS DOUBLE) AS o_total, "
        + ", ".join(subs)
        + f" FROM orders WHERE {outer_pred}"
        " ORDER BY o_orderkey LIMIT 400"
    )


@given(sql=scalar_subquery_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_scalar_subquery_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# aggregate FILTER-clause grammar (round 11: conditional aggregation —
# the SQL:2003 FILTER (WHERE ...) path is a distinct Catalyst rewrite
# from plain aggregates and from CASE-WHEN folding, and composes with
# GROUP BY + HAVING; NULL discipline matters because a fully filtered-
# out group yields 0 for COUNT but NULL for SUM/MIN/MAX, which the
# grammar reaches via selective filter predicates).
# ---------------------------------------------------------------------------

_FILTER_PREDS = [
    "l_quantity > 45.0",
    "l_returnflag = 'R'",
    "l_linenumber = 7",
    "l_discount < 0.01",
]

# templates with the filter INSIDE any cast — FILTER binds to the
# aggregate function, so `CAST(SUM(x) AS T) FILTER (...)` is a parse
# error in Spark. No DISTINCT aggregates: Spark rejects DISTINCT +
# FILTER (PARSE_SYNTAX_ERROR) while DuckDB accepts it — no shared text.
_FILTER_AGGS = [
    "COUNT(*) FILTER (WHERE {p})",
    "CAST(SUM(l_linenumber) FILTER (WHERE {p}) AS BIGINT)",
    "MAX(l_quantity) FILTER (WHERE {p})",
    "MIN(l_quantity) FILTER (WHERE {p})",
]


@st.composite
def filter_agg_queries(draw):
    n = draw(st.integers(min_value=1, max_value=3))
    cols = []
    for i in range(n):
        agg = draw(st.sampled_from(_FILTER_AGGS))
        fp = draw(st.sampled_from(_FILTER_PREDS))
        cols.append(f"{agg.format(p=fp)} AS f{i}")
    key = draw(st.sampled_from(KEY_COLS))
    having = draw(st.sampled_from(
        [None, "COUNT(*) > 100", "MAX(l_quantity) >= 10.0"]))
    sql = (f"SELECT {key}, COUNT(*) AS n_all, " + ", ".join(cols)
           + f" FROM lineitem GROUP BY {key}")
    if having:
        sql += f" HAVING {having}"
    return sql + f" ORDER BY {key}"


@given(sql=filter_agg_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_filter_agg_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)


# ---------------------------------------------------------------------------
# CTE-reuse grammar (round 11: WITH clauses referenced more than once —
# Spark's CTE inlining/reuse decisions vs DuckDB's materialization are
# independent optimizer paths over the same semantics; the grammar
# self-joins one aggregate CTE on adjacent group keys so a wrong
# dedup/inline shows up as row-count or value drift).
# ---------------------------------------------------------------------------

_CTE_KEYS = ["l_linenumber", "l_suppkey % 50", "l_partkey % 100"]

_CTE_AGGS = [
    "CAST(SUM(l_orderkey) AS BIGINT)",
    "MAX(l_quantity)",
    "COUNT(*)",
]


@st.composite
def cte_reuse_queries(draw):
    key = draw(st.sampled_from(_CTE_KEYS))
    agg = draw(st.sampled_from(_CTE_AGGS))
    pred = draw(preds)
    shift = draw(st.integers(min_value=1, max_value=3))
    return (
        f"WITH g AS (SELECT {key} AS k, {agg} AS v, COUNT(*) AS n"
        f" FROM lineitem WHERE {pred} GROUP BY {key})"
        " SELECT a.k AS k, a.v AS v_here, b.v AS v_next,"
        " CAST(a.n + b.n AS BIGINT) AS n_pair"
        f" FROM g a JOIN g b ON b.k = a.k + {shift}"
        " ORDER BY a.k"
    )


@given(sql=cte_reuse_queries())
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_cte_reuse_matches_duckdb(spark, duck, sql):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    assert_frames_match(spark.sql(sql), duck.sql(sql), sql)
