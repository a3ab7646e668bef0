"""Record linkage: blocking correctness, recall on planted typos, the
block-size guard, and plan shape (equi-join, never cartesian)."""

import pytest
from pyspark.sql import functions as F

from hdk_spark.operators.linkage import fuzzy_join, fuzzy_self_pairs


def test_fuzzy_self_pairs_planted_typos(spark):
    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme korp"),     # dist 1, same last-token? corp vs korp differ!
            (3, "acme corp."),    # dist 1 from 1 but last token 'corp.' differs
            (4, "globex corp"),
            (5, "globex corp"),   # exact dup of 4
        ],
        "id: long, name: string",
    )
    # last-token blocking misses 2 and 3 (different tail) — use prefix3
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_pairs(
            df, "id", "name", max_dist=2, block="prefix3"
        ).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1
    assert pairs[(4, 5)] == 0
    assert (1, 4) not in pairs  # acme vs globex: different block


def test_fuzzy_blocking_bounds_candidates(spark):
    """A degenerate hot block is dropped by max_block_size, not paired
    quadratically."""
    rows = [(i, f"name {i} x") for i in range(100)]  # all share block 'x'
    df = spark.createDataFrame(rows, "id: long, name: string")
    out = fuzzy_self_pairs(
        df, "id", "name", max_dist=50, block="last_token", max_block_size=10
    )
    assert out.count() == 0  # hot block dropped entirely
    some = fuzzy_self_pairs(
        df, "id", "name", max_dist=50, block="last_token",
        max_block_size=None,
    )
    assert some.count() == 100 * 99 // 2  # guard off -> full block pairs


def test_fuzzy_join_two_relations(spark):
    a = spark.createDataFrame(
        [(1, "red bolt"), (2, "blue gear")], "id_l: long, n_l: string"
    )
    b = spark.createDataFrame(
        [(10, "red bolt"), (11, "rod bolt"), (12, "blue fork")],
        "id_r: long, n_r: string",
    )
    got = {
        (r["id_l"], r["id_r"]): r["dist"]
        for r in fuzzy_join(a, b, "n_l", "n_r", max_dist=2).collect()
    }
    assert got == {(1, 10): 0, (1, 11): 1}


def test_fuzzy_join_plan_is_equi_join(spark):
    a = spark.createDataFrame([(1, "red bolt")], "id_l: long, n_l: string")
    b = spark.createDataFrame([(2, "rod bolt")], "id_r: long, n_r: string")
    p = (
        fuzzy_join(a, b, "n_l", "n_r")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_fuzzy_soundex_blocking_catches_phonetic_typos(spark):
    """'karl smith' vs 'carl smith': prefix3 blocking separates them
    (kar vs car) but soundex blocking pairs them (C640 == K640? no —
    soundex keeps the first letter; karl->K640, carl->C640. Use a
    same-letter phonetic variant instead: 'robert j' vs 'rupert j')."""
    df = spark.createDataFrame(
        [(1, "robert jones"), (2, "rupert jones"), (3, "susan jones")],
        "id: long, name: string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_pairs(
            df, "id", "name", max_dist=3, block="soundex"
        ).collect()
    }
    # robert/rupert share soundex R163 -> verified pair; susan (S250)
    # never even becomes a candidate
    assert (1, 2) in pairs
    assert all(3 not in k for k in pairs)
