"""Data-selection operators: DSIR importance weights/resampling and
temperature mixture weights/budgets (operators/selection.py)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_dsir_en_target_prefers_en(spark):
    """Sanity on the operator's POINT: with an English target, the
    mean length-normalized log-weight of en candidates exceeds every
    other language's."""
    from hdk_spark.operators.selection import dsir_logweights

    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en").limit(30)
    w = dsir_logweights(docs, target, n_buckets=512)
    per_lang = {
        r["lang"]: r["m"]
        for r in w.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg(
            F.col("log_weight")
            / F.greatest("n_grams", F.lit(1)).cast("double")
        ).alias("m"))
        .collect()
    }
    assert per_lang["en"] == max(per_lang.values()), per_lang


def test_dsir_deterministic_and_total(spark):
    """Repartition-stable weights; NULL/empty text scores 0 over 0
    grams instead of erroring or vanishing."""
    from hdk_spark.operators.selection import dsir_logweights

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, None), (2, ""),
         (3, "der hund lief"), (4, "the the the")],
        "doc_id: long, text: string",
    )
    target = docs.filter("doc_id = 0")
    a = sorted(map(tuple, dsir_logweights(docs, target).collect()))
    b = sorted(map(tuple, dsir_logweights(
        docs.repartition(7), target.repartition(3)).collect()))
    assert a == b
    rows = {r["doc_id"]: r for r in dsir_logweights(docs, target).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    for i in (1, 2):
        assert rows[i]["n_grams"] == 0 and rows[i]["log_weight"] == 0.0
    # the target doc itself scores higher than the off-distribution one
    assert rows[0]["log_weight"] / rows[0]["n_grams"] > (
        rows[3]["log_weight"] / rows[3]["n_grams"]
    )


def test_dsir_sample_without_replacement_k_and_stability(spark):
    from hdk_spark.operators.selection import dsir_sample

    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en").limit(20)
    got = dsir_sample(docs, target, k=12, n_buckets=256).collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == 12 and len(set(ids)) == 12
    again = dsir_sample(
        docs.repartition(9), target, k=12, n_buckets=256
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]
    # scores are sorted descending (top-k contract)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_temperature_mixture_alpha_limits(spark):
    """alpha=1 reproduces the natural distribution (q == p); small
    alpha pushes q toward uniform; boosts move the right way."""
    from hdk_spark.operators.selection import temperature_mixture

    docs = _docs(spark)
    nat = {r["lang"]: r for r in temperature_mixture(
        docs, "lang", alpha=1.0).collect()}
    for r in nat.values():
        assert abs(r["p"] - r["q"]) <= 2e-6
        assert abs(r["boost"] - 1.0) <= 2e-5
    flat = {r["lang"]: r for r in temperature_mixture(
        docs, "lang", alpha=0.01).collect()}
    qs = [r["q"] for r in flat.values()]
    assert max(qs) - min(qs) < 0.02  # near-uniform
    # the majority group is damped, a minority group boosted, at 0.3
    mid = {r["lang"]: r for r in temperature_mixture(
        docs, "lang", alpha=0.3).collect()}
    major = max(mid.values(), key=lambda r: r["p"])
    minor = min(mid.values(), key=lambda r: r["p"])
    assert major["boost"] < 1.0 < minor["boost"]
    with pytest.raises(ValueError, match="tokens"):
        temperature_mixture(docs, "lang", by="bytes")


@pytest.mark.parametrize("total", [0, 1, 97, 1_000_003, 10**12 + 7])
def test_temperature_budgets_sum_exact(spark, total):
    from hdk_spark.operators.selection import temperature_budgets

    docs = _docs(spark)
    rows = temperature_budgets(docs, total, "lang", alpha=0.3).collect()
    assert sum(r["budget"] for r in rows) == total
    assert all(r["budget"] >= 0 for r in rows)


def test_temperature_budgets_null_group_total(spark):
    from hdk_spark.operators.selection import temperature_budgets

    docs = spark.createDataFrame(
        [(i, None if i % 3 == 0 else ("en" if i % 2 else "de"),
          "tok " * (5 + i)) for i in range(12)],
        "doc_id: long, lang: string, text: string",
    )
    rows = temperature_budgets(docs, 1000, "lang", alpha=0.5).collect()
    assert sum(r["budget"] for r in rows) == 1000
    assert any(r["lang"] is None for r in rows)  # NULL group is a row


def test_curriculum_order(spark):
    """Equal-population stages from exact quantiles, boundary ties go
    low, easy_first flip reverses stages, NULL score -> NULL stage,
    curriculum_key is the id hash (pure function), n_stages=1 total,
    guard."""
    from collections import Counter

    import pytest

    from hdk_spark.operators.selection import curriculum_order

    rows = [(i, float(i % 50)) for i in range(200)] + [(900, None)]
    df = spark.createDataFrame(rows, "doc_id: long, difficulty: double")
    got = curriculum_order(df, "difficulty", n_stages=4).collect()
    c = Counter(r["stage"] for r in got)
    assert c[None] == 1 and sum(v for k, v in c.items() if k is not None) == 200
    assert set(k for k in c if k is not None) == {0, 1, 2, 3}
    assert max(c[k] for k in (0, 1, 2, 3)) - min(c[k] for k in (0, 1, 2, 3)) <= 8

    by_id = {r["doc_id"]: r for r in got}
    # monotone: higher score never lands in a lower stage
    for i in range(200):
        for j in range(200):
            if rows[i][1] < rows[j][1]:
                assert by_id[rows[i][0]]["stage"] <= by_id[rows[j][0]]["stage"]
                break

    rev = {r["doc_id"]: r["stage"]
           for r in curriculum_order(df, "difficulty", n_stages=4,
                                     easy_first=False).collect()}
    for i, s in rows:
        if s is not None:
            assert rev[i] == 3 - by_id[i]["stage"]

    MULT, MOD = 2654435761, 1_000_000_007
    for r in got[:5]:
        assert r["curriculum_key"] == ((r["doc_id"] * MULT + 31) % MOD) % MOD

    one = curriculum_order(df, "difficulty", n_stages=1).collect()
    assert set(r["stage"] for r in one) == {0, None}

    with pytest.raises(ValueError, match="n_stages"):
        curriculum_order(df, "difficulty", n_stages=0)
