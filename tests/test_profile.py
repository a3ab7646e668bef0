"""Profiling-operator invariants beyond the contract queries:
histogram completeness/bounds, summarize vs a pandas reference,
skew_report ordering properties."""

import pytest
from pyspark.sql import functions as F

from hdk_spark.operators.profile import histogram, skew_report, summarize
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def lineitem(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    return spark.table("lineitem")


def test_histogram_counts_partition_the_range(spark, lineitem):
    lo, hi, n_bins = 800.0, 105000.0, 16
    rows = histogram(lineitem, "l_extendedprice", n_bins, lo, hi).collect()
    in_range = lineitem.filter(
        (F.col("l_extendedprice").cast("double") >= lo)
        & (F.col("l_extendedprice").cast("double") <= hi)
    ).count()
    assert sum(r["n"] for r in rows) == in_range  # nothing lost or doubled
    assert all(1 <= r["bin"] <= n_bins for r in rows)
    for r in rows:
        assert r["lo_edge"] < r["hi_edge"]
    # edges tile the range
    by_bin = {r["bin"]: r for r in rows}
    assert by_bin[1]["lo_edge"] == pytest.approx(lo)
    assert by_bin[max(by_bin)]["hi_edge"] == pytest.approx(hi, rel=1e-9)


def test_histogram_upper_bound_clamped(spark):
    df = spark.createDataFrame(
        [(float(x),) for x in [0.0, 5.0, 9.999999, 10.0]], "v double"
    )
    rows = histogram(df, "v", 4, 0.0, 10.0).collect()
    assert sum(r["n"] for r in rows) == 4
    assert max(r["bin"] for r in rows) == 4  # hi folds into the last bin


def test_summarize_matches_pandas_reference(spark, lineitem):
    # exact+deterministic mode (the contract-query pin); the default is
    # the mergeable t-digest + double-moment scale path
    got = {
        r["column"]: r
        for r in summarize(
            lineitem, ["l_quantity", "l_extendedprice"],
            exact=True, deterministic=True,
        ).collect()
    }
    pdf = lineitem.select("l_quantity", "l_extendedprice").toPandas()
    for c in ("l_quantity", "l_extendedprice"):
        s = pdf[c].astype(float)
        r = got[c]
        assert r["n"] == len(s) and r["n_null"] == 0
        assert r["min"] == pytest.approx(s.min())
        assert r["max"] == pytest.approx(s.max())
        assert r["mean"] == pytest.approx(s.mean(), rel=1e-9)
        assert r["stddev"] == pytest.approx(s.std(ddof=1), rel=1e-6)
        assert r["q_5"] == pytest.approx(s.quantile(0.5), rel=1e-9)
        assert r["q_25"] <= r["q_5"] <= r["q_75"]
    # default (approx/fast) mode agrees on exact stats and lands the
    # sketched quantiles within 2% of the exact ones
    fast = {
        r["column"]: r
        for r in summarize(lineitem, ["l_quantity", "l_extendedprice"]).collect()
    }
    for c in ("l_quantity", "l_extendedprice"):
        assert fast[c]["n"] == got[c]["n"]
        assert fast[c]["mean"] == pytest.approx(got[c]["mean"], rel=1e-6)
        assert fast[c]["stddev"] == pytest.approx(got[c]["stddev"], rel=1e-6)
        for qn in ("q_25", "q_5", "q_75"):
            assert fast[c][qn] == pytest.approx(got[c][qn], rel=0.02)


def test_skew_report_properties(spark, lineitem):
    rows = skew_report(lineitem, "l_orderkey", top_k=20).collect()
    assert [r["rank"] for r in rows] == list(range(1, 21))
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert 0 < sum(r["share"] for r in rows) <= 1.0 + 1e-6
    # rank-1 key really is the (tie-broken) heaviest
    top = (
        lineitem.groupBy("l_orderkey").count()
        .orderBy(F.desc("count"), F.asc("l_orderkey")).first()
    )
    assert rows[0]["key"] == top["l_orderkey"] and rows[0]["n"] == top["count"]


def test_summarize_infers_numeric_columns(spark, lineitem):
    rows = summarize(lineitem).collect()
    got = {r["column"] for r in rows}
    # every numeric lineitem column, no string/timestamp columns
    assert "l_quantity" in got and "l_extendedprice" in got
    assert "l_returnflag" not in got and "l_shipdate" not in got
    assert all(r["n"] > 0 for r in rows)


def test_expect_null_condition_is_violation(spark):
    from hdk_spark.operators.profile import expect

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id: long, v: double"
    )
    rows = {r["rule"]: r for r in expect(
        df, {"v_nonneg": "v >= 0", "id_pos": "id > 0"}).collect()}
    assert rows["id_pos"]["passed"] and rows["id_pos"]["n_violations"] == 0
    # NULL v fails the expectation too: 2 violations (NULL and -5)
    assert rows["v_nonneg"]["n_violations"] == 2
    assert not rows["v_nonneg"]["passed"]
    assert all(r["n_rows"] == 3 for r in rows.values())


def test_expect_single_pass_plan(spark):
    from hdk_spark.operators.profile import expect

    df = spark.createDataFrame([(1,)], "id: long")
    p = (
        expect(df, {"a": "id > 0", "b": "id < 5", "c": "id <> 3"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    # all rules share one aggregate: a single exchange, no join
    assert p.count("Exchange") == 1 and "Join" not in p


def test_drift_report_identical_distributions_near_zero(spark):
    from pyspark.sql import functions as F

    from hdk_spark.operators.profile import drift_report

    a = spark.range(0, 1000).select((F.col("id") % 97 / 97.0).alias("x"))
    psi = drift_report(a, a, "x", n_bins=8, lo=0.0, hi=1.0).agg(
        F.sum("psi_term")).collect()[0][0]
    assert abs(psi) < 1e-9  # same snapshot -> zero drift


def test_drift_report_detects_shift(spark):
    from pyspark.sql import functions as F

    from hdk_spark.operators.profile import drift_report

    a = spark.range(0, 1000).select((F.col("id") % 100 / 200.0).alias("x"))
    b = spark.range(0, 1000).select(
        (F.col("id") % 100 / 200.0 + 0.5).alias("x"))
    rep = drift_report(a, b, "x", n_bins=4, lo=0.0, hi=1.0)
    rows = {r["bin"]: r for r in rep.collect()}
    # disjoint supports: every bin is one-sided
    assert rows[1]["n_b"] == 0 and rows[3]["n_a"] == 0
    psi = sum(r["psi_term"] for r in rows.values())
    assert psi > 0.2  # far above the usual alert threshold


def test_snapshot_diff_classification(spark):
    from hdk_spark.operators.profile import snapshot_diff

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", None), (3, "z", 3.0)],
        "k: long, s: string, v: double",
    )
    b = spark.createDataFrame(
        [(2, "y", None), (3, "z", 9.0), (4, "w", 4.0)],
        "k: long, s: string, v: double",
    )
    rows = {r["k"]: r["status"]
            for r in snapshot_diff(a, b, "k", ["s", "v"]).collect()}
    # NULL == NULL is unchanged; value flip is changed; one-sided keys
    assert rows == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_single_join_plan(spark):
    from hdk_spark.operators.profile import snapshot_diff

    a = spark.createDataFrame([(1, "x")], "k: long, s: string")
    p = (
        snapshot_diff(a, a, "k", ["s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Join") == 1 and "CartesianProduct" not in p


def test_gopher_quality_flags_rules(spark):
    from hdk_spark.operators.text import gopher_quality_flags

    good = "the quick brown fox jumps over a lazy dog and " * 10  # 100 words, stopwords present
    too_short = "tiny doc with the and of"
    symbol_heavy = ("the word and more #### #### #### #### text " * 20)
    bullety = "\n".join("- the bullet item here now" for _ in range(20))
    ellipsisy = "\n".join("the line trails off..." for _ in range(10))
    df = spark.createDataFrame(
        [(1, good), (2, too_short), (3, symbol_heavy), (4, bullety),
         (5, ellipsisy)],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert rows[1]["keep"]
    assert not rows[2]["keep"]          # word count below floor
    assert not rows[3]["keep"] and rows[3]["symbol_ratio"] > 0.1
    assert not rows[4]["keep"] and rows[4]["bullet_ratio"] > 0.9
    assert not rows[5]["keep"] and rows[5]["ellipsis_ratio"] > 0.3
    # per-rule observability: the short doc still reports its stats
    assert rows[2]["n_words"] == 6 and rows[2]["stopword_hits"] >= 2


def test_gopher_flags_map_only_plan(spark):
    from hdk_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    p = gopher_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p


def test_c4_line_filter_rules(spark):
    from hdk_spark.operators.text import c4_line_filter

    doc = "\n".join([
        "This is a good sentence with plenty of words.",   # keep
        "Short line.",                                      # < 3 words
        "no terminal punctuation here at all",              # no punct
        "Please accept our cookie policy now.",             # blocklist
        "Another perfectly fine sentence stands here!",     # keep
    ])
    brace_doc = "A fine sentence here. { var x = 1; }"
    df = spark.createDataFrame(
        [(1, doc), (2, brace_doc)], "doc_id: long, text: string"
    )
    rows = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert rows[1]["clean_text"].splitlines() == [
        "This is a good sentence with plenty of words.",
        "Another perfectly fine sentence stands here!",
    ]
    assert rows[1]["n_lines"] == 5 and rows[1]["n_removed_lines"] == 3
    assert not rows[1]["dropped"]
    assert rows[2]["dropped"] and rows[2]["clean_text"] == ""
    assert rows[2]["n_removed_lines"] == rows[2]["n_lines"]


def test_c4_line_filter_map_only(spark):
    from hdk_spark.operators.text import c4_line_filter

    df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    p = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p


def test_ngram_repetition_signals_reference(spark):
    """Full Gopher repetition family vs hand-computed values; short
    docs keep zero-fraction rows for every n."""
    from hdk_spark.operators.text import ngram_repetition_signals

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"),
         (2, "all words here are fully distinct tokens okay"),
         (3, "ab")],
        "doc_id: long, text: string",
    )
    rows = {
        (r["doc_id"], r["n"]): r
        for r in ngram_repetition_signals(df, ns=(2, 3)).collect()
    }
    # doc 1: chars=24; 4 bigrams all 'spam spam' (len 9): top=dup=36/24
    assert rows[(1, 2)]["top_char_frac"] == 1.5
    assert rows[(1, 2)]["dup_char_frac"] == 1.5
    # doc 2: all distinct -> dup mass 0, top = one bigram's chars
    assert rows[(2, 2)]["dup_char_frac"] == 0.0
    assert 0 < rows[(2, 2)]["top_char_frac"] < 1
    # doc 3 is shorter than every n: rows exist with zero fractions
    assert rows[(3, 2)]["n_grams"] == 0
    assert rows[(3, 2)]["top_char_frac"] == 0.0
    assert rows[(3, 3)]["dup_char_frac"] == 0.0


def test_ngram_repetition_no_join_two_exchanges(spark):
    from hdk_spark.operators.text import ngram_repetition_signals

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id: long, text: string")
    p = (
        ngram_repetition_signals(df, ns=(2, 3, 4))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in p and p.count("Exchange") <= 2


def test_code_quality_flags_rules(spark):
    from hdk_spark.operators.text import code_quality_flags

    good = "\n".join(f"def fn_{i}(x):\n    return x + {i}" for i in range(10))
    minified = "x=1;" * 500                              # one huge line
    hexdump = " ".join("0123456789" for _ in range(100))  # digit table
    binaryish = "\x01\x02{}[]!!! ###" * 50               # low alnum
    autogen = "# AUTO-GENERATED by protoc. DO NOT EDIT\n" + good
    df = spark.createDataFrame(
        [(1, good), (2, minified), (3, hexdump), (4, binaryish),
         (5, autogen)],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in code_quality_flags(df).collect()}
    assert rows[1]["keep"]
    assert not rows[2]["keep"] and rows[2]["max_line_len"] > 1000
    assert not rows[3]["keep"] and rows[3]["alpha_frac"] < 0.25
    assert not rows[4]["keep"] and rows[4]["alnum_frac"] < 0.25
    assert not rows[5]["keep"] and rows[5]["autogen"]
    # per-rule observability survives the reject
    assert rows[2]["n_lines"] == 1


def test_code_quality_flags_map_only(spark):
    from hdk_spark.operators.text import code_quality_flags

    df = spark.createDataFrame([(1, "x = 1")], "doc_id: long, text: string")
    p = code_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p


def test_vocab_coverage_list_and_df_paths_agree(spark):
    """The map-only literal path and the join path must compute the
    same report; known OOV counts on a planted corpus."""
    from hdk_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "entirely novel words only"),
         (3, "the the the")],
        "doc_id: long, text: string",
    )
    vocab = ["the", "cat", "mat", "on"]
    lst = {r["doc_id"]: r for r in vocab_coverage(df, vocab).collect()}
    vdf = spark.createDataFrame([(v,) for v in vocab], "token: string")
    jn = {r["doc_id"]: r for r in vocab_coverage(df, vdf).collect()}
    assert lst == jn
    # doc 1: 6 tokens, 'sat' is the only OOV occurrence
    assert (lst[1]["n_tokens"], lst[1]["n_oov"]) == (6, 1)
    assert lst[2]["oov_frac"] == 1.0
    assert lst[3]["n_oov"] == 0 and lst[3]["oov_frac"] == 0.0


def test_vocab_coverage_null_text_paths_agree(spark):
    """NULL-text docs must not silently vanish from either path: both
    emit (id, 0, 0, 0.0) — the r5 verdict's two-paths-two-contracts
    inconsistency (literal path emitted NULL counts, join path dropped
    the row)."""
    from hdk_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "the cat"), (2, None), (3, "dog")],
        "doc_id: long, text: string",
    )
    vocab = ["the", "cat"]
    lst = {r["doc_id"]: r for r in vocab_coverage(df, vocab).collect()}
    vdf = spark.createDataFrame([(v,) for v in vocab], "token: string")
    jn = {r["doc_id"]: r for r in vocab_coverage(df, vdf).collect()}
    assert lst == jn
    assert set(lst) == {1, 2, 3}
    assert (lst[2]["n_tokens"], lst[2]["n_oov"], lst[2]["oov_frac"]) == (
        0, 0, 0.0)
    assert (lst[1]["n_tokens"], lst[1]["n_oov"]) == (2, 0)
    assert (lst[3]["n_tokens"], lst[3]["n_oov"]) == (1, 1)


def test_vocab_coverage_list_path_map_only(spark):
    from hdk_spark.operators.text import vocab_coverage

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    p = (
        vocab_coverage(df, ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p and "Join" not in p


# ---------------------------------------------------------------------------
# quality-scorer training (deterministic distributed logistic regression)
# ---------------------------------------------------------------------------


def _ref_train(texts, labels, n_buckets, iterations, lr):
    """Pure-Python reference of train_quality_scorer: identical
    quantized-gradient arithmetic, single-threaded."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets

    def round_half_up(x):
        # Spark's round(col, 0): BigDecimal(double) + HALF_UP
        return int(Decimal(x).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    feats = []
    for t, y in zip(texts, labels):
        toks = t.strip().lower().split()
        if not toks:
            continue
        c = [0] * n_buckets
        for tok in toks:
            c[bucket(tok)] += 1
        feats.append((float(y), len(toks), c))
    m = len(feats)
    w = [0.0] * n_buckets
    hist = []
    for _ in range(iterations):
        g = [0] * n_buckets
        for y, n, c in feats:
            z = 0.0
            for b in range(n_buckets):
                z = z + w[b] * float(c[b])
            z = z / float(n)
            p = 1.0 / (1.0 + math.exp(-z))
            q = round_half_up((p - y) / float(n) * 1000000.0)
            for b in range(n_buckets):
                g[b] += q * c[b]
        w = [(w[b] - lr * (float(g[b]) / (1000000.0 * m))) + 0.0
             for b in range(n_buckets)]
        hist.append(list(w))
    return hist


_SCORER_CORPUS = [
    (0, "good clean prose with varied vocabulary and structure", 1),
    (1, "another well formed document about interesting topics", 1),
    (2, "the quick brown fox jumps over the lazy dog nicely", 1),
    (3, "spam spam spam buy now click here spam spam", 0),
    (4, "zzz qqq xxx garbage tokens zzz qqq xxx garbage", 0),
    (5, "click here buy now free free free click here", 0),
    (6, "a thoughtful essay on language and its many uses", 1),
    (7, "buy buy buy now now now spam click free", 0),
]


def test_train_quality_scorer_matches_python_reference(spark):
    """Bit-identical weights vs the single-threaded reference — the
    quantized-decimal gradient makes the distributed sum exact."""
    from hdk_spark.operators.text import train_quality_scorer

    df = spark.createDataFrame(
        _SCORER_CORPUS, "doc_id: long, text: string, label: int")
    got = train_quality_scorer(
        df, "label", n_buckets=8, iterations=3, lr=1.0,
        return_history=True)
    want = _ref_train(
        [t for _, t, _ in _SCORER_CORPUS],
        [y for _, _, y in _SCORER_CORPUS], 8, 3, 1.0)
    assert got == want  # exact float equality, all iterations


def test_train_quality_scorer_deterministic_under_repartition(spark):
    from hdk_spark.operators.text import train_quality_scorer

    df = spark.createDataFrame(
        _SCORER_CORPUS, "doc_id: long, text: string, label: int")
    a = train_quality_scorer(df, "label", n_buckets=8, iterations=2)
    b = train_quality_scorer(
        df.repartition(7), "label", n_buckets=8, iterations=2)
    assert a == b


def test_train_quality_scorer_separates_and_composes(spark):
    """Trained weights must actually separate the classes when applied
    through hashed_linear_score (the closed loop)."""
    from hdk_spark.operators.text import (
        hashed_linear_score,
        train_quality_scorer,
    )

    df = spark.createDataFrame(
        _SCORER_CORPUS, "doc_id: long, text: string, label: int")
    w = train_quality_scorer(df, "label", n_buckets=32, iterations=40,
                             lr=8.0)
    scores = {r["doc_id"]: r["score"] for r in hashed_linear_score(
        df, n_buckets=32, weights=w).collect()}
    good = [scores[i] for i, _, y in _SCORER_CORPUS if y == 1]
    bad = [scores[i] for i, _, y in _SCORER_CORPUS if y == 0]
    assert min(good) > max(bad), (good, bad)


def test_train_quality_scorer_guards(spark):
    import pytest as _pytest

    from hdk_spark.operators.text import train_quality_scorer

    df = spark.createDataFrame(
        [(0, "", None)], "doc_id: long, text: string, label: int")
    with _pytest.raises(ValueError, match="iterations"):
        train_quality_scorer(df, "label", iterations=0)
    with _pytest.raises(ValueError, match="labeled"):
        train_quality_scorer(df, "label")  # only a NULL-label row


# ---------------------------------------------------------------------------
# hashed character-n-gram language ID
# ---------------------------------------------------------------------------

_LANG_SENTENCES = [
    (0, "the quick brown fox jumps over the lazy dog and it was the best of times", "en"),
    (1, "der hund und die katze sind nicht zu hause aber das ist auch egal", "de"),
    (2, "le chat est dans la maison et il ne veut pas sortir avec les autres", "fr"),
    (3, "el perro y el gato están en la casa pero no quieren salir de ella", "es"),
    (4, "o cão e o gato estão em casa mas não querem sair de lá agora", "pt"),
    (5, "il cane e il gatto sono in casa ma non vogliono uscire con gli altri", "it"),
    (6, "de hond en de kat zijn niet thuis maar dat is ook niet erg voor ons", "nl"),
    (7, "собака и кошка не хотят выходить из дома но это не так важно для нас", "ru"),
    (8, "我们 知道 这个 时候 已经 没有 什么 可以 但是 如果 你们 就是 现在 自己", "zh"),
    (9, "köpek ve kedi evde ama dışarı çıkmak istemiyorlar bu da çok önemli değil", "tr"),
    (10, "og det er ikke så vigtigt for os men hunden og katten er hjemme nu", "da"),
    (11, "ja se on hyvä mutta koira ja kissa eivät ole kotona tänään", "fi"),
    (12, "i w domu nie ma psa ale to nie jest takie ważne dla nas", "pl"),
    (13, "și câinele și pisica nu sunt acasă dar nu este atât de important", "ro"),
    (14, "dan anjing dan kucing tidak ada di rumah tetapi itu tidak penting", "id"),
]


def test_lang_id_ngram_identifies_planted_languages(spark):
    """The default (md5) basis must identify every planted language;
    the cheap crc32 basis is allowed its measured collision miss
    (Turkish→Dutch at 256 buckets) but must get >= 13 of 15."""
    from hdk_spark.operators.text import lang_id_ngram

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in _LANG_SENTENCES], "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in lang_id_ngram(df).collect()}
    for i, _, want in _LANG_SENTENCES:
        assert got[i]["lang"] == want, (i, got[i])
        assert got[i]["score"] > 0.0 and got[i]["n_grams"] > 0
    crc = {r["doc_id"]: r["lang"]
           for r in lang_id_ngram(df, basis="crc32").collect()}
    hits = sum(crc[i] == want for i, _, want in _LANG_SENTENCES)
    assert hits >= 13, crc


def test_lang_id_ngram_und_and_subset(spark):
    from hdk_spark.operators.text import lang_id_ngram

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "x"),
         (3, "der hund und die katze sind nicht zu hause")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in lang_id_ngram(df).collect()}
    # no trigram -> und with zero score ('' pads to 3 spaces = 1 gram of
    # whitespace, still scored; truly NULL text has none)
    assert got[0]["lang"] == "und" and got[0]["score"] == 0.0
    assert got[0]["n_grams"] == 0
    # restricting the language set re-scores within it only
    sub = {r["doc_id"]: r["lang"] for r in lang_id_ngram(
        df, langs=["en", "de"]).collect()}
    assert sub[3] == "de"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no seed data"):
        lang_id_ngram(df, langs=["xx"])


def test_lang_id_ngram_matches_python_reference(spark):
    """Scores replayed exactly by a single-threaded reference — the
    property the DuckDB oracle relies on."""
    import hashlib

    from hdk_spark.operators.text import (
        _lang_ngram_model,
        _micro,
        lang_id_ngram,
    )

    langs = tuple(sorted(["en", "de", "fr", "zh"]))
    B = 64
    model = _lang_ngram_model(B, langs, "md5")
    texts = [t for _, t, _ in _LANG_SENTENCES[:4]]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in lang_id_ngram(
        df, n_buckets=B, langs=list(langs), basis="md5").collect()}
    import re as _re
    for i, t in enumerate(texts):
        s = " " + _re.sub(r"\s+", " ", t.strip().lower()) + " "
        bidx = [
            int(hashlib.md5(s[j:j+3].encode()).hexdigest()[:8], 16) % B
            for j in range(len(s) - 2)
        ]
        best_lang, best = "und", -1.0
        for lang in langs:
            acc = 0  # exact integer micro-weight sum
            for b in bidx:
                acc += _micro(model[lang][b])
            sc = float(acc) / 1000000.0 / float(max(len(bidx), 1))
            if sc > best:
                best_lang, best = lang, sc
        assert got[i]["lang"] == best_lang
        assert got[i]["score"] == round(best, 6) + 0.0
        assert got[i]["n_grams"] == len(bidx)


def test_lang_id_helper_matches_old_fold(spark):
    """The r15 staged lang_id (tokenizer bound once in a transform
    lambda, argmax via array_position — VERDICT r14 #8's ×52-split
    fix) must be value-identical to the old strictly-greater when-fold
    it replaced, including the alphabetical-first tie-break, the
    zero-hit 'und', and NULL/empty/whitespace inputs."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.text import STOPWORDS, lang_id, tokenize

    rows = [
        (0, "the cat and the dog of it is that for"),        # en
        (1, "der hund und die katze ist ein eine zu von"),    # de
        (2, "le chat et la maison est un une dans pour"),     # fr
        (3, "el perro y la casa es un una en por"),           # es
        (4, "la la la"),          # la ∈ fr AND es — tie → alphabetical
        (5, "xyzzy plugh"),       # zero hits → und
        (6, ""),                  # empty → und
        (7, "   "),               # whitespace-only → und
        (8, None),                # NULL → und
        (9, "the der le el"),     # 1 hit each — 4-way tie → 'de' (alpha)
        (10, "y y es es the"),    # es 4 hits beats en 1
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    # the pre-r15 implementation, verbatim semantics
    toks = tokenize(F.lower(F.col("text")))
    old = F.lit("und")
    max_score = F.lit(0)
    for lg in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lg]])
        s = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        old = F.when(s > max_score, F.lit(lg)).otherwise(old)
        max_score = F.when(s > max_score, s).otherwise(max_score)

    got = df.select(
        "doc_id", lang_id(F.col("text")).alias("new"), old.alias("old")
    ).collect()
    for r in got:
        assert r["new"] == r["old"], (r["doc_id"], r["new"], r["old"])
    by_id = {r["doc_id"]: r["new"] for r in got}
    # 'la' ∈ STOPWORDS['fr'] and STOPWORDS['es']: 3 hits each — the
    # strictly-greater fold keeps the first alphabetical ('es'
    # precedes 'fr'; fr's equal score never displaces it)
    assert by_id[4] == "es"
    assert by_id[5] == "und" and by_id[8] == "und"
    assert by_id[9] == "de"


def test_lang_id_ngram_map_only_plan(spark):
    from hdk_spark.operators.text import lang_id_ngram

    df = spark.createDataFrame([(0, "hello there")], "doc_id: long, text: string")
    p = (
        lang_id_ngram(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p and "Join" not in p


def test_train_quality_scorer_feature_impls_agree(spark):
    """The map-only HOF feature path (B<=16) and the explode+groupBy
    path (B>16) must train identical weights — proven by training at
    B=32 (explode path) and comparing against the single-threaded
    reference, which is path-free."""
    from hdk_spark.operators.text import train_quality_scorer

    df = spark.createDataFrame(
        _SCORER_CORPUS, "doc_id: long, text: string, label: int")
    got = train_quality_scorer(df, "label", n_buckets=32, iterations=2,
                               return_history=True)
    want = _ref_train(
        [t for _, t, _ in _SCORER_CORPUS],
        [y for _, _, y in _SCORER_CORPUS], 32, 2, 1.0)
    assert got == want


def test_dataset_report_values(spark):
    from hdk_spark.operators.profile import dataset_report

    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b c", "en"), (3, "x y", "de"),
         (4, "", "de"), (5, None, "fr")],
        "doc_id: long, text: string, lang: string",
    )
    got = {r["metric"]: r["value"] for r in dataset_report(df).collect()}
    assert got["n_docs"] == 5.0
    assert got["total_tokens"] == 8.0  # 3+3+2+0+0
    assert got["mean_tokens"] == 1.6
    assert got["pct_empty"] == 0.4
    # 5 docs, distinct texts = {'a b c','x y',''} + NULL is not counted
    # by COUNT DISTINCT -> 3 -> dup rate 1 - 3/5
    assert got["exact_dup_rate"] == 0.4
    assert got["distinct_langs"] == 3.0
    assert got["top_lang_share"] == 0.4
    # without a lang column
    nolang = {r["metric"] for r in dataset_report(
        df, lang_col=None).collect()}
    assert "top_lang_share" not in nolang and "n_docs" in nolang


def test_fix_text_repairs_and_flags(spark):
    """Planted corruptions are repaired; flags fire on the original."""
    from hdk_spark.operators.text import fix_text

    rows = [
        (1, "cafÃ© dÃ©jÃ\xa0vu â€™s"),
        (2, "plain ascii"),
        (3, "zero​width\xa0nbsp"),
        (4, "ctrl\x01\x1fchar"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in fix_text(df).collect()}
    assert got[1]["text"] == "café déjàvu ’s"
    assert got[1]["had_mojibake"] and not got[1]["had_ctrl"]
    assert got[2]["text"] == "plain ascii" and got[2]["n_removed"] == 0
    assert got[3]["text"] == "zerowidth nbsp"
    assert got[3]["had_ctrl"] and got[3]["had_widespace"]
    assert got[4]["text"] == "ctrlchar" and got[4]["n_removed"] == 2
    assert got[5]["text"] is None and got[5]["had_mojibake"] is None


def test_fix_text_idempotent_on_own_output(spark):
    """A second pass over repaired text is the identity (single-layer
    peel contract: output contains no pattern the chain matches)."""
    from hdk_spark.operators.text import fix_text

    rows = [
        (1, "cafÃ© â€œqâ€¦"),
        (2, "mÃ¼nchen Ã±"),
        (3, "tab\tand\nnewline stay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = fix_text(df)
    twice = fix_text(once.select("doc_id", "text"))
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b
    assert a[3] == "tab\tand\nnewline stay"
    flags = {r["doc_id"]: r for r in twice.collect()}
    assert not any(
        flags[i]["had_mojibake"] or flags[i]["had_ctrl"]
        or flags[i]["had_widespace"]
        for i in a
    )


def test_fix_text_map_only(spark):
    """One codegen projection: no shuffle, no Python."""
    from hdk_spark.operators.text import fix_text

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    p = fix_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Python" not in p


# ---------------------------------------------------------------------------
# annotator_agreement (stats.py)
# ---------------------------------------------------------------------------

def test_annotator_agreement_hand_computed(spark):
    from hdk_spark.operators.stats import annotator_agreement

    # confusion matrix (classic kappa example): 20 yes/yes, 5 yes/no,
    # 10 no/yes, 15 no/no -> n=50, po=0.7, pe=(25*30 + 25*20)/2500=0.5,
    # kappa=0.4
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
        + [("y", None)] * 3  # abstentions excluded
    )
    df = spark.createDataFrame(rows, "a: string, b: string")
    [r] = annotator_agreement(df, "a", "b").collect()
    assert (r["n_items"], r["n_classes"]) == (50, 2)
    assert (r["po"], r["pe"], r["kappa"]) == (0.7, 0.5, 0.4)


def test_annotator_agreement_degenerate_cases(spark):
    from hdk_spark.operators.stats import annotator_agreement

    # perfect agreement on 2+ classes: kappa = 1
    df = spark.createDataFrame(
        [("a", "a")] * 3 + [("b", "b")] * 2, "a: string, b: string"
    )
    [r] = annotator_agreement(df, "a", "b").collect()
    assert r["kappa"] == 1.0
    # both constant and identical: pe = 1 -> kappa NULL (undefined)
    df2 = spark.createDataFrame([("a", "a")] * 4, "a: string, b: string")
    [r2] = annotator_agreement(df2, "a", "b").collect()
    assert r2["kappa"] is None and r2["po"] == 1.0
    # disjoint label sets: diag 0, kappa < 0 bounded sanity
    df3 = spark.createDataFrame(
        [("a", "b")] * 2 + [("b", "a")] * 2, "a: string, b: string"
    )
    [r3] = annotator_agreement(df3, "a", "b").collect()
    assert r3["po"] == 0.0 and r3["kappa"] < 0


def test_fleiss_kappa_textbook_and_mixed_m(spark):
    from hdk_spark.operators.stats import fleiss_kappa

    rows = [
        (1, "a"), (1, "a"), (1, "a"),
        (2, "a"), (2, "b"), (2, "b"),
        (3, "b"), (3, "b"), (3, "c"),
        (4, "a"), (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "item: long, label: string")
    [r] = fleiss_kappa(df, "item", "label").collect()
    # hand: per-item Σn(n−1) = 6, 2, 2, 0 → A=10, po=10/(4·3·2)=0.416667;
    # marginals c = (a:5, b:5, c:2) → B=54, pe=54/144=0.375;
    # kappa=(po−pe)/(1−pe)=0.066667
    assert (r["n_items"], r["n_classes"], r["n_raters"]) == (4, 3, 3)
    assert (r["po"], r["pe"], r["kappa"]) == (0.416667, 0.375, 0.066667)
    assert r["m_constant"] is True

    [r2] = fleiss_kappa(
        spark.createDataFrame(rows + [(5, "a")], "item: long, label: string"),
        "item", "label",
    ).collect()
    assert r2["m_constant"] is False
    assert r2["kappa"] is None and r2["po"] is None and r2["n_raters"] is None


def test_label_merge_majority_and_ties(spark):
    from hdk_spark.operators.stats import label_merge

    rows = [
        (1, "a"), (1, "a"), (1, "b"),          # clear majority a 2/3
        (2, "b"), (2, "a"),                    # tie -> lexicographic a
        (3, "c"), (3, None), (3, "c"),         # NULLs excluded, c 2/2
    ]
    df = spark.createDataFrame(rows, "item: long, label: string")
    got = {r["item"]: (r["label"], r["votes"], r["n_annotations"],
                       r["share"], r["tied"])
           for r in label_merge(df, "item", "label").collect()}
    assert got == {
        1: ("a", 2, 3, 0.666667, False),
        2: ("a", 1, 2, 0.5, True),
        3: ("c", 2, 2, 1.0, False),
    }


def test_lang_id_ngram_keep_collides_with_outputs(spark):
    """keep columns named after the operator's own outputs fail fast at
    the ValueError guard (ADVICE r8) instead of emitting duplicate
    output columns."""
    import pytest

    from hdk_spark.operators.text import lang_id_ngram

    df = spark.createDataFrame(
        [(0, "hello there", "en")], "doc_id: long, text: string, lang: string"
    )
    for col in ("lang", "score", "n_grams"):
        df2 = df.withColumnRenamed("lang", col)
        with pytest.raises(ValueError, match="collide"):
            lang_id_ngram(df2, keep=(col,))


def test_json_schema_gate(spark):
    """Presence + JSON-native type classes without coercion: "5" is
    not an int, explicit null satisfies nothing, malformed/NULL JSON
    fails everything; number accepts int and float; guards."""
    import pytest

    from hdk_spark.operators.profile import json_schema_gate

    rows = [
        (0, '{"a": 5, "b": "x", "c": 1.5, "d": [1], "e": {"k":1}, "f": true}'),
        (1, '{"a": "5", "b": "x", "c": 2, "d": [], "e": {}, "f": false}'),
        (2, '{"b": "x"}'),
        (3, 'not json'),
        (4, '{"a": 5, "b": null}'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, j: string")
    req = {"a": "int", "b": "string", "c": "number", "d": "array",
           "e": "object", "f": "bool"}
    got = {r["doc_id"]: r for r in json_schema_gate(df, "j", req).collect()}
    assert got[0]["valid"] and got[0]["n_failed"] == 0
    g1 = got[1]
    assert not g1["ok_a"] and g1["ok_b"] and g1["ok_c"] and g1["ok_d"] \
        and g1["ok_e"] and g1["ok_f"]
    assert not got[2]["ok_a"] and got[2]["ok_b"]
    assert not got[3]["is_json"] and got[3]["n_failed"] == 6
    assert got[4]["ok_a"] and not got[4]["ok_b"]
    assert not got[5]["is_json"]

    with pytest.raises(ValueError, match="type class"):
        json_schema_gate(df, "j", {"a": "integer"})
    with pytest.raises(ValueError, match="field name"):
        json_schema_gate(df, "j", {"a.b": "int"})
    with pytest.raises(ValueError, match="required"):
        json_schema_gate(df, "j", {})
