

def test_kneser_ney_matches_python_reference(spark):
    """Interpolated KN trigram (Chen & Goodman eq. 4.25) vs an
    independent pure-Python implementation on a corpus with a planted
    'San Francisco' effect: 'francisco' is frequent but only ever
    follows 'san', so its CONTINUATION unigram probability is low —
    the property KN has over raw-count interpolation."""
    import math
    from collections import Counter, defaultdict

    from hdk_spark.operators.text import kneser_ney_logprob

    docs = [
        (0, "we flew to san francisco yesterday"),
        (1, "san francisco is foggy and san francisco is steep"),
        (2, "we walked to the market yesterday"),
        (3, "the market is busy and the streets are steep"),
        (4, "we flew home and walked to the market"),
    ]
    D3 = D2 = 0.75

    def kn_reference(docs):
        tri = Counter()
        for _, t in docs:
            toks = t.lower().split()
            for i in range(2, len(toks)):
                tri[(toks[i - 2], toks[i - 1], toks[i])] += 1
        ctx_c, ctx_n1 = Counter(), Counter()
        cont2 = Counter()
        for (a, b, c), n in tri.items():
            ctx_c[(a, b)] += n
            ctx_n1[(a, b)] += 1
            cont2[(b, c)] += 1
        mid, fol, cont1 = Counter(), Counter(), Counter()
        for (b, c), _n in cont2.items():
            fol[b] += 1
            cont1[c] += 1
        for (a, b, c) in tri:
            mid[b] += 1
        nbb = len(cont2)
        out = {}
        for did, t in docs:
            toks = t.lower().split()
            lps, n = 0.0, 0
            for i in range(2, len(toks)):
                a, b, c = toks[i - 2], toks[i - 1], toks[i]
                p1 = max(cont1.get(c, 0), 1) / nbb
                if b in mid:
                    p2 = (max(cont2.get((b, c), 0) - D2, 0.0) / mid[b]
                          + D2 * fol[b] / mid[b] * p1)
                else:
                    p2 = p1
                if (a, b) in ctx_c:
                    p3 = (max(tri.get((a, b, c), 0) - D3, 0.0) / ctx_c[(a, b)]
                          + D3 * ctx_n1[(a, b)] / ctx_c[(a, b)] * p2)
                else:
                    p3 = p2
                lps += math.log(p3)
                n += 1
            out[did] = (n, round(lps / n, 6))
        return out

    want = kn_reference(docs)
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logprob"])
        for r in kneser_ney_logprob(df).collect()
    }
    assert got == want

    # the KN property itself: p_cont('francisco') is the low unigram
    # continuation — 'francisco' appears 3 times but after only ONE
    # distinct word, so its continuation count is 1 despite frequency
    toks_all = [t.lower().split() for _, t in docs]
    tri_pairs = set()
    for toks in toks_all:
        for i in range(2, len(toks)):
            tri_pairs.add((toks[i - 1], toks[i]))
    assert sum(1 for (_b, c) in tri_pairs if c == "francisco") == 1

    # determinism + cross-scoring path
    model = df.filter("doc_id <= 2")
    cross = kneser_ney_logprob(df, model_df=model)
    a = sorted(map(tuple, cross.collect()))
    b = sorted(map(tuple, kneser_ney_logprob(
        df.repartition(7), model_df=model.repartition(3)).collect()))
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="discounts"):
        kneser_ney_logprob(df, discounts=(1.5, 0.75))


def test_ccnet_kn3_bucket_consistency(spark):
    """model='kn3' buckets follow the rounded-score ordering within
    each language (head >= middle >= tail score ranges) and reject an
    unknown model name."""
    import pytest

    from hdk_spark.operators.text import ccnet_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ccnet_buckets(docs, lang_col="lang", model="kn3").collect()
    assert out
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (-r["avg_logprob"], r["doc_id"]))
        labels = [order[r["bucket"]] for r in rows]
        assert labels == sorted(labels), lang
    with pytest.raises(ValueError, match="model"):
        ccnet_buckets(docs, model="kn5")
