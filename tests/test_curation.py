

def test_dedup_doc_lines_map_only_and_totality(spark):
    from pyspark.sql import functions as F

    from hdk_spark.operators.text import dedup_doc_lines

    df = spark.createDataFrame(
        [(0, "a\nb\na\nc\nb"), (1, None), (2, ""), (3, "x\nx\nx")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in dedup_doc_lines(df).collect()}
    assert got[0]["text"] == "a\nb\nc" and got[0]["n_removed"] == 2
    assert got[1]["text"] is None and got[1]["n_lines"] == 0
    assert got[2]["text"] == "" and got[2]["n_removed"] == 0
    assert got[3]["text"] == "x" and got[3]["n_removed"] == 2
    p = dedup_doc_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Generate" not in p  # map-only


def test_chat_loss_mask_totality_and_alignment(spark):
    import json

    from hdk_spark.operators.chat import chat_loss_mask

    convs = [
        (0, json.dumps([{"role": "user", "content": "hi there"},
                        {"role": "assistant", "content": "hello friend !"}])),
        (1, None),
        (2, "not json"),
        (3, json.dumps([{"role": "system", "content": ""},
                        {"role": "user", "content": "q"},
                        {"role": "assistant", "content": "a b"}])),
        (4, json.dumps([{"role": "tool", "content": "result 42"},
                        {"role": "assistant", "content": "ok"}])),
    ]
    df = spark.createDataFrame(convs, "doc_id: long, conversation: string")
    got = {r["doc_id"]: r for r in chat_loss_mask(df).collect()}
    for r in got.values():
        assert len(r["tokens"]) == len(r["loss_mask"]) == r["n_tokens"]
        assert sum(r["loss_mask"]) == r["n_trainable"]
        # headers never train; only assistant content does
        for t, m in zip(r["tokens"], r["loss_mask"]):
            if t.startswith("<|"):
                assert m == 0
    assert got[0]["loss_mask"] == [0, 0, 0, 0, 1, 1, 1]
    assert got[1]["n_tokens"] == 0 and got[2]["n_tokens"] == 0
    assert got[3]["tokens"][0] == "<|system|>" and got[3]["n_trainable"] == 2
    assert got[4]["loss_mask"] == [0, 0, 0, 0, 1]  # tool content masked 0
    p = chat_loss_mask(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Generate" not in p


def test_span_corruption_reconstruction_and_budget(spark):
    """Denoising pairs: substituting each sentinel's target span back
    into the inputs reproduces the original tokens EXACTLY for every
    length 1..60; the noise budget matches the rounded density; spans
    partition the budget; deterministic under repartition."""
    from hdk_spark.operators.denoise import span_corruption

    rows = [(i, [f"t{i}_{j}" for j in range(i)]) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<string>")
    out = span_corruption(df).collect()
    orig = dict(rows)
    for r in out:
        L = r["n_tokens"]
        assert r["n_noise"] == (L * 3 + 10) // 20
        spans, cur = {}, None
        for t in r["targets"]:
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        if r["n_spans"]:
            # final sentinel closes the targets and hides nothing
            assert r["targets"][-1] == f"<extra_id_{r['n_spans']}>"
            hidden = sum(len(v) for v in spans.values())
            assert hidden == min(r["n_noise"], L) or hidden <= r["n_noise"]
        rebuilt = []
        for t in r["inputs"]:
            if t.startswith("<extra_id_") and t in spans:
                rebuilt.extend(spans[t])
            else:
                rebuilt.append(t)
        assert rebuilt == orig[r["doc_id"]], r["doc_id"]

    again = span_corruption(df.repartition(7)).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted([tuple(map(tuple, (r["inputs"], r["targets"])))
                   for r in again]) == sorted(
        [tuple(map(tuple, (r["inputs"], r["targets"]))) for r in out])

    import pytest

    with pytest.raises(ValueError, match="density"):
        span_corruption(df, density=(21, 20))
    p = span_corruption(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Generate" not in p


def test_fim_reconstruction_and_modes(spark):
    """FIM: for applied rows, stripping sentinels and reordering the
    (prefix, suffix, middle) segments reproduces the original tokens
    exactly in both framings; passthrough rows are untouched;
    deterministic under repartition; rate=(1,1) applies everywhere."""
    import pytest

    from hdk_spark.operators.denoise import fim_transform

    rows = [(i, [f"t{j}" for j in range(i % 23)]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<string>")
    orig = dict(rows)

    def rebuild(out_tokens, mode):
        seg, segs = None, {"<fim_prefix>": [], "<fim_suffix>": [],
                           "<fim_middle>": []}
        for t in out_tokens:
            if t in segs:
                seg = t
            else:
                segs[seg].append(t)
        return (segs["<fim_prefix>"] + segs["<fim_middle>"]
                + segs["<fim_suffix>"])

    for mode in ("psm", "spm"):
        out = fim_transform(df, rate=(1, 1), mode=mode).collect()
        for r in out:
            assert r["fim_applied"] == 1
            assert 0 <= r["cut_a"] <= r["cut_b"] <= r["n_tokens"]
            assert rebuild(r["out"], mode) == orig[r["doc_id"]], r["doc_id"]

    half = {r["doc_id"]: r for r in fim_transform(df).collect()}
    assert any(r["fim_applied"] == 0 for r in half.values())
    assert any(r["fim_applied"] == 1 for r in half.values())
    for r in half.values():
        if not r["fim_applied"]:
            assert list(r["out"]) == orig[r["doc_id"]]
            assert r["cut_a"] == r["cut_b"] == -1

    again = {r["doc_id"]: r
             for r in fim_transform(df.repartition(5)).collect()}
    assert {k: list(v["out"]) for k, v in again.items()} == {
        k: list(v["out"]) for k, v in half.items()}

    with pytest.raises(ValueError, match="rate"):
        fim_transform(df, rate=(3, 2))
    with pytest.raises(ValueError, match="mode"):
        fim_transform(df, mode="mps")
    p = fim_transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Generate" not in p


def test_mlm_mask_invariants(spark):
    """MLM: labels are non-NULL exactly at selected positions
    (n_selected of them); every divergence between masked and original
    happens at a selected position; unselected positions pass through;
    the corruption mix contains [MASK], random-replacement, and
    keep-unchanged cases at 30%; deterministic under repartition."""
    import pytest

    from hdk_spark.operators.denoise import mlm_mask

    rows = [(i, [f"t{j}" for j in range(i % 29)]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<string>")
    orig = dict(rows)
    out = mlm_mask(df, select_pct=30).collect()
    saw_mask = saw_rand = saw_keep = False
    for r in out:
        o = orig[r["doc_id"]]
        assert len(r["masked"]) == len(r["labels"]) == len(o)
        assert sum(x is not None for x in r["labels"]) == r["n_selected"]
        for j, (m, lab) in enumerate(zip(r["masked"], r["labels"])):
            if lab is None:
                assert m == o[j]  # unselected: untouched
            else:
                assert lab == o[j]  # label = original
                if m == "[MASK]":
                    saw_mask = True
                elif m == o[j]:
                    saw_keep = True
                else:
                    assert m.startswith("r")
                    saw_rand = True
    assert saw_mask and saw_rand and saw_keep

    again = mlm_mask(df.repartition(7), select_pct=30).collect()
    assert sorted((r["doc_id"], tuple(r["masked"])) for r in again) == \
        sorted((r["doc_id"], tuple(r["masked"])) for r in out)

    with pytest.raises(ValueError, match="select_pct"):
        mlm_mask(df, select_pct=101)
    with pytest.raises(ValueError, match="random_tokens"):
        mlm_mask(df, random_tokens=())
    p = mlm_mask(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Generate" not in p


def test_blocklist_gate(spark):
    """Word-boundary matching (edge punctuation stripped, case
    folded), hit multiset vs distinct audit set, max_hits policy,
    NULL/empty totality, map-only plan, empty-terms guard."""
    import pytest

    from hdk_spark.operators.text import blocklist_gate

    rows = [(0, "The BAD word, and (worse)!"), (1, "all clean here"),
            (2, None), (3, ""), (4, "bad bad worse"),
            (5, "embedded badword stays unmatched")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in blocklist_gate(df, ["bad", "WORSE"]).collect()}
    assert got[0]["n_hits"] == 2 and got[0]["blocked"]
    assert list(got[0]["hit_terms"]) == ["bad", "worse"]
    assert got[1]["n_hits"] == 0 and not got[1]["blocked"]
    assert got[2]["n_tokens"] == 0 and not got[2]["blocked"]
    assert got[3]["n_tokens"] == 0
    assert got[4]["n_hits"] == 3 and list(got[4]["hit_terms"]) == ["bad", "worse"]
    assert got[5]["n_hits"] == 0  # substring must not match

    tol = {r["doc_id"]: r["blocked"]
           for r in blocklist_gate(df, ["bad", "worse"], max_hits=2).collect()}
    assert not tol[0] and tol[4]  # 2 hits tolerated, 3 not

    plan = blocklist_gate(df, ["bad"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan

    with pytest.raises(ValueError, match="terms"):
        blocklist_gate(df, [])


def test_ngram_overlap_score_reference(spark):
    """BLEU-2 against a pure-Python reference (clipped precisions,
    brevity penalty, sqrt geometric mean) on the classic clipping
    example and random-ish pairs; NULL/empty totality; map-only."""
    import math
    from collections import Counter

    from hdk_spark.operators.text import ngram_overlap_score

    def py_bleu(ref, hyp):
        tr = ref.lower().split() if ref and ref.strip() else []
        th = hyp.lower().split() if hyp and hyp.strip() else []

        def pn(n):
            gh = [" ".join(th[i:i + n]) for i in range(len(th) - n + 1)]
            gr = [" ".join(tr[i:i + n]) for i in range(len(tr) - n + 1)]
            if not gh:
                return None
            ch, cr = Counter(gh), Counter(gr)
            return sum(min(c, cr[g]) for g, c in ch.items()) / len(gh)

        p1, p2 = pn(1), pn(2)
        if p1 is None or p2 is None:
            return len(tr), len(th), p1, p2, None
        bp = 1.0 if len(th) >= len(tr) else math.exp(1 - len(tr) / len(th))
        return len(tr), len(th), p1, p2, bp * math.sqrt(p1 * p2)

    rows = [
        (0, "the cat sat on the mat", "the cat sat on the mat"),
        (1, "the cat sat on the mat", "the the the the"),
        (2, "a b c d", "a b"),
        (3, "x y", "q r s"),
        (4, None, "a"), (5, "a", ""),
        (6, "w0 w1 w2 w3 w4", "w2 w3 w4 w5"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, ref: string, hyp: string")
    got = {r["doc_id"]: r
           for r in ngram_overlap_score(df, "ref", "hyp").collect()}
    for i, ref, hyp in rows:
        rl, hl, p1, p2, b = py_bleu(ref, hyp)
        g = got[i]
        assert (g["ref_len"], g["hyp_len"]) == (rl, hl), i
        for col, want in (("p1", p1), ("p2", p2), ("bleu2", b)):
            if want is None:
                assert g[col] is None, (i, col)
            else:
                assert abs(g[col] - round(want, 6)) < 1e-9, (i, col)

    plan = ngram_overlap_score(df, "ref", "hyp")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan


def test_denoise_hash_keys_survive_huge_ids(spark):
    """Regression (10x smoke, ANSI ARITHMETIC_OVERFLOW): composite
    hash keys id*1000003+j overflow int64 inside hash_bucket's Knuth
    multiply at 1e8-scale ids. The pre-mod reduction must keep every
    sampler total at 1e11-scale ids AND value-identical to the small-id
    formula (mod-equivalence, checked against the raw-Python hash)."""
    from hdk_spark.operators.denoise import (
        fim_transform,
        mlm_mask,
        span_corruption,
    )

    big = 10 ** 11 + 7
    rows = [(big + i, [f"t{j}" for j in range(12)]) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<string>")
    f = fim_transform(df).collect()
    assert len(f) == 4
    for r in f:
        if r["fim_applied"]:
            MOD, MULT = 1_000_000_007, 2654435761
            did = r["doc_id"]
            hs = [((did % MOD * 1_000_003 + s) % MOD * MULT + 13)
                  % MOD % MOD % 13 for s in (1, 2)]
            ps = sorted(h % 13 for h in
                        [((did % MOD * 1_000_003 + s) % MOD * MULT + 13)
                         % MOD for s in (1, 2)])
            assert [r["cut_a"], r["cut_b"]] == ps
    assert len(mlm_mask(df).collect()) == 4
    assert len(span_corruption(df).collect()) == 4


def test_char_entropy_closed_form(spark):
    """Entropy matches closed forms (uniform k chars -> log2 k,
    constant -> 0), the modal ratio, NULL/empty totality, repartition
    determinism, map-only plan."""
    import math

    from hdk_spark.operators.text import char_entropy

    rows = [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, None), (4, ""),
            (5, "hello world"), (6, "aab")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert got[0]["entropy_bits"] == 0.0 and got[0]["max_char_ratio"] == 1.0
    assert got[1]["entropy_bits"] == 1.0
    assert got[2]["entropy_bits"] == 2.0 and got[2]["n_distinct"] == 4
    assert got[3]["entropy_bits"] is None and got[4]["entropy_bits"] is None
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[6]["entropy_bits"] - round(h, 6)) < 1e-9
    assert abs(got[6]["max_char_ratio"] - round(2 / 3, 6)) < 1e-12

    again = {r["doc_id"]: r for r in char_entropy(df.repartition(5)).collect()}
    assert again == got
    plan = char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan


def test_fold_homoglyphs(spark):
    """Cyrillic/Greek lookalikes fold to latin; fold count is the
    spam signal; clean/NULL text untouched; map-only; src/dst maps
    stay in lockstep."""
    from hdk_spark.operators.text import (
        _HOMOGLYPH_DST,
        _HOMOGLYPH_SRC,
        fold_homoglyphs,
    )

    assert len(_HOMOGLYPH_SRC) == len(_HOMOGLYPH_DST)
    assert len(set(_HOMOGLYPH_SRC)) == len(_HOMOGLYPH_SRC)
    rows = [(0, "frее mоnеy"), (1, "clean"),
            (2, None), (3, "АВЕ maria"),
            (4, "αlpha")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: (r["text"], r["n_folded"])
           for r in fold_homoglyphs(df).collect()}
    assert got[0] == ("free money", 4)
    assert got[1] == ("clean", 0)
    assert got[2] == (None, 0)
    assert got[3] == ("ABE maria", 3)
    assert got[4] == ("alpha", 1)
    plan = fold_homoglyphs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan


def test_zipf_fit(spark):
    """Planted 1/r corpus fits slope ~ -1 (least-squares reference
    equality); uniform frequencies fit slope 0; degenerate vocab ->
    NULL; repartition determinism; k guard."""
    import math

    import pytest

    from hdk_spark.operators.text import zipf_fit

    doc = []
    for r in range(1, 51):
        doc.extend([f"t{r:03d}"] * round(1000 / r))
    df = spark.createDataFrame([(0, " ".join(doc))],
                               "doc_id: long, text: string")
    got = zipf_fit(df, k=50).collect()[0]
    assert got["n_terms"] == 50
    assert abs(got["slope"] + 1.0) < 0.01

    # python least-squares on the same quantized inputs
    pts = [(math.log(r), math.log(round(1000 / r))) for r in range(1, 51)]
    q = lambda v: round(v * 1e9) / 1e9  # noqa: E731
    sx = sum(q(x) for x, _ in pts)
    sy = sum(q(y) for _, y in pts)
    sxy = sum(q(x * y) for x, y in pts)
    sxx = sum(q(x * x) for x, _ in pts)
    n = len(pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(got["slope"] - round(slope, 6)) < 1e-9

    uni = spark.createDataFrame(
        [(0, " ".join(f"u{i} u{i}" for i in range(30)))],
        "doc_id: long, text: string")
    assert abs(zipf_fit(uni, k=30).collect()[0]["slope"]) < 1e-9

    deg = spark.createDataFrame([(0, "same same same")],
                                "doc_id: long, text: string")
    assert zipf_fit(deg, k=10).collect()[0]["slope"] is None

    big = spark.createDataFrame(
        [(i, " ".join(doc[i::7])) for i in range(7)],
        "doc_id: long, text: string")
    a = zipf_fit(big, k=40).collect()[0]
    b = zipf_fit(big.repartition(5), k=40).collect()[0]
    assert a == b

    with pytest.raises(ValueError, match="k"):
        zipf_fit(df, k=1)


def test_rouge_n_reference_equality(spark):
    """rouge_n == a pure-Python clipped-count reference on hand cases:
    the classic clipping example (repeated 'the'), identical pair ->
    all 1.0, disjoint -> all 0.0, short-hypothesis NULL precision,
    short-reference NULL recall, n=1 vs n=2 divergence."""
    from collections import Counter

    import pytest

    from hdk_spark.operators.text import rouge_n

    def ref_rouge(ref, hyp, n):
        def gr(s):
            t = s.strip().lower().split()
            return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
        r, h = Counter(gr(ref)), Counter(gr(hyp))
        c = sum(min(h[g], r[g]) for g in h)
        nr, nh = sum(r.values()), sum(h.values())
        p = round(c / nh, 6) + 0 if nh else None
        rec = round(c / nr, 6) + 0 if nr else None
        if p is None or rec is None:
            f1 = None
        elif p + rec == 0:
            f1 = 0.0
        else:
            f1 = round(2 * p * rec / (p + rec), 6) + 0
        return (nr, nh, p, rec, f1)

    cases = [
        ("the cat sat on the mat", "the the the the the the the"),
        ("a b c d", "a b c d"),
        ("a b c d", "x y z w"),
        ("a b c d e f", "b c"),
        ("ab", "ab cd ef"),
        ("", "a b"),
        ("a b", ""),
    ]
    df = spark.createDataFrame(
        [(i, r, h) for i, (r, h) in enumerate(cases)],
        "doc_id: long, ref: string, hyp: string",
    )
    for n in (1, 2):
        got = {r["doc_id"]: (r["ref_grams"], r["hyp_grams"],
                             r["precision"], r["recall"], r["f1"])
               for r in rouge_n(df, "ref", "hyp", n=n).collect()}
        for i, (ref, hyp) in enumerate(cases):
            exp = ref_rouge(ref, hyp, n)
            # Spark reference: approximate float equality is NOT used;
            # both sides round6 the same double arithmetic
            assert got[i] == exp, (n, i, got[i], exp)

    with pytest.raises(ValueError, match="n must be"):
        rouge_n(df, "ref", "hyp", n=0)
