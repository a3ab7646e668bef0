

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
