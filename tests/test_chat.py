"""Chat-format lint verdicts on planted conversations."""

import json

import pytest
from pyspark.sql import functions as F

from hdk_spark.operators.chat import chat_lint


def _conv(*turns):
    return json.dumps([{"role": r, "content": c} for r, c in turns])


def test_chat_lint_verdicts(spark):
    rows = [
        (1, _conv(("user", "hi"), ("assistant", "hello"))),
        (2, _conv(("system", "be nice"), ("user", "hi"),
                  ("assistant", "hello"))),
        (3, _conv(("user", "a"), ("user", "b"), ("assistant", "c"))),
        (4, _conv(("user", "a"), ("assistant", "  "))),
        (5, _conv(("user", "a"), ("frobnicator", "b"))),
        (6, _conv(("user", "a"), ("assistant", "b"), ("user", "again"))),
        (7, '{"broken": '),
        (8, _conv(("assistant", "i speak first"), ("user", "??"))),
        (9, None),
        (10, "[]"),
        (11, _conv(("assistant", "single turn"),)),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, conversation: string")
    got = {r["doc_id"]: r for r in chat_lint(df).collect()}
    ok = got[1]
    assert ok["valid"] and ok["n_turns"] == 2 and ok["first_role"] == "user"
    assert got[2]["valid"] and got[2]["starts_ok"]       # system prefix ok
    assert not got[3]["alternates"] and not got[3]["valid"]
    assert not got[4]["no_empty"] and not got[4]["valid"]
    assert not got[5]["roles_known"] and not got[5]["valid"]
    assert not got[6]["ends_assistant"] and not got[6]["valid"]
    assert not got[7]["parsed"] and got[7]["n_turns"] == 0
    assert got[7]["first_role"] == "" and not got[7]["valid"]
    assert not got[9]["parsed"] and not got[9]["valid"]
    assert not got[10]["parsed"]  # empty conversation is not trainable
    assert not got[8]["starts_ok"] and not got[8]["valid"]
    # single-turn: vacuously alternating, wrong opener, right closer
    assert got[11]["alternates"] and got[11]["ends_assistant"]
    assert not got[11]["starts_ok"] and not got[11]["valid"]


def test_chat_lint_map_only_plan(spark):
    df = spark.createDataFrame(
        [(1, '[{"role":"user","content":"x"}]')],
        "doc_id: long, conversation: string")
    p = chat_lint(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_preference_lint_verdicts(spark):
    from hdk_spark.operators.chat import preference_lint

    ok_c = _conv(("user", "q"), ("assistant", "good answer"))
    ok_r = _conv(("user", "q"), ("assistant", "bad answer"))
    rows = [
        (1, ok_c, ok_r),                                     # valid
        (2, ok_c, _conv(("user", "DIFFERENT"),
                        ("assistant", "bad"))),              # prefix drift
        (3, ok_c, ok_c),                                     # same response
        (4, ok_c, _conv(("user", "q"), ("user", "oops"))),   # rejected ends user
        (5, ok_c, _conv(("user", "q"), ("assistant", "x"),
                        ("user", "extra"))),                 # length drift
        (6, ok_c, '{"broken"'),                              # unparsed
        # ADVICE r6: 1-turn chosen vs 2-turn rejected has a NON-empty
        # differing prefix — same_prefix must not be vacuously TRUE
        (7, _conv(("assistant", "solo")),
            _conv(("user", "ctx"), ("assistant", "other"))),
        # both 1-turn: prefix IS vacuously equal
        (8, _conv(("assistant", "a")), _conv(("assistant", "b"))),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, chosen: string, rejected: string")
    got = {r["doc_id"]: r for r in preference_lint(df).collect()}
    assert got[1]["valid"] and got[1]["responses_differ"]
    assert not got[2]["same_prefix"] and not got[2]["valid"]
    assert not got[3]["responses_differ"] and not got[3]["valid"]
    assert not got[4]["both_end_assistant"] and not got[4]["valid"]
    assert not got[5]["same_length"] and not got[5]["valid"]
    assert not got[6]["both_parsed"] and not got[6]["valid"]
    assert not got[7]["same_prefix"] and not got[7]["valid"]
    assert got[8]["same_prefix"] and got[8]["valid"]


def test_preference_lint_map_only_plan(spark):
    from hdk_spark.operators.chat import preference_lint

    df = spark.createDataFrame(
        [(1, "[]", "[]")], "doc_id: long, chosen: string, rejected: string")
    p = preference_lint(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p


def test_sft_pack_export_alignment(spark):
    """The SFT funnel invariant: every chunk's token and mask streams
    have identical length, trainable counts survive packing, chunks
    respect budget + one-overflow, unparseable conversations drop,
    and the whole thing is deterministic under repartition."""
    import json

    from hdk_spark.operators.chat import sft_pack_export

    convs = [
        (i, json.dumps([
            {"role": "user", "content": f"q{i} tell me"},
            {"role": "assistant", "content": f"a{i} ok fine then"},
        ]))
        for i in range(40)
    ] + [(100, None), (101, "broken json")]
    df = spark.createDataFrame(convs, "doc_id: long, conversation: string")
    rows = sft_pack_export(df, budget=30, n_shards=3, seed=0).collect()
    assert sum(r["n_docs"] for r in rows) == 40  # null/broken dropped
    max_doc = 9  # 2 headers + 3 + 4 content tokens
    for r in rows:
        assert len(r["tokens"]) == len(r["loss_mask"]) == r["n_tokens"]
        assert sum(r["loss_mask"]) == r["n_trainable"]
        assert r["n_tokens"] <= 30 + max_doc
        # headers never train even after the pack concat
        for t, m in zip(r["tokens"], r["loss_mask"]):
            if t.startswith("<|"):
                assert m == 0

    again = sft_pack_export(df.repartition(7), budget=30, n_shards=3,
                            seed=0).collect()
    key = lambda r: (r["shard"], r["chunk_id"])  # noqa: E731
    assert sorted((key(r), list(r["tokens"])) for r in again) == \
        sorted((key(r), list(r["tokens"])) for r in rows)
