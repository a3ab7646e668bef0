"""Chat/SFT-format validation — the post-training data counterpart of
the pretraining gates: instruction-tuning corpora are JSON
conversations, and malformed rows (broken JSON, non-alternating roles,
empty contents, wrong terminal role) silently poison a fine-tune long
before loss curves show it. Beyond-reference (intel/hdk has no JSON
surface beyond string ops).

Everything is ``from_json`` + JVM higher-order functions — map-only,
codegen, no Python; a DuckDB oracle checks verdicts against planted
corpora (the contract derives every flag independently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chat_lint", "preference_lint", "chat_loss_mask", "sft_pack_export",
]

_CONV_SCHEMA = "array<struct<role:string,content:string>>"
_KNOWN_ROLES = ("system", "user", "assistant", "tool")


def chat_lint(
    df: DataFrame,
    id_col: str = "doc_id",
    conv_col: str = "conversation",
) -> DataFrame:
    """Per-conversation lint verdicts for chat-format training rows
    (JSON array of ``{role, content}`` turns):

    - ``parsed``       — the JSON parsed to a non-empty turn array
    - ``n_turns``      — turn count (0 when unparsed)
    - ``first_role``   — role of turn 1 ('' when unparsed)
    - ``starts_ok``    — first turn is ``user``, or ``system`` followed
      by ``user`` (the standard template shapes)
    - ``alternates``   — no two adjacent turns share a role
    - ``no_empty``     — every content is non-blank
    - ``roles_known``  — every role ∈ {system, user, assistant, tool}
    - ``ends_assistant`` — last turn is the model's (what a loss mask
      ultimately trains on)
    - ``valid``        — all of the above

    Scale shape: ONE map-only projection (from_json + HOFs) — lint at
    any corpus size is a scan, never a shuffle. Filter ``valid`` to
    gate; keep the flags for per-failure observability."""
    arr = F.from_json(F.col(conv_col), _CONV_SCHEMA)
    n = F.size(arr)
    parsed = arr.isNotNull() & (n > 0) & ~F.exists(
        arr, lambda t: t["role"].isNull()
    )
    first_role = F.try_element_at(arr, F.lit(1))["role"]
    second_role = F.when(n >= 2, F.try_element_at(arr, F.lit(2))["role"])
    starts_ok = (first_role == "user") | (
        (first_role == "system") & (second_role == "user")
    )
    # n == 1 is vacuously alternating; the guard also avoids
    # sequence(1, 0), which Spark generates DESCENDING ([1, 0]) and
    # whose index 0 would fault strict element_at
    alternates = F.when(n < 2, F.lit(True)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.try_element_at(arr, i.cast("int"))["role"]
                == F.try_element_at(arr, (i + 1).cast("int"))["role"],
            )
        )
        == 0
    )
    no_empty = ~F.exists(
        arr,
        lambda t: t["content"].isNull()
        | (F.length(F.trim(t["content"])) == 0),
    )
    roles_known = ~F.exists(
        arr, lambda t: ~t["role"].isin(*_KNOWN_ROLES)
    )
    ends_assistant = F.try_element_at(arr, F.lit(-1))["role"] == "assistant"
    flags = [starts_ok, alternates, no_empty, roles_known, ends_assistant]
    valid = parsed
    for fl in flags:
        valid = valid & F.coalesce(fl, F.lit(False))
    return df.select(
        F.col(id_col),
        F.coalesce(parsed, F.lit(False)).alias("parsed"),
        F.when(parsed, n).otherwise(F.lit(0)).cast("long").alias("n_turns"),
        F.when(parsed, first_role).otherwise(F.lit("")).alias("first_role"),
        *[
            F.when(parsed, F.coalesce(fl, F.lit(False)))
            .otherwise(F.lit(False))
            .alias(name)
            for fl, name in zip(
                flags,
                ["starts_ok", "alternates", "no_empty", "roles_known",
                 "ends_assistant"],
            )
        ],
        F.coalesce(valid, F.lit(False)).alias("valid"),
    )


def preference_lint(
    df: DataFrame,
    id_col: str = "doc_id",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """Preference-pair (RLHF/DPO) validation: a training pair is two
    conversations sharing the SAME context with DIFFERENT final
    assistant responses — rows violating that silently corrupt a
    reward model or DPO loss. Per pair:

    - ``both_parsed``    — both sides parse to non-empty turn arrays
    - ``same_length``    — equal turn counts
    - ``same_prefix``    — all turns before the last are identical
    - ``both_end_assistant`` — both finals are assistant turns
    - ``responses_differ``   — the final contents are NOT equal
    - ``valid``          — all of the above

    Map-only (from_json + array slicing); one scan at any corpus
    size."""
    a = F.from_json(F.col(chosen_col), _CONV_SCHEMA)
    b = F.from_json(F.col(rejected_col), _CONV_SCHEMA)
    na, nb = F.size(a), F.size(b)
    both_parsed = a.isNotNull() & b.isNotNull() & (na > 0) & (nb > 0)
    same_length = na == nb
    # a 1-turn chosen side is only vacuously prefix-equal when the
    # rejected side is ALSO 1 turn — (na=1, nb>=2) has a non-empty
    # differing prefix and must report FALSE (ADVICE r6: `valid` was
    # already right via same_length, but the per-flag observability
    # column misreported the defect class)
    same_prefix = F.when((na == 1) & (nb == 1), F.lit(True)).otherwise(
        F.slice(a, 1, na - 1) == F.slice(b, 1, nb - 1)
    )
    la = F.try_element_at(a, F.lit(-1))
    lb = F.try_element_at(b, F.lit(-1))
    both_end_assistant = (la["role"] == "assistant") & (
        lb["role"] == "assistant"
    )
    responses_differ = ~(
        la["content"].eqNullSafe(lb["content"])
    )
    flags = [same_length, same_prefix, both_end_assistant,
             responses_differ]
    valid = both_parsed
    for fl in flags:
        valid = valid & F.coalesce(fl, F.lit(False))
    return df.select(
        F.col(id_col),
        F.coalesce(both_parsed, F.lit(False)).alias("both_parsed"),
        *[
            F.when(both_parsed, F.coalesce(fl, F.lit(False)))
            .otherwise(F.lit(False))
            .alias(name)
            for fl, name in zip(
                flags,
                ["same_length", "same_prefix", "both_end_assistant",
                 "responses_differ"],
            )
        ],
        F.coalesce(valid, F.lit(False)).alias("valid"),
    )


def chat_loss_mask(
    df: DataFrame,
    id_col: str = "doc_id",
    conv_col: str = "conversation",
) -> DataFrame:
    """Render chat conversations to a training token stream WITH the
    per-token loss mask — the supervised-fine-tuning sample builder:
    each turn contributes a role header token ``<|role|>`` (mask 0)
    followed by its whitespace-tokenized content, masked 1 ONLY for
    assistant turns (the model trains on its own replies, attends to
    everything). Compose downstream with the real tokenizers by
    re-tokenizing per piece; the mask is defined per rendered token.

    Returns (id, n_tokens, n_trainable, tokens array<string>,
    loss_mask array<int>) — arrays index-aligned; an unparseable or
    NULL conversation yields empty arrays with zero counts
    (totality), and a blank content contributes just its header.

    Scale shape: ONE map-only projection (from_json + nested HOF
    flatten) — no explode, no shuffle, whole-stage codegen except the
    JSON parse."""
    arr = F.from_json(F.col(conv_col), _CONV_SCHEMA)
    parsed = arr.isNotNull() & (F.size(arr) > 0) & ~F.exists(
        arr, lambda t: t["role"].isNull()
    )

    def content_toks(t):
        c = F.coalesce(t["content"], F.lit(""))
        return F.when(
            F.length(F.trim(c)) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(c), r"\s+"))

    toks = F.flatten(
        F.transform(
            arr,
            lambda t: F.concat(
                F.array(F.concat(F.lit("<|"), t["role"], F.lit("|>"))),
                content_toks(t),
            ),
        )
    )
    mask = F.flatten(
        F.transform(
            arr,
            lambda t: F.concat(
                F.array(F.lit(0)),
                F.transform(
                    content_toks(t),
                    lambda _x: F.when(
                        t["role"] == "assistant", F.lit(1)
                    ).otherwise(F.lit(0)),
                ),
            ),
        )
    )
    empty_s = F.array().cast("array<string>")
    empty_i = F.array().cast("array<int>")
    toks_out = F.when(parsed, toks).otherwise(empty_s)
    mask_out = F.when(parsed, mask).otherwise(empty_i)
    return df.select(
        F.col(id_col),
        F.size(toks_out).cast("long").alias("n_tokens"),
        F.aggregate(
            mask_out, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("n_trainable"),
        toks_out.alias("tokens"),
        mask_out.alias("loss_mask"),
    )


def sft_pack_export(
    df: DataFrame,
    conversation_col: str = "conversation",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 16,
    seed: int = 0,
) -> DataFrame:
    """The SFT export funnel as one operator: render conversations to
    (tokens, loss_mask) pairs (:func:`chat_loss_mask`), greedy-pack
    documents into fixed-budget chunks
    (:func:`hdk_spark.operators.packing.pack_sequences`), and
    REASSEMBLE each chunk's token and mask streams in pack order —
    the stage handoff a training job actually consumes, where the
    thing that rots silently is mask/token alignment across the
    pack boundary (pinned here: both streams flatten from the SAME
    ordered struct list, so they cannot drift).

    Empty conversations (unparseable, no messages) drop before
    packing — a zero-token doc would pad chunks with nothing.

    Returns one row per chunk: (shard, chunk_id, n_docs, n_tokens,
    n_trainable, tokens, loss_mask), with documents in the packer's
    deterministic (hash, id) order inside each chunk.

    Scale shape: loss-mask rendering is map-only; packing is ONE
    window on the shard key; the mask relation joins back by id and
    ONE partial-agg groupBy on (shard, chunk) builds the chunk —
    token payloads shuffle once, at the final group.
    """
    from hdk_spark.operators.packing import pack_sequences
    from hdk_spark.operators.sampling import hash_bucket

    lm = chat_loss_mask(df, id_col, conversation_col).filter(
        F.col("n_tokens") > 0
    )
    plan = pack_sequences(
        lm.select(id_col, "n_tokens"), id_col, "n_tokens",
        budget=budget, n_shards=n_shards, seed=seed,
    )
    joined = plan.select(id_col, "shard", "chunk_id").join(
        lm.select(
            id_col,
            hash_bucket(F.col(id_col), 1_000_000_007, seed).alias("__h"),
            "tokens", "loss_mask", "n_tokens", "n_trainable",
        ),
        id_col,
    )
    packed = joined.groupBy("shard", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_trainable").cast("long").alias("n_trainable"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__h"), F.col(id_col).alias("__id"),
                    F.col("tokens"), F.col("loss_mask"),
                )
            )
        ).alias("__docs"),
    )
    return packed.select(
        "shard", "chunk_id", "n_docs", "n_tokens", "n_trainable",
        F.flatten(
            F.transform(F.col("__docs"), lambda s: s["tokens"])
        ).alias("tokens"),
        F.flatten(
            F.transform(F.col("__docs"), lambda s: s["loss_mask"])
        ).alias("loss_mask"),
    )
