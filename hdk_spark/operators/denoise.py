"""Denoising-objective sample builder — T5/UL2-style span corruption
(Raffel et al. 2020 §3.1.4): mask contiguous token spans, replace each
with a sentinel in the input, and emit the spans after their sentinels
as the target. This module builds the (inputs, targets) pairs
deterministically — the repo's hash-derived "randomness" contract, so
recomputes, repartitions, and the SQL oracle all reproduce the same
corruption.

Deterministic scheme (documented as THIS operator's contract — the
paper samples spans randomly; determinism changes the sampler, not the
objective): with L tokens, noise density num/den and mean span length
m, the noise budget is n_noise = (L·num + den/2) div den and the span
count n_spans = max(n_noise div m, 1) (0 when n_noise = 0). The
document is cut into n_spans equal integer windows; window k hides a
span of length len_k = n_noise div n_spans (+1 for the first
n_noise mod n_spans windows, an exact partition of the budget) whose
start offset inside the window is the Knuth hash of (id, k) modulo the
legal positions (clamped to the window when a window is shorter than
its span — extreme densities degrade gracefully).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hdk_spark.operators.sampling import hash_bucket

__all__ = ["span_corruption"]


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    density: "tuple[int, int]" = (3, 20),
    mean_span: int = 3,
    seed: int = 11,
) -> DataFrame:
    """Build (inputs, targets) denoising pairs from tokenized
    documents: inputs = the unmasked tokens with ``<extra_id_k>``
    sentinels where span k was removed; targets = each sentinel
    followed by its hidden span, closed by a final
    ``<extra_id_{n}>`` (the T5 target framing). Empty docs yield
    empty pairs (totality).

    Returns (id, n_tokens, n_noise, n_spans, inputs, targets).

    Scale shape: ONE map-only projection — all span arithmetic is
    integer expressions over the token count, fragments are
    slice/flatten HOFs, the per-(id, k) hash is the repo's arithmetic
    Knuth hash; no explode, no shuffle, no Python at any corpus
    size."""
    num, den = (int(x) for x in density)
    if not (0 <= num <= den and den > 0):
        raise ValueError(f"density must be a fraction in [0,1], got {density}")
    if mean_span < 1:
        raise ValueError(f"mean_span must be >= 1, got {mean_span}")

    toks = F.col(tokens_col)
    L = F.size(toks)
    n_noise = F.expr(f"(size({tokens_col}) * {num} + {den // 2}) div {den}")
    n_spans = F.when(n_noise > 0, F.greatest(
        F.expr(f"((size({tokens_col}) * {num} + {den // 2}) div {den})"
               f" div {mean_span}"),
        F.lit(1),
    )).otherwise(F.lit(0))

    def frag(k):
        # window k = [ws, we) in integer arithmetic
        ws = F.floor((k * L) / n_spans).cast("int")
        we = F.floor(((k + 1) * L) / n_spans).cast("int")
        wlen = we - ws
        base_len = F.floor(n_noise / n_spans).cast("int")
        extra = F.when(k < n_noise % n_spans, F.lit(1)).otherwise(F.lit(0))
        ln = F.least(base_len + extra, wlen)
        legal = F.greatest(wlen - ln + 1, F.lit(1))
        a = ws + hash_bucket(
            F.col(id_col) * F.lit(1_000_003) + k, 1_000_000_007, seed
        ).cast("int") % legal
        sentinel = F.concat(
            F.lit("<extra_id_"), k.cast("string"), F.lit(">")
        )
        head = F.slice(toks, ws + 1, (a - ws).cast("int"))
        span = F.slice(toks, a + 1, ln.cast("int"))
        tail = F.slice(toks, (a + ln + 1).cast("int"), (we - a - ln).cast("int"))
        return F.struct(
            F.concat(head, F.array(sentinel), tail).alias("inp"),
            F.concat(F.array(sentinel), span).alias("tgt"),
        )

    frags = F.transform(F.sequence(F.lit(0), n_spans - 1), frag)
    final_sent = F.concat(
        F.lit("<extra_id_"), n_spans.cast("string"), F.lit(">")
    )
    empty_s = F.array().cast("array<string>")
    inputs = F.when(
        n_spans > 0, F.flatten(F.transform(frags, lambda s: s["inp"]))
    ).otherwise(F.coalesce(toks, empty_s))
    targets = F.when(
        n_spans > 0,
        F.concat(
            F.flatten(F.transform(frags, lambda s: s["tgt"])),
            F.array(final_sent),
        ),
    ).otherwise(empty_s)
    return df.select(
        F.col(id_col),
        F.coalesce(L, F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(n_noise, F.lit(0)).cast("long").alias("n_noise"),
        F.coalesce(n_spans, F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(inputs, empty_s).alias("inputs"),
        F.coalesce(targets, empty_s).alias("targets"),
    )
