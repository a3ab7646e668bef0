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

__all__ = ["span_corruption", "fim_transform", "mlm_mask"]

_MOD = 1_000_000_007


def _hkey(expr):
    """Reduce a hash-key expression into [0, 1e9+7) BEFORE it reaches
    hash_bucket's Knuth multiply. Mod-equivalence makes this
    value-identical for non-negative keys (the bucket is taken mod the
    same prime), but it keeps ``key · 2654435761`` inside int64 for
    ids past ~3.4e9 — composite keys like ``id·1000003 + j`` overflow
    ANSI mode at 10^8-scale ids otherwise (hit in the 10× smoke). The
    SQL oracles carry the SAME pre-reduction: DuckDB does NOT promote
    BIGINT·BIGINT to HUGEINT — it raises OutOfRange, which the r10
    cross-SF gate sweep hit at sf0.1 composite keys ≈3.5e9 before the
    oracle keys were mod-reduced to mirror this function."""
    return F.pmod(expr, F.lit(_MOD))


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
            _hkey(_hkey(F.col(id_col)) * F.lit(1_000_003) + k),
            1_000_000_007, seed,
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


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    rate: "tuple[int, int]" = (1, 2),
    mode: str = "psm",
    seed: int = 13,
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): for a
    hash-selected ``rate`` fraction of documents, cut the token stream
    at two hash-derived points into (prefix, middle, suffix) and emit
    the sentinel-framed reordering the FIM objective trains on;
    the rest pass through untouched (the paper's joint AR+FIM mix).

    Framings (this operator's exact contract):

    - ``psm``:  <fim_prefix> P <fim_suffix> S <fim_middle> M
    - ``spm``:  <fim_suffix> S <fim_prefix> P <fim_middle> M

    Cut points a <= b are the ordered pair of two per-(id, slot) Knuth
    hashes modulo L+1, so any document (including empty) is total and
    the whole transform is a pure function of (id, tokens).

    Returns (id, n_tokens, fim_applied, cut_a, cut_b, out); cut_a and
    cut_b are -1 for passthrough rows.

    Scale shape: ONE map-only projection — gate, cuts, and framing are
    integer expressions + slice/concat HOFs; no explode, no shuffle,
    no Python at any corpus size.
    """
    num, den = (int(x) for x in rate)
    if not (0 <= num <= den and den > 0):
        raise ValueError(f"rate must be a fraction in [0,1], got {rate}")
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")

    toks = F.coalesce(
        F.col(tokens_col), F.array().cast("array<string>")
    )
    L = F.size(toks)
    key = F.col(id_col).cast("bigint")
    applied = hash_bucket(_hkey(key), den, seed) < F.lit(num)
    h1 = hash_bucket(
        _hkey(_hkey(key) * F.lit(1_000_003) + F.lit(1)), 1_000_000_007, seed
    )
    h2 = hash_bucket(
        _hkey(_hkey(key) * F.lit(1_000_003) + F.lit(2)), 1_000_000_007, seed
    )
    p1 = (h1 % (L + 1)).cast("int")
    p2 = (h2 % (L + 1)).cast("int")
    a = F.least(p1, p2)
    b = F.greatest(p1, p2)
    prefix = F.slice(toks, 1, a)
    middle = F.slice(toks, a + 1, b - a)
    suffix = F.slice(toks, b + 1, L - b)
    if mode == "psm":
        framed = F.concat(
            F.array(F.lit("<fim_prefix>")), prefix,
            F.array(F.lit("<fim_suffix>")), suffix,
            F.array(F.lit("<fim_middle>")), middle,
        )
    else:
        framed = F.concat(
            F.array(F.lit("<fim_suffix>")), suffix,
            F.array(F.lit("<fim_prefix>")), prefix,
            F.array(F.lit("<fim_middle>")), middle,
        )
    return df.select(
        F.col(id_col),
        L.cast("long").alias("n_tokens"),
        applied.cast("int").alias("fim_applied"),
        F.when(applied, a).otherwise(F.lit(-1)).cast("int").alias("cut_a"),
        F.when(applied, b).otherwise(F.lit(-1)).cast("int").alias("cut_b"),
        F.when(applied, framed).otherwise(toks).alias("out"),
    )


def mlm_mask(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    select_pct: int = 15,
    mask_token: str = "[MASK]",
    random_tokens: "tuple[str, ...]" = ("r0", "r1", "r2", "r3"),
    seed: int = 17,
) -> DataFrame:
    """BERT-style masked-LM sample builder (Devlin et al. 2018 §3.1):
    select ``select_pct``% of positions; of the selected, 80% become
    ``mask_token``, 10% a replacement drawn from ``random_tokens``,
    10% stay unchanged. Labels carry the ORIGINAL token at selected
    positions and NULL elsewhere (loss is computed only where the
    label is non-NULL — the masked-LM objective).

    All three draws are per-(id, position) Knuth hashes, so the
    corruption is a pure function of (id, tokens) — recomputes,
    repartitions, and the SQL oracle reproduce it bit-for-bit.

    Returns (id, n_tokens, n_selected, masked, labels).

    Scale shape: ONE map-only projection — selection and replacement
    are transform() HOFs over the token array with integer hash
    expressions; no explode, no shuffle, no Python at any size.
    """
    if not (0 <= select_pct <= 100):
        raise ValueError(f"select_pct must be in [0,100], got {select_pct}")
    if not random_tokens:
        raise ValueError("random_tokens must be non-empty")
    R = len(random_tokens)

    toks = F.coalesce(
        F.col(tokens_col), F.array().cast("array<string>")
    )
    key = F.col(id_col).cast("bigint")
    rnd = F.array(*[F.lit(t) for t in random_tokens])

    def sel(j):
        return (
            hash_bucket(_hkey(_hkey(key) * F.lit(1_000_003) + j), 100, seed)
            < F.lit(select_pct)
        )

    def masked_tok(x, j):
        r = hash_bucket(
            _hkey(_hkey(key) * F.lit(2_000_003) + j), 10, seed + 1
        )
        repl = F.element_at(
            rnd,
            (
                hash_bucket(
                    _hkey(_hkey(key) * F.lit(3_000_017) + j), R, seed + 2
                )
            ).cast("int") + 1,
        )
        return F.when(
            sel(j),
            F.when(r < 8, F.lit(mask_token))
            .when(r == 8, repl)
            .otherwise(x),
        ).otherwise(x)

    masked = F.transform(toks, masked_tok)
    labels = F.transform(
        toks, lambda x, j: F.when(sel(j), x).otherwise(F.lit(None))
    )
    n_selected = F.size(
        F.filter(F.sequence(F.lit(0), F.size(toks) - 1), sel)
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(F.size(toks) > 0, n_selected)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_selected"),
        masked.alias("masked"),
        labels.alias("labels"),
    )
