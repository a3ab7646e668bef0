"""Data-selection operators — the "which documents do we train on"
stage between curation and export:

  dsir_logweights      — DSIR hashed n-gram importance weights
                         (Xie et al. 2023, arXiv:2302.03169)
  dsir_sample          — Gumbel top-k selection ∝ importance weight
  temperature_mixture  — temperature-flattened per-group sampling
                         weights (q_g ∝ p_g^α — the multilingual-LM
                         alpha-sampling rule)
  temperature_budgets  — integer token budgets from those weights
                         (largest-remainder rounding, sums exactly to
                         the requested total; feeds
                         sampling.token_budget_sample)

Beyond-reference: intel/hdk has no text/selection surface (SURVEY.md
§2.8 stops at LIKE/REGEXP); these are the data-pipeline operators a
100 TB pretraining corpus is actually filtered with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hdk_spark.operators.text import _md5_bucket, tokenize

__all__ = [
    "dsir_logweights",
    "dsir_sample",
    "temperature_mixture",
    "temperature_budgets",
    "curriculum_order",
]


def _grams(df: DataFrame, id_col: str, text_col: str,
           use_bigrams: bool) -> DataFrame:
    """(id, gram) relation: lower-cased whitespace unigrams, plus
    space-joined bigrams when ``use_bigrams`` — the DSIR paper's
    hashed feature set. NULL/empty text yields NO grams (split of ''
    would emit one empty token — guarded, the token_count
    convention). One explode; no shuffle."""
    # staged (r14): tokenizer in its own projection — the bigram
    # zip_with otherwise inlines one split copy per slice/size
    # reference (plan-audited ×5); explode_outer + isNotNull ≡
    # explode (gram elements are never NULL; the array is NULL only
    # for NULL text) and avoids InferFiltersFromGenerate re-running
    # the chain in a pushed-down scan filter.
    toks0 = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast(
            "array<string>"
        )
    ).otherwise(tokenize(F.lower(F.col(text_col))))
    staged = df.select(F.col(id_col).alias("id"), toks0.alias("__toks"))
    toks = F.col("__toks")
    grams = toks
    if use_bigrams:
        n = F.size(toks)
        bi = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        grams = F.concat(toks, bi)
    return (
        staged.select("id", F.explode_outer(grams).alias("gram"))
        .filter(F.col("gram").isNotNull())
    )


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    smoothing: int = 1,
    use_bigrams: bool = True,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every candidate document by how much more likely its
    hashed n-gram features are under a TARGET distribution (a small
    high-quality corpus — wiki/books/domain data) than under the raw
    candidate pool itself:

        log w(doc) = Σ_{gram g} [ ln p_target(h(g)) − ln p_raw(h(g)) ]

    with h the md5 bucket hash shared with :func:`hashed_linear_score`
    / the minhash oracle basis, and add-λ smoothing
    p(b) = (count(b)+λ) / (total+λ·B) so unseen buckets stay finite.

    Returns (id, n_grams, log_weight) — one row per candidate row,
    NULL/empty text scoring 0 over 0 grams (totality convention).
    Feed to :func:`dsir_sample` for the paper's resampling step, or
    gate on a log-weight threshold.

    Determinism: per-bucket log-ratios are computed ONCE in a B-row
    projection and quantized to int64 micro-units (×1e6); the per-doc
    score is an exact integer sum of those units, so shuffle
    aggregation order cannot change the answer (the bm25_batch
    discipline). Emitted log_weight = micro-sum / 1e6.

    Scale shape: candidate grams are ONE explode + partial-agg groupBy
    to B rows; the target pass likewise (target is sample-sized by
    construction). Scoring joins each candidate gram to the B-row
    ratio relation — bucket-count-sized, AQE broadcasts it — then one
    partial-agg groupBy(id). No corpus-sized join key ever exceeds B;
    raise ``n_buckets`` with vocabulary, not corpus size.
    """
    if smoothing < 1:
        raise ValueError("smoothing must be a positive integer")
    lam = int(smoothing)
    raw_g = _grams(df, id_col, text_col, use_bigrams).select(
        "id", _md5_bucket(F.col("gram"), n_buckets).alias("b")
    )
    tgt_g = _grams(target, id_col, text_col, use_bigrams).select(
        _md5_bucket(F.col("gram"), n_buckets).alias("b")
    )
    raw_counts = raw_g.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("cr")
    )
    tgt_counts = tgt_g.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    totals = (
        raw_counts.agg(F.sum("cr").alias("tr"))
        .crossJoin(
            F.broadcast(tgt_counts.agg(F.sum("ct").alias("tt")))
        )
    )
    # B-row log-ratio relation: buckets never hit by a candidate gram
    # are irrelevant (left join from raw side); target-absent buckets
    # smooth to λ. ln over exact integers; quantized once, here.
    ratio = (
        raw_counts.join(tgt_counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                (
                    F.log(F.coalesce(F.col("ct"), F.lit(0)) + F.lit(lam))
                    - F.log(
                        F.coalesce(F.col("tt"), F.lit(0))
                        + F.lit(lam * n_buckets)
                    )
                    - F.log(F.col("cr") + F.lit(lam))
                    + F.log(F.col("tr") + F.lit(lam * n_buckets))
                )
                * F.lit(1_000_000.0)
            ).cast("long").alias("lr_micro"),
        )
    )
    scored = (
        raw_g.join(ratio, "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("lr_micro").cast("long").alias("__m"),
        )
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(
                F.coalesce("__m", F.lit(0)).cast("double") / F.lit(1e6), 6
            ).alias("log_weight"),
        )
    )


def dsir_sample(
    df: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    smoothing: int = 1,
    use_bigrams: bool = True,
    seed: int = 17,
    length_normalize: bool = True,
) -> DataFrame:
    """The DSIR resampling step: select ``k`` candidates WITHOUT
    replacement with probability ∝ exp(log-weight) via the Gumbel
    top-k trick — score = log w + Gumbel noise, take the k largest.
    The "noise" is the repo's deterministic-hash randomness (a pure
    function of (id, seed)): u = (hash(id) + 0.5) / M uniform in
    (0, 1), g = −ln(−ln u) — stable under repartitioning and
    recompute, like every sampler here. ``length_normalize`` divides
    the log-weight by the gram count first (the paper's practical fix
    for long documents dominating raw sums).

    Returns the k selected rows as (id, n_grams, log_weight, score),
    ties on id. Scale shape: dsir_logweights + one map-only score
    projection + TakeOrdered(k) — no extra exchange."""
    from hdk_spark.operators.sampling import hash_bucket

    M = 2_147_483_647
    w = dsir_logweights(
        df, target, id_col, text_col, n_buckets, smoothing, use_bigrams
    )
    u = (
        hash_bucket(F.col(id_col), M, seed).cast("double") + F.lit(0.5)
    ) / F.lit(float(M))
    base = (
        F.col("log_weight")
        / F.greatest(F.col("n_grams"), F.lit(1)).cast("double")
        if length_normalize
        else F.col("log_weight")
    )
    gumbel = -F.log(-F.log(u))
    return (
        w.select(
            "*", F.round(base + gumbel, 6).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: "str | None" = None,
    by: str = "tokens",
) -> DataFrame:
    """Temperature-flattened mixture weights — the multilingual-LM
    alpha-sampling rule (mBERT/XLM-R exponential smoothing): with
    p_g the group's share of the corpus (by token count, or rows
    when ``by='docs'``), the sampling weight is

        q_g = p_g^α / Σ_h p_h^α          (α=1 natural, α→0 uniform)

    Returns one row per group: (group, n_docs, n_tokens, p, q, boost)
    with boost = q/p (>1 ⇒ the group is up-sampled), doubles rounded
    to 6 digits, NULL group kept as its own row (totality). Ordered
    deterministic output is the caller's ORDER BY.

    Scale shape: ONE partial-agg groupBy to a groups-sized relation;
    the normalization Σ p^α is a 1-row aggregate broadcast back —
    nothing downstream of the first aggregate is corpus-sized."""
    if by not in ("tokens", "docs"):
        raise ValueError("by must be 'tokens' or 'docs'")
    tok = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else F.when(
            F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
        ).otherwise(F.size(tokenize(F.col(text_col)))).cast("long")
    )
    g = (
        df.select(F.col(group_col).alias("grp"), tok.alias("__t"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
    )
    mass = F.col("n_tokens") if by == "tokens" else F.col("n_docs")
    tot = g.agg(
        F.sum(mass.cast("double")).alias("__tot")
    )
    p = mass.cast("double") / F.col("__tot")
    pa = F.pow(p, F.lit(float(alpha)))
    staged = g.crossJoin(F.broadcast(tot)).select(
        "grp", "n_docs", "n_tokens", p.alias("__p"), pa.alias("__pa")
    )
    z = staged.agg(F.sum("__pa").alias("__z"))
    return staged.crossJoin(F.broadcast(z)).select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_tokens",
        F.round("__p", 6).alias("p"),
        F.round(F.col("__pa") / F.col("__z"), 6).alias("q"),
        F.round(F.col("__pa") / F.col("__z") / F.col("__p"), 6).alias(
            "boost"
        ),
    )


def temperature_budgets(
    df: DataFrame,
    total_budget: int,
    group_col: str = "lang",
    alpha: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: "str | None" = None,
    by: str = "tokens",
) -> DataFrame:
    """Integer per-group token budgets from :func:`temperature_mixture`
    that sum EXACTLY to ``total_budget`` — the bridge into
    :func:`hdk_spark.operators.sampling.token_budget_sample`:
    budget_g = ⌊qm_g · B / S⌋ (qm the micro-quantized weight, S = Σ qm)
    plus one extra token-unit for the groups with the largest
    remainders (largest-remainder / Hamilton rounding — deterministic,
    remainder ties break on the group value ascending NULLS LAST).
    Normalizing by S — not by the nominal 1e6 — makes Σ ⌊·⌋ ≤ B hold
    by construction, so the shortfall is always in [0, n_groups) and
    no budget is ever adjusted downward.

    Returns (group, n_docs, n_tokens, q, budget); Σ budget =
    total_budget exactly (property-tested). Products run in
    DECIMAL(38,0) so a 10¹³-token budget cannot overflow. The
    remainder ranking is one window over the GROUPS-sized relation —
    nothing here is corpus-sized."""
    from pyspark.sql.window import Window

    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    B = int(total_budget)
    m = temperature_mixture(
        df, group_col, alpha, id_col, text_col, tokens_col, by
    )
    # exact integer arithmetic over the ROUNDED q (the published
    # contract value), re-normalized by its own sum S
    qm = F.round(F.col("q") * F.lit(1e6)).cast("long")
    staged = m.select(group_col, "n_docs", "n_tokens", "q", qm.alias("__qm"))
    s_tot = staged.agg(F.sum("__qm").cast("long").alias("__s"))
    staged = (
        staged.crossJoin(F.broadcast(s_tot))
        .withColumn(
            "__num",
            F.col("__qm").cast("decimal(38,0)")
            * F.lit(B).cast("decimal(38,0)"),
        )
        .withColumn(
            "__floor", F.expr("CAST(__num div __s AS BIGINT)")
        )
        .withColumn(
            "__rem",
            F.expr(
                "CAST(__num - (__num div __s) * __s AS BIGINT)"
            ),
        )
        .select(
            group_col, "n_docs", "n_tokens", "q", "__floor", "__rem"
        )
    )
    short = staged.agg(
        (F.lit(B) - F.sum("__floor")).cast("long").alias("__short")
    )
    w = Window.orderBy(
        F.desc("__rem"), F.col(group_col).asc_nulls_last()
    )
    return (
        staged.crossJoin(F.broadcast(short))
        .select(
            "*", F.row_number().over(w).cast("long").alias("__rk")
        )
        .select(
            group_col, "n_docs", "n_tokens", "q",
            (
                F.col("__floor")
                + F.when(F.col("__rk") <= F.col("__short"), F.lit(1))
                .otherwise(F.lit(0))
            ).cast("long").alias("budget"),
        )
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int = 4,
    id_col: str = "doc_id",
    seed: int = 31,
    easy_first: bool = True,
) -> DataFrame:
    """Curriculum annotation (Bengio et al. 2009): equal-population
    difficulty stages from the score's own quantiles, plus a
    deterministic within-stage shuffle key — training order is
    ``ORDER BY stage, curriculum_key, id`` and is a pure function of
    (corpus, seed). ``easy_first=True`` puts LOW scores in stage 0
    (score = difficulty); flip for high-is-easy scorers.

    Stage boundaries are the (1..n_stages−1)/n_stages exact
    percentiles, computed once and folded in as literals (the
    bounded-driver-action pattern of the IVF quantizer) — so the data
    pass is ONE map-only projection, not a global ntile window (which
    would sort the corpus in one task). Ties at a boundary go to the
    LOWER stage (score ≤ threshold). NULL scores get stage NULL —
    annotation, not a filter; callers decide.

    Adds (stage, curriculum_key) to the input columns.
    """
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    from hdk_spark.operators.sampling import hash_bucket

    s = F.col(score_col).cast("double")
    qs = [i / n_stages for i in range(1, n_stages)]
    if qs:
        row = df.agg(
            F.percentile(s, F.array(*[F.lit(q) for q in qs])).alias("t")
        ).first()
        thresholds = list(row["t"] or [])
    else:
        thresholds = []
    stage = F.lit(0)
    for t in thresholds:
        stage = stage + (s > F.lit(float(t))).cast("int")
    if not easy_first:
        stage = F.lit(max(len(thresholds), 0)) - stage
    return df.select(
        "*",
        F.when(s.isNotNull(), stage).cast("int").alias("stage"),
        hash_bucket(F.col(id_col), 1_000_000_007, seed).alias(
            "curriculum_key"
        ),
    )
