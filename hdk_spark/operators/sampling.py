"""Deterministic sampling / splitting operators for training-data
pipelines (beyond the reference's OLAP surface).

Every operator here derives its randomness from an *arithmetic* hash of
a caller-chosen key column — never from ``rand()``:

- re-running the pipeline (or recomputing a lost partition after a
  shuffle-fetch failure) yields the IDENTICAL sample — ``rand()`` in a
  filter is the classic nondeterministic-recompute correctness bug at
  scale (rows duplicated or dropped across retries);
- the sample is stable under repartitioning, so train/val membership
  can be recomputed years later from the raw table;
- the hash is plain int64 arithmetic (Knuth multiplicative scheme), so
  it stays inside whole-stage codegen AND is expressible in ANSI SQL —
  the driver's DuckDB oracle runs the very same formula.

Scale notes:

- hash_sample / mixture_sample / train_val_split are map-only: no
  shuffle, fully pushdown-friendly (the filter sits directly on the
  scan), work unchanged at any scale.
- stratified_sample shuffles once on the stratum key (window
  row_number). Per-stratum counts are exact; a hot stratum serializes
  into one task's sort — for approximate-rate stratification at
  extreme scale prefer hash_sample with a per-stratum threshold join
  (no global ordering needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_bucket",
    "hash_sample",
    "stratified_sample",
    "mixture_sample",
    "train_val_split",
    "weighted_sample",
    "shuffle_shards",
    "mixture_plan",
    "token_budget_sample",
    "shard_manifest",
    "export_corpus",
    "repeat_expand",
]

# Knuth's multiplicative constant (2^32 / phi). Products stay well
# inside int64 for any 32-bit-ish key domain; the prime modulus keeps
# bucket occupancy uniform for sequential ids.
_MULT = 2654435761
_MOD = 1_000_000_007


def hash_bucket(key: Column, n_buckets: int, seed: int = 0) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key —
    ((key * 2654435761 + seed) % 1000000007) % n_buckets, identical in
    any ANSI-SQL engine."""
    return ((key.cast("bigint") * F.lit(_MULT) + F.lit(seed)) % F.lit(_MOD)) % F.lit(
        n_buckets
    )


def hash_bucket_sql(key_sql: str, n_buckets: int, seed: int = 0) -> str:
    """The oracle-side rendering of :func:`hash_bucket` (shared text so
    Spark and the SQL oracle can never drift)."""
    return (
        f"(((CAST({key_sql} AS BIGINT) * {_MULT} + {seed}) % {_MOD}) % {n_buckets})"
    )


def hash_sample(
    df: DataFrame, key_col: str, pct: int, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ~``pct``% of rows (by hash bucket of
    ``key_col``). Map-only; membership is a pure function of the key."""
    return df.filter(hash_bucket(F.col(key_col), 100, seed) < F.lit(pct))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order
    (deterministic). One shuffle on the stratum key."""
    h = hash_bucket(F.col(key_col), _MOD, seed)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 0,
    default_weight: float = 0.0,
) -> DataFrame:
    """Down-sample each group to its mixture weight (0..1 keep rate) —
    the dataset-mixing step of a training pipeline (e.g. keep 30% of
    crawl, 100% of books). Map-only: per-row CASE on the group value
    against a hash threshold in [0, 10000)."""
    thresh = F.lit(int(default_weight * 10000))
    expr = None
    for g, wt in weights.items():
        cond = F.col(group_col) == F.lit(g)
        t = F.lit(int(wt * 10000))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.filter(hash_bucket(F.col(key_col), 10000, seed) < thresh)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n_target: int,
    seed: int = 0,
    total_weight=None,
) -> DataFrame:
    """Deterministic PPS (probability-proportional-to-size) Poisson
    sample: row i is kept with probability min(1, n_target * w_i / W),
    so the expected sample size is ~n_target and heavy rows are kept
    with certainty — the standard weighted down-sampling step of a
    data-mixing pipeline (importance/quality weights).

    Inclusion is decided by pure decimal-integer arithmetic::

        (2*hash_bucket(key, MOD, seed) + 1) * W  <  2 * MOD * n_target * w_i

    i.e. u_i < n_target*w_i/W with u_i = (2h+1)/(2*MOD) — no float ever
    enters, so membership is bit-identical in any ANSI engine and under
    task recomputation. Map-only given ``total_weight``; when omitted it
    is computed here with one exact decimal aggregate (at scale compute
    W once per dataset version and pass it in — it is a property of the
    corpus, not of the query).

    ``weight_col`` must fit DECIMAL(18,2) (money-like weights).
    """
    if total_weight is None:
        total_weight = df.agg(
            F.sum(F.col(weight_col).cast("decimal(18,2)"))
        ).collect()[0][0]
    h = hash_bucket(F.col(key_col), _MOD, seed)
    lhs = (h * 2 + 1).cast("decimal(12,0)") * F.lit(total_weight).cast(
        "decimal(18,2)"
    )
    rhs = F.lit(2 * _MOD * n_target).cast("decimal(16,0)") * F.col(
        weight_col
    ).cast("decimal(18,2)")
    return df.filter(lhs < rhs)


def train_val_split(
    df: DataFrame, key_col: str, train_pct: int = 90, seed: int = 0
) -> DataFrame:
    """Add a deterministic 'train'/'val' ``split`` column (hash of the
    key — stable under reruns, repartitioning, and incremental loads)."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(F.col(key_col), 100, seed) < F.lit(train_pct), F.lit("train")
        ).otherwise(F.lit("val")),
    )


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards:
    every row gets a ``shard`` in [0, n_shards) and a dense 0-based
    ``shard_pos`` giving its read order inside the shard — the
    write-shuffled-training-data step (epoch order must be decorrelated
    from the source order, yet reproducible run-to-run).

    Shard membership is :func:`hash_bucket`(key, n_shards, seed); the
    within-shard order is a SECOND independent hash (seed+1 stream) of
    the same key with the key itself as tie-break, so the order total,
    deterministic, and uncorrelated with both the source order and the
    shard assignment. Everything is int64 arithmetic — bit-identical in
    the SQL oracle and under task retry.

    Scale shape: exactly one exchange (hash partition on ``shard``)
    followed by a per-shard sort — the minimum any global shuffle
    needs. Shards are hash-uniform so no skew; n_shards should be
    chosen as the target output-file count (≫ executor count). Writing
    ``.write.partitionBy('shard')`` after this yields one sorted file
    per shard with zero further movement."""
    shard = hash_bucket(F.col(key_col), n_shards, seed)
    order_h = hash_bucket(F.col(key_col), _MOD, seed + 1)
    w = Window.partitionBy("shard").orderBy(F.col("__oh"), F.col(key_col))
    return (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("__oh", order_h)
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__oh")
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    token_col: str,
    targets: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Token-budget mixture planning: given per-source target weights
    and a total token budget, compute for every source its available
    tokens, its target token count, and the deterministic keep-rate —
    the sizing step that precedes :func:`mixture_sample` when mixtures
    are specified in TOKENS (the usual pretraining contract) rather
    than row rates.

    Returns (group, available_tokens, target_tokens, rate_bp, epochs):
    ``rate_bp`` = floor(target*10000/available) basis points, capped at
    10000 — feed it to :func:`mixture_sample` as weight=rate_bp/10000;
    ``epochs`` = ceil(target/available) — how many passes over the
    source an up-sampled mixture needs (rate_bp == 10000 and epochs > 1
    flags up-sampling). All integer arithmetic: no float division, so
    both engines agree exactly.

    Scale shape: one partial-aggregated groupBy over the corpus (the
    only corpus-scale work); the plan output is sources-sized (tiny).
    """
    rows = [(g, float(wt)) for g, wt in targets.items()]
    avail = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.col(token_col).cast("bigint")).alias("available_tokens")
    )
    tgt = None
    for g, wt in rows:
        t = F.lit(int(round(wt * budget_tokens)))
        cond = F.col("group") == F.lit(g)
        tgt = F.when(cond, t) if tgt is None else tgt.when(cond, t)
    tgt = tgt.otherwise(F.lit(0)) if tgt is not None else F.lit(0)
    return (
        avail.withColumn("target_tokens", tgt.cast("bigint"))
        .withColumn(
            "rate_bp",
            F.least(
                # DECIMAL(38,0) widening + integral `div`: exact at any
                # token count (bigint*10000 alone could overflow past
                # ~9e14 tokens, and double division loses exactness
                # past 2^53)
                F.expr(
                    "(CAST(target_tokens AS DECIMAL(38,0)) * 10000)"
                    " div available_tokens"
                ),
                F.lit(10000),
            ).cast("long"),
        )
        .withColumn(
            "epochs",
            # ceil(t/a) as (t + a - 1) div a — stays integral
            F.expr(
                "(CAST(target_tokens AS DECIMAL(38,0))"
                " + available_tokens - 1) div available_tokens"
            ).cast("long"),
        )
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str = "lang",
    budgets: "dict[str, int] | None" = None,
    default_budget: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: "str | None" = None,
    seed: int = 7,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-group TOKEN-budget sampling — the mixture knob training
    pipelines actually turn ("5 B tokens of en, 2 B of de"), where
    :func:`mixture_sample` turns a document-rate knob. Within each
    group, documents are taken in deterministic hash order until the
    group's running token total reaches its budget; the last taken
    document may overshoot (documents are never split — that is
    :mod:`packing`'s job downstream). A group absent from ``budgets``
    gets ``default_budget``; budget 0 drops the group.

    Returns the sampled rows (original columns + ``n_tokens``);
    membership is a pure function of (id, tokens, seed) — stable under
    repartitioning and recompute, like every sampler here.

    Scale shape — the naive cut is ONE window per group ordered by
    hash: a 50 B-token group serializes into a single task's sort.
    Instead the prefix sum is two-phase: documents hash into
    ``n_buckets`` sub-buckets per group, per-bucket token sums
    (one partial-agg groupBy, group×n_buckets rows) cumulate in a
    TINY window to per-bucket offsets that broadcast-join back, and
    each bucket windows only its own slice. The total order is
    (bucket, hash, id) — still a deterministic shuffle, and because
    token counts are integers the two-phase sum is EXACTLY the serial
    prefix sum, so the oracle may replay it as one plain window.
    Raise ``n_buckets`` (to ~tasks-per-group) as groups grow; both
    window stages stay bounded."""
    tok = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else _ws_token_count(F.col(text_col))
    )
    g = F.col(group_col)
    base = df.select(
        "*",
        F.coalesce(tok, F.lit(0)).alias("__tok"),
        hash_bucket(F.col(id_col), 1_000_000_007, seed).alias("__h"),
        hash_bucket(F.col(id_col), n_buckets, seed + 101).alias("__b"),
    )
    bsums = base.groupBy(g.alias("__g"), F.col("__b").alias("__bb")).agg(
        F.sum("__tok").alias("__bsum")
    )
    w_off = (
        Window.partitionBy("__g")
        .orderBy("__bb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bsums.select(
        "__g",
        "__bb",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = (
        Window.partitionBy(group_col, "__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        base.withColumn(
            "__cum_in", F.coalesce(F.sum("__tok").over(w_in), F.lit(0))
        )
        .join(
            F.broadcast(offsets),
            # eqNullSafe: a NULL group must still match its own offset
            # row so it is sampled under default_budget, as the
            # docstring promises for groups absent from budgets
            # (ADVICE r8 — plain == silently dropped NULL-group rows)
            g.eqNullSafe(F.col("__g")) & (F.col("__b") == F.col("__bb")),
        )
        .withColumn("__cum", F.col("__off") + F.col("__cum_in"))
    )
    budget = F.lit(int(default_budget))
    for name, val in sorted((budgets or {}).items()):
        budget = F.when(g == name, F.lit(int(val))).otherwise(budget)
    out_cols = [F.col(c) for c in df.columns] + [
        F.col("__tok").alias("n_tokens")
    ]
    return cum.filter(F.col("__cum") < budget).select(*out_cols)


def _ws_token_count(text: Column) -> Column:
    # local twin of text.token_count (sampling must not import the text
    # module just for this): whitespace token count, empty/NULL -> 0
    return F.when(
        F.length(F.trim(text)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(text), r"\s+"))).cast("long")


# 31-bit Mersenne prime for the manifest digest fold — operands stay
# far inside int64 even before reduction (see the term bound below)
_DIGEST_M = 2_147_483_647


def shard_manifest(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Per-shard delivery manifest of a training export — the
    verification artifact written alongside the shuffled shards so a
    consumer can check every shard file independently after
    download / re-sort / recompression. One row per shard of
    :func:`shuffle_shards`' hash assignment (same hash, same seed —
    the manifest describes exactly the files
    ``.write.partitionBy('shard')`` produces):

    - ``n_docs``, ``n_tokens`` (whitespace tokens of ``text_col``),
      ``key_sum`` — exact integer totals;
    - ``digest`` — an ORDER-INDEPENDENT content checksum:
      Σ_rows ((key mod M)·2654435761 + md5_48(text) mod M) mod M,
      folded mod M = 2³¹−1. Every per-row term is < M and reduced
      before the multiply (the connected_components_star bound: the
      product tops out near (M−1)·2654435761 ≈ 5.7e18 < int64), the
      Σ runs in DECIMAL(38,0) so partial aggregation can't overflow,
      and addition is associative-commutative — the digest is
      reproducible from a shard file in ANY row order. It is a
      transit/processing checksum (~2⁻³¹ accidental-collision odds),
      not a cryptographic integrity proof. md5 is the cross-engine
      contract basis (crc32/xxhash64 are the cheaper production
      bases — the established minhash trade).

    NULL text hashes as '' and counts 0 tokens (the corpus-wide
    NULL-totality convention). Scale shape: ONE partial-agg groupBy
    on the shard key — map-only otherwise; shards are hash-uniform so
    the aggregate has no skew by construction.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    md5_48 = F.conv(
        F.substring(F.md5(F.encode(text, "utf-8")), 1, 12), 16, 10
    ).cast("long")
    term = F.pmod(
        F.pmod(F.col(key_col).cast("bigint"), F.lit(_DIGEST_M)) * F.lit(_MULT)
        + F.pmod(md5_48, F.lit(_DIGEST_M)),
        F.lit(_DIGEST_M),
    )
    return (
        df.select(
            hash_bucket(F.col(key_col), n_shards, seed).cast("int").alias("shard"),
            F.col(key_col).alias("__k"),
            _ws_token_count(text).alias("__tok"),
            term.alias("__term"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").cast("long").alias("n_tokens"),
            F.sum("__k").cast("long").alias("key_sum"),
            F.pmod(
                F.sum(F.col("__term").cast("decimal(38,0)")).cast("decimal(38,0)"),
                F.lit(_DIGEST_M).cast("decimal(38,0)"),
            ).cast("long").alias("digest"),
        )
    )


def export_corpus(
    df: DataFrame,
    group_col: str = "lang",
    budgets: "dict[str, int] | None" = None,
    n_shards: int = 64,
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
    default_budget: int = 0,
) -> "tuple[DataFrame, DataFrame]":
    """The training-export endgame composed as one operator:
    :func:`token_budget_sample` (the mixture knob, token units) →
    :func:`shuffle_shards` (deterministic global shuffle into
    write-ready shards) → :func:`shard_manifest` (the per-shard
    verification artifact). Returns ``(shards, manifest)``: write the
    first with ``.write.partitionBy('shard')`` and publish the second
    beside it — same hash, same seed, so the manifest describes
    exactly the files written.

    The manifest is computed from the SAMPLED relation directly
    (membership and shard assignment are pure key functions), not
    from the sharded one — no dependency on the shuffle's window
    stage; the composition adds zero exchanges of its own. All three
    stages are hash-deterministic, so re-running the export after a
    lost-partition recompute reproduces byte-identical shards AND
    manifest."""
    sampled = token_budget_sample(
        df,
        group_col,
        budgets,
        default_budget=default_budget,
        id_col=key_col,
        text_col=text_col,
        seed=seed,
    )
    shards = shuffle_shards(sampled, key_col, n_shards, seed)
    manifest = shard_manifest(sampled, key_col, text_col, n_shards, seed)
    return shards, manifest


def repeat_expand(
    df: DataFrame,
    group_col: str,
    epochs: "dict[str, tuple[int, int]] | None" = None,
    default_epochs: "tuple[int, int]" = (1, 1),
    id_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Deterministic fractional-epoch expansion — the repeat knob of
    data-constrained scaling (Muennighoff et al. 2023: rare domains
    repeat, abundant domains subsample, all under ONE budget law):
    a group with epochs num/den emits each document
    ``num div den`` times, plus one more copy for the hash-selected
    ``(num mod den)/den`` fraction of its documents — so the group's
    total is n·num/den in expectation with per-id determinism, and
    epochs < 1 subsample (0 copies for unselected ids). Adds
    ``copy_idx`` (1-based); downstream shuffling treats copies as
    independent documents.

    Scale shape: ONE map-side explode of a ≤⌈epochs⌉-element
    sequence per row — no shuffle, no join; membership and copy
    count are pure functions of (id, group, seed), so recomputes and
    the SQL oracle reproduce the expansion exactly.
    """
    eps = dict(epochs or {})
    for g_, (nu, de) in list(eps.items()) + [("__default__", default_epochs)]:
        if de <= 0 or nu < 0:
            raise ValueError(
                f"epochs must be non-negative fractions, got {g_}: {(nu, de)}"
            )
    g = F.col(group_col)
    nu = F.lit(int(default_epochs[0]))
    de = F.lit(int(default_epochs[1]))
    for name, (n_, d_) in sorted(eps.items()):
        nu = F.when(g == name, F.lit(int(n_))).otherwise(nu)
        de = F.when(g == name, F.lit(int(d_))).otherwise(de)
    base = F.floor(nu / de).cast("int")
    rem = nu % de
    extra = (
        hash_bucket(F.col(id_col), 1_000_000_007, seed) % de < rem
    ).cast("int")
    copies = (base + extra).alias("__copies")
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .select(
            "*",
            F.explode(F.sequence(F.lit(1), F.col("__copies"))).alias(
                "copy_idx"
            ),
        )
        .drop("__copies")
    )
