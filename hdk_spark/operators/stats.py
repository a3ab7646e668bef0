"""Per-group robust statistics / feature normalization — the
pre-training feature-conditioning step of a data pipeline (winsorize
outlier weights, quantile-normalize quality scores per source, z-score
per group). Beyond the reference's OLAP surface; the reference's only
related facility is its quantile aggregate family (SURVEY.md §2.5),
which these operators compose per group.

Scale design:

- ``group_quantile_stats`` is ONE groupBy aggregate. Exact percentiles
  (``percentile``) sort each group's values — fine when groups are
  bounded (sources, languages, shards). For billions of rows per group
  switch ``exact=False`` (t-digest ``approx_percentile``, mergeable
  partial aggregation, no per-group sort).
- ``winsorize`` joins the tiny per-group stats relation back —
  broadcast-sized by construction (one row per group); the data pass
  stays map-only.
- ``quantile_normalize`` is one window function (single shuffle on the
  group key). ``zscore`` uses exact DECIMAL moment sums, so the
  variance is order-independent — a float sum across partitions would
  be nondeterministic under re-partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from hdk_spark.functions.scalar import round6

__all__ = [
    "group_quantile_stats",
    "winsorize",
    "quantile_normalize",
    "zscore",
    "embedding_covariance",
    "group_mad",
    "group_mode",
    "annotator_agreement",
    "fleiss_kappa",
    "krippendorff_alpha",
    "label_merge",
    "chi2_contingency",
    "calibration_curve",
    "ks_test",
    "auc_score",
    "pass_at_k",
    "k_anonymity_audit",
]


def group_quantile_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    exact: bool = True,
) -> DataFrame:
    """Per-group (n, lo, hi) percentile bounds. ``lo``/``hi`` are
    rounded to cents (DECIMAL(18,2)) so downstream clipping stays in
    exact decimal arithmetic."""
    pf = F.percentile if exact else F.approx_percentile
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(pf(F.col(value_col).cast("double"), F.lit(p_lo)), 2)
        .cast("decimal(18,2)")
        .alias("lo"),
        F.round(pf(F.col(value_col).cast("double"), F.lit(p_hi)), 2)
        .cast("decimal(18,2)")
        .alias("hi"),
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    out_col: str = "winsorized",
    exact: bool = True,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [p_lo, p_hi] percentile range
    (cent-rounded bounds → exact decimal clip). Adds ``out_col``."""
    stats = group_quantile_stats(df, group_col, value_col, p_lo, p_hi, exact)
    v = F.col(value_col).cast("decimal(18,2)")
    return (
        df.join(F.broadcast(stats.drop("n")), on=group_col)
        .withColumn(out_col, F.least(F.greatest(v, F.col("lo")), F.col("hi")))
        .drop("lo", "hi")
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_col: str,
    out_col: str = "qnorm",
) -> DataFrame:
    """Map each value to its within-group percent rank in [0, 1] —
    rank-based normalization that is immune to outliers and comparable
    across groups. ``order_col`` breaks ties deterministically. The
    result is the exact rational (rank-1)/(n-1)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(order_col)
    )
    return df.withColumn(out_col, F.percent_rank().over(w))


def zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score with order-independent moments: mean and
    variance come from exact DECIMAL sums (sum, sum of squares), so the
    result is identical under any partitioning — the float-accumulator
    version would hash differently run-to-run at scale."""
    v = F.col(value_col).cast("decimal(18,2)")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s1"),
        F.sum((v * v).cast("decimal(38,4)")).alias("__s2"),
    )
    # exact decimal sums → double once; the float arithmetic below is a
    # pure function of order-independent inputs, so it is deterministic
    # under any partitioning (s1*s1 in decimal would overflow p=38)
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    n = F.col("__n").cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    return (
        df.join(F.broadcast(stats), on=group_col)
        .withColumn(
            out_col,
            (F.col(value_col).cast("double") - mean) / F.sqrt(var),
        )
        .drop("__n", "__s1", "__s2")
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: "list[int] | None" = None,
    n_dims: int | None = None,
    correlation: bool = False,
    deterministic: bool = False,
) -> DataFrame:
    """Sample covariance matrix of an embedding column, as (i, j, cov)
    upper-triangle rows — the second-moment input to PCA / whitening /
    decorrelation of an embedding table. ``correlation=True`` emits
    Pearson correlations instead (same single pass: corr(i,j) =
    num(i,j) / √(num(i,i)·num(j,j)) where num = Σxy − ΣxΣy/n — the
    (n−1) divisors cancel, so no extra aggregates are needed), with
    the output column named ``corr``.

    ``deterministic=False`` (default — the production path) uses the
    native double-accumulator aggregates (covar_samp / corr): fastest
    mergeable pass, but partial-sum order leaves low-order-bit
    nondeterminism under re-partitioning (harmless for PCA/whitening).
    ``deterministic=True`` quantizes each per-row product once to
    DECIMAL(38,12) and sums exactly — bit-identical under any
    partitioning and on any engine, which is what the oracle-checked
    contract queries pin (measured ~6× slower at 100k×16d: BigDecimal
    accumulation per cell; the crc32-vs-md5 trade, applied to moments).

    ``dims`` selects vector positions (0-based); ``n_dims`` is
    shorthand for the first k. Default: all positions (requires a
    first-row peek for the width).

    Scale shape: ONE map-only projection (element extraction) feeding a
    single partial-aggregable pass — d first-moment sums + d(d+1)/2
    product sums + one count, all mergeable aggregates, no shuffle of
    the data itself, result is d²-sized. The unpivot to rows is
    driver-free (stack over the aggregated single row). Beats the
    explode-to-long formulation (which shuffles n·d rows and joins) by
    keeping everything in whole-stage codegen until the final one-row
    aggregate.

    How ``deterministic=True`` works: each per-row product (an exact
    IEEE double, identical on any engine) is quantized once to
    DECIMAL(38,12) and summed exactly; the covariance
    ``(Σxy − ΣxΣy/n)/(n−1)`` is then a pure double function of
    order-independent inputs — where ``covar_samp`` would accumulate
    order-dependent floating partial sums (the round-3 oracle red
    row). |v| ≤ O(1) embeddings keep the decimal sums far from the
    26-integer-digit headroom even at 1e12 rows.
    """
    if dims is None:
        if n_dims is not None:
            dims = list(range(n_dims))
        else:
            first = df.select(F.size(vec_col).alias("d")).first()
            dims = list(range(first["d"] if first else 0))
    elems = df.select(
        *[F.col(vec_col)[i].cast("double").alias(f"__e{i}") for i in dims]
    )
    out_name = "corr" if correlation else "cov"
    stack_args = ", ".join(
        f"{i}, {j}, c_{i}_{j}" for ai, i in enumerate(dims) for j in dims[ai:]
    )
    n_cells = sum(range(1, len(dims) + 1))

    def unstack(celled):
        return celled.select(
            F.expr(f"stack({n_cells}, {stack_args}) AS (i, j, {out_name})")
        ).select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            round6(out_name).alias(out_name),
        )

    if not deterministic:
        agg_fn = F.corr if correlation else F.covar_samp
        cells = [
            agg_fn(f"__e{i}", f"__e{j}").alias(f"c_{i}_{j}")
            for ai, i in enumerate(dims)
            for j in dims[ai:]
        ]
        return unstack(elems.agg(*cells))

    def dec(c):
        return c.cast("decimal(38,12)")

    aggs = [F.sum(dec(F.col(f"__e{i}"))).alias(f"s_{i}") for i in dims]
    for ai, i in enumerate(dims):
        for j in dims[ai:]:
            prod = F.col(f"__e{i}") * F.col(f"__e{j}")
            aggs.append(F.sum(dec(prod)).alias(f"sxy_{i}_{j}"))
            aggs.append(F.count(prod).alias(f"n_{i}_{j}"))
    agged = elems.agg(*aggs)

    def num(i, j):
        # Σxy − ΣxΣy/n as a pure double function of the exact sums
        n = F.col(f"n_{i}_{j}").cast("double")
        sx = F.col(f"s_{i}").cast("double")
        sy = F.col(f"s_{j}").cast("double")
        sxy = F.col(f"sxy_{i}_{j}").cast("double")
        return sxy - sx * sy / n, n

    cov_cols = []
    for ai, i in enumerate(dims):
        for j in dims[ai:]:
            nm, n = num(i, j)
            if correlation:
                dii, _ = num(i, i)
                djj, _ = num(j, j)
                cell = nm / F.sqrt(dii * djj)
            else:
                cell = nm / (n - F.lit(1.0))
            cov_cols.append(cell.alias(f"c_{i}_{j}"))
    return unstack(agged.select(*cov_cols))


def group_mad(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group median and median absolute deviation — the robust
    location/scale pair (outlier-immune where mean/stddev are not;
    MAD·1.4826 estimates σ for normal data).

    NULL-valued rows are excluded up front (``n`` counts exactly the
    values the statistics describe); rows with a NULL group key have
    no group and are likewise excluded.

    Scale shape: one exact-percentile aggregate for the medians, ONE
    broadcast join of the group-sized medians back (map-only data
    pass), one more percentile aggregate over the absolute deviations.
    Exact percentiles sort per group — switch the workload to
    approx_percentile for billion-row groups; for bounded groups
    (sources, languages) the two-pass exact form is the right default.
    """
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    med = base.groupBy(group_col).agg(
        F.percentile(F.col(value_col).cast("double"), F.lit(0.5)).alias("__med")
    )
    dev = base.join(F.broadcast(med), on=group_col).withColumn(
        "__dev", F.abs(F.col(value_col).cast("double") - F.col("__med"))
    )
    return (
        dev.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            round6(F.first("__med")).alias("median"),
            F.round(F.percentile(F.col("__dev"), F.lit(0.5)), 6).alias("mad"),
        )
    )


def group_mode(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group modal value with a DETERMINISTIC tie-break (highest
    count, then smallest value) — engine mode() aggregates return an
    arbitrary tie member, which the repo's reproducibility rule (and
    any oracle hash) cannot accept.

    Returns (group, mode_value, n_mode). NULL values are excluded
    (they have no mode claim); NULL group keys are excluded with them.

    Scale shape: one (group, value) partial-agg count — the modal
    head collapses map-side — then a per-group WindowGroupLimit
    row_number pass over the (group-cardinality × distinct-values)
    counts relation, which is bounded well below the data size.
    """
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    counts = base.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("mode_value")
    ).agg(F.count(F.lit(1)).alias("n_mode"))
    w = Window.partitionBy("grp").orderBy(
        F.desc("n_mode"), F.asc("mode_value")
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("grp").alias(group_col), "mode_value", "n_mode")
    )


def annotator_agreement(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa between two annotator label columns — the label-
    quality gate of an SFT/preference dataset (beyond-reference; cf.
    Cohen 1960): one row (n_items, n_classes, po, pe, kappa), where po
    is observed agreement, pe chance agreement from the two marginals,
    and kappa = (po − pe) / (1 − pe). Rows where either label is NULL
    are excluded (un-annotated items aren't agreement evidence).

    Exact-arithmetic discipline: all counts are integers; po, pe and
    kappa each divide ONCE and emit through round6 (the repo's
    rounded-double convention — both engines feed the divides
    identical integers). kappa uses the integer identity
    (po − pe)/(1 − pe) = (n·Σdiag − Σ row_c·col_c)/(n² − Σ row_c·col_c)
    — a single integer-ratio divide, no compounding float error; NULL
    when pe = 1 (both annotators constant and identical — agreement is
    undefined there, not perfect).

    Scale shape: ONE partial-agg groupBy on the (a, b) label pair —
    the corpus is read once and collapses to a classes²-sized
    relation; marginals, the Σ row·col join, and the class count all
    run on that tiny relation (broadcast combines).
    """
    a, b = F.col(a_col), F.col(b_col)
    pairs = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    from hdk_spark.functions.scalar import round6

    totals = pairs.agg(
        F.sum("__c").cast("long").alias("n_items"),
        F.sum(
            F.when(F.col("__a") == F.col("__b"), F.col("__c")).otherwise(0)
        ).cast("long").alias("__diag"),
    )
    rows_m = pairs.groupBy(F.col("__a").alias("__cls")).agg(
        F.sum("__c").cast("long").alias("__r")
    )
    cols_m = pairs.groupBy(F.col("__b").alias("__cls")).agg(
        F.sum("__c").cast("long").alias("__k")
    )
    rc = rows_m.join(cols_m, "__cls").agg(
        F.coalesce(F.sum(F.col("__r") * F.col("__k")), F.lit(0))
        .cast("long").alias("__rc")
    )
    n_classes = (
        pairs.select(F.col("__a").alias("__cls"))
        .union(pairs.select("__b"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
    )
    base = (
        totals.crossJoin(F.broadcast(rc)).crossJoin(F.broadcast(n_classes))
    )
    n, diag, rc_ = F.col("n_items"), F.col("__diag"), F.col("__rc")
    kappa = F.when(n * n != rc_, (n * diag - rc_) / (n * n - rc_))
    return base.select(
        "n_items",
        "n_classes",
        round6(diag / n).alias("po"),
        round6(rc_ / (n * n)).alias("pe"),
        round6(kappa).alias("kappa"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
) -> DataFrame:
    """Fleiss' kappa over LONG-format annotations (one row per
    (item, annotation); Fleiss 1971) — the >2-annotator companion of
    :func:`annotator_agreement`. One output row:
    (n_items, n_classes, n_raters, po, pe, kappa, m_constant).

    Fleiss' formula assumes every item has the same number of
    annotations m; ``m_constant`` reports whether the data satisfies
    that, and po/pe/kappa are NULL when it doesn't (emitting a number
    from the wrong formula would be worse than abstaining —
    observability over exceptions, no extra driver action).

    Exact-arithmetic discipline: with A = Σ_ij n_ij(n_ij−1),
    D = N·m(m−1), B = Σ_j c_j², E = (N·m)²,
    po = A/D, pe = B/E, kappa = (A·E − B·D) / (D·(E − B)) — integer
    ratios dividing once, summed/multiplied in DECIMAL(38,0) so c_j²
    and the cross products can't overflow int64 at corpus scale;
    NULL kappa when E = B (pe = 1, undefined). NULL labels are
    excluded like annotator_agreement.

    Scale shape: one partial-agg groupBy on (item, label), one on
    item (m_i), one label-sized groupBy (c_j) — all map-side
    combinable; the combine is a broadcast of three 1-row relations.
    """
    item, lab = F.col(item_col), F.col(label_col)
    nij = (
        df.filter(lab.isNotNull())
        .groupBy(item.alias("__i"), lab.alias("__l"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_item = nij.groupBy("__i").agg(F.sum("__n").alias("__m"))
    items = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.countDistinct("__m").alias("__m_kinds"),
        F.min("__m").cast("long").alias("__m"),
    )
    a_sum = nij.agg(
        F.sum((F.col("__n") * (F.col("__n") - 1)).cast("decimal(38,0)"))
        .alias("__A"),
        F.countDistinct("__l").cast("long").alias("n_classes"),
    )
    b_sum = (
        nij.groupBy("__l").agg(F.sum("__n").cast("decimal(38,0)").alias("__c"))
        .agg(F.sum(F.col("__c") * F.col("__c")).alias("__B"))
    )
    from hdk_spark.functions.scalar import round6

    base = items.crossJoin(F.broadcast(a_sum)).crossJoin(F.broadcast(b_sum))
    n, m = F.col("n_items").cast("decimal(38,0)"), F.col("__m").cast(
        "decimal(38,0)")
    A, B = F.col("__A"), F.col("__B")
    ok = F.col("__m_kinds") == 1
    D = (n * m * (F.col("__m") - 1).cast("decimal(38,0)"))
    E = (n * m) * (n * m)
    po = F.when(ok & (D > 0), A.cast("double") / D.cast("double"))
    pe = F.when(ok, B.cast("double") / E.cast("double"))
    kappa = F.when(
        ok & (E != B) & (D > 0),
        (A * E - B * D).cast("double") / (D * (E - B)).cast("double"),
    )
    return base.select(
        "n_items",
        "n_classes",
        F.when(ok, F.col("__m")).alias("n_raters"),
        round6(po).alias("po"),
        round6(pe).alias("pe"),
        round6(kappa).alias("kappa"),
        ok.alias("m_constant"),
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    label_col: str,
) -> DataFrame:
    """Krippendorff's alpha (nominal; Krippendorff 2004 §11) over
    LONG-format annotations — the agreement coefficient for the case
    :func:`fleiss_kappa` deliberately ABSTAINS on: any number of
    raters, VARYING raters per item, missing labels. The labeling-ops
    triple is kappa (2 raters) → Fleiss (constant m) → alpha
    (anything), so a crowdsourced labeling pipeline always has a
    defined reliability gate.

    Coincidence-matrix form: with n_uc the count of label c in unit u
    and m_u = Σ_c n_uc, units with m_u < 2 are unpairable and drop;

        A  = Σ_u Σ_c n_uc·(n_uc − 1)/(m_u − 1)   (agreement mass)
        n_c = Σ_u n_uc,   n = Σ_c n_c
        alpha = 1 − (n − A)·(n − 1) / (n² − Σ_c n_c²)

    A is the one fractional sum (per-unit denominators differ), so
    each (u, c) term is MICRO-QUANTIZED — round(term·1e9) summed in
    DECIMAL(38,0), order-independent across the shuffle (the
    bm25/retrieval-metrics discipline); marginals are exact integers.
    Output: one row (n_units, n_pairable, n_classes, n_vals, alpha);
    alpha is NULL when the expected-disagreement denominator is 0
    (every pairable value identical, or < 2 pairable values) —
    abstention over a 0/0 emission.

    Scale shape: one partial-agg groupBy on (item, label), one on
    item, one label-sized groupBy for marginals; the combine is a
    cross of three broadcast 1-row relations. No window, no explode —
    alpha over 100 TB of annotations is three map-side-combinable
    aggregations.
    """
    item, lab = F.col(item_col), F.col(label_col)
    nij = (
        df.filter(lab.isNotNull())
        .groupBy(item.alias("__i"), lab.alias("__l"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    per_item = nij.groupBy("__i").agg(
        F.sum("__n").cast("long").alias("__m")
    )
    unit_stats = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum((F.col("__m") >= 2).cast("long")).cast("long")
        .alias("n_pairable"),
    )
    cells = nij.join(
        per_item.filter(F.col("__m") >= 2), "__i"
    )
    a_q = (
        F.round(
            F.lit(1e9)
            * (F.col("__n") * (F.col("__n") - 1)).cast("double")
            / (F.col("__m") - 1).cast("double")
        ).cast("decimal(38,0)")
    )
    a_sum = cells.agg(
        F.coalesce(F.sum(a_q), F.lit(0).cast("decimal(38,0)"))
        .alias("__Aq"),
        F.countDistinct("__l").cast("long").alias("n_classes"),
    )
    marg = (
        cells.groupBy("__l")
        .agg(F.sum("__n").cast("decimal(38,0)").alias("__c"))
        .agg(
            F.coalesce(F.sum("__c"), F.lit(0).cast("decimal(38,0)"))
            .alias("__N"),
            F.coalesce(
                F.sum(F.col("__c") * F.col("__c")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__S2"),
        )
    )
    from hdk_spark.functions.scalar import round6

    base = unit_stats.crossJoin(F.broadcast(a_sum)).crossJoin(
        F.broadcast(marg)
    )
    n = F.col("__N").cast("double")
    de_num = F.col("__N") * F.col("__N") - F.col("__S2")
    alpha = F.when(
        de_num > 0,
        F.lit(1.0)
        - (n - F.col("__Aq").cast("double") / F.lit(1e9))
        * (n - F.lit(1.0))
        / de_num.cast("double"),
    )
    return base.select(
        "n_units",
        "n_pairable",
        "n_classes",
        F.col("__N").cast("long").alias("n_vals"),
        round6(alpha).alias("alpha"),
    )


def label_merge(
    df: DataFrame,
    item_col: str,
    label_col: str,
) -> DataFrame:
    """Majority-vote label merge — what turns multi-annotator rows
    into THE training label once :func:`annotator_agreement` /
    :func:`fleiss_kappa` say the annotators are usable. One row per
    item: (item, label, votes, n_annotations, share, tied); the
    winner is most-votes with a DETERMINISTIC tie-break
    (lexicographically smallest label — stable across runs and
    engines; ``tied`` exposes the ambiguity so a pipeline can route
    tied items to re-annotation instead of silently keeping the
    tie-break). share divides once (votes/n) through round6. NULL
    labels are excluded.

    Scale shape: one partial-agg groupBy on (item, label), then ONE
    window over the item key (same exchange — the vote relation is
    already item-partitioned)."""
    from pyspark.sql.window import Window

    from hdk_spark.functions.scalar import round6

    item, lab = F.col(item_col), F.col(label_col)
    votes = (
        df.filter(lab.isNotNull())
        .groupBy(item.alias("__i"), lab.alias("__l"))
        .agg(F.count(F.lit(1)).alias("__v"))
    )
    w = Window.partitionBy("__i")
    ranked = votes.select(
        "*",
        F.row_number().over(
            w.orderBy(F.desc("__v"), F.asc("__l"))
        ).alias("__rn"),
        F.sum("__v").over(w).alias("__n"),
        F.count(F.when(F.col("__v") == F.max("__v").over(w), 1)).over(w)
        .alias("__top_ct"),
    )
    return ranked.filter(F.col("__rn") == 1).select(
        F.col("__i").alias(item_col),
        F.col("__l").alias(label_col),
        F.col("__v").cast("long").alias("votes"),
        F.col("__n").cast("long").alias("n_annotations"),
        round6(F.col("__v") / F.col("__n")).alias("share"),
        (F.col("__top_ct") > 1).alias("tied"),
    )


def chi2_contingency(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (Pearson 1900) — the recipe-comparison gate of a data
    pipeline ("did the new filter change the label mix?"): one row
    (n_items, a_classes, b_classes, dof, chi2, cramers_v). Rows with a
    NULL in either column are excluded (not evidence).

    Exactness discipline: cell counts O and marginals r, c are exact
    integers from ONE partial-agg groupBy on the label pair. Each
    cell's term uses the integer identity
    (O − r·c/n)²/(r·c/n) = (O·n − r·c)²/(n·r·c), evaluated in double
    from those exact integers and quantized to int64 micro-units
    (round(term·1e9), the bm25 convention) so the cross-cell SUM is
    order-independent; micro-units sum into DECIMAL(38,0) so the fold
    cannot overflow. Products stay double-exact below 2^53 — the
    n·r·c bound holds to ~10^15 items, documented, not checked.

    Scale shape: the corpus collapses map-side to a classes²-sized
    cell relation; marginals and the statistic run on that tiny
    relation with broadcast combines — no second corpus scan.
    """
    from hdk_spark.functions.scalar import round6

    a, b = F.col(a_col), F.col(b_col)
    cells = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
    )
    rows_m = cells.groupBy("__a").agg(
        F.sum("__o").cast("long").alias("__r")
    )
    cols_m = cells.groupBy("__b").agg(
        F.sum("__o").cast("long").alias("__k")
    )
    tot = cells.agg(
        F.sum("__o").cast("long").alias("n_items"),
        F.count_distinct(F.col("__a")).cast("long").alias("a_classes"),
        F.count_distinct(F.col("__b")).cast("long").alias("b_classes"),
    )
    # every (row, col) pair contributes — absent cells have O = 0 but
    # (0·n − r·c)² > 0, so build the full grid from the marginals
    grid = F.broadcast(rows_m).crossJoin(F.broadcast(cols_m))
    full = grid.join(cells, ["__a", "__b"], "left").select(
        "__r", "__k", F.coalesce(F.col("__o"), F.lit(0)).alias("__o")
    )
    full = full.crossJoin(F.broadcast(tot))
    o, r, k, n = (
        F.col("__o").cast("double"),
        F.col("__r").cast("double"),
        F.col("__k").cast("double"),
        F.col("n_items").cast("double"),
    )
    term = (o * n - r * k) * (o * n - r * k) / (n * r * k)
    micro = F.round(term * F.lit(1e9)).cast("decimal(38,0)")
    agg = full.groupBy("n_items", "a_classes", "b_classes").agg(
        F.sum(micro).alias("__m")
    )
    chi2 = F.col("__m").cast("double") / F.lit(1e9)
    dof = (F.col("a_classes") - 1) * (F.col("b_classes") - 1)
    denom = (
        F.col("n_items")
        * F.least(F.col("a_classes") - 1, F.col("b_classes") - 1)
    ).cast("double")
    return agg.select(
        "n_items",
        "a_classes",
        "b_classes",
        dof.cast("long").alias("dof"),
        round6(chi2).alias("chi2"),
        round6(
            F.when(denom > 0, F.sqrt(chi2 / denom))
        ).alias("cramers_v"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a probabilistic scorer (the quality-
    classifier acceptance gate: "does score 0.8 mean 80% good?"):
    bucket scores into ``n_bins`` equal-width bins over [0, 1] and
    emit per-bin (bin, n, mean_score, pos_rate, abs_gap) — ECE is one
    weighted fold over this relation. Rows with a NULL score or label
    are excluded; scores outside [0, 1] clamp into the edge bins
    (scorers emit logits-through-sigmoid; exact 1.0 belongs in the top
    bin, not a phantom n_bins-th one).

    Order-independence: scores are quantized to DECIMAL(28,9) (1e-9
    grid) before the per-bin SUM, so the mean is exact regardless of
    aggregation order; labels sum as integers. Both divides happen
    once per bin and emit through round6.

    Scale shape: ONE partial-agg groupBy on the bin — the corpus
    collapses map-side to an n_bins-sized relation.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    from hdk_spark.functions.scalar import round6

    s, y = F.col(score_col), F.col(label_col).cast("long")
    src = df.filter(s.isNotNull() & F.col(label_col).isNotNull())
    bin_ = F.greatest(
        F.lit(0),
        F.least(F.floor(s * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)),
    )
    agg = src.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(s.cast("decimal(28,9)")).alias("__s"),
        F.sum(y).cast("long").alias("__pos"),
    )
    mean_s = F.col("__s").cast("double") / F.col("n")
    rate = F.col("__pos").cast("double") / F.col("n")
    return agg.select(
        "bin", "n",
        round6(mean_s).alias("mean_score"),
        round6(rate).alias("pos_rate"),
        round6(F.abs(mean_s - rate)).alias("abs_gap"),
    ).orderBy("bin")


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    a_label,
    b_label,
    quantize: "int | None" = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the ``a_label``
    and ``b_label`` slices of ``value_col`` — the distribution-drift
    gate ("did the new crawl change the quality-score distribution?")
    that complements chi2 (categorical) and psi-style binned drift.

    EXACT: D = max over the support of |F_a(x) − F_b(x)| is computed
    as max |cum_a·n_b − cum_b·n_a| over integer cumulative counts —
    one cross-multiplied integer per support point, no float CDFs —
    then divided ONCE and emitted through round6. Returns one row
    (n_a, n_b, d_num, d) with d_num the integer numerator (the
    bit-exact surface).

    Scale shape: the corpus collapses map-side via groupBy(value) to
    a |support|-sized relation; the cumulative runs as ONE window
    over that support. For continuous 100 TB columns, pass
    ``quantize=<decimal places>`` — values snap to that grid BEFORE
    the support groupBy (decimal-exact Spark round), so the support,
    not the corpus, bounds the single-task window (the histogram
    discipline, now enforceable instead of advisory). On a column
    already at that resolution quantization is a bit-exact no-op
    (property-tested), so enabling it defensively costs nothing.
    """
    g, v = F.col(group_col), F.col(value_col)
    if quantize is not None:
        v = F.round(v, int(quantize))
    src = df.filter(v.isNotNull() & g.isin([a_label, b_label]))
    per = src.groupBy(v.alias("__v")).agg(
        F.sum(F.when(g == a_label, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(g == b_label, 1).otherwise(0)).alias("__cb"),
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        F.sum("__ca").over(w).alias("__fa"),
        F.sum("__cb").over(w).alias("__fb"),
    )
    tot = per.agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
    )
    joined = cum.crossJoin(F.broadcast(tot))
    agg = joined.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(
            F.abs(F.col("__fa") * F.col("n_b") - F.col("__fb") * F.col("n_a"))
        ).cast("long").alias("d_num"),
    )
    from hdk_spark.functions.scalar import round6

    return agg.select(
        "n_a", "n_b", "d_num",
        round6(
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("d_num") / (F.col("n_a") * F.col("n_b")),
            )
        ).alias("d"),
    )


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quantize: "int | None" = None,
) -> DataFrame:
    """EXACT ROC-AUC of a scorer against binary labels via the
    Mann-Whitney identity with midranks for ties:

        AUC = (Σ rank2(pos) − P·(P+1)) / (2·P·N)

    where rank2(x) = 2·(# values < x) + (# values = x) + 1 is TWICE
    the average rank of x's tie group — an integer, so the whole
    numerator is exact (summed in DECIMAL(38,0)); one divide at the
    end through round6. Rows with NULL score or label are excluded.
    Returns one row (n_pos, n_neg, auc_num, auc); auc_num =
    Σrank2(pos) − P(P+1) is the bit-exact integer surface; auc is
    NULL when either class is empty.

    Scale shape: groupBy(score) collapses the corpus map-side to the
    score support; ONE window over the support computes the tie-group
    prefix; the rank2 weighted sum is one aggregate. Same support-not-
    corpus bound as ks_test above — and the same enforceable
    ``quantize=<decimal places>`` grid snap (bit-exact no-op on a
    column already at that resolution; ties created by quantization
    get correct midrank treatment by construction).
    """
    s = F.col(score_col)
    if quantize is not None:
        s = F.round(s, int(quantize))
    y = F.col(label_col).cast("long")
    src = df.filter(s.isNotNull() & F.col(label_col).isNotNull())
    per = src.groupBy(s.alias("__s")).agg(
        F.sum(F.when(y != 0, 1).otherwise(0)).alias("__p"),
        F.count(F.lit(1)).alias("__t"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.select(
        "__p", "__t",
        F.coalesce(F.sum("__t").over(w), F.lit(0)).alias("__before"),
    )
    agg = ranked.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__t") - F.sum("__p")).cast("long").alias("n_neg"),
        F.sum(
            (
                F.col("__p")
                * (F.lit(2) * F.col("__before") + F.col("__t") + F.lit(1))
            ).cast("decimal(38,0)")
        ).alias("__r2"),
    )
    from hdk_spark.functions.scalar import round6

    num = (
        F.col("__r2").cast("decimal(38,0)")
        - F.col("n_pos").cast("decimal(38,0)") * (F.col("n_pos") + 1)
    )
    return agg.select(
        "n_pos", "n_neg",
        num.cast("decimal(38,0)").alias("auc_num"),
        round6(
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                num.cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_pos").cast("double")
                    * F.col("n_neg").cast("double")
                ),
            )
        ).alias("auc"),
    )


def pass_at_k(
    df: DataFrame,
    n_col: str,
    c_col: str,
    ks: "tuple[int, ...]" = (1, 10, 100),
    id_col: str = "problem_id",
) -> DataFrame:
    """The unbiased pass@k estimator of Chen et al. 2021 (Codex,
    eq. 1) per problem, plus its corpus mean — THE metric of a
    code-generation eval pipeline: given n samples of which c passed,

        pass@k = 1 − C(n−c, k)/C(n, k)
               = 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i)

    evaluated as the right-hand product so nothing overflows. Each
    factor is a ratio of exact integers; the product folds over a
    k-term literal sequence in a fixed order, then emits through
    round6. k > n−c makes the product empty-of-support → pass@k = 1
    (some sample must pass); c = 0 gives exactly 0. Rows with NULL
    n/c are excluded; k < 1 raises. c > n (a malformed eval row)
    yields NULL pass@k for that row — NULL, not a raise, because
    detecting it eagerly would cost a driver-side action on a
    map-only operator; the NULL makes the corruption visible
    row-by-row instead of silently clamping.

    Returns one row per problem (id, n, c, pass_at_{k}...) — mean
    over problems is one tiny aggregate the caller owns (means of
    rounded per-problem values, the reporting convention).

    Scale shape: ONE map-only projection over the per-problem
    (n, c) relation — the expensive part of a code eval (running the
    samples) happened upstream; this is the exact final fold.
    """
    if not ks or any(int(k) < 1 for k in ks):
        raise ValueError(f"ks must be positive ints, got {ks}")
    from hdk_spark.functions.scalar import round6

    n, c = F.col(n_col).cast("long"), F.col(c_col).cast("long")
    src = df.filter(n.isNotNull() & c.isNotNull())

    def pk(k: int):
        prod = F.aggregate(
            F.sequence(F.lit(0), F.lit(int(k) - 1)),
            F.lit(1.0),
            lambda acc, i: acc
            * F.when(n - c - i > 0, (n - c - i).cast("double"))
            .otherwise(F.lit(0.0))
            / (n - i).cast("double"),
        )
        # branch order matters: n−c < k (which covers every k > n
        # case with c > 0) short-circuits to 1.0 BEFORE prod, so the
        # product's (n − i) divisors are provably ≥ 1 when evaluated
        return F.when(c > n, F.lit(None)).otherwise(
            F.when(c == 0, F.lit(0.0)).otherwise(
                F.when(n - c < k, F.lit(1.0)).otherwise(
                    F.lit(1.0) - prod
                )
            )
        )

    return src.select(
        F.col(id_col),
        n.alias("n"),
        c.alias("c"),
        *[round6(pk(int(k))).alias(f"pass_at_{int(k)}") for k in ks],
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: "list[str]",
    k: int = 5,
    sensitive_col: "str | None" = None,
) -> DataFrame:
    """k-anonymity (Sweeney 2002) audit of a table against a
    quasi-identifier set — the re-identification gate a training-data
    release runs before shipping: every row whose quasi-identifier
    combination is shared by fewer than ``k`` rows is at risk. With
    ``sensitive_col``, also reports l-diversity (the minimum count of
    distinct sensitive values within any quasi-group — homogeneous
    groups leak the attribute even at high k).

    Returns one row: (n_rows, n_groups, min_group_size,
    groups_below_k, rows_below_k, pct_rows_at_risk[, min_l]) —
    pct through round6. NULL quasi values form their own group
    (groupBy semantics): NULL is itself a linkable value.

    Scale shape: ONE partial-agg groupBy on the quasi tuple (the
    corpus collapses map-side), then a tiny aggregate over the group
    relation. No joins, no windows.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).alias("__l")
        )
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out_aggs = [
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__n").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .cast("long").alias("groups_below_k"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long").alias("rows_below_k"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("__l").cast("long").alias("min_l"))
    agg = groups.agg(*out_aggs)
    cols = [
        "n_rows", "n_groups", "min_group_size",
        "groups_below_k", "rows_below_k",
        round6(F.col("rows_below_k") / F.col("n_rows"))
        .alias("pct_rows_at_risk"),
    ]
    if sensitive_col is not None:
        cols.append(F.col("min_l"))
    return agg.select(*cols)
