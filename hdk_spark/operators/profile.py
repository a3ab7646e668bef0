"""Dataset profiling: one-pass numeric column summary (the
`SUMMARIZE` / `df.describe` utility surface, made deterministic).

Scale shape: ONE aggregate pass computes every column's statistics as
mergeable aggregates, then a driver-free stack() unpivots the single
aggregated row to long form. Defaults are the scale path — t-digest
percentiles and native double-accumulator moments; pass
``deterministic=True`` (exact DECIMAL moment sums, the
``stats.zscore`` pattern) and ``exact=True`` (sort-based interpolated
percentiles) when bit-reproducibility matters — the oracle-checked
contract query pins both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from hdk_spark.functions.scalar import round6

__all__ = ["summarize", "histogram", "skew_report", "expect", "drift_report", "snapshot_diff", "json_schema_gate"]


def summarize(
    df: DataFrame,
    cols: "list[str] | None" = None,
    quantiles: tuple = (0.25, 0.5, 0.75),
    exact: bool = False,
    deterministic: bool = False,
) -> DataFrame:
    """Long-form numeric profile: one row per column with
    (column, n, n_null, min, max, mean, stddev, q_25, q_50, q_75 ...).
    All statistics double-typed and rounded to 6 digits.

    Defaults are the SCALE path: t-digest percentiles (mergeable —
    ``exact=True``'s sort-based percentile buffers every value) and
    native double-accumulator mean/stddev. ``deterministic=True``
    switches the moments to exact decimal sums (bit-identical under
    any partitioning; ~2-3× slower BigDecimal accumulation) — the
    oracle-checked contract query pins ``exact=True,
    deterministic=True`` (profiling numbers for human eyes don't need
    bit-reproducibility; oracle hashes do)."""
    if cols is None:
        from pyspark.sql import types as T

        num = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType, T.DecimalType)
        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, num)]
    if not cols:
        raise ValueError("no numeric columns to summarize")
    pf = F.percentile if exact else F.approx_percentile
    aggs = []
    qnames = [str(q).replace("0.", "q_") for q in quantiles]
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.min(v).alias(f"__min_{c}"),
            F.max(v).alias(f"__max_{c}"),
            *[
                pf(v, F.lit(q)).alias(f"__{qn}_{c}")
                for q, qn in zip(quantiles, qnames)
            ],
        ]
        if deterministic:
            dec = F.col(c).cast("decimal(18,2)")
            aggs += [
                F.sum(dec).alias(f"__s1_{c}"),
                F.sum((dec * dec).cast("decimal(38,4)")).alias(f"__s2_{c}"),
            ]
        else:
            aggs += [
                F.avg(v).alias(f"__mean_{c}"),
                F.stddev_samp(v).alias(f"__std_{c}"),
            ]
    agged = df.agg(*aggs)
    out_cols = []
    for c in cols:
        if deterministic:
            n = F.col(f"__n_{c}").cast("double")
            s1 = F.col(f"__s1_{c}").cast("double")
            s2 = F.col(f"__s2_{c}").cast("double")
            mean = s1 / n
            std = F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0)))
        else:
            mean = F.col(f"__mean_{c}")
            std = F.col(f"__std_{c}")
        out_cols.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").cast("long").alias("n"),
                F.col(f"__nn_{c}").cast("long").alias("n_null"),
                round6(f"__min_{c}").alias("min"),
                round6(f"__max_{c}").alias("max"),
                round6(mean).alias("mean"),
                round6(std).alias("stddev"),
                *[
                    round6(f"__{qn}_{c}").alias(qn)
                    for qn in qnames
                ],
            )
        )
    return (
        agged.select(F.explode(F.array(*out_cols)).alias("s"))
        .select("s.*")
        .orderBy("column")
    )


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo_edge,
    hi_edge, n) with bin ∈ [1, n_bins], values at the upper bound
    folded into the last bin (the standard closed-last-bin rule).

    Pass explicit ``lo``/``hi`` to keep this a SINGLE partial-agg pass
    (bounds are usually known corpus properties); omitted bounds cost
    one extra min/max aggregate first. Bin assignment is plain
    floor arithmetic — identical in any ANSI engine — rather than an
    engine-specific width_bucket. Out-of-range rows are dropped.
    """
    if lo is None or hi is None:
        row = df.agg(
            F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
        ).first()
        lo = lo if lo is not None else float(row[0])
        hi = hi if hi is not None else float(row[1])
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    v = F.col(col).cast("double")
    raw = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_bins)) + 1
    # least() clamp, not just a v == hi guard: float rounding can push
    # the quotient of a v just below hi up to exactly n_bins, which
    # would otherwise emit an out-of-contract bin n_bins + 1
    bin_ = F.least(raw, F.lit(n_bins)).cast("long")
    width = (hi - lo) / n_bins
    return (
        df.filter((v >= F.lit(lo)) & (v <= F.lit(hi)))
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            round6(F.lit(lo) + (F.col("bin") - 1) * F.lit(width)).alias(
                "lo_edge"
            ),
            round6(F.lit(lo) + F.col("bin") * F.lit(width)).alias("hi_edge"),
            "n",
        )
        .orderBy("bin")
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join/groupBy-key skew diagnostic: the ``top_k`` heaviest keys
    with their row share — the first thing to measure before choosing
    salting or AQE skew-join handling for a key. One partial-agg
    groupBy + a TakeOrdered top-k; the total is a 1-row scalar
    cross-joined back (broadcast). Ties break on the key value."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__total"))
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "key",
            "n",
            F.round(F.col("n") / F.col("__total").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy("rank")
    )


def expect(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Data-validation suite: evaluate every expectation rule (a SQL
    boolean over the row) in ONE aggregate pass and report per-rule
    violation counts — the ingest quality gate of a pipeline (dbt
    tests / Great-Expectations shape, but distributed and single-scan).

    ``rules`` maps rule name → SQL condition that should hold for
    every row (NULL condition counts as a violation — an expectation
    that cannot be evaluated is not satisfied). Returns
    (rule, n_rows, n_violations, passed) ordered by rule name.

    Scale shape: one global aggregate (all rules are conditional sums
    in the same partial-agg pass), then a literal-sized stack to long
    form. No shuffle beyond the single-row combine; adding a rule adds
    one codegen'd counter, not a pass.
    """
    if not rules:
        raise ValueError("expect() needs at least one rule")
    import re

    for rname in rules:
        if not re.fullmatch(r"[A-Za-z0-9_.\- ]+", rname):
            raise ValueError(
                f"rule name {rname!r} must be alphanumeric/_/-/./space "
                "(it is embedded in a SQL literal)"
            )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, cond) in enumerate(sorted(rules.items())):
        aggs.append(
            F.sum(
                F.when(F.coalesce(F.expr(cond), F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    names = sorted(rules)
    stacked = ", ".join(
        f"'{n}', __v{i}" for i, n in enumerate(names)
    )
    return (
        row.selectExpr(
            "__n", f"stack({len(names)}, {stacked}) AS (rule, n_violations)"
        )
        .select(
            "rule",
            F.col("__n").cast("long").alias("n_rows"),
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution drift between two dataset snapshots (PSI —
    population stability index — per equi-width bin): the monitoring
    step that catches a corpus refresh silently shifting a feature
    (doc lengths, quality scores) before it poisons a training run.

    Bins use :func:`histogram`'s floor arithmetic with SHARED literal
    bounds; each side's bin mass is smoothed by ``eps`` before the
    log-ratio so empty bins stay finite. Returns one row per bin
    (bin, n_a, n_b, psi_term rounded to 6) — total PSI is the sum;
    > 0.2 is the usual retrain/alert threshold.

    Scale shape: one partial-agg histogram pass per side, a bins-sized
    outer join, map-only arithmetic after that. Passing bounds keeps
    it two scans total; no corpus-sized join anywhere.
    """
    ha = histogram(df_a, col, n_bins, lo, hi).select(
        "bin", F.col("n").alias("n_a")
    )
    hb = histogram(df_b, col, n_bins, lo, hi).select(
        "bin", F.col("n").alias("n_b")
    )
    joined = (
        ha.join(hb, "bin", "full")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
    )
    # totals derived from the bins themselves (one window over the
    # bins-sized relation) — no extra corpus pass per side
    w = Window.partitionBy()
    ta = F.greatest(F.sum("n_a").over(w), F.lit(1)).cast("double")
    tb = F.greatest(F.sum("n_b").over(w), F.lit(1)).cast("double")
    pa = F.col("n_a") / ta + F.lit(eps)
    pb = F.col("n_b") / tb + F.lit(eps)
    return joined.select(
        "bin",
        "n_a",
        "n_b",
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    ).orderBy("bin")


def snapshot_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two dataset snapshots keyed by
    ``key_col``: every key is classified ``added`` (only in B),
    ``removed`` (only in A), ``changed`` (present in both, any compare
    column differs, NULL-safely) or ``unchanged`` — the
    dataset-versioning audit step (what did this corpus refresh
    actually do?).

    Returns (key, status). Aggregate downstream for the summary;
    filter for the change sample. Comparison uses null-safe equality
    (<=> / IS NOT DISTINCT FROM) so NULL→value and value→NULL edits
    count as changes, NULL==NULL does not.

    Scale shape: ONE full outer equi-join on the key (AQE-sized — at
    100 TB this is the same sort-merge any snapshot reconciliation
    pays), map-only classification after. No second pass, no window.
    """
    a = df_a.select(
        F.col(key_col).alias("key"),
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        F.lit(1).alias("__in_a"),
    )
    b = df_b.select(
        F.col(key_col).alias("key"),
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(1).alias("__in_b"),
    )
    joined = a.join(b, "key", "full")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
    status = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("key").alias(key_col), status.alias("status"))


def dataset_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: "str | None" = "lang",
) -> DataFrame:
    """The dataset-card numbers in one relation — the summary a corpus
    release ships and a pipeline owner watches between runs (feed two
    snapshots to :func:`snapshot_diff`-style comparison or alert on
    deltas): (metric, value) rows for

    - ``n_docs``, ``total_tokens``, ``mean_tokens``
    - ``pct_empty`` — blank/NULL-text share
    - ``exact_dup_rate`` — 1 − distinct(text)/n (the cheapest dup
      signal; the sketch operators refine it)
    - ``distinct_langs``, ``top_lang_share`` (when ``lang_col`` given)

    Every value is exact rational arithmetic rounded to 6 digits —
    fully oracle-expressible. Scale shape: ONE corpus aggregate (the
    two COUNT DISTINCTs share its expand) plus a lang-cardinality
    groupBy; the two 1-row results cross-combine via a forced 1-row
    broadcast (the bounded-crossJoin pattern) and unpivot via stack —
    no corpus-sized join anywhere."""
    from hdk_spark.operators.text import token_count

    t = F.col(text_col)
    n = F.count(F.lit(1))
    base = df.agg(
        n.cast("double").alias("n_docs"),
        F.sum(token_count(t)).cast("double").alias("total_tokens"),
        F.round(
            F.sum(token_count(t)) / n.cast("double"), 6
        ).alias("mean_tokens"),
        F.round(
            F.sum(
                F.when(
                    t.isNull() | (F.length(F.trim(t)) == 0), 1
                ).otherwise(0)
            )
            / n.cast("double"),
            6,
        ).alias("pct_empty"),
        F.round(
            F.lit(1.0) - F.countDistinct(t) / n.cast("double"), 6
        ).alias("exact_dup_rate"),
    )
    metrics = ["n_docs", "total_tokens", "mean_tokens", "pct_empty",
               "exact_dup_rate"]
    if lang_col is not None:
        langs = (
            df.groupBy(lang_col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.count(F.lit(1)).cast("double").alias("distinct_langs"),
                F.max("__c").cast("double").alias("__top"),
            )
        )
        base = base.join(F.broadcast(langs))  # 1 row × 1 row
        base = base.withColumn(
            "top_lang_share",
            F.round(F.col("__top") / F.col("n_docs"), 6),
        ).drop("__top")
        metrics += ["distinct_langs", "top_lang_share"]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return base.selectExpr(
        f"stack({len(metrics)}, {stack}) AS (metric, value)"
    )


_JSON_TYPE_CLASSES = ("int", "number", "string", "bool", "array", "object")


def json_schema_gate(
    df: DataFrame,
    json_col: str,
    required: "dict[str, str]",
    id_col: str = "doc_id",
) -> DataFrame:
    """Schema gate for a JSON ingest column (the jsonl-feed cousin of
    :func:`expect`): every required field must be PRESENT with the
    declared JSON type class — ``int``, ``number`` (int or float),
    ``string``, ``bool``, ``array``, ``object``. Checks run on JSON-
    NATIVE types via Spark 4's variant surface (try_parse_json +
    schema_of_variant), deliberately WITHOUT cast coercion — a JSON
    string "7" does NOT satisfy ``int`` (try_variant_get would coerce
    it; an ingest gate must not), and an explicit JSON null satisfies
    nothing (it types as VOID).

    Returns (id, is_json, ok_<field>…, n_failed, valid); malformed
    JSON fails every field. Field names must be [A-Za-z0-9_]
    (they are embedded in '$.' paths and output column names).

    Scale shape: ONE map-only projection — parse once per row, one
    variant_get per required field; no explode, no shuffle, no
    Python.
    """
    if not required:
        raise ValueError("required must be non-empty")
    for f_, t_ in required.items():
        if t_ not in _JSON_TYPE_CLASSES:
            raise ValueError(
                f"unknown type class {t_!r} for field {f_!r}; "
                f"expected one of {_JSON_TYPE_CLASSES}"
            )
        if not f_ or not all(c.isalnum() or c == "_" for c in f_):
            raise ValueError(f"field name {f_!r} must be [A-Za-z0-9_]+")

    v = F.try_parse_json(F.col(json_col))

    def ok(field: str, cls: str):
        t = F.schema_of_variant(
            F.try_variant_get(v, f"$.{field}", "variant")
        )
        if cls == "int":
            c = t == "BIGINT"
        elif cls == "number":
            c = (t == "BIGINT") | (t == "DOUBLE") | t.startswith("DECIMAL")
        elif cls == "string":
            c = t == "STRING"
        elif cls == "bool":
            c = t == "BOOLEAN"
        elif cls == "array":
            c = t.startswith("ARRAY")
        else:
            c = t.startswith("OBJECT")
        return F.coalesce(c, F.lit(False))

    items = sorted(required.items())
    flags = [ok(f_, t_).alias(f"ok_{f_}") for f_, t_ in items]
    out = df.select(
        F.col(id_col), v.isNotNull().alias("is_json"), *flags
    )
    n_failed = sum(
        (~F.col(f"ok_{f_}")).cast("int") for f_, _ in items
    )
    return out.select(
        "*",
        n_failed.cast("long").alias("n_failed"),
        (F.col("is_json") & (n_failed == 0)).alias("valid"),
    )
