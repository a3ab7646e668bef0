"""Temporal join operators: as-of join and range join.

The reference has neither (SURVEY.md §2.4: `RangeOper` exists only for
bounding expressions — "No as-of / interval / range join" executor
path), but they are core time-series/OLAP operations, so they ship as
first-class composed operators, per the brief's custom-operator
guidance.

Scale design:

- ``asof_join`` uses the union+window formulation: tag both inputs,
  union, one window per ``by``-key ordered by time carries the latest
  right-side values forward, filter back to left rows. ONE shuffle on
  the by-key — never a per-key loop, never merge_asof on the driver.
  (pd.merge_asof per group via applyInPandas is the alternative; the
  union form keeps everything JVM-side.)
- ``range_join`` buckets the range key at a chosen granularity:
  right-side intervals explode to the buckets they overlap, the join
  becomes an equi-join on bucket + exact boundary filter. Candidate
  count scales with interval/granularity, not |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdk_spark.functions.scalar import round6


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (ties include the equal timestamp),
    matching on the ``by`` keys — pandas ``merge_asof`` / DuckDB
    ``ASOF JOIN`` semantics, expressed as union + running
    last_value so it is one shuffle at any scale.

    ``right`` must be unique per (by, on) — pre-aggregate if not.
    ``tolerance``: optional max age (e.g. ``F.expr("INTERVAL 1 HOUR")``)
    — older matches become NULL like merge_asof's tolerance.
    """
    by = [by] if isinstance(by, str) else (by or [])
    right_cols = right_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]

    l_tagged = left.withColumn("__is_left", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tagged = l_tagged.withColumn("__r_on", F.lit(None).cast(right.schema[on].dataType))

    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(on).alias("__r_on"),
    )
    for c in left.columns:
        if c not in set(by) | {on}:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tagged = r_tagged.select(l_tagged.columns)

    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal timestamps so an exact
    # match is visible to the left row (ASOF's <= contract)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
               for c in right_cols]
    carried.append(F.last("__r_on", ignorenulls=True).over(w).alias("__c_on"))
    out = u.select("*", *carried).filter(F.col("__is_left") == 1)

    keep_match = F.col("__c_on").isNotNull()
    if tolerance is not None:
        keep_match = keep_match & (F.col(on) <= F.col("__c_on") + tolerance)
    result_cols = [F.col(c) for c in left.columns]
    result_cols.append(
        F.when(keep_match, F.col("__c_on")).alias(f"{on}{suffix}")
    )
    for c in right_cols:
        result_cols.append(F.when(keep_match, F.col(f"__c_{c}")).alias(f"{c}{suffix}"))
    return out.select(*result_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    range_start: str,
    range_end: str,
    granularity_seconds: int,
    how: str = "inner",
    end_inclusive: bool = False,
) -> DataFrame:
    """Join left rows to right intervals containing them:
    ``right.range_start <= left.left_key < right.range_end`` (or <= if
    ``end_inclusive``).

    Implementation: intervals explode to every ``granularity_seconds``
    bucket they overlap; the join is then an equi-join on bucket id
    plus the exact boundary predicate. Pick granularity near the
    median interval length: candidates ≈ |L| + Σ interval/granularity.
    """
    g = F.lit(granularity_seconds)
    lb = F.floor(F.unix_seconds(F.col(left_key).cast("timestamp")) / g)
    l_b = left.withColumn("__bucket", lb.cast("long"))

    s = F.floor(F.unix_seconds(F.col(range_start).cast("timestamp")) / g).cast("long")
    e = F.floor(F.unix_seconds(F.col(range_end).cast("timestamp")) / g).cast("long")
    r_b = right.withColumn("__bucket", F.explode(F.sequence(s, e)))

    end_pred = (
        F.col(left_key) <= F.col(range_end)
        if end_inclusive
        else F.col(left_key) < F.col(range_end)
    )
    joined = l_b.join(
        r_b,
        (l_b["__bucket"] == r_b["__bucket"])
        & (F.col(left_key) >= F.col(range_start))
        & end_pred,
        how,
    )
    return joined.drop("__bucket")


_INTERVAL_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(step: str) -> int:
    """'6 hours' → 21600. Fixed-length units only: month/year grids are
    not equi-spaced, so they can't define a uniform resample step."""
    n, unit = step.strip().split()
    try:
        return int(n) * _INTERVAL_UNIT_SECONDS[unit.lower()]
    except KeyError:
        raise ValueError(f"unsupported resample step unit {unit!r}") from None


def resample_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    method: str = "ffill",
) -> DataFrame:
    """Regularize an irregular time series: per key, generate the full
    time grid at ``step`` granularity between the key's first and last
    observation, and fill grid points with no observation from their
    neighbors (``ffill`` carries the last value forward; ``linear``
    interpolates between the surrounding observations). The standard
    time-series resample/gap-fill the reference lacks entirely.

    Emitted rows: (key, grid_ts, value, observed) where observed marks
    real data points (grid points that had at least one observation
    use the LAST observation in that step, by (ts, value) order —
    deterministic under ties).

    Scale shape: the grid generates per key with sequence+explode
    (bounded by span/step — no cross join against a global calendar);
    observations aggregate to the grid granularity in the same keyed
    shuffle; the fill is two window passes over the SAME (key, ts)
    partitioning, so Spark plans exactly one exchange. Span-skewed keys
    cost rows proportional to their own span only.
    """
    if method not in ("ffill", "linear"):
        raise ValueError(f"unknown fill method {method!r}")
    step_expr = f"INTERVAL {step}"
    step_sec = _interval_seconds(step)
    # floor, not cast-truncation: cast('long') truncates toward zero,
    # which would bucket pre-1970 timestamps one step late and diverge
    # from both the DuckDB oracle and range_join's floor convention
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(step_sec)).cast("long")
        * F.lit(step_sec)
    )
    # last observation per (key, bucket): max by (ts, value) — ties on
    # ts resolve by value so the result is input-order-independent
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("grid_ts"),
            F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")).alias("tv"),
        )
        .groupBy("key", "grid_ts")
        .agg(F.max("tv").alias("tv"))
        .select("key", "grid_ts", F.col("tv.v").alias("obs_value"))
    )
    span = obs.groupBy("key").agg(
        F.min("grid_ts").alias("t0"), F.max("grid_ts").alias("t1")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr(step_expr))
        ).alias("grid_ts"),
    )
    g = grid.join(obs, ["key", "grid_ts"], "left")
    w = Window.partitionBy("key").orderBy("grid_ts")
    prev_w = w.rowsBetween(Window.unboundedPreceding, 0)
    next_w = w.rowsBetween(0, Window.unboundedFollowing)
    last_val = F.last("obs_value", ignorenulls=True).over(prev_w)
    if method == "ffill":
        filled = last_val
    else:
        next_val = F.first("obs_value", ignorenulls=True).over(next_w)
        last_ts = F.last(
            F.when(F.col("obs_value").isNotNull(), F.col("grid_ts")), ignorenulls=True
        ).over(prev_w)
        next_ts = F.first(
            F.when(F.col("obs_value").isNotNull(), F.col("grid_ts")), ignorenulls=True
        ).over(next_w)
        frac = (
            (F.unix_timestamp("grid_ts") - F.unix_timestamp(last_ts)).cast("double")
            / F.when(
                F.unix_timestamp(next_ts) != F.unix_timestamp(last_ts),
                (F.unix_timestamp(next_ts) - F.unix_timestamp(last_ts)).cast("double"),
            )
        )
        filled = F.when(F.col("obs_value").isNotNull(), F.col("obs_value")).otherwise(
            last_val + (next_val - last_val) * F.coalesce(frac, F.lit(0.0))
        )
    return g.select(
        "key",
        "grid_ts",
        round6(filled).alias("value"),
        F.col("obs_value").isNotNull().alias("observed"),
    )


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: for each step prefix of ``steps``,
    count the keys (users) that completed the steps IN ORDER — step k
    counts a user only if an occurrence of step k exists strictly after
    the earliest valid occurrence chain of steps 1..k-1.

    Returns (step_idx, step, n_keys) with step_idx 1-based, monotone
    non-increasing n_keys.

    Scale shape: one filter to the funnel's event set (persisted — each
    step re-reads it), then per step ONE conditional-min aggregate
    ``t_k = MIN(t : ev = step_k AND t > t_{k-1})`` joined against the
    (keys-sized, shrinking) chain relation from the previous step.
    Aggregation state per key is a single timestamp — a skewed key with
    millions of funnel events costs mergeable MIN partials, never a
    collected occurrence list (the collect_list formulation this
    replaces held a key's full per-step event history in one task).
    len(steps) keyed exchanges of the filtered event set, each with
    map-side partial MINs.
    """
    base = (
        df.filter(F.col(event_col).isin(steps))
        .select(
            F.col(key_col).alias("key"),
            F.col(event_col).alias("ev"),
            F.col(ts_col).alias("t"),
        )
        .persist()
    )
    chain = None  # (key, __prev): earliest valid completion of steps 1..k
    counts_rows = []
    for i, s in enumerate(steps):
        si = base.filter(F.col("ev") == s)
        if chain is None:
            cur = si.groupBy("key").agg(F.min("t").alias("__prev"))
        else:
            cur = (
                si.join(chain, "key")
                .filter(F.col("t") > F.col("__prev"))
                .groupBy("key")
                .agg(F.min("t").alias("__prev"))
            )
        # eager checkpoint: materializes the (keys-sized, shrinking)
        # chain NOW, so the loop reads base exactly k times, the final
        # counts reference only the materialized chains, and base can
        # be unpersisted before returning (no leaked corpus-sized
        # cache entry per call)
        chain = cur.localCheckpoint(eager=True)
        counts_rows.append(
            chain.agg(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
            )
        )
    base.unpersist()
    out = counts_rows[0]
    for extra in counts_rows[1:]:
        out = out.unionByName(extra)
    return out


def detect_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    min_gap: str = "1 hour",
) -> DataFrame:
    """Missing-data intervals per key: consecutive observations (in
    (ts, order_col) order — the tie-break makes the result
    deterministic under duplicate timestamps) further apart than
    ``min_gap``. The monitoring primitive of a time-series pipeline
    (sensor dropouts, ingestion holes).

    Returns (key, gap_start, gap_end, gap_sec) — gap_sec is the whole
    seconds of the µs-exact difference (per-endpoint unix_timestamp
    truncation would drift ±1 s on sub-second timestamps vs any oracle
    computing the true difference). ONE keyed exchange (the lag
    window); everything else is a map-side filter.
    """
    gap_sec = _interval_seconds(min_gap)
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    prev = F.lag(F.col(ts_col)).over(w)
    micros = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    out = (
        df.select(
            F.col(key_col).alias("key"),
            prev.alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            F.floor(micros / F.lit(1_000_000)).cast("long").alias("gap_sec"),
        )
        .filter(F.col("gap_sec") >= gap_sec)
    )
    return out


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    window_rows: int = 20,
    min_obs: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly score: each observation's z-score
    against the PRECEDING ``window_rows`` observations of its key
    (the frame excludes the current row, so an outlier can't mask
    itself). Rows with fewer than ``min_obs`` trailing observations
    emit NULL. The standard streaming-friendly anomaly flag for
    metrics/telemetry series.

    Determinism: the frame's mean/variance come from exact DECIMAL
    sums over a (ts, order_col)-ordered ROWS frame — order and
    membership are total, so the result is identical under any
    partitioning (the stats.zscore rule applied to window frames).
    ONE keyed exchange: both frame aggregates share the same window
    spec.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(-window_rows, -1)
    )
    v = F.col(value_col).cast("decimal(18,2)")
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum((v * v).cast("decimal(38,4)")).over(w)
    nd = n.cast("double")
    mean = s1.cast("double") / nd
    var = (s2.cast("double") - s1.cast("double") * s1.cast("double") / nd) / (
        nd - F.lit(1.0)
    )
    z = (F.col(value_col).cast("double") - mean) / F.sqrt(var)
    z_out = F.when(n >= min_obs, round6(z))
    return df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("obs_id"),
        F.col(value_col).cast("double").alias("value"),
        z_out.alias("zscore"),
        # never NULL: insufficient-history rows AND null-valued rows
        # (whose z is NULL even with enough history) are simply not
        # anomalies (NULL booleans also convert to pandas differently
        # per engine)
        F.when(
            n >= min_obs,
            F.coalesce(F.abs(z) > z_threshold, F.lit(False)),
        )
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


def multi_grain_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: per-key metric
    aggregates at SEVERAL time grains in ONE pass (the
    hour/day/month materialization a time-series store keeps per
    hypertable; here expressed as GROUPING SETS over the date_trunc
    ladder so Spark shares one scan + one partial-agg exchange across
    every grain instead of re-reading the fact table per grain).

    Returns (grain, bucket_ts, key, n_events, sum_value) with one row
    per (grain, bucket, key). Sums go through DECIMAL so the result is
    partition-order independent (repo determinism rule).

    Scale shape: Expand multiplies rows by len(grains) BEFORE the
    exchange, but partial aggregation collapses each grain to its
    bucket cardinality map-side, so the shuffle carries ~|buckets|
    rows per grain, not |facts|·|grains|. One exchange total; no join.
    Buckets inherit the event-time distribution — a hot (bucket, key)
    is already collapsed map-side.
    """
    truncs = [
        F.date_trunc(g, F.col(ts_col)).alias(f"__g_{g}") for g in grains
    ]
    base = df.select(
        *truncs, F.col(key_col).alias("key"),
        F.col(value_col).cast("decimal(18,2)").alias("__v"),
    )
    sets = [[f"__g_{g}", "key"] for g in grains]
    grouped = base.groupingSets(sets, *[F.col(f"__g_{g}") for g in grains],
                                F.col("key"))
    # GROUPING() indicators (not IS NOT NULL) so a data-NULL timestamp
    # can never mislabel its grain
    agg = grouped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__v").alias("__sum"),
        *[F.grouping(f"__g_{g}").alias(f"__in_{g}") for g in grains],
    )
    grain_expr = None
    for g in grains:
        cond = F.col(f"__in_{g}") == 0
        grain_expr = (
            F.when(cond, F.lit(g)) if grain_expr is None
            else grain_expr.when(cond, F.lit(g))
        )
    bucket = F.coalesce(*[F.col(f"__g_{g}") for g in grains])
    return (
        agg
        .select(
            grain_expr.alias("grain"),
            bucket.alias("bucket_ts"),
            F.col("key").alias(key_col),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("__sum").cast("double").alias("sum_value"),
        )
    )


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Incremental continuous-aggregate maintenance: combine
    :func:`multi_grain_rollup` outputs from disjoint fact slices
    (yesterday's materialization + today's delta) into the rollup of
    the union — WITHOUT touching the underlying facts again. Counts
    and decimal-exact sums are mergeable, so
    ``merge_rollups(rollup(A), rollup(B)) == rollup(A ∪ B)`` exactly
    (the property test pins it).

    Scale shape: a union of bucket-cardinality relations + one
    partial-agg groupBy on (grain, bucket_ts, key) — delta
    maintenance costs O(|buckets|), never O(|facts|)."""
    if not rollups:
        raise ValueError("merge_rollups needs at least one input")
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)
    key_cols = [c for c in out.columns
                if c not in ("n_events", "sum_value")]
    return (
        out.groupBy(*key_cols)
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(28,2)"))
            .cast("double").alias("sum_value"),
        )
    )


def _epoch_period(ts_col: str, grain: str) -> "F.Column":
    """Epoch-anchored integer period of a timestamp column: day =
    days since 1970-01-01, week = day div 7, month = calendar months
    since 1970-01. Integer periods are bit-identical across engines —
    date_trunc('week') anchors (Monday/Sunday, locale) are not a
    portable contract. div truncates toward zero, so pre-1970
    day/week periods would be off by one — the operators below
    document the post-epoch assumption rather than paying a pmod per
    row for data that doesn't exist in practice."""
    if grain == "day":
        return F.expr(f"datediff(cast({ts_col} as date), date'1970-01-01')")
    if grain == "week":
        return F.expr(
            f"datediff(cast({ts_col} as date), date'1970-01-01') div 7"
        )
    if grain == "month":
        return (
            (F.year(ts_col) - F.lit(1970)) * 12 + F.month(ts_col) - F.lit(1)
        ).cast("long")
    raise ValueError(f"grain must be day|week|month, got {grain!r}")


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix — the classic activation/retention
    report (beyond-reference; the reference has no date-cohort
    surface): users are cohorted by their FIRST active period and
    counted in every later period they return, as
    (cohort_period, period_offset, n_users) with offset 0 = the
    cohort's own size.

    Periods are epoch-anchored integers (:func:`_epoch_period`) so
    the result is engine-portable and deterministic; post-1970
    timestamps assumed.

    Scale shape: activity = ONE partial-agg distinct on
    (user, period) (duplicate events collapse map-side); cohorts =
    one groupBy on user; one AQE-decided user-keyed equi-join
    (activity and cohorts shuffle on the SAME key, so the join
    co-locates with no extra exchange); the final groupBy is
    matrix-sized. n_users is a plain COUNT(*) — the distinct
    activity relation already guarantees one row per user per
    (cohort, offset), so no COUNT DISTINCT expand is paid.
    """
    period = _epoch_period(ts_col, grain)
    activity = df.select(
        F.col(user_col).alias("__u"), period.alias("__p")
    ).distinct()
    cohorts = activity.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        activity.join(cohorts, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__p") - F.col("__cohort")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: "list[str]",
) -> DataFrame:
    """Slowly-changing-dimension type-2 compression of a change log
    (Kimball's SCD2): collapse per-key event streams into versioned
    rows — one row per RUN of identical attribute values — with
    [valid_from, valid_to) validity and an is_current flag (valid_to
    NULL on the open version). The dimension-history builder every
    warehouse needs before a point-in-time join (pair with
    ``asof_join`` for as-of lookups).

    A version boundary is any event whose attribute tuple differs
    (null-safely) from the key's previous event; consecutive
    duplicates compress away. Events sharing (key, ts) order
    deterministically by the attribute tuple — last one in that order
    wins the instant, earlier same-instant versions close with
    valid_to = valid_from (zero-width, preserved for auditability).

    Scale shape: ONE shuffle on the key — both windows (the lag
    change-detection and the lead valid_to) share the same
    partitioning, so Spark plans a single Exchange (plan-pinned in
    tests); no self-joins, no driver state.
    """
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    # alias BEFORE either window so both windows partition on the same
    # attribute identity — aliasing between them makes Catalyst plan a
    # second Exchange (seen in development; the plan pin guards this)
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("valid_from"),
        *[F.col(c) for c in attr_cols],
    )
    w = Window.partitionBy("key").orderBy(
        "valid_from", *[F.col(c) for c in attr_cols]
    )
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    first = F.row_number().over(w) == 1
    versions = (
        base.withColumn("__chg", first | changed)
        .filter(F.col("__chg"))
        .select(
            "key", "valid_from", *attr_cols,
            F.lead(F.col("valid_from")).over(w).alias("valid_to"),
        )
    )
    return versions.select(
        "key", "valid_from", "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        *attr_cols,
    )
