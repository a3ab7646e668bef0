"""Aggregate surface of the reference (SURVEY.md §2.5), incl. the four
custom aggregates Spark lacks natively.

Reference agg kinds: omniscidb/IR/OpTypeEnums.h:78-93 (AggType). The
plain ones (count/sum/avg/min/max/stddev_samp/corr/approx_*) map 1:1 to
pyspark.sql.functions; this module adds:

  QUANTILE(q, interpolation)  — reference Shared/quantile.h:288-337
  TOPK / BOTTOMK              — reference QueryEngine/TopKAggRuntime.h:14
  SAMPLE                      — OpTypeEnums.h:86 (arbitrary group value)
  SINGLE_VALUE                — OpTypeEnums.h:87 (errors if >1 distinct)

All are compositions of built-in JVM-side aggregates — no Python UDAFs —
so they shuffle/combine exactly like native aggs and scale with
partial+final aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantile(col: Column, q: float, interpolation: str = "linear") -> Column:
    """Exact QUANTILE with the reference's five interpolation modes
    (reference Shared/quantile.h:300-337):

        pos   = (n - 1) * q
        lower   → value[floor(pos)]
        higher  → value[ceil(pos)]
        nearest → value[round(pos)]     (round half away from zero)
        midpoint→ left + (right-left) * 0.5
        linear  → left + (right-left) * (pos - floor(pos))

    Implemented as sort_array(collect_list(...)) + element arithmetic.
    collect_list materializes the group — same whole-group cost profile
    as the reference's per-group value buffer; for huge groups prefer
    approx_quantile (t-digest ≈ HLL-era approximation the reference also
    offers).
    """
    interpolation = interpolation.lower()
    sorted_vals = F.sort_array(F.collect_list(col))
    n = F.size(sorted_vals)
    pos = (n - 1).cast("double") * F.lit(float(q))
    lo = F.floor(pos).cast("int")
    hi = F.ceil(pos).cast("int")
    left = F.get(sorted_vals, lo).cast("double")
    right = F.get(sorted_vals, hi).cast("double")
    if interpolation == "lower":
        out = left
    elif interpolation == "higher":
        out = right
    elif interpolation == "nearest":
        # std::round = half away from zero; pos >= 0 here so == half up
        out = F.get(sorted_vals, F.floor(pos + F.lit(0.5)).cast("int")).cast("double")
    elif interpolation == "midpoint":
        out = left + (right - left) * F.lit(0.5)
    elif interpolation == "linear":
        out = left + (right - left) * (pos - F.floor(pos))
    else:
        raise ValueError(f"unsupported interpolation: {interpolation}")
    return F.when(n > 0, out)


def approx_quantile(col: Column, q: float, accuracy: int = 10000) -> Column:
    """APPROX_QUANTILE (reference OpTypeEnums.h:85; t-digest
    Shared/approx_quantile.h:17). Spark's percentile_approx uses
    QuantileSummaries — same contract, different sketch."""
    return F.percentile_approx(col, F.lit(float(q)), F.lit(accuracy))


def topk(col: Column, k: int) -> Column:
    """TOPK(k): array of the k largest values in the group (reference
    OpTypeEnums.h:88; heap runtime QueryEngine/TopKAggRuntime.h:14-75)."""
    return F.slice(F.sort_array(F.collect_list(col), asc=False), 1, k)


def bottomk(col: Column, k: int) -> Column:
    """BOTTOMK(k): array of the k smallest values (reference same)."""
    return F.slice(F.sort_array(F.collect_list(col)), 1, k)


def sample(col: Column) -> Column:
    """SAMPLE — an arbitrary value from the group (reference
    OpTypeEnums.h:86). any_value with ignoreNulls, like the reference
    which keeps the first non-null it sees."""
    return F.any_value(col, True)


def single_value(col: Column) -> Column:
    """SINGLE_VALUE — the group's value; runtime error if the group has
    more than one distinct value (reference OpTypeEnums.h:87; the
    reference raises "more than one row returned by a subquery").

    when() evaluates branches lazily, so raise_error only fires on
    violating groups.
    """
    return F.when(
        F.count_distinct(col) <= 1, F.any_value(col, True)
    ).otherwise(
        F.raise_error(F.lit("SINGLE_VALUE: more than one distinct value in group"))
    )


_AGG_DISPATCH = {
    "count": lambda c=None: F.count(c) if c is not None else F.count(F.lit(1)),
    "count distinct": F.count_distinct,
    "sum": F.sum,
    "$sum0": lambda c: F.coalesce(F.sum(c), F.lit(0)),
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "approx count dist": F.approx_count_distinct,
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev_samp,
    "stddev_samp": F.stddev_samp,
    "corr": F.corr,
    "sample": sample,
    "single value": single_value,
    "single_value": single_value,
}


def agg_function(name: str, col: Column | None = None, *args) -> Column:
    """Aggregate dispatch by name, the engine-side half of the string agg
    spec surface (reference QueryBuilder.h:434 parseAggString;
    pyhdk hdk.py:1606 accepts "count", "sum(x)", "approx quantile(x, 0.5)")."""
    key = name.strip().lower()
    if key in _AGG_DISPATCH:
        fn = _AGG_DISPATCH[key]
        return fn(col) if col is not None or key == "count" else fn()
    if key in ("approx quantile", "approx_quantile"):
        return approx_quantile(col, *args)
    if key == "quantile":
        return quantile(col, *args)
    if key in ("topk", "top_k"):
        return topk(col, *args)
    if key in ("bottomk", "bottom_k"):
        return bottomk(col, *args)
    raise ValueError(f"unsupported aggregate: {name}")
