"""HDK scalar/aggregate function surface re-expressed over
pyspark.sql.functions (SURVEY.md §2.3, §2.5, §2.8)."""

from hdk_spark.functions.scalar import (
    extract,
    date_trunc,
    date_add,
    date_diff,
    width_bucket,
    sample_ratio,
    item,
    cardinality,
    unnest,
    div_int,
    null_safe_eq,
    round_norm,
    round6,
    MATH_FUNCS,
    scalar_function,
)
from hdk_spark.functions.aggregates import (
    quantile,
    approx_quantile,
    topk,
    bottomk,
    sample,
    single_value,
    agg_function,
)

__all__ = [
    "extract",
    "date_trunc",
    "date_add",
    "date_diff",
    "width_bucket",
    "sample_ratio",
    "item",
    "cardinality",
    "unnest",
    "div_int",
    "null_safe_eq",
    "round_norm",
    "round6",
    "MATH_FUNCS",
    "scalar_function",
    "quantile",
    "approx_quantile",
    "topk",
    "bottomk",
    "sample",
    "single_value",
    "agg_function",
]
