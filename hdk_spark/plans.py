"""Raw relational-algebra plan entry point: Calcite-style RA JSON →
PySpark DataFrame.

The reference exposes three query entry points; the third feeds a
pre-built Calcite JSON plan straight to the executor
(reference python/tests/test_pyhdk_calcite_json.py,
omniscidb/Tests/NoCatalogRelAlgTest.cpp). This module is the Spark
analog: interpret the same JSON node/expression vocabulary into a
DataFrame plan, which Catalyst then optimizes like any other query —
the interpreter adds no execution machinery of its own.

Supported nodes (the vocabulary the reference tests exercise):
  LogicalTableScan, LogicalFilter, LogicalProject, LogicalAggregate,
  LogicalJoin, LogicalSort, LogicalUnion, LogicalValues.
Expressions: positional ``{"input": N}`` refs, typed literals
(DECIMAL-encoded numerics like Calcite emits), operator applications
``{"op": ..., "operands": [...]}``, CASE, CAST, IS [NOT] NULL,
LIKE, arithmetic/comparison/boolean ops.

Nodes chain implicitly (each consumes the previous rel) unless an
``"inputs": [id, ...]`` list names other rels — identical to how the
reference walks ``rels``.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPE_MAP = {
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "CHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def _spark_type(t: Any) -> str:
    """Calcite type descriptor (str or {"type": ...}) → Spark DDL type."""
    if isinstance(t, dict):
        name = t.get("type", "")
        if name == "DECIMAL":
            p = t.get("precision", 18)
            s = t.get("scale", 0)
            return f"decimal({p},{s})"
        t = name
    return _TYPE_MAP.get(t, str(t).lower())


def _literal(node: dict) -> Column:
    """Calcite literal: numerics arrive DECIMAL-encoded with ``scale``
    and a ``target_type`` naming the semantic type (see the reference's
    JSON fixtures)."""
    val = node["literal"]
    if val is None:
        return F.lit(None).cast(_spark_type(node.get("target_type", "VARCHAR")))
    target = node.get("target_type", node.get("type", ""))
    scale = node.get("scale", 0)
    if node.get("type") == "DECIMAL" and isinstance(val, (int, float)):
        val = val / (10**scale) if scale else val
    col = F.lit(val)
    if target:
        col = col.cast(_spark_type(target))
    return col


_BINOPS = {
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "MOD": lambda a, b: a % b,
}


def _expr(node: Any, cols: list[Column]) -> Column:
    """Interpret a Calcite expression against the input's columns."""
    if isinstance(node, dict):
        if "input" in node:
            return cols[node["input"]]
        if "literal" in node:
            return _literal(node)
        if "op" in node:
            op = node["op"]
            operands = [_expr(o, cols) for o in node.get("operands", [])]
            if op == "AND":
                out = operands[0]
                for o in operands[1:]:
                    out = out & o
                return out
            if op == "OR":
                out = operands[0]
                for o in operands[1:]:
                    out = out | o
                return out
            if op == "NOT":
                return ~operands[0]
            if op == "IS NULL":
                return operands[0].isNull()
            if op == "IS NOT NULL":
                return operands[0].isNotNull()
            if op == "CASE":
                # Calcite CASE: WHEN,THEN,...,ELSE (odd count)
                out = None
                pairs = operands[:-1]
                for i in range(0, len(pairs), 2):
                    out = (
                        F.when(pairs[i], pairs[i + 1])
                        if out is None
                        else out.when(pairs[i], pairs[i + 1])
                    )
                return out.otherwise(operands[-1])
            if op == "CAST":
                return operands[0].cast(_spark_type(node.get("type", {})))
            if op == "LIKE":
                # Column.like takes a string pattern; Calcite emits it
                # as a literal operand
                pat = node["operands"][1]
                return operands[0].like(str(pat.get("literal", "")))
            if op in ("-", "+") and len(operands) == 1:
                return -operands[0] if op == "-" else operands[0]
            if op in _BINOPS:
                return _BINOPS[op](operands[0], operands[1])
            raise ValueError(f"unsupported RA expression op {op!r}")
    raise ValueError(f"unsupported RA expression node {node!r}")


_AGG_FNS = {
    "COUNT": lambda c: F.count(c if c is not None else F.lit(1)),
    "SUM": lambda c: F.sum(c),
    "$SUM0": lambda c: F.coalesce(F.sum(c), F.lit(0)),
    "AVG": lambda c: F.avg(c),
    "MIN": lambda c: F.min(c),
    "MAX": lambda c: F.max(c),
    "STDDEV_SAMP": lambda c: F.stddev_samp(c),
    "VAR_SAMP": lambda c: F.var_samp(c),
    "APPROX_COUNT_DISTINCT": lambda c: F.approx_count_distinct(c),
}


def execute_plan(
    spark: SparkSession,
    plan: dict | str,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Execute a Calcite-style RA JSON plan; returns the DataFrame of
    the last rel. ``tables`` overrides catalog lookup (the reference's
    no-catalog mode, NoCatalogRelAlgTest.cpp)."""
    if isinstance(plan, str):
        plan = json.loads(plan)
    rels: list[dict] = plan["rels"]
    by_id: dict[str, DataFrame] = {}
    prev: DataFrame | None = None

    def resolve_inputs(rel: dict) -> list[DataFrame]:
        ids = rel.get("inputs")
        if ids:
            return [by_id[str(i)] for i in ids]
        return [prev] if prev is not None else []

    for rel in rels:
        op = rel["relOp"]
        inputs = resolve_inputs(rel)
        if op == "LogicalTableScan":
            tname = rel["table"]
            if isinstance(tname, list):
                tname = tname[-1]
            df = tables[tname] if tables and tname in tables else spark.table(tname)
            names = rel.get("fieldNames")
            if names:
                sel = []
                for nm in names:
                    if nm in df.columns:
                        sel.append(F.col(nm))
                    elif nm == "rowid":
                        # the reference storage layer materializes a
                        # rowid pseudo-column on every scan
                        sel.append(F.monotonically_increasing_id().alias("rowid"))
                    else:
                        raise ValueError(f"scan of unknown column {nm!r}")
                df = df.select(*sel)
        elif op == "LogicalFilter":
            (src,) = inputs
            cols = [src[c] for c in src.columns]
            df = src.filter(_expr(rel["condition"], cols))
        elif op == "LogicalProject":
            (src,) = inputs
            cols = [src[c] for c in src.columns]
            names = rel["fields"]
            df = src.select(
                *[_expr(e, cols).alias(nm) for e, nm in zip(rel["exprs"], names)]
            )
        elif op == "LogicalAggregate":
            (src,) = inputs
            cols = [src[c] for c in src.columns]
            names = rel["fields"]
            group = [cols[i] for i in rel.get("group", [])]
            aggs = []
            for spec in rel.get("aggs", []):
                fn = spec["agg"]
                operands = spec.get("operands", [])
                col = cols[operands[0]] if operands else None
                if spec.get("distinct"):
                    if fn != "COUNT":
                        raise ValueError(f"DISTINCT {fn} not supported")
                    aggs.append(F.count_distinct(col))
                else:
                    if fn not in _AGG_FNS:
                        raise ValueError(f"unsupported aggregate {fn!r}")
                    aggs.append(_AGG_FNS[fn](col))
            n_group = len(group)
            grouped = (
                src.groupBy(*[g.alias(names[i]) for i, g in enumerate(group)])
                if group
                else src.groupBy()
            )
            df = grouped.agg(
                *[a.alias(names[n_group + i]) for i, a in enumerate(aggs)]
            )
            df = df.select(*[F.col(n) for n in names])
        elif op == "LogicalJoin":
            left, right = inputs
            how = rel.get("joinType", "inner")
            how = {"semi": "left_semi", "anti": "left_anti"}.get(how, how)
            # positional refs span left fields then right fields
            cols = [left[c] for c in left.columns] + [right[c] for c in right.columns]
            cond = _expr(rel["condition"], cols)
            df = left.join(right, cond, how)
        elif op == "LogicalSort":
            (src,) = inputs
            cols = [src[c] for c in src.columns]
            order = []
            for c in rel.get("collation", []):
                col = cols[c["field"]]
                desc = str(c.get("direction", "ASCENDING")).upper().startswith("DESC")
                nulls = str(c.get("nulls", "LAST")).upper()
                if desc:
                    col = col.desc_nulls_first() if "FIRST" in nulls else col.desc_nulls_last()
                else:
                    col = col.asc_nulls_first() if "FIRST" in nulls else col.asc_nulls_last()
                order.append(col)
            df = src.orderBy(*order) if order else src
            offset = rel.get("offset")
            if offset:
                df = df.offset(int(offset.get("literal", offset) if isinstance(offset, dict) else offset))
            fetch = rel.get("fetch")
            if fetch is not None:
                df = df.limit(int(fetch.get("literal", fetch) if isinstance(fetch, dict) else fetch))
        elif op == "LogicalUnion":
            df = inputs[0]
            for other in inputs[1:]:
                df = df.union(other)
            if not rel.get("all", True):
                df = df.distinct()
        elif op == "LogicalValues":
            names = rel.get("fields") or [
                f[0] if isinstance(f, list) else f for f in rel.get("type", [])
            ]
            rows = [
                tuple(_lit_value(v) for v in tup) for tup in rel.get("tuples", [])
            ]
            if not rows:
                raise ValueError("empty LogicalValues requires typed fields")
            df = spark.createDataFrame(rows, schema=list(names))
        else:
            raise ValueError(f"unsupported rel node {op!r}")
        by_id[str(rel.get("id", len(by_id)))] = df
        prev = df
    assert prev is not None, "empty plan"
    return prev


def _lit_value(v: Any):
    if isinstance(v, dict):
        scale = v.get("scale", 0)
        val = v.get("literal")
        if v.get("type") == "DECIMAL" and isinstance(val, (int, float)) and scale:
            return val / (10**scale)
        return val
    return v
