"""pyhdk QueryBuilder facade over Spark DataFrames (SURVEY.md §2.11).

Re-implements the user-facing builder API of the reference —
``QueryNodeAPI`` (reference python/pyhdk/hdk.py:1539-2016) and
``QueryExprAPI`` (hdk.py:31-1538) — as a thin layer where every node op
is the corresponding DataFrame transformation and every expression op a
Catalyst ``Column``.  The reference builds ``hdk::ir::Node`` DAGs
(omniscidb/QueryBuilder/QueryBuilder.h:581) and runs them through its
JIT pipeline; here the DAG *is* the Catalyst logical plan, and
``.run()`` is a no-op materialization boundary (Spark stays lazy).

Naming conventions match pyhdk: ``"sum(x)"`` aggregates auto-name to
``x_sum`` (hdk.py:1606 docstring examples), bare ``"count"`` to
``count``, ranking windows to their function names.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdk_spark.functions import aggregates as agg_fns
from hdk_spark.functions import scalar as scalar_fns
from hdk_spark.types import to_spark_type

_JOIN_HOW = {
    # reference JoinType {INNER, LEFT, SEMI, ANTI} (Shared/sqldefs.h:33;
    # builder strings QueryBuilder.h:533-538)
    "inner": "inner",
    "left": "left",
    "semi": "left_semi",
    "anti": "left_anti",
}


class QueryExpr:
    """Expression wrapper (reference QueryExprAPI, hdk.py:31).

    Holds a Catalyst Column plus metadata: a display name (for pyhdk
    auto-naming) and, for aggregate/window function results, the pieces
    needed to turn ``expr.sum()`` into a window function on ``.over()``
    (reference hdk.py:1456 — over() "transforms min, max, sum, avg, and
    count aggregates to corresponding window functions")."""

    def __init__(
        self,
        col: Column,
        name: str | None = None,
        win_fn: Column | None = None,
        partition_by: list[Column] | None = None,
        order_by: list[Column] | None = None,
        needs_order: bool = False,
    ):
        self._col = col
        self._name = name
        self._win_fn = win_fn  # the fn Column to wrap in .over(window)
        self._partition_by = partition_by
        self._order_by = order_by
        self._needs_order = needs_order

    # -- materialization -------------------------------------------------
    def column(self) -> Column:
        """Resolve to a Catalyst Column (window specs applied here)."""
        if self._win_fn is not None and (
            self._partition_by is not None or self._order_by is not None
        ):
            w = Window.partitionBy(*(self._partition_by or []))
            if self._order_by:
                w = w.orderBy(*self._order_by)
            elif self._needs_order:
                raise ValueError("ranking window function requires order_by()")
            return self._win_fn.over(w)
        return self._col

    @property
    def name(self) -> str:
        return self._name or "expr"

    def rename(self, name: str) -> "QueryExpr":
        """reference hdk.py:32."""
        return QueryExpr(
            self._col, name, self._win_fn, self._partition_by, self._order_by,
            self._needs_order,
        )

    alias = rename

    def _wrap(self, col: Column, name: str | None = None) -> "QueryExpr":
        return QueryExpr(col, name if name is not None else self._name)

    @staticmethod
    def _c(value: Any) -> Column:
        if isinstance(value, QueryExpr):
            return value.column()
        if isinstance(value, Column):
            return value
        return F.lit(value)

    # -- aggregates (reference hdk.py:74-374) ----------------------------
    def _agg(self, fn_col: Column, name: str) -> "QueryExpr":
        base = f"{self._name}_{name}" if self._name else name
        return QueryExpr(fn_col, base, win_fn=fn_col)

    def avg(self):
        return self._agg(F.avg(self.column()), "avg")

    def min(self):
        return self._agg(F.min(self.column()), "min")

    def max(self):
        return self._agg(F.max(self.column()), "max")

    def sum(self):
        return self._agg(F.sum(self.column()), "sum")

    def count(self, is_distinct: bool = False, approx: bool = False):
        c = self.column()
        if approx:
            return self._agg(F.approx_count_distinct(c), "approx_count_dist")
        if is_distinct:
            return self._agg(F.count_distinct(c), "count_dist")
        return self._agg(F.count(c), "count")

    def approx_quantile(self, prob: float):
        return self._agg(agg_fns.approx_quantile(self.column(), prob), "approx_quantile")

    def quantile(self, prob: float, interpolation: str = "linear"):
        return self._agg(agg_fns.quantile(self.column(), prob, interpolation), "quantile")

    def sample(self):
        return self._agg(agg_fns.sample(self.column()), "sample")

    def single_value(self):
        return self._agg(agg_fns.single_value(self.column()), "single_value")

    def top_k(self, count: int):
        return self._agg(agg_fns.topk(self.column(), count), "top_k")

    def bottom_k(self, count: int):
        return self._agg(agg_fns.bottomk(self.column(), count), "bottom_k")

    def stddev(self):
        return self._agg(F.stddev_samp(self.column()), "stddev")

    def corr(self, arg: "QueryExpr"):
        return self._agg(F.corr(self.column(), self._c(arg)), "corr")

    # -- window functions (reference hdk.py:399-508,1456-1538) -----------
    def _win(self, fn_col: Column, name: str, needs_order: bool = True) -> "QueryExpr":
        return QueryExpr(fn_col, name, win_fn=fn_col, needs_order=needs_order)

    def lag(self, n: int = 1):
        return self._win(F.lag(self.column(), n), f"{self._name or 'expr'}_lag")

    def lead(self, n: int = 1):
        return self._win(F.lead(self.column(), n), f"{self._name or 'expr'}_lead")

    def first_value(self):
        return self._win(F.first(self.column()), f"{self._name or 'expr'}_first_value")

    def last_value(self):
        return self._win(F.last(self.column()), f"{self._name or 'expr'}_last_value")

    def over(self, *args) -> "QueryExpr":
        """Add window partition keys (reference hdk.py:1456)."""
        if self._win_fn is None:
            raise ValueError("over() requires an aggregate or window function")
        return QueryExpr(
            self._col,
            self._name,
            win_fn=self._win_fn,
            partition_by=[self._c(a) for a in args],
            order_by=self._order_by,
            needs_order=self._needs_order,
        )

    def order_by(self, *args) -> "QueryExpr":
        """Add window order keys (reference hdk.py:1488). Args may be
        (expr, "asc"/"desc"[, "first"/"last"]) tuples; default asc,
        nulls last — same as sort collation (reference IR/Node.h:23)."""
        if self._win_fn is None:
            raise ValueError("order_by() requires an aggregate or window function")
        orders = [_collate(a) for a in args]
        return QueryExpr(
            self._col,
            self._name,
            win_fn=self._win_fn,
            partition_by=self._partition_by or [],
            order_by=(self._order_by or []) + orders,
            needs_order=self._needs_order,
        )

    # -- scalar ops (reference hdk.py:509-702) ---------------------------
    def extract(self, field: str):
        return self._wrap(scalar_fns.extract(field, self.column()), f"{self._name or 'expr'}_{field}")

    def cast(self, new_type: str):
        return self._wrap(self.column().cast(to_spark_type(new_type)))

    def uminus(self):
        return self._wrap(-self.column())

    def is_null(self):
        return self._wrap(self.column().isNull())

    def is_not_null(self):
        return self._wrap(self.column().isNotNull())

    def unnest(self):
        return self._wrap(F.explode(self.column()))

    # -- arithmetic (reference hdk.py:703-995) ---------------------------
    def add(self, value, field: str | None = None):
        if field is not None:  # DATEADD path (reference hdk.py:703 docstring)
            return self._wrap(scalar_fns.date_add(field, value, self.column()))
        return self._wrap(self.column() + self._c(value))

    def sub(self, value, field: str | None = None):
        if field is not None:
            n = -self._c(value) if isinstance(value, (QueryExpr, Column)) else -value
            return self._wrap(scalar_fns.date_add(field, n, self.column()))
        return self._wrap(self.column() - self._c(value))

    def mul(self, value):
        return self._wrap(self.column() * self._c(value))

    def truediv(self, value):
        return self._wrap(self.column() / self._c(value))

    def floordiv(self, value):
        return self._wrap(F.floor(self.column() / self._c(value)))

    def div(self, value):
        """`/INT` integer division (reference RelAlgDagBuilder "/INT")."""
        return self._wrap(scalar_fns.div_int(self.column(), self._c(value)))

    def mod(self, value):
        return self._wrap(self.column() % self._c(value))

    # -- logical / bitwise (reference hdk.py:996-1193) -------------------
    def logical_not(self):
        return self._wrap(~self.column())

    def logical_and(self, value):
        return self._wrap(self.column() & self._c(value))

    def logical_or(self, value):
        return self._wrap(self.column() | self._c(value))

    def bw_and(self, value):
        return self._wrap(self.column().bitwiseAND(self._c(value)))

    def bw_or(self, value):
        return self._wrap(self.column().bitwiseOR(self._c(value)))

    def bw_xor(self, value):
        return self._wrap(self.column().bitwiseXOR(self._c(value)))

    def bw_not(self):
        return self._wrap(F.bitwise_not(self.column()))

    # -- comparisons (reference hdk.py:1194-1401) ------------------------
    def eq(self, value):
        return self._wrap(self.column() == self._c(value))

    def ne(self, value):
        return self._wrap(self.column() != self._c(value))

    def lt(self, value):
        return self._wrap(self.column() < self._c(value))

    def le(self, value):
        return self._wrap(self.column() <= self._c(value))

    def gt(self, value):
        return self._wrap(self.column() > self._c(value))

    def ge(self, value):
        return self._wrap(self.column() >= self._c(value))

    # -- arrays (reference hdk.py:1402-1455) -----------------------------
    def at(self, index):
        """1-based subscript (reference test_pyhdk_api.py:927 test_at)."""
        return self._wrap(scalar_fns.item(self.column(), self._c(index) if isinstance(index, (QueryExpr, Column)) else index))

    def cardinality(self):
        return self._wrap(scalar_fns.cardinality(self.column()))

    # -- dunders (reference hdk.py:1520-1538) ----------------------------
    __neg__ = uminus
    __add__ = add
    __sub__ = sub
    __mul__ = mul
    __floordiv__ = floordiv
    __truediv__ = truediv
    __mod__ = mod
    __eq__ = eq  # type: ignore[assignment]
    __ne__ = ne  # type: ignore[assignment]
    __lt__ = lt
    __le__ = le
    __gt__ = gt
    __ge__ = ge
    __invert__ = logical_not
    __and__ = logical_and
    __or__ = logical_or
    __getitem__ = at
    __hash__ = None  # type: ignore[assignment]  # __eq__ builds expressions


# ---------------------------------------------------------------------------
# global expression constructors (reference HDK-object methods,
# hdk.py:2652-2953)
# ---------------------------------------------------------------------------


def cst(value: Any, cst_type: str | None = None, scale_decimal: bool = True) -> QueryExpr:
    """Constant expression (reference hdk.py:2652 const/cst)."""
    if cst_type is None:
        return QueryExpr(F.lit(value))
    t = to_spark_type(cst_type)
    from pyspark.sql import types as T

    if isinstance(t, T.DecimalType) and isinstance(value, int) and not scale_decimal:
        # unscaled int literal: 1557 with dec(10,2) → 15.57
        value = value / (10 ** t.scale)
    if isinstance(t, (T.DateType, T.TimestampType)) and isinstance(value, str):
        return QueryExpr(F.lit(value).cast(t))
    return QueryExpr(F.lit(value).cast(t))


const = cst


def date(value: str) -> QueryExpr:
    """reference hdk.py:2708."""
    return QueryExpr(F.to_date(F.lit(value)))


def time(value: str) -> QueryExpr:
    """Time literal → seconds since midnight (SURVEY §1.2: Spark has no
    time type; reference hdk.py:2729)."""
    h, m, s = (int(x) for x in value.split(":"))
    return QueryExpr(F.lit(h * 3600 + m * 60 + s))


def timestamp(value: str) -> QueryExpr:
    """reference hdk.py:2750."""
    return QueryExpr(F.to_timestamp(F.lit(value)))


def count() -> QueryExpr:
    """COUNT(*) aggregate/window (reference hdk.py:2771)."""
    c = F.count(F.lit(1))
    return QueryExpr(c, "count", win_fn=c)


def row_number() -> QueryExpr:
    """reference hdk.py:2791."""
    return QueryExpr(F.row_number(), "row_number", win_fn=F.row_number(), needs_order=True)


def rank() -> QueryExpr:
    """reference hdk.py:2817."""
    return QueryExpr(F.rank(), "rank", win_fn=F.rank(), needs_order=True)


def dense_rank() -> QueryExpr:
    """reference hdk.py:2843."""
    return QueryExpr(F.dense_rank(), "dense_rank", win_fn=F.dense_rank(), needs_order=True)


def percent_rank() -> QueryExpr:
    """reference hdk.py:2869."""
    return QueryExpr(F.percent_rank(), "percent_rank", win_fn=F.percent_rank(), needs_order=True)


def cume_dist() -> QueryExpr:
    """CUME_DIST window (reference IR/OpTypeEnums.h:101)."""
    return QueryExpr(F.cume_dist(), "cume_dist", win_fn=F.cume_dist(), needs_order=True)


def ntile(tile_count: int) -> QueryExpr:
    """reference hdk.py:2894."""
    c = F.ntile(tile_count)
    return QueryExpr(c, "ntile", win_fn=c, needs_order=True)


def if_then_else(cond, true_val, false_val) -> QueryExpr:
    """CASE WHEN (reference hdk.py:2924; IR/Expr.h:840 CaseExpr)."""
    return QueryExpr(
        F.when(QueryExpr._c(cond), QueryExpr._c(true_val)).otherwise(
            QueryExpr._c(false_val)
        )
    )


# ---------------------------------------------------------------------------
# node API
# ---------------------------------------------------------------------------


def _collate(arg) -> Column:
    """(expr, "asc"/"desc"[, "first"/"last"]) → ordered Column; bare
    expr → asc nulls-last (reference IR/Node.h:23-27 SortField +
    hdk.py:1679 sort defaults)."""
    order, nulls = "asc", "last"
    if isinstance(arg, tuple):
        expr, *rest = arg
        if len(rest) >= 1:
            order = rest[0]
        if len(rest) >= 2:
            nulls = rest[1]
    else:
        expr = arg
    c = expr.column() if isinstance(expr, QueryExpr) else (
        expr if isinstance(expr, Column) else F.col(expr)
    )
    key = (order.lower(), nulls.lower())
    return {
        ("asc", "last"): c.asc_nulls_last(),
        ("asc", "first"): c.asc_nulls_first(),
        ("desc", "last"): c.desc_nulls_last(),
        ("desc", "first"): c.desc_nulls_first(),
    }[key]


class QueryNode:
    """DataFrame-backed builder node (reference QueryNodeAPI,
    hdk.py:1539; C++ QueryBuilder.h:581)."""

    def __init__(self, hdk, df: DataFrame, name: str | None = None):
        self.hdk = hdk
        self.df = df
        self._name = name

    # -- column references ----------------------------------------------
    def ref(self, col) -> QueryExpr:
        """Column reference by index (negative ok) or name
        (reference hdk.py:1865)."""
        if isinstance(col, QueryExpr):
            return col
        if isinstance(col, int):
            col = self.df.columns[col]
        return QueryExpr(self.df[col], col)

    __getitem__ = ref

    def _resolve(self, arg) -> QueryExpr:
        if isinstance(arg, QueryExpr):
            return arg
        if isinstance(arg, (int, str)):
            return self.ref(arg)
        if isinstance(arg, Column):
            return QueryExpr(arg)
        return QueryExpr(F.lit(arg))

    # -- node ops --------------------------------------------------------
    def proj(self, *args, exprs: dict | None = None, **kwargs) -> "QueryNode":
        """reference hdk.py:1540."""
        cols: list[Column] = []
        seen: set[str] = set()

        def add(expr: QueryExpr, name: str | None):
            n = name or expr.name
            if n == "expr" or n in seen:  # unnamed or colliding → positional
                n = f"expr_{len(cols)}" if n == "expr" else f"{n}_{len(cols)}"
            seen.add(n)
            cols.append(expr.column().alias(n))

        for a in args:
            add(self._resolve(a), None)
        for name, a in {**(exprs or {}), **kwargs}.items():
            add(self._resolve(a), name)
        return QueryNode(self.hdk, self.df.select(*cols))

    def agg(self, group_keys, *args, aggs: dict | None = None, **kwargs) -> "QueryNode":
        """reference hdk.py:1606."""
        if isinstance(group_keys, (int, str, QueryExpr)):
            group_keys = [group_keys]
        keys: list[Column] = []
        for k in group_keys:
            e = self._resolve(k)
            keys.append(e.column().alias(e.name) if e._name else e.column())

        agg_cols: list[Column] = []

        def add(spec, name: str | None):
            if isinstance(spec, str):
                expr, auto = self._parse_agg_string(spec)
            else:
                expr, auto = self._resolve(spec), None
            n = name or auto or expr.name
            agg_cols.append(expr.column().alias(n))

        for a in args:
            add(a, None)
        for name, a in {**(aggs or {}), **kwargs}.items():
            add(a, name)
        if not agg_cols:
            agg_cols = [F.count(F.lit(1)).alias("count")]
        return QueryNode(self.hdk, self.df.groupBy(*keys).agg(*agg_cols))

    def _parse_agg_string(self, spec: str) -> tuple[QueryExpr, str]:
        """Parse pyhdk agg strings: "count", "sum(x)", "approx
        quantile(x, 0.5)" (reference QueryBuilder.h:434 parseAggString)."""
        spec = spec.strip()
        if "(" not in spec:
            fn = spec.lower()
            return QueryExpr(agg_fns.agg_function(fn)), fn.replace(" ", "_")
        fn, rest = spec.split("(", 1)
        fn = fn.strip().lower()
        parts = [p.strip() for p in rest.rstrip(")").split(",")]
        col_name, extra = parts[0], parts[1:]
        col = self.df[col_name]
        extra_vals = [float(x) if "." in x else int(x) for x in extra]
        return (
            QueryExpr(agg_fns.agg_function(fn, col, *extra_vals)),
            f"{col_name}_{fn.split()[0].replace(' ', '_')}",
        )

    def filter(self, *args) -> "QueryNode":
        """reference hdk.py:1832. Multiple conditions are AND'd."""
        out = self.df
        for a in args:
            out = out.filter(self._resolve(a).column())
        return QueryNode(self.hdk, out)

    def sort(self, *args, fields: dict | None = None, limit: int = 0,
             offset: int = 0, **kwargs) -> "QueryNode":
        """reference hdk.py:1679."""
        collation = [_collate(a if not isinstance(a, int) else self.df.columns[a])
                     for a in args]
        for name, spec in {**(fields or {}), **kwargs}.items():
            if isinstance(spec, str):
                collation.append(_collate((name, spec)))
            else:
                collation.append(_collate((name, *spec)))
        out = self.df.orderBy(*collation) if collation else self.df
        if offset:
            out = out.offset(offset)
        if limit:
            out = out.limit(limit)
        return QueryNode(self.hdk, out)

    def join(self, rhs_node: "QueryNode", lhs_cols=None, rhs_cols=None,
             cond=None, how: str = "inner") -> "QueryNode":
        """reference hdk.py:1747. Equi-joins keep only the left key
        columns; explicit cond keeps all input columns."""
        spark_how = _JOIN_HOW.get(how.lower())
        if spark_how is None:
            raise ValueError(
                f"unsupported join type {how!r} (reference supports "
                "inner/left/semi/anti, Shared/sqldefs.h:33)"
            )
        rhs = rhs_node.df
        if cond is not None:
            on = cond.column() if isinstance(cond, QueryExpr) else cond
            return QueryNode(self.hdk, self.df.join(rhs, on, spark_how))
        if lhs_cols is None:
            common = [c for c in self.df.columns if c in set(rhs.columns)]
            if not common:
                raise ValueError("no common columns for implicit equi-join")
            return QueryNode(self.hdk, self.df.join(rhs, common, spark_how))
        if isinstance(lhs_cols, str):
            lhs_cols = [lhs_cols]
        rhs_cols = [rhs_cols] if isinstance(rhs_cols, str) else (rhs_cols or lhs_cols)
        if list(lhs_cols) == list(rhs_cols):
            return QueryNode(self.hdk, self.df.join(rhs, list(lhs_cols), spark_how))
        on = None
        for lc, rc in zip(lhs_cols, rhs_cols):
            c = self.df[lc] == rhs[rc]
            on = c if on is None else (on & c)
        joined = self.df.join(rhs, on, spark_how)
        if spark_how in ("inner", "left"):
            joined = joined.drop(*[rhs[rc] for rc in rhs_cols])
        return QueryNode(self.hdk, joined)

    def refragmented_view(self, fragment_size: int,
                          refragmented_view_name: str | None = None) -> "QueryNode":
        """reference hdk.py:1588 — fragment count maps to partition
        count: partitions ≈ rows / fragment_size (SURVEY §1.1).

        Row count comes from Catalyst plan statistics (free — no job)
        when available; otherwise it is estimated from sizeInBytes and
        the schema's default row width. A driver-side count() here
        would scan the whole relation just to pick a partition count."""
        n = max(1, self._estimate_rows() // max(1, fragment_size))
        df = self.df.repartition(int(n))
        if refragmented_view_name:
            df.createOrReplaceTempView(refragmented_view_name)
        return QueryNode(self.hdk, df, name=refragmented_view_name)

    def _estimate_rows(self) -> int:
        """Catalyst-stat row estimate without running a job: exact
        rowCount when the optimizer derived one, else sizeInBytes over
        the schema's default per-row width."""
        from pyspark.sql import types as T

        stats = self.df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        widths = {
            T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2,
            T.IntegerType: 4, T.FloatType: 4, T.DateType: 4,
        }
        row_w = sum(widths.get(type(f.dataType), 8) +
                    (12 if isinstance(f.dataType, T.StringType) else 0)
                    for f in self.df.schema.fields) or 8
        return max(1, int(str(stats.sizeInBytes())) // row_w)

    # -- introspection (reference hdk.py:1905-1991) ----------------------
    @property
    def size(self) -> int:
        return len(self.df.columns)

    def column_info(self, col):
        if isinstance(col, int):
            col = self.df.columns[col]
        return self.df.schema[col]

    @property
    def table_name(self) -> str | None:
        return self._name

    @property
    def schema(self):
        return self.df.schema

    # -- execution -------------------------------------------------------
    def run(self, **kwargs):
        """Materialization boundary (reference hdk.py:1992). Spark is
        lazy; the Result handle triggers execution on first access, and
        stays re-queryable like the reference's result temp tables
        (ResultSetRegistry)."""
        from hdk_spark.context import Result

        return Result(self.df)
