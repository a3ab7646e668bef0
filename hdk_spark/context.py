"""The `HDK` facade — pyhdk-compatible entry object over a SparkSession.

Mirrors the user-facing API of the reference's ``pyhdk.init()`` /
``HDK`` class (reference python/pyhdk/hdk.py:2956 ``init``, class at
:2113) with the storage verbs of ArrowStorage (reference
omniscidb/ArrowStorage/ArrowStorage.h:81-133):

    create_table  — ArrowStorage.h:81   → empty DataFrame temp view
    import_csv    — ArrowStorage.h:98   → spark.read.csv
    import_parquet— ArrowStorage.h:129  → spark.read.parquet
    import_arrow  — ArrowStorage.h:85   → spark.createDataFrame
    append_*      — ArrowStorage.h:95   → unionByName re-registration
    drop_table    — hdk.py:2169         → catalog.dropTempView
    sql           — hdk.py:2456         → spark.sql (aliases as views)
    scan          — hdk.py:1560         → builder QueryNode

Tables are Spark temp views; "fragments" (the reference's unit of
parallelism, 32M rows by default, ArrowStorage.h:40) map to DataFrame
partitions — ``fragment_size`` is accepted and used as a partition-count
hint where it matters.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from hdk_spark.session import get_spark
from hdk_spark.types import to_schema


class HDK:
    """Engine object wrapping a SparkSession (pyhdk `HDK` equivalent)."""

    def __init__(self, spark: SparkSession | None = None, **config: Any):
        self.spark = spark or get_spark(**{str(k): str(v) for k, v in config.items()})
        self._tables: dict[str, DataFrame] = {}
        # pandas-UDF kernels must unpickle on workers regardless of the
        # caller's session/cwd — ship the package once per context
        from hdk_spark.session import ensure_shipped

        ensure_shipped(self.spark)

    # ------------------------------------------------------------------
    # storage verbs (reference ArrowStorage / pyhdk HDK methods)
    # ------------------------------------------------------------------
    def create_table(
        self,
        name: str,
        schema: list[tuple[str, str]] | Any,
        fragment_size: int | None = None,
    ) -> "Table":
        """Create an empty table with an explicit schema
        (reference ArrowStorage.h:81; pyhdk hdk.py:2130)."""
        struct = to_schema(schema) if isinstance(schema, list) else schema
        df = self.spark.createDataFrame([], struct)
        return self._register(name, df)

    def import_parquet(self, path: str, name: str | None = None) -> "Table":
        """reference ArrowStorage.h:129 (importParquetFile); hdk.py:2313."""
        name = name or _table_name_from_path(path)
        return self._register(name, self.spark.read.parquet(path))

    def import_csv(
        self,
        path: str,
        name: str | None = None,
        schema: list[tuple[str, str]] | None = None,
        header: bool = True,
        delimiter: str = ",",
        skip_rows: int = 0,
        block_size: int | None = None,  # parse granularity — Spark-managed
    ) -> "Table":
        """reference ArrowStorage.h:98 (CsvParseOptions at :43); hdk.py:2229."""
        reader = self.spark.read.option("header", header).option("sep", delimiter)
        if skip_rows:
            # CsvParseOptions.skip_rows: drop leading lines before parse.
            reader = reader.option("skipLines", skip_rows)
        if schema is not None:
            reader = reader.schema(to_schema(schema))
        else:
            reader = reader.option("inferSchema", True)
        name = name or _table_name_from_path(path)
        return self._register(name, reader.csv(path))

    def import_json(
        self,
        path: str,
        name: str | None = None,
        schema: list[tuple[str, str]] | None = None,
        multiline: bool = False,
    ) -> "Table":
        """JSON-lines import (beyond-reference: pyhdk reads CSV/Parquet/
        Arrow only — SURVEY.md §2.2). ``multiline=True`` parses one JSON
        document spanning lines; default is one object per line (the
        splittable, scale-friendly layout). With an explicit schema the
        reader skips the inference pass (one full scan saved at 100 TB)."""
        reader = self.spark.read.option("multiLine", multiline)
        if schema is not None:
            reader = reader.schema(to_schema(schema))
        name = name or _table_name_from_path(path)
        return self._register(name, reader.json(path))

    def import_orc(self, path: str, name: str | None = None) -> "Table":
        """ORC import (beyond-reference; same columnar pushdown/pruning
        path as parquet — Catalyst emits PushedFilters for both)."""
        name = name or _table_name_from_path(path)
        return self._register(name, self.spark.read.orc(path))

    def import_binary(
        self,
        path: str,
        name: str | None = None,
        glob: str | None = None,
        recursive: bool = False,
    ) -> "Table":
        """Raw-file import via Spark's ``binaryFile`` source (beyond-
        reference): each matching file becomes one row (path,
        modificationTime, length, content) with ``content`` the opaque
        BINARY column the multimodal operator family (operators/
        jpeg.py / png.py / exif.py / avi.py / multimodal.py) consumes —
        the lake entrance for image/audio/video blobs. Distributed
        read, one task per file group; pair with ``glob`` (e.g.
        ``*.jpg``) so partition pruning happens at listing time, and
        keep blobs ≤ a few hundred MB (a row must fit in executor
        memory — binaryFile is for corpus files, not giant archives;
        WARC/streams have their own readers)."""
        reader = self.spark.read.format("binaryFile")
        if glob:
            reader = reader.option("pathGlobFilter", glob)
        if recursive:
            reader = reader.option("recursiveFileLookup", "true")
        name = name or _table_name_from_path(path)
        return self._register(name, reader.load(path))

    def append_json(
        self, path: str, name: str, multiline: bool = False
    ) -> "Table":
        """Incremental JSON append — mirrors import_json's signature
        (explicit ``multiline``; the appended rows reuse the existing
        table's schema, so no inference pass). Unknown table names
        raise a clear error."""
        if name not in self._tables:
            raise KeyError(
                f"append_json: unknown table {name!r} — import it first"
            )
        existing = self._tables[name]
        reader = self.spark.read.option("multiLine", multiline).schema(
            existing.schema
        )
        return self._register(name, existing.unionByName(reader.json(path)))

    def import_arrow(self, table: Any, name: str | None = None) -> "Table":
        """Import a pyarrow Table or pandas DataFrame
        (reference ArrowStorage.h:85; hdk.py:2361)."""
        import pandas as pd

        name = name or "arrow_table"
        if isinstance(table, pd.DataFrame):
            df = self.spark.createDataFrame(table)
        else:  # pyarrow.Table
            df = self.spark.createDataFrame(table.to_pandas())
        return self._register(name, df)

    import_pandas = import_arrow

    def append_arrow(self, table: Any, name: str) -> "Table":
        """Incremental append (reference ArrowStorage.h:95 appendArrowTable).
        Batch-mode equivalent: union + re-register; streaming ingest lives
        in hdk_spark.streaming."""
        import pandas as pd

        existing = self._tables[name]
        if isinstance(table, pd.DataFrame):
            new = self.spark.createDataFrame(table, existing.schema)
        else:
            new = self.spark.createDataFrame(table.to_pandas(), existing.schema)
        return self._register(name, existing.unionByName(new))

    def append_parquet(self, path: str, name: str) -> "Table":
        existing = self._tables[name]
        return self._register(name, existing.unionByName(self.spark.read.parquet(path)))

    def append_csv(self, path: str, name: str, **csv_opts: Any) -> "Table":
        existing = self._tables[name]
        reader = self.spark.read.option("header", csv_opts.get("header", True)).option(
            "sep", csv_opts.get("delimiter", ",")
        )
        return self._register(name, existing.unionByName(reader.schema(existing.schema).csv(path)))

    def drop_table(self, name: str) -> None:
        """reference hdk.py:2169."""
        self._tables.pop(name, None)
        self.spark.catalog.dropTempView(name)

    def _register(self, name: str, df: DataFrame) -> "Table":
        df.createOrReplaceTempView(name)
        self._tables[name] = df
        return Table(self, name, df)

    # ------------------------------------------------------------------
    # query entry points
    # ------------------------------------------------------------------
    def sql(self, query: str, **table_aliases: Any) -> "Result":
        """Run SQL. Keyword aliases are registered as temp views for the
        query's duration — the Spark-native analog of the reference's CTE
        splicing (hdk.py:2494-2511 builds `WITH alias AS (...)`). Aliases
        accept Table handles, builder QueryNodes, Results, or raw
        DataFrames."""
        for alias, t in table_aliases.items():
            df = t.df if hasattr(t, "df") else t
            df.createOrReplaceTempView(alias)
        return Result(self.spark.sql(query))

    def analyze(
        self,
        name: str,
        cols: "list[str] | None" = None,
        exact_ndv: bool = False,
    ) -> "Result":
        """ANALYZE TABLE: per-column statistics in ONE aggregate pass
        (n, n_null, min, max, ndv) over the listed columns (default:
        all numeric/date columns), long form, ordered by column name.
        ``exact_ndv=False`` (the scale default) uses HLL
        approx_count_distinct; ``exact_ndv=True`` is the
        oracle-checkable path. Results are also cached on the engine
        (``self.stats[name]``) so layout/profiling consumers
        (zorder bounds, histogram bounds) can reuse catalog-known
        numbers instead of re-scanning — the 'bounds are a property of
        the table, not the query' pattern."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = self._tables[name]
        if cols is None:
            numeric = (
                T.NumericType, T.DateType, T.TimestampType,
                T.TimestampNTZType,
            )
            cols = [
                f.name for f in df.schema.fields
                if isinstance(f.dataType, numeric)
            ]
        if not cols:
            raise ValueError(f"analyze: no numeric columns in {name!r}")
        ndv = (
            (lambda c: F.count_distinct(F.col(c)))
            if exact_ndv
            else (lambda c: F.approx_count_distinct(F.col(c)))
        )
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(sorted(cols)):
            aggs += [
                F.count(F.col(c)).alias(f"__nn{i}"),
                F.min(F.col(c).cast("double")).alias(f"__mn{i}"),
                F.max(F.col(c).cast("double")).alias(f"__mx{i}"),
                ndv(c).alias(f"__nd{i}"),
            ]
        row = df.agg(*aggs)
        names = sorted(cols)
        stacked = ", ".join(
            f"'{c}', __nn{i}, __mn{i}, __mx{i}, __nd{i}"
            for i, c in enumerate(names)
        )
        out = row.selectExpr(
            "__n",
            f"stack({len(names)}, {stacked}) AS "
            "(column, n_non_null, min_d, max_d, ndv)",
        ).select(
            "column",
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - F.col("n_non_null")).cast("long").alias("n_null"),
            "min_d",
            "max_d",
            F.col("ndv").cast("long").alias("ndv"),
        ).orderBy("column")
        if not hasattr(self, "stats"):
            self.stats: dict[str, dict[str, dict]] = {}
        self.stats[name] = {
            r["column"]: {
                "n_rows": r["n_rows"], "n_null": r["n_null"],
                "min": r["min_d"], "max": r["max_d"], "ndv": r["ndv"],
            }
            for r in out.collect()
        }
        return Result(out)

    def bounds_for(self, name: str, cols: "list[str]") -> dict:
        """Catalog bounds for zorder_key/histogram: (min, max) per
        column from the cached analyze() stats (runs analyze if the
        table hasn't been analyzed yet)."""
        if not hasattr(self, "stats") or name not in getattr(self, "stats", {}):
            self.analyze(name, cols)
        st = self.stats[name]
        missing = [c for c in cols if c not in st]
        if missing:
            self.analyze(name, sorted(set(cols) | set(st)))
            st = self.stats[name]
        return {c: (st[c]["min"], st[c]["max"]) for c in cols}

    def execute_ra(self, plan: "dict | str", **table_aliases: Any) -> "Result":
        """Raw relational-algebra entry point: execute a Calcite-style
        RA JSON plan (the reference's third query path — pre-built plan
        straight to the executor, python/tests/test_pyhdk_calcite_json
        .py, omniscidb/Tests/NoCatalogRelAlgTest.cpp). Keyword aliases
        supply no-catalog table bindings."""
        from hdk_spark.plans import execute_plan

        tables = {
            alias: (t.df if hasattr(t, "df") else t)
            for alias, t in table_aliases.items()
        } or None
        return Result(execute_plan(self.spark, plan, tables))

    def scan(self, name: str) -> Any:
        """Builder entry (reference QueryBuilder::scan,
        omniscidb/QueryBuilder/QueryBuilder.h:585; pyhdk hdk.py:1560)."""
        from hdk_spark.builder import QueryNode

        return QueryNode(self, self.table(name).df, name=name)

    def from_df(self, df: DataFrame) -> Any:
        """Builder node from an arbitrary DataFrame (extension)."""
        from hdk_spark.builder import QueryNode

        return QueryNode(self, df)

    def table(self, name: str) -> "Table":
        if name not in self._tables:
            self._tables[name] = self.spark.table(name)
        return Table(self, name, self._tables[name])

    def import_pydict(self, values: dict, table_name: "str | Table | None" = None) -> "Table":
        """reference hdk.py:2416 (import_pydict). Passing an existing
        Table handle appends to it (reference test_pyhdk_api.py:1018)."""
        import pandas as pd

        if isinstance(table_name, Table):
            return self.append_arrow(pd.DataFrame(values), table_name.name)
        return self.import_arrow(pd.DataFrame(values), table_name or "pydict_table")

    def register_udf(self, name: str, fn: Any, return_type: str = "fp64",
                     vectorized: bool = False):
        """Register a Python function callable from SQL by name — the
        Spark-native analog of the reference's compiled C++ UDFs
        (reference UdfCompiler/UdfCompiler.h:31 compileUdf; registration
        ExtensionFunctionsWhitelist.cpp). ``vectorized=True`` registers
        an Arrow-batched pandas UDF (the fast path)."""
        from hdk_spark.types import to_spark_type

        t = to_spark_type(return_type)
        if vectorized:
            from pyspark.sql.pandas.functions import pandas_udf

            return self.spark.udf.register(name, pandas_udf(fn, t))
        from pyspark.sql.functions import udf

        return self.spark.udf.register(name, udf(fn, t))

    # ------------------------------------------------------------------
    # global expression constructors (reference hdk.py:2652-2953)
    # ------------------------------------------------------------------
    def cst(self, value: Any, cst_type: str | None = None, scale_decimal: bool = True):
        from hdk_spark import builder

        return builder.cst(value, cst_type, scale_decimal)

    const = cst

    def date(self, value: str):
        from hdk_spark import builder

        return builder.date(value)

    def time(self, value: str):
        from hdk_spark import builder

        return builder.time(value)

    def timestamp(self, value: str):
        from hdk_spark import builder

        return builder.timestamp(value)

    def count(self):
        from hdk_spark import builder

        return builder.count()

    def row_number(self):
        from hdk_spark import builder

        return builder.row_number()

    def rank(self):
        from hdk_spark import builder

        return builder.rank()

    def dense_rank(self):
        from hdk_spark import builder

        return builder.dense_rank()

    def percent_rank(self):
        from hdk_spark import builder

        return builder.percent_rank()

    def cume_dist(self):
        from hdk_spark import builder

        return builder.cume_dist()

    def ntile(self, tile_count: int):
        from hdk_spark import builder

        return builder.ntile(tile_count)

    def if_then_else(self, cond, true_val, false_val):
        from hdk_spark import builder

        return builder.if_then_else(cond, true_val, false_val)

    def type(self, type_str: str):
        """reference hdk.py:2578 — parse an HDK type string."""
        from hdk_spark.types import to_spark_type

        return to_spark_type(type_str)


class Table:
    """Handle to a registered table; also a builder seed (pyhdk returns
    scan-able table handles from import_*)."""

    def __init__(self, hdk: HDK, name: str, df: DataFrame):
        self.hdk = hdk
        self.name = name
        self.df = df

    def scan(self):
        return self.hdk.scan(self.name)

    # pyhdk table handles forward builder verbs (hdk.py QueryNodeAPI)
    def __getattr__(self, item):
        return getattr(self.scan(), item)

    @property
    def schema(self):
        return self.df.schema

    @property
    def row_count(self) -> int:
        return self.df.count()

    @property
    def shape(self) -> tuple[int, int]:
        """reference test_pyhdk_api.py:1014 (rows, cols)."""
        return (self.df.count(), len(self.df.columns))


class Result:
    """Executed-query handle (reference ResultSetTableToken,
    omniscidb/ResultSetRegistry/ResultSetTableToken.h: toArrow at :130).
    Spark is lazy, so 'execution' happens on first materialization; the
    handle stays queryable like the reference's result temp tables
    (test_run_on_res, reference python/tests/test_pyhdk_api.py:953)."""

    def __init__(self, df: DataFrame):
        self.df = df

    def to_arrow(self):
        return self.df.toArrow()

    def to_pandas(self):
        return self.df.toPandas()

    @property
    def row_count(self) -> int:
        return self.df.count()

    @property
    def shape(self) -> tuple[int, int]:
        """reference test_pyhdk_api.py:1014."""
        return (self.df.count(), len(self.df.columns))

    def row(self, i: int) -> list:
        """i-th result row as a plain list (reference
        test_pyhdk_api.py:989 test_row). Arrays come back as lists,
        NULLs as None."""
        rows = self.df.limit(i + 1).collect()
        if i >= len(rows):
            raise IndexError(f"row {i} out of range")

        def conv(v):
            return list(v) if isinstance(v, (list, tuple)) else v

        return [conv(v) for v in rows[i]]

    def head(self, n: int = 5):
        """reference hdk.py:1030."""
        return Result(self.df.limit(n))

    def tail(self, n: int = 5):
        """reference hdk.py:1044 — last n rows in result order."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        total = self.df.count()
        w = Window.orderBy(F.monotonically_increasing_id())
        ranked = self.df.withColumn("__rn", F.row_number().over(w))
        return Result(ranked.filter(F.col("__rn") > total - n).drop("__rn"))

    def to_explain_str(self) -> str:
        """Physical-plan text (reference _sql.pyx:85 to_explain_str —
        there it returns the IR dump; here the Spark formatted plan)."""
        return self.df._sc._jvm.PythonSQLUtils.explainString(
            self.df._jdf.queryExecution(), "formatted"
        )

    def to_parquet(
        self,
        path: str,
        mode: str = "overwrite",
        partition_by: "list[str] | None" = None,
        bucket_by: "tuple[int, list[str]] | None" = None,
        table_name: str | None = None,
        zorder: "list[str] | None" = None,
        zorder_files: int = 64,
        compact: bool = False,
        max_records_per_file: int | None = None,
        bloom_filter_cols: "list[str] | None" = None,
        bloom_ndv: int = 1_000_000,
    ) -> None:
        """Distributed parquet export (beyond-reference: pyhdk only
        reads files). ``partition_by`` → hive-style directory pruning;
        ``bucket_by=(n, cols)`` → bucketed saveAsTable so later joins/
        aggs on those keys skip the shuffle (see partitioning.py);
        ``zorder`` → OPTIMIZE-ZORDER layout (operators/layout.py):
        rows are Morton-clustered into ``zorder_files`` ranges before
        writing so every listed column gets tight per-file min/max
        footer stats (multi-column data skipping). zorder composes
        with partition_by, is mutually exclusive with bucket_by.

        Small-files control (THE classic 100 TB write problem — a
        filtered fact table keeps its thousand input partitions and
        writes a thousand shards): ``compact=True`` adds an AQE
        REBALANCE hint so output partitions are re-sized at runtime to
        the shuffle-target size, and ``max_records_per_file`` caps the
        opposite failure (one giant file) via the writer option. Both
        are no-ops for well-sized plans.

        ``bloom_filter_cols`` writes parquet bloom filters for the
        listed columns (``bloom_ndv`` expected distinct values each) —
        point-lookup data skipping on high-cardinality keys where
        min/max footer stats can't prune (ids, digests). Complements
        zorder, which serves RANGE predicates."""
        df = self.df
        if zorder:
            if bucket_by:
                raise ValueError("zorder and bucket_by are exclusive "
                                 "(bucketing fixes its own layout)")
            from hdk_spark.operators.layout import zorder_by

            df = zorder_by(df, zorder, zorder_files)
        elif compact:
            df = df.hint("rebalance")
        w = df.write.mode(mode)
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", int(max_records_per_file))
        for c in bloom_filter_cols or []:
            w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(int(bloom_ndv))
            )
        if partition_by:
            w = w.partitionBy(*partition_by)
        if bucket_by:
            n, cols = bucket_by
            name = table_name or _table_name_from_path(path)
            w.option("path", path).bucketBy(n, *cols).sortBy(*cols).saveAsTable(name)
            return
        w.parquet(path)

    def to_csv(self, path: str, mode: str = "overwrite", header: bool = True,
               delimiter: str = ",") -> None:
        (
            self.df.write.mode(mode)
            .option("header", header)
            .option("sep", delimiter)
            .csv(path)
        )

    def to_json(self, path: str, mode: str = "overwrite") -> None:
        """JSON-lines export (one object per line — splittable on read)."""
        self.df.write.mode(mode).json(path)

    def to_orc(self, path: str, mode: str = "overwrite",
               partition_by: "list[str] | None" = None) -> None:
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.orc(path)

    @property
    def scan(self):
        """Re-query the result as a table ("run on result")."""
        from hdk_spark.builder import QueryNode

        return QueryNode(None, self.df)


def init(spark: SparkSession | None = None, **config: Any) -> HDK:
    """pyhdk-compatible entry point (reference hdk.py:2956)."""
    return HDK(spark, **config)


def _table_name_from_path(path: str) -> str:
    import os

    base = os.path.basename(path.rstrip("/"))
    return base.split(".")[0]
