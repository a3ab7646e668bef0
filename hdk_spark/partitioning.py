"""Partitioning utilities for cluster-scale joins: bucketed co-located
joins and salted skew joins.

The reference is single-node, so its analog of this file is fragment
assignment (reference omniscidb/QueryEngine/Descriptors/
QueryFragmentDescriptor.cpp) plus the hash Shuffle node
(IR/Node.h:871); on Spark the same concerns become *where the
exchanges are*:

- ``write_bucketed`` / ``bucketed_join``: pre-bucket both relations on
  the join key so repeated joins are exchange-free (the 100 TB pattern
  for fact-fact joins that recur in a pipeline).
- ``salted_join``: explode a skewed build side's hot keys across
  ``salt`` sub-keys so one reducer doesn't absorb a hot key's entire
  partition. AQE's skew-join handles *sort-merge* skew automatically;
  explicit salting remains the tool for hash-join/groupBy skew you can
  predict.
- ``repartition_by_keys``: reusable pre-partitioning for multi-stage
  pipelines that aggregate repeatedly on one key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Two tables bucketed on the same keys with the same bucket count
    join/aggregate WITHOUT a shuffle."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two pre-bucketed tables. With matching bucketing this plans
    as a SortMergeJoin with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is large and skewed on ``on``.

    left rows get a salt in [0, salt); right rows are replicated
    ``salt`` times; the join key becomes (on, salt) so a hot key's rows
    spread over ``salt`` reducers. Semantics identical to
    ``left.join(right, on, how)`` for 1:N joins (right unique on key).

    The salt is derived deterministically from the row's columns (not
    F.rand()): if a task is recomputed after a shuffle-fetch failure,
    a random salt could re-assign rows and duplicate/drop join output;
    a hash of the row contents re-salts identically on replay.
    """
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_l.join(salted_r, [on, "__salt"], how)
    return out.drop("__salt")


def repartition_by_keys(df: DataFrame, keys: list[str], n: int | None = None) -> DataFrame:
    """Hash-repartition once so several downstream groupBys/joins on
    ``keys`` reuse the partitioning (the reference's explicit Shuffle
    node, IR/Node.h:886, exposed as an operator)."""
    cols = [F.col(k) for k in keys]
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def explain_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (test/
    diagnostics helper)."""
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return "Exchange hashpartitioning" in p or "+- Exchange" in p or "Exchange (" in p
