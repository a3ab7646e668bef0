"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping (beyond the reference's OLAP surface — the reference
relies on its own fragment skipping, omniscidb fragmenter metadata; on
a 100 TB lake the equivalent lever is writing files whose per-file
min/max column ranges are TIGHT, so parquet footer pruning can drop
files for predicates on ANY of the clustered columns, not just the
first sort key).

Why Z-order instead of a lexicographic sort: sorting by (a, b) gives
perfect pruning on `a` but near-none on `b`; interleaving the bits of
rank-scaled a and b gives every clustered column roughly equal pruning
power — the standard trick behind Delta/Iceberg OPTIMIZE ZORDER.

Determinism contract (repo rule): the z-value is pure int64
arithmetic — fixed-point min-max scaling then bit interleaving — and
:func:`zorder_sql` renders the IDENTICAL formula for the DuckDB
oracle, so layout keys are bit-reproducible in both engines, under
task retry, and at any partitioning.

Scale shape: one bounded min/max aggregate per clustered column
(skippable by passing literal bounds, which a table catalog already
knows), then a map-only key projection; the actual clustering is
``repartitionByRange`` on the key — ONE range exchange, exactly what
any global sort costs. No joins, no skew (z-values inherit the
uniformity of the rank scaling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_by", "zorder_sql", "compaction_bins"]


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Fixed-point min-max scale to [0, 2^bits): floor((v-lo)/(hi-lo)
    * (2^bits-1)), clamped; constant columns map to 0. NULL → 0 (sorts
    with the low corner, same as the SQL rendering)."""
    top = (1 << bits) - 1
    if hi == lo:
        return F.lit(0).cast("bigint")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(top))
    )
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(top)), F.lit(0)
    ).cast("bigint")


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position i*k + j.
    Pure shift/mask arithmetic — whole-stage codegen, SQL-expressible."""
    k = len(scaled)
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(scaled):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    bounds: dict[str, tuple[float, float]] | None = None,
    out_col: str = "z",
) -> DataFrame:
    """Add a Morton z-order key over ``cols`` (numeric). ``bounds``
    maps column → (min, max); omitted columns get one exact min/max
    aggregate here (at scale pass catalog-known bounds — they are a
    property of the table, not the query). ``bits`` per column;
    len(cols)*bits must fit int64 (≤ 63)."""
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds the int64 z-key"
        )
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in missing],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in missing],
        ).collect()[0]
        for c in missing:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    scaled = [
        _scaled(F.col(c), bounds[c][0], bounds[c][1], bits) for c in cols
    ]
    return df.withColumn(out_col, _interleave(scaled, bits))


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 8,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Cluster ``df`` into ``n_partitions`` z-order ranges: compute the
    z-key, range-partition on it, sort within partitions, drop the key.
    Writing the result yields files with tight min/max ranges on EVERY
    clustered column — the OPTIMIZE ZORDER layout. One range exchange."""
    keyed = zorder_key(df, cols, bits, bounds, out_col="__z")
    return (
        keyed.repartitionByRange(n_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_sql(
    cols_sql: list[str],
    bounds: list[tuple[float, float]],
    bits: int = 8,
) -> str:
    """The oracle-side rendering of :func:`zorder_key`'s z expression
    (shared formula so Spark and the SQL oracle can never drift)."""
    k = len(cols_sql)
    top = (1 << bits) - 1
    scaled = []
    for c, (lo, hi) in zip(cols_sql, bounds):
        if hi == lo:
            scaled.append("CAST(0 AS BIGINT)")
        else:
            scaled.append(
                "CAST(COALESCE(LEAST(GREATEST(FLOOR((CAST(" + c
                + f" AS DOUBLE) - {float(lo)!r}) / {float(hi - lo)!r}"
                f" * {float(top)!r}), 0), {top}), 0) AS BIGINT)"
            )
    terms = []
    for i in range(bits):
        for j, s in enumerate(scaled):
            terms.append(f"(((({s}) >> {i}) & 1) << {i * k + j})")
    return "(" + " + ".join(terms) + ")"


def compaction_bins(
    files: DataFrame,
    size_col: str = "size_bytes",
    path_col: str = "path",
    target_bytes: int = 128 << 20,
    partition_col: "str | None" = None,
) -> DataFrame:
    """Deterministic compaction plan for a small-file table — the
    streaming-ingest failure mode at scale (per-batch writers leave
    thousands of KB-sized parquet files; scan throughput dies on
    footer overhead and task-per-file scheduling). Input is a file
    listing (path, size[, partition]); output adds ``bin`` — files
    sharing a bin are rewritten into one output file — and
    ``bin_pos`` (0-based order within the bin).

    Binning is cumulative: files are ordered by path within their
    table partition and ``bin = cum_bytes_before div target_bytes``,
    so every bin's total is < target_bytes + one file (files are
    never split — the token_budget_sample rule applied to bytes) and
    the plan is a pure function of the listing: re-running a crashed
    compaction job re-derives the IDENTICAL plan, so already-written
    bins are safely idempotent.

    Scale shape: a file LISTING is metadata-sized (one row per file,
    not per record), so the one window per partition key is cheap by
    construction; partitioned tables parallelize across
    ``partition_col``. The heavy lifting — the actual rewrite — is
    ``spark.read.parquet(paths_of_bin).coalesce(1).write``, embarrass-
    ingly parallel across bins.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    keys = [partition_col] if partition_col is not None else []
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(path_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(
        F.sum(F.col(size_col).cast("long")).over(w), F.lit(0)
    )
    binned = (
        files.select("*", cum.alias("__cum"))
        .select("*", F.expr(f"__cum DIV {int(target_bytes)}").alias("bin"))
        .drop("__cum")
    )
    w_pos = Window.partitionBy(*keys, "bin").orderBy(path_col)
    return binned.select(
        "*", (F.row_number().over(w_pos) - 1).cast("long").alias("bin_pos")
    )
