"""Mergeable sketches — sketch each ingest slice ONCE, store the
summary beside the slice, and answer rollup questions by MERGING
summaries, never by re-scanning history (the only maintenance model
that survives 100 TB). Three families, one merge law each:

- distinct counts: HLL (ndv_rollup / merge_ndv_rollups /
  ndv_estimate) — merge = register-wise max, idempotent. Built on
  Spark's Apache DataSketches functions (hll_sketch_agg /
  hll_union_agg, Spark ≥ 3.5), the family the reference's
  approx_count_distinct maps to (SURVEY.md §2.5). HLL mergeability
  is EXACT by construction: registers are per-hash maxima, so
  sketch(A) ∪ sketch(B) has byte-for-byte the registers of
  sketch(A∪B) at the same lgConfigK (property-tested).
- point frequencies: Count-Min (cms_build / cms_merge / cms_query)
  — merge = linear cell sum.
- frequency tops: Misra-Gries (mg_summary / mg_merge; exact-recount
  heavy hitters via frequent_items) — merge = counter add + one
  trim (Agarwal et al. 2012 "Mergeable Summaries" §3).

Each family has a bounded-state streaming twin in hdk_spark.streaming
(stream_ndv_rollup / stream_cms / stream_frequent_items)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["ndv_rollup", "merge_ndv_rollups", "ndv_estimate",
           "frequent_items", "mg_summary", "mg_merge",
           "mg_heavy_hitters", "cms_build", "cms_merge", "cms_query",
]


def ndv_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``: one partial-agg groupBy
    emitting (group, n_rows, sketch) — sketch is binary, ~(2^lgk)
    bytes max per group regardless of cardinality (lgk=12 → ±1.6%
    standard error in ~4 KB). Store it with the slice's metadata; the
    merge path never re-reads the slice."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
    )


def merge_ndv_rollups(*rollups: DataFrame) -> DataFrame:
    """Combine :func:`ndv_rollup` outputs from disjoint (or
    overlapping — HLL unions are idempotent) slices into the rollup
    of the union WITHOUT touching the underlying rows: union of
    groups-sized relations + one partial-agg groupBy folding
    register-wise maxima. ``ndv_estimate(merge(r(A), r(B))) ==
    ndv_estimate(r(A ∪ B))`` exactly (property-tested)."""
    if not rollups:
        raise ValueError("merge_ndv_rollups needs at least one input")
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)
    return out.groupBy("grp").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.hll_union_agg("sketch").alias("sketch"),
    )


def ndv_estimate(rollup: DataFrame) -> DataFrame:
    """(group, n_rows, ndv) from a sketch rollup — ndv is the HLL
    estimate rounded to the nearest long (DataSketches' estimator is
    deterministic for fixed registers)."""
    return rollup.select(
        "grp",
        "n_rows",
        F.round(F.hll_sketch_estimate("sketch")).cast("long").alias("ndv"),
    )


def _mg_trim(counters: "dict", k: int) -> None:
    """Misra-Gries overflow step: subtract the (k+1)-th largest
    counter from everything and drop non-positives — the mergeable-
    summaries trim (Agarwal et al. 2012, "Mergeable Summaries" §3),
    which keeps per-item undercount ≤ (N − Σcounters)/(k+1)."""
    if len(counters) <= k:
        return
    med = sorted(counters.values(), reverse=True)[k]
    for key in list(counters):
        c = counters[key] - med
        if c > 0:
            counters[key] = c
        else:
            del counters[key]


def frequent_items(
    df: DataFrame,
    value_col: str,
    k: int = 100,
) -> DataFrame:
    """EXACT heavy hitters: every item of ``value_col`` whose count
    strictly exceeds n/k, with its TRUE count — at any scale, in two
    bounded passes (Misra-Gries 1982 + the classic recount).

    Pass 1 — candidates AND total: each partition folds its rows
    through a k-counter Misra-Gries summary (bounded memory regardless
    of the partition's cardinality; the decremental trim is why this
    is a Python kernel — a decrement-all step is not expressible as a
    Spark partial aggregate) and emits its row count alongside, so
    n_total needs NO extra corpus pass. Pass 2 — exact: the corpus is
    semi-joined to the (≤ partitions·k)-row candidate set and counted
    exactly, then thresholded with integer arithmetic (cnt·k > n).
    Exactly two corpus scans, both unavoidable (any exact algorithm
    needs the recount).

    The candidate superset is GUARANTEED: if an item survives no
    partition summary, its count in every partition p is at most
    n_p/(k+1), so its total is ≤ n/(k+1) < n/k — contraposition says
    every item over the threshold is a candidate (property-tested
    against brute force). NULLs are excluded (not an item).

    Returns (item, cnt, n_total), descending cnt, ties on item.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    src = df.select(F.col(value_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("n_part", T.LongType()),
        ]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for v, c in pdf["item"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            _mg_trim(counters, k)
        items = sorted(counters) + [None]
        yield pd.DataFrame(
            {"item": items, "n_part": [0] * (len(items) - 1) + [seen]}
        )

    # tiny (≤ partitions·(k+1) rows); persisted because both the total
    # and the candidate set read it — without the persist the corpus
    # summary pass would run twice
    summ = src.mapInPandas(summarize, out_schema).persist()
    n_total = summ.agg(F.sum("n_part")).collect()[0][0] or 0
    cands = summ.filter(F.col("item").isNotNull()).select("item").distinct()
    counted = (
        src.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") * F.lit(k) > F.lit(int(n_total)))
    )
    return counted.select(
        "item", "cnt", F.lit(int(n_total)).cast("long").alias("n_total")
    ).orderBy(F.desc("cnt"), "item")


def mg_summary(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    n_shards: int = 8,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """ONE-ROUND sharded Misra-Gries summary as a relation — the
    deterministic batch REFERENCE for ``streaming.stream_frequent_
    items``: items hash-shard on ``pmod(hash(item), n_shards)``; per
    shard the EXACT counts take one MG trim (subtract the (k+1)-th
    largest count value, drop non-positives — no trim when the shard
    holds ≤ k items). Because counting is exact before the single
    trim, the result is a pure function of the multiset — order- and
    partitioning-independent, and (on the 'md5' basis) fully
    SQL-replayable: counts, the rank-(k+1) median, the subtraction.
    Returns (shard, item, cnt, n_shard): ≤ k item rows per shard, each
    with cnt > 0, plus NULL-item accounting rows (below).

    MG guarantees carried (Misra-Gries 1982; Agarwal et al. 2012
    "Mergeable Summaries" §3): cnt never exceeds the true shard
    count; undercount ≤ (n_shard − Σcnt)/(k+1); every item with true
    count > n_shard/(k+1) survives. Sharding by item TIGHTENS the
    bound (each shard sees ~n/n_shards rows) and is what lets the
    streaming twin hold ≤ n_shards·k counters of state.

    A shard whose trim drops EVERY item (all counts tie at ≤ the
    (k+1)-th value — flat distributions) still emits one ACCOUNTING
    row (item NULL, cnt NULL, n_shard) so shard volume is never lost:
    mg_merge's n_shard accounting and error bounds stay true even
    when an input slice's shard summarized to nothing. Consumers
    reading items should filter ``cnt IS NOT NULL``.

    Scale note: this batch form windows over the per-shard distinct-
    item counts, so it suits summary-building over slices; the
    unbounded-ingest path is the streaming twin, and the EXACT
    heavy-hitter query is ``frequent_items`` (which recounts)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    src = df.select(F.col(value_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    cnt = (
        src.withColumn(
            "shard",
            F.pmod(
                _cms_base_hash(F.col("item"), hash_basis), F.lit(n_shards)
            ).cast("int"),
        )
        .groupBy("shard", "item")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n_rel = cnt.groupBy("shard").agg(
        F.sum("c").cast("long").alias("n_shard"))
    # outer toward the totals: an all-trimmed shard keeps its
    # accounting row (item NULL, cnt NULL, n_shard). RIGHT outer with
    # the broadcast hint on the LEFT (non-preserved) side — hinting
    # the preserved side of an outer join is silently ignored and
    # degrades to a sort-merge join with two extra exchanges
    return F.broadcast(_mg_trim_relation(cnt, k)).join(
        n_rel, "shard", "right"
    ).select("shard", "item", "cnt", "n_shard")


def _mg_trim_relation(cnt: DataFrame, k: int) -> DataFrame:
    """One MG trim over a (shard, item, c) count relation — the shared
    tail of mg_summary and mg_merge (one fix reaches both, and both
    stay textually aligned with the contract oracles). Subtracts the
    (k+1)-th largest count VALUE per shard (ties collapse — any
    rank-(k+1) row carries the same c, so the row_number tie-break on
    item only picks WHICH row reports it, never the value) and drops
    non-positives; callers attach their own n_shard accounting (exact
    Σc for mg_summary, the summed input n_shards for mg_merge — the
    merged counters are already undercounts, so Σc would lie there).
    Returns (shard, item, cnt)."""
    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("shard").orderBy(F.desc("c"), F.asc("item"))
    w_shard = Window.partitionBy("shard")
    ranked = cnt.select(
        "shard", "item", "c",
        F.row_number().over(w_rank).alias("__rn"),
    )
    med = F.max(F.when(F.col("__rn") == k + 1, F.col("c"))).over(w_shard)
    return (
        ranked.select(
            "shard", "item",
            (F.col("c") - F.coalesce(med, F.lit(0))).cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def mg_merge(*summaries: DataFrame, k: int = 100) -> DataFrame:
    """Combine :func:`mg_summary` relations from corpus SLICES into a
    summary of the union WITHOUT re-reading any rows — the MG member
    of the repo's merge-not-rescan family (``cms_merge`` cell sums,
    ``merge_ndv_rollups`` register maxima; here: per-(shard, item)
    counter ADD over the ≤ inputs·k-rows-per-shard union, then ONE
    trim — Agarwal et al. 2012 "Mergeable Summaries" §3). n_shard
    accounting sums each input's per-shard total (taken DISTINCT from
    its repeated column); inputs' NULL-item accounting rows carry an
    all-trimmed shard's volume, so no mass is ever lost, and the
    merged relation emits the same accounting row for shards that
    end up empty.

    Merged guarantees (property-tested, and value-checked by the
    stats_mg_merge contract row): cnt never exceeds the true union
    count; undercount ≤ (n_shard − Σcnt)/(k+1); every item with true
    union count > n_shard/(k+1) survives. When no trim fired anywhere
    (k ≥ every distinct-per-shard), merge(mg(A), mg(B)) ==
    mg_summary(A ∪ B) exactly.

    All inputs must share the hash basis and n_shards they were built
    with (shard ids are only comparable under the same sharding) and
    the SAME k should be passed here — a larger k cannot recover
    already-trimmed mass, a smaller one tightens the summary."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not summaries:
        raise ValueError("mg_merge needs at least one input")
    counters = summaries[0].select("shard", "item", "cnt")
    totals = summaries[0].select("shard", "n_shard").distinct()
    for s in summaries[1:]:
        counters = counters.unionByName(s.select("shard", "item", "cnt"))
        totals = totals.unionByName(
            s.select("shard", "n_shard").distinct())
    merged = (
        counters.filter(F.col("item").isNotNull())  # accounting rows
        .groupBy("shard", "item")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
    n_rel = totals.groupBy("shard").agg(
        F.sum("n_shard").cast("long").alias("n_shard"))
    # same right-outer + build-left broadcast as mg_summary
    return F.broadcast(_mg_trim_relation(merged, k)).join(
        n_rel, "shard", "right"
    ).select("shard", "item", "cnt", "n_shard")


def mg_heavy_hitters(summary: DataFrame, phi: float, k: int) -> DataFrame:
    """φ-heavy-hitter QUERY over an MG summary relation — the
    consumer that completes the family (CMS has cms_query; this is
    the MG analog): every item whose true global count COULD reach
    φ·N, split into certain and possible. Because items shard BY
    item hash, an item's entire count lives in one shard, so the
    global question decomposes per shard exactly:

    - lower bound = cnt (MG counters never overcount),
    - upper bound = cnt + shard slack, slack = ⌊(n_shard − Σcnt_shard)
      /(k+1)⌋ (the Misra-Gries undercount bound; an UNLISTED item is
      bounded by the slack alone, which is why items below it can
      never be certified absent — the summary's honest limit),
    - ``certain`` = lower ≥ φ·N; emitted rows are upper ≥ φ·N.

    N = Σ per-shard n_shard — TOTAL volume, which the NULL-item
    accounting rows keep exact even for all-trimmed shards. Pass the
    SAME k the summary was built/merged with (it is not stored in the
    relation). Pure shards-sized arithmetic: one totals distinct, one
    per-shard Σcnt aggregate, one broadcast hash join for the slack
    and a ONE-ROW broadcast nested-loop for the global N (the
    Krippendorff 1-row-aggregate-attach pattern — the build side is a
    single row by construction, so the 'nested loop' is a constant);
    no window, no corpus access. Returns (item, cnt_lower, cnt_upper,
    certain), filterable fully in SQL (contract row
    stats_mg_heavy_hitters)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    totals = summary.select("shard", "n_shard").distinct()
    n_total = totals.agg(F.sum("n_shard").cast("long").alias("n"))
    slack = (
        summary.groupBy("shard")
        .agg(
            F.floor(
                (F.max("n_shard") - F.coalesce(F.sum("cnt"), F.lit(0)))
                / F.lit(k + 1)
            ).cast("long").alias("__slack")
        )
    )
    items = summary.filter(F.col("item").isNotNull())
    scored = (
        items.join(F.broadcast(slack), "shard")
        .crossJoin(F.broadcast(n_total))
        .select(
            "item",
            F.col("cnt").alias("cnt_lower"),
            (F.col("cnt") + F.col("__slack")).alias("cnt_upper"),
            (F.col("cnt").cast("double") >= F.lit(phi) * F.col("n"))
            .alias("certain"),
            (F.col("cnt") + F.col("__slack")).cast("double")
            .alias("__up"),
            (F.lit(phi) * F.col("n")).alias("__thr"),
        )
    )
    return (
        scored.filter(F.col("__up") >= F.col("__thr"))
        .select("item", "cnt_lower", "cnt_upper", "certain")
        .orderBy(F.desc("cnt_lower"), "item")
    )


def _cms_base_hash(col, hash_basis: str):
    """64-bit base hash of a value for the CMS Knuth-cell family.

    'xxhash64' (default): JVM-native, the production basis.
    'md5': first 4 md5 bytes as a non-negative int — computable
    identically in DuckDB (``CAST(('0x' || substr(md5(v),1,8)) AS
    BIGINT)``), so contract rows can replay every cell in SQL (the
    same basis discipline as simhash_pairs / minhash md5 modes).
    """
    s = col.cast("string")
    if hash_basis == "xxhash64":
        return F.xxhash64(s)
    if hash_basis == "md5":
        return F.conv(
            F.substring(F.md5(F.encode(s, "utf-8")), 1, 8), 16, 10
        ).cast("long")
    raise ValueError(f"unknown hash_basis {hash_basis!r}")


def _cms_cell_structs(xcol, depth: int, width: int, seed: int):
    """The depth (r, b) cell coordinates of one hashed value: the
    repo's arithmetic Knuth family ((x mod P)·MULT + seed + r·r_mult)
    mod P mod width with P = 1e9+7 — every factor < 2^31 so the
    product stays inside int64 in Spark AND DuckDB."""
    return [
        F.struct(
            F.lit(r).alias("r"),
            (
                F.pmod(
                    F.pmod(xcol, F.lit(1_000_000_007))
                    * F.lit(2654435761 % 1_000_000_007)
                    + F.lit(seed + r * 1_000_003),
                    F.lit(1_000_000_007),
                )
                % F.lit(width)
            ).cast("int").alias("b"),
        )
        for r in range(depth)
    ]


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 37,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a value
    column as a RELATION: (r, b, c) cells with r < depth hash rows,
    b < width buckets — the mergeable frequency summary (store one
    per ingest slice, answer "how often did X appear so far" without
    re-scanning history; the frequency-sketch sibling of
    ``ndv_rollup``'s HLL). Build is one map-side explode of depth
    cells per row + ONE partial-agg groupBy; absent cells are zero.

    Row hashes are the repo's arithmetic Knuth family
    (((x·MULT + seed + r·r_mult) mod P) mod width over the value's
    base hash), so the sketch is a pure function of the multiset and
    SQL-replayable. ``hash_basis='md5'`` pins a DuckDB-computable
    base hash for the contract row (production default: xxhash64).
    NULLs are excluded (not an item).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    v = _cms_base_hash(F.col(value_col), hash_basis)
    src = df.filter(F.col(value_col).isNotNull()).select(v.alias("__x"))
    cells = src.select(
        F.explode(
            F.array(*_cms_cell_structs(F.col("__x"), depth, width, seed))
        ).alias("rb")
    )
    return cells.groupBy(
        F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches built with the SAME (depth, width,
    seed): element-wise cell sum — EXACTLY the sketch of the
    concatenated multisets (counter addition commutes, unlike HLL's
    register max this is even linear: deletions via negative slices
    work too). Property-pinned: estimates from merge(A, B) equal
    estimates from build(A ++ B) bit-for-bit."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("c").cast("long").alias("c"))


def cms_query(
    sketch: DataFrame,
    values: "list[str]",
    depth: int = 4,
    width: int = 1024,
    seed: int = 37,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch: for each
    value, min over its depth cells (absent cell = 0). The classic
    guarantee: estimate ≥ true count always, ≤ true + εN with
    probability 1 − (1/2)^depth for width = ⌈e/ε⌉ (property-tested:
    never under, overestimate bounded on a planted stream). The query
    relation is |values|·depth rows — broadcast-sized."""
    if not values:
        raise ValueError("values must be non-empty")
    vals = sketch.sparkSession.createDataFrame(
        [(v,) for v in values], ["item"]
    )
    x = _cms_base_hash(F.col("item"), hash_basis)
    probes = vals.select(
        "item",
        F.explode(
            F.array(*_cms_cell_structs(x, depth, width, seed))
        ).alias("rb"),
    ).select("item", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    joined = probes.join(sketch, ["r", "b"], "left").select(
        "item", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy("item").agg(
        F.min("c").cast("long").alias("est")
    )
