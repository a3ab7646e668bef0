"""Mergeable sketches — sketch each ingest slice ONCE, store the
summary beside the slice, and answer rollup questions by MERGING
summaries, never by re-scanning history (the only maintenance model
that survives 100 TB). Five families, one merge law each:

- distinct counts: HLL (ndv_rollup / merge_ndv_rollups /
  ndv_estimate) — merge = register-wise max, idempotent. Built on
  Spark's Apache DataSketches functions (hll_sketch_agg /
  hll_union_agg, Spark ≥ 3.5), the family the reference's
  approx_count_distinct maps to (SURVEY.md §2.5). HLL mergeability
  is EXACT by construction: registers are per-hash maxima, so
  sketch(A) ∪ sketch(B) has byte-for-byte the registers of
  sketch(A∪B) at the same lgConfigK (property-tested).
- point frequencies: Count-Min (cms_build / cms_merge / cms_query;
  per-group: cms_build_by_group / cms_merge_by_group /
  cms_query_by_group) — merge = linear cell sum.
- frequency tops: Misra-Gries (mg_summary / mg_merge; exact-recount
  heavy hitters via frequent_items; per-group: mg_summary_by_group /
  mg_merge_by_group / mg_heavy_hitters_by_group) — merge = counter
  add + one trim (Agarwal et al. 2012 "Mergeable Summaries" §3).
- quantiles: DDSketch (dds_build / dds_merge / dds_quantile;
  per-group: dds_build_by_group / dds_merge_by_group /
  dds_quantile_by_group) — merge = linear cell sum like CMS (bucket
  counters add), with the relative-error guarantee of Masson, Rim &
  Lee 2019.
- distinct samples: KMV / bottom-k (kmv_summary / kmv_merge /
  kmv_ndv / kmv_jaccard / kmv_set_stats; per-group: kmv_by_group /
  kmv_ndv_by_group / kmv_merge_by_group / kmv_pairwise_stats, the
  all-pairs overlap matrix) — merge = bottom-k of the summary union
  (Bar-Yossef et al. 2002; Beyer et al. 2007), which also answers
  set-operation questions (Jaccard, union/intersection NDV, both
  containments) no other family can.

Every family has a bounded-state streaming twin in
hdk_spark.streaming: stream_ndv_rollup / stream_cms /
stream_frequent_items / stream_dds / stream_kmv (sharded bottom-k
state, exact vs the batch summary regardless of micro-batch
splits) / stream_kmv_by_group (per-group bottom-k, the kmv_by_group
twin) / stream_frequent_items_by_group (per-(grp, shard) MG state,
the mg_summary_by_group twin) / stream_dds_by_group and
stream_cms_by_group (per-group counter cells as streaming
aggregation state — the linear-sketch twins)."""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame, functions as F

__all__ = ["ndv_rollup", "merge_ndv_rollups", "ndv_estimate",
           "frequent_items", "mg_summary", "mg_merge",
           "mg_heavy_hitters", "mg_summary_by_group", "mg_merge_by_group",
           "mg_heavy_hitters_by_group",
           "cms_build", "cms_merge", "cms_query",
           "cms_build_by_group", "cms_merge_by_group",
           "cms_query_by_group",
           "dds_build", "dds_merge", "dds_quantile",
           "dds_build_by_group", "dds_merge_by_group",
           "dds_quantile_by_group",
           "kmv_summary", "kmv_merge", "kmv_ndv", "kmv_jaccard",
           "kmv_set_stats", "kmv_by_group", "kmv_ndv_by_group",
           "kmv_merge_by_group", "kmv_pairwise_stats",
           "release_caches",
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
    heavy-hitter query is ``frequent_items`` (which recounts). The
    build is EAGER (one bounded count() action): the corpus is
    scanned once, the ≤ n_shards·(k+1)-row summary is cached, and the
    vocabulary-sized intermediate is released — repeated builds in a
    long-lived session retain only k-sized caches.

    Cache lifetime: the RETURNED summary stays persisted (its
    consumers — mg_merge, mg_heavy_hitters, the oracle replays — read
    it repeatedly), and distinct slices produce distinct plans, so
    the cache manager never dedupes them. A long-lived session
    building summaries over MANY slices should ``.unpersist()`` each
    returned summary once done with it; each entry is tiny
    (≤ n_shards·(k+1) rows) but the count is otherwise unbounded."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    src = df.select(F.col(value_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    # persisted: cnt feeds BOTH the trim relation and the per-shard
    # totals, and Spark's exchange reuse does not bridge the two
    # subtrees — un-persisted, building one summary scanned the corpus
    # twice (executed-plan-verified, 0 ReusedExchange). cnt is
    # distinct-(shard, item)-sized; persist() is MEMORY_AND_DISK, so a
    # huge vocabulary spills rather than OOMs, and one spilled pass
    # still beats two corpus scans + two identical shuffles. The cnt
    # cache is SCOPED TO THE BUILD: the summary (bounded, ≤
    # n_shards·(k+1) rows) is persisted and forced with one count() —
    # a bounded driver action, the trainer convention — then cnt is
    # released, so a session building summaries over many slices
    # retains only k-sized caches, never the vocabularies.
    cnt = (
        src.withColumn(
            "shard",
            F.pmod(
                _cms_base_hash(F.col("item"), hash_basis), F.lit(n_shards)
            ).cast("int"),
        )
        .groupBy("shard", "item")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    # ONE phase-1 pass computes BOTH trim ingredients: the salted
    # per-(shard, salt) top-(k+1) count lists for the rank-(k+1)
    # median (see _mg_trim_relation for the windowless argument) AND
    # the per-(shard, salt) partial totals for n_shard — so the build
    # keeps exactly two passes over the cached count relation (this
    # aggregation + the subtraction join), the same count the r11
    # window version had. phase1 is tiny (≤ n_shards·n_salts rows)
    # and build-scoped like cnt.
    kp1 = k + 1
    phase1 = (
        cnt.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("item")), F.lit(_MG_TRIM_SALTS))
            .cast("int"),
        )
        .groupBy("shard", "__salt")
        .agg(
            F.slice(F.array_sort(F.collect_list(-F.col("c"))), 1, kp1)
            .alias("tops"),
            F.sum("c").cast("long").alias("__s"),
        )
        .persist()
    )
    med_rel = _mg_median_from_tops(phase1, k)
    n_rel = phase1.groupBy("shard").agg(
        F.sum("__s").cast("long").alias("n_shard"))
    trimmed = _mg_subtract(cnt, med_rel)
    # outer toward the totals: an all-trimmed shard keeps its
    # accounting row (item NULL, cnt NULL, n_shard). RIGHT outer with
    # the broadcast hint on the LEFT (non-preserved) side — hinting
    # the preserved side of an outer join is silently ignored and
    # degrades to a sort-merge join with two extra exchanges
    summary = F.broadcast(trimmed).join(
        n_rel, "shard", "right"
    ).select("shard", "item", "cnt", "n_shard").persist()
    summary.count()
    phase1.unpersist()
    cnt.unpersist()
    return summary


#: salt fan-out for the two-phase per-shard top-(k+1): each phase-1
#: group holds ~distinct/(n_shards·salts) items, so no single task
#: ever sorts a whole shard's vocabulary (VERDICT r11 #3)
_MG_TRIM_SALTS = 64


def _mg_trim_relation(
    cnt: DataFrame, k: int, n_salts: int = _MG_TRIM_SALTS
) -> DataFrame:
    """One MG trim over a (shard, item, c) count relation — the shared
    tail of mg_summary and mg_merge (one fix reaches both, and both
    stay textually aligned with the contract oracles). Subtracts the
    (k+1)-th largest count VALUE per shard under the total order
    (c desc, item asc) and drops non-positives; callers attach their
    own n_shard accounting (exact Σc for mg_summary, the summed input
    n_shards for mg_merge — the merged counters are already
    undercounts, so Σc would lie there). Returns (shard, item, cnt).

    The rank-(k+1) value is found WITHOUT any Window over the count
    relation (the r11 version row_numbered each whole shard through
    one window partition — a vocabulary-sized single-task sort at
    lake scale). Two-phase instead, the kmv_summary partial-then-
    merge shape: items salt into ``n_salts`` sub-groups per shard and
    each (shard, salt) group keeps only its top-(k+1) structs
    (bounded aggregation: the global rank-(k+1) row is necessarily
    within its own sub-group's top-(k+1), since fewer than k+1 rows
    can precede it anywhere); the ≤ n_salts·(k+1) survivors per shard
    merge in one tiny aggregation to the exact median value. The
    resulting ≤ n_shards-row relation broadcast-joins back for the
    subtraction — the corpus-sized side never sorts, never windows.
    Phase-1 buffers hold ~distinct/(n_shards·n_salts) items; raise
    ``n_salts`` for billion-item vocabularies. (mg_summary inlines
    this same pipeline to fold its n_shard totals into the phase-1
    pass — one fewer traversal of its cached count relation; the
    pieces are shared as _mg_median_from_tops/_mg_subtract so the
    arithmetic cannot drift apart.)"""
    kp1 = k + 1
    # bare negated counts, not (c, item) structs: the rank-(k+1)
    # VALUE depends only on the MULTISET of counts (any tie-break
    # permutes equal values without moving the value at a rank), so
    # the r11 row_number's (c desc, item asc) order and this
    # ascending-(-c) order put the same c at rank k+1 — bit-identical
    # output, and the aggregation ships longs instead of structs
    part = (
        cnt.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("item")), F.lit(n_salts)).cast("int"),
        )
        .groupBy("shard", "__salt")
        .agg(
            F.slice(F.array_sort(F.collect_list(-F.col("c"))), 1, kp1)
            .alias("tops")
        )
    )
    return _mg_subtract(cnt, _mg_median_from_tops(part, k))


def _mg_median_from_tops(part: DataFrame, k: int) -> DataFrame:
    """Merge per-(shard, salt) negated top-(k+1) count lists to the
    exact per-shard rank-(k+1) value: explode the ≤ n_salts·(k+1)
    survivors, one tiny aggregation, pick element k+1. Returns
    (shard, __med), ≤ n_shards rows — shards with < k+1 distinct
    items emit no row (their trim subtracts 0)."""
    kp1 = k + 1
    return (
        part.select("shard", F.explode("tops").alias("nc"))
        .groupBy("shard")
        .agg(F.array_sort(F.collect_list("nc")).alias("tops"))
        .filter(F.size("tops") >= kp1)
        .select(
            "shard",
            (-F.element_at("tops", kp1)).cast("long").alias("__med"),
        )
    )


def _mg_subtract(cnt: DataFrame, med_rel: DataFrame) -> DataFrame:
    """The MG trim's subtraction: broadcast the ≤ n_shards-row median
    relation onto the count relation, subtract, drop non-positives —
    the corpus-sized side never sorts, never shuffles for this."""
    return (
        cnt.join(F.broadcast(med_rel), "shard", "left")
        .select(
            "shard", "item",
            (F.col("c") - F.coalesce(F.col("__med"), F.lit(0)))
            .cast("long").alias("cnt"),
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
    already-trimmed mass, a smaller one tightens the summary.

    Cache lifetime: the tagged input union is persisted (bounded, ≤
    inputs·(k+1) rows per shard) and the returned lazy plan reads it;
    after materializing, release it with ``release_caches(result)`` —
    unpersisting the inputs is a no-op (Dataset.unpersist is
    non-cascading), the same defect the by-group twins fixed."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not summaries:
        raise ValueError("mg_merge needs at least one input")
    # each input is consumed by BOTH the counter union and the totals
    # union; tagging rows with their input index and persisting the
    # single tagged union makes every input's lineage run ONCE (an
    # in-lineage mg_summary input would otherwise re-scan its corpus
    # per consumer). The tag also keeps per-input totals distinct
    # BEFORE summing — two inputs whose shard happens to carry the
    # same n_shard value must contribute it twice.
    u = summaries[0].select(
        "shard", "item", "cnt", "n_shard", F.lit(0).alias("__src"))
    for i, s in enumerate(summaries[1:], start=1):
        u = u.unionByName(s.select(
            "shard", "item", "cnt", "n_shard", F.lit(i).alias("__src")))
    # bounded: ≤ inputs·(k+1) rows per shard; ownership-aware persist
    # (repeat calls share one refcounted entry — see _persist_internal)
    u, _own = _persist_internal(u)
    merged = (
        u.filter(F.col("item").isNotNull())  # accounting rows
        .groupBy("shard", "item")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
    n_rel = (
        u.select("shard", "n_shard", "__src").distinct()
        .groupBy("shard")
        .agg(F.sum("n_shard").cast("long").alias("n_shard"))
    )
    # same right-outer + build-left broadcast as mg_summary
    return _attach_caches(
        F.broadcast(_mg_trim_relation(merged, k)).join(
            n_rel, "shard", "right"
        ).select("shard", "item", "cnt", "n_shard"),
        _own,
    )


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

    COMPLETENESS PRECONDITION (r11 review): only LISTED items are
    scored, and MG guarantees an item survives its shard's trim only
    when its true count > n_shard/(k+1) — so "no true φ-heavy item is
    missed" holds iff φ·N > n_s/(k+1) for every shard s (pick k ≥
    max_s n_s/(φ·N); with even hash sharding n_s ≈ N/n_shards, i.e.
    k ≥ 1/(φ·n_shards) suffices with margin). Below that, a fully-
    trimmed item whose slack-only upper bound clears φ·N is silently
    absent — the summary's honest limit (test-pinned both ways:
    guarantee above the threshold, documented miss below it).

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
    stats_mg_heavy_hitters).

    Cache lifetime: the bounded summary is persisted for its three
    subtrees and the returned lazy plan reads it; after
    materializing, ``release_caches(result)`` frees it — the same
    discipline as the by-group twin. When the CALLER already cached
    the summary (mg_summary returns a persisted frame), that cache is
    reused and nothing is attached — release_caches(result) returns 0
    and never clobbers a caller-owned cache."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    # three consumers (totals, slack, items) — persist the bounded
    # summary so an in-lineage input's corpus derivation runs once;
    # when the caller already cached it (mg_summary returns a
    # persisted frame by contract) reuse THEIR cache and attach
    # nothing, so release_caches(result) can never clobber it
    summary, _own = _persist_internal(
        summary.select("shard", "item", "cnt", "n_shard"))
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
    return _attach_caches(
        scored.filter(F.col("__up") >= F.col("__thr"))
        .select("item", "cnt_lower", "cnt_upper", "certain")
        .orderBy(F.desc("cnt_lower"), "item"),
        _own,
    )


def release_caches(df: DataFrame) -> int:
    """Unpersist the bounded INTERNAL relations a sketch query
    operator persisted while building ``df``'s plan, returning how
    many were actually unpersisted. The query operators with lazy
    returns (kmv_jaccard, kmv_set_stats, kmv_pairwise_stats, mg_merge,
    mg_heavy_hitters, dds_quantile, mg_merge_by_group,
    mg_heavy_hitters_by_group,
    dds_quantile_by_group) persist derived projections their multiple
    subtrees share; ``input.unpersist()`` cannot release those —
    Dataset.unpersist is non-cascading and matches only the exact
    cached plan, so the documented discipline needs THIS entry point:
    materialize the result, then ``release_caches(result)``. Must be
    called on the very frame the operator returned (derived frames —
    ``.orderBy(...)`` etc. — do not carry the cache list). Safe to
    call twice; returns 0 for frames without attached caches.

    Internal caches are REFERENCE-COUNTED: Spark's cache manager is
    plan-keyed, so two calls of the same operator on the same input
    share one physical cache entry. Each result frame holds one
    reference; releasing one result decrements, and the entry is
    unpersisted only when its last referencing result is released —
    releasing result A never drops a cache an unmaterialized result B
    still reads (r14 review). The read-and-clear of the attached list
    is atomic under the registry lock, so two concurrent releases of
    the SAME result frame decrement once, not twice."""
    with _CACHE_REG_LOCK:
        caches = tuple(getattr(df, "_hdk_caches", ()))
        try:
            df._hdk_caches = ()
        except AttributeError:  # pragma: no cover - defensive
            pass
    released = 0
    for c in caches:
        try:
            key = c.semanticHash()
        except Exception:  # pragma: no cover - session died under the
            continue  # result; its JVM cache died with it — nothing to free
        free = True
        with _CACHE_REG_LOCK:
            ents = _CACHE_REGISTRY.get(key, [])
            for ent in ents:
                if ent[0]() is c:
                    ent[1] -= 1
                    free = ent[1] <= 0
                    if free:
                        ents.remove(ent)
                        if not ents:
                            del _CACHE_REGISTRY[key]
                    break
        if free:  # last reference (or a pre-registry frame, defensively)
            try:
                c.unpersist()
                released += 1
            except Exception:  # pragma: no cover - defensive
                pass
    return released


def _attach_caches(df: DataFrame, caches) -> DataFrame:
    """Record the internal persisted relations on the returned frame
    so :func:`release_caches` can free them after materialization."""
    df._hdk_caches = tuple(caches)
    return df


# semanticHash -> [[weakref(frame), refcount], ...] for operator-owned
# internal caches (a short list per key tolerates hash collisions;
# sameSemantics disambiguates). WEAK references: the strong refs live
# in the results' _hdk_caches, so when every result of an entry is
# garbage-collected without release_caches, the entry dies with them
# and is pruned on the next same-key pass — the registry never pins
# frames (or their sessions) for the process lifetime. The lock guards
# dict/refcount mutation only; JVM roundtrips happen outside it.
_CACHE_REGISTRY: dict[int, list] = {}
_CACHE_REG_LOCK = threading.Lock()


def _persist_internal(df: DataFrame) -> "tuple[DataFrame, tuple]":
    """Persist an operator-internal multi-consumer relation and return
    (frame, caches-to-attach), deciding OWNERSHIP — who may unpersist
    it (r14 review):

    - Plan already in the operator-owned registry: an earlier operator
      call created it (Spark's cache manager is plan-keyed, so a
      repeat call would otherwise see its own cache as 'already
      cached' and attach nothing, leaving the first call's entry
      unreleasable once the caller keeps only the newest result).
      The refcount is bumped and the SAME frame re-attached, so every
      result holds a releasable reference and the entry survives until
      the last one is released.
    - Plan cached but NOT in the registry: the CALLER cached it (even
      a derived no-op projection canonicalizes to the cached input
      plan), or an earlier result was dropped without release and its
      weak registration died with it. Either way: reuse it and attach
      NOTHING — release_caches(result) must never clobber a
      possibly-caller-owned cache. An orphaned cache therefore stays
      for the session and is simply REUSED by later identical calls
      (never duplicated — the cache manager is plan-keyed), which is
      the bounded steady state for callers that skip the release
      discipline.
    - Otherwise: persist, register with refcount 1, attach.

    Sharing is scoped to ONE SparkSession (identity-compared): plans
    from different sessions can canonicalize equal, but handing back a
    frame bound to another session would be wrong. The identity check
    is what excludes a stale frame after a session restart — measured
    on Spark 4.1.2 classic, a STOPPED session's frame still ANSWERS
    metadata calls (storageLevel/semanticHash read JVM-side state;
    only deriving or executing raises), so exception-based eviction
    would never fire; the try/except is defensive only. Stale entries
    leave the registry when their last referencing result is
    garbage-collected (weak references) or released.

    Concurrency: candidate probing (sameSemantics — a JVM roundtrip)
    runs OUTSIDE the lock against a snapshot; the increment re-checks
    the entry is still registered with a live count. Two threads that
    race to persist the same new plan converge on one entry: the
    loser's persist() is a plan-keyed no-op on the winner's cache, and
    the post-persist re-scan under the lock folds the loser into the
    winner's entry instead of double-registering."""
    key = df.semanticHash()
    with _CACHE_REG_LOCK:
        snapshot = list(_CACHE_REGISTRY.get(key, ()))
    match = None
    for ent in snapshot:
        cand = ent[0]()
        if cand is None:
            continue  # GC'd — pruned under the lock below
        try:
            if (cand.sparkSession is df.sparkSession
                    and cand.sameSemantics(df)):
                match = (ent, cand)
                break
        except Exception:  # dead session: unusable, skip
            continue
    with _CACHE_REG_LOCK:
        ents = _CACHE_REGISTRY.get(key, [])
        ents[:] = [e for e in ents if e[0]() is not None]  # prune GC'd
        if (match is not None
                and any(e is match[0] for e in ents)
                and match[0][1] > 0):
            match[0][1] += 1
            return match[1], (match[1],)
        if not ents:
            _CACHE_REGISTRY.pop(key, None)
    if df.storageLevel.useMemory or df.storageLevel.useDisk:
        return df, ()  # caller-owned cache: reuse, never attach
    df = df.persist()
    with _CACHE_REG_LOCK:
        ents = _CACHE_REGISTRY.setdefault(key, [])
        for ent in ents:  # lost a persist race? fold into the winner
            cand = ent[0]()
            try:
                if (cand is not None and ent[1] > 0
                        and cand.sparkSession is df.sparkSession
                        and cand.sameSemantics(df)):
                    ent[1] += 1
                    return cand, (cand,)
            except Exception:  # pragma: no cover - defensive
                continue
        ents.append([weakref.ref(df), 1])
    return df, (df,)


def _grp_key(grp_col):
    """Injective NOT-NULL join key for a nullable group column: SQL
    equi-joins never match NULL = NULL, so any per-group operator
    that JOINS its derived relations back on grp would silently drop
    the NULL group's rows (the kept-per-SQL-GROUP-BY group). "n" for
    the NULL group, "v:" + value otherwise — prefixes disjoint, so no
    value collides with the NULL marker."""
    return F.when(grp_col.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v:"), grp_col))


def mg_summary_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 100,
    n_shards: int = 8,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """Per-GROUP one-round Misra-Gries summary — "top terms per
    domain / hot items per source" as a stored, mergeable relation,
    completing the per-group sketch trilogy (kmv_by_group distincts,
    dds_*_by_group quantiles, now frequency tops). Each group's rows
    ARE :func:`mg_summary` of that group's values with grp attached —
    identical sharding (by ITEM hash; grp does not enter the shard),
    exact per-(grp, shard) counts, ONE trim via the salted windowless
    two-phase median, the same NULL-item accounting rows per (grp,
    shard), and the same MG guarantees per group. NULL values
    excluded; NULL GROUPS kept (SQL GROUP BY). Returns (grp, shard,
    item, cnt, n_shard), ≤ k item rows per (grp, shard); eager build
    with the mg_summary cache discipline (count intermediates
    released, only the bounded summary retained — unpersist() it per
    slice in long-lived sessions).

    Scale note vs the global form: every derived relation here is
    groups-scaled, so the median/accounting joins keep their
    (grp, shard) equi-keys WITHOUT forced broadcasts (the
    dds_quantile_by_group precedent) — AQE may still broadcast small
    ones. The build transiently persists TWO relations (the distinct
    count relation AND the fused phase-1) before releasing both, so
    at a billion-(grp, item) vocabulary the transient cache is ~2×
    the global form's; both are MEMORY_AND_DISK, so overflow spills
    rather than evicting or failing."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    src = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("string").alias("item"),
    ).filter(F.col("item").isNotNull())
    # __gk: injective not-null group key — every derived relation
    # joins back on it so the NULL group (kept per SQL GROUP BY)
    # survives the equi-joins; grp rides along for output
    cnt = (
        src.withColumn(
            "shard",
            F.pmod(
                _cms_base_hash(F.col("item"), hash_basis), F.lit(n_shards)
            ).cast("int"),
        )
        .withColumn("__gk", _grp_key(F.col("grp")))
        .groupBy("__gk", "grp", "shard", "item")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    # fused phase 1 (the mg_summary shape, keyed by (group, shard,
    # salt)): top-(k+1) negated count lists AND partial totals in one
    # pass over the cached count relation
    kp1 = k + 1
    phase1 = (
        cnt.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("item")), F.lit(_MG_TRIM_SALTS))
            .cast("int"),
        )
        .groupBy("__gk", "grp", "shard", "__salt")
        .agg(
            F.slice(F.array_sort(F.collect_list(-F.col("c"))), 1, kp1)
            .alias("tops"),
            F.sum("c").cast("long").alias("__s"),
        )
        .persist()
    )
    med_rel = (
        phase1.select("__gk", "shard", F.explode("tops").alias("nc"))
        .groupBy("__gk", "shard")
        .agg(F.array_sort(F.collect_list("nc")).alias("tops"))
        .filter(F.size("tops") >= kp1)
        .select(
            "__gk", "shard",
            (-F.element_at("tops", kp1)).cast("long").alias("__med"),
        )
    )
    n_rel = phase1.groupBy("__gk", "grp", "shard").agg(
        F.sum("__s").cast("long").alias("n_shard"))
    trimmed = (
        cnt.join(med_rel, ["__gk", "shard"], "left")
        .select(
            "__gk", "shard", "item",
            (F.col("c") - F.coalesce(F.col("__med"), F.lit(0)))
            .cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    summary = trimmed.join(n_rel, ["__gk", "shard"], "right").select(
        "grp", "shard", "item", "cnt", "n_shard").persist()
    summary.count()
    phase1.unpersist()
    cnt.unpersist()
    return summary


def mg_merge_by_group(*summaries: DataFrame, k: int = 100) -> DataFrame:
    """Combine :func:`mg_summary_by_group` relations from corpus
    SLICES into per-group summaries of the union without re-reading
    rows — :func:`mg_merge`'s arithmetic with grp carried through
    every key: per-(grp, shard, item) counter ADD over the bounded
    tagged union, ONE trim per (grp, shard) (the same windowless
    two-phase median), n_shard accounting summed per input via the
    __src tag, NULL-item accounting rows preserved so all-trimmed
    (grp, shard) cells keep their volume. Groups missing from one
    slice pass through. Same per-group guarantees as mg_merge's
    global ones; same k/basis discipline.

    Cache lifetime (the mg_summary discipline): the tagged union of
    the inputs stays persisted — bounded at ≤ Σ inputs' rows (each
    ≤ groups·shards·(k+1)) — because the RETURNED plan is lazy and
    reads it from several sub-relations. Unpersisting the consumed
    input summaries cannot release this internal relation: long-lived
    sessions merging many slices should materialize the result, then
    ``release_caches(result)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not summaries:
        raise ValueError("mg_merge_by_group needs at least one input")
    u = summaries[0].select(
        "grp", "shard", "item", "cnt", "n_shard", F.lit(0).alias("__src"))
    for i, s in enumerate(summaries[1:], start=1):
        u = u.unionByName(s.select(
            "grp", "shard", "item", "cnt", "n_shard",
            F.lit(i).alias("__src")))
    # bounded: ≤ inputs·(k+1) rows per (grp, shard); __gk for the
    # NULL-group-safe joins (see _grp_key)
    u, _own = _persist_internal(
        u.withColumn("__gk", _grp_key(F.col("grp"))))
    merged = (
        u.filter(F.col("item").isNotNull())
        .groupBy("__gk", "shard", "item")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
    n_rel = (
        u.select("__gk", "grp", "shard", "n_shard", "__src").distinct()
        .groupBy("__gk", "grp", "shard")
        .agg(F.sum("n_shard").cast("long").alias("n_shard"))
    )
    kp1 = k + 1
    part = (
        merged.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("item")), F.lit(_MG_TRIM_SALTS))
            .cast("int"),
        )
        .groupBy("__gk", "shard", "__salt")
        .agg(
            F.slice(F.array_sort(F.collect_list(-F.col("c"))), 1, kp1)
            .alias("tops")
        )
    )
    med_rel = (
        part.select("__gk", "shard", F.explode("tops").alias("nc"))
        .groupBy("__gk", "shard")
        .agg(F.array_sort(F.collect_list("nc")).alias("tops"))
        .filter(F.size("tops") >= kp1)
        .select(
            "__gk", "shard",
            (-F.element_at("tops", kp1)).cast("long").alias("__med"),
        )
    )
    trimmed = (
        merged.join(med_rel, ["__gk", "shard"], "left")
        .select(
            "__gk", "shard", "item",
            (F.col("c") - F.coalesce(F.col("__med"), F.lit(0)))
            .cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    return _attach_caches(
        trimmed.join(n_rel, ["__gk", "shard"], "right").select(
            "grp", "shard", "item", "cnt", "n_shard"),
        _own,
    )


def mg_heavy_hitters_by_group(
    summary: DataFrame, phi: float, k: int
) -> DataFrame:
    """φ-heavy-hitter QUERY per group over an
    :func:`mg_summary_by_group` relation — :func:`mg_heavy_hitters`'
    bounds with every aggregate scoped to the group: N becomes each
    GROUP's total volume (Σ its shards' n_shard, exact via the
    accounting rows), slack is per (grp, shard), and the φ·N_grp
    thresholds ask "heavy within its group" — hot items per domain,
    not hot globally. Same completeness precondition per group
    (φ·N_grp > n_{grp,shard}/(k+1)); pass the SAME k the summaries
    were built/merged with. Summary-sized arithmetic only; no forced
    broadcasts (groups-scaled sides). Returns (grp, item, cnt_lower,
    cnt_upper, certain) ordered per group.

    Cache lifetime (the mg_summary discipline): the keyed input
    summary stays persisted — bounded, ≤ groups·shards·(k+1) rows —
    because the RETURNED plan is lazy and reads it for totals, slack
    AND the score join. Unpersisting the input summary cannot release
    this keyed derivation: long-lived sessions issuing many queries
    should materialize the result, then ``release_caches(result)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    # __gk: NULL-group-safe join key (see _grp_key)
    summary, _own = _persist_internal(
        summary.withColumn("__gk", _grp_key(F.col("grp"))))
    totals = summary.select("__gk", "shard", "n_shard").distinct()
    n_grp = totals.groupBy("__gk").agg(
        F.sum("n_shard").cast("long").alias("n"))
    slack = (
        summary.groupBy("__gk", "shard")
        .agg(
            F.floor(
                (F.max("n_shard") - F.coalesce(F.sum("cnt"), F.lit(0)))
                / F.lit(k + 1)
            ).cast("long").alias("__slack")
        )
    )
    items = summary.filter(F.col("item").isNotNull())
    scored = (
        items.join(slack, ["__gk", "shard"])
        .join(n_grp, "__gk")
        .select(
            "grp", "item",
            F.col("cnt").alias("cnt_lower"),
            (F.col("cnt") + F.col("__slack")).alias("cnt_upper"),
            (F.col("cnt").cast("double") >= F.lit(phi) * F.col("n"))
            .alias("certain"),
            (F.col("cnt") + F.col("__slack")).cast("double").alias("__up"),
            (F.lit(phi) * F.col("n")).alias("__thr"),
        )
    )
    out = (
        scored.filter(F.col("__up") >= F.col("__thr"))
        .select("grp", "item", "cnt_lower", "cnt_upper", "certain")
        .orderBy("grp", F.desc("cnt_lower"), "item")
    )
    return _attach_caches(out, _own)


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


def cms_build_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 37,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """Per-GROUP Count-Min sketch: (grp, r, b, c) cells — "how often
    did X appear WITHIN group Y" as a stored, mergeable relation,
    completing the per-group sketch matrix (KMV distincts, DDS
    quantiles, MG tops, now CMS point frequencies). Same build shape
    as :func:`cms_build` (one map-side explode of depth cells + ONE
    partial-agg groupBy, no join, no window) with grp in the
    aggregation key; each group's cells ARE the cms_build of that
    group's values with grp attached (row-for-row law,
    property-tested), so per-group state is bounded at
    ≤ depth·width cells per group regardless of the group's
    cardinality. NULL values excluded (not an item); NULL GROUPS
    kept (SQL GROUP BY), like the other per-group builds."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    v = _cms_base_hash(F.col(value_col), hash_basis)
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("grp"), v.alias("__x"))
    cells = src.select(
        "grp",
        F.explode(
            F.array(*_cms_cell_structs(F.col("__x"), depth, width, seed))
        ).alias("rb"),
    )
    return cells.groupBy(
        "grp", F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))


def cms_merge_by_group(*sketches: DataFrame) -> DataFrame:
    """Merge :func:`cms_build_by_group` relations built with the SAME
    (depth, width, seed): element-wise cell sum per (grp, r, b) —
    exactly the per-group sketch of the concatenated multisets
    (linear counters, deletions via negative slices work too).
    Groups missing from one slice pass through."""
    if not sketches:
        raise ValueError("cms_merge_by_group needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("grp", "r", "b").agg(
        F.sum("c").cast("long").alias("c"))


def cms_query_by_group(
    sketch: DataFrame,
    values: "list[str] | DataFrame",
    depth: int = 4,
    width: int = 1024,
    seed: int = 37,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates PER GROUP from a
    :func:`cms_build_by_group` relation: every probe value is
    estimated against EVERY group in the sketch (min over its depth
    cells; absent cell = 0) — "how often does token X appear per
    domain" from the stored cells alone. The probe relation is
    groups·|values|·depth rows (bounded; the group list comes from
    one distinct over the sketch) and the cell lookup is an equi-join
    on the injective NULL-safe group key + (r, b) — no forced
    broadcast (groups-scaled sides, the per-group family's standing
    call). Same ≥-true / ≤ true + εN_grp guarantee per group, with
    N_grp the GROUP's volume. Returns (grp, item, est).

    ``values`` is either a Python list (small probe sets inline as a
    literal relation) or a DataFrame whose FIRST column holds the
    probe items (probe sets too large to ship as literals — e.g. a
    stored vocabulary or a top-terms relation; VERDICT r13 #5,
    mirroring vocab_coverage's two paths). The DataFrame path
    deduplicates and drops NULL probes, then runs the IDENTICAL cell
    arithmetic — the two paths are property-tested bit-equal."""
    if isinstance(values, DataFrame):
        # positional toDF rename, not F.col/df[name]: a first column
        # whose name contains a dot would otherwise resolve as a
        # struct-field path and fail analysis (r14 review; both
        # accessors dot-parse in Spark 4)
        vals = (
            values.toDF(*[f"_c{i}" for i in range(len(values.columns))])
            .select(F.col("_c0").cast("string").alias("item"))
            .filter(F.col("item").isNotNull())
            .dropDuplicates(["item"])
        )
        # same loud failure as the literal path: an upstream probe
        # relation that came up empty (or all-NULL) must not return a
        # silently empty answer — the one eager action here is a
        # limit-1 probe of a relation the caller sized to be a probe
        # set, not a corpus
        if vals.isEmpty():
            raise ValueError("values must be non-empty")
    else:
        if not values:
            raise ValueError("values must be non-empty")
        vals = sketch.sparkSession.createDataFrame(
            [(v,) for v in values], ["item"])
    groups = sketch.select(
        _grp_key(F.col("grp")).alias("__gk"), "grp").distinct()
    x = _cms_base_hash(F.col("item"), hash_basis)
    probes = groups.crossJoin(vals).select(
        "__gk", "grp", "item",
        F.explode(
            F.array(*_cms_cell_structs(x, depth, width, seed))
        ).alias("rb"),
    ).select("__gk", "grp", "item",
             F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    keyed = sketch.select(
        _grp_key(F.col("grp")).alias("__gk"), "r", "b", "c")
    joined = probes.join(keyed, ["__gk", "r", "b"], "left").select(
        "__gk", "grp", "item",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    return joined.groupBy("__gk", "grp", "item").agg(
        F.min("c").cast("long").alias("est")
    ).select("grp", "item", "est")


def _dds_cells(x, m: int):
    """(b, j) bucket coordinates of a POSITIVE double under the
    binary-interpolated DDSketch mapping: b is the exact binary
    exponent (2^b ≤ x < 2^(b+1)), j = ⌊(x/2^b − 1)·m⌋ subdivides the
    binade into m linear sub-buckets. Every step after the log2 seed
    is EXACT IEEE-double arithmetic when m is a power of two
    (division by 2^b, subtract-1 inside [1,2), multiply by m), and
    the log2 seed's ±1-ulp platform wiggle is repaired by exact
    power-of-two comparisons — so the cell is a pure function of the
    input BITS, identical in Spark and DuckDB (the determinism that
    lets contract oracles replay the sketch cell-for-cell, where the
    paper's γ-logarithm mapping would disagree across libm builds).
    Max relative bucket half-width: 1/(2m + 2j) ≤ 1/(2m)."""
    b0 = F.floor(F.log2(x))
    b = (
        F.when(F.pow(F.lit(2.0), b0 + 1) <= x, b0 + 1)
        .when(F.pow(F.lit(2.0), b0) > x, b0 - 1)
        .otherwise(b0)
    ).cast("long")
    j = F.floor((x / F.pow(F.lit(2.0), b) - F.lit(1.0)) * F.lit(float(m)))
    return b, j.cast("long")


def dds_build(df: DataFrame, value_col: str, m: int = 64) -> DataFrame:
    """DDSketch (Masson, Rim & Lee 2019, "DDSketch: a fast and
    fully-mergeable quantile sketch with relative-error guarantees")
    of a numeric column as a RELATION: (store, b, j, c) bucket
    counters — the mergeable QUANTILE summary completing the repo's
    merge-not-rescan family (HLL distincts, CMS frequencies, MG tops;
    store one per ingest slice, answer percentile questions over any
    slice union without re-reading rows). Build is ONE map-only
    projection + ONE partial-agg groupBy — no join, no window.

    Mapping: the paper's log-γ index is replaced by the
    binary-interpolated variant (binade exponent + m linear
    sub-buckets, see _dds_cells) so the cell is bit-deterministic
    across engines; relative error ≤ 1/(2m) (~0.78% at the default
    m=64), property-tested. store ∈ {-1, 0, 1} routes negatives to a
    mirrored store and zeros to a dedicated bucket (the paper's
    two-store extension); NULLs are excluded. NaN and ±Infinity are
    DROPPED explicitly (the same stated-drop policy as the similarity
    kernels' wrong-width vectors): NaN fails every sign comparison and
    would silently land in the ZERO bucket, ±Inf would floor an
    infinite log2 seed into a garbage binade — neither has a
    meaningful quantile rank, and a lake column with sensor glitches
    must not corrupt the summary (test-pinned). m must be a power of
    two — that is what makes the sub-bucket arithmetic exact."""
    if m < 1 or (m & (m - 1)) != 0:
        raise ValueError(f"m must be a power of two >= 1, got {m}")
    x = F.col(value_col).cast("double")
    ax = F.abs(x)
    b, j = _dds_cells(ax, m)
    finite = (
        x.isNotNull() & ~F.isnan(x)
        & (ax != F.lit(float("inf")))
    )
    src = df.filter(finite).select(
        F.when(x > 0, F.lit(1)).when(x < 0, F.lit(-1)).otherwise(F.lit(0))
        .cast("int").alias("store"),
        F.when(x == 0, F.lit(0)).otherwise(b).cast("long").alias("b"),
        F.when(x == 0, F.lit(0)).otherwise(j).cast("long").alias("j"),
    )
    return src.groupBy("store", "b", "j").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def dds_merge(*sketches: DataFrame) -> DataFrame:
    """Merge DDSketches built with the SAME m: element-wise bucket
    sum — EXACTLY the sketch of the concatenated multisets (the
    counters are plain counts, so like cms_merge this is linear and
    the merged sketch is bit-for-bit the single-pass build;
    property-tested). The error bound never degrades under merging —
    the 'fully mergeable' property of the paper's title."""
    if not sketches:
        raise ValueError("dds_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("store", "b", "j").agg(
        F.sum("c").cast("long").alias("c")
    )


def dds_quantile(
    sketch: DataFrame, qs: "list[float]", m: int = 64
) -> DataFrame:
    """Quantile QUERY over a DDSketch relation: for each q the bucket
    holding global rank ⌊q·(n−1)⌋+1 in value order (negative store
    descending-magnitude first, then zeros, then positive ascending),
    answered with the bucket midpoint — relative error ≤ 1/(2m) for
    any q, any merge history. Pure sketch-sized arithmetic: one
    cumulative window and one theta join of the |qs|-row literal
    relation against the bounded bucket relation (≤ stores·binades·m
    rows regardless of data volume — THIS is why it scales; the
    corpus is never touched). The sketch relation is consumed by
    THREE subtrees (cumulative walk, total count, rank targets), so
    it is persisted here — bounded rows, and without it an IN-LINEAGE
    sketch re-derives its corpus aggregation once per subtree (the
    un-persisted static plan carried FOUR corpus scans, plan-pinned
    down to one; stored/parquet sketches only re-read kilobytes, but
    the persist is still strictly cheaper). Returns (q, est, n),
    ordered by q; an EMPTY sketch answers (q, NULL, 0) — no data has
    no quantiles, but the row shape stays stable (test-pinned).

    Cache lifetime: the bounded sketch is persisted for its three
    subtrees and the returned lazy plan reads it; after
    materializing, ``release_caches(result)`` frees it — unpersisting
    the input sketch cannot (non-cascading), matching the by-group
    twin's discipline. When the caller already cached the sketch,
    that cache is reused and nothing is attached —
    release_caches(result) returns 0 and never clobbers a
    caller-owned cache."""
    if m < 1 or (m & (m - 1)) != 0:
        raise ValueError(f"m must be a power of two >= 1, got {m}")
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    from pyspark.sql.window import Window

    # an already-persisted input must not become OUR releasable cache:
    # reuse the caller's cache and attach nothing (see _persist_internal)
    sketch, _own = _persist_internal(sketch.select("store", "b", "j", "c"))
    ordered = sketch.select(
        "store", "b", "j", "c",
        F.when(F.col("store") == -1, -F.col("b")).otherwise(F.col("b"))
        .alias("__kb"),
        F.when(F.col("store") == -1, -F.col("j")).otherwise(F.col("j"))
        .alias("__kj"),
    )
    w = (
        Window.orderBy("store", "__kb", "__kj")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ordered.select(
        "store", "b", "j", "c", F.sum("c").over(w).alias("__cum")
    )
    n_total = sketch.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"))
    qrel = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q: double"
    )
    targets = qrel.crossJoin(F.broadcast(n_total)).select(
        "q", "n",
        (F.floor(F.col("q") * (F.col("n") - 1)) + 1).alias("__tgt"),
    )
    est = (
        F.when(F.col("store") == 0, F.lit(0.0))
        .otherwise(
            F.col("store")
            * F.pow(F.lit(2.0), F.col("b"))
            * (F.lit(1.0) + (F.col("j") + F.lit(0.5)) / F.lit(float(m)))
        )
    )
    hit = targets.join(
        F.broadcast(cum),
        (F.col("__cum") >= F.col("__tgt"))
        & (F.col("__cum") - F.col("c") < F.col("__tgt")),
        "left",
    )
    return _attach_caches(
        hit.select(
            "q", F.round(est, 6).alias("est"),
            F.col("n").cast("long").alias("n")
        ).orderBy("q"),
        _own,
    )


def dds_build_by_group(
    df: DataFrame, group_col: str, value_col: str, m: int = 64
) -> DataFrame:
    """Per-GROUP DDSketch: (grp, store, b, j, c) bucket counters —
    MERGEABLE per-group quantiles, which ``approx_percentile`` with a
    GROUP BY cannot give you (its digests are per-query; these
    relations are stored per ingest slice and merged with
    ``dds_merge_by_group`` without re-reading rows — the per-group
    member of the merge-not-rescan family, joining kmv_by_group).
    Same build shape as :func:`dds_build` (ONE map-only projection +
    ONE partial-agg groupBy, no join, no window), same
    bit-deterministic binary-interpolated mapping, same NaN/±Inf drop
    gate and relative-error bound ≤ 1/(2m) per group. Each group's
    rows ARE the dds_build of that group's values with grp attached
    (row-for-row law, property-tested). NULL values excluded; NULL
    GROUPS kept (SQL GROUP BY), like kmv_by_group."""
    if m < 1 or (m & (m - 1)) != 0:
        raise ValueError(f"m must be a power of two >= 1, got {m}")
    x = F.col(value_col).cast("double")
    ax = F.abs(x)
    b, j = _dds_cells(ax, m)
    finite = (
        x.isNotNull() & ~F.isnan(x)
        & (ax != F.lit(float("inf")))
    )
    src = df.filter(finite).select(
        F.col(group_col).cast("string").alias("grp"),
        F.when(x > 0, F.lit(1)).when(x < 0, F.lit(-1)).otherwise(F.lit(0))
        .cast("int").alias("store"),
        F.when(x == 0, F.lit(0)).otherwise(b).cast("long").alias("b"),
        F.when(x == 0, F.lit(0)).otherwise(j).cast("long").alias("j"),
    )
    return src.groupBy("grp", "store", "b", "j").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def dds_merge_by_group(*sketches: DataFrame) -> DataFrame:
    """Merge :func:`dds_build_by_group` relations built with the SAME
    m: element-wise bucket sum per (grp, store, b, j) — exactly the
    per-group sketch of the concatenated multisets (linear counters,
    the paper's fully-mergeable property, per group). Groups missing
    from one slice pass through from the other."""
    if not sketches:
        raise ValueError("dds_merge_by_group needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("grp", "store", "b", "j").agg(
        F.sum("c").cast("long").alias("c")
    )


def dds_quantile_by_group(
    sketch: DataFrame, qs: "list[float]", m: int = 64
) -> DataFrame:
    """Per-group quantile QUERY over a :func:`dds_build_by_group`
    relation: dds_quantile's value-ordered cumulative walk and
    rank-⌊q·(n−1)⌋+1 bucket pick, PARTITIONED BY GROUP. Every
    relation here is sketch-sized — each group's walk covers
    ≤ stores·binades·m rows (bounded by the value RANGE, never the
    volume), and the targets⋈cum join carries the grp equi-key, so
    unlike the global form nothing is force-broadcast: with many
    groups both sides are groups-scaled and the equi-key hash join is
    the scale-safe shape (AQE may still broadcast small ones).
    Returns (grp, q, est, n) ordered; groups absent from the sketch
    produce no rows (an all-NULL/empty group has no quantiles).

    Cache lifetime (the mg_summary discipline): the keyed input
    sketch stays persisted — bounded at ≤ groups·stores·binades·m
    rows — because the RETURNED plan is lazy and reads it for the
    walk AND the totals. Unpersisting the input sketch cannot release
    this keyed derivation: long-lived sessions issuing many quantile
    queries should materialize the result, then
    ``release_caches(result)``."""
    if m < 1 or (m & (m - 1)) != 0:
        raise ValueError(f"m must be a power of two >= 1, got {m}")
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    from pyspark.sql.window import Window

    # consumed by the cumulative walk AND the per-group totals —
    # bounded (groups·stores·binades·m rows), the family's persist
    # rule. __gk: NULL-group-safe join key (see _grp_key) — a plain
    # grp equi-join would silently drop the NULL group's quantiles.
    sketch, _own = _persist_internal(
        sketch.withColumn("__gk", _grp_key(F.col("grp"))))
    ordered = sketch.select(
        "__gk", "store", "b", "j", "c",
        F.when(F.col("store") == -1, -F.col("b")).otherwise(F.col("b"))
        .alias("__kb"),
        F.when(F.col("store") == -1, -F.col("j")).otherwise(F.col("j"))
        .alias("__kj"),
    )
    w = (
        Window.partitionBy("__gk").orderBy("store", "__kb", "__kj")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ordered.select(
        F.col("__gk").alias("__cg"), "store", "b", "j", "c",
        F.sum("c").over(w).alias("__cum"),
    )
    n_total = sketch.groupBy("__gk", "grp").agg(
        F.sum("c").cast("long").alias("n"))
    qrel = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q: double"
    )
    targets = n_total.crossJoin(F.broadcast(qrel)).select(
        "__gk", "grp", "q", "n",
        (F.floor(F.col("q") * (F.col("n") - 1)) + 1).alias("__tgt"),
    )
    est = (
        F.when(F.col("store") == 0, F.lit(0.0))
        .otherwise(
            F.col("store")
            * F.pow(F.lit(2.0), F.col("b"))
            * (F.lit(1.0) + (F.col("j") + F.lit(0.5)) / F.lit(float(m)))
        )
    )
    hit = targets.join(
        cum,
        (F.col("__gk") == F.col("__cg"))
        & (F.col("__cum") >= F.col("__tgt"))
        & (F.col("__cum") - F.col("c") < F.col("__tgt")),
        "left",
    )
    return _attach_caches(
        hit.select(
            "grp", "q", F.round(est, 6).alias("est"),
            F.col("n").cast("long").alias("n"),
        ).orderBy("grp", "q"),
        _own,
    )


def _kmv_unit(hcol, hash_basis: str):
    """Map a base hash to a unit-interval double for the KMV
    estimator: md5-basis hashes live in [0, 2^32) (divide), xxhash64
    spans the full signed-long range (affine shift). Exact IEEE
    division/addition — identical bits in Spark and DuckDB."""
    if hash_basis == "md5":
        return hcol.cast("double") / F.lit(4294967296.0)
    if hash_basis == "xxhash64":
        return hcol.cast("double") / F.lit(1.8446744073709552e19) + F.lit(0.5)
    raise ValueError(f"unknown hash_basis {hash_basis!r}")


def kmv_summary(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al.
    2007 "On synopses for distinct-value estimation under multiset
    operations"): the k smallest DISTINCT base-hash values of the
    column, each with a representative item — a mergeable uniform
    sample of the column's DISTINCT values. The family member no
    other sketch covers: it answers NDV (kmv_ndv), set Jaccard
    (kmv_jaccard), and "show me ~k random distinct examples" from
    one k-row relation per slice.

    Scale shape: one distinct-keyed partial-agg groupBy then
    orderBy(h).limit(k) — Spark compiles the latter to
    TakeOrderedAndProject (per-partition bottom-k, k-sized merge),
    NOT a global sort or window; the full distinct relation never
    funnels through one partition (plan-pinned). Hash collisions
    keep the smallest item so the summary is a pure function of the
    value set. NULLs excluded. ``hash_basis='md5'`` pins the
    DuckDB-computable base hash (contract rows); production default
    xxhash64. Returns (h, item), ≤ k rows."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = df.select(F.col(value_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    hashed = (
        src.distinct()
        .select(
            _cms_base_hash(F.col("item"), hash_basis).alias("h"), "item"
        )
        .groupBy("h")
        .agg(F.min("item").alias("item"))
    )
    return hashed.orderBy("h").limit(k)


def kmv_merge(*summaries: DataFrame, k: int = 256) -> DataFrame:
    """Combine :func:`kmv_summary` relations into the summary of the
    UNION without touching any rows: bottom-k of the k-row summary
    union. Exact by the bottom-k closure property: any of the k
    smallest distinct hashes of A ∪ B is among the k smallest of
    whichever side contains it, so merge(kmv(A), kmv(B)) ==
    kmv_summary(A ∪ B) bit-for-bit (property-tested; overlapping
    slices are idempotent for the same reason — it is a SET union).
    Same k and hash basis as the inputs, or smaller k to tighten."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not summaries:
        raise ValueError("kmv_merge needs at least one input")
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return (
        out.groupBy("h").agg(F.min("item").alias("item"))
        .orderBy("h").limit(k)
    )


def kmv_ndv(
    summary: DataFrame, k: int = 256, hash_basis: str = "xxhash64"
) -> DataFrame:
    """Distinct-value estimate from a KMV summary: with fewer than k
    hashes kept the summary IS the distinct set (exact count);
    otherwise the Beyer et al. 2007 unbiased estimator (k−1)/u_k,
    where u_k is the k-th smallest hash mapped to the unit interval —
    standard error ~1/√(k−2). One k-row aggregate; returns a single
    row (n_kept, ndv_est)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    agg = summary.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max(_kmv_unit(F.col("h"), hash_basis)).alias("__uk"),
    )
    return agg.select(
        "n_kept",
        F.round(
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("__uk")),
            4,
        ).alias("ndv_est"),
    )


def kmv_jaccard(
    summary_a: DataFrame, summary_b: DataFrame, k: int = 256
) -> DataFrame:
    """Jaccard similarity of two VALUE SETS from their KMV summaries
    alone (Beyer et al. 2007 §5: bottom-k sketches are closed under
    set operations): K = the k smallest hashes of the summary union
    is a uniform sample of A ∪ B's distinct hashes, so |K ∩ A ∩ B| /
    |K| estimates |A∩B| / |A∪B|. Pure k-row arithmetic — two
    broadcast semi-joins of k-sized relations, no corpus access
    (THE way to compare column domains across 100 TB slices: ship
    two k-row summaries, not two scans). Returns one row (n_k,
    n_inter, jaccard_est)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # each ≤ k-row summary feeds the union AND a membership probe, and
    # the bottom-k TakeOrdered cannot be exchange-reused — un-persisted,
    # in-lineage summaries re-ran their corpus distinct+bottom-k per
    # consumer (executed-plan-verified)
    ha, _own_a = _persist_internal(summary_a.select("h"))
    hb, _own_b = _persist_internal(summary_b.select("h"))
    kk = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    inter = (
        kk.join(F.broadcast(ha), "h", "left_semi")
        .join(F.broadcast(hb), "h", "left_semi")
    )
    n_k = kk.agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    n_i = inter.agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    return _attach_caches(
        n_k.crossJoin(F.broadcast(n_i)).select(
            "n_k", "n_inter",
            F.round(F.col("n_inter") / F.col("n_k"), 4)
            .alias("jaccard_est"),
        ),
        _own_a + _own_b,
    )


def kmv_set_stats(
    summary_a: DataFrame,
    summary_b: DataFrame,
    k: int = 256,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """Full multiset algebra over two KMV summaries (Beyer et al.
    2007 §5, "On synopses for distinct-value estimation under
    multiset operations"): union NDV, intersection NDV, per-side NDV
    and both containments |A∩B|/|A| and |A∩B|/|B| — from the two
    k-row relations ALONE, no corpus access. The estimators:

    - K = bottom-k of the summary union is itself the KMV summary of
      A ∪ B (closure), so union NDV is the standard (k−1)/u_k —
      EXACT (= |K|) while |K| < k;
    - ρ = |K ∩ A ∩ B| / |K| estimates |A∩B| / |A∪B| (K is a uniform
      sample of A ∪ B's distinct hashes — the kmv_jaccard estimator);
    - intersection NDV = ρ · D̂_union (§5's compound estimator);
    - containment(A in B) = D̂_inter / D̂_A, the directional overlap
      question Jaccard can't answer (is slice A inside slice B, or
      merely similar-sized?). NULL when a side's summary is empty.

    All of it is k-row arithmetic — the 100 TB shape is "ship two
    k-row summaries, not two scans": one pass over the ≤ k-row K with
    two broadcast flag joins, one bounded aggregate per side, a
    broadcast crossJoin of three 1-row relations. In the exact regime
    (both true NDVs < k) every output equals the true value. Returns
    one row (n_k, n_inter, ndv_union, ndv_inter, ndv_a, ndv_b,
    containment_a_in_b, containment_b_in_a, jaccard_est).

    Cache lifetime (the mg_summary discipline): both ≤ k-row input
    projections stay persisted because the RETURNED plan is lazy and
    reads each twice (union + flag join). ``input.unpersist()``
    CANNOT release them (Dataset.unpersist is non-cascading and these
    are derived projections): callers comparing MANY summary pairs in
    a long-lived session should materialize the 1-row result, then
    ``release_caches(result)`` — each entry is tiny but the count is
    otherwise unbounded."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # same persist rationale as kmv_jaccard: each summary feeds the
    # union AND a membership flag join, and TakeOrdered subtrees
    # don't exchange-reuse — in-lineage summaries would re-run their
    # corpus distinct+bottom-k per consumer
    ha, _own_a = _persist_internal(summary_a.select("h"))
    hb, _own_b = _persist_internal(summary_b.select("h"))
    kk = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    flagged = kk.join(
        F.broadcast(ha.select("h", F.lit(1).alias("__ina"))), "h", "left"
    ).join(F.broadcast(hb.select("h", F.lit(1).alias("__inb"))), "h", "left")
    stats = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum(
            F.when(F.col("__ina").isNotNull() & F.col("__inb").isNotNull(),
                   1).otherwise(0)
        ).cast("long").alias("n_inter"),
        F.max(_kmv_unit(F.col("h"), hash_basis)).alias("__uk"),
    )
    side_a = ha.agg(
        F.count(F.lit(1)).cast("long").alias("__na"),
        F.max(_kmv_unit(F.col("h"), hash_basis)).alias("__uka"),
    )
    side_b = hb.agg(
        F.count(F.lit(1)).cast("long").alias("__nb"),
        F.max(_kmv_unit(F.col("h"), hash_basis)).alias("__ukb"),
    )
    joined = stats.crossJoin(F.broadcast(side_a)).crossJoin(
        F.broadcast(side_b))
    km1 = F.lit(float(k - 1))
    # raw (un-rounded) estimates: every derived column reuses the SAME
    # expression shapes so the SQL oracle replays bit-for-bit
    eu = F.when(F.col("n_k") < k, F.col("n_k").cast("double")).otherwise(
        km1 / F.col("__uk"))
    ea = F.when(F.col("__na") < k, F.col("__na").cast("double")).otherwise(
        km1 / F.col("__uka"))
    eb = F.when(F.col("__nb") < k, F.col("__nb").cast("double")).otherwise(
        km1 / F.col("__ukb"))
    rho = F.col("n_inter") / F.col("n_k")
    ei = rho * eu
    return _attach_caches(
        joined.select(
            "n_k", "n_inter",
            F.round(eu, 4).alias("ndv_union"),
            F.round(ei, 4).alias("ndv_inter"),
            F.round(ea, 4).alias("ndv_a"),
            F.round(eb, 4).alias("ndv_b"),
            F.when(F.col("__na") > 0, F.round(ei / ea, 4))
            .alias("containment_a_in_b"),
            F.when(F.col("__nb") > 0, F.round(ei / eb, 4))
            .alias("containment_b_in_a"),
            F.round(rho, 4).alias("jaccard_est"),
        ),
        _own_a + _own_b,
    )


def kmv_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
    hash_basis: str = "xxhash64",
    n_salts: int = _MG_TRIM_SALTS,
) -> DataFrame:
    """Per-GROUP KMV bottom-k summaries in ONE pass over the corpus —
    the sketched form of "distinct X per Y" (users per domain, vocab
    per source, orders per segment), the group-by companion to the
    global :func:`kmv_summary`. Exact distinct-count-per-group
    shuffles every (group, value) pair and holds each group's whole
    value set; this keeps k rows per group, and each group's rows ARE
    a kmv_summary of that group's values (same hash, same bottom-k),
    so kmv_ndv arithmetic, kmv_merge across slices and kmv_set_stats
    between two groups' summaries all apply unchanged.

    Scale shape: one distinct-(group, hash) aggregation (map-side
    partial combine), then the salted two-phase bottom-k the MG trim
    uses (_mg_trim_relation's argument, flipped to ascending): each
    (group, salt) sub-group keeps its k smallest (h, item) structs in
    a bounded aggregation — any of a group's true bottom-k is
    necessarily inside its own sub-group's bottom-k — and the
    ≤ n_salts·k survivors per group merge in one tiny aggregation.
    NO Window over the distinct relation (a row_number per group
    sorts whole groups through single tasks — the r11 MG defect), NO
    per-group TakeOrdered jobs (one job total, however many groups).
    Phase-1 buffers hold ~group_distinct/n_salts entries; raise
    ``n_salts`` for billion-distinct groups.

    NULL values are excluded (kmv_summary's rule); NULL GROUPS are
    KEPT as their own group (matching SQL GROUP BY). Hash collisions
    keep the smallest item — each group's summary is a pure function
    of its value set. Returns (grp, h, item), ≤ k rows per group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("string").alias("item"),
    ).filter(F.col("item").isNotNull())
    hashed = (
        src.select(
            "grp", _cms_base_hash(F.col("item"), hash_basis).alias("h"),
            "item",
        )
        .groupBy("grp", "h")
        .agg(F.min("item").alias("item"))
    )
    return _group_bottom_k(hashed, k, n_salts)


def _group_bottom_k(rel: DataFrame, k: int, n_salts: int) -> DataFrame:
    """Per-group bottom-k of a (grp, h, item) relation with h distinct
    within each group — the salted two-phase shape shared by
    kmv_by_group (over the corpus-distinct relation) and
    kmv_merge_by_group (over a summary union): bounded per-(grp,
    salt) bottom-k lists, tiny per-group merge, never a Window or a
    per-group job. Returns (grp, h, item), ≤ k rows per group."""
    entry = F.struct(F.col("h").alias("h"), F.col("item").alias("item"))
    part = (
        rel.withColumn(
            "__salt", F.pmod(F.col("h"), F.lit(n_salts)).cast("int")
        )
        .groupBy("grp", "__salt")
        .agg(F.slice(F.array_sort(F.collect_list(entry)), 1, k)
             .alias("tops"))
    )
    return (
        part.select("grp", F.explode("tops").alias("t"))
        .groupBy("grp")
        .agg(F.slice(F.array_sort(F.collect_list("t")), 1, k).alias("tops"))
        .select("grp", F.explode("tops").alias("t"))
        .select("grp", F.col("t.h").alias("h"), F.col("t.item").alias("item"))
    )


def kmv_merge_by_group(
    *summaries: DataFrame, k: int = 256, n_salts: int = _MG_TRIM_SALTS
) -> DataFrame:
    """Combine :func:`kmv_by_group` relations from corpus SLICES into
    the per-group summary of the union WITHOUT touching any rows —
    the per-group form of :func:`kmv_merge`, and the missing piece of
    the per-group maintenance model ("k rows per group per slice,
    merge forever"). Exact per group by the same bottom-k closure:
    within a group, any of the k smallest distinct hashes of A ∪ B is
    among the k smallest of whichever slice contains it, so
    merge(kmv_by_group(A), kmv_by_group(B)) == kmv_by_group(A ∪ B)
    row-for-row (property-tested; overlapping slices idempotent —
    SET union per group). Groups missing from one slice pass through
    from the other. Inputs are ≤ groups·k rows each, so every step is
    summary-sized. Same k and hash basis as the inputs, or smaller k
    to tighten."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not summaries:
        raise ValueError("kmv_merge_by_group needs at least one input")
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    merged = out.groupBy("grp", "h").agg(F.min("item").alias("item"))
    return _group_bottom_k(merged, k, n_salts)


def kmv_ndv_by_group(
    summary: DataFrame, k: int = 256, hash_basis: str = "xxhash64"
) -> DataFrame:
    """Per-group distinct-value estimates from a :func:`kmv_by_group`
    relation: each group applies the kmv_ndv rule independently —
    exact count below k (the group's summary IS its distinct set),
    else the Beyer et al. 2007 (k−1)/u_k estimator. One bounded
    aggregate over the ≤ groups·k-row relation; returns (grp, n_kept,
    ndv_est) — the lake-scale "distinct per group" answer at k rows
    of state per group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    agg = summary.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max(_kmv_unit(F.col("h"), hash_basis)).alias("__uk"),
    )
    return agg.select(
        "grp", "n_kept",
        F.round(
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("__uk")),
            4,
        ).alias("ndv_est"),
    )


def kmv_pairwise_stats(
    summary: DataFrame, k: int = 256, hash_basis: str = "xxhash64"
) -> DataFrame:
    """ALL-PAIRS group overlap matrix from one :func:`kmv_by_group`
    relation — "which sources/domains share vocabulary", the question
    :func:`kmv_set_stats` answers for ONE pair, computed for every
    unordered group pair in a single relational plan (no driver loop
    over groups, no per-pair jobs). Each pair's row is BIT-IDENTICAL
    to kmv_set_stats of the two groups' summaries (property-tested):
    the per-pair union bottom-k equals the KMV summary of A ∪ B by
    the same closure — each group's summary is the bottom-k of its
    distinct hash set, so the k smallest of S_a ∪ S_b are the k
    smallest of A ∪ B (Beyer et al. 2007 §5 compound estimators).

    Shape: one pass over the ≤ groups·k-row summary for per-side
    stats; the pair enumeration and the tagged per-pair union are
    DELIBERATELY groups²-scaled — that is the size of the answer (the
    pair matrix itself), not an avoidable blow-up. Everything is
    summary-derived: the union relation is ≤ pairs·2k rows and the
    bottom-k walk windows only over it (the dds_quantile_by_group
    precedent — never over a corpus relation). With a large group
    domain, filter the summary to the groups of interest first; the
    matrix is quadratic in whatever you pass in. Joins keep their
    group-key equi-joins without forced broadcasts (groups-scaled
    sides, the per-group family's standing call). NULL groups
    participate via the injective ``_grp_key`` (the NULL = NULL
    equi-join fix), ordered before every value group in the pair
    orientation.

    Returns one row per unordered pair (grp_a < grp_b by the group
    key): (grp_a, grp_b, n_k, n_inter, ndv_union, ndv_inter, ndv_a,
    ndv_b, containment_a_in_b, containment_b_in_a, jaccard_est) —
    the same estimator expressions as kmv_set_stats, NULL-guarded
    divisions included.

    Cache lifetime (the mg_summary discipline): the keyed summary
    projection stays persisted — bounded at ≤ groups·k rows — because
    the RETURNED plan is lazy and reads it three times (side stats +
    both pair tags). Unpersisting the input summary cannot release
    this keyed projection: long-lived sessions should materialize the
    matrix, then ``release_caches(result)``."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    s, _own = _persist_internal(summary.select(
        _grp_key(F.col("grp")).alias("__gk"), "grp", "h"))
    sides = s.groupBy("__gk", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.max(_kmv_unit(F.col("h"), hash_basis)).alias("__uks"),
    )
    pa = sides.select(
        F.col("__gk").alias("__ga"), F.col("grp").alias("grp_a"),
        F.col("__n").alias("__na"), F.col("__uks").alias("__uka"))
    pb = sides.select(
        F.col("__gk").alias("__gb"), F.col("grp").alias("grp_b"),
        F.col("__n").alias("__nb"), F.col("__uks").alias("__ukb"))
    pairs = pa.crossJoin(pb).filter(F.col("__ga") < F.col("__gb"))
    keys = pairs.select("__ga", "__gb")
    ua = keys.join(s.select(F.col("__gk").alias("__ga"), "h"), "__ga") \
        .select("__ga", "__gb", "h",
                F.lit(1).alias("__ina"), F.lit(0).alias("__inb"))
    ub = keys.join(s.select(F.col("__gk").alias("__gb"), "h"), "__gb") \
        .select("__ga", "__gb", "h",
                F.lit(0).alias("__ina"), F.lit(1).alias("__inb"))
    u = ua.unionByName(ub).groupBy("__ga", "__gb", "h").agg(
        F.max("__ina").alias("__ina"), F.max("__inb").alias("__inb"))
    w = Window.partitionBy("__ga", "__gb").orderBy("h")
    kk = u.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") <= k)
    stats = kk.groupBy("__ga", "__gb").agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum(F.col("__ina") * F.col("__inb")).cast("long")
        .alias("n_inter"),
        F.max(_kmv_unit(F.col("h"), hash_basis)).alias("__uk"),
    )
    joined = stats.join(pairs, ["__ga", "__gb"])
    km1 = F.lit(float(k - 1))
    # the kmv_set_stats estimator expressions, verbatim, per pair
    eu = F.when(F.col("n_k") < k, F.col("n_k").cast("double")).otherwise(
        km1 / F.col("__uk"))
    ea = F.when(F.col("__na") < k, F.col("__na").cast("double")).otherwise(
        km1 / F.col("__uka"))
    eb = F.when(F.col("__nb") < k, F.col("__nb").cast("double")).otherwise(
        km1 / F.col("__ukb"))
    rho = F.col("n_inter") / F.col("n_k")
    ei = rho * eu
    return _attach_caches(
        joined.select(
            "grp_a", "grp_b", "n_k", "n_inter",
            F.round(eu, 4).alias("ndv_union"),
            F.round(ei, 4).alias("ndv_inter"),
            F.round(ea, 4).alias("ndv_a"),
            F.round(eb, 4).alias("ndv_b"),
            F.when(F.col("__na") > 0, F.round(ei / ea, 4))
            .alias("containment_a_in_b"),
            F.when(F.col("__nb") > 0, F.round(ei / eb, 4))
            .alias("containment_b_in_a"),
            F.round(rho, 4).alias("jaccard_est"),
        ),
        _own,
    )
