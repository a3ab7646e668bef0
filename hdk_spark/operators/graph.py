"""Distributed connected components — the clustering step of a dedup
pipeline (pair edges from minhash/ngram/simhash → duplicate clusters →
one canonical document kept per cluster).

The reference has no graph surface; this is a beyond-reference
training-data-pipeline operator (cf. the dedup methodology of
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2022, which clusters near-dup pairs before dropping documents).

Scale design (the interesting part at 100 TB):

- Min-label propagation with *pointer jumping* (each round a node takes
  the min component id over itself, its neighbors, and its current
  label's label). Plain neighbor propagation needs O(diameter) rounds;
  the label-of-label shortcut makes long chains collapse in
  O(log diameter) rounds — the Hash-to-Min idea (Rastogi et al. 2012).
  Dedup graphs are near-cliques (tiny diameter), so in practice 2-3
  rounds converge.
- Each round is a fixed, small number of shuffles: one edge⋈label join
  on the node id, one label⋈label join for the shortcut, one min
  groupBy. Edges are persisted once and reused every round.
- **Lineage is truncated every round** (`localCheckpoint`): an
  iterative plan that keeps its full lineage re-executes all prior
  rounds on any recompute and its optimizer cost grows superlinearly —
  the classic iterative-DataFrame failure mode. (On a real cluster
  prefer `spark.sparkContext.setCheckpointDir` + `checkpoint()` for
  fault tolerance; localCheckpoint trades re-computability for speed
  and is what local mode supports.)
- Convergence is detected with ONE tiny driver action per round:
  labels only ever decrease, so `sum(comp)` is strictly monotone until
  the fixpoint — compare consecutive sums instead of joining old vs
  new labels (which would cost an extra n-sized shuffle per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["connected_components", "connected_components_star", "duplicate_clusters", "page_rank", "label_propagation",
    "hits",
    "trust_rank",
]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it.

    Returns (id, comp): one row per distinct node; ``comp`` is the
    component representative (its minimum member id). Deterministic.

    Pass a dict as ``stats`` to receive {'rounds': n} — the number of
    shuffled label rounds run after the fused init (scale_smoke uses
    this to pin the O(log diameter) round-count claim with data).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirect + dedup once; every round reuses this cached relation
    e = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )

    # Fused init: comp0 := min(self ∪ neighbors) in ONE groupBy — this is
    # exactly the first neighbor-propagation round, but without the
    # separate node-distinct + edge⋈label join it would otherwise cost.
    # Dedup pair graphs are near-cliques/stars that usually converge
    # right here, so the loop below then runs a single verify round:
    # 2 shuffled rounds total instead of 3.
    labels = (
        e.groupBy(F.col("a").alias("id"))
        .agg(F.least(F.first("a"), F.min("b")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # neighbor propagation: each edge sends its endpoint's label
        msgs = e.join(labels, e["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(msgs).groupBy("id").agg(F.min("comp").alias("comp"))
        )
        # pointer jumping: comp := label(comp) — collapses chains in
        # O(log diameter) rounds instead of O(diameter)
        hop = new_labels.select(
            F.col("id").alias("c_id"), F.col("comp").alias("c_comp")
        )
        new_labels = (
            new_labels.join(hop, new_labels["comp"] == hop["c_id"], "left")
            .select(
                F.col("id"),
                F.least(
                    F.col("comp"), F.coalesce(F.col("c_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:  # labels only decrease: equal sum = fixpoint
            break
        prev_sum = new_sum

    e.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return labels


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    algorithm: str = "min_label",
) -> DataFrame:
    """Near-duplicate pair edges → (doc_id, cluster_id).

    ``cluster_id`` is the minimum doc id of the transitive-closure
    cluster — the canonical survivor; rows with doc_id == cluster_id
    are the documents a dedup pass keeps.

    ``algorithm``: ``min_label`` (the near-clique default) or ``star``
    (:func:`connected_components_star` — the deep-chain variant);
    identical results, property-tested.
    """
    cc = (
        connected_components_star
        if algorithm == "star"
        else connected_components
    )
    return cc(pairs, id_a, id_b).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the documented upgrade path of
    :func:`connected_components` for DEEP graphs (SCALE.md): both
    converge in O(log diameter) rounds, but the star algorithm's
    per-round state is the (shrinking) edge list itself — no separate
    label relation, no label⋈label join — and its convergence proof
    covers adversarial topologies the min-label shortcut only handles
    heuristically.

    large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u});
    small-star: every neighbor v ≤ u (and u) links to m over the
    smaller neighborhood. Alternate to fixpoint; the surviving edges
    form stars (node → component minimum).

    Returns (id, comp), identical contract to connected_components
    (property-tested equal on random graphs). Each half-round is one
    groupBy over the current edge list + a distinct — two keyed
    shuffles; lineage truncated per round (localCheckpoint).
    Convergence: the canonical edge list only shrinks/relabels toward
    the star fixpoint, detected when (count, endpoint checksum) is
    stable across a full round — one tiny driver action, no
    old⋈new join."""
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)

    def _summary(df: DataFrame) -> tuple:
        # reduce operands mod M BEFORE the multiply: id*K alone
        # overflows int64 at ~10^10-scale ids; (M-1)*K + M stays
        # inside int64. The per-edge terms (< 2^31) are then summed
        # into DECIMAL(38,0) so the SUM itself cannot overflow int64
        # (it would past ~3.5B edges — an ANSI-mode failure at scale).
        M = F.lit(2_147_483_647)
        row = df.agg(
            F.count(F.lit(1)),
            F.sum(
                F.pmod(
                    F.pmod(F.col("a"), M) * F.lit(2654435761)
                    + F.pmod(F.col("b"), M),
                    M,
                ).cast("decimal(38,0)")
            ),
        ).collect()[0]
        return (row[0], row[1])

    def large_star(df: DataFrame) -> DataFrame:
        # neighborhoods from BOTH orientations; connect strictly
        # greater neighbors to the neighborhood minimum
        nbrs = df.select("a", "b").union(
            df.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        grouped = nbrs.groupBy("a").agg(
            F.collect_set("b").alias("__nb")
        )
        m = F.array_min(F.array_union(F.col("__nb"), F.array(F.col("a"))))
        out = grouped.select(
            F.explode(
                F.filter(F.col("__nb"), lambda v: v > F.col("a"))
            ).alias("v"),
            m.alias("m"),
        )
        return out.select(
            F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b")
        ).filter(F.col("a") != F.col("b")).distinct()

    def small_star(df: DataFrame) -> DataFrame:
        # orient edges high→low: each node u sees its SMALLER
        # neighbors; link them (and u) to the minimum
        lo = df.select(F.col("b").alias("u"), F.col("a").alias("v"))
        grouped = lo.groupBy("u").agg(F.collect_set("v").alias("__nb"))
        m = F.array_min(F.col("__nb"))
        out = grouped.select(
            F.explode(
                F.array_union(F.col("__nb"), F.array(F.col("u")))
            ).alias("v"),
            m.alias("m"),
        )
        return out.select(
            F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b")
        ).filter(F.col("a") != F.col("b")).distinct()

    prev = _summary(e)
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        e = small_star(large_star(e)).localCheckpoint(eager=True)
        cur = _summary(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # never return wrong components silently: an unconverged edge
        # list is not a star decomposition, so (b → a) below would be
        # garbage. O(log diameter) rounds suffice (Kiveris et al.);
        # exhausting max_rounds means the caller's bound is too low.
        if stats is not None:
            stats["rounds"] = rounds
            stats["converged"] = False
        raise RuntimeError(
            f"connected_components_star did not converge in "
            f"{max_rounds} rounds — raise max_rounds (O(log diameter) "
            f"is expected; 20 covers ~2^20-hop paths)"
        )

    comp = e.select(F.col("b").alias("id"), F.col("a").alias("comp"))
    roots = (
        e.select(F.col("a").alias("id"))
        .distinct()
        .join(comp.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("comp"))
    )
    out = comp.unionByName(roots).groupBy("id").agg(
        F.min("comp").alias("comp")
    )
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = True
    return out


def page_rank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: tuple[int, int] = (17, 20),
    scale: int = 1_000_000,
    weight: str | None = None,
) -> DataFrame:
    """Deterministic integer fixed-point PageRank over a directed edge
    list — the authority signal a crawl frontier prioritizes hosts by
    (feed it :func:`hdk_spark.operators.web.link_graph` edges;
    beyond-reference, cf. Page et al. 1999).

    All arithmetic is exact int64 in rank micro-units of 1/``scale``,
    with damping the RATIONAL ``num/den`` (default 17/20 = 0.85), so
    results are bit-identical at any partitioning and SQL-replayable:

        rank_0(v)   = scale                      (i.e. 1.0)
        rank_{k+1}(v) = base + Σ_{u→v} (rank_k(u)·num) div (den·outdeg(u))
        base        = (scale·(den−num)) div den  (i.e. 1−d)

    Contract notes: every input row is one edge (parallel rows are
    parallel edges and split a node's mass accordingly — pre-DISTINCT
    for the simple-graph semantics); self-loops feed the update rule
    as written; dangling-node mass is NOT redistributed (ranks then
    sum below n — the RANKING ORDER, which is what prioritization
    consumes, is unaffected; the base term keeps every node positive).

    ``weight`` names a POSITIVE-INTEGER multiplicity column — a
    weighted edge is defined as exactly that many parallel edges
    (contribution = w · ((rank·num) div (den·W_u)) with W_u the
    weighted out-degree; the div happens BEFORE the multiply so the
    identity with physically exploded rows is bit-exact,
    property-tested). This is the 100 TB form: feed link_graph's
    aggregated (src, dst, n_links) directly instead of exploding
    n_links back into rows. Non-positive/fractional weights are a
    contract violation (not scanned for — that would cost a pass).

    Scale shape: a FIXED iteration count (the determinism contract —
    no data-dependent convergence test), each iteration exactly one
    src-keyed equi-join of the rank relation against the persisted
    edges⋈outdeg relation plus one partial-agg groupBy on dst;
    contributions are summed as DECIMAL(38,0) so the fold can't
    overflow int64 past ~10^12 in-edges, then the per-node total
    (bounded by scale·n) returns to int64. Lineage is truncated per
    round (localCheckpoint — the iterative-DataFrame discipline of
    connected_components above). Returns one row per node:
    (node, rank_micro, rank = rank_micro/scale).
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")

    w = (
        F.col(weight).cast("long")
        if weight is not None
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), w.alias("__w")
    )
    deg = e.groupBy("__s").agg(F.sum("__w").alias("__outdeg"))
    ed = e.join(deg, "__s").persist()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d")))
        .distinct()
        .persist()
    )

    base = (scale * (den - num)) // den
    ranks = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("rank_micro")
    )
    for _ in range(iters):
        contrib = ed.join(ranks, ed["__s"] == ranks["node"]).select(
            F.col("__d").alias("node"),
            F.expr(
                f"((rank_micro * {num}) DIV ({den} * __outdeg)) * __w"
            ).alias("__c"),
        )
        summed = contrib.groupBy("node").agg(
            F.sum(F.col("__c").cast("decimal(38,0)")).alias("__sum")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(base))
                    + F.coalesce(F.col("__sum"), F.lit(0)).cast("long")
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    ed.unpersist()
    nodes.unpersist()
    return ranks.select(
        "node",
        "rank_micro",
        (F.col("rank_micro") / F.lit(float(scale))).alias("rank"),
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Deterministic integer fixed-point HITS (Kleinberg 1999) over a
    directed edge list — the hubs-and-authorities companion to
    :func:`page_rank`: authorities are pages many good hubs point TO,
    hubs are pages that point AT many good authorities. The two
    scores separate roles PageRank folds together (a link directory
    is a great hub and a poor authority), which is why crawl
    schedulers use hubs to pick pages to EXPAND and authorities to
    pick pages to KEEP.

    Update rule, max-normalized in exact integer micro-units of
    1/``scale`` (L∞ rather than the paper's L2: same fixed-point
    ranking, but divisions stay integer and SQL-replayable):

        auth_{k}(v) = Σ_{u→v} hub_{k-1}(u)      then ·scale div max
        hub_{k}(u)  = Σ_{u→v} auth_{k}(v)       then ·scale div max

    starting from hub_0 = scale. FIXED iteration count (the
    page_rank determinism contract). Per-round L∞ normalization also
    bounds magnitudes — the un-normalized iteration grows like
    σ_max^{2k} and overflows at scale. Parallel edge rows are
    parallel edges (pre-DISTINCT for simple-graph semantics);
    self-loops feed the rule as written.

    Returns one row per node: (node, hub_micro, auth_micro, hub,
    authority) — micro int64 (the exact contract surface), doubles =
    micro/scale. Nodes with no in-edges get authority 0, no
    out-edges hub 0; the round-k max is over positive sums only and
    guards empty graphs with max ≥ 1.

    Scale shape: each half-round is ONE equi-join of the score
    relation against the persisted edges plus one partial-agg groupBy
    (sums in DECIMAL(38,0) — int64-safe past 10^9 in-edges·scale),
    one 1-row max broadcast, and the ·scale div max rescale also in
    DECIMAL(38,0). Lineage truncated per round (localCheckpoint, the
    iterative-DataFrame discipline of connected_components /
    page_rank above)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).persist()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d")))
        .distinct()
        .persist()
    )

    def _half(scores: DataFrame, join_on: str, emit: str) -> DataFrame:
        """One half-round: sum scores over edges keyed on ``join_on``
        (__s for auth←hubs, __d for hub←auths), L∞-normalize."""
        summed = (
            e.join(scores, e[join_on] == scores["node"])
            .select(
                F.col("__d" if join_on == "__s" else "__s").alias("node"),
                F.col("m").alias("__v"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("__v").cast("decimal(38,0)")).alias("__sum"))
        )
        mx = summed.agg(
            F.greatest(F.max("__sum"), F.lit(1).cast("decimal(38,0)"))
            .alias("__mx")
        )
        return (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.expr(
                    f"CAST((COALESCE(__sum, 0) * {int(scale)}) DIV __mx"
                    " AS BIGINT)"
                ).alias(emit),
            )
        )

    hub = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("m")
    )
    auth = None
    for _ in range(iters):
        auth = _half(hub, "__s", "m").localCheckpoint(eager=True)
        hub = _half(auth, "__d", "m").localCheckpoint(eager=True)
    out = (
        hub.select("node", F.col("m").alias("hub_micro"))
        .join(
            auth.select("node", F.col("m").alias("auth_micro")), "node"
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out.select(
        "node",
        "hub_micro",
        "auth_micro",
        (F.col("hub_micro") / F.lit(float(scale))).alias("hub"),
        (F.col("auth_micro") / F.lit(float(scale))).alias("authority"),
    )


def trust_rank(
    edges: DataFrame,
    seeds: "list",
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: "tuple[int, int]" = (17, 20),
    scale: int = 1_000_000,
    weight: "str | None" = None,
) -> DataFrame:
    """TrustRank (Gyöngyi et al. 2004) — PageRank with teleport
    restricted to a curated SEED set of trusted nodes: trust flows
    only out of seeds along links, so spam hosts that acquire raw
    in-link mass but sit far from any trusted neighborhood score ~0.
    The crawl-frontier demotion signal that complements
    :func:`page_rank`'s raw authority (rank by authority, gate by
    trust).

    Same exact integer fixed-point contract as :func:`page_rank`
    (micro-units, rational damping, DECIMAL sums, per-round
    localCheckpoint) with two changes: rank_0 = scale only for seeds
    (0 elsewhere) and the (1−d) base term is paid ONLY to seeds —
    the personalization-vector form of the update rule. ``seeds`` is
    a literal list (trusted-host lists are curated and bounded — the
    IVF coarse-quantizer driver-literal discipline); a seed absent
    from the graph's nodes is ignored. Returns (node, trust_micro,
    trust = micro/scale).

    Scale shape identical to page_rank: per iteration one src-keyed
    equi-join + one partial-agg groupBy; the seed membership test is
    an isin over a literal list — map-only, no extra exchange."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    if not seeds:
        raise ValueError("seeds must be a non-empty list")

    w = (
        F.col(weight).cast("long")
        if weight is not None
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), w.alias("__w")
    )
    deg = e.groupBy("__s").agg(F.sum("__w").alias("__outdeg"))
    ed = e.join(deg, "__s").persist()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d")))
        .distinct()
        .persist()
    )
    is_seed = F.col("node").isin(list(seeds))
    base = (scale * (den - num)) // den
    seed_base = F.when(is_seed, F.lit(int(base))).otherwise(F.lit(0))
    ranks = nodes.select(
        "node",
        F.when(is_seed, F.lit(int(scale)))
        .otherwise(F.lit(0)).cast("long").alias("rank_micro"),
    )
    for _ in range(iters):
        contrib = ed.join(ranks, ed["__s"] == ranks["node"]).select(
            F.col("__d").alias("node"),
            F.expr(
                f"((rank_micro * {num}) DIV ({den} * __outdeg)) * __w"
            ).alias("__c"),
        )
        summed = contrib.groupBy("node").agg(
            F.sum(F.col("__c").cast("decimal(38,0)")).alias("__sum")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    seed_base
                    + F.coalesce(F.col("__sum"), F.lit(0)).cast("long")
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    ed.unpersist()
    nodes.unpersist()
    return ranks.select(
        "node",
        F.col("rank_micro").alias("trust_micro"),
        (F.col("rank_micro") / F.lit(float(scale))).alias("trust"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    weight: "str | None" = None,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007) — community detection over an undirected edge list: every
    node starts labeled with itself; each round, every node
    simultaneously adopts the label carrying the most neighbor mass,
    ties to the SMALLEST label. The async/random-order variant of the
    paper is replaced by this synchronous, totally-ordered form — the
    repo's determinism contract (same trade as page_rank's fixed
    iteration count): results are a pure function of (edges, rounds)
    and the oracle unrolls the rounds in SQL.

    Input is an edge LIST: each row is one undirected edge (both
    orientations are generated internally; self-loops dropped);
    parallel rows are parallel edges and add neighbor mass, exactly
    like page_rank's weighted contract — pre-DISTINCT for
    simple-graph semantics. ``weight`` names a positive-integer
    multiplicity column.

    Scale shape: the edge relation aggregates once to (a, b, w) and
    persists; each round is ONE equi-join of the (n)-sized label
    relation against it plus one partial-agg groupBy and one window
    on the node key; lineage truncated per round (localCheckpoint).
    Returns (node, label).
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    w = (
        F.col(weight).cast("long")
        if weight is not None
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).alias("__a"), F.col(dst).alias("__b"), w.alias("__w")
    ).filter(F.col("__a") != F.col("__b"))
    und = (
        e.union(
            e.select(
                F.col("__b").alias("__a"),
                F.col("__a").alias("__b"),
                "__w",
            )
        )
        .groupBy("__a", "__b")
        .agg(F.sum("__w").alias("__w"))
        .persist()
    )
    # after both orientations every node appears on the __a side
    nodes = und.select(F.col("__a").alias("node")).distinct().persist()
    labels = nodes.select("node", F.col("node").alias("label"))
    pick = Window.partitionBy("__a").orderBy(
        F.desc("__c"), F.asc("label")
    )
    for _ in range(rounds):
        nbr = und.join(labels, und["__b"] == labels["node"]).select(
            "__a", "label", "__w"
        )
        counted = nbr.groupBy("__a", "label").agg(
            F.sum("__w").alias("__c")
        )
        labels = (
            counted.withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .select(F.col("__a").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    nodes.unpersist()
    return labels
