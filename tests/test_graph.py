"""Connected components: planted graphs + random graph vs a Python
union-find oracle."""

import random

from pyspark.sql import functions as F

from hdk_spark.operators.graph import connected_components, duplicate_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    out = connected_components(df).collect()
    return {r["id"]: r["comp"] for r in out}


def test_chain_collapses_to_min(spark):
    # a long chain exercises the pointer-jumping path (plain neighbor
    # propagation would need ~n rounds; we cap max_rounds well below)
    n = 40
    labels = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(labels) == set(range(n + 1))
    assert set(labels.values()) == {0}


def test_star_and_two_components(spark):
    edges = [(100, i) for i in range(101, 106)] + [(7, 8), (8, 9)]
    labels = _cc(spark, edges)
    assert {labels[i] for i in range(100, 106)} == {100}
    assert labels[7] == labels[8] == labels[9] == 7


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(500))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for n in (a, b):
            expected[n] = find(n)
    # union-find roots are component minima only after path compression
    # toward min — recompute the min per root instead
    comp_min = {}
    for n in expected:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in expected}

    labels = _cc(spark, edges)
    assert labels == expected


def test_duplicate_clusters_canonical_survivors(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_no_cartesian_in_cc_plan(spark):
    df = spark.createDataFrame([(1, 2), (3, 4)], "id_a: long, id_b: long")
    plan = connected_components(df, max_rounds=2)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_star_cc_matches_min_label_cc(spark):
    """Large-star/small-star produces the identical (id, comp) map as
    the min-label implementation on random graphs (three seeds)."""
    from hdk_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        edges = [
            (rng.randint(0, 150), rng.randint(0, 150)) for _ in range(200)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a: long, id_b: long")
        a = sorted(map(tuple, connected_components(df).collect()))
        b = sorted(map(tuple, connected_components_star(df).collect()))
        assert a == b, seed


def test_star_cc_deep_chain_log_rounds(spark):
    """A 256-hop path (diameter 256) must collapse to one component in
    O(log diameter) rounds — the property that makes the star variant
    the deep-graph upgrade path."""
    from hdk_spark.operators.graph import connected_components_star

    chain = [(i, i + 1) for i in range(256)]
    df = spark.createDataFrame(chain, "id_a: long, id_b: long")
    st = {}
    rows = connected_components_star(df, stats=st).collect()
    assert len(rows) == 257
    assert {r["comp"] for r in rows} == {0}
    assert st["rounds"] <= 12  # ~log2(256) + constant, never O(256)


def test_star_cc_large_id_domain_no_overflow(spark):
    """Ids at the 10M+ scale must not overflow the convergence
    checksum (regression: the raw a*K+b sum overflowed int64 on the
    x10 replica's shifted ids)."""
    from hdk_spark.operators.graph import connected_components_star

    base = 10_000_000_000
    edges = [(base + i, base + i + 1) for i in range(50)]
    edges += [(base + 1000 + i, base + 1000 + i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    rows = connected_components_star(df).collect()
    comps = {r["comp"] for r in rows}
    assert comps == {base, base + 1000}
    assert len(rows) == 82


def test_star_cc_raises_on_max_rounds_exhaustion(spark):
    """An unconverged edge list is not a star decomposition — the
    operator must raise rather than return wrong components, and
    record the non-convergence in stats."""
    import pytest

    from hdk_spark.operators.graph import connected_components_star

    # an 8-hop path needs ~3 alternating rounds; 1 round cannot finish
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a: long, id_b: long"
    )
    stats = {}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(
            edges, "id_a", "id_b", max_rounds=1, stats=stats
        )
    assert stats.get("converged") is False and stats.get("rounds") == 1


# ---------------------------------------------------------------------------
# page_rank
# ---------------------------------------------------------------------------

def _pr(spark, edges, **kw):
    from hdk_spark.operators.graph import page_rank

    df = spark.createDataFrame(edges, "src: string, dst: string")
    return {
        r["node"]: r["rank_micro"] for r in page_rank(df, **kw).collect()
    }


def _pr_python(edges, iters=3, num=17, den=20, scale=1_000_000):
    """Pure-Python twin of the integer update rule."""
    from collections import Counter, defaultdict

    outdeg = Counter(s for s, _ in edges)
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    base = (scale * (den - num)) // den
    r = {n: scale for n in nodes}
    for _ in range(iters):
        inc = defaultdict(int)
        for s, d in edges:
            inc[d] += (r[s] * num) // (den * outdeg[s])
        r = {n: base + inc[n] for n in nodes}
    return r


def test_pagerank_matches_python_twin(spark):
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    edges = list({
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    })
    assert _pr(spark, edges) == _pr_python(edges)


def test_pagerank_star_closed_form(spark):
    # hub h with k=5 spokes each linking only to h; h links nowhere
    # (dangling). spoke outdeg=1 so each sends floor(r*17/20).
    edges = [(f"s{i}", "h") for i in range(5)]
    r = _pr(spark, edges, iters=2)
    # r1(spoke)=150000 (no in-edges); r1(h)=150000+5*850000
    # r2(spoke)=150000; r2(h)=150000+5*floor(150000*17/20)=150000+5*127500
    assert r == {**{f"s{i}": 150000 for i in range(5)}, "h": 787500}


def test_pagerank_parallel_edges_split_mass(spark):
    # a has TWO parallel edges to b and one to c: outdeg 3, b gets 2 shares
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a")]
    r = _pr(spark, edges, iters=1)
    share = (1_000_000 * 17) // (20 * 3)
    assert r["b"] == 150_000 + 2 * share
    assert r["c"] == 150_000 + share


def test_pagerank_deterministic_under_repartition(spark):
    import random

    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(40)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(200)})
    from hdk_spark.operators.graph import page_rank

    df = spark.createDataFrame(edges, "src: string, dst: string")
    a = {r["node"]: r["rank_micro"] for r in page_rank(df).collect()}
    b = {
        r["node"]: r["rank_micro"]
        for r in page_rank(df.repartition(17, "dst")).collect()
    }
    assert a == b


def test_pagerank_zero_iters_and_validation(spark):
    import pytest

    edges = [("a", "b")]
    assert _pr(spark, edges, iters=0) == {"a": 1_000_000, "b": 1_000_000}
    df = spark.createDataFrame(edges, "src: string, dst: string")
    from hdk_spark.operators.graph import page_rank

    with pytest.raises(ValueError):
        page_rank(df, iters=-1)
    with pytest.raises(ValueError):
        page_rank(df, damping=(20, 17))
    with pytest.raises(ValueError):
        page_rank(df, scale=0)


def test_pagerank_weighted_equals_exploded(spark):
    import random

    from hdk_spark.operators.graph import page_rank

    rng = random.Random(23)
    nodes = [f"n{i}" for i in range(20)]
    wrows = list({
        (rng.choice(nodes), rng.choice(nodes), rng.randint(1, 4))
        for _ in range(80)
    })
    wdf = spark.createDataFrame(wrows, "src: string, dst: string, w: long")
    xdf = spark.createDataFrame(
        [(s, d) for s, d, w in wrows for _ in range(w)],
        "src: string, dst: string",
    )
    a = {r["node"]: r["rank_micro"]
         for r in page_rank(wdf, weight="w").collect()}
    b = {r["node"]: r["rank_micro"] for r in page_rank(xdf).collect()}
    assert a == b


def test_hits_hand_graph_and_determinism(spark):
    """Hand-checkable hub/authority separation: 1→3, 2→3, 3→4 makes 3
    the top authority and 1/2 the top hubs (iteration arithmetic
    verified by hand in micro-units); result is repartition-stable and
    a directory-style node (high out, no in) gets hub≫authority."""
    from hdk_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src: long, dst: long")
    got = {r["node"]: r for r in hits(edges, iters=2).collect()}
    assert got[3]["auth_micro"] == 1_000_000_000
    assert got[1]["hub_micro"] == got[2]["hub_micro"] == 1_000_000_000
    # hand-derived round-2 values: auth_raw(4)=hub_1(3)=5e8, max=2e9
    assert got[4]["auth_micro"] == 250_000_000
    assert got[3]["hub_micro"] == 250_000_000
    assert got[1]["auth_micro"] == 0 and got[4]["hub_micro"] == 0

    again = {r["node"]: tuple(r) for r in hits(
        edges.repartition(5), iters=2).collect()}
    assert again == {k: tuple(v) for k, v in got.items()}

    # directory node: many out-links, zero in-links
    d_edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2), (3, 2)],
        "src: long, dst: long")
    d = {r["node"]: r for r in hits(d_edges, iters=3).collect()}
    assert d[0]["hub_micro"] > 0 and d[0]["auth_micro"] == 0

    import pytest

    with pytest.raises(ValueError, match="iters"):
        hits(edges, iters=0)


def test_trust_rank_spam_demotion_and_determinism(spark):
    """TrustRank property: a 'spam' node with heavy in-links from
    untrusted nodes scores 0 while a node one hop from a seed scores
    positive; seed-only teleport conserves the base term; stable
    under repartition."""
    import pytest

    from hdk_spark.operators.graph import trust_rank

    # seeds: 1. trusted chain 1->2. spam farm: 10,11,12 all -> 99
    edges = spark.createDataFrame(
        [(1, 2), (10, 99), (11, 99), (12, 99)], "src: long, dst: long")
    got = {r["node"]: r for r in trust_rank(edges, [1], iters=3).collect()}
    assert got[1]["trust_micro"] > 0       # seed keeps its base
    assert got[2]["trust_micro"] > 0       # one hop from seed
    assert got[99]["trust_micro"] == 0     # spam farm: no trust path
    assert got[10]["trust_micro"] == 0

    again = {r["node"]: tuple(r) for r in trust_rank(
        edges.repartition(5), [1], iters=3).collect()}
    assert again == {k: tuple(v) for k, v in got.items()}

    with pytest.raises(ValueError, match="seeds"):
        trust_rank(edges, [])


def _lpa_reference(edges, rounds):
    """Pure-Python synchronous LPA with identical tie-breaks: max
    neighbor mass, ties to smallest label."""
    from collections import defaultdict

    mass = defaultdict(int)
    for a, b, w in edges:
        if a != b:
            mass[(a, b)] += w
            mass[(b, a)] += w
    nbrs = defaultdict(dict)
    for (a, b), w in mass.items():
        nbrs[a][b] = w
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n in nbrs:
            cnt = defaultdict(int)
            for b, w in nbrs[n].items():
                cnt[labels[b]] += w
            new[n] = min(cnt, key=lambda lab: (-cnt[lab], lab))
        labels = new
    return labels


def test_label_propagation_matches_reference(spark):
    """Spark LPA == the pure-Python synchronous rule on a two-clique
    bridge graph (communities keep distinct labels) and on a randomish
    weighted graph; weight column == physically exploded parallel
    rows; deterministic under repartition; rounds guard."""
    import pytest

    from hdk_spark.operators.graph import label_propagation

    cliques = [(a, b) for grp in ([0, 1, 2, 3], [10, 11, 12, 13])
               for i, a in enumerate(grp) for b in grp[i + 1:]]
    bridge = [(3, 10)]
    e = cliques + bridge
    df = spark.createDataFrame(e, "src: long, dst: long")
    got = dict(
        (r["node"], r["label"])
        for r in label_propagation(df, rounds=3).collect()
    )
    assert got == _lpa_reference([(a, b, 1) for a, b in e], 3)
    assert len(set(got.values())) == 2  # the two cliques stay apart

    wedges = [(i % 7, (i * 3 + 1) % 7, i % 3 + 1) for i in range(20)]
    wdf = spark.createDataFrame(wedges, "src: long, dst: long, w: long")
    gw = dict(
        (r["node"], r["label"])
        for r in label_propagation(wdf, rounds=2, weight="w").collect()
    )
    assert gw == _lpa_reference(wedges, 2)

    exploded = [(a, b) for a, b, w in wedges for _ in range(w)]
    edf = spark.createDataFrame(exploded, "src: long, dst: long")
    ge = dict(
        (r["node"], r["label"])
        for r in label_propagation(edf, rounds=2).collect()
    )
    assert ge == gw  # weighted == parallel-edge identity

    again = dict(
        (r["node"], r["label"])
        for r in label_propagation(df.repartition(5), rounds=3).collect()
    )
    assert again == got

    with pytest.raises(ValueError, match="rounds"):
        label_propagation(df, rounds=-1)
