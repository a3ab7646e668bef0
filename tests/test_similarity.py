"""Similarity-search quality tests: exact top-k is the ground truth;
the LSH-bucketed ANN variant is measured for recall against it.
"""

import pytest
from pyspark.sql import functions as F

from hdk_spark.operators import similarity
from tests.conftest import SF_CORRECT

QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    from __spark_entry__ import load_tables

    load_tables(spark, SF_CORRECT)
    return spark.table("embeddings")


def test_exact_topk_shape_and_order(emb):
    top = similarity.cosine_topk(emb, QUERY_IDS, k=10)
    rows = top.collect()
    assert len(rows) == len(QUERY_IDS) * 10
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["cosine"]))
    for q, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, 11))
        cosines = [x[1] for x in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cosines)


def test_exact_topk_excludes_self(emb):
    top = similarity.cosine_topk(emb, QUERY_IDS, k=5)
    assert top.filter(F.col("qid") == F.col("neighbor_id")).count() == 0


def test_ann_recall_at_k(emb):
    """Single-probe hyperplane LSH: recall vs exact top-10. With 6
    planes (64 buckets) on ~10k vectors, same-bucket candidates retain
    a meaningful share of true neighbors; assert a floor so regressions
    (wrong bucketing, broken dot product) fail loudly."""
    k = 10
    exact = similarity.cosine_topk(emb, QUERY_IDS, k=k)
    approx = similarity.ann_lsh_topk(emb, QUERY_IDS, k=k, n_planes=6)
    e = {(r["qid"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["qid"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.2, f"ANN recall@{k} = {recall:.2f}"


def test_ivf_recall_at_k(emb):
    """IVF with nprobe/n_lists = 1/4 of the lists probed: recall floor
    well above chance; exact rescoring keeps precision 1."""
    k = 10
    exact = similarity.cosine_topk(emb, QUERY_IDS, k=k)
    approx = similarity.ann_ivf_topk(emb, QUERY_IDS, k=k, n_lists=16, nprobe=4)
    e = {(r["qid"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["qid"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"IVF recall@{k} = {recall:.2f}"


def test_ivf_scores_match_exact(emb):
    exact = {
        (r["qid"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, QUERY_IDS, k=50).collect()
    }
    for r in similarity.ann_ivf_topk(emb, QUERY_IDS, k=5).collect():
        key = (r["qid"], r["neighbor_id"])
        if key in exact:
            assert abs(exact[key] - r["cosine"]) < 1e-9


def test_ann_candidates_scored_exactly(emb):
    """Within-bucket scores must equal the exact cosine (LSH only
    restricts candidates, never approximates the metric)."""
    exact = {
        (r["qid"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, QUERY_IDS, k=50).collect()
    }
    for r in similarity.ann_lsh_topk(emb, QUERY_IDS, k=5).collect():
        key = (r["qid"], r["neighbor_id"])
        if key in exact:
            assert abs(exact[key] - r["cosine"]) < 1e-9


def test_ann_topk_size_dispatch(spark):
    """ann_topk routes below/above the measured LSH→IVF boundary and
    both routes return the (qid, neighbor_id, rank, cosine) contract."""
    from hdk_spark.operators import similarity as sim

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    small = sim.ann_topk(df, [0, 1], k=3, n_vectors=10)        # LSH route
    big = sim.ann_topk(df, [0, 1], k=3,
                       n_vectors=sim.ANN_LSH_MAX_VECTORS + 1)  # IVF route
    assert small.columns == ["qid", "neighbor_id", "rank", "cosine"]
    assert big.columns == ["qid", "neighbor_id", "rank", "cosine"]
    assert small.count() > 0 and big.count() > 0


def test_pq_planted_structure_recovers_neighbors(spark):
    """Vectors planted at codebook centroids (+tiny per-id jitter):
    ADC must rank same-cell vectors above different-cell ones, and the
    pre-encoded `codes` path must equal the inline path."""
    from pyspark.sql import functions as F

    from hdk_spark.operators.similarity import pq_encode, pq_topk

    dsub, m = 4, 2
    vals = (-1.0, 1.0)
    cbs = [[[v] * dsub for v in vals] for _ in range(m)]
    # 4 cells (2 per subspace); ids i occupy cell (i%2, (i//2)%2)
    rows = []
    for i in range(40):
        c0, c1 = vals[i % 2], vals[(i // 2) % 2]
        jit = (i % 5) * 0.01
        rows.append((i, [c0 + jit] * dsub + [c1 - jit] * dsub))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    enc = {r["id"]: r["code"] for r in pq_encode(df, cbs).collect()}
    for i in range(40):
        assert enc[i] == [i % 2, (i // 2) % 2]

    top = pq_topk(df, [0], cbs, k=9).collect()
    same_cell = {i for i in range(1, 40)
                 if i % 2 == 0 and (i // 2) % 2 == 0}
    got = {r["neighbor_id"] for r in top}
    assert got == same_cell  # exactly the 9 co-cell vectors rank first

    codes = pq_encode(df, cbs)
    via_codes = pq_topk(df, [0], cbs, k=9, codes=codes).collect()
    assert sorted(map(tuple, via_codes)) == sorted(map(tuple, top))


def test_pq_train_and_validation(spark):
    import pytest

    from hdk_spark.operators.similarity import pq_encode, pq_topk, pq_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cbs = pq_train(emb, m=8, ksub=4, train_sample=256)
    assert len(cbs) == 8 and len(cbs[0]) == 4 and len(cbs[0][0]) == 8
    out = pq_topk(emb, [0, 1], cbs, k=3).collect()
    assert len(out) == 6
    for qid in (0, 1):
        ranks = [r["rank"] for r in out if r["qid"] == qid]
        assert sorted(ranks) == [1, 2, 3]

    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7)
    with pytest.raises(ValueError, match="same centroid count"):
        pq_encode(emb, [[[0.0] * 8] * 4, [[0.0] * 8] * 3])


def test_ivfpq_candidates_subset_and_planted_recall(spark):
    """IVF-PQ vs flat PQ: every IVF-PQ result is reachable through one
    of the query's probed lists (candidate-restriction semantics); on
    the planted cell corpus with list-aligned coarse centroids, IVF-PQ
    with nprobe=1 still finds the co-cell neighbors (lists align with
    cells, so no recall is lost)."""
    from hdk_spark.operators.similarity import ann_ivfpq_topk, pq_topk

    dsub, m = 4, 2
    vals = (-1.0, 1.0)
    cbs = [[[v] * dsub for v in vals] for _ in range(m)]
    rows = []
    for i in range(40):
        c0, c1 = vals[i % 2], vals[(i // 2) % 2]
        jit = (i % 5) * 0.01
        rows.append((i, [c0 + jit] * dsub + [c1 - jit] * dsub))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    # coarse centroids = the 4 cell centers (8-dim)
    cents = {
        0: [-1.0] * 4 + [-1.0] * 4, 1: [1.0] * 4 + [-1.0] * 4,
        2: [-1.0] * 4 + [1.0] * 4, 3: [1.0] * 4 + [1.0] * 4,
    }
    got = ann_ivfpq_topk(df, [0], cents, cbs, k=9, nprobe=1).collect()
    same_cell = {i for i in range(1, 40) if i % 2 == 0 and (i // 2) % 2 == 0}
    assert {r["neighbor_id"] for r in got} == same_cell
    # nprobe = all lists == flat PQ ranking
    full = ann_ivfpq_topk(df, [0], cents, cbs, k=9, nprobe=4).collect()
    flat = pq_topk(df, [0], cbs, k=9).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, flat))


def test_mine_contrastive_pairs_exact_vs_brute_force(spark):
    """Triplet mining (exact candidate mode) == a pure-Python brute
    force: symmetrize pairs, classify on the 6dp-rounded cosine, best
    positive / best hard negative per anchor with (max cosine, min
    partner) tie-break; anchors missing either side drop; band guard."""
    import math

    import pytest

    from hdk_spark.operators.similarity import mine_contrastive_pairs

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),     # ~0.994 with 0 -> positive
        (2, [0.5, 0.5, 0.5, 0.5]),     # 0.5 with 0 -> negative band
        (3, [0.45, 0.55, 0.5, 0.5]),   # near 2 -> positive for 2
        (4, [0.0, 1.0, 0.0, 0.0]),     # orthogonal to 0
        (5, [-1.0, 0.0, 0.0, 0.0]),    # anti-parallel
    ]
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<double>")
    PT, LO, HI = 0.9, 0.3, 0.7
    got = {
        r["anchor"]: (r["positive"], r["pos_cos"], r["negative"], r["neg_cos"])
        for r in mine_contrastive_pairs(
            df, pos_threshold=PT, neg_lo=LO, neg_hi=HI, mode="exact"
        ).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(num / math.sqrt(sum(x * x for x in a))
                     / math.sqrt(sum(x * x for x in b)), 6)

    best = {}
    for i, va in vecs:
        P, N = [], []
        for j, vb in vecs:
            if i == j:
                continue
            c = cos(va, vb)
            if c < LO:
                continue
            if c >= PT:
                P.append((-c, j))
            elif c < HI:
                N.append((-c, j))
        if P and N:
            p = min(P)
            n = min(N)
            best[i] = (p[1], -p[0], n[1], -n[0])
    assert got == best
    assert got  # the planted structure yields at least one triplet

    with pytest.raises(ValueError, match="neg_lo"):
        mine_contrastive_pairs(df, pos_threshold=0.5, neg_lo=0.6, neg_hi=0.7)


def test_mine_contrastive_anchor_sampling(spark):
    """anchor_pct=100 == the full-anchor LSH path exactly; a sampled
    run equals the full run restricted to the hash-sampled anchors
    (partners still drawn from the whole corpus); exact-mode guard."""
    import pytest

    from hdk_spark.operators.similarity import mine_contrastive_pairs

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(16)])
            for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    kw = dict(pos_threshold=0.8, neg_lo=0.3, neg_hi=0.7)

    full = {r["anchor"]: (r["positive"], r["negative"], r["pos_cos"])
            for r in mine_contrastive_pairs(df, **kw).collect()}
    all100 = {r["anchor"]: (r["positive"], r["negative"], r["pos_cos"])
              for r in mine_contrastive_pairs(df, anchor_pct=100,
                                              **kw).collect()}
    assert all100 == full and full

    samp = {r["anchor"]: (r["positive"], r["negative"], r["pos_cos"])
            for r in mine_contrastive_pairs(df, anchor_pct=30,
                                            **kw).collect()}
    MULT, MOD = 2654435761, 1_000_000_007
    sampled = {i for i, _ in rows if ((i * MULT + 7 + 501) % MOD) % 100 < 30}
    assert samp == {k: v for k, v in full.items() if k in sampled}
    assert 0 < len(samp) < len(full)

    with pytest.raises(ValueError, match="anchor_pct"):
        mine_contrastive_pairs(df, mode="exact", anchor_pct=50, **kw)
    with pytest.raises(ValueError, match="anchor_pct"):
        mine_contrastive_pairs(df, anchor_pct=0, **kw)


def test_ann_multiprobe_monotone_recall(spark):
    """Multi-probe LSH: more probes never hurt — per (qid, rank) the
    cosine under T probes is >= the cosine under T' < T (candidate
    superset); an exact duplicate is always retrieved at T=1 (same
    bucket by construction); probe-count guard; deterministic under
    repartition."""
    import pytest

    from hdk_spark.operators.similarity import ann_multiprobe_topk

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(16)])
            for i in range(200)]
    rows.append((500, rows[0][1]))  # exact duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    qids = [0, 3, 9]

    per_t = {}
    for t in (1, 3, 5):
        per_t[t] = {
            (r["qid"], r["rank"]): (r["neighbor_id"], r["cosine"])
            for r in ann_multiprobe_topk(
                df, qids, k=5, n_planes=4, n_probes=t).collect()
        }
    for lo, hi in ((1, 3), (3, 5)):
        for key, (_, c_lo) in per_t[lo].items():
            if key in per_t[hi]:
                assert per_t[hi][key][1] >= c_lo - 1e-12, (lo, hi, key)

    # an exact duplicate shares the exact bucket -> retrieved at T=1
    # with cosine exactly 1.0 at rank 1 (the planted vectors repeat
    # with period 11, so several ids tie at 1.0; smallest id wins)
    t1 = per_t[1]
    assert t1[(0, 1)][1] == 1.0 and t1[(0, 1)][0] == 11

    again = {
        (r["qid"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ann_multiprobe_topk(
            df.repartition(5), qids, k=5, n_planes=4, n_probes=5).collect()
    }
    assert again == per_t[5]

    with pytest.raises(ValueError, match="n_probes"):
        ann_multiprobe_topk(df, qids, n_planes=4, n_probes=6)
    with pytest.raises(ValueError, match="n_probes"):
        ann_multiprobe_topk(df, qids, n_planes=4, n_probes=0)


def test_ann_multiprobe_numpy_mode_matches_deterministic(spark):
    """deterministic=False (the production numpy corpus kernel) emits
    the SAME result as the fold-based oracle mode on an integer-valued
    corpus: plane dots are exact integers in float64, so the sign rule
    and the norm agree bit-for-bit across kernels (the same split
    ann_lsh_topk pins; near-zero float dots are where the kernels may
    legitimately diverge, which integer vectors exclude)."""
    from hdk_spark.operators.similarity import ann_multiprobe_topk

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(16)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    qids = [0, 3, 9]
    kw = dict(k=5, n_planes=6, n_probes=3)
    det = {(r["qid"], r["rank"]): (r["neighbor_id"], r["cosine"])
           for r in ann_multiprobe_topk(
               df, qids, deterministic=True, **kw).collect()}
    fast = {(r["qid"], r["rank"]): (r["neighbor_id"], r["cosine"])
            for r in ann_multiprobe_topk(
                df, qids, deterministic=False, **kw).collect()}
    assert det == fast and len(det) > 0


def test_ann_multiprobe_numpy_mode_exact_duplicate_at_one_probe(spark):
    """The numpy/fold seam fix, pinned: in production mode the query's
    exact bucket is read from the SAME numpy-hashed relation as the
    corpus, so an exact duplicate is retrieved at n_probes=1 with
    cosine 1.0 even on float vectors whose near-zero plane dots could
    sign-flip between kernels (a fold-derived query bucket could miss
    the duplicate's bucket entirely)."""
    import math

    from hdk_spark.operators.similarity import ann_multiprobe_topk

    rows = [
        (i, [math.sin(i * 0.7 + j) * 0.1 + (1e-12 if j == 0 else 0.0)
             for j in range(16)])
        for i in range(150)
    ]
    rows.append((900, rows[5][1]))  # exact duplicate of vec 5
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {
        (r["qid"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ann_multiprobe_topk(
            df, [5], k=3, n_planes=6, n_probes=1,
            deterministic=False).collect()
    }
    assert got[(5, 1)] == (900, 1.0)


def test_ann_multiprobe_drops_wrong_width_vectors(spark):
    """The dimension gate (ADVICE r10): a truncated/corrupt vector is
    DROPPED in both kernels instead of silently landing in bucket 0
    with NULL cosines (deterministic fold) or breaking the Arrow
    batch into an object-dtype matmul (numpy). Results with the
    ragged row present must equal results on the clean corpus, in
    BOTH modes."""
    from hdk_spark.operators.similarity import ann_multiprobe_topk

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(16)])
            for i in range(120)]
    clean = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>")
    ragged = spark.createDataFrame(
        rows + [(700, [1.0, 2.0]), (701, None)],
        "vec_id: long, embedding: array<double>")
    qids = [0, 3]
    for det in (True, False):
        want = sorted(map(tuple, ann_multiprobe_topk(
            clean, qids, k=5, n_planes=4, n_probes=3, dim=16,
            deterministic=det).collect()))
        got = sorted(map(tuple, ann_multiprobe_topk(
            ragged, qids, k=5, n_planes=4, n_probes=3, dim=16,
            deterministic=det).collect()))
        assert got == want and len(got) == 10, f"deterministic={det}"


def test_sq8_reconstruction_and_recall(spark):
    """SQ8 scalar quantization: (a) exact-bounds train is deterministic
    and d-sized; (b) per-dim reconstruction error <= (hi-lo)/510 + eps
    (round-to-nearest on a 255-step grid); (c) codes are int8-ranged
    with the extremes hitting -128/127; (d) dequantized cosine top-k
    recall@5 vs exact float cosine is high on clustered vectors;
    (e) constant dims encode to 0 and reconstruct exactly; (f)
    repartition determinism."""
    import math

    from pyspark.sql import functions as F

    from hdk_spark.operators.similarity import (
        cosine_topk,
        sq8_encode,
        sq8_topk,
        sq8_train,
    )

    rows = [
        (i, [math.sin((i % 16) * 0.9 + j * 0.31) * (1 + j % 3) for j in range(8)]
            + [2.5])  # dim 8 is CONSTANT across the corpus
        for i in range(160)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    bounds = sq8_train(df)
    assert len(bounds) == 9
    assert bounds == sq8_train(df.repartition(7))
    lo8, hi8 = bounds[8]
    assert lo8 == hi8 == 2.5

    codes = {r["id"]: r["codes"] for r in sq8_encode(df, bounds).collect()}
    flat = [c for cs in codes.values() for c in cs]
    assert min(flat) == -128 and max(flat) == 127
    assert all(cs[8] == 0 for cs in codes.values())  # constant dim -> 0

    # reconstruction bound per dim
    for i, vec in rows:
        for j, x in enumerate(vec):
            lo, hi = bounds[j]
            scale = (hi - lo) / 255.0 if hi > lo else 0.0
            deq = lo + (codes[i][j] + 128.0) * scale
            tol = (hi - lo) / 510.0 + 1e-9 if hi > lo else 1e-12
            assert abs(deq - x) <= tol, (i, j, deq, x)

    exact = {
        (r["qid"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(df, [0, 1, 2], k=5).collect()
    }
    approx = {
        (r["qid"], r["rank"]): r["neighbor_id"]
        for r in sq8_topk(df, [0, 1, 2], bounds, k=5).collect()
    }
    # set-level recall@5 per query (ranks may swap among near-ties)
    for q in (0, 1, 2):
        e = {v for (qq, _), v in exact.items() if qq == q}
        a = {v for (qq, _), v in approx.items() if qq == q}
        assert len(e & a) >= 4, (q, e, a)


def test_sq8_coded_corpus_composes_with_ann(spark):
    """The coded-lake × sub-linear-search composition (VERDICT r10
    item #6): an sq8_encode relation + bounds fed straight into
    ann_multiprobe_topk / ann_lsh_topk must (a) equal running the
    same kernel over the explicitly-decoded floats (the composition
    is sq8_decode inside, nothing else), (b) keep high set-recall vs
    the float-corpus kernel at the same params (the 255-step grid
    moves near-tie ranks only), (c) reject codes without bounds, and
    (d) be repartition-deterministic."""
    import math

    import pytest

    from hdk_spark.operators.similarity import (
        ann_lsh_topk,
        ann_multiprobe_topk,
        sq8_decode,
        sq8_encode,
        sq8_train,
    )

    rows = [
        (i, [math.sin((i % 16) * 0.9 + j * 0.31) * (1 + j % 3)
             for j in range(16)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    bounds = sq8_train(df)
    coded = sq8_encode(df, bounds)
    qids = [0, 1, 2]
    kw = dict(k=5, n_planes=4, n_probes=4)

    composed = sorted(map(tuple, ann_multiprobe_topk(
        None, qids, codes=coded, bounds=bounds, **kw).collect()))
    explicit = sorted(map(tuple, ann_multiprobe_topk(
        sq8_decode(coded, bounds), qids, id_col="id", vec_col="v",
        **kw).collect()))
    assert composed == explicit and len(composed) == 15

    again = sorted(map(tuple, ann_multiprobe_topk(
        None, qids, codes=coded.repartition(7), bounds=bounds,
        **kw).collect()))
    assert again == composed

    # set-recall vs the float corpus through the SAME kernel/params
    flt = {q: set() for q in qids}
    for r in ann_multiprobe_topk(df, qids, **kw).collect():
        flt[r["qid"]].add(r["neighbor_id"])
    cod = {q: set() for q in qids}
    for q, n, _, _ in composed:
        cod[q].add(n)
    for q in qids:
        assert len(flt[q] & cod[q]) >= 4, (q, flt[q], cod[q])

    # the L-tables kernel takes the same entrance (deterministic mode
    # so near-zero fold-vs-numpy sign flips can't shift buckets)
    lsh = sorted(map(tuple, ann_lsh_topk(
        None, qids, k=5, n_planes=4, n_tables=4, deterministic=True,
        codes=coded, bounds=bounds).collect()))
    lsh_explicit = sorted(map(tuple, ann_lsh_topk(
        sq8_decode(coded, bounds), qids, k=5, n_planes=4, n_tables=4,
        deterministic=True, id_col="id", vec_col="v").collect()))
    assert lsh == lsh_explicit and len(lsh) > 0

    # IVF — SCALE.md's preferred path above ~100k vectors — takes the
    # same entrance (explicit centroids = the oracle-checkable mode)
    from hdk_spark.operators.clustering import kmeans_centroids
    from hdk_spark.operators.similarity import ann_ivf_topk

    cents = kmeans_centroids(
        sq8_decode(coded, bounds), k=4, iters=1, seed=0,
        id_col="id", vec_col="v")
    ivf = sorted(map(tuple, ann_ivf_topk(
        None, qids, k=5, n_lists=4, nprobe=2, centroids=cents,
        codes=coded, bounds=bounds).collect()))
    ivf_explicit = sorted(map(tuple, ann_ivf_topk(
        sq8_decode(coded, bounds), qids, k=5, n_lists=4, nprobe=2,
        centroids=cents, id_col="id", vec_col="v").collect()))
    assert ivf == ivf_explicit and len(ivf) > 0

    with pytest.raises(ValueError, match="bounds"):
        ann_multiprobe_topk(None, qids, codes=coded)
    with pytest.raises(ValueError, match="bounds"):
        ann_lsh_topk(None, qids, codes=coded)
    with pytest.raises(ValueError, match="bounds"):
        ann_ivf_topk(None, qids, codes=coded)

    # an explicit dim= that CONFLICTS with the width implied by
    # bounds/centroids raises instead of being silently overridden
    # (ADVICE r12) — a matching dim= stays accepted
    wrong = len(bounds) + 1
    with pytest.raises(ValueError, match="conflicts"):
        ann_multiprobe_topk(None, qids, codes=coded, bounds=bounds,
                            dim=wrong)
    with pytest.raises(ValueError, match="conflicts"):
        ann_lsh_topk(None, qids, codes=coded, bounds=bounds, dim=wrong)
    with pytest.raises(ValueError, match="conflicts"):
        ann_ivf_topk(None, qids, codes=coded, bounds=bounds, dim=wrong)
    with pytest.raises(ValueError, match="conflicts"):
        ann_ivf_topk(None, qids, centroids=cents, dim=wrong,
                     codes=None)
    ivf_dim_ok = sorted(map(tuple, ann_ivf_topk(
        None, qids, k=5, n_lists=4, nprobe=2, centroids=cents,
        codes=coded, bounds=bounds, dim=len(bounds)).collect()))
    assert ivf_dim_ok == ivf


def test_bitext_auto_plane_count(spark):
    """n_planes=None derives max(8, ceil(log2(max(|src|, |tgt|))))
    from two corpus counts: at ≤256 rows per side the floor (8)
    applies and the result equals an explicit n_planes=8 run; at a
    600-row side it equals explicit n_planes=10 — the docstring's
    raise-planes-with-n law as an opt-in instead of a human step."""
    from hdk_spark.operators.similarity import bitext_mine

    def vec(i):
        return [float((i * 13 + j * 5) % 17 - 8) for j in range(16)]

    small_src = spark.createDataFrame(
        [(i, vec(i)) for i in range(0, 40, 2)],
        "vec_id: long, embedding: array<double>")
    small_tgt = spark.createDataFrame(
        [(i, vec(i - 1)) for i in range(1, 41, 2)],
        "vec_id: long, embedding: array<double>")
    kw = dict(k=2, threshold=1.0, n_probes=2, dim=16)
    auto = sorted(map(tuple, bitext_mine(
        small_src, small_tgt, n_planes=None, **kw).collect()))
    explicit = sorted(map(tuple, bitext_mine(
        small_src, small_tgt, n_planes=8, **kw).collect()))
    assert auto == explicit and len(auto) > 0

    big_src = spark.createDataFrame(
        [(i, vec(i)) for i in range(600)],
        "vec_id: long, embedding: array<double>")
    auto_big = sorted(map(tuple, bitext_mine(
        big_src, small_tgt, n_planes=None, **kw).collect()))
    explicit_10 = sorted(map(tuple, bitext_mine(
        big_src, small_tgt, n_planes=10, **kw).collect()))
    assert auto_big == explicit_10


def test_bitext_mine_planted_alignment(spark):
    """bitext_mine (Artetxe & Schwenk margin): every src with a
    planted unique tgt twin mines exactly that twin at cosine 1.0;
    mixture srcs (equidistant from two tgt shapes — the hub/decoy
    regime) get margins DEFLATED below every twin's margin and below
    1.0, which raw cosine top-1 cannot do; deterministic under
    repartition; guards."""
    import pytest

    from hdk_spark.operators.similarity import bitext_mine

    def vec(i):
        return [float((i * 7 + j * 3) % 11 - 5) for j in range(16)]

    def mix(a, b):
        return [(x + y) / 2.0 for x, y in zip(vec(a), vec(b))]

    src_rows = [(i, vec(i)) for i in range(11)] + [
        (50, mix(0, 1)), (51, mix(2, 5))]
    src = spark.createDataFrame(
        src_rows, "vec_id: long, embedding: array<double>")
    tgt = spark.createDataFrame(
        [(1000 + i, vec(i)) for i in range(11)],
        "vec_id: long, embedding: array<double>")

    kw = dict(k=2, n_planes=4, n_probes=3)
    allp = {
        r["src_id"]: (r["tgt_id"], r["cosine"], r["margin"])
        for r in bitext_mine(src, tgt, threshold=0.0, **kw).collect()
    }
    twin_margins = []
    for i in range(11):
        tid, cos, margin = allp[i]
        assert cos == 1.0 and tid == 1000 + i, (i, allp[i])
        twin_margins.append(margin)
    # mixtures: top candidates near-tied -> neighborhood average hugs
    # the best cosine -> margin < 1 < every twin margin
    for d in (50, 51):
        assert allp[d][2] < 1.0, allp[d]
        assert allp[d][2] < min(twin_margins)
    # at threshold 1.0 the mined set is exactly the twins
    mined = {
        r["src_id"] for r in bitext_mine(src, tgt, threshold=1.0,
                                         **kw).collect()
    }
    assert mined == set(range(11))

    again = {
        r["src_id"]: (r["tgt_id"], r["cosine"], r["margin"])
        for r in bitext_mine(src.repartition(5), tgt.repartition(3),
                             threshold=0.0, **kw).collect()
    }
    assert again == allp

    with pytest.raises(ValueError, match="k must"):
        bitext_mine(src, tgt, k=0)
    with pytest.raises(ValueError, match="n_probes"):
        bitext_mine(src, tgt, n_planes=4, n_probes=9)


def test_ann_lsh_and_ivf_drop_wrong_width_vectors(spark):
    """r11 review finding: the wrong-width drop gate multiprobe got in
    r10 was missing from ann_lsh_topk and ann_ivf_topk — including
    their new codes= entrances, where a user-supplied ragged codes
    relation decodes to a short vector. Ragged/NULL rows must change
    NOTHING vs the clean corpus in every mode of both kernels."""
    from hdk_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        sq8_encode,
        sq8_train,
    )

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(16)])
            for i in range(120)]
    clean = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>")
    ragged = spark.createDataFrame(
        rows + [(700, [1.0, 2.0]), (701, None)],
        "vec_id: long, embedding: array<double>")
    qids = [0, 3]

    for det in (True, False):
        want = sorted(map(tuple, ann_lsh_topk(
            clean, qids, k=5, n_planes=4, n_tables=4,
            deterministic=det).collect()))
        got = sorted(map(tuple, ann_lsh_topk(
            ragged, qids, k=5, n_planes=4, n_tables=4,
            deterministic=det).collect()))
        assert got == want and len(got) == 10, f"lsh det={det}"

    cents = {0: [1.0] * 16, 1: [-1.0] * 16, 2: [0.5] * 8 + [-0.5] * 8}
    for kw in (dict(centroids=cents), dict(train_sample=64)):
        want = sorted(map(tuple, ann_ivf_topk(
            clean, qids, k=5, n_lists=3, nprobe=2, **kw).collect()))
        got = sorted(map(tuple, ann_ivf_topk(
            ragged, qids, k=5, n_lists=3, nprobe=2, **kw).collect()))
        assert got == want and len(got) == 10, f"ivf {kw.keys()}"

    # ragged row smuggled through a codes= relation: decoded short
    # vector must be dropped inside both kernels
    bounds = sq8_train(clean)
    codes_clean = sq8_encode(clean, bounds)
    bad = spark.createDataFrame(
        [(700, [1, 2])], "id: long, codes: array<tinyint>")
    codes_ragged = codes_clean.unionByName(bad)
    want = sorted(map(tuple, ann_lsh_topk(
        None, qids, k=5, n_planes=4, n_tables=4, deterministic=True,
        codes=codes_clean, bounds=bounds).collect()))
    got = sorted(map(tuple, ann_lsh_topk(
        None, qids, k=5, n_planes=4, n_tables=4, deterministic=True,
        codes=codes_ragged, bounds=bounds).collect()))
    assert got == want and len(got) == 10
    want = sorted(map(tuple, ann_ivf_topk(
        None, qids, k=5, n_lists=3, nprobe=2, centroids=cents,
        codes=codes_clean, bounds=bounds).collect()))
    got = sorted(map(tuple, ann_ivf_topk(
        None, qids, k=5, n_lists=3, nprobe=2, centroids=cents,
        codes=codes_ragged, bounds=bounds).collect()))
    assert got == want and len(got) == 10


def test_vec_dim_majority_not_first_row(spark):
    """_vec_dim infers the MAJORITY width of a bounded sample, so a
    corrupt vector in row-1 position cannot set d and make the drop
    gates empty the corpus (r11 review finding — first() + gate
    silently dropped every well-formed vector)."""
    from hdk_spark.operators.dedup import _vec_dim
    from hdk_spark.operators.similarity import ann_lsh_topk

    rows = [(0, [9.9, 9.9])] + [
        (i, [float(i + j) for j in range(16)]) for i in range(1, 80)]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>").coalesce(1)
    assert _vec_dim(df, "embedding") == 16
    out = ann_lsh_topk(df, [1, 2], k=3, n_planes=4, n_tables=4,
                       deterministic=True)
    assert len(out.collect()) == 6  # corpus survived; glitch dropped


def test_dim_passthrough_skips_inference_same_results(spark):
    """dim= passthrough (VERDICT r11 #2): callers that know the lake's
    width (the bench, production loops) skip the _vec_dim inference
    job. Results must be IDENTICAL to the inferred path in every mode
    of all three kernels, the width-gate filter must still run (a
    ragged corpus with dim= given behaves like the clean one), and a
    deliberately wrong dim= must gate everything out rather than feed
    ragged batches to the kernels."""
    from hdk_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        ann_multiprobe_topk,
    )

    rows = [(i, [float((i * 5 + j * 2) % 13 - 6) for j in range(16)])
            for i in range(100)]
    clean = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>")
    ragged = spark.createDataFrame(
        rows + [(900, [1.0]), (901, None)],
        "vec_id: long, embedding: array<double>")
    qids = [0, 2]

    for det in (True, False):
        inferred = sorted(map(tuple, ann_lsh_topk(
            clean, qids, k=4, n_planes=4, n_tables=4,
            deterministic=det).collect()))
        given = sorted(map(tuple, ann_lsh_topk(
            clean, qids, k=4, n_planes=4, n_tables=4,
            deterministic=det, dim=16).collect()))
        gated = sorted(map(tuple, ann_lsh_topk(
            ragged, qids, k=4, n_planes=4, n_tables=4,
            deterministic=det, dim=16).collect()))
        assert given == inferred == gated, f"lsh det={det}"

    inferred = sorted(map(tuple, ann_ivf_topk(
        clean, qids, k=4, n_lists=3, nprobe=2, train_sample=64).collect()))
    given = sorted(map(tuple, ann_ivf_topk(
        clean, qids, k=4, n_lists=3, nprobe=2, train_sample=64,
        dim=16).collect()))
    gated = sorted(map(tuple, ann_ivf_topk(
        ragged, qids, k=4, n_lists=3, nprobe=2, train_sample=64,
        dim=16).collect()))
    assert given == inferred == gated

    inferred = sorted(map(tuple, ann_multiprobe_topk(
        clean, qids, k=4, n_planes=4, n_probes=2).collect()))
    given = sorted(map(tuple, ann_multiprobe_topk(
        clean, qids, k=4, n_planes=4, n_probes=2, dim=16).collect()))
    assert given == inferred

    # wrong dim= gates out the whole corpus — explicit, not a crash
    assert ann_lsh_topk(clean, qids, k=4, n_planes=4, n_tables=4,
                        dim=8).count() == 0
    assert ann_ivf_topk(clean, qids, k=4, n_lists=3, nprobe=2,
                        train_sample=64, dim=8).count() == 0
