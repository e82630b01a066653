"""Reference-model tests for the iterative operators added in round 3:
integer PageRank vs a pure-Python recurrence, k-means vs numpy Lloyd.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.cluster import (
    K,
    assign_literal_centroids,
    cluster_stats,
    init_centroids,
    kmeans_assign,
)
from apd_map_reduce_spark.operators.graph import PR_ITERS, PR_SCALE, pagerank_topk

from .conftest import SF_SMOKE


def _py_pagerank(edges, iters=PR_ITERS):
    """The exact integer recurrence, dict-based."""
    out = {}
    for a, b in edges:
        out.setdefault(a, set()).add(b)
        out.setdefault(b, set()).add(a)
    deg = {u: len(vs) for u, vs in out.items()}
    n = len(deg)
    tele = (15 * PR_SCALE // 100) // n
    rank = {u: PR_SCALE // n for u in deg}
    for _ in range(iters):
        nxt = {u: tele for u in deg}
        for u, vs in out.items():
            c = (rank[u] * 85) // (100 * deg[u])
            for v in vs:
                nxt[v] += c
        rank = nxt
    return rank


def test_pagerank_matches_python_reference(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (1, 5), (6, 7)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.part_node: r.rank_scaled for r in pagerank_topk(df, k=100).collect()}
    want = _py_pagerank(edges)
    assert got == want
    # high-degree node 3 outranks the leaf pair component
    assert want[3] == max(want.values())


def test_kmeans_matches_numpy_lloyd(spark):
    emb = spark.createDataFrame(
        [
            (i, [float((i * 37 + d * 11) % 23) / 23.0 - 0.5 for d in range(64)])
            for i in range(60)
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.cluster_id for r in kmeans_assign(emb).collect()}

    # numpy reference: identical init, one stats pass, reassign
    X = np.array(
        [[float((i * 37 + d * 11) % 23) / 23.0 - 0.5 for d in range(64)] for i in range(60)],
        dtype=np.float32,
    ).astype(np.float64)
    C = np.array([row for _, row in init_centroids()])
    d1 = np.round(np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)), 6)
    a1 = d1.argmin(1)  # argmin takes the lowest index on ties = cid tie-break
    C2, cids = [], []
    for c in sorted(set(a1.tolist())):
        members = X[a1 == c]
        sums = np.floor(members * 1e6).sum(0)
        C2.append(sums / (len(members) * 1e6))
        cids.append(c)
    C2 = np.array(C2)
    d2 = np.round(np.sqrt(((X[:, None, :] - C2[None, :, :]) ** 2).sum(-1)), 6)
    a2 = [cids[j] for j in d2.argmin(1)]
    want = {i: a2[i] for i in range(60)}
    assert got == want


def test_kmeans_real_embeddings_cluster_sizes(spark):
    from apd_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    assigned = kmeans_assign(emb)
    n = assigned.count()
    assert n == emb.count()
    k_used = assigned.select("cluster_id").distinct().count()
    assert 1 <= k_used <= K
    # every distance non-negative, rounded to 6 dp
    bad = assigned.filter((F.col("dist6") < 0)).count()
    assert bad == 0


def test_cluster_stats_counts_sum_to_corpus(spark):
    emb = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, [0.0, 0.0]), (1, [4.0, 6.0])]
    assigned = assign_literal_centroids(emb, cents)
    stats = cluster_stats(assigned).collect()
    per_pos = {}
    for r in stats:
        per_pos.setdefault(r.pos, 0)
        per_pos[r.pos] += r.n_members
    assert set(per_pos.values()) == {40}


def test_pq_adc_exact_copy_ranks_first_and_scores_check(spark):
    import math

    from apd_map_reduce_spark.operators.cluster import (
        PQ_SUB,
        pq_adc_topk,
        pq_codebooks,
    )
    from apd_map_reduce_spark.plans.quality import uses_broadcast_join

    books = pq_codebooks()
    # Corpus: vec 5 is an exact copy of the probe (vec 0) — identical
    # codes, so its ADC distance is the global minimum (the probe's own
    # quantization profile) and it must rank first. Vecs 6/7 are
    # stitched from other codebook entries (far cells).
    base = []
    for mi in range(4):
        base.extend(books[mi][1][1])
    far_a, far_b = [], []
    for mi in range(4):
        far_a.extend(books[mi][6][1])
        far_b.extend(books[mi][7][1])
    rows = [(0, base), (5, list(base)), (6, far_a), (7, far_b)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    df = pq_adc_topk(emb, n_queries=1, k=3)
    assert uses_broadcast_join(df), "per-query LUTs must broadcast"
    got = sorted((r.rnk, r.neighbor_id, r.adc6) for r in df.collect())
    assert got[0][1] == 5, "exact copy (same codes) must be the top neighbor"
    # Expected score: per-subspace round-6 L2 from the float32-stored
    # probe to its NEAREST codebook entry, squared and summed. The
    # planted subspaces are codebook entry 1 exactly, so each distance
    # is the float32 storage wobble — ~0 after round-6.
    exp = 0.0
    for mi in range(4):
        sub = base[mi * PQ_SUB : (mi + 1) * PQ_SUB]
        best = min(
            round(math.dist(sub, row), 6) for _, row in books[mi]
        )
        exp += best * best
    assert abs(got[0][2] - round(exp, 6)) <= 1e-6


def test_pq_codes_exact_codebook_vectors(spark):
    from apd_map_reduce_spark.operators.cluster import pq_assign, pq_codebooks

    books = pq_codebooks()
    # A vector stitched from one entry per subspace quantizes to exactly
    # those codes with zero reconstruction error.
    picks = [3, 0, 5, 7]
    vec = []
    for mi, c in enumerate(picks):
        vec.extend(books[mi][c][1])
    emb = spark.createDataFrame(
        [(1, [float(x) for x in vec])], "vec_id long, embedding array<float>"
    )
    row = pq_assign(emb).collect()[0]
    assert [row.code_1, row.code_2, row.code_3, row.code_4] == picks
    # float32 storage wobbles each component by <= ~6e-8; round-6 L2
    # over 16 dims stays well under 1e-5.
    assert row.qerr6 <= 1e-4
