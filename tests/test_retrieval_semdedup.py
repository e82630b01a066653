"""Semantic invariants for the round-4 additions: BM25 retrieval,
SemDeDup cluster pruning, and CCNet perplexity buckets. Value parity
with DuckDB is covered by test_oracle_parity; these assert the
operator CONTRACTS (policy invariants the hash alone wouldn't
localize a violation of).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.cooccur import BM25_QUERY, BM25_TOP_K, bm25_search
from apd_map_reduce_spark.operators.similarity import semdedup_prune
from apd_map_reduce_spark.operators.textstats import PPL_BUCKETS, perplexity_buckets
from apd_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_bm25_contract(spark):
    out = bm25_search(_docs(spark)).toPandas()
    assert len(out) == BM25_TOP_K
    # ranks are the dense prefix 1..k
    assert sorted(out["rank"]) == list(range(1, BM25_TOP_K + 1))
    # scores are positive (idf of the +1 variant is always > 0) and
    # non-increasing in rank order
    ordered = out.sort_values("rank")["score"].tolist()
    assert all(s > 0 for s in ordered)
    assert all(a >= b for a, b in zip(ordered, ordered[1:]))
    # every hit matched between 1 and |Q| query terms
    assert out["n_terms_matched"].between(1, len(BM25_QUERY)).all()


def test_bm25_rare_term_outranks_common_only_docs(spark):
    """A doc containing the rare query term should beat docs matching
    only the two common terms at equal tf — the idf ordering BM25
    exists to provide. The #1 doc on this corpus matches all 3 terms."""
    out = bm25_search(_docs(spark)).toPandas().sort_values("rank")
    assert out.iloc[0]["n_terms_matched"] == len(BM25_QUERY)


def test_semdedup_lowest_id_per_cluster_never_pruned(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = semdedup_prune(emb).toPandas()
    assert len(out) == emb.count()
    # keep-first policy: the minimum vec_id in every cluster has no
    # lower-id neighbor, so it can never be pruned
    firsts = out.groupby("cluster_id")["vec_id"].min().reset_index()
    merged = out.merge(firsts, on=["cluster_id", "vec_id"])
    assert not merged["pruned"].any()
    # and the policy actually bites on this corpus
    assert out["pruned"].sum() > 0


def test_semdedup_pruned_have_lower_id_near_neighbor(spark):
    """Every pruned vector must have a lower-id same-cluster neighbor
    with cosine >= threshold — recompute the witness set exactly."""
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = semdedup_prune(emb, threshold=0.3).toPandas()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
        for r in emb.select("vec_id", "embedding").collect()
    }
    by_cluster = out.groupby("cluster_id")["vec_id"].apply(list).to_dict()
    pruned = set(out[out["pruned"]]["vec_id"])
    cluster_of = dict(zip(out["vec_id"], out["cluster_id"]))
    for vid in out["vec_id"]:
        witnesses = [
            a
            for a in by_cluster[cluster_of[vid]]
            if a < vid
            and round(
                float(
                    vecs[a] @ vecs[vid]
                    / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[vid]))
                ),
                6,
            )
            >= 0.3
        ]
        assert (vid in pruned) == bool(witnesses), vid


def test_perplexity_buckets_balanced_per_lang(spark):
    out = perplexity_buckets(_docs(spark)).toPandas()
    # NTILE invariant: within each language, bucket sizes differ by <= 1
    sizes = out.groupby(["lang", "ppl_bucket"]).size()
    for lang, grp in sizes.groupby(level=0):
        assert grp.max() - grp.min() <= 1, lang
        assert set(grp.index.get_level_values(1)) == set(range(1, PPL_BUCKETS + 1))
    # labels follow the bucket ids
    assert (out[out["ppl_bucket"] == 1]["bucket_label"] == "head").all()
    assert (out[out["ppl_bucket"] == PPL_BUCKETS]["bucket_label"] == "tail").all()
    # head docs score >= tail docs within the same language
    for lang, grp in out.groupby("lang"):
        head_min = grp[grp["bucket_label"] == "head"]["mean_log10_freq"].min()
        tail_max = grp[grp["bucket_label"] == "tail"]["mean_log10_freq"].max()
        assert head_min >= tail_max, lang


def test_semdedup_k_scales_with_corpus():
    """K(N) contract: constant expected cluster size above the floor
    (linear total pair work), clamped to [16, 256]; the centroid family
    is prefix-stable so growing K refines rather than reshuffles."""
    from apd_map_reduce_spark.operators.similarity import (
        SEMDEDUP_MAX_CLUSTERS,
        SEMDEDUP_MIN_CLUSTERS,
        SEMDEDUP_TARGET_CLUSTER_ROWS,
        _centroids,
        semdedup_n_clusters,
    )

    assert semdedup_n_clusters(0) == SEMDEDUP_MIN_CLUSTERS
    assert semdedup_n_clusters(500) == SEMDEDUP_MIN_CLUSTERS  # historical fixed-K corpora unchanged
    assert semdedup_n_clusters(2000) == 63
    assert semdedup_n_clusters(10**9) == SEMDEDUP_MAX_CLUSTERS
    # linear regime: K proportional to N between the clamps
    n = 4096
    assert semdedup_n_clusters(2 * n) == 2 * semdedup_n_clusters(n)
    assert semdedup_n_clusters(n) == n // SEMDEDUP_TARGET_CLUSTER_ROWS
    # prefix stability
    assert _centroids(63)[:16] == _centroids(16)


def test_bm25_multi_q0_equals_fixed_probe(spark):
    """Query 0 of the parameterized variant is BM25_QUERY itself, so
    its per-doc scores and ranking must equal bm25_search's exactly."""
    from apd_map_reduce_spark.operators.cooccur import (
        BM25_MULTI_QUERY_SET,
        bm25_multi_search,
    )

    docs = _docs(spark)
    queries = spark.createDataFrame(
        list(BM25_MULTI_QUERY_SET), "query_id LONG, term STRING"
    )
    multi = (
        bm25_multi_search(docs, queries)
        .filter(F.col("query_id") == 0)
        .toPandas()
        .sort_values("rank")
    )
    single = bm25_search(docs).toPandas().sort_values("rank")
    assert multi["doc_id"].tolist() == single["doc_id"].tolist()
    assert multi["score"].tolist() == single["score"].tolist()
    assert multi["n_terms_matched"].tolist() == single["n_terms_matched"].tolist()


def test_bm25_multi_dedupes_repeated_query_terms(spark):
    """A query listing the same term twice scores it once (term-SET
    semantics), so duplicated input rows change nothing."""
    from apd_map_reduce_spark.operators.cooccur import bm25_multi_search

    docs = _docs(spark)
    base = [(0, "hash"), (0, "join")]
    qa = spark.createDataFrame(base, "query_id LONG, term STRING")
    qb = spark.createDataFrame(base + base, "query_id LONG, term STRING")
    a = bm25_multi_search(docs, qa).toPandas().sort_values(["query_id", "rank"])
    b = bm25_multi_search(docs, qb).toPandas().sort_values(["query_id", "rank"])
    assert a.values.tolist() == b.values.tolist()
