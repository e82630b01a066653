"""Blanket scale-hygiene gate: NO registry query may plan a cartesian
product or a broadcast-nested-loop join — the two shapes that melt at
100 TB — except the explicitly whitelisted single-row scalar-subquery
broadcasts (a 1-row build side is a constant, not a join blowup).

This inspects the planned physical plan only (no execution), so the
whole 121-query sweep is cheap and runs in CI with every suite."""

from __future__ import annotations

import pytest

from apd_map_reduce_spark.registry import ALL_QUERIES

from .conftest import SF_SMOKE

# Queries whose plan legitimately contains a nested-loop/cross join of
# a SINGLE-ROW aggregate (scalar subquery broadcast). Each is a 1-row
# build side — constant-folding via join, bounded by construction.
SCALAR_BROADCAST_OK = {
    "customers_above_nation_avg",  # global avg acctbal (1 row)
    "q11_top_value_parts",         # global value total (1 row)
    "q22_idle_rich_customers",     # TPC-H q22 scalar avg subquery (1 row)
    "text_cooccurrence_pmi",       # corpus totals (2x 1 row)
    "text_tfidf_top_terms",        # doc count (1 row)
    "dedup_weighted_cosine",       # doc count for idf (1 row)
    "text_bm25_search",            # (n_docs, total_tokens) scalars (1 row)
    "text_bm25_multi_search",      # same (n_docs, total_tokens) scalar (1 row)
    "text_dsir_weights",           # (n_raw, n_tgt) corpus totals (1 row)
    "graph_triangle_count",        # n_edges x n_triangles (1 row each)
    "stats_mad_prices",            # per-group medians joined back (tiny)
    # The brute-force ANN baselines broadcast a FIXED-SIZE probe set
    # against the corpus by contract (O(|Q|*N) documented); the scale
    # paths are ann_lsh_topk / ann_ivf_topk, which are keyed joins.
    "ann_cosine_topk",
    "ann_int8_topk",
    # Hybrid RRF: inherits bm25_search's (n_docs, total_tokens) scalar
    # AND broadcasts the single probe-embedding row (1 row by filter).
    "text_hybrid_rrf_search",
    # Recall audit: three single-row COUNT aggregates cross-joined
    # into the one-row summary (1 row x 1 row x 1 row).
    "dedup_lsh_recall_audit",
    "dedup_lsh_recall_audit_sampled",  # same one-row summary shape
    # The ANN recall audits inherit ann_cosine_topk's documented
    # fixed-probe broadcast (their truth side IS that baseline) plus
    # the same 1-row x 1-row x 1-row summary cross-join.
    "ann_ivf_recall_audit",
    "ann_lsh_recall_audit",
    # IVF-style centroid assignment: every vector must see every
    # centroid; the broadcast side is the K-row centroid pool, bounded
    # by the SEMDEDUP_MAX_CLUSTERS=256 clamp (constant, not data-sized).
    "dedup_semantic_clusters",
    "events_heavy_hitters",        # global event total (1 row)
    "mixture_temperature_rates",   # normalizing weight total (1 row)
    "events_decayed_totals",       # newest-event anchor timestamp (1 row)
    "graph_assoc_rules",           # basket-count N for support/lift (1 row)
}


@pytest.mark.parametrize("qdef", ALL_QUERIES, ids=[q.name for q in ALL_QUERIES])
def test_no_unbounded_join_shapes(spark, qdef):
    plan = (
        qdef.fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{qdef.name} plans a cartesian product"
    if qdef.name not in SCALAR_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{qdef.name} plans a nested-loop join (not whitelisted as a "
            "scalar broadcast):\n" + plan[:1200]
        )
