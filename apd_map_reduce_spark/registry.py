"""Central query registry — the driver contract surface.

`__spark_entry__.py` re-exports from here. Every QueryDef with an
oracle participates in the DuckDB hash-parity gate; oracle-less entries
(sketches, streaming) get the rows-only check.
"""

from __future__ import annotations

from apd_map_reduce_spark.operators.behavior import (
    BEHAVIOR_ORACLE,
    SEGMENT_AVG_ORACLE,
    fingerprint_pandas,
    segment_weighted_avg,
    user_behavior_features,
)
from apd_map_reduce_spark.operators.asof import ASOF_ORACLE, asof_last_order
from apd_map_reduce_spark.operators.components import (
    CANONICAL_SELECTION_ORACLE,
    DUP_GROUPS_ORACLE,
    canonical_selection,
    dup_groups,
)
from apd_map_reduce_spark.operators.textstats import FINGERPRINT_ORACLE
from apd_map_reduce_spark.operators.cluster import CLUSTER_QUERIES
from apd_map_reduce_spark.operators.cooccur import COOCCUR_QUERIES
from apd_map_reduce_spark.operators.curation import CURATION_QUERIES
from apd_map_reduce_spark.operators.dedup import DEDUP_QUERIES
from apd_map_reduce_spark.operators.graph import GRAPH_QUERIES
from apd_map_reduce_spark.operators.intervals import INTERVAL_QUERIES
from apd_map_reduce_spark.operators.pii import PII_QUERIES
from apd_map_reduce_spark.operators.quality import QUALITY_QUERIES
from apd_map_reduce_spark.operators.retrieval import RETRIEVAL_QUERIES
from apd_map_reduce_spark.operators.selection import SELECTION_QUERIES
from apd_map_reduce_spark.operators.udtfs import UDTF_QUERIES
from apd_map_reduce_spark.operators.vectors import VECTOR_QUERIES
from apd_map_reduce_spark.operators.multimodal import MULTIMODAL_QUERIES
from apd_map_reduce_spark.operators.pipeline import PIPELINE_QUERIES
from apd_map_reduce_spark.operators.similarity import SIMILARITY_QUERIES
from apd_map_reduce_spark.operators.skew import (
    SALTED_JOIN_ORACLE,
    SALTED_TOTALS_ORACLE,
    TOP_KEYS_ORACLE,
    salted_event_totals,
    salted_join_totals,
    top_keys_by_frequency,
)
from apd_map_reduce_spark.operators.snapshot import SNAPSHOT_QUERIES
from apd_map_reduce_spark.operators.textstats import TEXTSTATS_QUERIES
from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.queries.corpus import CORPUS_QUERIES
from apd_map_reduce_spark.queries.relational import RELATIONAL_QUERIES
from apd_map_reduce_spark.sources.tables import load_table

BEHAVIOR_QUERIES = [
    QueryDef(
        "user_behavior_features",
        lambda s, d: user_behavior_features(load_table(s, d, "events")),
        BEHAVIOR_ORACLE,
    ),
    # Same oracle as text_fingerprint: proves the scalar-pandas and
    # JVM-expression normalization paths are semantically identical.
    QueryDef(
        "text_fingerprint_pandas_udf",
        lambda s, d: fingerprint_pandas(load_table(s, d, "documents")),
        FINGERPRINT_ORACLE,
    ),
    QueryDef(
        "segment_avg_pandas_udf",
        lambda s, d: segment_weighted_avg(
            load_table(s, d, "orders"), load_table(s, d, "customer")
        ),
        SEGMENT_AVG_ORACLE,
    ),
    QueryDef(
        "events_asof_last_order",
        lambda s, d: asof_last_order(
            load_table(s, d, "events"), load_table(s, d, "orders")
        ),
        ASOF_ORACLE,
    ),
    # Iterative label propagation on the Spark side; the fixpoint has a
    # recursive-CTE twin, so this is hash-checked like everything else
    # (tests/test_components.py additionally checks a Python union-find
    # reference).
    QueryDef(
        "dedup_transitive_groups",
        lambda s, d: dup_groups(load_table(s, d, "documents")),
        DUP_GROUPS_ORACLE,
    ),
    # Per-group keep policy over the same transitive closure: longest
    # copy wins, min-id tiebreak (integer-exact selection).
    QueryDef(
        "dedup_canonical_selection",
        lambda s, d: canonical_selection(load_table(s, d, "documents")),
        CANONICAL_SELECTION_ORACLE,
    ),
    # Salted two-phase aggregation vs the plain GROUP BY oracle: the
    # skew mitigation is hash-checked result-transparent.
    QueryDef(
        "skew_salted_event_totals",
        lambda s, d: salted_event_totals(load_table(s, d, "events")),
        SALTED_TOTALS_ORACLE,
    ),
    QueryDef(
        "skew_top_keys",
        lambda s, d: top_keys_by_frequency(load_table(s, d, "events"), "user_id"),
        TOP_KEYS_ORACLE,
    ),
    # Salted fact⋈dim join vs the plain JOIN oracle: same
    # result-transparency proof as the salted aggregation above.
    QueryDef(
        "skew_salted_join_totals",
        lambda s, d: salted_join_totals(
            load_table(s, d, "events"), load_table(s, d, "customer")
        ),
        SALTED_JOIN_ORACLE,
    ),
]

# Family lists in declaration order; CORPUS first so the flagship
# corpus_inverted_index is entry 0 (the `entry()` contract).
_FAMILIES: list[list[QueryDef]] = [
    CORPUS_QUERIES,
    RELATIONAL_QUERIES,
    TEXTSTATS_QUERIES,
    DEDUP_QUERIES,
    SIMILARITY_QUERIES,
    MULTIMODAL_QUERIES,
    PIPELINE_QUERIES,
    BEHAVIOR_QUERIES,
    CURATION_QUERIES,
    QUALITY_QUERIES,
    PII_QUERIES,
    VECTOR_QUERIES,
    COOCCUR_QUERIES,
    INTERVAL_QUERIES,
    GRAPH_QUERIES,
    SNAPSHOT_QUERIES,
    CLUSTER_QUERIES,
    SELECTION_QUERIES,
    RETRIEVAL_QUERIES,
    UDTF_QUERIES,
]


def _interleave(families: list[list[QueryDef]]) -> list[QueryDef]:
    """Round-robin across families so any PREFIX of the registry
    samples the whole operator surface: the external correctness gate
    windows the first N entries, and a family-concatenated order would
    leave entire families (dedup, similarity, multimodal, …) outside
    the window, covered only by the builder's own selfcheck. With ~20
    families the first 50 entries carry 2-3 queries from every one."""
    out: list[QueryDef] = []
    for i in range(max(len(f) for f in families)):
        for fam in families:
            if i < len(fam):
                out.append(fam[i])
    return out


# The external gate hashes the first ~50 registry entries each round.
# Rotating the interleaved order by one window-width per round makes
# that gate CUMULATIVE: across rounds the driver externally verifies
# the whole registry, not the same 50-query prefix forever (r6 verdict
# directive #2). ROUND is committed once per round; the flagship stays
# pinned at entry 0 (the `entry()` / bench flagship contract).
ROUND = 13
_GATE_WINDOW = 49  # driver window (50) minus the pinned flagship

# Round 9 closes the cumulative-gate story (r8 verdict directive #1):
# these 17 queries are exactly the registry entries that appeared in
# NONE of the CORRECTNESS_r01..r08 driver windows (set-difference over
# those artifacts; scripts/check_rotation_coverage.py re-derives it).
# They are NOT adjacent in rotation order — the two ANN audits sit 100+
# positions from the events/stats tail — so no single 49-wide rotation
# window covers them. The r9 window therefore hoists them to positions
# 1-17; the remaining 32 slots continue the normal rotation. From r10
# on the plain rotation resumes with every query driver-hashed at least
# once.
_NEVER_DRIVER_HASHED_R9 = frozenset(
    {
        "q19_discounted_revenue",
        "events_funnel_timeout",
        "events_sequence_match",
        "events_error_bursts",
        "full_outer_reconcile",
        "events_locf_fill",
        "window_percent_rank",
        "stats_regression",
        "stats_mad_prices",
        "stats_winsorized_prices",
        "events_session_window_builtin",
        "sql_revenue_by_nation_year",
        "events_variant_extract",
        "orders_open_backlog",
        "stats_corr_matrix",
        "ann_ivf_recall_audit",
        "ann_lsh_recall_audit",
    }
)


# Queries ADDED in the current round (standing policy, the r9 closing
# mechanism generalized): a new registry entry has no prior driver hash
# by construction, so it is hoisted to the head of the gate window and
# externally hashed the SAME round it lands — the cumulative-coverage
# invariant (every query driver-hashed at least once, pinned by
# tests/test_rotation_coverage.py) never regresses when the surface
# grows. Empty this set (and re-point it) when a later round adds
# queries of its own.
_NEW_IN_ROUND: frozenset[str] = frozenset()


def _rotate(qs: list[QueryDef]) -> list[QueryDef]:
    head, rest = qs[0], qs[1:]
    off = ((ROUND - 6) * _GATE_WINDOW) % len(rest) if rest else 0
    rotated = rest[off:] + rest[:off]
    hoist_names = _NEVER_DRIVER_HASHED_R9 if ROUND == 9 else _NEW_IN_ROUND
    hoist = [q for q in rotated if q.name in hoist_names]
    rotated = hoist + [q for q in rotated if q.name not in hoist_names]
    return [head] + rotated


ALL_QUERIES: list[QueryDef] = _rotate(_interleave(_FAMILIES))

QUERY_INDEX: dict[str, QueryDef] = {q.name: q for q in ALL_QUERIES}

assert len(QUERY_INDEX) == len(ALL_QUERIES), "duplicate query names"
# Positional contracts (entry(), bench cold flagship) depend on this —
# a family reorder or insertion must not silently change entry 0.
assert ALL_QUERIES[0].name == "corpus_inverted_index", "entry-0 contract"


def queries():
    return {q.name: q.fn for q in ALL_QUERIES}


def oracle_sql():
    return {q.name: q.oracle for q in ALL_QUERIES if q.oracle is not None}


def headline_queries():
    return [q for q in ALL_QUERIES if q.headline]
