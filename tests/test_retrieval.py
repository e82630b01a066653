"""Contract tests for hybrid RRF retrieval. Value parity with DuckDB is
covered by test_oracle_parity / the selfcheck artifacts; these assert
the SEMANTICS on a planted fixture where both input rankings are known
in closed form, plus the registry entry's plan/consistency contracts.
"""

from __future__ import annotations

from fractions import Fraction

import pandas as pd

from apd_map_reduce_spark.operators.cooccur import bm25_search
from apd_map_reduce_spark.operators.retrieval import (
    RRF_DEPTH,
    RRF_K,
    RRF_PROBE_VEC,
    RRF_TOP_K,
    hybrid_rrf_search,
)
from apd_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _planted(spark):
    """4 docs + 4 embeddings keyed 0..3 (vec 0 = the probe).

    Lexical: only docs 1 and 2 contain query terms; doc 1 matches two
    terms with higher tf, so bm25 ranks 1 before 2 and never ranks 3.
    Semantic: axis-aligned unit vectors make cosine exact — vec 1 is
    parallel to the probe (cos 1.0), vec 2 is at 45 degrees
    (cos ~0.707107), vec 3 orthogonal (cos 0.0) — so the semantic list
    is 1, 2, 3 with no rounding ambiguity.
    """
    docs = spark.createDataFrame(
        [
            (0, "filler words only", "en", "s", 17),
            (1, "alpha alpha beta filler", "en", "s", 23),
            (2, "alpha filler filler filler", "en", "s", 26),
            (3, "filler filler filler filler", "en", "s", 27),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [2.0, 0.0], 0),
            (2, [1.0, 1.0], 0),
            (3, [0.0, 1.0], 0),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    return docs, embs


def _rrf(*ranks):
    """Exact expected fusion score: sum of round(1/(K+r), 6) over the
    lists that ranked the doc, in the decimal domain."""
    total = Fraction(0)
    for r in ranks:
        if r is not None:
            total += Fraction(round(1.0 / (RRF_K + r), 6)).limit_denominator(10**6)
    return float(total)


def test_planted_fusion_matches_closed_form(spark):
    docs, embs = _planted(spark)
    out = hybrid_rrf_search(
        docs, embs, terms=("alpha", "beta"), probe_vec_id=0, depth=3, k=4, dim=2
    ).toPandas()
    rows = {
        int(r.doc_id): (
            None if pd.isna(r.bm25_rank) else int(r.bm25_rank),
            None if pd.isna(r.cos_rank) else int(r.cos_rank),
            float(r.rrf_score),
        )
        for r in out.itertuples()
    }
    # doc 1: lexical rank 1 (two terms, higher tf) AND semantic rank 1.
    # doc 2: lexical rank 2, semantic rank 2. doc 3: semantic rank 3
    # only. doc 0 appears in neither list (no terms; it IS the probe).
    assert rows[1] == (1, 1, _rrf(1, 1))
    assert rows[2] == (2, 2, _rrf(2, 2))
    assert rows[3] == (None, 3, _rrf(3))
    assert 0 not in rows
    # fused order: both-lists docs above single-list docs here.
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["rank"]) == [1, 2, 3]


def test_registry_entry_contracts(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    embs = load_table(spark, SF_SMOKE, "embeddings")
    out = hybrid_rrf_search(docs, embs).toPandas()
    assert len(out) == RRF_TOP_K
    assert list(out["rank"]) == list(range(1, RRF_TOP_K + 1))
    # every fused doc came from one of the two depth-lists, with its
    # input rank preserved verbatim
    lex = bm25_search(docs, k=RRF_DEPTH).toPandas().set_index("doc_id")["rank"]
    for r in out.itertuples():
        assert not (pd.isna(r.bm25_rank) and pd.isna(r.cos_rank))
        if not pd.isna(r.bm25_rank):
            assert lex[r.doc_id] == int(r.bm25_rank)
    # probe vector never surfaces through the semantic list
    sem_only = out[out["bm25_rank"].isna()]
    assert RRF_PROBE_VEC not in set(sem_only["doc_id"])
    # descending fused score with doc_id tie-break
    scores = list(out["rrf_score"])
    assert scores == sorted(scores, reverse=True)


def test_internal_validity_guard_matches_prefiltered_call(spark):
    """The embedding-validity screen is applied INSIDE the operator
    (idempotent), so a caller passing the RAW embeddings table — with
    NULL / wrong-dim garbage rows planted — gets exactly the documented
    oracle-twin semantics, not silently divergent arithmetic."""
    from pyspark.sql import Row

    from apd_map_reduce_spark.functions.embeddings import valid_embeddings

    docs = load_table(spark, SF_SMOKE, "documents")
    embs = load_table(spark, SF_SMOKE, "embeddings")
    garbage = spark.createDataFrame(
        [
            Row(vec_id=10_000_001, embedding=None, label=0),
            Row(vec_id=10_000_002, embedding=[1.0, 2.0], label=0),
        ],
        schema=embs.schema,
    )
    raw = embs.unionByName(garbage)
    clean = hybrid_rrf_search(docs, valid_embeddings(embs)).toPandas()
    dirty = hybrid_rrf_search(docs, raw).toPandas()
    pd.testing.assert_frame_equal(clean, dirty)


def test_probe_side_is_broadcast_not_sort_merge(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    embs = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        hybrid_rrf_search(docs, embs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the probe row and the bm25 scalars ride broadcasts; the corpus
    # scan must not be sort-merge-joined against a 1-row relation
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
