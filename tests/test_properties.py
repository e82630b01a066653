"""Property-based tests (SURVEY.md §5.3d — the layer the reference
lacks): normalization laws and partition-count invariance."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apd_map_reduce_spark.operators.invindex import inverted_index

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=200,
)


def py_normalize(token: str) -> str:
    """Independent Python model of reference P1 (`main.cpp:31-39`)."""
    return re.sub("[^A-Za-z]", "", token).lower()


@given(st.lists(TEXT, min_size=0, max_size=20))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_normalize_matches_python_model(spark, tokens):
    from apd_map_reduce_spark.functions.text import normalize_word

    if not tokens:
        return
    df = spark.createDataFrame([(t,) for t in tokens], "tok STRING")
    got = [r.w for r in df.select(normalize_word("tok").alias("w")).collect()]
    want = [py_normalize(t) for t in tokens]
    assert got == want


def test_normalize_idempotent(spark):
    from apd_map_reduce_spark.functions.text import normalize_word

    samples = ["Don't", "LOOK-out", "foo123", "ALREADYCLEAN".lower(), "über", "日本語x"]
    df = spark.createDataFrame([(s,) for s in samples], "tok STRING")
    once = df.select(normalize_word("tok").alias("w"))
    twice = once.select(normalize_word("w").alias("w"))
    assert [r.w for r in once.collect()] == [r.w for r in twice.collect()]


def test_shuffle_partition_sweep(spark):
    """Reference checker's (M,R) matrix analogue: results invariant
    under spark.sql.shuffle.partitions (SURVEY.md §4 last paragraph)."""
    corpus = spark.createDataFrame(
        [(i, f"alpha beta w{i} Gamma-{i} {i}00") for i in range(1, 30)],
        "file_id INT, line STRING",
    )
    baseline = None
    for n in ("1", "4", "26"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            got = sorted(
                (r.word, tuple(r.file_ids), r.df)
                for r in inverted_index(corpus).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        if baseline is None:
            baseline = got
        assert got == baseline, f"diverged at shuffle.partitions={n}"


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_training_shuffle_is_a_permutation(spark, doc_ids):
    """training_shuffle_order must be a bijection: every doc exactly
    once, and within each shard positions are dense 1..n_shard."""
    from apd_map_reduce_spark.operators.curation import training_shuffle_order

    docs = spark.createDataFrame([(i,) for i in doc_ids], "doc_id LONG")
    rows = training_shuffle_order(docs).collect()
    assert sorted(r.doc_id for r in rows) == sorted(doc_ids)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_pagerank_mass_and_floor(spark):
    """Integer PageRank invariants: every rank >= the teleport constant
    and total mass never exceeds the scale (floors only lose mass)."""
    from apd_map_reduce_spark.operators.graph import PR_SCALE, pagerank_topk

    edges = [(i, (i * 7 + 3) % 50) for i in range(50) if i != (i * 7 + 3) % 50]
    df = spark.createDataFrame(sorted(set(map(lambda e: (min(e), max(e)), edges))), "a long, b long")
    ranks = pagerank_topk(df, k=1000).collect()
    n = len(ranks)
    tele = (15 * PR_SCALE // 100) // n
    assert all(r.rank_scaled >= tele for r in ranks)
    assert sum(r.rank_scaled for r in ranks) <= PR_SCALE


def test_corr_matrix_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from apd_map_reduce_spark.queries.relational import stats_corr_matrix

    from .conftest import SF_SMOKE

    row = stats_corr_matrix(spark, SF_SMOKE).collect()[0]
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    ref = np.corrcoef(
        np.vstack([li["l_quantity"], li["l_extendedprice"], li["l_discount"]])
    )
    assert abs(row.corr_qty_price - ref[0, 1]) < 1e-5
    assert abs(row.corr_qty_discount - ref[0, 2]) < 1e-5
    assert abs(row.corr_price_discount - ref[1, 2]) < 1e-5


# --- independent Python models of the round-4 operators ---------------------

def _py_tokens(text: str) -> list[str]:
    import re as _re

    return [
        w
        for w in (
            _re.sub("[^A-Za-z]", "", t).lower() for t in _re.split(r"\s+", text)
        )
        if w
    ]


def _py_shingle_hashes(text: str, n: int = 3) -> set[int]:
    import hashlib

    toks = _py_tokens(text)
    shingles = {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()
    return {
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles
    }


DOC_TEXT = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x9", "Q-q"]),
    min_size=0,
    max_size=12,
).map(" ".join)


@given(st.lists(DOC_TEXT, min_size=1, max_size=6), st.lists(DOC_TEXT, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_incremental_neardup_matches_python_model(spark, corpus_texts, batch_texts):
    """Full independent reimplementation of the incremental LSH screen
    (shingles → universal-hash MinHash → banding → candidate collision
    → exact Jaccard) in plain Python, compared pair-for-pair."""
    import hashlib

    from apd_map_reduce_spark.operators.dedup import (
        _MH_PARAMS,
        LSH_BANDS,
        MINHASH_PRIME,
        N_MINHASH,
        NEARDUP_THRESHOLD,
        dedup_incremental_neardup,
    )

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch_texts)], "doc_id long, text string"
    )

    def sig(shs: set[int]) -> list[int] | None:
        if not shs:
            return None
        return [
            min((a * (x % 2**31) + b) % MINHASH_PRIME for x in shs)
            for (a, b) in _MH_PARAMS
        ]

    def bands(s: list[int]) -> list[tuple[int, str]]:
        rpb = N_MINHASH // LSH_BANDS
        return [
            (
                band,
                hashlib.md5(
                    ",".join(str(h) for h in s[band * rpb : (band + 1) * rpb]).encode()
                ).hexdigest(),
            )
            for band in range(LSH_BANDS)
        ]

    c_sh = {i: _py_shingle_hashes(t) for i, t in enumerate(corpus_texts)}
    b_sh = {1000 + i: _py_shingle_hashes(t) for i, t in enumerate(batch_texts)}
    c_bands = {i: bands(sig(s)) for i, s in c_sh.items() if s}
    b_bands = {i: bands(sig(s)) for i, s in b_sh.items() if s}
    expected = {}
    for bd, bb in b_bands.items():
        for cd, cb in c_bands.items():
            if set(bb) & set(cb):
                inter = len(b_sh[bd] & c_sh[cd])
                union = len(b_sh[bd] | c_sh[cd])
                j = round(inter / union, 6) if union else 0.0
                if j >= NEARDUP_THRESHOLD:
                    expected[(bd, cd)] = j

    got = {
        (r.batch_doc, r.corpus_doc): r.jaccard
        for r in dedup_incremental_neardup(corpus, batch).collect()
    }
    assert got == expected


@given(st.lists(DOC_TEXT, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_boilerplate_spans_matches_python_model(spark, texts):
    from apd_map_reduce_spark.operators.dedup import boilerplate_spans

    N, MIN_DF = 2, 2  # small n so short random docs produce spans
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expected: dict[str, tuple[int, int]] = {}
    per_doc = {
        i: {
            " ".join(_py_tokens(t)[j : j + N])
            for j in range(len(_py_tokens(t)) - N + 1)
        }
        for i, t in enumerate(texts)
    }
    from collections import defaultdict

    by_span = defaultdict(list)
    for i, spans in per_doc.items():
        for s in spans:
            by_span[s].append(i)
    for s, ds in by_span.items():
        if len(ds) >= MIN_DF:
            expected[s] = (len(ds), min(ds))

    got = {
        r.span: (r.df, r.example_doc)
        for r in boilerplate_spans(docs, n=N, min_df=MIN_DF).collect()
    }
    assert got == expected


def test_dedup_family_partition_sweep(spark):
    """Partition-count invariance for the near-dup family (the (M,R)
    matrix analogue for the v3 extension operators): LSH pairs and the
    incremental screen must not depend on shuffle parallelism."""
    from apd_map_reduce_spark.operators.dedup import (
        dedup_incremental_neardup,
        minhash_lsh_pairs,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "completely different content about spark partitions here now",
        "the quick brown fox jumps over the lazy dog tonight",  # exact dup of 0
        "another unrelated short document with its own words",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    batch = docs.filter("doc_id % 2 = 0")
    corpus = docs.filter("doc_id % 2 = 1")
    base_pairs = base_incr = None
    for n in ("1", "5", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            pairs = sorted(tuple(r) for r in minhash_lsh_pairs(docs).collect())
            incr = sorted(
                tuple(r) for r in dedup_incremental_neardup(corpus, batch).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        if base_pairs is None:
            base_pairs, base_incr = pairs, incr
        assert pairs == base_pairs, f"lsh diverged at shuffle.partitions={n}"
        assert incr == base_incr, f"incremental diverged at shuffle.partitions={n}"
    assert base_pairs, "expected at least one near-dup pair in the fixture"
    assert base_incr, "expected at least one cross-side pair in the fixture"


def test_lsh_collision_probability_curve():
    from apd_map_reduce_spark.operators.dedup import (
        NEARDUP_THRESHOLD,
        lsh_collision_probability as p,
    )

    assert p(1.0) == 1.0 and p(0.0) == 0.0
    assert 0.98 < p(0.9) < 1.0
    # THE production sizing contract: the default (bands, rows) must
    # give >=0.9 recall at the near-dup family's own default threshold.
    assert p(NEARDUP_THRESHOLD) >= 0.9
    # the historical demo config (k=16, b=4/r=4) was ~0.23 at s=0.5 —
    # the curve still reproduces it when asked
    assert 0.2 < p(0.5, bands=4, rows=4) < 0.25
    # monotone in s; more bands raise recall at fixed r
    assert p(0.6) > p(0.5) > p(0.4)
    assert p(0.5, bands=8, rows=4) > p(0.5, bands=4, rows=4)


def test_new_ops_partition_sweep(spark):
    """Partition-count invariance for this round's additions: SemDeDup
    pruning, containment pairs, BM25 ranking, and pHash near-dups must
    not depend on shuffle parallelism (the (M,R) matrix analogue)."""
    from apd_map_reduce_spark.operators.cooccur import bm25_search
    from apd_map_reduce_spark.operators.dedup import containment_pairs
    from apd_map_reduce_spark.operators.multimodal import multimodal_phash_neardup
    from apd_map_reduce_spark.operators.similarity import semdedup_prune
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    # deterministic subset — a bare .limit() can return different rows
    # per execution, which would read as a spurious invariance failure
    docs = load_table(spark, SF_SMOKE, "documents").filter("doc_id < 200")
    emb = load_table(spark, SF_SMOKE, "embeddings").filter("vec_id < 200")
    base = None
    for n in ("1", "5", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            got = (
                sorted(tuple(r) for r in semdedup_prune(emb).collect()),
                sorted(tuple(r) for r in containment_pairs(docs).collect()),
                sorted(tuple(r) for r in bm25_search(docs).collect()),
                sorted(tuple(r) for r in multimodal_phash_neardup(docs).collect()),
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        if base is None:
            base = got
            assert all(len(g) > 0 for g in got), "fixture must be non-trivial"
        assert got == base, f"diverged at shuffle.partitions={n}"


def test_temperature_rates_are_sqrt_proportional(spark):
    """The defining alpha=0.5 property: rate_i / rate_j =
    sqrt(size_i / size_j) — small sources upsampled relative to their
    share. Planted sizes 400 vs 100 chars → weights 20 vs 10 → rates
    2/3 vs 1/3 exactly (vs 0.8/0.2 under proportional sampling)."""
    from apd_map_reduce_spark.operators.curation import mixture_temperature_rates

    docs = spark.createDataFrame(
        [(1, "x", "en", "big", 400), (2, "x", "en", "small", 100)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    rates = {
        r.source: (r.weight, r.sample_rate)
        for r in mixture_temperature_rates(docs).collect()
    }
    assert rates["big"] == (20.0, round(2 / 3, 6))
    assert rates["small"] == (10.0, round(1 / 3, 6))
    # and on the real table the rates normalize to ~1
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    out = mixture_temperature_rates(
        load_table(spark, SF_SMOKE, "documents")
    ).collect()
    assert abs(sum(r.sample_rate for r in out) - 1.0) < 1e-4
    assert all(r.sample_rate > 0 for r in out)


def test_session3_ops_partition_sweep(spark):
    """Partition-count invariance for the third-session additions:
    ExactSubstr islands (per-doc window + keyed joins), ADC search
    (broadcast LUT joins + two-stage ranking windows), and BPE merge
    pairs (global ranking window over the ≤676-row pair relation)."""
    from apd_map_reduce_spark.operators.cluster import pq_adc_topk
    from apd_map_reduce_spark.operators.dedup import exact_substr_spans
    from apd_map_reduce_spark.operators.textstats import bpe_merge_pairs
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").filter("doc_id < 200")
    emb = load_table(spark, SF_SMOKE, "embeddings").filter("vec_id < 200")
    base = None
    for n in ("1", "5", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            got = (
                sorted(tuple(r) for r in exact_substr_spans(docs).collect()),
                sorted(tuple(r) for r in pq_adc_topk(emb).collect()),
                sorted(tuple(r) for r in bpe_merge_pairs(docs).collect()),
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        if base is None:
            base = got
            assert all(len(g) > 0 for g in got), "fixture must be non-trivial"
        assert got == base, f"diverged at shuffle.partitions={n}"


def test_retrieval_and_udtf_partition_sweep(spark):
    """Partition-count invariance for the hybrid-RRF fusion and the
    UDTF chunker (whose LATERAL join must not leak parallelism into
    results), plus the corpus data source through the flagship index
    (its partitioning is manifest-determined, not shuffle-determined)."""
    from apd_map_reduce_spark.operators.retrieval import hybrid_rrf_search
    from apd_map_reduce_spark.operators.udtfs import chunk_documents_udtf
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").filter("doc_id < 200")
    emb = load_table(spark, SF_SMOKE, "embeddings").filter("vec_id < 200")
    base = None
    for n in ("1", "5", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            got = (
                sorted(tuple(r) for r in hybrid_rrf_search(docs, emb).collect()),
                sorted(tuple(r) for r in chunk_documents_udtf(docs).collect()),
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        if base is None:
            base = got
            assert all(len(g) > 0 for g in got), "fixture must be non-trivial"
        assert got == base, f"diverged at shuffle.partitions={n}"


def test_minhash_estimate_contract(spark):
    """The estimator-audit operator: for exact duplicates the MinHash
    estimate is exactly 1.0 (identical shingle sets ⇒ identical
    signatures), every estimate is a multiple of 1/k in [0, 1], and
    mh_err == |mh_est − jaccard| (rounded) for every emitted pair."""
    from apd_map_reduce_spark.operators.dedup import (
        N_MINHASH,
        minhash_estimate_pairs,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "completely different content about spark partitions here now",
        "the quick brown fox jumps over the lazy dog tonight",  # exact dup of 0
        "another unrelated short document with its own words",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = minhash_estimate_pairs(docs).collect()
    assert rows, "expected near-dup pairs in the fixture"
    by_pair = {(r.doc_a, r.doc_b): r for r in rows}
    dup = by_pair[(0, 3)]
    assert dup.jaccard == 1.0 and dup.mh_est == 1.0 and dup.mh_err == 0.0
    for r in rows:
        n = r.mh_est * N_MINHASH
        assert 0.0 <= r.mh_est <= 1.0
        assert abs(n - round(n)) < 1e-4, "estimate must be a multiple of 1/k"
        assert r.mh_err == round(abs(r.mh_est - r.jaccard), 6)


def test_grouped_topk_matches_single_window(spark):
    """grouped_topk's two-stage rank must equal the plain per-group
    window for any data, given a unique tie-break key — the provable-
    identity claim its docstring makes, pinned on a fixture with
    duplicate scores across and inside salt cells."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from apd_map_reduce_spark.queries.base import grouped_topk

    rows = [
        (g, i, float((i * 7919 + g * 104729) % 13)) for g in range(5) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "grp int, item int, score double")
    order = (F.desc("score"), F.asc("item"))
    got = grouped_topk(df, ["grp"], order, 7, salt_on="item").select(
        "grp", "item", "score", "rank"
    )
    w = Window.partitionBy("grp").orderBy(*order)
    want = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 7)
        .select("grp", "item", "score", "rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_percentile_disc_matches_explicit_rank(spark):
    """perplexity_buckets' threshold aggregation relies on Spark's
    percentile_disc(p) picking the value at integer rank
    ceil(p_exact * n) (1-based, ascending) — the SQL-standard "smallest
    value with cume_dist >= p" element, which is also what the DuckDB
    oracle selects by ROW_NUMBER. Pin the equivalence on adversarial
    group sizes (divisible and not divisible by n_buckets, singleton,
    heavy ties) so a double-rounding boundary flip in either definition
    fails loudly here rather than as an opaque hash mismatch."""
    import math

    from pyspark.sql import functions as F

    sizes = [1, 2, 3, 4, 5, 6, 9, 50, 149, 150, 166]
    rows = []
    for g, n in enumerate(sizes):
        for i in range(n):
            # ties: only ~n/3 distinct values per group
            rows.append((g, i, float((i * 2654435761) % max(n // 3, 1))))
    df = spark.createDataFrame(rows, "grp int, item int, score double")
    nb = 3
    got = {
        (r.grp, b): getattr(r, f"t{b}")
        for r in df.groupBy("grp")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({b / nb!r}) WITHIN GROUP (ORDER BY score)"
                ).alias(f"t{b}")
                for b in range(1, nb)
            ]
        )
        .collect()
        for b in range(1, nb)
    }
    by_grp: dict[int, list[float]] = {}
    for g, _, s in rows:
        by_grp.setdefault(g, []).append(s)
    for g, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        for b in range(1, nb):
            want = vals[math.ceil(b * n / nb) - 1]  # exact rational rank
            assert got[(g, b)] == want, (g, b, n, got[(g, b)], want)
