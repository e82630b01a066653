"""Clean-corpus pipeline: composition behavior + snapshot sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.pipeline import (
    clean_corpus,
    materialize_clean_snapshot,
)
from apd_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_clean_corpus_drops_planted_duplicates(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    # plant an exact duplicate (id 9001 copies doc 0's text) and a
    # doctored near-duplicate is implicit in synthetic data overlap
    first_text = docs.filter(F.col("doc_id") == 0).select("text").first().text
    planted = docs.unionByName(
        spark.createDataFrame(
            [(9001, first_text, "en", "srcX", len(first_text))],
            "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        )
    )
    keep = {r.doc_id for r in clean_corpus(planted).collect()}
    assert 9001 not in keep, "exact duplicate must drop (higher id)"
    assert 0 in keep, "canonical copy (min id) must survive"


def test_clean_corpus_accepts_precomputed_pairs(spark):
    # The reuse path a real pipeline takes: LSH pairs computed once
    # upstream (and persisted), handed to the capstone — must be
    # result-identical to the self-computing path.
    from apd_map_reduce_spark.operators.dedup import minhash_lsh_pairs
    from apd_map_reduce_spark.operators.pipeline import NEAR_DUP_THRESHOLD

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=NEAR_DUP_THRESHOLD)
    self_computed = {tuple(r) for r in clean_corpus(docs).collect()}
    reused = {tuple(r) for r in clean_corpus(docs, near_pairs=pairs).collect()}
    assert reused == self_computed


def test_snapshot_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "snap")
    n = materialize_clean_snapshot(docs, out)
    back = spark.read.parquet(out)
    assert back.count() == n
    assert set(back.columns) == set(docs.columns)
    keep = {r.doc_id for r in clean_corpus(docs).select("doc_id").collect()}
    assert {r.doc_id for r in back.select("doc_id").collect()} == keep


def test_dedup_incremental_neardup_finds_planted_overlap(spark):
    from apd_map_reduce_spark.operators.dedup import dedup_incremental_neardup

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before night falls on the hills"
    )
    corpus = spark.createDataFrame(
        [(100, base), (101, "completely unrelated text about database engines "
                            "query planners and distributed shuffle execution layers")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, base),  # identical -> jaccard 1.0 with 100
            (2, "independent fresh content with no overlap whatsoever in any "
                "shingle because every single trigram here is brand new today"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.batch_doc, r.corpus_doc): r.jaccard
        for r in dedup_incremental_neardup(corpus, batch).collect()
    }
    assert got == {(1, 100): 1.0}


def test_boilerplate_spans_planted_footer(spark):
    from apd_map_reduce_spark.operators.dedup import boilerplate_spans

    footer = "all rights reserved contact us terms of service apply here"
    docs = spark.createDataFrame(
        [
            (1, "unique article one body text content words " + footer),
            (2, "different second article body with other words " + footer),
            (3, "third document has completely independent tokens only"),
        ],
        "doc_id long, text string",
    )
    got = boilerplate_spans(docs, n=8, min_df=2).collect()
    spans = {r.span: (r.df, r.example_doc) for r in got}
    # the footer yields 3 shared 8-token windows, plus 1 more because
    # both docs happen to precede it with "words" (an 11-token shared
    # suffix -> 4 windows)
    assert all(df == 2 and ex == 1 for df, ex in spans.values())
    assert any("terms of service" in s for s in spans)
    assert len(spans) == 4


def test_exact_substr_spans_merges_suffix_windows(spark):
    # The 11-token shared suffix yields 4 overlapping duplicated
    # windows; ExactSubstr must merge them into ONE maximal span.
    from apd_map_reduce_spark.operators.dedup import exact_substr_spans

    footer = "all rights reserved contact us terms of service apply here"
    docs = spark.createDataFrame(
        [
            (1, "unique article one body text content words " + footer),
            (2, "different second article body with other words " + footer),
            (3, "third document has completely independent tokens only"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens, r.span_text)
        for r in exact_substr_spans(docs, n=8, min_df=2).collect()
    }
    shared = "words " + footer  # 11 tokens, positions 7..17 in both docs
    assert got == {
        1: (7, 17, 11, shared),
        2: (7, 17, 11, shared),
    }


def test_exact_substr_spans_adjacent_blocks_merge_gap_splits(spark):
    # Doc 1 shares block X with doc 2 and block Y with doc 3. When X
    # and Y sit back-to-back the two duplicated regions are one
    # contiguous span (merge at s_cur == s_prev + n exactly); a single
    # unshared token between them must split the result in two.
    from apd_map_reduce_spark.operators.dedup import exact_substr_spans

    x = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    y = "one two three four five six seven eight"  # 8 tokens
    adjacent = spark.createDataFrame(
        [(1, x + " " + y), (2, x + " tail filler padding"), (3, "lead intro " + y)],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in exact_substr_spans(adjacent, n=8, min_df=2).collect()
    }
    assert spans == {(1, 1, 16, 16), (2, 1, 8, 8), (3, 3, 10, 8)}

    gapped = spark.createDataFrame(
        [(1, x + " filler " + y), (2, x + " tail padding"), (3, "lead intro " + y)],
        "doc_id long, text string",
    )
    doc1 = sorted(
        (r.span_start, r.span_end, r.span_text)
        for r in exact_substr_spans(gapped, n=8, min_df=2)
        .filter("doc_id = 1")
        .collect()
    )
    assert doc1 == [(1, 8, x), (10, 17, y)]


def test_exact_substr_spans_are_exactly_the_removed_regions(spark):
    # Cross-operator invariant on real data: remove_boilerplate masks
    # precisely the union of the maximal duplicated spans, so per doc
    # n_removed == Σ span_tokens (and docs absent from the span
    # relation must have n_removed == 0).
    from apd_map_reduce_spark.operators.dedup import (
        exact_substr_spans,
        remove_boilerplate,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    spans = {
        r.doc_id: r.total
        for r in exact_substr_spans(docs)
        .groupBy("doc_id")
        .agg(F.sum("span_tokens").alias("total"))
        .collect()
    }
    removed = {
        r.doc_id: r.n_removed for r in remove_boilerplate(docs).collect()
    }
    assert spans, "fixture must contain duplicated spans"
    for doc_id, n_removed in removed.items():
        assert n_removed == spans.get(doc_id, 0), doc_id


def test_remove_boilerplate_strips_only_covered_tokens(spark):
    from apd_map_reduce_spark.operators.dedup import remove_boilerplate

    footer = "all rights reserved contact us terms of service"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, "first article body text " + footer),
            (2, "second article other words " + footer),
            (3, "third doc with no shared spans at all present"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in remove_boilerplate(docs).collect()}
    assert got[1] == ("first article body text", 8)
    assert got[2] == ("second article other words", 8)
    assert got[3][1] == 0 and got[3][0].startswith("third doc")


def test_remove_boilerplate_blanks_exact_duplicates(spark):
    # Exact duplicates share EVERY window, so both copies reduce to ''.
    from apd_map_reduce_spark.operators.dedup import remove_boilerplate

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in remove_boilerplate(docs).collect()}
    assert got == {1: ("", 10), 2: ("", 10)}


def test_dedup_incremental_classifies_three_ways(spark):
    from apd_map_reduce_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(100, "alpha beta"), (101, "gamma delta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "alpha beta"),    # already in corpus -> exact_dup
            (2, "fresh content"), # new
            (3, "fresh content"), # dup WITHIN the batch -> batch_dup
            (4, "also new"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in dedup_incremental(corpus, batch).collect()}
    assert got == {1: "exact_dup", 2: "new", 3: "batch_dup", 4: "new"}


def test_example_pipeline_end_to_end(spark, tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from training_data_pipeline import build_clean_shards

    out = str(tmp_path / "shards")
    stats = build_clean_shards(spark, SF_SMOKE, out, n_shards=4)
    assert stats["raw_docs"] == 500
    assert 0 < stats["published"] <= stats["pre_mix"] <= stats["survivors"] <= stats["raw_docs"]
    back = spark.read.json(out)
    assert back.count() == stats["published"]
    assert {"doc_id", "text", "shard"} <= set(back.columns)


def test_observed_metrics_ride_one_action(spark):
    # plans/observe.py: metrics attached to two plan nodes materialize
    # from the SINGLE downstream action and equal recomputed values.
    from apd_map_reduce_spark.plans.observe import observed

    docs = load_table(spark, SF_SMOKE, "documents")
    gated = docs.filter(F.col("n_chars") >= 100)
    gated, gate_obs = observed(
        gated,
        "gate",
        n_docs=F.count(F.lit(1)),
        total_chars=F.sum("n_chars"),
    )
    shrunk = gated.select("doc_id")
    shrunk, out_obs = observed(shrunk, "out", n=F.count(F.lit(1)))
    shrunk.write.format("noop").mode("overwrite").save()

    expected = docs.filter(F.col("n_chars") >= 100)
    exp_n = expected.count()
    exp_chars = expected.agg(F.sum("n_chars")).first()[0]
    assert gate_obs.get == {"n_docs": exp_n, "total_chars": exp_chars}
    assert out_obs.get == {"n": exp_n}


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc quoted wholesale inside a much longer one: the
    asymmetric containment must flag it near 1.0 while symmetric
    Jaccard stays far below the dedup threshold — the exact case
    dedup_containment exists for."""
    from apd_map_reduce_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        containment_pairs,
        ngram_jaccard_pairs,
    )

    # letter suffixes: the P1 normalizer strips digits, so numeric
    # suffixes would collapse every token to the same word
    def w(stem, i):
        return stem + "".join(chr(ord("a") + int(c)) for c in str(i))

    quote = " ".join(f"{w('alpha', i)} {w('beta', i)} {w('gamma', i)}" for i in range(8))
    long_doc = (
        " ".join(f"{w('filler', i)} {w('noise', i)} {w('pad', i)}" for i in range(60))
        + " " + quote + " "
        + " ".join(f"{w('tail', i)} {w('coda', i)}" for i in range(60))
    )
    docs = spark.createDataFrame(
        [
            (1, quote, "en", "srcA", len(quote)),
            (2, long_doc, "en", "srcA", len(long_doc)),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    cont = containment_pairs(docs).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row.doc_a, row.doc_b) == (1, 2)
    assert row.cont_a_in_b >= 0.99, "quote fully contained in the long doc"
    assert row.cont_b_in_a < 0.3, "long doc is NOT contained in the quote"
    jac = ngram_jaccard_pairs(docs).collect()
    assert not jac, (
        f"symmetric Jaccard at {JACCARD_THRESHOLD} must miss the "
        "small-in-large case containment is for"
    )


def test_weighted_cosine_downweights_boilerplate(spark):
    """Two pairs with IDENTICAL raw shingle overlap (24 shared
    shingles, ~10 unique words each side): one pair shares a
    boilerplate block that 22 of 26 corpus docs carry (df=22 — low
    enough to survive the hard MAX_SHINGLE_DF cut, so set-based
    Jaccard counts it at full weight), the other shares a block found
    ONLY in that pair (df=2). Set Jaccard scores both pairs ~0.55 and
    flags both; idf-weighted cosine must keep the rare-overlap pair
    (idf² ≈ 4.5 per shared shingle ⇒ cos ≈ 0.63) and drop the
    boilerplate pair (idf = ln(25/23) ⇒ cos ≈ 0.003). An exact-dup
    pair over its own private vocabulary must score exactly 1.0
    (s_ab = s_a = s_b in the exact decimal domain)."""
    from apd_map_reduce_spark.operators.dedup import (
        ngram_jaccard_pairs,
        weighted_cosine_pairs,
    )

    def w(stem, i):
        return stem + "".join(chr(ord("a") + int(c)) for c in str(i))

    boiler = " ".join(w("boiler", i) for i in range(26))
    rare = " ".join(w("rare", i) for i in range(26))
    uniq = lambda stem: " ".join(w(stem, i) for i in range(10))  # noqa: E731
    dup_text = " ".join(w("dupword", i) for i in range(30))
    rows = [
        # background: 20 docs all carrying the boilerplate block
        *[
            (100 + i, f"{boiler} {uniq(w('bg', i))}", "en", "srcA", 0)
            for i in range(20)
        ],
        (1, f"{boiler} {uniq('ponly')}", "en", "srcA", 0),  # boilerplate pair
        (2, f"{boiler} {uniq('qonly')}", "en", "srcA", 0),
        (3, f"{rare} {uniq('xonly')}", "en", "srcA", 0),    # rare-block pair
        (4, f"{rare} {uniq('yonly')}", "en", "srcA", 0),
        (5, dup_text, "en", "srcA", 0),                     # exact dup pair
        (6, dup_text, "en", "srcA", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    cos = {(r.doc_a, r.doc_b): r.cosine for r in weighted_cosine_pairs(docs).collect()}
    assert (3, 4) in cos and cos[(3, 4)] >= 0.5, f"rare-overlap pair lost: {cos}"
    assert (5, 6) in cos and cos[(5, 6)] == 1.0, "exact dup must score round-6 1.0"
    assert (1, 2) not in cos, "boilerplate-only overlap must fall below threshold"
    assert all(a not in (1, 2) or b not in (1, 2) for a, b in cos)
    jac = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs).collect()}
    assert (1, 2) in jac and (3, 4) in jac, (
        "set-based Jaccard sees both pairs identically — the contrast "
        "this operator exists for"
    )


def test_candidate_scoped_enumerators_match_full_enumeration(spark):
    """The `candidates` param of the exact pair enumerators is a pure
    RESTRICTION: for any candidate relation C, the candidate-scoped
    result equals the full enumeration inner-filtered to C — same
    measures, same thresholds, no rescaling of counts or weights."""
    from apd_map_reduce_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
        weighted_cosine_pairs,
    )
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")

    for fn, cols in (
        (ngram_jaccard_pairs, ("n_common", "jaccard")),
        (containment_pairs, ("n_common", "cont_a_in_b", "cont_b_in_a")),
        (weighted_cosine_pairs, ("cosine",)),
    ):
        full = {(r.doc_a, r.doc_b): tuple(getattr(r, c) for c in cols)
                for r in fn(docs).collect()}
        assert full, f"{fn.__name__}: fixture produced no pairs"
        # candidates: every other full pair + a planted non-sharing pair
        kept = sorted(full)[::2]
        cands = spark.createDataFrame(
            kept + [(-1, -2)], "doc_a LONG, doc_b LONG"
        )
        scoped = {(r.doc_a, r.doc_b): tuple(getattr(r, c) for c in cols)
                  for r in fn(docs, candidates=cands).collect()}
        assert scoped == {p: full[p] for p in kept}, fn.__name__


def test_lsh_screened_jaccard_agrees_with_minhash_on_planted_dups(spark):
    """The composed screen+verify entry must report the planted
    high-similarity pairs the LSH family's recall contract covers:
    an exact-dup pair (jaccard 1.0) and a one-token-edit near-dup."""
    from apd_map_reduce_spark.operators.dedup import (
        lsh_screened_jaccard_pairs,
    )

    base = " ".join(f"tok{chr(ord('a') + i % 26)}{chr(ord('a') + i // 26)} " for i in range(40))
    near = base.replace("tokba ", "tokzz ", 1)
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", 0),
            (2, base, "en", "s", 0),
            (3, near, "en", "s", 0),
            (4, "wholly unrelated words entirely different content", "en", "s", 0),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    out = {(r.doc_a, r.doc_b): r.jaccard for r in lsh_screened_jaccard_pairs(docs).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out and out[(1, 3)] > 0.8
    assert (2, 3) in out and out[(2, 3)] == out[(1, 3)]
    assert all(4 not in p for p in out)


def test_shingle_novelty_hand_counts(spark):
    # d1 "a b c d" -> {abc, bcd}; d2 "a b c e" -> {abc, bce};
    # d3 "x y z w" -> {xyz, yzw}. df: abc=2, rest=1.
    from apd_map_reduce_spark.operators.dedup import shingle_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d", "w"), (2, "a b c e", "w"), (3, "x y z w", "b"),
         (4, "too short", "w"), (5, None, "w")],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_unique, r.novelty)
        for r in shingle_novelty(docs).collect()
    }
    # <3-token and NULL docs emit no row (no shingles), like every
    # shingle-family operator.
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5), 3: (2, 2, 1.0)}
    spark.catalog.clearCache()


def test_source_overlap_matrix_spanning_pair(spark):
    # Identical text in two sources -> exactly one near-dup pair,
    # reported under the (least, greatest) source ordering; the
    # unrelated doc contributes nothing.
    from apd_map_reduce_spark.operators.dedup import source_overlap_matrix

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps", "web"),
         (2, "the quick brown fox jumps", "books"),
         (3, "completely different text entirely here", "web")],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_x, r.source_y): r.n_pairs
        for r in source_overlap_matrix(docs).collect()
    }
    assert got == {("books", "web"): 1}
    spark.catalog.clearCache()


def test_source_overlap_matrix_null_source_coalesced(spark):
    # NULL source must land in the '' bucket, not vanish through
    # LEAST/GREATEST NULL semantics.
    from apd_map_reduce_spark.operators.dedup import source_overlap_matrix

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps", None),
         (2, "the quick brown fox jumps", "web")],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_x, r.source_y): r.n_pairs
        for r in source_overlap_matrix(docs).collect()
    }
    assert got == {("", "web"): 1}
    spark.catalog.clearCache()


def test_cluster_size_histogram_hand_counts(spark):
    # 3 copies of A (bucket 1: [2,4)), 1 copy of B, 4 copies of C
    # (bucket 2: [4,8)), 1 copy of D -> bucket 0 has 2 clusters/2 docs,
    # bucket 1 has 1/3, bucket 2 has 1/4. Bit-length bucketing, not
    # float log2.
    from apd_map_reduce_spark.operators.dedup import cluster_size_histogram

    rows = (
        [(i, "aaa", "w") for i in range(3)]
        + [(10, "bbb", "w")]
        + [(20 + i, "ccc", "w") for i in range(4)]
        + [(30, "ddd", "w")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.bucket: (r.n_clusters, r.n_docs)
        for r in cluster_size_histogram(docs).collect()
    }
    assert got == {0: (2, 2), 1: (1, 3), 2: (1, 4)}


def test_contamination_probe_hand_counts(spark):
    # Benchmark docs are doc_id % 101 == 0 -> ids 0 and 101 here.
    # doc 0 "a b c d": shingles {abc, bcd}; corpus doc 5 "a b c x"
    # carries abc -> 1 of 2 contaminated. doc 101 "p q r s": no corpus
    # doc shares a shingle -> 0 of 2. Benchmark docs never contaminate
    # each other (corpus side excludes the benchmark set).
    from apd_map_reduce_spark.operators.dedup import contamination_probe

    docs = spark.createDataFrame(
        [(0, "a b c d", "w"), (101, "p q r s", "w"),
         (5, "a b c x", "w"), (6, "u v w z", "w"), (7, "hi", "w")],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination)
        for r in contamination_probe(docs).collect()
    }
    assert got == {0: (2, 1, 0.5), 101: (2, 0, 0.0)}


def test_contamination_probe_short_benchmark_doc_emits_no_row(spark):
    # A benchmark doc with < 3 tokens has no shingles -> no row, the
    # shingle-family contract (novelty behaves the same way).
    from apd_map_reduce_spark.operators.dedup import contamination_probe

    docs = spark.createDataFrame(
        [(0, "hi", "w"), (1, "a b c d", "w")],
        "doc_id long, text string, source string",
    )
    assert contamination_probe(docs).collect() == []
