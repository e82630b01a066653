"""write_range_sorted layout contract: disjoint per-file key ranges,
sorted rows within each file (what parquet min/max pruning needs)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from apd_map_reduce_spark.sinks import write_range_sorted
from apd_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_range_sorted_layout(spark, tmp_path):
    out = str(tmp_path / "li_sorted")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_range_sorted(li, out, key="l_orderkey", num_files=4)

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == 4

    ranges = []
    for f in files:
        part = spark.read.parquet(f)
        lo, hi = part.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
        ranges.append((lo, hi))
        # sorted within the file
        keys = [r.l_orderkey for r in part.select("l_orderkey").collect()]
        assert keys == sorted(keys)

    # files cover pairwise-disjoint key ranges
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next

    # content identical to the source (layout changes nothing)
    assert spark.read.parquet(out).count() == li.count()


def test_range_sorted_enables_file_pruning(spark, tmp_path):
    """A selective key predicate on the range-clustered layout reads
    fewer rows than the file count implies: Spark's parquet reader
    drops whole row groups via min/max stats. We assert the plan pushes
    the filter and that a range outside the data returns instantly
    empty (all row groups pruned)."""
    out = str(tmp_path / "li_sorted2")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_range_sorted(li, out, key="l_orderkey", num_files=4)

    scan = spark.read.parquet(out).filter(F.col("l_orderkey") == 42)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_orderkey" in plan

    max_key = li.agg(F.max("l_orderkey")).collect()[0][0]
    assert spark.read.parquet(out).filter(
        F.col("l_orderkey") > max_key
    ).count() == 0


def test_footer_stats_pushdown(spark, tmp_path):
    from apd_map_reduce_spark.sources.files import footer_stats

    out = str(tmp_path / "li_stats")
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.write.mode("overwrite").parquet(out)
    row = footer_stats(spark, out, "l_orderkey")
    expected = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.count(F.lit(1))
    ).collect()[0]
    assert (row.lo, row.hi, row.n_rows) == tuple(expected)
    # and the plan really pushed the aggregate
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        plan = (
            spark.read.parquet(out)
            .agg(F.min("l_orderkey"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedAggregation" in plan
    finally:
        spark.conf.unset("spark.sql.parquet.aggregatePushdown")
        spark.conf.unset("spark.sql.sources.useV1SourceList")


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    from apd_map_reduce_spark.sinks import write_zordered

    out = str(tmp_path / "li_z")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_zordered(li, out, "l_orderkey", "l_partkey", num_files=8)

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == 8

    dom = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    dspan1 = dom[1] - dom[0] or 1
    dspan2 = dom[3] - dom[2] or 1

    areas = []
    for f in files:
        part = spark.read.parquet(f)
        r = part.agg(
            F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
        ).collect()[0]
        areas.append(((r[1] - r[0]) / dspan1) * ((r[3] - r[2]) / dspan2))
    # Z-ordered files cover small rectangles: with 8 files the mean
    # covered area must be well under the whole domain (a random or
    # single-key layout leaves the other dimension at ~full span).
    assert sum(areas) / len(areas) < 0.5, areas
    assert spark.read.parquet(out).count() == li.count()


def test_compact_parquet_small_files(spark, tmp_path):
    from apd_map_reduce_spark.sinks import compact_parquet

    src = str(tmp_path / "many_small")
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.repartition(32).write.mode("overwrite").parquet(src)

    dest = str(tmp_path / "compacted")
    before, after = compact_parquet(spark, src, dest, target_file_mb=128)
    assert before == 32
    assert after < before
    got = glob.glob(os.path.join(dest, "part-*.parquet"))
    assert len(got) == after
    assert spark.read.parquet(dest).count() == li.count()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src)


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy layout: a date filter must become a
    PartitionFilter (directory pruning — zero IO for other days), not a
    post-scan predicate."""
    from pyspark.sql import functions as F

    from apd_map_reduce_spark.sinks import write_parquet
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    write_parquet(events, out, partition_by=["event_date"])

    n_days = events.select("event_date").distinct().count()
    assert n_days > 1

    one_day = events.select(F.max(F.to_date("ts"))).collect()[0][0]
    back = spark.read.parquet(out).filter(F.col("event_date") == F.lit(one_day))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:200], (
        "date predicate must prune partitions, not filter post-scan:\n" + plan[:800]
    )
    # and the data is intact for that day
    want = events.filter(F.col("event_date") == F.lit(one_day)).count()
    assert back.count() == want


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: when the pruning predicate only
    exists on the DIM side of a join, Spark must push a runtime
    dynamicpruning subquery into the partitioned fact scan — at 100 TB
    this is the difference between scanning one partition and all of
    them, with no static filter available to the planner."""
    from pyspark.sql import functions as F

    from apd_map_reduce_spark.sinks import write_parquet
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(events, out, partition_by=["event_type"])
    fact = spark.read.parquet(out)

    dim = spark.createDataFrame(
        [("purchase", 1), ("click", 0), ("view", 0), ("error", 0), ("signup", 0)],
        "t STRING, wanted INT",
    )
    joined = fact.join(dim.filter(F.col("wanted") == 1), fact.event_type == dim.t)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "dim-side filter must become a runtime partition-pruning "
        "subquery on the fact scan:\n" + plan[:1200]
    )
    want = events.filter(F.col("event_type") == "purchase").count()
    assert joined.count() == want


def test_explode_nonnull_null_element_divergence(spark):
    """explode_nonnull's contract is ELEMENT-level: it drops NULL array
    elements that a plain inner explode would emit (its point is to dodge
    the InferFiltersFromGenerate re-evaluation trap for producer arrays
    whose elements are non-null by construction). Pin the divergence so
    using it over user-data arrays with legitimate NULL elements is a
    conscious choice, not a silent row loss."""
    from apd_map_reduce_spark.plans.layout import explode_nonnull

    df = spark.createDataFrame(
        [(1, ["a", None, "b"]), (2, None), (3, [])],
        "id int, xs array<string>",
    )
    helper = explode_nonnull(df, ["id"], "xs", "x").collect()
    assert sorted((r.id, r.x) for r in helper) == [(1, "a"), (1, "b")]
    inner = df.select("id", F.explode("xs").alias("x")).collect()
    # inner explode keeps the NULL ELEMENT (it only skips empty/NULL arrays)
    assert sorted(((r.id, r.x) for r in inner), key=str) == [
        (1, "a"), (1, "b"), (1, None),
    ]


def test_explode_nonnull_contract_on_null_elements(spark):
    """Documents explode_nonnull's precondition (plans/layout.py): it
    is result-identical to a plain inner explode ONLY when the array's
    elements are non-null by construction. Over an array that contains
    NULL elements the two DIVERGE — explode_nonnull drops those rows
    (its IS NOT NULL filter cannot tell a null element from the
    explode_outer row of an empty/NULL array). A misuse therefore
    silently loses rows; this test pins the exact divergence so the
    contract is machine-checked, not just a docstring."""
    from apd_map_reduce_spark.plans.layout import (
        explode_nonnull,
        posexplode_nonnull,
    )

    df = spark.createDataFrame(
        [(1, ["a", None, "b"]), (2, []), (3, None), (4, ["c"])],
        "id long, xs array<string>",
    )

    # Non-null-element rows: identical to the plain inner explode.
    clean = df.filter(~F.exists("xs", lambda x: x.isNull()))
    plain = sorted(
        (r.id, r.x) for r in clean.select("id", F.explode("xs").alias("x")).collect()
    )
    helper = sorted(
        (r.id, r.x) for r in explode_nonnull(clean, ["id"], "xs", "x").collect()
    )
    assert plain == helper == [(4, "c")]

    # Null-element rows: the helper DROPS them, the inner explode keeps
    # them — the documented divergence.
    key = lambda t: (t[0], t[1] is not None, t[1] or "")  # noqa: E731
    plain_all = sorted(
        ((r.id, r.x) for r in df.select("id", F.explode("xs").alias("x")).collect()),
        key=key,
    )
    helper_all = sorted(
        ((r.id, r.x) for r in explode_nonnull(df, ["id"], "xs", "x").collect()),
        key=key,
    )
    assert plain_all == [(1, None), (1, "a"), (1, "b"), (4, "c")]
    assert helper_all == [(1, "a"), (1, "b"), (4, "c")]

    # posexplode twin: same contract, same divergence.
    pos_all = sorted(
        (r.id, r.p, r.x)
        for r in posexplode_nonnull(df, ["id"], "xs", "p", "x").collect()
    )
    assert pos_all == [(1, 0, "a"), (1, 2, "b"), (4, 0, "c")]
