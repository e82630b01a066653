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
