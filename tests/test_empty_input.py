"""Blanket empty-input gate: every registry query must ANALYZE AND RUN
on zero-row tables without raising.

At 100 TB an empty partition, a filter that matches nothing, or a
fresh/empty table is routine — a query that divides by a driver-side
count, collects centroids from no rows, or builds an untyped empty
array literal fails there and nowhere else. This sweep caught exactly
two such defects on first run (pagerank teleport ÷ 0, kmeans empty
centroid-literal array); result VALUES on empty input are not asserted
(most queries legitimately return 0 rows, some return a single
zero/null row) — only that execution completes.
"""

from __future__ import annotations

import os

import pytest

from apd_map_reduce_spark.registry import ALL_QUERIES
from apd_map_reduce_spark.sources.tables import TABLES, load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Zero-row copies of every table, written through load_table so
    column types (µs timestamps included) match the real tables."""
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load_table(spark, SF_SMOKE, t).limit(0).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize("qdef", ALL_QUERIES, ids=[q.name for q in ALL_QUERIES])
def test_runs_on_empty_tables(spark, empty_sf_dir, qdef):
    n = qdef.fn(spark, empty_sf_dir).count()
    assert n >= 0
