"""SQL-surface adjudications pinned as tests.

Recursive CTEs landed in Spark 4: linear recursion works, but the
recursive member only supports UNION ALL — no fixpoint dedup — which
makes cyclic-graph reachability (the transitive dup-group closure)
inexpressible without path re-enumeration. These tests pin BOTH facts
so the design decision in operators/components.py ("the closure is a
driver-side label-propagation loop, the WITH RECURSIVE twin lives in
the DuckDB oracle only") rests on checked behavior, not recollection:
if a future Spark adds UNION-recursion, the xfail-style assertion
below starts failing and the SQL twin becomes worth registering.
"""

from __future__ import annotations

import pytest
from pyspark.sql.utils import AnalysisException


def test_linear_recursion_works(spark):
    out = spark.sql(
        """
WITH RECURSIVE t(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM t WHERE n < 5
)
SELECT * FROM t ORDER BY n"""
    ).collect()
    assert [r.n for r in out] == [1, 2, 3, 4, 5]


def test_union_recursion_unsupported_keeps_components_a_driver_loop(spark):
    """UNION (distinct) in the recursive member is the termination
    mechanism a cyclic reachability closure needs; Spark rejects it.
    components.connected_components stays a driver loop because of
    exactly this — revisit if this test ever fails."""
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "doc_a LONG, doc_b LONG"
    ).createOrReplaceTempView("sql_surface_pairs")
    with pytest.raises(AnalysisException, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
        spark.sql(
            """
WITH RECURSIVE
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM sql_surface_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM sql_surface_pairs
),
reach AS (
  SELECT src AS doc_id, src AS r FROM edges
  UNION
  SELECT e.src, w.r FROM edges e JOIN reach w ON w.doc_id = e.dst
)
SELECT doc_id, MIN(r) FROM reach GROUP BY doc_id"""
        ).collect()
