"""snapshot_diff behavior on hand-built snapshots."""

from __future__ import annotations

from apd_map_reduce_spark.operators.snapshot import snapshot_diff


def test_snapshot_diff_classifies_all_cases(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, key="doc_id", payload="text").collect()
    }
    # doc 1 unchanged -> absent from the delta.
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_empty_delta(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert snapshot_diff(df, df, key="doc_id", payload="text").count() == 0
