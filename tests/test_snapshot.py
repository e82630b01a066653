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


def test_scd2_history_collapses_runs(spark):
    import datetime

    from apd_map_reduce_spark.operators.snapshot import scd2_history

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), 1, "view"), (2, t(1), 1, "view"), (3, t(2), 1, "click"),
        (4, t(3), 1, "click"), (5, t(4), 1, "view"),
        (6, t(0), 2, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = sorted(
        scd2_history(ev).collect(), key=lambda r: (r.user_id, r.valid_from)
    )
    # User 1: view[0,2) click[2,4) view[4,open); user 2: error[0,open).
    assert [(r.user_id, r.event_type, r.is_current) for r in got] == [
        (1, "view", False), (1, "click", False), (1, "view", True),
        (2, "error", True),
    ]
    assert got[0].valid_to == got[1].valid_from  # intervals chain
    assert got[2].valid_to is None and got[3].valid_to is None


def test_merge_upsert_update_insert_untouched(spark):
    from apd_map_reduce_spark.operators.snapshot import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, v string, n long"
    )
    updates = spark.createDataFrame(
        [(2, "B2", 99), (4, "d", 40)], "k long, v string, n long"
    )
    got = {r.k: (r.v, r.n) for r in merge_upsert(base, updates, "k").collect()}
    assert got == {1: ("a", 10), 2: ("B2", 99), 3: ("c", 30), 4: ("d", 40)}
