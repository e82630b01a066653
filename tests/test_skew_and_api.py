"""Skew operators + SQL facade."""

from __future__ import annotations

from pyspark.sql import functions as F

from apd_map_reduce_spark.api import register_views, sql
from apd_map_reduce_spark.operators.skew import salted_agg, top_keys_by_frequency
from apd_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_salted_agg_equals_direct(spark):
    """Salted two-phase aggregation is semantically identical to the
    direct groupBy — on a deliberately skewed dataset (90% one key)."""
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot")).otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    direct = {
        r.k: (r.n, r.total, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.total, r.lo, r.hi)
        for r in salted_agg(
            df,
            "k",
            {
                "n": ("v", "count"),
                "total": ("v", "sum"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == direct
    assert direct["hot"][0] == 9000


def test_salted_join_equals_direct(spark):
    """Salted fact⋈dim join is row-identical to the plain join on a
    deliberately skewed fact (90% of rows hit one dim key), and with
    broadcast disabled it plans a shuffle join on the composite
    (key, salt) — the hot key's rows spread over n_salts reducers."""
    from apd_map_reduce_spark.operators.skew import salted_join

    fact = spark.range(0, 10000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(0, 7).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    direct = (
        fact.join(dim, fact["k"] == dim["dk"])
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    salted = (
        salted_join(fact, dim, "k", "dk", salt_source="row_id", n_salts=8)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    d = {r.label: (r.n, r.total) for r in direct.collect()}
    s = {r.label: (r.n, r.total) for r in salted.collect()}
    assert s == d
    # 9000 hot rows + the cold rows whose id % 7 == 1
    assert d["d1"][0] >= 9000
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            salted_join(fact, dim, "k", "dk", salt_source="row_id", n_salts=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_salted_join_keeps_null_salt_rows(spark):
    """A NULL salt_source must not drop the row: crc32(NULL) is NULL
    and an un-coalesced salt would null out the join predicate."""
    from apd_map_reduce_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, None), (1, "a"), (2, "b")], "k INT, src STRING"
    )
    dim = spark.createDataFrame([(1, "d1"), (2, "d2")], "dk INT, label STRING")
    out = salted_join(fact, dim, "k", "dk", salt_source="src").collect()
    assert len(out) == 3  # the NULL-src row survives


def test_salted_join_survives_reserved_column_names(spark):
    """Inputs already carrying the helper names must pass through
    intact: the join still matches on the real predicate and the
    user's columns are preserved, not dropped (advisor r4 finding)."""
    from apd_map_reduce_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, "x", 77), (2, "y", 88)], "k INT, src STRING, __salt0 INT"
    )
    dim = spark.createDataFrame(
        [(1, "d1", 99), (2, "d2", 100)], "dk INT, label STRING, __dsalt0 INT"
    )
    out = salted_join(fact, dim, "k", "dk", salt_source="src", n_salts=4)
    rows = {r.k: r for r in out.collect()}
    assert set(rows) == {1, 2}
    # user columns with the "reserved" names survive with their values
    assert rows[1]["__salt0"] == 77 and rows[2]["__salt0"] == 88
    assert rows[1]["__dsalt0"] == 99 and rows[2]["__dsalt0"] == 100
    assert rows[1].label == "d1" and rows[2].label == "d2"


def test_top_keys_by_frequency(spark):
    events = load_table(spark, SF_SMOKE, "events")
    head = top_keys_by_frequency(events, "event_type", k=3).collect()
    assert len(head) == 3
    assert head[0].n >= head[1].n >= head[2].n


def test_sql_facade(spark):
    views = register_views(spark, SF_SMOKE)
    assert "lineitem" in views and "documents" in views
    df = sql(
        spark,
        SF_SMOKE,
        """
        SELECT r_name, COUNT(*) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """,
    )
    rows = {r.r_name: r.n for r in df.collect()}
    assert sum(rows.values()) == load_table(spark, SF_SMOKE, "customer").count()


def test_sliding_user_activity_stream(spark, tmp_path):
    """Sliding-window streaming agg drains and produces overlapping
    windows (2x rows of tumbling for 1h/30m)."""
    import os
    import shutil

    from apd_map_reduce_spark.streaming.windows import (
        events_stream_schema,
        read_events_stream,
        sliding_user_activity,
    )

    d = str(tmp_path / "ev")
    os.makedirs(d)
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), os.path.join(d, "events.parquet"))
    stream = read_events_stream(spark, d, events_stream_schema(spark, os.path.join(d, "events.parquet")))
    q = (
        sliding_user_activity(stream)
        .writeStream.format("memory")
        .queryName("sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("sliding").collect()
    assert len(rows) > 0
    assert all(r.approx_users > 0 and r.n_events > 0 for r in rows)


def test_aqe_skew_join_split_in_executed_plan(spark):
    """AQE's skew-split (the config-not-code twin of salted_agg) must
    engage on a 90%-one-key join: the final adaptive plan marks the
    join skew=true and the hot side's shuffle read as skewed."""
    from apd_map_reduce_spark.operators.skew import aqe_skew_split_confs

    left = spark.range(300_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    with aqe_skew_split_confs(spark):
        # Aggregate on a key DIFFERENT from the join key: reusing the
        # join's partitioning downstream makes AQE (correctly) skip the
        # split to avoid an extra shuffle.
        out = (
            left.join(right, "k")
            .groupBy((F.col("v") % 1000).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(rows) == 1000
    # Match loosely: the exact rendering ("SortMergeJoin(skew=true)",
    # "AQEShuffleRead skewed") varies across Spark versions; the
    # invariant is that SOME skew marker appears in the executed plan.
    assert "skew" in plan.lower(), f"no skew marker in executed plan:\n{plan}"
