"""Graph operator behavior tests on hand-built graphs, plus the
runtime bloom-filter plan gate (Catalyst's scale-path join pruning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.graph import (
    copurchase_edges,
    degree_distribution,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_count_k4(spark):
    # K4: 6 edges, 4 triangles.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    row = triangle_count(_edges(spark, k4)).collect()[0]
    assert (row.n_edges, row.n_triangles) == (6, 4)


def test_triangle_count_no_triangle(spark):
    # A path graph has no triangles; a square (4-cycle) doesn't either.
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    row = triangle_count(_edges(spark, square)).collect()[0]
    assert (row.n_edges, row.n_triangles) == (4, 0)


def test_triangle_count_hub_graph(spark):
    # Star + one rim edge: exactly one triangle, hub degree 4 exercises
    # the degree-orientation tie-breaks.
    star = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)]
    row = triangle_count(_edges(spark, star)).collect()[0]
    assert (row.n_edges, row.n_triangles) == (5, 1)


def test_degree_distribution(spark):
    star = [(1, 2), (1, 3), (1, 4)]
    got = {r.degree: r.n_nodes for r in degree_distribution(_edges(spark, star)).collect()}
    assert got == {3: 1, 1: 3}


def test_copurchase_edges_bounded_and_filtered(spark):
    li = spark.createDataFrame(
        [
            (1, 10, 50.0),
            (1, 11, 50.0),
            (1, 12, 10.0),  # below quantity threshold: excluded
            (2, 10, 50.0),
            (2, 11, 50.0),  # duplicate edge (10, 11) across orders: distinct
        ],
        "l_orderkey long, l_partkey long, l_quantity double",
    )
    got = {(r.a, r.b) for r in copurchase_edges(li, min_quantity=45).collect()}
    assert got == {(10, 11)}


def test_runtime_bloom_filter_injected(spark, tmp_path):
    """At cluster scale Catalyst injects a bloom runtime filter on the
    probe side of a shuffle join whose build side carries a selective
    predicate (spark.sql.optimizer.runtime.bloomFilter.*). The scan-size
    threshold is tuned for real clusters, so lower it to observe the
    rewrite on test data — the gate proves the engine config keeps the
    optimization reachable (it requires file-source scans and a
    non-broadcast join)."""
    big_p, small_p = str(tmp_path / "big"), str(tmp_path / "small")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("x")
    ).write.mode("overwrite").parquet(big_p)
    spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("y")
    ).write.mode("overwrite").parquet(small_p)
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # broadcast joins skip bloom
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        big = spark.read.parquet(big_p)
        small = spark.read.parquet(small_p).filter(F.col("y") == 3)
        optimized = big.join(small, "k")._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized, (
            "runtime bloom filter was not injected:\n" + optimized[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_item_jaccard_hand_orders(spark):
    from apd_map_reduce_spark.operators.graph import item_jaccard

    # Orders: o1={p1,p2}, o2={p1,p2}, o3={p1,p3}.
    # jaccard(p1,p2) = 2 / (3+2-2) = 2/3 -> 666666 (floor at 1e6).
    # jaccard(p1,p3) = 1 / (3+1-1) = 1/3 -> 333333.
    rows = [
        (1, 1, 50.0), (1, 2, 50.0),
        (2, 1, 50.0), (2, 2, 50.0),
        (3, 1, 50.0), (3, 3, 50.0),
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    )
    got = {
        (r.part_a, r.part_b): (r.co_orders, r.jaccard_e6)
        for r in item_jaccard(li, min_quantity=0, min_jaccard_e6=0).collect()
    }
    assert got == {(1, 2): (2, 666666), (1, 3): (1, 333333)}


def test_item_jaccard_threshold_filters(spark):
    from apd_map_reduce_spark.operators.graph import item_jaccard

    rows = [
        (1, 1, 50.0), (1, 2, 50.0),
        (2, 1, 50.0), (2, 2, 50.0),
        (3, 1, 50.0), (3, 3, 50.0),
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    )
    kept = item_jaccard(li, min_quantity=0, min_jaccard_e6=500_000).collect()
    assert [(r.part_a, r.part_b) for r in kept] == [(1, 2)]


def test_assoc_rules_hand_baskets(spark):
    from apd_map_reduce_spark.operators.graph import assoc_rules

    # Baskets: o1={1,2}, o2={1,2}, o3={1,3}. N=3 orders.
    rows = [
        (1, 1, 50.0), (1, 2, 50.0),
        (2, 1, 50.0), (2, 2, 50.0),
        (3, 1, 50.0), (3, 3, 50.0),
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    )
    got = {
        (r.antecedent, r.consequent): (r.support_e6, r.confidence_e6, r.lift_e6)
        for r in assoc_rules(li, min_quantity=0, min_conf_e6=0).collect()
    }
    # 1->2: co=2, deg(1)=3, deg(2)=2: support 2/3, conf 2/3, lift conf*3/2.
    assert got[(1, 2)] == (666666, 666666, 999999)
    # 2->1: co=2, deg(2)=2: conf 1, lift 1*3/3 = 1.
    assert got[(2, 1)] == (666666, 1000000, 1000000)
    # 3->1: co=1, deg(3)=1: conf 1, lift 3/3 = 1.
    assert got[(3, 1)] == (333333, 1000000, 1000000)
    assert got[(1, 3)] == (333333, 333333, 999999)
