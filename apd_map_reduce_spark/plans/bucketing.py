"""Bucketing: pre-shuffled, co-located table layout (SURVEY.md §7 /
driver mandate "bucketing for co-located joins").

Writing two tables bucketed by the same key into the session catalog
lets Catalyst plan their join with ZERO exchanges — the shuffle was
paid once at write time. At 100 TB this converts every recurring
fact-fact join (orders⋈lineitem on orderkey) from the dominant cost to
a local merge. tests/test_bucketing.py asserts the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-merged-ready) table in
    the session catalog (parquet under spark.sql.warehouse.dir)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planned
    without exchanges when bucket specs align."""
    return spark.table(left_table).join(spark.table(right_table), on)
