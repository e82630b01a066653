"""Parquet table loader for the synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition splitting (scale posture: at
100 TB these become multi-file datasets and nothing here changes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table as a DataFrame.

    SESSION-WIDE SIDE EFFECT when ``name == "events"``: sets
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the caller's
    session and does NOT restore it (the conf is read at scan
    execution, so restoring before the action would re-break the
    read). After the first events load, any other TIMESTAMP(NANOS)
    parquet read in the same session also returns bigint nanos
    instead of erroring — apply the same ``timestamp_micros(ts div
    1000)`` normalization used below if you read such files directly.
    """
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark refuses to read
        # (PARQUET_TYPE_ILLEGAL) unless this runtime SQLConf is on. The
        # engine's own session factory sets it, but load_table must work
        # under ANY caller-provided session (e.g. the correctness harness),
        # so set it here too. Deliberately not restored: the conf is
        # consulted again at scan execution time, so resetting it before
        # the action runs would re-break the read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as nanos since
        # epoch. Truncate to µs — same as DuckDB's TIMESTAMP_NS→TIMESTAMP.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
