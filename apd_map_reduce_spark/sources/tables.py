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

    SESSION-WIDE SIDE EFFECT: sets two parquet-reader confs on the
    caller's session and does NOT restore them (they are read again at
    scan execution, so restoring before the action would re-break the
    read):

      * ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` — the
        testdata's timestamp columns are parquet isAdjustedToUTC=false
        micros; mapping them to TIMESTAMP_LTZ at the scan keeps the
        micros values bit-identical, keeps filters pushing down (a
        post-scan NTZ→LTZ projection would not), and matches DuckDB's
        naive-TIMESTAMP rendering under the UTC session timezone.
      * ``spark.sql.legacy.parquet.nanosAsLong=true`` (events only) —
        earlier testdata generations used TIMESTAMP(NANOS), which Spark
        refuses to read without it; kept so either generation loads.

    The engine's own session factory sets both, but load_table must
    work under ANY caller-provided session (e.g. the correctness
    harness), so they are set here too.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
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


def table_input_size(sf_dir: str, name: str) -> tuple[int, int] | None:
    """(total_bytes, n_files) of a table's parquet input, from local
    filesystem metadata — the cheap driver-side input to
    ``plans.layout.spread_by``'s scan-split estimate (r12 ADVICE: the
    ``df.rdd.getNumPartitions()`` probe forced a full physical-planning
    pass per query CONSTRUCTION). Returns None when the path is not
    statable locally (object store, missing file) — callers fall back
    to the planning probe, so remote deployments lose nothing."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            sizes = [
                e.stat().st_size
                for e in os.scandir(path)
                if e.is_file() and not e.name.startswith(("_", "."))
            ]
            return (sum(sizes), len(sizes)) if sizes else None
        return (os.path.getsize(path), 1)
    except OSError:
        return None
