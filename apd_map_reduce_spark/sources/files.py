"""Generic file-format sources (engine-ification v1, SURVEY.md §7.3).

Thin, explicit-schema wrappers over `spark.read` — schema inference is
disabled by default for determinism (SURVEY.md §1.3: the reference's
schema is fixed and implicit; ours is fixed and EXPLICIT). Each reader
returns a plain DataFrame so Catalyst keeps pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_text(spark: SparkSession, path: str | list[str], whole_file: bool = False) -> DataFrame:
    """Line-per-row text (reference S2 granularity is handled by
    tokenization downstream, not the reader)."""
    return spark.read.option("wholetext", str(whole_file).lower()).text(path)


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str | list[str], schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_parquet(spark: SparkSession, path: str | list[str]) -> DataFrame:
    return spark.read.parquet(*path) if isinstance(path, list) else spark.read.parquet(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Multimodal raw-bytes source: one row per file with (path,
    modificationTime, length, content BINARY) — the 100 TB posture for
    image/audio payloads (operators/multimodal.py consumes this)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
