"""Explicit schema declarations for every table the engine consumes
(SURVEY.md §1.3: the reference's schema is fixed and implicit; ours is
fixed and EXPLICIT — inference is never relied on for semantics).

Timestamp columns are declared as they arrive under the reader confs
set by `sources/tables.py`: parquet NTZ-micros maps to TIMESTAMP_LTZ
(inferTimestampNTZ off), and a legacy TIMESTAMP(NANOS) events file is
normalized to the same µs TIMESTAMP. `validate_table` is the
load-time guard: fails fast on column drift instead of mis-answering
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])  # type: ignore[arg-type]


TABLE_SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _s(
        ("event_id", LongType()),
        ("ts", TimestampType()),  # post nanos→µs normalization
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _s(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

# Reference-pipeline relations (FIXTURES.md F1-F3)
MANIFEST_SCHEMA = _s(("file_id", IntegerType()), ("path", StringType()))
CORPUS_SCHEMA = _s(("file_id", IntegerType()), ("line", StringType()))
INVERTED_INDEX_SCHEMA = _s(
    ("word", StringType()),
    ("file_ids", ArrayType(IntegerType())),
    ("df", IntegerType()),
)


def validate_table(df: DataFrame, name: str) -> DataFrame:
    """Fail fast if a loaded table drifted from the declared contract
    (column names + types; nullability not enforced)."""
    expected = TABLE_SCHEMAS[name]
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    if got != want:
        raise ValueError(f"schema drift for {name}: got {got}, want {want}")
    return df
