"""Schema contract: every declared table matches the testdata parquet."""

from __future__ import annotations

import pytest

from apd_map_reduce_spark.schemas import TABLE_SCHEMAS, validate_table
from apd_map_reduce_spark.sources.tables import TABLES, load_table

from .conftest import SF_SMOKE


@pytest.mark.parametrize("name", TABLES)
def test_declared_schema_matches_parquet(spark, name):
    df = load_table(spark, SF_SMOKE, name)
    validate_table(df, name)  # raises on drift


def test_validate_rejects_drift(spark):
    df = load_table(spark, SF_SMOKE, "region").withColumnRenamed("r_name", "oops")
    with pytest.raises(ValueError, match="schema drift"):
        validate_table(df, "region")
