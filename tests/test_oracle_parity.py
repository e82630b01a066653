"""Driver-contract parity: every registry query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS gate (row-count + columns + exact
values, order-insensitive) at sf0.001 for speed; run
``python scripts/check_oracle.py`` for the sf0.01 gate.
"""

from __future__ import annotations

import duckdb
import pytest

from apd_map_reduce_spark.registry import ALL_QUERIES
from apd_map_reduce_spark.sources.tables import TABLES
from scripts.check_oracle import compare

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


@pytest.mark.parametrize("qdef", ALL_QUERIES, ids=[q.name for q in ALL_QUERIES])
def test_query_matches_oracle(spark, duck, qdef):
    spark_pdf = qdef.fn(spark, SF_SMOKE).toPandas()
    if qdef.oracle is None:
        assert len(spark_pdf) > 0, f"{qdef.name}: rows-only query returned 0 rows"
        return
    oracle_pdf = duck.execute(qdef.oracle).df()
    problems = compare(qdef.name, spark_pdf, oracle_pdf)
    assert not problems, f"{qdef.name}: {problems}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names
    assert len(names) >= 30
