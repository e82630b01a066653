"""Contracts of the generated relational scale decade
(scripts/gen_scale_tables.gen_relational): key-shifted replication
must preserve referential integrity and per-entity distributions
EXACTLY — that is what makes cross-decade growth factors attributable
to volume, not to drifted join selectivity.

duckdb-only (no Spark session); skipped when the gitignored .scale/sf1
decade has not been generated in this checkout.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

SF1 = Path(__file__).resolve().parent.parent / ".scale" / "sf1"
SF01 = Path("/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not (SF1 / "orders.parquet").exists(),
    reason="relational sf1 decade not generated (scripts/gen_scale_tables.py)",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "events", "customer"):
        c.execute(f"CREATE VIEW {t}1 AS SELECT * FROM '{SF1 / (t + '.parquet')}'")
        c.execute(f"CREATE VIEW {t}0 AS SELECT * FROM '{SF01 / (t + '.parquet')}'")
    yield c
    c.close()


def test_row_counts_are_mult_exact(con):
    for t in ("orders", "lineitem", "events", "customer"):
        n1 = con.execute(f"SELECT COUNT(*) FROM {t}1").fetchone()[0]
        n0 = con.execute(f"SELECT COUNT(*) FROM {t}0").fetchone()[0]
        assert n1 == 10 * n0, t


def test_keys_stay_unique(con):
    for t, k in (("orders", "o_orderkey"), ("customer", "c_custkey"), ("events", "event_id")):
        dup = con.execute(
            f"SELECT COUNT(*) - COUNT(DISTINCT {k}) FROM {t}1"
        ).fetchone()[0]
        assert dup == 0, t


def test_referential_integrity(con):
    orphans = con.execute(
        "SELECT COUNT(*) FROM lineitem1 l LEFT JOIN orders1 o"
        " ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0
    orphans = con.execute(
        "SELECT COUNT(*) FROM orders1 o LEFT JOIN customer1 c"
        " ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0
    # event users live in custkey space at every copy shift
    orphans = con.execute(
        "SELECT COUNT(*) FROM events1 e LEFT JOIN customer1 c"
        " ON e.user_id = c.c_custkey WHERE c.c_custkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0


def test_per_entity_distributions_preserved(con):
    """lines-per-order and events-per-user histograms are EXACTLY 10x
    the base histograms — replication grew entities, not behavior."""
    for sql1, sql0 in (
        (
            "SELECT n, COUNT(*) FROM (SELECT COUNT(*) AS n FROM lineitem1 GROUP BY l_orderkey) GROUP BY n",
            "SELECT n, COUNT(*) FROM (SELECT COUNT(*) AS n FROM lineitem0 GROUP BY l_orderkey) GROUP BY n",
        ),
        (
            "SELECT n, COUNT(*) FROM (SELECT COUNT(*) AS n FROM events1 GROUP BY user_id) GROUP BY n",
            "SELECT n, COUNT(*) FROM (SELECT COUNT(*) AS n FROM events0 GROUP BY user_id) GROUP BY n",
        ),
    ):
        h1 = dict(con.execute(sql1).fetchall())
        h0 = dict(con.execute(sql0).fetchall())
        assert h1 == {k: 10 * v for k, v in h0.items()}


def test_date_filter_selectivity_preserved(con):
    """The q3-style date filter keeps its exact fraction — dates are
    copied, not resampled, so decade timings compare equal work per
    row."""
    frac1, frac0 = (
        con.execute(
            f"SELECT AVG(CASE WHEN o_orderdate < DATE '1998-01-01' THEN 1.0 ELSE 0.0 END) FROM {t}"
        ).fetchone()[0]
        for t in ("orders1", "orders0")
    )
    assert frac1 == frac0
