"""The sampled-audit doc slice (`dedup._hash_sampled`) — the three
properties that motivated the md5 rewrite:

* ADJACENT ids co-occur in the slice at the ~1/m^2 rate a pairwise-
  independent hash gives. This is the property every multiplicative
  scheme fails (low bits are doc_id % 2^s outright; a high-bit range
  selection of a fixed-stride sequence h(x+1)=h(x)+K can never keep
  x and x+1) — and the scale fixtures plant near-dup pairs at
  adjacent ids, so a slice without it strips the audit's own signal;
* the Spark predicate and the DuckDB oracle SQL select the IDENTICAL
  doc set, including ids past 3.47e9 where a naive id*K would
  overflow int64 (Spark wraps, DuckDB raises — divergence);
* the slice is an exact, deterministic ~1/m fraction.
"""

from __future__ import annotations

import duckdb
import pytest

from apd_map_reduce_spark.operators.dedup import (
    RECALL_SAMPLE_MOD,
    _hash_sampled,
    _hash_slice_sql,
)

N = 4096
MOD = RECALL_SAMPLE_MOD  # 4 → slice ~1/4, adjacent pairs ~1/16


def _spark_kept(spark, ids):
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id LONG")
    return {r.doc_id for r in _hash_sampled(docs, MOD).collect()}


def test_slice_keeps_adjacent_pairs_at_pairwise_rate(spark):
    kept = _spark_kept(spark, range(N))
    # ~N/m docs survive ...
    assert N / MOD * 0.8 < len(kept) < N / MOD * 1.2
    # ... and (i, i+1) pairs survive at ~N/m^2 — the near-dup-pair
    # retention rate. Any multiplicative slice scores EXACTLY ZERO
    # here; binomial 3-sigma around 256 is ~±47, bands kept looser.
    both = sum(1 for i in range(N - 1) if i in kept and i + 1 in kept)
    assert N / MOD**2 * 0.6 < both < N / MOD**2 * 1.5


@pytest.mark.parametrize(
    "ids",
    [
        list(range(0, 512)),
        # past the int64-overflow line for doc_id * 2654435761, and a
        # huge-id band: the engines must still agree exactly
        [3_470_000_000 + i for i in range(256)],
        [2**62 + i for i in range(256)],
    ],
)
def test_slice_matches_duckdb_oracle_exactly(spark, ids):
    got = _spark_kept(spark, ids)
    con = duckdb.connect()
    exp = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM (SELECT unnest(?::BIGINT[]) AS doc_id) "
            f"WHERE {_hash_slice_sql(MOD)}",
            [ids],
        ).fetchall()
    }
    con.close()
    assert got == exp
    assert 0 < len(exp) < len(ids)
