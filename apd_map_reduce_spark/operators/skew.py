"""Skew-mitigation operators (SURVEY.md §6.3: the reference's alphabet
partitioning suffers 100x letter skew and load-balances poorly; at
100 TB a single hot key stalls a straggler task).

Two Spark-native answers:
  * AQE skew-join splitting — already on in session.py (config, not
    code); `aqe_skew_split_confs` lowers its thresholds so the split is
    observable/testable at local scale, and tests/test_skew_and_api.py
    asserts the `SortMergeJoin(skew=true)` / `AQEShuffleRead skewed`
    markers in the executed plan.
  * Salted two-phase aggregation — for aggregations whose key histogram
    is so skewed that even AQE's post-shuffle splitting leaves one
    reducer hot. Works for any MERGEABLE aggregate; exposed here for
    count/sum shapes.

`salted_agg` matches `df.groupBy(key).agg(...)` exactly for
integer/decimal/count/min/max aggregates — the property test in
tests/test_skew.py asserts equality on those. For DOUBLE-typed sums the
two-phase split changes floating-point accumulation order, so results
can differ from the unsalted plan in the last ulp (and across retries:
the salt derives from monotonically_increasing_id, which is
nondeterministic under task re-execution). Cast double sum inputs to
decimal first if you need exactness — same rule the query layer uses.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def aqe_skew_split_confs(
    spark: SparkSession,
    threshold: str = "32KB",
    advisory: str = "16KB",
    factor: int = 2,
) -> Iterator[None]:
    """Temporarily tune AQE so its skew-join split engages on test-scale
    data (production defaults only split partitions >256MB — correct at
    100 TB, unobservable at sf0.001). Broadcast is disabled so the join
    stays sort-merge, the shape skew splitting applies to. Restores every
    conf on exit.

    Note AQE skips the split when the join's output partitioning is
    reused downstream (e.g. a groupBy on the join key) unless
    spark.sql.adaptive.forceOptimizeSkewedJoin is set — splitting would
    introduce an extra shuffle there.
    """
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": str(factor),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": threshold,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory,
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    aggs: output_name -> (input_col, fn) with fn in {count, sum, min, max}.
    Phase 1 groups by (key, salt) — the hot key spreads over n_salts
    reducers; phase 2 merges the n_salts partials per key (tiny).
    """
    phase1_aggs = []
    phase2_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-mergeable aggregate: {fn}")
    salted = df.withColumn("__salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(*phase1_aggs)
    return partial.groupBy(key).agg(*phase2_aggs)


def salted_event_totals(events: DataFrame) -> DataFrame:
    """Registry query: per-type event totals through the salted
    two-phase aggregation — driver-checked against the plain GROUP BY
    oracle, proving salting is result-transparent. The double `value`
    is cast to decimal BEFORE salting (module rule above): decimal sums
    are exact under any accumulation order, so the two-phase split
    cannot drift."""
    from apd_map_reduce_spark.queries.base import as_double, dec2

    prepared = events.withColumn("v_dec", dec2("value"))
    out = salted_agg(
        prepared,
        key="event_type",
        aggs={
            "n_events": ("", "count"),
            "total_value_dec": ("v_dec", "sum"),
            "max_value": ("value", "max"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        as_double(F.col("total_value_dec")).alias("total_value"),
        "max_value",
    )


SALTED_TOTALS_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
"""


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof fact⋈dim equi-join by key salting — the manual
    fallback when the dim is too big to broadcast and a single hot fact
    key would stall one sort-merge reducer (AQE's skew split handles
    the common case; salting handles keys so hot that even a split
    partition is one key's rows).

    Mechanics: the dim side is replicated n_salts ways (explode over
    the salt range — n_salts× dim rows, the technique's price); the
    fact side computes a DETERMINISTIC salt from `salt_source` (a
    stable row id — never rand() or monotonically_increasing_id, which
    change under task retry), so the hot key's rows scatter over
    n_salts composite (key, salt) reducers. The join result is
    row-identical to the unsalted join; the registry query proves it
    against a plain-join DuckDB oracle.

    Scale: shuffle volume grows by the replicated dim (n_salts×|dim|)
    — choose n_salts ≈ hot-key rows / healthy-partition rows, and
    salt only the hot keys (split-and-union) when the dim is large."""
    # Collision-free helper names: a fact/dim that already carries a
    # column named __salt/__dsalt would otherwise be silently joined on
    # the wrong predicate (or have its data dropped by the final drop),
    # breaking the row-identity contract. Suffix a counter until the
    # names are absent from BOTH inputs.
    taken = set(fact.columns) | set(dim.columns)
    i = 0
    while f"__salt{i}" in taken or f"__dsalt{i}" in taken:
        i += 1
    salt_col, dsalt_col = f"__salt{i}", f"__dsalt{i}"
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    dim_rep = dim.withColumn(dsalt_col, F.explode(salts))
    # coalesce before crc32: crc32(NULL) is NULL and a NULL salt would
    # make the join predicate NULL — silently DROPPING fact rows whose
    # join key matches, which breaks the row-identity contract. NULL
    # salt sources all land in one bucket (hash of ""), which only
    # costs balance, never rows.
    fact_s = fact.withColumn(
        salt_col,
        F.pmod(
            F.crc32(F.coalesce(F.col(salt_source).cast("string"), F.lit(""))),
            F.lit(n_salts),
        ).cast("int"),
    )
    return (
        fact_s.join(
            dim_rep,
            (F.col(fact_key) == F.col(dim_key)) & (F.col(salt_col) == F.col(dsalt_col)),
        )
        .drop(salt_col, dsalt_col)
    )


def salted_join_totals(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Registry query: events enriched with the customer dim through
    the salted join, rolled up per market segment — driver-checked
    against the plain JOIN + GROUP BY oracle, proving the salt is
    result-transparent. Decimal-cast sums (module rule) keep the
    post-join aggregation exact under any row order."""
    from apd_map_reduce_spark.queries.base import as_double, dec2

    joined = salted_join(
        events.withColumn("v_dec", dec2("value")),
        customer.select("c_custkey", "c_mktsegment"),
        fact_key="user_id",
        dim_key="c_custkey",
        salt_source="event_id",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        as_double(F.sum("v_dec")).alias("total_value"),
    )


SALTED_JOIN_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def top_keys_by_frequency(df: DataFrame, key: Column | str, k: int = 10) -> DataFrame:
    """Skew diagnosis: the key histogram head (what you check before
    choosing salting / AQE / broadcast). One aggregation + a k-row
    TakeOrdered merge — never a global sort."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(c.alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(k)
    )


TOP_KEYS_ORACLE = """
SELECT user_id AS key, COUNT(*) AS n
FROM events GROUP BY user_id
ORDER BY n DESC, key ASC LIMIT 10
"""
