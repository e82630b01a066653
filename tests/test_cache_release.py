"""Cache-lifetime convention (docs/PLANS.md "Cache lifetime", r8
verdict directive #4): builders cache shared intermediates and never
unpersist — the SESSION OWNER releases via `session.release_caches`.
These tests pin the hook's contract: after running a cache-heavy
registry query and calling the hook, the session holds ZERO persistent
RDDs (SQL cache or RDD-level)."""

from __future__ import annotations

from apd_map_reduce_spark.registry import QUERY_INDEX
from apd_map_reduce_spark.session import release_caches
from tests.conftest import SF_SMOKE


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_after_cache_heavy_query(spark):
    """dedup_minhash_lsh caches the shingle + signature relations
    (operators/dedup.py) — the deepest cache user in the registry."""
    df = QUERY_INDEX["dedup_minhash_lsh"].fn(spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()
    assert _persistent_rdd_count(spark) > 0, (
        "expected the query to populate the cache — if this stops "
        "holding, pick another cache-heavy query for the fixture"
    )
    leftover = release_caches(spark)
    assert _persistent_rdd_count(spark) == 0
    # Every builder cache is a SQL-level DataFrame cache, so the
    # RDD-sweep half of the hook should find nothing left to do.
    assert leftover == 0


def test_release_sweeps_rdd_level_persists(spark):
    """The getPersistentRDDs sweep catches RDD-level persists the SQL
    catalog cache does not track."""
    rdd = spark.sparkContext.parallelize(range(100), 2).persist()
    rdd.count()
    assert _persistent_rdd_count(spark) > 0
    leftover = release_caches(spark)
    assert leftover >= 1  # the RDD survived the SQL-cache clear ...
    assert _persistent_rdd_count(spark) == 0  # ... and the sweep got it


def test_release_idempotent_on_clean_session(spark):
    release_caches(spark)
    assert release_caches(spark) == 0
    assert _persistent_rdd_count(spark) == 0
