"""Benchmark harness (driver contract + SURVEY.md §6.3 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], warm timings (one untimed JVM/plan warmup
pass over a trivial query, then each query timed end-to-end including
its action), and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Cold-start sections (BASELINE.md's own protocol reports cold AND warm —
the reference checker's wall_s includes process startup,
tema1a/checker/checker.sh:47): alongside the warm suite, the JSON
carries a `cold` object measured on FRESH python+JVM processes
(subprocess wall time, including interpreter start, session build, and
the first-plan compile):
  cold.flagship_wall_s — one fresh process running the flagship
    corpus_inverted_index end-to-end (the checker's shape);
  cold.headline_total_wall_s — one fresh process running every
    headline query once, no warmup pass (startup amortized once, the
    realistic cold-suite shape).
Invoke `bench.py --cold-child <flagship|headline>` for the child
workload (no output; the parent times the process).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from apd_map_reduce_spark.registry import headline_queries  # noqa: E402
from apd_map_reduce_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cold_child(which: str, sf_dir: str) -> None:
    """Workload half of a cold measurement: everything from interpreter
    start to the last action is inside the parent's wall clock."""
    spark = get_spark(app_name=f"bench-cold-{which}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = headline_queries()
    if which == "flagship":
        # by name, not position — the registry order rotates per round
        qs = [q for q in qs if q.name == "corpus_inverted_index"]
        assert qs, "flagship missing from headline set"
    for q in qs:
        _noop(q.fn(spark, sf_dir))


def _measure_cold(which: str, sf_dir: str) -> float:
    t0 = time.time()
    subprocess.run(
        [sys.executable, __file__, "--cold-child", which],
        check=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if len(sys.argv) >= 3 and sys.argv[1] == "--cold-child":
        _cold_child(sys.argv[2], sf_dir)
        return

    # Cold first: measuring a fresh process AFTER this process has
    # saturated the page cache would flatter it less/more depending on
    # scan size; before the warm suite both cold runs see whatever
    # cache state the environment has — the reference checker's own
    # condition.
    cold = {
        "flagship_wall_s": _measure_cold("flagship", sf_dir),
        "headline_total_wall_s": _measure_cold("headline", sf_dir),
        "note": (
            "fresh python+JVM process per measurement; includes "
            "interpreter start, session build, first-plan compile"
        ),
    }

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm protocol (BASELINE.md): one untimed pass per query warms JIT/
    # codegen/broadcast paths, then caches are dropped so the timed pass
    # re-executes every plan end-to-end. Reference numbers include C++
    # process startup; warm-vs-warm is the honest comparison (SURVEY §6.3).
    # noop-sink write, not count(): count() lets Catalyst drop final
    # sorts (EliminateSorts) and every projection, under-measuring
    # queries whose cost includes the ORDER BY / projection stage.
    # The noop sink executes the complete physical plan and discards
    # rows executor-side (no driver materialization).
    run = _noop

    for q in headline_queries():
        run(q.fn(spark, sf_dir))
    spark.catalog.clearCache()

    # Min-of-3 per query, median reported alongside: single-pass wall
    # time on this box swings far more than ±25% (identical code
    # measured 4.3 s and 15.1 s for the same query across rounds under
    # external load; an isolated pass mid-suite spiked 2.9 s → 8.8 s) —
    # min-of-2 was not enough to make round-over-round per-query
    # comparisons meaningful. Min stays the headline statistic (it is
    # the closest observable to the plan's intrinsic cost and is
    # back-comparable to every prior round's artifact); the median
    # exposes how noisy each query's passes were, so a round-over-round
    # delta can be read against the spread instead of trusted blindly.
    # Per-query action (noop sink, full plan) and warm protocol
    # unchanged; caches are dropped between passes so every pass
    # rebuilds its own (they are dead weight, and letting them pile up
    # makes later queries measure storage-eviction pressure instead of
    # their own plan).
    PASSES = 3
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for q in headline_queries():
        samples: list[float] = []
        for _ in range(PASSES):
            t0 = time.time()
            run(q.fn(spark, sf_dir))
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        samples.sort()
        timings[q.name] = round(samples[0], 3)
        medians[q.name] = round(samples[len(samples) // 2], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_warm",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "cold": cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
