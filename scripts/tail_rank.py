"""Rank the non-headline query tail at sf0.1 under the bench protocol
(r13 directive #4: the r12 'no other q1-style trap' claim rested on
sf0.01 walls + hazard gates; one decade up makes it measurement-based).

Selects the N heaviest non-headline queries by the committed sf0.01
selfcheck walls (t_spark_s includes oracle-harness overhead — fine for
SELECTION, not for the ranking itself), then times each at sf0.1 with
the bench protocol: warm pass, min-of-PASSES noop-sink runs, caches
cleared between. Writes {query: {min, median, sf001_selfcheck_s}}
sorted by min.

Usage: python scripts/tail_rank.py OUT.json [N] [PASSES]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apd_map_reduce_spark.registry import QUERY_INDEX, headline_queries  # noqa: E402
from apd_map_reduce_spark.session import get_spark  # noqa: E402

SELFCHECK = Path(__file__).resolve().parent.parent / "SELFCHECK_r12.json"


def main() -> None:
    out_path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = "/root/testdata/sf0.1"

    sc_data = json.loads(SELFCHECK.read_text())
    walls = {q["query"]: q["t_spark_s"] for q in sc_data["queries"]}
    headline = {q.name for q in headline_queries()}
    tail = sorted(
        (n for n in walls if n not in headline and n in QUERY_INDEX),
        key=lambda n: -walls[n],
    )[:top_n]

    spark = get_spark(app_name="tail-rank-sf01")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.time()
        QUERY_INDEX[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    results: dict[str, dict] = {}
    for i, name in enumerate(tail):
        spark.sparkContext.setJobDescription(f"tail-rank {name}")
        try:
            run(name)  # warm
            samples = sorted(run(name) for _ in range(passes))
            results[name] = {
                "min": round(samples[0], 3),
                "median": round(samples[len(samples) // 2], 3),
                "sf001_selfcheck_s": walls[name],
            }
        except Exception as exc:  # noqa: BLE001 — record, keep ranking
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"[{i + 1}/{len(tail)}] {name}: {results[name]}", file=sys.stderr)

    ranked = dict(
        sorted(results.items(), key=lambda kv: -kv[1].get("min", float("inf")))
    )
    Path(out_path).write_text(
        json.dumps(
            {
                "directive": "r12 verdict #4: sf0.1 ranking of the 50 heaviest non-headline queries",
                "protocol": "bench protocol - warm pass then min/median-of-%d noop-sink, clearCache between passes" % passes,
                "sf_dir": sf_dir,
                "queries": ranked,
            },
            indent=1,
        )
    )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
