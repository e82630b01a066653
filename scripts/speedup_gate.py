"""Scalability gate — the reference checker's speedup protocol ported
to Spark (SURVEY.md §3.3/§6.3): same workload under local[1] vs
local[N], warm per-query timings, speedup ratios against the
reference's threshold shape (full ≥ 1.4/1.6/1.7 for the 2/4-way
configs; reference achieved 1.85-2.92).

Each config runs in a fresh subprocess (a JVM can't change master);
JVM startup is excluded by timing only the query loop after warmup.

Usage: python scripts/speedup_gate.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = """
import json, os, sys, time
sys.path.insert(0, "__REPO__")
from apd_map_reduce_spark.registry import headline_queries
from apd_map_reduce_spark.session import get_spark

spark = get_spark(app_name="speedup", master="local[" + sys.argv[1] + "]",
                  shuffle_partitions=max(int(sys.argv[1]), 4))
spark.sparkContext.setLogLevel("ERROR")
sf_dir = sys.argv[2]
spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()  # warmup
# min of 2 timed loops: single-loop wall time on a shared box swings
# +/-20% (GC, page cache); min-of-N is the standard noise floor and is
# applied IDENTICALLY to the sequential baseline and every parallel
# config, so ratios stay honest.
elapsed = []
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.time()
    for q in headline_queries():
        q.fn(spark, sf_dir).count()
    elapsed.append(time.time() - t0)
print("ELAPSED_JSON " + json.dumps({"elapsed": min(elapsed)}))
"""


def run_config(cores: int, sf_dir: str, repo: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.replace("__REPO__", repo), str(cores), sf_dir],
        capture_output=True,
        text=True,
        timeout=1800,
        check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED_JSON "):
            return json.loads(line.split(" ", 1)[1])["elapsed"]
    raise RuntimeError(f"no timing line in worker output:\n{out.stdout}\n{out.stderr}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seq = run_config(1, sf_dir, repo)
    results = {"sequential_local1_sec": round(seq, 2), "configs": {}}
    # threshold shape per SURVEY.md §3.3 (full / partial marks)
    for cores, full, partial in ((2, 1.4, 1.2), (4, 1.6, 1.4), (8, 1.7, 1.5)):
        par = run_config(cores, sf_dir, repo)
        speedup = seq / par
        results["configs"][f"local[{cores}]"] = {
            "sec": round(par, 2),
            "speedup": round(speedup, 2),
            "gate": "full" if speedup >= full else ("partial" if speedup >= partial else "FAIL"),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
