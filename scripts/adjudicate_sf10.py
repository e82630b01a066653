"""r8 verdict directive #2: adjudicate the sf1→sf10 relational/events
growth factors at NOTES_r7 §4 rigor — per-query CAUSE lines backed by
one measurement each, not a family-level wave-through.

The five flagged queries (SCALING_r8_relational_5dec.json, sf1→sf10
step): pack_token_shards 8.81×, q18_large_orders 6.13×,
q1_pricing_summary 5.47×, q5_supplier_volume 5.21×,
stratified_sample_exact 4.62×. For each, this script runs the query at
sf1 and sf10 with the Spark UI's REST API enabled and collects the
per-stage task metrics the adjudication needs: executor run time,
input bytes, shuffle read/write bytes, MEMORY/DISK SPILL bytes, task
count, and max task time (straggler check). Stages are attributed to
the timed run via a per-run job group (jobs API → stageIds), so the
accumulating UI state of a shared session never bleeds between runs.

Binding-resource vocabulary (what the cause lines name):
  scan floor      — input-stage executorRunTime dominates and grows
                    ~linearly with input bytes; nothing to fix, the
                    cluster answer is more executors.
  spill           — memory/diskBytesSpilled > 0 in an agg/sort/join
                    stage: the per-partition working set outgrew the
                    fraction of the heap Spark gives an aggregation
                    before it falls back to sorting+spilling
                    (fix: more shuffle partitions at scale).
  shuffle ceiling — a fixed spark.sql.shuffle.partitions that leaves
                    per-partition shuffle reads far above the ~64 MB
                    AQE advisory target at sf10 (fix: raise AQE
                    initialPartitionNum; AQE coalesces it back down at
                    small SF so sf0.1 plans are unchanged).
  straggler       — max task time >> median in one stage (skew).

Usage: python scripts/adjudicate_sf10.py [out_json]
           [--only q1,q2] [--passes 3]
Writes SCALING_r9_adjudication.json by default.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from apd_map_reduce_spark.registry import QUERY_INDEX  # noqa: E402
from apd_map_reduce_spark.session import get_spark, release_caches  # noqa: E402

QUERIES = [
    "pack_token_shards",
    "q18_large_orders",
    "q1_pricing_summary",
    "q5_supplier_volume",
    "stratified_sample_exact",
]
SF_DIRS = {"sf1": REPO / ".scale" / "sf1", "sf10": REPO / ".scale" / "sf10"}
UI_PORT = 4049  # requested port; Spark binds 4050+ if taken, so _rest
# derives the actual base from sparkContext.uiWebUrl after startup.
UI_BASE = f"http://localhost:{UI_PORT}"


def _rest(app_path: str):
    with urllib.request.urlopen(f"{UI_BASE}/api/v1/{app_path}", timeout=30) as r:
        return json.load(r)


def _stage_metrics(app_id: str, group: str) -> list[dict]:
    jobs = _rest(f"applications/{app_id}/jobs")
    stage_ids = sorted(
        {
            sid
            for j in jobs
            if j.get("jobGroup") == group
            for sid in j.get("stageIds", [])
        }
    )
    out = []
    for sid in stage_ids:
        try:
            attempts = _rest(f"applications/{app_id}/stages/{sid}")
        except Exception:
            continue  # skipped stage (reused exchange) — no attempt data
        for st in attempts:
            if st.get("status") != "COMPLETE":
                continue
            # max task duration via the task summary endpoint
            try:
                summ = _rest(
                    f"applications/{app_id}/stages/{sid}/"
                    f"{st['attemptId']}/taskSummary?quantiles=0.5,1.0"
                )
                med_task_ms, max_task_ms = summ["executorRunTime"]
            except Exception:
                med_task_ms = max_task_ms = None
            out.append(
                {
                    "stage": sid,
                    "name": st.get("name", "")[:80],
                    "tasks": st.get("numCompleteTasks"),
                    "run_ms": st.get("executorRunTime"),
                    "input_mb": round((st.get("inputBytes") or 0) / 2**20, 1),
                    "shuffle_read_mb": round(
                        (st.get("shuffleReadBytes") or 0) / 2**20, 1
                    ),
                    "shuffle_write_mb": round(
                        (st.get("shuffleWriteBytes") or 0) / 2**20, 1
                    ),
                    "mem_spill_mb": round(
                        (st.get("memoryBytesSpilled") or 0) / 2**20, 1
                    ),
                    "disk_spill_mb": round(
                        (st.get("diskBytesSpilled") or 0) / 2**20, 1
                    ),
                    "med_task_ms": med_task_ms,
                    "max_task_ms": max_task_ms,
                }
            )
    return out


def main() -> int:
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        # Fail fast on typos BEFORE any Spark runs burn minutes — a bad
        # name would otherwise KeyError only when its loop iteration is
        # reached (ADVICE r10).
        unknown = sorted(only - set(QUERY_INDEX))
        if unknown:
            print(f"unknown --only queries (not in registry): {unknown}",
                  file=sys.stderr)
            return 2
        del args[i : i + 2]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    sf_dirs = SF_DIRS
    if "--sf-dirs" in args:  # e.g. --sf-dirs sf0.1=/root/testdata/sf0.1
        i = args.index("--sf-dirs")
        sf_dirs = {
            lbl: Path(p)
            for lbl, _, p in (
                part.partition("=") for part in args[i + 1].split(",")
            )
        }
        del args[i : i + 2]
    out_path = Path(args[0]) if args else REPO / "SCALING_r9_adjudication.json"

    spark = get_spark(
        app_name="adjudicate-sf10",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.appStatusStore.diskStoreDir": "",  # in-memory status store
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    global UI_BASE
    if spark.sparkContext.uiWebUrl:
        UI_BASE = spark.sparkContext.uiWebUrl

    results: dict = {
        "directive": "r8 verdict #2: per-query sf1->sf10 cause adjudication",
        "protocol": (
            f"warm pass + min-of-{passes} noop sink, caches released "
            "between passes; stage metrics from the LAST timed pass via "
            "the UI REST API, job-group-scoped"
        ),
        "conf": {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.shuffle.partitions",
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                "spark.sql.files.maxPartitionBytes",
                "spark.driver.memory",
            )
        },
        "queries": {},
    }

    # --only may name ANY registry query, not just the default set
    if only is None:
        names = list(QUERIES)
    else:
        names = [q for q in QUERIES if q in only] + sorted(only - set(QUERIES))
    for name in names:
        qdef = QUERY_INDEX[name]
        entry: dict = {}
        for sf_label, sf_dir in sf_dirs.items():
            if not sf_dir.exists():
                continue
            # warm (untimed, ungrouped)
            qdef.fn(spark, str(sf_dir)).write.format("noop").mode(
                "overwrite"
            ).save()
            release_caches(spark)
            secs = []
            group = None
            for p in range(passes):
                group = f"{name}:{sf_label}:p{p}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.time()
                qdef.fn(spark, str(sf_dir)).write.format("noop").mode(
                    "overwrite"
                ).save()
                secs.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobGroup("idle", "idle")
                release_caches(spark)
            entry[sf_label] = {
                "sec_min": min(secs),
                "sec_all": secs,
                "stages_last_pass": _stage_metrics(app_id, group),
            }
            print(f"{name} {sf_label}: min {min(secs)}s over {secs}", flush=True)
        if "sf1" in entry and "sf10" in entry:
            entry["growth_sf1_to_sf10"] = round(
                entry["sf10"]["sec_min"] / entry["sf1"]["sec_min"], 2
            )
        results["queries"][name] = entry

    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
