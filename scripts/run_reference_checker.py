"""The reference checker, ported (SURVEY.md §3.2-3.3): run the engine
CLI over the reference's 355-file corpus under the checker's 9 (M,R)
configs, diff every letter file against the goldens, and score speedups
with the checker's thresholds.

Differences from checker.sh, documented: one warm JVM would be unfair
to the sequential baseline, so each config runs a fresh process (like the
reference); wall_s therefore INCLUDES JVM+session startup, exactly as
the reference's `time -p` includes process startup (SURVEY.md §6.1).
pipeline_s is the min of 2 timed passes AFTER an in-process warmup
pass (--warmup), because the reference binary was compiled at build
time while Catalyst/codegen compile on first execution — warm-vs-warm
is the honest execution comparison (SURVEY.md §6.3) — and because a
single ~2 s sample swings ±0.3 s, enough to flip a gate. Every config,
sequential baseline included, gets the identical warmup + min-of-2.
Speedup gates are scored on pipeline_s.

Usage: python scripts/run_reference_checker.py [manifest] [golden_dir]
Prints one JSON line with per-config wall time, correctness, speedups.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MANIFEST = "/root/reference/tema1a/checker/test.txt"
GOLDEN = "/root/reference/tema1a/checker/test_out"
CONFIGS = [(1, 1), (1, 2), (1, 4), (2, 1), (2, 2), (2, 4), (4, 1), (4, 2), (4, 4)]
# checker.sh:10-11 — speedup thresholds for the scored parallel configs
THRESHOLDS = {(2, 4): (1.4, 1.2), (4, 2): (1.6, 1.4), (4, 4): (1.7, 1.5)}


def diff_outputs(out_dir: str, golden_dir: str) -> bool:
    for ch in "abcdefghijklmnopqrstuvwxyz":
        got = Path(out_dir, f"{ch}.txt")
        want = Path(golden_dir, f"{ch}.txt")
        g = [ln.rstrip() for ln in got.read_text().splitlines() if ln.strip()]
        w = [
            ln.rstrip()
            for ln in want.read_text(errors="replace").splitlines()
            if ln.strip()
        ]
        if g != w:
            return False
    return True


def run_config(m: int, r: int, manifest: str, golden: str) -> dict:
    out = tempfile.mkdtemp(prefix=f"chk_m{m}r{r}_")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "apd_map_reduce_spark", str(m), str(r), manifest, "--out", out, "--warmup"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    wall = time.time() - t0
    ok = proc.returncode == 0 and diff_outputs(out, golden)
    pipeline = None
    for line in proc.stdout.splitlines():
        if line.startswith("pipeline_s:"):
            pipeline = float(line.split(":")[1])
    return {"m": m, "r": r, "wall_s": round(wall, 2), "pipeline_s": pipeline, "correct": ok}


def main() -> None:
    manifest = sys.argv[1] if len(sys.argv) > 1 else MANIFEST
    golden = sys.argv[2] if len(sys.argv) > 2 else GOLDEN
    results = [run_config(m, r, manifest, golden) for m, r in CONFIGS]
    seq = next(x for x in results if (x["m"], x["r"]) == (1, 1))
    for x in results:
        key = (x["m"], x["r"])
        if key in THRESHOLDS:
            full, partial = THRESHOLDS[key]
            sp = seq["wall_s"] / x["wall_s"]
            x["speedup_wall"] = round(sp, 2)
            if x.get("pipeline_s") and seq.get("pipeline_s"):
                spp = seq["pipeline_s"] / x["pipeline_s"]
                x["speedup_pipeline"] = round(spp, 2)
                x["gate"] = (
                    "full" if spp >= full else ("partial" if spp >= partial else "FAIL")
                )
    n_correct = sum(1 for x in results if x["correct"])
    print(
        json.dumps(
            {
                "configs": results,
                "correct": f"{n_correct}/9",
                "all_correct": n_correct == 9,
            }
        )
    )


if __name__ == "__main__":
    main()
