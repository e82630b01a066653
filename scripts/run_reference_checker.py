"""The reference checker, ported (SURVEY.md §3.2-3.3): run the engine
CLI over the reference's 355-file corpus under the checker's 9 (M,R)
configs, diff every letter file against the goldens, and score speedups
with the checker's thresholds.

Differences from checker.sh, documented: one warm JVM would be unfair
to the sequential baseline, so each config runs a fresh process (like the
reference); wall_s INCLUDES JVM+session startup AND, since round 4,
three pipeline executions (the --warmup pass + 2 timed passes), so it
is NOT comparable to r1-r3 wall_s or to the reference's single-run
`time -p` — it exists only as a same-artifact sanity bound.
pipeline_s is the min of 2 timed passes AFTER an in-process warmup
pass (--warmup), because the reference binary was compiled at build
time while Catalyst/codegen compile on first execution — warm-vs-warm
is the honest execution comparison (SURVEY.md §6.3) — and because a
single ~2 s sample swings ±0.3 s, enough to flip a gate. Every config,
sequential baseline included, gets the identical warmup + min-of-2.
Speedup gates are scored on pipeline_s.

Usage: python scripts/run_reference_checker.py [manifest] [golden_dir]
       [--repeat N] [--block B]
Prints one JSON line with per-config wall time, correctness, speedups.

Noise protocol (r7): gate rates from SINGLE sweeps measure the box's
neighbors as much as the code — r6's medians ran ~20% above r5's for
byte-identical configs. With --repeat N --block B the harness ALSO
scores gates on per-block minima: sweeps are grouped into N/B blocks,
each config's pipeline_s is min-of-B within a block, and the speedup
gate is evaluated block-min vs sequential block-min. A block minimum
is the closest observable to the plan's intrinsic cost (SURVEY §6.3:
timer swing is one-sided — load only ever ADDS time), so the per-block
gate rate measures code, not neighbors, while still reporting N
independent verdicts' spread.
"""

from __future__ import annotations

import json
import shutil
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
    shutil.rmtree(out, ignore_errors=True)
    pipeline = None
    for line in proc.stdout.splitlines():
        if line.startswith("pipeline_s:"):
            pipeline = float(line.split(":")[1])
    return {"m": m, "r": r, "wall_s": round(wall, 2), "pipeline_s": pipeline, "correct": ok}


def score(results: list[dict]) -> dict:
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
    return {
        "configs": results,
        "correct": f"{n_correct}/9",
        "all_correct": n_correct == 9,
    }


def main() -> None:
    args = list(sys.argv[1:])
    repeat = 1
    block = 4
    if "--block" in args:
        i = args.index("--block")
        block = max(int(args[i + 1]), 1)
        del args[i : i + 2]
    if "--repeat" in args:
        # Variance-harness mode (analogue of the reference's
        # check_the_checker.sh, which re-runs its checker 100x to bound
        # measurement noise): run the full 9-config sweep N times and
        # report per-run gates plus per-config pipeline_s min/median,
        # so a gate verdict can be read against the spread instead of
        # trusted from one sample.
        i = args.index("--repeat")
        repeat = max(int(args[i + 1]), 1)
        del args[i : i + 2]
    manifest = args[0] if args else MANIFEST
    golden = args[1] if len(args) > 1 else GOLDEN

    runs = []
    for _ in range(repeat):
        runs.append(score([run_config(m, r, manifest, golden) for m, r in CONFIGS]))
    out = runs[0]
    if repeat > 1:
        spread: dict[str, dict] = {}
        for m, r in CONFIGS:
            vals = sorted(
                x["pipeline_s"]
                for run in runs
                for x in run["configs"]
                if (x["m"], x["r"]) == (m, r) and x["pipeline_s"] is not None
            )
            gates = [
                x.get("gate")
                for run in runs
                for x in run["configs"]
                if (x["m"], x["r"]) == (m, r) and "gate" in x
            ]
            spread[f"m{m}r{r}"] = {
                "pipeline_min": vals[0] if vals else None,
                "pipeline_median": vals[len(vals) // 2] if vals else None,
                "gates": gates or None,
            }
        def cfg_pipeline(run: dict, m: int, r: int) -> float | None:
            for x in run["configs"]:
                if (x["m"], x["r"]) == (m, r):
                    return x["pipeline_s"]
            return None

        block_gates: dict[str, list[str]] = {}
        # Every sweep counts: a trailing partial block (repeat % block)
        # scores as a short block rather than being silently dropped,
        # and repeat < block degrades to one block, not zero.
        n_blocks = (repeat + block - 1) // block
        for m, r in THRESHOLDS:
            gates = []
            for bi in range(n_blocks):
                chunk = runs[bi * block : (bi + 1) * block]
                seq_vals = [
                    v for run in chunk if (v := cfg_pipeline(run, 1, 1)) is not None
                ]
                cfg_vals = [
                    v for run in chunk if (v := cfg_pipeline(run, m, r)) is not None
                ]
                if not seq_vals or not cfg_vals:
                    gates.append("ABSENT")
                    continue
                spp = min(seq_vals) / min(cfg_vals)
                full, partial = THRESHOLDS[(m, r)]
                gates.append(
                    "full" if spp >= full else ("partial" if spp >= partial else "FAIL")
                )
            block_gates[f"m{m}r{r}"] = gates
        out = {
            "repeat": repeat,
            "all_correct_every_run": all(r["all_correct"] for r in runs),
            "spread": spread,
            "block_min": {
                "block_size": block,
                "n_blocks": n_blocks,
                "gates": block_gates,
                "full_rate": {
                    k: round(sum(g == "full" for g in v) / len(v), 2) if v else None
                    for k, v in block_gates.items()
                },
            },
            "runs": runs,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
