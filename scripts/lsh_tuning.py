"""r10 verdict directive #5: LSH operating-point study, IVF-tuning
style (the IVF_TUNING_r9.json harness generalized to the MinHash-LSH
banding grid).

`dedup_minhash_lsh` is the single biggest perf lever left (~4.7 s of
the 19.5 s sf0.1 headline and 93% of the corpus_clean_snapshot wall),
and its (bands, rows) point — b=24, r=3, k=72 minhashes — was sized
analytically (S-curve recall ≥0.96 at the 0.5 near-dup threshold)
but never swept empirically. This script produces the recall-vs-cost
curve so the default is either changed with measurements or pinned as
optimal with measurements.

Per grid point (bands b, rows r; signature width k = b*r):
  analytic_p05  — 1-(1-0.5^r)^b, the S-curve recall contract at the
                  near-dup threshold (the ≥0.9 sizing bar).
  recall6 / n_true_pairs / n_candidates / n_verified
                — empirical, from `lsh_recall_audit(docs, bands=b,
                  rows=r)` at each SF dir: exact guarded near-dup
                  truth vs the banded screen. n_candidates is the
                  100 TB cost proxy — every candidate is a pair the
                  exact-Jaccard verifier must intersect, so candidate
                  EXCESS (candidates >> verified) is wasted verify
                  work that grows with corpus size even when sf0.1
                  wall time hides it.
  wall_min      — min over --passes warm timed runs of the FULL
                  registered `minhash_lsh_pairs` plan (noop sink,
                  caches released between passes) at the primary SF.

Protocol notes: one Spark session for everything (JVM floor excluded
from every number identically); timing passes run AFTER the recall
sweep so the audit's cached relations never pollute a timed run;
box-noise rules apply (min scoring, one-sided noise — see
box-noise-protocol memory): any default change must additionally be
settled with scripts/ab_interleave.py before it ships.

Usage: python scripts/lsh_tuning.py [out_json]
           [--sf-dir /root/testdata/sf0.1] [--recall-sf-dirs d1,d2]
           [--passes 3]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from apd_map_reduce_spark.operators.dedup import (  # noqa: E402
    LSH_BANDS,
    LSH_ROWS,
    lsh_collision_probability,
    lsh_recall_audit,
    minhash_lsh_pairs,
)
from apd_map_reduce_spark.session import get_spark, release_caches  # noqa: E402

# The grid: the current default, cheaper-signature points (smaller k)
# at both r=2 (wide-S, more low-sim candidates) and r=3 (the current
# precision), costlier points (k=96) to bound the other direction, and
# the legacy k=16 demo point as the floor. r=4 raises the S-curve
# midpoint (0.5^4 = 1/16 per band) so recall at 0.5 needs b >= 35 —
# (16,4) documents how far below the bar k=64/r=4 sits.
GRID: list[tuple[int, int]] = [
    (4, 4),    # k=16 legacy demo (P(0.5) ~ 0.23)
    (8, 2),    # k=16
    (12, 2),   # k=24
    (16, 2),   # k=32
    (8, 3),    # k=24
    (12, 3),   # k=36
    (16, 3),   # k=48
    (24, 3),   # k=72 CURRENT DEFAULT
    (32, 3),   # k=96
    (16, 4),   # k=64
    (24, 4),   # k=96
]


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    recall_dirs = [sf_dir]
    if "--recall-sf-dirs" in args:
        i = args.index("--recall-sf-dirs")
        recall_dirs = args[i + 1].split(",")
        del args[i : i + 2]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    out_path = Path(args[0]) if args else REPO / "LSH_TUNING_r11.json"

    spark = get_spark(app_name="lsh-tuning")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {
        "directive": "r10 verdict #5: LSH (bands, rows) recall-vs-cost sweep",
        "protocol": (
            "recall: lsh_recall_audit (exact guarded truth vs banded "
            "screen) per SF dir; cost: min of "
            f"{passes} warm noop-sink runs of minhash_lsh_pairs at "
            f"{sf_dir}; one session, recall sweep before timing"
        ),
        "default": {"bands": LSH_BANDS, "rows": LSH_ROWS},
        "grid": {},
    }

    docs_by_dir = {
        d: spark.read.parquet(f"{d}/documents.parquet") for d in recall_dirs
    }
    for b, r in GRID:
        key = f"b{b}r{r}"
        entry: dict = {
            "bands": b,
            "rows": r,
            "k": b * r,
            "analytic_p05": round(lsh_collision_probability(0.5, b, r), 4),
            "recall": {},
        }
        for d, docs in docs_by_dir.items():
            row = lsh_recall_audit(docs, bands=b, rows=r).collect()[0]
            entry["recall"][d] = {
                "n_true_pairs": row.n_true_pairs,
                "n_candidates": row.n_candidates,
                "n_verified": row.n_verified,
                "recall6": row.recall6,
            }
            release_caches(spark)
        results["grid"][key] = entry
        print(f"{key}: k={b*r} p05={entry['analytic_p05']} "
              f"recall={entry['recall']}", flush=True)

    docs = docs_by_dir.get(sf_dir) or spark.read.parquet(
        f"{sf_dir}/documents.parquet"
    )
    for b, r in GRID:
        key = f"b{b}r{r}"
        minhash_lsh_pairs(docs, bands=b, rows=r).write.format("noop").mode(
            "overwrite"
        ).save()  # warm (untimed)
        release_caches(spark)
        secs = []
        for _ in range(passes):
            t0 = time.monotonic()
            minhash_lsh_pairs(docs, bands=b, rows=r).write.format(
                "noop"
            ).mode("overwrite").save()
            secs.append(round(time.monotonic() - t0, 3))
            release_caches(spark)
        results["grid"][key]["wall_all"] = secs
        results["grid"][key]["wall_min"] = min(secs)
        print(f"{key}: wall min {min(secs)}s over {secs}", flush=True)

    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
