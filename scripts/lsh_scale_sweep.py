"""r11 verdict directive #1: the LSH operating point, swept where the
N² background-collision tail actually binds (sf1/sf10/sf100), not at
sf0.1 where LSH_TUNING_r11.json showed it is invisible.

Context of record: at sf100 (5M docs) the b=24,r=3 band self-join
emits 986M rows → 92.4M distinct candidates against ~O(10^5) true
near-dup pairs (LSH_SF100_PLAN_r11.json) — banded LSH's
~N²·P(s_bg)-per-band background tail, with per-band collision
probability s_bg^r. Raising r from 3 to 4 multiplies the background
rate by s_bg (≈50× reduction at s_bg≈0.02) per band while b must grow
to keep the S-curve recall contract at the near-dup threshold:
P(0.5) = 1-(1-0.5^r)^b ≥ 0.9 needs b ≥ 36 at r=4 (b36r4 = 0.902,
b48r4 = 0.955, b54r4 = 0.969 vs the default b24r3 = 0.959). The cost
of r=4 is signature width k=b·r (144–216 vs 72): at small SF the
k·|shingles| min-aggregation dominates wall (LSH_TUNING_r11: k=96 was
+36% over k=72 at sf0.1), so small-SF and large-SF optima are
EXPECTED to diverge — this sweep measures both sides so the decision
is size-conditional on numbers, not analytics.

Per (SF, grid point) this records the three columns the directive
names:
  candidate volume — band_pair_rows (band-join output rows before
      dedup: sum over pairs of their collision multiplicity — the
      shuffle/spill driver) and n_candidates (distinct pairs — the
      exact-verify driver). Both from ONE pass over the banded join
      (groupBy pair → count → one-row agg).
  recall — n_hits / n_true vs the exact guarded near-dup truth
      (ngram_jaccard_pairs), computed ONCE per SF and parquet-pinned:
      truth does not depend on (b, r), so a 4-point grid pays the
      sharing-pair enumeration once, not 4×.
  wall — min over --passes warm noop-sink runs of the FULL
      `minhash_lsh_pairs` at (b, r). min scoring per the box-noise
      protocol (one-sided noise); timing runs are serialized after
      all volume/recall passes at that SF so cached relations never
      pollute a timed pass.

Usage: python scripts/lsh_scale_sweep.py [out_json]
           [--sf-dirs .scale/sf1,.scale/sf10,.scale/sf100]
           [--grid 24x3,36x4,48x4,54x4] [--passes 2]
           [--recall sf1=full,sf10=8,sf100=32]
           (full = pinned exact truth; integer m = 1/m hash-slice
            sampled audit — mandatory above sf1)

Driver memory: export SPARK_GRAFT_DRIVER_MEM=64g for sf100 (the r11
scale protocol, SCALING_r11.json conf).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from apd_map_reduce_spark.operators.dedup import (  # noqa: E402
    LSH_BANDS,
    LSH_ROWS,
    NEARDUP_THRESHOLD,
    doc_shingle_hashes,
    lsh_collision_multiplicity,
    lsh_collision_probability,
    lsh_recall_audit_sampled,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    stop_shingle_filter,
)
from apd_map_reduce_spark.session import get_spark, release_caches  # noqa: E402

DEFAULT_GRID = "24x3,36x4,48x4,54x4"
DEFAULT_DIRS = ",".join(
    str(REPO / ".scale" / d) for d in ("sf1", "sf10", "sf100")
)


def main() -> int:
    args = list(sys.argv[1:])

    def opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dirs = opt("--sf-dirs", DEFAULT_DIRS).split(",")
    grid = [
        (int(p.split("x")[0]), int(p.split("x")[1]))
        for p in opt("--grid", DEFAULT_GRID).split(",")
    ]
    passes = int(opt("--passes", "2"))
    # recall mode per SF: "full" pins the exact truth set once and
    # joins per point; an integer m uses lsh_recall_audit_sampled on a
    # deterministic 1/m hash-slice — MANDATORY above sf1, where the
    # full sharing-pair enumeration is the thing the scale path exists
    # to avoid (unbiased: per-pair collision probability is
    # independent of surrounding docs).
    recall_modes = dict(
        kv.split("=", 1)
        for kv in opt("--recall", "sf1=full,sf10=8,sf100=32").split(",")
    )
    out_path = Path(args[0]) if args else REPO / "LSH_SCALE_SWEEP_r12.json"

    spark = get_spark(app_name="lsh-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {
        "directive": "r11 verdict #1: LSH operating point at the decades where the N^2 tail binds",
        "protocol": (
            "per SF: recall either vs the parquet-pinned full exact truth set "
            "(computed once; mode=full) or via lsh_recall_audit_sampled on a "
            "deterministic 1/m hash-slice (mode=m; unbiased, slice universe "
            "~1/m^2); per (b,r): band_pair_rows + n_candidates FULL-corpus from "
            f"one grouped pass, then wall = min of {passes} warm noop-sink runs "
            "of the full minhash_lsh_pairs — timing strictly after all "
            "volume/recall passes at that SF, caches released between passes, "
            "time.monotonic"
        ),
        "default": {"bands": LSH_BANDS, "rows": LSH_ROWS},
        "grid": [
            {
                "bands": b,
                "rows": r,
                "k": b * r,
                "analytic_p05": round(lsh_collision_probability(0.5, b, r), 4),
            }
            for b, r in grid
        ],
        "sf": {},
    }

    tmp = REPO / ".scale" / "tmp_lsh_sweep"
    tmp.mkdir(parents=True, exist_ok=True)

    for d in sf_dirs:
        sf_name = Path(d).name
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n_docs = docs.count()
        entry: dict = {"n_docs": n_docs, "points": {}}
        results["sf"][sf_name] = entry

        sh = doc_shingle_hashes(docs).cache()
        shf = stop_shingle_filter(sh).cache()

        mode = recall_modes.get(sf_name, "full")
        entry["recall_mode"] = mode
        truth_path = None
        n_true = None
        if mode == "full":
            truth_path = str(tmp / f"truth_{sf_name}.parquet")
            t0 = time.monotonic()
            # threshold EXPLICIT: ngram_jaccard_pairs defaults to the
            # reporting threshold 0.2, not the near-dup 0.5 the LSH
            # S-curve is sized for — the audit's truth is the 0.5 set.
            ngram_jaccard_pairs(docs, threshold=NEARDUP_THRESHOLD, sh=sh).select(
                "doc_a", "doc_b"
            ).write.mode("overwrite").parquet(truth_path)
            truth = spark.read.parquet(truth_path)
            n_true = truth.count()
            entry["n_true_pairs"] = n_true
            entry["truth_sec"] = round(time.monotonic() - t0, 3)
            print(f"[{sf_name}] truth: {n_true} pairs "
                  f"({entry['truth_sec']}s)", flush=True)

        # volume + recall passes (cached shingles shared across points)
        for b, r in grid:
            key = f"b{b}r{r}"
            t0 = time.monotonic()
            pairs = lsh_collision_multiplicity(docs, bands=b, rows=r, shf=shf)
            pairs.write.mode("overwrite").parquet(str(tmp / f"cand_{sf_name}.parquet"))
            cand = spark.read.parquet(str(tmp / f"cand_{sf_name}.parquet"))
            stats = cand.agg(
                F.sum("n_bands").alias("band_pair_rows"),
                F.count(F.lit(1)).alias("n_candidates"),
            ).collect()[0]
            point = {
                "band_pair_rows": int(stats.band_pair_rows or 0),
                "n_candidates": int(stats.n_candidates),
                "volume_sec": round(time.monotonic() - t0, 3),
            }
            if truth_path is not None:
                truth = spark.read.parquet(truth_path)
                n_hits = truth.join(cand, ["doc_a", "doc_b"]).count()
                point["n_hits"] = n_hits
                point["recall6"] = (
                    round(n_hits / n_true, 6) if n_true else None
                )
            else:
                t0 = time.monotonic()
                row = lsh_recall_audit_sampled(
                    docs, sample_mod=int(mode), bands=b, rows=r
                ).collect()[0]
                point["slice_sample_mod"] = int(mode)
                point["slice_n_true_pairs"] = row.n_true_pairs
                point["slice_n_candidates"] = row.n_candidates
                point["slice_n_verified"] = row.n_verified
                point["recall6"] = row.recall6
                point["recall_sec"] = round(time.monotonic() - t0, 3)
                release_caches(spark)
                # the slice audit dropped the shared caches; re-pin for
                # the next grid point's volume pass
                sh = doc_shingle_hashes(docs).cache()
                shf = stop_shingle_filter(sh).cache()
            entry["points"][key] = point
            print(f"[{sf_name}] {key}: {point}", flush=True)

        release_caches(spark)

        # timing passes — AFTER all volume work at this SF
        for b, r in grid:
            key = f"b{b}r{r}"
            minhash_lsh_pairs(docs, bands=b, rows=r).write.format("noop").mode(
                "overwrite"
            ).save()  # warm (untimed)
            release_caches(spark)
            secs = []
            for _ in range(passes):
                t0 = time.monotonic()
                minhash_lsh_pairs(docs, bands=b, rows=r).write.format("noop").mode(
                    "overwrite"
                ).save()
                secs.append(round(time.monotonic() - t0, 3))
                release_caches(spark)
            entry["points"][key]["wall_all"] = secs
            entry["points"][key]["wall_min"] = min(secs)
            print(f"[{sf_name}] {key}: wall min {min(secs)}s over {secs}",
                  flush=True)

        with open(out_path, "w", encoding="utf-8") as fh:
            json.dump(results, fh, indent=1)  # checkpoint per SF

    shutil.rmtree(tmp, ignore_errors=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
