"""r7 verdict directive #4: adjudicate the driver-bench regressions on
dedup_ngram_jaccard (+29%) and dedup_minhash_lsh (+19%) with the
stop-shingle GUARD CODE as the variable, not just the box.

Unlike the r6 relational "regressions" (byte-identical code, settled as
box noise by AB_WARM_r7), the dedup code DID change between the r6 and
r7 benches: signatures moved onto the guarded relation (b697779) and
the jaccard path gained explicit cache points + candidate scoping. So
the old-vs-new half cannot be settled by `git diff` — it has to be
TIMED. This script loads the dedup module exactly as the r6 bench ran
it (git snapshot 23446ff, imported under a shadow name so both
generations coexist in one JVM/session) and interleaves old/new passes
round-robin (PASSES per variant, min-of-N under one-sided load noise —
the AB_WARM protocol).

Emits one JSON object (→ AB_GUARD_r8.json) with per-variant samples,
min, median, and the r6/r7 driver-bench values alongside.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from apd_map_reduce_spark.registry import QUERY_INDEX  # noqa: E402
from apd_map_reduce_spark.session import get_spark  # noqa: E402
from apd_map_reduce_spark.sources.tables import load_table  # noqa: E402

R6_SNAPSHOT = "23446ff"  # the tree the r6 bench measured
PASSES = 9
DRIVER_BENCH = {  # BENCH_r06 / BENCH_r07 warm seconds
    "dedup_ngram_jaccard": {"r6": 1.91, "r7": 2.47},
    "dedup_minhash_lsh": {"r6": 3.88, "r7": 4.61},
}


# Timed-path symbols the shadow dedup.py resolves against the CURRENT
# package. The A/B is only old-vs-new dedup code if these are
# source-identical between the snapshot and HEAD — asserted below at
# SYMBOL granularity (whole-file blob equality is too strict: base.py
# legitimately gained the unrelated QueryDef.bounds field after r8, and
# layout.py gained new helpers the snapshot never calls).
_SHARED_TIMED_SYMBOLS = (
    ("apd_map_reduce_spark/functions/text.py", "null_safe_size"),
    ("apd_map_reduce_spark/plans/layout.py", "spread"),
    ("apd_map_reduce_spark/sources/tables.py", "load_table"),
)


def _symbol_source(rev: str, path: str, name: str) -> str:
    import ast

    src = subprocess.run(
        ["git", "-C", str(REPO), "show", f"{rev}:{path}"],
        capture_output=True, text=True, check=True,
    ).stdout
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name == name:
            return ast.get_source_segment(src, node)
    raise RuntimeError(f"{name} not found in {rev}:{path}")


def load_old_dedup():
    """Import the r6-snapshot dedup.py under a shadow module name.
    Its intra-package imports (functions.text, plans.layout, …)
    resolve against the CURRENT package — first ASSERT the timed-path
    symbols' sources are unchanged snapshot→HEAD, so the timing is
    genuinely old-dedup-vs-new-dedup and not a chimera of drifted
    helpers. The shadow source goes to a NamedTemporaryFile (unique
    per run; concurrent invocations don't collide on a fixed /tmp
    path)."""
    for path, name in _SHARED_TIMED_SYMBOLS:
        old_src = _symbol_source(R6_SNAPSHOT, path, name)
        head_src = _symbol_source("HEAD", path, name)
        if old_src != head_src:
            raise RuntimeError(
                f"timed-path symbol {name} in {path} drifted between "
                f"{R6_SNAPSHOT} and HEAD; the shadow-import A/B would "
                "time a chimera — re-pin the snapshot or vendor the old "
                "helper too"
            )
    src = subprocess.run(
        ["git", "-C", str(REPO), "show",
         f"{R6_SNAPSHOT}:apd_map_reduce_spark/operators/dedup.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    import tempfile

    tmp = tempfile.NamedTemporaryFile(
        mode="w", suffix="_ab_guard_old_dedup.py", delete=False
    )
    with tmp:
        tmp.write(src)
    spec = importlib.util.spec_from_file_location("old_dedup_r6", tmp.name)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["old_dedup_r6"] = mod
    spec.loader.exec_module(mod)
    os.unlink(tmp.name)  # source already loaded; don't leak one file per run
    return mod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-guard-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    old = load_old_dedup()

    def docs():
        return load_table(spark, sf_dir, "documents")

    variants = {
        "jaccard_old_r6": lambda: old.ngram_jaccard_pairs(docs()),
        "jaccard_new": lambda: QUERY_INDEX["dedup_ngram_jaccard"].fn(spark, sf_dir),
        "lsh_old_r6": lambda: old.minhash_lsh_pairs(docs()),
        "lsh_new": lambda: QUERY_INDEX["dedup_minhash_lsh"].fn(spark, sf_dir),
    }

    def run(name: str) -> float:
        t0 = time.time()
        variants[name]().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    for name in variants:  # untimed warm pass
        run(name)

    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(PASSES):  # round-robin interleave
        for name in variants:
            samples[name].append(round(run(name), 3))

    out = {
        "protocol": {
            "passes": PASSES,
            "interleaved": "round-robin",
            "sf_dir": sf_dir,
            "old_snapshot": R6_SNAPSHOT,
        },
        "driver_bench": DRIVER_BENCH,
        "variants": {
            n: {
                "samples": v,
                "min": min(v),
                "median": sorted(v)[len(v) // 2],
            }
            for n, v in samples.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
