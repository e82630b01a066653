"""Directive-#5 harness: adjudicate the r6 warm-bench regressions on
q3/q5/q10 (and controls) as box noise vs code change.

The "old vs new" half of the A/B is settled by git, not timing:
`git diff <r5-snapshot>..HEAD` over q3_top_orders / q5_supplier_volume
/ q10_returned_items is EMPTY (relational.py changed only in
q15_top_supplier and orders_open_backlog since round 5), so old and
new would execute byte-identical DataFrame constructions. What remains
measurable is the box: does today's quiet box reproduce r5-level mins,
or r6-level ones, for code that has not moved?

Protocol (mirrors bench.py: noop sink, warm pass, clearCache between
passes) with two upgrades for a regression question rather than a
headline number:
  * PASSES=9 per query (vs bench's 3) — the min of 9 bounds the
    intrinsic plan cost much tighter under one-sided load noise;
  * passes are interleaved ROUND-ROBIN across queries, so a load
    spike hits one pass of several queries instead of all passes of
    one query (temporal decorrelation — the r6 artifact's pattern of
    "every zero-code-change query +30-50%" is exactly what a
    suite-ordered sweep under a noisy neighbor produces).

Emits one JSON object (→ AB_WARM_r7.json) with per-query samples,
min, median, and the r5/r6 artifact values alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apd_map_reduce_spark.registry import QUERY_INDEX  # noqa: E402
from apd_map_reduce_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_supplier_volume",
    "q10_returned_items",
    "text_lang_id",
]
PASSES = 9
R5 = {  # BENCH_r05.json (min / median)
    "q1_pricing_summary": (1.273, 1.278),
    "q3_top_orders": (0.518, 0.61),
    "q5_supplier_volume": (0.563, 0.726),
    "q10_returned_items": (0.836, 0.933),
    "text_lang_id": (0.334, 0.347),
}
R6 = {  # BENCH_r06.json (min / median)
    "q1_pricing_summary": (1.439, 1.54),
    "q3_top_orders": (0.776, 0.823),
    "q5_supplier_volume": (0.849, 1.055),
    "q10_returned_items": (1.088, 1.109),
    "text_lang_id": (0.439, 0.481),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-warm-regression")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.time()
        QUERY_INDEX[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    for name in QUERIES:  # untimed warm pass
        run(name)

    samples: dict[str, list[float]] = {name: [] for name in QUERIES}
    for _ in range(PASSES):  # round-robin interleave
        for name in QUERIES:
            samples[name].append(round(run(name), 3))

    out: dict[str, object] = {
        "protocol": (
            f"noop sink, warm pass, clearCache between passes, {PASSES} "
            "passes round-robin interleaved across queries, sf_dir="
            + sf_dir
        ),
        "code_identity": (
            "git diff 23446ff..HEAD over q3/q5/q10 function bodies is "
            "empty (relational.py changed only q15_top_supplier and "
            "orders_open_backlog since round 5)"
        ),
        "queries": {},
    }
    for name in QUERIES:
        s = sorted(samples[name])
        out["queries"][name] = {
            "samples": samples[name],
            "min": s[0],
            "median": s[len(s) // 2],
            "max": s[-1],
            "r5_min_median": R5[name],
            "r6_min_median": R6[name],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
