"""Skew-mitigation evidence at scale (SKEW_r{N}.json).

The salted aggregate/join (operators/skew.py) are result-transparent —
the registry proves THAT against plain-SQL oracles — but
result-transparency says nothing about whether the salt WINS on a
skewed key. This harness plants the motivating scenario (BASELINE.md
§6.3's letter-skew note, scaled up): a fact table where ONE key holds
half of all rows, joined against a dim too big to broadcast (broadcast
disabled, the salted_join contract), and measures wall time for

  join_plain_aqe_off   — sort-merge join, no mitigation: the hot key's
                         rows all sort through ONE reducer task
  join_plain_aqe_skew  — Spark's runtime answer: AQE skew-join split
                         (aqe_skew_split_confs, thresholds sized to the
                         fixture so the split engages like the 256 MB
                         default would at cluster scale)
  join_salted          — the manual answer: deterministic salt on the
                         fact side, dim replicated n_salts ways

plus the aggregation twin (agg_plain vs agg_salted on the same skewed
key). Expectation recorded honestly: for count/sum/min/max the plain
groupBy does NOT suffer hot-key skew, because hash-aggregate partials
collapse the hot key map-side (each map task emits one row per key);
salted_agg exists for aggregation paths where partials are
ineffective. The join rows are where the salt must win.

Fixture: FACT_ROWS rows (event-shaped: event_id, user_id, value), hot
key user_id=0 on HOT_FRAC of rows, remainder uniform over N_USERS
keys; dim = (c_custkey, c_mktsegment) covering every key. Two scales a
decade apart (20x / 200x the sf0.1 events table) so the straggler
effect is measurable on local[32]. Deterministic (hash-derived values,
no RNG), written under <repo>/.scale/skew (gitignored; /root/testdata
is read-only).

Protocol: per scale and variant, one untimed warm pass then min-of-3
timed noop-sink runs (bench.py's protocol of record).

Usage: python scripts/skew_artifact.py [out_json] [--small-only]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from apd_map_reduce_spark.operators.skew import (  # noqa: E402
    aqe_skew_split_confs,
    salted_agg,
    salted_join,
)
from apd_map_reduce_spark.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
FIXTURE_DIR = REPO / ".scale" / "skew"
N_USERS = 15_000
HOT_FRAC = 0.5
SCALES = {"fact_2e6": 2_000_000, "fact_2e7": 20_000_000}
PASSES = 3
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def gen_fixture(spark, name: str, n_rows: int) -> tuple[str, str]:
    out = FIXTURE_DIR / name
    fact_path, dim_path = str(out / "fact.parquet"), str(out / "dim.parquet")
    if (out / "fact.parquet").exists() and (out / "dim.parquet").exists():
        return fact_path, dim_path
    # hot key 0 on every even row; the rest hash-uniform over N_USERS
    fact = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_USERS)) + 1)
        .alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10_000)) / 100.0).alias("value"),
    )
    fact.write.mode("overwrite").parquet(fact_path)
    dim = spark.range(N_USERS + 1).select(
        F.col("id").alias("c_custkey"),
        F.element_at(
            F.array(*[F.lit(s) for s in SEGMENTS]),
            (F.pmod(F.xxhash64("id"), F.lit(len(SEGMENTS))) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    dim.write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def timed(build, passes: int = PASSES) -> dict:
    build().write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(passes):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    samples.sort()
    return {
        "min_s": round(samples[0], 3),
        "median_s": round(samples[len(samples) // 2], 3),
    }


def no_broadcast(spark):
    """The salted_join scenario is 'dim too big to broadcast'; at
    fixture scale the dim WOULD broadcast and make skew moot."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    small_only = "--small-only" in args
    args = [a for a in args if not a.startswith("--")]
    out_path = args[0] if args else str(REPO / "SKEW_r6.json")

    spark = get_spark(app_name="skew-artifact")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {
        "fixture": {
            "n_users": N_USERS,
            "hot_frac": HOT_FRAC,
            "hot_key": 0,
            "note": (
                "planted hot key: user_id=0 on half of all fact rows; "
                "broadcast disabled for the join variants (the "
                "salted_join contract is a dim too big to broadcast)"
            ),
        },
        "protocol": "warm pass + min-of-3 noop-sink runs per variant",
        "scales": {},
    }

    for name, n_rows in SCALES.items():
        if small_only and name != "fact_2e6":
            continue
        fact_path, dim_path = gen_fixture(spark, name, n_rows)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        rows: dict = {"fact_rows": n_rows}

        aqe_saved = spark.conf.get("spark.sql.adaptive.enabled")
        no_broadcast(spark)

        def plain_join():
            return fact.join(dim, fact.user_id == dim.c_custkey).select(
                "event_id", "user_id", "c_mktsegment", "value"
            )

        def salted():
            return salted_join(
                fact, dim, fact_key="user_id", dim_key="c_custkey",
                salt_source="event_id", n_salts=16,
            ).select("event_id", "user_id", "c_mktsegment", "value")

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        rows["join_plain_aqe_off"] = timed(plain_join)
        rows["join_salted_aqe_off"] = timed(salted)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        with aqe_skew_split_confs(spark, threshold="64MB", advisory="32MB"):
            rows["join_plain_aqe_skew_split"] = timed(plain_join)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_saved)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

        def plain_agg():
            return fact.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
            )

        def salted_agg_build():
            return salted_agg(
                fact.withColumn("v_dec", F.col("value").cast("decimal(18,2)")),
                key="user_id",
                aggs={"n": ("", "count"), "total": ("v_dec", "sum")},
            )

        rows["agg_plain"] = timed(plain_agg)
        rows["agg_salted"] = timed(salted_agg_build)
        result["scales"][name] = rows
        print(f"{name}: {json.dumps(rows)}", flush=True)

    sp = result["scales"]
    biggest = sp.get("fact_2e7") or sp.get("fact_2e6")
    result["adjudication"] = {
        "join_salt_speedup_vs_plain": round(
            biggest["join_plain_aqe_off"]["min_s"]
            / biggest["join_salted_aqe_off"]["min_s"],
            2,
        ),
        "join_aqe_speedup_vs_plain": round(
            biggest["join_plain_aqe_off"]["min_s"]
            / biggest["join_plain_aqe_skew_split"]["min_s"],
            2,
        ),
        "agg_note": (
            "plain hash aggregation collapses the hot key MAP-SIDE "
            "(partial agg emits one row per key per task), so "
            "count/sum aggregation shows no hot-key straggler to "
            "begin with — salting is for joins and for aggregates "
            "without effective partials"
        ),
    }
    Path(out_path).write_text(json.dumps(result, indent=2) + "\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
