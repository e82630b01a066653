"""Physical-layout helpers.

`spread` fixes the small-file serialization trap: a CPU-heavy per-row
stage (tokenize/shingle/hash) downstream of a tiny scan inherits the
scan's partition count — a 2 MB single parquet file means ONE task and
a 30x slowdown on a 32-core box (measured: 30.6s → 2.4s on the sf0.1
shingle stage). At 100 TB the scan already yields thousands of splits
(`spark.sql.files.maxPartitionBytes`), so the repartition is skipped —
the guard makes this safe to leave in production plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_nonnull(
    df: DataFrame, keep: list, expr: Column | str, alias: str
) -> DataFrame:
    """`select(*keep, explode(expr))` WITHOUT the
    InferFiltersFromGenerate trap.

    A plain `explode` makes the optimizer infer `size(expr) > 0` and
    predicate pushdown then drags that filter — with the generator's
    ENTIRE input expression substituted in — below the repartition
    exchange into the scan stage. For the CPU-bound text expressions
    (tokenize/shingle chains) that (a) re-evaluates the expensive
    expression twice per row and (b) on a small-file scan runs one
    copy in a SINGLE task, silently defeating `spread` (measured on
    text_boilerplate_spans at sf1: the "26 s" query is ~3 s of
    parallel work plus ~20+ s of this serialized filter).

    `explode_outer` is exempt from the inference (an outer generate
    filters nothing); the cheap `IS NOT NULL` filter above the
    generate then drops exactly the rows the inner explode would never
    have emitted (empty/NULL input arrays). Result-identical PROVIDED
    the array's elements are non-null by construction — true for every
    tokenizer/shingle/hash producer here; do not use it over arrays
    that legitimately contain NULL elements."""
    out = df.select(*keep, F.explode_outer(expr).alias(alias))
    return out.filter(F.col(alias).isNotNull())


def posexplode_nonnull(
    df: DataFrame, keep: list, expr: Column | str, pos_alias: str, alias: str
) -> DataFrame:
    """posexplode twin of `explode_nonnull` (same trap, same contract)."""
    out = df.select(
        *keep, F.posexplode_outer(expr).alias(pos_alias, alias)
    )
    return out.filter(F.col(alias).isNotNull())


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the plan currently has fewer
    partitions than the cluster's default parallelism."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
