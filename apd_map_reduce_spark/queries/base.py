"""Query registry plumbing + cross-engine determinism helpers.

Every query is a ``QueryDef``: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (when ANSI-expressible) a DuckDB oracle SQL string the
driver runs side-by-side. The driver's compare is row-count + schema +
order-insensitive value-hash, so the ONE hard requirement is that both
engines produce bitwise-identical values under identical column names.

Determinism rules used throughout (see SURVEY.md §7.4 "oracle parity"):
  * Sums over doubles are ORDER-DEPENDENT in the last ulp → aggregate
    decimals instead. ``dec2/dec6`` cast inputs to exact decimal before
    SUM; the result is exact, order-free, engine-free; cast back to
    double at the end (deterministic conversion).
  * Scalar double arithmetic (same operands, same ops) IS deterministic
    across engines — fine outside aggregation.
  * Timestamps are rendered to strings explicitly (date_format /
    strftime) — never emitted raw.
  * Every ORDER BY + LIMIT carries a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # include in bench.py
    # Bounded-error oracle for sketch queries (r8 verdict #5): exact
    # DuckDB SQL yielding, per key, `lo_<col>` / `hi_<col>` columns for
    # every approximate output column `<col>` (key columns = the rest,
    # matched by name). The selfcheck joins on the keys and asserts
    # lo <= value <= hi — the published error bound of the sketch, so
    # "rows-only" upgrades to "bounded-error-checked" even though no
    # exact value hash exists. Ignored when `oracle` is set.
    bounds: str | None = None


def dec2(col: Column | str) -> Column:
    """Exact money/qty: cast to DECIMAL(18,2) before aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dec6(col: Column | str) -> Column:
    """Exact small factor (rates, 1-discount): DECIMAL(9,6)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(9,6)")


def as_double(col: Column) -> Column:
    return col.cast("double")


def bounded_const_key(col: Column | str) -> Column:
    """A provably-constant, NON-FOLDABLE window partition key.

    ``pmod(xxhash64(col), 1)`` is 0 for every row (xxhash64 is non-null
    even on NULL input), so partitioning by it is semantically the
    no-partitioning global window — but because the expression hangs
    off a real column, Catalyst's EliminateWindowPartitions cannot fold
    it away (a bare ``lit(0)`` IS folded, silently reintroducing the
    unpartitioned "No Partition Defined" WindowExec). Use it ONLY on
    relations already bounded by construction (post-limit survivors,
    date-cardinality aggregates); the explicit key is the auditable
    bounded-input claim the registry-wide plan gate checks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(1))


def ranked_topk(
    df: DataFrame, order: tuple[Column, ...], k: int, rank_name: str = "rank"
) -> DataFrame:
    """Scale-safe global top-k with dense 1..k ranks.

    ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject: every
    input task keeps a k-row bounded heap and a single reducer merges
    the ≤ partitions·k survivors — the full relation never funnels
    through an unpartitioned window (Spark's "No Partition Defined …
    moving all data to a single partition" scale hazard, the shape
    `ann_pq_adc_topk` 's two-stage ranking also avoids). The rank
    window then runs over EXACTLY ≤ k rows under a constant
    `bounded_const_key`; the limit's single-partition output already
    satisfies the window's clustering, so no extra exchange is planned.

    Identical output to a global ``row_number`` ranking provided
    `order` carries a unique tie-break key (the registry-wide rule,
    see module docstring)."""
    w = Window.partitionBy(bounded_const_key(df.columns[0])).orderBy(*order)
    return (
        df.orderBy(*order)
        .limit(k)
        .withColumn(rank_name, F.row_number().over(w).cast("long"))
    )


def grouped_topk(
    df: DataFrame,
    keys: list,
    order: tuple[Column, ...],
    k: int,
    salt_on: Column | str,
    rank_name: str = "rank",
    n_salts: int = 32,
) -> DataFrame:
    """Scale-safe PER-GROUP top-k with dense 1..k ranks.

    A plain ``row_number over (partition by keys order by ...)`` funnels
    each group's ENTIRE candidate set through one task — fine when
    groups are small, a scale-killer when a group is corpus-sized (each
    ANN query ranks O(N) scored rows). Two stages, the shape
    `ann_pq_adc_topk` proved: a local window over (keys, salt) keeps
    each salt cell's top-k — any group-global top-k row is top-k within
    its cell, so the survivor set provably contains the answer — then
    the per-group window ranks ≤ n_salts·k survivors. The widest
    exchange carries the input over |groups|·n_salts keys instead of
    |groups|.

    Identical output to the single-window form provided `order` carries
    a unique tie-break key (the registry-wide rule). `salt_on` must be
    a column that spreads candidates (the neighbor/doc id — NOT a group
    key)."""
    assert "_lrnk" not in df.columns and rank_name not in df.columns, (
        f"grouped_topk would overwrite an existing column: "
        f"{set(df.columns) & {'_lrnk', rank_name}}"
    )
    salt = F.pmod(F.xxhash64(salt_on), F.lit(n_salts))
    local = Window.partitionBy(*keys, salt).orderBy(*order)
    final = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_lrnk", F.row_number().over(local))
        .filter(F.col("_lrnk") <= k)
        .withColumn(rank_name, F.row_number().over(final).cast("long"))
        .filter(F.col(rank_name) <= k)
        .drop("_lrnk")
    )


def two_phase_rank(
    df: DataFrame,
    keys: list,
    order: tuple[Column, ...],
    bucket: Column,
    bucket_desc: bool = False,
    rank_name: str = "rank",
    n_name: str = "n_rows",
) -> DataFrame:
    """Scale-safe EXACT per-group positional rank (1..n) + group size.

    Positional functions (ntile, percent_rank, cume_dist, full-group
    row_number) cannot pre-prune the way top-k can — every row's rank
    is in the output — so the scale answer is the two-phase rank:
    range-partition each group by a coarse monotone function of the
    sort key, count rows per (group, range) — a distributed, map-side-
    partial aggregation — prefix-sum the tiny count relation into
    per-range offsets, then row_number WITHIN each range and add the
    offset. No task ever sees more than one range of one group; the
    only ordered full-group window runs over the |groups|·|ranges|
    count relation.

    `bucket` must be a deterministic coarse function of the FIRST sort
    key, monotone in the same direction (`bucket_desc` matches the
    primary key's direction), and constant across rows that tie on it
    — e.g. `floor(c_acctbal / 100)` for an acctbal sort. Output is
    then identical to `row_number over (partition by keys order by
    order)` (which equals rank/cume counts when `order` ends in a
    unique tie-break, the registry-wide rule) plus the group size
    `n_name` — the two inputs every positional function is a pure
    integer expression of."""
    reserved = {"_bkt", "_bn", "_off", rank_name, n_name}
    assert not reserved & set(df.columns), (
        f"two_phase_rank would overwrite existing column(s): "
        f"{reserved & set(df.columns)}"
    )
    b = df.withColumn("_bkt", bucket)
    cnt = b.groupBy(*keys, "_bkt").agg(F.count(F.lit(1)).alias("_bn"))
    bord = F.col("_bkt").desc() if bucket_desc else F.col("_bkt").asc()
    w_off = Window.partitionBy(*keys).orderBy(bord).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.partitionBy(*keys).orderBy(bord).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = cnt.select(
        *keys,
        "_bkt",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0).cast("long")).alias("_off"),
        F.sum("_bn").over(w_tot).alias(n_name),
    )
    w_local = Window.partitionBy(*keys, "_bkt").orderBy(*order)
    # eqNullSafe on every join key: windows and groupBy treat NULL as
    # a real group, so the offsets join must too — a name-list
    # (null-unsafe) join would silently drop NULL-keyed groups'
    # ranks (caught by the degenerate-fixture gate on the analogous
    # pack_token_shards join).
    assert all(isinstance(k, str) for k in keys), "keys must be column names"
    renames = {k: f"_o_{k}" for k in [*keys, "_bkt"]}
    offsets = offsets.withColumnsRenamed(renames)
    cond = F.lit(True)
    for k in [*keys, "_bkt"]:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_o_{k}"))
    return (
        b.join(offsets, cond)
        .drop(*renames.values())
        .withColumn(
            rank_name,
            (F.row_number().over(w_local) + F.col("_off")).cast("long"),
        )
        .drop("_bkt", "_off")
    )


def money(col: Column) -> Column:
    """Decimal-domain round to cents, then double.

    A high-scale decimal sum (internal value > 2^53) converts to double
    with ONE rounding in Spark (BigDecimal.doubleValue) but TWO in
    DuckDB (int128→double, then /10^scale) — off-by-a-ulp hash breaks.
    Rounding to scale 2 first makes the conversion exact-path in both."""
    return F.round(col, 2).cast("double")
