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


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # include in bench.py


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


def money(col: Column) -> Column:
    """Decimal-domain round to cents, then double.

    A high-scale decimal sum (internal value > 2^53) converts to double
    with ONE rounding in Spark (BigDecimal.doubleValue) but TWO in
    DuckDB (int128→double, then /10^scale) — off-by-a-ulp hash breaks.
    Rounding to scale 2 first makes the conversion exact-path in both."""
    return F.round(col, 2).cast("double")
