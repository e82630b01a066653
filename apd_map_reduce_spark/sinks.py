"""Sink registry (reference S4/S5 generalized — SURVEY.md §2.1).

The reference's one sink is the per-letter text file; `operators/
invindex.write_letter_files` reproduces that contract bit-exact. These
are the engine's general-purpose sinks: partitioned parquet/csv/text
with overwrite semantics (the reference's append-mode stale-file hazard
is deliberately not reproduced — SURVEY.md §5.2).

Scale: every sink keeps one writer task per partition; `single_file`
exists for small exports only and is documented as the anti-pattern at
100 TB (it coalesces to one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """zstd by default: ~25-40% smaller than snappy on text-heavy
    columns at similar scan speed — at 100 TB that is the difference
    that pays for itself on every scan."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    key: str,
    num_files: int | None = None,
    compression: str = "zstd",
) -> None:
    """Range-clustered parquet layout: repartitionByRange(key) +
    sortWithinPartitions(key) before writing, so every output file
    covers a DISJOINT key range and rows inside each file are sorted.

    Why this matters at 100 TB: parquet stores per-row-group min/max
    statistics. On a randomly-laid-out table every row group spans the
    whole key domain and a selective key filter still reads everything;
    on this layout the same filter prunes to the handful of files whose
    range overlaps — the poor man's clustered index (same mechanism
    Z-ordering generalizes to multiple keys). Sampling inside
    repartitionByRange makes the range bounds; one extra shuffle buys
    pruning on every subsequent scan."""
    n = num_files or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    (
        df.repartitionByRange(int(n), key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_text(
    df: DataFrame,
    path: str,
    column: str = "value",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    cols = ([column] + partition_by) if partition_by else [column]
    w = df.select(*cols).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.text(path)
