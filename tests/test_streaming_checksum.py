"""Streaming incremental checksum equals the batch table fingerprint
regardless of how the data is split into micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest

from apd_map_reduce_spark.operators.snapshot import table_checksum
from apd_map_reduce_spark.streaming.checksum import (
    checksum_stream_to_store,
    read_checksum_store,
)

from .conftest import SF_SMOKE

COLS = ["event_id", "user_id", "event_type"]


@pytest.fixture()
def split_events_dir(spark, tmp_path):
    """The events table dropped as several files so availableNow
    processes multiple input splits."""
    d = tmp_path / "events_parts"
    src = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    src.repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_streaming_checksum_matches_batch(spark, tmp_path, split_events_dir):
    batch_df = spark.read.parquet(split_events_dir)
    expected = table_checksum(batch_df, COLS).collect()[0]

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "2")  # force >1 micro-batch
        .parquet(split_events_dir)
    )
    store = str(tmp_path / "ck_store")
    q = checksum_stream_to_store(
        stream, COLS, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = read_checksum_store(spark, store).collect()[0]
    assert (got.n_rows, got.checksum) == (expected.n_rows, expected.checksum)


def test_streaming_checksum_accumulates_across_restarts(spark, tmp_path, split_events_dir):
    """New files arriving after a restart fold into the same store."""
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    parts = sorted(
        f for f in os.listdir(split_events_dir) if f.endswith(".parquet")
    )
    assert len(parts) >= 2
    first, rest = parts[0], parts[1:]
    shutil.copy(os.path.join(split_events_dir, first), incoming / first)

    batch_df = spark.read.parquet(split_events_dir)
    store = str(tmp_path / "ck_store")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(batch_df.schema).parquet(str(incoming))
        )
        q = checksum_stream_to_store(stream, COLS, store, checkpoint=ckpt)
        q.awaitTermination()

    run_once()
    for f in rest:
        shutil.copy(os.path.join(split_events_dir, f), incoming / f)
    run_once()  # restart from the same checkpoint: only new files process

    expected = table_checksum(batch_df, COLS).collect()[0]
    got = read_checksum_store(spark, store).collect()[0]
    assert (got.n_rows, got.checksum) == (expected.n_rows, expected.checksum)
