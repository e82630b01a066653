"""Streaming inverted index == batch inverted index, across multiple
micro-batches (maxFilesPerTrigger=1 forces incremental state merges)."""

from __future__ import annotations

import os

from apd_map_reduce_spark.operators.invindex import inverted_index
from apd_map_reduce_spark.sources.manifest import read_corpus, read_manifest
from apd_map_reduce_spark.streaming.invindex import (
    incremental_inverted_index,
    stream_corpus,
)


def test_incremental_index_matches_batch(spark, small_corpus_dir):
    manifest_path = os.path.join(small_corpus_dir, "manifest.txt")
    stream = stream_corpus(spark, small_corpus_dir + "/file*.txt", manifest_path)
    assert stream.isStreaming
    idx = incremental_inverted_index(stream)
    q = (
        idx.writeStream.format("memory")
        .queryName("inc_index")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # 3 files, maxFilesPerTrigger=1 → ≥3 micro-batches of state merge
    assert len(q.recentProgress) >= 3

    got = {
        r.word: (tuple(r.file_ids), r.df)
        for r in spark.table("inc_index").collect()
    }
    manifest = read_manifest(spark, manifest_path)
    batch = {
        r.word: (tuple(r.file_ids), r.df)
        for r in inverted_index(read_corpus(spark, manifest)).collect()
    }
    assert got == batch
