"""Whole-file corpus reader equivalence + compressed sink size check."""

from __future__ import annotations

import os

from apd_map_reduce_spark.operators.invindex import inverted_index
from apd_map_reduce_spark.sources.manifest import (
    read_corpus,
    read_corpus_whole,
    read_manifest,
)


def test_whole_file_reader_same_index(spark, small_corpus_dir):
    manifest = read_manifest(spark, os.path.join(small_corpus_dir, "manifest.txt"))
    by_line = sorted(
        (r.word, tuple(r.file_ids), r.df)
        for r in inverted_index(read_corpus(spark, manifest)).collect()
    )
    by_file = sorted(
        (r.word, tuple(r.file_ids), r.df)
        for r in inverted_index(read_corpus_whole(spark, manifest)).collect()
    )
    assert by_file == by_line
    # whole mode yields exactly one row per manifest file
    assert read_corpus_whole(spark, manifest).count() == 3


def test_zstd_sink_smaller_than_uncompressed(spark, tmp_path):
    from apd_map_reduce_spark.sinks import write_parquet
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    z = str(tmp_path / "zstd")
    u = str(tmp_path / "uncompressed")
    write_parquet(docs, z)  # zstd default
    write_parquet(docs, u, compression="uncompressed")

    def size(d: str) -> int:
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert size(z) < size(u)
