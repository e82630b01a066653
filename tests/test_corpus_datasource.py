"""format('corpus') Python data source vs the composition reader.

The data source carries the manifest ordinal inside its partitions
while `read_corpus` tags lines back through an input_file_name()
broadcast join — two independent implementations of the S1/S2 ordinal
contract (SURVEY.md §2.1), pinned here to identical results, including
through the full flagship index.
"""

from __future__ import annotations

import os

from apd_map_reduce_spark.operators.invindex import inverted_index
from apd_map_reduce_spark.sources.corpus_datasource import register_corpus_source
from apd_map_reduce_spark.sources.manifest import (
    read_corpus,
    read_manifest,
)


def _ds(spark, manifest_path, **options):
    register_corpus_source(spark)
    reader = spark.read.format("corpus")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(manifest_path)


def test_datasource_matches_composition_reader(spark, small_corpus_dir):
    manifest_path = os.path.join(small_corpus_dir, "manifest.txt")
    via_ds = _ds(spark, manifest_path)
    via_join = read_corpus(spark, read_manifest(spark, manifest_path))
    assert via_ds.schema == via_join.schema
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_join.collect())
    )


def test_datasource_through_flagship_index(spark, small_corpus_dir):
    manifest_path = os.path.join(small_corpus_dir, "manifest.txt")
    via_ds = sorted(
        (r.word, tuple(r.file_ids), r.df)
        for r in inverted_index(_ds(spark, manifest_path)).collect()
    )
    via_join = sorted(
        (r.word, tuple(r.file_ids), r.df)
        for r in inverted_index(
            read_corpus(spark, read_manifest(spark, manifest_path))
        ).collect()
    )
    assert via_ds == via_join


def test_one_partition_per_manifest_file(spark, small_corpus_dir):
    manifest_path = os.path.join(small_corpus_dir, "manifest.txt")
    df = _ds(spark, manifest_path)
    # the file is the work-queue granule: 3 manifest files → 3 tasks
    assert df.rdd.getNumPartitions() == 3
    # and every row of a partition carries that file's ordinal
    per_part = df.select("file_id").rdd.mapPartitions(
        lambda rows: [len({r.file_id for r in rows})]
    ).collect()
    assert per_part == [1, 1, 1]


def test_wholetext_option(spark, small_corpus_dir):
    manifest_path = os.path.join(small_corpus_dir, "manifest.txt")
    whole = _ds(spark, manifest_path, wholetext="true")
    assert whole.count() == 3
    # line-agnostic downstream: same index as the line-mode source
    a = sorted(
        (r.word, tuple(r.file_ids), r.df)
        for r in inverted_index(whole).collect()
    )
    b = sorted(
        (r.word, tuple(r.file_ids), r.df)
        for r in inverted_index(_ds(spark, manifest_path)).collect()
    )
    assert a == b


def test_crlf_and_missing_final_newline(spark, tmp_path):
    # \r\n records and a file without a trailing newline must match the
    # JVM text source's record semantics
    f1 = tmp_path / "a.txt"
    f1.write_bytes(b"alpha beta\r\ngamma\r\n")
    f2 = tmp_path / "b.txt"
    f2.write_bytes(b"delta")
    manifest = tmp_path / "manifest.txt"
    manifest.write_text(f"2\n{f1}\n{f2}\n")
    via_ds = _ds(spark, str(manifest))
    via_join = read_corpus(spark, read_manifest(spark, str(manifest)))
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_join.collect())
    )
