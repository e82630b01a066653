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


def test_line_record_edge_cases_match_jvm_source(spark, tmp_path):
    # the JVM text source's record semantics (Hadoop LineRecordReader):
    # \r\n records, a lone \r IS a terminator (classic-Mac / embedded
    # CR), missing final newline, empty interior lines, and malformed
    # UTF-8 decoded to U+FFFD instead of failing the task
    f1 = tmp_path / "a.txt"
    f1.write_bytes(b"alpha beta\r\ngamma\r\n")
    f2 = tmp_path / "b.txt"
    f2.write_bytes(b"delta")
    f3 = tmp_path / "c.txt"
    f3.write_bytes(b"one\rtwo\r\rthree\n")  # bare CR terminators
    f4 = tmp_path / "d.txt"
    f4.write_bytes(b"bad \xff byte\nok line\n")  # invalid UTF-8
    manifest = tmp_path / "manifest.txt"
    manifest.write_text(f"4\n{f1}\n{f2}\n{f3}\n{f4}\n")
    via_ds = _ds(spark, str(manifest))
    via_join = read_corpus(spark, read_manifest(spark, str(manifest)))
    got = sorted(map(tuple, via_ds.collect()))
    want = sorted(map(tuple, via_join.collect()))
    assert got == want
    # sanity on the intended shapes, not just mutual agreement
    assert (3, "one") in got and (3, "two") in got and (3, "") in got
    assert any(r[0] == 4 and "�" in r[1] for r in got)
