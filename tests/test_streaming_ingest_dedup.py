"""Streaming near-dup ingest: micro-batches screened against the
persisted corpus LSH index match the batch-twin incremental screen."""

from __future__ import annotations

import os

import pytest

from apd_map_reduce_spark.streaming.ingest_dedup import (
    neardup_ingest_stream,
    read_matches,
)

DOCS_SCHEMA = "doc_id LONG, text STRING"

# This exact pair is a verified band collision under the fixed MinHash
# family (same fixture as test_dedup_family_partition_sweep) — LSH
# recall is probabilistic per pair, so tests must plant KNOWN colliders.
BASE = "the quick brown fox jumps over the lazy dog tonight"
NEAR = "the quick brown fox jumps over the lazy cat tonight"
OTHER = "completely unrelated content about database engines and planners"


@pytest.fixture()
def two_batch_dirs(spark, tmp_path):
    """Two parquet files dropped so maxFilesPerTrigger=1 yields two
    micro-batches; file order is by modification time, so write them
    sequentially."""
    d = tmp_path / "docs_in"
    first = spark.createDataFrame([(1, BASE), (2, OTHER)], DOCS_SCHEMA)
    first.coalesce(1).write.mode("append").parquet(str(d))
    second = spark.createDataFrame([(10, NEAR), (11, "fresh standalone words entirely new here today")], DOCS_SCHEMA)
    second.coalesce(1).write.mode("append").parquet(str(d))
    return str(d)


def test_streaming_ingest_flags_cross_batch_near_dup(spark, tmp_path, two_batch_dirs):
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(two_batch_dirs)
    )
    index = str(tmp_path / "lsh_index")
    matches = str(tmp_path / "matches")
    q = neardup_ingest_stream(
        stream, index, matches, checkpoint=str(tmp_path / "ckpt"), threshold=0.2
    )
    q.awaitTermination()

    got = {
        frozenset((r.batch_doc, r.corpus_doc)): r.jaccard
        for r in read_matches(spark, matches).collect()
    }
    # The only qualifying cross-batch pair is (NEAR, BASE); OTHER and
    # the fresh doc share no shingles with anything.
    assert set(got) == {frozenset((10, 1))}
    assert 0.2 <= got[frozenset((10, 1))] < 1.0

    # The index admitted every doc exactly once.
    from apd_map_reduce_spark.operators.dedup import LSH_BANDS

    bands = spark.read.parquet(os.path.join(index, "bands"))
    assert bands.select("doc_id").distinct().count() == 4
    assert bands.count() == 4 * LSH_BANDS  # LSH_BANDS rows per doc


def test_streaming_ingest_tolerates_degenerate_docs(spark, tmp_path):
    """NULL-text and sub-shingle docs must flow through the screen
    without crashing a micro-batch: they produce zero shingles, so
    they are admitted silently (no signature, no band rows, never
    flagged) while a real near-dup in the same batches still matches."""
    d = tmp_path / "docs_in"
    first = spark.createDataFrame([(1, BASE), (2, None), (3, "ab")], DOCS_SCHEMA)
    first.coalesce(1).write.mode("append").parquet(str(d))
    second = spark.createDataFrame([(10, NEAR), (11, None)], DOCS_SCHEMA)
    second.coalesce(1).write.mode("append").parquet(str(d))

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    index = str(tmp_path / "lsh_index")
    matches = str(tmp_path / "matches")
    q = neardup_ingest_stream(
        stream, index, matches, checkpoint=str(tmp_path / "ckpt"), threshold=0.2
    )
    q.awaitTermination()

    got = {
        frozenset((r.batch_doc, r.corpus_doc))
        for r in read_matches(spark, matches).collect()
    }
    assert got == {frozenset((10, 1))}, "real near-dup must still match"
    bands = spark.read.parquet(os.path.join(index, "bands"))
    indexed = {r.doc_id for r in bands.select("doc_id").distinct().collect()}
    assert indexed == {1, 10}, "zero-shingle docs must not enter the band index"


def test_streaming_ingest_matches_batch_twin(spark, tmp_path, two_batch_dirs):
    """Whatever the stream flags must equal the batch-twin screen of
    'later file vs earlier file' (pair orientation normalized)."""
    from apd_map_reduce_spark.operators.dedup import dedup_incremental_neardup

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(two_batch_dirs)
    )
    index = str(tmp_path / "idx2")
    matches = str(tmp_path / "m2")
    q = neardup_ingest_stream(
        stream, index, matches, checkpoint=str(tmp_path / "ck2"), threshold=0.2
    )
    q.awaitTermination()

    got = {
        frozenset((r.batch_doc, r.corpus_doc)) for r in read_matches(spark, matches).collect()
    }
    all_docs = spark.read.parquet(two_batch_dirs)
    lo = all_docs.filter("doc_id < 10")
    hi = all_docs.filter("doc_id >= 10")
    expected = {
        frozenset((r.batch_doc, r.corpus_doc))
        for r in dedup_incremental_neardup(lo, hi, threshold=0.2).collect()
    }
    assert got == expected


def test_streaming_ingest_skips_rearrived_doc_ids(spark, tmp_path):
    """A doc_id the index already holds is neither re-admitted (which
    would double its shingle rows and break jaccard) nor re-screened."""
    d = tmp_path / "docs_re"
    spark.createDataFrame([(1, BASE)], DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    spark.createDataFrame([(1, BASE), (2, OTHER)], DOCS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(str(d))

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    index = str(tmp_path / "idx_re")
    matches = str(tmp_path / "m_re")
    q = neardup_ingest_stream(
        stream, index, matches, checkpoint=str(tmp_path / "ck_re"), threshold=0.2
    )
    q.awaitTermination()

    from apd_map_reduce_spark.operators.dedup import LSH_BANDS

    bands = spark.read.parquet(os.path.join(index, "bands"))
    # doc 1 indexed exactly once despite arriving twice
    assert bands.filter("doc_id = 1").count() == LSH_BANDS
    assert read_matches(spark, matches).count() == 0


def test_streaming_ingest_single_batch_creates_empty_matches(spark, tmp_path):
    d = tmp_path / "docs_one"
    spark.createDataFrame([(1, BASE), (2, OTHER)], DOCS_SCHEMA).write.mode(
        "append"
    ).parquet(str(d))
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(str(d))
    matches = str(tmp_path / "m_one")
    q = neardup_ingest_stream(
        stream, str(tmp_path / "idx_one"), matches,
        checkpoint=str(tmp_path / "ck_one"),
    )
    q.awaitTermination()
    # fresh single-batch pipeline: 'no duplicates yet' reads as 0 rows,
    # not a missing-path error
    assert read_matches(spark, matches).count() == 0


def test_streaming_ingest_rejects_old_index_format(spark, tmp_path):
    """An index persisted by the retired md5-string band_hash format
    must be rejected up front with a clear rebuild-required error —
    not appended to with mixed schemas that only fail later at
    read/join time."""
    import pytest

    idx = tmp_path / "idx_old"
    # plant an old-format bands relation (band_hash as md5 STRING)
    spark.createDataFrame(
        [(1, 0, "d41d8cd98f00b204e9800998ecf8427e")],
        "doc_id LONG, band INT, band_hash STRING",
    ).write.mode("append").parquet(str(idx / "bands"))
    spark.createDataFrame(
        [(1, 12345)], "doc_id LONG, sh LONG"
    ).write.mode("append").parquet(str(idx / "shingles"))

    d = tmp_path / "docs_old"
    spark.createDataFrame([(2, BASE)], DOCS_SCHEMA).write.mode(
        "append"
    ).parquet(str(d))
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(str(d))
    q = neardup_ingest_stream(
        stream, str(idx), str(tmp_path / "m_old"),
        checkpoint=str(tmp_path / "ck_old"),
    )
    with pytest.raises(Exception, match="index format changed|rebuild"):
        q.awaitTermination()
