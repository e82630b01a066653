"""Golden tests for the inverted-index slice (SURVEY.md §7.2).

Expected values are the reference's worked example
(`/root/reference/README.md:118-431`, recorded in FIXTURES.md F4),
typed out independently here — not copied files.
"""

from __future__ import annotations

import os

import pytest

from apd_map_reduce_spark.operators.invindex import (
    ALPHABET,
    inverted_index,
    ranked_index,
    write_letter_files,
)
from apd_map_reduce_spark.sources.manifest import read_corpus, read_manifest

GOLDEN_SMALL = {
    "a": ["and:[2]", "are:[1]", "as:[1]"],
    "b": ["blue:[1 2]", "birds:[1]", "bright:[1]", "brightly:[3]", "by:[2]"],
    "c": ["calm:[2]", "clouds:[2]"],
    "e": ["evening:[3]"],
    "f": ["float:[2]"],
    "g": ["gentle:[2]"],
    "i": ["in:[1 3]", "is:[2]"],
    "m": ["morning:[2]"],
    "p": ["peaceful:[3]"],
    "q": ["quiet:[3]"],
    "s": ["sky:[1 2 3]", "shine:[3]", "shines:[1]", "singing:[1]", "stars:[3]", "sun:[1]"],
    "t": ["the:[1 2 3]", "this:[2]", "today:[1]"],
}


@pytest.fixture(scope="module")
def small_corpus(spark, small_corpus_dir):
    manifest = read_manifest(spark, os.path.join(small_corpus_dir, "manifest.txt"))
    return read_corpus(spark, manifest)


def test_manifest_ordinals(spark, small_corpus_dir):
    m = read_manifest(spark, os.path.join(small_corpus_dir, "manifest.txt"))
    rows = sorted(m.collect())
    assert [r.file_id for r in rows] == [1, 2, 3]
    assert rows[0].path.endswith("file1.txt")


def test_index_relation(small_corpus):
    idx = {r.word: (r.file_ids, r.df) for r in inverted_index(small_corpus).collect()}
    assert idx["sky"] == ([1, 2, 3], 3)
    assert idx["the"] == ([1, 2, 3], 3)
    assert idx["blue"] == ([1, 2], 2)
    assert idx["in"] == ([1, 3], 2)  # "morning," normalizes away from 'in'
    assert "" not in idx
    assert len(idx) == sum(len(v) for v in GOLDEN_SMALL.values())  # 27 distinct words


def test_golden_letter_files(small_corpus, tmp_path):
    out = str(tmp_path / "out")
    write_letter_files(ranked_index(small_corpus), out)
    for ch in ALPHABET:
        path = os.path.join(out, f"{ch}.txt")
        assert os.path.exists(path), f"missing {ch}.txt"
        with open(path) as fh:
            lines = [ln.rstrip("\n") for ln in fh if ln.strip()]
        assert lines == GOLDEN_SMALL.get(ch, []), f"letter {ch}"


def test_partition_count_invariance(spark, small_corpus):
    """Result is invariant under shuffle partitioning (SURVEY.md §7.1)."""
    base = sorted(
        (r.word, tuple(r.file_ids), r.df) for r in inverted_index(small_corpus).collect()
    )
    for n in (1, 7):
        got = sorted(
            (r.word, tuple(r.file_ids), r.df)
            for r in inverted_index(small_corpus.repartition(n)).collect()
        )
        assert got == base


def test_normalization_corner_cases(spark):
    corpus = spark.createDataFrame(
        [
            (1, "Don't look-out foo123 1842 XIII a x"),
            (2, "  multiple   spaces\tand\ttabs "),
        ],
        "file_id INT, line STRING",
    )
    idx = {r.word: r.file_ids for r in inverted_index(corpus).collect()}
    assert idx["dont"] == [1]
    assert idx["lookout"] == [1]
    assert idx["foo"] == [1]
    assert "1842" not in idx and "" not in idx
    assert idx["xiii"] == [1]
    assert idx["a"] == [1]
    assert idx["x"] == [1]
    assert idx["multiple"] == [2]
    assert idx["tabs"] == [2]
