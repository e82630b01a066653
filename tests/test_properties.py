"""Property-based tests (SURVEY.md §5.3d — the layer the reference
lacks): normalization laws and partition-count invariance."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apd_map_reduce_spark.operators.invindex import inverted_index

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=200,
)


def py_normalize(token: str) -> str:
    """Independent Python model of reference P1 (`main.cpp:31-39`)."""
    return re.sub("[^A-Za-z]", "", token).lower()


@given(st.lists(TEXT, min_size=0, max_size=20))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_normalize_matches_python_model(spark, tokens):
    from apd_map_reduce_spark.functions.text import normalize_word

    if not tokens:
        return
    df = spark.createDataFrame([(t,) for t in tokens], "tok STRING")
    got = [r.w for r in df.select(normalize_word("tok").alias("w")).collect()]
    want = [py_normalize(t) for t in tokens]
    assert got == want


def test_normalize_idempotent(spark):
    from apd_map_reduce_spark.functions.text import normalize_word

    samples = ["Don't", "LOOK-out", "foo123", "ALREADYCLEAN".lower(), "über", "日本語x"]
    df = spark.createDataFrame([(s,) for s in samples], "tok STRING")
    once = df.select(normalize_word("tok").alias("w"))
    twice = once.select(normalize_word("w").alias("w"))
    assert [r.w for r in once.collect()] == [r.w for r in twice.collect()]


def test_shuffle_partition_sweep(spark):
    """Reference checker's (M,R) matrix analogue: results invariant
    under spark.sql.shuffle.partitions (SURVEY.md §4 last paragraph)."""
    corpus = spark.createDataFrame(
        [(i, f"alpha beta w{i} Gamma-{i} {i}00") for i in range(1, 30)],
        "file_id INT, line STRING",
    )
    baseline = None
    for n in ("1", "4", "26"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            got = sorted(
                (r.word, tuple(r.file_ids), r.df)
                for r in inverted_index(corpus).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        if baseline is None:
            baseline = got
        assert got == baseline, f"diverged at shuffle.partitions={n}"
