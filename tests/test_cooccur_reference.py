"""Randomized cross-check of the co-occurrence/positional operators
against a pure-Python reference model (seeded, one Spark job per
operator — deterministic and fast, unlike per-example round-trips)."""

from __future__ import annotations

import random
import re
from collections import Counter

from apd_map_reduce_spark.operators.cooccur import (
    COOCCUR_WINDOW,
    PHRASE,
    cooccurrence_counts,
    phrase_search,
    positional_index,
)

VOCAB = ["slow", "hash", "batch", "scan", "row", "key", "Mixed.Case", "x9y", ""]


def _random_docs(n=120, seed=7):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 30))))
        for i in range(n)
    ]


def _norm_tokens(text):
    toks = [re.sub(r"[^A-Za-z]", "", t).lower() for t in re.split(r"\s+", text)]
    return [t for t in toks if t]


def test_cooccurrence_matches_python_reference(spark):
    rows = _random_docs()
    expected = Counter()
    for _, text in rows:
        ts = _norm_tokens(text)
        for j in range(1, COOCCUR_WINDOW + 1):
            for i in range(len(ts) - j):
                expected[tuple(sorted((ts[i], ts[i + j])))] += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.w1, r.w2): r.pair_count for r in cooccurrence_counts(docs).collect()
    }
    assert got == dict(expected)


def test_phrase_search_matches_python_reference(spark):
    # Plant the phrase in every 10th doc so hits are guaranteed (random
    # text alone may miss the specific trigram at this corpus size).
    rows = [
        (i, text + " slow hash, batch!" if i % 10 == 0 else text)
        for i, text in _random_docs(seed=11)
    ]
    expected = {}
    n = len(PHRASE)
    for doc_id, text in rows:
        ts = _norm_tokens(text)
        hits = [
            i + 1
            for i in range(len(ts) - n + 1)
            if tuple(ts[i : i + n]) == PHRASE
        ]
        if hits:
            expected[doc_id] = (len(hits), hits[0])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.first_pos) for r in phrase_search(docs).collect()}
    assert expected, "seed must produce at least one phrase hit"
    assert got == expected


def test_positional_index_matches_python_reference(spark):
    rows = _random_docs(n=40, seed=3)
    postings = {}
    for doc_id, text in rows:
        for pos, tok in enumerate(_norm_tokens(text), start=1):
            postings.setdefault(tok, []).append((doc_id, pos))
    expected = {
        w: (len(ps), ",".join(f"{d}:{p}" for d, p in sorted(ps)))
        for w, ps in postings.items()
    }
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.word: (r.n_postings, r.postings)
        for r in positional_index(docs).collect()
    }
    assert got == expected
