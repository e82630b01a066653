"""Bit-exact parity with the reference engine on ITS OWN test corpus.

Runs the PySpark pipeline on the reference's 355-file Gutenberg corpus
(`/root/reference/tema1a/checker/test.txt`) and diffs all 26 letter
files against the reference goldens (`test_out/`), mirroring the
checker's `diff -w` gate (`checker.sh:22-41`): content + line order
binding, whitespace-insensitive.

Read-only use of the reference tree (inputs + expected outputs only).
"""

from __future__ import annotations

import os

import pytest

from apd_map_reduce_spark.operators.invindex import (
    ALPHABET,
    ranked_index,
    write_letter_files,
)
from apd_map_reduce_spark.sources.manifest import read_corpus, read_manifest

REF_MANIFEST = "/root/reference/tema1a/checker/test.txt"
REF_GOLDEN = "/root/reference/tema1a/checker/test_out"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MANIFEST), reason="reference corpus not present"
)


def test_big_corpus_golden(spark, tmp_path):
    manifest = read_manifest(spark, REF_MANIFEST)
    assert manifest.count() == 355
    corpus = read_corpus(spark, manifest)
    out = str(tmp_path / "out")
    write_letter_files(ranked_index(corpus), out)

    total_lines = 0
    for ch in ALPHABET:
        with open(os.path.join(out, f"{ch}.txt"), encoding="utf-8") as fh:
            got = [ln.rstrip() for ln in fh if ln.strip()]
        with open(os.path.join(REF_GOLDEN, f"{ch}.txt"), encoding="utf-8", errors="replace") as fh:
            want = [ln.rstrip() for ln in fh if ln.strip()]
        assert len(got) == len(want), f"{ch}.txt: {len(got)} vs {len(want)} lines"
        assert got == want, (
            f"{ch}.txt first divergence: "
            f"{next((a, b) for a, b in zip(got, want) if a != b)}"
        )
        total_lines += len(got)
    assert total_lines == 33262  # SURVEY.md §5.2 distinct-word count
