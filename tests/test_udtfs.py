"""UDTF chunker twin: token-for-token parity with the JVM-expression
path, including the Java-vs-Python whitespace-class trap."""

from __future__ import annotations

from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.curation import chunk_documents
from apd_map_reduce_spark.operators.dedup import normalized_tokens
from apd_map_reduce_spark.operators.udtfs import (
    _normalized_tokens_py,
    chunk_documents_udtf,
)
from apd_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_udtf_matches_jvm_chunker(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = sorted(map(tuple, chunk_documents_udtf(docs).collect()))
    b = sorted(map(tuple, chunk_documents(docs).collect()))
    assert a == b and len(a) > 0


def test_python_tokenizer_matches_jvm_on_edge_cases(spark):
    texts = [
        "Hello,  world!\tx2\n",
        "",
        "   ",
        "a b",  # unicode NBSP: Java \\s does NOT split — one token "ab"
        "ümlaut café 12three",
        "CRLF\r\nline",
        "tab\tsep\x0bvtab\fff",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i LONG, text STRING")
    jvm = {
        r.i: list(r.ts)
        for r in df.select("i", normalized_tokens().alias("ts")).collect()
    }
    for i, t in enumerate(texts):
        assert _normalized_tokens_py(t) == jvm[i], f"text {t!r}"
    assert _normalized_tokens_py("a b") == ["ab"]
