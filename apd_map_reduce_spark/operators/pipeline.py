"""End-to-end training-data cleaning pipeline — the capstone
composition of the dedup + quality operators (driver mandate: "the
operations a large-scale training-data pipeline would need").

    documents
      → drop exact duplicates (keep min doc_id per content hash)
      → drop near-duplicates (MinHash-LSH candidates verified at
        Jaccard ≥ 0.5; the HIGHER doc_id of each surviving pair drops)
      → drop low-quality docs (alpha-token ratio < 0.5 or < 5 tokens)
      → clean snapshot

Near-dup removal is single-pass (drop any doc that is the b-side of a
qualifying pair) — deterministic and shuffle-bounded; transitive-closure
grouping (connected components) is the iterative refinement a real
pipeline might add and is documented as out of scope here.

`materialize_clean_snapshot` writes the surviving rows as partitioned
parquet — the publishable dataset snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.dedup import (
    _minhash_oracle,
    dedup_exact,
    minhash_lsh_pairs,
)
from apd_map_reduce_spark.operators.textstats import quality_score
from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.sources.tables import load_table

NEAR_DUP_THRESHOLD = 0.5
MIN_TOKENS = 5
MIN_ALPHA_RATIO = 0.5


def clean_corpus(docs: DataFrame, near_pairs: DataFrame | None = None) -> DataFrame:
    """Surviving documents after exact-dup, near-dup, quality filters.

    Returns DataFrame[doc_id, n_tokens, alpha_token_ratio] of keepers.

    `near_pairs` (optional): a precomputed near-duplicate pair relation
    with columns (doc_a, doc_b, jaccard) at threshold
    NEAR_DUP_THRESHOLD — pass it when the pipeline already ran LSH
    (e.g. a prior `minhash_lsh_pairs` stage whose output is persisted),
    so the capstone doesn't re-pay shingling + banding + verification.
    The registered benchmark entry deliberately does NOT pass it: the
    bench charges each entry its full standalone cost.
    """
    # One digest aggregation feeds BOTH the exact-dup filter and the
    # LSH path's exact-dup pre-grouping (cached: two consumers).
    clusters = dedup_exact(docs).cache()
    keep_exact = clusters.select(F.col("keep_doc_id").alias("doc_id"))
    survivors = docs.join(keep_exact, "doc_id", "left_semi")

    if near_pairs is None:
        near_pairs = minhash_lsh_pairs(
            docs, threshold=NEAR_DUP_THRESHOLD, clusters=clusters
        )
    drop_b = near_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = survivors.join(drop_b, "doc_id", "left_anti")

    q = quality_score(docs).select("doc_id", "n_tokens", "alpha_token_ratio")
    return (
        survivors.join(q, "doc_id")
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("alpha_token_ratio") >= MIN_ALPHA_RATIO)
        )
        .select("doc_id", "n_tokens", "alpha_token_ratio")
    )


def _clean_corpus_oracle() -> str:
    near_dup_sql = _minhash_oracle(threshold=NEAR_DUP_THRESHOLD)
    return f"""
WITH dropb AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({near_dup_sql}) nd
),
keep_exact AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
q AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)
           / GREATEST(len(string_split_regex(trim(text), '\\s+')), 1) AS alpha_token_ratio
  FROM documents
)
SELECT d.doc_id, q.n_tokens, q.alpha_token_ratio
FROM documents d
JOIN keep_exact k ON d.doc_id = k.doc_id
JOIN q ON q.doc_id = d.doc_id
LEFT JOIN dropb ON d.doc_id = dropb.doc_id
WHERE dropb.doc_id IS NULL
  AND q.n_tokens >= {MIN_TOKENS}
  AND q.alpha_token_ratio >= {MIN_ALPHA_RATIO}
"""


PIPELINE_QUERIES = [
    QueryDef(
        "corpus_clean_snapshot",
        lambda s, d: clean_corpus(load_table(s, d, "documents")),
        _clean_corpus_oracle(),
        headline=True,
    ),
]


def materialize_clean_snapshot(docs: DataFrame, out_path: str) -> int:
    """Write the publishable snapshot (full rows of keepers) as
    parquet partitioned by lang; returns surviving row count."""
    keepers = clean_corpus(docs).select("doc_id")
    snapshot = docs.join(keepers, "doc_id", "left_semi")
    snapshot.write.mode("overwrite").partitionBy("lang").parquet(out_path)
    return snapshot.count()
