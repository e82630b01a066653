"""Training-data curation operators (driver mandate: "operations a
large-scale training-data pipeline would need"): deterministic
train/eval splitting, stratified sampling, and benchmark-contamination
detection.

All determinism is md5-derived (hash60, shared with operators/dedup),
so every operator has a bitwise-identical DuckDB oracle — no RNG, no
engine-specific sampling.

Scale design:
  * split — a projection + aggregation; the split assignment is a pure
    function of doc_id, so it is reproducible across runs/engines and
    needs no shuffle beyond the final count.
  * stratified sample — one window partitioning by stratum; the hash
    order makes the sample deterministic AND uniform-ish without a
    global sort.
  * contamination — shingle-inverted-index join of corpus vs benchmark,
    benchmark side broadcast (benchmark sets are small by construction);
    the corpus side is stop-shingle-filtered (df > MAX_SHINGLE_DF
    dropped) so no single boilerplate shingle creates a hot join key at
    100 TB. Mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.dedup import (
    MAX_SHINGLE_DF,
    _SHINGLES_CTE,
    doc_shingle_hashes,
    hash60,
    stop_shingle_filter,
)
from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.sources.tables import load_table

EVAL_PCT = 10
SAMPLE_K = 20
BENCH_MOD = 97


def train_test_split_hash(docs: DataFrame, eval_pct: int = EVAL_PCT) -> DataFrame:
    """Deterministic train/eval split: md5-bucket each doc_id into 100
    buckets; the first `eval_pct` are 'eval'. Per (split, lang) counts.

    The assignment is a pure function of doc_id — stable under
    re-partitioning, re-runs, and engine changes, which is what makes
    a split reproducible in a pipeline that reprocesses data."""
    bucket = hash60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return (
        docs.select(
            F.when(bucket < eval_pct, F.lit("eval")).otherwise(F.lit("train")).alias("split"),
            "lang",
        )
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SPLIT_ORACLE = f"""
SELECT CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < {EVAL_PCT}
            THEN 'eval' ELSE 'train' END AS split,
       lang, COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def stratified_sample_exact(docs: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """Deterministic stratified sample: per lang, the k docs with the
    smallest md5-derived sample key. One window partitioning per
    stratum — no global sort, no RNG; the hash order is uniform over
    docs so the sample is unbiased, and deterministic so it is
    reproducible (and oracle-checkable)."""
    from pyspark.sql.window import Window

    key = hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("lang", "rnk", "doc_id")
    )


SAMPLE_ORACLE = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 15))::BIGINT ASC,
                    doc_id ASC
         ) AS rnk
  FROM documents
)
SELECT lang, rnk, doc_id FROM ranked WHERE rnk <= {SAMPLE_K}
"""


def benchmark_contamination(
    docs: DataFrame, bench_mod: int = BENCH_MOD, max_df: int = MAX_SHINGLE_DF
) -> DataFrame:
    """Benchmark contamination check: word-3-gram shingle overlap
    between every corpus doc and a benchmark subset (stand-in: docs
    with doc_id % bench_mod == 0 — in a real pipeline the benchmark
    table arrives separately but is equally small).

    Returns (doc_id, bench_id, n_overlap) for every contaminated pair
    (≥1 shared non-boilerplate shingle). Corpus shingles with document
    frequency > max_df are dropped first (stop-shingle guard, same as
    the dedup family) so a corpus-wide boilerplate trigram cannot make
    one shingle key quadratic; the benchmark side then broadcasts."""
    sh = stop_shingle_filter(doc_shingle_hashes(docs), max_df=max_df)
    bench = sh.filter((F.col("doc_id") % bench_mod) == 0).select(
        F.col("doc_id").alias("bench_id"), "sh"
    )
    return (
        sh.join(F.broadcast(bench), "sh")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


CONTAMINATION_ORACLE = f"""
WITH {_SHINGLES_CTE},
shf AS (
  SELECT doc_id, sh FROM shh
  WHERE sh NOT IN (
    SELECT sh FROM shh GROUP BY sh HAVING COUNT(*) > {MAX_SHINGLE_DF}
  )
),
bench AS (
  SELECT doc_id AS bench_id, sh FROM shf WHERE doc_id % {BENCH_MOD} = 0
)
SELECT s.doc_id, b.bench_id, COUNT(*) AS n_overlap
FROM shf s JOIN bench b USING (sh)
WHERE s.doc_id <> b.bench_id
GROUP BY 1, 2
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


CURATION_QUERIES = [
    QueryDef(
        "train_test_split_hash",
        lambda s, d: train_test_split_hash(_docs(s, d)),
        SPLIT_ORACLE,
    ),
    QueryDef(
        "stratified_sample_exact",
        lambda s, d: stratified_sample_exact(_docs(s, d)),
        SAMPLE_ORACLE,
    ),
    QueryDef(
        "benchmark_contamination",
        lambda s, d: benchmark_contamination(_docs(s, d)),
        CONTAMINATION_ORACLE,
    ),
]
