"""Repetition-based quality signals (Gopher/C4-style filters for
training-data curation; extends the reference's text surface the same
way operators/textstats does — SURVEY.md §2.2 stops at
tokenize+normalize).

The signals: token count, distinct-token ratio, most-frequent-token
fraction, and most-frequent-bigram fraction — the standard "is this
document degenerate boilerplate / a repetition loop?" features used to
filter LLM pretraining corpora.

Scale design: everything is computed INSIDE the per-row token array via
``array_sort`` + an ``aggregate`` max-run-length fold — the count of the
most frequent element of a sorted array is its longest equal-run. No
explode, no shuffle, no UDF: the whole operator is one whole-stage-
codegen projection that runs at scan speed on 100 TB, unlike the
explode → groupBy(doc_id, token) formulation which would shuffle
token-count rows (the DuckDB oracle uses exactly that formulation —
same result, different plan — which is the point of the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.dedup import (
    _TOKENS_SQL,
    normalized_tokens,
    word_shingles,
)
from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.sources.tables import load_table


def max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements (= max element count when
    the array is sorted). A left fold with a (prev, run, best) struct
    accumulator; 0 for empty arrays."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, zero, merge, lambda acc: acc["best"])


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-doc repetition features over normalized tokens (same
    normalization as the dedup family, reference P1+P2).

    Ratios are BIGINT/BIGINT divisions — deterministic doubles from
    identical integer operands on both engines (queries/base.py rules).
    """
    toks = normalized_tokens()
    big = word_shingles(toks, 2)
    counted = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        max_run_length(F.array_sort(toks)).alias("top_token_n"),
        F.size(big).cast("long").alias("n_bigrams"),
        max_run_length(F.array_sort(big)).alias("top_bigram_n"),
    )
    n_tokens = F.greatest(F.col("n_tokens"), F.lit(1))
    n_bigrams = F.greatest(F.col("n_bigrams"), F.lit(1))
    return counted.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_token_n",
        "n_bigrams",
        "top_bigram_n",
        (F.col("n_distinct") / n_tokens).alias("distinct_token_ratio"),
        (F.col("top_token_n") / n_tokens).alias("top_token_frac"),
        (F.col("top_bigram_n") / n_bigrams).alias("top_bigram_frac"),
    )


REPETITION_ORACLE = f"""
WITH toksq AS (SELECT doc_id, {_TOKENS_SQL} AS ts FROM documents),
tok AS (SELECT doc_id, unnest(ts) AS tok FROM toksq),
tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
ta AS (
  SELECT doc_id, SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_distinct,
         MAX(c)::BIGINT AS top_token_n
  FROM tc GROUP BY 1
),
bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS b
  FROM (SELECT doc_id, ts, unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i
        FROM toksq)
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
ba AS (SELECT doc_id, SUM(c)::BIGINT AS n_bigrams, MAX(c)::BIGINT AS top_bigram_n
       FROM bc GROUP BY 1)
SELECT ta.doc_id, n_tokens, n_distinct, top_token_n,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(top_bigram_n, 0) AS top_bigram_n,
       n_distinct / greatest(n_tokens, 1) AS distinct_token_ratio,
       top_token_n / greatest(n_tokens, 1) AS top_token_frac,
       COALESCE(top_bigram_n, 0) / greatest(COALESCE(n_bigrams, 0), 1) AS top_bigram_frac
FROM ta LEFT JOIN ba ON ta.doc_id = ba.doc_id
"""


QUALITY_QUERIES = [
    QueryDef(
        "text_repetition_signals",
        lambda s, d: repetition_signals(load_table(s, d, "documents")),
        REPETITION_ORACLE,
    ),
]
