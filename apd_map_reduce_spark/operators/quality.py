"""Repetition-based quality signals (Gopher/C4-style filters for
training-data curation; extends the reference's text surface the same
way operators/textstats does — SURVEY.md §2.2 stops at
tokenize+normalize).

The signals: token count, distinct-token ratio, most-frequent-token
fraction, and most-frequent-bigram fraction — the standard "is this
document degenerate boilerplate / a repetition loop?" features used to
filter LLM pretraining corpora.

Scale design: explode → groupBy(doc_id, token) → per-doc aggregate.
This SHUFFLES token-count rows, and it is still the right plan: the
array-internal alternative (array_sort + an `aggregate` max-run-length
fold, kept below as `max_run_length` for array-sized inputs) avoids the
shuffle but Spark evaluates higher-order-function lambdas INTERPRETED,
outside whole-stage codegen — measured 38.5 s vs 1.4 s at sf0.1
(5,000 docs), the same 14-27x penalty recorded for the MinHash
array-side prototype (NOTES_r3). Keys are (doc_id, token): uniform,
skew-free, map-side partial aggregation applies. The DuckDB oracle
uses the same formulation.
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

    Docs whose normalization yields ZERO tokens are absent from the
    result (exactly the oracle's unnest semantics).

    Ratios are BIGINT/BIGINT divisions — deterministic doubles from
    identical integer operands on both engines (queries/base.py rules).
    """
    base = docs.select("doc_id", normalized_tokens().alias("ts"))
    tok = base.select("doc_id", F.explode("ts").alias("tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    ta = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_token_n"),
    )
    big = base.select(
        "doc_id", F.explode(word_shingles(F.col("ts"), 2)).alias("b")
    )
    bc = big.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    ba = bc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_n")
    )
    joined = ta.join(ba, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_token_n",
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0).cast("long")).alias("top_bigram_n"),
    )
    n_tokens = F.greatest(F.col("n_tokens"), F.lit(1))
    n_bigrams = F.greatest(F.col("n_bigrams"), F.lit(1))
    return joined.select(
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
