"""Embedding vector operators beyond search (operators/similarity):
scalar int8 quantization and per-label centroid accumulation — the
storage-compression and cluster-summary steps of an embedding pipeline
(quantize before writing 100 TB of vectors; centroids feed IVF coarse
quantizers and drift monitoring).

Determinism across engines (queries/base.py rules):
  * Per-row float math (cast float→double, multiply, divide, floor,
    abs, sign) is IEEE-deterministic — identical operands, identical
    ops, identical bits on both engines. Safe inside a row.
  * AGGREGATED floats are not (addition order) — so the centroid query
    never sums doubles: each component is floored to an integer
    micro-unit first and summed as BIGINT (exact, order-free). The
    caller derives the centroid as sum_micro / (n_vecs * 1e6).
  * Rounding is floor-based (floor(x + 0.5) patterns), never round():
    Spark HALF_UP vs DuckDB half-away differ on edge doubles.

Scale: quantization is a shuffle-free projection (scan speed).
Centroids explode rows × dims but aggregate on a (label, pos) key of
bounded cardinality — partial map-side aggregation collapses the
explosion before the (tiny) shuffle; no skew possible since every
vector contributes to every pos exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.plans.layout import posexplode_nonnull

from apd_map_reduce_spark.functions.embeddings import (
    valid_embeddings,
    valid_embeddings_sql,
)

from apd_map_reduce_spark.queries.base import QueryDef, grouped_topk
from apd_map_reduce_spark.sources.tables import load_table

_EMB_GUARD = valid_embeddings_sql()

# Floor of the quantization scale's magnitude: an all-zero vector would
# make scale 0 and 0/0 = NaN; 1e-12 maps it to all-zero int8s instead.
MIN_SCALE = 1e-12


def _dvec(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _quant_rel(emb: DataFrame) -> DataFrame:
    """(vec_id, n_dims, arr, scale, q): the int8 quantization chain
    with each stage materialized behind a projection barrier.

    The barriers are load-bearing: spliced inline, `scale` sits INSIDE
    `q`'s per-element lambda, so the `array_max` scan it contains
    re-ran once per element — O(dim²) work per row; and `q` itself was
    re-evaluated once per consuming aggregate. Staged, each expression
    runs once per row. Same expressions, identical values."""
    d0 = emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        _dvec("embedding").alias("arr"),
    )
    d1 = d0.select(
        "vec_id",
        "n_dims",
        "arr",
        (
            F.greatest(
                F.array_max(F.transform(F.col("arr"), lambda x: F.abs(x))),
                F.lit(MIN_SCALE),
            )
            / F.lit(127.0)
        ).alias("scale"),
    )
    return d1.select(
        "vec_id",
        "n_dims",
        "arr",
        "scale",
        F.transform(
            F.col("arr"),
            lambda x: (
                F.floor(F.abs(x) / F.col("scale") + F.lit(0.5)) * F.signum(x)
            ).cast("long"),
        ).alias("q"),
    )


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round-half-away(x_i / scale) ∈ [-127, 127].

    Emits integer-exact audit columns (component sum and L1 norm of the
    quantized vector, scale in nano-units) rather than the raw
    ``ARRAY<TINYINT>`` — arrays don't canonicalize in the driver's
    value-hash (round 2's thumbnails lesson); the array-producing
    variant stays available by selecting ``q`` before the final
    projection. Staged via `_quant_rel` (see its barrier rationale)."""
    return _quant_rel(emb).select(
        "vec_id",
        "n_dims",
        F.floor(F.col("scale") * F.lit(1e9)).cast("long").alias("scale_nano"),
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("q_l1"),
    )


QUANTIZE_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS arr FROM embeddings
           WHERE {_EMB_GUARD}),
s AS (
  SELECT vec_id, embedding, arr,
         greatest(list_max(list_transform(arr, x -> abs(x))), {MIN_SCALE}) / 127.0 AS scale
  FROM e
),
qv AS (
  SELECT vec_id, embedding, arr, scale,
         list_transform(arr, x -> (floor(abs(x) / scale + 0.5) * sign(x))::BIGINT) AS q
  FROM s
)
SELECT vec_id, len(embedding)::BIGINT AS n_dims,
       floor(scale * 1e9)::BIGINT AS scale_nano,
       list_sum(q)::BIGINT AS q_sum,
       list_sum(list_transform(q, x -> abs(x)))::BIGINT AS q_l1
FROM qv
"""


def label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label component sums in exact integer micro-units.

    (label, pos 1-based, n_vecs, sum_micro) with
    sum_micro = Σ floor(x * 1e6) as BIGINT — order-independent, so the
    result is bit-identical however Spark schedules the partial
    aggregates. Centroid value = sum_micro / (n_vecs * 1e6), within
    1e-6 of the float mean."""
    exploded = posexplode_nonnull(emb, ["label"], _dvec("embedding"), "pos0", "x")
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.floor(F.col("x") * F.lit(1e6))).alias("sum_micro"),
        )
    )


CENTROIDS_ORACLE = f"""
WITH e AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1)::BIGINT AS pos
  FROM embeddings
  WHERE {_EMB_GUARD}
)
SELECT label, pos, COUNT(*)::BIGINT AS n_vecs,
       SUM(floor(x * 1e6)::BIGINT)::BIGINT AS sum_micro
FROM e GROUP BY 1, 2
"""


N_QUERIES = 10  # probe convention shared with operators/similarity
TOP_K = 5


def _quantized_with_norm(emb: DataFrame) -> DataFrame:
    """(vec_id, q ARRAY<BIGINT>, qn2 = Σq² BIGINT) — the compressed
    search relation. Scales cancel out of quantized cosine, so they are
    not carried. Staged via `_quant_rel` (see its barrier rationale)."""
    return _quant_rel(emb).select(
        "vec_id",
        "q",
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x * x
        ).alias("qn2"),
    )


def int8_cosine_topk(emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Top-k neighbors by QUANTIZED cosine: cos_q = Σ qa·qb /
    (√Σqa² · √Σqb²). The per-vector scale factors cancel, so the score
    is a pure function of the int8 codes — numerator and both norms are
    exact BIGINT aggregates, making the score deterministic across
    engines (one double division + sqrt on identical integers), unlike
    float-accumulated cosine.

    The 100 TB story: the search relation is int8 codes — 4× smaller
    than float32, 8× smaller than the double-cast scan the exact path
    reads, which is the difference between a corpus that fits executor
    memory and one that spills. Probe side broadcasts (|Q| small);
    work is O(|Q|·N) over integer multiplies. Recall vs exact cosine is
    bounds-tested in tests/test_quality_pii_vectors.py."""
    from pyspark.sql.window import Window

    qrel = _quantized_with_norm(emb)
    probes = qrel.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qa"), F.col("qn2").alias("na")
    )
    corpus = qrel.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("qb"), F.col("qn2").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = corpus.join(
        F.broadcast(probes), F.col("neighbor_id") != F.col("query_id")
    ).withColumn(
        "qcos",
        F.round(dot / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))), 6),
    )
    # two-stage per-query rank (grouped_topk): a query's candidate set
    # is corpus-scale, so it must never rank through one task
    return grouped_topk(
        scored,
        ["query_id"],
        (F.desc("qcos"), F.asc("neighbor_id")),
        k,
        salt_on="neighbor_id",
        rank_name="rnk",
    ).select("query_id", "rnk", "neighbor_id", "qcos")


INT8_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS arr FROM embeddings
           WHERE {_EMB_GUARD}),
s AS (
  SELECT vec_id, arr,
         greatest(list_max(list_transform(arr, x -> abs(x))), {MIN_SCALE}) / 127.0 AS scale
  FROM e
),
qrel AS (
  SELECT vec_id,
         list_transform(arr, x -> (floor(abs(x) / scale + 0.5) * sign(x))::BIGINT) AS q
  FROM s
),
qn AS (
  SELECT vec_id, q, list_sum(list_transform(q, x -> x * x))::BIGINT AS qn2 FROM qrel
),
pairs AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(p.q)),
                                   i -> p.q[i] * c.q[i]))::BIGINT
           / (sqrt(p.qn2) * sqrt(c.qn2)), 6) AS qcos
  FROM qn p JOIN qn c ON c.vec_id <> p.vec_id
  WHERE p.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, qcos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY qcos DESC, neighbor_id ASC) AS rnk
  FROM pairs
)
SELECT query_id, rnk::BIGINT AS rnk, neighbor_id, qcos
FROM ranked WHERE rnk <= {TOP_K}
"""


def embedding_norms_arrow(emb: DataFrame) -> DataFrame:
    """(vec_id, n_dims, l2_norm) via mapInArrow — the zero-copy Arrow
    batch surface (one step lower-level than pandas UDFs: no Series
    materialization, numpy views straight over Arrow buffers).

    The norm is per-row float math rounded to 6 decimals, so numpy's
    pairwise summation and the oracle's sequential list_sum agree
    (both are ~1 ulp of each other on unit-scale embeddings).
    Shuffle-free: a pure batch-wise projection at scan speed."""
    import pyarrow as pa

    def batches(it):
        for batch in it:
            vec_ids = batch.column("vec_id")
            embs = batch.column("embedding")
            norms, dims = [], []
            for row in embs:
                v = row.values.to_numpy(zero_copy_only=False).astype("float64")
                dims.append(len(v))
                norms.append(round(float((v * v).sum()) ** 0.5, 6))
            yield pa.record_batch(
                [vec_ids, pa.array(dims, pa.int32()), pa.array(norms, pa.float64())],
                names=["vec_id", "n_dims", "l2_norm"],
            )

    return emb.mapInArrow(batches, "vec_id long, n_dims int, l2_norm double")


NORMS_ORACLE = f"""
SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
       ROUND(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS l2_norm
FROM embeddings
WHERE {_EMB_GUARD}
"""


def _emb(spark, sf_dir):
    return valid_embeddings(load_table(spark, sf_dir, "embeddings"))


VECTOR_QUERIES = [
    QueryDef("embedding_quantize_int8", lambda s, d: quantize_int8(_emb(s, d)), QUANTIZE_ORACLE),
    QueryDef("embedding_label_centroids", lambda s, d: label_centroids(_emb(s, d)), CENTROIDS_ORACLE),
    QueryDef("ann_int8_topk", lambda s, d: int8_cosine_topk(_emb(s, d)), INT8_TOPK_ORACLE),
    QueryDef("embedding_norms_arrow", lambda s, d: embedding_norms_arrow(_emb(s, d)), NORMS_ORACLE),
]
