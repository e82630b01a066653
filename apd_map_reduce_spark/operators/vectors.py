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

from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.sources.tables import load_table

# Floor of the quantization scale's magnitude: an all-zero vector would
# make scale 0 and 0/0 = NaN; 1e-12 maps it to all-zero int8s instead.
MIN_SCALE = 1e-12


def _dvec(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round-half-away(x_i / scale) ∈ [-127, 127].

    Emits integer-exact audit columns (component sum and L1 norm of the
    quantized vector, scale in nano-units) rather than the raw
    ``ARRAY<TINYINT>`` — arrays don't canonicalize in the driver's
    value-hash (round 2's thumbnails lesson); the array-producing
    variant stays available by selecting ``q`` before the final
    projection."""
    arr = _dvec("embedding")
    amax = F.array_max(F.transform(arr, lambda x: F.abs(x)))
    scale = F.greatest(amax, F.lit(MIN_SCALE)) / F.lit(127.0)
    q = F.transform(
        arr, lambda x: (F.floor(F.abs(x) / scale + F.lit(0.5)) * F.signum(x)).cast("long")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.floor(scale * F.lit(1e9)).cast("long").alias("scale_nano"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("q_l1"),
    )


QUANTIZE_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS arr FROM embeddings),
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
    exploded = emb.select("label", F.posexplode(_dvec("embedding")).alias("pos0", "x"))
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.floor(F.col("x") * F.lit(1e6))).alias("sum_micro"),
        )
    )


CENTROIDS_ORACLE = """
WITH e AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1)::BIGINT AS pos
  FROM embeddings
)
SELECT label, pos, COUNT(*)::BIGINT AS n_vecs,
       SUM(floor(x * 1e6)::BIGINT)::BIGINT AS sum_micro
FROM e GROUP BY 1, 2
"""


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


VECTOR_QUERIES = [
    QueryDef("embedding_quantize_int8", lambda s, d: quantize_int8(_emb(s, d)), QUANTIZE_ORACLE),
    QueryDef("embedding_label_centroids", lambda s, d: label_centroids(_emb(s, d)), CENTROIDS_ORACLE),
]
