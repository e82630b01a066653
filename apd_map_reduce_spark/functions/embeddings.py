"""Embedding validity contract.

A 100 TB embedding table always contains garbage rows — NULL vectors
from failed encoders, empty arrays from truncated writes, wrong-dim
vectors from a mixed-model backfill. Every vector operator here
declares the same ingest contract: ONLY rows whose embedding is
non-null with exactly `dim` components participate; everything else is
excluded before any arithmetic. The guard is a plain filter (pushable,
no shuffle) and its SQL twin is textually identical in every oracle,
so engine parity holds on degenerate data instead of one engine
crashing (DuckDB's list_distance rejects NULLs / dim mismatches) while
the other silently ranks garbage.

Zero-vector rows are NOT excluded: they are valid fixed-dim input, and
each operator defines its own arithmetic for them (e.g. int8
quantization guards the max-abs scale with MIN_SCALE; cosine scores
against a zero norm yield NULL in both engines and fall out of ranked
results identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMBEDDING_DIM = 64


def valid_embeddings(emb: DataFrame, dim: int = EMBEDDING_DIM) -> DataFrame:
    """Rows with a non-null, exactly-`dim` embedding (see module doc)."""
    return emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == dim)
    )


def valid_embeddings_sql(dim: int = EMBEDDING_DIM) -> str:
    """The oracle twin: a WHERE fragment over the raw table columns."""
    return f"embedding IS NOT NULL AND len(embedding) = {dim}"
