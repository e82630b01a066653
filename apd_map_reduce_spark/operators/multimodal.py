"""Multimodal column plumbing: opaque binary payloads + typed metadata
(driver mandate).

The real pipeline shape at 100 TB: `spark.read.format("binaryFile")`
(or parquet with a binary column) → `mapInPandas` feature extraction in
Arrow batches → typed metadata columns. The image/audio codecs are NOT
in this container, so `decode_image` is a clearly-marked stub; the
Spark-side plumbing — schema, batch iteration, partitioning — is real
and oracle-checked via deterministic byte-level features.

Why mapInPandas (not a scalar UDF): batches arrive as Arrow buffers, so
bytes never materialize row-at-a-time in Python; one python worker per
partition streams batches — the same shape a real decoder needs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.sources.tables import load_table

META_SCHEMA = (
    "doc_id LONG, n_bytes INT, content_hash STRING, fake_width INT, fake_height INT"
)


def decode_image(payload: bytes) -> "object":
    """Stub: real decode needs PIL/libvips, not present in this
    container. The plumbing around it (binary → metadata) is real."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires PIL/libvips; not available in this environment"
        ) from exc
    raise NotImplementedError("real decode path reserved for codec-enabled clusters")


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over a binary column.

    Deterministic fake decode: byte length + md5 + synthetic dimensions
    derived from the byte length (stands in for width/height a codec
    would return)."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "content_hash": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": (n_bytes % 640).astype("int32"),
                "fake_height": ((n_bytes * 7) % 480).astype("int32"),
            }
        )


def multimodal_metadata(docs: DataFrame) -> DataFrame:
    """Binary-column pipeline: text → utf-8 payload (stand-in for image
    bytes) → mapInPandas metadata extraction."""
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return binary.mapInPandas(_extract_meta, META_SCHEMA)


MULTIMODAL_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_hash,
       octet_length(encode(text)) % 640 AS fake_width,
       (octet_length(encode(text)) * 7) % 480 AS fake_height
FROM documents
"""


MULTIMODAL_QUERIES = [
    QueryDef(
        "multimodal_metadata",
        lambda s, d: multimodal_metadata(load_table(s, d, "documents")),
        MULTIMODAL_ORACLE,
    ),
]
