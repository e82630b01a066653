"""Streaming near-dup-screened ingestion — the live-arrival story.

Files land in a corpus directory; an append-only manifest (the
reference's format: line 1 = N, then N paths) records arrival order.
The engine tails the manifest with the custom format('corpus') stream
source (wholetext mode → one row per file = one document, manifest
ordinal = doc_id) and, per micro-batch:

    new docs → MinHash signatures → band keys
             → candidates vs the PERSISTED corpus LSH index
             → exact-Jaccard verify → flagged matches appended
             → the new docs' shingles+bands appended to the index

so every document is screened against everything that arrived before
it, without ever rescanning the corpus — the index carries ~24 band
rows + the shingle set per doc, not the text.

The demo plants near-duplicates in the second wave of arrivals and
shows they are flagged against their first-wave originals, across a
stop/restart of the query (state lives in the checkpoint + index,
not the process).

Run:  python examples/streaming_ingest.py [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

WAVE1 = {
    1: "the quick brown fox jumps over the lazy dog near the old river bank today",
    2: "spark plans queries declaratively and the optimizer chooses physical strategies",
    3: "streaming ingestion screens every arriving document against the corpus index",
}
# 4 ≈ near-dup of 1 (one word changed), 5 distinct, 6 ≈ near-dup of 3
WAVE2 = {
    4: "the quick brown fox jumps over the lazy cat near the old river bank today",
    5: "completely different content about embedding tables and vector quantization",
    6: "streaming ingestion screens every arriving document against the corpus index twice",
}


def _write_wave(corpus_dir: str, manifest: str, docs: dict[int, str], total: dict) -> None:
    for doc_id, text in docs.items():
        with open(os.path.join(corpus_dir, f"doc{doc_id:03d}.txt"), "w") as fh:
            fh.write(text + "\n")
        total[doc_id] = os.path.join(corpus_dir, f"doc{doc_id:03d}.txt")
    with open(manifest, "w") as fh:
        fh.write(f"{len(total)}\n" + "\n".join(total[k] for k in sorted(total)) + "\n")


def main() -> int:
    from apd_map_reduce_spark.session import get_spark
    from apd_map_reduce_spark.sources.corpus_datasource import register_corpus_source
    from apd_map_reduce_spark.streaming.ingest_dedup import (
        neardup_ingest_stream,
        read_matches,
    )

    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/streaming_ingest_demo"
    shutil.rmtree(work, ignore_errors=True)
    corpus_dir = os.path.join(work, "corpus")
    os.makedirs(corpus_dir)
    manifest = os.path.join(work, "manifest.txt")
    index_path = os.path.join(work, "index")
    matches_path = os.path.join(work, "matches")
    checkpoint = os.path.join(work, "ckpt")

    spark = get_spark(app_name="streaming-ingest-demo")
    spark.sparkContext.setLogLevel("ERROR")
    register_corpus_source(spark)

    def start():
        docs = (
            spark.readStream.format("corpus")
            .option("wholetext", "true")
            .load(manifest)
            .select(
                F.col("file_id").cast("long").alias("doc_id"),
                F.col("line").alias("text"),
            )
        )
        # available_now=False: the Python source does not declare
        # availableNow; we drive with processAllAvailable instead
        return neardup_ingest_stream(
            docs, index_path, matches_path, checkpoint,
            threshold=0.5, available_now=False,
        )

    arrived: dict[int, str] = {}

    _write_wave(corpus_dir, manifest, WAVE1, arrived)
    q = start()
    q.processAllAvailable()
    q.stop()  # simulated shutdown between waves

    _write_wave(corpus_dir, manifest, WAVE2, arrived)
    q = start()  # restart from checkpoint: wave 1 is NOT re-ingested
    q.processAllAvailable()
    q.stop()

    matches = read_matches(spark, matches_path).orderBy("batch_doc")
    rows = matches.select("batch_doc", "corpus_doc", "jaccard").collect()
    print("flagged near-dups (batch_doc ~ corpus_doc):")
    for r in rows:
        print(f"  doc {r.batch_doc} ~ doc {r.corpus_doc}  jaccard={r.jaccard}")
    n_indexed = (
        spark.read.parquet(os.path.join(index_path, "bands"))
        .select("doc_id").distinct().count()
    )
    print(f"index now covers {n_indexed} docs at {index_path}")
    flagged = {(r.batch_doc, r.corpus_doc) for r in rows}
    assert (4, 1) in flagged and (6, 3) in flagged, flagged
    assert all(b != 5 for b, _ in flagged), "distinct doc must not be flagged"
    return 0


if __name__ == "__main__":
    sys.exit(main())
