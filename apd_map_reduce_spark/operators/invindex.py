"""Inverted-index / document-frequency pipeline — the reference's one
built-in job, re-expressed Spark-first (SURVEY.md §0, §3.1).

Semantic contract (bit-exact vs the reference goldens):

    scan(file_id, line)
      → explode(split(line, '\\s+'))                      [S2]
      → lower(regexp_replace(token, '[^A-Za-z]', ''))     [P1]
      → filter word != ''                                 [P2]
      → groupBy(word).agg(sort_array(collect_set(file_id)),
                          df = size(...))                 [A1+A2+A3, X1-X3]
      → orderBy(df DESC, word ASC)                        [O1]
      → per-letter text sink 'word:[id1 id2 ...]'         [S4]

Physical plan (what Catalyst produces, verified via .explain):
FileScan text → Generate(explode) → Project/Filter →
ObjectHashAggregate(partial collect_set) → Exchange(hash by word) →
ObjectHashAggregate(final) → Sort → sink. The partial aggregation IS
the reference's per-mapper `map<word,set<int>>` combiner
(`tema1a/src/main.cpp:101-103`); the exchange IS its barrier+fetch
(`main.cpp:111-135`). Zero custom planning code.

Scale posture: the only global operation is the shuffle keyed by word
(high cardinality → even distribution; no skew risk akin to the
reference's 26-letter cap, SURVEY.md §6.3). The final per-letter sort
is done WITHIN letter partitions (repartition('letter') +
sortWithinPartitions), so no single-node global sort exists at 100 TB.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.plans.layout import explode_nonnull

from apd_map_reduce_spark.functions.text import tokenize_normalized

ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def words(corpus: DataFrame, id_col: str = "file_id", text_col: str = "line") -> DataFrame:
    """corpus(id, text) → (word, id): tokenize, normalize, drop empties.

    explode() after the array-level normalize keeps the per-token work
    inside whole-stage codegen and prunes empties before the shuffle.
    """
    # No spread() INSIDE words(): the tradeoff is input-layout-
    # dependent, so the CALLER owns it. The reference CLI path scans
    # 355 text files (≥ cores splits) where the exchange costs more
    # than it buys (A/B at sf0.1: 0.35 s direct vs 0.45 s spread); the
    # registry's parquet corpus is ONE row group per file, where the
    # unspread scan serializes the tokenize (r9 A/B: word count sf10
    # 17.6 s direct vs 2.5 s spread) — queries/corpus.py spreads at
    # its call sites, and the unspread-text-CPU plan gate enforces
    # that registry-wide. explode_nonnull so the optimizer's inferred
    # size-filter doesn't re-evaluate the tokenizer a second time
    # below the scan (plans/layout.py).
    return explode_nonnull(
        corpus, [F.col(id_col).alias("file_id")], tokenize_normalized(text_col), "word"
    ).select("word", "file_id")


def inverted_index(corpus: DataFrame, id_col: str = "file_id", text_col: str = "line") -> DataFrame:
    """Full index relation: DataFrame[word, file_ids ARRAY<>, df INT].

    `sort_array` is mandatory — `collect_set` order is nondeterministic
    (SURVEY.md §7.1 determinism invariant).
    """
    return (
        words(corpus, id_col, text_col)
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("file_id")).alias("file_ids"))
        .withColumn("df", F.size("file_ids"))
    )


def ranked_index(corpus: DataFrame, id_col: str = "file_id", text_col: str = "line") -> DataFrame:
    """Index ordered by the reference's two-key contract (df DESC, word ASC)."""
    return inverted_index(corpus, id_col, text_col).orderBy(F.desc("df"), F.asc("word"))


def format_rows(index: DataFrame) -> DataFrame:
    """Serialize rows to the sink line format `word:[id1 id2 ...]`
    (`tema1a/src/main.cpp:166-171`), keyed by first letter."""
    return index.select(
        F.substring("word", 1, 1).alias("letter"),
        F.col("df"),
        F.col("word"),
        F.concat(
            F.col("word"), F.lit(":["), F.array_join("file_ids", " "), F.lit("]")
        ).alias("text_line"),
    )


def write_letter_files(index: DataFrame, out_dir: str) -> None:
    """Partitioned text sink: one `<letter>.txt` per letter a-z, rows
    ordered (df DESC, word ASC) within each file; empty letters write
    empty files (superset behavior — SURVEY.md §5.2 decision).

    Spark-first layout: repartition by letter (26 tasks, one output
    partition each) + sortWithinPartitions — equivalent to the global
    sort because each file holds exactly one letter. At 100 TB you
    would keep `partitionBy('letter')` directories of part-files; the
    single-file-per-letter concat reproduces the reference's exact sink
    contract for the golden diff. (A driver-side toLocalIterator sink
    was tried and measured SLOWER — the global orderBy exchange plus
    serialized partition fetch costs more than the 26-task write.)
    """
    formatted = format_rows(index)
    tmp = out_dir.rstrip("/") + ".__spark_tmp__"
    (
        # Lead with `letter`: the partitioned-file writer requires its
        # input sorted by partition columns and would otherwise insert
        # its own (unstable) sort, clobbering the (df, word) order.
        # Explicit 26 partitions — the sink's natural key count, NOT
        # spark.sql.shuffle.partitions: the CLI sets shuffle.partitions
        # = R for the word aggregation, and letting the sink inherit
        # R=1/R=2 serialized the letter writes behind 1-2 tasks. Hash
        # partitioning 26 keys into 26 buckets collides (≈17 occupied
        # partitions, some tasks writing 2-3 letters), so this is NOT
        # strictly one-task-per-letter — but it still beats R tasks at
        # every (M,R) incl. sequential, and the collision-free
        # alternative (repartitionByRange(26, "letter")) was measured
        # SLOWER at both local[2]R1 (3.14 vs 3.00 min-of-4) and
        # local[6]R2 (1.81 vs 1.56): its range-boundary sampling job
        # costs more than the imbalance it removes at this scale.
        # Each letter still lands wholly in one partition either way,
        # so output bytes are identical (A/B diffed).
        formatted.repartition(26, "letter")
        .sortWithinPartitions(F.asc("letter"), F.desc("df"), F.asc("word"))
        .select("letter", "text_line")
        .write.mode("overwrite")
        .partitionBy("letter")
        .text(tmp)
    )
    os.makedirs(out_dir, exist_ok=True)
    for ch in ALPHABET:
        target = os.path.join(out_dir, f"{ch}.txt")
        part_dir = os.path.join(tmp, f"letter={ch}")
        with open(target, "w", encoding="utf-8") as out:
            if os.path.isdir(part_dir):
                parts = sorted(
                    f for f in os.listdir(part_dir) if f.startswith("part-")
                )
                for p in parts:
                    with open(os.path.join(part_dir, p), encoding="utf-8") as fh:
                        shutil.copyfileobj(fh, out)
    shutil.rmtree(tmp, ignore_errors=True)
