"""The reference corpus as a first-class Spark data source (Python
Data Source API, Spark 4).

`spark.read.format("corpus").load(manifest)` reads the reference's
manifest format (line 1 = N, then N paths — `tema1a/src/main.cpp:188-200`)
straight into the engine's canonical corpus relation
DataFrame[file_id INT, line STRING], with the 1-based manifest ordinal
as the document identity (`main.cpp:103`) — the same contract as
`sources/manifest.py`'s reader composition, re-expressed as a source
the planner owns end-to-end:

  * one `InputPartition` per manifest file — the file IS the reference's
    work-queue granule (SURVEY.md §2.1 S3: mapper threads pull whole
    files off a shared queue; Spark's task scheduler plays the queue,
    one task per partition, stragglers rebalanced by the scheduler
    rather than a mutex).
  * the ordinal is carried INSIDE the partition value, so no
    `input_file_name()` → broadcast-join tag-back is needed at all —
    the join disappears from the plan, and with it the cold-start
    manifest `collect()`.
  * each partition yields ONE Arrow RecordBatch for its file (files are
    work-queue granules, small by the reference's data model — the
    64 MB split logic of a real file source is out of scope and
    documented as such).

This is the idiomatic Spark-4 surface for "teach the engine a custom
format"; the composition reader (`read_corpus`) remains the default
path (it rides the JVM-native text source — faster scans at scale),
and `tests/test_corpus_datasource.py` pins the two to identical
results, so the data source doubles as an independent check of the
ordinal-tagging contract.

Options:
  * path (positional via `.load(path)`): the manifest file.
  * wholetext ("true"/"false", default false): one row per FILE
    instead of per line — same pairing as `read_corpus_whole`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

CORPUS_SCHEMA = "file_id INT, line STRING"


@dataclass
class _FilePartition(InputPartition):
    file_id: int
    path: str


class CorpusDataSource(DataSource):
    """format("corpus") — manifest-driven text corpus with ordinal ids."""

    @classmethod
    def name(cls) -> str:
        return "corpus"

    def schema(self) -> str:
        return CORPUS_SCHEMA

    def reader(self, schema) -> "CorpusReader":
        return CorpusReader(self.options)


class CorpusReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError(
                "corpus source requires the manifest path: "
                "spark.read.format('corpus').load('<manifest>')"
            )
        self._manifest_path = path
        self._wholetext = str(options.get("wholetext", "false")).lower() == "true"

    def partitions(self) -> list[_FilePartition]:
        # Driver-side manifest parse (tiny by contract — O(file count)
        # lines); the ordinal rides in the partition value so executors
        # never need a tag-back join.
        from apd_map_reduce_spark.sources.manifest import parse_manifest

        return [
            _FilePartition(file_id, p)
            for file_id, p in parse_manifest(self._manifest_path)
        ]

    def read(self, partition: _FilePartition):
        import pyarrow as pa

        with open(partition.path, encoding="utf-8") as fh:
            text = fh.read()
        if self._wholetext:
            lines = [text]
        else:
            # match the JVM text source's record semantics: \n-separated,
            # trailing \r stripped (Hadoop LineRecordReader), final
            # newline does not produce an empty trailing record
            lines = [ln[:-1] if ln.endswith("\r") else ln for ln in text.split("\n")]
            if lines and lines[-1] == "":
                lines.pop()
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([partition.file_id] * len(lines), type=pa.int32()),
                pa.array(lines, type=pa.string()),
            ],
            names=["file_id", "line"],
        )


def register_corpus_source(spark) -> None:
    """Idempotent registration of format('corpus') on this session."""
    spark.dataSource.register(CorpusDataSource)
