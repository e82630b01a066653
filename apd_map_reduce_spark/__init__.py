"""apd_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine ``rusucarla/APD-Map-Reduce`` (a single-node pthreads
C++ MapReduce whose one built-in job is an inverted-index /
document-frequency pipeline — see ``SURVEY.md``), extended with the
relational and LLM-data-pipeline operators a 100 TB training-data
workload needs (dedup, similarity search, text analysis, multimodal
plumbing, streaming).

Design rules (SURVEY.md §7.1):
  * DataFrame/SQL only; Catalyst plans physically. No RDDs.
  * UDFs are the slow path: built-in ``pyspark.sql.functions`` first,
    Arrow-batched pandas UDFs when unavoidable, never row-at-a-time.
  * Every operator ships with a DuckDB-oracle SQL twin where the
    semantics are ANSI-expressible (driver correctness gate).
"""

__version__ = "0.1.0"
