from apd_map_reduce_spark.sources.manifest import read_manifest, read_corpus
from apd_map_reduce_spark.sources.tables import load_table, load_tables, TABLES

__all__ = ["read_manifest", "read_corpus", "load_table", "load_tables", "TABLES"]
