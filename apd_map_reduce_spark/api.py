"""SQL facade: register the star schema as temp views and run ANSI SQL
through Spark — the second front door for reference users (the first is
the DataFrame registry). `spark.sql` plans through the same Catalyst
pipeline, so every plan-quality property holds for SQL entry too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from apd_map_reduce_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Create/replace a temp view per table; returns the view names."""
    names = []
    for t in TABLES:
        name = f"{t}{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views then run the query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
