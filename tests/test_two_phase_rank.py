"""`two_phase_rank` must be OUTPUT-IDENTICAL to the single
`row_number over (partition by keys order by ...)` window it replaces
— across NULL group keys, ties on the bucket boundary, groups smaller
than one bucket, and any bucket granularity. And the exact integer
ntile form derived from (rank, n) must match Spark's own NTILE,
including the front-loaded-remainder distribution (n=6,k=4 → sizes
2,2,1,1, NOT the even-spread 2,1,2,1 a naive floor((r-1)k/n)+1
gives)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apd_map_reduce_spark.queries.base import two_phase_rank


def _random_rows(seed: int, n: int):
    rng = random.Random(seed)
    langs = ["en", "zh", None, "fr"]
    return [
        (
            i,
            rng.choice(langs),
            # coarse values force ties; negatives cross bucket-0
            float(rng.randint(-250, 250)),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("seed,n,bucket_width", [(1, 400, 100), (2, 57, 7), (3, 400, 100000)])
@pytest.mark.parametrize("descending", [False, True])
def test_two_phase_rank_equals_window_row_number(spark, seed, n, bucket_width, descending):
    df = spark.createDataFrame(
        _random_rows(seed, n), "id LONG, lang STRING, val DOUBLE"
    )
    order = (
        (F.desc("val"), F.asc("id")) if descending else (F.asc("val"), F.asc("id"))
    )
    got = two_phase_rank(
        df,
        ["lang"],
        order,
        bucket=F.floor(F.col("val") / bucket_width).cast("long"),
        bucket_desc=descending,
        rank_name="rnk",
        n_name="n",
    )
    w = Window.partitionBy("lang").orderBy(*order)
    want = df.withColumn("rnk", F.row_number().over(w).cast("long")).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("lang")).cast("long")
    )
    cols = ["id", "lang", "val", "rnk", "n"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


@pytest.mark.parametrize("sizes", [[1, 2, 3, 4, 5, 6, 7, 8, 9, 100], [4], [3]])
def test_exact_ntile_formula_matches_spark_ntile(spark, sizes):
    """Exercise every remainder case around k=4, including n < k."""
    rows = []
    for g, size in enumerate(sizes):
        rows += [(g, i) for i in range(size)]
    df = spark.createDataFrame(rows, "g LONG, v LONG")
    ranked = two_phase_rank(
        df,
        ["g"],
        (F.asc("v"),),
        bucket=F.expr("v div 3"),
        rank_name="_r",
        n_name="_n",
    )
    tile = F.expr(
        "CASE WHEN _r <= (_n % 4) * ((_n + 3) div 4)"
        " THEN (_r - 1) div ((_n + 3) div 4) + 1"
        " ELSE (_n % 4) + (_r - 1 - (_n % 4) * ((_n + 3) div 4)) div (_n div 4) + 1"
        " END"
    )
    got = ranked.select("g", "v", tile.cast("long").alias("t"))
    w = Window.partitionBy("g").orderBy(F.asc("v"))
    want = df.select("g", "v", F.ntile(4).over(w).cast("long").alias("t"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
