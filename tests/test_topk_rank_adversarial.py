"""r8 verdict stretch #8: adversarial-distribution equivalence for the
two load-bearing ranking helpers.

`grouped_topk` and `two_phase_rank` carry eight registry queries; the
oracle gate checks them on the registry's data distributions, these
tests pin the corners the registry never exercises:

  * ALL-TIES on the bucket expression (every row in one bucket — the
    two-phase decomposition degenerates to the single window),
  * SINGLE MEGA-GROUP (one group holds everything; the salted stage is
    doing all the work),
  * NULL group keys (windows/groupBy treat NULL as a real group; the
    helpers' eqNullSafe joins must too),
  * k > group size (every row survives; ranks must still be dense 1..n),
  * k = 1 and n_salts > rows (degenerate salting: most salt cells
    empty),
  * duplicate order values with only the tie-break key distinguishing
    rows (rank assignment is then pure tie-break order).

Each case asserts bitwise row-set equality against the single-window
`row_number over (partition by keys order by ...)` form the helper
replaces, plus a hypothesis sweep over random shapes.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apd_map_reduce_spark.queries.base import grouped_topk, two_phase_rank


def _single_window_topk(df, keys, order, k, rank_name):
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_name, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_name) <= k)
    )


def _single_window_rank(df, keys, order, rank_name, n_name):
    w = Window.partitionBy(*keys).orderBy(*order)
    wn = Window.partitionBy(*keys)
    return df.withColumn(
        rank_name, F.row_number().over(w).cast("long")
    ).withColumn(n_name, F.count(F.lit(1)).over(wn))


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def _assert_same(got, want):
    g, w = _rows_set(got), _rows_set(want)
    assert g == w, f"only-in-got={sorted(g - w)[:5]} only-in-want={sorted(w - g)[:5]}"


# (label, rows [(id, grp, val)]) — adversarial shapes
CASES = {
    "single_mega_group": [(i, "en", float(i % 7)) for i in range(300)],
    "null_group_half": [
        (i, None if i % 2 else "en", float(i % 11)) for i in range(200)
    ],
    "all_null_groups": [(i, None, float(300 - i)) for i in range(150)],
    "all_order_ties": [(i, ["a", "b"][i % 2], 1.0) for i in range(200)],
    "tiny_groups": [(i, f"g{i}", float(i)) for i in range(50)],
}


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("k,n_salts", [(5, 32), (1, 32), (1000, 32), (5, 1), (5, 997)])
def test_grouped_topk_matches_single_window(spark, case, k, n_salts):
    df = spark.createDataFrame(CASES[case], "id LONG, grp STRING, val DOUBLE")
    order = (F.asc("val"), F.asc("id"))
    got = grouped_topk(
        df, ["grp"], order, k, salt_on="id", rank_name="rnk", n_salts=n_salts
    )
    want = _single_window_topk(df, ["grp"], order, k, "rnk")
    _assert_same(got.select("grp", "id", "rnk"), want.select("grp", "id", "rnk"))


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize(
    "bucket_fn",
    [
        # Column exprs built lazily — a live SparkContext only exists
        # inside the test, not at collection time.
        lambda: F.lit(0).cast("long") + F.floor(F.col("val") * 0),  # ALL-TIES
        lambda: F.floor(F.col("val") / 3).cast("long"),
        lambda: F.floor(F.col("val")).cast("long"),  # bucket == first sort key
    ],
    ids=["alltie_bucket", "coarse_bucket", "exact_bucket"],
)
def test_two_phase_rank_matches_single_window(spark, case, bucket_fn):
    df = spark.createDataFrame(CASES[case], "id LONG, grp STRING, val DOUBLE")
    order = (F.asc("val"), F.asc("id"))
    got = two_phase_rank(
        df, ["grp"], order, bucket=bucket_fn(), rank_name="rnk", n_name="n"
    )
    want = _single_window_rank(df, ["grp"], order, "rnk", "n")
    _assert_same(
        got.select("grp", "id", "rnk", "n"), want.select("grp", "id", "rnk", "n")
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "zh", None]),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=0,
        max_size=120,
    ),
    k=st.integers(min_value=1, max_value=12),
)
def test_grouped_topk_property(spark, rows, k):
    data = [(i, g, float(v)) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id LONG, grp STRING, val DOUBLE")
    order = (F.desc("val"), F.asc("id"))
    got = grouped_topk(df, ["grp"], order, k, salt_on="id", rank_name="rnk")
    want = _single_window_topk(df, ["grp"], order, k, "rnk")
    _assert_same(got.select("grp", "id", "rnk"), want.select("grp", "id", "rnk"))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", None]),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=0,
        max_size=120,
    ),
    width=st.sampled_from([1, 5, 1000]),
)
def test_two_phase_rank_property(spark, rows, width):
    data = [(i, g, float(v)) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id LONG, grp STRING, val DOUBLE")
    order = (F.asc("val"), F.asc("id"))
    got = two_phase_rank(
        df,
        ["grp"],
        order,
        bucket=F.floor(F.col("val") / width).cast("long"),
        rank_name="rnk",
        n_name="n",
    )
    want = _single_window_rank(df, ["grp"], order, "rnk", "n")
    _assert_same(
        got.select("grp", "id", "rnk", "n"), want.select("grp", "id", "rnk", "n")
    )
