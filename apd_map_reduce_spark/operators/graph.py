"""Graph operators over relationally-derived edge lists: co-purchase
graph construction, degree distribution, and triangle counting.

Complements the iterative connected-components operator
(operators/components.py) with the other MapReduce-graph classic.

Scale design:
  * Edge construction fans out per order, and an order has at most a
    handful of line items, so the per-key pair blowup is bounded by
    (items/order choose 2) — never corpus-sized.
  * Triangle counting uses DEGREE ORIENTATION (the node-iterator++ /
    "graph twiddling" formulation): each undirected edge is directed
    from its lower-(degree, id) endpoint to the higher one, so every
    wedge is enumerated at its lowest-rank apex exactly once and
    per-node wedge fan-out is bounded by out-degree — which degree
    orientation caps at O(sqrt(|E|)) for any graph. The naive
    a<b<c formulation (the oracle) enumerates the same triangles but
    lets one high-degree hub generate deg^2 wedges; orientation is
    what survives a power-law graph at scale.
  * The closing-edge check is a keyed equi-join on the rank-ordered
    (v, w) pair — no inequality join, no cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.sources.tables import load_table

MIN_QUANTITY = 45  # selective filter: co-purchase of bulk line items


def copurchase_edges(lineitem: DataFrame, min_quantity: float = MIN_QUANTITY) -> DataFrame:
    """Undirected distinct edges (a < b) between parts that share an
    order, restricted to line items with quantity >= min_quantity."""
    items = (
        lineitem.filter(F.col("l_quantity") >= min_quantity)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x, y = items.alias("x"), items.alias("y")
    return (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
        .distinct()
    )


_EDGES_SQL = f"""
items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= {MIN_QUANTITY}
),
edges AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM items x JOIN items y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
)
"""


def degree_distribution(edges: DataFrame) -> DataFrame:
    """(degree, n_nodes): how many graph nodes have each degree."""
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


_DEGREE_ORACLE = f"""
WITH {_EDGES_SQL},
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges
  ) GROUP BY node
)
SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
"""


def triangle_count(edges: DataFrame) -> DataFrame:
    """One row (n_edges, n_triangles) via degree-oriented wedge join.

    Orientation: u -> v iff (deg(u), u) < (deg(v), v). Each triangle
    is counted exactly once, at its minimum-rank vertex."""
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ranked = edges.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    # Wedge (u; v, w) with rank(v) < rank(w): the closing edge, if it
    # exists, is oriented v -> w, so the closure check is an equi-join.
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (
            (F.col("o1.dv") < F.col("o2.dv"))
            | ((F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v")))
        ),
    ).select(F.col("o1.v").alias("cu"), F.col("o2.v").alias("cv"))
    closing = oriented.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    tri = wedges.join(closing, ["cu", "cv"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_edges.crossJoin(tri)


_TRIANGLE_ORACLE = f"""
WITH {_EDGES_SQL},
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges, n_triangles FROM tri
"""


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


GRAPH_QUERIES = [
    QueryDef(
        "graph_degree_distribution",
        lambda s, d: degree_distribution(copurchase_edges(_li(s, d))),
        _DEGREE_ORACLE,
    ),
    QueryDef(
        "graph_triangle_count",
        lambda s, d: triangle_count(copurchase_edges(_li(s, d))),
        _TRIANGLE_ORACLE,
    ),
]
