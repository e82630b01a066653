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


JACCARD_E6_MIN = 200_000  # keep pairs with Jaccard >= 0.2


def item_jaccard(lineitem: DataFrame, min_quantity: float = MIN_QUANTITY,
                 min_jaccard_e6: int = JACCARD_E6_MIN) -> DataFrame:
    """Item-item collaborative-filtering similarity: for every part
    pair sharing an order, Jaccard over their order SETS —
    |orders(a) ∩ orders(b)| / |orders(a) ∪ orders(b)| — reported as a
    fixed-point integer ``jaccard_e6 = (co * 1e6) div union`` so the
    value is engine-exact (no float rounding boundary at all).

    Scale: candidate pairs come only from the per-order self-join
    (fan-out bounded by items-per-order choose 2, never corpus-sized);
    co-counts and per-part degrees are two keyed aggregations; the
    degree relation is part-cardinality-sized, joined by key. This is
    the classic "similarity via co-occurrence counts" MapReduce shape —
    no all-pairs join over the catalog ever exists.
    """
    items = (
        lineitem.filter(F.col("l_quantity") >= min_quantity)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x, y = items.alias("x"), items.alias("y")
    co = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("co_orders"))
    )
    deg = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("l_partkey").alias("part_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("l_partkey").alias("part_b"), F.col("deg").alias("db"))
    return (
        co.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "co_orders",
            F.expr("(co_orders * 1000000) div (da + db - co_orders)").alias(
                "jaccard_e6"
            ),
        )
        .filter(F.col("jaccard_e6") >= min_jaccard_e6)
    )


_JACCARD_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= {MIN_QUANTITY}
),
co AS (
  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b, COUNT(*) AS co_orders
  FROM items x JOIN items y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
),
deg AS (SELECT l_partkey, COUNT(*) AS deg FROM items GROUP BY 1)
SELECT co.part_a, co.part_b, co.co_orders,
       (co.co_orders * 1000000) // (a.deg + b.deg - co.co_orders) AS jaccard_e6
FROM co JOIN deg a ON a.l_partkey = co.part_a
        JOIN deg b ON b.l_partkey = co.part_b
WHERE (co.co_orders * 1000000) // (a.deg + b.deg - co.co_orders) >= {JACCARD_E6_MIN}
"""


RULE_MIN_CONF_E6 = 300_000  # keep rules with confidence >= 0.3


def assoc_rules(lineitem: DataFrame, min_quantity: float = MIN_QUANTITY,
                min_conf_e6: int = RULE_MIN_CONF_E6) -> DataFrame:
    """Directional association rules a -> b over order baskets
    (Apriori at pair depth): support = co/N, confidence = co/deg(a),
    lift = confidence / (deg(b)/N). All three reported as fixed-point
    integers; lift is spelled ``(conf_e6 * N) div deg_b`` IDENTICALLY
    in both engines, so the integer truncation is part of the declared
    semantics rather than a float boundary.

    Scale: same bounded per-order pair fan-out as the co-purchase
    graph; both rule directions come from one symmetric expansion of
    the a<b co-count relation (no second self-join)."""
    items = (
        lineitem.filter(F.col("l_quantity") >= min_quantity)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x, y = items.alias("x"), items.alias("y")
    co = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    both = co.unionAll(
        co.select(F.col("b").alias("a"), F.col("a").alias("b"), "co")
    )
    deg = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("deg"))
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    da = deg.select(F.col("l_partkey").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("l_partkey").alias("b"), F.col("deg").alias("deg_b"))
    return (
        both.join(da, "a")
        .join(db, "b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            F.col("co").alias("co_orders"),
            F.expr("(co * 1000000) div n_orders").alias("support_e6"),
            F.expr("(co * 1000000) div deg_a").alias("confidence_e6"),
            F.expr("(((co * 1000000) div deg_a) * n_orders) div deg_b").alias(
                "lift_e6"
            ),
        )
        .filter(F.col("confidence_e6") >= min_conf_e6)
    )


_RULES_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= {MIN_QUANTITY}
),
co AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS co
  FROM items x JOIN items y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
),
bidir AS (
  SELECT a, b, co FROM co UNION ALL SELECT b AS a, a AS b, co FROM co
),
deg AS (SELECT l_partkey, COUNT(*) AS deg FROM items GROUP BY 1),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items)
SELECT bidir.a AS antecedent, bidir.b AS consequent, bidir.co AS co_orders,
       (bidir.co * 1000000) // n.n_orders AS support_e6,
       (bidir.co * 1000000) // da.deg AS confidence_e6,
       (((bidir.co * 1000000) // da.deg) * n.n_orders) // db.deg AS lift_e6
FROM bidir
JOIN deg da ON da.l_partkey = bidir.a
JOIN deg db ON db.l_partkey = bidir.b
CROSS JOIN n
WHERE (bidir.co * 1000000) // da.deg >= {RULE_MIN_CONF_E6}
"""


PR_SCALE = 10**12  # rank fixed-point scale
PR_ITERS = 5
PR_TOPK = 20


def pagerank_topk(
    edges: DataFrame, iters: int = PR_ITERS, k: int = PR_TOPK
) -> DataFrame:
    """Top-k PageRank over the undirected graph (each edge doubled into
    two directed edges), damping 0.85, computed in SCALED INTEGER
    arithmetic: rank is an int64 fixed-point value (scale 10^12) and
    each per-edge contribution is ``(rank * 85) div (100 * deg)``.
    Integer ops make the fixpoint order-free and engine-exact — a
    float PageRank could not be hash-compared across engines because
    SUM over doubles is order-dependent in the last ulp.

    Scale posture: the driver loop is Pregel-style supersteps — per
    iteration one keyed join (edges x ranks) + one groupBy(dst); the
    out-degree relation is cached once and reused; no collect of
    anything O(N) (only COUNT for the teleport constant). Every node
    of this graph has deg >= 1, so there is no dangling mass.

    Iteration shape (r13, measured 4.5-4.7x at sf0.01 and sf1):
      * The doubled edge list is ONE explode over `edges`, not
        `select ∪ select` — the union form evaluates the co-purchase
        self-join pipeline once per branch.
      * Because the graph is undirected and every node has deg >= 1,
        every node has in-degree >= 1, so groupBy(dst) over the
        contribution stream already covers EVERY node — the per-round
        `nodes LEFT JOIN contrib` + coalesce(in_mass, 0) was a no-op
        re-keying of the same rows and is gone; teleport is added
        directly on the aggregated stream. One join + one agg per
        iteration, and the rank relation stays hash-partitioned on the
        node key coming out of each round's agg exchange.
      * `out` is hash-partitioned on `src` before the cache so no
        iteration re-shuffles the O(|E|) side (InMemoryRelation
        preserves outputPartitioning; the degree join also zips on the
        same exchange instead of shuffling twice).
    """
    sc = edges.sparkSession.sparkContext
    both_dirs = F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
    )
    directed = (
        edges.select(F.explode(both_dirs).alias("e"))
        .select("e.src", "e.dst")
        .repartition(sc.defaultParallelism, "src")
    )
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    if n == 0:
        # empty graph: zero nodes would divide the teleport constant
        # by zero; the correct fixpoint is the empty ranking (guard
        # sits BEFORE the out-degree cache so the empty path never
        # registers an unused persisted relation)
        return deg.select(
            F.col("src").alias("part_node"),
            F.lit(0).cast("long").alias("rank_scaled"),
        )
    out = directed.join(deg, "src").cache()
    teleport = (15 * PR_SCALE // 100) // n
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE // n).cast("long").alias("rank")
    )
    for _ in range(iters):
        ranks = (
            out.join(ranks, out.src == ranks.node)
            .select(
                F.col("dst"),
                F.expr("(rank * 85) div (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(teleport).cast("long") + F.col("in_mass")).alias("rank"),
            )
        )
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(k)
        .select(F.col("node").alias("part_node"), F.col("rank").alias("rank_scaled"))
    )


def _pagerank_oracle(iters: int = PR_ITERS, k: int = PR_TOPK) -> str:
    """DuckDB twin: the same integer recurrence unrolled as a CTE chain
    (r0 -> s1/r1 -> ... -> r{iters}); `//` is DuckDB integer division,
    matching Spark's `div` on the all-positive operands here."""
    tele = 15 * PR_SCALE // 100
    ctes = [
        f"WITH {_EDGES_SQL}",
        "dir AS (SELECT a AS src, b AS dst FROM edges"
        " UNION ALL SELECT b AS src, a AS dst FROM edges)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM dir GROUP BY src)",
        "o AS (SELECT d.src, d.dst, g.deg FROM dir d JOIN deg g USING (src))",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        f"r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) // n AS rank"
        " FROM deg, nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"s{i} AS (SELECT o.dst, SUM((r.rank * 85) // (100 * o.deg)) AS m"
            f" FROM o JOIN r{i - 1} r ON r.node = o.src GROUP BY o.dst)"
        )
        # SUM(BIGINT) is HUGEINT in DuckDB — cast back so the final
        # column arrives as int64, matching Spark's LongType.
        ctes.append(
            f"r{i} AS (SELECT d.src AS node,"
            f" CAST((SELECT CAST({tele} AS BIGINT) // n FROM nn)"
            f" + COALESCE(s.m, 0) AS BIGINT) AS rank"
            f" FROM deg d LEFT JOIN s{i} s ON s.dst = d.src)"
        )
    return (
        ",\n".join(ctes)
        + f"\nSELECT node AS part_node, rank AS rank_scaled FROM r{iters}"
        + f" ORDER BY rank DESC, node ASC LIMIT {k}"
    )


PAGERANK_ORACLE = _pagerank_oracle()


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
    QueryDef(
        "graph_pagerank",
        lambda s, d: pagerank_topk(copurchase_edges(_li(s, d))),
        PAGERANK_ORACLE,
    ),
    QueryDef(
        "graph_item_jaccard",
        lambda s, d: item_jaccard(_li(s, d)),
        _JACCARD_ORACLE,
    ),
    QueryDef(
        "graph_assoc_rules",
        lambda s, d: assoc_rules(_li(s, d)),
        _RULES_ORACLE,
    ),
]
