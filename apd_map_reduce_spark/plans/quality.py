"""Plan-quality introspection: the ".explain and iterate" discipline as
code (driver mandate: filters pushed to the scan, small sides
broadcast, expressions inside whole-stage codegen).

Used by tests/test_plan_quality.py to make plan regressions FAIL CI —
e.g. someone reordering q1 so the shipdate filter stops reaching the
parquet scan, or dropping a broadcast hint so a dim join becomes a
shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters lines from every scan node."""
    plan = formatted_plan(df)
    return "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    return column in pushed_filters(df)


def read_schema_columns(df: DataFrame) -> str:
    """ReadSchema lines — verifies column pruning reached the scan."""
    plan = formatted_plan(df)
    return "\n".join(ln for ln in plan.splitlines() if "ReadSchema" in ln)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def _iter_plan_nodes(node):
    """Depth-first walk of a JVM SparkPlan via py4j, descending into
    AQE wrappers (AdaptiveSparkPlanExec has no children; its pre-
    execution tree hangs off initialPlan) and reused-exchange stubs."""
    yield node
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _iter_plan_nodes(node.initialPlan())
        return
    children = node.children()
    for i in range(children.size()):
        yield from _iter_plan_nodes(children.apply(i))


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Names of physical window nodes whose partitionSpec is EMPTY —
    the shape that logs "No Partition Defined for Window operation!
    Moving all data to a single partition" and funnels the whole input
    relation through one task. The registry-wide gate asserts this
    list is empty for every query: a global ranking must either
    pre-prune (ranked_topk / two-stage top-k) or carry an explicit
    constant partition key documenting a provably-bounded input."""
    hits = []
    for node in _iter_plan_nodes(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls in (
            "WindowExec",
            "WindowInPandasExec",
            "WindowGroupLimitExec",
        ):
            if node.partitionSpec().isEmpty():
                hits.append(cls)
    return hits


def window_partition_arities(df: DataFrame) -> list[int]:
    """partitionSpec arity of every physical window node, in DFS order.
    Complements `unpartitioned_windows` for the KEYED hazard: a window
    partitioned by a data-independent-small key set (e.g. one language,
    one query_id) over an unbounded relation funnels corpus/|keys| rows
    through one task even though its partitionSpec is non-empty. The
    two-stage `grouped_topk` shape shows up here as one window with
    arity |keys|+1 (the salt) followed by one with arity |keys| over
    the ≤ n_salts·k survivors."""
    arities = []
    for node in _iter_plan_nodes(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls in ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"):
            arities.append(node.partitionSpec().size())
    return arities


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of distinct codegen stages (formatted explain tags nodes
    with `[codegen id : N]`)."""
    plan = formatted_plan(df)
    ids = {
        ln.split("codegen id :")[1].strip().rstrip("]")
        for ln in plan.splitlines()
        if "codegen id :" in ln
    }
    return len(ids)
