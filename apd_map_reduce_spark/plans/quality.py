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


# Columns whose cardinality is a property of the DOMAIN, not the data
# volume: languages, nations, market segments, part types/brands,
# return/status flags, sources, shard/band/query-id constants. A window
# partitioned ONLY by these funnels an unbounded fraction of its input
# (corpus/|values|) through one task at 100 TB even though its
# partitionSpec is non-empty — the class the r7 per-query sweeps missed
# three rounds running (stratified_sample, pack_token_shards, q2,
# above_nation_avg, ntile, percent_rank).
SMALL_CARDINALITY_COLS = frozenset(
    {
        "lang",
        "source",
        "split",
        "shard",
        "band",
        "label",
        "query_id",
        "event_type",
        "c_nationkey",
        "s_nationkey",
        "n_nationkey",
        "n_regionkey",
        "n_name",
        "r_name",
        "c_mktsegment",
        "p_type",
        "p_brand",
        "p_size",
        "p_container",
        "l_returnflag",
        "l_linestatus",
        "l_shipmode",
        "o_orderstatus",
        "o_orderpriority",
    }
)

_AGG_NODE_CLASSES = (
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
)
_WINDOW_NODE_CLASSES = ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec")


def _expr_key_names(spec) -> list[str]:
    """Names of a partitionSpec / grouping Seq's expressions: bare
    attribute references resolve to their column name; anything
    composite (pmod salt, div block, hash keys) becomes an <expr:...>
    marker — composite keys are by construction not in the
    small-cardinality column set."""
    import re

    names = []
    for i in range(spec.size()):
        s = spec.apply(i).toString()
        m = re.fullmatch(r"([A-Za-z_][A-Za-z0-9_]*)#\d+[A-Za-z]*", s)
        names.append(m.group(1) if m else f"<expr:{s[:48]}>")
    return names


def _subtree_agg_groupings(node) -> list[set[str]]:
    out = []
    for n in _iter_plan_nodes(node):
        if n.getClass().getSimpleName() in _AGG_NODE_CLASSES:
            out.append(set(_expr_key_names(n.groupingExpressions())))
    return out


def _subtree_window_keysets(node) -> list[set[str]]:
    """partitionSpec key-name sets of every window node STRICTLY BELOW
    `node` (node itself excluded) — the scope in which a salted
    grouped_topk stage can legitimately exempt its final ranking
    window. Plan-global matching would let a salted window in one
    branch of a composite plan exempt an unrelated bare small-key
    window in another branch (a gate false-negative)."""
    out = []
    for n in _iter_plan_nodes(node):
        if n is node:
            continue
        if n.getClass().getSimpleName() in _WINDOW_NODE_CLASSES:
            out.append(set(_expr_key_names(n.partitionSpec())))
    return out


def small_key_window_hazards(
    df: DataFrame, small: frozenset[str] = SMALL_CARDINALITY_COLS
) -> list[tuple[str, tuple[str, ...]]]:
    """Physical window nodes partitioned ONLY by known-small-cardinality
    columns over an input that is not provably reduced — the keyed
    scale hazard (corpus/|values| rows through one task at 100 TB).

    Two structural exemptions encode the repo's sanctioned shapes:

    * SALTED STAGE BELOW (the `grouped_topk` two-stage top-k): a
      window in this window's CHILD SUBTREE partitions by a strict
      superset of this window's keys (keys + the salt expression) —
      the flagged window then ranks only the ≤ n_salts·k survivors of
      the salted stage. Subtree-scoped (not plan-global) so a salted
      branch of a composite plan cannot exempt an unrelated bare
      small-key window in another branch.
    * AGGREGATED INPUT (the two-level prefix-sum / `two_phase_rank`
      offsets): somewhere below the window an aggregation groups by a
      strict superset of the window's keys (keys + block/bucket), so
      the window's input relation is the per-(key, block) aggregate,
      reduced by the block factor, not the raw corpus.

    Anything else must be whitelisted BY NAME in the registry-wide
    test with a bounded-input justification."""
    plan_windows = []
    for node in _iter_plan_nodes(df._jdf.queryExecution().executedPlan()):
        if node.getClass().getSimpleName() in _WINDOW_NODE_CLASSES:
            plan_windows.append(
                (node.getClass().getSimpleName(), _expr_key_names(node.partitionSpec()), node)
            )
    hazards = []
    for cls, names, node in plan_windows:
        if not names:
            continue  # the unpartitioned-window gate owns this case
        keyset = set(names)
        if not keyset <= small:
            continue
        if any(keyset < other for other in _subtree_window_keysets(node)):
            continue  # salted stage below (grouped_topk final ranking)
        if any(keyset < g for g in _subtree_agg_groupings(node)):
            continue  # aggregated (block-reduced) input
        hazards.append((cls, tuple(names)))
    return hazards


def small_key_shuffle_join_hazards(
    df: DataFrame, small: frozenset[str] = SMALL_CARDINALITY_COLS
) -> list[tuple[str, tuple[str, ...]]]:
    """The JOIN analog of `small_key_window_hazards`: SHUFFLE joins
    (SortMergeJoin / ShuffledHashJoin) whose equi-keys are ONLY
    known-small-cardinality columns. Such a join shuffles BOTH sides
    onto |values| effective key groups — corpus/|values| rows through
    one task pair at 100 TB, plus guaranteed skew. The sanctioned
    shape is a broadcast join (BroadcastHashJoin is exempt by node
    type: the streamed side keeps its partitioning, no shuffle on the
    small key) — every small-dimension enrichment in the registry
    (per-lang thresholds, per-type minima, per-nation averages)
    already broadcasts, so this gate locks the property rather than
    fixing extant hazards (sweep at adoption: zero hits over all 174
    queries)."""
    hazards = []
    for node in _iter_plan_nodes(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls in ("SortMergeJoinExec", "ShuffledHashJoinExec"):
            names = _expr_key_names(node.leftKeys())
            if names and set(names) <= small:
                hazards.append((cls, tuple(names)))
    return hazards


def unbounded_collect_agg_hazards(
    df: DataFrame, small: frozenset[str] = SMALL_CARDINALITY_COLS
) -> list[tuple[str, tuple[str, ...]]]:
    """Aggregates whose PER-GROUP STATE grows with the corpus
    (collect_set / collect_list) over a group key that is empty or
    only small-cardinality columns: each of the |values| groups
    accumulates an O(corpus/|values|) in-memory array in one task.
    Grouping by a data-proportional key (word, doc_id, digest) is
    fine — per-group state stays bounded by per-key density — and is
    not flagged. Sweep at adoption: zero hits over all 174 queries
    (the inverted index groups by word; the sharded twins bound even
    hot words)."""
    hazards = []
    for node in _iter_plan_nodes(df._jdf.queryExecution().executedPlan()):
        if node.getClass().getSimpleName() not in _AGG_NODE_CLASSES:
            continue
        aggs = node.aggregateExpressions()
        has_collect = any(
            "collect_set" in aggs.apply(i).toString()
            or "collect_list" in aggs.apply(i).toString()
            for i in range(aggs.size())
        )
        if not has_collect:
            continue
        names = _expr_key_names(node.groupingExpressions())
        if not names or set(names) <= small:
            hazards.append(("collect_agg", tuple(names)))
    return hazards


# Regexp-class expressions: the CPU-dense text work (the tokenizer's
# split+regexp_replace chain, regexp feature counters) whose per-row
# cost dwarfs the scan's IO cost. Cheap per-row hashing (a bare md5
# digest feeding a groupBy/join) is deliberately NOT in this set:
# spreading it would shuffle the full text round-robin to parallelize
# a ~µs hash that the very next keyed shuffle redistributes anyway.
_TEXT_CPU_MARKERS = (
    "regexp_replace(",
    "regexp_count(",
    "regexp_extract_all(",
)


def _project_reaches_text_scan_unspread(node) -> bool:
    """True if `node`'s subtree reaches a file scan that reads the
    `text` column WITHOUT crossing any exchange or cached-relation
    boundary — i.e. the projection's per-row work executes inside the
    scan stage, inheriting the scan's split count (possibly 1)."""
    cls = node.getClass().getSimpleName()
    if "Exchange" in cls or cls.startswith("InMemoryTableScan"):
        return False
    if cls.startswith(("FileSourceScan", "BatchScan")):
        out = node.output()
        return any(
            out.apply(i).name() == "text" for i in range(out.size())
        )
    children = node.children()
    return any(
        _project_reaches_text_scan_unspread(children.apply(i))
        for i in range(children.size())
    )


def unspread_text_cpu_hazards(df: DataFrame) -> list[tuple[str, str]]:
    """Projections evaluating regexp-class text CPU in the SAME stage
    as the documents file scan (no exchange below) — the serialized-
    tokenize class the r9 sf10 adjudication caught: the fixture's
    documents.parquet is one row group, so the scan stage has ONE live
    task and the whole tokenize pass ran serially (pack_token_shards:
    med task 61 ms, max 23,299 ms at sf10; 5.8x wall after the fix).
    The sanctioned shape is `spread()` between the scan and the
    per-row-CPU projection (plans/layout.py) — column pruning keeps
    the heavy expression above the round-robin exchange, so the
    tokenizer parallelizes regardless of the input's split/row-group
    layout. The hazard is layout-REALIZED at runtime but
    plan-PREVENTABLE, which is what this gate locks.

    Environment pin: spread() plans its exchange only when the input
    has fewer partitions than defaultParallelism, so on a 1-core
    session the sanctioned shape compiles to a no-op and this gate
    would flag plans that are clean everywhere else. Detection
    therefore REQUIRES parallelism >= 2 (tests pin local[4]); a
    1-core session raises instead of returning unreliable results.

    Cached relations: an InMemoryTableScan is a safe boundary for the
    OUTER projection (reading the cache is not the file-scan stage),
    but the cache's own one-time materialization executes the cached
    plan verbatim — so each distinct cached plan is walked with the
    same detector, closing the false negative."""
    if df.sparkSession.sparkContext.defaultParallelism < 2:
        raise RuntimeError(
            "unspread_text_cpu_hazards needs defaultParallelism >= 2: "
            "spread() is a planned no-op on a 1-core session, so the "
            "detector cannot distinguish gated from hazardous plans "
            "(run the gate under local[>=2]; tests pin local[4])"
        )

    def _scan(root, hazards, seen_cached):
        for node in _iter_plan_nodes(root):
            cls = node.getClass().getSimpleName()
            if cls.startswith("InMemoryTableScan"):
                cached = node.relation().cachedPlan()
                if cached.id() not in seen_cached:
                    seen_cached.add(cached.id())
                    _scan(cached, hazards, seen_cached)
                continue
            if cls == "ProjectExec":
                plist = node.projectList()
                exprs = "; ".join(
                    plist.apply(i).toString() for i in range(plist.size())
                )
            elif cls == "GenerateExec":  # tokenizer inlined into explode
                exprs = node.generator().toString()
            else:
                continue
            if not any(m in exprs for m in _TEXT_CPU_MARKERS):
                continue
            if _project_reaches_text_scan_unspread(node):
                marker = next(m for m in _TEXT_CPU_MARKERS if m in exprs)
                hazards.append((cls, marker.rstrip("(")))

    hazards: list[tuple[str, str]] = []
    _scan(df._jdf.queryExecution().executedPlan(), hazards, set())
    return hazards


def plan_scale_hazards(df: DataFrame) -> dict[str, list]:
    """Every structural 100 TB hazard class over ONE planned
    DataFrame (planning dominates; the class walks share the cached
    queryExecution): unpartitioned windows, small-key windows over
    unreduced input, small-key shuffle joins, unbounded collect
    aggregation state, and text-CPU projections inside the scan
    stage. Returns only the non-empty classes — the registry-wide
    gate asserts the dict is empty."""
    out = {
        "unpartitioned_windows": unpartitioned_windows(df),
        "small_key_windows": small_key_window_hazards(df),
        "small_key_shuffle_joins": small_key_shuffle_join_hazards(df),
        "unbounded_collect_aggs": unbounded_collect_agg_hazards(df),
        "unspread_text_cpu": unspread_text_cpu_hazards(df),
    }
    return {k: v for k, v in out.items() if v}


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
