"""Zero-extra-pass pipeline accounting via `DataFrame.observe`.

A cleaning pipeline wants per-gate numbers (rows in, rows dropped,
token totals) — but at 100 TB a `.count()` per gate RE-RUNS the whole
upstream DAG per metric, and caching a corpus-sized intermediate just
to count it spends cluster memory on bookkeeping. Spark's Observation
API attaches aggregate expressions to a plan node and collects them as
a side effect of the ONE action the pipeline already runs (the final
write): metrics cost zero additional scans and zero caching.

Semantics: metrics materialize when an action executes the observed
plan node. `Observation.get` blocks until the first action completes;
each observed DataFrame needs its own Observation object, and metrics
reflect the rows that actually flowed through that node during the
action (for a batch write, exactly the relation's rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate `metrics` to `df`'s plan.

    Returns (df', observation): run any ONE action on df' (or a plan
    containing it), then read `observation.get` — a dict keyed by the
    keyword names. Example::

        gated, obs = observed(
            gated, "quality_gate",
            n_docs=F.count(F.lit(1)),
            n_tokens=F.sum("n_tokens"),
        )
        gated.write.parquet(out)      # the action the pipeline runs anyway
        print(obs.get)                # {'n_docs': ..., 'n_tokens': ...}
    """
    obs = Observation(name)
    return (
        df.observe(obs, *[c.alias(n) for n, c in metrics.items()]),
        obs,
    )


def observed_stream(df: DataFrame, name: str, **metrics: Column) -> DataFrame:
    """The streaming flavor: `Observation` objects reject streaming
    Datasets (one value can't represent many micro-batches), so the
    string-named `observe` is used and the per-trigger values surface
    in each StreamingQueryProgress under ``observedMetrics[name]``
    (read ``query.lastProgress`` / ``recentProgress`` or a
    StreamingQueryListener). Same zero-extra-pass property: metrics
    ride the micro-batch the sink already executes."""
    return df.observe(name, *[c.alias(n) for n, c in metrics.items()])
