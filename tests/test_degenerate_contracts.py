"""Degenerate-value contracts (DETERMINISM.md rules 35-38).

The full engine-vs-oracle sweep over the null-planted fixture lives in
scripts/gen_degenerate_tables.py + check_oracle (artifact:
ROBUSTNESS_r5.json — too slow for pytest). These tests pin the
individual contracts on tiny planted frames so a regression fails in
seconds, and pin the ENGINE FACTS the contracts exist for (if an
upgrade changes them, the rules need re-auditing).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_spark_size_null_is_minus_one_fact(spark):
    # The engine fact behind null_safe_size (rule 35). If this ever
    # returns NULL (ANSI default flip), the helper becomes a no-op —
    # harmless — but the audit note should be refreshed.
    row = spark.createDataFrame([(None,)], "a array<int>").select(
        F.size("a").alias("s")
    ).first()
    assert row.s == -1


def test_null_safe_size_contract(spark):
    from apd_map_reduce_spark.functions.text import null_safe_size

    df = spark.createDataFrame(
        [(1, None), (2, []), (3, ["x"])], "id long, a array<string>"
    )
    got = {r.id: r.s for r in df.select("id", null_safe_size(F.col("a")).alias("s")).collect()}
    assert got == {1: None, 2: 0, 3: 1}


def test_valid_embeddings_filters_garbage_keeps_zero_vector(spark):
    from apd_map_reduce_spark.functions.embeddings import valid_embeddings

    rows = [
        (1, [0.1] * 64),
        (2, None),
        (3, []),
        (4, [0.5] * 16),   # wrong dim
        (5, [0.0] * 64),   # zero vector: VALID by contract
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = {r.vec_id for r in valid_embeddings(emb).collect()}
    assert kept == {1, 5}


def test_lang_id_null_text_predicts_null(spark):
    from apd_map_reduce_spark.operators.textstats import lang_id, lang_id_ngram

    docs = spark.createDataFrame(
        [(1, None), (2, "the cat and the dog is a")], "doc_id long, text string"
    )
    got = {r.doc_id: r.pred_lang for r in lang_id(docs).collect()}
    assert got[1] is None and got[2] == "en"
    got = {r.doc_id: r.pred_lang for r in lang_id_ngram(docs).collect()}
    assert got[1] is None


def test_sessionize_ignores_null_ts_events(spark):
    # A NULL-ts event must change NOTHING: same sessions as the clean
    # stream (Spark would otherwise sort it FIRST, DuckDB LAST).
    from apd_map_reduce_spark.queries.base import QueryDef  # noqa: F401
    from apd_map_reduce_spark.queries.relational import events_sessionize  # noqa: F401

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + datetime.timedelta(minutes=5), 7, "view", 1.0, "{}"),
        (3, t0 + datetime.timedelta(hours=2), 7, "click", 1.0, "{}"),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    clean = spark.createDataFrame(rows, schema)
    dirty = spark.createDataFrame(rows + [(4, None, 7, "click", 1.0, "{}")], schema)

    def sess(e):
        # inline twin of events_sessionize's core (which loads from disk)
        from pyspark.sql.window import Window

        e = e.filter(F.col("ts").isNotNull())
        w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
        gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        flag = e.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
        )
        sid = flag.withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        return sorted(
            (r.user_id, r.session_seq, r.n)
            for r in sid.groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    assert sess(dirty) == sess(clean) == [(7, 1, 2), (7, 2, 1)]


def test_markov_excludes_null_states_and_null_ts(spark):
    from apd_map_reduce_spark.operators.intervals import markov_transitions

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a"),
        (2, t0 + datetime.timedelta(seconds=1), 7, None),
        (3, t0 + datetime.timedelta(seconds=2), 7, "b"),
        (4, None, 7, "c"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in markov_transitions(e).collect()
    }
    # null state and null-ts event removed → the surviving chain is a→b
    assert got == {("a", "b"): 1}


def test_behavior_features_survive_nat_and_nan(spark):
    from apd_map_reduce_spark.operators.behavior import user_behavior_features

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.25, "{}"),
        (2, t0 + datetime.timedelta(seconds=10), 7, "b", None, "{}"),
        (3, None, 7, None, 2.50, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    r = user_behavior_features(e).collect()[0]
    assert r.n_events == 3          # all rows counted
    assert r.n_types == 2           # NULL type not a type
    assert r.max_gap_us == 10_000_000  # NaT row contributes no gap
    assert abs(r.total_value - 3.75) < 1e-9  # NULL value skipped


def test_behavior_total_value_null_when_all_values_null(spark):
    # SUM over an all-NULL group is NULL, not 0 — the oracle's SUM
    # semantics; an empty dropna() must not collapse to 0.0.
    from apd_map_reduce_spark.operators.behavior import user_behavior_features

    t0 = datetime.datetime(2024, 1, 1)
    e = spark.createDataFrame(
        [(1, t0, 9, "a", None, "{}"), (2, t0, 9, "b", None, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    r = user_behavior_features(e).collect()[0]
    assert r.total_value is None


def test_fingerprint_contract_null_vs_empty(spark):
    from apd_map_reduce_spark.operators.textstats import doc_fingerprint

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "123 ,,")], "doc_id long, text string"
    )
    got = {r.doc_id: r.fingerprint for r in doc_fingerprint(docs).collect()}
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert got == {1: None, 2: empty_md5, 3: empty_md5}
