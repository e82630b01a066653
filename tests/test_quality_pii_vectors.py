"""Unit tests for the quality / PII / vector operator families beyond
the registry-wide oracle parity (tests/test_oracle_parity.py covers the
registered queries end-to-end; these pin edge cases and the generic
redaction API on synthetic rows)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from apd_map_reduce_spark.operators.pii import redact_sql, redact_text
from apd_map_reduce_spark.operators.quality import max_run_length, repetition_signals
from apd_map_reduce_spark.operators.vectors import label_centroids, quantize_int8

REDACT_ROWS = [
    (1, "contact john.doe+x@mail-svc.co.uk or admin@x.io now"),
    (2, "server at 192.168.0.1 and 10.0.0.255 ping"),
    (3, "call +1 415-555-0199 or +44 20 7946 0958 today"),
    (4, "clean text no pii at all"),
    (5, ""),
]


def test_redact_text_matches_duckdb_twin(spark):
    df = spark.createDataFrame(REDACT_ROWS, ["id", "s"])
    got = {
        r["id"]: r["red"]
        for r in df.select("id", redact_text("s").alias("red")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", REDACT_ROWS)
    want = dict(con.execute(f"SELECT id, {redact_sql('s')} FROM t").fetchall())
    assert got == want
    assert "<EMAIL>" in got[1] and "@" not in got[1]
    assert got[2].count("<IP>") == 2
    assert got[3].count("<PHONE>") == 2
    assert got[4] == REDACT_ROWS[3][1]


def test_max_run_length_edges(spark):
    rows = [
        (1, ["a", "a", "a", "b"]),
        (2, ["a"]),
        (3, []),
        (4, ["a", "b", "b", "b", "b", "c", "c"]),
    ]
    df = spark.createDataFrame(rows, "id: long, arr: array<string>")
    got = {
        r["id"]: r["m"]
        for r in df.select("id", max_run_length(F.array_sort("arr")).alias("m")).collect()
    }
    assert got == {1: 3, 2: 1, 3: 0, 4: 4}


def test_repetition_signals_degenerate_doc(spark):
    # A pure repetition loop must stand out: top_bigram_frac -> 1.
    rows = [(1, "spam spam spam spam spam spam"), (2, "one two three four five six")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    assert out[1]["n_tokens"] == 6 and out[1]["n_distinct"] == 1
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[2]["distinct_token_ratio"] == 1.0 and out[2]["top_bigram_n"] == 1


def test_quantize_int8_bounds_and_zero_vector(spark):
    rows = [(1, [1.0, -2.0, 0.5, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {r["vec_id"]: r.asDict() for r in quantize_int8(df).collect()}
    # max|x|=2 -> scale=2/127; x=1.0 quantizes to round(63.5)=64, x=-2.0 to -127.
    assert out[1]["q_l1"] == 127 + 64 + 32
    assert out[1]["q_sum"] == -127 + 64 + 32
    # all-zero vector: MIN_SCALE floor keeps it finite and all-zero.
    assert out[2]["q_sum"] == 0 and out[2]["q_l1"] == 0


def test_int8_topk_recall_against_exact_cosine(spark):
    """Quantized cosine is an approximation — bound its recall@5
    against the exact float path (same pattern as the HLL/percentile
    sketch bounds tests)."""
    from apd_map_reduce_spark.operators.similarity import cosine_topk
    from apd_map_reduce_spark.operators.vectors import int8_cosine_topk
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in int8_cosine_topk(emb).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"int8 recall@5 degraded: {recall:.2f}"


def test_new_families_are_shuffle_free_and_pruned(spark):
    """quality/pii/quantize are per-row projections: no Exchange in the
    plan, scans pruned to the used columns — the scan-speed contract
    their docstrings claim."""
    from apd_map_reduce_spark.operators.pii import pseudonymize_events
    from apd_map_reduce_spark.operators.vectors import quantize_int8
    from apd_map_reduce_spark.plans.quality import formatted_plan, read_schema_columns
    from apd_map_reduce_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    cases = [
        (pseudonymize_events(load_table(spark, SF_SMOKE, "events")),
         {"present": ["event_id", "user_id", "props"], "absent": ["event_type", "value"]}),
        (quantize_int8(load_table(spark, SF_SMOKE, "embeddings")),
         {"present": ["vec_id", "embedding"], "absent": ["label"]}),
    ]
    for df, expect in cases:
        assert "Exchange" not in formatted_plan(df), "per-row operator must not shuffle"
        cols = read_schema_columns(df)
        for c in expect["present"]:
            assert c in cols
        for c in expect["absent"]:
            assert c not in cols, f"unused column {c} must be pruned"

    # repetition_signals deliberately SHUFFLES (explode -> groupBy stays
    # in codegen; the shuffle-free HOF fold was 27x slower — module
    # docstring) but must still prune the scan and partial-aggregate
    # map-side.
    rep = repetition_signals(load_table(spark, SF_SMOKE, "documents"))
    plan = formatted_plan(rep)
    assert "Exchange" in plan
    assert "partial_count" in plan or "partial" in plan.lower()
    cols = read_schema_columns(rep)
    assert "doc_id" in cols and "text" in cols
    assert "lang" not in cols and "source" not in cols


def test_label_centroids_exact_integer_sums(spark):
    rows = [(1, [1.5, -0.25], 7), (2, [0.5, 0.75], 7), (3, [2.0, 1.0], 8)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")
    out = {
        (r["label"], r["pos"]): (r["n_vecs"], r["sum_micro"])
        for r in label_centroids(df).collect()
    }
    assert out[(7, 1)] == (2, 2_000_000)  # floor(1.5e6) + floor(0.5e6)
    assert out[(7, 2)] == (2, -250_000 + 750_000)
    assert out[(8, 1)] == (1, 2_000_000)


def test_gopher_rules_hand_docs(spark):
    from apd_map_reduce_spark.operators.quality import gopher_rules

    good = "the cat and the dog of a house is a fine thing to keep " \
           "around every single day"                      # 17 tokens, stopwords
    short = "the and of is a"                              # fails token count
    symbols = "the and of is a " + "!! 77 " * 6 + "word " * 10  # symbol-heavy
    nostop = "zebra quartz jumble vortex plasma nebula quasar " * 3  # no stopwords
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, nostop)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert got[1].passes_gopher
    assert not got[2].ok_token_count and not got[2].passes_gopher
    assert not got[3].ok_symbol_ratio and not got[3].passes_gopher
    assert not got[4].ok_stopwords and not got[4].passes_gopher
