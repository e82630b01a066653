"""PII handling for training-data curation: deterministic
pseudonymization and regex redaction (the compliance pass every
large-scale pipeline runs before text reaches a training mix).

Two surfaces:
  * ``pseudonymize_events`` — the registered, oracle-checked query:
    replaces ``user_id`` with a stable md5-derived pseudonym (same user
    → same token across runs and engines, so joins/sessionization still
    work downstream) and scrubs numeric literals out of the ``props``
    payload. Runs on the events table, whose payloads actually contain
    digits (the documents corpus is letters-only by construction, so a
    PII regex there would be vacuous).
  * ``redact_text`` — the generic library redactor (email / IPv4 /
    intl-phone patterns) for corpora that do carry PII. The patterns
    stay inside the Java∩RE2 common regex subset (character classes,
    bounded quantifiers, ``\\b`` — no lookaround), so the identical
    pattern strings run on Spark and in a DuckDB oracle; parity is
    pinned by tests/test_quality_pii_vectors.py on synthetic rows.

Scale: both are narrow per-row projections — no shuffle, no UDF,
whole-stage codegen, scan-speed at 100 TB. Pseudonymization is a pure
function of the key (no lookup table to build, broadcast, or leak).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apd_map_reduce_spark.queries.base import QueryDef
from apd_map_reduce_spark.sources.tables import load_table

# Applied in order; earlier redactions cannot create later matches.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\+[0-9][0-9 -]{6,14}[0-9]", "<PHONE>"),
]


def redact_text(col: Column | str) -> Column:
    """Replace every email / IPv4 / +intl-phone occurrence with a typed
    placeholder. Pattern strings are shared verbatim with the DuckDB
    side (add the 'g' flag there — DuckDB replaces first-match by
    default, Spark replaces all)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, replacement in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    return c


def redact_sql(expr: str) -> str:
    """The DuckDB-side twin of ``redact_text`` over a SQL expression."""
    for pattern, replacement in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{replacement}', 'g')"
    return expr


def pseudonymize_events(events: DataFrame) -> DataFrame:
    """Stable pseudonymization + payload scrubbing.

    ``user_pseudo`` is the first 16 hex chars of md5('uid:'||user_id) —
    deterministic, collision-safe at any realistic user count (64 bits),
    and NOT reversible without the id space (for true k-anonymity a
    keyed HMAC replaces md5; the shape is identical). ``props`` numeric
    literals become ``<NUM>`` and the count of scrubbed literals is kept
    for audit."""
    return events.select(
        "event_id",
        F.substring(
            F.md5(F.concat(F.lit("uid:"), F.col("user_id").cast("string"))), 1, 16
        ).alias("user_pseudo"),
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("props_scrubbed"),
        F.regexp_count("props", F.lit("[0-9]+")).cast("long").alias("n_numbers"),
    )


PSEUDONYMIZE_ORACLE = """
SELECT event_id,
       substr(md5('uid:' || user_id::VARCHAR), 1, 16) AS user_pseudo,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_scrubbed,
       len(regexp_extract_all(props, '[0-9]+'))::BIGINT AS n_numbers
FROM events
"""


PII_QUERIES = [
    QueryDef(
        "pii_pseudonymize_events",
        lambda s, d: pseudonymize_events(load_table(s, d, "events")),
        PSEUDONYMIZE_ORACLE,
    ),
]
