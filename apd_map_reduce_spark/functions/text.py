"""Scalar text functions (reference P1-P5, SURVEY.md §2.2).

The reference's entire scalar surface is word normalization
(`tema1a/src/main.cpp:31-39`: strip non-alphabetic bytes, lowercase,
ASCII-only under the default C locale) plus trivial filters. Encoded
here as Column expressions — JVM-side, inside whole-stage codegen;
no Python UDFs.

Semantics pinned by the goldens (SURVEY.md §5.2):
  * ASCII classes only (`[^A-Za-z]`), NOT ``\\p{L}`` — multibyte UTF-8
    characters are deleted, not transliterated.
  * ``Don't`` → ``dont``, ``look-out`` → ``lookout``, ``foo123`` → ``foo``,
    bare digits → dropped (empty after strip), single letters kept.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII-anchored on purpose; see module docstring.
NON_ALPHA = "[^A-Za-z]"
WHITESPACE = "\\s+"


def null_safe_size(arr: Column) -> Column:
    """`size()` with NULL-in → NULL-out.

    Non-ANSI Spark returns -1 for `size(NULL)`; every DuckDB oracle's
    `len()` propagates NULL instead, so a NULL-text document would
    contribute -1 to one engine's token totals and nothing to the
    other's (DETERMINISM.md rule 35). Use this for any size() whose
    input array can be NULL (e.g. tokenizations of a nullable text
    column)."""
    return F.when(arr.isNotNull(), F.size(arr))


def normalize_word(col: Column | str) -> Column:
    """P1 — `lower(regexp_replace(token, '[^A-Za-z]', ''))`.

    Matches `main.cpp:31-39` (isalpha/tolower loop) byte-for-byte on
    ASCII input; strips (does not transliterate) everything else.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, NON_ALPHA, ""))


def tokenize(col: Column | str) -> Column:
    """S2 tokenization — split on whitespace runs (C++ `operator>>`).

    Returns an array column; empty strings (from leading whitespace)
    remain and must be filtered after normalization (P2).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, WHITESPACE)


def tokenize_normalized(col: Column | str) -> Column:
    """Tokenize then normalize each element, dropping empties (P1+P2).

    All-JVM: split → transform(lower∘regexp_replace) → filter.
    """
    toks = tokenize(col)
    return F.filter(
        F.transform(toks, lambda t: F.lower(F.regexp_replace(t, NON_ALPHA, ""))),
        lambda w: w != "",
    )
