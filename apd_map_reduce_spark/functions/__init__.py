from apd_map_reduce_spark.functions.text import (
    normalize_word,
    tokenize,
    tokenize_normalized,
)

__all__ = ["normalize_word", "tokenize", "tokenize_normalized"]
