from mimir_spark.functions.vectors import dot, l2_norm, cosine_sim
from mimir_spark.functions.text import (
    tokens_col,
    char_ngrams,
    word_shingles,
    portable_token_hash,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine_sim",
    "tokens_col",
    "char_ngrams",
    "word_shingles",
    "portable_token_hash",
]
