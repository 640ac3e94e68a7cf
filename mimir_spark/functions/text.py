"""Text primitives shared by dedup / text-analysis operators.

`portable_token_hash` is a polynomial hash written in plain integer
arithmetic (no engine-specific hash function) so the SAME formula can
be written in the DuckDB oracle SQL — keeping hash-dependent operators
value-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"
MOD = 1_000_000_007
BASE = 131


def tokens_col(text: Column | str) -> Column:
    """array of whitespace tokens, empties removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, TOKEN_SPLIT), lambda t: t != "")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """array of n-word shingles (space-joined), distinct."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """array of distinct character n-grams."""
    c = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n)))


def portable_token_hash(token: Column) -> Column:
    """Deterministic engine-portable string hash:
    h = Σ_k ascii(char_k) · BASE^(len-1-k)  (mod MOD), via Horner.
    Expressible identically in DuckDB (list_reduce over string_split)."""
    chars = F.split(token, "")
    return F.aggregate(
        F.filter(chars, lambda ch: ch != ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * BASE + F.ascii(ch)) % MOD,
    )
