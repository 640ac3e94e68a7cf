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
    """array of n-word shingles (space-joined), distinct.

    Built by zipping the token array with its own shifted tails
    (`zip_with` + `slice`) rather than indexing inside a `transform`
    lambda: a subexpression referenced inside a higher-order-function
    lambda is re-evaluated per element, which would make shingling
    O(words²) per document. The zip form evaluates the split a constant
    number of times — ~6× faster end-to-end on the documents table.
    Docs shorter than n words yield one shingle of all their words
    (concat_ws skips the null padding zip_with introduces at the tail).
    """
    toks = tokens_col(text)
    sh = toks
    for k in range(1, n):
        sh = F.zip_with(
            sh, F.slice(toks, k + 1, 1 << 30), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(
        F.slice(sh, 1, F.greatest(F.size(toks) - n + 1, F.lit(1)))
    )


def word_shingles_all(text: Column | str, n: int = 3) -> Column:
    """Positional variant of `word_shingles`: one entry PER TOKEN
    POSITION (no distinct), for operators that weight by occurrence
    (e.g. duplicated-span coverage)."""
    toks = tokens_col(text)
    sh = toks
    for k in range(1, n):
        sh = F.zip_with(
            sh, F.slice(toks, k + 1, 1 << 30), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.slice(sh, 1, F.greatest(F.size(toks) - n + 1, F.lit(1)))


MERSENNE31 = (1 << 31) - 1


def portable_token_hash31(token: Column) -> Column:
    """Engine-PORTABLE 31-bit token hash: the first 32 bits of the
    standard MD5 hex digest, parsed as an integer and masked to 31
    bits. Both Spark and DuckDB expose `md5(string) -> hex string`
    over the UTF-8 bytes, so the identical value is one expression in
    each engine:

      Spark:  conv(substring(md5(t), 1, 8), 16, 10)::long & 0x7FFFFFFF
      DuckDB: cast(concat('0x', substring(md5(t), 1, 8)) as bigint)
              & 2147483647

    Unlike `portable_token_hash` (polynomial over characters — an
    O(token-length) higher-order aggregate), this runs as three scalar
    JVM intrinsics per token (~25% slower than xxhash64, measured on
    the sf0.1 corpus pass) and its bits are cryptographic-quality —
    what the MinHash permutation family and SimHash bit hashes need.
    Verified bit-equal to the DuckDB form in
    tests/test_portable_hash.py including non-ASCII tokens."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(MERSENNE31))
    )


def word_shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """array<long> of distinct HASHED n-word shingles — the cheap twin
    of word_shingles for consumers that never need the shingle text
    (MinHash signatures, shingle-set verification). Each token is
    hash-folded to 31 bits once via `portable_token_hash31`, then
    shingle hashes combine the n token hashes arithmetically via the
    same zip_with/slice shifts — no per-shingle string concatenation,
    no string array_distinct, no string shuffle downstream. ~2×
    cheaper per corpus pass than the string form on the documents
    table.

    The token hash is PORTABLE (md5-derived — see
    portable_token_hash31) rather than xxhash64: every downstream
    arithmetic step (the ×131 fold here, the MinHash permutations,
    SimHash bit hashes, LSH band buckets) is plain integer math, so
    the ENTIRE sketch family is replicable in DuckDB oracle SQL —
    which is what moved dedup_minhash_lsh / dedup_simhash / the LSH
    cluster pipeline from the rows-only gate to the value-hash gate.

    Stays inside long range under ANSI arithmetic: h < 2^31 and
    h*131 + h' < 2^39. Collisions (31-bit, ~hundreds of shingles/doc)
    only MERGE set elements, so a near-dup pair's hashed Jaccard is
    ≥ its string Jaccard with equality except at ~1e-5 probability.
    Docs shorter than n tokens yield one padded shingle (coalesce 0 —
    the analogue of concat_ws skipping the null tail)."""
    toks = tokens_col(text)
    th = F.transform(toks, portable_token_hash31)
    sh = th
    for k in range(1, n):
        sh = F.zip_with(
            sh,
            F.slice(th, k + 1, 1 << 30),
            lambda a, b: (a * 131 + F.coalesce(b, F.lit(0))) % MERSENNE31,
        )
    return F.array_distinct(
        F.slice(sh, 1, F.greatest(F.size(toks) - n + 1, F.lit(1)))
    )


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """array of distinct character n-grams (zip form — see
    word_shingles for why per-index substring would be O(len²))."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.split(c, "")
    ng = chars
    for k in range(1, n):
        ng = F.zip_with(
            ng, F.slice(chars, k + 1, 1 << 30), lambda a, b: F.concat_ws("", a, b)
        )
    return F.array_distinct(
        F.slice(ng, 1, F.greatest(F.length(c) - n + 1, F.lit(1)))
    )


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


def word_shingle_hashes_all(text: Column | str, n: int = 3) -> Column:
    """POSITIONAL variant of `word_shingle_hashes` (no distinct): one
    hashed n-gram per token position, for operators that weight by
    occurrence (the weighted-set family). Same portable md5-31 token
    hash + ×131 fold, so the DuckDB oracles replicate the ids — and
    ~2× cheaper than hashing each shingle STRING (one md5 per token
    instead of one per 3-word concatenation)."""
    toks = tokens_col(text)
    th = F.transform(toks, portable_token_hash31)
    sh = th
    for k in range(1, n):
        sh = F.zip_with(
            sh,
            F.slice(th, k + 1, 1 << 30),
            lambda a, b: (a * 131 + F.coalesce(b, F.lit(0))) % MERSENNE31,
        )
    return F.slice(sh, 1, F.greatest(F.size(toks) - n + 1, F.lit(1)))
