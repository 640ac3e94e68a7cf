"""Shared pure-Python/NumPy kernels for the Arrow (mapInPandas) map
side of the sketch family: Java-exact tokenization, the memoized
portable md5-31 token hash, and the positional-shingle fold.

These are the PYTHON twins of the JVM expressions in functions/text.py
(word_shingle_hashes / word_shingle_hashes_all): bit-identical by
construction — same ASCII whitespace class as Java's \\s, same
first-4-md5-bytes & 0x7FFFFFFF token hash, same ×131 mod-Mersenne31
fold with zero padding for docs shorter than n tokens — so operators
can freely choose per call whether a stage runs JVM-side or inside an
Arrow batch without changing a single output value (pinned by
tests/test_portable_hash.py).
"""

from __future__ import annotations

import re

# Java's \s (what Spark's F.split compiles) is the ASCII whitespace
# class; Python's default \s also matches Unicode spaces, so the
# kernel pins the exact Java set.
JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")

MERSENNE31 = (1 << 31) - 1

# Per-executor-process md5 memo (token string -> 31-bit portable
# hash). The hash is a pure function of the token, so one md5 per
# DISTINCT token per worker covers every occurrence and every
# downstream permutation/band. Bounded: cleared at 4M entries, after
# which hot tokens simply re-memoize.
_MD5_MEMO: dict = {}
_MD5_MEMO_MAX = 4_000_000


def token_hashes31(toks: list) -> "object":
    """np.int64 array of portable md5-31 token hashes (memoized)."""
    import hashlib

    import numpy as np

    memo = _MD5_MEMO
    if len(memo) > _MD5_MEMO_MAX:
        memo.clear()
    out = np.empty(len(toks), dtype=np.int64)
    for i, t in enumerate(toks):
        h = memo.get(t)
        if h is None:
            h = (
                int.from_bytes(
                    hashlib.md5(t.encode("utf-8")).digest()[:4], "big"
                )
                & 0x7FFFFFFF
            )
            memo[t] = h
        out[i] = h
    return out


def doc_shingle_hashes(text, n: int = 3):
    """POSITIONAL hashed n-gram array for one document (np.int64), or
    None for empty/whitespace-only text — the NumPy twin of
    word_shingle_hashes_all for ANY n: ×131 mod-Mersenne31 Horner
    fold over n token hashes per position, zero-padded so a doc
    shorter than n tokens yields one padded shingle (the exact
    coalesce-0 semantics of the JVM zip_with chain; pinned against it
    for n=2..5 in tests/test_portable_hash.py)."""
    import numpy as np

    if not text:
        return None
    toks = [t for t in JAVA_WS.split(text) if t]
    if not toks:
        return None
    th = token_hashes31(toks)
    m31 = np.int64(MERSENNE31)
    padded = np.concatenate([th, np.zeros(n - 1, dtype=np.int64)])
    L = len(toks)
    sh = padded[:L].copy()
    for k in range(1, n):
        sh = (sh * 131 + padded[k : k + L]) % m31
    return sh[: max(L - n + 1, 1)]


def doc_weighted_set(text, n: int = 3):
    """(gs, cs) sorted unique positional-shingle hashes + counts for
    one document — the multiset form (weighted family)."""
    import numpy as np

    sh = doc_shingle_hashes(text, n)
    if sh is None:
        return None
    gs, cs = np.unique(sh, return_counts=True)
    return gs, cs.astype(np.int64)


def doc_shingle_set(text, n: int = 3):
    """Sorted DISTINCT positional-shingle hashes for one document —
    the set form (MinHash / SimHash / containment families)."""
    import numpy as np

    sh = doc_shingle_hashes(text, n)
    if sh is None:
        return None
    return np.unique(sh)
