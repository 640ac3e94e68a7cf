"""Engine parity of the portable sketch-hash primitives.

The whole MinHash/SimHash/LSH family is value-hash-checkable at the
driver gate ONLY because every step is arithmetic both engines compute
identically. These tests pin the base of that chain: the md5-derived
31-bit token hash and the folded shingle hashes match DuckDB bit for
bit, including non-ASCII input.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mimir_spark.functions.text import (
    MERSENNE31,
    portable_token_hash31,
    word_shingle_hashes,
)

TOKENS = ["hello", "WORLD", "café", "中文", "x", "123", "a-b_c", "ümlaut"]


def test_token_hash31_matches_duckdb(spark):
    df = spark.createDataFrame([(t,) for t in TOKENS], "tok string")
    got = {
        r["tok"]: r["h"]
        for r in df.select(
            "tok", portable_token_hash31(F.col("tok")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    for t in TOKENS:
        want = con.execute(
            "select cast(concat('0x', substring(md5(?),1,8)) as bigint)"
            " & 2147483647",
            [t],
        ).fetchone()[0]
        assert got[t] == want, t
        assert 0 <= got[t] <= MERSENNE31


def test_shingle_hashes_match_duckdb(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",
        "single",
        "a a a a a",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: sorted(r["s"])
        for r in df.select(
            "i", word_shingle_hashes("text", 3).alias("s")
        ).collect()
    }
    con = duckdb.connect()
    sql = r"""
      SELECT i, list_sort(list_distinct(list_transform(
               generate_series(1, greatest(len(th) - 2, 1)),
               k -> (((th[k] * 131 + coalesce(th[k+1], 0)) % 2147483647)
                      * 131 + coalesce(th[k+2], 0)) % 2147483647))) AS s
      FROM (SELECT i, list_transform(
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> ''),
                     tok -> cast(concat('0x', substring(md5(tok),1,8))
                                 as bigint) & 2147483647) AS th
            FROM df)
    """
    con.register("df", df.toPandas())
    for i, s in con.execute(sql).fetchall():
        assert got[i] == list(s), i


def test_icws_signatures_invariant_to_log_ulp_noise(spark, sf_smoke):
    """The ICWS oracle's soundness argument: np.log and DuckDB ln
    differ by 1 ulp on ~21% of inputs, so the oracle is only valid if
    the signature pipeline's argmin/floor outputs never depend on the
    last ulp of any log. Pin that: recompute the NumPy kernel with
    EVERY log call randomly perturbed by 1 ulp and require identical
    signatures."""
    import numpy as np

    from mimir_spark.operators.weighted import (
        ICWS_HASHES,
        _splitmix,
        _uniforms,
        _weighted_sets,
        icws_signatures,
    )
    from mimir_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").filter(
        F.col("doc_id") < 150
    )
    wc = _weighted_sets(docs)
    base = {
        r.doc_id: (list(r.sig_g), list(r.sig_t))
        for r in icws_signatures(wc).collect()
    }
    els_by_doc = {}
    for r in wc.collect():
        els_by_doc.setdefault(r.doc_id, []).append((r.g, r.c))

    hash_keys = _splitmix(
        np.arange(ICWS_HASHES, dtype=np.uint64)
        * np.uint64(0xA0761D6478BD642F)
    )
    rng = np.random.default_rng(0)

    def noisy_log(x):
        y = np.log(x)
        m = rng.random(y.shape) < 0.5
        dirn = np.where(rng.random(y.shape) < 0.5, np.inf, -np.inf)
        return np.where(m, np.nextafter(y, dirn), y)

    flips = 0
    for doc_id, els in els_by_doc.items():
        gs = np.array([g for g, _ in els], dtype=np.uint64)
        ws = np.array([c for _, c in els], dtype=np.float64)
        key = _splitmix(gs)[:, None] ^ hash_keys[None, :]
        u = [_uniforms(key, j) for j in range(1, 6)]
        r = -noisy_log(u[0] * u[1])
        c = -noisy_log(u[2] * u[3])
        beta = u[4]
        t = np.floor(noisy_log(ws)[:, None] / r + beta)
        log_a = noisy_log(c) - r * (t - beta + 1.0)
        kstar = log_a.argmin(axis=0)
        ar = np.arange(ICWS_HASHES)
        got = (
            gs[kstar].astype(np.int64).tolist(),
            t[kstar, ar].astype(np.int64).tolist(),
        )
        if got != base[int(doc_id)]:
            flips += 1
    assert flips == 0, f"{flips} docs flipped under 1-ulp log noise"


def test_python_shingle_kernel_matches_jvm_for_any_n(spark):
    """The Arrow-side shingle fold must be bit-identical to the JVM
    zip_with/coalesce chain for EVERY n, not just the default 3 —
    the module's contract is that operators can choose per call
    which side a stage runs on (a hard-coded trigram fold would
    silently diverge for n != 3)."""
    from mimir_spark.functions.pykernels import doc_shingle_hashes
    from mimir_spark.functions.text import word_shingle_hashes_all

    texts = ["a", "a bb", "a bb ccc", "a bb ccc dddd",
             "x y z w v u", "  pad  ded  "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    for n in (2, 3, 4, 5):
        jvm = {
            r.i: list(r.sh)
            for r in df.select(
                "i", word_shingle_hashes_all("text", n).alias("sh")
            ).collect()
        }
        for i, t in enumerate(texts):
            py = doc_shingle_hashes(t, n)
            assert py is not None and list(py) == jvm[i], (n, t)
