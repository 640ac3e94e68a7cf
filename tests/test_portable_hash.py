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
