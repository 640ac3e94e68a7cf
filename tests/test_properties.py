"""Property-based tests (hypothesis): the portable hash and tokenizer
really are engine-portable, for arbitrary inputs — not just the corpus.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from mimir_spark.functions.text import BASE, MOD


def py_portable_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * BASE + ord(ch)) % MOD
    return h


printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0xFFFF, blacklist_categories=("Cs",)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(printable)
def test_duckdb_hash_matches_python(s):
    """The oracle-side list_reduce formula == the reference fold."""
    con = duckdb.connect()
    got = con.execute(
        r"""SELECT list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(regexp_extract_all(?, '[\s\S]'),
                                c -> ascii(c)::BIGINT)),
               (acc, x) -> (acc * 131 + x) % 1000000007)""",
        [s],
    ).fetchone()[0]
    con.close()
    expect = py_portable_hash(s) if s else None
    if s == "":
        assert got in (0, None)
    else:
        assert got == expect


@pytest.mark.parametrize(
    "s",
    ["", "a", "hello world", "tab\tsep", "多语言 文本 here", "x" * 500],
)
def test_spark_hash_matches_python(spark, s):
    """The Spark-side aggregate fold == the reference fold."""
    from pyspark.sql import functions as F

    from mimir_spark.functions.text import portable_token_hash

    df = spark.createDataFrame([(s,)], "t string")
    got = df.select(portable_token_hash(F.col("t")).alias("h")).collect()[0].h
    assert got == py_portable_hash(s)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=0, max_size=12))
def test_tokenizer_parity_on_generated_text(words):
    """Spark split vs DuckDB string_split_regex on generated docs."""
    text = " ".join(words)
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            r"SELECT unnest(string_split_regex(?, '\s+')) w", [text]
        ).fetchall()
        if r[0] != ""
    ]
    con.close()
    assert duck == words
