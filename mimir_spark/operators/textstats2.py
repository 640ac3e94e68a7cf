"""Text-pipeline batch 2: PII scrubbing, repetition scoring, text
normalization — standard pre-training-corpus cleaning passes, all
JVM-side expressions, all oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.text import tokens_col
from mimir_spark.sources.tables import load_table

# RE2-compatible (no lookaround) so the DuckDB oracle matches Java.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count + redact email/phone patterns per document. Output is the
    redaction audit (counts + post-scrub length); the scrubbed text
    itself stays an internal column a sink would write."""
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.length(scrubbed).cast("long").alias("clean_len"),
    )


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max single-word frequency / total tokens — the classic
    repetitive-doc filter. Two aggregations, both keyed on doc_id, so
    the second groupBy reuses the first shuffle's partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("word")
    )
    per_word = words.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    return (
        per_word.groupBy("doc_id")
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("n_toks"))
        .select(
            "doc_id",
            F.round(F.col("max_c") / F.col("n_toks"), 6).alias("rep_ratio"),
            F.col("n_toks").alias("n_tokens"),
        )
    )


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical form: lowercase, strip non-alphanumerics to spaces,
    collapse runs, trim. Output: normalized length + the first 32
    chars (portable witness of the transform)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " "), r" +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.length(norm).cast("long").alias("norm_len"),
        F.substring(norm, 1, 32).alias("norm_prefix"),
    )


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent character-pair frequencies over all word occurrences —
    the counting step of one BPE tokenizer-training merge round.
    Chars are zipped with their own shifted tail (no per-index
    substring → linear per word, multibyte-safe); one explode + one
    counting aggregate, map-side combine included."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens_col("text")).alias("word"))
    chars = F.split("word", "")
    pairs_all = F.zip_with(
        chars, F.slice(chars, 2, 1 << 30), lambda a, b: F.concat(a, b)
    )
    pairs = F.slice(
        pairs_all, 1, F.greatest(F.length("word") - 1, F.lit(0))
    )
    return (
        words.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
    )


def top_ngrams_per_lang(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k word bigrams per language — group-wise top-k over text
    (per-key rank window AFTER a counting aggregate, so the window
    input is one row per (lang, bigram), not per occurrence)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    bigrams_all = F.zip_with(
        toks, F.slice(toks, 2, 1 << 30), lambda a, b: F.concat_ws(" ", a, b)
    )
    bigrams = F.slice(
        bigrams_all, 1, F.greatest(F.size(toks) - 1, F.lit(0))
    )
    counts = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("lang", "bigram", "cnt", "rank")
    )


def unicode_nfc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit (round 10) — the pass a corpus
    build runs before ANY hashing/dedup, because visually identical
    text in composed vs decomposed form ('é' vs 'e'+U+0301) hashes
    differently and silently defeats exact dedup. Per doc: original
    and NFC codepoint counts, a changed flag, and a portable Horner
    fingerprint (×131 mod 1e9+7 over NFC codepoints — the
    doc_fingerprint fold).

    The kernel is an Arrow-batched mapInPandas over Python's
    unicodedata (the reference UCD implementation); the ORACLE
    recomputes through DuckDB's utf8proc nfc_normalize — two
    INDEPENDENT Unicode libraries agreeing is the correctness
    argument, the same move as the javax.imageio codec
    cross-validation. This English corpus is NFC-invariant (changed =
    0 everywhere — still hash-checked end-to-end); composed/decomposed
    behaviour is pinned on crafted docs in pytest. Map-only: text
    never shuffles."""
    import unicodedata

    from mimir_spark.functions.text import BASE, MOD

    docs = load_table(spark, sf_dir, "documents")

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_chars, n_nfc, changed, fps = [], [], [], []
            for t in pdf["text"]:
                n = unicodedata.normalize("NFC", t)
                acc = 0
                for ch in n:
                    acc = (acc * BASE + ord(ch)) % MOD
                n_chars.append(len(t))
                n_nfc.append(len(n))
                changed.append(int(n != t))
                fps.append(acc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars": n_chars,
                    "n_chars_nfc": n_nfc,
                    "changed": changed,
                    "nfc_fingerprint": fps,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        _scan,
        "doc_id long, n_chars long, n_chars_nfc long, changed long,"
        " nfc_fingerprint long",
    )
