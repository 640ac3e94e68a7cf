"""Text-pipeline batch 2: six-class PII scrubbing (Luhn-validated
cards, octet-validated IPv4, entropy-gated key tokens), repetition
scoring, text normalization, Flesch readability, RAKE keyword
extraction — standard pre-training-corpus cleaning/analysis passes,
all JVM-side expressions, all oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.text import tokens_col
from mimir_spark.operators.textstats import STOPWORDS
from mimir_spark.sources.tables import load_table

# RE2-compatible (no lookaround) so the DuckDB oracle matches Java.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
# contiguous PAN or 4x4 dashed/spaced grouping
CARD_RE = (
    r"\b[0-9]{13,19}\b"
    r"|\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b"
)
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# secret-ish token shape; precision comes from the entropy + mixed-class
# gate applied to candidates, not the regex
KEY_RE = r"\b[A-Za-z0-9_-]{24,64}\b"
# high-entropy threshold in BITS (Shannon over the candidate's chars);
# 3.5 bits needs ≥ ~12 effectively-uniform distinct chars — natural
# words and repeated filler stay far below, random secrets far above.
KEY_ENTROPY_BITS = 3.5

def _sql_escape(rx: str) -> str:
    return rx.replace("\\", "\\\\")


# Luhn mod-10 over the digit string d (candidate with separators
# stripped), as a pure SQL expression: double every second digit from
# the RIGHT ((len-i) odd for 1-based left index i), subtract 9 on
# overflow, sum % 10 == 0. Identical text in Spark SQL and DuckDB.
def _luhn_ok(d: str) -> str:
    dig = f"CAST(substring({d}, i, 1) AS INT)"
    return (
        f"aggregate(transform(sequence(1, length({d})),"
        f" i -> CASE WHEN (length({d}) - i) % 2 = 1"
        f" THEN CASE WHEN 2 * {dig} > 9 THEN 2 * {dig} - 9 ELSE 2 * {dig} END"
        f" ELSE {dig} END), 0, (a, x) -> a + x) % 10 = 0"
    )


# Shannon entropy in bits over the chars of candidate k — distinct
# chars, each char's p = count/len, −Σ p·log2 p, rounded 6dp before
# the threshold compare so borderline ULPs can't split engines.
def _entropy_bits(k: str) -> str:
    chars = f"transform(sequence(1, length({k})), i -> substring({k}, i, 1))"
    p = (
        f"CAST(size(filter(ch, x -> x = c)) AS DOUBLE)"
        f" / CAST(length({k}) AS DOUBLE)"
    )
    return (
        f"round(-aggregate(transform(array_distinct({chars}),"
        f" c -> ({p.replace('ch', chars)}) * ln({p.replace('ch', chars)})),"
        f" CAST(0.0 AS DOUBLE), (a, x) -> a + x) / ln(2), 6)"
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit + redaction over six classes: email, SSN, credit card
    (Luhn mod-10 validated, expression-side), phone, IPv4 (octet-range
    validated), and high-entropy API-key-shaped tokens (Shannon ≥ 3.5
    bits AND mixed letter+digit). Counts are per-class high-precision
    audits on the RAW text; clean_len is the length after redacting
    ALL candidates of every class in a fixed order (a scrubber is
    conservative: a card-shaped number that fails Luhn is still
    redacted, just not counted as a confirmed card).

    Everything is JVM-side expressions — the Luhn fold and entropy
    gate run as array expressions inside codegen, O(candidate_len)
    per candidate, no Python, no shuffle (map-only over the scan).
    """
    docs = load_table(spark, sf_dir, "documents")

    # Spark SQL string literals process backslash escapes ('\b' →
    # backspace), so regexes interpolated into expr() text need their
    # backslashes doubled; the Python-API F.lit()/F.regexp_* sites
    # below take the raw pattern untouched.
    def cand(rx: str) -> str:
        return f"regexp_extract_all(text, '{_sql_escape(rx)}', 0)"
    digits_only = "regexp_replace(c, '[^0-9]', '')"
    n_cards = (
        f"size(filter({cand(CARD_RE)},"
        f" c -> {_luhn_ok(digits_only)}))"
    )
    n_ips = (
        f"size(filter({cand(IP_RE)},"
        f" c -> size(filter(split(c, '[.]'),"
        f" o -> CAST(o AS INT) <= 255)) = 4))"
    )
    n_keys = (
        f"size(filter({cand(KEY_RE)},"
        f" k -> {_entropy_bits('k')} >= {KEY_ENTROPY_BITS}"
        f" AND k rlike '[0-9]' AND k rlike '[A-Za-z]'))"
    )
    scrubbed = F.col("text")
    for rx, tag in [
        (EMAIL_RE, "<EMAIL>"),
        (SSN_RE, "<SSN>"),
        (CARD_RE, "<CARD>"),
        (PHONE_RE, "<PHONE>"),
        (IP_RE, "<IP>"),
        (KEY_RE, "<KEY>"),
    ]:
        scrubbed = F.regexp_replace(scrubbed, rx, tag)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(SSN_RE), 0))
        .cast("long")
        .alias("n_ssns"),
        F.expr(n_cards).cast("long").alias("n_cards"),
        F.expr(n_ips).cast("long").alias("n_ips"),
        F.expr(n_keys).cast("long").alias("n_keys"),
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


# ---- readability (round 12) -------------------------------------------------

def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (Flesch '48; the quality
    family's readability axis beside quality_score's ratios):
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    sentences = [.!?]+ splits (min 1 — the synthetic corpus has no
    terminal punctuation, so it reads as one long sentence, which the
    formula scores honestly as hard-to-read) and syllables = vowel-
    group count per word (min 1) — the standard cheap proxy.

    One map-only pass of array expressions; exact integer counts, one
    4dp round at emission. Output: (doc_id, n_words, n_sentences,
    n_syllables, flesch)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    syll = (
        "aggregate(transform(filter(split(text, '\\\\s+'), x -> x != ''),"
        " w -> greatest(size(regexp_extract_all(w, '[aeiouyAEIOUY]+', 0)),"
        " 1)), 0L, (a, x) -> a + x)"
    )
    sents = (
        "greatest(size(filter(split(text, '[.!?]+'),"
        " s -> length(trim(s)) > 0)), 1)"
    )
    return (
        docs.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_words"),
            F.expr(sents).cast("long").alias("n_sentences"),
            F.expr(syll).cast("long").alias("n_syllables"),
        )
        .filter(F.col("n_words") > 0)
        .withColumn(
            "flesch",
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
                - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
                4,
            ),
        )
    )


# ---- RAKE keyword extraction (round 12) --------------------------------------

RAKE_TOP_K = 25


def rake_keywords(spark: SparkSession, sf_dir: str, k: int = RAKE_TOP_K) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents"), corpus-level: candidate
    phrases are maximal stopword-free token runs; each word scores
    deg/freq (deg = Σ lengths of phrases containing it, freq = its
    phrase-occurrence count); a phrase scores the sum of its member
    word scores; report the global top-k distinct phrases.

    Portability: word scores are integer-ratio fixed-point
    (round(1e6·deg/freq) as BIGINT), so phrase scores are EXACT
    integer sums — no float-sum order risk anywhere; ties break on the
    phrase string. Scale shape: phrase building is one posexplode +
    one doc-keyed window (island = running stopword count) + one
    doc-keyed aggregate; word stats and phrase scores are two bounded
    counting aggregates; the final top-k executes as a distributed
    TakeOrderedAndProject (orderBy+limit — per-partition k-row heaps,
    never the whole distinct-phrase table through one task); rank is
    a row_number over the already-k-row result only.

    Output: (phrase, n_words, n_occurrences, score_micro, rank)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens_col("text")).alias("pos", "tok"),
    ).withColumn("is_stop", F.col("tok").isin(*STOPWORDS).cast("int"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = toks.withColumn("island", F.sum("is_stop").over(w)).filter(
        F.col("is_stop") == 0
    )
    # three consumers (word stats, distinct-phrase scores, occurrence
    # counts) read this — materialize once or the corpus is scanned
    # and window-shuffled three times
    phrases = (
        runs.groupBy("doc_id", "island")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
        .localCheckpoint(eager=True)
    )
    words = phrases.select(
        "n_words", F.explode(F.split("phrase", " ")).alias("word")
    )
    wstats = words.groupBy("word").agg(
        F.sum("n_words").cast("long").alias("deg"),
        F.count(F.lit(1)).cast("long").alias("freq"),
    )
    wscore = wstats.select(
        "word",
        F.round(F.lit(1e6) * F.col("deg") / F.col("freq"), 0)
        .cast("long")
        .alias("w_micro"),
    )
    # score DISTINCT phrases (a phrase's score is a function of its
    # words alone — summing over occurrences would multiply it);
    # occurrences are counted separately.
    phrase_scores = (
        phrases.select("phrase", "n_words")
        .distinct()
        .select(
            "phrase",
            "n_words",
            F.explode(F.split("phrase", " ")).alias("word"),
        )
        .join(F.broadcast(wscore), "word")
        .groupBy("phrase", "n_words")
        .agg(F.sum("w_micro").cast("long").alias("p_micro"))
    )
    occ = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    top = (
        phrase_scores.join(occ, "phrase")
        .orderBy(F.desc("p_micro"), F.col("phrase"))
        .limit(k)
    )
    ranked = top.withColumn(
        "rank",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.desc("p_micro"), F.col("phrase")))
        .cast("long"),
    )
    return ranked.select(
        "phrase", "n_words", "n_occurrences",
        F.col("p_micro").alias("score_micro"), "rank",
    )
