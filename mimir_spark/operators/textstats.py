"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is pure Column expressions (codegen'd, no Python), and every
formula is written in engine-portable arithmetic so the DuckDB oracle
can compute the identical answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.text import MOD, BASE, tokens_col
from mimir_spark.sources.tables import load_table

# Marker stopwords per language for the n-gram-free heuristic: score a
# language by how many of its marker words occur as tokens.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "que", "de"),
    "fr": ("le", "la", "les", "et", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
# Kept RE2-compatible (no backrefs/lookahead) so DuckDB matches Java.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(
        F.filter(toks, lambda t: t.isin(*markers))
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax marker-word hits, alphabetical
    tie-break, plus correctness flag vs the labeled lang column."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            _marker_score(toks, m).alias(f"s_{code}")
            for code, m in sorted(LANG_MARKERS.items())
        ],
    )
    # argmax with deterministic alphabetical tie-break via greatest +
    # first-match scan in sorted code order
    best = F.greatest(*[F.col(f"s_{c}") for c in sorted(LANG_MARKERS)])
    pred = F.coalesce(
        *[
            F.when(F.col(f"s_{c}") == best, F.lit(c))
            for c in sorted(LANG_MARKERS)
        ]
    )
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("long").alias("is_correct"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc quality in [0,1]: mix of length band, alpha ratio,
    stopword ratio, mean token length. The exact blend matters less
    than that it is cheap, monotone in 'looks like prose', and
    reproducible across engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n_toks = F.size(toks)
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    alpha_ratio = alpha_chars / n_chars
    stop_ratio = stop_hits / n_toks
    mean_tok_len = n_chars / n_toks
    len_band = F.when((n_chars >= 100) & (n_chars <= 2000), 1.0).otherwise(0.5)
    score = (
        0.3 * len_band
        + 0.3 * alpha_ratio
        + 0.25 * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        + 0.15 * F.least(mean_tok_len / F.lit(8.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens_col("text")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("re_tokens"),
    )


# BMP codepoint classes for scripts that do not delimit words with
# whitespace: kana, CJK Unified (+ext A), hangul syllables. Literal
# character ranges, so the same pattern runs under Java regex (Spark)
# and RE2 (DuckDB); BMP-only keeps UTF-16 vs codepoint length counts
# identical across engines.
CJK_CLASS = "぀-ヿ㐀-䶿一-鿿가-힯"


def token_count_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-script token counting — the codepoint-class fallback for
    whitespace-free scripts that plain `token_count` silently
    under-counts (a zh/ja/ko document is ONE whitespace token however
    long it is): each CJK codepoint counts as its own token (the
    standard char-level fallback absent a real segmenter) and the
    remaining text tokenizes by whitespace as usual. Output:
    (doc_id, cjk_chars, ws_tokens, mixed_tokens) with ws_tokens the
    original whitespace rule for comparison. Pure Column expressions;
    the oracle replicates the regex arithmetic; CJK behaviour is
    additionally pinned on crafted zh/ja/mixed docs in pytest (the
    test corpus is English, where cjk_chars = 0 and
    mixed_tokens = ws_tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    cjk_chars = F.length(
        F.regexp_replace("text", f"[^{CJK_CLASS}]", "")
    )
    non_cjk_ws = F.size(
        tokens_col(F.regexp_replace("text", f"[{CJK_CLASS}]", " "))
    )
    return docs.select(
        "doc_id",
        cjk_chars.cast("long").alias("cjk_chars"),
        F.size(tokens_col("text")).cast("long").alias("ws_tokens"),
        (non_cjk_ws + cjk_chars).cast("long").alias("mixed_tokens"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint of the full text
    (h = fold chars: (acc·131 + codepoint) mod 1e9+7). Engine-portable:
    the identical fold runs in the DuckDB oracle via list_reduce."""
    docs = load_table(spark, sf_dir, "documents")
    chars = F.filter(F.split("text", ""), lambda c: c != "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * BASE + F.ascii(ch)) % MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
