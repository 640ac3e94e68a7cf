"""BPE tokenizer TRAINING — the iterative merge-learning loop
(Sennrich et al. 2016), distributed the way production tokenizer
builds actually run:

The corpus is touched ONCE (the wordcount scan). Every merge
iteration then operates on the (word, count) VOCABULARY — orders of
magnitude smaller than the corpus and the only state the loop
carries. Per iteration: a vocab-sized weighted pair count (partial-
aggregated shuffle), a 1-row argmax brought to the driver (the merge
rule must become a literal in the next plan — same driver round-trip
shape as k-means centroids), and a JVM-side fold that applies the
merge to each word's symbol array. No Python UDFs; the fold is a
Catalyst `aggregate` over the symbol array.

`bpe_pair_counts` (textstats2) is iteration 0 of this loop at char
granularity; this operator runs the full loop and emits the learned
merge table — deterministic via (count desc, pair) tie-break, pinned
against a pure-Python reference implementation in tests (rows-only
for the driver: an N-round iterative loop isn't one SQL statement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.operators.core import tokens
from mimir_spark.sources.tables import load_table


def _apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """Left-to-right non-overlapping replacement of adjacent
    (left, right) symbol pairs with their concatenation, as a fold:
    append each symbol unless it closes the pair with the current last
    element, in which case the last element is replaced by the merged
    symbol. try_element_at (not element_at) so the empty-accumulator
    probe is NULL, never an ANSI index error."""
    la, lb = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == la) & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> DataFrame:
    """Learn the top `n_merges` BPE merges over `documents.text`.
    Output: one row per learned merge (step, left, right, merged,
    pair_count), in learning order."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = tokens(docs).groupBy("word").agg(
        F.count("*").cast("long").alias("wc")
    )
    symbols = vocab.select(
        "wc", F.filter(F.split("word", ""), lambda c: c != "").alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(n_merges):
        pair = F.zip_with(
            F.col("syms"),
            F.slice(F.col("syms"), 2, 1 << 30),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        best = (
            symbols.select("wc", F.explode(pair).alias("p"))
            .filter(F.col("p.r").isNotNull())
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < 2:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((step, left, right, left + right, cnt))
        symbols = symbols.withColumn(
            "syms", _apply_merge(F.col("syms"), left, right)
        )
        # truncate lineage every few rounds so plan depth stays O(1)
        if (step + 1) % 4 == 0:
            symbols = symbols.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step long, left string, right string, merged string, pair_count long"
    )


def bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> DataFrame:
    """Apply the learned merge table to the corpus: per-doc token →
    BPE-symbol stream lengths (the compression signal a tokenizer
    build reports). The merge rules arrive as literals folded into one
    chained column expression — the corpus is scanned once, no join
    against a rule table, mirroring how a frozen tokenizer ships as
    code, not data."""
    rules = [(r["left"], r["right"]) for r in bpe_train(spark, sf_dir, n_merges).collect()]
    docs = load_table(spark, sf_dir, "documents")
    word = tokens(docs)
    syms = F.filter(F.split("word", ""), lambda c: c != "")
    col = syms
    for left, right in rules:
        col = _apply_merge(col, left, right)
    per_word = word.select(
        "doc_id",
        F.size(syms).cast("long").alias("n_chars"),
        F.size(col).cast("long").alias("n_symbols"),
    )
    return per_word.groupBy("doc_id").agg(
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_symbols").alias("total_symbols"),
        F.round(F.sum("n_chars") / F.sum("n_symbols"), 6).alias(
            "chars_per_symbol"
        ),
    )
