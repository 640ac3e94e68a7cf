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
against a pure-Python reference implementation in tests AND an
unrolled-CTE DuckDB oracle (each round: pair-count → argmax →
list_reduce greedy fold; the batched selection is provably
sequential-equivalent, so the sequential oracle hash-pins it).
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


def _safe_merge_prefix(
    top: list, budget: int
) -> list[tuple[str, str, int]]:
    """The longest prefix of the (count desc, l, r)-ordered top-pair
    list that is PROVABLY identical to selecting the merges one at a
    time — the batching rule that cuts the driver round count ~m×
    without changing a single learned merge.

    Accepting candidate k after candidates 1..k-1 is safe iff no pair
    whose count sequential training could have changed can outrank it:
    applying an accepted merge (a,b) only (1) DECREASES counts of
    pairs touching a or b, or (2) CREATES pairs containing the new
    symbol "ab", each bounded by the count of some old pair touching a
    or b. So it suffices that every OTHER collected pair sharing a
    symbol with an already-accepted candidate counts strictly below
    c_k — and, for pairs outside the collected window, that c_k is
    strictly above the window's last count (anything uncollected
    counts ≤ that). Strict inequalities also freeze the (count desc,
    l, r) tie-break: a decreased count can land ON c_k only from
    strictly above, which the same guard excludes."""
    tail_cnt = int(top[-1]["cnt"]) if top else 0
    accepted: list[tuple[str, str, int]] = []
    accepted_pairs: set[tuple[str, str]] = set()
    used: set[str] = set()
    for row in top:
        if len(accepted) >= budget:
            break
        left, right, cnt = row["l"], row["r"], int(row["cnt"])
        if cnt < 2:
            break
        if accepted:
            if {left, right} & used:
                break
            if cnt <= tail_cnt:
                break
            # The scan must skip the already-accepted candidates
            # themselves: each one trivially shares its own symbols
            # with `used` at a cnt >= c_k (the list is count-sorted),
            # but an accepted merge is not "another pair sequential
            # training could have promoted past k" — it has already
            # been taken. Including them made the conflict test
            # always-true after the first acceptance (batch length
            # frozen at 1 — the batching was dead code).
            conflict = any(
                int(r2["cnt"]) >= cnt
                and {r2["l"], r2["r"]} & used
                and (r2["l"], r2["r"]) != (left, right)
                and (r2["l"], r2["r"]) not in accepted_pairs
                for r2 in top
            )
            if conflict:
                break
        accepted.append((left, right, cnt))
        accepted_pairs.add((left, right))
        used |= {left, right, left + right}
    return accepted


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 10, batch_m: int = 4
) -> DataFrame:
    """Learn the top `n_merges` BPE merges over `documents.text`.
    Output: one row per learned merge (step, left, right, merged,
    pair_count), in learning order.

    Driver-round economics: naive sequential training is 2 Spark jobs
    per merge — ~64k round-trips at a production 32k merges. Each
    round here collects the top-L pair window ONCE and accepts the
    longest provably-sequential-equivalent prefix (_safe_merge_prefix,
    up to batch_m merges — identical output, pinned against the
    pure-Python sequential reference), then applies them in one fold
    chain. Natural-language corpora share hot symbols across top
    pairs, so the prefix is often short early on — but it lengthens as
    merges specialize, and the guard never trades a merge for speed."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = tokens(docs).groupBy("word").agg(
        F.count("*").cast("long").alias("wc")
    )
    symbols = vocab.select(
        "wc", F.filter(F.split("word", ""), lambda c: c != "").alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    applied_since_checkpoint = 0
    while len(merges) < n_merges:
        pair = F.zip_with(
            F.col("syms"),
            F.slice(F.col("syms"), 2, 1 << 30),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        top = (
            symbols.select("wc", F.explode(pair).alias("p"))
            .filter(F.col("p.r").isNotNull())
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(max(16, 8 * batch_m))
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        batch = _safe_merge_prefix(top, min(batch_m, n_merges - len(merges)))
        for left, right, cnt in batch:
            merges.append((len(merges), left, right, left + right, cnt))
            symbols = symbols.withColumn(
                "syms", _apply_merge(F.col("syms"), left, right)
            )
        # truncate lineage every few applied merges so plan depth
        # stays O(1)
        applied_since_checkpoint += len(batch)
        if applied_since_checkpoint >= 4:
            symbols = symbols.localCheckpoint(eager=True)
            applied_since_checkpoint = 0
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


def wordpiece_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Learn `n_merges` WORDPIECE merges (Schuster & Nakajima 2012;
    the BERT tokenizer's trainer): unlike BPE's raw pair-frequency
    argmax, each round merges the pair maximizing the LIKELIHOOD ratio
    score count(l,r) / (count(l)·count(r)) — pairs that co-occur far
    more than their parts' popularity predicts, which prefers
    morpheme-like units over frequent-but-uninformative pairs.

    Same distributed shape as bpe_train: the corpus is scanned once
    into the (word, count) vocabulary; every round is two vocab-sized
    partial-aggregated counts (adjacent pairs + symbol unigrams), one
    1-row argmax to the driver, and the shared JVM-side fold
    (_apply_merge) — no Python UDFs, plan depth capped by periodic
    localCheckpoint. Rounds are strictly sequential (the BPE
    _safe_merge_prefix batching guard doesn't transfer: a ratio can
    GROW when an accepted merge shrinks a unigram count, so no prefix
    is provably order-safe).

    Portability: the score is one division of exact integers —
    identical doubles in Spark and DuckDB — and ties break (score
    desc, l, r) on both sides; the unrolled-CTE oracle replays the
    identical argmax chain. Output: (step, left, right, merged,
    pair_count, score 9dp) in learning order.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = tokens(docs).groupBy("word").agg(
        F.count("*").cast("long").alias("wc")
    )
    symbols = vocab.select(
        "wc", F.filter(F.split("word", ""), lambda c: c != "").alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int, float]] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        pair = F.zip_with(
            F.col("syms"),
            F.slice(F.col("syms"), 2, 1 << 30),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        pairs = (
            symbols.select("wc", F.explode(pair).alias("p"))
            .filter(F.col("p.r").isNotNull())
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").cast("long").alias("cnt"))
        )
        uni = (
            symbols.select("wc", F.explode("syms").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("wc").cast("long").alias("uc"))
        )
        top = (
            pairs.join(
                uni.select(F.col("sym").alias("l"), F.col("uc").alias("ul")),
                "l",
            )
            .join(
                uni.select(F.col("sym").alias("r"), F.col("uc").alias("ur")),
                "r",
            )
            .filter(F.col("cnt") >= 2)
            .withColumn("score", F.col("cnt") / (F.col("ul") * F.col("ur")))
            .orderBy(F.col("score").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        w = top[0]
        merges.append(
            (
                len(merges),
                w["l"],
                w["r"],
                w["l"] + w["r"],
                int(w["cnt"]),
                round(float(w["score"]), 9),
            )
        )
        symbols = symbols.withColumn(
            "syms", _apply_merge(F.col("syms"), w["l"], w["r"])
        )
        since_ckpt += 1
        if since_ckpt >= 4:
            symbols = symbols.localCheckpoint(eager=True)
            since_ckpt = 0
    return spark.createDataFrame(
        merges,
        "step long, left string, right string, merged string,"
        " pair_count long, score double",
    )
