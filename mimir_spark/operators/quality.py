"""Rule-based corpus quality filtering and selection — the document-
level gates a pre-training data build runs before (and after) dedup:

- `gopher_quality_filter`: the published Gopher/MassiveText rule
  family (word-count band, mean word length band, symbol-to-word
  ratio, alphabetic-word ratio, stopword floor) as per-doc flags plus
  the combined verdict. (Rand et al.'s bullet/ellipsis line rules need
  line structure this corpus doesn't have; the line-free rules are the
  ones implemented, each under its published default threshold.)
- `quality_topk_select`: quality-ranked selection — keep the top-N
  docs per language by the heuristic quality score, the "data budget"
  step that turns a scored corpus into a training mix.
- `zipf_slope`: per-language Zipf fit — the regression slope of
  ln(freq) on ln(rank) over the top vocabulary; natural text sits near
  −1, and a corpus whose slope drifts is a classic generation/boiler-
  plate smell. Uses the built-in regr_slope aggregate (JVM-side).

All three are pure Column-expression plans: one scan of `documents`,
partial aggregation map-side, no Python, no collect. Every comparison
that feeds a flag is computed on 6dp-rounded values so the DuckDB
oracle can't flip a flag on a last-ulp difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import tokens_col
from mimir_spark.operators.textstats import quality_score
from mimir_spark.sources.tables import load_table
from mimir_spark.functions.spread import spread_small_scan

# Gopher rule thresholds (MassiveText defaults, line-free subset).
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_RATIO = 0.8
MIN_STOPWORDS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

TOPQ_PER_LANG = 20
ZIPF_TOP_WORDS = 100


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher rule flags (1 = passes) and the AND of them.

    Ratios divide counts derived from ONE tokenization, so every flag
    is a deterministic function of the text; the whole row is a single
    projection inside codegen — at 100 TB this is a map-only pass that
    fuses with whatever scan feeds it (corpus_clean_pipeline-style).
    """
    # spread: the interpreted HOF flag lambdas below ran on ONE core
    # when the corpus arrives as a single split (measured as a 0.4 s
    # single-task stage inside corpus_keep_list at sf0.1); no-op at
    # cluster scale and on multi-split inputs.
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    # Layered selects, not one flat projection: HOF lambdas (filter)
    # run OUTSIDE whole-stage codegen, where repeated subexpressions
    # are NOT eliminated — a flat projection re-ran split(text) ~15×
    # per row. CollapseProject keeps these layers apart (it refuses to
    # inline a non-cheap expression referenced more than once), so the
    # tokenization happens once and every flag reads materialized
    # columns. Mirrors the oracle's CTE chain.
    t = docs.select(
        "doc_id",
        tokens_col("text").alias("toks"),
        # mean word length via arithmetic on the full string (no
        # per-token lambda): total non-whitespace chars / word count.
        F.length(F.regexp_replace("text", r"\s+", "")).alias("swl"),
    )
    m = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.round(F.col("swl") / F.size("toks"), 6).alias("mean_word_len"),
        F.round(
            F.size(F.filter("toks", lambda t: t.contains("#") | t.contains("...")))
            / F.size("toks"),
            6,
        ).alias("symbol_ratio"),
        F.round(
            F.size(F.filter("toks", lambda t: t.rlike("[A-Za-z]")))
            / F.size("toks"),
            6,
        ).alias("alpha_word_ratio"),
        F.size(F.filter("toks", lambda t: t.isin(*GOPHER_STOPWORDS)))
        .cast("long")
        .alias("n_stopwords"),
    )
    flag = lambda c: c.cast("long")  # noqa: E731 — 0/1 BIGINT on both engines
    f_words = flag(
        (F.col("n_words") >= MIN_WORDS) & (F.col("n_words") <= MAX_WORDS)
    )
    f_mwl = flag(
        (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
    )
    f_sym = flag(F.col("symbol_ratio") <= MAX_SYMBOL_RATIO)
    f_alpha = flag(F.col("alpha_word_ratio") >= MIN_ALPHA_WORD_RATIO)
    f_stop = flag(F.col("n_stopwords") >= MIN_STOPWORDS)
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_ratio",
        "n_stopwords",
        f_words.alias("flag_word_count"),
        f_mwl.alias("flag_mean_word_len"),
        f_sym.alias("flag_symbol_ratio"),
        f_alpha.alias("flag_alpha_words"),
        f_stop.alias("flag_stopwords"),
        (f_words * f_mwl * f_sym * f_alpha * f_stop).alias("passes_gopher"),
    )


def quality_topk_select(
    spark: SparkSession, sf_dir: str, k: int = TOPQ_PER_LANG
) -> DataFrame:
    """Top-k docs per language by quality score (ties → lower doc_id).

    The selection window partitions by language — a handful of
    partitions each holding the per-language candidates, so the sort
    behind row_number is the only shuffle and AQE splits a dominant
    language if skewed. Composes the scored pass (`quality_score`) with
    the lang column; Catalyst collapses the join into the same scan."""
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    return (
        q.join(langs, "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "lang", "quality", "rk")
    )


def zipf_slope(
    spark: SparkSession, sf_dir: str, top_words: int = ZIPF_TOP_WORDS
) -> DataFrame:
    """Per-language Zipf regression: slope of ln(count) on ln(rank)
    over the top `top_words` words (rank ties broken by word so the
    rank assignment is deterministic).

    Two shuffles total at any scale: the (lang, word) count aggregate
    (map-side combined — the reduce side is vocabulary-sized, not
    corpus-sized) and the per-language ranking window over that small
    vocabulary table. regr_slope is a built-in partial-aggregatable
    JVM aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(tokens_col("text")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "word")
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_words
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.round(F.regr_slope(F.log("c"), F.log("rank")), 6).alias("slope"),
        )
        .select("lang", "n_words", "slope")
    )


def unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram cross-entropy against the corpus's own unigram
    LM — the CCNet-style LM-perplexity quality signal (docs made of
    rare/garbled tokens score high, fluent common-token docs score
    low). Production swaps the self-trained LM for a fixed reference
    LM; the plan is identical.

    Shape: one token scan → (doc, word) counts (shuffle 1, map-side
    combined) and the word LM (shuffle 2 over the vocabulary, tiny) →
    LM join (vocab-sized, broadcast here; hash join with AQE at a
    100 TB vocabulary) → per-doc weighted sum (shuffle 3 on doc_id).
    Cross-entropy sums c_dw·ln p(w) over DISTINCT (doc, word) — far
    fewer float terms than per-occurrence averaging, and identically
    grouped on both engines so the 6dp round is stable."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col("text")).alias("w"))
    dw = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c_dw"))
    lm = tok.groupBy("w").agg(F.count("*").alias("c_w"))
    total = lm.agg(F.sum("c_w").cast("double").alias("total"))
    return (
        dw.join(F.broadcast(lm), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dw").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(F.col("c_dw") * F.log(F.col("c_w") / F.col("total")))
                / F.sum("c_dw"),
                6,
            ).alias("cross_entropy"),
        )
    )


def ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail quality split: per language, docs are
    bucketed by their LM cross-entropy (unigram_logppl) against the
    language's p33/p67 thresholds — the partition CCNet publishes its
    corpus in, and the knob ("train on head+middle") most pipelines
    turn first.

    THRESHOLD-based, not ntile: a per-language window over every doc
    row would sort a whole language inside one partition — at 100 TB
    the dominant language IS the corpus. Instead a per-language
    percentile aggregate broadcasts its two cut points back onto the
    scored table, so bucketing is one map-side comparison. Caveat the
    oracle imposes: EXACT percentile buffers the group's values in the
    aggregate state, so at true corpus scale you swap the cut-point
    aggregate for the engine's sketch path (ddsketch_quantiles /
    histogram_quantiles — bounded state, same broadcast-threshold
    plan); exact percentile is the small-SF value-parity choice.
    Thresholds and scores are both 6dp-rounded before comparing
    (engine-portable, same contract as winsorize_events)."""
    ce = unigram_logppl(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = ce.join(langs, "doc_id")
    cuts = scored.groupBy("lang").agg(
        F.round(F.percentile("cross_entropy", 0.33), 6).alias("p33"),
        F.round(F.percentile("cross_entropy", 0.67), 6).alias("p67"),
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "cross_entropy",
            F.when(F.col("cross_entropy") <= F.col("p33"), "head")
            .when(F.col("cross_entropy") <= F.col("p67"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


def bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BIGRAM cross-entropy against the corpus's own
    Laplace-smoothed bigram LM — one order up from unigram_logppl:
    catches shuffled-word salad that unigram perplexity scores as
    fluent (every token common, no token ORDER). p(b|a) =
    (c_ab + 1) / (c_a + V); production swaps in a fixed reference LM,
    the plan is identical.

    Shape: one token scan → per-doc bigram counts (shuffle on
    (doc, w1, w2), map-side combined) → corpus bigram LM folded FROM
    those counts (no second corpus scan; vocabulary-sized shuffles) →
    LM joins on (w1, w2) and w1 (AQE picks broadcast at test scale,
    hash join at a 100 TB vocabulary) → per-doc weighted sum (one
    doc_id shuffle). Terms are summed over DISTINCT (doc, bigram)
    groups, identically grouped on both engines, so the 6dp round is
    stable (same argument as unigram_logppl)."""
    docs = load_table(spark, sf_dir, "documents")
    dab, words = bigram_parts(docs)
    return bigram_ppl_from_parts(dab, words)


def _bigram_stream(docs: DataFrame) -> DataFrame:
    """The ungrouped (doc_id, w1, w2) bigram-occurrence stream — one
    scan, map-only. Shared by bigram_parts (which groups it into the
    per-doc count state) and dsir_weights' bucket-stats pass (which
    folds it straight into the 1024-row feature table, no per-type
    grouping needed)."""
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= 2
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), (i + 1).cast("int")).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")


def bigram_parts(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The two SUM/SET-monoid state tables the bigram LM needs:
    per-doc bigram counts (doc_id, w1, w2, c_dab) and per-doc distinct
    words (doc_id, w). Shared by the batch operator and the streaming
    incremental builder — both are per-doc partials that merge across
    disjoint batches into exactly the single-pass tables."""
    dab = _bigram_stream(docs).groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("long").alias("c_dab")
    )
    words = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("w")
    ).distinct()
    return dab, words


def bigram_ppl_from_parts(dab: DataFrame, words: DataFrame) -> DataFrame:
    """Score from the state tables — the only scoring code path, so
    incremental and single-pass cross-entropies are bit-identical
    (the LM and V are folded FROM the per-doc partials)."""
    lm_ab = dab.groupBy("w1", "w2").agg(F.sum("c_dab").alias("c_ab"))
    lm_a = lm_ab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = words.agg(F.countDistinct("w").cast("double").alias("v"))
    return (
        dab.join(lm_ab, ["w1", "w2"])
        .join(lm_a, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dab").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.col("c_dab")
                    * F.log((F.col("c_ab") + 1) / (F.col("c_a") + F.col("v")))
                )
                / F.sum("c_dab"),
                6,
            ).alias("cross_entropy"),
        )
    )


# ---- DSIR importance resampling (round 10) -----------------------------

DSIR_BUCKETS = 1024
DSIR_EVAL_MOD = 97  # target slice = doc_id % 97 == 0 (contamination_check's convention)


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie, Santurkar, Ma, Liang, "Data
    Selection for Language Models via Importance Resampling", NeurIPS
    2023): score every RAW document by how target-like its hashed
    n-gram feature profile is — logw(doc) = Σ_grams [ln p̂_target(b(g))
    − ln p̂_raw(b(g))] under Laplace-smoothed unigram models over
    hashed word-bigram feature BUCKETS. Resampling raw data ∝
    exp(logw) is the paper's published recipe for matching a target
    domain; here target = the held-out eval slice (doc_id %
    DSIR_EVAL_MOD == 0, the contamination_check convention) and raw =
    everything else, so the weights are a pure function of the corpus.

    Scale shape: one token scan → per-doc bigram counts (the SHARED
    bigram_parts state — shuffle on (doc, w1, w2), map-side combined)
    → bucket stats fold FROM those counts into a FIXED 1024-row table
    (the paper's hashing trick: feature space is O(buckets) however
    large the vocabulary) → broadcast-join the bucket log-ratios back
    and weighted-sum per doc (one doc_id shuffle). Same
    distinct-bigram-group summation + 6dp round + Spark log ↔ DuckDB
    ln contract as bigram_logppl, which the gate has hash-verified
    since r5."""
    docs = load_table(spark, sf_dir, "documents")
    bg = _bigram_stream(docs)
    # Bucket stats folded straight from the OCCURRENCE stream (round
    # 14, guide §2.3/§2.4): Σ_types c_dab·is_target grouped by bucket
    # is identically Σ_occurrences is_target — pure integer sums, so
    # ct/cs/tt/ts (and hence every llr double) are bit-identical to
    # the per-type fold — and the stats pass no longer needs the
    # (doc, w1, w2) string-keyed shuffle at all: its aggregate state
    # is the FIXED 1024-row bucket table, fully map-side combined.
    # The before-plan executed the scan → explode → string-keyed
    # groupBy subtree THREE times (main + stats + totals; no exchange
    # reuse — the main branch's pushed-down eval-slice filter makes
    # its subtree non-identical); now the string shuffle happens once
    # (the per-type scoring sum, whose FP grouping the oracle pins)
    # and the stats scan is map-only.
    from mimir_spark.functions.text import portable_token_hash31

    occ = bg.select(
        F.pmod(
            portable_token_hash31(F.concat_ws(" ", "w1", "w2")),
            F.lit(DSIR_BUCKETS),
        ).alias("bucket"),
        (F.col("doc_id") % DSIR_EVAL_MOD == 0).cast("long").alias(
            "is_target"
        ),
    )
    stats = occ.groupBy("bucket").agg(
        F.sum("is_target").alias("ct"),
        F.sum(1 - F.col("is_target")).alias("cs"),
    )
    dab = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("long").alias("c_dab")
    )
    return _dsir_score(dab, stats)


def _dsir_score(dab: DataFrame, stats: DataFrame) -> DataFrame:
    """Laplace log-ratio fold + per-doc weighted sum over a per-doc
    bigram-count table and a (bucket, ct, cs) stats table. The stats
    table is O(DSIR_BUCKETS) rows — bounded state — so one lazy
    lineage cut lets `totals` fold from it instead of re-running the
    corpus pass that produced it (guide §3.3/§5)."""
    from mimir_spark.functions.text import portable_token_hash31

    stats = stats.localCheckpoint(eager=False)
    totals = stats.agg(F.sum("ct").alias("tt"), F.sum("cs").alias("ts"))
    llr = stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(
                (F.col("ct") + 1)
                / (F.col("tt") + F.lit(float(DSIR_BUCKETS)))
            )
            - F.log(
                (F.col("cs") + 1)
                / (F.col("ts") + F.lit(float(DSIR_BUCKETS)))
            )
        ).alias("llr"),
    )
    return (
        dab.filter(F.col("doc_id") % DSIR_EVAL_MOD != 0)
        .withColumn(
            "bucket",
            F.pmod(
                portable_token_hash31(F.concat_ws(" ", "w1", "w2")),
                F.lit(DSIR_BUCKETS),
            ),
        )
        .join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c_dab").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("c_dab") * F.col("llr")), 6).alias("logw"),
        )
    )


def dsir_weights_from_parts(dab: DataFrame) -> DataFrame:
    """Score from the per-doc bigram-count state table — the only
    scoring code path, shared by the batch operator and the streaming
    finalizer (streaming/ngram_lm.finalize_dsir_weights): bucket
    counts and totals are SUM monoids over disjoint doc batches, so
    incremental and single-pass weights are bit-identical."""
    from mimir_spark.functions.text import portable_token_hash31

    stats = (
        dab.withColumn(
            "bucket",
            F.pmod(
                portable_token_hash31(F.concat_ws(" ", "w1", "w2")),
                F.lit(DSIR_BUCKETS),
            ),
        )
        .withColumn(
            "is_target", (F.col("doc_id") % DSIR_EVAL_MOD == 0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.col("c_dab") * F.col("is_target")).alias("ct"),
            F.sum(F.col("c_dab") * (1 - F.col("is_target"))).alias("cs"),
        )
    )
    return _dsir_score(dab, stats)


def dsir_select(
    spark: SparkSession, sf_dir: str, keep_frac: float = 0.25
) -> DataFrame:
    """The selection step DSIR's weights exist for: keep the most
    target-like ~keep_frac of the raw corpus. THRESHOLD-based, not a
    global top-k window (a corpus-wide row_number would funnel every
    doc through one task — the scale-killer the ccnet_ppl_buckets
    docstring spells out): the (1−keep_frac) weight quantile
    broadcasts as a scalar cut point and selection is one map-side
    comparison; at true scale the exact percentile swaps for the
    engine's sketch path, same plan. Rank selection is the noise-free
    limit of the paper's Gumbel resampling; docs tied AT the 6dp cut
    are all kept, so the kept set is a pure function of the data."""
    scored = dsir_weights(spark, sf_dir)
    cut = scored.agg(
        F.round(F.percentile("logw", 1.0 - keep_frac), 6).alias("cut")
    )
    return (
        scored.crossJoin(F.broadcast(cut))
        .filter(F.col("logw") >= F.col("cut"))
        .select("doc_id", "n_grams", "logw")
    )


# ---- Kneser-Ney bigram LM scoring (round 10) ---------------------------

KN_D = 0.75  # absolute discount (the standard default)


def kneser_ney_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram cross-entropy under an interpolated KNESER-NEY
    LM (Kneser & Ney, ICASSP 1995; Chen & Goodman 1998's interpolated
    form) — the standard step up from bigram_logppl's Laplace
    smoothing: probability mass freed by absolute discounting (D =
    0.75) is spent on the CONTINUATION unigram (how many distinct
    contexts a word follows — 'Francisco' is frequent but follows
    almost nothing except 'San', so its continuation weight is tiny),
    which is what actually separates boilerplate from prose:

      p_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
                    + D·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)

    All four count tables fold FROM the shared bigram_parts state (no
    extra corpus scan): corpus bigram counts, left-context totals +
    distinct-successor counts, distinct-predecessor counts, and the
    distinct-bigram scalar. Scored docs' bigrams all occur in the LM
    (trained on the same corpus), so p > 0 with no unseen-mass term.
    Same distinct-group summation + 6dp + identical expression
    parenthesization on both engines as bigram_logppl."""
    docs = load_table(spark, sf_dir, "documents")
    dab, _ = bigram_parts(docs)
    lm_ab = dab.groupBy("w1", "w2").agg(F.sum("c_dab").alias("c_ab"))
    lm_a = lm_ab.groupBy("w1").agg(
        F.sum("c_ab").alias("c_a"),
        F.count("*").cast("long").alias("n1p_fw"),
    )
    cont = lm_ab.groupBy("w2").agg(
        F.count("*").cast("long").alias("n1p_bw")
    )
    nbig = lm_ab.agg(F.count("*").cast("long").alias("nb"))
    p_kn = (
        F.greatest(F.col("c_ab") - F.lit(KN_D), F.lit(0.0)) / F.col("c_a")
        + (F.lit(KN_D) * F.col("n1p_fw") / F.col("c_a"))
        * (F.col("n1p_bw") / F.col("nb"))
    )
    return (
        dab.join(lm_ab, ["w1", "w2"])
        .join(lm_a, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nbig))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dab").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("c_dab") * F.log(p_kn)) / F.sum("c_dab"), 6
            ).alias("cross_entropy"),
        )
    )


# ---- trigram interpolated Kneser-Ney (round 11) --------------------------


def trigram_parts(docs: DataFrame) -> DataFrame:
    """Per-doc TRIGRAM counts (doc_id, w1, w2, w3, c_dabc) — the single
    SUM-monoid state table the trigram KN chain folds from (the
    trigram generalization of bigram_parts; per-doc partials merge
    across disjoint batches into exactly the single-pass table, so a
    streaming incremental builder shares it unchanged)."""
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= 3
    )
    tg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), (i + 1).cast("int")).alias("w2"),
                    F.element_at(F.col("t"), (i + 2).cast("int")).alias("w3"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2", "g.w3")
    return tg.groupBy("doc_id", "w1", "w2", "w3").agg(
        F.count("*").cast("long").alias("c_dabc")
    )


def kneser_ney3_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc TRIGRAM cross-entropy under interpolated Kneser-Ney —
    the order-3 step up from kneser_ney_logppl that actually catches
    recombined-bigram word salad: a doc stitched from frequent bigrams
    ("x a" + "a z" where "x a z" never occurs) scores fluent under any
    bigram LM but earns c(w1w2w3)=1 against a large c(w1w2) here.

    The full KenLM-style ADJUSTED-COUNT chain (Chen & Goodman 1998,
    §4.1.6), every table folded from ONE trigram_parts state — no
    second or third corpus scan:

      top:  p3(w3|w1w2) = max(c(w1w2w3)−D,0)/c(w1w2)
                          + D·N1+(w1w2·)/c(w1w2) · p2(w3|w2)
      mid:  p2(w3|w2)   = max(a(w2w3)−D,0)/a(w2·)
                          + D·N1+(w2·*)/a(w2·) · p1(w3)
      low:  p1(w3)      = a(·w3)/a(··)

    where a(w2w3) = N1+(·w2w3) (distinct left-extensions — the
    'adjusted' count that makes lower orders CONTINUATION
    distributions: 'Francisco' is frequent but follows only 'San', so
    a(·francisco) is tiny), a(w2·) = Σ_w3 a(w2w3), N1+(w2·*) = number
    of distinct w3 with a(w2w3)>0, a(·w3) = distinct w2 preceding w3
    among adjusted bigrams, a(··) = total adjusted bigram types.
    Scored docs' trigrams all occur in the LM (trained on the same
    corpus), so every interpolation level is positive — no
    unseen-mass term. Same distinct-group summation + 6dp + identical
    parenthesization on both engines as kneser_ney_logppl.

    Shape: token scan → per-doc trigram counts (shuffle on (doc, w1,
    w2, w3), map-side combined) → four type-count tables folded from
    lm_abc (vocabulary-sized shuffles) → joins back on (w1,w2,w3) /
    (w1,w2) / (w2,w3) / w2 / w3 keys (AQE broadcasts at test scale,
    hash joins at a 100 TB vocabulary) → one doc_id shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return kneser_ney3_from_parts(trigram_parts(docs))


def kneser_ney3_from_parts(dabc: DataFrame) -> DataFrame:
    """Score from the trigram state table — the only scoring code
    path, so the streaming incremental builder's finalize is
    bit-identical to the single-pass operator (every LM table folds
    FROM the per-doc partials; see kneser_ney3_logppl for the model)."""
    # lm_abc (trigram TYPES) feeds ctx_ab, adj2 and the scoring join;
    # adj2 (bigram types) feeds ctx_b, adj1, nb2 and the scoring join.
    # Both are bounded LM-state tables (type counts, not corpus rows)
    # — exactly what a real LM build would materialize — so a lazy
    # lineage cut computes each once instead of once per branch
    # (runtime exchange reuse only shares the upstream dabc exchange,
    # not these aggregations).
    lm_abc = (
        dabc.groupBy("w1", "w2", "w3")
        .agg(F.sum("c_dabc").alias("c_abc"))
        .localCheckpoint(eager=False)
    )
    ctx_ab = lm_abc.groupBy("w1", "w2").agg(
        F.sum("c_abc").alias("c_ab"),
        F.count("*").cast("long").alias("n1p_fw"),
    )
    adj2 = (
        lm_abc.groupBy("w2", "w3")
        .agg(F.count("*").cast("long").alias("a_bc"))
        .localCheckpoint(eager=False)
    )
    ctx_b = adj2.groupBy("w2").agg(
        F.sum("a_bc").alias("a_b"),
        F.count("*").cast("long").alias("n1p_fw2"),
    )
    adj1 = adj2.groupBy("w3").agg(F.count("*").cast("long").alias("a_c"))
    nb2 = adj2.agg(F.count("*").cast("long").alias("nb"))
    p_uni = F.col("a_c") / F.col("nb")
    p_mid = (
        F.greatest(F.col("a_bc") - F.lit(KN_D), F.lit(0.0)) / F.col("a_b")
        + (F.lit(KN_D) * F.col("n1p_fw2") / F.col("a_b")) * p_uni
    )
    p_tri = (
        F.greatest(F.col("c_abc") - F.lit(KN_D), F.lit(0.0)) / F.col("c_ab")
        + (F.lit(KN_D) * F.col("n1p_fw") / F.col("c_ab")) * p_mid
    )
    return (
        dabc.join(lm_abc, ["w1", "w2", "w3"])
        .join(ctx_ab, ["w1", "w2"])
        .join(adj2, ["w2", "w3"])
        .join(ctx_b, "w2")
        .join(adj1, "w3")
        .crossJoin(F.broadcast(nb2))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dabc").cast("long").alias("n_trigrams"),
            F.round(
                -F.sum(F.col("c_dabc") * F.log(p_tri)) / F.sum("c_dabc"), 6
            ).alias("cross_entropy"),
        )
    )


# ---- Gopher repetition rules (round 11) -----------------------------------

# (fraction column, threshold) — Rae et al. 2021, Table A1; a doc is
# filtered when a fraction EXCEEDS its threshold. The line/paragraph
# rules need line structure this corpus doesn't have (single-space
# token streams); the n-gram rules are the complete remaining family.
REPETITION_THRESHOLDS = (
    ("top2_frac", 0.20),
    ("top3_frac", 0.18),
    ("top4_frac", 0.16),
    ("dup5_frac", 0.15),
    ("dup6_frac", 0.14),
    ("dup7_frac", 0.13),
    ("dup8_frac", 0.12),
    ("dup9_frac", 0.11),
    ("dup10_frac", 0.10),
)


def repetition_stats(text: str) -> dict:
    """Per-doc n-gram repetition fractions (pure function — the unit
    the Arrow kernel maps over and tests exercise with crafted text):
    top-n-gram char fraction for n=2..4, duplicate-n-gram coverage
    char fraction for n=5..10. See gopher_repetition_filter."""
    from mimir_spark.functions.pykernels import JAVA_WS

    toks = [t for t in JAVA_WS.split(text) if t] if text else []
    lens = [len(t) for t in toks]
    total = sum(lens)
    nt = len(toks)
    out = {}
    for n in (2, 3, 4):
        frac = 0.0
        if total and nt >= n:
            cnt: dict = {}
            csum: dict = {}
            w = sum(lens[:n])
            for i in range(nt - n + 1):
                if i:
                    w += lens[i + n - 1] - lens[i - 1]
                g = "\x00".join(toks[i : i + n])
                c = cnt.get(g)
                if c is None:
                    cnt[g] = 1
                    csum[g] = w
                else:
                    cnt[g] = c + 1
            cmax = max(cnt.values())
            h = max(csum[g] for g, c in cnt.items() if c == cmax)
            frac = (cmax * h) / total
        out[f"top{n}_frac"] = frac
    for n in range(5, 11):
        frac = 0.0
        if total and nt >= n:
            cnt = {}
            grams = []
            for i in range(nt - n + 1):
                g = "\x00".join(toks[i : i + n])
                grams.append(g)
                cnt[g] = cnt.get(g, 0) + 1
            covered = bytearray(nt)
            for i, g in enumerate(grams):
                if cnt[g] >= 2:
                    covered[i : i + n] = b"\x01" * n
            if any(covered):
                frac = (
                    sum(l for l, c in zip(lens, covered) if c) / total
                )
        out[f"dup{n}_frac"] = frac
    return out


def gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER half of the published Gopher/MassiveText gate (the
    word-level rules live in gopher_quality_filter): per-doc n-gram
    REPETITION fractions —

    - top-n-gram character fraction (n = 2, 3, 4): characters claimed
      by the most frequent n-gram = C·H / total_chars, where C is the
      max occurrence count and H the char length (sum of token
      lengths) of the longest n-gram attaining C — the (count, chars)
      pair determines the fraction, so no lexicographic tie-break is
      needed;
    - duplicate-n-gram character fraction (n = 5..10): characters at
      token positions covered by ANY occurrence of an n-gram that
      appears ≥2 times in the doc (positions counted once — the
      paper's "without double-counting" coverage semantics);

    plus the combined pass flag under the published thresholds.

    Scale shape: every statistic is doc-local, so the whole operator
    is ONE map-only Arrow pass — no shuffle at any corpus size (the
    per-doc dict state is bounded by that doc's token count). The
    JVM-expression alternative (explode 9 n-gram tables + doc-keyed
    groupBy) shuffles ~9× the corpus tokens for the same answer.

    Portability: fractions are single IEEE divisions of exact
    integers (C·H, covered chars, total chars < 2^53), bit-equal in
    any engine; flags compare 6dp-rounded values on both sides.
    Tokenization is the Java \\s class shared with the sketch family
    (functions/pykernels.JAVA_WS)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")

    out_schema = (
        "doc_id long, top2_frac double, top3_frac double, top4_frac double, "
        "dup5_frac double, dup6_frac double, dup7_frac double, "
        "dup8_frac double, dup9_frac double, dup10_frac double"
    )

    def _rep_kernel(batches):
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"].to_numpy(),
            }
            cols = {name: [] for name, _ in REPETITION_THRESHOLDS}
            for text in pdf["text"]:
                stats = repetition_stats(text)
                for name, _ in REPETITION_THRESHOLDS:
                    cols[name].append(stats[name])
            out.update(cols)
            yield pd.DataFrame(out)

    raw = spread_small_scan(
        docs.select("doc_id", "text")
    ).mapInPandas(_rep_kernel, out_schema)
    rounded = raw.select(
        "doc_id",
        *[
            F.round(F.col(name), 6).alias(name)
            for name, _ in REPETITION_THRESHOLDS
        ],
    )
    passed = F.lit(True)
    for name, thr in REPETITION_THRESHOLDS:
        passed = passed & (F.col(name) <= F.lit(thr))
    return rounded.withColumn("pass", passed.cast("long"))
