"""Corpus-curation pipeline operators: deterministic sampling and the
end-to-end clean step a training-data build runs before tokenization.

Both are pure Column-expression plans (no UDFs), so they compose with
any upstream filter and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.spread import spread_small_scan
from mimir_spark.functions.text import tokens_col
from mimir_spark.sources.tables import load_table

# Knuth multiplicative hash constants — plain integer arithmetic so the
# EXACT same formula runs in the DuckDB oracle (engine hash functions
# like xxhash64 are not portable across engines).
_HASH_MULT = 2654435761
_HASH_MOD = 4294967296


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep 10% of 'en' docs and 30%
    of every other language, selected by a multiplicative hash of
    doc_id — reproducible across runs, engines, and cluster sizes
    (unlike rng-based df.sample, whose output depends on partitioning).
    This is how a 100 TB corpus pins its eval split."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD) % 100
    rate = F.when(F.col("lang") == "en", 10).otherwise(30)
    return docs.filter(bucket < rate).select("doc_id", "lang")


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pre-tokenization clean, one declarative plan:
    exact-dedup (keep min doc_id per text) → repetition filter
    (max-word-frequency ratio ≤ 0.12, drops the ~20% most
    repetitive docs) → length filter (20..10000 whitespace tokens,
    drops the shortest ~10%). Returns surviving (doc_id, lang, n_tokens).

    Catalyst fuses all three stages over ONE scan of documents; the
    shuffles are the dedup window (keyed on the text hash) and the
    per-(doc, word) count — both map-side-combined. No stage
    materializes an intermediate corpus, which is what makes
    clean-then-tokenize one job instead of three at 100 TB."""
    # spread: the xxhash window key and the token explode below ran on
    # ONE core on a single-split corpus (two 0.3 s single-task stages
    # inside corpus_keep_list at sf0.1); no-op at cluster scale.
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    # survivors of exact dedup: smallest doc_id per identical text.
    # Key = (hash, length, text): the fixed-width prefix carries the
    # shuffle/sort work, the trailing text makes equality exact (no
    # silent merge on a 64-bit collision — see dedup_exact).
    from pyspark.sql import Window

    w = Window.partitionBy(
        F.xxhash64("text"), F.length("text"), F.col("text")
    ).orderBy("doc_id")
    survivors = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )
    word_counts = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    stats = word_counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("rep_ratio"),
        F.sum("c").alias("n_tokens"),
    )
    return (
        survivors.join(stats, "doc_id")
        .filter(
            (F.col("rep_ratio") <= 0.12)
            & F.col("n_tokens").between(20, 10000)
        )
        .select("doc_id", "lang", "n_tokens")
    )


RESERVOIR_K = 16


def sample_reservoir(
    spark: SparkSession, sf_dir: str, k: int = RESERVOIR_K
) -> DataFrame:
    """Deterministic fixed-size sample per language: exactly k docs per
    stratum (fewer if the stratum is smaller), chosen as the k smallest
    multiplicative-hash values of doc_id — the reproducible analogue of
    a per-stratum reservoir sample. Where `sample_stratified` fixes the
    RATE (output size drifts with the stratum), this fixes the SIZE —
    the eval-split / human-review-batch contract.

    Shape: rank = row_number over (hash, doc_id) per language, filtered
    to ≤ k. Spark's WindowGroupLimit pushes the rank filter into the
    sort (each partition keeps a k-sized heap before the exchange), so
    the shuffle carries ≤ k·partitions rows per language, never the
    stratum — the distributed-TakeOrdered shape, same as vocab_encode."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    u = (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)
    w = Window.partitionBy("lang").orderBy(u.alias("u"), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "lang", "rk")
    )


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED deterministic sampling: each doc is kept with
    probability proportional to its length signal
    w = min(1, n_chars / 400) — the "sample long documents more"
    downweighting a mixture builder applies to boilerplate-heavy
    sources. Selection is u(doc_id) < w with u a multiplicative hash
    normalized to [0,1): reproducible across runs, engines, and
    partitionings (same contract as sample_stratified), and
    map-only — the decision never shuffles anything."""
    docs = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)) / F.lit(
        float(_HASH_MOD)
    )
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    return (
        docs.withColumn("keep_weight", F.round(w, 6))
        .filter(u < w)
        .select("doc_id", "lang", "source", "keep_weight")
    )


SPLIT_VAL_PCT = 5
SPLIT_TEST_PCT = 5


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment per document —
    the split every training run pins before anything else. The split
    is a pure function of doc_id (multiplicative hash mod 100, same
    portable constants as sample_stratified): reproducible across
    runs, engines, partitionings, and corpus growth — a document keeps
    its split forever, so refreshing the corpus never leaks val/test
    docs into train. Map-only: the assignment costs one projection,
    no shuffle; the per-(lang, split) count summary is the only
    aggregate. Output: (lang, split, n_docs, n_tokens)."""
    from mimir_spark.functions.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD) % 100
    split = (
        F.when(bucket < SPLIT_TEST_PCT, "test")
        .when(bucket < SPLIT_TEST_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("train")
    )
    return (
        docs.select(
            "lang", split.alias("split"), F.size(tokens_col("text")).alias("n_toks")
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )

def corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END keep-list a pre-training corpus build
    materializes, composed from the pipeline's own stages in one
    declarative plan: corpus_clean_pipeline (exact dedup + repetition
    + length gates) ∩ Gopher rule pass ∩ decontaminated (eval split +
    n-gram overlap removed) ∖ near-dup losers (MinHash-LSH clusters
    minus their survivors). Returns (doc_id, lang, n_tokens) — the
    manifest downstream mixing/packing reads.

    Scale shape: every leg is an existing bounded-shuffle operator;
    the composition is three semi/anti joins on doc_id — an 8-byte
    key — so the integration layer adds no new scan of text. Fusing
    them in one plan (instead of materializing per-stage corpora) is
    what makes clean→filter→dedup→decontaminate one job at 100 TB.
    Oracle: the conjunction of the four stages' own oracle chains.

    Shared-scan discipline (round 14): the LSH leg used to run TWICE —
    dedup_clusters for membership and dedup_survivors for the
    keep-one-per-cluster set each re-derived signatures → banding →
    candidate verify → min-label propagation. The cluster table is now
    computed ONCE, localCheckpointed, and the losers derived from it
    with one window (rn > 1 under the survivor order) — identical
    output, half the LSH stages."""
    from mimir_spark.operators.corpus import decontaminate_corpus
    from mimir_spark.operators.dedup import dedup_clusters
    from mimir_spark.operators.quality import gopher_quality_filter
    from pyspark.sql import Window

    clean = corpus_clean_pipeline(spark, sf_dir)
    gop = (
        gopher_quality_filter(spark, sf_dir)
        .filter(F.col("passes_gopher") == 1)
        .select("doc_id")
    )
    # No checkpoint here: the cluster table is consumed exactly once
    # (the losers window below), so a lineage cut buys nothing — the
    # eager materialization it used to do just serialized one extra
    # full pass of the cluster table before the composed plan could
    # even be submitted. dedup_clusters' own internal per-round
    # checkpoints still bound the label-propagation lineage.
    clusters = dedup_clusters(spark, sf_dir, pair_source="lsh")
    docs_len = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    # dedup_survivors' keep rule (longest doc, ties → lowest id): the
    # non-rank-1 members ARE the losers — no second cluster build, no
    # anti-join
    losers = (
        clusters.join(docs_len, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    decont = decontaminate_corpus(spark, sf_dir).select("doc_id")
    return (
        clean.join(gop, "doc_id", "left_semi")
        .join(decont, "doc_id", "left_semi")
        .join(losers, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens")
    )

SAMPLE_TEMPERATURE = 0.5
SAMPLE_BUDGET = 0.3


def sample_quality_temperature(
    spark: SparkSession,
    sf_dir: str,
    temperature: float = SAMPLE_TEMPERATURE,
    budget: float = SAMPLE_BUDGET,
) -> DataFrame:
    """Temperature-scaled quality RESAMPLING — the softmax-style
    upweighting a modern pre-training mix applies (keep high-quality
    docs with higher probability instead of hard-thresholding): weight
    w = exp(quality / T), acceptance p = min(1, c·w) with c calibrated
    so the expected keep-rate is `budget`, decision u(doc_id) < p with
    the shared multiplicative-hash u — reproducible across runs,
    engines, and partitionings, and map-only after one scalar agg.

    Determinism plumbing: quality and w are 6dp-rounded, the weight
    SUM is rounded to 4dp (its partial-agg association noise is ~1e-6
    absolute at any SF — two decades below the grid), and p is
    6dp-rounded — so the kept SET is a pure function of the data and
    the DuckDB oracle replicates the whole chain including the
    calibration constant."""
    from mimir_spark.operators.textstats import quality_score

    wq = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(
            F.exp(F.col("quality") / F.lit(float(temperature))), 6
        ).alias("w"),
    )
    tot = wq.agg(
        F.round(F.sum("w"), 4).alias("sw"), F.count("*").alias("n")
    )
    u = ((F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)) / F.lit(
        float(_HASH_MOD)
    )
    p = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(budget)) * F.col("n") / F.col("sw") * F.col("w"),
        ),
        6,
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return (
        wq.join(F.broadcast(tot))
        .select("doc_id", p.alias("keep_p"))
        .filter(u < F.col("keep_p"))
        .join(docs, "doc_id")
        .select("doc_id", "lang", "source", "keep_p")
    )


WEIGHTED_K = 16


def sample_weighted_k(
    spark: SparkSession, sf_dir: str, k: int = WEIGHTED_K
) -> DataFrame:
    """Exact-k WEIGHTED sampling without replacement per language
    (round 11; Efraimidis & Spirakis, IPL 2006 "A-ES"): each doc draws
    key = u^(1/w) with u the portable multiplicative hash normalized
    to (0,1) and w = min(1, n_chars/400) (sample_weighted's length
    weight); the k LARGEST keys per stratum are exactly a weighted
    sample without replacement. Completes the sampling family:
    fixed-rate (sample_stratified), fixed-size uniform
    (sample_reservoir), weighted Bernoulli (sample_weighted,
    drifting output size), temperature resampling — this is the
    fixed-SIZE weighted contract.

    Ranking uses ln(u)/w (monotone in u^(1/w) since both engines
    compute the same ln inputs; the 9dp grid + doc_id tie-break pins
    the order — the ICWS ln-portability precedent), so no pow() is
    evaluated at all. Same WindowGroupLimit shape as sample_reservoir:
    per-partition k-heaps before the exchange, shuffle carries
    ≤ k·partitions rows per language at any corpus size."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    u = (
        (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD) + 1.0
    ) / F.lit(float(_HASH_MOD))
    wgt = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    key = F.round(F.log(u) / wgt, 9)
    w = Window.partitionBy("lang").orderBy(
        F.col("key").desc(), F.col("doc_id")
    )
    return (
        docs.withColumn("key", key)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "lang", F.round(wgt, 6).alias("weight"), "rk")
    )


HRW_SHARDS = 8


def rendezvous_shards(
    spark: SparkSession, sf_dir: str, n_shards: int = HRW_SHARDS
) -> DataFrame:
    """RENDEZVOUS (highest-random-weight) sharding report (Thaler &
    Ravishankar '98 — the consistent-placement scheme behind cache
    rings and shard routers): each doc goes to argmax_s h(doc, s),
    which gives the minimal-disruption property that resizing from N
    to N−1 shards remaps ONLY the removed shard's docs (pytest-pinned)
    — unlike mod-N sharding, which reshuffles nearly everything.

    Map-only: n_shards portable hashes per row, one argmax, then a
    map-side-combined shard count. Weights are md5-31 of
    'doc_id:shard' (pure function of the key — stable across engines,
    partitionings and reruns). Output: (shard, n_docs, share).
    """
    docs = load_table(spark, sf_dir, "documents")
    weights = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit(f":{s}")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .bitwiseAND(F.lit(2_147_483_647))
            for s in range(n_shards)
        ]
    )
    shard = (F.array_position(weights, F.array_max(weights)) - 1).cast(
        "long"
    )
    counts = (
        docs.select(shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    total = counts.agg(F.sum("n_docs").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            F.round(F.col("n_docs") / F.col("t"), 6).alias("share"),
        )
    )


KFOLD_K = 5


def kfold_assign(
    spark: SparkSession, sf_dir: str, k: int = KFOLD_K
) -> DataFrame:
    """EXACTLY-stratified k-fold assignment for cross-validation:
    within each language, docs are ranked by their portable
    multiplicative hash (ties → doc_id) and fold = (rank−1) mod k, so
    per-(lang, fold) sizes differ by AT MOST 1 — the exactness a
    5-fold eval wants, which hash-mod-k splits only approximate.

    The deliberate contrast with train_val_test_split: THAT split is a
    pure function of doc_id so membership survives corpus growth
    (no leakage across refreshes); a k-fold is for a FROZEN evaluation
    snapshot, and buys exact stratification with one rank window per
    language instead. Output: (lang, fold, n_docs, n_tokens).
    """
    from pyspark.sql import Window

    from mimir_spark.functions.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select(
            "lang",
            "doc_id",
            F.size(tokens_col("text")).alias("n_toks"),
            ((F.row_number().over(w) - 1) % k).cast("long").alias("fold"),
        )
        .groupBy("lang", "fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
