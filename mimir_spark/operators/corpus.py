"""Corpus-level analytics for training-data builds: benchmark
contamination checking, per-doc token entropy, length-distribution
reports, and source-mix composition.

All four are pure Column-expression plans (JVM-side, codegen'd) with
DuckDB-portable arithmetic so every one is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.spread import spread_small_scan
from mimir_spark.functions.text import tokens_col, word_shingles
from mimir_spark.operators.dedup import SHINGLE_WORDS
from mimir_spark.sources.tables import load_table

# Every ~97th doc plays the "benchmark/eval set" role in the
# contamination check — in production this is the held-out eval corpus.
EVAL_MOD = 97
MIN_COMMON_SHINGLES = 2


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: for every training doc, count the
    distinct word shingles it shares with each eval-set doc; report
    pairs sharing ≥ MIN_COMMON_SHINGLES (the n-gram-overlap test every
    serious pre-training build runs before training).

    Scale shape: eval sets are tiny relative to the corpus (here ~1%,
    in production a fixed few-MB benchmark suite), so the eval shingle
    table is BROADCAST and the corpus side streams through one
    map-side hash join — no shuffle of corpus shingles, no self-join.
    The only shuffle is the (doc, eval_doc) counting aggregate, which
    is candidate-sized.
    """
    # spread: the shingle explode + broadcast probe ran on ONE core on
    # a single-split corpus (a 0.5 s single-task stage inside
    # corpus_keep_list at sf0.1); no-op at cluster scale.
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id", F.explode(word_shingles("text", SHINGLE_WORDS)).alias("sh")
    )
    eval_sh = sh.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "sh"
    )
    corpus_sh = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        corpus_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= MIN_COMMON_SHINGLES)
    )


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty: the share of a doc's distinct shingles whose
    FIRST appearance (by doc_id order) is in that doc — the incremental
    n-gram novelty curve a dataset-mixing decision reads (a doc full of
    already-seen shingles adds nothing at its position in the stream).

    Two keyed aggregations: per-shingle min doc_id (shuffle on the
    shingle), then the join back + per-doc ratio (shuffle on doc_id).
    Both are map-side combined; no self-join anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(word_shingles("text", SHINGLE_WORDS)).alias("sh")
    )
    first_seen = ex.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        ex.join(first_seen, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_shingles"), 6)
        )
    )


def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon entropy of the token distribution (nats) — low
    entropy flags repetitive/templated docs a quality filter drops.

    Uses the single-aggregate identity H = ln(n) − (Σ c·ln c)/n so the
    whole computation is two keyed aggregations (per-(doc,word) count,
    then per-doc), both map-side combined; the SAME formula runs in the
    oracle so float results agree to the rounding precision."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(tokens_col("text")).alias("word"))
    per_word = words.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log("c")).alias("clc"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.round(F.log("n") - F.col("clc") / F.col("n"), 6).alias("entropy"),
        )
    )


def doc_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-distribution report: doc count, mean chars,
    and exact interpolated p50/p90/p99 — the profile that sizes
    truncation/packing decisions for a tokenizer run. One groupBy;
    `percentile` is Spark's exact interpolated quantile, matching
    DuckDB's quantile_cont."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        F.round(F.percentile("n_chars", 0.5), 4).alias("p50_chars"),
        F.round(F.percentile("n_chars", 0.9), 4).alias("p90_chars"),
        F.round(F.percentile("n_chars", 0.99), 4).alias("p99_chars"),
    )


VOCAB_SIZE = 25
OOV_ID = 0


def vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + token-id encoding — the core of a tokenizer
    pipeline: rank the top VOCAB_SIZE words by corpus frequency
    (ties → lexicographic), assign ids 1..V, encode every doc's token
    stream (OOV → 0), and report per doc the token/OOV counts plus the
    first 16 ids as a portable witness of the full encoding.

    Scale shape: the vocab is selected with a distributed
    orderBy+limit (TakeOrdered — no global sort materialization) and
    only the V surviving rows pass through the ranking window (single
    tiny partition BY CONSTRUCTION, not by luck); encoding is a
    broadcast join of that V-row table onto the exploded token stream;
    the per-doc fan-in is one groupBy with an order-restoring
    sort_array(collect_list(struct(pos, id)))."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "word")
    )
    counts = words.groupBy("word").agg(F.count("*").alias("c"))
    vocab = (
        counts.orderBy(F.col("c").desc(), "word")
        .limit(VOCAB_SIZE)
        .withColumn(
            "id",
            F.row_number().over(
                Window.orderBy(F.col("c").desc(), "word")  # V-bounded
            ).cast("long"),
        )
        .select("word", "id")
    )
    enc = words.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(OOV_ID)).alias("id")
    )
    ordered_ids = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "id"))),
        lambda s: s["id"].cast("string"),
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("id") == OOV_ID, 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.array_join(F.slice(ordered_ids, 1, 16), ",").alias("ids_prefix"),
    )


def source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition: per (lang, source) doc count, char volume,
    and each source's share of its language's docs — the mix table a
    data-curation review reads first. Aggregate-then-window: the share
    window runs over the (lang, source) AGGREGATE (tiny), never the
    raw corpus."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    w = Window.partitionBy("lang")
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "sum_chars",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("doc_share"),
    )


MIN_PAIR_COUNT = 5


def cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs:
    pmi(w1,w2) = ln(c12·N / (c1·c2)) with c1/c2 the left/right
    marginals over all bigram occurrences and N their total — the
    collocation signal behind phrase mining and tokenizer-merge
    scoring. Pairs below MIN_PAIR_COUNT occurrences are dropped (PMI
    of rare pairs is noise).

    Scale shape: one corpus scan explodes bigrams into a (w1,w2)
    count aggregate (map-side combined; the reduce side is
    vocabulary², not corpus-sized). Marginals are re-aggregations of
    that pair table — no second corpus pass — and join back on word
    keys; N is a 1-row broadcast cross join. All downstream of the
    first aggregate is vocabulary-scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    # adjacent pairs via zip_with + slice (the O(n) shingling form)
    pair = F.zip_with(
        toks,
        F.slice(toks, 2, 1 << 30),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bigrams = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= 2, F.slice(pair, 1, F.size(toks) - 1)
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pc = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    left = pc.groupBy("w1").agg(F.sum("n_pair").alias("c1"))
    right = pc.groupBy("w2").agg(F.sum("n_pair").alias("c2"))
    total = pc.agg(F.sum("n_pair").cast("double").alias("n_total"))
    return (
        pc.filter(F.col("n_pair") >= MIN_PAIR_COUNT)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            # marginal product in double: exact below 2^53 (matching
            # the oracle's exact integer product → double divide) and
            # overflow-proof at corpus scale where c1·c2 exceeds long
            F.round(
                F.log(
                    (F.col("n_pair") * F.col("n_total"))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def cross_source_duplication(
    spark: SparkSession, sf_dir: str, n_words: int = 8
) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how
    many distinct document HEADS (first `n_words` words — the same
    boilerplate key as `dedup_prefix`) appear in both — the report
    that tells a corpus build which crawls/dumps are re-serving the
    same content (and therefore which source pair's union needs dedup
    before mixture weights mean anything). Keyed on the prefix rather
    than the full text so shared headers/navigation blocks count even
    when the page bodies diverge.

    Scale shape: heads are reduced to md5 digests immediately (never
    text as a join/shuffle key), projected to DISTINCT
    (digest, source) — corpus-sized shuffle with map-side combine —
    then self-joined on digest. Per-digest group size is bounded by
    the number of sources (20 here, a few hundred in production), so
    the equi-join fans out at most |sources| per key: no quadratic
    blowup, no skew cliff. The final aggregate is |sources|² rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    head = F.concat_ws(" ", F.slice(tokens_col("text"), 1, n_words))
    hs = docs.select(F.md5(head).alias("h"), "source").distinct()
    a = hs.alias("a")
    b = hs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared_texts"))
    )


def decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the training corpus (non-eval docs)
    minus every doc `contamination_check` flags — the keep-list a
    pre-training build materializes after the overlap scan, with the
    doc's metadata carried through for downstream mixing.

    Plan: the contaminated set is candidate-sized (output of the
    broadcast overlap join), so the removal is a LEFT ANTI join of the
    corpus against a small distinct projection — the corpus streams
    through once; no shuffle grows with the eval set."""
    docs = load_table(spark, sf_dir, "documents")
    contaminated = (
        contamination_check(spark, sf_dir).select("doc_id").distinct()
    )
    return (
        docs.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus summary — the numbers a dataset card leads with:
    document/token/language/source counts, length stats, the exact-
    duplicate rate, and the Gopher-rule pass rate. Assembled from four
    independent 1-row aggregates cross-joined (each is broadcast; the
    corpus is scanned twice — once for token/length stats, once inside
    the quality pass — and nothing is ever collected).

    All ratios are 6dp-rounded; counts are BIGINT on both engines."""
    from mimir_spark.functions.text import tokens_col
    from mimir_spark.operators.quality import gopher_quality_filter

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", "source", "text", F.size(tokens_col("text")).alias("n_toks")
    )
    main = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.round(F.avg("n_toks"), 4).alias("mean_doc_tokens"),
    )
    dup = base.agg(
        (F.count("*") - F.countDistinct("text")).cast("long").alias("n_exact_dups")
    )
    gq = gopher_quality_filter(spark, sf_dir).agg(
        F.round(F.avg("passes_gopher"), 6).alias("gopher_pass_rate")
    )
    return (
        main.crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(gq))
        .withColumn(
            "exact_dup_rate",
            F.round(F.col("n_exact_dups") / F.col("n_docs"), 6),
        )
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Corpus VERSION diff — the artifact a dataset release pipeline
    publishes between snapshots: per status (added / removed /
    changed / unchanged), document and character counts. Classifies
    by full-outer join on doc_id with EXACT text comparison (the text
    rides the diff shuffle anyway in any job that wants the changed
    content; a 100 TB variant that only needs counts can pre-project
    to (doc_id, xxhash64(text), n_chars) and shuffle 16 bytes a row —
    same plan shape, weaker equality).

    One shuffle per side (doc_id), AQE-sized; output is 4 rows."""
    a = old.select(
        F.col("doc_id"),
        F.col("text").alias("text_a"),
        F.col("n_chars").alias("nc_a"),
    )
    b = new.select(
        F.col("doc_id"),
        F.col("text").alias("text_b"),
        F.col("n_chars").alias("nc_b"),
    )
    status = (
        F.when(F.col("text_a").isNull(), F.lit("added"))
        .when(F.col("text_b").isNull(), F.lit("removed"))
        .when(F.col("text_a") == F.col("text_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        a.join(b, "doc_id", "full_outer")
        .select(
            status.alias("status"),
            F.coalesce("nc_b", "nc_a").alias("nc"),
        )
        .groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("n_chars"),
        )
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() wrapper: diff the documents table against a
    deterministically perturbed second snapshot (remove doc_id%10==3,
    append a marker token to doc_id%7==0, add copies under
    doc_id+10_000_000 for doc_id%13==0) — a hermetic stand-in for two
    real corpus versions; the operator itself (`snapshot_diff`) takes
    any two snapshots."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(F.col("doc_id") % 10 != 3)
    modified = kept.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    ).withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 7 == 0, F.col("n_chars") + F.lit(5)
        ).otherwise(F.col("n_chars")),
    )
    added = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    new = modified.unionByName(added)
    return snapshot_diff(docs, new)


def gini_source_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GINI COEFFICIENT of the corpus's source contribution — the
    one-number concentration diagnostic behind source_mix_report's
    shares (G = 0 perfectly balanced ingest, G → 1 one source is the
    corpus; a mixture rebalance gate alerts on drift in G): computed
    for both doc counts and token counts via the exact rank formula
    G = (2·Σ i·x_(i))/(n·Σx) − (n+1)/n over ascending per-source
    totals.

    Scale shape: one corpus scan into per-source totals (map-side
    combined), then rank windows over |sources| rows. Portability:
    Σ i·x and Σx are exact integer sums; the two divisions and the
    subtraction are the identical expression on both engines, 6dp.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens_col("text"))).cast("long").alias("n_tokens"),
    )

    def gini(col: str) -> F.Column:
        w = Window.partitionBy().orderBy(F.col(col).asc(), "source")
        i = F.row_number().over(w)
        n = F.count("*").over(Window.partitionBy())
        num = F.sum(i.cast("long") * F.col(col)).over(Window.partitionBy())
        tot = F.sum(col).over(Window.partitionBy())
        return (
            F.lit(2.0) * num / (n * tot)
            - (n + F.lit(1)).cast("double") / n.cast("double")
        )

    scored = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        gini("n_docs").alias("g_docs"),
        gini("n_tokens").alias("g_tokens"),
    )
    return scored.groupBy().agg(
        F.count("*").cast("long").alias("n_sources"),
        F.round(F.max("g_docs"), 6).alias("gini_docs"),
        F.round(F.max("g_tokens"), 6).alias("gini_tokens"),
    )
