"""Training-batch preparation: sequence packing and dataset-mixture
planning — the two steps that turn a cleaned corpus into an actual
token budget and shard layout for a pre-training run.

Both are oracle-checkable (pure integer arithmetic end-to-end).

`sequence_pack` is deliberately NOT one global window: a per-language
running token offset computed as `SUM() OVER (PARTITION BY lang ORDER
BY doc_id)` funnels each language's every row through ONE task — the
classic prefix-sum scale-killer (English alone would be ~half of a
100 TB corpus). Instead it uses the textbook two-level distributed
prefix sum, fully declarative so Catalyst sees every exchange:

  1. bucket docs by `doc_id // BUCKET_DOCS` and aggregate per-bucket
     token sums (map-side combined; shuffle carries one row per
     (lang, bucket), i.e. corpus_size / BUCKET_DOCS rows);
  2. cumulate bucket sums per language — a window over the tiny
     bucket table (millions of rows per language at 100 TB, each a
     few bytes: one task per language over MBs, not TBs);
  3. join the bucket prefix back (hash join on (lang, bucket)) and
     cumulate WITHIN each bucket — a window whose partitions are
     ≤ BUCKET_DOCS rows, hash-distributed across the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import tokens_col
from mimir_spark.sources.tables import load_table

SEQ_LEN = 512  # tokens per packed training sequence
BUCKET_DOCS = 1024  # doc_ids per prefix-sum bucket
MIX_BUDGET_NUM, MIX_BUDGET_DEN = 6, 10  # budget = 60% of corpus tokens
N_WEIGHT_TIERS = 4


def distributed_prefix_sum(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "start",
    bucket_width: int = BUCKET_DOCS,
) -> DataFrame:
    """EXCLUSIVE running sum of `value_col` within `part_col`, ordered
    by `order_col` (a NON-NEGATIVE integer key), as the two-level
    distributed prefix sum described in the module docstring:
    per-bucket partials (map-side combined), an exclusive prefix over
    the tiny bucket table (the only `part_col`-wide window — rows
    number input/bucket_width), then an exclusive window WITHIN each
    (part, bucket) group, hash-distributed. No window ever sees a
    whole partition's doc rows in one task.
    """
    bucketed = df.withColumn(
        "__bucket", F.expr(f"{order_col} div {bucket_width}")
    )
    bucket_sums = bucketed.groupBy(part_col, "__bucket").agg(
        F.sum(value_col).alias("__bt")
    )
    w_buckets = (
        Window.partitionBy(part_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_prefix = bucket_sums.select(
        part_col,
        "__bucket",
        F.coalesce(F.sum("__bt").over(w_buckets), F.lit(0))
        .cast("long")
        .alias("__bstart"),
    )
    w_in_bucket = (
        Window.partitionBy(part_col, "__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(bucket_prefix, [part_col, "__bucket"])
        .withColumn(
            out_col,
            (
                F.col("__bstart")
                + F.coalesce(F.sum(value_col).over(w_in_bucket), F.lit(0))
            ).cast("long"),
        )
        .drop("__bucket", "__bstart")
    )


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk packing (GPT-style): per language, docs
    are concatenated in doc_id order and the token stream is split
    into fixed SEQ_LEN blocks; each doc reports the sequence its first
    token lands in, its offset in the stream, and how many sequences
    it spans. Zero-token docs pack nowhere (n_seqs = 0).
    """
    return sequence_pack_docs(load_table(spark, sf_dir, "documents"))


def _pack_layout(toks: DataFrame) -> DataFrame:
    """The packing derivation proper over a (doc_id, lang, n_tokens,
    …passthrough) frame: distributed prefix sum → seq_id → straddle
    count — ONE source of truth for the layout rule, so the word-count
    and token-id shard paths can never desynchronize."""
    return (
        distributed_prefix_sum(
            toks, "lang", "doc_id", "n_tokens", out_col="start_tok"
        )
        .withColumn("seq_id", F.expr(f"start_tok div {SEQ_LEN}"))
        .withColumn(
            "n_seqs",
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.expr(f"(start_tok + n_tokens - 1) div {SEQ_LEN}")
                - F.col("seq_id")
                + 1
            ),
        )
    )


def sequence_pack_docs(docs: DataFrame) -> DataFrame:
    """sequence_pack over an arbitrary (doc_id, lang, text) corpus —
    the composition point: a corpus-build feeds the KEPT docs
    (corpus_keep_list semi-join) straight in, so packing runs on the
    filtered stream without re-deriving the keep decisions."""
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
    )
    return _pack_layout(toks).select(
        "doc_id", "lang", "n_tokens", "start_tok", "seq_id", "n_seqs"
    )


def sequence_pack_token_ids(ids_df: DataFrame) -> DataFrame:
    """sequence_pack over an already-TOKENIZED id stream — the layout
    an actual training run uses, where the stream is subword ids from
    the trained tokenizer (unigram_corpus_ids / bpe_corpus_ids), not
    whitespace words. Input: (doc_id, lang, ids array<long>); output
    carries the ids through so write_packed_shards materializes the
    real token stream into the shard files (pytest pins that each
    lang's shard-concatenated stream equals the doc_id-ordered
    concatenation of per-doc ids, and start_tok equals the running id
    count). Same layout rule and two-level distributed prefix sum as
    sequence_pack, via the shared _pack_layout."""
    toks = ids_df.select(
        "doc_id", "lang", "ids", F.size("ids").cast("long").alias("n_tokens")
    )
    return _pack_layout(toks).select(
        "doc_id", "lang", "ids", "n_tokens", "start_tok", "seq_id", "n_seqs"
    )


def dataset_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: given per-source sampling weights and a total
    token budget (60% of the corpus here), allocate each source
    `budget · w_s / Σw` tokens, capped at what the source actually has,
    and report the resulting sampling rate. Weights are derived
    deterministically from the source id (tier = src_num mod 4 + 1) so
    the oracle can reproduce them; production passes a real weight
    table instead.

    One corpus scan → per-source aggregate (20 rows), then a 1-row
    broadcast cross join for the corpus totals — the same
    scalar-broadcast pattern as q17's avg-quantity join. Single-pass:
    surplus from capped sources is reported, not redistributed
    (water-filling is an iterative driver decision, not a scan).
    """
    return dataset_mixture_plan_docs(load_table(spark, sf_dir, "documents"))


def dataset_mixture_plan_docs(docs: DataFrame) -> DataFrame:
    """dataset_mixture_plan over an arbitrary corpus — composition
    point for the end-to-end build (plan the mixture of what SURVIVED
    cleaning, not of the raw corpus)."""
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col("text")).cast("long")).alias("n_tokens"),
    )
    weighted = per_source.withColumn(
        "weight",
        (F.substring("source", 4, 10).cast("long") % N_WEIGHT_TIERS + 1),
    )
    totals = weighted.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("weight").alias("total_weight"),
    )
    return (
        weighted.crossJoin(F.broadcast(totals))
        .withColumn(
            "budget_tokens",
            F.expr(f"total_tokens * {MIX_BUDGET_NUM} div {MIX_BUDGET_DEN}"),
        )
        .withColumn(
            "alloc_tokens",
            F.least(
                F.col("n_tokens"),
                F.expr("budget_tokens * weight div total_weight"),
            ),
        )
        .withColumn(
            "sample_rate", F.round(F.col("alloc_tokens") / F.col("n_tokens"), 6)
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            "alloc_tokens",
            "sample_rate",
        )
    )


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval-side sibling
    of sequence_pack: where packing concatenates documents up to a
    training context length, chunking SPLITS each document into
    fixed-size windows (with `chunk_tokens - stride` tokens of
    overlap) for embedding/indexing in a RAG pipeline. Returns one
    row per chunk: (doc_id, chunk_id, start_tok, n_tokens,
    chunk_text).

    Chunk starts are 1, 1+stride, 1+2·stride, … while the start is
    inside the document, so every token lands in ≥1 chunk and the
    final chunk may be short. Scale shape: map-only (tokenize,
    per-doc array slicing, explode) — a single corpus scan, no
    shuffle at all; Catalyst keeps the whole thing in one
    WholeStageCodegen span."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= 1
    )
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t"), F.lit(stride)),
                lambda s: F.struct(
                    s.alias("start_tok"),
                    F.slice("t", s, chunk_tokens).alias("ck"),
                ),
            )
        ).alias("chunk_id", "c"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.start_tok").cast("long").alias("start_tok"),
        F.size("c.ck").cast("long").alias("n_tokens"),
        F.array_join("c.ck", " ").alias("chunk_text"),
    )


# ---- mixture-plan execution (round 12) --------------------------------------

MIX_RATE_DEN = 1_000_000  # fixed-point denominator for the keep test


def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE dataset_mixture_plan: hash-sample each source at its
    planned rate and report plan vs achieved. The keep test is exact
    integer arithmetic — doc h6 = (doc_id·MULT mod MOD) mod 1e6 is
    kept iff h6 < alloc_tokens·1e6 div n_tokens — so membership is a
    pure function of (doc_id, plan row): reproducible across engines,
    refreshes, and partitionings (no rand(), no sampleBy seed drift).

    Scale shape: the plan is a |sources|-row broadcast; the keep test
    is map-only on the corpus scan; one per-source aggregate closes
    it. Sampling error vs the plan is the binomial noise of hashing
    (reported as achieved_rate beside sample_rate).

    Output: (source, n_docs, kept_docs, alloc_tokens, kept_tokens,
    sample_rate, achieved_rate).
    """
    from mimir_spark.operators.pipeline import _HASH_MOD, _HASH_MULT

    docs = load_table(spark, sf_dir, "documents")
    plan = dataset_mixture_plan(spark, sf_dir).select(
        "source", "n_tokens", "alloc_tokens", "sample_rate"
    )
    h6 = (
        (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)
    ) % F.lit(MIX_RATE_DEN)
    thresh = F.expr(f"alloc_tokens * {MIX_RATE_DEN} div n_tokens")
    scored = (
        docs.select(
            "doc_id",
            "source",
            F.size(tokens_col("text")).cast("long").alias("n_toks"),
        )
        .join(F.broadcast(plan), "source")
        .withColumn("keep", (h6 < thresh).cast("long"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("keep").cast("long").alias("kept_docs"),
            F.max("alloc_tokens").cast("long").alias("alloc_tokens"),
            F.sum(F.col("keep") * F.col("n_toks"))
            .cast("long")
            .alias("kept_tokens"),
            F.max("sample_rate").alias("sample_rate"),
            F.round(
                F.sum(F.col("keep") * F.col("n_toks")) / F.max("n_tokens"), 6
            ).alias("achieved_rate"),
        )
    )


# ---- MLM span-corruption planning (round 12) --------------------------------

MLM_START_MOD = 20   # a span starts at ~1/20 of token positions
MLM_SPAN_BASE = 2    # span length = BASE + (h div MOD) % RANGE → 2..4
MLM_SPAN_RANGE = 3


def mlm_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLANNING (Raffel et al. JMLR'20 §3.1.4
    'span corruption'): decide, deterministically, which token spans
    of each document a denoising objective would mask — ~5% of
    positions start a span (expected length 3, so ~15% noise density,
    the T5 default), span length 2..4 drawn from the same hash. The
    plan is a pure function of (doc_id, position) via the portable
    md5-31 hash, so the identical mask reproduces on any engine or
    refresh — the property a resumable preprocessing pipeline needs.

    Everything is ONE map-only pass of array expressions: positions →
    hash → span starts → flatten/clip/distinct for the covered set
    (overlaps merge, counted once). Output: (doc_id, n_tokens,
    n_spans, n_masked, mask_ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    n = "size(toks)"
    h = (
        "transform(sequence(1, size(toks)),"
        " i -> cast(conv(substring(md5(concat(cast(doc_id AS string),"
        " ':', cast(i AS string))), 1, 8), 16, 10) AS bigint)"
        " & 2147483647)"
    )
    starts = (
        f"filter(transform(sequence(1, size(toks)),"
        f" i -> struct(i AS pos, element_at(hs, i) AS hv)),"
        f" s -> s.hv % {MLM_START_MOD} = 0)"
    )
    covered = (
        f"array_distinct(flatten(transform(st,"
        f" s -> sequence(s.pos, least(s.pos + {MLM_SPAN_BASE} - 1"
        f" + (s.hv div {MLM_START_MOD}) % {MLM_SPAN_RANGE}, {n})))))"
    )
    return (
        docs.selectExpr(
            "doc_id",
            "filter(split(text, '\\\\s+'), x -> x != '') AS toks",
        )
        .filter(F.expr("size(toks) > 0"))
        .selectExpr("doc_id", "toks", f"{h} AS hs")
        .selectExpr("doc_id", "toks", f"{starts} AS st")
        .selectExpr(
            "doc_id",
            "cast(size(toks) AS bigint) AS n_tokens",
            "cast(size(st) AS bigint) AS n_spans",
            f"cast(size({covered}) AS bigint) AS n_masked",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "n_spans",
            "n_masked",
            "round(n_masked / n_tokens, 6) AS mask_ratio",
        )
    )
