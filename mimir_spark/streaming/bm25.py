"""Incremental (streaming) BM25 index build.

Every statistic BM25 needs is a SUM monoid over disjoint document
batches: per-doc term frequencies for the query vocabulary, per-doc
lengths, and (derived at finalize) document frequencies, N, and avgdl.
So per-micro-batch partial index tables merge into exactly the
single-pass index, and the finalizer ranks through the SAME code path
as the batch operator (`retrieval.bm25_rank_from_parts`) — incremental
and batch rankings are bit-identical (pytest-pinned).

State layout follows the streaming-sketch recipe (cms.py): each batch
overwrites its own ``batch_id=N`` subdirectory, so an at-least-once
foreachBatch retry rewrites its own partial instead of double-counting
term frequencies. State volume is (batch docs × |terms|) + batch docs
rows per batch — the index, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.functions.text import tokens_col
from mimir_spark.operators.retrieval import (
    BM25_QUERY,
    BM25_QUERY_BATCH,
    BM25_TOPK,
    bm25_batch_rank_from_parts,
    bm25_rank_from_parts,
)
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_bm25_build(
    spark: SparkSession,
    input_dir: str,
    tf_dir: str,
    dl_dir: str,
    checkpoint_dir: str,
    terms: tuple[str, ...] = BM25_QUERY,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental index builder over a documents stream.
    Write-only hot path: one token scan per batch feeds both the
    query-term tf partial and the doc-length partial."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        tok = batch.select(
            "doc_id", F.explode(tokens_col("text")).alias("w")
        ).localCheckpoint(eager=True)
        tf = (
            tok.filter(F.col("w").isin(*terms))
            .groupBy("doc_id", "w")
            .agg(F.count("*").cast("long").alias("tf"))
        )
        dl = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
        tf.write.mode("overwrite").parquet(f"{tf_dir}/batch_id={batch_id}")
        dl.write.mode("overwrite").parquet(f"{dl_dir}/batch_id={batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_bm25_topk(
    spark: SparkSession, tf_dir: str, dl_dir: str, k: int = BM25_TOPK
) -> DataFrame:
    """Merge the partial index tables and rank through the batch
    operator's scoring code — identical output to `bm25_topk` on the
    same corpus.

    The batch_id=N overwrite already makes foreachBatch RETRIES
    idempotent, but it cannot help if the upstream delivery itself is
    at-least-once (the same document re-appearing in a LATER file):
    unlike the reservoir/ANN/sketch merges, BM25's statistics are sum
    monoids over *disjoint* doc sets, so a re-delivered doc would
    double-count its tf/dl and silently skew df, N, and avgdl. Guard:
    keep each doc's rows from its LATEST batch only (max batch_id,
    resolved from the dl table — every doc has a dl row) — last write
    wins, which also gives re-delivered *updated* documents upsert
    semantics. The resolve join is index-sized, not corpus-sized."""
    tf_raw = spark.read.parquet(tf_dir)
    dl_raw = spark.read.parquet(dl_dir)
    last = dl_raw.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    tf = tf_raw.join(last, ["doc_id", "batch_id"]).select("doc_id", "w", "tf")
    dl = dl_raw.join(last, ["doc_id", "batch_id"]).select("doc_id", "dl")
    return bm25_rank_from_parts(tf, dl, k)


def finalize_bm25_topk_batch(
    spark: SparkSession,
    tf_dir: str,
    dl_dir: str,
    queries: tuple[tuple[int, tuple[str, ...]], ...] = BM25_QUERY_BATCH,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Per-query top-k for a QUERY BATCH from the incrementally built
    index — identical output to `bm25_topk_batch` on the same corpus
    (the stream must have been built with `terms` covering the batch's
    term union). Same latest-batch-wins redelivery guard as
    `finalize_bm25_topk`; the scoring is the shared
    `bm25_batch_rank_from_parts`, so incremental and single-pass
    per-query rankings are bit-identical."""
    tf_raw = spark.read.parquet(tf_dir)
    dl_raw = spark.read.parquet(dl_dir)
    last = dl_raw.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    tf = tf_raw.join(last, ["doc_id", "batch_id"]).select("doc_id", "w", "tf")
    dl = dl_raw.join(last, ["doc_id", "batch_id"]).select("doc_id", "dl")
    return bm25_batch_rank_from_parts(tf, dl, queries, k)
