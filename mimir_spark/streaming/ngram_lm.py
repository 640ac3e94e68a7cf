"""Incremental (streaming) bigram-LM quality scoring.

Everything bigram_logppl needs is a SUM/SET monoid over disjoint
document batches: per-doc bigram counts and per-doc distinct words
(the LM tables and V are folded from them at finalize). Per-batch
partials merge into exactly the single-pass state, and the finalizer
scores through the SAME code path as the batch operator
(`quality.bigram_ppl_from_parts`) — incremental and batch
cross-entropies are bit-identical (pytest-pinned).

State layout follows the streaming-sketch recipe (cms.py / bm25.py):
each batch overwrites its own ``batch_id=N`` subdirectory so
foreachBatch retries are idempotent, and the finalizer keeps each
doc's rows from its LATEST batch only (same at-least-once redelivery
guard as BM25 — bigram counts are monoids over *disjoint* doc sets,
so a re-delivered doc would otherwise double-count)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.quality import bigram_parts, bigram_ppl_from_parts
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_bigram_build(
    spark: SparkSession,
    input_dir: str,
    dab_dir: str,
    words_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental LM-state builder over a documents stream.
    One batch scan feeds both partials (shared `bigram_parts`)."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        dab, words = bigram_parts(batch.localCheckpoint(eager=True))
        dab.write.mode("overwrite").parquet(f"{dab_dir}/batch_id={batch_id}")
        words.write.mode("overwrite").parquet(
            f"{words_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_bigram_logppl(
    spark: SparkSession, dab_dir: str, words_dir: str
) -> DataFrame:
    """Merge the partial state and score through the batch code path —
    identical output to `bigram_logppl` on the same corpus. Docs with
    <2 tokens have words rows but no dab rows, so the latest-batch
    resolve comes from the words table (every doc has ≥0 words rows;
    single-token docs still guard correctly because their only state
    IS the words table)."""
    dab_raw = spark.read.parquet(dab_dir)
    words_raw = spark.read.parquet(words_dir)
    last = words_raw.groupBy("doc_id").agg(
        F.max("batch_id").alias("batch_id")
    )
    dab = dab_raw.join(last, ["doc_id", "batch_id"]).select(
        "doc_id", "w1", "w2", "c_dab"
    )
    words = words_raw.join(last, ["doc_id", "batch_id"]).select("doc_id", "w")
    return bigram_ppl_from_parts(dab, words)


def finalize_dsir_weights(spark: SparkSession, dab_dir: str) -> DataFrame:
    """DSIR importance weights from the SAME accumulated dab store the
    bigram-LM builder writes (one ingest job feeds Laplace-bigram,
    Kneser-Ney AND DSIR scoring): latest-batch resolve per doc, then
    the shared quality.dsir_weights_from_parts code path — incremental
    and batch weights are bit-identical (pytest-pinned), because every
    DSIR input (bucket target/raw counts, totals) is a SUM monoid over
    disjoint doc batches."""
    from mimir_spark.operators.quality import dsir_weights_from_parts

    dab_raw = spark.read.parquet(dab_dir)
    last = dab_raw.groupBy("doc_id").agg(
        F.max("batch_id").alias("batch_id")
    )
    dab = dab_raw.join(last, ["doc_id", "batch_id"]).select(
        "doc_id", "w1", "w2", "c_dab"
    )
    return dsir_weights_from_parts(dab)


# ---- trigram Kneser-Ney (round 11) ---------------------------------------


def streaming_trigram_build(
    spark: SparkSession,
    input_dir: str,
    dabc_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Incremental trigram-LM state builder: per-doc trigram counts
    (quality.trigram_parts — a SUM monoid over disjoint doc batches)
    written per batch under ``batch_id=N`` (idempotent foreachBatch
    retries, same recipe as the bigram builder above)."""
    from mimir_spark.operators.quality import trigram_parts

    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        dabc = trigram_parts(batch.localCheckpoint(eager=True))
        dabc.write.mode("overwrite").parquet(f"{dabc_dir}/batch_id={batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_kneser_ney3_logppl(
    spark: SparkSession, dabc_dir: str
) -> DataFrame:
    """Merge the accumulated trigram state and score through the SAME
    code path as the batch operator (quality.kneser_ney3_from_parts) —
    incremental and single-pass cross-entropies are bit-identical
    (pytest-pinned). Latest-batch resolve per doc guards
    at-least-once redelivery (trigram counts are monoids over DISJOINT
    doc sets; a re-delivered doc would otherwise double-count).
    Docs with <3 tokens have no state rows and are absent from the
    output, exactly like the batch operator's size filter."""
    from mimir_spark.operators.quality import kneser_ney3_from_parts

    raw = spark.read.parquet(dabc_dir)
    last = raw.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    dabc = raw.join(last, ["doc_id", "batch_id"]).select(
        "doc_id", "w1", "w2", "w3", "c_dabc"
    )
    return kneser_ney3_from_parts(dabc)
