"""Incremental (streaming) HTML main-text extraction — the
crawl-frontier shape of operators/html.html_extract_text: pages arrive
in micro-batches, each batch runs the SAME fused synthesize+extract
Arrow kernel (a pure per-doc map — no model, no cross-doc state) and
writes its rows to its own ``batch_id=N`` subdirectory (idempotent
under at-least-once redelivery — a redelivered batch overwrites its
own partial, and a doc lives in exactly one batch). The finalizer is a
plain schema'd union; pytest pins it row-for-row equal to the batch
operator over a split corpus. Together with streaming URL dedup and
the streaming frozen-tokenizer encode this completes the incremental
web front half: frontier → extract → dedup → encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.html import html_extract_docs
from mimir_spark.streaming.jobs import read_documents_stream

EXTRACT_SCHEMA = (
    "doc_id long, extracted_text string, extracted_len long,"
    " n_blocks long, n_kept long, n_dropped_semantic long,"
    " n_dropped_density long, n_links long"
)


def streaming_html_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        html_extract_docs(batch).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_html_extract(spark: SparkSession, out_dir: str) -> DataFrame:
    """Plain union of the per-batch partials. Explicit schema so a
    stream whose every batch was empty still reads as the correct
    empty frame instead of a schema-inference error."""
    return spark.read.schema(EXTRACT_SCHEMA).parquet(out_dir).select(
        "doc_id", "extracted_text", "extracted_len", "n_blocks",
        "n_kept", "n_dropped_semantic", "n_dropped_density", "n_links",
    )
