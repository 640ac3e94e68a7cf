"""Incremental (streaming) exact-substring duplication — the suffix
twin of operators/substr.max_dup_span.

The suffix table (doc_id, 3-gram group, ≤cap-token prefix) is a SET
monoid over disjoint document batches: each micro-batch's suffixes are
a pure function of its own documents, so per-batch partials merged
across batches equal the single-pass suffix table exactly, and the
finalizer scores through the SAME sort/adjacent-LCP code path
(`max_span_from_suffixes`) — incremental and batch results are
bit-identical (pytest-pinned). What the incremental layout buys at
scale: the tokenize + ~16× suffix explode (the expensive map side)
runs once per document ever; only the final group-sort rescans state.

Same batch_id=N overwrite layout as the other streaming stores
(idempotent foreachBatch retries), and the finalizer applies the
latest-batch-wins per-doc guard against at-least-once upstream
redelivery (suffix rows are per-doc state, same argument as BM25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.substr import (
    LCP_CAP,
    max_span_from_suffixes,
    suffix_rows,
)
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_suffix_build(
    spark: SparkSession,
    input_dir: str,
    sfx_dir: str,
    docs_dir: str,
    checkpoint_dir: str,
    cap: int = LCP_CAP,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental suffix-store builder over a documents
    stream: per batch, the suffix partial plus the doc-id roster (the
    roster also covers docs too short to emit suffixes, which still
    need their 0 row at finalize)."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        b = batch.localCheckpoint(eager=True)
        suffix_rows(b, cap).write.mode("overwrite").parquet(
            f"{sfx_dir}/batch_id={batch_id}"
        )
        b.select("doc_id").write.mode("overwrite").parquet(
            f"{docs_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_max_dup_span(
    spark: SparkSession, sfx_dir: str, docs_dir: str
) -> DataFrame:
    """Merge the suffix partials (latest batch per doc) and score
    through the batch code path — identical output to
    `max_dup_span` on the same corpus."""
    sfx_raw = spark.read.parquet(sfx_dir)
    docs_raw = spark.read.parquet(docs_dir)
    last = docs_raw.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    sfx = sfx_raw.join(last, ["doc_id", "batch_id"]).select(
        "doc_id", "g", "pfx"
    )
    doc_ids = last.select("doc_id")
    return max_span_from_suffixes(sfx, doc_ids)
