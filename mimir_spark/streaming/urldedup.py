"""Incremental (streaming) URL-level dedup — the crawl-frontier shape
of operators/urls.url_dedup_survivors: documents arrive in
micro-batches, each batch normalizes its URLs, drops blocklisted
domains, and APPENDS a mergeable per-batch partial
(norm_url, domain, n_docs, min_doc) to its own ``batch_id=N``
subdirectory (idempotent under at-least-once redelivery — a redelivered
batch overwrites its own partial, and a doc lives in exactly one
batch). The finalizer merges partials by canonical URL with
(Σ n_docs, min min_doc) — the CMS/HLL partial-merge recipe on exact
state — and is pytest-pinned row-for-row equal to the batch operator
regardless of batch boundaries or arrival order (min and sum are
order-insensitive merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.urls import (
    BLOCKED_TLDS,
    URL_SITES,
    normalize_url_cols,
    synth_url_expr,
)
from mimir_spark.streaming.jobs import read_documents_stream


def _blocklist_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(f"example{i}.{t}",) for t in BLOCKED_TLDS for i in range(URL_SITES)],
        "domain string",
    )


def streaming_url_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)
    # built once per stream, not per micro-batch — the blocklist is
    # static configuration, and rebuilding it inside _process put a
    # createDataFrame on every batch's critical path
    blocklist = _blocklist_df(spark)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        with_url = batch.select("doc_id").withColumn("url", synth_url_expr())
        cols = normalize_url_cols(F.col("url"))
        norm = with_url.select(
            "doc_id",
            cols["norm_url"].alias("norm_url"),
            cols["domain"].alias("domain"),
        )
        kept = norm.join(F.broadcast(blocklist), "domain", "left_anti")
        partial = kept.groupBy("norm_url", "domain").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
        partial.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


PARTIAL_SCHEMA = (
    "norm_url string, domain string, n_docs long, min_doc long"
)


def finalize_url_dedup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge the per-batch partials into the batch operator's exact
    output shape: (norm_url, domain, n_docs, survivor_doc_id).

    The read carries an EXPLICIT schema: if every micro-batch was empty
    or fully blocklisted no part-file exists, and a schema-less read
    would die on inference instead of returning the correct empty
    frame."""
    return (
        spark.read.schema(PARTIAL_SCHEMA).parquet(out_dir)
        .groupBy("norm_url", "domain")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.min("min_doc").cast("long").alias("survivor_doc_id"),
        )
    )
