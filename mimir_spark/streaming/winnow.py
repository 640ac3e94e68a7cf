"""Incremental (streaming) winnowing fingerprint store.

Winnowing fingerprints are a PURE FUNCTION of each document, so the
streaming state is embarrassingly mergeable: each micro-batch extracts
its own docs' fingerprints (map-only) and writes them to its own
``batch_id=N`` subdirectory (overwrite — an at-least-once redelivery
rewrites its partial; cross-batch duplicates are impossible because a
doc lives in one batch, and a REdelivered doc overwrites its own
rows). The finalizer unions the partials and runs the identical
matching tail (`winnow_match_report`) as the batch operator —
pytest-pinned row-for-row equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.winnow import (
    WIN_K,
    WIN_MAXDF,
    WIN_MIN_SHARED,
    WIN_W,
    winnow_fingerprints,
    winnow_match_report,
)
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_winnow_build(
    spark: SparkSession,
    input_dir: str,
    fp_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
    k: int = WIN_K,
    w: int = WIN_W,
) -> StreamingQuery:
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        winnow_fingerprints(batch, k, w).write.mode("overwrite").parquet(
            f"{fp_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_winnow_matches(
    spark: SparkSession,
    fp_dir: str,
    maxdf: int = WIN_MAXDF,
    min_shared: int = WIN_MIN_SHARED,
) -> DataFrame:
    fps = spark.read.parquet(fp_dir).select("doc_id", "fp")
    return winnow_match_report(fps, maxdf, min_shared)
