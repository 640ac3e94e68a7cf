"""Incremental (streaming) KMV/theta sketches for cross-source set
algebra.

The KMV sketch is mergeable state in the strictest sense: bottom-k
over a union of per-batch bottom-k tables equals bottom-k over the
union of the raw sets, because every member of the global bottom-k
survives its own batch's cut. So each micro-batch writes its own
per-source bottom-k partial (≤ |sources|·k rows) and the finalizer
re-cuts the merged partials — no batch ever re-reads another batch,
and the merged sketch is bit-identical to the single-pass batch
operator's (pytest-pinned through the shared `kmv_pairwise` finisher).

Idempotence follows the streaming-MinHash recipe: each batch overwrites
its own ``batch_id=N`` subdirectory, so an at-least-once foreachBatch
retry rewrites its partial instead of polluting the merge — harmless
for bottom-k (duplicates are distinct-ed away) but kept for layout
parity with the other sketch stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.sketches import KMV_K, kmv_pairwise, kmv_sketch
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_kmv_build(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
    k: int = KMV_K,
) -> StreamingQuery:
    """Start the incremental KMV sketch builder over a documents
    stream: one per-source bottom-k partial per micro-batch."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        kmv_sketch(batch, k).write.mode("overwrite").parquet(
            f"{sketch_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_kmv_setops(
    spark: SparkSession, sketch_dir: str, k: int = KMV_K
) -> DataFrame:
    """Merge the per-batch partials (distinct + re-cut to bottom-k per
    source) and run the SAME pairwise finisher as the batch operator —
    output is row-for-row identical to kmv_source_setops over the
    union of the streamed batches."""
    partials = spark.read.parquet(sketch_dir).select("source", "h").distinct()
    w = Window.partitionBy("source").orderBy("h")
    merged = (
        partials.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("source", "h")
    )
    return kmv_pairwise(merged, k)
