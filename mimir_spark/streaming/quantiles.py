"""Incremental (streaming) histogram quantiles.

Same mergeable-sketch recipe as streaming/cms.py, for a numeric
column: each micro-batch contributes a fixed-width partial histogram
(≤ O(bins) cells), written to an idempotent ``batch_id=N``
subdirectory; finalize merges cell-wise and runs the shared
`quantiles_from_histogram` walk. Histogram cells add, so the merged
sketch — and therefore every quantile estimate — is bit-identical to
the batch `histogram_quantiles` however the stream was split
(pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.sketches import (
    HIST_BIN_WIDTH,
    quantiles_from_histogram,
)
from mimir_spark.sources.tables import SCHEMAS


def read_events_stream(
    spark: SparkSession, input_dir: str, glob: str = "*.parquet"
) -> DataFrame:
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(input_dir)
    )


def streaming_histogram_build(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    bin_width: float = HIST_BIN_WIDTH,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental histogram builder over an events stream.
    Write-only hot path: one map-side binning pass per batch, a
    bins-sized aggregate, no reads of prior state."""
    events_stream = read_events_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        cells = (
            batch.select(
                F.floor(F.col("value") / F.lit(bin_width)).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count("*").alias("cnt"))
        )
        cells.write.mode("overwrite").parquet(
            f"{sketch_dir}/batch_id={batch_id}"
        )

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_streaming_quantiles(
    spark: SparkSession,
    sketch_dir: str,
    bin_width: float = HIST_BIN_WIDTH,
) -> DataFrame:
    """Merge partial histograms cell-wise and estimate quantiles with
    the shared finalizer."""
    hist = (
        spark.read.parquet(sketch_dir)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return quantiles_from_histogram(hist, bin_width=bin_width)
