"""Incremental (streaming) PSI feature-drift monitoring.

Deployment shape: the REFERENCE snapshot is frozen at model-training
time — its per-type (vmin, vmax) bin edges and bin counts are index
metadata, like the frozen PQ codebooks in streaming/ann.py (re-deriving
edges per batch would re-bin history). The live stream is the CURRENT
side: each micro-batch folds a (event_type, bin, cnt) partial under
the frozen edges into an idempotent ``batch_id=N`` store (counts over
disjoint batches are a sum monoid, ≤ |types|·n_bins cells per batch),
and finalize merges cell-wise and runs the SAME psi_from_counts
finalizer as the batch operator — so the streamed PSI is bit-identical
to batch drift_psi(ref, all-cur-so-far) however the stream was split
(pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.features import (
    PSI_BINS,
    psi_binned_counts,
    psi_from_counts,
    psi_ref_stats,
)
from mimir_spark.sources.tables import SCHEMAS


def streaming_psi_build(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    ref: DataFrame,
    n_bins: int = PSI_BINS,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental current-side binner over an events
    stream. The reference stats are computed ONCE (bounded: |types|
    rows, collected as frozen metadata) and re-created as a literal
    frame inside each micro-batch; the hot path is one map-side
    binning pass + a cells-sized aggregate, no reads of prior state."""
    stats_rows = [
        (r["event_type"], float(r["vmin"]), float(r["vmax"]))
        for r in psi_ref_stats(ref).collect()
    ]

    events_stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(input_dir)
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        stats = batch.sparkSession.createDataFrame(
            stats_rows, "event_type string, vmin double, vmax double"
        )
        cells = psi_binned_counts(batch, stats, n_bins)
        cells.write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_streaming_psi(
    spark: SparkSession,
    store_dir: str,
    ref: DataFrame,
    n_bins: int = PSI_BINS,
) -> DataFrame:
    """Merge the accumulated current-side cells and run the shared
    batch finalizer against the frozen reference."""
    stats = psi_ref_stats(ref)
    ref_cells = psi_binned_counts(ref, stats, n_bins)
    cur_cells = (
        spark.read.parquet(store_dir)
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return psi_from_counts(ref_cells, cur_cells, stats, n_bins)
