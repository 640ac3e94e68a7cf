"""Incremental continuous aggregate — the streaming twin of
hypertable_rollup.

This is the pattern a time-series store runs natively: each
micro-batch contributes PARTIAL minute-level aggregates ((bucket,
event_type) → count + sum, the re-aggregable pair), state accumulates
in the shared idempotent ``batch_id=N`` parquet layout, and the
finalizer resolves partials by summation and derives the hour/day
levels through the SAME cascade the batch operator uses — so the
finalized three-level table matches the batch rollup however the
event stream was split (pytest-pinned). Late events are handled for
free: a late row lands in its true minute bucket as another partial,
and the next finalize folds it into every level.

State volume per batch is #active-(minute, type) buckets — bounded by
time-window × key cardinality, never by row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.relational import rollup_cascade
from mimir_spark.streaming.jobs import read_events_stream


def streaming_hypertable_build(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Accumulate per-batch minute-level partials into the state
    store (idempotent batch_id=N subdirectories — a foreachBatch
    retry overwrites exactly its own partials, so counts/sums are
    never double-added)."""
    ev = read_events_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        partial = batch.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
            "event_type",
        ).agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        partial.write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )

    return (
        ev.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_hypertable_rollup(
    spark: SparkSession, store_dir: str
) -> DataFrame:
    """Resolve the accumulated minute partials (sum over batches per
    (bucket, event_type) — counts and sums merge by addition) and run
    the batch operator's cascade over them."""
    minute = (
        spark.read.parquet(store_dir)
        .groupBy("bucket", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    )
    return rollup_cascade(minute)


def finalize_gap_fill(spark: SparkSession, store_dir: str) -> DataFrame:
    """Gap-filled hourly continuous aggregate from the SAME minute
    store (round 10): resolve the partials, fold minutes into hours
    (counts/sums re-aggregate), round sums at emission, then the
    shared spine+LOCF code path (operators.relational.gap_fill_hourly)
    — the streaming twin of hypertable_gap_fill, pytest-pinned equal
    over a split event stream."""
    from mimir_spark.operators.relational import gap_fill_hourly

    hourly = (
        spark.read.parquet(store_dir)
        .groupBy("bucket", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
        .groupBy(
            F.date_trunc("hour", F.col("bucket")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.round(F.sum("v"), 4).alias("vs"),
        )
    )
    return gap_fill_hourly(hourly)
