"""Incremental (streaming) DDSketch quantiles — the relative-error
member of the mergeable-sketch family (cells ADD like the fixed-width
histogram; see streaming/quantiles.py for the recipe and the
idempotent batch_id=N state layout)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.sketches import (
    ddsketch_buckets,
    quantiles_from_ddsketch,
)
from mimir_spark.streaming.quantiles import read_events_stream


def streaming_ddsketch_build(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    events_stream = read_events_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        ddsketch_buckets(batch, "value").write.mode("overwrite").parquet(
            f"{sketch_dir}/batch_id={batch_id}"
        )

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_streaming_ddsketch(
    spark: SparkSession, sketch_dir: str
) -> DataFrame:
    sk = (
        spark.read.parquet(sketch_dir)
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return quantiles_from_ddsketch(sk)
