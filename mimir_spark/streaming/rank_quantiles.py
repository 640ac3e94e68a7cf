"""Incremental (streaming) bottom-k rank-quantile sketch.

The batch op (`sketches.rank_quantiles`) estimates quantiles from the
k events with the SMALLEST multiplicative-hash values — and "k
smallest of a union" is recoverable from "k smallest of each part"
(the TakeOrdered monoid, same property as the streaming reservoir),
so the merged sample — and therefore every estimate, which is a pure
function of the sample through the shared `quantiles_from_bottomk`
finalizer — is bit-identical to the batch sketch however the corpus
was split into micro-batches.

State layout follows the streaming-sketch recipe (cms.py): every
micro-batch overwrites its own ``batch_id=N`` subdirectory, so an
at-least-once foreachBatch retry rewrites its own candidates instead
of duplicating them; state volume is ≤ k rows per batch forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.sketches import (
    _RQ_MOD,
    _RQ_MULT,
    RQ_K,
    quantiles_from_bottomk,
)
from mimir_spark.streaming.jobs import read_events_stream


def streaming_rank_quantiles_build(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = RQ_K,
    glob: str = "events.parquet",
) -> StreamingQuery:
    """Start the incremental sample builder over an events stream.
    Each micro-batch contributes its local bottom-k candidates —
    write-only hot path, one scan of the batch."""
    events_stream = read_events_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        cand = (
            batch.select(F.col("event_id").alias("sid"), "value")
            .withColumn("u", (F.col("sid") * F.lit(_RQ_MULT)) % F.lit(_RQ_MOD))
            .orderBy("u", "sid")
            .limit(k)
        )
        cand.write.mode("overwrite").parquet(f"{state_dir}/batch_id={batch_id}")

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_rank_quantiles(
    spark: SparkSession, state_dir: str, k: int = RQ_K
) -> DataFrame:
    """Merge the per-batch candidates (≤ k·batches rows) into the
    global bottom-k sample and run the SAME finalizer as the batch op
    — estimates bit-identical to `rank_quantiles` (pytest-pinned)."""
    cand = spark.read.parquet(state_dir).orderBy("u", "sid").limit(k)
    return quantiles_from_bottomk(cand.select("sid", "value", "u"))
