"""Incremental (streaming) HyperLogLog distinct counting.

HLL registers form a commutative monoid under cell-wise MAX, so
per-micro-batch partial register tables merge into exactly the batch
operator's registers regardless of how the stream was split — same
monoid story as the streaming CMS (streaming/cms.py), with max in
place of sum. Max is additionally IDEMPOTENT, so HLL would tolerate
double-counting a whole batch; the idempotent ``batch_id=N`` overwrite
layout is kept anyway for uniformity with the other sketch streams
(and because the exact-count verification twin is NOT idempotent).

Scale: per-batch state contribution is ≤ |keys|·m rows whatever the
batch size; finalize merges registers cell-wise and runs the
registers-sized estimate, sharing `hll_estimate` with the batch op so
stream and batch estimates are bit-identical (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.sketches import hll_estimate, hll_registers
from mimir_spark.streaming.jobs import read_events_stream


def streaming_hll_build(
    spark: SparkSession,
    input_dir: str,
    registers_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental register builder over an events stream.
    Each micro-batch writes its partial register table (≤ |types|·256
    rows) to its own batch_id subdirectory; write-only hot path."""
    events_stream = read_events_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        reg = hll_registers(batch, ["event_type"], F.col("user_id"))
        reg.write.mode("overwrite").parquet(
            f"{registers_dir}/batch_id={batch_id}"
        )

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_hll_distinct(spark: SparkSession, registers_dir: str) -> DataFrame:
    """Merge partial registers (cell-wise max) and finalize. Matches
    the register/estimate columns of the batch `hll_distinct` exactly
    because the merged register table is identical to the single-pass
    one (max commutes and is associative)."""
    merged = (
        spark.read.parquet(registers_dir)
        .groupBy("event_type", "j")
        .agg(F.max("m_j").alias("m_j"))
    )
    return hll_estimate(merged, ["event_type"])
