"""Incremental Bloom-filter dedup over a document stream.

The fourth member of the mergeable-sketch family (CMS adds, HLL
maxes, histograms add — Bloom bits OR): the state is the SET BIT
table, bounded by the filter width M however long the stream runs,
and per-batch partial bit tables union into exactly the
single-pass filter.

Semantics: a doc is flagged `dup_suspect` when ALL of its K bits were
already set by EARLIER batches — Bloom's one-sided error means every
true cross-batch exact duplicate is flagged (no false negatives),
while a unique doc is flagged only with the false-positive
probability (1 - e^(-Kn/M))^K (pytest pins both sides). Unlike
`streaming_dedup` (dropDuplicates), state is O(M) bits regardless of
how many distinct documents pass — the trade a 100 TB stream makes.

The hot path must read prior state (membership is inherently a
lookup), so each batch reads the merged bit table (bounded by M),
writes its own new bits to an idempotent ``batch_id=N`` directory,
and appends its verdict log partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.streaming.jobs import read_documents_stream

BLOOM_M = 1 << 20  # bits
BLOOM_K = 3  # hash functions (seeded xxhash64)


def _bit_cols(text: F.Column) -> F.Column:
    """array of K bit positions for a document's text."""
    return F.array(
        *[
            (F.abs(F.xxhash64(text, F.lit(i))) % BLOOM_M).alias(f"b{i}")
            for i in range(BLOOM_K)
        ]
    )


def streaming_bloom_dedup(
    spark: SparkSession,
    input_dir: str,
    bits_dir: str,
    verdicts_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        keyed = batch.select(
            "doc_id", F.explode(_bit_cols(F.col("text"))).alias("bit")
        ).localCheckpoint(eager=True)
        try:
            prior = spark.read.parquet(bits_dir).filter(
                F.col("batch_id") < batch_id
            ).select("bit").distinct()
        except Exception:
            prior = spark.createDataFrame([], "bit long")
        verdict = (
            keyed.join(F.broadcast(prior.withColumn("hit", F.lit(1))), "bit", "left")
            .groupBy("doc_id")
            .agg(
                (F.count("*") == F.sum(F.coalesce("hit", F.lit(0))))
                .alias("dup_suspect")
            )
        )
        keyed.select("bit").distinct().write.mode("overwrite").parquet(
            f"{bits_dir}/batch_id={batch_id}"
        )
        verdict.write.mode("overwrite").parquet(
            f"{verdicts_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
