"""Incremental (streaming) deterministic reservoir sample.

The batch op (`pipeline.sample_reservoir`) keeps the k docs with the
SMALLEST multiplicative-hash values per language — and "k smallest of
a union" is computable from "k smallest of each part": a per-batch
local top-k is a lossless partial state (the same property that makes
distributed TakeOrdered work), so the merged reservoir is identical to
the batch sample however the corpus was split into micro-batches.

State layout follows the streaming-sketch recipe (cms.py): every
micro-batch overwrites its own ``batch_id=N`` subdirectory, so an
at-least-once foreachBatch retry rewrites its own candidates instead
of duplicating them; state volume is ≤ k·|langs| rows per batch
forever, never the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.pipeline import _HASH_MOD, _HASH_MULT, RESERVOIR_K
from mimir_spark.streaming.jobs import read_documents_stream


def _hash_col() -> F.Column:
    return (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)


def streaming_reservoir_build(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = RESERVOIR_K,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental reservoir builder over a documents stream.
    Each micro-batch contributes its per-language k smallest hash
    candidates — write-only hot path, one scan of the batch."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        w = Window.partitionBy("lang").orderBy(_hash_col(), "doc_id")
        cand = (
            batch.select("doc_id", "lang")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", "lang", _hash_col().alias("u"))
        )
        cand.write.mode("overwrite").parquet(f"{state_dir}/batch_id={batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_reservoir(
    spark: SparkSession, state_dir: str, k: int = RESERVOIR_K
) -> DataFrame:
    """Merge the per-batch candidate lists: the global per-language
    k smallest (hash, doc_id) over all batches — identical to the
    batch `sample_reservoir` on the same corpus (pytest-pinned).
    The merge input is ≤ k·|langs|·batches rows, so this is candidate-
    sized work whatever the stream carried."""
    cand = spark.read.parquet(state_dir)
    w = Window.partitionBy("lang").orderBy("u", "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "lang", "rk")
    )
