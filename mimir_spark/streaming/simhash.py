"""Incremental (streaming) SimHash near-dup detection.

The SimHash twin of `streaming/minhash.py`: "is this arriving document
within hamming ≤ k of anything seen so far", one micro-batch at a
time. Simpler than the MinHash job because the 64-bit fingerprint IS
the verifier — no shingle sets to store:

- per batch, fingerprints come from the identical expression pipeline
  as the batch operator (`simhash_fingerprints` — a doc's fingerprint
  depends only on its own shingles, so batch and stream agree bit for
  bit);
- state is a parquet fingerprint store (doc_id, fp), one batch_id=N
  subdirectory per micro-batch written with overwrite, so an
  at-least-once foreachBatch retry rewrites its own output instead of
  duplicating it;
- per batch, pigeonhole chunk buckets are joined batch-vs-(store ∪
  batch); work per batch is bounded by bucket collisions against the
  batch, never a rescan of historical pairs;
- candidates are hamming-verified (bit_count of XOR) before the pair
  append.

Run to completion over a partitioned corpus this reproduces exactly
the batch operator's pair set (tested): every pair (a, b) is
considered in the first micro-batch that contains its later member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from mimir_spark.operators.dedup import simhash_chunks, simhash_fingerprints
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_simhash_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental SimHash near-dup job over a documents
    file stream. Emits verified (doc_a, doc_b, hamming) pairs to
    ``pairs_dir`` and maintains the fingerprint store in
    ``store_dir`` (both laid out as idempotent batch_id=N
    subdirectories)."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fp_new = simhash_fingerprints(batch).localCheckpoint(eager=True)
        try:
            store = spark.read.parquet(store_dir).select("doc_id", "fp")
        except AnalysisException:
            store = None
        all_fp = fp_new if store is None else store.unionByName(fp_new)
        # probe = the new batch: chunk buckets of the batch are joined
        # against buckets of (store ∪ batch), so only pairs touching a
        # new doc are generated (store-internal pairs were reported
        # when their docs arrived) and the per-batch join cost is
        # batch × history, never the history self-join. Inequality
        # (not <) keeps pairs where the new doc has the smaller id;
        # least/greatest canonicalizes and batch-internal pairs (seen
        # in both orders) collapse in distinct. hamming is symmetric,
        # so fp order within the pair doesn't matter.
        a = simhash_chunks(fp_new).alias("a")
        b = simhash_chunks(all_fp).alias("b")
        verified = (
            a.join(
                b,
                (F.col("a.chunk") == F.col("b.chunk"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                F.bit_count(
                    F.col("a.fp").bitwiseXOR(F.col("b.fp"))
                ).alias("hamming"),
            )
            .distinct()
            .filter(F.col("hamming") <= max_hamming)
        )
        verified.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch_id={batch_id}"
        )
        fp_new.write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
