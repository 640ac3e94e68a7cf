"""Incremental (streaming) MinHash near-dup detection.

The batch `dedup_minhash_lsh` answers "which pairs in this corpus are
near-dups"; a live ingestion pipeline needs the INCREMENTAL question:
"is this arriving document a near-dup of anything seen so far". This
job answers it with the same signature machinery, one micro-batch at a
time:

- per batch, MinHash(128) signatures are computed with the identical
  deterministic hash family as the batch operator (a doc's signature
  depends only on its own shingles, so batch and stream agree bit for
  bit);
- state is an append-only parquet signature store (doc_id, sig,
  sh_set), laid out as one batch_id=N subdirectory per micro-batch so
  a foreachBatch retry (at-least-once) overwrites its own output
  instead of duplicating it — the streaming analogue of a feature
  store; Spark's state store isn't used because the LSH join needs
  the full signature history, not per-key running values;
- per batch, LSH band buckets are joined batch-vs-(store ∪ batch), so
  the work per batch is bounded by bucket collisions against the
  batch — never a rescan of all historical pairs;
- candidates are exact-Jaccard verified against the stored shingle
  sets before being appended to the output pair log.

Run to completion over a partitioned corpus this reproduces exactly
the batch operator's pair set (tested): every pair (a, b) is
considered in the first micro-batch that contains its later member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from mimir_spark.operators.dedup import (
    _minhash_doc_table,
    lsh_candidates,
)
from mimir_spark.streaming.jobs import read_documents_stream


def _verified_pairs(
    cand: DataFrame, sh_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against per-doc shingle-set rows (doc_id, sh_set)."""
    sa = sh_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = sh_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def streaming_minhash_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental near-dup job over a documents file stream.

    Emits verified duplicate pairs to ``pairs_dir`` (append-only
    parquet) and maintains the signature store in ``store_dir``. The
    foreachBatch body is plain batch DataFrame code — the standard
    Structured Streaming escape hatch for stateful logic whose state
    (here: the LSH-joinable signature history) doesn't fit the
    per-key state-store model."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # one Arrow pass per micro-batch: signatures AND the hashed
        # shingle sets (the batch operator's verification
        # representation, bit for bit) — localCheckpoint so the
        # kernel runs once, not per downstream use.
        sig_new = (
            _minhash_doc_table(batch)
            .select("doc_id", "sig", "sh_set")
            .localCheckpoint(eager=True)
        )
        try:
            # batch_id is a discovered partition column (each batch
            # writes its own batch_id=N subdirectory, see below).
            # Latest-batch-wins resolve + current-batch-wins anti-join
            # (the shared at-least-once guard): a redelivered or
            # updated doc otherwise leaves stale AND fresh signature
            # rows in the union, so the bucket join would emit
            # duplicate pairs and verify against stale shingle sets
            # until compaction. Both joins are store-sized.
            raw = spark.read.parquet(store_dir)
            last = raw.groupBy("doc_id").agg(
                F.max("batch_id").alias("batch_id")
            )
            store = (
                raw.join(last, ["doc_id", "batch_id"])
                .select("doc_id", "sig", "sh_set")
                .join(sig_new.select("doc_id"), "doc_id", "left_anti")
            )
        except AnalysisException:
            store = None
        all_sigs = (
            sig_new if store is None else store.unionByName(sig_new)
        )
        # probe = the new batch: only pairs touching a new doc are
        # generated (store-internal pairs were reported when their
        # docs arrived), and the bucket join is batch × history, not
        # the history self-join.
        cand_new = lsh_candidates(
            all_sigs.select("doc_id", "sig"),
            probe=sig_new.select("doc_id", "sig"),
        )
        verified = _verified_pairs(
            cand_new, all_sigs.select("doc_id", "sh_set"), threshold
        )
        # Idempotent per-batch writes (the standard foreachBatch
        # exactly-once recipe): foreachBatch is at-least-once, so a
        # failure/retry re-runs _process with the SAME batch_id. A
        # blind append would duplicate pair rows and — worse —
        # duplicate signatures in the store, multiplying every future
        # bucket join. Writing each batch to its own batch_id=N
        # subdirectory with overwrite makes the retry rewrite exactly
        # its own output; readers see batch_id as a discovered
        # partition column.
        verified.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch_id={batch_id}"
        )
        sig_new.write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def export_lsh_index_from_stream(
    spark: SparkSession, store_dir: str, index_dir: str
) -> None:
    """Turn the ACCUMULATED streaming signature store into the
    persisted, shard-pruned LSH index (operators/lsh_index.py) —
    WITHOUT re-scanning the corpus: the store already holds every
    doc's signature and hashed shingle set, so the export is one
    store-sized pass (latest batch per doc → bucket rows sharded by
    pmod(bucket, N_SHARDS), raw signatures, verification sets). The
    stream keeps ingesting into the store; the export is the
    periodic 'publish a queryable index snapshot' step an ingest
    pipeline schedules alongside compact_stream_store."""
    from pyspark.sql import functions as F

    from mimir_spark.operators.lsh_index import N_SHARDS, lsh_bucket_rows

    raw = spark.read.parquet(store_dir)
    last = raw.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    store = raw.join(last, ["doc_id", "batch_id"]).select(
        "doc_id", "sig", "sh_set"
    ).localCheckpoint(eager=True)
    buckets = lsh_bucket_rows(store.select("doc_id", "sig")).withColumn(
        "shard", F.pmod(F.col("bucket"), F.lit(N_SHARDS))
    )
    buckets.write.mode("overwrite").partitionBy("shard").parquet(
        f"{index_dir}/buckets"
    )
    store.select("doc_id", "sig").write.mode("overwrite").parquet(
        f"{index_dir}/signatures"
    )
    store.select("doc_id", F.col("sh_set").alias("s")).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/shingles")
