"""Incremental (streaming) ICWS weighted-MinHash near-dup detection —
the weighted-Jaccard twin of streaming/minhash.py.

Per micro-batch: ICWS signatures + folded weighted sets for the new
documents (both pure functions of each document's own content, so
batch and stream agree bit for bit), an LSH banding join of the new
batch against (store ∪ batch), and exact map-zip J_w verification of
the candidates before they are appended to the pair log. Run to
completion over a partitioned corpus this reproduces exactly the batch
`dedup_icws` pair set (pytest-pinned): every pair is considered in the
first micro-batch containing its later member.

State layout follows the streaming-sketch recipe: each batch
overwrites its own ``batch_id=N`` subdirectory (signature store and
pair log), so an at-least-once foreachBatch retry rewrites its own
output instead of duplicating signatures — which would multiply every
future bucket join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from mimir_spark.operators.weighted import (
    WJ_THRESHOLD,
    _weighted_arrays,
    _wj_verify,
    fold_weighted_arrays,
    icws_candidates,
    icws_signatures_arrays,
)
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_icws_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = WJ_THRESHOLD,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental weighted near-dup job over a documents
    file stream. Emits verified (doc_a, doc_b, wjaccard) pairs to
    ``pairs_dir`` and maintains the (signature + folded-set) store in
    ``store_dir``."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        arr = _weighted_arrays(batch)
        new = (
            icws_signatures_arrays(arr)
            .join(fold_weighted_arrays(arr), "doc_id")
            .localCheckpoint(eager=True)
        )
        try:
            # Latest-batch-wins resolve (the same at-least-once guard
            # the BM25/ngram-LM/substr finalizers apply): a redelivered
            # or updated doc leaves rows under several batch_id
            # partitions; joining against the raw union would score
            # candidates against stale (sig, m, n) rows and emit
            # duplicate pairs until compaction. The resolve join is
            # store-sized (doc_id → max batch_id), not corpus-sized.
            raw = spark.read.parquet(store_dir)
            last = raw.groupBy("doc_id").agg(
                F.max("batch_id").alias("batch_id")
            )
            store = (
                raw.join(last, ["doc_id", "batch_id"])
                .select("doc_id", "sig_g", "sig_t", "m", "n")
                # docs in the CURRENT batch win over any stored row
                # (covers both an update and a retry of a batch whose
                # store write landed before its checkpoint commit)
                .join(new.select("doc_id"), "doc_id", "left_anti")
            )
        except AnalysisException:
            store = None
        all_docs = new if store is None else store.unionByName(new)
        cand = icws_candidates(
            all_docs.select("doc_id", "sig_g", "sig_t"),
            probe=new.select("doc_id", "sig_g", "sig_t"),
        )
        verified = _wj_verify(
            cand, all_docs.select("doc_id", "m", "n"), threshold
        )
        verified.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch_id={batch_id}"
        )
        new.write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_icws_store(
    spark: SparkSession, store_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Compact the ICWS signature store in place — see
    streaming.jobs.compact_stream_store (this is the same
    latest-batch-wins rewrite, kept as a named entry point because
    the ICWS test suite pins its mid-stream invariance)."""
    from mimir_spark.streaming.jobs import compact_stream_store

    return compact_stream_store(
        spark, store_dir, key="doc_id", target_bytes=target_bytes
    )
