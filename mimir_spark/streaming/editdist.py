"""Incremental (streaming) exact edit-distance dedup — the PassJoin
operator's streaming twin.

The pigeonhole lemma is symmetric in the pair, so per micro-batch it
suffices to index EVERY known doc's chunks and probe only the NEW
docs' substrings: every lev ≤ K pair that touches an arriving doc is
found in that doc's batch (both-new pairs collapse to one row via the
core's least/greatest + distinct), and pairs between already-reported
docs were emitted when their later member arrived — accumulated pairs
equal the batch operator's output over the union, however the corpus
was split (pytest-pinned).

State layout is the shared idempotent ``batch_id=N`` recipe
(minhash.py): the doc store keeps (doc_id, text) per batch
subdirectory with latest-batch-wins resolve + current-batch anti-join
(the at-least-once redelivery guard), so a foreachBatch retry
overwrites exactly its own output. At scale the store would keep the
precomputed chunk hashes beside the text; the text column itself is
required regardless for the levenshtein verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from mimir_spark.operators.editdist import EDIT_K, edit_pairs
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_edit_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    k: int = EDIT_K,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental edit-distance near-dup job over a
    documents file stream: verified lev ≤ k pairs append to
    ``pairs_dir``; the doc store accumulates in ``store_dir``."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        new = batch.select("doc_id", "text").localCheckpoint(eager=True)
        try:
            raw = spark.read.parquet(store_dir)
            last = raw.groupBy("doc_id").agg(
                F.max("batch_id").alias("batch_id")
            )
            store = (
                raw.join(last, ["doc_id", "batch_id"])
                .select("doc_id", "text")
                .join(new.select("doc_id"), "doc_id", "left_anti")
            )
            all_docs = store.unionByName(new)
        except AnalysisException:
            all_docs = new
        pairs = edit_pairs(all_docs, new, k)
        pairs.write.mode("overwrite").parquet(
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
