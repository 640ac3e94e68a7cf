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
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from mimir_spark.operators.weighted import (
    WJ_THRESHOLD,
    _weighted_sets,
    _wj_verify,
    fold_weighted_sets,
    icws_candidates,
    icws_signatures,
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
        wc = _weighted_sets(batch)
        new = (
            icws_signatures(wc)
            .join(fold_weighted_sets(wc), "doc_id")
            .localCheckpoint(eager=True)
        )
        try:
            store = spark.read.parquet(store_dir).select(
                "doc_id", "sig_g", "sig_t", "m", "n"
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
    """Compact the per-batch signature store IN PLACE — the maintenance
    pass a long-lived ingest needs: after thousands of micro-batches
    the store is thousands of KB-sized batch_id=N files, and every
    micro-batch's store read pays open/seek + split-planning overhead
    for all of them (the classic small-files death at 100 TB).

    Latest-batch-wins per doc_id (the same redelivery rule the BM25 /
    bigram-LM finalizers apply), rewritten into
    ceil(bytes/target_bytes) evenly-sized files under a SINGLE
    batch_id=<max seen> subdirectory, so the resumed stream's next
    micro-batches (<max>+1, …) append beside it unchanged. Safety
    order: the compacted copy is fully written to a sibling tmp dir
    BEFORE the old store is removed (a crash in between leaves the
    tmp copy to recover from). A foreachBatch RETRY of an
    already-compacted batch id would re-add rows beside the compacted
    base; that only duplicates signature rows, which costs candidate-
    join compute but never output correctness (candidates are
    distinct, verification is exact) — the same property the
    pre-compaction layout has. Returns the output file count."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(store_dir)  # batch_id partition discovered
    latest = df.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    rows = df.join(latest, ["doc_id", "batch_id"]).drop("batch_id")
    max_b = df.agg(F.max("batch_id")).collect()[0][0]

    jvm = spark._jvm  # public Hadoop FS API, same pattern as compact_files
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = hpath.getFileSystem(hconf)
    size, it = 0, fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            size += status.getLen()
    n_files = max(1, -(-size // target_bytes))

    tmp = store_dir.rstrip("/") + "__compact_tmp"
    rows.repartition(n_files).write.mode("overwrite").parquet(tmp)
    fs.delete(hpath, True)
    fs.mkdirs(hpath)
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(f"{store_dir}/batch_id={max_b}"),
    )
    return n_files
