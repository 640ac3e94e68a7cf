"""Incremental (streaming) subword id emission over a FROZEN tokenizer
artifact — the missing half of train-once/encode-many: the unigram
vocab is loaded ONCE at stream start from the persisted model
(operators/tokenizer.write_unigram_model — never retrained inside the
scoring path, the streaming_lang_id frozen-model contract), and each
micro-batch Viterbi-encodes its own docs (per-DISTINCT-word DP within
the batch, positional reassembly — a pure per-doc function of the
artifact) into its own ``batch_id=N`` subdirectory. At-least-once
redelivery overwrites the batch's own partial; a doc lives in exactly
one batch, so the finalizer is a plain schema'd union, pytest-pinned
row-for-row equal to unigram_encode_ids_from_model over the same
artifact regardless of batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.tokenizer import (
    _ids_digest_projection,
    load_unigram_weights,
    unigram_ids_from_docs,
)
from mimir_spark.streaming.jobs import read_documents_stream

ENCODE_SCHEMA = (
    "doc_id long, n_ids long, ids_digest long, first_id long,"
    " last_id long"
)


def streaming_unigram_encode_ids(
    spark: SparkSession,
    model_dir: str,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Encode a document stream under the frozen unigram model at
    `model_dir`. The bounded vocab (kilobytes) is collected once and
    folded into each micro-batch's plan as literals — zero train
    stages anywhere in the stream's lifetime."""
    weights = load_unigram_weights(spark, model_dir)
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out = _ids_digest_projection(
            unigram_ids_from_docs(batch, weights)
        )
        out.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_unigram_encode_ids(
    spark: SparkSession, out_dir: str
) -> DataFrame:
    """Plain union of the per-batch partials (explicit schema — an
    all-empty stream reads as the correct empty frame)."""
    return spark.read.schema(ENCODE_SCHEMA).parquet(out_dir).select(
        "doc_id", "n_ids", "ids_digest", "first_id", "last_id"
    )
