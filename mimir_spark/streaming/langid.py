"""Incremental (streaming) language identification.

The trigram NB model is FROZEN at stream start (trained once from the
static labeled slice — exactly how production language ID ships: the
model is an artifact, not stream state), and scoring is a pure per-doc
function of that model. So each micro-batch classifies its own docs
(map-only + a per-doc window over ≤ |langs| rows) and writes to its
own ``batch_id=N`` subdirectory — at-least-once redelivery overwrites
its own partial, cross-batch duplicates are impossible because a doc
lives in one batch. The finalizer is a plain union; pytest pins it
row-for-row equal to the batch operator (operators/textstats.lang_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.textstats import (
    lang_id_score_docs,
    lang_trigram_model,
)
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_lang_id(
    spark: SparkSession,
    model_sf_dir: str,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Score a document stream against the frozen model trained from
    `model_sf_dir`'s labeled slice. The model is materialized to the
    driver once (bounded: |langs|·|V| rows) and re-broadcast into each
    micro-batch's plan as a literal table."""
    model_rows = lang_trigram_model(spark, model_sf_dir).collect()
    schema = "lang string, tg string, c long, w long, w0 long"
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        model = batch.sparkSession.createDataFrame(
            [(r["lang"], r["tg"], r["c"], r["w"], r["w0"]) for r in model_rows], schema
        )
        lang_id_score_docs(batch, model).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_lang_id(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir).select(
        "doc_id", "pred_lang", "is_correct"
    )
