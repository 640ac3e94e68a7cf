"""Incremental (streaming) count-min heavy hitters.

The sketch is the state: CMS cells form a commutative monoid under
cell-wise addition, so per-micro-batch partial sketches merge into
exactly the batch operator's sketch REGARDLESS of how the corpus was
split into batches — the streaming twin of Catalyst's map-side
partial aggregation, persisted across triggers.

State layout follows the streaming-MinHash recipe: every micro-batch
writes its partial cells (and its word log, see below) to its own
``batch_id=N`` subdirectory with overwrite, so an at-least-once
foreachBatch retry rewrites its own output instead of double-counting
— double-counted CELLS would silently inflate every estimate, which
is why idempotence matters more for sketches than for appendy logs.

The per-batch word log (word, h0, batch count) exists for the
finalizer's candidate set and the verification column: the SKETCH is
the bounded-state scale artifact (D·W cells however large the
stream); the word log is append-only, shuffled nowhere, and in
production would be replaced by whatever candidate stream the
application already has (top-k per batch, a dictionary, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.functions.text import portable_token_hash
from mimir_spark.operators.core import tokens
from mimir_spark.operators.sketches import HH_THRESHOLD, _cms_cells
from mimir_spark.streaming.jobs import read_documents_stream


def streaming_cms_build(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    words_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental sketch builder over a documents stream.

    Each micro-batch contributes one partial sketch (≤ D·W rows) and
    one word-log partition; nothing is ever read back during the hot
    path — the build is write-only, so per-batch cost is one token
    scan of the batch."""
    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        occ = tokens(batch).select(
            "word", portable_token_hash(F.col("word")).alias("h0")
        )
        occ = occ.localCheckpoint(eager=True)
        cells = (
            occ.select(F.explode(_cms_cells(F.col("h0"))).alias("c"))
            .groupBy("c.d", "c.bucket")
            .agg(F.count("*").alias("cnt"))
        )
        words = occ.groupBy("word", "h0").agg(
            F.count("*").cast("long").alias("cnt")
        )
        cells.write.mode("overwrite").parquet(f"{sketch_dir}/batch_id={batch_id}")
        words.write.mode("overwrite").parquet(f"{words_dir}/batch_id={batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_cms_heavy_hitters(
    spark: SparkSession,
    sketch_dir: str,
    words_dir: str,
    threshold: int = HH_THRESHOLD,
) -> DataFrame:
    """Merge the partial sketches (cell-wise sum — the monoid merge)
    and answer the heavy-hitter query over the logged candidate
    vocabulary. Output schema and values match the batch
    `heavy_hitters_cms` exactly (pytest-pinned): the merged sketch is
    bit-identical to the single-pass sketch because cell addition
    commutes."""
    sketch = (
        spark.read.parquet(sketch_dir)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    words = (
        spark.read.parquet(words_dir)
        .groupBy("word", "h0")
        .agg(F.sum("cnt").cast("long").alias("true_count"))
    )
    est = (
        words.select(
            "word", "true_count", F.explode(_cms_cells(F.col("h0"))).alias("c")
        )
        .select(
            "word",
            "true_count",
            F.col("c.d").alias("d"),
            F.col("c.bucket").alias("bucket"),
        )
        .join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("word", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.filter(F.col("est_count") >= threshold).select(
        "word", "est_count", "true_count"
    )
