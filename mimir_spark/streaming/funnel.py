"""Incremental (streaming) ordered-funnel twin of
`features.window_funnel`.

The funnel chain is NOT a bounded monoid: the anchor t1 (a user's
global first view) can move EARLIER with every micro-batch, which can
re-qualify a click that an earlier batch had no reason to keep — so a
"min t1/t2/t3 per batch" state would be wrong. What IS exact is an
event-level partial with two lossless per-batch compressions:

1. views collapse to the batch-local per-user MIN view (the global
   anchor is the min of batch minima — min-of-mins);
2. clicks/purchases DROP when the same user has a view in the same
   batch and ts > batch_min_view + window: the final anchor can only
   be ≤ the batch minimum, so the final window end can only be ≤
   batch_min_view + window — such events can never qualify (users
   with no view in the batch keep all their candidates).

Everything else is kept verbatim (distinct), so the merged state is a
subset of the funnel-type events that provably contains every event
the final chain can select; the finalizer feeds it through the SAME
`funnel_steps_histogram` core as the batch operator, making the
incremental histogram bit-identical (pytest-pinned). The user
universe (n_steps=0 denominators) rides a separate per-batch distinct
user list.

State volume: funnel-type candidates per batch, not the stream —
views are one row per (user, batch), and step-2/3 events survive only
while their user's anchor is still unseen or within the window. A
production deployment bounds the tail by expiring users whose chains
exceed the business window (the same semantic trade ClickHouse makes);
this twin keeps exactness since the pin is bit-identity with batch.

State layout follows the streaming-sketch recipe (cms.py): every
micro-batch overwrites its own ``batch_id=N`` subdirectories, so an
at-least-once foreachBatch retry rewrites its own partials instead of
duplicating them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.features import FUNNEL_STEPS, funnel_steps_histogram
from mimir_spark.streaming.jobs import read_events_stream


def streaming_funnel_build(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    glob: str = "events.parquet",
) -> StreamingQuery:
    """Start the incremental funnel-state builder over an events
    stream. Per batch: one scan, two user-keyed reductions, two
    idempotent partial writes."""
    events_stream = read_events_stream(spark, input_dir, glob=glob)
    win = F.expr("INTERVAL 1 HOUR")

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        e = batch.select("user_id", "event_type", "ts")
        users = e.select("user_id").distinct()
        vmin = (
            e.filter(F.col("event_type") == FUNNEL_STEPS[0])
            .groupBy("user_id")
            .agg(F.min("ts").alias("ts"))
            .select(
                "user_id", F.lit(FUNNEL_STEPS[0]).alias("event_type"), "ts"
            )
        )
        later = (
            e.filter(F.col("event_type").isin(list(FUNNEL_STEPS[1:])))
            .join(
                vmin.select("user_id", F.col("ts").alias("vts")),
                "user_id",
                "left",
            )
            .filter(
                F.col("vts").isNull() | (F.col("ts") <= F.col("vts") + win)
            )
            .select("user_id", "event_type", "ts")
            .distinct()
        )
        vmin.unionByName(later).write.mode("overwrite").parquet(
            f"{state_dir}/events/batch_id={batch_id}"
        )
        users.write.mode("overwrite").parquet(
            f"{state_dir}/users/batch_id={batch_id}"
        )

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_funnel(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the per-batch partials and run the SAME chain as the
    batch operator — histogram bit-identical to `window_funnel`
    (pytest-pinned)."""
    # project away the batch_id partition column BEFORE distinct, or
    # the dedup would be per-batch and every cross-batch duplicate
    # (notably the per-batch user lists) would survive
    ev = (
        spark.read.parquet(f"{state_dir}/events")
        .select("user_id", "event_type", "ts")
        .distinct()
    )
    users = spark.read.parquet(f"{state_dir}/users").select("user_id").distinct()
    return funnel_steps_histogram(ev, users)
