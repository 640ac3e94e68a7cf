"""applyInPandasWithState job: totals must match the batch aggregation
after all micro-batches are processed."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table
from mimir_spark.streaming.jobs import read_events_stream
from mimir_spark.streaming.stateful import stateful_user_totals


def test_stateful_totals_match_batch(spark, sf_smoke):
    shutil.rmtree("/tmp/mimir_ckpt_sut", ignore_errors=True)
    stream = read_events_stream(spark, sf_smoke)
    # availableNow: process everything then terminate — a plain stop()
    # can kill an in-flight empty micro-batch mid-state-commit (the
    # processing-time timeout keeps scheduling batches after the data
    # is drained) and fail with CANNOT_WRITE_STATE_STORE.
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("sut")
        .outputMode("update")
        .option("checkpointLocation", "/tmp/mimir_ckpt_sut")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per user wins
    got_df = spark.sql(
        """SELECT user_id, n_events, total_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
             FROM sut) WHERE rn = 1"""
    )
    got = {
        r.user_id: (r.n_events, round(r.total_value, 4)) for r in got_df.collect()
    }
    ev = load_table(spark, sf_smoke, "events")
    expect = {
        r.user_id: (r.n, round(r.t, 4))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == expect
