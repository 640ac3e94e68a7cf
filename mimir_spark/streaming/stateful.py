"""Custom stateful streaming via applyInPandasWithState — the
Structured-Streaming equivalent of a Mimir user keeping per-key state
across reduce calls.

`stateful_user_totals` maintains a running (count, sum) per user with a
processing-time idle timeout: when a user goes quiet the state is
emitted and evicted — bounded state at any throughput.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for this user into the running
    (count, sum); emit the updated totals every batch."""
    if state.hasTimedOut:
        n, total = state.get if state.exists else (0, 0.0)
        state.remove()
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(events_stream: DataFrame) -> DataFrame:
    """Running per-user totals with idle-timeout eviction. State lives
    in Spark's state store (RocksDB on a real cluster), partitioned by
    user_id — the direct analogue of Mimir's paged per-key KV state."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
