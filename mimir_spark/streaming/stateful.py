"""Custom stateful streaming via applyInPandasWithState — the
Structured-Streaming equivalent of a Mimir user keeping per-key state
across reduce calls.

`stateful_user_totals` maintains a running (count, sum) per user with a
processing-time idle timeout: when a user goes quiet the state is
emitted and evicted — bounded state at any throughput.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
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


# ---- streaming EMA (round 10) ------------------------------------------


def _spark_round6(x: float) -> float:
    """Replicate Spark's F.round(col, 6) on doubles: shortest-repr
    decimal conversion (BigDecimal.valueOf == Python repr) then
    HALF_UP at scale 6. Python's built-in round() is half-EVEN on the
    binary value and can differ on 6dp halfway points, breaking the
    pinned streaming/batch output equality."""
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )

EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_value", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)

EMA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("last", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)


def _update_user_ema(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows (sorted by ts, event_id — the
    batch operator's order) into the running EMA. α = 1/8 exactly as
    in operators.features.ema_user_value, so over a time-split corpus
    the final state is bit-identical to the batch fold."""
    n, last, ema = state.get if state.exists else (0, 0.0, None)
    rows = pd.concat(list(pdfs))
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"])
        for v in rows["value"]:
            v = float(v)
            ema = v if ema is None else 0.125 * v + 0.875 * ema
            last = v
        n += len(rows)
    state.update((n, last, ema))
    if ema is None:  # no data ever seen for this key — nothing to emit
        return
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_value": [_spark_round6(last)],
            "ema": [_spark_round6(ema)],
        }
    )


def stateful_user_ema(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of ema_user_value: per-user EMA state
    (n, last, ema) carried across micro-batches — NO idle timeout
    (an EMA must never restart from scratch; state is O(users), the
    same bound as the batch collect). Correctness contract: the
    source delivers event-time-ordered batches (a time-partitioned
    ingest), the standard assumption for any sequential fold over a
    stream; equality with the batch fold over a time-split corpus is
    pytest-pinned."""
    return (
        events_stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_ema,
            outputStructType=EMA_OUTPUT_SCHEMA,
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_3", DoubleType()),
    ]
)

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)


def _update_user_holt(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch into the running Holt (level, trend)
    state — α = 1/4, β = 1/8 and the identical parenthesization as
    operators.features.holt_linear_user, so the final state over a
    time-split corpus is bit-identical to the batch fold."""
    n, level, trend = state.get if state.exists else (0, None, 0.0)
    rows = pd.concat(list(pdfs))
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"])
        for v in rows["value"]:
            v = float(v)
            if level is None:
                level, trend = v, 0.0
            else:
                ln = 0.25 * v + 0.75 * (level + trend)
                trend = 0.125 * (ln - level) + 0.875 * trend
                level = ln
        n += len(rows)
    state.update((n, level, trend))
    if level is None:
        return
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "level": [_spark_round6(level)],
            "trend": [_spark_round6(trend)],
            "forecast_3": [_spark_round6(level + 3.0 * trend)],
        }
    )


def stateful_user_holt(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of holt_linear_user: O(1) (level, trend) state
    per user, no idle timeout (a trend must never restart), same
    event-time-ordered-batches contract as stateful_user_ema;
    equality with the batch fold over a time-split corpus is
    pytest-pinned."""
    return (
        events_stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_holt,
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
