"""Streaming CUSUM drift monitor — the production shape of
operators/stats.cusum_changepoints: the reference (μ, σ) is FROZEN
from a training window (the feature_drift_psi frozen-reference
contract; a live monitor cannot know the final series' own moments),
and the per-type state is O(1): the open hour's (sum, count) plus the
integer CUSUM accumulators.

Because the batch operator's closed prefix form S_t = c_t − min(0,
min_{j≤t} c_j) is identical in EXACT INTEGER arithmetic to the
recursion S_t = max(0, S_{t−1} + d_t) this kernel runs, the streamed
rows equal the batch rows bit-for-bit for every CLOSED hour (the open
final hour has no successor to close it — a monitor never has the
current hour until it ends); pytest-pinned over a time-split corpus.

Ordered-delivery contract as stateful_user_ema: batches arrive in
event-time order (time-partitioned ingest).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mimir_spark.streaming.stateful import _spark_round6

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour", LongType()),
        StructField("x", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("alarm_up", LongType()),
        StructField("alarm_down", LongType()),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("cur_hour", LongType()),
        StructField("sum_v", DoubleType()),
        StructField("cnt", LongType()),
        StructField("c_pos", LongType()),
        StructField("c_neg", LongType()),
        StructField("min_cpos", LongType()),
        StructField("min_cneg", LongType()),
    ]
)


def make_cusum_updater(params: dict):
    """Build the stateful update fn for frozen per-type (mu7, sd7)
    integer reference moments (1e-7 units, as the batch operator
    derives them)."""

    def _close_hour(mu7, sd7, st, hour):
        cur, sv, cnt, cp, cn, mp, mn = st
        x = _spark_round6(sv / cnt)
        x7 = round(x * 1e7)
        cp = cp + 10 * x7 - 10 * mu7 - 5 * sd7
        cn = cn + 10 * mu7 - 10 * x7 - 5 * sd7
        mp, mn = min(mp, cp), min(mn, cn)
        sp, sn = cp - min(0, mp), cn - min(0, mn)
        row = (
            hour,
            x,
            sp / 1e8,
            sn / 1e8,
            int(sp > 40 * sd7),
            int(sn > 40 * sd7),
        )
        return (None, 0.0, 0, cp, cn, mp, mn), row

    def _update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        typ = key[0]
        mu7, sd7 = params[typ]
        st = (
            state.get
            if state.exists
            else (None, 0.0, 0, 0, 0, 0, 0)
        )
        cur, sv, cnt, cp, cn, mp, mn = st
        rows = pd.concat(list(pdfs))
        out = []
        if len(rows):
            rows = rows.sort_values(["ts", "event_id"])
            for ts, v in zip(rows["ts"], rows["value"]):
                hour = int(pd.Timestamp(ts).timestamp() // 3600)
                if cur is not None and hour > cur:
                    (_, sv2, c2, cp, cn, mp, mn), row = _close_hour(
                        mu7, sd7, (cur, sv, cnt, cp, cn, mp, mn), cur
                    )
                    out.append(row)
                    sv, cnt = sv2, c2
                    cur = hour
                elif cur is None:
                    cur = hour
                sv += float(v)
                cnt += 1
        state.update((cur, sv, cnt, cp, cn, mp, mn))
        if out:
            yield pd.DataFrame(
                [
                    {
                        "event_type": typ,
                        "hour": h,
                        "x": x,
                        "s_pos": sp,
                        "s_neg": sn,
                        "alarm_up": au,
                        "alarm_down": ad,
                    }
                    for h, x, sp, sn, au, ad in out
                ]
            )

    return _update


def stateful_cusum(events_stream: DataFrame, params: dict) -> DataFrame:
    """Per-type CUSUM over the hourly means of a stream, against the
    frozen reference `params` = {event_type: (mu7, sd7)}."""
    return (
        events_stream.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            make_cusum_updater(params),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
