"""Time-series monitoring walk on mimir_spark: the ops an ingest/ops
team chains over an event stream's hourly rollup, end to end.

- hypertable_rollup / hypertable_gap_fill: the continuous aggregate +
  gap-filled serving table;
- seasonal_decompose_hourly: is there a daily cycle worth modeling?
- theil_sen_hourly vs linreg_by_group: the robust trend beside OLS;
- cusum_changepoints: where did the level shift?
- holt_linear_user / ema_user_value: per-entity smoothing state (the
  streaming twins carry the same state incrementally);
- wau_hll_sliding: trailing-7-day actives by register re-aggregation.

Run: python examples/timeseries_monitoring.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimir_spark.operators.features import holt_linear_user
from mimir_spark.operators.relational import hypertable_rollup
from mimir_spark.operators.sketches import wau_hll_sliding
from mimir_spark.operators.stats import (
    cusum_changepoints,
    seasonal_decompose_hourly,
    theil_sen_hourly,
)
from mimir_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("timeseries_monitoring")
    spark.sparkContext.setLogLevel("ERROR")

    print("== continuous aggregates (minute -> hour -> day cascade) ==")
    hypertable_rollup(spark, sf_dir).orderBy(
        "resolution", "bucket"
    ).show(6, truncate=False)

    print("== seasonality: strength per type (alert if > 0.6) ==")
    seasonal_decompose_hourly(spark, sf_dir).select(
        "event_type", "strength"
    ).distinct().orderBy("event_type").show()

    print("== robust trend (Theil-Sen) per type ==")
    theil_sen_hourly(spark, sf_dir).orderBy("event_type").show()

    print("== CUSUM alarms (first 10 alarm hours) ==")
    cusum_changepoints(spark, sf_dir).filter(
        "alarm_up = 1 OR alarm_down = 1"
    ).orderBy("event_type", "hour").show(10)

    print("== per-user Holt state (5 users) ==")
    holt_linear_user(spark, sf_dir).orderBy("user_id").show(5)

    print("== trailing-7d actives (HLL register re-aggregation) ==")
    wau_hll_sliding(spark, sf_dir).orderBy("day").show(10)


if __name__ == "__main__":
    main()
