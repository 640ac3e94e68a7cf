"""SQL-surface parity: the dialect-portable oracle statements must run
UNCHANGED through spark.sql() over the registered corpus views and
produce exactly the DataFrame operators' results.

This pins the engine's second API: a user who writes plain ANSI SQL
(rather than the DataFrame operators) gets the same answers from the
same views — and Catalyst plans both identically.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mimir_spark.sources.tables import register_views
from tests.parity import rows_to_set

# Oracle statements that are pure ANSI (no DuckDB list_*/quantile_cont/
# date_diff dialect) — they run verbatim on Spark SQL.
SQL_PORTABLE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_bracketed_revenue",
    "secondary_sort",
    "distinct_keys",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q22_dormant_customers",
    "semi_anti_join",
    "rollup_revenue",
    "cube_revenue",
    "grouping_sets_revenue",
    "salted_agg",
    "event_windows",
    "skew_join_salted",
    "anomaly_zscore",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "hourly_value_correlation",
    "sample_weighted",
    "window_funnel",
    "sample_reservoir",
    "clustering_coefficient",
    "k_core",
    "label_propagation",
    "rank_quantiles",
    # round 10
    "event_transitions",
    "l_diversity_report",
    # round 11 batch 2 (ANSI-only oracles)
    "corr_matrix",
    "linreg_by_group",
    "chi2_lang_source",
    "quantile_binning",
]


@pytest.fixture(scope="module")
def views(spark, sf_smoke):
    register_views(spark, sf_smoke)
    return sf_smoke


@pytest.mark.parametrize("name", SQL_PORTABLE)
def test_sql_api_matches_dataframe_operator(name, spark, views):
    sql = entrymod.oracle_sql()[name]
    via_sql = spark.sql(sql)
    via_df = entrymod.queries()[name](spark, views)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    cols = sorted(via_sql.columns)
    # null-safe normalized compare (CUBE/ROLLUP emit NULL group keys)
    rows_sql = rows_to_set(map(tuple, via_sql.select(cols).collect()), cols)
    rows_df = rows_to_set(map(tuple, via_df.select(cols).collect()), cols)
    assert rows_sql == rows_df, f"{name}: SQL API and DataFrame API disagree"
