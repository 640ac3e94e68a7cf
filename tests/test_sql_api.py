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
    rows_sql = sorted(map(tuple, via_sql.select(cols).collect()))
    rows_df = sorted(map(tuple, via_df.select(cols).collect()))
    assert rows_sql == rows_df, f"{name}: SQL API and DataFrame API disagree"
