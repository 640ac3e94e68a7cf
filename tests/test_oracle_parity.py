"""The local twin of the driver's correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` on DuckDB at sf0.01,
compare row count + columns + order-insensitive values."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import SF_DIR, compare, duck_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(sdf, ORACLES[name], duck)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    """Non-SQL-expressible ops still must run and return a stable schema."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
