"""Shared Spark-vs-DuckDB comparison, mirroring the driver's gate:
row count + column names + order-insensitive value equality (floats
compared exactly — both sides round identically, so exact match is the
bar)."""

from __future__ import annotations

import datetime
import math

import duckdb

from mimir_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"


def duck_connection(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Tag floats so an int-valued float (e.g. DuckDB HUGEINT →
        # float64 99111.0) does NOT compare equal to Spark's BIGINT
        # 99111: the driver hashes string representations, so a width
        # drift that Python's 99111.0 == 99111 would forgive is a
        # driver hash FAIL — the local gate must be at least as strict.
        # (round collapses -0.0 and long-double artifacts.)
        return ("f", round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return int(v)
    return v


def _sort_key(row):
    # None must sort against strings/ints (NULL grouping keys from
    # CUBE/ROLLUP): prefix every value with an is-null flag so the
    # comparison never reaches a None-vs-value compare.
    return tuple((v is None, "" if v is None else str(v)) for v in row)


def rows_to_set(rows, columns):
    return sorted(
        (tuple(_norm(v) for v in r) for r in rows), key=_sort_key
    )


def compare(spark_df, sql: str, con) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    if s_cols != d_cols:
        return False, f"columns differ: spark={s_cols} duck={d_cols}"
    if len(sdf) != len(ddf):
        return False, f"row counts differ: spark={len(sdf)} duck={len(ddf)}"
    s_rows = rows_to_set(sdf[s_cols].itertuples(index=False, name=None), s_cols)
    d_rows = rows_to_set(ddf[d_cols].itertuples(index=False, name=None), d_cols)
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in d_rows][:5]
        diff_d = [r for r in d_rows if r not in s_rows][:5]
        return False, f"values differ; spark-only={diff_s} duck-only={diff_d}"
    return True, f"ok ({len(sdf)} rows)"
