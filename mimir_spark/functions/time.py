"""Time primitives.

`epoch_seconds` exists because the test corpus has shipped `ts` as
both parquet TIMESTAMP (reads as Spark TIMESTAMP) and TIMESTAMP
without UTC adjustment (reads as TIMESTAMP_NTZ under Spark 4's
default NTZ inference). A numeric `cast("long")` is legal on the
former and an AnalysisException on the latter; `unix_timestamp()`
accepts both and, with the session timezone pinned to UTC
(mimir_spark.session), yields identical values — and it matches
DuckDB's `epoch()` on the same parquet, keeping bucket arithmetic
oracle-portable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Seconds since the Unix epoch as BIGINT, for TIMESTAMP and
    TIMESTAMP_NTZ alike (session timezone is UTC)."""
    return F.unix_timestamp(F.col(col) if isinstance(col, str) else col)
