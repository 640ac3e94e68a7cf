"""Input/output surface.

Mimir's I/O layer (text InputSplit across MPI ranks, posix/MPI-IO
readers, per-rank output files) maps to Spark's file-source splitting
and partitioned writers; nothing imperative to rebuild. This package
holds explicit schemas (no runtime inference at scale) and typed
loaders for the test corpus tables.
"""

from mimir_spark.sources.tables import TABLES, load_table, load_tables, register_views
from mimir_spark.sources.io import (
    read_text_tokens,
    write_partitioned_parquet,
    read_csv,
    read_json,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_text_tokens",
    "write_partitioned_parquet",
    "read_csv",
    "read_json",
]
