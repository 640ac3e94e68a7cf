"""MimirPipeline — the reference's MapReduce programming model on Spark.

Public Mimir exposes (via ``MimirContext<K,V>``): ``map`` over input
splits or prior KVs, an optional map-side ``combiner``, ``aggregate``
(shuffle KVs by key hash), ``convert`` (KV → key+multivalue), ``reduce``
over the multivalues, ``scan``, and file output. This class keeps that
*mental model* for users migrating from the reference while compiling
every phase to a declarative DataFrame plan:

- ``map`` / ``flat_map`` / ``filter``   → Column expressions (codegen'd)
- ``combine`` + ``aggregate`` + ``reduce`` → ``groupBy().agg()``;
  Catalyst's partial aggregation IS the combiner (map-side combine
  before shuffle), so there is no separate knob — it is always on.
- ``reduce_multivalue``              → ``applyInPandas`` when the
  reduction genuinely needs all values of a key at once.
- ``scan``                           → ``to_df()`` + any Spark action.
- ``output``                         → partitioned parquet/csv writers.

Nothing here uses RDDs or collect(): every phase stays a logical plan
until an action, so Catalyst can fuse phases (e.g. a filter written
after a map still pushes down to the scan).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MimirPipeline:
    """Chainable MapReduce-style pipeline over a DataFrame.

    >>> (MimirPipeline(docs)
    ...   .flat_map(F.explode(F.split("text", r"\\s+")).alias("word"))
    ...   .filter(F.col("word") != "")
    ...   .reduce_by_key(["word"], F.count("*").alias("cnt"))
    ...   .to_df())
    """

    def __init__(self, df: DataFrame):
        self._df = df

    # ---- map phase -------------------------------------------------
    def map(self, *cols: Column | str) -> "MimirPipeline":
        """Project/transform each record (Mimir user map emitting one KV
        per input KV)."""
        return MimirPipeline(self._df.select(*cols))

    def flat_map(self, *cols: Column | str) -> "MimirPipeline":
        """Map where expressions may contain generators (explode /
        posexplode / inline) — one input record → 0..n output records."""
        return MimirPipeline(self._df.select(*cols))

    def with_column(self, name: str, col: Column) -> "MimirPipeline":
        return MimirPipeline(self._df.withColumn(name, col))

    def filter(self, cond: Column | str) -> "MimirPipeline":
        return MimirPipeline(self._df.filter(cond))

    # ---- shuffle + reduce phase -------------------------------------
    def reduce_by_key(
        self, keys: Sequence[str], *aggs: Column
    ) -> "MimirPipeline":
        """combiner + aggregate + convert + reduce in one declarative
        step. Spark performs partial aggregation before the shuffle —
        exactly Mimir's map-side combiner — whenever the agg functions
        permit it."""
        return MimirPipeline(self._df.groupBy(*keys).agg(*aggs))

    def reduce_multivalue(
        self, keys: Sequence[str], func: Callable, schema
    ) -> "MimirPipeline":
        """Custom reduce that needs every value of a key materialized
        (Mimir's reduce over a KMV). Arrow-batched; use only when
        built-in aggs can't express the reduction."""
        return MimirPipeline(self._df.groupBy(*keys).applyInPandas(func, schema))

    def aggregate(self, keys: Sequence[str], num_partitions: int | None = None) -> "MimirPipeline":
        """Explicit shuffle-by-key-hash (Mimir ``aggregate``). Rarely
        needed — groupBy/join shuffle on their own — but exposed for
        co-partitioning two pipelines before an iterative loop."""
        cols = [F.col(k) for k in keys]
        df = self._df.repartition(num_partitions, *cols) if num_partitions else self._df.repartition(*cols)
        return MimirPipeline(df)

    # ---- scan / output ----------------------------------------------
    def scan(self, func: Callable) -> None:
        """Per-record side-effecting scan (Mimir ``scan``). Runs on
        executors; do not mutate driver state in ``func``."""
        self._df.foreach(func)

    def to_df(self) -> DataFrame:
        return self._df

    def output_parquet(self, path: str, partition_cols: list[str] | None = None) -> None:
        from mimir_spark.sources.io import write_partitioned_parquet

        write_partitioned_parquet(self._df, path, partition_cols)
