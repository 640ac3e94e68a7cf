"""Octree spatial binning — Mimir benchmark workload #3 (clustering of
3-D points into octants at a fixed depth; the reference's adaptive
variant descends until a density threshold, which composes from this
per-depth binning).

Points: (l_quantity, l_extendedprice, l_discount) from lineitem,
normalized by *fixed* known bounds (a global min/max would be a second
scan; fixed bounds keep the plan single-pass and the arithmetic
portable to the DuckDB oracle). Cell ids are interleaved per-dimension
indices (Morton-style), computed entirely map-side; the only shuffle
is the final count on ≤ 8^depth keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

BOUNDS = {
    "l_quantity": (0.0, 51.0),
    "l_extendedprice": (0.0, 110000.0),
    "l_discount": (0.0, 0.11),
}


def _axis_bin(col: str, depth: int) -> Column:
    lo, hi = BOUNDS[col]
    cells = 2**depth
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(cells - 1))


def octree_bin(spark: SparkSession, sf_dir: str, depth: int = 3) -> DataFrame:
    """(cell_x, cell_y, cell_z, cell_id) → point count at given depth."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = 2**depth
    binned = li.select(
        _axis_bin("l_quantity", depth).alias("cx"),
        _axis_bin("l_extendedprice", depth).alias("cy"),
        _axis_bin("l_discount", depth).alias("cz"),
    )
    return (
        binned.groupBy("cx", "cy", "cz")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "cell_id", F.col("cx") * cells * cells + F.col("cy") * cells + F.col("cz")
        )
        .select("cell_id", "cx", "cy", "cz", "cnt")
    )
