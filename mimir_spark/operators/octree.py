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


def _shr(x: Column, n: Column) -> Column:
    """x >> n with a Column shift amount (F.shiftright only takes a
    literal): floor-divide by 2^n — exact, values here are < 2^6."""
    return F.floor(x / F.pow(F.lit(2.0), n.cast("double"))).cast("long")


MAX_DEPTH = 5
LEAF_THRESHOLD = 1000


def octree_adaptive(
    spark: SparkSession,
    sf_dir: str,
    max_depth: int = MAX_DEPTH,
    threshold: int = LEAF_THRESHOLD,
) -> DataFrame:
    """Adaptive octree (the reference benchmark's real shape): refine
    any cell holding > threshold points until depth max_depth; emit the
    leaf cells with their counts.

    Rather than a driver refinement loop, this uses the closed form: a
    point's leaf is the SHALLOWEST depth whose cell population is ≤
    threshold (a cell splits iff it is overfull, and all its points
    descend together — so ancestor populations alone decide each
    point's leaf). Plan: explode each point over depths 1..max_depth
    (cell ids are pure arithmetic, map-side), count per (depth, cell),
    pick per point the min qualifying depth, re-count leaves. Two
    count shuffles over ≤ max_depth·n rows, no iteration, no driver
    data — the same plan at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_depth = li.select(
        *[
            F.struct(
                _axis_bin("l_quantity", d).alias("cx"),
                _axis_bin("l_extendedprice", d).alias("cy"),
                _axis_bin("l_discount", d).alias("cz"),
            ).alias(f"c{d}")
            for d in range(1, max_depth + 1)
        ]
    ).select(
        F.posexplode(F.array(*[f"c{d}" for d in range(1, max_depth + 1)])).alias(
            "d0", "cell"
        )
    ).select(
        (F.col("d0") + 1).cast("long").alias("depth"), "cell.cx", "cell.cy", "cell.cz"
    )
    counts = per_depth.groupBy("depth", "cx", "cy", "cz").agg(
        F.count("*").alias("cnt")
    )
    # leaf depth of a cell-population chain: shallowest depth with
    # cnt <= threshold; overfull max-depth cells stay leaves.
    leaves = counts.filter(
        (F.col("cnt") <= threshold) | (F.col("depth") == max_depth)
    )
    # A depth-d qualifying cell is a real leaf only if NO shallower
    # ancestor already qualified: ancestor cell coords are the point
    # coords shifted right, so check the closest ancestor chain.
    a = leaves.alias("a")
    anc = leaves.alias("anc")
    return (
        a.join(
            F.broadcast(anc.select(
                F.col("anc.depth").alias("pd"),
                F.col("anc.cx").alias("px"),
                F.col("anc.cy").alias("py"),
                F.col("anc.cz").alias("pz"),
            )),
            (F.col("pd") < F.col("a.depth"))
            & (_shr(F.col("a.cx"), F.col("a.depth") - F.col("pd")) == F.col("px"))
            & (_shr(F.col("a.cy"), F.col("a.depth") - F.col("pd")) == F.col("py"))
            & (_shr(F.col("a.cz"), F.col("a.depth") - F.col("pd")) == F.col("pz")),
            "left_anti",
        )
        .select("depth", "cx", "cy", "cz", "cnt")
    )
