"""Frequent-itemset mining (A-Priori, Agrawal & Srikant VLDB'94) over
the order/part market-basket view — the classic candidate-pruning
MapReduce workload: the downward-closure property lets the pair pass
filter its input to frequent-1 items BEFORE any pair is generated, so
candidate volume is bounded by the frequent items' co-occurrence, not
the raw basket width.

Scale shape: frequent-1 is one map-side-combined count whose output is
bounded by |items with support ≥ minsup| ≤ corpus/minsup — broadcast-
safe by construction (the same argument as heavy hitters); the pair
pass is a within-basket self-join AFTER that broadcast semi-filter
(bounded per-basket fan-out), then one counting aggregate. No global
self-joins, no candidate table bigger than the true pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

MINSUP_ITEM = 3  # frequent-1 threshold (order count per part)
MINSUP_PAIR = 2  # frequent-2 threshold (order count per pair)


def frequent_pairs(
    spark: SparkSession,
    sf_dir: str,
    minsup_item: int = MINSUP_ITEM,
    minsup_pair: int = MINSUP_PAIR,
) -> DataFrame:
    """A-Priori k=2: baskets = orders, items = parts. Output one row
    per frequent pair with both directions' association stats:
    (item_a, item_b, pair_support, support_a, support_b,
    conf_a_to_b, conf_b_to_a, lift) — confidences are exact integer
    ratios rounded 6dp; lift = pair·N / (a·b) with N = basket count,
    rounded 6dp."""
    li = load_table(spark, sf_dir, "lineitem")
    po = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_baskets = po.select("o").distinct().count()  # one driver scalar
    f1 = (
        po.groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .filter(F.col("sup") >= minsup_item)
    )
    # downward closure: only frequent items may appear in a frequent
    # pair — semi-filter baskets BEFORE pair generation (broadcast:
    # |f1| ≤ baskets/minsup)
    pof = po.join(F.broadcast(f1.select("p")), "p", "left_semi")
    a, b = pof.alias("a"), pof.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(
            F.col("a.p").alias("item_a"), F.col("b.p").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
        .filter(F.col("pair_support") >= minsup_pair)
    )
    sa = f1.select(F.col("p").alias("item_a"), F.col("sup").alias("support_a"))
    sb = f1.select(F.col("p").alias("item_b"), F.col("sup").alias("support_b"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            F.round(F.col("pair_support") / F.col("support_a"), 6).alias(
                "conf_a_to_b"
            ),
            F.round(F.col("pair_support") / F.col("support_b"), 6).alias(
                "conf_b_to_a"
            ),
            F.round(
                F.col("pair_support")
                * F.lit(n_baskets)
                / (F.col("support_a") * F.col("support_b")),
                6,
            ).alias("lift"),
        )
    )
