"""Relational suite, part 4 — the remaining TPC-H shapes adapted to
the corpus schema (no partsupp table, so Q2/Q11/Q20's supply-side
facts are derived from lineitem history; no receipt/commit dates, so
Q21's lateness is shipdate vs orderdate).

Mimir parity: each of these is a join/agg chain a MapReduce user
writes as several map+aggregate+reduce rounds; declared as DataFrames,
Catalyst broadcast-joins every dim, pushes the date/size filters into
the parquet scans, and partial-aggregates every groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table, maybe_broadcast


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q2 adapted: the cheapest supplier per part, where a
    supplier's unit cost for a part is its observed average unit price
    over lineitem history (sum price / sum qty — the partsupp
    surrogate). Parts restricted to p_size multiples of 5 (Q2's size
    predicate). Top-k parts by retail price, with the winning
    supplier's nation.

    Plan: (part, supplier) agg shuffles on l_partkey; the per-part
    argmin is a window over the SAME partitioning (no second
    exchange); supplier and nation broadcast. Ties broken on
    s_suppkey, matching the oracle's row_number ordering."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") % 5 == 0)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # repartition on l_partkey ALONE: hashpartitioning(l_partkey)
    # satisfies both the (l_partkey, l_suppkey) aggregate's clustering
    # requirement and the per-part window's — one exchange where the
    # default plan pays two (agg on the pair key, re-exchange for the
    # window).
    cost = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 4).alias(
                "unit_cost"
            )
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(maybe_broadcast(part), best.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(maybe_broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .orderBy(F.col("p_retailprice").desc(), "p_partkey")
        .limit(k)
        .select("p_partkey", "p_brand", "p_retailprice", "unit_cost",
                "s_suppkey", "s_name", "n_name")
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: parts whose traded value through suppliers
    of one nation exceeds 0.1% of that nation's total traded value
    (value = Σ extendedprice; the availqty·supplycost surrogate).

    The global total is a 1-row aggregate CROSS-JOIN-broadcast onto
    the per-part aggregate — the scalar-subquery shape that at 100 TB
    must never be a driver collect(); supplier is broadcast so the
    only fact shuffle is the part-keyed agg."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < 5
    )
    val = (
        li.join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("part_value"))
    )
    total = val.agg(
        F.sum("part_value").alias("total_value")
    )
    return (
        val.crossJoin(maybe_broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.001)
        .select(
            "l_partkey",
            "part_value",
            F.round(F.col("part_value") / F.col("total_value"), 6).alias(
                "value_share"
            ),
        )
    )


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: suppliers holding a dominant position
    (≥ 50% of 1996 shipped quantity) in at least one small part
    (p_size < 15) — the "excess availability" semi-join, with shipped
    share standing in for availqty vs half-demand.

    Plan: one filtered (part-pruned via broadcast semi) fact agg on
    (partkey, suppkey); the per-part total is a window over the same
    partitioning (no second exchange); the supplier identity join is
    broadcast. Output is supplier-distinct (left-semi shape)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # same single-exchange trick as q2: partition by l_partkey alone so
    # the agg and the per-part share window run on one shuffle.
    qty = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        qty.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") * 2 >= F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(maybe_broadcast(supp), dominant.l_suppkey == supp.s_suppkey)
        .join(maybe_broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q21 adapted: suppliers who were the SOLE late supplier on
    multi-supplier orders (late = shipped > 90 days after the order
    date — the receipt/commit surrogate), ranked by how many orders
    they alone held up.

    The EXISTS/NOT-EXISTS pair of the original collapses into one
    order-level aggregate (distinct suppliers vs distinct late
    suppliers) joined back to the late rows — two shuffles on
    orderkey, both partial-aggregated, instead of two fact-fact
    self-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("is_late"),
    )
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    blamed = (
        joined.filter(F.col("is_late"))
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
    return (
        blamed.join(maybe_broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(k)
        .select("s_suppkey", "s_name", "numwait")
    )
