"""Relational suite, part 3 — the remaining TPC-H-style queries the
corpus schema can express (q7, q8, q9, q13, q15, q16, q17, q22; the
schema has no partsupp / shipmode / commitdate, so q2, q11, q12, q20,
q21 have no faithful equivalent and the affected predicates are
adapted as noted per query).

Scale notes: every query keeps dims (region/nation/supplier/part)
broadcast, facts shuffled on their join key, aggregates partial-first.
Scalar thresholds (q17's per-part mean, q22's global mean) are
computed as aggregated DataFrames and joined/broadcast — never
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table, maybe_broadcast

def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by ship year.
    Both nation lookups broadcast; lineitem⋈orders is the only
    fact-fact shuffle."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    flipped = (F.col("supp_nation") == "NATION_2") & (
        F.col("cust_nation") == "NATION_1"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(maybe_broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair | flipped)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_1 suppliers' share of PROMO-part volume sold to
    ASIA customers, per order year. The share is a conditional-sum /
    sum in one aggregate — no second pass."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    nat_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(nat_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(maybe_broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(maybe_broadcast(nat_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", _revenue()).otherwise(0.0))
                / F.sum(_revenue()),
                6,
            ).alias("mkt_share")
        )
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp → profit = discounted revenue):
    per supplier-nation, per order-year profit on parts named
    '%widget%'."""
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(maybe_broadcast(nat), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum(_revenue()), 4).alias("sum_profit"))
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (orders
    below '5-LOW' priority). LEFT join keeps zero-order customers; two
    aggregations, both with map-side partials."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue over a quarter. The
    max-revenue scalar comes from an unpartitioned window max over the
    per-supplier aggregate (tiny), not a driver collect."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 4).alias("total_revenue")
    )
    top = rev.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        maybe_broadcast(top)
        .join(sup, top.supplier_no == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (supplier-part pairs come from lineitem, not
    partsupp): distinct supplier count per (brand, type, size) for
    selected sizes, excluding one brand."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: yearly revenue lost if small-quantity orders (below
    20% of the part's mean quantity) were dropped, for one brand+type.
    The correlated subquery is rewritten as aggregate-then-join — the
    per-part mean is computed once over the filtered parts only."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_part = li.join(maybe_broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    thresholds = li_part.groupBy("p_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    )
    return (
        li_part.join(maybe_broadcast(thresholds), "p_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no phone country codes; every customer has
    orders, so 'dormant' = no order since 1999-01-01): per nation,
    count + total balance of above-average-balance customers with no
    recent orders. Global mean broadcast-joined; recent orders
    anti-joined."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), "n_name"
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(maybe_broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(maybe_broadcast(nat), F.col("c_nationkey") == F.col("c_nk"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combos in
    one pass — Catalyst expands the cube BEFORE the shuffle so partial
    aggregation still applies to every grouping set."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(_revenue()), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority), (status), ()): the sparse
    subset of the cube a report actually needs — 3 grouping sets
    instead of 4, still one scan + one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        F.count("*").alias("n_orders"),
    )


def moving_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue — a RANGE window frame
    (interval-based, handles gap days correctly, unlike ROWS). The
    daily pre-aggregation shrinks the window input to one row per day,
    so the unpartitioned window runs over ~2.4k rows no matter the
    corpus size — pre-agg-then-window is the scale pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.date_trunc("day", "l_shipdate").alias("day"))
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )
    w = (
        Window.orderBy(F.col("day").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "day",
        "revenue",
        F.round(F.avg("revenue").over(w), 4).alias("ma7"),
    )


def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode/commitdate in the schema): per
    order priority, count lineitems shipped ≤30 / 31-90 / >90 days
    after the order date. One fact-fact join on orderkey, the CASE
    buckets fold into the aggregate — single shuffle after the join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(delay <= 30, 1).otherwise(0)).alias("fast_cnt"),
            F.sum(F.when((delay > 30) & (delay <= 90), 1).otherwise(0)).alias(
                "mid_cnt"
            ),
            F.sum(F.when(delay > 90, 1).otherwise(0)).alias("slow_cnt"),
        )
    )
