"""Second relational batch: semi/anti joins, EXISTS, CASE aggregation,
HAVING, rollup/cube, pivot, exact percentiles — the rest of the
join/agg algebra a Mimir user composes from map/reduce passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table, maybe_broadcast


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders (in a quarter) that have at least one
    late lineitem (shipped after order date + 60 days), counted per
    priority. The EXISTS is a left-semi join — no duplication, and the
    lineitem side carries only the join key + predicate columns."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: share of revenue from PROMO parts in one month.
    part is broadcast; CASE inside the aggregate → single scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-05-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                * 100.0
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str, qty: float = 150.0) -> DataFrame:
    """TPC-H Q18-style: customers whose single orders exceed a total
    quantity. Aggregate-then-join: the HAVING runs on the lineitem agg
    BEFORE joining customer/orders, so only qualifying keys shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > qty)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: OR-of-ANDs predicate brackets over a broadcast
    part join. Catalyst pushes the common l_quantity bounds into the
    scan; the residual OR evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 15))
    )
    b2 = (
        (F.col("p_brand") == "Brand#13")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(10, 25))
    )
    b3 = (
        (F.col("p_brand") == "Brand#20")
        & (F.col("p_size").between(20, 50))
        & (F.col("l_quantity").between(20, 35))
    )
    return j.filter(b1 | b2 | b3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers WITH orders vs WITHOUT (semi + anti join in one
    output). Both are shuffle-free on the customer side at dim scale
    (orders' keys aggregated then broadcast)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("with_orders").alias("bucket"))
    without = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("no_orders").alias("bucket"))
    return with_orders.union(without)


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (returnflag → linestatus) with grouping-id, the
    hierarchical-total pattern (Mimir users run one MR pass per level;
    one shuffle here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "total_price",
            "n",
        )
    )


def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: priority rows × status columns. Fixed pivot
    values → single-pass pivot aggregate (no value-discovery scan)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of order totalprice per priority (interpolated,
    matching SQL quantile_cont). Exact percentile is a full sort per
    group — fine on aggregated keys; use approx_percentile at raw
    100 TB scale (see approx_quantiles)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
    )


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (KLL/GK-style approx_percentile) — the
    100 TB path for median_order_value; no per-group sort, mergeable
    partials.

    Tolerance-band driver contract: the GK sketch's picked value is
    plan-dependent (not engine-portable), so the hashed columns are
    the exact interpolated percentiles (the portable side, identical
    to median_order_value's oracle) plus per-quantile within-band
    flags on the estimate's TRUE RANK (sketches._quantile_band's
    recipe): rk = count of group values ≤ the estimate, flag
    |rk/n − p| ≤ 0.005 + 1/n. accuracy=10000 bounds the sketch's rank
    error at n/10000 and the returned value is an actual data element
    (one more rank of discretization), so the flag is 1 by
    construction at ANY group size — unlike the previous VALUE band
    [percentile(p−δ), percentile(p+δ)], which collapses below one
    inter-value gap for groups under ~1/δ rows and could
    deterministically fail on small groups.

    Tie robustness: a duplicated value occupies a RANK INTERVAL
    [count(< est)/n, count(<= est)/n]; flagging on count(<= est)
    alone charges the sketch for the whole tied mass and can zero the
    flag on a correct estimate. The flag is therefore 1 iff that
    interval intersects [p − eps, p + eps]."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", 0.5, 10000).alias("p50a"),
        F.approx_percentile("o_totalprice", 0.9, 10000).alias("p90a"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_mid"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_mid"),
        F.count("*").alias("n"),
    )
    ranks = (
        orders.select("o_orderpriority", "o_totalprice")
        .join(maybe_broadcast(agg), "o_orderpriority")
        .groupBy("o_orderpriority", "p50a", "p90a", "p50_mid", "p90_mid", "n")
        .agg(
            F.sum(
                (F.col("o_totalprice") <= F.col("p50a")).cast("long")
            ).alias("rk50"),
            F.sum(
                (F.col("o_totalprice") <= F.col("p90a")).cast("long")
            ).alias("rk90"),
            F.sum(
                (F.col("o_totalprice") < F.col("p50a")).cast("long")
            ).alias("rk50_lt"),
            F.sum(
                (F.col("o_totalprice") < F.col("p90a")).cast("long")
            ).alias("rk90_lt"),
        )
    )
    eps = F.lit(0.005) + F.lit(1.0) / F.col("n")

    def _within(lt: str, le: str, p: float):
        lo = F.col(lt) / F.col("n")
        hi = F.col(le) / F.col("n")
        return (
            (lo <= F.lit(p) + eps) & (hi >= F.lit(p) - eps)
        ).cast("long")

    return ranks.select(
        "o_orderpriority",
        F.round("p50_mid", 4).alias("p50"),
        F.round("p90_mid", 4).alias("p90"),
        _within("rk50_lt", "rk50", 0.5).alias("p50_within"),
        _within("rk90_lt", "rk90", 0.9).alias("p90_within"),
    )


def secondary_sort(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """MR-MPI/Mimir 'sort_keys + sort_values' parity: globally ordered
    output by (key, secondary). Spark's range-partitioned sort makes
    this one pass; limit keeps the driver-side result bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .limit(k)
    )
