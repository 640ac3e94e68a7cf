"""Relational analytics suite — TPC-H-style queries adapted to the
corpus schema. These exercise the join/agg capabilities a Mimir user
builds by hand with map/reduce chains; here they're declarative so
Catalyst reorders joins, broadcasts dims, and pushes filters to the
parquet scans.

Every aggregate column is aliased identically to the oracle SQL in
__spark_entry__.py; doubles that feed the value-hash comparison are
rounded to 4 decimals on BOTH sides to absorb summation-order ULPs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.time import epoch_seconds
from mimir_spark.sources.tables import load_table, maybe_broadcast


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary rollup on lineitem. Single scan →
    partial agg → 32-way shuffle on a 6-group key space; the filter on
    l_shipdate pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: revenue of not-yet-shipped orders for one market
    segment. customer is filtered then joined (broadcast at dim scale);
    lineitem⋈orders shuffles on orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier
    share a nation. region/nation/supplier broadcast; the two fact
    joins shuffle on orderkey. Filter on r_name prunes 4/5 of the
    dim-side rows before any fact row moves."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(maybe_broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(maybe_broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: highly selective scan-filter-sum; every predicate
    reaches the parquet reader (PushedFilters), so at 100 TB row-group
    stats skip most of the file."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10-style: top customers by revenue on returned lineitems."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization of events: a new session starts when a
    user is idle > gap. lag + conditional cumsum over a per-user window
    — one shuffle on user_id, no Python. Output: per-session stats."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    prev_ts = F.lag(epoch_seconds("ts"), 1).over(w)
    with_flag = ev.withColumn(
        "new_session",
        # first event of a user (NULL lag) starts session 0
        F.when(prev_ts.isNull(), F.lit(0)).otherwise(
            (epoch_seconds("ts") - prev_ts > F.lit(gap_s)).cast("int")
        ),
    )
    sess = with_flag.withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_session"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


def event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts per event_type — the batch twin
    of the streaming windowed agg (same grouping keys a watermarked
    readStream would use)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )

def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading continuous aggregates — the hypertable/materialized-
    rollup pattern a time-series store maintains: minute buckets from
    the raw events, HOUR buckets from the minute aggregates, DAY
    buckets from the hour aggregates, emitted as one table with a
    resolution column. Counts and sums are re-aggregable, so each
    coarser level reads the previous level's (orders-of-magnitude
    smaller) output instead of the raw table — at 100 TB the raw scan
    happens exactly once and the cascade is the incremental-refresh
    plan a continuous aggregate runs per window close. Sums are
    rounded only at emission; every level aggregates the unrounded
    parent, so the oracle's identical cascade hashes."""
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    return rollup_cascade(minute)


def rollup_cascade(minute: DataFrame) -> DataFrame:
    """hour/day levels derived from a (bucket, event_type, n, v)
    minute table and the three levels emitted with a resolution
    column — shared by the batch operator and the streaming
    continuous-aggregate finalizer (counts/sums re-aggregate, so the
    cascade is valid over any correctly-summed minute table)."""
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("bucket")).alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    day = hour.groupBy(
        F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))

    def emit(df, level):
        return df.select(
            F.lit(level).alias("resolution"),
            "bucket",
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.round("v", 4).alias("total_value"),
        )

    return (
        emit(minute, "minute")
        .unionByName(emit(hour, "hour"))
        .unionByName(emit(day, "day"))
    )

SKYLINE_BUCKETS = 64


def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of orders minimizing (o_totalprice,
    o_orderdate): an order survives iff no other order is <= in both
    dimensions and strictly < in at least one — the classic
    multi-criteria "cheapest AND earliest" frontier (Börzsönyi et al.
    ICDE 2001).

    Two-phase distributed shape: a LOCAL skyline per hash bucket
    first (windows partitioned by bucket — bounded groups, and local
    pruning is lossless: a globally dominated row is dominated inside
    any subset containing its dominator... the converse — every
    global skyline row survives its own bucket — is what matters and
    always holds), then the exact pass over the pruned union. The
    final window runs over the pruned set, which is skyline-sized in
    practice (frontiers of correlated dims are tiny); a fully
    anti-correlated worst case degrades to the inherent skyline size,
    which no algorithm beats.

    Per-phase dominance test (no self-join): aggregate to one row per
    price (min date), lag the running min over price order to get the
    min date among STRICTLY cheaper prices, join the tiny per-price
    table back — a row is dominated iff that min is <= its date, or a
    same-price row has a strictly earlier date."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )

    def prune(df, part_cols):
        gp = df.groupBy(*part_cols, "o_totalprice").agg(
            F.min("o_orderdate").alias("mind")
        )
        w = Window.partitionBy(*part_cols).orderBy(
            F.col("o_totalprice").asc()
        )
        gp = gp.withColumn(
            "cum",
            F.min("mind").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        ).withColumn("rm_strict", F.lag("cum", 1).over(w))
        return (
            df.join(gp, [*part_cols, "o_totalprice"])
            .filter(
                (
                    F.col("rm_strict").isNull()
                    | (F.col("rm_strict") > F.col("o_orderdate"))
                )
                & (F.col("mind") == F.col("o_orderdate"))
            )
            .select("o_orderkey", "o_totalprice", "o_orderdate")
        )

    bucketed = orders.withColumn(
        "b", F.pmod(F.xxhash64("o_orderkey"), F.lit(SKYLINE_BUCKETS))
    )
    local = prune(bucketed, ["b"])
    return prune(local.withColumn("g", F.lit(1)), ["g"])


def hypertable_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly continuous aggregate with LOCF (round 10) —
    the time_bucket_gapfill + locf() pair every hypertable store
    exposes next to the rollup: per event type, a COMPLETE hourly
    spine from the type's first to last bucket (F.sequence over
    timestamps — the spine is O(time-span) rows, constant in corpus
    size), left-joined against the hourly aggregate; missing buckets
    flag is_gap and carry the last observation forward
    (F.last ignorenulls over the per-type bucket window — also
    O(time-span), never corpus-sized). The spine starts at a bucket
    that has data by construction, so the LOCF column is never NULL
    (hash-safe). Sums are rounded BEFORE the carry so both engines
    carry identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 4).alias("vs"),
    )
    return gap_fill_hourly(agg)


def gap_fill_hourly(agg: DataFrame) -> DataFrame:
    """Spine + LOCF over any (bucket, event_type, n, vs) hourly table —
    the only gap-fill code path, shared by the batch operator and the
    streaming finalizer (streaming/hypertable.finalize_gap_fill), so
    incremental and single-pass gap-filled tables match."""
    from pyspark.sql import Window

    bounds = agg.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    j = spine.join(agg, ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.col("vs").isNull().cast("long").alias("is_gap"),
        F.last("vs", ignorenulls=True).over(w).alias("value_locf"),
    )


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average of event values (round 10) — the
    other hypertable-store companion aggregate: with irregular
    sampling, the plain mean over-weights bursts; weighting each value
    by its holding interval (until the next observation) is the
    standard estimator. Interval = lead(epoch) − epoch within the
    per-user (ts, event_id) window (sessionize's exact epoch recipe —
    floor-second diffs match date_diff('second') on both engines;
    offsets cancel, so the session timezone never matters); the last
    observation has no interval and drops out, users whose
    observations all share one second have zero total weight and are
    excluded. One user-keyed window + one aggregate."""
    from pyspark.sql import Window

    from mimir_spark.functions.time import epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.lead(epoch_seconds("ts")).over(w) - epoch_seconds("ts")
    return (
        ev.select("user_id", "value", dt.alias("dt"))
        .filter(F.col("dt").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.sum("dt").cast("long").alias("total_seconds"),
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6
            ).alias("twa"),
        )
        .filter(F.col("total_seconds") > 0)
    )
