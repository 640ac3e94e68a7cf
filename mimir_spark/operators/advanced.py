"""Advanced operator batch: TF-IDF and n-gram counting (classic
MapReduce workloads a Mimir user chains by hand), as-of join, JSON
extraction, a window-function suite, skew-salted aggregation, and
per-label embedding centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import tokens_col
from mimir_spark.functions.time import epoch_seconds
from mimir_spark.sources.tables import load_table


def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, word): tf · ln((N+1)/(df+1)).

    Three aggregations, all keyed on word or (doc, word) — the doc
    count N joins in as a broadcast single-row aggregate, never a
    collected literal, so the plan is one job at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(tokens_col("text")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.col("tf"),
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
                6,
            ).alias("tfidf"),
        )
    )


def ngram_counts(spark: SparkSession, sf_dir: str, n: int = 2) -> DataFrame:
    """Word n-gram occurrence counts across the corpus (every
    occurrence, unlike the distinct shingles dedup uses). Same
    single-shuffle shape as wordcount.

    Grams are built by zipping the token array with its own shifted
    tails (zip_with + slice), NOT by indexing inside a transform
    lambda: a subexpression referenced inside a higher-order-function
    lambda is re-evaluated PER ELEMENT, making the lambda form
    O(tokens²) per document — the exact pitfall functions/text.py
    word_shingles documents and avoids."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    gram = toks
    for k in range(1, n):
        gram = F.zip_with(
            gram, F.slice(toks, k + 1, 1 << 30), lambda a, b: F.concat_ws(" ", a, b)
        )
    # keep only full n-grams: positions 1..size-n+1 (docs shorter than
    # n words contribute nothing, matching the oracle's len>=n guard)
    grams = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= n, F.slice(gram, 1, F.size(toks) - n + 1)
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    return grams.groupBy("gram").agg(F.count("*").alias("cnt"))


def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events.props JSON column and aggregate an extracted
    field — get_json_object stays JVM-side (Jackson), no Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k.isNull(), 1)).alias("n_null_k"),
    )


def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum, delta-vs-previous, and per-user value rank in one
    pass — a single shuffle on user_id serves all three frames."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrank = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        F.round(F.col("value") - F.coalesce(F.lag("value", 1).over(w), F.lit(0.0)), 4).alias(
            "delta"
        ),
        F.row_number().over(wrank).cast("long").alias("value_rank"),
    )


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (DuckDB `ASOF JOIN` semantics): for each purchase
    event, the value of the same user's latest click at ts ≤ purchase
    ts — the classic attribution query.

    Spark lacks a native as-of join; the scalable pattern is the
    merged-stream trick: union both sides tagged, then within each
    user partition carry the last click value forward with
    last(ignoreNulls) over (ts, tag). One shuffle on user_id, no
    per-row lookup, no UDF, no unpartitioned window — this is the
    shape that survives 100 TB (contrast: a windowless global sort
    funnels everything through one task).
    """
    ev = load_table(spark, sf_dir, "events")
    # dedup clicks per (user, ts) so the as-of value is well-defined
    # under ties on both engines
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    tagged_c = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "click_value",
        F.lit(None).cast("long").alias("event_id"),
    )
    tagged_p = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("double").alias("click_value"),
        "event_id",
    )
    merged = tagged_c.unionByName(tagged_p)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn(
        "last_click_value", F.last("click_value", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id", "user_id", "last_click_value"
    )


def salted_agg(spark: SparkSession, sf_dir: str, salts: int = 8) -> DataFrame:
    """Skew-mitigated aggregation: pre-aggregate on (key, salt), then
    merge per key. Result is identical to a plain groupBy — the point
    is the shape: a hot key's rows split across `salts` reducers in
    stage 1 instead of hammering one. (Spark's AQE skew handling covers
    joins; explicit salting is the pattern for skewed aggregations
    whose partials are large, e.g. collect_set.)"""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(salts)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.sum("value").alias("pv"), F.count("*").alias("pc")
    )
    return partial.groupBy("event_type").agg(
        F.round(F.sum("pv"), 4).alias("total_value"),
        F.sum("pc").alias("n_events"),
    )


def skew_join_salted(spark: SparkSession, sf_dir: str, salts: int = 8) -> DataFrame:
    """Skew-replicated shuffle-join demo: events joined to a per-type
    reference stat on (event_type, salt) instead of event_type alone.

    event_type has ~5 distinct values — the worst case for a shuffle
    join (≤5 active reducers, one hot). Salting fixes it structurally:
    the fact side appends salt = pmod(event_id, salts); the tiny build
    side is replicated ×salts with an explode; the join key becomes
    (event_type, salt), spreading each hot key across `salts` reducers.
    The build side carries a SHUFFLE_HASH hint because a broadcast
    join (which Spark would otherwise pick for a 40-row table) is
    already skew-immune — the point of the demo is the salted SHUFFLE
    shape that applies when the build side is too big to broadcast.
    Result is identical to the unsalted join, which is what the oracle
    checks."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("mean_value"))
    replicated = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salts)]))
    )
    fact = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(salts)).cast("int"))
    joined = fact.join(replicated.hint("shuffle_hash"), ["event_type", "salt"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("value") > F.col("mean_value"), 1).otherwise(0))
        .cast("long")
        .alias("n_above_mean"),
    )


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, emitted as (label, pos, mean) — the long
    form avoids re-assembling arrays through a shuffle and is what a
    k-means iteration aggregates anyway."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("mean_x"))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), "mean_x")
    )


def interval_join(spark: SparkSession, sf_dir: str, gap_s: int = 1800) -> DataFrame:
    """Time-range join: for each purchase event, count + sum the same
    user's clicks in the preceding 30 minutes ([ts-30min, ts)).

    Spark has no native range join; the naive inequality join is a
    per-user cross product. The scalable pattern is BUCKETING: both
    sides get a bucket = floor(epoch / gap); because the window length
    equals the bucket width, every qualifying click lives in the
    purchase's bucket or the one before, so the probe side explodes to
    exactly 2 (user, bucket) keys and the join is a bounded equi-join —
    shuffle keyed on (user_id, bucket), never a per-user cross join.
    The exact range predicate then filters inside the matched buckets.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = (epoch_seconds("ts") / gap_s).cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ts_c"),
        F.col("value").alias("click_value"),
        bucket.alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    probes = purchases.select(
        "event_id",
        "user_id",
        "ts",
        F.explode(F.array(bucket, bucket - 1)).alias("bucket"),
    )
    matched = probes.join(clicks, ["user_id", "bucket"]).filter(
        (F.col("ts_c") < F.col("ts"))
        & (F.col("ts_c") >= F.col("ts") - F.expr(f"INTERVAL {gap_s} SECONDS"))
    )
    per_purchase = matched.groupBy("event_id").agg(
        F.count("*").alias("n_recent_clicks"),
        F.sum("click_value").alias("v"),
    )
    return purchases.join(per_purchase, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_recent_clicks", F.lit(0)).alias("n_recent_clicks"),
        F.round(F.coalesce("v", F.lit(0.0)), 4).alias("recent_click_value"),
    )


def funnel_conversion(
    spark: SparkSession, sf_dir: str, horizon_s: int = 3600
) -> DataFrame:
    """Click→purchase funnel: for each click, does the same user
    purchase within the next `horizon_s` seconds? Reported as a
    per-hour-of-day conversion table (n_clicks, n_converted, rate) —
    the standard conversion-window analysis.

    Same bucketed range-join scheme as `interval_join`, mirrored
    forward: bucket width == window length, so a click's qualifying
    purchases live in its bucket or the next one — the click side
    explodes to exactly 2 (user, bucket) probe keys and the match is
    a bounded equi-join (shuffle on (user_id, bucket)), never a
    per-user cross product. Conversion is an EXISTS, realized as a
    distinct converted-click set + left join (semi-join shape keeps
    the pair fan-out from double-counting clicks with many follow-up
    purchases)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (epoch_seconds("ts") / horizon_s).cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", bucket.alias("bucket")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ts_p"), bucket.alias("bucket")
    )
    probes = clicks.select(
        "event_id",
        "user_id",
        "ts",
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias(
            "bucket"
        ),
    )
    converted = (
        probes.join(purchases, ["user_id", "bucket"])
        .filter(
            (F.col("ts_p") > F.col("ts"))
            & (
                F.col("ts_p")
                <= F.col("ts") + F.expr(f"INTERVAL {horizon_s} SECONDS")
            )
        )
        .select("event_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    return (
        clicks.join(converted, "event_id", "left")
        .groupBy(F.hour("ts").cast("long").alias("hr"))
        .agg(
            F.count("*").cast("long").alias("n_clicks"),
            F.sum(F.coalesce("converted", F.lit(0)))
            .cast("long")
            .alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.round(F.col("n_converted") / F.col("n_clicks"), 6),
        )
    )
