"""Core MapReduce-surface operators (Mimir parity workloads).

WordCount is Mimir's flagship benchmark; kv_* are the generic
KV→KMV→reduce path; histogram/distinct are the classic MR utility ops.
All are single-shuffle plans with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.api import MimirPipeline
from mimir_spark.sources.tables import load_table

# One definition of "token" shared by wordcount / inverted index so the
# oracle SQL can mirror it exactly: split on runs of whitespace, drop
# empties.
_TOKEN_SPLIT = r"\s+"


def tokens(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, word), one row per token occurrence."""
    return (
        docs.select("doc_id", F.explode(F.split("text", _TOKEN_SPLIT)).alias("word"))
        .filter(F.col("word") != "")
    )


def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word → occurrence count over documents.text.

    Plan shape: parquet scan (text column only) → generate(explode) →
    partial count → shuffle on word → final count. The partial
    aggregation before the shuffle is Mimir's map-side combiner; at
    100 TB the shuffle volume is O(distinct words per partition), not
    O(tokens).
    """
    docs = load_table(spark, sf_dir, "documents")
    return tokens(docs).groupBy("word").agg(F.count("*").alias("cnt"))


def wordcount_topk(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Top-k words, deterministic tie-break on the word itself. A
    global sort of the *aggregated* counts (distinct-word cardinality),
    not of the token stream — cheap at any SF."""
    return (
        wordcount(spark, sf_dir)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(k)
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → (distinct docs containing it, smallest doc_id). The
    classic MR inverted-index reduced to order-insensitive outputs so
    the result is hash-comparable (a posting *list* would depend on
    collection order)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        tokens(docs)
        .groupBy("word")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def wordcount_via_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation expressed through the MimirPipeline API —
    demonstrates the migration path and that combiner semantics
    (partial agg) are identical to the direct DataFrame form."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        MimirPipeline(docs)
        .flat_map(F.explode(F.split("text", _TOKEN_SPLIT)).alias("word"))
        .filter(F.col("word") != "")
        .reduce_by_key(["word"], F.count("*").alias("cnt"))
        .to_df()
    )


def kv_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic reduceByKey over events: per-user sum/count/max of value.
    Multiple aggregates share one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count("*").alias("n_events"),
        F.max("value").alias("max_value"),
    )


def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniq over event_type (Mimir distinct = map to key + empty reduce)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type").distinct()


def histogram(spark: SparkSession, sf_dir: str, bin_width: float = 25.0) -> DataFrame:
    """Fixed-width histogram over events.value. Bin id computed
    map-side (codegen), then a count shuffle on ≤O(bins) keys."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select((F.floor(F.col("value") / F.lit(bin_width))).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
        .withColumn("lo", (F.col("bin") * F.lit(bin_width)).cast("double"))
        .select("bin", "lo", "cnt")
    )


def group_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k orders per customer by totalprice (window row_number with
    deterministic tie-break). At scale this is a single shuffle on
    o_custkey; no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct users per event type. Mergeable-sketch path:
    at 100 TB this is the only sane distinct-count (exact countDistinct
    re-shuffles raw keys).

    Tolerance-band driver contract: the HLL estimate itself is
    Spark-internal (not engine-portable), so the hashed columns are the
    EXACT count plus a within-epsilon flag — the oracle recomputes the
    exact side and asserts the flag is 1. eps = 4×rsd (rsd=1.5% is the
    published relative standard deviation of Spark's HLL++; 4 sigma is
    a ~1-in-16k false-failure band). The exact leg exists only for
    verification — a production 100 TB run keeps just the sketch."""
    ev = load_table(spark, sf_dir, "events")
    eps = 4 * 0.015
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.015).alias("est"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.col("exact_users") * eps
            )
            .cast("long")
            .alias("within_eps"),
        )
    )
