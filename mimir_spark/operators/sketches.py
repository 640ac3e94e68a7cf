"""Mergeable-sketch operators — the Mimir combiner story taken to its
logical end: a sketch IS a combiner state that never grows with the
key space.

`heavy_hitters_cms` builds a count-min sketch. The point at 100 TB:
the shuffle carries D·W fixed cells (map-side partial sums merge
cell-wise — sketches are commutative monoids), NEVER a per-word
shuffle; word identity only re-enters for the (much smaller) candidate
set queried against the broadcast sketch. Hashing is the repo's
engine-portable polynomial hash so the whole pipeline is
value-checkable against the DuckDB oracle (production swaps in
xxhash64 for the JVM fast path; the plan shape is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import portable_token_hash
from mimir_spark.operators.core import tokens
from mimir_spark.sources.tables import load_table

CMS_D = 4  # rows (independent hash functions)
CMS_W = 32  # buckets per row — deliberately small so collisions are real
# fixed odd universal-hash coefficients: bucket_i = ((a·h0 + b) mod M) mod W
CMS_COEFFS = [(3, 7), (5, 11), (13, 17), (19, 23)]
CMS_MERSENNE = (1 << 31) - 1
HH_THRESHOLD = 900  # absolute count threshold at the oracle SF (0.01)


def _cms_cells(h0: F.Column) -> F.Column:
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (((F.lit(a) * h0 + F.lit(b)) % CMS_MERSENNE) % CMS_W).alias(
                    "bucket"
                ),
            )
            for d, (a, b) in enumerate(CMS_COEFFS)
        ]
    )


def heavy_hitters_cms(
    spark: SparkSession, sf_dir: str, threshold: int = HH_THRESHOLD
) -> DataFrame:
    """Heavy hitters via count-min sketch: report every word whose
    CMS estimate reaches `threshold`, with the estimate next to the
    true count (est ≥ true by construction — CMS only overestimates).

    Plan: one token scan builds the sketch (explode D cells per
    occurrence → groupBy(d, bucket): the shuffle is D·W rows whatever
    the corpus size). The query side joins the candidate vocabulary
    against the BROADCAST sketch (D·W rows) and takes the min cell per
    word. The true-count column is the verification twin computed the
    classic way; at 100 TB you'd keep only the sketch side and query
    it for the (tiny) candidate set.
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = tokens(docs).select(
        "word", portable_token_hash(F.col("word")).alias("h0")
    )
    sketch = (
        occ.select(F.explode(_cms_cells(F.col("h0"))).alias("c"))
        .groupBy("c.d", "c.bucket")
        .agg(F.count("*").alias("cnt"))
    )
    words = occ.groupBy("word", "h0").agg(
        F.count("*").cast("long").alias("true_count")
    )
    est = (
        words.select(
            "word",
            "true_count",
            F.explode(_cms_cells(F.col("h0"))).alias("c"),
        )
        .select("word", "true_count", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("word", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.filter(F.col("est_count") >= threshold).select(
        "word", "est_count", "true_count"
    )


HIST_BIN_WIDTH = 25.0
QUANTS = (0.5, 0.9, 0.99)


def quantiles_from_histogram(
    hist: DataFrame,
    bin_width: float = HIST_BIN_WIDTH,
    qs: tuple[float, ...] = QUANTS,
) -> DataFrame:
    """Quantile estimates from a fixed-width histogram sketch
    (columns bin, cnt): for each q, rank = max(ceil(q·N), 1), find the
    bin holding that rank via the cumulative walk, interpolate
    linearly inside the bin. Everything after the histogram is
    bins-sized: the cumulative window runs over O(bins) rows in one
    task (bounded by construction, not by data volume) and the
    rank-to-bin match is a 3-row broadcast against the bins — the
    histogram is the only corpus-sized pass."""
    spark = hist.sparkSession
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long").alias("cum_prev"),
    )
    total = hist.agg(F.sum("cnt").cast("long").alias("n"))
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    ranks = qdf.crossJoin(F.broadcast(total)).select(
        "q",
        F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1))
        .cast("long")
        .alias("rank_n"),
    )
    return (
        F.broadcast(ranks)
        .join(
            cum,
            (F.col("cum_prev") < F.col("rank_n"))
            & (F.col("cum_prev") + F.col("cnt") >= F.col("rank_n")),
        )
        .select(
            "q",
            "rank_n",
            F.round(
                F.col("bin") * F.lit(bin_width)
                + F.lit(bin_width)
                * (F.col("rank_n") - F.col("cum_prev"))
                / F.col("cnt"),
                6,
            ).alias("est"),
        )
    )


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of events.value from the fixed-width
    histogram — the mergeable-sketch twin of `median_order_value`'s
    exact path and the finalizer shared with the streaming histogram
    (streaming/quantiles.py): histograms add cell-wise, so partial
    histograms from any split of the stream merge into exactly this
    result."""
    from mimir_spark.operators.core import histogram

    hist = histogram(spark, sf_dir, bin_width=HIST_BIN_WIDTH).select(
        "bin", "cnt"
    )
    return quantiles_from_histogram(hist)
