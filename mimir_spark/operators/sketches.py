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

from pyspark.sql import DataFrame, SparkSession
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
