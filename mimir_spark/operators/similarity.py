"""Similarity search over an embedding column.

Three tiers, same output shape (query_id, neighbor_id, rank):
- brute-force exact top-k   — the correctness baseline (oracle-checked);
  at scale it's still the right plan when the query set is small
  (queries broadcast, one pass over the corpus, per-partition top-k
  via window).
- random-hyperplane LSH     — bucketed candidates, sub-linear scans.
- IVF                        — k-means-lite centroids, probe n cells.

All ranking uses round(cosine, 6) with an id tie-break so results are
deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.vectors import cosine_sim, dot
from mimir_spark.sources.tables import load_table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _queries_and_corpus(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    return q, c


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ann_bruteforce_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector (self
    excluded). Queries are broadcast; corpus is scanned once; the
    window's shuffle is on query_id (N_QUERIES keys)."""
    q, c = _queries_and_corpus(spark, sf_dir)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_sim("qe", "ce"), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(scored, k)


# ---- Random-hyperplane LSH ----------------------------------------------

N_PLANES = 16
DIM = 64


def _hyperplanes():
    import random

    rng = random.Random(7)
    return [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(N_PLANES)]


def _lsh_key(col: str) -> F.Column:
    """16-bit signature: bit i = sign(v · plane_i). Pure expressions."""
    planes = _hyperplanes()
    bits = [
        F.when(dot(F.col(col), F.array(*[F.lit(x) for x in p])) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for p in planes
    ]
    key = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        key = key + F.shiftleft(b.cast("long"), i)
    return key


def ann_lsh_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's hyperplane
    signature under at least one of 4 masked sub-keys (multi-probe via
    4-bit-dropped bands). Sub-linear at scale: the join is on bucket
    keys, never all-pairs."""
    q, c = _queries_and_corpus(spark, sf_dir)
    qk = q.withColumn("sig", _lsh_key("qe"))
    ck = c.withColumn("sig", _lsh_key("ce"))
    # 4 bands of 4 bits each dropped → pigeonhole catches near vectors
    bands = [0xFFF0, 0xFF0F, 0xF0FF, 0x0FFF]
    qb = qk.select(
        "query_id",
        "qe",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.col("sig").bitwiseAND(F.lit(m)).alias("bkey"),
                    )
                    for i, m in enumerate(bands)
                ]
            )
        ).alias("bb"),
    ).select("query_id", "qe", "bb.band", "bb.bkey")
    cb = ck.select(
        "neighbor_id",
        "ce",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.col("sig").bitwiseAND(F.lit(m)).alias("bkey"),
                    )
                    for i, m in enumerate(bands)
                ]
            )
        ).alias("bb"),
    ).select("neighbor_id", "ce", "bb.band", "bb.bkey")
    cand = (
        qb.join(cb, ["band", "bkey"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qe", "neighbor_id", "ce")
        .distinct()
    )
    scored = cand.withColumn("cos", F.round(cosine_sim("qe", "ce"), 6)).select(
        "query_id", "neighbor_id", "cos"
    )
    return _rank_topk(scored, k)


# ---- IVF ----------------------------------------------------------------

# The synthetic corpus has weak cluster structure, so recall needs a
# generous probe count; on naturally-clustered embeddings 2-4 probes
# of 16 cells is the usual operating point.
N_CELLS = 16
N_PROBE = 8


def ann_ivf_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """IVF: partition the corpus into N_CELLS Voronoi cells around
    deterministic seed centroids (one k-means assignment pass — a
    'k-means-lite' index build), then each query probes its N_PROBE
    nearest cells only. Centroids live in a broadcast table; at 100 TB
    the cell assignment is written once as a bucketed column and probes
    become partition pruning."""
    emb = load_table(spark, sf_dir, "embeddings")
    # deterministic centroids: the embeddings with vec_id ≡ 0 (mod ~n/16)
    cents = (
        emb.filter(F.col("vec_id") % 31 == 0)
        .limit(N_CELLS)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cent"))
    )
    q, c = _queries_and_corpus(spark, sf_dir)
    # assign corpus vectors to nearest centroid
    c_scored = (
        c.join(F.broadcast(cents))
        .withColumn("sim", cosine_sim("ce", "cent"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("neighbor_id").orderBy(
                    F.col("sim").desc(), F.col("cell_id")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("neighbor_id", "ce", "cell_id")
    )
    # each query probes its N_PROBE nearest cells
    q_cells = (
        q.join(F.broadcast(cents))
        .withColumn("sim", cosine_sim("qe", "cent"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cell_id")
                )
            ),
        )
        .filter(F.col("rk") <= N_PROBE)
        .select("query_id", "qe", "cell_id")
    )
    scored = (
        q_cells.join(c_scored, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_sim("qe", "ce"), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(scored, k)
