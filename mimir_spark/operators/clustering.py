"""Iterative clustering over the embeddings table.

`kmeans_embeddings` is full Lloyd's k-means expressed the way a
distributed engine should run it (MLlib uses the same structure): the
k·dim centroid matrix is bounded METADATA, so it lives driver-side as
a literal expression each round — the corpus never moves. Per
iteration the plan is:

- assignment: a pure map over the points — squared distance to each of
  the k literal centroids (`transform` + `aggregate` over a constant
  array), argmin via `array_position(dists, array_min(dists))` (ties →
  lowest centroid id). ZERO shuffle.
- update: one groupBy(cid) with count + 64 per-dimension element sums —
  partial (map-side) aggregation reduces each partition to ≤k rows, so
  the shuffle moves k·(dim+1) values per partition regardless of
  corpus size.

The only driver traffic is k rows per round (the new centroids) — the
direct analogue of BFS's scalar frontier check, and the standard
pattern for bounded-state iterative ML on Spark. Deterministic: seeds
are the k lowest vec_ids, exactly n_iters rounds, first-min
tie-breaks — the unit test pins it to a NumPy reference
implementation bit-for-bit (modulo summation-order ULPs absorbed by
rounding the reported inertia).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

K = 8
N_ITERS = 5


def _sq_dist_to(centroid_lit):
    """Squared L2 distance from array column `e` to a literal centroid."""
    return F.aggregate(
        F.zip_with(F.col("e"), centroid_lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(pts: DataFrame, centroids: list[list[float]]) -> DataFrame:
    carr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(carr, lambda ce: _sq_dist_to(ce))
    return pts.select(
        "vec_id",
        "e",
        F.array_position(dists, F.array_min(dists)).alias("cid"),
        F.array_min(dists).alias("d"),
    )


def _lloyd_iterate(
    pts: DataFrame,
    centroids: list[list[float]],
    n_iters: int,
    round_dp: int | None = None,
) -> list[list[float]]:
    """Run n_iters Lloyd rounds over (vec_id, e) points and return the
    final k×dim centroid list (driver-side bounded metadata). Per
    round: zero-shuffle literal-centroid assignment + one map-side-
    combined groupBy update; driver traffic is k rows per round.

    ``round_dp`` rounds every coordinate after each update: the
    per-dimension F.sum is partial-aggregated, so its last ULPs depend
    on partition boundaries — rounding pins the centroids (and every
    downstream assignment) across partitionings/AQE decisions, which
    the IVF index build needs (its in-memory and persisted paths must
    agree bit-for-bit)."""
    dim = len(centroids[0])
    for _ in range(n_iters):
        assigned = _assign(pts, centroids)
        stats = (
            assigned.groupBy("cid")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("e", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new_c = list(centroids)  # empty clusters keep their centroid
        for r in stats:
            new_c[r.cid - 1] = [r[f"s{i}"] / r.n for i in range(dim)]
        if round_dp is not None:
            new_c = [[round(x, round_dp) for x in c] for c in new_c]
        centroids = new_c
    return centroids


def lloyd_centroids(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    n_iters: int = N_ITERS,
    normalize: bool = True,
) -> list[list[float]]:
    """Trained (not seed) centroids for vector-index builds: Lloyd
    k-means over the embeddings, on L2-NORMALIZED vectors by default
    so squared-L2 assignment orders like cosine — the metric the IVF
    probe ranks cells with. Deterministic: lowest-vec_id seeds, fixed
    rounds, per-round 9dp centroid rounding (absorbs partial-agg
    summation-order ULPs)."""
    e = F.col("embedding").cast("array<double>")
    if normalize:
        norm = F.sqrt(
            F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        e = F.transform(e, lambda x: x / norm)
    pts = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", e.alias("e"))
        .localCheckpoint(eager=True)
    )
    seeds = pts.orderBy("vec_id").limit(k).collect()
    centroids = [[round(float(x), 9) for x in r.e] for r in seeds]
    return _lloyd_iterate(pts, centroids, n_iters, round_dp=9)


def kmeans_embeddings(
    spark: SparkSession, sf_dir: str, k: int = K, n_iters: int = N_ITERS
) -> DataFrame:
    """Deterministic k-means over `embeddings`; returns per-cluster
    (cluster_id, n_points, inertia)."""
    pts = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .localCheckpoint(eager=True)
    )
    # Seeds: the k lowest vec_ids. k rows of bounded metadata — the one
    # acceptable collect (same class as BFS's 1-row source lookup).
    seeds = pts.orderBy("vec_id").limit(k).collect()
    # round_dp=9: per-dim centroid means are order-dependent double
    # sums; the 1e-9 grid pins them across engines/partitionings,
    # which is what lets this op carry a value-hashed DuckDB oracle
    # (unrolled assignment/update rounds) instead of rows-only.
    centroids = _lloyd_iterate(
        pts, [list(r.e) for r in seeds], n_iters, round_dp=9
    )

    return (
        _assign(pts, centroids)
        .groupBy(F.col("cid").cast("long").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.sum("d"), 4).alias("inertia"),
        )
    )


def _gram_flat(spark: SparkSession, sf_dir: str, d: int = 64):
    """Distributed single-pass second-moment state: per Arrow batch a
    partial Gram matrix (NumPy einsum over float64), sum vector, and
    count; partials are position-keyed and summed in one bounded
    shuffle (d²+d+1 rows per batch). Shared by embedding_pca (driver
    eigensolve) and embedding_gram (oracle-checked raw state)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")

    def _partials(batches):
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if x.size == 0:
                continue
            gram = np.einsum("ni,nj->ij", x, x)
            out = np.concatenate([gram.ravel(), x.sum(axis=0), [len(x)]])
            yield pd.DataFrame({"pos": np.arange(d * d + d + 1), "val": out})

    partial = emb.mapInPandas(_partials, "pos long, val double")
    summed = partial.groupBy("pos").agg(F.sum("val").alias("val"))
    rows = summed.collect()
    flat = np.zeros(d * d + d + 1)
    for r in rows:
        flat[r.pos] = r.val
    return flat


def embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked projection of embedding_pca's reduced state: the
    position-summed Gram matrix Σ xᵢxⱼ (upper triangle, d(d+1)/2 rows,
    rounded to 4 decimals) — plain sums of float64 products, so DuckDB
    recomputes it exactly up to summation order. This pins the entire
    distributed leg of the PCA (partial einsum + positional sum); only
    the driver-side eigensolve stays rows-only (embedding_pca)."""
    d = 64
    flat = _gram_flat(spark, sf_dir, d)
    gram = flat[: d * d].reshape(d, d)
    return spark.createDataFrame(
        [
            (i, j, round(float(gram[i, j]), 4))
            for i in range(d)
            for j in range(i, d)
        ],
        "i long, j long, gram double",
    )


def embedding_pca(spark: SparkSession, sf_dir: str, top: int = 5) -> DataFrame:
    """PCA spectrum of the embedding space — the dimension-collapse
    check an embedding-ingest QA runs (a healthy space spreads
    variance; a collapsed encoder concentrates it in a few axes).

    Scale shape: the 64×64 covariance needs ONE pass — each Arrow
    batch contributes a partial Gram matrix (NumPy einsum), a count,
    and a sum vector; partials are 64²+64+1 floats per batch, summed
    by position in a shuffle bounded by 4161·batches rows. The
    eigendecomposition runs on the DRIVER over the tiny 64×64 result
    (not a distributed solve — at ANY corpus size the reduced state
    is d², which is the whole point). Pinned against full-matrix
    NumPy PCA in tests; the distributed leg (partial einsum +
    positional sum) is oracle-checked via embedding_gram."""
    import numpy as np

    d = 64
    flat = _gram_flat(spark, sf_dir, d)
    gram, s, n = flat[: d * d].reshape(d, d), flat[d * d : d * d + d], flat[-1]
    cov = gram / n - np.outer(s / n, s / n)
    evals = np.linalg.eigvalsh(cov)[::-1][:top]
    total = float(np.trace(cov))
    return spark.createDataFrame(
        [
            (i, round(float(v), 6), round(float(v / total), 6))
            for i, v in enumerate(evals)
        ],
        "component long, eigenvalue double, explained_variance double",
    )


# ---- Gonzalez greedy k-center (diverse coreset selection) -------------------


def kcenter_greedy(
    spark: SparkSession, sf_dir: str, k: int = K
) -> DataFrame:
    """Gonzalez farthest-point k-center selection over the embeddings
    — the deterministic coreset/diversity-sampling primitive (a
    2-approximation of the k-center objective; the greedy step behind
    facility-location data selection and k-means++'s argmax variant).

    Round r picks the point MAXIMIZING its distance to the nearest
    already-chosen center (ties → lowest vec_id); the first center is
    the lowest vec_id. Per round: centers are a broadcast LITERAL
    (k·dim doubles), so the assignment is a zero-shuffle map + one
    max_by reduce — the corpus never moves, driver traffic is one row
    per round (the kmeans/BFS precedent). At 100 TB each round is one
    scan; k scans total for k centers — the known lower bound for
    exact greedy k-center without sampling.

    Value-hash portability: squared L2 distances are SEQUENTIAL folds
    over j=1..dim, evaluated in the identical order by Spark
    F.aggregate and DuckDB list_sum, so the unrolled oracle selects
    the identical argmax chain with NO distance rounding; only the
    REPORTED radii are rounded (6dp).

    Output: (rank, vec_id, sel_radius, cover_radius) — sel_radius is
    the selected point's min-distance at selection time (the k-center
    radius trace, non-increasing), cover_radius the final objective
    max_p min_c d(p, c) after all k centers.
    """
    pts = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .localCheckpoint(eager=True)
    )
    first = pts.orderBy("vec_id").select("vec_id", "e").first()
    centers = [[float(x) for x in first["e"]]]
    trace = [(1, int(first["vec_id"]), 0.0)]

    def dmin_col() -> F.Column:
        carr = F.array(
            *[F.array(*[F.lit(x) for x in c]) for c in centers]
        )
        return F.array_min(F.transform(carr, lambda ce: _sq_dist_to(ce)))

    for r in range(2, k + 1):
        row = (
            pts.select("vec_id", "e", dmin_col().alias("dmin"))
            .orderBy(F.desc("dmin"), F.asc("vec_id"))
            .first()
        )
        trace.append((r, int(row["vec_id"]), round(float(row["dmin"]), 6)))
        centers.append([float(x) for x in row["e"]])
    cover = round(
        float(pts.select(F.max(dmin_col()).alias("m")).first()["m"]), 6
    )
    return spark.createDataFrame(
        [(rk, v, s, cover) for rk, v, s in trace],
        "rank int, vec_id long, sel_radius double, cover_radius double",
    )
