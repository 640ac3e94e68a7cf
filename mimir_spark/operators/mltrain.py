"""Distributed linear-model TRAINING as a DataFrame plan — the
capability pillar beyond k-means: full-batch gradient-descent
logistic regression, used here to distill the Gopher rule gate into
a single linear scorer (a standard move: train a cheap classifier on
rule labels, then score at wire speed where the rule chain is too
expensive or the labels come from a slow teacher).

Execution model (the kmeans/lloyd recipe, clustering.py:64):
- The feature table is computed ONCE (one corpus scan, reusing the
  gopher_quality_filter statistics) and localCheckpoint'd.
- Each GD round is ONE map-side-combined aggregate job: the weight
  vector rides into the executors as literals, the gradient
  Σ (σ(w·x) − y)·x comes back as |w| doubles — driver state is the
  weight vector, bounded metadata at any corpus size (the same
  contract as Lloyd's k·d centroid traffic).
- Per-round weights are rounded to a 6dp grid: gradient components
  are order-dependent float sums, and the grid pins them across
  engines/partitionings (the kmeans 9dp move; 6dp here because the
  sigmoid's exp() may differ by an ulp across engines) — which is
  what lets TRAINING itself carry a value-hashed unrolled DuckDB
  oracle instead of a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOGREG_ITERS = 30
LOGREG_LR = 5.0
N_FEATURES = 4  # bias + 3 centered gopher statistics

FEATURE_COLS = ("x0", "x1", "x2", "x3")


def quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x0..x3, y): bias + the three Gopher statistics that
    VARY on this corpus (symbol and alpha-word ratios are constant
    here — a zero-variance feature only adds a redundant bias
    direction), each CENTERED near its rule threshold and scaled to
    O(1) — full-batch GD without feature conditioning stalls (an
    uncentered mean-word-length of ~4.5 dominates every z). The label
    is the rule verdict. Everything derives from
    gopher_quality_filter's single-scan report, so both engines start
    from identical 6dp-rounded doubles."""
    from mimir_spark.operators.quality import gopher_quality_filter

    g = gopher_quality_filter(spark, sf_dir)
    return g.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        ((F.col("n_words") - F.lit(100.0)) / F.lit(100.0)).alias("x1"),
        (F.col("mean_word_len") - F.lit(4.5)).alias("x2"),
        ((F.col("n_stopwords") - F.lit(2.0)) / F.lit(2.0)).alias("x3"),
        F.col("passes_gopher").cast("double").alias("y"),
    )


def _z_expr(w: list[float]) -> F.Column:
    """w·x as the fixed left-assoc chain w0*x0 + w1*x1 + … — the same
    parenthesization the oracle SQL writes."""
    z = F.lit(w[0]) * F.col("x0")
    for j in range(1, N_FEATURES):
        z = z + F.lit(w[j]) * F.col(FEATURE_COLS[j])
    return z


def train_logreg(
    feats: DataFrame, iters: int = LOGREG_ITERS, lr: float = LOGREG_LR
) -> list[tuple]:
    """Run `iters` full-batch GD rounds over (x0..x5, y) rows; returns
    [(step, w0..w5), …] with per-round 6dp weight grids. One
    aggregate job per round; n is the one scalar collect (bounded
    metadata, kmeans-seed class)."""
    n = feats.count()
    w = [0.0] * N_FEATURES
    out = []
    for t in range(iters):
        z = _z_expr(w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        grads = feats.agg(
            *[
                F.sum((p - F.col("y")) * F.col(FEATURE_COLS[j])).alias(
                    f"g{j}"
                )
                for j in range(N_FEATURES)
            ]
        ).collect()[0]
        w = [
            round(w[j] - lr * float(grads[f"g{j}"]) / n, 6)
            for j in range(N_FEATURES)
        ]
        out.append((t + 1, *w))
    return out


def logreg_train_quality(
    spark: SparkSession,
    sf_dir: str,
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
) -> DataFrame:
    """queries() entry: the full weight TRAJECTORY, one row per GD
    round — every round hash-checked against the oracle's unrolled
    round chain (the kmeans per-round-grid contract)."""
    feats = quality_features(spark, sf_dir).localCheckpoint(eager=True)
    rows = train_logreg(feats, iters, lr)
    return spark.createDataFrame(
        rows,
        "step long, w0 double, w1 double, w2 double, w3 double",
    )


def logreg_score_quality(
    spark: SparkSession,
    sf_dir: str,
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
) -> DataFrame:
    """Score every doc with the trained weights (map-only: weights are
    literals, one pass over the feature scan): per-doc 6dp sigmoid
    probability, predicted class at 0.5, the rule label, and the
    agreement flag — the distilled gate plus its fidelity readout."""
    feats = quality_features(spark, sf_dir).localCheckpoint(eager=True)
    w = list(train_logreg(feats, iters, lr)[-1][1:])
    z = _z_expr(w)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        "doc_id",
        p.alias("prob"),
        (p >= 0.5).cast("long").alias("pred"),
        F.col("y").cast("long").alias("label"),
        (
            (p >= 0.5).cast("long") == F.col("y").cast("long")
        ).cast("long").alias("correct"),
    )
