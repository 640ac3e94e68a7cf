"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS local fingerprinting algorithm).

Where `doc_fingerprint` hashes the WHOLE text (any edit changes it)
and the MinHash family estimates whole-document similarity, winnowing
guarantees LOCAL detection: selecting the minimum k-gram hash in every
window of w consecutive k-grams ensures that ANY substring match of
length ≥ w + k − 1 shares at least one selected fingerprint — the
property plagiarism/code-clone detectors rely on, and a useful
contamination primitive beside the span-level exact ops.

Scale shape: fingerprint extraction is MAP-ONLY (per-doc list
arithmetic, no shuffle); hot fingerprints (df > maxdf) are dropped
BEFORE the pair join, bounding per-key fanout at maxdf² (the
containment-LSH class-restriction move — boilerplate-heavy 8-grams
would otherwise quadratically dominate); the pair aggregation is one
exchange on (doc_a, doc_b). The hot-fp drop is a broadcast LEFT ANTI
join against ONLY the hot list — fingerprints with df > maxdf, a set
bounded by (total fps / maxdf) and in practice tiny (boilerplate) —
never the corpus-sized cold table, so the broadcast stays
driver-safe at 100 TB (at sf0.01: 36 hot fps vs ~300k cold).

Portability: k-gram hashes are the repo's md5-31 form over raw
8-char substrings, window minima are exact integer array_min — the
DuckDB oracle replicates every step literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table
from mimir_spark.functions.spread import spread_small_scan

WIN_K = 8  # k-gram length (chars)
WIN_W = 8  # window: min over W consecutive k-gram hashes
WIN_MAXDF = 16  # drop fingerprints shared by more docs than this
WIN_MIN_SHARED = 4  # report pairs with at least this many shared fps
# any common substring of length >= WIN_GUARANTEE shares a fingerprint
WIN_GUARANTEE = WIN_K + WIN_W - 1


def winnow_fingerprints(
    docs: DataFrame, k: int = WIN_K, w: int = WIN_W
) -> DataFrame:
    """(doc_id, fp): the distinct winnowing fingerprints of each doc —
    min k-gram hash per w-window. Map-only."""
    kh = (
        f"transform(sequence(1, length(text) - {k - 1}),"
        f" i -> cast(conv(substring(md5(substring(text, i, {k})), 1, 8),"
        f" 16, 10) AS bigint) & 2147483647)"
    )
    wins = (
        f"array_distinct(transform(sequence(1, size(kh) - {w - 1}),"
        f" s -> array_min(slice(kh, s, {w}))))"
    )
    return (
        spread_small_scan(docs.filter(F.length("text") >= k + w - 1))
        .selectExpr("doc_id", f"{kh} AS kh")
        .selectExpr("doc_id", f"explode({wins}) AS fp")
    )


def winnowing_matches(
    spark: SparkSession,
    sf_dir: str,
    k: int = WIN_K,
    w: int = WIN_W,
    maxdf: int = WIN_MAXDF,
    min_shared: int = WIN_MIN_SHARED,
) -> DataFrame:
    """Cross-document winnowing match report: pairs sharing ≥
    min_shared selected fingerprints (hot fps with df > maxdf
    excluded), with per-doc fingerprint counts and the containment-
    style score shared / min(n_a, n_b)."""
    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, k, w).localCheckpoint(eager=True)
    return winnow_match_report(fps, maxdf, min_shared)


def winnow_match_report(
    fps: DataFrame,
    maxdf: int = WIN_MAXDF,
    min_shared: int = WIN_MIN_SHARED,
) -> DataFrame:
    """The matching tail over a (doc_id, fp) fingerprint table —
    shared with the streaming finalizer (fingerprints are a pure
    function of each doc, so per-batch extraction merges by plain
    union)."""
    hot = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("dfreq"))
        .filter(F.col("dfreq") > maxdf)
        .select("fp")
    )
    cold = fps.join(F.broadcast(hot), "fp", "left_anti").select(
        "doc_id", "fp"
    )
    per_doc = fps.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fp")
    )
    a = cold.select(F.col("doc_id").alias("doc_a"), "fp")
    b = cold.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(
            per_doc.select(
                F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            per_doc.select(
                F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b"), 6
            ).alias("score"),
        )
    )


def winnow_clusters(
    spark: SparkSession,
    sf_dir: str,
    k: int = WIN_K,
    w: int = WIN_W,
    maxdf: int = WIN_MAXDF,
    min_shared: int = WIN_MIN_SHARED,
) -> DataFrame:
    """Connected components over the winnowing match graph — the
    cluster view of winnowing_matches (docs transitively linked by
    ≥ min_shared shared fingerprints share a cluster), through the
    SAME min-label finisher every other dedup family uses. Output:
    (doc_id, cluster_id = min doc_id reachable), matched docs only.
    """
    from mimir_spark.operators.dedup import min_label_components

    pairs = winnowing_matches(
        spark, sf_dir, k, w, maxdf, min_shared
    ).select("doc_a", "doc_b")
    return min_label_components(pairs)
