"""Deduplication operators for training-data pipelines.

Scale design: exact dedup is a hash-groupBy (one shuffle on a 64-bit
text hash, never on the full text). Near-dup goes through MinHash+LSH
banding so candidate generation is a bucket join (shuffle bounded by
band signatures), never an O(n²) cross join; the exact-Jaccard
verification runs only on candidate pairs. The `dedup_ngram_jaccard`
operator is the small-SF *correctness* path (exact, oracle-checkable);
at 100 TB you run `dedup_minhash_lsh`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import word_shingles
from mimir_spark.functions.vectors import cosine_sim
from mimir_spark.sources.tables import load_table

SHINGLE_WORDS = 3


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-text dedup: keep the smallest doc_id per distinct text.
    Group key is xxhash64(text) + length (cheap, fixed-width shuffle
    key); the window tie-break keeps the survivor deterministic.
    Returns surviving (doc_id, n_dups)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.xxhash64("text").alias("h"), F.length("text").alias("len")
    )
    w = Window.partitionBy("h", "len").orderBy("doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(Window.partitionBy("h", "len")))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_dups")
    )


def _shingled(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(word_shingles("text", SHINGLE_WORDS)).alias("sh")
    )


def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over 3-word shingle sets: pairs with J ≥ threshold.

    Implemented as the standard shingle self-join: explode shingles,
    join on shingle to count intersections, then J = |∩|/(|A|+|B|−|∩|).
    The join key is the shingle string — fine at verification scale; the
    LSH variant below is the candidate-generation path at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    sizes = docs.select(
        "doc_id", F.size(word_shingles("text", SHINGLE_WORDS)).alias("n_sh")
    )
    sh = _shingled(docs)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---- MinHash + LSH -----------------------------------------------------

N_HASHES = 128
N_BANDS = 32  # 4 rows/band → catches J≈0.5+ pairs with high probability
# 31-bit Mersenne prime: a·x + b stays < 2^62, no long overflow under
# ANSI arithmetic.
MERSENNE = (1 << 31) - 1


def _minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """doc_id → array<long> of n_hashes min-hash values.

    Shingle → 64-bit xxhash64 folded to 31 bits (JVM, codegen'd), then
    n universal-hash permutations h_i(x) = (a_i·x + b_i) mod p.

    The 128-way hash×min is the hot loop and a 128-column JVM aggregate
    falls out of whole-stage codegen (interpreted eval ≈ 10× slower),
    so the per-batch PARTIAL minima are computed vectorized in NumPy
    via mapInPandas — no shuffle, one Python call per Arrow batch, a
    (batch×128) matrix op per call. The JVM then finishes with the same
    128-min aggregate over only ~(batches × docs-per-batch-boundary)
    partial rows (thousands, not the full shingle table), which also
    gives map-side partial aggregation on the single doc_id shuffle.
    """
    import random

    import numpy as np
    import pandas as pd

    rng = random.Random(42)
    coeffs = [
        (rng.randrange(1, MERSENNE), rng.randrange(0, MERSENNE))
        for _ in range(n_hashes)
    ]
    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)

    sh = _shingled(docs).select(
        "doc_id", (F.xxhash64("sh").bitwiseAND(F.lit(MERSENNE))).alias("x")
    )

    partial_schema = "doc_id long, " + ", ".join(
        f"h{i} long" for i in range(n_hashes)
    )

    def _partial_mins(batches):
        for pdf in batches:
            doc = pdf["doc_id"].to_numpy(np.int64)
            x = pdf["x"].to_numpy(np.int64)
            order = np.argsort(doc, kind="stable")
            doc_s, x_s = doc[order], x[order]
            # x < 2^31 and a < 2^31 ⇒ a·x + b < 2^62: no int64 overflow.
            h = (x_s[:, None] * A[None, :] + B[None, :]) % MERSENNE
            bounds = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
            mins = np.minimum.reduceat(h, bounds, axis=0)
            out = {"doc_id": doc_s[bounds]}
            for i in range(n_hashes):
                out[f"h{i}"] = mins[:, i]
            yield pd.DataFrame(out)

    partial = sh.mapInPandas(_partial_mins, partial_schema)
    sig = partial.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    )
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig")
    )


def lsh_candidates(
    sig: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; docs
    sharing any (band, bucket) are candidates. The bucket join shuffles
    on (band, bucket_hash) — bounded, skew-safe via AQE."""
    rows = n_hashes // n_bands
    # Bucket hash over the band's raw longs (element_at + multi-column
    # xxhash64) — no array→string materialization per band.
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    *[F.element_at("sig", i * rows + j + 1) for j in range(rows)]
                ).alias("bucket"),
            )
            for i in range(n_bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """MinHash(128)+LSH candidates, then exact-Jaccard verify on the
    candidate pairs only. Output identical in shape to
    dedup_ngram_jaccard (its exact twin), but with O(n) candidate
    generation instead of a shingle self-join over everything."""
    docs = load_table(spark, sf_dir, "documents")
    sig = _minhash_signatures(docs)
    cand = lsh_candidates(sig)

    # Verify candidates against the true shingle sets with a single
    # array_intersect per pair: two joins onto the per-doc shingle-array
    # table (shuffle keyed on doc_id; at 100 TB the candidate set is
    # orders of magnitude smaller than the corpus, so both joins are
    # candidate-sized, never corpus × corpus).
    shingle_sets = docs.select(
        "doc_id", word_shingles("text", SHINGLE_WORDS).alias("sh_set")
    )
    sa = shingle_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("sh_a")
    )
    sb = shingle_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("sh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5, max_iters: int = 20
) -> DataFrame:
    """Connected components over the near-dup pair graph: every doc in
    a duplicate pair gets the min doc_id of its component as
    cluster_id — the step that turns pairwise dedup output into 'keep
    one representative per cluster'.

    Iterative min-label propagation: each round, every node takes the
    min label among itself and its neighbours; converges in O(diameter)
    rounds. The driver loop only checks a scalar convergence count —
    labels live in DataFrames throughout, each round is one shuffle on
    node id, and lineage is truncated per round with localCheckpoint
    (same pattern as BFS). Components of near-dup graphs are tiny
    (docs are mutually similar), so diameter — and round count — stays
    small even at corpus scale.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbour_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbour_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node", "label")
        if n_changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_survivors(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """The end of the dedup pipeline: per near-dup cluster, keep the
    LONGEST document (ties → lowest doc_id). Returns one row per
    cluster: (cluster_id, survivor_doc_id, n_members) — the keep-list a
    corpus build joins against. Composes dedup_clusters with a
    per-cluster window top-1; the join onto documents only carries
    doc_id + n_chars (pruned scan)."""
    clusters = dedup_clusters(spark, sf_dir, threshold)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        clusters.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count("*").over(Window.partitionBy("cluster_id"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_doc_id"),
            "n_members",
        )
    )


# ---- SimHash -----------------------------------------------------------


def dedup_simhash(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """64-bit SimHash over word shingles; near-dup pairs = hamming ≤ k.

    Fingerprint: per doc, for each bit position, sign of Σ ±1 weighted
    by shingle hash bit — computed with array expressions (no UDF).
    Pair generation blocks on 4 16-bit chunks (pigeonhole: hamming ≤ 3
    ⇒ at least one identical chunk), so the join is a bounded
    bucket-join, never all-pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingled(docs).withColumn("h", F.xxhash64("sh"))
    # bit i contribution: +1 if set else -1 → sum per (doc, bit)
    bit_sums = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = bit_sums.select(
        "doc_id",
        sum(
            [
                F.shiftleft(
                    F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i
                )
                for i in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("fp"),
    )
    chunks = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("fp", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "fp", "cc.chunk", "cc.key")
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_embedding(
    spark: SparkSession, sf_dir: str, threshold: float = 0.45
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold. Small-SF exact
    path is a blocked self-join; the ANN-LSH operator in similarity.py
    is the candidate-generation path at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine_sim("ea", "eb"), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
