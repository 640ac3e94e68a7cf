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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import (
    tokens_col,
    word_shingles,
    word_shingles_all,
)
from mimir_spark.functions.vectors import cosine_sim, dot
from mimir_spark.sources.tables import load_table

SHINGLE_WORDS = 3


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism before an
    expensive map side: a corpus file smaller than maxPartitionBytes
    arrives as ONE split, which would run shingling / Python kernels
    on a single core. The row-count shuffle is trivial next to the
    work it parallelizes (same move a cluster job makes when a coarse
    upstream layout precedes an expensive per-row stage)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)



def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-text dedup: keep the smallest doc_id per distinct text.

    The window key is (xxhash64(text), length(text), text): the
    fixed-width hash+length prefix decides shuffle partitioning and
    almost every sort comparison, while the trailing text column makes
    the grouping EXACT — without it, a 64-bit hash+length collision
    between two distinct documents silently merges them, which at
    corpus scale is a real (if small) risk and also breaks parity with
    the oracle (which partitions by full text). The text bytes ride the
    shuffle anyway whenever the survivor's content is wanted; here they
    cost one extra shuffled column in exchange for exactness.
    Returns surviving (doc_id, n_dups)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.xxhash64("text").alias("h"), F.length("text").alias("len"), "text"
    )
    key = [F.col("h"), F.col("len"), F.col("text")]
    w = Window.partitionBy(*key).orderBy("doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(Window.partitionBy(*key)))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_dups")
    )


PREFIX_WORDS = 8


def dedup_prefix(
    spark: SparkSession, sf_dir: str, n_words: int = PREFIX_WORDS
) -> DataFrame:
    """Prefix dedup: group docs sharing their first `n_words` words —
    the cheap boilerplate catcher (scraped pages that open with the
    same header/navigation block are near-dups that exact dedup
    misses and shingle Jaccard pays full price to find).

    Same shuffle shape as `dedup_exact`, applied to the prefix: the
    window key is (xxhash64(prefix), length, prefix) — fixed-width
    hash decides partitioning and almost every comparison, trailing
    prefix string keeps the grouping exact. Only groups with ≥2
    members are emitted (survivor = smallest doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(tokens_col("text"), 1, n_words))
    keyed = docs.select(
        "doc_id",
        F.xxhash64(prefix).alias("h"),
        F.length(prefix).alias("len"),
        prefix.alias("prefix"),
    )
    key = [F.col("h"), F.col("len"), F.col("prefix")]
    w = Window.partitionBy(*key).orderBy("doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(Window.partitionBy(*key)))
        .filter((F.col("rn") == 1) & (F.col("n_dups") >= 2))
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


def dedup_containment(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8
) -> DataFrame:
    """Asymmetric near-dup: shingle CONTAINMENT |A∩B| / min(|A|,|B|) —
    catches a document embedded inside a longer one (quote farms,
    wrapper boilerplate), which symmetric Jaccard dilutes below any
    usable threshold.

    Same exact shingle self-join shape as `dedup_ngram_jaccard` (the
    correctness path; MinHash banding is the candidate generator at
    100 TB — containment can be estimated from the same signatures),
    differing only in the final normalizer."""
    docs = load_table(spark, sf_dir, "documents")
    sizes = docs.select(
        "doc_id", F.size(word_shingles("text", SHINGLE_WORDS)).alias("n_sh")
    )
    sh = _shingled(docs)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least("na", "nb"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


# ---- MinHash + LSH -----------------------------------------------------

N_HASHES = 128
N_BANDS = 32  # 4 rows/band → catches J≈0.5+ pairs with high probability
# 31-bit Mersenne prime: a·x + b stays < 2^62, no long overflow under
# ANSI arithmetic.
MERSENNE = (1 << 31) - 1

# Fixed pseudo-random coefficient families, generated from pinned
# seeds so the DuckDB oracles can embed the SAME literals (the whole
# sketch chain — token hash, shingle fold, permutations, band buckets,
# SimHash bits — is plain integer arithmetic both engines compute
# identically; see word_shingle_hashes):
import random as _random

_rng = _random.Random(42)
MINHASH_COEFFS = [
    (_rng.randrange(1, MERSENNE), _rng.randrange(0, MERSENNE))
    for _ in range(N_HASHES)
]
# Band-bucket linear hash: bucket = Σ_j sig[start+j]·C_j. 25-bit odd
# constants keep every partial sum in int64 for any rows-per-band up
# to N_HASHES (term < 2^56, 128 terms < 2^63) under ANSI arithmetic;
# a cross-vector collision (~2^-25 per pair) only ADDS a candidate,
# which exact verification removes.
_rng_b = _random.Random(7)
BUCKET_COEFFS = [_rng_b.randrange(1, 1 << 25) | 1 for _ in range(N_HASHES)]
# SimHash per-bit universal hashes (independent family from MinHash).
_rng_s = _random.Random(1234)
SIMHASH_COEFFS = [
    (_rng_s.randrange(1, MERSENNE), _rng_s.randrange(0, MERSENNE))
    for _ in range(64)
]


def portable_band_bucket(sig_col: str, start: int, rows: int) -> Column:
    """Engine-portable bucket id for `rows` signature positions
    starting at 0-based `start`: a fixed-coefficient linear
    combination (replaces the xxhash64 multi-column hash, which no
    oracle engine can replicate). Pure int64 arithmetic — see
    BUCKET_COEFFS for the overflow argument."""
    terms = [
        F.element_at(sig_col, start + j + 1) * F.lit(BUCKET_COEFFS[j])
        for j in range(rows)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _minhash_doc_table(
    docs: DataFrame, n_hashes: int = N_HASHES
) -> DataFrame:
    """(doc_id, sh_set, sig): each document's distinct hashed shingle
    set AND its MinHash signature, computed in ONE Arrow pass —
    tokenize, memoized portable md5-31 token hash, ×131 shingle fold,
    per-doc distinct, then the (|set| × n_hashes) universal-hash
    min reduction, all row-local NumPy (functions/pykernels.py).

    Scale shape: this is the sketch family's only corpus-sized stage
    and it is SHUFFLE-FREE — a doc's shingle set and signature are
    pure functions of its own text, so nothing here keys an exchange
    (the previous form exploded the shingle table and finished the
    128-way min with a per-doc aggregate — a corpus-token-sized
    shuffle that existed only because the set was assembled
    JVM-side). Emitting sh_set beside sig also hands the verify step
    its arrays without a second tokenize pass.

    Empty/whitespace-only documents yield NO row (no signature is
    definable over an empty set — the old explode path dropped them
    from signatures the same way); a consumer that needs one row per
    document left-joins the corpus and coalesces to an empty array,
    as write_lsh_index does for the index shingles table."""
    import numpy as np
    import pandas as pd

    from mimir_spark.functions.pykernels import doc_shingle_set

    coeffs = MINHASH_COEFFS[:n_hashes]
    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)

    def _table(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                xs = doc_shingle_set(text, SHINGLE_WORDS)
                if xs is None:
                    continue
                # x < 2^31 and a < 2^31 ⇒ a·x + b < 2^62: no overflow.
                sig = ((xs[:, None] * A[None, :] + B[None, :]) % MERSENNE).min(
                    axis=0
                )
                out.append((int(doc_id), xs.tolist(), sig.tolist()))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "sh_set", "sig"])

    # Repartition FIRST: a corpus file smaller than maxPartitionBytes
    # arrives as one split, which would run the whole kernel on a
    # single core.
    return _spread(docs.select("doc_id", "text")).mapInPandas(
        _table, "doc_id long, sh_set array<long>, sig array<long>"
    )


def _minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """doc_id → array<long> of n_hashes min-hash values
    h_i = min_x (a_i·x + b_i) mod p over the doc's distinct 31-bit
    hashed shingles — a projection of `_minhash_doc_table` (one
    shuffle-free Arrow pass; bit-identical to the oracle's literal
    MINHASH_COEFFS arithmetic)."""
    return _minhash_doc_table(docs, n_hashes).select("doc_id", "sig")


def lsh_candidates(
    sig: DataFrame,
    n_bands: int = N_BANDS,
    n_hashes: int = N_HASHES,
    probe: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; docs
    sharing any (band, bucket) are candidates. The bucket join shuffles
    on (band, bucket_hash) — bounded, skew-safe via AQE.

    With ``probe`` (a (doc_id, sig) subset, e.g. one micro-batch),
    only pairs touching a probe doc are generated: the join is
    probe-buckets × sig-buckets instead of the full self-join, so the
    incremental-streaming per-batch cost is O(batch × history) bucket
    collisions, never O(history²)."""
    rows = n_hashes // n_bands
    # Bucket rows as ONE Arrow kernel (round 15 — the dedup2
    # containment-bucket precedent applied to the plain banding path):
    # the expression form built an n_bands-struct literal array per
    # side, and CONSTRUCTING + analyzing that tree cost a measured
    # ~1.2 s of driver time per query (plus interpreted element_at
    # evaluation per row). The kernel computes the identical
    # fixed-coefficient linear hash bucket[b] = Σ_j sig[b·rows+j]·C_j
    # (portable_band_bucket's formula) in one int64 matmul — integer
    # adds are associative and np.int64 wraps like the JVM long, so
    # the buckets are bit-exact.
    import numpy as np
    import pandas as pd

    coef = np.tile(
        np.array(BUCKET_COEFFS[:rows], dtype=np.int64), n_bands
    )
    band_ids = np.arange(n_bands, dtype=np.int64)

    def _bucket_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sig = np.array(list(pdf["sig"]), dtype=np.int64)
            b = (sig * coef[None, :]).reshape(
                len(sig), n_bands, rows
            ).sum(axis=2)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        pdf["doc_id"].to_numpy(np.int64), n_bands
                    ),
                    "band": np.tile(band_ids, len(sig)),
                    "bucket": b.reshape(-1),
                }
            )

    def _buckets(df: DataFrame) -> DataFrame:
        return df.mapInPandas(
            _bucket_kernel, "doc_id long, band long, bucket long"
        )

    b = _buckets(sig).alias("b")
    if probe is None:
        a = _buckets(sig).alias("a")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    # probe side: inequality (not <) so pairs where the probe doc has
    # the larger id are still found; least/greatest canonicalizes, and
    # probe-internal pairs (found in both orders) collapse in distinct.
    a = _buckets(probe).alias("a")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
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
    # ONE kernel pass yields signatures AND the verification shingle
    # sets (localCheckpoint so the two consumers share it).
    tbl = _minhash_doc_table(docs).localCheckpoint(eager=True)
    cand = lsh_candidates(tbl.select("doc_id", "sig"))

    # Verify candidates against the true shingle sets with a single
    # array_intersect per pair: two joins onto the per-doc shingle-array
    # table (shuffle keyed on doc_id; at 100 TB the candidate set is
    # orders of magnitude smaller than the corpus, so both joins are
    # candidate-sized, never corpus × corpus). Hashed shingle sets:
    # long-array intersect, no string materialization (Jaccard is
    # identical up to ~1e-5-probability 31-bit collisions, which only
    # ever merge elements — see word_shingle_hashes).
    shingle_sets = tbl.select("doc_id", "sh_set")
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


def near_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    pair_source: str = "exact",
) -> DataFrame:
    """Pair-generation stage shared by the cluster/survivor pipeline.

    ``pair_source``:
    - ``"exact"`` — the shingle self-join (dedup_ngram_jaccard). This
      is the ORACLE twin: complete by construction, but a shingle
      shared by k docs produces k² join rows, so a skewed corpus
      (boilerplate shingles) blows it up. Correctness path, small SF.
    - ``"lsh"`` — MinHash+LSH banding (dedup_minhash_lsh): candidate
      generation is a bounded bucket join, never quadratic in a
      shingle's popularity. The 100 TB path.
    - a callable ``(spark, sf_dir, threshold) -> DataFrame`` for custom
      sources (e.g. simhash); must return (doc_a, doc_b, ...).
    """
    if callable(pair_source):
        return pair_source(spark, sf_dir, threshold)
    if pair_source == "exact":
        return dedup_ngram_jaccard(spark, sf_dir, threshold)
    if pair_source == "lsh":
        return dedup_minhash_lsh(spark, sf_dir, threshold)
    raise ValueError(f"unknown pair_source {pair_source!r}")


def dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    max_iters: int = 20,
    pair_source: str = "exact",
) -> DataFrame:
    """Connected components over the near-dup pair graph: every doc in
    a duplicate pair gets the min doc_id of its component as
    cluster_id — the step that turns pairwise dedup output into 'keep
    one representative per cluster'.

    ``pair_source`` picks the pair generator (see near_dup_pairs):
    "exact" (default) is the oracle-checkable twin; "lsh" is the path
    a real corpus build runs — at 100 TB the exact shingle self-join
    is quadratic in hot-shingle popularity, while LSH banding keeps
    candidate generation bounded. dedup_clusters_lsh below exposes the
    scale path as its own queries() entry.

    Iterative min-label propagation: each round, every node takes the
    min label among itself and its neighbours; converges in O(diameter)
    rounds. The driver loop only checks a scalar convergence count —
    labels live in DataFrames throughout, each round is one shuffle on
    node id, and lineage is truncated per round with localCheckpoint
    (same pattern as BFS). Components of near-dup graphs are tiny
    (docs are mutually similar), so diameter — and round count — stays
    small even at corpus scale.
    """
    pairs = near_dup_pairs(spark, sf_dir, threshold, pair_source).select(
        "doc_a", "doc_b"
    )
    return min_label_components(pairs, max_iters)


def min_label_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components of an undirected (doc_a, doc_b) pair graph
    via iterative min-label propagation — the shared finisher for
    every pairwise dedup family (shingle-Jaccard, LSH, ICWS, edit
    distance). Each round is one shuffle on node id; lineage truncates
    per round with localCheckpoint; converges in O(diameter) rounds
    (near-dup components are mutually-similar cliques, so diameter
    stays small at any corpus size). Returns (doc_id, cluster_id =
    component-min doc_id) for every doc that appears in a pair."""
    from mimir_spark.operators.graph import _maybe_broadcast

    # dst-partitioned CACHE of the edge table (round 15 — the pagerank
    # precedent): cached, not checkpointed, because an
    # InMemoryTableScan reports the stored dst hash-partitioning while
    # a checkpointed RDD scan reports UnknownPartitioning. With that
    # layout, a round is ONE map stage while the label table fits the
    # broadcast gate: edges ⋈ broadcast(labels) preserves the streamed
    # side's dst partitioning, so the groupBy(dst) min needs no
    # exchange, and the label update joins broadcast(neighbour_min) —
    # zero per-round shuffles (the round-14 form re-shuffled the edge
    # table by src AND the labels by node EVERY round). Past the gate
    # (labels > BROADCAST_MAX_ROWS at some corpus size) the hints drop
    # and rounds degrade to the old shuffle joins. Cache substitution
    # happens on the analyzed plan, so each round also plans against
    # the flat InMemoryRelation instead of re-optimizing the whole
    # upstream pair pipeline.
    edges = (
        pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .toDF("src", "dst")
        .repartition("dst")
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # node count is free here (the checkpoint is materialized anyway)
    # and gates every per-round broadcast below.
    n_nodes = labels.count()
    for _ in range(max_iters):
        neighbour_min = (
            edges.join(
                _maybe_broadcast(labels, n_nodes), edges.src == labels.node
            )
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # lazy checkpoint: the convergence count right below is the
        # first action, so it materializes the checkpoint in the same
        # job (eager + count would run two jobs per round).
        new_labels = (
            labels.join(
                _maybe_broadcast(neighbour_min, n_nodes),
                labels.node == F.col("node2"),
                "left",
            )
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint(eager=False)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node", "label")
        if n_changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters on the MinHash+LSH pair source — the plan a
    100 TB corpus build actually runs (bounded bucket join for
    candidates instead of the quadratic shingle self-join).
    Oracle-checked: the sketch chain is engine-portable (see
    word_shingle_hashes), so the DuckDB oracle replicates the exact
    candidate set, not just the verified scores."""
    return dedup_clusters(spark, sf_dir, pair_source="lsh")


def dedup_survivors_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_survivors on the MinHash+LSH pair source — the keep-list a
    100 TB corpus build actually materializes. Oracle-checked (see
    dedup_clusters_lsh)."""
    return dedup_survivors(spark, sf_dir, pair_source="lsh")


def dedup_survivors(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    pair_source: str = "exact",
) -> DataFrame:
    """The end of the dedup pipeline: per near-dup cluster, keep the
    LONGEST document (ties → lowest doc_id). Returns one row per
    cluster: (cluster_id, survivor_doc_id, n_members) — the keep-list a
    corpus build joins against. Composes dedup_clusters (same
    pair_source choice: "exact" oracle twin / "lsh" scale path) with a
    per-cluster window top-1; the join onto documents only carries
    doc_id + n_chars (pruned scan)."""
    clusters = dedup_clusters(spark, sf_dir, threshold, pair_source=pair_source)
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


def dedup_survivors_capped(
    spark: SparkSession,
    sf_dir: str,
    cap: int = 10,
    pair_source: str = "lsh",
) -> DataFrame:
    """Per-SOURCE survivor caps — the domain-cap stage web pipelines
    (C4/RefinedWeb-style) run AFTER near-dup removal: a boilerplate
    farm that survives dedup with 10^6 distinct-enough pages must not
    dominate the mixture, so each source keeps at most `cap` docs.

    Keep-list = documents ∖ near-dup losers (cluster members minus
    their cluster's survivor — corpus_keep_list's loser shape), then
    per source keep the `cap` best by n_chars DESC with a
    deterministic multiplicative-hash tie-break (equal-length docs are
    capped reproducibly across runs/engines — never input-order).

    Scale shape: the loser set is two doc_id-keyed anti joins over the
    bounded LSH chain; the cap is a row_number over (source) that
    Spark executes as WindowGroupLimit (per-partition cap-sized heaps
    BEFORE the exchange, same as sample_reservoir) — the shuffle
    carries ≤ cap·partitions rows per source, never the source.
    Output one row per KEPT doc: (doc_id, source, rk,
    n_source_survivors) with n_source_survivors the source's PRE-cap
    survivor count (how hard the cap bit)."""
    from mimir_spark.operators.pipeline import _HASH_MOD, _HASH_MULT

    clustered = dedup_clusters(spark, sf_dir, pair_source=pair_source).select(
        "doc_id"
    )
    survivors = dedup_survivors(spark, sf_dir, pair_source=pair_source).select(
        F.col("survivor_doc_id").alias("doc_id")
    )
    losers = clustered.join(survivors, "doc_id", "left_anti")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    kept = docs.join(losers, "doc_id", "left_anti")
    u = (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), u.alias("u"), "doc_id"
    )
    return (
        kept.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn(
            "n_source_survivors",
            F.count("*").over(Window.partitionBy("source")).cast("long"),
        )
        .filter(F.col("rk") <= cap)
        .select("doc_id", "source", "rk", "n_source_survivors")
    )


# ---- SimHash -----------------------------------------------------------


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): 64-bit SimHash fingerprint per doc — per bit
    position i, the sign of Σ_x ±1 over the doc's distinct hashed
    shingles x, where bit_i(x) = ((a_i·x + b_i) mod p) & 1
    (SIMHASH_COEFFS — plain integer arithmetic the DuckDB oracle
    replicates literally). A doc's fingerprint depends only on its own
    shingles, so batch and streaming computations agree bit for bit
    (the property the incremental job relies on).

    Scale shape: SHUFFLE-FREE — the (|set| × 64) bit matrix and its
    column sums are row-local NumPy in the same Arrow pass that
    builds the shingle set (the previous form exploded the shingle
    table and finished with a 64-column per-doc aggregate: a
    corpus-token-sized exchange for a per-row-computable value)."""
    import numpy as np
    import pandas as pd

    from mimir_spark.functions.pykernels import doc_shingle_set

    A = np.array([a for a, _ in SIMHASH_COEFFS], dtype=np.int64)
    B = np.array([b for _, b in SIMHASH_COEFFS], dtype=np.int64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(
        np.uint64
    )

    def _fp(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                xs = doc_shingle_set(text, SHINGLE_WORDS)
                if xs is None:
                    continue
                bits = ((xs[:, None] * A[None, :] + B[None, :]) % MERSENNE) & 1
                # +1 per set bit, -1 per clear bit; bit i of fp set
                # iff the sum is positive
                pos = (2 * bits - 1).sum(axis=0) > 0
                fp_u = int(weights[pos].sum(dtype=np.uint64))
                # bit 63 set → the JVM long is negative (two's compl.)
                fp = fp_u - (1 << 64) if fp_u >= (1 << 63) else fp_u
                out.append((int(doc_id), fp))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "fp"])

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        _fp, "doc_id long, fp long"
    )


def simhash_chunks(fp: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Explode a (doc_id, fp) table into 4 pigeonhole bucket rows
    (doc_id, fp, chunk, key): hamming ≤ 3 over 64 bits ⇒ at least one
    of the four 16-bit chunks is identical, so candidate generation is
    an equi-join on (chunk, key) — bounded buckets, never all-pairs.
    `carry` names extra columns to keep on the bucket rows (e.g. the
    pixel digest in multimodal_dedup_images_near) so pair consumers
    avoid a second join back to the fingerprint table."""
    return fp.select(
        "doc_id",
        "fp",
        *carry,
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
    ).select("doc_id", "fp", *carry, "cc.chunk", "cc.key")


def dedup_simhash(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """64-bit SimHash over word shingles; near-dup pairs = hamming ≤ k.

    Fingerprints and pigeonhole chunk blocking via
    `simhash_fingerprints` / `simhash_chunks` (shared with the
    incremental streaming job); the candidate join is a bounded
    bucket-join, never all-pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = simhash_chunks(simhash_fingerprints(docs))
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
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


N_EMB_CELLS = 16


def assign_nearest_cell(
    emb: DataFrame, cents: DataFrame, with_theta: bool = False
) -> DataFrame:
    """Nearest-centroid assignment as ONE NumPy matmul per Arrow batch
    (mapInPandas): the corpus is scanned once, map-only, zero fan-out.

    Contrast the broadcast-join formulation (emb ⋈ cells → per-pair
    expression cosine → max-struct agg): that fans every row out
    ×|cells| and shuffles the fan-out into the re-grouping aggregate —
    compute AND shuffle are corpus×cells, which dominates at the
    SemDeDup paper's 50k cells. Here the centroid matrix is bounded
    metadata collected once (N_EMB_CELLS rows — the k-means-centroid
    class of collect) and each Arrow batch computes all batch×cells
    cosines as one float64 GEMM.

    Tie-break matches the max(struct(sim, -cell)) aggregate it
    replaces: best cosine, then LOWEST cell id — columns are ordered
    by ascending cell id, and argmax returns the first maximum.
    Output: (vec_id, embedding, cell[, theta]) where theta =
    arccos(clamped best cosine), the pruning angle dedup_embedding's
    radii need."""
    import numpy as np
    import pandas as pd

    crows = sorted(
        (int(r["cell"]), [float(x) for x in r["cent"]]) for r in cents.collect()
    )
    cells = np.array([c for c, _ in crows], dtype=np.int64)
    C = np.array([v for _, v in crows], dtype=np.float64)
    Cn = np.linalg.norm(C, axis=1)

    schema = "vec_id long, embedding array<float>, cell long"
    if with_theta:
        schema += ", theta double"

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            S = (E @ C.T) / (
                np.linalg.norm(E, axis=1, keepdims=True) * Cn[None, :]
            )
            best = S.argmax(axis=1)
            out = {
                "vec_id": pdf["vec_id"].to_numpy(np.int64),
                "embedding": pdf["embedding"],
                "cell": cells[best],
            }
            if with_theta:
                sims = S[np.arange(len(S)), best]
                out["theta"] = np.arccos(np.clip(sims, -1.0, 1.0))
            yield pd.DataFrame(out)

    return _spread(emb.select("vec_id", "embedding")).mapInPandas(
        _assign, schema
    )


def dedup_embedding(
    spark: SparkSession, sf_dir: str, threshold: float = 0.45
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold — EXACT output
    through a cell-blocked plan (no cartesian, no inequality-only
    join).

    Angular distance θ = arccos(cos) is a metric on the unit sphere,
    so Voronoi blocking with triangle-inequality pruning gives exact
    recall with bounded equi-joins:
    1. assign every vector to its nearest of N_EMB_CELLS seed
       centroids (one NumPy GEMM per Arrow batch, map-only — see
       assign_nearest_cell);
    2. per cell, the angular radius r_c = max member angle to the
       centroid (16-row aggregate, collected — bounded metadata, like
       k-means centroids);
    3. a cell pair (i, j) can contain a qualifying pair only if
       θ(c_i, c_j) ≤ θ_t + r_i + r_j (triangle inequality, both ways
       around) — the allowed-pair list is computed driver-side from
       the 16 collected centroids/radii and broadcast back;
    4. verification = blocked all-pairs: vectors replicate to their
       allowed cell-pair buckets and one NumPy block matmul per bucket
       emits qualifying pairs (see the comment below).

    Every pair with θ(a,b) ≤ θ_t satisfies
    θ(c_i,c_j) ≤ θ(c_i,a) + θ(a,b) + θ(b,c_j) ≤ r_i + θ_t + r_j,
    so recall is 100% and the output matches the all-pairs oracle
    row-for-row. On this synthetic corpus the clusters are weak, so
    pruning is mild — but the JOINS are equi-joins on cell keys either
    way (AQE splits skewed cells), which is the shape that survives
    100 TB; with naturally clustered embeddings and more cells the
    pruning does the heavy lifting. Contrast round 1's
    `a.join(b, id_a < id_b)`: an inequality-only condition is a
    BroadcastNestedLoop/cartesian — O(n²) rows through one join.
    """
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    # Deterministic seed centroids (orderBy pins limit's choice).
    cents = (
        emb.filter(F.col("vec_id") % 31 == 0)
        .orderBy("vec_id")
        .limit(N_EMB_CELLS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cent"))
    )
    if not cents.take(1):
        # The stride filter can yield zero rows on a tiny table (or one
        # with no vec_id ≡ 0 mod 31); without seeds every vector would
        # get no cell and the op would silently return nothing. Fall
        # back to the first N ids — one bounded extra job, small-input
        # path only.
        cents = (
            emb.orderBy("vec_id")
            .limit(N_EMB_CELLS)
            .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cent"))
        )
    # Nearest centroid per vector: one NumPy GEMM per Arrow batch
    # (see assign_nearest_cell) — map-only, no ×cells fan-out.
    assigned = assign_nearest_cell(emb, cents, with_theta=True).localCheckpoint(
        eager=True  # reused by radii + both join sides
    )
    # Bounded-metadata collects (16 rows each), the k-means precedent:
    # the centroid vectors and per-cell radii that define the pruning.
    cent_rows = {r["cell"]: r["cent"] for r in cents.collect()}
    radii = {
        r["cell"]: r["r"]
        for r in assigned.groupBy("cell").agg(F.max("theta").alias("r")).collect()
    }

    def _angle(u, v):
        d = sum(float(x) * float(y) for x, y in zip(u, v))
        nu = math.sqrt(sum(float(x) * float(x) for x in u))
        nv = math.sqrt(sum(float(x) * float(x) for x in v))
        return math.acos(max(-1.0, min(1.0, d / (nu * nv))))

    # Rounding margin: qualification uses cos ROUNDED to 6dp
    # (round(cos, 6) >= threshold), so a pair with true cos in
    # [threshold - 5e-7, threshold) still qualifies. Widen the pruning
    # angle to cover that half-ulp band, or a bucket holding such a
    # pair could be pruned while the oracle keeps the pair.
    theta_t = math.acos(max(-1.0, min(1.0, threshold - 5e-7)))
    # unordered allowed cell pairs (i ≤ j); (i, i) is always allowed
    allowed = [
        (int(i), int(j))
        for i in radii
        for j in radii
        if i <= j
        and _angle(cent_rows[i], cent_rows[j]) <= theta_t + radii[i] + radii[j]
    ]

    # Blocked all-pairs verification (GEMM tiling on a shuffle): each
    # vector is REPLICATED to every allowed cell-pair bucket its cell
    # belongs to (≤ n_cells copies — shuffle volume O(n · partner
    # cells), never O(candidate pairs)), then one applyInPandas per
    # bucket computes the block's cosine matrix as a single NumPy
    # matmul of pre-normalized rows and emits only qualifying pairs.
    # Contrast the row-per-candidate-pair join (2×64 doubles per pair
    # through join + Arrow — ~100× more bytes moved) and the per-pair
    # aggregate-fold (interpreted HOFs, ~12× slower compute). At scale
    # you raise N_EMB_CELLS so a bucket's two cells fit an executor —
    # standard GEMM tiling — and clustered data makes the
    # triangle-inequality pruning drop most buckets entirely.
    import numpy as np
    import pandas as pd

    bucket_rows = [
        (int(c), f"{i}_{j}") for (i, j) in allowed for c in {i, j}
    ]
    buckets_df = spark.createDataFrame(bucket_rows, "cell long, bucket string")

    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(dot(e, e))
    normalized = assigned.select(
        "vec_id",
        "cell",
        F.transform(e, lambda x: x / norm).alias("en"),
    )
    rep = normalized.join(F.broadcast(buckets_df), "cell")

    def _block_pairs(key, pdf):
        i, j = (int(x) for x in key[0].split("_"))
        ids = pdf["vec_id"].to_numpy(np.int64)
        cells = pdf["cell"].to_numpy(np.int64)
        E = np.array(list(pdf["en"]), dtype=np.float64)
        if i == j:
            S = np.round(E @ E.T, 6)
            ia, ib = np.triu_indices(len(ids), k=1)
        else:
            ma, mb = cells == i, cells == j
            A, B = E[ma], E[mb]
            if len(A) == 0 or len(B) == 0:
                return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                    {"id_a": np.int64, "id_b": np.int64, "cos": np.float64}
                )
            S = np.round(A @ B.T, 6)
            ia, ib = np.indices(S.shape).reshape(2, -1)
            ids_a, ids_b = ids[ma], ids[mb]
        if i == j:
            ids_a = ids_b = ids
        lo = np.minimum(ids_a[ia], ids_b[ib])
        hi = np.maximum(ids_a[ia], ids_b[ib])
        cos = S[ia, ib]
        keep = (cos >= threshold) & (lo < hi)
        return pd.DataFrame(
            {"id_a": lo[keep], "id_b": hi[keep], "cos": cos[keep]}
        )

    return (
        rep.groupBy("bucket")
        .applyInPandas(_block_pairs, "id_a long, id_b long, cos double")
        .select("id_a", "id_b", "cos")
    )


def minhash_containment(
    spark: SparkSession, sf_dir: str, threshold: float = 0.7
) -> DataFrame:
    """Approximate shingle CONTAINMENT from MinHash signatures alone —
    the sketch twin of `dedup_containment` for corpora too large to
    re-read shingle sets at verify time. From the signature-estimated
    Jaccard Ĵ (share of agreeing MinHash positions) and the exact
    per-doc shingle counts (a cheap scalar carried with the signature),
    the intersection re-derives as Î = Ĵ·(|A|+|B|)/(1+Ĵ) and
    containment as Î / min(|A|,|B|).

    Estimation error is O(1/√128) ≈ 0.09 per pair, so the default
    threshold sits below the exact op's 0.8 to keep recall. Candidates
    come from the same Jaccard-tuned LSH banding as dedup_minhash_lsh;
    a containment-high pair whose Jaccard is tiny (a paragraph inside
    a book) needs asymmetric banding (band only the smaller side's
    signature prefix) — at this corpus's doc-length spread the
    symmetric bands recover the exact op's pairs (pytest-pinned).

    Scale shape: everything is signature-sized — candidate bucket
    join, then one join per side onto (sig, n_sh); the 128-long
    agreement count is a JVM zip_with/filter over candidate rows only.
    Oracle-checked: permutations are the pinned-seed portable family
    (MINHASH_COEFFS), replicated literally in the DuckDB oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    # one doc-table pass: signatures + set sizes (no second tokenize)
    tbl = _minhash_doc_table(docs).localCheckpoint(eager=True)
    sig = tbl.select("doc_id", "sig")
    side = tbl.select("doc_id", "sig", F.size("sh_set").alias("n_sh"))
    cand = lsh_candidates(sig)
    sa = side.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig").alias("sig_a"),
        F.col("n_sh").alias("na"),
    )
    sb = side.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig").alias("sig_b"),
        F.col("n_sh").alias("nb"),
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    est_j = agree / F.lit(float(N_HASHES))
    est_inter = est_j * (F.col("na") + F.col("nb")) / (F.lit(1.0) + est_j)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment_est",
            F.round(
                F.least(est_inter / F.least("na", "nb"), F.lit(1.0)), 6
            ),
        )
        .filter(F.col("containment_est") >= threshold)
        .select("doc_a", "doc_b", "containment_est")
    )


def dup_span_fraction(
    spark: SparkSession, sf_dir: str, n_words: int = SHINGLE_WORDS
) -> DataFrame:
    """Per-doc duplicated-span coverage: the fraction of a document's
    shingle POSITIONS whose n-gram also occurs in at least one other
    document — the fixed-n approximation of suffix-array substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): pair-level dedup tells you WHICH docs
    overlap, this tells you HOW MUCH of each doc is boilerplate, the
    number a span-removal pass thresholds on.

    Shape: positional shingles (no distinct — multiplicity is the
    point), per-shingle distinct-doc counts (one shuffle, partial-agg
    map-side), join back on the shingle (equi, fan-out exactly 1 per
    position), per-doc ratio (one doc_id shuffle). No self-join — cost
    is linear in corpus token count whatever the duplication rate,
    unlike the pair table which is quadratic in a cluster's size."""
    docs = load_table(spark, sf_dir, "documents")
    # hashed shuffle key, same trade as dedup_span_removal: the
    # n-gram string never leaves the row that built it.
    pos = _spread(docs).select(
        "doc_id",
        F.explode(
            F.transform(
                word_shingles_all("text", n_words), lambda s: F.xxhash64(s)
            )
        ).alias("sh"),
    )
    # only `n_docs >= 2` is ever consumed, and ≥2 distinct docs ⟺
    # min(doc_id) < max(doc_id): plain min/max partial-aggregate in one
    # exchange where countDistinct planned an extra distinct pass over
    # the corpus-token-sized shingle stream (guide §2.3).
    docs_per_sh = pos.groupBy("sh").agg(
        F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max")
    )
    return (
        pos.join(docs_per_sh, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("d_min") < F.col("d_max"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_shingles") / F.col("n_shingles"), 6),
        )
    )


SPAN_WORDS = 5  # span length for removal (longer than the 3-gram
# coverage metric: removal should only fire on substantial repeats)
POS_BASE = 1_000_000  # doc-relative position packing (assumes docs
# under 1M tokens — true by orders of magnitude for web documents)


def dedup_span_removal(
    spark: SparkSession, sf_dir: str, n_words: int = SPAN_WORDS
) -> DataFrame:
    """Span-level dedup with REMOVAL — the output side of Lee et al.
    2022's exact-substring dedup, at fixed span length: every
    occurrence of an n-token span that also appears in another
    document is cut from the text, except the globally-first
    occurrence (min (doc_id, position)), which survives as the
    canonical copy. Returns per-doc (n_tokens, n_removed,
    cleaned_text).

    Shape (all linear in corpus tokens, no self-join; round-14 form —
    guide §2.3/§2.4): positional-shingle explode → per-shingle stats
    (min/max doc_id + first occurrence as one packed BIGINT min — a
    portable argmin; `min < max` replaces countDistinct(doc_id) ≥ 2
    exactly, saving the distinct-aggregate's extra (h, doc_id)
    exchange) → join back (fan-out exactly 1) → per-doc removable-
    START list (one doc_id-keyed exchange of start positions only) →
    ROW-LOCAL rebuild against the tokenized doc (covered set, kept
    positions and the space-joined cleaned text are all per-row array
    arithmetic). The previous tail shuffled the corpus-token-sized
    (doc_id, pos, word) table three more times (covered distinct,
    anti-join, collect_list reassembly) and tokenized the corpus
    twice; now tokens never leave their row and the only corpus-sized
    shuffles are one shingle-keyed and one doc_id-keyed exchange."""
    docs = load_table(spark, sf_dir, "documents")
    # the shingle string exists only inside the row it was built in:
    # the shuffle key is its 64-bit hash (8 bytes moved and compared
    # instead of a ~40-byte string; a cross-shingle collision would
    # need ~2^32 distinct shingles to be likely — at that corpus size
    # you are running the suffix-array variant anyway).
    sh = _spread(docs).select(
        "doc_id",
        F.posexplode(word_shingles_all("text", n_words)).alias("pos0", "sh"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), F.xxhash64("sh").alias("h")
    )
    stats = sh.groupBy("h").agg(
        F.min("doc_id").alias("d_min"),
        F.max("doc_id").alias("d_max"),
        F.min(F.col("doc_id") * POS_BASE + F.col("pos")).alias("first_key"),
    )
    removable = (
        sh.join(stats, "h")
        .filter(
            (F.col("d_min") < F.col("d_max"))
            & (F.col("doc_id") * POS_BASE + F.col("pos") != F.col("first_key"))
        )
        .select("doc_id", "pos")
    )
    # per-doc covered-position set, expanded ROW-LOCALLY from the
    # start positions (×n_words constant, array arithmetic instead of
    # an exploded + distinct-shuffled position table)
    cov = (
        removable.groupBy("doc_id")
        .agg(F.collect_set("pos").alias("starts"))
        .select(
            "doc_id",
            F.array_distinct(
                F.flatten(
                    F.transform(
                        "starts",
                        lambda p: F.sequence(p, p + F.lit(n_words - 1)),
                    )
                )
            ).alias("cov"),
        )
    )
    # zero-token docs emit no row — the explode-based tail had no
    # (doc_id, pos, word) rows for them either
    toks = (
        _spread(docs)
        .select("doc_id", tokens_col("text").alias("t"))
        .filter(F.size("t") >= 1)
    )
    n = F.size("t")
    # every shingle start satisfies pos + n_words − 1 ≤ n_tokens, so
    # cov ⊆ [1..n] and kept = positions ∖ cov reproduces the anti-join
    covc = F.coalesce("cov", F.array().cast("array<int>"))
    kept_pos = F.array_except(F.sequence(F.lit(1), n), covc)
    return toks.join(cov, "doc_id", "left").select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (n - F.size(kept_pos)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(kept_pos, lambda p: F.element_at("t", p)), " "
        ).alias("cleaned_text"),
    )


def minhash_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation quality report for the MinHash-LSH dedup
    path: precision/recall of the LSH-verified pair set against the
    exact shingle-Jaccard pair set — the index-tuning signal (bands ×
    rows trade-off) a dedup pipeline reads before trusting the scale
    path, twin of `ann_ivf_recall` on the similarity side.

    Both pair sets are candidate-sized, so the comparison join is
    trivial next to pair generation; the exact side exists only at
    tuning scale (it is the self-join path). LSH-verified pairs carry
    exact Jaccard, so precision counts pairs the banding surfaced AND
    verification kept; missed pairs are banding misses (all 128
    minima agreeing bands-wise is probabilistic)."""
    exact = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    lsh = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_hit = exact.join(lsh, ["doc_a", "doc_b"], "left_semi").count()
    return spark.createDataFrame(
        [
            (
                n_exact,
                n_lsh,
                n_hit,
                round(n_hit / n_lsh, 6) if n_lsh else 1.0,
                round(n_hit / n_exact, 6) if n_exact else 1.0,
            )
        ],
        "n_exact_pairs long, n_lsh_pairs long, n_hit long, "
        "precision double, recall double",
    )


def dup_span_islands(
    spark: SparkSession, sf_dir: str, n_words: int = SPAN_WORDS,
    min_len: int = SPAN_WORDS
) -> DataFrame:
    """MAXIMAL duplicated spans per document, variable length: the
    token ranges covered by cross-doc duplicated n-gram starts are
    merged into islands (consecutive covered positions), recovering
    variable-length duplicated regions from the fixed-n primitive —
    the reporting side of Lee et al. substring dedup (span_removal
    cuts them; this tells you where they are and how long).

    Island detection is the classic gaps-and-islands window:
    pos − row_number() is constant within a consecutive run, so one
    per-doc window plus one groupBy finds every maximal run — both
    keyed on doc_id, no self-join, linear in covered positions."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _spread(docs).select(
        "doc_id",
        F.posexplode(word_shingles_all("text", n_words)).alias("pos0", "sh"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), F.xxhash64("sh").alias("h")
    )
    stats = sh.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    covered = (
        sh.join(stats, "h")
        .filter(F.col("n_docs") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n_words - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        covered.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.count("*").cast("long").alias("span_len"),
        )
        .filter(F.col("span_len") >= min_len)
        .select("doc_id", "span_start", "span_len")
    )


def dedup_clusters_star(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    pair_source: str = "exact",
) -> DataFrame:
    """`dedup_clusters` computed by ALTERNATING STAR CONTRACTION
    (graph.connected_components_star) instead of min-label
    propagation: identical output (same oracle), but convergence is
    O(log n) ROUNDS regardless of component shape — the variant you
    run when clusters might be chain-shaped (e.g. near-dup chains
    A≈B≈C≈… where consecutive docs are similar but the ends are not),
    which make label propagation pay diameter-many shuffles."""
    from mimir_spark.operators.graph import connected_components_star

    pairs = near_dup_pairs(spark, sf_dir, threshold, pair_source).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components_star(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def minhash_bbit_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """b-bit minwise hashing (Li & König, WWW 2010), b = 1: keep only
    the LOWEST BIT of each of the 128 permutation minima — the
    signature shrinks from 1 KB to 16 BYTES per document, the
    storage-optimal near-dup sketch at 10^10 docs (a 100 TB corpus's
    b=1 sketch table is ~160 GB — broadcastable history for streaming
    dedup). The price is variance, not bias: with C ≈ ½ the chance
    two independent minima share a low bit, E[agreement] = J +
    (1−J)/2, so Ĵ_b = 2·A − 1 is (approximately) unbiased with
    sd ≈ 2·√(¼/128) ≈ 0.088 vs the full signature's √(J(1−J)/128).

    Output: every verified LSH pair with its exact Jaccard, the
    128-value signature estimate, the 1-bit estimate, and a flag
    pinning |Ĵ_b − J| ≤ 4σ — the calibration artifact for choosing b.
    All three estimates are ratios of exact integer counts: fully
    engine-portable, no float-sum hazard.

    Scale shape: identical to dedup_minhash_lsh (one Arrow kernel
    pass, bounded bucket join) plus two candidate-sized signature
    joins; the 128-position agreement counts are JVM zip_with folds
    over candidate rows only."""
    docs = load_table(spark, sf_dir, "documents")
    tbl = _minhash_doc_table(docs).localCheckpoint(eager=True)
    cand = lsh_candidates(tbl.select("doc_id", "sig"))

    sets = tbl.select("doc_id", "sh_set", "sig")
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_set").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_set").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    j_exact = F.round(
        n_common / (F.size("sh_a") + F.size("sh_b") - n_common), 6
    )
    n_match = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    n_bit = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x % 2 == y % 2),
            lambda v: v,
        )
    )
    j_bbit_raw = F.lit(2.0) * (n_bit / F.lit(float(N_HASHES))) - F.lit(1.0)
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            j_exact.alias("j_exact"),
            F.round(n_match / F.lit(float(N_HASHES)), 6).alias("j_sig"),
            F.round(j_bbit_raw, 6).alias("j_bbit"),
            (F.abs(j_bbit_raw - j_exact) <= F.lit(0.353553))
            .cast("long")
            .alias("within_4sd"),
        )
    )
    return out.filter(F.col("j_exact") >= threshold)
