"""Similarity search over an embedding column.

Four query tiers, same output shape (query_id, neighbor_id, rank):
- brute-force exact top-k   — the correctness baseline (oracle-checked);
  at scale it's still the right plan when the query set is small
  (queries broadcast, one pass over the corpus, per-partition top-k
  via window).
- random-hyperplane LSH     — bucketed candidates, sub-linear scans.
- IVF                        — trained Lloyd centroids, probe n cells.
- graph beam search          — coarse entry layer + fixed-round walk
  over the NN-Descent proximity graph (round 12), with a persisted
  bucketed-adjacency index variant.
Plus the graph BUILDERS: exact kNN graph (tiled GEMM) and NN-Descent
(neighbors-of-neighbors rounds), each with a recall report vs the
brute-force truth.

All ranking uses round(cosine, 6) with an id tie-break so results are
deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.spread import spread_small_scan
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
    excluded), vectorized: the (tiny, bounded) query matrix is
    collected once and shipped into an Arrow-batched mapInPandas
    kernel; each batch computes a (batch × n_queries) NumPy matmul of
    L2-normalized rows and keeps only its LOCAL top-k per query — a
    map-side top-k combine — so the shuffle into the final ranking
    window carries batches×queries×k rows instead of the whole
    corpus×queries score table. One corpus scan, zero joins; at any
    scale the reduce side is k·queries-bounded. ~4× faster than the
    per-row aggregate-fold form (higher-order-function lambdas run
    interpreted, outside codegen).

    Batch-local pruning is lossless: the final order (cos desc,
    neighbor_id) is the same order used locally, and every global
    top-k row is necessarily in its own batch's top-k."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )  # bounded metadata: N_QUERIES rows
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cos double"

    def _batch_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            E = np.array(list(pdf["embedding"]), dtype=np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            S = np.round(En @ Qn.T, 6)  # (batch, n_queries)
            parts = []
            for j, qid in enumerate(q_ids):
                s = S[:, j]
                mask = ids != qid  # exclude self
                cand_idx = np.flatnonzero(mask)
                if cand_idx.size == 0:
                    continue
                # order by (-cos, neighbor_id): lexsort keys are last-major
                order = np.lexsort((ids[cand_idx], -s[cand_idx]))[: max(1, k)]
                keep = cand_idx[order]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[keep],
                            "cos": s[keep],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        _batch_topk, out_schema
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
IVF_KMEANS_ITERS = 5

# Centroid training is a 5-round Spark job; memoize per (sf_dir, k,
# iters) so repeated queries against one session reuse the index's
# centroids (deterministic — lloyd_centroids rounds per round, so a
# cache hit and a recompute are bit-identical).
_IVF_CENTROID_CACHE: dict[tuple, list] = {}


def _ivf_centroid_list(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Trained IVF centroids as driver-side bounded metadata (k·dim
    floats) — the memoized Lloyd result both the DataFrame wrapper and
    the literal-expression assignment below share."""
    from mimir_spark.operators.clustering import lloyd_centroids

    key = (sf_dir, N_CELLS, IVF_KMEANS_ITERS)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE[key] = lloyd_centroids(
            spark, sf_dir, k=N_CELLS, n_iters=IVF_KMEANS_ITERS
        )
    return _IVF_CENTROID_CACHE[key]


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF centroids as a (cell_id, cent) DataFrame: Lloyd
    k-means on normalized embeddings (clustering.lloyd_centroids)
    instead of the round-4 'k-means-lite' raw seeds — tighter Voronoi
    cells put true neighbours in fewer cells, which is measurably
    higher recall@k at the same probe count (ann_ivf_recall: mean
    0.70 → with trained centroids, see test floor). k·dim driver-side
    floats — bounded metadata, the k-means-centroid class."""
    return spark.createDataFrame(
        [
            (i, c)
            for i, c in enumerate(_ivf_centroid_list(spark, sf_dir))
        ],
        "cell_id long, cent array<double>",
    )


def _nearest_cells_np(E, C, nc):
    """Per-row argmax cell over cosine sims, vectorized — BIT-IDENTICAL
    to the former join+window plan's doubles: products are elementwise
    IEEE multiplies and every Σ is np.cumsum's strictly-sequential
    left fold, the same ((0+v₁)+v₂)+… association as the engine-side
    `aggregate` HOF (verified bitwise on the real corpus); argmax
    takes the FIRST maximum, which is the (sim desc, cell_id)
    row_number()==1 tie rule. One centroid at a time keeps the temp
    at batch×dim doubles."""
    import numpy as np

    ne = np.sqrt(np.cumsum(E * E, axis=1)[:, -1])
    sims = np.empty((E.shape[0], C.shape[0]), dtype=np.float64)
    for j in range(C.shape[0]):
        dots = np.cumsum(E * C[j][None, :], axis=1)[:, -1]
        sims[:, j] = dots / (ne * nc[j])
    return sims.argmax(axis=1)


def _assign_cells(df: DataFrame, cent_list: list[list[float]]) -> DataFrame:
    """(neighbor_id, ce, cell_id): every corpus vector labeled with its
    nearest trained centroid (cos argmax, ties → lowest cell) — ONE
    Arrow kernel pass (guide §2.4/§4.2). The former plan fanned the
    corpus ×N_CELLS through a broadcast join, evaluated three
    interpreted 64-term HOF folds per (vector, cell) row, and ranked
    the fan-out back down with a per-vector window — a corpus-sized
    exchange + sort that existed only to pick a per-row maximum."""
    import numpy as np
    import pandas as pd

    C = np.array(cent_list, dtype=np.float64)
    nc = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])

    def _k(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.array(list(pdf["ce"]), dtype=np.float64)
            cell = _nearest_cells_np(E, C, nc)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"],
                    "ce": pdf["ce"],
                    "cell_id": cell.astype(np.int64),
                }
            )

    return df.select("neighbor_id", "ce").mapInPandas(
        _k, "neighbor_id long, ce array<float>, cell_id long"
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """IVF: partition the corpus into N_CELLS Voronoi cells around
    TRAINED Lloyd centroids (see _ivf_centroids), then each query
    probes its N_PROBE nearest cells only. Centroids live in a
    broadcast table; at 100 TB
    the cell assignment is written once as a bucketed column and probes
    become partition pruning."""
    cents = _ivf_centroids(spark, sf_dir)
    cent_list = _ivf_centroid_list(spark, sf_dir)
    q, c = _queries_and_corpus(spark, sf_dir)
    # assign corpus vectors to nearest centroid — one Arrow kernel
    # (same sims, same tie rule as the former ×N_CELLS join +
    # per-vector window; see _assign_cells)
    c_scored = _assign_cells(spread_small_scan(c), cent_list)
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


# ---- Range search + exact kNN graph ---------------------------------------

RANGE_THRESHOLD = 0.35
KNN_K = 3
N_KNN_BLOCKS = 8


def ann_range_search(
    spark: SparkSession, sf_dir: str, threshold: float = RANGE_THRESHOLD
) -> DataFrame:
    """All corpus vectors within cosine ≥ threshold of each query
    vector (self excluded) — the radius-query twin of the top-k
    search (retrieval candidate pools, near-duplicate audits around
    known-bad items).

    Same scale shape as `ann_bruteforce_topk`: the bounded query
    matrix ships into an Arrow-batched mapInPandas kernel, each batch
    is one (batch × n_queries) NumPy matmul of L2-normalized rows, and
    only rows clearing the threshold leave the batch — no join, one
    corpus scan, output-bounded shuffle. Cosine is rounded to 6dp
    before the comparison so the cut is engine-portable."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )  # bounded metadata: N_QUERIES rows
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def _batch_range(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            E = np.array(list(pdf["embedding"]), dtype=np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            S = np.round(En @ Qn.T, 6)  # (batch, n_queries)
            hit_i, hit_j = np.nonzero(
                (S >= threshold) & (ids[:, None] != q_ids[None, :])
            )
            if hit_i.size:
                yield pd.DataFrame(
                    {
                        "query_id": q_ids[hit_j],
                        "neighbor_id": ids[hit_i],
                        "cos": S[hit_i, hit_j],
                    }
                )

    return emb.select("vec_id", "embedding").mapInPandas(
        _batch_range, "query_id long, neighbor_id long, cos double"
    )


def knn_graph(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    n_blocks: int = N_KNN_BLOCKS,
) -> DataFrame:
    """EXACT k-nearest-neighbour graph over the whole embedding table
    (every vector → its k closest others by cosine) — the all-pairs
    generalization of the query-set search, and the input to graph
    dedup / clustering over embeddings.

    Exact kNN is inherently O(n²) FLOPs; the scale question is whether
    those FLOPs run as a materialized O(n²)-row join (dies at 10⁹
    vectors) or as tiled matrix multiplies with bounded shuffles. This
    is the GEMM-tiling form, the same shape as `dedup_embedding`'s
    verifier: vectors hash into `n_blocks` row blocks, every unordered
    block pair (i ≤ j) is one bucket, each vector replicates to its
    n_blocks buckets (shuffle volume O(n·√buckets), never O(n²)), and
    one applyInPandas per bucket computes the block cosine matrix as a
    single NumPy matmul of pre-normalized rows, emitting only each
    row's BUCKET-LOCAL top-k. The global window then ranks
    O(n·blocks·k) candidates — bucket-local pruning is lossless
    because every global top-k edge lives in exactly one bucket and
    survives that bucket's top-k under the same (cos desc, id) order.
    At 10⁹ rows you raise n_blocks so a block pair fits executor
    memory; with an ANN budget you swap this for the LSH/IVF
    candidate generators above and lose the exactness guarantee."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    bucket_rows = [(b, f"{i}_{j}") for (i, j) in pairs for b in {i, j}]
    buckets_df = spark.createDataFrame(bucket_rows, "blk long, bucket string")

    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(dot(e, e))
    normalized = emb.select(
        "vec_id",
        F.pmod(F.col("vec_id"), F.lit(n_blocks)).alias("blk"),
        F.transform(e, lambda x: x / norm).alias("en"),
    )
    rep = normalized.join(F.broadcast(buckets_df), "blk")

    def _local_topk(ids_src, ids_dst, S):
        """per-row top-k of a rounded score block, (cos desc, id) order."""
        parts = []
        for r in range(S.shape[0]):
            s = S[r]
            order = np.lexsort((ids_dst, -s))[:k]
            order = order[np.isfinite(s[order])]  # drop the -inf self slot
            parts.append(
                pd.DataFrame(
                    {
                        "vec_id": ids_src[r],
                        "neighbor_id": ids_dst[order],
                        "cos": s[order],
                    }
                )
            )
        return parts

    def _block_topk(key, pdf):
        i, j = (int(x) for x in key[0].split("_"))
        ids = pdf["vec_id"].to_numpy(np.int64)
        blks = pdf["blk"].to_numpy(np.int64)
        E = np.array(list(pdf["en"]), dtype=np.float64)
        parts = []
        if i == j:
            S = np.round(E @ E.T, 6)
            np.fill_diagonal(S, -np.inf)  # exclude self
            parts += _local_topk(ids, ids, S)
        else:
            ma, mb = blks == i, blks == j
            A, B = E[ma], E[mb]
            if len(A) and len(B):
                S = np.round(A @ B.T, 6)
                parts += _local_topk(ids[ma], ids[mb], S)
                parts += _local_topk(ids[mb], ids[ma], S.T)
        if not parts:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cos": []}
            ).astype({"vec_id": np.int64, "neighbor_id": np.int64, "cos": np.float64})
        return pd.concat(parts, ignore_index=True)

    cand = rep.groupBy("bucket").applyInPandas(
        _block_topk, "vec_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
    )


def ann_ivf_recall(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Index-quality report: per-query recall@k of the IVF probe
    against the exact brute-force ground truth — the number every ANN
    index tuning loop watches while trading probe count against cost.

    Both sides are k·queries-bounded outputs of existing operators, so
    the comparison join is trivially small whatever the corpus size;
    at 100 TB the expensive input (ground truth) is computed once on a
    sampled query set, exactly as here (N_QUERIES broadcast queries).
    Oracle-checked (the Lloyd 9dp-grid oracle makes the probe
    pipeline a pure function of the data); pytest additionally pins
    mean recall against a floor.
    """
    truth = ann_bruteforce_topk(spark, sf_dir, k).select(
        "query_id", "neighbor_id"
    )
    approx = ann_ivf_topk(spark, sf_dir, k).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    hits = truth.join(
        approx,
        (truth.query_id == approx.query_id)
        & (truth.neighbor_id == approx.ivf_neighbor),
        "left",
    ).select(
        truth.query_id,
        F.when(F.col("ivf_neighbor").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.sum("hit").cast("long").alias("n_hit"),
            F.round(F.sum("hit") / F.lit(float(k)), 6).alias("recall"),
        )
        .orderBy("query_id")
    )


def write_ivf_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Materialize the IVF index: centroids to `<dir>/centroids`,
    corpus vectors to `<dir>/assignments` PARTITIONED BY cell_id —
    the 'build once, query many' layout. On disk, each Voronoi cell
    is its own partition directory, so a query that probes N_PROBE
    cells reads exactly those directories (partition pruning: the
    scan's PartitionFilters, pinned in tests) instead of the corpus.
    At 100 TB this is the difference between an index and a scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    cent_list = _ivf_centroid_list(spark, sf_dir)
    # one-kernel nearest-centroid assignment — see _assign_cells
    assigned = _assign_cells(
        spread_small_scan(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ce"),
            )
        ),
        cent_list,
    )
    cents.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{index_dir}/assignments"
    )


def ann_ivf_query_indexed(
    spark: SparkSession, sf_dir: str, index_dir: str, k: int = TOP_K
) -> DataFrame:
    """Query the PERSISTED IVF index: rank cells per query against the
    (tiny, broadcast) centroid table, then scan only the probed
    cell_id partitions of the assignments table. Matches
    `ann_ivf_topk` row-for-row (pytest-pinned) — same centroids, same
    probe rule — but the corpus side is a pruned read of the index,
    not a recomputation."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    q, _ = _queries_and_corpus(spark, sf_dir)
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
    probed = [r.cell_id for r in q_cells.select("cell_id").distinct().collect()]
    assignments = spark.read.parquet(f"{index_dir}/assignments").filter(
        F.col("cell_id").isin(probed)
    )
    scored = (
        q_cells.join(assignments, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_sim("qe", "ce"), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(scored, k)


NND_K = 3  # output k — same as knn_graph, so recall is comparable
NND_INTERNAL_K = 10  # search width: the graph carried between rounds
NND_ROUNDS = 6


def knn_graph_descent(
    spark: SparkSession,
    sf_dir: str,
    k: int = NND_K,
    n_rounds: int = NND_ROUNDS,
    internal_k: int = NND_INTERNAL_K,
) -> DataFrame:
    """APPROXIMATE kNN graph by NN-DESCENT (Dong, Moses & Li, WWW'11):
    start from a deterministic seed graph and repeatedly propose each
    node's NEIGHBORS-OF-NEIGHBORS as candidates, keeping the best k —
    "a neighbor of a neighbor is likely a neighbor".

    The scale story vs the exact GEMM-tiled knn_graph: exact all-pairs
    is O(n²) FLOPs however you tile it; one NN-descent round is a
    self-join of the CURRENT width-k' graph — O(n·(2k')²) candidate
    pairs, each scored once — so r rounds cost O(r·n·k'²) with every
    stage a bounded shuffle on vec_id (k' = internal_k: the paper's
    K≈10-20 search width; the output keeps only the top k of the
    final graph). At 10⁹ vectors that is the difference
    between 10¹⁸ and ~10¹¹ operations; the price is approximation,
    and HOW GOOD the approximation is depends on the data's intrinsic
    dimensionality (Dong et al. §5.3): on low-intrinsic-dimension
    data the neighbors-of-neighbors hypothesis holds and recall
    converges fast (pytest pins ≥ 0.95 at the default 6 rounds /
    width 10 on a smooth-manifold dataset; hard gradient-free planted
    clusters stay discovery-limited ~0.88), while on the UNIFORM synthetic
    embeddings table — measured: within-label cosine 0.002, true
    top-3 sharing a label at the 10% random-chance rate — NO graph
    method beats candidate-volume luck and recall stays near the
    seed's (also pinned, as documented expected behavior; the kept-k
    set still monotonically improves under the (cos desc, id) order).

    Determinism & portability: seed neighbors are (vec_id + i) mod n,
    which ASSUMES vec_ids are contiguous 0..n−1 (true for this corpus;
    pinned by a pytest). With sparse or non-zero-based ids some seed
    edges would reference absent nodes and be dropped by the inner
    join, leaving those nodes under-seeded (< internal_k) — still
    convergent, just a weaker round-0 graph; re-key through a rank
    over vec_id first if ids aren't dense. Scores are the _raw_cos
    expression (dot / (‖a‖·‖b‖), sequential folds) rounded 6dp; top-k
    ties break on neighbor_id — the unrolled DuckDB oracle replays
    identical rounds. Output matches knn_graph:
    (vec_id, neighbor_id, cos, rank).
    """
    pts, n = _descent_points(spark, sf_dir)
    g = _descent_graph(pts, n, internal_k, n_rounds)
    return _descent_scored_topk(pts, g.select("u", "v"), k).select(
        F.col("u").alias("vec_id"),
        F.col("v").alias("neighbor_id"),
        "cos",
        "rank",
    )


def _descent_points(spark: SparkSession, sf_dir: str):
    """(vec_id, e, nrm) working table + its count — shared by the
    descent build and the graph-ANN query path."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    pts = emb.select(
        "vec_id", e.alias("e"), F.sqrt(dot(e, e)).alias("nrm")
    ).localCheckpoint(eager=True)
    return pts, pts.count()


def _descent_scored_topk(pts: DataFrame, cand: DataFrame, kk: int) -> DataFrame:
    a = pts.select(
        F.col("vec_id").alias("u"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = pts.select(
        F.col("vec_id").alias("v"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    s = (
        cand.join(a, "u")
        .join(b, "v")
        .select(
            "u",
            "v",
            F.round(
                dot("ea", "eb") / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("u").orderBy(F.col("cos").desc(), "v")
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= kk)
    )


def _descent_rounds(
    pts: DataFrame, seed: DataFrame, internal_k: int, n_rounds: int
) -> DataFrame:
    """The NN-descent loop proper over an arbitrary point set and seed
    graph: n_rounds of neighbors-of-neighbors propose + re-rank —
    shared by the full-graph and coarse-layer builds so the round body
    (and its DuckDB oracle replica) has exactly one source of truth.
    Returns the directed width-internal_k graph (u, v)."""
    g = seed
    for _ in range(n_rounds):
        und = g.select("u", "v").union(
            g.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        nn = (
            und.select(F.col("u").alias("x"), F.col("v").alias("w"))
            .join(und.select("u", F.col("v").alias("x")), "x")
            .filter(F.col("u") != F.col("w"))
            .select("u", F.col("w").alias("v"))
        )
        cand = nn.union(g.select("u", "v")).distinct()
        g = (
            _descent_scored_topk(pts, cand, internal_k)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return g


def _descent_graph(
    pts: DataFrame, n: int, internal_k: int, n_rounds: int
) -> DataFrame:
    """Full-graph NN-descent: ring seed over the dense 0..n−1 ids,
    then the shared round loop."""
    seed = pts.select("vec_id").selectExpr(
        "vec_id AS u",
        f"explode(transform(sequence(1, {internal_k}),"
        f" i -> (vec_id + i) % {n})) AS v",
    )
    return _descent_rounds(pts, seed, internal_k, n_rounds)


# ---- graph-ANN query path (round 12; two-level entry + persisted-index
#      composition in round 13) ------------------------------------------------

GANN_BEAM = 8     # beam width
GANN_ROUNDS = 3   # synchronous expansion rounds on the FULL graph
GANN_SAMPLE = 16  # layer subsampling factor: layer ℓ keeps every
                  # GANN_SAMPLE^ℓ-th id
GANN_COARSE_KP = 6       # descent width of each coarse-layer graph
GANN_COARSE_GROUNDS = 4  # descent rounds of each coarse-layer graph
GANN_COARSE_ROUNDS = 3   # beam rounds PER coarse layer (2 leaves the
                         # manifold corpus 0.94 — one hop short of the
                         # best coarse cell; 3 reaches 1.0, pytest-pinned)
GANN_TOP_TARGET = 4      # max size of the exhaustively-scored top
                         # entry set — the auto-layer formula adds
                         # layers until n/sample^L ≤ this, so entry
                         # cost is CORPUS-INDEPENDENT (HNSW's log-layer
                         # argument: L ≈ log_sample(n/top_target))


def _gann_n_layers(
    n: int, sample: int, top_target: int = GANN_TOP_TARGET
) -> int:
    """Smallest L ≥ 1 with n/sample^L ≤ top_target — the HNSW layer
    count. At the gate corpus (n=500, sample=16) this is 2 (the
    round-13 two-level structure, which the unrolled oracle replays);
    at sf0.1 (n=2000) it is 3, so the bench exercises a deeper
    stack."""
    lyr = 1
    cap = sample
    while n / cap > top_target:
        lyr += 1
        cap *= sample
    return lyr


def _layer_descent_graph(
    pts: DataFrame,
    n: int,
    stride: int,
    kp: int = GANN_COARSE_KP,
    grounds: int = GANN_COARSE_GROUNDS,
) -> DataFrame:
    """NN-descent over ONE coarse layer (vec_id % stride == 0) — the
    layer-ℓ proximity graph of the L-layer entry (stride = sample^ℓ).
    Because vec_ids are dense 0..n−1 (the same documented assumption
    as the full descent's ring seed), cid = vec_id/stride is dense
    0..m−1, so the ring seed is ((cid + i) mod m)·stride with no
    re-keying pass. Directed width-kp edges in vec_id space."""
    m = (n - 1) // stride + 1
    cpts = pts.filter(F.col("vec_id") % stride == 0).localCheckpoint(
        eager=True
    )
    seed = cpts.selectExpr(
        "vec_id AS u",
        f"explode(transform(sequence(1, {kp}),"
        f" i -> ((vec_id div {stride} + i) % {m}) * {stride})) AS v",
    )
    return _descent_rounds(cpts, seed, kp, grounds)


def _undirect(g: DataFrame) -> DataFrame:
    return (
        g.select("u", "v")
        .union(g.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )


def _gann_search(
    pts: DataFrame,
    und: DataFrame,
    layer_adjs: list[DataFrame],
    tops: DataFrame,
    k: int,
    beam: int,
    rounds: int,
    coarse_rounds: int,
) -> DataFrame:
    """The L-layer beam search proper, over ALREADY-MATERIALIZED
    state (vectors+norms, full adjacency, the coarse-layer adjacencies
    TOP-DOWN in `layer_adjs` (ℓ = L−1 … 1), top-entry ids) — shared
    verbatim by ann_graph_topk (cached index) and
    ann_graph_query_indexed (explicit index dir), so the two paths
    cannot drift. Every per-round table is (queries × beam)-bounded."""
    q = pts.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )

    def scored(cand: DataFrame, kk: int) -> DataFrame:
        s = (
            cand.join(q, "query_id")
            .join(
                pts.select(
                    F.col("vec_id").alias("v"),
                    F.col("e").alias("ve"),
                    F.col("nrm").alias("vn"),
                ),
                "v",
            )
            .select(
                "query_id",
                "v",
                F.round(
                    dot("qe", "ve") / (F.col("qn") * F.col("vn")), 6
                ).alias("cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), "v"
        )
        return (
            s.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= kk)
        )

    def beam_rounds(b: DataFrame, adj: DataFrame, nr: int) -> DataFrame:
        # Per-round localCheckpoint is load-bearing: `b` feeds the
        # round twice (carry-over ∪ expansion), so a lazy chain would
        # recompute every earlier round 2× per level — exponential in
        # round count (measured 14.6s vs 6.2s warm at sf0.01).
        for _ in range(nr):
            exp = (
                b.withColumnRenamed("v", "u")
                .join(adj, "u")
                .select("query_id", "v")
            )
            cand = (
                b.union(exp)
                .filter(F.col("v") != F.col("query_id"))
                .distinct()
            )
            b = scored(cand, beam).select("query_id", "v").localCheckpoint(
                eager=True
            )
        return b

    b = (
        q.select("query_id")
        .crossJoin(tops.select("v"))
        .filter(F.col("v") != F.col("query_id"))
    )
    b = scored(b, beam).select("query_id", "v")
    for adj in layer_adjs:       # walk the coarse layers, top-down
        b = beam_rounds(b, adj, coarse_rounds)
    b = beam_rounds(b, und, rounds)  # then the full graph
    return scored(b, k).select(
        "query_id", F.col("v").alias("neighbor_id"), "cos", "rank"
    )


def _gann_cache_dir(
    sf_dir: str,
    internal_k: int,
    graph_rounds: int,
    sample: int,
) -> str:
    """Deterministic per-(user, data, build-params) cache location for
    the graph index. The key folds in the embeddings file's (mtime,
    size) so a regenerated dataset can never serve a stale graph. The
    cache root is scoped PER USER (uid suffix, created 0700): a shared
    tempdir root would let the first user's 755 parent dir break later
    users' builds with PermissionError, and would trust any
    pre-planted same-named dir."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(src)
        stamp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        stamp = "nostat"
    key = (
        # the v2/t component versions the L-layer index format: an old
        # two-level cache dir (edges_coarse layout) keys differently
        # and is never read by the new query path
        f"{src}|{stamp}|k{internal_k}g{graph_rounds}s{sample}"
        f"c{GANN_COARSE_KP}.{GANN_COARSE_GROUNDS}"
        f"t{GANN_TOP_TARGET}v2"
    )
    h = hashlib.md5(key.encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    root = os.path.join(tempfile.gettempdir(), f"mimir_spark_idx-{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    return os.path.join(root, f"nn_graph_{h}")


def _gann_cached_index(
    spark: SparkSession,
    sf_dir: str,
    internal_k: int,
    graph_rounds: int,
    sample: int,
) -> str:
    """Build-once/query-many: materialize the graph index into the
    cache dir on first use (atomic rename, so a concurrent builder
    can't expose a half-written index) and return the dir. Repeat
    calls — the recall report, the bench's best-of-2, every later
    query batch — skip the descent build entirely. Orphaned
    *.build-<uuid> dirs from crashed builders are swept opportunistically
    once they are clearly abandoned (>1h old)."""
    import os
    import shutil
    import time
    import uuid

    d = _gann_cache_dir(sf_dir, internal_k, graph_rounds, sample)
    root = os.path.dirname(d)
    try:
        for entry in os.listdir(root):
            if ".build-" not in entry:
                continue
            p = os.path.join(root, entry)
            if time.time() - os.path.getmtime(p) > 3600:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    marker = os.path.join(d, "_INDEX_COMPLETE")
    if not os.path.exists(marker):
        # uuid (not just pid) so concurrent builders — including two
        # threads of one process — never interleave writes in one tmp
        tmp = f"{d}.build-{uuid.uuid4().hex}"
        write_nn_graph_index(
            spark, sf_dir, tmp,
            internal_k=internal_k,
            graph_rounds=graph_rounds,
            sample=sample,
        )
        with open(os.path.join(tmp, "_INDEX_COMPLETE"), "w") as fh:
            fh.write("ok\n")
        try:
            os.rename(tmp, d)
        except OSError:
            if os.path.exists(marker):
                # a COMPLETE index won the race; equivalent by
                # determinism — discard ours
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # the destination is stale/partial (e.g. a tmp cleaner
                # aged out files but left the dir) — replace it with
                # the fresh build rather than serving the broken one
                shutil.rmtree(d, ignore_errors=True)
                os.rename(tmp, d)
    return d


def ann_graph_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    beam: int = GANN_BEAM,
    rounds: int = GANN_ROUNDS,
    internal_k: int = NND_INTERNAL_K,
    graph_rounds: int = NND_ROUNDS,
    sample: int = GANN_SAMPLE,
    coarse_rounds: int = GANN_COARSE_ROUNDS,
) -> DataFrame:
    """Graph-ANN QUERY path: synchronous beam search over the
    NN-Descent proximity graph — the search half of the HNSW/NSG
    family (Malkov & Yashunin '18; Fu et al. NSG VLDB'19), made
    deterministic and unrollable: FIXED beam width, FIXED round
    counts, (cos desc, id) tie-breaks.

    L-LAYER ENTRY (round 14 — HNSW's actual construction, closing the
    round-13 residual where the n/sample² top set was still
    corpus-LINEAR): layer ℓ (ℓ = 1..L−1) is the 1/sample^ℓ subsample
    (vec_id % sample^ℓ == 0) carrying its OWN NN-descent graph; L is
    chosen automatically so the top entry set (vec_id % sample^L ==
    0) has ≤ GANN_TOP_TARGET ids (_gann_n_layers — L ≈
    log_sample(n/top_target), HNSW's log-layer argument). The top set
    is scored exhaustively (BOUNDED, corpus-independent), then each
    coarse layer is walked top-down for `coarse_rounds` beam rounds,
    and the layer-1 winners seed `rounds` beam rounds on the full
    graph. Scored candidates per query = top_target +
    ((L−1)·coarse_rounds + rounds)·beam·(2·width+1) — NO term grows
    linearly with n; only the layer COUNT grows, logarithmically. At
    the gate corpus (n=500) L=2 (the round-13 structure the unrolled
    oracle replays); at sf0.1 (n=2000) L=3.

    BUILD ONCE, QUERY MANY (round 13): the descent graphs are read
    from the persisted index (write_nn_graph_index) via a
    per-(data, params) cache — repeat invocations run ZERO graph-build
    stages (pytest pins this by poisoning the builder after warm-up).

    Each beam round expands along UNDIRECTED edges, scores candidates
    against the query (6dp sequential-fold cosine), keeps the
    top-`beam` (cos desc, id); the query's own node is excluded
    throughout, matching ann_bruteforce_topk. ann_graph_recall reports
    recall vs this budget (pytest pins ≥ IVF recall at a SMALLER
    unique-scored budget on the smooth-manifold corpus)."""
    idx = _gann_cached_index(spark, sf_dir, internal_k, graph_rounds, sample)
    return ann_graph_query_indexed(
        spark, sf_dir, idx, k, beam, rounds, coarse_rounds
    )


def ann_graph_recall(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    beam: int = GANN_BEAM,
    rounds: int = GANN_ROUNDS,
    internal_k: int = NND_INTERNAL_K,
    graph_rounds: int = NND_ROUNDS,
    sample: int = GANN_SAMPLE,
    coarse_rounds: int = GANN_COARSE_ROUNDS,
) -> DataFrame:
    """Per-query recall@k of the graph beam search vs the exact
    brute-force ground truth — ann_ivf_recall's shape on the graph
    path, the tuning signal for (beam, rounds) against the candidate
    budget. Both inputs are k·queries-bounded."""
    truth = ann_bruteforce_topk(spark, sf_dir, k).select(
        "query_id", "neighbor_id"
    )
    approx = ann_graph_topk(
        spark, sf_dir, k, beam, rounds, internal_k, graph_rounds, sample,
        coarse_rounds,
    ).select("query_id", F.col("neighbor_id").alias("g_neighbor"))
    hits = truth.join(
        approx,
        (truth.query_id == approx.query_id)
        & (truth.neighbor_id == approx.g_neighbor),
        "left",
    ).select(
        truth.query_id,
        F.when(F.col("g_neighbor").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.sum("hit").cast("long").alias("n_hit"),
            F.round(F.sum("hit") / F.lit(float(k)), 6).alias("recall"),
        )
        .orderBy("query_id")
    )


def write_nn_graph_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    internal_k: int = NND_INTERNAL_K,
    graph_rounds: int = NND_ROUNDS,
    sample: int = GANN_SAMPLE,
    n_layers: int | None = None,
) -> None:
    """Materialize the L-LAYER graph-ANN index — the
    build-once/query-many layout for the descent family, closing the
    same index lifecycle as write_ivf_index / write_sq_index:

      <dir>/edges          — UNDIRECTED full-graph NN-descent adjacency
      <dir>/edges_layer_ℓ  — undirected adjacency of layer ℓ's OWN
                             descent graph over vec_id % sample^ℓ == 0,
                             for ℓ = 1..L−1
      <dir>/vectors        — (vec_id, e, nrm) working table
      <dir>/tops           — entry ids (vec_id % sample^L == 0,
                             ≤ GANN_TOP_TARGET of them under auto-L)
      <dir>/meta           — (sample, n_layers): the reader derives the
                             layer file set from this, so index layout
                             and query path can never disagree on L

    n_layers=None → auto (see _gann_n_layers): layers are added until
    the top set is ≤ GANN_TOP_TARGET ids, making entry cost
    corpus-INDEPENDENT — the HNSW log-layer construction.

    All files are plain parquet: at these adjacency sizes (n·2k rows)
    the expansion join broadcasts the beam side anyway, and a plain
    path read is what ann_graph_query_indexed does — a production
    deployment that wants shuffle-free expansion joins registers
    `edges` as a CATALOG table bucketed by u instead (spark.read
    .parquet on a bucketBy output discards bucketing metadata, so
    writing one here would be dead weight)."""
    pts, n = _descent_points(spark, sf_dir)
    lyr = n_layers or _gann_n_layers(n, sample)
    g = _descent_graph(pts, n, internal_k, graph_rounds)
    _undirect(g).write.mode("overwrite").parquet(f"{index_dir}/edges")
    for ell in range(1, lyr):
        gc = _layer_descent_graph(pts, n, sample**ell)
        _undirect(gc).write.mode("overwrite").parquet(
            f"{index_dir}/edges_layer_{ell}"
        )
    pts.write.mode("overwrite").parquet(f"{index_dir}/vectors")
    stride = sample**lyr
    pts.filter(F.col("vec_id") % stride == 0).select("vec_id").write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/tops")
    spark.createDataFrame(
        [(sample, lyr)], "sample int, n_layers int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def ann_graph_query_indexed(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    k: int = TOP_K,
    beam: int = GANN_BEAM,
    rounds: int = GANN_ROUNDS,
    coarse_rounds: int = GANN_COARSE_ROUNDS,
) -> DataFrame:
    """Beam-search the PERSISTED graph index: every layer adjacency,
    vectors, and the top-entry set read from disk — the graph build
    never reruns. The layer count comes from the index's own meta
    file. Identical to ann_graph_topk by construction (the two share
    _gann_search; ann_graph_topk IS this function over the cached
    index)."""
    meta = spark.read.parquet(f"{index_dir}/meta").collect()[0]
    und = spark.read.parquet(f"{index_dir}/edges")
    layer_adjs = [
        spark.read.parquet(f"{index_dir}/edges_layer_{ell}")
        for ell in range(int(meta["n_layers"]) - 1, 0, -1)
    ]
    pts = spark.read.parquet(f"{index_dir}/vectors")
    tops = spark.read.parquet(f"{index_dir}/tops").select(
        F.col("vec_id").alias("v")
    )
    return _gann_search(
        pts, und, layer_adjs, tops, k, beam, rounds, coarse_rounds
    )
