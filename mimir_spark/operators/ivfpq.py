"""IVF-PQ — the composed FAISS `IVFADC` architecture (Jégou et al.
TPAMI 2011 §IV): an inverted-file coarse quantizer PRUNES which
vectors are scored (each query probes N_PROBE of N_CELLS Voronoi
cells) and product quantization of the CELL RESIDUALS compresses what
is scored (8 × 4-bit codes per vector, asymmetric-distance scan over
codes only). This is the layout a billion-vector deployment actually
runs: cells → partition pruning (see write_ivf_index), residual codes
→ ~8 bytes/vector in the scan, codebooks + centroids → broadcast
metadata.

Residuals beat raw-vector PQ because within a Voronoi cell the
residual distribution is centred and tighter than the global one —
the same 32-bit code budget spends its resolution on the
within-cell structure the coarse quantizer removed.

Determinism/oracle story: both quantizers train with the shared
Lloyd recipe (lowest-id seeds, per-round 9dp grids), assignments
break ties toward the lowest id, residual arithmetic is elementwise
double subtraction, and ADC distances are fixed-order folds rounded
to 6dp before ranking — the full chain (coarse training, residual PQ
training, encode, probe, ADC) is replicated in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.vectors import cosine_sim
from mimir_spark.operators.pq import (
    M_SUB,
    N_QUERIES,
    PQ_ITERS,
    K_CODES,
    TOP_K,
    _dists_hof,
    _normalized_pts,
    pq_codebooks_from,
    pq_encode,
)
from mimir_spark.operators.similarity import N_PROBE, _ivf_centroids

# Residual codebooks memoized per sf_dir (deterministic 9dp training —
# cache hit == recompute), same pattern as _IVF_CENTROID_CACHE.
_RES_BOOK_CACHE: dict[tuple, list] = {}


def _residual_codebooks(spark: SparkSession, sf_dir: str):
    key = (sf_dir, "ivfpq", M_SUB, K_CODES, PQ_ITERS)
    if key not in _RES_BOOK_CACHE:
        res = _cell_residuals(spark, sf_dir)
        _RES_BOOK_CACHE[key] = pq_codebooks_from(
            res.select("vec_id", F.col("res").alias("e"))
        )
    return _RES_BOOK_CACHE[key]


def _cell_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell_id, res): every normalized vector assigned to its
    nearest trained centroid (cos argmax, ties → lowest cell — the
    ann_ivf_topk rule) with the elementwise residual e − centroid.

    ONE ARROW KERNEL (round 14, guide §2.4/§4.2): sims to all N_CELLS
    centroids, the first-max argmax (ties → lowest cell, the old
    window's rule) and the elementwise residual are computed per Arrow
    batch with strictly-sequential NumPy folds — bit-identical doubles
    to the former cosine_sim over exploded join rows (see
    _nearest_cells_np). The previous form fanned the corpus ×N_CELLS
    through a broadcast join, ran three interpreted 64-term HOF folds
    per fan-out row, and ranked the fan-out back down with a
    per-vector window — a corpus-sized exchange + sort that existed
    only to pick a per-row maximum."""
    import numpy as np
    import pandas as pd

    from mimir_spark.functions.spread import spread_small_scan
    from mimir_spark.operators.similarity import (
        _ivf_centroid_list,
        _nearest_cells_np,
    )

    cent_list = _ivf_centroid_list(spark, sf_dir)
    C = np.array(cent_list, dtype=np.float64)
    nc = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
    pts = _normalized_pts(spark, sf_dir)

    def _k(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.array(list(pdf["e"]), dtype=np.float64)
            cell = _nearest_cells_np(E, C, nc)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell_id": cell.astype(np.int64),
                    "res": list(E - C[cell]),
                }
            )

    return spread_small_scan(pts).mapInPandas(
        _k, "vec_id long, cell_id long, res array<double>"
    )


def ann_ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """IVF-PQ/ADC top-k: assign the corpus to trained Voronoi cells,
    PQ-encode the cell residuals (map-only), then each query probes
    its `nprobe` nearest cells and ADC-scores only those cells' CODES
    against its per-cell query residual. The scan is cell-pruned and
    code-compressed — at scale the probe reads nprobe partition
    directories of ~8-byte codes; the k·queries-bounded ranking
    window is the only shuffle."""
    res = _cell_residuals(spark, sf_dir)
    books = _residual_codebooks(spark, sf_dir)
    codes = pq_encode(
        res.select("vec_id", "cell_id", F.col("res").alias("e")),
        books,
        extra_cols=("cell_id",),
    )

    cents = _ivf_centroids(spark, sf_dir)
    pts = _normalized_pts(spark, sf_dir)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cell_id")
    )
    q_probe = (
        pts.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
        .join(F.broadcast(cents))
        .withColumn("sim", cosine_sim("qe", "cent"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select(
            "query_id",
            "cell_id",
            F.zip_with("qe", "cent", lambda x, y: x - y).alias("qres"),
        )
        # ADC distance TABLES per (query, probed cell): dt_s = [‖qres_s
        # − c‖² for c in book_s], the same fixed-order _sq_dist fold,
        # hoisted from the corpus-sized code scan to the nprobe·queries
        # broadcast side (TPAMI'11 §IV lookup tables; see ann_pq_topk).
        .select(
            "query_id",
            "cell_id",
            *[
                _dists_hof(book, s, "qres").alias(f"dt{s}")
                for s, book in enumerate(books)
            ],
        )
    )

    joined = codes.join(F.broadcast(q_probe), "cell_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = None
    for s in range(len(books)):
        term = F.element_at(f"dt{s}", F.col(f"code{s}").cast("int"))
        adc = term if adc is None else adc + term
    scored = joined.select(
        "query_id", "neighbor_id", F.round(adc, 6).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ann_ivfpq_rerank_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    shortlist: int = 64,
) -> DataFrame:
    """The complete IVFADC+refine recipe: the cell-pruned code scan
    produces a SHORTLIST (top-`shortlist` by quantized distance), then
    only shortlist rows are scored with the exact metric and re-ranked
    to top-k — at scale the exact leg touches shortlist·queries
    vectors. Same ranking contract as the ANN tier (round(cos,6) desc,
    id tie-break)."""
    short = ann_ivfpq_topk(spark, sf_dir, shortlist).select(
        "query_id", "neighbor_id"
    )
    pts = _normalized_pts(spark, sf_dir)
    q = pts.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    c = pts.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")
    )
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim("qe", "ce"), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ann_ivfpq_recall(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Recall@k of IVF-PQ vs exact brute-force truth — the end-to-end
    quality dial (coarse-probe misses + quantization-grain misses
    combined); both sides re-derived in the oracle."""
    from mimir_spark.operators.similarity import ann_bruteforce_topk

    truth = ann_bruteforce_topk(spark, sf_dir, k).select(
        "query_id", "neighbor_id"
    )
    approx = ann_ivfpq_topk(spark, sf_dir, k).select(
        "query_id", F.col("neighbor_id").alias("pq_neighbor")
    )
    hits = truth.join(
        approx,
        (truth.query_id == approx.query_id)
        & (truth.neighbor_id == approx.pq_neighbor),
        "left",
    ).select(
        truth.query_id,
        F.when(F.col("pq_neighbor").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return hits.groupBy("query_id").agg(
        F.sum("hit").cast("long").alias("n_hit"),
        F.round(F.sum("hit") / F.lit(float(k)), 6).alias("recall"),
    )

def write_ivfpq_index(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> None:
    """Materialize the IVF-PQ index — the 'build once, query many'
    layout a billion-vector deployment ships: centroids to
    `<dir>/centroids`, the m sub-codebooks to `<dir>/codebooks`
    (m·k rows of 8-dim arrays — bounded metadata), and the residual
    CODES to `<dir>/codes` PARTITIONED BY cell_id. On disk each
    Voronoi cell is its own partition directory of ~8-byte code rows,
    so a probe reads exactly nprobe directories of compressed codes
    (PartitionFilters, pinned in tests) — the raw vectors never leave
    the source table."""
    res = _cell_residuals(spark, sf_dir)
    books = _residual_codebooks(spark, sf_dir)
    codes = pq_encode(
        res.select("vec_id", "cell_id", F.col("res").alias("e")),
        books,
        extra_cols=("cell_id",),
    )
    write_ivfpq_metadata(
        spark, _ivf_centroids(spark, sf_dir), books, index_dir
    )
    codes.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{index_dir}/codes"
    )


def write_ivfpq_metadata(
    spark: SparkSession,
    cents: DataFrame,
    books: list[list[list[float]]],
    index_dir: str,
) -> None:
    """The bounded-metadata half of the index layout (centroids +
    sub-codebooks) — shared by the batch builder above and the
    streaming publisher (streaming/ann.export_ivfpq_index_from_stream)."""
    cents.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    spark.createDataFrame(
        [
            (s, cid, book[cid])
            for s, book in enumerate(books)
            for cid in range(len(book))
        ],
        "sub int, cid int, c array<double>",
    ).write.mode("overwrite").parquet(f"{index_dir}/codebooks")


def ann_ivfpq_query_indexed(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Query the PERSISTED IVF-PQ index: centroids + codebooks load as
    bounded metadata, queries probe their nprobe cells, and the scan
    reads ONLY the probed cell_id partitions of the codes table (a
    partition-pruned read of ~8-byte rows). Matches ann_ivfpq_topk
    row-for-row (pytest-pinned) — same training, same probe rule, same
    ADC fold — but against the index instead of a recomputation."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    book_rows = spark.read.parquet(f"{index_dir}/codebooks").collect()
    books: list[list[list[float]]] = []
    for s in range(M_SUB):
        rows_s = sorted(
            (r for r in book_rows if r.sub == s), key=lambda r: r.cid
        )
        books.append([list(r.c) for r in rows_s])

    pts = _normalized_pts(spark, sf_dir)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cell_id")
    )
    q_probe = (
        pts.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
        .join(F.broadcast(cents))
        .withColumn("sim", cosine_sim("qe", "cent"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select(
            "query_id",
            "cell_id",
            F.zip_with("qe", "cent", lambda x, y: x - y).alias("qres"),
        )
        # hoisted ADC lookup tables — see ann_ivfpq_topk
        .select(
            "query_id",
            "cell_id",
            *[
                _dists_hof(book, s, "qres").alias(f"dt{s}")
                for s, book in enumerate(books)
            ],
        )
    )
    probed = [
        r.cell_id for r in q_probe.select("cell_id").distinct().collect()
    ]
    codes = spark.read.parquet(f"{index_dir}/codes").filter(
        F.col("cell_id").isin(probed)
    )
    joined = codes.join(F.broadcast(q_probe), "cell_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = None
    for s in range(len(books)):
        term = F.element_at(f"dt{s}", F.col(f"code{s}").cast("int"))
        adc = term if adc is None else adc + term
    scored = joined.select(
        "query_id", "neighbor_id", F.round(adc, 6).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


# ---- IVF-SQ (round 11) -----------------------------------------------------


def _residual_sq_bounds(spark: SparkSession, sf_dir: str):
    """Global per-dim (min, max) over the cell residuals — the SQ8
    'training' state for the IVF-SQ tier (FAISS IVFScalarQuantizer:
    one scalar quantizer over residuals, not one per cell). Returns
    two 64-float lists (bounded metadata)."""
    import numpy as np
    import pandas as pd

    from mimir_spark.operators.pq import DIM

    res = _cell_residuals(spark, sf_dir).select(F.col("res").alias("e"))

    def _partial(batches):
        for pdf in batches:
            E = np.array(list(pdf["e"]), dtype=np.float64)
            if len(E) == 0:
                continue
            yield pd.DataFrame(
                {
                    "d": np.arange(DIM, dtype=np.int64),
                    "mn": E.min(axis=0),
                    "mx": E.max(axis=0),
                }
            )

    rows = (
        res.mapInPandas(_partial, "d long, mn double, mx double")
        .groupBy("d")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()
    )
    mns = [0.0] * DIM
    mxs = [0.0] * DIM
    for r in rows:
        mns[r["d"]] = float(r["mn"])
        mxs[r["d"]] = float(r["mx"])
    return mns, mxs


def ann_ivfsq_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """IVF-SQ top-k (FAISS `IVFScalarQuantizer` shape): the trained
    coarse quantizer prunes WHICH vectors are scored (nprobe Voronoi
    cells per query — identical probe rule to IVF-PQ), and SQ8 of the
    CELL RESIDUALS compresses what is scored — 64 bytes/vector where
    IVF-PQ spends 4 and the flat index 256. The middle point of the
    quantization matrix (IVF × {flat, PQ, SQ}): take it when PQ's
    code grain costs too much recall and raw vectors cost too much IO
    (on this corpus: 0.96 recall@5 vs IVF-PQ's 0.34 raw, see
    ann_ivfsq_recall).

    Scoring: per probed (query, cell), exact L2² between the QUERY
    residual and the midpoint-decoded residual — within a shared
    cell, ‖q−x̂‖² = ‖qres−reŝ‖², so ranking matches the IVF-PQ ADC
    contract (dist asc, id tie-break, 6dp).

    Scale shape: residual bounds = one kernel pass (128 doubles);
    encode = map-only; each query's scan touches only its probed
    cells' code rows (cell_id-partitioned on disk via
    write_ivf_index's layout); the probe table (queries × nprobe,
    with 64-double query residuals) is broadcast metadata; the only
    shuffle is the k·queries ranking window."""
    import numpy as np
    import pandas as pd

    from mimir_spark.operators.pq import DIM, SQ_LEVELS

    res = _cell_residuals(spark, sf_dir)
    mns_l, mxs_l = _residual_sq_bounds(spark, sf_dir)
    mns = np.array(mns_l)
    mxs = np.array(mxs_l)
    spans = mxs - mns
    safe = np.where(spans == 0.0, 1.0, spans)

    cents = _ivf_centroids(spark, sf_dir)
    pts = _normalized_pts(spark, sf_dir)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cell_id")
    )
    probe_rows = (
        pts.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
        .join(F.broadcast(cents))
        .withColumn("sim", cosine_sim("qe", "cent"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select(
            "query_id",
            "cell_id",
            F.zip_with("qe", "cent", lambda x, y: x - y).alias("qres"),
        )
        .collect()
    )  # bounded metadata: queries × nprobe rows
    by_cell: dict[int, list] = {}
    for r in probe_rows:
        by_cell.setdefault(r["cell_id"], []).append(
            (r["query_id"], np.array(r["qres"], dtype=np.float64))
        )

    def _batch_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            cells = pdf["cell_id"].to_numpy(np.int64)
            R = np.array(list(pdf["res"]), dtype=np.float64)
            if len(R) == 0:
                continue
            C = np.clip(
                np.floor(((R - mns) / safe) * SQ_LEVELS), 0, SQ_LEVELS - 1
            )
            C[:, spans == 0.0] = 0
            D = mns + ((C + 0.5) / float(SQ_LEVELS)) * spans
            parts = []
            for cell in np.unique(cells):
                probes = by_cell.get(int(cell))
                if not probes:
                    continue
                mask = cells == cell
                cell_ids = ids[mask]
                Dc = D[mask]
                for qid, qres in probes:
                    dist = np.round(((qres - Dc) ** 2).sum(axis=1), 6)
                    cand = np.flatnonzero(cell_ids != qid)
                    if cand.size == 0:
                        continue
                    order = np.lexsort(
                        (cell_ids[cand], dist[cand])
                    )[: max(1, k)]
                    keep = cand[order]
                    parts.append(
                        pd.DataFrame(
                            {
                                "query_id": qid,
                                "neighbor_id": cell_ids[keep],
                                "dist": dist[keep],
                            }
                        )
                    )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = res.mapInPandas(
        _batch_topk, "query_id long, neighbor_id long, dist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )


def ann_ivfsq_recall(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Recall@k of IVF-SQ vs brute-force truth — the third column of
    the quantization-matrix recall table (IVF probe misses + per-dim
    8-bit grain; cf. ann_ivfpq_recall's 4-bit-code grain)."""
    from mimir_spark.operators.similarity import ann_bruteforce_topk

    truth = ann_bruteforce_topk(spark, sf_dir, k).select(
        "query_id", "neighbor_id"
    )
    got = ann_ivfsq_topk(spark, sf_dir, k).select(
        "query_id", F.col("neighbor_id").alias("sq_neighbor")
    )
    hits = truth.join(
        got,
        (truth.query_id == got.query_id)
        & (truth.neighbor_id == got.sq_neighbor),
        "left",
    ).select(
        truth.query_id,
        F.when(F.col("sq_neighbor").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return hits.groupBy("query_id").agg(
        F.sum("hit").cast("long").alias("n_hit"),
        F.round(F.sum("hit") / F.lit(float(k)), 6).alias("recall"),
    )
