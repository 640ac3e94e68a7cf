"""Product-quantization ANN (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) — the
memory-bounded scale path the similarity tier was missing.

Why PQ at 100 TB: IVF prunes WHICH vectors are scored; PQ compresses
WHAT is scored. Each vector becomes m sub-codes (here 8 × 4 bits of
codebook id ⇒ 8 small ints per vector instead of 64 floats), the
codebooks are k·dim bounded METADATA (broadcast literals, like the
k-means centroids), and query scoring is an asymmetric-distance
(ADC) map over the codes — one corpus scan, no joins against the
raw vectors. A billion-vector corpus holds its codes in a fraction
of the raw footprint and the scan stays JVM-side (codegen'd literal
lookups + fixed-order float folds), which is why FAISS-style systems
pair IVF (pruning) with PQ (compression); `ann_pq_topk` is the PQ
half expressed as a DataFrame plan.

Determinism/oracle story (same as kmeans/IVF): training runs Lloyd
per subspace on L2-normalized vectors with lowest-vec_id seeds and
per-round 9dp centroid rounding; assignment argmin ties break toward
the lowest code; ADC distances are fixed-order double folds rounded
to 6dp before ranking with an id tie-break. Every step is replicated
in the DuckDB oracle, so the CODES and the full top-k are
value-hashed, not just spot-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

M_SUB = 8  # subspaces
D_SUB = 8  # dims per subspace (8 × 8 = 64)
K_CODES = 16  # centroids per sub-codebook (4-bit codes)
PQ_ITERS = 3
N_QUERIES = 10  # vec_id < 10 are the query vectors (similarity.py parity)
TOP_K = 5


def _normalized_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, e) with e = L2-normalized double vector — PQ is run in
    the normalized space so ADC-L2 ranking orders like cosine (L2² =
    2 − 2cos on unit vectors), matching the rest of the ANN tier."""
    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform(e, lambda x: x / norm).alias("e")
    )


def pq_codebooks_from(pts: DataFrame) -> list[list[list[float]]]:
    """Train the m sub-codebooks over any (vec_id, e) point set: per
    subspace, Lloyd k-means on the 8-dim slices (seeds = slices of the
    K_CODES lowest vec_ids, 9dp; per-round 9dp grids — the exact
    lloyd_centroids recipe, sliced). Driver state is m·k·d_sub floats
    (1k doubles) — bounded metadata. Shared by the flat-PQ operators
    (normalized vectors) and IVF-PQ (cell residuals).

    All m subspaces train in the SAME Lloyd round: each iteration is
    ONE job — a melt to (s, cid, slice) rows (map-only explode, no
    extra corpus pass) feeding a single (s, cid)-grouped update agg —
    instead of m independent loops (m·iters sequential driver rounds,
    which at bench scale is pure scheduling latency). The arithmetic
    is unchanged: per-subspace argmin with lowest-code ties, mean =
    sum/n rounded to the same 9dp grid that absorbs partial-agg
    summation-order ULPs."""
    pts = pts.localCheckpoint(eager=True)
    seeds = pts.orderBy("vec_id").limit(K_CODES).collect()
    books = [
        [
            [
                round(float(x), 9)
                for x in r.e[s * D_SUB : (s + 1) * D_SUB]
            ]
            for r in seeds
        ]
        for s in range(M_SUB)
    ]
    for _ in range(PQ_ITERS):
        melted = []
        for s, book in enumerate(books):
            dists = _dists_hof(book, s)
            melted.append(
                F.struct(
                    F.lit(s).alias("s"),
                    F.array_position(dists, F.array_min(dists))
                    .cast("int")
                    .alias("cid"),
                    F.slice("e", s * D_SUB + 1, D_SUB).alias("e8"),
                )
            )
        stats = (
            pts.select(F.explode(F.array(*melted)).alias("m"))
            .select("m.*")
            .groupBy("s", "cid")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("e8", j + 1)).alias(f"v{j}")
                    for j in range(D_SUB)
                ],
            )
            .collect()
        )
        new_books = [list(b) for b in books]  # empty cids keep centroids
        for r in stats:
            new_books[r.s][r.cid - 1] = [
                round(r[f"v{j}"] / r.n, 9) for j in range(D_SUB)
            ]
        books = new_books
    return books


def _dists_hof(book: list[list[float]], s: int, col: str = "e"):
    """Array of K_CODES squared distances from subspace s of `e` to
    each centroid of `book`, via higher-order functions over ONE
    nested array literal. The HOF lambdas run interpreted, but that
    beats the static-expression alternative here: expanding 8×16×8
    literal terms into the projection makes the generated source
    change with every codebook (janino recompiles per training round
    per dataset — measured 65s+ cold), while the HOF form keeps the
    literals DATA inside a single array expression.

    NB: the inner lambda must stay SINGLE-argument — F.transform reads
    the lambda's arity and passes the array INDEX as a second
    argument, so a `s=s` default-capture silently rebinds s."""
    sl = F.slice(col, s * D_SUB + 1, D_SUB)
    return F.transform(_book_lit(book), lambda ce: _sq_dist(sl, ce))


# Codebook training is a PQ_ITERS-round Spark job over bounded driver
# state; memoize per sf_dir like _IVF_CENTROID_CACHE (deterministic —
# every round rounds to the 9dp grid, so a cache hit and a recompute
# are bit-identical).
_PQ_BOOK_CACHE: dict[tuple, list] = {}


def pq_codebooks(
    spark: SparkSession, sf_dir: str
) -> list[list[list[float]]]:
    """Sub-codebooks over the L2-normalized embeddings table. At
    corpus scale you'd train on a bounded sample (codebooks are a
    statistic of the distribution, not of every row); the encode/scan
    is what runs over the full data."""
    key = (sf_dir, "flat", M_SUB, K_CODES, PQ_ITERS)
    if key not in _PQ_BOOK_CACHE:
        _PQ_BOOK_CACHE[key] = pq_codebooks_from(_normalized_pts(spark, sf_dir))
    return _PQ_BOOK_CACHE[key]


def _adc_term(q_col: str, s: int, book: list[list[float]], code_col: str):
    """ADC partial distance Σ_j (q[s·8+j] − book[code][j])² with a
    per-row dynamic code lookup (same fixed-order fold as _sq_dist;
    the codebook stays a single array literal — see _dists_hof)."""
    return _sq_dist(
        F.slice(q_col, s * D_SUB + 1, D_SUB),
        F.element_at(_book_lit(book), F.col(code_col).cast("int")),
    )


def _book_lit(book: list[list[float]]):
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in book]
    )


def _sq_dist(e_slice, centroid):
    """Fixed-order fold Σ(x−y)² — the same ((0+v₁)+v₂)+… shape the
    DuckDB oracle's list_sum produces, so distances are bit-equal."""
    return F.aggregate(
        F.zip_with(e_slice, centroid, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    pts: DataFrame,
    books: list[list[list[float]]],
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Map-only encode: per subspace the argmin over K_CODES centroids
    (ties → lowest code, 1-based like array_position). The corpus
    never shuffles; output is id + m small ints (+ any passthrough
    columns, e.g. IVF-PQ's cell_id).

    ONE ARROW KERNEL (round 14, guide §4.2): the former per-subspace
    `array_position(dists, array_min(dists))` referenced the
    interpreted 16-fold HOF distance array TWICE per subspace (HOFs
    run outside codegen and projection collapse re-inlines them), so
    every row paid ~2·m·k interpreted 8-term folds. The kernel runs
    the identical arithmetic — elementwise (x−y)² then the
    strictly-sequential np.cumsum left fold (bit-identical to the
    `aggregate` HOF, see similarity._nearest_cells_np), first-min
    argmin — once per batch, vectorized. Streaming inputs pass
    through untouched by the spread (mapInPandas is
    micro-batch-safe)."""
    import numpy as np
    import pandas as pd

    from mimir_spark.functions.spread import spread_small_scan

    B = [np.array(book, dtype=np.float64) for book in books]
    m = len(books)
    extra_fields = {
        f.name: f.dataType.simpleString()
        for f in pts.schema.fields
    }

    def _k(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.array(list(pdf["e"]), dtype=np.float64)
            out = {"neighbor_id": pdf["vec_id"]}
            for c in extra_cols:
                out[c] = pdf[c]
            for s in range(m):
                sl = E[:, s * D_SUB : (s + 1) * D_SUB]
                diff = sl[:, None, :] - B[s][None, :, :]
                d = np.cumsum(diff * diff, axis=2)[:, :, -1]
                out[f"code{s}"] = (d.argmin(axis=1) + 1).astype(np.int64)
            yield pd.DataFrame(out)

    schema = ", ".join(
        ["neighbor_id long"]
        + [f"{c} {extra_fields[c]}" for c in extra_cols]
        + [f"code{s} long" for s in range(m)]
    )
    return spread_small_scan(pts).mapInPandas(_k, schema)


def ann_pq_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """PQ/ADC top-k: train sub-codebooks, encode the corpus (map-only),
    then score each query against the CODES — adc(q, x) = Σ_s ||q_s −
    c_{s, code_s(x)}||², a literal-table lookup per subspace, summed in
    fixed subspace order and rounded to 6dp before the (adc asc, id)
    ranking window. The scan is one pass over m-int rows with a
    broadcast query set; the k·queries-bounded window is the only
    shuffle."""
    books = pq_codebooks(spark, sf_dir)
    pts = _normalized_pts(spark, sf_dir)
    codes = pq_encode(pts, books)
    # ADC distance TABLES, computed once per QUERY row instead of once
    # per scanned code row (the TPAMI'11 §IV lookup-table step): dt_s =
    # [‖q_s − c‖² for c in book_s] is the same fixed-order _sq_dist
    # fold as before, just hoisted to the tiny broadcast side — the
    # corpus-sized scan pays one element_at per subspace instead of an
    # interpreted 8-term HOF fold (HOFs run outside codegen).
    q = pts.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        *[
            _dists_hof(book, s, "e").alias(f"dt{s}")
            for s, book in enumerate(books)
        ],
    )
    joined = codes.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
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


RERANK_SHORTLIST = 64


def ann_pq_rerank_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    shortlist: int = RERANK_SHORTLIST,
) -> DataFrame:
    """The complete production PQ recipe (FAISS's IVFADC+refine): the
    ADC scan produces a SHORTLIST (top-`shortlist` by quantized
    distance — cheap, code-only), then only shortlist rows are scored
    with the exact metric and re-ranked to top-k. At scale the exact
    leg touches shortlist·queries vectors instead of the corpus — the
    re-rank join is k·queries-bounded metadata against the vector
    store. Ranking: round(cos, 6) desc with an id tie-break, same
    contract as the rest of the ANN tier."""
    from mimir_spark.functions.vectors import cosine_sim

    short = ann_pq_topk(spark, sf_dir, shortlist).select(
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


def ann_pq_recall(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Recall@k of the PQ/ADC ranking vs exact cosine top-k per query
    (ann_ivf_recall's shape) — the quality dial a PQ deployment tunes
    (m, k_codes) against; both sides re-derived in the oracle."""
    from mimir_spark.operators.similarity import ann_bruteforce_topk

    truth = ann_bruteforce_topk(spark, sf_dir, k).select(
        "query_id", "neighbor_id"
    )
    pq = ann_pq_topk(spark, sf_dir, k).select(
        "query_id", F.col("neighbor_id").alias("pq_neighbor")
    )
    hits = truth.join(
        pq,
        (truth.query_id == pq.query_id)
        & (truth.neighbor_id == pq.pq_neighbor),
        "left",
    ).select(
        truth.query_id,
        F.when(F.col("pq_neighbor").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return hits.groupBy("query_id").agg(
        F.sum("hit").cast("long").alias("n_hit"),
        F.round(F.sum("hit") / F.lit(float(k)), 6).alias("recall"),
    )


# ---- Scalar quantization (SQ8) — round 11 ---------------------------------

SQ_LEVELS = 256  # 8-bit codes per dimension
DIM = 64


def sq_bounds(pts: DataFrame) -> DataFrame:
    """1-row per-dim (min, max) over the normalized corpus — the
    entire SQ8 'training' state (128 doubles). Per-batch partial
    min/max via a NumPy Arrow kernel (a 128-aggregate JVM expression
    over element_at of the HOF-normalized array re-evaluates the
    normalization per aggregate — the CollapseProject trap), then a
    64-row re-aggregate; min/max are exact whatever the
    partitioning."""
    import numpy as np
    import pandas as pd

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

    narrow = (
        pts.select("e")
        .mapInPandas(_partial, "d long, mn double, mx double")
        .groupBy("d")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
    )
    aggs = []
    for d in range(DIM):
        aggs.append(
            F.min(F.when(F.col("d") == d, F.col("mn"))).alias(f"mn{d}")
        )
        aggs.append(
            F.max(F.when(F.col("d") == d, F.col("mx"))).alias(f"mx{d}")
        )
    return narrow.agg(*aggs)


def sq_encode(pts: DataFrame, bounds: DataFrame) -> DataFrame:
    """Map-only SQ8 encode: code_d = clamp(floor(((e_d − mn_d) /
    (mx_d − mn_d)) · 256), 0, 255) — one byte per dimension (stored
    as array<long> here; a production sink packs to binary). A
    constant dimension (mx == mn) encodes 0. Vectorized NumPy kernel
    per Arrow batch, elementwise-identical IEEE ops to the oracle's
    expression (the normalized e arrives via Arrow bit-exact)."""
    import numpy as np
    import pandas as pd

    b_row = bounds.collect()[0]  # bounded metadata: 128 doubles
    mns = np.array([b_row[f"mn{d}"] for d in range(DIM)])
    mxs = np.array([b_row[f"mx{d}"] for d in range(DIM)])
    spans = mxs - mns
    safe = np.where(spans == 0.0, 1.0, spans)

    def _encode(batches):
        for pdf in batches:
            E = np.array(list(pdf["e"]), dtype=np.float64)
            if len(E) == 0:
                continue
            C = np.clip(
                np.floor(((E - mns) / safe) * SQ_LEVELS), 0, SQ_LEVELS - 1
            ).astype(np.int64)
            C[:, spans == 0.0] = 0
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["vec_id"].to_numpy(np.int64),
                    "code": list(C),
                }
            )

    return pts.select("vec_id", "e").mapInPandas(
        _encode, "neighbor_id long, code array<long>"
    )


def ann_sq_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """SQ8 asymmetric top-k — the THIRD compression point on the ANN
    memory/recall curve (flat = 256 B/vector, SQ8 = 64 B, PQ = 4 B
    here): each dimension quantized independently to 8 bits against
    per-dim corpus bounds, queries scored EXACTLY against the decoded
    reconstruction x̂_d = mn_d + ((code_d + 0.5)/256)·(mx_d − mn_d)
    (midpoint decode). Unlike PQ there is no codebook training — the
    128-double bounds row is the whole index metadata — and per-dim
    quantization keeps ~0.98 recall@5 where this corpus's PQ codes
    get ~0.2 (see ann_sq_recall vs ann_pq_recall): the standard
    first stop when raw vectors don't fit.

    Scale shape: bounds = one map-side-combined aggregate (128
    doubles, broadcast); encode = map-only; scoring = one pass over
    the code table with the broadcast query set, fixed-order float
    fold (vectors.dot), 6dp-rounded before the k·queries-bounded
    ranking window — the only shuffle.

    Citation (architecture): FAISS ScalarQuantizer QT_8bit; Jégou et
    al. TPAMI'11 §II situates SQ vs PQ on the same code-budget axis.

    Scoring runs as a vectorized NumPy kernel per Arrow batch
    (decode matrix + one GEMM against the broadcast query matrix)
    with LOSSLESS batch-local top-k pruning — ann_bruteforce_topk's
    exact shape, ~10× the per-row zip_with fold (higher-order-function
    lambdas run interpreted, outside codegen); 6dp rounding collapses
    the GEMM-vs-sequential summation ULPs (the bruteforce precedent)."""
    import numpy as np
    import pandas as pd

    pts = _normalized_pts(spark, sf_dir).localCheckpoint(eager=True)
    bounds = sq_bounds(pts)
    # bounded metadata: 128 doubles + N_QUERIES vectors
    b_row = bounds.collect()[0]
    mns = np.array([b_row[f"mn{d}"] for d in range(DIM)])
    mxs = np.array([b_row[f"mx{d}"] for d in range(DIM)])
    spans = mxs - mns
    safe = np.where(spans == 0.0, 1.0, spans)
    q_rows = (
        pts.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "e")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["e"] for r in q_rows], dtype=np.float64)

    # encode + decode + score fused into ONE Arrow pass over the
    # vectors (sq_encode stays the standalone encode API; the search
    # path never materializes the code table separately)
    def _batch_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            E = np.array(list(pdf["e"]), dtype=np.float64)
            if len(E) == 0:
                continue
            C = np.clip(
                np.floor(((E - mns) / safe) * SQ_LEVELS), 0, SQ_LEVELS - 1
            )
            C[:, spans == 0.0] = 0
            D = mns + ((C + 0.5) / float(SQ_LEVELS)) * spans
            S = np.round(D @ Q.T, 6)
            parts = []
            for j, qid in enumerate(q_ids):
                s = S[:, j]
                cand = np.flatnonzero(ids != qid)
                if cand.size == 0:
                    continue
                order = np.lexsort((ids[cand], -s[cand]))[: max(1, k)]
                keep = cand[order]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[keep],
                            "sqdot": s[keep],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = pts.select("vec_id", "e").mapInPandas(
        _batch_topk, "query_id long, neighbor_id long, sqdot double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sqdot").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sqdot", "rank")
    )


def ann_sq_recall(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Recall@k of the SQ8 ranking vs exact cosine top-k per query —
    completes the recall-report family across the compression tiers
    (IVF probe misses, PQ code grain, SQ per-dim grain)."""
    from mimir_spark.operators.similarity import ann_bruteforce_topk

    truth = ann_bruteforce_topk(spark, sf_dir, k).select(
        "query_id", "neighbor_id"
    )
    sq = ann_sq_topk(spark, sf_dir, k).select(
        "query_id", F.col("neighbor_id").alias("sq_neighbor")
    )
    hits = truth.join(
        sq,
        (truth.query_id == sq.query_id)
        & (truth.neighbor_id == sq.sq_neighbor),
        "left",
    ).select(
        truth.query_id,
        F.when(F.col("sq_neighbor").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return hits.groupBy("query_id").agg(
        F.sum("hit").cast("long").alias("n_hit"),
        F.round(F.sum("hit") / F.lit(float(k)), 6).alias("recall"),
    )


def write_sq_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Materialize the SQ8 index: the 1-row bounds table to
    `<dir>/bounds` and the code table to `<dir>/codes`. There is no
    cell structure to prune by (that's IVF's job) — the index's value
    is BYTE WIDTH: a query scans 8-bit codes instead of raw vectors
    (16× less IO at float32; a production sink packs the array<long>
    to binary for the full saving), with the 128-double bounds row as
    the only metadata. The 'build once, query many' layout for the
    flat-compression tier."""
    pts = _normalized_pts(spark, sf_dir)
    bounds = sq_bounds(pts)
    bounds.write.mode("overwrite").parquet(f"{index_dir}/bounds")
    sq_encode(pts, bounds).write.mode("overwrite").parquet(
        f"{index_dir}/codes"
    )


def ann_sq_query_indexed(
    spark: SparkSession, sf_dir: str, index_dir: str, k: int = TOP_K
) -> DataFrame:
    """Query the PERSISTED SQ8 index: decode+score the stored codes
    against the stored bounds — matches `ann_sq_topk` row-for-row
    (pytest-pinned) without touching the raw corpus vectors (queries
    still read their own exact vectors; that lookup is
    queries-bounded)."""
    import numpy as np
    import pandas as pd

    b_row = spark.read.parquet(f"{index_dir}/bounds").collect()[0]
    mns = np.array([b_row[f"mn{d}"] for d in range(DIM)])
    mxs = np.array([b_row[f"mx{d}"] for d in range(DIM)])
    spans = mxs - mns
    pts = _normalized_pts(spark, sf_dir)
    q_rows = (
        pts.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "e")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["e"] for r in q_rows], dtype=np.float64)

    def _batch_topk(batches):
        for pdf in batches:
            ids = pdf["neighbor_id"].to_numpy(np.int64)
            C = np.array(list(pdf["code"]), dtype=np.float64)
            if len(C) == 0:
                continue
            D = mns + ((C + 0.5) / float(SQ_LEVELS)) * spans
            S = np.round(D @ Q.T, 6)
            parts = []
            for j, qid in enumerate(q_ids):
                s = S[:, j]
                cand = np.flatnonzero(ids != qid)
                if cand.size == 0:
                    continue
                order = np.lexsort((ids[cand], -s[cand]))[: max(1, k)]
                keep = cand[order]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[keep],
                            "sqdot": s[keep],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = (
        spark.read.parquet(f"{index_dir}/codes")
        .mapInPandas(
            _batch_topk, "query_id long, neighbor_id long, sqdot double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sqdot").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sqdot", "rank")
    )
