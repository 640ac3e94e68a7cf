"""Incremental (streaming) exact ANN top-k over an embedding stream.

Per-query top-k is a MIN-MERGE monoid under the (cos desc,
neighbor_id) order: each micro-batch's local top-k candidates are a
lossless partial (every global top-k neighbor is necessarily in its
own batch's top-k), so the merged result is identical to the batch
`ann_bruteforce_topk` however the corpus was split — the incremental
top-k-similarity-search shape (cf. EDBT 2020's interactive-session
framework), realized as streaming state.

Query vectors come from the STATIC base table (a streaming top-k is
always "known queries over a growing corpus"); per-batch scoring
reuses NumPy matmuls over Arrow batches like the batch operator.
State layout is the idempotent ``batch_id=N`` recipe (cms.py): a
foreachBatch retry overwrites its own candidates; state volume is
≤ k·|queries| rows per batch forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mimir_spark.operators.similarity import N_QUERIES, TOP_K
from mimir_spark.sources.tables import SCHEMAS, load_table


def read_embeddings_stream(
    spark: SparkSession, sf_dir: str, glob: str = "embeddings.parquet"
) -> DataFrame:
    return (
        spark.readStream.schema(SCHEMAS["embeddings"])
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )


def streaming_ann_build(
    spark: SparkSession,
    input_dir: str,
    query_sf_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = TOP_K,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the incremental top-k builder. Queries (vec_id <
    N_QUERIES) are collected once from the static table — bounded
    metadata, same contract as the batch operator."""
    import numpy as np
    import pandas as pd

    q_rows = (
        load_table(spark, query_sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    emb_stream = read_embeddings_stream(spark, input_dir, glob=glob)

    def _batch_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            E = np.array(list(pdf["embedding"]), dtype=np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            S = np.round(En @ Qn.T, 6)
            parts = []
            for j, qid in enumerate(q_ids):
                s = S[:, j]
                cand_idx = np.flatnonzero(ids != qid)
                if cand_idx.size == 0:
                    continue
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

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        local = batch.select("vec_id", "embedding").mapInPandas(
            _batch_topk, "query_id long, neighbor_id long, cos double"
        )
        # batch-LOCAL top-k (the partial state): one tiny window over
        # ≤ k·queries·arrow-batches candidate rows
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
        cand = (
            local.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cos")
        )
        cand.write.mode("overwrite").parquet(f"{state_dir}/batch_id={batch_id}")

    return (
        emb_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def finalize_ann_topk(
    spark: SparkSession, state_dir: str, k: int = TOP_K
) -> DataFrame:
    """Merge the per-batch candidates: global per-query top-k under
    the same (cos desc, neighbor_id) order — identical to the batch
    `ann_bruteforce_topk` on the same corpus (pytest-pinned).
    Candidate-sized work: ≤ k·|queries|·batches input rows."""
    cand = spark.read.parquet(state_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )

def streaming_ivfpq_encode(
    emb_stream: DataFrame, cent_rows: list, books
) -> DataFrame:
    """Streaming IVF-PQ encode — the composed twin of
    streaming_pq_encode: coarse centroids AND residual sub-codebooks
    are FROZEN index metadata, so each arriving vector is a stateless
    map: normalize → nearest-cell assignment → residual vs the
    assigned centroid → per-subspace argmin codes, bit-identical to
    the batch encode (pytest-pinned).

    The batch assignment (_cell_residuals) is a broadcast join + a
    rank-1 window, which append-mode streaming can't run; here the
    N_CELLS centroids are literal arrays and the argmax is
    array_position(sims, array_max(sims)) over a cell_id-ordered sims
    array — first-max == (sim desc, cell_id asc), the identical
    tie-break, over the identical cosine fold (same expression tree,
    literal instead of joined column). Output schema == the persisted
    index's codes table."""
    from mimir_spark.functions.vectors import cosine_sim
    from mimir_spark.operators.pq import pq_encode

    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
    pts = emb_stream.select(
        "vec_id", F.transform(e, lambda x: x / norm).alias("e")
    )
    cents = sorted(
        (int(r.cell_id), [float(x) for x in r.cent]) for r in cent_rows
    )

    def _lit_arr(vals: list):
        return F.array(*[F.lit(float(x)) for x in vals])

    sims = F.array(
        *[cosine_sim(F.col("e"), _lit_arr(c)) for _, c in cents]
    )
    # 1-based first max (element_at needs an INT index; array_position
    # yields bigint)
    pos = F.array_position(sims, F.array_max(sims)).cast("int")
    cell = F.element_at(
        F.array(*[F.lit(cid) for cid, _ in cents]), pos
    )
    cent_sel = F.element_at(
        F.array(*[_lit_arr(c) for _, c in cents]), pos
    )
    assigned = pts.select(
        "vec_id",
        cell.alias("cell_id"),
        F.zip_with("e", cent_sel, lambda x, y: x - y).alias("res"),
    ).select("vec_id", "cell_id", F.col("res").alias("e"))
    return pq_encode(assigned, books, extra_cols=("cell_id",))


def streaming_ivfpq_encode_store(
    spark: SparkSession,
    input_dir: str,
    sf_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the ingest half of a streaming vector-index pipeline:
    arriving embedding files are IVF-PQ-encoded against the FROZEN
    quantizers (trained once on the static corpus at `sf_dir` via the
    memoized deterministic trainers — cache hit ≡ recompute) and
    appended to a parquet code store. Stateless map ⇒ the exactly-once
    parquet file sink (commit-log) is sufficient; no foreachBatch
    batch-id store is needed. export_ivfpq_index_from_stream publishes
    the store as the queryable cell-partitioned index."""
    from mimir_spark.operators.ivfpq import _residual_codebooks
    from mimir_spark.operators.similarity import _ivf_centroids

    cent_rows = _ivf_centroids(spark, sf_dir).collect()
    books = _residual_codebooks(spark, sf_dir)
    stream = read_embeddings_stream(spark, input_dir, glob=glob)
    codes = streaming_ivfpq_encode(stream, cent_rows, books)
    return (
        codes.writeStream.format("parquet")
        .option("path", store_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def export_ivfpq_index_from_stream(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str | list[str],
    index_dir: str,
) -> None:
    """Publish the ACCUMULATED streaming code store as the persisted
    cell_id-partitioned IVF-PQ index (write_ivfpq_index's exact
    layout) WITHOUT re-scanning or re-encoding the corpus — the
    streaming mirror of export_lsh_index_from_stream: quantizer
    metadata is the frozen trainers' bounded output, and the publish
    pass is one store-sized repartition into partition directories.
    `store_dir` may be a LIST of store generations (a compacted base
    plus the live generation — see compact_ann_store's generation
    contract); all generations share the frozen quantizers, so their
    union is one consistent code space. ann_ivfpq_query_indexed runs
    against the result unchanged (probe-equivalence pytest-pinned)."""
    from mimir_spark.operators.ivfpq import (
        _residual_codebooks,
        write_ivfpq_metadata,
    )
    from mimir_spark.operators.similarity import _ivf_centroids

    write_ivfpq_metadata(
        spark,
        _ivf_centroids(spark, sf_dir),
        _residual_codebooks(spark, sf_dir),
        index_dir,
    )
    dirs = [store_dir] if isinstance(store_dir, str) else list(store_dir)
    spark.read.parquet(*dirs).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{index_dir}/codes")


def streaming_pq_encode(emb_stream: DataFrame, books) -> DataFrame:
    """Streaming twin of the PQ encode (operators.pq.pq_encode): the
    sub-codebooks are FROZEN index metadata (trained once on the
    static base corpus — retraining per micro-batch would silently
    re-key every previously-encoded vector), so encoding arriving
    vectors is a stateless map — normalize, per-subspace argmin — and
    each new vector's codes are bit-identical to what the batch encode
    would assign. Append mode, no watermark, no state."""
    from mimir_spark.operators.pq import pq_encode

    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
    pts = emb_stream.select(
        "vec_id", F.transform(e, lambda x: x / norm).alias("e")
    )
    return pq_encode(pts, books)


# ---- ANN store maintenance (round 11) ------------------------------------
# The ingest half (streaming_ivfpq_encode_store) uses the exactly-once
# parquet FILE SINK: correct, but over a long run its _spark_metadata
# commit log grows unbounded and the store accumulates one small file
# per micro-batch — the classic slow death of a long-lived index. The
# two maintenance passes below mirror compact_stream_store for the
# file-sink shape (generation-based, because a file sink's commit log
# references the pre-compaction files and cannot survive them):
#
#   generation contract: STOP the ingest stream → compact_ann_store
#   (rewrites the committed rows as a plain compacted parquet base,
#   retiring both the commit log and the checkpoint) → resume ingest
#   into a FRESH sibling store dir + fresh checkpoint over NEW
#   arrivals only → export_ivfpq_index_from_stream over [base, gen2].
#
# Re-keying under distribution drift is a separate, heavier pass:
# retrain_ann_store — new quantizers re-key EVERY stored code (PQ
# codes are lossy, so re-encoding needs the raw vectors, not the
# codes), deterministically equal to what the stream would have
# emitted had it always run with the new quantizers (pytest-pinned).


def compact_ann_store(
    spark: SparkSession,
    store_dir: str,
    checkpoint_dir: str | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    key: str = "neighbor_id",
) -> int:
    """Compact the streaming IVF-PQ code store: read the COMMITTED
    rows (spark.read on a file-sink dir resolves through
    _spark_metadata, so orphan files from aborted batches are
    excluded), drop replayed duplicates per `key` (the code store names the
    vector id neighbor_id, pq_encode's output column; the encode is a
    stateless deterministic map, so any duplicate row is bit-identical
    — arbitrary-winner dedup is exact), and rewrite into ~target-size
    files, replacing the store with a PLAIN parquet base (commit log
    retired; safety order: the compacted copy is fully written to a
    sibling tmp dir before the old store is removed — same recipe as
    compact_stream_store). If `checkpoint_dir` is given the stream's
    checkpoint is retired with it, closing the generation: the next
    ingest generation MUST use a fresh checkpoint and a fresh sibling
    store dir (a resumed file sink would otherwise start a new commit
    log that hides the compacted base from readers). Returns the
    output file count."""
    rows = spark.read.parquet(store_dir).dropDuplicates([key])

    jvm = spark._jvm  # public Hadoop FS API, same pattern as compact_files
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = hpath.getFileSystem(hconf)
    size, it = 0, fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        parent = status.getPath().getParent().getName()
        if not (
            name.startswith("_")
            or name.startswith(".")
            or parent == "_spark_metadata"
        ):
            size += status.getLen()
    n_files = max(1, -(-size // target_bytes))

    tmp = store_dir.rstrip("/") + "__compact_tmp"
    rows.repartition(n_files).write.mode("overwrite").parquet(tmp)
    fs.delete(hpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)
    if checkpoint_dir is not None:
        fs.delete(jvm.org.apache.hadoop.fs.Path(checkpoint_dir), True)
    return n_files


def retrain_ann_store(
    spark: SparkSession,
    train_sf_dir: str,
    corpus_dirs: list[str],
    store_dir: str,
    glob: str = "*.parquet",
) -> None:
    """RE-KEY the code store under new quantizers (the drift answer):
    train coarse centroids + residual sub-codebooks on `train_sf_dir`
    (the memoized deterministic trainers — same corpus in, bit-same
    quantizers out), batch re-ENCODE every raw corpus vector from
    `corpus_dirs` (codes are lossy; re-keying reads the vectors, never
    the old codes), and atomically replace the store. The encode is
    the SAME expression tree the stream runs (streaming_ivfpq_encode
    on a batch frame), so the replacement store is bit-identical to
    what a stream that had always run with the new quantizers would
    have accumulated — mid-stream retraining without this full re-key
    would silently mix two incompatible code spaces (the reason
    streaming_ivfpq_encode_store freezes its quantizers).

    One corpus scan, map-only encode, one store-sized write; the
    export/publish pass afterwards is unchanged."""
    from mimir_spark.operators.ivfpq import _residual_codebooks
    from mimir_spark.operators.similarity import _ivf_centroids

    cent_rows = _ivf_centroids(spark, train_sf_dir).collect()
    books = _residual_codebooks(spark, train_sf_dir)
    corpus = spark.read.schema(SCHEMAS["embeddings"]).option(
        "pathGlobFilter", glob
    ).parquet(*corpus_dirs)
    codes = streaming_ivfpq_encode(corpus, cent_rows, books)

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = hpath.getFileSystem(hconf)
    tmp = store_dir.rstrip("/") + "__rekey_tmp"
    codes.write.mode("overwrite").parquet(tmp)
    fs.delete(hpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)


def streaming_sq_encode(emb_stream: DataFrame, bounds_row) -> DataFrame:
    """Streaming twin of the SQ8 encode (operators.pq.sq_encode): the
    per-dim (min, max) bounds are FROZEN index metadata — derived once
    from the static base corpus, like the PQ codebooks above
    (per-batch re-derived bounds would re-key every previously
    encoded vector AND depend on arrival order) — so encoding is a
    stateless map: normalize, clamp-floor against the frozen edges.
    Arriving vectors outside the base range clamp into the edge codes
    (code 0 / 255), exactly what the batch encode would assign them.
    Append mode, no watermark, no state.

    ``bounds_row`` is one Row/dict with mn0..mx63 (sq_bounds output,
    collected once — 128 doubles of metadata)."""
    import numpy as np
    import pandas as pd

    from mimir_spark.operators.pq import DIM, SQ_LEVELS

    mns = np.array([bounds_row[f"mn{d}"] for d in range(DIM)])
    mxs = np.array([bounds_row[f"mx{d}"] for d in range(DIM)])
    spans = mxs - mns
    safe = np.where(spans == 0.0, 1.0, spans)

    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
    pts = emb_stream.select(
        "vec_id", F.transform(e, lambda x: x / norm).alias("e")
    )

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

    return pts.mapInPandas(_encode, "neighbor_id long, code array<long>")
