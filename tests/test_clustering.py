"""kmeans_embeddings pinned to an independent NumPy reference: same
seeds (k lowest vec_ids), same iteration count, same first-min
tie-break — cluster sizes must match exactly, inertia to 1e-2."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from mimir_spark.operators.clustering import K, N_ITERS, kmeans_embeddings


def _numpy_reference(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    X = np.array([np.array(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    order = np.argsort(ids)
    X = X[order]
    C = X[:K].copy()
    for _ in range(N_ITERS):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(K):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
        C = np.round(C, 9)  # mirrors the operator's per-round grid
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    a = d.argmin(1)
    return {
        c + 1: (int((a == c).sum()), float(d[a == c, c].sum()))
        for c in range(K)
        if (a == c).any()
    }


def test_kmeans_matches_numpy(spark, sf_smoke):
    expect = _numpy_reference(sf_smoke)
    got = {
        r.cluster_id: (r.n_points, r.inertia)
        for r in kmeans_embeddings(spark, sf_smoke).collect()
    }
    assert set(got) == set(expect)
    for c in got:
        assert got[c][0] == expect[c][0], f"cluster {c} size"
        assert abs(got[c][1] - expect[c][1]) < 1e-2, f"cluster {c} inertia"


def test_ivf_index_persist_and_query(spark, sf_smoke, tmp_path):
    """The persisted-index query path must (a) return exactly the
    in-memory IVF results and (b) read the assignments through
    partition pruning (PartitionFilters on cell_id), not a full scan."""
    from mimir_spark.operators.similarity import (
        ann_ivf_query_indexed,
        ann_ivf_topk,
        write_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    write_ivf_index(spark, sf_smoke, idx)
    got_df = ann_ivf_query_indexed(spark, sf_smoke, idx)
    got = {(r.query_id, r.neighbor_id, r.cos) for r in got_df.collect()}
    expect = {
        (r.query_id, r.neighbor_id, r.cos)
        for r in ann_ivf_topk(spark, sf_smoke).collect()
    }
    assert got == expect and got
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell_id" in plan, plan[:2000]


def test_star_cc_matches_label_propagation(spark, sf_smoke):
    """Star contraction and min-label propagation must produce the
    identical clustering on both pair sources."""
    from mimir_spark.operators.dedup import dedup_clusters, dedup_clusters_star

    for src in ("exact", "lsh"):
        a = {(r.doc_id, r.cluster_id)
             for r in dedup_clusters(spark, sf_smoke, pair_source=src).collect()}
        b = {(r.doc_id, r.cluster_id)
             for r in dedup_clusters_star(spark, sf_smoke, pair_source=src).collect()}
        assert a == b and a, src


def test_star_cc_long_path_converges_fast(spark):
    """A diameter-60 path must resolve to one component — the shape
    that makes label propagation pay 60 rounds; star contraction gets
    it in O(log n)."""
    from mimir_spark.operators.graph import connected_components_star

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    out = {(r.node, r.component)
           for r in connected_components_star(e).collect()}
    assert out == {(i, 0) for i in range(61)}


def test_embedding_pca_matches_numpy(spark, sf_smoke):
    """Distributed one-pass covariance must reproduce full-matrix
    NumPy PCA eigenvalues."""
    import numpy as np

    from mimir_spark.operators.clustering import embedding_pca
    from mimir_spark.sources.tables import load_table

    x = np.array(
        [r.embedding for r in
         load_table(spark, sf_smoke, "embeddings").collect()],
        dtype=np.float64,
    )
    cov = np.cov(x, rowvar=False, bias=True)
    expect = np.linalg.eigvalsh(cov)[::-1][:5]
    got = embedding_pca(spark, sf_smoke).orderBy("component").collect()
    for r, e in zip(got, expect):
        assert abs(r.eigenvalue - e) < 1e-4, (r, e)
    assert abs(sum(r.explained_variance for r in got)) <= 1.0 + 1e-6
