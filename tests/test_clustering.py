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
