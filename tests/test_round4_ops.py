"""Round-4 operators: prefix-filtered exact Jaccard join, ordered
funnel, CCNet ppl buckets, fixed-size reservoir sampling, local
clustering coefficient, k-core peel.

DuckDB value-parity lives in test_oracle_parity; these tests pin the
semantics a SQL oracle can't (exact-twin equality for the prefix
join, Python-reference funnels and graph stats, fixed-point k-core).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from mimir_spark.operators import dedup, dedup2, features, graph, pipeline, quality
from mimir_spark.sources.tables import load_table


def test_prefix_join_equals_self_join(spark, sf_smoke):
    """The prefix-filtered plan must reproduce the shingle self-join
    pair set EXACTLY (that's the prefix-filter lemma's promise)."""
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(spark, sf_smoke).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup2.dedup_jaccard_prefix(spark, sf_smoke).collect()
    }
    assert pref == exact and exact  # non-trivial on this corpus


def test_prefix_join_candidates_bounded(spark, sf_smoke):
    """Prefix filtering must consider FEWER candidate pairs than the
    full self-join's intersecting pairs (that's the point)."""
    docs = load_table(spark, sf_smoke, "documents")
    from mimir_spark.functions.text import word_shingles

    sets_rows = docs.select(
        "doc_id", word_shingles("text", dedup.SHINGLE_WORDS).alias("s")
    ).collect()
    sets = {r.doc_id: set(r.s) for r in sets_rows}
    ids = sorted(sets)
    full_candidates = sum(
        1
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if sets[a] & sets[b]
    )
    # reproduce the operator's candidate stage count via its own plan:
    # every emitted pair is a candidate, and the operator's verify step
    # only filters — so compare survivors to the all-intersecting count.
    n_pairs = dedup2.dedup_jaccard_prefix(spark, sf_smoke).count()
    assert n_pairs < full_candidates


def test_window_funnel_python_reference(spark, sf_smoke):
    from datetime import timedelta

    hour = timedelta(hours=1)
    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts"
    )
    by_user: dict[int, list] = defaultdict(list)
    for r in ev.collect():
        by_user[r.user_id].append((r.ts, r.event_type))
    expected = Counter()
    for uid, evts in by_user.items():
        views = [s for s, t in evts if t == "view"]
        steps = 0
        if views:
            steps = 1
            t1 = min(views)
            clicks = [
                s for s, t in evts if t == "click" and t1 < s <= t1 + hour
            ]
            if clicks:
                steps = 2
                t2 = min(clicks)
                if any(
                    t2 < s <= t1 + hour
                    for s, t in evts
                    if t == "purchase"
                ):
                    steps = 3
        expected[steps] += 1
    got = {
        r.n_steps: r.n_users
        for r in features.window_funnel(spark, sf_smoke).collect()
    }
    assert got == dict(expected)


def test_ccnet_buckets_split(spark, sf_smoke):
    rows = quality.ccnet_ppl_buckets(spark, sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents").count()
    assert len(rows) == docs
    per_lang: dict[str, list] = defaultdict(list)
    for r in rows:
        assert r.bucket in ("head", "middle", "tail")
        per_lang[r.lang].append(r)
    for members in per_lang.values():
        # head docs must have ce <= every tail doc's ce
        heads = [r.cross_entropy for r in members if r.bucket == "head"]
        tails = [r.cross_entropy for r in members if r.bucket == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails)
        # terciles are roughly balanced (threshold split, modulo ties)
        if len(members) >= 9:
            n = len(members)
            n_head = len(heads)
            assert 0 < n_head < n


def test_sample_reservoir_exact_k(spark, sf_smoke):
    k = 7
    rows = pipeline.sample_reservoir(spark, sf_smoke, k=k).collect()
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang")
    lang_sizes = Counter(r.lang for r in docs.collect())
    got_sizes = Counter(r.lang for r in rows)
    for lang, n in lang_sizes.items():
        assert got_sizes[lang] == min(k, n)
    # deterministic: selection = k smallest multiplicative hashes
    hashes = {
        r.doc_id: (r.doc_id * 2654435761) % 4294967296
        for r in docs.collect()
    }
    by_lang: dict[str, list] = defaultdict(list)
    for r in docs.collect():
        by_lang[r.lang].append(r.doc_id)
    for lang, ids in by_lang.items():
        want = set(sorted(ids, key=lambda d: (hashes[d], d))[:k])
        got = {r.doc_id for r in rows if r.lang == lang}
        assert got == want


def test_semdedup_kernel_reference(spark, sf_smoke):
    """Recompute each cell's max-sim-to-prior with NumPy from the raw
    embeddings — validates the per-cell kernel independently of the
    centroid-assignment rule."""
    import numpy as np

    rows = dedup2.semdedup(spark, sf_smoke).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_smoke, "embeddings").collect()
    }
    assert len(rows) == len(emb)
    cells: dict[int, list] = defaultdict(list)
    for r in rows:
        cells[r.cell].append(r)
    for members in cells.values():
        members.sort(key=lambda r: r.vec_id)
        E = np.array([emb[r.vec_id] for r in members])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        S = np.round(En @ En.T, 6)
        for i, r in enumerate(members):
            want = float(S[i, :i].max()) if i else -1.0
            assert abs(r.max_sim_prior - want) < 1e-9
            assert r.is_dup == int(want >= dedup2.SEMDEDUP_THRESHOLD)


def _edge_set(spark, sf_smoke):
    return {
        (r.u, r.v)
        for r in graph._part_cooccurrence_edges(spark, sf_smoke).collect()
    }


def test_clustering_coefficient_reference(spark, sf_smoke):
    edges = _edge_set(spark, sf_smoke)
    adj: dict[int, set] = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    rows = graph.clustering_coefficient(spark, sf_smoke).collect()
    assert len(rows) == len(adj)
    for r in rows:
        nbrs = adj[r.node]
        assert r.degree == len(nbrs)
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and (min(a, b), max(a, b)) in edges
        )
        assert r.n_triangles == tri
        if r.degree >= 2:
            want = round(2.0 * tri / (r.degree * (r.degree - 1)), 6)
            assert abs(r.lcc - want) < 1e-9
        else:
            assert r.lcc == 0.0


def test_k_core_fixed_point(spark, sf_smoke):
    # default graph (bipartite order-part, k=6): sf0.001 peels in ~6
    # cascading rounds, so the loop's re-peel logic is exercised
    k = 6
    edges = {
        (r.l_orderkey * 2, r.l_partkey * 2 + 1)
        for r in spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    }
    # brute-force peel
    adj: dict[int, set] = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    rows = graph.k_core(spark, sf_smoke, k=k).collect()
    got = {r.node: r.degree_in_core for r in rows}
    want = {n: len(ns) for n, ns in adj.items()}
    assert got == want
    assert all(d >= k for d in got.values()) or not got


def test_k_core_unconverged_raises(spark):
    """A path graph peels one layer per round from each end; with
    max_iters too small for the peel depth the result would not be a
    k-core, so the operator must raise instead of returning it."""
    path = [(i, i + 1) for i in range(12)]
    edf = spark.createDataFrame(path, "u long, v long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.k_core_edges(edf, k=2, max_iters=2)


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by a single bridge edge must resolve to
    two communities (each clique's min node id)."""
    edges = []
    for base in (0, 10):
        ids = [base + i for i in range(4)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges.append((3, 10))  # bridge
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.community
        for r in graph._label_propagation(edf, iters=5).collect()
    }
    assert set(got) == {0, 1, 2, 3, 10, 11, 12, 13}
    left = {got[n] for n in (0, 1, 2)}
    right = {got[n] for n in (11, 12, 13)}
    assert left == {0}
    assert right == {10}
    assert len(set(got.values())) == 2


def test_label_propagation_runs_on_part_graph(spark, sf_smoke):
    rows = graph.label_propagation(spark, sf_smoke).collect()
    nodes = {r.node for r in rows}
    n_comm = len({r.community for r in rows})
    assert rows and 1 <= n_comm <= len(nodes)
    # every community label is itself a node id
    assert {r.community for r in rows} <= nodes


def test_bm25_python_reference(spark, sf_smoke):
    import math

    from mimir_spark.operators import retrieval

    docs = {
        r.doc_id: r.text.split()
        for r in load_table(spark, sf_smoke, "documents").collect()
    }
    n_docs = len(docs)
    avgdl = round(sum(len(t) for t in docs.values()) / n_docs, 6)
    terms = retrieval.BM25_QUERY
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1)
            s += idf * tf * (retrieval.BM25_K1 + 1) / (
                tf
                + retrieval.BM25_K1
                * (1 - retrieval.BM25_B + retrieval.BM25_B * len(toks) / avgdl)
            )
        if s:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.doc_id, r.score)
        for r in retrieval.bm25_topk(spark, sf_smoke).orderBy("rank").collect()
    ]
    assert got == want


def test_dedup_method_agreement_consistency(spark, sf_smoke):
    rows = dedup2.dedup_method_agreement(spark, sf_smoke).collect()
    assert len(rows) == 6  # C(4,2) method pairs
    by_pair = {(r.method_a, r.method_b): r for r in rows}
    for r in rows:
        assert r.method_a < r.method_b
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.pair_jaccard <= 1.0
    # prefix join IS the exact jaccard pair set — agreement must be total
    r = by_pair[("jaccard", "prefix")]
    assert r.n_a == r.n_b == r.n_common and r.pair_jaccard == 1.0


def test_containment_prefix_equals_self_join(spark, sf_smoke):
    """Asymmetric prefix filtering must reproduce the containment
    self-join pair set exactly (the one-sided lemma's promise)."""
    exact = {
        (r.doc_a, r.doc_b, r.containment)
        for r in dedup.dedup_containment(spark, sf_smoke).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.containment)
        for r in dedup2.dedup_containment_prefix(spark, sf_smoke).collect()
    }
    assert pref == exact and exact


def test_table_profile_reference(spark, sf_smoke):
    from mimir_spark.operators.profiling import table_profile

    li = load_table(spark, sf_smoke, "lineitem")
    rows = {r.column: r for r in table_profile(spark, sf_smoke).collect()}
    assert set(rows) == set(li.columns)
    n = li.count()
    import pyspark.sql.functions as F

    for c in ("l_orderkey", "l_returnflag"):
        r = rows[c]
        assert r.n_rows == n and r.n_nulls == 0
        assert r.n_distinct == li.select(c).distinct().count()


def test_rfm_segments_partition_users(spark, sf_smoke):
    rows = features.rfm_segmentation(spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    n_buyers = (
        ev.filter(ev.event_type == "purchase").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_buyers
    for r in rows:
        assert r.r_high in (0, 1) and r.f_high in (0, 1) and r.m_high in (0, 1)
        assert r.n_users > 0


def test_embedding_clusters_union_find(spark, sf_smoke):
    """Clusters must equal a Python union-find over the exact cosine
    pair set (min component member as label)."""
    pairs = [
        (r.id_a, r.id_b)
        for r in dedup.dedup_embedding(spark, sf_smoke).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    want = {n: find(n) for n in parent}
    got = {
        r.vec_id: r.cluster_id
        for r in dedup2.embedding_clusters(spark, sf_smoke).collect()
    }
    assert got == want and got


def test_lsh_tuning_curve_sanity(spark, sf_smoke):
    """More rows per band → stricter curve → lower expected recall on
    the same pair population; the deployed config (32 bands × 4 rows)
    must sit near the measured minhash recall."""
    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in dedup2.lsh_tuning_curve(spark, sf_smoke).collect()
    }
    assert set(rows) == {(8, 16), (16, 8), (32, 4), (64, 2)}
    recalls = [rows[k].expected_recall for k in [(64, 2), (32, 4), (16, 8), (8, 16)]]
    assert recalls == sorted(recalls, reverse=True)  # permissive → strict
    for r in rows.values():
        assert 0.0 <= r.expected_recall <= 1.0
        assert abs(r.s_curve_threshold - (1 / r.n_bands) ** (1 / r.rows_per_band)) < 1e-6
    # deployed config catches J>=0.5 pairs with high probability
    assert rows[(32, 4)].expected_recall > 0.9
