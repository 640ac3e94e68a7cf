"""Round-3 operators: quality filtering/selection, collocation stats,
outlier scan, prefix/containment dedup, range search, exact kNN graph.

The DuckDB value-parity for each lives in test_oracle_parity; these
tests pin per-operator semantics a SQL oracle can't (NumPy-exact kNN,
losslessness of the tiled top-k, plan shapes)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mimir_spark.operators import corpus, dedup, features, quality, similarity
from mimir_spark.plans.checks import assert_no_cartesian, formatted_plan
from mimir_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_gopher_flags_consistent(spark, sf_smoke):
    rows = quality.gopher_quality_filter(spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        for f in (
            r.flag_word_count,
            r.flag_mean_word_len,
            r.flag_symbol_ratio,
            r.flag_alpha_words,
            r.flag_stopwords,
            r.passes_gopher,
        ):
            assert f in (0, 1)
        assert r.passes_gopher == (
            r.flag_word_count
            * r.flag_mean_word_len
            * r.flag_symbol_ratio
            * r.flag_alpha_words
            * r.flag_stopwords
        )
        assert 0.0 <= r.symbol_ratio <= 1.0
        assert 0.0 <= r.alpha_word_ratio <= 1.0


def test_quality_topk_select_bounds(spark, sf_smoke):
    rows = quality.quality_topk_select(spark, sf_smoke, k=5).collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    for members in per_lang.values():
        assert len(members) <= 5
        members.sort(key=lambda r: r.rk)
        # rank order must agree with (quality desc, doc_id)
        for a, b in zip(members, members[1:]):
            assert (a.quality, -a.doc_id) >= (b.quality, -b.doc_id)


def test_zipf_slope_negative(spark, sf_smoke):
    for r in quality.zipf_slope(spark, sf_smoke).collect():
        assert r.slope < 0, r  # rank-frequency always decays
        assert r.n_words >= 1


def test_cooccurrence_pmi_definition(spark, sf_smoke):
    """Recompute PMI for one pair from raw bigram counts."""
    rows = corpus.cooccurrence_pmi(spark, sf_smoke).collect()
    assert rows and all(r.n_pair >= corpus.MIN_PAIR_COUNT for r in rows)
    docs = load_table(spark, sf_smoke, "documents")
    toks = [t for (txt,) in docs.select("text").collect() for t in txt.split()]
    # rebuild per-doc adjacency to avoid cross-doc bigrams
    bigrams = []
    for (txt,) in docs.select("text").collect():
        ws = txt.split()
        bigrams += list(zip(ws, ws[1:]))
    n = len(bigrams)
    r0 = rows[0]
    c12 = sum(1 for b in bigrams if b == (r0.w1, r0.w2))
    c1 = sum(1 for b in bigrams if b[0] == r0.w1)
    c2 = sum(1 for b in bigrams if b[1] == r0.w2)
    assert c12 == r0.n_pair
    assert abs(np.log(c12 * n / (c1 * c2)) - r0.pmi) < 1e-5


def test_anomaly_zscore_threshold(spark, sf_smoke):
    rows = features.anomaly_zscore(spark, sf_smoke).collect()
    assert all(abs(r.z) >= features.Z_THRESHOLD for r in rows)


def test_dedup_prefix_groups(spark, sf_smoke):
    """Every reported group: survivor really is the min doc_id of a
    prefix-equal set of the claimed size."""
    out = {r.doc_id: r.n_dups for r in dedup.dedup_prefix(spark, sf_smoke).collect()}
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    groups: dict[str, list[int]] = {}
    for r in docs:
        groups.setdefault(" ".join(r.text.split()[:8]), []).append(r.doc_id)
    expect = {
        min(ids): len(ids) for ids in groups.values() if len(ids) >= 2
    }
    assert out == expect


def test_dedup_containment_dominates_jaccard(spark, sf_smoke):
    """Containment ≥ Jaccard for the same pair, so every Jaccard-0.8
    pair must appear in the containment-0.8 output."""
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup.dedup_containment(spark, sf_smoke, threshold=0.8).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard(spark, sf_smoke).collect()
        if r.jaccard >= 0.8
    }
    for pair, j in jac.items():
        assert pair in cont and cont[pair] >= j - 1e-9


def _np_cosine_table(emb_rows):
    ids = np.array([r.vec_id for r in emb_rows], dtype=np.int64)
    E = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    return ids, np.round(En @ En.T, 6)


def test_ann_range_search_matches_numpy(spark, sf_smoke):
    emb_rows = load_table(spark, sf_smoke, "embeddings").collect()
    ids, S = _np_cosine_table(emb_rows)
    t = similarity.RANGE_THRESHOLD
    expect = set()
    for qi, qid in enumerate(ids):
        if qid >= similarity.N_QUERIES:
            continue
        for ni, nid in enumerate(ids):
            if nid != qid and S[qi, ni] >= t:
                expect.add((qid, nid))
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_range_search(spark, sf_smoke).collect()
    }
    assert got == expect


def test_knn_graph_matches_numpy_exact(spark, sf_smoke):
    """The tiled-GEMM kNN must equal NumPy all-pairs kNN row for row —
    bucket-local top-k pruning is lossless."""
    emb_rows = load_table(spark, sf_smoke, "embeddings").collect()
    ids, S = _np_cosine_table(emb_rows)
    k = similarity.KNN_K
    expect = set()
    for i, vid in enumerate(ids):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-S[i, j], ids[j]),
        )[:k]
        for rank, j in enumerate(order, start=1):
            expect.add((vid, ids[j], S[i, j], rank))
    got = {
        (r.vec_id, r.neighbor_id, r.cos, r.rank)
        for r in similarity.knn_graph(spark, sf_smoke).collect()
    }
    assert got == expect


def test_knn_graph_plan_no_cartesian(spark, sf_smoke):
    df = similarity.knn_graph(spark, sf_smoke)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    # replication rides a broadcast of the tiny bucket map, never a
    # shuffle of the n² pair table
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ann_range_search_plan_no_join(spark, sf_smoke):
    plan = formatted_plan(similarity.ann_range_search(spark, sf_smoke))
    assert "Join" not in plan, plan  # one scan + mapInPandas, no joins


def test_gopher_filter_single_scan(spark, sf_smoke):
    plan = formatted_plan(quality.gopher_quality_filter(spark, sf_smoke))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "Exchange" not in plan, plan  # map-only pass
    # the tokenization must stay materialized in its own layer, not be
    # re-inlined into every flag (HOFs run outside codegen's CSE)
    assert plan.count("split(text") <= 2, plan


def test_minhash_containment_recovers_exact(spark, sf_smoke):
    """The sketch containment must recover every exact-containment
    pair whose Jaccard is in the LSH banding's target range (≥ 0.5),
    with the estimate within the O(1/√128) noise bound."""
    exact = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup.dedup_containment(spark, sf_smoke, threshold=0.8).collect()
    }
    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, sf_smoke, threshold=0.5).collect()
    }
    est = {
        (r.doc_a, r.doc_b): r.containment_est
        for r in dedup.minhash_containment(spark, sf_smoke, threshold=0.5).collect()
    }
    expected = set(exact) & jac
    assert expected, "test corpus should contain containment pairs in LSH range"
    for pair in expected:
        assert pair in est, f"missed containment pair {pair}"
        assert abs(est[pair] - exact[pair]) <= 0.2, (pair, est[pair], exact[pair])
    for pair, v in est.items():
        assert 0.0 <= v <= 1.0


def test_dedup_span_removal_semantics(spark, sf_smoke):
    """Duplicated spans are cut everywhere but their first occurrence;
    clean docs pass through verbatim (modulo whitespace collapse)."""
    from mimir_spark.operators.dedup import dedup_span_removal

    out = {r.doc_id: r for r in dedup_span_removal(spark, sf_smoke).collect()}
    assert len(out) == 500
    removed = [r for r in out.values() if r.n_removed > 0]
    assert removed, "synthetic corpus contains near-dups; some spans must go"
    # the canonical copy survives: total removal across the corpus is
    # strictly less than total tokens of duplicated docs
    assert all(r.n_removed < r.n_tokens or r.cleaned_text == ""
               for r in out.values())
    # untouched docs reassemble to their exact token stream
    from mimir_spark.sources.tables import load_table
    from pyspark.sql import functions as F
    docs = {r.doc_id: r.text for r in
            load_table(spark, sf_smoke, "documents").collect()}
    clean = next(r for r in out.values() if r.n_removed == 0)
    assert clean.cleaned_text == " ".join(docs[clean.doc_id].split())


# ---- Gopher repetition rules (round 11) -----------------------------------


def test_repetition_stats_hand_computed():
    from mimir_spark.operators.quality import repetition_stats

    # "a b" occurs 3x out of 5 bigrams; chars = 2, total = 6
    s = repetition_stats("a b a b a b")
    assert s["top2_frac"] == (3 * 2) / 6
    # the repeated 5-gram covers 10 of 11 positions
    t = "one two three four five x one two three four five"
    s = repetition_stats(t)
    total = sum(len(w) for w in t.split())
    covered = total - 1  # only 'x' uncovered
    assert s["dup5_frac"] == covered / total
    # no 6-gram repeats in that text
    assert s["dup6_frac"] == 0.0
    # empty / short docs: all zero
    assert all(v == 0.0 for v in repetition_stats("").values())
    assert all(v == 0.0 for v in repetition_stats("solo").values())


def test_repetition_top_tie_takes_longest():
    """Two bigrams tie at count 2: the fraction uses the LONGER one's
    chars (the (count, chars) maximum, no lexicographic dependence)."""
    from mimir_spark.operators.quality import repetition_stats

    s = repetition_stats("aa bbbb aa bbbb x y")
    total = 2 + 4 + 2 + 4 + 1 + 1
    # 'aa bbbb' count 2 chars 6; 'bbbb aa' count 1 — top = 2*6
    assert s["top2_frac"] == (2 * 6) / total


def test_repetition_oracle_sql_matches_kernel_on_crafted_docs():
    """The DuckDB oracle's coverage path (dup5..10 > 0) agrees with
    the Python kernel on crafted repetitive docs — the real corpus has
    zero dup5+ mass, so this is the only exercise of that SQL path."""
    import duckdb

    import __spark_entry__ as entrymod
    from mimir_spark.operators.quality import (
        REPETITION_THRESHOLDS,
        repetition_stats,
    )

    docs = [
        (1, "a b a b a b"),
        (2, "one two three four five x one two three four five"),
        (3, "p q r s t u v p q r s t u v p q r s t u v"),  # 7-gram x3
        (4, "unique words only here never repeating anything at all"),
        (5, ""),
        (6, "w " * 30),  # one token repeated: every n covers all
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") AS v(doc_id, text)"
    )
    sql = entrymod.oracle_sql()["gopher_repetition_filter"]
    got = {
        r[0]: r[1:]
        for r in con.execute(
            "SELECT * FROM (" + sql + ") ORDER BY doc_id"
        ).fetchall()
    }
    for doc_id, text in docs:
        stats = repetition_stats(text)
        expect = [round(stats[name], 6) for name, _ in REPETITION_THRESHOLDS]
        expect_pass = int(
            all(
                round(stats[name], 6) <= thr
                for name, thr in REPETITION_THRESHOLDS
            )
        )
        assert list(got[doc_id])[:-1] == expect, (doc_id, got[doc_id])
        assert got[doc_id][-1] == expect_pass


def test_repetition_filter_matches_per_doc_recompute(spark):
    from mimir_spark.operators.quality import (
        REPETITION_THRESHOLDS,
        gopher_repetition_filter,
        repetition_stats,
    )

    import pandas as pd

    got = {
        r["doc_id"]: r
        for r in gopher_repetition_filter(spark, SF_SMOKE).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "text"]]
    assert len(got) == len(pdf)
    n_fail = 0
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        stats = repetition_stats(text)
        for name, thr in REPETITION_THRESHOLDS:
            assert got[doc_id][name] == round(stats[name], 6)
        n_fail += 1 - got[doc_id]["pass"]
    assert n_fail > 0  # the gate actually fires on this corpus
