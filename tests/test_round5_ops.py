"""Round-5 operators: asymmetric containment LSH."""

from __future__ import annotations

from mimir_spark.operators import dedup, dedup2


def _paragraph_in_book_corpus(spark):
    """100 filler docs (globally unique words — no cross-doc shingles)
    plus 5 (book, paragraph) pairs: each paragraph is a CONSECUTIVE
    12-word substring of its 100-word book, so containment = 1.0 while
    Jaccard ~ 0.1 — far below the symmetric Jaccard banding
    threshold."""
    rows = []
    for d in range(100):
        rows.append((d, " ".join(f"w{d}x{k}" for k in range(60))))
    for p in range(5):
        book_id, para_id = 200 + p, 300 + p
        book_words = [f"b{p}x{k}" for k in range(100)]
        rows.append((book_id, " ".join(book_words)))
        rows.append((para_id, " ".join(book_words[40:52])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_lsh_catches_paragraph_in_book(spark):
    docs = _paragraph_in_book_corpus(spark)
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup2.containment_lsh_pairs(docs, threshold=0.8).collect()
    }
    want_pairs = {(200 + p, 300 + p) for p in range(5)}
    assert want_pairs <= set(got), got
    for pair in want_pairs:
        assert got[pair] == 1.0
    # no filler-doc false pairs survive exact verification
    assert all(a >= 200 for a, _ in got), got


def test_symmetric_banding_misses_paragraph_in_book(spark):
    """The reason the asymmetric path exists: the Jaccard-tuned
    symmetric banding (4 rows/band, S-curve threshold ~0.42) cannot
    surface J~0.1 containment pairs — per-pair catch probability
    1-(1-J^4)^32 ~ 0.003. Deterministic here: signatures are seeded,
    so the candidate set is a fixed function of the corpus."""
    docs = _paragraph_in_book_corpus(spark)
    sig = dedup._minhash_signatures(docs)
    cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidates(sig).select("doc_a", "doc_b").collect()
    }
    want_pairs = {(200 + p, 300 + p) for p in range(5)}
    assert not (want_pairs & cand), (
        "symmetric banding unexpectedly caught a containment pair — "
        "if the banding config changed, re-derive this test's premise"
    )


def test_containment_lsh_recall_floor(spark, sf_smoke):
    rows = dedup2.containment_lsh_recall(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.precision == 1.0  # exact verification
    assert r.recall >= 0.9, r


def test_containment_lsh_no_cartesian(spark, sf_smoke):
    """Every candidate join must be an equi-join on (band, bucket) —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere (the class
    restriction is a filter on equi-join output, not a theta join)."""
    from mimir_spark.plans.checks import formatted_plan

    plan = formatted_plan(dedup2.dedup_containment_lsh(spark, sf_smoke))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rank_quantiles_is_take_ordered(spark, sf_smoke):
    """The bottom-k scan must plan as distributed TakeOrdered
    (per-partition k-heaps), never a global sort of the corpus."""
    from mimir_spark.operators.sketches import rank_quantiles
    from mimir_spark.plans.checks import formatted_plan

    plan = formatted_plan(rank_quantiles(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan, plan


def test_assignment_has_no_cells_fanout(spark, sf_smoke):
    """assign_nearest_cell is map-only: the semdedup plan must contain
    no join between the corpus and the centroid table (the round-4
    formulation was a no-condition broadcast join — a x|cells| row
    fan-out)."""
    from mimir_spark.plans.checks import formatted_plan

    plan = formatted_plan(dedup2.semdedup(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rank_quantiles_partition_invariance(spark, sf_smoke):
    """The sketch's whole claim: the sample is a pure function of the
    data SET. A sibling session with a prime, tiny shuffle partition
    count must produce identical estimates."""
    from mimir_spark.operators.sketches import rank_quantiles

    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    base = {tuple(r) for r in rank_quantiles(spark, sf_smoke).collect()}
    alt = {tuple(r) for r in rank_quantiles(odd, sf_smoke).collect()}
    assert base == alt and base


def test_containment_lsh_partition_invariance(spark, sf_smoke):
    """Signatures, banding, and exact verification are all
    deterministic per data set — partitioning must not leak into the
    pair set."""
    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    base = {
        tuple(r) for r in dedup2.dedup_containment_lsh(spark, sf_smoke).collect()
    }
    alt = {
        tuple(r) for r in dedup2.dedup_containment_lsh(odd, sf_smoke).collect()
    }
    assert base == alt and base


def test_weighted_jaccard_python_reference(spark, sf_smoke):
    """Exact weighted Jaccard pinned against a pure-Python multiset
    computation over positional 3-word shingles."""
    from collections import Counter

    from mimir_spark.operators import weighted
    from mimir_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_smoke, "documents").collect()
    }

    def shingles(text):
        t = text.split()
        if len(t) < 3:
            return Counter([" ".join(t)])
        return Counter(
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        )

    sh = {d: shingles(t) for d, t in docs.items()}
    want = {}
    ids = sorted(sh)
    # restrict the O(n^2) reference to docs sharing any shingle
    from collections import defaultdict

    by_g = defaultdict(set)
    for d, c in sh.items():
        for g in c:
            by_g[g].add(d)
    cand = {
        (a, b)
        for ds in by_g.values()
        for a in ds
        for b in ds
        if a < b
    }
    for a, b in cand:
        ca, cb = sh[a], sh[b]
        wmin = sum(min(ca[g], cb[g]) for g in ca.keys() & cb.keys())
        na, nb = sum(ca.values()), sum(cb.values())
        j = round(wmin / (na + nb - wmin), 6)
        if j >= 0.5:
            want[(a, b)] = j
    got = {
        (r.doc_a, r.doc_b): r.wjaccard
        for r in weighted.dedup_weighted_jaccard(spark, sf_smoke).collect()
    }
    assert got == want and got


def test_icws_collision_probability_matches_wjaccard(spark, sf_smoke):
    """The ICWS identity: two docs' signatures agree per position with
    probability exactly J_w. Over the known near-dup pairs, the
    empirical agreement fraction must sit within the binomial noise of
    the exact J_w (128 hashes → s.e. ≤ 0.045; bound mean |err| 0.06,
    max 0.15)."""
    from mimir_spark.operators import weighted
    from mimir_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    wc = weighted._weighted_sets(docs)
    sigs = {
        r.doc_id: (r.sig_g, r.sig_t)
        for r in weighted.icws_signatures(wc).collect()
    }
    exact = weighted.dedup_weighted_jaccard(spark, sf_smoke).collect()
    errs = []
    for r in exact:
        ga, ta = sigs[r.doc_a]
        gb, tb = sigs[r.doc_b]
        agree = sum(
            1
            for x in zip(ga, ta, gb, tb)
            if x[0] == x[2] and x[1] == x[3]
        )
        errs.append(abs(agree / len(ga) - r.wjaccard))
    assert errs
    assert max(errs) <= 0.15, errs
    assert sum(errs) / len(errs) <= 0.06, errs


def test_icws_recall_floor(spark, sf_smoke):
    from mimir_spark.operators import weighted

    r = weighted.icws_recall(spark, sf_smoke).collect()[0]
    assert r.precision == 1.0
    assert r.recall >= 0.9, r


def test_icws_partition_invariance(spark, sf_smoke):
    """ICWS randomness is counter-based per (element, hash): the
    signature — and the verified pair set — is a pure function of each
    document's weighted set, never of partitioning."""
    from mimir_spark.operators import weighted

    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    base = {
        tuple(r) for r in weighted.dedup_icws(spark, sf_smoke).collect()
    }
    alt = {tuple(r) for r in weighted.dedup_icws(odd, sf_smoke).collect()}
    assert base == alt and base


def test_streaming_icws_matches_batch(spark, sf_smoke, tmp_path):
    """ICWS signatures and folded sets are pure functions of each
    document, and the probe-banding considers every pair in the first
    batch containing its later member — so the union of the pair logs
    must equal the batch dedup_icws pair set exactly."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F

    from mimir_spark.operators.weighted import dedup_icws
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.icws import streaming_icws_dedup

    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_icws_dedup(
        spark, flat, str(tmp_path / "store"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"), glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_a, r.doc_b, r.wjaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs"))
        .select("doc_a", "doc_b", "wjaccard")
        .collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.wjaccard)
        for r in dedup_icws(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_graph_twins_match_batch(spark, sf_smoke, tmp_path):
    """Incremental graph ingest: per-batch distinct edge partials +
    shared-core finalize must equal the batch k_core and
    label_propagation results exactly."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F

    from mimir_spark.operators import graph
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.graph import (
        finalize_k_core,
        finalize_label_propagation,
        streaming_graph_edges_build,
    )

    li = load_table(spark, sf_smoke, "lineitem")
    for m in range(3):
        li.filter(F.col("l_orderkey") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_graph_edges_build(
        spark, flat, str(tmp_path / "edges"), str(tmp_path / "ckpt"),
        glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()

    got_kc = {
        tuple(r) for r in finalize_k_core(spark, str(tmp_path / "edges")).collect()
    }
    want_kc = {tuple(r) for r in graph.k_core(spark, sf_smoke).collect()}
    assert got_kc == want_kc and got_kc

    got_lpa = {
        tuple(r)
        for r in finalize_label_propagation(
            spark, str(tmp_path / "edges")
        ).collect()
    }
    want_lpa = {
        tuple(r) for r in graph.label_propagation(spark, sf_smoke).collect()
    }
    assert got_lpa == want_lpa and got_lpa


def test_weighted_containment_lsh_catches_paragraph_in_book(spark):
    """Per-class ICWS banding must catch weighted-containment-1.0
    pairs whose weighted Jaccard (~0.1) sits far below the flat
    Jaccard-tuned ICWS banding threshold."""
    from mimir_spark.operators import weighted

    docs = _paragraph_in_book_corpus(spark)
    got = {
        (r.doc_a, r.doc_b): r.wcontainment
        for r in weighted.weighted_containment_pairs(
            docs, threshold=0.8
        ).collect()
    }
    want_pairs = {(200 + p, 300 + p) for p in range(5)}
    assert want_pairs <= set(got), got
    for pair in want_pairs:
        assert got[pair] == 1.0
    # flat Jaccard-tuned ICWS banding misses every planted pair
    wc = weighted._weighted_sets(docs)
    flat = {
        (r.doc_a, r.doc_b)
        for r in weighted.icws_candidates(
            weighted.icws_signatures(wc)
        ).collect()
    }
    assert not (want_pairs & flat), (
        "flat ICWS banding unexpectedly caught a containment pair — "
        "re-derive this test's premise if the banding config changed"
    )


def test_weighted_containment_lsh_recall_floor(spark, sf_smoke):
    from mimir_spark.operators import weighted

    r = weighted.weighted_containment_lsh_recall(spark, sf_smoke).collect()[0]
    assert r.precision == 1.0
    assert r.recall >= 0.9, r


def test_hard_negatives_exclude_positive_dups(spark, tmp_path):
    """The positive's near-duplicate must be dropped from the
    negative pool even when BM25 ranks it highly (it is a false
    negative), while lexically-close non-duplicates stay."""
    from mimir_spark.operators.retrieval import retrieval_hard_negatives

    base = "spark join window " * 4 + "alpha beta gamma delta " * 3
    near = "spark join window " * 4 + "alpha beta gamma delta " * 3 + "epsilon"
    other = "spark join window completely different tail content here"
    filler = "unrelated words about nothing relevant at all"
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, near, "en", "s", len(near)),
            (3, other, "en", "s", len(other)),
            (4, filler, "en", "s", len(filler)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(f"{d}/documents.parquet")
    from mimir_spark.operators.dedup import dedup_minhash_lsh
    from mimir_spark.operators.retrieval import bm25_topk

    pairs = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, d).collect()
    }
    assert (1, 2) in pairs  # the fixture's near-dup is actually caught
    top = {r.doc_id: r.rank for r in bm25_topk(spark, d).collect()}
    anchor = min(top, key=top.get)
    got = [r.doc_id for r in retrieval_hard_negatives(spark, d).collect()]
    assert anchor not in got
    partner = 2 if anchor == 1 else 1
    assert partner not in got
    assert 3 in got  # lexically close but not a duplicate → kept


def test_icws_store_compaction_mid_stream(spark, sf_smoke, tmp_path):
    """Compacting the signature store BETWEEN micro-batches must not
    change the final pair set: stop after two batches, compact (store
    collapses to one batch_id subdir), deliver the third batch on the
    same checkpoint, and the union of pair logs still equals the
    batch dedup_icws output."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F

    from mimir_spark.operators.weighted import dedup_icws
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.icws import (
        compact_icws_store,
        streaming_icws_dedup,
    )

    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    parts = sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(parts[:2]):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    store, pairs, ckpt = (
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    q = streaming_icws_dedup(
        spark, flat, store, pairs, ckpt, glob="batch_*.parquet"
    )
    q.processAllAvailable()
    q.stop()

    compact_icws_store(spark, store)
    subdirs = [
        d for d in os.listdir(store)
        if d.startswith("batch_id=") and os.path.isdir(f"{store}/{d}")
    ]
    assert len(subdirs) == 1, subdirs  # collapsed to one base dir

    shutil.copy(parts[2], f"{flat}/batch_2.parquet")
    q = streaming_icws_dedup(
        spark, flat, store, pairs, ckpt, glob="batch_*.parquet"
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_a, r.doc_b, r.wjaccard)
        for r in spark.read.parquet(pairs)
        .select("doc_a", "doc_b", "wjaccard")
        .collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.wjaccard)
        for r in dedup_icws(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_bm25_topk_batch_matches_single_query(spark, sf_smoke):
    """The batched operator restricted to one qid must be row-identical
    to the single-query path — same formula, same rounding, same
    tie-break."""
    from mimir_spark.operators.retrieval import (
        BM25_QUERY,
        bm25_topk,
        bm25_topk_batch,
    )

    batch = bm25_topk_batch(spark, sf_smoke)
    single = {
        (r.doc_id, r.score, r.rank)
        for r in bm25_topk(spark, sf_smoke).collect()
    }
    q0 = {
        (r.doc_id, r.score, r.rank)
        for r in batch.filter("query_id = 0")
        .select("doc_id", "score", "rank")
        .collect()
    }
    assert q0 == single and q0
    # the other queries produce rankings too (non-degenerate batch)
    assert batch.filter("query_id = 1").count() > 0
    assert batch.filter("query_id = 2").count() > 0
    # custom batch plumbing: a 1-query batch with different terms
    alt = bm25_topk_batch(
        spark, sf_smoke, queries=((7, ("vector", "scan")),), k=5
    )
    rows = alt.collect()
    assert rows and all(r.query_id == 7 and r.rank <= 5 for r in rows)


def test_phrase_search_semantics(spark, sf_smoke):
    """Phrase matches are CONSECUTIVE: every reported doc contains the
    exact token sequence, the count equals the Python-reference count,
    and docs with both words non-adjacent are excluded."""
    import re

    from mimir_spark.operators.retrieval import phrase_search
    from mimir_spark.sources.tables import load_table

    got = {
        (r.doc_id, r.n_matches)
        for r in phrase_search(spark, sf_smoke).collect()
    }
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    expect = {}
    for r in load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect():
        toks = [t for t in ws.split(r.text or "") if t]
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "hash" and toks[i + 1] == "join"
        )
        if n:
            expect[r.doc_id] = n
    assert got == set(expect.items()) and got

    # parameterized: a different phrase works through the same chain
    alt = phrase_search(spark, sf_smoke, phrase=("merge", "sort"))
    for r in alt.collect():
        assert r.n_matches >= 1


def test_hybrid_retrieval_batch_matches_single(spark, sf_smoke):
    """Restricted to query 0 with vec 0, the batched hybrid result
    must be row-identical to the single-query hybrid_retrieval."""
    from mimir_spark.operators.retrieval import (
        BM25_QUERY,
        hybrid_retrieval,
        hybrid_retrieval_batch,
    )

    batch = hybrid_retrieval_batch(
        spark, sf_smoke, queries=((0, BM25_QUERY, 0),)
    )
    got = {
        (r.doc_id, r.bm25_rank, r.cos, r.rank) for r in batch.collect()
    }
    single = {
        (r.doc_id, r.bm25_rank, r.cos, r.rank)
        for r in hybrid_retrieval(spark, sf_smoke).collect()
    }
    assert got == single and got


def test_phrase_search_batch_matches_single(spark, sf_smoke):
    """For EVERY batch phrase the data-driven batched operator must be
    row-identical to the per-phrase join chain (phrase_search), and a
    repeated-term phrase must count like the chain (the distinct-offset
    gate, not a bag count)."""
    from mimir_spark.operators.retrieval import (
        PHRASE_BATCH,
        phrase_search,
        phrase_search_batch,
    )

    batch = phrase_search_batch(spark, sf_smoke)
    rows = {(r.phrase_id, r.doc_id, r.n_matches) for r in batch.collect()}
    expect = set()
    for pid, phrase in PHRASE_BATCH:
        for r in phrase_search(spark, sf_smoke, phrase=phrase).collect():
            expect.add((pid, r.doc_id, r.n_matches))
    assert rows == expect and rows
    for pid, _ in PHRASE_BATCH:
        assert any(p == pid for p, _, _ in rows), pid

    # repeated-term phrase: the same posting row carries both offsets
    rep = (("the", "the"),)
    got = {
        (r.doc_id, r.n_matches)
        for r in phrase_search_batch(
            spark, sf_smoke, phrases=((7, rep[0]),)
        ).collect()
    }
    single = {
        (r.doc_id, r.n_matches)
        for r in phrase_search(spark, sf_smoke, phrase=rep[0]).collect()
    }
    assert got == single
