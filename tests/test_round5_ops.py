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
