"""sequence_pack / dataset_mixture_plan invariants + the plan shape
that makes the prefix sum distributed (no per-language global window
over the document table)."""

from __future__ import annotations

import re

from mimir_spark.operators import packing
from mimir_spark.plans.checks import formatted_plan
from mimir_spark.sources.tables import load_table


def test_sequence_pack_is_contiguous_per_language(spark, sf_smoke):
    rows = packing.sequence_pack(spark, sf_smoke).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.start_tok == off, (lang, r)
            assert r.seq_id == r.start_tok // packing.SEQ_LEN
            if r.n_tokens == 0:
                assert r.n_seqs == 0
            else:
                last_tok = r.start_tok + r.n_tokens - 1
                assert r.n_seqs == last_tok // packing.SEQ_LEN - r.seq_id + 1
            off += r.n_tokens


def test_sequence_pack_matches_naive_window(spark, sf_smoke):
    """The two-level prefix sum equals the naive per-language running
    sum computed driver-side from the raw docs."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang", "text").collect()
    docs.sort(key=lambda r: r.doc_id)
    offs: dict[str, int] = {}
    expect = {}
    for r in docs:
        n = len([t for t in re.split(r"\s+", r.text) if t])
        expect[r.doc_id] = (offs.get(r.lang, 0), n)
        offs[r.lang] = offs.get(r.lang, 0) + n
    out = packing.sequence_pack(spark, sf_smoke).collect()
    assert len(out) == len(expect)
    for r in out:
        assert (r.start_tok, r.n_tokens) == expect[r.doc_id]


def test_sequence_pack_no_per_language_global_window(spark, sf_smoke):
    """The scale contract: every window over doc-level rows must be
    partitioned by (lang, bucket), never lang alone — a lang-only
    window funnels a whole language through one task. The only
    lang-partitioned window runs over the tiny bucket table."""
    plan = formatted_plan(packing.sequence_pack(spark, sf_smoke))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    doc_level = [s for s in specs if "doc_id#" in s]
    assert doc_level, "expected an intra-bucket window ordered by doc_id"
    for s in doc_level:
        assert "bucket#" in s, f"doc-level window not bucket-partitioned: {s}"


def test_dataset_mixture_plan_budget(spark, sf_smoke):
    rows = packing.dataset_mixture_plan(spark, sf_smoke).collect()
    assert len(rows) == 20
    total = sum(r.n_tokens for r in rows)
    budget = total * packing.MIX_BUDGET_NUM // packing.MIX_BUDGET_DEN
    assert sum(r.alloc_tokens for r in rows) <= budget
    for r in rows:
        assert 1 <= r.weight <= packing.N_WEIGHT_TIERS
        assert 0 < r.alloc_tokens <= r.n_tokens
        assert 0.0 < r.sample_rate <= 1.0
        # higher weight ⇒ no smaller uncapped allocation
    uncapped = [r for r in rows if r.alloc_tokens < r.n_tokens]
    for a in uncapped:
        for b in uncapped:
            if a.weight > b.weight:
                assert a.alloc_tokens >= b.alloc_tokens


from hypothesis import given, settings, strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # part key
        st.integers(min_value=0, max_value=5000),   # order key
        st.integers(min_value=0, max_value=300),    # value
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],
)


@settings(max_examples=5, deadline=None)
@given(rows_strategy)
def test_distributed_prefix_sum_property(spark, rows):
    """For arbitrary (part, order, value) rows — including empty
    buckets, single-row parts, and order gaps far beyond one bucket —
    the two-level prefix sum equals the naive per-part running sum."""
    df = spark.createDataFrame(rows, "part int, ord long, v long")
    got = {
        (r.part, r.ord): r.start
        for r in packing.distributed_prefix_sum(
            df, "part", "ord", "v", bucket_width=16
        ).collect()
    }
    expect = {}
    acc: dict[int, int] = {}
    for part, ordk, v in sorted(rows, key=lambda t: (t[0], t[1])):
        expect[(part, ordk)] = acc.get(part, 0)
        acc[part] = acc.get(part, 0) + v
    assert got == expect


def test_chunk_documents_covers_every_token(spark, sf_smoke):
    """Chunking invariants: every token position covered, overlap =
    chunk - stride between consecutive chunks, chunk text equals the
    token slice, and the whole thing is a map-only plan (no
    exchange)."""
    from mimir_spark.operators.packing import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )
    from mimir_spark.sources.tables import load_table

    out = chunk_documents(spark, sf_smoke)
    rows = out.collect()
    texts = {
        r["doc_id"]: r["text"].split()
        for r in load_table(spark, sf_smoke, "documents").collect()
    }
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, toks in texts.items():
        if not toks:
            assert doc_id not in per_doc
            continue
        chunks = sorted(per_doc[doc_id], key=lambda r: r.chunk_id)
        covered = set()
        for k, c in enumerate(chunks):
            assert c.chunk_id == k
            assert c.start_tok == 1 + k * CHUNK_STRIDE
            lo = c.start_tok - 1
            assert c.chunk_text == " ".join(toks[lo : lo + CHUNK_TOKENS])
            assert c.n_tokens == len(toks[lo : lo + CHUNK_TOKENS])
            covered.update(range(lo, lo + c.n_tokens))
        assert covered == set(range(len(toks))), doc_id
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
