"""Round-10 pins: the three ADVICE fixes.

1. PassJoin short-doc escape hatch — docs with len ≤ K break the
   pigeonhole lemma (all nonempty chunks destructible), so they route
   through a direct broadcast verify; the pair set must stay EXACT on
   corpora full of tiny strings.
2. approx_quantiles rank-band — the within flags are now a true-rank
   envelope, deterministically 1 at any group size (the old value band
   collapsed below ~1/δ rows per group).
3. anomaly_mad zero-MAD groups — ≥50% identical values made the robust
   z NULL and silently unflagged arbitrarily extreme rows; now every
   off-median row of a zero-MAD group is flagged with the finite
   ±RZ_INF sentinel, on both engines.
"""

from __future__ import annotations

import itertools
import os

import duckdb
import numpy as np
import pandas as pd


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _write_documents(path: str, rows: list[tuple[int, str]]) -> str:
    os.makedirs(path, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "crafted",
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(f"{path}/documents.parquet")
    return path


def test_passjoin_short_docs_exact(spark, tmp_path):
    """Corpus dominated by len ≤ 2K strings (including empty / 1-char /
    exactly-K / exactly-K+1): the pair set must equal brute force.
    Before the short-doc path, every pair whose both sides were ≤ K
    chars was silently missing."""
    from mimir_spark.operators.editdist import dedup_edit_distance

    rows = [
        (0, ""),
        (1, "a"),
        (2, "ab"),
        (3, "abcdefg"),          # len 7
        (4, "abcdefgh"),         # len 8 == K (short side boundary)
        (5, "abcdefghi"),        # len 9 == K+1 (PassJoin side boundary)
        (6, "abcdxfghi"),        # 1 sub from doc 5
        (7, "zyxwvu"),           # len 6, far from the abc family
        (8, "abcdefghijklmnop"),  # len 16 == 2K
        (9, "abcdefghijklmnopq"),  # len 17 == 2K+1 (outside short compat)
        (10, "qqqqqqqq"),        # len 8, all-distinct content
        (11, "qqqqqqq"),         # len 7, 1 del from doc 10
        (12, "mmmmmmmmmmmmmmmmmmmmmmmmmmmmmm"),  # len 30, long-long pair
        (13, "mmmmmmmmmmmmmmmmmmmmmmmmmmmmmmmm"),  # len 32
    ]
    sf = _write_documents(str(tmp_path / "short"), rows)
    got = {
        (r.doc_a, r.doc_b, r.edit_distance)
        for r in dedup_edit_distance(spark, sf).collect()
    }
    expect = {
        (ia, ib, _lev(ta, tb))
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2)
        if _lev(ta, tb) <= 8
    }
    assert got == expect
    # the regression class is actually exercised: short-short pairs exist
    assert any(
        len(rows[a][1]) <= 8 and len(rows[b][1]) <= 8 for a, b, _ in expect
    )


def test_passjoin_short_docs_streaming(spark, tmp_path):
    """The streaming twin shares edit_pairs, so incremental arrival of
    short docs must accumulate the same exact pair set."""
    from mimir_spark.operators.editdist import dedup_edit_distance
    from mimir_spark.streaming.editdist import streaming_edit_dedup

    rows = [
        (0, "a"),
        (1, "ab"),
        (2, "abcdefgh"),
        (3, "abcdefghi"),
        (4, "abcdxfghi"),
        (5, ""),
    ]
    sf = _write_documents(str(tmp_path / "batchref"), rows)

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    for i, chunk in enumerate([rows[:2], rows[2:4], rows[4:]]):
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in chunk],
                "text": [r[1] for r in chunk],
                "lang": "en",
                "source": "crafted",
                "n_chars": [len(r[1]) for r in chunk],
            }
        ).to_parquet(f"{in_dir}/part{i}.parquet")
    q = streaming_edit_dedup(
        spark,
        in_dir,
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.doc_a, r.doc_b, r.edit_distance)
        for r in spark.read.parquet(str(tmp_path / "pairs")).select(
            "doc_a", "doc_b", "edit_distance"
        ).distinct().collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.edit_distance)
        for r in dedup_edit_distance(spark, sf).collect()
    }
    # 13 of C(6,2)=15 pairs: "" is 9 edits from both 9-char docs
    assert got == batch and len(batch) == 13


def test_approx_quantiles_rank_band_small_groups(spark, tmp_path):
    """12-row groups: the old value band [p(0.498), p(0.502)] is far
    narrower than one inter-value gap here, so the flags could come out
    0 while the oracle hard-codes 1. The rank envelope (|rk/n − p| ≤
    0.005 + 1/n) must yield 1 deterministically."""
    from mimir_spark.operators.relational2 import approx_quantiles

    rng = np.random.RandomState(7)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    n_per = 12
    pdf = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_per * len(prios), dtype="int64"),
            "o_custkey": np.arange(n_per * len(prios), dtype="int64"),
            "o_orderstatus": "O",
            "o_totalprice": rng.uniform(100, 100000, n_per * len(prios)),
            "o_orderdate": pd.to_datetime("1995-01-01"),
            "o_orderpriority": np.repeat(prios, n_per),
        }
    )
    sf = str(tmp_path / "smallorders")
    os.makedirs(sf, exist_ok=True)
    # µs timestamps: pandas' default ns unit reads back as bigint under
    # the session's nanosAsLong conf and trips the schema contract
    pdf.to_parquet(f"{sf}/orders.parquet", coerce_timestamps="us")
    rows = approx_quantiles(spark, sf).collect()
    assert len(rows) == len(prios)
    for r in rows:
        assert r.p50_within == 1 and r.p90_within == 1, r


def test_approx_quantiles_flags_hold_at_smoke_sf(spark, sf_smoke):
    """sf0.001 (~300 rows/group) was the marginal regime for the old
    band — the rank envelope must be all-1 there too."""
    from mimir_spark.operators.relational2 import approx_quantiles

    for r in approx_quantiles(spark, sf_smoke).collect():
        assert r.p50_within == 1 and r.p90_within == 1, r


def test_streaming_ivfpq_store_and_export_match_batch(spark, sf_smoke, tmp_path):
    """The stream-to-index publishing path (round 10): embeddings
    arrive as two files → stateless frozen-quantizer IVF-PQ encode →
    parquet code store → export publishes the cell-partitioned index.
    Pins (a) streamed codes ≡ the batch encode, (b) the exported index
    answers queries exactly like the in-memory operator, through the
    partition-pruned read."""
    import glob as globmod
    import shutil

    from mimir_spark.operators.ivfpq import (
        _cell_residuals,
        _residual_codebooks,
        ann_ivfpq_query_indexed,
        ann_ivfpq_topk,
    )
    from mimir_spark.operators.pq import pq_encode
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ann import (
        export_ivfpq_index_from_stream,
        streaming_ivfpq_encode_store,
    )
    from pyspark.sql import functions as F

    # two single-file arrival batches
    stage = str(tmp_path / "stage")
    load_table(spark, sf_smoke, "embeddings").repartition(2).write.parquet(stage)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    for i, f in enumerate(sorted(globmod.glob(f"{stage}/part-*.parquet"))):
        shutil.copy(f, f"{in_dir}/f{i}.parquet")

    store = str(tmp_path / "store")
    q = streaming_ivfpq_encode_store(
        spark, in_dir, sf_smoke, store, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    res = _cell_residuals(spark, sf_smoke)
    books = _residual_codebooks(spark, sf_smoke)
    expect_codes = {
        tuple(r)
        for r in pq_encode(
            res.select("vec_id", "cell_id", F.col("res").alias("e")),
            books,
            extra_cols=("cell_id",),
        ).collect()
    }
    got_codes = {tuple(r) for r in spark.read.parquet(store).collect()}
    assert got_codes == expect_codes and got_codes

    idx = str(tmp_path / "idx")
    export_ivfpq_index_from_stream(spark, sf_smoke, store, idx)
    got_df = ann_ivfpq_query_indexed(spark, sf_smoke, idx)
    got = {tuple(r) for r in got_df.collect()}
    expect = {tuple(r) for r in ann_ivfpq_topk(spark, sf_smoke).collect()}
    assert got == expect and got
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell_id" in plan, plan[:2000]


def test_corpus_build_end_to_end_manifest(spark, sf_smoke, tmp_path):
    """The composed corpus build (examples/corpus_build_end_to_end.py):
    keep-list → semi-joined corpus → mixture plan → packing → shards,
    with the manifest's invariants pinned:
      - packing covers exactly the kept docs;
      - the mixture plan's token total equals the kept docs' tokens;
      - shard manifest docs/tokens re-aggregate to the packed corpus;
      - written shard files round-trip the packed rows."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from corpus_build_end_to_end import build

    out = str(tmp_path / "shards")
    keep, plan, packed, manifest = build(spark, sf_smoke, out)
    kept_ids = {r.doc_id for r in keep.select("doc_id").collect()}
    packed_rows = packed.collect()
    assert {r.doc_id for r in packed_rows} == kept_ids and kept_ids

    from pyspark.sql import functions as F

    plan_tokens = plan.agg(F.sum("n_tokens")).collect()[0][0]
    packed_tokens = sum(r.n_tokens for r in packed_rows)
    assert plan_tokens == packed_tokens

    man = manifest.collect()
    assert sum(r.n_docs for r in man) == len(kept_ids)
    assert sum(r.n_tokens for r in man) == packed_tokens
    # every doc's shard holds its first token's sequence
    written = spark.read.parquet(out)
    wrows = written.collect()
    assert {r.doc_id for r in wrows} == kept_ids
    for r in wrows:
        assert r.shard == r.seq_id // 1000


def test_token_count_cjk_crafted(spark, tmp_path):
    """Codepoint-class fallback on whitespace-free scripts: crafted
    zh/ja/ko/mixed docs where the whitespace rule collapses to 1-2
    tokens but the mixed rule counts each CJK codepoint — plus an
    ASCII doc where both rules agree. Cross-checked against the
    driver's DuckDB oracle on the same crafted table."""
    import __spark_entry__ as entry
    from mimir_spark.operators.textstats import token_count_cjk

    rows = [
        (0, "hello world plain ascii"),          # 4 ws, 0 cjk
        (1, "你好世界"),                           # 1 ws token, 4 cjk
        (2, "ありがとうございます"),                 # 1 ws, 10 cjk
        (3, "안녕하세요 세계"),                     # 2 ws, 7 cjk
        (4, "mixed 文本 with 漢字 inside"),        # 5 ws, 4 cjk
    ]
    sf = _write_documents(str(tmp_path / "cjk"), rows)
    got = {r.doc_id: r for r in token_count_cjk(spark, sf).collect()}
    assert (got[0].cjk_chars, got[0].ws_tokens, got[0].mixed_tokens) == (0, 4, 4)
    assert (got[1].cjk_chars, got[1].ws_tokens, got[1].mixed_tokens) == (4, 1, 4)
    assert (got[2].cjk_chars, got[2].ws_tokens, got[2].mixed_tokens) == (10, 1, 10)
    assert (got[3].cjk_chars, got[3].ws_tokens, got[3].mixed_tokens) == (7, 2, 7)
    assert (got[4].cjk_chars, got[4].ws_tokens, got[4].mixed_tokens) == (4, 5, 7)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    duck = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            entry.oracle_sql()["token_count_cjk"]
        ).fetchall()
    }
    assert {
        k: (v.cjk_chars, v.ws_tokens, v.mixed_tokens)
        for k, v in got.items()
    } == duck


def test_dsir_weights_rank_target_like_docs(spark, tmp_path):
    """DSIR semantics on a crafted corpus: target docs (doc_id % 97 ==
    0) talk about topic A; raw docs are half A-like, half B-like. The
    A-like raw docs must receive strictly higher importance weights,
    and dsir_select at 50% must keep exactly them."""
    from mimir_spark.operators.quality import dsir_select, dsir_weights

    a_text = "the quick brown fox jumps over the lazy dog near the old barn"
    b_text = "stock market prices fell sharply today amid global trade fears"
    rows = [(0, a_text), (97, a_text + " again and again")]  # targets
    rows += [(i, a_text + f" variant {i}") for i in range(1, 11)]
    rows += [(i, b_text + f" variant {i}") for i in range(11, 21)]
    sf = _write_documents(str(tmp_path / "dsir"), rows)
    w = {r.doc_id: r.logw for r in dsir_weights(spark, sf).collect()}
    assert set(w) == set(range(1, 21))  # raw docs only
    a_min = min(w[i] for i in range(1, 11))
    b_max = max(w[i] for i in range(11, 21))
    assert a_min > b_max, (a_min, b_max)
    kept = {r.doc_id for r in dsir_select(spark, sf, keep_frac=0.5).collect()}
    assert kept == set(range(1, 11))


def test_stateful_ema_matches_batch(spark, sf_smoke, tmp_path):
    """Streaming EMA twin: events split into two TIME-ORDERED files
    (the sequential-fold ordering contract); after both micro-batches
    the per-user state must equal the batch fold exactly."""
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from mimir_spark.operators.features import ema_user_value
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.jobs import read_events_stream
    from mimir_spark.streaming.stateful import stateful_user_ema

    ev = load_table(spark, sf_smoke, "events")
    cut = ev.agg(
        F.expr("percentile(cast(cast(ts as timestamp) as double), 0.5)")
    ).collect()[0][0]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    for i, part in enumerate(
        [
            ev.filter(F.col("ts").cast("timestamp").cast("double") <= cut),
            ev.filter(F.col("ts").cast("timestamp").cast("double") > cut),
        ]
    ):
        stage = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.parquet(stage)
        import glob as globmod

        src = globmod.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{in_dir}/events{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (_time.time() + i, _time.time() + i))

    stream = read_events_stream(spark, in_dir, glob="events*.parquet")
    shutil.rmtree("/tmp/mimir_ckpt_sema", ignore_errors=True)
    q = (
        stateful_user_ema(stream)
        .writeStream.format("memory")
        .queryName("sema")
        .outputMode("update")
        .option("checkpointLocation", "/tmp/mimir_ckpt_sema")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_df = spark.sql(
        """SELECT user_id, n_events, last_value, ema FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY n_events DESC) rn
             FROM sema) WHERE rn = 1"""
    )
    got = {
        r.user_id: (r.n_events, r.last_value, r.ema)
        for r in got_df.collect()
    }
    expect = {
        r.user_id: (r.n_events, r.last_value, r.ema)
        for r in ema_user_value(spark, sf_smoke).collect()
    }
    assert got == expect


def test_bm25_index_persist_and_query(spark, sf_correct, tmp_path):
    """The persisted BM25 index (round 10): (a) the partition-pruned
    probe returns exactly the batch bm25_topk ranking, (b) the
    postings read carries PartitionFilters on shard (never a full
    postings scan), (c) a different term set probes different
    shards."""
    from mimir_spark.operators.retrieval import (
        bm25_query_indexed,
        bm25_topk,
        write_bm25_index,
    )

    idx = str(tmp_path / "bm25")
    write_bm25_index(spark, sf_correct, idx)
    got_df = bm25_query_indexed(spark, sf_correct, idx)
    got = [tuple(r) for r in got_df.collect()]
    expect = [tuple(r) for r in bm25_topk(spark, sf_correct).collect()]
    assert sorted(got) == sorted(expect) and got
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [shard" in plan, plan[:2000]

    other = bm25_query_indexed(
        spark, sf_correct, idx, terms=("data", "query")
    )
    assert other.count() > 0


def test_ema_matches_python_fold(spark, sf_smoke):
    """The distributed EMA equals a plain Python fold over each user's
    time-ordered values — pinning the collect-order and the seed-by-
    first-element contract independently of the DuckDB oracle."""
    from mimir_spark.operators.features import ema_user_value
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    by_user = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    got = {r.user_id: r for r in ema_user_value(spark, sf_smoke).collect()}
    assert set(got) == set(by_user)
    for uid, rows in list(by_user.items())[:200]:
        rows.sort()
        ema = rows[0][2]
        for _, _, v in rows[1:]:
            ema = 0.125 * v + 0.875 * ema
        assert got[uid].ema == round(ema, 6), uid
        assert got[uid].n_events == len(rows)


def test_hybrid_rrf_fuses_both_retrievers(spark, sf_correct):
    """RRF sanity: every fused row's score equals 1/(60+r_lex) +
    1/(60+r_vec) over its recorded ranks (0 = absent), and the top
    results actually draw from both lists."""
    from mimir_spark.operators.retrieval import hybrid_rrf

    rows = hybrid_rrf(spark, sf_correct).collect()
    assert len(rows) == 10
    for r in rows:
        exp = (1.0 / (60 + r.bm25_rank) if r.bm25_rank else 0.0) + (
            1.0 / (60 + r.vec_rank) if r.vec_rank else 0.0
        )
        assert r.rrf == round(exp, 6), r
    assert any(r.bm25_rank and r.vec_rank == 0 for r in rows) or any(
        r.vec_rank and r.bm25_rank == 0 for r in rows
    ) or all(r.bm25_rank and r.vec_rank for r in rows)


def test_kneser_ney_vs_python(spark, sf_smoke):
    """Kneser-Ney cross-entropy pinned against an independent pure-
    Python implementation of the interpolated-KN formula on a sample
    of docs."""
    import math
    from collections import Counter, defaultdict

    from mimir_spark.operators.quality import kneser_ney_logppl
    from mimir_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    c_ab: Counter = Counter()
    doc_bg = {}
    for r in docs:
        toks = r.text.split()
        bgs = Counter(zip(toks, toks[1:]))
        if bgs:
            doc_bg[r.doc_id] = bgs
            c_ab.update(bgs)
    c_a: Counter = Counter()
    n1p_fw: Counter = Counter()
    n1p_bw: Counter = Counter()
    for (a, b), c in c_ab.items():
        c_a[a] += c
        n1p_fw[a] += 1
        n1p_bw[b] += 1
    nb = len(c_ab)
    got = {r.doc_id: r for r in kneser_ney_logppl(spark, sf_smoke).collect()}
    assert set(got) == set(doc_bg)
    for did in list(doc_bg)[:100]:
        tot = sum(doc_bg[did].values())
        s = 0.0
        for (a, b), c in doc_bg[did].items():
            p = max(c_ab[(a, b)] - 0.75, 0.0) / c_a[a] + (
                0.75 * n1p_fw[a] / c_a[a]
            ) * (n1p_bw[b] / nb)
            s += c * math.log(p)
        assert abs(got[did].cross_entropy - (-s / tot)) < 1e-4, did
        assert got[did].n_bigrams == tot


def test_unicode_nfc_scan_crafted(spark, tmp_path):
    """Composed vs decomposed forms: 'é' (U+00E9) vs 'e'+U+0301 must
    normalize to the SAME NFC fingerprint with changed flagged only on
    the decomposed doc; ASCII stays untouched; Python unicodedata and
    DuckDB utf8proc agree on the crafted table."""
    import __spark_entry__ as entry
    from mimir_spark.operators.textstats2 import unicode_nfc_scan

    rows = [
        (0, "plain ascii text"),
        (1, "caf\u00e9 composed"),          # e-acute precomposed
        (2, "cafe\u0301 composed"),         # e + combining acute
        (3, "\u1e69 one"),                  # s-dot-below-dot-above precomposed
        (4, "s\u0323\u0307 one"),          # s + dot below + dot above
        (5, "\u00c5ngstr\u00f6m"),         # precomposed, NFC-invariant
    ]
    sf = _write_documents(str(tmp_path / "nfc"), rows)
    got = {r.doc_id: r for r in unicode_nfc_scan(spark, sf).collect()}
    assert got[0].changed == 0 and got[0].n_chars == got[0].n_chars_nfc
    assert got[1].changed == 0 and got[2].changed == 1
    assert got[1].nfc_fingerprint == got[2].nfc_fingerprint
    assert got[2].n_chars == got[2].n_chars_nfc + 1
    assert got[3].changed == 0 and got[4].changed == 1
    assert got[3].nfc_fingerprint == got[4].nfc_fingerprint
    assert got[5].changed == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    duck = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            entry.oracle_sql()["unicode_nfc_scan"]
        ).fetchall()
    }
    assert {
        k: (v.n_chars, v.n_chars_nfc, v.changed, v.nfc_fingerprint)
        for k, v in got.items()
    } == duck


def test_streaming_gap_fill_matches_batch(spark, sf_smoke, tmp_path):
    """Gap-filled continuous aggregate from the streaming minute store
    equals the batch hypertable_gap_fill over the whole table — the
    spine, gap flags and LOCF carries all come from the shared
    gap_fill_hourly code path, and the hourly sums re-aggregate from
    the accumulated partials."""
    import glob as globmod
    import shutil

    from pyspark.sql import functions as F

    from mimir_spark.operators.relational import hypertable_gap_fill
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.hypertable import (
        finalize_gap_fill,
        streaming_hypertable_build,
    )

    in_dir = str(tmp_path / "ev_in")
    ev = load_table(spark, sf_smoke, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        in_dir + "/b0", compression="none"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        in_dir + "/b1", compression="none"
    )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_hypertable_build(
        spark, flat, str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in finalize_gap_fill(spark, str(tmp_path / "store")).collect()
    }
    expect = {tuple(r) for r in hypertable_gap_fill(spark, sf_smoke).collect()}
    assert got == expect and got


def test_gap_fill_locf_semantics(spark, sf_smoke):
    """Gap-fill invariants on the real corpus: the spine is contiguous
    hourly per type, gap rows carry the most recent non-gap sum, and
    non-gap rows carry their own sum."""
    from collections import defaultdict

    from mimir_spark.operators.relational import hypertable_gap_fill

    rows = hypertable_gap_fill(spark, sf_smoke).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    assert by_type
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.bucket)
        # contiguous hourly spine
        for a, b in zip(rs, rs[1:]):
            assert (b.bucket - a.bucket).total_seconds() == 3600, et
        assert rs[0].is_gap == 0  # spine starts at a data bucket
        carry = None
        for r in rs:
            if r.is_gap == 0:
                assert r.n_events > 0
                carry = r.value_locf
            else:
                assert r.n_events == 0
                assert r.value_locf == carry, (et, r.bucket)


def test_time_weighted_avg_matches_python(spark, sf_smoke):
    """TWA pinned against a pure-Python fold over each user's
    time-ordered events (floor-second intervals, the Spark recipe)."""
    from collections import defaultdict

    from mimir_spark.operators.relational import time_weighted_avg
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        es = int(r.ts.timestamp())
        by_user[r.user_id].append((es, r.event_id, r.value))
    got = {r.user_id: r for r in time_weighted_avg(spark, sf_smoke).collect()}
    import math

    checked = 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        num = den = 0.0
        n_int = 0
        for (e0, _, v), (e1, _, _) in zip(rows, rows[1:]):
            num += v * (e1 - e0)
            den += e1 - e0
            n_int += 1
        if den > 0:
            assert uid in got
            assert got[uid].n_intervals == n_int
            assert math.isclose(got[uid].twa, round(num / den, 6),
                                abs_tol=1e-6), uid
            checked += 1
        else:
            assert uid not in got
    # sf0.001 has ~150 users over ~300 events — only a handful have
    # two observations more than a second apart
    assert checked >= 10 and set(got) <= set(by_user)


def test_anomaly_mad_zero_mad_group(spark, tmp_path):
    """One event type with 60% identical values (MAD = 0) and two
    extreme rows: the extremes must be flagged with the ±RZ_INF
    sentinel, median-valued rows must not be, and a normal-spread type
    keeps its ordinary robust-z behaviour. Cross-checked against the
    driver's DuckDB oracle on the same crafted table."""
    import __spark_entry__ as entry
    from mimir_spark.operators.features import RZ_INF, anomaly_mad

    rng = np.random.RandomState(3)
    n = 40
    flat = [50.0] * 24 + list(rng.uniform(49.9, 50.1, 14)) + [5000.0, -77.0]
    spread = list(rng.normal(0, 1, n - 1)) + [9.0]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(2 * n, dtype="int64"),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": np.arange(2 * n, dtype="int64"),
            "event_type": ["flat"] * n + ["spread"] * n,
            "value": flat + spread,
            "props": "{}",
        }
    )
    sf = str(tmp_path / "madevents")
    os.makedirs(sf, exist_ok=True)
    pdf.to_parquet(f"{sf}/events.parquet")

    rows = anomaly_mad(spark, sf).collect()
    flagged = {r.event_id: r for r in rows}
    hi, lo = n - 2, n - 1  # ids of 5000.0 and -77.0
    assert flagged[hi].rz == RZ_INF
    assert flagged[lo].rz == -RZ_INF
    # median-valued rows of the zero-MAD group are not outliers
    assert all(
        r.event_type != "flat" or r.event_id in {hi, lo}
        or abs(pdf.value[r.event_id] - 50.0) > 0
        for r in rows
    )
    # the spread group still flags its planted extreme
    assert (2 * n - 1) in flagged

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    duck = {
        (r[0], round(r[3], 4))
        for r in con.execute(entry.oracle_sql()["anomaly_mad"]).fetchall()
    }
    assert {(r.event_id, round(r.rz, 4)) for r in rows} == duck
