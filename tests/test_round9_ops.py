"""Round-9 pins: decoded-pixel kernels against independent
reimplementations, the JPEG dispatch branches, the tolerance-band
sketch contracts, and the oracle-checked Gram projection."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


# ---- resize_pixels_nn vs an independent nested-loop resize -------------


def _resize_nn_reference(w, h, px, out_w, out_h):
    """Independent nearest-neighbour resize: plain Python loops over
    the closed-form index map src = x*in // out (no NumPy fancy
    indexing shared with the kernel under test)."""
    out = bytearray()
    for y in range(out_h):
        sy = (y * h) // out_h
        for x in range(out_w):
            sx = (x * w) // out_w
            base = (sy * w + sx) * 3
            out.extend(px[base : base + 3])
    return bytes(out)


@pytest.mark.parametrize("w,h,out_w,out_h", [
    (1, 1, 64, 48),      # upsample from a single pixel
    (16, 8, 64, 48),     # max generator size
    (7, 3, 64, 48),      # non-divisor dims
    (16, 8, 4, 2),       # downsample
    (5, 5, 5, 5),        # identity
])
def test_resize_nn_matches_reference(w, h, out_w, out_h):
    from mimir_spark.operators.multimodal import resize_pixels_nn

    px = bytes((i * 7 + 13) % 256 for i in range(w * h * 3))
    assert resize_pixels_nn(w, h, px, out_w, out_h) == _resize_nn_reference(
        w, h, px, out_w, out_h
    )


def test_resize_pixels_digest_closed_form(spark, sf_smoke):
    """The operator's digest equals a from-scratch recomputation:
    generation rule -> reference resize -> Horner fold, per doc."""
    from mimir_spark.operators.multimodal import (
        RESIZE_TARGET,
        multimodal_resize_pixels,
        pixel_digest,
    )

    out_w, out_h = RESIZE_TARGET
    rows = {r.doc_id: r for r in
            multimodal_resize_pixels(spark, sf_smoke).collect()}
    assert rows
    for doc_id in list(rows)[:25]:
        w, h = (doc_id % 16) + 1, (doc_id % 8) + 1
        px = bytes((doc_id * 31 + j) % 256 for j in range(w * h * 3))
        expect = pixel_digest(
            out_w, out_h, _resize_nn_reference(w, h, px, out_w, out_h)
        )
        r = rows[doc_id]
        assert (r.width, r.height, r.out_width, r.out_height) == (
            w, h, out_w, out_h,
        )
        assert r.digest == expect, doc_id


def test_pixel_features_closed_form(spark, sf_smoke):
    """Channel sums + luminance histogram recomputed from the
    generation rule with plain Python (no NumPy bincount)."""
    from mimir_spark.operators.multimodal import multimodal_pixel_features

    rows = {r.doc_id: r for r in
            multimodal_pixel_features(spark, sf_smoke).collect()}
    assert rows
    for doc_id in list(rows)[:25]:
        w, h = (doc_id % 16) + 1, (doc_id % 8) + 1
        b = [(doc_id * 31 + j) % 256 for j in range(w * h * 3)]
        sums = [sum(b[c::3]) for c in range(3)]
        hist = [0] * 8
        for p in range(w * h):
            hist[((b[3 * p] + b[3 * p + 1] + b[3 * p + 2]) // 3) // 32] += 1
        r = rows[doc_id]
        assert (r.width, r.height) == (w, h)
        assert [r.sum_r, r.sum_g, r.sum_b] == sums
        assert [getattr(r, f"lum{k}") for k in range(8)] == hist


# ---- decode_image dispatch: all three magic-byte branches --------------


def test_decode_image_dispatch_bmp_png():
    from mimir_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        decode_png,
        encode_bmp,
        encode_png,
    )

    assert decode_image(encode_bmp(7)) == decode_bmp(encode_bmp(7))
    assert decode_image(encode_png(7)) == decode_png(encode_png(7))
    with pytest.raises(ValueError, match="magic"):
        decode_image(b"\x00\x01\x02\x03garbage")


def test_decode_image_jpeg_without_pil_raises():
    # Since round 10 BASELINE JPEG decodes pure-Python; the honest
    # dependency boundary moved to the non-baseline tail — a
    # PROGRESSIVE (SOF2) payload must raise NotImplementedError with a
    # clear cluster-dependency message in this PIL-less container,
    # never silently mis-decode. Baseline decode itself is covered in
    # test_jpeg.py.
    from mimir_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; covered by the stubbed test below")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\xff\xd8\xff\xc2\x00\x0bprogressive")


def test_decode_image_jpeg_with_stubbed_pil(monkeypatch):
    """Pin the native-codec branch's contract with a stub module: on a
    NON-BASELINE payload, dispatch must call Image.open on the payload
    bytes, convert('RGB'), and emit (w, h, 24, w*h, int pixel sum)
    from the array view. (Round 13: the probe is cached in
    jpeg._HAVE_PIL, so the stub flips it explicitly.)"""
    from mimir_spark.operators import jpeg, multimodal

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)

    class _FakeImg:
        width, height = 3, 2

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def __array__(self, dtype=None, copy=None):
            a = arr.astype(dtype) if dtype is not None else arr
            return np.array(a) if copy else a

    class _FakeImage:
        @staticmethod
        def open(buf):
            assert buf.read(3) == b"\xff\xd8\xff"
            return _FakeImg()

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _FakeImage
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setattr(jpeg, "_HAVE_PIL", True)

    w, h, bpp, n_px, total = multimodal.decode_image(
        b"\xff\xd8\xff\xc2\x00\x0bstubbed"
    )
    assert (w, h, bpp, n_px) == (3, 2, 24, 6)
    assert total == int(arr.sum())


# ---- tolerance-band sketch contracts ------------------------------------


def test_approx_distinct_band_holds(spark, sf_correct):
    from mimir_spark.operators.core import approx_distinct

    rows = approx_distinct(spark, sf_correct).collect()
    assert rows
    assert all(r.within_eps == 1 for r in rows)
    assert all(r.exact_users > 0 for r in rows)


def test_approx_quantiles_band_holds(spark, sf_correct):
    from mimir_spark.operators.relational2 import (
        approx_quantiles,
        median_order_value,
    )

    rows = {r.o_orderpriority: r for r in
            approx_quantiles(spark, sf_correct).collect()}
    assert rows
    assert all(r.p50_within == 1 and r.p90_within == 1
               for r in rows.values())
    # the hashed exact side is the SAME number median_order_value emits
    med = {r.o_orderpriority: r for r in
           median_order_value(spark, sf_correct).collect()}
    for k, r in rows.items():
        assert (r.p50, r.p90) == (med[k].p50, med[k].p90)


# ---- streaming twins of the decoded-pixel kernels -----------------------


def _run_stream(sdf, name: str):
    import shutil

    shutil.rmtree(f"/tmp/mimir_ckpt_{name}", ignore_errors=True)
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/mimir_ckpt_{name}")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_pixel_features_matches_batch(spark, sf_smoke):
    from mimir_spark.operators.multimodal import multimodal_pixel_features
    from mimir_spark.streaming.jobs import (
        read_documents_stream,
        streaming_pixel_features,
    )

    stream = read_documents_stream(spark, sf_smoke)
    _run_stream(streaming_pixel_features(stream), "pxf_t")
    got = {tuple(r) for r in spark.sql("SELECT * FROM pxf_t").collect()}
    expect = {
        tuple(r) for r in multimodal_pixel_features(spark, sf_smoke).collect()
    }
    assert got == expect


def test_streaming_resize_pixels_matches_batch(spark, sf_smoke):
    from mimir_spark.operators.multimodal import multimodal_resize_pixels
    from mimir_spark.streaming.jobs import (
        read_documents_stream,
        streaming_resize_pixels,
    )

    stream = read_documents_stream(spark, sf_smoke)
    _run_stream(streaming_resize_pixels(stream), "rszp_t")
    got = {tuple(r) for r in spark.sql("SELECT * FROM rszp_t").collect()}
    expect = {
        tuple(r) for r in multimodal_resize_pixels(spark, sf_smoke).collect()
    }
    assert got == expect


# ---- product quantization -----------------------------------------------


def test_pq_encode_matches_numpy(spark, sf_smoke):
    """Codes = per-subspace argmin over the trained codebooks,
    recomputed with NumPy from the same normalized vectors."""
    from mimir_spark.operators.pq import (
        D_SUB,
        M_SUB,
        _normalized_pts,
        pq_codebooks,
        pq_encode,
    )

    books = pq_codebooks(spark, sf_smoke)
    pts = _normalized_pts(spark, sf_smoke)
    vecs = {r.vec_id: np.array(r.e) for r in pts.collect()}
    got = {r.neighbor_id: [r[f"code{s}"] for s in range(M_SUB)]
           for r in pq_encode(pts, books).collect()}
    for vid in list(vecs)[:40]:
        e = vecs[vid]
        for s in range(M_SUB):
            sl = e[s * D_SUB : (s + 1) * D_SUB]
            d = [((sl - np.array(c)) ** 2).sum() for c in books[s]]
            assert got[vid][s] == int(np.argmin(d)) + 1, (vid, s)


def test_pq_high_recall_on_structured_data(spark):
    """The PQ mechanism itself recovers neighbors when the data has
    structure above the quantization grain: corpus = 80 well-separated
    base vectors, queries = tiny perturbations of the first 10; exact
    top-1 is the base vector and PQ/ADC must find it. (On the synthetic
    embeddings table the neighbor signal sits BELOW the 32-bit code
    grain, which is why ann_pq_recall reports a low number there and
    why ann_pq_rerank_topk exists — this test pins that the low number
    is a data property, not an encode/ADC bug.)"""
    import numpy as np
    from pyspark.sql import functions as F
    from mimir_spark.operators import pq as pqm

    rng = np.random.RandomState(7)
    base = rng.randn(80, 64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    e = F.col("embedding")
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
    pts = df.select(
        "vec_id", F.transform(e, lambda x: x / norm).alias("e")
    ).localCheckpoint(eager=True)

    from mimir_spark.operators.clustering import _lloyd_iterate

    books = []
    for s in range(pqm.M_SUB):
        pts_s = pts.select(
            "vec_id", F.slice("e", s * pqm.D_SUB + 1, pqm.D_SUB).alias("e")
        )
        seeds = pts_s.orderBy("vec_id").limit(pqm.K_CODES).collect()
        books.append(
            _lloyd_iterate(
                pts_s,
                [[round(float(x), 9) for x in r.e] for r in seeds],
                pqm.PQ_ITERS,
                round_dp=9,
            )
        )
    codes = {r.neighbor_id: [r[f"code{s}"] for s in range(pqm.M_SUB)]
             for r in pq_encode_rows(pts, books)}
    # ADC: query = base + tiny noise, truth = its base vector
    hits = 0
    for qid in range(10):
        qe = base[qid] + rng.randn(64) * 0.01
        qe /= np.linalg.norm(qe)
        best, best_d = None, None
        for vid, cs in codes.items():
            d = 0.0
            for s in range(pqm.M_SUB):
                c = np.array(books[s][cs[s] - 1])
                sl = qe[s * pqm.D_SUB : (s + 1) * pqm.D_SUB]
                d += ((sl - c) ** 2).sum()
            if best_d is None or d < best_d:
                best, best_d = vid, d
        hits += best == qid
    assert hits >= 9, hits


def pq_encode_rows(pts, books):
    from mimir_spark.operators.pq import pq_encode

    return pq_encode(pts, books).collect()


def test_ivfpq_residuals_beat_flat_pq(spark, sf_correct):
    """Residual quantization spends the same 32-bit code budget on the
    within-cell structure the coarse quantizer removed — recall must
    not fall below flat PQ's, and the measured gap at sf0.01 is
    0.34 vs 0.26."""
    from mimir_spark.operators.ivfpq import ann_ivfpq_recall
    from mimir_spark.operators.pq import ann_pq_recall

    ivfpq_mean = sum(
        r.recall for r in ann_ivfpq_recall(spark, sf_correct).collect()
    ) / 10
    pq_mean = sum(
        r.recall for r in ann_pq_recall(spark, sf_correct).collect()
    ) / 10
    assert ivfpq_mean >= pq_mean, (ivfpq_mean, pq_mean)
    assert ivfpq_mean >= 0.2, ivfpq_mean


def test_ivfpq_scan_is_cell_pruned(spark, sf_smoke):
    """Each query's ADC scan touches only its probed cells' codes:
    scored candidates per query < corpus size (pruning is real, not
    cosmetic)."""
    from pyspark.sql import functions as F
    from mimir_spark.operators.ivfpq import _cell_residuals
    from mimir_spark.operators.similarity import N_PROBE

    res = _cell_residuals(spark, sf_smoke)
    cell_sizes = {r.cell_id: r.n for r in
                  res.groupBy("cell_id").agg(F.count("*").alias("n"))
                  .collect()}
    total = sum(cell_sizes.values())
    # the largest possible probe set is the N_PROBE biggest cells
    worst_probe = sum(sorted(cell_sizes.values())[-N_PROBE:])
    assert worst_probe < total


def test_ivfpq_index_persist_and_query(spark, sf_smoke, tmp_path):
    """The persisted IVF-PQ query path must (a) return exactly the
    in-memory ann_ivfpq_topk results and (b) read the codes through
    partition pruning (PartitionFilters on cell_id), not a full
    scan."""
    from mimir_spark.operators.ivfpq import (
        ann_ivfpq_query_indexed,
        ann_ivfpq_topk,
        write_ivfpq_index,
    )

    idx = str(tmp_path / "ivfpq")
    write_ivfpq_index(spark, sf_smoke, idx)
    got_df = ann_ivfpq_query_indexed(spark, sf_smoke, idx)
    got = {tuple(r) for r in got_df.collect()}
    expect = {tuple(r) for r in ann_ivfpq_topk(spark, sf_smoke).collect()}
    assert got == expect and got
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell_id" in plan, plan[:2000]


def test_streaming_pq_encode_matches_batch(spark, sf_smoke):
    from mimir_spark.operators.pq import (
        _normalized_pts,
        pq_codebooks,
        pq_encode,
    )
    from mimir_spark.streaming.ann import (
        read_embeddings_stream,
        streaming_pq_encode,
    )

    books = pq_codebooks(spark, sf_smoke)
    stream = read_embeddings_stream(spark, sf_smoke)
    _run_stream(streaming_pq_encode(stream, books), "pqe_t")
    got = {tuple(r) for r in spark.sql("SELECT * FROM pqe_t").collect()}
    expect = {
        tuple(r)
        for r in pq_encode(_normalized_pts(spark, sf_smoke), books).collect()
    }
    assert got == expect


def test_edit_clusters_group_revision_families(spark, sf_correct):
    """Every edit pair's endpoints share a cluster_id, and survivors
    pick the longest member."""
    from mimir_spark.operators.editdist import (
        dedup_edit_clusters,
        dedup_edit_distance,
        dedup_edit_survivors,
    )

    pairs = dedup_edit_distance(spark, sf_correct).collect()
    cl = {r.doc_id: r.cluster_id
          for r in dedup_edit_clusters(spark, sf_correct).collect()}
    assert pairs
    for p in pairs:
        assert cl[p.doc_a] == cl[p.doc_b], p
    surv = dedup_edit_survivors(spark, sf_correct).collect()
    assert {s.cluster_id for s in surv} == set(cl.values())
    assert sum(s.n_members for s in surv) == len(cl)


def test_pq_rerank_recall_floor(spark, sf_correct):
    """The shipped PQ recipe (ADC shortlist + exact re-rank) must hold
    a recall floor on the real embeddings table."""
    from mimir_spark.operators.pq import ann_pq_rerank_topk
    from mimir_spark.operators.similarity import ann_bruteforce_topk

    rr = ann_pq_rerank_topk(spark, sf_correct).select(
        "query_id", "neighbor_id"
    )
    bf = ann_bruteforce_topk(spark, sf_correct, 5).select(
        "query_id", "neighbor_id"
    )
    hit = rr.join(bf, ["query_id", "neighbor_id"]).count()
    assert hit >= 30, hit  # 0.6 floor; measured 39/50 at sf0.01


# ---- PassJoin edit-distance dedup ---------------------------------------


def _apply_edits(text, rng, n_edits):
    """n random single-char edits (ins/del/sub) — ground-truth pairs
    for the completeness test (true distance <= n_edits)."""
    s = list(text)
    for _ in range(n_edits):
        op = rng.choice(3)
        pos = rng.randint(0, max(1, len(s)))
        if op == 0 and len(s) > 1:
            del s[pos % len(s)]
        elif op == 1:
            s.insert(pos, chr(97 + rng.randint(0, 26)))
        else:
            s[pos % len(s)] = chr(97 + rng.randint(0, 26))
    return "".join(s)


def test_passjoin_finds_all_crafted_pairs(spark, tmp_path):
    """Completeness pin independent of the corpus: 40 base strings,
    each paired with a <=8-edit variant; PassJoin must find every
    (base, variant) pair a brute-force levenshtein confirms."""
    from mimir_spark.operators.editdist import dedup_edit_distance

    rng = np.random.RandomState(11)
    alphabet = "abcdefghij klmnopqrst"
    rows = []
    for i in range(40):
        base = "".join(
            alphabet[rng.randint(0, len(alphabet))] for _ in range(
                rng.randint(60, 400)
            )
        )
        rows.append((2 * i, base))
        rows.append((2 * i + 1, _apply_edits(base, rng, rng.randint(0, 9))))
    import pandas as pd

    sf = str(tmp_path / "crafted")
    import os

    os.makedirs(sf, exist_ok=True)
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "crafted",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pdf.to_parquet(f"{sf}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_edit_distance(spark, sf).collect()
    }
    # brute-force truth in python over all pairs
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expect = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        if abs(len(ta) - len(tb)) <= 8 and lev(ta, tb) <= 8:
            expect.add((min(ia, ib), max(ia, ib)))
    assert got == expect
    assert len(expect) >= 25  # the crafted pairs are actually present


# ---- weighted SSSP --------------------------------------------------------


def test_sssp_matches_python_bellman_ford(spark, sf_smoke):
    """Distances pinned against a pure-Python Bellman-Ford over the
    collected edge list, and the fixed-round prefix is the true
    fixpoint at this SF (one extra round changes nothing)."""
    from collections import defaultdict

    from mimir_spark.operators.graph import SSSP_ROUNDS, sssp_weighted
    from mimir_spark.sources.tables import load_table

    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    w = defaultdict(lambda: 1 << 60)
    for r in li.collect():
        a, b = 2 * r.l_orderkey, 2 * r.l_partkey + 1
        w[(a, b)] = min(w[(a, b)], int(r.l_quantity))
    edges = defaultdict(list)
    for (a, b), wt in w.items():
        edges[a].append((b, wt))
        edges[b].append((a, wt))
    src = 2 * min(a for a, _ in w)
    dist = {src: 0}
    for _ in range(SSSP_ROUNDS):
        nxt = dict(dist)
        for node, d in dist.items():
            for nb, wt in edges[node]:
                if d + wt < nxt.get(nb, 1 << 60):
                    nxt[nb] = d + wt
        dist = nxt
    got = {r.node: r.dist for r in sssp_weighted(spark, sf_smoke).collect()}
    assert got == dist
    # prefix monotonicity: an extra round only ever improves distances
    # (weighted SP can keep relaxing past the hop diameter — the key's
    # contract is the exact fixed-round prefix, like pagerank's fixed
    # 10 iterations)
    more = {r.node: r.dist
            for r in sssp_weighted(spark, sf_smoke,
                                   rounds=SSSP_ROUNDS + 1).collect()}
    assert set(more) >= set(got)
    assert all(more[n] <= d for n, d in got.items())


def test_streaming_hypertable_matches_batch(spark, sf_smoke, tmp_path):
    """Finalized continuous aggregate over a 2-batch event split
    equals the batch cascade over the whole table — partials merge by
    addition at every level."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F
    from mimir_spark.operators.relational import hypertable_rollup
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.hypertable import (
        finalize_hypertable_rollup,
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
        for r in finalize_hypertable_rollup(
            spark, str(tmp_path / "store")
        ).collect()
    }
    expect = {tuple(r) for r in hypertable_rollup(spark, sf_smoke).collect()}
    assert got == expect and got


def test_skyline_partition_invariance_and_frontier(spark, sf_smoke):
    """The skyline is a pure function of the data (bucket pruning is
    lossless under any partitioning), and frontier rows are mutually
    non-dominating."""
    from mimir_spark.operators.relational import skyline_orders

    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    base = {tuple(r) for r in skyline_orders(spark, sf_smoke).collect()}
    alt = {tuple(r) for r in skyline_orders(odd, sf_smoke).collect()}
    assert base == alt and base
    rows = sorted(base, key=lambda r: (r[1], r[2]))
    for (_, p1, d1), (_, p2, d2) in zip(rows, rows[1:]):
        # ordered by price asc: later (costlier) rows must be strictly
        # earlier, else they'd be dominated
        assert p2 >= p1
        if p2 > p1:
            assert d2 < d1, (p1, d1, p2, d2)


def test_sssp_partition_invariance(spark, sf_smoke):
    """Integer min over integer sums — the relaxation prefix cannot
    depend on partitioning."""
    from mimir_spark.operators.graph import sssp_weighted

    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    base = {tuple(r) for r in sssp_weighted(spark, sf_smoke).collect()}
    alt = {tuple(r) for r in sssp_weighted(odd, sf_smoke).collect()}
    assert base == alt and base


def test_hypertable_levels_consistent(spark, sf_smoke):
    """The hour level of the cascade equals the direct hour
    aggregation (event_windows), and each level's totals conserve the
    grand total — re-aggregation loses nothing."""
    from mimir_spark.operators.relational import (
        event_windows,
        hypertable_rollup,
    )

    roll = hypertable_rollup(spark, sf_smoke).collect()
    by_level = {}
    for r in roll:
        by_level.setdefault(r.resolution, {})[
            (r.bucket, r.event_type)
        ] = (r.n_events, r.total_value)
    direct = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in event_windows(spark, sf_smoke).collect()
    }
    assert by_level["hour"] == direct
    n_by_level = {
        lvl: sum(n for n, _ in d.values()) for lvl, d in by_level.items()
    }
    assert len(set(n_by_level.values())) == 1  # counts conserved


def test_passjoin_chunk_rule_tiles_exactly():
    """The shared chunk rule (base = len // (K+1), first rem chunks
    one char longer, start = 1 + i*base + min(i, rem)) must tile
    [1..len] exactly for every length — a gap or overlap breaks the
    pigeonhole guarantee silently."""
    from hypothesis import given, strategies as st
    from mimir_spark.operators.editdist import N_CHUNKS

    @given(st.integers(min_value=N_CHUNKS, max_value=100000))
    def check(length):
        base, rem = divmod(length, N_CHUNKS)
        pos = 1
        for i in range(N_CHUNKS):
            start = 1 + i * base + min(i, rem)
            clen = base + (1 if i < rem else 0)
            assert start == pos, (length, i)
            assert clen >= 1
            pos += clen
        assert pos == length + 1, length

    check()


# ---- streaming edit-distance dedup ---------------------------------------


def test_streaming_edit_dedup_matches_batch(spark, sf_smoke, tmp_path):
    """Accumulated streaming pairs over a 2-batch split equal the
    batch PassJoin operator over the whole corpus (exactly once: pairs
    are emitted in the later member's batch, both-new pairs once)."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F
    from mimir_spark.operators.editdist import dedup_edit_distance
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.editdist import streaming_edit_dedup

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        in_dir + "/b0", compression="none"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        in_dir + "/b1", compression="none"
    )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_edit_dedup(
        spark,
        flat,
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_a, r.doc_b, r.edit_distance)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.edit_distance)
        for r in dedup_edit_distance(spark, sf_smoke).collect()
    }
    assert got == expect and got


# ---- end-to-end keep-list -----------------------------------------------


def test_corpus_keep_list_is_conjunction(spark, sf_correct):
    """Every kept doc passes each stage; every stage-passing doc that
    all other stages also pass is kept (true conjunction, nothing
    dropped or added by the composition)."""
    from pyspark.sql import functions as F
    from mimir_spark.operators.corpus import decontaminate_corpus
    from mimir_spark.operators.dedup import dedup_clusters, dedup_survivors
    from mimir_spark.operators.pipeline import (
        corpus_clean_pipeline,
        corpus_keep_list,
    )
    from mimir_spark.operators.quality import gopher_quality_filter

    kept = {r.doc_id for r in corpus_keep_list(spark, sf_correct).collect()}
    clean = {r.doc_id
             for r in corpus_clean_pipeline(spark, sf_correct).collect()}
    gop = {r.doc_id for r in gopher_quality_filter(spark, sf_correct)
           .filter(F.col("passes_gopher") == 1).collect()}
    dec = {r.doc_id
           for r in decontaminate_corpus(spark, sf_correct).collect()}
    clustered = {r.doc_id for r in
                 dedup_clusters(spark, sf_correct,
                                pair_source="lsh").collect()}
    surv = {r.survivor_doc_id for r in
            dedup_survivors(spark, sf_correct, pair_source="lsh").collect()}
    losers = clustered - surv
    expect = (clean & gop & dec) - losers
    assert kept == expect
    assert kept and kept < clean  # the extra gates really remove docs


# ---- plan shape + partition invariance for the round-9 operators --------


def test_editdist_no_cartesian_and_partition_invariance(spark, sf_smoke):
    """PassJoin's candidate join must stay an equi-join on
    (chunk_index, substring-hash), and the pair set must be a pure
    function of the data (xxhash64 keys + exact verify), never of the
    partitioning."""
    from mimir_spark.operators.editdist import dedup_edit_distance
    from mimir_spark.plans.checks import formatted_plan

    plan = formatted_plan(dedup_edit_distance(spark, sf_smoke))
    assert "CartesianProduct" not in plan, plan[:2000]

    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    base = {tuple(r)
            for r in dedup_edit_distance(spark, sf_smoke).collect()}
    alt = {tuple(r) for r in dedup_edit_distance(odd, sf_smoke).collect()}
    assert base == alt and base


def test_ivfpq_no_cartesian(spark, sf_smoke):
    """IVF-PQ's probe join is an equi-join on cell_id with a broadcast
    query side — no CartesianProduct anywhere in the plan."""
    from mimir_spark.operators.ivfpq import ann_ivfpq_topk
    from mimir_spark.plans.checks import formatted_plan

    plan = formatted_plan(ann_ivfpq_topk(spark, sf_smoke))
    assert "CartesianProduct" not in plan, plan[:2000]


# ---- embedding_gram vs full-matrix NumPy --------------------------------


def test_embedding_gram_matches_numpy(spark, sf_smoke):
    from mimir_spark.operators.clustering import embedding_gram
    from mimir_spark.sources.tables import load_table

    x = np.array(
        [r.embedding for r in
         load_table(spark, sf_smoke, "embeddings").collect()],
        dtype=np.float64,
    )
    full = x.T @ x
    rows = embedding_gram(spark, sf_smoke).collect()
    d = x.shape[1]
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        assert r.gram == pytest.approx(full[r.i, r.j], abs=2e-4)
