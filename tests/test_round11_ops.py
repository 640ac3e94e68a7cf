"""Round-11 operators and fixes.

- multimodal_dedup_images_near: perceptual dHash dedup catches the
  resized / re-encoded copies the exact pixel digest provably misses.
- kneser_ney3_logppl: trigram KN separates recombined-bigram word
  salad that the bigram LM scores as fluent.
- dedup_survivors_capped: a boilerplate-heavy source gets capped.
- ema_user_value: in-plan history guard routes pathological users to
  the streaming twin instead of OOMing a task.
- JPEG marker-walk fixes: fill bytes + TEM markers accepted,
  non-interleaved multi-scan baseline rejected as UnsupportedJpeg.
- approx_quantiles: tie-robust within flag on all-duplicate groups.
- drop_bucketed_table: qualified and mixed-case table names.
- streaming EMA: Spark-HALF_UP rounding parity on halfway values.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE


# ---- perceptual near-dup image dedup ------------------------------------


def test_dhash_catches_resized_copy_exact_digest_misses():
    """The headline claim: a 2x nearest-neighbor upscaled re-encode
    (variant v=2, a PNG) of the original BMP (v=0) has a DIFFERENT
    exact pixel digest — multimodal_dedup_images at multimodal.py:859
    groups by that digest, so it provably misses the pair — while the
    dHash is IDENTICAL (hamming 0)."""
    from mimir_spark.operators.multimodal import (
        decode_pixels,
        dhash63,
        encode_near_dup_image,
        pixel_digest,
    )

    for s in (0, 7, 42):
        orig = decode_pixels(encode_near_dup_image(4 * s))
        resized = decode_pixels(encode_near_dup_image(4 * s + 2))
        assert orig[:2] != resized[:2]  # genuinely different dims
        assert pixel_digest(*orig) != pixel_digest(*resized)  # exact misses
        assert dhash63(*orig) == dhash63(*resized)  # perceptual catches


def test_dhash_brightness_shift_small_hamming():
    """Variant v=3 (2x upscale +2 brightness mod 256) stays within a
    small hamming distance of the original: comparisons between
    uniformly shifted grays only flip where a byte wraps."""
    from mimir_spark.operators.multimodal import (
        decode_pixels,
        dhash63,
        encode_near_dup_image,
    )

    hams = []
    for s in range(30):
        a = dhash63(*decode_pixels(encode_near_dup_image(4 * s)))
        b = dhash63(*decode_pixels(encode_near_dup_image(4 * s + 3)))
        hams.append(bin(a ^ b).count("1"))
    assert max(hams) <= 6 and sum(h <= 3 for h in hams) >= 20


def test_near_dup_pairs_spark(spark):
    """End-to-end on sf0.001: every (v=0, v=2) resized pair is found
    with hamming 0 and same_content = 0, and the pair set is exactly
    the brute-force hamming<=3 truth (pigeonhole completeness)."""
    import itertools

    from mimir_spark.operators.multimodal import (
        decode_pixels,
        dhash63,
        encode_near_dup_image,
        multimodal_dedup_images_near,
        pixel_digest,
    )

    rows = multimodal_dedup_images_near(spark, SF_SMOKE).collect()
    got = {(r.doc_a, r.doc_b): (r.hamming, r.same_content) for r in rows}
    n = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    fps = {}
    for d in range(n):
        w, h, px = decode_pixels(encode_near_dup_image(d))
        fps[d] = (dhash63(w, h, px), pixel_digest(w, h, px))
    truth = {}
    for a, b in itertools.combinations(range(n), 2):
        hd = bin(fps[a][0] ^ fps[b][0]).count("1")
        if hd <= 3:
            truth[(a, b)] = (hd, int(fps[a][1] == fps[b][1]))
    assert got == truth
    for s in range(n // 4):
        assert got[(4 * s, 4 * s + 2)] == (0, 0)  # resized: caught, not exact


def test_near_dup_plan_no_cartesian(spark):
    from mimir_spark.operators.multimodal import multimodal_dedup_images_near

    plan = multimodal_dedup_images_near(spark, SF_SMOKE)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---- trigram Kneser-Ney ---------------------------------------------------


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_trigram_kn_separates_recombined_bigram_salad(spark, tmp_path):
    """A doc stitched from frequent BIGRAMS ('x a' + 'a z') whose
    trigram 'x a z' never occurs elsewhere: the bigram KN scores it
    like the fluent docs (all its bigrams are corpus-frequent), the
    trigram KN must rank it clearly worse than every fluent doc."""
    from mimir_spark.operators.quality import (
        kneser_ney3_logppl,
        kneser_ney_logppl,
    )

    fluent_a = ("x a y b " * 8).strip()
    fluent_b = ("y a z b " * 8).strip()
    salad = ("x a z b " * 8).strip()
    sf = _write_docs(
        spark, tmp_path, [fluent_a] * 6 + [fluent_b] * 6 + [salad]
    )
    tri = {r.doc_id: r.cross_entropy for r in kneser_ney3_logppl(spark, sf).collect()}
    bi = {r.doc_id: r.cross_entropy for r in kneser_ney_logppl(spark, sf).collect()}
    salad_id = 12
    fluent_ids = range(12)
    # bigram LM: salad is NOT separable (it scores BETTER than the
    # fluent docs — every one of its bigrams is corpus-frequent)
    assert bi[salad_id] <= max(bi[i] for i in fluent_ids)
    # trigram LM: salad is clearly worse than every fluent doc
    assert tri[salad_id] > max(tri[i] for i in fluent_ids) * 5


def test_trigram_parts_merge_across_splits(spark, tmp_path):
    """trigram_parts is a SUM monoid over disjoint doc batches: the
    union of per-split tables equals the single-pass table (the
    streaming-incremental contract, same as bigram_parts)."""
    from mimir_spark.operators.quality import trigram_parts

    texts = ["a b c d e", "b c b c b", "x y z x y z"]
    sf = _write_docs(spark, tmp_path, texts)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    whole = set(map(tuple, trigram_parts(docs).collect()))
    part1 = trigram_parts(docs.filter("doc_id < 2"))
    part2 = trigram_parts(docs.filter("doc_id >= 2"))
    merged = set(map(tuple, part1.unionByName(part2).collect()))
    assert whole == merged


# ---- per-source survivor caps --------------------------------------------


def test_survivors_capped_bites(spark):
    from mimir_spark.operators.dedup import dedup_survivors_capped

    rows = dedup_survivors_capped(spark, SF_CORRECT, cap=10).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    # every source capped at 10; survivors pre-cap exceed the cap
    assert all(len(v) == 10 for v in per_src.values())
    assert all(v[0].n_source_survivors > 10 for v in per_src.values())
    # kept docs are the n_chars-descending head of each source
    for v in per_src.values():
        ranks = sorted(r.rk for r in v)
        assert ranks == list(range(1, 11))


def test_survivors_capped_excludes_losers(spark):
    """No capped-keep row may be a near-dup loser (cluster member that
    is not its cluster's survivor)."""
    from mimir_spark.operators.dedup import (
        dedup_clusters,
        dedup_survivors,
        dedup_survivors_capped,
    )

    kept = {
        r.doc_id
        for r in dedup_survivors_capped(spark, SF_SMOKE, cap=5).collect()
    }
    clustered = {
        r.doc_id
        for r in dedup_clusters(spark, SF_SMOKE, pair_source="lsh").collect()
    }
    surv = {
        r.survivor_doc_id
        for r in dedup_survivors(spark, SF_SMOKE, pair_source="lsh").collect()
    }
    losers = clustered - surv
    assert not (kept & losers)


def test_survivors_capped_window_group_limit(spark):
    """The per-source cap must execute as WindowGroupLimit (cap-sized
    per-partition heaps BEFORE the exchange), not a full per-source
    sort — sample_reservoir's pinned shape."""
    from mimir_spark.operators.dedup import dedup_survivors_capped

    plan = dedup_survivors_capped(spark, SF_SMOKE)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ---- ema_user_value history guard ----------------------------------------


def test_ema_guard_trips_on_long_history(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from mimir_spark.operators.features import ema_user_value

    with pytest.raises(SparkRuntimeException, match="max_history"):
        ema_user_value(spark, SF_SMOKE, max_history=3).collect()


def test_ema_guard_passes_within_bound(spark):
    from mimir_spark.operators.features import ema_user_value

    assert ema_user_value(spark, SF_SMOKE, max_history=10_000).count() > 0


# ---- JPEG marker-walk fixes ----------------------------------------------


def _rgb_jpeg() -> bytes:
    from mimir_spark.operators.jpeg import encode_jpeg

    rng = np.random.RandomState(7)
    px = (rng.randint(0, 2, (16, 16, 3)) * 128 + 64).astype(np.uint8)
    return encode_jpeg(px)


def test_jpeg_fill_bytes_and_tem_marker_accepted():
    """T.81 B.1.1.2 fill bytes (0xFF padding before a marker id) and
    the standalone TEM marker must not break the header walk."""
    from mimir_spark.operators.jpeg import decode_jpeg_pixels

    payload = _rgb_jpeg()
    w0, h0, px0 = decode_jpeg_pixels(payload)
    i = payload.index(b"\xff\xdb")  # first DQT segment boundary
    padded = payload[:i] + b"\xff\xff" + b"\xff\x01" + payload[i:]
    w1, h1, px1 = decode_jpeg_pixels(padded)
    assert (w0, h0) == (w1, h1) and np.array_equal(px0, px1)


def test_jpeg_multi_scan_baseline_raises_unsupported():
    """A baseline file whose SOS covers fewer components than the SOF
    declares (non-interleaved multi-scan) must raise UnsupportedJpeg —
    NOT silently decode the Y scan with zeroed chroma."""
    import struct

    from mimir_spark.operators.jpeg import UnsupportedJpeg, decode_jpeg_pixels

    payload = _rgb_jpeg()
    i = payload.index(b"\xff\xda")
    # replace the 3-component SOS with a 1-component (Y-only) SOS
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    hacked = (
        payload[:i]
        + b"\xff\xda"
        + struct.pack(">H", len(sos) + 2)
        + sos
        + payload[i + 14 :]
    )
    with pytest.raises(UnsupportedJpeg, match="non-interleaved"):
        decode_jpeg_pixels(hacked)


# ---- approx_quantiles tie robustness --------------------------------------


def test_approx_quantiles_all_duplicates_flag_one(spark, tmp_path):
    """All-duplicate group: count(<= estimate) is the WHOLE group, so
    the old point-rank flag was deterministically 0; the rank-interval
    flag must be 1 (interval [0, 1] covers any p)."""
    from mimir_spark.operators.relational2 import approx_quantiles

    import datetime

    d0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, "O", 100.0, d0, "1-URGENT") for i in range(50)] + [
        (100 + i, 1, "O", float(100 + (i % 3)), d0, "2-HIGH")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    out = str(tmp_path / "orders_dup")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    res = {r.o_orderpriority: r for r in approx_quantiles(spark, out).collect()}
    assert res["1-URGENT"].p50_within == 1
    assert res["1-URGENT"].p90_within == 1
    assert res["2-HIGH"].p50_within == 1
    assert res["2-HIGH"].p90_within == 1


# ---- drop_bucketed_table: qualified / mixed-case names --------------------


def test_drop_bucketed_table_mixed_case(spark, sf_smoke):
    import os

    from mimir_spark.sources.io import drop_bucketed_table, write_bucketed

    df = spark.read.parquet(f"{sf_smoke}/region.parquet")
    drop_bucketed_table(spark, "CapsTable")
    write_bucketed(df, "CapsTable", ["r_regionkey"], 2)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert os.path.isdir(f"{wh}/capstable")  # saveAsTable lowercases
    drop_bucketed_table(spark, "CapsTable")
    assert not os.path.exists(f"{wh}/capstable")
    # the re-write after a drop must not hit LOCATION_ALREADY_EXISTS
    write_bucketed(df, "CapsTable", ["r_regionkey"], 2)
    drop_bucketed_table(spark, "CapsTable")


def test_drop_bucketed_table_qualified_name(spark, sf_smoke):
    import os

    from mimir_spark.sources.io import drop_bucketed_table, write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS capdb")
    df = spark.read.parquet(f"{sf_smoke}/region.parquet")
    drop_bucketed_table(spark, "capdb.tbl")
    write_bucketed(df, "capdb.tbl", ["r_regionkey"], 2)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert os.path.isdir(f"{wh}/capdb.db/tbl")
    drop_bucketed_table(spark, "capdb.tbl")
    assert not os.path.exists(f"{wh}/capdb.db/tbl")


# ---- streaming EMA rounding parity ----------------------------------------


def test_spark_round6_half_up_matches_engine(spark):
    """Python round() is half-even (2.5e-6 -> 2e-6); Spark F.round is
    HALF_UP on the shortest decimal repr (2.5e-6 -> 3e-6). The
    streaming kernel must match the engine."""
    from mimir_spark.streaming.stateful import _spark_round6

    # 0.0078125 = 1/128 is binary-EXACT and ends in 5 at the 7th
    # decimal: a true tie, where half-even (builtin round) and the
    # engine's HALF_UP disagree.
    vals = [0.0078125, 2.5e-6, 1.5e-6, 0.1234565, 7.0000005, -0.0078125]
    engine = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6))
        .collect()
    ]
    assert [_spark_round6(v) for v in vals] == engine
    # and the true-tie case genuinely differs from builtin round()
    assert _spark_round6(0.0078125) != round(0.0078125, 6)


# ---- _term_shards memo -----------------------------------------------------


def test_term_shards_memoized(spark):
    """After the first resolution a repeat probe must not touch the
    engine at all (passing spark=None proves no job is run)."""
    from mimir_spark.operators import retrieval

    retrieval._TERM_SHARD_MEMO.clear()
    first = retrieval._term_shards(spark, ("alpha", "beta"))
    again = retrieval._term_shards(None, ("alpha", "beta"))
    assert first == again
    mixed = retrieval._term_shards(spark, ("beta", "gamma"))
    assert mixed[0] == first[1]


# ---- ANN store maintenance (compaction + re-key) ---------------------------


def test_ann_store_compact_then_next_generation_probe_equivalence(
    spark, sf_smoke, tmp_path
):
    """The generation contract end-to-end: ingest 2 files → stop →
    compact_ann_store (commit log + checkpoint retired, duplicates
    dropped, file count reduced) → next generation streams file 3 into
    a FRESH sibling store → export over [base, gen2] → the published
    index answers probes exactly like the all-batch operator."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.ivfpq import (
        ann_ivfpq_query_indexed,
        ann_ivfpq_topk,
    )
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ann import (
        compact_ann_store,
        export_ivfpq_index_from_stream,
        streaming_ivfpq_encode_store,
    )

    stage = str(tmp_path / "stage")
    load_table(spark, sf_smoke, "embeddings").repartition(3).write.parquet(
        stage
    )
    files = sorted(globmod.glob(f"{stage}/part-*.parquet"))
    assert len(files) == 3
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    os.makedirs(in1), os.makedirs(in2)
    shutil.copy(files[0], f"{in1}/f0.parquet")
    shutil.copy(files[1], f"{in1}/f1.parquet")
    shutil.copy(files[2], f"{in2}/f2.parquet")

    store1, ckpt1 = str(tmp_path / "store1"), str(tmp_path / "ckpt1")
    q = streaming_ivfpq_encode_store(spark, in1, sf_smoke, store1, ckpt1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    n_before = len(globmod.glob(f"{store1}/part-*.parquet"))
    committed = spark.read.parquet(store1).count()
    n_files = compact_ann_store(spark, store1, ckpt1)
    assert n_files == 1
    assert not os.path.exists(f"{store1}/_spark_metadata")
    assert not os.path.exists(ckpt1)
    assert len(globmod.glob(f"{store1}/part-*.parquet")) == 1 <= n_before
    assert spark.read.parquet(store1).count() == committed

    store2, ckpt2 = str(tmp_path / "store2"), str(tmp_path / "ckpt2")
    q2 = streaming_ivfpq_encode_store(spark, in2, sf_smoke, store2, ckpt2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    idx = str(tmp_path / "idx")
    export_ivfpq_index_from_stream(spark, sf_smoke, [store1, store2], idx)
    got = {
        tuple(r) for r in ann_ivfpq_query_indexed(spark, sf_smoke, idx).collect()
    }
    expect = {tuple(r) for r in ann_ivfpq_topk(spark, sf_smoke).collect()}
    assert got == expect and got


def test_ann_store_compact_drops_replay_duplicates(spark, sf_smoke, tmp_path):
    """Overlapping generations replay-duplicate vec_ids; the encode is
    deterministic so duplicates are bit-identical and compaction's
    per-vec_id dedup is exact."""
    from pyspark.sql import functions as F

    from mimir_spark.operators.ivfpq import _residual_codebooks
    from mimir_spark.operators.similarity import _ivf_centroids
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ann import (
        compact_ann_store,
        streaming_ivfpq_encode,
    )

    cent_rows = _ivf_centroids(spark, sf_smoke).collect()
    books = _residual_codebooks(spark, sf_smoke)
    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    codes = streaming_ivfpq_encode(emb, cent_rows, books)
    store = str(tmp_path / "dupstore")
    codes.write.parquet(store)
    codes.write.mode("append").parquet(store)  # the replayed generation
    assert spark.read.parquet(store).count() == 2 * emb.count()
    compact_ann_store(spark, store)
    deduped = spark.read.parquet(store)
    assert deduped.count() == emb.count()
    assert (
        deduped.groupBy("neighbor_id").count().filter("count > 1").count()
        == 0
    )


def test_retrain_ann_store_rekeys_to_new_quantizers(
    spark, sf_smoke, tmp_path
):
    """Re-key under drift: retrain on a DIFFERENT training corpus →
    the replaced store is bit-identical to what the stream would have
    emitted had it always run with the new quantizers."""
    from mimir_spark.operators.ivfpq import _residual_codebooks
    from mimir_spark.operators.similarity import _ivf_centroids
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ann import (
        retrain_ann_store,
        streaming_ivfpq_encode,
    )

    corpus_dir = str(tmp_path / "corpus")
    load_table(spark, sf_smoke, "embeddings").write.parquet(corpus_dir)

    store = str(tmp_path / "store")
    # old generation encoded with sf_smoke quantizers
    old = streaming_ivfpq_encode(
        spark.read.parquet(corpus_dir),
        _ivf_centroids(spark, sf_smoke).collect(),
        _residual_codebooks(spark, sf_smoke),
    )
    old.write.parquet(store)

    train = "/root/testdata/sf0.01"  # the drift-adapted training corpus
    retrain_ann_store(spark, train, [corpus_dir], store)

    expect = {
        tuple(r)
        for r in streaming_ivfpq_encode(
            spark.read.parquet(corpus_dir),
            _ivf_centroids(spark, train).collect(),
            _residual_codebooks(spark, train),
        ).collect()
    }
    got = {tuple(r) for r in spark.read.parquet(store).collect()}
    assert got == expect and got
    # and the re-key genuinely changed the code space
    old_set = {tuple(r) for r in old.collect()}
    assert got != old_set


# ---- near-dup image survivors + streaming trigram LM -----------------------


def test_near_dup_survivors_keep_highest_resolution(spark):
    """Every content group's survivor must be an UPSCALED variant
    (v=2 or v=3 — 4x the base pixels): the image keep-rule prefers
    resolution, unlike the text families' keep-longest."""
    from mimir_spark.operators.multimodal import (
        multimodal_near_dup_survivors,
    )

    rows = multimodal_near_dup_survivors(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        s = r.cluster_id // 4
        w0, h0 = (s % 12) + 5, (s % 6) + 5
        assert r.survivor_doc_id % 4 in (2, 3)
        assert r.survivor_pixels == 4 * w0 * h0
        assert r.n_members >= 2


def test_streaming_trigram_finalize_matches_batch(spark, sf_smoke, tmp_path):
    """Incremental trigram-KN over a 2-file split == the single-pass
    batch operator, bit-for-bit (the trigram_parts SUM monoid +
    shared kneser_ney3_from_parts scorer)."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.quality import kneser_ney3_logppl
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ngram_lm import (
        finalize_kneser_ney3_logppl,
        streaming_trigram_build,
    )

    stage = str(tmp_path / "stage")
    load_table(spark, sf_smoke, "documents").repartition(2).write.parquet(
        stage
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, f in enumerate(sorted(globmod.glob(f"{stage}/part-*.parquet"))):
        shutil.copy(f, f"{in_dir}/f{i}.parquet")

    dabc_dir = str(tmp_path / "dabc")
    q = streaming_trigram_build(
        spark, in_dir, dabc_dir, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        tuple(r)
        for r in finalize_kneser_ney3_logppl(spark, dabc_dir).collect()
    }
    expect = {tuple(r) for r in kneser_ney3_logppl(spark, sf_smoke).collect()}
    assert got == expect and got


# ---- t-closeness ---------------------------------------------------------


def test_t_closeness_matches_python_recompute(spark):
    """EMD per nation recomputed in plain Python (pandas) from the
    same parquet — total variation between class and global
    market-segment distributions."""
    import pandas as pd

    from mimir_spark.operators.profiling import t_closeness_report

    got = {
        r["c_nationkey"]: (r["class_size"], r["emd"], r["above_t"])
        for r in t_closeness_report(spark, SF_SMOKE).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[
        ["c_nationkey", "c_mktsegment"]
    ]
    glob = pdf["c_mktsegment"].value_counts()
    n_total = len(pdf)
    assert set(got) == set(pdf["c_nationkey"].unique())
    for nk, grp in pdf.groupby("c_nationkey"):
        cls = grp["c_mktsegment"].value_counts()
        n_c = len(grp)
        emd = 0.5 * sum(
            abs(cls.get(s, 0) / n_c - glob[s] / n_total) for s in glob.index
        )
        size, got_emd, above = got[nk]
        assert size == n_c
        assert abs(got_emd - emd) < 1e-6
        assert above == (1 if emd > 0.2 else 0)


def test_t_closeness_emd_bounds(spark):
    """EMD is a total-variation distance: every class lands in
    [0, 1], and the flag agrees with the reported value."""
    from mimir_spark.operators.profiling import t_closeness_report

    rows = t_closeness_report(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["emd"] <= 1.0
        if r["emd"] > 0.200001:
            assert r["above_t"] == 1
        if r["emd"] < 0.199999:
            assert r["above_t"] == 0


# ---- PSI feature drift ---------------------------------------------------


def test_psi_identical_snapshots_zero(spark):
    """drift_psi(ref, ref) is exactly 0 for every type: identical
    counts make every Laplace term pr == pc."""
    from mimir_spark.operators.features import drift_psi
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    rows = drift_psi(ev, ev).collect()
    assert rows
    for r in rows:
        assert r["psi"] == 0.0
        assert r["drifted"] == 0
        assert r["n_ref"] == r["n_cur"]


def test_psi_flags_injected_shift_only(spark):
    """The wrapper's +25 purchase shift is the one drifted type; the
    unshifted types (same generator, split by user parity) stay under
    the 0.1 'watch' threshold."""
    from mimir_spark.operators.features import feature_drift_psi

    got = {
        r["event_type"]: (r["psi"], r["drifted"])
        for r in feature_drift_psi(spark, SF_CORRECT).collect()
    }
    assert got["purchase"][1] == 1
    for t, (psi, flag) in got.items():
        if t != "purchase":
            assert flag == 0
            assert psi < 0.1


def test_psi_matches_python_recompute(spark):
    """PSI for every type recomputed in plain Python from the same
    parquet (same binning + Laplace smoothing)."""
    import math

    import pandas as pd

    from mimir_spark.operators.features import feature_drift_psi

    got = {
        r["event_type"]: r["psi"]
        for r in feature_drift_psi(spark, SF_SMOKE).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[
        ["user_id", "event_type", "value"]
    ]
    ref = pdf[pdf.user_id % 2 == 0]
    cur = pdf[pdf.user_id % 2 == 1].copy()
    cur.loc[cur.event_type == "purchase", "value"] += 25.0
    for t in sorted(pdf.event_type.unique()):
        rv = ref[ref.event_type == t]["value"].to_numpy()
        cv = cur[cur.event_type == t]["value"].to_numpy()
        vmin, vmax = rv.min(), rv.max()

        def bins(v):
            import numpy as np

            if vmax == vmin:
                return np.zeros(len(v), dtype=int)
            b = np.floor(((v - vmin) / (vmax - vmin)) * 10).astype(int)
            return np.clip(b, 0, 9)

        nr = pd.Series(bins(rv)).value_counts()
        nc = pd.Series(bins(cv)).value_counts()
        psi = 0.0
        for b in range(10):
            pr = (nr.get(b, 0) + 1.0) / (len(rv) + 10.0)
            pc = (nc.get(b, 0) + 1.0) / (len(cv) + 10.0)
            psi += (pr - pc) * math.log(pr / pc)
        assert abs(got[t] - psi) < 1e-6, t


# ---- SQ8 scalar quantization ---------------------------------------------


def test_sq_codes_in_range_and_deterministic(spark):
    """Every code is an int in [0, 255]; encoding is a pure function
    of the data (two runs identical)."""
    from mimir_spark.operators.pq import _normalized_pts, sq_bounds, sq_encode

    pts = _normalized_pts(spark, SF_SMOKE)
    codes = sq_encode(pts, sq_bounds(pts))
    rows = {r["neighbor_id"]: list(r["code"]) for r in codes.collect()}
    assert rows
    for code in rows.values():
        assert len(code) == 64
        assert all(0 <= c <= 255 for c in code)
    again = {
        r["neighbor_id"]: list(r["code"])
        for r in sq_encode(pts, sq_bounds(pts)).collect()
    }
    assert rows == again


def test_sq_recall_floor_beats_pq(spark):
    """SQ8 keeps per-dim resolution this corpus's neighbor signal
    needs: recall@5 >= 0.9 on average, strictly above flat PQ on the
    same corpus (the quantization-grain story ann_pq_recall pins)."""
    from mimir_spark.operators.pq import ann_pq_recall, ann_sq_recall

    sq = {
        r["query_id"]: r["recall"]
        for r in ann_sq_recall(spark, SF_CORRECT).collect()
    }
    pq = {
        r["query_id"]: r["recall"]
        for r in ann_pq_recall(spark, SF_CORRECT).collect()
    }
    assert sum(sq.values()) / len(sq) >= 0.9
    assert sum(sq.values()) > sum(pq.values())


def test_sq_reconstruction_error_bounded(spark):
    """Midpoint decode puts every reconstructed coordinate within
    half a quantization step of the original: |e_d − x̂_d| ≤
    (mx_d − mn_d)/512 (+ float slack)."""
    import numpy as np

    from mimir_spark.operators.pq import _normalized_pts, sq_bounds, sq_encode

    pts = _normalized_pts(spark, SF_SMOKE)
    bounds_row = sq_bounds(pts).collect()[0]
    mns = np.array([bounds_row[f"mn{d}"] for d in range(64)])
    mxs = np.array([bounds_row[f"mx{d}"] for d in range(64)])
    raw = {r["vec_id"]: np.array(r["e"]) for r in pts.collect()}
    codes = {
        r["neighbor_id"]: np.array(r["code"])
        for r in sq_encode(pts, sq_bounds(pts)).collect()
    }
    span = mxs - mns
    for vid, e in raw.items():
        decoded = mns + ((codes[vid] + 0.5) / 256.0) * span
        assert np.all(np.abs(e - decoded) <= span / 512.0 + 1e-12)


# ---- distributed logistic regression -------------------------------------


def test_logreg_distills_gopher_gate(spark):
    """The trained linear scorer reproduces the rule verdict on >=90%
    of docs at sf0.01 — the distillation actually works."""
    from mimir_spark.operators.mltrain import logreg_score_quality

    rows = logreg_score_quality(spark, SF_CORRECT).collect()
    acc = sum(r["correct"] for r in rows) / len(rows)
    assert acc >= 0.90
    # both classes are actually predicted (not a constant classifier)
    preds = {r["pred"] for r in rows}
    assert preds == {0, 1}


def test_logreg_matches_numpy_reference(spark):
    """Full-batch GD recomputed in NumPy from the same features: every
    round's weights agree on the 6dp grid (engine-sum ULP noise is
    absorbed by the per-round rounding, the kmeans contract)."""
    import numpy as np

    from mimir_spark.operators.mltrain import (
        LOGREG_ITERS,
        LOGREG_LR,
        logreg_train_quality,
        quality_features,
    )

    got = {
        r["step"]: (r["w0"], r["w1"], r["w2"], r["w3"])
        for r in logreg_train_quality(spark, SF_SMOKE).collect()
    }
    rows = quality_features(spark, SF_SMOKE).collect()
    X = np.array([[r["x0"], r["x1"], r["x2"], r["x3"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    n = len(y)
    w = np.zeros(4)
    for t in range(LOGREG_ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = np.round(w - LOGREG_LR * (X.T @ (p - y) / n), 6)
        assert np.allclose(np.array(got[t + 1]), w, atol=2e-6), t


def test_logreg_loss_decreases(spark):
    """Log-loss under the trajectory's first weights exceeds the loss
    under the final weights — GD is actually descending."""
    import numpy as np

    from mimir_spark.operators.mltrain import (
        logreg_train_quality,
        quality_features,
    )

    rows = quality_features(spark, SF_CORRECT).collect()
    X = np.array([[r["x0"], r["x1"], r["x2"], r["x3"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    traj = logreg_train_quality(spark, SF_CORRECT).collect()
    w1 = np.array([traj[0][f"w{j}"] for j in range(4)])
    wT = np.array([traj[-1][f"w{j}"] for j in range(4)])

    def loss(w):
        p = np.clip(1.0 / (1.0 + np.exp(-(X @ w))), 1e-12, 1 - 1e-12)
        return -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()

    assert loss(wT) < loss(w1)


# ---- b-bit minwise hashing -------------------------------------------------


def test_bbit_estimates_track_exact(spark):
    """On the verified pair set: the full-signature estimate stays
    within 4·sd(J) of exact, the 1-bit estimate within its (wider)
    4·0.088 envelope (flag pinned 1), and b=1 is genuinely noisier."""
    import math

    from mimir_spark.operators.dedup import minhash_bbit_jaccard

    rows = minhash_bbit_jaccard(spark, SF_CORRECT).collect()
    assert rows
    err_sig = err_bit = 0.0
    for r in rows:
        assert r["within_4sd"] == 1
        sd_sig = math.sqrt(r["j_exact"] * (1 - r["j_exact"]) / 128) or 0.05
        assert abs(r["j_sig"] - r["j_exact"]) <= 4.5 * sd_sig
        err_sig += abs(r["j_sig"] - r["j_exact"])
        err_bit += abs(r["j_bbit"] - r["j_exact"])
    assert err_bit >= err_sig  # the storage saving costs variance


def test_bbit_identical_texts_estimate_one(spark):
    """Signatures are a pure function of the shingle set: two docs
    with identical text get identical signatures, so both the full
    and the 1-bit estimates are exactly 1.0 on a crafted pair."""
    from mimir_spark.operators.dedup import _minhash_doc_table

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: list(r["sig"]) for r in _minhash_doc_table(docs).collect()}
    assert rows[1] == rows[2]


# ---- exact-k weighted sampling --------------------------------------------


def test_weighted_k_sample_shape_and_bias(spark):
    """Exactly k rows per language (stratum >= k here), and the
    selection is genuinely length-BIASED: the sampled docs' mean
    weight exceeds the stratum mean weight overall (A-ES keys favor
    high-w docs)."""
    from mimir_spark.operators.pipeline import WEIGHTED_K, sample_weighted_k
    from mimir_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    got = sample_weighted_k(spark, SF_CORRECT).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert len(rows) == WEIGHTED_K
        assert sorted(r["rk"] for r in rows) == list(
            range(1, WEIGHTED_K + 1)
        )
    docs = load_table(spark, SF_CORRECT, "documents")
    pop_mean = docs.agg(
        F.avg(F.least(F.lit(1.0), F.col("n_chars") / 400.0))
    ).collect()[0][0]
    samp_mean = sum(r["weight"] for r in got) / len(got)
    assert samp_mean > pop_mean


def test_weighted_k_matches_python_aes(spark):
    """The kept set per language equals a plain-Python A-ES recompute
    (k largest ln(u)/w keys) from the same parquet."""
    import math

    import pandas as pd

    from mimir_spark.operators.pipeline import (
        _HASH_MOD,
        _HASH_MULT,
        WEIGHTED_K,
        sample_weighted_k,
    )

    got = {}
    for r in sample_weighted_k(spark, SF_SMOKE).collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "lang", "n_chars"]
    ]
    for lang, grp in pdf.groupby("lang"):
        keys = []
        for doc_id, n_chars in zip(grp["doc_id"], grp["n_chars"]):
            u = ((doc_id * _HASH_MULT) % _HASH_MOD + 1.0) / float(_HASH_MOD)
            w = min(1.0, n_chars / 400.0)
            keys.append((round(math.log(u) / w, 9), -doc_id, doc_id))
        keep = {
            d for _, _, d in sorted(keys, reverse=True)[:WEIGHTED_K]
        }
        assert got[lang] == keep, lang


# ---- Poisson bootstrap CI --------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    """Every type's 95% CI contains its point mean, has positive
    width, and the interval shrinks roughly like 1/sqrt(n): the
    sf0.01 widths must be materially narrower than sf0.001's."""
    from mimir_spark.operators.stats import bootstrap_ci_poisson

    small = {
        r["event_type"]: r for r in bootstrap_ci_poisson(spark, SF_SMOKE).collect()
    }
    big = {
        r["event_type"]: r
        for r in bootstrap_ci_poisson(spark, SF_CORRECT).collect()
    }
    for t, r in big.items():
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], t
        assert r["ci_width"] > 0
        # ~10x the data → ~1/sqrt(10) ≈ 0.32x the width; allow slack
        assert r["ci_width"] < small[t]["ci_width"] * 0.7, t


def test_bootstrap_ci_matches_numpy_replicates(spark):
    """Replicate means recomputed in NumPy from the same parquet with
    the same hash draws give the same CI element picks."""
    import numpy as np
    import pandas as pd

    from mimir_spark.operators.stats import (
        _POIS1_CDF,
        BOOT_B,
        BOOT_M31,
        bootstrap_ci_poisson,
    )

    got = {
        r["event_type"]: (r["ci_lo"], r["ci_hi"])
        for r in bootstrap_ci_poisson(spark, SF_SMOKE).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[
        ["event_id", "event_type", "value"]
    ]
    ts = np.array(_POIS1_CDF)
    for t, grp in pdf.groupby("event_type"):
        ids = grp["event_id"].to_numpy(np.int64)
        vals = grp["value"].to_numpy(np.float64)
        import hashlib

        ms = []
        for b in range(BOOT_B):
            u = np.array(
                [
                    (
                        int.from_bytes(
                            hashlib.md5(f"{i}:{b}".encode()).digest()[:4],
                            "big",
                        )
                        & BOOT_M31
                    )
                    / float(BOOT_M31 + 1)
                    for i in ids
                ]
            )
            w = np.searchsorted(ts, u, side="right")
            ms.append(round((w * vals).sum() / w.sum(), 6))
        ms.sort()
        lo = ms[max(1, int(BOOT_B * 0.025)) - 1]
        hi = ms[int(BOOT_B * 0.975) - 1]
        assert abs(got[t][0] - lo) < 2e-6 and abs(got[t][1] - hi) < 2e-6, t


def test_sq_index_roundtrip_matches_in_memory(spark, tmp_path):
    """write_sq_index → ann_sq_query_indexed equals ann_sq_topk
    row-for-row: the persisted codes + bounds carry the whole search
    state."""
    from mimir_spark.operators.pq import (
        ann_sq_query_indexed,
        ann_sq_topk,
        write_sq_index,
    )

    idx = str(tmp_path / "sq_idx")
    write_sq_index(spark, SF_SMOKE, idx)
    got = {
        tuple(r) for r in ann_sq_query_indexed(spark, SF_SMOKE, idx).collect()
    }
    expect = {tuple(r) for r in ann_sq_topk(spark, SF_SMOKE).collect()}
    assert got == expect and got


def test_ivfsq_recall_beats_ivfpq(spark):
    """The quantization-matrix claim: at 64 B/vector the SQ residual
    codes keep >= 0.9 recall@5 where the 4 B PQ codes sit far lower on
    this corpus (0.96 vs 0.34 measured at sf0.01)."""
    from mimir_spark.operators.ivfpq import ann_ivfpq_recall, ann_ivfsq_recall

    sq = {
        r["query_id"]: r["recall"]
        for r in ann_ivfsq_recall(spark, SF_CORRECT).collect()
    }
    pq = {
        r["query_id"]: r["recall"]
        for r in ann_ivfpq_recall(spark, SF_CORRECT).collect()
    }
    assert sum(sq.values()) / len(sq) >= 0.9
    assert sum(sq.values()) > sum(pq.values())


def test_ivfsq_matches_exact_within_probed_cells(spark):
    """Determinism + semantics: for every reported neighbor the
    distance equals the exact L2^2 between the query residual and the
    decoded code residual recomputed in NumPy."""
    import numpy as np

    from mimir_spark.operators.ivfpq import (
        _cell_residuals,
        _residual_sq_bounds,
        ann_ivfsq_topk,
    )
    from mimir_spark.operators.pq import SQ_LEVELS, _normalized_pts
    from mimir_spark.operators.similarity import _ivf_centroids

    got = ann_ivfsq_topk(spark, SF_SMOKE).collect()
    res = {
        r["vec_id"]: (r["cell_id"], np.array(r["res"]))
        for r in _cell_residuals(spark, SF_SMOKE).collect()
    }
    mns_l, mxs_l = _residual_sq_bounds(spark, SF_SMOKE)
    mns, mxs = np.array(mns_l), np.array(mxs_l)
    spans = mxs - mns
    safe = np.where(spans == 0.0, 1.0, spans)
    cents = {
        r["cell_id"]: np.array(r["cent"])
        for r in _ivf_centroids(spark, SF_SMOKE).collect()
    }
    pts = {
        r["vec_id"]: np.array(r["e"])
        for r in _normalized_pts(spark, SF_SMOKE).collect()
    }
    for r in got:
        cell, nres = res[r["neighbor_id"]]
        qres = pts[r["query_id"]] - cents[cell]
        C = np.clip(np.floor(((nres - mns) / safe) * SQ_LEVELS), 0, 255)
        C[spans == 0.0] = 0
        dec = mns + ((C + 0.5) / float(SQ_LEVELS)) * spans
        dist = round(float(((qres - dec) ** 2).sum()), 6)
        assert abs(dist - r["dist"]) < 2e-6, r


# ---- descriptive-stats surface (corr / regr / chi2) ----------------------


def test_corr_matrix_matches_numpy(spark):
    """Spark's corr agg vs numpy.corrcoef on the same sf0.001 rows —
    two independent co-moment implementations, 6dp contract."""
    from mimir_spark.operators.stats import corr_matrix
    from mimir_spark.sources.tables import load_table

    got = {(r["x"], r["y"]): r["corr"] for r in corr_matrix(spark, SF_SMOKE).collect()}
    pdf = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .toPandas()
    )
    for (x, y), c in got.items():
        expect = float(np.corrcoef(pdf[x], pdf[y])[0, 1])
        assert abs(c - expect) < 1e-5, (x, y, c, expect)


def test_linreg_by_group_matches_polyfit(spark):
    """Per-group regr_slope/intercept vs numpy.polyfit, r² vs the
    squared Pearson correlation."""
    from mimir_spark.operators.stats import linreg_by_group
    from mimir_spark.sources.tables import load_table

    rows = linreg_by_group(spark, SF_SMOKE).collect()
    pdf = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    assert rows
    for r in rows:
        g = pdf[
            (pdf.l_returnflag == r["l_returnflag"])
            & (pdf.l_linestatus == r["l_linestatus"])
        ]
        assert len(g) == r["n"]
        slope, intercept = np.polyfit(g.l_quantity, g.l_extendedprice, 1)
        r2 = float(np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]) ** 2
        assert abs(r["slope"] - slope) < 1e-4 * max(1.0, abs(slope))
        assert abs(r["intercept"] - intercept) < 1e-3 * max(1.0, abs(intercept))
        assert abs(r["r2"] - r2) < 1e-5


def test_chi2_matches_hand_rolled(spark):
    """Observed/expected/chi² recomputed with pandas crosstab — the
    window-over-aggregate plan must equal the textbook formula, and
    the corpus must be scanned exactly once (single Exchange source)."""
    from mimir_spark.operators.stats import chi2_lang_source
    from mimir_spark.sources.tables import load_table

    df = chi2_lang_source(spark, SF_SMOKE)
    # single corpus scan: the (pre-AQE-execution) plan reads
    # `documents` exactly once — marginals come from the aggregate
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1, plan
    rows = df.collect()
    pdf = load_table(spark, SF_SMOKE, "documents").select("lang", "source").toPandas()
    ct = pdf.groupby(["lang", "source"]).size()
    grand = float(len(pdf))
    row_t = pdf.groupby("lang").size()
    col_t = pdf.groupby("source").size()
    chi2 = 0.0
    for (lang, src), obs in ct.items():
        e = row_t[lang] * col_t[src] / grand
        chi2 += round((obs - e) ** 2 / e, 6)
    by_cell = {(r["lang"], r["source"]): r for r in rows}
    assert len(by_cell) == len(ct)
    for (lang, src), obs in ct.items():
        r = by_cell[(lang, src)]
        e = row_t[lang] * col_t[src] / grand
        assert r["obs"] == obs
        assert abs(r["expected"] - e) < 1e-5
        assert abs(r["chi2"] - round(chi2, 4)) < 1e-9
        assert r["dof"] == (pdf.lang.nunique() - 1) * (pdf.source.nunique() - 1)


# ---- KMV / theta-sketch set operations -----------------------------------


def _exact_shingle_sets(spark):
    from mimir_spark.functions.text import word_shingle_hashes
    from mimir_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    rows = (
        docs.select("source", F.explode(word_shingle_hashes("text")).alias("h"))
        .distinct()
        .collect()
    )
    sets: dict[str, set] = {}
    for r in rows:
        sets.setdefault(r["source"], set()).add(r["h"])
    return sets


def test_kmv_estimates_track_exact(spark):
    """Every pairwise estimate must sit inside the KMV error envelope
    around the exact set algebra: ~3/sqrt(K) relative for the
    cardinalities, 3·sqrt(J(1-J)/K) absolute for the Jaccard."""
    from mimir_spark.operators.sketches import KMV_K, kmv_source_setops

    sets = _exact_shingle_sets(spark)
    got = kmv_source_setops(spark, SF_CORRECT).collect()
    assert len(got) == len(sets) * (len(sets) - 1) // 2
    rel = 3.0 / (KMV_K ** 0.5)
    for r in got:
        A, B = sets[r["source_a"]], sets[r["source_b"]]
        assert abs(r["est_a"] - len(A)) <= rel * len(A), r
        assert abs(r["est_b"] - len(B)) <= rel * len(B), r
        u = len(A | B)
        assert abs(r["union_est"] - u) <= rel * u, r
        j = len(A & B) / u
        sd = max((j * (1 - j) / KMV_K) ** 0.5, 1.0 / KMV_K)
        assert abs(r["jaccard_est"] - j) <= 3 * sd + rel * j, r
        assert abs(r["inter_est"] - len(A & B)) <= (3 * sd + rel * j) * u + rel * len(A & B) + 1, r


def test_kmv_exhausted_sketch_is_exact(spark):
    """With k above every source's distinct-shingle count the sketch
    IS the set: every estimate collapses to the exact cardinality."""
    from mimir_spark.operators.sketches import kmv_source_setops

    sets = _exact_shingle_sets(spark)
    got = kmv_source_setops(spark, SF_CORRECT, k=1 << 20).collect()
    for r in got:
        A, B = sets[r["source_a"]], sets[r["source_b"]]
        assert r["est_a"] == float(len(A))
        assert r["est_b"] == float(len(B))
        assert r["union_est"] == float(len(A | B))
        assert r["inter_est"] == round(
            len(A & B) / len(A | B) * len(A | B), 4
        )


def test_kmv_bottomk_is_mergeable(spark):
    """bottom-k(A ∪ B) computed from bottom-k(A) ∪ bottom-k(B) equals
    bottom-k over the full union — the mergeability claim the pair
    stage relies on."""
    from mimir_spark.operators.sketches import KMV_K

    sets = _exact_shingle_sets(spark)
    srcs = sorted(sets)[:4]
    for a, b in [(srcs[0], srcs[1]), (srcs[2], srcs[3])]:
        ska = sorted(sets[a])[:KMV_K]
        skb = sorted(sets[b])[:KMV_K]
        merged = sorted(set(ska) | set(skb))[:KMV_K]
        full = sorted(sets[a] | sets[b])[:KMV_K]
        assert merged == full


# ---- Gonzalez greedy k-center ---------------------------------------------


def test_kcenter_matches_numpy_greedy(spark):
    """The full selection trace vs an independent numpy
    implementation of farthest-point greedy on the same vectors."""
    from mimir_spark.operators.clustering import kcenter_greedy
    from mimir_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    sel = [0]
    dmin = ((X - X[0]) ** 2).sum(axis=1)
    expect = [(1, int(ids[0]), 0.0)]
    for r in range(2, 9):
        nxt = int(np.argmax(dmin))  # argmax returns FIRST max = lowest id
        expect.append((r, int(ids[nxt]), round(float(dmin[nxt]), 6)))
        sel.append(nxt)
        dmin = np.minimum(dmin, ((X - X[nxt]) ** 2).sum(axis=1))
    cover = round(float(dmin.max()), 6)

    got = sorted(
        kcenter_greedy(spark, SF_SMOKE).collect(), key=lambda r: r["rank"]
    )
    for g, (rk, vid, rad) in zip(got, expect):
        assert g["rank"] == rk and g["vec_id"] == vid
        assert abs(g["sel_radius"] - rad) < 1e-6, (g, rad)
        assert abs(g["cover_radius"] - cover) < 1e-6
    # the selection radius trace is non-increasing and bounds coverage
    radii = [g["sel_radius"] for g in got[1:]]
    assert radii == sorted(radii, reverse=True)
    assert got[0]["cover_radius"] <= radii[-1] + 1e-9


# ---- Holt linear-trend smoothing -------------------------------------------


def test_holt_matches_hand_recurrence(spark):
    """Level/trend/forecast vs an independent Python recurrence over
    the same (ts, event_id)-ordered values."""
    from mimir_spark.operators.features import (
        HOLT_ALPHA,
        HOLT_BETA,
        holt_linear_user,
    )
    from mimir_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    hist: dict = {}
    for r in ev:
        hist.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    got = {r["user_id"]: r for r in holt_linear_user(spark, SF_SMOKE).collect()}
    assert set(got) == set(hist)
    for uid, rows in hist.items():
        vals = [v for _, _, v in sorted(rows)]
        l, b = vals[0], 0.0
        for v in vals[1:]:
            ln = HOLT_ALPHA * v + (1 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (ln - l) + (1 - HOLT_BETA) * b
            l = ln
        g = got[uid]
        assert g["n_events"] == len(vals)
        assert abs(g["level"] - l) < 1e-6, (uid, g["level"], l)
        assert abs(g["trend"] - b) < 1e-6
        assert abs(g["forecast_3"] - (l + 3 * b)) < 1e-5


def test_holt_tracks_linear_ramp(spark, tmp_path):
    """On a clean linear ramp v_t = 5t the trend must converge near
    the true slope and the 3-step forecast must lead the last level —
    the behavior that separates Holt from the flat EMA."""
    import pandas as pd

    from mimir_spark.operators.features import holt_linear_user

    n = 60
    pdf = pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime(range(n), unit="s"),
            "user_id": pd.array([1] * n, dtype="int64"),
            "event_type": ["view"] * n,
            "value": [5.0 * t for t in range(n)],
            "props": ["{}"] * n,
        }
    )
    out = str(tmp_path / "ramp")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    r = holt_linear_user(spark, out).collect()[0]
    assert abs(r["trend"] - 5.0) < 0.5
    assert r["forecast_3"] > r["level"] + 10


# ---- Benford + Laplace-mechanism release ----------------------------------


def test_benford_matches_hand_rolled(spark):
    import math

    from mimir_spark.operators.profiling import benford_digit_test
    from mimir_spark.sources.tables import load_table

    prices = [
        r["o_totalprice"]
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    ]
    obs = {d: 0 for d in range(1, 10)}
    for p in prices:
        obs[int(str(int(round(p * 100)))[0])] += 1
    total = sum(obs.values())
    chi2 = sum(
        round(
            (obs[d] - total * math.log10(1 + 1 / d)) ** 2
            / (total * math.log10(1 + 1 / d)),
            6,
        )
        for d in range(1, 10)
    )
    rows = {r["digit"]: r for r in benford_digit_test(spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(1, 10))
    for d in range(1, 10):
        r = rows[d]
        assert r["obs"] == obs[d], (d, r["obs"], obs[d])
        assert r["total"] == total
        assert abs(r["p_benford"] - math.log10(1 + 1 / d)) < 1e-6
        assert abs(r["chi2"] - round(chi2, 4)) < 1e-9


def test_dp_noise_is_laplace_shaped(spark):
    """Deviation from the true counts must look like Lap(1/eps):
    zero-mean-ish, mean |noise| near 1/eps, and eps=10 noise is
    ~10x smaller than eps=1 noise for the same cells."""
    from mimir_spark.operators.profiling import dp_count_laplace
    from mimir_spark.sources.tables import load_table

    true = {
        (r["lang"], r["source"]): r["n"]
        for r in load_table(spark, SF_CORRECT, "documents")
        .groupBy("lang", "source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got1 = {
        (r["lang"], r["source"]): r["noised_n"] - true[(r["lang"], r["source"])]
        for r in dp_count_laplace(spark, SF_CORRECT).collect()
    }
    noises = np.array(list(got1.values()))
    assert len(noises) == len(true) and len(noises) > 50
    # Lap(1) has mean |x| = 1 and mean 0; loose 4-sigma-ish bands
    assert abs(noises.mean()) < 0.8
    assert 0.5 < np.abs(noises).mean() < 2.0
    got10 = {
        k: r
        for k, r in (
            (
                (r["lang"], r["source"]),
                r["noised_n"] - true[(r["lang"], r["source"])],
            )
            for r in dp_count_laplace(spark, SF_CORRECT, epsilon=10.0).collect()
        )
    }
    for k, n1 in got1.items():
        assert abs(got10[k] - n1 / 10.0) < 5e-4, (k, n1, got10[k])


# ---- SCD2 history build ----------------------------------------------------


def test_scd2_intervals_tile_and_runs_alternate(spark):
    from mimir_spark.operators.features import scd2_user_state
    from mimir_spark.sources.tables import load_table

    rows = scd2_user_state(spark, SF_SMOKE).collect()
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    ev_counts = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_user) == set(ev_counts)
    for uid, rs in per_user.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        # half-open intervals tile: valid_to == next valid_from
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["state"] != b["state"]  # runs are maximal
            assert a["is_current"] == 0
        assert rs[-1]["valid_to"] is None and rs[-1]["is_current"] == 1
        assert sum(r["n_events"] for r in rs) == ev_counts[uid]


def test_scd2_single_exchange(spark):
    """The lag, cumsum, per-run agg and lead all share the user_id
    partitioning: exactly one shuffle in the plan."""
    from mimir_spark.operators.features import scd2_user_state

    plan = (
        scd2_user_state(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---- winnowing fingerprints ------------------------------------------------


def _winnow_py(text, k=8, w=8):
    import hashlib

    kh = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:8], 16)
        & 0x7FFFFFFF
        for i in range(len(text) - k + 1)
    ]
    return {min(kh[s : s + w]) for s in range(len(kh) - w + 1)}


def test_winnowing_guarantee_shared_substring(spark, tmp_path):
    """The winnowing guarantee: ANY common substring of length >=
    k + w - 1 (15) forces at least one shared fingerprint — pinned on
    crafted docs embedding the same 20-char run in different
    surroundings; near-noise docs with no long common run produce no
    qualifying pair."""
    import random

    from mimir_spark.operators.winnow import (
        WIN_GUARANTEE,
        winnowing_matches,
    )
    from tests.test_round11_ops import _write_docs

    rng = random.Random(7)

    def noise(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

    shared_run = "the-exact-same-20-chr"
    assert len(shared_run) >= WIN_GUARANTEE
    texts = [
        noise(80) + shared_run + noise(80),
        noise(80) + shared_run + noise(80),
        noise(200),
        noise(200),
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = winnowing_matches(spark, sf, min_shared=1, maxdf=100).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (0, 1) in got
    # independent python recompute of the shared-fp count for (0, 1)
    shared = len(_winnow_py(texts[0]) & _winnow_py(texts[1]))
    r01 = next(r for r in rows if (r["doc_a"], r["doc_b"]) == (0, 1))
    assert r01["n_shared"] == shared >= 1
    assert (2, 3) not in got  # pure noise: no long common run


def test_winnowing_fp_sets_match_python(spark):
    """Per-doc fingerprint SETS vs the independent python winnower on
    the real corpus sample."""
    from mimir_spark.operators.winnow import winnow_fingerprints
    from mimir_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    got: dict = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for r in docs.select("doc_id", "text").collect():
        if len(r["text"]) >= 15:
            assert got[r["doc_id"]] == _winnow_py(r["text"]), r["doc_id"]


# ---- NN-descent kNN graph --------------------------------------------------


def _write_embeddings(spark, tmp_path, X, name="emb"):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in X],
            "label": np.zeros(len(X), dtype=np.int32),
        }
    )
    out = str(tmp_path / name)
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def test_nn_descent_converges_on_manifold_data(spark, tmp_path):
    """Low-intrinsic-dimension data (the regime the neighbors-of-
    neighbors hypothesis targets): a smooth 1-D trajectory in 64-d,
    rows shuffled so the ring seed is structure-blind — similarity
    decays smoothly along the curve, giving descent a gradient, and 6
    rounds at search width 10 must recover >= 0.95 of the exact kNN
    edges. (Planted HARD clusters — mates at cos 0.9, strangers at 0,
    no gradient between — are the known worst case: same settings
    reach only ~0.88 there, the discovery-limited regime the docstring
    cites.)"""
    import numpy.random as npr

    from mimir_spark.operators.similarity import knn_graph_descent

    rng = npr.default_rng(11)
    steps = rng.normal(size=(400, 64)) * 0.12
    X = np.cumsum(steps, axis=0) + rng.normal(size=64)
    X = X[rng.permutation(400)]
    sf = _write_embeddings(spark, tmp_path, X)

    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -np.inf)
    exact = {(i, j) for i in range(400) for j in np.argsort(-S[i])[:3]}

    got = {
        (r["vec_id"], r["neighbor_id"])
        for r in knn_graph_descent(spark, sf).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, recall


def test_nn_descent_degrades_on_structureless_data(spark):
    """Documented expected behavior on the uniform synthetic corpus
    (within-label cosine ~0.002): recall stays low BUT each round
    still monotonically improves the kept-k under (cos desc, id)."""
    from mimir_spark.operators.similarity import knn_graph, knn_graph_descent

    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in knn_graph(spark, SF_SMOKE).collect()
    }
    recalls = []
    sums = []
    for rounds in (1, 2, 3):
        rows = knn_graph_descent(spark, SF_SMOKE, n_rounds=rounds).collect()
        got = {(r["vec_id"], r["neighbor_id"]) for r in rows}
        recalls.append(len(got & exact) / len(exact))
        sums.append(sum(r["cos"] for r in rows))
    assert recalls[0] <= recalls[-1] < 0.5  # low on random data — expected
    assert sums[0] < sums[1] < sums[2]  # but strictly improving


def test_descent_seed_id_contiguity_assumption_holds(spark):
    """knn_graph_descent's ring seed is (vec_id + i) mod n, which
    requires vec_ids to be exactly 0..n−1 (documented assumption:
    sparse ids would silently under-seed nodes). Pin the corpus
    contract here so a testdata regeneration that breaks it fails
    loudly instead of degrading round-0 recall."""
    from mimir_spark.sources.tables import load_table

    ids = sorted(
        r["vec_id"]
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id")
        .collect()
    )
    assert ids == list(range(len(ids)))


# ---- CUSUM changepoints ------------------------------------------------


def test_cusum_matches_hand_recurrence(spark):
    """The window-based closed form must equal the textbook recursion
    S+_t = max(0, S+_{t-1} + (x_t - mu - 0.5 sd)) computed in Python
    over the same hourly series."""
    from mimir_spark.operators.stats import cusum_changepoints
    from mimir_spark.sources.tables import load_table

    rows = cusum_changepoints(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").collect()
    series: dict = {}
    for r in ev:
        key = (r["event_type"], int(r["ts"].timestamp() // 3600))
        series.setdefault(key, []).append(r["value"])
    hourly: dict = {}
    for (t, h), vals in series.items():
        hourly.setdefault(t, {})[h] = round(sum(vals) / len(vals), 6)
    got = {(r["event_type"], r["hour"]): r for r in rows}
    for t, hs in hourly.items():
        xs = [hs[h] for h in sorted(hs)]
        mu = round(sum(xs) / len(xs), 6)
        m = sum(xs) / len(xs)
        sd = round(
            (sum((v - m) ** 2 for v in xs) / (len(xs) - 1)) ** 0.5, 6
        )
        x7 = [round(x * 1e7) for x in xs]
        mu7, sd7 = round(mu * 1e7), round(sd * 1e7)
        sp = sn = 0
        for h, xi in zip(sorted(hs), x7):
            sp = max(0, sp + 10 * xi - 10 * mu7 - 5 * sd7)
            sn = max(0, sn + 10 * mu7 - 10 * xi - 5 * sd7)
            g = got[(t, h)]
            assert abs(g["s_pos"] - sp / 1e8) < 1e-9, (t, h)
            assert abs(g["s_neg"] - sn / 1e8) < 1e-9
            assert g["alarm_up"] == int(sp > 40 * sd7)
            assert g["alarm_down"] == int(sn > 40 * sd7)


def test_cusum_detects_planted_shift(spark, tmp_path):
    """A level shift of +3 injected at hour 48 of a 96-hour unit-
    variance series must raise alarm_up after (and only after) the
    shift."""
    import pandas as pd

    from mimir_spark.operators.stats import cusum_changepoints

    rng = np.random.default_rng(5)
    n_h, per_h = 96, 20
    recs = []
    eid = 0
    for h in range(n_h):
        for _ in range(per_h):
            v = float(rng.normal(10.0, 1.0)) + (3.0 if h >= 48 else 0.0)
            recs.append((eid, pd.Timestamp(h * 3600, unit="s"), 1, "view", v, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        recs,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    out = str(tmp_path / "shift")
    spark.createDataFrame(
        pdf,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    rows = sorted(
        cusum_changepoints(spark, out).collect(), key=lambda r: r["hour"]
    )
    first_alarm = next(i for i, r in enumerate(rows) if r["alarm_up"] == 1)
    assert 48 <= first_alarm <= 55  # fires just after the shift
    assert all(r["alarm_up"] == 0 for r in rows[:48])
    assert all(r["alarm_up"] == 1 for r in rows[60:])  # and stays up


# ---- Theil-Sen robust trend --------------------------------------------


def test_theil_sen_matches_scipy_style_recompute(spark):
    """Slope/intercept vs an independent Python recompute (lower
    median of pairwise slopes, lower median of residuals)."""
    from mimir_spark.operators.stats import theil_sen_hourly
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    series: dict = {}
    for r in ev:
        key = (r["event_type"], int(r["ts"].timestamp() // 3600))
        series.setdefault(key, []).append(r["value"])
    hourly: dict = {}
    for (t, h), vals in series.items():
        hourly.setdefault(t, {})[h] = round(sum(vals) / len(vals), 6)
    got = {r["event_type"]: r for r in theil_sen_hourly(spark, SF_SMOKE).collect()}
    for t, hs in hourly.items():
        pts = sorted(hs.items())
        slopes = sorted(
            (x2 - x1) / (h2 - h1)
            for i, (h1, x1) in enumerate(pts)
            for h2, x2 in pts[i + 1 :]
        )
        slope = slopes[(len(slopes) + 1) // 2 - 1]
        resid = sorted(x - slope * h for h, x in pts)
        inter = resid[(len(resid) + 1) // 2 - 1]
        g = got[t]
        assert g["n_points"] == len(pts) and g["n_pairs"] == len(slopes)
        assert abs(g["slope"] - slope) < 1e-6
        assert abs(g["intercept"] - inter) < 1e-6


def test_theil_sen_resists_outlier_day_ols_does_not(spark, tmp_path):
    """A corrupted 10x-value day in an otherwise flat series: OLS
    slope moves materially, the Theil-Sen slope stays ~0."""
    import pandas as pd

    from mimir_spark.operators.stats import theil_sen_hourly

    rng = np.random.default_rng(3)
    recs, eid = [], 0
    for h in range(96):
        bad = 40 <= h < 64  # one corrupted day
        for _ in range(10):
            v = float(rng.normal(10, 0.5)) * (10.0 if bad else 1.0)
            recs.append((eid, pd.Timestamp(h * 3600, unit="s"), 1, "view", v, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        recs, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = str(tmp_path / "corrupt")
    spark.createDataFrame(
        pdf,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    ts = theil_sen_hourly(spark, out).collect()[0]
    hours = np.arange(96)
    xs = np.array(
        [10.0 * (10 if 40 <= h < 64 else 1) for h in hours]
    )  # idealized means
    ols = np.polyfit(hours, xs, 1)[0]
    assert abs(ts["slope"]) < 0.05  # robust: flat
    assert abs(ols) > 0.1  # OLS on the same shape: dragged by the day


# ---- quantile binning + session paths ---------------------------------


def test_quantile_bins_equal_frequency(spark):
    from mimir_spark.operators.features import quantile_binning

    rows = quantile_binning(spark, SF_CORRECT).collect()
    per_type: dict = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r)
    for t, rs in per_type.items():
        rs.sort(key=lambda r: r["bin"])
        assert [r["bin"] for r in rs] == list(range(1, 9))
        ns = [r["n"] for r in rs]
        assert max(ns) - min(ns) <= 1  # equal frequency +-1
        # bins are value-ordered: ranges never invert
        for a, b in zip(rs, rs[1:]):
            assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 1e-9
            assert a["lo"] <= a["hi"]


def test_top_session_paths_match_hand_rolled(spark):
    from mimir_spark.operators.features import top_session_paths
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    hist: dict = {}
    for r in ev:
        hist.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    from collections import Counter

    counts: Counter = Counter()
    for uid, rows in hist.items():
        rows.sort()
        sess: list = []
        prev = None
        for ts, eid, t in rows:
            sec = int(ts.timestamp())
            if prev is not None and sec - prev > 1800:
                counts[">".join(sess)] += 1  # close the session
                sess = []
            if not sess or sess[-1] != t:  # collapse consecutive dups
                sess.append(t)
            prev = sec
        if sess:
            counts[">".join(sess)] += 1
    counts.pop("", None)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [
        (r["path"], r["n_sessions"])
        for r in sorted(
            top_session_paths(spark, SF_SMOKE).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == want


# ---- partition invariance for the round-11 batch-2 ops ---------------------


def test_round11_batch2_partition_invariance(spark):
    """Every batch-2 operator's output must be a pure function of the
    data SET: a sibling session with a prime, tiny shuffle partition
    count produces identical rows."""
    from mimir_spark.operators.clustering import kcenter_greedy
    from mimir_spark.operators.features import (
        holt_linear_user,
        quantile_binning,
        scd2_user_state,
        top_session_paths,
    )
    from mimir_spark.operators.profiling import (
        benford_digit_test,
        dp_count_laplace,
    )
    from mimir_spark.operators.similarity import knn_graph_descent
    from mimir_spark.operators.sketches import kmv_source_setops
    from mimir_spark.operators.stats import (
        chi2_lang_source,
        corr_matrix,
        cusum_changepoints,
        linreg_by_group,
        theil_sen_hourly,
    )
    from mimir_spark.operators.tokenizer import wordpiece_train
    from mimir_spark.operators.winnow import winnowing_matches

    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    for fn in (
        corr_matrix,
        linreg_by_group,
        chi2_lang_source,
        kmv_source_setops,
        kcenter_greedy,
        holt_linear_user,
        benford_digit_test,
        dp_count_laplace,
        wordpiece_train,
        scd2_user_state,
        winnowing_matches,
        knn_graph_descent,
        cusum_changepoints,
        theil_sen_hourly,
        quantile_binning,
        top_session_paths,
    ):
        base = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
        alt = {tuple(r) for r in fn(odd, SF_SMOKE).collect()}
        assert base == alt, fn.__name__


# ---- feature hashing ---------------------------------------------------


def test_feature_hashing_matches_python_recompute(spark):
    """Exact mechanical pin: the sparse hashed vectors equal a Python
    recompute from the same md5-31 hash (bucket = h mod 64, sign from
    the next bit up), zero-sum cells dropped. (A STATISTICAL
    unbiasedness check over doc pairs would be wrong here: with one
    fixed hash function and this corpus's tiny shared vocabulary,
    collision errors are perfectly correlated across pairs — the
    Weinberger expectation is over hash draws, not documents.)"""
    import hashlib
    from collections import Counter

    from mimir_spark.operators.features import feature_hashing
    from mimir_spark.sources.tables import load_table

    def h31(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    want: dict = {}
    for r in docs:
        cell: Counter = Counter()
        for w in r["text"].split():
            h = h31(w)
            cell[h % 64] += 1 if (h // 64) % 2 == 0 else -1
        for b, v in cell.items():
            if v != 0:
                want[(r["doc_id"], b)] = v
    got = {
        (r["doc_id"], r["bucket"]): r["val"]
        for r in feature_hashing(spark, SF_SMOKE).collect()
    }
    assert got == want
    # same-word mass is always preserved: every doc's hashed L1 mass
    # is bounded by its token count and nonzero for nonempty docs
    per_doc: dict = {}
    for (d, b), v in got.items():
        per_doc[d] = per_doc.get(d, 0) + abs(v)
    for r in docs:
        n_tok = len(r["text"].split())
        if n_tok:
            assert 0 < per_doc[r["doc_id"]] <= n_tok


# ---- rendezvous sharding -------------------------------------------------


def test_hrw_minimal_disruption(spark):
    """The rendezvous property: dropping the last shard (N=8 -> 7)
    remaps ONLY docs that lived on the dropped shard; mod-N sharding
    on the same ids remaps the vast majority."""
    import hashlib

    from mimir_spark.sources.tables import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]

    def h(d, s):
        return (
            int(hashlib.md5(f"{d}:{s}".encode()).hexdigest()[:8], 16)
            & 0x7FFFFFFF
        )

    def assign(d, n):
        ws = [h(d, s) for s in range(n)]
        return ws.index(max(ws))

    a8 = {d: assign(d, 8) for d in ids}
    a7 = {d: assign(d, 7) for d in ids}
    moved = [d for d in ids if a8[d] != a7[d]]
    assert all(a8[d] == 7 for d in moved)  # only the dropped shard moves
    mod_moved = sum(1 for d in ids if d % 8 != d % 7)
    assert mod_moved > len(ids) * 0.8  # mod-N: nearly everything


def test_hrw_report_matches_python(spark):
    import hashlib
    from collections import Counter

    from mimir_spark.operators.pipeline import rendezvous_shards
    from mimir_spark.sources.tables import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]

    def assign(d):
        ws = [
            int(hashlib.md5(f"{d}:{s}".encode()).hexdigest()[:8], 16)
            & 0x7FFFFFFF
            for s in range(8)
        ]
        return ws.index(max(ws))

    want = Counter(assign(d) for d in ids)
    got = {
        r["shard"]: r["n_docs"]
        for r in rendezvous_shards(spark, SF_SMOKE).collect()
    }
    assert got == dict(want)


# ---- sliding-window HLL (WAU) -----------------------------------------


def test_wau_estimates_within_hll_band(spark):
    """Every trailing-7d estimate within the 4-sigma HLL band of the
    exact range-join twin (rsd = 1.04/sqrt(256))."""
    from mimir_spark.operators.sketches import wau_hll_sliding

    rows = wau_hll_sliding(spark, SF_CORRECT).collect()
    assert len(rows) > 20
    rsd = 1.04 / (256 ** 0.5)
    for r in rows:
        assert abs(r["est_distinct"] - r["true_wau"]) <= 4 * rsd * r["true_wau"], r


def test_wau_production_path_skips_exact_twin(spark):
    """verify=False (the 100 TB production path) must agree with the
    verified variant on every estimate column AND plan with ZERO
    BroadcastNestedLoopJoin — the exact range-join twin is the only
    corpus-rescanning piece, and it's gated off."""
    from mimir_spark.operators.sketches import wau_hll_sliding

    prod = wau_hll_sliding(spark, SF_SMOKE, verify=False)
    assert prod.columns == ["day", "n_present", "v_zero", "est_distinct"]
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    verified = wau_hll_sliding(spark, SF_SMOKE, verify=True)
    est_cols = ["day", "n_present", "v_zero", "est_distinct"]
    assert sorted(map(tuple, prod.collect())) == sorted(
        map(tuple, verified.select(*est_cols).collect())
    )


def test_wau_register_merge_equals_direct_window(spark):
    """Mergeability: daily registers max-merged over the window equal
    registers computed from the window's raw rows directly."""
    from pyspark.sql import functions as FF

    from mimir_spark.operators.sketches import hll_registers
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    day = FF.floor(FF.unix_timestamp("ts") / 86400).cast("long")
    keyed = ev.select(day.alias("day"), "user_id")
    days = sorted(r["day"] for r in keyed.select("day").distinct().collect())
    target = days[len(days) // 2]
    window = keyed.filter(
        (FF.col("day") <= target) & (FF.col("day") >= target - 6)
    )
    direct = {
        (r["j"], r["m_j"])
        for r in hll_registers(
            window.select(FF.lit(0).alias("k"), "user_id"), ["k"], FF.col("user_id")
        ).collect()
    }
    daily = hll_registers(window, ["day"], FF.col("user_id"))
    merged = {
        (r["j"], r["m_j"])
        for r in daily.groupBy("j").agg(FF.max("m_j").alias("m_j")).collect()
    }
    assert merged == direct


# ---- stateful Holt streaming twin -------------------------------------


def test_stateful_holt_matches_batch(spark, tmp_path):
    """Streaming Holt twin: events split into two TIME-ORDERED files;
    after both micro-batches the per-user (level, trend, forecast)
    must equal the batch fold exactly."""
    import glob as globmod
    import os
    import shutil
    import time as _time

    from mimir_spark.operators.features import holt_linear_user
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.jobs import read_events_stream
    from mimir_spark.streaming.stateful import stateful_user_holt

    ev = load_table(spark, SF_SMOKE, "events")
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
        src = globmod.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{in_dir}/events{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (_time.time() + i, _time.time() + i))

    stream = read_events_stream(spark, in_dir, glob="events*.parquet")
    shutil.rmtree("/tmp/mimir_ckpt_sholt", ignore_errors=True)
    q = (
        stateful_user_holt(stream)
        .writeStream.format("memory")
        .queryName("sholt")
        .outputMode("update")
        .option("checkpointLocation", "/tmp/mimir_ckpt_sholt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_3)
        for r in spark.sql(
            """SELECT user_id, n_events, level, trend, forecast_3 FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                           ORDER BY n_events DESC) rn
                 FROM sholt) WHERE rn = 1"""
        ).collect()
    }
    expect = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_3)
        for r in holt_linear_user(spark, SF_SMOKE).collect()
    }
    assert got == expect


# ---- plan-shape pins for the batch-2 scale claims -----------------------


def test_kmv_plan_uses_windowgrouplimit(spark):
    """The bottom-k rank filter must run as WindowGroupLimit
    (per-partition heaps), never a full per-source sort."""
    from mimir_spark.operators.sketches import kmv_source_setops

    plan = (
        kmv_source_setops(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_winnow_plan_broadcasts_hot_anti_no_cartesian(spark):
    """The df-cap must be a broadcast LEFT ANTI join against ONLY the
    hot-fp list (df > maxdf; bounded by total_fps/maxdf), never a
    broadcast of the corpus-sized cold table — the 100 TB driver-OOM
    guard. Nothing in the chain may fall back to a cartesian."""
    from mimir_spark.operators.winnow import winnowing_matches

    qe = winnowing_matches(spark, SF_SMOKE)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly ONE FORCED broadcast hint in the whole chain — the hot
    # list (the fp self-join is resolved into two scans of it, so the
    # single source hint resolves twice); any extra BroadcastExchange
    # in the physical plan is Catalyst's stat-based auto-broadcast at
    # smoke SF, which AQE drops at scale. A forced hint over the
    # corpus-sized cold table would show up here.
    analyzed = qe.analyzed().toString()
    assert analyzed.count("ResolvedHint") <= 2, analyzed


# ---- multi-touch attribution ---------------------------------------------


def test_attribution_conserves_value_per_model(spark):
    """Every model's attributed + unattributed value must equal the
    total purchase value (the conservation property the unattributed
    bucket exists for)."""
    from mimir_spark.operators.features import attribution_report
    from mimir_spark.sources.tables import load_table

    total = (
        load_table(spark, SF_CORRECT, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    rows = attribution_report(spark, SF_CORRECT).collect()
    per_model: dict = {}
    for r in rows:
        per_model[r["model"]] = per_model.get(r["model"], 0.0) + r["value"]
    assert set(per_model) == {"last_touch", "first_touch", "linear"}
    for m, v in per_model.items():
        assert abs(v - total) < 0.01, (m, v, total)


def test_attribution_models_match_hand_rolled(spark):
    from collections import defaultdict

    from mimir_spark.operators.features import attribution_report
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_user: dict = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp()), r["event_id"], r["event_type"], r["value"])
        )
    agg: dict = defaultdict(lambda: [0, 0.0])
    for u, rows in by_user.items():
        for sec, eid, typ, val in rows:
            if typ != "purchase":
                continue
            touches = [
                (s, e, t)
                for s, e, t, _ in rows
                if t in ("view", "click") and s < sec and s >= sec - 3600
            ]
            if not touches:
                for m in ("last_touch", "first_touch", "linear"):
                    c = agg[(m, "unattributed")]
                    c[0] += 1
                    c[1] += val
                continue
            last = max(touches)[2]
            first = min(touches)[2]
            agg[("last_touch", last)][0] += 1
            agg[("last_touch", last)][1] += val
            agg[("first_touch", first)][0] += 1
            agg[("first_touch", first)][1] += val
            for _, _, t in touches:
                agg[("linear", t)][0] += 1
                agg[("linear", t)][1] += val / len(touches)
    got = {
        (r["model"], r["touch_type"]): (r["n"], r["value"])
        for r in attribution_report(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(agg)
    for k, (n, v) in agg.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - v) < 1e-3, (k, got[k][1], v)


# ---- seasonal decomposition -------------------------------------------


def test_seasonal_decompose_recovers_planted_cycle(spark, tmp_path):
    """A planted 24h sinusoid on a flat base: the recovered hour-of-
    day profile must track the sinusoid and the strength must be near
    1; a white-noise control must come out near 0."""
    import math

    import pandas as pd

    from mimir_spark.operators.stats import seasonal_decompose_hourly

    rng = np.random.default_rng(9)
    recs, eid = [], 0
    for h in range(24 * 14):
        hod = h % 24
        for typ, amp in (("cyc", 5.0), ("flat", 0.0)):
            base = 20.0 + amp * math.sin(2 * math.pi * hod / 24)
            for _ in range(6):
                recs.append(
                    (eid, pd.Timestamp(h * 3600, unit="s"), 1, typ,
                     base + float(rng.normal(0, 0.3)), "{}")
                )
                eid += 1
    pdf = pd.DataFrame(
        recs, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = str(tmp_path / "cyc")
    spark.createDataFrame(
        pdf,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    rows = seasonal_decompose_hourly(spark, out).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["hod"]] = r
    cyc = by_type["cyc"]
    assert cyc[0]["strength"] > 0.95
    assert by_type["flat"][0]["strength"] < 0.3
    for hod, r in cyc.items():
        expect = 5.0 * math.sin(2 * math.pi * hod / 24)
        assert abs(r["seasonal"] - expect) < 0.3, (hod, r["seasonal"], expect)


def test_seasonal_components_sum_back(spark):
    """Decomposition identity on the real corpus: x == dmean +
    seasonal + resid for every hourly cell (recomputed in Python from
    the same rollup)."""
    from collections import defaultdict

    from mimir_spark.operators.stats import seasonal_decompose_hourly
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    cells: dict = defaultdict(list)
    for r in ev:
        h = int(r["ts"].timestamp() // 3600)
        cells[(r["event_type"], h)].append(r["value"])
    hourly = {k: round(sum(v) / len(v), 6) for k, v in cells.items()}
    dmean: dict = defaultdict(list)
    for (t, h), x in hourly.items():
        dmean[(t, h // 24)].append(x)
    dmean = {k: sum(v) / len(v) for k, v in dmean.items()}
    devs: dict = defaultdict(list)
    for (t, h), x in hourly.items():
        devs[(t, h % 24)].append(x - dmean[(t, h // 24)])
    seas = {k: round(sum(v) / len(v), 6) for k, v in devs.items()}
    got = {
        (r["event_type"], r["hod"]): r
        for r in seasonal_decompose_hourly(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(seas)
    for k, s_val in seas.items():
        assert abs(got[k]["seasonal"] - s_val) < 2e-6, k
        assert got[k]["n_obs"] == len(devs[k])


# ---- streaming CUSUM twin ---------------------------------------------


def test_stateful_cusum_matches_batch_closed_hours(spark, tmp_path):
    """Streamed integer-recursion CUSUM with frozen (mu, sd) equals
    the batch closed-prefix form for every CLOSED hour (all but each
    type's final hour) over a time-split corpus."""
    import glob as globmod
    import os
    import shutil
    import time as _time

    from mimir_spark.operators.stats import cusum_changepoints
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.cusum import stateful_cusum
    from mimir_spark.streaming.jobs import read_events_stream

    ev = load_table(spark, SF_SMOKE, "events")
    # frozen reference = the batch operator's own stats (recomputed)
    hourly = (
        ev.groupBy(
            "event_type", F.floor(F.unix_timestamp("ts") / 3600).alias("h")
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.round(F.avg("x"), 6).alias("mu"),
        F.round(F.stddev_samp("x"), 6).alias("sd"),
    )
    params = {
        r["event_type"]: (round(r["mu"] * 1e7), round(r["sd"] * 1e7))
        for r in stats.collect()
    }

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
        src = globmod.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{in_dir}/events{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (_time.time() + i, _time.time() + i))

    stream = read_events_stream(spark, in_dir, glob="events*.parquet")
    shutil.rmtree("/tmp/mimir_ckpt_scusum", ignore_errors=True)
    q = (
        stateful_cusum(stream, params)
        .writeStream.format("memory")
        .queryName("scusum")
        .outputMode("append")
        .option("checkpointLocation", "/tmp/mimir_ckpt_scusum")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_type, r.hour): (r.x, r.s_pos, r.s_neg, r.alarm_up, r.alarm_down)
        for r in spark.sql("SELECT * FROM scusum").collect()
    }
    batch_rows = cusum_changepoints(spark, SF_SMOKE).collect()
    last_hour = {}
    for r in batch_rows:
        last_hour[r["event_type"]] = max(
            last_hour.get(r["event_type"], -1), r["hour"]
        )
    want = {
        (r["event_type"], r["hour"]): (
            r["x"], r["s_pos"], r["s_neg"], r["alarm_up"], r["alarm_down"]
        )
        for r in batch_rows
        if r["hour"] < last_hour[r["event_type"]]
    }
    assert set(got) == set(want)
    assert got == want


def test_winnow_clusters_are_transitive_closure(spark):
    """Cluster labels equal a union-find over the winnowing pairs."""
    from mimir_spark.operators.winnow import winnow_clusters, winnowing_matches

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in winnowing_matches(spark, SF_CORRECT).collect()
    ]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in winnow_clusters(spark, SF_CORRECT).collect()
    }
    assert got == want and len(got) > 0


def test_kfold_exact_stratification(spark):
    """Per (lang, fold) sizes differ by at most 1 within each lang,
    folds are 0..4, and totals conserve the per-lang doc counts."""
    from mimir_spark.operators.pipeline import kfold_assign
    from mimir_spark.sources.tables import load_table

    rows = kfold_assign(spark, SF_CORRECT).collect()
    per_lang: dict = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {})[r["fold"]] = r["n_docs"]
    truth = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_CORRECT, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_lang) == set(truth)
    for lang, folds in per_lang.items():
        assert set(folds) <= set(range(5))
        assert max(folds.values()) - min(folds.values()) <= 1
        assert sum(folds.values()) == truth[lang]


def test_time_to_convert_matches_hand_rolled(spark):
    from collections import defaultdict

    from mimir_spark.operators.features import funnel_time_to_convert
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_user: dict = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp()), r["event_id"], r["event_type"])
        )
    tts = []
    for u, rows in by_user.items():
        views = sorted(s for s, _, t in rows if t == "view")
        import bisect

        for s, eid, t in rows:
            if t != "purchase":
                continue
            i = bisect.bisect_left(views, s) - 1
            if i >= 0 and views[i] >= s - 86400:
                tts.append(s - views[i])
    tts.sort()
    r = funnel_time_to_convert(spark, SF_SMOKE).collect()[0]
    assert r["n_conversions"] == len(tts)
    assert r["p50_s"] == tts[(len(tts) + 1) // 2 - 1]
    import math

    assert r["p90_s"] == tts[math.ceil(0.9 * len(tts)) - 1]
    assert abs(r["mean_s"] - sum(tts) / len(tts)) < 1e-3


def test_gini_matches_hand_formula_and_extremes(spark, tmp_path):
    from mimir_spark.operators.corpus import gini_source_concentration
    from mimir_spark.sources.tables import load_table

    def gini_ref(xs):
        xs = sorted(xs)
        n = len(xs)
        return 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (
            n * sum(xs)
        ) - (n + 1) / n

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    from collections import Counter

    nd = Counter(r["source"] for r in docs)
    nt = Counter()
    for r in docs:
        nt[r["source"]] += len(r["text"].split())
    r = gini_source_concentration(spark, SF_SMOKE).collect()[0]
    assert r["n_sources"] == len(nd)
    assert abs(r["gini_docs"] - gini_ref(list(nd.values()))) < 1e-6
    assert abs(r["gini_tokens"] - gini_ref(list(nt.values()))) < 1e-6
    # extremes: one dominant source → high G; the real corpus is
    # roughly balanced → low G
    assert r["gini_docs"] < 0.2
    skew = [(i, "w " * 5, "en", f"s{i % 2}", 10) for i in range(10)] + [
        (10 + i, "w " * 5, "en", "big", 10) for i in range(190)
    ]
    df = spark.createDataFrame(
        skew, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "skewg")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    r2 = gini_source_concentration(spark, out).collect()[0]
    assert r2["gini_docs"] > 0.55


def test_user_entropy_matches_scipy_style(spark):
    import math
    from collections import Counter, defaultdict

    from mimir_spark.operators.features import user_behavior_entropy
    from mimir_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    mix: dict = defaultdict(Counter)
    for r in ev:
        mix[r["user_id"]][r["event_type"]] += 1
    got = {r["user_id"]: r for r in user_behavior_entropy(spark, SF_SMOKE).collect()}
    assert set(got) == set(mix)
    for u, cnt in mix.items():
        n = sum(cnt.values())
        h = -sum(c / n * math.log(c / n) for c in cnt.values())
        g = got[u]
        assert g["n_types"] == len(cnt) and g["n_events"] == n
        assert abs(g["entropy"] - h) < 2e-6
        if len(cnt) > 1:
            assert abs(g["norm_entropy"] - h / math.log(len(cnt))) < 2e-6
            assert 0 <= g["norm_entropy"] <= 1.0000001
        else:
            assert g["norm_entropy"] == 0.0


def test_acf_detects_planted_24h_cycle(spark, tmp_path):
    """On the planted 24h sinusoid corpus the ACF must peak at lag 24
    and go negative at the half-period lag 12; numpy recompute pinned
    on one type."""
    import math

    import pandas as pd

    from mimir_spark.operators.stats import hourly_autocorrelation

    rng = np.random.default_rng(13)
    recs, eid = [], 0
    for h in range(24 * 14):
        base = 20.0 + 5.0 * math.sin(2 * math.pi * (h % 24) / 24)
        for _ in range(4):
            recs.append(
                (eid, pd.Timestamp(h * 3600, unit="s"), 1, "cyc",
                 base + float(rng.normal(0, 0.5)), "{}")
            )
            eid += 1
    pdf = pd.DataFrame(
        recs, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = str(tmp_path / "acf")
    spark.createDataFrame(
        pdf,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    rows = {r["lag"]: r for r in hourly_autocorrelation(spark, out).collect()}
    assert rows[24]["acf"] > 0.9
    assert rows[12]["acf"] < -0.9
    assert abs(rows[6]["acf"]) < 0.3
    # numpy recompute at lag 24
    xs = np.array([
        round(float(np.mean([v for (e, t, u, ty, v, p) in recs
                             if int(t.timestamp() // 3600) == h])), 6)
        for h in range(24 * 14)
    ])
    a, b = xs[24:], xs[:-24]
    expect = float(np.corrcoef(a, b)[0, 1])
    assert abs(rows[24]["acf"] - expect) < 1e-5
    assert rows[24]["n_pairs"] == len(a)
