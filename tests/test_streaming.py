"""Structured Streaming jobs run against the file source with a memory
sink; results compared to their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from mimir_spark.operators.core import wordcount
from mimir_spark.streaming.jobs import (
    read_documents_stream,
    read_events_stream,
    streaming_event_windows,
    streaming_sessionize,
    streaming_wordcount,
)


def _run_to_completion(sdf, name: str, mode: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"/tmp/mimir_ckpt_{name}")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_wordcount_matches_batch(spark, sf_smoke, tmp_path):
    import shutil

    shutil.rmtree(f"/tmp/mimir_ckpt_wc_t", ignore_errors=True)
    stream = read_documents_stream(spark, sf_smoke)
    _run_to_completion(streaming_wordcount(stream), "wc_t", "complete")
    got = {
        (r.word, r["count"]) for r in spark.sql("SELECT * FROM wc_t").collect()
    }
    expect = {(r.word, r.cnt) for r in wordcount(spark, sf_smoke).collect()}
    assert got == expect


def test_streaming_event_windows_runs(spark, sf_smoke):
    import shutil

    shutil.rmtree(f"/tmp/mimir_ckpt_ew_t", ignore_errors=True)
    stream = read_events_stream(spark, sf_smoke)
    _run_to_completion(streaming_event_windows(stream), "ew_t", "append")
    n = spark.sql("SELECT count(*) FROM ew_t").collect()[0][0]
    # append mode emits only watermark-closed windows; with a single
    # micro-batch most windows stay open, so just assert liveness of
    # the pipeline and schema.
    cols = spark.table("ew_t").columns
    assert cols == ["window_start", "event_type", "n_events", "total_value"]


def test_streaming_sessionize_runs(spark, sf_smoke):
    import shutil

    shutil.rmtree(f"/tmp/mimir_ckpt_ss_t", ignore_errors=True)
    stream = read_events_stream(spark, sf_smoke)
    _run_to_completion(streaming_sessionize(stream), "ss_t", "append")
    cols = spark.table("ss_t").columns
    assert cols == [
        "session_start",
        "session_end",
        "user_id",
        "n_events",
        "session_value",
    ]


def test_streaming_dedup_matches_batch(spark, sf_smoke):
    import shutil

    from mimir_spark.operators.dedup import dedup_exact
    from mimir_spark.streaming.jobs import streaming_dedup

    shutil.rmtree("/tmp/mimir_ckpt_dd_t", ignore_errors=True)
    stream = read_documents_stream(spark, sf_smoke)
    _run_to_completion(streaming_dedup(stream), "dd_t", "append")
    # one survivor per distinct text, same count as the batch dedup
    n_stream = spark.sql("SELECT count(*) FROM dd_t").collect()[0][0]
    n_batch = dedup_exact(spark, sf_smoke).count()
    assert n_stream == n_batch


def test_streaming_minhash_matches_batch(spark, sf_smoke, tmp_path):
    """Incremental MinHash over a 2-file split of the corpus must end
    with exactly the batch operator's verified pair set — every pair is
    caught in the micro-batch that delivers its later member."""
    import shutil

    from mimir_spark.operators.dedup import dedup_minhash_lsh
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.minhash import streaming_minhash_dedup

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        in_dir + "/b0", compression="none"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        in_dir + "/b1", compression="none"
    )
    # flatten the part files into one dir so maxFilesPerTrigger=1 gives
    # two deterministic micro-batches
    import glob as globmod
    import os

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_minhash_dedup(
        spark,
        flat,
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_smoke).collect()
    }
    assert got == expect


def test_streaming_click_purchase_join_matches_batch(spark, sf_smoke):
    import shutil

    from mimir_spark.operators.advanced import interval_join
    from mimir_spark.streaming.jobs import streaming_click_purchase_join

    shutil.rmtree("/tmp/mimir_ckpt_ij_t", ignore_errors=True)
    stream = read_events_stream(spark, sf_smoke)
    _run_to_completion(streaming_click_purchase_join(stream), "ij_t", "append")
    got = (
        spark.table("ij_t")
        .groupBy("event_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("click_value"), 4).alias("v"))
    )
    got_map = {r.event_id: (r.n, r.v) for r in got.collect()}
    expect = {
        r.event_id: (r.n_recent_clicks, r.recent_click_value)
        for r in interval_join(spark, sf_smoke).collect()
        if r.n_recent_clicks > 0
    }
    assert got_map == expect


def test_watermark_drops_late_rows(spark, tmp_path):
    """Pin the 2-hour watermark semantics of streaming_event_windows:
    once a window has been closed by the advancing watermark, a late
    row for it is DROPPED — the window is never re-emitted or
    incremented.

    Watermark updates take effect one micro-batch after the data that
    advances them (standard Structured Streaming behavior), so the
    scenario needs three batches:
    - batch 0: 3 events in hour-1 plus events through hour-10 (the
      watermark computed from this batch is hour-8);
    - batch 1: one hour-11 event — during this batch the hour-8
      watermark is active, so windows h1..h8 close and emit (h1 with
      exactly its 3 on-time rows);
    - batch 2: one LATE hour-1 event (vs active watermark hour-9 →
      dropped; h1 must NOT appear again) and one hour-12 event (its
      window stays open and is never emitted)."""
    import glob as g
    import shutil
    import time

    from mimir_spark.streaming.jobs import (
        read_events_stream,
        streaming_event_windows,
    )

    H = 3_600_000_000_000  # one hour in nanoseconds

    def mk(rows, name):
        df = spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        d = str(tmp_path / ("src_" + name))
        df.coalesce(1).write.parquet(d)
        (part,) = g.glob(d + "/part-*.parquet")
        shutil.copy(part, str(tmp_path / f"{name}.parquet"))
        time.sleep(1.2)  # distinct mtimes → deterministic batch order

    batch0 = [(i, 1 * H + i * 1000, 1, "click", 1.0, "{}") for i in range(3)]
    batch0 += [(100 + h, h * H, 1, "click", 1.0, "{}") for h in range(2, 11)]
    mk(batch0, "batch_0")
    mk([(800, 11 * H, 3, "click", 1.0, "{}")], "batch_1")
    mk([(900, 1 * H + 5000, 2, "click", 1.0, "{}"),  # late hour-1 row
        (901, 12 * H, 2, "click", 1.0, "{}")], "batch_2")

    stream = read_events_stream(spark, str(tmp_path), glob="batch_*.parquet")
    q = (
        streaming_event_windows(stream)
        .writeStream.format("memory")
        .queryName("wm_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM wm_t").collect()
    by_hour: dict[int, list[int]] = {}
    for r in out:
        by_hour.setdefault(r.window_start.hour, []).append(r.n_events)
    # hour-1 closed exactly once with exactly the 3 on-time rows; the
    # late arrival neither re-emitted nor incremented it
    assert by_hour.get(1) == [3], by_hour
    # the still-open hour-12 window was not emitted
    assert 12 not in by_hour, by_hour


def test_streaming_simhash_matches_batch(spark, sf_smoke, tmp_path):
    """Incremental SimHash over a 2-file split of the corpus must end
    with exactly the batch operator's verified pair set."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.dedup import dedup_simhash
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.simhash import streaming_simhash_dedup

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

    q = streaming_simhash_dedup(
        spark,
        flat,
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash(spark, sf_smoke).collect()
    }
    assert got == expect


def test_streaming_cms_matches_batch(spark, sf_smoke, tmp_path):
    """Partial sketches merged across micro-batches must equal the
    single-pass batch sketch cell-for-cell (CMS cells are a
    commutative monoid), so the finalized heavy-hitter report matches
    the batch operator exactly."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.sketches import heavy_hitters_cms
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.cms import (
        finalize_cms_heavy_hitters,
        streaming_cms_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_cms_build(
        spark,
        flat,
        str(tmp_path / "sketch"),
        str(tmp_path / "words"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.word, r.est_count, r.true_count)
        for r in finalize_cms_heavy_hitters(
            spark, str(tmp_path / "sketch"), str(tmp_path / "words"), threshold=80
        ).collect()
    }
    expect = {
        (r.word, r.est_count, r.true_count)
        for r in heavy_hitters_cms(spark, sf_smoke, threshold=80).collect()
    }
    assert got and got == expect


def test_streaming_quantiles_match_batch(spark, sf_smoke, tmp_path):
    """Partial histograms merged across micro-batches equal the batch
    histogram cell-for-cell, so the finalized quantile estimates match
    the batch sketch op exactly."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.sketches import histogram_quantiles
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.quantiles import (
        finalize_streaming_quantiles,
        streaming_histogram_build,
    )

    in_dir = str(tmp_path / "ev_in")
    ev = load_table(spark, sf_smoke, "events")
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_histogram_build(
        spark, flat, str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.q, r.rank_n, r.est)
        for r in finalize_streaming_quantiles(
            spark, str(tmp_path / "sketch")
        ).collect()
    }
    expect = {
        (r.q, r.rank_n, r.est)
        for r in histogram_quantiles(spark, sf_smoke).collect()
    }
    assert got and got == expect


def test_streaming_hll_matches_batch(spark, sf_smoke, tmp_path):
    """HLL registers merged across micro-batches (cell-wise max) must
    equal the single-pass batch registers, so the finalized estimate
    matches the batch `hll_distinct` estimate columns exactly."""
    from mimir_spark.operators.sketches import hll_distinct
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.hll import (
        finalize_hll_distinct,
        streaming_hll_build,
    )

    in_dir = str(tmp_path / "flat")
    ev = load_table(spark, sf_smoke, "events")
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    import glob as globmod
    import os
    import shutil

    os.makedirs(in_dir)
    for i, part in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{in_dir}/batch_{i}.parquet")

    q = streaming_hll_build(
        spark,
        in_dir,
        str(tmp_path / "registers"),
        str(tmp_path / "ckpt"),
        glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.event_type, r.n_present, r.v_zero, r.est_distinct)
        for r in finalize_hll_distinct(
            spark, str(tmp_path / "registers")
        ).collect()
    }
    expect = {
        (r.event_type, r.n_present, r.v_zero, r.est_distinct)
        for r in hll_distinct(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_sliding_windows_match_batch(spark, sf_smoke):
    """Complete-mode sliding windows over the whole corpus equal the
    batch event_windows_sliding rows exactly (same window spec, same
    rounding)."""
    from mimir_spark.operators.features import event_windows_sliding
    from mimir_spark.streaming.jobs import (
        read_events_stream,
        streaming_event_windows_sliding,
    )

    sdf = streaming_event_windows_sliding(
        read_events_stream(spark, sf_smoke)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("slide_t")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM slide_t").collect()
    }
    expect = {
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in event_windows_sliding(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_ddsketch_matches_batch(spark, sf_smoke, tmp_path):
    """DDSketch cells add; merged partials must reproduce the batch
    estimates bit-for-bit."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.sketches import ddsketch_quantiles
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ddsketch import (
        finalize_streaming_ddsketch,
        streaming_ddsketch_build,
    )

    ev = load_table(spark, sf_smoke, "events")
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_ddsketch_build(
        spark, flat, str(tmp_path / "sk"), str(tmp_path / "ckpt"),
        glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.q, r.rank_n, r.est)
        for r in finalize_streaming_ddsketch(spark, str(tmp_path / "sk")).collect()
    }
    expect = {
        (r.q, r.rank_n, r.est)
        for r in ddsketch_quantiles(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_bloom_dedup_flags_cross_batch_dups(spark, sf_smoke, tmp_path):
    """Bloom's one-sided error, end-to-end: every batch-1 doc whose
    exact text appeared in batch 0 must be flagged; unique docs may be
    flagged only at the (tiny at this load factor) false-positive
    rate."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.bloom import streaming_bloom_dedup

    docs = load_table(spark, sf_smoke, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    # the corpus has no EXACT text dups — inject them: batch 1 carries
    # 30 verbatim copies of batch-0 docs under fresh doc_ids.
    copies = (
        b0.orderBy("doc_id").limit(30)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(copies)
    for name, part in [("b0", b0), ("b1", b1)]:
        part.coalesce(1).write.parquet(
            str(tmp_path / ("src_" + name)), compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, p in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/src_b*/part-*.parquet"))
    ):
        shutil.copy(p, f"{flat}/batch_{i}.parquet")

    q = streaming_bloom_dedup(
        spark, flat, str(tmp_path / "bits"), str(tmp_path / "verdicts"),
        str(tmp_path / "ckpt"), glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()

    texts0 = {r.text for r in b0.collect()}
    b1_rows = b1.collect()
    true_dups = {r.doc_id for r in b1_rows if r.text in texts0}
    flagged = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "verdicts"))
        .filter((F.col("batch_id") == 1) & F.col("dup_suspect"))
        .collect()
    }
    assert true_dups, "synthetic corpus must contain cross-parity dups"
    assert true_dups <= flagged, true_dups - flagged
    n_b1 = len(b1_rows)
    false_pos = len(flagged - true_dups)
    assert false_pos / n_b1 < 0.05, (false_pos, n_b1)


def test_streaming_reservoir_matches_batch(spark, sf_smoke, tmp_path):
    """Per-batch local top-k candidates merged across micro-batches
    must equal the batch reservoir exactly — k-smallest-of-union is
    recoverable from k-smallest-of-each-part."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.pipeline import sample_reservoir
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.reservoir import (
        finalize_reservoir,
        streaming_reservoir_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_reservoir_build(
        spark, flat, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_id, r.lang, r.rk)
        for r in finalize_reservoir(spark, str(tmp_path / "state")).collect()
    }
    expect = {
        (r.doc_id, r.lang, r.rk)
        for r in sample_reservoir(spark, sf_smoke).collect()
    }
    assert got and got == expect


def test_streaming_bm25_matches_batch(spark, sf_smoke, tmp_path):
    """Per-batch partial index tables (tf, dl) merged across
    micro-batches and ranked through the shared scorer must equal the
    batch BM25 ranking exactly — every statistic is a sum monoid over
    disjoint document batches."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.retrieval import bm25_topk
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.bm25 import (
        finalize_bm25_topk,
        streaming_bm25_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_bm25_build(
        spark,
        flat,
        str(tmp_path / "tf"),
        str(tmp_path / "dl"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = [
        (r.doc_id, r.score, r.rank)
        for r in finalize_bm25_topk(
            spark, str(tmp_path / "tf"), str(tmp_path / "dl")
        ).orderBy("rank").collect()
    ]
    expect = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_topk(spark, sf_smoke).orderBy("rank").collect()
    ]
    assert got and got == expect


def test_streaming_ann_matches_batch(spark, sf_smoke, tmp_path):
    """Per-batch local top-k candidates merged across micro-batches
    must equal the batch brute-force top-k exactly — per-query top-k
    is a min-merge monoid under (cos desc, neighbor_id)."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.similarity import ann_bruteforce_topk
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ann import (
        finalize_ann_topk,
        streaming_ann_build,
    )

    in_dir = str(tmp_path / "emb_in")
    emb = load_table(spark, sf_smoke, "embeddings")
    for m in range(3):
        emb.filter(F.col("vec_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_ann_build(
        spark, flat, sf_smoke, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = [
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in finalize_ann_topk(spark, str(tmp_path / "state"))
        .orderBy("query_id", "rank")
        .collect()
    ]
    expect = [
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in ann_bruteforce_topk(spark, sf_smoke)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got and got == expect


def test_streaming_rank_quantiles_match_batch(spark, sf_smoke, tmp_path):
    """Bottom-k is the TakeOrdered monoid: k-smallest-of-union is
    recoverable from per-batch k-smallest, so the merged sample — and
    the estimates through the shared finalizer — must reproduce the
    batch sketch bit-for-bit."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.sketches import rank_quantiles
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.rank_quantiles import (
        finalize_rank_quantiles,
        streaming_rank_quantiles_build,
    )

    ev = load_table(spark, sf_smoke, "events")
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_rank_quantiles_build(
        spark, flat, str(tmp_path / "sk"), str(tmp_path / "ckpt"),
        glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.q, r.n_sample, r.est)
        for r in finalize_rank_quantiles(spark, str(tmp_path / "sk")).collect()
    }
    expect = {
        (r.q, r.n_sample, r.est)
        for r in rank_quantiles(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_funnel_matches_batch(spark, sf_smoke, tmp_path):
    """The funnel anchor can move earlier with every batch, so the
    state is an exactly-pruned event partial, not a min-merge; fed
    through the shared chain it must reproduce the batch histogram
    bit-for-bit."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.features import window_funnel
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.funnel import (
        finalize_funnel,
        streaming_funnel_build,
    )

    ev = load_table(spark, sf_smoke, "events")
    # split by event_id so a user's views/clicks land in DIFFERENT
    # batches — the case that breaks a naive min-chain state
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_funnel_build(
        spark, flat, str(tmp_path / "st"), str(tmp_path / "ckpt"),
        glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.n_steps, r.n_users)
        for r in finalize_funnel(spark, str(tmp_path / "st")).collect()
    }
    expect = {
        (r.n_steps, r.n_users)
        for r in window_funnel(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_bm25_redelivery_does_not_double_count(
    spark, sf_smoke, tmp_path
):
    """At-least-once UPSTREAM delivery: the same documents re-appear
    in a later file. BM25 statistics are sum monoids over disjoint doc
    sets, so without the latest-batch-wins guard the re-delivered
    docs' tf/dl would double-count and skew df/N/avgdl. The finalized
    ranking must still equal the single-delivery batch ranking."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.retrieval import bm25_topk
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.bm25 import (
        finalize_bm25_topk,
        streaming_bm25_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(2):
        docs.filter(F.col("doc_id") % 2 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    # batch 2 RE-DELIVERS half of batch 0's documents
    docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 4 == 0)) \
        .coalesce(1).write.parquet(f"{in_dir}/b2", compression="none")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_bm25_build(
        spark, flat, str(tmp_path / "tf"), str(tmp_path / "dl"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = [
        (r.doc_id, r.score, r.rank)
        for r in finalize_bm25_topk(
            spark, str(tmp_path / "tf"), str(tmp_path / "dl")
        ).orderBy("rank").collect()
    ]
    expect = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_topk(spark, sf_smoke).orderBy("rank").collect()
    ]
    assert got == expect and got


def test_streaming_bigram_logppl_matches_batch(spark, sf_smoke, tmp_path):
    """Per-batch LM-state partials (bigram counts, distinct words)
    merged across micro-batches and scored through the shared scorer
    must equal the batch bigram_logppl exactly — the LM and V are
    folded from sum/set-monoid state over disjoint doc batches."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.quality import bigram_logppl
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ngram_lm import (
        finalize_bigram_logppl,
        streaming_bigram_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_bigram_build(
        spark,
        flat,
        str(tmp_path / "dab"),
        str(tmp_path / "words"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_id, r.n_bigrams, r.cross_entropy)
        for r in finalize_bigram_logppl(
            spark, str(tmp_path / "dab"), str(tmp_path / "words")
        ).collect()
    }
    expect = {
        (r.doc_id, r.n_bigrams, r.cross_entropy)
        for r in bigram_logppl(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_dsir_weights_match_batch(spark, sf_smoke, tmp_path):
    """DSIR from the SAME accumulated dab store (round 10): the bucket
    target/raw counts and totals are sum monoids over disjoint doc
    batches, so the streaming finalizer must equal the batch
    dsir_weights exactly — one ingest job now feeds Laplace-bigram,
    Kneser-Ney and DSIR scoring."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.quality import dsir_weights
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.ngram_lm import (
        finalize_dsir_weights,
        streaming_bigram_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_bigram_build(
        spark,
        flat,
        str(tmp_path / "dab"),
        str(tmp_path / "words"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_id, r.n_grams, r.logw)
        for r in finalize_dsir_weights(
            spark, str(tmp_path / "dab")
        ).collect()
    }
    expect = {
        (r.doc_id, r.n_grams, r.logw)
        for r in dsir_weights(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_sketch_stores_resolve_redelivered_docs(
    spark, tmp_path
):
    """At-least-once UPSTREAM redelivery of an UPDATED document: the
    signature stores hold rows for the same doc_id under two batch_id
    partitions. Without the latest-batch-wins + current-batch-wins
    resolve, the candidate join and the exact verify would score pairs
    against BOTH the stale and the fresh row — duplicate pair rows at
    conflicting scores. Covers the MinHash and ICWS streams."""
    import os

    from mimir_spark.streaming.icws import streaming_icws_dedup
    from mimir_spark.streaming.minhash import streaming_minhash_dedup

    base = "w%d " * 30
    text_x = (base % tuple(range(30))).strip()          # A v1 == B
    text_x2 = text_x + " extra"                         # A v2: near-dup of B
    cols = "doc_id long, text string, lang string, source string, n_chars long"

    def _doc(doc_id, text):
        return (doc_id, text, "en", "t", len(text))

    def _write(rows, path):
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            path, compression="none"
        )

    for name, start in (
        ("icws", streaming_icws_dedup),
        ("minhash", streaming_minhash_dedup),
    ):
        in_dir = str(tmp_path / f"{name}_in")
        os.makedirs(in_dir)
        _write([_doc(1, text_x), _doc(2, text_x)], str(tmp_path / f"{name}_b0"))
        _write([_doc(1, text_x2)], str(tmp_path / f"{name}_b1"))
        import glob as globmod
        import shutil

        parts = sorted(
            globmod.glob(str(tmp_path / f"{name}_b*") + "/part-*.parquet")
        )
        for i, p in enumerate(parts):
            shutil.copy(p, f"{in_dir}/batch_{i}.parquet")

        store, pairs, ckpt = (
            str(tmp_path / f"{name}_store"),
            str(tmp_path / f"{name}_pairs"),
            str(tmp_path / f"{name}_ckpt"),
        )
        q = start(spark, in_dir, store, pairs, ckpt, glob="batch_*.parquet")
        q.processAllAvailable()
        q.stop()

        # store now holds doc 1 under batch_id=0 AND batch_id=1
        raw = spark.read.parquet(store)
        assert raw.filter(F.col("doc_id") == 1).count() == 2

        # batch 1's pair partition: doc 1 (v2) vs doc 2 — EXACTLY one
        # row, scored against v2, not v1 (v1 vs doc 2 would be 1.0)
        p1 = spark.read.parquet(f"{pairs}/batch_id=1").collect()
        assert len(p1) == 1, (name, p1)
        score = p1[0][2]
        assert 0.5 <= score < 1.0, (name, score)


def test_streaming_bm25_batch_matches_batch(spark, sf_smoke, tmp_path):
    """Incrementally built index + the batched finalizer must equal
    the single-pass bm25_topk_batch bit for bit (shared scoring
    path), with the stream built over the batch's term union."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.retrieval import (
        BM25_QUERY_BATCH,
        bm25_topk_batch,
    )
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.bm25 import (
        finalize_bm25_topk_batch,
        streaming_bm25_build,
    )

    union_terms = tuple(
        sorted({t for _, terms in BM25_QUERY_BATCH for t in terms})
    )
    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_bm25_build(
        spark, flat, str(tmp_path / "tf"), str(tmp_path / "dl"),
        str(tmp_path / "ckpt"), terms=union_terms,
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in finalize_bm25_topk_batch(
            spark, str(tmp_path / "tf"), str(tmp_path / "dl")
        ).collect()
    )
    expect = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_topk_batch(spark, sf_smoke).collect()
    )
    assert got == expect and got


def test_streaming_phrase_search_matches_batch(spark, sf_smoke, tmp_path):
    """A phrase match is a per-document fact, so the stateless
    streaming twin run over a 2-file corpus split must union to
    exactly the batch operator's rows."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.retrieval import phrase_search
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.jobs import streaming_phrase_search

    in_dir = str(tmp_path / "pdocs")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(2):
        docs.filter(F.col("doc_id") % 2 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "pflat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_phrase_search(
        spark, flat, str(tmp_path / "pout"), str(tmp_path / "pckpt"),
        glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_id, r.n_matches)
        for r in spark.read.parquet(str(tmp_path / "pout"))
        .select("doc_id", "n_matches")
        .collect()
    }
    expect = {
        (r.doc_id, r.n_matches)
        for r in phrase_search(spark, sf_smoke).collect()
    }
    assert got == expect and got


def test_streaming_psi_matches_batch(spark, sf_smoke, tmp_path):
    """Current-side bin counts folded across micro-batches under the
    FROZEN reference edges equal the single-pass counts cell-for-cell,
    so the finalized PSI is bit-identical to batch drift_psi over the
    same (ref, cur) pair — including the injected purchase drift."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.features import drift_psi
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.drift import (
        finalize_streaming_psi,
        streaming_psi_build,
    )

    ev = load_table(spark, sf_smoke, "events")
    ref = ev.filter(F.col("user_id") % 2 == 0)
    cur = ev.filter(F.col("user_id") % 2 == 1).withColumn(
        "value",
        F.when(
            F.col("event_type") == "purchase", F.col("value") + F.lit(25.0)
        ).otherwise(F.col("value")),
    )

    in_dir = str(tmp_path / "cur_in")
    for m in range(3):
        cur.filter(F.col("event_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_psi_build(
        spark, flat, str(tmp_path / "store"), str(tmp_path / "ckpt"), ref
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in finalize_streaming_psi(
            spark, str(tmp_path / "store"), ref
        ).collect()
    }
    expect = {tuple(r) for r in drift_psi(ref, cur).collect()}
    assert got and got == expect
    assert any(r[-1] == 1 for r in got)  # the drifted flag survives


def test_streaming_sq_encode_matches_batch(spark, sf_smoke, tmp_path):
    """SQ8 codes assigned to arriving vectors under the FROZEN base
    bounds equal the batch encode row-for-row over a split stream."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.pq import _normalized_pts, sq_bounds, sq_encode
    from mimir_spark.sources.tables import SCHEMAS, load_table
    from mimir_spark.streaming.ann import streaming_sq_encode

    stage = str(tmp_path / "stage")
    load_table(spark, sf_smoke, "embeddings").repartition(2).write.parquet(
        stage
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    for i, f in enumerate(sorted(globmod.glob(f"{stage}/part-*.parquet"))):
        shutil.copy(f, f"{in_dir}/f{i}.parquet")

    pts = _normalized_pts(spark, sf_smoke)
    bounds_row = sq_bounds(pts).collect()[0]

    emb_stream = (
        spark.readStream.schema(SCHEMAS["embeddings"])
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = []
    q = (
        streaming_sq_encode(emb_stream, bounds_row)
        .writeStream.format("memory")
        .queryName("sq_codes_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["neighbor_id"], tuple(r["code"]))
            for r in spark.sql("select * from sq_codes_stream").collect()
        }
    finally:
        q.stop()

    expect = {
        (r["neighbor_id"], tuple(r["code"]))
        for r in sq_encode(pts, sq_bounds(pts)).collect()
    }
    assert got == expect and got


def test_streaming_kmv_matches_batch(spark, sf_smoke, tmp_path):
    """Per-batch bottom-k partials merged by the finalizer must give
    the identical pairwise set-op report as the single-pass batch
    operator (bottom-k mergeability)."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.sketches import kmv_source_setops
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.kmv import (
        finalize_kmv_setops,
        streaming_kmv_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_kmv_build(
        spark, flat, str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r) for r in finalize_kmv_setops(spark, str(tmp_path / "sketch")).collect()
    }
    want = {tuple(r) for r in kmv_source_setops(spark, sf_smoke).collect()}
    assert got == want and len(got) > 0


def test_streaming_winnow_matches_batch(spark, sf_smoke, tmp_path):
    """Per-batch fingerprint partials + the shared matching tail must
    equal the single-pass batch report."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.winnow import winnowing_matches
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.winnow import (
        finalize_winnow_matches,
        streaming_winnow_build,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_winnow_build(
        spark, flat, str(tmp_path / "fps"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in finalize_winnow_matches(
            spark, str(tmp_path / "fps"), maxdf=100, min_shared=1
        ).collect()
    }
    want = {
        tuple(r)
        for r in winnowing_matches(
            spark, sf_smoke, maxdf=100, min_shared=1
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_lang_id_matches_batch(spark, sf_smoke, tmp_path):
    """Frozen-model micro-batch scoring + plain-union finalizer must
    equal the batch lang_id row-for-row (scoring is a pure per-doc
    function of the model artifact)."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.operators.textstats import lang_id
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.langid import (
        finalize_lang_id,
        streaming_lang_id,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_lang_id(
        spark,
        sf_smoke,
        flat,
        str(tmp_path / "preds"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in finalize_lang_id(spark, str(tmp_path / "preds")).collect()
    }
    want = {tuple(r) for r in lang_id(spark, sf_smoke).collect()}
    assert got == want and got
