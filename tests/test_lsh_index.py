"""Persisted MinHash-LSH signature index (operators/lsh_index.py):
the probe path must return exactly the pairs the in-memory LSH
pipeline finds, while READING only the bucket shards the probe's own
signatures touch (partition pruning, not a corpus scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mimir_spark.operators.dedup import dedup_minhash_lsh
from mimir_spark.operators.lsh_index import (
    PROBE_MOD,
    dedup_lsh_query_indexed,
    lsh_query_index,
    write_lsh_index,
)
from mimir_spark.sources.tables import load_table


def test_indexed_probe_matches_inmemory_lsh(spark, sf_smoke):
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_lsh_query_indexed(spark, sf_smoke).collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_smoke).collect()
        if r.doc_a % PROBE_MOD == 0 or r.doc_b % PROBE_MOD == 0
    }
    assert got == expect


def test_index_probe_prunes_shards(spark, sf_smoke, tmp_path):
    """A single-doc probe must hit the buckets table through
    PartitionFilters on `shard` — the property that makes the index
    an index (probe cost ∝ probe buckets, not corpus size)."""
    idx = str(tmp_path / "lsh")
    write_lsh_index(spark, sf_smoke, idx)
    probe = load_table(spark, sf_smoke, "documents").filter(
        F.col("doc_id") == 1
    )
    out = lsh_query_index(spark, probe, idx)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [shard" in plan, plan[:2000]
    out.collect()  # and the pruned plan actually runs


def test_signatures_table_enables_rebanding(spark, sf_smoke, tmp_path):
    """The stored raw signatures must reproduce the bucket table
    without a corpus pass — the 'derive a new banding later' claim."""
    from mimir_spark.operators.lsh_index import lsh_bucket_rows

    idx = str(tmp_path / "lsh")
    write_lsh_index(spark, sf_smoke, idx)
    sig = spark.read.parquet(f"{idx}/signatures")
    rebuilt = {
        (r.doc_id, r.band, r.bucket)
        for r in lsh_bucket_rows(sig).collect()
    }
    stored = {
        (r.doc_id, r.band, r.bucket)
        for r in spark.read.parquet(f"{idx}/buckets").collect()
    }
    assert rebuilt == stored and rebuilt


def test_stream_store_exports_equivalent_index(spark, sf_smoke, tmp_path):
    """Stream the corpus in micro-batches, compact the signature
    store, export the persisted LSH index from the STORE (no corpus
    re-scan) — probing it must return exactly what probing the
    batch-built index returns."""
    import glob as globmod
    import os
    import shutil

    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.jobs import compact_stream_store
    from mimir_spark.streaming.minhash import (
        export_lsh_index_from_stream,
        streaming_minhash_dedup,
    )

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

    store = str(tmp_path / "store")
    q = streaming_minhash_dedup(
        spark, flat, store, str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"), glob="batch_*.parquet",
    )
    q.processAllAvailable()
    q.stop()
    compact_stream_store(spark, store)

    idx_stream = str(tmp_path / "idx_stream")
    export_lsh_index_from_stream(spark, store, idx_stream)
    idx_batch = str(tmp_path / "idx_batch")
    write_lsh_index(spark, sf_smoke, idx_batch)

    probe = load_table(spark, sf_smoke, "documents").filter(
        F.col("doc_id") % PROBE_MOD == 0
    )
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in lsh_query_index(spark, probe, idx_stream).collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in lsh_query_index(spark, probe, idx_batch).collect()
    }
    assert got == expect and got


def test_compact_stream_store_survives_max_batch_retry(spark, tmp_path):
    """The one batch a restarted stream can replay is the max batch id
    seen (earlier ones are checkpoint-committed before their successor
    starts). After compaction the base must live at max_b - 1 so that
    a retry's mode('overwrite') of batch_id=max_b re-creates only its
    own partition — not the entire resolved store."""
    import os

    from mimir_spark.streaming.jobs import compact_stream_store

    store = str(tmp_path / "store")
    batches = {
        0: [(1, "a0"), (2, "b0"), (3, "c0")],
        1: [(2, "b1")],
        2: [(3, "c2"), (4, "d2")],
    }
    for b, rows in batches.items():
        spark.createDataFrame(rows, "doc_id long, val string").write.parquet(
            f"{store}/batch_id={b}"
        )
    compact_stream_store(spark, store)
    subdirs = sorted(
        d for d in os.listdir(store) if d.startswith("batch_id=")
    )
    assert subdirs == ["batch_id=1"], subdirs  # base at max_b - 1

    resolved_before = {
        (r.doc_id, r.val)
        for r in spark.read.parquet(store).drop("batch_id").collect()
    }
    assert resolved_before == {(1, "a0"), (2, "b1"), (3, "c2"), (4, "d2")}

    # Simulated foreachBatch retry of the max batch: deterministic
    # reprocessing overwrites ONLY batch_id=2 with the same rows.
    spark.createDataFrame(
        batches[2], "doc_id long, val string"
    ).write.mode("overwrite").parquet(f"{store}/batch_id=2")

    latest = (
        spark.read.parquet(store)
        .groupBy("doc_id")
        .agg(F.max("batch_id").alias("batch_id"))
    )
    resolved_after = {
        (r.doc_id, r.val)
        for r in spark.read.parquet(store)
        .join(latest, ["doc_id", "batch_id"])
        .collect()
    }
    assert resolved_after == resolved_before

    # Single-batch store: base keeps its id (overwrite-retry of that
    # id rewrites identical content — already safe).
    solo = str(tmp_path / "solo")
    spark.createDataFrame(
        batches[0], "doc_id long, val string"
    ).write.parquet(f"{solo}/batch_id=5")
    compact_stream_store(spark, solo)
    assert sorted(
        d for d in os.listdir(solo) if d.startswith("batch_id=")
    ) == ["batch_id=5"]
