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
