"""Persisted near-dup index on mimir_spark: build the MinHash-LSH
signature index once, then answer "is this new batch a near-dup of
anything already ingested?" by reading only the bucket shards the
batch's own signatures touch — the ingest-time dedup loop a corpus
build runs continuously, without re-scanning the corpus per batch.

Also shows the re-banding escape hatch: the raw 128-minima signatures
are stored alongside the bucket shards, so a different banding scheme
(tighter threshold, asymmetric containment bands) can be derived later
WITHOUT repeating the corpus pass.

Run: python examples/lsh_index_probe.py [sf_dir] [index_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mimir_spark.operators.lsh_index import (
    lsh_bucket_rows,
    lsh_query_index,
    write_lsh_index,
)
from mimir_spark.session import get_spark
from mimir_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    idx = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="lsh_idx_")
    spark = get_spark("lsh_index_example")

    print("build     : one corpus pass ->", idx)
    write_lsh_index(spark, sf_dir, idx)
    n_buckets = spark.read.parquet(f"{idx}/buckets").count()
    print("buckets   :", n_buckets, "rows across",
          spark.read.parquet(f"{idx}/buckets").select("shard").distinct().count(),
          "shards")

    # a 'new batch' arrives: every 17th doc stands in for fresh ingest
    batch = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 0
    )
    print("probe     :", batch.count(), "new docs")
    hits = lsh_query_index(spark, batch, idx)
    print("near-dups :")
    hits.orderBy("doc_a", "doc_b").show(10, truncate=False)

    # re-banding without a corpus pass: rebuild bucket rows straight
    # from the stored signatures (e.g. to try a different scheme)
    sig = spark.read.parquet(f"{idx}/signatures")
    print("re-band   :", lsh_bucket_rows(sig).count(),
          "bucket rows derived from stored signatures alone")


if __name__ == "__main__":
    main()
