"""Incremental corpus maintenance on mimir_spark: the streaming twins
working together over a directory that receives document batches.

One input directory, four independent incremental consumers — each
keeps bounded state in idempotent ``batch_id=N`` layouts and each
finalizer provably matches its batch operator:

- MinHash+LSH near-dup pairs  (matches dedup_minhash_lsh)
- BM25 index                  (matches bm25_topk)
- deterministic reservoir     (matches sample_reservoir)
- count-min heavy hitters     (matches heavy_hitters_cms)

Run: python examples/incremental_corpus.py [sf_dir]
"""

import glob as globmod
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mimir_spark.session import get_spark
from mimir_spark.sources.tables import load_table
from mimir_spark.streaming.bm25 import finalize_bm25_topk, streaming_bm25_build
from mimir_spark.streaming.cms import (
    finalize_cms_heavy_hitters,
    streaming_cms_build,
)
from mimir_spark.streaming.minhash import streaming_minhash_dedup
from mimir_spark.streaming.reservoir import (
    finalize_reservoir,
    streaming_reservoir_build,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="incr_corpus_")
    spark = get_spark("incremental_corpus_example")

    # Simulate a landing zone receiving the corpus as 3 daily batches.
    in_dir = f"{work}/landing"
    docs = load_table(spark, sf_dir, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{work}/b{m}", compression="none"
        )
    os.makedirs(in_dir)
    for i, part in enumerate(sorted(globmod.glob(f"{work}/b*/part-*.parquet"))):
        shutil.copy(part, f"{in_dir}/batch_{i}.parquet")

    jobs = [
        streaming_minhash_dedup(
            spark, in_dir, f"{work}/sigs", f"{work}/pairs", f"{work}/ck_mh"
        ),
        streaming_bm25_build(
            spark, in_dir, f"{work}/tf", f"{work}/dl", f"{work}/ck_bm"
        ),
        streaming_reservoir_build(
            spark, in_dir, f"{work}/res", f"{work}/ck_rs"
        ),
        streaming_cms_build(
            spark, in_dir, f"{work}/sketch", f"{work}/words", f"{work}/ck_cm"
        ),
    ]
    for q in jobs:
        q.processAllAvailable()
        q.stop()

    n_pairs = spark.read.parquet(f"{work}/pairs").count()
    print(f"near-dup pairs found incrementally : {n_pairs}")
    print("BM25 top-3 from the incremental index:")
    for r in finalize_bm25_topk(spark, f"{work}/tf", f"{work}/dl", k=3).collect():
        print(f"  #{r.rank}: doc {r.doc_id}  score={r.score}")
    n_sample = finalize_reservoir(spark, f"{work}/res").count()
    print(f"reservoir sample size              : {n_sample}")
    hh = finalize_cms_heavy_hitters(
        spark, f"{work}/sketch", f"{work}/words", threshold=80
    ).count()
    print(f"heavy hitters (count >= 80)        : {hh}")
    print("state at", work)


if __name__ == "__main__":
    main()
