"""Retrieval stack on mimir_spark: lexical BM25, two-stage hybrid
re-rank, and the persisted-IVF build/query split — the search side of
a corpus a training pipeline also deduplicates.

Every stage is an engine operator; the IVF leg shows the
build-once/query-many index layout (cell-partitioned parquet, probed
cells read via partition pruning).

Run: python examples/retrieval_pipeline.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimir_spark.operators.retrieval import bm25_topk, hybrid_retrieval
from mimir_spark.operators.similarity import (
    ann_ivf_query_indexed,
    write_ivf_index,
)
from mimir_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval_pipeline_example")

    print("-- BM25 top-5 for", "('spark','join','window') --")
    for r in bm25_topk(spark, sf_dir, k=5).orderBy("rank").collect():
        print(f"  #{r.rank}: doc {r.doc_id}  score={r.score}")

    print("-- hybrid (BM25 pool -> embedding cosine re-rank) top-5 --")
    for r in hybrid_retrieval(spark, sf_dir, k=5).orderBy("rank").collect():
        print(f"  #{r.rank}: doc {r.doc_id}  cos={r.cos}  (bm25 #{r.bm25_rank})")

    print("-- contrastive hard negatives (BM25 pool minus the positive's")
    print("   near-dup partners — false negatives excluded) --")
    from mimir_spark.operators.retrieval import retrieval_hard_negatives

    for r in retrieval_hard_negatives(spark, sf_dir).orderBy("neg_rank").collect()[:5]:
        print(f"  neg #{r.neg_rank}: doc {r.doc_id}  score={r.score}")

    idx = tempfile.mkdtemp(prefix="ivf_idx_")
    write_ivf_index(spark, sf_dir, idx)
    print("-- persisted-IVF ANN top-3 (partition-pruned probes) --")
    got = (
        ann_ivf_query_indexed(spark, sf_dir, idx, k=3)
        .orderBy("query_id", "rank")
        .collect()
    )
    for r in got[:9]:
        print(f"  q{r.query_id} #{r.rank}: vec {r.neighbor_id}  cos={r.cos}")
    print("index at", idx)


if __name__ == "__main__":
    main()
