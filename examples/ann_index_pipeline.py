"""Vector-index lifecycle on mimir_spark: build the persisted IVF-PQ
index once, then serve queries three ways and read the quality/cost
dials a deployment tunes.

- build: trained coarse quantizer (Voronoi cells) + product
  quantization of the cell residuals, written as centroids +
  codebooks (bounded metadata) + cell_id-PARTITIONED code shards;
- serve: (a) cell-pruned ADC scan over the persisted codes,
  (b) ADC shortlist + exact re-rank (the IVFADC+refine recipe),
  (c) brute-force exact — the ground truth the recall dial is
  measured against;
- dials: ann_ivfpq_recall (probe+quantization misses) vs
  ann_pq_recall (flat-PQ baseline: what the coarse quantizer's
  residual centering buys).

Run: python examples/ann_index_pipeline.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimir_spark.operators.ivfpq import (
    ann_ivfpq_query_indexed,
    ann_ivfpq_recall,
    ann_ivfpq_rerank_topk,
    write_ivfpq_index,
)
from mimir_spark.operators.pq import ann_pq_recall
from mimir_spark.operators.similarity import ann_bruteforce_topk
from mimir_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ann_index_pipeline")

    with tempfile.TemporaryDirectory() as tmp:
        idx = os.path.join(tmp, "ivfpq")
        write_ivfpq_index(spark, sf_dir, idx)
        print(f"index built at {idx}:")
        for sub in ("centroids", "codebooks", "codes"):
            n = spark.read.parquet(f"{idx}/{sub}").count()
            print(f"  {sub}: {n} rows")

        print("\ncell-pruned ADC scan over the persisted codes:")
        ann_ivfpq_query_indexed(spark, sf_dir, idx).show(10)

    print("IVFADC+refine (shortlist + exact re-rank):")
    rerank = ann_ivfpq_rerank_topk(spark, sf_dir)
    rerank.show(10)

    truth = ann_bruteforce_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hit = rerank.select("query_id", "neighbor_id").join(
        truth, ["query_id", "neighbor_id"]
    ).count()
    print(f"re-ranked recall@5 vs exact: {hit}/{truth.count()}")

    print("\nquality dials (raw ADC, no re-rank):")
    ivfpq = ann_ivfpq_recall(spark, sf_dir).agg({"recall": "avg"}).collect()
    flat = ann_pq_recall(spark, sf_dir).agg({"recall": "avg"}).collect()
    print(f"  IVF-PQ (residual codes): {ivfpq[0][0]:.2f}")
    print(f"  flat PQ (same code budget): {flat[0][0]:.2f}")


if __name__ == "__main__":
    main()
