"""Dedup-method audit on mimir_spark: run the full near-dup toolbox
over one corpus and read the calibration signals a curation team
checks before committing to a method at scale.

- exact set-Jaccard vs exact WEIGHTED Jaccard (multiset — catches
  repeated boilerplate) vs containment (paragraph-in-book);
- each exact path's scale twin (prefix filtering, ICWS banding,
  size-class-tuned containment banding) with its recall report;
- distribution cutoffs from the quantile sketch block.

Run: python examples/dedup_audit.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimir_spark.operators.dedup import minhash_dedup_recall
from mimir_spark.operators.dedup2 import (
    containment_lsh_recall,
    dedup_jaccard_prefix,
)
from mimir_spark.operators.sketches import rank_quantiles, tdigest_quantiles
from mimir_spark.operators.weighted import dedup_weighted_jaccard, icws_recall
from mimir_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dedup_audit_example")

    print("== exact pair sets ==")
    print("prefix-filtered set-Jaccard pairs:",
          dedup_jaccard_prefix(spark, sf_dir).count())
    wj = dedup_weighted_jaccard(spark, sf_dir)
    print("weighted (multiset) Jaccard pairs:", wj.count())

    print("== sketch-path recall reports (precision/recall vs exact) ==")
    for name, fn in (
        ("minhash-LSH  ", minhash_dedup_recall),
        ("ICWS weighted", icws_recall),
        ("containment  ", containment_lsh_recall),
    ):
        r = fn(spark, sf_dir).collect()[0]
        print(f"{name}: precision={r.precision} recall={r.recall} "
              f"({r.n_hit}/{r.n_exact_pairs} exact pairs surfaced)")

    print("== value-distribution cutoffs (events.value) ==")
    for r in rank_quantiles(spark, sf_dir).orderBy("q").collect():
        print(f"bottom-k sample  p{int(r.q * 100)}: {r.est}")
    for r in tdigest_quantiles(spark, sf_dir).orderBy("q").collect():
        print(f"t-digest         p{int(r.q * 100)}: {r.est}")
    spark.stop()


if __name__ == "__main__":
    main()
