"""The COMPOSED corpus build — the job a pre-training data team ships:

  corpus_keep_list  (clean ∩ Gopher ∩ decontaminated ∖ LSH losers)
      → semi-join the corpus down to the kept docs
      → dataset_mixture_plan_docs  (budget the SURVIVING mixture)
      → sequence_pack_docs         (distributed prefix-sum packing)
      → write_packed_shards        (lang/shard-partitioned layout)

Unlike examples/corpus_pipeline.py (which runs each stage standalone
to show the operators), everything here flows through the keep-list:
one decision manifest, one filtered corpus, and the plan/pack/export
stages all run on exactly the docs that survived — the composition
contract pinned in tests/test_round10_ops.py.

Run: python examples/corpus_build_end_to_end.py [sf_dir] [out_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimir_spark.operators.packing import (
    dataset_mixture_plan_docs,
    sequence_pack_docs,
)
from mimir_spark.operators.pipeline import corpus_keep_list
from mimir_spark.session import get_spark
from mimir_spark.sources.io import write_packed_shards
from mimir_spark.sources.tables import load_table


def build(spark, sf_dir: str, out_dir: str):
    """Returns (keep, plan, packed, manifest) DataFrames; the shard
    write happens inside. Everything before the write is one lazy
    declarative plan over the keep-list."""
    keep = corpus_keep_list(spark, sf_dir)
    kept_docs = load_table(spark, sf_dir, "documents").join(
        keep.select("doc_id"), "doc_id", "semi"
    )
    plan = dataset_mixture_plan_docs(kept_docs)
    packed = sequence_pack_docs(kept_docs)
    manifest = write_packed_shards(packed, out_dir)
    return keep, plan, packed, manifest


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="build_")
    spark = get_spark("corpus_build_end_to_end")
    keep, plan, packed, manifest = build(spark, sf_dir, out)
    print("keep-list :", keep.count(), "docs survive the full gauntlet")
    print("mixture   :")
    for r in plan.orderBy("source").collect():
        print(
            f"  {r.source}: {r.n_docs} docs, {r.n_tokens} tokens, "
            f"weight {r.weight} -> alloc {r.alloc_tokens} "
            f"(rate {r.sample_rate})"
        )
    print("packed    :", packed.count(), "docs into sequences")
    print("manifest  :", manifest.count(), "shards ->", out)
    spark.stop()


if __name__ == "__main__":
    main()
