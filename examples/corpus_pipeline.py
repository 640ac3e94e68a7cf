"""End-to-end training-data pipeline on mimir_spark: clean -> dedup ->
decontaminate -> quality-filter -> pack -> export shards.

Every stage is one of the engine's operators; the chain stays
declarative until the final write.

Run: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimir_spark.operators.corpus import decontaminate_corpus
from mimir_spark.operators.dedup import dedup_span_removal
from mimir_spark.operators.packing import sequence_pack
from mimir_spark.operators.pipeline import corpus_clean_pipeline
from mimir_spark.operators.quality import gopher_quality_filter
from mimir_spark.session import get_spark
from mimir_spark.sources.io import write_packed_shards


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")
    spark = get_spark("corpus_pipeline_example")

    print("clean     :", corpus_clean_pipeline(spark, sf_dir).count(), "docs survive")
    print("decontam  :", decontaminate_corpus(spark, sf_dir).count(), "docs survive")
    print("span dedup:", dedup_span_removal(spark, sf_dir)
          .filter("n_removed > 0").count(), "docs had spans removed")
    print("gopher    :", gopher_quality_filter(spark, sf_dir)
          .filter("passes_gopher = 1").count(), "docs pass all rules")
    packed = sequence_pack(spark, sf_dir)
    manifest = write_packed_shards(packed, out)
    print("shards    :", manifest.count(), "shard manifest rows ->", out)
    spark.stop()


if __name__ == "__main__":
    main()
