"""Web-corpus curation with the round-13 stages: raw HTML → main
text → URL/domain curation → frozen-tokenizer id streams → real
token-id training shards.

This is the front half a crawl-based corpus build runs BEFORE the
quality/dedup chain in examples/corpus_pipeline.py:

  1. html_extract_text     — strip boilerplate, keep the main text
  2. url_normalize          — canonicalize mirror hosts / tracking noise
  3. url_dedup_survivors    — blocklist domains, dedup canonical URLs
  4. unigram_corpus_ids     — subword ids under the trained tokenizer
  5. sequence_pack_token_ids → write_packed_shards — shards whose
     files carry the actual id stream a loader reads

Run: python examples/web_corpus_curation.py [sf_dir] [out_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mimir_spark.operators.html import html_extract_text
from mimir_spark.operators.packing import sequence_pack_token_ids
from mimir_spark.operators.tokenizer import unigram_corpus_ids
from mimir_spark.operators.urls import url_dedup_survivors, url_normalize
from mimir_spark.session import get_spark
from mimir_spark.sources.io import write_packed_shards


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="webshards_")
    spark = get_spark("web_corpus_curation_example")

    extracted = html_extract_text(spark, sf_dir)
    print(
        "extract   :",
        extracted.agg(
            F.count("*").alias("docs"),
            F.sum("n_dropped_semantic").alias("nav_footer"),
            F.sum("n_dropped_density").alias("link_stuffed"),
        ).collect()[0],
    )

    urls = url_normalize(spark, sf_dir)
    print(
        "normalize :",
        urls.agg(
            F.countDistinct("url").alias("raw"),
            F.countDistinct("norm_url").alias("canonical"),
            F.sum("n_tracking").alias("tracking_params_dropped"),
        ).collect()[0],
    )

    survivors = url_dedup_survivors(spark, sf_dir)
    print("url dedup :", survivors.count(), "canonical pages survive the blocklist")

    # keep only the surviving pages' docs, then emit id streams
    keep = survivors.select(
        F.col("survivor_doc_id").alias("doc_id")
    )
    ids = unigram_corpus_ids(spark, sf_dir).join(keep, "doc_id", "left_semi")
    print(
        "tokenize  :",
        ids.agg(
            F.count("*").alias("docs"), F.sum("n_ids").alias("tokens")
        ).collect()[0],
    )

    manifest = write_packed_shards(
        sequence_pack_token_ids(ids), out, seqs_per_shard=64
    )
    print("shards    :")
    manifest.show(truncate=False)
    print("written to", out)


if __name__ == "__main__":
    main()
