"""Round-12 tour: the three tokenizer trainers side by side, plus
language routing with the trigram NB classifier.

- BPE merges frequent pairs, WordPiece merges high-likelihood-ratio
  pairs, unigram-LM starts over-complete and prunes — same corpus,
  three vocabularies; the compression report shows what each buys.
- Round 14: the production lifecycle — train ONCE, persist the frozen
  model artifact, encode from it in any later job or stream; plus
  byte-level BPE, which cannot OOV on any input.
- lang_id + lang_id_confidence route docs: confident predictions pass,
  low-margin docs would go to a heavier model.

Run: python examples/tokenizer_and_langid.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mimir_spark.operators.textstats import lang_id, lang_id_confidence
from mimir_spark.operators.tokenizer import (
    bpe_encode,
    bpe_train,
    unigram_encode,
    unigram_lm_train,
    wordpiece_train,
)
from mimir_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tokenizer_langid_example")

    print("== trainers ==")
    print("BPE merges      :", [r.merged for r in bpe_train(spark, sf_dir, 5).collect()])
    print("WordPiece merges:", [r.merged for r in wordpiece_train(spark, sf_dir, 5).collect()])
    uni = unigram_lm_train(spark, sf_dir)
    top = uni.filter("n_chars > 1").orderBy(F.desc("count")).limit(5).collect()
    print("unigram pieces  :", [(r.piece, r["count"]) for r in top])

    print("== compression (chars per symbol, corpus mean) ==")
    for name, df in [
        ("bpe    ", bpe_encode(spark, sf_dir)),
        ("unigram", unigram_encode(spark, sf_dir)),
    ]:
        m = df.agg(
            (F.sum("total_chars") / F.sum("total_symbols")).alias("r")
        ).collect()[0]["r"]
        print(f"  {name}: {m:.3f}")

    print("== frozen artifact: train once, encode many ==")
    import tempfile

    from mimir_spark.operators.tokenizer import (
        byte_bpe_encode_ids,
        unigram_encode_ids_from_model,
        write_unigram_model,
    )

    with tempfile.TemporaryDirectory() as td:
        model_dir = os.path.join(td, "unigram_model")
        write_unigram_model(spark, sf_dir, model_dir)  # the train job
        ids = unigram_encode_ids_from_model(spark, sf_dir, model_dir)
        n = ids.agg(F.sum("n_ids")).collect()[0][0]  # the encode job
        print(f"  encoded {n} subword ids from the persisted model"
              " (zero train stages)")

    print("== byte-level BPE (zero OOV) ==")
    b = byte_bpe_encode_ids(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_ids").alias("ids")
    ).collect()[0]
    print(f"  {b['docs']} docs -> {b['ids']} byte-BPE ids"
          " (every doc encodes — the byte alphabet cannot OOV)")

    print("== language routing ==")
    acc = lang_id(spark, sf_dir).agg(F.avg("is_correct")).collect()[0][0]
    print("  on-corpus accuracy (near-chance by construction):", round(acc, 3))
    conf = lang_id_confidence(spark, sf_dir)
    routed = conf.withColumn(
        "route",
        F.when(F.col("margin_micro") >= 1_000_000, "accept").otherwise(
            "heavy-model"
        ),
    )
    routed.groupBy("route").count().show()
    spark.stop()


if __name__ == "__main__":
    main()
