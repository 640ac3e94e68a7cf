"""Mimir-style WordCount on mimir_spark — the migration example.

A Mimir user writes map/combine/reduce callbacks; here the same mental
model chains through MimirPipeline and compiles to one declarative
Spark plan (Catalyst's partial aggregation IS the map-side combiner).

Run: python examples/wordcount_mimir_style.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mimir_spark.api import MimirPipeline
from mimir_spark.session import get_spark
from mimir_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("wordcount_example")
    docs = load_table(spark, sf_dir, "documents")

    top = (
        MimirPipeline(docs)
        # map: one input record -> many KV records
        .flat_map(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        # combiner + aggregate + reduce, one declarative step
        .reduce_by_key(["word"], F.count("*").alias("cnt"))
        .to_df()
        .orderBy(F.col("cnt").desc(), "word")
        .limit(10)
    )
    top.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
