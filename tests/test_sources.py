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


def test_bucketed_join_elides_shuffle(spark, sf_smoke, tmp_path):
    """orders and lineitem bucketed on orderkey with the same bucket
    count must sort-merge-join with NO exchange on either side — the
    write-time shuffle replaces every future read-time shuffle."""
    from mimir_spark.sources.io import read_table_from_catalog, write_bucketed

    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8, path=str(tmp_path / "ob"))
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 8, path=str(tmp_path / "lb"))
    try:
        ob = read_table_from_catalog(spark, "t_orders_b")
        lb = read_table_from_catalog(spark, "t_lineitem_b")
        # force the SMJ path so the bucketing (not a broadcast) is what
        # saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        joined.count()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_zorder_write_clusters_both_dims(spark, sf_smoke, tmp_path):
    """Z-ordered files must cover a much smaller (orderkey × partkey)
    rectangle per file than the natural write order, which is only
    clustered on orderkey — that rectangle area is exactly what
    row-group min/max skipping prunes by."""
    from mimir_spark.functions.zorder import write_zordered

    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_partkey")
    z_path, n_path = str(tmp_path / "z"), str(tmp_path / "n")
    write_zordered(li, z_path, ["l_orderkey", "l_partkey"], n_files=8)
    li.repartition(8).write.parquet(n_path)

    def mean_area(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        spans = df.groupBy("f").agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("so"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("sp"),
        )
        r = spans.agg(F.avg(F.col("so") * F.col("sp"))).collect()[0][0]
        return float(r)

    assert mean_area(z_path) < 0.5 * mean_area(n_path)


def test_write_packed_shards_layout(spark, sf_smoke, tmp_path):
    """Shard layout: every (lang, shard) directory exists, docs land
    in the shard of their first token, and the manifest's token totals
    tie out to the packed input exactly."""
    import glob as globmod

    from mimir_spark.operators.packing import sequence_pack
    from mimir_spark.sources.io import write_packed_shards

    out = str(tmp_path / "shards")
    packed = sequence_pack(spark, sf_smoke)
    manifest = write_packed_shards(packed, out, seqs_per_shard=4).collect()

    dirs = {
        tuple(p.rsplit("/", 2)[-2:])
        for p in globmod.glob(out + "/lang=*/shard=*")
    }
    assert dirs == {
        (f"lang={r.lang}", f"shard={r.shard}") for r in manifest
    }
    total_manifest = sum(r.n_tokens for r in manifest)
    total_packed = sum(r.n_tokens for r in packed.collect())
    assert total_manifest == total_packed
    back = spark.read.parquet(out)
    assert back.count() == packed.count()
    for r in back.select("seq_id", "shard").distinct().collect():
        assert r.seq_id // 4 == r.shard


def test_orc_round_trip_with_pushdown(spark, sf_smoke, tmp_path):
    from mimir_spark.sources.io import read_orc, write_orc

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "orc_out")
    write_orc(ev, out, ["event_type"])
    back = read_orc(spark, out)
    assert back.count() == ev.count()
    # partition pruning reaches the ORC scan
    one = back.filter(F.col("event_type") == "click")
    assert one.count() == ev.filter(F.col("event_type") == "click").count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "click" in plan  # partition filter visible in the scan


def test_upsert_partitions_touches_only_updated(spark, tmp_path):
    from mimir_spark.sources.io import upsert_partitions

    out = str(tmp_path / "ups")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id long, day string, v long"
    )
    base.write.partitionBy("day").parquet(out)
    # re-ingest day 'a' with corrected rows; day 'b' must survive
    upd = spark.createDataFrame([(1, "a", 11)], "id long, day string, v long")
    upsert_partitions(spark, upd, out, ["day"])
    got = {(r.id, r.day, r.v) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a", 11), (3, "b", 30)}
    # idempotent: re-running the same batch yields the same table
    upsert_partitions(spark, upd, out, ["day"])
    got2 = {(r.id, r.day, r.v) for r in spark.read.parquet(out).collect()}
    assert got2 == got
