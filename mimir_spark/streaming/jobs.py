"""Structured Streaming twins of the batch operators.

Each job takes a streaming DataFrame (file source over the test
parquet, rate source, or anything schema-compatible) and returns the
transformed streaming DataFrame — callers attach the sink. Tests run
them with a memory sink and processAllAvailable().

Mimir has no streaming story; this is part of the beyond-reference
pipeline surface. The batch/stream pairs share grouping logic so a
backfill (batch) and live path produce the same answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mimir_spark.sources.tables import SCHEMAS


def read_events_stream(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch here; on a cluster this is a drop-in for a Kafka
    source with the same schema). The file source wants a directory,
    so we stream the corpus dir with a glob filter; events.ts has
    shipped as both parquet TIMESTAMP(NANOS) (→ read as long, truncate
    to µs) and plain TIMESTAMP(MICROS) — probe the batch-read schema
    (pure footer metadata, no scan) and declare the matching stream
    schema, same branching as the batch loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = (
        spark.read.option("pathGlobFilter", glob)
        .parquet(sf_dir)
        .schema["ts"]
        .dataType
    )
    nanos = isinstance(probed, T.LongType)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType() if nanos else probed),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(probed, T.TimestampNTZType):
        # Watermarks demand TIMESTAMP (LTZ); with the session timezone
        # pinned UTC the NTZ→LTZ cast is a pure type relabel, so batch
        # and stream event-time arithmetic stay identical.
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def read_documents_stream(
    spark: SparkSession, sf_dir: str, glob: str = "documents.parquet"
) -> DataFrame:
    return (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )


def streaming_wordcount(docs_stream: DataFrame) -> DataFrame:
    """Incremental wordcount in update mode — state is the per-word
    running count (Spark's state store holds the KV table Mimir keeps
    in its paged containers)."""
    return (
        docs_stream.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
    )


def streaming_event_windows(events_stream: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed counts with a 2-hour watermark: late
    rows beyond the watermark are dropped and state is evicted —
    bounded memory at any throughput."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sessionize(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows via the built-in session_window (gap-based,
    watermarked) — the streaming twin of operators.relational.sessionize."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(docs_stream: DataFrame) -> DataFrame:
    """Streaming exact dedup: first occurrence of each text hash wins.
    dropDuplicates keys the state store on the 64-bit hash (never the
    full text); at 100 TB you'd add a watermark column and use
    dropDuplicatesWithinWatermark to bound state."""
    return docs_stream.withColumn("h", F.xxhash64("text")).dropDuplicates(["h"])


def streaming_click_purchase_join(events_stream: DataFrame) -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    clicks in the preceding 30 minutes. Both sides are watermarked so
    the join state evicts; the range condition bounds which click rows
    each purchase can still match (Spark uses it to compute state
    expiry). The streaming twin of operators.advanced.interval_join."""
    clicks = (
        events_stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("ts_c"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("ts_c", "1 hour")
    )
    purchases = (
        events_stream.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("ts_c") < F.col("ts"))
        & (F.col("ts_c") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("event_id", "user_id", "ts", "ts_c", "click_value")


def streaming_event_windows_sliding(events_stream: DataFrame) -> DataFrame:
    """Sliding 1-hour/30-minute windowed counts with a 2-hour
    watermark — the streaming twin of the batch
    `event_windows_sliding`: identical window() spec, so complete
    windows emitted in append mode match the batch rows exactly.
    State is windows/slide × key cardinality, evicted by watermark."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_pixel_features(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of multimodal_pixel_features: the decoded-pixel
    feature kernel is a pure per-row function of the payload, so the
    twin IS the shared batch transform applied to the stream — map-only
    mapInPandas, stateless, append mode, no watermark needed. Rows
    emitted per micro-batch are bit-identical to the batch operator's
    rows for the same documents."""
    from mimir_spark.operators.multimodal import pixel_features_transform

    return pixel_features_transform(docs_stream)


def streaming_resize_pixels(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of multimodal_resize_pixels — same trivial
    map-only case as streaming_pixel_features (pure function of the
    payload, shared transform, stateless append)."""
    from mimir_spark.operators.multimodal import resize_pixels_transform

    return resize_pixels_transform(docs_stream)


def compact_stream_store(
    spark: SparkSession,
    store_dir: str,
    key: str = "doc_id",
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Generic long-run maintenance for the batch_id=N state stores
    every incremental job here writes (MinHash/ICWS signatures,
    BM25/bigram-LM partials, suffix tables): latest-batch-wins per
    `key`, rewritten into ~target-size files under a SINGLE
    batch_id=<max seen − 1> subdirectory, so the resumed stream's
    next micro-batches append beside it unchanged. Safety order: the
    compacted copy is fully written to a sibling tmp dir BEFORE the
    old store is removed.

    The base id is max_b − 1, NOT max_b: foreachBatch processes
    batches sequentially and commits batch b before starting b+1, so
    the existence of a batch_id=max_b dir proves every batch < max_b
    is committed — the ONE batch a restarted stream can legitimately
    replay is max_b itself. Its retry does mode('overwrite') on
    batch_id=max_b, which after compaction re-creates that partition
    with the identical deterministic rows BESIDE the base; had the
    base been named max_b, the retry would have replaced the entire
    compacted store (every key's state) with that single batch's
    rows. Latest-wins stays exact: a key updated in batch max_b
    carries the same value in the base (resolved) and in the
    retried partition, every other key resolves to the base. When
    the store holds a single batch dir the base keeps that id — the
    resolved rows ARE that batch's rows, so an overwrite-retry
    rewrites identical content. Returns the output file count."""
    df = spark.read.parquet(store_dir)  # batch_id partition discovered
    latest = df.groupBy(key).agg(F.max("batch_id").alias("batch_id"))
    rows = df.join(latest, [key, "batch_id"]).drop("batch_id")
    min_b, max_b = df.agg(F.min("batch_id"), F.max("batch_id")).collect()[0]
    base_b = max_b if min_b == max_b else max_b - 1

    jvm = spark._jvm  # public Hadoop FS API, same pattern as compact_files
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = hpath.getFileSystem(hconf)
    size, it = 0, fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            size += status.getLen()
    n_files = max(1, -(-size // target_bytes))

    tmp = store_dir.rstrip("/") + "__compact_tmp"
    rows.repartition(n_files).write.mode("overwrite").parquet(tmp)
    fs.delete(hpath, True)
    fs.mkdirs(hpath)
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(f"{store_dir}/batch_id={base_b}"),
    )
    return n_files


def streaming_phrase_search(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    phrase: tuple[str, ...] = ("hash", "join"),
    glob: str = "*.parquet",
):
    """Incremental exact-phrase search over a documents file stream —
    the streaming twin of retrieval.phrase_search. A phrase match is a
    fact about ONE document, so the stream needs no state at all: each
    micro-batch maps its own docs through the positional-postings
    chain and appends its matches (idempotent per-batch overwrite,
    same batch_id=N layout as the other jobs). Run to completion over
    a partitioned corpus this reproduces the batch operator's output
    exactly (pytest-pinned)."""
    from pyspark.sql import functions as F

    from mimir_spark.functions.text import tokens_col

    docs_stream = read_documents_stream(spark, input_dir, glob=glob)

    def _process(batch, batch_id: int) -> None:
        if batch.isEmpty():
            return
        post = batch.select(
            "doc_id", F.posexplode(tokens_col("text")).alias("pos", "w")
        ).filter(F.col("w").isin(*set(phrase)))
        matches = None
        for i, term in enumerate(phrase):
            part = post.filter(F.col("w") == term).select(
                "doc_id", (F.col("pos") - i).alias("start")
            )
            matches = part if matches is None else matches.join(
                part, ["doc_id", "start"]
            )
        out = matches.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_matches")
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
