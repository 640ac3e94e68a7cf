"""Generic readers/writers.

Mimir's text reader splits files by byte ranges across ranks and fixes
up record boundaries; Spark's text source does the same per input
split, so `read_text_tokens` is the whole parity story for
`map_text_file`-style entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_text_tokens(
    spark: SparkSession, path: str, delimiter: str = r"\s+"
) -> DataFrame:
    """Read raw text file(s) → one row per token (Mimir map_text_file
    parity). Splitting + exploding stays JVM-side (codegen'd)."""
    lines = spark.read.text(path)
    return (
        lines.select(F.explode(F.split(F.col("value"), delimiter)).alias("token"))
        .filter(F.col("token") != "")
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV with an explicit schema — inference is an extra full scan."""
    return spark.read.csv(path, schema=schema, header=True)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Partitioned parquet writer (Mimir per-rank output files parity).
    Partition columns should be low-cardinality; high-cardinality
    partitioning creates a small-files problem at scale."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (hash-partitioned into n_buckets files
    per write task, registered in the catalog). Two tables bucketed on
    the same key with the same bucket count join WITHOUT a shuffle —
    the pre-partitioning replaces the exchange. This is the 100 TB
    answer for a fact-fact join that recurs across queries (e.g.
    orders ⋈ lineitem on orderkey): pay one shuffle at write time,
    never again at read time.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols).sortBy(*bucket_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def drop_bucketed_table(spark: SparkSession, table_name: str) -> None:
    """Drop a managed bucketed table AND its warehouse directory. The
    catalog is session-scoped while the warehouse directory persists,
    so a table written by a dead session leaves an ORPHAN location
    that makes the next saveAsTable fail with LOCATION_ALREADY_EXISTS
    — DROP TABLE alone can't see it. Uses the public Hadoop FS API
    (works on local / HDFS / object stores).

    Location resolution: if the table is live in the catalog, its REAL
    location is read from DESCRIBE EXTENDED before the drop (covers
    external paths and non-default warehouses). The orphan-dir fallback
    mirrors saveAsTable's layout rules: identifiers are lowercased on
    disk, and a qualified `db.tbl` lives under `<wh>/<db>.db/<tbl>`."""
    location = None
    try:
        rows = spark.sql(f"DESCRIBE EXTENDED {table_name}").collect()
        for r in rows:
            if r[0] == "Location":
                location = r[1].removeprefix("file:")
                break
    except Exception:
        pass  # not in this session's catalog — orphan-dir case
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    if location is None:
        parts = [s.strip("`").lower() for s in table_name.split(".")]
        if len(parts) == 2 and parts[0] != "default":
            location = f"{wh}/{parts[0]}.db/{parts[1]}"
        else:
            location = f"{wh}/{parts[-1]}"
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(location)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Compact a small-files parquet dataset into ~target-size files.

    The small-files problem is the classic slow death of a long-lived
    100 TB table: thousands of KB-sized files from incremental writes
    turn every scan into open/seek overhead and blow up the driver's
    split planning. This rewrites the dataset into
    ceil(total_bytes / target_bytes) files via a round-robin
    repartition (even sizes, no key skew). Size is the on-disk
    (compressed) byte total from a recursive Hadoop FileSystem listing
    — a stable public API (vs. Catalyst's internal stats chain), no
    data scan, works on any supported filesystem (local / HDFS /
    object store). Input and output are both compressed parquet, so
    on-disk size is the right basis for sizing output files; expect
    files near target_bytes modulo re-encoding drift, not the (much
    larger) decompressed in-memory size. Returns the output file
    count."""
    df = spark.read.parquet(in_path)
    jvm = spark._jvm  # py4j gateway to the PUBLIC Hadoop FS API
    hpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size, it = 0, fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            size += status.getLen()
    n_files = max(1, -(-size // target_bytes))  # ceil
    df.repartition(n_files).write.mode(mode).parquet(out_path)
    return n_files


def read_table_from_catalog(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a catalog table (e.g. one written by write_bucketed);
    bucket metadata rides along and lets the planner elide exchanges."""
    return spark.table(table_name)


def write_packed_shards(
    packed: DataFrame,
    out_path: str,
    seqs_per_shard: int = 1000,
    mode: str = "overwrite",
) -> DataFrame:
    """Export `sequence_pack` output as training shards: each doc goes
    to shard `seq_id div seqs_per_shard` of its language, written as
    lang/shard-partitioned parquet — the layout a training loader
    reads sequentially (one shard = a contiguous token-stream slice of
    seqs_per_shard · SEQ_LEN tokens, so shard files are uniformly
    sized by construction, no compaction pass needed).

    Docs that straddle a shard boundary are written to the shard their
    FIRST token lands in (the loader reads one shard ahead, the
    standard contract). The write repartitions on (lang, shard) so
    each shard is one file written by one task — at 100 TB every task
    writes ~seqs_per_shard·SEQ_LEN tokens regardless of corpus size.

    Returns the shard manifest (lang, shard, n_docs, n_tokens,
    first_seq, last_seq) computed from the same plan — the index a
    loader uses to schedule epochs without listing files."""
    sharded = packed.withColumn(
        "shard", F.expr(f"seq_id div {seqs_per_shard}")
    )
    (
        sharded.repartition("lang", "shard")
        .sortWithinPartitions("doc_id")
        .write.mode(mode)
        .partitionBy("lang", "shard")
        .parquet(out_path)
    )
    return (
        sharded.groupBy("lang", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("seq_id").alias("first_seq"),
            F.max("seq_id").alias("last_seq"),
        )
        .orderBy("lang", "shard")
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC reader — the second columnar format large estates carry
    (Hive-era tables). Same pushdown/pruning story as parquet: filters
    and column selection reach the ORC scan."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC writer, partition-aware like write_partitioned_parquet."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def upsert_partitions(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Incremental partition upsert: overwrite ONLY the partitions
    present in `updates`, leave every other partition untouched — the
    idempotent daily-ingest pattern for a long-lived partitioned
    corpus (re-running a day's batch replaces that day, never
    truncates the table). Implemented with Spark's dynamic partition
    overwrite (`partitionOverwriteMode=dynamic`), scoped to this write
    via the DataFrameWriter option so the session default is not
    mutated. At 100 TB this is the difference between rewriting a
    table and rewriting a day."""
    (
        updates.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
