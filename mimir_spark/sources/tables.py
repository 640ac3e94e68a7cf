"""Typed loaders for the test-corpus star schema.

Schemas are declared, not inferred: at 100 TB a schema-inference pass
is a full extra scan, and silent type drift (e.g. a timestamp read as
string) breaks partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Declared schemas for every table the engine reads. Parquet carries its
# own types, so these serve as contracts: load_table asserts the file
# matches (names + types, nullability ignored), which catches drift
# before a 6-hour job does.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES = tuple(SCHEMAS)

# Dimension tables small enough to broadcast at any realistic SF.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})

# Size gate for maybe_broadcast: Catalyst's metadata size estimate of
# the build side must stay under this many bytes for the hint to be
# attached. 128 MB estimated is comfortably inside executor budgets
# (broadcast relations inflate ~2-4x over the parquet-footer estimate)
# while letting every dim at test SFs through; at 100 TB, customer /
# part / supplier / orders-derived sides blow past it and fall back to
# shuffle joins (or AQE's runtime broadcast decision if they turn out
# small post-filter).
BROADCAST_MAX_EST_BYTES = 128 * 1024 * 1024


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Size-gated broadcast hint (the BFS tracked-set precedent,
    graph.py:_maybe_broadcast, generalized to non-iterative plans).

    Unconditional `F.broadcast(dim)` hints are a 100 TB scale-killer:
    the hint overrides `autoBroadcastJoinThreshold`, so a "dim" that
    grows with SF (customer, part, supplier) gets force-broadcast into
    driver/executor OOM. This helper reads Catalyst's OPTIMIZED-plan
    size statistic — derived from parquet footers + column pruning,
    pure driver-side metadata, NO job — and attaches the hint only
    while the estimate fits. Fixed-cardinality dims (region=5,
    nation=25) always pass; scale-growing sides pass at test SFs and
    gate off on a real cluster, where AQE still upgrades them to a
    runtime broadcast if post-filter stats allow.

    Single-row aggregates (empty grouping) estimate as one row and
    always broadcast; grouped aggregates inherit their child's
    estimate — conservatively large, which is the safe direction.
    """
    from pyspark.sql import functions as F

    if max_bytes is None:  # resolved at call time so tests can patch it
        max_bytes = BROADCAST_MAX_EST_BYTES
    est = int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    return F.broadcast(df) if est <= max_bytes else df


def _canon_type(dt: T.DataType) -> str:
    # TIMESTAMP vs TIMESTAMP_NTZ: the corpus files carry NTZ and the
    # session timezone is pinned UTC, so the two are semantically
    # interchangeable here — don't fail the contract on that axis.
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    return dt.simpleString()


def _assert_schema(name: str, df: DataFrame) -> DataFrame:
    """Assert the file's schema matches the declared contract (names +
    types in order; nullability ignored — parquet writers disagree on
    it and it doesn't affect semantics; TIMESTAMP/TIMESTAMP_NTZ are
    interchangeable under the pinned-UTC session). Schema comparison is
    pure metadata: no extra scan, catches drift before a 6-hour job
    does."""
    got = [(f.name, _canon_type(f.dataType)) for f in df.schema.fields]
    want = [(f.name, _canon_type(f.dataType)) for f in SCHEMAS[name].fields]
    if got != want:
        raise ValueError(
            f"schema drift in table {name!r}: file has {got}, contract is {want}"
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Column pruning + predicate pushdown are
    Catalyst's job — callers just select/filter and the scan narrows."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    if name == "events":
        # events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader rejects — read as raw int64 nanos
        # and truncate to TimestampType's microseconds, the same
        # truncation DuckDB applies mapping TIMESTAMP_NS → TIMESTAMP)
        # and as plain TIMESTAMP(MICROS) in later corpus generations.
        # Branch on the type the reader actually yields.
        #
        # NOTE: nanosAsLong is a session-level SQL conf (there is no
        # per-read option for it) — get_spark() sets it at session
        # construction, but the driver's correctness gate hands us a
        # VANILLA SparkSession, so it must also be set here. Side
        # effect: any other TIMESTAMP(NANOS) parquet read in the same
        # session also comes back as long — acceptable because events
        # is the only nanos table in this corpus, and documented here.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(raw.schema["ts"].dataType, T.LongType):
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _assert_schema(name, raw)
    return _assert_schema(name, spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register corpus tables as temp views for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
