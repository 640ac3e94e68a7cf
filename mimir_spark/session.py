"""SparkSession factory tuned for both local correctness runs and the
multi-executor cluster case.

Local mode is a single JVM; the settings that matter there are driver
memory and shuffle-partition count. The AQE settings are what carry the
same plans to a 1000-executor cluster: runtime partition coalescing,
skew-join splitting, and dynamic broadcast selection.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mimir_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions track core count locally; on a real cluster AQE
    coalescing makes the static number mostly irrelevant.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.default.parallelism", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS); the vectorized reader
        # rejects it unless it's surfaced as a raw long (load_table then
        # truncates to micros). Set here so sessions built through this
        # factory never flip SQL confs mid-flight; load_table also sets
        # it defensively for vanilla sessions (the driver's gate).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # MinHash aggregates 128 columns; default maxFields=100 would
        # silently drop those plans out of whole-stage codegen.
        .config("spark.sql.codegen.maxFields", "256")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # 16g, not 8g: local[32] runs 32 concurrent tasks in ONE JVM, so
        # the unified memory pool is split 32 ways; at 8g the storage
        # fraction (~2.3g) could not hold one query's cached tables plus
        # the previous queries' not-yet-collected checkpoint blocks, and
        # pagerank's dst-partitioned contribution cache was observed
        # evicted mid-bench (93 stages / 43 MB shuffled vs 78 / 9.7 MB
        # warm). Parameterised: production sets executor memory per
        # deployment; this is only the local-mode default.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # The ContextCleaner only reclaims dead checkpoint/broadcast/
        # shuffle blocks after a driver GC notices the references died;
        # the default periodicGC.interval (30min) is longer than a whole
        # bench run, so blocks from finished queries piled up and evicted
        # live caches. 90s bounds the pile-up at negligible GC cost.
        .config("spark.cleaner.periodicGC.interval", "90s")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
