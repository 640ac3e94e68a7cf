"""Level-synchronous BFS — one of Mimir's three benchmark workloads.

Graph: the bipartite order–part graph from lineitem (orders sharing a
part are 2 hops apart). Node encoding: order o → 2*o, part p → 2*p+1.

BFS is inherently iterative, so the *driver* loops over levels — but
each level is a pure DataFrame join (frontier ⋈ edges, anti-join
visited), i.e. fully distributed; the driver only checks emptiness.
At scale the edge table should be pre-partitioned on src so every
level's join reuses the same shuffle-free co-partitioning — done here
via an explicit repartition + cache of edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

MAX_LEVELS = 8


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    fwd = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    return fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def bfs_levels(
    spark: SparkSession, sf_dir: str, max_levels: int = MAX_LEVELS
) -> DataFrame:
    """node → min hop distance from source (source = order with the
    smallest orderkey), levels 0..max_levels."""
    # Frontiers are broadcast into the edge scan, so edges need no
    # particular partitioning — just cache the undirected edge set once.
    edges = _edges(spark, sf_dir).cache()
    # Source lookup is a 1-row action on an aggregated plan — not a
    # driver-side data loop.
    src_node = 2 * load_table(spark, sf_dir, "lineitem").agg(
        F.min("l_orderkey")
    ).collect()[0][0]

    visited = spark.createDataFrame([(int(src_node), 0)], "node bigint, level int")
    levels = [visited]
    frontier = visited.select("node")
    for lvl in range(1, max_levels + 1):
        nxt = (
            edges.join(frontier.hint("broadcast"), edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node").hint("broadcast"), "node", "left_anti")
            .withColumn("level", F.lit(lvl))
        )
        # localCheckpoint truncates the growing lineage so level N's
        # plan doesn't replay levels 0..N-1; the visited set is only a
        # union of already-materialized level outputs, so it needs no
        # checkpoint of its own.
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = visited.union(nxt)
        frontier = nxt.select("node")
    edges.unpersist()
    result = levels[0]
    for df in levels[1:]:
        result = result.union(df)
    return result
