"""Level-synchronous BFS — one of Mimir's three benchmark workloads.

Graph: the bipartite order–part graph from lineitem (orders sharing a
part are 2 hops apart). Node encoding: order o → 2*o, part p → 2*p+1.

BFS is inherently iterative, so the *driver* loops over levels — but
each level is a pure DataFrame join (frontier ⋈ edges, anti-join
visited), i.e. fully distributed; the driver only checks emptiness.

Scale design: the graph is bipartite, so frontiers strictly alternate
sides — even levels are orders, odd levels are parts. We exploit that:
one cached (order, part) edge table serves both directions, each level
joins against the frontier, and the visited anti-join only has to
consider the matching side's visited set. On a cluster the same plan
holds: the edge table is scanned from cache per level and AQE picks
the shuffle for the per-level `distinct`.

Broadcast policy: frontier/visited sets are broadcast ONLY while their
known row count (free — each level is localCheckpointed and counted
for the emptiness test anyway) stays under BROADCAST_MAX_ROWS. At BFS
saturation on a 100×-scale graph those sets are NOT broadcast-sized;
an unconditional hint would OOM executors, so past the threshold the
hint is dropped and the join degrades gracefully to a shuffle join
(AQE still free to pick better at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table, maybe_broadcast

MAX_LEVELS = 8
# ~4M ids × 8 B ≈ 32 MB serialized — comfortably under executor
# broadcast budgets; beyond this a shuffle join is the safer plan.
BROADCAST_MAX_ROWS = 4_000_000


def _maybe_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    return df.hint("broadcast") if n_rows <= BROADCAST_MAX_ROWS else df


def bfs_levels(
    spark: SparkSession, sf_dir: str, max_levels: int = MAX_LEVELS
) -> DataFrame:
    """node → min hop distance from source (source = order with the
    smallest orderkey), levels 0..max_levels.

    Output encoding (matches the oracle's recursive CTE): order o is
    node 2*o, part p is node 2*p+1.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # One (order, part) edge table, cached once; both traversal
    # directions reuse it via broadcast-hash joins against the
    # frontier. No distinct here — deduping 600k pairs costs a full
    # shuffle, and each level's own `distinct` over the (much smaller)
    # frontier expansion already collapses duplicate edges.
    edges = li.select("l_orderkey", "l_partkey").cache()
    src = li.agg(F.min("l_orderkey")).collect()[0][0]

    lvl0 = spark.createDataFrame(
        [(int(src), 0)], "id bigint, level int"
    ).localCheckpoint(eager=True)
    order_levels = [lvl0]  # DataFrames of (id, level) for order nodes
    part_levels: list[DataFrame] = []  # same for part nodes
    visited_orders = lvl0.select("id")
    visited_parts: DataFrame | None = None
    frontier = lvl0.select("id")  # current frontier (ids on one side)
    # Exact set sizes, maintained incrementally from the per-level
    # counts (no extra jobs) — they gate the broadcast hints.
    frontier_n = 1
    visited_orders_n = 1
    visited_parts_n = 0

    for lvl in range(1, max_levels + 1):
        orders_side = lvl % 2 == 0  # even level ⇒ frontier is orders
        if not orders_side:
            # order frontier → neighbouring parts
            nxt = (
                edges.join(
                    _maybe_broadcast(frontier, frontier_n),
                    edges.l_orderkey == frontier.id,
                )
                .select(F.col("l_partkey").alias("id"))
                .distinct()
            )
            if visited_parts is not None:
                nxt = nxt.join(
                    _maybe_broadcast(visited_parts, visited_parts_n),
                    "id",
                    "left_anti",
                )
        else:
            # part frontier → neighbouring orders
            nxt = (
                edges.join(
                    _maybe_broadcast(frontier, frontier_n),
                    edges.l_partkey == frontier.id,
                )
                .select(F.col("l_orderkey").alias("id"))
                .distinct()
                .join(
                    _maybe_broadcast(visited_orders, visited_orders_n),
                    "id",
                    "left_anti",
                )
            )
        # localCheckpoint truncates the growing lineage so level N's
        # plan doesn't replay levels 0..N-1. LAZY checkpoint: the
        # count() right after materializes it, so emptiness test,
        # broadcast gate and checkpoint share ONE job per level
        # (eager + count would run two).
        nxt = nxt.withColumn("level", F.lit(lvl)).localCheckpoint(eager=False)
        frontier_n = nxt.count()
        if frontier_n == 0:
            break
        if orders_side:
            order_levels.append(nxt)
            visited_orders = visited_orders.union(nxt.select("id"))
            visited_orders_n += frontier_n
        else:
            part_levels.append(nxt)
            vp = nxt.select("id")
            visited_parts = vp if visited_parts is None else visited_parts.union(vp)
            visited_parts_n += frontier_n
        frontier = nxt.select("id")

    def _u(dfs: list[DataFrame]) -> DataFrame | None:
        out = None
        for df in dfs:
            out = df if out is None else out.union(df)
        return out

    orders_df = _u(order_levels).select(
        (F.col("id") * 2).alias("node"), "level"
    )
    parts_df = _u(part_levels)
    result = orders_df
    if parts_df is not None:
        result = result.union(
            parts_df.select((F.col("id") * 2 + 1).alias("node"), "level")
        )
    edges.unpersist()
    return result


N_PAGERANK_ITERS = 10
DAMPING = 0.85


def pagerank(
    spark: SparkSession,
    sf_dir: str,
    iters: int = N_PAGERANK_ITERS,
    damping: float = DAMPING,
) -> DataFrame:
    """PageRank over the undirected order–part bipartite graph (same
    node encoding as bfs_levels) — the other canonical iterative
    MapReduce benchmark alongside BFS.

    Power iteration, fixed ``iters`` rounds:
      rank' = (1−d)/N + d · Σ_in rank(src)/deg(src)

    Scale shape: the (src, dst, deg) contribution table is built ONCE
    (degree aggregate joined back to edges), HASH-PARTITIONED ON dst
    and CACHED — cached, not checkpointed, deliberately: an
    InMemoryTableScan reports the cached plan's outputPartitioning,
    while a (local)checkpointed RDD scan reports UnknownPartitioning
    and would force the partition-aware plan below to re-shuffle.
    Each round joins the RANK table into it — rank rows number one
    per node, orders of magnitude fewer than edges, so while they fit
    the broadcast budget (gated on the known node count, same
    BROADCAST_MAX_ROWS policy as BFS) the edge table is NEVER
    re-shuffled — and because a broadcast join preserves the streamed
    side's partitioning, the groupBy(dst) contribution sum needs NO
    exchange either: after the one up-front repartition, a round is a
    single map-stage — zero per-iteration shuffles (plan-tested).
    Past the broadcast gate the rank join degrades to a shuffle join
    whose edge side reuses the dst partitioning. Intermediate ranks
    are lazily localCheckpointed per round so Catalyst plans each
    round against a flat leaf instead of a 10-deep nested plan; the
    FINAL round is left un-checkpointed so callers (and the plan
    test) see the real per-round physical plan. Every node of the
    undirected graph has out-degree ≥ 1, so there is no dangling-mass
    correction term. The contribution cache stays alive for the
    returned DataFrame's lifetime (rounds materialize lazily at the
    caller's action, so there is no safe in-operator unpersist hook);
    it is edge-table-sized and LRU-evicted under memory pressure.

    Ranks are rounded to 9 dp after EVERY round: the in-sum is a
    partial-aggregated double sum whose last ulps depend on
    aggregation order, and unpinned they would drift between engines
    (and partitionings) — the per-round grid absorbs ~1e-18 per-sum
    error against a 1e-9 step, which is what lets the fixed-round
    power iteration carry a value-hashed DuckDB oracle (unrolled CTE
    chain, same technique as k_core / label_propagation) instead of
    the weaker rows-only gate. Output: (node, rank) rounded to 6 dp;
    also pinned against a NumPy reference in tests.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = base.union(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    contrib_edges = edges.join(deg, "src").repartition("dst").cache()
    # Materialize the cache BEFORE any round is planned: an
    # un-materialized cached plan is still AdaptiveSparkPlan
    # (isFinalPlan=false) with unknown output partitioning, and every
    # round would conservatively re-insert the dst exchange.
    contrib_edges.count()
    nodes = deg.select(F.col("src").alias("node")).localCheckpoint(eager=True)
    n_nodes = nodes.count()

    return _pagerank_rounds(contrib_edges, nodes, n_nodes, iters, damping)


def _pagerank_rounds(
    contrib_edges: DataFrame,
    nodes: DataFrame,
    n_nodes: int,
    iters: int,
    damping: float,
) -> DataFrame:
    """The shared power-iteration loop over a dst-partitioned
    (cached or bucketed) contribution table — see pagerank's docstring
    for the zero-exchange-per-round argument."""
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    teleport = (1.0 - damping) / n_nodes
    for i in range(iters):
        r = _maybe_broadcast(ranks, n_nodes)
        out = (
            contrib_edges.join(r, contrib_edges.src == r.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
            .select(
                F.col("dst").alias("node"),
                F.round(
                    F.lit(teleport) + F.lit(damping) * F.col("in_sum"), 9
                ).alias("rank"),
            )
        )
        ranks = out if i == iters - 1 else out.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def pagerank_bucketed(
    spark: SparkSession,
    sf_dir: str,
    iters: int = N_PAGERANK_ITERS,
    damping: float = DAMPING,
    table_name: str = "pagerank_contrib_bucketed",
    n_buckets: int = 32,
) -> DataFrame:
    """pagerank's ON-DISK twin — the shape that runs when the
    contribution table outlives one job or one cluster's memory: the
    (src, dst, deg) table is written ONCE through write_bucketed
    (bucketBy dst), and every round's edge side is the bucketed SCAN —
    the FileScan itself reports the dst hash-partitioning, so a round
    plans with zero edge-side exchanges straight off disk (pinned in
    test_plans.py::test_pagerank_bucketed_rounds_read_without_exchange),
    with no cache residency requirement at all. Pay the partitioning
    shuffle at write time, never again across jobs — the docstring
    promise 'bucket edges by src at scale for co-located rounds' made
    concrete. Output is identical to pagerank (same rounds helper,
    same 9dp grid; equality pytest-pinned)."""
    from mimir_spark.sources.io import drop_bucketed_table, write_bucketed

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = base.union(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # a prior session's orphan location would fail the managed write
    drop_bucketed_table(spark, table_name)
    write_bucketed(
        edges.join(deg, "src"), table_name, ["dst"], n_buckets
    )
    contrib_edges = spark.table(table_name)
    nodes = deg.select(F.col("src").alias("node")).localCheckpoint(eager=True)
    n_nodes = nodes.count()
    return _pagerank_rounds(contrib_edges, nodes, n_nodes, iters, damping)


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part co-occurrence graph (parts sharing
    an order are adjacent) — the third classic iterative-free MapReduce
    graph benchmark next to BFS/PageRank.

    Edge generation: the per-order part list self-joins within the
    order only (orders hold a handful of parts, so the fan-out per
    order is a small constant — never a global self-join).

    Counting uses DEGREE ORIENTATION (each undirected edge directed
    from its lower-(degree, id) endpoint), which bounds every node's
    out-degree by O(sqrt(E)) — the standard skew-proof scheme. The
    count itself is ADJACENCY-LIST INTERSECTION: per oriented edge
    (u,v), triangles through it are |N+(u) ∩ N+(v)|. Work is the same
    Σdeg^(3/2) optimum as the wedge-join formulation, but the wedge
    table (41M rows at sf0.1) is never materialized or shuffled — the
    out-lists ride one shuffle of total size |E| and the intersection
    runs inside the join row (measured ~20% faster end-to-end, and
    one fewer job since n_edges falls out of the same aggregate).
    """
    # The edge set is referenced by degree counting, orientation and
    # the final intersection join — without a lineage cut the
    # lineitem self-join + distinct re-enters the plan once per
    # reference (15 scan copies in the explained plan; AQE exchange
    # reuse only dedups the branches whose subtrees stay canonically
    # identical). One lazy checkpoint computes it once.
    edges = _part_cooccurrence_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    # deg is NODE-sized (bounded by |part|) — orders of magnitude
    # smaller than the edge set it annotates, so the size-gated
    # broadcast turns both degree joins from edge-set shuffles into
    # map-side hash joins (falls back to shuffle joins at a scale
    # where the node table outgrows the gate).
    du = maybe_broadcast(
        deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    )
    dv = maybe_broadcast(
        deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    )
    # orient: src = endpoint with smaller (deg, id)
    with_deg = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    # oriented feeds the adjacency build AND both sides of the
    # intersection join — same multiple-reference argument as edges.
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    au = adj.select(F.col("src").alias("u2"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("v2"), F.col("nbrs").alias("nv"))
    # src always joins (it has at least this out-edge); a sink dst has
    # no out-list and contributes 0 — left join + 0 keeps the row so
    # n_edges falls out of the same aggregate.
    return (
        oriented.join(au, oriented.src == F.col("u2"))
        .join(av, oriented.dst == F.col("v2"), "left")
        .select(
            F.when(
                F.col("nv").isNull(), F.lit(0)
            ).otherwise(F.size(F.array_intersect("nu", "nv"))).alias("c")
        )
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum("c").cast("long").alias("n_triangles"),
        )
    )


def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-occurrence graph (same edge
    set as `triangle_count`): degree → number of nodes, plus each
    degree's share of nodes — the first profile anyone pulls on a new
    graph, and the skew evidence that justifies the degree-oriented
    wedge scheme above.

    Plan: within-order self-join builds edges (bounded per-order
    fan-out), per-node degree agg, then the tiny degree histogram.
    Shuffles: edge distinct, node agg, histogram agg — all
    partial-aggregated; nothing is ever ordered globally."""
    edges = _part_cooccurrence_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    hist = deg.groupBy("deg").agg(F.count("*").cast("long").alias("n_nodes"))
    total = hist.agg(F.sum("n_nodes").alias("total_nodes"))
    return hist.crossJoin(F.broadcast(total)).select(
        "deg",
        "n_nodes",
        F.round(F.col("n_nodes") / F.col("total_nodes"), 6).alias("node_share"),
    )


def _part_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (u < v) edge set of the part co-occurrence graph —
    the shared edge generator behind triangle_count /
    degree_distribution / clustering_coefficient / k_core. Within-order
    self-join only (bounded per-order fan-out), then distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    po = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = po.alias("a"), po.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )


def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL clustering coefficient of the part co-occurrence
    graph: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — how close each
    node's neighbourhood is to a clique, the standard community /
    link-farm signal one step past raw triangle counts.

    Same degree-oriented adjacency-intersection core as
    `triangle_count`, but the per-edge intersection is EXPLODED so each
    triangle {u,v,w} credits all three corners (fan-out = 3·triangles,
    the output's natural size — never the wedge table). Per-node
    credits union three projections of that one intermediate, then a
    node-keyed aggregate; degrees come from the same |E|-sized shuffle
    as degree_distribution. Nodes with deg < 2 report lcc = 0."""
    edges = _part_cooccurrence_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("degree").alias("deg_v"))
    with_deg = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    au = adj.select(F.col("src").alias("u2"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("v2"), F.col("nbrs").alias("nv"))
    # one explode emits all three corners of each triangle — a union of
    # three projections would RE-RUN the whole adjacency join per
    # branch (no ReusedExchange across union branches here; measured
    # ~1.5× slower). array_repeat keeps the corner list inside codegen
    # (a per-element transform lambda runs interpreted).
    ws = F.array_intersect("nu", "nv")
    tri_corners = (
        oriented.join(au, oriented.src == F.col("u2"))
        .join(av, oriented.dst == F.col("v2"))
        .select(
            F.explode(
                F.concat(
                    F.array_repeat(F.col("src"), F.size(ws)),
                    F.array_repeat(F.col("dst"), F.size(ws)),
                    ws,
                )
            ).alias("n")
        )
    )
    credits = tri_corners.groupBy("n").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    return deg.join(credits, "n", "left").select(
        F.col("n").alias("node"),
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


K_CORE_K = 6
K_CORE_MAX_ITERS = 30


def k_core_edges(
    edges: DataFrame, k: int, max_iters: int = K_CORE_MAX_ITERS
) -> DataFrame:
    """k-core of an arbitrary undirected (u, v) edge set: the maximal
    subgraph where every node has degree ≥ k — the classic dense-region
    / spam-cluster extractor (peeling off low-degree fringe exposes the
    tightly-coupled boilerplate clusters near-dup pairs come from).

    Iterative peel, the BFS-shaped driver loop: each round computes
    degrees over the CURRENT edge set (one |E|-shuffle, map-side
    combined), drops nodes below k via two anti-joins of the (tiny,
    broadcastable) drop list against the edge table, and stops when no
    node dropped — the driver only ever sees a scalar count. Edge
    lineage is cut per round with lazy localCheckpoint materialized by
    that same count (one job per round). Rounds needed = peel depth,
    typically ≪ diameter.

    If max_iters rounds pass without reaching the fixed point the
    result would NOT be a k-core (nodes below k would remain), so this
    raises rather than silently returning a truncated peel.
    Output: (node, degree_in_core)."""
    e = edges.localCheckpoint(eager=True)

    def _deg(es: DataFrame) -> DataFrame:
        return (
            es.select(F.col("u").alias("n"))
            .union(es.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )

    converged = False
    for _ in range(max_iters):
        deg = _deg(e)
        drop = deg.filter(F.col("d") < k).select("n").localCheckpoint(eager=False)
        if drop.count() == 0:
            converged = True
            break
        e = (
            e.join(drop.withColumnRenamed("n", "u"), "u", "left_anti")
            .join(drop.withColumnRenamed("n", "v"), "v", "left_anti")
            .localCheckpoint(eager=False)
        )
        if e.count() == 0:
            converged = True
            break
    if not converged and _deg(e).filter(F.col("d") < k).count() > 0:
        raise RuntimeError(
            f"k_core did not converge within max_iters={max_iters} peel "
            f"rounds; result would not be a {k}-core — raise max_iters"
        )
    return _deg(e).select(
        F.col("n").alias("node"), F.col("d").cast("long").alias("degree_in_core")
    )


def k_core(
    spark: SparkSession,
    sf_dir: str,
    k: int = K_CORE_K,
    max_iters: int = K_CORE_MAX_ITERS,
) -> DataFrame:
    """k-core of the bipartite order–part graph (node encoding shared
    with `bfs_levels`: order o → 2*o, part p → 2*p+1). The bipartite
    graph gives the peel real work — dropping thin orders lowers part
    degrees, which drops parts, which thins more orders (a ~10-round
    cascade at sf0.01 with k=6) — unlike the near-regular part
    co-occurrence graph, where no node sits below small k and the peel
    is a no-op. Oracle: the peel unrolled as chained CTEs (rounds past
    the fixed point are no-ops, so a fixed unroll ≥ peel depth is
    exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") * 2).alias("u"),
        (F.col("l_partkey") * 2 + 1).alias("v"),
    ).distinct()
    return k_core_edges(edges, k, max_iters)


def connected_components_star(
    edges: DataFrame, max_iters: int = 30
) -> DataFrame:
    """Connected components by ALTERNATING STAR CONTRACTION (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond"):
    large-star hangs every higher-id neighbor of a node onto the
    node's minimum neighbor; small-star re-hangs the lower-id
    neighbors. The pair of rounds at least halves tree heights, so
    convergence is O(log n) ROUNDS on ANY graph — unlike min-label
    propagation, whose round count is the component DIAMETER (fine
    for tiny near-dup clusters, ruinous for a path-shaped graph at
    corpus scale).

    Input: undirected edges as (src, dst) in either orientation.
    Output: (node, component) with component = min node id reachable.
    Each round is two self-free groupBy/join passes over the current
    edge set; lineage is cut per round with localCheckpoint and the
    fixed point is detected by an edge-set count delta (a scalar to
    the driver, like BFS/k-means)."""
    e = (
        edges.selectExpr("src AS u", "dst AS v")
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # large-star: for each node n over BOTH orientations, attach
        # every strictly-larger neighbor to min(N(n) ∪ {n}).
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        ls = large.filter(F.col("a") != F.col("b")).select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        ).distinct()
        # small-star: attach node + its smaller neighbors to the min.
        nbrs2 = ls.union(
            ls.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        small_nbrs = nbrs2.filter(F.col("v") < F.col("u")).union(
            nbrs2.select("u", F.col("u").alias("v")).distinct()
        )
        mins2 = small_nbrs.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            small_nbrs.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        new_e = (
            small.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixed point: star rounds only ever lower the attach targets,
        # so an unchanged edge multiset means every tree is a flat star
        delta = new_e.exceptAll(e).limit(1).count()
        same_size = new_e.count() == e.count()
        e = new_e
        if delta == 0 and same_size:
            break
    nodes = edges.selectExpr("src AS node").union(
        edges.selectExpr("dst AS node")
    ).distinct()
    roots = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    return (
        nodes.join(roots, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


LPA_ITERS = 5


def _label_propagation(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """Synchronous label propagation over an undirected edge set
    (src/dst in either orientation): every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbours (ties → smallest label). Deterministic by construction
    (synchronous + total tie-break), unlike the async/randomized
    textbook variant.

    Each round is two aggregates — (node, label) vote counts, then a
    per-node argmax via max-struct (both map-side combined, keyed on
    node) — against a statically cached neighbour table; lineage cut
    per round with lazy localCheckpoint materialized by a count.
    Rounds are fixed (communities stabilize in a few rounds; a
    convergence test would add a whole-table compare per round)."""
    nbrs = (
        edges.selectExpr("src AS u", "dst AS v")
        .union(edges.selectExpr("dst AS u", "src AS v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        nbrs.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        votes = (
            nbrs.join(labels, nbrs.u == labels.node)
            .groupBy(F.col("v").alias("n2"), "label")
            .agg(F.count("*").alias("c"))
        )
        new_labels = (
            votes.groupBy("n2")
            .agg(
                F.max(F.struct(F.col("c"), (-F.col("label")).alias("neg"))).alias(
                    "b"
                )
            )
            .select(F.col("n2").alias("node"), (-F.col("b.neg")).alias("label"))
            .localCheckpoint(eager=False)
        )
        new_labels.count()
        labels = new_labels
    return labels.select("node", F.col("label").alias("community"))


def label_propagation(
    spark: SparkSession, sf_dir: str, iters: int = LPA_ITERS
) -> DataFrame:
    """Community detection on the part co-occurrence graph by
    synchronous label propagation — the cheap community pass (near-
    linear per round) that groups parts into co-purchase communities;
    on a dedup pair graph the same core splits a giant component into
    usable sub-communities where connected components alone is too
    coarse. Output: (node, community). Rows-only at the driver gate
    (iterative); pinned on a hand-built two-clique graph in tests."""
    edges = _part_cooccurrence_edges(spark, sf_dir).selectExpr(
        "u AS src", "v AS dst"
    )
    return _label_propagation(edges, iters)

SSSP_ROUNDS = 12


def sssp_weighted(
    spark: SparkSession, sf_dir: str, rounds: int = SSSP_ROUNDS
) -> DataFrame:
    """Single-source shortest paths over the WEIGHTED bipartite
    order-part graph (edge weight = min l_quantity per distinct
    (order, part) pair — whole numbers, so distances are exact
    integers and the key needs no rounding at all): `rounds`
    synchronous Bellman-Ford relaxations from the lowest-orderkey
    node, the weighted sibling of bfs_levels. Node encoding matches
    BFS/PageRank (order o → 2o, part p → 2p+1).

    Fixed-round contract (pagerank's move): the output is the exact
    `rounds`-step relaxation prefix — a pure function of the data on
    ANY engine (min over integer sums), which is what lets the oracle
    unroll the same rounds instead of settling for rows-only. Unlike
    hop-BFS, weighted SP can keep improving past the hop diameter
    (a longer-hop path may be lighter), so the prefix is the
    deliverable, pinned monotone in pytest; at a true fixpoint the
    driver loop below would stop on a changed-count of zero exactly
    like dedup_clusters.

    Scale shape: per round ONE join of the cached edge table against
    the distance table (both id-keyed) and one map-side-combined
    groupBy-min — the BFS/PageRank bounded-shuffle recipe; lineage
    truncates per round with localCheckpoint. At 100 TB you'd bucket
    the edge table by src once so every round's join is co-located —
    same plan, zero re-shuffle of the big side."""
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(F.min(F.col("l_quantity").cast("long")).alias("w"))
        .select(
            (F.col("l_orderkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
            "w",
        )
    )
    edges = base.unionByName(
        base.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    ).localCheckpoint(eager=True)
    src = li.agg(F.min("l_orderkey")).collect()[0][0] * 2

    dist = spark.createDataFrame(
        [(int(src), 0)], "node long, dist long"
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relax = edges.join(dist, edges.src == dist.node).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


# ---- k-truss (round 12) -----------------------------------------------------

KTRUSS_K = 4       # every surviving edge sits in >= k-2 triangles
KTRUSS_ROUNDS = 5  # fixed synchronous peel rounds (the pagerank contract)


def k_truss(
    spark: SparkSession,
    sf_dir: str,
    k: int = KTRUSS_K,
    n_rounds: int = KTRUSS_ROUNDS,
) -> DataFrame:
    """K-TRUSS decomposition (Cohen 2008) of the part co-occurrence
    graph — the edge-analogue of k_core: peel edges supported by fewer
    than k−2 triangles until (almost) none fall. Trusses are the
    standard dense-community certificate one notch stronger than
    cores (every k-truss edge's endpoints share ≥ k−2 common
    neighbors INSIDE the subgraph).

    FIXED-ROUND contract (the pagerank/sssp recipe): exactly
    `n_rounds` synchronous peels — a deterministic prefix of the
    fixpoint, hash-checkable by an unrolled oracle — with a FIXPOINT
    EARLY-EXIT (round 13): peeling only removes edges, so the moment a
    round drops nothing every later round is the identity and that
    round's already-computed support table IS the final recount; the
    output is provably identical to running the full prefix, at ~half
    the support recounts on this corpus (converges in ≤ 3 rounds,
    pytest pins the fixpoint round; was 6 recounts, worst case
    unchanged).

    Per round, support is counted with triangle_count's DEGREE-ORIENTED
    adjacency intersection (Σdeg^1.5 work, never the Σdeg² wedge
    table): each triangle is found exactly once at its oriented
    (src, dst) edge as a common out-neighbor w, then credited to all
    three edges — (src,dst) in bulk, (src,w)/(dst,w) via an explode of
    actual triangles (3·T rows, the output's natural size). Edges
    below k−2 drop. Driver state is nothing at all (the loop is a
    fixed-length plan chain with per-round localCheckpoint to cap
    lineage). On the UNIFORMLY dense test graph this measures a wash
    vs the naive wedge join (identical support counts — the wedge
    formulation survives as the oracle's); the orientation's value is
    the skew bound: a power-law hub of degree d contributes d² wedge
    rows but only O(E^0.5) oriented out-degree, which is what keeps a
    100×-scale real-world graph from detonating round one.

    Output: surviving (u, v, support) after the last round's support
    recount — support measured IN the surviving subgraph.
    """
    edges = _part_cooccurrence_edges(spark, sf_dir).localCheckpoint(
        eager=True
    )

    def support(e: DataFrame) -> DataFrame:
        und = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        du = deg.select(F.col("u").alias("u"), F.col("deg").alias("deg_u"))
        dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v"))
        with_deg = e.join(du, "u").join(dv, "v")
        u_first = (F.col("deg_u") < F.col("deg_v")) | (
            (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
        )
        oriented = with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
        tri = (
            oriented.join(
                adj.select(F.col("src").alias("src"), F.col("nbrs").alias("nu")),
                "src",
            )
            .join(
                adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nv")),
                "dst",
                "left",
            )
            .select(
                "src",
                "dst",
                F.coalesce(
                    F.array_intersect("nu", "nv"),
                    F.array().cast("array<long>"),
                ).alias("ws"),
            )
        )
        # credit: (src,dst) += |ws|; (src,w) += 1; (dst,w) += 1 — all
        # canonicalized back to u < v
        bulk = tri.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.size("ws").cast("long").alias("c"),
        ).filter(F.col("c") > 0)
        third = tri.select("src", "dst", F.explode("ws").alias("w"))
        ones = third.select(
            F.least("src", "w").alias("u"),
            F.greatest("src", "w").alias("v"),
            F.lit(1).cast("long").alias("c"),
        ).union(
            third.select(
                F.least("dst", "w").alias("u"),
                F.greatest("dst", "w").alias("v"),
                F.lit(1).cast("long").alias("c"),
            )
        )
        return (
            bulk.union(ones)
            .groupBy("u", "v")
            .agg(F.sum("c").cast("long").alias("support"))
        )

    cur, prev_n = edges, edges.count()
    for _ in range(n_rounds):
        sup = (
            support(cur)
            .filter(F.col("support") >= k - 2)
            .localCheckpoint(eager=True)
        )
        n = sup.count()
        if n == prev_n:
            # fixpoint: this round dropped no edge, so rounds
            # r+1..n_rounds and the final recount all reproduce
            # exactly this table — return it without recomputing.
            return sup
        cur = sup.select("u", "v").localCheckpoint(eager=True)
        prev_n = n
    return support(cur).filter(F.col("support") >= k - 2)
