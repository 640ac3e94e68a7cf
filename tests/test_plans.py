"""Plan-shape assertions — the properties that matter at 100 TB.

Correctness at sf0.01 doesn't prove the plan scales; these tests pin
the physical-plan features that do: predicate pushdown to parquet,
column pruning, broadcast of dim tables, no cartesian products, and
partial (map-side) aggregation.
"""

from __future__ import annotations

from mimir_spark.operators import core, relational, relational3
from mimir_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_only_roundrobin_exchanges,
    assert_pushed_filters,
    formatted_plan,
)


def test_q6_filters_pushed(spark, sf_correct):
    df = relational.q6_forecast_revenue(spark, sf_correct)
    assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")


def test_q1_column_pruning(spark, sf_correct):
    df = relational.q1_pricing_summary(spark, sf_correct)
    plan = formatted_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    # only the 7 needed columns, not all 11
    assert "l_orderkey" not in read_schema[0]
    assert "l_partkey" not in read_schema[0]


def test_q5_broadcasts_dims(spark, sf_correct):
    df = relational.q5_nation_revenue(spark, sf_correct)
    assert_broadcast_join(df, at_least=3)
    assert_no_cartesian(df)


def test_q3_no_cartesian_and_broadcast(spark, sf_correct):
    df = relational.q3_shipping_priority(spark, sf_correct)
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)


def test_wordcount_partial_aggregation(spark, sf_correct):
    """Mimir's map-side combiner == Spark partial HashAggregate before
    the exchange; assert the plan has two aggregate stages."""
    df = core.wordcount(spark, sf_correct)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_wordcount_codegen(spark, sf_correct):
    """Tokenize/explode/count must stay inside whole-stage codegen —
    no Python evaluation nodes. With AQE the codegen spans appear only
    in the executed plan, so materialize first."""
    df = core.wordcount(spark, sf_correct)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen spans; partial_count is
    # the map-side combine before the exchange.
    assert "*(1)" in executed and "*(2)" in executed, executed
    assert "partial_count" in executed, executed
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan and "EvalPython" not in plan


def test_q8_all_dims_broadcast_no_smj(spark, sf_correct):
    """Seven-table join: every dim side must broadcast; the only
    shuffles left are the fact join and the final aggregate."""
    df = relational3.q8_market_share(spark, sf_correct)
    assert_broadcast_join(df, at_least=6)
    assert_no_cartesian(df)
    assert "SortMergeJoin" not in formatted_plan(df)


def test_q7_filters_pushed_and_broadcast(spark, sf_correct):
    df = relational3.q7_volume_shipping(spark, sf_correct)
    assert_pushed_filters(df, "l_shipdate")
    assert_broadcast_join(df, at_least=4)
    assert_no_cartesian(df)


def test_q17_no_cartesian(spark, sf_correct):
    """Correlated-subquery rewrite must stay a keyed join, never a
    cartesian."""
    df = relational3.q17_small_qty_revenue(spark, sf_correct)
    assert_no_cartesian(df)


def test_documents_scan_prunes_columns(spark, sf_correct):
    df = core.wordcount(spark, sf_correct)
    plan = formatted_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "lang" not in read_schema[0], plan


def test_octree_adaptive_no_cartesian_broadcast_anti(spark, sf_correct):
    from mimir_spark.operators import octree

    df = octree.octree_adaptive(spark, sf_correct)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_corpus_clean_single_scan_count(spark, sf_correct):
    """The fused clean pipeline must not scan documents more than
    twice (dedup window + token counts) — no per-stage rescans."""
    from mimir_spark.operators import pipeline

    df = pipeline.corpus_clean_pipeline(spark, sf_correct)
    plan = formatted_plan(df)
    # formatted output repeats the plan under AQE; count DISTINCT scans
    scans = {l.strip() for l in plan.splitlines() if "ReadSchema" in l}
    assert len(scans) <= 2, plan


def _join_key_lines(plan: str) -> list[str]:
    """Lines of a formatted plan that carry join keys/conditions."""
    return [
        l
        for l in plan.splitlines()
        if "keys" in l or "condition" in l.lower() or "Join" in l
    ]


def test_dedup_lsh_pair_source_no_shingle_selfjoin(spark, sf_smoke):
    """The 'lsh' pair source (the 100 TB path for dedup_clusters /
    dedup_survivors) must not contain the quadratic shingle self-join:
    no join keyed on the shingle column, and the MinHash partial-min
    stage (MapInPandas) must be present."""
    from mimir_spark.operators import dedup

    lsh = dedup.near_dup_pairs(spark, sf_smoke, pair_source="lsh")
    plan = formatted_plan(lsh)
    assert not any("sh#" in l for l in _join_key_lines(plan)), plan
    # The signature kernel (MapInPandas) sits BEHIND the eager
    # localCheckpoint that shares the doc table between candidate
    # generation and verify, so it no longer appears in the pair
    # plan; assert it on the pre-checkpoint stage instead.
    from mimir_spark.sources.tables import load_table

    tbl_plan = formatted_plan(
        dedup._minhash_doc_table(load_table(spark, sf_smoke, "documents"))
    )
    assert "MapInPandas" in tbl_plan, tbl_plan
    # sanity: the detector does fire on the exact path's shingle join
    exact = dedup.near_dup_pairs(spark, sf_smoke, pair_source="exact")
    eplan = formatted_plan(exact)
    assert any("sh#" in l for l in _join_key_lines(eplan)), eplan


def test_dedup_embedding_no_cartesian(spark, sf_smoke):
    """The cell-blocked embedding dedup must be all equi-joins — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere (round 1's
    inequality-only self-join was exactly that)."""
    from mimir_spark.operators import dedup

    df = dedup.dedup_embedding(spark, sf_smoke)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bfs_drops_broadcast_hint_above_threshold(spark, sf_smoke, monkeypatch):
    """With the broadcast-row threshold forced to 0, BFS must still
    produce the identical result through shuffle joins — the graceful
    degradation the 100×-scale case relies on."""
    from mimir_spark.operators import graph

    base = {(r.node, r.level) for r in graph.bfs_levels(spark, sf_smoke).collect()}
    monkeypatch.setattr(graph, "BROADCAST_MAX_ROWS", 0)
    nohint = {(r.node, r.level) for r in graph.bfs_levels(spark, sf_smoke).collect()}
    assert base == nohint


def test_sample_stratified_pushdown(spark, sf_correct):
    """The hash-sample filter is pure arithmetic on scanned columns —
    column pruning must reach the scan (only doc_id + lang read)."""
    from mimir_spark.operators import pipeline

    df = pipeline.sample_stratified(spark, sf_correct)
    plan = formatted_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" not in read_schema[0], plan


def test_pagerank_rounds_have_no_exchange(spark, sf_smoke):
    """The contribution table is pre-partitioned on dst once (cached —
    the cache is what keeps the partitioning visible to the planner),
    so a PageRank round (broadcast rank join → groupBy(dst)) must plan
    with ZERO shuffle exchanges — the per-iteration cost at cluster
    scale is the broadcast build, never an edge re-shuffle. The final
    round is deliberately un-checkpointed so its plan is inspectable
    here; the one-time repartition lives INSIDE the InMemoryRelation
    subtree, so only the plan text before it is the round itself."""
    from mimir_spark.operators import graph

    df = graph.pagerank(spark, sf_smoke, iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    round_plan = plan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in round_plan, plan
    assert "Exchange hashpartitioning" not in round_plan, plan
    assert "BroadcastHashJoin" in round_plan, plan


def test_pagerank_bucketed_rounds_read_without_exchange(spark, sf_smoke):
    """The ON-DISK twin of the cached-contribution pin above: with the
    contribution table written through write_bucketed(dst), the
    bucketed FileScan itself carries the dst hash-partitioning, so a
    round (broadcast rank join → groupBy(dst)) plans with ZERO shuffle
    exchanges straight off disk — the cross-job / bigger-than-memory
    version of the same per-round cost model."""
    from mimir_spark.operators import graph

    df = graph.pagerank_bucketed(
        spark, sf_smoke, iters=1, table_name="pr_bucket_plan_test"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pagerank_bucketed_matches_cached(spark, sf_smoke):
    """Same rounds helper, same 9dp grid — the on-disk and cached
    paths must emit identical ranks."""
    from mimir_spark.operators import graph

    a = {
        (r.node, r.rank)
        for r in graph.pagerank(spark, sf_smoke, iters=3).collect()
    }
    b = {
        (r.node, r.rank)
        for r in graph.pagerank_bucketed(
            spark, sf_smoke, iters=3, table_name="pr_bucket_eq_test"
        ).collect()
    }
    assert a == b


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_correct):
    """The 100 TB fact⋈fact contract: when the build side carries a
    selective filter and the join is a shuffle join (no broadcast —
    the situation at scale), Spark's runtime row-level filter must
    inject a bloom `might_contain` prune on the probe side's scan —
    the mechanism that replaces hand-built semi-join prefilters, and
    the reason the operators here don't build any."""
    from pyspark.sql import functions as F

    from mimir_spark.sources.tables import load_table

    bc_key = "spark.sql.autoBroadcastJoinThreshold"
    scan_key = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    old_bc, old_scan = spark.conf.get(bc_key), spark.conf.get(scan_key)
    try:
        spark.conf.set(bc_key, "-1")  # force the at-scale shuffle join
        spark.conf.set(scan_key, "0")  # sf0.01 scans are tiny; always apply
        orders = load_table(spark, sf_correct, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_correct, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        spark.conf.set(bc_key, old_bc)
        spark.conf.set(scan_key, old_scan)


def test_heavy_hitters_sketch_broadcast_no_cartesian(spark, sf_correct):
    """The CMS query side must join the D*W-cell sketch as a broadcast
    (it is fixed-size whatever the corpus) and nothing may cartesian."""
    from mimir_spark.operators.sketches import heavy_hitters_cms

    df = heavy_hitters_cms(spark, sf_correct)
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)


def test_unigram_logppl_no_cartesian(spark, sf_correct):
    from mimir_spark.operators.quality import unigram_logppl

    df = unigram_logppl(spark, sf_correct)
    plan = formatted_plan(df)
    # the 1-row totals join is the only nested-loop; it must be the
    # broadcast 1-row scalar pattern, not a real cartesian
    assert "CartesianProduct" not in plan
    assert_broadcast_join(df, at_least=1)


def test_dup_span_fraction_no_selfjoin_blowup(spark, sf_correct):
    """dup_span_fraction joins positions to per-shingle doc counts —
    an equi join; there must be no doc-doc self-join anywhere (its
    whole point is being linear where the pair table is quadratic)."""
    from mimir_spark.operators.dedup import dup_span_fraction

    df = dup_span_fraction(spark, sf_correct)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every join in the plan keys on the shingle, never doc-to-doc
    key_lines = [l for l in _join_key_lines(plan) if "keys" in l]
    assert key_lines
    for line in key_lines:
        assert "sh#" in line, line


def test_hll_register_shuffle_is_bounded(spark, sf_correct):
    """The HLL register build must partial-aggregate before its
    exchange: the shuffle key is (event_type, j), never raw user
    rows — i.e. the plan shows partial_ hash aggregation below the
    exchange and no exchange keyed on user_id."""
    from mimir_spark.functions.time import epoch_seconds  # noqa: F401
    from mimir_spark.operators.sketches import hll_registers
    from mimir_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_correct, "events")
    reg = hll_registers(ev, ["event_type"], F.col("user_id"))
    plan = formatted_plan(reg)
    assert "partial_max" in plan or "partial_" in plan
    assert "hashpartitioning(user_id" not in plan


def test_q2_single_exchange_for_agg_and_window(spark, sf_correct):
    """q2's per-part argmin window must reuse the (l_partkey) hash
    partitioning of the cost aggregate — one exchange on l_partkey in
    the whole fact path, and every dim joined by broadcast."""
    from mimir_spark.operators.relational4 import q2_min_cost_supplier

    df = q2_min_cost_supplier(spark, sf_correct)
    plan = formatted_plan(df)
    assert plan.count("hashpartitioning(l_partkey") <= 1, plan
    assert_broadcast_join(df, at_least=3)
    assert_no_cartesian(df)


def test_q20_window_reuses_agg_partitioning(spark, sf_correct):
    from mimir_spark.operators.relational4 import q20_dominant_suppliers

    df = q20_dominant_suppliers(spark, sf_correct)
    plan = formatted_plan(df)
    assert plan.count("hashpartitioning(l_partkey") <= 1, plan
    assert_no_cartesian(df)


def test_q11_scalar_total_is_broadcast(spark, sf_correct):
    """The Q11 global-total comparison must be the 1-row broadcast
    pattern (BroadcastNestedLoopJoin over a single-row aggregate),
    never a real cartesian or a driver collect."""
    from mimir_spark.operators.relational4 import q11_important_parts

    df = q11_important_parts(spark, sf_correct)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" in plan or "BroadcastExchange" in plan


def test_ddsketch_bucket_table_is_bounded(spark, sf_correct):
    """The DDSketch build must partial-aggregate into log buckets
    before its exchange (no row-level shuffle), and the finalizer's
    rank match must be the broadcast pattern."""
    from mimir_spark.operators.sketches import ddsketch_quantiles

    df = ddsketch_quantiles(spark, sf_correct)
    plan = formatted_plan(df)
    assert "partial_count" in plan or "partial_" in plan
    assert "CartesianProduct" not in plan


def test_dup_span_islands_no_selfjoin(spark, sf_correct):
    from mimir_spark.operators.dedup import dup_span_islands

    df = dup_span_islands(spark, sf_correct)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the only join is occurrence ⋈ per-shingle stats (equi on the hash)
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_prefix_join_no_cartesian(spark, sf_correct):
    """The prefix-filtered Jaccard join must stay equi-join shaped
    everywhere: prefix self-join on the shingle hash, set lookups on
    doc_id — an inequality-only join would plan as a nested loop."""
    from mimir_spark.operators.dedup2 import dedup_jaccard_prefix

    df = dedup_jaccard_prefix(spark, sf_correct)
    assert_no_cartesian(df)


def test_sample_reservoir_window_group_limit(spark, sf_correct):
    """The per-stratum top-k rank filter must be pushed into the sort
    as a WindowGroupLimit (per-partition k-heaps before the exchange) —
    the property that keeps the shuffle k-bounded instead of
    stratum-sized."""
    from mimir_spark.operators.pipeline import sample_reservoir

    df = sample_reservoir(spark, sf_correct)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_semdedup_single_cell_shuffle(spark, sf_correct):
    """SemDeDup's kernel input must reach the per-cell applyInPandas
    through cell-keyed exchanges only — never a pair-level join or a
    cartesian (the point of cluster blocking)."""
    from mimir_spark.operators.dedup2 import semdedup

    df = semdedup(spark, sf_correct)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan, plan


def test_bm25_top_k_is_take_ordered(spark, sf_correct):
    """The retrieval top-k must plan as distributed TakeOrdered
    (per-partition k-heaps + k-sized driver merge), never a global
    sort of every scored document."""
    from mimir_spark.operators.retrieval import bm25_topk

    df = bm25_topk(spark, sf_correct)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_correctness_does_not_depend_on_aqe(spark, sf_correct):
    """Representative ops re-run in a sibling session with AQE (and
    its skew/coalesce re-planning) OFF must produce identical rows —
    pins that no operator accidentally relies on adaptive re-planning
    for correctness (a cluster may run with different AQE settings)."""
    from mimir_spark.operators import dedup2, relational
    from mimir_spark.operators.features import window_funnel

    plain = spark.newSession()
    plain.conf.set("spark.sql.adaptive.enabled", "false")
    for fn in (
        relational.q5_nation_revenue,
        dedup2.dedup_jaccard_prefix,
        window_funnel,
    ):
        base = {tuple(r) for r in fn(spark, sf_correct).collect()}
        off = {tuple(r) for r in fn(plain, sf_correct).collect()}
        assert base == off, fn.__name__


def test_correctness_does_not_depend_on_partition_count(spark, sf_correct):
    """Same ops in a sibling session with a prime, tiny shuffle
    partition count must produce identical rows — pins that no
    operator's output depends on how data happens to be partitioned
    (deterministic hashing, no partition-local assumptions)."""
    from mimir_spark.operators import dedup2, relational
    from mimir_spark.operators.pipeline import sample_reservoir

    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    for fn in (
        relational.q1_pricing_summary,
        dedup2.dedup_jaccard_prefix,
        sample_reservoir,
    ):
        base = {tuple(r) for r in fn(spark, sf_correct).collect()}
        alt = {tuple(r) for r in fn(odd, sf_correct).collect()}
        assert base == alt, fn.__name__


def test_bm25_batch_broadcasts_query_list(spark, sf_correct):
    """The batched BM25 plan must broadcast the query-term list and
    the per-term df table (both bounded metadata) — the only
    corpus-keyed exchange is the per-doc tf groupBy — and the final
    per-query top-k must be a qid-PARTITIONED window, never a global
    sort of all scored docs."""
    from mimir_spark.operators.retrieval import bm25_topk_batch

    import re

    df = bm25_topk_batch(spark, sf_correct)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan
    # per-query rank runs as a PARTIAL WindowGroupLimit (per-partition
    # k-heaps) before one qid-keyed exchange — the batched analogue of
    # TakeOrdered — and the window partition spec is query_id
    assert "WindowGroupLimit" in plan, plan
    assert re.search(
        r"WindowGroupLimit\nInput[^\n]*\nArguments: \[query_id", plan
    ), plan


def test_phrase_search_single_exchange_chain(spark, sf_correct):
    """phrase_search filters postings to the phrase's term set BEFORE
    the join, and every per-term join is keyed on the same
    (doc_id, start) pair: after the first exchange the chain reuses
    the partitioning — the plan must not contain one exchange per
    phrase term."""
    from mimir_spark.operators.retrieval import phrase_search

    import re

    df = phrase_search(spark, sf_correct)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the term-set filter sits below the joins, and the whole chain
    # plans with at most 3 exchange NODES (join sides + final agg)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3, plan
    assert "IN (" in plan or "isin" in plan, plan


def test_phrase_batch_plan_size_independent_of_batch(spark, sf_correct):
    """phrase_search_batch is DATA-driven in the batch: the phrases
    ride a broadcast table, so the physical plan has exactly ONE
    postings join and the same node count whether the batch holds 3
    phrases or 30 — the O(phrases × len) per-phrase join-chain union
    would blow up Catalyst at the 1000-query batches the op targets."""
    from mimir_spark.operators.retrieval import (
        PHRASE_BATCH,
        phrase_search_batch,
    )

    import re

    big = tuple(
        (100 + i, (t1, t2))
        for i, (t1, t2) in enumerate(
            (a, b)
            for a in ("hash", "merge", "sort", "scan", "big")
            for b in ("join", "table", "index", "group", "filter", "limit")
        )
    )
    small_plan = formatted_plan(phrase_search_batch(spark, sf_correct))
    big_plan = formatted_plan(
        phrase_search_batch(spark, sf_correct, phrases=PHRASE_BATCH + big)
    )
    for plan in (small_plan, big_plan):
        # exactly one join node, and it is the broadcast postings join
        joins = re.findall(r"\(\d+\) (\S*Join)", plan)
        assert joins == ["BroadcastHashJoin"], plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
    n_nodes = lambda p: len(re.findall(r"\(\d+\) ", p))
    assert n_nodes(big_plan) == n_nodes(small_plan), (
        n_nodes(small_plan),
        n_nodes(big_plan),
    )


def test_minhash_doc_table_is_shuffle_free(spark, sf_correct):
    """The sketch family's only corpus-sized stage: one repartition
    (the deliberate _spread) feeding the Arrow kernel — no groupBy /
    aggregate exchange anywhere in the signature build."""
    from mimir_spark.operators.dedup import _minhash_doc_table
    from mimir_spark.sources.tables import load_table

    import re

    df = _minhash_doc_table(load_table(spark, sf_correct, "documents"))
    plan = formatted_plan(df)
    assert "HashAggregate" not in plan, plan
    # exactly one exchange NODE: the deliberate _spread repartition
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_weighted_arrays_is_shuffle_free(spark, sf_correct):
    """Same property for the weighted family's corpus stage."""
    from mimir_spark.operators.weighted import _weighted_arrays
    from mimir_spark.sources.tables import load_table

    import re

    df = _weighted_arrays(load_table(spark, sf_correct, "documents"))
    plan = formatted_plan(df)
    assert "HashAggregate" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_no_unbounded_global_window_in_headline_plans(spark, sf_smoke):
    """Backstop for bench.py's WindowExec logger silencing: that
    silencing is COSMETIC only while no headline query runs a global
    (unpartitioned) window over unbounded input. Sweep every headline
    plan: an unpartitioned Window node is allowed only when its input
    subtree is limit-bounded (GlobalLimit / TakeOrderedAndProject /
    CollectLimit — the post-limit pools and sketch finalizers), and
    the set of queries that have one at all is pinned, so a future
    operator that accidentally windows the whole corpus on one
    partition fails HERE instead of warning into a silenced log."""
    import json

    import __spark_entry__ as entrymod
    from bench import HEADLINE

    BOUNDED = {
        "GlobalLimitExec",
        "LocalLimitExec",
        "TakeOrderedAndProjectExec",
        "CollectLimitExec",
    }
    ALLOWED_GLOBAL_WINDOW = {"rank_quantiles"}

    def tree(nodes):
        it = iter(nodes)

        def build():
            n = next(it)
            kids = [build() for _ in range(n.get("num-children", 0))]
            return (n, kids)

        return build()

    def classes(root):
        n, kids = root
        yield n["class"].rsplit(".", 1)[-1]
        for k in kids:
            yield from classes(k)

    def global_windows(root):
        n, kids = root
        cls = n["class"].rsplit(".", 1)[-1]
        if cls in ("WindowExec", "WindowInPandasExec") and not n.get(
            "partitionSpec"
        ):
            yield (n, kids)
        for k in kids:
            yield from global_windows(k)

    queries = entrymod.queries()
    offenders = []
    for name in HEADLINE:
        df = queries[name](spark, sf_smoke)
        nodes = json.loads(df._jdf.queryExecution().sparkPlan().toJSON())
        for wn, wkids in global_windows(tree(nodes)):
            subtree = set()
            for k in wkids:
                subtree |= set(classes(k))
            if not (subtree & BOUNDED):
                offenders.append((name, "unbounded global window"))
            elif name not in ALLOWED_GLOBAL_WINDOW:
                offenders.append((name, "new global window — pin it"))
    assert not offenders, offenders


def test_round10_operators_prune_their_scans(spark, sf_smoke):
    """Column pruning reaches the parquet scan for the round-10
    operators: none of them may drag unused wide columns (text/props)
    through its scan."""
    from mimir_spark.operators.features import (
        ema_user_value,
        event_transitions,
    )
    from mimir_spark.operators.quality import dsir_weights
    from mimir_spark.operators.relational import hypertable_gap_fill

    for df, banned in [
        (event_transitions(spark, sf_smoke), ("props", "value")),
        (hypertable_gap_fill(spark, sf_smoke), ("props", "user_id")),
        (ema_user_value(spark, sf_smoke), ("props", "event_type")),
        (dsir_weights(spark, sf_smoke), ("source", "lang")),
    ]:
        plan = formatted_plan(df)
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schema, plan
        for col in banned:
            assert all(col not in l for l in read_schema), (col, read_schema)


def test_hybrid_rrf_pools_are_take_ordered(spark, sf_smoke):
    """Both RRF first stages must plan as distributed TakeOrdered
    (per-partition k-heaps), never a global sort of the corpus."""
    from mimir_spark.operators.retrieval import hybrid_rrf

    plan = formatted_plan(hybrid_rrf(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort [cos" not in plan.split("TakeOrderedAndProject")[0], plan


def test_gopher_repetition_filter_is_map_only(spark, sf_smoke):
    """Every repetition statistic is doc-local, so the plan must be a
    single Arrow map pass over the scan — ZERO exchanges (the
    explode-and-groupBy alternative shuffles ~9x the corpus tokens)."""
    from mimir_spark.operators.quality import gopher_repetition_filter

    plan = formatted_plan(gopher_repetition_filter(spark, sf_smoke))
    # No data-dependent shuffle: the only Exchange allowed is the
    # scale-adaptive spread's RoundRobin repartition (a no-op on
    # cluster-scale inputs — see mimir_spark.functions.spread).
    assert_only_roundrobin_exchanges(plan)
    assert "ReadSchema" in plan and "text" in plan


def test_maybe_broadcast_gates_on_size_estimate(spark, sf_smoke):
    """maybe_broadcast must attach the hint only while Catalyst's
    metadata size estimate fits the budget: under a forced 1-byte
    budget the hint disappears (the analyzed plan carries no
    ResolvedHint and the query still returns identical rows through
    shuffle joins), under the real budget the dims are hinted — the
    BFS graceful-degradation contract generalized to the relational
    suite."""
    from mimir_spark.sources.tables import load_table, maybe_broadcast

    nation = load_table(spark, sf_smoke, "nation")
    cust = load_table(spark, sf_smoke, "customer")

    hinted = cust.join(maybe_broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()

    gated = cust.join(
        maybe_broadcast(nation, max_bytes=1),
        cust.c_nationkey == nation.n_nationkey,
    )
    assert "ResolvedHint" not in gated._jdf.queryExecution().analyzed().toString()
    assert sorted(map(tuple, hinted.collect())) == sorted(map(tuple, gated.collect()))


def test_relational_broadcasts_gate_off_above_threshold(spark, sf_smoke, monkeypatch):
    """With the size budget forced to 0, q5's five-way join must carry
    ZERO forced broadcast hints yet return the identical result — the
    100 TB fallback path (shuffle joins + AQE runtime broadcasts)."""
    from mimir_spark.operators import relational
    from mimir_spark.sources import tables

    base = relational.q5_nation_revenue(spark, sf_smoke)
    assert "ResolvedHint" in base._jdf.queryExecution().analyzed().toString()
    base_rows = sorted(map(tuple, base.collect()))

    monkeypatch.setattr(tables, "BROADCAST_MAX_EST_BYTES", 0)
    gated = relational.q5_nation_revenue(spark, sf_smoke)
    assert "ResolvedHint" not in gated._jdf.queryExecution().analyzed().toString()
    assert sorted(map(tuple, gated.collect())) == base_rows


def test_mlm_and_readability_are_map_only(spark, sf_correct):
    """Both round-12 text planners are doc-local array expressions:
    ZERO exchanges — a shuffle here would mean an accidental
    explode/groupBy rewrite of the per-doc fold."""
    from mimir_spark.operators.packing import mlm_span_corruption_plan
    from mimir_spark.operators.textstats2 import readability_scores

    for df in (
        mlm_span_corruption_plan(spark, sf_correct),
        readability_scores(spark, sf_correct),
    ):
        plan = formatted_plan(df)
        assert "Exchange" not in plan, plan


def test_mixture_sample_broadcasts_plan(spark, sf_correct):
    """The mixture keep-test must join the |sources|-row plan as a
    broadcast (never shuffle the corpus on source), and the whole op
    may carry at most the two aggregation exchanges (plan build +
    final per-source report)."""
    from mimir_spark.operators.packing import mixture_sample_docs

    plan = formatted_plan(mixture_sample_docs(spark, sf_correct))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_frequent_pairs_semi_filter_is_broadcast(spark, sf_correct):
    """The A-Priori downward-closure filter must be a broadcast
    LeftSemi against the bounded frequent-1 table, and the pair join
    must stay a within-basket equi-join (no cartesian fallback)."""
    from mimir_spark.operators.itemsets import frequent_pairs

    plan = formatted_plan(frequent_pairs(spark, sf_correct))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rake_single_doc_window_chain(spark, sf_correct):
    """RAKE's phrase builder must run the island window and phrase
    aggregate on the SAME doc_id-keyed partitioning (no extra
    exchange between them), and never sort the corpus globally: the
    only Sort outside the final 25-row TakeOrdered is the window's
    per-partition (doc_id, pos) sort."""
    from mimir_spark.operators.textstats2 import rake_keywords

    plan = formatted_plan(rake_keywords(spark, sf_correct))
    assert "CartesianProduct" not in plan, plan
    # island window partitions by doc_id; the phrase groupBy keys on
    # (doc_id, island) — hashpartitioning(doc_id) satisfies both, so
    # exactly ONE exchange may carry the doc-keyed stages
    assert plan.count("hashpartitioning(doc_id") <= 2, plan
