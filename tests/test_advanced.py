"""Semantics + plan tests for the advanced operator batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from mimir_spark.operators import advanced
from mimir_spark.plans.checks import formatted_plan
from mimir_spark.sources.tables import load_table


def test_tfidf_broadcasts_small_sides(spark, sf_correct):
    plan = formatted_plan(advanced.tfidf(spark, sf_correct))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_user_partitioned(spark, sf_correct):
    """The merged-stream as-of must partition its window by user_id —
    an empty partition spec would funnel 100 TB through one task."""
    df = advanced.asof_join(spark, sf_correct)
    plan = formatted_plan(df)
    assert "user_id" in plan
    # every purchase appears exactly once
    ev = load_table(spark, sf_correct, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert df.count() == n_purchases


def test_asof_value_correct_for_one_user(spark, sf_smoke):
    """Hand-check one user's attribution against a driver-side replay."""
    ev = load_table(spark, sf_smoke, "events").collect()
    out = {r.event_id: r.last_click_value for r in advanced.asof_join(spark, sf_smoke).collect()}
    by_user: dict = {}
    for r in sorted(ev, key=lambda r: (r.ts, 0 if r.event_type == "click" else 1)):
        if r.event_type == "click":
            cur = by_user.setdefault(r.user_id, {}).get("clicks", {})
            cur[r.ts] = max(cur.get(r.ts, float("-inf")), r.value)
            by_user[r.user_id]["clicks"] = cur
        elif r.event_type == "purchase":
            clicks = by_user.get(r.user_id, {}).get("clicks", {})
            eligible = [v for t, v in clicks.items() if t <= r.ts]
            expect = None
            if eligible:
                last_ts = max(t for t in clicks if t <= r.ts)
                expect = clicks[last_ts]
            assert out.get(r.event_id) == expect, (r.event_id, out.get(r.event_id), expect)


def test_salted_agg_equals_plain(spark, sf_smoke):
    plain = {
        (r.event_type, r.total_value, r.n_events)
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.round(F.sum("value"), 4).alias("total_value"), F.count("*").alias("n_events"))
        .collect()
    }
    salted = {
        (r.event_type, r.total_value, r.n_events)
        for r in advanced.salted_agg(spark, sf_smoke).collect()
    }
    assert plain == salted


def test_ngram_total(spark, sf_smoke):
    """Σ bigram counts == Σ max(len(toks)-1, 0) over docs."""
    docs = load_table(spark, sf_smoke, "documents")
    from mimir_spark.functions.text import tokens_col

    expect = docs.select(
        F.greatest(F.size(tokens_col("text")) - 1, F.lit(0)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    got = advanced.ngram_counts(spark, sf_smoke).agg(F.sum("cnt")).collect()[0][0]
    assert got == expect


def test_hll_estimate_accuracy(spark, sf_smoke):
    """The HLL estimate must land within the sketch's standard-error
    envelope of the exact count (1.04/sqrt(256) ≈ 6.5%; allow 3σ)."""
    from mimir_spark.operators.sketches import hll_distinct

    for r in hll_distinct(spark, sf_smoke).collect():
        assert abs(r.est_distinct - r.true_distinct) <= max(
            0.20 * r.true_distinct, 3.0
        ), r


def test_ddsketch_relative_error_guarantee(spark, sf_smoke):
    """DDSketch's contract: |est - true_quantile| <= alpha * true
    (alpha = 0.01, plus one-rank discreteness slack on a small
    sample)."""
    from mimir_spark.operators.sketches import ddsketch_quantiles
    from mimir_spark.sources.tables import load_table

    vals = sorted(
        r.value for r in load_table(spark, sf_smoke, "events").collect()
    )
    for r in ddsketch_quantiles(spark, sf_smoke).collect():
        true = vals[min(int(r.rank_n) - 1, len(vals) - 1)]
        assert abs(r.est - true) <= 0.011 * true + 1e-9, (r, true)


def test_rank_quantiles_rank_error(spark, sf_smoke):
    """Bottom-k sample sketch: each estimate's TRUE rank must sit
    within the DKW envelope of the target rank (eps = sqrt(ln(2/d) /
    (2k)) at 99% confidence ~ 2.4% for k=4096; on sf0.001 the sample
    covers the table, so the estimate is the exact discrete
    quantile)."""
    import bisect

    from mimir_spark.operators.sketches import RQ_K, rank_quantiles
    from mimir_spark.sources.tables import load_table

    vals = sorted(
        r.value for r in load_table(spark, sf_smoke, "events").collect()
    )
    n = len(vals)
    rows = rank_quantiles(spark, sf_smoke).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_sample == min(n, RQ_K)
        true_rank = bisect.bisect_right(vals, r.est + 1e-12)
        assert abs(true_rank / n - r.q) <= 0.03 + 1.0 / r.n_sample, (
            r, true_rank, n,
        )


def test_kll_quantiles_rank_error(spark, sf_smoke):
    """True KLL sketch: estimates within a generous rank envelope of
    the target (k=200 gives ~1-2% typical rank error; bound at 5%),
    and the sketch's total weight within 2% of the true row count
    (compaction conserves weight up to odd-buffer truncation)."""
    import bisect

    from mimir_spark.operators.sketches import kll_quantiles
    from mimir_spark.sources.tables import load_table

    vals = sorted(
        r.value for r in load_table(spark, sf_smoke, "events").collect()
    )
    n = len(vals)
    rows = kll_quantiles(spark, sf_smoke).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r.n_total - n) <= 0.02 * n + 2
        true_rank = bisect.bisect_right(vals, r.est + 1e-12)
        assert abs(true_rank / n - r.q) <= 0.05, (r, true_rank, n)


def test_tdigest_quantiles_rank_error(spark, sf_smoke):
    """t-digest envelope: exact total weight (merging conserves it,
    unlike KLL's odd-buffer truncation) and estimates within a 3% rank
    envelope — tighter than KLL's bound because delta=100 centroids
    over ~1k rows leave almost no interpolation error."""
    import bisect

    from mimir_spark.operators.sketches import tdigest_quantiles
    from mimir_spark.sources.tables import load_table

    vals = sorted(
        r.value for r in load_table(spark, sf_smoke, "events").collect()
    )
    n = len(vals)
    rows = tdigest_quantiles(spark, sf_smoke).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_total == n
        true_rank = bisect.bisect_right(vals, r.est + 1e-12)
        assert abs(true_rank / n - r.q) <= 0.03, (r, true_rank, n)
