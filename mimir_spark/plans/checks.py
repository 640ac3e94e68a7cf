"""Physical-plan assertions — the 100 TB insurance policy.

Correct results on 60k rows say nothing about a 1000-executor run; the
plan shape does. These helpers let tests pin the properties that
matter at scale: filters reaching the parquet scan, dims broadcast,
no accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters list of the
    formatted plan (i.e. the predicate reached the parquet reader)."""
    plan = formatted_plan(df)
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; got:\n{pushed or plan}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} BroadcastHashJoin, found {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_only_roundrobin_exchanges(plan: str) -> None:
    """Assert the plan has no DATA-DEPENDENT shuffle: the only Exchange
    allowed is a round-robin repartition (the scale-adaptive spread in
    mimir_spark.functions.spread, a no-op on cluster-scale inputs).
    Works on both `explain("formatted")` output (partitioning on an
    Arguments: line) and executedPlan().toString() (inline). Every
    shuffle exchange carries exactly one of hash/range/single/
    round-robin partitioning, so banning the first three — plus
    BroadcastExchange — leaves round-robin as the only legal Exchange."""
    low = plan.lower()
    for banned in ("hashpartitioning", "rangepartitioning",
                   "singlepartition", "broadcastexchange"):
        assert banned not in low, f"real shuffle ({banned}) in plan:\n{plan}"
