from mimir_spark.plans.checks import (
    formatted_plan,
    assert_pushed_filters,
    assert_broadcast_join,
    assert_no_cartesian,
)

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_cartesian",
]
