"""Physical-plan audit helpers (SURVEY.md §4): the engine has no custom
optimizer — Catalyst plans everything — so this package's job is
*verifying* the plans Catalyst produces have the 100 TB posture the
operators were designed for (pushdown, pruning, broadcast, no cartesian
products)."""

from modeltracking_spark.plans.audit import (
    assert_no_cartesian,
    assert_pushed_filter,
    assert_pruned_schema,
    executed_plan,
    has_broadcast_join,
)

__all__ = [
    "executed_plan",
    "assert_pushed_filter",
    "assert_pruned_schema",
    "assert_no_cartesian",
    "has_broadcast_join",
]
