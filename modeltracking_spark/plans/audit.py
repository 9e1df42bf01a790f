"""Inspect executed plans for scale posture.

Used by tests/test_scale_plans.py and ad-hoc from a REPL:

    from modeltracking_spark.plans import executed_plan
    print(executed_plan(df))   # or df.explain("formatted")

The checks are string-level on the executed SparkPlan — crude but
version-stable enough for the invariants that matter: a filter that
reaches the parquet reader shows up under ``PushedFilters``, a pruned
scan under ``ReadSchema``, a broadcast join as ``BroadcastHashJoin``,
and an accidental cross product as ``CartesianProduct``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed (physical) plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a filter fragment (e.g. ``GreaterThanOrEqual(l_quantity``)
    was pushed into the scan."""
    plan = executed_plan(df)
    assert "PushedFilters" in plan, f"no pushed filters in plan:\n{plan}"
    assert fragment in plan, f"filter {fragment!r} not pushed:\n{plan}"


def assert_pruned_schema(
    df: DataFrame, must_have: list[str], must_not_have: list[str]
) -> None:
    """Assert the scan's ReadSchema keeps/prunes the given columns."""
    plan = executed_plan(df)
    assert "ReadSchema:" in plan, f"no ReadSchema in plan:\n{plan}"
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    for c in must_have:
        assert c in rs, f"column {c} missing from ReadSchema: {rs}"
    for c in must_not_have:
        assert c not in rs, f"column {c} not pruned from ReadSchema: {rs}"


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert the plan contains no cartesian product."""
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)
