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


# -- partition-less window sweep (VERDICT r11 item 1) -----------------

#: physical operators that prove the window's input is a bounded
#: top-k / limit, not a full base table
_LIMIT_OPS = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit",
              "LocalLimit", "WindowGroupLimit")


def _content_start(line: str) -> int:
    """Column where the node text starts (past the tree-drawing
    ``:  +-`` prefix); -1 for blank/non-node lines."""
    for i, ch in enumerate(line):
        if ch not in " :+-":
            return i
    return -1


def _bracket_groups(text: str) -> list[str]:
    """TOP-LEVEL ``[...]`` group contents of a node line.  A physical
    ``Window`` node prints ``Window [exprs], [partitionSpec],
    [orderSpec]`` but DROPS an empty trailing spec — so 2 groups means
    either no order spec (fine: still partitioned) or no partition
    spec (the all-rows-to-one-task shape); the two are told apart by
    ASC/DESC markers, which only order specs carry."""
    depth = 0
    groups: list[str] = []
    cur: list[str] = []
    for ch in text:
        if ch == "[":
            if depth == 0:
                cur = []
            else:
                cur.append(ch)
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append("".join(cur))
            else:
                cur.append(ch)
        elif depth > 0:
            cur.append(ch)
    return groups


def partitionless_full_windows(plan: str) -> list[str]:
    """Lines of ``Window`` nodes that (a) have NO partition spec and
    (b) have no limit operator anywhere below them — i.e. windows
    that sort a full input in a single task.  Bounded-by-construction
    sites (windows over an aggregate table whose cardinality is fixed
    by the algorithm, e.g. a 64-bin histogram) can't be proven from
    the plan text and are whitelisted by the caller."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        c = _content_start(line)
        if c < 0:
            continue
        body = line[c:]
        # strip whole-stage-codegen tags like "*(3) "
        if body.startswith("*("):
            body = body.split(") ", 1)[-1]
        if not (body.startswith("Window ") or body.startswith("Window[")):
            continue
        groups = _bracket_groups(body)
        if len(groups) >= 3:
            continue  # partitioned (part AND order specs present)
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # second group is a partition spec (no order)
        bounded = False
        for j in range(i + 1, len(lines)):
            cj = _content_start(lines[j])
            if cj < 0 or cj <= c:
                break  # subtree ended
            if any(op in lines[j] for op in _LIMIT_OPS):
                bounded = True
                break
        if not bounded:
            bad.append(line.strip())
    return bad
