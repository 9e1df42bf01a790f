"""Declarative data-quality constraint suite — the Deequ-style audit
pass (Schelter et al., VLDB 2018: "Automating Large-Scale Data Quality
Verification") a 100 TB ingest runs before anything else touches the
data.

Constraints are declared as data; the runner compiles ALL of them into
ONE aggregation pass over the table (a single job, map-side
combinable: completeness, bounds, set membership, and pattern
conformity are plain conditional aggregates; uniqueness adds one
distinct-count) plus one optional broadcast anti-join per referential
constraint — never a per-constraint scan. Metrics come back e6-scaled
through exact integer arithmetic (counts) and mirrored doubles
(ratios), so the whole audit is value-hash oracled.

Supported constraint kinds:

- ``completeness(col)``          — non-null fraction
- ``uniqueness(col)``            — distinct/total fraction
- ``min_value(col, lo)`` / ``max_value(col, hi)`` — bound violations
- ``in_set(col, values)``        — membership violations
- ``matches(col, regex)``        — pattern violations (non-null rows)
- ``non_negative(col)``          — shorthand bound
- ``ref_integrity(col, dim_df, dim_col)`` — orphan keys (broadcast
  anti-join against the dimension; the fact side streams)

Output: (constraint, metric_e6, violations, passed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(kind: str, col: str, **kw) -> dict:
    """Constraint declaration helper."""
    return {"kind": kind, "col": col, **kw}


def _agg_exprs(c: dict, n: Column) -> tuple[str, Column, Column]:
    """-> (name, metric_e6 expr, violations expr) over one agg pass."""
    col = F.col(c["col"])
    kind = c["kind"]
    nn = F.sum(col.isNotNull().cast("long"))
    if kind == "completeness":
        viol = F.coalesce(F.sum(col.isNull().cast("long")), F.lit(0))
        metric = F.when(
            n > 0,
            F.floor(nn.cast("double") / n.cast("double")
                    * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )  # NULL metric on an empty table (ADVICE r9), violations 0
        return f"completeness({c['col']})", metric, viol
    if kind == "min_value":
        viol = F.sum((col < F.lit(c["lo"])).cast("long"))
    elif kind == "max_value":
        viol = F.sum((col > F.lit(c["hi"])).cast("long"))
    elif kind == "non_negative":
        viol = F.sum((col < F.lit(0)).cast("long"))
    elif kind == "in_set":
        viol = F.sum(
            (col.isNotNull() & ~col.isin(*c["values"])).cast("long")
        )
    elif kind == "matches":
        viol = F.sum(
            (col.isNotNull() & ~col.rlike(c["regex"])).cast("long")
        )
    else:
        raise ValueError(f"unknown constraint kind {kind!r}")
    viol = F.coalesce(viol, F.lit(0))
    metric = F.when(
        n > 0,
        F.floor(
            (n.cast("double") - viol.cast("double")) / n.cast("double")
            * F.lit(1e6) + F.lit(0.5)
        ).cast("long"),
    )
    label = {
        "min_value": f"min_value({c['col']}>={c.get('lo')})",
        "max_value": f"max_value({c['col']}<={c.get('hi')})",
        "non_negative": f"non_negative({c['col']})",
        "in_set": f"in_set({c['col']})",
        "matches": f"matches({c['col']})",
    }[kind]
    return label, metric, viol


def run_checks(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Compile the declared constraints into ONE aggregate job (plus a
    distinct-count term per uniqueness constraint and one broadcast
    anti-join per referential constraint) and return the audit table:
    (constraint, metric_e6, violations, passed)."""
    n = F.count(F.lit(1))
    names: list[str] = []
    cols: list[Column] = []
    uniq = [c for c in constraints if c["kind"] == "uniqueness"]
    refs = [c for c in constraints if c["kind"] == "ref_integrity"]
    plain = [c for c in constraints
             if c["kind"] not in ("uniqueness", "ref_integrity")]
    for c in plain:
        name, metric, viol = _agg_exprs(c, n)
        names.append(name)
        cols.append(metric.alias(f"m{len(names)}"))
        cols.append(viol.cast("long").alias(f"v{len(names)}"))
    for c in uniq:
        col = F.col(c["col"])
        d = F.count_distinct(col)
        viol = F.coalesce(
            (F.sum(col.isNotNull().cast("long")) - d).cast("long"),
            F.lit(0),
        )
        metric = F.when(
            n > 0,
            F.floor(d.cast("double") / n.cast("double")
                    * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
        names.append(f"uniqueness({c['col']})")
        cols.append(metric.alias(f"m{len(names)}"))
        cols.append(viol.alias(f"v{len(names)}"))
    # each referential constraint's non-null total is one more
    # conditional sum in the SAME compiled pass (r17, guide §2.3):
    # computing it as a separate df.agg() paid a full extra scan of
    # the fact table plus a broadcast cross join per execution
    for j, c in enumerate(refs):
        cols.append(
            F.coalesce(
                F.sum(F.col(c["col"]).isNotNull().cast("long")),
                F.lit(0),
            ).alias(f"rn{j}")
        )
    spark = df.sparkSession
    rows_df = None
    agg = None
    if names or refs:
        # execute the compiled aggregate EXACTLY ONCE (unioning per-
        # constraint projections of the lazy agg row would re-run the
        # scan per branch — plan-asserted in tests); the result is ONE
        # bounded row, the sanctioned collect shape
        agg = df.agg(n.alias("__n"), *cols).first()
    if names:
        audit_rows = [
            (name,
             None if agg[f"m{i}"] is None else int(agg[f"m{i}"]),
             int(agg[f"v{i}"]), int(agg[f"v{i}"]) == 0)
            for i, name in enumerate(names, start=1)
        ]
        rows_df = spark.createDataFrame(
            audit_rows,
            "constraint string, metric_e6 long, violations long,"
            " passed boolean",
        )

    for j, c in enumerate(refs):
        dim = c["dim_df"].select(
            F.col(c["dim_col"]).alias("__k")
        ).distinct()
        orphans = (
            df.select(F.col(c["col"]).alias("__k"))
            .where(F.col("__k").isNotNull())
            .join(F.broadcast(dim), "__k", "left_anti")
            .agg(F.count(F.lit(1)).alias("v"))
        )
        # the non-null total came back on the compiled agg row — embed
        # it as a literal (same value the dropped per-ref scan computed)
        nn = F.lit(int(agg[f"rn{j}"]))
        one = orphans.select(
            F.lit(f"ref_integrity({c['col']})").alias("constraint"),
            F.when(
                nn > 0,
                F.floor(
                    (nn.cast("double") - F.col("v").cast("double"))
                    / nn.cast("double") * F.lit(1e6)
                    + F.lit(0.5)
                ).cast("long"),
            ).alias("metric_e6"),
            F.col("v").cast("long").alias("violations"),
            (F.col("v") == 0).alias("passed"),
        )
        rows_df = one if rows_df is None else rows_df.unionAll(one)
    assert rows_df is not None, "no constraints declared"
    return rows_df
