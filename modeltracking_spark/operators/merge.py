"""Incremental-ingest MERGE (upsert) — the daily-delta step every
lakehouse corpus runs (Delta/Iceberg ``MERGE INTO`` semantics) expressed
as plain relational algebra so it works on any table format.

Extension surface (SURVEY.md §2.12 — no reference analog): match delta
rows to snapshot rows on a key; matched rows take the DELTA's values
(update), unmatched delta rows insert, untouched snapshot rows carry
over — each output row tagged with the op that produced it so pipelines
can audit the merge.

Scale shape: ONE union + one hash-partitioned per-key window (keep the
delta row when both exist) — never a wide full-outer-join coalesce over
every column, and never a broadcast of the snapshot. At 100 TB the
snapshot side is partitioned storage and the delta is ~1% of it; the
single shuffle keys on the merge key, so co-locating (bucketing) the
snapshot on that key makes the merge exchange-free for the big side
(see operators/layout.py:ensure_bucketed_table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame, delta: DataFrame, key_col: str
) -> DataFrame:
    """Merge ``delta`` into ``snapshot`` by ``key_col``.

    Both sides must share a schema. Output: the merged table plus
    ``merge_op`` ∈ ('updated', 'inserted', 'kept'):
    updated = key in BOTH sides (delta row wins), inserted = delta-only,
    kept = snapshot-only — derived from min/max of the side tag, so a
    side-internal duplicate can never masquerade as an update. Duplicate
    keys WITHIN a side are an upstream bug and fail LOUDLY
    (``raise_error``) instead of electing a nondeterministic survivor.
    """
    if snapshot.columns != delta.columns:
        raise ValueError(
            f"schema mismatch: snapshot {snapshot.columns} vs delta {delta.columns}"
        )
    tagged = snapshot.withColumn("__src", F.lit(0)).unionByName(
        delta.withColumn("__src", F.lit(1))
    )
    wk = Window.partitionBy(key_col)
    w = wk.orderBy(F.col("__src").desc())
    return (
        tagged.withColumn("__rk", F.row_number().over(w))
        .withColumn("__both", F.max("__src").over(wk) > F.min("__src").over(wk))
        .withColumn("__n", F.count(F.lit(1)).over(wk))
        .where(
            # a key holds at most one row per side: n == 1 + (1 if both)
            F.when(
                F.col("__n") > F.lit(1) + F.col("__both").cast("int"),
                F.raise_error(
                    F.concat(
                        F.lit("merge_upsert: duplicate key within a side: "),
                        F.col(key_col).cast("string"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .where(F.col("__rk") == 1)
        .withColumn(
            "merge_op",
            F.when(F.col("__both"), F.lit("updated")).otherwise(
                F.when(F.col("__src") == 1, F.lit("inserted")).otherwise(
                    F.lit("kept")
                )
            ),
        )
        .drop("__src", "__rk", "__both", "__n")
    )
