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
    updated = key in both (delta row wins), inserted = delta-only,
    kept = snapshot-only. Duplicate keys WITHIN a side are an upstream
    bug; the deterministic tie-break (delta first) still yields one row
    per key, never a row explosion.
    """
    if snapshot.columns != delta.columns:
        raise ValueError(
            f"schema mismatch: snapshot {snapshot.columns} vs delta {delta.columns}"
        )
    tagged = snapshot.withColumn("__src", F.lit(0)).unionByName(
        delta.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(key_col).orderBy(F.col("__src").desc())
    return (
        tagged.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
        .where(F.col("__rk") == 1)
        .withColumn(
            "merge_op",
            F.when(F.col("__n") > 1, F.lit("updated")).otherwise(
                F.when(F.col("__src") == 1, F.lit("inserted")).otherwise(
                    F.lit("kept")
                )
            ),
        )
        .drop("__src", "__rk", "__n")
    )
