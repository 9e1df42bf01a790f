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


def _one_row_per_key(df: DataFrame, key_col: str, side: str) -> DataFrame:
    """Fail LOUDLY (raise_error) if ``df`` holds more than one row per
    key — the same duplicate-key discipline as :func:`merge_upsert`; a
    silent duplicate would fabricate extra versions downstream."""
    wk = Window.partitionBy(key_col)
    return (
        df.withColumn("__nk", F.count(F.lit(1)).over(wk))
        .where(
            F.when(
                F.col("__nk") > 1,
                F.raise_error(
                    F.concat(
                        F.lit(f"scd2_apply: duplicate key in {side}: "),
                        F.col(key_col).cast("string"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .drop("__nk")
    )


def scd2_apply(
    history: DataFrame,
    delta: DataFrame,
    key_col: str,
    attr_cols: list[str],
    batch_date: str,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: apply a delta batch to a
    versioned history table, KEEPING superseded versions — the
    history-tracking complement of :func:`merge_upsert` (warehouse
    dimension loads, corpus provenance tracking).

    ``history`` columns: key + attrs + (valid_from string, valid_to
    string NULL=open, is_current boolean). A delta row whose attr hash
    differs from the key's CURRENT version closes that version
    (valid_to = batch_date, is_current = false) and opens a new one
    (valid_from = batch_date); an identical delta row is a no-op; a new
    key opens its first version. Attr comparison concatenates a
    fixed-width md5 PER attribute (NULL sentinel inside), so neither
    NULLs nor separator-containing values can alias across attribute
    boundaries. Duplicate keys within the delta or the current slice
    fail loudly (:func:`_one_row_per_key`).

    Scale: one hash-partitioned full-outer join of the CURRENT slice
    against the delta (both sides needed for change detection — this is
    inherent to SCD2), plus unions; closed history never re-shuffles.

    Output: the new history table + ``scd_op`` ∈ ('history', 'closed',
    'unchanged', 'opened').
    """
    meta = ["valid_from", "valid_to", "is_current"]
    # per-attr inner md5 (fixed width) before the outer hash: a raw
    # separator join would let values containing the separator alias
    # across attribute boundaries ('a\\x1f'+'b' == 'a'+'\\x1fb') and
    # silently swallow a change
    attrs_hash = F.md5(
        F.concat(
            *[F.md5(F.coalesce(F.col(a).cast("string"), F.lit("\x00")))
              for a in attr_cols]
        )
    )
    old = history.where(~F.col("is_current")).select(
        key_col, *attr_cols, *meta, F.lit("history").alias("scd_op")
    )
    cur = _one_row_per_key(
        history.where(F.col("is_current")).withColumn("__h", attrs_hash),
        key_col, "current history slice",
    )
    d = _one_row_per_key(
        delta.select(key_col, *attr_cols).withColumn("__dh", attrs_hash),
        key_col, "delta",
    )
    j = cur.alias("c").join(
        d.alias("d"), F.col(f"c.{key_col}") == F.col(f"d.{key_col}"), "full_outer"
    )
    matched = F.col(f"c.{key_col}").isNotNull() & F.col(f"d.{key_col}").isNotNull()
    changed = matched & (F.col("c.__h") != F.col("d.__dh"))
    unchanged = (
        j.where(
            F.col(f"d.{key_col}").isNull() | (matched & (F.col("c.__h") == F.col("d.__dh")))
        )
        .select(
            F.col(f"c.{key_col}").alias(key_col),
            *[F.col(f"c.{a}").alias(a) for a in attr_cols],
            *[F.col(f"c.{m}").alias(m) for m in meta],
            F.lit("unchanged").alias("scd_op"),
        )
    )
    closed = j.where(changed).select(
        F.col(f"c.{key_col}").alias(key_col),
        *[F.col(f"c.{a}").alias(a) for a in attr_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.lit(batch_date).alias("valid_to"),
        F.lit(False).alias("is_current"),
        F.lit("closed").alias("scd_op"),
    )
    opened = j.where(changed | F.col(f"c.{key_col}").isNull()).select(
        F.col(f"d.{key_col}").alias(key_col),
        *[F.col(f"d.{a}").alias(a) for a in attr_cols],
        F.lit(batch_date).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.lit("opened").alias("scd_op"),
    )
    return old.unionByName(unchanged).unionByName(closed).unionByName(opened)
