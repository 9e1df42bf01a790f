"""Storage-layout operators for the 100 TB posture (SURVEY.md §4/§9):

- bucketed tables: co-locate join keys at WRITE time so the big
  fact-to-fact join needs no shuffle at READ time (sort-merge join over
  pre-bucketed files);
- time-partitioned grid store: the profile pipeline's time-bucket
  predicate prunes whole partitions before any I/O.

Both are the write-side halves of claims the join/profile operators
make; tests/test_layout.py proves them at the plan level (no Exchange /
PartitionFilters present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist as a bucketed+sorted managed table. Two tables bucketed
    the same way on the join key sort-merge-join WITHOUT a shuffle —
    the standard layout for repeated fact-to-fact joins at scale."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def write_grid_partitioned(grid: DataFrame, path: str) -> None:
    """Persist the long grid partitioned by ``time_hours`` — the profile
    pipeline filters on a small set of time buckets, so partition pruning
    skips everything else (``PartitionFilters`` in the scan).

    At 100 TB add bucketing on (lat_idx, lon_idx) within each partition
    so the neighborhood equi-join co-locates too."""
    grid.write.mode("overwrite").partitionBy("time_hours").parquet(path)


def read_grid(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned grid store (schema from the files)."""
    return spark.read.parquet(path)
