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


def ensure_bucketed_table(
    df: DataFrame,
    fixture_key: str,
    src: str,
    key: str,
    n_buckets: int = 8,
) -> str:
    """Materialize ``df`` ONCE as an external bucketed+sorted fixture
    table under /tmp and return its catalog name — the cross-session
    variant of :func:`write_bucketed_table` the scored queries need.

    Bucketing metadata lives in the (session-scoped) catalog while the
    files persist on disk: a registered table is reused; otherwise the
    files are (re)built if absent and the final table is registered with
    DDL (CLUSTERED BY … INTO n BUCKETS LOCATION — sound because bucketBy
    encodes the bucket id in each file name). The build is crash- and
    race-safe like every fixture writer here: files go to a pid-suffixed
    temp dir through a throwaway table, then one atomic rename publishes
    them — a killed or losing session can never leave a half-written
    directory where the DDL branch would register it as truth. The
    fixture fingerprint keys the name so parameter/schema/layout changes
    never reuse a stale layout."""
    import hashlib
    import os
    import shutil

    from pyspark.sql import functions as F

    spark = df.sparkSession
    # v2: one file per bucket (repartition before write) — multiple files
    # per bucket would force a re-Sort under every sort-merge join
    layout_version = "v2"
    fp = hashlib.md5(
        f"{layout_version}:{fixture_key}:{src}:{key}:{n_buckets}:"
        f"{df.schema.simpleString()}".encode()
    ).hexdigest()[:10]
    tbl = f"mt_bucketed_{src}_{fp}"
    if spark.catalog.tableExists(tbl):
        return tbl
    path = f"/tmp/modeltracking_bucketed_{src}_{fp}"
    if not os.path.isdir(path):
        tmp = f"{path}.{os.getpid()}.tmp"
        build_tbl = f"{tbl}_build_{os.getpid()}"
        (
            # repartition on the key into n_buckets tasks: Spark's bucket
            # id uses the same hash, so each task holds exactly one
            # bucket and writes exactly one (sorted) file — the layout
            # that lets the sort-merge join skip BOTH shuffle and sort
            df.repartition(n_buckets, F.col(key))
            .write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
            .option("path", tmp).saveAsTable(build_tbl)
        )
        spark.sql(f"DROP TABLE IF EXISTS {build_tbl}")
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race; reuse winner
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    spark.sql(
        f"CREATE TABLE {tbl} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return tbl


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


def morton_code(a, b, bits: int = 8):
    """Z-order (Morton) code: interleave the low ``bits`` bits of two
    non-negative ints — the multi-dimensional data-clustering key
    lakehouse OPTIMIZE/ZORDER layouts sort by (Morton 1966): rows close
    in BOTH dimensions land close in the one-dimensional sort order, so
    a 2-D range predicate touches O(few) contiguous file ranges instead
    of striding the whole table the way a row-major (a, then b) sort
    makes it. Pure integer bit arithmetic (shift/and/or), plan-time
    expression tree, shuffle-free — and bit-identical in any engine
    with shifts."""
    from pyspark.sql import functions as F

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(ca.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(cb.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return out
