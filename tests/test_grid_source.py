"""S6: the custom Python DataSource must be partition-per-time-step and
byte-identical to the formula fixture."""

import pyspark.sql.functions as F
import pytest

from modeltracking_spark.fixtures import GRID_N_TIME, hycom_grid_fixture
from modeltracking_spark.sources.grid_source import HycomGridDataSource


@pytest.fixture(scope="module")
def grid_ds(spark):
    spark.dataSource.register(HycomGridDataSource)
    return spark.read.format("hycom_grid").load()


def test_partition_per_time_step(spark, grid_ds):
    assert grid_ds.rdd.getNumPartitions() == GRID_N_TIME


def test_matches_fixture_slice(spark, grid_ds):
    pred = "time_hours = 9 AND depth_idx < 2 AND lat_idx < 5"
    a = sorted(map(tuple, grid_ds.where(pred).collect()))
    b = sorted(map(tuple, hycom_grid_fixture(spark).where(pred).collect()))
    assert a == b and len(a) > 0


def test_total_count_and_sentinels(spark, grid_ds):
    assert grid_ds.count() == hycom_grid_fixture(spark).count()
    n_sent = grid_ds.where(F.col("water_temp") <= -4).count()
    n_sent_fix = hycom_grid_fixture(spark).where(F.col("water_temp") <= -4).count()
    assert n_sent == n_sent_fix > 0


def test_time_filter_prunes_partitions(spark, grid_ds):
    # pushFilters absorbs time_hours comparisons -> only the matching
    # time-step InputPartitions are scheduled (the DAP-slicing analog)
    pd_ds = spark.read.format("hycom_grid").option("pushdown", "true").load()
    one = pd_ds.filter("time_hours = 6")
    assert one.rdd.getNumPartitions() == 1
    assert [r[0] for r in one.select("time_hours").distinct().collect()] == [6]

    rng = pd_ds.filter("time_hours >= 6 AND time_hours < 18")
    assert rng.rdd.getNumPartitions() == 4  # steps 6,9,12,15 at step=3
    assert rng.count() == 4 * one.count()


def test_unsupported_filters_still_applied(spark, grid_ds):
    # non-time predicates are handed back to Spark and must still hold
    pd_ds = spark.read.format("hycom_grid").option("pushdown", "true").load()
    mixed = pd_ds.filter("time_hours = 0 AND water_temp > 5.0")
    assert mixed.rdd.getNumPartitions() == 1
    rows = mixed.select("water_temp").distinct().collect()
    assert rows and all(r[0] > 5.0 for r in rows)
