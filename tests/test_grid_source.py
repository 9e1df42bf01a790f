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
