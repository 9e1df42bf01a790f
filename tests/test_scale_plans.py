"""100 TB-posture plan assertions (SURVEY.md §4, VERDICT r2 item 10):
filters/projections reach the parquet scan, dimension joins broadcast,
nothing falls back to a cartesian product, windows stay partitioned."""

import pyspark.sql.functions as F

from modeltracking_spark.fixtures import hycom_grid_fixture
from modeltracking_spark.operators.profile import profile_along_track
from modeltracking_spark.queries.timegeo import synthetic_track
from tests.conftest import SF001


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    q = li.where(F.col("l_quantity") >= 49.0).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    plan = _plan(q)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_quantity" in plan
    # scan must read only the 4 referenced columns, not all 11
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs
    assert "l_quantity" in rs and "l_returnflag" in rs


def test_profile_plan_broadcasts_track_no_cartesian(spark):
    prof = profile_along_track(
        synthetic_track(spark), hycom_grid_fixture(spark), "water_temp", 25
    )
    plan = _plan(prof)
    assert "BroadcastHashJoin" in plan          # tiny track side broadcast
    assert "CartesianProduct" not in plan       # never a cross product
    assert "HashAggregate" in plan              # map-side-combinable IDW


def test_dim_join_broadcasts(spark):
    o = spark.read.parquet(f"{SF001}/orders.parquet")
    n = spark.read.parquet(f"{SF001}/nation.parquet")
    j = o.join(F.broadcast(n), o.o_custkey % 25 == n.n_nationkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_window_stays_partitioned(spark):
    # per-key windows must not collapse to a single global partition
    from pyspark.sql import Window

    from modeltracking_spark.schemas import load_table

    e = load_table(spark, SF001, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    q = e.withColumn("rn", F.row_number().over(w))
    plan = _plan(q)
    assert "partitionBy=[user_id]" in plan.replace(" ", "") or "user_id" in plan
    assert "SinglePartition" not in plan
