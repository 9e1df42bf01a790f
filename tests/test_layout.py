"""Plan-level proof of the storage-layout claims: bucketed joins skip
the shuffle; the partitioned grid store prunes time partitions."""

import pyspark.sql.functions as F
import pytest

from modeltracking_spark.fixtures import hycom_grid_fixture
from modeltracking_spark.operators.layout import (
    read_grid,
    write_bucketed_table,
    write_grid_partitioned,
)
from modeltracking_spark.plans import executed_plan
from tests.conftest import SF0001


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    o = spark.read.parquet(f"{SF0001}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{SF0001}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    write_bucketed_table(o, "t_orders_b", "o_custkey", 4)
    write_bucketed_table(
        c.withColumnRenamed("c_custkey", "o_custkey"), "t_customer_b", "o_custkey", 4
    )
    ob, cb = spark.table("t_orders_b"), spark.table("t_customer_b")
    # disable broadcast so the join exercises the bucketed path (at real
    # scale neither side fits a broadcast; here both would)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ob.join(cb, "o_custkey")
        plan = executed_plan(j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # buckets already co-located: no shuffle exchange on the join key
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # sanity: same result as the plain join
    plain = (
        spark.read.parquet(f"{SF0001}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF0001}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert j.count() == plain


def test_partitioned_grid_prunes_time(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gridstore"))
    # small grid slice to keep the write fast
    g = hycom_grid_fixture(spark).where(
        (F.col("time_hours") <= 9) & (F.col("lat_idx") < 10) & (F.col("lon_idx") < 10)
    )
    write_grid_partitioned(g, path)
    back = read_grid(spark, path)
    q = back.where(F.col("time_hours") == 6)
    plan = executed_plan(q)
    assert "PartitionFilters" in plan and "time_hours" in plan
    assert q.count() == g.where(F.col("time_hours") == 6).count() > 0


def test_morton_code_matches_python_reference_and_is_bijective(spark):
    """Morton codes must equal the classic bit-interleave and be unique
    over the domain; locality: the Z-order distance between horizontal
    neighbors is far smaller on average than a row-major layout's."""
    import itertools

    from pyspark.sql import functions as F

    from modeltracking_spark.operators.layout import morton_code

    def ref(a, b, bits=8):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    n = 32
    rows = [(a, b) for a, b in itertools.product(range(n), range(n))]
    d = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r["a"], r["b"]): r["m"]
        for r in d.select("a", "b", morton_code("a", "b").alias("m")).collect()
    }
    assert got == {(a, b): ref(a, b) for a, b in rows}
    assert len(set(got.values())) == n * n  # bijective on the domain
    # locality: mean |code delta| to the (a+1, b) neighbor beats the
    # row-major layout's constant stride-n gap
    deltas = [abs(got[(a + 1, b)] - got[(a, b)]) for a in range(n - 1) for b in range(n)]
    rowmajor = [abs(((a + 1) * n + b) - (a * n + b)) for a in range(n - 1) for b in range(n)]
    assert sorted(deltas)[len(deltas) // 2] < sorted(rowmajor)[0]  # median 1 < n


def test_partition_prune_events_query_prunes_day_partitions(spark):
    """The scored partition_prune_events query must push the 3-day
    predicate into PartitionFilters (directory pruning, zero row-level
    work for other days) and prune the scan schema to the two referenced
    data columns."""
    from modeltracking_spark.queries import load_registries
    from tests.conftest import SF001

    qs, _ = load_registries()
    out = qs["partition_prune_events"](spark, SF001)
    plan = executed_plan(out)
    scan = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "(day" in scan.split("PartitionFilters")[1].split("]")[0]
    assert ">= 2024-01-10" in scan and "<= 2024-01-12" in scan
    assert "struct<event_type:string,value:double>" in scan  # pruned read


def test_bucketed_join_revenue_query_is_exchange_free_at_scale_shape(spark):
    """With broadcast off (the 100 TB regime — neither fact side fits),
    the scored bucketed_join_revenue join subtree must sort-merge over
    the pre-bucketed, pre-sorted files: no Exchange and no Sort below
    the join; the only shuffle in the whole plan is the final 9-group
    aggregate."""
    from modeltracking_spark.queries import load_registries
    from tests.conftest import SF001

    qs, _ = load_registries()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = qs["bucketed_join_revenue"](spark, SF001)
        plan = executed_plan(out)
        assert "SortMergeJoin" in plan
        join_sub = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_sub      # bucketed: no join shuffle
        assert plan.count("Exchange hashpartitioning") == 1  # the agg only
        # sort elimination needs the one-file-per-bucket layout (the
        # writer repartitions for it) PLUS the post-SPARK-28632 opt-in;
        # with it the join is exchange-free AND sort-free
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        plan2 = executed_plan(qs["bucketed_join_revenue"](spark, SF001))
        join_sub2 = plan2.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_sub2 and "Sort " not in join_sub2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
