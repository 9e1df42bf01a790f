"""Salted skew join equivalence + streaming dedup within watermark."""

import pyspark.sql.functions as F

from modeltracking_spark.operators.joins import salted_join
from modeltracking_spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_stream_once,
)
from tests.conftest import SF0001


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share one key
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, attr string"
    )
    plain = big.join(small, "k").select("k", "payload", "attr")
    salted = salted_join(big, small, "k").select("k", "payload", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_deterministic_across_partitionings(spark):
    # value-derived salt: the full output (including per-row salt routing)
    # is identical when the big side arrives in a different partitioning —
    # the task-retry / speculative-execution determinism guarantee
    big = spark.range(500).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "k long, attr string"
    )
    a = salted_join(big, small, "k").collect()
    b = salted_join(big.repartition(13, "payload"), small, "k").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k long, payload string")
    small = spark.createDataFrame([(1, "x")], "k long, attr string")
    out = {tuple(r) for r in salted_join(big, small, "k", how="left").collect()}
    assert out == {(1, "a", "x"), (99, "b", None)}


def test_salted_join_spreads_hot_key(spark):
    # one pathological key owns EVERY big-side row; after salting its rows
    # must occupy several shuffle buckets (the whole point of the salt)
    n_salts = 8
    big = spark.range(4000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame([(7, "hot")], "k long, attr string")
    out = salted_join(big, small, "k", n_salts=n_salts)
    assert out.count() == 4000
    # plan: the join keys include the salt, so the shuffle hash-partitions
    # on (k, __salt) — no single reducer owns the hot key
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    # data: the value-derived salts of the hot key's rows really spread
    # (re-derives the operator's salt formula as its published contract)
    n_distinct_salts = (
        big.select(
            ((F.xxhash64(F.struct(*big.columns)) % n_salts + n_salts) % n_salts)
            .alias("s")
        )
        .distinct()
        .count()
    )
    assert n_distinct_salts > 1


def test_stream_dedup_within_watermark(spark):
    # the same file delivered as a stream, unioned with itself -> every
    # event_id arrives twice within the watermark -> dedup halves it
    s1 = read_events_stream(spark, SF0001)
    doubled = s1.unionByName(read_events_stream(spark, SF0001))
    deduped = dedup_within_watermark(doubled, ["event_id"])
    got = run_stream_once(deduped, "t_dedup", output_mode="append")
    from modeltracking_spark.schemas import load_table

    n_batch = load_table(spark, SF0001, "events").count()
    assert got.count() == n_batch
    assert got.select("event_id").distinct().count() == n_batch
