"""100 TB-posture plan assertions (SURVEY.md §4, VERDICT r2 item 10):
filters/projections reach the parquet scan, dimension joins broadcast,
nothing falls back to a cartesian product, windows stay partitioned."""

import pyspark.sql.functions as F

from modeltracking_spark.fixtures import hycom_grid_fixture
from modeltracking_spark.operators.profile import profile_along_track
from modeltracking_spark.plans import (
    assert_no_cartesian,
    assert_pruned_schema,
    assert_pushed_filter,
    executed_plan,
    has_broadcast_join,
)
from modeltracking_spark.queries.timegeo import synthetic_track
from tests.conftest import SF001


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    q = li.where(F.col("l_quantity") >= 49.0).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    assert_pushed_filter(q, "GreaterThanOrEqual(l_quantity")
    # scan must read only the 4 referenced columns, not all 11
    assert_pruned_schema(
        q,
        must_have=["l_quantity", "l_returnflag"],
        must_not_have=["l_extendedprice", "l_shipdate"],
    )


def test_profile_plan_broadcasts_track_no_cartesian(spark):
    prof = profile_along_track(
        synthetic_track(spark), hycom_grid_fixture(spark), "water_temp", 25
    )
    assert has_broadcast_join(prof)             # tiny track side broadcast
    assert_no_cartesian(prof)                   # never a cross product
    assert "HashAggregate" in executed_plan(prof)  # map-side-combinable IDW


def test_dim_join_broadcasts(spark):
    o = spark.read.parquet(f"{SF001}/orders.parquet")
    n = spark.read.parquet(f"{SF001}/nation.parquet")
    j = o.join(F.broadcast(n), o.o_custkey % 25 == n.n_nationkey)
    assert has_broadcast_join(j)


def test_winnow_is_shuffle_free(spark):
    # fingerprinting is a narrow map: no Exchange anywhere in the plan
    from modeltracking_spark.operators.textops import winnow_fingerprints

    d = spark.read.parquet(f"{SF001}/documents.parquet")
    plan = executed_plan(winnow_fingerprints(d))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the final explode only


def test_minhash_expansion_partitions_clusters(spark):
    # the set-collapse pipeline must keep the quadratic member expansion
    # behind a repartition (no single-task mega-explode) and never fall
    # back to a cartesian product
    from modeltracking_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    d = spark.read.parquet(f"{SF001}/documents.parquet")
    q = minhash_dedup_pairs(d, "doc_id", "text")
    assert_no_cartesian(q)
    plan = executed_plan(q)
    assert "hashpartitioning(x#" in plan or "hashpartitioning(x" in plan


def test_window_stays_partitioned(spark):
    # per-key windows must not collapse to a single global partition
    from pyspark.sql import Window

    from modeltracking_spark.schemas import load_table

    e = load_table(spark, SF001, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    q = e.withColumn("rn", F.row_number().over(w))
    plan = executed_plan(q)
    assert "user_id" in plan
    assert "SinglePartition" not in plan


def test_pack_chunk_single_shuffle_on_bucket(spark):
    # packing shuffles exactly once, on the bucket key — never a global
    # single-partition window (the serialize-at-100TB trap)
    from modeltracking_spark.operators.packing import pack_chunk

    d = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("n_tok")
    )
    q = pack_chunk(d, "doc_id", "n_tok", "source", 512)
    plan = executed_plan(q)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_hash_split_is_shuffle_free(spark):
    from modeltracking_spark.operators.sampling import hash_split

    d = spark.read.parquet(f"{SF001}/documents.parquet").select("doc_id")
    plan = executed_plan(hash_split(d, "doc_id"))
    assert "Exchange" not in plan


def test_simhash_single_shuffle(spark):
    # the narrow per-doc bit-vote fold: ONE Exchange (the collect_list
    # groupBy), no 63x per-bit explode amplification (VERDICT r3 item 4)
    from modeltracking_spark.operators.dedup import simhash64, token_ids

    d = spark.read.parquet(f"{SF001}/documents.parquet")
    plan = executed_plan(simhash64(token_ids(d, "doc_id", "text")))
    # exactly the one groupBy Exchange; the only Generate is token_ids'
    # narrow token explode, not a per-bit row blowup
    assert plan.count("Exchange") == 1


def test_simhash_neardup_no_cartesian(spark):
    # band-bucketed candidate join — never an all-pairs cross product
    from modeltracking_spark.operators.dedup import (
        simhash64,
        simhash_neardup_pairs,
        token_ids,
    )

    d = spark.read.parquet(f"{SF001}/documents.parquet")
    fps = simhash64(token_ids(d, "doc_id", "text"))
    assert_no_cartesian(simhash_neardup_pairs(fps, max_hamming=3))
