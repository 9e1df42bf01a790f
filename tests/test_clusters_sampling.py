"""Connected-components dedup clustering + deterministic hash sampling."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modeltracking_spark.operators.dedup import dedup_clusters
from modeltracking_spark.operators.sampling import (
    N_BUCKETS,
    hash_bucket,
    hash_split,
    stratified_hash_sample,
)


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference CC: min node id per component via union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_clusters_simple_chain(spark):
    # 1-2, 2-3, 5-6 : two components, transitive chain in the first
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    got = {
        (r["id"], r["cluster_id"]) for r in dedup_clusters(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)}


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_clusters_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["id"], r["cluster_id"]) for r in dedup_clusters(pairs).collect()}
    want = set(_union_find_components(edges).items())
    assert got == want


def test_clusters_long_path_converges(spark):
    # a 33-node path is the worst diameter for its size; pointer jumping
    # must still converge inside max_rounds (log2(33) ≈ 5 rounds)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], ["id_a", "id_b"]
    )
    rows = dedup_clusters(pairs).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 33


def test_hash_split_partitions_completely(spark, docs_sf001):
    out = hash_split(docs_sf001.select("doc_id"), "doc_id").cache()
    n = docs_sf001.count()
    assert out.count() == n  # no row lost or duplicated
    by_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(by_split) <= {"train", "valid", "test"}
    assert sum(by_split.values()) == n
    # 98/1/1 within loose tolerance on 300 rows
    assert by_split["train"] / n > 0.9


def test_hash_split_stable_under_repartition(spark, docs_sf001):
    a = hash_split(docs_sf001.select("doc_id"), "doc_id")
    b = hash_split(docs_sf001.select("doc_id").repartition(13), "doc_id")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_hash_bucket_range_and_salt(spark, docs_sf001):
    d = docs_sf001.select("doc_id")
    buckets = d.select(hash_bucket("doc_id").alias("b"))
    lo, hi = buckets.agg(F.min("b"), F.max("b")).first()
    assert 0 <= lo and hi < N_BUCKETS
    # a different salt must produce a different assignment
    salted = d.select(
        hash_bucket("doc_id").alias("b0"),
        hash_bucket("doc_id", salt="x").alias("b1"),
    )
    assert salted.where(F.col("b0") != F.col("b1")).count() > 0


def test_stratified_sample_respects_thresholds(spark, docs_sf001):
    kept = stratified_hash_sample(
        docs_sf001, "doc_id", "lang", {"en": 0.0}, default_fraction=1.0
    )
    # en fully dropped, everything else fully kept
    assert kept.where(F.col("lang") == "en").count() == 0
    non_en = docs_sf001.where(F.col("lang") != "en").count()
    assert kept.count() == non_en


def test_deterministic_shuffle_two_pass_rank(spark):
    """The two-pass bucket-offset rank must (a) produce exactly 0..n-1,
    (b) equal the naive global md5 rank, (c) be stable under
    repartitioning, and (d) keep the full-data window partitioned on
    the bucket (no 100 TB single-partition sort)."""
    import pyspark.sql.functions as F

    from modeltracking_spark.operators.sampling import deterministic_shuffle
    from tests.conftest import SF001

    d = spark.read.parquet(f"{SF001}/documents.parquet").select("doc_id")
    out = deterministic_shuffle(d, "doc_id", salt="t", shard_size=7)
    rows = out.collect()
    ranks = sorted(r["shuffle_rank"] for r in rows)
    assert ranks == list(range(len(rows)))
    # naive single-window reference
    from pyspark.sql import Window

    naive = d.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("t"))),
                F.col("doc_id"),
            )
        )
        - 1,
    )
    want = {r["doc_id"]: r["rk"] for r in naive.collect()}
    got = {r["doc_id"]: r["shuffle_rank"] for r in rows}
    assert got == want
    # repartition-stable
    out2 = deterministic_shuffle(
        d.repartition(13), "doc_id", salt="t", shard_size=7
    )
    assert {(r["doc_id"], r["shuffle_rank"]) for r in out2.collect()} == set(
        got.items()
    )
    # shard arithmetic
    for r in rows:
        assert r["shard_id"] == r["shuffle_rank"] // 7
        assert r["idx_in_shard"] == r["shuffle_rank"] % 7
    # plan: the full-data window partitions on the bucket column
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan


def test_temperature_sample_flattens_mix(spark):
    """alpha=0.5 sampling: expected share ~ sqrt(n_s), so the tail
    stratum's keep RATE must exceed the head's, thresholds must follow
    the documented fixed-point formula, and selection is deterministic."""
    import math

    from modeltracking_spark.operators.sampling import temperature_sample

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    d = spark.createDataFrame(rows, "doc_id long, src string")
    kept = temperature_sample(d, "doc_id", "src", alpha=0.5, target_rows=300)
    got = {r["src"]: r for r in kept.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"), F.min("thr").alias("thr")).collect()}
    w = {"head": math.floor(math.sqrt(900) * 1e6 + 0.5),
         "tail": math.floor(math.sqrt(100) * 1e6 + 0.5)}
    sw = sum(w.values())
    n_s = {"head": 900, "tail": 100}
    for s in ("head", "tail"):
        want = min(N_BUCKETS, math.floor(300.0 * w[s] / (sw * n_s[s]) * N_BUCKETS))
        assert got[s]["thr"] == want
    # sqrt-weighting: tail keep-rate 3x head keep-rate (sqrt(900)/sqrt(100)
    # vs 9x size ratio)
    assert got["tail"]["thr"] == 3 * got["head"]["thr"]
    # deterministic: same rows on a rerun
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in temperature_sample(
        d, "doc_id", "src", alpha=0.5, target_rows=300).collect())
    assert ids1 == ids2


def test_weighted_priority_sample_properties(spark):
    """A-Res: deterministic across reruns/partitionings; heavier keys
    sampled more often (aggregate over disjoint salt... here: weight-1
    vs weight-100 population); zero/negative weights excluded; plan
    uses TakeOrderedAndProject, not a global sort."""
    import pyspark.sql.functions as F

    from modeltracking_spark.operators.sampling import weighted_priority_sample
    from modeltracking_spark.plans import executed_plan

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)]
    rows += [(900, 0.0), (901, -3.0)]           # must be excluded
    df = spark.createDataFrame(rows, ["doc_id", "wt"])
    got = weighted_priority_sample(df, "doc_id", "wt", k=40).collect()
    keys = [r["key"] for r in got]
    assert len(keys) == 40 and 900 not in keys and 901 not in keys
    # heavy rows are 10% of the population but must dominate the sample
    heavy = sum(1 for x in keys if x < 50)
    assert heavy > 20
    # determinism under repartitioning
    again = weighted_priority_sample(
        df.repartition(13), "doc_id", "wt", k=40
    ).collect()
    assert [(r["key"], r["rk"]) for r in got] == [
        (r["key"], r["rk"]) for r in again
    ]
    plan = executed_plan(weighted_priority_sample(df, "doc_id", "wt", k=40))
    assert "TakeOrderedAndProject" in plan
