"""LSH hot-bucket cap (VERDICT r14 item 1): capped band self-joins stay
pair-subsets of the uncapped joins, oversized buckets chain instead of
exploding quadratically, connectivity survives for component dedup, and
the overflow accounting is integer-exact.  The oracled twins are
``minhash_lsh_capped_pairs`` / ``lsh_bucket_overflow_stats`` /
``embedding_neardup_capped_lsh`` (binding caps, replayed in DuckDB)."""

import pytest
import pyspark.sql.functions as F

from modeltracking_spark.operators.dedup import (
    _capped_band_pairs,
    band_bucket_overflow,
    dedup_clusters,
    minhash_banded_reps,
    minhash_rep_pairs,
    simhash64,
    simhash_neardup_pairs,
    token_ids,
)

# one mega-bucket (band 0, key 7) of 6 members + two small buckets
BANDED = [
    (i, 0, 7) for i in (11, 3, 8, 5, 20, 14)
] + [(1, 0, 9), (2, 0, 9), (30, 1, 7), (31, 1, 7), (32, 1, 7)]


def _banded(spark):
    return spark.createDataFrame(BANDED, "id long, band int, band_key long")


def test_capped_pairs_chain_oversized_bucket(spark):
    got = {
        (r["id_a"], r["id_b"])
        for r in _capped_band_pairs(_banded(spark), "id", (), 4).collect()
    }
    # mega-bucket members sorted: 3,5,8,11,14,20 -> 5 adjacent pairs
    chain = {(3, 5), (5, 8), (8, 11), (11, 14), (14, 20)}
    small = {(1, 2), (30, 31), (30, 32), (31, 32)}
    assert got == chain | small


def test_capped_pairs_subset_and_uncapped_identity(spark):
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in _capped_band_pairs(_banded(spark), "id", (), None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in _capped_band_pairs(_banded(spark), "id", (), 4).collect()
    }
    assert capped <= uncapped
    # a cap above every bucket is the identity
    assert uncapped == {
        (r["id_a"], r["id_b"])
        for r in _capped_band_pairs(_banded(spark), "id", (), 100).collect()
    }
    # 6-member bucket: 15 full pairs vs 5 chained
    assert len(uncapped) == 15 + 4 and len(capped) == 5 + 4


def test_capped_pairs_preserve_connected_components(spark):
    # component dedup over chained pairs == over full pairs
    full = _capped_band_pairs(_banded(spark), "id", (), None)
    chained = _capped_band_pairs(_banded(spark), "id", (), 4)

    def comps(pairs):
        rows = dedup_clusters(pairs).collect()
        return {r["id"]: r["cluster_id"] for r in rows}

    assert comps(chained) == comps(full)


def test_capped_pairs_payload_rides_the_chain(spark):
    df = spark.createDataFrame(
        [(i, 0, 7, 100 + i) for i in (4, 9, 2)],
        "id long, band int, band_key long, fp long",
    )
    rows = _capped_band_pairs(df, "id", ("fp",), 2).collect()
    got = {(r["id_a"], r["id_b"], r["fp_a"], r["fp_b"]) for r in rows}
    assert got == {(2, 4, 102, 104), (4, 9, 104, 109)}


def test_capped_pairs_rejects_degenerate_cap(spark):
    with pytest.raises(ValueError, match="max_bucket_size"):
        _capped_band_pairs(_banded(spark), "id", (), 1)


def test_band_bucket_overflow_accounting_exact(spark):
    rows = band_bucket_overflow(_banded(spark), 4).collect()
    by_band = {r["band"]: r for r in rows}
    b0 = by_band[0]
    # band 0: bucket(7)=6 members (oversized), bucket(9)=2
    assert b0["n_buckets"] == 2 and b0["n_oversized"] == 1
    assert b0["max_bucket"] == 6
    assert b0["pairs_full"] == 15 + 1
    assert b0["pairs_emitted"] == 5 + 1
    assert b0["pairs_dropped"] == 10
    assert b0["sample_min_id"] == 3
    b1 = by_band[1]
    assert b1["n_oversized"] == 0 and b1["pairs_dropped"] == 0
    assert b1["sample_min_id"] is None


# DISTINCT token sets (one unique token each) so the identical-set
# collapse cannot absorb the cluster: the rep-level band buckets
# themselves go oversized, which is the shape the cap targets
MEGA = [
    (
        i,
        "common boilerplate nav footer header copyright terms privacy "
        "cookie banner contact about " + f"uniq{i}",
    )
    for i in range(30)
]
LONER = [(100, "totally different content here"), (101, "another unrelated doc")]


def test_minhash_rep_pairs_capped_subset_and_connected(spark):
    """A near-identical mega-cluster: binding cap keeps every emitted
    pair a member of the uncapped pair set and keeps the cluster in one
    connected component."""
    df = spark.createDataFrame(MEGA + LONER, "doc_id long, text string")
    dt = token_ids(df, "doc_id", "text")
    un = {(r["rep_a"], r["rep_b"]) for r in
          minhash_rep_pairs(dt, max_bucket_size=None).collect()}
    cap = {(r["rep_a"], r["rep_b"]) for r in
           minhash_rep_pairs(dt, max_bucket_size=2).collect()}
    assert cap and cap <= un

    stats = band_bucket_overflow(
        minhash_banded_reps(dt), max_bucket_size=2, id_col="rep"
    ).collect()
    assert sum(r["n_oversized"] for r in stats) > 0
    assert sum(r["pairs_dropped"] for r in stats) == (
        sum(r["pairs_full"] for r in stats)
        - sum(r["pairs_emitted"] for r in stats)
    )


def test_simhash_capped_subset(spark):
    df = spark.createDataFrame(MEGA, "doc_id long, text string")
    fps = simhash64(token_ids(df, "doc_id", "text"))
    un = {(r["id_a"], r["id_b"]) for r in
          simhash_neardup_pairs(fps, max_bucket_size=None).collect()}
    cap = {(r["id_a"], r["id_b"]) for r in
           simhash_neardup_pairs(fps, max_bucket_size=2).collect()}
    assert cap and cap <= un


def test_cosine_capped_subset_probe_respected(spark):
    from modeltracking_spark.operators.similarity import cosine_neardup_lsh

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    un = {(r["id_a"], r["id_b"]) for r in cosine_neardup_lsh(
        e, probe_filter=F.col("vec_id") < 50, max_bucket_size=None
    ).collect()}
    cap = {(r["id_a"], r["id_b"]) for r in cosine_neardup_lsh(
        e, probe_filter=F.col("vec_id") < 50, max_bucket_size=3
    ).collect()}
    assert cap <= un
    assert all(a < 50 for a, _ in cap)
