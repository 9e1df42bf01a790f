"""Similarity tier: vector math vs numpy, LSH recall vs brute
(VERDICT r2 fix #5: recall >= 0.9 and bounded k per query)."""

import numpy as np
import pyspark.sql.functions as F

from modeltracking_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    dot_product_fxp,
    l2_norm,
)
from modeltracking_spark.operators.similarity import (
    centroid_per_label,
    cosine_topk_brute,
    cosine_topk_ivf,
    cosine_topk_lsh,
)
from tests.conftest import SF001


def test_vector_math_vs_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    r = df.select(
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
        dot_product_fxp("a", "b").alias("dfx"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert abs(r["dot"] - float(na @ nb)) < 1e-6
    assert abs(r["na"] - float(np.linalg.norm(na))) < 1e-6
    expected_cos = float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb)))
    assert abs(r["cos"] - expected_cos) < 1e-6
    assert r["dfx"] == sum(round(x * y * 1e12) for x, y in zip(a, b))


def _qc(spark):
    e = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return q, c


def test_lsh_recall_and_k(spark):
    q, c = _qc(spark)
    brute = cosine_topk_brute(q, c, k=5, exclude_self=True)
    lsh = cosine_topk_lsh(q, c, k=5, exclude_self=True)
    bset = {(r["q_id"], r["c_id"]) for r in brute.collect()}
    lrows = lsh.collect()
    lset = {(r["q_id"], r["c_id"]) for r in lrows}
    # multi-probe recall vs exact top-5 (VERDICT fix: was a single bucket)
    assert len(bset & lset) / len(bset) >= 0.9
    # never more than k rows per query, ranks contiguous from 1
    per_q = {}
    for r in lrows:
        per_q.setdefault(r["q_id"], []).append(r["rnk"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= 5


def test_lsh_subset_of_corpus_and_exact_cosines(spark):
    q, c = _qc(spark)
    lsh = {(r["q_id"], r["c_id"]): r["cosine"] for r in
           cosine_topk_lsh(q, c, k=5, exclude_self=True).collect()}
    brute = {(r["q_id"], r["c_id"]): r["cosine"] for r in
             cosine_topk_brute(q, c, k=500, exclude_self=True).collect()}
    for pair, cos in lsh.items():
        assert abs(brute[pair] - cos) < 1e-9  # re-rank is exact cosine


def test_ivf_recall_and_exact_rerank(spark):
    q, c = _qc(spark)
    bset = {(r["q_id"], r["c_id"]) for r in
            cosine_topk_brute(q, c, k=5, exclude_self=True).collect()}
    # wide probe: recall >= 0.9; narrow probe (the queries() config) >= 0.75
    for nprobe, bound in [(8, 0.9), (4, 0.75)]:
        rows = cosine_topk_ivf(
            q, c, k=5, n_centroids=16, nprobe=nprobe, exclude_self=True
        ).collect()
        iset = {(r["q_id"], r["c_id"]) for r in rows}
        assert len(bset & iset) / len(bset) >= bound, f"nprobe={nprobe}"
        per_q = {}
        for r in rows:
            per_q.setdefault(r["q_id"], []).append(r["rnk"])
        for ranks in per_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 5


def test_centroid_per_label(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [2.0, 2.0])],
        "label int, embedding array<float>",
    )
    got = {r["label"]: (r["centroid"], r["dim"]) for r in
           centroid_per_label(df).collect()}
    assert got[0][0] == [2.0, 4.0] and got[0][1] == 2
    assert got[1][0] == [2.0, 2.0]
