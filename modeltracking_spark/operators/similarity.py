"""Embedding similarity search (extension surface; SURVEY.md §2.12).

Two tiers:
- brute-force top-k cosine: query set × corpus with the query side
  small/broadcast — the correctness baseline.
- LSH-bucketed (random hyperplane signs) top-k: corpus is bucketed by a
  b-bit sign signature; candidates come from the query's bucket (plus
  Hamming-1 probes), then exact re-rank. This is the 100 TB path: the
  cross product shrinks by ~2^b.

All vector math is JVM higher-order functions (functions.vector); the
hyperplanes are deterministic pseudo-random signs derived from integer
mixes so results are reproducible without a seed file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modeltracking_spark.functions.vector import cosine_similarity, l2_norm


def cosine_topk_brute(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k by cosine for each query against the full corpus.

    The query side is broadcast (small); the corpus streams — one pass,
    no shuffle of the corpus until the per-query top-k aggregation.
    Deterministic tie-break by candidate id.
    Output: (q_id, c_id, cosine, rnk).

    Parameter order is (queries, corpus) — same as :func:`cosine_topk_lsh`.
    ``exclude_self`` drops rows where q_id == c_id; only enable when both
    sides share one id space (otherwise coincident ids from different
    spaces would wrongly be dropped).
    """
    x = corpus.crossJoin(F.broadcast(queries))
    if exclude_self:
        x = x.where(F.col(q_id) != F.col(c_id))
    x = x.withColumn("cosine", cosine_similarity(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return (
        x.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(q_id, c_id, "cosine", "rnk")
    )


def hyperplane_signature(vec_col: str, n_planes: int = 8, dim: int = 64) -> F.Column:
    """b-bit sign signature under deterministic pseudo-random hyperplanes.

    plane_p[d] = ±1 from an integer mix of (p, d); signature bit p is the
    sign of Σ_d plane_p[d]·vec[d]. Pure column expressions.
    """
    def _signed_term(plane: int):
        # deterministic ±1 pattern per (plane, dim) via xxhash64 parity.
        # NB: a plain 2-arg lambda — a `p=p` default would make PySpark
        # build a 3-arg lambda and fail zip_with resolution.
        def term(x, d):
            sign = F.when(
                F.pmod(F.xxhash64(d, F.lit(plane)), F.lit(2)) == 0, 1.0
            ).otherwise(-1.0)
            return x.cast("double") * sign

        return term

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                _signed_term(p),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k: bucket corpus by hyperplane signature, probe
    each query's bucket plus its full Hamming-1 neighborhood (n_planes+1
    probe keys), exact re-rank inside the candidate set.

    Multi-probe raises recall from a single-bucket lookup (which misses a
    near-identical pair w.p. ~p·n_planes) to the Hamming-1 ball; a
    corpus vector can match a query through at most one probe key (probe
    values are distinct), so no dedup join is needed. Scale: corpus
    shuffles once on the signature; the query side fans out
    (n_planes+1)× before the broadcast — still tiny.

    Parameter order is (queries, corpus) — same as
    :func:`cosine_topk_brute`; ``exclude_self`` likewise.
    """
    csig = corpus.withColumn("sig", hyperplane_signature(c_vec, n_planes, dim))
    qsig = queries.withColumn("__qsig", hyperplane_signature(q_vec, n_planes, dim))
    probes = F.array(
        F.col("__qsig"),
        *[F.col("__qsig").bitwiseXOR(F.lit(2**p)) for p in range(n_planes)],
    )
    qsig = (
        qsig.withColumn("sig", F.explode(probes)).drop("__qsig")
    )
    x = csig.join(F.broadcast(qsig), "sig")
    if exclude_self:
        x = x.where(F.col(q_id) != F.col(c_id))
    x = x.withColumn("cosine", cosine_similarity(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return (
        x.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(q_id, c_id, "cosine", "rnk")
    )


def centroid_per_label(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per label via posexplode + group —
    the relational form of a vector aggregate. Output:
    (label, dim, centroid array<double>, centroid_norm).
    """
    longf = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "val"),
    )
    per_dim = longf.groupBy("label", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__pm"),
        )
        .select(
            "label",
            F.transform("__pm", lambda s: s["m"]).alias("centroid"),
        )
        .withColumn("dim", F.size("centroid"))
        .withColumn("centroid_norm", l2_norm("centroid"))
    )
