"""In-engine training of a logistic-regression quality classifier —
the fasttext-style "quality filter" step of CCNet/GPT-3-era curation
pipelines (train a tiny linear model on a labeled slice, score the
whole corpus), expressed as a fully DISTRIBUTED DataFrame program:
no driver-side collect, not even for the weights — each gradient-descent
iteration is one aggregate producing a 1-row weight relation that
broadcasts into the next.

Determinism discipline (the PageRank/Lloyd playbook): features are
exact int/int ratio doubles; the per-row gradient contribution
(sigmoid(z) − y)·x_j is e6-floored BEFORE the sum, so gradients are
BIGINT sums (order-independent); weights stay e6 integers; the weight
update floors a double division of exact integers. sigmoid uses exp(),
which — like the ln() this repo's scoring oracles already rely on — is
empirically bit-identical between Spark's JVM libm and DuckDB's on this
data (verified at sf0.01 and sf0.1); the residual last-ulp risk is
confined to the e6 floor boundary.

Scale: each iteration = one narrow map + one aggregate (map-side
combinable) + one 1-row broadcast. iters is a compile-time unroll
(2 here), exactly what a production run does with a sampled training
slice before the single full-corpus scoring pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from modeltracking_spark.functions.fixedpoint import e6_half_up
from modeltracking_spark.functions.text import STOPWORDS, tokens

#: feature column names, in z-sum order (bias first)
FEATURES = ("x0", "x1", "x2", "x3")


_e6 = e6_half_up  # shared half-up e6 lift (functions/fixedpoint.py)


def doc_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    label_pred: Column | None = None,
) -> DataFrame:
    """Engine-exact feature vector per document: bias, stopword ratio,
    capped length score (n_tok/64), mean token length / 16 — every
    feature an int/int double ratio scaled into roughly [0, 1] so a
    shared learning rate conditions all coordinates. ``label_pred``
    (boolean) becomes y ∈ {0, 1}."""
    toks = tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    nonspace = F.length(F.translate(F.col(text_col), " ", ""))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        (label_pred.cast("int") if label_pred is not None else F.lit(0)).alias("y"),
        F.lit(1.0).alias("x0"),
        (stop.cast("double") / n_tok.cast("double")).alias("x1"),
        F.least(F.size(toks).cast("double") / F.lit(64.0), F.lit(1.0)).alias("x2"),
        ((nonspace.cast("double") / n_tok.cast("double")) / F.lit(16.0)).alias("x3"),
    )
    return out


def _z(weights_prefix: str = "w") -> Column:
    """Left-associated dot product of e6 weights with the feature row:
    (((w0·x0) + w1·x1) + w2·x2) + w3·x3 — written identically in the
    SQL oracle so the double is bit-exact."""
    z = None
    for i, f in enumerate(FEATURES):
        term = (F.col(f"{weights_prefix}{i}").cast("double") / F.lit(1e6)) * F.col(f)
        z = term if z is None else z + term
    return z


def train_quality_logreg(
    feats: DataFrame, iters: int = 2, lr_num: int = 4, lr_den: int = 1
) -> DataFrame:
    """Unrolled batch gradient descent from w = 0. Each iteration:

        g_j   = Σ_rows floor((sigmoid(z) − y)·x_j·1e6 + 0.5)   (BIGINT)
        w_j  −= floor((lr_num·g_j)::double / (lr_den·n)::double)

    Returns the 1-row e6 weight relation (w0..w3) — never collected.
    """
    w = feats.sparkSession.range(1).select(
        *[F.lit(0).cast("long").alias(f"w{i}") for i in range(len(FEATURES))]
    )
    for _ in range(iters):
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(0.0) - _z()))
        scored = feats.crossJoin(F.broadcast(w))
        grads = scored.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(_e6((sig - F.col("y").cast("double")) * F.col(f))).alias(
                    f"g{i}"
                )
                for i, f in enumerate(FEATURES)
            ],
        )
        w = grads.crossJoin(F.broadcast(w)).select(
            *[
                (
                    F.col(f"w{i}")
                    - F.floor(
                        (F.lit(lr_num) * F.col(f"g{i}")).cast("double")
                        / (F.lit(lr_den) * F.col("n")).cast("double")
                    ).cast("long")
                ).alias(f"w{i}")
                for i in range(len(FEATURES))
            ]
        )
    return w


def score_quality_logreg(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """Score every row with the trained weights: one broadcast join, one
    narrow map. Output: (doc_id, y, score_e6, pred)."""
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(0.0) - _z()))
    return (
        feats.crossJoin(F.broadcast(weights))
        .select(
            "doc_id",
            "y",
            _e6(sig).alias("score_e6"),
        )
        .withColumn("pred", (F.col("score_e6") >= 500_000).cast("int"))
    )
