"""Deterministic, engine-portable sampling for training-data pipelines.

A 100 TB corpus split into train/valid/test must be (a) reproducible
across runs and engines, (b) stable under repartitioning, and (c) free
of coordination — which rules out RNG-based ``df.sample`` (seed ×
partition layout dependent). The standard fix is **hash bucketing**: a
content-derived bucket in [0, n_buckets) from a cryptographic hash of
the row key + salt. md5 is bit-identical in Spark and DuckDB, so every
assignment here is fully oracle-checkable.

No reference analog (the reference has no sampling surface,
`/root/reference/trackplot_hycom.py` processes every row); this module
is extension-tier per the brief's training-data-pipeline scope.

Scale: one narrow projection — no shuffle, no state, trivially
parallel. The hash is computed from the key column only; at 100 TB
prefer a stable business key (url, doc fingerprint) over a synthetic id
so re-ingestion keeps rows in the same split.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: buckets per unit probability — 1e-4 split resolution
N_BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str = "", n_buckets: int = N_BUCKETS) -> Column:
    """Uniform bucket in [0, n_buckets) from md5(key || salt).

    Takes the top 8 hex digits (32 bits) of the md5 — DuckDB twin:
    ``('0x' || substr(md5(key || salt), 1, 8))::BIGINT % n_buckets``.
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(n_buckets)
    ).alias("bucket")


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign each row to a named split by cumulative bucket ranges.

    ``splits`` maps name → fraction (must sum to ≤ 1; remainder falls in
    the last split). Ranges are cumulative in the given order, e.g.
    ``{"train": .98, "valid": .01, "test": .01}`` → train = buckets
    [0, 9800), valid = [9800, 9900), test = [9900, 10000).
    """
    splits = splits or {"train": 0.98, "valid": 0.01, "test": 0.01}
    b = hash_bucket(key_col, salt)
    out = df.withColumn("bucket", b)
    edge = 0.0
    expr: Column | None = None
    names = list(splits)
    for name in names[:-1]:
        edge += splits[name]
        cond = F.col("bucket") < int(round(edge * N_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split_col = last if expr is None else expr.otherwise(names[-1])
    return out.withColumn("split", split_col)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum downsampling (``sampleBy`` without RNG).

    Keeps a row iff its hash bucket < fraction(stratum) · N_BUCKETS —
    e.g. rebalancing languages or sources in a training mix. Strata
    absent from ``fractions`` use ``default_fraction``.
    """
    thresholds = F.create_map(
        *[
            x
            for k, v in fractions.items()
            for x in (F.lit(k), F.lit(int(round(v * N_BUCKETS))))
        ]
    )
    thr = F.coalesce(
        thresholds[F.col(strata_col)],
        F.lit(int(round(default_fraction * N_BUCKETS))),
    )
    return df.withColumn("bucket", hash_bucket(key_col, salt)).where(
        F.col("bucket") < thr
    )


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    target_rows: int = 200,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted mixture sampling — the multinomial-mix step
    of multi-source/multi-lingual training recipes (e.g. the α-scaled
    sampling of mBERT/XLM-R and data-mix papers): stratum ``s`` gets an
    expected share ∝ ``n_s^alpha`` of ``target_rows``, flattening the
    head and up-weighting the tail as ``alpha`` → 0. Selection is the
    same deterministic md5 bucketing as :func:`hash_split` (no RNG), so
    the sample is reproducible across engines and repartitions.

    Per-stratum keep probability: ``p_s = target·w_s / (Σw·n_s)`` with
    ``w_s = floor(n_s^alpha·1e6 + .5)`` held in exact fixed point so the
    weight SUM is order-independent; the final ratio→threshold step runs
    in double space (products of exact integers, then one division —
    deterministic IEEE, same expression in the oracle). ``alpha=0.5``
    uses sqrt, which IEEE requires to be correctly rounded, making the
    fixed-point weights engine-exact; other alphas go through pow(),
    whose last-ulp behavior is implementation-defined — fine in one
    engine, but pin alpha=0.5 where cross-engine hash-exactness matters.

    Scale: one stratum-sized aggregate broadcast back onto a narrow
    filter — no full-data shuffle.

    Output: input columns + bucket + thr (kept rows only).
    """
    if alpha == 0.5:
        w_raw = F.sqrt(F.col("n_s").cast("double"))
    else:
        w_raw = F.pow(F.col("n_s").cast("double"), F.lit(alpha))
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_s"))
        .withColumn("w_e6", F.floor(w_raw * F.lit(1e6) + F.lit(0.5)).cast("long"))
    )
    tot = counts.agg(F.sum("w_e6").alias("sum_w"))
    thr = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "thr",
            F.least(
                F.lit(N_BUCKETS).cast("long"),
                F.floor(
                    F.lit(float(target_rows)) * F.col("w_e6").cast("double")
                    / (F.col("sum_w").cast("double") * F.col("n_s").cast("double"))
                    * F.lit(float(N_BUCKETS))
                ).cast("long"),
            ),
        )
        .select(strata_col, "thr")
    )
    return (
        df.withColumn("bucket", hash_bucket(key_col, salt))
        .join(F.broadcast(thr), strata_col)
        .where(F.col("bucket") < F.col("thr"))
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    shard_size: int = 1000,
    bucket_hex: int = 3,
) -> DataFrame:
    """Reproducible global shuffle + fixed-size sharding — the step that
    randomizes example order before packing/training and assigns each
    row to an output shard, with NO RNG (md5 order) so the exact same
    permutation falls out on any engine, any partitioning, any rerun.

    The global rank is computed with the scalable TWO-PASS pattern, not
    a single-partition window (which would serialize 100 TB through one
    task): rows bucket by the first ``bucket_hex`` hex chars of their
    md5; pass 1 counts rows per bucket and prefix-sums the counts into
    bucket offsets (a bounded, 16^bucket_hex-row table — the only
    single-partition step); pass 2 ranks within each bucket by (md5,
    key) under a hash-partitioned window and adds the broadcast offset.
    Because the bucket is a prefix of the ordering key, bucket-then-md5
    order IS global md5 order.

    Output: input columns + shuffle_rank (0-based global), shard_id,
    idx_in_shard.
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    b = df.withColumn("__h", h).withColumn(
        "__bucket", F.conv(F.substring("__h", 1, bucket_hex), 16, 10).cast("long")
    )
    counts = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    # bounded table (<= 16^bucket_hex rows): the exclusive prefix sum may
    # run in one task without ever touching full-data scale
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__bucket").orderBy(F.col("__h").asc(), key.asc())
    ranked = (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "shuffle_rank",
            (F.row_number().over(w_in) - 1 + F.col("__off")).cast("long"),
        )
        .drop("__h", "__bucket", "__off")
    )
    return ranked.withColumn(
        "shard_id", (F.col("shuffle_rank") / shard_size).cast("long")
    ).withColumn(
        "idx_in_shard", (F.col("shuffle_rank") % shard_size).cast("long")
    )


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 50,
    salt: str = "",
) -> DataFrame:
    """Weighted random sampling without replacement — and without RNG:
    the Efraimidis-Spirakis A-Res scheme (priority = u^(1/w), keep the
    top k) with the uniform u derived from md5(key||salt), so the
    sample is reproducible across engines, partitionings, and reruns,
    and inclusion probability still scales with weight.

    u = (60-bit md5 int + 1) / 2^60  ∈ (0, 1]; the priority is computed
    as exp(ln(u)/w) — written identically in the SQL oracle — and
    e6-floored for the rank so ordering is engine-exact (ties break on
    the key). Rows with weight <= 0 are excluded, loudly documented
    rather than silently ranked (ln(u)/w would flip sign).

    Scale: one narrow projection + a global top-k (orderBy+limit =
    TakeOrderedAndProject — per-partition heaps, never a full sort) +
    a k-row rank window. Output: key, weight, pri_e6, rk.
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    w = F.col(weight_col).cast("double")
    from modeltracking_spark.operators.dedup import token_hash60

    u = (
        (token_hash60(F.concat(key.cast("string"), F.lit(salt))) + F.lit(1))
        .cast("double") / F.lit(float(1 << 60))
    )
    pri_e6 = F.floor(F.exp(F.log(u) / w) * F.lit(1e6) + F.lit(0.5)).cast("long")
    ranked = (
        df.where(w > 0)
        .select(key.alias("key"), w.alias("weight"), pri_e6.alias("pri_e6"))
        .orderBy(F.col("pri_e6").desc(), F.col("key").asc())
        .limit(k)
    )
    # rank window over the k-row result only (bounded)
    wk = Window.orderBy(F.col("pri_e6").desc(), F.col("key").asc())
    return ranked.withColumn("rk", F.row_number().over(wk).cast("long"))
