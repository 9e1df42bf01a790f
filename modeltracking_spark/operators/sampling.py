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
