"""Mergeable frequency/cardinality sketches for corpus telemetry.

Extension surface (SURVEY.md §2.12 — no reference analog): the two
sketches a 100 TB token pipeline keeps beside its exact counters:

- Count-Min (Cormode & Muthukrishnan 2005): a depth×width counter grid;
  every occurrence increments one bucket per row, estimates are the MIN
  over rows — always an OVERestimate, with error ≤ εN at width ≈ e/ε.
  The grid is built by ONE (row, bucket)-grain aggregate (bounded
  depth·width groups, map-side combinable, mergeable across shards by
  plain addition) and broadcast back for probing.
- Linear probabilistic counting (Whang et al. 1990): distinct-count
  estimate from the occupancy of an m-bucket hash bitmap,
  n̂ = −m·ln(empty/m) — the bitmap is a bounded aggregate, mergeable
  by OR.

Both use the repo's portable md5 hashing (DuckDB's md5() == Spark's),
so — unlike HyperLogLog/approx_count_distinct, whose xxhash/dense-sparse
internals an oracle cannot replay — every estimate here is BIT-EXACTLY
reproducible in SQL, keeping the sketches inside the hash-match
correctness gate while remaining honest approximations of the exact
statistics they sit beside.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, salt: str, width: int) -> Column:
    """Portable uniform bucket: first 15 md5 hex digits (60 bits) of
    ``key || ':' || salt`` mod width — engine-identical. NULL keys hash
    as the sentinel string '__null__' (concat would otherwise propagate
    NULL, the probe's bucket would never equi-join the sketch's, and a
    NULL-keyed estimate would read 0 — an UNDERestimate, breaking the
    CMS contract)."""
    k = F.coalesce(key.cast("string"), F.lit("__null__"))
    h = F.md5(F.concat(k, F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(width)


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the Count-Min grid: (d, bucket, cnt) with one row per
    non-empty counter (≤ depth·width rows regardless of input size).
    Each input occurrence lands in exactly one bucket per sketch row
    (hash salted by the row index d)."""
    key = F.col(key_col)
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _bucket(key, str(d), width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("rb")
    )
    return rows.groupBy("rb.d", "rb.bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Probe the sketch: estimate(key) = min over rows d of the counter
    at (d, bucket_d(key)). The sketch is depth·width-bounded →
    broadcast; missing counters read as 0 (an empty bucket proves
    count 0). Output: probes' columns + est_cnt."""
    key = F.col(key_col)
    # __-prefixed internals so a probe frame carrying its own d/bucket/cnt
    # columns can never collide or bind ambiguously
    p = probes.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _bucket(key, str(d), width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("__rb"),
    ).select("*", F.col("__rb.d").alias("__d"), F.col("__rb.bucket").alias("__bucket")).drop("__rb")
    sk = sketch.select(
        F.col("d").alias("__d"),
        F.col("bucket").alias("__bucket"),
        F.col("cnt").alias("__cnt"),
    )
    joined = p.join(F.broadcast(sk), ["__d", "__bucket"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min(F.coalesce("__cnt", F.lit(0))).alias("est_cnt"))
    )


def linear_distinct_estimate(
    df: DataFrame, key_col: str, m: int = 4096
) -> DataFrame:
    """Linear-counting distinct estimate beside the exact count:
    occupancy V of an m-bucket hash bitmap gives n̂ = −m·ln((m−V)/m),
    e6-floored for engine exactness (ln mirrored in the oracle).
    One bounded aggregate; the bitmap merges across shards by OR
    (here: distinct buckets). Output: 1 row
    (n_exact, n_occupied, est_e6)."""
    b = df.select(_bucket(F.col(key_col), "lc", m).alias("b"),
                  F.col(key_col).alias("k"))
    agg = b.agg(
        F.count_distinct("k").alias("n_exact"),
        F.count_distinct("b").alias("n_occupied"),
    )
    est = (
        F.lit(0.0)
        - F.lit(float(m))
        * F.log((F.lit(m) - F.col("n_occupied")).cast("double") / F.lit(float(m)))
    )
    # a full bitmap (V == m) has no finite estimate — NULL, loudly, on
    # both engines rather than ln(0) = -inf arithmetic
    return agg.select(
        "n_exact",
        "n_occupied",
        F.when(F.col("n_occupied") >= m, F.lit(None).cast("long"))
        .otherwise(F.floor(est * F.lit(1e6) + F.lit(0.5)).cast("long"))
        .alias("est_e6"),
    )
