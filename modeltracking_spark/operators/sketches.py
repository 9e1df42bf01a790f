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
    count 0). Output: probes' columns + est_cnt.

    ``probes`` must be row-distinct: the final aggregate groups by ALL
    of probes' columns, so duplicate probe rows collapse to one output
    row (a multiset probe gets fewer rows back than it passed in). A
    caller probing a multiset should carry its own monotonic row id
    (``F.monotonically_increasing_id()``) as an extra probe column —
    then every input row keys its own group and survives."""
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


def hist_quantiles(
    df: DataFrame, val_col: str, qs_num: tuple[int, ...] = (25, 50, 75),
    n_bins: int = 64,
) -> DataFrame:
    """Histogram-based approximate quantiles — the mergeable, bounded
    stand-in for t-digest/approx_percentile that a 100 TB profiling pass
    keeps beside exact percentiles (whose full sort/shuffle it avoids):
    one 1-row min/max aggregate broadcast back, one bounded n_bins
    count aggregate (mergeable by addition), then the quantile is the
    LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q·n/100) — a deterministic integer rule, no interpolation, so
    the whole estimate replays exactly in SQL. Error ≤ one bin width.

    Output: one row per requested q: (q_pct, n, bin_idx, est_e6) with
    est_e6 = e6-floored bin lower edge; an empty input yields no rows.
    """
    v = F.col(val_col).cast("double")
    # NULL measures carry no quantile information and would otherwise
    # land in a bin (least() skips NULLs) — and an all-NULL input must
    # yield no rows, not n=0 garbage rows
    df = df.where(v.isNotNull())
    mm = df.agg(
        F.min(v).alias("__mn"), F.max(v).alias("__mx"),
        F.count(v).alias("__n"),
    )
    b = df.crossJoin(F.broadcast(mm)).select(
        F.when(
            F.col("__mx") > F.col("__mn"),
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (v - F.col("__mn"))
                    / ((F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins)))
                ).cast("int"),
            ),
        ).otherwise(F.lit(0)).alias("__bin")
    )
    counts = b.groupBy("__bin").agg(F.count(F.lit(1)).alias("__c"))
    from pyspark.sql import Window

    # bounded n_bins table: the cumulative window is the only serial step
    cum = counts.withColumn(
        "__cum",
        F.sum("__c").over(
            Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qrows = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in qs_num])).alias("q_pct")
    )
    hit = (
        qrows.crossJoin(F.broadcast(cum))
        .crossJoin(F.broadcast(mm))
        .where(F.col("__cum") * 100 >= F.col("q_pct") * F.col("__n"))
        .groupBy("q_pct")
        .agg(
            F.first("__n").alias("n"),
            F.min("__bin").cast("long").alias("bin_idx"),
            F.first("__mn").alias("__mn"),
            F.first("__mx").alias("__mx"),
        )
    )
    edge = F.col("__mn") + F.col("bin_idx").cast("double") * (
        (F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins))
    )
    return hit.select(
        F.col("q_pct").cast("long").alias("q_pct"),
        "n",
        "bin_idx",
        F.floor(edge * F.lit(1e6) + F.lit(0.5)).cast("long").alias("est_e6"),
    )


def hll_distinct_estimate(df: DataFrame, key_col: str) -> DataFrame:
    """HyperLogLog distinct estimate (Flajolet et al. 2007) beside the
    exact count — the log-space big sibling of
    :func:`linear_distinct_estimate`: m = 4096 registers, register j =
    max over keys in bucket j of (leading zero BITS of the hash suffix
    + 1), estimate = alpha_m * m^2 / sum(2^-reg) with the small-range
    linear-counting correction.

    Engine-exactness discipline: the bucket is the first 3 md5 hex
    digits; rho comes from STRING arithmetic on the next 13 hex digits
    (leading-zero hex digits x4 + a 16-way CASE for the first nonzero
    digit) — no float log2 whose last-ulp could flip a floor; the
    harmonic sum is EXACT (2^(64-reg) summed as DECIMAL(38,0) — every
    term a power of two, max 4096 * 2^64 < 10^38) and only the final
    division runs in mirrored doubles. The registers merge across
    shards by max — the standard mergeable-sketch contract. Output:
    1 row (n_exact, n_occupied, est_e6)."""
    m = 4096
    key = F.col(key_col)
    k = F.coalesce(key.cast("string"), F.lit("__null__"))
    h = F.md5(F.concat(k, F.lit(":hll")))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("long")
    sub = F.substring(h, 4, 13)
    lz = F.length(F.regexp_extract(sub, "^(0*)", 1))
    # first nonzero hex digit after the zeros — derived from the SAME
    # Column expressions as h/sub/lz (ADVICE r7 #4: the old F.expr
    # rebuild string-formatted the raw column name into SQL, breaking on
    # non-bare identifiers and duplicating the hash definition)
    first = F.substr(sub, lz + F.lit(1), F.lit(1))
    in_first = (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
        .when(first.isin("4", "5", "6", "7"), 1)
        .when(first.isin("2", "3"), 2)
        .otherwise(3)
    )
    rho = F.when(lz == 13, F.lit(53)).otherwise(lz * 4 + in_first + 1)
    regs = (
        df.select(bucket.alias("b"), rho.alias("rho"), key.alias("k"))
        .groupBy("b")
        .agg(F.max("rho").alias("reg"))
    )
    spine = df.sparkSession.range(m).select(F.col("id").alias("b"))
    full = spine.join(regs, "b", "left").select(
        F.coalesce("reg", F.lit(0)).alias("reg")
    )
    agg = full.agg(
        F.sum(
            F.pow(F.lit(2.0), (F.lit(64) - F.col("reg")).cast("double"))
            .cast("decimal(38,0)")
        ).alias("S"),
        F.sum((F.col("reg") == 0).cast("long")).alias("V"),
    )
    exact = df.agg(F.count_distinct(key).alias("n_exact"))
    est_raw = (
        F.lit(0.7213 / (1.0 + 1.079 / 4096.0))
        * F.lit(4096.0) * F.lit(4096.0) * F.lit(18446744073709551616.0)
        / F.col("S").cast("double")
    )
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (F.col("V") > 0),
        F.lit(4096.0) * F.log(F.lit(4096.0) / F.col("V").cast("double")),
    ).otherwise(est_raw)
    return exact.crossJoin(F.broadcast(agg)).select(
        "n_exact",
        (F.lit(m) - F.col("V")).cast("long").alias("n_occupied"),
        F.floor(est * F.lit(1e6) + F.lit(0.5)).cast("long").alias("est_e6"),
    )


# --------------------------------------------------------- KMV / theta


_KMV_MAX_H = 1 << 60  # hashes live in [0, 2^60); "theta = 2^60" = exact mode


def kmv_sketch(
    df: DataFrame, key_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """KMV / bottom-k theta sketch per group (Bar-Yossef et al. 2002;
    the k-minimum-values form of the theta sketch family): keep the k
    SMALLEST distinct 60-bit hashes of the keys in each group.

    Unlike HLL, KMV sketches support SET OPERATIONS — union AND
    intersection estimates between groups (:func:`kmv_pair_estimates`)
    — because each sketch is a uniform hash SAMPLE of its set below a
    per-sketch threshold theta, not a lossy register array.

    Scale shape: one ``distinct`` shuffle at (group, hash) grain, then
    a per-group sort-rank that keeps only k rows per group BEFORE any
    ``collect_list`` — Catalyst turns the rank filter into a
    WindowGroupLimit, discarding beyond-k rows per PARTITION before
    the group exchange (plan-asserted in test_scale_plans.py), so the
    collected arrays are bounded at k elements regardless of input
    size, and sketches merge across shards by "k smallest of the
    union" (attested by the union estimator).
    Portable md5 hashing keeps every estimate bit-replayable in SQL
    (the sketches.py discipline).

    Output: (group, hs array<long> ascending ≤ k, n_sk, theta) where
    theta = k-th smallest hash in estimation mode, 2^60 when the group
    held fewer than k distinct keys (exact mode)."""
    from pyspark.sql import Window

    key = F.coalesce(F.col(key_col).cast("string"), F.lit("__null__"))
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(":kmv"))), 1, 15), 16, 10
    ).cast("long")
    d = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    topk = d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return topk.groupBy("g").agg(
        F.array_sort(F.collect_list("h")).alias("hs"),
        F.count("*").alias("n_sk"),
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("h"))),
            F.lit(_KMV_MAX_H),
        ).alias("theta"),
    )


def kmv_pair_estimates(sk: DataFrame, k: int = 64) -> DataFrame:
    """Distinct / union / intersection estimates for every group pair
    from :func:`kmv_sketch` output.

    Standard theta-sketch combinators, all on the bounded per-group
    arrays (the pair table is |groups|² rows of ≤ k-element arrays —
    tiny by construction; at scale you broadcast the sketch table and
    request only the pairs you need):

    - per-set:      est = (k-1) / (theta / 2^60); exact n when n < k
    - union:        k smallest of the merged arrays, same estimator
    - intersection: theta* = min(theta_a, theta_b); count common
                    hashes below theta*, scale by 2^60 / theta*

    Estimates are emitted as e6-scaled integers via mirrored double
    arithmetic (the chi2 FLOOR(x*1e6+0.5) discipline) so the oracle —
    a pure window-function SQL replay with NO list functions, a fully
    independent relational path — hash-matches bit for bit."""
    a = sk.select(
        F.col("g").alias("g_a"), F.col("hs").alias("hs_a"),
        F.col("n_sk").alias("n_a"), F.col("theta").alias("th_a"),
    )
    b = sk.select(
        F.col("g").alias("g_b"), F.col("hs").alias("hs_b"),
        F.col("n_sk").alias("n_b"), F.col("theta").alias("th_b"),
    )
    pairs = F.broadcast(a).join(F.broadcast(b), F.col("g_a") < F.col("g_b"))

    def est_e6(n, theta, kk):
        # exact below k; (k-1)/theta-normalized above — mirrored doubles
        return F.when(
            theta == _KMV_MAX_H, n.cast("long") * F.lit(1_000_000)
        ).otherwise(
            F.floor(
                (F.lit(float(kk - 1)) * F.lit(float(_KMV_MAX_H))
                 / theta.cast("double")) * F.lit(1e6) + F.lit(0.5)
            ).cast("long")
        )

    merged = F.slice(
        F.array_sort(F.array_union("hs_a", "hs_b")), 1, k
    )
    n_u = F.size(merged)
    th_u = F.when(
        n_u == k, F.element_at(merged, k)
    ).otherwise(F.lit(_KMV_MAX_H))
    th_min = F.least("th_a", "th_b")
    n_common = F.size(
        F.filter(
            F.array_intersect("hs_a", "hs_b"),
            lambda x: x < th_min,
        )
    )
    inter_e6 = F.when(
        th_min == _KMV_MAX_H, n_common.cast("long") * F.lit(1_000_000)
    ).otherwise(
        F.floor(
            (n_common.cast("double") * F.lit(float(_KMV_MAX_H))
             / th_min.cast("double")) * F.lit(1e6) + F.lit(0.5)
        ).cast("long")
    )
    return pairs.select(
        "g_a", "g_b",
        est_e6(F.col("n_a"), F.col("th_a"), k).alias("est_a_e6"),
        est_e6(F.col("n_b"), F.col("th_b"), k).alias("est_b_e6"),
        est_e6(n_u, th_u, k).alias("est_union_e6"),
        inter_e6.alias("est_inter_e6"),
        n_common.cast("long").alias("n_common_below_theta"),
    )
