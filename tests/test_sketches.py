"""Sketch-tier tests (operators/sketches.py): Count-Min guarantees
(overestimate-only, exactness without collisions, mergeability by
addition) and linear-counting behavior incl. the full-bitmap guard."""

import math

import pyspark.sql.functions as F

from modeltracking_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
    linear_distinct_estimate,
)


def _counts(spark, rows):
    df = spark.createDataFrame([(k,) for k in rows], ["k"])
    tru = df.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    return df, tru


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    # zipf-ish: 50 keys, width 8 -> collisions guaranteed; width 4096 ->
    # effectively none, estimates must be EXACT
    rows = [f"k{i:02d}" for i in range(50) for _ in range(max(200 // (i + 1), 1))]
    df, tru = _counts(spark, rows)
    for width, exact in ((8, False), (4096, True)):
        sk = count_min_sketch(df, "k", depth=4, width=width)
        est = {
            r["k"]: (r["true_cnt"], r["est_cnt"])
            for r in cms_estimate(sk, tru, "k", depth=4, width=width).collect()
        }
        assert len(est) == 50
        assert all(e >= t for t, e in est.values())          # CMS guarantee
        if exact:
            assert all(e == t for t, e in est.values())
    # width 8 must actually show a collision on this data, or the
    # overestimate assertion above proved nothing
    sk8 = count_min_sketch(df, "k", depth=4, width=8)
    est8 = cms_estimate(sk8, tru, "k", depth=4, width=8)
    assert est8.where(F.col("est_cnt") > F.col("true_cnt")).count() > 0


def test_cms_sketch_is_bounded_and_mergeable(spark):
    rows = [f"u{i}" for i in range(300) for _ in range(3)]
    df, _ = _counts(spark, rows)
    # deterministic content split (limit() without ordering could pick
    # different rows across its two evaluations)
    parity = F.conv(F.substring(F.md5("k"), 1, 2), 16, 10).cast("long") % 2
    half1 = df.where(parity == 0)
    half2 = df.where(parity == 1)
    sk_all = count_min_sketch(df, "k", depth=4, width=32)
    assert sk_all.count() <= 4 * 32                      # bounded grid
    merged = (
        count_min_sketch(half1, "k", depth=4, width=32)
        .unionByName(count_min_sketch(half2, "k", depth=4, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r["d"], r["bucket"]): r["cnt"] for r in sk_all.collect()}
    b = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert a == b                                        # merge == rebuild


def test_linear_counting_formula_and_full_bitmap_guard(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(100)], ["k"])
    r = linear_distinct_estimate(df, "k", m=1024).collect()[0]
    assert r["n_exact"] == 100
    v = r["n_occupied"]
    assert 0 < v <= 100
    expect = math.floor(-1024.0 * math.log((1024 - v) / 1024.0) * 1e6 + 0.5)
    assert r["est_e6"] == expect
    # estimate within 15% of truth at this low occupancy
    assert abs(r["est_e6"] / 1e6 - 100) / 100 < 0.15
    # m=1: every key lands in bucket 0 -> full bitmap -> NULL, loudly
    r1 = linear_distinct_estimate(df, "k", m=1).collect()[0]
    assert r1["est_e6"] is None


def test_hist_quantiles_accuracy_and_edges(spark):
    import numpy as np

    from modeltracking_spark.operators.sketches import hist_quantiles

    vals = [float(x) for x in range(1000)]          # uniform 0..999
    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    out = {r["q_pct"]: r for r in hist_quantiles(df, "value").collect()}
    assert set(out) == {25, 50, 75}
    bin_w = (999.0 - 0.0) / 64
    for q in (25, 50, 75):
        exact = float(np.percentile(vals, q))
        est = out[q]["est_e6"] / 1e6
        assert abs(est - exact) <= bin_w + 1e-6     # within one bin width
        assert out[q]["n"] == 1000
    # constant column: everything lands in bin 0, estimate == the value
    cdf = spark.createDataFrame([(7.5,)] * 10, ["value"])
    cout = hist_quantiles(cdf, "value").collect()
    assert all(r["bin_idx"] == 0 and r["est_e6"] == 7500000 for r in cout)
    # empty input: no rows, not a crash
    edf = spark.createDataFrame([], "value double")
    assert hist_quantiles(edf, "value").count() == 0


def test_hist_quantiles_ignores_nulls(spark):
    from modeltracking_spark.operators.sketches import hist_quantiles

    # all-NULL input -> no rows (not n=0 garbage)
    nulls = spark.createDataFrame([(None,)] * 5, "value double")
    assert hist_quantiles(nulls, "value").count() == 0
    # mixed: NULLs excluded from n and from the top bin
    mixed = spark.createDataFrame(
        [(float(x),) for x in range(100)] + [(None,)] * 50, "value double"
    )
    out = hist_quantiles(mixed, "value").collect()
    assert all(r["n"] == 100 for r in out)


def test_hll_accuracy_and_correction_regimes(spark):
    """HLL relative error ~ 1.04/sqrt(4096) ≈ 1.6%: assert < 5% in the
    raw-estimate regime (n >> 2.5m threshold is not hit here since
    2.5m = 10240 — use n large enough to leave the correction) and
    < 5% in the small-range linear-counting regime."""
    from modeltracking_spark.operators.sketches import hll_distinct_estimate

    big = spark.range(60000).selectExpr(
        "concat('u', cast(id % 17000 as string)) AS k"
    )
    r = hll_distinct_estimate(big, "k").first()
    assert abs(r["est_e6"] / 1e6 - 17000) / 17000 < 0.05
    small = spark.range(300).selectExpr("cast(id as string) AS k")
    r2 = hll_distinct_estimate(small, "k").first()
    assert r2["n_exact"] == 300
    assert abs(r2["est_e6"] / 1e6 - 300) / 300 < 0.05


def test_hll_registers_merge_by_max(spark):
    """The mergeable-sketch contract: estimating the union equals
    estimating over max-merged registers — here proven end to end by
    the estimate over A ∪ B being identical to the estimate over the
    concatenated input (registers are max-aggregated either way), and
    insensitive to duplication."""
    from modeltracking_spark.operators.sketches import hll_distinct_estimate

    a = spark.range(5000).selectExpr("concat('a', cast(id as string)) AS k")
    b = spark.range(5000).selectExpr(
        "concat('a', cast((id + 2500) as string)) AS k"
    )  # overlaps a by half
    union = a.unionByName(b)
    doubled = union.unionByName(union)  # duplicates change nothing
    r1 = hll_distinct_estimate(union, "k").first()
    r2 = hll_distinct_estimate(doubled, "k").first()
    assert r1["est_e6"] == r2["est_e6"]
    assert r1["n_exact"] == 7500
    assert abs(r1["est_e6"] / 1e6 - 7500) / 7500 < 0.05


def test_hll_accepts_non_bare_column_names(spark):
    """ADVICE r7 #4 regression: the register expression is pure Column
    API now, so a column name that is not a bare SQL identifier (spaces,
    reserved word) estimates identically to its renamed twin."""
    from modeltracking_spark.operators.sketches import hll_distinct_estimate

    df = spark.range(500).selectExpr("cast(id % 137 as string) AS plain")
    want = hll_distinct_estimate(df, "plain").first()
    weird = df.withColumnRenamed("plain", "user id")
    got = hll_distinct_estimate(weird, "user id").first()
    assert tuple(got) == tuple(want)


def test_kmv_estimates_within_theory_error(spark):
    """KMV with k=64 has relative std error ~ 1/sqrt(k-2) ≈ 12.7%:
    three overlapping synthetic sets (known exact distinct / union /
    intersection counts) must estimate within 4 sigma, and the sketch
    arrays must be bounded at k."""
    from modeltracking_spark.operators.sketches import (
        kmv_pair_estimates,
        kmv_sketch,
    )

    rows = (
        [("a", i) for i in range(1000)]            # A = [0, 1000)
        + [("b", i) for i in range(600, 1800)]     # B = [600, 1800)
        + [("c", i) for i in range(5000, 5030)]    # C tiny: exact mode
    )
    df = spark.createDataFrame(rows, "g string, uid long")
    sk = kmv_sketch(df, "uid", "g", k=64)
    bounded = {r["g"]: (len(r["hs"]), r["n_sk"]) for r in sk.collect()}
    assert bounded["a"] == (64, 64) and bounded["b"] == (64, 64)
    assert bounded["c"] == (30, 30)  # exact mode keeps all 30

    est = {
        (r["g_a"], r["g_b"]): r
        for r in kmv_pair_estimates(sk, k=64).collect()
    }
    ab = est[("a", "b")]
    tol = 4 / math.sqrt(62)  # 4 sigma
    assert abs(ab["est_a_e6"] / 1e6 - 1000) <= 1000 * tol
    assert abs(ab["est_b_e6"] / 1e6 - 1200) <= 1200 * tol
    assert abs(ab["est_union_e6"] / 1e6 - 1800) <= 1800 * tol
    # intersection error scales with the UNION size under theta-min
    assert abs(ab["est_inter_e6"] / 1e6 - 400) <= 1800 * tol
    # exact-mode pair: C disjoint from A -> intersection exactly 0,
    # and A-C union estimate = est(A) + 30 exactly (theta_min picks
    # A's threshold; C's 30 hashes are a complete set)
    ac = est[("a", "c")]
    assert ac["n_common_below_theta"] == 0 and ac["est_inter_e6"] == 0
    assert ac["est_b_e6"] == 30 * 1_000_000


def test_kmv_union_estimate_equals_sketch_of_union(spark):
    """Mergeability: the union estimator over two sketches must equal
    the estimate from sketching the concatenated input directly —
    'k smallest of union of k-smallest' == 'k smallest of union'."""
    from modeltracking_spark.operators.sketches import (
        kmv_pair_estimates,
        kmv_sketch,
    )

    rows_a = [("a", i * 7 + 1) for i in range(900)]
    rows_b = [("b", i * 11 + 3) for i in range(700)]
    df = spark.createDataFrame(rows_a + rows_b, "g string, uid long")
    merged = spark.createDataFrame(
        [("m", uid) for _, uid in rows_a + rows_b], "g string, uid long"
    )
    pair = kmv_pair_estimates(kmv_sketch(df, "uid", "g", k=64), k=64)
    direct = kmv_sketch(merged, "uid", "g", k=64)
    got = pair.collect()[0]["est_union_e6"]
    r = direct.collect()[0]
    want_theta = r["theta"]
    want = (
        r["n_sk"] * 1_000_000 if want_theta == 1 << 60
        else math.floor((63.0 * float(1 << 60) / want_theta) * 1e6 + 0.5)
    )
    assert got == want
