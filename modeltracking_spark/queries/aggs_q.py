"""Aggregate/window queries (SURVEY.md §2.5 A1-A4, §2.6 frames).

Doubles never survive an unordered sum: every aggregate is an exact
integer sum (fixed point), and derived doubles (slope, stddev) are
computed from those integers with deterministic IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modeltracking_spark.operators.aggregates import bounding_box
from modeltracking_spark.queries.common import rank_median_sql, T, cents, query
from modeltracking_spark.queries.timegeo import TRACK_SQL, synthetic_track


@query(
    "track_bounding_box",
    oracle=f"""
    WITH track AS ({TRACK_SQL})
    SELECT min(lat) AS lat_min, max(lat) AS lat_max,
           min(lon) AS lon_min, max(lon) AS lon_max
    FROM track
    """,
)
def track_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the track bounding box that frames the reference's map panel
    (``trackplot_hycom.py:236-237``). min/max of doubles are
    order-independent, so no fixed point is needed."""
    return bounding_box(synthetic_track(spark))


@query(
    "linear_fit_orders",
    oracle="""
    WITH pts AS (
      SELECT datediff('day', TIMESTAMP '2000-01-01', o_orderdate)::BIGINT AS x,
             round(o_totalprice)::BIGINT AS y
      FROM orders
    ), s AS (
      SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT n,
           (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE AS slope,
           (sy::DOUBLE - (n * sxy - sx * sy)::DOUBLE
              / (n * sxx - sx * sx)::DOUBLE * sx::DOUBLE) / n::DOUBLE AS intercept
    FROM s
    """,
)
def linear_fit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: least-squares slope/intercept (np.polyfit deg-1,
    ``TrackPlotter_Hycom.ipynb:427``) of order value vs day offset.

    regr_slope over doubles is order-dependent, so the normal equations
    are assembled from exact BIGINT sums (one map-side-combinable
    aggregate) and only the final division happens in double — identical
    in any engine, at any parallelism."""
    o = T(spark, sf_dir, "orders")
    x = F.datediff(F.col("o_orderdate"), F.lit("2000-01-01").cast("timestamp")).cast(
        "long"
    )
    y = F.round(F.col("o_totalprice")).cast("long")
    s = o.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select("n", slope.alias("slope"), intercept.alias("intercept"))


@query(
    "moving_frame_sums",
    oracle="""
    SELECT event_id, user_id,
           sum(round(value * 100)::BIGINT) OVER w::BIGINT AS frame_sum_cents,
           count(*) OVER w AS frame_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def moving_frame_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 frame spec: per-user trailing 3-row sum/count over the event
    stream (rowsBetween) — the moving-average building block, kept as
    exact integers."""
    e = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(cents("value")).over(w).alias("frame_sum_cents"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


@query(
    "event_type_stats",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*)::BIGINT AS n,
             sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
             sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)::BIGINT AS sumsq_cents
      FROM events GROUP BY 1
    )
    SELECT event_type, n, sum_cents, sumsq_cents,
           sqrt((n * sumsq_cents - sum_cents * sum_cents)::DOUBLE
                / (n * (n - 1))::DOUBLE) / 100.0 AS stddev_value
    FROM s
    """,
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count/sum/stddev per type with the variance assembled from exact
    integer moments (sample stddev; the built-in ``stddev`` accumulates
    doubles in shuffle order and cannot hash-match an oracle)."""
    e = T(spark, sf_dir, "events")
    v = cents("value")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).alias("sum_cents"),
        F.sum(v * v).alias("sumsq_cents"),
    )
    var = (
        F.col("n") * F.col("sumsq_cents") - F.col("sum_cents") * F.col("sum_cents")
    ).cast("double") / (F.col("n") * (F.col("n") - 1)).cast("double")
    return s.select(
        "event_type",
        "n",
        "sum_cents",
        "sumsq_cents",
        (F.sqrt(var) / 100.0).alias("stddev_value"),
    )


@query(
    "argmin_order_per_customer",
    oracle="""
    SELECT o_custkey,
           o_orderkey AS cheapest_orderkey,
           round(o_totalprice * 100)::BIGINT AS price_cents
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC) = 1
    """,
)
def argmin_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 argmin/min_by: each customer's cheapest order, tie-broken by
    orderkey — expressed as ``min_by`` over a (price, key) struct so the
    tie-break is explicit and engine-portable."""
    o = T(spark, sf_dir, "orders")
    pair = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.min_by(F.col("o_orderkey"), pair).alias("cheapest_orderkey"),
        F.min_by(cents("o_totalprice"), pair).alias("price_cents"),
    )


@query(
    "grouped_agg_median_prices",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             round(l_extendedprice * 100)::BIGINT AS cents
      FROM lineitem
    ),
    med AS (MED_SQL),
    n AS (SELECT flag, count(*)::BIGINT AS n_rows FROM v GROUP BY flag)
    SELECT m.flag, m.median, n.n_rows
    FROM med m JOIN n ON n.flag = m.flag
    """.replace("MED_SQL", rank_median_sql(
        "SELECT flag, cents FROM v", "flag", "cents", "median"
    )),
)
def grouped_agg_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-returnflag median price (integer cents) through a
    GROUPED_AGG pandas UDF — completing the Arrow UDF surface (scalar /
    mapInPandas / applyInPandas / WithState are covered elsewhere). The
    even-group median is the floored midpoint mean, so the value is
    integer-exact; the oracle replays it with two-pass rank arithmetic
    (the formulation that scales past UDF-sized groups — the trade-off
    is documented on the operator)."""
    from modeltracking_spark.operators.aggregates import exact_median_grouped

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), cents("l_extendedprice").alias("cents")
    )
    return exact_median_grouped(li, "flag", "cents")


@query(
    "profile_columns_lineitem",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           count(l_quantity)::BIGINT AS n_filled,
           count(DISTINCT l_quantity)::BIGINT AS n_distinct,
           min(l_quantity)::BIGINT::VARCHAR AS min_s,
           max(l_quantity)::BIGINT::VARCHAR AS max_s
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice_cents',
           count(l_extendedprice)::BIGINT,
           count(DISTINCT round(l_extendedprice * 100)::BIGINT)::BIGINT,
           min(round(l_extendedprice * 100)::BIGINT)::VARCHAR,
           max(round(l_extendedprice * 100)::BIGINT)::VARCHAR
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag',
           count(l_returnflag)::BIGINT,
           count(DISTINCT l_returnflag)::BIGINT,
           min(l_returnflag),
           max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate',
           count(l_shipdate)::BIGINT,
           count(DISTINCT l_shipdate)::BIGINT,
           min(l_shipdate)::VARCHAR,
           max(l_shipdate)::VARCHAR
    FROM lineitem
    """,
)
def profile_columns_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling (the engine-side ``df.summary()``): per-column
    filled-count / exact distinct / min / max for a mixed-type column
    set, computed in ONE aggregate pass (all 16 measures in a single
    agg — one scan, one shuffle) and unpivoted to long form with
    ``stack``. Numeric extremes render through exact integers (cents /
    bigint) because double→string shortest-decimal and scientific-
    notation thresholds differ across engines — the same rule the rest
    of the repo applies to double SUMS, applied here to RENDERING."""
    li = T(spark, sf_dir, "lineitem")
    price_c = cents("l_extendedprice")
    qty_i = F.col("l_quantity").cast("long")
    row = li.agg(
        F.count("l_quantity").alias("q_n"),
        F.count_distinct("l_quantity").alias("q_d"),
        F.min(qty_i).cast("string").alias("q_min"),
        F.max(qty_i).cast("string").alias("q_max"),
        F.count("l_extendedprice").alias("p_n"),
        F.count_distinct(price_c).alias("p_d"),
        F.min(price_c).cast("string").alias("p_min"),
        F.max(price_c).cast("string").alias("p_max"),
        F.count("l_returnflag").alias("r_n"),
        F.count_distinct("l_returnflag").alias("r_d"),
        F.min("l_returnflag").alias("r_min"),
        F.max("l_returnflag").alias("r_max"),
        F.count("l_shipdate").alias("s_n"),
        F.count_distinct("l_shipdate").alias("s_d"),
        F.min("l_shipdate").cast("string").alias("s_min"),
        F.max("l_shipdate").cast("string").alias("s_max"),
    )
    return row.selectExpr(
        "stack(4, "
        "'l_quantity', q_n, q_d, q_min, q_max, "
        "'l_extendedprice_cents', p_n, p_d, p_min, p_max, "
        "'l_returnflag', r_n, r_d, r_min, r_max, "
        "'l_shipdate', s_n, s_d, s_min, s_max"
        ") AS (col_name, n_filled, n_distinct, min_s, max_s)"
    )


@query(
    "ewma_user_values_events",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id, round(value * 100)::BIGINT AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events
    ),
    f AS (
      SELECT user_id, event_id, rn, cents, cents AS ewma
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.rn, e.cents,
             (e.cents + 3 * f.ewma) // 4
      FROM ev e JOIN f ON e.user_id = f.user_id AND e.rn = f.rn + 1
    )
    SELECT user_id, event_id, ewma AS ewma_cents FROM f
    """,
)
def ewma_user_values_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (alpha = 1/4) as the deterministic
    integer fold — every row's smoothed value depends on the user's
    whole prefix, which windowed aggregates cannot express; the oracle
    replays the recurrence with a recursive CTE (the adpcm sequential-
    state pattern). (user_id, ts) is unique in the events data, so the
    fold order is well-defined (pinned in tests/test_misc_coverage.py).
    One hash shuffle on user_id; the fold is an array expression over
    each user's bounded history (operators/aggregates.py:ewma_by_key)."""
    from modeltracking_spark.operators.aggregates import ewma_by_key

    ev = T(spark, sf_dir, "events")
    return ewma_by_key(
        ev, "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long"),
    )
