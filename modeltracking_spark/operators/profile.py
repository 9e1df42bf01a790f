"""The track x grid depth-profile pipeline — the reference's raison
d'etre (SURVEY.md §7.6), composed from the join/aggregate layers:

snap (J1) -> 3x3 expand (J2) -> nearest-time bucket (J3 regular-axis
route) -> sentinel mask (P3) -> IDW weights (F8) -> weighted mean (A2)
-> depth truncation (P5).

Reference: ``zip_variable3D`` + ``hycomScrubber`` + ``IDW_Slice_nc4``
(``trackplot_hycom.py:199-223``, ``:135-148``, ``:88-115``). The
reference re-opens the remote dataset and scans all grid nodes per track
point (N+1 loops); here the whole track resolves in ONE broadcast join
against the grid table:

- the track side (n_points x 9 neighbor keys) is tiny -> broadcast;
- the grid scan streams once; depth truncation and the time-bucket set
  push down as filters on grid columns;
- the IDW reduce is a map-side-combinable hash aggregate.

At 100 TB: grid partitioned by time_hours -> the time-bucket semi-join
prunes partitions; lat/lon bucketing co-locates the neighborhood join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modeltracking_spark.functions.geo import euclid_deg, inv_square_weight
from modeltracking_spark.operators.aggregates import mask_sentinel
from modeltracking_spark.operators.joins import neighborhood_expand


def nearest_time_bucket(t: F.Column, step: int) -> F.Column:
    """J3 (regular-axis route): nearest multiple of ``step`` via integer
    arithmetic — ``find_time_index`` (``trackplot_hycom.py:186-197``) for
    the 3-hourly HYCOM axis, no join needed. Exact half-step ties round
    forward (impossible for odd steps on integer inputs)."""
    return (
        F.floor((2 * t + F.lit(step)) / F.lit(2 * step)).cast("long") * step
    )


def profile_neighbors(
    track: DataFrame,
    grid: DataFrame,
    variable: str = "water_temp",
    k_depths: int = 25,
    lat0: float = 14.95,
    lat_step: float = 0.25,
    lon0: float = 279.85,
    lon_step: float = 0.6,
    time_step: int = 3,
    eps: float = 1e-6,
    radius: int = 1,
    carry_cols: Sequence[str] = (),
    track_col: str | None = None,
) -> DataFrame:
    """Per-neighbor rows for the IDW reduce: one row per (track point,
    depth level, 3x3 neighbor) with the masked value and IDW weight.

    ``track``: (point_id, lat, lon, t_hours); ``grid``: HYCOM long form.
    Returns point_id, depth_idx, depth_m, dist, w, v (NULL if sentinel),
    plus any ``carry_cols`` passed through from the grid (e.g. a
    ``variable`` label when the grid is unpivoted long-form).

    ``track_col`` is the FLEET shape (r8, mirroring
    :func:`resample_track_arclength`'s r7 ``track_col``): the id rides
    the broadcast side through the expand and join, so N storms profile
    in the SAME single grid scan + broadcast join — no per-track loop,
    and point_ids only need to be unique within a track.
    """
    tcols = [track_col] if track_col else []
    snapped = track.select(
        *tcols,
        "point_id",
        "lat",
        "lon",
        nearest_time_bucket(F.col("t_hours"), time_step).alias("t_sel"),
        F.round((F.col("lat") - F.lit(lat0)) / F.lit(lat_step))
        .cast("int")
        .alias("lat_idx"),
        F.round((F.col("lon") - F.lit(lon0)) / F.lit(lon_step))
        .cast("int")
        .alias("lon_idx"),
    )
    nb = neighborhood_expand(snapped, radius=radius).withColumnsRenamed(
        {"lat": "p_lat", "lon": "p_lon"}
    )
    g = grid.where(F.col("depth_idx") < k_depths).select(
        "time_hours",
        "depth_idx",
        "depth_m",
        F.col("lat_idx").alias("g_lat_idx"),
        F.col("lon_idx").alias("g_lon_idx"),
        F.col("lat").alias("g_lat"),
        F.col("lon").alias("g_lon"),
        F.col(variable).alias("__var"),
        *carry_cols,
    )
    j = g.join(
        F.broadcast(nb),
        (F.col("time_hours") == F.col("t_sel"))
        & (F.col("g_lat_idx") == F.col("nb_lat_idx"))
        & (F.col("g_lon_idx") == F.col("nb_lon_idx")),
    )
    d = euclid_deg("p_lat", "p_lon", "g_lat", "g_lon")
    return j.select(
        *tcols,
        "point_id",
        "depth_idx",
        "depth_m",
        d.alias("dist"),
        inv_square_weight(d, eps=eps).alias("w"),
        mask_sentinel("__var").alias("v"),
        *carry_cols,
    )


def profile_along_track(
    track: DataFrame,
    grid: DataFrame,
    variable: str = "water_temp",
    k_depths: int = 25,
    interp: str = "idw",
    track_col: str | None = None,
    **geometry,
) -> DataFrame:
    """Full pipeline -> long profile (point_id, depth_idx, depth_m,
    n_valid, idw_value): the engine twin of the reference's
    ``(time, depth, value)`` triples (``trackplot_hycom.py:217-223``).

    ``interp='idw'`` (default): 3x3 IDW — the reference's production
    path. ``interp='nearest'``: center-node value only, the cheap mode
    of the superseded ``tempcolumn_nc4`` (``trackplot_hycom.py:117-133``,
    SURVEY §2.10) — 1/9th the join fanout, n_valid ∈ {0, 1}.

    ``track_col=None`` is the single-track contract (one advisory
    track, the reference's shape). ``track_col="..."`` is the FLEET
    shape (VERDICT r7 item 8): the id becomes an extra broadcast-side
    key and group-by column, so a whole storm season profiles in ONE
    grid scan + broadcast join + hash aggregate — the plan is identical
    to the single-track plan, just with more (still tiny) broadcast
    rows; no window, no per-track loop, no shuffle beyond the one
    aggregate (plan-asserted in tests/test_scale_plans.py).

    Plain double Σwv/Σw for engine use; the oracle-checked query variant
    (``queries/track_q.py``) lifts the same rows to fixed point first.
    """
    keys = ([track_col] if track_col else []) + [
        "point_id", "depth_idx", "depth_m"
    ]
    if interp == "nearest":
        rows = profile_neighbors(
            track, grid, variable, k_depths, radius=0,
            track_col=track_col, **geometry
        )
        return rows.groupBy(*keys).agg(
            F.count("v").alias("n_valid"),
            F.first("v").alias("idw_value"),
        )
    if interp != "idw":
        raise ValueError(f"unknown interp {interp!r}")
    rows = profile_neighbors(
        track, grid, variable, k_depths, track_col=track_col, **geometry
    )
    valid_w = F.when(F.col("v").isNotNull(), F.col("w"))
    return rows.groupBy(*keys).agg(
        F.count("v").alias("n_valid"),
        (F.sum(valid_w * F.col("v")) / F.sum(valid_w)).alias("idw_value"),
    )


def resample_track_arclength(
    track: DataFrame, step_deg: float = 0.5, track_col: str | None = None
) -> DataFrame:
    """Resample a track at EQUAL ARC-LENGTH intervals — the
    regularization step before along-track profiling when input fixes
    are unevenly spaced (the reference consumes fixed advisory points;
    equal-arc resampling is what makes a distance axis honest).

    Distance metric is Euclidean-degree (the reference's
    location_to_index metric, functions/geo.py F7) ON PURPOSE: sqrt is
    IEEE-correctly-rounded, so — unlike a haversine chain — the whole
    cumulative-distance + linear-interpolation pipeline is
    engine-deterministic double arithmetic and hash-oracle-able.

    Pipeline: per-segment length (lag window) → running arc length
    (ordered window sum = sequential fold, identical in both engines)
    → target arcs k·step join onto their containing segment (range
    join against the segment table — track-sized, broadcast) → linear
    interpolation, e6-floored outputs.

    ``track_col=None`` is the single-track contract (one reference
    advisory track — the input is track-sized by construction).
    ``track_col="..."`` is the FLEET shape: every window and the
    per-track total partition on the track id, so a million tracks
    resample as a million independent hash-partitioned groups — no
    single-task global window anywhere in the plan (VERDICT r6 item 3).

    Output: ([track_col,] k, s_deg_e6, lat_e6, lon_e6).
    """
    from pyspark.sql import Window

    single = track_col is None
    tcol = "__track" if single else track_col
    if single:
        # one synthetic group: the partitioned-window fold over a single
        # constant partition is the same sequential double arithmetic as
        # a global ordered window, so the oracle stays bit-identical
        track = track.withColumn(tcol, F.lit(0).cast("long"))
    w = Window.partitionBy(tcol).orderBy("point_id")
    seg = (
        track.select(tcol, "point_id", "lat", "lon")
        .withColumn("lat0", F.lag("lat").over(w))
        .withColumn("lon0", F.lag("lon").over(w))
        .withColumn(
            "seg_len",
            F.sqrt(
                (F.col("lat") - F.col("lat0")) * (F.col("lat") - F.col("lat0"))
                + (F.col("lon") - F.col("lon0")) * (F.col("lon") - F.col("lon0"))
            ),
        )
        .withColumn(
            "cum1", F.sum("seg_len").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .where(F.col("lat0").isNotNull())
        .withColumn("cum0", F.col("cum1") - F.col("seg_len"))
    )
    total = seg.groupBy(tcol).agg(F.max("cum1").alias("__total"))
    targets = (
        total.select(
            tcol,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(F.col("__total") / F.lit(step_deg)).cast("int"),
                )
            ).alias("k"),
        )
        .withColumn("s", F.col("k").cast("double") * F.lit(step_deg))
    )
    # per-track range join: equi on the track id + containment on the arc.
    # Single-track (and any dimension-sized fleet): the segment side is
    # track-sized — broadcast. A huge fleet plans the same equi-join
    # hash-partitioned on the track id if the broadcast hint is dropped;
    # the containment predicate stays a post-join filter either way.
    hit = targets.alias("t").join(
        F.broadcast(seg).alias("g"),
        (F.col(f"t.{tcol}") == F.col(f"g.{tcol}"))
        & (F.col("t.s") >= F.col("g.cum0"))
        & (F.col("t.s") < F.col("g.cum1")),
    )
    frac = (F.col("t.s") - F.col("g.cum0")) / F.col("g.seg_len")
    e6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")
    out = hit.select(
        *([] if single else [F.col(f"t.{tcol}").alias(tcol)]),
        F.col("t.k").cast("long").alias("k"),
        e6(F.col("t.s")).alias("s_deg_e6"),
        e6(F.col("g.lat0") + frac * (F.col("g.lat") - F.col("g.lat0"))).alias(
            "lat_e6"
        ),
        e6(F.col("g.lon0") + frac * (F.col("g.lon") - F.col("g.lon0"))).alias(
            "lon_e6"
        ),
    )
    return out
