"""Figure-feeder utilities (SURVEY.md §2.1 S8 — out-of-engine scope).

The reference renders scatter/contour panels and saves ``fig_test.png``
(``trackplot_hycom.py:266-305``). In this engine plotting stays OUT of
the distributed plan: the engine's contract is the small, plot-ready
result table; these helpers are the only sanctioned ``toPandas()`` in
the repo (driver-side, result-sized data only).

matplotlib is not in this container: ``render_profile_png`` gates the
import and raises with a clear message, while the frame feeders are
fully functional and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modeltracking_spark.functions.timefn import ts_from_hours_since_2000


def profile_plot_frame(profile: DataFrame, track: DataFrame):
    """The reference's plot-ready long triples (``trackplot_hycom.py:
    253-255``): (plot_time, plot_depth, value) with depth negated for
    display (F5) and the hour offset rendered as a timestamp (F9).

    Joins the per-point profile back to the track for the time axis and
    collects to pandas — profiles are n_points x k_depths rows (2000
    here), strictly driver-sized.
    """
    t = track.select("point_id", "t_hours")
    j = profile.join(F.broadcast(t), "point_id").select(
        ts_from_hours_since_2000("t_hours").alias("plot_time"),
        (F.lit(0.0) - F.col("depth_m")).alias("plot_depth"),
        F.col("idw_value").alias("value"),
    )
    return j.toPandas()


def track_map_frame(track: DataFrame):
    """Track map panel feeder: (lat, lon) in plot order plus the bbox the
    reference frames the map with (``trackplot_hycom.py:236-237``,
    ``:281``). Returns (pandas_frame, (lat_min, lat_max, lon_min,
    lon_max))."""
    pdf = (
        track.orderBy("point_id")
        .select("point_id", "lat", "lon")
        .toPandas()
    )
    return pdf, (
        float(pdf["lat"].min()),
        float(pdf["lat"].max()),
        float(pdf["lon"].min()),
        float(pdf["lon"].max()),
    )


def render_profile_png(profile: DataFrame, track: DataFrame, out_path: str) -> str:
    """Render the profile scatter panel to PNG (the ``fig_test.png``
    twin). Requires matplotlib — not in this container, so this raises
    ``NotImplementedError`` at the exact plug-in point."""
    try:
        import matplotlib  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without matplotlib
        raise NotImplementedError(
            "matplotlib not available in this container; "
            "profile_plot_frame() provides the plot-ready pandas frame"
        ) from exc
    import matplotlib.pyplot as plt  # pragma: no cover

    pdf = profile_plot_frame(profile, track)  # pragma: no cover
    fig, ax = plt.subplots(figsize=(10, 5))  # pragma: no cover
    sc = ax.scatter(pdf["plot_time"], pdf["plot_depth"], c=pdf["value"])  # pragma: no cover
    fig.colorbar(sc, ax=ax)  # pragma: no cover
    fig.savefig(out_path)  # pragma: no cover
    return out_path  # pragma: no cover
