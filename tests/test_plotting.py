"""S8 figure-feeder: plot-ready frames are driver-sized and correctly
shaped; the render step is an explicit gated stub without matplotlib."""

import pytest

from modeltracking_spark.fixtures import hycom_grid_fixture
from modeltracking_spark.operators.profile import profile_along_track
from modeltracking_spark.plotting import (
    profile_plot_frame,
    render_profile_png,
    track_map_frame,
)
from modeltracking_spark.queries.timegeo import synthetic_track


@pytest.fixture(scope="module")
def profile(spark):
    return profile_along_track(
        synthetic_track(spark), hycom_grid_fixture(spark), "water_temp", 25
    )


def test_profile_plot_frame_shape(spark, profile):
    pdf = profile_plot_frame(profile, synthetic_track(spark))
    assert len(pdf) == 2000
    assert list(pdf.columns) == ["plot_time", "plot_depth", "value"]
    assert (pdf["plot_depth"] <= 0).all()  # F5: negated for display
    assert pdf["plot_time"].dt.year.min() == 2000  # hour offsets from epoch


def test_track_map_frame_bbox(spark):
    pdf, (lat_min, lat_max, lon_min, lon_max) = track_map_frame(
        synthetic_track(spark)
    )
    assert len(pdf) == 80
    assert (lat_min, lat_max) == (15.0, 15.0 + 79 * 0.25)
    assert lon_min < lon_max


def test_render_is_gated_without_matplotlib(spark, profile, tmp_path):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib present; render would run for real")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        render_profile_png(profile, synthetic_track(spark), str(tmp_path / "f.png"))
