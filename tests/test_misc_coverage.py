"""Odds and ends the inventory promises: IBTrACS 16-col layout,
approx_count_distinct sanity, sal..."""

import os

import pyspark.sql.functions as F
import pytest

from modeltracking_spark.schemas import load_table
from modeltracking_spark.sources.tracks import read_ibtracs_track
from tests.conftest import REF_DIR, SF001

SANDY = f"{REF_DIR}/Hurricanefiles/Sandy_track.csv"


@pytest.mark.skipif(not os.path.exists(SANDY), reason="reference fixtures absent")
def test_ibtracs_16_column_layout(spark):
    # the wide IBTrACS layout the reference could never load (SURVEY §1.3)
    df = read_ibtracs_track(spark, SANDY, wide=True)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["t_hours"] is not None for r in rows)
    assert all(0.0 <= r["lon"] < 360.0 for r in rows)


def test_approx_count_distinct_sanity(spark):
    # §2.5: approx_count_distinct within 5% of exact (not oracle-able —
    # HLL implementations differ across engines — so asserted here)
    e = load_table(spark, SF001, "events")
    r = e.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
    ).first()
    assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05
