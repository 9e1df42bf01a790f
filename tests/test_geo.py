"""F4-F8 geospatial functions (SURVEY.md §5.2 golden values)."""

import math

import pyspark.sql.functions as F

from modeltracking_spark.functions.geo import (
    euclid_deg,
    haversine_km,
    inv_square_weight,
    normalize_lon_0_360,
    vincenty_km_udf,
)


def test_lon_normalize_golden(spark):
    # the reference's own first track point: -19.4 -> 340.6
    # (al092016_track.csv:2 + trackplot_hycom.py:167-168)
    df = spark.createDataFrame(
        [(-19.4,), (340.6,), (0.0,), (-180.0,)], "lon double"
    ).select(normalize_lon_0_360("lon").alias("n"))
    assert [r["n"] for r in df.collect()] == [340.6, 340.6, 0.0, 180.0]


def test_haversine_equator_degree(spark):
    # 1 degree of longitude at the equator = R * pi/180 ~ 111.195 km
    df = spark.createDataFrame([(0.0, 0.0, 0.0, 1.0)], "a double, b double, c double, d double")
    got = df.select(haversine_km("a", "b", "c", "d").alias("km")).first()["km"]
    assert abs(got - 6371.0 * math.pi / 180) < 1e-6


def test_euclid_345(spark):
    df = spark.createDataFrame([(0.0, 0.0, 3.0, 4.0)], "a double, b double, c double, d double")
    assert df.select(euclid_deg("a", "b", "c", "d").alias("e")).first()["e"] == 5.0


def test_inv_square_weight_guard(spark):
    # epsilon guard: d=0 must not divide by zero (notebook :41)
    df = spark.createDataFrame([(0.0,), (2.0,)], "d double").select(
        inv_square_weight("d").alias("w")
    )
    w0, w2 = [r["w"] for r in df.collect()]
    assert w0 == 1.0 / (1e-6) ** 2 and abs(w2 - 0.25) < 1e-6


def test_vincenty_pinned_published_geodesics(spark):
    # Pinned against published WGS-84 geodesic lengths (independent of this
    # implementation): 1 deg of longitude on the equator = 111.319491 km,
    # 1 deg of meridian arc from the equator = 110.574389 km, and Vincenty's
    # classic Flinders Peak -> Buninyong test line = 54.972271 km. A wrong
    # ellipsoid / flattening / convergence bug shifts these by far more than
    # the 1 m tolerance, which the oracle's 0.6% haversine envelope could
    # otherwise absorb. Coincident points must be exactly 0 (no NaN).
    vin = vincenty_km_udf()
    df = spark.createDataFrame(
        [
            (0.0, 0.0, 0.0, 1.0, 111.319491),
            (0.0, 0.0, 1.0, 0.0, 110.574389),
            (-37.95103342, 144.42486789, -37.65282114, 143.92649553, 54.972271),
            (12.5, -19.4, 12.5, -19.4, 0.0),
        ],
        "la1 double, lo1 double, la2 double, lo2 double, want double",
    ).select("want", vin("la1", "lo1", "la2", "lo2").alias("v"))
    for r in df.collect():
        assert abs(r["v"] - r["want"]) < 1e-3, (r["want"], r["v"])


def test_vincenty_close_to_haversine(spark):
    # sphere-vs-ellipsoid delta < 0.6% (SURVEY F6)
    vin = vincenty_km_udf()
    df = spark.createDataFrame(
        [(12.5, -19.4, 13.0, -20.0), (30.0, 280.0, 31.0, 281.0)],
        "la1 double, lo1 double, la2 double, lo2 double",
    ).select(
        haversine_km("la1", "lo1", "la2", "lo2").alias("h"),
        vin("la1", "lo1", "la2", "lo2").alias("v"),
    )
    for r in df.collect():
        assert abs(r["v"] - r["h"]) / r["v"] < 0.006
