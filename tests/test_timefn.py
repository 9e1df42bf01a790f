"""F1/F2/F3/F9 time-epoch conversions (SURVEY.md §5.3 property tests)."""

import pyspark.sql.functions as F

from modeltracking_spark.functions.timefn import (
    format_ymdh,
    hours_since_2000,
    parse_ymdh,
    ts_from_hours_since_2000,
)


def test_known_hours_value(spark):
    # 2016-08-17 18:00 UTC (al092016_track.csv:2): 6073 days since
    # 2000-01-01 (datetime-verified), * 24 + 18
    df = spark.range(1).select(
        hours_since_2000(parse_ymdh(F.lit("2016081718"))).alias("h")
    )
    assert df.first()["h"] == 6073 * 24 + 18


def test_roundtrip_identity_f1_f2(spark):
    # F1 ∘ F2 = id over a dense range of hour offsets (SURVEY §5.3)
    df = spark.range(0, 200000, 977).select(
        F.col("id").alias("h"),
        hours_since_2000(ts_from_hours_since_2000(F.col("id"))).alias("h2"),
    )
    assert df.where(F.col("h") != F.col("h2")).count() == 0


def test_format_parse_roundtrip(spark):
    df = spark.range(0, 100000, 3331).select(
        format_ymdh(ts_from_hours_since_2000(F.col("id"))).alias("s")
    )
    back = df.select(hours_since_2000(parse_ymdh("s")).alias("h"))
    vals = [r["h"] for r in back.collect()]
    assert vals == list(range(0, 100000, 3331))


def test_epoch_anchor(spark):
    df = spark.range(1).select(
        hours_since_2000(F.lit("2000-01-01 00:00:00").cast("timestamp")).alias("h0"),
        hours_since_2000(F.lit("2000-01-01 01:00:00").cast("timestamp")).alias("h1"),
        hours_since_2000(F.lit("1999-12-31 23:00:00").cast("timestamp")).alias("hneg"),
    )
    r = df.first()
    assert (r["h0"], r["h1"], r["hneg"]) == (0, 1, -1)
