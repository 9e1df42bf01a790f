"""Loader-vs-testdata contract: guard against physical-encoding drift.

Round 4 regression: the driver's events.parquet flipped TIMESTAMP(NANOS)
-> timestamp[us] between rounds and the loaders (batch + stream) kept
assuming nanos — one threw AnalysisException, the other silently produced
epochs 1000x too small. These tests read the parquet FOOTERS (what is
actually on disk right now) and assert the loaders handle them, so the
next drift fails here before the driver sees it.
"""

import datetime

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from modeltracking_spark.schemas import (
    TESTDATA_TABLES,
    events_ts_physical_type,
    load_table,
)
from modeltracking_spark.streaming.windows import read_events_stream
from tests.conftest import SF0001


def test_every_table_loads_with_documented_columns(spark):
    """Each footer's columns must load; loader output must cover them."""
    for t in TESTDATA_TABLES:
        footer_cols = set(pq.read_schema(f"{SF0001}/{t}.parquet").names)
        df = load_table(spark, SF0001, t)
        assert footer_cols == set(df.columns), t


def test_events_ts_loads_as_timestamp_with_sane_epoch(spark):
    """Catches BOTH r4 failure modes: the loader must produce a timestamp
    dtype (not raw long -> loud AnalysisException downstream) AND the
    values must sit in the generator's era (a silent /1000 or *1000 slip
    lands decades away from 2024)."""
    assert events_ts_physical_type(SF0001) in ("timestamp", "int64")
    df = load_table(spark, SF0001, "events")
    assert isinstance(df.schema["ts"].dataType, (TimestampType, TimestampNTZType))
    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    assert datetime.datetime(2020, 1, 1) <= lo <= hi <= datetime.datetime(2035, 1, 1)


def test_events_stream_schema_matches_batch(spark, tmp_path):
    """The stream loader's declared schema must agree with the batch
    loader on every column, and its micro-batch values must equal the
    batch values exactly (r4's silent 1000x-small epochs died here)."""
    batch = load_table(spark, SF0001, "events")
    stream = read_events_stream(spark, SF0001)
    assert [(f.name, f.dataType) for f in stream.schema.fields] == [
        (f.name, f.dataType) for f in batch.schema.fields
    ]
    q = (
        stream.writeStream.format("memory")
        .queryName("contract_events_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.table("contract_events_stream").agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    want = batch.agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    assert (got.n, got.lo, got.hi) == (want.n, want.lo, want.hi)


@pytest.mark.parametrize("table,col", [("orders", "o_orderdate"), ("lineitem", "l_shipdate")])
def test_date_columns_are_timestamps(spark, table, col):
    df = load_table(spark, SF0001, table)
    assert isinstance(df.schema[col].dataType, (TimestampType, TimestampNTZType))


def test_legacy_nanos_file_takes_int64_branch(spark, tmp_path):
    """A TIMESTAMP(NANOS) parquet surfaces in pyarrow as timestamp[ns] —
    still a timestamp type — and MUST be classified as legacy int64 so
    the nanosAsLong rebuild path runs (review finding: is_timestamp
    alone routed nanos files to the micros branch, which Spark 4 fails
    to read)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    df = pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:01.5", "2024-01-02 00:00:00.0"]
            ),
            "user_id": [1, 2],
            "event_type": ["a", "b"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    schema = pa.schema(
        [
            pa.field("event_id", pa.int64()),
            pa.field("ts", pa.timestamp("ns")),
            pa.field("user_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("value", pa.float64()),
            pa.field("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False).cast(schema),
        f"{d}/events.parquet",
        store_schema=False,
    )
    assert events_ts_physical_type(d) == "int64"
    got = load_table(spark, d, "events")
    rows = {r["event_id"]: r["ts"] for r in got.select("event_id", "ts").collect()}
    assert rows[0] == datetime.datetime(2024, 1, 1, 0, 0, 1, 500000)
    assert rows[1] == datetime.datetime(2024, 1, 2)
