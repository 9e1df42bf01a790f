"""§2.11 Structured Streaming: the stream (memory sink, availableNow)
must produce exactly the batch twin's result."""

import pyspark.sql.functions as F

from modeltracking_spark.schemas import load_table
from modeltracking_spark.streaming.windows import (
    read_events_stream,
    run_stream_once,
    sliding_counts,
    tumbling_counts,
)
from tests.conftest import SF0001


def _norm(df):
    return {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in df.select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_cents",
        ).collect()
    }


def test_stream_tumbling_equals_batch(spark):
    stream = tumbling_counts(read_events_stream(spark, SF0001))
    got = _norm(run_stream_once(stream, "t_tumbling"))
    exp = _norm(tumbling_counts(load_table(spark, SF0001, "events")))
    assert got == exp and len(got) > 0


def test_stream_sliding_equals_batch(spark):
    stream = sliding_counts(read_events_stream(spark, SF0001))
    got = _norm(run_stream_once(stream, "t_sliding"))
    exp = _norm(sliding_counts(load_table(spark, SF0001, "events")))
    assert got == exp and len(got) > 0
