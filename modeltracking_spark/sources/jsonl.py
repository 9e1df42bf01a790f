"""JSON-lines source/sink (extension of the SURVEY §2.1 source tier —
the reference's only text format is CSV, but JSONL is the lingua franca
of LLM corpus interchange, so the engine needs the same
write → explicit-schema read → verify loop the CSV tier has).

Reads ALWAYS pass an explicit schema and FAILFAST mode: schema
inference over 100 TB double-scans the data, and PERMISSIVE mode turns
corrupt records into silent nulls — the exact class of quiet data loss
a curation pipeline must refuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write as JSON lines (one object per row, Spark's json sink —
    newline-delimited, UTF-8). Partitioned output; at scale the part
    count follows the upstream partitioning."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read JSON lines with an EXPLICIT schema, failing loudly on any
    record that does not parse (FAILFAST — no silent corrupt-record
    nulls, no inference scan)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
