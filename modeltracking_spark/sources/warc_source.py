"""Spark Python DataSource for WARC crawl archives —
``spark.read.format("warc").option("path", dir_or_file)``.

The scan unit is one ``.warc.gz`` shard file per InputPartition (the
crawl-archive layout: Common Crawl ships ~1 GB shards; a 1000-executor
cluster pulls disjoint shards, and within a shard the reader streams
record-per-gzip-member boundaries without decoding ahead — the same
partition-per-fetch-unit design as the hycom grid source).  Records
surface as typed rows (type, id, date, target URI, content type,
declared length, raw body bytes); an optional ``record_type`` option
prunes non-matching records INSIDE the reader (response-only scans
skip warcinfo/request bodies before they ever reach the executor's
Arrow batch).

Framing is the from-spec stack end to end: RFC 1952 member walk
(``operators/inflate.py``) + WARC 1.0 header/Content-Length parse
(``operators/warc.py``).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

WARC_SCHEMA_DDL = (
    "path string, member_index bigint, warc_type string, "
    "record_id string, warc_date string, target_uri string, "
    "content_type string, content_length bigint, body binary"
)


def _shard_files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".warc.gz")
        )
    return [path]


class WarcReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires .option('path', ...)")
        self.files = _shard_files(path)
        self.record_type = options.get("record_type")  # reader-side prune

    def partitions(self):
        # one partition per shard file — the crawl-archive parallelism
        # unit; executors pull disjoint shards
        return [InputPartition(f) for f in self.files]

    def read(self, partition):
        import pyarrow as pa

        from modeltracking_spark.operators.inflate import gzip_members
        from modeltracking_spark.operators.warc import parse_warc

        fname = partition.value
        with open(fname, "rb") as fh:
            data = fh.read()
        cols = {k: [] for k in (
            "path", "member_index", "warc_type", "record_id", "warc_date",
            "target_uri", "content_type", "content_length", "body",
        )}
        for mi, (payload, _s, _e) in enumerate(gzip_members(data)):
            for rec in parse_warc(payload):
                if self.record_type and rec["warc-type"] != self.record_type:
                    continue
                cols["path"].append(fname)
                cols["member_index"].append(mi)
                cols["warc_type"].append(rec["warc-type"])
                cols["record_id"].append(rec["warc-record-id"])
                cols["warc_date"].append(rec["warc-date"])
                cols["target_uri"].append(rec.get("warc-target-uri"))
                cols["content_type"].append(rec.get("content-type"))
                cols["content_length"].append(int(rec["content-length"]))
                cols["body"].append(rec["body"])
        yield pa.RecordBatch.from_pydict(cols)


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` after
    ``spark.dataSource.register(WarcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA_DDL

    def reader(self, schema):
        return WarcReader(self.options)
