"""Block/stream-parallel Spark DataSources for indexed compressed
line corpora — the two formats whose OWN framing already supports
mid-file seeks, completing the seekable-zstd family:

- ``spark.read.format("xz_blocks")`` — multi-block ``.xz`` (what
  ``xz -T``/``--block-list`` emits).  The xz INDEX is the format's
  built-in seek table; one InputPartition per BLOCK, each decoded in
  isolation by ``operators/xz.py:xz_read_block`` with its header CRC,
  filter chain, integrity check, and index record all verified.
- ``spark.read.format("bz2_streams")`` — concatenated ``.bz2``
  streams (pbzip2 / lbzip2 output; the Wikipedia multistream-dump
  shape).  Stream boundaries are found WITHOUT decoding via the
  10-byte ``BZh<level>`` + block-magic signature
  (``operators/bzip2.py:bz2_stream_offsets``); one InputPartition per
  STREAM.

Both yield ``(path, block_index, line_no, line)`` over record-aligned
writers' output, so no record is split across partitions.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


def _files(path: str, suffix: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(suffix)
        )
    return [path]


def _lines_batch(path, idx, raw):
    import pyarrow as pa

    lines = raw.decode("utf-8").split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return pa.RecordBatch.from_pydict(
        {
            "path": [path] * len(lines),
            "block_index": [idx] * len(lines),
            "line_no": list(range(len(lines))),
            "line": lines,
        }
    )


class _XzBlocksReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError("xz_blocks source requires .option('path', ...)")
        self.files = _files(path, ".xz")

    def partitions(self):
        from modeltracking_spark.operators.xz import (
            xz_block_index_from_file,
        )

        parts = []
        for f in self.files:
            with open(f, "rb") as fh:  # head + tail reads only
                ck, entries = xz_block_index_from_file(fh)
            parts.extend(
                InputPartition((f, i, ck, e))
                for i, e in enumerate(entries)
            )
        return parts

    def read(self, partition):
        from modeltracking_spark.operators.xz import xz_read_block

        path, idx, ck, e = partition.value
        span = e["unpadded"] + ((-e["unpadded"]) % 4)
        with open(path, "rb") as fh:  # RANGE read: this block only
            fh.seek(e["b_off"])
            chunk = fh.read(span)
        local = dict(e, b_off=0)
        yield _lines_batch(path, idx, xz_read_block(chunk, ck, local))


class XzBlocksDataSource(DataSource):
    """``spark.read.format("xz_blocks")`` after
    ``spark.dataSource.register(XzBlocksDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "xz_blocks"

    def schema(self) -> str:
        return "path string, block_index bigint, line_no bigint, line string"

    def reader(self, schema):
        return _XzBlocksReader(self.options, schema)


class _Bz2StreamsReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError(
                "bz2_streams source requires .option('path', ...)"
            )
        self.files = _files(path, ".bz2")

    def partitions(self):
        from modeltracking_spark.operators.bzip2 import bz2_stream_offsets

        parts = []
        for f in self.files:
            with open(f, "rb") as fh:
                data = fh.read()
            offs = bz2_stream_offsets(data)
            bounds = offs + [len(data)]
            parts.extend(
                InputPartition((f, i, bounds[i], bounds[i + 1]))
                for i in range(len(offs))
            )
        return parts

    def read(self, partition):
        from modeltracking_spark.operators.bzip2 import bz2_read_stream

        path, idx, start, end = partition.value
        with open(path, "rb") as fh:  # RANGE read: this stream only
            fh.seek(start)
            chunk = fh.read(end - start)
        yield _lines_batch(path, idx, bz2_read_stream(chunk, 0, len(chunk)))


class Bz2StreamsDataSource(DataSource):
    """``spark.read.format("bz2_streams")`` after
    ``spark.dataSource.register(Bz2StreamsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "bz2_streams"

    def schema(self) -> str:
        return "path string, block_index bigint, line_no bigint, line string"

    def reader(self, schema):
        return _Bz2StreamsReader(self.options, schema)
