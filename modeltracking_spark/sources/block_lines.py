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
  shape).  Stream boundaries are found WITHOUT decoding — and without
  materializing the archive: planning slides a bounded window over
  the file (``operators/bzip2.py:bz2_stream_offsets_from_file``), so
  a 100 GB archive is planned in O(chunk) driver memory; one
  InputPartition per STREAM.

Both yield ``(path, block_index, line_no, line)`` over record-aligned
writers' output, so no record is split across partitions.

**Scale knob — ``target_partition_bytes``**: by default the partition
unit is one decode unit (block/stream), which maximizes parallelism
locally but at 100 TB of 4 MiB units would mean ~25M InputPartitions —
a driver-side planning list and task-scheduling flood.  Setting
``.option("target_partition_bytes", n)`` greedily groups CONTIGUOUS
units into partitions of ≥ n compressed bytes; each task then does ONE
seek and ONE contiguous range read and decodes its units in sequence,
so partition count scales with archive_bytes/target instead of unit
count.  Output rows are identical either way (pinned by tests).
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


def coalesce_contiguous(entries, target_bytes, off_of, size_of):
    """Greedily group a file's ``(index, entry)`` units into
    InputPartition-sized runs: a group closes when it has accumulated
    ``target_bytes`` of compressed payload or when the next unit is
    not byte-contiguous with the previous one (a pruning gap — never
    read bytes a group doesn't decode).  ``target_bytes <= 0`` keeps
    the one-unit-per-partition default."""
    if target_bytes <= 0:
        return [[ie] for ie in entries]
    groups, cur, cur_bytes = [], [], 0
    for ie in entries:
        e = ie[1]
        if cur:
            prev = cur[-1][1]
            if (off_of(prev) + size_of(prev) != off_of(e)
                    or cur_bytes >= target_bytes):
                groups.append(cur)
                cur, cur_bytes = [], 0
        cur.append(ie)
        cur_bytes += size_of(e)
    if cur:
        groups.append(cur)
    return groups


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
        self.target_bytes = int(options.get("target_partition_bytes", "0"))

    @staticmethod
    def _span(e) -> int:
        return e["unpadded"] + ((-e["unpadded"]) % 4)

    def partitions(self):
        from modeltracking_spark.operators.xz import (
            xz_block_index_from_file,
        )

        parts = []
        for f in self.files:
            with open(f, "rb") as fh:  # head + tail reads only
                ck, entries = xz_block_index_from_file(fh)
            groups = coalesce_contiguous(
                list(enumerate(entries)), self.target_bytes,
                lambda e: e["b_off"], self._span,
            )
            parts.extend(InputPartition((f, ck, g)) for g in groups)
        return parts

    def read(self, partition):
        from modeltracking_spark.operators.xz import xz_read_block

        path, ck, group = partition.value
        base = group[0][1]["b_off"]
        last = group[-1][1]
        with open(path, "rb") as fh:  # ONE contiguous range read
            fh.seek(base)
            blob = fh.read(last["b_off"] + self._span(last) - base)
        for idx, e in group:
            chunk = blob[e["b_off"] - base:
                         e["b_off"] - base + self._span(e)]
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
        self.target_bytes = int(options.get("target_partition_bytes", "0"))
        self.scan_chunk = int(options.get("scan_chunk_bytes",
                                          str(4 << 20)))

    def partitions(self):
        import os

        from modeltracking_spark.operators.bzip2 import (
            bz2_stream_offsets_from_file,
        )

        parts = []
        for f in self.files:
            size = os.path.getsize(f)
            with open(f, "rb") as fh:  # bounded sliding-window scan
                offs = bz2_stream_offsets_from_file(fh, self.scan_chunk)
            bounds = offs + [size]
            entries = [
                (i, (bounds[i], bounds[i + 1] - bounds[i]))
                for i in range(len(offs))
            ]
            groups = coalesce_contiguous(
                entries, self.target_bytes,
                lambda e: e[0], lambda e: e[1],
            )
            parts.extend(InputPartition((f, g)) for g in groups)
        return parts

    def read(self, partition):
        from modeltracking_spark.operators.bzip2 import bz2_read_stream

        path, group = partition.value
        base = group[0][1][0]
        last_off, last_size = group[-1][1]
        with open(path, "rb") as fh:  # ONE contiguous range read
            fh.seek(base)
            blob = fh.read(last_off + last_size - base)
        for idx, (off, size) in group:
            raw = bz2_read_stream(blob, off - base, off - base + size)
            yield _lines_batch(path, idx, raw)


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
