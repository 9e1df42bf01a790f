"""Spark Python DataSource for seekable-zstd line corpora —
``spark.read.format("zstd_seekable").option("path", dir_or_file)``.

The seekable format's point is parallelism INSIDE one compressed
file: every zstd frame decodes independently, so the partition unit
here is ``(file, frame_index)`` — a 1-file archive with 1000 frames
scans on 1000 cores, which a plain ``.zst`` never can.  Frames are
record-aligned by the writer (``operators/zstd_seekable.py``), so a
partition never sees a split record.

Each decoded frame is split on newlines; the source yields
``(path, frame_index, line_no, line)`` with ``line_no`` global within
the frame's decompressed offset order.  Reader-side pruning: the
``frame_mod``/``frame_rem`` options let a caller scan a deterministic
subset of frames without touching the others' bytes (only the seek
table and the selected frames are read — partition pruning at the
compressed-byte level).

**Scale knob — ``target_partition_bytes``**: one-partition-per-frame
is the right default locally, but a 100 TB corpus of 4 MiB frames is
~25M InputPartitions — a driver planning list and task-scheduling
flood.  ``.option("target_partition_bytes", n)`` greedily groups
CONTIGUOUS frames into partitions of ≥ n compressed bytes (one seek +
one contiguous range read per group; a frame_mod pruning gap breaks
the group so no unwanted byte is ever read).  Output rows are
identical either way (pinned by tests).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _archive_files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".zst")
        )
    return [path]


class ZstdSeekableReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError(
                "zstd_seekable source requires .option('path', ...)"
            )
        self.files = _archive_files(path)
        self.frame_mod = int(options.get("frame_mod", "1"))
        self.frame_rem = int(options.get("frame_rem", "0"))
        self.target_bytes = int(options.get("target_partition_bytes", "0"))

    def partitions(self):
        from modeltracking_spark.operators.zstd_seekable import (
            zstd_seekable_table_from_file,
        )
        from modeltracking_spark.sources.block_lines import (
            coalesce_contiguous,
        )

        parts = []
        for f in self.files:
            with open(f, "rb") as fh:  # TAIL reads only
                table = zstd_seekable_table_from_file(fh)
            entries = [
                (i, e) for i, e in enumerate(table)
                if i % self.frame_mod == self.frame_rem
            ]
            groups = coalesce_contiguous(
                entries, self.target_bytes,
                lambda e: e["c_off"], lambda e: e["c_size"],
            )
            parts.extend(InputPartition((f, g)) for g in groups)
        return parts

    def read(self, partition):
        import pyarrow as pa

        from modeltracking_spark.operators.zstd_seekable import (
            zstd_seekable_read_frame,
        )

        path, group = partition.value
        base = group[0][1]["c_off"]
        last = group[-1][1]
        with open(path, "rb") as fh:  # ONE contiguous range read
            fh.seek(base)
            blob = fh.read(last["c_off"] + last["c_size"] - base)
        for idx, e in group:
            frame = blob[e["c_off"] - base:
                         e["c_off"] - base + e["c_size"]]
            local = dict(e, c_off=0)
            raw = zstd_seekable_read_frame(frame, [local], 0)
            lines = raw.decode("utf-8").split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            yield pa.RecordBatch.from_pydict(
                {
                    "path": [path] * len(lines),
                    "frame_index": [idx] * len(lines),
                    "line_no": list(range(len(lines))),
                    "line": lines,
                }
            )


class ZstdSeekableDataSource(DataSource):
    """``spark.read.format("zstd_seekable")`` after
    ``spark.dataSource.register(ZstdSeekableDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "zstd_seekable"

    def schema(self) -> str:
        return "path string, frame_index bigint, line_no bigint, line string"

    def reader(self, schema):
        return ZstdSeekableReader(self.options, schema)

    def streamReader(self, schema):
        return ZstdSeekableStreamReader(self.options, schema)


class ZstdSeekableStreamReader(DataSourceStreamReader):
    """Micro-batch TAILING of a growing seekable-zstd archive
    directory: the offset is ``{path: frames_consumed}``, computed
    from seek-table TAIL reads only, so a 100 TB archive directory is
    planned without touching payload bytes. Each micro-batch gets one
    InputPartition per NEW frame — exactly-once at frame grain,
    replay-safe because offsets are deterministic positions in an
    append-only layout (the shape every log-tailing connector uses,
    here over compressed record-aligned frames)."""

    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError(
                "zstd_seekable stream requires .option('path', ...)"
            )
        self.path = path

    def initialOffset(self) -> dict:
        return {}

    def latestOffset(self) -> dict:
        from modeltracking_spark.operators.zstd_seekable import (
            zstd_seekable_table_from_file,
        )

        offset = {}
        for f in _archive_files(self.path):
            with open(f, "rb") as fh:  # tail reads only
                offset[f] = len(zstd_seekable_table_from_file(fh))
        return offset

    def partitions(self, start: dict, end: dict):
        from modeltracking_spark.operators.zstd_seekable import (
            zstd_seekable_table_from_file,
        )

        parts = []
        for f, n_end in sorted(end.items()):
            n_start = int(start.get(f, 0))
            if n_end <= n_start:
                continue
            with open(f, "rb") as fh:
                table = zstd_seekable_table_from_file(fh)
            for i in range(n_start, int(n_end)):
                parts.append(InputPartition((f, i, table[i])))
        return parts

    def read(self, partition):
        from modeltracking_spark.operators.zstd_seekable import (
            zstd_seekable_read_frame,
        )

        path, idx, e = partition.value
        with open(path, "rb") as fh:  # RANGE read: this frame only
            fh.seek(e["c_off"])
            frame = fh.read(e["c_size"])
        raw = zstd_seekable_read_frame(frame, [dict(e, c_off=0)], 0)
        lines = raw.decode("utf-8").split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        for i, line in enumerate(lines):
            yield (path, idx, i, line)

    def commit(self, end: dict):
        pass  # offsets are positions in an append-only layout
