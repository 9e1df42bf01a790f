"""Seekable-zstd format (the public zstd contrib spec): frame-wise
isolated decode, seek-table structure, checksum/tamper rejects, the
stock-zstd-CLI cross-validation (a seekable archive is ALSO a plain
zstd stream because the seek table rides a skippable frame), and the
Spark DataSource's frame-per-partition parallelism."""

import os
import random
import subprocess

import pytest

from modeltracking_spark.operators.zstd_seekable import (
    zstd_seekable_read_frame,
    zstd_seekable_table,
    zstd_seekable_write,
)

_ZSTD_CLI = "/root/miniconda/bin/zstd"
needs_cli = pytest.mark.skipif(
    not os.path.exists(_ZSTD_CLI), reason="zstd CLI unavailable"
)


def _batches(n=9):
    rng = random.Random(4)
    return [
        (f"record {i} " * rng.randrange(2, 40)).encode()
        + bytes(rng.randrange(65, 91) for _ in range(rng.randrange(50)))
        for i in range(n)
    ]


def test_frame_isolated_decode_and_table_shape():
    bs = _batches()
    blob = zstd_seekable_write(bs)
    table = zstd_seekable_table(blob)
    assert len(table) == len(bs)
    # frames decode in ANY order, independently
    for i in reversed(range(len(bs))):
        assert zstd_seekable_read_frame(blob, table, i) == bs[i]
    # offsets tile the compressed span exactly
    assert table[0]["c_off"] == 0
    for a, b in zip(table, table[1:]):
        assert b["c_off"] == a["c_off"] + a["c_size"]
        assert b["d_off"] == a["d_off"] + a["d_size"]


@needs_cli
def test_archive_is_also_a_plain_zstd_stream(tmp_path):
    bs = _batches()
    blob = zstd_seekable_write(bs)
    p = tmp_path / "a.zst"
    p.write_bytes(blob)
    out = subprocess.run([_ZSTD_CLI, "-d", "-c", str(p)],
                         capture_output=True)
    assert out.stdout == b"".join(bs)


def test_tamper_and_structure_rejects():
    bs = _batches(3)
    blob = zstd_seekable_write(bs)
    with pytest.raises(ValueError, match="footer magic"):
        zstd_seekable_table(blob[:-1] + b"\x00")
    with pytest.raises(ValueError, match="seekable"):
        zstd_seekable_table(b"\x00" * 16)
    # flip a payload byte: frame checksum (or size) catches it
    table = zstd_seekable_table(blob)
    bad = bytearray(blob)
    bad[table[1]["c_off"] + 9] ^= 0xFF
    with pytest.raises(ValueError):
        zstd_seekable_read_frame(bytes(bad), table, 1)
    # corrupt a table entry size: span check catches it
    bad2 = bytearray(blob)
    # first entry's compressed size lives right after the skippable hdr
    skip_start = len(blob) - (len(table) * 12 + 9) - 8
    bad2[skip_start + 8] ^= 0x01
    with pytest.raises(ValueError, match="covers"):
        zstd_seekable_table(bytes(bad2))
    # no-checksum descriptor arm
    blob2 = zstd_seekable_write(bs, checksum=False)
    t2 = zstd_seekable_table(blob2)
    assert all(e["checksum"] is None for e in t2)
    assert zstd_seekable_read_frame(blob2, t2, 2) == bs[2]
    with pytest.raises(ValueError):
        zstd_seekable_write([b""])  # empty frame payload


def test_datasource_frame_per_partition(spark, tmp_path):
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.zstd_seekable_source import (
        ZstdSeekableDataSource,
    )

    lines = [f"{i}\tvalue {i}\n" for i in range(100)]
    batches = ["".join(lines[i:i + 10]).encode() for i in range(0, 100, 10)]
    (tmp_path / "c.zst").write_bytes(zstd_seekable_write(batches))
    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ZstdSeekableDataSource)
    except Exception:
        pass
    df = (spark.read.format("zstd_seekable")
          .option("path", str(tmp_path)).load())
    assert df.rdd.getNumPartitions() == 10  # ONE partition per frame
    rows = df.collect()
    assert len(rows) == 100
    got = sorted((int(r["frame_index"]), int(r["line_no"]), r["line"])
                 for r in rows)
    assert got[0] == (0, 0, "0\tvalue 0")
    assert got[-1] == (9, 9, "99\tvalue 99")
    # frame_mod pruning reads a deterministic subset of frames
    half = (spark.read.format("zstd_seekable")
            .option("path", str(tmp_path))
            .option("frame_mod", "2").load())
    assert half.count() == 50
    assert sorted(set(
        int(r["frame_index"]) for r in half.collect()
    )) == [0, 2, 4, 6, 8]


def test_stream_reader_tails_growing_archive_exactly_once(spark, tmp_path):
    """The DataSourceStreamReader arm: offsets are {path: frames},
    a restart with the same checkpoint consumes ONLY new frames, a
    rerun with nothing new adds nothing, and no (path, frame, line)
    ever duplicates."""
    import os

    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.zstd_seekable_source import (
        ZstdSeekableDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ZstdSeekableDataSource)
    except Exception:
        pass
    arch = tmp_path / "arch"
    arch.mkdir()
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def write_shard(name, lo, hi):
        lines = [f"{i}\tv{i}\n" for i in range(lo, hi)]
        batches = ["".join(lines[i:i + 10]).encode()
                   for i in range(0, len(lines), 10)]
        tmp = arch / f".{name}.tmp"
        tmp.write_bytes(zstd_seekable_write(batches))
        os.rename(tmp, arch / name)

    def drain():
        q = (spark.readStream.format("zstd_seekable")
             .option("path", str(arch)).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    write_shard("a.zst", 0, 50)
    drain()
    assert spark.read.parquet(out).count() == 50
    write_shard("b.zst", 50, 120)
    drain()
    df = spark.read.parquet(out)
    assert df.count() == 120
    assert df.groupBy("path", "frame_index", "line_no").count() \
        .where("count > 1").count() == 0
    drain()  # nothing new: offsets hold
    assert spark.read.parquet(out).count() == 120
