"""Block/stream-parallel readers for indexed compressed corpora: the
xz index walker (no block decoded during indexing), the bzip2
multistream boundary finder, isolated out-of-order decode, and the
frame-per-partition property through REAL DataSource reads."""

import bz2 as stdlib_bz2
import os
import subprocess

import pytest

from modeltracking_spark.operators.bzip2 import (
    bz2_read_stream,
    bz2_stream_offsets,
)
from modeltracking_spark.operators.xz import (
    xz_block_index,
    xz_read_block,
)

_XZ_CLI = "/root/miniconda/bin/xz"
needs_xz = pytest.mark.skipif(
    not os.path.exists(_XZ_CLI), reason="xz CLI unavailable"
)


@needs_xz
def test_xz_index_walk_and_isolated_blocks(tmp_path):
    raw = b"".join(b"line %05d of the corpus payload\n" % i
                   for i in range(20000))
    p = tmp_path / "p"
    p.write_bytes(raw)
    blob = subprocess.run(
        [_XZ_CLI, "--block-size=65536", "-c", str(p)],
        capture_output=True).stdout
    ck, entries = xz_block_index(blob)
    assert len(entries) > 5
    # decompressed offsets tile the payload
    assert entries[0]["d_off"] == 0
    assert (entries[-1]["d_off"] + entries[-1]["unc_size"]) == len(raw)
    # isolated decode, out of order
    for e in reversed(entries):
        assert xz_read_block(blob, ck, e) == \
            raw[e["d_off"]:e["d_off"] + e["unc_size"]]
    # --block-list gives record-aligned sizes
    sizes = [1000, 2500, 4096]
    blob2 = subprocess.run(
        [_XZ_CLI, "--block-list=%s" % ",".join(map(str, sizes)),
         "-1", "-c", str(p)],
        capture_output=True).stdout
    _ck2, e2 = xz_block_index(blob2)
    assert [x["unc_size"] for x in e2[:3]] == sizes
    # index tamper rejects
    bad = bytearray(blob)
    bad[-6] ^= 0x01  # footer flags byte
    with pytest.raises(ValueError):
        xz_block_index(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        xz_block_index(b"\x00" * 64)


def test_bz2_stream_offsets_and_isolated_streams():
    parts = [(b"part %d " % i) * (20 + i * 7) for i in range(9)]
    blob = b"".join(stdlib_bz2.compress(p, 1 + i % 9)
                    for i, p in enumerate(parts))
    offs = bz2_stream_offsets(blob)
    assert len(offs) == 9 and offs[0] == 0
    bounds = offs + [len(blob)]
    for i, p in enumerate(parts):
        assert bz2_read_stream(blob, bounds[i], bounds[i + 1]) == p
    # a single stream has exactly one offset
    assert bz2_stream_offsets(stdlib_bz2.compress(b"solo", 5)) == [0]
    with pytest.raises(ValueError, match="start with"):
        bz2_stream_offsets(b"\x00" + stdlib_bz2.compress(b"x", 1))


def test_datasources_partition_per_unit(spark, tmp_path):
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.block_lines import (
        Bz2StreamsDataSource,
        XzBlocksDataSource,
    )

    lines = [f"{i}\tvalue {i}\n" for i in range(80)]
    groups = ["".join(lines[i:i + 10]).encode() for i in range(0, 80, 10)]
    ensure_pkg_on_workers(spark)

    bz_dir = tmp_path / "bz"
    bz_dir.mkdir()
    (bz_dir / "c.bz2").write_bytes(
        b"".join(stdlib_bz2.compress(g, 1 + i % 9)
                 for i, g in enumerate(groups)))
    try:
        spark.dataSource.register(Bz2StreamsDataSource)
    except Exception:
        pass
    df = (spark.read.format("bz2_streams")
          .option("path", str(bz_dir)).load())
    assert df.rdd.getNumPartitions() == 8  # one per stream
    rows = sorted((int(r["block_index"]), int(r["line_no"]), r["line"])
                  for r in df.collect())
    assert len(rows) == 80
    assert rows[0] == (0, 0, "0\tvalue 0")
    assert rows[-1] == (7, 9, "79\tvalue 79")

    if os.path.exists(_XZ_CLI):
        xz_dir = tmp_path / "xz"
        xz_dir.mkdir()
        raw = b"".join(groups)
        p = tmp_path / "raw"
        p.write_bytes(raw)
        sizes = ",".join(str(len(g)) for g in groups)
        blob = subprocess.run(
            [_XZ_CLI, f"--block-list={sizes}", "-1", "-c", str(p)],
            capture_output=True).stdout
        (xz_dir / "c.xz").write_bytes(blob)
        try:
            spark.dataSource.register(XzBlocksDataSource)
        except Exception:
            pass
        df2 = (spark.read.format("xz_blocks")
               .option("path", str(xz_dir)).load())
        assert df2.rdd.getNumPartitions() == 8  # one per block
        rows2 = sorted((int(r["block_index"]), int(r["line_no"]), r["line"])
                       for r in df2.collect())
        assert rows2 == rows


@needs_xz
def test_xz_indexed_blocks_with_bcj_chain(tmp_path):
    """Isolated indexed-block decode composes with BCJ filter chains:
    each block carries its own [x86, LZMA2] header and decodes alone."""
    import random

    rng = random.Random(3)
    raw = bytearray(rng.randrange(256) for _ in range(50000))
    for _ in range(12000):
        raw[rng.randrange(50000)] = rng.choice([0xE8, 0xE9, 0x00, 0xFF])
    raw = bytes(raw)
    p = tmp_path / "p"
    p.write_bytes(raw)
    blob = subprocess.run(
        [_XZ_CLI, "--x86", "--lzma2=preset=1", "--block-size=8192",
         "-c", str(p)], capture_output=True).stdout
    ck, entries = xz_block_index(blob)
    assert len(entries) > 3
    assert b"".join(
        xz_read_block(blob, ck, e) for e in reversed(entries)
    ) == b"".join(
        raw[e["d_off"]:e["d_off"] + e["unc_size"]]
        for e in reversed(entries)
    )
    got = b"".join(xz_read_block(blob, ck, e) for e in entries)
    assert got == raw
