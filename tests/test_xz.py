"""From-spec .xz / LZMA2 decoder vs stdlib liblzma and the shipped xz
CLI: check-type and props matrices, multi-chunk LZMA2 streams with
uncompressed chunks, CLI multi-block layouts, concatenated streams,
and loud malformed rejects across every container layer."""

import lzma as stdlib_lzma
import os
import random
import subprocess

import pytest

from modeltracking_spark.operators.xz import (
    crc64_xz,
    lzma2_decompress,
    xz_decompress,
)

_XZ_CLI = "/root/miniconda/bin/xz"
needs_cli = pytest.mark.skipif(
    not os.path.exists(_XZ_CLI), reason="xz CLI unavailable"
)


def _payloads():
    rng = random.Random(3)
    return [
        b"",
        b"a",
        b"hello xz world " * 60,
        bytes(range(256)) * 20,
        bytes(rng.randrange(256) for _ in range(5000)),
        (b"abcabc" * 800) + bytes(rng.randrange(256) for _ in range(300)),
    ]


def test_crc64_check_value():
    # the standard CRC-64/XZ check value
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_xz(b"") == 0


@pytest.mark.parametrize(
    "check",
    [stdlib_lzma.CHECK_CRC64, stdlib_lzma.CHECK_CRC32,
     stdlib_lzma.CHECK_SHA256, stdlib_lzma.CHECK_NONE],
)
def test_check_type_matrix(check):
    for raw in _payloads():
        enc = stdlib_lzma.compress(raw, format=stdlib_lzma.FORMAT_XZ,
                                   check=check)
        assert xz_decompress(enc) == raw


@pytest.mark.parametrize(
    "lc,lp,pb", [(3, 0, 2), (0, 0, 0), (2, 1, 1), (1, 2, 0), (0, 4, 0)]
)
def test_lzma2_props_matrix(lc, lp, pb):
    raw = b"props matrix payload " * 400 + bytes(range(128))
    enc = stdlib_lzma.compress(
        raw, format=stdlib_lzma.FORMAT_XZ,
        filters=[{"id": stdlib_lzma.FILTER_LZMA2, "preset": 6,
                  "lc": lc, "lp": lp, "pb": pb}],
    )
    assert xz_decompress(enc) == raw


def test_concatenated_streams_and_padding():
    a = stdlib_lzma.compress(b"first ", format=stdlib_lzma.FORMAT_XZ)
    b = stdlib_lzma.compress(b"second", format=stdlib_lzma.FORMAT_XZ,
                             check=stdlib_lzma.CHECK_SHA256)
    assert xz_decompress(a + b) == b"first second"
    assert xz_decompress(a + b"\x00" * 4 + b) == b"first second"
    with pytest.raises(ValueError, match="magic|padding"):
        xz_decompress(a + b"\x00\x00")  # partial padding


def test_multi_chunk_lzma2_with_uncompressed_chunks():
    """> 2 MiB forces multiple LZMA2 chunks (chunk cap 2^21 unpacked);
    the random span makes liblzma emit UNCOMPRESSED chunks, whose
    bytes later matches reach back into — the dictionary-continuity
    arm — and after which the next LZMA chunk must reset state."""
    rng = random.Random(5)
    big = (b"The repetitive part goes on and on. " * 40000
           + bytes(rng.randrange(256) for _ in range(900000))
           + b"tail " * 50000)
    enc = stdlib_lzma.compress(big, format=stdlib_lzma.FORMAT_XZ, preset=1)
    assert xz_decompress(enc, max_output=1 << 23) == big


@needs_cli
def test_cli_multi_block(tmp_path):
    rng = random.Random(6)
    raw = (b"block one text " * 30000
           + bytes(rng.randrange(256) for _ in range(200000)))
    p = tmp_path / "payload"
    p.write_bytes(raw)
    blob = subprocess.run(
        [_XZ_CLI, "--block-size=262144", "-6", "-c", str(p)],
        capture_output=True,
    ).stdout
    assert xz_decompress(blob, max_output=1 << 23) == raw


def test_rejects_every_layer():
    raw = b"tamper target " * 200
    good = stdlib_lzma.compress(raw, format=stdlib_lzma.FORMAT_XZ,
                                check=stdlib_lzma.CHECK_CRC64)
    with pytest.raises(ValueError, match="magic"):
        xz_decompress(b"\x00" + good)
    bad = bytearray(good)
    bad[7] ^= 0xFF  # stream flags -> header CRC mismatch
    with pytest.raises(ValueError, match="CRC|flags"):
        xz_decompress(bytes(bad))
    bad = bytearray(good)
    bad[14] ^= 0x01  # inside block header -> block header CRC
    with pytest.raises(ValueError):
        xz_decompress(bytes(bad))
    bad = bytearray(good)
    # flip a byte in the middle of the compressed body: either the
    # LZMA2 layer rejects or the block check catches it
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        xz_decompress(bytes(bad))
    bad = bytearray(good)
    bad[-14] ^= 0xFF  # inside the index/footer region
    with pytest.raises(ValueError):
        xz_decompress(bytes(bad))
    for cut in (5, 11, 20, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            xz_decompress(good[:cut])
    with pytest.raises(ValueError, match="max_output"):
        xz_decompress(
            stdlib_lzma.compress(b"A" * 300000,
                                 format=stdlib_lzma.FORMAT_XZ),
            max_output=1000,
        )


def test_bcj_filter_family_decodes_at_former_plugin_point():
    # x86 and delta are implemented since round 10; round 11 lands the
    # whole branch family (tests/test_xz_bcj.py cross-validates each
    # transform byte-for-byte) — streams that used to reject now decode
    for fid in (stdlib_lzma.FILTER_X86, stdlib_lzma.FILTER_SPARC,
                stdlib_lzma.FILTER_ARM, stdlib_lzma.FILTER_ARMTHUMB,
                stdlib_lzma.FILTER_POWERPC, stdlib_lzma.FILTER_IA64):
        enc = stdlib_lzma.compress(
            b"\x00" * 4096, format=stdlib_lzma.FORMAT_XZ,
            filters=[{"id": fid},
                     {"id": stdlib_lzma.FILTER_LZMA2, "preset": 1}],
        )
        assert xz_decompress(enc) == b"\x00" * 4096, fid


def test_lzma2_grammar_rejects():
    with pytest.raises(ValueError, match="control byte"):
        lzma2_decompress(b"\x7f")
    with pytest.raises(ValueError, match="truncated"):
        lzma2_decompress(b"")
    # first chunk must reset the dictionary (0x02 = no-reset uncompressed)
    with pytest.raises(ValueError, match="reset dictionary"):
        lzma2_decompress(b"\x02\x00\x00x\x00")
    # 0x80 = LZMA chunk with reset mode 0 before any properties
    with pytest.raises(ValueError, match="reset dictionary|properties"):
        lzma2_decompress(b"\x80\x00\x00\x00\x00" + b"\x00" * 5)


def test_stdlib_decoder_agrees():
    rng = random.Random(12)
    for i in range(12):
        n = rng.randrange(0, 20000)
        raw = (bytes(rng.randrange(256) for _ in range(n)) if i % 2
               else bytes([rng.randrange(97, 123)]) * n)
        enc = stdlib_lzma.compress(raw, format=stdlib_lzma.FORMAT_XZ,
                                   preset=1 + i % 9)
        assert xz_decompress(enc, max_output=1 << 22) \
            == stdlib_lzma.decompress(enc) == raw
