"""BCJ x86 + Delta filters (round 10, VERDICT r9 item 6): the raw
transforms are cross-validated byte-for-byte against liblzma (stdlib
``lzma`` FORMAT_RAW lets us peel the LZMA2 stage off and observe
liblzma's own filter output), and full .xz streams encoded by liblzma
and the xz CLI with --x86 / --delta chains decode from spec through
``xz_decompress``."""

import lzma
import os
import random
import subprocess

import pytest

from modeltracking_spark.operators.bcj import (
    delta_decode,
    delta_encode,
    x86_bcj_decode,
    x86_bcj_encode,
)
from modeltracking_spark.operators.xz import xz_decompress

_XZ_CLI = "/root/miniconda/bin/xz"
needs_cli = pytest.mark.skipif(
    not os.path.exists(_XZ_CLI), reason="xz CLI unavailable"
)


def _ref_filter(raw: bytes, filt: dict) -> bytes:
    """liblzma's own output for a single pre-LZMA2 filter, recovered
    by compressing [filt, LZMA2] raw and decompressing only [LZMA2]."""
    blob = lzma.compress(
        raw, format=lzma.FORMAT_RAW,
        filters=[filt, {"id": lzma.FILTER_LZMA2, "preset": 0}],
    )
    return lzma.decompress(
        blob, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 0}],
    )


def _adversarial(rng: random.Random, n: int) -> bytes:
    """Random buffer salted dense with E8/E9/00/FF — every branch of
    the mask state machine fires."""
    raw = bytearray(rng.randrange(256) for _ in range(n))
    for _ in range(n // 5):
        raw[rng.randrange(n)] = rng.choice([0xE8, 0xE9, 0x00, 0xFF])
    return bytes(raw)


def test_x86_encode_matches_liblzma():
    rng = random.Random(3)
    for _ in range(80):
        n = rng.randrange(5, 3000)
        raw = _adversarial(rng, n)
        assert x86_bcj_encode(raw) == _ref_filter(
            raw, {"id": lzma.FILTER_X86}
        )
    # tiny buffers are passthrough
    for n in range(5):
        raw = bytes([0xE8] * n)
        assert x86_bcj_encode(raw) == raw


def test_x86_roundtrip_and_decode_of_liblzma_output():
    rng = random.Random(5)
    for _ in range(80):
        raw = _adversarial(rng, rng.randrange(5, 3000))
        enc = _ref_filter(raw, {"id": lzma.FILTER_X86})
        assert x86_bcj_decode(enc) == raw
        assert x86_bcj_decode(x86_bcj_encode(raw)) == raw


def test_x86_start_offset_matches_liblzma():
    rng = random.Random(7)
    for start in (16, 1 << 20, 0xFFFF0000):
        raw = _adversarial(rng, 800)
        ref = _ref_filter(
            raw, {"id": lzma.FILTER_X86, "start_offset": start}
        )
        assert x86_bcj_encode(raw, start) == ref
        assert x86_bcj_decode(ref, start) == raw


def test_delta_matches_liblzma_and_roundtrips():
    rng = random.Random(9)
    for dist in (1, 2, 3, 16, 255, 256):
        raw = bytes(rng.randrange(256) for _ in range(1000))
        ref = _ref_filter(raw, {"id": lzma.FILTER_DELTA, "dist": dist})
        assert delta_encode(raw, dist) == ref
        assert delta_decode(ref, dist) == raw
    with pytest.raises(ValueError):
        delta_encode(b"x", 0)
    with pytest.raises(ValueError):
        delta_decode(b"x", 257)


def test_xz_stream_with_x86_chain_decodes():
    """Full .xz containers with [x86, LZMA2] and [delta, LZMA2]
    chains, stdlib-encoded, decode from spec."""
    rng = random.Random(11)
    raw = _adversarial(rng, 20000)
    blob = lzma.compress(
        raw, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC64,
        filters=[{"id": lzma.FILTER_X86},
                 {"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    assert xz_decompress(blob) == raw
    blob2 = lzma.compress(
        raw, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC32,
        filters=[{"id": lzma.FILTER_DELTA, "dist": 4},
                 {"id": lzma.FILTER_LZMA2, "preset": 1}],
    )
    assert xz_decompress(blob2) == raw
    # three-filter chain: delta then x86 then LZMA2 (reverse-order
    # application on decode)
    blob3 = lzma.compress(
        raw, format=lzma.FORMAT_XZ,
        filters=[{"id": lzma.FILTER_DELTA, "dist": 1},
                 {"id": lzma.FILTER_X86},
                 {"id": lzma.FILTER_LZMA2, "preset": 0}],
    )
    assert xz_decompress(blob3) == raw


@needs_cli
def test_xz_cli_x86_fixture_decodes(tmp_path):
    rng = random.Random(13)
    raw = _adversarial(rng, 50000)
    p = tmp_path / "payload"
    p.write_bytes(raw)
    # a CLI filter chain must name its LZMA2 stage explicitly
    for args in (["--x86", "--lzma2=preset=1"],
                 ["--delta=dist=2", "--lzma2=preset=1"],
                 ["--x86", "-9"]):
        blob = subprocess.run(
            [_XZ_CLI] + args + ["-c", str(p)], capture_output=True
        ).stdout
        assert xz_decompress(blob) == raw, args


def test_unsupported_bcj_architectures_still_reject():
    raw = b"arm code here" * 100
    blob = lzma.compress(
        raw, format=lzma.FORMAT_XZ,
        filters=[{"id": lzma.FILTER_ARM},
                 {"id": lzma.FILTER_LZMA2, "preset": 0}],
    )
    with pytest.raises(NotImplementedError, match="plug-in"):
        xz_decompress(blob)
