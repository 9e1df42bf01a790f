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


_BRANCH_SALTS = {
    0x05: [0x48, 0x49, 0x4A, 0x4B, 0x01, 0x05, 0xFD],
    0x06: list(range(0x10, 0x20)) + [0xA0, 0x00, 0xFF, 0x50],
    0x07: [0xEB, 0x00, 0xFF],
    0x08: [0xF0, 0xF3, 0xF7, 0xF8, 0xFB, 0xFF],
    0x09: [0x40, 0x7F, 0x00, 0xC0, 0xFF],
}
_STDLIB_IDS = {
    0x05: lzma.FILTER_POWERPC, 0x06: lzma.FILTER_IA64,
    0x07: lzma.FILTER_ARM, 0x08: lzma.FILTER_ARMTHUMB,
    0x09: lzma.FILTER_SPARC,
}


@pytest.mark.parametrize("fid", sorted(_STDLIB_IDS))
def test_branch_family_matches_liblzma(fid):
    """Round 11 (VERDICT r10 item 6): every stdlib-exposed branch
    filter's transform matches liblzma BYTE-FOR-BYTE in both
    directions over opcode-dense adversarial buffers, including
    nonzero aligned start offsets."""
    from modeltracking_spark.operators.bcj import (
        BRANCH_FILTERS,
        branch_bcj_decode,
        branch_bcj_encode,
    )

    sid = _STDLIB_IDS[fid]
    rng = random.Random(100 + fid)
    fired = 0
    for _ in range(40):
        n = rng.randrange(4, 4000)
        raw = bytearray(rng.randrange(256) for _ in range(n))
        for _ in range(n // 3):
            raw[rng.randrange(n)] = rng.choice(_BRANCH_SALTS[fid])
        raw = bytes(raw)
        ref = _ref_filter(raw, {"id": sid})
        assert branch_bcj_encode(fid, raw) == ref
        assert branch_bcj_decode(fid, ref) == raw
        fired += ref != raw
    assert fired > 10  # the filters genuinely transformed, not a no-op
    align = BRANCH_FILTERS[fid][1]
    for start in (align, 37 * align, 1000 * align):
        raw = bytes(
            rng.choice(_BRANCH_SALTS[fid]) if rng.random() < 0.4
            else rng.randrange(256) for _ in range(2048))
        ref = _ref_filter(raw, {"id": sid, "start_offset": start})
        assert branch_bcj_encode(fid, raw, start) == ref
        assert branch_bcj_decode(fid, ref, start) == raw


def _arm64_adversarial(rng: random.Random, n_words: int) -> bytes:
    out = bytearray()
    for _ in range(n_words):
        r = rng.random()
        if r < 0.3:
            w = 0x94000000 | rng.randrange(1 << 26)  # BL
        elif r < 0.6:  # ADRP within the ±512 MiB convertible band
            w = (0x90000000 | (rng.randrange(4) << 29)
                 | (rng.randrange(1 << 15) << 5) | rng.randrange(32))
        elif r < 0.7:  # ADRP with larger immediates (often skipped)
            w = (0x90000000 | (rng.randrange(4) << 29)
                 | (rng.randrange(1 << 19) << 5) | rng.randrange(32))
        else:
            w = rng.randrange(1 << 32)
        out += w.to_bytes(4, "little")
    return bytes(out)


def test_arm64_self_inverse_and_fires():
    from modeltracking_spark.operators.bcj import (
        branch_bcj_decode,
        branch_bcj_encode,
    )

    rng = random.Random(41)
    fired = 0
    for _ in range(30):
        raw = _arm64_adversarial(rng, rng.randrange(4, 2000))
        for start in (0, 4, 4096, 1 << 30):
            enc = branch_bcj_encode(0x0A, raw, start)
            assert branch_bcj_decode(0x0A, enc, start) == raw
            fired += enc != raw
    assert fired > 30


@needs_cli
def test_arm64_cli_streams_decode_from_spec():
    """liblzma 5.8's own ARM64 encoder (via the xz CLI — stdlib 3.11
    exposes no FILTER_ARM64) produces containers the from-spec chain
    decodes exactly; stdlib decompress sanity-checks each fixture."""
    rng = random.Random(43)
    for _ in range(8):
        raw = _arm64_adversarial(rng, rng.randrange(10, 3000))
        blob = subprocess.run(
            [_XZ_CLI, "--arm64", "--lzma2=preset=1", "-c"],
            input=raw, capture_output=True, check=True).stdout
        assert lzma.decompress(blob) == raw
        assert xz_decompress(blob) == raw


def _riscv_adversarial(rng: random.Random, n: int) -> bytes:
    """Instruction soup that exercises every RISC-V filter branch:
    link-register and non-link JALs, rs1-matched AUIPC pairs (all rd
    values incl. the excluded x0/x2), marker-aliasing x2-AUIPCs that
    force the escape path, near-trigger duds for every advance rule,
    and 2-byte compressed-instruction slop that shifts alignment."""
    out = bytearray()
    while len(out) < n:
        c = rng.randrange(10)
        if c == 0:  # JAL, every rd
            out += ((rng.getrandbits(20) << 12)
                    | (rng.randrange(32) << 7) | 0x6F).to_bytes(4, "little")
        elif c in (1, 2):  # AUIPC + rs1-matching follower (a pair)
            rd = rng.randrange(32)
            out += ((rng.getrandbits(20) << 12)
                    | (rd << 7) | 0x17).to_bytes(4, "little")
            out += ((rng.getrandbits(12) << 20) | (rd << 15)
                    | (rng.getrandbits(13) << 2)
                    | rng.randrange(4)).to_bytes(4, "little")
        elif c == 3:  # bare AUIPC-shaped word (escape / dud fodder)
            out += ((rng.getrandbits(20) << 12)
                    | (rng.randrange(32) << 7) | 0x17).to_bytes(4, "little")
        elif c == 4:  # packed/escaped-looking bytes (decode triggers)
            out += ((rng.getrandbits(20) << 12) | 0x117).to_bytes(4, "little")
            out += rng.getrandbits(32).to_bytes(4, "big")
        elif c == 5:
            out += bytes([rng.choice([0xEF, 0x17, 0x97, 0x00, 0xFF])])
        elif c == 6:  # 16-bit slot: shifts every later candidate by 2
            out += rng.getrandbits(16).to_bytes(2, "little")
        else:
            out += bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 6)))
    return bytes(out[:n])


def _cli_riscv_raw(raw: bytes, start: int, decode: bool) -> bytes:
    """liblzma's own RISC-V transform (stdlib 3.11 exposes no
    FILTER_RISCV id, so the CLI is the reference): encode pipes raw
    through ``xz --format=raw --riscv`` and peels the LZMA2 stage with
    stdlib; decode wraps the bytes in stdlib raw-LZMA2 and lets the
    CLI apply [LZMA2, riscv-decode]."""
    chain = [f"--riscv=start={start}", "--lzma2=preset=0"]
    if decode:
        blob = lzma.compress(
            raw, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "preset": 0}])
        return subprocess.run(
            [_XZ_CLI, "-d", "--format=raw", *chain, "-c", "-q", "-q"],
            input=blob, capture_output=True, check=True).stdout
    blob = subprocess.run(
        [_XZ_CLI, "--format=raw", *chain, "-c", "-q", "-q"],
        input=raw, capture_output=True, check=True).stdout
    return lzma.decompress(
        blob, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 0}])


@needs_cli
def test_riscv_matches_liblzma_both_directions():
    """The RISC-V transform (derived black-box from liblzma — the spec
    registers only ID 0x0B and 2-byte alignment) matches liblzma
    byte-for-byte in BOTH directions: every conversion shape (JAL,
    AUIPC pack, x2 escape), every advance rule, and the 8-byte end
    guard are covered by the adversarial generator."""
    from modeltracking_spark.operators.bcj import (
        branch_bcj_decode,
        branch_bcj_encode,
    )

    rng = random.Random(47)
    fired = 0
    for trial in range(60):
        n = rng.randrange(0, 3000)
        raw = (_riscv_adversarial(rng, n) if trial % 2
               else bytes(rng.randrange(256) for _ in range(n)))
        start = rng.choice([0, 2, 4, 1024, 1 << 20, 1 << 31,
                            (1 << 32) - 2])
        ref_e = _cli_riscv_raw(raw, start, decode=False)
        assert branch_bcj_encode(0x0B, raw, start) == ref_e
        assert branch_bcj_decode(0x0B, ref_e, start) == raw
        ref_d = _cli_riscv_raw(raw, start, decode=True)
        assert branch_bcj_decode(0x0B, raw, start) == ref_d
        fired += ref_e != raw
    assert fired > 15


def test_riscv_self_inverse_and_edge_shapes():
    from modeltracking_spark.operators.bcj import (
        branch_bcj_decode,
        branch_bcj_encode,
    )

    rng = random.Random(53)
    for _ in range(60):
        raw = _riscv_adversarial(rng, rng.randrange(0, 2000))
        for start in (0, 2, 4096):
            enc = branch_bcj_encode(0x0B, raw, start)
            assert branch_bcj_decode(0x0B, enc, start) == raw
    # the scan's 8-byte end guard: a bare JAL in the last 6 bytes
    # stays unconverted (pinned against liblzma during derivation)
    jal = ((0x10 >> 1) << 21 | (1 << 7) | 0x6F).to_bytes(4, "little")
    assert branch_bcj_encode(0x0B, jal) == jal
    assert branch_bcj_encode(0x0B, jal + bytes(4)) != jal + bytes(4)


@needs_cli
def test_riscv_cli_streams_decode_from_spec():
    """Full .xz containers built by the CLI with --riscv chains (alone
    and stacked with delta) decode from spec through xz_decompress."""
    rng = random.Random(59)
    for args in (["--riscv", "--lzma2=preset=1"],
                 ["--riscv=start=4", "--lzma2=preset=0"],
                 ["--delta=dist=2", "--riscv", "--lzma2=preset=1"]):
        raw = _riscv_adversarial(rng, 30000)
        blob = subprocess.run(
            [_XZ_CLI, *args, "-c"],
            input=raw, capture_output=True, check=True).stdout
        assert xz_decompress(blob) == raw, args
