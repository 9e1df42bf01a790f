"""From-spec zstd (RFC 8878) vs the REFERENCE implementation: the
sandbox ships libzstd + the zstd CLI, so the decoder is validated
against reference-encoded frames across the level matrix, streaming /
ultra / long-window modes, and a golden shipped .tar.zst — and the
from-spec encoder's frames are decoded back by libzstd. Boundary and
reject batteries follow the codec-tier discipline."""

import os
import random
import subprocess

import pytest

from modeltracking_spark.operators.zstd import (
    _LL_DEFAULT,
    _ML_DEFAULT,
    _OF_DEFAULT,
    fse_build_decode_table,
    fse_build_encode_table,
    xxh64,
    zstd_compress,
    zstd_decompress,
)

_ZSTD_CLI = "/root/miniconda/bin/zstd"


def _libzstd():
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("zstd")
    if not name:
        return None
    lib = ctypes.CDLL(name)
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    return lib


_LIB = _libzstd()
needs_lib = pytest.mark.skipif(_LIB is None, reason="libzstd unavailable")
needs_cli = pytest.mark.skipif(
    not os.path.exists(_ZSTD_CLI), reason="zstd CLI unavailable"
)


def _ref_compress(raw: bytes, level: int = 3) -> bytes:
    import ctypes

    bound = _LIB.ZSTD_compressBound(len(raw))
    buf = ctypes.create_string_buffer(bound)
    n = _LIB.ZSTD_compress(buf, bound, raw, len(raw), level)
    assert not _LIB.ZSTD_isError(n)
    return buf.raw[:n]


def _ref_decompress(blob: bytes, n: int) -> bytes:
    import ctypes

    buf = ctypes.create_string_buffer(max(n, 1))
    m = _LIB.ZSTD_decompress(buf, n, blob, len(blob))
    assert not _LIB.ZSTD_isError(m), "libzstd rejected our frame"
    return buf.raw[:m]


def _payloads():
    rng = random.Random(4)
    return [
        b"",
        b"a",
        b"hello zstd world " * 60,
        bytes(range(256)) * 20,
        bytes(rng.randrange(256) for _ in range(4000)),
        (b"abcabcabc" * 600) + bytes(rng.randrange(256) for _ in range(200)),
        b"Z" * 100000,
        bytes(rng.randrange(65, 91) for _ in range(60000)),
    ]


def test_xxh64_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    # self-consistency across the three size regimes
    assert xxh64(b"abc") != xxh64(b"abd")
    data = bytes(range(200))
    assert xxh64(data) == xxh64(bytes(data))
    assert xxh64(data, seed=1) != xxh64(data)


@needs_lib
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_decoder_vs_reference_level_matrix(level):
    for raw in _payloads():
        assert zstd_decompress(_ref_compress(raw, level)) == raw


@needs_lib
def test_encoder_frames_accepted_by_reference():
    for raw in _payloads():
        blob = zstd_compress(raw)
        assert zstd_decompress(blob, max_output=1 << 22) == raw
        assert _ref_decompress(blob, len(raw)) == raw
        # checksum-free arm too
        blob2 = zstd_compress(raw, checksum=False)
        assert _ref_decompress(blob2, len(raw)) == raw


@needs_lib
def test_random_payload_sweep_both_directions():
    rng = random.Random(11)
    for i in range(40):
        n = rng.randrange(0, 30000)
        raw = (bytes(rng.randrange(256) for _ in range(n)) if i % 3 == 0
               else bytes(rng.choice(b"abcdefgh \n") for _ in range(n)))
        assert zstd_decompress(_ref_compress(raw, 1 + i % 9)) == raw
        ours = zstd_compress(raw)
        assert _ref_decompress(ours, n) == raw


@needs_cli
def test_cli_streaming_ultra_long_and_checksum_modes(tmp_path):
    rng = random.Random(9)
    raw = (b"The quick brown fox jumps over the lazy dog. " * 8000
           + bytes(rng.randrange(256) for _ in range(50000)))
    p = tmp_path / "payload"
    p.write_bytes(raw)
    for args in (["-1"], ["-19"], ["-3", "--no-check"],
                 ["--ultra", "-22"], ["-3", "--long=27"]):
        blob = subprocess.run(
            [_ZSTD_CLI] + args + ["-c", str(p)], capture_output=True
        ).stdout
        assert zstd_decompress(blob, max_output=1 << 24) == raw, args


@needs_cli
def test_golden_shipped_archive():
    g = ("/root/miniconda/pkgs/libarchive-3.8.2-h3ec8f01_0/info/recipe/"
         "test-archives/hello_world.tar.zst")
    if not os.path.exists(g):
        pytest.skip("golden archive not present")
    blob = open(g, "rb").read()
    ref = subprocess.run(
        [_ZSTD_CLI, "-d", "-c", g], capture_output=True
    ).stdout
    assert zstd_decompress(blob) == ref


def test_multi_frame_and_skippable():
    a = zstd_compress(b"first frame " * 30)
    skip = ((0x184D2A50).to_bytes(4, "little")
            + (7).to_bytes(4, "little") + b"ignored")
    b = zstd_compress(b"second")
    assert zstd_decompress(a + skip + b) == b"first frame " * 30 + b"second"


def test_predefined_fse_table_invariants():
    """RFC-normative construction: per-symbol cell counts equal the
    normalized counts (|-1| = 1), and each symbol's baselines tile its
    state subranges without overlap."""
    for norm, al in (_LL_DEFAULT, _ML_DEFAULT, _OF_DEFAULT):
        table = fse_build_decode_table(norm, al)
        size = 1 << al
        counts = {}
        for sym, _nb, _base in table:
            counts[sym] = counts.get(sym, 0) + 1
        for s, c in enumerate(norm):
            assert counts.get(s, 0) == (1 if c == -1 else max(c, 0)), (s, al)
        # every transition lands inside the table
        for sym, nb, base in table:
            assert 0 <= base and base + (1 << nb) <= size


def test_fse_encode_decode_state_machine_roundtrip():
    rng = random.Random(2)
    from modeltracking_spark.operators.zstd import _BackBits, _BitWriter, \
        _FseCState

    for norm, al in (_LL_DEFAULT, _ML_DEFAULT, _OF_DEFAULT,
                     ([16, 8, 4, 2, 1, 1], 5), ([28, 2, -1, -1], 5)):
        dec = fse_build_decode_table(norm, al)
        st_table, tt = fse_build_encode_table(norm, al)
        alpha = [i for i, c in enumerate(norm) if c]
        for _ in range(60):
            syms = [rng.choice(alpha) for _ in range(rng.randrange(1, 50))]
            bw = _BitWriter()
            st = _FseCState(st_table, tt, syms[-1])
            for s in reversed(syms[:-1]):
                st.encode(bw, s)
            st.flush(bw, al)
            bb = _BackBits(bw.close())
            state = bb.read(al)
            out = []
            for _ in syms:
                sym, nb, base = dec[state]
                out.append(sym)
                state = base + bb.read(nb)
            assert out == syms


def test_repeat_offset_semantics():
    """ll==0 rotates the repeat history one further (offset_value 1 ->
    rep2, 3 -> rep1 - 1): pin via a crafted sequence execution."""
    from modeltracking_spark.operators.zstd import _execute, _FrameCtx

    ctx = _FrameCtx()
    out = bytearray()
    lits = b"abcdefgh" + b"XY"
    # seq1: ll=8, ml=4, real offset 8 (ov=11): history -> [8, 1, 4]
    # seq2: ll=0, ov=1: the ll==0 shift selects rep2 (=1), overlap-copy
    # of the last byte; history -> [1, 8, 4]
    _execute(lits, [(8, 4, 11), (0, 3, 1)], ctx, out, 1 << 20)
    assert bytes(out) == b"abcdefghabcd" + b"ddd" + b"XY"
    assert ctx.rep == [1, 8, 4]
    ctx2 = _FrameCtx()
    out2 = bytearray()
    # seq1: offset 4, history [4, 1, 8]; seq2 ll==0 ov=3 -> rep1 - 1 = 3
    _execute(b"abcdefgh", [(8, 3, 4 + 3), (0, 3, 3)], ctx2, out2, 1 << 20)
    assert bytes(out2) == b"abcdefgh" + b"efg" + b"efg"
    assert ctx2.rep == [3, 4, 1]


def test_rejects_and_bomb_guard():
    good = zstd_compress(b"tamper target " * 50)
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00" + good)
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # checksum
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(bad))
    for cut in (3, 5, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            zstd_decompress(good[:cut])
    # reserved block type
    hdr = bytearray(zstd_compress(b"xyz", checksum=False))
    # frame: magic(4) fhd(1) fcs(1) then block header 3 bytes
    hdr[6] = (hdr[6] & ~0x06) | 0x06
    with pytest.raises(ValueError, match="reserved block type"):
        zstd_decompress(bytes(hdr))
    with pytest.raises(ValueError, match="max_output"):
        zstd_decompress(zstd_compress(b"A" * 200000), max_output=1000)
    with pytest.raises(NotImplementedError, match="dictionar"):
        # frame with dictionary id flag set and nonzero id
        frame = ((0xFD2FB528).to_bytes(4, "little")
                 + bytes([0x21, 0x07, 0x00]))  # single-seg, did=1 byte
        zstd_decompress(frame)


def test_frame_content_size_mismatch_rejects():
    blob = bytearray(zstd_compress(b"hello world!", checksum=False))
    blob[5] = 99  # declared FCS != actual
    with pytest.raises(ValueError, match="content size"):
        zstd_decompress(bytes(blob))


@needs_lib
def test_our_huffman_and_rle_literal_arms_accepted_by_reference():
    """The encoder's Huffman-literals (direct weights, 1- and
    4-stream) and RLE-literals arms must fire on shaped payloads AND
    decode identically under libzstd — reference validation of OUR
    entropy-coded sections."""
    from modeltracking_spark.operators.zstd import (
        _huffman_literals_section,
        _rle_literals_section,
    )

    rng = random.Random(1)
    skewed_small = bytes(rng.choice(b"abcdef") for _ in range(500))
    skewed_big = bytes(rng.choice(b"etaoin shrdlu") for _ in range(8000))
    assert _huffman_literals_section(skewed_small) is not None  # 1-stream
    assert _huffman_literals_section(skewed_big) is not None    # 4-stream
    assert _rle_literals_section(b"Q" * 400) is not None
    # >128 byte values cannot use direct weights: must fall back, not crash
    assert _huffman_literals_section(bytes(range(256)) * 4) is None
    for raw in (skewed_small, skewed_big,
                b"QQ" + b"Q" * 4000 + b"tail",
                skewed_big + bytes(range(128)) * 8):
        blob = zstd_compress(raw)
        assert zstd_decompress(blob, max_output=1 << 20) == raw
        assert _ref_decompress(blob, len(raw)) == raw


def test_truncated_literals_header_raises_valueerror_not_indexerror():
    """ADVICE r9: a block ending right after the first literals byte
    leaked IndexError through zstd_decompress; the contract is a
    descriptive ValueError for every malformed frame.

    Build a minimal frame whose single compressed block is exactly one
    byte long, for every (lit_type, size_format) pair that needs more
    header bytes than the block holds."""
    for lit_type in range(4):
        for size_fmt in range(4):
            b0 = lit_type | (size_fmt << 2)
            # frame header: magic + FHD(single-segment, FCS 1 byte)=0x20
            # + FCS=0 ... use window_descriptor form instead: FHD=0x00,
            # window byte 0x00, then one block header.
            block_hdr = (1 << 3) | (2 << 1) | 1  # size=1, Compressed, last
            frame = (
                b"\x28\xb5\x2f\xfd"  # magic
                + b"\x00"                # FHD: window descriptor present
                + b"\x00"                # smallest window
                + block_hdr.to_bytes(3, "little")
                + bytes([b0])
            )
            try:
                zstd_decompress(frame)
            except ValueError:
                pass  # the contract
            except IndexError as exc:  # pragma: no cover - the bug
                raise AssertionError(
                    f"IndexError leaked for lit_type={lit_type} "
                    f"size_fmt={size_fmt}: {exc}"
                )

