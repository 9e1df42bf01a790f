"""From-spec LZ4 block/frame + xxHash32: published test vectors,
roundtrip properties, nibble/extra-byte boundary enumeration,
hand-crafted streams (decoder independent of encoder), and loud
malformed-stream rejects — the inflate.py test discipline."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


# ------------------------------------------------------------------ xxh32


def test_xxh32_published_vectors():
    # vectors published with the xxHash project / python-xxhash README
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


def test_xxh32_seed_changes_hash_and_stripe_path():
    data = bytes(range(100))  # >16 bytes: exercises the accumulator loop
    assert xxh32(data, 0) != xxh32(data, 1)
    # 15 vs 16 bytes crosses the small/stripe threshold
    assert xxh32(data[:15]) != xxh32(data[:16])


# ------------------------------------------------------- block roundtrips


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"x",
        b"abcd",
        b"a" * 12,  # below the minimum matchable block size
        b"a" * 13,
        b"a" * 1000,  # long run: offset-1 overlap copy
        b"abcabcabcabcabcabcabcabc" * 10,
        bytes(range(256)) * 5,  # incompressible-ish
        b"the quick brown fox " * 50 + b"tail-literals",
    ],
)
def test_block_roundtrip(payload):
    comp = lz4_block_compress(payload)
    assert lz4_block_decompress(comp) == payload


@settings(max_examples=120, deadline=None)
@given(
    st.binary(max_size=400),
    st.binary(min_size=1, max_size=20),
    st.integers(min_value=0, max_value=60),
)
def test_block_roundtrip_hypothesis(prefix, motif, reps):
    payload = prefix + motif * reps + prefix[::-1]
    assert lz4_block_decompress(lz4_block_compress(payload)) == payload


def test_block_literal_extra_byte_boundaries():
    """Literal-length nibble saturation: 14 (inline), 15 (nibble 15 +
    extra 0), 269/270/271 (extra 254 / 255+0 / 255+1) — incompressible
    bytes so the whole payload is one literal run."""
    import random

    rng = random.Random(7)
    for lit in (14, 15, 16, 269, 270, 271, 524, 525, 526):
        payload = bytes(rng.randrange(256) for _ in range(lit))
        comp = lz4_block_compress(payload)
        assert lz4_block_decompress(comp) == payload
        token = comp[0]
        if lit < 15:
            assert token >> 4 == lit
        else:
            assert token >> 4 == 15
            extras, pos, rem = [], 1, lit - 15
            while True:
                extras.append(comp[pos])
                if comp[pos] != 255:
                    break
                pos += 1
            assert sum(extras) == rem


def test_block_match_extra_byte_boundaries():
    """Match-length nibble saturation: runs land match lengths at
    18/19/20 (inline max / +extra 0 / +extra 1) and 273/274/275
    (255-extra rollover). Run payloads: 8 literal header + 'a'*n so
    the match is offset-1 over the run."""
    for extra_span in (14, 15, 16, 269, 270, 271):
        mlen = 4 + extra_span
        payload = b"ABCDEFGH" + b"a" * (mlen + 4) + b"ZYXWV"
        assert lz4_block_decompress(lz4_block_compress(payload)) == payload


def test_block_offset_boundaries_handcrafted():
    """Decoder-only streams (no encoder in the loop): offset == output
    length (reach-back to byte 0), offset 1 (RLE), and a 65535-distance
    match assembled by hand."""
    # 4 literals "abcd", then match offset 4 len 4 -> "abcdabcd"
    s = bytes([0x40]) + b"abcd" + (4).to_bytes(2, "little") + bytes([0x50]) + b"tails"
    assert lz4_block_decompress(s) == b"abcdabcdtails"
    # offset 1 RLE: 1 literal "x", match len 8 -> "x"*9
    s = bytes([0x14]) + b"x" + (1).to_bytes(2, "little") + bytes([0x50]) + b"abcde"
    assert lz4_block_decompress(s) == b"x" * 9 + b"abcde"
    # 65535 back: 65535 literals then a 4-byte match to the start
    lit = (b"Q" + bytes(range(256)) * 256)[:65535]
    extras = []
    rem = 65535 - 15
    while rem >= 255:
        extras.append(255)
        rem -= 255
    extras.append(rem)
    stream = bytes([0xF0]) + bytes(extras) + lit
    stream += (65535).to_bytes(2, "little") + bytes([0x50]) + b"endli"
    out = lz4_block_decompress(stream)
    assert out == lit + lit[:4] + b"endli"


def test_block_overlap_copy_period_3():
    """Overlapped match with period 3 (offset < mlen): 'abc' then a
    20-byte match at offset 3 must cycle abcabc..."""
    s = bytes([0x3F]) + b"abc" + (3).to_bytes(2, "little") + bytes([1]) + bytes([0x50]) + b"12345"
    out = lz4_block_decompress(s)
    assert out == b"abc" + (b"abc" * 7)[:20] + b"12345"


def test_block_end_rules_respected_by_encoder():
    """Spec end rules on every emitted stream: decode tracks the last
    sequence — final run must be >= 5 literals when any match exists
    (all-literal short blocks exempt)."""
    payload = b"hello world hello world hello world!"
    comp = lz4_block_compress(payload)
    assert lz4_block_decompress(comp) == payload
    # walk the stream; the final sequence must be literals-only
    pos, last_lit = 0, None
    while pos < len(comp):
        token = comp[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                lit += comp[pos]
                pos += 1
                if comp[pos - 1] != 255:
                    break
        pos += lit
        if pos == len(comp):
            last_lit = lit
            break
        pos += 2
        m = token & 0xF
        if m == 15:
            while True:
                m += comp[pos]
                pos += 1
                if comp[pos - 1] != 255:
                    break
    assert last_lit is not None and last_lit >= 5


@pytest.mark.parametrize(
    "stream,msg",
    [
        (bytes([0x40]) + b"ab", "truncated LZ4 literals"),
        (bytes([0x40]) + b"abcd" + bytes([0, 0]), "invalid LZ4 offset 0"),
        (bytes([0x40]) + b"abcd" + (9).to_bytes(2, "little"), "before output start"),
        (bytes([0xF0]), "literal-length extras"),
        (bytes([0x40]) + b"abcd" + bytes([1]), "truncated LZ4 match offset"),
        (bytes([0x0F, 0x01, 0x00]), "before output start"),
    ],
)
def test_block_malformed_rejects(stream, msg):
    with pytest.raises(ValueError, match=msg):
        lz4_block_decompress(stream)


def test_block_bomb_guard():
    # 1 literal + offset-1 match of length 200 with max_out 50
    s = bytes([0x1F]) + b"x" + (1).to_bytes(2, "little") + bytes([200 - 4 - 15]) + bytes([0x50]) + b"abcde"
    with pytest.raises(ValueError, match="exceeds declared bound"):
        lz4_block_decompress(s, max_out=50)


# ---------------------------------------------------------------- frame


@pytest.mark.parametrize("bc,cc,cs", [(True, True, True), (False, False, False), (True, False, True)])
def test_frame_roundtrip_flag_matrix(bc, cc, cs):
    payload = b"frame me " * 400
    f = lz4_frame_compress(
        payload, block_checksum=bc, content_checksum=cc, content_size=cs
    )
    assert lz4_frame_decompress(f) == payload


def test_frame_multiblock_and_uncompressed_blocks():
    import random

    rng = random.Random(11)
    # incompressible: every block stored with the high bit
    payload = bytes(rng.randrange(256) for _ in range(150_000))
    f = lz4_frame_compress(payload, max_block=1 << 16)
    assert lz4_frame_decompress(f) == payload
    # compressible multi-block
    payload = b"abcdefgh" * 20_000
    f = lz4_frame_compress(payload, max_block=1 << 16)
    assert lz4_frame_decompress(f) == payload
    assert len(f) < len(payload) // 4


def test_frame_empty_and_magic_reject():
    assert lz4_frame_decompress(lz4_frame_compress(b"")) == b""
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00rest")


def test_frame_checksum_tamper_rejects():
    payload = b"checksummed content " * 100
    f = bytearray(lz4_frame_compress(payload))
    f[7] ^= 0xFF  # inside the first block's body
    with pytest.raises(ValueError, match="checksum mismatch"):
        lz4_frame_decompress(bytes(f))
    f = bytearray(lz4_frame_compress(payload))
    f[4] ^= 0x08  # flip the content-size flag: header checksum catches
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(f))
    f = bytearray(lz4_frame_compress(payload, block_checksum=False))
    f[-1] ^= 0x01  # content checksum byte
    with pytest.raises(ValueError, match="content checksum"):
        lz4_frame_decompress(bytes(f))


def test_frame_md5_determinism():
    payload = b"deterministic " * 1000
    a = lz4_frame_compress(payload)
    b = lz4_frame_compress(payload)
    assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()
