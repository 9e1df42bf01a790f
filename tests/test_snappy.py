"""From-spec Snappy block/framing + CRC-32C: RFC check value,
roundtrip properties, tag/length boundary enumeration, hand-crafted
streams (decoder independent of encoder), and loud malformed-stream
rejects — the inflate.py/lz4 test discipline."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.snappy import (
    crc32c,
    snappy_block_compress,
    snappy_block_decompress,
    snappy_frame_compress,
    snappy_frame_decompress,
)


# ------------------------------------------------------------------ crc32c


def test_crc32c_rfc_check_value():
    assert crc32c(b"123456789") == 0xE3069283  # RFC 3720 §B.4 check
    assert crc32c(b"") == 0
    # all-zeros and all-ones 32-byte vectors from RFC 3720 §B.4
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


# ------------------------------------------------------- block roundtrips


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"x",
        b"abc",
        b"abcd",
        b"a" * 1000,
        b"abcabcabcabc" * 20,
        bytes(range(256)) * 3,
        b"snappy " * 500 + b"tail",
    ],
)
def test_block_roundtrip(payload):
    assert snappy_block_decompress(snappy_block_compress(payload)) == payload


@settings(max_examples=120, deadline=None)
@given(
    st.binary(max_size=400),
    st.binary(min_size=1, max_size=20),
    st.integers(min_value=0, max_value=60),
)
def test_block_roundtrip_hypothesis(prefix, motif, reps):
    payload = prefix + motif * reps + prefix[::-1]
    assert snappy_block_decompress(snappy_block_compress(payload)) == payload


def test_literal_length_encoding_boundaries():
    """Literal tag inline/extra-byte boundaries: 60 (inline max), 61
    (1 extra byte), 256/257 (1->2 extra bytes), 65536/65537 (2->3)."""
    import random

    rng = random.Random(3)
    for n in (59, 60, 61, 255, 256, 257, 65535, 65536, 65537):
        payload = bytes(rng.randrange(256) for _ in range(n))
        comp = snappy_block_compress(payload)
        assert snappy_block_decompress(comp) == payload


def test_copy_length_split_boundaries():
    """Match lengths around the 64-byte copy cap and the no-1..3
    remainder rule: 64, 65 (61+4), 67 (63+4), 68 (64+4), 128."""
    for mlen in (4, 11, 12, 63, 64, 65, 66, 67, 68, 128, 129):
        payload = b"HEADERXY" + b"r" * (mlen + 8) + b"TAILERZW"
        assert snappy_block_decompress(snappy_block_compress(payload)) == payload


def test_handcrafted_streams_decode_exactly():
    # varint 8; literal "abcd" (tag (4-1)<<2=12); copy1 off 4 len 4:
    # tag ((0)&7)<<2 | (0<<5) | 1 = 0x01, offset byte 4
    s = bytes([8, 12]) + b"abcd" + bytes([0x01, 0x04])
    assert snappy_block_decompress(s) == b"abcdabcd"
    # varint 9; literal "x"; copy2 off 1 len 8: tag (8-1)<<2|2=0x1e
    s = bytes([9, 0]) + b"x" + bytes([0x1E]) + (1).to_bytes(2, "little")
    assert snappy_block_decompress(s) == b"x" * 9
    # copy4: varint 8; literal "wxyz"; tag (4-1)<<2|3=0x0f, 4-byte off 4
    s = bytes([8, 12]) + b"wxyz" + bytes([0x0F]) + (4).to_bytes(4, "little")
    assert snappy_block_decompress(s) == b"wxyzwxyz"
    # two-byte varint: 300 zeros as literal len 300 (extra 2 bytes)
    body = bytes([((59 + 2) << 2)]) + (299).to_bytes(2, "little") + b"\x00" * 300
    s = bytes([0xAC, 0x02]) + body  # varint(300) = 0xAC 0x02
    assert snappy_block_decompress(s) == b"\x00" * 300


@pytest.mark.parametrize(
    "stream,msg",
    [
        (b"", "truncated snappy varint"),
        (bytes([4, 12]) + b"ab", "truncated snappy literal"),
        (bytes([8, 12]) + b"abcd" + bytes([0x01]), "truncated snappy copy-1"),
        (bytes([8, 12]) + b"abcd" + bytes([0x02, 0x00, 0x00]), "offset 0"),
        (bytes([8, 12]) + b"abcd" + bytes([0x02, 0x09, 0x00]), "before output start"),
    ],
)
def test_block_malformed_rejects(stream, msg):
    with pytest.raises(ValueError, match=msg):
        snappy_block_decompress(stream)


def test_declared_length_must_match():
    comp = bytearray(snappy_block_compress(b"four"))
    comp[0] = 9  # declare 9, produce 4
    with pytest.raises(ValueError, match="declared 9 bytes, produced 4"):
        snappy_block_decompress(bytes(comp))


# ----------------------------------------------------------------- framing


def test_frame_roundtrip_and_multichunk():
    payload = b"framed snappy " * 3000  # 42000 bytes
    f = snappy_frame_compress(payload, max_chunk=1024)
    assert snappy_frame_decompress(f) == payload
    import random

    rng = random.Random(5)
    raw = bytes(rng.randrange(256) for _ in range(5000))  # incompressible
    f = snappy_frame_compress(raw, max_chunk=2048)
    assert snappy_frame_decompress(f) == raw
    assert f.count(b"\x01") >= 1  # at least one uncompressed chunk emitted


def test_frame_empty_and_skippable_chunks():
    assert snappy_frame_decompress(snappy_frame_compress(b"")) == b""
    # inject a padding chunk mid-stream: type 0xfe, 3 bytes of junk
    f = bytearray(snappy_frame_compress(b"hello world hello world"))
    pad = bytes([0xFE]) + (3).to_bytes(3, "little") + b"pad"
    f2 = f[:10] + pad + f[10:]
    assert snappy_frame_decompress(bytes(f2)) == b"hello world hello world"


def test_frame_crc_and_reserved_rejects():
    payload = b"crc guarded " * 200
    f = bytearray(snappy_frame_compress(payload))
    f[-1] ^= 0x01  # flip a byte in the last chunk body
    with pytest.raises(ValueError, match="CRC mismatch|declared|truncated|snappy"):
        snappy_frame_decompress(bytes(f))
    with pytest.raises(ValueError, match="stream identifier"):
        snappy_frame_decompress(b"\x00" * 16)
    # reserved unskippable chunk type 0x02
    good = snappy_frame_compress(b"ok")
    bad = good + bytes([0x02]) + (1).to_bytes(3, "little") + b"x"
    with pytest.raises(ValueError, match="reserved unskippable"):
        snappy_frame_decompress(bad)
