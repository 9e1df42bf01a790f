"""From-spec bzip2 decoder vs the stdlib encoder: every roundtrip
cross-validates two independent implementations of the public format.
RLE1/run-length boundaries, multi-block streams, and loud malformed
rejects — the inflate.py discipline."""

import bz2 as stdlib_bz2
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.bzip2 import bz2_decompress


@pytest.mark.parametrize("level", [1, 5, 9])
@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"x",
        b"hello world",
        b"abcabc" * 1000,
        bytes(range(256)) * 10,
    ],
)
def test_roundtrip_levels(level, payload):
    assert bz2_decompress(stdlib_bz2.compress(payload, level)) == payload


def test_rle1_run_boundaries():
    """Encoder-side RLE1 packs runs of >= 4 as 4+count: exercise run
    lengths 3/4/5/254/255/259/260 (the 251-extra cap forces a second
    group at 260) embedded between unique separators."""
    parts = []
    for i, run in enumerate((3, 4, 5, 254, 255, 259, 260, 1000)):
        parts.append(b"%d<" % i + bytes([65 + i]) * run + b">")
    payload = b"".join(parts)
    assert bz2_decompress(stdlib_bz2.compress(payload, 1)) == payload


def test_multiblock_stream_and_block_boundary_sizes():
    rng = random.Random(9)
    # incompressible ~= 1 byte/byte: level 1 blocks hold 100k, so
    # 250k spans 3 blocks; sizes straddling the boundary too
    for n in (99_990, 100_000, 100_010, 250_000):
        payload = bytes(rng.randrange(256) for _ in range(n))
        assert bz2_decompress(stdlib_bz2.compress(payload, 1)) == payload


def test_long_uniform_run_exercises_run_coding():
    payload = b"\x00" * 300_000 + b"end" + b"a" * 100_000
    assert bz2_decompress(stdlib_bz2.compress(payload, 1)) == payload


@settings(max_examples=60, deadline=None)
@given(
    st.binary(max_size=300),
    st.binary(min_size=1, max_size=16),
    st.integers(min_value=0, max_value=80),
)
def test_roundtrip_hypothesis(prefix, motif, reps):
    payload = prefix + motif * reps + prefix[::-1]
    assert bz2_decompress(stdlib_bz2.compress(payload, 1)) == payload


def test_bad_header_rejects():
    with pytest.raises(ValueError, match="stream header"):
        bz2_decompress(b"not a bzip2 stream")
    with pytest.raises(ValueError, match="stream header"):
        bz2_decompress(b"BZh0" + b"\x00" * 16)  # level digit out of range


def test_block_magic_and_crc_tamper_reject():
    good = stdlib_bz2.compress(b"tamper target " * 200, 1)
    bad = bytearray(good)
    bad[4] ^= 0xFF  # first byte of the block magic
    with pytest.raises(ValueError):
        bz2_decompress(bytes(bad))
    bad = bytearray(good)
    bad[-6] ^= 0x01  # inside the stream footer / CRC area
    with pytest.raises(ValueError):
        bz2_decompress(bytes(bad))
    # flip a bit mid-payload: must raise (CRC at worst), never return
    # wrong bytes silently
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0x10
    with pytest.raises(ValueError):
        bz2_decompress(bytes(bad))


def test_truncation_rejects():
    good = stdlib_bz2.compress(b"truncate me " * 500, 1)
    for cut in (5, len(good) // 2, len(good) - 3):
        with pytest.raises(ValueError):
            bz2_decompress(good[:cut])


def test_fast_crc_identity():
    import random

    from modeltracking_spark.operators.bzip2 import (
        _bz2_crc32_fast,
        bz2_crc32,
    )

    rng = random.Random(2)
    for n in (0, 1, 9, 255, 4096):
        d = bytes(rng.randrange(256) for _ in range(n))
        assert _bz2_crc32_fast(d) == bz2_crc32(d)


def test_un_rle1_count_byte_equals_run_byte():
    """Payload with runs whose RLE1 count byte EQUALS the run byte
    (e.g. 69 'A's encodes as AAAA + chr(65)): the decoder's rescan
    must honor the run-state reset after the count byte."""
    for run in (69, 70, 65, 4 + 65, 8, 9):
        payload = b"pre" + b"A" * run + b"post" + b"\x04" * 8
        assert bz2_decompress(stdlib_bz2.compress(payload, 1)) == payload


def test_multistream_concatenation_decodes_all():
    """pbzip2/lbzip2 emit concatenated BZh streams; decode must span
    them all (ADVICE r9: the first-footer return truncated 520->240
    bytes silently), matching stdlib bz2."""
    a, b, c = b"first stream " * 20, b"SECOND\x00stream" * 17, b"x"
    blob = (
        stdlib_bz2.compress(a, 1)
        + stdlib_bz2.compress(b, 9)  # mixed levels across streams
        + stdlib_bz2.compress(c, 2)
    )
    assert bz2_decompress(blob) == a + b + c == stdlib_bz2.decompress(blob)


def test_multistream_trailing_garbage_rejects():
    blob = stdlib_bz2.compress(b"payload" * 30, 1)
    with pytest.raises(ValueError, match="trailing bytes"):
        bz2_decompress(blob + b"\x01garbage")
    # a truncated second header is also garbage, not silence
    with pytest.raises(ValueError):
        bz2_decompress(blob + b"BZh")


def test_multistream_second_stream_tamper_rejects():
    blob1 = stdlib_bz2.compress(b"ok" * 50, 1)
    blob2 = bytearray(stdlib_bz2.compress(b"tamper me" * 40, 1))
    blob2[-2] ^= 0xFF  # corrupt second stream's footer CRC
    with pytest.raises(ValueError):
        bz2_decompress(blob1 + bytes(blob2))
