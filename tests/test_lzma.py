"""From-spec LZMA (.lzma alone) decoder vs the stdlib liblzma encoder:
every roundtrip cross-validates two independent implementations of the
public format (lzma-specification.txt). The lc/lp/pb model matrix,
rep-distance reuse, matched-literal paths, known-size headers, and
loud malformed rejects — the bzip2/inflate discipline."""

import hashlib
import lzma as stdlib_lzma
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.lzma_alone import (
    lzma_alone_decompress,
    parse_alone_header,
)


def _enc(raw: bytes, lc=3, lp=0, pb=2, preset=6) -> bytes:
    return stdlib_lzma.compress(
        raw,
        format=stdlib_lzma.FORMAT_ALONE,
        filters=[{
            "id": stdlib_lzma.FILTER_LZMA1,
            "preset": preset, "lc": lc, "lp": lp, "pb": pb,
        }],
    )


# every liblzma-legal corner of the property space (lc<=4, lp<=4,
# lc+lp<=4, pb<=4) plus the default — exercises literal-context splits,
# position masks, and the lc=0 arm where prev-byte context vanishes
_PROPS = [
    (3, 0, 2), (0, 0, 0), (1, 1, 1), (4, 0, 2),
    (0, 2, 0), (2, 0, 1), (4, 0, 4), (0, 4, 0), (2, 2, 3),
]


@pytest.mark.parametrize("lc,lp,pb", _PROPS)
@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"x",
        b"hello lzma world",
        b"abcabc" * 500,           # short-period rep matches
        bytes(range(256)) * 8,     # literal-heavy, full byte alphabet
    ],
)
def test_roundtrip_props_matrix(lc, lp, pb, payload):
    assert lzma_alone_decompress(_enc(payload, lc, lp, pb)) == payload


@pytest.mark.parametrize("preset", [0, 1, 6, 9])
def test_roundtrip_presets(preset):
    """Presets select different encoder match-finders (hc/bt) — the
    decode side must handle whatever stream shapes each emits."""
    raw = (b"the quick brown fox jumps over the lazy dog " * 120
           + bytes(range(256)) + b"tail" * 64)
    assert lzma_alone_decompress(_enc(raw, preset=preset)) == raw


def test_rep_distance_rotation():
    """Alternating between a small set of match distances drives the
    rep0..rep3 reuse paths (IsRepG0/G1/G2) hard: four interleaved
    periodic motifs re-reference four distinct recent distances."""
    a, b, c, d = b"alpha. ", b"bravo_bravo! ", b"charlie---", b"dd"
    raw = b"".join(
        a * 3 + b * 2 + c * 2 + d * 9 + a + c + b + d * 4
        for _ in range(40)
    )
    for lc, lp, pb in ((3, 0, 2), (0, 0, 0)):
        assert lzma_alone_decompress(_enc(raw, lc, lp, pb)) == raw


def test_matched_literal_after_match():
    """A literal immediately after a match decodes through the
    matched-literal model (state >= 7 probes the byte at rep0):
    near-periodic text with single-char perturbations lands there."""
    base = bytearray(b"0123456789" * 300)
    for i in range(7, len(base), 41):
        base[i] = (base[i] + 1) % 128 + 32
    raw = bytes(base)
    assert lzma_alone_decompress(_enc(raw)) == raw


def test_long_match_and_high_length_tree():
    """Runs long enough to hit the 8-bit high length tree (len > 18)
    and matches far enough for direct distance bits."""
    raw = (b"S" * 5000
           + bytes(random.Random(3).randrange(256) for _ in range(70000))
           + b"S" * 5000)
    assert lzma_alone_decompress(_enc(raw, preset=9)) == raw


def test_known_size_header_without_marker_read():
    """Patch the real byte count into the 8-byte size field: the
    decoder must stop exactly at the declared size via the size-known
    arm (the spec's marker-less termination for fixed-size headers)."""
    raw = b"declared size termination " * 90
    enc = bytearray(_enc(raw))
    enc[5:13] = len(raw).to_bytes(8, "little")
    assert lzma_alone_decompress(bytes(enc)) == raw


def test_header_parse_and_rejects():
    raw = b"header battery"
    enc = _enc(raw, lc=1, lp=1, pb=1)
    lc, lp, pb, _ds, size = parse_alone_header(enc)
    assert (lc, lp, pb) == (1, 1, 1)
    assert size == (1 << 64) - 1  # liblzma writes unknown size
    with pytest.raises(ValueError, match="header"):
        parse_alone_header(b"\x5d\x00\x00")
    bad = bytearray(enc)
    bad[0] = 225  # smallest invalid properties byte
    with pytest.raises(ValueError, match="properties"):
        lzma_alone_decompress(bytes(bad))
    bad = bytearray(enc)
    bad[13] = 1  # range coder init byte must be zero
    with pytest.raises(ValueError, match="init byte"):
        lzma_alone_decompress(bytes(bad))


def test_truncation_rejects():
    enc = _enc(b"truncate me please " * 60)
    for cut in (13, 14, 17, len(enc) // 2, len(enc) - 1):
        with pytest.raises(ValueError):
            lzma_alone_decompress(enc[:cut])


def test_declared_size_beyond_stream_rejects():
    """A known-size header claiming MORE bytes than the stream encodes
    must hit the end marker guard or truncation, not return short."""
    raw = b"short payload " * 20
    enc = bytearray(_enc(raw))
    enc[5:13] = (len(raw) + 1000).to_bytes(8, "little")
    with pytest.raises(ValueError):
        lzma_alone_decompress(bytes(enc))


def test_output_bound_guard():
    """max_output rejects a stream that keeps producing (bomb guard:
    highly repetitive input compresses tiny but expands huge)."""
    enc = _enc(b"A" * 200_000)
    with pytest.raises(ValueError, match="max_output"):
        lzma_alone_decompress(enc, max_output=1024)


@settings(max_examples=40, deadline=None)
@given(
    prefix=st.binary(max_size=60),
    motif=st.binary(min_size=1, max_size=24),
    reps=st.integers(min_value=0, max_value=400),
    idx=st.integers(min_value=0, max_value=8),
)
def test_roundtrip_hypothesis(prefix, motif, reps, idx):
    lc, lp, pb = _PROPS[idx]
    raw = prefix + motif * reps
    assert lzma_alone_decompress(_enc(raw, lc, lp, pb)) == raw


def test_stdlib_decoder_agrees_per_stream():
    """Twin-style pin: for a diverse fixture set, the from-spec decode
    equals stdlib liblzma's own decode of the same stream (two
    independent decoders, byte-for-byte)."""
    rng = random.Random(11)
    for i in range(20):
        n = rng.randrange(0, 3000)
        raw = (bytes(rng.randrange(256) for _ in range(n)) if i % 2
               else bytes([rng.randrange(65, 91)]) * n)
        lc, lp, pb = _PROPS[i % len(_PROPS)]
        enc = _enc(raw, lc, lp, pb)
        ours = lzma_alone_decompress(enc)
        theirs = stdlib_lzma.decompress(enc, format=stdlib_lzma.FORMAT_ALONE)
        assert hashlib.md5(ours).hexdigest() == hashlib.md5(theirs).hexdigest()
        assert ours == raw
