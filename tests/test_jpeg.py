"""From-spec baseline JPEG codec (operators/jpeg.py): exact roundtrip on
block-constant images (the oracle's contract), bounded error on
arbitrary images (the real AC path), golden determinism, spec-detail
pins (byte stuffing, DC prediction), and the loud rejects at the
libjpeg plug-in points."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.jpeg import (
    AC_BITS_C,
    AC_VALS_C,
    FLAT_Q8,
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_gray,
)


def _block_constant(rng_vals, h, w):
    """Build an image whose 8x8-aligned blocks are each constant."""
    bh, bw = -(-h // 8), -(-w // 8)
    bv = np.asarray(rng_vals, dtype=np.int64).reshape(bh, bw)
    return np.kron(bv, np.ones((8, 8), dtype=np.int64))[:h, :w].astype(np.uint8)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_block_constant_roundtrip_exact(data):
    h = data.draw(st.integers(1, 40), label="h")
    w = data.draw(st.integers(1, 40), label="w")
    bh, bw = -(-h // 8), -(-w // 8)
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=bh * bw, max_size=bh * bw)
    )
    img = _block_constant(vals, h, w)
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    assert dec.shape == (h, w)
    assert np.array_equal(dec, img)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_arbitrary_image_roundtrip_bounded_error(data):
    """q=1 keeps only DCT-coefficient rounding: max error stays small,
    which exercises the full AC Huffman path (runs, ZRL, EOB, negative
    coefficients) on content the exact oracle can't cover."""
    h = data.draw(st.integers(1, 48), label="h")
    w = data.draw(st.integers(1, 48), label="w")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img, quant=[1] * 64))
    assert dec.shape == (h, w)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_gradient_default_quant_reasonable():
    y, x = np.mgrid[0:33, 0:47]
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    # FLAT_Q8 quantization error bound: |err per coef| <= 4, and the
    # orthonormal IDCT spreads it; empirically <= 8 on this fixture
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 10


def test_golden_bytes_deterministic():
    """The encoder is a pure function — byte-identical across runs and
    hosts (no timestamps, no float nondeterminism in table emission)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b1 = encode_jpeg_gray(img)
    b2 = encode_jpeg_gray(img)
    assert b1 == b2
    assert hashlib.md5(b1).hexdigest() == "13631da7ea9e81d5e1619b31585080d1"
    # and the stream is a well-formed JFIF: SOI..EOI with APP0 first
    assert b1[:2] == b"\xff\xd8" and b1[2:4] == b"\xff\xe0"
    assert b1[-2:] == b"\xff\xd9"


def test_byte_stuffing_roundtrips():
    """An entropy stream that emits 0xFF bytes must stuff 0x00 after
    them and the decoder must strip it — hunt for a fixture that
    actually produces a stuffed byte, then roundtrip it."""
    found = False
    for seed in range(200):
        img = np.random.RandomState(seed).randint(0, 256, (16, 16)).astype(
            np.uint8
        )
        payload = encode_jpeg_gray(img, quant=[1] * 64)
        # entropy segment sits between SOS payload and EOI
        sos = payload.index(b"\xff\xda")
        if b"\xff\x00" in payload[sos + 14 : -2]:
            found = True
            dec = decode_jpeg_gray(payload)
            assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
            break
    assert found, "no fixture produced a stuffed 0xFF byte in 200 seeds"


def test_dc_prediction_chain_matters():
    """Blocks with identical values encode DC diff 0 after the first
    block; corrupting one DC bit would shift EVERY later block — decode
    equality across a 6-block image pins the prediction chain."""
    img = np.full((8, 48), 200, dtype=np.uint8)
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(img)), img)
    # and a rising staircase (positive and negative diffs both occur)
    stair = _block_constant([10, 250, 30, 220, 50, 199], 8, 48)
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(stair)), stair)


def test_rejects_are_loud_and_typed():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"hello world")
    # SOF2 now decodes; a zero-precision SOF2 stub is malformed instead
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg_gray(b"\xff\xd8\xff\xc2\x00\x0b" + bytes(9))
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_gray(b"\xff\xd8\xff\xc9\x00\x0b" + bytes(9))
    # a DRI with no frame/scan after it is malformed, not unimplemented
    with pytest.raises(ValueError, match="no SOF|no SOS"):
        decode_jpeg_gray(b"\xff\xd8\xff\xdd\x00\x04\x00\x10")
    # the greyscale-contract wrapper refuses a (valid) color stream
    color = encode_jpeg_color(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="greyscale"):
        decode_jpeg_gray(color)
    # CMYK (4-component) names the libjpeg plug-in point
    sof4 = b"\x08\x00\x10\x00\x10\x04" + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]
    )
    with pytest.raises(ValueError, match="component count 4"):
        decode_jpeg(
            b"\xff\xd8\xff\xc0" + (len(sof4) + 2).to_bytes(2, "big") + sof4
        )
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(encode_jpeg_gray(np.zeros((16, 16), np.uint8))[:-8])
    big = encode_jpeg_gray(np.random.RandomState(0).randint(
        0, 256, (24, 24)).astype(np.uint8), quant=[1] * 64)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(big[:-8])  # cut inside real entropy data
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((0, 8), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((8, 8, 3), np.uint8))  # color encode too


def test_quant_table_is_read_from_stream_not_assumed():
    """Decode must use the DQT carried in the file: the same image
    encoded with two different tables decodes to different (both
    plausible) pixels, and each stream self-describes."""
    y, x = np.mgrid[0:16, 0:16]
    img = ((x * 11 + y * 7) % 256).astype(np.uint8)
    d1 = decode_jpeg_gray(encode_jpeg_gray(img, quant=[1] * 64))
    d8 = decode_jpeg_gray(encode_jpeg_gray(img, quant=FLAT_Q8))
    assert np.abs(d1.astype(int) - img.astype(int)).max() <= np.abs(
        d8.astype(int) - img.astype(int)
    ).max()


# ---------------------------------------------------------------------------
# 3-component color pipeline (round 7: encode_jpeg_color / decode_jpeg)
# ---------------------------------------------------------------------------


def test_chroma_huffman_table_is_complete():
    """The Annex-K chrominance AC table must cover every symbol the
    encoder can emit: EOB, ZRL, and all (run 0..15, size 1..10)."""
    need = {0x00, 0xF0} | {(r << 4) | s for r in range(16)
                           for s in range(1, 11)}
    assert sum(AC_BITS_C) == len(AC_VALS_C) == 162
    assert set(AC_VALS_C) == need
    assert len(set(AC_VALS_C)) == 162  # no duplicate symbols


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_grey_content_color_roundtrip_exact_both_subsamplings(data):
    """R=G=B block-constant content is bit-exact through the FULL color
    pipeline (chroma exactly 128): 4:4:4 with 8-grain blocks, 4:2:0
    with 8-grain blocks (four distinct Y DC predictions per MCU)."""
    sub = data.draw(st.sampled_from(["444", "420"]), label="subsampling")
    h = data.draw(st.integers(1, 40), label="h")
    w = data.draw(st.integers(1, 40), label="w")
    bh, bw = -(-h // 8), -(-w // 8)
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=bh * bw, max_size=bh * bw)
    )
    gray = _block_constant(vals, h, w)
    img = np.stack([gray] * 3, axis=2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_color(img, subsampling=sub))
    assert dec.shape == (h, w, 3)
    assert np.array_equal(dec, img)


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_colored_content_roundtrip_bounded_error(data):
    """Actual colored content through 4:4:4 q=1: forward+inverse color
    transform and coefficient rounding stay within a few counts."""
    h = data.draw(st.integers(1, 32), label="h")
    w = data.draw(st.integers(1, 32), label="w")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    img = np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)
    ).astype(np.uint8)
    dec = decode_jpeg(
        encode_jpeg_color(img, quant=[1] * 64, subsampling="444")
    )
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_chroma_subsampling_smooths_not_breaks():
    """4:2:0 on a smooth color ramp: chroma is 2x2-averaged + nearest
    upsampled, so error stays small; the Y plane is untouched."""
    y, x = np.mgrid[0:33, 0:47]
    img = np.stack(
        [(x * 2 + 40) % 256, (y * 2 + 10) % 256, (x + y) % 256], axis=2
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_color(img, quant=[1] * 64,
                                        subsampling="420"))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_color_stream_structure():
    """The emitted stream self-describes: two DQTs, four DHTs, a
    3-component SOF0 with 2x2/1x1/1x1 sampling, 3-component SOS."""
    payload = encode_jpeg_color(np.zeros((20, 20, 3), np.uint8),
                                subsampling="420")
    assert payload.count(b"\xff\xdb") == 2  # DQT luma + chroma
    assert payload.count(b"\xff\xc4") == 4  # DC0 AC0 DC1 AC1
    sof = payload.index(b"\xff\xc0")
    body = payload[sof + 4 :]
    assert body[5] == 3  # components
    assert body[7] == 0x22 and body[10] == 0x11 and body[13] == 0x11
    assert decode_jpeg(payload).shape == (20, 20, 3)


def test_bad_sampling_factors_reject():
    """A component whose sampling does not divide the frame maxima is a
    malformed stream, not a crash."""
    payload = bytearray(encode_jpeg_color(np.zeros((8, 8, 3), np.uint8),
                                          subsampling="420"))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 4 + 10] = 0x33  # Cb sampling 3x3 over maxima 2x2? no:
    # 3 > 2 makes Cb the max and Y's 2 no longer divides 3
    with pytest.raises(ValueError, match="does not divide"):
        decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# restart intervals (round 7 follow-up): DRI/RSTn — baseline JPEG's
# parallel-decode / error-containment mechanism
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_restart_interval_roundtrip_exact(data):
    ri = data.draw(st.integers(1, 7), label="restart_interval")
    h = data.draw(st.integers(1, 40), label="h")
    w = data.draw(st.integers(1, 40), label="w")
    bh, bw = -(-h // 8), -(-w // 8)
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=bh * bw, max_size=bh * bw)
    )
    img = _block_constant(vals, h, w)
    payload = encode_jpeg_gray(img, restart_interval=ri)
    assert np.array_equal(decode_jpeg(payload), img)
    # DRI segment is present iff segments exist
    assert (b"\xff\xdd" in payload)
    cimg = np.stack([img] * 3, axis=2)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_color(cimg, subsampling="420",
                                      restart_interval=ri)),
        cimg,
    )


def test_restart_sequence_numbers_wrap_and_verify():
    """36 single-MCU segments exercise the RST0..RST7 wrap; swapping
    two RST markers must fail the sequence check (a dropped segment is
    detected, not silently mis-assembled)."""
    img = _block_constant(list(range(36)), 48, 48)
    payload = bytearray(encode_jpeg_gray(img, restart_interval=1))
    assert np.array_equal(decode_jpeg(bytes(payload)), img)
    # find the first two RST markers and swap their sequence numbers
    idx = []
    for i in range(len(payload) - 1):
        if payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7:
            idx.append(i + 1)
            if len(idx) == 2:
                break
    payload[idx[0]], payload[idx[1]] = payload[idx[1]], payload[idx[0]]
    with pytest.raises(ValueError, match="restart sequence broken"):
        decode_jpeg(bytes(payload))


def test_restart_resets_dc_prediction():
    """Each segment must re-predict DC from 0: decoding any segment
    only needs its own bytes. Verify by checking the stream decodes
    identically when the FIRST segment's blocks change (the second
    segment's bytes are unchanged AND still decode to the same
    pixels)."""
    a = _block_constant([10, 20, 200, 210], 8, 32)
    b = _block_constant([90, 80, 200, 210], 8, 32)
    pa = encode_jpeg_gray(a, restart_interval=2)
    pb = encode_jpeg_gray(b, restart_interval=2)
    # the tail (second segment: blocks 3-4 + EOI) is byte-identical
    # because its DC chain restarts at 0 — independence made visible
    ra = pa[pa.index(b"\xff\xd0"):]
    rb = pb[pb.index(b"\xff\xd0"):]
    assert ra == rb
    assert np.array_equal(decode_jpeg(pa), a)
    assert np.array_equal(decode_jpeg(pb), b)


# ---------------------------------------------------------------------------
# progressive JPEG (round 7 follow-up): SOF2 both directions
# ---------------------------------------------------------------------------
from modeltracking_spark.operators.jpeg import encode_jpeg_progressive


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_progressive_equals_baseline_bit_exact_gray(data):
    """The same image encoded progressively (5-scan script: DC first at
    Al=1, banded AC first scans, DC+AC refinement) and baseline decodes
    to IDENTICAL pixels — the two streams carry the same quantized
    coefficients, so any divergence is an entropy-layer bug."""
    h = data.draw(st.integers(1, 40), label="h")
    w = data.draw(st.integers(1, 40), label="w")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    q = data.draw(st.sampled_from(["q1", "q8"]), label="quant")
    quant = [1] * 64 if q == "q1" else None
    img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img, quant=quant))
    prog = decode_jpeg(encode_jpeg_progressive(img, quant=quant))
    assert np.array_equal(base, prog)


@settings(max_examples=16, deadline=None)
@given(st.data())
def test_progressive_equals_baseline_bit_exact_color(data):
    sub = data.draw(st.sampled_from(["444", "420"]), label="subsampling")
    h = data.draw(st.integers(1, 32), label="h")
    w = data.draw(st.integers(1, 32), label="w")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(
        np.uint8
    )
    base = decode_jpeg(encode_jpeg_color(img, quant=[1] * 64,
                                         subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quant=[1] * 64,
                                               subsampling=sub))
    assert np.array_equal(base, prog)


def test_progressive_block_constant_exact_and_structure():
    """Block-constant grey content is bit-exact end to end through the
    progressive path (the oracle contract extends to SOF2), and the
    stream self-describes: SOF2 marker, five+ SOS scans."""
    img = _block_constant(list(range(12)), 24, 32)
    payload = encode_jpeg_progressive(img)
    assert payload.count(b"\xff\xc2") == 1  # SOF2, not SOF0
    assert payload.count(b"\xff\xda") == 5  # the 5-scan grey script
    assert np.array_equal(decode_jpeg(payload), img)
    cimg = np.stack([img] * 3, axis=2)
    cpayload = encode_jpeg_progressive(cimg, subsampling="420")
    assert cpayload.count(b"\xff\xda") == 1 + 3 + 3 + 1 + 3  # color script
    assert np.array_equal(decode_jpeg(cpayload), cimg)


def test_progressive_truncated_scans_are_loud():
    img = np.random.RandomState(5).randint(0, 256, (24, 24)).astype(np.uint8)
    payload = encode_jpeg_progressive(img, quant=[1] * 64)
    # cut inside the last scan: the AC refinement must hit a loud error
    with pytest.raises(ValueError):
        decode_jpeg(payload[:-40])
    # dropping EVERYTHING after the 2nd scan leaves no EOI
    second_sos = payload.index(b"\xff\xda", payload.index(b"\xff\xda") + 2)
    with pytest.raises(ValueError):
        decode_jpeg(payload[:second_sos])


def test_422_subsampling_both_paths():
    """4:2:2 (chroma halved horizontally only): 2-Y MCUs encode, the
    generic decoder reconstructs; grey block-constant content stays
    exact, colored content stays within tolerance."""
    img = _block_constant(list(range(24)), 31, 42)
    cimg = np.stack([img] * 3, axis=2).astype(np.uint8)
    payload = encode_jpeg_color(cimg, subsampling="422")
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 4 + 7] == 0x21  # Y sampling 2x1
    assert np.array_equal(decode_jpeg(payload), cimg)
    y, x = np.mgrid[0:25, 0:37]
    col = np.stack([(x * 2) % 256, (y * 3) % 256, (x + y) % 256],
                   axis=2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_color(col, quant=[1] * 64,
                                        subsampling="422"))
    assert np.abs(dec.astype(int) - col.astype(int)).max() <= 4


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_12bit_precision_roundtrips(data):
    """12-bit greyscale (level shift 2048, extended flat DC/AC tables —
    Annex K only ships 8-bit examples): block-constant content exact,
    random content within one count at q=1; uint16 in, uint16 out."""
    h = data.draw(st.integers(1, 32), label="h")
    w = data.draw(st.integers(1, 32), label="w")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.RandomState(seed)
    bh, bw = -(-h // 8), -(-w // 8)
    bv = rng.randint(0, 4096, (bh, bw))
    img = np.kron(bv, np.ones((8, 8), dtype=int))[:h, :w].astype(np.uint16)
    payload = encode_jpeg_gray(img, precision=12)
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 4] == 12  # SOF precision byte
    dec = decode_jpeg(payload)
    assert dec.dtype == np.uint16 and np.array_equal(dec, img)
    noisy = rng.randint(0, 4096, (h, w)).astype(np.uint16)
    dec = decode_jpeg(encode_jpeg_gray(noisy, quant=[1] * 64, precision=12))
    assert np.abs(dec.astype(int) - noisy.astype(int)).max() <= 2


def test_12bit_rejects():
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg_gray(np.full((8, 8), 5000, np.uint16), precision=12)
    with pytest.raises(ValueError, match="precision 10"):
        encode_jpeg_gray(np.zeros((8, 8), np.uint8), precision=10)


def test_entropy_stream_ending_on_stuffed_ff_boundary():
    """VERDICT r7 item 2 (JPEG arm): the entropy segment ENDING with a
    stuffed FF00 immediately before EOI (or before an RSTn) is the
    marker-adjacent analog of the GIF widen-boundary desync. Enumerate
    deterministically: (a) _BitWriter flush paths that end on 0xFF must
    stuff; (b) hunt the first fixtures whose final entropy byte is a
    stuffed FF at EOI and at a restart marker, and roundtrip both."""
    from modeltracking_spark.operators.jpeg import _BitWriter

    # (a) writer-level: a byte equal to FF from data bits, and from
    # pad-to-byte 1-bit padding, both stuff
    w = _BitWriter()
    w.put(0xFF, 8)
    assert bytes(w.out) == b"\xff\x00"
    w2 = _BitWriter()
    w2.put(0x7F, 7)  # seven 1-bits; pad adds the eighth
    assert w2.flush() == b"\xff\x00"

    # (b) whole-stream: final entropy byte stuffed right before EOI
    found_eoi = False
    for seed in range(400):
        img = np.random.RandomState(seed).randint(0, 256, (8, 8)).astype(
            np.uint8
        )
        payload = encode_jpeg_gray(img, quant=[1] * 64)
        assert payload[-2:] == b"\xff\xd9"
        if payload[-4:-2] == b"\xff\x00":
            dec = decode_jpeg_gray(payload)
            assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
            found_eoi = True
            break
    assert found_eoi, "no fixture ended its entropy stream on FF00"

    # and stuffed FF directly before a restart marker
    found_rst = False
    for seed in range(800):
        img = np.random.RandomState(10_000 + seed).randint(
            0, 256, (8, 24)
        ).astype(np.uint8)
        payload = encode_jpeg_gray(img, quant=[1] * 64,
                                   restart_interval=1)
        sos = payload.index(b"\xff\xda")
        ent = payload[sos + 14:]
        for i in range(len(ent) - 3):
            if (ent[i] == 0xFF and ent[i + 1] == 0x00
                    and ent[i + 2] == 0xFF and 0xD0 <= ent[i + 3] <= 0xD7):
                found_rst = True
                break
        if found_rst:
            dec = decode_jpeg_gray(payload)
            assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
            break
    assert found_rst, "no fixture put a stuffed FF directly before RSTn"


def test_oracled_fixture_family_contains_stuffed_bytes():
    """VERDICT r7 item 6 (JPEG arm): the jpeg_decode_stats_docs fixture
    family (block value (d*13 + bx*127 + by*199) % 256) must contain
    doc_ids whose entropy segment carries a stuffed FF00, so the
    driver's CORRECTNESS gate — not just pytest — exercises
    byte-stuffing removal. Each such doc must still decode bit-exactly
    (the block-constant exactness contract)."""
    hits = []
    for d in range(500):
        w, h = d % 21 + 4, d % 17 + 4
        bw, bh = -(-w // 8), -(-h // 8)
        by, bx = np.mgrid[0:bh, 0:bw]
        bv = (d * 13 + bx * 127 + by * 199) % 256
        img = np.kron(bv, np.ones((8, 8), dtype=np.int64))[:h, :w].astype(
            np.uint8
        )
        p = encode_jpeg_gray(img)
        sos = p.index(b"\xff\xda")
        if b"\xff\x00" in p[sos + 14:-2]:
            hits.append(d)
            assert np.array_equal(decode_jpeg_gray(p), img), f"doc {d}"
    assert hits == [10, 49, 186, 207, 245, 247, 265, 266, 267, 305], hits
