"""From-spec Brotli (RFC 7932) vs the REFERENCE implementation: the
sandbox ships libbrotlienc/libbrotlidec, so the decoder is validated
against reference-encoded streams across the full quality matrix 0-11,
window sizes 10-24, and all three encoder modes — text payloads at
high quality exercise the static dictionary, the word transforms, and
the UTF8 context mode end to end.  All 121 transforms are pitted one
by one against ``BrotliTransformDictionaryWord``.  Boundary and reject
batteries follow the codec-tier discipline (the corruption fuzz lives
in test_fuzz_codecs.py)."""

import ctypes
import ctypes.util
import random

import pytest

from modeltracking_spark.operators.brotli_dec import (
    _StaticData,
    brotli_decompress,
    transform_word,
)


def _libenc():
    try:
        enc = ctypes.CDLL(
            ctypes.util.find_library("brotlienc") or "libbrotlienc.so.1")
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_char_p]
        return enc
    except OSError:
        return None


_ENC = _libenc()
needs_enc = pytest.mark.skipif(_ENC is None, reason="libbrotlienc absent")


def _ref_compress(raw: bytes, quality: int = 5, lgwin: int = 22,
                  mode: int = 0) -> bytes:
    bound = len(raw) + (len(raw) >> 1) + 1024
    buf = ctypes.create_string_buffer(bound)
    n = ctypes.c_size_t(bound)
    assert _ENC.BrotliEncoderCompress(quality, lgwin, mode, len(raw), raw,
                                      ctypes.byref(n), buf)
    return buf.raw[:n.value]


def _payloads():
    rng = random.Random(1)
    return {
        "empty": b"",
        "one": b"a",
        "text": b"The quick brown fox jumps over the lazy dog. " * 50,
        "html": (b"<html><head><title>Example Domain</title></head><body>"
                 b"<p>This domain is for use in illustrative examples in "
                 b"documents.</p></body></html>" * 20),
        "rand": bytes(rng.randrange(256) for _ in range(5000)),
        "runs": b"A" * 10000 + b"B" * 3 + b"A" * 10000,
        "bytes": bytes(range(256)) * 40,
    }


@needs_enc
@pytest.mark.parametrize("quality", list(range(12)))
def test_quality_matrix_vs_reference(quality):
    for name, raw in _payloads().items():
        blob = _ref_compress(raw, quality=quality)
        assert brotli_decompress(blob, max_output=1 << 24) == raw, name


@needs_enc
def test_window_sizes_and_modes():
    text = b"the quick brown fox and some repeated structure " * 2000
    for lgwin in (10, 12, 16, 18, 22, 24):
        for q in (1, 5, 11):
            blob = _ref_compress(text, quality=q, lgwin=lgwin)
            assert brotli_decompress(blob, max_output=1 << 24) == text
    for mode in (0, 1, 2):  # generic / text / font
        blob = _ref_compress(text[:20000], quality=11, mode=mode)
        assert brotli_decompress(blob, max_output=1 << 24) == text[:20000]


@needs_enc
def test_random_payload_sweep():
    rng = random.Random(42)
    words = [b"table", b"window", b"the ", b"of ", b"examples",
             b"documents", b"\xe8\x80\x81"]
    for trial in range(120):
        n = rng.randrange(0, 8000)
        kind = trial % 4
        if kind == 0:
            raw = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            raw = b"".join(rng.choice(words) for _ in range(n // 5))
        elif kind == 2:
            raw = bytes(rng.choice(b"abcdefgh \n.") for _ in range(n))
        else:
            raw = b"Header: value\r\n" * (n // 15)
        blob = _ref_compress(raw, quality=rng.randrange(12),
                             lgwin=rng.choice((10, 18, 22)),
                             mode=rng.randrange(3))
        assert brotli_decompress(blob, max_output=1 << 24) == raw


def test_all_transforms_vs_reference():
    """Every one of the spec's 121 word transforms, pitted against
    BrotliTransformDictionaryWord over four word lengths."""
    s = _StaticData.load()
    if s.transforms is None:
        pytest.skip("libbrotlicommon absent")
    com = ctypes.CDLL(
        ctypes.util.find_library("brotlicommon") or "libbrotlicommon.so.1")
    com.BrotliTransformDictionaryWord.restype = ctypes.c_int
    com.BrotliTransformDictionaryWord.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int]
    com.BrotliGetTransforms.restype = ctypes.c_void_p
    trs = ctypes.c_void_p(com.BrotliGetTransforms())
    assert len(s.transforms) == 121  # RFC 7932 Appendix B
    for tid in range(len(s.transforms)):
        for wlen in (4, 7, 13, 24):
            word = s.dict_data[s.offsets[wlen]:s.offsets[wlen] + wlen]
            buf = ctypes.create_string_buffer(64)
            n = com.BrotliTransformDictionaryWord(buf, word, wlen, trs, tid)
            assert transform_word(word, s.transforms[tid]) == buf.raw[:n], (
                tid, wlen)


def test_context_lut_formula_agreement():
    """The closed-form Signed/LSB6/MSB6 context classes must agree with
    the spec table loaded from libbrotlicommon."""
    from modeltracking_spark.operators.brotli_dec import _signed_class

    s = _StaticData.load()
    if s.context_lut is None:
        pytest.skip("libbrotlicommon absent")
    lut = s.context_lut
    for b in range(256):
        assert lut[b] == b & 0x3F            # LSB6 lut0
        assert lut[256 + b] == 0             # LSB6 lut1
        assert lut[512 + b] == b >> 2        # MSB6 lut0
        assert lut[1536 + b] == _signed_class(b) << 3   # Signed lut0
        assert lut[1536 + 256 + b] == _signed_class(b)  # Signed lut1


@needs_enc
def test_rejects():
    blob = _ref_compress(b"tamper me " * 100, quality=9)
    with pytest.raises(ValueError):
        brotli_decompress(b"")
    for cut in (1, len(blob) // 2, len(blob) - 1):
        try:
            dec = brotli_decompress(blob[:cut], max_output=1 << 16)
            assert dec != b"tamper me " * 100  # truncated can't be whole
        except ValueError:
            pass
    with pytest.raises(ValueError, match="max_output"):
        brotli_decompress(_ref_compress(b"Z" * 400000, quality=5),
                          max_output=1000)
    # trailing garbage after the last meta-block
    with pytest.raises(ValueError, match="trailing"):
        brotli_decompress(_ref_compress(b"x", quality=5) + b"\x99")


@needs_enc
def test_metadata_and_empty_stream_shapes():
    # an ISLASTEMPTY-only stream decodes to b"" (quality 11 on empty)
    assert brotli_decompress(_ref_compress(b"", quality=11)) == b""
    # uncompressed meta-blocks appear at quality 0 on incompressible data
    rng = random.Random(7)
    raw = bytes(rng.randrange(256) for _ in range(70000))
    assert brotli_decompress(_ref_compress(raw, quality=0),
                             max_output=1 << 20) == raw


def test_subset_encoder_accepted_by_reference_and_self():
    """The from-spec literal-entropy encoder's streams decode exactly
    by BOTH the from-spec decoder and libbrotlidec across degenerate
    (1/2/3/4-symbol simple codes), entropy (complex header), store
    (incompressible), flat-code (degenerate code-length code), and
    multi-meta-block shapes."""
    import random

    from modeltracking_spark.operators.brotli_dec import (
        brotli_compress,
        brotli_store,
    )

    try:
        libdec = ctypes.CDLL(
            ctypes.util.find_library("brotlidec") or "libbrotlidec.so.1")
        libdec.BrotliDecoderDecompress.restype = ctypes.c_int
    except OSError:
        libdec = None

    def ref_dec(blob, cap):
        buf = ctypes.create_string_buffer(max(cap, 1))
        n = ctypes.c_size_t(cap)
        assert libdec.BrotliDecoderDecompress(
            len(blob), blob, ctypes.byref(n), buf) == 1
        return buf.raw[:n.value]

    rng = random.Random(3)
    cases = [
        b"", b"x", b"a" * 500, b"ab" * 300, b"abc" * 100 + b"d",
        bytes(rng.choice(b"wxyz") for _ in range(999)),
        b"The quick brown fox jumps over the lazy dog. " * 120,
        bytes(rng.randrange(256) for _ in range(6000)),   # store arm
        b"e" * 5000 + bytes(rng.randrange(256) for _ in range(50)),
        bytes(range(256)) * 32,                           # flat code
        b"structured log line level=INFO msg=hello \n" * 40000,
    ]
    for raw in cases:
        for encode in (brotli_compress, brotli_store):
            blob = encode(raw)
            assert brotli_decompress(blob, max_output=1 << 24) == raw
            if libdec is not None:
                assert ref_dec(blob, len(raw) + 16) == raw
    text = b"The quick brown fox jumps over the lazy dog. " * 120
    assert len(brotli_compress(text)) < len(text) * 2 // 3  # entropy pays


def test_subset_encoder_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from modeltracking_spark.operators.brotli_dec import brotli_compress

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=4000))
    def rt(raw):
        assert brotli_decompress(
            brotli_compress(raw), max_output=1 << 20
        ) == raw

    rt()


@needs_enc
def test_reference_encoder_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=3000), st.integers(0, 11))
    def rt(raw, q):
        assert brotli_decompress(
            _ref_compress(raw, quality=q), max_output=1 << 20
        ) == raw

    rt()


def test_metadata_meta_blocks_hand_built():
    """Metadata meta-blocks (MNIBBLES code 3) are never emitted by the
    reference encoder, so pin the path with hand-built bits: content
    is skipped byte-aligned and contributes zero output, both empty
    and length-coded forms, incl. a metadata + uncompressed sandwich."""

    def bits_to_bytes(bits):
        bits = list(bits)
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(sum(b << k for k, b in enumerate(bits[i:i + 8])))
        return bytes(out)

    term = bits_to_bytes([1, 1])  # ISLAST + ISLASTEMPTY

    def meta_header(payload: bytes, with_wbits: bool) -> list:
        bits = [0] if with_wbits else []  # WBITS = 16
        bits += [0, 1, 1, 0]  # ISLAST=0, MNIBBLES code 3, reserved=0
        nbytes = 1 if payload else 0
        bits += [nbytes & 1, (nbytes >> 1) & 1]
        if payload:
            v = len(payload) - 1
            bits += [(v >> k) & 1 for k in range(8)]
        return bits

    # empty metadata block, then the empty-last terminator
    blob = bits_to_bytes(meta_header(b"", True)) + term
    assert brotli_decompress(blob) == b""

    # metadata WITH payload followed by an uncompressed block
    payload = b"metadata!"
    body = b"hello brotli!"
    ub = [0, 0, 0]  # ISLAST=0, MNIBBLES=4
    w = len(body) - 1
    ub += [(w >> k) & 1 for k in range(16)]
    ub += [1]  # ISUNCOMPRESSED (aligns before the raw bytes)
    blob2 = (bits_to_bytes(meta_header(payload, True)) + payload
             + bits_to_bytes(ub) + body + term)
    assert brotli_decompress(blob2) == body
    # nonzero reserved bit rejects
    bad = meta_header(b"", True)
    bad[4] = 1  # the reserved bit
    with pytest.raises(ValueError, match="reserved"):
        brotli_decompress(bits_to_bytes(bad) + term)
