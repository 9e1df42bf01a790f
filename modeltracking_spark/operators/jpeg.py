"""Pure-numpy BASELINE JPEG codec (extension surface; SURVEY.md §2.12
multimodal tier) — the real compressed-image decode path, from the
public ITU-T T.81 spec (+ JFIF 1.02), same playbook as the BMP/WAV/Y4M
codecs in :mod:`operators/multimodal` and the classic-netCDF reader.

Scope: BASELINE sequential DCT (SOF0), 8-bit, restart intervals
(DRI/RSTn — the spec's unit of independently-decodable parallelism,
with per-segment DC-predictor resets and sequence-number verification),
with the standard zigzag order, differential DC + run-length AC Huffman
entropy coding (Annex F), byte stuffing (FF 00), and Annex K's example
luminance AND chrominance Huffman tables on the encode side (the
decoder always builds its tables from the file's DHT segments, never
from assumptions). Greyscale (1 component) and YCbCr color (3
components) both encode and decode: ``encode_jpeg_color`` emits 4:4:4,
4:2:2, or 4:2:0 interleaved-MCU streams with separate luma/chroma quant and
Huffman tables; ``decode_jpeg`` runs the generic interleaved-MCU loop
for any sampling grid whose factors divide the frame maxima (4:4:4,
4:2:0, 4:2:2, ...), nearest-neighbor chroma upsampling, and the JFIF
(BT.601 full-range) color transforms. PROGRESSIVE (SOF2) frames
encode and decode too — ``encode_jpeg_progressive`` emits a five-stage
scan script (DC first with point transform, per-band AC first scans,
DC refinement, AC refinement), and the decoder replays any scan script
via the four T.81 G.1.2 scan kinds (EOB runs, correction bits, the
BR/BE buffered-bit discipline), greyscale and color, converging to the
SAME coefficients as a baseline encoding — progressive and baseline
decodes of one image are bit-identical, which the tests assert.
What this codec does not cover rejects LOUDLY at the exact point a
PIL/libjpeg decoder would plug in: arithmetic-coded (SOF9+) scans
raise ``NotImplementedError``; CMYK (4-component) and malformed
streams raise descriptive errors. Precision 12 (greyscale, level
shift 2048, extended flat Huffman tables) encodes and decodes as
uint16.

Exactness contract (what the SQL oracle leans on): for an image whose
8x8 blocks are each CONSTANT, every AC coefficient is 0 and the DC
coefficient is exactly 8·(v−128); with a quantization table whose DC
entry divides 8 the full encode→decode roundtrip is bit-exact (float
error through the orthonormal (I)DCT is ~1e-13, absorbed by the final
round-to-nearest). Non-constant blocks roundtrip within a quantization
tolerance — pinned by hypothesis tests, not by the oracle.

Scale posture: the codec is called per payload inside Arrow-batched
``mapInPandas`` (operators/multimodal.py style) — a narrow map, no
shuffle; payload bytes never leave the executor.
"""

from __future__ import annotations

import struct

#: zigzag scan order (T.81 Figure 5): zigzag index -> (row, col) flat index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.3.1 — example luminance DC table: BITS (# codes per length
#: 1..16) and HUFFVAL (symbols in code order)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]

#: Annex K.3.2 — example luminance AC table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: the exactness-preserving quantization table used by the fixture
#: builder: every entry 8, so a DC of 8·(v−128) quantizes to exactly
#: v−128 (see module docstring)
FLAT_Q8 = [8] * 64




def _malformed_guard(kind):
    """Decorator: low-level parse crashes on corrupt bytes (struct
    under-reads, index overruns, absurd header values) surface as ONE
    descriptive ValueError instead of leaking IndexError/KeyError/
    OverflowError internals — the loud-reject contract, fuzz-enforced
    in tests/test_fuzz_codecs.py."""
    import functools
    import struct as _struct

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **kw):
            try:
                return fn(*a, **kw)
            except (ValueError, NotImplementedError):
                raise
            except (_struct.error, IndexError, KeyError, OverflowError,
                    ZeroDivisionError, MemoryError) as exc:
                raise ValueError(
                    f"malformed {kind} stream: "
                    f"{type(exc).__name__}: {exc}"
                ) from exc
        return wrapped
    return deco

def _dct_matrix():
    """Orthonormal 8x8 DCT-II basis A: A[i,j] = 0.5·c(i)·cos((2j+1)iπ/16),
    c(0)=1/√2 — forward F = A·f·Aᵀ, inverse f = Aᵀ·F·A (T.81 A.3.3)."""
    import numpy as np

    j = np.arange(8)
    a = 0.5 * np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / 16.0)
    a[0, :] = 0.5 / np.sqrt(2.0)
    return a


def _build_codes(bits, vals):
    """T.81 Annex C code assignment: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, vals):
    """Decoder tables per T.81 F.2.2.3: MINCODE/MAXCODE/VALPTR by length."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1] == 0:
            maxcode[length] = -1
        else:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC value (T.81 F.1.2.1):
    negatives append v + 2^s − 1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def pad_to_byte(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def marker(self, m: int):
        """Emit a raw marker (byte-aligned, NOT byte-stuffed) — used for
        RSTn between restart segments."""
        self.pad_to_byte()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG after FF")
                m = self.data[self.pos]
                if m == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= m <= 0xD7:
                    raise ValueError(
                        f"restart marker RST{m - 0xD0} inside an entropy "
                        "segment (MCU count disagrees with the DRI interval)"
                    )
                else:
                    raise ValueError(f"unexpected marker FF{m:02X} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def restart(self) -> int:
        """Byte-align (discarding the pad bits), consume an RSTn marker,
        and return n — the segment boundary of a DRI stream (T.81
        E.2.4/F.2.2.5): every restart segment is independently
        decodable, which is baseline JPEG's unit of parallel decode."""
        self.n = 0  # drop pad bits
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated JPEG at expected restart marker")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or not 0xD0 <= b1 <= 0xD7:
            raise ValueError(
                f"expected RSTn marker, found {b0:02X}{b1:02X}"
            )
        self.pos += 2
        return b1 - 0xD0

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, tbl) -> int:
        """Decode one Huffman symbol (T.81 F.2.2.3 DECODE procedure)."""
        mincode, maxcode, valptr, vals = tbl
        code = self.bit()
        for length in range(1, 17):
            if maxcode[length] != -1 and code <= maxcode[length]:
                return vals[valptr[length] + code - mincode[length]]
            code = (code << 1) | self.bit()
        raise ValueError("invalid JPEG Huffman code")

    def extend(self, v: int, s: int) -> int:
        """T.81 F.2.2.1 EXTEND: map s appended bits back to signed."""
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


#: Annex K.3.3.1 — example chrominance DC table
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]

#: Annex K.3.3.2 — example chrominance AC table (162 symbols; coverage
#: of every (run, size) symbol plus EOB/ZRL is asserted in pytest)
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _check_quant(q):
    q = list(q) if q is not None else list(FLAT_Q8)
    if len(q) != 64 or any(not 1 <= int(x) <= 255 for x in q):
        raise ValueError("quant must be 64 values in 1..255")
    return q


def _qmat(q):
    import numpy as np

    m = np.empty(64)
    m[ZIGZAG] = q  # zigzag-order table -> natural-order matrix
    return m.reshape(8, 8)


def _pad_plane(a, mult: int):
    """Edge-replicate a float plane up to multiples of ``mult``."""
    import numpy as np

    h, w = a.shape
    H = -(-h // mult) * mult
    W = -(-w // mult) * mult
    out = np.empty((H, W), dtype=np.float64)
    out[:h, :w] = a
    out[h:, :w] = a[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _encode_block(bwr, blk, qmat, A, dc_codes, ac_codes, prev_dc: int) -> int:
    """DCT + quantize + entropy-code one level-shifted 8x8 block; returns
    the new DC predictor."""
    import numpy as np

    coef = np.round((A @ blk @ A.T) / qmat).astype(np.int64)
    zz = coef.reshape(64)[ZIGZAG]
    # DC: differential, category + appended bits
    s, extra = _magnitude(int(zz[0]) - prev_dc)
    prev_dc = int(zz[0])
    code, ln = dc_codes[s]
    bwr.put(code, ln)
    if s:
        bwr.put(extra, s)
    # AC: run-length of zeros + (run, size) symbols
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bwr.put(code, ln)
            run -= 16
        s, extra = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bwr.put(code, ln)
        bwr.put(extra, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bwr.put(code, ln)
    return prev_dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg_gray(pixels, quant=None, restart_interval: int = 0,
                     precision: int = 8) -> bytes:
    """(h, w) uint8 greyscale array -> baseline JFIF bytes.
    ``precision=12`` encodes a uint16 array of 0..4095 samples (level
    shift 2048; DC diff categories reach 15, so the extended flat DC
    table below is emitted instead of Annex K's 8-bit one).

    ``quant``: 64 quantization values in zigzag order (default
    ``FLAT_Q8``). Partial edge blocks are padded by edge replication
    before the DCT (the standard encoder recommendation), so a
    block-constant image stays block-constant through padding.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (with DC-predictor reset) every that-many MCUs — the spec's unit of
    independently-decodable parallelism and error containment."""
    import numpy as np

    if precision not in (8, 12):
        raise ValueError(f"precision {precision} unsupported (8 or 12)")
    a = np.asarray(pixels, dtype=np.uint8 if precision == 8 else np.uint16)
    if a.ndim != 2:
        raise ValueError(f"expected (h, w) greyscale array, got {a.shape}")
    if precision == 12 and int(a.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be 0..4095")
    h, w = a.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    level = 1 << (precision - 1)
    q = _check_quant(quant)
    padded = _pad_plane(a.astype(np.float64), 8)
    A = _dct_matrix()
    qmat = _qmat(q)
    if precision == 8:
        dc_bits, dc_vals = DC_BITS, DC_VALS
        ac_bits, ac_vals = AC_BITS, AC_VALS
    else:
        # 12-bit: DC categories reach 15 and AC sizes 14 — flat tables
        dc_bits, dc_vals = DC12_BITS, DC12_VALS
        ac_bits, ac_vals = AC12_BITS, AC12_VALS
    dc_codes = _build_codes(dc_bits, dc_vals)
    ac_codes = _build_codes(ac_bits, ac_vals)
    bwr = _BitWriter()
    prev_dc = 0
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    n_mcu = bh * bw  # single-component scan: 1 MCU = 1 block
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - float(
                level
            )
            prev_dc = _encode_block(
                bwr, blk, qmat, A, dc_codes, ac_codes, prev_dc
            )
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 \
                    and mcu < n_mcu:
                bwr.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                prev_dc = 0
    entropy = bwr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))  # DQT, table 0
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    # SOF0: precision, 1 component (id 1, sampling 1x1, qtable 0)
    out += _seg(
        0xC0, struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    # SOS: 1 component (id 1, DC table 0 / AC table 0), spectral 0..63
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _color_planes(a, hs: int, vs: int | None = None):
    """(h, w, 3) uint8 RGB -> padded (Y, Cb, Cr) float planes with the
    JFIF (BT.601 full-range) forward transform and the spec-recommended
    mean chroma downsample by (hs, vs) — (2, 2) for 4:2:0, (2, 1) for
    4:2:2, (1, 1) for 4:4:4. Planes are edge-replicated to the MCU grid
    (8*hs wide, 8*vs tall), so the downsampled chroma planes land on
    whole 8x8 blocks."""
    import numpy as np

    if vs is None:
        vs = hs
    r = a[:, :, 0].astype(np.float64)
    g = a[:, :, 1].astype(np.float64)
    b = a[:, :, 2].astype(np.float64)
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    H = -(-a.shape[0] // (8 * vs)) * 8 * vs
    W = -(-a.shape[1] // (8 * hs)) * 8 * hs

    def pad_to(p):
        out = np.empty((H, W), dtype=np.float64)
        h0, w0 = p.shape
        out[:h0, :w0] = p
        out[h0:, :w0] = p[h0 - 1 : h0, :]
        out[:, w0:] = out[:, w0 - 1 : w0]
        return out

    yp, cbp, crp = pad_to(yy), pad_to(cb), pad_to(cr)
    if hs != 1 or vs != 1:
        cbp = cbp.reshape(H // vs, vs, W // hs, hs).mean(axis=(1, 3))
        crp = crp.reshape(H // vs, vs, W // hs, hs).mean(axis=(1, 3))
    return yp, cbp, crp


def encode_jpeg_color(pixels, quant=None, quant_chroma=None,
                      subsampling: str = "420",
                      restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB array -> baseline YCbCr JFIF bytes.

    The full 3-component pipeline from the spec: JFIF RGB->YCbCr color
    transform, chroma downsampling (``subsampling`` = "420" 2x2, "422"
    2x1, "444" full-res), interleaved MCUs (4 Y + Cb + Cr blocks per
    MCU at 4:2:0; 2 Y at 4:2:2), separate luma/chroma quantization tables
    (DQT 0/1) and Huffman tables (Annex K luminance + chrominance),
    per-component DC predictors.

    Exactness contract extension: for an R=G=B grey image the chroma
    planes are exactly 128 (the JFIF coefficient rows sum to 0 and 1),
    so block-constant GREY content roundtrips bit-exactly through the
    COLOR pipeline — subsampling, chroma Huffman tables, upsampling,
    and the inverse color transform included. That is what the color
    oracle query leans on; colored content is tolerance-pinned in
    pytest."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    if subsampling == "444":
        hs = vs = 1
    elif subsampling == "420":
        hs = vs = 2
    elif subsampling == "422":
        hs, vs = 2, 1
    else:
        raise ValueError(f"subsampling {subsampling!r} not supported "
                         "(444, 422, and 420 only)")
    ql = _check_quant(quant)
    qc = _check_quant(quant_chroma if quant_chroma is not None else quant)
    yp, cbp, crp = _color_planes(a, hs, vs)
    A = _dct_matrix()
    qml, qmc = _qmat(ql), _qmat(qc)
    dcl = _build_codes(DC_BITS, DC_VALS)
    acl = _build_codes(AC_BITS, AC_VALS)
    dcc = _build_codes(DC_BITS_C, DC_VALS_C)
    acc = _build_codes(AC_BITS_C, AC_VALS_C)
    bwr = _BitWriter()
    prev = [0, 0, 0]
    mcux, mcuy = 8 * hs, 8 * vs
    n_my, n_mx = yp.shape[0] // mcuy, yp.shape[1] // mcux
    mcu_i = 0
    for my in range(n_my):
        for mx in range(n_mx):
            for vy in range(vs):
                for vx in range(hs):
                    y0 = my * mcuy + vy * 8
                    x0 = mx * mcux + vx * 8
                    prev[0] = _encode_block(
                        bwr, yp[y0 : y0 + 8, x0 : x0 + 8] - 128.0,
                        qml, A, dcl, acl, prev[0],
                    )
            prev[1] = _encode_block(
                bwr, cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0,
                qmc, A, dcc, acc, prev[1],
            )
            prev[2] = _encode_block(
                bwr, crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0,
                qmc, A, dcc, acc, prev[2],
            )
            mcu_i += 1
            if restart_interval and mcu_i % restart_interval == 0 \
                    and mcu_i < n_my * n_mx:
                bwr.marker(0xD0 + (mcu_i // restart_interval - 1) % 8)
                prev = [0, 0, 0]
    entropy = bwr.flush()

    samp = (hs << 4) | vs
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in ql))
    out += _seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qc))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xC4, bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    out += _seg(0xC4, bytes([0x11]) + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G, Huffman): a fixed scan script that
# exercises all four progressive scan kinds — DC first with point
# transform Al=1, per-band AC first scans at Al=1 (EOB runs), DC
# refinement bits, AC refinement scans to Al=0 (correction bits).
# ---------------------------------------------------------------------------


def _zz_blocks_of_plane(plane, qmat, A):
    """(H8, W8) level-shifted float plane -> (bh, bw, 64) int32
    quantized coefficients in zigzag order."""
    import numpy as np

    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.empty((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round((A @ blk @ A.T) / qmat).astype(np.int64)
            out[by, bx] = coef.reshape(64)[ZIGZAG]
    return out


#: progressive-scan AC Huffman table: EOBn symbols (run<<4, size 0) are
#: legal in progressive scans but absent from Annex K's baseline table,
#: so the progressive encoder carries its own canonical table — every
#: (run 0..15, size 0..10) symbol at a flat 8-bit length (176 leaves in
#: a 256-slot level: prefix-free, all-ones code unused). Suboptimal
#: compression, maximal simplicity; the decoder always reads DHT anyway.
PROG_AC_VALS = sorted((r << 4) | sz for r in range(16) for sz in range(11))
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

#: 12-bit DC table: diff categories reach 15 — a flat 5-bit canonical
#: table over 0..15 (Annex K only ships 8-bit examples)
DC12_VALS = list(range(16))
DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]

#: 12-bit AC table: coefficient sizes reach 14 — every (run, size<=14)
#: symbol at a flat 9-bit length (240 leaves in a 512-slot level)
AC12_VALS = sorted((r << 4) | sz for r in range(16) for sz in range(15))
AC12_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(AC12_VALS), 0, 0, 0, 0, 0, 0, 0]


class _ProgWriter(_BitWriter):
    """_BitWriter + the AC-refinement bookkeeping (T.81 G.1.3.3 /
    libjpeg's BR/BE split): ``block_bits`` holds the CURRENT block's
    buffered correction bits (flushed right after this block's next
    ZRL or significant-coefficient symbol); ``run_bits`` holds the
    correction bits of blocks already folded into the pending EOB run
    (flushed right after the EOBn symbol, in block order)."""

    def __init__(self):
        super().__init__()
        self.block_bits: list[int] = []
        self.run_bits: list[int] = []

    def put_block_bits(self):
        for b in self.block_bits:
            self.put(b, 1)
        self.block_bits = []

    def put_run_bits(self):
        for b in self.run_bits:
            self.put(b, 1)
        self.run_bits = []

    def fold_block_into_run(self):
        self.run_bits += self.block_bits
        self.block_bits = []


def _emit_eobrun(bwr, ac_codes, eobrun: int) -> int:
    """Flush a pending EOB run: EOBn symbol + extra bits, then the
    RUN's buffered correction bits (the bits of the blocks the run
    covers, in block order — exactly where their decoders re-read
    them); returns 0."""
    if eobrun > 0:
        n = eobrun.bit_length() - 1
        code, ln = ac_codes[n << 4]
        bwr.put(code, ln)
        if n:
            bwr.put(eobrun - (1 << n), n)
        if isinstance(bwr, _ProgWriter):
            bwr.put_run_bits()
    return 0


def _encode_ac_first(bwr, zz, ac_codes, ss, se, al, eobrun: int) -> int:
    """One block of an AC first scan; returns the updated EOB run."""
    run = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = (v >> al) if v >= 0 else -((-v) >> al)
        if v == 0:
            run += 1
            continue
        eobrun = _emit_eobrun(bwr, ac_codes, eobrun)
        while run > 15:
            code, ln = ac_codes[0xF0]
            bwr.put(code, ln)
            run -= 16
        scat, extra = _magnitude(v)
        code, ln = ac_codes[(run << 4) | scat]
        bwr.put(code, ln)
        bwr.put(extra, scat)
        run = 0
        wrote = True
    if run or not wrote:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun = _emit_eobrun(bwr, ac_codes, eobrun)
    return eobrun


def _encode_ac_refine(bwr, zz, ac_codes, ss, se, al, eobrun: int) -> int:
    """One block of an AC refinement scan (Ah = al+1 -> Al = al), the
    T.81 G.1.3.3 discipline: newly-significant coefficients emit
    (zero-history-run, 1) + sign; previously-significant ones buffer a
    correction bit that is flushed right after the NEXT symbol (so the
    decoder reads it inline while passing that position); ZRLs are
    emitted in place but only while the run lies before the block's
    last newly-significant position — trailing zeros fold into the EOB
    run, whose blocks carry the leftover correction bits."""
    absv = [0] * (se + 1)
    keob = ss - 1  # last newly-significant position (EOB boundary)
    for k in range(ss, se + 1):
        v = int(zz[k])
        absv[k] = (v if v >= 0 else -v) >> al
        if absv[k] == 1:
            keob = k
    run = 0
    for k in range(ss, se + 1):
        temp = absv[k]
        if temp == 0:
            run += 1
            continue
        while run > 15 and k <= keob:
            eobrun = _emit_eobrun(bwr, ac_codes, eobrun)
            code, ln = ac_codes[0xF0]
            bwr.put(code, ln)
            run -= 16
            bwr.put_block_bits()
        if temp > 1:  # history coefficient: buffer its correction bit
            bwr.block_bits.append(temp & 1)
            continue
        # newly significant (magnitude bit arrives now)
        eobrun = _emit_eobrun(bwr, ac_codes, eobrun)
        code, ln = ac_codes[(run << 4) | 1]
        bwr.put(code, ln)
        bwr.put(1 if int(zz[k]) >= 0 else 0, 1)
        bwr.put_block_bits()
        run = 0
    if run > 0 or bwr.block_bits:
        eobrun += 1
        bwr.fold_block_into_run()
        if eobrun == 0x7FFF:
            eobrun = _emit_eobrun(bwr, ac_codes, eobrun)
    return eobrun


def encode_jpeg_progressive(pixels, quant=None, quant_chroma=None,
                            subsampling: str = "420") -> bytes:
    """uint8 array -> PROGRESSIVE (SOF2) JFIF bytes. (h, w) encodes
    greyscale; (h, w, 3) encodes YCbCr color (``subsampling`` 444/420,
    separate chroma quant + DC tables, like :func:`encode_jpeg_color`).

    Scan script (exercises all four progressive scan kinds):
    1. DC first, point transform Al=1 (interleaved across components);
    2. per component: AC band 1..5 first at Al=1;
    3. per component: AC band 6..63 first at Al=1 (EOB runs);
    4. DC refinement (Ah=1 -> Al=0, one bit per block);
    5. per component: AC refinement 1..63 (correction bits).

    Decoding the result equals decoding a BASELINE encoding of the same
    image bit-exactly (same quantized coefficients, same IDCT) — the
    cross-check the progressive tests lean on."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    color = a.ndim == 3
    if color and a.shape[2] != 3:
        raise ValueError(f"expected (h, w) or (h, w, 3), got {a.shape}")
    if a.ndim not in (2, 3):
        raise ValueError(f"expected (h, w) or (h, w, 3), got {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    ql = _check_quant(quant)
    A = _dct_matrix()
    if color:
        if subsampling == "444":
            hs = vs = 1
        elif subsampling == "420":
            hs = vs = 2
        else:
            raise ValueError(f"subsampling {subsampling!r} not supported")
        qc = _check_quant(quant_chroma if quant_chroma is not None else quant)
        yp, cbp, crp = _color_planes(a, hs)
        # (cid, sampling (hi, vi), zigzag blocks, dc table id)
        comps = [
            (1, (hs, vs), _zz_blocks_of_plane(yp, _qmat(ql), A), 0),
            (2, (1, 1), _zz_blocks_of_plane(cbp, _qmat(qc), A), 1),
            (3, (1, 1), _zz_blocks_of_plane(crp, _qmat(qc), A), 1),
        ]
        n_my, n_mx = yp.shape[0] // (8 * vs), yp.shape[1] // (8 * hs)
    else:
        hs = vs = 1
        zzp = _zz_blocks_of_plane(
            _pad_plane(a.astype(np.float64), 8), _qmat(ql), A
        )
        comps = [(1, (1, 1), zzp, 0)]
        n_my, n_mx = zzp.shape[:2]
    # non-interleaved AC-scan grids: ceil(ceil(comp_size)/8)
    def _cdiv(x, y):
        return -(-x // y)

    nint = {
        cid: (_cdiv(_cdiv(h * vi, vs), 8), _cdiv(_cdiv(w * hi, hs), 8))
        for cid, (hi, vi), _, _ in comps
    }
    dc_codes = {0: _build_codes(DC_BITS, DC_VALS),
                1: _build_codes(DC_BITS_C, DC_VALS_C)}
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_VALS)

    def dc_first_scan(al):
        bwr = _BitWriter()
        prev = {cid: 0 for cid, *_ in comps}
        for my in range(n_my):
            for mx in range(n_mx):
                for cid, (hi, vi), zz, dct in comps:
                    if len(comps) == 1:
                        blocks = [(my, mx)]
                    else:
                        blocks = [
                            (my * vi + vy, mx * hi + vx)
                            for vy in range(vi) for vx in range(hi)
                        ]
                    for by, bx in blocks:
                        v = int(zz[by, bx, 0]) >> al
                        sc, extra = _magnitude(v - prev[cid])
                        prev[cid] = v
                        code, ln = dc_codes[dct][sc]
                        bwr.put(code, ln)
                        if sc:
                            bwr.put(extra, sc)
        return bwr.flush()

    def dc_refine_scan(al):
        bwr = _BitWriter()
        for my in range(n_my):
            for mx in range(n_mx):
                for cid, (hi, vi), zz, _ in comps:
                    if len(comps) == 1:
                        blocks = [(my, mx)]
                    else:
                        blocks = [
                            (my * vi + vy, mx * hi + vx)
                            for vy in range(vi) for vx in range(hi)
                        ]
                    for by, bx in blocks:
                        bwr.put((int(zz[by, bx, 0]) >> al) & 1, 1)
        return bwr.flush()

    def ac_scan(zz, cid, ss, se, ah, al):
        bwr = _ProgWriter()
        eobrun = 0
        bh, bw = nint[cid]
        for by in range(bh):
            for bx in range(bw):
                if ah == 0:
                    eobrun = _encode_ac_first(
                        bwr, zz[by, bx], ac_codes, ss, se, al, eobrun
                    )
                else:
                    eobrun = _encode_ac_refine(
                        bwr, zz[by, bx], ac_codes, ss, se, al, eobrun
                    )
        _emit_eobrun(bwr, ac_codes, eobrun)
        return bwr.flush()

    def sos(comp_spec, ss, se, ah, al):
        return _seg(
            0xDA,
            bytes([len(comp_spec)])
            + b"".join(bytes([c, t]) for c, t in comp_spec)
            + bytes([ss, se, (ah << 4) | al]),
        )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in ql))
    if color:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qc))
        sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
            [1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]
        )
    else:
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    if color:
        out += _seg(0xC4, bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    out += _seg(0xC4, bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS))
    all_spec = [(cid, dct << 4) for cid, _, _, dct in comps]
    out += sos(all_spec, 0, 0, 0, 1) + dc_first_scan(1)
    for cid, _, zz, _ in comps:
        out += sos([(cid, 0x00)], 1, 5, 0, 1) + ac_scan(zz, cid, 1, 5, 0, 1)
    for cid, _, zz, _ in comps:
        out += sos([(cid, 0x00)], 6, 63, 0, 1) + ac_scan(zz, cid, 6, 63, 0, 1)
    out += sos(all_spec, 0, 0, 1, 0) + dc_refine_scan(0)
    for cid, _, zz, _ in comps:
        out += sos([(cid, 0x00)], 1, 63, 1, 0) + ac_scan(zz, cid, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _find_entropy_end(data: bytes, pos: int) -> int:
    """First offset at/after ``pos`` holding a marker that TERMINATES an
    entropy segment (anything but stuffed FF00 and RSTn)."""
    i = pos
    while i + 1 < len(data):
        if data[i] == 0xFF:
            m = data[i + 1]
            if m == 0x00 or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    raise ValueError("truncated JPEG: entropy stream hits end of data")


@_malformed_guard("JPEG")
def decode_jpeg(data: bytes):
    """JFIF bytes -> uint8 array: (h, w) for greyscale, or (h, w, 3)
    RGB for 3-component YCbCr (any sampling-factor grid whose factors
    divide the maxima — 4:4:4, 4:2:0, 4:2:2, ...), with nearest-neighbor
    chroma upsampling and the JFIF inverse color transform.

    BASELINE (SOF0) and PROGRESSIVE (SOF2) frames both decode: the
    marker walk collects every scan (tables snapshotted as of each SOS,
    since DHT may be redefined between scans), each scan deposits into
    per-component COEFFICIENT arrays — baseline in one interleaved
    pass; progressive via the four T.81 G.1.2 scan kinds (DC first
    with point transform, DC refinement bits, AC spectral-band first
    with EOB runs, AC refinement with correction bits) — and one shared
    reconstruction (dequant + IDCT + crop + upsample + transform)
    renders the result. Restart intervals work in every scan kind.

    Tables are always read from the stream; arithmetic-coded frames
    raise ``NotImplementedError`` (the licensed-codec plug-in point);
    12-bit, CMYK (4-component), and malformed streams raise
    ``ValueError`` with a descriptive message."""
    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple] = {}
    h = w = None
    progressive = False
    dri = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, tq)
    scans: list[dict] = []
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG marker segment")
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + ln]
        if marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"arithmetic-coded JPEG (SOF{marker - 0xC0}) not implemented "
                "— plug in a licensed arithmetic decoder here"
            )
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        if marker in (0xC0, 0xC2):
            if comps:
                raise ValueError("multiple SOF frame headers in one stream")
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec not in (8, 12):
                raise ValueError(
                    f"unsupported JPEG precision {prec} (8 and 12)"
                )
            if prec == 12 and nc != 1:
                raise ValueError(
                    "12-bit JPEG is implemented for greyscale only"
                )
            if nc not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {nc}: greyscale (1) "
                    "and YCbCr (3) are implemented — CMYK/unknown layouts "
                    "are the PIL/libjpeg plug-in point"
                )
            h, w = fh, fw
            if h * w > max(3000 * len(data), 1 << 26):
                raise ValueError(
                    f"implausible JPEG dimensions {w}x{h} for a "
                    f"{len(data)}-byte stream (decompression-bomb guard)"
                )
            for c in range(nc):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, body[8 + 3 * c]))
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", body, 0)[0]  # 0 = disabled
        elif marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode(bits, vals)
                i += 17 + n
        elif marker == 0xDA:
            if not body or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated JPEG scan header (SOS)")
            ns = body[0]
            sc = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ns)
            ]
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if not (ss <= se <= 63 and (a >> 4) <= 13 and (a & 0x0F) <= 13):
                raise ValueError(
                    f"implausible scan header Ss={ss} Se={se} A={a:#04x}"
                )
            startp = pos + 2 + ln
            endp = _find_entropy_end(data, startp)
            scans.append(
                dict(comps=sc, ss=ss, se=se, ah=a >> 4, al=a & 0x0F,
                     start=startp, end=endp, dri=dri, ht=dict(htables))
            )
            pos = endp
            continue
        pos = pos + 2 + ln
    if h is None:
        raise ValueError("JPEG without a frame header (no SOF)")
    if not scans:
        raise ValueError("JPEG without any scan (no SOS)")
    level = 1 << (prec - 1)
    maxv = (1 << prec) - 1
    sample_dtype = np.uint8 if prec == 8 else np.uint16
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        raise ValueError(f"implausible sampling maxima {hmax}x{vmax}")
    n_mx = -(-w // (8 * hmax))
    n_my = -(-h // (8 * vmax))
    byid = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    for cid, hi, vi, tq in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            raise ValueError(
                f"component {cid} sampling {hi}x{vi} does not divide the "
                f"frame maxima {hmax}x{vmax}"
            )
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")

    # per-component coefficient planes in ZIGZAG order, MCU-padded dims
    # (int64: a corrupt stream can accumulate DC diffs far past int32
    # before a later check fires — found by the corruption fuzzer)
    coefs = {
        cid: np.zeros((n_my * vi, n_mx * hi, 64), dtype=np.int64)
        for cid, hi, vi, _ in comps
    }
    # non-interleaved scans cover only ceil(comp_size/8) blocks (the
    # MCU-padded grid is wider for subsampled frames)
    def _ceil_div(a, b):
        return -(-a // b)

    nint_dims = {
        cid: (
            _ceil_div(_ceil_div(h * vi, vmax), 8),
            _ceil_div(_ceil_div(w * hi, hmax), 8),
        )
        for cid, hi, vi, _ in comps
    }

    for scan in scans:
        _decode_scan(data, scan, coefs, byid, n_mx, n_my, nint_dims,
                     progressive)

    # shared reconstruction
    A = _dct_matrix()
    up = {}
    for cid, hi, vi, tq in comps:
        qm = _qmat(qtables[tq])
        bh, bw = coefs[cid].shape[:2]
        plane = np.empty((bh * 8, bw * 8), dtype=sample_dtype)
        for by in range(bh):
            for bx in range(bw):
                coef = np.empty(64)
                coef[ZIGZAG] = coefs[cid][by, bx]
                blk = A.T @ (coef.reshape(8, 8) * qm) @ A
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(blk) + level, 0, maxv
                ).astype(sample_dtype)
        if hi != hmax or vi != vmax:  # nearest-neighbor upsample
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        up[cid] = plane[:h, :w].astype(np.float64)
    if len(comps) == 1:
        return up[comps[0][0]].astype(sample_dtype)
    yy, cb, cr = (up[cid] for cid in (c[0] for c in comps))
    # JFIF (BT.601 full-range) inverse transform
    r = yy + 1.402 * (cr - 128.0)
    g = yy - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = yy + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, scan, coefs, byid, n_mx, n_my, nint_dims,
                 progressive):
    """Deposit one scan's entropy data into the coefficient planes —
    baseline interleaved, or one of the four progressive scan kinds."""
    rdr = _BitReader(data, scan["start"])
    ht = scan["ht"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    sc = scan["comps"]
    dri = scan["dri"]
    for cid, dcid, acid in sc:
        if ss == 0 and (0, dcid) not in ht:
            raise ValueError(f"missing DC Huffman table {dcid}")
        if (se > 0 or not progressive) and (1, acid) not in ht:
            raise ValueError(f"missing AC Huffman table {acid}")
    prev_dc = {cid: 0 for cid, _, _ in sc}
    state = {"eobrun": 0}

    def check_restart(mcu_i, total):
        if dri and mcu_i % dri == 0 and mcu_i < total:
            seq = rdr.restart()
            want = (mcu_i // dri - 1) % 8
            if seq != want:
                raise ValueError(
                    f"restart sequence broken: RST{seq}, expected RST{want} "
                    "(a dropped or duplicated segment)"
                )
            for cid in prev_dc:
                prev_dc[cid] = 0
            state["eobrun"] = 0

    if not progressive:
        # baseline: one interleaved full-band scan
        if ss != 0 or se != 63 or ah or al:
            raise ValueError("baseline scan must cover 0..63 at full precision")
        mcu_i = 0
        for my in range(n_my):
            for mx in range(n_mx):
                for cid, dcid, acid in sc:
                    hi, vi = byid[cid]
                    for vy in range(vi):
                        for vx in range(hi):
                            zz = coefs[cid][my * vi + vy, mx * hi + vx]
                            _baseline_block(
                                rdr, zz, ht[(0, dcid)], ht[(1, acid)],
                                prev_dc, cid,
                            )
                mcu_i += 1
                check_restart(mcu_i, n_my * n_mx)
        return

    if ss == 0:  # DC scan (se must be 0 per spec)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        mcu_i = 0
        for my in range(n_my):
            for mx in range(n_mx):
                for cid, dcid, _ in sc:
                    hi, vi = byid[cid]
                    # single-component DC scans are NON-interleaved:
                    # block grid = ceil dims, not MCU-padded
                    if len(sc) == 1:
                        bh, bw = nint_dims[cid]
                        if my >= bh or mx >= bw:
                            continue
                        blocks = [(my, mx)]
                    else:
                        blocks = [
                            (my * vi + vy, mx * hi + vx)
                            for vy in range(vi) for vx in range(hi)
                        ]
                    dcid_of = {c: d for c, d, _ in sc}
                    for by, bx in blocks:
                        zz = coefs[cid][by, bx]
                        if ah == 0:  # DC first: diff of (value >> al)
                            s = rdr.huff(ht[(0, dcid_of[cid])])
                            diff = rdr.extend(rdr.bits(s), s) if s else 0
                            prev_dc[cid] += diff
                            if abs(prev_dc[cid]) > (1 << 24):
                                raise ValueError(
                                    "implausible DC accumulation "
                                    "(corrupt stream)"
                                )
                            zz[0] = prev_dc[cid] << al
                        else:  # DC refinement: one bit
                            if rdr.bits(1):
                                zz[0] = int(zz[0]) | (1 << al)
                mcu_i += 1
                check_restart(mcu_i, n_my * n_mx)
        return

    # AC scan: spec requires exactly one component, non-interleaved
    if len(sc) != 1:
        raise ValueError("progressive AC scan with multiple components")
    cid, _, acid = sc[0]
    bh, bw = nint_dims[cid]
    act = ht[(1, acid)]
    total = bh * bw
    mcu_i = 0
    for by in range(bh):
        for bx in range(bw):
            zz = coefs[cid][by, bx]
            if ah == 0:
                _ac_first_block(rdr, zz, act, ss, se, al, state)
            else:
                _ac_refine_block(rdr, zz, act, ss, se, al, state)
            mcu_i += 1
            check_restart(mcu_i, total)


def _baseline_block(rdr, zz, dct, act, prev_dc, cid):
    s = rdr.huff(dct)
    diff = rdr.extend(rdr.bits(s), s) if s else 0
    prev_dc[cid] += diff
    if abs(prev_dc[cid]) > (1 << 24):
        raise ValueError("implausible DC accumulation (corrupt stream)")
    zz[0] = prev_dc[cid]
    i = 1
    while i < 64:
        rs = rdr.huff(act)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                i += 16  # ZRL
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("AC run past end of block")
        zz[i] = rdr.extend(rdr.bits(size), size)
        i += 1


def _ac_first_block(rdr, zz, act, ss, se, al, state):
    """T.81 G.1.2.2: AC coefficients' first scan for one band — EOB
    runs span blocks; new coefficients arrive at magnitude << al."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = rdr.huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC band run past Se")
            zz[k] = rdr.extend(rdr.bits(s), s) << al
            k += 1
        else:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += rdr.bits(r)
                return
            k += 16  # ZRL


def _ac_refine_block(rdr, zz, act, ss, se, al, state):
    """T.81 G.1.2.3: AC refinement — correction bits for history
    coefficients, ±1<<al for newly significant ones, EOB runs carrying
    correction bits through their blocks."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if rdr.bits(1) and (int(zz[k]) & p1) == 0:
            zz[k] = int(zz[k]) + (p1 if int(zz[k]) >= 0 else m1)

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = rdr.huff(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += rdr.bits(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol size")
                val = p1 if rdr.bits(1) else m1
            while k <= se:
                if int(zz[k]) != 0:
                    correct(k)
                else:
                    if r == 0:
                        if s:
                            zz[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
            else:
                if s:
                    raise ValueError("AC refinement ran past Se")
    if state["eobrun"] > 0:
        while k <= se:
            if int(zz[k]) != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def decode_jpeg_gray(data: bytes):
    """Greyscale-contract wrapper over :func:`decode_jpeg`: 3-component
    color streams raise ``ValueError`` naming the color entry point, so
    callers that promised greyscale fail loudly instead of silently
    getting a 3-channel array."""
    out = decode_jpeg(data)
    if out.ndim != 2:
        raise ValueError(
            "expected a greyscale JPEG but the stream has 3 components — "
            "call decode_jpeg for color (YCbCr) payloads"
        )
    return out
