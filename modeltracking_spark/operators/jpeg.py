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
components) both encode and decode: ``encode_jpeg_color`` emits 4:4:4
or 4:2:0 interleaved-MCU streams with separate luma/chroma quant and
Huffman tables; ``decode_jpeg`` runs the generic interleaved-MCU loop
for any sampling grid whose factors divide the frame maxima (4:4:4,
4:2:0, 4:2:2, ...), nearest-neighbor chroma upsampling, and the JFIF
(BT.601 full-range) color transforms. Everything this codec does not
cover rejects LOUDLY at the exact point a PIL/libjpeg decoder would
plug in: progressive (SOF2) and arithmetic-coded (SOF9+) scans raise
``NotImplementedError``; CMYK (4-component), 12-bit, and malformed
streams raise descriptive errors.

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


def encode_jpeg_gray(pixels, quant=None, restart_interval: int = 0) -> bytes:
    """(h, w) uint8 greyscale array -> baseline JFIF bytes.

    ``quant``: 64 quantization values in zigzag order (default
    ``FLAT_Q8``). Partial edge blocks are padded by edge replication
    before the DCT (the standard encoder recommendation), so a
    block-constant image stays block-constant through padding.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (with DC-predictor reset) every that-many MCUs — the spec's unit of
    independently-decodable parallelism and error containment."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"expected (h, w) greyscale array, got {a.shape}")
    h, w = a.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    q = _check_quant(quant)
    padded = _pad_plane(a.astype(np.float64), 8)
    A = _dct_matrix()
    qmat = _qmat(q)
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bwr = _BitWriter()
    prev_dc = 0
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    n_mcu = bh * bw  # single-component scan: 1 MCU = 1 block
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
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
    # SOF0: 8-bit precision, 1 component (id 1, sampling 1x1, qtable 0)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC0
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC0
    # SOS: 1 component (id 1, DC table 0 / AC table 0), spectral 0..63
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_color(pixels, quant=None, quant_chroma=None,
                      subsampling: str = "420",
                      restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB array -> baseline YCbCr JFIF bytes.

    The full 3-component pipeline from the spec: JFIF RGB->YCbCr color
    transform, optional 2x2 chroma downsampling (``subsampling="420"``;
    ``"444"`` keeps chroma full-res), interleaved MCUs (4 Y + Cb + Cr
    blocks per MCU at 4:2:0), separate luma/chroma quantization tables
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
    else:
        raise ValueError(f"subsampling {subsampling!r} not supported "
                         "(444 and 420 only)")
    ql = _check_quant(quant)
    qc = _check_quant(quant_chroma if quant_chroma is not None else quant)
    r = a[:, :, 0].astype(np.float64)
    g = a[:, :, 1].astype(np.float64)
    b = a[:, :, 2].astype(np.float64)
    # JFIF (BT.601 full-range) forward transform
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    mcu = 8 * hs
    yp = _pad_plane(yy, mcu)
    cbp = _pad_plane(cb, mcu)
    crp = _pad_plane(cr, mcu)
    if hs == 2:
        # 2x2 mean downsample (the spec-recommended filter)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
    A = _dct_matrix()
    qml, qmc = _qmat(ql), _qmat(qc)
    dcl = _build_codes(DC_BITS, DC_VALS)
    acl = _build_codes(AC_BITS, AC_VALS)
    dcc = _build_codes(DC_BITS_C, DC_VALS_C)
    acc = _build_codes(AC_BITS_C, AC_VALS_C)
    bwr = _BitWriter()
    prev = [0, 0, 0]
    n_my, n_mx = yp.shape[0] // mcu, yp.shape[1] // mcu
    mcu_i = 0
    for my in range(n_my):
        for mx in range(n_mx):
            for vy in range(vs):
                for vx in range(hs):
                    y0 = my * mcu + vy * 8
                    x0 = mx * mcu + vx * 8
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


def decode_jpeg(data: bytes):
    """Baseline JFIF bytes -> uint8 array: (h, w) for greyscale, or
    (h, w, 3) RGB for 3-component YCbCr (any sampling-factor grid whose
    factors divide the maxima — 4:4:4, 4:2:0, 4:2:2, ... — decoded via
    the generic interleaved-MCU loop with per-component DC predictors,
    nearest-neighbor chroma upsampling, and the JFIF inverse color
    transform).

    Tables (DQT/DHT) are always read from the stream; progressive and
    arithmetic-coded frames raise ``NotImplementedError`` (the libjpeg
    plug-in point); 12-bit, CMYK (4-component), and malformed streams
    raise ``ValueError`` with a descriptive message."""
    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple] = {}
    h = w = None
    dri = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, tq)
    scan_tables: dict[int, tuple[int, int]] = {}  # cid -> (dc_id, ac_id)
    scan_order: list[int] = []
    pos = 2
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: no SOS before end of data")
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not implemented — plug in libjpeg/"
                "PIL here; only baseline sequential (SOF0) is in scope"
            )
        if marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"arithmetic-coded JPEG (SOF{marker - 0xC0}) not implemented "
                "— plug in a licensed arithmetic decoder here"
            )
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        if marker == 0xC0:
            if comps:
                raise ValueError("multiple SOF0 frame headers in one stream")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (only 8)")
            if nc not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {nc}: greyscale (1) "
                    "and YCbCr (3) are implemented — CMYK/unknown layouts "
                    "are the PIL/libjpeg plug-in point"
                )
            h, w = fh, fw
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
            ns = body[0]
            if ns != len(comps):
                raise ValueError(
                    f"scan components {ns} != frame components {len(comps)}"
                )
            for c in range(ns):
                cid = body[1 + 2 * c]
                scan_tables[cid] = (body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                scan_order.append(cid)
            pos = pos + 2 + ln
            break
        pos = pos + 2 + ln
    if h is None:
        raise ValueError("JPEG scan before frame header (no SOF0)")
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    for cid, hi, vi, tq in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            raise ValueError(
                f"component {cid} sampling {hi}x{vi} does not divide the "
                f"frame maxima {hmax}x{vmax}"
            )
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        if cid not in scan_tables:
            raise ValueError(f"scan does not cover component {cid}")
        dcid, acid = scan_tables[cid]
        if (0, dcid) not in htables or (1, acid) not in htables:
            raise ValueError("missing Huffman table referenced by scan")

    A = _dct_matrix()
    n_mx = -(-w // (8 * hmax))
    n_my = -(-h // (8 * vmax))
    planes = {}
    qm = {}
    for cid, hi, vi, tq in comps:
        planes[cid] = np.empty((n_my * vi * 8, n_mx * hi * 8), dtype=np.uint8)
        qm[cid] = _qmat(qtables[tq])
    byid = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    rdr = _BitReader(data, pos)
    prev_dc = {cid: 0 for cid, *_ in comps}

    def one_block(cid):
        dct = htables[(0, scan_tables[cid][0])]
        act = htables[(1, scan_tables[cid][1])]
        zz = np.zeros(64, dtype=np.int64)
        s = rdr.huff(dct)
        diff = rdr.extend(rdr.bits(s), s) if s else 0
        prev_dc[cid] += diff
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
        coef = np.empty(64)
        coef[ZIGZAG] = zz
        blk = A.T @ (coef.reshape(8, 8) * qm[cid]) @ A
        return np.clip(np.round(blk) + 128, 0, 255).astype(np.uint8)

    mcu_i = 0
    for my in range(n_my):
        for mx in range(n_mx):
            for cid in scan_order:
                hi, vi = byid[cid]
                for vy in range(vi):
                    for vx in range(hi):
                        y0 = (my * vi + vy) * 8
                        x0 = (mx * hi + vx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = one_block(cid)
            mcu_i += 1
            if dri and mcu_i % dri == 0 and mcu_i < n_my * n_mx:
                seq = rdr.restart()
                want = (mcu_i // dri - 1) % 8
                if seq != want:
                    raise ValueError(
                        f"restart sequence broken: RST{seq}, expected "
                        f"RST{want} (a dropped or duplicated segment)"
                    )
                for cid in prev_dc:
                    prev_dc[cid] = 0  # predictors reset per segment

    up = {}
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        up[cid] = p[:h, :w].astype(np.float64)
    if len(comps) == 1:
        return up[comps[0][0]].astype(np.uint8)
    yy, cb, cr = (up[cid] for cid in (c[0] for c in comps))
    # JFIF (BT.601 full-range) inverse transform
    r = yy + 1.402 * (cr - 128.0)
    g = yy - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = yy + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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
