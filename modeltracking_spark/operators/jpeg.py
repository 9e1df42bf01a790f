"""Pure-numpy BASELINE JPEG codec (extension surface; SURVEY.md §2.12
multimodal tier) — the real compressed-image decode path, from the
public ITU-T T.81 spec (+ JFIF 1.02), same playbook as the BMP/WAV/Y4M
codecs in :mod:`operators/multimodal` and the classic-netCDF reader.

Scope: BASELINE sequential DCT (SOF0), 8-bit, SINGLE component
(greyscale), restart-interval-free, with the standard zigzag order,
differential DC + run-length AC Huffman entropy coding (Annex F), byte
stuffing (FF 00), and Annex K's example luminance Huffman tables on the
encode side (the decoder always builds its tables from the file's DHT
segments, never from assumptions). Everything this codec does not cover
rejects LOUDLY at the exact point a PIL/libjpeg decoder would plug in:
progressive (SOF2) and arithmetic-coded (SOF9+) scans raise
``NotImplementedError``; color/multi-component, 12-bit, and malformed
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

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
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
                    raise NotImplementedError(
                        "JPEG restart markers (DRI/RSTn) not implemented — "
                        "restart-interval streams are a libjpeg plug-in point"
                    )
                else:
                    raise ValueError(f"unexpected marker FF{m:02X} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

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


def encode_jpeg_gray(pixels, quant=None) -> bytes:
    """(h, w) uint8 greyscale array -> baseline JFIF bytes.

    ``quant``: 64 quantization values in zigzag order (default
    ``FLAT_Q8``). Partial edge blocks are padded by edge replication
    before the DCT (the standard encoder recommendation), so a
    block-constant image stays block-constant through padding."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"expected (h, w) greyscale array, got {a.shape}")
    h, w = a.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    q = list(quant) if quant is not None else list(FLAT_Q8)
    if len(q) != 64 or any(not 1 <= int(x) <= 255 for x in q):
        raise ValueError("quant must be 64 values in 1..255")

    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = a
    padded[h:, :w] = a[h - 1 : h, :]  # edge-replicate rows
    padded[:, w:] = padded[:, w - 1 : w]  # then columns
    A = _dct_matrix()
    qmat = np.empty(64)
    qmat[ZIGZAG] = q  # zigzag-order table -> natural-order matrix
    qmat = qmat.reshape(8, 8)

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bwr = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
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
    entropy = bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))  # DQT, table 0
    # SOF0: 8-bit precision, 1 component (id 1, sampling 1x1, qtable 0)
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC0
    out += seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC0
    # SOS: 1 component (id 1, DC table 0 / AC table 0), spectral 0..63
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_gray(data: bytes):
    """Baseline single-component JFIF bytes -> (h, w) uint8 array.

    Tables (DQT/DHT) are read from the stream; progressive and
    arithmetic-coded frames raise ``NotImplementedError`` (the libjpeg
    plug-in point); multi-component, 12-bit, and malformed streams
    raise ``ValueError`` with a descriptive message."""
    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple] = {}
    h = w = None
    comp_q = None
    dc_id = ac_id = None
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
        if marker == 0xDD:
            raise NotImplementedError(
                "JPEG restart intervals (DRI) not implemented"
            )
        if marker == 0xC0:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (only 8)")
            if nc != 1:
                raise ValueError(
                    f"unsupported JPEG component count {nc}: only greyscale "
                    "(1 component) is implemented — color YCbCr decode is "
                    "the PIL/libjpeg plug-in point"
                )
            h, w = fh, fw
            comp_q = body[8]  # component 0 spec: id, sampling, qtable id
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
            if ns != 1:
                raise ValueError(f"scan with {ns} components unsupported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            pos = pos + 2 + ln
            break
        pos = pos + 2 + ln
    if h is None:
        raise ValueError("JPEG scan before frame header (no SOF0)")
    if comp_q not in qtables:
        raise ValueError(f"missing quantization table {comp_q}")
    if (0, dc_id) not in htables or (1, ac_id) not in htables:
        raise ValueError("missing Huffman table referenced by scan")

    q = np.empty(64)
    q[ZIGZAG] = qtables[comp_q]
    q = q.reshape(8, 8)
    dct, act = htables[(0, dc_id)], htables[(1, ac_id)]
    A = _dct_matrix()
    bh, bw = -(-h // 8), -(-w // 8)
    out = np.empty((bh * 8, bw * 8), dtype=np.uint8)
    rdr = _BitReader(data, pos)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            s = rdr.huff(dct)
            diff = rdr.extend(rdr.bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
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
            blk = A.T @ (coef.reshape(8, 8) * q) @ A
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(blk) + 128, 0, 255
            ).astype(np.uint8)
    return out[:h, :w]
