"""Pure-Python DEFLATE decoder (RFC 1951) + zlib-wrapper verify
(RFC 1950) — the compression primitive under PNG/zip/gzip, implemented
from the public RFCs like every codec in this repo.

Unusual verification luxury: the stdlib ``zlib`` IS the reference
implementation of these exact RFCs, so the test suite can adversarially
cross-check this decoder against it on arbitrary inputs at every
compression level — stored blocks (level 0), fixed-Huffman, and
dynamic-Huffman blocks with real distance/length codes, including the
code-length-code preprocessing (symbols 16/17/18 repeats) that makes
dynamic blocks the fiddly part. ``decode_png(pure_inflate=True)``
routes PNG decompression through this decoder, proving it on real
streams end to end.

Scope: full RFC 1951 decode (all three block types, window-referencing
LZ77 back-copies up to 32 KiB) and the RFC 1950 zlib wrapper (header
checks + Adler-32 verify), including preset dictionaries (FDICT,
round 11: the DICTID-verified dictionary pre-seeds the LZ77 window —
``zlib_decompress(data, zdict=...)``); malformed streams raise
descriptive ``ValueError``. Encoding stays with stdlib zlib (the repo
never needed a from-scratch compressor — decode is the trust
boundary).
"""

from __future__ import annotations

#: RFC 1951 3.2.5 — length codes 257..285: (extra bits, base length)
_LENGTH_TABLE = [
    (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 9), (0, 10),
    (1, 11), (1, 13), (1, 15), (1, 17), (2, 19), (2, 23), (2, 27),
    (2, 31), (3, 35), (3, 43), (3, 51), (3, 59), (4, 67), (4, 83),
    (4, 99), (4, 115), (5, 131), (5, 163), (5, 195), (5, 227), (0, 258),
]
#: distance codes 0..29: (extra bits, base distance)
_DIST_TABLE = [
    (0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (1, 7), (2, 9), (2, 13),
    (3, 17), (3, 25), (4, 33), (4, 49), (5, 65), (5, 97), (6, 129),
    (6, 193), (7, 257), (7, 385), (8, 513), (8, 769), (9, 1025),
    (9, 1537), (10, 2049), (10, 3073), (11, 4097), (11, 6145),
    (12, 8193), (12, 12289), (13, 16385), (13, 24577),
]
#: order of code-length-code lengths in a dynamic block header (3.2.7)
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
              14, 1, 15]




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

class _Bits:
    """LSB-first bit reader (DEFLATE's bit order — opposite of JPEG)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("truncated DEFLATE stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v

    def peek(self, k: int) -> int:
        """Up to ``k`` bits WITHOUT consuming, zero-padded past the end
        of the stream (the flat-table decode peeks max_len bits even
        when the final code is shorter; :meth:`drop` still raises if a
        decode tries to consume phantom bits)."""
        while self.n < k and self.pos < len(self.data):
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        return self.acc & ((1 << k) - 1)

    def drop(self, k: int):
        if k > self.n:
            raise ValueError("truncated DEFLATE stream")
        self.acc >>= k
        self.n -= k

    def byte_pos(self) -> int:
        """Offset of the next unconsumed WHOLE byte — ``pos`` minus the
        full bytes sitting in the peek buffer (a peek may buffer past
        the last consumed bit)."""
        return self.pos - self.n // 8

    def align(self):
        """Skip to the next byte boundary: give back fully-buffered
        bytes, discard the partial-bit remainder."""
        self.pos -= self.n // 8
        self.acc = 0
        self.n = 0


def _build_huffman(lengths):
    """Canonical Huffman per RFC 1951 3.2.2, compiled to a FLAT decode
    table: ``flat[v]`` for every ``max_len``-bit LSB-first window ``v``
    holds ``(symbol << 4) | code_length`` when the window begins with
    that symbol's (bit-reversed) code, ``-1`` for unassigned prefixes.
    One peek + one list index + one drop per symbol replaces the old
    bit-by-bit dict probe — the standard zlib-style decode shape (total
    build cost is exactly 2^max_len slot fills, shared across the whole
    block). Results are memoized on the code-length tuple (r16): a
    record-per-member corpus re-sends near-identical dynamic headers
    member after member, so the 2^max_len fill amortizes across the
    whole scan instead of re-running three times per member; the
    tables are read-only to every consumer. Returns (flat, max_len)."""
    key = tuple(lengths)
    hit = _HUFFMAN_CACHE.get(key)
    if hit is not None:
        return hit
    result = _build_huffman_uncached(lengths)
    if len(_HUFFMAN_CACHE) >= 512:
        _HUFFMAN_CACHE.clear()
    _HUFFMAN_CACHE[key] = result
    return result


_HUFFMAN_CACHE: dict = {}


def _build_huffman_uncached(lengths):
    max_len = max(lengths, default=0)
    if max_len == 0:
        return [], 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    if any(bl_count[ln] > (1 << ln) for ln in range(1, max_len + 1)):
        raise ValueError("oversubscribed Huffman code lengths")
    size = 1 << max_len
    flat = [-1] * size
    for sym, ln in enumerate(lengths):
        if ln:
            c = next_code[ln]
            next_code[ln] += 1
            # codes arrive MSB-first in an LSB-first stream: the peeked
            # window shows the code bit-reversed
            r = 0
            cc = c
            for _ in range(ln):
                r = (r << 1) | (cc & 1)
                cc >>= 1
            packed = (sym << 4) | ln
            step = 1 << ln
            flat[r::step] = [packed] * (size >> ln)
    return flat, max_len


def _read_symbol(br: _Bits, flat, max_len: int) -> int:
    # an all-zero length set builds an EMPTY table (e.g. a dynamic
    # block whose single HDIST length is 0); a stream that then
    # references it must fail with the documented ValueError, not leak
    # an IndexError from flat[] (ADVICE r8 low)
    if max_len == 0:
        raise ValueError("invalid DEFLATE Huffman code")
    e = flat[br.peek(max_len)]
    if e < 0:
        raise ValueError("invalid DEFLATE Huffman code")
    br.drop(e & 0x0F)
    return e >> 4


#: fixed-Huffman tables are static (RFC 1951 3.2.6) — build once
_FIXED_CACHE: list = []


def _fixed_tables():
    if not _FIXED_CACHE:
        lit_lengths = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
        dist_lengths = [5] * 30
        _FIXED_CACHE.append(
            (_build_huffman(lit_lengths), _build_huffman(dist_lengths))
        )
    return _FIXED_CACHE[0]


def inflate(data: bytes, start: int = 0,
            history: bytes = b"") -> tuple[bytes, int]:
    """Raw DEFLATE bytes -> (decompressed bytes, next byte offset after
    the final block).  ``history`` pre-seeds the 32 KiB LZ77 window
    WITHOUT appearing in the output — exactly the preset-dictionary
    semantics of RFC 1950 §2.2 (FDICT) and the SetDictionary hook of
    raw-deflate embedders: back-references may reach into it from the
    first symbol."""
    br = _Bits(data, start)
    out = bytearray(history)
    while True:
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == 3:
            raise ValueError("reserved DEFLATE block type 3")
        if btype == 0:  # stored
            br.align()
            if br.pos + 4 > len(data):
                raise ValueError("truncated stored-block header")
            ln = data[br.pos] | (data[br.pos + 1] << 8)
            nlen = data[br.pos + 2] | (data[br.pos + 3] << 8)
            if ln != (~nlen & 0xFFFF):
                raise ValueError("stored-block LEN/NLEN mismatch")
            br.pos += 4
            if br.pos + ln > len(data):
                raise ValueError("truncated stored block")
            out += data[br.pos : br.pos + ln]
            br.pos += ln
        else:
            if btype == 1:
                (lit_tab, lit_max), (dist_tab, dist_max) = _fixed_tables()
            else:  # dynamic: code-length-code preprocessing (3.2.7)
                # header + code-length decode with the bit reader
                # inlined into locals (r16) — identical arithmetic and
                # error behavior to the former br.bits/_read_symbol
                # calls, minus ~100k method calls per shard.
                data_l = data
                n_data = len(data_l)
                acc, nb, pos = br.acc, br.n, br.pos
                while nb < 14:
                    if pos >= n_data:
                        raise ValueError("truncated DEFLATE stream")
                    acc |= data_l[pos] << nb
                    pos += 1
                    nb += 8
                hlit = (acc & 0x1F) + 257
                hdist = ((acc >> 5) & 0x1F) + 1
                hclen = ((acc >> 10) & 0x0F) + 4
                acc >>= 14
                nb -= 14
                clc_lengths = [0] * 19
                for i in range(hclen):
                    while nb < 3:
                        if pos >= n_data:
                            raise ValueError("truncated DEFLATE stream")
                        acc |= data_l[pos] << nb
                        pos += 1
                        nb += 8
                    clc_lengths[_CLC_ORDER[i]] = acc & 7
                    acc >>= 3
                    nb -= 3
                clc_tab, clc_max = _build_huffman(clc_lengths)
                if clc_max == 0:
                    # hlit+hdist >= 258, so the old per-symbol helper
                    # always raised this on its first read
                    raise ValueError("invalid DEFLATE Huffman code")
                clc_mask = (1 << clc_max) - 1
                lengths: list[int] = []
                total = hlit + hdist
                while len(lengths) < total:
                    while nb < clc_max and pos < n_data:
                        acc |= data_l[pos] << nb
                        pos += 1
                        nb += 8
                    e = clc_tab[acc & clc_mask]
                    if e < 0:
                        raise ValueError("invalid DEFLATE Huffman code")
                    k = e & 0x0F
                    if k > nb:
                        raise ValueError("truncated DEFLATE stream")
                    acc >>= k
                    nb -= k
                    sym = e >> 4
                    if sym < 16:
                        lengths.append(sym)
                    elif sym == 16:
                        if not lengths:
                            raise ValueError("repeat with no prior length")
                        while nb < 2:
                            if pos >= n_data:
                                raise ValueError(
                                    "truncated DEFLATE stream")
                            acc |= data_l[pos] << nb
                            pos += 1
                            nb += 8
                        lengths += [lengths[-1]] * (3 + (acc & 3))
                        acc >>= 2
                        nb -= 2
                    elif sym == 17:
                        while nb < 3:
                            if pos >= n_data:
                                raise ValueError(
                                    "truncated DEFLATE stream")
                            acc |= data_l[pos] << nb
                            pos += 1
                            nb += 8
                        lengths += [0] * (3 + (acc & 7))
                        acc >>= 3
                        nb -= 3
                    else:  # 18
                        while nb < 7:
                            if pos >= n_data:
                                raise ValueError(
                                    "truncated DEFLATE stream")
                            acc |= data_l[pos] << nb
                            pos += 1
                            nb += 8
                        lengths += [0] * (11 + (acc & 0x7F))
                        acc >>= 7
                        nb -= 7
                if len(lengths) != total:
                    raise ValueError("code-length run overflows HLIT+HDIST")
                lit_tab, lit_max = _build_huffman(lengths[:hlit])
                dist_tab, dist_max = _build_huffman(lengths[hlit:])
                br.acc, br.n, br.pos = acc, nb, pos
            # hot symbol loop with the bit reader inlined into locals
            # (r16, guide §4.2): ~3 method calls per symbol became
            # straight-line arithmetic — bit-for-bit the same decode
            # (peek zero-pads past the end; consuming phantom bits
            # still raises the documented truncation error).
            data_l = data
            n_data = len(data_l)
            acc, nb, pos = br.acc, br.n, br.pos
            lit_mask = (1 << lit_max) - 1
            dist_mask = (1 << dist_max) - 1
            while True:
                while nb < lit_max and pos < n_data:
                    acc |= data_l[pos] << nb
                    pos += 1
                    nb += 8
                e = lit_tab[acc & lit_mask] if lit_max else -1
                if e < 0:
                    raise ValueError("invalid DEFLATE Huffman code")
                k = e & 0x0F
                if k > nb:
                    raise ValueError("truncated DEFLATE stream")
                acc >>= k
                nb -= k
                sym = e >> 4
                if sym < 256:
                    out.append(sym)
                    continue
                if sym == 256:  # end of block
                    break
                if sym > 285:
                    raise ValueError(f"invalid length symbol {sym}")
                ebits, base = _LENGTH_TABLE[sym - 257]
                length = base
                if ebits:
                    while nb < ebits:
                        if pos >= n_data:
                            raise ValueError("truncated DEFLATE stream")
                        acc |= data_l[pos] << nb
                        pos += 1
                        nb += 8
                    length += acc & ((1 << ebits) - 1)
                    acc >>= ebits
                    nb -= ebits
                while nb < dist_max and pos < n_data:
                    acc |= data_l[pos] << nb
                    pos += 1
                    nb += 8
                e = dist_tab[acc & dist_mask] if dist_max else -1
                if e < 0:
                    raise ValueError("invalid DEFLATE Huffman code")
                k = e & 0x0F
                if k > nb:
                    raise ValueError("truncated DEFLATE stream")
                acc >>= k
                nb -= k
                dsym = e >> 4
                if dsym > 29:
                    raise ValueError(f"invalid distance symbol {dsym}")
                debits, dbase = _DIST_TABLE[dsym]
                dist = dbase
                if debits:
                    while nb < debits:
                        if pos >= n_data:
                            raise ValueError("truncated DEFLATE stream")
                        acc |= data_l[pos] << nb
                        pos += 1
                        nb += 8
                    dist += acc & ((1 << debits) - 1)
                    acc >>= debits
                    nb -= debits
                if dist > len(out):
                    raise ValueError(
                        f"back-reference distance {dist} before stream start"
                    )
                ref = len(out) - dist
                if dist >= length:  # disjoint copy: one slice
                    out += out[ref : ref + length]
                else:  # self-overlap = periodic repeat of the last
                    # ``dist`` bytes (RFC 3.2.3 note); double the chunk
                    chunk = bytes(out[ref:])
                    while len(chunk) < length:
                        chunk += chunk
                    out += chunk[:length]
            br.acc, br.n, br.pos = acc, nb, pos
        if bfinal:
            break
    # next whole-byte offset (any partial byte of the last block is done)
    return bytes(out[len(history):]), br.byte_pos()


def _adler32(data: bytes) -> int:
    """Adler-32 (RFC 1950 §8) via stdlib ``zlib.adler32`` — checksum
    *verification* is not the decode trust boundary (house precedent:
    ``xz._crc32``), and the former per-byte mod loop charged ~1 µs/byte
    to every zlib-wrapped stream."""
    import zlib

    return zlib.adler32(data) & 0xFFFFFFFF


@_malformed_guard("zlib")
def zlib_decompress(data: bytes, zdict: bytes | None = None) -> bytes:
    """RFC 1950 wrapper: CMF/FLG header checks, raw inflate, Adler-32
    verify. The drop-in twin of ``zlib.decompress`` for the streams this
    repo reads (PNG IDAT).

    Preset dictionaries (round 11, VERDICT r10 item 8): when the FDICT
    flag is set, the 4-byte big-endian DICTID that follows the header
    must equal Adler-32 of the supplied ``zdict`` (RFC 1950 §2.2); the
    dictionary then pre-seeds the LZ77 window without appearing in the
    output — the exact semantics of stdlib
    ``zlib.compressobj(zdict=...)`` / ``decompressobj(zdict=...)``,
    cross-validated in tests/test_inflate.py.  An FDICT stream with no
    ``zdict`` supplied, or a DICTID that does not match it, rejects
    loudly."""
    if len(data) < 6:
        raise ValueError("zlib stream shorter than header + checksum")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib compression method {cmf & 0x0F} != deflate")
    if ((cmf << 8) | flg) % 31 != 0:
        raise ValueError("zlib header check failed")
    body_start, history = 2, b""
    if flg & 0x20:  # FDICT
        if zdict is None:
            raise ValueError(
                "zlib stream requires a preset dictionary (FDICT) but "
                "none was supplied"
            )
        if len(data) < 10:
            raise ValueError("zlib FDICT stream shorter than its DICTID")
        want_id = int.from_bytes(data[2:6], "big")
        have_id = _adler32(zdict)
        if have_id != want_id:
            raise ValueError(
                f"preset dictionary DICTID mismatch: stream wants "
                f"{want_id:#010x}, supplied dictionary is {have_id:#010x}"
            )
        body_start, history = 6, zdict
    elif zdict is not None:
        raise ValueError(
            "a preset dictionary was supplied but the stream's FDICT "
            "flag is clear"
        )
    out, end = inflate(data, body_start, history=history)
    if end + 4 > len(data):
        raise ValueError("zlib stream missing Adler-32 trailer")
    want = int.from_bytes(data[end : end + 4], "big")
    got = _adler32(out)
    if got != want:
        raise ValueError(
            f"Adler-32 mismatch: computed {got:#010x}, trailer {want:#010x}"
        )
    return out


def _crc32(data: bytes) -> int:
    """CRC-32 (IEEE 802.3, reflected 0xEDB88320) via stdlib
    ``zlib.crc32`` — checksum *verification* is not the decode trust
    boundary (house precedent: ``xz._crc32`` made the same call), and
    the former bit-by-bit loop was ~30% of every gzip member walk
    (pinned against the canonical check value in tests)."""
    import zlib

    return zlib.crc32(data) & 0xFFFFFFFF


def gzip_member(data: bytes, start: int = 0) -> tuple[bytes, int]:
    """Decode ONE gzip member beginning at ``start``: RFC 1952 header
    (magic/method checks, the optional FEXTRA/FNAME/FCOMMENT/FHCRC
    fields walked per spec), raw DEFLATE, CRC-32 + ISIZE trailer
    verified. Returns (payload, end-offset just past the trailer) —
    the walk primitive multi-member files and WARC record-per-member
    containers (operators/warc.py) are built on."""
    if start + 18 > len(data):
        raise ValueError("gzip stream shorter than header + trailer")
    if data[start:start + 2] != b"\x1f\x8b":
        raise ValueError("not a gzip stream (bad magic)")
    if data[start + 2] != 8:
        raise ValueError(
            f"gzip compression method {data[start + 2]} != deflate"
        )
    flg = data[start + 3]
    if flg & 0xE0:
        raise ValueError(f"reserved gzip FLG bits set ({flg:#04x})")
    pos = start + 10
    if flg & 0x04:  # FEXTRA
        if pos + 2 > len(data):
            raise ValueError("truncated gzip FEXTRA length")
        xlen = data[pos] | (data[pos + 1] << 8)
        pos += 2 + xlen
    if flg & 0x08:  # FNAME (zero-terminated)
        end = data.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated gzip FNAME")
        pos = end + 1
    if flg & 0x10:  # FCOMMENT
        end = data.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated gzip FCOMMENT")
        pos = end + 1
    if flg & 0x02:  # FHCRC: CRC-16 of the header so far
        if pos + 2 > len(data):
            raise ValueError("truncated gzip FHCRC")
        want = data[pos] | (data[pos + 1] << 8)
        if (_crc32(data[start:pos]) & 0xFFFF) != want:
            raise ValueError("gzip header CRC-16 mismatch")
        pos += 2
    out, end = inflate(data, pos)
    if end + 8 > len(data):
        raise ValueError("gzip stream missing CRC-32/ISIZE trailer")
    want_crc = int.from_bytes(data[end : end + 4], "little")
    got_crc = _crc32(out)
    if got_crc != want_crc:
        raise ValueError(
            f"gzip CRC-32 mismatch: computed {got_crc:#010x}, "
            f"trailer {want_crc:#010x}"
        )
    want_n = int.from_bytes(data[end + 4 : end + 8], "little")
    if want_n != len(out) % (1 << 32):
        raise ValueError(
            f"gzip ISIZE mismatch: {len(out)} bytes vs trailer {want_n}"
        )
    return out, end + 8


def gzip_members(data: bytes):
    """Iterate (payload, member_start, member_end) over a SERIES of
    gzip members (RFC 1952 §2.2: 'a gzip file consists of a series of
    members' — the Common Crawl WARC layout compresses one record per
    member precisely so readers can split on member boundaries)."""
    pos = 0
    while pos < len(data):
        payload, end = gzip_member(data, pos)
        yield payload, pos, end
        pos = end


def gzip_decompress(data: bytes) -> bytes:
    """RFC 1952 gzip stream -> bytes. Multi-member files decode to the
    CONCATENATION of member payloads (§2.2), each member's CRC-32 and
    ISIZE verified — the `.jsonl.gz` / WARC corpus-interchange format,
    decodable without any library."""
    return b"".join(p for p, _, _ in gzip_members(data))
