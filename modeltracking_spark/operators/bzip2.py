"""From-spec bzip2 DECODER — pure Python, decode side only.

bzip2's format is public (the bzip2 manual and the widely-published
informal format description): per-block RLE1 → BWT → MTF + RLE2 →
multi-table Huffman, MSB-first bit packing, CRC-32 (unreflected
0x04C11DB7) per block and combined per stream.  This module implements
the DECODE direction from that description; fixtures are encoded with
Python's stdlib ``bz2`` — an independent third-party implementation —
so every roundtrip cross-validates the two (the ``jsonl_gz`` pattern:
stdlib encodes, from-spec decodes).

Why bzip2 in a training-data engine: the classic public corpora
(Wikipedia dumps, many Common Crawl derivatives) ship as ``.bz2``;
shard decode is a narrow per-row kernel inside ``mapInPandas`` — no
shuffle, embarrassingly parallel at 100 TB.

Malformed streams raise descriptive ``ValueError`` (the inflate.py
discipline): bad magics, oversubscribed/invalid Huffman codes,
out-of-range selectors/origPtr, CRC mismatches, truncation.
"""

from __future__ import annotations

from modeltracking_spark.operators.kernel import widen_for_kernel

_MASK32 = 0xFFFFFFFF


def _build_bz_crc_table() -> list[int]:
    # unreflected CRC-32, polynomial 0x04C11DB7, MSB-first
    table = []
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7 if c & 0x80000000 else c << 1) & _MASK32
        table.append(c)
    return table


_BZ_CRC_TABLE = _build_bz_crc_table()


def bz2_crc32(data: bytes, crc: int = 0) -> int:
    """bzip2's block CRC: unreflected CRC-32 fed MSB-first."""
    c = (~crc) & _MASK32
    for b in data:
        c = ((c << 8) & _MASK32) ^ _BZ_CRC_TABLE[((c >> 24) ^ b) & 0xFF]
    return (~c) & _MASK32


_BITREV8 = bytes(
    int(f"{i:08b}"[::-1], 2) for i in range(256)
)


def _bz2_crc32_fast(data: bytes) -> int:
    """Same CRC via C-speed zlib: the unreflected CRC-32 of a message
    equals the bit-reversal of the reflected CRC-32 (zlib's) of the
    byte-wise bit-reversed message — identity pinned against the
    table-driven :func:`bz2_crc32` in tests."""
    import zlib

    r = zlib.crc32(data.translate(_BITREV8)) & _MASK32
    return int(f"{r:032b}"[::-1], 2)


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated bzip2 stream")
        val = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            shift = avail - take
            val = (val << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return val


def _read_huffman_lengths(br: _Bits, alpha: int) -> list[int]:
    lens = []
    length = br.read(5)
    for _ in range(alpha):
        while True:
            if not 1 <= length <= 20:
                raise ValueError("bzip2 code length out of range")
            if not br.read(1):
                break
            length += -1 if br.read(1) else 1
        lens.append(length)
    return lens


def _canonical_decoder(lengths: list[int]):
    """lengths -> (limit, base, perm, min_len): the standard bzip2
    canonical-code decode tables (codes assigned in length order,
    symbol order within a length)."""
    min_len, max_len = min(lengths), max(lengths)
    perm = []
    for ln in range(min_len, max_len + 1):
        for sym, l in enumerate(lengths):
            if l == ln:
                perm.append(sym)
    limit = [0] * (max_len + 2)
    base = [0] * (max_len + 2)
    count = [0] * (max_len + 2)
    for l in lengths:
        count[l] += 1
    code = 0
    total = 0
    for ln in range(min_len, max_len + 1):
        code += count[ln]
        limit[ln] = code - 1
        code <<= 1
        total += count[ln]
        base[ln + 1] = code - total
    if total != len(lengths):  # pragma: no cover - defensive
        raise ValueError("bzip2 Huffman table inconsistent")
    return limit, base, perm, min_len, max_len


def _decode_symbol(br: _Bits, table) -> int:
    limit, base, perm, min_len, max_len = table
    code = br.read(min_len)
    ln = min_len
    while code > limit[ln]:
        if ln >= max_len:
            raise ValueError("invalid bzip2 Huffman code")
        code = (code << 1) | br.read(1)
        ln += 1
    idx = code - base[ln]
    if not 0 <= idx < len(perm):
        raise ValueError("invalid bzip2 Huffman code")
    return perm[idx]


#: direct-indexed decode width for large blocks: codes of length <= _LUT_L
#: resolve in one list index; longer codes fall back to the canonical walk
_LUT_L = 11


def _lut_decoder(lengths: list[int], table) -> tuple[list[int], list[int], int]:
    """(lut_sym, lut_len, L) over the top ``L = min(max_len, _LUT_L)``
    bits of the canonical code space: every L-bit window whose prefix is
    a code of length <= L maps to (symbol, length); windows needing more
    bits (or invalid) carry length 0 and take the walk. Build cost is
    one slice fill per short symbol — only worth paying on blocks with
    many symbols, so the caller gates it on the selector count."""
    limit, base, perm, min_len, max_len = table
    L = max_len if max_len < _LUT_L else _LUT_L
    size = 1 << L
    lut_sym = [0] * size
    lut_len = [0] * size
    count = [0] * (max_len + 1)
    for l in lengths:
        count[l] += 1
    for ln in range(min_len, min(max_len, L) + 1):
        if not count[ln]:
            continue
        first = limit[ln] - count[ln] + 1
        width = 1 << (L - ln)
        for code in range(first, limit[ln] + 1):
            sym = perm[code - base[ln]]
            lo = code << (L - ln)
            lut_sym[lo:lo + width] = [sym] * width
            lut_len[lo:lo + width] = [ln] * width
    return lut_sym, lut_len, L


def _inverse_bwt(bwt: bytes, orig_ptr: int) -> bytes:
    if not 0 <= orig_ptr < len(bwt):
        raise ValueError("bzip2 origPtr out of range")
    import numpy as np

    n = len(bwt)
    arr = np.frombuffer(bwt, dtype=np.uint8)
    # slot k of the next-vector holds the input index with the k-th
    # (value, position) rank — exactly a stable argsort
    nxt = np.argsort(arr, kind="stable")
    # the output is arr gathered along the nxt-orbit of orig_ptr.  The
    # orbit is computed by pointer DOUBLING (r17, guide §4.2): with
    # step = nxt^filled, seq[filled+j] = step[seq[j]] extends the known
    # prefix to twice its length per pass — O(n log n) vectorized
    # gathers instead of the former O(n) interpreted chase loop
    # (~0.3 s per 100 KB block -> ~5 ms; identical bytes by the orbit
    # invariant seq[i] = nxt^(i+1)(orig_ptr)).
    seq = np.empty(n, dtype=np.int64)
    seq[0] = nxt[orig_ptr]
    step = nxt.astype(np.int64)
    filled = 1
    while filled < n:
        take = min(filled, n - filled)
        seq[filled:filled + take] = step[seq[:take]]
        filled += take
        if filled < n:
            step = step[step]
    return arr[seq].tobytes()


def _un_rle1(data: bytes) -> bytes:
    """Undo the initial run-length pass: any 4 equal bytes are followed
    by a count byte (0-251) of additional repeats. Slice-level scan:
    candidate 4-runs located with numpy shifted equality, literal spans
    between them copied in one slice each (the run-restart rule after a
    count byte is enforced in the walk)."""
    import numpy as np

    n = len(data)
    if n < 4:
        return data
    a = np.frombuffer(data, dtype=np.uint8)
    cand = np.flatnonzero(
        (a[:-3] == a[1:-2]) & (a[:-3] == a[2:-1]) & (a[:-3] == a[3:])
    )
    out = bytearray()
    i = 0
    ci = 0
    n_cand = len(cand)
    while True:
        # next candidate 4-run at or after i
        while ci < n_cand and cand[ci] < i:
            ci += 1
        if ci >= n_cand:
            out += data[i:]
            return bytes(out)
        j = int(cand[ci])
        out += data[i:j + 4]
        if j + 4 >= n:
            raise ValueError("truncated bzip2 RLE1 run")
        extra = data[j + 4]
        if extra > 251:
            raise ValueError("bzip2 RLE1 count out of range")
        out += data[j:j + 1] * extra
        i = j + 5  # run state resets after the count byte


def bz2_decompress(data: bytes) -> bytes:
    """bzip2 stream(s) -> bytes, verifying every block CRC and each
    stream's combined CRC.

    Concatenated multi-stream files (pbzip2 / lbzip2 output — the
    Wikipedia-dump shape this module cites) are valid input: after a
    stream footer the decoder re-aligns to the next byte boundary and,
    if the remaining bytes begin with another ``BZh`` header, decodes
    the next stream.  Any other nonzero trailing bytes raise, keeping
    the loud-ValueError contract (stdlib ``bz2`` matches both
    behaviours and cross-validates in tests).
    """
    if len(data) < 4 or data[:3] != b"BZh" or not 0x31 <= data[3] <= 0x39:
        raise ValueError("bad bzip2 stream header")
    level = data[3] - 0x30
    max_block = level * 100_000
    br = _Bits(data)
    br.pos = 32
    out = bytearray()
    stream_crc = 0
    while True:
        magic = br.read(48)
        if magic == 0x177245385090:  # stream footer
            want = br.read(32)
            if stream_crc != want:
                raise ValueError("bzip2 stream CRC mismatch")
            # streams are byte-aligned when concatenated; padding bits
            # to the boundary are part of this stream and ignored
            byte_off = (br.pos + 7) >> 3
            rest = data[byte_off:]
            if not rest:
                return bytes(out)
            if (
                len(rest) >= 4
                and rest[:3] == b"BZh"
                and 0x31 <= rest[3] <= 0x39
            ):
                level = rest[3] - 0x30
                max_block = level * 100_000
                br.pos = byte_off * 8 + 32
                stream_crc = 0
                continue
            raise ValueError(
                "trailing bytes after bzip2 stream footer are not a "
                "concatenated BZh stream"
            )
        if magic != 0x314159265359:
            raise ValueError("bad bzip2 block magic")
        block_crc = br.read(32)
        if br.read(1):
            raise ValueError("bzip2 randomized blocks are deprecated")
        orig_ptr = br.read(24)

        # symbol map: 16-bit range mask, then 16 bits per used range
        used = []
        range_mask = br.read(16)
        for r in range(16):
            if range_mask & (0x8000 >> r):
                bits = br.read(16)
                for v in range(16):
                    if bits & (0x8000 >> v):
                        used.append(r * 16 + v)
        if not used:
            raise ValueError("bzip2 block uses no symbols")
        alpha = len(used) + 2  # + RUNA/RUNB ... EOB

        n_groups = br.read(3)
        if not 2 <= n_groups <= 6:
            raise ValueError("bzip2 nGroups out of range")
        n_selectors = br.read(15)
        if n_selectors == 0:
            raise ValueError("bzip2 nSelectors is zero")
        mtf_groups = list(range(n_groups))
        selectors = []
        for _ in range(n_selectors):
            j = 0
            while br.read(1):
                j += 1
                if j >= n_groups:
                    raise ValueError("bzip2 selector out of range")
            g = mtf_groups.pop(j)
            mtf_groups.insert(0, g)
            selectors.append(g)

        lens_list = [_read_huffman_lengths(br, alpha)
                     for _ in range(n_groups)]
        tables = [_canonical_decoder(ls) for ls in lens_list]
        # direct-indexed LUTs only when the block is long enough to
        # amortize their build (>= 32 selector groups = >= ~1600
        # symbols); tiny single-doc blocks keep the walk-only path
        luts = (
            [_lut_decoder(ls, t) for ls, t in zip(lens_list, tables)]
            if len(selectors) >= 32 else [None] * n_groups
        )

        # Huffman decode + RLE2/MTF undo — inline bit accumulator
        # (r17, guide §4.2): the former per-symbol _decode_symbol +
        # per-bit _Bits.read call pair was >50% of decode CPU.  The
        # loop peeks a whole code-width window from a local
        # accumulator; the canonical walk compares the window's
        # top-ln bits against limit[ln] — arithmetic identical to the
        # bit-by-bit accumulation — and consuming more bits than the
        # stream holds raises the same truncation error.
        mtf = list(used)
        bwt = bytearray()
        run, run_bit = 0, 0
        group_pos, group_count = 0, 0
        limit = base = perm = None
        min_len = max_len = L = 0
        lut_sym = lut_len = None
        dat = br.data
        n_dat = len(dat)
        bpos = br.pos >> 3
        rem = br.pos & 7
        if rem:
            acc = dat[bpos] & ((1 << (8 - rem)) - 1)
            nbits = 8 - rem
            bpos += 1
        else:
            acc = 0
            nbits = 0
        n_sel = len(selectors)
        while True:
            if group_count == 0:
                if group_pos >= n_sel:
                    raise ValueError("bzip2 ran out of selectors")
                g = selectors[group_pos]
                limit, base, perm, min_len, max_len = tables[g]
                lut = luts[g]
                lut_sym, lut_len, L = lut if lut is not None else (None, None, 0)
                group_pos += 1
                group_count = 50
            group_count -= 1
            while nbits < 24 and bpos < n_dat:
                acc = (acc << 8) | dat[bpos]
                bpos += 1
                nbits += 8
            ln = 0
            if lut_sym is not None:
                idx = (acc >> (nbits - L)) if nbits >= L else (acc << (L - nbits))
                ln = lut_len[idx]
                sym = lut_sym[idx]
            if ln == 0:  # long/invalid code, or no LUT: canonical walk
                window = ((acc >> (nbits - max_len)) if nbits >= max_len
                          else (acc << (max_len - nbits)))
                ln = min_len
                code = window >> (max_len - ln)
                while code > limit[ln]:
                    if ln >= max_len:
                        raise ValueError("invalid bzip2 Huffman code")
                    ln += 1
                    code = window >> (max_len - ln)
                idx = code - base[ln]
                if not 0 <= idx < len(perm):
                    raise ValueError("invalid bzip2 Huffman code")
                sym = perm[idx]
            if ln > nbits:
                raise ValueError("truncated bzip2 stream")
            nbits -= ln
            acc &= (1 << nbits) - 1
            if sym <= 1:  # RUNA / RUNB: bijective base-2 run length
                run += (sym + 1) << run_bit
                run_bit += 1
                continue
            if run:
                if len(bwt) + run > max_block:
                    raise ValueError("bzip2 block overruns its size")
                bwt += bytes([mtf[0]]) * run
                run, run_bit = 0, 0
            if sym == alpha - 1:  # EOB
                br.pos = (bpos << 3) - nbits
                break
            v = mtf.pop(sym - 1)
            mtf.insert(0, v)
            if len(bwt) + 1 > max_block:
                raise ValueError("bzip2 block overruns its size")
            bwt.append(v)

        plain = _un_rle1(_inverse_bwt(bytes(bwt), orig_ptr))
        got_crc = _bz2_crc32_fast(plain)
        if got_crc != block_crc:
            raise ValueError("bzip2 block CRC mismatch")
        stream_crc = (
            ((stream_crc << 1) | (stream_crc >> 31)) & _MASK32
        ) ^ got_crc
        out += plain


# ------------------------------------------------------------ spark kernel


def bz2_roundtrip_stats(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    level: int = 1,
):
    """Per-row stdlib-bz2 ENCODE -> from-spec DECODE -> stats,
    Arrow-batched — cross-validating two independent implementations
    of the public format on every row (the jsonl_gz pattern). Narrow
    map, no shuffle. Output: (id, orig_len, dec_md5, ok)."""
    import bz2 as _bz2
    import hashlib as _hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("orig_len", LongType()),
            StructField("dec_md5", StringType()),
            StructField("ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, lens, md5s, oks = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[payload_col]):
                raw = text.encode("utf-8") if isinstance(text, str) else bytes(text)
                dec = bz2_decompress(_bz2.compress(raw, level))
                ids.append(int(did))
                lens.append(len(raw))
                md5s.append(_hashlib.md5(dec).hexdigest())
                oks.append(dec == raw)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "orig_len": lens,
                    "dec_md5": md5s,
                    "ok": oks,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(kernel, schema)


def bz2_stream_offsets_from_file(fh, chunk_size: int = 4 << 20
                                 ) -> list[int]:
    """Byte offsets of every bzip2 STREAM in a concatenated file
    (pbzip2/lbzip2 output — the Wikipedia multistream-dump shape),
    found WITHOUT decoding and with **O(chunk_size) memory**: a stream
    starts at a byte-aligned ``BZh<level>`` header immediately
    followed by the 48-bit block magic 0x314159265359 — a 10-byte
    signature that cannot occur byte-aligned inside compressed payload
    by construction of the concatenation (streams are byte-aligned;
    the signature inside a stream's bit-packed body would have to land
    on a byte boundary AND follow a valid header, which the offset-0
    anchor plus the end-to-end sweep in tests rule out for real
    archives).  The first offset must be 0.

    This is a PLANNING-path function (the bz2_streams DataSource calls
    it on the driver), so it never materializes the archive: it slides
    a bounded window over ``fh`` in ``chunk_size`` reads, carrying
    only the unresolved tail (a candidate signature that straddles a
    chunk boundary) between reads — a 100 GB archive is planned in
    constant memory.  Boundary-straddling signatures are exercised in
    tests with pathological chunk sizes down to 1 byte."""
    sig = b"\x31\x41\x59\x26\x53\x59"
    offsets: list[int] = []
    base = 0  # absolute file offset of buf[0]
    buf = b""
    eof = False
    while not eof:
        chunk = fh.read(chunk_size)
        eof = not chunk
        buf += chunk
        n = len(buf)
        i = 0
        while True:
            j = buf.find(b"BZh", i)
            if j < 0:
                i = n
                break
            if j + 10 > n:
                if eof:
                    i = n
                    break
                i = j  # candidate straddles the boundary: wait for bytes
                break
            if 0x31 <= buf[j + 3] <= 0x39 and buf[j + 4:j + 10] == sig:
                offsets.append(base + j)
                i = j + 10
            else:
                i = j + 1
        if eof:
            break
        # keep the unresolved tail; at minimum 2 bytes so a "BZh" whose
        # first bytes end this chunk is still seen next round (no byte
        # of a matched signature can begin "BZ", so re-scanning is safe)
        keep_from = min(i, max(n - 2, 0))
        base += keep_from
        buf = buf[keep_from:]
    if not offsets or offsets[0] != 0:
        raise ValueError("data does not start with a bzip2 stream")
    return offsets


def bz2_stream_offsets(data: bytes) -> list[int]:
    """In-memory convenience wrapper over
    :func:`bz2_stream_offsets_from_file` (same signature scan, same
    guarantees) for callers that already hold the bytes."""
    import io

    return bz2_stream_offsets_from_file(io.BytesIO(data))


def bz2_read_stream(data: bytes, start: int, end: int) -> bytes:
    """Decode ONE stream of a concatenated archive in isolation (the
    parallel-read unit): the slice must contain exactly one stream,
    fully CRC-verified by :func:`bz2_decompress`."""
    return bz2_decompress(data[start:end])
