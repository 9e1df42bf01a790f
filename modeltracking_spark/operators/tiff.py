"""Pure-Python TIFF codec (extension surface; SURVEY.md §2.12
multimodal tier) — the scanned-document image format, from the public
TIFF 6.0 specification (Adobe, 1992), completing the image-codec set
next to BMP/GIF/PNG/JPEG.

Scope: little-endian ("II") AND big-endian ("MM") baseline TIFF,
greyscale (1 sample), RGB (3 samples), and palette-color (Photometric
3 + 16-bit ColorMap, Section 23) at 8 bits per sample; STRIP and TILE
(Section 15, 16-multiple dims, edge padding) layouts; Compression 1
(none), 5 (TIFF-LZW, spec Section 13) and 32773 (PackBits, spec
Section 9 — each row compressed separately); and the
horizontal-differencing Predictor 2 (spec Section 14, the common LZW
companion in scanned corpora — applied per STRIP row or per TILE row,
whichever layout is in force). Bit depths other than 8 and the
floating-point predictor raise ``NotImplementedError`` at the PIL
plug-in point; malformed streams raise descriptive ``ValueError``.

TIFF-LZW vs GIF-LZW — the two are SPEC-LEVEL different and mixing
their conventions is the classic codec bug (the same family as the
round-7 GIF end-of-stream desync):

- codes are packed **MSB-first** (GIF packs LSB-first);
- the symbol alphabet is always 8-bit: Clear = 256, EOI = 257, first
  dynamic code 258, initial width 9;
- **early change one EARLIER than GIF**: the width bumps when the
  next code to be ASSIGNED equals 2^width − 1 (511/1023/2047), per
  spec Section 13 ("because of the early-change convention");
- the encoder must emit Clear when the table reaches 4094 so code
  4095 is never assigned;
- every stream begins with Clear and ends with EOI.

TIFF is lossless, so deterministic fixtures roundtrip bit-exactly and
the whole container (IFD walk, strip offsets/counts, LZW bitstream)
sits on an exactly-SQL-oracle-able path (``tiff_decode_stats_docs``).

Scale posture: codec runs per payload inside Arrow-batched
``mapInPandas`` — a narrow map, no shuffle.
"""

from __future__ import annotations

import struct


def _malformed_guard(kind):
    """Decorator: low-level parse crashes on corrupt bytes surface as
    ONE descriptive ValueError — the loud-reject contract,
    fuzz-enforced in tests/test_fuzz_codecs.py."""
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


_CLEAR = 256
_EOI = 257


def tiff_lzw_compress(data: bytes) -> bytes:
    """TIFF-LZW (spec Section 13): MSB-first variable-width codes,
    Clear first, width bump when the next ASSIGNABLE code would be
    2^width − 1 (the early-change convention — one earlier than GIF),
    re-Clear at table size 4094 so code 4095 is never used, EOI last."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code  # MSB-first packing
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(_CLEAR, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # early change: bump while the NEXT code to assign is 2^w - 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:  # spec: emit Clear before 4095 exists
            put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([byte])
    if prefix:
        put(table[prefix], width)
        # end-of-stream early-change sync: the decoder grows its table
        # on EVERY data code including this final flush and bumps at
        # the same 2^w - 1 boundary — mirror it before EOI (the exact
        # bug class fixed in GIF in round 8, at TIFF's earlier edge)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    put(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_lzw_decompress(data: bytes, n_expect: int) -> bytes:
    """Inverse of :func:`tiff_lzw_compress`, including the
    code-not-yet-in-table (K-omega-K) case."""
    pos = 0
    acc = 0
    nbits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        return v

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = get(width)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"TIFF LZW: first code {code} undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # K-omega-K
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF LZW: code {code} beyond table")
        out += entry
        prev = entry
        # decoder trails the encoder by one entry, so its early change
        # fires when the table is one short of 2^w - 1
        if len(table) + 1 == (1 << width) - 1 and width < 12:
            width += 1
        if len(out) > n_expect:
            raise ValueError(
                f"TIFF LZW produced {len(out)} > expected {n_expect} bytes"
            )
    if len(out) != n_expect:
        raise ValueError(
            f"TIFF LZW produced {len(out)} of {n_expect} expected bytes"
        )
    return bytes(out)


def packbits_compress(row: bytes) -> bytes:
    """PackBits (TIFF 6.0 Section 9) for ONE row: control byte n in
    [0, 127] copies n+1 literals; n in [-127, -1] (two's complement)
    repeats the next byte 1-n times; -128 is a no-op (never emitted).
    Runs of >= 3 (or >= 2 at a literal boundary) become replicate
    packets, capped at 128 per packet."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append((257 - run) & 0xFF)  # -(run-1) two's complement
            out.append(row[i])
            i = j
            continue
        # literal stretch: until the next run of >= 3 or 128 bytes
        lit0 = i
        i += 1
        while i < n and i - lit0 < 128:
            if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                break
            i += 1
        out.append(i - lit0 - 1)
        out += row[lit0:i]
    return bytes(out)


def packbits_decompress(data: bytes, n_expect: int) -> bytes:
    """Inverse of :func:`packbits_compress` over a whole strip (rows
    are packed separately but abut, so one sequential walk to the
    expected byte count decodes them all)."""
    out = bytearray()
    pos = 0
    while len(out) < n_expect:
        if pos >= len(data):
            raise ValueError(
                f"truncated PackBits stream: {len(out)} of "
                f"{n_expect} bytes"
            )
        n = data[pos]
        pos += 1
        if n < 128:  # n+1 literals
            if pos + n + 1 > len(data):
                raise ValueError("truncated PackBits literal packet")
            out += data[pos: pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("truncated PackBits replicate packet")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) > n_expect:
        raise ValueError(
            f"PackBits produced {len(out)} > expected {n_expect} bytes"
        )
    return bytes(out)


def _ifd_entry(tag: int, typ: int, count: int, value: int,
               endian: str = "<") -> bytes:
    """One 12-byte IFD entry. A SHORT scalar occupies the FIRST two
    bytes of the value field in FILE byte order (TIFF 6.0 p.15), which
    ``HHIHH`` packing expresses uniformly for both endians."""
    if typ == 3 and count == 1:
        return struct.pack(endian + "HHIHH", tag, typ, count, value, 0)
    return struct.pack(endian + "HHII", tag, typ, count, value)


def _compress_block(block, compression: int) -> bytes:
    """One strip/tile (2-D row-major uint8 view) -> stored bytes.
    PackBits packs each row separately, per spec Section 9; Deflate
    (8, and the legacy Adobe code 32946) wraps the whole block in one
    RFC 1950 zlib stream (TIFF TechNote 2) — encoding stays with
    stdlib zlib per the repo's deflate policy (operators/inflate.py
    is the from-spec DECODER and the verify direction)."""
    if compression == 5:
        return tiff_lzw_compress(block.tobytes())
    if compression == 32773:
        return b"".join(packbits_compress(bytes(r)) for r in block)
    if compression in (8, 32946):
        import zlib

        return zlib.compress(block.tobytes(), 6)
    return block.tobytes()


def _diff_rows(block, spp: int):
    """Predictor 2 forward: per-ROW per-channel difference (uint8
    wrap). For tiles the row is the TILE row, not the raster row."""
    d = block.copy()
    d[:, spp:] = block[:, spp:] - block[:, :-spp]
    return d


def encode_tiff(pixels, compression: int = 1,
                rows_per_strip: int | None = None,
                predictor: int = 1,
                big_endian: bool = False,
                palette=None,
                tile: tuple[int, int] | None = None) -> bytes:
    """uint8 array -> baseline TIFF bytes ("II" little-endian by
    default, "MM" with ``big_endian=True``). (h, w) encodes greyscale,
    (h, w, 3) RGB. ``compression``: 1 = none, 5 = TIFF-LZW, 32773 =
    PackBits (each strip — and within it each row — compressed
    independently, per spec). ``predictor=2`` applies horizontal
    differencing per sample channel before compression (Section 14) —
    per STRIP row or per TILE row, whichever layout is in force.
    ``rows_per_strip=None`` writes one strip; smaller values exercise
    the multi-strip offset/count bookkeeping.

    ``palette`` ((n<=256, 3) uint8): (h, w) pixels become palette
    INDICES (Photometric 3) and the ColorMap tag (320) carries 3x256
    16-bit channels (v*257 — full-range, spec Section 23 layout: all
    red, all green, all blue). ``tile=(tw, th)``: tiled layout
    (Section 15, tags 322-325) — the raster splits into full-size
    tiles padded at the right/bottom edges, each compressed
    independently; tw/th must be multiples of 16 per spec."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if palette is not None:
        if a.ndim != 2:
            raise ValueError("palette TIFF needs (h, w) index pixels")
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or pal.shape[0] > 256:
            raise ValueError(
                f"palette must be (n<=256, 3) uint8, got {pal.shape}"
            )
        if int(a.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        spp = 1
        photometric = 3  # palette color
    elif a.ndim == 2:
        spp = 1
        photometric = 1  # BlackIsZero
    elif a.ndim == 3 and a.shape[2] == 3:
        spp = 3
        photometric = 2  # RGB
    else:
        raise ValueError(f"expected (h, w) or (h, w, 3), got {a.shape}")
    if compression not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {compression} not implemented (1=none, "
            "5=LZW, 32773=PackBits; others are the PIL plug-in point)"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} not implemented (1=none, "
            "2=horizontal differencing)"
        )
    E = ">" if big_endian else "<"
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")

    blocks = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError(
                f"tile dimensions must be positive multiples of 16, "
                f"got {tw}x{th}"
            )
        full = a.reshape(h, w, spp)
        for y0 in range(0, h, th):  # tiles left-to-right, top-to-bottom
            for x0 in range(0, w, tw):
                t = np.zeros((th, tw, spp), dtype=np.uint8)
                sub = full[y0: y0 + th, x0: x0 + tw]
                t[: sub.shape[0], : sub.shape[1]] = sub
                block = t.reshape(th, tw * spp)
                if predictor == 2:
                    block = _diff_rows(block, spp)
                blocks.append(_compress_block(block, compression))
        rps = None
    else:
        rps = h if rows_per_strip is None else max(1, rows_per_strip)
        raw = a.reshape(h, w * spp)
        if predictor == 2:
            raw = _diff_rows(raw, spp)
        for y0 in range(0, h, rps):
            blocks.append(_compress_block(raw[y0: y0 + rps], compression))
    n_blocks = len(blocks)

    # layout: header(8) | block data | [bits array if spp==3]
    #         | [colormap if palette] | [offsets/counts arrays] | IFD
    pos = 8
    block_offsets = []
    for s in blocks:
        block_offsets.append(pos)
        pos += len(s)
    extra = bytearray()
    if spp == 3:
        bits_off = pos + len(extra)
        extra += struct.pack(E + "HHH", 8, 8, 8)
    if palette is not None:
        cmap_off = pos + len(extra)
        cmap = np.zeros((3, 256), dtype=np.uint16)
        cmap[:, : pal.shape[0]] = pal.T.astype(np.uint16) * 257
        extra += b"".join(
            struct.pack(E + "H", int(v)) for v in cmap.reshape(-1)
        )
    arrays_off = pos + len(extra)
    if n_blocks > 1:  # >1 LONG never fits the 4-byte value field
        off_arr_off = arrays_off
        extra += b"".join(struct.pack(E + "I", o) for o in block_offsets)
        cnt_arr_off = arrays_off + 4 * n_blocks
        extra += b"".join(struct.pack(E + "I", len(s)) for s in blocks)
    ifd_off = pos + len(extra)

    off_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
    entries = []
    entries.append(_ifd_entry(256, 3, 1, w, E))           # ImageWidth
    entries.append(_ifd_entry(257, 3, 1, h, E))           # ImageLength
    if spp == 1:
        entries.append(_ifd_entry(258, 3, 1, 8, E))       # BitsPerSample
    else:
        entries.append(_ifd_entry(258, 3, 3, bits_off, E))
    entries.append(_ifd_entry(259, 3, 1, compression, E))  # Compression
    entries.append(_ifd_entry(262, 3, 1, photometric, E))  # Photometric
    if n_blocks == 1:
        entries.append(_ifd_entry(off_tag, 4, 1, block_offsets[0], E))
    else:
        entries.append(_ifd_entry(off_tag, 4, n_blocks, off_arr_off, E))
    entries.append(_ifd_entry(277, 3, 1, spp, E))        # SamplesPerPixel
    if tile is not None:
        entries.append(_ifd_entry(322, 3, 1, tw, E))     # TileWidth
        entries.append(_ifd_entry(323, 3, 1, th, E))     # TileLength
    else:
        entries.append(_ifd_entry(278, 3, 1, rps, E))    # RowsPerStrip
    if n_blocks == 1:
        entries.append(_ifd_entry(cnt_tag, 4, 1, len(blocks[0]), E))
    else:
        entries.append(_ifd_entry(cnt_tag, 4, n_blocks, cnt_arr_off, E))
    if predictor == 2:
        entries.append(_ifd_entry(317, 3, 1, 2, E))      # Predictor
    if palette is not None:
        entries.append(_ifd_entry(320, 3, 768, cmap_off, E))  # ColorMap
    entries.sort(key=lambda e: struct.unpack_from(E + "H", e, 0)[0])

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(E + "HI", 42,
                                                          ifd_off)
    for s in blocks:
        out += s
    out += extra
    out += struct.pack(E + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(E + "I", 0)  # no next IFD
    return bytes(out)


@_malformed_guard("TIFF")
def decode_tiff(data: bytes):
    """TIFF bytes -> (h, w) or (h, w, 3) uint8 array (scope per module
    docstring)."""
    import numpy as np

    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload (bad byte-order mark)")
    E = ">" if data[:2] == b"MM" else "<"
    magic, ifd_off = struct.unpack_from(E + "HI", data, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    n_entries = struct.unpack_from(E + "H", data, ifd_off)[0]
    if n_entries == 0 or n_entries > 64:
        raise ValueError(f"implausible IFD entry count {n_entries}")
    # keep the raw 4 value-field bytes: inline values live in their
    # FIRST count*size bytes in file order, both endians (spec p.15)
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(E + "HHI", data, base)
        if base + 12 > len(data):
            raise ValueError(f"IFD entry {i} out of bounds")
        tags[tag] = (typ, count, bytes(data[base + 8: base + 12]))

    def scalar(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, count, vb = tags[tag]
        if count != 1:
            raise ValueError(f"tag {tag}: expected scalar, count {count}")
        if typ == 3:  # SHORT: first two bytes of the value field
            return struct.unpack_from(E + "H", vb)[0]
        if typ == 4:
            return struct.unpack_from(E + "I", vb)[0]
        raise NotImplementedError(f"tag {tag} type {typ} not implemented")

    def longs(tag):
        typ, count, vb = tags[tag]
        if count > 65535:  # decompression-bomb / fuzz guard: a corrupt
            # count would otherwise drive a multi-GB unpack format
            raise ValueError(f"implausible tag {tag} count {count}")
        fmt = E + ("H" if typ == 3 else "I") * count
        sz = 2 if typ == 3 else 4
        if count * sz <= 4:
            return list(struct.unpack_from(fmt, vb))
        off = struct.unpack_from(E + "I", vb)[0]
        return list(struct.unpack_from(fmt, data, off))

    w = scalar(256)
    h = scalar(257)
    comp = scalar(259, 1)
    spp = scalar(277, 1)
    rps = scalar(278, h)
    if w * h * max(spp, 1) > max(5000 * len(data), 1 << 26):
        raise ValueError(
            f"implausible TIFF raster {w}x{h}x{spp} for a "
            f"{len(data)}-byte stream (decompression-bomb guard)"
        )
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} not implemented (PIL plug-in point)"
        )
    if spp not in (1, 3):
        raise NotImplementedError(f"{spp} samples/pixel not implemented")
    if 258 in tags:
        bits = longs(258)
        if any(b != 8 for b in bits):
            raise NotImplementedError(
                f"bits per sample {bits} not implemented (8-bit only)"
            )
    predictor = scalar(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} not implemented (1=none, "
            "2=horizontal differencing)"
        )
    photometric = scalar(262, 1)
    if photometric == 3 and (spp != 1 or 320 not in tags):
        raise ValueError("palette TIFF needs 1 sample/pixel + ColorMap")

    def decode_block(chunk: bytes, expect: int, label: str) -> bytes:
        if comp == 5:
            return tiff_lzw_decompress(chunk, expect)
        if comp == 32773:
            return packbits_decompress(chunk, expect)
        if comp in (8, 32946):
            from modeltracking_spark.operators.inflate import (
                zlib_decompress,
            )

            out = zlib_decompress(chunk)
            if len(out) < expect:
                raise ValueError(
                    f"{label} deflate stream shorter than its rows")
            return out[:expect]
        if len(chunk) < expect:
            raise ValueError(f"{label} shorter than its rows")
        return chunk[:expect]

    def undo_predictor(block2d):
        # per-ROW accumulate — tile rows for tiles, raster rows for
        # strips (the two differ; spec Section 14 + 15)
        rows, rw = block2d.shape
        b = block2d.reshape(rows, rw // spp, spp)
        return np.add.accumulate(b, axis=1, dtype=np.uint8).reshape(
            rows, rw
        )

    if 322 in tags:  # tiled layout (Section 15)
        tw_t = scalar(322)
        th_t = scalar(323)
        if tw_t % 16 or th_t % 16 or tw_t <= 0 or th_t <= 0:
            raise ValueError(
                f"tile dimensions must be multiples of 16, got "
                f"{tw_t}x{th_t}"
            )
        offsets = longs(324)
        counts = longs(325)
        tiles_across = -(-w // tw_t)
        tiles_down = -(-h // th_t)
        if len(offsets) != tiles_across * tiles_down:
            raise ValueError(
                f"expected {tiles_across * tiles_down} tiles, "
                f"IFD lists {len(offsets)}"
            )
        if len(offsets) != len(counts):
            raise ValueError("TileOffsets/TileByteCounts length mismatch")
        out = np.zeros((h, w, spp), dtype=np.uint8)
        ti = 0
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                off, cnt = offsets[ti], counts[ti]
                ti += 1
                if off + cnt > len(data):
                    raise ValueError(f"tile {ti - 1} out of bounds")
                expect = th_t * tw_t * spp
                block = np.frombuffer(
                    decode_block(data[off: off + cnt], expect,
                                 f"tile {ti - 1}"),
                    dtype=np.uint8,
                ).reshape(th_t, tw_t * spp)
                if predictor == 2:
                    block = undo_predictor(block)
                tile_px = block.reshape(th_t, tw_t, spp)
                y0, x0 = ty * th_t, tx * tw_t
                ys = min(th_t, h - y0)
                xs = min(tw_t, w - x0)
                out[y0: y0 + ys, x0: x0 + xs] = tile_px[:ys, :xs]
        a = out.reshape(h, w) if spp == 1 else out
    else:
        offsets = longs(273)
        counts = longs(279)
        if len(offsets) != len(counts):
            raise ValueError("StripOffsets/StripByteCounts length mismatch")
        raw = bytearray()
        remaining_rows = h
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError(f"strip {si} out of bounds")
            strip_rows = min(rps, remaining_rows)
            remaining_rows -= strip_rows
            expect = strip_rows * w * spp
            raw += decode_block(data[off: off + cnt], expect, f"strip {si}")
        if len(raw) != h * w * spp:
            raise ValueError(
                f"TIFF strips produced {len(raw)} of {h * w * spp} bytes"
            )
        a = np.frombuffer(bytes(raw), dtype=np.uint8)
        if predictor == 2:
            a = undo_predictor(a.reshape(h, w * spp))
        a = a.reshape(h, w) if spp == 1 else a.reshape(h, w, 3)

    if photometric == 3:  # expand through the ColorMap (Section 23)
        typ, count, _vb = tags[320]
        if typ != 3 or count != 768:
            raise ValueError(
                f"ColorMap must be 768 SHORTs, got type {typ} "
                f"count {count}"
            )
        cmap = np.array(longs(320), dtype=np.uint16).reshape(3, 256)
        a = (cmap.T >> 8).astype(np.uint8)[a.reshape(h, w)]
    return a
