"""Pure-Python GIF codec (extension surface; SURVEY.md §2.12 multimodal
tier) — the palette/LZW compressed-image path, from the public GIF87a
specification (CompuServe, 1987; also W3C's GIF89a note), completing
the image-codec set next to baseline JPEG (``operators/jpeg.py``) and
PNG (``operators/png.py``).

Scope: GIF87a/GIF89a single-image streams, global or local color
table, straight or four-pass interlaced row order (both directions),
with REAL variable-width LZW on both sides —
the encoder builds a growing dictionary (emitting Clear when the
12-bit code space fills, per spec), the decoder reconstructs it
including the K-omega-K "code not yet in table" case. 89a extension
blocks (Graphic Control, comments, application) are skipped per the
block grammar. Interlaced images and animations (a second image
descriptor) raise ``NotImplementedError`` at the PIL plug-in point;
malformed streams raise descriptive ``ValueError``.

GIF is lossless over its palette, so any deterministic indexed fixture
roundtrips bit-exactly — the LZW bitstream, sub-block framing, and
palette expansion all sit on an exactly-SQL-oracle-able path
(``gif_decode_stats_docs``).

Scale posture: codec runs per payload inside Arrow-batched
``mapInPandas`` — a narrow map, no shuffle.
"""

from __future__ import annotations

import struct




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

def _lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF variable-width LZW: emits Clear first, grows the dictionary
    one entry per emitted code, widens at 2^width, re-Clears when the
    4096-entry code space would overflow."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first bit packing, per spec
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    put(clear, width)
    prefix: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        cand = prefix + (k,)
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # "early change": widen as soon as the next assignable code
        # needs more bits — the decoder mirrors this on its table size
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4096:  # 12-bit space full: re-Clear, in sync
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = (k,)
    if prefix:
        put(table[prefix], width)
        # End-of-stream "early change" sync: the decoder appends a table
        # entry for EVERY data code it receives — including this final
        # flush — and widens when its table lands one short of 2^width.
        # Mirror that phantom growth here or END is emitted at the old
        # width while the decoder reads it at the new one (bit desync
        # whenever the flush lands exactly on a 2^width boundary,
        # ~1/2^width of streams).
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n_expect: int):
    """Inverse of :func:`_lzw_compress`, including the K-omega-K case
    (a code referenced one step before it is defined)."""
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        code = get(width)
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW: first code {code} undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # K-omega-K
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out.extend(entry)
        prev = entry
        # "early change", decode side: the decoder's table trails the
        # encoder's by ONE entry (the encoder assigns as it emits, the
        # decoder appends on the NEXT code), so it widens when its size
        # is one short of the boundary
        if len(table) + 1 == (1 << width) and width < 12:
            width += 1
        if len(out) > n_expect:
            raise ValueError(
                f"GIF LZW produced {len(out)} > expected {n_expect} pixels"
            )
    if len(out) != n_expect:
        raise ValueError(
            f"GIF LZW produced {len(out)} of {n_expect} expected pixels"
        )
    return out


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte length-prefixed sub-blocks + a
    zero terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


#: GIF interlace row passes: (first row, step) — spec appendix E
GIF_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _interlaced_row_order(h: int) -> list[int]:
    return [y for start, step in GIF_INTERLACE_PASSES
            for y in range(start, h, step)]


def encode_gif(indices, palette, interlace: bool = False) -> bytes:
    """(h, w) uint8 index array + (n, 3) uint8 palette -> GIF87a bytes
    with a global color table (padded to a power-of-two size).
    ``interlace=True`` stores rows in the spec's four-pass order
    (8-apart, then the 4/2/1 fills) and sets the descriptor flag."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError(
            f"expected (h, w) indices + (n, 3) palette, got {idx.shape} "
            f"and {pal.shape}"
        )
    h, w = idx.shape
    if h == 0 or w == 0:
        raise ValueError(f"bad GIF dimensions {w}x{h}")
    n_pal = pal.shape[0]
    if n_pal < 1 or n_pal > 256 or int(idx.max(initial=0)) >= n_pal:
        raise ValueError(f"palette size {n_pal} does not cover the indices")
    bits = max(2, (n_pal - 1).bit_length())  # GCT size >= 4 entries
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[:n_pal] = pal
    min_code = max(2, bits)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])  # GCT flag + size
    out += full.tobytes()
    ipacked = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
    out += bytes([min_code])
    rows = idx[_interlaced_row_order(h)] if interlace else idx
    out += _sub_blocks(_lzw_compress(rows.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


@_malformed_guard("GIF")
def decode_gif(data: bytes):
    """GIF bytes -> (h, w, 3) uint8 RGB array (palette expanded,
    interlaced row order restored when the descriptor flag is set).

    Skips 89a extension blocks; multi-image animations raise
    ``NotImplementedError`` (the PIL plug-in point)."""
    import numpy as np

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad header)")
    sw, sh = struct.unpack_from("<HH", data, 6)
    if sw * sh > max(5000 * len(data), 1 << 26):
        raise ValueError(
            f"implausible GIF canvas {sw}x{sh} for a {len(data)}-byte "
            "stream (decompression-bomb guard)"
        )
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    img = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X} at {pos - 1}")
        if img is not None:
            raise NotImplementedError(
                "decode_gif is the single-image contract — use "
                "decode_gif_frames for animations (multiple image "
                "descriptors)"
            )
        left, top, w, h = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without any color table")
        if left or top or w != sw or h != sh:
            raise ValueError(
                f"sub-rectangle image ({left},{top},{w}x{h}) in a "
                f"{sw}x{sh} screen unsupported (single full-frame only)"
            )
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block stream")
        pos += 1  # sub-block terminator
        idx = np.array(
            _lzw_decompress(bytes(lzw), min_code, w * h), dtype=np.int32
        ).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows stored in 4-pass order
            deinterlaced = np.empty_like(idx)
            deinterlaced[_interlaced_row_order(h)] = idx
            idx = deinterlaced
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF index out of palette range")
        img = pal[idx]
    if img is None:
        raise ValueError("GIF without an image descriptor")
    return img


# ---------------------------------------------------------------------------
# GIF89a animation (multi-frame streams with Graphic Control Extensions)
# ---------------------------------------------------------------------------


def encode_gif_animation(frames, palette, delays_cs=None,
                         transparent: int | None = None) -> bytes:
    """List of (h, w) index arrays (+ shared palette) -> GIF89a
    animation: per frame a Graphic Control Extension (delay in
    centiseconds, disposal "do not dispose", optional transparent
    index) followed by a full-frame image descriptor + LZW data. With a
    transparent index, pixels holding it leave the previous canvas
    visible — the standard delta-frame trick."""
    import numpy as np

    if not frames:
        raise ValueError("animation needs at least one frame")
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = np.asarray(frames[0]).shape
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    n_pal = pal.shape[0]
    bits = max(2, (n_pal - 1).bit_length())
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[:n_pal] = pal
    min_code = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])
    out += full.tobytes()
    for idx, delay in zip(frames, delays_cs):
        idx = np.asarray(idx, dtype=np.uint8)
        if idx.shape != (h, w):
            raise ValueError(
                f"frame shape {idx.shape} != canvas {(h, w)}"
            )
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("frame index outside the palette")
        # GCE: disposal=1 (leave), transparency flag + index if given
        flags = 0x04 | (0x01 if transparent is not None else 0x00)
        out += bytes([0x21, 0xF9, 4, flags]) + struct.pack("<H", delay)
        out += bytes([transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        out += _sub_blocks(_lzw_compress(idx.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


@_malformed_guard("GIF")
def decode_gif_frames(data: bytes):
    """GIF bytes -> list of (delay_cs, (h, w, 3) uint8 RGB canvas) —
    one COMPOSED canvas per image descriptor: sub-rectangle frames and
    GCE-transparent pixels leave the prior canvas visible ("do not
    dispose" semantics; restore-to-background/previous disposal modes
    are approximated as leave, documented). Single-image files come
    back as one frame with delay 0."""
    import numpy as np

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad header)")
    sw, sh = struct.unpack_from("<HH", data, 6)
    if sw * sh > max(5000 * len(data), 1 << 26):
        raise ValueError(
            f"implausible GIF canvas {sw}x{sh} for a {len(data)}-byte "
            "stream (decompression-bomb guard)"
        )
    packed = data[10]
    bg = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    canvas_idx = np.full((sh, sw), bg, dtype=np.int32)
    frames: list[tuple[int, object]] = []
    delay = 0
    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            subs = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                subs += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and len(subs) >= 4:  # Graphic Control Ext
                delay = struct.unpack_from("<H", subs, 1)[0]
                transparent = subs[3] if subs[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X} at {pos - 1}")
        left, top, w, h = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without any color table")
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"frame rectangle ({left},{top},{w}x{h}) outside the "
                f"{sw}x{sh} canvas"
            )
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block stream")
        pos += 1
        idx = np.array(
            _lzw_decompress(bytes(lzw), min_code, w * h), dtype=np.int32
        ).reshape(h, w)
        if ipacked & 0x40:
            deinterlaced = np.empty_like(idx)
            deinterlaced[_interlaced_row_order(h)] = idx
            idx = deinterlaced
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF index out of palette range")
        region = canvas_idx[top : top + h, left : left + w]
        if transparent is not None:
            canvas_idx[top : top + h, left : left + w] = np.where(
                idx == transparent, region, idx
            )
        else:
            canvas_idx[top : top + h, left : left + w] = idx
        frames.append((delay, pal[canvas_idx]))
        delay = 0
        transparent = None
    if not frames:
        raise ValueError("GIF without an image descriptor")
    return frames
