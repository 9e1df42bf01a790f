"""From-spec Apache ORC WRITER — the encode direction of the round-11
from-spec reader (operators/orc_native.py), built from the same public
format documents: the ORC specification (v1) and orc_proto.proto's
field numbering.  Protobuf messages, byte/boolean/integer RLEv1
streams, PRESENT null streams, DIRECT string streams, the chunked
compression framing (this repo's own snappy/zstd/lz4-block/LZO1X
encoders, stdlib raw deflate for ZLIB — round 15 closes the write
half, so every CompressionKind the spec defines encodes AND
decodes), stripe footers, the file footer, and the
postscript are all assembled here byte by byte.

Validation reverses the reader's: pyarrow.orc and Spark's own Java
ORC reader consume files this module writes, and the repo's from-spec
reader closes the loop (tests/test_orc_write.py).

The writer emits RLEv1 (ColumnEncoding DIRECT) by default — spec-
legal and universally readable — or, with ``rle_version=2``, modern
RLEv2 streams (SHORT_REPEAT + DIRECT sub-encodings, ColumnEncoding
DIRECT_V2); the reader side handles v1 and all four RLEv2
sub-encodings.  Pre-1970 timestamps (round 13) follow the ORC JAVA
writer's convention — floor seconds, positive nanos, one-second
bump when seconds < 0 and nanos pass the millisecond boundary —
because the JVM reader rejects the C++ signed-nanos shape while the
C++ reader accepts the Java one; pyarrow, Spark's JVM reader and
the repo's own reader round-trip the bytes across 1899/1960/2262 in
tests.  The (-1 s, 0) sub-second window no convention round-trips
stays a typed reject.
"""

from __future__ import annotations

import struct

#: orc_proto CompressionKind
_COMP_NUM = {"NONE": 0, "ZLIB": 1, "SNAPPY": 2, "LZO": 3, "LZ4": 4,
             "ZSTD": 5}
#: orc_proto Type.Kind
_KIND_NUM = {"BOOLEAN": 0, "BYTE": 1, "SHORT": 2, "INT": 3, "LONG": 4,
             "FLOAT": 5, "DOUBLE": 6, "STRING": 7, "BINARY": 8,
             "TIMESTAMP": 9, "LIST": 10, "MAP": 11, "STRUCT": 12,
             "UNION": 13, "DECIMAL": 14, "DATE": 15}
_STREAM_NUM = {"PRESENT": 0, "DATA": 1, "LENGTH": 2,
               "DICTIONARY_DATA": 3, "SECONDARY": 5}

#: logical writer type -> ORC type kind
_LOGICAL = {"boolean": "BOOLEAN", "int32": "INT", "int64": "LONG",
            "float": "FLOAT", "double": "DOUBLE", "string": "STRING",
            "binary": "BINARY", "timestamp": "TIMESTAMP",
            "date": "DATE"}

_ORC_EPOCH = 1420070400  # 2015-01-01 UTC in unix seconds


def _split_top(body: str) -> list[str]:
    """Split a struct body on TOP-LEVEL commas only — commas inside
    parentheses (``decimal(9,2)``) belong to the field type."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced brackets in {body!r}")
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    if depth:
        raise ValueError(f"unbalanced brackets in {body!r}")
    parts.append(body[start:])
    return parts


class _ONode:
    """One node of the GENERAL ORC writer type tree (arbitrary
    LIST/STRUCT/MAP composition, round 12)."""

    __slots__ = ("t", "name", "optional", "kind", "decimal",
                 "fields", "element", "key", "value", "variants",
                 "cid")

    def __init__(self, t, name, optional):
        self.t = t
        self.name = name
        self.optional = bool(optional)
        self.cid = -1


def _parse_otype(name: str, typ: str, optional: bool) -> _ONode:
    typ = typ.strip()
    if typ.startswith("struct<") and typ.endswith(">"):
        node = _ONode("struct", name, optional)
        node.fields = []
        for part in _split_top(typ[7:-1]):
            part = part.strip()
            if not part:
                continue
            fname, colon, ftyp = part.partition(":")
            if not colon:
                raise ValueError(
                    f"struct field needs 'name:type': {part!r}")
            ftyp = ftyp.strip()
            fopt = ftyp.endswith("?")
            if fopt:
                ftyp = ftyp[:-1]
            node.fields.append(
                _parse_otype(fname.strip(), ftyp, fopt))
        if not node.fields:
            raise ValueError(
                f"struct column {name!r} needs at least one field")
        return node
    if typ.startswith("list<") and typ.endswith(">"):
        inner = typ[5:-1].strip()
        iopt = inner.endswith("?")
        if iopt:
            inner = inner[:-1]
        node = _ONode("list", name, optional)
        node.element = _parse_otype("element", inner, iopt)
        return node
    if typ.startswith("union<") and typ.endswith(">"):
        # round 13: the writer-side UNION (values are the reader's
        # tagged-struct dicts {"tag": i, "field<i>": v} or
        # (tag, value) pairs)
        node = _ONode("union", name, optional)
        node.variants = []
        parts = [vt.strip() for vt in _split_top(typ[6:-1])
                 if vt.strip()]
        if not parts or len(parts) > 256:
            raise ValueError(
                f"union column {name!r} needs 1-256 variants")
        for i, vt in enumerate(parts):
            vopt = vt.endswith("?")
            if vopt:
                vt = vt[:-1]
            node.variants.append(
                _parse_otype(f"field{i}", vt, vopt))
        return node
    if typ.startswith("map<") and typ.endswith(">"):
        kv = _split_top(typ[4:-1])
        if len(kv) != 2:
            raise ValueError(
                f"map column {name!r}: type needs 'map<k,v>'")
        ktyp, vtyp = kv[0].strip(), kv[1].strip()
        if ktyp.endswith("?"):
            raise ValueError(
                f"map column {name!r}: keys must be required")
        vopt = vtyp.endswith("?")
        if vopt:
            vtyp = vtyp[:-1]
        node = _ONode("map", name, optional)
        node.key = _parse_otype("key", ktyp, False)
        if node.key.t != "leaf":
            raise NotImplementedError(
                f"non-leaf map key type in column {name!r}")
        node.value = _parse_otype("value", vtyp, vopt)
        return node
    node = _ONode("leaf", name, optional)
    node.decimal = _dec_parse(typ)
    node.kind = "DECIMAL" if node.decimal else _LOGICAL.get(typ)
    if node.kind is None:
        raise NotImplementedError(
            f"ORC write type {typ!r} not supported")
    return node


def _assign_cids(node: _ONode, next_id: int) -> int:
    """Preorder column-id assignment — the spec's numbering."""
    node.cid = next_id
    next_id += 1
    if node.t == "struct":
        for f in node.fields:
            next_id = _assign_cids(f, next_id)
    elif node.t == "list":
        next_id = _assign_cids(node.element, next_id)
    elif node.t == "map":
        next_id = _assign_cids(node.key, next_id)
        next_id = _assign_cids(node.value, next_id)
    elif node.t == "union":
        for v in node.variants:
            next_id = _assign_cids(v, next_id)
    return next_id


def _onode_needs_nested(typ: str) -> bool:
    """True when the type string composes beyond the legacy one-level
    shapes (which keep their dedicated paths)."""

    def scalar(t):
        t = t.strip()
        if t.endswith("?"):
            t = t[:-1]
        return t in _LOGICAL or _dec_parse(t) is not None

    typ = typ.strip()
    if typ.startswith("struct<") and typ.endswith(">"):
        return not all(
            scalar(p.partition(":")[2])
            for p in _split_top(typ[7:-1]) if p.strip())
    if typ.startswith("list<") and typ.endswith(">"):
        return not scalar(typ[5:-1])
    if typ.startswith("map<") and typ.endswith(">"):
        kv = _split_top(typ[4:-1])
        return len(kv) != 2 or not (scalar(kv[0]) and scalar(kv[1]))
    if typ.startswith("union<") and typ.endswith(">"):
        return True
    return False


def _dec_parse(typ: str) -> tuple[int, int] | None:
    """``decimal(p,s)`` -> (p, s); None for any other type string."""
    if not (typ.startswith("decimal(") and typ.endswith(")")):
        return None
    body = typ[8:-1]
    p_s, comma, s_s = body.partition(",")
    if not comma:
        raise ValueError(f"decimal type needs (p,s): {typ!r}")
    p, s = int(p_s.strip()), int(s_s.strip())
    if not (0 < p <= 38 and 0 <= s <= p):
        raise ValueError(f"unsupported decimal({p},{s})")
    return p, s


class _PBW:
    """Protobuf wire-format writer (varint + length-delimited)."""

    def __init__(self):
        self.out = bytearray()

    def _varint(self, v: int):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def varint_field(self, fid: int, v: int):
        self._varint((fid << 3) | 0)
        self._varint(v)

    def bytes_field(self, fid: int, b: bytes):
        self._varint((fid << 3) | 2)
        self._varint(len(b))
        self.out += b

    def str_field(self, fid: int, s: str):
        self.bytes_field(fid, s.encode("utf-8"))

    def packed_field(self, fid: int, vals: list[int]):
        body = _PBW()
        for v in vals:
            body._varint(v)
        self.bytes_field(fid, bytes(body.out))

    def msg_field(self, fid: int, msg: "_PBW"):
        self.bytes_field(fid, bytes(msg.out))

    def zigzag_field(self, fid: int, v: int):
        """sint32/sint64 fields (statistics min/max are sint in
        orc_proto)."""
        self.varint_field(fid, (v << 1) ^ (v >> 63) if v < 0
                          else v << 1)

    def double_field(self, fid: int, v: float):
        self._varint((fid << 3) | 1)  # wire type 1: fixed64
        self.out += struct.pack("<d", v)

    def finish(self) -> bytes:
        return bytes(self.out)


# ---------------------------------------------------------------------------
# run-length encoders (exact inverses of orc_native's decoders)
# ---------------------------------------------------------------------------

def byte_rle_encode(raw: bytes) -> bytes:
    """Byte-level RLE: runs of 3..130 -> [len-3, byte]; literal spans
    of 1..128 -> [256-len, bytes]."""
    out = bytearray()
    i, n = 0, len(raw)
    lit_start = i
    while i < n:
        j = i + 1
        while j < n and raw[j] == raw[i] and j - i < 130:
            j += 1
        if j - i >= 3:
            while lit_start < i:
                take = min(128, i - lit_start)
                out.append(256 - take)
                out += raw[lit_start:lit_start + take]
                lit_start += take
            out.append(j - i - 3)
            out.append(raw[i])
            i = j
            lit_start = i
        else:
            i = j
    while lit_start < n:
        take = min(128, n - lit_start)
        out.append(256 - take)
        out += raw[lit_start:lit_start + take]
        lit_start += take
    return bytes(out)


def bool_rle_encode(bools) -> bytes:
    """Boolean stream: MSB-first bit-packing, then byte RLE."""
    nbytes = (len(bools) + 7) // 8
    raw = bytearray(nbytes)
    for i, b in enumerate(bools):
        if b:
            raw[i >> 3] |= 1 << (7 - (i & 7))
    return byte_rle_encode(bytes(raw))


def _varint_bytes(v: int, signed: bool) -> bytes:
    if signed:
        # unbounded zigzag: ^-1 == two's-complement negate-minus-one,
        # exact at ANY width (a 64-bit-only v >> 63 would corrupt
        # decimal mantissas past 63 bits)
        v = (v << 1) ^ -1 if v < 0 else (v << 1)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def int_rle_v1_encode(vals, signed: bool) -> bytes:
    """Integer RLEv1: constant runs of 3..130 -> [len-3, delta=0,
    base varint]; literal spans of 1..128 -> [256-len, varints].
    (Only zero-delta runs are emitted — always spec-valid; the delta
    byte is a signed int8.)"""
    out = bytearray()
    i, n = 0, len(vals)
    lits: list[int] = []

    def flush_lits():
        k = 0
        while k < len(lits):
            take = min(128, len(lits) - k)
            out.append(256 - take)
            for v in lits[k:k + take]:
                out.extend(_varint_bytes(v, signed))
            k += take
        lits.clear()

    while i < n:
        j = i + 1
        while j < n and vals[j] == vals[i] and j - i < 130:
            j += 1
        if j - i >= 3:
            flush_lits()
            out.append(j - i - 3)
            out.append(0)  # delta
            out += _varint_bytes(vals[i], signed)
        else:
            lits.extend(vals[i:j])
        i = j
    flush_lits()
    return bytes(out)


#: legal "closest fixed bits" widths above 24, with their 5-bit codes
_WIDE_CODES = {26: 24, 28: 25, 30: 26, 32: 27, 40: 28, 48: 29,
               56: 30, 64: 31}


def _closest_width(bits: int) -> tuple[int, int]:
    """(legal width, 5-bit code) — widths 1..24 map to code w-1, then
    the eight wide steps (the inverse of the reader's table)."""
    bits = max(1, bits)
    if bits <= 24:
        return bits, bits - 1
    for w, code in _WIDE_CODES.items():
        if bits <= w:
            return w, code
    raise ValueError(f"RLEv2 width {bits} out of range")


def _pack_msb(vals: list[int], width: int) -> bytes:
    """MSB-first bit packing (ORC packs opposite to parquet)."""
    total_bits = width * len(vals)
    nbytes = (total_bits + 7) // 8
    big = 0
    for i, v in enumerate(vals):
        big |= (v & ((1 << width) - 1)) << (
            nbytes * 8 - (i + 1) * width)
    return big.to_bytes(nbytes, "big")


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def int_rle_v2_encode(vals, signed: bool) -> bytes:
    """Integer RLEv2 using the SHORT_REPEAT and DIRECT sub-encodings
    (a writer may emit any legal mix; PATCHED_BASE/DELTA are decode-
    side only here): repeat runs of 3..10 become SHORT_REPEAT with the
    minimal big-endian byte width; everything else is DIRECT — up to
    512 zigzagged values bit-packed MSB-first at the closest legal
    fixed width."""
    out = bytearray()
    zig = _zigzag if signed else (lambda v: v)
    i, n = 0, len(vals)
    while i < n:
        j = i + 1
        while j < n and vals[j] == vals[i] and j - i < 10:
            j += 1
        run = j - i
        if run >= 3:
            v = zig(vals[i])
            wb = max(1, (v.bit_length() + 7) // 8)
            if wb > 8:
                raise ValueError("RLEv2 value exceeds 64 bits")
            out.append((0 << 6) | ((wb - 1) << 3) | (run - 3))
            out += v.to_bytes(wb, "big")
            i = j
            continue
        # DIRECT chunk: values up to the next >=3 repeat run (max 512)
        chunk = []
        k = i
        while k < n and len(chunk) < 512:
            m = k + 1
            while m < n and vals[m] == vals[k] and m - k < 10:
                m += 1
            if m - k >= 3:
                break
            take = min(m - k, 512 - len(chunk))
            chunk.extend(zig(v) for v in vals[k:k + take])
            k += take
        width, code = _closest_width(max(v.bit_length()
                                         for v in chunk))
        ln = len(chunk) - 1
        out.append((1 << 6) | (code << 1) | (ln >> 8))
        out.append(ln & 0xFF)
        out += _pack_msb(chunk, width)
        i = k
    return bytes(out)


def compress_entity(plain: bytes, codec: str,
                    block_size: int = 1 << 18) -> bytes:
    """Frame one entity in the chunked compression format: 3-byte LE
    headers, LSB = is_original; chunks that don't shrink are stored."""
    if codec == "NONE":
        return plain
    out = bytearray()
    for p in range(0, len(plain), block_size):
        chunk = plain[p:p + block_size]
        if codec == "ZLIB":
            import zlib

            co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
            body = co.compress(chunk) + co.flush()
        elif codec == "SNAPPY":
            from modeltracking_spark.operators.snappy import (
                snappy_block_compress,
            )

            body = snappy_block_compress(chunk)
        elif codec == "ZSTD":
            from modeltracking_spark.operators.zstd import zstd_compress

            body = zstd_compress(chunk, checksum=False)
        elif codec == "LZ4":
            from modeltracking_spark.operators.lz4 import (
                lz4_block_compress,
            )

            body = lz4_block_compress(chunk)
        elif codec == "LZO":
            from modeltracking_spark.operators.lzo import lzo1x_compress

            body = lzo1x_compress(chunk)
        else:
            raise NotImplementedError(
                f"ORC write codec {codec} not supported "
                "(NONE/ZLIB/SNAPPY/LZO/LZ4/ZSTD)")
        if len(body) >= len(chunk):
            out += ((len(chunk) << 1) | 1).to_bytes(3, "little")
            out += chunk
        else:
            out += (len(body) << 1).to_bytes(3, "little")
            out += body
    return bytes(out)


# ---------------------------------------------------------------------------
# column encode
# ---------------------------------------------------------------------------

def _encode_column(kind: str, present_vals: list,
                   rle_version: int = 1,
                   dictionary: bool = False,
                   decimal: tuple | None = None) -> dict:
    """Non-null values -> {stream_kind: plain_bytes}; a dictionary-
    encoded STRING chunk also carries ``__dict_size__`` (not a
    stream) for the ColumnEncoding."""
    _int_rle = (int_rle_v2_encode if rle_version == 2
                else int_rle_v1_encode)
    if kind == "BOOLEAN":
        return {"DATA": bool_rle_encode([bool(v) for v in present_vals])}
    if kind in ("INT", "LONG", "DATE"):  # DATE = epoch days
        return {"DATA": _int_rle(
            [int(v) for v in present_vals], signed=True)}
    if kind == "FLOAT":
        return {"DATA": struct.pack(
            f"<{len(present_vals)}f", *[float(v) for v in present_vals])}
    if kind == "DOUBLE":
        return {"DATA": struct.pack(
            f"<{len(present_vals)}d", *[float(v) for v in present_vals])}
    if kind in ("STRING", "BINARY"):
        blobs = [v.encode("utf-8") if isinstance(v, str) else bytes(v)
                 for v in present_vals]
        if dictionary and kind == "STRING" and blobs:
            # DICTIONARY(_V2): sorted unique entries (the reference
            # writers' convention), DATA = indices into them
            entries = sorted(set(blobs))
            index = {b: i for i, b in enumerate(entries)}
            return {
                "DATA": _int_rle([index[b] for b in blobs],
                                 signed=False),
                "LENGTH": _int_rle([len(b) for b in entries],
                                   signed=False),
                "DICTIONARY_DATA": b"".join(entries),
                "__dict_size__": len(entries),
            }
        return {
            "DATA": b"".join(blobs),
            "LENGTH": _int_rle([len(b) for b in blobs],
                               signed=False),
        }
    if kind == "DECIMAL":
        # spec: DATA = unscaled value as an unbounded-length zigzag
        # base-128 varint; SECONDARY = per-value scale (signed RLE —
        # constant: the declared scale).  Inexact-scale and
        # over-precision values reject loudly, like the parquet
        # writer's decimal arm.
        from decimal import Context, Decimal

        p, s = decimal
        ctx = Context(prec=41)
        limit = 10 ** p
        data = bytearray()
        for v in present_vals:
            if not isinstance(v, Decimal):
                v = Decimal(v)
            scaled = v.scaleb(s, ctx)
            m = int(scaled)
            if m != scaled:
                raise ValueError(
                    f"decimal value {v} does not fit scale {s} "
                    "exactly")
            if not -limit < m < limit:
                raise ValueError(
                    f"decimal overflow: {v} exceeds precision {p}")
            data += _varint_bytes(m, signed=True)
        return {
            "DATA": bytes(data),
            "SECONDARY": _int_rle([s] * len(present_vals),
                                  signed=True),
        }
    if kind == "TIMESTAMP":
        # Pre-1970 (round 13, VERDICT r12 item 4): the ORC JAVA
        # writer convention — FLOOR seconds relative to the 2015
        # epoch, always-POSITIVE sub-second nanos, and the stored
        # seconds bumped by one exactly when seconds < 0 and nanos
        # exceed the millisecond boundary (the reference readers
        # undo the bump with the same rule).  Chosen over the C++
        # signed-nanos convention because the Java reader (Spark's)
        # REJECTS negative nanos outright (IllegalArgumentException),
        # while pyarrow's C++ reader handles the Java shape — so
        # these bytes decode identically under pyarrow, Spark's JVM
        # reader, and this repo's own reader (all pinned in tests).
        # The one exception is the (-1 s, 0) window with nanos above
        # the millisecond boundary: NO convention round-trips it —
        # the Java stack itself reads its own such writes back as
        # +|value| (empirically pinned in tests), and signed nanos
        # crash the JVM — so it stays a typed, documented reject.
        secs, nanos = [], []
        for us in present_vals:
            us = int(us)
            s_abs = us // 1_000_000          # floor seconds
            r = us - s_abs * 1_000_000       # [0, 1e6) sub-second
            ns = r * 1000
            if s_abs < 0 and ns > 999_999:
                if s_abs == -1:
                    raise NotImplementedError(
                        "ORC timestamps inside (-1 s, 0) with a "
                        "sub-second above the millisecond boundary "
                        "cannot be written: no reference reader "
                        "convention round-trips them (the Java "
                        "stack misreads its own writes there and "
                        "rejects the C++ signed-nanos shape)")
                s_abs += 1  # readers borrow this second back
            secs.append(s_abs - _ORC_EPOCH)
            if ns == 0:
                nanos.append(0)
                continue
            z = 0
            while ns % 10 == 0 and z < 8:
                ns //= 10
                z += 1
            if z >= 2:
                nanos.append((ns << 3) | (z - 1))
            else:
                nanos.append((ns * 10 ** z) << 3)
        return {
            "DATA": _int_rle(secs, signed=True),
            "SECONDARY": _int_rle(nanos, signed=False),
        }
    raise NotImplementedError(f"cannot ORC-encode kind {kind}")


class OrcFileWriter:
    """Incremental .orc writer over any binary file object: call
    ``write_stripe(columns)`` per buffered slice, then ``finish()``
    for footer + postscript.  This is the SINK's memory contract at
    100 TB — a task holds one stripe, never its whole partition.

    ``schema`` is ``[(name, type, nullable), ...]`` with type one of
    boolean/int32/int64/float/double/string/binary/timestamp
    (timestamps are epoch MICROS, the engine's grain; pre-1970
    values use the ORC Java writer's floor-plus-borrow convention
    since round 13 — every reference reader decodes it)
    or ``list<element>`` of any of those (append ``?`` for nullable
    elements, e.g. ``list<float?>`` — the array<float> embedding
    shape; one nested level, like the reader).  ``None`` values emit
    a PRESENT stream only in stripes that actually have nulls — the
    reference writers' convention.  Every entity framed with
    ``codec``."""

    def __init__(self, fh, schema: list[tuple], codec: str = "ZLIB",
                 block_size: int = 1 << 18, rle_version: int = 1,
                 string_dictionary: bool | None = None):
        if rle_version not in (1, 2):
            raise ValueError("rle_version must be 1 or 2")
        codec = codec.upper()
        if codec not in _COMP_NUM:
            raise NotImplementedError(f"ORC write codec {codec} "
                                      "not supported")
        fields = []
        next_id = 1
        for name, typ, nullable in schema:
            if _onode_needs_nested(typ):
                # GENERAL nesting (round 12): recursive tree with
                # preorder column ids; one-level shapes keep their
                # dedicated paths below
                tree = _parse_otype(name, typ, bool(nullable))
                next_id = _assign_cids(tree, next_id)
                fields.append({"name": name, "kind": "NESTED",
                               "nullable": bool(nullable),
                               "cid": tree.cid, "tree": tree})
                continue
            if typ.startswith("struct<") and typ.endswith(">"):
                # one-level STRUCT of leaf types: the struct gets its
                # own column id (PRESENT stream only), each field the
                # next id — children record values only for rows where
                # the struct is non-null (the reader's convention)
                children = []
                cid = next_id
                next_id += 1
                for part in _split_top(typ[7:-1]):
                    part = part.strip()
                    if not part:
                        continue
                    fname, _, ftyp = part.partition(":")
                    ftyp = ftyp.strip()
                    opt = ftyp.endswith("?")
                    if opt:
                        ftyp = ftyp[:-1]
                    fdec = _dec_parse(ftyp)
                    ck = "DECIMAL" if fdec else _LOGICAL.get(ftyp)
                    if ck is None:
                        raise NotImplementedError(
                            f"ORC write struct field type {ftyp!r} "
                            "not supported")
                    children.append({"name": fname.strip(),
                                     "kind": ck, "optional": opt,
                                     "cid": next_id,
                                     "decimal": fdec})
                    next_id += 1
                if not children:
                    raise ValueError(
                        f"struct column {name!r} needs >= 1 field")
                fields.append({"name": name, "kind": "STRUCT",
                               "nullable": bool(nullable),
                               "cid": cid, "children": children})
                continue
            if typ.startswith("map<") and typ.endswith(">"):
                kv = _split_top(typ[4:-1])
                if len(kv) != 2:
                    raise ValueError(
                        f"map column {name!r}: type needs 'map<k,v>'")
                ktyp, vtyp = kv[0].strip(), kv[1].strip()
                if ktyp.endswith("?"):
                    raise ValueError(
                        f"map column {name!r}: keys must be required")
                vopt = vtyp.endswith("?")
                if vopt:
                    vtyp = vtyp[:-1]
                kdec = _dec_parse(ktyp)
                kk = "DECIMAL" if kdec else _LOGICAL.get(ktyp)
                vdec = _dec_parse(vtyp)
                vk = "DECIMAL" if vdec else _LOGICAL.get(vtyp)
                if kk is None or vk is None:
                    raise NotImplementedError(
                        f"ORC write map type {typ!r} not supported")
                fields.append({
                    "name": name, "kind": "MAP",
                    "nullable": bool(nullable), "cid": next_id,
                    "key_kind": kk, "key_cid": next_id + 1,
                    "key_decimal": kdec,
                    "value_kind": vk, "value_cid": next_id + 2,
                    "value_optional": vopt, "value_decimal": vdec,
                })
                next_id += 3
                continue
            if typ.startswith("list<") and typ.endswith(">"):
                inner = typ[5:-1].strip()
                opt = inner.endswith("?")
                if opt:
                    inner = inner[:-1]
                edec = _dec_parse(inner)
                ck = "DECIMAL" if edec else _LOGICAL.get(inner)
                if ck is None:
                    raise NotImplementedError(
                        f"ORC write list element type {inner!r} "
                        "not supported")
                fields.append({
                    "name": name, "kind": "LIST",
                    "nullable": bool(nullable), "cid": next_id,
                    "child_kind": ck, "child_optional": opt,
                    "child_cid": next_id + 1,
                    "child_decimal": edec,
                })
                next_id += 2
                continue
            dec = _dec_parse(typ)
            k = "DECIMAL" if dec else _LOGICAL.get(typ)
            if k is None:
                raise NotImplementedError(
                    f"ORC write type {typ!r} not supported")
            fields.append({"name": name, "kind": k,
                           "nullable": bool(nullable), "cid": next_id,
                           "decimal": dec})
            next_id += 1
        if not fields:
            raise ValueError("ORC schema needs at least one column")
        self.fh = fh
        self.fields = fields
        self.n_cols = next_id  # incl. the root struct (id 0)
        self.codec = codec
        self.block_size = block_size
        self.rle_version = rle_version
        self.string_dictionary = string_dictionary
        self.n_rows = 0
        self._stripe_infos: list[tuple] = []
        self._nonnull = [0] * next_id
        self._had_null = [False] * next_id
        #: per-stripe [{cid: (tag, lo, hi)}], feeding the Metadata
        #: section (StripeStatistics) — the zone maps stripe pruning
        #: keys off; plus the file-level merge for footer stats
        self._stripe_mm: list[dict] = []
        self._stripe_counts: list[tuple] = []
        self._file_mm: dict[int, tuple] = {}
        fh.write(b"ORC")
        self._pos = 3

    def _emit(self, b: bytes):
        self.fh.write(b)
        self._pos += len(b)

    def write_stripe(self, columns: dict) -> int:
        """Encode ``columns`` (equal-length value lists) as ONE stripe
        and stream it to the file.  Zero rows is a no-op."""
        codec = self.codec
        block_size = self.block_size
        s_n = None
        for f in self.fields:
            name = f["name"]
            if name not in columns:
                raise ValueError(f"column {name!r} missing from data")
            ln = len(columns[name])
            if s_n is None:
                s_n = ln
            elif ln != s_n:
                raise ValueError("ragged columns: "
                                 f"{name!r} has {ln}, expected {s_n}")
        s_n = s_n or 0
        if s_n == 0:
            return 0
        offset = self._pos
        streams = []  # (kind, column_id, framed_bytes)
        dict_sizes: dict[int, int] = {}  # cid -> dictionary size
        _int_rle = (int_rle_v2_encode if self.rle_version == 2
                    else int_rle_v1_encode)

        def add(skind, cid, plain):
            streams.append((skind, cid, compress_entity(
                plain, codec, block_size)))

        def use_dict(kind, vals):
            if kind != "STRING" or not vals:
                return False
            if self.string_dictionary is not None:
                return self.string_dictionary
            return len(set(vals)) <= max(1, len(vals) // 2)

        st_nn = [0] * self.n_cols
        st_null = [False] * self.n_cols
        st_mm: dict[int, tuple] = {}

        def leaf_stats(cid, kind, vals):
            """(tag, lo, hi) for the stripe's zone map — conservative:
            NaN doubles and non-ASCII strings (whose UTF-8 byte order
            differs from code-point order across readers) omit
            min/max rather than risk an unsound prune."""
            if not vals:
                return
            if kind in ("BYTE", "SHORT", "INT", "LONG"):
                st_mm[cid] = ("int", min(vals), max(vals))
            elif kind == "DATE":
                st_mm[cid] = ("date", min(vals), max(vals))
            elif kind in ("FLOAT", "DOUBLE"):
                fv = [float(v) for v in vals]
                if not any(v != v for v in fv):
                    st_mm[cid] = ("double", min(fv), max(fv))
            elif kind == "STRING":
                if all(isinstance(v, str) and v.isascii()
                       for v in vals):
                    st_mm[cid] = ("string", min(vals), max(vals))
            elif kind == "BOOLEAN":
                st_mm[cid] = ("bucket", sum(1 for v in vals if v), None)
            elif kind == "DECIMAL":
                from decimal import Decimal

                dv = [v if isinstance(v, Decimal) else Decimal(v)
                      for v in vals]
                st_mm[cid] = ("decimal", min(dv), max(dv))

        def add_leaf(cid, kind, vals, decimal=None):
            leaf_stats(cid, kind, vals)
            enc_streams = _encode_column(
                kind, vals, self.rle_version,
                dictionary=use_dict(kind, vals), decimal=decimal)
            dsize = enc_streams.pop("__dict_size__", None)
            if dsize is not None:
                dict_sizes[cid] = dsize
            for skind, plain in enc_streams.items():
                add(skind, cid, plain)

        def present_for(cid, records, nullable, what):
            nulls = [v is None for v in records]
            if any(nulls):
                if not nullable:
                    raise ValueError(f"null in required {what}")
                self._had_null[cid] = True
                st_null[cid] = True
                add("PRESENT", cid,
                    bool_rle_encode([not x for x in nulls]))
            vals = [v for v in records if v is not None]
            self._nonnull[cid] += len(vals)
            st_nn[cid] += len(vals)
            return vals

        def write_node(node, records, what, depth=0):
            """GENERAL nested walk: PRESENT at each level, LENGTH on
            containers, leaves via add_leaf — the spec's
            presence-based recursion."""
            if depth > 32:
                raise ValueError("ORC write nesting too deep")
            vals = present_for(node.cid, records, node.optional, what)
            if node.t == "leaf":
                add_leaf(node.cid, node.kind, vals, node.decimal)
                return
            if node.t == "struct":
                for f2 in node.fields:
                    write_node(
                        f2, [r.get(f2.name) for r in vals],
                        f"struct field {what}.{f2.name} (declare "
                        "the field type with '?')", depth + 1)
                return
            if node.t == "union":
                # round 13: DATA = per-present-row variant tag (byte
                # RLE); variant i records only its tagged values.
                # Accepts the reader's tagged-struct dicts or
                # (tag, value) pairs.
                nvar = len(node.variants)
                tags = []
                per: list[list] = [[] for _ in range(nvar)]
                for r in vals:
                    if isinstance(r, dict):
                        tg = int(r["tag"])
                        val2 = r.get(f"field{tg}")
                    else:
                        tg, val2 = r
                        tg = int(tg)
                    if not 0 <= tg < nvar:
                        raise ValueError(
                            f"union tag {tg} outside the {nvar}-"
                            f"variant column {what}")
                    tags.append(tg)
                    per[tg].append(val2)
                add("DATA", node.cid, byte_rle_encode(bytes(tags)))
                for vi, vn in enumerate(node.variants):
                    write_node(vn, per[vi],
                               f"union variant {vi} of {what} "
                               "(declare it with '?')", depth + 1)
                return
            add("LENGTH", node.cid,
                _int_rle([len(r) for r in vals], signed=False))
            if node.t == "list":
                elems: list = []
                for r in vals:
                    elems.extend(r)
                write_node(node.element, elems,
                           f"list element of {what} (declare the "
                           "element type with '?')", depth + 1)
                return
            keys: list = []
            mvals: list = []
            for r in vals:
                items = r.items() if isinstance(r, dict) else r
                for mk, mv in items:
                    if mk is None:
                        raise ValueError(
                            f"null map key in {what}")
                    keys.append(mk)
                    mvals.append(mv)
            write_node(node.key, keys,
                       f"map key of {what}", depth + 1)
            write_node(node.value, mvals,
                       f"map value of {what} (declare the value "
                       "type with '?')", depth + 1)

        for f in self.fields:
            records = columns[f["name"]]
            if f["kind"] == "NESTED":
                tree = f["tree"]
                tree.optional = f["nullable"]
                write_node(tree, records, f"column {f['name']!r}")
                continue
            if f["kind"] == "STRUCT":
                recs = present_for(f["cid"], records, f["nullable"],
                                   f"column {f['name']!r}")
                for c in f["children"]:
                    child_records = [r.get(c["name"]) for r in recs]
                    vals = present_for(
                        c["cid"], child_records, c["optional"],
                        f"struct field {f['name']}.{c['name']} "
                        "(declare the field type with '?')")
                    add_leaf(c["cid"], c["kind"], vals,
                             c.get("decimal"))
                continue
            if f["kind"] == "MAP":
                recs = present_for(f["cid"], records, f["nullable"],
                                   f"column {f['name']!r}")
                # dicts from python callers; list-of-(k, v) pairs from
                # arrow's map representation (batch.to_pydict())
                items = [list(r.items()) if isinstance(r, dict)
                         else list(r) for r in recs]
                add("LENGTH", f["cid"],
                    _int_rle([len(r) for r in items], signed=False))
                keys = [kv[0] for r in items for kv in r]
                mvals = [kv[1] for r in items for kv in r]
                kvals = present_for(
                    f["key_cid"], keys, False,
                    f"map key of {f['name']!r} (keys are required)")
                add_leaf(f["key_cid"], f["key_kind"], kvals,
                         f.get("key_decimal"))
                vvals = present_for(
                    f["value_cid"], mvals, f["value_optional"],
                    f"map value of {f['name']!r} (declare the value "
                    "type with '?')")
                add_leaf(f["value_cid"], f["value_kind"], vvals,
                         f.get("value_decimal"))
                continue
            if f["kind"] == "LIST":
                recs = present_for(f["cid"], records, f["nullable"],
                                   f"column {f['name']!r}")
                add("LENGTH", f["cid"],
                    _int_rle([len(r) for r in recs], signed=False))
                elems: list = []
                for r in recs:
                    elems.extend(r)
                vals = present_for(
                    f["child_cid"], elems, f["child_optional"],
                    f"list element of {f['name']!r} (declare the "
                    "element type with '?')")
                add_leaf(f["child_cid"], f["child_kind"], vals,
                         f.get("child_decimal"))
            else:
                vals = present_for(f["cid"], records, f["nullable"],
                                   f"column {f['name']!r}")
                add_leaf(f["cid"], f["kind"], vals, f.get("decimal"))
        data_len = 0
        for _k, _c, framed in streams:
            self._emit(framed)
            data_len += len(framed)
        sf = _PBW()
        for skind, cid, framed in streams:
            sm = _PBW()
            sm.varint_field(1, _STREAM_NUM[skind])
            sm.varint_field(2, cid)
            sm.varint_field(3, len(framed))
            sf.msg_field(1, sm)
        # root struct is always DIRECT; a column whose streams carry
        # integer RLE (incl. the LIST column's LENGTH stream) declares
        # DIRECT_V2 when rle_version == 2 (boolean/float/double
        # streams are unversioned: DIRECT)
        rle_kinds = ("INT", "LONG", "DATE", "STRING", "BINARY",
                     "TIMESTAMP", "DECIMAL")
        col_encs = [0] * self.n_cols
        ts_present = False
        def enc_walk(node):
            """Recursive ColumnEncoding/timestamp scan for NESTED
            trees; returns True when a TIMESTAMP leaf exists."""
            ts = False
            if node.t == "leaf":
                if self.rle_version == 2 and node.kind in rle_kinds:
                    col_encs[node.cid] = 2
                return node.kind == "TIMESTAMP"
            if self.rle_version == 2 and node.t in ("list", "map"):
                col_encs[node.cid] = 2  # LENGTH stream
            if node.t == "struct":
                for f2 in node.fields:
                    ts |= enc_walk(f2)
            elif node.t == "list":
                ts |= enc_walk(node.element)
            elif node.t == "union":
                # the tag stream is plain byte RLE: DIRECT always
                for v in node.variants:
                    ts |= enc_walk(v)
            else:
                ts |= enc_walk(node.key)
                ts |= enc_walk(node.value)
            return ts

        for f in self.fields:
            if f["kind"] == "NESTED":
                ts_present |= enc_walk(f["tree"])
            elif f["kind"] == "MAP":
                if self.rle_version == 2:
                    col_encs[f["cid"]] = 2
                    if f["key_kind"] in rle_kinds:
                        col_encs[f["key_cid"]] = 2
                    if f["value_kind"] in rle_kinds:
                        col_encs[f["value_cid"]] = 2
            elif f["kind"] == "LIST":
                if self.rle_version == 2:
                    col_encs[f["cid"]] = 2
                    if f["child_kind"] in rle_kinds:
                        col_encs[f["child_cid"]] = 2
                ts_present |= f["child_kind"] == "TIMESTAMP"
            elif f["kind"] == "STRUCT":
                for c in f["children"]:
                    if self.rle_version == 2 and c["kind"] in rle_kinds:
                        col_encs[c["cid"]] = 2
                    ts_present |= c["kind"] == "TIMESTAMP"
            else:
                if self.rle_version == 2 and f["kind"] in rle_kinds:
                    col_encs[f["cid"]] = 2
                ts_present |= f["kind"] == "TIMESTAMP"
        for cid, ce in enumerate(col_encs):
            enc = _PBW()
            if cid in dict_sizes:
                # DICTIONARY (v1) / DICTIONARY_V2
                enc.varint_field(1, 3 if self.rle_version == 2 else 1)
                enc.varint_field(2, dict_sizes[cid])
            else:
                enc.varint_field(1, ce)  # DIRECT / DIRECT_V2
            sf.msg_field(2, enc)
        if ts_present:
            sf.str_field(3, "UTC")  # writerTimezone
        sf_blob = compress_entity(sf.finish(), codec, block_size)
        self._emit(sf_blob)
        self._stripe_infos.append((offset, data_len, len(sf_blob), s_n))
        self._stripe_mm.append(st_mm)
        self._stripe_counts.append((st_nn, st_null))
        for cid, mm in st_mm.items():
            prev = self._file_mm.get(cid)
            if prev is None:
                self._file_mm[cid] = mm
            elif mm[0] == "bucket":
                self._file_mm[cid] = ("bucket", prev[1] + mm[1], None)
            else:
                self._file_mm[cid] = (mm[0], min(prev[1], mm[1]),
                                      max(prev[2], mm[2]))
        # a stripe that omitted min/max (NaN / non-ASCII) poisons the
        # file-level merge too
        for cid in list(self._file_mm):
            if cid not in st_mm and st_nn[cid]:
                del self._file_mm[cid]
        self.n_rows += s_n
        return s_n

    @staticmethod
    def _stats_msg(n_values: int, has_null: bool,
                   mm: tuple | None) -> "_PBW":
        """One orc_proto ColumnStatistics message: numberOfValues +
        the type-specific min/max submessage + hasNull."""
        st = _PBW()
        st.varint_field(1, n_values)
        if mm is not None:
            tag, lo, hi = mm
            inner = _PBW()
            if tag == "int":  # IntegerStatistics (sint64 min/max)
                inner.zigzag_field(1, lo)
                inner.zigzag_field(2, hi)
                st.msg_field(2, inner)
            elif tag == "double":  # DoubleStatistics (fixed64)
                inner.double_field(1, lo)
                inner.double_field(2, hi)
                st.msg_field(3, inner)
            elif tag == "string":  # StringStatistics
                inner.bytes_field(1, lo.encode("utf-8"))
                inner.bytes_field(2, hi.encode("utf-8"))
                st.msg_field(4, inner)
            elif tag == "bucket":  # BucketStatistics: count-of-true
                inner.packed_field(1, [lo])
                st.msg_field(5, inner)
            elif tag == "date":  # DateStatistics (sint32 epoch days)
                inner.zigzag_field(1, lo)
                inner.zigzag_field(2, hi)
                st.msg_field(7, inner)
            elif tag == "decimal":  # DecimalStatistics (strings)
                inner.bytes_field(1, str(lo).encode("ascii"))
                inner.bytes_field(2, str(hi).encode("ascii"))
                st.msg_field(6, inner)
        st.varint_field(10, 1 if has_null else 0)
        return st

    def finish(self):
        """Write metadata (per-stripe statistics) + footer +
        postscript; the file is complete after."""
        codec = self.codec
        content_len = self._pos  # stripes only — metadata is after

        # Metadata section: one StripeStatistics per stripe, one
        # ColumnStatistics per column id — the zone maps the source's
        # pushFilters stripe pruning reads at planning time
        meta = _PBW()
        for (st_nn, st_null), st_mm, info in zip(
                self._stripe_counts, self._stripe_mm,
                self._stripe_infos):
            stripe_rows = info[3]
            ss = _PBW()
            for cid in range(self.n_cols):
                n_v = stripe_rows if cid == 0 else st_nn[cid]
                ss.msg_field(1, self._stats_msg(
                    n_v, False if cid == 0 else st_null[cid],
                    st_mm.get(cid)))
            meta.msg_field(1, ss)
        meta_blob = compress_entity(meta.finish(), codec,
                                    self.block_size)
        self._emit(meta_blob)

        footer = _PBW()
        footer.varint_field(1, 3)  # headerLength: the magic
        footer.varint_field(2, content_len)
        for offset, data_len, f_len, rows in self._stripe_infos:
            si = _PBW()
            si.varint_field(1, offset)
            si.varint_field(2, 0)  # indexLength (rowIndexStride == 0)
            si.varint_field(3, data_len)
            si.varint_field(4, f_len)
            si.varint_field(5, rows)
            footer.msg_field(3, si)
        root = _PBW()
        root.varint_field(1, _KIND_NUM["STRUCT"])
        root.packed_field(2, [f["cid"] for f in self.fields])
        for f in self.fields:
            root.bytes_field(3, f["name"].encode("utf-8"))
        footer.msg_field(4, root)
        def _leaf_node(kind: str, dec: tuple | None) -> _PBW:
            leaf = _PBW()
            leaf.varint_field(1, _KIND_NUM[kind])
            if dec is not None:  # Type.precision / Type.scale
                leaf.varint_field(5, dec[0])
                leaf.varint_field(6, dec[1])
            return leaf

        def emit_node(node):
            el2 = _PBW()
            if node.t == "leaf":
                el2.varint_field(1, _KIND_NUM[node.kind])
                if node.decimal is not None:
                    el2.varint_field(5, node.decimal[0])
                    el2.varint_field(6, node.decimal[1])
                footer.msg_field(4, el2)
                return
            if node.t == "struct":
                el2.varint_field(1, _KIND_NUM["STRUCT"])
                el2.packed_field(2, [f2.cid for f2 in node.fields])
                for f2 in node.fields:
                    el2.bytes_field(3, f2.name.encode("utf-8"))
                footer.msg_field(4, el2)
                for f2 in node.fields:
                    emit_node(f2)
                return
            if node.t == "union":
                el2.varint_field(1, _KIND_NUM["UNION"])
                el2.packed_field(2, [v.cid for v in node.variants])
                footer.msg_field(4, el2)
                for v in node.variants:
                    emit_node(v)
                return
            if node.t == "list":
                el2.varint_field(1, _KIND_NUM["LIST"])
                el2.packed_field(2, [node.element.cid])
                footer.msg_field(4, el2)
                emit_node(node.element)
                return
            el2.varint_field(1, _KIND_NUM["MAP"])
            el2.packed_field(2, [node.key.cid, node.value.cid])
            footer.msg_field(4, el2)
            emit_node(node.key)
            emit_node(node.value)

        for f in self.fields:  # type nodes in column-id order
            if f["kind"] == "NESTED":
                emit_node(f["tree"])
                continue
            if f["kind"] == "MAP":
                mp = _PBW()
                mp.varint_field(1, _KIND_NUM["MAP"])
                mp.packed_field(2, [f["key_cid"], f["value_cid"]])
                footer.msg_field(4, mp)
                footer.msg_field(4, _leaf_node(
                    f["key_kind"], f.get("key_decimal")))
                footer.msg_field(4, _leaf_node(
                    f["value_kind"], f.get("value_decimal")))
            elif f["kind"] == "LIST":
                lst = _PBW()
                lst.varint_field(1, _KIND_NUM["LIST"])
                lst.packed_field(2, [f["child_cid"]])
                footer.msg_field(4, lst)
                footer.msg_field(4, _leaf_node(
                    f["child_kind"], f.get("child_decimal")))
            elif f["kind"] == "STRUCT":
                st_node = _PBW()
                st_node.varint_field(1, _KIND_NUM["STRUCT"])
                st_node.packed_field(
                    2, [c["cid"] for c in f["children"]])
                for c in f["children"]:
                    st_node.bytes_field(3, c["name"].encode("utf-8"))
                footer.msg_field(4, st_node)
                for c in f["children"]:
                    footer.msg_field(4, _leaf_node(
                        c["kind"], c.get("decimal")))
            else:
                footer.msg_field(4, _leaf_node(
                    f["kind"], f.get("decimal")))
        footer.varint_field(6, self.n_rows)
        # file-level ColumnStatistics (every column id): counts +
        # hasNull + the per-file min/max merge of the stripe stats
        for cid in range(self.n_cols):
            if cid == 0:
                st = self._stats_msg(self.n_rows,
                                     any(self._had_null), None)
            else:
                st = self._stats_msg(self._nonnull[cid],
                                     self._had_null[cid],
                                     self._file_mm.get(cid))
            footer.msg_field(7, st)
        footer.varint_field(8, 0)  # rowIndexStride: no row indexes
        f_blob = compress_entity(footer.finish(), codec,
                                 self.block_size)
        self._emit(f_blob)

        ps = _PBW()
        ps.varint_field(1, len(f_blob))
        ps.varint_field(2, _COMP_NUM[codec])
        if codec != "NONE":
            ps.varint_field(3, self.block_size)
        ps.packed_field(4, [0, 12])  # file version 0.12
        ps.varint_field(5, len(meta_blob))  # metadataLength
        ps.varint_field(6, 1)  # writerVersion
        ps.bytes_field(8000, b"ORC")
        ps_blob = ps.finish()
        if len(ps_blob) > 255:
            raise ValueError("ORC postscript overflow")
        self._emit(ps_blob)
        self._emit(bytes([len(ps_blob)]))


def orc_write_table(
    columns: dict,
    schema: list[tuple],
    codec: str = "ZLIB",
    stripe_rows: int = 1 << 18,
    block_size: int = 1 << 18,
    rle_version: int = 1,
) -> bytes:
    """Serialize columnar data to a complete .orc file (bytes) — the
    one-shot wrapper over :class:`OrcFileWriter`, slicing ``columns``
    into stripes of ``stripe_rows``."""
    import io

    buf = io.BytesIO()
    w = OrcFileWriter(buf, schema, codec=codec, block_size=block_size,
                      rle_version=rle_version)
    n_rows = None
    for f in w.fields:
        name = f["name"]
        if name not in columns:
            raise ValueError(f"column {name!r} missing from data")
        ln = len(columns[name])
        if n_rows is None:
            n_rows = ln
        elif ln != n_rows:
            raise ValueError("ragged columns: "
                             f"{name!r} has {ln}, expected {n_rows}")
    n_rows = n_rows or 0
    for s0 in range(0, n_rows, stripe_rows):
        w.write_stripe({
            name: vals[s0:s0 + stripe_rows]
            for name, vals in columns.items()
        })
    w.finish()
    return buf.getvalue()
