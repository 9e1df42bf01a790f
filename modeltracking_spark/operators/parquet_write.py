"""From-spec Apache Parquet WRITER — the encode direction of the
round-11 from-spec reader (operators/parquet_native.py), built from
the same public format documents: the parquet-format spec ("File
format" + "Encodings" chapters), parquet.thrift's field numbering,
and THRIFT-110's compact protocol.  Nothing is delegated to a parquet
library: the Thrift compact structs, the RLE/bit-packed hybrid, PLAIN
and RLE_DICTIONARY page encodings, Dremel record shredding for the
standard 3-level LIST, column statistics, and the footer are all
assembled here byte by byte; page compression goes through this
repo's own from-spec snappy/zstd/lz4-block encoders (gzip via stdlib
zlib — itself a reference implementation); LZ4_RAW (codec 7, the
modern plain-block lz4) landed in the round-15 continuation, so the
write matrix covers every codec the read side decodes except BROTLI
(the repo has no brotli encoder — brotli_dec.py is decode-only by
design — and a stored-mode-only stream would be padding, so it stays
the one named write reject).

Validation is reversed from the reader's: the REFERENCE readers
(pyarrow, DuckDB, Spark's JVM DataSource) consume files this module
writes, and the repo's own from-spec reader closes the loop —
tests/test_parquet_write.py runs the full codec × dictionary × null
matrix through all four.

Reference pipeline parity: the original pipeline's outputs are plain
CSV (kmz2csv.py:34-37); this writer generalizes its sink role to the
columnar format the testdata ships in, at 100 TB the only sane
interchange shape (one file per executor partition, written locally
and moved, no driver collection).
"""

from __future__ import annotations

import struct

# parquet.thrift Type / CompressionCodec / Encoding numbers
_PHYS_NUM = {"BOOLEAN": 0, "INT32": 1, "INT64": 2, "FLOAT": 4,
             "DOUBLE": 5, "BYTE_ARRAY": 6,
             "FIXED_LEN_BYTE_ARRAY": 7}
_CODEC_NUM = {"UNCOMPRESSED": 0, "SNAPPY": 1, "GZIP": 2, "ZSTD": 6,
              "LZ4_RAW": 7}
_ENC_PLAIN = 0
_ENC_RLE = 3
_ENC_BIT_PACKED = 4  # deprecated level encoding (fixture tooling)
_ENC_RLE_DICT = 8

#: logical column type -> (physical type, is_string)
_LOGICAL = {
    "boolean": ("BOOLEAN", False),
    "int32": ("INT32", False),
    "int64": ("INT64", False),
    "float": ("FLOAT", False),
    "double": ("DOUBLE", False),
    "string": ("BYTE_ARRAY", True),
    "binary": ("BYTE_ARRAY", False),
    # epoch MICROS carried as INT64 + TIMESTAMP(MICROS, UTC)
    # annotation (the engine's timestamp grain)
    "timestamp": ("INT64", False),
    # epoch DAYS carried as INT32 + DATE annotation
    "date": ("INT32", False),
}


class _ThriftW:
    """Thrift compact-protocol struct writer (THRIFT-110): short-form
    field headers with 4-bit id deltas, zigzag varints, bool values
    carried in the field type nibble."""

    def __init__(self):
        self.out = bytearray()
        self._last_fid = [0]

    # -- primitives ------------------------------------------------
    def _varint(self, n: int):
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def _zigzag(self, n: int):
        self._varint((n << 1) ^ (n >> 63) if n < 0 else (n << 1))

    def _field_header(self, fid: int, tp: int):
        delta = fid - self._last_fid[-1]
        if 0 < delta <= 15:
            self.out.append((delta << 4) | tp)
        else:
            self.out.append(tp)
            self._zigzag(fid)
        self._last_fid[-1] = fid

    # -- fields ----------------------------------------------------
    def field_bool(self, fid: int, v: bool):
        self._field_header(fid, 1 if v else 2)

    def field_i32(self, fid: int, v: int):
        self._field_header(fid, 5)
        self._zigzag(v)

    def field_i64(self, fid: int, v: int):
        self._field_header(fid, 6)
        self._zigzag(v)

    def field_binary(self, fid: int, v: bytes):
        self._field_header(fid, 8)
        self._varint(len(v))
        self.out += v

    def field_string(self, fid: int, v: str):
        self.field_binary(fid, v.encode("utf-8"))

    def begin_struct(self, fid: int):
        self._field_header(fid, 12)
        self._last_fid.append(0)

    def end_struct(self):
        self.out.append(0)  # STOP
        self._last_fid.pop()

    def begin_list(self, fid: int, etype: int, size: int):
        self._field_header(fid, 9)
        if size < 15:
            self.out.append((size << 4) | etype)
        else:
            self.out.append(0xF0 | etype)
            self._varint(size)

    def list_bools(self, fid: int, vals):
        # bool list elements are full bytes: 1 = true, 2 = false
        self.begin_list(fid, 1, len(vals))
        for v in vals:
            self.out.append(1 if v else 2)

    def list_i64(self, fid: int, vals):
        self.begin_list(fid, 6, len(vals))
        for v in vals:
            self._zigzag(v)

    def list_binary(self, fid: int, vals):
        self.begin_list(fid, 8, len(vals))
        for v in vals:
            self._varint(len(v))
            self.out += v

    def field_struct(self, fid: int, child: "_ThriftW"):
        """Splice a fully-built struct (its ``finish()`` bytes carry
        the terminating STOP) as field ``fid``."""
        self.begin_struct(fid)
        self.out += child.finish()
        self._last_fid.pop()

    def list_struct(self, child: "_ThriftW"):
        """Splice a fully-built struct as the next list element."""
        self.out += child.finish()

    def finish(self) -> bytes:
        self.out.append(0)  # terminating STOP of the root struct
        return bytes(self.out)


def bit_packed_encode_levels(levels, bit_width: int) -> bytes:
    """The DEPRECATED standalone BIT_PACKED level encoding (format
    spec "Encodings" §Bit-packed, deprecated): values packed
    MSB-FIRST (the opposite bit order of the hybrid's bit-packed
    groups) with NO length prefix — ancient parquet-mr v1 pages
    carry it; emitted here only as fixture tooling for the reader's
    legacy arm."""
    out = bytearray((len(levels) * bit_width + 7) // 8)
    bit = 0
    for v in levels:
        for k in range(bit_width - 1, -1, -1):
            if (v >> k) & 1:
                out[bit >> 3] |= 1 << (7 - (bit & 7))
            bit += 1
    return bytes(out)


def rle_bp_encode(vals, bit_width: int) -> bytes:
    """Encode values as the RLE/bit-packed hybrid the format defines:
    runs of >= 8 identical values become RLE runs (header LSB 0),
    everything else is grouped into 8-value bit-packed groups (header
    LSB 1, LSB-first bit order) — exactly the two shapes the reader's
    ``rle_bp_hybrid`` walks."""
    out = bytearray()
    width_bytes = max(1, (bit_width + 7) // 8)
    mask = (1 << bit_width) - 1
    pend: list[int] = []  # values awaiting bit-packing

    def _varint(n: int):
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    def flush_bp():
        # bit-packed groups hold exactly 8 values each; a padded tail
        # is only legal at the very END of the encoding (the reader
        # stops at `count`), so mid-stream callers must be 8-aligned
        if not pend:
            return
        while len(pend) % 8:
            pend.append(0)
        _varint((len(pend) // 8 << 1) | 1)
        acc = nbits = 0
        for v in pend:
            acc |= (v & mask) << nbits
            nbits += bit_width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        pend.clear()

    i, n = 0, len(vals)
    while i < n:
        j = i + 1
        while j < n and vals[j] == vals[i]:
            j += 1
        run = j - i
        if len(pend) % 8:
            # fill the open bit-pack group to its 8-value boundary
            # before an RLE run may start (padding would otherwise
            # inject phantom values mid-stream)
            take = min(run, (-len(pend)) % 8)
            pend.extend(vals[i:i + take])
            i += take
            continue
        if run >= 8:
            flush_bp()  # 8-aligned: flushes without padding
            _varint(run << 1)
            out += (vals[i] & mask).to_bytes(width_bytes, "little")
            i = j
        else:
            pend.extend(vals[i:j])
            i = j
    flush_bp()
    return bytes(out)


def _uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_enc(v: int) -> bytes:
    return _uleb((v << 1) if v >= 0 else ((-v) << 1) - 1)


def delta_binary_packed_encode(vals: list[int],
                               bits: int = 64) -> bytes:
    """DELTA_BINARY_PACKED (format spec Encodings.md §Delta Encoding):
    blocks of 128 deltas in 4 miniblocks of 32, zigzag header varints,
    per-block min-delta + per-miniblock bit widths, LSB-first packing;
    trailing value-less miniblocks omit their data (their width bytes
    stay, per the spec).  Delta arithmetic wraps at the PHYSICAL type
    width (``bits``: 32 for INT32, 64 for INT64) — the reader applies
    the same wrap on decode."""
    block, n_mini, mini = 128, 4, 32
    half, full = 1 << (bits - 1), 1 << bits
    out = bytearray()
    out += _uleb(block)
    out += _uleb(n_mini)
    out += _uleb(len(vals))
    out += _zz_enc(vals[0] if vals else 0)
    deltas = []
    for a, b in zip(vals, vals[1:]):
        d = ((b - a + half) % full) - half  # physical-width wrap
        deltas.append(d)
    for b0 in range(0, len(deltas), block):
        blk = deltas[b0:b0 + block]
        min_d = min(blk)
        out += _zz_enc(min_d)
        adj = [d - min_d for d in blk]
        widths = []
        for m0 in range(0, block, mini):
            mb = adj[m0:m0 + mini]
            widths.append(max(v.bit_length() for v in mb) if mb else 0)
        out += bytes(widths)
        for m0 in range(0, block, mini):
            mb = adj[m0:m0 + mini]
            if not mb:
                continue  # trailing miniblock with no values
            w = widths[m0 // mini]
            if w == 0:
                continue
            mb = mb + [0] * (mini - len(mb))
            big = 0
            for j, v in enumerate(mb):
                big |= v << (j * w)
            out += big.to_bytes(mini * w // 8, "little")
    return bytes(out)


def _delta_length_byte_array_encode(blobs: list[bytes]) -> bytes:
    return (delta_binary_packed_encode([len(b) for b in blobs])
            + b"".join(blobs))


def _delta_byte_array_encode(blobs: list[bytes]) -> bytes:
    """Incremental encoding: shared-prefix lengths + suffix DLBA."""
    prefixes = []
    suffixes = []
    prev = b""
    for b in blobs:
        p = 0
        lim = min(len(prev), len(b))
        while p < lim and prev[p] == b[p]:
            p += 1
        prefixes.append(p)
        suffixes.append(b[p:])
        prev = b
    return (delta_binary_packed_encode(prefixes)
            + _delta_length_byte_array_encode(suffixes))


def _byte_stream_split_encode(phys: str, vals) -> bytes:
    import numpy as np

    plain = _plain_encode(phys, vals)
    width = {"FLOAT": 4, "DOUBLE": 8, "INT32": 4, "INT64": 8}[phys]
    arr = np.frombuffer(plain, np.uint8).reshape(-1, width)
    return arr.T.tobytes()


#: value-encoding numbers (parquet.thrift Encoding)
_ENC_DELTA_BP = 5
_ENC_DELTA_LEN_BA = 6
_ENC_DELTA_BA = 7
_ENC_BSS = 9


def _delta_encode_values(phys: str, string: bool, vals) -> tuple:
    """(encoding number, encoded bytes) for value_encoding='delta'."""
    if phys in ("INT32", "INT64"):
        return _ENC_DELTA_BP, delta_binary_packed_encode(
            [int(v) for v in vals], bits=32 if phys == "INT32" else 64)
    if phys == "BYTE_ARRAY":
        blobs = [v.encode("utf-8") if isinstance(v, str) else bytes(v)
                 for v in vals]
        if string:
            return _ENC_DELTA_BA, _delta_byte_array_encode(blobs)
        return _ENC_DELTA_LEN_BA, _delta_length_byte_array_encode(blobs)
    if phys in ("FLOAT", "DOUBLE"):
        return _ENC_BSS, _byte_stream_split_encode(phys, vals)
    return _ENC_PLAIN, _plain_encode(phys, vals)  # boolean fallback


def _plain_encode(phys: str, vals) -> bytes:
    """PLAIN encode present (non-null) values."""
    if phys == "BOOLEAN":
        out = bytearray((len(vals) + 7) // 8)
        for i, v in enumerate(vals):
            if v:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)
    if phys == "INT32":
        return struct.pack(f"<{len(vals)}i", *[int(v) for v in vals])
    if phys == "INT64":
        return struct.pack(f"<{len(vals)}q", *[int(v) for v in vals])
    if phys == "FLOAT":
        return struct.pack(f"<{len(vals)}f", *[float(v) for v in vals])
    if phys == "DOUBLE":
        return struct.pack(f"<{len(vals)}d", *[float(v) for v in vals])
    if phys == "BYTE_ARRAY":
        out = bytearray()
        for v in vals:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += len(b).to_bytes(4, "little")
            out += b
        return bytes(out)
    if phys == "FIXED_LEN_BYTE_ARRAY":
        return b"".join(bytes(v) for v in vals)
    raise NotImplementedError(f"cannot PLAIN-encode {phys}")


def _page_crc(body: bytes) -> int:
    """PageHeader.crc (field 4): CRC-32 over the page's (compressed)
    data, stored as a SIGNED i32 — readers that opt into verification
    (pyarrow ``page_checksum_verification=True``) reject tampered
    pages."""
    import zlib

    v = zlib.crc32(body) & 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _compress(codec: str, body: bytes) -> bytes:
    if codec == "UNCOMPRESSED":
        return body
    if codec == "SNAPPY":
        from modeltracking_spark.operators.snappy import (
            snappy_block_compress,
        )

        return snappy_block_compress(body)
    if codec == "GZIP":
        import zlib

        co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip member
        return co.compress(body) + co.flush()
    if codec == "ZSTD":
        from modeltracking_spark.operators.zstd import zstd_compress

        return zstd_compress(body, checksum=False)
    if codec == "LZ4_RAW":
        # the MODERN lz4 parquet codec (plain lz4 blocks, no hadoop
        # framing — codec 7); the deprecated hadoop-framed LZ4 (5)
        # and LZO (3) stay read-side plug-in rejects
        from modeltracking_spark.operators.lz4 import (
            lz4_block_compress,
        )

        return lz4_block_compress(body)
    raise NotImplementedError(
        f"parquet write codec {codec} not supported "
        "(UNCOMPRESSED/SNAPPY/GZIP/ZSTD/LZ4_RAW)"
    )


def _norm_key(v, string: bool):
    if string and isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    return v


def _stats_bytes(phys: str, v) -> bytes:
    if phys == "INT32":
        return struct.pack("<i", int(v))
    if phys == "INT64":
        return struct.pack("<q", int(v))
    if phys == "FLOAT":
        return struct.pack("<f", float(v))
    if phys == "DOUBLE":
        return struct.pack("<d", float(v))
    if phys == "BOOLEAN":
        return b"\x01" if v else b"\x00"
    b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    return b


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


def _decimal_spec(typ: str):
    """Parse ``decimal(p,s)`` -> (precision, scale, physical,
    type_length).  Physical per the format's recommendation: INT32 up
    to 9 digits, INT64 up to 18, FIXED_LEN_BYTE_ARRAY (minimal
    big-endian two's-complement width) beyond."""
    import re

    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", typ)
    if not m:
        return None
    p, s = int(m.group(1)), int(m.group(2))
    if not (0 < p <= 38) or s < 0 or s > p:
        raise ValueError(f"invalid decimal({p},{s})")
    if p <= 9:
        return p, s, "INT32", 0
    if p <= 18:
        return p, s, "INT64", 0
    n = 1
    while 256 ** n // 2 <= 10 ** p - 1:
        n += 1
    return p, s, "FIXED_LEN_BYTE_ARRAY", n


def _decimal_convert(precision: int, scale: int, nbytes: int):
    """Present-value converter: Decimal/int/str -> unscaled int (or
    big-endian two's-complement bytes for FLBA), with loud overflow /
    inexact-scale rejects."""
    from decimal import Context, Decimal

    ctx = Context(prec=41)  # default 28 rounds 29+-digit unscaled

    def conv(v):
        d = v if isinstance(v, Decimal) else Decimal(str(v))
        u = d.scaleb(scale, ctx)
        if u != u.to_integral_value():
            raise ValueError(
                f"decimal value {v} does not fit scale {scale}")
        u = int(u)
        if abs(u) >= 10 ** precision:
            raise ValueError(
                f"decimal value {v} overflows precision {precision}")
        if nbytes:
            return u.to_bytes(nbytes, "big", signed=True)
        return u

    return conv


class _StructLeafSpec:
    """One primitive leaf of a one-level STRUCT column: its own column
    chunk with path ``[outer, leaf]``; no repetition anywhere, so
    shredding is pure definition levels — 0 = struct null, d1 = leaf
    null, max_def = value present."""

    kind = "structleaf"
    max_rep = 0

    def __init__(self, outer: str, outer_nullable: bool, leaf: str,
                 typ: str, leaf_nullable: bool):
        self.source = outer
        self.name = f"{outer}.{leaf}"
        self.leaf_name = leaf
        self.nullable = leaf_nullable or outer_nullable  # has def lvls
        self.struct_nullable = bool(outer_nullable)
        self.leaf_optional = bool(leaf_nullable)
        self.d1 = 1 if outer_nullable else 0
        self.max_def = self.d1 + (1 if leaf_nullable else 0)
        self.path = [outer, leaf]
        self.decimal = _decimal_spec(typ)
        self.convert = None
        self.type_length = 0
        self.no_minmax = False
        if self.decimal:
            p, s, self.physical, self.type_length = self.decimal
            self.decimal = (p, s)
            self.string = False
            self.convert = _decimal_convert(p, s, self.type_length)
            self.no_minmax = self.physical == "FIXED_LEN_BYTE_ARRAY"
        else:
            if typ not in _LOGICAL:
                raise NotImplementedError(
                    f"struct field type {typ!r} not supported")
            self.physical, self.string = _LOGICAL[typ]
            self.timestamp = typ == "timestamp"
            self.date = typ == "date"

    def shred(self, records):
        defs: list[int] = []
        vals: list = []
        d1, md = self.d1, self.max_def
        for rec in records:
            if rec is None:
                if not self.struct_nullable:
                    raise ValueError(
                        f"null struct in required column "
                        f"{self.source!r}")
                defs.append(0)
                continue
            v = rec.get(self.leaf_name)
            if v is None:
                if not self.leaf_optional:
                    raise ValueError(
                        f"null in required struct field {self.name!r}")
                defs.append(d1)
            else:
                defs.append(md)
                vals.append(v)
        if self.convert is not None:
            vals = [self.convert(v) for v in vals]
        return [0] * len(records), defs, vals


class _MapLeafSpec:
    """One side (key or value) of a MAP column: its own column chunk
    at path ``[outer, key_value, key|value]`` sharing the map's
    repetition structure — shredding mirrors the LIST case with the
    entry stream drawn from dict items.  Keys are REQUIRED per the
    spec; values may be optional."""

    kind = "mapleaf"
    max_rep = 1

    def __init__(self, outer: str, outer_nullable: bool, role: str,
                 typ: str, leaf_nullable: bool):
        if role == "key" and leaf_nullable:
            raise ValueError(
                f"map column {outer!r}: keys must be required")
        self.source = outer
        self.role = role
        self.name = f"{outer}.key_value.{role}"
        self.nullable = True  # always carries def levels (entry grain)
        self.map_nullable = bool(outer_nullable)
        self.leaf_optional = bool(leaf_nullable)
        self.d1 = 1 if outer_nullable else 0
        self.d2 = self.d1 + 1
        self.max_def = self.d2 + (1 if leaf_nullable else 0)
        self.path = [outer, "key_value", role]
        self.decimal = _decimal_spec(typ)
        self.convert = None
        self.type_length = 0
        self.no_minmax = False
        if self.decimal:
            p, s, self.physical, self.type_length = self.decimal
            self.decimal = (p, s)
            self.string = False
            self.convert = _decimal_convert(p, s, self.type_length)
            self.no_minmax = self.physical == "FIXED_LEN_BYTE_ARRAY"
        else:
            if typ not in _LOGICAL:
                raise NotImplementedError(
                    f"map {role} type {typ!r} not supported")
            self.physical, self.string = _LOGICAL[typ]
            self.timestamp = typ == "timestamp"
            self.date = typ == "date"

    def shred(self, records):
        reps: list[int] = []
        defs: list[int] = []
        vals: list = []
        d1, d2, md = self.d1, self.d2, self.max_def
        key_side = self.role == "key"
        for rec in records:
            if rec is None:
                if not self.map_nullable:
                    raise ValueError(
                        f"null map in required column {self.source!r}")
                reps.append(0)
                defs.append(d1 - 1)
                continue
            if len(rec) == 0:
                reps.append(0)
                defs.append(d1)
                continue
            # dicts from python callers; list-of-(k, v) pairs from
            # arrow's map representation (batch.to_pydict())
            items = rec.items() if isinstance(rec, dict) else rec
            for k, (mk, mv) in enumerate(items):
                reps.append(0 if k == 0 else 1)
                v = mk if key_side else mv
                if v is None:
                    if key_side:
                        raise ValueError(
                            f"null map key in column {self.source!r}")
                    if not self.leaf_optional:
                        raise ValueError(
                            f"null map value in column {self.source!r}"
                            " (declare the value type with '?')")
                    defs.append(d2)
                else:
                    defs.append(md)
                    vals.append(v)
        if self.convert is not None:
            vals = [self.convert(v) for v in vals]
        return reps, defs, vals


class _WNode:
    """One node of the GENERAL writer type tree (arbitrary
    LIST/STRUCT/MAP nesting) — mirrors the reader's `_parse_nested`
    thresholds: ``P`` = def at which a container exists (maybe
    empty), ``E`` = def at which an element slot exists, ``rep`` =
    the container's 1-based repeated depth."""

    __slots__ = ("t", "name", "optional", "fields", "element", "key",
                 "value", "P", "E", "rep", "max_def", "physical",
                 "string", "decimal", "convert", "type_length",
                 "no_minmax", "idx", "path", "timestamp", "date")

    def __init__(self, t, name, optional):
        self.t = t
        self.name = name
        self.optional = bool(optional)


def _parse_wtype(name: str, typ: str, optional: bool, rep: int,
                 d: int, path: list) -> _WNode:
    typ = typ.strip()
    if typ.startswith("struct<") and typ.endswith(">"):
        node = _WNode("struct", name, optional)
        node.max_def = d + (1 if optional else 0)
        node.fields = []
        for part in _split_top(typ[7:-1]):
            part = part.strip()
            if not part:
                continue
            fname, colon, ftyp = part.partition(":")
            if not colon:
                raise ValueError(
                    f"struct field needs 'name:type': {part!r}")
            fname, ftyp = fname.strip(), ftyp.strip()
            fopt = ftyp.endswith("?")
            if fopt:
                ftyp = ftyp[:-1]
            node.fields.append(_parse_wtype(
                fname, ftyp, fopt, rep, node.max_def,
                path + [fname]))
        if not node.fields:
            raise ValueError(
                f"struct column {name!r} needs at least one field")
        return node
    if typ.startswith("list<") and typ.endswith(">"):
        inner = typ[5:-1].strip()
        iopt = inner.endswith("?")
        if iopt:
            inner = inner[:-1]
        node = _WNode("list", name, optional)
        node.P = d + (1 if optional else 0)
        node.E = node.P + 1
        node.rep = rep + 1
        node.element = _parse_wtype(
            "element", inner, iopt, rep + 1, node.E,
            path + ["list", "element"])
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
        node = _WNode("map", name, optional)
        node.P = d + (1 if optional else 0)
        node.E = node.P + 1
        node.rep = rep + 1
        node.key = _parse_wtype("key", ktyp, False, rep + 1, node.E,
                                path + ["key_value", "key"])
        if node.key.t != "leaf":
            raise NotImplementedError(
                f"non-leaf map key type in column {name!r}")
        node.value = _parse_wtype(
            "value", vtyp, vopt, rep + 1, node.E,
            path + ["key_value", "value"])
        return node
    # primitive leaf
    node = _WNode("leaf", name, optional)
    node.max_def = d + (1 if optional else 0)
    node.rep = rep  # = the leaf's max repetition level
    node.path = list(path)
    node.decimal = _decimal_spec(typ)
    node.convert = None
    node.type_length = 0
    node.no_minmax = False
    node.idx = -1
    if node.decimal:
        p, s, node.physical, node.type_length = node.decimal
        node.decimal = (p, s)
        node.string = False
        node.convert = _decimal_convert(p, s, node.type_length)
        node.no_minmax = node.physical == "FIXED_LEN_BYTE_ARRAY"
    else:
        if typ not in _LOGICAL:
            raise NotImplementedError(
                f"parquet write type {typ!r} not supported")
        node.physical, node.string = _LOGICAL[typ]
        node.timestamp = typ == "timestamp"
        node.date = typ == "date"
    return node


def _wleaves(node: _WNode, out: list) -> None:
    if node.t == "leaf":
        node.idx = len(out)
        out.append(node)
    elif node.t == "struct":
        for f in node.fields:
            _wleaves(f, out)
    elif node.t == "list":
        _wleaves(node.element, out)
    else:
        _wleaves(node.key, out)
        _wleaves(node.value, out)


class _NestedLeafSpec:
    """One leaf chunk of a GENERAL nested column: presents the same
    surface as the legacy specs to the chunk-writing loop; shredding
    delegates to the owning column's single recursive walk (cached
    per row-group slice so N leaves cost one walk)."""

    kind = "nestedleaf"

    def __init__(self, owner, node: _WNode):
        self.owner = owner
        self.node = node
        self.source = owner.name
        self.name = ".".join(node.path)
        self.path = node.path
        self.physical = node.physical
        self.string = node.string
        self.decimal = node.decimal
        self.type_length = node.type_length
        self.no_minmax = node.no_minmax
        self.max_def = node.max_def
        self.max_rep = node.rep
        self.nullable = node.max_def > 0

    def shred(self, records):
        return self.owner.shred_leaf(self.node.idx, records)


class _NestedColumnSpec:
    """GENERAL nested column (arbitrary LIST/STRUCT/MAP composition):
    one recursive Dremel shred per row group feeds every leaf chunk;
    the schema emits recursively with LIST/MAP annotations mirroring
    parquet-mr's layout."""

    kind = "nested"
    physical = "GROUP"
    max_rep = 0

    def __init__(self, name: str, typ: str, nullable: bool):
        self.name = name
        self.nullable = bool(nullable)
        self.tree = _parse_wtype(name, typ, self.nullable, 0, 0,
                                 [name])
        leaves: list = []
        _wleaves(self.tree, leaves)
        self.leaves = leaves
        self.children = [_NestedLeafSpec(self, lf) for lf in leaves]
        self._cache_key = None
        self._cache_bufs = None
        self._cache_left = 0

    # -- shredding ----------------------------------------------------
    def shred_leaf(self, idx: int, records):
        if self._cache_key is not id(records) or self._cache_left <= 0:
            self._cache_bufs = self._shred_all(records)
            self._cache_key = id(records)
            self._cache_left = len(self.leaves)
        self._cache_left -= 1
        bufs = self._cache_bufs
        if self._cache_left == 0:
            self._cache_key = None  # free after the last leaf
            self._cache_bufs = None
        return bufs[idx]

    def _shred_all(self, records):
        bufs = [([], [], []) for _ in self.leaves]

        def emit_null(node, r, d):
            """Definition stopped at ``d`` above/at ``node`` — every
            leaf underneath records the cut."""
            if node.t == "leaf":
                reps, defs, _v = bufs[node.idx]
                reps.append(r)
                defs.append(d)
            elif node.t == "struct":
                for f in node.fields:
                    emit_null(f, r, d)
            elif node.t == "list":
                emit_null(node.element, r, d)
            else:
                emit_null(node.key, r, d)
                emit_null(node.value, r, d)

        def walk(node, value, r, d):
            t = node.t
            if t == "leaf":
                reps, defs, vals = bufs[node.idx]
                reps.append(r)
                if value is None:
                    if not node.optional:
                        raise ValueError(
                            f"null in required field "
                            f"{'.'.join(node.path)!r}")
                    defs.append(d)
                    return
                defs.append(node.max_def)
                vals.append(node.convert(value)
                            if node.convert is not None else value)
                return
            if t == "struct":
                if value is None:
                    if not node.optional:
                        raise ValueError(
                            f"null struct in required column/field "
                            f"{node.name!r}")
                    emit_null(node, r, d)
                    return
                nd = node.max_def
                for f in node.fields:
                    walk(f, value.get(f.name), r, nd)
                return
            if t == "list":
                if value is None:
                    if not node.optional:
                        raise ValueError(
                            f"null list in required column/field "
                            f"{node.name!r}")
                    emit_null(node, r, d)
                    return
                if len(value) == 0:
                    emit_null(node, r, node.P)
                    return
                for k, el in enumerate(value):
                    walk(node.element, el,
                         r if k == 0 else node.rep, node.E)
                return
            # map
            if value is None:
                if not node.optional:
                    raise ValueError(
                        f"null map in required column/field "
                        f"{node.name!r}")
                emit_null(node, r, d)
                return
            items = value.items() if isinstance(value, dict) else value
            items = list(items)
            if not items:
                emit_null(node, r, node.P)
                return
            for k, (mk, mv) in enumerate(items):
                rr = r if k == 0 else node.rep
                if mk is None:
                    raise ValueError(
                        f"null map key in column/field {node.name!r}")
                walk(node.key, mk, rr, node.E)
                walk(node.value, mv, rr, node.E)

        for rec in records:
            walk(self.tree, rec, 0, 0)
        return bufs

    # -- schema emission ----------------------------------------------
    def n_schema_elements(self) -> int:
        def count(node):
            if node.t == "leaf":
                return 1
            if node.t == "struct":
                return 1 + sum(count(f) for f in node.fields)
            if node.t == "list":
                return 2 + count(node.element)
            return 2 + count(node.key) + count(node.value)

        return count(self.tree)

    def emit_schema(self, fmd, leaf_common, logical) -> None:
        """Append this column's schema elements (depth-first) —
        ``leaf_common``/``logical`` are the writer's shared emitters."""

        def emit(node):
            el = _ThriftW()
            if node.t == "leaf":
                leaf_common(el, node, node.name, node.optional)
                fmd.list_struct(el)
                return
            el.field_i32(3, 1 if node.optional else 0)
            el.field_string(4, node.name)
            if node.t == "struct":
                el.field_i32(5, len(node.fields))
                fmd.list_struct(el)
                for f in node.fields:
                    emit(f)
                return
            el.field_i32(5, 1)
            if node.t == "list":
                el.field_i32(6, 3)  # ConvertedType.LIST
                logical(el, 3)
                fmd.list_struct(el)
                mid = _ThriftW()
                mid.field_i32(3, 2)
                mid.field_string(4, "list")
                mid.field_i32(5, 1)
                fmd.list_struct(mid)
                emit(node.element)
                return
            el.field_i32(6, 1)  # ConvertedType.MAP
            logical(el, 2)
            fmd.list_struct(el)
            mid = _ThriftW()
            mid.field_i32(3, 2)
            mid.field_string(4, "key_value")
            mid.field_i32(5, 2)
            fmd.list_struct(mid)
            emit(node.key)
            emit(node.value)

        emit(self.tree)


def _needs_nested(typ: str) -> bool:
    """True when a writer type string composes beyond the legacy
    one-level shapes (which keep their dedicated fast paths)."""

    def scalar(t):
        t = t.strip()
        if t.endswith("?"):
            t = t[:-1]
        return t in _LOGICAL or _decimal_spec(t) is not None

    typ = typ.strip()
    if typ.startswith("struct<") and typ.endswith(">"):
        return not all(
            scalar(p.partition(":")[2])
            for p in _split_top(typ[7:-1]) if p.strip())
    if typ.startswith("list<") and typ.endswith(">"):
        inner = typ[5:-1].strip()
        if inner.endswith("?"):
            inner = inner[:-1]
        # the legacy one-level list path only handles non-boolean,
        # non-timestamp _LOGICAL elements; boolean/timestamp/decimal
        # elements and any nesting go through the general Dremel shred
        return not (inner in _LOGICAL
                    and inner not in ("boolean", "timestamp"))
    if typ.startswith("map<") and typ.endswith(">"):
        kv = _split_top(typ[4:-1])
        return len(kv) != 2 or not (scalar(kv[0]) and scalar(kv[1]))
    return False


class _ColumnSpec:
    def __init__(self, name: str, typ: str, nullable: bool):
        self.name = name
        self.nullable = bool(nullable)
        self.decimal = None
        self.convert = None
        self.type_length = 0
        self.no_minmax = False
        dec = _decimal_spec(typ)
        if dec is not None:
            p, s, self.physical, self.type_length = dec
            self.decimal = (p, s)
            self.string = False
            self.convert = _decimal_convert(p, s, self.type_length)
            self.no_minmax = self.physical == "FIXED_LEN_BYTE_ARRAY"
            self.kind = "flat"
            self.leaf_optional = False
            self.max_def = 1 if self.nullable else 0
            self.max_rep = 0
            self.path = [name]
            return
        if typ.startswith("struct<") and typ.endswith(">"):
            self.kind = "struct"
            self.physical = "GROUP"
            self.string = False
            self.max_rep = 0
            self.path = [name]
            self.children = []
            for part in _split_top(typ[7:-1]):
                part = part.strip()
                if not part:
                    continue
                fname, _, ftyp = part.partition(":")
                ftyp = ftyp.strip()
                opt = ftyp.endswith("?")
                if opt:
                    ftyp = ftyp[:-1]
                self.children.append(_StructLeafSpec(
                    name, self.nullable, fname.strip(), ftyp, opt))
            if not self.children:
                raise ValueError(
                    f"struct column {name!r} needs at least one field")
            return
        if typ.startswith("map<") and typ.endswith(">"):
            kv = _split_top(typ[4:-1])
            if len(kv) != 2:
                raise ValueError(
                    f"map column {name!r}: type needs 'map<k,v>'")
            ktyp, vtyp = kv[0].strip(), kv[1].strip()
            vopt = vtyp.endswith("?")
            if vopt:
                vtyp = vtyp[:-1]
            if ktyp.endswith("?"):
                raise ValueError(
                    f"map column {name!r}: keys must be required")
            self.kind = "map"
            self.physical = "GROUP"
            self.string = False
            self.max_rep = 1
            self.path = [name]
            self.children = [
                _MapLeafSpec(name, self.nullable, "key", ktyp, False),
                _MapLeafSpec(name, self.nullable, "value", vtyp, vopt),
            ]
            return
        if typ.startswith("list<") and typ.endswith(">"):
            inner = typ[5:-1].strip()
            opt = inner.endswith("?")
            if opt:
                inner = inner[:-1]
            if inner not in _LOGICAL or inner == "boolean":
                raise NotImplementedError(
                    f"list element type {inner!r} not supported")
            self.kind = "list"
            self.physical, self.string = _LOGICAL[inner]
            self.leaf_optional = opt
            d1 = 1 if self.nullable else 0
            self.d1, self.d2 = d1, d1 + 1
            self.max_def = self.d2 + (1 if opt else 0)
            self.max_rep = 1
            self.path = [name, "list", "element"]
        else:
            if typ not in _LOGICAL:
                raise NotImplementedError(
                    f"parquet write type {typ!r} not supported")
            self.kind = "flat"
            self.physical, self.string = _LOGICAL[typ]
            self.timestamp = typ == "timestamp"
            self.date = typ == "date"
            self.leaf_optional = False
            self.max_def = 1 if self.nullable else 0
            self.max_rep = 0
            self.path = [name]

    # ------------------------------------------------------------------
    def shred(self, records):
        """Dremel-shred the records: -> (reps, defs, present_values).
        Flat columns emit one triplet per record; LIST columns one per
        element (or one for a null/empty record)."""
        reps: list[int] = []
        defs: list[int] = []
        vals: list = []
        if self.kind == "flat":
            if self.nullable:
                for v in records:
                    defs.append(0 if v is None else 1)
                    if v is not None:
                        vals.append(v)
            else:
                for v in records:
                    if v is None:
                        raise ValueError(
                            f"null in required column {self.name!r}")
                    vals.append(v)
                defs = [0] * len(records)
            reps = [0] * len(records)
            if self.convert is not None:
                vals = [self.convert(v) for v in vals]
            return reps, defs, vals
        for rec in records:
            if rec is None:
                if not self.nullable:
                    raise ValueError(
                        f"null list in required column {self.name!r}")
                reps.append(0)
                defs.append(self.d1 - 1)
                continue
            if len(rec) == 0:
                reps.append(0)
                defs.append(self.d1)
                continue
            for k, el in enumerate(rec):
                reps.append(0 if k == 0 else 1)
                if el is None:
                    if not self.leaf_optional:
                        raise ValueError(
                            f"null element in list column {self.name!r}"
                            " (declare the element type with '?')")
                    defs.append(self.d2)
                else:
                    defs.append(self.max_def)
                    vals.append(el)
        return reps, defs, vals


def _record_spans(spec, reps: list[int]):
    """Triplet index ranges per record (page splits must respect
    record boundaries for repeated columns)."""
    if spec.max_rep == 0:
        return [(i, i + 1) for i in range(len(reps))]
    spans = []
    start = 0
    for i in range(1, len(reps)):
        if reps[i] == 0:
            spans.append((start, i))
            start = i
    if reps:
        spans.append((start, len(reps)))
    return spans


class ParquetFileWriter:
    """Incremental .parquet writer over any binary file object: call
    ``write_row_group(columns)`` per buffered slice, then ``finish()``
    for the footer.  This is the SINK's memory contract at 100 TB —
    a task holds one row group, never its whole partition; pages
    stream to the file as each group is encoded.

    ``schema`` is a list of ``(name, type, nullable)`` with type one
    of boolean/int32/int64/float/double/string/binary or
    ``list<element>`` (append ``?`` to the element for nullable
    elements, e.g. ``list<float?>``).  ``dictionary`` True forces
    RLE_DICTIONARY data pages, False forces PLAIN, None picks per
    column chunk (dictionary when it shrinks the value bytes).  V1
    data pages, RLE levels, per-chunk min/max/null-count statistics;
    page bodies compressed with ``codec`` (this repo's own
    snappy/zstd encoders, stdlib gzip)."""

    def __init__(
        self,
        fh,
        schema: list[tuple],
        codec: str = "SNAPPY",
        page_rows: int = 1 << 16,
        dictionary: bool | None = None,
        page_version: int = 1,
        value_encoding: str | None = None,
        page_index: bool = True,
        bloom_columns: list[str] | None = None,
        bloom_fpp: float = 0.01,
        created_by: str = ("modeltracking-spark parquet_write "
                           "(from-spec)"),
        level_encoding: str = "rle",
        data_file_ref: str | None = None,
    ):
        codec = codec.upper()
        if page_version not in (1, 2):
            raise ValueError("page_version must be 1 or 2")
        if level_encoding not in ("rle", "bit_packed"):
            raise NotImplementedError(
                f"level_encoding {level_encoding!r} not supported")
        if level_encoding == "bit_packed" and page_version != 1:
            raise ValueError(
                "BIT_PACKED levels are a v1-page legacy shape "
                "(v2 levels are always RLE per the spec)")
        if value_encoding not in (None, "plain", "delta"):
            raise NotImplementedError(
                f"value_encoding {value_encoding!r} not supported")
        if codec not in _CODEC_NUM:
            raise NotImplementedError(
                f"parquet write codec {codec} not supported")
        self.specs = [
            _NestedColumnSpec(*s) if _needs_nested(s[1])
            else _ColumnSpec(*s)
            for s in schema]
        if not self.specs:
            raise ValueError("parquet schema needs at least one column")
        # column-CHUNK grain: struct/map/nested columns contribute one
        # chunk per leaf; everything else is 1:1
        self.chunk_specs = []
        for s in self.specs:
            if s.kind in ("struct", "map", "nested"):
                self.chunk_specs.extend(s.children)
            else:
                self.chunk_specs.append(s)
        self.fh = fh
        self.codec = codec
        self.page_rows = page_rows
        self.dictionary = dictionary
        self.page_version = page_version
        self.value_encoding = value_encoding
        self.level_encoding = level_encoding
        self.page_index = bool(page_index)
        #: Hadoop-summary-file shape: when set, every ColumnChunk
        #: carries this as its file_path (the page bytes live in the
        #: named sibling at the recorded offsets) — pair with copying
        #: the footer into a metadata-only twin (round 15)
        self.data_file_ref = data_file_ref
        known = {cs.name for cs in self.chunk_specs}
        self.bloom_columns = set(bloom_columns or ())
        missing = self.bloom_columns - known
        if missing:
            raise ValueError(
                f"bloom_columns name unknown chunks: {sorted(missing)}")
        if not 0 < bloom_fpp < 1:
            raise ValueError("bloom_fpp must be in (0, 1)")
        self.bloom_fpp = float(bloom_fpp)
        self.created_by = created_by
        self.n_rows = 0
        self._groups_meta: list[tuple] = []
        fh.write(b"PAR1")
        self._pos = 4

    def _emit(self, b: bytes):
        self.fh.write(b)
        self._pos += len(b)

    def write_row_group(self, columns: dict) -> int:
        """Encode ``columns`` (equal-length value lists) as ONE row
        group and stream its pages to the file.  Zero rows is a
        no-op (no empty groups are emitted)."""
        specs = self.specs
        codec = self.codec
        page_rows = self.page_rows
        dictionary = self.dictionary
        g_n = None
        for s in specs:
            if s.name not in columns:
                raise ValueError(f"column {s.name!r} missing from data")
            ln = len(columns[s.name])
            if g_n is None:
                g_n = ln
            elif ln != g_n:
                raise ValueError("ragged columns: "
                                 f"{s.name!r} has {ln}, expected {g_n}")
        g_n = g_n or 0
        if g_n == 0:
            return 0
        chunks_meta = []
        total_bytes = 0
        for spec in self.chunk_specs:
            records = columns[getattr(spec, "source", spec.name)]
            reps, defs, vals = spec.shred(records)
            spans = _record_spans(spec, reps)
            nv = len(reps)

            # --- dictionary decision (per chunk) -------------------
            use_dict = False if self.value_encoding == "delta" \
                else dictionary
            uniq: dict = {}
            if use_dict is not False and spec.physical != "BOOLEAN":
                for v in vals:
                    k = _norm_key(v, spec.string)
                    if k not in uniq:
                        uniq[k] = len(uniq)
                if use_dict is None:
                    use_dict = 0 < len(uniq) <= max(1, len(vals) // 2)
                elif use_dict and not uniq:
                    use_dict = False
            else:
                use_dict = False

            pages = bytearray()
            unc_total = 0
            encodings = {_ENC_RLE}
            dict_page_off = None
            chunk_start = self._pos

            if use_dict:
                dict_plain = _plain_encode(spec.physical, list(uniq))
                body = _compress(codec, dict_plain)
                th = _ThriftW()
                th.field_i32(1, 2)  # PageType.DICTIONARY_PAGE
                th.field_i32(2, len(dict_plain))
                th.field_i32(3, len(body))
                th.field_i32(4, _page_crc(body))
                th.begin_struct(7)  # DictionaryPageHeader
                th.field_i32(1, len(uniq))
                th.field_i32(2, _ENC_PLAIN)
                th.end_struct()
                hdr = th.finish()
                pages += hdr
                pages += body
                unc_total += len(hdr) + len(dict_plain)
                dict_page_off = chunk_start
                encodings.add(_ENC_RLE_DICT)
                idx_bw = max(1, (len(uniq) - 1).bit_length())

            data_page_off = chunk_start + len(pages)

            # --- page-index collection (ColumnIndex/OffsetIndex) ----
            pidx = {"locs": [], "null_pages": [], "null_counts": [],
                    "los": [], "his": [], "ok": not spec.no_minmax}
            _pk = ((lambda v: _norm_key(v, False))
                   if spec.physical == "BYTE_ARRAY" else (lambda v: v))

            def pidx_page(page_off, page_size, first_row, p_defs,
                          n_present, p_vals):
                pidx["locs"].append((page_off, page_size, first_row))
                pidx["null_pages"].append(n_present == 0)
                pidx["null_counts"].append(
                    len(p_defs) - n_present if spec.max_def else 0)
                if n_present == 0:
                    pidx["los"].append(None)
                    pidx["his"].append(None)
                    return
                if spec.physical in ("FLOAT", "DOUBLE") and any(
                        v != v for v in p_vals):
                    pidx["ok"] = False  # NaN page: no ColumnIndex
                if not pidx["ok"]:
                    return
                lo_v = min(p_vals, key=_pk)
                hi_v = max(p_vals, key=_pk)
                if spec.physical in ("FLOAT", "DOUBLE"):
                    if lo_v == 0.0:
                        lo_v = -0.0
                    if hi_v == 0.0:
                        hi_v = 0.0
                pidx["los"].append(lo_v)
                pidx["his"].append(hi_v)

            # --- data pages (record-aligned splits) ----------------
            vpos = 0  # cursor into vals
            for p0 in range(0, max(len(spans), 1), page_rows):
                pg = spans[p0:p0 + page_rows]
                lo = pg[0][0] if pg else 0
                hi = pg[-1][1] if pg else 0
                p_reps = reps[lo:hi]
                p_defs = defs[lo:hi]
                n_present = sum(1 for d in p_defs
                                if d == spec.max_def) \
                    if spec.max_def else hi - lo
                p_vals = vals[vpos:vpos + n_present]
                vpos += n_present

                if use_dict:
                    idx = [uniq[_norm_key(v, spec.string)]
                           for v in p_vals]
                    enc_num = _ENC_RLE_DICT
                    val_bytes = bytes([idx_bw]) + rle_bp_encode(
                        idx, idx_bw)
                elif self.value_encoding == "delta":
                    enc_num, val_bytes = _delta_encode_values(
                        spec.physical, spec.string, p_vals)
                else:
                    enc_num = _ENC_PLAIN
                    val_bytes = _plain_encode(spec.physical, p_vals)
                encodings.add(enc_num)

                if self.page_version == 2:
                    # v2: levels live OUTSIDE the compressed section,
                    # without the v1 4-byte length prefixes
                    rep_b = (rle_bp_encode(p_reps,
                                           spec.max_rep.bit_length())
                             if spec.max_rep else b"")
                    def_b = (rle_bp_encode(p_defs,
                                           spec.max_def.bit_length())
                             if spec.max_def else b"")
                    comp_vals = _compress(codec, val_bytes)
                    body = rep_b + def_b + comp_vals
                    unc_size = len(rep_b) + len(def_b) + len(val_bytes)
                    th = _ThriftW()
                    th.field_i32(1, 3)  # PageType.DATA_PAGE_V2
                    th.field_i32(2, unc_size)
                    th.field_i32(3, len(body))
                    th.field_i32(4, _page_crc(body))
                    th.begin_struct(8)  # DataPageHeaderV2
                    th.field_i32(1, len(p_reps))
                    th.field_i32(2, len(p_reps) - n_present
                                 if spec.max_def else 0)
                    th.field_i32(3, len(pg))
                    th.field_i32(4, enc_num)
                    th.field_i32(5, len(def_b))
                    th.field_i32(6, len(rep_b))
                    th.field_bool(7, True)  # is_compressed
                    th.end_struct()
                    hdr = th.finish()
                    pidx_page(chunk_start + len(pages),
                              len(hdr) + len(body), p0, p_defs,
                              n_present, p_vals)
                    pages += hdr
                    pages += body
                    unc_total += len(hdr) + unc_size
                    if not spans:
                        break
                    continue

                plain = bytearray()
                legacy = self.level_encoding == "bit_packed"
                lvl_enc = _ENC_BIT_PACKED if legacy else _ENC_RLE
                if spec.max_rep:
                    if legacy:  # no length prefix, MSB-first packing
                        plain += bit_packed_encode_levels(
                            p_reps, spec.max_rep.bit_length())
                    else:
                        lv = rle_bp_encode(p_reps,
                                           spec.max_rep.bit_length())
                        plain += len(lv).to_bytes(4, "little")
                        plain += lv
                if spec.max_def:
                    if legacy:
                        plain += bit_packed_encode_levels(
                            p_defs, spec.max_def.bit_length())
                    else:
                        lv = rle_bp_encode(p_defs,
                                           spec.max_def.bit_length())
                        plain += len(lv).to_bytes(4, "little")
                        plain += lv
                plain += val_bytes

                body = _compress(codec, bytes(plain))
                th = _ThriftW()
                th.field_i32(1, 0)  # PageType.DATA_PAGE
                th.field_i32(2, len(plain))
                th.field_i32(3, len(body))
                th.field_i32(4, _page_crc(body))
                th.begin_struct(5)  # DataPageHeader
                th.field_i32(1, len(p_reps))
                th.field_i32(2, enc_num)
                th.field_i32(3, lvl_enc)
                th.field_i32(4, lvl_enc)
                th.end_struct()
                hdr = th.finish()
                pidx_page(chunk_start + len(pages),
                          len(hdr) + len(body), p0, p_defs,
                          n_present, p_vals)
                pages += hdr
                pages += body
                unc_total += len(hdr) + len(plain)
                if not spans:
                    break

            self._emit(bytes(pages))
            total_bytes += len(pages)

            # --- bloom filter (SBBF, XXH64, uncompressed) ----------
            # written right after the chunk's pages; the header +
            # bitset are located by ColumnMetaData 14/15, so layout
            # position is free per the spec
            bloom_loc = None
            if (spec.name in self.bloom_columns
                    and spec.physical != "BOOLEAN" and vals):
                from modeltracking_spark.operators.parquet_native import (
                    bloom_hash,
                    sbbf_insert,
                )

                hashes = {bloom_hash(v, spec.physical, spec.string)
                          for v in vals}
                import math as _math

                # parquet-mr sizing: bits = -8n / ln(1 - fpp^(1/8)),
                # rounded up to a power-of-two byte count, >= 32 B
                bits = (-8.0 * len(hashes)
                        / _math.log(1 - self.bloom_fpp ** 0.125))
                nbytes = 32
                while nbytes * 8 < bits and nbytes < (1 << 20):
                    nbytes <<= 1
                bitset = bytearray(nbytes)
                for h in hashes:
                    sbbf_insert(bitset, h)
                bh = _ThriftW()
                bh.field_i32(1, nbytes)
                bh.begin_struct(2)  # algorithm: BLOCK
                bh.begin_struct(1)
                bh.end_struct()
                bh.end_struct()
                bh.begin_struct(3)  # hash: XXHASH
                bh.begin_struct(1)
                bh.end_struct()
                bh.end_struct()
                bh.begin_struct(4)  # compression: UNCOMPRESSED
                bh.begin_struct(1)
                bh.end_struct()
                bh.end_struct()
                hdr_b = bh.finish()
                bloom_loc = (self._pos, len(hdr_b) + nbytes)
                self._emit(hdr_b)
                self._emit(bytes(bitset))

            # --- chunk statistics ----------------------------------
            null_count = (sum(1 for d in defs if d != spec.max_def)
                          if spec.max_def else 0)
            stat_lo = stat_hi = None
            stat_vals = [] if spec.no_minmax else vals
            if spec.physical in ("FLOAT", "DOUBLE"):
                # parquet-format Statistics doc: writers SHOULD omit
                # min/max when NaN is present (readers may prune on
                # these bounds), and SHOULD write -0.0 as min / +0.0
                # as max so both zeros stay inside the bounds.
                if any(v != v for v in vals):
                    stat_vals = []
            if stat_vals:
                key = (lambda v: _norm_key(v, False)) \
                    if spec.physical == "BYTE_ARRAY" else (lambda v: v)
                stat_lo = min(stat_vals, key=key)
                stat_hi = max(stat_vals, key=key)
                if spec.physical in ("FLOAT", "DOUBLE"):
                    if stat_lo == 0.0:
                        stat_lo = -0.0
                    if stat_hi == 0.0:
                        stat_hi = 0.0

            md = _ThriftW()
            md.field_i32(1, _PHYS_NUM[spec.physical])
            md.begin_list(2, 5, len(encodings))
            for e in sorted(encodings):
                md._zigzag(e)
            md.begin_list(3, 8, len(spec.path))
            for part in spec.path:
                b = part.encode("utf-8")
                md._varint(len(b))
                md.out += b
            md.field_i32(4, _CODEC_NUM[codec])
            md.field_i64(5, nv)
            md.field_i64(6, unc_total)
            md.field_i64(7, len(pages))
            md.field_i64(9, data_page_off)
            if dict_page_off is not None:
                md.field_i64(11, dict_page_off)
            st = _ThriftW()
            any_stat = False
            if spec.max_def:
                st.field_i64(3, null_count)
                any_stat = True
            if stat_lo is not None:
                lo_b = _stats_bytes(spec.physical, stat_lo)
                hi_b = _stats_bytes(spec.physical, stat_hi)
                st.field_binary(5, hi_b)
                st.field_binary(6, lo_b)
                if spec.physical != "BYTE_ARRAY":
                    st.field_binary(1, hi_b)  # legacy max
                    st.field_binary(2, lo_b)  # legacy min
                any_stat = True
            if any_stat:
                md.field_struct(12, st)
            if bloom_loc is not None:
                md.field_i64(14, bloom_loc[0])
                md.field_i32(15, bloom_loc[1])

            # --- page index serialization (located + linked at
            # finish() time; ColumnIndex omitted for chunks whose
            # bounds would be unsound — NaN pages / FLBA decimals) ---
            ci_blob = None
            if (self.page_index and pidx["ok"]
                    and any(v is not None for v in pidx["los"])):
                nn = [(lo2, hi2) for lo2, hi2
                      in zip(pidx["los"], pidx["his"])
                      if lo2 is not None]
                asc = all(_pk(a[0]) <= _pk(b[0])
                          and _pk(a[1]) <= _pk(b[1])
                          for a, b in zip(nn, nn[1:]))
                desc = all(_pk(a[0]) >= _pk(b[0])
                           and _pk(a[1]) >= _pk(b[1])
                           for a, b in zip(nn, nn[1:]))
                ci = _ThriftW()
                ci.list_bools(1, pidx["null_pages"])
                ci.list_binary(2, [
                    b"" if v is None
                    else _stats_bytes(spec.physical, v)
                    for v in pidx["los"]])
                ci.list_binary(3, [
                    b"" if v is None
                    else _stats_bytes(spec.physical, v)
                    for v in pidx["his"]])
                ci.field_i32(4, 1 if asc else 2 if desc else 0)
                if spec.max_def:
                    ci.list_i64(5, pidx["null_counts"])
                ci_blob = ci.finish()
            oi_blob = None
            if self.page_index:
                oi = _ThriftW()
                oi.begin_list(1, 12, len(pidx["locs"]))
                for off2, size2, frow2 in pidx["locs"]:
                    pl = _ThriftW()
                    pl.field_i64(1, off2)
                    pl.field_i32(2, size2)
                    pl.field_i64(3, frow2)
                    oi.list_struct(pl)
                oi_blob = oi.finish()

            cc = _ThriftW()
            if self.data_file_ref is not None:
                cc.field_string(1, self.data_file_ref)
            cc.field_i64(2, chunk_start)  # file_offset (legacy)
            cc.field_struct(3, md)
            # fields 4-7 (offset/column index locations) are appended
            # at finish() time, once the indexes land in the file
            chunks_meta.append((cc, ci_blob, oi_blob))
        self._groups_meta.append((chunks_meta, total_bytes, g_n))
        self.n_rows += g_n
        return g_n

    def finish(self):
        """Write the page indexes, footer + magic; the file is
        complete after this."""
        specs = self.specs

        # --- page indexes: all ColumnIndexes, then all OffsetIndexes
        # (parquet-mr's layout), locations linked into each
        # ColumnChunk as fields 6/7 and 4/5 ------------------------
        locations: dict[tuple, tuple] = {}
        for gi, (chunks_meta, _tb, _gn) in enumerate(self._groups_meta):
            for cj, (_cc, ci_blob, _oi) in enumerate(chunks_meta):
                if ci_blob is not None:
                    locations[(gi, cj, "ci")] = (self._pos,
                                                 len(ci_blob))
                    self._emit(ci_blob)
        for gi, (chunks_meta, _tb, _gn) in enumerate(self._groups_meta):
            for cj, (_cc, _ci, oi_blob) in enumerate(chunks_meta):
                if oi_blob is not None:
                    locations[(gi, cj, "oi")] = (self._pos,
                                                 len(oi_blob))
                    self._emit(oi_blob)
        finished_groups = []
        for gi, (chunks_meta, tb, gn) in enumerate(self._groups_meta):
            done = []
            for cj, (cc, _ci, _oi) in enumerate(chunks_meta):
                oi_loc = locations.get((gi, cj, "oi"))
                ci_loc = locations.get((gi, cj, "ci"))
                if oi_loc is not None:
                    cc.field_i64(4, oi_loc[0])
                    cc.field_i32(5, oi_loc[1])
                if ci_loc is not None:
                    cc.field_i64(6, ci_loc[0])
                    cc.field_i32(7, ci_loc[1])
                done.append(cc.finish())
            finished_groups.append((done, tb, gn))
        self._groups_meta = finished_groups

        def _logical(el: _ThriftW, inner_fid: int):
            # LogicalType wrapper (field 10) holding one empty inner
            # struct (STRING = field 1, LIST = field 3)
            el.begin_struct(10)
            el.begin_struct(inner_fid)
            el.end_struct()
            el.end_struct()

        def _decimal_fields(el: _ThriftW, s):
            # ConvertedType.DECIMAL + legacy scale/precision + the
            # LogicalType.DECIMAL struct {1: scale, 2: precision}
            p, sc = s.decimal
            el.field_i32(6, 5)
            el.field_i32(7, sc)
            el.field_i32(8, p)
            el.begin_struct(10)
            el.begin_struct(5)
            el.field_i32(1, sc)
            el.field_i32(2, p)
            el.end_struct()
            el.end_struct()

        def _leaf_common(el: _ThriftW, s, name: str, optional: bool):
            el.field_i32(1, _PHYS_NUM[s.physical])
            if s.type_length:
                el.field_i32(2, s.type_length)
            el.field_i32(3, 1 if optional else 0)
            el.field_string(4, name)
            if s.decimal:
                _decimal_fields(el, s)
            elif s.string:
                el.field_i32(6, 0)  # ConvertedType.UTF8
                _logical(el, 1)
            elif getattr(s, "timestamp", False):
                # ConvertedType.TIMESTAMP_MICROS + the full
                # LogicalType.TIMESTAMP {adjustedToUTC, unit=MICROS}
                el.field_i32(6, 10)
                el.begin_struct(10)
                el.begin_struct(8)
                el.field_bool(1, True)
                el.begin_struct(2)   # unit
                el.begin_struct(2)   # MicroSeconds (empty)
                el.end_struct()
                el.end_struct()
                el.end_struct()
                el.end_struct()
            elif getattr(s, "date", False):
                el.field_i32(6, 6)  # ConvertedType.DATE
                _logical(el, 6)     # LogicalType.DATE

        fmd = _ThriftW()
        fmd.field_i32(1, 1)  # version
        n_schema = 1 + sum(
            3 if s.kind == "list"
            else 4 if s.kind == "map"
            else 1 + len(s.children) if s.kind == "struct"
            else s.n_schema_elements() if s.kind == "nested"
            else 1
            for s in specs)
        fmd.begin_list(2, 12, n_schema)
        root = _ThriftW()
        root.field_string(4, "schema")
        root.field_i32(5, len(specs))
        fmd.list_struct(root)
        for s in specs:
            if s.kind == "nested":
                s.emit_schema(fmd, _leaf_common, _logical)
                continue
            if s.kind == "struct":
                el = _ThriftW()
                el.field_i32(3, 1 if s.nullable else 0)
                el.field_string(4, s.name)
                el.field_i32(5, len(s.children))
                fmd.list_struct(el)
                for c in s.children:
                    leaf = _ThriftW()
                    _leaf_common(leaf, c, c.leaf_name, c.leaf_optional)
                    fmd.list_struct(leaf)
                continue
            if s.kind == "map":
                el = _ThriftW()
                el.field_i32(3, 1 if s.nullable else 0)
                el.field_string(4, s.name)
                el.field_i32(5, 1)
                el.field_i32(6, 1)  # ConvertedType.MAP
                _logical(el, 2)     # LogicalType.MAP
                fmd.list_struct(el)
                mid = _ThriftW()
                mid.field_i32(3, 2)  # REPEATED
                mid.field_string(4, "key_value")
                mid.field_i32(5, 2)
                fmd.list_struct(mid)
                for c in s.children:
                    leaf = _ThriftW()
                    _leaf_common(leaf, c, c.role,
                                 c.role == "value" and c.leaf_optional)
                    fmd.list_struct(leaf)
                continue
            if s.kind == "list":
                el = _ThriftW()
                el.field_i32(3, 1 if s.nullable else 0)
                el.field_string(4, s.name)
                el.field_i32(5, 1)
                el.field_i32(6, 3)  # ConvertedType.LIST
                _logical(el, 3)
                fmd.list_struct(el)
                mid = _ThriftW()
                mid.field_i32(3, 2)  # REPEATED
                mid.field_string(4, "list")
                mid.field_i32(5, 1)
                fmd.list_struct(mid)
                leaf = _ThriftW()
                leaf.field_i32(1, _PHYS_NUM[s.physical])
                leaf.field_i32(3, 1 if s.leaf_optional else 0)
                leaf.field_string(4, "element")
                if s.string:
                    leaf.field_i32(6, 0)  # ConvertedType.UTF8
                    _logical(leaf, 1)
                fmd.list_struct(leaf)
            else:
                el = _ThriftW()
                _leaf_common(el, s, s.name, s.nullable)
                fmd.list_struct(el)
        fmd.field_i64(3, self.n_rows)
        fmd.begin_list(4, 12, len(self._groups_meta))
        for chunks_meta, total_bytes, g_n in self._groups_meta:
            rg = _ThriftW()
            rg.begin_list(1, 12, len(chunks_meta))
            for cm in chunks_meta:
                rg.out += cm
            rg.field_i64(2, total_bytes)
            rg.field_i64(3, g_n)
            fmd.list_struct(rg)
        fmd.field_string(6, self.created_by)
        blob = fmd.finish()
        self._emit(blob)
        self._emit(len(blob).to_bytes(4, "little"))
        self._emit(b"PAR1")


def parquet_write_table(
    columns: dict,
    schema: list[tuple],
    codec: str = "SNAPPY",
    row_group_rows: int = 1 << 20,
    page_rows: int = 1 << 16,
    dictionary: bool | None = None,
    page_version: int = 1,
    value_encoding: str | None = None,
    bloom_columns: list[str] | None = None,
    bloom_fpp: float = 0.01,
    created_by: str = "modeltracking-spark parquet_write (from-spec)",
    level_encoding: str = "rle",
) -> bytes:
    """Serialize columnar data to a complete .parquet file (bytes) —
    the one-shot wrapper over :class:`ParquetFileWriter`, slicing
    ``columns`` into row groups of ``row_group_rows``."""
    import io

    buf = io.BytesIO()
    w = ParquetFileWriter(buf, schema, codec=codec,
                          page_rows=page_rows, dictionary=dictionary,
                          page_version=page_version,
                          value_encoding=value_encoding,
                          bloom_columns=bloom_columns,
                          bloom_fpp=bloom_fpp,
                          created_by=created_by,
                          level_encoding=level_encoding)
    n_rows = None
    for s in w.specs:
        if s.name not in columns:
            raise ValueError(f"column {s.name!r} missing from data")
        ln = len(columns[s.name])
        if n_rows is None:
            n_rows = ln
        elif ln != n_rows:
            raise ValueError("ragged columns: "
                             f"{s.name!r} has {ln}, expected {n_rows}")
    n_rows = n_rows or 0
    for g0 in range(0, n_rows, row_group_rows):
        w.write_row_group({
            name: vals[g0:g0 + row_group_rows]
            for name, vals in columns.items()
        })
    w.finish()
    return buf.getvalue()


def write_legacy_two_level(path: str, ids: list, vals: list,
                           tags: list) -> None:
    """Fixture tooling (round 14, VERDICT r13 item 6): hand-builds a
    parquet file carrying the LEGACY 2-level list shapes from the
    format spec's backward-compatibility rules (LogicalTypes.md
    "Backward-compatibility rules") — shapes NO modern writer emits
    but pre-standard Hive/Impala files still carry::

        message schema {
          required int64 id;
          repeated int64 vals;            // rule 1: bare repeated
                                          // primitive = required list
                                          // of required elements
          optional group tags (LIST) {
            repeated binary tag (UTF8);   // rule 2: the repeated
                                          // field under LIST is not a
                                          // group -> it IS the
                                          // element, required
          }
        }

    One row group, v1 data pages, RLE levels, PLAIN values,
    uncompressed — every byte below is the spec's, so the reader
    conformance claim is against the FORMAT, not a writer quirk.
    pyarrow (which implements the same compat rules) reads the file
    back as the twin in tests/test_parquet_native.py."""
    n = len(ids)
    if len(vals) != n or len(tags) != n:
        raise ValueError("ragged legacy-fixture columns")
    for v in vals:
        if v is None:
            raise ValueError(
                "rule-1 lists are REQUIRED (bare repeated field); "
                "got a None record")

    def shred_two_level(records, max_def, none_def=None):
        reps, defs, flat = [], [], []
        for rec in records:
            if rec is None:
                reps.append(0)
                defs.append(none_def)
                continue
            if not rec:
                reps.append(0)
                defs.append(max_def - 1)
                continue
            for j, e in enumerate(rec):
                reps.append(0 if j == 0 else 1)
                defs.append(max_def)
                flat.append(e)
        return reps, defs, flat

    v_reps, v_defs, v_flat = shred_two_level(vals, 1)
    t_reps, t_defs, t_flat = shred_two_level(tags, 2, none_def=0)

    def v1_page(phys, reps, defs, flat, max_rep, max_def):
        plain = bytearray()
        if max_rep:
            lv = rle_bp_encode(reps, max_rep.bit_length())
            plain += len(lv).to_bytes(4, "little") + lv
        if max_def:
            lv = rle_bp_encode(defs, max_def.bit_length())
            plain += len(lv).to_bytes(4, "little") + lv
        plain += _plain_encode(phys, flat)
        th = _ThriftW()
        th.field_i32(1, 0)  # PageType.DATA_PAGE
        th.field_i32(2, len(plain))
        th.field_i32(3, len(plain))  # uncompressed
        th.field_i32(4, _page_crc(bytes(plain)))
        th.begin_struct(5)  # DataPageHeader
        th.field_i32(1, len(reps) if max_rep else len(flat))
        th.field_i32(2, _ENC_PLAIN)
        th.field_i32(3, _ENC_RLE)
        th.field_i32(4, _ENC_RLE)
        th.end_struct()
        return th.finish() + bytes(plain)

    chunks = [
        ("INT64", ["id"], [], [], ids, 0, 0),
        ("INT64", ["vals"], v_reps, v_defs, v_flat, 1, 1),
        ("BYTE_ARRAY", ["tags", "tag"], t_reps, t_defs, t_flat, 1, 2),
    ]
    out = bytearray(b"PAR1")
    chunk_meta = []
    for phys, cpath, reps, defs, flat, mr, md in chunks:
        off = len(out)
        page = v1_page(phys, reps, defs, flat, mr, md)
        out += page
        cm = _ThriftW()
        cm.field_i32(1, _PHYS_NUM[phys])
        cm.begin_list(2, 5, 2)
        cm._zigzag(_ENC_PLAIN)
        cm._zigzag(_ENC_RLE)
        cm.list_binary(3, [p.encode() for p in cpath])
        cm.field_i32(4, _CODEC_NUM["UNCOMPRESSED"])
        cm.field_i64(5, len(reps) if mr else len(flat))
        cm.field_i64(6, len(page))
        cm.field_i64(7, len(page))
        cm.field_i64(9, off)
        chunk_meta.append((cm, len(page)))

    fmd = _ThriftW()
    fmd.field_i32(1, 1)  # version
    fmd.begin_list(2, 12, 5)  # 5 SchemaElements incl. root
    root = _ThriftW()
    root.field_string(4, "schema")
    root.field_i32(5, 3)
    fmd.list_struct(root)
    el = _ThriftW()  # required int64 id
    el.field_i32(1, _PHYS_NUM["INT64"])
    el.field_i32(3, 0)
    el.field_string(4, "id")
    fmd.list_struct(el)
    el = _ThriftW()  # repeated int64 vals  (rule 1)
    el.field_i32(1, _PHYS_NUM["INT64"])
    el.field_i32(3, 2)  # REPEATED
    el.field_string(4, "vals")
    fmd.list_struct(el)
    el = _ThriftW()  # optional group tags (LIST)
    el.field_i32(3, 1)
    el.field_string(4, "tags")
    el.field_i32(5, 1)
    el.field_i32(6, 3)  # ConvertedType.LIST
    el.begin_struct(10)
    el.begin_struct(3)  # LogicalType.LIST
    el.end_struct()
    el.end_struct()
    fmd.list_struct(el)
    el = _ThriftW()  # repeated binary tag (UTF8)  (rule 2)
    el.field_i32(1, _PHYS_NUM["BYTE_ARRAY"])
    el.field_i32(3, 2)  # REPEATED
    el.field_string(4, "tag")
    el.field_i32(6, 0)  # ConvertedType.UTF8
    el.begin_struct(10)
    el.begin_struct(1)  # LogicalType.STRING
    el.end_struct()
    el.end_struct()
    fmd.list_struct(el)
    fmd.field_i64(3, n)  # num_rows
    fmd.begin_list(4, 12, 1)  # one row group
    rg = _ThriftW()
    rg.begin_list(1, 12, len(chunk_meta))
    total = 0
    for cm, psize in chunk_meta:
        cc = _ThriftW()
        cc.field_i64(2, 0)
        cc.field_struct(3, cm)
        rg.list_struct(cc)
        total += psize
    rg.field_i64(2, total)
    rg.field_i64(3, n)
    fmd.list_struct(rg)
    fmd.field_string(6, "modeltracking-spark legacy-2level fixture "
                        "(from-spec, hand-built)")
    blob = fmd.finish()
    out += blob
    out += len(blob).to_bytes(4, "little")
    out += b"PAR1"
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def write_legacy_struct_list(path: str, ids: list, pairs: list) -> None:
    """Fixture tooling (round 14 bonus): the OTHER legacy 2-level
    shapes — backward-compatibility rules 3/4, where the repeated
    field under a LIST group is a GROUP that is itself the (required
    STRUCT) element: either it has multiple fields, or it is named
    ``array`` / ``<list>_tuple``.  Emitted here as the classic
    Hive/Impala ``_tuple`` form::

        message schema {
          required int64 id;
          optional group pairs (LIST) {
            repeated group pairs_tuple {
              required int64 a;
              optional binary b (UTF8);
            }
          }
        }

    One row group, v1 pages, RLE levels, PLAIN, uncompressed.
    ``pairs``: per record None | list of (a, b_or_None)."""
    n = len(ids)
    if len(pairs) != n:
        raise ValueError("ragged legacy-fixture columns")

    a_reps, a_defs, a_vals = [], [], []
    b_reps, b_defs, b_vals = [], [], []
    for rec in pairs:
        if rec is None:
            a_reps.append(0)
            a_defs.append(0)
            b_reps.append(0)
            b_defs.append(0)
            continue
        if not rec:
            a_reps.append(0)
            a_defs.append(1)
            b_reps.append(0)
            b_defs.append(1)
            continue
        for j, (a, b) in enumerate(rec):
            r = 0 if j == 0 else 1
            a_reps.append(r)
            a_defs.append(2)
            a_vals.append(a)
            b_reps.append(r)
            if b is None:
                b_defs.append(2)
            else:
                b_defs.append(3)
                b_vals.append(b)

    def v1_page(phys, reps, defs, flat, max_rep, max_def):
        plain = bytearray()
        if max_rep:
            lv = rle_bp_encode(reps, max_rep.bit_length())
            plain += len(lv).to_bytes(4, "little") + lv
        if max_def:
            lv = rle_bp_encode(defs, max_def.bit_length())
            plain += len(lv).to_bytes(4, "little") + lv
        plain += _plain_encode(phys, flat)
        th = _ThriftW()
        th.field_i32(1, 0)
        th.field_i32(2, len(plain))
        th.field_i32(3, len(plain))
        th.field_i32(4, _page_crc(bytes(plain)))
        th.begin_struct(5)
        th.field_i32(1, len(reps) if max_rep else len(flat))
        th.field_i32(2, _ENC_PLAIN)
        th.field_i32(3, _ENC_RLE)
        th.field_i32(4, _ENC_RLE)
        th.end_struct()
        return th.finish() + bytes(plain)

    chunks = [
        ("INT64", ["id"], [], [], ids, 0, 0),
        ("INT64", ["pairs", "pairs_tuple", "a"], a_reps, a_defs,
         a_vals, 1, 2),
        ("BYTE_ARRAY", ["pairs", "pairs_tuple", "b"], b_reps, b_defs,
         b_vals, 1, 3),
    ]
    out = bytearray(b"PAR1")
    chunk_meta = []
    for phys, cpath, reps, defs, flat, mr, md in chunks:
        off = len(out)
        page = v1_page(phys, reps, defs, flat, mr, md)
        out += page
        cm = _ThriftW()
        cm.field_i32(1, _PHYS_NUM[phys])
        cm.begin_list(2, 5, 2)
        cm._zigzag(_ENC_PLAIN)
        cm._zigzag(_ENC_RLE)
        cm.list_binary(3, [p.encode() for p in cpath])
        cm.field_i32(4, _CODEC_NUM["UNCOMPRESSED"])
        cm.field_i64(5, len(reps) if mr else len(flat))
        cm.field_i64(6, len(page))
        cm.field_i64(7, len(page))
        cm.field_i64(9, off)
        chunk_meta.append((cm, len(page)))

    fmd = _ThriftW()
    fmd.field_i32(1, 1)
    fmd.begin_list(2, 12, 6)  # root, id, pairs, pairs_tuple, a, b
    root = _ThriftW()
    root.field_string(4, "schema")
    root.field_i32(5, 2)
    fmd.list_struct(root)
    el = _ThriftW()  # required int64 id
    el.field_i32(1, _PHYS_NUM["INT64"])
    el.field_i32(3, 0)
    el.field_string(4, "id")
    fmd.list_struct(el)
    el = _ThriftW()  # optional group pairs (LIST)
    el.field_i32(3, 1)
    el.field_string(4, "pairs")
    el.field_i32(5, 1)
    el.field_i32(6, 3)  # ConvertedType.LIST
    el.begin_struct(10)
    el.begin_struct(3)
    el.end_struct()
    el.end_struct()
    fmd.list_struct(el)
    el = _ThriftW()  # repeated group pairs_tuple (rule 4: _tuple name)
    el.field_i32(3, 2)
    el.field_string(4, "pairs_tuple")
    el.field_i32(5, 2)
    fmd.list_struct(el)
    el = _ThriftW()  # required int64 a
    el.field_i32(1, _PHYS_NUM["INT64"])
    el.field_i32(3, 0)
    el.field_string(4, "a")
    fmd.list_struct(el)
    el = _ThriftW()  # optional binary b (UTF8)
    el.field_i32(1, _PHYS_NUM["BYTE_ARRAY"])
    el.field_i32(3, 1)
    el.field_string(4, "b")
    el.field_i32(6, 0)
    el.begin_struct(10)
    el.begin_struct(1)
    el.end_struct()
    el.end_struct()
    fmd.list_struct(el)
    fmd.field_i64(3, n)
    fmd.begin_list(4, 12, 1)
    rg = _ThriftW()
    rg.begin_list(1, 12, len(chunk_meta))
    total = 0
    for cm, psize in chunk_meta:
        cc = _ThriftW()
        cc.field_i64(2, 0)
        cc.field_struct(3, cm)
        rg.list_struct(cc)
        total += psize
    rg.field_i64(2, total)
    rg.field_i64(3, n)
    fmd.list_struct(rg)
    fmd.field_string(6, "modeltracking-spark legacy-struct-list "
                        "fixture (from-spec, hand-built)")
    blob = fmd.finish()
    out += blob
    out += len(blob).to_bytes(4, "little")
    out += b"PAR1"
    with open(path, "wb") as fh:
        fh.write(bytes(out))
