"""From-spec Apache Arrow IPC reader AND writer (streaming + file
formats) — the columnar interchange format, implemented from the
public Arrow "IPC Streaming/File Format" specification and the
published flatbuffers wire format (Message.fbs / Schema.fbs /
File.fbs field numbering).  Nothing delegates to pyarrow: the
encapsulated-message framing (continuation marker + metadata length
+ flatbuffer + 8-padded body), a minimal from-spec FlatBuffers
walker (root uoffset, vtable indirection, strings/vectors/unions/
inline structs), the Schema type tree, RecordBatch field nodes +
buffer layout (validity bitmap / offsets / data, depth-first per
field), DictionaryBatch value delivery (initial + isDelta appends,
index-type resolution per DictionaryEncoding), and the optional
LZ4_FRAME / ZSTD body compression (each buffer: int64
uncompressed-length prefix + frame) via THIS repo's own from-spec
lz4/zstd codecs — both directions.

The write side (round 13) emits the same surface it reads: the
``_FBBuilder`` below is the mirror of the ``_FB`` walker (vtable +
table emission with absolute scalar alignment, so the reference
flatbuffers verifier accepts the bytes), streams get
Schema/RecordBatch messages + EOS, files add the ARROW1 magics and
the File.fbs Footer (schema copy + Block index of every message).

Scope (round 14 — recursive type trees in BOTH directions): primitive
columns (ints at all widths, float16/32/64, bool, utf8/binary and
their Large 64-bit-offset variants, date32/date64, timestamp,
decimal128/256, time32/64, duration, fixed-size binary) composed to
ARBITRARY nesting depth (capped at 32 levels, a typed reject beyond)
through List, LargeList, FixedSizeList (the canonical arrow embedding
shape; no offsets buffer, child length = n*k), Struct (children are
FULL-length arrays with their own validity, per the spec's Struct
layout) and Map (List<entries: Struct<key, value>>, surfaced as
(key, value) pairs) — list-of-struct, struct-of-struct, map values
that are lists, and so on.  Dictionary-encoded columns of LEAF value
types read AND write at any nesting position: the writer builds the
dictionaries batch-incrementally and emits initial + isDelta
DictionaryBatch messages in the stream format (the file format gets
one consolidated dictionary per id, since the File spec forbids
replacements/deltas).  UNION columns READ AND WRITE (round 15
completes the interchange matrix: sparse + dense, the V5 no-validity
layout — int8 types buffer, int32 offsets when dense, declared
typeIds preserved verbatim; surfaced as {"tag", "value"} like the
ORC UNION arm; offsets overrunning a variant child reject loudly
where pyarrow's lazy validation misreads).  Dictionary-encoded
NESTED value types (dictionary-of-list/struct/map, the
DictionaryArray.from_arrays shape real writers emit for repeated
categorical fields) read AND write at any position — the
DictionaryBatch carries the nested value tree through the same
recursive walk both ways (the writer's index map keys nested values
canonically via ``_freeze``); dictionary-of-UNION stays the one
typed reject (no writer emits it).  BIG-endian streams read AND
write (round 15 — the schema's Endianness flag marks the type tree;
every width-typed buffer — ints, floats, offsets, union offsets,
dictionary indices, decimal words — packs/unpacks in the declared
order; bitmaps and utf8 payloads are order-free per spec), so the
former reject list is EMPTY: every Schema.fbs surface this module
names round-trips.  The ARROW 1.4 LAYOUTS read AND write (round 15
extension): Utf8View/BinaryView (16-byte view structs — inline <= 12
bytes, else prefix + buffer_index + offset into the batch's VARIADIC
data buffers, counted by RecordBatch.variadicBufferCounts in
depth-first field order; the read side accepts any buffer count and
validates the 4-byte prefix against the referenced data, the write
side emits one data buffer per chunk or zero when every view is
inline — pyarrow's own shape), ListView/LargeListView (separate
offsets + sizes buffers, n entries each — out-of-order and
overlapping windows are legal on read; the writer emits dense
in-order windows), and RunEndEncoded (NO buffers of its own, not
even validity — children are regular run_ends int16/32/64 +
values arrays; read validates strict monotonicity and coverage,
write run-length-compresses via the same ``_freeze`` canonical
equality the dictionary index map uses).
Validation: pyarrow (the reference implementation) WRITES every read
fixture and READS every written stream/file in
tests/test_arrow_ipc.py — adversarial in both directions (the one
asymmetry: pyarrow cannot byte-swap BIG-endian view/REE buffers —
its own NotImplemented — so the BE arm of those five layouts is
pinned by this module's reader instead).
"""

from __future__ import annotations

import struct

_CONT = 0xFFFFFFFF


def _malformed(exc):
    return ValueError(f"malformed arrow ipc: {exc}")


class _FB:
    """Minimal from-spec FlatBuffers accessor set: little-endian,
    bounds-checked; tables resolve fields through their vtable."""

    def __init__(self, buf: bytes):
        self.b = buf

    def _chk(self, pos: int, n: int):
        if pos < 0 or pos + n > len(self.b):
            raise ValueError("flatbuffer offset out of bounds")

    def i8(self, pos):
        self._chk(pos, 1)
        return struct.unpack_from("<b", self.b, pos)[0]

    def u8(self, pos):
        self._chk(pos, 1)
        return self.b[pos]

    def i16(self, pos):
        self._chk(pos, 2)
        return struct.unpack_from("<h", self.b, pos)[0]

    def i32(self, pos):
        self._chk(pos, 4)
        return struct.unpack_from("<i", self.b, pos)[0]

    def u32(self, pos):
        self._chk(pos, 4)
        return struct.unpack_from("<I", self.b, pos)[0]

    def i64(self, pos):
        self._chk(pos, 8)
        return struct.unpack_from("<q", self.b, pos)[0]

    def root(self) -> int:
        return self.u32(0)

    def field(self, table: int, idx: int) -> int | None:
        """Absolute position of field ``idx`` (0-based slot) of the
        table at ``table``; None when absent."""
        vt = table - self.i32(table)
        vt_len = self.i16(vt)
        slot = 4 + 2 * idx
        if slot + 2 > vt_len:
            return None
        off = self.i16(vt + slot)
        if off == 0:
            return None
        return table + off

    def indirect(self, pos: int) -> int:
        return pos + self.u32(pos)

    def string(self, pos: int) -> str:
        p = self.indirect(pos)
        n = self.u32(p)
        self._chk(p + 4, n)
        return self.b[p + 4:p + 4 + n].decode("utf-8")

    def vector(self, pos: int) -> tuple[int, int]:
        """-> (element_count, first_element_pos)."""
        p = self.indirect(pos)
        return self.u32(p), p + 4


#: Schema.fbs Type union member numbering (public)
_TYPE_NAMES = {
    1: "Null", 2: "Int", 3: "FloatingPoint", 4: "Binary", 5: "Utf8",
    6: "Bool", 7: "Decimal", 8: "Date", 9: "Time", 10: "Timestamp",
    11: "Interval", 12: "List", 13: "Struct_", 14: "Union",
    15: "FixedSizeBinary", 16: "FixedSizeList", 17: "Map",
    18: "Duration", 19: "LargeBinary", 20: "LargeUtf8",
    21: "LargeList", 22: "RunEndEncoded", 23: "BinaryView",
    24: "Utf8View", 25: "ListView", 26: "LargeListView",
}


#: nesting levels past which schemas are rejected (keeps the recursive
#: walkers clear of the interpreter's own recursion limit on crafted
#: input; no real interchange file nests anywhere near this deep)
_MAX_DEPTH = 32

#: type-tree nodes that own child arrays
_NESTED = ("List", "LargeList", "FixedSizeList", "Struct_", "Map",
           "Union", "ListView", "LargeListView", "RunEndEncoded")


def _parse_field(fb: _FB, fpos: int, depth: int = 0) -> dict:
    if depth > _MAX_DEPTH:
        raise NotImplementedError(
            f"arrow nesting deeper than {_MAX_DEPTH} levels not "
            "supported")
    name_p = fb.field(fpos, 0)
    name = fb.string(name_p) if name_p is not None else ""
    nullable_p = fb.field(fpos, 1)
    nullable = bool(fb.u8(nullable_p)) if nullable_p is not None \
        else False
    tt_p = fb.field(fpos, 2)
    type_type = fb.u8(tt_p) if tt_p is not None else 0
    t_p = fb.field(fpos, 3)
    tname = _TYPE_NAMES.get(type_type)
    if tname is None:
        raise NotImplementedError(
            f"arrow type union member {type_type} not supported")
    dict_p = fb.field(fpos, 4)
    dict_enc = None
    if dict_p is not None:
        # DictionaryEncoding: 0 id (long), 1 indexType (Int table —
        # absent means the spec default, signed int32), 2 isOrdered,
        # 3 dictionaryKind.  The field's OWN type (slots 2/3) is the
        # dictionary VALUE type; batches carry indices.
        dpos = fb.indirect(dict_p)
        id_p = fb.field(dpos, 0)
        ix_p = fb.field(dpos, 1)
        bits, signed = 32, True
        if ix_p is not None:
            ipos = fb.indirect(ix_p)
            bw_p = fb.field(ipos, 0)
            sg_p = fb.field(ipos, 1)
            # an absent bitWidth slot means the flatbuffers SCHEMA
            # default (0), which is no valid index width — reject it
            # rather than guessing int32 (ADVICE r13)
            bits = fb.i32(bw_p) if bw_p is not None else 0
            signed = bool(fb.u8(sg_p)) if sg_p is not None else False
        if bits not in (8, 16, 32, 64):
            raise ValueError(
                f"arrow dictionary index width {bits} invalid "
                "(must be 8/16/32/64)")
        dict_enc = {
            "id": fb.i64(id_p) if id_p is not None else 0,
            "bits": bits,
            "signed": signed,
        }
    out = {"name": name, "nullable": nullable, "type": tname,
           "dictionary": dict_enc}
    tpos = fb.indirect(t_p) if t_p is not None else None
    if tname == "Int":
        bw_p = fb.field(tpos, 0)
        sg_p = fb.field(tpos, 1)
        out["bits"] = fb.i32(bw_p) if bw_p is not None else 32
        out["signed"] = bool(fb.u8(sg_p)) if sg_p is not None \
            else False
    elif tname == "FloatingPoint":
        pr_p = fb.field(tpos, 0)
        out["precision"] = fb.i16(pr_p) if pr_p is not None else 0
    elif tname == "Timestamp":
        u_p = fb.field(tpos, 0)
        out["unit"] = fb.i16(u_p) if u_p is not None else 0
    elif tname == "Date":
        u_p = fb.field(tpos, 0)
        out["unit"] = fb.i16(u_p) if u_p is not None else 0  # 0=DAY
        if out["unit"] not in (0, 1):  # 1=MILLISECOND (date64)
            raise ValueError(f"arrow Date unit {out['unit']} invalid")
    elif tname == "FixedSizeList":
        ls_p = fb.field(tpos, 0)
        out["list_size"] = fb.i32(ls_p) if ls_p is not None else 0
        if out["list_size"] <= 0:
            raise ValueError("arrow FixedSizeList without a size")
    elif tname == "Decimal":
        pr_p = fb.field(tpos, 0)
        sc_p = fb.field(tpos, 1)
        bw_p = fb.field(tpos, 2)
        out["precision"] = fb.i32(pr_p) if pr_p is not None else 0
        out["scale"] = fb.i32(sc_p) if sc_p is not None else 0
        out["bits"] = fb.i32(bw_p) if bw_p is not None else 128
        if out["bits"] not in (128, 256):
            raise ValueError("arrow Decimal width must be 128/256")
    elif tname == "Time":
        u_p = fb.field(tpos, 0)
        bw_p = fb.field(tpos, 1)
        out["unit"] = fb.i16(u_p) if u_p is not None else 1
        out["bits"] = fb.i32(bw_p) if bw_p is not None else 32
        if out["bits"] not in (32, 64):
            raise ValueError("arrow Time width must be 32/64")
    elif tname == "Duration":
        u_p = fb.field(tpos, 0)
        out["unit"] = fb.i16(u_p) if u_p is not None else 1
    elif tname == "FixedSizeBinary":
        bw_p = fb.field(tpos, 0)
        out["byte_width"] = fb.i32(bw_p) if bw_p is not None else 0
        if out["byte_width"] <= 0:
            raise ValueError("arrow FixedSizeBinary without a width")
    elif tname == "Union":
        # Union table: {0: mode (0=Sparse, 1=Dense), 1: typeIds} —
        # the V5 layout carries no validity bitmap (nulls live in
        # the children); batches ship a types buffer (+ offsets
        # when dense) then the variant child arrays
        m_p = fb.field(tpos, 0) if tpos is not None else None
        out["mode"] = fb.i16(m_p) if m_p is not None else 0
        if out["mode"] not in (0, 1):
            raise ValueError(f"arrow Union mode {out['mode']} invalid")
        tid_p = fb.field(tpos, 1) if tpos is not None else None
        type_ids = None
        if tid_p is not None:
            cnt, base = fb.vector(tid_p)
            type_ids = [fb.i32(base + 4 * k) for k in range(cnt)]
        out["type_ids"] = type_ids
    elif tname in ("Utf8", "Binary", "Bool", "List", "LargeUtf8",
                   "LargeBinary", "LargeList", "Struct_", "Map",
                   "Utf8View", "BinaryView", "ListView",
                   "LargeListView", "RunEndEncoded"):
        # the 1.4 layouts (views, list-views, run-end encoding) carry
        # EMPTY type tables in Schema.fbs — all shape lives in the
        # batch buffers (16-byte view structs + variadic data buffers,
        # offsets+sizes pairs) or the children (run_ends + values)
        pass
    else:
        raise NotImplementedError(
            f"arrow type {tname} not supported")
    ch_p = fb.field(fpos, 5)
    children = []
    if ch_p is not None:
        n, base = fb.vector(ch_p)
        for i in range(n):
            children.append(_parse_field(fb, fb.indirect(base + 4 * i),
                                         depth + 1))
    # dictionary-encoded NESTED value types (dictionary-of-list/
    # struct/map — what pyarrow's DictionaryArray.from_arrays emits
    # for repeated categorical fields) READ fine: the DictionaryBatch
    # delivers the whole nested value tree through the same recursive
    # decode, and batches carry plain index arrays (round 15).  Write
    # stays a typed reject in _init_dict_state (nested values are
    # unhashable in the writer's index map).
    if tname in ("List", "LargeList", "FixedSizeList", "ListView",
                 "LargeListView"):
        if len(children) != 1:
            raise ValueError(f"arrow {tname} field needs one child")
    elif tname == "RunEndEncoded":
        # spec: exactly two children — run_ends (int16/32/64, never
        # null) then values; the parent owns NO buffers of its own
        if len(children) != 2:
            raise ValueError(
                "arrow RunEndEncoded field needs run_ends + values "
                "children")
        re_ch = children[0]
        if re_ch["type"] != "Int" or re_ch.get("bits") not in (16, 32,
                                                               64):
            raise ValueError(
                "arrow run_ends child must be int16/int32/int64")
    elif tname == "Struct_":
        if not children:
            raise ValueError("arrow Struct field needs children")
    elif tname == "Map":
        # spec: Map is List<entries: Struct<key, value>> with the
        # entries struct as the single child
        if len(children) != 1 or                 children[0]["type"] != "Struct_" or                 len(children[0]["children"]) != 2:
            raise ValueError(
                "arrow Map field needs one entries struct of two")
    elif tname == "Union":
        if not children:
            raise ValueError("arrow Union field needs children")
        tids = out.get("type_ids")
        if tids is not None and len(tids) != len(children):
            raise ValueError(
                "arrow Union typeIds count != child count")
    elif children:
        raise NotImplementedError(
            "arrow children on a non-nested type not supported")
    out["children"] = children
    return out


def parse_schema(meta: bytes) -> list[dict]:
    """Schema message flatbuffer -> ordered field specs."""
    fb = _FB(meta)
    msg = fb.root()
    ht_p = fb.field(msg, 1)  # header_type
    if ht_p is None or fb.u8(ht_p) != 1:  # MessageHeader.Schema
        raise ValueError("first arrow message is not a Schema")
    return _parse_schema_table(fb, fb.indirect(fb.field(msg, 2)))


def _parse_schema_table(fb: _FB, sch: int) -> list[dict]:
    """Schema TABLE (the shape shared by the Schema message and the
    File Footer's embedded copy) -> ordered field specs."""
    end_p = fb.field(sch, 0)
    endianness = fb.i16(end_p) if end_p is not None else 0
    if endianness not in (0, 1):
        raise ValueError(f"arrow endianness {endianness} invalid")
    f_p = fb.field(sch, 1)
    fields = []
    if f_p is not None:
        n, base = fb.vector(f_p)
        for i in range(n):
            fields.append(_parse_field(fb, fb.indirect(base + 4 * i)))
    if not fields:
        raise ValueError("arrow schema has no fields")
    if endianness == 1:
        # BIG-endian stream (round 15): the schema declares buffer
        # byte order; mark every node so the width-typed decodes
        # (ints/floats/offsets/decimal words/dictionary indices)
        # unpack big-endian.  Bitmaps and utf8 payloads are
        # order-free per spec.
        def mark(f):
            f["big"] = True
            for ch in f.get("children") or []:
                mark(ch)
        for f in fields:
            mark(f)
    return fields


def message_header_type(meta: bytes) -> int:
    """MessageHeader union tag: 1=Schema, 2=DictionaryBatch,
    3=RecordBatch."""
    fb = _FB(meta)
    ht_p = fb.field(fb.root(), 1)
    return fb.u8(ht_p) if ht_p is not None else 0


def _parse_record_batch(meta: bytes) -> dict:
    fb = _FB(meta)
    msg = fb.root()
    ht_p = fb.field(msg, 1)
    ht = fb.u8(ht_p) if ht_p is not None else 0
    if ht != 3:  # RecordBatch
        raise ValueError(f"unexpected arrow message header {ht}")
    body_p = fb.field(msg, 3)
    body_len = fb.i64(body_p) if body_p is not None else 0
    rb = fb.indirect(fb.field(msg, 2))
    return _rb_table(fb, rb, body_len)


def _parse_dictionary_batch(meta: bytes) -> dict:
    """DictionaryBatch message -> {id, is_delta, rb} where ``rb`` is
    the embedded RecordBatch (one column: the dictionary values)."""
    fb = _FB(meta)
    msg = fb.root()
    ht_p = fb.field(msg, 1)
    if ht_p is None or fb.u8(ht_p) != 2:
        raise ValueError("not an arrow DictionaryBatch message")
    body_p = fb.field(msg, 3)
    body_len = fb.i64(body_p) if body_p is not None else 0
    db = fb.indirect(fb.field(msg, 2))
    id_p = fb.field(db, 0)
    data_p = fb.field(db, 1)
    if data_p is None:
        raise ValueError("arrow DictionaryBatch carries no data")
    delta_p = fb.field(db, 2)
    return {
        "id": fb.i64(id_p) if id_p is not None else 0,
        "is_delta": bool(fb.u8(delta_p)) if delta_p is not None
        else False,
        "rb": _rb_table(fb, fb.indirect(data_p), body_len),
    }


def _rb_table(fb: _FB, rb: int, body_len: int) -> dict:
    len_p = fb.field(rb, 0)
    n_rows = fb.i64(len_p) if len_p is not None else 0
    nodes = []
    n_p = fb.field(rb, 1)
    if n_p is not None:
        cnt, base = fb.vector(n_p)
        for i in range(cnt):  # FieldNode: inline 16-byte struct
            nodes.append((fb.i64(base + 16 * i),
                          fb.i64(base + 16 * i + 8)))
    buffers = []
    b_p = fb.field(rb, 2)
    if b_p is not None:
        cnt, base = fb.vector(b_p)
        for i in range(cnt):  # Buffer: inline 16-byte struct
            buffers.append((fb.i64(base + 16 * i),
                            fb.i64(base + 16 * i + 8)))
    codec = None
    c_p = fb.field(rb, 3)
    if c_p is not None:
        ct = fb.indirect(c_p)
        cc_p = fb.field(ct, 0)
        codec = fb.i8(cc_p) if cc_p is not None else 0
        m_p = fb.field(ct, 1)
        if m_p is not None and fb.i8(m_p) != 0:
            raise NotImplementedError(
                "non-buffer-grain arrow body compression not "
                "supported")
    variadic = []
    v_p = fb.field(rb, 4)
    if v_p is not None:  # variadicBufferCounts: one int64 per
        cnt, base = fb.vector(v_p)  # view-typed field, depth-first
        for i in range(cnt):
            variadic.append(fb.i64(base + 8 * i))
    return {"n_rows": n_rows, "nodes": nodes, "buffers": buffers,
            "codec": codec, "body_len": body_len,
            "variadic": variadic}


def _buffer_bytes(body: bytes, off: int, ln: int,
                  codec: int | None) -> bytes:
    if off < 0 or ln < 0 or off + ln > len(body):
        raise ValueError("arrow buffer overruns the body")
    raw = body[off:off + ln]
    if codec is None or ln == 0:
        return raw
    if ln < 8:
        raise ValueError("compressed arrow buffer shorter than its "
                         "length prefix")
    (unc,) = struct.unpack_from("<q", raw, 0)
    if unc == -1:  # spec: -1 = buffer stored uncompressed
        return raw[8:]
    if unc < 0 or unc > (1 << 31):
        raise ValueError(f"implausible uncompressed length {unc}")
    frame = raw[8:]
    if codec == 0:  # LZ4_FRAME
        from modeltracking_spark.operators.lz4 import (
            lz4_frame_decompress,
        )

        out = lz4_frame_decompress(frame)
    elif codec == 1:  # ZSTD
        from modeltracking_spark.operators.zstd import zstd_decompress

        out = zstd_decompress(frame, max_output=unc)
    else:
        raise NotImplementedError(
            f"arrow body compression codec {codec} not supported")
    if len(out) != unc:
        raise ValueError("arrow buffer decompressed to the wrong "
                         "size")
    return out


def _validity(buf: bytes, n: int, null_count: int) -> list[bool] | None:
    """None = all-valid (never materialized: a corrupt FieldNode can
    declare a huge length, and the buffer-length checks downstream
    must fire before any length-proportional allocation happens)."""
    if null_count == 0 or not buf:
        return None
    if len(buf) * 8 < n:
        raise ValueError("arrow validity bitmap too short")
    return [bool(buf[i >> 3] >> (i & 7) & 1) for i in range(n)]


def _prim_values(field: dict, buf: bytes, n: int) -> list:
    t = field["type"]
    bo = ">" if field.get("big") else "<"
    if t == "Int":
        bits = field["bits"]
        code = {8: "b", 16: "h", 32: "i", 64: "q"}.get(bits)
        if code is None:
            raise NotImplementedError(
                f"arrow int{bits} not supported")
        if not field["signed"]:
            code = code.upper()
        size = bits // 8
        if len(buf) < n * size:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"{bo}{n}{code}", buf, 0))
    if t == "FloatingPoint":
        code = {0: "e", 1: "f", 2: "d"}[field["precision"]]
        size = {0: 2, 1: 4, 2: 8}[field["precision"]]
        if len(buf) < n * size:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"{bo}{n}{code}", buf, 0))
    if t == "Bool":
        if len(buf) * 8 < n:
            raise ValueError("arrow bool buffer too short")
        return [bool(buf[i >> 3] >> (i & 7) & 1) for i in range(n)]
    if t == "Date":
        # unit 0 = DAY (int32 days), 1 = MILLISECOND (int64 millis);
        # both surfaced as raw ints, the shape the queries quantize
        size, code = ((4, "i") if field["unit"] == 0 else (8, "q"))
        if len(buf) < n * size:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"{bo}{n}{code}", buf, 0))
    if t in ("Timestamp", "Duration"):
        if len(buf) < n * 8:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"{bo}{n}q", buf, 0))
    if t == "Time":
        size = field["bits"] // 8
        code = "i" if size == 4 else "q"
        if len(buf) < n * size:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"{bo}{n}{code}", buf, 0))
    if t == "Decimal":
        # two's-complement little-endian words of 16/32 bytes,
        # surfaced as decimal.Decimal at the declared scale
        from decimal import Decimal

        w = field["bits"] // 8
        if len(buf) < n * w:
            raise ValueError("arrow data buffer too short")
        out = []
        sc = field["scale"]
        for i in range(n):
            u = int.from_bytes(buf[i * w:(i + 1) * w],
                               "big" if field.get("big") else "little",
                               signed=True)
            out.append(Decimal(u).scaleb(-sc))
        return out
    if t == "FixedSizeBinary":
        w = field["byte_width"]
        if len(buf) < n * w:
            raise ValueError("arrow data buffer too short")
        return [bytes(buf[i * w:(i + 1) * w]) for i in range(n)]
    raise NotImplementedError(f"arrow type {t} not supported")


def decode_batch(fields: list[dict], meta: bytes, body: bytes,
                 dicts: dict | None = None,
                 project: set | None = None) -> dict:
    """One RecordBatch -> {column: [python values]} following the
    spec's depth-first buffer layout.  ``dicts`` maps dictionary ids
    to already-delivered value lists (from DictionaryBatch messages)
    for dictionary-encoded fields.  ``project`` (round-15 source
    tier) limits decoding to the named top-level columns: the other
    fields' nodes/buffers are structurally SKIPPED — their compressed
    buffers are never decompressed, the column-pruning contract of
    the arrow_ipc DataSource."""
    return _decode_columns(fields, _parse_record_batch(meta), body,
                           dicts or {}, project)


def _collect_dict_fields(fields: list[dict], out: dict) -> dict:
    """id -> field spec for every dictionary-encoded field anywhere in
    the type tree (dictionary leaves nest inside lists/structs/maps)."""
    for f in fields:
        enc = f.get("dictionary")
        if enc is not None:
            # the spec allows id sharing only between fields of the
            # same value type, so the first spec seen is canonical
            out.setdefault(enc["id"], f)
        _collect_dict_fields(f.get("children") or [], out)
    return out


def apply_dictionary_batch(fields: list[dict], meta: bytes,
                           body: bytes, dicts: dict) -> None:
    """Decode one DictionaryBatch and install/extend its values in
    ``dicts`` (replacement unless isDelta, per the spec)."""
    db = _parse_dictionary_batch(meta)
    specs = _collect_dict_fields(fields, {})
    spec = specs.get(db["id"])
    if spec is None:
        raise ValueError(
            f"arrow DictionaryBatch id {db['id']} matches no "
            "dictionary-encoded schema field")
    vfield = dict(spec, dictionary=None)
    # pass the live dict store through: a nested dictionary VALUE tree
    # may itself contain dictionary-encoded leaves whose batches were
    # already delivered (writers emit dictionaries in dependency order)
    cols = _decode_columns([vfield], db["rb"], body, dicts)
    values = cols[vfield["name"]]
    if db["is_delta"] and db["id"] in dicts:
        dicts[db["id"]] = dicts[db["id"]] + values
    else:
        dicts[db["id"]] = values


def _decode_columns(fields: list[dict], rb: dict, body: bytes,
                    dicts: dict, project: set | None = None) -> dict:
    n = rb["n_rows"]
    codec = rb["codec"]
    bi = 0
    ni = 0
    out = {}

    def take_buf():
        nonlocal bi
        if bi >= len(rb["buffers"]):
            raise ValueError("arrow record batch is short of buffers")
        off, ln = rb["buffers"][bi]
        bi += 1
        return _buffer_bytes(body, off, ln, codec)

    def take_node():
        nonlocal ni
        if ni >= len(rb["nodes"]):
            raise ValueError("arrow record batch is short of field "
                             "nodes")
        node = rb["nodes"][ni]
        ni += 1
        return node

    vq = list(rb.get("variadic") or [])
    vqi = 0

    def take_variadic():
        # one entry per view-typed field in depth-first order — the
        # number of data buffers that follow this field's views buffer
        nonlocal vqi
        if vqi >= len(vq):
            raise ValueError(
                "arrow view column without a variadicBufferCounts "
                "entry")
        cnt = vq[vqi]
        vqi += 1
        if cnt < 0 or cnt > len(rb["buffers"]):
            raise ValueError(
                f"implausible arrow variadic buffer count {cnt}")
        return cnt

    def read_array(field, expect):
        """One array (any depth) following the spec's pre-order
        FieldNode walk and depth-first buffer layout: FieldNode +
        validity, then the type's own buffers, then child arrays.
        ``expect`` pins the declared length (None for offset-sliced
        children, whose length only the child node knows)."""
        length, null_count = take_node()
        if length < 0 or null_count < 0:
            # guard BEFORE any length-sized unpack: a corrupt negative
            # FieldNode must reject as the documented ValueError, not
            # surface struct.error from f"<{length}b" (ADVICE r14)
            raise ValueError(
                f"arrow field {field['name']!r} node has negative "
                f"length/null_count ({length}/{null_count})")
        if expect is not None and length != expect:
            raise ValueError(
                f"arrow field {field['name']!r} length {length} != "
                f"{expect}")
        t = field["type"]
        bo = ">" if field.get("big") else "<"
        if t == "Union":
            # V5 layout: NO validity bitmap (nulls live in the
            # children) — a types buffer of int8 tags, plus an int32
            # offsets buffer when dense; then the variant children.
            # Surfaced as {"tag": type_id, "value": v}, the tagged
            # shape the ORC UNION arm uses.
            dense = field["mode"] == 1
            types_b = take_buf()
            if len(types_b) < length:
                raise ValueError("arrow union types buffer too short")
            tags = struct.unpack_from(f"<{length}b", types_b, 0)
            offs = None
            if dense:
                offs_b = take_buf()
                if len(offs_b) < 4 * length:
                    raise ValueError(
                        "arrow union offsets buffer too short")
                offs = struct.unpack_from(f"{bo}{length}i", offs_b, 0)
            kids = [read_array(ch, None if dense else length)
                    for ch in field["children"]]
            tids = field.get("type_ids") or list(range(len(kids)))
            id_map = {tid: k for k, tid in enumerate(tids)}
            vals = []
            for i in range(length):
                ci = id_map.get(tags[i])
                if ci is None:
                    raise ValueError(
                        f"arrow union tag {tags[i]} matches no "
                        "declared typeId")
                j = offs[i] if dense else i
                if j < 0 or j >= len(kids[ci]):
                    raise ValueError(
                        "arrow union offset out of bounds")
                vals.append({"tag": tags[i], "value": kids[ci][j]})
            return vals
        if t == "RunEndEncoded" and not field.get("dictionary"):
            # spec: the parent owns NO buffers (not even validity —
            # nulls live in the values child); children are regular
            # arrays whose lengths only their own FieldNodes know
            ends = read_array(field["children"][0], None)
            rvals = read_array(field["children"][1], None)
            if len(rvals) != len(ends):
                raise ValueError(
                    "arrow run_ends/values children length mismatch")
            prev = 0
            for e in ends:
                if e is None:
                    raise ValueError("null arrow run end")
                if e <= prev:
                    raise ValueError(
                        "arrow run ends not strictly increasing")
                prev = e
            if length > 0 and (not ends or ends[-1] < length):
                raise ValueError(
                    "arrow run ends do not cover the array length")
            vals = []
            ri = 0
            for i in range(length):
                while ends[ri] <= i:
                    ri += 1
                vals.append(rvals[ri])
            return vals
        valid = _validity(take_buf(), length, null_count)
        if field.get("dictionary"):
            # the batch carries only an index array; values came from
            # DictionaryBatch messages (initial + isDelta appends)
            enc = field["dictionary"]
            values = dicts.get(enc["id"])
            if values is None:
                raise ValueError(
                    f"arrow batch uses dictionary {enc['id']} before "
                    "any DictionaryBatch delivered it")
            idx_field = {"name": field["name"], "type": "Int",
                         "bits": enc["bits"], "signed": enc["signed"],
                         "big": field.get("big")}
            raw = _prim_values(idx_field, take_buf(), length)
            vals = []
            for i, ix in enumerate(raw):
                if valid is not None and not valid[i]:
                    vals.append(None)
                    continue
                if ix < 0 or ix >= len(values):
                    raise ValueError(
                        f"arrow dictionary index {ix} outside the "
                        f"{len(values)}-entry dictionary")
                vals.append(values[ix])
            return vals
        if t in ("Utf8", "Binary", "LargeUtf8", "LargeBinary"):
            wide = t.startswith("Large")
            osz, ocode = (8, "q") if wide else (4, "i")
            offs_b = take_buf()
            if len(offs_b) < osz * (length + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"{bo}{length + 1}{ocode}",
                                      offs_b, 0)
            data = take_buf()
            text = t in ("Utf8", "LargeUtf8")
            vals = []
            for i in range(length):
                if valid is not None and not valid[i]:
                    vals.append(None)
                    continue
                s, e = offs[i], offs[i + 1]
                if s < 0 or e < s or e > len(data):
                    raise ValueError("arrow string offsets out of "
                                     "bounds")
                vals.append(data[s:e].decode("utf-8")
                            if text else bytes(data[s:e]))
            return vals
        if t in ("Utf8View", "BinaryView"):
            # 1.4 view layout: a 16-byte view struct per slot —
            # int32 length, then (length <= 12) 12 inline bytes or
            # (4-byte prefix, int32 buffer_index, int32 offset) into
            # one of the batch's VARIADIC data buffers; the count of
            # data buffers comes from RecordBatch.variadicBufferCounts
            views_b = take_buf()
            if len(views_b) < 16 * length:
                raise ValueError("arrow views buffer too short")
            datas = [take_buf() for _ in range(take_variadic())]
            text = t == "Utf8View"
            vals = []
            for i in range(length):
                if valid is not None and not valid[i]:
                    vals.append(None)
                    continue
                (ln,) = struct.unpack_from(f"{bo}i", views_b, 16 * i)
                if ln < 0:
                    raise ValueError("negative arrow view length")
                if ln <= 12:
                    raw = views_b[16 * i + 4:16 * i + 4 + ln]
                else:
                    prefix = views_b[16 * i + 4:16 * i + 8]
                    bix, boff = struct.unpack_from(
                        f"{bo}ii", views_b, 16 * i + 8)
                    if bix < 0 or bix >= len(datas):
                        raise ValueError(
                            "arrow view buffer index out of range")
                    db = datas[bix]
                    if boff < 0 or boff + ln > len(db):
                        raise ValueError(
                            "arrow view offset out of bounds")
                    raw = db[boff:boff + ln]
                    if raw[:4] != prefix:
                        raise ValueError(
                            "arrow view prefix does not match its "
                            "data")
                vals.append(raw.decode("utf-8") if text
                            else bytes(raw))
            return vals
        if t in ("ListView", "LargeListView"):
            # 1.4 list-view layout: SEPARATE offsets and sizes buffers
            # (n entries each, NOT n+1 — slots may overlap or sit out
            # of order; only each slot's own [off, off+size) window
            # need be in the child's bounds)
            osz, ocode = (8, "q") if t == "LargeListView" else (4, "i")
            offs_b = take_buf()
            sizes_b = take_buf()
            if len(offs_b) < osz * length or \
                    len(sizes_b) < osz * length:
                raise ValueError(
                    "arrow list-view offsets/sizes buffer too short")
            offs = struct.unpack_from(f"{bo}{length}{ocode}", offs_b, 0)
            sizes = struct.unpack_from(f"{bo}{length}{ocode}",
                                       sizes_b, 0)
            c_vals = read_array(field["children"][0], None)
            vals = []
            for i in range(length):
                if valid is not None and not valid[i]:
                    vals.append(None)
                    continue
                s, sz = offs[i], sizes[i]
                if s < 0 or sz < 0 or s + sz > len(c_vals):
                    raise ValueError(
                        "arrow list-view window out of bounds")
                vals.append(c_vals[s:s + sz])
            return vals
        if t in ("List", "LargeList"):
            osz, ocode = (8, "q") if t == "LargeList" else (4, "i")
            offs_b = take_buf()
            if len(offs_b) < osz * (length + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"{bo}{length + 1}{ocode}",
                                      offs_b, 0)
            c_vals = read_array(field["children"][0], None)
            vals = []
            for i in range(length):
                if valid is not None and not valid[i]:
                    vals.append(None)
                    continue
                s, e = offs[i], offs[i + 1]
                if s < 0 or e < s or e > len(c_vals):
                    raise ValueError("arrow list offsets out of "
                                     "bounds")
                vals.append(c_vals[s:e])
            return vals
        if t == "FixedSizeList":
            # no offsets buffer: child length is n * list_size, each
            # slot owns its fixed window (spec Fixed-Size List layout)
            k = field["list_size"]
            c_vals = read_array(field["children"][0], length * k)
            return [c_vals[i * k:(i + 1) * k]
                    if valid is None or valid[i] else None
                    for i in range(length)]
        if t == "Struct_":
            # spec Struct layout: the struct carries only a validity
            # bitmap; every child is a FULL-length array with its own
            # validity (unlike ORC's parent-present filtering)
            members = [(ch["name"], read_array(ch, length))
                       for ch in field["children"]]
            return [{mn: mv[i] for mn, mv in members}
                    if valid is None or valid[i] else None
                    for i in range(length)]
        if t == "Map":
            # spec: List<entries: Struct<key, value>> — offsets over
            # the flattened entries; surfaced as (key, value) pairs
            # (pyarrow's own python shape)
            offs_b = take_buf()
            if len(offs_b) < 4 * (length + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"{bo}{length + 1}i", offs_b, 0)
            entries = field["children"][0]
            kn, vn = (ch["name"] for ch in entries["children"])
            e_vals = read_array(entries, None)
            vals = []
            for i in range(length):
                if valid is not None and not valid[i]:
                    vals.append(None)
                    continue
                a, e = offs[i], offs[i + 1]
                if a < 0 or e < a or e > len(e_vals):
                    raise ValueError(
                        "arrow map offsets out of bounds")
                row = []
                for ent in e_vals[a:e]:
                    if ent is None:
                        raise ValueError("null arrow map entry")
                    row.append((ent[kn], ent[vn]))
                vals.append(row)
            return vals
        raw = _prim_values(field, take_buf(), length)
        if valid is None:
            return raw
        return [v if ok else None for v, ok in zip(raw, valid)]

    def skip_buf():
        # advance past one buffer WITHOUT decompressing it — the
        # whole point of decode-side projection
        nonlocal bi
        if bi >= len(rb["buffers"]):
            raise ValueError("arrow record batch is short of buffers")
        bi += 1

    def skip_array(field):
        """Structurally consume one array's nodes/buffers/variadic
        entries without materializing values (mirror of read_array's
        walk order)."""
        length, null_count = take_node()
        if length < 0 or null_count < 0:
            raise ValueError(
                f"arrow field {field['name']!r} node has negative "
                f"length/null_count ({length}/{null_count})")
        t = field["type"]
        if t == "Union":
            skip_buf()  # types
            if field["mode"] == 1:
                skip_buf()  # offsets
            for ch in field["children"]:
                skip_array(ch)
            return
        if t == "RunEndEncoded" and not field.get("dictionary"):
            skip_array(field["children"][0])
            skip_array(field["children"][1])
            return
        skip_buf()  # validity
        if field.get("dictionary"):
            skip_buf()  # indices
            return
        if t in ("Utf8View", "BinaryView"):
            skip_buf()  # views
            for _ in range(take_variadic()):
                skip_buf()
        elif t in ("Utf8", "Binary", "LargeUtf8", "LargeBinary"):
            skip_buf()
            skip_buf()
        elif t in ("List", "LargeList"):
            skip_buf()
            skip_array(field["children"][0])
        elif t in ("ListView", "LargeListView"):
            skip_buf()
            skip_buf()
            skip_array(field["children"][0])
        elif t == "FixedSizeList":
            skip_array(field["children"][0])
        elif t == "Struct_":
            for ch in field["children"]:
                skip_array(ch)
        elif t == "Map":
            skip_buf()
            skip_array(field["children"][0])
        else:
            skip_buf()  # primitive data

    for field in fields:
        if project is None or field["name"] in project:
            out[field["name"]] = read_array(field, n)
        else:
            skip_array(field)
    return out


def ipc_messages(blob: bytes):
    """Walk encapsulated messages of a stream (or the stream section
    of a file): yields (metadata_bytes, body_bytes)."""
    pos = 0
    if blob[:6] == b"ARROW1":  # file format: magic + padding
        pos = 8
    end = len(blob)
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated arrow message preamble")
        (first,) = struct.unpack_from("<I", blob, pos)
        if first == _CONT:
            pos += 4
            if pos + 4 > end:
                raise ValueError("truncated arrow metadata length")
            (mlen,) = struct.unpack_from("<i", blob, pos)
            pos += 4
        else:
            mlen = struct.unpack_from("<i", blob, pos)[0]
            pos += 4
        if mlen == 0:
            return  # end-of-stream marker
        if mlen < 0 or pos + mlen > end:
            raise ValueError("arrow metadata overruns the blob")
        meta = blob[pos:pos + mlen]
        pos += mlen
        fb = _FB(meta)
        msg = fb.root()
        body_p = fb.field(msg, 3)
        body_len = fb.i64(body_p) if body_p is not None else 0
        if body_len < 0 or pos + body_len > end:
            raise ValueError("arrow body overruns the blob")
        body = blob[pos:pos + body_len]
        pos += body_len
        yield meta, body


def arrow_file_footer(fh) -> dict:
    """File-format FOOTER via TAIL reads (round-15 source tier — the
    planning surface of the arrow_ipc DataSource): the file ends with
    ``<Footer flatbuffer> <int32 len> ARROW1``; the Footer carries a
    COPY of the schema plus Block indices (offset, metaDataLength,
    bodyLength) of every DictionaryBatch and RecordBatch message, so
    per-batch partitions plan without touching the stream body.
    Returns {"fields", "dictionaries", "batches"} with 3-tuple
    blocks."""
    import os

    fh.seek(0, os.SEEK_END)
    size = fh.tell()
    if size < 10 + 8:
        raise ValueError("arrow file too short for a footer")
    fh.seek(size - 10)
    tail = fh.read(10)
    if tail[4:] != b"ARROW1":
        raise ValueError("arrow file missing trailing magic")
    (flen,) = struct.unpack_from("<i", tail, 0)
    if flen <= 0 or size - 10 - flen < 8:
        raise ValueError(f"implausible arrow footer length {flen}")
    fh.seek(size - 10 - flen)
    foot = fh.read(flen)
    fb = _FB(foot)
    root = fb.root()
    sch_p = fb.field(root, 1)
    if sch_p is None:
        raise ValueError("arrow footer carries no schema")
    fields = _parse_schema_table(fb, fb.indirect(sch_p))

    def blocks(slot):
        b_p = fb.field(root, slot)
        if b_p is None:
            return []
        cnt, base = fb.vector(b_p)
        out = []
        for i in range(cnt):  # Block: inline 24-byte struct
            off = fb.i64(base + 24 * i)
            mlen = fb.i32(base + 24 * i + 8)
            blen = fb.i64(base + 24 * i + 16)
            if off < 0 or mlen < 0 or blen < 0 or                     off + mlen + blen > size:
                raise ValueError("arrow footer block overruns file")
            out.append((off, mlen, blen))
        return out

    return {"fields": fields, "dictionaries": blocks(2),
            "batches": blocks(3)}


def read_block(fh, block: tuple) -> tuple:
    """One footer Block -> (metadata flatbuffer, body bytes); the
    metadata region is the encapsulated frame (continuation + length
    + padded flatbuffer), the body follows it."""
    off, mlen, blen = block
    fh.seek(off)
    head = fh.read(mlen)
    if len(head) < 8:
        raise ValueError("arrow block shorter than its preamble")
    pos = 0
    (first,) = struct.unpack_from("<I", head, pos)
    if first == _CONT:
        pos += 4
    (ml,) = struct.unpack_from("<i", head, pos)
    pos += 4
    if ml < 0 or pos + ml > len(head):
        raise ValueError("arrow block metadata overruns its frame")
    meta = head[pos:pos + ml]
    body = fh.read(blen)
    if len(body) != blen:
        raise ValueError("arrow block body truncated")
    return meta, body


def ipc_read(blob: bytes) -> dict:
    """Whole stream/file -> {"fields": [...], "columns":
    {name: [values]}, "n_batches": int}."""
    fields = None
    cols: dict = {}
    dicts: dict = {}
    n_batches = 0
    for meta, body in ipc_messages(blob):
        if fields is None:
            fields = parse_schema(meta)
            cols = {f["name"]: [] for f in fields}
            continue
        if message_header_type(meta) == 2:
            apply_dictionary_batch(fields, meta, body, dicts)
            continue
        batch = decode_batch(fields, meta, body, dicts)
        for k, v in batch.items():
            cols[k].extend(v)
        n_batches += 1
    if fields is None:
        raise ValueError("arrow blob carries no schema message")
    return {"fields": fields, "columns": cols, "n_batches": n_batches}


# ---------------------------------------------------------------------------
# Write side (round 13): the mirror of the walker above.  Emits the
# encapsulated-message framing, Schema/RecordBatch flatbuffers via a
# minimal from-spec FlatBuffers BUILDER, optional LZ4_FRAME/ZSTD body
# compression through the repo's own encoders, and the File.fbs
# Footer for the file format.  pyarrow reads every byte this emits
# (tests/test_arrow_ipc.py) — the adversarial direction.
# ---------------------------------------------------------------------------


class _Chunk:
    __slots__ = ("data", "align", "refs", "addr")

    def __init__(self, align: int):
        self.data = bytearray()
        self.align = align
        # (pos_in_chunk, target_chunk, kind, delta); kind "u" stores
        # the forward uoffset target+delta-here, "s" the vtable
        # soffset here-target.
        self.refs: list = []
        self.addr = 0


class _FBBuilder:
    """Minimal from-spec FlatBuffers emitter.  Chunks are created
    leaf-first and laid out in REVERSE creation order, so every
    uoffset reference (always to an earlier-created chunk) lands
    forward, and every scalar keeps absolute alignment (chunk
    alignment >= widest member) — the properties the reference
    verifier checks."""

    _SIZES = {"u8": 1, "i8": 1, "i16": 2, "i32": 4, "i64": 8,
              "ref": 4}
    _FMTS = {"u8": "<B", "i8": "<b", "i16": "<h", "i32": "<i",
             "i64": "<q"}

    def __init__(self):
        self.chunks: list[_Chunk] = []

    def _chunk(self, align: int) -> _Chunk:
        c = _Chunk(align)
        self.chunks.append(c)
        return c

    def string(self, s: str) -> _Chunk:
        c = self._chunk(4)
        raw = s.encode("utf-8")
        c.data += struct.pack("<I", len(raw)) + raw + b"\0"
        return c

    def table(self, slots: list) -> _Chunk:
        """``slots``: (slot_idx, kind, value) triples; ``ref`` values
        are a chunk or a (chunk, delta) pair.  Emits the table chunk
        plus its vtable, wired through the leading soffset."""
        t = self._chunk(8)
        t.data += b"\0\0\0\0"  # soffset to vtable, patched at finish
        offsets: dict[int, int] = {}
        for idx, kind, val in sorted(
                slots, key=lambda s: -self._SIZES[s[1]]):
            sz = self._SIZES[kind]
            while len(t.data) % sz:
                t.data += b"\0"
            offsets[idx] = len(t.data)
            if kind == "ref":
                target, delta = (val if isinstance(val, tuple)
                                 else (val, 0))
                t.refs.append((len(t.data), target, "u", delta))
                t.data += b"\0\0\0\0"
            else:
                t.data += struct.pack(self._FMTS[kind], val)
        n_slots = (max(offsets) + 1) if offsets else 0
        vt = self._chunk(2)
        vt.data += struct.pack("<HH", 4 + 2 * n_slots, len(t.data))
        for i in range(n_slots):
            vt.data += struct.pack("<H", offsets.get(i, 0))
        t.refs.append((0, vt, "s", 0))
        return t

    def vec_refs(self, targets: list[_Chunk]) -> _Chunk:
        c = self._chunk(4)
        c.data += struct.pack("<I", len(targets))
        for t in targets:
            c.refs.append((len(c.data), t, "u", 0))
            c.data += b"\0\0\0\0"
        return c

    def vec_i32(self, ints: list) -> _Chunk:
        """Vector of int32 scalars (count at +0, elements at +4) —
        the Union.typeIds wire shape."""
        c = self._chunk(4)
        c.data += struct.pack("<I", len(ints))
        c.data += struct.pack(f"<{len(ints)}i", *[int(x) for x in ints])
        return c

    def vec_i64(self, ints: list) -> _Chunk:
        """Vector of int64 scalars: 4 leading pad bytes so the count
        sits at +4 and the 8-byte elements at +8 stay 8-aligned —
        the RecordBatch.variadicBufferCounts wire shape.  Reference
        it with delta=4."""
        c = self._chunk(8)
        c.data += b"\0\0\0\0" + struct.pack("<I", len(ints))
        c.data += struct.pack(f"<{len(ints)}q",
                              *[int(x) for x in ints])
        return c

    def vec_structs(self, packed: bytes, n: int) -> _Chunk:
        """Vector of 8-aligned inline structs: 4 leading pad bytes so
        the count sits at +4 and elements at +8.  Reference it with
        delta=4."""
        c = self._chunk(8)
        c.data += b"\0\0\0\0" + struct.pack("<I", n) + packed
        return c

    def finish(self, root: _Chunk) -> bytes:
        pos = 4  # root uoffset
        for c in reversed(self.chunks):
            pos += (-pos) % c.align
            c.addr = pos
            pos += len(c.data)
        buf = bytearray(pos)
        struct.pack_into("<I", buf, 0, root.addr)
        for c in self.chunks:
            buf[c.addr:c.addr + len(c.data)] = c.data
            for off, target, kind, delta in c.refs:
                here = c.addr + off
                if kind == "u":
                    val = target.addr + delta - here
                    if val <= 0:
                        raise ValueError(
                            "flatbuffer uoffset would point backward")
                    struct.pack_into("<I", buf, here, val)
                else:
                    struct.pack_into("<i", buf, here,
                                     here - target.addr)
        return bytes(buf)



#: Schema.fbs Type union tags for emission (inverse of _TYPE_NAMES)
_TYPE_TAGS = {"Int": 2, "FloatingPoint": 3, "Binary": 4, "Utf8": 5,
              "Bool": 6, "Decimal": 7, "Date": 8, "Time": 9,
              "Timestamp": 10, "List": 12, "Struct_": 13, "Union": 14,
              "FixedSizeBinary": 15, "FixedSizeList": 16, "Map": 17,
              "Duration": 18, "LargeBinary": 19, "LargeUtf8": 20,
              "LargeList": 21, "RunEndEncoded": 22, "BinaryView": 23,
              "Utf8View": 24, "ListView": 25, "LargeListView": 26}

_INT_CODES = {8: "b", 16: "h", 32: "i", 64: "q"}


def _freeze(v):
    """Hashable canonical key for a dictionary value of ANY type tree
    (lists/structs/maps nest): the writer's index map needs equality
    that matches the reader's python shapes.  Tagged tuples keep a
    list distinct from a same-content map-entry list."""
    if isinstance(v, list):
        return ("L", tuple(_freeze(x) for x in v))
    if isinstance(v, tuple):
        return ("T", tuple(_freeze(x) for x in v))
    if isinstance(v, dict):
        return ("D", tuple(sorted((k, _freeze(x))
                                  for k, x in v.items())))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _dict_enc_chunk(b: _FBBuilder, f: dict) -> _Chunk:
    """DictionaryEncoding table for a dictionary-encoded field:
    {0: id, 1: indexType (Int), 2: isOrdered}."""
    enc = f["dictionary"]
    bits = enc.get("bits", 32)
    if bits not in (8, 16, 32, 64):
        raise ValueError(
            f"arrow dictionary index width {bits} invalid "
            "(must be 8/16/32/64)")
    ix = b.table([(0, "i32", bits),
                  (1, "u8", 1 if enc.get("signed", True) else 0)])
    return b.table([(0, "i64", int(enc.get("id") or 0)),
                    (1, "ref", ix)])


def _field_chunk(b: _FBBuilder, f: dict, depth: int = 0) -> _Chunk:
    if depth > _MAX_DEPTH:
        raise NotImplementedError(
            f"arrow nesting deeper than {_MAX_DEPTH} levels write "
            "not supported")
    t = f["type"]
    name = b.string(f.get("name", ""))
    children = None
    if t == "Int":
        tc = b.table([(0, "i32", f["bits"]),
                      (1, "u8", 1 if f.get("signed", True) else 0)])
    elif t == "FloatingPoint":
        pr = f.get("precision", 2)
        if pr not in (0, 1, 2):  # HALF / SINGLE / DOUBLE
            raise ValueError(f"arrow float precision {pr} invalid")
        tc = b.table([(0, "i16", pr)])
    elif t == "Date":
        unit = f.get("unit", 0)
        if unit not in (0, 1):  # DAY (date32) / MILLISECOND (date64)
            raise ValueError(f"arrow Date unit {unit} invalid")
        tc = b.table([(0, "i16", unit)])
    elif t == "Timestamp":
        tc = b.table([(0, "i16", f.get("unit", 2))])
    elif t == "Duration":
        tc = b.table([(0, "i16", f.get("unit", 1))])
    elif t == "Time":
        bits = f.get("bits", 32)
        if bits not in (32, 64):
            raise ValueError("arrow Time width must be 32/64")
        tc = b.table([(0, "i16", f.get("unit", 1)),
                      (1, "i32", bits)])
    elif t == "Decimal":
        bits = f.get("bits", 128)
        if bits not in (128, 256):
            raise ValueError("arrow Decimal width must be 128/256")
        tc = b.table([(0, "i32", f.get("precision", 38)),
                      (1, "i32", f.get("scale", 0)),
                      (2, "i32", bits)])
    elif t == "FixedSizeBinary":
        w = int(f.get("byte_width") or 0)
        if w <= 0:
            raise ValueError("arrow FixedSizeBinary write needs "
                             "byte_width")
        tc = b.table([(0, "i32", w)])
    elif t in ("Utf8", "Binary", "LargeUtf8", "LargeBinary", "Bool",
               "Utf8View", "BinaryView"):
        tc = b.table([])
    elif t in ("ListView", "LargeListView"):
        if len(f.get("children") or []) != 1:
            raise ValueError(f"arrow {t} field needs one child")
        tc = b.table([])
        children = b.vec_refs([_field_chunk(b, f["children"][0],
                                            depth + 1)])
    elif t == "RunEndEncoded":
        ch = f.get("children") or []
        if len(ch) != 2:
            raise ValueError(
                "arrow RunEndEncoded field needs run_ends + values "
                "children")
        if ch[0]["type"] != "Int" or \
                ch[0].get("bits", 32) not in (16, 32, 64):
            raise ValueError(
                "arrow run_ends child must be int16/int32/int64")
        tc = b.table([])
        children = b.vec_refs([_field_chunk(b, c, depth + 1)
                               for c in ch])
    elif t in ("List", "LargeList", "FixedSizeList"):
        if len(f.get("children") or []) != 1:
            raise ValueError(f"arrow {t} field needs one child")
        if t == "FixedSizeList":
            k = int(f.get("list_size") or 0)
            if k <= 0:
                raise ValueError(
                    "arrow FixedSizeList write needs list_size")
            tc = b.table([(0, "i32", k)])
        else:
            tc = b.table([])
        children = b.vec_refs([_field_chunk(b, f["children"][0],
                                            depth + 1)])
    elif t == "Struct_":
        if not f.get("children"):
            raise ValueError("arrow Struct field needs children")
        tc = b.table([])
        children = b.vec_refs([_field_chunk(b, ch, depth + 1)
                               for ch in f["children"]])
    elif t == "Map":
        ch = f.get("children") or []
        if len(ch) != 1 or ch[0]["type"] != "Struct_" or \
                len(ch[0].get("children") or []) != 2:
            raise ValueError(
                "arrow Map field needs one entries struct of two")
        tc = b.table([(0, "u8", 0)])  # keysSorted = false
        children = b.vec_refs([_field_chunk(b, ch[0], depth + 1)])
    elif t == "Union":
        # Union table {0: mode (0=Sparse, 1=Dense), 1: typeIds} —
        # the mirror of the _parse_field Union arm; declared typeIds
        # are emitted verbatim so roundtrips preserve sparse id maps
        ch = f.get("children") or []
        if not ch:
            raise ValueError("arrow Union field needs children")
        mode = f.get("mode", 0)
        if mode not in (0, 1):
            raise ValueError(f"arrow Union mode {mode} invalid")
        tids = f.get("type_ids")
        if tids is not None and len(tids) != len(ch):
            raise ValueError("arrow Union typeIds count != child count")
        slots2 = [(0, "i16", mode)]
        if tids is not None:
            slots2.append((1, "ref", b.vec_i32(tids)))
        tc = b.table(slots2)
        children = b.vec_refs([_field_chunk(b, c, depth + 1)
                               for c in ch])
    else:
        raise NotImplementedError(f"arrow type {t} write not supported")
    slots = [(0, "ref", name),
             (1, "u8", 1 if f.get("nullable", True) else 0),
             (2, "u8", _TYPE_TAGS[t]),
             (3, "ref", tc)]
    if f.get("dictionary"):
        slots.append((4, "ref", _dict_enc_chunk(b, f)))
    if children is not None:
        slots.append((5, "ref", children))
    return b.table(slots)


def _schema_chunk(b: _FBBuilder, fields: list[dict]) -> _Chunk:
    fcs = [_field_chunk(b, f) for f in fields]
    slots = []
    if any(f.get("big") for f in fields):
        slots.append((0, "i16", 1))  # Endianness.Big
    slots.append((1, "ref", b.vec_refs(fcs)))
    return b.table(slots)


def _schema_meta(fields: list[dict]) -> bytes:
    b = _FBBuilder()
    schema = _schema_chunk(b, fields)
    msg = b.table([(0, "i16", 4),  # MetadataVersion V5
                   (1, "u8", 1),   # MessageHeader.Schema
                   (2, "ref", schema),
                   (3, "i64", 0)])
    return b.finish(msg)


def _rb_chunk(b: _FBBuilder, n_rows: int, nodes: list, buffers: list,
              codec: int | None,
              variadic: list | None = None) -> _Chunk:
    nvec = b.vec_structs(
        b"".join(struct.pack("<qq", ln, nc) for ln, nc in nodes),
        len(nodes))
    bvec = b.vec_structs(
        b"".join(struct.pack("<qq", off, ln) for off, ln in buffers),
        len(buffers))
    slots = [(0, "i64", n_rows), (1, "ref", (nvec, 4)),
             (2, "ref", (bvec, 4))]
    if codec is not None:
        slots.append((3, "ref", b.table([(0, "i8", codec)])))
    if variadic:
        # one int64 per view-typed field, depth-first (empty when the
        # schema has no view columns — the slot is then omitted)
        slots.append((4, "ref", (b.vec_i64(variadic), 4)))
    return b.table(slots)


def _batch_meta(n_rows: int, nodes: list, buffers: list,
                codec: int | None, body_len: int,
                variadic: list | None = None) -> bytes:
    b = _FBBuilder()
    rb = _rb_chunk(b, n_rows, nodes, buffers, codec, variadic)
    msg = b.table([(0, "i16", 4),
                   (1, "u8", 3),  # MessageHeader.RecordBatch
                   (2, "ref", rb),
                   (3, "i64", body_len)])
    return b.finish(msg)


def _dict_batch_meta(dict_id: int, is_delta: bool, n_rows: int,
                     nodes: list, buffers: list, codec: int | None,
                     body_len: int,
                     variadic: list | None = None) -> bytes:
    """DictionaryBatch message: {0: id, 1: data (RecordBatch),
    2: isDelta} under MessageHeader tag 2."""
    b = _FBBuilder()
    rb = _rb_chunk(b, n_rows, nodes, buffers, codec, variadic)
    slots = [(0, "i64", dict_id), (1, "ref", rb)]
    if is_delta:
        slots.append((2, "u8", 1))
    db = b.table(slots)
    msg = b.table([(0, "i16", 4),
                   (1, "u8", 2),  # MessageHeader.DictionaryBatch
                   (2, "ref", db),
                   (3, "i64", body_len)])
    return b.finish(msg)


def _enc_validity(vals: list) -> tuple[bytes, int]:
    nc = sum(1 for v in vals if v is None)
    if nc == 0:
        return b"", 0
    bm = bytearray((len(vals) + 7) // 8)
    for i, v in enumerate(vals):
        if v is not None:
            bm[i >> 3] |= 1 << (i & 7)
    return bytes(bm), nc


def _enc_prim(field: dict, vals: list) -> bytes:
    t = field["type"]
    bo = ">" if field.get("big") else "<"
    filled = [0 if v is None else v for v in vals]
    if t == "Int":
        code = _INT_CODES.get(field["bits"])
        if code is None:
            raise NotImplementedError(
                f"arrow int{field['bits']} write not supported")
        if not field.get("signed", True):
            code = code.upper()
        return struct.pack(f"{bo}{len(vals)}{code}", *filled)
    if t == "FloatingPoint":
        code = {0: "e", 1: "f", 2: "d"}[field.get("precision", 2)]
        return struct.pack(f"{bo}{len(vals)}{code}",
                           *[float(v) for v in filled])
    if t == "Bool":
        bm = bytearray((len(vals) + 7) // 8)
        for i, v in enumerate(vals):
            if v:
                bm[i >> 3] |= 1 << (i & 7)
        return bytes(bm)
    if t == "Date":
        code = "i" if field.get("unit", 0) == 0 else "q"
        return struct.pack(f"{bo}{len(vals)}{code}", *filled)
    if t in ("Timestamp", "Duration"):
        return struct.pack(f"{bo}{len(vals)}q", *filled)
    if t == "Time":
        code = "i" if field.get("bits", 32) == 32 else "q"
        return struct.pack(f"{bo}{len(vals)}{code}", *filled)
    if t == "Decimal":
        from decimal import Decimal

        w = field.get("bits", 128) // 8
        sc = field.get("scale", 0)
        out = bytearray()
        for v in vals:
            if v is None:
                out += b"\0" * w
                continue
            m = Decimal(v).scaleb(sc)
            if m != m.to_integral_value():
                raise ValueError(
                    f"decimal value {v} does not fit scale {sc}")
            try:
                out += int(m).to_bytes(
                    w, "big" if field.get("big") else "little",
                    signed=True)
            except OverflowError:
                raise ValueError(
                    f"decimal value {v} overflows {w * 8}-bit "
                    "storage") from None
        return bytes(out)
    if t == "FixedSizeBinary":
        w = field["byte_width"]
        out = bytearray()
        for v in vals:
            if v is None:
                out += b"\0" * w
                continue
            bv = bytes(v)
            if len(bv) != w:
                raise ValueError(
                    f"FixedSizeBinary value of length {len(bv)} != "
                    f"{w}")
            out += bv
        return bytes(out)
    raise NotImplementedError(f"arrow type {t} write not supported")


def _enc_offsets(lengths: list[int], wide: bool = False,
                 big: bool = False) -> bytes:
    offs = [0]
    for ln in lengths:
        offs.append(offs[-1] + ln)
    if not wide and offs[-1] > (1 << 31) - 1:
        raise ValueError(
            "arrow 32-bit offsets overflow (use the Large variant)")
    return struct.pack(
        f"{'>' if big else '<'}{len(offs)}{'q' if wide else 'i'}",
        *offs)


def _enc_array(field: dict, vals: list, dstate: dict,
               variadic: list | None = None,
               depth: int = 0) -> tuple[list, list]:
    """One array (any depth) -> (field_nodes, raw_buffers), pre-order
    nodes and depth-first buffers, the exact mirror of ``read_array``.
    Dictionary-encoded leaves index into ``dstate`` (shared across
    batches so later chunks extend, never rebuild, the dictionary)."""
    if depth > _MAX_DEPTH:
        raise NotImplementedError(
            f"arrow nesting deeper than {_MAX_DEPTH} levels write "
            "not supported")
    t = field["type"]
    if t == "Union":
        # V5 union layout: NO validity bitmap (node null_count 0) —
        # an int8 types buffer (+ int32 offsets when dense), then the
        # variant children; nulls live inside the selected child.
        # Exact mirror of the read_array Union arm.
        children = field.get("children") or []
        if not children:
            raise ValueError("arrow Union field needs children")
        tids = field.get("type_ids") or list(range(len(children)))
        if len(tids) != len(children):
            raise ValueError("arrow Union typeIds count != child count")
        id_map = {tid: k for k, tid in enumerate(tids)}
        tags = []
        for v in vals:
            if not isinstance(v, dict) or "tag" not in v:
                raise ValueError(
                    "arrow union value must be a {'tag', 'value'} "
                    "mapping (a null slot is tag + value None)")
            if v["tag"] not in id_map:
                raise ValueError(
                    f"arrow union tag {v['tag']} matches no declared "
                    "typeId")
            tags.append(v["tag"])
        nodes = [(len(vals), 0)]
        bufs = [struct.pack(f"<{len(tags)}b", *tags)]
        if field.get("mode", 0) == 1:  # dense: per-child compaction
            offs = []
            members = [[] for _ in children]
            for v in vals:
                ci = id_map[v["tag"]]
                offs.append(len(members[ci]))
                members[ci].append(v.get("value"))
            bufs.append(struct.pack(
                f"{'>' if field.get('big') else '<'}{len(offs)}i",
                *offs))
        else:  # sparse: full-length children, null off-tag slots
            members = [
                [v.get("value") if id_map[v["tag"]] == k else None
                 for v in vals]
                for k in range(len(children))
            ]
        for ch, member in zip(children, members):
            cn, cb = _enc_array(ch, member, dstate, variadic,
                                depth + 1)
            nodes.extend(cn)
            bufs.extend(cb)
        return nodes, bufs
    if t == "RunEndEncoded":
        # run-length compress the logical values: the parent owns NO
        # buffers (node null_count 0 — nulls ride the values child);
        # children are regular run_ends + values arrays
        ch = field.get("children") or []
        if len(ch) != 2:
            raise ValueError(
                "arrow RunEndEncoded field needs run_ends + values "
                "children")
        re_f, val_f = ch
        re_bits = re_f.get("bits", 32)
        if re_f["type"] != "Int" or re_bits not in (16, 32, 64):
            raise ValueError(
                "arrow run_ends child must be int16/int32/int64")
        ends: list = []
        rvals: list = []
        prev_key = object()
        for i, v in enumerate(vals):
            key = _freeze(v)
            if rvals and key == prev_key:
                ends[-1] = i + 1
            else:
                rvals.append(v)
                ends.append(i + 1)
                prev_key = key
        if ends and ends[-1] > (1 << (re_bits - 1)) - 1:
            raise ValueError(
                f"arrow run end {ends[-1]} overflows the declared "
                f"int{re_bits} run_ends type")
        nodes = [(len(vals), 0)]
        bufs = []
        cn, cb = _enc_array(re_f, ends, dstate, variadic, depth + 1)
        nodes.extend(cn)
        bufs.extend(cb)
        cn, cb = _enc_array(val_f, rvals, dstate, variadic, depth + 1)
        nodes.extend(cn)
        bufs.extend(cb)
        return nodes, bufs
    vb, nc = _enc_validity(vals)
    nodes = [(len(vals), nc)]
    bufs = [vb]
    if field.get("dictionary"):
        enc = field["dictionary"]
        st = dstate[enc["id"]]
        cap = (1 << (st["bits"] - 1)) - 1 if st["signed"] \
            else (1 << st["bits"]) - 1
        idx = []
        for v in vals:
            if v is None:
                # index 0 under a null slot even when the dictionary
                # is still empty — byte-identical to what pyarrow
                # itself emits for an all-null first chunk (measured:
                # empty initial DictionaryBatch + zero indices), so
                # any reader that accepts the reference writer
                # accepts this (ADVICE r14 adjudication)
                idx.append(0)
                continue
            key = _freeze(v)  # nested value trees index canonically
            i = st["index"].get(key)
            if i is None:
                i = len(st["values"])
                if i > cap:
                    raise ValueError(
                        f"arrow dictionary {enc['id']} overflows "
                        f"int{st['bits']} indices at "
                        f"{len(st['values'])} distinct values")
                st["index"][key] = i
                st["values"].append(v)
                st["new"].append(v)
            idx.append(i)
        code = _INT_CODES[st["bits"]]
        if not st["signed"]:
            code = code.upper()
        bufs.append(struct.pack(
            f"{'>' if field.get('big') else '<'}{len(idx)}{code}",
            *idx))
        return nodes, bufs
    if t in ("Utf8", "Binary", "LargeUtf8", "LargeBinary"):
        text = t in ("Utf8", "LargeUtf8")
        payloads = [b"" if v is None else
                    (v.encode("utf-8") if text else bytes(v))
                    for v in vals]
        bufs.append(_enc_offsets([len(p) for p in payloads],
                                 wide=t.startswith("Large"),
                                 big=bool(field.get("big"))))
        bufs.append(b"".join(payloads))
    elif t in ("Utf8View", "BinaryView"):
        # 1.4 view layout: 16-byte view structs (inline <= 12 bytes,
        # else prefix + buffer_index + offset into ONE variadic data
        # buffer); the per-field data-buffer count lands in
        # RecordBatch.variadicBufferCounts via ``variadic``
        if variadic is None:
            raise ValueError(
                "arrow view write outside a record batch context")
        text = t == "Utf8View"
        bo = ">" if field.get("big") else "<"
        views = bytearray()
        data = bytearray()
        for v in vals:
            if v is None:
                views += b"\0" * 16
                continue
            p = v.encode("utf-8") if text else bytes(v)
            if len(p) <= 12:
                views += struct.pack(f"{bo}i", len(p)) + p
                views += b"\0" * (12 - len(p))
            else:
                views += struct.pack(f"{bo}i", len(p)) + p[:4]
                views += struct.pack(f"{bo}ii", 0, len(data))
                data += p
        bufs.append(bytes(views))
        if data:
            variadic.append(1)
            bufs.append(bytes(data))
        else:  # all-inline chunk: zero data buffers, like pyarrow
            variadic.append(0)
    elif t in ("ListView", "LargeListView"):
        # 1.4 list-view layout: separate offsets + sizes buffers (n
        # entries each); this writer emits dense in-order windows
        if len(field.get("children") or []) != 1:
            raise ValueError(f"arrow {t} field needs one child")
        child = field["children"][0]
        wide = t == "LargeListView"
        flat: list = []
        offs = []
        sizes = []
        for v in vals:
            if v is None:
                offs.append(0)
                sizes.append(0)
            else:
                offs.append(len(flat))
                sizes.append(len(v))
                flat.extend(v)
        bo = ">" if field.get("big") else "<"
        code = "q" if wide else "i"
        bufs.append(struct.pack(f"{bo}{len(offs)}{code}", *offs))
        bufs.append(struct.pack(f"{bo}{len(sizes)}{code}", *sizes))
        cn, cb = _enc_array(child, flat, dstate, variadic,
                            depth + 1)
        nodes.extend(cn)
        bufs.extend(cb)
    elif t in ("List", "LargeList"):
        if len(field.get("children") or []) != 1:
            raise ValueError(f"arrow {t} field needs one child")
        child = field["children"][0]
        flat: list = []
        lens = []
        for v in vals:
            if v is None:
                lens.append(0)
            else:
                flat.extend(v)
                lens.append(len(v))
        bufs.append(_enc_offsets(lens, wide=(t == "LargeList"),
                                 big=bool(field.get("big"))))
        cn, cb = _enc_array(child, flat, dstate, variadic,
                            depth + 1)
        nodes.extend(cn)
        bufs.extend(cb)
    elif t == "FixedSizeList":
        if len(field.get("children") or []) != 1:
            raise ValueError(f"arrow {t} field needs one child")
        child = field["children"][0]
        k = int(field.get("list_size") or 0)
        if k <= 0:
            raise ValueError(
                "arrow FixedSizeList write needs list_size")
        flat = []
        for v in vals:
            if v is None:
                flat.extend([None] * k)
            elif len(v) != k:
                raise ValueError(
                    f"FixedSizeList value of length {len(v)} != {k}")
            else:
                flat.extend(v)
        cn, cb = _enc_array(child, flat, dstate, variadic,
                            depth + 1)
        nodes.extend(cn)
        bufs.extend(cb)
    elif t == "Struct_":
        # children are FULL-length arrays; a null struct slot
        # contributes a null member in every child
        if not field.get("children"):
            raise ValueError("arrow Struct field needs children")
        for ch in field["children"]:
            member = []
            for v in vals:
                if v is None:
                    member.append(None)
                elif isinstance(v, dict):
                    member.append(v.get(ch["name"]))
                else:
                    raise ValueError(
                        "arrow struct value must be a mapping")
            cn, cb = _enc_array(ch, member, dstate, variadic,
                                depth + 1)
            nodes.extend(cn)
            bufs.extend(cb)
    elif t == "Map":
        ch0 = field.get("children") or []
        if len(ch0) != 1 or ch0[0]["type"] != "Struct_" or \
                len(ch0[0].get("children") or []) != 2:
            raise ValueError(
                "arrow Map field needs one entries struct of two")
        entries = field["children"][0]
        kn, vn = (ch["name"] for ch in entries["children"])
        flat = []
        lens = []
        for v in vals:
            if v is None:
                lens.append(0)
                continue
            items = v.items() if isinstance(v, dict) else v
            cnt = 0
            for k, mv in items:
                flat.append({kn: k, vn: mv})
                cnt += 1
            lens.append(cnt)
        bufs.append(_enc_offsets(lens, big=bool(field.get("big"))))
        cn, cb = _enc_array(entries, flat, dstate, variadic,
                            depth + 1)
        nodes.extend(cn)
        bufs.extend(cb)
    else:
        bufs.append(_enc_prim(field, vals))
    return nodes, bufs


def _assemble_body(raw: list, codec: int | None) -> tuple[bytes, list]:
    """Raw buffers -> (8-aligned body, Buffer (offset, length) list),
    compressing each buffer per the spec's int64-prefix framing."""
    body = bytearray()
    bufmeta = []
    for b0 in raw:
        if codec is not None and b0:
            if codec == 0:
                from modeltracking_spark.operators.lz4 import (
                    lz4_frame_compress,
                )

                frame = lz4_frame_compress(bytes(b0))
            else:
                from modeltracking_spark.operators.zstd import (
                    zstd_compress,
                )

                frame = zstd_compress(bytes(b0))
            if len(frame) + 8 < len(b0):
                stored = struct.pack("<q", len(b0)) + frame
            else:  # spec: -1 prefix = stored uncompressed
                stored = struct.pack("<q", -1) + b0
        else:
            stored = b0
        while len(body) % 8:
            body += b"\0"
        bufmeta.append((len(body), len(stored)))
        body += stored
    while len(body) % 8:
        body += b"\0"
    return bytes(body), bufmeta


def _frame(meta: bytes, body: bytes) -> bytes:
    pad = (-len(meta)) % 8
    return (struct.pack("<Ii", _CONT, len(meta) + pad) + meta
            + b"\0" * pad + body)


def _frame_meta_len(meta: bytes) -> int:
    """Total on-wire metadata length of a frame (the Block.metaDataLength
    convention: continuation + length word + padded flatbuffer)."""
    return 8 + len(meta) + ((-len(meta)) % 8)


def _footer_fb(fields: list[dict], dict_blocks: list,
               blocks: list) -> bytes:
    """File.fbs Footer: {0: version, 1: schema, 2: dictionaries,
    3: recordBatches} with 24-byte inline Block structs."""
    b = _FBBuilder()
    schema = _schema_chunk(b, fields)
    slots = [(0, "i16", 4), (1, "ref", schema)]
    if dict_blocks:
        packed = b"".join(struct.pack("<qi4xq", off, mlen, blen)
                          for off, mlen, blen in dict_blocks)
        slots.append((2, "ref", (b.vec_structs(packed,
                                               len(dict_blocks)), 4)))
    packed = b"".join(struct.pack("<qi4xq", off, mlen, blen)
                      for off, mlen, blen in blocks)
    slots.append((3, "ref", (b.vec_structs(packed, len(blocks)), 4)))
    footer = b.table(slots)
    return b.finish(footer)


def _init_dict_state(fields: list[dict], dstate: dict) -> None:
    """Walk the (deep-copied) field tree: validate dictionary specs,
    auto-assign missing ids, and open one shared index/values state per
    id (id sharing across fields is legal for identical value types)."""
    def walk(f):
        enc = f.get("dictionary")
        if enc is not None:
            if f["type"] == "Union":
                raise NotImplementedError(
                    "dictionary-encoded arrow Union value types not "
                    "supported (no writer emits them)")
            bits = enc.setdefault("bits", 32)
            signed = enc.setdefault("signed", True)
            if bits not in (8, 16, 32, 64):
                raise ValueError(
                    f"arrow dictionary index width {bits} invalid "
                    "(must be 8/16/32/64)")
            if enc.get("id") is None:
                nid = 0
                while nid in dstate:
                    nid += 1
                enc["id"] = nid
            did = enc["id"]
            st = dstate.get(did)
            if st is None:
                dstate[did] = {
                    "bits": bits, "signed": signed,
                    "index": {}, "values": [], "new": [],
                    "emitted": False,
                    "vfield": dict(f, dictionary=None, nullable=False),
                }
            elif st["bits"] != bits or st["signed"] != signed:
                raise ValueError(
                    f"arrow dictionary id {did} reused with a "
                    "different index type")
        for ch in f.get("children") or []:
            walk(ch)
    for f in fields:
        walk(f)


def _enc_dict_frames(dstate: dict, codec: int | None, *,
                     consolidated: bool = False) -> list:
    """Pending DictionaryBatch frames for the current write position.

    Stream mode emits the INITIAL dictionary (possibly empty — readers
    need delivery before the first referencing batch) once per id, then
    isDelta appends of only the new values; ``consolidated`` (file
    mode) emits one full non-delta batch per id, since the File format
    forbids replacements/deltas."""
    frames = []
    for did in sorted(dstate):
        st = dstate[did]
        if consolidated:
            vals, is_delta = st["values"], False
        elif not st["emitted"]:
            vals, is_delta = list(st["new"]), False
        elif st["new"]:
            vals, is_delta = list(st["new"]), True
        else:
            continue
        st["new"] = []
        st["emitted"] = True
        vdic: list = []
        nodes, raw = _enc_array(st["vfield"], vals, {}, vdic)
        body, bufmeta = _assemble_body(raw, codec)
        meta = _dict_batch_meta(did, is_delta, len(vals), nodes,
                                bufmeta, codec, len(body), vdic)
        frames.append((meta, body))
    return frames


def ipc_write(fields: list[dict], columns: dict, *,
              fmt: str = "stream", compression: str | None = None,
              max_chunksize: int = 4096,
              endianness: str = "little") -> bytes:
    """Columns -> Arrow IPC bytes.  ``fields`` uses the same spec
    dicts ``parse_schema`` emits ({name, type, nullable, bits/signed/
    precision/unit/scale/byte_width/list_size, children, dictionary});
    ``columns`` maps name -> python list in the shapes ``ipc_read``
    yields (lists, member dicts, (key, value) pairs).  ``fmt``:
    "stream" or "file"; ``compression``: None | "lz4" | "zstd" (the
    repo's own encoders).  Dictionary-encoded fields carry
    ``dictionary={"id": n, "bits": 8/16/32/64, "signed": bool}`` (id
    auto-assigned when omitted); streams emit initial + isDelta
    DictionaryBatches as new values appear per chunk, files emit one
    consolidated dictionary per id before the batches (the File spec
    forbids deltas)."""
    import copy

    if fmt not in ("stream", "file"):
        raise ValueError(f"unknown arrow ipc format {fmt!r}")
    if endianness not in ("little", "big"):
        raise ValueError(f"unknown arrow endianness {endianness!r}")
    if compression not in (None, "lz4", "zstd"):
        raise NotImplementedError(
            f"arrow body compression {compression!r} not supported")
    if not fields:
        raise ValueError("arrow schema needs at least one field")
    if max_chunksize < 1:
        raise ValueError("max_chunksize must be positive")
    fields = copy.deepcopy(fields)
    if endianness == "big":
        # round 15: emit a BIG-endian stream — the schema declares it
        # (Endianness.Big) and every width-typed buffer packs ">"
        def _mark(f):
            f["big"] = True
            for ch in f.get("children") or []:
                _mark(ch)
        for f in fields:
            _mark(f)
    lens = {f["name"]: len(columns[f["name"]]) for f in fields}
    if len(set(lens.values())) > 1:
        raise ValueError(f"ragged arrow columns: {lens}")
    n = next(iter(lens.values()))
    codec = {None: None, "lz4": 0, "zstd": 1}[compression]
    dstate: dict = {}
    _init_dict_state(fields, dstate)

    # encode every chunk first: dstate accumulates the dictionaries,
    # and stream mode interleaves the per-chunk delta frames in order
    chunks = []
    for lo in range(0, n, max_chunksize):
        hi = min(lo + max_chunksize, n)
        nodes: list = []
        raw: list = []
        vdic: list = []
        for f in fields:
            cn, cb = _enc_array(f, columns[f["name"]][lo:hi], dstate,
                                vdic)
            nodes.extend(cn)
            raw.extend(cb)
        body, bufmeta = _assemble_body(raw, codec)
        meta = _batch_meta(hi - lo, nodes, bufmeta, codec, len(body),
                           vdic)
        if fmt == "stream":
            dframes = _enc_dict_frames(dstate, codec)
        else:
            dframes = []
        chunks.append((dframes, meta, body))

    out = bytearray()
    if fmt == "file":
        out += b"ARROW1\0\0"
    out += _frame(_schema_meta(fields), b"")
    dict_blocks = []
    blocks = []
    if fmt == "file" and dstate:
        for meta, body in _enc_dict_frames(dstate, codec,
                                           consolidated=True):
            dict_blocks.append((len(out), _frame_meta_len(meta),
                                len(body)))
            out += _frame(meta, body)
    for dframes, meta, body in chunks:
        for dmeta, dbody in dframes:
            out += _frame(dmeta, dbody)
        blocks.append((len(out), _frame_meta_len(meta), len(body)))
        out += _frame(meta, body)
    out += struct.pack("<Ii", _CONT, 0)  # end-of-stream marker
    if fmt == "file":
        footer = _footer_fb(fields, dict_blocks, blocks)
        out += footer + struct.pack("<i", len(footer)) + b"ARROW1"
    return bytes(out)
