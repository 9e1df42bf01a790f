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

Scope: flat primitive columns (ints at all widths, float16/32/64,
bool, utf8/binary and their Large 64-bit-offset variants, date32,
timestamp, decimal128/256, time32/64, duration, fixed-size binary) plus one list level of fixed-width primitives in all
three layouts — List, LargeList and FixedSizeList (the canonical
arrow embedding shape; no offsets buffer, child length = n*k) — one
STRUCT level of flat members (full-length children with their own
validity, per the spec's Struct layout), and MAP columns
(List<entries: Struct<key, value>> with flat key/value, surfaced as
(key, value) pairs);
dictionary-encoded columns of flat value types are READ (write side
re-expands them); deeper nesting and big-endian streams are typed
loud rejects.  The writer emits the flat + List + FixedSizeList
scope.
Validation: pyarrow (the reference implementation) WRITES every read
fixture and READS every written stream/file in
tests/test_arrow_ipc.py — adversarial in both directions.
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
    21: "LargeList",
}


def _parse_field(fb: _FB, fpos: int) -> dict:
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
            bits = fb.i32(bw_p) if bw_p is not None else 32
            signed = bool(fb.u8(sg_p)) if sg_p is not None else False
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
    elif tname in ("Utf8", "Binary", "Bool", "List", "LargeUtf8",
                   "LargeBinary", "LargeList", "Struct_", "Map"):
        pass
    else:
        raise NotImplementedError(
            f"arrow type {tname} not supported")
    ch_p = fb.field(fpos, 5)
    children = []
    if ch_p is not None:
        n, base = fb.vector(ch_p)
        for i in range(n):
            children.append(_parse_field(fb, fb.indirect(base + 4 * i)))
    if tname in ("List", "LargeList", "FixedSizeList"):
        if dict_enc is not None:
            raise NotImplementedError(
                "dictionary-encoded arrow list columns not supported")
        if len(children) != 1:
            raise ValueError(f"arrow {tname} field needs one child")
        if children[0]["type"] in ("List", "LargeList",
                                   "FixedSizeList", "Struct_",
                                   "Utf8", "Binary", "LargeUtf8",
                                   "LargeBinary"):
            raise NotImplementedError(
                "nested arrow list element types not supported "
                "(one LIST level of fixed-width primitives is)")
    elif tname == "Struct_":
        if dict_enc is not None:
            raise NotImplementedError(
                "dictionary-encoded arrow struct columns not "
                "supported")
        if not children:
            raise ValueError("arrow Struct field needs children")
        for ch in children:
            if ch["type"] in ("List", "LargeList", "FixedSizeList",
                              "Struct_") or ch.get("dictionary"):
                raise NotImplementedError(
                    "nested arrow struct member types not supported "
                    "(one STRUCT level of flat members is)")
    elif tname == "Map":
        # spec: Map is List<entries: Struct<key, value>> with the
        # entries struct as the single child
        if dict_enc is not None:
            raise NotImplementedError(
                "dictionary-encoded arrow map columns not supported")
        if len(children) != 1 or                 children[0]["type"] != "Struct_" or                 len(children[0]["children"]) != 2:
            raise ValueError(
                "arrow Map field needs one entries struct of two")
        for kv in children[0]["children"]:
            if kv["type"] in ("List", "LargeList", "FixedSizeList",
                              "Struct_", "Map") or                     kv.get("dictionary"):
                raise NotImplementedError(
                    "nested arrow map key/value types not supported "
                    "(flat key/value is)")
    elif children:
        raise NotImplementedError(
            "nested arrow schemas not supported")
    out["children"] = children
    return out


def parse_schema(meta: bytes) -> list[dict]:
    """Schema message flatbuffer -> ordered field specs."""
    fb = _FB(meta)
    msg = fb.root()
    ht_p = fb.field(msg, 1)  # header_type
    if ht_p is None or fb.u8(ht_p) != 1:  # MessageHeader.Schema
        raise ValueError("first arrow message is not a Schema")
    sch = fb.indirect(fb.field(msg, 2))
    end_p = fb.field(sch, 0)
    if end_p is not None and fb.i16(end_p) != 0:
        raise NotImplementedError(
            "big-endian arrow streams not supported")
    f_p = fb.field(sch, 1)
    fields = []
    if f_p is not None:
        n, base = fb.vector(f_p)
        for i in range(n):
            fields.append(_parse_field(fb, fb.indirect(base + 4 * i)))
    if not fields:
        raise ValueError("arrow schema has no fields")
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
    return {"n_rows": n_rows, "nodes": nodes, "buffers": buffers,
            "codec": codec, "body_len": body_len}


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


def _validity(buf: bytes, n: int, null_count: int) -> list[bool]:
    if null_count == 0 or not buf:
        return [True] * n
    if len(buf) * 8 < n:
        raise ValueError("arrow validity bitmap too short")
    return [bool(buf[i >> 3] >> (i & 7) & 1) for i in range(n)]


def _prim_values(field: dict, buf: bytes, n: int) -> list:
    t = field["type"]
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
        return list(struct.unpack_from(f"<{n}{code}", buf, 0))
    if t == "FloatingPoint":
        code = {0: "e", 1: "f", 2: "d"}[field["precision"]]
        size = {0: 2, 1: 4, 2: 8}[field["precision"]]
        if len(buf) < n * size:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"<{n}{code}", buf, 0))
    if t == "Bool":
        if len(buf) * 8 < n:
            raise ValueError("arrow bool buffer too short")
        return [bool(buf[i >> 3] >> (i & 7) & 1) for i in range(n)]
    if t == "Date":
        if field["unit"] != 0:
            raise NotImplementedError(
                "arrow date64 not supported (date32 is)")
        if len(buf) < n * 4:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"<{n}i", buf, 0))
    if t in ("Timestamp", "Duration"):
        if len(buf) < n * 8:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"<{n}q", buf, 0))
    if t == "Time":
        size = field["bits"] // 8
        code = "i" if size == 4 else "q"
        if len(buf) < n * size:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"<{n}{code}", buf, 0))
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
            u = int.from_bytes(buf[i * w:(i + 1) * w], "little",
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
                 dicts: dict | None = None) -> dict:
    """One RecordBatch -> {column: [python values]} following the
    spec's depth-first buffer layout.  ``dicts`` maps dictionary ids
    to already-delivered value lists (from DictionaryBatch messages)
    for dictionary-encoded fields."""
    return _decode_columns(fields, _parse_record_batch(meta), body,
                           dicts or {})


def apply_dictionary_batch(fields: list[dict], meta: bytes,
                           body: bytes, dicts: dict) -> None:
    """Decode one DictionaryBatch and install/extend its values in
    ``dicts`` (replacement unless isDelta, per the spec)."""
    db = _parse_dictionary_batch(meta)
    specs = {f["dictionary"]["id"]: f for f in fields
             if f.get("dictionary")}
    spec = specs.get(db["id"])
    if spec is None:
        raise ValueError(
            f"arrow DictionaryBatch id {db['id']} matches no "
            "dictionary-encoded schema field")
    vfield = dict(spec, dictionary=None)
    cols = _decode_columns([vfield], db["rb"], body, {})
    values = cols[vfield["name"]]
    if db["is_delta"] and db["id"] in dicts:
        dicts[db["id"]] = dicts[db["id"]] + values
    else:
        dicts[db["id"]] = values


def _decode_columns(fields: list[dict], rb: dict, body: bytes,
                    dicts: dict) -> dict:
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

    def flat_member(ch, m):
        """One flat child array of length ``m`` (struct member / map
        key/value): its own FieldNode + validity + data buffers."""
        c_len, c_nulls = take_node()
        if c_len != m:
            raise ValueError(
                f"arrow member {ch['name']!r} length {c_len} != {m}")
        c_valid = _validity(take_buf(), m, c_nulls)
        ct = ch["type"]
        if ct in ("Utf8", "Binary", "LargeUtf8", "LargeBinary"):
            wide = ct.startswith("Large")
            osz, ocode = (8, "q") if wide else (4, "i")
            offs_b = take_buf()
            if len(offs_b) < osz * (m + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"<{m + 1}{ocode}", offs_b, 0)
            data = take_buf()
            text = ct in ("Utf8", "LargeUtf8")
            mv = []
            for i in range(m):
                if not c_valid[i]:
                    mv.append(None)
                    continue
                a, e = offs[i], offs[i + 1]
                if a < 0 or e < a or e > len(data):
                    raise ValueError(
                        "arrow string offsets out of bounds")
                mv.append(data[a:e].decode("utf-8")
                          if text else bytes(data[a:e]))
            return mv
        raw2 = _prim_values(ch, take_buf(), m)
        return [v if ok2 else None for v, ok2 in zip(raw2, c_valid)]

    for field in fields:
        length, null_count = take_node()
        if length != n:
            raise ValueError(
                f"arrow field {field['name']!r} length {length} != "
                f"batch rows {n}")
        valid = _validity(take_buf(), n, null_count)
        t = field["type"]
        if field.get("dictionary"):
            enc = field["dictionary"]
            values = dicts.get(enc["id"])
            if values is None:
                raise ValueError(
                    f"arrow batch uses dictionary {enc['id']} before "
                    "any DictionaryBatch delivered it")
            idx_field = {"name": field["name"], "type": "Int",
                         "bits": enc["bits"], "signed": enc["signed"]}
            raw = _prim_values(idx_field, take_buf(), n)
            vals = []
            for ok, ix in zip(valid, raw):
                if not ok:
                    vals.append(None)
                    continue
                if ix < 0 or ix >= len(values):
                    raise ValueError(
                        f"arrow dictionary index {ix} outside the "
                        f"{len(values)}-entry dictionary")
                vals.append(values[ix])
        elif t in ("Utf8", "Binary", "LargeUtf8", "LargeBinary"):
            wide = t.startswith("Large")
            osz, ocode = (8, "q") if wide else (4, "i")
            offs_b = take_buf()
            if len(offs_b) < osz * (n + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"<{n + 1}{ocode}", offs_b, 0)
            data = take_buf()
            text = t in ("Utf8", "LargeUtf8")
            vals = []
            for i in range(n):
                if not valid[i]:
                    vals.append(None)
                    continue
                s, e = offs[i], offs[i + 1]
                if s < 0 or e < s or e > len(data):
                    raise ValueError("arrow string offsets out of "
                                     "bounds")
                vals.append(data[s:e].decode("utf-8")
                            if text else bytes(data[s:e]))
        elif t == "FixedSizeList":
            # no offsets buffer: child length is n * list_size, each
            # slot owns its fixed window (spec Fixed-Size List layout)
            k = field["list_size"]
            child = field["children"][0]
            c_len, c_nulls = take_node()
            if c_len != n * k:
                raise ValueError(
                    f"arrow FixedSizeList child length {c_len} != "
                    f"{n}*{k}")
            c_valid = _validity(take_buf(), c_len, c_nulls)
            c_vals = _prim_values(child, take_buf(), c_len)
            vals = []
            for i in range(n):
                if not valid[i]:
                    vals.append(None)
                    continue
                vals.append([c_vals[j] if c_valid[j] else None
                             for j in range(i * k, (i + 1) * k)])
        elif t == "Struct_":
            # spec Struct layout: the struct carries only a validity
            # bitmap; every child is a FULL-length array with its own
            # validity (unlike ORC's parent-present filtering)
            members = [(ch["name"], flat_member(ch, n))
                       for ch in field["children"]]
            vals = []
            for i in range(n):
                if not valid[i]:
                    vals.append(None)
                    continue
                vals.append({mn: mv[i] for mn, mv in members})
        elif t == "Map":
            # spec: List<entries: Struct<key, value>> — offsets over
            # the flattened entries; surfaced as (key, value) pairs
            # (pyarrow's own python shape)
            offs_b = take_buf()
            if len(offs_b) < 4 * (n + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"<{n + 1}i", offs_b, 0)
            entries = field["children"][0]
            e_len, e_nulls = take_node()
            _validity(take_buf(), e_len, e_nulls)  # entries bitmap
            kcol, vcol = [flat_member(ch, e_len)
                          for ch in entries["children"]]
            vals = []
            for i in range(n):
                if not valid[i]:
                    vals.append(None)
                    continue
                a, e = offs[i], offs[i + 1]
                if a < 0 or e < a or e > e_len:
                    raise ValueError(
                        "arrow map offsets out of bounds")
                vals.append([(kcol[j], vcol[j]) for j in range(a, e)])
        elif t in ("List", "LargeList"):
            osz, ocode = (8, "q") if t == "LargeList" else (4, "i")
            offs_b = take_buf()
            if len(offs_b) < osz * (n + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"<{n + 1}{ocode}", offs_b, 0)
            child = field["children"][0]
            c_len, c_nulls = take_node()
            c_valid = _validity(take_buf(), c_len, c_nulls)
            c_vals = _prim_values(child, take_buf(), c_len)
            vals = []
            for i in range(n):
                if not valid[i]:
                    vals.append(None)
                    continue
                s, e = offs[i], offs[i + 1]
                if s < 0 or e < s or e > c_len:
                    raise ValueError("arrow list offsets out of "
                                     "bounds")
                vals.append([c_vals[j] if c_valid[j] else None
                             for j in range(s, e)])
        else:
            raw = _prim_values(field, take_buf(), n)
            vals = [v if ok else None for v, ok in zip(raw, valid)]
        out[field["name"]] = vals
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
              "Bool": 6, "Date": 8, "Timestamp": 10, "List": 12,
              "FixedSizeList": 16}

_WRITABLE_LIST_CHILDREN = ("Int", "FloatingPoint", "Bool", "Date",
                           "Timestamp")


def _field_chunk(b: _FBBuilder, f: dict) -> _Chunk:
    if f.get("dictionary"):
        raise NotImplementedError(
            "arrow dictionary-encoded write not supported "
            "(plain columns are; the reader side decodes them)")
    t = f["type"]
    name = b.string(f.get("name", ""))
    children = None
    if t == "Int":
        tc = b.table([(0, "i32", f["bits"]),
                      (1, "u8", 1 if f.get("signed", True) else 0)])
    elif t == "FloatingPoint":
        tc = b.table([(0, "i16", f.get("precision", 2))])
    elif t == "Date":
        if f.get("unit", 0) != 0:
            raise NotImplementedError(
                "arrow date64 write not supported (date32 is)")
        tc = b.table([(0, "i16", 0)])
    elif t == "Timestamp":
        tc = b.table([(0, "i16", f.get("unit", 2))])
    elif t in ("Utf8", "Binary", "Bool"):
        tc = b.table([])
    elif t in ("List", "FixedSizeList"):
        if len(f.get("children") or []) != 1:
            raise ValueError(f"arrow {t} field needs one child")
        child = f["children"][0]
        if child["type"] not in _WRITABLE_LIST_CHILDREN:
            raise NotImplementedError(
                f"arrow list<{child['type']}> write not supported "
                "(one LIST level of fixed-width primitives is)")
        cc = _field_chunk(b, child)
        if t == "FixedSizeList":
            k = int(f.get("list_size") or 0)
            if k <= 0:
                raise ValueError(
                    "arrow FixedSizeList write needs list_size")
            tc = b.table([(0, "i32", k)])
        else:
            tc = b.table([])
        children = b.vec_refs([cc])
    else:
        raise NotImplementedError(f"arrow type {t} write not supported")
    slots = [(0, "ref", name),
             (1, "u8", 1 if f.get("nullable", True) else 0),
             (2, "u8", _TYPE_TAGS[t]),
             (3, "ref", tc)]
    if children is not None:
        slots.append((5, "ref", children))
    return b.table(slots)


def _schema_chunk(b: _FBBuilder, fields: list[dict]) -> _Chunk:
    fcs = [_field_chunk(b, f) for f in fields]
    return b.table([(1, "ref", b.vec_refs(fcs))])


def _schema_meta(fields: list[dict]) -> bytes:
    b = _FBBuilder()
    schema = _schema_chunk(b, fields)
    msg = b.table([(0, "i16", 4),  # MetadataVersion V5
                   (1, "u8", 1),   # MessageHeader.Schema
                   (2, "ref", schema),
                   (3, "i64", 0)])
    return b.finish(msg)


def _batch_meta(n_rows: int, nodes: list, buffers: list,
                codec: int | None, body_len: int) -> bytes:
    b = _FBBuilder()
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
    rb = b.table(slots)
    msg = b.table([(0, "i16", 4),
                   (1, "u8", 3),  # MessageHeader.RecordBatch
                   (2, "ref", rb),
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
    filled = [0 if v is None else v for v in vals]
    if t == "Int":
        code = {8: "b", 16: "h", 32: "i", 64: "q"}.get(field["bits"])
        if code is None:
            raise NotImplementedError(
                f"arrow int{field['bits']} write not supported")
        if not field.get("signed", True):
            code = code.upper()
        return struct.pack(f"<{len(vals)}{code}", *filled)
    if t == "FloatingPoint":
        code = "f" if field.get("precision", 2) == 1 else "d"
        return struct.pack(f"<{len(vals)}{code}",
                           *[float(v) for v in filled])
    if t == "Bool":
        bm = bytearray((len(vals) + 7) // 8)
        for i, v in enumerate(vals):
            if v:
                bm[i >> 3] |= 1 << (i & 7)
        return bytes(bm)
    if t == "Date":
        return struct.pack(f"<{len(vals)}i", *filled)
    if t == "Timestamp":
        return struct.pack(f"<{len(vals)}q", *filled)
    raise NotImplementedError(f"arrow type {t} write not supported")


def _enc_offsets(lengths: list[int]) -> bytes:
    offs = [0]
    for ln in lengths:
        offs.append(offs[-1] + ln)
    if offs[-1] > (1 << 31) - 1:
        raise NotImplementedError(
            "arrow 32-bit offsets overflow (LargeUtf8/LargeBinary "
            "write not supported)")
    return struct.pack(f"<{len(offs)}i", *offs)


def _enc_column(field: dict, vals: list) -> tuple[list, list]:
    """-> (field_nodes, raw_buffers), depth-first per the spec."""
    vb, nc = _enc_validity(vals)
    nodes = [(len(vals), nc)]
    bufs = [vb]
    t = field["type"]
    if t in ("Utf8", "Binary"):
        payloads = [b"" if v is None else
                    (v.encode("utf-8") if t == "Utf8" else bytes(v))
                    for v in vals]
        bufs.append(_enc_offsets([len(p) for p in payloads]))
        bufs.append(b"".join(payloads))
    elif t == "List":
        child = field["children"][0]
        flat: list = []
        lens = []
        for v in vals:
            if v is None:
                lens.append(0)
            else:
                flat.extend(v)
                lens.append(len(v))
        bufs.append(_enc_offsets(lens))
        cn, cb = _enc_column(child, flat)
        nodes.extend(cn)
        bufs.extend(cb)
    elif t == "FixedSizeList":
        child = field["children"][0]
        k = int(field["list_size"])
        flat = []
        for v in vals:
            if v is None:
                flat.extend([None] * k)
            elif len(v) != k:
                raise ValueError(
                    f"FixedSizeList value of length {len(v)} != {k}")
            else:
                flat.extend(v)
        cn, cb = _enc_column(child, flat)
        nodes.extend(cn)
        bufs.extend(cb)
    else:
        bufs.append(_enc_prim(field, vals))
    return nodes, bufs


def _enc_batch(fields: list[dict], columns: dict, lo: int, hi: int,
               compression: str | None) -> tuple[bytes, bytes]:
    nodes: list = []
    raw: list = []
    for f in fields:
        n, bs = _enc_column(f, columns[f["name"]][lo:hi])
        nodes.extend(n)
        raw.extend(bs)
    codec = {None: None, "lz4": 0, "zstd": 1}[compression]
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
    meta = _batch_meta(hi - lo, nodes, bufmeta, codec, len(body))
    return meta, bytes(body)


def _frame(meta: bytes, body: bytes) -> bytes:
    pad = (-len(meta)) % 8
    return (struct.pack("<Ii", _CONT, len(meta) + pad) + meta
            + b"\0" * pad + body)


def _footer_fb(fields: list[dict], blocks: list) -> bytes:
    b = _FBBuilder()
    schema = _schema_chunk(b, fields)
    packed = b"".join(struct.pack("<qi4xq", off, mlen, blen)
                      for off, mlen, blen in blocks)
    rvec = b.vec_structs(packed, len(blocks))
    footer = b.table([(0, "i16", 4), (1, "ref", schema),
                      (3, "ref", (rvec, 4))])
    return b.finish(footer)


def ipc_write(fields: list[dict], columns: dict, *,
              fmt: str = "stream", compression: str | None = None,
              max_chunksize: int = 4096) -> bytes:
    """Columns -> Arrow IPC bytes.  ``fields`` uses the same spec
    dicts ``parse_schema`` emits ({name, type, nullable, bits/signed/
    precision/unit, children}); ``columns`` maps name -> python list.
    ``fmt``: "stream" or "file"; ``compression``: None | "lz4" |
    "zstd" (the repo's own encoders)."""
    if fmt not in ("stream", "file"):
        raise ValueError(f"unknown arrow ipc format {fmt!r}")
    if compression not in (None, "lz4", "zstd"):
        raise NotImplementedError(
            f"arrow body compression {compression!r} not supported")
    if not fields:
        raise ValueError("arrow schema needs at least one field")
    if max_chunksize < 1:
        raise ValueError("max_chunksize must be positive")
    lens = {f["name"]: len(columns[f["name"]]) for f in fields}
    if len(set(lens.values())) > 1:
        raise ValueError(f"ragged arrow columns: {lens}")
    n = next(iter(lens.values()))
    out = bytearray()
    if fmt == "file":
        out += b"ARROW1\0\0"
    out += _frame(_schema_meta(fields), b"")
    blocks = []
    for lo in range(0, n, max_chunksize):
        hi = min(lo + max_chunksize, n)
        meta, body = _enc_batch(fields, columns, lo, hi, compression)
        mlen = 8 + len(meta) + ((-len(meta)) % 8)
        blocks.append((len(out), mlen, len(body)))
        out += _frame(meta, body)
    out += struct.pack("<Ii", _CONT, 0)  # end-of-stream marker
    if fmt == "file":
        footer = _footer_fb(fields, blocks)
        out += footer + struct.pack("<i", len(footer)) + b"ARROW1"
    return bytes(out)
