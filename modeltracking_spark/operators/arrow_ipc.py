"""From-spec Apache Arrow IPC reader (streaming + file formats) —
the columnar interchange format, implemented from the public Arrow
"IPC Streaming/File Format" specification and the published
flatbuffers wire format (Message.fbs / Schema.fbs field numbering).
Nothing delegates to pyarrow: the encapsulated-message framing
(continuation marker + metadata length + flatbuffer + 8-padded
body), a minimal from-spec FlatBuffers walker (root uoffset, vtable
indirection, strings/vectors/unions/inline structs), the Schema type
tree, RecordBatch field nodes + buffer layout (validity bitmap /
offsets / data, depth-first per field), and the optional LZ4_FRAME /
ZSTD body compression (each buffer: int64 uncompressed-length prefix
+ frame) via THIS repo's own from-spec lz4/zstd decoders.

Scope: flat primitive columns (ints at all widths, float32/64, bool,
utf8, binary, date32, timestamp) plus one LIST level of primitives —
the embedding shape; dictionary-encoded columns, deeper nesting, and
big-endian streams are typed loud rejects.  Validation: pyarrow (the
reference implementation) WRITES every fixture in
tests/test_arrow_ipc.py; this module must read them exactly.
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
    if dict_p is not None:
        raise NotImplementedError(
            "dictionary-encoded arrow columns not supported")
    out = {"name": name, "nullable": nullable, "type": tname}
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
        if out["precision"] == 0:  # HALF
            raise NotImplementedError(
                "float16 arrow columns not supported")
    elif tname == "Timestamp":
        u_p = fb.field(tpos, 0)
        out["unit"] = fb.i16(u_p) if u_p is not None else 0
    elif tname == "Date":
        u_p = fb.field(tpos, 0)
        out["unit"] = fb.i16(u_p) if u_p is not None else 0  # 0=DAY
    elif tname in ("Utf8", "Binary", "Bool", "List"):
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
    if tname == "List":
        if len(children) != 1:
            raise ValueError("arrow List field needs one child")
        if children[0]["type"] in ("List", "Struct_", "Utf8",
                                   "Binary"):
            raise NotImplementedError(
                "nested arrow list element types not supported "
                "(one LIST level of fixed-width primitives is)")
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


def _parse_record_batch(meta: bytes) -> dict:
    fb = _FB(meta)
    msg = fb.root()
    ht_p = fb.field(msg, 1)
    ht = fb.u8(ht_p) if ht_p is not None else 0
    if ht == 2:  # DictionaryBatch
        raise NotImplementedError(
            "arrow dictionary batches not supported")
    if ht != 3:  # RecordBatch
        raise ValueError(f"unexpected arrow message header {ht}")
    body_p = fb.field(msg, 3)
    body_len = fb.i64(body_p) if body_p is not None else 0
    rb = fb.indirect(fb.field(msg, 2))
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
        code = "f" if field["precision"] == 1 else "d"
        size = 4 if code == "f" else 8
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
    if t == "Timestamp":
        if len(buf) < n * 8:
            raise ValueError("arrow data buffer too short")
        return list(struct.unpack_from(f"<{n}q", buf, 0))
    raise NotImplementedError(f"arrow type {t} not supported")


def decode_batch(fields: list[dict], meta: bytes,
                 body: bytes) -> dict:
    """One RecordBatch -> {column: [python values]} following the
    spec's depth-first buffer layout."""
    rb = _parse_record_batch(meta)
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

    for field in fields:
        length, null_count = take_node()
        if length != n:
            raise ValueError(
                f"arrow field {field['name']!r} length {length} != "
                f"batch rows {n}")
        valid = _validity(take_buf(), n, null_count)
        t = field["type"]
        if t in ("Utf8", "Binary"):
            offs_b = take_buf()
            if len(offs_b) < 4 * (n + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"<{n + 1}i", offs_b, 0)
            data = take_buf()
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
                            if t == "Utf8" else bytes(data[s:e]))
        elif t == "List":
            offs_b = take_buf()
            if len(offs_b) < 4 * (n + 1):
                raise ValueError("arrow offsets buffer too short")
            offs = struct.unpack_from(f"<{n + 1}i", offs_b, 0)
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
    n_batches = 0
    for meta, body in ipc_messages(blob):
        if fields is None:
            fields = parse_schema(meta)
            cols = {f["name"]: [] for f in fields}
            continue
        batch = decode_batch(fields, meta, body)
        for k, v in batch.items():
            cols[k].extend(v)
        n_batches += 1
    if fields is None:
        raise ValueError("arrow blob carries no schema message")
    return {"fields": fields, "columns": cols, "n_batches": n_batches}
