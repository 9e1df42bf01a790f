"""From-spec Apache Avro Object Container File reader/writer — flat
record schemas.

The Avro 1.11 specification is public: zigzag-varint longs, length-
prefixed UTF-8 strings/bytes, little-endian IEEE doubles, records as
plain field concatenation in schema order, and the OCF layout (magic
``Obj\\x01``, a metadata map carrying ``avro.schema`` JSON and
``avro.codec``, a 16-byte sync marker, then data blocks of
``(record count, byte size, payload, sync)``).  The ``deflate`` codec
is RAW DEFLATE (RFC 1951, no zlib wrapper) — decoded here with the
repo's from-spec ``operators/inflate.py``, tying the two specs
together; ``null`` codec is supported too.

Spark ships Avro support as an external jar that is absent in this
environment, so this module IS the engine's Avro surface: a writer
for fixtures/sinks and a reader wired into a Python DataSource
(``sources/avro_source.py``) with one InputPartition per shard file.

Scope: flat records over long / double / string / bytes / boolean and
their ``["null", T]`` unions; anything else raises at the documented
plug-in point.  Zigzag examples from the spec (0->0, -1->1, 1->2,
-2->3, 2->4) are pinned byte-for-byte in tests/test_avro.py.
"""

from __future__ import annotations

import json
import struct

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(2, 18))  # deterministic fixture sync marker


def zigzag_encode(n: int) -> bytes:
    zz = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    zz &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    zz = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated avro varint")
        b = data[pos]
        pos += 1
        zz |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift > 70:
            raise ValueError("avro varint too long")
    n = (zz >> 1) ^ -(zz & 1)
    return n, pos


def _enc_value(ftype, v) -> bytes:
    if isinstance(ftype, list):  # ["null", T]
        if set(ftype) - {"null"} == set() or len(ftype) != 2 \
                or "null" not in ftype:
            raise NotImplementedError("only [null, T] unions supported")
        other = ftype[0] if ftype[1] == "null" else ftype[1]
        if v is None:
            return zigzag_encode(ftype.index("null"))
        return zigzag_encode(ftype.index(other)) + _enc_value(other, v)
    if ftype == "long" or ftype == "int":
        return zigzag_encode(int(v))
    if ftype == "string":
        b = v.encode("utf-8")
        return zigzag_encode(len(b)) + b
    if ftype == "bytes":
        return zigzag_encode(len(v)) + bytes(v)
    if ftype == "double":
        return struct.pack("<d", float(v))
    if ftype == "boolean":
        return b"\x01" if v else b"\x00"
    raise NotImplementedError(f"avro type {ftype!r} — the plug-in point")


def _dec_value(ftype, data: bytes, pos: int):
    if isinstance(ftype, list):
        idx, pos = zigzag_decode(data, pos)
        if not 0 <= idx < len(ftype):
            raise ValueError("avro union branch out of range")
        branch = ftype[idx]
        if branch == "null":
            return None, pos
        return _dec_value(branch, data, pos)
    if ftype in ("long", "int"):
        return zigzag_decode(data, pos)
    if ftype == "string":
        n, pos = zigzag_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("truncated avro string")
        return data[pos:pos + n].decode("utf-8"), pos + n
    if ftype == "bytes":
        n, pos = zigzag_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("truncated avro bytes")
        return data[pos:pos + n], pos + n
    if ftype == "double":
        if pos + 8 > len(data):
            raise ValueError("truncated avro double")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if ftype == "boolean":
        if pos >= len(data):
            raise ValueError("truncated avro boolean")
        if data[pos] > 1:
            raise ValueError("invalid avro boolean byte")
        return bool(data[pos]), pos + 1
    raise NotImplementedError(f"avro type {ftype!r} — the plug-in point")


def avro_ocf_write(records: list[dict], fields: list[tuple[str, object]],
                   name: str = "row", codec: str = "deflate",
                   block_records: int = 1000) -> bytes:
    """Flat records -> OCF bytes. ``fields`` = [(name, type)] where
    type is an avro primitive or ["null", T]."""
    schema = {
        "type": "record", "name": name,
        "fields": [{"name": fn, "type": ft} for fn, ft in fields],
    }
    meta_pairs = [
        (b"avro.schema", json.dumps(schema).encode("utf-8")),
        (b"avro.codec", codec.encode("ascii")),
    ]
    out = bytearray(_MAGIC)
    out += zigzag_encode(len(meta_pairs))
    for k, v in meta_pairs:
        out += zigzag_encode(len(k)) + k
        out += zigzag_encode(len(v)) + v
    out += zigzag_encode(0)  # end of metadata map
    out += _SYNC
    for i in range(0, max(len(records), 1), block_records):
        block = records[i:i + block_records]
        if not block:
            break
        body = b"".join(
            b"".join(_enc_value(ft, r[fn]) for fn, ft in fields)
            for r in block
        )
        if codec == "deflate":
            import zlib

            co = zlib.compressobj(6, zlib.DEFLATED, -15)  # RAW deflate
            body = co.compress(body) + co.flush()
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        out += zigzag_encode(len(block))
        out += zigzag_encode(len(body))
        out += body
        out += _SYNC
    return bytes(out)


def avro_ocf_read(data: bytes) -> tuple[dict, list[dict]]:
    """OCF bytes -> (schema dict, records). Deflate blocks decode
    through the from-spec RFC 1951 implementation; sync markers are
    verified between blocks."""
    if data[:4] != _MAGIC:
        raise ValueError("bad avro OCF magic")
    pos = 4
    meta = {}
    while True:
        n, pos = zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:  # negative count variant: abs count + byte size
            n = -n
            _sz, pos = zigzag_decode(data, pos)
        if n > 1 << 20:
            raise ValueError("implausible avro metadata pair count")
        for _ in range(n):
            kl, pos = zigzag_decode(data, pos)
            if kl < 0 or pos + kl > len(data):
                raise ValueError("avro metadata key overruns the file")
            key = data[pos:pos + kl].decode("utf-8")
            pos += kl
            vl, pos = zigzag_decode(data, pos)
            if vl < 0 or pos + vl > len(data):
                raise ValueError("avro metadata value overruns the file")
            meta[key] = data[pos:pos + vl]
            pos += vl
    if "avro.schema" not in meta:
        raise ValueError("avro OCF missing schema")
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise NotImplementedError("only flat record schemas supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    codec = meta.get("avro.codec", b"null").decode("ascii")
    sync = data[pos:pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated avro sync marker")
    pos += 16
    records = []
    while pos < len(data):
        cnt, pos = zigzag_decode(data, pos)
        size, pos = zigzag_decode(data, pos)
        if cnt < 0 or size < 0 or pos + size > len(data):
            raise ValueError("avro block overruns the file")
        body = data[pos:pos + size]
        pos += size
        if codec == "deflate":
            from modeltracking_spark.operators.inflate import inflate

            body, end = inflate(body, 0)
            if end != size:
                raise ValueError("avro deflate block has trailing bytes")
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        bpos = 0
        for _ in range(cnt):
            rec = {}
            for fn, ft in fields:
                rec[fn], bpos = _dec_value(ft, body, bpos)
            records.append(rec)
        if bpos != len(body):
            raise ValueError("avro block has undecoded trailing bytes")
        if data[pos:pos + 16] != sync:
            raise ValueError("avro sync marker mismatch")
        pos += 16
    return schema, records
