"""From-spec TFRecord container + tf.train.Example protobuf codec —
the TensorFlow training-shard stack.

Both layers are publicly specified: the TFRecord framing (TensorFlow's
documented record format: ``u64 LE length, masked CRC-32C of the
length bytes, payload, masked CRC-32C of the payload`` with the same
rotate-15-plus-constant mask as the Snappy framing — the CRC-32C
itself is shared with ``operators/snappy.py``, RFC 3720 check values
pinned there), and the protobuf wire format (varint / 64-bit /
length-delimited / 32-bit wire types) over the published
``tf.train.Example`` schema:

    Example    { Features features = 1 }
    Features   { map<string, Feature> feature = 1 }
    Feature    { oneof kind { BytesList 1 | FloatList 2 | Int64List 3 } }
    BytesList  { repeated bytes value = 1 }
    FloatList  { repeated float value = 1 [packed] }
    Int64List  { repeated int64 value = 1 [packed] }

Encoder and decoder are both implemented (no TF in this sandbox, so
the roundtrip is pinned by hand-built golden bytes in
tests/test_tfrecord.py: tag/varint layouts per the protobuf spec,
negative int64's 10-byte varint, packed vs unpacked list parity —
decoders must accept BOTH per the spec — and CRC tamper rejects).

Malformed records raise descriptive ``ValueError``; unknown
fields/wire types follow the protobuf rule (skipped by the generic
walker) except where the Example schema requires a known shape.
"""

from __future__ import annotations

import struct

from modeltracking_spark.operators.kernel import widen_for_kernel
from modeltracking_spark.operators.snappy import _mask_crc, crc32c


# ----------------------------------------------------------- protobuf wire

def write_varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # two's complement: negatives take 10 bytes
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated protobuf varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift >= 70:
            raise ValueError("protobuf varint too long")
    return n, pos


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _tag(field: int, wire: int) -> bytes:
    return write_varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + write_varint(len(payload)) + payload


def walk_fields(data: bytes):
    """Generic protobuf message walker: yields (field_no, wire_type,
    value) — varints as ints, 64/32-bit as raw bytes, length-delimited
    as bytes. Unknown wire types reject loudly."""
    pos = 0
    while pos < len(data):
        key, pos = read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if field == 0:
            raise ValueError("protobuf field number 0 is invalid")
        if wire == 0:
            v, pos = read_varint(data, pos)
        elif wire == 1:
            if pos + 8 > len(data):
                raise ValueError("truncated 64-bit protobuf field")
            v, pos = data[pos:pos + 8], pos + 8
        elif wire == 2:
            n, pos = read_varint(data, pos)
            if n < 0 or pos + n > len(data):
                raise ValueError("protobuf length-delimited field overruns")
            v, pos = data[pos:pos + n], pos + n
        elif wire == 5:
            if pos + 4 > len(data):
                raise ValueError("truncated 32-bit protobuf field")
            v, pos = data[pos:pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield field, wire, v


# ------------------------------------------------------ tf.train.Example

def encode_example(features: dict) -> bytes:
    """{name: bytes | str | [int] | [float]} -> serialized Example.
    Lists of ints/floats become packed Int64List/FloatList; bytes/str
    become single-element BytesList."""
    entries = b""
    for name in features:  # caller-ordered (dicts preserve insertion)
        v = features[name]
        if isinstance(v, str):
            v = v.encode("utf-8")
        if isinstance(v, (bytes, bytearray)):
            flist = _len_delim(1, _len_delim(1, bytes(v)))  # BytesList
        elif isinstance(v, list) and all(isinstance(x, int) for x in v):
            packed = b"".join(write_varint(x) for x in v)
            flist = _len_delim(3, _tag(1, 2) + write_varint(len(packed))
                               + packed)  # Int64List packed
        elif isinstance(v, list):
            packed = b"".join(struct.pack("<f", float(x)) for x in v)
            flist = _len_delim(2, _tag(1, 2) + write_varint(len(packed))
                               + packed)  # FloatList packed
        else:
            raise ValueError(f"unsupported feature value for {name!r}")
        entry = _len_delim(1, name.encode("utf-8")) + _len_delim(2, flist)
        entries += _len_delim(1, entry)  # map entry
    return _len_delim(1, entries)  # Example.features


def _decode_list(kind: int, payload: bytes):
    vals = []
    for f, w, v in walk_fields(payload):
        if f != 1:
            continue  # unknown fields are skipped per the proto rule
        if kind == 1:  # BytesList
            if w != 2:
                raise ValueError("BytesList value must be length-delimited")
            vals.append(v)
        elif kind == 3:  # Int64List: packed blob or repeated varints
            if w == 2:
                pos = 0
                while pos < len(v):
                    n, pos = read_varint(v, pos)
                    vals.append(_signed64(n))
            elif w == 0:
                vals.append(_signed64(v))
            else:
                raise ValueError("Int64List value has wrong wire type")
        else:  # FloatList: packed blob or repeated 32-bit
            if w == 2:
                if len(v) % 4:
                    raise ValueError("packed FloatList not 4-byte aligned")
                vals.extend(
                    struct.unpack_from("<f", v, i)[0]
                    for i in range(0, len(v), 4)
                )
            elif w == 5:
                vals.append(struct.unpack("<f", v)[0])
            else:
                raise ValueError("FloatList value has wrong wire type")
    return vals


def decode_example(data: bytes) -> dict:
    """Serialized Example -> {name: (kind, values)} with kind in
    ('bytes', 'float', 'int64')."""
    out = {}
    for f, w, v in walk_fields(data):
        if f != 1 or w != 2:
            continue  # Example has only field 1 (Features)
        for f2, w2, entry in walk_fields(v):
            if f2 != 1 or w2 != 2:
                continue
            name = None
            feature = None
            for f3, w3, v3 in walk_fields(entry):
                if f3 == 1 and w3 == 2:
                    name = v3.decode("utf-8")
                elif f3 == 2 and w3 == 2:
                    feature = v3
            if name is None or feature is None:
                raise ValueError("Example map entry missing key or value")
            kind = None
            vals = []
            for f4, _w4, v4 in walk_fields(feature):
                if f4 in (1, 2, 3):
                    kind = {1: "bytes", 2: "float", 3: "int64"}[f4]
                    vals = _decode_list(f4, v4)
            if kind is None:
                raise ValueError(f"feature {name!r} has no kind set")
            out[name] = (kind, vals)
    return out


# ------------------------------------------------------------- TFRecord

def tfrecord_write(records: list[bytes]) -> bytes:
    """Records -> TFRecord stream: u64 LE length + masked CRC-32C of
    the length bytes + payload + masked CRC-32C of the payload."""
    out = bytearray()
    for rec in records:
        ln = struct.pack("<Q", len(rec))
        out += ln
        out += struct.pack("<I", _mask_crc(crc32c(ln)))
        out += rec
        out += struct.pack("<I", _mask_crc(crc32c(rec)))
    return bytes(out)


def tfrecord_read(data: bytes, max_records: int = 1 << 20) -> list[bytes]:
    """TFRecord stream -> records, verifying BOTH masked CRCs."""
    out = []
    pos = 0
    while pos < len(data):
        if pos + 12 > len(data):
            raise ValueError("truncated TFRecord header")
        ln_bytes = data[pos:pos + 8]
        n = struct.unpack("<Q", ln_bytes)[0]
        want = struct.unpack("<I", data[pos + 8:pos + 12])[0]
        if _mask_crc(crc32c(ln_bytes)) != want:
            raise ValueError("TFRecord length CRC mismatch")
        pos += 12
        if n > len(data) - pos - 4:
            raise ValueError("TFRecord payload overruns the stream")
        rec = data[pos:pos + n]
        pos += n
        want = struct.unpack("<I", data[pos:pos + 4])[0]
        if _mask_crc(crc32c(rec)) != want:
            raise ValueError("TFRecord data CRC mismatch")
        pos += 4
        out.append(rec)
        if len(out) > max_records:
            raise ValueError("TFRecord stream exceeds max_records")
    return out


# ------------------------------------------------------------ spark kernel

def tfrecord_example_stats(df, payload_col: str = "payload",
                           id_col: str = "doc_id"):
    """Per-row TFRecord scan kernel: parse the record stream (both
    CRCs verified), decode each tf.train.Example, emit stats the
    oracle replays from the fixture formula. Narrow map (widened when
    under-split). Output: (id, n_records, text_md5, n_tokens,
    score_sum, kinds_ok)."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_records", LongType()),
            StructField("text_md5", StringType()),
            StructField("n_tokens", LongType()),
            StructField("score_sum", DoubleType()),
            StructField("kinds_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, nrecs, md5s, ntoks, ssums, oks = [], [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                recs = [decode_example(r)
                        for r in tfrecord_read(bytes(payload))]
                text = b"".join(
                    b"".join(r["text"][1]) for r in recs if "text" in r
                )
                toks = sum(len(r["tokens"][1]) for r in recs
                           if "tokens" in r)
                score = sum(sum(r["scores"][1]) for r in recs
                            if "scores" in r)
                kinds = all(
                    r.get("text", ("bytes",))[0] == "bytes"
                    and r.get("tokens", ("int64",))[0] == "int64"
                    and r.get("scores", ("float",))[0] == "float"
                    for r in recs
                )
                ids.append(int(did))
                nrecs.append(len(recs))
                md5s.append(hashlib.md5(text).hexdigest())
                ntoks.append(toks)
                ssums.append(float(score))
                oks.append(kinds)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_records": nrecs,
                    "text_md5": md5s,
                    "n_tokens": ntoks,
                    "score_sum": ssums,
                    "kinds_ok": oks,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        kernel, schema
    )
