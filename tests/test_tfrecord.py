"""From-spec TFRecord + tf.train.Example: protobuf varint spec
vectors, hand-built golden Example bytes pinned against the encoder,
packed-vs-unpacked list parity (decoders must accept both per the
protobuf spec), masked-CRC framing rejects, and the Spark kernel."""

import struct

import pytest

from modeltracking_spark.operators.tfrecord import (
    decode_example,
    encode_example,
    read_varint,
    tfrecord_read,
    tfrecord_write,
    walk_fields,
    write_varint,
)


def test_varint_spec_vectors():
    assert write_varint(300) == b"\xac\x02"  # the protobuf spec example
    assert write_varint(0) == b"\x00"
    assert write_varint(127) == b"\x7f"
    assert write_varint(128) == b"\x80\x01"
    # negatives: two's-complement 10-byte form
    assert write_varint(-1) == b"\xff" * 9 + b"\x01"
    for n in (0, 1, 127, 128, 300, 2**40, 2**63 - 1):
        assert read_varint(write_varint(n), 0)[0] == n
    with pytest.raises(ValueError, match="truncated"):
        read_varint(b"\x80\x80", 0)


def test_golden_example_bytes():
    """Hand-assembled Example{features{'a': Int64List([150])}} — the
    encoder must emit EXACTLY these bytes and the decoder read them."""
    inner = b"\x1a\x04\x0a\x02\x96\x01"  # Feature{int64_list{[150]}}
    entry = b"\x0a\x01a\x12\x06" + inner
    golden = (b"\x0a" + bytes([len(entry) + 2])
              + b"\x0a" + bytes([len(entry)]) + entry)
    assert encode_example({"a": [150]}) == golden
    assert decode_example(golden) == {"a": ("int64", [150])}


def test_example_roundtrip_all_kinds():
    ex = encode_example({
        "text": b"hello \x00 binary",
        "name": "utf8 string βeta",
        "tokens": [0, 1, -5, 2**40, -(2**62)],
        "scores": [0.25, -1.5, 3.0, 0.0],
    })
    dec = decode_example(ex)
    assert dec["text"] == ("bytes", [b"hello \x00 binary"])
    assert dec["name"] == ("bytes", ["utf8 string βeta".encode()])
    assert dec["tokens"] == ("int64", [0, 1, -5, 2**40, -(2**62)])
    assert dec["scores"] == ("float", [0.25, -1.5, 3.0, 0.0])


def test_unpacked_lists_also_decode():
    """The protobuf spec requires decoders to accept UNPACKED repeated
    scalars even when the schema says packed: hand-build that form."""
    # Int64List{value: 7, value: -2} unpacked = two wire-type-0 fields
    il = b"\x08\x07" + b"\x08" + write_varint(-2)
    feature = b"\x1a" + bytes([len(il)]) + il
    entry = b"\x0a\x01t\x12" + bytes([len(feature)]) + feature
    feats = b"\x0a" + bytes([len(entry)]) + entry
    ex = b"\x0a" + bytes([len(feats)]) + feats
    assert decode_example(ex)["t"] == ("int64", [7, -2])
    # FloatList unpacked: wire-type-5 fields
    fl = b"\x0d" + struct.pack("<f", 2.5) + b"\x0d" + struct.pack("<f", -1.0)
    feature = b"\x12" + bytes([len(fl)]) + fl
    entry = b"\x0a\x01s\x12" + bytes([len(feature)]) + feature
    feats = b"\x0a" + bytes([len(entry)]) + entry
    ex = b"\x0a" + bytes([len(feats)]) + feats
    assert decode_example(ex)["s"] == ("float", [2.5, -1.0])


def test_unknown_fields_are_skipped():
    """Protobuf rule: unknown field numbers are skipped, known ones
    still decode — splice an unknown field into the Example."""
    ex = bytearray(encode_example({"a": [1]}))
    spliced = bytes([0x78, 0x2A]) + bytes(ex)  # field 15, varint 42, at top
    assert decode_example(spliced) == {"a": ("int64", [1])}
    with pytest.raises(ValueError, match="wire type"):
        list(walk_fields(b"\x0c"))  # wire type 4 (deprecated groups)


def test_tfrecord_framing_and_rejects():
    recs = [encode_example({"a": [i]}) for i in range(5)] + [b""]
    stream = tfrecord_write(recs)
    assert tfrecord_read(stream) == recs
    assert tfrecord_read(b"") == []
    bad = bytearray(stream)
    bad[8] ^= 0xFF  # length CRC
    with pytest.raises(ValueError, match="length CRC"):
        tfrecord_read(bytes(bad))
    bad = bytearray(stream)
    bad[12] ^= 0xFF  # first payload byte -> data CRC
    with pytest.raises(ValueError, match="data CRC"):
        tfrecord_read(bytes(bad))
    with pytest.raises(ValueError, match="truncated|overruns"):
        tfrecord_read(stream[:-3])
    bomb = bytearray(stream)
    bomb[0:8] = struct.pack("<Q", 1 << 60)  # absurd length claim
    with pytest.raises(ValueError):
        tfrecord_read(bytes(bomb))


def test_corruption_fuzz_typed_rejects():
    import random

    stream = tfrecord_write([
        encode_example({"text": b"fuzz " * 20, "tokens": [1, 2, 3],
                        "scores": [0.5]})
        for _ in range(10)
    ])
    rng = random.Random(3)
    for _ in range(500):
        b = bytearray(stream)
        op = rng.randrange(3)
        if op == 0:
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(7)) + b[i:]
        try:
            for rec in tfrecord_read(bytes(b), max_records=64):
                decode_example(rec)
        except (ValueError, UnicodeDecodeError):
            pass  # typed rejects only


def test_spark_kernel(spark):
    import hashlib

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from modeltracking_spark.operators.tfrecord import (
        tfrecord_example_stats,
    )

    rows = []
    for i in range(4):
        text = (f"doc {i} " * (i + 2)).encode()
        half = len(text) // 2
        r1 = encode_example({"text": text[:half], "tokens": [i, 7, 9],
                             "scores": [i * 0.25]})
        r2 = encode_example({"text": text[half:], "scores": [1.5]})
        rows.append((i, bytearray(tfrecord_write([r1, r2])), text))
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in rows],
        StructType([StructField("doc_id", LongType()),
                    StructField("payload", BinaryType())]),
    )
    got = {r["doc_id"]: r for r in tfrecord_example_stats(df).collect()}
    for i, _, text in rows:
        r = got[i]
        assert r["n_records"] == 2 and r["n_tokens"] == 3
        assert r["text_md5"] == hashlib.md5(text).hexdigest()
        assert r["score_sum"] == i * 0.25 + 1.5
        assert r["kinds_ok"]
