"""Avro nested types + reader-schema resolution (round 10, VERDICT r9
item 3): nested records, arrays, maps, enums, fixed, general unions,
named-type references — byte-pinned against the Avro 1.11 spec prose —
and the Schema Resolution rules (name matching, skipped writer-only
fields, reader defaults, promotions, enum/union resolution) exercised
arm by arm, plus a 400-case mutation fuzz through the resolving read
path. No Avro library ships in this environment, so spec pins +
roundtrips are the validation (the TFRecord pattern)."""

import json

import pytest

from modeltracking_spark.operators.avro_ocf import (
    avro_ocf_read,
    avro_ocf_write,
)

_NESTED_SCHEMA = {
    "type": "record", "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "meta", "type": {
            "type": "record", "name": "meta_t",
            "fields": [
                {"name": "lang", "type": "string"},
                {"name": "score", "type": "float"},
                {"name": "flags", "type": {
                    "type": "array", "items": "boolean"}},
            ]}},
        {"name": "toks", "type": {"type": "array", "items": "string"}},
        {"name": "counts", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {
            "type": "enum", "name": "kind_t",
            "symbols": ["WEB", "BOOK", "CODE"]}},
        {"name": "digest", "type": {
            "type": "fixed", "name": "md5_t", "size": 4}},
        {"name": "extra", "type": ["null", "long", "string"]},
        {"name": "again", "type": "meta_t"},  # named-type reference
    ],
}


def _nested_recs():
    return [
        {"id": 1,
         "meta": {"lang": "en", "score": 0.5, "flags": [True, False]},
         "toks": ["a", "bb", "ccc"],
         "counts": {"a": 2, "bb": 1},
         "kind": "WEB", "digest": b"\x01\x02\x03\x04",
         "extra": None,
         "again": {"lang": "de", "score": 1.0, "flags": []}},
        {"id": 2,
         "meta": {"lang": "zh", "score": -2.25, "flags": []},
         "toks": [], "counts": {},
         "kind": "CODE", "digest": b"\xff\x00\xff\x00",
         "extra": 42,
         "again": {"lang": "fr", "score": 0.0, "flags": [True]}},
        {"id": 3,
         "meta": {"lang": "en", "score": 3.5, "flags": [False]},
         "toks": ["x"] * 5, "counts": {"x": 5},
         "kind": "BOOK", "digest": b"abcd",
         "extra": "tail",
         "again": {"lang": "en", "score": 9.0, "flags": []}},
    ]


def test_nested_roundtrip_both_codecs():
    for codec in ("null", "deflate"):
        blob = avro_ocf_write(_nested_recs(), schema=_NESTED_SCHEMA,
                              codec=codec)
        schema, back = avro_ocf_read(blob)
        assert schema == _NESTED_SCHEMA
        assert back == _nested_recs()


def test_nested_value_encoding_spec_pins():
    """Byte-level pins for the complex-type encodings straight from
    the Avro 1.11 spec prose."""
    from modeltracking_spark.operators.avro_ocf import (
        _dec_value,
        _enc_value,
    )

    arr_t = {"type": "array", "items": "long"}
    # [3, 27] -> block count 2 (zigzag 4), items 6 and 54, terminator 0
    assert _enc_value(arr_t, [3, 27]) == bytes([0x04, 0x06, 0x36, 0x00])
    assert _enc_value(arr_t, []) == b"\x00"
    map_t = {"type": "map", "values": "long"}
    # {"a": 1} -> count 1, key "a", value 2, terminator
    assert _enc_value(map_t, {"a": 1}) == bytes(
        [0x02, 0x02, ord("a"), 0x02, 0x00])
    enum_t = {"type": "enum", "name": "e", "symbols": ["A", "B", "C"]}
    assert _enc_value(enum_t, "C") == b"\x04"  # index 2 zigzagged
    union_t = ["null", "string"]
    assert _enc_value(union_t, None) == b"\x00"
    assert _enc_value(union_t, "a") == bytes([0x02, 0x02, ord("a")])
    # negative-count array block (abs count + byte size) decodes too
    neg = bytes([0x03, 0x04, 0x06, 0x36, 0x00])  # count -2, size 2
    assert _dec_value(arr_t, neg, 0) == ([3, 27], 5)


def test_schema_resolution_matrix():
    """Reader-schema resolution: defaults, skipped fields, promotions,
    enum defaults, union resolution — the spec's Schema Resolution
    table exercised arm by arm."""
    writer = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "gone", "type": {"type": "array", "items": "string"}},
            {"name": "s", "type": "string"},
            {"name": "u", "type": ["null", "int"]},
            {"name": "e", "type": {
                "type": "enum", "name": "e_t",
                "symbols": ["OLD", "KEEP"]}},
            {"name": "f", "type": "float"},
        ],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": "long"},              # int -> long
            {"name": "s", "type": "bytes"},             # string -> bytes
            {"name": "u", "type": ["null", "long"]},    # union promote
            {"name": "e", "type": {
                "type": "enum", "name": "e_t",
                "symbols": ["KEEP", "NEW"], "default": "NEW"}},
            {"name": "f", "type": "double"},            # float -> double
            {"name": "added", "type": "string", "default": "dflt"},
            {"name": "added_rec", "type": {
                "type": "record", "name": "ar",
                "fields": [{"name": "x", "type": "long"}]},
             "default": {"x": 7}},
            {"name": "added_bytes", "type": "bytes",
             "default": "\x01\x02"},  # latin-1 bytes default
        ],
    }
    recs = [
        {"a": 5, "gone": ["drop", "me"], "s": "hi", "u": None,
         "e": "KEEP", "f": 1.5},
        {"a": -3, "gone": [], "s": "yo", "u": 9, "e": "OLD", "f": 0.25},
    ]
    blob = avro_ocf_write(recs, schema=writer, codec="deflate")
    _schema, back = avro_ocf_read(blob, reader_schema=reader)
    assert back == [
        {"a": 5, "s": b"hi", "u": None, "e": "KEEP", "f": 1.5,
         "added": "dflt", "added_rec": {"x": 7},
         "added_bytes": b"\x01\x02"},
        {"a": -3, "s": b"yo", "u": 9, "e": "NEW", "f": 0.25,
         "added": "dflt", "added_rec": {"x": 7},
         "added_bytes": b"\x01\x02"},
    ]
    assert all(isinstance(r["a"], int) for r in back)
    # reader union accepts plain writer type; plain reader reads
    # writer union branch
    w2 = {"type": "record", "name": "r",
          "fields": [{"name": "v", "type": "int"}]}
    r2 = {"type": "record", "name": "r",
          "fields": [{"name": "v", "type": ["null", "double"]}]}
    blob2 = avro_ocf_write([{"v": 3}], schema=w2)
    assert avro_ocf_read(blob2, reader_schema=r2)[1] == [{"v": 3.0}]
    w3 = {"type": "record", "name": "r",
          "fields": [{"name": "v", "type": ["null", "string"]}]}
    r3 = {"type": "record", "name": "r",
          "fields": [{"name": "v", "type": "string"}]}
    blob3 = avro_ocf_write([{"v": "ok"}], schema=w3)
    assert avro_ocf_read(blob3, reader_schema=r3)[1] == [{"v": "ok"}]


def test_schema_resolution_rejects():
    writer = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"}]}
    blob = avro_ocf_write([{"a": 1}], schema=writer)
    # reader field with no default and absent from writer
    r_nodflt = {"type": "record", "name": "r",
                "fields": [{"name": "a", "type": "long"},
                           {"name": "b", "type": "long"}]}
    with pytest.raises(ValueError, match="no default"):
        avro_ocf_read(blob, reader_schema=r_nodflt)
    # incompatible promotion (long -> int is NOT allowed)
    r_narrow = {"type": "record", "name": "r",
                "fields": [{"name": "a", "type": "int"}]}
    with pytest.raises(ValueError, match="cannot resolve"):
        avro_ocf_read(blob, reader_schema=r_narrow)
    # enum symbol removed with no reader default
    w_e = {"type": "record", "name": "r",
           "fields": [{"name": "e", "type": {
               "type": "enum", "name": "e_t", "symbols": ["A", "B"]}}]}
    r_e = {"type": "record", "name": "r",
           "fields": [{"name": "e", "type": {
               "type": "enum", "name": "e_t", "symbols": ["B"]}}]}
    blob_e = avro_ocf_write([{"e": "A"}], schema=w_e)
    with pytest.raises(ValueError, match="absent from reader"):
        avro_ocf_read(blob_e, reader_schema=r_e)


def test_nested_mutation_fuzz_with_reader_schema():
    import random

    blob = avro_ocf_write(_nested_recs() * 10, schema=_NESTED_SCHEMA,
                          codec="null")
    reader = json.loads(json.dumps(_NESTED_SCHEMA))
    reader["fields"].append(
        {"name": "v2", "type": "long", "default": 0})
    rng = random.Random(17)
    for _ in range(400):
        b = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(9)) + b[i:]
        try:
            avro_ocf_read(bytes(b), reader_schema=reader)
        except (ValueError, NotImplementedError, UnicodeDecodeError,
                KeyError, TypeError):
            pass  # typed rejects (schema-JSON corruption -> shape errors)


def test_nested_roundtrip_hypothesis():
    """Random values conforming to the nested schema roundtrip
    byte-exactly (the CBOR recursive-tree pattern, schema-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    meta = st.fixed_dictionaries({
        "lang": st.text(max_size=12),
        "score": st.floats(allow_nan=False, width=32),
        "flags": st.lists(st.booleans(), max_size=5),
    })
    rec = st.fixed_dictionaries({
        "id": st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
        "meta": meta,
        "toks": st.lists(st.text(max_size=10), max_size=8),
        "counts": st.dictionaries(st.text(max_size=6),
                                  st.integers(-(2 ** 30), 2 ** 30),
                                  max_size=6),
        "kind": st.sampled_from(["WEB", "BOOK", "CODE"]),
        "digest": st.binary(min_size=4, max_size=4),
        "extra": st.one_of(
            st.none(),
            st.integers(-(2 ** 40), 2 ** 40),
            st.text(max_size=12),
        ),
        "again": meta,
    })

    @settings(max_examples=80, deadline=None)
    @given(st.lists(rec, min_size=1, max_size=5),
           st.sampled_from(["null", "deflate"]))
    def rt(recs, codec):
        blob = avro_ocf_write(recs, schema=_NESTED_SCHEMA, codec=codec,
                              block_records=2)
        _s, back = avro_ocf_read(blob)
        assert back == recs

    rt()


def test_snappy_codec_roundtrip_and_crc():
    """Avro's snappy codec (raw block + big-endian CRC32 of the
    uncompressed bytes) through the from-spec snappy implementation,
    incl. nested schemas and a CRC tamper reject."""
    blob = avro_ocf_write(_nested_recs() * 20, schema=_NESTED_SCHEMA,
                          codec="snappy", block_records=16)
    _s, back = avro_ocf_read(blob)
    assert back == _nested_recs() * 20
    # corrupt one compressed byte inside the first block: either the
    # snappy layer, the CRC, or a downstream typed check must reject
    bad = bytearray(blob)
    # find the first data block: after magic+metadata+sync; flip well
    # inside the payload region
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        avro_ocf_read(bytes(bad))
