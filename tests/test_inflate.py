"""From-spec DEFLATE/zlib decoder (operators/inflate.py), adversarially
cross-checked against stdlib zlib — the RFCs' reference implementation
— on arbitrary inputs at every compression level."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.inflate import (
    _adler32,
    inflate,
    zlib_decompress,
)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_matches_zlib_on_arbitrary_streams(data):
    """Every compression level (0 = stored blocks, 1/6 = fixed+dynamic
    mixes, 9 = dynamic) over incompressible, repetitive, and
    small-alphabet payloads — byte-identical to zlib.decompress."""
    kind = data.draw(st.sampled_from(["rand", "rep", "alpha"]), label="kind")
    n = data.draw(st.integers(0, 4000), label="n")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    level = data.draw(st.sampled_from([0, 1, 6, 9]), label="level")
    rng = np.random.RandomState(seed)
    if kind == "rand":
        payload = rng.randint(0, 256, n).astype(np.uint8).tobytes()
    elif kind == "rep":
        payload = (b"spark shuffle partition " * 200)[:n]
    else:
        payload = rng.choice(
            np.frombuffer(b"abcd", dtype=np.uint8), n
        ).tobytes()
    assert zlib_decompress(zlib.compress(payload, level)) == payload


def test_long_window_backrefs_and_raw_offsets():
    data = b"a" * 100000 + b"the quick brown fox" * 1000
    comp = zlib.compress(data, 9)
    assert zlib_decompress(comp) == data
    # raw inflate reports the offset where the trailer begins
    out, end = inflate(comp, 2)
    assert out == data and comp[end:] == comp[-4:]
    assert _adler32(data) == zlib.adler32(data)


def test_rejects_are_loud():
    comp = bytearray(zlib.compress(b"hello world" * 40, 6))
    bad = bytearray(comp)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="Adler-32"):
        zlib_decompress(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        zlib_decompress(bytes(comp[:-10]))
    with pytest.raises(ValueError, match="header check"):
        zlib_decompress(b"\x78\x00" + bytes(comp[2:]))
    with pytest.raises(ValueError, match="compression method"):
        zlib_decompress(b"\x75\x01" + bytes(comp[2:]))
    # stored-block LEN/NLEN corruption
    stored = bytearray(zlib.compress(b"plain bytes here", 0))
    stored[4] ^= 0xFF  # NLEN byte
    with pytest.raises(ValueError, match="LEN/NLEN"):
        zlib_decompress(bytes(stored))


def test_png_decodes_through_pure_inflate():
    """End-to-end on a real container: PNG decode with the from-spec
    inflater equals the zlib path bit-for-bit."""
    from modeltracking_spark.operators.png import decode_png, encode_png

    rng = np.random.RandomState(3)
    for trial in range(6):
        h, w = rng.randint(1, 24), rng.randint(1, 24)
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        payload = encode_png(img, interlace=bool(trial % 2))
        a = decode_png(payload)
        b = decode_png(payload, pure_inflate=True)
        assert np.array_equal(a, b) and np.array_equal(a, img)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_gzip_matches_stdlib(data):
    import gzip as _gzip

    n = data.draw(st.integers(0, 3000), label="n")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    level = data.draw(st.sampled_from([0, 1, 6, 9]), label="level")
    rep = data.draw(st.booleans(), label="repetitive")
    from modeltracking_spark.operators.inflate import gzip_decompress

    rng = np.random.RandomState(seed)
    payload = ((b"warc record " * 300)[:n] if rep
               else rng.randint(0, 256, n).astype(np.uint8).tobytes())
    assert gzip_decompress(_gzip.compress(payload, level)) == payload


def test_gzip_headers_trailers_and_rejects():
    import gzip as _gzip
    import io

    from modeltracking_spark.operators.inflate import (
        _crc32,
        gzip_decompress,
    )

    assert _crc32(b"123456789") == 0xCBF43926  # canonical check value
    buf = io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb", filename="docs.jsonl") as f:
        f.write(b'{"doc": 1}\n' * 50)
    good = buf.getvalue()
    assert gzip_decompress(good) == b'{"doc": 1}\n' * 50
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # ISIZE corruption
    with pytest.raises(ValueError, match="ISIZE"):
        gzip_decompress(bytes(bad))
    bad = bytearray(good)
    bad[-6] ^= 0xFF  # CRC-32 corruption
    with pytest.raises(ValueError, match="CRC-32"):
        gzip_decompress(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        gzip_decompress(b"PK\x03\x04" + good)
    with pytest.raises(NotImplementedError, match="multi-member"):
        gzip_decompress(good + good)


def test_spark_jsonl_gz_parts_decode_with_from_spec_gzip(spark):
    """The engine's .jsonl.gz interchange files (written by Spark's
    native gzip codec) decode through OUR RFC 1952 implementation to
    the same JSON lines Spark reads back — the spec decoder and the
    production codec path tied to identical bytes."""
    import glob
    import json as _json
    import os

    from modeltracking_spark.operators.inflate import gzip_decompress

    d = spark.createDataFrame(
        [(i, f"text {i} with escapes \" and \\ ") for i in range(50)],
        "doc_id long, text string",
    )
    out = "/tmp/modeltracking_gz_spec_test"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    d.coalesce(1).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(out)
    part = glob.glob(os.path.join(out, "part-*.json.gz"))[0]
    raw = gzip_decompress(open(part, "rb").read())
    rows = [_json.loads(line) for line in raw.decode().splitlines()]
    assert {(r["doc_id"], r["text"]) for r in rows} == {
        (i, f"text {i} with escapes \" and \\ ") for i in range(50)
    }
    shutil.rmtree(out, ignore_errors=True)
