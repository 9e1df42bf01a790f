"""From-spec CBOR codec (RFC 8949) — the IETF's binary JSON, used for
metadata sidecars, COSE/WebAuthn payloads, and IoT event streams.

The format is fully specified and the RFC ships its own golden test
vectors (Appendix A) — dozens of them are pinned byte-for-byte in
tests/test_cbor.py, giving this codec a validation floor no fixture
generator can drift from.  Implemented from the spec alone:

- major types 0-7: unsigned/negative integers (1+0/1/2/4/8-byte
  arguments, shortest-form on encode), byte/text strings, arrays,
  maps, tags (decoded as (tag, value) pass-through), simple values,
  and ALL THREE float widths — including the IEEE half-precision
  decode (sign/5-bit exponent/10-bit fraction, subnormals, ±inf, NaN)
  RFC 8949 specifies in its own pseudocode;
- indefinite-length strings (chunked, same-type rule), arrays and
  maps with the 0xFF "break" terminator;
- the encoder emits canonical-ish definite-length shortest-int forms
  (floats as 8-byte doubles for lossless Python roundtrips).

Malformed items raise descriptive ``ValueError`` (reserved additional
info 28-30, mis-typed indefinite chunks, unpaired break, trailing
bytes, truncation).
"""

from __future__ import annotations

import math
import struct

_BREAK = object()


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 0x100:
        return bytes([(major << 5) | 24, arg])
    if arg < 0x10000:
        return bytes([(major << 5) | 25]) + arg.to_bytes(2, "big")
    if arg < 0x100000000:
        return bytes([(major << 5) | 26]) + arg.to_bytes(4, "big")
    return bytes([(major << 5) | 27]) + arg.to_bytes(8, "big")


def cbor_encode(v) -> bytes:
    """Python value -> CBOR bytes (definite lengths, shortest ints)."""
    if v is True:
        return b"\xf5"
    if v is False:
        return b"\xf4"
    if v is None:
        return b"\xf6"
    if isinstance(v, int):
        if v >= 0:
            if v >= 1 << 64:
                raise ValueError("CBOR integer argument exceeds 64 bits")
            return _head(0, v)
        if -v - 1 >= 1 << 64:
            raise ValueError("CBOR integer argument exceeds 64 bits")
        return _head(1, -v - 1)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, (bytes, bytearray)):
        return _head(2, len(v)) + bytes(v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _head(3, len(b)) + b
    if isinstance(v, (list, tuple)):
        return _head(4, len(v)) + b"".join(cbor_encode(x) for x in v)
    if isinstance(v, dict):
        return _head(5, len(v)) + b"".join(
            cbor_encode(k) + cbor_encode(val) for k, val in v.items()
        )
    raise ValueError(f"unsupported CBOR value type {type(v).__name__}")


def cbor_tag(tag: int, v) -> bytes:
    return _head(6, tag) + cbor_encode(v)


def _half_to_float(h: int) -> float:
    """IEEE 754 binary16 -> float, per the RFC's own pseudocode."""
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    frac = h & 0x3FF
    if exp == 0:
        return sign * frac * 2.0 ** -24
    if exp == 31:
        return sign * math.inf if frac == 0 else math.nan
    return sign * (1024 + frac) * 2.0 ** (exp - 25)


def _decode_item(data: bytes, pos: int, depth: int = 0):
    if depth > 512:
        raise ValueError("CBOR nesting too deep")
    if pos >= len(data):
        raise ValueError("truncated CBOR item")
    ib = data[pos]
    pos += 1
    major, ai = ib >> 5, ib & 0x1F
    if ai in (28, 29, 30):
        raise ValueError(f"reserved CBOR additional info {ai}")

    def read_arg(n):
        nonlocal pos
        if pos + n > len(data):
            raise ValueError("truncated CBOR argument")
        v = int.from_bytes(data[pos:pos + n], "big")
        pos += n
        return v

    indefinite = ai == 31
    if indefinite:
        if major in (0, 1):
            raise ValueError("indefinite length invalid for integers")
        if major == 6:
            raise ValueError("indefinite length invalid for tags")
        if major == 7:
            return _BREAK, pos
        arg = None
    elif ai < 24:
        arg = ai
    else:
        arg = read_arg(1 << (ai - 24))

    if major == 0:
        return arg, pos
    if major == 1:
        return -1 - arg, pos
    if major in (2, 3):
        if indefinite:
            chunks = []
            while True:
                item, pos = _decode_item(data, pos, depth + 1)
                if item is _BREAK:
                    break
                want = bytes if major == 2 else str
                if not isinstance(item, want):
                    raise ValueError(
                        "indefinite string chunk of the wrong type"
                    )
                chunks.append(item)
            return (b"".join(chunks) if major == 2
                    else "".join(chunks)), pos
        if pos + arg > len(data):
            raise ValueError("truncated CBOR string")
        raw = data[pos:pos + arg]
        pos += arg
        return (raw if major == 2 else raw.decode("utf-8")), pos
    if major == 4:
        out = []
        if indefinite:
            while True:
                item, pos = _decode_item(data, pos, depth + 1)
                if item is _BREAK:
                    return out, pos
                out.append(item)
        for _ in range(arg):
            item, pos = _decode_item(data, pos, depth + 1)
            if item is _BREAK:
                raise ValueError("unexpected CBOR break in definite array")
            out.append(item)
        return out, pos
    if major == 5:
        out = {}
        n = None if indefinite else arg
        while True:
            if n is not None and len(out) == n:
                return out, pos
            k, pos = _decode_item(data, pos, depth + 1)
            if k is _BREAK:
                if indefinite:
                    return out, pos
                raise ValueError("unexpected CBOR break in definite map")
            if isinstance(k, (list, dict)):
                k = repr(k)  # unhashable keys surface deterministically
            v, pos = _decode_item(data, pos, depth + 1)
            if v is _BREAK:
                raise ValueError("CBOR map value missing before break")
            out[k] = v
    if major == 6:
        v, pos = _decode_item(data, pos, depth + 1)
        if v is _BREAK:
            raise ValueError("CBOR tag wraps a break")
        return ("__tag__", arg, v), pos
    # major 7: simple values and floats
    if ai == 20:
        return False, pos
    if ai == 21:
        return True, pos
    if ai == 22:
        return None, pos
    if ai == 23:
        return ("__simple__", 23), pos  # undefined
    if ai == 24:
        if arg < 32:
            raise ValueError("CBOR simple value < 32 in two-byte form")
        return ("__simple__", arg), pos
    if ai == 25:
        return _half_to_float(arg), pos
    if ai == 26:
        return struct.unpack(">f", arg.to_bytes(4, "big"))[0], pos
    if ai == 27:
        return struct.unpack(">d", arg.to_bytes(8, "big"))[0], pos
    return ("__simple__", ai), pos


def cbor_decode(data: bytes):
    """CBOR bytes -> Python value; trailing bytes reject."""
    v, pos = _decode_item(data, 0)
    if v is _BREAK:
        raise ValueError("CBOR break outside indefinite item")
    if pos != len(data):
        raise ValueError("trailing bytes after CBOR item")
    return v


# ------------------------------------------------------------ spark kernel

def cbor_roundtrip_stats(df, payload_col: str = "payload",
                         id_col: str = "doc_id"):
    """Per-row CBOR encode -> decode -> stats, Arrow-batched: each row
    builds a nested record (ints incl. negatives, text, bytes, float,
    arrays, a nested map), roundtrips it, and emits values the oracle
    replays from the fixture formula. Narrow map (widened when
    under-split). Output: (id, n_bytes, text_md5, n_items, neg_val,
    pi_ok)."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from modeltracking_spark.operators.kernel import widen_for_kernel

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("text_md5", StringType()),
            StructField("n_items", LongType()),
            StructField("neg_val", LongType()),
            StructField("pi_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, nbs, md5s, nits, negs, oks = [], [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                rec = {
                    "id": did,
                    "neg": -did - 1,
                    "text": text,
                    "raw": text.encode("utf-8")[:16],
                    "pi": 3.140625,  # exact in binary -> stable roundtrip
                    "tokens": list(range(did % 8)),
                    "meta": {"lang": "en", "ok": True, "none": None},
                }
                blob = cbor_encode(rec)
                back = cbor_decode(blob)
                if back != rec:
                    raise ValueError(f"CBOR roundtrip diverged for {did}")
                ids.append(did)
                nbs.append(len(blob))
                md5s.append(
                    hashlib.md5(back["text"].encode("utf-8")).hexdigest()
                )
                nits.append(len(back["tokens"]))
                negs.append(back["neg"])
                oks.append(back["pi"] == 3.140625)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bytes": nbs,
                    "text_md5": md5s,
                    "n_items": nits,
                    "neg_val": negs,
                    "pi_ok": oks,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        kernel, schema
    )
