"""From-spec CBOR (RFC 8949) pinned against the RFC's OWN Appendix A
test vectors — decode for every form, encode parity where the vector
is the canonical shortest form — plus indefinite-length items, all
three float widths, tags/simples, rejects, and corruption fuzz."""

import math

import pytest

from modeltracking_spark.operators.cbor import (
    cbor_decode,
    cbor_encode,
    cbor_tag,
)

# (hex, value) — RFC 8949 Appendix A, canonical-form subset: these
# roundtrip BOTH directions
_CANONICAL = [
    ("00", 0), ("01", 1), ("0a", 10), ("17", 23), ("1818", 24),
    ("1819", 25), ("1864", 100), ("1903e8", 1000),
    ("1a000f4240", 1000000), ("1b000000e8d4a51000", 1000000000000),
    ("1bffffffffffffffff", 18446744073709551615),
    ("20", -1), ("29", -10), ("3863", -100), ("3903e7", -1000),
    ("f4", False), ("f5", True), ("f6", None),
    ("40", b""), ("4401020304", bytes([1, 2, 3, 4])),
    ("60", ""), ("6161", "a"), ("6449455446", "IETF"),
    ("62225c", "\"\\"), ("62c3bc", "ü"), ("63e6b0b4", "水"),
    ("80", []), ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("a0", {}), ("a201020304", {1: 2, 3: 4}),
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ("826161a161626163", ["a", {"b": "c"}]),
    ("98190102030405060708090a0b0c0d0e0f101112131415161718181819",
     list(range(1, 26))),
]

# decode-only vectors: floats in half/single width (our encoder emits
# doubles), tags, simples, indefinite forms
_DECODE_ONLY = [
    ("f90000", 0.0), ("f93c00", 1.0), ("fb3ff199999999999a", 1.1),
    ("f93e00", 1.5), ("f97bff", 65504.0), ("fa47c35000", 100000.0),
    ("fa7f7fffff", 3.4028234663852886e38),
    ("fb7e37e43c8800759c", 1.0e300),
    ("f90001", 5.960464477539063e-8), ("f90400", 0.00006103515625),
    ("f9c400", -4.0), ("fbc010666666666666", -4.1),
    ("c11a514b67b0", ("__tag__", 1, 1363896240)),
    ("f0", ("__simple__", 16)), ("f8ff", ("__simple__", 255)),
    ("5f42010243030405ff", bytes([1, 2, 3, 4, 5])),
    ("7f657374726561646d696e67ff", "streaming"),
    ("9fff", []),
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    ("826161bf61626163ff", ["a", {"b": "c"}]),
]


@pytest.mark.parametrize("hexs,value", _CANONICAL)
def test_rfc_appendix_a_canonical_both_directions(hexs, value):
    assert cbor_decode(bytes.fromhex(hexs)) == value
    assert cbor_encode(value).hex() == hexs


@pytest.mark.parametrize("hexs,value", _DECODE_ONLY)
def test_rfc_appendix_a_decode_only(hexs, value):
    assert cbor_decode(bytes.fromhex(hexs)) == value


def test_float_specials_and_negative_zero():
    assert cbor_decode(bytes.fromhex("f97c00")) == math.inf
    assert cbor_decode(bytes.fromhex("f9fc00")) == -math.inf
    assert math.isnan(cbor_decode(bytes.fromhex("f97e00")))
    assert str(cbor_decode(bytes.fromhex("f98000"))) == "-0.0"
    assert cbor_tag(1, 1363896240).hex() == "c11a514b67b0"


def test_nested_roundtrip():
    rec = {
        "id": 42, "neg": -(2 ** 40), "s": "déjà vu 水",
        "raw": bytes(range(40)), "f": 0.15625, "flags": [True, False, None],
        "nested": {"a": [1, {"b": b"x"}], "n": -1},
    }
    assert cbor_decode(cbor_encode(rec)) == rec


def test_rejects():
    with pytest.raises(ValueError, match="truncated"):
        cbor_decode(b"")
    with pytest.raises(ValueError, match="truncated"):
        cbor_decode(bytes.fromhex("1903"))
    with pytest.raises(ValueError, match="reserved"):
        cbor_decode(bytes([0x1C]))  # additional info 28
    with pytest.raises(ValueError, match="break"):
        cbor_decode(b"\xff")
    with pytest.raises(ValueError, match="break"):
        cbor_decode(bytes.fromhex("8301ff03"))  # break in definite array
    with pytest.raises(ValueError, match="trailing"):
        cbor_decode(bytes.fromhex("0000"))
    with pytest.raises(ValueError, match="wrong type"):
        cbor_decode(bytes.fromhex("5f6161ff"))  # tstr chunk in bstr
    with pytest.raises(ValueError, match="simple value"):
        cbor_decode(bytes.fromhex("f810"))  # two-byte simple < 32
    with pytest.raises(ValueError, match="indefinite length invalid"):
        cbor_decode(bytes([0x1F]))  # indefinite uint
    deep = b"\x81" * 600 + b"\x00"
    with pytest.raises(ValueError, match="deep"):
        cbor_decode(deep)


def test_corruption_fuzz_typed_rejects():
    import random

    base = cbor_encode({
        "text": "fuzz target " * 10, "nums": list(range(40)),
        "blob": bytes(range(64)), "f": 2.5,
    })
    rng = random.Random(5)
    for _ in range(600):
        b = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(6)) + b[i:]
        try:
            cbor_decode(bytes(b))
        except (ValueError, UnicodeDecodeError, OverflowError):
            pass  # typed rejects (Overflow: half->float never; 8-byte
            # args feed int.from_bytes — kept for struct-level safety)


def test_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.integers(min_value=-(2 ** 64) + 1, max_value=2 ** 64 - 1),
        st.booleans(), st.none(), st.text(max_size=40),
        st.binary(max_size=40),
        st.floats(allow_nan=False, width=64),
    )
    values = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=6),
            st.dictionaries(st.text(max_size=8), inner, max_size=6),
        ),
        max_leaves=25,
    )

    @settings(max_examples=150, deadline=None)
    @given(values)
    def run(v):
        assert cbor_decode(cbor_encode(v)) == v

    run()
