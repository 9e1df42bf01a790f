"""From-spec tensor containers (round 12): safetensors
(operators/safetensors.py) validated by numpy bit-reinterpretation
and the reference implementation's offset-tiling invariants; NPY/NPZ
(operators/npyio.py) cross-validated BOTH directions against numpy
itself (np.load reads our blobs; our parser reads
np.save/np.savez/np.savez_compressed output); plus mutation fuzz
with typed rejects on both parsers."""

import io
import random

import numpy as np
import pytest

from modeltracking_spark.operators.npyio import (
    npy_array,
    npy_build,
    npy_parse,
    npz_build,
    npz_parse,
)
from modeltracking_spark.operators.safetensors import (
    safetensors_build,
    safetensors_parse,
    safetensors_tensor,
)


def test_safetensors_roundtrip_all_dtypes():
    rng = np.random.RandomState(1)
    emb = rng.randn(6, 9).astype(np.float32)
    ids = np.arange(6, dtype=np.int64)
    half = emb[0].astype(np.float16)
    bf = (emb[1].view(np.uint32) >> 16).astype("<u2").tobytes()
    mask = np.array([1, 0, 1, 1, 0, 1], dtype=np.uint8)
    blob = safetensors_build(
        [("emb", "F32", emb.shape, emb.tobytes()),
         ("ids", "I64", (6,), ids.tobytes()),
         ("half", "F16", (9,), half.tobytes()),
         ("bhalf", "BF16", (9,), bf),
         ("mask", "BOOL", (6,), mask.tobytes()),
         ("empty", "F64", (0,), b"")],
        metadata={"k": "v"})
    p = safetensors_parse(blob)
    assert p["metadata"] == {"k": "v"}
    assert np.array_equal(safetensors_tensor(blob, p, "emb"), emb)
    assert np.array_equal(safetensors_tensor(blob, p, "ids"), ids)
    assert np.array_equal(safetensors_tensor(blob, p, "half"), half)
    # bf16 widens to the float32 whose low mantissa bits are zero
    want = (emb[1].view(np.uint32) & 0xFFFF0000).view(np.float32)
    assert np.array_equal(safetensors_tensor(blob, p, "bhalf"), want)
    assert safetensors_tensor(blob, p, "mask").tolist() == [
        True, False, True, True, False, True]
    assert safetensors_tensor(blob, p, "empty").shape == (0,)


def test_safetensors_offset_tiling_rejects():
    """The reference implementation's invariant: offsets must tile
    the data region exactly — gaps, overlaps, short coverage, and
    byte-count/shape mismatches all reject loudly."""
    import json
    import struct

    base = safetensors_build(
        [("a", "F32", (2,), b"\x00" * 8),
         ("b", "F32", (2,), b"\x01" * 8)])

    def rebuild(mutate):
        (hlen,) = struct.unpack_from("<Q", base, 0)
        hdr = json.loads(base[8:8 + hlen])
        data = base[8 + hlen:]
        mutate(hdr)
        nb = json.dumps(hdr, separators=(",", ":")).encode()
        return struct.pack("<Q", len(nb)) + nb + data

    def set_off(name, s, e):
        def m(h):
            h[name]["data_offsets"] = [s, e]
        return m

    with pytest.raises(ValueError, match="gap or overlap"):
        safetensors_parse(rebuild(set_off("b", 4, 12)))  # overlap
    with pytest.raises(ValueError, match="bytes !="):
        safetensors_parse(rebuild(set_off("b", 8, 12)))  # short
    with pytest.raises(ValueError, match="offsets cover"):
        # drop one tensor: region no longer fully covered
        def drop(h):
            del h["b"]
        safetensors_parse(rebuild(drop))
    with pytest.raises(NotImplementedError, match="dtype"):
        def baddt(h):
            h["a"]["dtype"] = "F128"
        safetensors_parse(rebuild(baddt))
    with pytest.raises(ValueError, match="length"):
        safetensors_parse(struct.pack("<Q", 1 << 40) + b"{}")


def test_npy_npz_cross_validated_vs_numpy():
    """BOTH directions against the reference implementation: numpy
    loads our from-spec blobs; our parser loads numpy's own output
    (v1 headers, fortran_order, savez / savez_compressed)."""
    a = np.random.RandomState(2).randn(7, 5).astype("<f4")
    ids = np.arange(7, dtype="<i8")
    blob = npy_build("<f4", a.shape, a.tobytes())
    ref = np.load(io.BytesIO(blob))
    assert np.array_equal(ref, a) and ref.dtype == np.float32

    buf = io.BytesIO()
    np.save(buf, a)
    p = npy_parse(buf.getvalue())
    assert np.array_equal(npy_array(buf.getvalue(), p), a)

    buf2 = io.BytesIO()
    np.save(buf2, np.asfortranarray(a))
    p2 = npy_parse(buf2.getvalue())
    assert p2["fortran_order"]
    assert np.array_equal(npy_array(buf2.getvalue(), p2), a)

    z = npz_build([("emb", "<f4", a.shape, a.tobytes()),
                   ("ids", "<i8", (7,), ids.tobytes())])
    m = npz_parse(z)
    assert np.array_equal(npy_array(*m["emb"]), a)
    assert np.array_equal(npy_array(*m["ids"]), ids)
    refz = np.load(io.BytesIO(z))
    assert np.array_equal(refz["emb"], a)
    assert np.array_equal(refz["ids"], ids)

    for saver in (np.savez, np.savez_compressed):
        buf3 = io.BytesIO()
        saver(buf3, emb=a, ids=ids)
        m2 = npz_parse(buf3.getvalue())
        assert np.array_equal(npy_array(*m2["emb"]), a)
        assert np.array_equal(npy_array(*m2["ids"]), ids)


def test_npy_typed_rejects():
    with pytest.raises(ValueError, match="magic"):
        npy_parse(b"NOTNPY" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="version"):
        npy_parse(b"\x93NUMPY" + bytes([9, 0]) + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="descr"):
        npy_build("<c16", (1,), b"\x00" * 16)
    # object-dtype headers must NEVER evaluate: literal_eval rejects
    evil = (b"{'descr': '|O', 'fortran_order': False, "
            b"'shape': (1,), }")
    blob = (b"\x93NUMPY" + bytes([1, 0])
            + len(evil).to_bytes(2, "little") + evil)
    with pytest.raises((ValueError, NotImplementedError)):
        npy_parse(blob)
    with pytest.raises(ValueError, match="npz"):
        npz_parse(b"PK\x03\x04garbage-not-a-zip")


def test_tensorio_mutation_fuzz():
    """Both parsers under byte mutation: decode or the documented
    typed reject — never a leaked internal error."""
    a = np.random.RandomState(3).randn(40).astype("<f4")
    st = safetensors_build([("a", "F32", (40,), a.tobytes())],
                           metadata={"m": "1"})
    nz = npz_build([("a", "<f4", (40,), a.tobytes())])
    rng = random.Random(714)
    for base, parse in ((st, safetensors_parse), (nz, npz_parse)):
        for _ in range(250):
            b = bytearray(base)
            op = rng.randrange(3)
            if op == 0:
                for _ in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
            elif op == 1:
                b = b[:rng.randrange(len(b))]
            else:
                i = rng.randrange(len(b))
                b = (b[:i] + bytes(rng.randrange(256) for _ in
                                   range(rng.randrange(1, 9)))
                     + b[i:])
            try:
                parse(bytes(b))
            except (ValueError, NotImplementedError):
                pass
