"""From-spec safetensors codec — the LLM ecosystem's tensor-storage
format (huggingface/safetensors, public format documentation): an
8-byte little-endian header length, a JSON header mapping tensor
names to ``{"dtype", "shape", "data_offsets"}`` (offsets relative to
the end of the header; an optional ``__metadata__`` string map), and
the raw little-endian tensor bytes.  Nothing is delegated to the
safetensors library: header framing, dtype table, offset validation
(contiguous, non-overlapping, covering the data region exactly — the
reference implementation's invariant), and BF16 widening are all
implemented here.

Engine role: multimodal/tensor PLUMBING — embeddings and model
activations travel between pipeline stages as safetensors blobs in
binary columns, built and parsed executor-side inside Arrow batches
(the same posture as the image/audio codec tier).  At 100 TB the
blobs stay on executors; only bounded per-tensor summaries shuffle.

Validation: numpy reinterpretation closes the loop bit-exactly
(tests/test_safetensors.py), and the registered query's outputs
re-derive from the parsed tensors with integer arithmetic so the
DuckDB oracle hash proves the decode (queries/extras_q.py).
"""

from __future__ import annotations

import json
import struct

#: dtype -> (itemsize, numpy dtype string); BF16 widens via uint16
DTYPES = {
    "F64": (8, "<f8"),
    "F32": (4, "<f4"),
    "F16": (2, "<f2"),
    "BF16": (2, None),  # no native numpy LE bf16 — widened manually
    "I64": (8, "<i8"),
    "I32": (4, "<i4"),
    "I16": (2, "<i2"),
    "I8": (1, "<i1"),
    "U8": (1, "<u1"),
    "BOOL": (1, "<u1"),
}

_MAX_HEADER = 100 << 20  # the reference implementation's 100 MB cap


def safetensors_build(tensors: list[tuple], metadata: dict | None = None,
                      ) -> bytes:
    """Serialize ``[(name, dtype, shape, raw_le_bytes), ...]`` (data
    laid out in list order) into one safetensors blob."""
    header: dict = {}
    if metadata is not None:
        if not all(isinstance(k, str) and isinstance(v, str)
                   for k, v in metadata.items()):
            raise ValueError(
                "safetensors __metadata__ must be a string map")
        header["__metadata__"] = dict(metadata)
    off = 0
    payload = bytearray()
    for name, dtype, shape, raw in tensors:
        if name in header or name == "__metadata__":
            raise ValueError(f"duplicate tensor name {name!r}")
        if dtype not in DTYPES:
            raise NotImplementedError(
                f"safetensors dtype {dtype!r} not supported")
        size, _np = DTYPES[dtype]
        n = 1
        for d in shape:
            if d < 0:
                raise ValueError(f"negative dim in shape {shape}")
            n *= d
        if len(raw) != n * size:
            raise ValueError(
                f"tensor {name!r}: {len(raw)} bytes != "
                f"{n} x {size} for shape {tuple(shape)}")
        header[name] = {"dtype": dtype, "shape": list(shape),
                        "data_offsets": [off, off + len(raw)]}
        payload += raw
        off += len(raw)
    blob = json.dumps(header, separators=(",", ":")).encode("utf-8")
    return struct.pack("<Q", len(blob)) + blob + bytes(payload)


def safetensors_parse(blob: bytes) -> dict:
    """Parse + validate one blob -> ``{"tensors": {name: {dtype,
    shape, start, end}}, "metadata": {...}, "data_start": int}``.
    Enforces the reference implementation's invariants: bounded
    header, JSON object, known dtypes, byte counts matching shapes,
    and offsets that tile the data region contiguously in ascending
    order with no gaps or overlaps."""
    if len(blob) < 8:
        raise ValueError("safetensors blob shorter than its length "
                         "prefix")
    (hlen,) = struct.unpack_from("<Q", blob, 0)
    if hlen > _MAX_HEADER or 8 + hlen > len(blob):
        raise ValueError(f"implausible safetensors header length "
                         f"{hlen}")
    try:
        header = json.loads(blob[8:8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise ValueError(f"malformed safetensors header: {exc}") \
            from None
    if not isinstance(header, dict):
        raise ValueError("safetensors header must be a JSON object")
    data_start = 8 + hlen
    data_len = len(blob) - data_start
    metadata = header.pop("__metadata__", {})
    if not isinstance(metadata, dict) or not all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in metadata.items()):
        raise ValueError("safetensors __metadata__ must be a string "
                         "map")
    tensors: dict = {}
    spans = []
    for name, info in header.items():
        if (not isinstance(info, dict)
                or not isinstance(info.get("shape"), list)
                or not isinstance(info.get("data_offsets"), list)
                or len(info["data_offsets"]) != 2):
            raise ValueError(f"malformed tensor entry {name!r}")
        dtype = info.get("dtype")
        if dtype not in DTYPES:
            raise NotImplementedError(
                f"safetensors dtype {dtype!r} not supported")
        size, _np = DTYPES[dtype]
        n = 1
        for d in info["shape"]:
            if not isinstance(d, int) or d < 0:
                raise ValueError(
                    f"bad shape {info['shape']} for {name!r}")
            n *= d
        s, e = info["data_offsets"]
        if (not isinstance(s, int) or not isinstance(e, int)
                or s < 0 or e < s or e > data_len):
            raise ValueError(
                f"tensor {name!r} offsets [{s}, {e}) out of bounds")
        if e - s != n * size:
            raise ValueError(
                f"tensor {name!r}: {e - s} bytes != {n} x {size} "
                f"for shape {tuple(info['shape'])}")
        tensors[name] = {"dtype": dtype,
                         "shape": tuple(info["shape"]),
                         "start": data_start + s,
                         "end": data_start + e}
        spans.append((s, e))
    # the reference implementation's tiling invariant
    spans.sort()
    pos = 0
    for s, e in spans:
        if s != pos:
            raise ValueError(
                "safetensors offsets leave a gap or overlap at byte "
                f"{pos}")
        pos = e
    if pos != data_len:
        raise ValueError(
            f"safetensors data region is {data_len} bytes but "
            f"offsets cover {pos}")
    return {"tensors": tensors, "metadata": metadata,
            "data_start": data_start}


def safetensors_tensor(blob: bytes, parsed: dict, name: str):
    """One tensor as a numpy array (zero-copy view where the dtype
    allows; BF16 widens to float32 via the public bit layout —
    bf16 is the high 16 bits of an IEEE float32)."""
    import numpy as np

    info = parsed["tensors"].get(name)
    if info is None:
        raise ValueError(f"no tensor {name!r} in this blob")
    raw = blob[info["start"]:info["end"]]
    size, np_dt = DTYPES[info["dtype"]]
    if info["dtype"] == "BF16":
        u16 = np.frombuffer(raw, dtype="<u2").astype(np.uint32) << 16
        arr = u16.view(np.float32)
    elif info["dtype"] == "BOOL":
        arr = np.frombuffer(raw, dtype="<u1").astype(bool)
    else:
        arr = np.frombuffer(raw, dtype=np_dt)
    return arr.reshape(info["shape"])
