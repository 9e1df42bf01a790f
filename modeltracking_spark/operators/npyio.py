"""From-spec NumPy ``.npy`` / ``.npz`` container codec (the NEP-1
"NPY format" public specification): magic ``\\x93NUMPY``, one-byte
major/minor version, a 2- or 4-byte little-endian header length, an
ASCII/UTF-8 python-dict-literal header with exactly the keys
``descr`` / ``fortran_order`` / ``shape`` (padded with spaces to a
64-byte boundary, newline-terminated), then the raw array bytes.
``.npz`` is a plain ZIP of ``<name>.npy`` members (STORED or
DEFLATE).  Nothing delegates to ``np.save``/``np.load``: the header
is emitted and parsed here (``ast.literal_eval`` on the dict literal
— never ``eval``), dtypes come from an explicit allow-list, and the
ZIP walking uses the stdlib ``zipfile``/``zlib`` (reference
implementations) like the archive tier.

Engine role: tensor interchange plumbing for the multimodal tier,
the same posture as operators/safetensors.py — blobs are built and
parsed executor-side inside Arrow batches; only bounded summaries
shuffle."""

from __future__ import annotations

import ast
import io
import struct
import zipfile

#: descr allow-list -> numpy dtype (little-endian / endian-free)
DESCRS = {
    "<f8": "<f8", "<f4": "<f4", "<f2": "<f2",
    "<i8": "<i8", "<i4": "<i4", "<i2": "<i2",
    "|i1": "<i1", "|u1": "<u1", "|b1": "<u1",
}

_MAGIC = b"\x93NUMPY"


def npy_build(descr: str, shape: tuple, raw: bytes,
              fortran_order: bool = False) -> bytes:
    """Serialize one array (raw little-endian bytes) as NPY v1."""
    if descr not in DESCRS:
        raise NotImplementedError(f"npy descr {descr!r} not supported")
    itemsize = int(descr[2])
    n = 1
    for d in shape:
        if d < 0:
            raise ValueError(f"negative dim in shape {shape}")
        n *= d
    if len(raw) != n * itemsize:
        raise ValueError(f"{len(raw)} bytes != {n} x {itemsize} for "
                         f"shape {tuple(shape)}")
    shape_s = ("(%d,)" % shape[0] if len(shape) == 1
               else "(" + ", ".join(str(d) for d in shape) + ")")
    hdr = ("{'descr': '%s', 'fortran_order': %s, 'shape': %s, }"
           % (descr, bool(fortran_order), shape_s)).encode("ascii")
    # pad so that magic+version+len+header is a multiple of 64,
    # newline-terminated (the spec's alignment rule)
    base = len(_MAGIC) + 2 + 2
    pad = (-(base + len(hdr) + 1)) % 64
    hdr += b" " * pad + b"\n"
    if len(hdr) > 0xFFFF:
        raise ValueError("npy v1 header overflow")
    return (_MAGIC + bytes([1, 0])
            + struct.pack("<H", len(hdr)) + hdr + raw)


def npy_parse(blob: bytes) -> dict:
    """Parse one .npy blob -> {"descr", "shape", "fortran_order",
    "data_start"}; typed rejects for unknown versions/descrs and
    malformed headers (the dict literal goes through
    ast.literal_eval — never eval)."""
    if blob[:6] != _MAGIC:
        raise ValueError("missing NPY magic")
    if len(blob) < 10:
        raise ValueError("truncated NPY preamble")
    major = blob[6]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", blob, 8)
        hstart = 10
    elif major in (2, 3):
        if len(blob) < 12:
            raise ValueError("truncated NPY v2 preamble")
        (hlen,) = struct.unpack_from("<I", blob, 8)
        hstart = 12
    else:
        raise NotImplementedError(f"npy version {major} not supported")
    if hstart + hlen > len(blob):
        raise ValueError("NPY header overruns the blob")
    try:
        header = ast.literal_eval(
            blob[hstart:hstart + hlen].decode("utf-8").strip())
    except (UnicodeDecodeError, ValueError, SyntaxError) as exc:
        raise ValueError(f"malformed NPY header: {exc}") from None
    if (not isinstance(header, dict)
            or set(header) != {"descr", "fortran_order", "shape"}):
        raise ValueError("NPY header must carry exactly descr/"
                         "fortran_order/shape")
    descr = header["descr"]
    if descr not in DESCRS:
        raise NotImplementedError(f"npy descr {descr!r} not supported")
    shape = header["shape"]
    if (not isinstance(shape, tuple)
            or not all(isinstance(d, int) and d >= 0 for d in shape)):
        raise ValueError(f"bad NPY shape {shape!r}")
    itemsize = int(descr[2])
    n = 1
    for d in shape:
        n *= d
    if hstart + hlen + n * itemsize > len(blob):
        raise ValueError("NPY data overruns the blob")
    return {"descr": descr, "shape": shape,
            "fortran_order": bool(header["fortran_order"]),
            "data_start": hstart + hlen}


def npy_array(blob: bytes, parsed: dict):
    """The parsed blob's payload as a numpy array (C order; a
    fortran_order blob is transposed into the declared shape)."""
    import numpy as np

    itemsize = int(parsed["descr"][2])
    n = 1
    for d in parsed["shape"]:
        n *= d
    raw = blob[parsed["data_start"]:
               parsed["data_start"] + n * itemsize]
    arr = np.frombuffer(raw, dtype=DESCRS[parsed["descr"]])
    if parsed["fortran_order"]:
        return arr.reshape(tuple(reversed(parsed["shape"]))).T
    return arr.reshape(parsed["shape"])


def npz_build(arrays: list[tuple], compress: bool = True) -> bytes:
    """``[(name, descr, shape, raw), ...]`` -> one .npz (ZIP of
    ``<name>.npy`` members; DEFLATE via stdlib zlib when
    ``compress``)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, descr, shape, raw in arrays:
            zf.writestr(f"{name}.npy", npy_build(descr, shape, raw))
    return buf.getvalue()


def npz_parse(blob: bytes) -> dict:
    """.npz -> {name: (npy_blob, parsed)} with each member going
    through the from-spec NPY parser."""
    import zlib

    out = {}
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            for info in zf.infolist():
                name = info.filename
                if not name.endswith(".npy"):
                    raise ValueError(
                        f"non-npy member {name!r} in npz")
                member = zf.read(info)
                out[name[:-4]] = (member, npy_parse(member))
    except (zipfile.BadZipFile, zlib.error, EOFError, OSError,
            struct.error, NotImplementedError) as exc:
        # zipfile surfaces deflate corruption as zlib.error and
        # unsupported compression methods as NotImplementedError —
        # normalize everything container-level to the typed reject
        if isinstance(exc, NotImplementedError) and "descr" in str(exc):
            raise
        raise ValueError(f"malformed npz container: {exc}") from None
    return out
