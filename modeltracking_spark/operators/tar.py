"""POSIX ustar tar-archive walker — the container inside `.tar.zst` /
`.tar.gz` corpus bundles.

The tar format is public (POSIX.1-1988/2001 "ustar"): 512-byte header
blocks (name, octal size/mtime/checksum, typeflag, ustar magic,
prefix), file data rounded up to 512-byte blocks, two zero blocks as
the end-of-archive marker.  The walker yields typed member rows and
verifies every header checksum (the unsigned-sum rule: checksum field
treated as spaces).  GNU long-name records (typeflag 'L') are resolved
so members keep their full paths; other extensions raise the
documented loud reject.

Paired with the from-spec decompressors this gives the engine a pure
from-spec path through the standard corpus bundle stack:
``.tar.zst`` -> operators/zstd.py -> this walker -> member rows, and
likewise ``.tar.gz`` via operators/inflate.py.
"""

from __future__ import annotations

_BLOCK = 512


def _octal(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip(b" \x00")
    if not s:
        return 0
    if s[0] & 0x80:  # GNU base-256 (binary) size extension
        raise ValueError("tar base-256 numeric fields not supported")
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"bad octal field in tar header: {field!r}") from exc


def parse_tar(data: bytes) -> list[dict]:
    """All members of an uncompressed tar byte string: dicts with
    name, size, mtime, typeflag, body (regular files only carry
    bodies), each header checksum verified."""
    out = []
    pos = 0
    pending_name = None
    while pos + _BLOCK <= len(data):
        hdr = data[pos:pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            # end-of-archive: two zero blocks (tolerate padding after)
            return out
        want = _octal(hdr[148:156])
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if summed != want:
            raise ValueError(
                f"tar header checksum mismatch at offset {pos}"
            )
        magic = hdr[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise ValueError("tar header missing ustar magic")
        size = _octal(hdr[124:136])
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        body_start = pos + _BLOCK
        body_end = body_start + size
        if body_end > len(data):
            raise ValueError("tar member body overruns the archive")
        pos = body_start + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        if typeflag == "L":  # GNU long name: body is the next name
            pending_name = data[body_start:body_end].rstrip(b"\x00").decode(
                "utf-8", "replace"
            )
            continue
        if typeflag in ("x", "g"):
            raise ValueError(
                "pax extended headers not supported — the pax plug-in point"
            )
        name = pending_name
        pending_name = None
        if name is None:
            prefix = hdr[345:500].split(b"\x00", 1)[0].decode(
                "utf-8", "replace"
            )
            base = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
            name = f"{prefix}/{base}" if prefix else base
        out.append(
            {
                "name": name,
                "size": size,
                "mtime": _octal(hdr[136:148]),
                "typeflag": typeflag,
                "body": data[body_start:body_end] if typeflag in ("0",)
                else b"",
            }
        )
    raise ValueError("tar archive missing end-of-archive marker")


def build_tar(members: list[tuple[str, bytes, int]]) -> bytes:
    """Spec-shaped ustar writer for fixtures: (name, body, mtime)."""
    out = bytearray()
    for name, body, mtime in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("fixture writer keeps names <= 100 bytes")
        hdr = bytearray(_BLOCK)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(body):011o}\x00".encode()
        hdr[136:148] = f"{mtime:011o}\x00".encode()
        hdr[148:156] = b" " * 8  # checksum placeholder
        hdr[156] = ord("0")
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}\x00 ".encode()
        out += hdr
        out += body
        pad = (-len(body)) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def tar_zst_scan_stats(df, payload_col: str = "payload",
                       id_col: str = "doc_id"):
    """Per-row .tar.zst bundle scan: decompress with the from-spec
    zstd decoder, walk members with the from-spec tar parser, emit
    per-bundle stats — the end-to-end corpus-bundle ingest loop with
    no library anywhere. Output: (id, n_members, total_bytes,
    text_md5, names_ok)."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from modeltracking_spark.operators.kernel import widen_for_kernel
    from modeltracking_spark.operators.zstd import zstd_decompress

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_members", LongType()),
            StructField("total_bytes", LongType()),
            StructField("text_md5", StringType()),
            StructField("names_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, nm, tb, md5s, oks = [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                members = parse_tar(zstd_decompress(bytes(payload)))
                did = int(did)
                text = b"".join(
                    m["body"] for m in members if m["name"].endswith(".txt")
                )
                ids.append(did)
                nm.append(len(members))
                tb.append(sum(m["size"] for m in members))
                md5s.append(hashlib.md5(text).hexdigest())
                oks.append(all(
                    m["name"].startswith(f"bundle-{did}/") for m in members
                ))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_members": nm,
                    "total_bytes": tb,
                    "text_md5": md5s,
                    "names_ok": oks,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        kernel, schema
    )
