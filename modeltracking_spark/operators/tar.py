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


def _parse_pax_records(body: bytes) -> dict[str, str]:
    """pax extended-header body -> {keyword: value} (POSIX.1-2001
    ``pax`` Interchange Format: repeated ``"%d %s=%s\\n" % (length,
    keyword, value)`` records where length counts the WHOLE record
    including its own digits, the space, and the newline)."""
    recs: dict[str, str] = {}
    pos = 0
    while pos < len(body):
        sp = body.find(b" ", pos)
        if sp < 0:
            raise ValueError("pax record missing length delimiter")
        try:
            length = int(body[pos:sp])
        except ValueError:
            raise ValueError("pax record length is not decimal")
        if length <= sp - pos + 1 or pos + length > len(body):
            raise ValueError("pax record length out of range")
        rec = body[pos:pos + length]
        if rec[-1:] != b"\n":
            raise ValueError("pax record missing trailing newline")
        kv = rec[sp - pos + 1:-1]
        eq = kv.find(b"=")
        if eq < 0:
            raise ValueError("pax record missing '='")
        recs[kv[:eq].decode("utf-8")] = kv[eq + 1:].decode("utf-8")
        pos += length
    return recs


def parse_tar(data: bytes) -> list[dict]:
    """All members of an uncompressed tar byte string: dicts with
    name, size, mtime, typeflag, body (regular files only carry
    bodies), each header checksum verified.

    pax extended headers (POSIX.1-2001): typeflag ``x`` records
    override the NEXT member's name/size/mtime (``path``, ``size``,
    ``mtime`` keywords — ``size`` is how archives carry >8 GiB members
    past the 11-digit octal field, ``path`` carries UTF-8 and >100-char
    names); typeflag ``g`` sets global defaults for all subsequent
    members. GNU long-name records (typeflag ``L``) are still handled;
    a pax ``path`` wins over both."""
    out = []
    pos = 0
    pending_name = None
    pax_global: dict[str, str] = {}
    pax_next: dict[str, str] = {}
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
        if typeflag not in ("x", "g", "L"):
            # a pax 'size' override governs THIS member's body extent
            pax = {**pax_global, **pax_next}
            if "size" in pax:
                size = int(pax["size"])
                if size < 0:
                    raise ValueError("negative pax size override")
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
            recs = _parse_pax_records(data[body_start:body_end])
            if typeflag == "x":
                pax_next.update(recs)
            else:
                pax_global.update(recs)
            continue
        name = pax.get("path", pending_name)
        pending_name = None
        pax_next = {}
        if name is None:
            prefix = hdr[345:500].split(b"\x00", 1)[0].decode(
                "utf-8", "replace"
            )
            base = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
            name = f"{prefix}/{base}" if prefix else base
        mtime = _octal(hdr[136:148])
        if "mtime" in pax:
            mtime = int(float(pax["mtime"]))  # pax mtime may be fractional
        out.append(
            {
                "name": name,
                "size": size,
                "mtime": mtime,
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


def _pax_record(key: str, value: str) -> bytes:
    """One pax record: the length field counts itself, so iterate
    until the decimal width stabilizes (the spec's own algorithm)."""
    kv = f" {key}={value}\n".encode("utf-8")
    n = len(kv)
    length = n + len(str(n))
    length = n + len(str(length))  # width can grow by one digit
    return str(length).encode() + kv


def build_tar_pax(members: list[tuple[str, bytes, int]]) -> bytes:
    """pax-format tar writer for fixtures: every member gets an ``x``
    extended header carrying ``path`` (UTF-8, any length), ``size``,
    and ``mtime`` — the modern-GNU-tar shape — with a short fallback
    ustar header following it. Parseable by stdlib tarfile and
    :func:`parse_tar` alike."""
    out = bytearray()

    def _hdr(name_bytes: bytes, size: int, mtime: int, flag: str) -> bytes:
        hdr = bytearray(_BLOCK)
        hdr[0:len(name_bytes)] = name_bytes
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{size:011o}\x00".encode()
        hdr[136:148] = f"{mtime:011o}\x00".encode()
        hdr[148:156] = b" " * 8
        hdr[156] = ord(flag)
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}\x00 ".encode()
        return bytes(hdr)

    for i, (name, body, mtime) in enumerate(members):
        pax_body = (
            _pax_record("path", name)
            + _pax_record("size", str(len(body)))
            + _pax_record("mtime", f"{mtime}.0")
        )
        fallback = f"PaxHeaders.0/{i}".encode("ascii")[:100]
        out += _hdr(fallback, len(pax_body), mtime, "x")
        out += pax_body + b"\x00" * ((-len(pax_body)) % _BLOCK)
        short = name.encode("utf-8")[:100].decode("utf-8", "ignore")
        out += _hdr(short.encode("utf-8")[:100], len(body), mtime, "0")
        out += body + b"\x00" * ((-len(body)) % _BLOCK)
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
