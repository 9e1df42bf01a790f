"""From-spec Apache ORC v1 READER — postscript/footer protobuf, stripe
streams, RLEv1/RLEv2, dictionary strings — for flat columns.

Implemented from the public ORC v1 specification
(orc.apache.org/specification/ORCv1) like the parquet sibling:

- **Tail layout**: ``...stripes...[metadata][footer][postscript]<1-byte
  postscript length>``.  Planning reads the TAIL only.
- **Protobuf**: ORC metadata is protobuf (wire types 0/1/2/5, LEB128
  varints, packed repeated ints); a small generic walker parses
  messages into ``{field: [raw]}`` and typed extractors interpret the
  fields the spec defines (PostScript, Footer, StripeInformation,
  Type, StripeFooter, Stream, ColumnEncoding).
- **Compression framing**: every compressed entity is a chunk
  sequence — 3-byte LE header ``(length << 1) | is_original`` — with
  the payload decoded by THIS repo's from-spec codecs: ZLIB (raw
  deflate, `operators/inflate.py`), SNAPPY, LZ4, ZSTD, and — round 15,
  the codec family complete — legacy LZO (LZO1X state machine,
  `operators/lzo.py`); NONE passes through.
- **Run-length encodings**: byte RLE (tinyint + the bit-packed
  MSB-first boolean/PRESENT streams), integer RLEv1 (run/literal
  varints), and the four RLEv2 sub-encodings — SHORT_REPEAT, DIRECT,
  PATCHED_BASE (sign-magnitude base, gap+patch list re-attaching high
  bits), DELTA (signed base + delta-base direction, fixed or
  bit-packed deltas) — with the 5-bit closest-fixed-bits width table.
- **Columns**: boolean, tinyint, smallint/int/bigint, float, double,
  string/varchar/char and binary in both DIRECT_V2 (lengths + bytes)
  and DICTIONARY_V2 (RLEv2 indices into a sorted dictionary), date
  (epoch days), each with an optional PRESENT stream.  Timestamps,
  decimals, and nested types are documented loud rejects.

Cross-validated row-for-row against pyarrow.orc (the reference ORC
C++ writer) and Spark's own native ORC writer in
tests/test_orc_native.py.  Spark integration:
``sources/orc_native_source.py`` (one InputPartition per stripe —
the format's parallel-read unit — footer-only planning).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# protobuf walker
# ---------------------------------------------------------------------------


def _pb_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated protobuf varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("protobuf varint too long")


def pb_message(data: bytes) -> dict:
    """Generic message -> {field_number: [raw values]} where varints
    come back as ints, length-delimited as bytes, fixed as bytes."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(data):
        key, pos = _pb_varint(data, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _pb_varint(data, pos)
        elif wt == 1:
            v = data[pos:pos + 8]
            if len(v) != 8:
                raise ValueError("truncated fixed64")
            pos += 8
        elif wt == 2:
            ln, pos = _pb_varint(data, pos)
            if ln < 0 or pos + ln > len(data):
                raise ValueError("protobuf bytes overrun the message")
            v = data[pos:pos + ln]
            pos += ln
        elif wt == 5:
            v = data[pos:pos + 4]
            if len(v) != 4:
                raise ValueError("truncated fixed32")
            pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        out.setdefault(field, []).append(v)
    return out


def _pb_packed_uints(raws: list) -> list[int]:
    """A repeated uint field may arrive packed (bytes) or unpacked
    (ints) — normalize to a flat int list."""
    out: list[int] = []
    for r in raws:
        if isinstance(r, int):
            out.append(r)
        else:
            pos = 0
            while pos < len(r):
                v, pos = _pb_varint(r, pos)
                out.append(v)
    return out


# ---------------------------------------------------------------------------
# metadata model
# ---------------------------------------------------------------------------

_COMP = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4",
         5: "ZSTD"}
_KINDS = {0: "BOOLEAN", 1: "BYTE", 2: "SHORT", 3: "INT", 4: "LONG",
          5: "FLOAT", 6: "DOUBLE", 7: "STRING", 8: "BINARY",
          9: "TIMESTAMP", 10: "LIST", 11: "MAP", 12: "STRUCT",
          13: "UNION", 14: "DECIMAL", 15: "DATE", 16: "VARCHAR",
          17: "CHAR", 18: "TIMESTAMP_INSTANT"}
_STREAM_KINDS = {0: "PRESENT", 1: "DATA", 2: "LENGTH",
                 3: "DICTIONARY_DATA", 4: "DICTIONARY_COUNT",
                 5: "SECONDARY", 6: "ROW_INDEX", 7: "BLOOM_FILTER",
                 8: "BLOOM_FILTER_UTF8"}
_ENCODINGS = {0: "DIRECT", 1: "DICTIONARY", 2: "DIRECT_V2",
              3: "DICTIONARY_V2"}


def _malformed_guard(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except (ValueError, NotImplementedError):
            raise
        except (struct.error, IndexError, KeyError, TypeError,
                AttributeError, OverflowError, ZeroDivisionError,
                MemoryError) as exc:
            raise ValueError(
                f"malformed ORC: {type(exc).__name__}: {exc}") from exc
    return wrapped


def decompress_entity(data: bytes, codec: str,
                      block_size: int = 1 << 18) -> bytes:
    """Un-frame one compressed entity: 3-byte LE chunk headers,
    LSB = is_original (stored)."""
    if codec == "NONE":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data):
        if pos + 3 > len(data):
            raise ValueError("truncated ORC chunk header")
        h = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        orig = h & 1
        ln = h >> 1
        if pos + ln > len(data):
            raise ValueError("ORC chunk overruns the entity")
        body = data[pos:pos + ln]
        pos += ln
        if orig:
            out += body
            continue
        if codec == "ZLIB":  # raw deflate
            from modeltracking_spark.operators.inflate import inflate

            plain, _end = inflate(body, 0)
        elif codec == "SNAPPY":
            from modeltracking_spark.operators.snappy import (
                snappy_block_decompress,
            )

            plain = snappy_block_decompress(body)
        elif codec == "LZ4":
            from modeltracking_spark.operators.lz4 import (
                lz4_block_decompress,
            )

            plain = lz4_block_decompress(body, max_out=block_size)
        elif codec == "ZSTD":
            from modeltracking_spark.operators.zstd import (
                zstd_decompress,
            )

            plain = zstd_decompress(body, max_output=block_size)
        elif codec == "LZO":
            from modeltracking_spark.operators.lzo import (
                lzo1x_decompress,
            )

            plain = lzo1x_decompress(body, max_out=block_size)
        else:
            raise NotImplementedError(
                f"ORC compression {codec} not supported")
        out += plain
    return bytes(out)


def _unzig(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


_M64 = (1 << 64) - 1


def murmur3_hash64(data: bytes, seed: int = 104729) -> int:
    """The 64-bit Murmur3 variant ORC-java's bloom filters hash with
    (single x64 lane, DEFAULT_SEED 104729) — public algorithm, ORC
    spec 'Bloom Filters' section.  Returns a SIGNED 64-bit value
    (java long semantics, which the position math depends on)."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    h = seed & _M64
    n = len(data)
    nblocks = n // 8
    for i in range(nblocks):
        k = int.from_bytes(data[8 * i:8 * i + 8], "little")
        k = (k * c1) & _M64
        k = ((k << 31) | (k >> 33)) & _M64
        k = (k * c2) & _M64
        h ^= k
        h = ((h << 27) | (h >> 37)) & _M64
        h = (h * 5 + 0x52DCE729) & _M64
    tail = data[8 * nblocks:]
    if tail:
        k = 0
        for i in range(len(tail) - 1, -1, -1):
            k = (k << 8) | tail[i]
        k = (k * c1) & _M64
        k = ((k << 31) | (k >> 33)) & _M64
        k = (k * c2) & _M64
        h ^= k
    h ^= n
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h - (1 << 64) if h >> 63 else h


def orc_bloom_maybe(bitset_longs: list[int], n_funcs: int,
                    h64: int) -> bool:
    """Hive/ORC BloomFilter membership: k positions derived from the
    64-bit hash split into two java ints, ``combined = hash1 +
    i*hash2`` (32-bit signed, ~ on negative), modulo the bit count."""
    nbits = len(bitset_longs) * 64
    if nbits == 0 or n_funcs <= 0:
        return True
    hash1 = h64 & 0xFFFFFFFF
    if hash1 >> 31:
        hash1 -= 1 << 32
    hash2 = (h64 >> 32) & 0xFFFFFFFF
    if hash2 >> 31:
        hash2 -= 1 << 32
    for i in range(1, n_funcs + 1):
        combined = (hash1 + i * hash2) & 0xFFFFFFFF
        if combined >> 31:
            combined = (combined - (1 << 32))
            combined = ~combined
        pos = combined % nbits
        if not (bitset_longs[pos >> 6] >> (pos & 63)) & 1:
            return False
    return True


def read_bloom_index(fh, footer: dict, stripe: dict,
                     cid: int) -> list | None:
    """Parse one stripe's BLOOM_FILTER_UTF8 (or legacy BLOOM_FILTER)
    stream for column ``cid`` into ``[(n_funcs, bitset_longs), ...]``
    — one entry per row group within the stripe.  None when the
    stripe carries no bloom for that column.  Two ranged reads
    (stripe footer + the stream's byte range)."""
    codec, bs = footer["codec"], footer["block_size"]
    fh.seek(stripe["offset"] + stripe["index_length"]
            + stripe["data_length"])
    sfoot = pb_message(decompress_entity(
        fh.read(stripe["footer_length"]), codec, bs))
    off = 0
    found = None
    for s in sfoot.get(1) or []:
        m = pb_message(s)
        kind = _STREAM_KINDS.get((m.get(1) or [0])[0], "?")
        col = (m.get(2) or [0])[0]
        ln = (m.get(3) or [0])[0]
        if col == cid and kind in ("BLOOM_FILTER_UTF8",
                                   "BLOOM_FILTER"):
            found = (off, ln, kind)
            # prefer the UTF8 variant when both exist
            if kind == "BLOOM_FILTER_UTF8":
                break
        off += ln
    if found is None:
        return None
    off, ln, kind = found
    fh.seek(stripe["offset"] + off)
    plain = decompress_entity(fh.read(ln), codec, bs)
    idx = pb_message(plain)
    out = []
    for bf_raw in idx.get(1) or []:
        bf = pb_message(bf_raw)
        k = (bf.get(1) or [0])[0]
        if 3 in bf:  # utf8bitset: little-endian longs as bytes
            raw = bf[3][0]
            if len(raw) % 8:
                raise ValueError("ORC utf8bitset not long-aligned")
            longs = [int.from_bytes(raw[j:j + 8], "little")
                     for j in range(0, len(raw), 8)]
        else:  # legacy repeated fixed64
            longs = [int.from_bytes(x, "little")
                     for x in bf.get(2) or []]
        out.append((k, longs))
    return out


def _decode_col_stats(cs: dict) -> dict:
    """orc_proto ColumnStatistics -> {"n", "has_null", "min", "max"}.
    IntegerStatistics/DateStatistics min/max are sint (zigzag),
    DoubleStatistics are fixed64 doubles, StringStatistics are UTF-8
    bytes (surfaced as str).  Unknown/absent stats simply omit
    min/max — consumers must treat that as 'cannot prune'."""
    out = {"n": (cs.get(1) or [0])[0],
           "has_null": bool((cs.get(10) or [0])[0])}

    def put(lo, hi):
        if lo is not None:
            out["min"] = lo
        if hi is not None:
            out["max"] = hi

    if 2 in cs:  # IntegerStatistics
        m = pb_message(cs[2][0])
        put(_unzig(m[1][0]) if 1 in m else None,
            _unzig(m[2][0]) if 2 in m else None)
    elif 3 in cs:  # DoubleStatistics
        m = pb_message(cs[3][0])
        put(struct.unpack("<d", m[1][0])[0] if 1 in m else None,
            struct.unpack("<d", m[2][0])[0] if 2 in m else None)
    elif 4 in cs:  # StringStatistics
        m = pb_message(cs[4][0])
        put(m[1][0].decode("utf-8") if 1 in m else None,
            m[2][0].decode("utf-8") if 2 in m else None)
    elif 5 in cs:  # BucketStatistics: count of true
        m = pb_message(cs[5][0])
        trues = _pb_packed_uints(m.get(1) or [])
        if trues:
            out["true_count"] = trues[0]
    elif 6 in cs:  # DecimalStatistics (bounds travel as strings)
        from decimal import Decimal, InvalidOperation

        m = pb_message(cs[6][0])
        try:
            put(Decimal(m[1][0].decode("ascii")) if 1 in m else None,
                Decimal(m[2][0].decode("ascii")) if 2 in m else None)
        except (InvalidOperation, UnicodeDecodeError) as exc:
            raise ValueError(
                f"malformed ORC decimal statistics: {exc}") from None
    elif 7 in cs:  # DateStatistics (sint32 epoch days)
        m = pb_message(cs[7][0])
        put(_unzig(m[1][0]) if 1 in m else None,
            _unzig(m[2][0]) if 2 in m else None)
    return out


@_malformed_guard
def orc_footer_from_file(fh) -> dict:
    """Postscript + footer via TAIL reads only (the planning path)."""
    import os

    fh.seek(0, os.SEEK_END)
    size = fh.tell()
    if size < 16:
        raise ValueError("file too small to be ORC")
    take = min(size, 65536)
    fh.seek(size - take)
    tail = fh.read(take)
    ps_len = tail[-1]
    if ps_len + 1 > len(tail):
        raise ValueError("postscript overruns the tail")
    ps = pb_message(tail[-(ps_len + 1):-1])
    magic = (ps.get(8000) or [b""])[0]
    if magic != b"ORC":
        raise ValueError("missing ORC postscript magic")
    footer_len = (ps.get(1) or [0])[0]
    codec = _COMP.get((ps.get(2) or [0])[0])
    if codec is None:
        raise ValueError("unknown ORC compression kind")
    block_size = (ps.get(3) or [1 << 18])[0]
    meta_len = (ps.get(5) or [0])[0]
    need = ps_len + 1 + footer_len + meta_len
    if need > len(tail):
        take = min(size, need)
        fh.seek(size - take)
        tail = fh.read(take)
    fblob = tail[-(ps_len + 1 + footer_len):-(ps_len + 1)]
    footer = pb_message(decompress_entity(fblob, codec, block_size))
    stripe_stats: list[list[dict]] = []
    if meta_len:
        mblob = tail[-(ps_len + 1 + footer_len + meta_len):
                     -(ps_len + 1 + footer_len)]
        meta = pb_message(decompress_entity(mblob, codec, block_size))
        for ss_raw in meta.get(1) or []:  # StripeStatistics
            ss = pb_message(ss_raw)
            stripe_stats.append(
                [_decode_col_stats(pb_message(cs))
                 for cs in ss.get(1) or []])
    types = [pb_message(t) for t in footer.get(4) or []]
    if not types:
        raise ValueError("ORC footer has no types")

    def _parse_node(tid: int, depth: int = 0) -> dict:
        """Recursive type-tree parse for the GENERAL nested path
        (arbitrary LIST/STRUCT/MAP composition, round 12)."""
        if tid >= len(types) or depth > 32:
            raise ValueError("malformed ORC type tree")
        t = types[tid]
        kind = _KINDS.get((t.get(1) or [-1])[0], "?")
        if kind == "?":
            raise ValueError("unknown ORC type kind")
        node = {"kind": kind, "column": tid}
        child_ids = _pb_packed_uints(t.get(2) or [])
        if kind == "UNION":
            # round 13 (VERDICT r12 item 5, the last ORC type-tree
            # reject): tag stream (byte RLE DATA) selects one of up
            # to 256 variant subtypes; each variant records values
            # only at its tagged rows.  Surfaced as the tagged-struct
            # mapping (tag:tinyint, field<i>:variant) — the
            # union-less engines' convention.
            if not child_ids or len(child_ids) > 256:
                raise ValueError("malformed ORC UNION type node")
            node["variants"] = [
                _parse_node(cid, depth + 1) for cid in child_ids]
            return node
        if kind == "STRUCT":
            child_names = [x.decode("utf-8") for x in t.get(3) or []]
            if len(child_ids) != len(child_names) or not child_ids:
                raise ValueError("malformed ORC STRUCT type node")
            node["fields"] = [
                dict(_parse_node(cid, depth + 1), name=cn)
                for cn, cid in zip(child_names, child_ids)]
        elif kind == "LIST":
            if len(child_ids) != 1:
                raise ValueError("malformed ORC LIST type node")
            node["element"] = _parse_node(child_ids[0], depth + 1)
        elif kind == "MAP":
            if len(child_ids) != 2:
                raise ValueError("malformed ORC MAP type node")
            node["key"] = _parse_node(child_ids[0], depth + 1)
            if node["key"]["kind"] in ("LIST", "MAP", "STRUCT"):
                raise NotImplementedError(
                    "non-leaf ORC map key types not supported")
            node["value"] = _parse_node(child_ids[1], depth + 1)
        elif kind == "DECIMAL":
            p = (t.get(5) or [38])[0]
            s = (t.get(6) or [10])[0]
            if not (0 < p <= 38 and 0 <= s <= p):
                raise ValueError(f"implausible ORC decimal({p},{s})")
            node["precision"], node["scale"] = p, s
        elif child_ids:
            raise ValueError(
                f"ORC leaf type {kind} declares children")
        return node
    root = types[0]
    if _KINDS.get((root.get(1) or [0])[0]) != "STRUCT":
        raise NotImplementedError("ORC root type must be a struct")
    subtypes = _pb_packed_uints(root.get(2) or [])
    names = [n.decode("utf-8") for n in root.get(3) or []]
    cols = []
    for name, tid in zip(names, subtypes):
        t = types[tid]
        kind = _KINDS.get((t.get(1) or [-1])[0], "?")
        def _dec_ps(node: dict) -> tuple[int, int]:
            # Type.precision (field 5) / Type.scale (field 6); the
            # spec's Hive-0.13 defaults when a writer omits them
            p = (node.get(5) or [38])[0]
            s = (node.get(6) or [10])[0]
            if not (0 < p <= 38 and 0 <= s <= p):
                raise ValueError(
                    f"implausible ORC decimal({p},{s})")
            return p, s

        if kind == "LIST":
            # ONE nested level: LIST of a leaf type (the array<float>
            # embedding shape); deeper nesting stays a loud reject
            child_ids = _pb_packed_uints(t.get(2) or [])
            if len(child_ids) != 1 or child_ids[0] >= len(types):
                raise ValueError("malformed ORC LIST type node")
            ct = types[child_ids[0]]
            ck = _KINDS.get((ct.get(1) or [-1])[0], "?")
            if ck in ("LIST", "MAP", "STRUCT", "UNION"):
                # GENERAL nesting (round 12): recursive tree
                cols.append({"name": name, "kind": "NESTED",
                             "column": tid,
                             "tree": _parse_node(tid)})
                continue
            if ck == "?":
                raise ValueError("unknown ORC type kind")
            col = {"name": name, "kind": "LIST", "column": tid,
                   "child_kind": ck, "child_column": child_ids[0]}
            if ck == "DECIMAL":
                col["child_precision"], col["child_scale"] = \
                    _dec_ps(ct)
            cols.append(col)
            continue
        if kind == "STRUCT":
            # ONE nested level: STRUCT of leaf types (round 12). Per
            # the spec, a child column only records values for rows
            # where the struct itself is non-null.
            child_ids = _pb_packed_uints(t.get(2) or [])
            child_names = [x.decode("utf-8") for x in t.get(3) or []]
            if len(child_ids) != len(child_names) or not child_ids:
                raise ValueError("malformed ORC STRUCT type node")
            fields = []
            for cn, cid2 in zip(child_names, child_ids):
                if cid2 >= len(types):
                    raise ValueError("ORC STRUCT child id out of range")
                ck = _KINDS.get((types[cid2].get(1) or [-1])[0], "?")
                if ck in ("LIST", "MAP", "STRUCT", "UNION"):
                    fields = None  # GENERAL nesting: recursive tree
                    break
                if ck == "?":
                    raise ValueError("unknown ORC type kind")
                fld = {"name": cn, "kind": ck, "column": cid2}
                if ck == "DECIMAL":
                    fld["precision"], fld["scale"] = _dec_ps(
                        types[cid2])
                fields.append(fld)
            if fields is None:
                cols.append({"name": name, "kind": "NESTED",
                             "column": tid,
                             "tree": _parse_node(tid)})
                continue
            cols.append({"name": name, "kind": "STRUCT",
                         "column": tid, "fields": fields})
            continue
        if kind == "MAP":
            # ONE nested level: MAP of leaf key/value types — the map
            # column carries PRESENT + LENGTH (entry counts); the two
            # children own their streams at the flattened entry grain
            child_ids = _pb_packed_uints(t.get(2) or [])
            if len(child_ids) != 2 or any(c >= len(types)
                                          for c in child_ids):
                raise ValueError("malformed ORC MAP type node")
            sub = {}
            nested_mv = False
            for cid2, role in zip(child_ids, ("key", "value")):
                ck = _KINDS.get((types[cid2].get(1) or [-1])[0], "?")
                if ck in ("LIST", "MAP", "STRUCT", "UNION"):
                    nested_mv = True  # GENERAL nesting (values only)
                    break
                if ck == "?":
                    raise ValueError("unknown ORC type kind")
                d = {"kind": ck, "column": cid2}
                if ck == "DECIMAL":
                    d["precision"], d["scale"] = _dec_ps(types[cid2])
                sub[role] = d
            if nested_mv:
                cols.append({"name": name, "kind": "NESTED",
                             "column": tid,
                             "tree": _parse_node(tid)})
                continue
            cols.append({"name": name, "kind": "MAP", "column": tid,
                         "key": sub["key"], "value": sub["value"]})
            continue
        if kind == "UNION":
            # round 13: route through the GENERAL nested tree
            cols.append({"name": name, "kind": "NESTED",
                         "column": tid, "tree": _parse_node(tid)})
            continue
        if kind == "?":
            raise ValueError("unknown ORC type kind")
        col = {"name": name, "kind": kind, "column": tid}
        if kind == "DECIMAL":
            col["precision"], col["scale"] = _dec_ps(t)
        cols.append(col)
    stripes = []
    for s in footer.get(3) or []:
        m = pb_message(s)
        stripes.append({
            "offset": (m.get(1) or [0])[0],
            "index_length": (m.get(2) or [0])[0],
            "data_length": (m.get(3) or [0])[0],
            "footer_length": (m.get(4) or [0])[0],
            "num_rows": (m.get(5) or [0])[0],
        })
    return {
        "codec": codec,
        "block_size": block_size,
        "num_rows": (footer.get(6) or [0])[0],
        "columns": cols,
        "stripes": stripes,
        # per-stripe, per-column-id zone maps from the Metadata
        # section ([] when the writer emitted none)
        "stripe_stats": stripe_stats,
    }


# ---------------------------------------------------------------------------
# run-length decoders
# ---------------------------------------------------------------------------


def byte_rle(data: bytes, n: int) -> bytes:
    """Byte-level RLE: header < 128 -> run of header+3 copies;
    else 256-header literals."""
    out = bytearray()
    pos = 0
    while len(out) < n:
        if pos >= len(data):
            raise ValueError("truncated ORC byte RLE")
        h = data[pos]
        pos += 1
        if h < 128:
            if pos >= len(data):
                raise ValueError("truncated ORC byte-RLE run")
            out += bytes([data[pos]]) * (h + 3)
            pos += 1
        else:
            ln = 256 - h
            if pos + ln > len(data):
                raise ValueError("truncated ORC byte-RLE literals")
            out += data[pos:pos + ln]
            pos += ln
    return bytes(out[:n])


def bool_rle(data: bytes, n: int) -> list[bool]:
    """Boolean streams: byte RLE over bit-packed bytes, MSB first."""
    nbytes = (n + 7) // 8
    raw = byte_rle(data, nbytes)
    out = []
    for b in raw:
        for i in range(7, -1, -1):
            out.append(bool((b >> i) & 1))
    return out[:n]


def _varint_u(data: bytes, pos: int) -> tuple[int, int]:
    return _pb_varint(data, pos)


def _varint_s(data: bytes, pos: int) -> tuple[int, int]:
    n, pos = _pb_varint(data, pos)
    return (n >> 1) ^ -(n & 1), pos


#: RLEv2 5-bit encoded width -> real bit width ("closest fixed bits")
def _decode_width(code: int) -> int:
    if code <= 23:
        return code + 1
    return {24: 26, 25: 28, 26: 30, 27: 32, 28: 40, 29: 48, 30: 56,
            31: 64}[code]


def _unpack_msb(data: bytes, pos: int, width: int,
                count: int) -> tuple[list[int], int]:
    """MSB-first bit unpacking (ORC packs opposite to parquet)."""
    nbits = width * count
    nbytes = (nbits + 7) // 8
    if pos + nbytes > len(data):
        raise ValueError("truncated ORC bit-packed run")
    big = int.from_bytes(data[pos:pos + nbytes], "big")
    total = nbytes * 8
    mask = (1 << width) - 1
    out = [(big >> (total - (i + 1) * width)) & mask
           for i in range(count)]
    return out, pos + nbytes


def int_rle_v1(data: bytes, n: int, signed: bool) -> list[int]:
    """RLEv1: header < 128 -> run of header+3 with a signed byte
    delta; else 256-header literal varints."""
    out: list[int] = []
    pos = 0
    rd = _varint_s if signed else _varint_u
    while len(out) < n:
        if pos >= len(data):
            raise ValueError("truncated ORC RLEv1")
        h = data[pos]
        pos += 1
        if h < 128:
            run = h + 3
            delta = data[pos] - 256 if data[pos] >= 128 else data[pos]
            pos += 1
            base, pos = rd(data, pos)
            out.extend(base + i * delta for i in range(run))
        else:
            for _ in range(256 - h):
                v, pos = rd(data, pos)
                out.append(v)
    return out[:n]


def int_rle_v2(data: bytes, n: int, signed: bool) -> list[int]:
    """The four RLEv2 sub-encodings (spec "Integer Run Length
    Encoding, version 2")."""
    out: list[int] = []
    pos = 0
    while len(out) < n:
        if pos >= len(data):
            raise ValueError("truncated ORC RLEv2")
        b0 = data[pos]
        sub = b0 >> 6
        if sub == 0:  # SHORT_REPEAT
            width = ((b0 >> 3) & 7) + 1
            run = (b0 & 7) + 3
            pos += 1
            if pos + width > len(data):
                raise ValueError("truncated SHORT_REPEAT value")
            v = int.from_bytes(data[pos:pos + width], "big")
            pos += width
            if signed:
                v = (v >> 1) ^ -(v & 1)
            out.extend([v] * run)
        elif sub == 1:  # DIRECT
            width = _decode_width((b0 >> 1) & 0x1F)
            ln = (((b0 & 1) << 8) | data[pos + 1]) + 1
            pos += 2
            vals, pos = _unpack_msb(data, pos, width, ln)
            if signed:
                vals = [(v >> 1) ^ -(v & 1) for v in vals]
            out.extend(vals)
        elif sub == 2:  # PATCHED_BASE
            width = _decode_width((b0 >> 1) & 0x1F)
            ln = (((b0 & 1) << 8) | data[pos + 1]) + 1
            b2, b3 = data[pos + 2], data[pos + 3]
            bw = ((b2 >> 5) & 7) + 1           # base bytes
            pw = _decode_width(b2 & 0x1F)      # patch bits
            pgw = ((b3 >> 5) & 7) + 1          # gap bits
            pll = b3 & 0x1F                    # patch list length
            pos += 4
            if pos + bw > len(data):
                raise ValueError("truncated PATCHED_BASE base")
            base = int.from_bytes(data[pos:pos + bw], "big")
            sign_bit = 1 << (bw * 8 - 1)
            if base & sign_bit:  # sign-magnitude
                base = -(base & (sign_bit - 1))
            pos += bw
            vals, pos = _unpack_msb(data, pos, width, ln)
            patch_bits = pgw + pw
            # patch entries are packed at the closest legal width
            cfb = patch_bits
            if cfb > 24:
                for legal in (26, 28, 30, 32, 40, 48, 56, 64):
                    if cfb <= legal:
                        cfb = legal
                        break
            patches, pos = _unpack_msb(data, pos, cfb, pll)
            idx = 0
            pmask = (1 << pw) - 1
            for entry in patches:
                gap = entry >> pw
                patch = entry & pmask
                idx += gap
                if patch == 0:
                    continue  # gap-extension entry (gap 255, patch 0)
                if idx >= ln:
                    raise ValueError("PATCHED_BASE patch out of range")
                vals[idx] |= patch << width
            out.extend(base + v for v in vals)
        else:  # DELTA
            wcode = (b0 >> 1) & 0x1F
            width = _decode_width(wcode) if wcode else 0
            ln = (((b0 & 1) << 8) | data[pos + 1]) + 1
            pos += 2
            base, pos = (_varint_s if signed else _varint_u)(data, pos)
            delta0, pos = _varint_s(data, pos)
            seq = [base]
            if ln > 1:
                seq.append(base + delta0)
            if ln > 2:
                if width:
                    deltas, pos = _unpack_msb(data, pos, width, ln - 2)
                else:
                    deltas = [abs(delta0)] * (ln - 2)
                sign = -1 if delta0 < 0 else 1
                for d in deltas:
                    seq.append(seq[-1] + sign * d)
            out.extend(seq)
    return out[:n]


def int_rle(data: bytes, n: int, signed: bool, version: int) -> list:
    return (int_rle_v2 if version == 2 else int_rle_v1)(data, n, signed)


# ---------------------------------------------------------------------------
# stripe decode
# ---------------------------------------------------------------------------


@_malformed_guard
def read_stripe(fh, footer: dict, stripe_index: int,
                columns: list[str] | None = None) -> dict:
    """Decode ONE stripe (the parallel-read unit) into
    ``{column_name: [values]}`` — None for nulls; only the projected
    columns' streams are decompressed."""
    st = footer["stripes"][stripe_index]
    codec, bs = footer["codec"], footer["block_size"]
    fh.seek(st["offset"])
    blob = fh.read(st["index_length"] + st["data_length"]
                   + st["footer_length"])
    sfoot = pb_message(decompress_entity(
        blob[st["index_length"] + st["data_length"]:], codec, bs))
    streams = []
    off = 0
    for s in sfoot.get(1) or []:
        m = pb_message(s)
        kind = _STREAM_KINDS.get((m.get(1) or [0])[0], "?")
        col = (m.get(2) or [0])[0]
        ln = (m.get(3) or [0])[0]
        streams.append({"kind": kind, "column": col, "length": ln,
                        "offset": off})
        off += ln
    encodings = [
        _ENCODINGS.get((pb_message(e).get(1) or [0])[0], "?")
        for e in sfoot.get(2) or []
    ]
    dict_sizes = [
        (pb_message(e).get(2) or [0])[0] for e in sfoot.get(2) or []
    ]
    n = st["num_rows"]
    want = columns or [c["name"] for c in footer["columns"]]
    by_name = {c["name"]: c for c in footer["columns"]}

    def get_stream(col: int, kind: str) -> bytes | None:
        for s in streams:
            if s["column"] == col and s["kind"] == kind:
                return decompress_entity(
                    blob[s["offset"]:s["offset"] + s["length"]],
                    codec, bs)
        return None

    out = {}

    def decode_leaf(cid: int, kind: str, n_slots: int) -> list:
        """One leaf column's ``n_slots`` value slots (None for nulls)
        — shared by flat top-level columns and LIST elements."""
        enc = encodings[cid] if cid < len(encodings) else "DIRECT"
        ver = 2 if enc in ("DIRECT_V2", "DICTIONARY_V2") else 1
        present = get_stream(cid, "PRESENT")
        pres = (bool_rle(present, n_slots) if present is not None
                else [True] * n_slots)
        nv = sum(pres)
        data = get_stream(cid, "DATA")
        if data is None and nv:
            raise ValueError(f"ORC column {cid} missing DATA stream")
        if kind == "BOOLEAN":
            vals = bool_rle(data or b"", nv)
        elif kind == "BYTE":
            raw = byte_rle(data or b"", nv)
            vals = [b - 256 if b >= 128 else b for b in raw]
        elif kind in ("SHORT", "INT", "LONG", "DATE"):
            vals = int_rle(data or b"", nv, True, ver)
        elif kind == "FLOAT":
            if len(data or b"") < 4 * nv:
                raise ValueError("truncated ORC float stream")
            vals = list(struct.unpack_from(f"<{nv}f", data, 0))
        elif kind == "DOUBLE":
            if len(data or b"") < 8 * nv:
                raise ValueError("truncated ORC double stream")
            vals = list(struct.unpack_from(f"<{nv}d", data, 0))
        elif kind in ("TIMESTAMP", "TIMESTAMP_INSTANT"):
            # spec: DATA = signed FLOOR seconds relative to the
            # 2015-01-01 epoch; SECONDARY = the (always non-negative)
            # sub-second nanos with the low 3 bits counting stripped
            # trailing zeros (nanos = (v>>3) * 10^(zeros+1) when set).
            # value = (base + s) seconds + nanos — floor semantics
            # verified against raw pyarrow.orc stream dumps and pinned
            # across the 2015 boundary and pre-1970 in tests.
            secs = int_rle(data or b"", nv, True, ver)
            sec_stream = get_stream(cid, "SECONDARY")
            raw_nanos = int_rle(sec_stream or b"", nv, False, ver)
            vals = []
            for s, rn in zip(secs, raw_nanos):
                # pre-1970 writers disagree: ORC_CPP stores NEGATIVE
                # sub-second nanos as a two's-complement pattern in
                # the unsigned stream; the Java writer truncates its
                # milliseconds toward zero and keeps positive nanos,
                # which the reference readers repair by borrowing one
                # second exactly when abs-seconds < 0 AND nanos exceed
                # the millisecond boundary (> 999999) — both
                # conventions pinned against pyarrow.orc in tests
                if rn >= 1 << 63:
                    rn -= 1 << 64
                nanos = rn >> 3  # arithmetic shift (floor)
                zeros = rn & 7
                if zeros:
                    nanos *= 10 ** (zeros + 1)
                if not -999_999_999 <= nanos <= 999_999_999:
                    raise ValueError("ORC timestamp nanos out of range")
                # sub-microsecond payloads (round 13): FLOOR to the
                # engine's micros grain — nanos//1000 is floor for
                # both sign conventions, matching pyarrow's ns values
                # floor-divided by 1000 (pinned in tests)
                abs_s = 1420070400 + s
                if abs_s < 0 and nanos > 999_999:
                    abs_s -= 1
                vals.append(abs_s * 1_000_000 + nanos // 1000)
        elif kind == "DECIMAL":
            # spec: DATA = the unscaled value as an unbounded-length
            # zigzag base-128 varint; SECONDARY = each value's scale
            # (signed RLE).  Scale travels PER VALUE, so decode needs
            # no declared (p, s) — Decimal(mantissa) * 10^-scale is
            # exact; a 41-digit context keeps 38-digit unscaled
            # values unrounded (default prec 28 would not)
            from decimal import Context, Decimal

            sec = get_stream(cid, "SECONDARY")
            scales = int_rle(sec or b"", nv, True, ver)
            ctx = Context(prec=41)
            data = data or b""
            vals = []
            p = 0
            for sc in scales:
                if not -76 <= sc <= 76:
                    raise ValueError(
                        f"implausible ORC decimal scale {sc}")
                # unbounded varint: 38 digits ~ 127 bits ~ 19 bytes,
                # past pb_message's 70-bit cap — read it here
                out_v = shift = 0
                while True:
                    if p >= len(data):
                        raise ValueError(
                            "truncated ORC decimal mantissa")
                    b = data[p]
                    p += 1
                    out_v |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                    if shift > 140:
                        raise ValueError(
                            "ORC decimal mantissa varint too long")
                vals.append(Decimal(_unzig(out_v)).scaleb(-sc, ctx))
        elif kind in ("STRING", "VARCHAR", "CHAR", "BINARY"):
            length_s = get_stream(cid, "LENGTH")
            if enc in ("DICTIONARY", "DICTIONARY_V2"):
                dsize = dict_sizes[cid]
                dict_data = get_stream(cid, "DICTIONARY_DATA") or b""
                lens = int_rle(length_s or b"", dsize, False, ver)
                entries = []
                p = 0
                for ln2 in lens:
                    entries.append(dict_data[p:p + ln2])
                    p += ln2
                idx = int_rle(data or b"", nv, False, ver)
                if idx and max(idx) >= len(entries):
                    raise ValueError("ORC dictionary index out of range")
                vals = [entries[i] for i in idx]
            else:
                lens = int_rle(length_s or b"", nv, False, ver)
                vals = []
                p = 0
                for ln2 in lens:
                    if p + ln2 > len(data or b""):
                        raise ValueError("ORC string data overrun")
                    vals.append(data[p:p + ln2])
                    p += ln2
            if kind != "BINARY":
                vals = [v.decode("utf-8") for v in vals]
            else:
                vals = [bytes(v) for v in vals]
        else:
            raise NotImplementedError(
                f"ORC column type {kind} not supported")
        if len(vals) < nv:
            raise ValueError(f"ORC column {cid} short of values")
        it = iter(vals)
        return [next(it) if p else None for p in pres]

    for name in want:
        col = by_name.get(name)
        if col is None:
            raise ValueError(f"ORC column {name!r} not in the file")
        cid = col["column"]
        kind = col["kind"]
        if kind == "LIST":
            enc = encodings[cid] if cid < len(encodings) else "DIRECT"
            ver = 2 if enc == "DIRECT_V2" else 1
            present = get_stream(cid, "PRESENT")
            pres = (bool_rle(present, n) if present is not None
                    else [True] * n)
            n_present = sum(pres)
            length_s = get_stream(cid, "LENGTH")
            lengths = int_rle(length_s or b"", n_present, False, ver)
            total = sum(lengths)
            elems = decode_leaf(col["child_column"],
                                col["child_kind"], total)
            recs: list = []
            pos_e = 0
            li = iter(lengths)
            for p in pres:
                if not p:
                    recs.append(None)
                    continue
                ln2 = next(li)
                recs.append(elems[pos_e:pos_e + ln2])
                pos_e += ln2
            out[name] = recs
        elif kind == "NESTED":
            # GENERAL nesting (round 12): the spec's presence-based
            # recursion — each column records values only where its
            # parent is present; LIST/MAP flatten through LENGTH
            def decode_any(node, n_slots, depth=0):
                if depth > 32:
                    raise ValueError("ORC nesting too deep")
                k2 = node["kind"]
                cid2 = node["column"]
                if k2 == "STRUCT":
                    present = get_stream(cid2, "PRESENT")
                    pres = (bool_rle(present, n_slots)
                            if present is not None
                            else [True] * n_slots)
                    npp = sum(pres)
                    fvals = [(f_["name"],
                              decode_any(f_, npp, depth + 1))
                             for f_ in node["fields"]]
                    recs2: list = []
                    j = 0
                    for p in pres:
                        if not p:
                            recs2.append(None)
                            continue
                        recs2.append({fn: fv[j] for fn, fv in fvals})
                        j += 1
                    return recs2
                if k2 in ("LIST", "MAP"):
                    enc2 = (encodings[cid2]
                            if cid2 < len(encodings) else "DIRECT")
                    ver2 = 2 if enc2 == "DIRECT_V2" else 1
                    present = get_stream(cid2, "PRESENT")
                    pres = (bool_rle(present, n_slots)
                            if present is not None
                            else [True] * n_slots)
                    npp = sum(pres)
                    lengths = int_rle(
                        get_stream(cid2, "LENGTH") or b"", npp,
                        False, ver2)
                    total = sum(lengths)
                    if k2 == "LIST":
                        elems = decode_any(node["element"], total,
                                           depth + 1)
                        parts2 = [elems]
                    else:
                        parts2 = [
                            decode_any(node["key"], total, depth + 1),
                            decode_any(node["value"], total,
                                       depth + 1)]
                    recs2 = []
                    pos_e = 0
                    li = iter(lengths)
                    for p in pres:
                        if not p:
                            recs2.append(None)
                            continue
                        ln2 = next(li)
                        if k2 == "LIST":
                            recs2.append(
                                parts2[0][pos_e:pos_e + ln2])
                        else:
                            ks = parts2[0][pos_e:pos_e + ln2]
                            vs = parts2[1][pos_e:pos_e + ln2]
                            if any(k3 is None for k3 in ks):
                                raise ValueError(
                                    f"ORC map column {name!r} "
                                    "carries a null key")
                            rec = dict(zip(ks, vs))
                            if len(rec) != ln2:
                                raise ValueError(
                                    f"ORC map column {name!r} "
                                    "carries duplicate keys in one "
                                    "record")
                            recs2.append(rec)
                        pos_e += ln2
                    return recs2
                if k2 == "UNION":
                    # DATA = per-present-row variant tags (byte RLE);
                    # variant i records values only at its tag-i rows
                    present = get_stream(cid2, "PRESENT")
                    pres = (bool_rle(present, n_slots)
                            if present is not None
                            else [True] * n_slots)
                    npp = sum(pres)
                    tags = byte_rle(get_stream(cid2, "DATA") or b"",
                                    npp)
                    nvar = len(node["variants"])
                    counts = [0] * nvar
                    for tg in tags:
                        if tg >= nvar:
                            raise ValueError(
                                f"ORC union tag {tg} outside the "
                                f"{nvar}-variant type")
                        counts[tg] += 1
                    vparts = [decode_any(v, c, depth + 1)
                              for v, c in zip(node["variants"],
                                              counts)]
                    recs2 = []
                    idxs = [0] * nvar
                    ti = iter(tags)
                    for p in pres:
                        if not p:
                            recs2.append(None)
                            continue
                        tg = next(ti)
                        val = vparts[tg][idxs[tg]]
                        idxs[tg] += 1
                        rec = {"tag": tg}
                        for vi in range(nvar):
                            rec[f"field{vi}"] = (val if vi == tg
                                                 else None)
                        recs2.append(rec)
                    return recs2
                return decode_leaf(cid2, k2, n_slots)

            out[name] = decode_any(col["tree"], n)
        elif kind == "MAP":
            # LENGTH counts entries per present map; both children
            # decode at the flattened entry grain and zip into dicts
            # (duplicate keys reject, matching Spark's EXCEPTION
            # dedup policy; null keys are malformed)
            enc = encodings[cid] if cid < len(encodings) else "DIRECT"
            ver = 2 if enc == "DIRECT_V2" else 1
            present = get_stream(cid, "PRESENT")
            pres = (bool_rle(present, n) if present is not None
                    else [True] * n)
            n_present = sum(pres)
            length_s = get_stream(cid, "LENGTH")
            lengths = int_rle(length_s or b"", n_present, False, ver)
            total = sum(lengths)
            keys = decode_leaf(col["key"]["column"],
                               col["key"]["kind"], total)
            mvals = decode_leaf(col["value"]["column"],
                                col["value"]["kind"], total)
            recs = []
            pos_e = 0
            li = iter(lengths)
            for p in pres:
                if not p:
                    recs.append(None)
                    continue
                ln2 = next(li)
                ks = keys[pos_e:pos_e + ln2]
                vs = mvals[pos_e:pos_e + ln2]
                pos_e += ln2
                if any(k is None for k in ks):
                    raise ValueError(
                        f"ORC map column {name!r} carries a null key")
                rec = dict(zip(ks, vs))
                if len(rec) != len(ks):
                    raise ValueError(
                        f"ORC map column {name!r} carries duplicate "
                        "keys in one record")
                recs.append(rec)
            out[name] = recs
        elif kind == "STRUCT":
            # child columns carry values only for rows where the
            # struct is present (spec: "a child has a value only when
            # its parent's value is non-null")
            present = get_stream(cid, "PRESENT")
            pres = (bool_rle(present, n) if present is not None
                    else [True] * n)
            npp = sum(pres)
            fvals = {f_["name"]: decode_leaf(f_["column"], f_["kind"],
                                             npp)
                     for f_ in col["fields"]}
            names_f = [f_["name"] for f_ in col["fields"]]
            recs = []
            j = 0
            for p in pres:
                if not p:
                    recs.append(None)
                    continue
                recs.append({fn: fvals[fn][j] for fn in names_f})
                j += 1
            out[name] = recs
        else:
            out[name] = decode_leaf(cid, kind, n)
    return out
