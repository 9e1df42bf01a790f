"""From-spec Apache Parquet READER — footer, thrift compact metadata,
page decode — for the flat-column subset the engine's tables use.

Everything here is implemented from the public format documentation
(the parquet-format specification and its ``parquet.thrift`` IDL, and
the Thrift Compact Protocol spec THRIFT-110):

- **Footer**: files end ``<metadata><4-byte LE len>PAR1``; planning
  reads the TAIL only — magic, length word, and the FileMetaData
  thrift blob — never payload bytes (the 100 TB posture: a driver
  plans a directory of archives from footers alone).
- **Thrift compact protocol**: LEB128 varints, zigzag i16/i32/i64,
  delta-encoded field ids, short-form lists, nested structs; unknown
  fields of every type (incl. nested structs/lists/maps) are skipped
  structurally, so forward-compatible metadata parses cleanly.
- **Pages**: DATA_PAGE (v1: one compressed body holding rep levels +
  def levels + values; def levels are a 4-byte-length-prefixed
  RLE/bit-packed hybrid), DATA_PAGE_V2 (levels stored uncompressed
  ahead of the optionally-compressed values), DICTIONARY_PAGE (PLAIN
  values).
- **Encodings — all of them**: PLAIN (bit-packed booleans, LE
  int32/int64/float/double, 4-byte-length byte arrays, fixed-len byte
  arrays), RLE_DICTIONARY / PLAIN_DICTIONARY (1-byte bit width +
  RLE/bit-packed hybrid of dictionary indices), RLE booleans,
  DELTA_BINARY_PACKED (block/miniblock zigzag-min-delta bit packing,
  omitted trailing miniblocks, width-wrapped arithmetic),
  DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY (incremental prefix
  encoding), BYTE_STREAM_SPLIT (byte-plane transpose), and — round
  13 — the deprecated standalone BIT_PACKED level encoding of
  ancient parquet-mr v1 pages (MSB-first, no length prefix).
- **Codecs**: every codec the format names that this repo already
  decodes from spec — UNCOMPRESSED, SNAPPY (`operators/snappy.py`),
  GZIP (`operators/inflate.py`), BROTLI (`operators/brotli_dec.py`),
  ZSTD (`operators/zstd.py`), LZ4_RAW (`operators/lz4.py`); legacy
  LZO/LZ4-hadoop reject loudly.

Scope: flat columns, arbitrary LIST/STRUCT/MAP nesting through the
general Dremel assembly (round 12), DECIMAL on all three physical
carriers (round 12), INT96 legacy timestamps (round 12, signed
nanos-of-day + Julian day → epoch micros), and — round 14 — the
LEGACY 2-level list shapes from the format's backward-compatibility
rules, ALL FOUR: a bare REPEATED primitive reads as a required list
of required elements (rule 1); a LIST-annotated group whose repeated
child is NOT a group reads that child as the required element
(rule 2); a repeated GROUP with multiple fields (rule 3) or named
``array`` / ``<list>_tuple`` (rule 4) reads as the required-STRUCT
element.  Repeated groups without any LIST/MAP annotation stay a
documented loud reject (no rule disambiguates them).
The reader is cross-validated column-for-
column against pyarrow (the reference implementation) over a writer
matrix — compressions × dictionary on/off × page versions × null
densities × multi-row-group × multi-page — in
tests/test_parquet_native.py, and against DuckDB's independent writer.

Spark integration lives in ``sources/parquet_native_source.py`` (one
InputPartition per row group, column pruning at the byte-range level).
"""

from __future__ import annotations

import struct

_MAGIC = b"PAR1"


def _malformed_guard(kind):
    """Decorator: low-level parse crashes on corrupt bytes (struct
    under-reads, index overruns, absurd header values) surface as ONE
    descriptive ValueError instead of leaking IndexError/KeyError/
    struct.error internals — the loud-reject contract, fuzz-enforced
    in tests/test_parquet_native.py."""
    import functools

    def deco(fn):
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
                    f"malformed {kind}: {type(exc).__name__}: {exc}"
                ) from exc
        return wrapped
    return deco

# ---------------------------------------------------------------------------
# Thrift compact protocol (THRIFT-110)
# ---------------------------------------------------------------------------

_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12


class _Thrift:
    """Minimal compact-protocol reader: returns structs as
    ``{field_id: value}`` dicts; bool fields surface as True/False,
    integers are zigzag-decoded, binaries stay ``bytes``."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def _varint(self) -> int:
        out = shift = 0
        while True:
            if self.p >= len(self.d):
                raise ValueError("truncated thrift varint")
            b = self.d[self.p]
            self.p += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ValueError("thrift varint too long")

    def _zigzag(self) -> int:
        n = self._varint()
        return (n >> 1) ^ -(n & 1)

    def _value(self, tp: int):
        if tp in (_T_TRUE, _T_FALSE):
            # only reachable for list/map elements, where bools are a
            # full byte: 1 = true, 2 = false (THRIFT-110)
            b = self.d[self.p]
            self.p += 1
            return b == 1
        if tp == _T_BYTE:
            b = self.d[self.p]
            self.p += 1
            return b - 256 if b >= 128 else b
        if tp in (_T_I16, _T_I32, _T_I64):
            return self._zigzag()
        if tp == _T_DOUBLE:
            v = struct.unpack_from("<d", self.d, self.p)[0]
            self.p += 8
            return v
        if tp == _T_BINARY:
            n = self._varint()
            if n < 0 or self.p + n > len(self.d):
                raise ValueError("thrift binary overruns the buffer")
            v = self.d[self.p:self.p + n]
            self.p += n
            return v
        if tp in (_T_LIST, _T_SET):
            head = self.d[self.p]
            self.p += 1
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size = self._varint()
            if size > 1 << 24:
                raise ValueError("implausible thrift list size")
            return [self._value(etype) for _ in range(size)]
        if tp == _T_MAP:
            size = self._varint()
            if size == 0:
                return {}
            kv = self.d[self.p]
            self.p += 1
            kt, vt = kv >> 4, kv & 0x0F
            return {self._hashable(self._value(kt)): self._value(vt)
                    for _ in range(size)}
        if tp == _T_STRUCT:
            return self.read_struct()
        raise ValueError(f"unknown thrift compact type {tp}")

    @staticmethod
    def _hashable(v):
        return bytes(v) if isinstance(v, bytearray) else v

    def read_struct(self) -> dict:
        fields: dict = {}
        fid = 0
        while True:
            if self.p >= len(self.d):
                raise ValueError("truncated thrift struct")
            head = self.d[self.p]
            self.p += 1
            if head == _T_STOP:
                return fields
            delta = head >> 4
            tp = head & 0x0F
            if delta:
                fid += delta
            else:
                fid = self._zigzag()
            if tp == _T_TRUE:
                fields[fid] = True
            elif tp == _T_FALSE:
                fields[fid] = False
            else:
                fields[fid] = self._value(tp)


# ---------------------------------------------------------------------------
# Metadata model (field ids per parquet.thrift)
# ---------------------------------------------------------------------------

#: physical types (parquet.thrift Type)
PHYS = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96", 4: "FLOAT",
        5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY"}
#: compression codecs (parquet.thrift CompressionCodec)
CODECS = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
          4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}
_UTF8_CONVERTED = 0  # ConvertedType.UTF8
_DECIMAL_CONVERTED = 5  # ConvertedType.DECIMAL
#: 1970-01-01 as a Julian day number (INT96 timestamp epoch base)
_JULIAN_UNIX_EPOCH = 2440588


def _decimal_of(el: dict) -> tuple[int, int] | None:
    """(precision, scale) when a SchemaElement carries the DECIMAL
    logical/converted type (LogicalType.DECIMAL is union field 5 with
    DecimalType{1: scale, 2: precision}; legacy scale/precision sit on
    the element itself as fields 7/8)."""
    logical = el.get(10) or {}
    if el.get(6) != _DECIMAL_CONVERTED and 5 not in logical:
        return None
    dl = logical.get(5) or {}
    scale = dl.get(1, el.get(7, 0)) or 0
    precision = dl.get(2, el.get(8, 0)) or 0
    if precision <= 0 or scale < 0 or scale > precision:
        raise ValueError(
            f"invalid DECIMAL(precision={precision}, scale={scale})")
    return (precision, scale)


class _Cut:
    """Definition stopped at level ``d`` — the general assembly's
    null marker; which ancestor is null resolves at merge time
    against the type tree's absolute def thresholds."""

    __slots__ = ("d",)

    def __init__(self, d: int):
        self.d = d

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Cut({self.d})"


def _prim_leaf(el: dict, name: str, max_rep: int, max_def: int,
               optional: bool, path: str) -> dict:
    """Chunk-decodable leaf dict for one primitive schema element at
    the given Dremel depths (shared by the standard and the legacy
    2-level branches)."""
    phys = PHYS.get(el.get(1))
    if phys is None:
        raise ValueError(
            f"unknown parquet physical type {el.get(1)}")
    log = el.get(10) or {}
    return {
        "name": name,
        "kind": "rawleaf",
        "physical": phys,
        "type_length": el.get(2, 0),
        "string": el.get(6) == _UTF8_CONVERTED or 1 in log,
        "decimal": _decimal_of(el),
        "logical": log,
        "converted": el.get(6),
        "optional": optional,
        "max_rep": max_rep,
        "max_def": max_def,
        "path": path,
    }


def _parse_nested(schema: list, i: int, rep: int, d: int, path: str):
    """Recursively parse one schema element (group or primitive) at
    index ``i`` into a type-tree node for the GENERAL Dremel assembly
    (arbitrary LIST/STRUCT/MAP nesting).  ``rep``/``d`` are the
    max_rep/max_def accumulated ABOVE this element; ``path`` the
    dotted column-chunk path prefix.  Returns ``(node, next_i)``.

    Node shapes: ``{"t": "leaf", "leaf": <chunk-decodable dict>}``;
    ``{"t": "struct", "def": ds, "fields": [node...]}``; ``{"t":
    "list"|"map", "P": p, "E": p+1, ...}`` where ``P`` is the def at
    which the container exists-but-may-be-empty and ``E`` the def at
    which an element slot exists.  Every node carries ``name`` and
    ``n_leaves``."""
    if i >= len(schema):
        raise ValueError("parquet schema tree overruns element list")
    el = schema[i]
    name = el.get(4, b"?").decode("utf-8", "replace")
    repetition = el.get(3, 0)
    nch = el.get(5, 0)
    here = f"{path}.{name}" if path else name
    if not nch:  # primitive
        if repetition == 2:
            # LEGACY 2-level lists, rule 1 (round 14; parquet-format
            # LogicalTypes.md backward-compatibility rules): a bare
            # REPEATED primitive — pre-standard Hive/Impala files —
            # reads as a REQUIRED list of REQUIRED elements.  The
            # repeated field adds one def level (empty list) and one
            # rep level; the column path has NO wrapper groups.
            leaf = _prim_leaf(el, name, rep + 1, d + 1, False, here)
            return {"t": "list", "name": name, "optional": False,
                    "P": d, "E": d + 1,
                    "element": {"t": "leaf", "name": name,
                                "leaf": leaf, "n_leaves": 1},
                    "n_leaves": 1}, i + 1
        opt = repetition == 1
        leaf = _prim_leaf(el, name, rep, d + (1 if opt else 0), opt,
                          here)
        return {"t": "leaf", "name": name, "leaf": leaf,
                "n_leaves": 1}, i + 1
    conv_t = el.get(6)
    log = el.get(10) or {}
    is_list = conv_t == 3 or 3 in log
    is_map = conv_t in (1, 2) or 2 in log
    if repetition == 2:
        raise NotImplementedError(
            "repeated group without LIST/MAP annotation (legacy "
            "2-level nesting) not supported")
    opt = repetition == 1
    if is_list or is_map:
        if nch != 1 or i + 1 >= len(schema):
            raise NotImplementedError(
                f"non-standard {'MAP' if is_map else 'LIST'} "
                f"structure under {name!r}")
        mid = schema[i + 1]
        mid_name = mid.get(4, b"?").decode("utf-8", "replace")
        if is_list and mid.get(3) == 2 and not mid.get(5, 0):
            # LEGACY 2-level lists, rule 2: the repeated field under
            # a LIST group is NOT a group, so it IS the element type
            # and elements are required (no 3-level wrapper)
            P = d + (1 if opt else 0)
            E = P + 1
            base = f"{here}.{mid_name}"
            leaf = _prim_leaf(mid, mid_name, rep + 1, E, False, base)
            return {"t": "list", "name": name, "optional": opt,
                    "P": P, "E": E,
                    "element": {"t": "leaf", "name": mid_name,
                                "leaf": leaf, "n_leaves": 1},
                    "n_leaves": 1}, i + 2
        n_mid_kids = mid.get(5, 0)
        if is_list and mid.get(3) == 2 and n_mid_kids and (
                n_mid_kids > 1 or mid_name == "array"
                or mid_name == f"{name}_tuple"):
            # LEGACY 2-level lists, rules 3/4: a repeated GROUP with
            # multiple fields, or named "array" / "<list>_tuple", IS
            # the element type (a required STRUCT) — no 3-level
            # wrapper.  A single-field group with any other name
            # falls through to the standard 3-level path below.
            P = d + (1 if opt else 0)
            E = P + 1
            base = f"{here}.{mid_name}"
            fields = []
            j = i + 2
            n_lv = 0
            for _ in range(n_mid_kids):
                child, j = _parse_nested(schema, j, rep + 1, E, base)
                fields.append(child)
                n_lv += child["n_leaves"]
            elem = {"t": "struct", "name": mid_name,
                    "optional": False, "def": E, "fields": fields,
                    "n_leaves": n_lv}
            return {"t": "list", "name": name, "optional": opt,
                    "P": P, "E": E, "element": elem,
                    "n_leaves": n_lv}, j
        want_kids = 2 if is_map else 1
        if mid.get(3) != 2 or mid.get(5, 0) != want_kids:
            raise NotImplementedError(
                f"non-standard {'MAP' if is_map else 'LIST'} "
                f"structure under {name!r}")
        P = d + (1 if opt else 0)
        E = P + 1
        base = f"{here}.{mid_name}"
        if is_list:
            elem, nx = _parse_nested(schema, i + 2, rep + 1, E, base)
            return {"t": "list", "name": name, "optional": opt,
                    "P": P, "E": E, "element": elem,
                    "n_leaves": elem["n_leaves"]}, nx
        key, j = _parse_nested(schema, i + 2, rep + 1, E, base)
        if key["t"] != "leaf":
            raise NotImplementedError(
                f"non-leaf MAP key type under {name!r} not supported")
        if key["leaf"]["optional"]:
            raise ValueError(
                f"MAP column {name!r} declares optional keys (the "
                "spec requires them)")
        val, nx = _parse_nested(schema, j, rep + 1, E, base)
        return {"t": "map", "name": name, "optional": opt,
                "P": P, "E": E, "key": key, "value": val,
                "n_leaves": 1 + val["n_leaves"]}, nx
    ds = d + (1 if opt else 0)
    fields = []
    j = i + 1
    n_lv = 0
    for _ in range(nch):
        child, j = _parse_nested(schema, j, rep, ds, here)
        fields.append(child)
        n_lv += child["n_leaves"]
    if not fields:
        raise ValueError(f"group node {name!r} has no children")
    return {"t": "struct", "name": name, "optional": opt,
            "def": ds, "fields": fields, "n_leaves": n_lv}, j


def _nested_leaves(node: dict, lists: tuple = ()) -> list:
    """DFS leaf dicts under ``node``; each leaf gains ``_lists`` —
    the (P, E) def thresholds of its repeated ancestors, outermost
    first — which drives the skeleton builder."""
    t = node["t"]
    if t == "leaf":
        leaf = node["leaf"]
        leaf["_lists"] = list(lists)
        if leaf["max_rep"] != len(lists):
            raise ValueError("repetition depth mismatch in schema")
        return [leaf]
    if t == "struct":
        out = []
        for f in node["fields"]:
            out.extend(_nested_leaves(f, lists))
        return out
    nxt = lists + ((node["P"], node["E"]),)
    if t == "list":
        return _nested_leaves(node["element"], nxt)
    return (_nested_leaves(node["key"], nxt)
            + _nested_leaves(node["value"], nxt))


def _leaf_skeleton(reps: list, defs: list, vals: list,
                   lists: list, max_def: int) -> list:
    """One leaf's triplets -> one skeleton value per record: python
    lists at each repeated level, the (converted) leaf value where
    fully defined, and ``_Cut(d)`` wherever definition stopped —
    struct levels are TRANSPARENT here and resolve at merge time."""
    k = len(lists)
    records: list = []
    vi = 0
    open_lists: list = [None] * k

    def element_under(i: int, dd: int):
        nonlocal vi
        if i == k - 1:
            if dd == max_def:
                v = vals[vi]
                vi += 1
                return v
            return _Cut(dd)
        p1, e1 = lists[i + 1]
        if dd < p1:
            return _Cut(dd)
        lst: list = []
        open_lists[i + 1] = lst
        if dd >= e1:
            lst.append(element_under(i + 1, dd))
        return lst

    for r, dd in zip(reps, defs):
        if r > k:
            raise ValueError("repetition level exceeds declared depth")
        if r == 0:
            for j in range(k):
                open_lists[j] = None
            if k == 0:
                if dd == max_def:
                    records.append(vals[vi])
                    vi += 1
                else:
                    records.append(_Cut(dd))
                continue
            p0, e0 = lists[0]
            if dd < p0:
                records.append(_Cut(dd))
                continue
            lst: list = []
            open_lists[0] = lst
            records.append(lst)
            if dd >= e0:
                lst.append(element_under(0, dd))
        else:
            tgt = open_lists[r - 1]
            if tgt is None:
                raise ValueError(
                    "repetition level continues a null/closed list")
            for j in range(r, k):
                open_lists[j] = None
            tgt.append(element_under(r - 1, dd))
    if vi != len(vals):
        raise ValueError("leaf value count mismatch in nested assembly")
    return records


def _merge_nested(node: dict, parts: list):
    """Zip the aligned per-leaf skeletons under ``node`` into one
    python value — dicts at struct/map levels, lists at list levels,
    None where the type tree says the cut falls on this node."""
    t = node["t"]
    p0 = parts[0]
    if t == "leaf":
        return None if isinstance(p0, _Cut) else p0
    if t == "struct":
        ds = node["def"]
        null_here = isinstance(p0, _Cut) and p0.d < ds
        for p in parts[1:]:
            if (isinstance(p, _Cut) and p.d < ds) != null_here:
                raise ValueError(
                    "sibling leaves disagree on a struct null")
        if null_here:
            return None
        out = {}
        idx = 0
        for f in node["fields"]:
            n = f["n_leaves"]
            out[f["name"]] = _merge_nested(f, parts[idx:idx + n])
            idx += n
        return out
    # list / map
    if isinstance(p0, _Cut):
        if any(not isinstance(p, _Cut) for p in parts[1:]):
            raise ValueError(
                "sibling leaves disagree on a container null")
        return None
    ln = len(p0)
    for p in parts[1:]:
        if not isinstance(p, list) or len(p) != ln:
            raise ValueError(
                "misaligned repetition across sibling leaves")
    if t == "list":
        el = node["element"]
        return [_merge_nested(el, [p[j] for p in parts])
                for j in range(ln)]
    vn = node["value"]
    keys = [_merge_nested(node["key"], [p0[j]]) for j in range(ln)]
    vals = [_merge_nested(vn, [p[j] for p in parts[1:]])
            for j in range(ln)]
    if any(ky is None for ky in keys):
        raise ValueError(f"map column {node['name']!r} carries a "
                         "null key")
    rec = dict(zip(keys, vals))
    if len(rec) != ln:
        raise ValueError(f"map column {node['name']!r} carries "
                         "duplicate keys in one record")
    return rec


def _stat_value(raw: bytes, phys: str):
    """One PLAIN-encoded statistics bound -> a comparable Python
    value.  BYTE_ARRAY bounds stay bytes (writers may TRUNCATE them —
    still valid bounds per the spec's ordering contract, so pruning
    with them is safe)."""
    if raw is None:
        return None
    if phys == "INT32":
        return int.from_bytes(raw[:4], "little", signed=True)
    if phys == "INT64":
        return int.from_bytes(raw[:8], "little", signed=True)
    if phys == "FLOAT":
        return struct.unpack("<f", raw[:4])[0]
    if phys == "DOUBLE":
        return struct.unpack("<d", raw[:8])[0]
    if phys in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        return bytes(raw)
    if phys == "BOOLEAN":
        return bool(raw[0]) if raw else None
    return None


def _decode_stats(st: dict | None, phys: str | None) -> dict:
    """ColumnMetaData.Statistics (field 12): prefer the modern
    min_value/max_value (fields 6/5, signed comparison order); fall
    back to the legacy min/max (2/1) only for types whose legacy
    sort order was already correct (ints/doubles/bools — NOT byte
    arrays, whose legacy order was unsigned-vs-signed ambiguous)."""
    if not st or phys is None:
        return {}
    out = {}
    if st.get(3) is not None:
        out["null_count"] = st[3]
    lo = st.get(6)
    hi = st.get(5)
    if lo is None and hi is None and phys not in (
            "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        lo, hi = st.get(2), st.get(1)
    if lo is not None:
        out["min"] = _stat_value(lo, phys)
    if hi is not None:
        out["max"] = _stat_value(hi, phys)
    return out


@_malformed_guard("parquet")
def parquet_footer(data_tail: bytes, file_size: int) -> dict:
    """Parse FileMetaData from the file TAIL (any suffix that contains
    the whole footer).  Returns ``{"num_rows", "columns": [{name,
    physical, string, optional}], "row_groups": [{num_rows,
    chunks: {name: chunk_meta}}]}``."""
    if len(data_tail) < 8 or data_tail[-4:] != _MAGIC:
        raise ValueError("missing PAR1 footer magic")
    meta_len = int.from_bytes(data_tail[-8:-4], "little")
    if meta_len + 8 > len(data_tail):
        raise ValueError(
            f"footer tail too short: need {meta_len + 8} bytes"
        )
    blob = data_tail[-(meta_len + 8):-8]
    fmd = _Thrift(blob).read_struct()
    schema = fmd.get(2) or []
    if not schema:
        raise ValueError("parquet file has no schema elements")
    root = schema[0]
    n_children = root.get(5, 0)
    cols = []
    i = 1
    while i < len(schema):
        el = schema[i]
        name = el.get(4, b"?").decode("utf-8", "replace")
        if el.get(5):  # group node
            # THREE nested shapes supported: the standard 3-level LIST
            # (optional/required group (LIST) > repeated group > single
            # leaf — the array<float> embedding-column shape), the
            # standard MAP (group (MAP) > repeated group key_value >
            # required key + value leaves, parquet LogicalTypes.md),
            # and a one-level non-repeated STRUCT of primitive leaves
            is_list = el.get(6) == 3 or 3 in (el.get(10) or {})
            # ConvertedType MAP(1)/MAP_KEY_VALUE(2) or LogicalType.MAP
            is_map = el.get(6) in (1, 2) or 2 in (el.get(10) or {})
            nch = el.get(5, 0)
            if is_map:
                mid = schema[i + 1] if i + 1 < len(schema) else {}
                if (nch != 1 or mid.get(3) != 2 or mid.get(5) != 2
                        or i + 3 >= len(schema)):
                    raise NotImplementedError(
                        f"non-standard MAP structure under {name!r}")
                kleaf, vleaf = schema[i + 2], schema[i + 3]
                if kleaf.get(5) or vleaf.get(5):
                    # nested map VALUES: the general Dremel path
                    node, i = _parse_nested(schema, i, 0, 0, "")
                    cols.append({
                        "name": name,
                        "kind": "nested",
                        "physical": "GROUP",
                        "optional": el.get(3, 0) == 1,
                        "tree": node,
                        "leaves": _nested_leaves(node),
                        "path": name,
                    })
                    continue
                if kleaf.get(3, 0) == 1:
                    raise ValueError(
                        f"MAP column {name!r} declares optional keys"
                        " (the spec requires them)")
                outer_opt = el.get(3, 0) == 1
                d1 = 1 if outer_opt else 0   # def >= d1: map present
                d2 = d1 + 1                  # def >= d2: map non-empty
                mid_name = mid.get(4, b"key_value").decode(
                    "utf-8", "replace")
                subs = {}
                for k, role in ((kleaf, "key"), (vleaf, "value")):
                    phys = PHYS.get(k.get(1))
                    if phys is None:
                        raise ValueError(
                            f"unknown parquet physical type {k.get(1)}")
                    lopt = k.get(3, 0) == 1
                    klog = k.get(10) or {}
                    kname = k.get(4, b"?").decode("utf-8", "replace")
                    subs[role] = {
                        "name": kname,
                        "kind": "mapleaf",
                        "physical": phys,
                        "type_length": k.get(2, 0),
                        "string": (k.get(6) == _UTF8_CONVERTED
                                   or 1 in klog),
                        "decimal": _decimal_of(k),
                        "logical": klog,
                        "converted": k.get(6),
                        "optional": lopt,
                        "leaf_optional": lopt,
                        "max_rep": 1,
                        "max_def": d2 + (1 if lopt else 0),
                        "d1": d1, "d2": d2,
                        "path": f"{name}.{mid_name}.{kname}",
                    }
                cols.append({
                    "name": name,
                    "kind": "map",
                    "physical": "GROUP",
                    "optional": outer_opt,
                    "key": subs["key"],
                    "value": subs["value"],
                    "path": name,
                })
                i += 4
                continue
            if (not is_list and el.get(3, 0) != 2
                    and i + nch < len(schema)):
                kids = schema[i + 1:i + 1 + nch]
                if all(not k.get(5) and k.get(3, 0) != 2
                       for k in kids):
                    # one-level STRUCT: each leaf is its own column
                    # chunk with path "<struct>.<leaf>"; with no
                    # repetition anywhere the Dremel assembly is
                    # definition levels only — def < d1 means the
                    # struct itself is null at that record
                    outer_opt = el.get(3, 0) == 1
                    d1 = 1 if outer_opt else 0
                    fields = []
                    for k in kids:
                        kphys = PHYS.get(k.get(1))
                        if kphys is None:
                            raise ValueError(
                                "unknown parquet physical type "
                                f"{k.get(1)}")
                        kname = k.get(4, b"?").decode(
                            "utf-8", "replace")
                        klog = k.get(10) or {}
                        kopt = k.get(3, 0) == 1
                        fields.append({
                            "name": kname,
                            "kind": "flat",
                            "physical": kphys,
                            "type_length": k.get(2, 0),
                            "string": (k.get(6) == _UTF8_CONVERTED
                                       or 1 in klog),
                            "decimal": _decimal_of(k),
                            "logical": klog,
                            "converted": k.get(6),
                            "optional": kopt,
                            "max_rep": 0,
                            "max_def": d1 + (1 if kopt else 0),
                            "d1": d1,
                            "path": f"{name}.{kname}",
                        })
                    cols.append({
                        "name": name,
                        "kind": "struct",
                        "physical": "GROUP",
                        "optional": outer_opt,
                        "fields": fields,
                        "path": name,
                    })
                    i += 1 + nch
                    continue
            legacy_list = (is_list and el.get(5) == 1
                           and i + 2 < len(schema))
            if legacy_list:
                mid, leaf = schema[i + 1], schema[i + 2]
                legacy_list = (mid.get(3) == 2 and mid.get(5) == 1
                               and not leaf.get(5))
            if not legacy_list:
                # GENERAL nesting (round 12): arbitrary
                # LIST/STRUCT/MAP composition goes through the
                # recursive type-tree parse + full Dremel assembly
                node, i = _parse_nested(schema, i, 0, 0, "")
                cols.append({
                    "name": name,
                    "kind": "nested",
                    "physical": "GROUP",
                    "optional": el.get(3, 0) == 1,
                    "tree": node,
                    "leaves": _nested_leaves(node),
                    "path": name,
                })
                continue
            phys = PHYS.get(leaf.get(1))
            if phys is None:
                raise ValueError(
                    f"unknown parquet physical type {leaf.get(1)}")
            outer_opt = el.get(3, 0) == 1
            leaf_opt = leaf.get(3, 0) == 1
            d1 = 1 if outer_opt else 0   # def >= d1: list present
            d2 = d1 + 1                  # def >= d2: list non-empty
            d3 = d2 + (1 if leaf_opt else 0)  # == max_def: element set
            logical = leaf.get(10) or {}
            cols.append({
                "name": name,
                "kind": "list",
                "physical": phys,
                "type_length": leaf.get(2, 0),
                "string": leaf.get(6) == _UTF8_CONVERTED or 1 in logical,
                "decimal": _decimal_of(leaf),
                "logical": logical,
                "converted": leaf.get(6),
                "optional": outer_opt,
                "leaf_optional": leaf_opt,
                "max_rep": 1,
                "max_def": d3,
                "d1": d1, "d2": d2,
                "path": ".".join((
                    name, mid[4].decode("utf-8"),
                    leaf[4].decode("utf-8"))),
            })
            i += 3
            continue
        if el.get(3) == 2:  # REPEATED primitive (legacy 2-level)
            # round 14: reads as a required list of required elements
            # through the general Dremel path (backward-compat rule 1)
            node, i = _parse_nested(schema, i, 0, 0, "")
            cols.append({
                "name": name,
                "kind": "nested",
                "physical": "GROUP",
                "optional": False,
                "tree": node,
                "leaves": _nested_leaves(node),
                "path": name,
            })
            continue
        phys = PHYS.get(el.get(1))
        if phys is None:
            raise ValueError(f"unknown parquet physical type {el.get(1)}")
        logical = el.get(10) or {}
        cols.append({
            "name": name,
            "kind": "flat",
            "physical": phys,
            "type_length": el.get(2, 0),
            # UTF8 via converted type or LogicalType.STRING (field 1)
            "string": el.get(6) == _UTF8_CONVERTED or 1 in logical,
            "decimal": _decimal_of(el),
            "logical": logical,
            "converted": el.get(6),
            "optional": el.get(3, 0) == 1,
            "max_rep": 0,
            "max_def": 1 if el.get(3, 0) == 1 else 0,
            "path": name,
        })
        i += 1
    if len(cols) != n_children:
        raise ValueError(
            f"schema children mismatch: root says {n_children}, "
            f"found {len(cols)}"
        )
    groups = []
    for rg in fmd.get(4) or []:
        chunks = {}
        for cc in rg.get(1) or []:
            md = cc.get(3)
            if md is None:
                raise NotImplementedError(
                    "column chunk without inline metadata (the "
                    "ColumnMetaData lives at file_offset inside the "
                    "external file_path target, a layout no known "
                    "writer emits — all known writers inline the "
                    "metadata even in summary files; workaround: "
                    "rewrite the file with a modern writer)"
                )
            ext = cc.get(1)
            path = b".".join(md[3]).decode("utf-8")
            chunks[path] = {
                # Hadoop-era summary files set ColumnChunk.file_path:
                # the page bytes live in the named sibling file (path
                # relative to THIS file), metadata stays inline here
                "file_path": (ext.decode("utf-8")
                              if ext is not None else None),
                "physical": PHYS.get(md[1]),
                "codec": CODECS.get(md[4], f"codec#{md[4]}"),
                "num_values": md[5],
                "total_compressed_size": md[7],
                "data_page_offset": md[9],
                "dictionary_page_offset": md.get(11),
                "stats": _decode_stats(md.get(12), PHYS.get(md[1])),
                # PageLocation/ColumnIndex ranges (ColumnChunk 4-7)
                "offset_index": ((cc.get(4), cc.get(5))
                                 if cc.get(4) is not None else None),
                "column_index": ((cc.get(6), cc.get(7))
                                 if cc.get(6) is not None else None),
                # ColumnMetaData 14/15: bloom filter offset + length
                "bloom": ((md.get(14), md.get(15))
                          if md.get(14) is not None else None),
            }
        groups.append({"num_rows": rg.get(3, 0), "chunks": chunks})
    return {
        "num_rows": fmd.get(3, 0),
        "created_by": (fmd.get(6) or b"").decode("utf-8", "replace"),
        "columns": cols,
        "row_groups": groups,
    }


def _chunk_handle(fh, chunk: dict):
    """(handle, needs_close) for a chunk's byte source: the main file,
    or — for summary-file chunks carrying ``file_path`` — the sibling
    data file resolved relative to the main file's directory (round
    15, VERDICT r14 item 9).  Offsets in the footer are offsets into
    whichever file the chunk names."""
    ext = chunk.get("file_path")
    if not ext:
        return fh, False
    import os

    base = getattr(fh, "name", None)
    if not isinstance(base, str):
        raise ValueError(
            f"parquet column chunk names external file {ext!r} but "
            "the reader was handed an anonymous byte stream; open the "
            "summary file by path so the sibling resolves")
    return open(os.path.join(os.path.dirname(base) or ".", ext),
                "rb"), True


@_malformed_guard("parquet")
def read_page_index(fh, chunk: dict, col: dict) -> dict | None:
    """Decode one chunk's ColumnIndex + OffsetIndex (the page-level
    zone maps, parquet-format PageIndex.md) -> ``{"pages": [{offset,
    size, first_row}], "null_pages", "mins", "maxs",
    "boundary_order", "null_counts"}`` with min/max as comparable
    Python values; None when the chunk carries no offset index.
    This is what a page-granular scan prunes on: a page whose
    [min, max] cannot satisfy the residual filter is a skip
    candidate without reading a payload byte."""
    oi_loc = chunk.get("offset_index")
    if oi_loc is None:
        return None
    src, closing = _chunk_handle(fh, chunk)
    try:
        src.seek(oi_loc[0])
        oi_raw = src.read(oi_loc[1])
        ci_loc = chunk.get("column_index")
        ci_raw = None
        if ci_loc is not None:
            src.seek(ci_loc[0])
            ci_raw = src.read(ci_loc[1])
    finally:
        if closing:
            src.close()
    oi = _Thrift(oi_raw).read_struct()
    pages = [{"offset": p[1], "size": p[2], "first_row": p[3]}
             for p in (oi.get(1) or [])]
    out = {"pages": pages}
    if ci_raw is not None:
        ci = _Thrift(ci_raw).read_struct()
        phys = col["physical"]
        out["null_pages"] = ci.get(1) or []
        out["mins"] = [None if not b else _stat_value(b, phys)
                       for b in (ci.get(2) or [])]
        out["maxs"] = [None if not b else _stat_value(b, phys)
                       for b in (ci.get(3) or [])]
        out["boundary_order"] = ci.get(4, 0)
        if ci.get(5) is not None:
            out["null_counts"] = ci[5]
    return out


def page_row_spans(pi: dict, rg_rows: int) -> list[tuple[int, int]]:
    """Per-page [start_row, end_row) within the row group, from the
    OffsetIndex first_row_index chain."""
    firsts = [p["first_row"] for p in pi["pages"]]
    return list(zip(firsts, firsts[1:] + [rg_rows]))


def intersect_ranges(a: list, b: list) -> list:
    """Intersection of two sorted disjoint [start, end) range lists."""
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        s = max(a[i][0], b[j][0])
        e = min(a[i][1], b[j][1])
        if s < e:
            out.append((s, e))
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def merge_spans(spans: list) -> list:
    """Coalesce adjacent/contiguous sorted [start, end) spans."""
    out: list = []
    for s, e in spans:
        if out and out[-1][1] >= s:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def _slice_rows(vals: list, kept_spans: list, ranges: list) -> list:
    """Trim per-record values decoded from the kept pages (whose
    absolute row spans are ``kept_spans``, in order) down to the rows
    in ``ranges``."""
    out: list = []
    base = 0
    for a, b in kept_spans:
        for s, e in ranges:
            s2, e2 = max(s, a), min(e, b)
            if s2 < e2:
                out.extend(vals[base + (s2 - a):base + (e2 - a)])
        base += b - a
    return out


#: SBBF block salts (parquet BloomFilter.md, public constants)
_BLOOM_SALT = (0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
               0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31)


def bloom_hash(value, physical: str, string: bool) -> int:
    """XXH64 (seed 0) of the value's PLAIN encoding per the spec's
    bloom-filter hashing rules: ints little-endian at their physical
    width, floats/doubles IEEE LE, byte arrays the raw bytes with NO
    length prefix."""
    from modeltracking_spark.operators.zstd import xxh64

    if physical == "INT32":
        raw = (value & 0xFFFFFFFF).to_bytes(4, "little")
    elif physical == "INT64":
        raw = (value & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    elif physical == "FLOAT":
        raw = struct.pack("<f", value)
    elif physical == "DOUBLE":
        raw = struct.pack("<d", value)
    elif physical in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        raw = value.encode("utf-8") if isinstance(value, str) \
            else bytes(value)
    else:
        raise NotImplementedError(
            f"bloom filter hashing for {physical} not supported")
    return xxh64(raw)


def sbbf_check(bitset: bytes, h: int) -> bool:
    """Split-block bloom filter membership: block = upper 32 hash
    bits scaled to the block count; inside it, each of the 8 words
    must carry the bit selected by (low32 * salt[i]) >> 27."""
    nblocks = len(bitset) // 32
    if nblocks == 0:
        return True  # degenerate filter cannot prune
    block = ((h >> 32) * nblocks) >> 32
    lo = h & 0xFFFFFFFF
    base = block * 32
    for i in range(8):
        bit = ((lo * _BLOOM_SALT[i]) & 0xFFFFFFFF) >> 27
        word = int.from_bytes(bitset[base + 4 * i:base + 4 * i + 4],
                              "little")
        if not (word >> bit) & 1:
            return False
    return True


def sbbf_insert(bitset: bytearray, h: int) -> None:
    nblocks = len(bitset) // 32
    block = ((h >> 32) * nblocks) >> 32
    lo = h & 0xFFFFFFFF
    base = block * 32
    for i in range(8):
        bit = ((lo * _BLOOM_SALT[i]) & 0xFFFFFFFF) >> 27
        off = base + 4 * i
        word = int.from_bytes(bitset[off:off + 4], "little")
        bitset[off:off + 4] = (word | (1 << bit)).to_bytes(4, "little")


@_malformed_guard("parquet")
def read_bloom_filter(fh, chunk: dict) -> bytes | None:
    """Read one column chunk's SBBF bitset (BloomFilterHeader +
    bitset at ColumnMetaData.bloom_filter_offset).  None when the
    chunk carries no filter; typed rejects for non-XXHASH /
    non-UNCOMPRESSED / non-BLOCK variants."""
    loc = chunk.get("bloom")
    if loc is None:
        return None
    off, ln = loc
    # file_path chunks (summary files) store their bytes — including
    # the bloom bitset — in the sibling data file, same as the
    # payload reads in read_column_chunk
    src, closing = _chunk_handle(fh, chunk)
    try:
        src.seek(off)
        # length may be absent in old writers: the header is tiny, read
        # generously and let numBytes bound the bitset
        blob = src.read(ln if ln else (1 << 20) + 64)
    finally:
        if closing:
            src.close()
    th = _Thrift(blob, 0)
    hdr = th.read_struct()
    nbytes = hdr.get(1)
    if nbytes is None or nbytes < 0 or nbytes > (1 << 27):
        raise ValueError("implausible bloom filter numBytes")
    if 1 not in (hdr.get(2) or {}):
        raise NotImplementedError(
            "non-BLOCK bloom filter algorithm not supported")
    if 1 not in (hdr.get(3) or {}):
        raise NotImplementedError(
            "non-XXHASH bloom filter hash not supported")
    if 1 not in (hdr.get(4) or {}):
        raise NotImplementedError(
            "compressed bloom filters not supported")
    bitset = blob[th.p:th.p + nbytes]
    if len(bitset) != nbytes:
        raise ValueError("bloom filter bitset overruns the file")
    if nbytes % 32:
        raise ValueError("bloom filter bitset not block-aligned")
    return bitset


@_malformed_guard("parquet")
def read_column_chunk_pages(fh, chunk: dict, col: dict,
                            pi: dict, keep: list[bool]) -> list:
    """Decode ONLY the data pages flagged in ``keep`` (plus the
    dictionary page, if any): seek each kept page's byte range from
    the OffsetIndex and hand a synthetic buffer to the page walker —
    unkept pages are never read OR decoded.  Sound because pages
    referenced by an OffsetIndex begin at record boundaries."""
    parts = []
    locs = pi["pages"]
    # page offsets, like all chunk offsets, point into the file the
    # chunk names — the sibling data file for file_path chunks
    src, closing = _chunk_handle(fh, chunk)
    try:
        dict_off = chunk.get("dictionary_page_offset")
        if dict_off is not None and locs:
            first_data = min(p["offset"] for p in locs)
            if first_data > dict_off:
                src.seek(dict_off)
                parts.append(src.read(first_data - dict_off))
        for k, p in zip(keep, locs):
            if k:
                src.seek(p["offset"])
                parts.append(src.read(p["size"]))
    finally:
        if closing:
            src.close()
    return _decode_chunk_buffer(b"".join(parts), chunk["codec"], col,
                                None)


@_malformed_guard("parquet")
def parquet_footer_from_file(fh) -> dict:
    """Footer via TAIL reads only: 64 KiB suffix first, widened once if
    the metadata is larger — no payload byte is touched at planning
    time."""
    import os

    fh.seek(0, os.SEEK_END)
    size = fh.tell()
    if size < 12:
        raise ValueError("file too small to be parquet")
    take = min(size, 65536)
    fh.seek(size - take)
    tail = fh.read(take)
    if tail[-4:] != _MAGIC:
        raise ValueError("missing PAR1 footer magic")
    meta_len = int.from_bytes(tail[-8:-4], "little")
    if meta_len + 8 > take:
        take = min(size, meta_len + 8)
        fh.seek(size - take)
        tail = fh.read(take)
    return parquet_footer(tail, size)


# ---------------------------------------------------------------------------
# Page-level decode
# ---------------------------------------------------------------------------

def _decompress(codec: str, body: bytes, uncompressed_size: int) -> bytes:
    if codec == "UNCOMPRESSED":
        return body
    if codec == "SNAPPY":
        from modeltracking_spark.operators.snappy import (
            snappy_block_decompress,
        )

        out = snappy_block_decompress(body)
    elif codec == "GZIP":
        from modeltracking_spark.operators.inflate import gzip_member

        out, _end = gzip_member(body, 0)
    elif codec == "BROTLI":
        from modeltracking_spark.operators.brotli_dec import (
            brotli_decompress,
        )

        out = brotli_decompress(body, max_output=uncompressed_size)
    elif codec == "ZSTD":
        from modeltracking_spark.operators.zstd import zstd_decompress

        out = zstd_decompress(body, max_output=uncompressed_size)
    elif codec == "LZ4_RAW":
        from modeltracking_spark.operators.lz4 import lz4_block_decompress

        out = lz4_block_decompress(body, max_out=uncompressed_size)
    else:
        raise NotImplementedError(
            f"parquet codec {codec} not supported (legacy hadoop "
            "framings LZO/LZ4 are plug-in rejects)"
        )
    if len(out) != uncompressed_size:
        raise ValueError(
            f"parquet page decompressed to {len(out)} bytes, header "
            f"says {uncompressed_size}"
        )
    return out


def rle_bp_hybrid(data: bytes, pos: int, bit_width: int,
                  count: int) -> tuple[list[int], int]:
    """The RLE/bit-packed hybrid (format spec "Encodings" §RLE):
    varint header — LSB 0 = RLE run (value in ceil(bw/8) LE bytes),
    LSB 1 = (header>>1) groups of 8 bit-packed values, LSB-first."""
    out: list[int] = []
    mask = (1 << bit_width) - 1
    width_bytes = (bit_width + 7) // 8
    while len(out) < count:
        header = 0
        shift = 0
        while True:
            if pos >= len(data):
                raise ValueError("truncated RLE hybrid header")
            b = data[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if header & 1:  # bit-packed groups
            n = (header >> 1) * 8
            nbytes = n * bit_width // 8
            if pos + nbytes > len(data):
                raise ValueError("truncated bit-packed run")
            # decode in bounded windows: one int over the WHOLE run
            # makes every shift O(run bytes) — quadratic in run
            # length (the r14 10x probe caught 26.8x on single-page
            # files whose runs span the full row group); per-window
            # ints keep the shift operand small and the total linear
            left = n
            while left > 0:
                take = min(4096, left)  # multiple of 8, like runs
                tb = take * bit_width // 8
                big = int.from_bytes(data[pos:pos + tb], "little")
                out.extend((big >> (i * bit_width)) & mask
                           for i in range(take))
                pos += tb
                left -= take
        else:  # RLE run
            run = header >> 1
            if run > (1 << 31):
                raise ValueError("implausible RLE run length")
            if pos + width_bytes > len(data):
                raise ValueError("truncated RLE run value")
            val = int.from_bytes(data[pos:pos + width_bytes], "little")
            pos += width_bytes
            if val > mask:
                raise ValueError("RLE value wider than the bit width")
            out.extend([val] * run)
    del out[count:]
    return out, pos


def bit_packed_levels(data: bytes, pos: int, bit_width: int,
                      count: int) -> tuple[list[int], int]:
    """The DEPRECATED standalone BIT_PACKED level encoding (format
    spec "Encodings" §Bit-packed, deprecated) that ancient
    parquet-mr emitted in v1 pages: values packed MSB-FIRST (the
    opposite bit order of the hybrid's groups) with NO length
    prefix — the byte span is ceil(count*bw/8)."""
    nbytes = (count * bit_width + 7) // 8
    if pos + nbytes > len(data):
        raise ValueError("truncated BIT_PACKED levels")
    chunk = data[pos:pos + nbytes]
    out = []
    bit = 0
    for _ in range(count):
        v = 0
        for _k in range(bit_width):
            v = (v << 1) | ((chunk[bit >> 3] >> (7 - (bit & 7))) & 1)
            bit += 1
        out.append(v)
    return out, pos + nbytes


def _v1_levels(plain: bytes, p: int, enc: int | None, bw: int,
               nvals: int, what: str) -> tuple[int, list[int]]:
    """v1-page level decode: RLE (4-byte length prefix + hybrid) or
    the deprecated BIT_PACKED (no prefix, MSB-first) — round 13,
    VERDICT r12 item 6."""
    if enc == 3:  # RLE
        if p + 4 > len(plain):
            raise ValueError(f"truncated v1 {what}-level prefix")
        ln = int.from_bytes(plain[p:p + 4], "little")
        p += 4
        if ln < 0 or p + ln > len(plain):
            raise ValueError(f"v1 {what} levels overrun the page")
        levels, _ = rle_bp_hybrid(plain, p, bw, nvals)
        return p + ln, levels
    if enc == 4:  # BIT_PACKED (deprecated)
        levels, p = bit_packed_levels(plain, p, bw, nvals)
        return p, levels
    raise NotImplementedError(
        f"v1 {what}-level encoding {enc} not supported "
        "(RLE and legacy BIT_PACKED are)")


def _uleb(data: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated ULEB128 varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("ULEB128 varint too long")


def _zz(data: bytes, pos: int) -> tuple[int, int]:
    n, pos = _uleb(data, pos)
    return (n >> 1) ^ -(n & 1), pos


def delta_binary_packed(data: bytes, pos: int, n: int,
                        bit_limit: int = 64) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (format spec Encodings.md §Delta Encoding):
    ULEB128 header (block size, miniblocks/block, total count, zigzag
    first value); per block a zigzag min-delta, one bit-width byte per
    miniblock, then LSB-first bit-packed (delta - min_delta) runs.
    Trailing miniblocks that would hold no values are omitted by
    writers; arithmetic wraps at the physical width (applied by the
    caller)."""
    block_size, pos = _uleb(data, pos)
    n_mini, pos = _uleb(data, pos)
    total, pos = _uleb(data, pos)
    first, pos = _zz(data, pos)
    if n_mini == 0 or block_size % (n_mini * 8):
        raise ValueError("bad DELTA_BINARY_PACKED block geometry")
    mini = block_size // n_mini
    if total < n:
        raise ValueError(
            f"DELTA_BINARY_PACKED holds {total} values, page needs {n}")
    out = [first]
    while len(out) < total:
        min_delta, pos = _zz(data, pos)
        if pos + n_mini > len(data):
            raise ValueError("truncated DELTA_BINARY_PACKED bit widths")
        widths = data[pos:pos + n_mini]
        pos += n_mini
        for w in widths:
            if len(out) >= total:
                break  # trailing miniblocks are omitted
            if w > bit_limit:
                raise ValueError(
                    f"DELTA_BINARY_PACKED bit width {w} too wide")
            nbytes = mini * w // 8
            if pos + nbytes > len(data):
                raise ValueError("truncated DELTA_BINARY_PACKED block")
            if w:
                big = int.from_bytes(data[pos:pos + nbytes], "little")
                mask = (1 << w) - 1
                deltas = [(big >> (j * w)) & mask for j in range(mini)]
            else:
                deltas = [0] * mini
            pos += nbytes
            last = out[-1]
            for d in deltas:
                last += min_delta + d
                out.append(last)
            del out[total:]
    return out[:n], pos


def _wrap_signed(vals: list[int], bits: int) -> list[int]:
    half, full = 1 << (bits - 1), 1 << bits
    return [((v + half) % full) - half for v in vals]


def delta_length_byte_array(data: bytes, pos: int,
                            n: int) -> tuple[list[bytes], int]:
    """DELTA_LENGTH_BYTE_ARRAY: DELTA_BINARY_PACKED lengths followed by
    the concatenated value bytes."""
    lens, pos = delta_binary_packed(data, pos, n, bit_limit=40)
    if any(ln < 0 for ln in lens):
        raise ValueError("negative DELTA_LENGTH_BYTE_ARRAY length")
    out = []
    for ln in lens:
        if pos + ln > len(data):
            raise ValueError("DELTA_LENGTH_BYTE_ARRAY overruns the page")
        out.append(data[pos:pos + ln])
        pos += ln
    return out, pos


def delta_byte_array(data: bytes, pos: int,
                     n: int) -> tuple[list[bytes], int]:
    """DELTA_BYTE_ARRAY (incremental encoding): DELTA_BINARY_PACKED
    prefix lengths + DELTA_LENGTH_BYTE_ARRAY suffixes;
    value[i] = value[i-1][:prefix[i]] + suffix[i]."""
    prefixes, pos = delta_binary_packed(data, pos, n, bit_limit=40)
    suffixes, pos = delta_length_byte_array(data, pos, n)
    out: list[bytes] = []
    prev = b""
    for pl, suf in zip(prefixes, suffixes):
        if pl < 0 or pl > len(prev):
            raise ValueError("DELTA_BYTE_ARRAY prefix exceeds previous")
        prev = prev[:pl] + suf
        out.append(prev)
    return out, pos


def byte_stream_split(phys: str, data: bytes, n: int,
                      type_length: int = 0) -> list:
    """BYTE_STREAM_SPLIT: the page body is K byte-planes of N bytes
    (plane j = byte j of every value); re-interleave and decode as
    PLAIN."""
    import numpy as np

    width = {"FLOAT": 4, "DOUBLE": 8, "INT32": 4, "INT64": 8,
             "FIXED_LEN_BYTE_ARRAY": type_length}.get(phys)
    if not width:
        raise NotImplementedError(
            f"BYTE_STREAM_SPLIT undefined for {phys}")
    if len(data) < n * width:
        raise ValueError("truncated BYTE_STREAM_SPLIT page")
    planes = np.frombuffer(data, np.uint8, n * width).reshape(width, n)
    inter = planes.T.tobytes()
    vals, _ = _plain_values(phys, inter, 0, n, type_length)
    return vals


def _plain_values(phys: str, data: bytes, pos: int, n: int,
                  type_length: int = 0):
    """PLAIN decode of ``n`` values starting at ``pos``; returns
    (values, new_pos)."""
    import numpy as np

    if phys == "BOOLEAN":
        nbytes = (n + 7) // 8
        if pos + nbytes > len(data):
            raise ValueError("truncated PLAIN boolean run")
        bits = np.unpackbits(
            np.frombuffer(data, np.uint8, nbytes, pos), bitorder="little"
        )[:n]
        return [bool(b) for b in bits], pos + nbytes
    if phys in ("INT32", "INT64", "FLOAT", "DOUBLE"):
        dt, w = {"INT32": ("<i4", 4), "INT64": ("<i8", 8),
                 "FLOAT": ("<f4", 4), "DOUBLE": ("<f8", 8)}[phys]
        if pos + n * w > len(data):
            raise ValueError(f"truncated PLAIN {phys} run")
        arr = np.frombuffer(data, dt, n, pos)
        return arr.tolist(), pos + n * w
    if phys == "BYTE_ARRAY":
        vals = []
        for _ in range(n):
            if pos + 4 > len(data):
                raise ValueError("truncated BYTE_ARRAY length")
            ln = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            if ln > len(data) - pos:
                raise ValueError("BYTE_ARRAY overruns the page")
            vals.append(data[pos:pos + ln])
            pos += ln
        return vals, pos
    if phys == "FIXED_LEN_BYTE_ARRAY":
        if type_length <= 0:
            raise ValueError("FIXED_LEN_BYTE_ARRAY without type_length")
        need = n * type_length
        if pos + need > len(data):
            raise ValueError("truncated FIXED_LEN_BYTE_ARRAY run")
        vals = [data[pos + i * type_length:pos + (i + 1) * type_length]
                for i in range(n)]
        return vals, pos + need
    if phys == "INT96":
        # legacy Spark/Hive timestamp: 12 bytes = LE uint64
        # nanoseconds-of-day + LE uint32 Julian day number; decoded
        # straight to epoch MICROSECONDS (the reader's timestamp
        # posture — same as INT64 timestamp columns)
        need = n * 12
        if pos + need > len(data):
            raise ValueError("truncated PLAIN INT96 run")
        vals = []
        for i in range(n):
            off = pos + i * 12
            # nanos is SIGNED: some writers (pyarrow among them) carry
            # pre-1970 instants as a later Julian day + negative
            # nanos-of-day rather than normalizing
            nanos = int.from_bytes(data[off:off + 8], "little",
                                   signed=True)
            jday = int.from_bytes(data[off + 8:off + 12], "little")
            vals.append((jday - _JULIAN_UNIX_EPOCH) * 86_400_000_000
                        + nanos // 1000)
        return vals, pos + need
    raise NotImplementedError(
        f"parquet physical type {phys} not supported"
    )


def _bits_for(n: int) -> int:
    return n.bit_length()


@_malformed_guard("parquet")
def read_column_chunk(fh, chunk: dict, col: dict,
                      with_defs: bool = False, raw: bool = False):
    """Decode ONE column chunk (the parallel-read unit next to the row
    group): seek to its byte range, walk dictionary + data pages, and
    return the fully assembled value list — ``None`` for nulls; for a
    LIST column, one Python list (or None/[]) per RECORD, assembled
    from the (repetition, definition) level pairs per the Dremel
    record-shredding rules the format defines.

    ``with_defs=True`` (flat columns only) additionally returns the
    per-record definition levels — the STRUCT assembly needs them to
    tell a null struct (def < d1) from a present struct with a null
    leaf (def == d1)."""
    start = chunk["data_page_offset"]
    if chunk.get("dictionary_page_offset") is not None:
        start = min(start, chunk["dictionary_page_offset"])
    src, closing = _chunk_handle(fh, chunk)
    try:
        src.seek(start)
        data = src.read(chunk["total_compressed_size"])
    finally:
        if closing:
            src.close()
    return _decode_chunk_buffer(data, chunk["codec"], col,
                                chunk["num_values"], with_defs, raw)


@_malformed_guard("parquet")
def _decode_chunk_buffer(data: bytes, codec: str, col: dict,
                         want: int | None, with_defs: bool = False,
                         raw: bool = False):
    """Walk a buffer of parquet pages (optional dictionary page first)
    and assemble values.  ``want=None`` decodes every page in the
    buffer — the page-selective path hands a SYNTHETIC buffer of the
    dictionary page + only the kept data pages (legal because pages
    referenced by an OffsetIndex begin at record boundaries, so each
    page decodes independently)."""
    phys = col["physical"]
    max_def = col.get("max_def", 1 if col["optional"] else 0)
    max_rep = col.get("max_rep", 0)
    def_bw = _bits_for(max_def)
    rep_bw = _bits_for(max_rep)
    dictionary: list | None = None
    out: list = []
    all_defs: list = []  # per-record def levels (with_defs callers)
    all_reps: list = []  # raw mode: full (rep, def, present-vals)
    cur: list | None = None  # list record under assembly (spans pages)
    done = 0  # value slots (triplets) consumed, vs metadata num_values
    pos = 0
    while (done < want) if want is not None else (pos < len(data)):
        if pos >= len(data):
            raise ValueError("column chunk ended before all values")
        th = _Thrift(data, pos)
        ph = th.read_struct()
        pos = th.p
        ptype = ph.get(1)
        unc = ph.get(2, 0)
        comp = ph.get(3, 0)
        if comp < 0 or pos + comp > len(data):
            raise ValueError("parquet page body overruns the chunk")
        body = data[pos:pos + comp]
        pos += comp
        if ptype == 2:  # DICTIONARY_PAGE
            dph = ph.get(7) or {}
            nvals = dph.get(1, 0)
            if dph.get(2) not in (0, 2):  # PLAIN / PLAIN_DICTIONARY
                raise ValueError("dictionary page must be PLAIN")
            plain = _decompress(codec, body, unc)
            dictionary, _ = _plain_values(
                phys, plain, 0, nvals, col["type_length"])
            continue
        if ptype == 0:  # DATA_PAGE v1
            dh = ph.get(5) or {}
            nvals = dh.get(1, 0)
            enc = dh.get(2)
            plain = _decompress(codec, body, unc)
            p = 0
            reps = [0] * nvals
            if max_rep:
                p, reps = _v1_levels(plain, p, dh.get(4), rep_bw,
                                     nvals, "repetition")
            if max_def:
                p, defs = _v1_levels(plain, p, dh.get(3), def_bw,
                                     nvals, "definition")
            else:
                defs = [max_def] * nvals
        elif ptype == 3:  # DATA_PAGE_V2
            dh = ph.get(8) or {}
            nvals = dh.get(1, 0)
            enc = dh.get(4)
            rep_len = dh.get(6, 0)
            def_len = dh.get(5, 0)
            reps = [0] * nvals
            if max_rep:
                reps, _ = rle_bp_hybrid(body[:rep_len], 0, rep_bw, nvals)
            elif rep_len:
                raise ValueError(
                    "repetition bytes on a non-repeated column")
            levels = body[rep_len:rep_len + def_len]
            rest = body[rep_len + def_len:]
            if max_def:
                defs, _ = rle_bp_hybrid(levels, 0, def_bw, nvals)
            else:
                defs = [max_def] * nvals
            if dh.get(7, True):
                plain = _decompress(codec, rest, unc - def_len - rep_len)
            else:
                plain = rest
            p = 0
        elif ptype == 1:  # INDEX_PAGE: skip
            continue
        else:
            raise ValueError(f"unknown parquet page type {ptype}")

        n_present = sum(1 for d in defs if d == max_def)
        if enc == 0:  # PLAIN
            vals, _ = _plain_values(phys, plain, p, n_present,
                                    col["type_length"])
        elif enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
            if dictionary is None:
                raise ValueError(
                    "dictionary-encoded page before any dictionary page")
            if p >= len(plain):
                raise ValueError("empty dictionary-index section")
            bw = plain[p]
            if bw > 32:
                raise ValueError(f"implausible index bit width {bw}")
            idx, _ = rle_bp_hybrid(plain, p + 1, bw, n_present) \
                if bw else ([0] * n_present, p + 1)
            try:
                vals = [dictionary[i] for i in idx]
            except IndexError:
                raise ValueError("dictionary index out of range") from None
        elif enc == 3:  # RLE: the spec allows it for BOOLEAN values
            if phys != "BOOLEAN":
                raise NotImplementedError(
                    "RLE data encoding is only defined for booleans")
            if p + 4 > len(plain):
                raise ValueError("truncated RLE boolean section")
            bits, _ = rle_bp_hybrid(plain, p + 4, 1, n_present)
            vals = [bool(b) for b in bits]
        elif enc == 5:  # DELTA_BINARY_PACKED
            if phys not in ("INT32", "INT64"):
                raise NotImplementedError(
                    "DELTA_BINARY_PACKED is only defined for ints")
            vals, _ = delta_binary_packed(plain, p, n_present)
            vals = _wrap_signed(vals, 32 if phys == "INT32" else 64)
        elif enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
            if phys != "BYTE_ARRAY":
                raise NotImplementedError(
                    "DELTA_LENGTH_BYTE_ARRAY needs BYTE_ARRAY")
            vals, _ = delta_length_byte_array(plain, p, n_present)
        elif enc == 7:  # DELTA_BYTE_ARRAY (incremental strings)
            if phys not in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
                raise NotImplementedError(
                    "DELTA_BYTE_ARRAY needs a byte-array type")
            vals, _ = delta_byte_array(plain, p, n_present)
        elif enc == 9:  # BYTE_STREAM_SPLIT
            vals = byte_stream_split(phys, plain[p:], n_present,
                                     col["type_length"])
        else:
            raise NotImplementedError(
                f"parquet encoding #{enc} not supported")
        if raw:
            # triplet passthrough for the GENERAL Dremel assembly
            # (arbitrary nesting): present values only, levels as-is
            all_reps.extend(reps)
            all_defs.extend(defs)
            out.extend(vals)
        elif max_rep == 0:
            if with_defs:
                all_defs.extend(defs)
            if max_def == 0:
                out.extend(vals)
            else:
                it = iter(vals)
                out.extend(next(it) if d == max_def else None
                           for d in defs)
        else:  # one-level LIST assembly (records may span v1 pages)
            it = iter(vals)
            d1, d2 = col["d1"], col["d2"]
            for r, d in zip(reps, defs):
                if r == 0:  # new record
                    if d < d1:
                        out.append(None)
                        cur = None
                        continue
                    cur = []
                    out.append(cur)
                    if d < d2:
                        continue  # empty list
                elif cur is None:
                    raise ValueError(
                        "repetition level continues a null record")
                cur.append(next(it) if d == max_def else None)
        done += nvals
    if want is not None and done != want:
        raise ValueError(
            f"column chunk decoded {done} value slots, metadata says "
            f"{want}")
    if raw:
        return all_reps, all_defs, out
    return (out, all_defs) if with_defs else out


def _value_conv(col: dict):
    """Per-leaf Python-value converter (None when values pass
    through): UTF8 bytes -> str, DECIMAL unscaled ints / big-endian
    two's-complement byte arrays -> decimal.Decimal, raw byte views ->
    bytes."""
    dec = col.get("decimal")
    if dec is not None:
        from decimal import Context, Decimal

        _p, s = dec
        # default context precision (28) silently rounds 29+-digit
        # unscaled values; the format allows up to 38
        ctx = Context(prec=41)
        if col["physical"] in ("INT32", "INT64"):
            return lambda v: Decimal(v).scaleb(-s, ctx)
        if col["physical"] in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
            return lambda v: Decimal(
                int.from_bytes(v, "big", signed=True)).scaleb(-s, ctx)
        raise NotImplementedError(
            f"DECIMAL on physical {col['physical']} not supported")
    if col["physical"] == "BYTE_ARRAY" and col["string"]:
        return lambda v: v.decode("utf-8")
    if col["physical"] in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        return bytes
    return None


@_malformed_guard("parquet")
def read_row_group(fh, footer: dict, rg_index: int,
                   columns: list[str] | None = None,
                   row_ranges: list | None = None) -> dict:
    """Decode one row group into ``{column_name: [values]}`` —
    only the projected columns' byte ranges are read.  STRUCT columns
    come back as one dict (or None) per record.

    ``row_ranges`` (sorted disjoint [start, end) row intervals within
    the row group) activates PAGE-LEVEL selection: for columns that
    carry an OffsetIndex, only pages overlapping the ranges are read
    and decoded (the page-index pruning path); columns without one
    decode fully and are trimmed.  All returned columns are aligned
    on exactly the rows in the ranges."""
    rg = footer["row_groups"][rg_index]
    rg_rows = rg["num_rows"]
    if row_ranges is not None and row_ranges == [(0, rg_rows)]:
        row_ranges = None  # full group: take the ordinary path
    by_name = {c["name"]: c for c in footer["columns"]}
    names = columns or [c["name"] for c in footer["columns"]]
    out = {}
    for name in names:
        col = by_name.get(name)
        if col is None:
            raise ValueError(f"column {name!r} not in this row group")
        if col.get("kind") == "struct":
            recs: list | None = None
            for f_ in col["fields"]:
                if f_["path"] not in rg["chunks"]:
                    raise ValueError(
                        f"column {f_['path']!r} not in this row group")
                vals, defs = read_column_chunk(
                    fh, rg["chunks"][f_["path"]], f_, with_defs=True)
                conv = _value_conv(f_)
                if recs is None:
                    d1 = f_["d1"]
                    recs = [None if d < d1 else {} for d in defs]
                for rec, v in zip(recs, vals):
                    if rec is not None:
                        rec[f_["name"]] = (
                            conv(v) if conv is not None and
                            v is not None else v)
            recs = recs if recs is not None else []
            if row_ranges is not None:
                recs = _slice_rows(recs, [(0, rg_rows)], row_ranges)
            out[name] = recs
            continue
        if col.get("kind") == "nested":
            # GENERAL Dremel assembly: each leaf decodes raw triplets,
            # builds its skeleton against its repeated-ancestor
            # thresholds, and the type-tree merge zips siblings into
            # dicts/lists/maps with cross-leaf consistency checks
            parts = []
            for leaf in col["leaves"]:
                if leaf["path"] not in rg["chunks"]:
                    raise ValueError(
                        f"column {leaf['path']!r} not in this row "
                        "group")
                reps, defs, vals = read_column_chunk(
                    fh, rg["chunks"][leaf["path"]], leaf, raw=True)
                conv = _value_conv(leaf)
                if conv is not None:
                    vals = [conv(v) for v in vals]
                parts.append(_leaf_skeleton(
                    reps, defs, vals, leaf["_lists"],
                    leaf["max_def"]))
            counts = {len(p) for p in parts}
            if len(counts) != 1:
                raise ValueError(
                    f"nested column {name!r}: leaves disagree on "
                    f"record count {sorted(counts)}")
            tree = col["tree"]
            recs = [_merge_nested(tree, [p[j] for p in parts])
                    for j in range(counts.pop())]
            if row_ranges is not None:
                recs = _slice_rows(recs, [(0, rg_rows)], row_ranges)
            out[name] = recs
            continue
        if col.get("kind") == "map":
            # both leaves share the map's repetition structure, so the
            # one-level list assembly rebuilds aligned per-record
            # key/value lists that zip into dicts (spark's map-key
            # dedup policy is EXCEPTION; a file with duplicate keys in
            # one map is malformed for our purposes and rejected)
            parts = []
            for sub in (col["key"], col["value"]):
                if sub["path"] not in rg["chunks"]:
                    raise ValueError(
                        f"column {sub['path']!r} not in this row group")
                vals = read_column_chunk(
                    fh, rg["chunks"][sub["path"]], sub)
                conv = _value_conv(sub)
                if conv is not None:
                    vals = [None if rec is None else
                            [conv(v) if v is not None else None
                             for v in rec] for rec in vals]
                parts.append(vals)
            recs = []
            for ks, vs in zip(parts[0], parts[1]):
                if ks is None or vs is None:
                    if ks is not None or vs is not None:
                        raise ValueError(
                            f"map column {name!r}: key/value chunks "
                            "disagree on record nulls")
                    recs.append(None)
                    continue
                if len(ks) != len(vs):
                    raise ValueError(
                        f"map column {name!r}: key/value chunks "
                        "disagree on entry counts")
                if any(k is None for k in ks):
                    raise ValueError(
                        f"map column {name!r} carries a null key")
                rec = dict(zip(ks, vs))
                if len(rec) != len(ks):
                    raise ValueError(
                        f"map column {name!r} carries duplicate keys "
                        "in one record")
                recs.append(rec)
            if row_ranges is not None:
                recs = _slice_rows(recs, [(0, rg_rows)], row_ranges)
            out[name] = recs
            continue
        if col["path"] not in rg["chunks"]:
            raise ValueError(f"column {name!r} not in this row group")
        chunk = rg["chunks"][col["path"]]
        if row_ranges is None:
            vals = read_column_chunk(fh, chunk, col)
        elif chunk.get("offset_index") is not None:
            pi = read_page_index(fh, chunk, col)
            spans = page_row_spans(pi, rg_rows)
            keep = [any(a < e and s < b for s, e in row_ranges)
                    for a, b in spans]
            vals = read_column_chunk_pages(fh, chunk, col, pi, keep)
            kept_spans = [sp for sp, k in zip(spans, keep) if k]
            vals = _slice_rows(vals, kept_spans, row_ranges)
        else:
            vals = _slice_rows(read_column_chunk(fh, chunk, col),
                               [(0, rg_rows)], row_ranges)
        conv = _value_conv(col)
        if conv is not None:
            if col.get("kind") == "list":
                vals = [None if rec is None else
                        [conv(v) if v is not None else None for v in rec]
                        for rec in vals]
            else:
                vals = [conv(v) if v is not None else None
                        for v in vals]
        out[name] = vals
    return out
