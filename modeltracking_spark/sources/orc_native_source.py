"""Spark Python DataSource over the from-spec ORC reader —
``spark.read.format("orc_native").option("path", file_or_dir)``.

Same design as the parquet_native sibling, at ORC's own parallel-read
grain:

- **Footer-only planning**: postscript + footer protobuf via TAIL
  reads; payload bytes are never touched at planning time.
- **Stripe grain**: one InputPartition per (file, stripe).
- **Column projection**: ``.option("columns", "a,b")`` — only the
  projected columns' streams are decompressed (stream offsets come
  from the stripe footer, so unprojected streams are skipped).
- **From-spec everything below**: protobuf metadata, chunked
  compression framing (zlib/snappy/lz4/zstd via this repo's own
  decoders), byte/boolean RLE, integer RLEv1 + the four RLEv2
  sub-encodings, direct and dictionary strings, PRESENT null streams
  (operators/orc_native.py).

Type mapping: LONG→bigint, INT→int, SHORT→smallint, BYTE→tinyint,
FLOAT/DOUBLE, BOOLEAN, STRING/VARCHAR/CHAR→string, BINARY→binary,
DATE→int (epoch days), TIMESTAMP→bigint (epoch micros — round 11:
both the ORC_CPP signed-nanos and the Java trunc-plus-borrow pre-1970
conventions decode to the reference readers' canonical values),
STRUCT→struct<...>, DECIMAL→decimal(p,s), MAP→map<k,v>, and
ARBITRARY LIST/STRUCT/MAP nesting via the recursive type tree +
presence-based recursive decode (all round 12).  UNION (round 13 —
the last ORC type-tree arm) surfaces as the tagged struct
``struct<tag:tinyint, field0:.., field1:..>``; the low-level WRITER
emits ``union<t0,t1>`` columns too (the type tree is complete both
directions), though the Spark SINK cannot produce one — Spark has
no union type.

Round 12 adds the parquet sibling's two missing arms: pushFilters
STRIPE-STATISTICS pruning (``.option("filter_pushdown","true")``,
zone maps parsed from the file's Metadata section) and the streaming
sink (``writeStream.format("orc_native")``, per-epoch 2PC with the
``_epochs`` idempotence log).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from modeltracking_spark.sources.sink_common import (
    TwoPhaseFileSinkWriter,
    TwoPhaseStreamFileSinkWriter,
)


def _files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".orc")
        )
    return [path]


_SPARK_TYPES = {
    "BOOLEAN": "boolean", "BYTE": "tinyint", "SHORT": "smallint",
    "INT": "int", "LONG": "bigint", "FLOAT": "float",
    "DOUBLE": "double", "STRING": "string", "VARCHAR": "string",
    "CHAR": "string", "BINARY": "binary", "DATE": "int",
    # timestamps surface as their physical epoch-micros (the same
    # posture as the parquet_native reader)
    "TIMESTAMP": "bigint", "TIMESTAMP_INSTANT": "bigint",
}

_PA_TYPES = {
    "BOOLEAN": "bool_", "BYTE": "int8", "SHORT": "int16",
    "INT": "int32", "LONG": "int64", "FLOAT": "float32",
    "DOUBLE": "float64", "STRING": "string", "VARCHAR": "string",
    "CHAR": "string", "BINARY": "binary", "DATE": "int32",
    "TIMESTAMP": "int64", "TIMESTAMP_INSTANT": "int64",
}


def _spark_leaf(kind: str, node: dict, pfx: str = "") -> str:
    """Spark DDL for one leaf — DECIMAL carries (p, s) on the footer
    node (``pfx`` selects the list-child key variant)."""
    if kind == "DECIMAL":
        p = node[pfx + "precision"] if pfx else node["precision"]
        sc = node[pfx + "scale"] if pfx else node["scale"]
        return f"decimal({p},{sc})"
    return _SPARK_TYPES[kind]


def _pa_leaf(kind: str, node: dict, pfx: str = ""):
    import pyarrow as pa

    if kind == "DECIMAL":
        p = node[pfx + "precision"] if pfx else node["precision"]
        sc = node[pfx + "scale"] if pfx else node["scale"]
        return pa.decimal128(p, sc)
    return getattr(pa, _PA_TYPES[kind])()


def _spark_tree(node: dict) -> str:
    """Spark DDL for one GENERAL nested type-tree node (round 12)."""
    k = node["kind"]
    if k == "STRUCT":
        inner = ", ".join(
            f"`{f['name']}`: {_spark_tree(f)}"
            for f in node["fields"])
        return f"struct<{inner}>"
    if k == "LIST":
        return f"array<{_spark_tree(node['element'])}>"
    if k == "MAP":
        return (f"map<{_spark_tree(node['key'])}, "
                f"{_spark_tree(node['value'])}>")
    if k == "UNION":
        # tagged-struct mapping (round 13): Spark has no union type
        inner = ", ".join(
            ["`tag`: tinyint"] +
            [f"`field{i}`: {_spark_tree(v)}"
             for i, v in enumerate(node["variants"])])
        return f"struct<{inner}>"
    if k == "DECIMAL":
        return f"decimal({node['precision']},{node['scale']})"
    return _SPARK_TYPES[k]


def _pa_tree(node: dict):
    import pyarrow as pa

    k = node["kind"]
    if k == "STRUCT":
        return pa.struct([pa.field(f["name"], _pa_tree(f))
                          for f in node["fields"]])
    if k == "LIST":
        return pa.list_(_pa_tree(node["element"]))
    if k == "MAP":
        return pa.map_(_pa_tree(node["key"]),
                       _pa_tree(node["value"]))
    if k == "UNION":
        return pa.struct(
            [pa.field("tag", pa.int8())] +
            [pa.field(f"field{i}", _pa_tree(v))
             for i, v in enumerate(node["variants"])])
    if k == "DECIMAL":
        return pa.decimal128(node["precision"], node["scale"])
    return getattr(pa, _PA_TYPES[k])()



class _OrcNativeReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError(
                "orc_native source requires .option('path', ...)")
        self.files = _files(path)
        cols = options.get("columns")
        self.columns = ([c.strip() for c in cols.split(",") if c.strip()]
                        if cols else None)
        self.target_bytes = int(options.get("target_partition_bytes",
                                            "0"))
        self.pruning_filters = []
        self._bloom_cache: dict = {}

    def _stripe_survives(self, footer: dict, s: int) -> bool:
        """Can stripe ``s`` contain a matching row, per the Metadata
        section's per-stripe zone maps?  Conservative: absent stats,
        struct columns, and non-ASCII string bounds (whose byte order
        may disagree with a reference writer's comparator for
        supplementary characters) never prune."""
        from modeltracking_spark.sources.parquet_native_source import (
            _rg_may_match,
        )

        stats_all = footer.get("stripe_stats") or []
        if not self.pruning_filters or s >= len(stats_all):
            return True
        cid_of = {c["name"]: c["column"] for c in footer["columns"]
                  if c["kind"] not in ("STRUCT", "NESTED")}
        srows = footer["stripes"][s]["num_rows"]
        per_col = stats_all[s]
        for flt in self.pruning_filters:
            name = flt.attribute[0]
            cid = cid_of.get(name)
            if cid is None or cid >= len(per_col):
                continue
            cs = per_col[cid]
            stats = {"null_count": (srows - cs["n"]
                                    if cs["has_null"] else 0)}
            lo, hi = cs.get("min"), cs.get("max")
            if isinstance(lo, str) and not (
                    lo.isascii() and isinstance(hi, str)
                    and hi.isascii()):
                lo = hi = None
            if lo is not None:
                stats["min"] = lo
            if hi is not None:
                stats["max"] = hi
            if not _rg_may_match(stats, srows, flt):
                return False
        return True

    def _bloom_survives(self, path, footer, s: int) -> bool:
        """ORC bloom-filter stripe pruning (round 12): for EqualTo/In
        on STRING columns, hash each filter value with ORC-java's
        Murmur3 hash64 and probe every row-group bloom in the stripe
        (BLOOM_FILTER_UTF8 stream) — the stripe dies only when every
        value is provably absent from every row group.  Zero false
        negatives against ORC-java's own filters (pinned in tests),
        so every prune is sound; non-string columns and bloom-less
        stripes keep conservatively."""
        from pyspark.sql.datasource import EqualTo, In

        from modeltracking_spark.operators.orc_native import (
            murmur3_hash64,
            orc_bloom_maybe,
            read_bloom_index,
        )

        if not self.pruning_filters:
            return True
        col_of = {c["name"]: c for c in footer["columns"]}
        for flt in self.pruning_filters:
            name = flt.attribute[0]
            col = col_of.get(name)
            if col is None or col["kind"] not in ("STRING", "VARCHAR",
                                                  "CHAR"):
                continue
            if isinstance(flt, EqualTo):
                values = [flt.value]
            elif isinstance(flt, In):
                values = list(flt.value)
            else:
                continue
            if not values or any(not isinstance(v, str)
                                 for v in values):
                continue
            key = (path, s, col["column"])
            blooms = self._bloom_cache.get(key)
            if blooms is None:
                try:
                    with open(path, "rb") as fh:
                        blooms = read_bloom_index(
                            fh, footer, footer["stripes"][s],
                            col["column"])
                except (ValueError, NotImplementedError):
                    blooms = []
                self._bloom_cache[key] = blooms or []
            if not blooms:
                continue
            hit = False
            for v in values:
                h = murmur3_hash64(v.encode("utf-8"))
                if any(orc_bloom_maybe(longs, k, h)
                       for k, longs in blooms):
                    hit = True
                    break
            if not hit:
                return False
        return True

    def partitions(self):
        from modeltracking_spark.operators.orc_native import (
            orc_footer_from_file,
        )

        parts = []
        ref_sig = ref_file = None
        for f in self.files:
            with open(f, "rb") as fh:  # TAIL reads only
                footer = orc_footer_from_file(fh)
            # planning-time drift check (mirrors parquet_native): the
            # declared schema came from the first file's footer, so
            # any disagreeing file must reject at planning time
            sig = [(c["name"], c["kind"], c.get("child_kind"),
                    c.get("tree"),
                    tuple(sorted((c.get("key") or {}).items()))
                    + tuple(sorted((c.get("value") or {}).items())),
                    c.get("precision"), c.get("scale"),
                    c.get("child_precision"), c.get("child_scale"),
                    tuple((x["name"], x["kind"], x.get("precision"),
                           x.get("scale"))
                          for x in c.get("fields") or ()))
                   for c in footer["columns"]]
            if ref_sig is None:
                ref_sig, ref_file = sig, f
            elif sig != ref_sig:
                raise ValueError(
                    f"orc_native: schema drift inside directory — "
                    f"{f} declares columns {sig} but {ref_file} "
                    f"declares {ref_sig}; all files under one path "
                    f"must share name/kind layout")
            survivors = [
                (s, st["index_length"] + st["data_length"]
                 + st["footer_length"])
                for s, st in enumerate(footer["stripes"])
                if self._stripe_survives(footer, s)
                and self._bloom_survives(f, footer, s)
            ]
            # the same scale knob as the parquet source and the
            # compressed-scan tier: at 100 TB of small stripes, one
            # partition per stripe floods the scheduler — group
            # CONSECUTIVE stripes to >= target bytes
            if self.target_bytes <= 0:
                groups = [[s] for s, _ in survivors]
            else:
                groups, cur, cur_b = [], [], 0
                for s, size in survivors:
                    if cur and (cur_b >= self.target_bytes
                                or s != cur[-1] + 1):
                        groups.append(cur)
                        cur, cur_b = [], 0
                    cur.append(s)
                    cur_b += size
                if cur:
                    groups.append(cur)
            parts.extend(
                InputPartition((f, g, self.columns)) for g in groups)
        if not parts:
            # pyspark treats an EMPTY partitions() result as "reader
            # has no partitions()" and calls read(None) — hand it one
            # sentinel partition with no stripes instead
            parts = [InputPartition((self.files[0], [], self.columns))]
        return parts

    def read(self, partition):
        import pyarrow as pa

        from modeltracking_spark.operators.orc_native import (
            orc_footer_from_file,
            read_stripe,
        )

        path, stripes, columns = partition.value
        with open(path, "rb") as fh:
            footer = orc_footer_from_file(fh)
            by_name = {c["name"]: c for c in footer["columns"]}
            names = columns or [c["name"] for c in footer["columns"]]
            for stripe in stripes:
                data = read_stripe(fh, footer, stripe, columns)
                arrays, fields = [], []
                for n in names:
                    c = by_name[n]
                    if c["kind"] == "NESTED":
                        typ = _pa_tree(c["tree"])
                    elif c["kind"] == "MAP":
                        typ = pa.map_(
                            _pa_leaf(c["key"]["kind"], c["key"]),
                            _pa_leaf(c["value"]["kind"], c["value"]))
                    elif c["kind"] == "LIST":
                        typ = pa.list_(
                            _pa_leaf(c["child_kind"], c, "child_"))
                    elif c["kind"] == "STRUCT":
                        typ = pa.struct([
                            pa.field(f_["name"],
                                     _pa_leaf(f_["kind"], f_))
                            for f_ in c["fields"]])
                    else:
                        typ = _pa_leaf(c["kind"], c)
                    arrays.append(pa.array(data[n], typ))
                    fields.append(pa.field(n, typ))
                yield pa.RecordBatch.from_arrays(
                    arrays, schema=pa.schema(fields))


class _OrcNativePruningReader(_OrcNativeReader):
    """The filter-pushdown variant, selected by
    ``.option("filter_pushdown", "true")`` — a separate class because
    Spark asserts on ANY reader that implements ``pushFilters`` when
    ``spark.sql.python.filterPushdown.enabled`` is false (same seam
    as the parquet sibling)."""

    def pushFilters(self, filters):
        """Stripe-statistics pruning off the Metadata section's zone
        maps: comparison/null filters on flat columns are REMEMBERED
        for planning, and EVERY filter is returned as still-needed —
        Spark re-evaluates them row-level, so pruning can only skip
        stripes whose statistics PROVE no row matches (the safe
        double-filter contract, mirroring
        parquet_native_source.pushFilters)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        usable = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                  LessThanOrEqual, In, IsNull, IsNotNull)
        kept = list(filters)
        self.pruning_filters = [
            f for f in kept
            if isinstance(f, usable) and len(f.attribute) == 1
        ]
        return kept  # Spark still applies everything row-level


class OrcNativeDataSource(DataSource):
    """``spark.read.format("orc_native")`` after
    ``spark.dataSource.register(OrcNativeDataSource)``.

    ``.option("filter_pushdown", "true")`` (requires the session conf
    ``spark.sql.python.filterPushdown.enabled=true``) activates
    stripe-statistics pruning via ``pushFilters``.

    ``df.writeStream.format("orc_native")`` lands each micro-batch
    through the shared per-epoch two-phase commit (exactly-once via
    the ``_epochs`` idempotence log, same protocol as the parquet
    streaming sink)."""

    @classmethod
    def name(cls) -> str:
        return "orc_native"

    def schema(self) -> str:
        from modeltracking_spark.operators.orc_native import (
            orc_footer_from_file,
        )

        files = _files(self.options.get("path", ""))
        if not files:
            raise ValueError("orc_native: no .orc files at path")
        with open(files[0], "rb") as fh:
            footer = orc_footer_from_file(fh)
        cols = self.options.get("columns")
        names = ([c.strip() for c in cols.split(",") if c.strip()]
                 if cols else None)
        by_name = {c["name"]: c for c in footer["columns"]}
        sel = names or [c["name"] for c in footer["columns"]]

        def _t(c):
            if c["kind"] == "NESTED":
                return _spark_tree(c["tree"])
            if c["kind"] == "MAP":
                k = _spark_leaf(c["key"]["kind"], c["key"])
                v = _spark_leaf(c["value"]["kind"], c["value"])
                return f"map<{k}, {v}>"
            if c["kind"] == "LIST":
                el = _spark_leaf(c["child_kind"], c, "child_")
                return f"array<{el}>"
            if c["kind"] == "STRUCT":
                inner = ", ".join(
                    f"`{f_['name']}`: {_spark_leaf(f_['kind'], f_)}"
                    for f_ in c["fields"])
                return f"struct<{inner}>"
            return _spark_leaf(c["kind"], c)

        return ", ".join(f"`{n}` {_t(by_name[n])}" for n in sel)

    def reader(self, schema):
        if str(self.options.get("filter_pushdown", "")).lower() == "true":
            return _OrcNativePruningReader(self.options, schema)
        return _OrcNativeReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        import os

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "orc_native sink requires .option('path', ...)")
        os.makedirs(path, exist_ok=True)
        return _OrcNativeSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        import os

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "orc_native sink requires .option('path', ...)")
        os.makedirs(path, exist_ok=True)
        return _OrcNativeStreamSinkWriter(self.options, schema,
                                          overwrite)


def _orc_sink_schema(schema) -> list[tuple]:
    """Spark StructType -> the ORC writer's (name, type, nullable).
    Fully recursive since round 12: arrays/structs/maps compose to
    any depth — one-level shapes keep their dedicated writer paths.
    Timestamps and dates nest freely since round 13 (VERDICT r12
    item 4): the epoch-micros/epoch-days conversion routes through
    the recursive converter compiled from the type string
    (``_instant_converter``), so nested instants no longer bypass
    it."""
    from pyspark.sql import types as t

    base = {t.BooleanType: "boolean", t.IntegerType: "int32",
            t.LongType: "int64", t.FloatType: "float",
            t.DoubleType: "double", t.StringType: "string",
            t.BinaryType: "binary", t.TimestampType: "timestamp",
            t.DateType: "date"}

    def _type_str(dt) -> str:
        if isinstance(dt, t.DecimalType):
            return f"decimal({dt.precision},{dt.scale})"
        if isinstance(dt, t.ArrayType):
            el = _type_str(dt.elementType)
            return f"list<{el}{'?' if dt.containsNull else ''}>"
        if isinstance(dt, t.MapType):
            kt = _type_str(dt.keyType)
            vt = _type_str(dt.valueType)
            vt += "?" if dt.valueContainsNull else ""
            return f"map<{kt},{vt}>"
        if isinstance(dt, t.StructType):
            parts = []
            for sf in dt.fields:
                st = _type_str(sf.dataType)
                parts.append(
                    f"{sf.name}:{st}{'?' if sf.nullable else ''}")
            return f"struct<{','.join(parts)}>"
        tp = base.get(type(dt))
        if tp is None:
            raise NotImplementedError(
                f"orc_native sink: type {dt} not supported")
        return tp

    return [(f.name, _type_str(f.dataType), f.nullable)
            for f in schema.fields]


def _ts_to_micros(v):
    import datetime as dt

    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        # integer arithmetic — float .timestamp() can lose a
        # microsecond at large epochs
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        return (v - epoch) // dt.timedelta(microseconds=1)
    return int(v)


def _date_to_days(v):
    import datetime as dt

    if isinstance(v, dt.date):
        return (v - dt.date(1970, 1, 1)).days
    return int(v)


def _instant_converter(typ: str):
    """Compile a type string into a value converter that rewrites
    every timestamp -> epoch micros and date -> epoch days at any
    nesting depth, following arrow's to_pydict shapes (struct=dict,
    map=list of (k, v) pairs, list=list).  Returns None when the
    type carries no instant anywhere — the identity fast path."""
    from modeltracking_spark.operators.orc_write import _split_top

    typ = typ.strip()
    if typ.endswith("?"):
        typ = typ[:-1]
    if typ == "timestamp":
        return _ts_to_micros
    if typ == "date":
        return _date_to_days
    if typ.startswith("list<") and typ.endswith(">"):
        inner = _instant_converter(typ[5:-1])
        if inner is None:
            return None
        return lambda v: [None if x is None else inner(x) for x in v]
    if typ.startswith("map<") and typ.endswith(">"):
        kt, vt = _split_top(typ[4:-1])
        kc = _instant_converter(kt)
        vc = _instant_converter(vt)
        if kc is None and vc is None:
            return None
        kc = kc or (lambda x: x)
        vc = vc or (lambda x: x)

        def conv_map(v):
            items = v.items() if isinstance(v, dict) else v
            return [(kc(k), None if x is None else vc(x))
                    for k, x in items]

        return conv_map
    if typ.startswith("struct<") and typ.endswith(">"):
        fields = []
        for part in _split_top(typ[7:-1]):
            part = part.strip()
            if not part:
                continue
            fname, _, ftyp = part.partition(":")
            fields.append((fname.strip(),
                           _instant_converter(ftyp.strip())))
        if all(c is None for _, c in fields):
            return None

        def conv_struct(v):
            out = dict(v)
            for fname, c in fields:
                if c is not None and out.get(fname) is not None:
                    out[fname] = c(out[fname])
            return out

        return conv_struct
    return None



class _OrcSinkHooks:
    """Format half shared by the batch and streaming ORC sinks:
    executor-side from-spec encode, one file per task, a task
    buffering at most ONE stripe before its bytes stream to the temp
    file; Spark TIMESTAMP/DATE values — top-level or nested at any
    depth — land as the format's seconds-from-2015 + packed-nanos /
    epoch-days streams (pre-1970 follows the ORC Java writer
    convention — floor seconds, borrow into nanos — since round 13;
    see orc_write.py)."""

    suffix = ".orc"

    def __init__(self, options, schema, overwrite: bool):
        super().__init__(options.get("path"), _orc_sink_schema(schema),
                         overwrite)
        self.codec = options.get("codec", "ZLIB").upper()
        self.flush_rows = int(options.get("stripe_rows",
                                          str(1 << 18)))

    def convert_value(self, typ: str, v):
        try:
            conv = self._convs[typ]
        except AttributeError:
            self._convs = {}
            conv = self._convs.setdefault(typ, _instant_converter(typ))
        except KeyError:
            conv = self._convs.setdefault(typ, _instant_converter(typ))
        return v if conv is None else conv(v)

    def begin_file(self, fh):
        from modeltracking_spark.operators.orc_write import (
            OrcFileWriter,
        )

        self._w = OrcFileWriter(fh, self.schema, codec=self.codec)

    def append_rows(self, columns: dict):
        self._w.write_stripe(columns)

    def end_file(self):
        self._w.finish()


class _OrcNativeSinkWriter(_OrcSinkHooks, TwoPhaseFileSinkWriter):
    """``df.write.format("orc_native")``: job-level two-phase commit
    (driver rename + ``_SUCCESS``)."""


class _OrcNativeStreamSinkWriter(_OrcSinkHooks,
                                 TwoPhaseStreamFileSinkWriter):
    """``df.writeStream.format("orc_native")``: per-epoch two-phase
    commit with the ``_epochs`` idempotence log — exactly-once under
    epoch replay, same protocol as the parquet streaming sink."""
