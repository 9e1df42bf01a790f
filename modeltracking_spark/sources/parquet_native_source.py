"""Spark Python DataSource over the from-spec Parquet reader —
``spark.read.format("parquet_native").option("path", file_or_dir)``.

Spark of course reads parquet natively; the point of this source is
the same as the seekable-zstd/xz/bz2 tier: the ENGINE's own from-spec
implementation of the storage format, planned the way a 100 TB
deployment needs —

- **Footer-only planning**: ``partitions()`` reads each file's TAIL
  (the PAR1 footer + thrift metadata), never a payload byte.
- **Row-group grain**: one InputPartition per (file, row group) — the
  format's native parallel-read unit.
- **Column pruning at the byte-range level**: ``.option("columns",
  "a,b")`` makes each task seek ONLY the projected column chunks'
  ranges; unprojected bytes are never read.
- **From-spec everything below**: thrift compact metadata, page walk,
  RLE/bit-packed hybrids, Dremel list assembly, and the page codecs
  (snappy/gzip/zstd/brotli/lz4-raw) all via this repo's own decoders
  (operators/parquet_native.py and the codec modules it delegates to).

Round 12 adds PAGE-LEVEL pruning under the same option: inside
surviving row groups, the reader consumes the file's
ColumnIndex/OffsetIndex to read ONLY the pages whose zone maps can
match the pushed filters (byte ranges; unkept pages are never read or
decoded), trimming rows to the surviving ranges — Spark re-applies
every filter row-level, so selection can only skip provably-dead rows.

KNOWN UPSTREAM HAZARD (pinned in
tests/test_parquet_native.py::test_pyspark_pushdown_plan_reuse_upstream_bug):
pyspark caches the pushdown-planned scan on the loaded DataFrame and
REUSES it for later filterless queries on the SAME DataFrame — even
for readers that claim zero filters as supported.  Create a fresh
``.load()`` per query shape when ``filter_pushdown`` is on (this
engine's registry always does); the option stays opt-in for exactly
this reason.

Type mapping: INT64→bigint (timestamps surface as their physical
epoch-micros/millis), INT32→int (dates as epoch days), FLOAT/DOUBLE,
BOOLEAN, UTF8 byte arrays→string, other byte arrays→binary, DECIMAL
logical→decimal(p,s) (round 12), INT96 legacy timestamps→bigint epoch
micros (round 12), and ARBITRARY LIST/STRUCT/MAP nesting — one-level
shapes keep their dedicated fast paths; anything deeper goes through
the general recursive type-tree parse + full Dremel assembly
(round 12).
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
            if f.endswith(".parquet")
        )
    return [path]


def _spark_type_node(node: dict) -> str:
    """Spark DDL for one GENERAL type-tree node (kind='nested')."""
    t = node["t"]
    if t == "leaf":
        return _spark_type(node["leaf"])
    if t == "struct":
        inner = ", ".join(
            f"`{f['name']}`: {_spark_type_node(f)}"
            for f in node["fields"])
        return f"struct<{inner}>"
    if t == "list":
        return f"array<{_spark_type_node(node['element'])}>"
    return (f"map<{_spark_type_node(node['key'])}, "
            f"{_spark_type_node(node['value'])}>")


def _pa_type_node(node: dict):
    import pyarrow as pa

    t = node["t"]
    if t == "leaf":
        return _pa_type(node["leaf"])
    if t == "struct":
        return pa.struct([pa.field(f["name"], _pa_type_node(f))
                          for f in node["fields"]])
    if t == "list":
        return pa.list_(_pa_type_node(node["element"]))
    return pa.map_(_pa_type_node(node["key"]),
                   _pa_type_node(node["value"]))


def _spark_type(col: dict) -> str:
    if col.get("kind") == "nested":
        return _spark_type_node(col["tree"])
    if col.get("kind") == "struct":
        inner = ", ".join(
            f"`{f['name']}`: {_spark_type(f)}" for f in col["fields"])
        return f"struct<{inner}>"
    if col.get("kind") == "map":
        return (f"map<{_spark_type(col['key'])}, "
                f"{_spark_type(col['value'])}>")
    if col.get("decimal"):
        p, s = col["decimal"]
        base = f"decimal({p},{s})"
        return (f"array<{base}>" if col.get("kind") == "list"
                else base)
    base = {
        "BOOLEAN": "boolean", "INT32": "int", "INT64": "bigint",
        "FLOAT": "float", "DOUBLE": "double",
        # INT96 legacy timestamps surface as epoch micros, the same
        # posture as INT64 timestamp columns
        "INT96": "bigint",
    }.get(col["physical"])
    if col["physical"] == "BYTE_ARRAY":
        base = "string" if col["string"] else "binary"
    elif col["physical"] == "FIXED_LEN_BYTE_ARRAY":
        base = "binary"
    if base is None:
        raise ValueError(
            f"unmappable parquet physical type {col['physical']}")
    if col.get("kind") == "list":
        return f"array<{base}>"
    return base


def _pa_type(col: dict):
    """pyarrow type for one footer column spec (mirrors
    ``_spark_type``)."""
    import pyarrow as pa

    if col.get("kind") == "nested":
        return _pa_type_node(col["tree"])
    if col.get("kind") == "struct":
        return pa.struct(
            [pa.field(f["name"], _pa_type(f)) for f in col["fields"]])
    if col.get("kind") == "map":
        return pa.map_(_pa_type(col["key"]), _pa_type(col["value"]))
    if col.get("decimal"):
        p, s = col["decimal"]
        base = pa.decimal128(p, s)
        return pa.list_(base) if col.get("kind") == "list" else base
    base = {
        "BOOLEAN": pa.bool_(), "INT32": pa.int32(),
        "INT64": pa.int64(), "INT96": pa.int64(),
        "FLOAT": pa.float32(), "DOUBLE": pa.float64(),
    }.get(col["physical"])
    if col["physical"] == "BYTE_ARRAY":
        base = pa.string() if col["string"] else pa.binary()
    elif col["physical"] == "FIXED_LEN_BYTE_ARRAY":
        base = pa.binary()
    if base is None:
        raise ValueError(
            f"unmappable parquet physical type {col['physical']}")
    return pa.list_(base) if col.get("kind") == "list" else base


def _rg_may_match(stats: dict, num_values: int, f) -> bool:
    """Can a row group with these column statistics contain a row
    satisfying filter ``f``?  Conservative: unknown stats / unusual
    types / NaN bounds answer True (never prune on a guess).  Bounds
    may be writer-truncated — still valid bounds per the spec, so
    every prune here is sound."""
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

    if isinstance(f, IsNull):
        return stats.get("null_count", 1) != 0
    if isinstance(f, IsNotNull):
        nc = stats.get("null_count")
        return nc is None or nc < num_values
    lo, hi = stats.get("min"), stats.get("max")
    if lo is None or hi is None:
        return True

    def coerce(v):
        if isinstance(v, str) and isinstance(lo, bytes):
            return v.encode("utf-8")
        return v

    try:
        if isinstance(f, In):
            vs = [coerce(v) for v in f.value if v is not None]
            return any(lo <= v <= hi for v in vs) or any(
                v != v for v in vs)
        v = coerce(f.value)
        if v is None or v != v or lo != lo or hi != hi:  # NULL / NaN
            return True
        if isinstance(f, EqualTo):
            return lo <= v <= hi
        if isinstance(f, GreaterThan):
            return hi > v
        if isinstance(f, GreaterThanOrEqual):
            return hi >= v
        if isinstance(f, LessThan):
            return lo < v
        if isinstance(f, LessThanOrEqual):
            return lo <= v
    except TypeError:
        return True  # incomparable types: never prune
    return True


class _ParquetNativeReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError(
                "parquet_native source requires .option('path', ...)")
        self.files = _files(path)
        cols = options.get("columns")
        self.columns = ([c.strip() for c in cols.split(",") if c.strip()]
                        if cols else None)
        self.target_bytes = int(options.get("target_partition_bytes",
                                            "0"))
        self.pruning_filters = []
        self._bloom_cache: dict = {}

    def partitions(self):
        from modeltracking_spark.operators.parquet_native import (
            parquet_footer_from_file,
        )

        parts = []
        ref_sig = ref_file = None
        for f in self.files:
            with open(f, "rb") as fh:  # TAIL reads only
                footer = parquet_footer_from_file(fh)
            # planning-time drift check: schema() declared the FIRST
            # file's footer for the whole directory, so a file whose
            # columns disagree must die HERE with a clear message, not
            # as an executor-side Arrow type error mid-scan
            sig = [(c["name"], c["physical"], c.get("kind"),
                    c.get("string"),
                    _spark_type(c) if c.get("kind") == "nested"
                    else None) for c in footer["columns"]]
            if ref_sig is None:
                ref_sig, ref_file = sig, f
            elif sig != ref_sig:
                raise ValueError(
                    f"parquet_native: schema drift inside directory — "
                    f"{f} declares columns {sig} but {ref_file} "
                    f"declares {ref_sig}; all files under one path "
                    f"must share name/physical/logical layout")
            paths = {c["name"]: c["path"] for c in footer["columns"]}
            by_name_cols = {c["name"]: c for c in footer["columns"]}
            proj = [paths[n] for n in (self.columns or paths)]
            survivors = []  # (rg_index, projected compressed bytes)
            # DECIMAL stats are unscaled ints at the physical level —
            # comparing them against Spark's Decimal filter values
            # would prune wrongly, so those columns never prune
            no_prune = {c["name"] for c in footer["columns"]
                        if c.get("decimal")
                        or c.get("kind") in ("struct", "map",
                                             "nested")}
            for rg, group in enumerate(footer["row_groups"]):
                keep = True
                for flt in self.pruning_filters:
                    name = flt.attribute[0]
                    if name in no_prune:
                        continue
                    chunk = group["chunks"].get(paths.get(name, name))
                    if chunk is None:
                        continue
                    if not _rg_may_match(chunk.get("stats") or {},
                                         chunk["num_values"], flt):
                        keep = False
                        break
                    if (keep and chunk.get("bloom") is not None
                            and not self._bloom_may_match(
                                f, rg, name, chunk,
                                by_name_cols[name], flt)):
                        keep = False
                        break
                if keep:
                    survivors.append((rg, sum(
                        group["chunks"][p]["total_compressed_size"]
                        for p in proj if p in group["chunks"])))
            # the same scale knob as the compressed-scan tier: at 100 TB
            # of small row groups, one partition per row group floods
            # the scheduler — group CONSECUTIVE survivors to >= target
            if self.target_bytes <= 0:
                groups = [[rg] for rg, _ in survivors]
            else:
                groups, cur, cur_b = [], [], 0
                for rg, size in survivors:
                    if cur and (cur_b >= self.target_bytes
                                or rg != cur[-1] + 1):
                        groups.append(cur)
                        cur, cur_b = [], 0
                    cur.append(rg)
                    cur_b += size
                if cur:
                    groups.append(cur)
            parts.extend(
                InputPartition((f, g, self.columns)) for g in groups)
        if not parts:
            # pyspark treats an EMPTY partitions() result as "reader
            # has no partitions()" and calls read(None) — hand it one
            # sentinel partition with no row groups instead (its read
            # yields nothing)
            parts = [InputPartition((self.files[0], [], self.columns))]
        return parts

    def _bloom_may_match(self, path, rg, name, chunk, col, flt):
        """SBBF row-group pruning (round 12): for EqualTo/In filters
        on flat non-decimal columns whose chunk carries a bloom
        filter, a definite all-values-absent answer prunes the group.
        Zero false negatives by construction, so every prune is
        sound; anything uncertain keeps the group."""
        from pyspark.sql.datasource import EqualTo, In

        from modeltracking_spark.operators.parquet_native import (
            bloom_hash,
            read_bloom_filter,
            sbbf_check,
        )

        if col.get("kind") not in (None, "flat") or col.get("decimal"):
            return True
        if isinstance(flt, EqualTo):
            values = [flt.value]
        elif isinstance(flt, In):
            values = list(flt.value)
        else:
            return True
        if not values or any(v is None for v in values):
            return True
        key = (path, chunk["bloom"][0])
        bits = self._bloom_cache.get(key)
        if bits is None:
            try:
                with open(path, "rb") as fh:
                    bits = read_bloom_filter(fh, chunk)
            except (ValueError, NotImplementedError):
                bits = b""  # unreadable/unsupported variant: no prune
            self._bloom_cache[key] = bits
        if not bits:
            return True
        try:
            hashes = [bloom_hash(v, col["physical"],
                                 col.get("string", False))
                      for v in values]
        except (NotImplementedError, TypeError, AttributeError,
                OverflowError):
            return True  # un-hashable filter type: never prune
        return any(sbbf_check(bits, h) for h in hashes)

    def _row_ranges(self, fh, footer, rg: int):
        """Surviving [start, end) row ranges of one row group under
        the remembered filters, from the PAGE-LEVEL zone maps
        (ColumnIndex/OffsetIndex).  ``None`` = keep the whole group
        (no indexes / no usable filters); ``[]`` = provably empty."""
        from modeltracking_spark.operators.parquet_native import (
            intersect_ranges,
            merge_spans,
            page_row_spans,
            read_page_index,
        )

        if not self.pruning_filters:
            return None
        by_name = {c["name"]: c for c in footer["columns"]}
        no_prune = {c["name"] for c in footer["columns"]
                    if c.get("decimal")
                    or c.get("kind") in ("struct", "map", "nested")}
        group = footer["row_groups"][rg]
        rg_rows = group["num_rows"]
        ranges = [(0, rg_rows)]
        narrowed = False
        for flt in self.pruning_filters:
            name = flt.attribute[0]
            col = by_name.get(name)
            if (col is None or name in no_prune
                    or col.get("kind") != "flat"):
                continue
            chunk = group["chunks"].get(col["path"])
            if (not chunk or chunk.get("column_index") is None
                    or chunk.get("offset_index") is None):
                continue
            pi = read_page_index(fh, chunk, col)
            if "mins" not in pi or not pi["pages"]:
                continue
            spans = page_row_spans(pi, rg_rows)
            if len(pi["mins"]) != len(spans):
                continue  # malformed index: never prune on it
            nulls = pi.get("null_counts") or [None] * len(spans)
            surviving = []
            for i, (a, b) in enumerate(spans):
                stats = {}
                if i < len(pi.get("null_pages", [])) and \
                        pi["null_pages"][i]:
                    stats["null_count"] = b - a
                else:
                    if pi["mins"][i] is not None:
                        stats["min"] = pi["mins"][i]
                    if pi["maxs"][i] is not None:
                        stats["max"] = pi["maxs"][i]
                    if nulls[i] is not None:
                        stats["null_count"] = nulls[i]
                    elif not col.get("max_def"):
                        stats["null_count"] = 0  # REQUIRED: no nulls
                if _rg_may_match(stats, b - a, flt):
                    surviving.append((a, b))
            ranges = intersect_ranges(ranges, merge_spans(surviving))
            narrowed = True
            if not ranges:
                return []
        return ranges if narrowed else None

    def read(self, partition):
        import pyarrow as pa

        from modeltracking_spark.operators.parquet_native import (
            parquet_footer_from_file,
            read_row_group,
        )

        path, rgs, columns = partition.value
        with open(path, "rb") as fh:
            footer = parquet_footer_from_file(fh)
            by_name = {c["name"]: c for c in footer["columns"]}
            names = columns or [c["name"] for c in footer["columns"]]
            for rg in rgs:
                ranges = self._row_ranges(fh, footer, rg)
                if ranges == []:
                    continue  # page index proves no row matches
                data = read_row_group(fh, footer, rg, columns,
                                      row_ranges=ranges)
                arrays, fields = [], []
                for n in names:
                    typ = _pa_type(by_name[n])
                    arrays.append(pa.array(data[n], typ))
                    fields.append(pa.field(n, typ))
                yield pa.RecordBatch.from_arrays(
                    arrays, schema=pa.schema(fields))


class _ParquetNativePruningReader(_ParquetNativeReader):
    """The filter-pushdown variant, selected by
    ``.option("filter_pushdown", "true")`` — a separate class because
    Spark asserts on ANY reader that implements ``pushFilters`` when
    ``spark.sql.python.filterPushdown.enabled`` is false, so the
    default reader must not carry the method at all."""

    def pushFilters(self, filters):
        """Row-group statistics pruning (the min/max zone-map pattern
        every lakehouse scan uses): comparison/null filters on flat
        top-level columns are REMEMBERED for partition pruning, and
        EVERY filter is returned as still-needed — Spark re-evaluates
        them row-level, so pruning can only skip row groups whose
        statistics PROVE no row matches (double-filtering is the safe
        contract; the win is unplanned row groups, exactly like native
        parquet scans prune on footer zone maps)."""
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


def _sink_schema(schema) -> list[tuple]:
    """Spark StructType -> the writer's (name, type, nullable) schema.
    Fully recursive since round 12: arrays/structs/maps compose to any
    depth — the writer routes one-level shapes to the legacy fast
    paths and everything deeper through the general Dremel shred."""
    from pyspark.sql import types as t

    base = {t.BooleanType: "boolean", t.IntegerType: "int32",
            t.LongType: "int64", t.FloatType: "float",
            t.DoubleType: "double", t.StringType: "string",
            t.BinaryType: "binary", t.TimestampType: "timestamp",
            t.DateType: "date"}

    def _type_str(dt, top: bool = False) -> str:
        if isinstance(dt, t.DecimalType):
            return f"decimal({dt.precision},{dt.scale})"
        if isinstance(dt, t.ArrayType):
            el = _type_str(dt.elementType)
            return f"list<{el}{'?' if dt.containsNull else ''}>"
        if isinstance(dt, t.StructType):
            parts = []
            for sf in dt.fields:
                st = _type_str(sf.dataType)
                parts.append(
                    f"{sf.name}:{st}{'?' if sf.nullable else ''}")
            return f"struct<{','.join(parts)}>"
        if isinstance(dt, t.MapType):
            kt = _type_str(dt.keyType)
            vt = _type_str(dt.valueType)
            vt += "?" if dt.valueContainsNull else ""
            return f"map<{kt},{vt}>"
        tp = base.get(type(dt))
        if tp is None or (not top and tp in ("timestamp", "date")):
            # nested timestamps would bypass the sink's epoch-micros
            # convert_value hook (it keys off the top-level type
            # string) — keep them loud
            raise NotImplementedError(
                f"parquet_native sink: type {dt} not supported"
                + ("" if top else " inside a nested column"))
        return tp

    return [(f.name, _type_str(f.dataType, top=True), f.nullable)
            for f in schema.fields]


class _ParquetSinkHooks:
    """Format half shared by the batch and streaming parquet sinks:
    executor-side from-spec encode, one file per task, a task
    buffering at most ONE row group (``row_group_rows``, default 1M)
    before its pages stream to the temp file — the memory contract
    that survives arbitrarily large partitions at 100 TB."""

    suffix = ".parquet"

    def __init__(self, options, schema, overwrite: bool):
        super().__init__(options.get("path"), _sink_schema(schema),
                         overwrite)
        self.codec = options.get("codec", "ZSTD").upper()
        self.flush_rows = int(options.get("row_group_rows",
                                          str(1 << 20)))
        self.page_rows = int(options.get("page_rows", str(1 << 16)))
        d = options.get("dictionary", "auto").lower()
        self.dictionary = {"auto": None, "true": True,
                           "false": False}[d]
        bc = options.get("bloom_columns")
        self.bloom_columns = ([c.strip() for c in bc.split(",")
                               if c.strip()] if bc else None)
        # "rle" (default) | "bit_packed" — the deprecated v1 level
        # encoding, kept as fixture tooling for the reader's legacy
        # arm (ancient parquet-mr files)
        self.level_encoding = options.get("level_encoding", "rle")

    def convert_value(self, typ: str, v):
        if typ == "date":
            import datetime as dt

            if isinstance(v, dt.date):
                return (v - dt.date(1970, 1, 1)).days
            return int(v)
        if typ == "timestamp":
            import datetime as dt

            if isinstance(v, dt.datetime):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=dt.timezone.utc)
                epoch = dt.datetime(1970, 1, 1,
                                    tzinfo=dt.timezone.utc)
                # integer arithmetic — float .timestamp() can lose a
                # microsecond at large epochs
                return (v - epoch) // dt.timedelta(microseconds=1)
            return int(v)
        return v

    def begin_file(self, fh):
        from modeltracking_spark.operators.parquet_write import (
            ParquetFileWriter,
        )

        self._w = ParquetFileWriter(
            fh, self.schema, codec=self.codec,
            page_rows=self.page_rows, dictionary=self.dictionary,
            bloom_columns=self.bloom_columns,
            level_encoding=self.level_encoding)

    def append_rows(self, columns: dict):
        self._w.write_row_group(columns)

    def end_file(self):
        self._w.finish()


class _ParquetNativeSinkWriter(_ParquetSinkHooks, TwoPhaseFileSinkWriter):
    pass


class _ParquetNativeStreamSinkWriter(_ParquetSinkHooks,
                                     TwoPhaseStreamFileSinkWriter):
    pass


class ParquetNativeDataSource(DataSource):
    """``spark.read.format("parquet_native")`` after
    ``spark.dataSource.register(ParquetNativeDataSource)``.

    ``.option("filter_pushdown", "true")`` (requires the session conf
    ``spark.sql.python.filterPushdown.enabled=true``) activates
    row-group statistics pruning via ``pushFilters``.

    ``df.write.format("parquet_native").option("path", dir).mode(
    "append"|"overwrite").save()`` writes through the from-spec
    ENCODER (operators/parquet_write.py) — one file per partition via
    a temp-dir + driver-rename two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "parquet_native"

    def schema(self) -> str:
        from modeltracking_spark.operators.parquet_native import (
            parquet_footer_from_file,
        )

        files = _files(self.options.get("path", ""))
        if not files:
            raise ValueError("parquet_native: no .parquet files at path")
        with open(files[0], "rb") as fh:
            footer = parquet_footer_from_file(fh)
        cols = self.options.get("columns")
        names = ([c.strip() for c in cols.split(",") if c.strip()]
                 if cols else None)
        by_name = {c["name"]: c for c in footer["columns"]}
        sel = names or [c["name"] for c in footer["columns"]]
        return ", ".join(
            f"`{n}` {_spark_type(by_name[n])}" for n in sel
        )

    def reader(self, schema):
        if str(self.options.get("filter_pushdown", "")).lower() == "true":
            return _ParquetNativePruningReader(self.options, schema)
        return _ParquetNativeReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        import os

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "parquet_native sink requires .option('path', ...)")
        os.makedirs(path, exist_ok=True)
        return _ParquetNativeSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        import os

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "parquet_native sink requires .option('path', ...)")
        os.makedirs(path, exist_ok=True)
        return _ParquetNativeStreamSinkWriter(self.options, schema,
                                              overwrite)
