"""From-spec Parquet reader (round 11 flagship): cross-validated
column-for-column against pyarrow — the reference implementation —
over a writer matrix (codecs x page versions x dictionary on/off x
null densities x multi-page x multi-row-group), against DuckDB's
independent writer, on every flat testdata table, and on the real
``list<float>`` embeddings table through Dremel list assembly; plus
byte-range pruning proof, typed rejects, and corruption fuzz."""

import io
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from modeltracking_spark.operators.parquet_native import (
    parquet_footer_from_file,
    read_row_group,
    rle_bp_hybrid,
)

SF001 = "/root/testdata/sf0.01"


def _read_all(buf):
    buf.seek(0)
    f = parquet_footer_from_file(buf)
    got = {c["name"]: [] for c in f["columns"]}
    for rg in range(len(f["row_groups"])):
        for k, v in read_row_group(buf, f, rg).items():
            got[k].extend(v)
    return f, got


def _eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float):
        return a == b or (a != a and b != b)
    return a == b


def _check_table(table, **kw):
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    _f, got = _read_all(buf)
    for name in table.column_names:
        want = table.column(name).to_pylist()
        if pa.types.is_float32(table.column(name).type) or (
            pa.types.is_list(table.column(name).type)
            and pa.types.is_float32(table.column(name).type.value_type)
        ):
            want = table.column(name).to_pylist()  # arrow float32 exact
        assert _eq(got[name], want), (name, kw)


def test_rle_bp_hybrid_unit():
    # RLE run: header = run<<1, value in ceil(bw/8) bytes
    vals, pos = rle_bp_hybrid(bytes([20 << 1, 7]), 0, 3, 20)
    assert vals == [7] * 20 and pos == 2
    # bit-packed: header = groups<<1|1; 8 values of bw=1 in one byte
    vals, _ = rle_bp_hybrid(bytes([0x05, 0b10110100, 0b00000001]),
                            0, 1, 16)
    assert vals == [0, 0, 1, 0, 1, 1, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    with pytest.raises(ValueError, match="truncated"):
        rle_bp_hybrid(bytes([20 << 1]), 0, 3, 20)
    with pytest.raises(ValueError, match="wider than"):
        rle_bp_hybrid(bytes([2 << 1, 9]), 0, 3, 2)


@pytest.mark.parametrize("nullp", [0.0, 0.2, 1.0])
def test_flat_matrix_vs_pyarrow(nullp):
    rng = random.Random(7)
    n = 1500

    def mn(v):
        return None if rng.random() < nullp else v

    t = pa.table({
        "i64": [mn(rng.randrange(-2**62, 2**62)) for _ in range(n)],
        "i32": pa.array([mn(rng.randrange(-2**31, 2**31 - 1))
                         for _ in range(n)], pa.int32()),
        "f64": [mn(rng.random() * 1e9) for _ in range(n)],
        "f32": pa.array([mn(rng.random()) for _ in range(n)],
                        pa.float32()),
        "s": [mn("val-%d" % rng.randrange(50) * rng.randrange(1, 4))
              for _ in range(n)],
        "b": pa.array([mn(bytes([rng.randrange(256)])
                          * rng.randrange(0, 9)) for _ in range(n)],
                      pa.binary()),
        "flag": [mn(rng.random() < 0.5) for _ in range(n)],
    })
    for comp in ("none", "snappy", "zstd", "gzip", "brotli", "lz4"):
        for dpv in ("1.0", "2.0"):
            for dic in (True, False):
                _check_table(t, compression=comp, data_page_version=dpv,
                             use_dictionary=dic, row_group_size=600,
                             data_page_size=2048)


@pytest.mark.parametrize("prof", [(0.0, 0.0, 0.0), (0.15, 0.1, 0.2),
                                  (0.9, 0.5, 0.9)])
def test_list_matrix_vs_pyarrow(prof):
    """One-level LIST (the array<float> embedding shape) across
    null-list / empty-list / null-element profiles — Dremel assembly
    from (rep, def) pairs, records spanning pages and row groups."""
    pn, pe, pne = prof
    rng = random.Random(9)
    n = 1200

    def mk(typ):
        if rng.random() < pn:
            return None
        if rng.random() < pe:
            return []
        return [None if rng.random() < pne else
                (rng.random() if typ == "f" else rng.randrange(1000))
                for _ in range(rng.randrange(1, 12))]

    t = pa.table({
        "vid": list(range(n)),
        "emb": pa.array([mk("f") for _ in range(n)],
                        pa.list_(pa.float32())),
        "toks": pa.array([mk("i") for _ in range(n)],
                         pa.list_(pa.int64())),
        "words": pa.array(
            [None if rng.random() < pn else
             ["w%d" % rng.randrange(20)
              for _ in range(rng.randrange(0, 6))] for _ in range(n)],
            pa.list_(pa.string())),
    })
    for comp in ("snappy", "none"):
        for dpv in ("1.0", "2.0"):
            for dic in (True, False):
                _check_table(t, compression=comp, data_page_version=dpv,
                             use_dictionary=dic, row_group_size=500,
                             data_page_size=1500)


def test_all_testdata_tables_exact():
    for tbl in ("documents", "events", "orders", "lineitem", "customer",
                "supplier", "part", "region", "nation", "embeddings"):
        path = f"{SF001}/{tbl}.parquet"
        with open(path, "rb") as fh:
            f = parquet_footer_from_file(fh)
            got = read_row_group(fh, f, 0)
        ref = pq.read_table(path)
        nrows = f["row_groups"][0]["num_rows"]
        for c in f["columns"]:
            col = ref.column(c["name"])
            if pa.types.is_timestamp(col.type) or pa.types.is_date(
                    col.type):
                col = col.cast(pa.int64() if c["physical"] == "INT64"
                               else pa.int32())
            assert _eq(got[c["name"]], col.to_pylist()[:nrows]), \
                (tbl, c["name"])


def test_duckdb_written_file_exact():
    import os

    import duckdb

    out = "/tmp/modeltracking_pqnative_ddb_test.parquet"
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{SF001}/documents.parquet'))"
        f" TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)")
    try:
        with open(out, "rb") as fh:
            f = parquet_footer_from_file(fh)
            got = read_row_group(fh, f, 0)
        ref = pq.read_table(out)
        for c in f["columns"]:
            want = ref.column(c["name"]).to_pylist()
            assert _eq(got[c["name"]], want[:len(got[c["name"]])]), \
                c["name"]
    finally:
        os.unlink(out)


def test_column_pruning_reads_only_projected_ranges():
    """The byte-range pruning claim, proven with a recording file:
    projecting one narrow column must not read the wide column's
    chunk bytes (beyond the footer tail)."""

    class Recorder(io.BytesIO):
        def __init__(self, b):
            super().__init__(b)
            self.spans = []

        def read(self, n=-1):
            start = self.tell()
            out = super().read(n)
            self.spans.append((start, start + len(out)))
            return out

    t = pa.table({
        "small": list(range(5000)),
        "wide": ["payload-%d" % i * 40 for i in range(5000)],
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none", use_dictionary=False)
    raw = buf.getvalue()
    rec = Recorder(raw)
    f = parquet_footer_from_file(rec)
    got = read_row_group(rec, f, 0, columns=["small"])
    assert got["small"] == list(range(5000))
    wide = f["row_groups"][0]["chunks"]["wide"]
    w0 = wide["data_page_offset"]
    if wide.get("dictionary_page_offset") is not None:
        w0 = min(w0, wide["dictionary_page_offset"])
    w1 = w0 + wide["total_compressed_size"]
    footer_start = len(raw) - 65536
    for s, e in rec.spans:
        # any overlap with the wide chunk must come from the footer
        # tail read, never a payload-range read
        if e > w0 and s < w1:
            assert s >= footer_start, (s, e, w0, w1)


def test_typed_rejects():
    # shapes that were loud rejects before round 12 now route to the
    # GENERAL nested path and decode exactly
    for arr, want in (
        (pa.array([{"a": [1, 2]}],
                  pa.struct([("a", pa.list_(pa.int64()))])),
         [{"a": [1, 2]}]),
        (pa.array([{"a": {"b": 1}}],
                  pa.struct([("a", pa.struct([("b", pa.int64())]))])),
         [{"a": {"b": 1}}]),
    ):
        t = pa.table({"s": arr})
        buf = io.BytesIO()
        pq.write_table(t, buf)
        buf.seek(0)
        foot = parquet_footer_from_file(buf)
        assert foot["columns"][0]["kind"] == "nested"
        assert read_row_group(buf, foot, 0)["s"] == want
    # MAP decodes via its dedicated one-level path
    t = pa.table({"m": pa.array([[("k", 1)]],
                                pa.map_(pa.string(), pa.int64()))})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    buf.seek(0)
    foot = parquet_footer_from_file(buf)
    assert foot["columns"][0]["kind"] == "map"
    assert read_row_group(buf, foot, 0)["m"] == [{"k": 1}]
    # footer damage stays a loud reject
    with pytest.raises(ValueError, match="magic"):
        parquet_footer_from_file(io.BytesIO(b"\x00" * 64))


@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
def test_delta_and_byte_stream_split_encodings(dpv):
    """The non-dictionary encoding family vs pyarrow: DELTA_BINARY_
    PACKED (incl. negative deltas, monotone runs, width wrap),
    DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY (shared prefixes),
    BYTE_STREAM_SPLIT floats/doubles — multi-page, multi-row-group,
    compressed, and with nulls."""
    rng = random.Random(3)
    n = 4000
    t = pa.table({
        "i64": [rng.randrange(-2**62, 2**62) if rng.random() > 0.3
                else rng.randrange(-5, 5) for _ in range(n)],
        "i32": pa.array([rng.randrange(-2**31, 2**31 - 1)
                         for _ in range(n)], pa.int32()),
        "mono": list(range(n)),
        "s": ["prefix-%06d-suffix%s" % (i, "x" * rng.randrange(0, 5))
              for i in range(n)],
        "f32": pa.array([rng.random() for _ in range(n)], pa.float32()),
        "f64": [rng.random() * 1e18 for _ in range(n)],
    })
    enc = {"i64": "DELTA_BINARY_PACKED", "i32": "DELTA_BINARY_PACKED",
           "mono": "DELTA_BINARY_PACKED",
           "s": ("DELTA_LENGTH_BYTE_ARRAY" if dpv == "1.0"
                 else "DELTA_BYTE_ARRAY"),
           "f32": "BYTE_STREAM_SPLIT", "f64": "BYTE_STREAM_SPLIT"}
    for comp in ("none", "snappy", "zstd"):
        _check_table(t, use_dictionary=False, column_encoding=enc,
                     compression=comp, data_page_version=dpv,
                     row_group_size=1700, data_page_size=3000)
    t2 = pa.table({"s": pa.array(
        [None if rng.random() < 0.25 else "val-%d" % rng.randrange(99)
         for _ in range(n)])})
    _check_table(t2, use_dictionary=False,
                 column_encoding={"s": "DELTA_BYTE_ARRAY"},
                 data_page_version=dpv, data_page_size=2000)


def test_corruption_fuzz_typed_rejects():
    """Mutated files either decode (harmless mutation) or raise the
    documented ValueError/NotImplementedError — never a leaked
    IndexError/KeyError/struct.error (the loud-reject contract)."""
    t = pa.table({
        "a": list(range(400)),
        "s": ["txt-%d" % (i % 37) for i in range(400)],
        "e": pa.array([[float(i), i + 0.5] for i in range(400)],
                      pa.list_(pa.float32())),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy", row_group_size=150)
    base = buf.getvalue()
    rng = random.Random(77)
    for _ in range(400):
        b = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = (b[:i] + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 16)))
                 + b[i:])
        try:
            _read_all(io.BytesIO(bytes(b)))
        except (ValueError, NotImplementedError):
            pass


def test_datasource_partitions_pruning_and_rows(spark):
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.parquet_native_source import (
        ParquetNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ParquetNativeDataSource)
    except Exception:
        pass
    df = (spark.read.format("parquet_native")
          .option("path", f"{SF001}/documents.parquet")
          .option("columns", "doc_id,lang").load())
    assert df.columns == ["doc_id", "lang"]
    assert df.count() == 500
    ref = spark.read.parquet(f"{SF001}/documents.parquet")
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, ref.select("doc_id", "lang").collect()))
    # one partition per row group
    import pyarrow.parquet as _pq

    rgs = _pq.ParquetFile(f"{SF001}/documents.parquet"
                          ).metadata.num_row_groups
    assert df.rdd.getNumPartitions() == rgs
    # plan: pure BatchScan -> project, no exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchScan" in plan


def test_rowgroup_stats_pruning_unit(tmp_path):
    """pushFilters-driven zone-map pruning: partitions() must plan
    ONLY row groups whose min/max/null statistics can match, and never
    prune one that could (the conservative contract)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNull,
        LessThanOrEqual,
    )

    from modeltracking_spark.sources.parquet_native_source import (
        _ParquetNativePruningReader,
    )

    t = pa.table({
        "mono": list(range(10000)),
        "s": ["key-%05d" % i for i in range(10000)],
        "maybe": pa.array([None if i % 2 else i for i in range(10000)],
                          pa.int64()),
    })
    path = str(tmp_path / "t.parquet")
    pq.write_table(t, path, row_group_size=1000)

    def nparts(filters):
        r = _ParquetNativePruningReader({"path": path}, None)
        r.pushFilters(filters)
        return len(r.partitions())

    assert nparts([]) == 10
    assert nparts([GreaterThan(("mono",), 8999)]) == 1
    assert nparts([EqualTo(("mono",), 4500)]) == 1
    assert nparts([LessThanOrEqual(("mono",), 999)]) == 1
    assert nparts([EqualTo(("s",), "key-02500")]) == 1  # bytewise utf8
    assert nparts([In(("mono",), (100, 9900))]) == 2
    # all row groups pruned -> ONE sentinel empty partition (pyspark
    # treats an empty partitions() list as "no partitions()" and
    # calls read(None))
    assert nparts([EqualTo(("mono",), -5)]) == 1
    assert nparts([IsNull(("mono",))]) == 1   # no nulls anywhere
    assert nparts([IsNull(("maybe",))]) == 10  # nulls everywhere
    # float NaN never prunes
    assert nparts([EqualTo(("mono",), float("nan"))]) == 10


def test_rowgroup_stats_pruning_end_to_end(spark, tmp_path):
    """With .option('filter_pushdown','true') the pruned scan returns
    exactly what Spark's own parquet reader returns (double-filtering
    keeps row-level semantics); without the option the reader carries
    no pushFilters at all, so sessions without the python-pushdown
    conf stay safe."""
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.parquet_native_source import (
        ParquetNativeDataSource,
        _ParquetNativeReader,
    )

    assert "pushFilters" not in _ParquetNativeReader.__dict__
    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ParquetNativeDataSource)
    except Exception:
        pass
    t = pa.table({"mono": list(range(10000)),
                  "s": ["key-%05d" % i for i in range(10000)]})
    path = str(tmp_path / "t.parquet")
    pq.write_table(t, path, row_group_size=1000)
    df = (spark.read.format("parquet_native").option("path", path)
          .option("filter_pushdown", "true").load())
    got = df.filter("mono > 8995 AND s < 'key-09000'").collect()
    ref = (spark.read.parquet(path)
           .filter("mono > 8995 AND s < 'key-09000'").collect())
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
    assert [r["mono"] for r in sorted(got)] == [8996, 8997, 8998, 8999]


def test_rowgroup_coalescing_rows_identical(spark, tmp_path):
    """target_partition_bytes groups CONSECUTIVE row groups (the same
    scale knob as the compressed-scan tier — small row groups at 100 TB
    would flood the scheduler); rows are bit-identical and pruning
    composes (non-consecutive survivors never share a partition)."""
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.parquet_native_source import (
        ParquetNativeDataSource,
        _ParquetNativeReader,
    )

    t = pa.table({"mono": list(range(8000)),
                  "s": ["v-%05d" % i for i in range(8000)]})
    path = str(tmp_path / "t.parquet")
    pq.write_table(t, path, row_group_size=1000)
    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ParquetNativeDataSource)
    except Exception:
        pass
    per_rg = (spark.read.format("parquet_native")
              .option("path", path).load())
    co = (spark.read.format("parquet_native").option("path", path)
          .option("target_partition_bytes", str(1 << 30)).load())
    assert per_rg.rdd.getNumPartitions() == 8
    assert co.rdd.getNumPartitions() == 1
    assert sorted(map(tuple, co.collect())) == \
        sorted(map(tuple, per_rg.collect()))
    # unit: pruning gaps break groups
    from pyspark.sql.datasource import In

    r = _ParquetNativeReader(
        {"path": path, "target_partition_bytes": str(1 << 30)}, None)
    r.pruning_filters = [In(("mono",), (500, 7500))]
    parts = r.partitions()
    assert [p.value[1] for p in parts] == [[0], [7]]


def test_directory_schema_drift_rejects_at_planning(spark, tmp_path):
    """A directory mixing parquet files with disagreeing schemas must
    die with a clear planning-time ValueError — never an executor-side
    Arrow type error (ADVICE r11)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.parquet_native_source import (
        ParquetNativeDataSource,
    )

    d = tmp_path / "drift"
    d.mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64()),
                             "b": pa.array(["x", "y"])}),
                   d / "f0.parquet")
    pq.write_table(pa.table({"a": pa.array([1.5, 2.5], pa.float64()),
                             "b": pa.array(["x", "y"])}),
                   d / "f1.parquet")
    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ParquetNativeDataSource)
    except Exception:
        pass
    df = (spark.read.format("parquet_native")
          .option("path", str(d)).load())
    import pytest as _pytest

    with _pytest.raises(Exception, match="schema drift"):
        df.collect()


def test_decimal_columns_vs_pyarrow():
    """DECIMAL logical type across all three physical carriers (INT32
    / INT64 / FIXED_LEN_BYTE_ARRAY big-endian two's complement), with
    nulls, negatives, and full-precision extremes — exact
    decimal.Decimal values vs pyarrow (VERDICT r11 item 2)."""
    from decimal import Decimal as D

    cols = {
        "d32": pa.array([D("1.23"), None, D("-9999999.99"),
                         D("0.00")], pa.decimal128(9, 2)),
        "d64": pa.array([D("123456789.123"), D("-0.001"), None,
                         D("999999999999999.999")],
                        pa.decimal128(18, 3)),
        "d128": pa.array(
            [D("12345678901234567890.12345"), None,
             D("-99999999999999999999999999999999.99999"),
             D("0.00001")], pa.decimal128(37, 5)),
        "dint": pa.array([D("5"), D("-7"), None, D("42")],
                         pa.decimal128(5, 0)),
    }
    t = pa.table(cols)
    for dic in (True, False):
        buf = io.BytesIO()
        pq.write_table(t, buf, use_dictionary=dic)
        buf.seek(0)
        foot = parquet_footer_from_file(buf)
        by = {c["name"]: c for c in foot["columns"]}
        assert by["d32"]["decimal"] == (9, 2)
        assert by["d128"]["physical"] == "FIXED_LEN_BYTE_ARRAY"
        got = read_row_group(buf, foot, 0)
        for n in cols:
            assert got[n] == cols[n].to_pylist(), n


def test_int96_timestamps_vs_pyarrow():
    """Legacy INT96 decode — epoch micros incl. pre-1970 (signed
    nanos-of-day), the unix epoch itself, and far-future instants —
    exact vs pyarrow's own reader (VERDICT r11 item 3)."""
    import datetime as dt

    ts = [dt.datetime(2001, 2, 3, 4, 5, 6, 789012), None,
          dt.datetime(1960, 1, 1, 0, 0, 0, 123456),
          dt.datetime(1899, 12, 31, 23, 59, 59, 999999),
          dt.datetime(1970, 1, 1),
          dt.datetime(2262, 4, 11, 23, 47, 16, 854775)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    buf = io.BytesIO()
    pq.write_table(t, buf, use_deprecated_int96_timestamps=True)
    buf.seek(0)
    foot = parquet_footer_from_file(buf)
    assert foot["columns"][0]["physical"] == "INT96"
    got = read_row_group(buf, foot, 0)["ts"]
    epoch = dt.datetime(1970, 1, 1)
    exp = [None if v is None else
           (v - epoch) // dt.timedelta(microseconds=1) for v in ts]
    assert got == exp


def test_struct_columns_vs_pyarrow():
    """One-level STRUCT assembly (definition levels only): null
    structs, null leaves, required leaves, string/decimal leaves,
    multi-page splits — exact vs pyarrow (VERDICT r11 item 4)."""
    from decimal import Decimal as D

    recs = [{"a": 1, "b": "x", "c": D("1.50")},
            None,
            {"a": None, "b": "zz", "c": D("-2.25")},
            {"a": 7, "b": None, "c": None},
            {"a": 0, "b": "", "c": D("0.00")}] * 5
    typ = pa.struct([("a", pa.int32()), ("b", pa.string()),
                     ("c", pa.decimal128(9, 2))])
    t = pa.table({"id": pa.array(range(25), pa.int64()),
                  "props": pa.array(recs, typ)})
    for dic in (True, False):
        buf = io.BytesIO()
        pq.write_table(t, buf, use_dictionary=dic,
                       data_page_size=64)  # force multi-page
        buf.seek(0)
        foot = parquet_footer_from_file(buf)
        by = {c["name"]: c for c in foot["columns"]}
        assert by["props"]["kind"] == "struct"
        got = read_row_group(buf, foot, 0)
        assert got["props"] == recs
        assert got["id"] == list(range(25))


def test_corruption_fuzz_r12_surfaces():
    """The r12 decode surfaces (DECIMAL, INT96, STRUCT assembly, page
    index parse) under the same mutation fuzz: harmless mutation or
    the documented typed reject — never a leaked internal error."""
    import datetime as dt
    from decimal import Decimal as D

    from modeltracking_spark.operators.parquet_native import (
        read_page_index,
    )

    t = pa.table({
        "d": pa.array([D("1.23")] * 200, pa.decimal128(25, 2)),
        "ts": pa.array([dt.datetime(2001, 2, 3)] * 200,
                       pa.timestamp("us")),
        "props": pa.array(
            [{"a": i, "b": "x%d" % i} if i % 3 else None
             for i in range(200)],
            pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "m": pa.array(
            [{"k%d" % i: float(i)} if i % 5 else None
             for i in range(200)],
            pa.map_(pa.string(), pa.float64())),
        "deep": pa.array(
            [[{"a": i, "xs": [float(i), None]}] if i % 4 else None
             for i in range(200)],
            pa.list_(pa.struct([("a", pa.int64()),
                                ("xs", pa.list_(pa.float64()))]))),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy", row_group_size=80,
                   use_deprecated_int96_timestamps=True,
                   write_page_index=True)
    base = buf.getvalue()
    rng = random.Random(712)

    def read_all_plus_index(fh):
        f = parquet_footer_from_file(fh)
        for rg in range(len(f["row_groups"])):
            read_row_group(fh, f, rg)
        by = {c["name"]: c for c in f["columns"]}
        for c in f["columns"]:
            if c.get("kind") in ("struct", "map", "nested"):
                continue
            read_page_index(fh, f["row_groups"][0]["chunks"][c["path"]],
                            by[c["name"]])

    for _ in range(300):
        b = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = (b[:i] + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 16)))
                 + b[i:])
        try:
            read_all_plus_index(io.BytesIO(bytes(b)))
        except (ValueError, NotImplementedError):
            pass


def test_page_level_pruning_unit(tmp_path):
    """Page-index pruning (round 12): the pruning reader's row-range
    computation keeps exactly the pages whose ColumnIndex bounds can
    match, composes across filters, and proves empty row groups
    without reading payload; a byte-range recorder shows unkept pages
    are never read."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNull

    from modeltracking_spark.operators.parquet_write import (
        parquet_write_table,
    )
    from modeltracking_spark.sources.parquet_native_source import (
        _ParquetNativePruningReader,
    )

    cols = {"mono": list(range(10000)),
            "s": ["k-%05d" % i for i in range(10000)]}
    schema = [("mono", "int64", False), ("s", "string", True)]
    path = str(tmp_path / "t.parquet")
    with open(path, "wb") as fh:
        fh.write(parquet_write_table(cols, schema, codec="ZSTD",
                                     page_rows=1000,
                                     row_group_rows=10000))

    def ranges(filters):
        r = _ParquetNativePruningReader({"path": path}, None)
        r.pushFilters(filters)
        with open(path, "rb") as fh:
            foot = parquet_footer_from_file(fh)
            return r._row_ranges(fh, foot, 0)

    assert ranges([]) is None                      # nothing to prune
    assert ranges([GreaterThan(("mono",), 8999)]) == [(9000, 10000)]
    assert ranges([EqualTo(("mono",), 4500)]) == [(4000, 5000)]
    # two filters intersect page ranges
    assert ranges([GreaterThan(("mono",), 3999),
                   EqualTo(("s",), "k-04500")]) == [(4000, 5000)]
    # provably empty: no page can match
    assert ranges([EqualTo(("mono",), -5)]) == []
    assert ranges([IsNull(("mono",))]) == []
    # recorder: with GreaterThan 8999 only the last page's byte range
    # (plus footer/index tails) is read from the mono chunk
    class Rec(io.BytesIO):
        def __init__(self, b):
            super().__init__(b)
            self.spans = []

        def read(self, n=-1):
            start = self.tell()
            out = super().read(n)
            self.spans.append((start, start + len(out)))
            return out

    raw = open(path, "rb").read()
    rec = Rec(raw)
    foot = parquet_footer_from_file(rec)
    from modeltracking_spark.operators.parquet_native import (
        read_page_index,
    )

    by = {c["name"]: c for c in foot["columns"]}
    ch = foot["row_groups"][0]["chunks"]["mono"]
    pi = read_page_index(rec, ch, by["mono"])
    rec.spans.clear()
    got = read_row_group(rec, foot, 0, ["mono"],
                         row_ranges=[(9000, 10000)])
    assert got["mono"] == list(range(9000, 10000))
    # pages 0..8 of the mono chunk must be untouched by the ranged read
    for a, b in rec.spans:
        for i, p in enumerate(pi["pages"][:-1]):
            lo, hi = p["offset"], p["offset"] + p["size"]
            assert not (a < hi and lo < b) or i == len(pi["pages"]) - 1, \
                (i, (a, b))


def test_page_level_pruning_end_to_end(spark, tmp_path):
    """filter_pushdown=true now prunes at PAGE grain inside surviving
    row groups: results stay exactly equal to Spark's own reader
    (double-filter contract), across dictionary/plain, multi-row-group
    files, and filters on both int and string columns."""
    from modeltracking_spark.operators.parquet_write import (
        parquet_write_table,
    )
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.parquet_native_source import (
        ParquetNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ParquetNativeDataSource)
    except Exception:
        pass
    cols = {"mono": list(range(20000)),
            "s": ["k-%05d" % i for i in range(20000)],
            "maybe": [None if i % 3 == 0 else i * 0.5
                      for i in range(20000)]}
    schema = [("mono", "int64", False), ("s", "string", True),
              ("maybe", "double", True)]
    p = tmp_path / "pp.parquet"
    p.write_bytes(parquet_write_table(cols, schema, codec="SNAPPY",
                                      page_rows=800,
                                      row_group_rows=10000))

    def fresh():
        # one .load() per query: Spark's python-data-source plan
        # cache reuses the LAST pushdown-planned scan for filterless
        # queries on the same DataFrame (upstream bug, pinned in
        # test_pyspark_pushdown_plan_reuse_upstream_bug) — fresh
        # relations per query are the sound usage this engine's own
        # registry follows
        return (spark.read.format("parquet_native")
                .option("path", str(p))
                .option("filter_pushdown", "true").load())

    ref = spark.read.parquet(str(p))
    for cond in ("mono >= 7777 AND mono < 7790",
                 "s = 'k-15000'",
                 "mono > 19990 OR mono < 0",
                 "maybe IS NULL AND mono < 100",
                 "mono = -1"):
        got = sorted(map(tuple, fresh().filter(cond).collect()))
        want = sorted(map(tuple, ref.filter(cond).collect()))
        assert got == want, cond
    # every-row-group-pruned scan must return an empty result, not
    # crash with read(None) (the empty-partitions pyspark fallback)
    assert fresh().filter("mono = -1").count() == 0


def test_pyspark_pushdown_plan_reuse_upstream_bug(spark, tmp_path):
    """Pin the UPSTREAM pyspark behavior that makes pushdown-planned
    scans unsafe to reuse across queries: after a filtered query on a
    python data source with pushFilters, a FILTERLESS query on the
    SAME DataFrame reuses the cached (pruned!) scan — even when the
    reader claimed zero filters as supported.  This engine mitigates
    by keeping pushdown opt-in per .load() and never reusing loaded
    relations across filter shapes in its registry.  If a Spark
    upgrade fixes the caching, this test FAILS and the mitigation
    comments can be retired."""
    from modeltracking_spark.operators.parquet_write import (
        parquet_write_table,
    )
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.parquet_native_source import (
        ParquetNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(ParquetNativeDataSource)
    except Exception:
        pass
    p = tmp_path / "reuse.parquet"
    p.write_bytes(parquet_write_table(
        {"mono": list(range(2000))}, [("mono", "int64", False)],
        page_rows=100, row_group_rows=1000))
    df = (spark.read.format("parquet_native").option("path", str(p))
          .option("filter_pushdown", "true").load())
    assert df.filter("mono >= 1990").count() == 10
    stale = df.count()  # reuses the scan planned with mono >= 1990
    if stale == 2000:
        import pytest as _pytest

        _pytest.fail(
            "Spark no longer reuses pushdown-planned python scans "
            "for filterless queries — retire the fresh-load "
            "mitigation comments and this pin")
    # the reused scan emits the page-granular survivors (the last
    # 100-row page) without the row-level filter Spark dropped
    assert stale == 100


def test_map_columns_vs_pyarrow():
    """MAP assembly (round 12): both leaf chunks share the map's
    repetition structure and zip into dicts — null maps, empty maps,
    null values, int and string keys, decimal values, multi-page
    splits, dictionary on/off — exact vs pyarrow; duplicate keys and
    key/value misalignment reject loudly."""
    from decimal import Decimal as D

    maps = [{"a": 1.5, "b": None}, None, {},
            {"z": 9.0, "y": -2.25, "x": 0.0}] * 5
    by_int = [{i: "v%d" % i, i + 1: None} if i % 4 else None
              for i in range(20)]
    prices = [{"p": D("1.23")} if i % 3 else {} for i in range(20)]
    t = pa.table({
        "id": pa.array(range(20), pa.int64()),
        "m": pa.array(maps, pa.map_(pa.string(), pa.float64())),
        "mi": pa.array(by_int, pa.map_(pa.int64(), pa.string())),
        "prices": pa.array(prices,
                           pa.map_(pa.string(), pa.decimal128(9, 2))),
    })
    for dic in (True, False):
        buf = io.BytesIO()
        pq.write_table(t, buf, use_dictionary=dic, data_page_size=64)
        buf.seek(0)
        foot = parquet_footer_from_file(buf)
        by = {c["name"]: c for c in foot["columns"]}
        assert by["m"]["kind"] == "map"
        assert by["m"]["key"]["string"] and not by["m"]["key"][
            "optional"]
        assert by["prices"]["value"]["decimal"] == (9, 2)
        got = read_row_group(buf, foot, 0)
        assert got["m"] == maps
        assert got["mi"] == by_int
        assert got["prices"] == prices
    # projection touches only the projected map's chunks
    buf.seek(0)
    got = read_row_group(buf, foot, 0, columns=["mi"])
    assert list(got) == ["mi"] and got["mi"] == by_int


def test_map_duplicate_keys_reject():
    """A file carrying duplicate keys inside one map record is
    malformed under Spark's EXCEPTION dedup policy — the typed
    reject, not a silent last-wins dict collapse."""
    t = pa.table({"m": pa.array(
        [[("k", 1.0), ("k", 2.0)]],
        pa.map_(pa.string(), pa.float64()))})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    buf.seek(0)
    foot = parquet_footer_from_file(buf)
    with pytest.raises(ValueError, match="duplicate keys"):
        read_row_group(buf, foot, 0)


def test_general_nested_vs_pyarrow():
    """GENERAL Dremel assembly (round 12): LIST<STRUCT>, STRUCT<LIST>,
    LIST<LIST>, STRUCT<STRUCT>, MAP with list/struct values, and
    LIST<MAP> — nulls at every level, dictionary on/off, multi-page —
    exact vs pyarrow's own reader."""
    ls = pa.array(
        [[{"a": 1, "b": "x"}, None, {"a": None, "b": "y"}],
         None, [], [{"a": 5, "b": None}]],
        pa.list_(pa.struct([("a", pa.int64()), ("b", pa.string())])))
    sl = pa.array(
        [{"xs": [1.5, None], "n": 7}, None,
         {"xs": None, "n": 8}, {"xs": [], "n": None}],
        pa.struct([("xs", pa.list_(pa.float64())), ("n", pa.int64())]))
    ll = pa.array([[[1, 2], None, []], None, [], [[3]]],
                  pa.list_(pa.list_(pa.int64())))
    ss = pa.array(
        [{"in_": {"p": 1, "q": "a"}, "z": 0.5}, None,
         {"in_": None, "z": -1.0},
         {"in_": {"p": None, "q": None}, "z": 2.0}],
        pa.struct([("in_", pa.struct([("p", pa.int64()),
                                      ("q", pa.string())])),
                   ("z", pa.float64())]))
    mv = pa.array([{"k": [1.0, 2.0], "e": []}, None, {"n": None}, {}],
                  pa.map_(pa.string(), pa.list_(pa.float64())))
    lm = pa.array([[{"a": 1}, None, {}], None, [], [{"b": 2,
                                                     "c": None}]],
                  pa.list_(pa.map_(pa.string(), pa.int64())))
    t = pa.table({"id": pa.array(range(4), pa.int64()),
                  "ls": ls, "sl": sl, "ll": ll, "ss": ss,
                  "mv": mv, "lm": lm})
    for dic in (True, False):
        buf = io.BytesIO()
        pq.write_table(t, buf, use_dictionary=dic, data_page_size=64)
        buf.seek(0)
        foot = parquet_footer_from_file(buf)
        kinds = {c["name"]: c["kind"] for c in foot["columns"]}
        assert kinds["ls"] == "nested" and kinds["mv"] == "nested"
        got = read_row_group(buf, foot, 0)
        for cname in ("ls", "sl", "ll", "ss"):
            assert got[cname] == t.column(cname).to_pylist(), cname
        assert got["mv"] == [{"k": [1.0, 2.0], "e": []}, None,
                             {"n": None}, {}]
        assert got["lm"] == [[{"a": 1}, None, {}], None, [],
                             [{"b": 2, "c": None}]]


def test_general_nested_randomized_stress():
    """5k random rows of list<struct<a,b,inner:list<double>>> with
    15-30% nulls at every level, tiny pages, multi-row-group, both
    dictionary modes — exact vs pyarrow."""
    rng = random.Random(42)

    def mk(i):
        if rng.random() < 0.15:
            return None
        return [None if rng.random() < 0.2 else
                {"a": None if rng.random() < 0.3
                 else rng.randrange(1000),
                 "b": None if rng.random() < 0.3
                 else "s%d" % rng.randrange(50),
                 "inner": None if rng.random() < 0.25 else
                 [None if rng.random() < 0.2 else rng.random()
                  for _ in range(rng.randrange(0, 4))]}
                for _ in range(rng.randrange(0, 5))]

    typ = pa.list_(pa.struct([
        ("a", pa.int64()), ("b", pa.string()),
        ("inner", pa.list_(pa.float64()))]))
    n = 5000
    data = [mk(i) for i in range(n)]
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "x": pa.array(data, typ)})
    for dic, rgs in ((True, 1000), (False, 700)):
        buf = io.BytesIO()
        pq.write_table(t, buf, use_dictionary=dic,
                       data_page_size=512, row_group_size=rgs,
                       compression="snappy")
        buf.seek(0)
        foot = parquet_footer_from_file(buf)
        got = []
        for g in range(len(foot["row_groups"])):
            got += read_row_group(buf, foot, g)["x"]
        assert got == data, (dic, rgs)


def test_bloom_filter_vs_spark_java_writer(spark, tmp_path):
    """SBBF read side (round 12) against parquet-mr's OWN bloom
    filters (Spark-Java-written, XXH64 + block layout): ZERO false
    negatives over every written value — any bit of drift in the
    hash, block selection, or salt math would miss — and a sane
    false-positive rate on absent values."""
    import glob

    from modeltracking_spark.operators.parquet_native import (
        bloom_hash,
        read_bloom_filter,
        sbbf_check,
    )

    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("parquet.bloom.filter.enabled#u", "true")
    try:
        out = str(tmp_path / "bloomed")
        (spark.range(60000)
         .selectExpr("id", "concat('user-', uuid()) AS u")
         .coalesce(1).write.mode("overwrite").parquet(out))
    finally:
        hc.unset("parquet.bloom.filter.enabled#u")
    part = glob.glob(out + "/part-*.parquet")[0]
    with open(part, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        fn = fp = absent = 0
        for rg_i, rg in enumerate(foot["row_groups"]):
            chunk = rg["chunks"]["u"]
            assert chunk.get("bloom") is not None
            bits = read_bloom_filter(fh, chunk)
            vals = read_row_group(fh, foot, rg_i, ["u"])["u"]
            for v in vals:
                if not sbbf_check(bits, bloom_hash(v, "BYTE_ARRAY",
                                                   True)):
                    fn += 1
            for i in range(10000):
                if sbbf_check(bits, bloom_hash("absent-%d" % i,
                                               "BYTE_ARRAY", True)):
                    fp += 1
                absent += 1
    assert fn == 0
    assert fp / absent < 0.05


# ------------------------------------------------------------------
# round 14 (VERDICT r13 item 6): LEGACY 2-level lists — the format's
# backward-compatibility rules, hand-built bytes (no modern writer
# emits them), pyarrow as the compat-rule twin.
# ------------------------------------------------------------------

def _legacy_fixture_bytes(seed=41, n=300):
    import random as _r

    from modeltracking_spark.operators.parquet_write import (
        write_legacy_two_level,
    )

    rng = _r.Random(seed)
    ids = list(range(n))
    vals = [[rng.randrange(-10**9, 10**9)
             for _ in range(rng.randrange(4))] for _ in range(n)]
    tags = [None if rng.random() < 0.15 else
            ["t%d" % rng.randrange(30)
             for _ in range(rng.randrange(3))] for _ in range(n)]
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".parquet",
                                     delete=False) as fh:
        path = fh.name
    write_legacy_two_level(path, ids, vals, tags)
    return open(path, "rb").read(), ids, vals, tags


def test_legacy_two_level_lists_vs_pyarrow():
    """Rule 1 (bare repeated primitive = required list of required
    elements) and rule 2 (repeated non-group child under LIST = the
    element) decode exactly; pyarrow — which implements the same
    compat rules — reads the identical hand-built bytes as the
    twin."""
    blob, ids, vals, tags = _legacy_fixture_bytes()
    t = pq.read_table(io.BytesIO(blob))
    assert t.column("id").to_pylist() == ids
    assert t.column("vals").to_pylist() == vals
    assert t.column("tags").to_pylist() == tags
    # rule-1 lists are non-nullable in the twin's schema view
    assert not t.schema.field("vals").nullable
    f, got = _read_all(io.BytesIO(blob))
    kinds = {c["name"]: c["kind"] for c in f["columns"]}
    assert kinds == {"id": "flat", "vals": "nested",
                     "tags": "nested"}
    assert got["id"] == ids
    assert got["vals"] == vals
    assert got["tags"] == tags


def test_legacy_two_level_empty_and_extreme_profiles():
    from modeltracking_spark.operators.parquet_write import (
        write_legacy_two_level,
    )
    import tempfile

    cases = [
        ([0], [[]], [None]),            # empty rule-1, null rule-2
        ([0], [[]], [[]]),              # both empty
        ([0, 1], [[5], []], [["a"], []]),
        ([0], [[1, 2, 3, 4, 5]], [["x"] * 7]),
    ]
    for ids, vals, tags in cases:
        with tempfile.NamedTemporaryFile(suffix=".parquet",
                                         delete=False) as fh:
            path = fh.name
        write_legacy_two_level(path, ids, vals, tags)
        blob = open(path, "rb").read()
        t = pq.read_table(io.BytesIO(blob))
        _f, got = _read_all(io.BytesIO(blob))
        assert got["vals"] == t.column("vals").to_pylist() == vals
        assert got["tags"] == t.column("tags").to_pylist() == tags
    # rule-1 records are required: a None list is a writer-side error
    with pytest.raises(ValueError, match="REQUIRED"):
        write_legacy_two_level("/dev/null", [0], [None], [None])


def test_legacy_two_level_corruption_fuzz():
    """The new decode branches under byte mutation: exact decode or a
    typed ValueError/NotImplementedError — never a leaked internal
    error (VERDICT r13 item 6's fuzz-extension clause)."""
    blob, _ids, _vals, _tags = _legacy_fixture_bytes(seed=7, n=120)
    rng = random.Random(1406)
    for _ in range(300):
        b = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = (b[:i] + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 12)))
                 + b[i:])
        try:
            _read_all(io.BytesIO(bytes(b)))
        except (ValueError, NotImplementedError):
            pass


def test_legacy_struct_list_rules34_vs_pyarrow():
    """Backward-compat rules 3/4: a repeated GROUP under LIST that has
    multiple fields, or is named 'array' / '<list>_tuple', IS the
    required-struct element (no 3-level wrapper).  Hand-built bytes;
    pyarrow (same compat rules) is the twin."""
    import random as _r
    import tempfile

    from modeltracking_spark.operators.parquet_write import (
        write_legacy_struct_list,
    )

    rng = _r.Random(53)
    n = 200
    ids = list(range(n))
    pairs = []
    for _ in range(n):
        roll = rng.random()
        if roll < 0.12:
            pairs.append(None)
        elif roll < 0.2:
            pairs.append([])
        else:
            pairs.append([
                (rng.randrange(-10**9, 10**9),
                 None if rng.random() < 0.3
                 else "s%d" % rng.randrange(40))
                for _ in range(rng.randrange(1, 4))])
    with tempfile.NamedTemporaryFile(suffix=".parquet",
                                     delete=False) as fh:
        path = fh.name
    write_legacy_struct_list(path, ids, pairs)
    blob = open(path, "rb").read()
    t = pq.read_table(io.BytesIO(blob))
    want = [None if p is None else [{"a": a, "b": b} for a, b in p]
            for p in pairs]
    assert t.column("pairs").to_pylist() == want
    assert not t.schema.field("pairs").type.value_field.nullable
    _f, got = _read_all(io.BytesIO(blob))
    assert got["id"] == ids
    assert got["pairs"] == want


def test_legacy_list_name_heuristics():
    """The schema-walk heuristics at the unit level: 'array' and
    '<name>_tuple' single-field repeated groups are struct elements;
    multi-field repeated groups are struct elements regardless of
    name; a single-field repeated group with any OTHER name is the
    STANDARD 3-level wrapper; a repeated group without a LIST/MAP
    annotation stays a typed reject."""
    from modeltracking_spark.operators.parquet_native import (
        _parse_nested,
    )

    def leaf(name, phys=2, repetition=0):
        return {1: phys, 3: repetition, 4: name.encode()}

    def group(name, nch, repetition=0, converted=None):
        el = {3: repetition, 4: name.encode(), 5: nch}
        if converted is not None:
            el[6] = converted
        return el

    # rule 4: single-field repeated group named "array"
    node, nxt = _parse_nested(
        [group("xs", 1, 1, 3), group("array", 1, 2), leaf("v")],
        0, 0, 0, "")
    assert node["t"] == "list" and node["element"]["t"] == "struct"
    assert node["element"]["name"] == "array" and nxt == 3
    # rule 4: "<name>_tuple"
    node, _ = _parse_nested(
        [group("xs", 1, 1, 3), group("xs_tuple", 1, 2), leaf("v")],
        0, 0, 0, "")
    assert node["element"]["t"] == "struct"
    # rule 3: multi-field repeated group, any name
    node, nxt = _parse_nested(
        [group("xs", 1, 1, 3), group("whatever", 2, 2),
         leaf("a"), leaf("b")], 0, 0, 0, "")
    assert node["element"]["t"] == "struct"
    assert [f["name"] for f in node["element"]["fields"]] == \
        ["a", "b"]
    assert nxt == 4
    # standard 3-level: single-field repeated group, other name
    node, _ = _parse_nested(
        [group("xs", 1, 1, 3), group("list", 1, 2),
         leaf("element", repetition=1)], 0, 0, 0, "")
    assert node["t"] == "list" and node["element"]["t"] == "leaf"
    # unannotated repeated group: still a typed reject
    with pytest.raises(NotImplementedError, match="LIST/MAP"):
        _parse_nested([group("g", 1, 2), leaf("v")], 0, 0, 0, "")


def test_legacy_struct_list_corruption_fuzz():
    import tempfile

    from modeltracking_spark.operators.parquet_write import (
        write_legacy_struct_list,
    )

    with tempfile.NamedTemporaryFile(suffix=".parquet",
                                     delete=False) as fh:
        path = fh.name
    write_legacy_struct_list(
        path, list(range(60)),
        [[(i, "t%d" % i)] if i % 3 else None for i in range(60)])
    blob = open(path, "rb").read()
    rng = random.Random(3414)
    for _ in range(250):
        b = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = (b[:i] + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 12)))
                 + b[i:])
        try:
            _read_all(io.BytesIO(bytes(b)))
        except (ValueError, NotImplementedError):
            pass


def test_external_file_path_summary_twin(tmp_path):
    """Hadoop-summary-file shape (VERDICT r14 item 9): ColumnChunks
    carrying ``file_path`` resolve their page bytes from the named
    sibling data file at the recorded offsets.  The data file names
    ITSELF (so it stays self-consistent and pyarrow-readable), and a
    metadata-only twin — PAR1 + the copied footer + PAR1 — reads the
    identical rows through the sibling redirect."""
    from modeltracking_spark.operators.parquet_write import (
        ParquetFileWriter,
    )

    schema = [("id", "int64", False), ("name", "string", True)]
    cols = {"id": list(range(20)),
            "name": [None if i % 5 == 0 else f"n{i}"
                     for i in range(20)]}
    data = tmp_path / "data.parquet"
    with open(data, "wb") as fh:
        w = ParquetFileWriter(fh, schema, codec="SNAPPY",
                              data_file_ref="data.parquet")
        w.write_row_group(cols)
        w.finish()
    # the data file itself stays valid (file_path -> itself)
    with open(data, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        assert all(ch["file_path"] == "data.parquet"
                   for rg in foot["row_groups"]
                   for ch in rg["chunks"].values())
        got = read_row_group(fh, foot, 0)
    assert got["id"] == cols["id"] and got["name"] == cols["name"]
    assert pq.read_table(str(data)).to_pydict()["id"] == cols["id"]
    # metadata-only summary twin: magic + copied footer + len + magic
    blob = data.read_bytes()
    flen = int.from_bytes(blob[-8:-4], "little")
    summary = tmp_path / "summary.parquet"
    summary.write_bytes(b"PAR1" + blob[-8 - flen:])
    with open(summary, "rb") as fh:
        foot2 = parquet_footer_from_file(fh)
        got2 = read_row_group(fh, foot2, 0)
    assert got2 == got
    # an anonymous byte stream cannot resolve the sibling: typed reject
    with pytest.raises(ValueError, match="anonymous byte stream"):
        buf = io.BytesIO(summary.read_bytes())
        f3 = parquet_footer_from_file(buf)
        read_row_group(buf, f3, 0)


def test_summary_twin_bloom_and_page_prune(tmp_path):
    """file_path chunks route ALL their byte reads — bloom bitsets and
    page-pruned reads, not just whole-chunk payloads — through the
    named sibling data file (the _chunk_handle redirect): a
    metadata-only summary twin must return bit-identical bloom
    filters and page-pruned values."""
    from modeltracking_spark.operators.parquet_native import (
        read_bloom_filter,
        read_column_chunk_pages,
        read_page_index,
    )
    from modeltracking_spark.operators.parquet_write import (
        ParquetFileWriter,
    )

    schema = [("id", "int64", False), ("name", "string", True)]
    n = 300
    cols = {"id": list(range(n)),
            "name": [f"n{i}" for i in range(n)]}
    data = tmp_path / "data.parquet"
    with open(data, "wb") as fh:
        w = ParquetFileWriter(fh, schema, codec="SNAPPY",
                              data_file_ref="data.parquet",
                              page_rows=64, page_index=True,
                              bloom_columns=["id"])
        w.write_row_group(cols)
        w.finish()
    blob = data.read_bytes()
    flen = int.from_bytes(blob[-8:-4], "little")
    summary = tmp_path / "summary.parquet"
    summary.write_bytes(b"PAR1" + blob[-8 - flen:])

    def _all(path):
        with open(path, "rb") as fh:
            foot = parquet_footer_from_file(fh)
            by = {c["name"]: c for c in foot["columns"]}
            ch_id = foot["row_groups"][0]["chunks"]["id"]
            bits = read_bloom_filter(fh, ch_id)
            pi = read_page_index(fh, ch_id, by["id"])
            keep = [i % 2 == 0 for i in range(len(pi["pages"]))]
            vals = read_column_chunk_pages(fh, ch_id, by["id"], pi,
                                           keep)
        return bits, pi, vals

    bits_d, pi_d, vals_d = _all(data)
    bits_s, pi_s, vals_s = _all(summary)
    assert bits_d is not None and bits_d == bits_s
    assert pi_d == pi_s
    assert vals_d == vals_s
    assert len(vals_d) < n  # pruning actually skipped pages
