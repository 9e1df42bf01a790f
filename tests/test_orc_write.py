"""From-spec ORC WRITER (operators/orc_write.py): REFERENCE readers
(pyarrow.orc, Spark's Java ORC DataSource) consume files this module
writes, and the repo's own from-spec reader closes the loop."""

import datetime as dt
import io
import random

import pytest

from modeltracking_spark.operators.orc_native import (
    bool_rle,
    byte_rle,
    int_rle_v1,
    orc_footer_from_file,
    read_stripe,
)
from modeltracking_spark.operators.orc_write import (
    bool_rle_encode,
    byte_rle_encode,
    int_rle_v1_encode,
    orc_write_table,
)

SCHEMA = [
    ("id", "int64", False),
    ("name", "string", True),
    ("score", "double", True),
    ("flag", "boolean", False),
    ("raw", "binary", True),
    ("f32", "float", False),
    ("ts", "timestamp", True),
]
COLS = {
    "id": list(range(10)),
    "name": ["alpha", None, "béta", "alpha", "", None, "gamma",
             "alpha", "delta", "ε"],
    "score": [1.5, None, -2.25, 3.0, None, 0.0, -0.0, 1e300,
              float("inf"), 42.0],
    "flag": [True, False] * 5,
    "raw": [b"\x00\xff", None, b"", b"abc", b"\x01", None, b"xyz",
            b"q", b"\xfe", b"end"],
    "f32": [0.5, 1.25, -3.0, 2.0, 8.0, 16.0, -0.125, 4.0, 1.0, 0.0],
    # micros: unix epoch, ORC's own 2015 epoch +/- 1 us, sub-second
    # shapes, and a far future second
    "ts": [0, None, 1420070400_000000, 1, 999999,
           1700000000_123456, None, 86400_000000,
           1420070399_999999, (1 << 33) * 1_000_000],
}


def _ts_us(v):
    if v is None:
        return None
    return (int(v.replace(tzinfo=dt.timezone.utc).timestamp())
            * 1_000_000 + v.microsecond)


@pytest.mark.parametrize("codec", ["NONE", "ZLIB", "SNAPPY", "LZO",
                                   "LZ4", "ZSTD"])
def test_pyarrow_orc_reads_full_matrix(codec):
    import pyarrow.orc as po

    blob = orc_write_table(COLS, SCHEMA, codec=codec, stripe_rows=4)
    d = po.read_table(io.BytesIO(blob)).to_pydict()
    for k in ("id", "name", "score", "flag", "raw", "f32"):
        assert d[k] == COLS[k], (codec, k)
    assert [_ts_us(v) for v in d["ts"]] == COLS["ts"], codec


def test_spark_jvm_reads(spark, tmp_path):
    d = tmp_path / "orcw"
    d.mkdir()
    (d / "part-0.orc").write_bytes(
        orc_write_table(COLS, SCHEMA, codec="ZLIB", stripe_rows=4))
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        rows = {r["id"]: r for r in spark.read.orc(str(d)).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert sorted(rows) == COLS["id"]
    for i in COLS["id"]:
        assert rows[i]["name"] == COLS["name"][i]
        assert rows[i]["raw"] == COLS["raw"][i]
        assert rows[i]["flag"] == COLS["flag"][i]
        assert _ts_us(rows[i]["ts"]) == COLS["ts"][i]


def test_own_reader_roundtrip(tmp_path):
    p = tmp_path / "own.orc"
    p.write_bytes(orc_write_table(COLS, SCHEMA, codec="ZSTD",
                                  stripe_rows=4))
    with open(p, "rb") as fh:
        foot = orc_footer_from_file(fh)
        assert foot["num_rows"] == 10
        assert len(foot["stripes"]) == 3  # 4+4+2
        got = {c["name"]: [] for c in foot["columns"]}
        for i in range(3):
            st = read_stripe(fh, foot, i)
            for k in got:
                got[k] += st[k]
    for k in COLS:
        assert got[k] == COLS[k], k


def test_rle_encoders_roundtrip_through_reader():
    rng = random.Random(11)
    for _ in range(40):
        n = rng.randrange(0, 500)
        raw = bytearray()
        while len(raw) < n:
            if rng.random() < 0.5:
                raw += bytes([rng.randrange(256)]) * rng.randrange(1, 200)
            else:
                raw += bytes(rng.randrange(256)
                             for _ in range(rng.randrange(1, 10)))
        raw = bytes(raw[:n])
        assert byte_rle(byte_rle_encode(raw), n) == raw
        bools = [bool(b & 1) for b in raw]
        assert bool_rle(bool_rle_encode(bools), n) == bools
        for signed in (True, False):
            vals = []
            while len(vals) < n:
                if rng.random() < 0.5:
                    v = rng.randrange(-2**40, 2**40) if signed \
                        else rng.randrange(2**40)
                    vals += [v] * rng.randrange(1, 200)
                else:
                    vals += [rng.randrange(-2**62, 2**62) if signed
                             else rng.randrange(2**62)
                             for _ in range(rng.randrange(1, 8))]
            vals = vals[:n]
            enc = int_rle_v1_encode(vals, signed)
            assert int_rle_v1(enc, n, signed) == vals


def test_rle_v2_encoder_roundtrips_through_reader():
    from modeltracking_spark.operators.orc_native import int_rle_v2
    from modeltracking_spark.operators.orc_write import (
        int_rle_v2_encode,
    )

    rng = random.Random(13)
    for signed in (True, False):
        for _ in range(60):
            n = rng.randrange(0, 1500)
            vals = []
            while len(vals) < n:
                c = rng.randrange(4)
                if c == 0:  # repeat run (SHORT_REPEAT fodder)
                    v = rng.randrange(-2**40, 2**40) if signed \
                        else rng.randrange(2**40)
                    vals += [v] * rng.randrange(1, 40)
                elif c == 1:  # wide literals (DIRECT, wide widths)
                    vals += [rng.randrange(-2**63, 2**63 - 1) if signed
                             else rng.randrange(2**64 - 1)
                             for _ in range(rng.randrange(1, 8))]
                else:  # small literals
                    vals += [rng.randrange(-64, 64) if signed
                             else rng.randrange(128)
                             for _ in range(rng.randrange(1, 12))]
            vals = vals[:n]
            enc = int_rle_v2_encode(vals, signed)
            assert int_rle_v2(enc, n, signed) == vals, (signed, n)


@pytest.mark.parametrize("codec", ["NONE", "ZLIB"])
def test_rle_v2_files_read_by_all_three_readers(spark, tmp_path,
                                                codec):
    """rle_version=2 files (DIRECT_V2 column encodings, SHORT_REPEAT +
    DIRECT runs) decode exactly under pyarrow.orc, Spark's Java
    reader, and the own reader."""
    import pyarrow.orc as po

    blob = orc_write_table(COLS, SCHEMA, codec=codec, stripe_rows=4,
                           rle_version=2)
    d = po.read_table(io.BytesIO(blob)).to_pydict()
    for k in ("id", "name", "score", "flag", "raw", "f32"):
        assert d[k] == COLS[k], k
    assert [_ts_us(v) for v in d["ts"]] == COLS["ts"]
    p = tmp_path / "v2.orc"
    p.write_bytes(blob)
    with open(p, "rb") as fh:
        foot = orc_footer_from_file(fh)
        got = {c["name"]: [] for c in foot["columns"]}
        for i in range(len(foot["stripes"])):
            st = read_stripe(fh, foot, i)
            for k in got:
                got[k] += st[k]
    for k in COLS:
        assert got[k] == COLS[k], k
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        rows = {r["id"]: r
                for r in spark.read.orc(str(tmp_path)).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert sorted(rows) == COLS["id"]
    assert rows[2]["name"] == "béta"
    assert _ts_us(rows[5]["ts"]) == COLS["ts"][5]


def test_typed_rejects():
    with pytest.raises(NotImplementedError, match="codec"):
        # LZO/LZ4 write landed in round 15 — BROTLI is not an ORC
        # CompressionKind at all, so it stays the reject probe
        orc_write_table({"a": [1]}, [("a", "int64", False)],
                        codec="BROTLI")
    with pytest.raises(NotImplementedError, match="not supported"):
        orc_write_table({"a": [1]}, [("a", "decimal", False)])
    with pytest.raises(ValueError, match="ragged"):
        orc_write_table({"a": [1], "b": [1, 2]},
                        [("a", "int64", False), ("b", "int64", False)])
    with pytest.raises(ValueError, match="null in required"):
        orc_write_table({"a": [1, None]}, [("a", "int64", False)])


def test_empty_table_and_no_present_stream():
    import pyarrow.orc as po

    blob = orc_write_table({"a": [], "b": []},
                           [("a", "int64", False), ("b", "string", True)])
    t = po.read_table(io.BytesIO(blob))
    assert t.num_rows == 0
    # a nullable column with no actual nulls omits PRESENT (the
    # reference writers' convention) and still reads back exactly
    blob = orc_write_table({"b": ["x", "y"]}, [("b", "string", True)])
    assert po.read_table(io.BytesIO(blob)).to_pydict() == {
        "b": ["x", "y"]}


def test_orc_sink_distributed_write(spark, tmp_path):
    """df.write.format('orc_native'): the shared two-phase commit over
    the from-spec ORC encoder; Spark's Java ORC reader consumes the
    output including a real timestamp column."""
    import os

    from pyspark.sql import functions as F

    from modeltracking_spark.queries.common import (
        ensure_pkg_on_workers,
    )
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    spark.dataSource.register(OrcNativeDataSource)
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        d = str(tmp_path / "orcsink")
        df = (spark.range(0, 300)
              .select(F.col("id").alias("doc_id"),
                      F.concat(F.lit("t-"), F.col("id")).alias("text"),
                      F.timestamp_micros(
                          F.col("id") * 1_000_003
                          + F.lit(1_500_000_000_000_000)).alias("ts"))
              .repartition(3))
        (df.write.format("orc_native").option("path", d)
         .option("codec", "ZSTD").mode("append").save())
        names = sorted(os.listdir(d))
        assert names.count("_SUCCESS") == 1
        assert "_temporary" not in names
        assert sum(n.endswith(".orc") for n in names) == 3
        back = spark.read.orc(d)
        assert back.count() == 300
        rows = {r["doc_id"]: r for r in back.collect()}
        for i in (0, 7, 299):
            assert rows[i]["text"] == f"t-{i}"
            assert _ts_us(rows[i]["ts"].replace(tzinfo=None)) == \
                i * 1_000_003 + 1_500_000_000 * 1_000_000
        # the files really are this repo's encoder
        part = next(n for n in names if n.endswith(".orc"))
        with open(os.path.join(d, part), "rb") as fh:
            foot = orc_footer_from_file(fh)
        assert foot["codec"] == "ZSTD"
        # and the own DataSource reads them back (ts as epoch micros)
        own = (spark.read.format("orc_native").option("path", d)
               .load())
        assert own.count() == 300
        got = {r["doc_id"]: r["ts"] for r in own.collect()}
        assert got[299] == 299 * 1_000_003 + 1_500_000_000 * 1_000_000
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_random_tables_roundtrip_pyarrow():
    import pyarrow.orc as po

    rng = random.Random(37)
    for trial in range(20):
        n = rng.randrange(0, 150)
        cols = {
            "i": [rng.randrange(-2**62, 2**62) for _ in range(n)],
            "s": [None if rng.random() < 0.3 else
                  "".join(rng.choice("abλ字 xyz")
                          for _ in range(rng.randrange(0, 12)))
                  for _ in range(n)],
            "d": [None if rng.random() < 0.2 else
                  rng.random() * 10 ** rng.randrange(-3, 3)
                  for _ in range(n)],
            "t": [None if rng.random() < 0.2 else
                  rng.randrange(0, 4 * 10**15)
                  for _ in range(n)],
        }
        schema = [("i", "int64", False), ("s", "string", True),
                  ("d", "double", True), ("t", "timestamp", True)]
        blob = orc_write_table(
            cols, schema,
            codec=rng.choice(["NONE", "ZLIB", "SNAPPY", "ZSTD"]),
            stripe_rows=rng.choice([1, 7, 50, 1000]))
        d = po.read_table(io.BytesIO(blob)).to_pydict()
        assert d["i"] == cols["i"], trial
        assert d["s"] == cols["s"], trial
        assert d["d"] == cols["d"], trial
        assert [_ts_us(v) for v in d["t"]] == cols["t"], trial


def test_orc_source_stripe_coalescing(spark, tmp_path):
    """target_partition_bytes groups CONSECUTIVE stripes into one
    InputPartition (the same scale knob as the parquet source and the
    compressed-scan tier) with rows identical to the per-stripe
    default."""
    import os

    p = tmp_path / "many.orc"
    cols = {"a": list(range(5000)),
            "s": [f"row-{i}" for i in range(5000)]}
    p.write_bytes(orc_write_table(
        cols, [("a", "int64", False), ("s", "string", False)],
        codec="ZLIB", stripe_rows=100))  # 50 stripes
    from modeltracking_spark.queries.common import (
        ensure_pkg_on_workers,
    )
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    spark.dataSource.register(OrcNativeDataSource)
    base = (spark.read.format("orc_native")
            .option("path", str(p)).load())
    assert base.rdd.getNumPartitions() == 50
    total = os.path.getsize(p)
    co = (spark.read.format("orc_native").option("path", str(p))
          .option("target_partition_bytes", str(total // 5)).load())
    assert 3 <= co.rdd.getNumPartitions() <= 8
    assert sorted(map(tuple, co.collect())) == \
        sorted(map(tuple, base.collect()))


def test_orc_writer_hypothesis_roundtrip():
    """Property battery: arbitrary tables written by the from-spec ORC
    writer decode exactly under pyarrow.orc across codec / RLE-version
    / stripe-split combinations, with shrinking on failure."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.fixed_dictionaries({
        "i": st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
        "s": st.one_of(st.none(), st.text(max_size=16)),
        "d": st.one_of(st.none(),
                       st.floats(allow_nan=False, allow_infinity=True)),
        "t": st.one_of(st.none(),
                       st.integers(min_value=0, max_value=4 * 10**15)),
    })

    @settings(max_examples=60, deadline=None)
    @given(st.lists(row, max_size=40),
           st.sampled_from(["NONE", "ZLIB", "SNAPPY", "ZSTD"]),
           st.sampled_from([1, 2]),
           st.sampled_from([1, 7, 1000]))
    def rt(rows, codec, rle_v, stripe_rows):
        import pyarrow.orc as po

        cols = {k: [r[k] for r in rows] for k in ("i", "s", "d", "t")}
        schema = [("i", "int64", False), ("s", "string", True),
                  ("d", "double", True), ("t", "timestamp", True)]
        blob = orc_write_table(cols, schema, codec=codec,
                               rle_version=rle_v,
                               stripe_rows=stripe_rows)
        d = po.read_table(io.BytesIO(blob)).to_pydict()
        assert d["i"] == cols["i"]
        assert d["s"] == cols["s"]
        assert d["d"] == cols["d"]
        assert [_ts_us(v) for v in d["t"]] == cols["t"]

    rt()


LIST_COLS = {
    "id": list(range(10)),
    "emb": [[1.0, 2.5], None, [], [None, 4.0], [5.0], None,
            [6.0, None, 7.0], [], [8.0], [9.0, 10.0, 11.0]],
    "tags": [["a", "b"], [], None, ["c"], ["dd", "ee", "ff"], ["g"],
             None, [], ["h"], ["i", "j"]],
}
LIST_SCHEMA = [("id", "int64", False), ("emb", "list<float?>", True),
               ("tags", "list<string>", True)]


@pytest.mark.parametrize("rle_v", [1, 2])
def test_list_columns_write_read_matrix(rle_v):
    """ORC LIST columns (one nested level — the array<float> embedding
    shape): null lists, empty lists, null elements, written from spec
    and decoded by pyarrow.orc AND the own reader across codecs."""
    import pyarrow.orc as po

    for codec in ("NONE", "ZLIB", "SNAPPY", "ZSTD"):
        blob = orc_write_table(LIST_COLS, LIST_SCHEMA, codec=codec,
                               stripe_rows=4, rle_version=rle_v)
        d = po.read_table(io.BytesIO(blob)).to_pydict()
        for k in LIST_COLS:
            assert d[k] == LIST_COLS[k], (codec, rle_v, k)
    blob = orc_write_table(LIST_COLS, LIST_SCHEMA, codec="ZLIB",
                           stripe_rows=4, rle_version=rle_v)
    fh = io.BytesIO(blob)
    foot = orc_footer_from_file(fh)
    got = {c["name"]: [] for c in foot["columns"]}
    for i in range(len(foot["stripes"])):
        st = read_stripe(fh, foot, i)
        for k in got:
            got[k] += st[k]
    assert got == LIST_COLS


def test_list_columns_jvm_and_reference_writer(spark, tmp_path):
    """Both directions against the JVM: Spark's Java ORC reader
    consumes a from-spec-written LIST file, and a Spark-Java-WRITTEN
    list file decodes exactly under the own reader + own DataSource."""
    import glob

    from pyspark.sql import functions as F

    from modeltracking_spark.queries.common import (
        ensure_pkg_on_workers,
    )
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    d = tmp_path / "lists"
    d.mkdir()
    (d / "part-0.orc").write_bytes(
        orc_write_table(LIST_COLS, LIST_SCHEMA, codec="ZLIB",
                        stripe_rows=4))
    rows = {r["id"]: r for r in spark.read.orc(str(d)).collect()}
    for i in LIST_COLS["id"]:
        assert rows[i]["emb"] == LIST_COLS["emb"][i]
        assert rows[i]["tags"] == LIST_COLS["tags"][i]

    # reverse: the reference Java writer encodes, from-spec decodes
    src = (spark.range(0, 50)
           .select(F.col("id"),
                   F.when(F.col("id") % 5 == 0, None).otherwise(
                       F.array(F.col("id").cast("double"),
                               (F.col("id") * 2).cast("double"))
                   ).alias("vals")))
    jdir = str(tmp_path / "jvm_lists")
    src.coalesce(1).write.mode("overwrite").orc(jdir)
    f = glob.glob(jdir + "/part-*.orc")[0]
    with open(f, "rb") as fh:
        foot = orc_footer_from_file(fh)
        got = {c["name"]: [] for c in foot["columns"]}
        for i in range(len(foot["stripes"])):
            st = read_stripe(fh, foot, i)
            for k in got:
                got[k] += st[k]
    want = {r["id"]: r["vals"] for r in src.collect()}
    assert dict(zip(got["id"], got["vals"])) == want

    # and through the own DataSource (array<double> schema mapping)
    ensure_pkg_on_workers(spark)
    spark.dataSource.register(OrcNativeDataSource)
    own = spark.read.format("orc_native").option("path", jdir).load()
    assert dict(own.dtypes)["vals"] == "array<double>"
    assert {r["id"]: r["vals"] for r in own.collect()} == want


@pytest.mark.parametrize("rle_v", [1, 2])
def test_dictionary_strings_write(spark, tmp_path, rle_v):
    """Dictionary-encoded STRING writes (sorted unique entries,
    DICTIONARY/DICTIONARY_V2 column encodings with dictionarySize):
    auto mode fires on repetitive chunks; pyarrow.orc, Spark's Java
    reader, and the own reader all decode; string_dictionary=False
    forces DIRECT."""
    import pyarrow.orc as po

    from modeltracking_spark.operators.orc_native import pb_message

    cols = {"s": ["alpha", "beta", "alpha", None, "gamma", "alpha",
                  "beta", "", "alpha", "beta"] * 5}
    schema = [("s", "string", True)]
    blob = orc_write_table(cols, schema, codec="ZLIB",
                           stripe_rows=1000, rle_version=rle_v)
    assert po.read_table(io.BytesIO(blob)).to_pydict()["s"] == cols["s"]
    # the stripe footer really declares a dictionary encoding
    fh = io.BytesIO(blob)
    foot = orc_footer_from_file(fh)
    from modeltracking_spark.operators.orc_native import (
        decompress_entity,
    )

    st = foot["stripes"][0]
    fh.seek(st["offset"] + st["index_length"] + st["data_length"])
    sfoot = pb_message(decompress_entity(
        fh.read(st["footer_length"]), foot["codec"],
        foot["block_size"]))
    encs = [pb_message(e) for e in sfoot.get(2) or []]
    kind = (encs[1].get(1) or [0])[0]
    assert kind == (3 if rle_v == 2 else 1)  # DICTIONARY(_V2)
    assert (encs[1].get(2) or [0])[0] == 4   # alpha/beta/gamma/""
    got = {"s": []}
    for i in range(len(foot["stripes"])):
        got["s"] += read_stripe(fh, foot, i)["s"]
    assert got == cols
    d = tmp_path / f"dict{rle_v}"
    d.mkdir()
    (d / "p.orc").write_bytes(blob)
    rows = [r["s"] for r in spark.read.orc(str(d)).collect()]
    assert sorted(x or "" for x in rows) == sorted(
        x or "" for x in cols["s"])
    # forced DIRECT keeps the old shape
    blob2 = orc_write_table(cols, schema, codec="ZLIB",
                            rle_version=rle_v)
    import modeltracking_spark.operators.orc_write as ow
    import io as _io

    buf = _io.BytesIO()
    w = ow.OrcFileWriter(buf, schema, codec="ZLIB",
                         rle_version=rle_v, string_dictionary=False)
    w.write_stripe(cols)
    w.finish()
    assert po.read_table(
        _io.BytesIO(buf.getvalue())).to_pydict()["s"] == cols["s"]


def test_date_columns_and_jvm(spark, tmp_path):
    """DATE columns (epoch days, int RLE): pyarrow.orc, Spark's Java
    reader, the own reader, and the sink's DateType mapping."""
    import datetime as ddt

    import pyarrow.orc as po
    from pyspark.sql import functions as F

    from modeltracking_spark.queries.common import (
        ensure_pkg_on_workers,
    )
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    cols = {"d": [0, None, 19000, -3650, 1, 365] * 4}
    blob = orc_write_table(cols, [("d", "date", True)], codec="ZLIB",
                           stripe_rows=7, rle_version=2)
    got = po.read_table(io.BytesIO(blob)).to_pydict()["d"]
    epoch = ddt.date(1970, 1, 1)
    assert [None if v is None else (v - epoch).days for v in got] \
        == cols["d"]
    p = tmp_path / "dates"
    p.mkdir()
    (p / "d.orc").write_bytes(blob)
    rows = [r["d"] for r in spark.read.orc(str(p)).collect()]
    assert sorted((v - epoch).days for v in rows if v is not None) \
        == sorted(v for v in cols["d"] if v is not None)
    # sink roundtrip of Spark DateType
    ensure_pkg_on_workers(spark)
    spark.dataSource.register(OrcNativeDataSource)
    d2 = str(tmp_path / "sinkdates")
    (spark.range(0, 40)
     .select(F.date_add(F.lit("2020-01-01").cast("date"),
                        F.col("id").cast("int")).alias("day"))
     .repartition(2)
     .write.format("orc_native").option("path", d2)
     .mode("append").save())
    back = spark.read.orc(d2)
    assert back.count() == 40
    assert back.agg(F.min("day")).first()[0] == ddt.date(2020, 1, 1)
    assert back.agg(F.max("day")).first()[0] == ddt.date(2020, 2, 9)


def test_parquet_page_crc_verified_by_pyarrow(tmp_path):
    """PageHeader.crc (field 4): pyarrow's opt-in verification accepts
    our checksums across page versions and dictionary modes, and a
    page-BODY bit flip is caught as a CRC failure."""
    import io as _io

    import pyarrow.parquet as _pq

    from modeltracking_spark.operators.parquet_write import (
        parquet_write_table,
    )

    cols = {"a": list(range(100)), "s": [f"v{i % 7}"
                                         for i in range(100)]}
    schema = [("a", "int64", False), ("s", "string", True)]
    for pv in (1, 2):
        for dic in (True, False):
            blob = parquet_write_table(cols, schema, codec="SNAPPY",
                                       page_version=pv, dictionary=dic,
                                       page_rows=30)
            t = _pq.ParquetFile(
                _io.BytesIO(blob),
                page_checksum_verification=True).read()
            assert t.to_pydict() == cols, (pv, dic)
    blob = parquet_write_table(cols, schema, codec="SNAPPY",
                               page_rows=30, dictionary=False)
    crc_seen = False
    for off in range(4, 200):
        bad = bytearray(blob)
        bad[off] ^= 0x01
        try:
            _pq.ParquetFile(_io.BytesIO(bytes(bad)),
                            page_checksum_verification=True).read()
        except Exception as e:  # noqa: BLE001 — any reject is fine
            if "CRC" in str(e):
                crc_seen = True
                break
    assert crc_seen


def test_struct_write_roundtrip_all_readers():
    """Writer STRUCT arm (round 12): null structs / null leaves /
    required leaves across codecs and RLE versions — pyarrow.orc +
    the own from-spec reader; null in a required field rejects."""
    import io

    import pyarrow.orc as pa_orc
    import pytest as _pytest

    from modeltracking_spark.operators.orc_native import (
        orc_footer_from_file,
        read_stripe,
    )
    from modeltracking_spark.operators.orc_write import orc_write_table

    schema = [("id", "int64", False),
              ("props", "struct<a:int32?, b:string?, c:double>", True)]
    recs = [{"a": 1, "b": "x", "c": 1.5}, None,
            {"a": None, "b": "zz", "c": -2.0},
            {"a": 7, "b": None, "c": 0.25}] * 5
    cols = {"id": list(range(20)), "props": recs}
    for codec in ("NONE", "ZLIB", "ZSTD"):
        for rv in (1, 2):
            blob = orc_write_table(cols, schema, codec=codec,
                                   rle_version=rv, stripe_rows=7)
            t = pa_orc.ORCFile(io.BytesIO(blob)).read().to_pydict()
            assert t["props"] == recs, (codec, rv)
            buf = io.BytesIO(blob)
            foot = orc_footer_from_file(buf)
            got = []
            for i in range(len(foot["stripes"])):
                got += read_stripe(buf, foot, i)["props"]
            assert got == recs, (codec, rv)
    with _pytest.raises(ValueError, match="struct field"):
        orc_write_table(
            {"id": [1], "props": [{"a": 1, "b": "x", "c": None}]},
            schema)


def test_stripe_statistics_written_and_merged():
    """The writer's Metadata section (round 12): per-stripe zone maps
    with exact int/string/double/date bounds, NaN-poisoned double
    stripes omitting min/max, non-ASCII strings omitted, file-footer
    stats = the per-stripe merge — all parsed back by the own reader
    AND accepted by pyarrow."""
    import io

    import pyarrow.orc as pa_orc

    from modeltracking_spark.operators.orc_native import (
        orc_footer_from_file,
    )
    from modeltracking_spark.operators.orc_write import orc_write_table

    cols = {
        "i": list(range(40)),
        "f": [float("nan") if i == 5 else i * 0.5 for i in range(40)],
        "s": ["ascii-%02d" % i if i < 20 else "uni-é%02d" % i
              for i in range(40)],
        "d": [18000 + i for i in range(40)],
        "b": [i % 3 == 0 for i in range(40)],
    }
    schema = [("i", "int64", False), ("f", "double", False),
              ("s", "string", False), ("d", "date", False),
              ("b", "boolean", False)]
    blob = orc_write_table(cols, schema, codec="ZLIB", stripe_rows=20)
    buf = io.BytesIO(blob)
    foot = orc_footer_from_file(buf)
    ss = foot["stripe_stats"]
    assert len(ss) == 2
    assert (ss[0][1]["min"], ss[0][1]["max"]) == (0, 19)
    assert (ss[1][1]["min"], ss[1][1]["max"]) == (20, 39)
    assert "min" not in ss[0][2]          # NaN stripe: no double mm
    assert ss[1][2]["min"] == 10.0        # clean stripe keeps them
    assert ss[0][3]["min"] == "ascii-00"  # ASCII stripe has bounds
    assert "min" not in ss[1][3]          # non-ASCII stripe omits
    assert (ss[0][4]["min"], ss[1][4]["max"]) == (18000, 18039)
    assert ss[0][5]["true_count"] == 7
    # pyarrow accepts the file (metadata section + stats wire format)
    assert pa_orc.ORCFile(io.BytesIO(blob)).read().num_rows == 40


def test_orc_stream_sink_end_to_end_and_epoch_log(spark, tmp_path):
    """writeStream.format('orc_native') (round 12): per-epoch 2PC,
    output readable by the JVM ORC reader, _epochs log records every
    committed batch."""
    import os

    from pyspark.sql import functions as F

    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(OrcNativeDataSource)
    except Exception:
        pass
    src = str(tmp_path / "src")
    for i in range(3):  # three input files -> three micro-batches
        (spark.range(i * 100, (i + 1) * 100)
         .select(F.col("id").alias("doc_id"))
         .coalesce(1).write.mode("append").parquet(src))
    out = str(tmp_path / "out")
    q = (spark.readStream.schema("doc_id long")
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.format("orc_native")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    back = spark.read.orc(out)
    assert back.count() == 300
    assert back.agg(F.sum("doc_id")).collect()[0][0] == 299 * 300 // 2
    with open(os.path.join(out, "_epochs")) as fh:
        assert {int(x) for x in fh.read().split()} == {0, 1, 2}


def test_decimal_write_roundtrip_all_readers(spark, tmp_path):
    """Writer DECIMAL arm (round 12): flat / list-element /
    struct-field decimal carriers across codecs and RLE versions —
    unbounded zigzag varint mantissas (25-digit values exceed any
    64-bit path) + constant-scale SECONDARY — read back by
    pyarrow.orc, Spark's JVM ORC reader, and the own from-spec
    reader; DecimalStatistics zone maps written; overflow and
    inexact-scale values reject loudly."""
    import io

    import pyarrow.orc as pa_orc
    from decimal import Decimal as D

    from modeltracking_spark.operators.orc_native import (
        orc_footer_from_file,
        read_stripe,
    )
    from modeltracking_spark.operators.orc_write import orc_write_table

    schema = [("id", "int64", False),
              ("d", "decimal(25,5)", True),
              ("ld", "list<decimal(9,2)?>", True),
              ("st", "struct<a:decimal(9,2)?, b:int64>", True)]
    cols = {
        "id": list(range(8)),
        "d": [D("1.23000"), None, D("-12345678901234567890.12345"),
              D("0.00001"), D("99999999999999999999.99999"),
              D("-0.00001"), None, D("42.00000")],
        "ld": [[D("0.50"), None], None, [], [D("2.25")],
               [D("-1.00")], [D("0.01"), D("0.02")], None, []],
        "st": [{"a": D("9.99"), "b": 1}, None, {"a": None, "b": 2},
               {"a": D("-0.01"), "b": 3}, {"a": D("0.00"), "b": 4},
               None, {"a": D("5.55"), "b": 5}, {"a": None, "b": 6}],
    }
    for codec in ("NONE", "ZLIB", "ZSTD"):
        for rv in (1, 2):
            blob = orc_write_table(cols, schema, codec=codec,
                                   rle_version=rv, stripe_rows=3)
            t = pa_orc.ORCFile(io.BytesIO(blob)).read().to_pydict()
            assert t["d"] == cols["d"], (codec, rv)
            assert t["ld"] == cols["ld"], (codec, rv)
            assert t["st"] == cols["st"], (codec, rv)
            buf = io.BytesIO(blob)
            foot = orc_footer_from_file(buf)
            got = {"d": [], "ld": [], "st": []}
            for i in range(len(foot["stripes"])):
                st_out = read_stripe(buf, foot, i)
                for k in got:
                    got[k] += st_out[k]
            assert got == {k: cols[k] for k in got}, (codec, rv)
    # DecimalStatistics zone maps: per-stripe and file-level merge
    blob = orc_write_table(cols, schema, codec="ZLIB", stripe_rows=3)
    buf = io.BytesIO(blob)
    foot = orc_footer_from_file(buf)
    s0 = foot["stripe_stats"][0][2]  # column id 2 = "d"
    assert s0["min"] == D("-12345678901234567890.12345")
    assert s0["max"] == D("1.23")
    # Spark's JVM ORC reader consumes the same bytes
    p = tmp_path / "dec.orc"
    p.write_bytes(blob)
    rows = {r["id"]: (r["d"], r["st"]) for r in
            spark.read.orc(str(p)).collect()}
    assert rows[2][0] == D("-12345678901234567890.12345")
    assert rows[0][1]["a"] == D("9.99") and rows[1][1] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overflow"):
        orc_write_table({"id": [1], "d": [D("1.23")]},
                        [("id", "int64", False),
                         ("d", "decimal(2,2)", True)])
    with _pytest.raises(ValueError, match="scale"):
        orc_write_table({"id": [1], "d": [D("1.234")]},
                        [("id", "int64", False),
                         ("d", "decimal(9,2)", True)])


def test_sink_decimal_end_to_end(spark, tmp_path):
    """df.write.format('orc_native') with DecimalType columns: output
    reads back exactly via Spark's JVM ORC reader AND the own
    source."""
    from pyspark.sql import functions as F

    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )
    from pyspark.errors import PySparkException

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(OrcNativeDataSource)
    except PySparkException:
        pass
    df = (spark.range(20)
          .select(
              F.col("id"),
              (F.col("id").cast("decimal(20,0)") / 100)
              .cast("decimal(22,2)").alias("price")))
    out = str(tmp_path / "ds")
    (df.write.format("orc_native").option("path", out)
     .mode("append").save())
    exp = {r["id"]: r["price"] for r in df.collect()}
    for back in (spark.read.orc(out),
                 spark.read.format("orc_native")
                 .option("path", out).load()):
        got = {r["id"]: r["price"] for r in back.collect()}
        assert got == exp


def test_map_write_roundtrip_all_readers(spark, tmp_path):
    """Writer MAP arm (round 12): null maps / empty maps / null
    values, string and int keys, decimal values, across codecs and
    RLE versions — pyarrow.orc + Spark's JVM reader + the own
    from-spec reader; null keys / null values without '?' / null
    maps in required columns reject loudly."""
    import io

    import pyarrow.orc as pa_orc
    from decimal import Decimal as D

    from modeltracking_spark.operators.orc_native import (
        orc_footer_from_file,
        read_stripe,
    )
    from modeltracking_spark.operators.orc_write import orc_write_table

    schema = [("id", "int64", False),
              ("m", "map<string,double?>", True),
              ("counts", "map<int64,int64>", False),
              ("prices", "map<string,decimal(9,2)?>", True)]
    maps = [{"a": 1.5, "b": None}, None, {},
            {"z": 9.0, "y": -2.25}] * 4
    counts = [{i: i * 10, i + 1: 0} for i in range(16)]
    prices = [{"p": D("1.23"), "q": None}, None, {},
              {"r": D("-99.99")}] * 4
    cols = {"id": list(range(16)), "m": maps, "counts": counts,
            "prices": prices}
    for codec in ("NONE", "ZLIB", "ZSTD"):
        for rv in (1, 2):
            blob = orc_write_table(cols, schema, codec=codec,
                                   rle_version=rv, stripe_rows=5)
            t = pa_orc.ORCFile(io.BytesIO(blob)).read()
            assert [None if r is None else dict(r)
                    for r in t.column("m").to_pylist()] == maps
            assert [dict(r)
                    for r in t.column("counts").to_pylist()] == counts
            buf = io.BytesIO(blob)
            foot = orc_footer_from_file(buf)
            got = {"m": [], "counts": [], "prices": []}
            for i in range(len(foot["stripes"])):
                out = read_stripe(buf, foot, i)
                for k in got:
                    got[k] += out[k]
            assert got == {"m": maps, "counts": counts,
                           "prices": prices}, (codec, rv)
    # Spark's JVM ORC reader consumes the same bytes
    blob = orc_write_table(cols, schema, codec="ZLIB", rle_version=2)
    p = tmp_path / "m.orc"
    p.write_bytes(blob)
    rows = {r["id"]: r for r in spark.read.orc(str(p)).collect()}
    assert rows[0]["m"] == {"a": 1.5, "b": None}
    assert rows[1]["m"] is None and rows[2]["m"] == {}
    assert rows[0]["prices"] == {"p": D("1.23"), "q": None}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="map key"):
        orc_write_table(
            {"m": [{None: 1.0}]},
            [("m", "map<string,double?>", True)])
    with _pytest.raises(ValueError, match="map value"):
        orc_write_table(
            {"m": [{"a": None}]},
            [("m", "map<string,double>", True)])
    with _pytest.raises(ValueError, match="null in required column"):
        orc_write_table(
            {"m": [None]},
            [("m", "map<string,double>", False)])
    with _pytest.raises(ValueError, match="keys must be required"):
        orc_write_table(
            {"m": [{}]},
            [("m", "map<string?,double>", True)])


def test_sink_map_end_to_end(spark, tmp_path):
    """df.write.format('orc_native') with a MapType column: the Arrow
    write path hands the executor list-of-(k, v) pairs; output reads
    back exactly via Spark's JVM ORC reader AND the own source."""
    from pyspark.errors import PySparkException

    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(OrcNativeDataSource)
    except PySparkException:
        pass
    df = spark.createDataFrame(
        [(1, {"a": 1.5, "b": None}), (2, None), (3, {}),
         (4, {"z": 9.0})],
        "id bigint, m map<string, double>")
    out = tmp_path / "mapsink"
    (df.write.format("orc_native").option("path", str(out))
     .mode("append").save())
    for back in (spark.read.orc(str(out)),
                 spark.read.format("orc_native")
                 .option("path", str(out)).load()):
        rows = {r.id: r.m for r in back.collect()}
        assert rows == {1: {"a": 1.5, "b": None}, 2: None, 3: {},
                        4: {"z": 9.0}}


def test_nested_write_roundtrip_all_readers(spark, tmp_path):
    """GENERAL nested ORC writer (round 12): list<struct> with an
    inner list, struct<struct> with a decimal leaf, list<list>,
    map<string,list> — across codecs and RLE versions, read back by
    pyarrow.orc, Spark's JVM ORC reader, and the own from-spec
    reader; null in a required nested field rejects loudly."""
    import io

    import pyarrow.orc as pa_orc
    from decimal import Decimal as D

    from modeltracking_spark.operators.orc_native import (
        orc_footer_from_file,
        read_stripe,
    )
    from modeltracking_spark.operators.orc_write import orc_write_table

    schema = [
        ("id", "int64", False),
        ("ls", "list<struct<a:int64?, b:string?, "
               "inner:list<double?>?>?>", True),
        ("ss", "struct<in_:struct<p:int64?, q:decimal(9,2)?>?, "
               "z:double>", True),
        ("ll", "list<list<int64?>?>", True),
        ("mv", "map<string,list<double?>?>", True),
    ]
    cols = {
        "id": [1, 2, 3, 4],
        "ls": [[{"a": 1, "b": "x", "inner": [1.5, None]}, None,
                {"a": None, "b": None, "inner": []}], None, [],
               [{"a": 5, "b": "q", "inner": None}]],
        "ss": [{"in_": {"p": 1, "q": D("1.25")}, "z": 0.5}, None,
               {"in_": None, "z": -1.0},
               {"in_": {"p": None, "q": None}, "z": 2.0}],
        "ll": [[[1, 2], None, []], None, [], [[3, None]]],
        "mv": [{"k": [1.0, 2.0], "e": []}, None, {"n": None}, {}],
    }
    for codec in ("NONE", "ZLIB", "ZSTD"):
        for rv in (1, 2):
            blob = orc_write_table(cols, schema, codec=codec,
                                   rle_version=rv, stripe_rows=3)
            buf = io.BytesIO(blob)
            foot = orc_footer_from_file(buf)
            got = {n: [] for n in cols}
            for s in range(len(foot["stripes"])):
                o = read_stripe(buf, foot, s)
                for n in cols:
                    got[n] += o[n]
            assert got == cols, (codec, rv)
            t = pa_orc.ORCFile(io.BytesIO(blob)).read()
            assert t.column("ls").to_pylist() == cols["ls"]
            assert t.column("ss").to_pylist() == cols["ss"]
            assert t.column("ll").to_pylist() == cols["ll"]
            assert [None if r is None else dict(r)
                    for r in t.column("mv").to_pylist()] == cols["mv"]
    # Spark's JVM ORC reader consumes the same bytes
    blob = orc_write_table(cols, schema, codec="ZLIB", rle_version=2)
    p = tmp_path / "nested.orc"
    p.write_bytes(blob)
    rows = {r["id"]: r.asDict(recursive=True)
            for r in spark.read.orc(str(p)).collect()}
    assert rows[1]["ls"][0] == {"a": 1, "b": "x",
                                "inner": [1.5, None]}
    assert rows[2]["ls"] is None and rows[3]["ls"] == []
    assert rows[1]["ss"]["in_"]["q"] == D("1.25")
    assert rows[1]["mv"] == {"k": [1.0, 2.0], "e": []}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="required"):
        orc_write_table(
            {"ls": [[{"a": None}]]},
            [("ls", "list<struct<a:int64>?>", True)])
    with _pytest.raises(ValueError, match="null map key"):
        orc_write_table(
            {"mv": [{None: [1.0]}]},
            [("mv", "map<string,list<double?>?>", True)])


def test_sink_nested_end_to_end(spark, tmp_path):
    """df.write.format('orc_native') with deeply nested Spark types:
    output reads back exactly via Spark's JVM ORC reader AND the own
    source (nested instants round-trip via the recursive converter —
    see test_sink_nested_instants_end_to_end)."""
    from pyspark.errors import PySparkException
    from pyspark.sql import functions as F

    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(OrcNativeDataSource)
    except PySparkException:
        pass
    df = spark.sql("""
      SELECT * FROM VALUES
       (1, array(named_struct('a', 1L,
                 'xs', array(1.5D, CAST(NULL AS DOUBLE)))),
           map('k', array(0.25D)),
           named_struct('in', named_struct(
               'p', CAST('1.25' AS DECIMAL(9,2))))),
       (2, CAST(NULL AS array<struct<a:bigint,xs:array<double>>>),
           CAST(NULL AS map<string,array<double>>),
           named_struct('in',
               CAST(NULL AS struct<p:decimal(9,2)>))),
       (3, array(), map(),
           CAST(NULL AS struct<in:struct<p:decimal(9,2)>>))
      AS t(id, ls, mv, ss)""")
    out = str(tmp_path / "nested")
    (df.write.format("orc_native").option("path", out)
     .mode("append").save())
    exp = {r["id"]: r.asDict(recursive=True) for r in df.collect()}
    for back in (spark.read.orc(out),
                 spark.read.format("orc_native")
                 .option("path", out).load()):
        got = {r["id"]: r.asDict(recursive=True)
               for r in back.collect()}
        assert got == exp


def test_pre1970_timestamp_write_all_readers(spark, tmp_path):
    """Pre-1970 timestamp WRITE (round 13, VERDICT r12 item 4): the
    ORC JAVA convention (floor seconds, positive nanos, one-second
    bump when seconds < 0 past the millisecond boundary) —
    pyarrow.orc, Spark's Java ORC reader and the repo's own reader
    all decode the bytes to the original instants across the
    1899/1960/2262 boundary pins and a random pre/post-1970 mix,
    over the codec x RLE-version matrix.  The (-1 s, 0)
    above-a-millisecond window is the documented typed reject: the
    Java stack misreads its own writes there (pinned below) and
    crashes on the C++ signed-nanos alternative."""
    pins = [
        -2209075199999999,   # 1899-12-31 00:00:00.000001
        -315619199876544,    # 1960-01-01 00:00:00.123456
        -1000000, -999001, -1500000, -999000001,
        0, 1, 999999,
        9214646400000001,    # 2262-01-01 00:00:00.000001
        1420070400000000,    # the 2015 ORC stream epoch
        1420070399999999,
        None,
    ]
    rng = random.Random(131)
    vals = pins + [
        rng.randrange(-3_000_000_000_000_000, 3_000_000_000_000_000)
        for _ in range(400)]
    # shift the unwritable (-1 s, 0) window out of the random mix
    vals = [v - 1_000_000 if v is not None and -999_000 <= v <= -1
            else v for v in vals]
    # year 1 sits outside pandas' ns-Timestamp range, so pyarrow's
    # read-back cannot carry it — pin it through the own reader only
    year1 = -62135596800000000
    epoch = dt.datetime(1970, 1, 1)
    exp_dt = [None if v is None else
              epoch + dt.timedelta(microseconds=v) for v in vals]
    import pyarrow.orc as po

    for rle_v in (1, 2):
        for codec in ("NONE", "ZLIB", "SNAPPY", "ZSTD"):
            blob = orc_write_table(
                {"ts": vals}, [("ts", "timestamp", True)],
                codec=codec, rle_version=rle_v)
            got = po.read_table(
                io.BytesIO(blob)).column("ts").to_pylist()
            assert got == exp_dt, (rle_v, codec)
            fh = io.BytesIO(blob)
            foot = orc_footer_from_file(fh)
            own = []
            for i in range(len(foot["stripes"])):
                own.extend(read_stripe(fh, foot, i)["ts"])
            assert own == vals, (rle_v, codec)
    blob = orc_write_table({"ts": [year1, 0]},
                           [("ts", "timestamp", True)])
    fh = io.BytesIO(blob)
    foot = orc_footer_from_file(fh)
    assert read_stripe(fh, foot, 0)["ts"] == [year1, 0]
    # the documented reject window: (-1 s, 0) past the millisecond
    for bad in (-1, -500000, -999000):
        with pytest.raises(NotImplementedError, match="-1 s"):
            orc_write_table({"ts": [bad]},
                            [("ts", "timestamp", True)])
    # ...and the reason it is a reject: the JAVA stack misreads its
    # own writes in that window (reference behavior, pinned so a
    # future ORC release flipping this gets noticed)
    sdf = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 23, 59, 59, 500000),)], "ts timestamp")
    jdir = str(tmp_path / "java_window")
    sdf.coalesce(1).write.mode("overwrite").orc(jdir)
    back = spark.read.orc(jdir).collect()[0]["ts"]
    assert back == dt.datetime(1970, 1, 1, 0, 0, 0, 500000)  # +0.5 s!
    # Spark's Java ORC reader on one representative file
    from pyspark.sql import functions as F

    p = tmp_path / "pre1970.orc"
    p.write_bytes(orc_write_table({"ts": vals},
                                  [("ts", "timestamp", True)]))
    back = [r["ts"] for r in
            spark.read.orc(str(tmp_path))
            .orderBy(F.col("ts").asc_nulls_last()).collect()]
    assert back == sorted(exp_dt, key=lambda v: (v is None, v))


def test_sub_microsecond_timestamp_read_floors():
    """Sub-microsecond ORC payloads (round 13): the reader floors to
    the engine's micros grain — exactly pyarrow's ns value
    floor-divided by 1000, for both sign conventions."""
    import pyarrow as pa
    import pyarrow.orc as po

    rng = random.Random(77)
    ns_vals = [1234, -1234, 999_999_999_999_001,
               -999_999_999_999_001, 1, -1, 0, None] + \
              [rng.randrange(-2**60, 2**60) for _ in range(400)]
    buf = io.BytesIO()
    po.write_table(
        pa.table({"ts": pa.array(ns_vals, pa.timestamp("ns"))}), buf)
    fh = io.BytesIO(buf.getvalue())
    foot = orc_footer_from_file(fh)
    own = []
    for i in range(len(foot["stripes"])):
        own.extend(read_stripe(fh, foot, i)["ts"])
    assert own == [None if v is None else v // 1000 for v in ns_vals]


def test_nested_instants_write_all_readers():
    """Timestamps and dates at every nesting position (struct field,
    list element, map value, deep tree) — written from epoch
    micros/days, read back by pyarrow.orc and the own reader."""
    import pyarrow.orc as po

    epoch = dt.datetime(1970, 1, 1)
    epd = dt.date(1970, 1, 1)
    cols = {
        "st": [{"ts": -315619199876544, "d": -3653},
               {"ts": 86400_000000, "d": 19000}, None],
        "lt": [[-1000000, 0, None], [], [1420070400000000]],
        "mt": [[("a", -2209075199999999)], [], [("b", None)]],
        "deep": [{"inner": [{"ts": -999001}]},
                 None, {"inner": []}],
    }
    schema = [
        ("st", "struct<ts:timestamp,d:date>", True),
        ("lt", "list<timestamp?>", False),
        ("mt", "map<string,timestamp?>", False),
        ("deep", "struct<inner:list<struct<ts:timestamp>>>", True),
    ]
    for rle_v in (1, 2):
        blob = orc_write_table(cols, schema, rle_version=rle_v)
        t = po.read_table(io.BytesIO(blob))
        st = t.column("st").to_pylist()
        assert st[0] == {"ts": epoch + dt.timedelta(
            microseconds=-315619199876544),
            "d": epd + dt.timedelta(days=-3653)}
        assert st[2] is None
        lt = t.column("lt").to_pylist()
        assert lt[0] == [epoch + dt.timedelta(microseconds=-1000000),
                         epoch, None]
        mt = t.column("mt").to_pylist()
        assert mt[0] == [("a", epoch + dt.timedelta(
            microseconds=-2209075199999999))]
        assert mt[2] == [("b", None)]
        deep = t.column("deep").to_pylist()
        assert deep[0] == {"inner": [{"ts": epoch + dt.timedelta(
            microseconds=-999001)}]}
        # own reader surfaces physical micros/days
        fh = io.BytesIO(blob)
        foot = orc_footer_from_file(fh)
        got = read_stripe(fh, foot, 0)
        assert got["st"] == cols["st"]
        assert got["lt"] == cols["lt"]
        assert got["deep"] == cols["deep"]


def test_sink_nested_instants_end_to_end(spark, tmp_path):
    """Nested TIMESTAMP/DATE through the orc_native SINK (round 13,
    VERDICT r12 item 4): the recursive _instant_converter routes the
    epoch-micros/epoch-days conversion through struct/array/map
    shapes; Spark's JVM ORC reader reads the files back exactly,
    including pre-1970 instants."""
    from pyspark.errors import PySparkException

    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.orc_native_source import (
        OrcNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    try:
        spark.dataSource.register(OrcNativeDataSource)
    except PySparkException:
        pass
    df = spark.sql("""
      SELECT * FROM VALUES
       (1, named_struct('ts', TIMESTAMP '1960-01-01 00:00:00.123456',
                        'd', DATE '1899-12-31'),
           array(TIMESTAMP '1969-12-31 23:59:58.5',
                 CAST(NULL AS TIMESTAMP)),
           map('a', TIMESTAMP '2262-01-01 00:00:00.000001'),
           named_struct('inner', array(named_struct(
               'when', DATE '1960-02-29')))),
       (2, CAST(NULL AS struct<ts:timestamp,d:date>),
           array(TIMESTAMP '2015-01-01 00:00:00'),
           map(),
           named_struct('inner',
               CAST(array() AS array<struct<when:date>>)))
      AS t(id, st, lt, mt, deep)""")
    out = str(tmp_path / "nested_ts")
    (df.write.format("orc_native").option("path", out)
     .mode("append").save())
    exp = {r["id"]: r.asDict(recursive=True) for r in df.collect()}
    got = {r["id"]: r.asDict(recursive=True)
           for r in spark.read.orc(out).collect()}
    assert got == exp


def test_union_write_roundtrip_all_readers():
    """Writer-side UNION (round 13 — the type tree is now complete in
    BOTH directions): ``union<t0,t1,...>`` columns (values as the
    reader's tagged-struct dicts or (tag, value) pairs) emit the tag
    byte-RLE DATA stream + per-variant value recording; pyarrow (the
    ORC C++ reader) and the own reader decode them exactly across the
    codec x RLE matrix, including a nullable variant."""
    rng = random.Random(77)
    n = 300
    rows = []
    for i in range(n):
        tg = rng.randrange(3)
        if tg == 0:
            v = (None if rng.random() < 0.2
                 else rng.randrange(-10**9, 10**9))
        elif tg == 1:
            v = "u%d" % rng.randrange(40)
        else:
            v = rng.random()
        rows.append({"tag": tg, f"field{tg}": v})
    # tuple shape on a second column, nested inside a struct
    cols = {
        "u": rows,
        "w": [{"inner": (i % 2, i if i % 2 == 0 else float(i))}
              for i in range(n)],
        "k": list(range(n)),
    }
    schema = [("u", "union<int64?,string,double>", False),
              ("w", "struct<inner:union<int64,double>>", False),
              ("k", "int64", False)]
    import pyarrow.orc as po

    for rle_v in (1, 2):
        for codec in ("NONE", "ZLIB", "ZSTD"):
            blob = orc_write_table(cols, schema, codec=codec,
                                   rle_version=rle_v)
            t = po.ORCFile(io.BytesIO(blob)).read()
            got = t.column("u").to_pylist()
            for i, r in enumerate(rows):
                exp = r.get(f"field{r['tag']}")
                ok = got[i] == exp or (
                    isinstance(exp, float)
                    and abs(got[i] - exp) < 1e-12)
                assert ok, (rle_v, codec, i)
            gw = t.column("w").to_pylist()
            for i in range(n):
                exp = i if i % 2 == 0 else float(i)
                assert gw[i] == {"inner": exp}, (rle_v, codec, i)
            fh = io.BytesIO(blob)
            foot = orc_footer_from_file(fh)
            own = read_stripe(fh, foot, 0)
            for i, r in enumerate(rows):
                full = {"tag": r["tag"], "field0": None,
                        "field1": None, "field2": None}
                full[f"field{r['tag']}"] = r.get(f"field{r['tag']}")
                assert own["u"][i] == full, (rle_v, codec, i)
    with pytest.raises(ValueError, match="union tag"):
        orc_write_table({"u": [{"tag": 9, "field9": 1}]},
                        [("u", "union<int64,double>", False)])
    with pytest.raises(ValueError, match="variants"):
        orc_write_table({"u": []}, [("u", "union<>", False)])
