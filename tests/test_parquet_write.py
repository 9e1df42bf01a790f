"""From-spec parquet WRITER (operators/parquet_write.py): validation
is the reverse of the reader's — REFERENCE readers (pyarrow, DuckDB,
Spark's JVM DataSource) consume files this module writes, and the
repo's own from-spec reader closes the loop."""

import io
import random

import pytest

from modeltracking_spark.operators.parquet_native import (
    parquet_footer_from_file,
    read_row_group,
)
from modeltracking_spark.operators.parquet_write import (
    parquet_write_table,
    rle_bp_encode,
)

SCHEMA = [
    ("id", "int64", False),
    ("name", "string", True),
    ("score", "double", True),
    ("flag", "boolean", False),
    ("emb", "list<float?>", True),
    ("raw", "binary", True),
    ("small", "int32", True),
    ("f32", "float", False),
]
COLS = {
    "id": list(range(10)),
    "name": ["alpha", None, "béta", "alpha", "", None, "gamma",
             "alpha", "delta", "epsilon"],
    "score": [1.5, None, -2.25, 3.0, None, 0.0, -0.0, 1e300,
              float("inf"), 42.0],
    "flag": [True, False] * 5,
    "emb": [[1.0, 2.5], None, [], [None, 4.0], [5.0], None,
            [6.0, None, 7.0], [], [8.0], [9.0, 10.0, 11.0]],
    "raw": [b"\x00\xff", None, b"", b"abc", b"\x01", None, b"xyz",
            b"q", b"\xfe", b"end"],
    "small": [5, None, -7, 100, None, 0, 2**31 - 1, -2**31, 1, 2],
    "f32": [0.5, 1.25, -3.0, 2.0, 8.0, 16.0, -0.125, 4.0, 1.0, 0.0],
}


def _read_pyarrow(blob: bytes) -> dict:
    import pyarrow.parquet as pq

    return pq.read_table(io.BytesIO(blob)).to_pydict()


@pytest.mark.parametrize("codec",
                         ["UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD",
                          "LZ4_RAW"])
@pytest.mark.parametrize("dic", [None, True, False])
def test_pyarrow_reads_full_matrix(codec, dic):
    """Every codec × dictionary mode × multi-page × multi-row-group
    shape decodes exactly under pyarrow — null lists, empty lists,
    null elements, empty strings, ±inf, INT32 extremes included."""
    blob = parquet_write_table(COLS, SCHEMA, codec=codec,
                               dictionary=dic, page_rows=3,
                               row_group_rows=4)
    got = _read_pyarrow(blob)
    for name in COLS:
        assert got[name] == COLS[name], (codec, dic, name)


def test_duckdb_reads(tmp_path):
    import duckdb

    p = tmp_path / "t.parquet"
    p.write_bytes(parquet_write_table(COLS, SCHEMA, codec="ZSTD",
                                      page_rows=3, row_group_rows=4))
    rows = duckdb.sql(
        f"SELECT id, name, small, emb FROM read_parquet('{p}') "
        "ORDER BY id").fetchall()
    assert [r[0] for r in rows] == COLS["id"]
    assert [r[1] for r in rows] == COLS["name"]
    assert [r[2] for r in rows] == COLS["small"]
    assert [r[3] for r in rows] == COLS["emb"]


def test_spark_jvm_reads(spark, tmp_path):
    """Spark's own JVM parquet DataSource reads a from-spec-written
    file — schema, nulls, and the 3-level LIST all line up."""
    p = tmp_path / "jvm.parquet"
    p.write_bytes(parquet_write_table(COLS, SCHEMA, codec="SNAPPY",
                                      page_rows=4, row_group_rows=5))
    df = spark.read.parquet(str(p))
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == COLS["id"]
    for i in COLS["id"]:
        assert rows[i]["name"] == COLS["name"][i]
        assert rows[i]["emb"] == COLS["emb"][i]
        assert rows[i]["flag"] == COLS["flag"][i]
        assert rows[i]["small"] == COLS["small"][i]


def test_own_reader_roundtrip_and_stats(tmp_path):
    p = tmp_path / "own.parquet"
    p.write_bytes(parquet_write_table(COLS, SCHEMA, codec="GZIP",
                                      page_rows=3, row_group_rows=4))
    with open(p, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        assert foot["num_rows"] == 10
        assert len(foot["row_groups"]) == 3  # 4+4+2
        got = {n: [] for n in COLS}
        for i in range(3):
            rg = read_row_group(fh, foot, i)
            for n in COLS:
                got[n] += rg[n]
    for n in COLS:
        assert got[n] == COLS[n], n
    # per-group min/max statistics are exact (the row-group pruning
    # the round-11 reader does via pushFilters keys off these)
    st0 = foot["row_groups"][0]["chunks"]["id"]["stats"]
    st2 = foot["row_groups"][2]["chunks"]["id"]["stats"]
    assert (st0["min"], st0["max"]) == (0, 3)
    assert (st2["min"], st2["max"]) == (8, 9)
    assert foot["row_groups"][0]["chunks"]["name"]["stats"][
        "null_count"] == 1


def test_rle_bp_encode_roundtrips_through_reader():
    from modeltracking_spark.operators.parquet_native import (
        rle_bp_hybrid,
    )

    rng = random.Random(7)
    for bw in (1, 2, 3, 5, 8, 12, 20):
        for _ in range(20):
            n = rng.randrange(0, 400)
            vals = []
            while len(vals) < n:
                if rng.random() < 0.5:  # run
                    vals += [rng.getrandbits(bw)] * rng.randrange(1, 40)
                else:
                    vals += [rng.getrandbits(bw)
                             for _ in range(rng.randrange(1, 10))]
            vals = vals[:n]
            enc = rle_bp_encode(vals, bw)
            dec, _ = rle_bp_hybrid(enc, 0, bw, n)
            assert dec == vals, (bw, n)


@pytest.mark.parametrize("codec", ["UNCOMPRESSED", "SNAPPY", "ZSTD",
                                   "LZ4_RAW"])
@pytest.mark.parametrize("dic", [None, False])
def test_v2_pages_read_by_pyarrow_and_own_reader(codec, dic):
    """page_version=2: levels outside the compressed section, v2
    headers (num_nulls/num_rows/is_compressed) — pyarrow and the
    from-spec reader both decode the full matrix."""
    import io as _io

    blob = parquet_write_table(COLS, SCHEMA, codec=codec,
                               dictionary=dic, page_version=2,
                               page_rows=3, row_group_rows=4)
    got = _read_pyarrow(blob)
    for name in COLS:
        assert got[name] == COLS[name], (codec, dic, name)
    fh = _io.BytesIO(blob)
    foot = parquet_footer_from_file(fh)
    own = {n: [] for n in COLS}
    for i in range(len(foot["row_groups"])):
        rg = read_row_group(fh, foot, i)
        for n in COLS:
            own[n] += rg[n]
    for n in COLS:
        assert own[n] == COLS[n], (codec, dic, n)


@pytest.mark.parametrize("pv", [1, 2])
def test_delta_encodings_read_by_pyarrow_and_own_reader(pv):
    """value_encoding='delta': DELTA_BINARY_PACKED ints,
    DELTA_BYTE_ARRAY strings, DELTA_LENGTH_BYTE_ARRAY binaries,
    BYTE_STREAM_SPLIT floats — under both page versions."""
    import io as _io

    cols = {
        "i64": [0, -5, 2**62, -2**62, 1, 1, 1, 130, 129, 131],
        "i32": [None, 3, -3, 2**31 - 1, -2**31, 0, None, 7, 8, 9],
        "s": ["prefix-a", "prefix-ab", None, "prefix-ab", "", "x",
              "prefix-abc", None, "prefix", "prefix-abcd"],
        "b": [b"ab", b"abc", b"", None, b"\x00\xff", b"abc", b"q",
              b"qq", None, b"end"],
        "f": [0.5, -1.25, 3.5, 1e30, -1e-30, 0.0, 2.0, 4.0, 8.0, 16.0],
    }
    schema = [("i64", "int64", False), ("i32", "int32", True),
              ("s", "string", True), ("b", "binary", True),
              ("f", "double", False)]
    blob = parquet_write_table(cols, schema, codec="SNAPPY",
                               value_encoding="delta", page_version=pv,
                               page_rows=4, row_group_rows=6)
    got = _read_pyarrow(blob)
    for name in cols:
        assert got[name] == cols[name], (pv, name)
    fh = _io.BytesIO(blob)
    foot = parquet_footer_from_file(fh)
    own = {n: [] for n in cols}
    for i in range(len(foot["row_groups"])):
        rg = read_row_group(fh, foot, i)
        for n in cols:
            own[n] += rg[n]
    for n in cols:
        assert own[n] == cols[n], (pv, n)


def test_delta_binary_packed_encoder_fuzz():
    from modeltracking_spark.operators.parquet_native import (
        delta_binary_packed,
    )
    from modeltracking_spark.operators.parquet_write import (
        delta_binary_packed_encode,
    )

    rng = random.Random(17)
    for _ in range(60):
        n = rng.randrange(1, 800)
        c = rng.randrange(3)
        if c == 0:
            vals = [rng.randrange(-2**63, 2**63 - 1) for _ in range(n)]
        elif c == 1:  # gentle ramps (small deltas)
            vals = [0]
            for _ in range(n - 1):
                vals.append(vals[-1] + rng.randrange(-3, 4))
        else:
            vals = [rng.choice([0, 1, -1, 2**40])] * n
        enc = delta_binary_packed_encode(vals)
        dec, _ = delta_binary_packed(enc, 0, n)
        from modeltracking_spark.operators.parquet_native import (
            _wrap_signed,
        )

        assert _wrap_signed(dec, 64) == vals, (c, n)


def test_typed_rejects():
    with pytest.raises(NotImplementedError, match="codec"):
        parquet_write_table({"a": [1]}, [("a", "int64", False)],
                            codec="LZO")
    with pytest.raises(NotImplementedError, match="not supported"):
        parquet_write_table({"a": [1]}, [("a", "uint128", False)])
    with pytest.raises(ValueError, match="ragged"):
        parquet_write_table({"a": [1], "b": [1, 2]},
                            [("a", "int64", False),
                             ("b", "int64", False)])
    with pytest.raises(ValueError, match="null in required"):
        parquet_write_table({"a": [1, None]}, [("a", "int64", False)])
    with pytest.raises(ValueError, match="null element"):
        parquet_write_table({"a": [[1.0, None]]},
                            [("a", "list<float>", True)])
    with pytest.raises(ValueError, match="missing"):
        parquet_write_table({}, [("a", "int64", False)])


def test_dictionary_edge_shapes():
    # all-null column under dictionary=True falls back cleanly; a
    # single-value dictionary uses the minimum 1-bit index width
    blob = parquet_write_table(
        {"s": [None] * 6, "t": ["same"] * 6, "u": list("abcdef")},
        [("s", "string", True), ("t", "string", False),
         ("u", "string", False)],
        dictionary=True, codec="SNAPPY")
    got = _read_pyarrow(blob)
    assert got["s"] == [None] * 6
    assert got["t"] == ["same"] * 6
    assert got["u"] == list("abcdef")


def test_empty_table():
    blob = parquet_write_table({"id": [], "name": []},
                               [("id", "int64", False),
                                ("name", "string", True)])
    got = _read_pyarrow(blob)
    assert got == {"id": [], "name": []}


def _register_sink(spark):
    from modeltracking_spark.queries.common import ensure_pkg_on_workers
    from modeltracking_spark.sources.parquet_native_source import (
        ParquetNativeDataSource,
    )

    ensure_pkg_on_workers(spark)
    spark.dataSource.register(ParquetNativeDataSource)


def test_sink_distributed_write_two_phase_commit(spark, tmp_path):
    """df.write.format('parquet_native'): one file per partition via
    the temp-dir + driver-rename commit; Spark's JVM reader and
    pyarrow both consume the output; _SUCCESS stamped; no _temporary
    residue."""
    import os

    from pyspark.sql import functions as F

    _register_sink(spark)
    d = str(tmp_path / "sink")
    df = (spark.range(0, 500)
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("t-"), F.col("id")).alias("text"),
                  F.when(F.col("id") % 7 == 0, None).otherwise(
                      F.array(F.col("id").cast("float"),
                              (F.col("id") % 13).cast("float"))
                  ).alias("emb"))
          .repartition(3))
    (df.write.format("parquet_native").option("path", d)
     .option("codec", "ZSTD").mode("append").save())
    names = sorted(os.listdir(d))
    assert names.count("_SUCCESS") == 1
    assert "_temporary" not in names
    assert sum(n.endswith(".parquet") for n in names) == 3
    back = spark.read.parquet(d)
    assert back.count() == 500
    assert back.agg(F.sum("doc_id")).first()[0] == 499 * 500 // 2
    got = {r["doc_id"]: r for r in back.collect()}
    assert got[7]["emb"] is None
    assert got[8]["emb"] == [8.0, 8.0]
    import pyarrow.parquet as pq

    assert pq.read_table(d).num_rows == 500
    # the file really is this repo's encoder + declared codec
    part = next(n for n in names if n.endswith(".parquet"))
    with open(os.path.join(d, part), "rb") as fh:
        foot = parquet_footer_from_file(fh)
    assert "parquet_write" in foot["created_by"]
    assert all(c["codec"] == "ZSTD"
               for g in foot["row_groups"] for c in g["chunks"].values())


def test_sink_streams_row_groups_incrementally(spark, tmp_path):
    """The sink's memory contract: a task flushes every
    ``row_group_rows`` rows, so one partition yields one FILE with
    many row groups — never a partition-sized buffer."""
    import os

    from pyspark.sql import functions as F

    _register_sink(spark)
    d = str(tmp_path / "sink_rg")
    df = (spark.range(0, 500)
          .select(F.col("id").alias("a")).coalesce(1))
    (df.write.format("parquet_native").option("path", d)
     .option("row_group_rows", "100").mode("append").save())
    parts = [n for n in os.listdir(d) if n.endswith(".parquet")]
    assert len(parts) == 1
    with open(os.path.join(d, parts[0]), "rb") as fh:
        foot = parquet_footer_from_file(fh)
    assert foot["num_rows"] == 500
    assert [g["num_rows"] for g in foot["row_groups"]] == [100] * 5
    assert spark.read.parquet(d).count() == 500


def test_sink_overwrite_replaces_output(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    _register_sink(spark)
    d = str(tmp_path / "sink_ow")
    base = spark.range(0, 100).select(
        F.col("id").alias("a")).repartition(4)
    (base.write.format("parquet_native").option("path", d)
     .mode("append").save())
    assert sum(n.endswith(".parquet") for n in os.listdir(d)) == 4
    (base.limit(7).repartition(2).write.format("parquet_native")
     .option("path", d).mode("overwrite").save())
    assert sum(n.endswith(".parquet") for n in os.listdir(d)) == 2
    assert spark.read.parquet(d).count() == 7


def test_sink_unsupported_type_rejects(spark, tmp_path):
    from pyspark.sql import functions as F

    _register_sink(spark)
    # any LIST/STRUCT/MAP composition and top-level timestamps write
    # since round 12; NESTED timestamps stay loud rejects (they would
    # bypass the sink's epoch-micros convert hook), as do types the
    # writer has no physical mapping for
    df2 = spark.range(3).select(
        F.array(F.current_timestamp()).alias("lts"))
    with pytest.raises(Exception, match="not supported"):
        (df2.write.format("parquet_native")
         .option("path", str(tmp_path / "bad2")).mode("append").save())
    df3 = spark.range(3).select(
        (F.current_timestamp() - F.current_timestamp()).alias("iv"))
    with pytest.raises(Exception, match="not supported"):
        (df3.write.format("parquet_native")
         .option("path", str(tmp_path / "bad3")).mode("append").save())


def test_stream_sink_end_to_end_and_epoch_log(spark, tmp_path):
    """writeStream.format('parquet_native'): each micro-batch commits
    through the per-epoch two-phase protocol; output is readable by
    the JVM reader and the _epochs log records every committed
    batch."""
    import os

    from pyspark.sql import functions as F

    _register_sink(spark)
    src = str(tmp_path / "src")
    for i in range(3):  # three input files -> three micro-batches
        (spark.range(i * 100, (i + 1) * 100)
         .select(F.col("id").alias("doc_id"))
         .coalesce(1).write.mode("append").parquet(src))
    out = str(tmp_path / "out")
    q = (spark.readStream.schema("doc_id long")
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.format("parquet_native")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 300
    assert back.agg(F.sum("doc_id")).first()[0] == 299 * 300 // 2
    epochs = sorted(int(x) for x in
                    open(os.path.join(out, "_epochs")).read().split())
    assert len(epochs) >= 3
    parts = [n for n in os.listdir(out) if n.endswith(".parquet")]
    assert all(n.startswith("part-") for n in parts)


def test_stream_sink_replayed_epoch_is_noop(tmp_path):
    """Exactly-once unit contract: committing the SAME batchId twice
    must not duplicate output — the second commit drops its temp
    files and leaves the log unchanged."""
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from modeltracking_spark.sources.parquet_native_source import (
        _ParquetNativeStreamSinkWriter,
    )
    from modeltracking_spark.sources.sink_common import SinkCommit

    out = str(tmp_path / "replay")
    os.makedirs(out)
    schema = StructType([StructField("a", LongType(), False)])
    w = _ParquetNativeStreamSinkWriter({"path": out}, schema, False)

    def fake_msgs(tag):
        tmp_dir = os.path.join(out, "_temporary", w.run_id)
        os.makedirs(tmp_dir, exist_ok=True)
        p = os.path.join(tmp_dir, f"{tag}.tmp")
        with open(p, "wb") as fh:
            fh.write(parquet_write_table({"a": [1, 2]},
                                         [("a", "int64", False)]))
        return [SinkCommit(temp_path=p, final_name="x", rows=2), None]

    w.commit(fake_msgs("e7a"), 7)
    files_after_first = sorted(
        n for n in os.listdir(out) if n.endswith(".parquet"))
    assert files_after_first == ["part-00000007-00000.parquet"]
    # replay of epoch 7: temp dropped, no new visible file
    w.commit(fake_msgs("e7b"), 7)
    assert sorted(n for n in os.listdir(out)
                  if n.endswith(".parquet")) == files_after_first
    assert open(os.path.join(out, "_epochs")).read().strip() == "7"
    # a fresh epoch appends
    w.commit(fake_msgs("e8"), 8)
    assert sorted(n for n in os.listdir(out)
                  if n.endswith(".parquet")) == [
        "part-00000007-00000.parquet", "part-00000008-00000.parquet"]
    assert open(os.path.join(out, "_epochs")).read().split() == \
        ["7", "8"]
    # abort removes temps, never visible output
    msgs = fake_msgs("e9")
    w.abort(msgs, 9)
    assert not os.path.exists(msgs[0].temp_path)


def test_random_tables_roundtrip_pyarrow():
    """Randomized battery: values, null placement, page/group splits,
    codec, and dictionary mode all fuzzed; pyarrow is the oracle."""
    rng = random.Random(31)
    for trial in range(25):
        n = rng.randrange(0, 120)
        cols = {
            "i": [rng.randrange(-2**62, 2**62) for _ in range(n)],
            "s": [None if rng.random() < 0.3 else
                  "".join(rng.choice("abλ字 xyz") for _ in
                          range(rng.randrange(0, 12)))
                  for _ in range(n)],
            "d": [None if rng.random() < 0.2 else
                  rng.random() * 10 ** rng.randrange(-3, 3)
                  for _ in range(n)],
            "L": [None if rng.random() < 0.2 else
                  [None if rng.random() < 0.2 else
                   float(rng.randrange(1000))
                   for _ in range(rng.randrange(0, 5))]
                  for _ in range(n)],
        }
        schema = [("i", "int64", False), ("s", "string", True),
                  ("d", "double", True), ("L", "list<double?>", True)]
        blob = parquet_write_table(
            cols, schema,
            codec=rng.choice(["UNCOMPRESSED", "SNAPPY", "GZIP",
                              "ZSTD", "LZ4_RAW"]),
            dictionary=rng.choice([None, True, False]),
            page_rows=rng.choice([1, 2, 7, 100]),
            row_group_rows=rng.choice([3, 50, 1000]))
        got = _read_pyarrow(blob)
        for name in cols:
            assert got[name] == cols[name], (trial, name)


def test_parquet_writer_hypothesis_roundtrip():
    """Property battery: arbitrary tables (nulls, unicode, lists with
    null elements, float specials) written by the from-spec writer
    decode exactly under pyarrow across every codec / dictionary /
    page-version / encoding-family / split combination hypothesis
    explores — with shrinking to a minimal counterexample on failure."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    finite = st.floats(allow_nan=False, allow_infinity=True)
    row = st.fixed_dictionaries({
        "i": st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
        "s": st.one_of(st.none(), st.text(max_size=16)),
        "d": st.one_of(st.none(), finite),
        "L": st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), finite), max_size=4)),
    })

    @settings(max_examples=60, deadline=None)
    @given(st.lists(row, max_size=40),
           st.sampled_from(["UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD",
                            "LZ4_RAW"]),
           st.sampled_from([None, True, False]),
           st.sampled_from([1, 2]),
           st.sampled_from([None, "delta"]),
           st.sampled_from([(1, 3), (7, 13), (1000, 1000)]))
    def rt(rows, codec, dic, pv, enc, splits):
        cols = {k: [r[k] for r in rows] for k in ("i", "s", "d", "L")}
        schema = [("i", "int64", False), ("s", "string", True),
                  ("d", "double", True), ("L", "list<double?>", True)]
        blob = parquet_write_table(
            cols, schema, codec=codec, dictionary=dic,
            page_version=pv, value_encoding=enc,
            page_rows=splits[0], row_group_rows=splits[1])
        assert _read_pyarrow(blob) == cols

    rt()


def test_nan_column_omits_min_max_stats():
    """parquet-format Statistics: writers should OMIT min/max when a
    FLOAT/DOUBLE chunk contains NaN (readers prune on these bounds),
    keeping null_count; and ±0.0 bounds normalize to -0.0 min / +0.0
    max (ADVICE r11)."""
    import pyarrow.parquet as pq

    schema = [("v", "double", True), ("z", "double", False)]
    cols = {"v": [1.0, float("nan"), None, 2.0],
            "z": [0.0, -0.0, 0.0, -0.0]}
    blob = parquet_write_table(cols, schema, codec="UNCOMPRESSED")
    md = pq.ParquetFile(io.BytesIO(blob)).metadata.row_group(0)
    st_v = md.column(0).statistics
    assert st_v.null_count == 1
    assert not st_v.has_min_max, "NaN chunk must not carry min/max"
    st_z = md.column(1).statistics
    assert st_z.has_min_max
    # -0.0 as min, +0.0 as max: both zeros stay inside the bounds
    assert str(st_z.min) == "-0.0" and str(st_z.max) == "0.0"
    # values themselves round-trip untouched
    got = _read_pyarrow(blob)
    assert got["v"][0] == 1.0 and got["v"][3] == 2.0
    assert got["v"][1] != got["v"][1]  # NaN preserved


def test_batch_commit_filters_none_messages(tmp_path):
    """DataSourceWriter.commit receives List[Optional[...]] — a failed
    task contributes None.  The batch 2PC must filter None BEFORE the
    overwrite-delete loop so it can never strand the directory with
    neither old data nor _SUCCESS (ADVICE r11)."""
    from modeltracking_spark.sources.sink_common import (
        SinkCommit,
        TwoPhaseFileSinkWriter,
    )

    class W(TwoPhaseFileSinkWriter):
        suffix = ".bin"

        def begin_file(self, fh):
            pass

        def append_rows(self, columns):
            pass

        def end_file(self):
            pass

    w = W(str(tmp_path), [], overwrite=True)
    (tmp_path / "old.bin").write_bytes(b"old")
    tdir = tmp_path / "_temporary" / w.run_id
    tdir.mkdir(parents=True)
    t = tdir / "part-00000.bin.0.tmp"
    t.write_bytes(b"x")
    msg = SinkCommit(temp_path=str(t), final_name="part-00000.bin",
                     rows=3)
    w.commit([None, msg])  # must not raise on the None
    assert (tmp_path / "part-00000.bin").read_bytes() == b"x"
    assert (tmp_path / "_SUCCESS").read_text().strip() == "3"
    assert not (tmp_path / "old.bin").exists()


def test_decimal_write_roundtrip_all_readers(tmp_path):
    """Writer DECIMAL arm (VERDICT r11 item 2, write direction):
    INT32/INT64/FLBA carriers, dictionary on/off, read back by
    pyarrow, DuckDB, and the own from-spec reader; overflow and
    inexact-scale values reject loudly."""
    from decimal import Decimal as D

    import duckdb

    schema = [("id", "int64", False),
              ("p9", "decimal(9,2)", True),
              ("p18", "decimal(18,3)", True),
              ("p25", "decimal(25,5)", True)]
    cols = {"id": [1, 2, 3],
            "p9": [D("1.23"), None, D("-9999999.99")],
            "p18": [D("123456789.123"), D("-0.001"), None],
            "p25": [D("12345678901234567890.12345"), None,
                    D("-1.00000")]}
    for dic in (None, True, False):
        blob = parquet_write_table(cols, schema, codec="ZSTD",
                                   dictionary=dic)
        got = _read_pyarrow(blob)
        for n in ("p9", "p18", "p25"):
            assert got[n] == cols[n], (dic, n)
    blob = parquet_write_table(cols, schema, codec="SNAPPY")
    p = tmp_path / "dec.parquet"
    p.write_bytes(blob)
    rows = duckdb.sql(
        f"SELECT p9, p18, p25 FROM read_parquet('{p}') ORDER BY id"
    ).fetchall()
    assert [r[0] for r in rows] == cols["p9"]
    assert [r[2] for r in rows] == cols["p25"]
    with open(p, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        assert {c["name"]: c["decimal"] for c in foot["columns"]
                }["p25"] == (25, 5)
        got = read_row_group(fh, foot, 0)
    assert got["p18"] == cols["p18"]
    # FLBA decimal chunks must omit min/max (byte order != numeric
    # order for signed values); INT carriers keep exact int stats
    st = foot["row_groups"][0]["chunks"]
    assert "min" not in st["p25"]["stats"]
    assert st["p9"]["stats"]["min"] == -999999999  # unscaled
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overflow"):
        parquet_write_table({"id": [1], "p9": [D("99999999.99")]},
                            [("id", "int64", False),
                             ("p9", "decimal(9,2)", True)])
    with _pytest.raises(ValueError, match="scale"):
        parquet_write_table({"id": [1], "p9": [D("1.234")]},
                            [("id", "int64", False),
                             ("p9", "decimal(9,2)", True)])


def test_struct_write_roundtrip_all_readers(tmp_path):
    """Writer STRUCT arm (VERDICT r11 item 4, write direction): null
    structs / null leaves / required leaves, page splits inside a
    struct chunk, dictionary on/off — pyarrow + DuckDB + own
    reader."""
    import duckdb

    schema = [("id", "int64", False),
              ("props", "struct<a:int32?, b:string?, c:double>", True)]
    recs = [{"a": 1, "b": "x", "c": 1.5}, None,
            {"a": None, "b": "zz", "c": -2.0},
            {"a": 7, "b": None, "c": 0.25}] * 4
    cols = {"id": list(range(16)), "props": recs}
    for dic in (None, True, False):
        blob = parquet_write_table(cols, schema, dictionary=dic,
                                   page_rows=3)
        assert _read_pyarrow(blob)["props"] == recs, dic
    blob = parquet_write_table(cols, schema, codec="GZIP")
    p = tmp_path / "st.parquet"
    p.write_bytes(blob)
    rows = duckdb.sql(
        f"SELECT props.a, props.b, props.c FROM read_parquet('{p}') "
        "ORDER BY id").fetchall()
    assert rows[0] == (1, "x", 1.5) and rows[1] == (None, None, None)
    with open(p, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        got = read_row_group(fh, foot, 0)
    assert got["props"] == recs
    # null in a REQUIRED struct field rejects loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="required struct field"):
        parquet_write_table(
            {"id": [1], "props": [{"a": 1, "b": "x", "c": None}]},
            schema)


def test_sink_decimal_and_struct_end_to_end(spark, tmp_path):
    """df.write.format('parquet_native') with DecimalType and
    one-level StructType columns: the Arrow write path hands the
    executor Decimals and dicts; output reads back exactly via the
    JVM reader."""
    from pyspark.sql import functions as F

    _register_sink(spark)
    df = (spark.range(20)
          .select(
              F.col("id"),
              (F.col("id").cast("decimal(20,0)") / 100)
              .cast("decimal(22,2)").alias("price"),
              F.struct(
                  F.concat(F.lit("u"), F.col("id")).alias("tag"),
                  (F.col("id") * 2).alias("dbl"),
              ).alias("props")))
    out = str(tmp_path / "ds")
    (df.write.format("parquet_native").option("path", out)
     .mode("append").save())
    back = spark.read.parquet(out)
    assert back.schema["price"].dataType.simpleString() \
        == "decimal(22,2)"
    got = sorted(
        (r["id"], str(r["price"]), r["props"]["tag"],
         r["props"]["dbl"]) for r in back.collect())
    exp = [(i, f"{i/100:.2f}", f"u{i}", 2 * i) for i in range(20)]
    assert got == exp


def test_page_index_written_and_parsed(tmp_path):
    """ColumnIndex/OffsetIndex emission (VERDICT r11 item 9): pyarrow
    flags both indexes present; the own parser returns exact per-page
    bounds/locations/null-counts; page-skip candidates are
    identifiable from the index alone; the parser also decodes
    pyarrow-WRITTEN indexes (reference-writer cross-validation); and
    chunks whose bounds would be unsound (NaN pages, FLBA decimals)
    omit the ColumnIndex but keep the OffsetIndex."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from modeltracking_spark.operators.parquet_native import (
        read_page_index,
    )

    cols = {"mono": list(range(10000)),
            "s": ["k-%05d" % i for i in range(10000)],
            "maybe": [None if i % 3 == 0 else i * 0.5
                      for i in range(10000)]}
    schema = [("mono", "int64", False), ("s", "string", True),
              ("maybe", "double", True)]
    blob = parquet_write_table(cols, schema, codec="ZSTD",
                               page_rows=1000, row_group_rows=5000)
    md = pq_.ParquetFile(io.BytesIO(blob)).metadata
    for rg in range(md.num_row_groups):
        for c in range(md.num_columns):
            assert md.row_group(rg).column(c).has_column_index
            assert md.row_group(rg).column(c).has_offset_index
    fh = io.BytesIO(blob)
    foot = parquet_footer_from_file(fh)
    by = {c["name"]: c for c in foot["columns"]}
    pi = read_page_index(fh, foot["row_groups"][1]["chunks"]["mono"],
                         by["mono"])
    assert [p["first_row"] for p in pi["pages"]] == \
        [0, 1000, 2000, 3000, 4000]
    assert pi["mins"] == [5000, 6000, 7000, 8000, 9000]
    assert pi["maxs"][-1] == 9999
    assert pi["boundary_order"] == 1  # ASCENDING
    # page-skip candidates from the index alone: mono > 8999 keeps
    # exactly the last page of the second row group
    keep = [i for i, hi in enumerate(pi["maxs"]) if hi > 8999]
    assert keep == [4]
    pim = read_page_index(fh, foot["row_groups"][1]["chunks"]["maybe"],
                          by["maybe"])
    assert sum(pim["null_counts"]) == sum(
        1 for i in range(5000, 10000) if i % 3 == 0)
    # reference-writer cross-validation: parse pyarrow-written indexes
    buf = io.BytesIO()
    pq_.write_table(pa.table(cols), buf, write_page_index=True,
                    data_page_size=4096, row_group_size=5000,
                    use_dictionary=False)
    buf.seek(0)
    f2 = parquet_footer_from_file(buf)
    p2 = read_page_index(buf, f2["row_groups"][0]["chunks"]["mono"],
                         {c["name"]: c for c in f2["columns"]}["mono"])
    assert p2["mins"][0] == 0 and p2["boundary_order"] == 1
    assert p2["pages"][0]["first_row"] == 0
    # unsound-bounds chunks: NaN double page -> no ColumnIndex, but
    # the OffsetIndex stays
    blob2 = parquet_write_table(
        {"f": [1.0, float("nan"), 2.0]}, [("f", "double", False)])
    fh2 = io.BytesIO(blob2)
    f3 = parquet_footer_from_file(fh2)
    ch = f3["row_groups"][0]["chunks"]["f"]
    assert ch["column_index"] is None
    assert ch["offset_index"] is not None
    assert len(read_page_index(
        fh2, ch, f3["columns"][0])["pages"]) == 1


def test_page_index_consumed_by_spark_jvm_reader(spark, tmp_path):
    """Adversarial content check: Spark's vectorized parquet reader
    USES the column index for page-level row filtering when a filter
    is pushed (parquet.filter.columnindex.enabled defaults true) — a
    wrong index silently drops or duplicates rows, so an exact result
    on a selective filter over multi-page chunks proves the written
    index is self-consistent."""
    cols = {"mono": list(range(20000)),
            "s": ["k-%05d" % i for i in range(20000)]}
    schema = [("mono", "int64", False), ("s", "string", True)]
    p = tmp_path / "pi.parquet"
    p.write_bytes(parquet_write_table(cols, schema, codec="SNAPPY",
                                      page_rows=500,
                                      row_group_rows=20000))
    df = spark.read.parquet(str(p)).filter(
        "mono >= 7777 AND mono < 7790")
    got = sorted(r["mono"] for r in df.collect())
    assert got == list(range(7777, 7790))
    assert df.count() == 13


def test_map_write_roundtrip_all_readers(tmp_path):
    """Writer MAP arm (round 12): null maps / empty maps / null
    values / required maps, string and int keys, decimal values,
    page splits inside map chunks, dictionary on/off — read back by
    pyarrow, DuckDB, and the own from-spec reader; null keys, null
    values without '?', and null maps in required columns reject
    loudly."""
    from decimal import Decimal as D

    import duckdb

    schema = [("id", "int64", False),
              ("m", "map<string,double?>", True),
              ("counts", "map<int64,int64>", False),
              ("prices", "map<string,decimal(9,2)?>", True)]
    maps = [{"a": 1.5, "b": None}, None, {},
            {"z": 9.0, "y": -2.25, "x": 0.0}] * 4
    counts = [{i: i * 10, i + 1: 0} for i in range(16)]
    prices = [{"p": D("1.23"), "q": None}, None, {},
              {"r": D("-99.99")}] * 4
    cols = {"id": list(range(16)), "m": maps, "counts": counts,
            "prices": prices}
    pairs = [None if r is None else sorted(r.items()) for r in maps]
    for dic in (None, True, False):
        blob = parquet_write_table(cols, schema, dictionary=dic,
                                   page_rows=3)
        got = _read_pyarrow(blob)
        assert [None if r is None else sorted(r)
                for r in got["m"]] == pairs, dic
        assert [sorted(r) for r in got["counts"]] == [
            sorted(r.items()) for r in counts]
    blob = parquet_write_table(cols, schema, codec="ZSTD")
    p = tmp_path / "m.parquet"
    p.write_bytes(blob)
    rows = duckdb.sql(
        f"SELECT m['a'][1], cardinality(counts), prices['p'][1] "
        f"FROM read_parquet('{p}') ORDER BY id").fetchall()
    assert rows[0] == (1.5, 2, D("1.23"))
    assert rows[1] == (None, 2, None)
    with open(p, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        by = {c["name"]: c for c in foot["columns"]}
        assert by["m"]["kind"] == "map"
        assert by["prices"]["value"]["decimal"] == (9, 2)
        got = read_row_group(fh, foot, 0)
    assert got["m"] == maps
    assert got["counts"] == counts
    assert got["prices"] == prices
    with pytest.raises(ValueError, match="null map key"):
        parquet_write_table(
            {"id": [1], "m": [{None: 1.0}]},
            [("id", "int64", False), ("m", "map<string,double?>",
                                      True)])
    with pytest.raises(ValueError, match="null map value"):
        parquet_write_table(
            {"id": [1], "m": [{"a": None}]},
            [("id", "int64", False), ("m", "map<string,double>",
                                      True)])
    with pytest.raises(ValueError, match="null map in required"):
        parquet_write_table(
            {"id": [1], "m": [None]},
            [("id", "int64", False), ("m", "map<string,double>",
                                      False)])
    with pytest.raises(ValueError, match="keys must be required"):
        parquet_write_table(
            {"id": [1], "m": [{}]},
            [("id", "int64", False), ("m", "map<string?,double>",
                                      True)])


def test_sink_map_end_to_end(spark, tmp_path):
    """df.write.format('parquet_native') with a MapType column: the
    Arrow write path hands the executor list-of-(k, v) pairs; output
    reads back exactly via Spark's JVM reader AND the own source."""
    _register_sink(spark)
    df = spark.createDataFrame(
        [(1, {"a": 1.5, "b": None}), (2, None), (3, {}),
         (4, {"z": 9.0})],
        "id bigint, m map<string, double>")
    out = tmp_path / "mapsink"
    (df.write.format("parquet_native").option("path", str(out))
     .mode("append").save())
    for back in (spark.read.parquet(str(out)),
                 spark.read.format("parquet_native")
                 .option("path", str(out)).load()):
        rows = {r.id: r.m for r in back.collect()}
        assert rows == {1: {"a": 1.5, "b": None}, 2: None, 3: {},
                        4: {"z": 9.0}}


def test_struct_decimal_field_type_string():
    """struct<...decimal(p,s)...> type strings split on TOP-LEVEL
    commas only — the comma inside decimal(9,2) belongs to the field
    type (regression: a naive split produced 'decimal(9' and
    rejected)."""
    from decimal import Decimal as D

    schema = [("props", "struct<a:decimal(9,2)?, b:int64>", True)]
    cols = {"props": [{"a": D("1.25"), "b": 7}, None,
                      {"a": None, "b": 9}]}
    blob = parquet_write_table(cols, schema)
    got = _read_pyarrow(blob)
    assert got["props"] == cols["props"]


def test_nested_write_roundtrip_all_readers(tmp_path):
    """GENERAL nested writer (round 12): list<struct>, struct<struct>
    with a decimal leaf, list<list>, map<string,list>, and
    list<boolean> / list<decimal> (which the legacy one-level path
    never supported) — dictionary on/off, tiny pages/groups — read
    back by pyarrow, DuckDB, and the own from-spec reader; null in a
    required nested field rejects loudly."""
    from decimal import Decimal as D

    import duckdb

    schema = [
        ("id", "int64", False),
        ("ls", "list<struct<a:int64?, b:string?, "
               "inner:list<double?>?>?>", True),
        ("ss", "struct<in_:struct<p:int64?, q:decimal(9,2)?>?, "
               "z:double>", True),
        ("ll", "list<list<int64?>?>", True),
        ("mv", "map<string,list<double?>?>", True),
        ("bs", "list<boolean?>", True),
        ("ds", "list<decimal(9,2)?>", True),
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
        "bs": [[True, None, False], None, [], [True]],
        "ds": [[D("1.25"), None], None, [], [D("-0.01")]],
    }
    for dic in (None, True, False):
        blob = parquet_write_table(cols, schema, dictionary=dic,
                                   page_rows=2, row_group_rows=3)
        got = _read_pyarrow(blob)
        for n in ("ls", "ss", "ll", "bs", "ds"):
            assert got[n] == cols[n], (dic, n)
        assert [None if r is None else dict(r)
                for r in got["mv"]] == cols["mv"], dic
        fh = io.BytesIO(blob)
        foot = parquet_footer_from_file(fh)
        own = {n: [] for n in cols}
        for g in range(len(foot["row_groups"])):
            rg = read_row_group(fh, foot, g)
            for n in cols:
                own[n] += rg[n]
        assert own == cols, dic
    blob = parquet_write_table(cols, schema, codec="ZSTD")
    p = tmp_path / "nested.parquet"
    p.write_bytes(blob)
    rows = duckdb.sql(
        f"SELECT ls[1].a, ss.in_.q, ll, mv['k'][1], ds "
        f"FROM read_parquet('{p}') ORDER BY id").fetchall()
    assert rows[0] == (1, D("1.25"), [[1, 2], None, []], [1.0, 2.0],
                       [D("1.25"), None])
    assert rows[1] == (None, None, None, None, None)
    with pytest.raises(ValueError, match="required field"):
        parquet_write_table(
            {"ls": [[{"a": None}]]},
            [("ls", "list<struct<a:int64>?>", True)])
    with pytest.raises(ValueError, match="null map key"):
        parquet_write_table(
            {"mv": [{None: [1.0]}]},
            [("mv", "map<string,list<double?>?>", True)])


def test_sink_nested_end_to_end(spark, tmp_path):
    """df.write.format('parquet_native') with deeply nested Spark
    types (array<struct<..array..>>, map<string,array<double>>,
    array<boolean>, array<decimal>): output reads back exactly via
    Spark's JVM reader AND the own source."""
    _register_sink(spark)
    df = spark.sql("""
      SELECT * FROM VALUES
       (1, array(named_struct('a', 1L,
                 'xs', array(1.5D, CAST(NULL AS DOUBLE)))),
           map('k', array(0.25D)), array(true, false),
           array(CAST('1.25' AS DECIMAL(9,2)))),
       (2, CAST(NULL AS array<struct<a:bigint,xs:array<double>>>),
           CAST(NULL AS map<string,array<double>>),
           CAST(NULL AS array<boolean>), array()),
       (3, array(), map(), array(),
           CAST(NULL AS array<decimal(9,2)>))
      AS t(id, ls, mv, bs, ds)""")
    out = str(tmp_path / "nested")
    (df.write.format("parquet_native").option("path", out)
     .mode("append").save())
    exp = {r["id"]: r.asDict(recursive=True) for r in df.collect()}
    for back in (spark.read.parquet(out),
                 spark.read.format("parquet_native")
                 .option("path", out).load()):
        got = {r["id"]: r.asDict(recursive=True)
               for r in back.collect()}
        assert got == exp


def test_timestamp_write_roundtrip_all_readers(spark, tmp_path):
    """Writer TIMESTAMP arm (round 12): epoch-micros ints carried as
    INT64 + the full LogicalType.TIMESTAMP(MICROS, adjustedToUTC) +
    ConvertedType.TIMESTAMP_MICROS — pyarrow and DuckDB surface real
    timestamps; list<timestamp> rides the general nested path; the
    sink converts Spark TimestampType via integer arithmetic and
    Spark's JVM reader returns the original instants."""
    import datetime as dt

    import duckdb
    import pyarrow.parquet as pq_

    cols = {"id": [1, 2, 3],
            "ts": [0, None, 1700000000_123456],
            "lt": [[0, None], None, [1700000000_123456]]}
    schema = [("id", "int64", False), ("ts", "timestamp", True),
              ("lt", "list<timestamp?>", True)]
    blob = parquet_write_table(cols, schema, codec="SNAPPY")
    t = pq_.read_table(io.BytesIO(blob))
    assert str(t.schema.field("ts").type) == "timestamp[us, tz=UTC]"
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    got = [None if v is None
           else (v - epoch) // dt.timedelta(microseconds=1)
           for v in t.column("ts").to_pylist()]
    assert got == cols["ts"]
    p = tmp_path / "ts.parquet"
    p.write_bytes(blob)
    rows = duckdb.sql(
        f"SELECT epoch_us(ts) FROM read_parquet('{p}') ORDER BY id"
    ).fetchall()
    assert [r[0] for r in rows] == cols["ts"]
    # own reader surfaces the documented bigint-micros posture
    with open(p, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        own = read_row_group(fh, foot, 0)
    assert own["ts"] == cols["ts"] and own["lt"] == cols["lt"]
    # sink end-to-end: Spark TimestampType -> INT64 micros -> JVM read
    _register_sink(spark)
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.sql(
            "SELECT * FROM VALUES"
            " (1, TIMESTAMP'2023-11-14 22:13:20.123456'),"
            " (2, CAST(NULL AS TIMESTAMP)),"
            " (3, TIMESTAMP'1970-01-01 00:00:00')"
            " AS t(id, ts)")
        out = str(tmp_path / "tsink")
        (df.write.format("parquet_native").option("path", out)
         .mode("append").save())
        exp = {r["id"]: r["ts"] for r in df.collect()}
        got2 = {r["id"]: r["ts"]
                for r in spark.read.parquet(out).collect()}
        assert got2 == exp
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_bloom_filter_write_prune_and_jvm(spark, tmp_path):
    """SBBF write side (round 12): own-written blooms answer every
    present value True (no false negatives), keep the configured FP
    rate, prune row groups at PLANNING time through the pushdown
    reader (absent probe -> zero surviving partitions; present probe
    -> the one right group), leave pyarrow/Spark-JVM reads of the
    file untouched, and parse back through read_bloom_filter under
    mutation fuzz with typed rejects only."""
    import glob
    import random as _random

    from pyspark.sql.datasource import EqualTo

    from modeltracking_spark.operators.parquet_native import (
        bloom_hash,
        read_bloom_filter,
        sbbf_check,
    )
    from modeltracking_spark.sources.parquet_native_source import (
        _ParquetNativePruningReader,
    )

    rng = _random.Random(6)
    n = 30000
    us = ["k-%d-%x" % (i, rng.getrandbits(40)) for i in range(n)]
    blob = parquet_write_table(
        {"id": list(range(n)), "u": us},
        [("id", "int64", False), ("u", "string", True)],
        codec="ZSTD", row_group_rows=6000,
        bloom_columns=["u", "id"])
    p = tmp_path / "bl.parquet"
    p.write_bytes(blob)
    with open(p, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        fp = absent = 0
        for rg_i, rg in enumerate(foot["row_groups"]):
            bits = read_bloom_filter(fh, rg["chunks"]["u"])
            lo = rg_i * 6000
            for v in us[lo:lo + 6000]:
                assert sbbf_check(bits, bloom_hash(v, "BYTE_ARRAY",
                                                   True))
            for i in range(3000):
                if sbbf_check(bits, bloom_hash("zz-%d" % i,
                                               "BYTE_ARRAY", True)):
                    fp += 1
                absent += 1
            ibits = read_bloom_filter(fh, rg["chunks"]["id"])
            assert sbbf_check(ibits, bloom_hash(lo + 5, "INT64",
                                                False))
    assert fp / absent < 0.05
    # planning-time pruning through the pushdown reader
    r = _ParquetNativePruningReader({"path": str(p)}, None)
    r.pruning_filters = [EqualTo(("u",), "definitely-absent")]
    assert sum(1 for pt in r.partitions() if pt.value[1]) == 0
    r2 = _ParquetNativePruningReader({"path": str(p)}, None)
    r2.pruning_filters = [EqualTo(("u",), us[12345])]
    kept = [pt.value[1] for pt in r2.partitions() if pt.value[1]]
    assert kept == [[12345 // 6000]]
    # reference readers are untouched by the extra bloom bytes
    assert _read_pyarrow(blob)["u"] == us
    assert spark.read.parquet(str(p)).count() == n
    # bloom header/bitset parse under mutation fuzz: typed rejects
    with open(p, "rb") as fh:
        foot = parquet_footer_from_file(fh)
        off, ln = foot["row_groups"][0]["chunks"]["u"]["bloom"]
    base = bytearray(blob)
    for _ in range(150):
        b = bytearray(base)
        i = off + rng.randrange(min(ln, 256))
        b[i] ^= rng.randrange(1, 256)
        import io as _io

        fh2 = _io.BytesIO(bytes(b))
        foot2 = parquet_footer_from_file(fh2)
        try:
            read_bloom_filter(fh2,
                              foot2["row_groups"][0]["chunks"]["u"])
        except (ValueError, NotImplementedError):
            pass
    with pytest.raises(ValueError, match="bloom_columns"):
        parquet_write_table({"id": [1]}, [("id", "int64", False)],
                            bloom_columns=["nope"])


def test_date_write_roundtrip_all_readers(spark, tmp_path):
    """Writer DATE arm (round 12): epoch-days ints carried as INT32 +
    LogicalType.DATE / ConvertedType.DATE — pyarrow and DuckDB
    surface real dates; the sink converts Spark DateType and the JVM
    reader returns the original days, pre-1970 included."""
    import datetime as dt

    import duckdb
    import pyarrow.parquet as pq_

    blob = parquet_write_table({"d": [0, None, 19000, -1]},
                               [("d", "date", True)])
    t = pq_.read_table(io.BytesIO(blob))
    assert str(t.schema.field("d").type) == "date32[day]"
    epoch = dt.date(1970, 1, 1)
    assert [None if v is None else (v - epoch).days
            for v in t.column("d").to_pylist()] == [0, None, 19000, -1]
    p = tmp_path / "d.parquet"
    p.write_bytes(blob)
    assert [r[0] for r in duckdb.sql(
        f"SELECT d FROM read_parquet('{p}')").fetchall()] == [
        epoch, None, epoch + dt.timedelta(days=19000),
        epoch - dt.timedelta(days=1)]
    _register_sink(spark)
    df = spark.sql(
        "SELECT * FROM VALUES (1, DATE'2022-01-08'),"
        " (2, CAST(NULL AS DATE)), (3, DATE'1969-12-31')"
        " AS t(id, d)")
    out = str(tmp_path / "dsink")
    (df.write.format("parquet_native").option("path", out)
     .mode("append").save())
    exp = {r["id"]: r["d"] for r in df.collect()}
    got = {r["id"]: r["d"] for r in spark.read.parquet(out).collect()}
    assert got == exp


# ---------------------------------------------------------------------------
# Round 13: the DEPRECATED standalone BIT_PACKED level encoding
# (VERDICT r12 item 6) — MSB-first, no length prefix.
# ---------------------------------------------------------------------------

def test_bit_packed_levels_spec_pins():
    """Byte-exact pins from the spec's wording ('values are packed
    from the most significant bit'): the encoder's bytes and the
    reader's decode agree with hand-computed packings."""
    from modeltracking_spark.operators.parquet_native import (
        bit_packed_levels,
    )
    from modeltracking_spark.operators.parquet_write import (
        bit_packed_encode_levels,
    )

    # bw=1: [1,0,0,0,0,0,1,1] -> 0b10000011
    assert bit_packed_encode_levels([1, 0, 0, 0, 0, 0, 1, 1], 1) \
        == bytes([0b10000011])
    # bw=2, the spec's own example range 0..3
    assert bit_packed_encode_levels([0, 1, 2, 3], 2) \
        == bytes([0b00011011])
    # bw=3 crossing byte boundaries: 1,2,3,4,5 -> 001 010 011 100 101
    # = 00101001 1100101(pad 0) — 15 bits in two bytes
    assert bit_packed_encode_levels([1, 2, 3, 4, 5], 3) \
        == bytes([0b00101001, 0b11001010])
    for bw in (1, 2, 3, 7):
        vals = [i % (1 << bw) for i in range(23)]
        enc = bit_packed_encode_levels(vals, bw)
        dec, pos = bit_packed_levels(enc, 0, bw, len(vals))
        assert dec == vals and pos == len(enc)
    with pytest.raises(ValueError, match="truncated BIT_PACKED"):
        bit_packed_levels(b"\x00", 0, 3, 23)


def test_bit_packed_levels_parquet_mr_replays(spark, tmp_path):
    """parquet-mr ITSELF (Spark's non-vectorized reader — the
    implementation that historically wrote BIT_PACKED v1 pages)
    reads the engine's legacy-level files exactly: flat nullable
    (def levels), lists incl. null/empty (rep+def levels), and a
    struct column; the own reader agrees.  parquet-cpp/pyarrow is
    deliberately NOT exercised: it decodes this deprecated encoding
    LSB-first (against the spec's MSB-first wording) and aborts on
    teardown."""
    rng = random.Random(1313)
    n = 700
    cols = {
        "k": list(range(n)),
        "s": [None if rng.random() < 0.3 else "v%d" % rng.randrange(9)
              for _ in range(n)],
        "xs": [None if rng.random() < 0.2 else
               [rng.randrange(50) for _ in range(rng.randrange(4))]
               for _ in range(n)],
        "st": [None if rng.random() < 0.25 else
               {"a": rng.randrange(100),
                "b": None if rng.random() < 0.3 else "x"}
               for _ in range(n)],
    }
    schema = [("k", "int64", False), ("s", "string", True),
              ("xs", "list<int64?>", True),
              ("st", "struct<a:int64,b:string?>", True)]
    for codec in ("UNCOMPRESSED", "SNAPPY"):
        blob = parquet_write_table(cols, schema, codec=codec,
                                   page_rows=128,
                                   level_encoding="bit_packed")
        p = tmp_path / f"bp_{codec}"
        p.mkdir(exist_ok=True)
        (p / "f.parquet").write_bytes(blob)
        old = spark.conf.get(
            "spark.sql.parquet.enableVectorizedReader")
        spark.conf.set("spark.sql.parquet.enableVectorizedReader",
                       "false")
        try:
            back = {r["k"]: r for r in
                    spark.read.parquet(str(p)).collect()}
        finally:
            spark.conf.set(
                "spark.sql.parquet.enableVectorizedReader", old)
        assert len(back) == n
        for i in range(n):
            r = back[i]
            assert r["s"] == cols["s"][i], (codec, i)
            assert r["xs"] == cols["xs"][i], (codec, i)
            st = cols["st"][i]
            assert (r["st"] is None) == (st is None)
            if st is not None:
                assert r["st"]["a"] == st["a"] and \
                    r["st"]["b"] == st["b"]
        # own reader closes the loop
        fh = io.BytesIO(blob)
        foot = parquet_footer_from_file(fh)
        got = {}
        for g in range(len(foot["row_groups"])):
            rg = read_row_group(io.BytesIO(blob), foot, g)
            for kk, vv in rg.items():
                got.setdefault(kk, []).extend(vv)
        assert got["s"] == cols["s"] and got["xs"] == cols["xs"]


def test_bit_packed_corruption_fuzz():
    """The new level branch under byte mutation: decode or the typed
    reject, never a leaked internal error."""
    rng = random.Random(713)
    n = 120
    cols = {
        "s": [None if rng.random() < 0.3 else "w%d" % rng.randrange(9)
              for _ in range(n)],
        "xs": [None if rng.random() < 0.2 else
               [rng.randrange(50) for _ in range(rng.randrange(4))]
               for _ in range(n)],
    }
    schema = [("s", "string", True), ("xs", "list<int64?>", True)]
    base = parquet_write_table(cols, schema, codec="UNCOMPRESSED",
                               page_rows=32,
                               level_encoding="bit_packed")
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
                               for _ in range(rng.randrange(1, 8)))
                 + b[i:])
        try:
            fh = io.BytesIO(bytes(b))
            foot = parquet_footer_from_file(fh)
            for g in range(len(foot["row_groups"])):
                read_row_group(io.BytesIO(bytes(b)), foot, g)
        except (ValueError, NotImplementedError):
            pass


def test_bit_packed_option_rejects():
    with pytest.raises(NotImplementedError, match="level_encoding"):
        parquet_write_table({"a": [1]}, [("a", "int64", False)],
                            level_encoding="hybrid")
    with pytest.raises(ValueError, match="v1-page"):
        parquet_write_table({"a": [1]}, [("a", "int64", False)],
                            page_version=2,
                            level_encoding="bit_packed")
