"""Arrow IPC FILE DataSource (round-15 continuation,
sources/arrow_ipc_source.py): footer-only planning over pyarrow- AND
engine-written shards, batch-grain partitions + grouping, decode-side
column projection (unprojected buffers never decompressed), the full
type surface incl. dictionary/view/REE/union columns, schema-drift
and empty-dir rejects, and the batch-less sentinel partition."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.ipc as paipc
import pytest

from modeltracking_spark.sources.arrow_ipc_source import (
    ArrowIpcDataSource,
    _spark_type,
)


@pytest.fixture(scope="module")
def registered(spark):
    from pyspark.errors import PySparkException

    try:
        spark.dataSource.register(ArrowIpcDataSource)
    except PySparkException:
        pass
    return spark


def _write(path, table, chunk=50, comp="zstd"):
    opts = paipc.IpcWriteOptions(compression=comp) if comp else None
    with paipc.new_file(path, table.schema, options=opts) as w:
        w.write_table(table, max_chunksize=chunk)


def _mk_table(lo, n):
    ids = list(range(lo, lo + n))
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "lang": pa.array([f"l{i % 5}" for i in ids]
                         ).dictionary_encode(),
        "sv": pa.array([("doc-%d" % i) * (i % 4) for i in ids],
                       pa.string_view()),
        "emb": pa.array([[float(i), i * 0.5] for i in ids],
                        pa.list_(pa.float32())),
        "ree": pc.run_end_encode(pa.array([i // 40 for i in ids],
                                          pa.int64())),
    })


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("arrow_src")
    for k in range(3):
        _write(str(d / f"p{k}.arrow"), _mk_table(k * 1000, 180))
    return str(d)


def test_schema_inference_and_full_scan(registered, fixture_dir):
    df = (registered.read.format("arrow_ipc")
          .option("path", fixture_dir).load())
    assert dict(df.dtypes) == {
        "id": "bigint", "lang": "string", "sv": "string",
        "emb": "array<float>", "ree": "bigint"}
    rows = df.orderBy("id").collect()
    assert len(rows) == 540
    r = rows[181]  # id 1001
    assert r.id == 1001 and r.lang == "l1"
    assert r.sv == "doc-1001" and r.emb == [1001.0, 500.5]
    assert r.ree == 1001 // 40


def test_batch_grain_partitions_and_grouping(registered, fixture_dir):
    df = (registered.read.format("arrow_ipc")
          .option("path", fixture_dir).load())
    # 180 rows / 50-row chunks = 4 batches per file, 3 files
    assert df.rdd.getNumPartitions() == 12
    grouped = (registered.read.format("arrow_ipc")
               .option("path", fixture_dir)
               .option("target_partition_bytes", str(1 << 20)).load())
    assert grouped.rdd.getNumPartitions() == 3  # one per file
    assert grouped.count() == 540


def test_column_projection(registered, fixture_dir):
    from pyspark.sql import functions as F

    df = (registered.read.format("arrow_ipc")
          .option("path", fixture_dir)
          .option("columns", "id,ree").load())
    assert [f[0] for f in df.dtypes] == ["id", "ree"]
    row = df.agg(F.sum("id").alias("s"),
                 F.sum("ree").alias("r")).collect()[0]
    ids = [k * 1000 + i for k in range(3) for i in range(180)]
    assert row.s == sum(ids)
    assert row.r == sum(i // 40 for i in ids)
    with pytest.raises(Exception, match="not in the file schema"):
        (registered.read.format("arrow_ipc")
         .option("path", fixture_dir)
         .option("columns", "id,nope").load())


def test_engine_written_file_scans(registered, tmp_path):
    """The engine's OWN ipc_write file (views + REE + lz4) plans and
    scans through the same source — write and scan close the loop
    without pyarrow in either direction."""
    from modeltracking_spark.operators.arrow_ipc import ipc_write

    fields = [
        {"name": "k", "type": "Int", "bits": 64, "signed": True},
        {"name": "v", "type": "Utf8View"},
        {"name": "r", "type": "RunEndEncoded", "nullable": False,
         "children": [
             {"name": "run_ends", "type": "Int", "bits": 32,
              "signed": True, "nullable": False},
             {"name": "values", "type": "Utf8"}]},
    ]
    cols = {"k": list(range(120)),
            "v": [None if i % 9 == 0 else "val-%d" % i * (i % 3)
                  for i in range(120)],
            "r": ["a" if i < 60 else "b" for i in range(120)]}
    p = str(tmp_path / "engine.arrow")
    with open(p, "wb") as fh:
        fh.write(ipc_write(fields, cols, fmt="file",
                           compression="lz4", max_chunksize=40))
    df = (registered.read.format("arrow_ipc")
          .option("path", p).load())
    rows = df.orderBy("k").collect()
    assert [r.k for r in rows] == cols["k"]
    assert [r.v for r in rows] == cols["v"]
    assert [r.r for r in rows] == cols["r"]
    assert df.rdd.getNumPartitions() == 3


def test_union_surfaces_as_tagged_struct(registered, tmp_path):
    ua = pa.UnionArray.from_dense(
        pa.array([0, 1, 0, 1], pa.int8()),
        pa.array([0, 0, 1, 1], pa.int32()),
        [pa.array([7, 9], pa.int64()), pa.array(["x", "y"])])
    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()), "u": ua})
    p = str(tmp_path / "u.arrow")
    _write(p, t, chunk=4, comp=None)
    df = (registered.read.format("arrow_ipc")
          .option("path", p).load())
    assert dict(df.dtypes)["u"] == \
        "struct<tag:tinyint,field0:bigint,field1:string>"
    rows = df.orderBy("id").collect()
    assert [(r.u.tag, r.u.field0, r.u.field1) for r in rows] == [
        (0, 7, None), (1, None, "x"), (0, 9, None), (1, None, "y")]


def test_schema_drift_and_reject_paths(registered, tmp_path):
    d = tmp_path / "drift"
    d.mkdir()
    _write(str(d / "a.arrow"),
           pa.table({"x": pa.array([1], pa.int64())}), comp=None)
    _write(str(d / "b.arrow"),
           pa.table({"x": pa.array(["s"])}), comp=None)
    df = (registered.read.format("arrow_ipc")
          .option("path", str(d)).load())
    with pytest.raises(Exception, match="schema drift"):
        df.collect()
    with pytest.raises(Exception, match="no .arrow files"):
        (registered.read.format("arrow_ipc")
         .option("path", str(tmp_path / "empty_missing")).load())


def test_batchless_file_sentinel(registered, tmp_path):
    t = pa.table({"x": pa.array([], pa.int64())})
    p = str(tmp_path / "empty.arrow")
    with paipc.new_file(p, t.schema) as w:
        w.write_table(t)
    df = (registered.read.format("arrow_ipc")
          .option("path", p).load())
    assert df.count() == 0
    assert dict(df.dtypes) == {"x": "bigint"}


def test_type_mapping_rejects_are_loud():
    with pytest.raises(NotImplementedError, match="uint64"):
        _spark_type({"type": "Int", "bits": 64, "signed": False})
    with pytest.raises(NotImplementedError, match="decimal256"):
        _spark_type({"type": "Decimal", "bits": 256, "precision": 50,
                     "scale": 2})
    with pytest.raises(NotImplementedError, match="union nested"):
        _spark_type({"type": "List", "children": [
            {"type": "Union", "name": "u", "children": [
                {"name": "i", "type": "Int", "bits": 32,
                 "signed": True}]}]})
    # unsigned widening: u32 -> bigint (lossless)
    assert _spark_type({"type": "Int", "bits": 32,
                        "signed": False}) == "bigint"
