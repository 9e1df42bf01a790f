"""sqlite_file Spark DataSource (round-15 continuation,
sources/sqlite_source.py): catalog-planned subtree partitions over
stdlib-sqlite3-written shards, affinity-mapped schema, projection,
rowid-alias resolution, drift/affinity rejects."""

import os
import sqlite3

import pytest

from modeltracking_spark.sources.sqlite_source import (
    SqliteDataSource,
    _affinity,
)


@pytest.fixture(scope="module")
def registered(spark):
    from pyspark.errors import PySparkException

    try:
        spark.dataSource.register(SqliteDataSource)
    except PySparkException:
        pass
    return spark


def _shard(path, s, n=1500):
    con = sqlite3.connect(path)
    con.execute("PRAGMA journal_mode=DELETE")
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, "
                "name TEXT, score REAL, raw BLOB)")
    con.executemany(
        "INSERT INTO docs VALUES (?,?,?,?)",
        [(s * 100000 + i, f"n{s}-{i}",
          None if i % 9 == 0 else i * 0.5,
          b"\x07" * (i % 11)) for i in range(n)])
    con.commit()
    con.close()


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sq_shards")
    for s in range(3):
        _shard(str(d / f"s{s}.db"), s)
    return str(d)


def test_schema_and_full_scan(registered, shard_dir):
    df = (registered.read.format("sqlite_file")
          .option("path", shard_dir).option("table", "docs").load())
    assert dict(df.dtypes) == {"id": "bigint", "name": "string",
                               "score": "double", "raw": "binary"}
    assert df.rdd.getNumPartitions() > 3  # subtrees x shards
    rows = df.orderBy("id").collect()
    assert len(rows) == 4500
    r = rows[1500]  # first row of shard 1
    assert (r.id, r.name, r.score, r.raw) == (100000, "n1-0", None,
                                              b"")
    r = rows[1503]
    assert (r.id, r.score, r.raw) == (100003, 1.5, b"\x07" * 3)


def test_projection_and_rowid_alias(registered, shard_dir):
    from pyspark.sql import functions as F

    df = (registered.read.format("sqlite_file")
          .option("path", shard_dir).option("table", "docs")
          .option("columns", "name,id").load())
    assert [c[0] for c in df.dtypes] == ["name", "id"]
    # the id column is the IPK alias: NULL on disk, rowid on read
    row = df.agg(F.sum("id").alias("s")).collect()[0]
    assert row.s == sum(s * 100000 + i
                        for s in range(3) for i in range(1500))
    with pytest.raises(Exception, match="not in table"):
        (registered.read.format("sqlite_file")
         .option("path", shard_dir).option("table", "docs")
         .option("columns", "nope").load())


def test_schema_drift_rejects(registered, tmp_path):
    d = tmp_path / "drift"
    d.mkdir()
    _shard(str(d / "a.db"), 0, n=10)
    con = sqlite3.connect(str(d / "b.db"))
    con.execute("CREATE TABLE docs (other INT)")
    con.execute("INSERT INTO docs VALUES (1)")
    con.commit()
    con.close()
    df = (registered.read.format("sqlite_file")
          .option("path", str(d)).option("table", "docs").load())
    with pytest.raises(Exception, match="schema drift"):
        df.collect()


def test_affinity_violation_rejects(registered, tmp_path):
    p = str(tmp_path / "dyn.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (a INT, b TEXT)")
    # SQLite stores the TEXT verbatim in the INT column (dynamic
    # typing); the source rejects rather than guessing a coercion
    con.execute("INSERT INTO t VALUES ('not-an-int', 'x')")
    con.commit()
    con.close()
    df = (registered.read.format("sqlite_file")
          .option("path", p).option("table", "t").load())
    with pytest.raises(Exception, match="INTEGER-affinity"):
        df.collect()


def test_empty_table_and_missing_path(registered, tmp_path):
    p = str(tmp_path / "e.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (a INT, b TEXT)")
    con.commit()
    con.close()
    df = (registered.read.format("sqlite_file")
          .option("path", p).option("table", "t").load())
    assert df.count() == 0
    assert dict(df.dtypes) == {"a": "bigint", "b": "string"}
    with pytest.raises(Exception, match="no database files"):
        (registered.read.format("sqlite_file")
         .option("path", str(tmp_path / "missing"))
         .option("table", "t").load())


def test_affinity_rules():
    assert _affinity("INTEGER") == "bigint"
    assert _affinity("int") == "bigint"
    assert _affinity("BIGINT UNSIGNED") == "bigint"
    assert _affinity("VARCHAR(80)") == "string"
    assert _affinity("CLOB") == "string"
    assert _affinity("BLOB") == "binary"
    assert _affinity("") == "binary"
    assert _affinity("DOUBLE PRECISION") == "double"
    assert _affinity("DECIMAL(10,2)") == "double"


def test_wal_sidecar_auto_applied(registered, tmp_path):
    """A (db, -wal) pair — the mid-session shape browsers/telemetry
    leave behind — scans at the last commit point through the
    source; the sidecar is picked up automatically."""
    import shutil

    src = str(tmp_path / "live.db")
    con = sqlite3.connect(src)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, "
                "name TEXT, score REAL, raw BLOB)")
    con.executemany("INSERT INTO docs VALUES (?,?,?,?)",
                    [(i, "w%d" % i, i * 1.5, b"") for i in range(800)])
    con.commit()
    con.execute("UPDATE docs SET name='patched' WHERE id % 50 = 0")
    con.commit()
    d = tmp_path / "walshard"
    d.mkdir()
    shutil.copy(src, str(d / "s.db"))
    shutil.copy(src + "-wal", str(d / "s.db-wal"))
    con.close()
    df = (registered.read.format("sqlite_file")
          .option("path", str(d)).option("table", "docs").load())
    rows = df.orderBy("id").collect()
    assert len(rows) == 800
    assert rows[0].name == "patched" and rows[1].name == "w1"
    assert rows[50].name == "patched"


def test_numeric_bigint_precision_rejects(registered, tmp_path):
    """NUMERIC-affinity columns surface as double; SQLite itself keeps
    integer cells exact (including beyond 2^53), so a cell float()
    would silently round is a loud typed reject, not a lossy read."""
    p = str(tmp_path / "num.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (a NUMERIC)")
    con.execute("INSERT INTO t VALUES (?)", ((1 << 53) + 1,))
    con.commit()
    con.close()
    df = (registered.read.format("sqlite_file")
          .option("path", p).option("table", "t").load())
    with pytest.raises(Exception, match="losslessly"):
        df.collect()
    # safe ints (exactly representable) still surface, as doubles
    p2 = str(tmp_path / "num_ok.db")
    con = sqlite3.connect(p2)
    con.execute("CREATE TABLE t (a NUMERIC)")
    con.executemany("INSERT INTO t VALUES (?)",
                    [(7,), (1 << 53,), (-5,)])
    con.commit()
    con.close()
    df = (registered.read.format("sqlite_file")
          .option("path", p2).option("table", "t").load())
    vals = sorted(r.a for r in df.collect())
    assert vals == [-5.0, 7.0, float(1 << 53)]


def test_affinity_drift_rejects(registered, tmp_path):
    """Shards agreeing on column NAMES but not type affinities are
    planning-time drift: same-name columns with different kinds would
    otherwise produce conflicting executor-side Arrow batches."""
    d = tmp_path / "adrift"
    d.mkdir()
    for fname, decl in (("a.db", "TEXT"), ("b.db", "REAL")):
        con = sqlite3.connect(str(d / fname))
        con.execute(f"CREATE TABLE docs (id INTEGER PRIMARY KEY, "
                    f"name {decl})")
        con.execute("INSERT INTO docs VALUES (1, NULL)")
        con.commit()
        con.close()
    df = (registered.read.format("sqlite_file")
          .option("path", str(d)).option("table", "docs").load())
    with pytest.raises(Exception, match="schema drift"):
        df.collect()
