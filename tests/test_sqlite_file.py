"""From-spec SQLite reader (round-15 continuation,
operators/sqlite_file.py): every fixture is written by stdlib
``sqlite3`` — the reference implementation — and decoded rows
cross-validate against live SELECTs; plus B-tree/overflow/record
edge shapes, catalog DDL parsing, typed rejects and corruption
fuzz."""

import os
import random
import sqlite3

import pytest

from modeltracking_spark.operators.sqlite_file import (
    SqliteFile,
    _parse_columns,
    sqlite_table_scan,
)


def _mkdb(path, page_size=512, journal="DELETE"):
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA journal_mode={journal}")
    con.execute(f"PRAGMA page_size={page_size}")
    return con


@pytest.mark.parametrize("page_size", [512, 4096, 65536])
def test_roundtrip_vs_sqlite3(tmp_path, page_size):
    """Multi-level trees, overflow chains, the IPK rowid alias,
    int-width ladder, floats, blobs, NULLs — decoded rows equal the
    reference's own SELECT at every page size (65536 exercises the
    psz==1 header encoding)."""
    p = str(tmp_path / "t.db")
    con = _mkdb(p, page_size)
    con.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, "
                "name TEXT, score REAL, raw BLOB, note TEXT)")
    rng = random.Random(7)
    rows = []
    for i in range(2500):
        rows.append((
            i * 7 - 5000,
            "n%d-" % i + "y" * (i % 23),
            None if i % 13 == 0 else (i - 1200) * 0.125,
            None if i % 5 == 0
            else bytes(rng.randrange(256) for _ in range(i % 40)),
            "Z" * 2500 if i % 83 == 0 else "s%d" % i,
        ))
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", rows)
    con.execute("CREATE TABLE widths (v INT)")
    con.executemany("INSERT INTO widths VALUES (?)", [
        (0,), (1,), (-1,), (127,), (-128,), (32767,), (8388607,),
        (2147483647,), (140737488355327,), (2 ** 63 - 1,),
        (-2 ** 63,)])
    con.commit()
    want = con.execute("SELECT * FROM docs ORDER BY id").fetchall()
    wantw = sorted(r[0] for r in
                   con.execute("SELECT v FROM widths").fetchall())
    con.close()
    got = sorted(sqlite_table_scan(open(p, "rb"), "docs"),
                 key=lambda r: r["id"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["id"], g["name"], g["score"], g["raw"],
                g["note"]) == w
    gotw = sorted(r["v"] for r in
                  sqlite_table_scan(open(p, "rb"), "widths"))
    assert gotw == wantw


def test_subtree_partitions_cover_exactly(tmp_path):
    p = str(tmp_path / "t.db")
    con = _mkdb(p)
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(i, "v" * (i % 50)) for i in range(4000)])
    con.commit()
    con.close()
    db = SqliteFile(open(p, "rb"))
    root = db.table_root("t")
    kids = db.table_root_children(root)
    assert len(kids) > 1  # a real interior root at this size
    seen = []
    for k in kids:
        seen.extend(r for r, _ in db.table_rows(k))
    assert sorted(seen) == list(range(4000))


def test_short_records_pad_after_add_column(tmp_path):
    """ALTER TABLE ADD COLUMN leaves pre-existing rows short on
    disk (spec behavior) — they read back as NULL."""
    p = str(tmp_path / "t.db")
    con = _mkdb(p)
    con.execute("CREATE TABLE t (a INT)")
    con.execute("INSERT INTO t VALUES (10)")
    con.execute("ALTER TABLE t ADD COLUMN extra TEXT")
    con.execute("INSERT INTO t VALUES (20, 'new')")
    con.commit()
    con.close()
    got = sorted(sqlite_table_scan(open(p, "rb"), "t"),
                 key=lambda r: r["a"])
    assert got == [{"a": 10, "extra": None}, {"a": 20,
                                              "extra": "new"}]


def test_ddl_parse_quoted_and_constraints():
    cols = _parse_columns(
        'CREATE TABLE "we ird" ("col 1" TEXT, [col,2] INT, '
        "`c3` REAL DEFAULT (1+2), plain BLOB NOT NULL, "
        "PRIMARY KEY (plain), UNIQUE(\"col 1\"), "
        "CHECK (plain > ''))")
    assert cols == ["col 1", "col,2", "c3", "plain"]


def test_typed_rejects(tmp_path):
    p = str(tmp_path / "t.db")
    con = _mkdb(p)
    con.execute("CREATE TABLE norm (a INT)")
    con.execute("CREATE TABLE worid (a INT PRIMARY KEY, b TEXT) "
                "WITHOUT ROWID")
    con.execute("INSERT INTO norm VALUES (1)")
    con.execute("INSERT INTO worid VALUES (1, 'x')")
    con.commit()
    con.close()
    with pytest.raises(NotImplementedError, match="WITHOUT ROWID"):
        list(sqlite_table_scan(open(p, "rb"), "worid"))
    with pytest.raises(ValueError, match="not found"):
        list(sqlite_table_scan(open(p, "rb"), "nope"))
    # WAL-mode file rejects loudly
    pw = str(tmp_path / "w.db")
    con = sqlite3.connect(pw)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("CREATE TABLE t (a INT)")
    con.execute("INSERT INTO t VALUES (1)")
    con.commit()
    con.close()
    with pytest.raises(NotImplementedError, match="WAL"):
        SqliteFile(open(pw, "rb"))
    with pytest.raises(ValueError, match="magic"):
        SqliteFile(b"PK\x03\x04 not sqlite" + bytes(100))


def test_corruption_fuzz(tmp_path):
    """400 byte-level mutations: decode or a typed
    ValueError/NotImplementedError — never an internal error."""
    p = str(tmp_path / "t.db")
    con = _mkdb(p)
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT, "
                "c BLOB)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)",
        [(i, "x" * (i % 700), b"b" * (i % 90)) for i in range(400)])
    con.commit()
    con.close()
    base = open(p, "rb").read()
    rng = random.Random(4242)
    for _ in range(400):
        b = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = (b[:i] + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 16)))
                 + b[i:])
        try:
            for _ in sqlite_table_scan(bytes(b), "t"):
                pass
        except (ValueError, NotImplementedError):
            pass


def test_wal_overlay_reads_last_commit(tmp_path):
    """A mid-session WAL database (db + -wal copied while the
    connection holds them) reads at its LAST COMMIT point: inserts
    and updates living only in wal frames are visible, the
    cumulative checksum chain is verified, and a torn tail rolls
    back to the previous commit exactly as SQLite would."""
    import shutil

    p = str(tmp_path / "w.db")
    con = sqlite3.connect(p)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(i, "v%d" % i * (i % 20)) for i in range(1500)])
    con.commit()
    wal1 = open(p + "-wal", "rb").read()
    con.execute("UPDATE t SET b='updated' WHERE a % 100 = 0")
    con.commit()
    wal2 = open(p + "-wal", "rb").read()
    db_copy = str(tmp_path / "copy.db")
    shutil.copy(p, db_copy)
    want = dict(con.execute("SELECT a, b FROM t").fetchall())
    con.close()

    got = {r["a"]: r["b"] for r in
           sqlite_table_scan(open(db_copy, "rb"), "t", wal=wal2)}
    assert got == want
    assert got[100] == "updated"
    # torn tail: truncating wal2 back to wal1's frames reads the
    # FIRST commit's state (checksum chain breaks at the cut)
    got1 = {r["a"]: r["b"] for r in
            sqlite_table_scan(open(db_copy, "rb"), "t",
                              wal=wal2[:len(wal1) + 40])}
    assert got1[100] == "v100" * 0 or got1[100] != "updated"
    assert len(got1) == 1500
    # version-2 header with no sidecar info still rejects loudly
    with pytest.raises(NotImplementedError, match="WAL"):
        SqliteFile(open(db_copy, "rb"))
    # wal header corruption rejects loudly
    with pytest.raises(ValueError, match="wal"):
        bad = bytearray(wal2)
        bad[0] ^= 0xFF
        SqliteFile(open(db_copy, "rb"), wal=bytes(bad))


def test_ipk_alias_exact_forms(tmp_path):
    """SQLite aliases the rowid only for type exactly INTEGER with a
    column-level PRIMARY KEY [ASC] — the DESC form and multi-token
    types keep their own stored values (verified against sqlite3's
    own replay, the module's adversarial twin)."""
    from modeltracking_spark.operators.sqlite_file import _ipk_index

    assert _ipk_index("CREATE TABLE t (a INTEGER PRIMARY KEY)") == 0
    assert _ipk_index(
        "CREATE TABLE t (x TEXT, a INTEGER PRIMARY KEY ASC)") == 1
    assert _ipk_index(
        "CREATE TABLE t (a INTEGER PRIMARY KEY AUTOINCREMENT)") == 0
    assert _ipk_index('CREATE TABLE t ("a b" INTEGER PRIMARY KEY)') == 0
    # NOT rowid aliases in SQLite:
    assert _ipk_index("CREATE TABLE t (a INTEGER PRIMARY KEY DESC)") == -1
    assert _ipk_index(
        "CREATE TABLE t (a UNSIGNED INTEGER PRIMARY KEY)") == -1
    assert _ipk_index("CREATE TABLE t (a INT PRIMARY KEY)") == -1

    # behavioral twin: a DESC PK column keeps its stored values — the
    # reader must not replace them with rowids
    p = str(tmp_path / "desc.db")
    con = _mkdb(p)
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY DESC, b TEXT)")
    con.executemany("INSERT INTO t (a, b) VALUES (?, ?)",
                    [(1000 + i, f"v{i}") for i in range(50)])
    con.commit()
    expect = sorted(con.execute("SELECT a, b FROM t").fetchall())
    con.close()
    got = sorted((r["a"], r["b"])
                 for r in sqlite_table_scan(open(p, "rb"), "t"))
    assert got == expect
    assert got[0][0] == 1000  # stored value, not rowid 1
