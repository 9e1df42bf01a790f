"""Spark Python DataSource over the from-spec SQLite reader —
``spark.read.format("sqlite_file").option("path", file_or_dir)
.option("table", name)`` (round-15 continuation; the
parquet_native/orc_native/arrow_ipc design at SQLite's own parallel
grain).

- **Catalog-only planning**: the driver walks ``sqlite_schema`` and
  the table root's first level — header + a handful of pages; row
  payloads are never touched at planning time.
- **Subtree grain**: one InputPartition per level-1 child of the
  table's B-tree root (plus the root's own leaf case) — the tree's
  fan-out IS the parallel-read unit, so a million-page table scans
  wide without any driver-side row materialization.  Directories of
  ``.db``/``.sqlite``/``.sqlite3`` shards fan out per (file,
  subtree) — the per-app/per-device corpus shape.
- **Schema from the catalog DDL** via SQLite's published type
  affinity rules (INT* -> bigint, CHAR/CLOB/TEXT -> string,
  BLOB/untyped -> binary, REAL/FLOA/DOUB -> double, else NUMERIC ->
  the stored value must be int or float); the INTEGER-PRIMARY-KEY
  rowid alias reads as the rowid (its record slot is NULL on disk).
- **Column projection**: ``.option("columns", "a,b")`` prunes the
  emitted arrow batches (records are decoded whole — the serial-type
  header must be walked regardless; unprojected values simply never
  cross into Spark).

WAL databases read at their last commit point: the source applies a
``-wal`` sidecar's committed frames automatically (cumulative
checksum chain verified; a missing sidecar means SQLite closed
cleanly and deleted it).  Typed rejects ride up from
operators/sqlite_file.py: WITHOUT-ROWID / virtual tables, non-UTF-8
encodings; affinity-
violating stored values (SQLite is dynamically typed — a TEXT value
in an INTEGER column) reject loudly naming the cell rather than
guessing a coercion.

Validation: stdlib sqlite3 writes every fixture and replays every
query (tests/test_sqlite_source.py; the oracle twin in
tools/oracle_twins.py re-SELECTs the fixture through sqlite3
itself).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


def _open_db(path: str):
    """SqliteFile over ``path``, applying the ``-wal`` sidecar when
    one exists (a MISSING sidecar means SQLite closed cleanly and
    deleted it — b'' tells the reader that explicitly)."""
    import os

    from modeltracking_spark.operators.sqlite_file import SqliteFile

    wal = b""
    if os.path.exists(path + "-wal"):
        with open(path + "-wal", "rb") as wf:
            wal = wf.read()
    return SqliteFile(open(path, "rb"), wal=wal)


def _files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".db", ".sqlite", ".sqlite3"))
        )
    return [path] if os.path.isfile(path) else []


def _affinity(decl: str) -> str:
    """SQLite type-affinity rules (spec §3.1), mapped to Spark DDL."""
    up = decl.upper()
    if "INT" in up:
        return "bigint"
    if "CHAR" in up or "CLOB" in up or "TEXT" in up:
        return "string"
    if not up or "BLOB" in up:
        return "binary"
    if "REAL" in up or "FLOA" in up or "DOUB" in up:
        return "double"
    # NUMERIC affinity also surfaces as double; integer cells beyond
    # 2^53 would be silently rounded by float(), so _checked() rejects
    # any int that does not round-trip through the double exactly
    return "double"


def _decl_types(sql: str) -> list[str]:
    from modeltracking_spark.operators.sqlite_file import (
        _colname,
        _column_defs,
    )

    out = []
    for d in _column_defs(sql):
        name = _colname(d)
        rest = d[len(d.split(None, 1)[0]):].strip()
        # the declared type runs until a constraint keyword
        toks = []
        for t in rest.split():
            if t.upper() in ("PRIMARY", "NOT", "UNIQUE", "CHECK",
                             "DEFAULT", "REFERENCES", "COLLATE",
                             "GENERATED", "AS"):
                break
            toks.append(t)
        out.append((name, " ".join(toks)))
    return out


class _SqliteReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        table = options.get("table")
        if not path or not table:
            raise ValueError(
                "sqlite_file source requires .option('path', ...) "
                "and .option('table', ...)")
        self.files = _files(path)
        if not self.files:
            raise ValueError(
                f"sqlite_file source: no database files at {path}")
        self.table = table
        cols = options.get("columns")
        self.columns = ([c.strip() for c in cols.split(",")
                         if c.strip()] if cols else None)

    def partitions(self):
        parts = []
        ref = None
        for f in self.files:
            db = _open_db(f)
            try:
                cols = db.table_columns(self.table)
                # drift check covers AFFINITIES, not just names: a
                # shard redeclaring a column with a different type
                # affinity would otherwise pass planning and build
                # executor-side Arrow batches conflicting with the
                # driver schema derived from files[0]
                sql = next(r["sql"] for r in db.schema()
                           if r["type"] == "table"
                           and r["name"] == self.table)
                shape = [(n, _affinity(t)) for n, t in _decl_types(sql)]
                if ref is None:
                    ref = (f, shape)
                elif shape != ref[1]:
                    raise ValueError(
                        f"sqlite_file: schema drift — {f} declares "
                        f"{shape} for table {self.table!r} but "
                        f"{ref[0]} declares {ref[1]}")
                root = db.table_root(self.table)
                for child in db.table_root_children(root):
                    parts.append(InputPartition((f, [child])))
            finally:
                db.fh.close()
        return parts

    def read(self, partition):
        import pyarrow as pa

        path, pages = partition.value
        db = _open_db(path)
        try:
            cols = db.table_columns(self.table)
            ipk = db.ipk_index(self.table)
            sql = next(r["sql"] for r in db.schema()
                       if r["type"] == "table"
                       and r["name"] == self.table)
            kinds = [_affinity(t) for _, t in _decl_types(sql)]
            names = self.columns or cols
            idx = []
            for n in names:
                if n not in cols:
                    raise ValueError(
                        f"sqlite_file: column {n!r} not in table "
                        f"{self.table!r} ({cols})")
                idx.append(cols.index(n))
            buf: dict = {n: [] for n in names}
            count = 0
            for rowid, rec in db.subtree_rows(pages):
                if len(rec) < len(cols):
                    rec = rec + [None] * (len(cols) - len(rec))
                for n, j in zip(names, idx):
                    v = rowid if j == ipk else rec[j]
                    buf[n].append(_checked(v, kinds[j], n, rowid))
                count += 1
                if count >= 4096:
                    yield _batch(pa, buf, names, kinds, idx)
                    buf = {n: [] for n in names}
                    count = 0
            if count or not pages:
                yield _batch(pa, buf, names, kinds, idx)
        finally:
            db.fh.close()


def _checked(v, kind: str, name: str, rowid: int):
    if v is None:
        return None
    if kind == "bigint":
        if not isinstance(v, int):
            raise ValueError(
                f"sqlite_file: non-integer value {type(v).__name__} "
                f"stored in INTEGER-affinity column {name!r} at "
                f"rowid {rowid} (SQLite is dynamically typed — "
                "re-export with a CAST)")
        return v
    if kind == "double":
        if not isinstance(v, (int, float)):
            raise ValueError(
                f"sqlite_file: non-numeric value stored in numeric "
                f"column {name!r} at rowid {rowid}")
        if isinstance(v, int) and int(float(v)) != v:
            # SQLite surfaces NUMERIC-affinity ints exactly; a double
            # column cannot (|v| > 2^53 rounds). Loud reject, never a
            # silent precision loss.
            raise ValueError(
                f"sqlite_file: integer {v} in NUMERIC-affinity column "
                f"{name!r} at rowid {rowid} does not fit a double "
                "losslessly — re-export the column as INTEGER (bigint) "
                "or CAST to REAL in sqlite")
        return float(v)
    if kind == "string":
        if not isinstance(v, str):
            raise ValueError(
                f"sqlite_file: non-text value stored in TEXT "
                f"column {name!r} at rowid {rowid}")
        return v
    if isinstance(v, str):  # binary affinity holds anything; text
        return v.encode("utf-8")  # surfaces as its utf-8 bytes
    if isinstance(v, int):
        raise ValueError(
            f"sqlite_file: integer stored in BLOB column {name!r} "
            f"at rowid {rowid}")
    return v


_PA = {"bigint": "int64", "double": "float64", "string": "string",
       "binary": "binary"}


def _batch(pa, buf, names, kinds, idx):
    arrays = [pa.array(buf[n], getattr(pa, _PA[kinds[j]])())
              for n, j in zip(names, idx)]
    return pa.RecordBatch.from_arrays(arrays, names=list(names))


class SqliteDataSource(DataSource):
    """``spark.read.format("sqlite_file")`` after
    ``spark.dataSource.register(SqliteDataSource)`` — read-only (a
    write direction would be a full B-tree builder; exports belong
    in sqlite itself)."""

    @classmethod
    def name(cls) -> str:
        return "sqlite_file"

    def schema(self) -> str:
        files = _files(self.options.get("path", ""))
        if not files:
            raise ValueError("sqlite_file: no database files at path")
        table = self.options.get("table")
        if not table:
            raise ValueError(
                "sqlite_file source requires .option('table', ...)")
        db = _open_db(files[0])
        try:
            cols = db.table_columns(table)
            sql = next(r["sql"] for r in db.schema()
                       if r["type"] == "table" and r["name"] == table)
        finally:
            db.fh.close()
        kinds = dict(zip(cols, (_affinity(t)
                                for _, t in _decl_types(sql))))
        sel = self.options.get("columns")
        names = ([c.strip() for c in sel.split(",") if c.strip()]
                 if sel else cols)
        missing = [n for n in names if n not in kinds]
        if missing:
            raise ValueError(
                f"sqlite_file: columns {missing} not in table "
                f"{table!r} ({cols})")
        return ", ".join(f"`{n}` {kinds[n]}" for n in names)

    def reader(self, schema):
        return _SqliteReader(self.options, schema)
