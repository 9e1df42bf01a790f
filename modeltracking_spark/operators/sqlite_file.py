"""From-spec SQLite database-file reader (round-15 continuation) —
the single-file DB format carried by practically every scraped app /
telemetry / browser corpus, implemented from the PUBLIC file-format
document (sqlite.org/fileformat2.html): the 100-byte header, B-tree
page layout (table interior/leaf page types 5/13, cell pointer
arrays), varints, the record serial-type system (NULL / 1..8-byte
big-endian twos-complement ints / float64 / the schema-format-4
constants 0 and 1 / blob / text), payload OVERFLOW chains (the
U/X/M/K spill arithmetic, 4-byte next-page links), the
``sqlite_schema`` catalog walk, and the INTEGER-PRIMARY-KEY rowid
alias (the declared column stores NULL in the record and reads as
the rowid).

Unusual verification luxury (the bzip2/lzma pattern): stdlib
``sqlite3`` IS the reference implementation, so every fixture is
written by SQLite itself and every decoded row cross-validates
against a live ``SELECT`` — adversarial in the only direction that
exists for a read-only module.

Scope: rowid table scans (the storage shape ``CREATE TABLE`` makes
without ``WITHOUT ROWID``), UTF-8 databases, journal_mode DELETE /
TRUNCATE / PERSIST files, and WAL databases via the ``wal=``
sidecar-bytes overlay (round-15 continuation: frames verify the
spec's salt + cumulative s1/s2 checksum chain in the byte order the
wal magic declares, torn tails and pre-reset frames are ignored
exactly as SQLite ignores them, and only frames up to the last
COMMIT frame apply).  Typed loud rejects: a WAL-mode file with NO
sidecar information (pass ``b""`` after a clean close), non-UTF-8
text encodings, WITHOUT-ROWID (index-btree) tables, index/corrupt
page types where a table page is required.  Malformed input raises
``ValueError`` — never an internal IndexError/struct.error (house
corruption-fuzz contract).

Scale posture: ``table_root_children`` exposes the root page's
child subtrees so the Spark source (sources/sqlite_source.py) can
hand each executor ONE subtree — the B-tree's own fan-out becomes
the parallel-read grain, no driver-side row materialization.
"""

from __future__ import annotations

import struct

_MAGIC = b"SQLite format 3\x00"


def _malformed(msg: str) -> ValueError:
    return ValueError(f"malformed sqlite file: {msg}")


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: 1-9 bytes, big-endian 7-bit groups; the 9th
    byte contributes all 8 bits."""
    v = 0
    for k in range(8):
        if pos >= len(buf):
            raise _malformed("varint overruns page")
        b = buf[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    if pos >= len(buf):
        raise _malformed("varint overruns page")
    v = (v << 8) | buf[pos]
    if v >= 1 << 63:  # 9-byte varints carry the full 64 bits;
        v -= 1 << 64  # rowids are SIGNED two's complement
    return v, pos + 1


def _wal_frames(wal: bytes, page_size: int) -> dict:
    """Parse a -wal sidecar (spec §WAL Format): 32-byte header
    (magic's low bit selects the checksum word order), then
    24-byte-header + page-image frames.  Returns {page_number:
    page_bytes} for every frame up to the LAST VALID COMMIT frame —
    salts must match the header and the CUMULATIVE s1/s2 checksum
    chain must verify, so torn tails and stale pre-reset frames are
    ignored exactly as SQLite itself ignores them."""
    if len(wal) < 32:
        return {}
    (magic, version, psz, _ckpt, salt1, salt2, c1, c2) =         struct.unpack(">8I", wal[:32])
    if magic not in (0x377F0682, 0x377F0683):
        raise _malformed(f"wal magic {magic:#x} invalid")
    if version != 3007000:
        raise NotImplementedError(
            f"wal format version {version} not supported")
    if psz != page_size:
        raise _malformed(
            f"wal page size {psz} != database page size {page_size}")
    bo = "<" if magic == 0x377F0682 else ">"

    def ck(s1, s2, data):
        n = len(data) // 8 * 8
        words = struct.unpack(f"{bo}{n // 4}I", data[:n])
        for i in range(0, len(words), 2):
            s1 = (s1 + words[i] + s2) & 0xFFFFFFFF
            s2 = (s2 + words[i + 1] + s1) & 0xFFFFFFFF
        return s1, s2

    s1, s2 = ck(0, 0, wal[:24])
    if (s1, s2) != (c1, c2):
        raise _malformed("wal header checksum mismatch")
    pending: dict = {}
    committed: dict = {}
    pos = 32
    fsz = 24 + page_size
    while pos + fsz <= len(wal):
        (pgno, commit, fs1, fs2, fc1, fc2) = struct.unpack_from(
            ">6I", wal, pos)
        if (fs1, fs2) != (salt1, salt2):
            break  # stale frame from before a wal reset
        s1, s2 = ck(s1, s2, wal[pos:pos + 8])
        s1, s2 = ck(s1, s2, wal[pos + 24:pos + fsz])
        if (s1, s2) != (fc1, fc2):
            break  # torn tail: checksum chain broken
        if pgno < 1:
            raise _malformed("wal frame for page 0")
        pending[pgno] = wal[pos + 24:pos + fsz]
        if commit:  # commit frame: everything so far is durable
            committed.update(pending)
            pending = {}
        pos += fsz
    return committed


class SqliteFile:
    """Random-access reader over one SQLite database file (a file
    object opened 'rb', or bytes).  ``wal`` (round-15 continuation —
    the former WAL reject upgraded to support) takes the ``-wal``
    sidecar's bytes: committed frames overlay the main file's pages,
    so a live/mid-session WAL database reads at its last commit
    point.  A WAL-mode file with ``wal=None`` still rejects (a
    MISSING sidecar after a clean close is fine — pass ``b""``)."""

    def __init__(self, fh, wal: bytes | None = None):
        if isinstance(fh, (bytes, bytearray)):
            import io

            fh = io.BytesIO(bytes(fh))
        self.fh = fh
        head = self._read_at(0, 100)
        if len(head) < 100 or head[:16] != _MAGIC:
            raise _malformed("bad magic header")
        (psz,) = struct.unpack_from(">H", head, 16)
        self.page_size = 65536 if psz == 1 else psz
        if self.page_size < 512 or self.page_size & (
                self.page_size - 1):
            raise _malformed(f"page size {self.page_size} invalid")
        write_version = head[18]
        if write_version == 2 and wal is None:
            raise NotImplementedError(
                "WAL-mode sqlite file: page reads would be stale "
                "without applying the -wal sidecar — pass "
                "wal=<sidecar bytes> (b'' after a clean close, where "
                "SQLite deletes the sidecar), or checkpoint the "
                "database (journal_mode=DELETE) and re-export")
        self.reserved = head[20]
        self.usable = self.page_size - self.reserved
        if self.usable < 480:
            raise _malformed("usable page size below the 480 floor")
        (self.n_pages,) = struct.unpack_from(">I", head, 28)
        (enc,) = struct.unpack_from(">I", head, 56)
        if enc not in (0, 1):  # 0: pre-first-write empty db
            raise NotImplementedError(
                f"sqlite text encoding {enc} not supported "
                "(1 = UTF-8 is)")
        self.overlay = _wal_frames(bytes(wal), self.page_size) \
            if wal else {}
        if self.overlay:
            # page 1 carries the header: re-read size fields from the
            # overlaid copy (a wal commit can grow the database)
            pg1 = self.overlay.get(1)
            if pg1 is not None:
                (self.n_pages,) = struct.unpack_from(">I", pg1, 28)
            self.n_pages = max(self.n_pages, max(self.overlay))

    def _read_at(self, off: int, n: int) -> bytes:
        self.fh.seek(off)
        return self.fh.read(n)

    def page(self, num: int) -> bytes:
        """1-based page fetch, size-checked; committed WAL frames
        overlay the main file."""
        if num < 1 or (self.n_pages and num > self.n_pages):
            raise _malformed(f"page {num} out of range")
        ov = self.overlay.get(num)
        if ov is not None:
            return ov
        p = self._read_at((num - 1) * self.page_size, self.page_size)
        if len(p) != self.page_size:
            raise _malformed(f"page {num} truncated")
        return p

    # -- B-tree -------------------------------------------------------

    def _cells(self, num: int) -> tuple[int, list[int], bytes, int]:
        """-> (page_type, cell_offsets, page_bytes, right_child)."""
        pg = self.page(num)
        base = 100 if num == 1 else 0
        ptype = pg[base]
        if ptype not in (2, 5, 10, 13):
            raise _malformed(f"page {num} has b-tree type {ptype}")
        (ncells,) = struct.unpack_from(">H", pg, base + 3)
        hdr = 12 if ptype in (2, 5) else 8
        right = 0
        if ptype in (2, 5):
            (right,) = struct.unpack_from(">I", pg, base + 8)
        offs = []
        for k in range(ncells):
            p = base + hdr + 2 * k
            if p + 2 > len(pg):
                raise _malformed("cell pointer array overruns page")
            (off,) = struct.unpack_from(">H", pg, p)
            if off < base or off >= self.page_size:
                raise _malformed(f"cell offset {off} out of page")
            offs.append(off)
        return ptype, offs, pg, right

    def _payload(self, pg: bytes, pos: int, total: int) -> bytes:
        """Assemble one cell payload, following the overflow chain
        when the inline portion spills (spec §B-tree Pages: U/X/M/K
        for table leaves)."""
        u = self.usable
        x = u - 35
        if total <= x:
            if pos + total > len(pg):
                raise _malformed("inline payload overruns page")
            return pg[pos:pos + total]
        m = ((u - 12) * 32 // 255) - 23
        k = m + ((total - m) % (u - 4))
        inline = k if k <= x else m
        if pos + inline + 4 > len(pg):
            raise _malformed("spilled payload head overruns page")
        out = bytearray(pg[pos:pos + inline])
        (nxt,) = struct.unpack_from(">I", pg, pos + inline)
        remaining = total - inline
        seen = set()
        while remaining > 0:
            if nxt == 0:
                raise _malformed("overflow chain ends early")
            if nxt in seen:
                raise _malformed("overflow chain loops")
            seen.add(nxt)
            op = self.page(nxt)
            (nxt,) = struct.unpack_from(">I", op, 0)
            take = min(remaining, self.usable - 4)
            out += op[4:4 + take]
            remaining -= take
        return bytes(out)

    def table_rows(self, root: int):
        """Walk one table B-tree (iterative stack — no recursion
        limit exposure): yields (rowid, record_values list)."""
        stack = [root]
        seen = set()
        while stack:
            num = stack.pop()
            if num in seen:
                raise _malformed("b-tree page cycle")
            seen.add(num)
            ptype, offs, pg, right = self._cells(num)
            if ptype in (10, 2):
                raise NotImplementedError(
                    "index b-tree where a table was expected — "
                    "WITHOUT ROWID tables are not supported")
            if ptype == 5:  # interior: children only
                for off in offs:
                    if off + 4 > len(pg):
                        raise _malformed("interior cell overruns")
                    (child,) = struct.unpack_from(">I", pg, off)
                    stack.append(child)
                stack.append(right)
                continue
            for off in offs:  # leaf
                total, p = _varint(pg, off)
                if total < 0:
                    raise _malformed("negative payload length")
                rowid, p = _varint(pg, p)
                payload = self._payload(pg, p, total)
                yield rowid, _decode_record(payload)

    def table_root_children(self, root: int) -> list[int]:
        """Level-1 subtree roots for partitioned scans: the root's
        children when it is interior, else [root] (single-subtree
        table)."""
        ptype, offs, pg, right = self._cells(root)
        if ptype == 13:
            return [root]
        if ptype != 5:
            raise NotImplementedError(
                "index b-tree where a table was expected — "
                "WITHOUT ROWID tables are not supported")
        kids = []
        for off in offs:
            if off + 4 > len(pg):
                raise _malformed("interior cell overruns")
            kids.append(struct.unpack_from(">I", pg, off)[0])
        kids.append(right)
        return kids

    def subtree_rows(self, pages: list[int]):
        """table_rows over an explicit subtree list (the partition
        grain of the Spark source)."""
        for p in pages:
            yield from self.table_rows(p)

    # -- catalog ------------------------------------------------------

    def schema(self) -> list[dict]:
        """sqlite_schema rows: {type, name, tbl_name, rootpage, sql}
        (the catalog b-tree roots at page 1)."""
        out = []
        for _rowid, rec in self.table_rows(1):
            if len(rec) < 5:
                raise _malformed("short sqlite_schema record")
            out.append({"type": rec[0], "name": rec[1],
                        "tbl_name": rec[2],
                        "rootpage": rec[3] or 0, "sql": rec[4]})
        return out

    def table_root(self, table: str) -> int:
        for row in self.schema():
            if row["type"] == "table" and row["name"] == table:
                sql = (row["sql"] or "").upper()
                if "WITHOUT ROWID" in sql.replace("\n", " "):
                    raise NotImplementedError(
                        f"table {table!r} is WITHOUT ROWID (an index "
                        "b-tree) — not supported")
                if "CREATE VIRTUAL" in sql:
                    raise NotImplementedError(
                        f"table {table!r} is a virtual table")
                return row["rootpage"]
        raise ValueError(f"sqlite table {table!r} not found")

    def table_columns(self, table: str) -> list[str]:
        """Column names from the catalog DDL — a minimal CREATE
        TABLE parse (first identifier of each depth-0 comma group;
        table constraints skipped), plus detection of the INTEGER
        PRIMARY KEY rowid-alias column index."""
        for row in self.schema():
            if row["type"] == "table" and row["name"] == table:
                return _parse_columns(row["sql"] or "")
        raise ValueError(f"sqlite table {table!r} not found")

    def ipk_index(self, table: str) -> int:
        """Index of the INTEGER PRIMARY KEY column (rowid alias:
        its record slot stores NULL and reads as the rowid), or -1."""
        for row in self.schema():
            if row["type"] == "table" and row["name"] == table:
                return _ipk_index(row["sql"] or "")
        raise ValueError(f"sqlite table {table!r} not found")


_CONSTRAINT_HEADS = ("PRIMARY", "UNIQUE", "CHECK", "FOREIGN",
                     "CONSTRAINT")


def _column_defs(sql: str) -> list[str]:
    i = sql.find("(")
    j = sql.rfind(")")
    if i < 0 or j <= i:
        raise ValueError(f"unparseable CREATE TABLE sql: {sql[:60]!r}")
    body = sql[i + 1:j]
    defs, depth, cur, quote = [], 0, [], None
    for ch in body:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"`[":
            quote = "]" if ch == "[" else ch
            cur.append(ch)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            defs.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        defs.append("".join(cur).strip())
    import re

    def head(d):
        m = re.match(r"[A-Za-z_]+", d)
        return m.group(0).upper() if m else ""

    return [d for d in defs if head(d) not in _CONSTRAINT_HEADS]


def _colname(d: str) -> str:
    if d[:1] in "'\"`[":  # quoted names may contain spaces/commas
        q = "]" if d[0] == "[" else d[0]
        end = d.find(q, 1)
        if end < 0:
            raise ValueError(f"unterminated quoted column name: "
                             f"{d[:40]!r}")
        return d[1:end]
    return d.split(None, 1)[0]


def _parse_columns(sql: str) -> list[str]:
    return [_colname(d) for d in _column_defs(sql)]


def _ipk_index(sql: str) -> int:
    """Index of the rowid-alias column, or -1.

    SQLite aliases the rowid ONLY for a column whose declared type is
    exactly INTEGER followed by a column-level ``PRIMARY KEY [ASC]``
    (spec §Rowids and the INTEGER PRIMARY KEY): ``INTEGER PRIMARY KEY
    DESC`` and multi-token types like ``UNSIGNED INTEGER PRIMARY KEY``
    are ordinary columns backed by a separate index b-tree, and their
    stored values must NOT be replaced with the rowid.
    """
    for k, d in enumerate(_column_defs(sql)):
        name = _colname(d)
        if d[:1] in "'\"`[":  # quoted name: skip quote+name+quote
            rest = d[len(name) + 2:]
        else:
            parts = d.split(None, 1)
            rest = parts[1] if len(parts) > 1 else ""
        toks = rest.upper().split()
        if toks[:3] == ["INTEGER", "PRIMARY", "KEY"] and \
                (len(toks) < 4 or toks[3] != "DESC"):
            return k
    return -1


def _decode_record(payload: bytes) -> list:
    """SQLite record: header-length varint, serial-type varints,
    then the values (spec §Record Format)."""
    hlen, p = _varint(payload, 0)
    if hlen < 1 or hlen > len(payload):
        raise _malformed(f"record header length {hlen} invalid")
    types = []
    while p < hlen:
        st, p = _varint(payload, p)
        types.append(st)
    if p != hlen:
        raise _malformed("record header overruns its declared length")
    vals = []
    for st in types:
        if st == 0:
            vals.append(None)
        elif 1 <= st <= 6:
            n = (1, 2, 3, 4, 6, 8)[st - 1]
            if p + n > len(payload):
                raise _malformed("int value overruns record")
            vals.append(int.from_bytes(payload[p:p + n], "big",
                                       signed=True))
            p += n
        elif st == 7:
            if p + 8 > len(payload):
                raise _malformed("float value overruns record")
            vals.append(struct.unpack_from(">d", payload, p)[0])
            p += 8
        elif st == 8:
            vals.append(0)
        elif st == 9:
            vals.append(1)
        elif st >= 12:
            n = (st - 12) // 2
            if p + n > len(payload):
                raise _malformed("blob/text value overruns record")
            raw = payload[p:p + n]
            p += n
            if st % 2:  # odd: text
                try:
                    vals.append(raw.decode("utf-8"))
                except UnicodeDecodeError as exc:
                    raise _malformed(f"invalid utf-8 text: {exc}") \
                        from None
            else:
                vals.append(bytes(raw))
        else:
            raise _malformed(f"reserved serial type {st}")
    return vals


def sqlite_table_scan(fh, table: str, wal: bytes | None = None):
    """Convenience full-table scan: yields dict rows with the
    catalog's column names, the INTEGER-PRIMARY-KEY alias resolved
    to the rowid, and short records right-padded with NULLs (ALTER
    TABLE ADD COLUMN leaves old rows short — spec behavior)."""
    db = SqliteFile(fh, wal=wal)
    cols = db.table_columns(table)
    ipk = db.ipk_index(table)
    root = db.table_root(table)
    for rowid, rec in db.table_rows(root):
        if len(rec) < len(cols):
            rec = rec + [None] * (len(cols) - len(rec))
        row = dict(zip(cols, rec))
        if ipk >= 0:
            row[cols[ipk]] = rowid
        yield row
