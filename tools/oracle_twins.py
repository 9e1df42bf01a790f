"""Independent SECOND oracles for the three formula-replay queries the
round-6 verdict flagged (item 5): ``bmp_decode_stats_docs``,
``quality_logreg_docs``, ``pagerank_link_graph_docs``.

The registered DuckDB oracles for these replay the engine's own formula
in SQL — strong evidence of cross-engine determinism, weaker evidence
of semantics (a shared misunderstanding would stay green). This tool
recomputes each query's expected output through a STRUCTURALLY
DIFFERENT path and compares cell-exactly against the Spark result:

- ``pagerank``: DuckDB-native recomputation with the iteration loop in
  Python over MATERIALIZED temp tables (vs the registered oracle's
  single unrolled CTE chain) — different query shape, different
  optimizer path, same integer fixed-point contract.
- ``logreg``: a pure-Python/float replay — features from plain string
  ops (``str.split``), the two GD iterations with ``math.floor``
  integer updates, scoring with ``math.exp`` — no SQL, no Spark, no
  numpy vectorization shared with either engine.
- ``bmp``: a from-scratch naive BMP reader (plain ``struct`` + byte
  loops, no numpy striding shared with the codec) run over the ACTUAL
  payload bytes the fixture builder emits — so the decoder is checked
  against an independent implementation of the public spec, not against
  the pixel formula. (The public-spec golden-bytes fixture lives in
  tests/test_multimodal.py::test_bmp_decodes_public_spec_example.)

Usage: python tools/oracle_twins.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.1)

Exit 0 iff every twin matches exactly at every sf.
"""

from __future__ import annotations

import math
import struct
import sys

sys.path.insert(0, "/root/repo")


# ---------------------------------------------------------------------------
# twin 1: PageRank via materialized-iteration DuckDB loop
# ---------------------------------------------------------------------------

def twin_pagerank(con, spark_rows) -> tuple[bool, str]:
    con.execute("CREATE OR REPLACE TEMP TABLE nn AS "
                "SELECT count(*)::BIGINT AS n FROM documents")
    con.execute("""
        CREATE OR REPLACE TEMP TABLE pr_edges AS
        SELECT d.doc_id AS src,
               CASE WHEN (d.doc_id * 7 + j.i * 13 + 1) % n.n = d.doc_id
                    THEN ((d.doc_id * 7 + j.i * 13 + 1) % n.n + 1) % n.n
                    ELSE (d.doc_id * 7 + j.i * 13 + 1) % n.n END AS dst
        FROM documents d, nn n, range(3) j(i)
        WHERE j.i <= d.doc_id % 3
    """)
    con.execute("""
        CREATE OR REPLACE TEMP TABLE pr_spine AS
        SELECT d.doc_id AS node, coalesce(o.outdeg, 0)::BIGINT AS outdeg
        FROM documents d
        LEFT JOIN (SELECT src AS node, count(*)::BIGINT AS outdeg
                   FROM pr_edges GROUP BY src) o ON o.node = d.doc_id
    """)
    con.execute("""
        CREATE OR REPLACE TEMP TABLE pr_s AS
        SELECT node, outdeg, 1000000000000 // n.n AS score
        FROM pr_spine, nn n
    """)
    for _ in range(3):
        con.execute("""
            CREATE OR REPLACE TEMP TABLE pr_next AS
            SELECT sp.node, sp.outdeg,
                   (15 * 1000000000000) // (100 * n.n)
                   + (85 * coalesce(c.contrib, 0)) // 100 AS score
            FROM pr_spine sp
            LEFT JOIN (SELECT e.dst AS node,
                              sum(s.score // s.outdeg)::BIGINT AS contrib
                       FROM pr_edges e JOIN pr_s s ON s.node = e.src
                       WHERE s.outdeg > 0 GROUP BY e.dst) c
              ON c.node = sp.node, nn n
        """)
        con.execute("CREATE OR REPLACE TEMP TABLE pr_s AS "
                    "SELECT * FROM pr_next")
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute("SELECT node, outdeg, score FROM pr_s").fetchall()
    }
    got = {
        int(r["doc_id"]): (int(r["outdeg"]), int(r["pr_e12"]))
        for r in spark_rows
    }
    if got == want:
        return True, f"{len(got)} nodes exact"
    bad = [k for k in want if got.get(k) != want[k]][:3]
    return False, f"mismatch at nodes {bad}: got {[got.get(k) for k in bad]} want {[want[k] for k in bad]}"


# ---------------------------------------------------------------------------
# twin 2: logreg distillation via pure-Python replay
# ---------------------------------------------------------------------------

_STOPWORDS = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "it"}


def _lr_features(doc_rows):
    """(doc_id, y, x0..x3) per doc from plain string ops — the
    classifier's documented feature definitions, implemented without
    SQL list lambdas or Spark expressions."""
    feats = []
    for doc_id, text in doc_rows:
        toks = [t for t in text.split(" ") if t]
        n = float(len(toks))
        nd = float(len(set(toks)))
        stop = (
            sum(1 for t in toks if t in _STOPWORDS) / max(len(toks), 1)
        )
        distinct_ratio = nd / n if n > 0 else 0.0
        len_score = min(n / 64.0, 1.0)
        quality_e6 = math.floor(
            (distinct_ratio + len_score + (1.0 - abs(stop - 0.2))) / 3.0 * 1e6
            + 0.5
        )
        y = 1 if quality_e6 >= 720000 else 0
        mean_tok = (
            len(text.replace(" ", "")) / max(len(toks), 1)
        ) / 16.0
        feats.append((int(doc_id), y, 1.0, stop, len_score, mean_tok))
    return feats


def twin_logreg(con, spark_rows) -> tuple[bool, str]:
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    feats = _lr_features(docs)
    w = [0, 0, 0, 0]  # e6 integer weights
    n = len(feats)
    for _ in range(2):  # two GD iterations, lr = 4
        g = [0, 0, 0, 0]
        for _, y, *x in feats:
            z = ((w[0] / 1e6) * x[0] + (w[1] / 1e6) * x[1]) + (
                w[2] / 1e6
            ) * x[2] + (w[3] / 1e6) * x[3]
            sig = 1.0 / (1.0 + math.exp(0.0 - z))
            for j in range(4):
                g[j] += math.floor((sig - float(y)) * x[j] * 1e6 + 0.5)
        w = [w[j] - math.floor((4 * g[j]) / (1 * n)) for j in range(4)]
    want = {}
    for doc_id, y, *x in feats:
        z = ((w[0] / 1e6) * x[0] + (w[1] / 1e6) * x[1]) + (w[2] / 1e6) * x[
            2
        ] + (w[3] / 1e6) * x[3]
        sig = 1.0 / (1.0 + math.exp(0.0 - z))
        score = math.floor(sig * 1e6 + 0.5)
        want[doc_id] = (y, score, 1 if score >= 500000 else 0)
    got = {
        int(r["doc_id"]): (int(r["y"]), int(r["score_e6"]), int(r["pred"]))
        for r in spark_rows
    }
    if got == want:
        return True, f"{len(got)} docs exact (weights {w})"
    bad = [k for k in want if got.get(k) != want[k]][:3]
    return False, f"mismatch at docs {bad}: got {[got.get(k) for k in bad]} want {[want[k] for k in bad]}"


# ---------------------------------------------------------------------------
# twin 3: BMP decode via naive byte-walking reader over REAL payloads
# ---------------------------------------------------------------------------

def _naive_bmp(data: bytes):
    """Independent minimal 24-bit BMP reader: plain struct + per-pixel
    loops, no shared code with operators/multimodal.decode_bmp."""
    assert data[0:2] == b"BM"
    off = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    assert bpp == 24 and h > 0
    row = (w * 3 + 3) // 4 * 4
    total = 0
    for y in range(h):  # file rows, bottom-up — order irrelevant to a sum
        base = off + y * row
        for x in range(w):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            total += int(b) + int(g) + int(r)
    return w, h, 3, total


def twin_bmp(spark, sf_dir, spark_rows) -> tuple[bool, str]:
    from modeltracking_spark.operators.multimodal import attach_bmp_payload
    from modeltracking_spark.queries.common import T

    payloads = {
        int(r["doc_id"]): bytes(r["payload"])
        for r in attach_bmp_payload(T(spark, sf_dir, "documents")).collect()
    }
    got = {
        int(r["doc_id"]): (
            int(r["width"]), int(r["height"]), int(r["n_channels"]),
            int(r["pixel_sum"]), int(r["n_bytes"]),
        )
        for r in spark_rows
    }
    for doc_id, data in payloads.items():
        w, h, c, total = _naive_bmp(data)
        want = (w, h, c, total, len(data))
        if got.get(doc_id) != want:
            return False, f"doc {doc_id}: got {got.get(doc_id)} want {want}"
    return True, f"{len(payloads)} payloads byte-walked exact"


def main(sf_dirs: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from tools.check_queries import TABLES

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qs = entrymod.queries()
    rc = 0
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name, fn in (
            ("pagerank_link_graph_docs",
             lambda rows: twin_pagerank(con, rows)),
            ("quality_logreg_docs", lambda rows: twin_logreg(con, rows)),
            ("bmp_decode_stats_docs",
             lambda rows: twin_bmp(spark, sf_dir, rows)),
        ):
            rows = qs[name](spark, sf_dir).collect()
            ok, msg = fn(rows)
            print(f"{'PASS' if ok else 'FAIL'}  {name} @ {sf_dir}: {msg}")
            if not ok:
                rc = 1
    return rc


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    raise SystemExit(main(dirs))
