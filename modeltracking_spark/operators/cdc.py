"""Content-defined chunking (CDC) for corpus-level shared-content
detection — the storage-dedup primitive (Muthitacharoen et al., LBFS
SOSP'01; FastCDC, Xia et al., USENIX ATC'16).

Fixed-size chunking breaks under insertion (every downstream block
shifts); CDC instead cuts where a ROLLING HASH of the trailing window
hits a target residue, so chunk boundaries re-synchronize after local
edits and identical passages shared between documents hash to
identical chunks no matter where they sit.  That is exactly the
shared-boilerplate / near-copy signal a 100 TB training-data pipeline
wants cheaply: one narrow per-doc kernel, then ONE shuffle at chunk
grain to find cross-document sharing.

Engine-portable definition (code points, not bytes, so Spark substring
== DuckDB substr and the oracle replays every boundary):

- window w=8, polynomial hash ``sum(P^(w-1-j) * cp_j) mod 2^31`` with
  base P=257 (powers mod 2^31)
- candidate cut after position i (1-based) when ``h_i % 101 == 13``
  (expected chunk ~101 chars)
- clamped walk from b=0: next cut = smallest candidate in
  ``[b+min_len, b+max_len]``; if none and more than max_len remains, a
  FORCED cut at ``b+max_len``; else the document end (the tail chunk
  may undershoot min_len)
- min_len=32, max_len=256

The walk is a linear two-pointer over the sparse candidate list; the
hash is w vectorized numpy passes.  All integer arithmetic stays under
2^63 (cp <= 0x10FFFF, 8 terms of cp * 2^31).
"""

from __future__ import annotations

from modeltracking_spark.operators.kernel import widen_for_kernel

from pyspark.sql import DataFrame

CDC_W = 8
CDC_P = 257
CDC_MOD = 1 << 31
CDC_D = 101
CDC_R = 13
CDC_MIN = 32
CDC_MAX = 256

#: P^(w-1), ..., P^0 mod 2^31 — the per-tap multipliers, oldest first
CDC_POWS = [pow(CDC_P, CDC_W - 1 - j, CDC_MOD) for j in range(CDC_W)]


def cdc_boundaries(text: str) -> list[tuple[int, int, bool]]:
    """Pure-Python reference chunker: [(start, end, forced), ...] over
    code-point positions (end-exclusive). Empty text -> no chunks."""
    import numpy as np

    n = len(text)
    if n == 0:
        return []
    cands: list[int] = []
    if n >= CDC_W:
        cp = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        m = n - CDC_W + 1
        h = np.zeros(m, dtype=np.int64)
        for j in range(CDC_W):
            h = (h + CDC_POWS[j] * cp[j:j + m]) % CDC_MOD
        cands = (np.flatnonzero(h % CDC_D == CDC_R) + CDC_W).tolist()
    out = []
    b, ci = 0, 0
    n_c = len(cands)
    while b < n:
        lo, hi = b + CDC_MIN, b + CDC_MAX
        while ci < n_c and cands[ci] < lo:
            ci += 1
        if ci < n_c and cands[ci] <= hi:
            out.append((b, cands[ci], False))
            b = cands[ci]
        elif n - b > CDC_MAX:
            out.append((b, b + CDC_MAX, True))
            b += CDC_MAX
        else:
            out.append((b, n, False))
            b = n
    return out


def cdc_chunks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc CDC chunk table: (id, chunk_idx, start, chunk_len,
    chunk_md5, forced). One Arrow mapInPandas kernel, no shuffle —
    chunk hashing is md5 of the chunk's UTF-8 text, so DuckDB's
    md5(substr(...)) replays it."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("chunk_idx", LongType()),
            StructField("start", LongType()),
            StructField("chunk_len", LongType()),
            StructField("chunk_md5", StringType()),
            StructField("forced", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, starts, lens, md5s, forceds = [], [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = text or ""
                for i, (b, e, forced) in enumerate(cdc_boundaries(s)):
                    ids.append(int(did))
                    idxs.append(i)
                    starts.append(b)
                    lens.append(e - b)
                    md5s.append(
                        hashlib.md5(s[b:e].encode("utf-8")).hexdigest()
                    )
                    forceds.append(forced)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_idx": idxs,
                    "start": starts,
                    "chunk_len": lens,
                    "chunk_md5": md5s,
                    "forced": forceds,
                }
            )

    return widen_for_kernel(df.select(id_col, text_col)).mapInPandas(kernel, schema)


def cdc_shared_chunk_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc CDC summary with cross-document sharing: chunk the
    corpus, find chunk hashes appearing in >= 2 distinct docs (ONE
    aggregate at chunk-md5 grain — the only shuffle that grows with
    the corpus), and fold back per doc.

    Output: (id, n_chunks, n_forced, max_chunk_len, n_shared_chunks,
    shared_chars). At 100 TB this is the standard two-pass shape:
    chunk-grain partial aggregation map-side combines, and nothing is
    ever all-pairs — sharing is discovered by the groupBy, not a
    self-join."""
    from pyspark.sql import functions as F

    # one chunking pass (r16): the shared-chunk aggregate AND the
    # per-doc fold both read the kernel output, and without a cut each
    # re-ran the mapInPandas rolling-hash chunker over the full corpus;
    # the checkpoint holds only the narrow chunk rows (md5/len/flags),
    # never the payloads
    ch = cdc_chunks(df, text_col, id_col).localCheckpoint(eager=False)
    shared = (
        ch.groupBy("chunk_md5")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("chunk_md5", F.lit(True).alias("is_shared"))
    )
    joined = ch.join(shared, "chunk_md5", "left")
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("forced").cast("long")).alias("n_forced"),
        F.max("chunk_len").alias("max_chunk_len"),
        F.sum(
            F.coalesce(F.col("is_shared"), F.lit(False)).cast("long")
        ).alias("n_shared_chunks"),
        F.sum(
            F.when(F.coalesce(F.col("is_shared"), F.lit(False)),
                   F.col("chunk_len")).otherwise(F.lit(0))
        ).alias("shared_chars"),
    )
