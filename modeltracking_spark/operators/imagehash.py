"""Perceptual image hashing (dHash) and Hamming-banded image near-dup.

The multimodal twin of the MinHash/SimHash text tier: a 64-bit
difference hash per image (decode -> integer luma -> 9x8 box-mean
resize -> adjacent-column brightness comparisons), then LSH-style band
blocking over the hash so near-duplicate IMAGES join without an
all-pairs scan — the dedup move a 100 TB image corpus needs.

Everything is integer arithmetic so a SQL oracle can replay the hash
from the fixture's pixel formula without touching bytes:

- luma      = r*299 + g*587 + b*114   (x1000 fixed point, no floats)
- box mean  = compared via cross-multiplication
              sum_L * cnt_R  >  sum_R * cnt_L   (no division)
- resize    = destination-partition boxes: source column x belongs to
              box  i = x*9 // w , row y to  j = y*8 // h  — an exact
              partition (every box non-empty once w >= 9, h >= 8).

Bit layout: bit (j, i) = 1 iff box (i, j) is strictly brighter than
box (i+1, j); row byte j packs i=0..7 MSB-first; ``hash_hex`` is the 8
row bytes as 16 lowercase hex chars; the 4 JOIN BANDS are 16-bit words
``band_k = byte_{2k} << 8 | byte_{2k+1}``.

Exactness of the banded join (pigeonhole): with 4 bands, any pair at
Hamming distance <= 3 differs in at most 3 bands, so at least one band
is byte-identical — candidate generation at ``max_hamming <= 3`` has
NO false negatives, and the exact Hamming verify removes the false
positives. The same guarantee LSH banding gives MinHash, here exact.

Scale posture: the hash is a narrow shuffle-free mapInPandas over the
payload column; the pair join shuffles on (band_pos, band_value) — a
bounded 4x65536 key space with corpus-proportional buckets — and every
candidate is verified with 4 xor/bit_count ops. No cross join anywhere.

Reference parity note: the reference (EavenW/Modeltracking) has no
image tier at all; this implements the dedup-pipeline extension the
build brief names (embedding/near-dup dedup applied to the multimodal
columns, SURVEY.md §2.12/§6).
"""

from __future__ import annotations

from modeltracking_spark.operators.kernel import widen_for_kernel

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hash geometry: 9 box columns x 8 box rows -> 8x8 = 64 bits
GRID_W, GRID_H = 9, 8

#: output schema of the hash extractor
DHASH_SCHEMA = (
    "doc_id bigint, width int, height int, hash_hex string, "
    "bands array<int>"
)


def dhash_row_bytes(img) -> list[int]:
    """(h, w, c) uint8 array -> the 8 dHash row bytes (pure numpy,
    integer-exact; shared by the executor kernel and the unit tests).

    Greyscale inputs (c == 1) use luma = pixel * 1000 so the fixed
    point matches the RGB path's 299+587+114 weight sum.
    """
    import numpy as np

    a = np.asarray(img, dtype=np.int64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w = a.shape[:2]
    if a.shape[2] >= 3:
        luma = a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114
    else:
        luma = a[:, :, 0] * 1000
    ci = np.arange(w) * GRID_W // w           # column -> box column
    cj = np.arange(h) * GRID_H // h           # row    -> box row
    sums = np.zeros((GRID_H, GRID_W), dtype=np.int64)
    cnts = np.zeros((GRID_H, GRID_W), dtype=np.int64)
    np.add.at(sums, (cj[:, None], ci[None, :]), luma)
    np.add.at(cnts, (cj[:, None], ci[None, :]), 1)
    # strictly-brighter-than-right comparison, division-free
    left, right = sums[:, :-1], sums[:, 1:]
    bits = left * cnts[:, 1:] > right * cnts[:, :-1]
    weights = 1 << np.arange(GRID_W - 2, -1, -1)   # MSB-first
    return [int(x) for x in bits @ weights]


def dhash_features(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """Arrow-batched perceptual hash over binary image payloads: REAL
    decode through the from-spec codecs (BMP/JPEG/PNG/GIF/TIFF via
    ``_decode_any_image``) then the integer dHash above. One narrow
    mapInPandas — shuffle-free, embarrassingly parallel at 100 TB.

    Output: doc_id, width, height, hash_hex (16 hex chars), bands
    (4 x 16-bit join bands).
    """

    def extract(batches):
        import pandas as pd

        from modeltracking_spark.operators.multimodal import (
            _decode_any_image,
        )

        for pdf in batches:
            ids, ws, hs, hexes, bands = [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_any_image(bytes(payload))
                rows = dhash_row_bytes(img)
                ids.append(int(did))
                ws.append(img.shape[1])
                hs.append(img.shape[0])
                hexes.append("".join(f"{b:02x}" for b in rows))
                bands.append(
                    [rows[2 * k] << 8 | rows[2 * k + 1] for k in range(4)]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "hash_hex": hexes,
                    "bands": bands,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        extract, schema=DHASH_SCHEMA
    )


def dhash_neardup_pairs(hashed: DataFrame, max_hamming: int = 3,
                        id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate image pairs from a ``dhash_features`` frame via
    banded blocking + exact Hamming verify.

    Candidates: posexplode the 4 bands, self-join on
    (band_pos, band_value), keep ``a < b`` — the MinHash-LSH shape, so
    the corpus never self-joins all-pairs. Verify: Hamming distance as
    4 xor + bit_count ops (JVM expressions). For ``max_hamming <= 3``
    the pigeonhole argument in the module docstring makes this EXACT —
    identical output to the quadratic definition.

    Output: doc_a, doc_b, hamming (one row per unordered pair).
    """
    if max_hamming > 3:
        raise ValueError(
            "4 x 16-bit bands guarantee exactness only for "
            f"max_hamming <= 3, got {max_hamming}"
        )
    sides = hashed.select(
        F.col(id_col).alias("id"),
        "bands",
        F.posexplode("bands").alias("band_pos", "band_val"),
    )
    a = sides.alias("a")
    b = sides.alias("b")
    # r16 (guide §2.3/§4.1): Hamming verify BEFORE the distinct, as 4
    # codegen'd xor/bit_count terms. The former shape shipped every
    # candidate with BOTH 4-long band arrays through the distinct
    # exchange (1.4M array-carrying rows at sf0.1) and evaluated the
    # distance as an interpreted aggregate(zip_with(...)) lambda
    # outside whole-stage codegen; the verify keeps ~0.1% of
    # candidates, so filtering first shrinks the distinct to the
    # survivor pairs. hamming is a function of the pair, so
    # distinct-after-filter emits exactly the former rows.
    terms = [
        F.bit_count(
            F.element_at(F.col("a.bands"), i).bitwiseXOR(
                F.element_at(F.col("b.bands"), i)
            )
        )
        for i in range(1, 5)
    ]
    hamming = terms[0] + terms[1] + terms[2] + terms[3]
    return (
        a.join(
            b,
            (F.col("a.band_pos") == F.col("b.band_pos"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may collide in several bands
    )


def dhash_incremental_neardup_matches(
    delta_hashed: DataFrame,
    corpus_hashed: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    broadcast_delta: bool = True,
) -> DataFrame:
    """Near-dup matches of a fresh DELTA of image hashes against a
    mature CORPUS — the image twin of the text tier's
    ``incremental_neardup_matches`` (operators/dedup.py): a daily image
    batch scrubs against an existing corpus by generating candidates
    only across the delta×corpus boundary. The corpus never self-joins
    and never recomputes anything per ingest — at production scale its
    (band_pos, band_val → id) table is a precomputed index, so per
    batch the work is delta-bands × matching corpus buckets, not
    corpus × corpus (the scan here is the bootstrap, exactly the
    ``incremental_dedup`` note).

    SCOPE: cross-boundary only — two near-identical images both inside
    the delta are the delta's own problem;
    :func:`dhash_neardup_pairs` over the (small) delta covers that
    half. The pigeonhole guarantee is unchanged: at
    ``max_hamming <= 3`` at least one of the 4 16-bit bands matches
    exactly, so cross-boundary candidate generation has no false
    negatives and the exact Hamming verify (4 xor/bit_count JVM ops)
    removes the false positives — banded output ≡ the quadratic
    cross-boundary definition, which is what the oracle states.

    ``broadcast_delta=True`` hints the delta's exploded band table onto
    the corpus side — right whenever the delta fits the broadcast limit
    (the daily-crawl shape); ``False`` degrades gracefully to a hash
    join on the same (band_pos, band_val) keys for
    proportionally-large deltas.

    Output: (delta_id, corpus_id, hamming).
    """
    if max_hamming > 3:
        raise ValueError(
            "4 x 16-bit bands guarantee exactness only for "
            f"max_hamming <= 3, got {max_hamming}"
        )

    def sides(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(name),
            F.col("bands").alias(f"{name}_bands"),
            F.posexplode("bands").alias("band_pos", "band_val"),
        )

    d = sides(delta_hashed, "delta_id")
    if broadcast_delta:
        d = F.broadcast(d)
    c = sides(corpus_hashed, "corpus_id")
    # r16: verify before the distinct with codegen'd xor/bit_count
    # terms, exactly as in :func:`dhash_neardup_pairs` — the distinct
    # then dedups only the verified survivors instead of shipping both
    # band arrays per candidate through the exchange.
    terms = [
        F.bit_count(
            F.element_at(F.col("delta_id_bands"), i).bitwiseXOR(
                F.element_at(F.col("corpus_id_bands"), i)
            )
        )
        for i in range(1, 5)
    ]
    hamming = terms[0] + terms[1] + terms[2] + terms[3]
    return (
        d.join(c, ["band_pos", "band_val"])
        .select(
            "delta_id",
            "corpus_id",
            hamming.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may collide in several bands
    )
