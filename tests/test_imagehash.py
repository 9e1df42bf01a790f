"""Perceptual dHash + Hamming-banded image near-dup
(operators/imagehash.py).

Verification layers: a brute per-pixel reference hash (independent
double loops), the strict-comparison boundary, within-group robustness
of the near-dup fixture, pigeonhole exactness of the banded join vs
the quadratic definition, and the scale-plan audit (no cartesian,
shuffle-free hash stage)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from modeltracking_spark.operators.imagehash import (
    dhash_features,
    dhash_neardup_pairs,
    dhash_row_bytes,
)
from modeltracking_spark.operators.multimodal import (
    attach_bmp_neardup_payload,
    encode_bmp,
)
from modeltracking_spark.plans.audit import assert_no_cartesian, executed_plan

from tests.conftest import SF0001


def brute_row_bytes(img: np.ndarray) -> list[int]:
    """Independent per-pixel reference: plain loops, no numpy tricks."""
    a = np.asarray(img, dtype=np.int64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w = a.shape[:2]
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            if a.shape[2] >= 3:
                luma = (
                    int(a[y, x, 0]) * 299
                    + int(a[y, x, 1]) * 587
                    + int(a[y, x, 2]) * 114
                )
            else:
                luma = int(a[y, x, 0]) * 1000
            sums[y * 8 // h][x * 9 // w] += luma
            cnts[y * 8 // h][x * 9 // w] += 1
    out = []
    for j in range(8):
        byte = 0
        for i in range(8):
            if sums[j][i] * cnts[j][i + 1] > sums[j][i + 1] * cnts[j][i]:
                byte |= 1 << (7 - i)
        out.append(byte)
    return out


def hamming(rows_a: list[int], rows_b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(rows_a, rows_b))


@pytest.mark.parametrize("seed", range(6))
def test_row_bytes_match_brute_reference(seed):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(8, 40)), int(rng.integers(9, 40))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert dhash_row_bytes(img) == brute_row_bytes(img)


def test_greyscale_path_matches_brute():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 18), dtype=np.uint8)
    assert dhash_row_bytes(img) == brute_row_bytes(img)


def test_uniform_image_hashes_to_zero():
    # equal box means must NOT set bits: the comparison is strict
    img = np.full((16, 18, 3), 77, dtype=np.uint8)
    assert dhash_row_bytes(img) == [0] * 8


def test_monotone_gradient_sets_every_bit():
    # strictly brighter left-to-right => every comparison fires
    x = np.arange(27, dtype=np.uint8)[::-1]
    img = np.repeat(np.tile(x * 9, (16, 1))[:, :, None], 3, axis=2)
    assert dhash_row_bytes(img.astype(np.uint8)) == [0xFF] * 8


def test_neardup_fixture_groups_stay_close():
    # the 2x2-corner perturbation may flip at most bit (0,0)
    for base in (0, 4, 48, 96):
        w, h = base % 17 + 16, base % 13 + 16
        y, x = np.mgrid[0:h, 0:w]
        variants = []
        for v in range(4):
            corner = ((x < 2) & (y < 2)).astype(np.int64)
            img = np.stack(
                [
                    (x * 7 + y * 11 + base + corner * v * 9) % 256,
                    (x * 5 + y * 3 + base * 2) % 256,
                    (x + y + base) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            variants.append(dhash_row_bytes(img))
        for a in variants:
            for b in variants:
                assert hamming(a, b) <= 1


def test_banded_pairs_equal_quadratic_definition(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(80)
    hashed = dhash_features(attach_bmp_neardup_payload(docs)).cache()
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dhash_neardup_pairs(hashed, max_hamming=3).collect()
    }
    rows = hashed.select("doc_id", "bands").collect()
    want = {}
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            d = sum(
                bin(x ^ y).count("1") for x, y in zip(a["bands"], b["bands"])
            )
            if d <= 3:
                lo, hi = sorted((a["doc_id"], b["doc_id"]))
                want[(lo, hi)] = d
    assert got == want and len(want) > 0
    hashed.unpersist()


def test_feature_stage_is_shuffle_free_and_pairs_no_cartesian(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    hashed = dhash_features(attach_bmp_neardup_payload(docs))
    plan = executed_plan(hashed)
    # no hash exchange; the only exchange is widen_for_kernel's single
    # round-robin on the under-split local scan (no-op at scale)
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("RoundRobinPartitioning") == 1
    assert_no_cartesian(dhash_neardup_pairs(hashed))


def test_real_decode_feeds_hash(spark):
    # one known image through the whole Spark path: encode -> decode ->
    # hash must equal the local reference on the same pixels
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(17, 21, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_bmp(img)))],
                               "doc_id long, payload binary")
    row = dhash_features(df).collect()[0]
    want = brute_row_bytes(img)
    assert row["hash_hex"] == "".join(f"{b:02x}" for b in want)
    assert row["width"] == 21 and row["height"] == 17
    assert row["bands"] == [
        want[0] << 8 | want[1], want[2] << 8 | want[3],
        want[4] << 8 | want[5], want[6] << 8 | want[7],
    ]


def test_max_hamming_above_band_guarantee_rejected(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(4)
    hashed = dhash_features(attach_bmp_neardup_payload(docs))
    with pytest.raises(ValueError, match="max_hamming"):
        dhash_neardup_pairs(hashed, max_hamming=4)


def test_incremental_matches_equal_quadratic_cross_boundary(spark):
    """r9 delta×corpus arm: banded cross-boundary matches must equal
    the quadratic cross-boundary definition (pigeonhole exactness at
    max_hamming=3), with the broadcast and non-broadcast shapes
    row-identical; delta pairs and corpus self-pairs never appear."""
    from modeltracking_spark.operators.imagehash import (
        dhash_incremental_neardup_matches,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(80)
    hashed = dhash_features(attach_bmp_neardup_payload(docs)).cache()
    delta = hashed.where(F.col("doc_id") % 10 == 7)
    corpus = hashed.where(F.col("doc_id") % 10 != 7)
    got = {
        (r["delta_id"], r["corpus_id"]): r["hamming"]
        for r in dhash_incremental_neardup_matches(
            delta, corpus, max_hamming=3
        ).collect()
    }
    rows = hashed.select("doc_id", "bands").collect()
    want = {}
    for a in rows:
        if a["doc_id"] % 10 != 7:
            continue
        for b in rows:
            if b["doc_id"] % 10 == 7:
                continue
            d = sum(
                bin(x ^ y).count("1")
                for x, y in zip(a["bands"], b["bands"])
            )
            if d <= 3:
                want[(a["doc_id"], b["doc_id"])] = d
    assert got == want and len(want) > 0
    # both ids of every match sit on their own side of the boundary
    assert all(a % 10 == 7 and b % 10 != 7 for a, b in got)
    no_bcast = {
        (r["delta_id"], r["corpus_id"]): r["hamming"]
        for r in dhash_incremental_neardup_matches(
            delta, corpus, max_hamming=3, broadcast_delta=False
        ).collect()
    }
    assert no_bcast == want
    with pytest.raises(ValueError, match="max_hamming"):
        dhash_incremental_neardup_matches(delta, corpus, max_hamming=4)
    assert_no_cartesian(
        dhash_incremental_neardup_matches(delta, corpus)
    )
    hashed.unpersist()
