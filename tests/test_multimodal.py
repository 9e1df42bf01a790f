"""Multimodal binary-column plumbing: metadata sniff, Arrow-batched
pseudo-decode shape, and the explicit stub boundary."""

import pytest
import pyspark.sql.functions as F

from modeltracking_spark.operators.multimodal import (
    attach_binary_payload,
    binary_metadata,
    decode_image_features,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x")], "doc_id long, text string"
    )


def test_metadata_sniffs_png_magic(spark):
    d = binary_metadata(attach_binary_payload(_docs(spark)))
    rows = {r["doc_id"]: r for r in d.collect()}
    assert rows[1]["format"] == "png"
    assert rows[1]["n_bytes"] == 4 + len("hello world")
    assert len(rows[1]["payload_md5"]) == 32


def test_fake_decode_shape_and_determinism(spark):
    d = attach_binary_payload(_docs(spark))
    f1 = {r["doc_id"]: r for r in decode_image_features(d).collect()}
    f2 = {r["doc_id"]: r for r in decode_image_features(d).collect()}
    assert f1 == f2  # deterministic
    r = f1[1]
    n = 4 + len("hello world")
    assert (r["n_bytes"], r["width"], r["height"]) == (n, n % 64 + 1, n % 48 + 1)
    assert r["n_channels"] in (1, 3)


def test_real_decode_is_explicit_stub(spark):
    d = attach_binary_payload(_docs(spark))
    with pytest.raises(Exception) as ei:
        decode_image_features(d, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_expansion(spark):
    from modeltracking_spark.operators.multimodal import sample_frames

    d = attach_binary_payload(_docs(spark))
    rows = sample_frames(d, every_ms=1000).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n = 4 + len("hello world")
    dur = (n * 7) % 30000
    frames = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert len(frames) == dur // 1000 + 1
    assert [f["t_offset_ms"] for f in frames] == list(range(0, dur + 1, 1000))
    assert all(len(f["frame_md5"]) == 32 for f in frames)


# ---------------------------------------------------------------------------
# real BMP decode path (round 6): pure-numpy from-spec codec
# ---------------------------------------------------------------------------
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.multimodal import (
    attach_bmp_payload,
    decode_bmp,
    encode_bmp,
)


def test_bmp_roundtrip_basic():
    img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    # widths not divisible by 4 exercise real row padding
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_bmp(img)
    row_padded = (w * 3 + 3) & ~3
    assert len(data) == 54 + row_padded * h
    assert np.array_equal(decode_bmp(data), img)


def test_bmp_decodes_public_spec_example():
    """The classic 2x2 24-bit example from the public BMP documentation
    (top row red, white; bottom row blue, green), written here as a raw
    byte literal straight from the spec layout — file header, 40-byte
    info header, bottom-up BGR rows padded to 4 bytes. Decoding it
    breaks the oracle's replay symmetry: these bytes were laid out from
    the SPEC, not by our encoder, so a shared encoder/decoder
    misunderstanding of row order, channel order, or padding fails
    here (VERDICT r6 item 5 hardening; see also tools/oracle_twins.py's
    naive byte-walking reader over the fixture payloads)."""
    data = bytes([
        0x42, 0x4D,              # 'BM'
        0x46, 0x00, 0x00, 0x00,  # file size 70
        0x00, 0x00, 0x00, 0x00,  # reserved
        0x36, 0x00, 0x00, 0x00,  # pixel data offset 54
        0x28, 0x00, 0x00, 0x00,  # info header size 40
        0x02, 0x00, 0x00, 0x00,  # width 2
        0x02, 0x00, 0x00, 0x00,  # height 2 (positive: bottom-up)
        0x01, 0x00,              # planes 1
        0x18, 0x00,              # 24 bpp
        0x00, 0x00, 0x00, 0x00,  # BI_RGB
        0x10, 0x00, 0x00, 0x00,  # image size 16
        0x13, 0x0B, 0x00, 0x00,  # 2835 ppm
        0x13, 0x0B, 0x00, 0x00,
        0x00, 0x00, 0x00, 0x00,  # palette counts
        0x00, 0x00, 0x00, 0x00,
        # stored FIRST = image BOTTOM row, BGR: blue, green + 2 pad bytes
        0xFF, 0x00, 0x00, 0x00, 0xFF, 0x00, 0x00, 0x00,
        # stored second = image TOP row, BGR: red, white + 2 pad bytes
        0x00, 0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0x00, 0x00,
    ])
    img = decode_bmp(data)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0), "top-left is red"
    assert tuple(img[0, 1]) == (255, 255, 255), "top-right is white"
    assert tuple(img[1, 0]) == (0, 0, 255), "bottom-left is blue"
    assert tuple(img[1, 1]) == (0, 255, 0), "bottom-right is green"


def test_bmp_decode_rejects_unsupported():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(data[:-4]))
    data[28] = 8  # bpp = 8
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(data))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG whatever")


def test_bmp_real_decode_in_spark(spark):
    d = attach_bmp_payload(_docs(spark))
    rows = {r["doc_id"]: r for r in decode_image_features(d, fake=False).collect()}
    for did, r in rows.items():
        w, h = did % 16 + 4, did % 12 + 4
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 3)
        y, x = np.mgrid[0:h, 0:w]
        want = int(
            ((x * 7 + y * 11 + did) % 256).sum()
            + ((x * 5 + y * 3 + did * 2) % 256).sum()
            + ((x + y + did) % 256).sum()
        )
        assert r["pixel_sum"] == want


# ---------------------------------------------------------------------------
# real WAV decode path (round 6): pure-numpy RIFF/WAVE PCM16 codec
# ---------------------------------------------------------------------------
from modeltracking_spark.operators.multimodal import (
    attach_wav_payload,
    decode_audio_stats,
    decode_wav,
    encode_wav,
)


def test_wav_roundtrip_basic():
    a = np.array([[100, -200], [300, -400], [32767, -32768]], dtype=np.int16)
    rate, back = decode_wav(encode_wav(a, 44100))
    assert rate == 44100
    assert np.array_equal(back, a)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=200),
    ch=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    data = encode_wav(a, 8000)
    assert len(data) == 44 + n * ch * 2
    rate, back = decode_wav(data)
    assert rate == 8000 and np.array_equal(back, a)


def test_wav_decoder_skips_unknown_chunks():
    # a LIST chunk between fmt and data must be walked over, per spec
    a = np.array([[1], [2], [3]], dtype=np.int16)
    data = encode_wav(a, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = bytearray(data[:fmt_end] + extra + data[fmt_end:])
    # RIFF size grows by the inserted chunk
    import struct as _s
    _s.pack_into("<I", patched, 4, _s.unpack_from("<I", patched, 4)[0] + len(extra))
    rate, back = decode_wav(bytes(patched))
    assert rate == 8000 and np.array_equal(back, a)


def test_wav_decode_rejects_unsupported():
    a = np.zeros((4, 1), dtype=np.int16)
    data = bytearray(encode_wav(a, 8000))
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS junk")
    data[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        decode_wav(bytes(data))
    good = encode_wav(a, 8000)
    with pytest.raises(ValueError, match="truncated WAV data"):
        decode_wav(good[:-2])


def test_wav_real_decode_in_spark(spark):
    d = attach_wav_payload(_docs(spark))
    rows = {r["doc_id"]: r for r in decode_audio_stats(d).collect()}
    for did, r in rows.items():
        n, ch = did % 500 + 100, did % 2 + 1
        assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (8000, ch, n)
        assert r["n_bytes"] == 44 + n * ch * 2
        i, c = np.mgrid[0:n, 0:ch]
        samples = (did * 31 + i * 7 + c * 13) % 4096 - 2048
        assert r["amp_sum"] == int(samples.sum())
        assert r["peak"] == int(np.abs(samples).max())


# ---------------------------------------------------------------------------
# real video decode path (round 6): pure-numpy YUV4MPEG2 codec
# ---------------------------------------------------------------------------
from modeltracking_spark.operators.multimodal import (
    attach_y4m_payload,
    decode_video_stats,
    decode_y4m,
    encode_y4m,
    sample_frames,
)


def _rand_clip(rng, nf, h, w, sub):
    y = rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)
    if sub == "420":
        cs = (nf, h // 2, w // 2)
    else:
        cs = (nf, h, w)
    cb = rng.integers(0, 256, size=cs, dtype=np.uint8)
    cr = rng.integers(0, 256, size=cs, dtype=np.uint8)
    return y, cb, cr


def test_y4m_roundtrip_basic():
    rng = np.random.default_rng(7)
    y, cb, cr = _rand_clip(rng, 3, 4, 6, "420")
    meta, frames = decode_y4m(encode_y4m(y, cb, cr, fps=(30, 1)))
    assert (meta["width"], meta["height"]) == (6, 4)
    assert (meta["fps_num"], meta["fps_den"]) == (30, 1)
    assert len(frames) == 3
    for t, (fy, fcb, fcr) in enumerate(frames):
        assert np.array_equal(fy, y[t])
        assert np.array_equal(fcb, cb[t])
        assert np.array_equal(fcr, cr[t])


@settings(max_examples=40, deadline=None)
@given(
    nf=st.integers(min_value=1, max_value=5),
    h2=st.integers(min_value=1, max_value=6),
    w2=st.integers(min_value=1, max_value=8),
    sub=st.sampled_from(["420", "444"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_y4m_roundtrip_property(nf, h2, w2, sub, seed):
    rng = np.random.default_rng(seed)
    h, w = h2 * 2, w2 * 2
    y, cb, cr = _rand_clip(rng, nf, h, w, sub)
    data = encode_y4m(y, cb, cr, fps=(24, 1), subsampling=sub)
    cpix = (h // 2) * (w // 2) if sub == "420" else h * w
    head = f"YUV4MPEG2 W{w} H{h} F24:1 Ip A1:1 C{sub}\n"
    assert len(data) == len(head) + nf * (6 + h * w + 2 * cpix)
    meta, frames = decode_y4m(data)
    assert meta["subsampling"] == sub and len(frames) == nf
    for t, (fy, fcb, fcr) in enumerate(frames):
        assert np.array_equal(fy, y[t])
        assert np.array_equal(fcb, cb[t])
        assert np.array_equal(fcr, cr[t])


def test_y4m_decode_rejects_unsupported():
    rng = np.random.default_rng(1)
    y, cb, cr = _rand_clip(rng, 2, 4, 4, "420")
    data = encode_y4m(y, cb, cr)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF not a video")
    with pytest.raises(ValueError, match="truncated frame 1"):
        decode_y4m(data[:-3])
    with pytest.raises(ValueError, match="unsupported colourspace"):
        decode_y4m(data.replace(b"C420", b"C422"))
    with pytest.raises(ValueError, match="bad FRAME marker"):
        decode_y4m(data.replace(b"FRAME\n", b"FRUME\n", 1))
    with pytest.raises(ValueError, match="missing W or H"):
        decode_y4m(b"YUV4MPEG2 F25:1\n")


def test_y4m_real_decode_in_spark(spark):
    d = attach_y4m_payload(_docs(spark))
    rows = decode_video_stats(d).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r
    for did, frames in by_doc.items():
        w, h, nf = (did % 8 + 2) * 2, (did % 6 + 2) * 2, did % 5 + 2
        assert sorted(frames) == list(range(nf))
        for t, r in frames.items():
            assert (r["width"], r["height"]) == (w, h)
            assert r["t_offset_ms"] == t * 40  # 25 fps
            yy, xx = np.mgrid[0:h, 0:w]
            yc, xc = np.mgrid[0: h // 2, 0: w // 2]
            assert r["y_sum"] == int(((did * 17 + t * 29 + yy * 11 + xx * 7) % 256).sum())
            assert r["cb_sum"] == int(((did + t * 3 + yc * 5 + xc) % 256).sum())
            assert r["cr_sum"] == int(((did * 2 + t + yc + xc * 3) % 256).sum())


def test_real_frame_sampling_on_y4m(spark):
    import hashlib

    d = attach_y4m_payload(_docs(spark))
    rows = sample_frames(d, every_ms=80, fake=False).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        w, h, nf = (did % 8 + 2) * 2, (did % 6 + 2) * 2, did % 5 + 2
        dur = (nf - 1) * 40
        rs.sort(key=lambda r: r["t_offset_ms"])
        assert [r["t_offset_ms"] for r in rs] == list(range(0, dur + 1, 80))
        # every_ms=80 at a 40 ms frame period -> every second frame
        assert [r["frame_idx"] for r in rs] == [t // 40 for t in range(0, dur + 1, 80)]
        # fingerprint is over the ACTUAL planar bytes
        t = rs[-1]["frame_idx"]
        yy, xx = np.mgrid[0:h, 0:w]
        yc, xc = np.mgrid[0: h // 2, 0: w // 2]
        raw = (
            ((did * 17 + t * 29 + yy * 11 + xx * 7) % 256).astype(np.uint8).tobytes()
            + ((did + t * 3 + yc * 5 + xc) % 256).astype(np.uint8).tobytes()
            + ((did * 2 + t + yc + xc * 3) % 256).astype(np.uint8).tobytes()
        )
        want = hashlib.md5(raw.hex().upper().encode()).hexdigest()
        assert rs[-1]["frame_md5"] == want


def test_real_frame_sampling_rejects_compressed(spark):
    d = attach_binary_payload(_docs(spark))  # PNG-magic payloads
    with pytest.raises(Exception) as ei:
        sample_frames(d, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_real_frame_sampling_exact_at_tick_boundaries(spark):
    """fps whose period is a non-terminating decimal (F15:1 -> 66.67 ms)
    must still select the exact frame at tick boundaries: t=1000 ms IS
    the start of frame 15, not a float hair before it (regression for
    the float-period off-by-one)."""
    import pandas as pd

    rng = np.random.default_rng(3)
    y, cb, cr = _rand_clip(rng, 20, 4, 4, "420")
    data = encode_y4m(y, cb, cr, fps=(15, 1))
    d = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [data]}))
    rows = {r["t_offset_ms"]: r["frame_idx"]
            for r in sample_frames(d, every_ms=1000, fake=False).collect()}
    # duration = 19 frames * 1000/15 = 1266 ms -> ticks at 0 and 1000
    assert rows == {0: 0, 1000: 15}


def test_resize_nearest_neighbor_matches_numpy(spark):
    from modeltracking_spark.operators.multimodal import (
        attach_bmp_payload,
        resize_image_features,
    )

    d = attach_bmp_payload(_docs(spark))
    rows = {r["doc_id"]: r for r in resize_image_features(d, 8, 6).collect()}
    for did, r in rows.items():
        w, h = did % 16 + 4, did % 12 + 4
        assert (r["src_w"], r["src_h"], r["out_w"], r["out_h"]) == (w, h, 8, 6)
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack([
            (x * 7 + y * 11 + did) % 256,
            (x * 5 + y * 3 + did * 2) % 256,
            (x + y + did) % 256,
        ], axis=2)
        ys, xs = (np.arange(6) * h) // 6, (np.arange(8) * w) // 8
        assert r["pixel_sum"] == int(img[ys][:, xs].sum())


def test_decimate_keeps_every_kth_frame(spark):
    from modeltracking_spark.operators.multimodal import (
        attach_wav_payload,
        decimate_audio_stats,
    )

    d = attach_wav_payload(_docs(spark))
    rows = {r["doc_id"]: r for r in decimate_audio_stats(d, factor=3).collect()}
    for did, r in rows.items():
        n, ch = did % 500 + 100, did % 2 + 1
        assert (r["sample_rate"], r["out_rate"]) == (8000, 2666)
        assert (r["n_frames"], r["n_out_frames"]) == (n, (n + 2) // 3)
        i, c = np.mgrid[0:n, 0:ch]
        samples = (did * 31 + i * 7 + c * 13) % 4096 - 2048
        assert r["amp_sum"] == int(samples[::3].sum())


# ---------------------------------------------------------------------------
# G.711 companded audio (round 7): spec properties + WAV routing
# ---------------------------------------------------------------------------


def test_g711_code_roundtrip_identities():
    """compress(expand(code)) is the identity on ALL 256 A-law codes,
    and on all mu-law codes except the documented dual zero 0x7F (both
    0x7F and 0xFF decode to 0, which re-encodes as 0xFF)."""
    from modeltracking_spark.operators.multimodal import (
        alaw_compress, alaw_expand, ulaw_compress, ulaw_expand,
    )

    codes = np.arange(256)
    assert np.array_equal(alaw_compress(alaw_expand(codes)), codes)
    rt = ulaw_compress(ulaw_expand(codes))
    diff = codes[rt != codes]
    assert diff.tolist() == [0x7F] and rt[0x7F] == 0xFF


def test_g711_pcm_error_bounded_and_monotone():
    """expand(compress(x)) error is at most half the segment step (512
    at the top segment), and expansion is monotone in the magnitude
    code within each segment — the G.711 quantization contract."""
    from modeltracking_spark.operators.multimodal import (
        alaw_compress, alaw_expand, ulaw_compress, ulaw_expand,
    )

    x = np.arange(-32768, 32768, 7, dtype=np.int32)
    for comp, exp in ((ulaw_compress, ulaw_expand), (alaw_compress, alaw_expand)):
        err = np.abs(exp(comp(x)).astype(np.int32) - np.clip(x, -32635, 32635))
        assert err.max() <= 512
    # monotone: decoded magnitudes for positive mu-law codes descend as
    # the raw code ascends (mu-law complements, so order flips)
    mags = ulaw_expand(np.arange(0x80, 0x100))
    assert all(a >= b for a, b in zip(mags, mags[1:]))


def test_g711_wav_roundtrip_through_decoder(spark):
    """encode_wav_g711 -> decode_wav expands both laws; stats flow
    through decode_audio_stats unchanged (format routing is internal)."""
    from modeltracking_spark.operators.multimodal import (
        decode_wav, encode_wav_g711, ulaw_compress, ulaw_expand,
    )

    t = np.arange(500)
    pcm = (6000 * np.sin(t / 9)).astype(np.int16).reshape(-1, 2)
    for law in ("mu", "a"):
        rate, frames = decode_wav(encode_wav_g711(pcm, 8000, law=law))
        assert rate == 8000 and frames.shape == pcm.shape
        assert np.abs(frames.astype(int) - pcm.astype(int)).max() <= 512
    # the mu path is exactly expand(compress(pcm))
    _, fr = decode_wav(encode_wav_g711(pcm, 8000, law="mu"))
    assert np.array_equal(fr, ulaw_expand(ulaw_compress(pcm)).reshape(-1, 2))


def test_wav_unsupported_formats_still_loud():
    from modeltracking_spark.operators.multimodal import decode_wav

    import struct as st

    fmt = st.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", 4) + bytes(4))
    with pytest.raises(ValueError, match="ffmpeg plug-in"):
        decode_wav(b"RIFF" + st.pack("<I", len(body)) + body)


# ---------------------------------------------------------------------------
# IMA ADPCM (round 7): the stateful predictive codec
# ---------------------------------------------------------------------------


def test_adpcm_block_decode_matches_scalar_replay():
    """Block decode == an explicit scalar replay of the spec state
    machine, nibble by nibble (low nibble first)."""
    import struct as st

    from modeltracking_spark.operators.multimodal import (
        _ima_step, ima_adpcm_decode_block,
    )

    pred, idx = -123, 30
    nibs = [(j * 5 + 3) % 16 for j in range(77)]
    blk = bytearray(st.pack("<hBB", pred, idx, 0))
    for i in range(0, len(nibs), 2):
        blk.append(nibs[i] | ((nibs[i + 1] if i + 1 < len(nibs) else 0) << 4))
    got = ima_adpcm_decode_block(bytes(blk), 78)
    p, ix = pred, idx
    want = [p]
    for nb in nibs:
        p, ix = _ima_step(p, ix, nb)
        want.append(p)
    assert got == want


def test_adpcm_encode_decode_tracks_signal():
    """The greedy encoder runs its own decoder state, so error never
    accumulates: a smooth signal decodes with small mean error, and
    every block boundary (predictor restart) is sample-exact."""
    from modeltracking_spark.operators.multimodal import (
        decode_wav, encode_wav_ima_adpcm,
    )

    t = np.arange(2600)
    pcm = (9000 * np.sin(t / 40)).astype(np.int16)
    rate, frames = decode_wav(encode_wav_ima_adpcm(pcm, 8000,
                                                   samples_per_block=505))
    dec = frames.reshape(-1)
    assert rate == 8000 and len(dec) == len(pcm)
    err = np.abs(dec.astype(int) - pcm.astype(int))
    assert err.mean() < 40 and err.max() < 2000
    for b0 in range(0, len(pcm), 505):  # header carries the exact sample
        assert dec[b0] == pcm[b0]


def test_adpcm_rejects_and_bounds():
    import struct as st

    from modeltracking_spark.operators.multimodal import (
        decode_wav, ima_adpcm_decode_block,
    )

    with pytest.raises(ValueError, match="step index"):
        ima_adpcm_decode_block(st.pack("<hBB", 0, 99, 0), 1)
    with pytest.raises(ValueError, match="truncated IMA"):
        ima_adpcm_decode_block(st.pack("<hBB", 0, 0, 0), 10)
    # implausible channel counts are malformed, not a crash
    fmt = st.pack("<HHIIHHHH", 0x11, 99, 8000, 8000, 256, 4, 2, 505)
    body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", 0))
    with pytest.raises(ValueError, match="channel count"):
        decode_wav(b"RIFF" + st.pack("<I", len(body)) + body)


def test_adpcm_stereo_interleave_and_fact_chunk():
    """Stereo IMA ADPCM: per-channel headers + alternating 4-byte
    nibble groups; each channel is an INDEPENDENT state machine
    (channel 0 of a stereo stream decodes exactly like a mono stream
    of that channel); the fact chunk truncates the padded tail block
    to the true frame count."""
    from modeltracking_spark.operators.multimodal import (
        decode_wav, encode_wav_ima_adpcm, ima_adpcm_decode_block,
        ima_adpcm_decode_block_stereo, ima_adpcm_encode_mono,
        ima_adpcm_encode_stereo,
    )

    t = np.arange(1300)
    pcm = np.stack(
        [(9000 * np.sin(t / 40)).astype(np.int16),
         (5000 * np.sin(t / 23 + 1)).astype(np.int16)], axis=1)
    rate, frames = decode_wav(
        encode_wav_ima_adpcm(pcm, 8000, samples_per_block=505)
    )
    # 1300 = 2*505 + 290: the tail block's 8-nibble groups are padded,
    # so WITHOUT fact the decode would overshoot — fact pins the shape
    assert rate == 8000 and frames.shape == pcm.shape
    err = np.abs(frames.astype(int) - pcm.astype(int))
    assert err.mean() < 40 and err.max() < 2000
    for b0 in range(0, len(pcm), 505):  # block headers exact, both ch
        assert tuple(frames[b0]) == tuple(pcm[b0])
    # channel independence: stereo ch0 == mono state machine replay
    blk = ima_adpcm_encode_stereo(pcm[:505], 505)
    dec = ima_adpcm_decode_block_stereo(blk, 505)
    mono = ima_adpcm_decode_block(
        ima_adpcm_encode_mono(pcm[:505, 0], 505), 505
    )
    assert [f[0] for f in dec] == mono


def test_resize_works_on_every_real_image_format():
    """resize_image_features now routes through the shared image
    dispatch: JPEG/PNG/GIF payloads resize like BMP (nearest-neighbor
    index map over the decoded pixels)."""
    import numpy as np

    from modeltracking_spark.operators.gif import encode_gif
    from modeltracking_spark.operators.jpeg import encode_jpeg_color
    from modeltracking_spark.operators.multimodal import _decode_any_image
    from modeltracking_spark.operators.png import encode_png

    y, x = np.mgrid[0:12, 0:10]
    rgb = np.stack([(x * 9) % 256, (y * 5) % 256, (x + y) % 256],
                   axis=2).astype(np.uint8)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    from modeltracking_spark.operators.tiff import encode_tiff

    payloads = {
        "bmp": encode_bmp(rgb),
        "png": encode_png(rgb),
        "gif": encode_gif(((x + y) % 256).astype(np.uint8), pal),
        "jpeg": encode_jpeg_color(rgb, subsampling="444"),
        "tiff": encode_tiff(rgb, compression=5),
    }
    for name, p in payloads.items():
        img = _decode_any_image(p)
        assert img.shape[2] == 3 and img.shape[:2] == (12, 10), name
    # lossless formats decode exactly
    assert np.array_equal(_decode_any_image(payloads["png"]), rgb)
    assert np.array_equal(_decode_any_image(payloads["bmp"]), rgb)
    assert np.array_equal(_decode_any_image(payloads["tiff"]), rgb)
    # unknown magic names the plug-in point (TIFF is real since r8)
    with pytest.raises(NotImplementedError, match="PIL or ffmpeg"):
        _decode_any_image(b"RIFFxxxxWEBPVP8 ")


def test_sobel_edge_stats_matches_relational_definition(spark):
    """numpy shifted-slice Sobel == the dx*(2-|dy|) neighbor-join
    definition the oracle uses, on a hand image; flat frames score 0;
    sub-3x3 frames short-circuit."""
    import numpy as np

    from modeltracking_spark.operators.multimodal import (
        encode_bmp,
        sobel_edge_stats,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    flat = np.full((6, 7, 3), 99, np.uint8)
    tiny = rng.integers(0, 256, size=(2, 5, 3), dtype=np.uint8)
    rows = [(0, bytearray(encode_bmp(img))),
            (1, bytearray(encode_bmp(flat))),
            (2, bytearray(encode_bmp(tiny)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in sobel_edge_stats(df).collect()}

    g = img.astype(np.int64).sum(axis=2) // 3
    want = 0
    for y in range(1, 8):
        for x in range(1, 10):
            gx = sum(int(g[y + dy, x + dx]) * dx * (2 - abs(dy))
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1))
            gy = sum(int(g[y + dy, x + dx]) * dy * (2 - abs(dx))
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1))
            want += abs(gx) + abs(gy)
    assert got[0]["edge_sum"] == want and got[0]["n_interior"] == 63
    assert got[1]["edge_sum"] == 0 and got[1]["edge_density_e6"] == 0
    assert got[2]["edge_sum"] == 0 and got[2]["n_interior"] == 0


def test_audio_activity_stats_hand_case(spark):
    """ZCR strict sign-flip semantics (zeros break runs without
    counting), quiet-frame channel max, and int64 energy on a hand
    signal."""
    import numpy as np

    from modeltracking_spark.operators.multimodal import (
        audio_activity_stats,
        encode_wav,
    )

    c0 = np.array([5, -3, 0, -2, 2, 600, -600, 0, 0, 1], np.int16)
    c1 = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.int16)
    pcm = np.stack([c0, c1], axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(pcm, 8000)))], "doc_id long, payload binary"
    )
    r = audio_activity_stats(df).collect()[0]
    # sign flips: 5/-3 yes; -3/0 no; 0/-2 no; -2/2 yes; 2/600 no;
    # 600/-600 yes; -600/0 no; 0/0 no; 0/1 no -> 3
    assert r["n_zero_cross"] == 3
    # quiet frames: max(|c0|,|c1|) < 512 for all but the two 600s -> 8
    assert r["n_quiet"] == 8
    assert r["n_frames"] == 10
    assert r["energy_sum"] == int((c0.astype(np.int64) ** 2).sum())
