"""Corruption fuzz over every from-spec codec: byte flips, truncations,
garbage splices, and chunk duplications against valid payloads must
ONLY ever raise the typed loud rejects (ValueError /
NotImplementedError) or succeed — never IndexError / KeyError /
struct.error / OverflowError / hangs. Decompression-bomb guards reject
absurd claimed dimensions before any allocation."""

from __future__ import annotations

import random
import zlib

import numpy as np
import pytest

from modeltracking_spark.operators import gif as G
from modeltracking_spark.operators import jpeg as J
from modeltracking_spark.operators import png as P
from modeltracking_spark.operators import tiff as T
from modeltracking_spark.operators.inflate import (
    gzip_decompress,
    zlib_decompress,
)
from modeltracking_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_wav_g711,
    encode_wav_ima_adpcm,
    encode_y4m,
)


def _zstd_ref_fixture() -> bytes:
    payload = (b"reference zstd fuzz base: varied text 0123456789 " * 60
               + bytes(range(256)))
    try:
        import ctypes
        import ctypes.util

        lib = ctypes.CDLL(ctypes.util.find_library("zstd"))
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_isError.restype = ctypes.c_uint
        bound = lib.ZSTD_compressBound(len(payload))
        buf = ctypes.create_string_buffer(bound)
        n = lib.ZSTD_compress(buf, bound, payload, len(payload), 19)
        if not lib.ZSTD_isError(n):
            return buf.raw[:n]
    except Exception:
        pass
    from modeltracking_spark.operators.zstd import zstd_compress

    return zstd_compress(payload)


def _brotli_ref_fixture() -> bytes:
    payload = (b"brotli fuzz base: the quick brown fox over HTML text "
               * 40 + bytes(range(256)))
    try:
        import ctypes
        import ctypes.util

        enc = ctypes.CDLL(
            ctypes.util.find_library("brotlienc") or "libbrotlienc.so.1")
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_char_p]
        bound = len(payload) + (len(payload) >> 1) + 1024
        buf = ctypes.create_string_buffer(bound)
        n = ctypes.c_size_t(bound)
        if enc.BrotliEncoderCompress(11, 22, 0, len(payload), payload,
                                     ctypes.byref(n), buf):
            return buf.raw[:n.value]
    except Exception:
        pass
    return b""  # library absent: empty stream still fuzzes the header


def _fixtures():
    npr = np.random.RandomState(0)
    img = npr.randint(0, 256, (17, 13)).astype(np.uint8)
    rgb = npr.randint(0, 256, (17, 13, 3)).astype(np.uint8)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    pcm = (3000 * np.sin(np.arange(700) / 9)).astype(np.int16).reshape(-1, 2)
    y = npr.randint(0, 256, (3, 8, 8)).astype(np.uint8)
    return {
        "jpeg": (J.encode_jpeg_gray(img), J.decode_jpeg),
        "jpeg_prog": (J.encode_jpeg_progressive(img), J.decode_jpeg),
        "jpeg_color": (J.encode_jpeg_color(rgb), J.decode_jpeg),
        "png": (P.encode_png(rgb), P.decode_png),
        "png_adam7": (P.encode_png(img, interlace=True), P.decode_png),
        "gif": (G.encode_gif(img, pal), G.decode_gif),
        "gif_anim": (
            G.encode_gif_animation([img, img], pal), G.decode_gif_frames,
        ),
        "bmp": (encode_bmp(rgb), decode_bmp),
        "wav": (encode_wav(pcm, 8000), decode_wav),
        "g711": (encode_wav_g711(pcm, 8000, law="mu"), decode_wav),
        "adpcm": (encode_wav_ima_adpcm(pcm[:, 0], 8000), decode_wav),
        "y4m": (encode_y4m(y, y[:, :4, :4], y[:, :4, :4]), decode_y4m),
        "zlib": (
            zlib.compress(b"hello compression world" * 40, 6),
            zlib_decompress,
        ),
        "jpeg12": (
            J.encode_jpeg_gray(
                (npr.randint(0, 4096, (17, 13))).astype(np.uint16),
                precision=12,
            ),
            J.decode_jpeg,
        ),
        "gzip": (__import__("gzip").compress(b"warc record " * 120, 6),
                 gzip_decompress),
        "tiff": (T.encode_tiff(img, compression=5), T.decode_tiff),
        "tiff_strips": (
            T.encode_tiff(rgb, compression=5, rows_per_strip=4),
            T.decode_tiff,
        ),
        "tiff_tiled": (
            T.encode_tiff(
                npr.randint(0, 256, (20, 40)).astype(np.uint8),
                compression=5, predictor=2, tile=(16, 16),
            ),
            T.decode_tiff,
        ),
        "tiff_palette": (
            T.encode_tiff(
                (img % 16).astype(np.uint8),
                compression=32773, palette=pal[:16],
            ),
            T.decode_tiff,
        ),
        "lz4_block": (
            __import__(
                "modeltracking_spark.operators.lz4", fromlist=["x"]
            ).lz4_block_compress(b"fuzz me gently " * 30),
            __import__(
                "modeltracking_spark.operators.lz4", fromlist=["x"]
            ).lz4_block_decompress,
        ),
        "lz4_frame": (
            __import__(
                "modeltracking_spark.operators.lz4", fromlist=["x"]
            ).lz4_frame_compress(b"framed fuzz target " * 60),
            __import__(
                "modeltracking_spark.operators.lz4", fromlist=["x"]
            ).lz4_frame_decompress,
        ),
        "snappy_block": (
            __import__(
                "modeltracking_spark.operators.snappy", fromlist=["x"]
            ).snappy_block_compress(b"snappy fuzz corpus " * 40),
            __import__(
                "modeltracking_spark.operators.snappy", fromlist=["x"]
            ).snappy_block_decompress,
        ),
        "snappy_frame": (
            __import__(
                "modeltracking_spark.operators.snappy", fromlist=["x"]
            ).snappy_frame_compress(b"framed snappy fuzz " * 80),
            __import__(
                "modeltracking_spark.operators.snappy", fromlist=["x"]
            ).snappy_frame_decompress,
        ),
        "bzip2": (
            __import__("bz2").compress(b"bzip2 fuzz target line\n" * 50, 1),
            __import__(
                "modeltracking_spark.operators.bzip2", fromlist=["x"]
            ).bz2_decompress,
        ),
        "zstd": (
            __import__(
                "modeltracking_spark.operators.zstd", fromlist=["x"]
            ).zstd_compress(b"zstd fuzz target record " * 40),
            lambda b: __import__(
                "modeltracking_spark.operators.zstd", fromlist=["x"]
            ).zstd_decompress(b, max_output=1 << 16),
        ),
        "zstd_ref": (
            # reference-encoded base when libzstd is present: mutations
            # then land inside REAL FSE table headers / Huffman weight
            # sections / 4-stream literals, not just our subset shapes
            _zstd_ref_fixture(),
            lambda b: __import__(
                "modeltracking_spark.operators.zstd", fromlist=["x"]
            ).zstd_decompress(b, max_output=1 << 16),
        ),
        "tar_zst": (
            __import__(
                "modeltracking_spark.operators.zstd", fromlist=["x"]
            ).zstd_compress(
                __import__(
                    "modeltracking_spark.operators.tar", fromlist=["x"]
                ).build_tar([("b/f.txt", b"tar fuzz body " * 25, 0)])
            ),
            lambda b: __import__(
                "modeltracking_spark.operators.tar", fromlist=["x"]
            ).parse_tar(
                __import__(
                    "modeltracking_spark.operators.zstd", fromlist=["x"]
                ).zstd_decompress(b, max_output=1 << 16)
            ),
        ),
        "warc_gz": (
            __import__(
                "modeltracking_spark.operators.warc", fromlist=["x"]
            ).build_warc_gz_fixture(3, "warc fuzz target body " * 20),
            lambda b: __import__(
                "modeltracking_spark.operators.warc", fromlist=["x"]
            ).parse_warc_gz(b),
        ),
        "xz": (
            __import__("lzma").compress(
                b"xz fuzz target record\n" * 50,
                format=__import__("lzma").FORMAT_XZ,
            ),
            lambda b: __import__(
                "modeltracking_spark.operators.xz", fromlist=["x"]
            ).xz_decompress(b, max_output=1 << 16),
        ),
        "lzma": (
            __import__("lzma").compress(
                b"lzma fuzz target record\n" * 60,
                format=__import__("lzma").FORMAT_ALONE,
            ),
            # bound max_output: corrupt streams carry no checksum, so a
            # flipped bit may decode junk — the guard keeps junk finite
            lambda b: __import__(
                "modeltracking_spark.operators.lzma_alone", fromlist=["x"]
            ).lzma_alone_decompress(b, max_output=1 << 16),
        ),
        "xz_bcj": (
            __import__("lzma").compress(
                b"xz bcj fuzz target \xe8\x80\x81 code " * 50,
                format=__import__("lzma").FORMAT_XZ,
                filters=[{"id": __import__("lzma").FILTER_X86},
                         {"id": __import__("lzma").FILTER_LZMA2,
                          "preset": 1}],
            ),
            lambda b: __import__(
                "modeltracking_spark.operators.xz", fromlist=["x"]
            ).xz_decompress(b, max_output=1 << 16),
        ),
        "zlib_fdict": (
            # round 11: FDICT preset-dictionary stream — corrupting
            # the DICTID, header, or body must stay typed
            (lambda z: (lambda co: co.compress(
                b"zlib fdict fuzz target record " * 40) + co.flush())(
                z.compressobj(6, z.DEFLATED, 15,
                              zdict=b"fuzz target record " * 30)))(
                __import__("zlib")),
            lambda b: __import__(
                "modeltracking_spark.operators.inflate", fromlist=["x"]
            ).zlib_decompress(b, zdict=b"fuzz target record " * 30),
        ),
        "xz_bcj_family": (
            # round 11: a branch-family chain (SPARC ahead of LZMA2) —
            # corrupting filter props / payload must stay typed
            __import__("lzma").compress(
                b"xz sparc fuzz target \x40\x00\x7f\xc0 code " * 50,
                format=__import__("lzma").FORMAT_XZ,
                filters=[{"id": __import__("lzma").FILTER_SPARC,
                          "start_offset": 4096},
                         {"id": __import__("lzma").FILTER_LZMA2,
                          "preset": 1}],
            ),
            lambda b: __import__(
                "modeltracking_spark.operators.xz", fromlist=["x"]
            ).xz_decompress(b, max_output=1 << 16),
        ),
        "xz_bcj_riscv": (
            # RISC-V chain (closed the branch family): the CLI encodes
            # (stdlib has no FILTER_RISCV id); corrupting the packed
            # AUIPC words / address bytes must stay typed
            __import__("subprocess").run(
                ["/root/miniconda/bin/xz", "--riscv=start=2",
                 "--lzma2=preset=1", "-c"],
                input=(b"\x97\x11\x00\x00\xe7\x80\x01\x00"  # auipc pair
                       b"\x17\xf1\xff\xff"                   # escape bait
                       b"\xef\x00\x00\x01riscv fuzz target ") * 40,
                capture_output=True, check=True).stdout,
            lambda b: __import__(
                "modeltracking_spark.operators.xz", fromlist=["x"]
            ).xz_decompress(b, max_output=1 << 16),
        ),
        "brotli": (
            _brotli_ref_fixture(),
            # no integrity check in the format: corrupt streams may
            # decode junk — the guard keeps junk finite
            lambda b: __import__(
                "modeltracking_spark.operators.brotli_dec", fromlist=["x"]
            ).brotli_decompress(b, max_output=1 << 16),
        ),
    }


def _mutate(rng: random.Random, base: bytes) -> bytes:
    b = bytearray(base)
    op = rng.randrange(4)
    if op == 0 and len(b) > 1:  # flip random bytes
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
    elif op == 1:  # truncate
        b = b[: rng.randrange(len(b))]
    elif op == 2:  # splice garbage
        i = rng.randrange(len(b))
        b = (b[:i]
             + bytes(rng.randrange(256) for _ in range(rng.randrange(1, 20)))
             + b[i:])
    else:  # duplicate a run
        i = rng.randrange(len(b))
        jn = rng.randrange(i, len(b) + 1)
        b = b[:jn] + b[i:jn] + b[jn:]
    return bytes(b)


@pytest.mark.parametrize("name", sorted(_fixtures()))
def test_corruption_only_raises_typed_errors(name):
    base, dec = _fixtures()[name]
    # crc32, NOT hash(): python string hashing is salted per process,
    # which made this fuzz nondeterministic — a salted run found the
    # zstd truncated-sequences-count IndexError the deterministic
    # seeds had missed (now pinned in test_zstd_truncated_sequences
    # below and fixed in operators/zstd.py)
    rng = random.Random(zlib.crc32(name.encode()) & 0xFFFF)
    for trial in range(800):
        payload = _mutate(rng, base)
        try:
            dec(payload)
        except (ValueError, NotImplementedError):
            pass  # the loud-reject contract
        # anything else (IndexError, KeyError, struct.error, Overflow,
        # ZeroDivision, MemoryError) fails the test by propagating


def test_decompression_bomb_guards():
    """Absurd claimed dimensions reject BEFORE allocation."""
    import struct

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    bomb = (P._SIG + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(bytes(10)))
            + P._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bomb"):
        P.decode_png(bomb)
    gif_bomb = bytearray(_fixtures()["gif"][0])
    gif_bomb[6:10] = struct.pack("<HH", 60000, 60000)
    with pytest.raises(ValueError, match="bomb"):
        G.decode_gif(bytes(gif_bomb))
    jb = bytearray(_fixtures()["jpeg"][0])
    sof = jb.index(b"\xff\xc0")
    jb[sof + 5 : sof + 9] = struct.pack(">HH", 60000, 60000)
    with pytest.raises(ValueError, match="bomb"):
        J.decode_jpeg(bytes(jb))


def test_zstd_truncated_sequences():
    """Regression (round 12, found by a salted-hash fuzz run): a
    block whose sequences section ends inside the 2- or 3-byte
    sequence count, or right before the compression-modes byte, must
    raise the typed ValueError — not IndexError."""
    from modeltracking_spark.operators.zstd import (
        _decode_sequences,
        _FrameCtx,
    )

    ctx = _FrameCtx()
    for block in (b"\x80", b"\xff", b"\xff\x01", b"\x01"):
        with pytest.raises(ValueError,
                           match="truncated|missing"):
            _decode_sequences(block, 0, ctx)
