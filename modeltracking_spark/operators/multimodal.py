"""Multimodal (binary) column plumbing (extension surface; SURVEY.md
§2.12): images/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio/video decode libraries, so every
codec here is built from its public spec. Uncompressed containers
(the round-5/6 playbook, same as ``sources/netcdf_classic.py``):
24-bit BMP (Windows BITMAPINFOHEADER spec), PCM16 RIFF/WAVE, and
YUV4MPEG2 planar C420/C444 video (mjpegtools spec). COMPRESSED formats
(round 7): baseline JPEG — greyscale and 4:4:4/4:2:0 YCbCr color —
via ``operators/jpeg.py`` (ITU T.81), PNG via ``operators/png.py``
(RFC 2083 + stdlib zlib), and G.711 mu-law/A-law companded WAV audio
(ITU G.711 segmented-log tables, below), and IMA ADPCM (mono packed
nibbles AND the multi-channel 4-byte-group interleave, with the spec's
``fact`` chunk bounding padded tail blocks). What remains genuinely
library-bound — MP3/AAC, H.264, progressive/arithmetic JPEG — raises
``NotImplementedError`` at the exact point a PIL/ffmpeg decoder would
plug in, and the ``fake=True`` paths keep a deterministic
pseudo-feature tier for exercising the Spark plumbing (schema, batch
shape, Arrow transfer, partition mapping) format-independently.
"""

from __future__ import annotations

from modeltracking_spark.operators.kernel import widen_for_kernel

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic prefixes for the cheap format sniff (hex, uppercase)
MAGIC_PREFIXES = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",
    "424D": "bmp",
}


# ---------------------------------------------------------------------------
# pure-numpy BMP codec (uncompressed 24-bit BI_RGB, bottom-up rows)
#
# Format, from the public spec: 14-byte BITMAPFILEHEADER ('BM', file
# size, 2x reserved, pixel-data offset) + 40-byte BITMAPINFOHEADER
# (header size 40, width, height — positive = bottom-up row order,
# planes=1, bpp=24, compression=0/BI_RGB, image size, resolutions,
# palette counts), then rows of BGR byte triples, each row zero-padded
# to a 4-byte boundary. All integers little-endian.
# ---------------------------------------------------------------------------




def _malformed_guard(kind):
    """Decorator: low-level parse crashes on corrupt bytes (struct
    under-reads, index overruns, absurd header values) surface as ONE
    descriptive ValueError instead of leaking IndexError/KeyError/
    OverflowError internals — the loud-reject contract, fuzz-enforced
    in tests/test_fuzz_codecs.py."""
    import functools
    import struct as _struct

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **kw):
            try:
                return fn(*a, **kw)
            except (ValueError, NotImplementedError):
                raise
            except (_struct.error, IndexError, KeyError, OverflowError,
                    ZeroDivisionError, MemoryError) as exc:
                raise ValueError(
                    f"malformed {kind} stream: "
                    f"{type(exc).__name__}: {exc}"
                ) from exc
        return wrapped
    return deco

def encode_bmp(pixels) -> bytes:
    """(h, w, 3) uint8 RGB array -> uncompressed 24-bit BMP bytes."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {a.shape}")
    h, w = a.shape[:2]
    row_raw = w * 3
    row_padded = (row_raw + 3) & ~3
    img_size = row_padded * h
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + img_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_padded), dtype=np.uint8)
    # bottom-up row order, BGR channel order
    rows[:, :row_raw] = a[::-1, :, ::-1].reshape(h, row_raw)
    return header + info + rows.tobytes()


@_malformed_guard("BMP")
def decode_bmp(data: bytes):
    """Uncompressed 24-bit BMP bytes -> (h, w, 3) uint8 RGB array.

    Raises ``ValueError`` with a descriptive message on any payload this
    codec does not cover (other bit depths, compressed, truncated)."""
    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: hdr={hdr_size} planes={planes} "
            f"bpp={bpp} compression={compression} (only uncompressed "
            "24-bit BI_RGB is implemented)"
        )
    flip = h > 0  # positive height = bottom-up
    h = abs(h)
    row_raw = w * 3
    row_padded = (row_raw + 3) & ~3
    need = data_off + row_padded * h
    if len(data) < need:
        raise ValueError(
            f"truncated BMP: need {need} bytes for {w}x{h}, got {len(data)}"
        )
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_padded * h, offset=data_off
    ).reshape(h, row_padded)
    img = rows[:, :row_raw].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          out_col: str = "payload") -> DataFrame:
    """Fixture builder: a deterministic binary column (PNG magic + UTF-8
    bytes of the text) standing in for real image payloads."""
    return df.withColumn(
        out_col,
        F.concat(F.unhex(F.lit("89504E47")), F.encode(F.col(text_col), "UTF-8")),
    )


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata off an opaque binary column — all JVM expressions:
    byte length, sniffed format from magic bytes, payload digest.

    The digest is md5 over the uppercase hex rendering (not raw bytes) so
    it is reproducible in engines whose md5 only accepts strings."""
    p = F.col(payload_col)
    hexed = F.upper(F.hex(p))
    fmt = F.lit("unknown")
    for magic, name in reversed(MAGIC_PREFIXES.items()):
        fmt = F.when(
            F.substring(hexed, 1, len(magic)) == magic, F.lit(name)
        ).otherwise(fmt)
    return (
        df.withColumn("n_bytes", F.length(p).cast("long"))
        .withColumn("format", fmt)
        .withColumn("payload_md5", F.md5(hexed))
    )


# ---------------------------------------------------------------------------
# pure-numpy WAV codec (RIFF/WAVE, PCM 16-bit LE, interleaved)
#
# Format, from the public RIFF/WAVE spec: 'RIFF' + chunk size + 'WAVE',
# then a 'fmt ' subchunk (size 16 for PCM: audio_format=1, n_channels,
# sample_rate, byte_rate, block_align, bits_per_sample=16) and a 'data'
# subchunk holding interleaved little-endian int16 frames. The decoder
# walks subchunks (skipping unknown ones), so files with extra chunks
# (LIST/INFO) still parse.
# ---------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int) -> bytes:
    """(n_frames, n_channels) int16 array -> PCM16 WAV bytes."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"expected (n_frames, n_channels), got {a.shape}")
    n_frames, n_ch = a.shape
    data = a.astype("<i2").tobytes()
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_malformed_guard("WAV")
def decode_wav(data: bytes):
    """WAV bytes -> (sample_rate, (n_frames, n_channels) int16).

    PCM 16-bit (format 1) passes samples through; G.711 mu-law (format
    7) and A-law (format 6) 8-bit streams are EXPANDED to int16 through
    the spec companders below — the compressed-audio decode path. Other
    encodings (ADPCM, float, MP3-in-WAV) raise ``ValueError`` naming
    the ffmpeg plug-in point, as do truncated or non-RIFF payloads."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    rate = n_ch = None
    audio_fmt = None
    frames = None
    fact_n = None  # 'fact' chunk: total frames (required for non-PCM)
    while off + 8 <= end:
        cid, csize = data[off : off + 4], struct.unpack_from("<I", data, off + 4)[0]
        body_off = off + 8
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError(f"fmt chunk too small ({csize} bytes)")
            if body_off + min(csize, 20) > len(data):
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, n_ch, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", data, body_off
            )
            if audio_fmt == _WAV_FMT_IMA_ADPCM:
                if not 1 <= n_ch <= 8:
                    raise ValueError(
                        f"implausible IMA ADPCM channel count {n_ch}"
                    )
                if bits != 4 or csize < 20:
                    raise ValueError(
                        f"malformed IMA ADPCM fmt: bits={bits} csize={csize}"
                    )
                samples_per_block = struct.unpack_from(
                    "<H", data, body_off + 18
                )[0]
                if samples_per_block < 1:
                    raise ValueError("IMA ADPCM samples_per_block = 0")
            elif not (
                (audio_fmt == _WAV_FMT_PCM and bits == 16)
                or (audio_fmt in (_WAV_FMT_ALAW, _WAV_FMT_MULAW) and bits == 8)
            ):
                raise ValueError(
                    f"unsupported WAV encoding: format={audio_fmt} bits={bits} "
                    "(PCM 16-bit, 8-bit G.711 mu-law/A-law, and mono IMA "
                    "ADPCM are implemented; float/MP3-in-WAV are the ffmpeg "
                    "plug-in point)"
                )
        elif cid == b"fact":
            fact_n = struct.unpack_from("<I", data, body_off)[0]
        elif cid == b"data":
            if n_ch is None:
                raise ValueError("data chunk before fmt chunk")
            if body_off + csize > len(data):
                raise ValueError(
                    f"truncated WAV data chunk: need {csize} bytes at offset "
                    f"{body_off}, file has {len(data) - body_off}"
                )
            if audio_fmt == _WAV_FMT_PCM:
                frames = np.frombuffer(
                    data, dtype="<i2", count=csize // 2, offset=body_off
                ).reshape(-1, n_ch)
            elif audio_fmt == _WAV_FMT_IMA_ADPCM:
                samples = []
                raw = data[body_off : body_off + csize]
                for b0 in range(0, len(raw), block_align):
                    block = raw[b0 : b0 + block_align]
                    # a trailing short block decodes the samples its
                    # nibble bytes actually cover
                    n_here = min(
                        samples_per_block,
                        (len(block) - 4 * n_ch) * 2 // n_ch + 1,
                    )
                    if n_ch == 1:
                        samples.extend(
                            ima_adpcm_decode_block(block, n_here)
                        )
                    else:
                        samples.extend(
                            ima_adpcm_decode_block_stereo(
                                block, n_here, n_ch
                            )
                        )
                frames = np.array(samples, dtype=np.int16).reshape(-1, n_ch)
            else:
                codes = np.frombuffer(
                    data, dtype=np.uint8, count=csize, offset=body_off
                )
                expand = (
                    ulaw_expand if audio_fmt == _WAV_FMT_MULAW else alaw_expand
                )
                frames = expand(codes).reshape(-1, n_ch)
        off = body_off + csize + (csize & 1)  # chunks are word-aligned
    if rate is None or frames is None:
        raise ValueError("missing fmt or data chunk")
    if fact_n is not None and len(frames) > fact_n:
        # compressed blocks pad to group boundaries; fact is the truth
        frames = frames[:fact_n]
    return rate, frames


# ---------------------------------------------------------------------------
# G.711 companded audio (ITU-T G.711 mu-law / A-law) — the COMPRESSED
# audio path, from the public spec's segmented-logarithm tables: pure
# integer compress/expand (8-bit code <-> 14-bit magnitude as int16).
# Spec properties pinned in pytest: expand∘compress error <= half the
# segment step (max 512 at the top segment), compress∘expand is the
# identity on all 256 A-law codes and on all mu-law codes except the
# dual zero 0x7F -> 0xFF. The expansion is branch-free integer
# arithmetic, so a companded WAV's decode is SQL-oracle-able exactly.
# ---------------------------------------------------------------------------

_ULAW_BIAS, _ULAW_CLIP = 0x84, 32635


def _msb_exp(mag):
    """Segment number: position of the MSB above bit 7 (0..7), exact
    via frexp (no float-log edge cases)."""
    import numpy as np

    return (np.frexp(mag.astype(np.float64))[1] - 8).clip(0).astype(np.int32)


def ulaw_compress(samples):
    """int16 PCM -> mu-law code bytes (G.711 encode)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.where(x < 0, -x, x), _ULAW_CLIP) + _ULAW_BIAS
    exp = _msb_exp(mag)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def ulaw_expand(codes):
    """mu-law code bytes -> int16 PCM (G.711 decode; branch-free)."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.int32)) & 0xFF
    exp = (u >> 4) & 7
    mag = (((u & 0x0F) << 3) + _ULAW_BIAS << exp) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_compress(samples):
    """int16 PCM -> A-law code bytes (G.711 encode, 0x55 toggle)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int32)
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.minimum(np.where(x >= 0, x, -x - 1), 32767)
    exp = _msb_exp(np.maximum(mag, 1))
    a = np.where(
        mag < 256, mag >> 4, (exp << 4) | ((mag >> (exp + 3)) & 0x0F)
    )
    return ((a ^ mask) & 0xFF).astype(np.uint8)


def alaw_expand(codes):
    """A-law code bytes -> int16 PCM (G.711 decode; branch-free)."""
    import numpy as np

    a = (np.asarray(codes, dtype=np.int32) ^ 0x55) & 0xFF
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 7
    t = np.where(
        seg == 0, t + 8,
        np.where(seg == 1, t + 0x108,
                 (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


# ---------------------------------------------------------------------------
# IMA ADPCM (DVI4 / WAV format 0x11) — the STATEFUL predictive audio
# codec, from the public IMA ADPCM spec: 4-bit nibbles drive a
# (predictor, step-index) state machine — step table of 89 entries,
# index deltas [-1,-1,-1,-1,2,4,6,8], diff = step/8 + bit-selected
# step/4 + step/2 + step, predictor clamped to int16, index to 0..88.
# Pure integer and SEQUENTIAL: sample t's value depends on all nibbles
# before it — which is exactly what makes its SQL oracle interesting
# (a recursive CTE replays the state machine, the pack_greedy pattern).
# Mono only; multi-channel 4-byte interleave is the ffmpeg plug-in
# point.
# ---------------------------------------------------------------------------

#: IMA step-size table (89 entries, public spec)
IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
#: index adjustment per nibble magnitude (low 3 bits)
IMA_INDEX_DELTA = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: (predictor, index) + nibble ->
    new (predictor, index). Integer-exact per the spec."""
    step = IMA_STEPS[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_DELTA[nib & 7]))
    return pred, idx


def ima_adpcm_decode_block(block: bytes, n_samples: int):
    """One mono IMA block (4-byte header + low-nibble-first data) ->
    list of ``n_samples`` int16 values (the header predictor is sample
    0)."""
    if len(block) < 4:
        raise ValueError("IMA ADPCM block shorter than its 4-byte header")
    pred = struct.unpack_from("<h", block, 0)[0]
    idx = block[2]
    if idx > 88:
        raise ValueError(f"IMA ADPCM step index {idx} out of range 0..88")
    out = [pred]
    for t in range(1, n_samples):
        j = t - 1
        byte_i = 4 + (j >> 1)
        if byte_i >= len(block):
            raise ValueError(
                f"truncated IMA ADPCM block: sample {t} of {n_samples} "
                f"needs byte {byte_i}, block has {len(block)}"
            )
        nib = (block[byte_i] >> 4) if j & 1 else (block[byte_i] & 0x0F)
        pred, idx = _ima_step(pred, idx, nib)
        out.append(pred)
    return out


def ima_adpcm_decode_block_stereo(block: bytes, n_samples: int,
                                  n_ch: int = 2):
    """One INTERLEAVED IMA block (per-channel 4-byte headers, then
    per-channel alternating 4-byte groups of 8 nibbles) -> list of
    ``n_samples`` frames, each a tuple of ``n_ch`` int16 values (the
    header predictors are frame 0) — the WAV 0x11 multi-channel layout
    from the public spec."""
    hdr = 4 * n_ch
    if len(block) < hdr:
        raise ValueError("IMA ADPCM block shorter than its channel headers")
    preds, idxs = [], []
    for c in range(n_ch):
        p = struct.unpack_from("<h", block, 4 * c)[0]
        ix = block[4 * c + 2]
        if ix > 88:
            raise ValueError(f"IMA ADPCM step index {ix} out of range 0..88")
        preds.append(p)
        idxs.append(ix)
    out = [tuple(preds)]
    data = block[hdr:]
    # nibble j of channel c lives in 4-byte group (j // 8) of that
    # channel; groups alternate ch0, ch1, ... within each group-row
    for t in range(1, n_samples):
        j = t - 1
        frame = []
        for c in range(n_ch):
            grp_row, in_grp = j >> 3, j & 7
            byte_i = (grp_row * n_ch + c) * 4 + (in_grp >> 1)
            if byte_i >= len(data):
                raise ValueError(
                    f"truncated IMA ADPCM block: frame {t} of {n_samples} "
                    f"channel {c} needs data byte {byte_i}, have {len(data)}"
                )
            b = data[byte_i]
            nib = (b >> 4) if in_grp & 1 else (b & 0x0F)
            preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
            frame.append(preds[c])
        out.append(tuple(frame))
    return out


def ima_adpcm_encode_stereo(samples, samples_per_block: int = 505,
                            n_ch: int = 2) -> bytes:
    """(n_frames, n_ch) int16 PCM -> interleaved IMA ADPCM block
    stream (per-channel headers + alternating 4-byte nibble groups);
    the greedy per-channel quantizer of :func:`ima_adpcm_encode_mono`,
    with each channel's (predictor, index) state independent."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim != 2 or a.shape[1] != n_ch:
        raise ValueError(f"expected (n_frames, {n_ch}), got {a.shape}")
    out = bytearray()
    idxs = [0] * n_ch
    for b0 in range(0, len(a), samples_per_block):
        blk = a[b0 : b0 + samples_per_block]
        preds = [int(blk[0, c]) for c in range(n_ch)]
        for c in range(n_ch):
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibs: list[list[int]] = [[] for _ in range(n_ch)]
        for frame in blk[1:]:
            for c in range(n_ch):
                step = IMA_STEPS[idxs[c]]
                diff = int(frame[c]) - preds[c]
                nib = 8 if diff < 0 else 0
                if diff < 0:
                    diff = -diff
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibs[c].append(nib)
        n_grp_rows = -(-len(nibs[0]) // 8) if nibs[0] else 0
        for g in range(n_grp_rows):
            for c in range(n_ch):
                chunk = nibs[c][g * 8 : g * 8 + 8]
                chunk += [0] * (8 - len(chunk))
                for i in range(0, 8, 2):
                    out.append(chunk[i] | (chunk[i + 1] << 4))
    return bytes(out)


def ima_adpcm_encode_mono(samples, samples_per_block: int = 505) -> bytes:
    """Mono int16 PCM -> IMA ADPCM block stream (the canonical greedy
    encoder: nibble = best step-quantized approximation of the delta,
    then the encoder runs its own decoder state so errors never
    accumulate past one step)."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16).reshape(-1)
    out = bytearray()
    idx = 0
    for b0 in range(0, len(a), samples_per_block):
        blk = a[b0 : b0 + samples_per_block]
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for x in blk[1:]:
            step = IMA_STEPS[idx]
            diff = int(x) - pred
            nib = 8 if diff < 0 else 0
            if diff < 0:
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_step(pred, idx, nib)
            nibs.append(nib)
        for i in range(0, len(nibs), 2):
            lo = nibs[i]
            hi = nibs[i + 1] if i + 1 < len(nibs) else 0
            out.append(lo | (hi << 4))
    return bytes(out)


#: WAVE_FORMAT codes (public RIFF registry)
_WAV_FMT_PCM, _WAV_FMT_ALAW, _WAV_FMT_MULAW = 1, 6, 7
_WAV_FMT_IMA_ADPCM = 0x11


def encode_wav_g711(samples, sample_rate: int, law: str = "mu") -> bytes:
    """(n_frames, n_channels) int16 -> companded 8-bit G.711 WAV bytes
    (WAVE_FORMAT_MULAW=7 / WAVE_FORMAT_ALAW=6)."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"expected (n_frames, n_channels), got {a.shape}")
    if law == "mu":
        fmt_code, codes = _WAV_FMT_MULAW, ulaw_compress(a)
    elif law == "a":
        fmt_code, codes = _WAV_FMT_ALAW, alaw_compress(a)
    else:
        raise ValueError(f"unknown G.711 law {law!r} (mu or a)")
    n_frames, n_ch = a.shape
    data = codes.astype(np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHH", fmt_code, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_any_image(payload: bytes):
    """Dispatch a binary image payload to the right from-spec codec ->
    (h, w, c) uint8 array. BMP, JPEG (baseline grey/color/progressive,
    restart intervals), PNG (all legal depths, Adam7, tRNS), GIF
    (incl. interlace; first frame of animations via decode_gif_frames),
    and TIFF (none/LZW, grey/RGB, multi-strip) are REAL; anything else
    names the PIL/ffmpeg plug-in point."""
    from modeltracking_spark.operators.gif import (
        decode_gif,
        decode_gif_frames,
    )
    from modeltracking_spark.operators.jpeg import decode_jpeg
    from modeltracking_spark.operators.png import decode_png

    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(b"\xff\xd8"):
        img = decode_jpeg(payload)
        return img[:, :, None] if img.ndim == 2 else img
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        img = decode_png(payload)
        return img[:, :, None] if img.ndim == 2 else img
    if payload.startswith((b"GIF87a", b"GIF89a")):
        try:
            return decode_gif(payload)
        except NotImplementedError:  # animation: first composed frame
            return decode_gif_frames(payload)[0][1]
    if payload.startswith((b"II*\x00", b"MM\x00*")):
        from modeltracking_spark.operators.tiff import decode_tiff

        img = decode_tiff(payload)
        return img[:, :, None] if img.ndim == 2 else img
    raise NotImplementedError(
        "real decode beyond BMP / JPEG (baseline + progressive) / PNG / "
        "GIF / TIFF requires PIL or ffmpeg; not in container"
    )


#: output schema of the image feature extractor (pixel_sum only filled
#: by the real decode path; NULL in fake mode)
IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_channels int, "
    "pixel_sum bigint"
)


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload",
                          fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the shape a real image decode/resize/embed stage
    takes at scale (per-partition pandas batches, no driver collect).

    ``fake=True``: deterministic pseudo-features from byte length (for
    compressed formats whose decoders are not in this container).
    ``fake=False``: REAL decode — uncompressed 24-bit BMP through the
    pure-numpy codec above, baseline greyscale JPEG through the
    from-spec T.81 codec (``operators/jpeg.py``), and PNG (grey/RGB/
    palette/RGBA, all five filters) through the from-spec codec
    (``operators/png.py``) — width/height/channels read from the actual
    parsed stream, ``pixel_sum`` the sum of every decoded byte (any
    header, Huffman, DEFLATE, filter, or pixel-layout bug shifts it).
    Everything else (GIF, color/progressive JPEG, ...) raises
    ``NotImplementedError`` where a PIL/ffmpeg decoder would plug in.
    """

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            if not fake:
                w, h, c, s = [], [], [], []
                for payload in pdf[payload_col]:
                    img = _decode_any_image(bytes(payload))
                    w.append(img.shape[1])
                    h.append(img.shape[0])
                    c.append(img.shape[2])
                    s.append(int(img.sum(dtype=np.int64)))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col].astype("int64"),
                        "n_bytes": n,
                        "width": pd.Series(w, dtype="int32"),
                        "height": pd.Series(h, dtype="int32"),
                        "n_channels": pd.Series(c, dtype="int32"),
                        "pixel_sum": pd.Series(s, dtype="int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n,
                    "width": (n % 64 + 1).astype("int32"),
                    "height": (n % 48 + 1).astype("int32"),
                    "n_channels": ((n % 2) * 2 + 1).astype("int32"),
                    "pixel_sum": pd.Series([None] * len(pdf), dtype="Int64"),
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )


def attach_bmp_payload(df: DataFrame, id_col: str = "doc_id",
                       out_col: str = "payload") -> DataFrame:
    """Fixture builder for the REAL decode path: a deterministic
    formula-generated BMP per row — width = id%16+4, height = id%12+4,
    RGB = ((x*7 + y*11 + id) % 256, (x*5 + y*3 + id*2) % 256,
    (x + y + id) % 256) — encoded through :func:`encode_bmp` inside
    mapInPandas. The formula is replayable in SQL, so an oracle can
    check decoded stats without ever seeing the bytes (the same
    encode -> decode -> scan pattern as the netCDF grid fixture)."""

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 16 + 4, d % 12 + 4
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (x * 7 + y * 11 + d) % 256,
                        (x * 5 + y * 3 + d * 2) % 256,
                        (x + y + d) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(encode_bmp(img))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_bmp_neardup_payload(df: DataFrame, id_col: str = "doc_id",
                               out_col: str = "payload") -> DataFrame:
    """Fixture builder for the perceptual-hash near-dup tier
    (:mod:`modeltracking_spark.operators.imagehash`): groups of four
    NEAR-IDENTICAL images. ``base = doc_id - doc_id % 4`` drives the
    whole image — width ``base % 17 + 16``, height ``base % 13 + 16``
    (>= 16 on both axes so every 9x8 dHash box is non-empty), RGB =
    ((x*7 + y*11 + base) % 256, (x*5 + y*3 + base*2) % 256,
    (x + y + base) % 256) — and the group variant ``v = doc_id % 4``
    perturbs ONLY the red channel of the 2x2 top-left corner
    (``+ v*9`` inside the mod), a change small enough that group
    members stay within Hamming distance <= 3 of each other while
    unrelated groups differ in content and dimensions. The formula is
    SQL-replayable, so the banded near-dup join is oracle-checkable
    end to end (the BMP/netCDF playbook applied to image dedup)."""

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                base, v = d - d % 4, d % 4
                w, h = base % 17 + 16, base % 13 + 16
                y, x = np.mgrid[0:h, 0:w]
                corner = ((x < 2) & (y < 2)).astype(np.int64)
                img = np.stack(
                    [
                        (x * 7 + y * 11 + base + corner * v * 9) % 256,
                        (x * 5 + y * 3 + base * 2) % 256,
                        (x + y + base) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(encode_bmp(img))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_jpeg_payload(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """Fixture builder for the REAL compressed-image decode path: a
    deterministic BLOCK-CONSTANT greyscale image per row — width =
    id%21+4, height = id%17+4 (non-multiples of 8, so partial edge MCUs
    are exercised), every 8x8 block constant at
    (id*13 + bx*127 + by*199) % 256 — encoded through the from-spec
    baseline T.81 encoder (``operators/jpeg.py``) with the FLAT_Q8
    quantization table. Block-constant + DC-divisible quant means the
    full Huffman/DCT roundtrip is bit-exact (jpeg.py docstring), so the
    pixel FORMULA is SQL-replayable and an oracle can attest the decoder
    without ever seeing the bytes — the BMP/netCDF playbook, now through
    a real entropy-coded compressed format.

    BOUNDARY-HITTING FAMILY (VERDICT r7 item 6): the 127/199 block
    multipliers produce large alternating DC diffs, so doc_ids 10, 49,
    186, 207, 245, 247, 265, 266, 267, 305 of the standard 0..499
    family carry a stuffed FF00 inside their entropy segment — the
    driver's CORRECTNESS gate itself exercises byte-stuffing removal
    (pinned in tests/test_jpeg.py)."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.jpeg import encode_jpeg_gray

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 21 + 4, d % 17 + 4
                bw, bh = -(-w // 8), -(-h // 8)
                by, bx = np.mgrid[0:bh, 0:bw]
                bv = (d * 13 + bx * 127 + by * 199) % 256
                img = np.kron(bv, np.ones((8, 8), dtype=np.int64))
                payloads.append(
                    encode_jpeg_gray(img[:h, :w].astype(np.uint8))
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_jpeg_progressive_payload(df: DataFrame, id_col: str = "doc_id",
                                    out_col: str = "payload") -> DataFrame:
    """Fixture builder for the PROGRESSIVE (SOF2) decode path: grey
    block-constant images — width = id%20+4, height = id%14+4, block
    value (id*17 + bx*23 + by*31) % 256 — through the five-scan
    progressive encoder (DC first at Al=1, banded AC first scans, DC
    and AC refinement; operators/jpeg.py). Progressive and baseline
    carry the same quantized coefficients, so block-constant content
    stays bit-exact and the scan machinery (EOB runs, correction bits,
    point transforms) is SQL-oracle-able."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.jpeg import encode_jpeg_progressive

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 20 + 4, d % 14 + 4
                bw, bh = -(-w // 8), -(-h // 8)
                by, bx = np.mgrid[0:bh, 0:bw]
                bv = (d * 17 + bx * 23 + by * 31) % 256
                img = np.kron(bv, np.ones((8, 8), dtype=np.int64))
                payloads.append(
                    encode_jpeg_progressive(img[:h, :w].astype(np.uint8))
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_jpeg_color_payload(df: DataFrame, id_col: str = "doc_id",
                              out_col: str = "payload") -> DataFrame:
    """Fixture builder for the 3-COMPONENT 4:2:0 JPEG decode path:
    a deterministic GREY (R=G=B) block-constant image per row — width =
    id%23+4, height = id%15+4, every 8x8 block at
    (id*11 + bx*19 + by*23) % 256 — through ``encode_jpeg_color`` with
    2x2 chroma subsampling. Grey content makes the chroma planes
    exactly 128 (the JFIF transform rows sum to 0), so the full color
    pipeline — interleaved 4Y+Cb+Cr MCUs, separate chroma quant/Huffman
    tables, three DC predictor chains, subsample, upsample, inverse
    transform — roundtrips bit-exactly and stays SQL-oracle-able
    (operators/jpeg.py exactness contract). Colored content is
    tolerance-pinned in tests/test_jpeg.py."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.jpeg import encode_jpeg_color

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 23 + 4, d % 15 + 4
                bw, bh = -(-w // 8), -(-h // 8)
                by, bx = np.mgrid[0:bh, 0:bw]
                bv = (d * 11 + bx * 19 + by * 23) % 256
                gray = np.kron(bv, np.ones((8, 8), dtype=np.int64))[:h, :w]
                img = np.stack([gray] * 3, axis=2).astype(np.uint8)
                payloads.append(encode_jpeg_color(img, subsampling="420"))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_gif_payload(df: DataFrame, id_col: str = "doc_id",
                       out_col: str = "payload") -> DataFrame:
    """Fixture builder for the palette/LZW compressed-image path: a
    deterministic indexed image per row — width = id%18+4, height =
    id%11+4, index = (x*5 + y*9 + id) % 16 over a 16-entry greyscale
    ramp palette (pal[i] = (17i, 17i, 17i)) — through the from-spec
    GIF87a encoder (real variable-width LZW with early-change widening
    and 12-bit re-Clear, operators/gif.py). Docs with id % 10 == 6 (50
    of the standard 0..499 family) store rows in the four-pass
    INTERLACED order — the decode output (and so the SQL oracle) is
    identical, but the driver's gate then attests the Adam-style
    reorder path too, not just pytest. GIF is lossless over its
    palette, so the arbitrary index formula is SQL-replayable exactly
    (pixel_sum = 3*17x the index sum).

    BOUNDARY-HITTING FAMILY (VERDICT r7 item 6): the 16-entry palette
    (min_code_size 4) makes LZW widen boundaries dense enough that
    doc_ids 94, 114, 292, 312, 490 (raster) plus 46 (interlaced) land
    their FINAL prefix flush exactly on a 2^width table boundary — the
    exact stream shape of the r7 end-of-stream width-desync bug — so
    the driver's CORRECTNESS gate itself, not just pytest, fails if
    that fix regresses (pinned in tests/test_gif.py)."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.gif import encode_gif

        pal = (np.stack([np.arange(16)] * 3, axis=1) * 17).astype(np.uint8)
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 18 + 4, d % 11 + 4
                y, x = np.mgrid[0:h, 0:w]
                idx = ((x * 5 + y * 9 + d) % 16).astype(np.uint8)
                payloads.append(
                    encode_gif(idx, pal, interlace=(d % 10 == 6))
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_png_payload(df: DataFrame, id_col: str = "doc_id",
                       out_col: str = "payload") -> DataFrame:
    """Fixture builder for the REAL lossless compressed-image path:
    a deterministic RGB gradient per row — width = id%19+4, height =
    id%13+4, RGB = ((x*3 + y*7 + id) % 256, (x*11 + y*5 + id*3) % 256,
    (x*13 + y + id*7) % 256) — encoded through the from-spec PNG
    encoder (``operators/png.py``), whose filter type cycles per row,
    so decode exercises every unfilter path. PNG is lossless, so the
    arbitrary per-pixel formula is SQL-replayable with no
    block-constant restriction (contrast ``attach_jpeg_payload``)."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.png import encode_png

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 19 + 4, d % 13 + 4
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (x * 3 + y * 7 + d) % 256,
                        (x * 11 + y * 5 + d * 3) % 256,
                        (x * 13 + y + d * 7) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(encode_png(img))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id",
                       out_col: str = "payload") -> DataFrame:
    """Fixture builder for the REAL audio decode path: a deterministic
    formula-generated PCM16 WAV per row — n_frames = id%500+100,
    channels = id%2+1, rate 8000 Hz, sample[i, c] =
    ((id*31 + i*7 + c*13) % 4096) − 2048 — encoded through
    :func:`encode_wav` inside mapInPandas. SQL-replayable, like the BMP
    and netCDF fixtures."""

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                n, ch = d % 500 + 100, d % 2 + 1
                i, c = np.mgrid[0:n, 0:ch]
                a = ((d * 31 + i * 7 + c * 13) % 4096 - 2048).astype(np.int16)
                payloads.append(encode_wav(a, 8000))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


#: output schema of the real audio stats extractor
AUDIO_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sample_rate int, n_channels int, "
    "n_frames bigint, amp_sum bigint, peak int"
)


def _ima_fmt_body(sample_rate: int, block_align: int,
                  samples_per_block: int, n_ch: int = 1) -> bytes:
    byte_rate = max(1, sample_rate * block_align // max(samples_per_block, 1))
    return struct.pack(
        "<HHIIHHHH", _WAV_FMT_IMA_ADPCM, n_ch, sample_rate, byte_rate,
        block_align, 4, 2, samples_per_block,
    )


def encode_wav_ima_adpcm(samples, sample_rate: int,
                         samples_per_block: int = 505) -> bytes:
    """int16 PCM -> IMA ADPCM WAV bytes (format 0x11, cbSize=2 fmt
    extension carrying wSamplesPerBlock). 1-D or (n, 1) input takes
    the mono packed-nibble layout; (n, ch>=2) the interleaved 4-byte
    group layout."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    if n_ch == 1:
        data = ima_adpcm_encode_mono(a.reshape(-1), samples_per_block)
        block_align = 4 + (samples_per_block - 1 + 1) // 2
    else:
        data = ima_adpcm_encode_stereo(a, samples_per_block, n_ch)
        block_align = 4 * n_ch + (-(-(samples_per_block - 1) // 8)) * 4 * n_ch
    fmt = _ima_fmt_body(sample_rate, block_align, samples_per_block,
                        n_ch=n_ch)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, a.shape[0])
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def attach_adpcm_payload(df: DataFrame, id_col: str = "doc_id",
                         out_col: str = "payload") -> DataFrame:
    """Fixture builder for the STATEFUL compressed-audio decode path:
    a mono 8 kHz single-block IMA ADPCM WAV per row whose header state
    and NIBBLES come straight from formulas — n = doc_id%220+40
    samples, initial predictor (doc_id*97)%4001−2000, initial step
    index doc_id%89, nibble j = (doc_id*3 + j*7)%16. The nibbles are
    the ground truth (no encode step), so the decoder's sequential
    state machine is replayable exactly by a recursive-CTE oracle —
    the pack_greedy pattern applied to a codec."""

    def build(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                n = d % 220 + 40
                pred0 = (d * 97) % 4001 - 2000
                idx0 = d % 89
                nibs = [(d * 3 + j * 7) % 16 for j in range(n - 1)]
                blk = bytearray(struct.pack("<hBB", pred0, idx0, 0))
                for i in range(0, len(nibs), 2):
                    lo = nibs[i]
                    hi = nibs[i + 1] if i + 1 < len(nibs) else 0
                    blk.append(lo | (hi << 4))
                data = bytes(blk)
                fmt = _ima_fmt_body(8000, len(data), n)
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                    + (b"\x00" if len(data) & 1 else b"")
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", len(body)) + body
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_tiff_payload(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """Fixture builder for the TIFF decode path: a deterministic
    greyscale image per row — width = id%17+4, height = id%13+4,
    pixel = (x*7 + y*13 + id) % 256 — through the from-spec TIFF 6.0
    encoder (operators/tiff.py). Storage mode rotates on id%6 so the
    driver gate attests EVERY codec arm, not just one: 0 = LZW
    (Compression 5: MSB-first codes, early change at 2^w-1), 1 =
    uncompressed, 2 = PackBits (32773, rows packed separately), 3 =
    LZW + horizontal-differencing Predictor 2 (big-endian "MM" when
    id%12==9, so predictor+MM compose on an attested doc), 4 =
    uncompressed big-endian "MM", 5 = PackBits big-endian. Ids with
    id%3==0 additionally split into 4-row strips, attesting the IFD
    offset/count arrays and per-strip decompression. Lossless in every
    mode, so the pixel formula is SQL-replayable exactly.

    BOUNDARY-HITTING FAMILY: docs with id % 100 == 46 (46/146/246/346/
    446) are 11x23 DESCENDING-byte images — every adjacent byte pair is
    distinct, so the 253-byte LZW stream lands its FINAL prefix flush
    exactly on the 2^width-1 early-change boundary (the TIFF analog of
    the r7 GIF desync shape; the structured formula images never land
    there because cross-row pair reuse slows table growth). Pinned in
    tests/test_tiff.py so the driver gate itself catches an
    end-of-stream width regression."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.tiff import encode_tiff

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                if d % 100 == 46:
                    w, h = 23, 11
                    y, x = np.mgrid[0:h, 0:w]
                    img = ((255 - (y * 23 + x)) % 256).astype(np.uint8)
                else:
                    w, h = d % 17 + 4, d % 13 + 4
                    y, x = np.mgrid[0:h, 0:w]
                    img = ((x * 7 + y * 13 + d) % 256).astype(np.uint8)
                if d % 100 == 46:  # boundary family stays on plain LZW
                    comp, pred, be = 5, 1, False
                else:
                    comp, pred, be = {
                        0: (5, 1, False),
                        1: (1, 1, False),
                        2: (32773, 1, False),
                        3: (5, 2, d % 12 == 9),
                        4: (1, 1, True),
                        5: (32773, 1, True),
                    }[d % 6]
                payloads.append(
                    encode_tiff(
                        img,
                        compression=comp,
                        rows_per_strip=4 if d % 3 == 0 else None,
                        predictor=pred,
                        big_endian=be,
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def attach_gif_animation_payload(df: DataFrame, id_col: str = "doc_id",
                                 out_col: str = "payload") -> DataFrame:
    """Fixture builder for ANIMATED GIF decode: per row a GIF89a
    animation over a greyscale ramp palette — canvas w = id%10+4, h =
    id%8+4, n = id%3+2 frames with delays 4+j cs. Frame 0 is the base
    (x*3 + y*5 + id) % 255; frames j>=1 are DELTA frames: pixels with
    (x+y+j)%3 == 0 carry (x*2 + y*7 + j*31 + id) % 255, the rest are
    the transparent index 255 — so the composed canvas at frame j is a
    pure function of (x, y, j, id) and the GCE-transparency composition
    is SQL-replayable exactly."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.gif import encode_gif_animation

        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 10 + 4, d % 8 + 4
                n = d % 3 + 2
                y, x = np.mgrid[0:h, 0:w]
                frames = [((x * 3 + y * 5 + d) % 255).astype(np.uint8)]
                for j in range(1, n):
                    delta = np.full((h, w), 255, dtype=np.uint8)
                    hit = (x + y + j) % 3 == 0
                    delta[hit] = ((x * 2 + y * 7 + j * 31 + d) % 255)[hit]
                    frames.append(delta)
                payloads.append(
                    encode_gif_animation(
                        frames, pal,
                        delays_cs=[4 + j for j in range(n)],
                        transparent=255,
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def gif_frame_stats(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """1 -> n_frames expansion over animated GIFs: decode every frame's
    COMPOSED canvas (delta frames + GCE transparency applied) inside
    mapInPandas and emit (doc_id, frame_idx, delay_cs, pixel_sum) — the
    animated-image twin of ``sample_frames``/``decode_video_stats``."""

    def extract(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.gif import decode_gif_frames

        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "frame_idx", "delay_cs", "pixel_sum")}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                for j, (delay, canvas) in enumerate(
                    decode_gif_frames(bytes(payload))
                ):
                    rows["doc_id"].append(int(did))
                    rows["frame_idx"].append(j)
                    rows["delay_cs"].append(int(delay))
                    rows["pixel_sum"].append(int(canvas.sum(dtype=np.int64)))
            yield pd.DataFrame(rows)

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        extract,
        schema="doc_id bigint, frame_idx int, delay_cs int, pixel_sum bigint",
    )


def attach_g711_payload(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload", law: str = "mu") -> DataFrame:
    """Fixture builder for the COMPRESSED audio decode path: a mono
    8 kHz G.711 WAV per row whose CODE bytes come straight from the
    formula (doc_id*7 + i*13) % 256 over n = doc_id%400+80 frames — the
    companded bytes are the ground truth (no compress step), so the
    decoder's branch-free expansion is SQL-replayable exactly
    (ulaw_expand/alaw_expand above)."""
    fmt_code = {"mu": _WAV_FMT_MULAW, "a": _WAV_FMT_ALAW}[law]

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                n = d % 400 + 80
                codes = ((d * 7 + np.arange(n) * 13) % 256).astype(np.uint8)
                data = codes.tobytes()
                fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, 8)
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                    + (b"\x00" if len(data) & 1 else b"")
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", len(body)) + body
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def decode_audio_stats(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL audio decode via the pure-numpy WAV codec: sample rate,
    channel count, and frame count come from the parsed header;
    ``amp_sum`` (sum of every sample value) and ``peak`` (max |sample|)
    attest the PCM payload bit-exactly. Non-WAV payloads raise
    ``NotImplementedError`` at the codec plug-in point (compressed audio
    would need ffmpeg)."""

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_bytes", "sample_rate", "n_channels",
                "n_frames", "amp_sum", "peak",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                # a RIFF container is only a WAV if bytes 8-12 say WAVE —
                # WEBP/AVI also start with 'RIFF' and belong to the
                # ffmpeg plug-in path, not a decode error
                head = bytes(payload[:12])
                if not (head[:4] == b"RIFF" and head[8:12] == b"WAVE"):
                    raise NotImplementedError(
                        "real decode beyond WAV (PCM16 / G.711 / IMA "
                        "ADPCM) requires ffmpeg; not in container"
                    )
                rate, frames = decode_wav(bytes(payload))
                rows["doc_id"].append(int(did))
                rows["n_bytes"].append(len(payload))
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(frames.shape[1])
                rows["n_frames"].append(frames.shape[0])
                rows["amp_sum"].append(int(frames.sum(dtype=np.int64)))
                rows["peak"].append(int(np.abs(frames.astype(np.int32)).max()))
            yield pd.DataFrame(rows)

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        extract, schema=AUDIO_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# pure-numpy Y4M codec (YUV4MPEG2, progressive, planar C420/C444)
#
# Format, from the public YUV4MPEG2 spec (mjpegtools): an ASCII stream
# header line "YUV4MPEG2" followed by space-separated parameter tags
# (W<width> H<height> F<fps_num>:<fps_den> I<interlace> A<aspect>
# C<colourspace>) terminated by '\n'; then per frame an ASCII "FRAME"
# marker line (optional parameters, '\n'-terminated) followed by raw
# planar YCbCr bytes — Y (w*h), Cb, Cr. C444 chroma planes are full
# size; C420 variants subsample both axes by 2 (w/2 * h/2 each).
# ---------------------------------------------------------------------------

Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(y, cb, cr, fps=(25, 1), subsampling: str = "420") -> bytes:
    """Planar frames -> YUV4MPEG2 bytes.

    ``y`` is (n_frames, h, w) uint8; ``cb``/``cr`` are (n_frames, h, w)
    for ``subsampling='444'`` or (n_frames, h//2, w//2) for ``'420'``
    (even dims required)."""
    import numpy as np

    ya = np.asarray(y, dtype=np.uint8)
    cba = np.asarray(cb, dtype=np.uint8)
    cra = np.asarray(cr, dtype=np.uint8)
    if ya.ndim != 3:
        raise ValueError(f"expected (n_frames, h, w) luma array, got {ya.shape}")
    nf, h, w = ya.shape
    if subsampling == "444":
        want = (nf, h, w)
    elif subsampling == "420":
        if h % 2 or w % 2:
            raise ValueError(f"C420 needs even dims, got {w}x{h}")
        want = (nf, h // 2, w // 2)
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if cba.shape != want or cra.shape != want:
        raise ValueError(
            f"chroma shape {cba.shape}/{cra.shape} != expected {want} for C{subsampling}"
        )
    head = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{subsampling}\n"
    ).encode("ascii")
    parts = [head]
    for t in range(nf):
        parts.append(b"FRAME\n")
        parts.append(ya[t].tobytes())
        parts.append(cba[t].tobytes())
        parts.append(cra[t].tobytes())
    return b"".join(parts)


@_malformed_guard("Y4M")
def decode_y4m(data: bytes):
    """YUV4MPEG2 bytes -> (meta dict, list of (Y, Cb, Cr) uint8 arrays).

    ``meta`` holds width/height/fps_num/fps_den/subsampling. Raises
    ``ValueError`` with a descriptive message for bad magic, missing
    W/H/F tags, unsupported colourspaces, bad FRAME markers, or a
    truncated frame payload."""
    import numpy as np

    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated YUV4MPEG2 stream header")
    w = h = None
    fps_num, fps_den = 25, 1
    sub = "420"
    for tag in data[len(Y4M_MAGIC): nl].split(b" "):
        if not tag:
            continue
        k, v = chr(tag[0]), tag[1:].decode("ascii")
        if k == "W":
            w = int(v)
        elif k == "H":
            h = int(v)
        elif k == "F":
            fps_num, fps_den = (int(x) for x in v.split(":"))
        elif k == "C":
            sub = v
    if w is None or h is None:
        raise ValueError("YUV4MPEG2 header missing W or H tag")
    if sub.startswith("420"):
        cw, ch = w // 2, h // 2
    elif sub == "444":
        cw, ch = w, h
    else:
        raise ValueError(
            f"unsupported colourspace C{sub} (only C420*/C444 implemented)"
        )
    frame_bytes = w * h + 2 * cw * ch
    frames = []
    off = nl + 1
    while off < len(data):
        fnl = data.find(b"\n", off)
        if not data.startswith(b"FRAME", off) or fnl < 0:
            raise ValueError(
                f"bad FRAME marker at offset {off} (frame {len(frames)})"
            )
        off = fnl + 1
        if off + frame_bytes > len(data):
            raise ValueError(
                f"truncated frame {len(frames)}: need {frame_bytes} bytes at "
                f"offset {off}, got {len(data) - off}"
            )
        y = np.frombuffer(data, np.uint8, w * h, off).reshape(h, w)
        cb = np.frombuffer(data, np.uint8, cw * ch, off + w * h).reshape(ch, cw)
        cr = np.frombuffer(
            data, np.uint8, cw * ch, off + w * h + cw * ch
        ).reshape(ch, cw)
        frames.append((y, cb, cr))
        off += frame_bytes
    meta = {
        "width": w, "height": h, "fps_num": fps_num, "fps_den": fps_den,
        "subsampling": sub,
    }
    return meta, frames


def attach_y4m_payload(df: DataFrame, id_col: str = "doc_id",
                       out_col: str = "payload") -> DataFrame:
    """Fixture builder for the REAL video decode path: a deterministic
    formula-generated C420 Y4M clip per row — w = (id%8+2)*2,
    h = (id%6+2)*2, n_frames = id%5+2 at 25:1 fps,
    Y[t,y,x]  = (id*17 + t*29 + y*11 + x*7) % 256,
    Cb[t,y,x] = (id + t*3 + y*5 + x) % 256      (half-res coords),
    Cr[t,y,x] = (id*2 + t + y + x*3) % 256      (half-res coords) —
    encoded through :func:`encode_y4m` inside mapInPandas.
    SQL-replayable, like the BMP/WAV/netCDF fixtures."""

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h, nf = (d % 8 + 2) * 2, (d % 6 + 2) * 2, d % 5 + 2
                t, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
                y = ((d * 17 + t * 29 + yy * 11 + xx * 7) % 256).astype(np.uint8)
                t, yc, xc = np.mgrid[0:nf, 0: h // 2, 0: w // 2]
                cb = ((d + t * 3 + yc * 5 + xc) % 256).astype(np.uint8)
                cr = ((d * 2 + t + yc + xc * 3) % 256).astype(np.uint8)
                payloads.append(encode_y4m(y, cb, cr, fps=(25, 1)))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


#: output schema of the real video frame-stats extractor
VIDEO_STATS_SCHEMA = (
    "doc_id bigint, frame_idx bigint, t_offset_ms bigint, n_bytes bigint, "
    "width int, height int, y_sum bigint, cb_sum bigint, cr_sum bigint"
)


def decode_video_stats(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL video decode via the pure-numpy Y4M codec: one row per
    decoded frame with dims from the parsed stream header,
    ``t_offset_ms`` from the header's fps fraction, and exact per-plane
    byte sums (``y_sum``/``cb_sum``/``cr_sum``) attesting the planar
    layout bit-exactly. Non-Y4M payloads raise ``NotImplementedError``
    at the codec plug-in point (compressed video needs ffmpeg)."""

    def extract(batches):
        import numpy as np
        import pandas as pd

        cols = (
            "doc_id", "frame_idx", "t_offset_ms", "n_bytes", "width",
            "height", "y_sum", "cb_sum", "cr_sum",
        )
        for pdf in batches:
            rows = {k: [] for k in cols}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if not data.startswith(Y4M_MAGIC):
                    raise NotImplementedError(
                        "real decode beyond YUV4MPEG2 requires ffmpeg; "
                        "not in container"
                    )
                meta, frames = decode_y4m(data)
                for i, (y, cb, cr) in enumerate(frames):
                    rows["doc_id"].append(int(did))
                    rows["frame_idx"].append(i)
                    rows["t_offset_ms"].append(
                        i * 1000 * meta["fps_den"] // meta["fps_num"]
                    )
                    rows["n_bytes"].append(len(data))
                    rows["width"].append(meta["width"])
                    rows["height"].append(meta["height"])
                    rows["y_sum"].append(int(y.sum(dtype=np.int64)))
                    rows["cb_sum"].append(int(cb.sum(dtype=np.int64)))
                    rows["cr_sum"].append(int(cr.sum(dtype=np.int64)))
            yield pd.DataFrame(rows)

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        extract, schema=VIDEO_STATS_SCHEMA
    )


#: output schema of the video frame sampler
FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, frame_idx bigint, t_offset_ms bigint, frame_md5 string"
)


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload", every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling over binary payloads via ``mapInPandas`` —
    the 1-row → N-frame-rows expansion an ffmpeg stage performs.

    ``fake=True`` derives a deterministic duration from the byte length
    (duration_ms = n_bytes·7 mod 30000) and emits one row per sampled
    frame at ``every_ms`` intervals, with an md5 frame fingerprint of
    (payload hex, frame index) — the oracle-friendly stand-in for
    compressed formats whose decoders are not in this container.
    ``fake=False`` decodes FOR REAL through the pure-numpy Y4M codec:
    the clip's duration comes from the parsed frame count and fps, the
    sampled ``frame_idx`` is the frame covering each ``every_ms`` tick,
    and ``frame_md5`` fingerprints the frame's ACTUAL planar bytes
    (Y+Cb+Cr hex) — any plane-layout bug changes it. Non-Y4M payloads
    raise ``NotImplementedError`` at the ffmpeg plug-in point. The Spark
    plumbing — Arrow batches in, multi-row batches out, no driver
    collect — is the real production shape on both paths.
    """

    def expand(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "t_offset_ms": [], "frame_md5": []}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    data = bytes(payload)
                    if not data.startswith(Y4M_MAGIC):
                        raise NotImplementedError(
                            "real frame decode beyond YUV4MPEG2 requires "
                            "ffmpeg; not in container"
                        )
                    meta, frames = decode_y4m(data)
                    # exact integer arithmetic: float period math selects
                    # the wrong frame at exact tick boundaries (e.g. F15:1
                    # at t=1000 ms rounds to frame 14 instead of 15)
                    num, den = meta["fps_num"], meta["fps_den"]
                    duration_ms = (len(frames) - 1) * 1000 * den // num
                    for t in range(0, duration_ms + 1, every_ms):
                        idx = min(t * num // (1000 * den), len(frames) - 1)
                        y, cb, cr = frames[idx]
                        raw = y.tobytes() + cb.tobytes() + cr.tobytes()
                        out["doc_id"].append(int(did))
                        out["frame_idx"].append(idx)
                        out["t_offset_ms"].append(t)
                        out["frame_md5"].append(
                            hashlib.md5(raw.hex().upper().encode()).hexdigest()
                        )
                    continue
                duration_ms = (len(payload) * 7) % 30000
                hexed = payload.hex().upper()
                for i, t in enumerate(range(0, duration_ms + 1, every_ms)):
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(i)
                    out["t_offset_ms"].append(t)
                    out["frame_md5"].append(
                        hashlib.md5(f"{hexed}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        expand, schema=FRAME_SAMPLE_SCHEMA
    )


#: output schema of the real image resize stage
RESIZE_STATS_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, out_w int, out_h int, "
    "pixel_sum bigint"
)


def resize_image_features(df: DataFrame, out_w: int, out_h: int,
                          id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """REAL image resize (nearest neighbor) over decoded BMP payloads —
    the transform stage of an image pipeline (decode → resize →
    featurize), Arrow-batched, no driver collect. Nearest-neighbor uses
    the floor index map ``src = out_idx * src_dim // out_dim`` (pure
    integers, so the oracle can replay WHICH source pixel each output
    pixel takes and therefore the exact resized pixel sum). Non-BMP
    payloads raise at the PIL plug-in point."""

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "src_w", "src_h", "out_w", "out_h", "pixel_sum",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_any_image(bytes(payload))
                h, w = img.shape[:2]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = img[ys][:, xs]
                rows["doc_id"].append(int(did))
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["pixel_sum"].append(int(resized.sum(dtype=np.int64)))
            yield pd.DataFrame(rows)

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        extract, schema=RESIZE_STATS_SCHEMA
    )


#: output schema of the real audio decimation stage
DECIMATE_STATS_SCHEMA = (
    "doc_id bigint, sample_rate int, out_rate int, n_frames bigint, "
    "n_out_frames bigint, amp_sum bigint"
)


def decimate_audio_stats(df: DataFrame, factor: int,
                         id_col: str = "doc_id",
                         payload_col: str = "payload") -> DataFrame:
    """REAL audio downsampling by integer decimation (keep every
    ``factor``-th frame, starting at frame 0) over decoded PCM16 WAV —
    the rate-reduction stage of an audio pipeline. Plain decimation
    (no anti-alias filter: that is a DSP-library concern at the ffmpeg
    plug-in point); frame selection is pure index arithmetic, so the
    oracle replays the kept frames' exact sample sum. Output rate is
    ``sample_rate // factor``."""

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "out_rate", "n_frames",
                "n_out_frames", "amp_sum",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                head = data[:12]
                if not (head[:4] == b"RIFF" and head[8:12] == b"WAVE"):
                    raise NotImplementedError(
                        "real decimation beyond WAV (PCM16 / G.711 / IMA "
                        "ADPCM) requires ffmpeg; not in container"
                    )
                rate, frames = decode_wav(data)
                out = frames[::factor]
                rows["doc_id"].append(int(did))
                rows["sample_rate"].append(rate)
                rows["out_rate"].append(rate // factor)
                rows["n_frames"].append(frames.shape[0])
                rows["n_out_frames"].append(out.shape[0])
                rows["amp_sum"].append(int(out.sum(dtype=np.int64)))
            yield pd.DataFrame(rows)

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        extract, schema=DECIMATE_STATS_SCHEMA
    )


def attach_tiff_tiled_palette_payload(df: DataFrame, id_col: str = "doc_id",
                                      out_col: str = "payload") -> DataFrame:
    """Fixture builder for the TIFF TILE + PALETTE arms (round 9,
    TIFF 6.0 Sections 15/23): images sized 18-40 x 14-32 so the 16x16
    tile grid is 2-3 tiles across with real right/bottom edge padding.
    Mode rotates on id%4 so the driver gate attests every new arm:
    0 = PALETTE (16-entry formula ColorMap) + LZW + tiles,
    1 = PALETTE + PackBits + strips (ColorMap sans tiles),
    2 = RGB + tiles + LZW + Predictor 2 (per-TILE-row differencing —
    the arm that distinguishes tile rows from raster rows),
    3 = greyscale + tiles + PackBits + big-endian "MM".
    Palette channels are (17v)%256 / (11v+3)%256 / (7v+5)%256 over
    index v = (x*5 + y*9 + id) % 16 — lossless everywhere, so pixel
    sums are SQL-replayable exactly."""

    def build(batches):
        import numpy as np
        import pandas as pd

        from modeltracking_spark.operators.tiff import encode_tiff

        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = d % 23 + 18, d % 19 + 14
                y, x = np.mgrid[0:h, 0:w]
                mode = d % 4
                if mode in (0, 1):
                    idx = ((x * 5 + y * 9 + d) % 16).astype(np.uint8)
                    v = np.arange(16)
                    pal = np.stack(
                        [(17 * v) % 256, (11 * v + 3) % 256,
                         (7 * v + 5) % 256],
                        axis=1,
                    ).astype(np.uint8)
                    if mode == 0:
                        b = encode_tiff(idx, compression=5, palette=pal,
                                        tile=(16, 16))
                    else:
                        b = encode_tiff(idx, compression=32773,
                                        palette=pal, rows_per_strip=5)
                elif mode == 2:
                    img = np.stack(
                        [((x * 7 + y * 13 + d + c * 29) % 256)
                         for c in range(3)],
                        axis=2,
                    ).astype(np.uint8)
                    b = encode_tiff(img, compression=5, predictor=2,
                                    tile=(16, 16))
                else:
                    img = ((x * 3 + y * 11 + d) % 256).astype(np.uint8)
                    b = encode_tiff(img, compression=32773,
                                    big_endian=True, tile=(16, 32))
                payloads.append(b)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: payloads})

    return widen_for_kernel(df.select(id_col)).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


def sobel_edge_stats(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Sobel edge statistics over decoded images — the edge-density
    signal multimodal curation pipelines use to drop blank/flat
    frames: decode the BMP payload, grey = (R+G+B) DIV 3, convolve
    the 3x3 Sobel pair over INTERIOR pixels (all integer arithmetic),
    emit sum(|gx|+|gy|) and the e6-scaled per-pixel density. One
    Arrow mapInPandas kernel, shuffle-free (widened when under-split).
    Output: (id, width, height, edge_sum, n_interior, edge_density_e6).
    """
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    from modeltracking_spark.operators.kernel import widen_for_kernel

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("edge_sum", LongType()),
            StructField("n_interior", LongType()),
            StructField("edge_density_e6", LongType()),
        ]
    )

    def kernel(batches):
        import math

        import pandas as pd

        for pdf in batches:
            ids, ws, hs, sums, nins, dens = [], [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_bmp(bytes(payload)).astype(np.int64)
                h, w = img.shape[:2]
                g = img.sum(axis=2) // 3  # (R+G+B) DIV 3, exact ints
                if h >= 3 and w >= 3:
                    # Sobel via shifted slices — weights dx*(2-|dy|)
                    gx = (
                        (g[0:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                        - (g[0:-2, 0:-2] + 2 * g[1:-1, 0:-2] + g[2:, 0:-2])
                    )
                    gy = (
                        (g[2:, 0:-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                        - (g[0:-2, 0:-2] + 2 * g[0:-2, 1:-1] + g[0:-2, 2:])
                    )
                    edge = int(np.abs(gx).sum() + np.abs(gy).sum())
                    n_int = (h - 2) * (w - 2)
                else:
                    edge, n_int = 0, 0
                ids.append(int(did))
                ws.append(w)
                hs.append(h)
                sums.append(edge)
                nins.append(n_int)
                dens.append(
                    math.floor(float(edge) / float(n_int) * 1e6 + 0.5)
                    if n_int else 0
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "edge_sum": sums,
                    "n_interior": nins,
                    "edge_density_e6": dens,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        kernel, schema
    )


def audio_activity_stats(df: DataFrame, id_col: str = "doc_id",
                         payload_col: str = "payload",
                         quiet_threshold: int = 512) -> DataFrame:
    """Audio activity statistics over decoded WAV — the
    silence/voicing signal audio curation drops dead air with: decode
    the payload, count ZERO CROSSINGS on channel 0 (strict sign flip:
    s[i-1]*s[i] < 0, zeros break runs without counting — the standard
    integer-exact definition) and QUIET frames (max |s| across
    channels below the threshold), plus the total int64 energy. One
    Arrow mapInPandas kernel, shuffle-free (widened when under-split).
    Output: (id, n_frames, n_zero_cross, n_quiet, energy_sum)."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    from modeltracking_spark.operators.kernel import widen_for_kernel

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_frames", LongType()),
            StructField("n_zero_cross", LongType()),
            StructField("n_quiet", LongType()),
            StructField("energy_sum", LongType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, nfs, zcs, nqs, ens = [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                _rate, pcm = decode_wav(bytes(payload))
                s = pcm.astype(np.int64)
                c0 = s[:, 0]
                zc = int(((c0[:-1] * c0[1:]) < 0).sum())
                quiet = int((np.abs(s).max(axis=1)
                             < quiet_threshold).sum())
                ids.append(int(did))
                nfs.append(s.shape[0])
                zcs.append(zc)
                nqs.append(quiet)
                ens.append(int((s * s).sum()))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_frames": nfs,
                    "n_zero_cross": zcs,
                    "n_quiet": nqs,
                    "energy_sum": ens,
                }
            )

    return widen_for_kernel(df.select(id_col, payload_col)).mapInPandas(
        kernel, schema
    )
