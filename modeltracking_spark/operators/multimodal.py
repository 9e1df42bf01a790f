"""Multimodal (binary) column plumbing (extension surface; SURVEY.md
§2.12): images/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio decode libraries, so compressed-format
decode is STUBBED: :func:`decode_image_features` with ``fake=True``
(default) derives deterministic pseudo-features from the payload bytes —
the Spark plumbing (schema, batch shape, Arrow transfer, partition
mapping) is real and tested. With ``fake=False`` the engine decodes FOR
REAL any payload in the uncompressed 24-bit BMP format via the
pure-numpy codec below (written from the public Windows BITMAPINFOHEADER
spec, the same from-spec playbook as ``sources/netcdf_classic.py``);
other formats raise ``NotImplementedError`` at the exact point a
PIL/ffmpeg decoder would plug in.
"""

from __future__ import annotations

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


def decode_wav(data: bytes):
    """PCM16 WAV bytes -> (sample_rate, (n_frames, n_channels) int16).

    Raises ``ValueError`` with a descriptive message for non-RIFF/WAVE
    payloads, non-PCM16 encodings, or truncated data chunks."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    rate = n_ch = None
    frames = None
    while off + 8 <= end:
        cid, csize = data[off : off + 4], struct.unpack_from("<I", data, off + 4)[0]
        body_off = off + 8
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError(f"fmt chunk too small ({csize} bytes)")
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body_off
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding: format={audio_fmt} bits={bits} "
                    "(only PCM 16-bit is implemented)"
                )
        elif cid == b"data":
            if n_ch is None:
                raise ValueError("data chunk before fmt chunk")
            if body_off + csize > len(data):
                raise ValueError(
                    f"truncated WAV data chunk: need {csize} bytes at offset "
                    f"{body_off}, file has {len(data) - body_off}"
                )
            frames = np.frombuffer(
                data, dtype="<i2", count=csize // 2, offset=body_off
            ).reshape(-1, n_ch)
        off = body_off + csize + (csize & 1)  # chunks are word-aligned
    if rate is None or frames is None:
        raise ValueError("missing fmt or data chunk")
    return rate, frames


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
    ``fake=False``: REAL decode through the pure-numpy BMP codec above —
    width/height/channels read from the actual header, ``pixel_sum`` the
    sum of every decoded RGB byte (any header or pixel-layout bug shifts
    it). Non-BMP payloads raise ``NotImplementedError`` where a
    PIL/ffmpeg decoder would plug in.
    """

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            if not fake:
                w, h, c, s = [], [], [], []
                for payload in pdf[payload_col]:
                    if not payload.startswith(b"BM"):
                        raise NotImplementedError(
                            "real decode beyond uncompressed 24-bit BMP "
                            "requires PIL/ffmpeg; not in container"
                        )
                    img = decode_bmp(bytes(payload))
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

    return df.select(id_col, payload_col).mapInPandas(
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

    return df.select(id_col).mapInPandas(
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

    return df.select(id_col).mapInPandas(
        build, schema=f"{id_col} bigint, {out_col} binary"
    )


#: output schema of the real audio stats extractor
AUDIO_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sample_rate int, n_channels int, "
    "n_frames bigint, amp_sum bigint, peak int"
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
                        "real decode beyond PCM16 WAV requires ffmpeg; "
                        "not in container"
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

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=AUDIO_STATS_SCHEMA
    )


#: output schema of the (stubbed) video frame sampler
FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, frame_idx bigint, t_offset_ms bigint, frame_md5 string"
)


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload", every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling over binary payloads via ``mapInPandas`` —
    the 1-row → N-frame-rows expansion a real ffmpeg stage performs,
    with the decode STUBBED (no av libs in this container).

    ``fake=True`` derives a deterministic duration from the byte length
    (duration_ms = n_bytes·7 mod 30000) and emits one row per sampled
    frame at ``every_ms`` intervals, with an md5 frame fingerprint of
    (payload hex, frame index). ``fake=False`` raises
    ``NotImplementedError`` where ffmpeg would seek/decode. The Spark
    plumbing — Arrow batches in, multi-row batches out, no driver
    collect — is the real production shape.
    """

    def expand(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame decode requires ffmpeg; not in container"
                )
            out = {"doc_id": [], "frame_idx": [], "t_offset_ms": [], "frame_md5": []}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
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

    return df.select(id_col, payload_col).mapInPandas(
        expand, schema=FRAME_SAMPLE_SCHEMA
    )
