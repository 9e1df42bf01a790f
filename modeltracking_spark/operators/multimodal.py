"""Multimodal (binary) column plumbing (extension surface; SURVEY.md
§2.12): images/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio decode libraries, so the decode step is
STUBBED: :func:`decode_image_features` with ``fake=True`` (default)
derives deterministic pseudo-features from the payload bytes — the Spark
plumbing (schema, batch shape, Arrow transfer, partition mapping) is
real and tested; with ``fake=False`` it raises ``NotImplementedError``
at the exact point a real decoder (PIL/ffmpeg) would plug in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic prefixes for the cheap format sniff (hex, uppercase)
MAGIC_PREFIXES = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",
}


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


#: output schema of the (stubbed) image feature extractor
IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_channels int"
)


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload",
                          fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the shape a real image decode/resize/embed stage
    takes at scale (per-partition pandas batches, no driver collect).

    ``fake=True``: deterministic pseudo-features from byte length (the
    decode libraries are not in this container). ``fake=False``: raises
    ``NotImplementedError`` where PIL/torchvision would decode.
    """

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg; not in container"
                )
            n = pdf[payload_col].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n,
                    "width": (n % 64 + 1).astype("int32"),
                    "height": (n % 48 + 1).astype("int32"),
                    "n_channels": ((n % 2) * 2 + 1).astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
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
