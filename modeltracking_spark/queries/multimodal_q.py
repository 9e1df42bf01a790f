"""Multimodal binary-column queries (SURVEY.md §2.12): metadata off an
opaque binary payload (oracled — the payload is deterministically built
from ``documents.text`` in both engines), and the Arrow-batched
pseudo-decode whose byte-length-derived features the oracle reproduces
with ``octet_length`` arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from modeltracking_spark.operators.multimodal import (
    attach_binary_payload,
    binary_metadata,
    decode_image_features,
    sample_frames,
)
from modeltracking_spark.queries.common import T, query

_PAYLOAD = r"('\x89\x50\x4E\x47'::BLOB || encode(text))"


@query(
    "binary_metadata_docs",
    oracle=f"""
    SELECT doc_id,
           octet_length({_PAYLOAD})::BIGINT AS n_bytes,
           CASE WHEN substr(upper(hex({_PAYLOAD})), 1, 8) = '89504E47'
                THEN 'png'
                WHEN substr(upper(hex({_PAYLOAD})), 1, 6) = 'FFD8FF' THEN 'jpeg'
                ELSE 'unknown' END AS format,
           md5(upper(hex({_PAYLOAD}))) AS payload_md5
    FROM documents
    """,
)
def binary_metadata_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column + typed metadata (byte length, magic-byte
    format sniff, digest) — all JVM expressions over a binary fixture
    built from the documents table."""
    d = attach_binary_payload(T(spark, sf_dir, "documents"))
    return binary_metadata(d).select("doc_id", "n_bytes", "format", "payload_md5")


@query(
    "image_features_fake_decode",
    oracle=f"""
    SELECT doc_id,
           octet_length({_PAYLOAD})::BIGINT AS n_bytes,
           (octet_length({_PAYLOAD}) % 64 + 1)::INTEGER AS width,
           (octet_length({_PAYLOAD}) % 48 + 1)::INTEGER AS height,
           ((octet_length({_PAYLOAD}) % 2) * 2 + 1)::INTEGER AS n_channels
    FROM documents
    """,
)
def image_features_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode stage (Arrow batches, real plumbing, stub
    decode): deterministic pseudo-features from payload bytes, so even the
    Python-side stage is oracle-checkable."""
    d = attach_binary_payload(T(spark, sf_dir, "documents"))
    return decode_image_features(d, fake=True)


@query(
    "frame_sample_fake_decode",
    oracle=f"""
    WITH v AS (
      SELECT doc_id,
             upper(hex({_PAYLOAD})) AS hexed,
             (octet_length({_PAYLOAD}) * 7) % 30000 AS duration_ms
      FROM documents
    )
    SELECT doc_id,
           i.i AS frame_idx,
           i.i * 1000 AS t_offset_ms,
           md5(hexed || ':' || i.i::VARCHAR) AS frame_md5
    FROM v, unnest(range(0, duration_ms // 1000 + 1)) AS i(i)
    """,
)
def frame_sample_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1 row -> N frame rows) through mapInPandas —
    the multi-row Arrow expansion a real ffmpeg stage performs, decode
    stubbed deterministically so even the Python stage is oracled."""
    d = attach_binary_payload(T(spark, sf_dir, "documents"))
    return sample_frames(d, every_ms=1000, fake=True)
