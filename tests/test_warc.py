"""WARC 1.0 container: framing roundtrips, member splitting via the
from-spec gzip walk, case-insensitive headers, Content-Length framing,
and loud malformed rejects — the codec-tier discipline applied to the
crawl-archive format."""

import gzip

import pytest

from modeltracking_spark.operators.warc import (
    build_warc_gz_fixture,
    parse_warc,
    parse_warc_gz,
    parse_warc_record,
    warc_record_bytes,
)

_DATE = "2024-01-01T00:00:00Z"


def _rec(body=b"hello", rtype="response", **kw):
    return warc_record_bytes(rtype, "x-1", _DATE, body, **kw)


def test_record_roundtrip_fields_and_framing():
    raw = _rec(b"body bytes", target_uri="http://a/b",
               extra={"WARC-Payload-Digest": "sha1:ABC"})
    rec, end = parse_warc_record(raw)
    assert end == len(raw)
    assert rec["warc-type"] == "response"
    assert rec["warc-record-id"] == "<urn:uuid:x-1>"
    assert rec["warc-date"] == _DATE
    assert rec["warc-target-uri"] == "http://a/b"
    assert rec["warc-payload-digest"] == "sha1:ABC"
    assert rec["body"] == b"body bytes"


def test_multi_record_stream_and_binary_bodies():
    # bodies may contain CRLFs and fake header lines: only
    # Content-Length framing may delimit them
    tricky = b"\r\n\r\nWARC/1.0\r\nContent-Length: 9999\r\n\r\n" + bytes(
        range(256)
    )
    raw = _rec(b"") + _rec(tricky) + _rec(b"z" * 10000)
    recs = parse_warc(raw)
    assert [r["body"] for r in recs] == [b"", tricky, b"z" * 10000]


def test_header_case_insensitivity():
    raw = _rec(b"x")
    raw = raw.replace(b"Content-Length:", b"cOnTeNt-LeNgTh:")
    assert parse_warc(raw)[0]["body"] == b"x"


def test_gz_member_per_record_layout():
    blob = build_warc_gz_fixture(7, "seven " * 50)
    recs = parse_warc_gz(blob)
    assert [r["warc-type"] for r in recs] == [
        "warcinfo", "request", "response"
    ]
    assert recs[2]["body"].decode() == "seven " * 50
    assert recs[2]["warc-target-uri"] == "http://corpus.example/doc/7"
    # one member may also hold SEVERAL records (spec allows it)
    two_in_one = gzip.compress(_rec(b"a") + _rec(b"bb"), 6)
    assert [r["body"] for r in parse_warc_gz(two_in_one)] == [b"a", b"bb"]


def test_rejects():
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"WARC/0.9\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n")
    # missing a mandatory field
    raw = _rec(b"x").replace(b"WARC-Date: " + _DATE.encode() + b"\r\n", b"")
    with pytest.raises(ValueError, match="warc-date"):
        parse_warc(raw)
    # body shorter than Content-Length
    raw = _rec(b"0123456789")
    with pytest.raises(ValueError, match="shorter than Content-Length"):
        parse_warc(raw[:-6])
    # record terminator missing
    raw2 = bytearray(_rec(b"0123456789"))
    raw2[-2] = ord("!")
    with pytest.raises(ValueError, match="terminator"):
        parse_warc(bytes(raw2))
    # malformed header line
    bad = _rec(b"x").replace(b"Content-Type: text/plain",
                             b"Content-Type text/plain")
    with pytest.raises(ValueError, match="malformed"):
        parse_warc(bad)
    # corrupt gzip member fails in the RFC 1952 layer
    blob = bytearray(build_warc_gz_fixture(1, "abc"))
    blob[-5] ^= 0xFF
    with pytest.raises(ValueError):
        parse_warc_gz(bytes(blob))


def test_spark_scan_kernel(spark):
    import hashlib

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from modeltracking_spark.operators.warc import warc_scan_stats

    rows = [(i, build_warc_gz_fixture(i, f"doc {i} body " * (i + 1)))
            for i in range(6)]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows],
        StructType([StructField("doc_id", LongType()),
                    StructField("payload", BinaryType())]),
    )
    got = {r["doc_id"]: r for r in warc_scan_stats(df).collect()}
    for i, _ in rows:
        body = (f"doc {i} body " * (i + 1)).encode()
        r = got[i]
        assert (r["n_records"], r["n_members"]) == (3, 3)
        assert r["response_len"] == len(body)
        assert r["body_md5"] == hashlib.md5(body).hexdigest()
        assert r["uri_ok"]


def test_warc_datasource_partitions_and_pruning(spark, tmp_path):
    """One InputPartition per shard file; record_type option prunes
    inside the reader; bodies survive byte-exact."""
    import hashlib

    from pyspark.errors import PySparkException

    from modeltracking_spark.sources.warc_source import WarcDataSource

    for s in range(3):
        blobs = [
            build_warc_gz_fixture(s * 10 + i, f"shard {s} doc {i} " * 5)
            for i in range(4)
        ]
        (tmp_path / f"shard-{s}.warc.gz").write_bytes(b"".join(blobs))
    try:
        spark.dataSource.register(WarcDataSource)
    except PySparkException:
        pass
    back = (
        spark.read.format("warc")
        .option("path", str(tmp_path))
        .option("record_type", "response")
        .load()
    )
    rows = back.collect()
    assert len(rows) == 12  # 3 shards x 4 docs, responses only
    assert {r["warc_type"] for r in rows} == {"response"}
    assert back.rdd.getNumPartitions() == 3  # one per shard file
    for r in rows:
        s, i = divmod(int(r["target_uri"].rsplit("/", 1)[1]), 10)
        body = (f"shard {s} doc {i} " * 5).encode()
        assert bytes(r["body"]) == body
        assert r["content_length"] == len(body)
    # without pruning every record type appears
    all_types = (
        spark.read.format("warc").option("path", str(tmp_path)).load()
    )
    assert all_types.count() == 36
    got_types = {
        r["warc_type"] for r in all_types.select("warc_type").collect()
    }
    assert got_types == {"warcinfo", "request", "response"}
