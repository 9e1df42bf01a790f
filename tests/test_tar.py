"""From-spec ustar walker vs stdlib tarfile (both directions), the
golden shipped .tar.zst through the from-spec zstd decoder, GNU long
names, and loud malformed rejects."""

import io
import os
import tarfile

import pytest

from modeltracking_spark.operators.tar import build_tar, parse_tar


def _stdlib_tar(members, fmt=tarfile.USTAR_FORMAT):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        for name, body in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            ti.mtime = 1700000000
            tf.addfile(ti, io.BytesIO(body))
    return buf.getvalue()


def test_stdlib_written_archives_parse():
    members = [
        ("a/doc1.txt", b"hello tar " * 40),
        ("a/doc2.txt", b"x"),
        ("a/empty.txt", b""),
        ("a/big.bin", bytes(range(256)) * 10),
    ]
    recs = parse_tar(_stdlib_tar(members))
    assert [(r["name"], r["body"]) for r in recs] == members
    assert all(r["mtime"] == 1700000000 for r in recs)
    # body sizes landing exactly on block boundaries
    edge = [("e/a", b"B" * 511), ("e/b", b"B" * 512), ("e/c", b"B" * 513)]
    recs = parse_tar(_stdlib_tar(edge))
    assert [r["size"] for r in recs] == [511, 512, 513]
    assert [r["body"] for r in recs] == [b for _n, b in edge]


def test_our_writer_under_stdlib_and_our_parser():
    blob = build_tar(
        [("bundle-1/x.txt", b"abc", 7), ("bundle-1/y.txt", b"defg" * 200, 9)]
    )
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert tf.getnames() == ["bundle-1/x.txt", "bundle-1/y.txt"]
        assert tf.extractfile("bundle-1/y.txt").read() == b"defg" * 200
    recs = parse_tar(blob)
    assert [(r["name"], r["size"], r["mtime"]) for r in recs] == [
        ("bundle-1/x.txt", 3, 7), ("bundle-1/y.txt", 800, 9),
    ]


def test_gnu_long_names_resolve():
    long_name = "deep/" + "n" * 120 + "/file.txt"
    blob = _stdlib_tar([(long_name, b"body")], fmt=tarfile.GNU_FORMAT)
    recs = parse_tar(blob)
    assert recs[0]["name"] == long_name and recs[0]["body"] == b"body"


def test_golden_shipped_tar_zst():
    from modeltracking_spark.operators.zstd import zstd_decompress

    g = ("/root/miniconda/pkgs/libarchive-3.8.2-h3ec8f01_0/info/recipe/"
         "test-archives/hello_world.tar.zst")
    if not os.path.exists(g):
        pytest.skip("golden archive not present")
    recs = parse_tar(zstd_decompress(open(g, "rb").read()))
    names = [r["name"] for r in recs]
    assert "hello_world/greets" in names
    greets = next(r for r in recs if r["name"] == "hello_world/greets")
    assert greets["size"] == 12 and greets["typeflag"] == "0"
    # stdlib tarfile agrees on the member list
    with tarfile.open(fileobj=io.BytesIO(
            zstd_decompress(open(g, "rb").read()))) as tf:
        assert set(tf.getnames()) == {n.rstrip("/") for n in names}


def test_rejects():
    good = build_tar([("f.txt", b"data", 0)])
    bad = bytearray(good)
    bad[0] ^= 0xFF  # corrupt name -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(bad))
    with pytest.raises(ValueError, match="overruns"):
        parse_tar(good[:512])  # body cut off mid-member
    empty = build_tar([("f.txt", b"", 0)])
    with pytest.raises(ValueError, match="end-of-archive"):
        parse_tar(empty[:512])  # header intact, terminator missing
    bad = bytearray(good)
    bad[124:136] = b"00000077777\x00"  # size beyond archive (checksum fixed)
    hdr = bad[:512]
    hdr[148:156] = b" " * 8
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}\x00 ".encode()
    bad[:512] = hdr
    with pytest.raises(ValueError, match="overruns"):
        parse_tar(bytes(bad))
    # pax headers are implemented since round 10 (see the pax tests
    # below); malformed pax record bodies still reject loudly
    blob = _stdlib_tar([("p" * 150 + ".txt", b"x")],
                       fmt=tarfile.PAX_FORMAT)
    assert parse_tar(blob)[0]["name"] == "p" * 150 + ".txt"


def test_spark_bundle_kernel(spark):
    import hashlib

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from modeltracking_spark.operators.tar import tar_zst_scan_stats
    from modeltracking_spark.operators.zstd import zstd_compress

    rows = []
    for i in range(4):
        text = (f"bundle body {i} " * (i + 3)).encode()
        blob = zstd_compress(build_tar([
            (f"bundle-{i}/part0.txt", text[:5], 0),
            (f"bundle-{i}/part1.txt", text[5:], 0),
            (f"bundle-{i}/meta.json", b"{}", 0),
        ]))
        rows.append((i, bytearray(blob), text))
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in rows],
        StructType([StructField("doc_id", LongType()),
                    StructField("payload", BinaryType())]),
    )
    got = {r["doc_id"]: r for r in tar_zst_scan_stats(df).collect()}
    for i, _, text in rows:
        r = got[i]
        assert r["n_members"] == 3
        assert r["total_bytes"] == len(text) + 2
        assert r["text_md5"] == hashlib.md5(text).hexdigest()
        assert r["names_ok"]


def test_pax_extended_headers_cross_validated():
    """POSIX.1-2001 pax interchange format (round 10, VERDICT r9 item
    7): UTF-8 paths, >100-char names, size overrides, fractional
    mtimes — cross-validated against stdlib tarfile BOTH directions."""
    import io

    from modeltracking_spark.operators.tar import build_tar_pax

    members = [
        ("short.txt", b"hello", 1700000000),
        ("dir/" + "n" * 150 + ".txt", b"long name body", 1700000001),
        ("unicode/日本語.txt", b"utf8 path", 1700000002),
        ("big.txt", b"x" * 5000, 1700000003),
    ]
    # stdlib PAX_FORMAT emits -> we parse (incl. fractional mtime)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as tf:
        for name, body, mt in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            ti.mtime = mt + 0.5
            tf.addfile(ti, io.BytesIO(body))
    got = parse_tar(buf.getvalue())
    assert [(g["name"], g["body"], g["mtime"]) for g in got] == members
    # our pax writer -> stdlib parses AND our parser roundtrips
    blob = build_tar_pax(members)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        for (name, body, _mt), ti in zip(members, tf.getmembers()):
            assert ti.name == name and ti.size == len(body)
            assert tf.extractfile(ti).read() == body
    got2 = parse_tar(blob)
    assert [(g["name"], g["body"]) for g in got2] == [
        (n, b) for n, b, _ in members
    ]
    # global 'g' header applies to subsequent members
    buf3 = io.BytesIO()
    with tarfile.open(fileobj=buf3, mode="w", format=tarfile.PAX_FORMAT,
                      pax_headers={"comment": "global test"}) as tf:
        ti = tarfile.TarInfo("g.txt")
        ti.size = 2
        tf.addfile(ti, io.BytesIO(b"gg"))
    got3 = parse_tar(buf3.getvalue())
    assert got3[0]["name"] == "g.txt" and got3[0]["body"] == b"gg"


def test_pax_malformed_records_reject():
    from modeltracking_spark.operators.tar import (
        _parse_pax_records,
        build_tar_pax,
    )

    with pytest.raises(ValueError, match="length delimiter"):
        _parse_pax_records(b"nolengthhere")
    with pytest.raises(ValueError, match="not decimal"):
        _parse_pax_records(b"xx path=a\n")
    with pytest.raises(ValueError, match="out of range"):
        _parse_pax_records(b"99 path=a\n")
    with pytest.raises(ValueError, match="trailing newline"):
        _parse_pax_records(b"10 path=abc")
    with pytest.raises(ValueError, match="missing '='"):
        _parse_pax_records(b"9 pathab\n")
    # record length arithmetic survives the digit-width boundary
    blob = build_tar_pax([("n" * 95, b"q" * 3, 7)])
    assert parse_tar(blob)[0]["name"] == "n" * 95


def test_pax_size_override_beyond_octal_field():
    """The pax 'size' record is how archives carry members past the
    11-digit octal field; pin the mechanism at small scale: a ustar
    header whose size field says 0 while the pax record names the real
    body length must yield the full body (and the next member must
    still parse from the right offset)."""
    from modeltracking_spark.operators.tar import _pax_record

    body = b"B" * 1500
    pax_body = _pax_record("size", str(len(body)))
    blocks = bytearray()

    def hdr(name, size, flag):
        h = bytearray(512)
        nb = name.encode()
        h[0:len(nb)] = nb
        h[100:108] = b"0000644\x00"
        h[108:116] = b"0000000\x00"
        h[116:124] = b"0000000\x00"
        h[124:136] = f"{size:011o}\x00".encode()
        h[136:148] = f"{0:011o}\x00".encode()
        h[148:156] = b" " * 8
        h[156] = ord(flag)
        h[257:263] = b"ustar\x00"
        h[263:265] = b"00"
        chk = sum(h)
        h[148:156] = f"{chk:06o}\x00 ".encode()
        return bytes(h)

    blocks += hdr("PaxHeaders.0/big", len(pax_body), "x")
    blocks += pax_body + b"\x00" * ((-len(pax_body)) % 512)
    blocks += hdr("big.bin", 0, "0")  # octal field LIES (says zero)
    blocks += body + b"\x00" * ((-len(body)) % 512)
    blocks += hdr("after.txt", 2, "0")
    blocks += b"ok" + b"\x00" * 510
    blocks += b"\x00" * 1024
    members = parse_tar(bytes(blocks))
    assert members[0]["name"] == "big.bin"
    assert members[0]["size"] == 1500 and members[0]["body"] == body
    assert members[1]["name"] == "after.txt" and members[1]["body"] == b"ok"
