"""Distributed COVER-style zstd dictionary training: determinism,
plan shape, and the only claim that matters — the trained dictionary
BEATS both no dictionary and a naive head-sample dictionary on total
compressed size over held-out documents (compressed by libzstd, the
reference implementation)."""

import pytest

from modeltracking_spark.operators.dicttrain import (
    gram_stats,
    train_content_dictionary,
)

SF001 = "/root/testdata/sf0.001"


def _libzstd():
    try:
        import ctypes
        import ctypes.util

        lib = ctypes.CDLL(ctypes.util.find_library("zstd"))
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_createCCtx.restype = ctypes.c_void_p
        lib.ZSTD_compress_usingDict.restype = ctypes.c_size_t
        lib.ZSTD_compress_usingDict.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.c_int]
        lib.ZSTD_isError.restype = ctypes.c_uint
        return lib
    except Exception:
        return None


def test_training_is_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    d1 = train_content_dictionary(docs, sample_mod=2)
    d2 = train_content_dictionary(docs.repartition(7), sample_mod=2)
    assert d1 == d2 and 0 < len(d1) <= 4096


def test_gram_stats_counts_hand_case(spark):
    docs = spark.createDataFrame(
        [(0, "abcabcab"), (1, "abcd")], "doc_id long, text string"
    )
    rows = {
        r["g"]: r["cnt"]
        for r in gram_stats(docs, gram=3, stride=1).collect()
    }
    # 'abc' appears at offsets 0,3 of doc0 and 0 of doc1
    assert rows["abc"] == 3
    assert rows["bca"] == 2
    assert rows["bcd"] == 1


def test_trained_dict_beats_none_and_naive(spark):
    lib = _libzstd()
    if lib is None:
        pytest.skip("libzstd absent")
    import ctypes

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    d = train_content_dictionary(docs, sample_mod=4)
    rows = docs.orderBy("doc_id").limit(200).collect()
    heldout = [r["text"].encode() for r in rows if int(r["doc_id"]) % 4]
    cctx = lib.ZSTD_createCCtx()

    def csize(raw, dct):
        bound = lib.ZSTD_compressBound(len(raw))
        buf = ctypes.create_string_buffer(bound)
        n = lib.ZSTD_compress_usingDict(
            cctx, buf, bound, raw, len(raw), dct, len(dct), 3)
        assert not lib.ZSTD_isError(n)
        return n

    tot_none = sum(csize(t, b"") for t in heldout)
    tot_dict = sum(csize(t, d) for t in heldout)
    naive = b"".join(heldout[:4])[:len(d)]
    tot_naive = sum(csize(t, naive) for t in heldout)
    assert tot_dict < tot_none, (tot_dict, tot_none)
    assert tot_dict < tot_naive, (tot_dict, tot_naive)


def test_from_spec_codec_roundtrips_with_trained_dict(spark):
    from modeltracking_spark.operators.zstd import (
        zstd_compress,
        zstd_decompress,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    d = train_content_dictionary(docs, sample_mod=4, max_bytes=1024)
    for r in docs.limit(10).collect():
        raw = r["text"].encode()
        blob = zstd_compress(raw, dictionary=d)
        assert zstd_decompress(blob, dictionary=d) == raw
        assert len(blob) <= len(zstd_compress(raw))


def test_training_plan_shape(spark):
    from modeltracking_spark.plans import executed_plan

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    stats = gram_stats(docs, sample_mod=2)
    plan = executed_plan(stats)
    assert "CartesianProduct" not in plan
    # one hash aggregation with a map-side partial (two HashAggregate
    # levels around one exchange)
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_structured_trained_dictionary_consumed_by_libzstd(spark):
    """The full §5 loop: the cluster TRAINS the content, the engine
    WRITES the structured dictionary (magic, CRC dict-ID, Huffman
    table from content stats via FSE-compressed weights, explicit
    predefined FSE descriptions, offset history), libzstd and the
    zstd CLI CONSUME it, and both decoders roundtrip its frames."""
    import ctypes
    import subprocess

    from modeltracking_spark.operators.dicttrain import (
        train_structured_dictionary,
    )
    from modeltracking_spark.operators.zstd import (
        zstd_decompress,
        zstd_parse_dictionary,
    )

    lib = _libzstd()
    if lib is None:
        pytest.skip("libzstd absent")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    d = train_structured_dictionary(docs, sample_mod=4, max_bytes=1024)
    parsed = zstd_parse_dictionary(d)
    assert parsed.dict_id != 0 and parsed.huf_table is not None
    assert parsed.rep == [1, 4, 8] and len(parsed.content) >= 8
    # identical retraining -> identical artifact
    assert d == train_structured_dictionary(docs.repartition(5),
                                            sample_mod=4, max_bytes=1024)

    lib.ZSTD_createDCtx.restype = ctypes.c_void_p
    lib.ZSTD_decompress_usingDict.restype = ctypes.c_size_t
    lib.ZSTD_decompress_usingDict.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t]
    cctx = lib.ZSTD_createCCtx()
    dctx = lib.ZSTD_createDCtx()
    payload = docs.orderBy("doc_id").limit(3).collect()[1]["text"].encode()
    for level in (1, 3, 19):
        bound = lib.ZSTD_compressBound(len(payload))
        buf = ctypes.create_string_buffer(bound)
        n = lib.ZSTD_compress_usingDict(
            cctx, buf, bound, payload, len(payload), d, len(d), level)
        assert not lib.ZSTD_isError(n), "libzstd rejected the trained dict"
        out = ctypes.create_string_buffer(max(len(payload), 1))
        m = lib.ZSTD_decompress_usingDict(
            dctx, out, len(payload), buf.raw[:n], n, d, len(d))
        assert not lib.ZSTD_isError(m) and out.raw[:m] == payload
        assert zstd_decompress(buf.raw[:n], dictionary=d) == payload
    # the CLI consumes it too
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        dp, pp = f"{td}/dict", f"{td}/p"
        open(dp, "wb").write(d)
        open(pp, "wb").write(payload)
        enc = subprocess.run(
            ["/root/miniconda/bin/zstd", "-D", dp, "-c", pp],
            capture_output=True)
        if enc.returncode == 0:
            assert zstd_decompress(enc.stdout, dictionary=d) == payload
