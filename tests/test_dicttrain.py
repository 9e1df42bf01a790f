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
