"""Corpus-statistics operator tests (operators/corpus.py): heavy-hitter
exactness under real sketch eviction, chunk coverage arithmetic, PMI
hand-values, quantization properties, TF-IDF ranking."""

import math

import pyspark.sql.functions as F

from modeltracking_spark.operators.corpus import (
    bigram_pmi,
    chunk_documents,
    heavy_hitters,
    quantize_embeddings_int8,
    tfidf_top_terms,
)


def test_heavy_hitters_exact_on_zipf_with_eviction(spark):
    # 400 distinct keys, zipf-ish counts — far more than sketch_k=64, so
    # the Misra-Gries eviction path actually runs; the verify pass must
    # still produce the EXACT heavy-hitter set
    rows = []
    for i in range(400):
        rows.extend([(f"k{i:03d}",)] * max(2000 // (i + 1), 1))
    df = spark.createDataFrame(rows, ["key"]).repartition(8)
    got = {
        (r["key"], r["cnt"])
        for r in heavy_hitters(df, "key", phi_denom=50, sketch_k=64).collect()
    }
    n = len(rows)
    exact = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * 50 > F.lit(n))
        .collect()
    }
    assert got == exact and len(exact) > 0


def test_heavy_hitters_rejects_undersized_sketch(spark):
    df = spark.createDataFrame([("a",)], ["key"])
    try:
        heavy_hitters(df, "key", phi_denom=100, sketch_k=10)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_chunks_cover_document(spark):
    size, overlap, stride = 80, 16, 64
    texts = [
        (1, "x" * 10),          # shorter than overlap: single chunk
        (2, "".join(chr(97 + i % 26) for i in range(200))),
        (3, "".join(chr(65 + i % 26) for i in range(144))),  # exact 2nd boundary
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = chunk_documents(df, size=size, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in texts:
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        # each chunk is the substring at its (1-based) start offset
        for r in chunks:
            s = r["start"] - 1
            assert r["chunk_text"] == text[s : s + size]
            assert r["chunk_len"] == len(r["chunk_text"])
        # strides of the non-final chunks + final chunk reconstruct the doc
        rebuilt = "".join(c["chunk_text"][:stride] for c in chunks[:-1])
        rebuilt += chunks[-1]["chunk_text"]
        assert rebuilt == text
    assert len(by_doc[1]) == 1


def test_bigram_pmi_hand_values(spark):
    # corpus: "a b" x3, "c" (no bigram), "" (no tokens)
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "c"), (5, "")],
        ["doc_id", "text"],
    )
    out = bigram_pmi(df, min_count=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["x"], r["y"], r["c_xy"]) == ("a", "b", 3)
    # unigrams: a=3, b=3, c=1 -> t_uni=7; bigrams: (a,b)=3 -> t_bi=3
    pmi = math.log((3 / 3) / ((3 / 7) * (3 / 7)))
    assert r["pmi_e6"] == math.floor(pmi * 1e6 + 0.5)


def test_quantize_int8_properties(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0, 3.0]), (2, [5.0, 5.0, 5.0])],
        ["vec_id", "embedding"],
    )
    rows = quantize_embeddings_int8(df).collect()
    q1 = {r["i"]: r["q"] for r in rows if r["vec_id"] == 1}
    q2 = {r["i"]: r["q"] for r in rows if r["vec_id"] == 2}
    # min -> -128, max -> 127, interior points affine
    assert q1[1] == -128 and q1[4] == 127
    assert q2 == {1: 0, 2: 0, 3: 0}  # constant vector -> all zeros
    # dequantization error bounded by half a quantization step
    mn, mx = 0.0, 3.0
    scale = (mx - mn) / 255
    for i, v in enumerate([0.0, 1.0, 2.0, 3.0], start=1):
        deq = (q1[i] + 128) * scale + mn
        assert abs(deq - v) <= scale / 2 + 1e-12


def test_tfidf_ranks_rare_terms_first(spark):
    df = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common common common"),
            (3, "common other other"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, k=2)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["rk"]))
    # doc 1: 'rare' (df=1) must outrank 'common' (df=3)
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert d1[0]["tok"] == "rare" and d1[1]["tok"] == "common"
    # hand value: tf=1/3, idf=ln(4/2)
    exp = math.floor((1 / 3) * math.log(4 / 2) * 1e6 + 0.5)
    assert d1[0]["tfidf_e6"] == exp
    # every doc emits at most k rows with contiguous ranks
    for doc in (1, 2, 3):
        rks = [r["rk"] for r in rows if r["doc_id"] == doc]
        assert rks == list(range(1, len(rks) + 1)) and len(rks) <= 2
