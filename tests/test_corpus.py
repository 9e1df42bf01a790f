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


def test_bloom_no_false_negatives_and_detects_planted(spark):
    """Bloom flags must be a SUPERSET of exact hits (one-sided error),
    and a doc sharing a full 5-gram with a benchmark doc must be hit."""
    from modeltracking_spark.operators.corpus import bloom_decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench_text),                                   # benchmark (id%100==0)
        (1, "alpha beta gamma delta epsilon other words"),  # contaminated
        (2, "totally different tokens with no overlap at all"),
        (3, "x1 x2 x3 x4 x5 x6 x7"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = bloom_decontaminate(d, bench_pred=F.col("doc_id") % 100 == 0)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == {1, 2, 3}  # benchmark doc excluded
    for r in got.values():
        assert r["n_bloom_flagged"] >= r["n_exact_hits"]  # no false negatives
        assert r["n_false_pos"] == r["n_bloom_flagged"] - r["n_exact_hits"]
    assert got[1]["n_exact_hits"] >= 1 and got[1]["n_bloom_flagged"] >= 1
    assert got[2]["n_exact_hits"] == 0


def test_unigram_logprob_hand_values(spark):
    """3 docs, tiny vocab: lp(token) = ln(freq/N) e6-floored; per-doc
    sums checked against a hand fold."""
    from modeltracking_spark.operators.corpus import unigram_logprob

    rows = [(0, "a a b"), (1, "a b"), (2, "c")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in unigram_logprob(d).collect()}
    n = 6  # total tokens: a=3, b=2, c=1
    lp = {t: math.floor(math.log(f / n) * 1e6 + 0.5) for t, f in
          {"a": 3, "b": 2, "c": 1}.items()}
    assert out[0]["n_tok"] == 3
    assert out[0]["sum_lp_e6"] == 2 * lp["a"] + lp["b"]
    assert out[1]["sum_lp_e6"] == lp["a"] + lp["b"]
    assert out[2]["sum_lp_e6"] == lp["c"]
    assert all(r["avg_lp"] < 0 for r in out.values())
    # rarer-token docs score lower (c is rarest)
    assert out[2]["avg_lp"] < out[1]["avg_lp"]


def test_chunk_dup_ratio_detects_partial_copy(spark):
    """A doc sharing an exact 64-char block with another doc must show a
    positive dup ratio; fully unique docs must show zero."""
    from modeltracking_spark.operators.corpus import chunk_dup_ratio

    shared = "s" * 64  # one exact chunk shared between docs 1 and 2
    rows = [
        (1, shared + "a" * 64),
        (2, shared + "b" * 64),
        (3, "c" * 128),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in chunk_dup_ratio(d, size=64).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 1
    assert out[1]["dup_ratio_e6"] == 500000
    assert out[2]["n_dup_chunks"] == 1
    assert out[3]["n_dup_chunks"] == 0 and out[3]["dup_ratio_e6"] == 0


def test_segment_dedup_rewrite_keep_first(spark):
    """Keep-first scrub: a segment repeated across docs survives only at
    its globally first (doc_id, position) occurrence; in-doc self-dups
    collapse too; a fully-duplicated doc rewrites to the empty string."""
    import hashlib

    from modeltracking_spark.operators.corpus import segment_dedup_rewrite

    dup, a, b = "s" * 64, "a" * 64, "b" * 64
    rows = [
        (1, dup + a + dup),  # owns first occurrence; self-dup at idx 2 dropped
        (2, dup + b),        # loses the shared segment
        (3, dup),            # loses everything
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in segment_dedup_rewrite(d, size=64).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1] == {
        "doc_id": 1, "n_segs": 3, "n_kept": 2, "kept_chars": 128,
        "dedup_md5": md5(dup + a),
    }
    assert out[2]["n_kept"] == 1 and out[2]["dedup_md5"] == md5(b)
    assert out[3] == {
        "doc_id": 3, "n_segs": 1, "n_kept": 0, "kept_chars": 0,
        "dedup_md5": md5(""),
    }


def test_segment_dedup_rewrite_preserves_order(spark):
    """Reconstruction concatenates surviving segments in original
    position order even when the groupBy scrambles arrival order."""
    import hashlib

    from modeltracking_spark.operators.corpus import segment_dedup_rewrite

    segs = [chr(ord("a") + i) * 8 for i in range(9)]
    d = spark.createDataFrame([(1, "".join(segs))], "doc_id long, text string")
    (row,) = segment_dedup_rewrite(d, size=8).collect()
    assert row["n_kept"] == 9
    assert row["dedup_md5"] == hashlib.md5("".join(segs).encode()).hexdigest()


def test_bigram_logprob_hand_values(spark):
    """Hand-fold the interpolated bigram LM on a 2-doc corpus."""
    import math

    from modeltracking_spark.operators.corpus import bigram_logprob

    rows = [(1, "a b a b"), (2, "a b c")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob(d).collect()}
    # corpus pairs: doc1: (a,b),(b,a),(a,b); doc2: (a,b),(b,c)
    c_xy = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    c_x = {"a": 3, "b": 2}
    c_y = {"a": 3, "b": 3, "c": 1}
    t_uni = 7

    def lp(x, y):
        v = 0.7 * (c_xy[(x, y)] / c_x[x]) + 0.3 * (c_y[y] / t_uni)
        return math.floor(math.log(v) * 1e6 + 0.5)

    assert got[1]["n_pairs"] == 3
    assert got[1]["sum_lp_e6"] == 2 * lp("a", "b") + lp("b", "a")
    assert got[2]["n_pairs"] == 2
    assert got[2]["sum_lp_e6"] == lp("a", "b") + lp("b", "c")
    # context sensitivity: (a,b) is likelier than (b,a) under this LM
    assert lp("a", "b") > lp("b", "a")


def test_bigram_logprob_single_token_doc_emits_no_row(spark):
    from modeltracking_spark.operators.corpus import bigram_logprob

    d = spark.createDataFrame([(1, "solo"), (2, "a b")], "doc_id long, text string")
    got = {r["doc_id"] for r in bigram_logprob(d).collect()}
    assert got == {2}  # no pairs -> no row, never a crash or descending sequence


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_segment_dedup_rewrite_matches_python_reference(spark, data):
    """Random corpora of segment-id sequences (each id renders as a
    4-char block, so segments align exactly): Spark's keep-first
    rewrite must equal the obvious sequential python fold."""
    import hashlib

    from modeltracking_spark.operators.corpus import segment_dedup_rewrite

    texts = ["".join(f"s{i:03d}" for i in seq) for seq in data]
    rows = [(d, t) for d, t in enumerate(texts)]
    seen: set[str] = set()
    want = {}
    for d, seq in enumerate(data):
        kept = []
        for sid in seq:
            block = f"s{sid:03d}"
            if block not in seen:
                seen.add(block)
                kept.append(block)
        text = "".join(kept)
        want[d] = (
            len(seq), len(kept), len(text),
            hashlib.md5(text.encode()).hexdigest(),
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["kept_chars"], r["dedup_md5"])
        for r in segment_dedup_rewrite(df, size=4).collect()
    }
    assert got == want


def test_bm25_hand_values(spark):
    # 3 docs, query {rare, common}: per-term scores computed by hand with
    # the exact engine formula (k1=1.2, b=0.75, e6 floor before the sum)
    docs = spark.createDataFrame(
        [
            (1, "rare common x y"),
            (2, "common x y z"),
            (3, "x y z w"),
        ],
        ["doc_id", "text"],
    )
    from modeltracking_spark.operators.retrieval import bm25_topk

    q = spark.createDataFrame([(0, "rare"), (0, "common")], ["q_id", "term"])
    got = {r["doc_id"]: (r["bm25_e6"], r["n_terms_hit"], r["rk"])
           for r in bm25_topk(docs, q, k=5).collect()}

    def score(tf, df, dl, n=3, sum_dl=12):
        k1, b = 12 / 10, 75 / 100
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        norm = (1.0 - b) + b * ((dl * n) / sum_dl)
        s = idf * (tf * (k1 + 1.0)) / (tf + k1 * norm)
        return math.floor(s * 1e6 + 0.5)

    exp1 = score(1, 1, 4) + score(1, 2, 4)   # rare+common, dl=4
    exp2 = score(1, 2, 4)                     # common only
    assert got[1] == (exp1, 2, 1)
    assert got[2] == (exp2, 1, 2)
    assert 3 not in got                       # no query term -> no row
    assert exp1 > exp2                        # rare-term doc outranks


def test_dsir_rank_matches_python_and_keeps_quarter(spark):
    # target (en-like) docs share vocab 'aa bb cc'; raw-only docs use
    # 'xx yy zz' — the two-pass bucket-offset rank must equal the naive
    # global rank and keep exactly floor(n/4) top docs, all target-like
    rows = []
    for i in range(8):
        rows.append((i, "aa bb cc aa", True))
    for i in range(8, 24):
        rows.append((i, "xx yy zz xx", False))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "is_en"])
    from modeltracking_spark.operators.corpus import dsir_logratio

    out = dsir_logratio(docs, F.col("is_en")).collect()
    assert len(out) == 24
    naive = sorted(out, key=lambda r: (-r["dsir_e6"], r["doc_id"]))
    for i, r in enumerate(naive):
        assert r["rk"] == i + 1, f"two-pass rank diverges at {r}"
    kept = {r["doc_id"] for r in out if r["keep"]}
    assert len(kept) == 6                      # floor(24/4)
    assert kept <= set(range(8))               # all target-vocab docs


def test_merge_upsert_semantics_and_plan(spark):
    from modeltracking_spark.operators.merge import merge_upsert
    from modeltracking_spark.plans import executed_plan

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    delta = spark.createDataFrame([(2, "B"), (9, "Z")], ["k", "v"])
    out = {r["k"]: (r["v"], r["merge_op"])
           for r in merge_upsert(snap, delta, "k").collect()}
    assert out == {
        1: ("a", "kept"),
        2: ("B", "updated"),      # delta wins
        3: ("c", "kept"),
        9: ("Z", "inserted"),
    }
    plan = executed_plan(merge_upsert(snap, delta, "k"))
    assert "hashpartitioning(k" in plan       # per-key window, no global sort
    assert "SinglePartition" not in plan
    try:
        merge_upsert(snap, delta.select("v", "k"), "k")
        raise AssertionError("expected ValueError on schema mismatch")
    except ValueError:
        pass


def test_quality_logreg_matches_python_replay_and_learns(spark):
    # bit-exact replay of the fixed-point GD on a separable toy set:
    # y correlates with x1; trained scores must beat the 0.5 prior
    import math

    from modeltracking_spark.operators.classifier import (
        score_quality_logreg,
        train_quality_logreg,
    )

    rows = []
    for i in range(40):
        y = 1 if i % 2 == 0 else 0
        x1 = 0.8 if y else 0.1
        rows.append((i, y, 1.0, x1, 0.05 * (i % 5), 0.25 + 0.0625 * (i % 3)))
    feats = spark.createDataFrame(
        rows, "doc_id long, y int, x0 double, x1 double, x2 double, x3 double"
    )
    got_w = train_quality_logreg(feats, iters=2).collect()[0]

    w = [0, 0, 0, 0]
    for _ in range(2):
        g = [0, 0, 0, 0]
        for (_i, y, x0, x1, x2, x3) in rows:
            z = (w[0] / 1e6) * x0
            z = z + (w[1] / 1e6) * x1
            z = z + (w[2] / 1e6) * x2
            z = z + (w[3] / 1e6) * x3
            sig = 1.0 / (1.0 + math.exp(0.0 - z))
            for j, x in enumerate((x0, x1, x2, x3)):
                g[j] += math.floor((sig - y) * x * 1e6 + 0.5)
        for j in range(4):
            w[j] = w[j] - math.floor((4 * g[j]) / (1 * len(rows)))
    assert [got_w[f"w{j}"] for j in range(4)] == w

    scored = score_quality_logreg(
        feats, train_quality_logreg(feats, iters=2)
    ).collect()
    pos = [r["score_e6"] for r in scored if r["y"] == 1]
    neg = [r["score_e6"] for r in scored if r["y"] == 0]
    assert min(pos) > max(neg)            # separable data separated


def test_quality_logreg_distills_heuristic_on_corpus(spark):
    # the scored query's training must actually LEARN: >= 70% agreement
    # with its teacher label on the real corpus (random = ~50%)
    from modeltracking_spark.queries import load_registries
    from tests.conftest import SF001

    qs, _ = load_registries()
    s = qs["quality_logreg_docs"](spark, SF001)
    n = s.count()
    acc = s.where(F.col("pred") == F.col("y")).count() / n
    assert n > 0 and acc >= 0.70
    # both classes present in the label (balanced threshold), both
    # predicted classes used
    assert s.select("y").distinct().count() == 2
    assert s.select("pred").distinct().count() == 2


def test_merge_upsert_duplicate_key_within_side_fails_loudly(spark):
    from modeltracking_spark.operators.merge import merge_upsert

    snap = spark.createDataFrame([(1, "a")], ["k", "v"])
    dup_delta = spark.createDataFrame([(9, "x"), (9, "y")], ["k", "v"])
    try:
        merge_upsert(snap, dup_delta, "k").collect()
        raise AssertionError("expected raise_error on side-internal dup key")
    except Exception as exc:
        assert "duplicate key within a side" in str(exc)
    # delta-only key present twice must NOT be tagged 'updated' silently
    ok = merge_upsert(snap, spark.createDataFrame([(9, "x")], ["k", "v"]), "k")
    assert {r["k"]: r["merge_op"] for r in ok.collect()} == {
        1: "kept", 9: "inserted"
    }


def test_scd2_apply_semantics(spark):
    from modeltracking_spark.operators.merge import scd2_apply

    hist = spark.createDataFrame(
        [
            (1, "a", "2024-01-01", None, True),
            (1, "old", "2023-01-01", "2024-01-01", False),  # closed history
            (2, "b", "2024-01-01", None, True),
            (3, "c", "2024-01-01", None, True),
        ],
        "k long, v string, valid_from string, valid_to string, is_current boolean",
    )
    delta = spark.createDataFrame(
        [(1, "A"), (2, "b"), (9, "z")], "k long, v string"
    )
    out = scd2_apply(hist, delta, "k", ["v"], "2024-02-01")
    rows = {(r["k"], r["scd_op"]): r for r in out.collect()}
    assert set(rows) == {
        (1, "history"), (1, "closed"), (1, "opened"),
        (2, "unchanged"), (3, "unchanged"), (9, "opened"),
    }
    closed = rows[(1, "closed")]
    assert (closed["valid_to"], closed["is_current"], closed["v"]) == (
        "2024-02-01", False, "a",
    )
    opened = rows[(1, "opened")]
    assert (opened["valid_from"], opened["valid_to"], opened["is_current"],
            opened["v"]) == ("2024-02-01", None, True, "A")
    assert rows[(1, "history")]["v"] == "old"       # untouched closed row
    # invariant: exactly one current row per live key
    cur = out.where(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_duplicate_delta_key_fails_loudly(spark):
    from modeltracking_spark.operators.merge import scd2_apply

    hist = spark.createDataFrame(
        [(1, "a", "2024-01-01", None, True)],
        "k long, v string, valid_from string, valid_to string, is_current boolean",
    )
    dup = spark.createDataFrame([(1, "A"), (1, "B")], "k long, v string")
    try:
        scd2_apply(hist, dup, "k", ["v"], "2024-02-01").collect()
        raise AssertionError("expected raise_error on duplicate delta key")
    except Exception as exc:
        assert "duplicate key in delta" in str(exc)


def test_scd2_separator_values_cannot_alias(spark):
    # attrs ('a\x1f', 'b') vs ('a', '\x1fb') must be detected as CHANGED
    from modeltracking_spark.operators.merge import scd2_apply

    hist = spark.createDataFrame(
        [(1, "a\x1f", "b", "2024-01-01", None, True)],
        "k long, v1 string, v2 string, valid_from string, valid_to string,"
        " is_current boolean",
    )
    delta = spark.createDataFrame([(1, "a", "\x1fb")], "k long, v1 string, v2 string")
    ops = sorted(
        r["scd_op"]
        for r in scd2_apply(hist, delta, "k", ["v1", "v2"], "2024-02-01").collect()
    )
    assert ops == ["closed", "opened"]


def test_dup_span_scrub_catches_shifted_alignment_copies(spark):
    """The r8 ExactSubstr-style span scrub: a passage copied at a
    DIFFERENT offset (which shifts every fixed-chunk boundary, so the
    64-char chunk tier misses it) is caught by overlapping token
    8-grams; overlapping windows merge into ONE maximal span; within-doc
    repeats count as duplication; a doc that is entirely duplicated
    scrubs to the empty string."""
    import hashlib

    from modeltracking_spark.operators.corpus import dup_span_scrub

    df = spark.createDataFrame(
        [
            (0, "p q r s t u v w x y unique0 tail0"),
            (1, "PAD a p q r s t u v w x y end1 m1"),  # copy at offset 2
            (2, "all fresh tokens nothing shared with anything else here"),
            (3, "rep rep rep rep rep rep rep rep rep rep"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_span_scrub(df, k=8).collect()}
    # docs 0/1 share the 10-token run p..y: 3 overlapping 8-grams merge
    # to one span covering exactly those 10 positions
    assert (got[0]["n_dup_spans"], got[0]["n_removed"]) == (1, 10)
    assert (got[1]["n_dup_spans"], got[1]["n_removed"]) == (1, 10)
    assert got[0]["clean_md5"] == hashlib.md5(b"unique0 tail0").hexdigest()
    assert got[1]["clean_md5"] == hashlib.md5(b"PAD a end1 m1").hexdigest()
    # untouched doc
    assert got[2]["n_dup_spans"] == 0
    assert got[2]["clean_md5"] == hashlib.md5(
        b"all fresh tokens nothing shared with anything else here"
    ).hexdigest()
    # self-repetition: every 8-gram occurs 3x -> whole doc removed
    assert (got[3]["n_dup_spans"], got[3]["n_removed"]) == (1, 10)
    assert got[3]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_dup_span_scrub_short_and_empty_docs(spark):
    """ADVICE r8 high: a doc with fewer than k tokens must contribute
    no grams and pass through untouched — the unguarded
    ``F.sequence(0, size-k)`` emitted a descending [0, -1] and aborted
    the whole job inside ``F.slice``. Pins 0/1/3/k-1/k-token docs plus
    empty text, and that a short doc equal to a long doc's PREFIX still
    doesn't collide (no full k-gram exists in it)."""
    import hashlib

    from modeltracking_spark.operators.corpus import dup_span_scrub

    df = spark.createDataFrame(
        [
            (0, ""),
            (1, "one"),
            (2, "a b c"),
            (3, "t1 t2 t3 t4 t5 t6 t7"),            # k-1 tokens
            (4, "t1 t2 t3 t4 t5 t6 t7 t8"),         # exactly k: 1 gram
            (5, "t1 t2 t3 t4 t5 t6 t7 t8"),         # its duplicate
            (6, "t1 t2 t3 t4"),                      # prefix of 4/5
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_span_scrub(df, k=8).collect()}
    for did, txt in ((0, ""), (1, "one"), (2, "a b c"),
                     (3, "t1 t2 t3 t4 t5 t6 t7"), (6, "t1 t2 t3 t4")):
        assert (got[did]["n_dup_spans"], got[did]["n_removed"]) == (0, 0)
        assert got[did]["clean_md5"] == hashlib.md5(
            txt.encode()
        ).hexdigest(), did
    assert got[0]["n_tokens"] == 0
    # the two exactly-k twins scrub to empty; the prefix doc survives
    for did in (4, 5):
        assert (got[did]["n_dup_spans"], got[did]["n_removed"]) == (1, 8)
        assert got[did]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_dup_span_scrub_oracle_unroll_bound_holds(spark):
    """The SQL oracle enumerates positions from range(128); every
    shipped sf dir must stay inside that bound."""
    import pyspark.sql.functions as F

    from modeltracking_spark.functions.text import tokens

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        mx = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .select(F.max(F.size(tokens("text"))).alias("m"))
            .first()["m"]
        )
        assert mx < 128, (sf, mx)
