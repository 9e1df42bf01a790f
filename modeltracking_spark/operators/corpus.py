"""Corpus-level statistics operators for LLM training-data pipelines.

Extension surface (SURVEY.md §2.12 / the brief's training-data scope —
the reference, a track-plot pipeline, has no text corpus analog): TF-IDF
term scoring, overlap chunking for retrieval windows, bigram PMI
collocations, and frequency heavy hitters via a Misra-Gries sketch with
an exact verification pass.

All scoring follows the repo's fixed-point discipline (common.py):
transcendental outputs (ln) are floored to e6 integers and never used as
sort keys without an integer+string tie-break, so every operator here is
hash-exact against its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modeltracking_spark.functions.fixedpoint import e6_half_up
from modeltracking_spark.functions.text import tokens


#: the shared half-up e6 lift (functions/fixedpoint.py) — one source of
#: truth for the engine-exactness primitive
_e6 = e6_half_up


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = term count / document length (whitespace tokens); idf uses the
    smoothed form ln((1+N)/(1+df)). Ranking is on the e6 fixed-point
    score with a token-string tie-break, so ranks are engine-exact.

    Scale shape: doc_len is computed narrowly *before* the explode (no
    per-doc window re-shuffle); the document-frequency and N sides are
    one-row / vocabulary-sized aggregates broadcast back — the only
    full-size shuffle is the (doc, term) count.

    Output: (doc_id, tok, tfidf_e6, rk), rk in 1..k.
    """
    d = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    tok = d.select(
        "doc_id", F.size("toks").alias("doc_len"), F.explode("toks").alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(
        F.first("doc_len").alias("doc_len"), F.count(F.lit(1)).alias("tf_cnt")
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            _e6(
                (F.col("tf_cnt").cast("double") / F.col("doc_len").cast("double"))
                * F.log(
                    (F.lit(1) + F.col("n_docs")).cast("double")
                    / (F.lit(1) + F.col("df")).cast("double")
                )
            ).alias("tfidf_e6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_e6").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("doc_id", "tok", "tfidf_e6", "rk")
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 80,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-size overlapping character chunks (retrieval / context
    windows). Chunk starts are ``1, 1+stride, …`` with ``stride = size −
    overlap``, up to ``max(len − overlap, 1)`` so the tail is covered;
    the final chunk may be shorter than ``size``.

    Pure narrow map — sequence + explode + substr, no shuffle at any
    scale; chunk_idx is derived arithmetically from the start offset so
    no positional explode state is needed.

    Output: (doc_id, chunk_idx, start, chunk_text, chunk_len).
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    ln = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(ln - F.lit(overlap), F.lit(1)), F.lit(stride)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__t"),
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / F.lit(stride)).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start"),
            F.expr(f"substr(__t, start, {size})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


def bigram_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs (collocation
    strength): pmi = ln( P(x,y) / (P(x)·P(y)) ) with P from corpus
    unigram/bigram counts; e6 fixed point.

    Bigrams are built narrowly per row (element_at over a sequence — no
    self-join on position); the wide ops are the two count aggregates.
    Unigram counts and the two scalar totals are broadcast back onto the
    bigram counts (vocabulary-sized and 1-row respectively at any corpus
    scale).

    Output: (x, y, c_xy, pmi_e6) for pairs with c_xy ≥ min_count.
    """
    d = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty array rather than a clamped stop bound
    pairs = F.when(
        F.size("toks") < 2, F.array().cast("array<struct<x:string,y:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("x"),
                F.element_at("toks", i + F.lit(1)).alias("y"),
            ),
        )
    )
    bg = d.select(F.explode(pairs).alias("b")).select("b.x", "b.y")
    c_xy = bg.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot_uni = uni.agg(F.sum("c").alias("t_uni"))
    tot_bi = c_xy.agg(F.sum("c_xy").alias("t_bi"))
    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    return (
        c_xy.where(F.col("c_xy") >= min_count)
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(tot_uni))
        .crossJoin(F.broadcast(tot_bi))
        .select(
            "x",
            "y",
            "c_xy",
            _e6(
                F.log(
                    (F.col("c_xy").cast("double") / F.col("t_bi").cast("double"))
                    / (
                        (F.col("c_x").cast("double") / F.col("t_uni").cast("double"))
                        * (F.col("c_y").cast("double") / F.col("t_uni").cast("double"))
                    )
                )
            ).alias("pmi_e6"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi_denom: int = 32,
    sketch_k: int = 255,
) -> DataFrame:
    """Exact frequency heavy hitters — every key with count·phi_denom >
    total — found with a Misra-Gries candidate sketch plus an exact
    verification pass.

    Phase 1 (narrow, bounded memory): each partition folds its rows into
    a Misra-Gries(sketch_k) summary inside mapInPandas (batch counts are
    merged vectorized; when the summary exceeds sketch_k entries the
    (k+1)-th largest counter is subtracted from all and non-positives
    dropped — the standard mergeable-summary operation). Any key with
    global count > n/(sketch_k+1) is guaranteed to survive in at least
    one partition's summary (pigeonhole over partition totals), so with
    sketch_k + 1 ≥ phi_denom the union of summaries is a superset of the
    true heavy hitters. Output is ≤ partitions × sketch_k candidate rows
    — kilobytes at any input scale, vs a full-vocabulary shuffle for the
    naive groupBy.

    Phase 2 (exact): the candidate set (broadcast) semi-joins the input
    and the survivors are counted exactly; a 1-row total is broadcast
    for the threshold filter. Result is therefore *exact*, not
    approximate — the sketch only prunes the candidate space — and is
    verified against a plain GROUP BY/HAVING oracle.

    Output: (key, cnt) with cnt·phi_denom > n.
    """
    if sketch_k + 1 < phi_denom:
        raise ValueError(
            f"sketch_k+1 ({sketch_k + 1}) must be >= phi_denom ({phi_denom}) "
            "for the Misra-Gries superset guarantee"
        )
    import pandas as pd

    keyed = df.select(F.col(key_col).cast("string").alias("key"))

    def _mg(batches):
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            counts = pdf["key"].value_counts()
            summary = summary.add(counts, fill_value=0).astype("int64")
            if len(summary) > sketch_k:
                # subtract the (k+1)-th largest counter from all, drop <= 0
                kth = summary.nlargest(sketch_k + 1).iloc[-1]
                summary = summary[summary > kth] - kth
        if len(summary):
            yield pd.DataFrame({"key": summary.index.astype(object)})

    cands = keyed.mapInPandas(_mg, "key string").distinct()
    n = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        keyed.join(F.broadcast(cands), "key", "leftsemi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .where(F.col("cnt") * F.lit(phi_denom) > F.col("n_total"))
        .select("key", "cnt")
    )


def quantize_embeddings_int8(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector affine int8 quantization (the standard ANN-index
    compression step): q_i = floor((v_i − mn)/scale + 0.5) − 128 with
    scale = (mx − mn)/255, so values land in [−128, 127]; constant
    vectors quantize to all-zero.

    Pure narrow map (array_min/max + one transform per row — no
    shuffle). All arithmetic is double-cast before use so the float
    inputs behave identically across engines; the half-up floor avoids
    the engines' differing round() half-rules. Output is one row per
    element (vec_id, i, q) — the long form hashes exactly and is the
    relational twin of the packed byte array a serving index would
    store.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        embs.select(
            F.col(id_col).alias("vec_id"),
            v.alias("__v"),
            F.array_min(v).alias("mn"),
            F.array_max(v).alias("mx"),
        )
        .select(
            "vec_id",
            F.posexplode("__v").alias("i0", "val"),
            "mn",
            "mx",
        )
        .select(
            "vec_id",
            (F.col("i0") + 1).cast("long").alias("i"),
            F.when(F.col("mx") > F.col("mn"),
                   F.floor(
                       (F.col("val") - F.col("mn"))
                       / ((F.col("mx") - F.col("mn")) / F.lit(255.0))
                       + F.lit(0.5)
                   ).cast("long") - F.lit(128))
            .otherwise(F.lit(0))
            .alias("q"),
        )
    )


def _word_5grams(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Distinct space-joined word 5-grams per doc with their md5 hex —
    the shared shingle builder for decontamination variants. Narrow
    explode, no shuffle until the caller aggregates."""
    t = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    ).where(F.size("t") >= 5)
    gram = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 5),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(F.col("t"), i + j) for j in range(1, 6)],
                ),
            )
        ).alias("gram"),
    ).dropDuplicates(["doc_id", "gram"])
    return gram.withColumn("md5_hex", F.md5("gram"))


def bloom_decontaminate(
    docs: DataFrame,
    *,
    bench_pred,
    m_hex_chars: int = 5,
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination through a BLOOM membership test — the
    100 TB shape of ``decontaminate_ngram_overlap``: instead of
    broadcasting every benchmark 5-gram hash (GBs for a large eval
    suite), broadcast only the SET BITS of an m=2^20 Bloom filter
    (k=3 probes of 20 bits each from non-overlapping md5 hex slices;
    ≤128 KiB as a bitset, and still small as the distinct-position
    table used here, which is the filter's exact relational encoding:
    a gram is flagged iff ALL k of its probe positions are set).

    Bloom answers are one-sided — no false negatives, tunable false
    positives — so the operator also computes the exact membership
    verdict and emits both: ``n_false_pos`` quantifies the filter's
    overcount, the number of docs a pipeline would needlessly re-check
    (or over-drop) at this m/k. Output per non-benchmark doc:
    (doc_id, n_grams, n_bloom_flagged, n_exact_hits, n_false_pos).
    """
    grams = _word_5grams(docs)
    probes = [
        F.conv(
            F.substring("md5_hex", i * m_hex_chars + 1, m_hex_chars), 16, 10
        ).cast("long").alias(f"p{i}")
        for i in range(k)
    ]
    g = grams.select(
        "doc_id",
        "gram",
        F.conv(F.substring("md5_hex", 1, 15), 16, 10).cast("long").alias("gram_h"),
        *probes,
    )
    bench = g.where(bench_pred)
    # the filter: distinct set bit positions across all k probe slots
    bits = (
        bench.select(
            F.explode(F.array(*[F.col(f"p{i}") for i in range(k)])).alias("pos")
        )
        .distinct()
    )
    bench_hashes = bench.select(F.col("gram_h").alias("bh")).distinct()
    # k row-preserving broadcast probes (the relational form of testing k
    # bits of the bitset) + one exact-membership probe, then ONE per-doc
    # aggregate — the probe side (the 100 TB side) stays single-pass and
    # never explodes. The bits relation is materialized eagerly once
    # (bounded: <= m distinct positions, here ~1e6 longs) so the k probe
    # joins reuse one computed bitset instead of re-deriving it from the
    # benchmark scan k times — the train-once/serve-many split an
    # at-scale pipeline would persist as a table or real bitset
    bits = bits.localCheckpoint(eager=True)
    probe_side = g.where(~bench_pred)
    for i in range(k):
        bi = bits.select(F.col("pos").alias(f"__b{i}"))
        probe_side = probe_side.join(
            F.broadcast(bi), F.col(f"p{i}") == F.col(f"__b{i}"), "left"
        )
    probe_side = probe_side.join(
        F.broadcast(bench_hashes), F.col("gram_h") == F.col("bh"), "left"
    )
    all_bits_set = F.col("__b0").isNotNull()
    for i in range(1, k):
        all_bits_set = all_bits_set & F.col(f"__b{i}").isNotNull()
    bloom_hit = F.when(all_bits_set, 1).otherwise(0)
    exact_hit = F.when(F.col("bh").isNotNull(), 1).otherwise(0)
    return (
        probe_side.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(bloom_hit).alias("n_bloom_flagged"),
            F.sum(exact_hit).alias("n_exact_hits"),
        )
        .withColumn(
            "n_false_pos", F.col("n_bloom_flagged") - F.col("n_exact_hits")
        )
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Perplexity-style quality score from a corpus-derived unigram LM —
    the deterministic stand-in for the KenLM scoring CCNet-style
    pipelines use to rank documents: token logprob = ln(freq/N) under
    the corpus's own unigram distribution, summed per doc in e6 fixed
    point (transcendental outputs floored to integers per the repo's
    fixed-point discipline, so the aggregate is order-independent and
    oracle-exact).

    Scale: the LM is the vocabulary-sized (token, lp_e6) table —
    broadcast; the corpus side is one explode + one broadcast join +
    one aggregate. Output: (doc_id, n_tok, sum_lp_e6, avg_lp) with
    avg_lp = sum/n in doubles (engine-exact division of exact ints).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = freq.agg(F.sum("freq").alias("n_total"))
    lm = freq.crossJoin(F.broadcast(total)).select(
        "token",
        _e6(
            F.log(F.col("freq").cast("double") / F.col("n_total").cast("double"))
        ).alias("lp_e6"),
    )
    scored = toks.join(F.broadcast(lm), "token")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("lp_e6").alias("sum_lp_e6"),
        )
        .withColumn(
            "avg_lp",
            F.col("sum_lp_e6").cast("double")
            / F.col("n_tok").cast("double")
            / F.lit(1e6),
        )
    )


def chunk_dup_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
) -> DataFrame:
    """Exact-substring dedup signal at chunk granularity — the scalable
    relational approximation of suffix-array substring dedup (Lee et
    al., "Deduplicating Training Data Makes Language Models Better"):
    split each doc into NON-overlapping ``size``-char chunks
    (:func:`chunk_documents` with overlap=0), hash them, and measure per
    doc what fraction of its chunks also occur in ANY other document.
    Pipelines drop or trim docs above a dup-ratio threshold; doc-level
    exact dedup misses these partial copies and this filter catches
    them.

    Scale: one narrow chunk explode, one aggregate over chunk hashes
    (the dup-chunk side is corpus-wide but each group is tiny), then a
    shuffle join back on the chunk hash — ``docs_per_hash`` has one row
    per DISTINCT chunk in the corpus, so it is corpus-sized and must NOT
    be broadcast; both sides hash-partition on ``h``. Output: (doc_id,
    n_chunks, n_dup_chunks, dup_ratio_e6).
    """
    chunks = chunk_documents(
        docs, id_col=id_col, text_col=text_col, size=size, overlap=0
    ).select("doc_id", F.md5("chunk_text").alias("h"))
    # a chunk value is "duplicated" for doc d if it appears in >= 1 OTHER
    # doc: count distinct docs per hash once, join back
    docs_per_hash = chunks.dropDuplicates(["doc_id", "h"]).groupBy("h").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    per_doc = (
        chunks.join(docs_per_hash, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias(
                "n_dup_chunks"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        _e6(
            F.col("n_dup_chunks").cast("double") / F.col("n_chunks").cast("double")
        ).alias("dup_ratio_e6"),
    )


def segment_dedup_rewrite(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
) -> DataFrame:
    """C4-style line dedup as a corpus-wide keep-first REWRITE: every
    repeated segment is removed from every document except its globally
    first occurrence (ordered by doc_id, then position), and each doc's
    surviving segments are re-concatenated in original order. This is
    the scrub C4 applies to duplicate lines and MassiveText/RefinedWeb
    to exact duplicated spans — :func:`chunk_dup_ratio` only *scores*
    partial duplication; this operator *removes* it. Segments are
    fixed ``size``-char non-overlapping chunks (this corpus has no
    newlines; with line-structured text pass the same frame split on
    '\\n' instead — the dedup logic is segmentation-agnostic).

    Scale: one narrow chunk explode; the keep-first decision is a
    window rank over the segment hash (ONE hash-partitioned shuffle —
    no groupBy+join-back pair, and no skew risk beyond a pathological
    single segment value, which AQE splits); reconstruction is one
    conditional aggregate by doc_id over the SAME ranked rows — losers
    contribute to n_segs but null out of the collect_list (which skips
    nulls), so docs that lose every segment still emit a row (md5 of
    the empty string) without a second corpus pass or a spine join.

    Output: (doc_id, n_segs, n_kept, kept_chars, dedup_md5).
    """
    segs = chunk_documents(
        docs, id_col=id_col, text_col=text_col, size=size, overlap=0
    ).select("doc_id", "chunk_idx", "chunk_text", F.md5("chunk_text").alias("h"))
    w = Window.partitionBy("h").orderBy(F.col("doc_id").asc(), F.col("chunk_idx").asc())
    ranked = segs.withColumn("rn", F.row_number().over(w))
    is_first = F.col("rn") == 1
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segs"),
        F.sum(F.when(is_first, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(is_first, F.length("chunk_text")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                is_first, F.struct("chunk_idx", "chunk_text")
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
            )
        ).alias("dedup_md5"),
    )


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Interpolated bigram-LM document scoring — one order up from
    :func:`unigram_logprob`, the next rung toward the KenLM n-gram
    scoring CCNet-style pipelines rank documents with: each adjacent
    pair (x, y) scores ln(0.7·P(y|x) + 0.3·P(y)) with P(y|x) from the
    corpus bigram counts over the left-marginal and P(y) from the
    unigram distribution (fixed 0.7/0.3 Jelinek-Mercer interpolation —
    the unigram backoff keeps unseen-in-context pairs finite). Scores
    floor to e6 integers per the fixed-point discipline, so per-doc
    sums are order-independent and oracle-exact.

    Scale: the bigram LM is VOCAB²-bounded, in practice corpus-sized —
    it joins the (doc, x, y) pair grain by HASH join on (x, y), never
    broadcast (the 100 TB mistake); the unigram table and the scalar
    total are the only broadcast sides. One narrow pair build, two
    count aggregates, one shuffle join, one per-doc aggregate.
    Output: (doc_id, n_pairs, sum_lp_e6, avg_lp).
    """
    d = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    # sequence(1, 0) DESCENDS in Spark: short docs need an explicit empty
    pair_arr = F.when(
        F.size("toks") < 2, F.array().cast("array<struct<x:string,y:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("x"),
                F.element_at("toks", i + F.lit(1)).alias("y"),
            ),
        )
    )
    pairs = d.select("doc_id", F.explode(pair_arr).alias("b")).select(
        "doc_id", "b.x", "b.y"
    )
    # pairs feeds BOTH the LM counts and the final scored join, whose
    # physical subplans differ (no exchange reuse) — materialize once so
    # the tokenize+explode pass doesn't run twice over the corpus (the
    # unigram side still re-tokenizes once: one narrow extra pass,
    # cheaper than materializing the token grain a second time)
    pairs = pairs.localCheckpoint(eager=False)
    c_xy = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    c_x = c_xy.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    uni = (
        d.select(F.explode("toks").alias("y"))
        .groupBy("y")
        .agg(F.count(F.lit(1)).alias("c_y"))
    )
    tot = uni.agg(F.sum("c_y").alias("t_uni"))
    lm = (
        c_xy.join(F.broadcast(c_x), "x")
        .join(F.broadcast(uni), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            _e6(
                F.log(
                    F.lit(0.7) * (F.col("c_xy").cast("double") / F.col("c_x").cast("double"))
                    + F.lit(0.3) * (F.col("c_y").cast("double") / F.col("t_uni").cast("double"))
                )
            ).alias("lp_e6"),
        )
    )
    scored = pairs.join(lm, ["x", "y"])
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("lp_e6").alias("sum_lp_e6"),
        )
        .withColumn(
            "avg_lp",
            F.col("sum_lp_e6").cast("double")
            / F.col("n_pairs").cast("double")
            / F.lit(1e6),
        )
    )


def dsir_logratio(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    keep_frac_num: int = 1,
    keep_frac_den: int = 4,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    adapted to the repo's deterministic discipline: score every raw
    document by the log-likelihood ratio of its hashed unigram features
    under a TARGET distribution (rows where ``target_pred`` holds, e.g.
    an in-domain slice) vs the RAW corpus distribution, then keep the
    top ``keep_frac`` deterministically (rank by score — the
    reproducible stand-in for the paper's Gumbel resampling, which an
    engine-portable pipeline cannot RNG).

    Features are hashed token buckets (first 15 md5 hex digits mod
    ``n_buckets`` — the portable 60-bit trick from operators/dedup.py),
    with add-1 smoothing on both models:

        r(h) = ln((c_t(h)+1)/(N_t+B)) − ln((c_r(h)+1)/(N_r+B))

    floored to e6 per bucket; a doc's score is the BIGINT SUM of its
    token occurrences' r_e6 — order-independent, oracle-exact.

    Scale: both LMs are ``n_buckets``-row broadcast tables; the corpus
    side is one explode + one broadcast join + one aggregate. The global
    rank deliberately avoids a single-partition window (the
    deterministic_shuffle two-pass pattern from operators/sampling.py):
    docs coarse-bucket by ``floor(score / 2^20)``, bucket counts
    prefix-sum into offsets on the tiny bucket table, and the in-bucket
    window is hash-partitioned — the decomposition is exact because the
    bucket is a monotone function of the ordering key.

    Output: (doc_id, is_target, n_tok, dsir_e6, rk, keep) — zero-token
    docs score 0 and still rank.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("boolean").alias("is_target"),
        tokens(text_col).alias("toks"),
    )
    from modeltracking_spark.operators.dedup import token_hash60
    from modeltracking_spark.operators.kernel import widen_for_kernel

    # r16 (guide §2.3): ONE tokenize+md5 pass. The token stream used to
    # be consumed twice (bucket LM counts AND per-doc scores), re-running
    # the expensive explode+md5 map per consumer; instead pre-aggregate
    # to per-(doc, bucket) occurrence counts — a frame bounded by
    # n_docs x n_buckets, far smaller than the token stream — and derive
    # both readers from it. Integer counts re-aggregate exactly, so
    # every downstream number is bit-identical. widen_for_kernel spreads
    # the md5 map across cores when the scan is under-split (no-op on
    # an already-parallel 100 TB scan); the lazy localCheckpoint stops
    # the two consumers from recomputing the pass.
    tok = widen_for_kernel(d).select(
        "doc_id", "is_target", F.explode("toks").alias("token")
    ).withColumn("h", token_hash60("token") % F.lit(n_buckets))
    dh = (
        tok.groupBy("doc_id", "is_target", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    counts = dh.groupBy("h").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0)).alias("c_t"),
        F.sum("cnt").alias("c_r"),
    )
    totals = counts.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "h",
        _e6(
            F.log(
                (F.col("c_t") + F.lit(1)).cast("double")
                / (F.col("n_t") + F.lit(n_buckets)).cast("double")
            )
            - F.log(
                (F.col("c_r") + F.lit(1)).cast("double")
                / (F.col("n_r") + F.lit(n_buckets)).cast("double")
            )
        ).alias("r_e6"),
    )
    per_doc = (
        dh.join(F.broadcast(lm), "h")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tok"),
            F.sum(F.col("cnt") * F.col("r_e6")).alias("dsir_e6"),
        )
    )
    # spine keeps zero-token docs (score 0) so selection covers the corpus
    scored = (
        d.select("doc_id", "is_target")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
            F.coalesce("dsir_e6", F.lit(0)).alias("dsir_e6"),
        )
    )
    n_docs = scored.agg(F.count(F.lit(1)).alias("n_docs"))
    # two-pass global rank by (score desc, doc_id asc): coarse score
    # bucket -> bounded offset table -> hash-partitioned in-bucket window
    bucket_w = 1 << 20
    b = scored.withColumn(
        "__b", F.floor(F.col("dsir_e6") / F.lit(bucket_w)).cast("long")
    )
    bcounts = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bcounts.select(
        "__b", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy("__b").orderBy(
        F.col("dsir_e6").desc(), F.col("doc_id").asc()
    )
    return (
        b.join(F.broadcast(offsets), "__b")
        .withColumn(
            "rk", (F.row_number().over(w_in) + F.col("__off")).cast("long")
        )
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "keep",
            F.col("rk") * F.lit(keep_frac_den)
            <= F.col("n_docs") * F.lit(keep_frac_num),
        )
        .select("doc_id", "is_target", "n_tok", "dsir_e6", "rk", "keep")
    )


def dup_span_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Duplicated-SUBSTRING span removal at token-k-gram granularity —
    the alignment-free half of Lee et al.'s ExactSubstr that the fixed
    64-char chunk tier (:func:`chunk_dup_ratio` /
    :func:`segment_dedup_rewrite`) cannot see: a copied passage that
    starts mid-chunk shifts every subsequent chunk boundary and evades
    chunk hashing entirely, while its OVERLAPPING k-grams collide at
    any alignment.

    Semantics: a token position is dirty iff it lies inside any k-token
    window whose k-gram occurs >= 2 times corpus-wide (including
    within-doc repeats — self-plagiarized spans are duplication too).
    Overlapping dirty windows merge into MAXIMAL spans; every dirty
    token is removed and the survivors re-join in order (the
    MassiveText/RefinedWeb exact-span scrub, k tokens instead of suffix
    arrays).

    Plan shape (the dedup-tier discipline): one gram explode, ONE
    corpus-scale hash aggregate on the gram hash, one join back — no
    broadcast is FORCED anywhere, so at 100 TB (gram_counts
    corpus-sized) the planner shuffles both sides on the gram hash,
    while tiny inputs may legitimately broadcast the small aggregate;
    both shapes are plan-asserted in tests/test_scale_plans.py. Then
    the per-doc tail is a LINEAR Arrow kernel (``mapInPandas``): one
    two-pointer sweep over the sorted dup-start list merges the
    overlapping [s, s+k-1] windows into maximal spans, counts removed
    tokens, and rebuilds the cleaned text from the inter-span slices —
    O(tokens + starts) per doc. (The r8 shape tested every token
    position with ``F.exists`` over the start list — O(tokens × spans)
    interpreted, quadratic on a fully-duplicated doc; VERDICT r8
    "What's wrong #3".) Docs with no duplicated gram short-circuit
    through the left join with zero spans, and docs SHORTER than k
    tokens contribute no grams at all — the unguarded
    ``F.sequence(0, size-k)`` used to emit a descending [0, -1] for a
    short doc and abort the job inside ``F.slice`` (ADVICE r8 high;
    short/empty docs now pinned in tests/test_corpus.py).

    Output: (doc_id, n_tokens, n_dup_spans, n_removed, clean_md5).
    """
    import pandas as pd  # noqa: F401  (arrow kernel below)

    from modeltracking_spark.operators.kernel import widen_for_kernel

    toks = widen_for_kernel(
        docs.select(F.col(id_col).alias("doc_id"), text_col)
    ).select(
        F.col("doc_id"), tokens(text_col).alias("__toks")
    ).localCheckpoint(eager=False)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.when(
                    F.size("__toks") >= k,
                    F.sequence(F.lit(0), F.size("__toks") - k),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.concat_ws(
                            "\x1f", F.slice("__toks", i + 1, k)
                        )
                    ).alias("h"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    gram_counts = grams.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    dup_starts = (
        grams.join(gram_counts.where(F.col("n_occ") >= 2), "h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("starts"))
    )
    j = toks.join(dup_starts, "doc_id", "left").select(
        "doc_id",
        "__toks",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    id_t = j.schema["doc_id"].dataType.simpleString()
    out_schema = (
        f"doc_id {id_t}, n_tokens long, n_dup_spans long, "
        "n_removed long, clean_md5 string"
    )

    def _scrub(batches):
        import hashlib

        for pdf in batches:
            n_tok, n_spans, n_rm, md5s = [], [], [], []
            for tk, st in zip(pdf["__toks"], pdf["starts"]):
                tk = list(tk)
                # two-pointer merge of sorted starts into maximal spans
                spans = []
                for s in st:
                    s = int(s)
                    e = s + k - 1
                    if spans and s <= spans[-1][1]:
                        if e > spans[-1][1]:
                            spans[-1][1] = e
                    else:
                        spans.append([s, e])
                clean, prev = [], 0
                for s, e in spans:
                    clean.extend(tk[prev:s])
                    prev = e + 1
                clean.extend(tk[prev:])
                n_tok.append(len(tk))
                n_spans.append(len(spans))
                n_rm.append(sum(e - s + 1 for s, e in spans))
                md5s.append(
                    hashlib.md5(" ".join(clean).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": n_tok,
                    "n_dup_spans": n_spans,
                    "n_removed": n_rm,
                    "clean_md5": md5s,
                }
            )

    return j.mapInPandas(_scrub, out_schema)
