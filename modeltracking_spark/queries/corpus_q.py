"""Corpus-statistics queries (extension surface §2.12): TF-IDF, overlap
chunking, PMI collocations, Misra-Gries heavy hitters, int8 embedding
quantization, the stream-stream interval-join batch twin, Bloom-filter
decontamination, and unigram-LM document scoring.

Grown through round 6 with the LM ladder (unigram/bigram), DSIR/BM25
retrieval-and-selection, PageRank/triangles over the formula link
graph, MERGE/SCD2 incremental ingest, in-engine logreg distillation,
and the curation-pipeline composition. Scored-window membership is
pinned in queries/__init__.py; everything else is verified by
tools/check_queries.py (both SFs) and tests/test_corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modeltracking_spark.operators.corpus import (
    bigram_pmi,
    chunk_documents,
    dsir_logratio,
    heavy_hitters,
    quantize_embeddings_int8,
    tfidf_top_terms,
)
from modeltracking_spark.operators.retrieval import bm25_topk, queries_from_docs
from modeltracking_spark.queries.common import T, query

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


@query(
    "tfidf_top_terms_docs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, len(toks) AS doc_len, unnest(toks) AS tok FROM d),
    tf AS (SELECT doc_id, tok, any_value(doc_len) AS doc_len,
                  count(*) AS tf_cnt
           FROM tok GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM d),
    scored AS (
      SELECT t.doc_id, t.tok,
             floor((t.tf_cnt::DOUBLE / t.doc_len::DOUBLE)
                   * ln((1 + n.n_docs)::DOUBLE / (1 + f.df)::DOUBLE)
                   * 1e6 + 0.5::DOUBLE)::BIGINT AS tfidf_e6
      FROM tf t JOIN dfreq f USING (tok) CROSS JOIN n
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf_e6 DESC, tok ASC) AS rk FROM scored)
    SELECT doc_id, tok, tfidf_e6, rk FROM r WHERE rk <= 5
    """,
)
def tfidf_top_terms_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document; e6 fixed-point scores with a
    token tie-break so ranks are engine-exact (operators/corpus.py)."""
    return tfidf_top_terms(T(spark, sf_dir, "documents"), k=5)


@query(
    "doc_chunks_overlap",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 16, 1), 64))
               AS start
      FROM documents
    )
    SELECT doc_id,
           ((start - 1) // 64)::BIGINT AS chunk_idx,
           start::BIGINT AS start,
           substr(text, start::INTEGER, 80) AS chunk_text,
           length(substr(text, start::INTEGER, 80))::BIGINT AS chunk_len
    FROM s
    """,
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping character chunks (size 80, overlap 16) —
    a shuffle-free narrow map at any corpus scale."""
    return chunk_documents(
        T(spark, sf_dir, "documents"), size=80, overlap=16
    )


@query(
    "bigram_pmi_docs",
    oracle=f"""
    WITH d AS (SELECT {_TOKS} AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, len(toks)),
                         i -> {{'x': toks[i], 'y': toks[i+1]}})) AS b
           FROM d),
    cxy AS (SELECT b.x AS x, b.y AS y, count(*) AS c_xy FROM bg GROUP BY 1, 2),
    uc AS (SELECT unnest(toks) AS tok FROM d),
    u AS (SELECT tok, count(*) AS c FROM uc GROUP BY tok),
    tu AS (SELECT sum(c)::BIGINT AS t_uni FROM u),
    tb AS (SELECT sum(c_xy)::BIGINT AS t_bi FROM cxy)
    SELECT x, y, c_xy,
           floor(ln((c_xy::DOUBLE / t_bi::DOUBLE)
                    / ((ux.c::DOUBLE / t_uni::DOUBLE)
                       * (uy.c::DOUBLE / t_uni::DOUBLE)))
                 * 1e6 + 0.5::DOUBLE)::BIGINT AS pmi_e6
    FROM cxy JOIN u ux ON cxy.x = ux.tok
             JOIN u uy ON cxy.y = uy.tok
    CROSS JOIN tu CROSS JOIN tb
    WHERE c_xy >= 5
    """,
)
def bigram_pmi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token PMI collocation scores over the corpus (count ≥ 5);
    unigram counts and totals broadcast back onto the bigram counts."""
    return bigram_pmi(T(spark, sf_dir, "documents"), min_count=5)


@query(
    "token_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS key FROM documents)
    SELECT key, count(*) AS cnt
    FROM tok GROUP BY key
    HAVING count(*) * 32 > (SELECT count(*) FROM tok)
    """,
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (freq > n/32) via a Misra-Gries candidate
    sketch + exact verify pass — the sketch bounds phase-1 memory and
    traffic to partitions x sketch_k rows instead of a full-vocabulary
    shuffle; the verify pass makes the result exact, hence oracle-able
    as a plain GROUP BY / HAVING."""
    from pyspark.sql import functions as F

    from modeltracking_spark.functions.text import tokens

    d = T(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("tok"))
    return heavy_hitters(tok, "tok", phi_denom=32, sketch_k=255)


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
               FROM embeddings),
    m AS (SELECT vec_id, ve, list_min(ve) AS mn, list_max(ve) AS mx FROM v),
    e AS (SELECT vec_id, unnest(ve) AS val,
                 unnest(range(1, len(ve) + 1)) AS i, mn, mx
          FROM m)
    SELECT vec_id, i::BIGINT AS i,
           CASE WHEN mx > mn
                THEN floor((val - mn) / ((mx - mn) / 255.0::DOUBLE)
                           + 0.5::DOUBLE)::BIGINT - 128
                ELSE 0 END AS q
    FROM e
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector affine int8 quantization of the embedding column, long
    form (vec_id, i, q) — narrow map, double-cast before arithmetic and
    half-up floor so both engines emit identical integers."""
    return quantize_embeddings_int8(T(spark, sf_dir, "embeddings"))


@query(
    "click_error_interval_join",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts
               FROM events WHERE event_type = 'click'),
         e AS (SELECT user_id, event_id AS error_id, ts AS ets
               FROM events WHERE event_type = 'error')
    SELECT c.user_id, click_id, error_id,
           floor(epoch(ets))::BIGINT - floor(epoch(cts))::BIGINT AS lag_s
    FROM c JOIN e ON c.user_id = e.user_id
                 AND ets >= cts AND ets <= cts + INTERVAL 6 HOUR
    """,
)
def click_error_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: clicks paired with
    same-user errors within 6 hours after them. On streams the same
    function bounds its buffered state by watermark + lag window
    (streaming/windows.py:interval_join_clicks_errors); equivalence is
    asserted in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    from modeltracking_spark.streaming.windows import interval_join_clicks_errors

    ev = T(spark, sf_dir, "events")
    return interval_join_clicks_errors(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "error"),
    )


@query(
    "bloom_decontaminate_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             md5(t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] || ' ' ||
                 t[g.i+3] || ' ' || t[g.i+4]) AS h
      FROM toks, unnest(range(1, len(t) - 3)) AS g(i)
      WHERE len(t) >= 5
    ),
    gp AS (
      SELECT doc_id, h,
             ('0x' || substr(h, 1, 15))::BIGINT AS gram_h,
             ('0x' || substr(h, 1, 5))::BIGINT AS p0,
             ('0x' || substr(h, 6, 5))::BIGINT AS p1,
             ('0x' || substr(h, 11, 5))::BIGINT AS p2
      FROM grams
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        SELECT unnest([p0, p1, p2]) AS pos FROM gp WHERE doc_id % 100 = 0)
    ),
    bench AS (SELECT DISTINCT gram_h FROM gp WHERE doc_id % 100 = 0),
    probe AS (SELECT * FROM gp WHERE doc_id % 100 <> 0),
    flagged AS (
      SELECT doc_id, h FROM probe
      WHERE p0 IN (SELECT pos FROM bits)
        AND p1 IN (SELECT pos FROM bits)
        AND p2 IN (SELECT pos FROM bits)
    ),
    exact AS (
      SELECT doc_id, h FROM probe WHERE gram_h IN (SELECT gram_h FROM bench)
    )
    SELECT p.doc_id,
           count(*) AS n_grams,
           (SELECT count(*) FROM flagged f WHERE f.doc_id = p.doc_id)
             AS n_bloom_flagged,
           (SELECT count(*) FROM exact e WHERE e.doc_id = p.doc_id)
             AS n_exact_hits,
           (SELECT count(*) FROM flagged f WHERE f.doc_id = p.doc_id)
             - (SELECT count(*) FROM exact e WHERE e.doc_id = p.doc_id)
             AS n_false_pos
    FROM probe p
    GROUP BY p.doc_id
    """,
)
def bloom_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (the broadcast-a-bitset scale shape)
    vs exact membership, per non-benchmark doc — every 100th doc stands
    in for the eval suite, mirroring decontaminate_ngram_overlap. The
    oracle rebuilds the same m=2^20 / k=3 filter from md5 hex slices
    and replays both verdicts; n_false_pos is the filter's one-sided
    error, measured not assumed."""
    from pyspark.sql import functions as F

    from modeltracking_spark.operators.corpus import bloom_decontaminate

    d = T(spark, sf_dir, "documents")
    return bloom_decontaminate(d, bench_pred=F.col("doc_id") % 100 == 0)


@query(
    "unigram_logprob_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
    n AS (SELECT sum(freq) AS n_total FROM freq),
    lm AS (
      SELECT token,
             floor(ln(freq::DOUBLE / n.n_total::DOUBLE) * 1e6
                   + 0.5::DOUBLE)::BIGINT AS lp_e6
      FROM freq, n
    )
    SELECT t.doc_id,
           count(*) AS n_tok,
           sum(l.lp_e6)::BIGINT AS sum_lp_e6,
           sum(l.lp_e6)::DOUBLE / count(*)::DOUBLE / 1e6 AS avg_lp
    FROM tok t JOIN lm l USING (token)
    GROUP BY t.doc_id
    """,
)
def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring (deterministic KenLM stand-in for
    CCNet-style quality ranking): per-token ln(freq/N) under the
    corpus's own unigram distribution, e6 fixed point, summed and
    averaged per doc. The LM is a vocabulary-sized broadcast table; the
    corpus side is one explode + broadcast join + aggregate."""
    from modeltracking_spark.operators.corpus import unigram_logprob

    return unigram_logprob(T(spark, sf_dir, "documents"))


@query(
    "chunk_dup_ratio_docs",
    oracle="""
    WITH chunks AS (
      SELECT doc_id,
             md5(substr(text, s.st::INTEGER, 64)) AS h
      FROM documents,
           unnest(range(1, greatest(length(text), 1) + 1, 64)) AS s(st)
    ),
    dph AS (
      SELECT h, count(DISTINCT doc_id) AS n_docs FROM chunks GROUP BY h
    ),
    per_doc AS (
      SELECT c.doc_id,
             count(*) AS n_chunks,
             sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_dup_chunks
      FROM chunks c JOIN dph d USING (h)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_chunks, n_dup_chunks,
           floor(n_dup_chunks::DOUBLE / n_chunks::DOUBLE * 1e6
                 + 0.5::DOUBLE)::BIGINT AS dup_ratio_e6
    FROM per_doc
    """,
)
def chunk_dup_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal: fraction of each doc's
    non-overlapping 64-char chunks that also occur in another document
    (the filter-style complement to the pair-finding dedup tier; the
    relational approximation of Lee et al.'s suffix-array ExactSubstr).
    """
    from modeltracking_spark.operators.corpus import chunk_dup_ratio

    return chunk_dup_ratio(T(spark, sf_dir, "documents"), size=64)


@query(
    "line_dedup_rewrite_docs",
    oracle="""
    WITH segs AS (
      SELECT doc_id,
             ((s.st - 1) // 64)::BIGINT AS chunk_idx,
             substr(text, s.st::INTEGER, 64) AS chunk_text
      FROM documents,
           unnest(range(1, greatest(length(text), 1) + 1, 64)) AS s(st)
    ),
    ranked AS (
      SELECT doc_id, chunk_idx, chunk_text,
             row_number() OVER (
               PARTITION BY chunk_text ORDER BY doc_id, chunk_idx
             ) AS rn
      FROM segs
    ),
    rebuilt AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_kept,
             sum(length(chunk_text))::BIGINT AS kept_chars,
             string_agg(chunk_text, '' ORDER BY chunk_idx) AS t
      FROM ranked WHERE rn = 1
      GROUP BY doc_id
    ),
    spine AS (
      SELECT doc_id, count(*)::BIGINT AS n_segs FROM segs GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_segs,
           coalesce(r.n_kept, 0)::BIGINT AS n_kept,
           coalesce(r.kept_chars, 0)::BIGINT AS kept_chars,
           md5(coalesce(r.t, '')) AS dedup_md5
    FROM spine s LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def line_dedup_rewrite_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide keep-first duplicate-segment REMOVAL (the C4
    line-dedup / MassiveText duplicated-span scrub, generalized to
    64-char segments since this corpus has no newlines): every repeated
    segment survives only at its globally first (doc_id, position)
    occurrence, and each doc's survivors are re-concatenated in order.
    The oracle rebuilds the scrubbed text independently and compares its
    md5 byte-exactly, so the keep-first rule, in-doc self-dup removal,
    ordering of the reconstruction, and the all-segments-lost empty-doc
    edge are all attested. The keep decision is one window rank over the
    segment hash — a single hash-partitioned shuffle at any scale."""
    from modeltracking_spark.operators.corpus import segment_dedup_rewrite

    return segment_dedup_rewrite(T(spark, sf_dir, "documents"), size=64)


@query(
    "pagerank_link_graph_docs",
    oracle="""
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    edges AS (
      SELECT d.doc_id AS src,
             CASE WHEN (d.doc_id * 7 + j.i * 13 + 1) % n.n = d.doc_id
                  THEN ((d.doc_id * 7 + j.i * 13 + 1) % n.n + 1) % n.n
                  ELSE (d.doc_id * 7 + j.i * 13 + 1) % n.n END AS dst
      FROM documents d, nn n, range(3) j(i)
      WHERE j.i <= d.doc_id % 3
    ),
    od AS (SELECT src AS node, count(*)::BIGINT AS outdeg
           FROM edges GROUP BY src),
    spine AS (
      SELECT d.doc_id AS node, coalesce(o.outdeg, 0)::BIGINT AS outdeg
      FROM documents d LEFT JOIN od o ON o.node = d.doc_id
    ),
    s0 AS (SELECT node, outdeg, 1000000000000 // n.n AS score
           FROM spine, nn n),
    c1 AS (SELECT e.dst AS node, sum(s.score // s.outdeg)::BIGINT AS contrib
           FROM edges e JOIN s0 s ON s.node = e.src
           WHERE s.outdeg > 0 GROUP BY e.dst),
    s1 AS (SELECT s.node, s.outdeg,
                  (15 * 1000000000000) // (100 * n.n)
                  + (85 * coalesce(c.contrib, 0)) // 100 AS score
           FROM s0 s LEFT JOIN c1 c ON c.node = s.node, nn n),
    c2 AS (SELECT e.dst AS node, sum(s.score // s.outdeg)::BIGINT AS contrib
           FROM edges e JOIN s1 s ON s.node = e.src
           WHERE s.outdeg > 0 GROUP BY e.dst),
    s2 AS (SELECT s.node, s.outdeg,
                  (15 * 1000000000000) // (100 * n.n)
                  + (85 * coalesce(c.contrib, 0)) // 100 AS score
           FROM s1 s LEFT JOIN c2 c ON c.node = s.node, nn n),
    c3 AS (SELECT e.dst AS node, sum(s.score // s.outdeg)::BIGINT AS contrib
           FROM edges e JOIN s2 s ON s.node = e.src
           WHERE s.outdeg > 0 GROUP BY e.dst),
    s3 AS (SELECT s.node, s.outdeg,
                  (15 * 1000000000000) // (100 * n.n)
                  + (85 * coalesce(c.contrib, 0)) // 100 AS score
           FROM s2 s LEFT JOIN c3 c ON c.node = s.node, nn n)
    SELECT node AS doc_id, outdeg, score AS pr_e12 FROM s3
    """,
)
def pagerank_link_graph_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph centrality as a document-quality prior (the PageRank
    signal web-curation pipelines rank crawl/seed quality by): 3
    fixed-point PageRank iterations over a deterministic formula link
    graph (doc d emits d%3+1 out-links to (d*7+j*13+1) mod N, self-loop
    redirected to the next node). Scores are integer mass out of 1e12
    with floor division everywhere, so the oracle can UNROLL the three
    iterations in SQL and match bit-exactly — no double accumulation
    anywhere. The per-iteration plan is the standard relational
    PageRank: edges⋈scores on src + aggregate on dst, both
    hash-partitioned; node count broadcast. Dangling-mass handling
    (absent from this all-emitting fixture) is pinned by pytest on a
    hand graph."""
    from modeltracking_spark.operators.graph import pagerank

    d = T(spark, sf_dir, "documents").select("doc_id")
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    e = (
        d.crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "__n",
            F.explode(
                F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
            ).alias("j"),
        )
        .selectExpr(
            "doc_id AS src",
            "CASE WHEN (doc_id*7 + j*13 + 1) % __n = doc_id "
            "THEN ((doc_id*7 + j*13 + 1) % __n + 1) % __n "
            "ELSE (doc_id*7 + j*13 + 1) % __n END AS dst",
        )
    )
    out = pagerank(e, nodes=d.select(F.col("doc_id").alias("node")), n_iter=3)
    return out.select(F.col("node").alias("doc_id"), "outdeg", "pr_e12")


@query(
    "curation_pipeline_docs",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
               AS n,
             coalesce(list_sum(list_transform(list_filter(string_split(text, ' '),
                 x -> x <> ''), t -> length(t))), 0)::BIGINT AS sl,
             len(list_distinct(list_filter(string_split(text, ' '),
                 x -> x <> '')))::BIGINT AS nd,
             len(list_distinct(list_filter(list_filter(string_split(text, ' '),
                 x -> x <> ''),
                 t -> list_contains(['the','a','of','and','to','in','is','on',
                                     'for','it'], t))))::BIGINT AS nstop,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT
               AS punct
      FROM documents
    ),
    surv AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN m USING (doc_id)
      WHERE m.n >= 30 AND m.n <= 100000 AND 3 * m.n <= m.sl
        AND m.sl <= 10 * m.n AND m.nstop >= 2 AND 10 * m.nd >= 3 * m.n
        AND m.punct * 10 <= m.n
    ),
    segs AS (
      SELECT doc_id,
             ((s.st - 1) // 64)::BIGINT AS chunk_idx,
             substr(text, s.st::INTEGER, 64) AS chunk_text
      FROM surv,
           unnest(range(1, greatest(length(text), 1) + 1, 64)) AS s(st)
    ),
    ranked AS (
      SELECT doc_id, chunk_idx, chunk_text,
             row_number() OVER (
               PARTITION BY chunk_text ORDER BY doc_id, chunk_idx
             ) AS rn
      FROM segs
    ),
    rebuilt AS (
      SELECT doc_id,
             sum(length(chunk_text))::BIGINT AS kept_chars,
             md5(string_agg(chunk_text, '' ORDER BY chunk_idx)) AS dedup_md5
      FROM ranked WHERE rn = 1
      GROUP BY doc_id
    ),
    uniq AS (
      SELECT doc_id, kept_chars
      FROM (SELECT *, row_number() OVER (
              PARTITION BY dedup_md5 ORDER BY doc_id) AS rn
            FROM rebuilt)
      WHERE rn = 1
    ),
    split AS (
      SELECT doc_id, kept_chars,
             CASE WHEN b < 9800 THEN 'train'
                  WHEN b < 9900 THEN 'valid'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, kept_chars,
                   ('0x' || substr(md5(doc_id::VARCHAR || 'cur'), 1, 8))::BIGINT
                     % 10000 AS b
            FROM uniq)
    )
    SELECT split, count(*)::BIGINT AS n_docs,
           sum(kept_chars)::BIGINT AS chars_kept,
           sum(doc_id)::BIGINT AS docid_sum
    FROM split GROUP BY split
    """,
)
def curation_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline — the operators composed the way a
    real pre-training data job chains them, in ONE DataFrame program
    planned by Catalyst as a single job: Gopher rule filter (keep only)
    → corpus-wide keep-first segment-dedup rewrite over the survivors →
    exact dedup of the rebuilt texts (first doc per content hash, empty
    rewrites dropped) → deterministic train/valid/test hash split →
    per-split volume summary. The oracle composes the same stages as
    chained CTEs, so stage BOUNDARIES (filter-before-dedup ordering,
    dedup over survivors only, split after dedup) are attested, not
    just each operator alone. Scale shape is the union of the parts:
    one narrow rule projection, one segment-hash window shuffle, one
    content-hash dedup shuffle, a narrow split, one summary aggregate."""
    from modeltracking_spark.operators.corpus import segment_dedup_rewrite
    from modeltracking_spark.operators.dedup import dedup_rows
    from modeltracking_spark.operators.sampling import hash_split
    from modeltracking_spark.operators.textops import gopher_rules

    docs = T(spark, sf_dir, "documents")
    keep = gopher_rules(docs).where(F.col("keep")).select("doc_id")
    surv = docs.join(keep, "doc_id").select("doc_id", "text")
    rewritten = segment_dedup_rewrite(surv, size=64).where(F.col("n_kept") > 0)
    uniq = dedup_rows(rewritten, ["dedup_md5"], "doc_id").select(
        "doc_id", "kept_chars"
    )
    split = hash_split(uniq, "doc_id", salt="cur")
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("kept_chars").cast("bigint").alias("chars_kept"),
        F.sum("doc_id").cast("bigint").alias("docid_sum"),
    )


@query(
    "bigram_logprob_docs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    pairs AS (
      SELECT doc_id, b['x'] AS x, b['y'] AS y
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                          i -> {{'x': toks[i], 'y': toks[i+1]}})) AS b
            FROM d)
    ),
    cxy AS (SELECT x, y, count(*)::BIGINT AS c_xy FROM pairs GROUP BY 1, 2),
    cx AS (SELECT x, sum(c_xy)::BIGINT AS c_x FROM cxy GROUP BY x),
    uni AS (SELECT unnest(toks) AS y FROM d),
    cu AS (SELECT y, count(*)::BIGINT AS c_y FROM uni GROUP BY y),
    t AS (SELECT sum(c_y)::BIGINT AS t_uni FROM cu),
    lm AS (
      SELECT b.x, b.y,
             floor(ln(0.7::DOUBLE * (b.c_xy::DOUBLE / x.c_x::DOUBLE)
                      + 0.3::DOUBLE * (u.c_y::DOUBLE / t.t_uni::DOUBLE))
                   * 1e6 + 0.5::DOUBLE)::BIGINT AS lp_e6
      FROM cxy b JOIN cx x USING (x) JOIN cu u USING (y), t
    )
    SELECT p.doc_id,
           count(*)::BIGINT AS n_pairs,
           sum(l.lp_e6)::BIGINT AS sum_lp_e6,
           sum(l.lp_e6)::DOUBLE / count(*)::DOUBLE / 1e6 AS avg_lp
    FROM pairs p JOIN lm l USING (x, y)
    GROUP BY p.doc_id
    """,
)
def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM document scoring (0.7·P(y|x) + 0.3·P(y)
    Jelinek-Mercer): the next rung above the unigram KenLM stand-in for
    CCNet-style quality ranking — context-sensitive, with unigram
    backoff keeping every observed pair finite. e6 fixed-point logprobs
    make per-doc sums order-independent; the bigram LM joins the pair
    grain by HASH join (vocab²-bounded side — broadcasting it would be
    the 100 TB bug), unigram/total sides broadcast."""
    from modeltracking_spark.operators.corpus import bigram_logprob

    return bigram_logprob(T(spark, sf_dir, "documents"))


@query(
    "personalized_pagerank_docs",
    oracle="""
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    ns AS (SELECT count(*)::BIGINT AS s FROM documents WHERE doc_id % 25 = 0),
    edges AS (
      SELECT d.doc_id AS src,
             CASE WHEN (d.doc_id * 7 + j.i * 13 + 1) % n.n = d.doc_id
                  THEN ((d.doc_id * 7 + j.i * 13 + 1) % n.n + 1) % n.n
                  ELSE (d.doc_id * 7 + j.i * 13 + 1) % n.n END AS dst
      FROM documents d, nn n, range(3) j(i)
      WHERE j.i <= d.doc_id % 3
    ),
    od AS (SELECT src AS node, count(*)::BIGINT AS outdeg
           FROM edges GROUP BY src),
    spine AS (
      SELECT d.doc_id AS node, coalesce(o.outdeg, 0)::BIGINT AS outdeg,
             d.doc_id % 25 = 0 AS seed
      FROM documents d LEFT JOIN od o ON o.node = d.doc_id
    ),
    s0 AS (SELECT node, outdeg, seed,
                  CASE WHEN seed THEN 1000000000000 // ns.s ELSE 0 END AS score
           FROM spine, ns),
    c1 AS (SELECT e.dst AS node, sum(s.score // s.outdeg)::BIGINT AS contrib
           FROM edges e JOIN s0 s ON s.node = e.src
           WHERE s.outdeg > 0 GROUP BY e.dst),
    s1 AS (SELECT s.node, s.outdeg, s.seed,
                  CASE WHEN s.seed
                       THEN (15 * 1000000000000) // (100 * ns.s) ELSE 0 END
                  + (85 * coalesce(c.contrib, 0)) // 100 AS score
           FROM s0 s LEFT JOIN c1 c ON c.node = s.node, ns),
    c2 AS (SELECT e.dst AS node, sum(s.score // s.outdeg)::BIGINT AS contrib
           FROM edges e JOIN s1 s ON s.node = e.src
           WHERE s.outdeg > 0 GROUP BY e.dst),
    s2 AS (SELECT s.node, s.outdeg, s.seed,
                  CASE WHEN s.seed
                       THEN (15 * 1000000000000) // (100 * ns.s) ELSE 0 END
                  + (85 * coalesce(c.contrib, 0)) // 100 AS score
           FROM s1 s LEFT JOIN c2 c ON c.node = s.node, ns),
    c3 AS (SELECT e.dst AS node, sum(s.score // s.outdeg)::BIGINT AS contrib
           FROM edges e JOIN s2 s ON s.node = e.src
           WHERE s.outdeg > 0 GROUP BY e.dst),
    s3 AS (SELECT s.node, s.outdeg, s.seed,
                  CASE WHEN s.seed
                       THEN (15 * 1000000000000) // (100 * ns.s) ELSE 0 END
                  + (85 * coalesce(c.contrib, 0)) // 100 AS score
           FROM s2 s LEFT JOIN c3 c ON c.node = s.node, ns)
    SELECT node AS doc_id, outdeg, score AS pr_e12 FROM s3
    """,
)
def personalized_pagerank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002) as seed-based quality
    propagation: restart mass flows only to the trusted seed set (every
    25th doc — scale-proportional), so scores measure link-proximity to
    curated sources, the trust signal seed-list pipelines rank crawl
    frontiers by. Same formula link graph and integral update as
    ``pagerank_link_graph_docs`` with N replaced by |S| on seed rows
    and a zero teleport elsewhere; the oracle unrolls the three
    iterations with the seed CASE, bit-exact."""
    from modeltracking_spark.operators.graph import pagerank

    d = T(spark, sf_dir, "documents").select("doc_id")
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    e = (
        d.crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "__n",
            F.explode(
                F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
            ).alias("j"),
        )
        .selectExpr(
            "doc_id AS src",
            "CASE WHEN (doc_id*7 + j*13 + 1) % __n = doc_id "
            "THEN ((doc_id*7 + j*13 + 1) % __n + 1) % __n "
            "ELSE (doc_id*7 + j*13 + 1) % __n END AS dst",
        )
    )
    seeds = d.where(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("node")
    )
    out = pagerank(
        e, nodes=d.select(F.col("doc_id").alias("node")), n_iter=3, seeds=seeds
    )
    return out.select(F.col("node").alias("doc_id"), "outdeg", "pr_e12")


@query(
    "bm25_topk_docs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    q AS (SELECT DISTINCT doc_id AS q_id, unnest(toks[1:6]) AS term
          FROM d WHERE doc_id % 100 = 7),
    tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
    tf AS (SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
           FROM tok GROUP BY 1, 2),
    stats AS (SELECT count(*) AS n_docs, sum(len(toks))::BIGINT AS sum_dl
              FROM d),
    vocab AS (SELECT DISTINCT term FROM q),
    tfq AS (SELECT tf.* FROM tf JOIN vocab USING (term)),
    dfreq AS (SELECT term, count(*) AS df FROM tfq GROUP BY term),
    scored AS (
      SELECT q.q_id, t.doc_id, count(*) AS n_terms_hit,
             sum(floor(
               ln(1.0::DOUBLE + (n_docs::DOUBLE - df::DOUBLE + 0.5::DOUBLE)
                                / (df::DOUBLE + 0.5::DOUBLE))
               * (tf::DOUBLE * ((12::DOUBLE / 10::DOUBLE) + 1.0::DOUBLE))
               / (tf::DOUBLE + (12::DOUBLE / 10::DOUBLE)
                  * ((1.0::DOUBLE - (75::DOUBLE / 100::DOUBLE))
                     + (75::DOUBLE / 100::DOUBLE)
                       * ((dl::DOUBLE * n_docs::DOUBLE) / sum_dl::DOUBLE)))
               * 1e6 + 0.5::DOUBLE)::BIGINT)::BIGINT AS bm25_e6
      FROM tfq t JOIN dfreq USING (term) JOIN q USING (term)
      CROSS JOIN stats
      GROUP BY 1, 2
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY bm25_e6 DESC, doc_id ASC) AS rk FROM scored)
    SELECT q_id, doc_id, n_terms_hit, bm25_e6, rk::BIGINT AS rk
    FROM r WHERE rk <= 5
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-5 per query over a corpus-derived deterministic
    query set (every doc_id % 100 == 7 contributes its first 6 tokens) —
    the lexical retriever behind RAG context selection and
    relevance-based corpus filters. Per-term scores are e6-floored
    before the per-doc BIGINT sum so ranking is engine-exact; the
    oracle replays idf/length-norm with identical association order
    (operators/retrieval.py)."""
    docs = T(spark, sf_dir, "documents")
    return bm25_topk(docs, queries_from_docs(docs), k=5)


@query(
    "dsir_select_docs",
    oracle=f"""
    WITH d AS (SELECT doc_id, (lang = 'en') AS is_target, {_TOKS} AS toks
               FROM documents),
    tokh AS (SELECT doc_id, is_target,
                    ('0x' || substr(md5(t.token), 1, 15))::BIGINT % 1024 AS h
             FROM d, unnest(toks) AS t(token)),
    counts AS (SELECT h,
                      sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS c_t,
                      count(*) AS c_r
               FROM tokh GROUP BY h),
    totals AS (SELECT sum(c_t)::BIGINT AS n_t, sum(c_r)::BIGINT AS n_r
               FROM counts),
    lm AS (SELECT h,
                  floor((ln((c_t + 1)::DOUBLE / (n_t + 1024)::DOUBLE)
                         - ln((c_r + 1)::DOUBLE / (n_r + 1024)::DOUBLE))
                        * 1e6 + 0.5::DOUBLE)::BIGINT AS r_e6
           FROM counts CROSS JOIN totals),
    per_doc AS (SELECT doc_id, count(*) AS n_tok, sum(r_e6)::BIGINT AS dsir_e6
                FROM tokh JOIN lm USING (h) GROUP BY doc_id),
    scored AS (SELECT d.doc_id, d.is_target,
                      coalesce(p.n_tok, 0)::BIGINT AS n_tok,
                      coalesce(p.dsir_e6, 0)::BIGINT AS dsir_e6
               FROM d LEFT JOIN per_doc p USING (doc_id)),
    n AS (SELECT count(*) AS n_docs FROM scored),
    r AS (SELECT *, row_number() OVER (ORDER BY dsir_e6 DESC, doc_id ASC)
                      AS rk FROM scored)
    SELECT doc_id, is_target, n_tok, dsir_e6, rk::BIGINT AS rk,
           (rk * 4 <= n_docs * 1) AS keep
    FROM r CROSS JOIN n
    """,
)
def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection toward the English slice: hashed-unigram
    log-likelihood ratio (target = lang='en' docs, raw = full corpus,
    add-1 smoothing over 1024 md5 buckets), deterministic top-25% keep.
    The oracle replays both hashed LMs and the keep rank; the engine's
    two-pass bucket-offset rank must land exactly on the naive global
    row_number (operators/corpus.py:dsir_logratio)."""
    docs = T(spark, sf_dir, "documents")
    return dsir_logratio(
        docs, F.col("lang") == "en", keep_frac_num=1, keep_frac_den=4
    )


@query(
    "merge_upsert_docs",
    oracle="""
    WITH upd AS (SELECT doc_id, 'UPD ' || text AS text, lang, source, n_chars
                 FROM documents WHERE doc_id % 10 = 3),
    ins AS (SELECT doc_id + 10000000 AS doc_id, 'NEW ' || text AS text,
                   lang, source, n_chars
            FROM documents WHERE doc_id % 25 = 0),
    delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    merged AS (
      SELECT coalesce(d.doc_id, s.doc_id) AS doc_id,
             coalesce(d.text, s.text) AS text,
             coalesce(d.lang, s.lang) AS lang,
             coalesce(d.source, s.source) AS source,
             coalesce(d.n_chars, s.n_chars) AS n_chars,
             CASE WHEN d.doc_id IS NOT NULL AND s.doc_id IS NOT NULL
                    THEN 'updated'
                  WHEN d.doc_id IS NOT NULL THEN 'inserted'
                  ELSE 'kept' END AS merge_op
      FROM documents s FULL OUTER JOIN delta d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, lang, source, md5(text) AS text_md5, n_chars, merge_op
    FROM merged
    """,
)
def merge_upsert_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE INTO semantics over the corpus: a deterministic
    daily delta (every doc_id%10==3 updated with an 'UPD ' prefix; every
    doc_id%25==0 re-inserted under a shifted id) merged into the
    snapshot via the single-shuffle union+window upsert
    (operators/merge.py). The oracle derives the SAME result through an
    INDEPENDENT formulation — a full-outer-join coalesce — so the hash
    match proves the scalable decomposition implements MERGE exactly,
    op tags included."""
    from modeltracking_spark.operators.merge import merge_upsert

    docs = T(spark, sf_dir, "documents")
    upd = docs.where(F.col("doc_id") % 10 == 3).withColumn(
        "text", F.concat(F.lit("UPD "), F.col("text"))
    )
    ins = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(F.lit("NEW "), F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    merged = merge_upsert(docs, upd.unionByName(ins), "doc_id")
    return merged.select(
        "doc_id", "lang", "source",
        F.md5("text").alias("text_md5"), "n_chars", "merge_op",
    )


# ---- quality-classifier oracle: 2 GD iterations unrolled in SQL ----
# (the PageRank/Lloyd replay discipline: e6-floored per-row gradient
# contributions -> BIGINT sums -> floored weight updates; z and sigmoid
# written with the exact association order of operators/classifier.py)

_LR_STOP_IN = "('the','a','of','and','to','in','is','on','for','it')"
_LR_FEATS = f"""
    f AS (
      SELECT doc_id,
             CASE WHEN floor(((CASE WHEN n > 0 THEN nd / n ELSE 0.0 END)
                              + least(n / 64.0, 1.0)
                              + (1.0 - abs(stop - 0.2))) / 3.0 * 1e6
                            + 0.5)::BIGINT >= 720000
                  THEN 1 ELSE 0 END AS y,
             1.0::DOUBLE AS x0,
             stop AS x1,
             least(n / 64.0, 1.0) AS x2,
             (length(replace(text, ' ', ''))::DOUBLE
              / greatest(len(toks), 1)::DOUBLE) / 16.0 AS x3
      FROM (SELECT doc_id, text, {_TOKS} AS toks,
                   len({_TOKS})::DOUBLE AS n,
                   len(list_distinct({_TOKS}))::DOUBLE AS nd,
                   len(list_filter({_TOKS}, t -> t IN {_LR_STOP_IN}))::DOUBLE
                     / greatest(len({_TOKS}), 1)::DOUBLE AS stop
            FROM documents)
    )"""
_LR_Z = (
    "((((w0::DOUBLE / 1e6) * x0 + (w1::DOUBLE / 1e6) * x1)"
    " + (w2::DOUBLE / 1e6) * x2) + (w3::DOUBLE / 1e6) * x3)"
)
_LR_SIG = f"1.0::DOUBLE / (1.0::DOUBLE + exp(0.0::DOUBLE - {_LR_Z}))"


def _lr_iter_sql(prev: str, i: int, lr_num: int = 4, lr_den: int = 1) -> str:
    """One GD iteration: weights {prev} (w0..w3) -> lw{i} (w0..w3)."""
    gsum = ", ".join(
        f"sum(floor((sig - y::DOUBLE) * x{j} * 1e6 + 0.5::DOUBLE)::BIGINT)::BIGINT"
        f" AS g{j}"
        for j in range(4)
    )
    pw = ", ".join(f"any_value(w{j}) AS pw{j}" for j in range(4))
    upd = ", ".join(
        f"pw{j} - floor(({lr_num} * g{j})::DOUBLE / ({lr_den} * n)::DOUBLE)::BIGINT"
        f" AS w{j}"
        for j in range(4)
    )
    return f"""
    s{i} AS (
      SELECT f.*, w.w0, w.w1, w.w2, w.w3, {_LR_SIG} AS sig
      FROM f CROSS JOIN {prev} w
    ),
    g{i} AS (SELECT count(*) AS n, {pw}, {gsum} FROM s{i}),
    lw{i} AS (SELECT {upd} FROM g{i})"""


_LR_ORACLE = f"""
    WITH {_LR_FEATS},
    lw0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1,
                   0::BIGINT AS w2, 0::BIGINT AS w3),
    {_lr_iter_sql("lw0", 1)},
    {_lr_iter_sql("lw1", 2)}
    SELECT doc_id, y,
           floor(({_LR_SIG}) * 1e6 + 0.5::DOUBLE)::BIGINT AS score_e6,
           (floor(({_LR_SIG}) * 1e6 + 0.5::DOUBLE)::BIGINT >= 500000)::INTEGER
             AS pred
    FROM f CROSS JOIN lw2 w
"""


@query("quality_logreg_docs", oracle=_LR_ORACLE)
def quality_logreg_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier DISTILLATION inside the engine: the label is
    the rule-based quality heuristic thresholded at its corpus median
    (quality_e6 >= 0.72 — the distill-an-expensive-scorer-into-a-cheap-
    linear-model step real curation pipelines run), and two batch
    gradient-descent iterations of logistic regression (features:
    stopword ratio, capped length score, scaled mean token length) run
    as pure DataFrame aggregates — weights live in a 1-row broadcast
    relation, never on the driver — then one full-corpus scoring pass
    (~80% agreement with the teacher heuristic, asserted in pytest).
    The oracle unrolls BOTH iterations and the scoring in SQL
    (e6-floored gradient contributions, BIGINT sums, floored updates),
    so training is attested end to end, not just the final scores
    (operators/classifier.py)."""
    from modeltracking_spark.functions.text import tokens
    from modeltracking_spark.operators.classifier import (
        doc_features,
        score_quality_logreg,
        train_quality_logreg,
    )
    from modeltracking_spark.operators.textops import stopword_ratio

    toks = tokens("text")
    n = F.size(toks).cast("double")
    q = (
        F.when(n > 0, F.size(F.array_distinct(toks)).cast("double") / n)
        .otherwise(F.lit(0.0))
        + F.least(n / F.lit(64.0), F.lit(1.0))
        + (F.lit(1.0) - F.abs(stopword_ratio("text") - F.lit(0.2)))
    ) / F.lit(3.0)
    label = F.floor(q * 1e6 + 0.5).cast("long") >= 720_000
    # materialize the tokenize+feature pass ONCE (the bigram-LM lesson):
    # both GD iterations and the scoring pass reuse the 5-double rows
    feats = doc_features(
        T(spark, sf_dir, "documents"), label_pred=label
    ).localCheckpoint()
    w = train_quality_logreg(feats, iters=2)
    return score_quality_logreg(feats, w)


@query(
    "scd2_history_docs",
    oracle="""
    WITH upd AS (SELECT doc_id, 'UPD ' || text AS text, lang
                 FROM documents WHERE doc_id % 10 = 3),
    noop AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 20 = 7),
    ins AS (SELECT doc_id + 10000000 AS doc_id, 'NEW ' || text AS text, lang
            FROM documents WHERE doc_id % 25 = 0),
    delta AS (SELECT * FROM upd UNION ALL SELECT * FROM noop
              UNION ALL SELECT * FROM ins),
    j AS (SELECT h.doc_id AS ck, d.doc_id AS dk,
                 h.text AS ct, h.lang AS cl, d.text AS dt, d.lang AS dl2
          FROM documents h FULL OUTER JOIN delta d ON h.doc_id = d.doc_id),
    unchanged AS (
      SELECT ck AS doc_id, ct AS text, cl AS lang,
             '2024-01-01' AS valid_from, NULL::VARCHAR AS valid_to,
             TRUE AS is_current, 'unchanged' AS scd_op
      FROM j WHERE ck IS NOT NULL
               AND (dk IS NULL OR (ct IS NOT DISTINCT FROM dt AND cl IS NOT DISTINCT FROM dl2))),
    closed AS (
      SELECT ck AS doc_id, ct AS text, cl AS lang,
             '2024-01-01' AS valid_from, '2024-02-01' AS valid_to,
             FALSE AS is_current, 'closed' AS scd_op
      FROM j WHERE ck IS NOT NULL AND dk IS NOT NULL
               AND NOT (ct IS NOT DISTINCT FROM dt AND cl IS NOT DISTINCT FROM dl2)),
    opened AS (
      SELECT dk AS doc_id, dt AS text, dl2 AS lang,
             '2024-02-01' AS valid_from, NULL::VARCHAR AS valid_to,
             TRUE AS is_current, 'opened' AS scd_op
      FROM j WHERE dk IS NOT NULL
               AND (ck IS NULL OR NOT (ct IS NOT DISTINCT FROM dt AND cl IS NOT DISTINCT FROM dl2))),
    hist2 AS (SELECT * FROM unchanged UNION ALL SELECT * FROM closed
              UNION ALL SELECT * FROM opened)
    SELECT doc_id, md5(text) AS text_md5, lang,
           valid_from, valid_to, is_current, scd_op
    FROM hist2
    """,
)
def scd2_history_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 versioned history: the all-current corpus snapshot
    takes a delta batch (updates at doc_id%10==3, no-op re-sends at
    %20==7, inserts at %25==0 shifted) — changed keys close their
    version and open a new one; no-op re-sends stay untouched. The
    oracle derives the same table by direct attr comparison over an
    independent full-outer formulation, so the md5-based change
    detection in operators/merge.py:scd2_apply is cross-checked, tags
    and both validity dates included."""
    from modeltracking_spark.operators.merge import scd2_apply

    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    history = docs.select(
        "doc_id", "text", "lang",
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = docs.where(F.col("doc_id") % 10 == 3).withColumn(
        "text", F.concat(F.lit("UPD "), F.col("text"))
    )
    noop = docs.where(F.col("doc_id") % 20 == 7)
    ins = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(F.lit("NEW "), F.col("text")).alias("text"),
        "lang",
    )
    out = scd2_apply(
        history, upd.unionByName(noop).unionByName(ins),
        "doc_id", ["text", "lang"], "2024-02-01",
    )
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "lang",
        "valid_from", "valid_to", "is_current", "scd_op",
    )


@query(
    "triangle_counts_docs",
    oracle="""
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    edges AS (
      SELECT d.doc_id AS src,
             CASE WHEN (d.doc_id * 7 + j.i * 13 + 1) % n.n = d.doc_id
                  THEN ((d.doc_id * 7 + j.i * 13 + 1) % n.n + 1) % n.n
                  ELSE (d.doc_id * 7 + j.i * 13 + 1) % n.n END AS dst
      FROM documents d, nn n, range(3) j(i)
      WHERE j.i <= d.doc_id % 3
    ),
    und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM edges WHERE src <> dst),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e3.v AS c
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    m AS (SELECT unnest([a, b, c]) AS node FROM tri)
    SELECT node, count(*) AS n_tri FROM m GROUP BY node
    """,
)
def triangle_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the SAME deterministic formula link
    graph PageRank scores (doc d emits d%3+1 links to (d*7+j*13+1) mod
    N) — the clustering-coefficient numerator web-curation uses beside
    centrality. Canonical a<b<c orientation: each triangle found once
    by two hash equi-joins, then every member credited
    (operators/graph.py:triangle_count)."""
    from modeltracking_spark.operators.graph import triangle_count

    d = T(spark, sf_dir, "documents").select("doc_id")
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    raw = (
        d.crossJoin(F.broadcast(nn))
        .select(
            "doc_id", "__n",
            F.explode(
                F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
            ).alias("j"),
        )
        .withColumn("__t", (F.col("doc_id") * 7 + F.col("j") * 13 + 1) % F.col("__n"))
        .select(
            F.col("doc_id").alias("src"),
            F.when(F.col("__t") == F.col("doc_id"),
                   (F.col("__t") + 1) % F.col("__n"))
            .otherwise(F.col("__t")).alias("dst"),
        )
    )
    return triangle_count(raw)


@query(
    "inverted_index_docs",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, unnest({_TOKS}) AS term FROM documents
    )
    SELECT term, count(*) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM pairs GROUP BY term
    """,
)
def inverted_index_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted index as a first-class artifact: term -> df +
    SORTED posting list (canonical csv — collect_list order is
    nondeterministic, sort_array makes it engine-exact). The structure
    BM25 serves from, materialized and byte-attested
    (operators/retrieval.py:inverted_index)."""
    from modeltracking_spark.operators.retrieval import inverted_index

    return inverted_index(T(spark, sf_dir, "documents"))


@query(
    "funnel_conversion_events",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS vts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS cts
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.vts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS pts
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.cts
          GROUP BY e.user_id)
    SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
           (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_full_funnel
    """,
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): per user
    the earliest view, the earliest click strictly AFTER it, the
    earliest purchase strictly after that — the sequential-pattern
    aggregate product analytics runs. Three per-user min aggregates
    chained by hash joins on user_id; counts only in the output, so no
    timestamp rendering crosses engines."""
    ev = T(spark, sf_dir, "events")
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("vts")))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("vts"))
        .groupBy("user_id").agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("cts"))
        .groupBy("user_id").agg(F.min("ts").alias("pts"))
    )
    n_users = ev.agg(F.count_distinct("user_id").alias("n_users"))
    return (
        n_users
        .crossJoin(F.broadcast(v.agg(F.count(F.lit(1)).alias("n_view"))))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_full_funnel"))))
    )


# ---- evaluation-metrics oracles (round 7): the scored relation is the
# full logreg-training oracle nested as a parenthesized subquery (DuckDB
# allows a WITH chain inside a derived table), then confusion counts,
# ratio metrics with mirrored association order, and the tie-aware rank
# AUC whose numerator stays in BIGINT.
_LR_SCORED = f"({_LR_ORACLE})"


@query(
    "classifier_eval_suite",
    oracle=f"""
    WITH scored AS (SELECT * FROM {_LR_SCORED} s0),
    conf AS (
      SELECT count(*)::BIGINT AS n,
             sum(y)::BIGINT AS n_pos,
             sum(1 - y)::BIGINT AS n_neg,
             sum(y * (score_e6 >= 500000)::INTEGER)::BIGINT AS tp,
             sum((1 - y) * (score_e6 >= 500000)::INTEGER)::BIGINT AS fp,
             sum((1 - y) * (1 - (score_e6 >= 500000)::INTEGER))::BIGINT AS tn,
             sum(y * (1 - (score_e6 >= 500000)::INTEGER))::BIGINT AS fn
      FROM scored
    ),
    ps AS (SELECT score_e6 AS s, count(*)::BIGINT AS c,
                  sum(y)::BIGINT AS p
           FROM scored GROUP BY 1),
    rk AS (SELECT *, sum(c) OVER (ORDER BY s
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
           FROM ps),
    aucp AS (SELECT sum(p * (2 * (cum - c) + c + 1))::BIGINT AS two_sum
             FROM rk)
    SELECT n, n_pos, n_neg, tp, fp, tn, fn,
           floor((tp + tn)::DOUBLE / n::DOUBLE * 1e6 + 0.5::DOUBLE)::BIGINT
             AS acc_e6,
           CASE WHEN tp + fp > 0
                THEN floor(tp::DOUBLE / (tp + fp)::DOUBLE * 1e6
                           + 0.5::DOUBLE)::BIGINT END AS prec_e6,
           CASE WHEN n_pos > 0
                THEN floor(tp::DOUBLE / n_pos::DOUBLE * 1e6
                           + 0.5::DOUBLE)::BIGINT END AS rec_e6,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN floor((2 * tp)::DOUBLE / (2 * tp + fp + fn)::DOUBLE
                           * 1e6 + 0.5::DOUBLE)::BIGINT END AS f1_e6,
           CASE WHEN 2 * n_pos * n_neg > 0
                THEN floor((two_sum - n_pos * (n_pos + 1))::DOUBLE
                           / (2 * n_pos * n_neg)::DOUBLE * 1e6
                           + 0.5::DOUBLE)::BIGINT END AS auc_e6
    FROM conf, aucp
    """,
)
def classifier_eval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation metrics over the in-engine quality classifier
    (operators/evalmetrics.py — the measurement half every curation
    ablation needs): confusion counts at the 0.5 threshold, accuracy/
    precision/recall/F1 as e6-floored mirrored-association ratios (F1
    via the integer identity 2tp/(2tp+fp+fn)), and EXACT tie-aware ROC
    AUC by the rank formula — the BIGINT numerator Σp·(2·before+c+1)
    makes it order-independent, so the whole report hash-matches. The
    oracle nests the full logreg training replay as the scored
    relation, then derives every metric independently in SQL. Scale:
    one corpus aggregate + one bounded per-score aggregate + a window
    over the bounded score table."""
    from modeltracking_spark.operators.evalmetrics import (
        binary_classification_report,
    )
    from modeltracking_spark.queries.corpus_q import quality_logreg_docs

    scored = quality_logreg_docs(spark, sf_dir)
    return binary_classification_report(
        scored, label_col="y", score_col="score_e6", threshold_e6=500_000
    )


@query(
    "classifier_calibration_bins",
    oracle=f"""
    WITH scored AS (SELECT * FROM {_LR_SCORED} s0)
    SELECT least(9, floor(score_e6 * 10 / 1000001)::BIGINT) AS bin,
           count(*)::BIGINT AS n,
           sum(y)::BIGINT AS n_pos,
           floor(sum(score_e6)::DOUBLE / count(*)::DOUBLE
                 + 0.5::DOUBLE)::BIGINT AS mean_score_e6,
           floor(sum(y)::DOUBLE / count(*)::DOUBLE * 1e6
                 + 0.5::DOUBLE)::BIGINT AS pos_rate_e6
    FROM scored
    GROUP BY 1
    """,
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the quality classifier: 10
    equal-width e6-score bins with count, exact-integer mean predicted
    score, and observed positive rate — the calibration check run
    before trusting a filter threshold (operators/evalmetrics.py:
    calibration_bins). Bounded 10-row output from one aggregate; the
    oracle re-derives the bins from the nested training replay."""
    from modeltracking_spark.operators.evalmetrics import calibration_bins
    from modeltracking_spark.queries.corpus_q import quality_logreg_docs

    scored = quality_logreg_docs(spark, sf_dir)
    return calibration_bins(scored, label_col="y", score_col="score_e6")


@query(
    "dup_span_scrub_docs",
    oracle="""
    WITH docs_l AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS l
      FROM documents
    ),
    toks AS (
      SELECT doc_id, p.i::BIGINT AS pos, l[p.i::INTEGER + 1] AS tok
      FROM docs_l, range(128) p(i) WHERE p.i < len(l)
    ),
    grams AS (
      SELECT doc_id, p.i::BIGINT AS pos,
             array_to_string(l[p.i::INTEGER + 1 : p.i::INTEGER + 8],
                             chr(31)) AS g
      FROM docs_l, range(128) p(i) WHERE p.i <= len(l) - 8
    ),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    dstarts AS (
      SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dupg)
    ),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + 7
                  THEN 1 ELSE 0 END AS brk
      FROM dstarts
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    covered AS (
      SELECT DISTINCT doc_id, pos + o.i AS cpos
      FROM dstarts, range(8) o(i)
    ),
    stats AS (
      SELECT i.doc_id, sum(i.brk)::BIGINT AS n_dup_spans,
             (SELECT count(*) FROM covered c
              WHERE c.doc_id = i.doc_id)::BIGINT AS n_removed
      FROM isl i GROUP BY i.doc_id
    ),
    rebuilt AS (
      SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean
      FROM toks t
      LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.cpos = t.pos
      WHERE c.cpos IS NULL
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, len(d.l)::BIGINT AS n_tokens,
           coalesce(s.n_dup_spans, 0)::BIGINT AS n_dup_spans,
           coalesce(s.n_removed, 0)::BIGINT AS n_removed,
           md5(coalesce(r.clean, '')) AS clean_md5
    FROM docs_l d
    LEFT JOIN stats s USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def dup_span_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment-free duplicated-substring SPAN scrub (round 8): token
    8-grams occurring >= 2 times corpus-wide mark every covered token
    dirty; overlapping dirty windows merge into maximal spans; the
    rewrite drops dirty tokens and re-joins survivors — Lee et al.'s
    ExactSubstr semantics at k-gram granularity, catching the
    shifted-alignment copies the fixed-chunk tier
    (``line_dedup_rewrite_docs``) structurally cannot see. The oracle
    recomputes spans through a DIFFERENT shape — gaps-and-islands lag
    window + a distinct covered-position join vs the engine's
    ``F.aggregate`` interval fold + ``F.exists`` filter — and compares
    the rebuilt text md5 byte-exactly, so the span merge, per-token
    coverage, and reconstruction order are attested independently, not
    formula-replayed (operators/corpus.py:dup_span_scrub; the 128-token
    unroll bound over every shipped sf dir is pinned in
    tests/test_corpus.py)."""
    from modeltracking_spark.operators.corpus import dup_span_scrub

    return dup_span_scrub(T(spark, sf_dir, "documents"), k=8)


@query(
    "click_error_interval_left_join",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts
               FROM events WHERE event_type = 'click'),
         e AS (SELECT user_id AS e_user_id, event_id AS error_id,
                      ts AS ets
               FROM events WHERE event_type = 'error')
    SELECT c.user_id, click_id, error_id,
           CASE WHEN error_id IS NULL THEN NULL
                ELSE floor(epoch(ets))::BIGINT - floor(epoch(cts))::BIGINT
           END AS lag_s,
           error_id IS NOT NULL AS matched
    FROM c LEFT JOIN e ON c.user_id = e.e_user_id
                      AND ets >= cts AND ets <= cts + INTERVAL 6 HOUR
    """,
)
def click_error_interval_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT-OUTER stream-stream interval join (r8):
    every click, paired with its in-window errors or emitted once with
    NULL error/lag — the error-free-click detector. On a stream the
    unmatched rows emit only after the error-side watermark proves the
    lag window closed (state-eviction-driven nulls, the documented
    outer stream-stream contract); the REAL-stream flush is driven by a
    far-future sentinel in tests/test_streaming.py
    (streaming/windows.py:interval_join_clicks_errors, how='leftOuter')."""
    from pyspark.sql import functions as F

    from modeltracking_spark.streaming.windows import interval_join_clicks_errors

    ev = T(spark, sf_dir, "events")
    return interval_join_clicks_errors(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "error"),
        how="leftOuter",
    )


@query(
    "click_error_interval_stallproof",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts
               FROM events WHERE event_type = 'click'),
         e AS (SELECT user_id AS e_user_id, event_id AS error_id,
                      ts AS ets
               FROM events WHERE event_type = 'error')
    SELECT c.user_id, click_id, error_id,
           CASE WHEN error_id IS NULL THEN NULL
                ELSE floor(epoch(ets))::BIGINT - floor(epoch(cts))::BIGINT
           END AS lag_s,
           error_id IS NOT NULL AS matched
    FROM c LEFT JOIN e ON c.user_id = e.e_user_id
                      AND ets >= cts AND ets <= cts + INTERVAL 6 HOUR
    """,
)
def click_error_interval_stallproof(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Batch twin of the watermark-STALL-PROOF outer interval join
    (r9): identical join semantics to click_error_interval_left_join —
    the oracle is deliberately the same SQL — but the watermark sits
    UPSTREAM of the per-type filters, so on a real stream a silent
    error side cannot stall the global watermark and buffer the outer
    rows forever (the r8 production pitfall promoted into the operator;
    silent-side flush + legacy-shape stall both pinned in
    tests/test_streaming.py). streaming/windows.py:
    interval_join_from_events."""
    from modeltracking_spark.streaming.windows import (
        interval_join_from_events,
    )

    ev = T(spark, sf_dir, "events")
    return interval_join_from_events(ev, how="leftOuter")


@query(
    "label_propagation_docs",
    oracle="""
    WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    raw AS (
      SELECT d.doc_id AS src,
             CASE WHEN (d.doc_id * 7 + j.i * 13 + 1) % n.n = d.doc_id
                  THEN ((d.doc_id * 7 + j.i * 13 + 1) % n.n + 1) % n.n
                  ELSE (d.doc_id * 7 + j.i * 13 + 1) % n.n END AS dst
      FROM documents d, nn n, range(3) j(i)
      WHERE j.i <= d.doc_id % 3
    ),
    sym AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
      ) WHERE src != dst
    ),
    l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents),
    v1 AS (SELECT s.dst AS node, l.label, count(*)::BIGINT AS cnt
           FROM sym s JOIN l0 l ON l.node = s.src GROUP BY s.dst, l.label),
    p1 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY cnt DESC, label) AS rn
             FROM v1) WHERE rn = 1),
    l1 AS (SELECT l.node, coalesce(p.label, l.label) AS label
           FROM l0 l LEFT JOIN p1 p USING (node)),
    v2 AS (SELECT s.dst AS node, l.label, count(*)::BIGINT AS cnt
           FROM sym s JOIN l1 l ON l.node = s.src GROUP BY s.dst, l.label),
    p2 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY cnt DESC, label) AS rn
             FROM v2) WHERE rn = 1),
    l2 AS (SELECT l.node, coalesce(p.label, l.label) AS label
           FROM l1 l LEFT JOIN p2 p USING (node)),
    v3 AS (SELECT s.dst AS node, l.label, count(*)::BIGINT AS cnt
           FROM sym s JOIN l2 l ON l.node = s.src GROUP BY s.dst, l.label),
    p3 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY cnt DESC, label) AS rn
             FROM v3) WHERE rn = 1),
    l3 AS (SELECT l.node, coalesce(p.label, l.label) AS label
           FROM l2 l LEFT JOIN p3 p USING (node)),
    v4 AS (SELECT s.dst AS node, l.label, count(*)::BIGINT AS cnt
           FROM sym s JOIN l3 l ON l.node = s.src GROUP BY s.dst, l.label),
    p4 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY cnt DESC, label) AS rn
             FROM v4) WHERE rn = 1),
    l4 AS (SELECT l.node, coalesce(p.label, l.label) AS label
           FROM l3 l LEFT JOIN p4 p USING (node)),
    sizes AS (SELECT label, count(*)::BIGINT AS comm_size
              FROM l4 GROUP BY label)
    SELECT l.node AS doc_id, l.label AS community, s.comm_size
    FROM l4 l JOIN sizes s USING (label)
    """,
)
def label_propagation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the link graph by SYNCHRONOUS label
    propagation (round 9, operators/graph.py:label_propagation —
    Raghavan/Albert/Kumara 2007, deterministic min-tie variant): 4
    rounds of adopt-the-most-frequent-neighbor-label over the same
    deterministic formula link graph the PageRank query uses,
    symmetrized and deduped. Every round is edges-join-labels + ONE
    (node, label) count + ONE argmax via min(struct(-cnt, label)) —
    no window operator, per-round checkpoint, the pagerank iteration
    discipline — so the oracle UNROLLS all four rounds relationally
    (row_number argmax) and matches label-for-label. Communities are
    web-curation's cheap crawl-cluster signal (link farms, mirror
    families) beside the centrality prior."""
    from modeltracking_spark.operators.graph import label_propagation

    d = T(spark, sf_dir, "documents").select("doc_id")
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    e = (
        d.crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "__n",
            F.explode(
                F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
            ).alias("j"),
        )
        .selectExpr(
            "doc_id AS src",
            "CASE WHEN (doc_id*7 + j*13 + 1) % __n = doc_id "
            "THEN ((doc_id*7 + j*13 + 1) % __n + 1) % __n "
            "ELSE (doc_id*7 + j*13 + 1) % __n END AS dst",
        )
    )
    out = label_propagation(
        e, nodes=d.select(F.col("doc_id").alias("node")), n_iter=4
    )
    return out.select(
        F.col("node").alias("doc_id"), "community", "comm_size"
    )
