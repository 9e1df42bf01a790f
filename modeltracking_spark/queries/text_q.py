"""Text-analysis queries (extension surface, SURVEY.md §2.12): metrics,
quality scoring, heuristic language ID, corpus token frequencies — all
JVM column expressions, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modeltracking_spark.functions.text import STOPWORDS, stopword_ratio, tokens
from modeltracking_spark.operators.textops import (
    LANG_MARKERS,
    text_metrics,
    token_frequencies,
)
from modeltracking_spark.queries.common import T, query

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_STOPS = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@query(
    "text_metrics_docs",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           len(list_distinct({_TOKS})) AS n_distinct_tokens,
           CASE WHEN len({_TOKS}) > 0
                THEN list_sum(list_transform({_TOKS}, t -> length(t)))::DOUBLE
                     / len({_TOKS})::DOUBLE
                ELSE 0.0 END AS avg_word_len,
           length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_count,
           len(list_filter({_TOKS}, t -> list_contains({_STOPS}, t)))::DOUBLE
             / greatest(len({_TOKS}), 1)::DOUBLE AS stop_ratio,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def text_metrics_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char/quality metric columns per document — whole-stage-
    codegen column expressions, no Python in the hot path."""
    d = T(spark, sf_dir, "documents")
    out = text_metrics(d, "text")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        "avg_word_len",
        F.col("punct_count").cast("long").alias("punct_count"),
        "stop_ratio",
        "fingerprint",
    )


@query(
    "quality_scores_docs",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len({_TOKS})::DOUBLE AS n,
             len(list_distinct({_TOKS}))::DOUBLE AS nd,
             len(list_filter({_TOKS}, t -> list_contains({_STOPS}, t)))::DOUBLE
               / greatest(len({_TOKS}), 1)::DOUBLE AS stop
      FROM documents
    )
    SELECT doc_id,
           floor(((CASE WHEN n > 0 THEN nd / n ELSE 0.0 END)
                  + least(n / 64.0, 1.0)
                  + (1.0 - abs(stop - 0.2))) / 3.0 * 1e6 + 0.5)::BIGINT
             AS quality_e6
    FROM m
    """,
)
def quality_scores_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (diversity + length + stopword-sanity)
    scaled to e6 fixed point with floor(x*1e6+0.5) — engine-exact without
    relying on cross-engine round() half-rules."""
    d = T(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("double")
    diversity = F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(F.lit(0.0))
    length_score = F.least(n / F.lit(64.0), F.lit(1.0))
    stop_score = F.lit(1.0) - F.abs(stopword_ratio("text") - F.lit(0.2))
    q = (diversity + length_score + stop_score) / F.lit(3.0)
    return d.select(
        "doc_id", F.floor(q * 1e6 + 0.5).cast("long").alias("quality_e6")
    )


def _markers_sql() -> str:
    # one VALUES row per language, priority descending in declaration order
    n = len(LANG_MARKERS)
    rows = ", ".join(
        f"('{lang}', {n - i}, [{', '.join(repr(m) for m in markers)}])"
        for i, (lang, markers) in enumerate(LANG_MARKERS.items())
    )
    return f"markers(lang, prio, words) AS (VALUES {rows})"


@query(
    "lang_id_docs",
    oracle=f"""
    WITH {_markers_sql()},
    scored AS (
      SELECT d.doc_id, d.lang AS lang_actual, m.lang,
             len(list_intersect(list_distinct({_TOKS}), m.words)) AS hits,
             m.prio
      FROM documents d CROSS JOIN markers m
    ),
    best AS (
      SELECT doc_id, lang_actual, lang, hits
      FROM scored
      QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY hits DESC, prio DESC) = 1
    )
    SELECT doc_id, lang_actual,
           CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred
    FROM best
    """,
)
def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram-heuristic tier) with the explicit
    en>de>fr>es tie-break; emitted next to the actual label so accuracy is
    auditable from the result."""
    from modeltracking_spark.operators.textops import lang_id_heuristic

    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        lang_id_heuristic("text").alias("lang_pred"),
    )


_WIN_SLICE = "list_slice(hs, j, j + 4)"
_WIN_FP = (
    f"((j + len({_WIN_SLICE}) - list_position(list_reverse({_WIN_SLICE}), "
    f"list_min({_WIN_SLICE})))::BIGINT << 31) + list_min({_WIN_SLICE})"
)


@query(
    "winnow_fingerprints_docs",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(
               list_transform(
                 range(1, greatest(length(norm) - 6, 1) + 1),
                 i -> substr(norm, i::INTEGER, 7)),
               gr -> list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(string_split(gr, ''), c -> ascii(c)::BIGINT)),
                 (a, x) -> (a * 257 + x) % 2147483647)
             ) AS hs
      FROM g
    ),
    sel AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(hs) - 4, 1) + 1),
               j -> {_WIN_FP})) AS fps
      FROM h
    )
    SELECT doc_id AS id, fp >> 31 AS pos, fp & 2147483647 AS fp_hash
    FROM sel, unnest(fps) AS u(fp)
    """,
)
def winnow_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (MOSS): 7-gram polynomial
    rolling hashes, rightmost-min over windows of 5, distinct
    (pos, hash) — replicated in DuckDB down to the hash arithmetic.
    A pure narrow map (no shuffle): the 100 TB fingerprint pass."""
    from modeltracking_spark.operators.textops import winnow_fingerprints

    d = T(spark, sf_dir, "documents")
    return winnow_fingerprints(d, "text", "doc_id", k=7, window=5)


@query(
    "token_frequencies_docs",
    oracle=f"""
    SELECT t.tok AS token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
    FROM documents, unnest({_TOKS}) AS t(tok)
    GROUP BY 1
    """,
)
def token_frequencies_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency + document frequency — the one-shuffle word
    count (map-side combinable)."""
    d = T(spark, sf_dir, "documents")
    return token_frequencies(d, "text")


@query(
    "length_quantiles_by_lang",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.50), 6) AS p50,
           round(quantile_cont(n_chars, 0.75), 6) AS p75,
           round(quantile_cont(n_chars, 0.95), 6) AS p95
    FROM documents
    GROUP BY lang
    """,
)
def length_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation quantiles of doc length per language —
    the length-distribution profile a corpus-curation pass starts from.
    Spark's `percentile` and DuckDB's `quantile_cont` share the
    continuous-quantile definition, so values hash-match after the
    rounding discipline. (At 100 TB swap in `approx_percentile`, which
    trades the exact sort for a t-digest-style mergeable sketch — kept
    exact here so the oracle stays bit-checkable.)"""
    d = T(spark, sf_dir, "documents")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.round(
                F.expr(f"percentile(n_chars, {q})"), 6
            ).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.50, 0.75, 0.95)
        ],
    )
    return agg


@query(
    "bpe_token_counts",
    oracle="""
    SELECT doc_id,
           length(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           length(list_filter(string_split(text, ' '), x -> x <> ''))
             AS n_ws_tokens
    FROM documents
    """,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    (letter runs | digit runs | single other-symbols — the GPT-2
    pre-tokenizer's shape without its lookaheads, which RE2/Java both
    lack). Pure JVM regexp; the count feeds packing budgets and
    per-token pricing estimates."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).alias("n_bpe_tokens"),
        F.size(F.expr(f"filter(split(text, ' '), x -> x != '')")).alias(
            "n_ws_tokens"
        ),
    )


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, g.i,
             ('0x' || substr(md5(
               t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] || ' ' ||
               t[g.i+3] || ' ' || t[g.i+4]), 1, 15))::BIGINT AS gram_h
      FROM toks, unnest(range(1, len(t) - 3)) AS g(i)
      WHERE len(t) >= 5
    ),
    bench AS (
      SELECT DISTINCT gram_h FROM grams WHERE doc_id % 100 = 0
    )
    SELECT g.doc_id,
           count(DISTINCT g.gram_h) AS n_grams,
           count(DISTINCT CASE WHEN b.gram_h IS NOT NULL
                               THEN g.gram_h END) AS n_contaminated
    FROM grams g LEFT JOIN bench b USING (gram_h)
    WHERE g.doc_id % 100 <> 0
    GROUP BY g.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: hash every 5-gram of the training
    split, broadcast-join against the benchmark set's distinct 5-gram
    hashes (here: every 100th doc stands in for the eval set), report
    per-doc contaminated-gram counts. The shape that scales: the
    benchmark side is tiny (broadcast), the corpus side is a narrow
    shingle explode — one join, no self-join."""
    d = T(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.expr(f"filter(split(text, ' '), x -> x != '')").alias("t")
    ).where(F.size("t") >= 5)
    grams = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 5),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("t"), i + 1),
                    F.element_at(F.col("t"), i + 2),
                    F.element_at(F.col("t"), i + 3),
                    F.element_at(F.col("t"), i + 4),
                    F.element_at(F.col("t"), i + 5),
                ),
            )
        ).alias("gram"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("gram_h"),
    )
    bench = (
        grams.where(F.col("doc_id") % 100 == 0).select("gram_h").distinct()
    )
    train = grams.where(F.col("doc_id") % 100 != 0)
    joined = train.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "gram_h", "left"
    )
    return joined.groupBy("doc_id").agg(
        F.count_distinct("gram_h").alias("n_grams"),
        F.count_distinct(
            F.when(F.col("__hit").isNotNull(), F.col("gram_h"))
        ).alias("n_contaminated"),
    )


@query(
    "repetition_scores_docs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g3 AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                FOR i IN range(1, len(t) - 1)]
             ELSE [] END AS grams,
             len(t) AS n_tok
      FROM toks
    )
    SELECT doc_id, n_tok,
           len(grams) AS n_3grams,
           CASE WHEN len(grams) > 0
                THEN round(1.0 - len(list_distinct(grams))::DOUBLE
                           / len(grams)::DOUBLE, 6)
                ELSE 0.0 END AS dup_3gram_ratio
    FROM g3
    """,
)
def repetition_scores_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (Gopher/RefinedWeb-style): fraction of
    duplicated 3-grams per doc — high values flag boilerplate/spam for
    the filtering pass. Narrow per-row array arithmetic, no shuffle."""
    d = T(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.expr(f"filter(split(text, ' '), x -> x != '')").alias("t")
    )
    grams = F.when(
        F.size("t") >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i + 1),
                F.element_at(F.col("t"), i + 2),
                F.element_at(F.col("t"), i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = t.withColumn("grams", grams).select(
        "doc_id",
        F.size("t").cast("long").alias("n_tok"),
        F.size("grams").cast("long").alias("n_3grams"),
        F.when(
            F.size("grams") > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("grams")).cast("double")
                / F.size("grams").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_ratio"),
    )
    return out


@query(
    "sentence_split_udtf",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, '.') AS parts FROM documents)
    SELECT doc_id, i AS sentence_idx,
           trim(parts[i]) AS sentence,
           length(trim(parts[i]))::BIGINT AS n_chars
    FROM s, unnest(range(1, len(parts) + 1)) AS t(i)
    WHERE trim(parts[i]) <> ''
    """,
)
def sentence_split_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function, §2.11's UDTF analog): one
    doc row → N sentence rows via SQL ``LATERAL``. Arrow-batched like a
    pandas UDF; for this splitter the builtin posexplode(split()) would
    do — the UDTF surface is demonstrated because real pipelines put
    model-backed segmenters here, which no builtin expresses."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string, n_chars bigint")
    class SentenceSplit:
        def eval(self, text: str):
            # strip(' ') / 1-based index for DuckDB trim()/range parity
            for i, part in enumerate((text or "").split("."), start=1):
                s = part.strip(" ")
                if s:
                    yield i, s, len(s)

    spark.udtf.register("sentence_split", SentenceSplit)
    T(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_chars
        FROM __docs_udtf d, LATERAL sentence_split(d.text) s
        """
    )


@query(
    "vocab_top_tokens",
    oracle=f"""
    WITH freq AS (
      SELECT t.tok AS token, count(*) AS freq
      FROM documents, unnest({_TOKS}) AS t(tok)
      GROUP BY 1
    )
    SELECT token, freq,
           row_number() OVER (ORDER BY freq DESC, token ASC) - 1 AS token_id
    FROM freq
    QUALIFY token_id < 32
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary construction: top-32 tokens by corpus
    frequency get dense ids (freq desc, token asc — fully deterministic).
    The single global-order window runs over the already-aggregated
    frequency table (vocab-sized, not corpus-sized), which is why it is
    safe at 100 TB."""
    freq = token_frequencies(T(spark, sf_dir, "documents"), "text").select(
        "token", "freq"
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (
        freq.withColumn("token_id", F.row_number().over(w) - 1)
        .where(F.col("token_id") < 32)
        .select("token", "freq", "token_id")
    )


@query(
    "clean_normalize_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    kept AS (
      SELECT doc_id, toks,
             list_filter(toks, x -> NOT list_contains({_STOPS}, x)) AS k
      FROM t
    )
    SELECT doc_id,
           array_to_string(k, ' ') AS clean_text,
           len(toks)::BIGINT AS n_tok_before,
           len(k)::BIGINT AS n_tok_after,
           md5(array_to_string(k, ' ')) AS clean_fingerprint
    FROM kept
    """,
)
def clean_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning transform: tokenize, drop stopwords, reassemble with
    single spaces, fingerprint the cleaned text — the normalize step
    that runs before dedup/packing in a training pipeline. Narrow map,
    no shuffle; the md5 of the rebuilt string proves byte-exact
    cross-engine normalization."""
    d = T(spark, sf_dir, "documents")
    toks = tokens("text")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    kept = F.filter(toks, lambda x: ~F.array_contains(stops, x))
    return d.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(toks).cast("long").alias("n_tok_before"),
        F.size(kept).cast("long").alias("n_tok_after"),
        F.md5(F.array_join(kept, " ")).alias("clean_fingerprint"),
    )


@query(
    "pii_redact_docs",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact u' || doc_id || '@example.com or 555-'
                  || lpad(((doc_id * 7) % 1000)::VARCHAR, 3, '0') || '-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  || ' ip 10.0.' || (doc_id % 256) || '.'
                  || ((doc_id * 3) % 256) AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
             AS n_email,
           len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}'))::BIGINT AS n_phone,
           len(regexp_extract_all(t,
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}'))::BIGINT AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IPV4>', 'g'))
             AS redacted_md5
    FROM aug
    """,
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (§2.12 curation tier): per-doc counts of emails /
    phone numbers / IPv4 literals and the md5 of the fully redacted
    text. The corpus text is AUGMENTED with deterministic synthetic PII
    derived from doc_id (built identically in both engines), so every
    row exercises all three patterns rather than attesting zeros. The
    patterns use only Java-regex ∩ RE2 constructs (no lookaround), so
    Spark and DuckDB match identical spans and the redacted bytes — and
    their md5 — agree exactly. Redaction order email→phone→ipv4;
    counts over the original text. Pure narrow map, shuffle-free."""
    from modeltracking_spark.operators.textops import pii_scrub

    d = T(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad(((F.col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 3) % 256).cast("string"),
        ).alias("t"),
    )
    out = pii_scrub(aug, text_col="t")
    return out.select("doc_id", "n_email", "n_phone", "n_ipv4", "redacted_md5")


@query(
    "gopher_rules_docs",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len({_TOKS})::BIGINT AS n,
             coalesce(list_sum(list_transform({_TOKS}, t -> length(t))), 0)::BIGINT AS sl,
             len(list_distinct({_TOKS}))::BIGINT AS nd,
             len(list_distinct(list_filter({_TOKS},
                 t -> list_contains({_STOPS}, t))))::BIGINT AS nstop,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT
               AS punct
      FROM documents
    )
    SELECT doc_id, n AS n_tokens,
           (CASE WHEN n >= 30 AND n <= 100000 THEN 0 ELSE 1 END
            + CASE WHEN 3 * n <= sl AND sl <= 10 * n THEN 0 ELSE 2 END
            + CASE WHEN nstop >= 2 THEN 0 ELSE 4 END
            + CASE WHEN 10 * nd >= 3 * n THEN 0 ELSE 8 END
            + CASE WHEN punct * 10 <= n THEN 0 ELSE 16 END)::BIGINT
             AS fail_mask,
           (n >= 30 AND n <= 100000 AND 3 * n <= sl AND sl <= 10 * n
            AND nstop >= 2 AND 10 * nd >= 3 * n AND punct * 10 <= n)
             AS keep
    FROM m
    """,
)
def gopher_rules_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 A1.1 adapted): explicit
    keep/drop verdict + per-rule fail bitmask (word count, mean word
    length, stopword presence, lexical diversity, punctuation ratio).
    All ratio rules evaluate by integer cross-multiplication — no double
    division — so verdicts and masks are engine-exact; drops ~43% of
    this corpus (the rules genuinely bite). Pure narrow map, shuffle-free
    at any scale."""
    from modeltracking_spark.operators.textops import gopher_rules

    return gopher_rules(T(spark, sf_dir, "documents"))


@query(
    "bpe_first_merge_pairs",
    oracle=f"""
    WITH w AS (SELECT unnest({_TOKS}) AS word FROM documents),
    wc AS (SELECT word, count(*)::BIGINT AS n FROM w GROUP BY word),
    pairs AS (
      SELECT substr(word, i.i::INTEGER, 1) AS a,
             CASE WHEN i.i < length(word)
                  THEN substr(word, (i.i + 1)::INTEGER, 1)
                  ELSE '</w>' END AS b,
             n
      FROM wc, unnest(range(1, length(word) + 1)) AS i(i)
    ),
    pc AS (SELECT a, b, sum(n)::BIGINT AS cnt FROM pairs GROUP BY 1, 2)
    SELECT a, b, cnt,
           row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC)::BIGINT AS rk
    FROM pc
    QUALIFY rk <= 20
    """,
)
def bpe_first_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE tokenizer training, oracled: adjacent
    character-pair frequencies (with the </w> end-of-word marker)
    weighted by word counts, ranked by (count desc, pair asc) — exactly
    the statistic whose argmax ``operators/tokenizer.py:bpe_train``
    merges first (the equality is asserted in tests/test_tokenizer.py).
    The corpus-scale work is the word-frequency aggregate; the pair
    table is alphabet²-bounded, so the global ranking window runs on a
    bounded input (the bucket-offset-table precedent, not a corpus-wide
    single partition). The full merge LOOP is a driver-side artifact
    build over the same word counts — deterministic, pinned in pytest —
    because each merge rewrites symbol sequences, which no fixed SQL
    can iterate."""
    from pyspark.sql import Window

    from modeltracking_spark.operators.tokenizer import EOW, word_counts

    wc = word_counts(T(spark, sf_dir, "documents"))
    pos = wc.select(
        "word", "n",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    )
    pairs = pos.select(
        F.expr("substr(word, i, 1)").alias("a"),
        F.when(
            F.col("i") < F.length("word"), F.expr("substr(word, i + 1, 1)")
        ).otherwise(F.lit(EOW)).alias("b"),
        "n",
    )
    pc = pairs.groupBy("a", "b").agg(F.sum("n").cast("long").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
    return (
        pc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 20)
        .select("a", "b", "cnt", "rk")
    )


@query(
    "html_extract_main_text",
    oracle="""
    SELECT doc_id,
           'Doc ' || doc_id AS title,
           md5(text) AS main_md5,
           length(text)::BIGINT AS main_chars
    FROM documents
    """,
)
def html_extract_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-ingest boilerplate removal, attested as an exact inverse:
    each doc is wrapped into a full HTML page (head/title, nav chrome,
    a content div, footer — built with JVM string concat, no UDF), then
    ``html_extract_main_text`` recovers the main text by container
    isolation + tag stripping + whitespace normalization. The oracle
    states the recovered text IS the original (md5 + length straight
    off the documents view), so the extraction provably drops every
    byte of chrome and none of the content. Shuffle-free projection
    end to end."""
    from modeltracking_spark.operators.textops import (
        html_extract_main_text as _extract,
    )

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit("<html><head><title>Doc "), F.col("doc_id"),
        F.lit("</title></head><body><nav>home about contact</nav>"
              '<div class="content"><p>'),
        F.col("text"),
        F.lit("</p></div><footer>(c) example site</footer></body></html>"),
    )
    out = _extract(d.withColumn("html", html))
    return out.select(
        "doc_id", "title",
        F.md5("main_text").alias("main_md5"),
        F.col("main_chars"),
    )


@query(
    "url_canonicalize_docs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'HTTP://Site' || (doc_id % 5) || '.Example.COM'
             || CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':8080' END
             || '/p' || (doc_id % 7)
             || '?b=' || (doc_id % 3) || '&utm_source=feed&a=1&gclid=xyz'
             || '#frag' AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             lower(regexp_extract(url, '^[^:/]+://([^/:?#]+)', 1)) AS host,
             regexp_extract(url, '^[^:/]+://[^/:?#]+:([0-9]+)', 1) AS port,
             regexp_extract(url, '^[^:/]+://[^/?#]+([^?#]*)', 1) AS path,
             regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS qs
      FROM u
    ),
    canon AS (
      SELECT doc_id,
             scheme || '://' || host
             || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                     THEN '' ELSE ':' || port END
             || CASE WHEN path = '' THEN '/' ELSE path END
             || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon_url
      FROM (
        SELECT *,
               list_aggregate(
                 list_sort(list_filter(string_split(qs, '&'),
                   p -> p <> '' AND NOT starts_with(p, 'utm_')
                        AND NOT starts_with(p, 'fbclid')
                        AND NOT starts_with(p, 'gclid'))),
                 'string_agg', '&') AS q
        FROM parts
      )
    )
    SELECT doc_id, coalesce(canon_url, '') AS canon_url FROM canon
    """,
)
def url_canonicalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — normalize-before-dedup for web corpora:
    formula-generated messy URLs (uppercase scheme/host, default and
    non-default ports, tracking params, fragments) canonicalize to
    lowercase host, stripped default port, dropped fragment, tracking
    params removed, surviving params SORTED. The oracle replays every
    step with DuckDB's list functions, so the full parse → filter →
    sort → rebuild chain is attested string-for-string. Shuffle-free
    projection; the canonical URL is the key URL-level exact dedup
    would group on."""
    from modeltracking_spark.operators.textops import canonicalize_url

    d = T(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("HTTP://Site"), F.col("doc_id") % 5, F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(":80")).otherwise(F.lit(":8080")),
        F.lit("/p"), F.col("doc_id") % 7,
        F.lit("?b="), F.col("doc_id") % 3,
        F.lit("&utm_source=feed&a=1&gclid=xyz#frag"),
    )
    return d.withColumn("url", url).select(
        "doc_id", canonicalize_url("url").alias("canon_url")
    )


# ---- TextRank oracle: segment graph + damped iterations in integer
# fixed point (positive masses, so // == floor on both engines).
def _tr_iter_sql(prev: str, t: int) -> str:
    return f"""
    c{t} AS (SELECT w.doc_id, w.sa AS sid,
                    sum((s.s * w.w) // st.s_out)::BIGINT AS c
             FROM w
             JOIN {prev} s ON s.doc_id = w.doc_id AND s.sid = w.sb
             JOIN str st ON st.doc_id = w.doc_id AND st.sid = w.sb
             WHERE st.s_out > 0
             GROUP BY 1, 2),
    s{t} AS (SELECT s.doc_id, s.sid,
                    ((15000000000000 // (100 * s.n_seg))
                     + ((85 * coalesce(c.c, 0)) // 100))::BIGINT AS s,
                    s.n_seg
             FROM {prev} s LEFT JOIN c{t} c
               ON c.doc_id = s.doc_id AND c.sid = s.sid)"""


_TEXTRANK_ORACLE = f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    seg AS (
      SELECT doc_id, k.k AS sid,
             list_distinct(t[(k.k * 10 + 1):(k.k * 10 + 10)]) AS st
      FROM d, range(0, 64) k(k)
      WHERE k.k < greatest(ceil(len(t) / 10), 1)::BIGINT
    ),
    w AS (
      SELECT a.doc_id, a.sid AS sa, b.sid AS sb,
             len(list_filter(a.st, x -> list_contains(b.st, x)))::BIGINT AS w
      FROM seg a JOIN seg b
        ON a.doc_id = b.doc_id AND a.sid <> b.sid
      WHERE len(list_filter(a.st, x -> list_contains(b.st, x))) > 0
    ),
    str AS (SELECT doc_id, sb AS sid, sum(w)::BIGINT AS s_out
            FROM w GROUP BY 1, 2),
    cnt AS (SELECT doc_id, count(*)::BIGINT AS n_seg FROM seg GROUP BY 1),
    s0 AS (SELECT seg.doc_id, seg.sid,
                  (1000000000000 // cnt.n_seg)::BIGINT AS s, cnt.n_seg
           FROM seg JOIN cnt ON cnt.doc_id = seg.doc_id),
    {_tr_iter_sql("s0", 1)},
    {_tr_iter_sql("s1", 2)}
    SELECT doc_id, sid, s AS score_e12,
           rk::BIGINT AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY s DESC, sid ASC) AS rk FROM s2)
    WHERE rk <= 2
"""


@query("textrank_segments_docs", oracle=_TEXTRANK_ORACLE)
def textrank_segments_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank extractive selection over 10-token document segments:
    within-doc overlap graph (distinct-token counts — integer weights),
    two damped PageRank rounds in the pagerank integer fixed point
    (DIV everywhere, per-doc mass 1e12), top-2 segments per doc as the
    extractive summary. The oracle replays the segment graph AND both
    iterations (operators/graph.py:textrank_segments).

    ORACLE BOUND: the oracle enumerates segment ids from a fixed
    range(0, 64) (DuckDB range() cannot take lateral bounds), so it
    assumes every document has < 640 whitespace tokens (64 segments x
    seg_tokens=10); the engine operator is uncapped. Pinned by
    tests/test_graph.py::test_textrank_central_segment_wins (max token
    count over every shipped sf dir <= 640), so a longer future
    document fails the TEST, not the oracle compare — the
    track_resample_arclength pattern."""
    from modeltracking_spark.operators.graph import textrank_segments

    out = textrank_segments(
        T(spark, sf_dir, "documents"), seg_tokens=10, iters=2, k=2
    )
    return out.withColumn("sid", F.col("sid").cast("long")).withColumn(
        "rk", F.col("rk").cast("long")
    )


# ---- unigram-Viterbi oracle: vocabulary CTE + the word-level dynamic
# program UNROLLED over character positions (the PCA/logreg replay
# discipline; positions bounded by the max word length, pinned in
# pytest like textrank's segment cap).
_VIT_MAXLEN = 16


def _vit_step_sql(i: int, max_piece: int = 4) -> str:
    prevs = " UNION ALL ".join(
        f"SELECT w, {j} AS j, packed FROM s{j}"
        for j in range(max(0, i - max_piece), i)
    )
    return f"""
    s{i} AS MATERIALIZED (
      SELECT d.w, max(p.packed + v.lp * 1024 - 1)::BIGINT AS packed
      FROM dwords d
      JOIN ({prevs}) p ON p.w = d.w
      JOIN vocab v ON v.piece = substr(d.w, p.j + 1, {i} - p.j)
      WHERE length(d.w) >= {i}
      GROUP BY d.w
    )"""


_VITERBI_ORACLE = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest({_TOKS}) AS w FROM documents
    ),
    grams AS (
      SELECT substr(t.w, i.i, L.L) AS piece
      FROM toks t, range(1, 5) L(L), range(1, {_VIT_MAXLEN + 1}) i(i)
      WHERE i.i <= length(t.w) - L.L + 1
    ),
    counts AS (SELECT piece, count(*)::BIGINT AS n FROM grams GROUP BY 1),
    kept AS (SELECT piece, n FROM counts
             WHERE length(piece) = 1 OR n >= 2),
    tot AS (SELECT sum(n)::BIGINT AS t FROM kept),
    vocab AS MATERIALIZED (
        SELECT piece,
               floor(ln(n::DOUBLE / t::DOUBLE) * 1e6)::BIGINT AS lp
        FROM kept, tot),
    dwords AS MATERIALIZED (SELECT DISTINCT w FROM toks),
    s0 AS MATERIALIZED (SELECT w, 0::BIGINT AS packed FROM dwords),
    {",".join(_vit_step_sql(i) for i in range(1, _VIT_MAXLEN + 1))},
    finals AS (
      {" UNION ALL ".join(
          f"SELECT w, packed FROM s{k} WHERE length(w) = {k}"
          for k in range(1, _VIT_MAXLEN + 1)
      )}
    )
    SELECT t.doc_id,
           count(*)::BIGINT AS n_words,
           sum((0 - f.packed) % 1024)::BIGINT AS n_pieces,
           sum((f.packed + ((0 - f.packed) % 1024)) / 1024)::BIGINT
             AS score_e6
    FROM toks t JOIN finals f ON f.w = t.w
    GROUP BY 1
"""


@query("unigram_viterbi_docs", oracle=_VITERBI_ORACLE)
def unigram_viterbi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram-LM Viterbi segmentation
    (operators/tokenizer.py:unigram_viterbi_segments): a piece
    vocabulary of character 1-4-grams with e6 ln-probabilities trained
    in ONE corpus aggregate, then the maximum-likelihood segmentation
    of every DISTINCT word by dynamic programming — the state is the
    PACKED integer score_e6*1024 − n_pieces, so "max score, fewest
    pieces" ties resolve identically in both engines. The oracle
    replays vocabulary training AND the whole DP, unrolled over
    character positions (bounded by the max word length — < 16, pinned
    in tests/test_tokenizer.py like textrank's segment cap). Scale: DP
    per distinct word (vocabulary-scale) in mapInPandas with the
    bounded vocab as a broadcast closure; occurrences join back by
    hash. Output: (doc_id, n_words, n_pieces, score_e6)."""
    from modeltracking_spark.operators.tokenizer import (
        unigram_viterbi_segments,
    )

    return unigram_viterbi_segments(T(spark, sf_dir, "documents"))


#: fixed blocklist for the oracled query — two-word phrases that cross
#: token boundaries (substring matching, NOT token-aligned) plus one
#: self-overlapping single-token case ("a a" in "a a a" counts twice)
BLOCKLIST_KWS = [
    "table table", "fast key", "scan slow", "value table",
    "agg row", "the line", "a a", "join small",
]

_BL_KW_SQL = ", ".join(
    f"({i}, '{k}')" for i, k in enumerate(BLOCKLIST_KWS)
)


@query(
    "blocklist_match_docs",
    oracle=f"""
    WITH kws(kw_id, keyword) AS (VALUES {_BL_KW_SQL}),
    hits AS (
      SELECT d.doc_id, k.kw_id, k.keyword,
             count(*)::BIGINT AS n_occ
      FROM documents d, kws k, range(640) p(i)
      WHERE p.i + length(k.keyword) <= length(d.text)
        AND substr(d.text, p.i::INTEGER + 1,
                   length(k.keyword)::INTEGER) = k.keyword
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, kw_id::INTEGER AS kw_id, keyword, n_occ FROM hits
    """,
)
def blocklist_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aho-Corasick multi-pattern blocklist matching (round 8): one
    automaton pass per document finds every occurrence — overlapping
    and word-boundary-crossing included — of the 8 fixed phrases. The
    oracle is STRUCTURALLY independent: it enumerates every start
    position (bounded 640-char unroll, pinned in tests/test_misc_coverage.py
    like the dup_span 128-token bound) and string-compares substrings,
    so the automaton's goto/fail/output construction is attested
    against brute force, not replayed
    (operators/textops.py:blocklist_match_counts)."""
    from modeltracking_spark.operators.textops import blocklist_match_counts

    return blocklist_match_counts(
        T(spark, sf_dir, "documents"), BLOCKLIST_KWS
    )


from modeltracking_spark.operators.textops import (  # noqa: E402
    NFC_EXERCISE_SUFFIX,
    nfc_normalize_col,
)

# the suffix is pure-SQL-embeddable (no quotes); docs with id % 3 != 0
# get the decomposed/reordering/Hangul exercise appended in BOTH
# engines, the rest stay ASCII (changed=false path attested too)
_NFC_RAW = (
    f"CASE WHEN doc_id % 3 <> 0 THEN text || '{NFC_EXERCISE_SUFFIX}' "
    "ELSE text END"
)


@query(
    "nfc_normalize_docs",
    oracle=f"""
    WITH p AS (SELECT doc_id, {_NFC_RAW} AS raw FROM documents)
    SELECT doc_id,
           length(raw)::BIGINT AS n_orig_cp,
           length(nfc_normalize(raw))::BIGINT AS n_nfc_cp,
           (nfc_normalize(raw) <> raw) AS changed,
           md5(nfc_normalize(raw)) AS nfc_md5
    FROM p
    """,
)
def nfc_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonical normalization (round 9) — the
    normalize-before-hash step exact dedup needs: decomposed accents
    (e+U+0301), unordered combining marks (dot-above/dot-below
    REORDER under canonical ordering), and Hangul jamo all compose, so
    byte-distinct but canonically-equal docs hash identically. The
    engine runs UAX #15 via unicodedata in ONE Arrow pandas UDF
    (operators/textops.py:nfc_normalize_col — narrow map, no shuffle);
    the oracle is DuckDB's independent utf8proc implementation, md5
    byte-exact on the composed text, so the two UAX #15
    implementations must agree character for character. Docs with
    id % 3 == 0 stay pure-ASCII (identity path + changed=false)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(F.col("text"), F.lit(NFC_EXERCISE_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("raw"),
    )
    n = nfc_normalize_col(d, "raw", "nfc")
    return n.select(
        "doc_id",
        F.length("raw").alias("n_orig_cp"),
        F.length("nfc").alias("n_nfc_cp"),
        (F.col("nfc") != F.col("raw")).alias("changed"),
        F.md5(F.encode("nfc", "UTF-8")).alias("nfc_md5"),
    )


@query(
    "idn_host_normalize_docs",
    oracle="""
    SELECT doc_id,
           md5((CASE doc_id % 3 WHEN 0 THEN 'bücher'
                WHEN 1 THEN '中文网' ELSE 'пример' END)
               || '-' || (doc_id % 100)::VARCHAR
               || '.example.'
               || CASE doc_id % 2 WHEN 0 THEN 'com' ELSE 'org' END)
             AS display_md5,
           1::BIGINT AS n_ace_labels,
           TRUE AS ace_is_ascii,
           TRUE AS roundtrip_ok
    FROM documents
    """,
)
def idn_host_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN hostname normalization through from-spec Punycode (round 9,
    operators/punycode.py — RFC 3492, the RFC's own 7.1 sample strings
    pinned and the algorithm cross-validated against Python's
    independent built-in codec): deterministic Unicode hostnames
    (German/Chinese/Cyrillic label arms) are ACE-encoded (xn--) and
    decoded back to the display/comparison form inside ONE Arrow
    pandas kernel — the homograph-aware canonicalization a URL
    deduplicator keys on. The oracle replays the display-host FORMULA
    (the roundtrip is the identity exactly when both directions are
    correct), plus the xn-- label count and ASCII-purity of the ACE
    form."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from modeltracking_spark.operators.kernel import widen_for_kernel
    from modeltracking_spark.operators.punycode import (
        idna_decode_host,
        idna_encode_host,
    )

    d = T(spark, sf_dir, "documents").select("doc_id")

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("display_md5", StringType()),
        StructField("n_ace_labels", LongType()),
        StructField("ace_is_ascii", BooleanType()),
        StructField("roundtrip_ok", BooleanType()),
    ])

    def kernel(batches):
        import pandas as pd

        arms = ["bücher", "中文网", "пример"]
        for pdf in batches:
            ids, md5s, nls, asciis, oks = [], [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                host = (f"{arms[did % 3]}-{did % 100}.example."
                        f"{'com' if did % 2 == 0 else 'org'}")
                ace = idna_encode_host(host)
                display = idna_decode_host(ace)
                ids.append(did)
                md5s.append(hashlib.md5(display.encode()).hexdigest())
                nls.append(sum(1 for x in ace.split(".")
                               if x.startswith("xn--")))
                asciis.append(all(ord(c) < 128 for c in ace))
                oks.append(display == host)
            yield pd.DataFrame({
                "doc_id": ids, "display_md5": md5s, "n_ace_labels": nls,
                "ace_is_ascii": asciis, "roundtrip_ok": oks,
            })

    return widen_for_kernel(d).mapInPandas(kernel, schema)
