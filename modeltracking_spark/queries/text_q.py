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
