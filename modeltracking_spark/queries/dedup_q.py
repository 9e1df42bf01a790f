"""Deduplication queries (extension surface, SURVEY.md §2.12): exact
dedup, capped exact Jaccard, MinHash+LSH near-dup, SimHash — each
oracle-replicated in DuckDB SQL down to the hash arithmetic (the md5-
derived 60-bit token ids and affine permutations are engine-portable by
construction, see ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modeltracking_spark.functions.text import doc_fingerprint
from modeltracking_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    dedup_rows,
    exact_dedup,
    jaccard_pairs,
    minhash_dedup_pairs,
    simhash64,
    token_hash60,
    token_ids,
)
from modeltracking_spark.queries.common import T, query

# (id, token) / (id, token_id) oracle CTEs shared by the dedup queries
_TOKS_SQL = """
    toks AS (
      SELECT DISTINCT doc_id AS id, t.tok AS token
      FROM documents,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(tok)
    )
"""
_IDS_SQL = (
    _TOKS_SQL
    + """,
    ids AS (
      SELECT id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS token_id
      FROM toks
    )
"""
)

_FP_SQL = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


@query(
    "exact_dedup_docs",
    oracle=f"""
    SELECT {_FP_SQL} AS fingerprint,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary: md5 content fingerprint -> one hash shuffle,
    deterministic canonical survivor (min doc_id)."""
    d = T(spark, sf_dir, "documents").withColumn(
        "fingerprint", doc_fingerprint("text")
    )
    return exact_dedup(d, ["fingerprint"], "doc_id")


@query(
    "dedup_survivor_rows",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM (SELECT *, {_FP_SQL} AS fp FROM documents)
    QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) = 1
    """,
)
def dedup_survivor_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-preserving exact dedup: keep the min-doc_id row per content
    fingerprint (dropDuplicates with a *deterministic* survivor)."""
    d = T(spark, sf_dir, "documents").withColumn("fp", doc_fingerprint("text"))
    return dedup_rows(d, ["fp"], "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "jaccard_pairs_capped",
    oracle=f"""
    WITH {_TOKS_SQL},
    hot AS (
      SELECT token FROM toks GROUP BY token HAVING count(DISTINCT id) > 390
    ),
    kept AS (SELECT * FROM toks ANTI JOIN hot USING (token)),
    sizes AS (SELECT id, count(*) AS sz FROM kept GROUP BY 1),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter_n
      FROM kept a JOIN kept b ON a.token = b.token AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter_n,
           (sa.sz + sb.sz - inter_n) AS union_n,
           inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE >= 0.6
    """,
)
def jaccard_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard with the hot-token cap BINDING (max_doc_freq=390
    removes the 15 most ubiquitous of the ~31-token vocabulary): verifies the consistent 'capped tokens
    don't exist' semantics — sizes and intersections both computed after
    the filter (the pre-fix bias computed sizes before)."""
    d = T(spark, sf_dir, "documents")
    return jaccard_pairs(
        d, "doc_id", "text", threshold=0.6, max_doc_freq=390
    )


def _minhash_params_sql(n_hashes: int = 16) -> str:
    rows = ", ".join(
        f"({i}, {MINHASH_A[i]}, {MINHASH_B[i]})" for i in range(n_hashes)
    )
    return f"params(hash_idx, a, b) AS (VALUES {rows})"


@query(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_IDS_SQL},
    {_minhash_params_sql(16)},
    sigs AS (
      SELECT id, p.hash_idx,
             min((p.a * (token_id % {MINHASH_PRIME}) + p.b) % {MINHASH_PRIME}) AS sig
      FROM ids CROSS JOIN params p
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT id, hash_idx // 4 AS band,
             string_agg(sig::VARCHAR, '_' ORDER BY hash_idx) AS band_key
      FROM sigs GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
    ),
    sizes AS (SELECT id, count(*) AS sz FROM ids GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS inter_n
      FROM cands c
      JOIN ids ta ON ta.id = c.id_a
      JOIN ids tb ON tb.id = c.id_b AND tb.token_id = ta.token_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE >= 0.5
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) -> 4x4 LSH bands -> candidate pairs -> exact-Jaccard
    verify ≥ 0.5 — the 100 TB near-dup path, oracle-replicated down to
    the band keys (the whole pipeline is integer arithmetic on md5-derived
    token ids, so DuckDB reproduces it bit for bit)."""
    d = T(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        d, "doc_id", "text", n_hashes=16, bands=4, rows_per_band=4,
        verify_threshold=0.5,
    )


# rep-level (distinct-token-set) MinHash band CTE chain shared by the
# hot-bucket-cap queries: ids -> sorted-set groups -> per-rep signatures
# -> band rows with per-bucket sizes.  DuckDB keys buckets by the
# band-key STRING where Spark self-joins on its xxhash64 (collisions
# could only merge buckets — none occur at any tested SF, and the exact
# verify downstream prunes any pair a merge could add).
_MINHASH_REP_BANDS_SQL = f"""
    {_minhash_params_sql(16)},
    sets AS (
      SELECT id, list_sort(list(token_id)) AS toks FROM ids GROUP BY id
    ),
    grp AS (
      SELECT toks, min(id) AS rep, len(toks) AS sz FROM sets GROUP BY toks
    ),
    rids AS (
      SELECT g.rep, u.token_id FROM grp g, unnest(g.toks) AS u(token_id)
    ),
    sigs AS (
      SELECT rep, p.hash_idx,
             min((p.a * (token_id % {MINHASH_PRIME}) + p.b) % {MINHASH_PRIME}) AS sig
      FROM rids CROSS JOIN params p
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT rep, hash_idx // 4 AS band,
             string_agg(sig::VARCHAR, '_' ORDER BY hash_idx) AS band_key
      FROM sigs GROUP BY 1, 2
    ),
    sized AS (
      SELECT b.*, count(*) OVER (PARTITION BY band, band_key) AS bs
      FROM bands b
    )
"""

_CAPPED_CAP = 100  # binds at sf0.01 (max rep bucket 194) AND sf0.1 (1368)


@query(
    "minhash_lsh_capped_pairs",
    oracle=f"""
    WITH {_IDS_SQL},
    {_MINHASH_REP_BANDS_SQL},
    small_pairs AS (
      SELECT a.rep AS rep_a, b.rep AS rep_b
      FROM sized a
      JOIN sized b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.rep < b.rep
      WHERE a.bs <= {_CAPPED_CAP}
    ),
    chain_pairs AS (
      SELECT rep AS rep_a,
             lead(rep) OVER (PARTITION BY band, band_key ORDER BY rep) AS rep_b
      FROM sized WHERE bs > {_CAPPED_CAP}
    ),
    cands AS (
      SELECT DISTINCT rep_a, rep_b FROM (
        SELECT * FROM small_pairs
        UNION ALL
        SELECT * FROM chain_pairs WHERE rep_b IS NOT NULL
      )
    )
    SELECT c.rep_a, c.rep_b,
           len(list_intersect(ga.toks, gb.toks))::DOUBLE
             / (ga.sz + gb.sz - len(list_intersect(ga.toks, gb.toks)))::DOUBLE
             AS jaccard
    FROM cands c
    JOIN grp ga ON ga.rep = c.rep_a
    JOIN grp gb ON gb.rep = c.rep_b
    WHERE len(list_intersect(ga.toks, gb.toks))::DOUBLE
            / (ga.sz + gb.sz - len(list_intersect(ga.toks, gb.toks)))::DOUBLE
          >= 0.5
    """,
)
def minhash_lsh_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH pairs with the hot-bucket cap BINDING (VERDICT r14
    item 1): ``max_bucket_size=100`` vs measured rep-bucket maxima of
    194 (sf0.01) / 1368 (sf0.1), so oversized band buckets demonstrably
    degrade to sorted-neighbor chaining while small buckets keep exact
    all-pairs semantics.  Output is at the distinct-set-representative
    level — (rep_a, rep_b, jaccard) — making the capped candidate set
    directly observable; the oracle replays the set collapse, the band
    buckets, the 100-cap carve-out, the id-ordered chain, and the exact
    list-intersection Jaccard verify.  Cross-checked against the
    uncapped path in tests/test_dedup_cap.py (capped pairs ⊆ uncapped;
    chained members stay connected)."""
    d = T(spark, sf_dir, "documents")
    from modeltracking_spark.operators.dedup import minhash_rep_pairs

    return minhash_rep_pairs(
        token_ids(d, "doc_id", "text"),
        verify_threshold=0.5,
        max_bucket_size=_CAPPED_CAP,
    )


@query(
    "lsh_bucket_overflow_stats",
    oracle=f"""
    WITH {_IDS_SQL},
    {_MINHASH_REP_BANDS_SQL},
    per AS (
      SELECT band, band_key, count(*) AS sz, min(rep) AS min_id
      FROM bands GROUP BY 1, 2
    )
    SELECT band,
           count(*) AS n_buckets,
           sum(CASE WHEN sz > {_CAPPED_CAP} THEN 1 ELSE 0 END)::BIGINT
             AS n_oversized,
           max(sz) AS max_bucket,
           sum(sz * (sz - 1) // 2)::BIGINT AS pairs_full,
           sum(CASE WHEN sz > {_CAPPED_CAP} THEN sz - 1
                    ELSE sz * (sz - 1) // 2 END)::BIGINT AS pairs_emitted,
           (sum(sz * (sz - 1) // 2)
            - sum(CASE WHEN sz > {_CAPPED_CAP} THEN sz - 1
                       ELSE sz * (sz - 1) // 2 END))::BIGINT AS pairs_dropped,
           min(CASE WHEN sz > {_CAPPED_CAP} THEN min_id END) AS sample_min_id
    FROM per GROUP BY band
    """,
)
def lsh_bucket_overflow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOUD overflow accounting for the LSH hot-bucket cap: per band,
    how many buckets overflow ``max_bucket_size=100``, the exact
    candidate pairs the cap dropped (Σ k·(k−1)/2 − (k−1) over oversized
    buckets), and a concrete member id from the worst offenders — the
    "count + sample what's dropped" discipline of the ``max_doc_freq``
    hot-token cap, as one map-side-combinable aggregate over bucket
    sizes (never the pairs themselves).  The oracle recomputes every
    counter from the rep-level band buckets in SQL."""
    d = T(spark, sf_dir, "documents")
    from modeltracking_spark.operators.dedup import (
        band_bucket_overflow,
        minhash_banded_reps,
    )

    return band_bucket_overflow(
        minhash_banded_reps(token_ids(d, "doc_id", "text")),
        max_bucket_size=_CAPPED_CAP,
        id_col="rep",
    )


def _minhash_tail_sql(threshold: float) -> str:
    """sigs -> bands -> cands -> verify tail over an ``ids(id, token_id)``
    CTE — shared by the token and char-shingle MinHash oracles."""
    return f"""
    {_minhash_params_sql(16)},
    sigs AS (
      SELECT id, p.hash_idx,
             min((p.a * (token_id % {MINHASH_PRIME}) + p.b) % {MINHASH_PRIME}) AS sig
      FROM ids CROSS JOIN params p
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT id, hash_idx // 4 AS band,
             string_agg(sig::VARCHAR, '_' ORDER BY hash_idx) AS band_key
      FROM sigs GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
    ),
    sizes AS (SELECT id, count(*) AS sz FROM ids GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS inter_n
      FROM cands c
      JOIN ids ta ON ta.id = c.id_a
      JOIN ids tb ON tb.id = c.id_b AND tb.token_id = ta.token_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE >= {threshold}
    """


@query(
    "minhash_shingle_pairs",
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
               FROM documents),
    sh AS (SELECT DISTINCT doc_id AS id, s.sg
           FROM d, unnest(list_transform(
                  range(1, greatest(length(norm) - 4, 1) + 1),
                  i -> substr(norm, i::INTEGER, 5))) s(sg)),
    ids AS (SELECT id, ('0x' || substr(md5(sg), 1, 15))::BIGINT AS token_id
            FROM sh),
    {_minhash_tail_sql(0.6)}
    """,
)
def minhash_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram MinHash near-dup (the n-gram shingling tier of
    §2.12): robust to whitespace/tokenization differences that defeat
    word-level MinHash. Same signature/banding/verify tail, different
    shingling — oracle replicated shingle-for-shingle."""
    from modeltracking_spark.functions.text import char_shingles
    from modeltracking_spark.operators.dedup import minhash_pairs_from_token_ids

    d = T(spark, sf_dir, "documents")
    sh = d.select(
        F.col("doc_id").alias("id"),
        F.explode(char_shingles("text", 5)).alias("token"),
    )
    dt = sh.select("id", token_hash60("token").alias("token_id"))
    return minhash_pairs_from_token_ids(dt, verify_threshold=0.6)


# (id, simhash) fingerprint CTE chain shared by the two simhash queries
_SIMHASH_FP_SQL = f"""
    {_IDS_SQL},
    h AS (
      SELECT id,
             ((token_id % {MINHASH_PRIME}) * {0x9E3779B1} + {0x85EBCA77})
               % {MINHASH_PRIME} * 2147483648::BIGINT
             + ((token_id % {MINHASH_PRIME}) * {0xC2B2AE35} + {0x27D4EB2F})
               % {MINHASH_PRIME} AS h64
      FROM ids
    ),
    votes AS (
      SELECT id, b.bit,
             sum(CASE WHEN (h64 >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h CROSS JOIN range(63) b(bit)
      GROUP BY 1, 2
    ),
    fp AS (
      SELECT id,
             sum(CASE WHEN vote > 0 THEN 1::BIGINT << bit ELSE 0 END)::BIGINT
               AS simhash
      FROM votes GROUP BY 1
    )
"""


@query(
    "simhash_docs",
    oracle=f"""
    WITH {_SIMHASH_FP_SQL}
    SELECT id, simhash FROM fp
    """,
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 63-bit fingerprints per document — narrow per-doc bit-vote
    fold (one collect_list shuffle, no per-bit explode; see
    ``operators/dedup.py:simhash64``); near-dups are small-Hamming pairs
    via :func:`simhash_neardup_docs`."""
    d = T(spark, sf_dir, "documents")
    return simhash64(token_ids(d, "doc_id", "text"))


@query(
    "simhash_neardup_pairs",
    oracle=f"""
    WITH {_SIMHASH_FP_SQL}
    SELECT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming radius 3: band-bucketed
    candidates (4×~16-bit bands — exact by pigeonhole for r < 4, never
    all-pairs) verified with ``bit_count(a ^ b)``. The oracle brute-forces
    every pair, so a hash match proves the banding loses nothing."""
    from modeltracking_spark.operators.dedup import simhash_neardup_pairs as snd

    d = T(spark, sf_dir, "documents")
    fps = simhash64(token_ids(d, "doc_id", "text"))
    return snd(fps, max_hamming=3)


@query(
    "dedup_clusters_docs",
    oracle=f"""
    WITH RECURSIVE {_TOKS_SQL},
    hot AS (
      SELECT token FROM toks GROUP BY token HAVING count(DISTINCT id) > 390
    ),
    kept AS (SELECT * FROM toks ANTI JOIN hot USING (token)),
    sizes AS (SELECT id, count(*) AS sz FROM kept GROUP BY 1),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter_n
      FROM kept a JOIN kept b ON a.token = b.token AND a.id < b.id
      GROUP BY 1, 2
    ),
    pair AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE >= 0.6
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pair
      UNION
      SELECT id_b, id_a FROM pair
    ),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT reach.u, e.v FROM reach JOIN edges e ON e.u = reach.r
    )
    SELECT u AS id, min(r) AS cluster_id,
           (u = min(r)) AS is_survivor
    FROM reach GROUP BY u
    """,
)
def dedup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the capped exact-Jaccard pair graph:
    transitive near-dup evidence -> disjoint clusters (cluster_id = min
    reachable doc_id) -> survivor flag. Spark side is iterative
    min-label propagation with pointer jumping (O(log diameter) rounds,
    (node,label) state only — `operators/dedup.py:dedup_clusters`);
    the oracle computes the same components via a recursive-CTE
    transitive closure, tractable at sf0.01."""
    from modeltracking_spark.operators.dedup import dedup_clusters

    d = T(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", threshold=0.6, max_doc_freq=390)
    cc = dedup_clusters(pairs)
    return cc.withColumn("is_survivor", F.col("id") == F.col("cluster_id"))


@query(
    "incremental_dedup_docs",
    oracle="""
    WITH inc AS (
      SELECT doc_id, md5(text) AS k FROM documents WHERE doc_id >= 400
    ),
    seen AS (
      SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id < 400
    )
    SELECT i.doc_id, i.k AS content_md5
    FROM inc i
    WHERE i.k NOT IN (SELECT k FROM seen)
    QUALIFY row_number() OVER (PARTITION BY i.k ORDER BY i.doc_id ASC) = 1
    """,
)
def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup (§2.12): docs with id >= 400 play the
    incoming crawl delta, ids < 400 the mature corpus; the delta admits
    only rows whose content md5 is new both against the corpus and
    within the batch (deterministic min-id survivor). The corpus side
    contributes ONE distinct-key aggregate + a left-anti join — it is
    never self-joined or re-deduplicated, which is what makes daily
    increments affordable at 100 TB (in production the key table is a
    maintained index, not a rescan)."""
    from modeltracking_spark.operators.dedup import incremental_dedup

    d = T(spark, sf_dir, "documents")
    out = incremental_dedup(
        d.where(F.col("doc_id") >= 400).select("doc_id", "text"),
        d.where(F.col("doc_id") < 400).select("text"),
        F.md5("text"),
        "doc_id",
    )
    return out.select("doc_id", F.col("__key").alias("content_md5"))


@query(
    "fixed_n_per_lang_docs",
    oracle="""
    SELECT doc_id, lang,
           row_number() OVER (
             PARTITION BY lang
             ORDER BY md5(doc_id::VARCHAR || 'evalN'), doc_id
           )::BIGINT AS pick_rank
    FROM documents
    QUALIFY pick_rank <= 20
    """,
)
def fixed_n_per_lang_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-N-per-stratum sample (eval-set construction):
    exactly 20 docs per language, chosen by md5 order — reproducible
    across engines/partitionings with no RNG, unlike fraction-based
    sampling which cannot guarantee exact per-stratum counts. One
    window shuffle on the stratum key; at 100 TB the per-stratum
    ordering prunes with a top-N window (no global sort)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("evalN"))),
        F.col("doc_id"),
    )
    return (
        d.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= 20)
    )


@query(
    "incremental_neardup_docs",
    oracle=f"""
    WITH {_IDS_SQL},
    {_minhash_params_sql(16)},
    sigs AS (
      SELECT id, p.hash_idx,
             min((p.a * (token_id % {MINHASH_PRIME}) + p.b) % {MINHASH_PRIME}) AS sig
      FROM ids CROSS JOIN params p
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT id, hash_idx // 4 AS band,
             string_agg(sig::VARCHAR, '_' ORDER BY hash_idx) AS band_key
      FROM sigs GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT a.id AS delta_id, b.id AS corpus_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.id % 10 = 7 AND b.id % 10 <> 7
    ),
    sizes AS (SELECT id, count(*) AS sz FROM ids GROUP BY 1),
    inter AS (
      SELECT c.delta_id, c.corpus_id, count(*) AS inter_n
      FROM cands c
      JOIN ids ta ON ta.id = c.delta_id
      JOIN ids tb ON tb.id = c.corpus_id AND tb.token_id = ta.token_id
      GROUP BY 1, 2
    )
    SELECT delta_id, corpus_id,
           inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = delta_id
    JOIN sizes sb ON sb.id = corpus_id
    WHERE inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE >= 0.5
    """,
)
def incremental_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup: a fresh delta (docs with doc_id % 10 = 7 —
    a scale-proportional 10% slice) matched against the mature corpus
    (the rest) through MinHash bands — candidates cross the boundary
    only, the corpus never self-joins, and the delta's band keys and
    token sets broadcast. Same integer band arithmetic as
    ``minhash_lsh_pairs``, so the oracle is the standard banded SQL
    restricted to cross-boundary pairs. The pipelines drop (or route to
    human review) delta docs matching the corpus at jaccard ≥ 0.5."""
    from modeltracking_spark.operators.dedup import incremental_neardup_matches

    d = T(spark, sf_dir, "documents")
    delta = d.where(F.col("doc_id") % 10 == 7)
    corpus = d.where(F.col("doc_id") % 10 != 7)
    return incremental_neardup_matches(
        delta, corpus, "doc_id", "text",
        n_hashes=16, bands=4, rows_per_band=4, verify_threshold=0.5,
    )


@query(
    "edit_distance_pairs_docs",
    oracle="""
    WITH d AS (SELECT doc_id, lang,
                      length(text) // 64 AS band,
                      length(text) AS n,
                      substr(text, 1, 80) AS pfx
               FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.pfx, b.pfx)::BIGINT AS dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE abs(a.n - b.n) <= 16
      AND levenshtein(a.pfx, b.pfx) <= 16
    """,
)
def edit_distance_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs — the string-edit modality beside
    the token (MinHash/SimHash) and embedding dedup tiers, for typo-
    grade copies token shingles miss. Candidates block on (lang,
    length band) with a length-difference pre-filter (|Δn| ≤ 16, the
    edit-distance lower bound), then Levenshtein over the 80-char
    prefix window decides (engine-identical integer DP; production
    swaps the window for banded Myers bit-vector distance — the
    blocking, not the inner loop, is the 100 TB shape). Never an
    all-pairs: both sides hash-partition on the block key."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        (F.length("text") / 64).cast("long").alias("band"),
        F.length("text").alias("n"),
        F.substring("text", 1, 80).alias("pfx"),
    )
    a = d.select(
        F.col("lang"), F.col("band"),
        F.col("doc_id").alias("id_a"), F.col("n").alias("na"),
        F.col("pfx").alias("pa"),
    )
    b = d.select(
        F.col("lang"), F.col("band"),
        F.col("doc_id").alias("id_b"), F.col("n").alias("nb"),
        F.col("pfx").alias("pb"),
    )
    return (
        a.join(b, ["lang", "band"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("na") - F.col("nb")) <= 16)
        )
        .withColumn("dist", F.levenshtein("pa", "pb").cast("long"))
        .where(F.col("dist") <= 16)
        .select("id_a", "id_b", "dist")
    )


@query(
    "leakage_safe_split_docs",
    oracle=f"""
    WITH RECURSIVE {_TOKS_SQL},
    hot AS (
      SELECT token FROM toks GROUP BY token HAVING count(DISTINCT id) > 390
    ),
    kept AS (SELECT * FROM toks ANTI JOIN hot USING (token)),
    sizes AS (SELECT id, count(*) AS sz FROM kept GROUP BY 1),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter_n
      FROM kept a JOIN kept b ON a.token = b.token AND a.id < b.id
      GROUP BY 1, 2
    ),
    pair AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE inter_n::DOUBLE / (sa.sz + sb.sz - inter_n)::DOUBLE >= 0.6
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pair
      UNION
      SELECT id_b, id_a FROM pair
    ),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT reach.u, e.v FROM reach JOIN edges e ON e.u = reach.r
    ),
    cc AS (SELECT u AS id, min(r) AS cluster_id FROM reach GROUP BY u),
    spine AS (
      SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc c ON c.id = d.doc_id
    ),
    assigned AS (
      SELECT doc_id, cluster_id,
             ('0x' || substr(md5(cluster_id::VARCHAR || ':split'), 1, 8))
               ::BIGINT % 10000 AS bucket
      FROM spine
    )
    SELECT doc_id, cluster_id, bucket,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """,
)
def leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split (round 8): the hash split is
    keyed on the NEAR-DUP CLUSTER id, not the doc id, so a document and
    its near-duplicates land in the same split BY CONSTRUCTION — the
    split-contamination guard every eval pipeline needs (a test doc
    whose near-copy sits in train silently inflates benchmarks; plain
    ``hash_split_docs`` has exactly that hole, exhibited in
    tests/test_dedup.py). Clusters come from the same capped
    exact-Jaccard pair graph as ``dedup_clusters_docs`` (pointer-jump
    CC); docs in no pair are their own singleton cluster via one left
    join against the doc spine; the 80/10/10 cut reuses the RNG-free
    md5-bucket arithmetic of the hash-split family. One extra shuffle
    over plain splitting (the CC rounds); assignment itself is a narrow
    map."""
    from modeltracking_spark.operators.dedup import dedup_clusters

    d = T(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", threshold=0.6, max_doc_freq=390)
    cc = dedup_clusters(pairs)
    spine = d.select("doc_id").join(
        cc.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("cluster_id").cast("string"),
                               F.lit(":split"))), 1, 8
            ),
            16, 10,
        ).cast("long") % 10000
    )
    assigned = spine.withColumn("bucket", bucket)
    return assigned.withColumn(
        "split",
        F.when(F.col("bucket") < 8000, "train")
        .when(F.col("bucket") < 9000, "val")
        .otherwise("test"),
    )


@query(
    "cdc_chunk_dedup_docs",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0
                   THEN 'COMMON LICENSE BOILERPLATE: redistribution permitted with attribution; see corpus manifest for terms. '
                   ELSE '' END)
             || repeat(text || ' ', (doc_id % 4 + 2)::INTEGER) AS payload
      FROM documents
    ),
    cps AS (
      SELECT doc_id, payload, length(payload) AS n,
             list_transform(range(1, length(payload) + 1),
                            i -> unicode(payload[i])) AS cp
      FROM p
    ),
    cands AS (
      SELECT doc_id, payload, n,
             CASE WHEN n >= 8 THEN
               list_filter(range(8, n + 1),
                           i -> (cp[i-7]::BIGINT*588580609 + cp[i-6]::BIGINT*336528897 + cp[i-5]::BIGINT*168428801 + cp[i-4]::BIGINT*67503105 + cp[i-3]::BIGINT*16974593 + cp[i-2]::BIGINT*66049 + cp[i-1]::BIGINT*257 + cp[i-0]::BIGINT*1)
                                % 2147483648 % 101 = 13)
             ELSE [] END AS cand
      FROM cps
    ),
    walk AS (
      WITH RECURSIVE w(doc_id, b, e, forced) AS (
        SELECT doc_id, 0, 0, FALSE FROM cands WHERE n > 0
        UNION ALL
        SELECT c.doc_id, w.e,
               coalesce(
                 (SELECT min(x) FROM unnest(c.cand) AS t(x)
                   WHERE x >= w.e + 32 AND x <= w.e + 256),
                 CASE WHEN c.n - w.e > 256 THEN w.e + 256 ELSE c.n END),
               coalesce(
                 (SELECT min(x) FROM unnest(c.cand) AS t(x)
                   WHERE x >= w.e + 32 AND x <= w.e + 256), -1) = -1
               AND c.n - w.e > 256
        FROM w JOIN cands c USING (doc_id)
        WHERE w.e < c.n
      )
      SELECT * FROM w WHERE e > 0
    ),
    chunks AS (
      SELECT w.doc_id, w.b, w.e, w.forced,
             md5(substr(c.payload, w.b + 1, w.e - w.b)) AS chunk_md5
      FROM walk w JOIN cands c USING (doc_id)
    ),
    shared AS (
      SELECT chunk_md5 FROM chunks
      GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT c.doc_id,
           count(*)::BIGINT AS n_chunks,
           sum(c.forced::INTEGER)::BIGINT AS n_forced,
           max(c.e - c.b)::BIGINT AS max_chunk_len,
           sum(CASE WHEN s.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_shared_chunks,
           sum(CASE WHEN s.chunk_md5 IS NOT NULL THEN c.e - c.b
                    ELSE 0 END)::BIGINT AS shared_chars
    FROM chunks c LEFT JOIN shared s USING (chunk_md5)
    GROUP BY c.doc_id
    """,
)
def cdc_chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking for corpus shared-content detection
    (round 9, operators/cdc.py — LBFS SOSP'01 / FastCDC ATC'16): a
    rolling polynomial hash (w=8, base 257 mod 2^31) cuts each payload
    where the hash residue hits 13 mod 101, clamped to [32, 256] chars
    with forced max-length cuts — boundaries re-synchronize after
    local edits, so identical passages (here: a deliberate license
    boilerplate on every 3rd doc, plus the corpus's natural near-dups)
    chunk identically wherever they sit. ONE narrow mapInPandas kernel
    chunks (numpy rolling hash + linear two-pointer clamp walk), ONE
    chunk-md5-grain aggregate discovers cross-doc sharing — nothing
    all-pairs, the 100 TB storage-dedup shape. The oracle replays the
    IDENTICAL walk relationally: list-transform code-point hashing and
    a RECURSIVE CTE for the clamped boundary recursion, byte-equal on
    every chunk md5 (pinned per-chunk in tests/test_cdc.py)."""
    from modeltracking_spark.operators.cdc import cdc_shared_chunk_stats

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "(CASE WHEN doc_id % 3 = 0"
            " THEN 'COMMON LICENSE BOILERPLATE: redistribution permitted"
            " with attribution; see corpus manifest for terms. '"
            " ELSE '' END)"
            " || repeat(text || ' ', cast(doc_id % 4 + 2 as int))"
        ).alias("payload"),
    )
    return cdc_shared_chunk_stats(d, text_col="payload", id_col="doc_id")
