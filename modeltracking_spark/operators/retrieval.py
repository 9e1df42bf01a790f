"""Sparse retrieval scoring for corpus curation and RAG pipelines.

Extension surface (SURVEY.md §2.12 — the reference, a track-plot
pipeline at /root/reference/trackplot_hycom.py, has no retrieval
analog): Okapi BM25 top-k document ranking, the standard lexical
retriever behind dedup-aware eval-set mining, RAG context selection,
and "quality by query relevance" corpus filters.

Engine-exactness follows the repo discipline (queries/common.py): every
per-term score is floored to an e6 BIGINT before the per-document SUM,
so the aggregate is order-independent and hash-identical in DuckDB; the
double-space formula is written with identical association order in
both dialects.

Scale shape: the only full-corpus shuffle is the (doc, term)-grain
term-frequency aggregate; the query set, the query-term vocabulary, the
document-frequency table, and the corpus stats are all broadcast-sized.
Candidate scoring touches only tf rows whose term appears in some query
(a semi-join against the broadcast query vocabulary), so the big side
is never re-shuffled by query id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modeltracking_spark.functions.fixedpoint import e6_half_up
from modeltracking_spark.functions.text import tokens

#: BM25 parameters as exact rationals (the SQL twin divides the same
#: integers, so both engines start from the identical double).
K1_NUM, K1_DEN = 12, 10     # k1 = 1.2
B_NUM, B_DEN = 75, 100      # b = 0.75


_e6 = e6_half_up  # shared half-up e6 lift (functions/fixedpoint.py)


def queries_from_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = 100,
    residue: int = 7,
    n_terms: int = 6,
) -> DataFrame:
    """Deterministic query set derived from the corpus itself: every
    document with ``id % modulus == residue`` contributes a query whose
    terms are the distinct tokens among its first ``n_terms`` tokens.

    Returned as (q_id, term) ROWS (one per distinct pair) rather than a
    term array so de-duplication is pure set semantics — no reliance on
    array_distinct's (engine-specific) ordering.
    """
    return (
        docs.where(F.col(id_col) % modulus == residue)
        .select(
            F.col(id_col).alias("q_id"),
            F.explode(F.slice(tokens(text_col), 1, n_terms)).alias("term"),
        )
        .distinct()
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Okapi BM25 top-k documents per query.

    ``queries`` is a broadcast-sized (q_id, term) pair table (distinct
    rows). Per matched (query, doc, term):

        idf  = ln(1 + (N − df + 0.5) / (df + 0.5))
        norm = (1 − b) + b · ((dl · N) / Σdl)
        s    = idf · (tf · (k1 + 1)) / (tf + k1 · norm)

    with tf/df/dl/N exact integers, k1/b exact rationals, and s floored
    to e6 before the per-(q_id, doc_id) SUM — order-independent,
    hash-exact vs the DuckDB oracle. Ranking breaks ties on doc_id.

    Output: (q_id, doc_id, n_terms_hit, bm25_e6, rk), rk in 1..k.
    """
    from modeltracking_spark.operators.kernel import widen_for_kernel

    d = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    # r16 (guide §2.3): widen the tokenize explode on under-split scans
    # (no-op at scale) and checkpoint the query-term-restricted tf rows
    # — tfq feeds BOTH the df counts and the scoring join, and without
    # a cut each consumer re-ran tokenize + the tf aggregate. tfq is
    # the smallest frame in the pipeline (query vocabulary only).
    tok = widen_for_kernel(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
    ).select(
        "doc_id", tokens("__t").alias("toks")
    ).select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.first("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("sum_dl"),
    )
    vocab = queries.select("term").distinct()
    # corpus-side rows for query terms only; df = #docs containing term
    tfq = tf.join(F.broadcast(vocab), "term").localCheckpoint(eager=False)
    dfreq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    k1 = F.lit(K1_NUM).cast("double") / F.lit(K1_DEN).cast("double")
    b = F.lit(B_NUM).cast("double") / F.lit(B_DEN).cast("double")
    n_d = F.col("n_docs").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
    )
    norm = (F.lit(1.0) - b) + b * (
        (F.col("dl").cast("double") * n_d) / F.col("sum_dl").cast("double")
    )
    term_score = idf * (tf_d * (k1 + F.lit(1.0))) / (tf_d + k1 * norm)

    scored = (
        tfq.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(queries), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("q_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum(_e6(term_score)).alias("bm25_e6"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("bm25_e6").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q_id", "doc_id", "n_terms_hit", "bm25_e6", "rk")
    )


def inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialize the inverted index as data: one row per term with its
    document frequency and the SORTED posting list (csv of doc ids) —
    the artifact BM25/boolean retrieval serves from. collect_list is
    order-nondeterministic, so postings are sort_array'd before joining
    into the canonical string; hence the output is engine-exact.

    Scale: one (doc, term)-distinct shuffle + one per-term aggregate.
    At 100 TB a head term's posting list is itself huge — production
    shards postings by doc-id range and delta-encodes them; this
    single-string form is the correctness-checkable core of that.

    Output: (term, df, postings).
    """
    from modeltracking_spark.functions.text import tokens

    pairs = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
        .distinct()
    )
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def mmr_rerank(
    cand: DataFrame, sim: DataFrame, k: int = 4,
    lam_num: int = 7, lam_den: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity step after a relevance top-k: greedily pick
    the candidate maximizing λ·rel − (1−λ)·max-sim-to-already-selected.
    With e6 integer rel/sim and λ as the rational lam_num/lam_den, the
    selection score is PURE INTEGER ((lam_num·rel − (lam_den−lam_num)·
    maxsim) — no floats anywhere), so every greedy step is engine-exact
    and the whole unrolled loop replays in SQL.

    ``cand``: (q_id, c_id, rel_e6) — the bounded candidate table (top-N
    per query, broadcast-sized). ``sim``: (q_id, a_id, b_id, sim_e6),
    symmetric (both directions present). ``k`` is a compile-time unroll.

    Scale: every step operates on the candidate table only — the corpus
    never re-enters; at 100 TB the candidates per query are O(top-N),
    so the greedy loop is driver-planned but executor-cheap.

    Output: (q_id, c_id, rel_e6, step) with step = selection order 1..k.
    """
    lam_rest = lam_den - lam_num
    w = Window.partitionBy("q_id").orderBy(
        F.col("__score").desc(), F.col("c_id").asc()
    )
    sel = (
        cand.withColumn("__score", F.col("rel_e6") * lam_den)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select("q_id", "c_id", "rel_e6", F.lit(1).alias("step"))
    )
    sim2 = sim.select(
        F.col("q_id").alias("__sq"), F.col("a_id"), F.col("b_id"),
        F.col("sim_e6"),
    )
    for step in range(2, k + 1):
        chosen = sel.select(
            F.col("q_id").alias("__cq"), F.col("c_id").alias("__sid")
        )
        remaining = cand.join(
            chosen,
            (cand.q_id == chosen.__cq) & (cand.c_id == chosen.__sid),
            "left_anti",
        )
        # max similarity of each remaining candidate to the selected set:
        # candidate-side rows of the symmetric sim table, filtered to
        # selected partners
        maxsim = (
            remaining.select("q_id", "c_id")
            .join(
                sim2,
                (F.col("q_id") == F.col("__sq")) & (F.col("c_id") == F.col("a_id")),
            )
            .join(
                chosen,
                (F.col("__sq") == F.col("__cq")) & (F.col("b_id") == F.col("__sid")),
            )
            .groupBy("q_id", "c_id")
            .agg(F.max("sim_e6").alias("__ms"))
        )
        scored = remaining.join(maxsim, ["q_id", "c_id"], "left").withColumn(
            "__score",
            F.col("rel_e6") * lam_num
            - F.coalesce(F.col("__ms"), F.lit(0)) * lam_rest,
        )
        pick = (
            scored.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select("q_id", "c_id", "rel_e6", F.lit(step).alias("step"))
        )
        # materialize per step: each iteration references sel ~3x, so an
        # uncheckpointed lineage recomputes every earlier step and the
        # plan grows exponentially in k
        sel = sel.unionByName(pick).localCheckpoint()
    return sel
