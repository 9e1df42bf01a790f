"""Iterative graph scoring for corpus curation (extension surface;
SURVEY.md §2.12 scope — the reference has no graph analog).

Web-scale curation pipelines rank pages by link centrality (PageRank
over the hyperlink graph, per Brin & Page 1998) and use the score as a
document-quality prior (e.g. seed lists and crawl frontiers à la
OpenWebText/CCNet). This module implements PageRank as iterated
relational passes — the standard SQL/DataFrame formulation: one
edges⋈scores join plus one aggregate-by-destination per iteration —
in **integer fixed point** so a fixed iteration count is bit-exact on
any engine and the DuckDB oracle can replay it by unrolling the loop.

Determinism discipline: scores live as BIGINT mass out of ``scale``
(default 1e12); every divide is floor division on nonnegative ints
(identical in Spark ``DIV`` and DuckDB ``//``); sums are integer sums
(order-independent). Double arithmetic never appears, so there is no
accumulation-order hazard at any parallelism.

Scale posture: per iteration the score table is node-sized, edges are
the big side; both shuffles (join on src, aggregate on dst) hash-
partition on node keys — the exact shape GraphX/Pregel lowers to. The
node count and per-iteration dangling mass are 1-row aggregates joined
as broadcasts; nothing collects to the driver. Production would
``localCheckpoint`` every ~5 iterations to cut lineage; with small
fixed n_iter the plain loop is fine and keeps the plan inspectable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: total score mass in fixed point (1.0 == SCALE)
SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-point PageRank over ``edges`` (src, dst) for exactly
    ``n_iter`` iterations.

    ``nodes`` (one ``node`` column) fixes the node universe; defaults to
    the union of endpoints. Dangling nodes (no out-edges) redistribute
    their mass uniformly, floor-divided — the standard correction, in
    integer space. ``damping_pct`` is the damping factor in percent
    (85 == the canonical 0.85) so the update rule stays integral:

        new = ((100-d)*SCALE) DIV (100*N)
            + (d * (contrib_sum + dang_sum DIV N)) DIV 100

    with per-edge contribution ``score DIV outdeg``.

    ``seeds`` (one ``node`` column) switches to PERSONALIZED PageRank
    (Haveliwala 2002): the restart mass — the (100-d) teleport term,
    the initial distribution, and the dangling redistribution — flows
    only to the |S| seed nodes instead of uniformly, so scores measure
    proximity to a trusted seed set (the seed-based quality
    propagation of curated-source pipelines). Same integral update
    with N replaced by |S| on seed rows and a zero base elsewhere.

    Output: (node, outdeg, pr_e12) — ``pr_e12`` the final fixed-point
    score.
    """
    # materialize the (src, dst) edge list once (r16): the contrib join
    # re-reads it EVERY iteration, and without a cut each iteration
    # re-ran the caller's whole edge-extraction pipeline (tokenize/
    # regexp link mining for the doc graphs). One write, n_iter reads.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.select("node")
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # outdeg is NODE-sized — a plain hash join on the node key, never a
    # broadcast (only the 1-row aggregates below are broadcast)
    spine = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg")
    )
    if seeds is None:
        # uniform restart: every node is a "seed"
        spine = spine.withColumn("__seed", F.lit(True))
        # one bounded single-scalar action (r16): as a broadcast row the
        # count's whole union-distinct subtree re-ran inside EVERY
        # iteration's plan; as a literal it runs once here
        n_val = int(nodes.count())
    else:
        sd = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
        spine = spine.join(
            sd.withColumn("__seed", F.lit(True)), "node", "left"
        ).withColumn("__seed", F.coalesce("__seed", F.lit(False)))
        n_val = int(sd.count())

    scores = spine.select(
        "node",
        "outdeg",
        "__seed",
        F.expr(f"IF(__seed, {SCALE} DIV {n_val}, 0)").alias("score"),
    )
    for _ in range(n_iter):
        # each iteration references `scores` three times (contrib, dangling,
        # join); materialize the node-sized table so the lineage stays
        # linear in n_iter instead of fanning ~3x per iteration
        scores = scores.localCheckpoint(eager=True)
        per_src = scores.where(F.col("outdeg") > 0).select(
            F.col("node").alias("src"), F.expr("score DIV outdeg").alias("give")
        )
        contrib = (
            e.join(per_src, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("give").alias("contrib"))
        )
        dang = scores.where(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("score"), F.lit(0)).cast("long").alias("__dang")
        )
        scores = (
            scores.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "outdeg",
                "__seed",
                F.expr(
                    f"IF(__seed, ({100 - damping_pct} * {SCALE}) "
                    f"DIV (100 * {n_val}), 0) + "
                    f"({damping_pct} * (coalesce(contrib, 0) + "
                    f"IF(__seed, __dang DIV {n_val}, 0))) DIV 100"
                ).alias("score"),
            )
        )
    return scores.select("node", "outdeg", F.col("score").alias("pr_e12"))


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED version of the link
    graph — the classic graph-quality/community signal (clustering
    coefficient numerator). Edges canonicalize to u < v and dedupe, so
    each triangle a<b<c is found exactly once as the join of (a,b),
    (b,c), (a,c); every member node is then credited.

    Scale: two hash equi-joins on node keys — never an all-pairs. This
    uses value-orientation (a<b); at web scale the standard refinement
    is DEGREE-orientation (orient each edge toward the higher-degree
    endpoint) which bounds the join fan-out per node by sqrt(|E|) on
    skewed graphs — noted here because value-orientation concentrates
    work on low-id hub nodes if ids correlate with degree.

    Output: (node, n_tri) for nodes in ≥1 triangle.
    """
    u = F.least(F.col(src_col), F.col(dst_col)).alias("u")
    v = F.greatest(F.col(src_col), F.col(dst_col)).alias("v")
    und = edges.select(u, v).where(F.col("u") != F.col("v")).distinct()
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )


def textrank_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
    iters: int = 2,
    k: int = 2,
) -> DataFrame:
    """TextRank extractive selection (Mihalcea & Tarau 2004) adapted to
    the repo's determinism rules: each document's fixed-size token
    segments form a within-doc graph weighted by DISTINCT-token overlap
    (plain integer counts — the published log-length normalization is
    transcendental and adds nothing to a ranking oracle), and ``iters``
    damped PageRank rounds run in the same integer fixed point as
    operators/graph.py:pagerank (floor division everywhere, mass out of
    1e12 per doc). The top-``k`` segments per doc are the extractive
    summary. Isolated segments keep teleport-only mass — per-doc
    ranking is unaffected and no dangling redistribution is needed
    inside a doc-local graph.

    Scale: pairs join is doc-partitioned (segments per doc are bounded
    by doc length / seg_tokens — never corpus-quadratic); every
    iteration is one doc-partitioned join + aggregate.

    Output: (doc_id, sid, score_e12, rk), rk in 1..k.
    """
    from modeltracking_spark.functions.text import tokens

    toks = tokens(text_col)
    n_seg = F.greatest(
        F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int"), F.lit(1)
    )
    # n_seg rides as a column from the start — a per-doc counts
    # aggregate would be corpus-sized and must never broadcast (the
    # pagerank rule: only 1-row aggregates broadcast)
    seg = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__t"),
            n_seg.alias("n_seg"),
            F.explode(F.sequence(F.lit(0), n_seg - 1)).alias("sid"),
        )
        .select(
            "doc_id",
            "sid",
            "n_seg",
            F.array_distinct(
                F.slice(F.col("__t"), F.col("sid") * seg_tokens + 1, seg_tokens)
            ).alias("st"),
        )
    )
    a = seg.select("doc_id", F.col("sid").alias("sa"), F.col("st").alias("ta"))
    b = seg.select("doc_id", F.col("sid").alias("sb"), F.col("st").alias("tb"))
    # materialize the pair graph ONCE: both strength and every
    # iteration's contrib consume it — lazy lineage would re-run the
    # tokenize+segment+self-join pipeline per consumer
    w = (
        a.join(b, "doc_id")
        .where(F.col("sa") != F.col("sb"))
        .select(
            "doc_id", "sa", "sb",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("w"),
        )
        .where(F.col("w") > 0)
        .localCheckpoint(eager=True)
    )
    strength = w.groupBy("doc_id", F.col("sb").alias("sid")).agg(
        F.sum("w").alias("s_out")
    ).localCheckpoint(eager=True)
    # integer DIV everywhere (the pagerank idiom): double division +
    # floor could slip an ulp at exact-quotient boundaries
    score = seg.select(
        "doc_id", "sid",
        F.expr("1000000000000 DIV n_seg").alias("s"),
        "n_seg",
    )
    for _ in range(iters):
        # each iteration references `score` once but builds a growing
        # lineage; materialize per round like pagerank
        score = score.localCheckpoint(eager=True)
        contrib = (
            w.join(
                score.select(
                    "doc_id", F.col("sid").alias("sb"), F.col("s").alias("s_b")
                ),
                ["doc_id", "sb"],
            )
            .join(strength.select(
                "doc_id", F.col("sid").alias("sb"), "s_out"), ["doc_id", "sb"])
            .where(F.col("s_out") > 0)
            .groupBy("doc_id", F.col("sa").alias("sid"))
            .agg(F.sum(F.expr("(s_b * w) DIV s_out")).alias("c"))
        )
        score = (
            score.join(contrib, ["doc_id", "sid"], "left")
            .withColumn("__c", F.coalesce(F.col("c"), F.lit(0)))
            .select(
                "doc_id", "sid",
                (
                    F.expr("15000000000000 DIV (100 * n_seg)")
                    + F.expr("(85 * __c) DIV 100")
                ).cast("long").alias("s"),
                "n_seg",
            )
        )
    wk = Window.partitionBy("doc_id").orderBy(F.col("s").desc(), F.col("sid").asc())
    return (
        score.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= k)
        .select("doc_id", "sid", F.col("s").alias("score_e12"), "rk")
    )


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """SYNCHRONOUS label propagation community detection (Raghavan,
    Albert & Kumara 2007), made fully deterministic: labels start as
    node ids; each round every node adopts the MOST FREQUENT label
    among its undirected neighbors' previous-round labels, ties broken
    by the SMALLEST label; isolated nodes keep their label. Exactly
    ``n_iter`` rounds (no asynchronous/random-order arm — the classic
    paper randomizes update order, which no oracle could replay; the
    synchronous min-tie variant is the standard deterministic choice
    for distributed LPA).

    Plan shape per round (the pagerank discipline): edges ⋈ labels on
    src + ONE (node, label) count aggregate + ONE deterministic argmax
    via ``min(struct(-cnt, label))`` — no window operator, both sides
    hash-partitioned on the node key; per-round localCheckpoint keeps
    the lineage linear in ``n_iter``. Community sizes come from one
    final label-grain aggregate joined back (node-sized).

    Output: (node, community, comm_size)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # materialize the symmetrized edge set once (r16): the vote join
    # re-reads it every round, and without a cut each round re-ran the
    # caller's edge-extraction pipeline AND the union+distinct
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).where(F.col("src") != F.col("dst")).distinct().localCheckpoint(
        eager=False
    )
    if nodes is None:
        nodes = (
            sym.select(F.col("src").alias("node"))
            .union(sym.select(F.col("dst").alias("node")))
            .distinct()
        )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(n_iter):
        labels = labels.localCheckpoint(eager=True)
        votes = (
            sym.join(labels.select(F.col("node").alias("src"), "label"),
                     "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pick = votes.groupBy("node").agg(
            F.min(F.struct((-F.col("cnt")).alias("neg"),
                           F.col("label").alias("label"))).alias("p")
        ).select("node", F.col("p.label").alias("new_label"))
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("comm_size")
    )
    return labels.join(sizes, "label").select(
        "node", F.col("label").alias("community"), "comm_size"
    )
