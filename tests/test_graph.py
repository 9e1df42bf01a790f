"""Fixed-point PageRank: hand-checkable values, dangling-node mass
redistribution, mass conservation, and scale-plan posture."""

from __future__ import annotations

from pyspark.sql import functions as F

from modeltracking_spark.operators.graph import SCALE, pagerank
from modeltracking_spark.plans import assert_no_cartesian, executed_plan


def _reference_pagerank(edges, nodes, n_iter=3, d_pct=85):
    """Pure-python replay of the documented integer update rule."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    score = {v: SCALE // n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, t in edges:
            contrib[t] += score[s] // outdeg[s]
        dang = sum(score[v] for v in nodes if v not in outdeg)
        score = {
            v: ((100 - d_pct) * SCALE) // (100 * n)
            + (d_pct * (contrib[v] + dang // n)) // 100
            for v in nodes
        }
    return score


def _run(spark, edges, nodes, n_iter=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    out = pagerank(e, nodes=nd, n_iter=n_iter)
    return {r["node"]: r for r in out.collect()}


def test_pagerank_matches_reference_simple_cycle(spark):
    # 0 -> 1 -> 2 -> 0 : symmetric cycle, every node keeps 1/N
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _run(spark, edges, [0, 1, 2])
    want = _reference_pagerank(edges, [0, 1, 2])
    assert {v: r["pr_e12"] for v, r in got.items()} == want
    assert all(r["pr_e12"] == SCALE // 3 for r in got.values())


def test_pagerank_hub_and_dangling(spark):
    # 1 and 2 both point at 3; 3 has NO out-edges (dangling) — its mass
    # must redistribute uniformly, not vanish
    edges = [(1, 3), (2, 3), (1, 2)]
    nodes = [1, 2, 3]
    got = _run(spark, edges, nodes)
    want = _reference_pagerank(edges, nodes)
    assert {v: r["pr_e12"] for v, r in got.items()} == want
    # the sink is the most central; outdegrees reported faithfully
    assert got[3]["pr_e12"] > got[2]["pr_e12"] > got[1]["pr_e12"]
    assert {v: r["outdeg"] for v, r in got.items()} == {1: 2, 2: 1, 3: 0}
    # floor-division leakage only: total mass within N*n_iter ulps of SCALE
    total = sum(r["pr_e12"] for r in got.values())
    assert SCALE - 3 * 3 * 100 <= total <= SCALE


def test_pagerank_plan_has_no_cartesian_and_partitions_by_node(spark):
    edges = [(i, (i * 3 + 1) % 50) for i in range(50)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(e, n_iter=2)
    plan = executed_plan(out)
    assert_no_cartesian(out)
    # the per-iteration aggregate shuffles on the node key
    assert "hashpartitioning(node" in plan or "hashpartitioning(dst" in plan


def test_pagerank_iteration_count_is_exact(spark):
    # n_iter=0 returns the uniform init untouched
    edges = [(0, 1), (1, 0)]
    got = _run(spark, edges, [0, 1], n_iter=0)
    assert all(r["pr_e12"] == SCALE // 2 for r in got.values())


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    n_iter=st.integers(min_value=1, max_value=3),
)
def test_pagerank_matches_reference_on_random_graphs(spark, edges, n_iter):
    """Random digraphs (self-loops, dangling nodes, multi-in-degree):
    the Spark fixed-point scores must equal the python replay exactly."""
    nodes = sorted({v for e in edges for v in e})
    got = _run(spark, edges, nodes, n_iter=n_iter)
    want = _reference_pagerank(edges, nodes, n_iter=n_iter)
    assert {v: r["pr_e12"] for v, r in got.items()} == want


def _reference_ppr(edges, nodes, seeds, n_iter=3, d_pct=85):
    """Python replay of the personalized update rule."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ns = len(seeds)
    score = {v: (SCALE // ns if v in seeds else 0) for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, t in edges:
            contrib[t] += score[s] // outdeg[s]
        dang = sum(score[v] for v in nodes if v not in outdeg)
        score = {
            v: (((100 - d_pct) * SCALE) // (100 * ns) if v in seeds else 0)
            + (d_pct * (contrib[v] + (dang // ns if v in seeds else 0))) // 100
            for v in nodes
        }
    return score


def test_personalized_pagerank_matches_reference_and_localizes(spark):
    """Seeded restart: scores match the python replay exactly, and a
    node near the seed outranks an equally-connected node far from it."""
    from modeltracking_spark.operators.graph import pagerank

    # chain 0 -> 1 -> 2 -> 3 -> 4 -> 0 with seed {0}
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    nodes = [0, 1, 2, 3, 4]
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    sd = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["pr_e12"]
           for r in pagerank(e, nodes=nd, n_iter=3, seeds=sd).collect()}
    want = _reference_ppr(edges, set(nodes), {0}, n_iter=3)
    assert got == want
    # propagation physics at 3 iterations: the initial unit of seed mass
    # travels as a wavefront — node 3 (3 hops out) holds the bulk, node
    # 4 is unreached (exactly 0: non-seeds get NO teleport), and behind
    # the front the steady trickle decays by 0.85 per hop
    assert got[4] == 0
    assert got[3] == max(v for k, v in got.items() if k != 0)
    assert got[0] > got[1] > got[2]


def test_triangle_count_hand_graph(spark):
    """K4 minus one edge: exactly 2 triangles; per-node credits checked
    by hand. Directed duplicates and self-loops must be ignored."""
    from modeltracking_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 1),        # duplicate reversed edge
            (2, 3), (1, 3),
            (3, 4), (2, 4),        # K4 minus (1,4)
            (4, 4),                # self-loop, ignored
        ],
        ["src", "dst"],
    )
    got = {r["node"]: r["n_tri"] for r in triangle_count(edges).collect()}
    # triangles: (1,2,3) and (2,3,4)
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_textrank_central_segment_wins(spark):
    """A doc whose middle segment shares vocabulary with BOTH others
    (the others share nothing with each other) must rank it first; the
    oracle's fixed range(0, 64) segment cap is pinned against the
    corpus tokens-per-doc bound."""
    import pyspark.sql.functions as F

    from modeltracking_spark.operators.graph import textrank_segments
    from tests.conftest import SF001

    text = " ".join(
        ["a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"]        # seg 0: links via a*
        + ["a1 a2 a3 b1 b2 b3 b4 c1 c2 c3"]       # seg 1: hub (a* and c*)
        + ["c1 c2 c3 d1 d2 d3 d4 d5 d6 d7"]       # seg 2: links via c*
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        textrank_segments(docs, seg_tokens=10, iters=2, k=3).collect(),
        key=lambda r: r["rk"],
    )
    assert out[0]["sid"] == 1                  # the hub is most central
    assert [r["rk"] for r in out] == [1, 2, 3]
    # oracle bound: no doc in ANY shipped sf dir may exceed 64 segments
    # of 10 tokens (the oracle's fixed range(0, 64) cap)
    import os

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        mx = (
            spark.read.parquet(path)
            .select(F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
                    .alias("n"))
            .agg(F.max("n")).collect()[0][0]
        )
        assert mx <= 640, f"{sf}: doc with {mx} tokens exceeds the oracle cap"


def _lpa_reference(edges, nodes, n_iter):
    """Independent pure-Python synchronous LPA: most-frequent neighbor
    label, min-label ties, isolated nodes keep their label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    labels = {n: n for n in nodes}
    for _ in range(n_iter):
        new = {}
        for n in nodes:
            if not adj[n]:
                new[n] = labels[n]
                continue
            cnt = Counter(labels[m] for m in adj[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_label_propagation_hand_and_random_graphs(spark):
    from modeltracking_spark.operators.graph import label_propagation

    # two triangles joined by a bridge + one isolated node: LPA must
    # keep the triangle communities distinct and leave the isolate as
    # its own singleton
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    nodes = [0, 1, 2, 10, 11, 12, 99]
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(n,) for n in nodes], "node long")
    for n_iter in (1, 2, 4):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(e, nd, n_iter=n_iter).collect()
        }
        assert got == _lpa_reference(edges, nodes, n_iter), n_iter
    out = {r["node"]: r for r in label_propagation(e, nd, n_iter=4).collect()}
    assert out[99]["community"] == 99 and out[99]["comm_size"] == 1
    assert out[0]["community"] == out[1]["community"] == out[2]["community"]

    # random graphs: spark == reference label-for-label
    import random

    rng = random.Random(23)
    for trial in range(3):
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        nodes = list(range(n))
        e = spark.createDataFrame(edges, "src long, dst long")
        nd = spark.createDataFrame([(x,) for x in nodes], "node long")
        got = {
            r["node"]: r["community"]
            for r in label_propagation(e, nd, n_iter=3).collect()
        }
        assert got == _lpa_reference(edges, nodes, 3), trial


def test_label_propagation_plan_shape(spark):
    from modeltracking_spark.operators.graph import label_propagation
    from modeltracking_spark.plans import assert_no_cartesian, executed_plan

    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 30) for i in range(30)], "src long, dst long"
    )
    out = label_propagation(e, n_iter=2)
    assert_no_cartesian(out)
    plan = executed_plan(out)
    assert "Window" not in plan  # argmax is min(struct), never a window
