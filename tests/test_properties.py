"""Hypothesis property tests (SURVEY.md §5.3): the distributed operators
must agree with brute-force Python on arbitrary small inputs."""

from itertools import combinations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.dedup import jaccard_pairs
from modeltracking_spark.operators.joins import asof_join
from modeltracking_spark.operators.profile import nearest_time_bucket

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    left=st.lists(st.integers(0, 300), min_size=1, max_size=8),
    right=st.lists(st.integers(0, 300), min_size=1, max_size=8, unique=True),
)
def test_asof_nearest_is_argmin(spark, left, right):
    ldf = spark.createDataFrame([("k", t) for t in left], "k string, lts long")
    rdf = spark.createDataFrame(
        [("k", t, f"p{t}") for t in right], "k string, rts long, payload string"
    )
    out = asof_join(ldf, rdf, ["k"], "lts", "rts", ["payload"], "nearest")
    got = sorted((r["lts"], r["payload"]) for r in out.collect())

    def expect(t):
        # argmin |rt - t|, backward (<= t) wins exact ties
        best = min(right, key=lambda rt: (abs(rt - t), rt > t))
        return f"p{best}"

    assert got == sorted((t, expect(t)) for t in left)


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
        min_size=2,
        max_size=6,
    )
)
def test_jaccard_matches_python(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(
            df, "doc_id", "text", threshold=0.0, max_doc_freq=None
        ).collect()
    }
    sets = {i: set(t) for i, t in enumerate(docs)}
    exp = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            exp[(a, b)] = inter / len(sets[a] | sets[b])
    assert got == exp


@settings(**SETTINGS)
@given(
    ts=st.lists(st.integers(0, 500), min_size=1, max_size=30, unique=True),
    step=st.sampled_from([1, 3, 5, 6, 12]),
)
def test_nearest_time_bucket_property(spark, ts, step):
    df = spark.createDataFrame([(t,) for t in ts], "t long").select(
        "t", nearest_time_bucket(F.col("t"), step).alias("b")
    )
    for r in df.collect():
        t, b = r["t"], r["b"]
        assert b % step == 0
        assert abs(b - t) <= step / 2 + 1e-9  # nearest multiple
        # exact half-step ties round forward
        if step % 2 == 0 and t % step == step // 2:
            assert b == t + step // 2
