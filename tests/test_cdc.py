"""Content-defined chunking: boundary walk semantics (candidate /
forced / tail arms), edit re-synchronization, engine parity of the
chunk kernel, and the cross-doc sharing aggregate."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modeltracking_spark.operators.cdc import (
    CDC_D,
    CDC_MAX,
    CDC_MIN,
    CDC_MOD,
    CDC_POWS,
    CDC_R,
    CDC_W,
    cdc_boundaries,
)


def _naive_boundaries(text: str):
    """Independent O(n*w) reference: per-position window hash computed
    from scratch (no numpy, no rolling), same clamp walk."""
    n = len(text)
    if n == 0:
        return []
    cands = []
    for end in range(CDC_W, n + 1):
        h = 0
        for j in range(CDC_W):
            h = (h + CDC_POWS[j] * ord(text[end - CDC_W + j])) % CDC_MOD
        if h % CDC_D == CDC_R:
            cands.append(end)
    out, b = [], 0
    while b < n:
        inside = [c for c in cands if b + CDC_MIN <= c <= b + CDC_MAX]
        if inside:
            out.append((b, inside[0], False))
            b = inside[0]
        elif n - b > CDC_MAX:
            out.append((b, b + CDC_MAX, True))
            b += CDC_MAX
        else:
            out.append((b, n, False))
            b = n
    return out


@pytest.mark.parametrize(
    "text",
    [
        "",
        "x",
        "short doc",
        "y" * (CDC_W - 1),
        "the quick brown fox jumps over the lazy dog. " * 40,
        "Z" * 2000,                      # no candidates: all forced cuts
        "héllo wörld ünïcode ✓ " * 80,   # multibyte code points
    ],
)
def test_boundaries_match_naive_reference(text):
    assert cdc_boundaries(text) == _naive_boundaries(text)


def test_boundary_invariants():
    import random

    rng = random.Random(5)
    for _ in range(30):
        n = rng.randrange(0, 3000)
        text = "".join(chr(rng.randrange(32, 1000)) for _ in range(n))
        bs = cdc_boundaries(text)
        if n == 0:
            assert bs == []
            continue
        assert bs[0][0] == 0 and bs[-1][1] == n
        for (b, e, f), (b2, _, _) in zip(bs, bs[1:]):
            assert e == b2
        for b, e, f in bs[:-1]:
            assert CDC_MIN <= e - b <= CDC_MAX
        assert bs[-1][1] - bs[-1][0] <= CDC_MAX
        for b, e, f in bs:
            if f:
                assert e - b == CDC_MAX


def test_edit_resynchronization():
    """The CDC property fixed-size chunking lacks: an insertion changes
    only chunks near the edit — downstream boundaries re-sync, so the
    chunk-hash overlap stays high."""
    import random

    rng = random.Random(17)
    text = "".join(
        rng.choice("abcdefgh ijklmnop") for _ in range(4000)
    )
    edited = text[:1700] + "[EDIT-INSERTED-SPAN]" + text[1700:]
    h1 = [hashlib.md5(text[b:e].encode()).hexdigest()
          for b, e, _ in cdc_boundaries(text)]
    h2 = {hashlib.md5(edited[b:e].encode()).hexdigest()
          for b, e, _ in cdc_boundaries(edited)}
    shared = sum(1 for h in h1 if h in h2)
    assert shared >= len(h1) - 6, (shared, len(h1))


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=0, max_size=1200))
def test_boundaries_hypothesis(text):
    assert cdc_boundaries(text) == _naive_boundaries(text)


def test_spark_chunks_and_sharing(spark):
    from modeltracking_spark.operators.cdc import (
        cdc_chunks,
        cdc_shared_chunk_stats,
    )

    # longer than CDC_MAX so the first cut always lands inside the
    # shared prefix — sharing is then deterministic, not probabilistic
    boiler = "SHARED BOILERPLATE HEADER, IDENTICAL ACROSS DOCS. " * 8
    rows = [
        (0, boiler + "unique tail zero " * 30),
        (1, boiler + "entirely different body one " * 25),
        (2, "no boilerplate here at all " * 28),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload string")
    ch = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in cdc_chunks(df, "payload").collect()
    }
    # kernel output matches the pure-Python walk chunk for chunk
    for did, text in rows:
        ref = cdc_boundaries(text)
        for i, (b, e, f) in enumerate(ref):
            r = ch[(did, i)]
            assert (r["start"], r["chunk_len"], r["forced"]) == (b, e - b, f)
            assert r["chunk_md5"] == hashlib.md5(
                text[b:e].encode()
            ).hexdigest()
    stats = {
        r["doc_id"]: r for r in cdc_shared_chunk_stats(df, "payload").collect()
    }
    # docs 0 and 1 share the boilerplate prefix chunks; doc 2 shares none
    assert stats[0]["n_shared_chunks"] >= 1
    assert stats[1]["n_shared_chunks"] >= 1
    assert stats[2]["n_shared_chunks"] == 0
    assert stats[0]["shared_chars"] > 0
    assert stats[2]["shared_chars"] == 0
