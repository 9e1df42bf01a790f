"""Winnowing fingerprint tests: exact parity with a driver-side Python
reference implementation, and the MOSS guarantee (any shared substring
of length ≥ k + window − 1 produces at least one shared fingerprint).
"""

import re

from modeltracking_spark.operators.textops import (
    WINNOW_BASE,
    WINNOW_PRIME,
    winnow_fingerprints,
)

K, W = 7, 5


def py_winnow(text: str) -> set[tuple[int, int]]:
    norm = re.sub(r"\s+", " ", text.strip()).lower()
    m = max(len(norm) - K + 1, 1)
    hs = []
    for i in range(m):
        acc = 0
        for ch in norm[i : i + K]:
            acc = (acc * WINNOW_BASE + ord(ch)) % WINNOW_PRIME
        hs.append(acc)
    sel = set()
    for j in range(max(len(hs) - W + 1, 1)):
        sl = hs[j : j + W]
        mn = min(sl)
        r = max(i for i, v in enumerate(sl) if v == mn)
        sel.add((j + r + 1, mn))  # 1-based position
    return sel


def _spark_winnow(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=K, window=W).collect():
        out.setdefault(r["id"], set()).add((r["pos"], r["fp_hash"]))
    return out


def test_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "select a from b where   c = d and e < f",
        "short",
        "aaaaaaaaaaaaaaaaaaaa",  # all-equal hashes: rightmost-min ties
        "Mixed CASE   and\twhitespace\nnormalization check",
    ]
    got = _spark_winnow(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == py_winnow(t), f"doc {i}"


def test_shared_substring_guarantee(spark):
    # two docs sharing a substring of length k + w - 1 = 11 must share
    # at least one fingerprint hash
    shared = "zqxjkvwpbfm"  # 11 chars, unlikely elsewhere
    a = f"left padding text {shared} tail one"
    b = f"completely different prefix {shared} other suffix"
    got = _spark_winnow(spark, [a, b])
    hashes_a = {h for _, h in got[0]}
    hashes_b = {h for _, h in got[1]}
    assert hashes_a & hashes_b


def test_pandas_and_sql_impls_bit_identical(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick  brown fox JUMPS over the lazy dog  "),
            (3, "ab"),  # shorter than k
            (4, ""),  # empty
            (5, "exactly7"),  # around the gram boundary
            (6, "tiny doc with n_grams < window"),
            # non-ASCII BMP: é (U+00E9), ß (U+00DF), 中文 (CJK BMP) — one
            # UTF-16 code unit each, so both impls see the same codepoints
            (7, "café über München 中文处理 naïve résumé test"),
        ],
        ["doc_id", "text"],
    )
    a = {tuple(r) for r in winnow_fingerprints(df, impl="sql").collect()}
    b = {tuple(r) for r in winnow_fingerprints(df, impl="pandas").collect()}
    assert a == b


def test_pandas_impl_handles_astral_plane(spark):
    # impl='sql' is documented BMP-only (UTF-16 code units); the default
    # pandas path must agree with the UTF-32-codepoint Python reference
    # even for astral-plane text (emoji = surrogate pairs in UTF-16)
    t = "emoji test \U0001f600\U0001f680 rocket faces and more text here"
    got = _spark_winnow(spark, [t])
    assert got[0] == py_winnow(t)
