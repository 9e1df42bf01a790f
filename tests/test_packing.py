"""Sequence packing: chunk arithmetic + greedy fold vs Python reference."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modeltracking_spark.operators.packing import pack_chunk, pack_greedy


def _greedy_ref(lens: list[int], max_len: int) -> list[tuple[int, int]]:
    pack, fill, out = 0, 0, []
    for ln in lens:
        if fill > 0 and fill + ln > max_len:
            pack, fill = pack + 1, 0
        out.append((pack, fill))
        fill += ln
        if fill >= max_len:
            pack, fill = pack + 1, 0
    return out


def test_chunk_offsets_and_ids(spark):
    rows = [("a", 1, 300), ("a", 2, 300), ("a", 3, 100), ("b", 10, 600)]
    df = spark.createDataFrame(rows, ["bucket", "doc_id", "n_tok"])
    got = {
        r["doc_id"]: (r["start_off"], r["pack_id"], r["pack_off"])
        for r in pack_chunk(df, "doc_id", "n_tok", "bucket", 512).collect()
    }
    assert got[1] == (0, 0, 0)
    assert got[2] == (300, 0, 300)  # straddles the 512 cut, starts in pack 0
    assert got[3] == (600, 1, 88)
    assert got[10] == (0, 0, 0)  # buckets are independent


def test_greedy_never_overflows_or_straddles(spark):
    rows = [("a", i, ln) for i, ln in enumerate([200, 200, 200, 600, 10, 512])]
    df = spark.createDataFrame(rows, ["bucket", "doc_id", "n_tok"])
    out = pack_greedy(df, "doc_id", "n_tok", "bucket", 512).collect()
    got = {r["doc_id"]: (r["pack_id"], r["pack_off"]) for r in out}
    assert got == dict(enumerate(_greedy_ref([200, 200, 200, 600, 10, 512], 512)))
    # no pack holds more than max_len except single oversized docs
    by_pack: dict[int, int] = {}
    for r in out:
        by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + r["n_tok"]
    for pid, total in by_pack.items():
        members = [r for r in out if r["pack_id"] == pid]
        assert total <= 512 or len(members) == 1


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=30)
)
def test_greedy_matches_reference(spark, lens):
    rows = [("x", i, ln) for i, ln in enumerate(lens)]
    df = spark.createDataFrame(rows, ["bucket", "doc_id", "n_tok"])
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_off"])
        for r in pack_greedy(df, "doc_id", "n_tok", "bucket", 512).collect()
    }
    assert got == dict(enumerate(_greedy_ref(lens, 512)))
