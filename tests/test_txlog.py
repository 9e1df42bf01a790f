"""Transaction-log table format (operators/txlog.py): linearized
commits, optimistic-concurrency conflicts, checkpoint-vs-full-replay
equivalence, time travel, stats-based file skipping, and snapshot
isolation."""

from __future__ import annotations

import json
import os

import pytest

from modeltracking_spark.operators.txlog import (
    commit,
    latest_version,
    prune_files,
    read_snapshot,
    snapshot,
    write_files_commit,
)


def _add(path, mn=None, mx=None):
    a = {"path": path}
    if mn is not None:
        a.update(min_key=mn, max_key=mx, n_rows=mx - mn + 1)
    return {"add": a}


def test_commit_replay_and_last_writer_wins(tmp_path):
    log = str(tmp_path / "_log")
    assert latest_version(log) == -1
    commit(log, 0, [_add("a.parquet"), _add("b.parquet")])
    commit(log, 1, [{"remove": {"path": "a.parquet"}}, _add("c.parquet")])
    commit(log, 2, [_add("b.parquet", 10, 20)])  # re-add = replace stats
    assert latest_version(log) == 2
    live = snapshot(log)
    assert set(live) == {"b.parquet", "c.parquet"}
    assert live["b.parquet"]["min_key"] == 10  # last writer won


def test_commit_conflicts_are_loud(tmp_path):
    log = str(tmp_path / "_log")
    commit(log, 0, [_add("a.parquet")])
    with pytest.raises(ValueError, match="conflict"):
        commit(log, 0, [_add("b.parquet")])  # version taken
    with pytest.raises(ValueError, match="conflict"):
        commit(log, 5, [_add("b.parquet")])  # gap
    # removing an unknown action type fails replay loudly
    commit(log, 1, [_add("b.parquet")])
    bad = os.path.join(log, f"{2:020d}.json")
    with open(bad, "w") as f:
        f.write(json.dumps({"truncate": {}}) + "\n")
    with pytest.raises(ValueError, match="unknown log action"):
        snapshot(log)


def test_checkpoint_equals_full_replay(tmp_path):
    """A reader starting from the checkpoint sees exactly the state a
    from-zero replay sees, at every version — and only O(interval)
    commit files are needed after the newest checkpoint."""
    log = str(tmp_path / "_log")
    for v in range(13):
        acts = [_add(f"f{v}.parquet", v * 10, v * 10 + 9)]
        if v % 3 == 2:
            acts.append({"remove": {"path": f"f{v - 2}.parquet"}})
        commit(log, v, acts, checkpoint_interval=4)
    # checkpoints exist at 4, 8, 12
    for cv in (4, 8, 12):
        assert os.path.exists(os.path.join(log, f"{cv:020d}.checkpoint.json"))
    # replay equivalence at every historical version (time travel)
    for v in range(13):
        from_log = {}
        for w in range(v + 1):
            with open(os.path.join(log, f"{w:020d}.json")) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        from_log[a["add"]["path"]] = a["add"]
                    else:
                        from_log.pop(a["remove"]["path"], None)
        assert snapshot(log, as_of_version=v) == from_log, v


def test_prune_files_stats_skipping(tmp_path):
    state = {
        "lo.parquet": {"path": "lo.parquet", "min_key": 0, "max_key": 9},
        "mid.parquet": {"path": "mid.parquet", "min_key": 10, "max_key": 19},
        "hi.parquet": {"path": "hi.parquet", "min_key": 20, "max_key": 29},
        "nostats.parquet": {"path": "nostats.parquet"},
    }
    kept = prune_files(state, lo=12, hi=15)
    assert set(kept) == {"mid.parquet", "nostats.parquet"}
    assert set(prune_files(state, lo=None, hi=5)) == {
        "lo.parquet", "nostats.parquet"
    }
    assert set(prune_files(state)) == set(state)


def test_reader_snapshot_isolation_and_pruning(spark, tmp_path):
    """Files on disk but not in the log are INVISIBLE; stats pruning
    reaches the reader; time travel reads historical content."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    write_files_commit(
        {"lo": df.where("k < 50"), "hi": df.where("k >= 50")},
        table, 0, key_col="k",
    )
    # an orphan parquet file the log never saw
    df.where("k < 5").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(table, "_orphan_dir")
    )
    assert read_snapshot(spark, table).count() == 100
    # v1: delete the low half
    write_files_commit({}, table, 1, removes=["lo.parquet"], key_col="k")
    assert read_snapshot(spark, table).count() == 50
    assert read_snapshot(spark, table, as_of_version=0).count() == 100
    # stats pruning: asking for k<=10 after the delete matches nothing
    # in the live file ranges -> empty snapshot raises loudly
    with pytest.raises(ValueError, match="empty snapshot"):
        read_snapshot(spark, table, key_hi=10)
    # and a satisfiable range reads only the one file
    assert read_snapshot(spark, table, key_lo=60, key_hi=70).count() == 50


def test_streaming_exactly_once_txlog_sink(spark, tmp_path):
    """The exactly-once lakehouse sink: a real Structured Streaming
    query writes each micro-batch into the transaction log via
    foreachBatch, using batch_id as the commit version — an idempotent
    retry of an already-committed batch raises the version conflict and
    is SKIPPED, so replays can never double-write. The final snapshot
    equals the batch result exactly."""
    import glob
    import shutil

    from modeltracking_spark.streaming.windows import (
        run_stream_foreach_batch,
    )

    src_dir = str(tmp_path / "src")
    table = str(tmp_path / "sink")
    os.makedirs(table)
    # 3 json files -> maxFilesPerTrigger=1 forces >= 3 micro-batches
    os.makedirs(src_dir)
    rows = [(i, i * 3 % 7) for i in range(90)]
    for shard in range(3):
        with open(os.path.join(src_dir, f"s{shard}.json"), "w") as f:
            for i, v in rows[shard * 30 : shard * 30 + 30]:
                f.write(json.dumps({"k": i, "v": v}) + "\n")

    committed_batches = []

    def sink(df, batch_id):
        version = int(batch_id)
        try:
            write_files_commit(
                {f"batch{version}": df}, table, version, key_col="k"
            )
            committed_batches.append(version)
        except ValueError as exc:  # replayed batch: already committed
            if "conflict" not in str(exc):
                raise
        # simulate a replay of the SAME batch — must be a no-op
        try:
            write_files_commit(
                {f"batch{version}_dup": df}, table, version, key_col="k"
            )
            raise AssertionError("duplicate commit was accepted")
        except ValueError:
            pass
        # the duplicate's data file must not leak into the snapshot
        for orphan in glob.glob(os.path.join(table, f"batch{version}_dup*")):
            os.unlink(orphan)

    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    run_stream_foreach_batch(stream, sink, "txlog-sink-test")
    assert len(committed_batches) >= 3
    snap = read_snapshot(spark, table)
    assert snap.count() == 90
    got = {(r["k"], r["v"]) for r in snap.collect()}
    assert got == set(rows)
    # versions are dense 0..n-1 — the log IS the exactly-once ledger
    log = os.path.join(table, "_log")
    assert latest_version(log) == len(committed_batches) - 1
    shutil.rmtree(src_dir)


def test_commit_claim_is_link_atomic_not_rename(tmp_path):
    """The publish step must be an os.link claim: a racing writer whose
    version was taken between its check and its publish must FAIL, not
    silently replace the winner's commit (rename semantics would)."""
    log = str(tmp_path / "_log")
    commit(log, 0, [_add("winner.parquet")])
    # simulate the loser's interleaving: it validated version 1, then
    # the winner published version 1 first
    commit(log, 1, [_add("first.parquet")])
    path1 = os.path.join(log, f"{1:020d}.json")
    before = open(path1).read()
    with pytest.raises(ValueError, match="conflict"):
        commit(log, 1, [_add("second.parquet")])
    assert open(path1).read() == before  # winner's bytes untouched
    # and no temp files leak
    assert not [f for f in os.listdir(log) if f.endswith(".tmp")]


def test_streaming_weighted_reservoir_equals_batch_sample(spark, tmp_path):
    """Deterministic streaming reservoir: because A-Res priorities are
    RNG-free (md5-derived), maintaining a k-row reservoir across
    micro-batches via foreachBatch (merge batch candidates with the
    carried reservoir, keep top-k) converges to EXACTLY the batch
    weighted sample over all data — order-of-arrival-invariant, the
    property an RNG reservoir can't give you. Run on a REAL stream."""
    import json as _json

    from pyspark.sql import functions as F

    from modeltracking_spark.operators.sampling import (
        weighted_priority_sample,
    )
    from modeltracking_spark.streaming.windows import (
        run_stream_foreach_batch,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(f"k{i}", (i * 7) % 19 + 1) for i in range(600)]
    for shard in range(3):
        with open(os.path.join(src, f"s{shard}.json"), "w") as f:
            for kk, w in rows[shard * 200 : shard * 200 + 200]:
                f.write(_json.dumps({"k": kk, "w": w}) + "\n")

    state = {"reservoir": None}

    def sink(df, batch_id):
        cand = df.select("k", "w")
        if state["reservoir"] is not None:
            prev = spark.createDataFrame(
                state["reservoir"], "k string, w long"
            )
            cand = cand.unionByName(prev)
        top = weighted_priority_sample(cand, "k", "w", k=25)
        state["reservoir"] = [
            (r["key"], int(r["weight"])) for r in top.collect()
        ]

    stream = (
        spark.readStream.schema("k string, w long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    run_stream_foreach_batch(stream, sink, "reservoir-test")
    batch_df = spark.createDataFrame(rows, "k string, w long")
    want = [
        (r["key"], int(r["weight"]))
        for r in weighted_priority_sample(batch_df, "k", "w", k=25).collect()
    ]
    assert sorted(state["reservoir"]) == sorted(want)
    assert len(want) == 25


def test_update_reusing_logical_name_preserves_history(spark, tmp_path):
    """ADVICE r7 #3 regression: rewriting a bucket under the SAME
    logical name (the natural spelling of an UPDATE) must not clobber
    the bytes committed snapshots reference — physical names embed the
    version, so as_of_version time travel reads the ORIGINAL values
    after the rewrite, and a doomed writer (version conflict) leaves
    the table bytes untouched."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    df = spark.range(10).selectExpr("id AS k", "id * 2 AS v")
    write_files_commit({"b": df}, table, 0, key_col="k")
    v0 = sorted(r.v for r in read_snapshot(spark, table).collect())
    # UPDATE: same logical name, doubled values
    write_files_commit(
        {"b": df.selectExpr("k", "v * 2 AS v")}, table, 1,
        removes=["b.parquet"], key_col="k",
    )
    assert sorted(r.v for r in read_snapshot(spark, table).collect()) \
        == [x * 2 for x in v0]
    # history intact: v0 still reads the original bytes
    assert sorted(
        r.v for r in read_snapshot(spark, table, as_of_version=0).collect()
    ) == v0
    # two distinct physical files exist; neither was overwritten
    import glob as _glob
    files = sorted(os.path.basename(p)
                   for p in _glob.glob(os.path.join(table, "b-v*.parquet")))
    assert files == ["b-v00000000000000000000.parquet",
                     "b-v00000000000000000001.parquet"]
    # a conflicting version write fails BEFORE publishing any bytes
    before = set(os.listdir(table))
    with pytest.raises(ValueError, match="conflict"):
        write_files_commit({"b": df}, table, 1, key_col="k")
    assert set(os.listdir(table)) == before
    # a remove naming nothing live is loud, not silent
    with pytest.raises(ValueError, match="matches no live file"):
        write_files_commit({}, table, 2, removes=["ghost.parquet"],
                           key_col="k")
