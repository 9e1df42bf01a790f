"""Transaction-log table format (extension surface; SURVEY.md §2.12
storage tier) — a Delta-protocol-shaped commit log over plain parquet,
built from the PUBLIC Delta Lake protocol description (linearized JSON
commits named ``NNNNNNNNNNNNNNNNNNNN.json``, add/remove file actions,
periodic checkpoints, last-writer-wins per path) — the missing half of
the lakehouse story next to ``merge_upsert``/``scd2_apply`` (row-level
semantics) and ``compaction_plan_orders`` (file-level maintenance).

What it gives the engine:

- **snapshot isolation**: readers materialize the live file set from
  the log, never from directory listing — half-written files are
  invisible until their commit lands;
- **time travel**: ``snapshot(log_dir, as_of_version=k)`` replays the
  prefix of the log;
- **checkpointing**: every ``checkpoint_interval`` commits the full
  live state is written as ``NNN....checkpoint.json`` so a reader
  replays O(interval) commits, not O(history) — the scale bound on the
  driver-side log replay (the log is file METADATA: thousands of rows
  where the data is billions; the same sanctioned-materialization class
  as the IVF centroid table);
- **stats-based file skipping**: add-actions carry per-file min/max
  key stats; ``prune_files`` drops files whose range cannot match a
  predicate — partition-pruning semantics carried by the LOG rather
  than by directory names.

Commits are atomic via the write-temp-then-``os.rename`` publish used
by every fixture writer in this repo; concurrent writers racing on the
same version lose the rename and must retry on the next version — the
optimistic-concurrency shape of the real protocol.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _commit_path(log_dir: str, version: int) -> str:
    return os.path.join(log_dir, f"{version:020d}.json")


def _checkpoint_path(log_dir: str, version: int) -> str:
    return os.path.join(log_dir, f"{version:020d}.checkpoint.json")


def latest_version(log_dir: str) -> int:
    """Highest committed version, or -1 for an empty/absent log."""
    if not os.path.isdir(log_dir):
        return -1
    vs = [
        int(f[:20])
        for f in os.listdir(log_dir)
        if len(f) == 25 and f.endswith(".json") and f[:20].isdigit()
    ]
    return max(vs, default=-1)


def commit(log_dir: str, version: int, actions: list[dict],
           checkpoint_interval: int = 10) -> None:
    """Atomically publish commit ``version`` (must be exactly
    ``latest_version + 1`` — optimistic concurrency: a racing writer
    loses the rename or fails this check and retries on a fresh
    version). Actions: ``{"add": {"path", "n_rows", "min_key",
    "max_key"}}`` or ``{"remove": {"path"}}``. Every
    ``checkpoint_interval`` commits a checkpoint of the full live state
    is also published."""
    os.makedirs(log_dir, exist_ok=True)
    expected = latest_version(log_dir) + 1
    if version != expected:
        raise ValueError(
            f"commit conflict: version {version} but log is at "
            f"{expected - 1} (retry at {expected})"
        )
    final = _commit_path(log_dir, version)
    tmp = f"{final}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, sort_keys=True) + "\n")
    # atomic CLAIM, not rename: os.rename silently REPLACES an existing
    # target on POSIX (a racing loser would overwrite the winner's
    # commit — a TOCTOU the exists-check above cannot close); os.link
    # fails with EEXIST, so exactly one writer publishes each version
    try:
        os.link(tmp, final)
    except OSError:
        raise ValueError(
            f"commit conflict: version {version} already published"
        )
    finally:
        os.unlink(tmp)
    if version > 0 and version % checkpoint_interval == 0:
        state = snapshot(log_dir, as_of_version=version)
        cp_tmp = _checkpoint_path(log_dir, version) + f".{os.getpid()}.tmp"
        with open(cp_tmp, "w") as f:
            for add in sorted(state.values(), key=lambda a: a["path"]):
                f.write(json.dumps({"add": add}, sort_keys=True) + "\n")
        os.rename(cp_tmp, _checkpoint_path(log_dir, version))


def snapshot(log_dir: str, as_of_version: int | None = None) -> dict:
    """Materialize the live file set ``{path: add_action}`` at
    ``as_of_version`` (default: latest). Starts from the newest
    checkpoint at or below the target version and replays only the
    commits after it — O(checkpoint_interval) JSON files regardless of
    history length."""
    target = latest_version(log_dir) if as_of_version is None else as_of_version
    if target < 0:
        return {}
    if not os.path.exists(_commit_path(log_dir, target)):
        raise ValueError(f"no commit {target} in {log_dir}")
    start = 0
    live: dict[str, dict] = {}
    for v in range(target, -1, -1):
        cp = _checkpoint_path(log_dir, v)
        if os.path.exists(cp):
            with open(cp) as f:
                for line in f:
                    a = json.loads(line)["add"]
                    live[a["path"]] = a
            start = v + 1
            break
    for v in range(start, target + 1):
        with open(_commit_path(log_dir, v)) as f:
            for line in f:
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "meta" not in action:
                    raise ValueError(f"unknown log action {action}")
    return live


def prune_files(state: dict, lo=None, hi=None) -> dict:
    """Stats-based file skipping: keep files whose [min_key, max_key]
    range intersects [lo, hi] (None = unbounded). Files without stats
    are conservatively kept."""
    out = {}
    for path, a in state.items():
        mn, mx = a.get("min_key"), a.get("max_key")
        if mn is not None and hi is not None and mn > hi:
            continue
        if mx is not None and lo is not None and mx < lo:
            continue
        out[path] = a
    return out


def read_snapshot(spark: SparkSession, table_dir: str,
                  as_of_version: int | None = None,
                  key_lo=None, key_hi=None) -> DataFrame:
    """The reader: log replay -> (optional) stats pruning -> one
    parquet scan over exactly the live files. An empty snapshot raises
    (a caller reading a never-committed table is a bug, not an empty
    DataFrame)."""
    state = snapshot(os.path.join(table_dir, "_log"), as_of_version)
    state = prune_files(state, key_lo, key_hi)
    if not state:
        raise ValueError(f"empty snapshot for {table_dir}")
    paths = sorted(os.path.join(table_dir, p) for p in state)
    return spark.read.parquet(*paths)


def write_files_commit(df_by_name: dict[str, DataFrame], table_dir: str,
                       version: int, removes: list[str] = (),
                       key_col: str | None = None,
                       checkpoint_interval: int = 10,
                       extra_actions: list[dict] = ()) -> None:
    """Write each DataFrame as ONE parquet file under ``table_dir`` and
    publish a commit adding them (plus ``removes``). Files are written
    to temp names and only referenced by the log once fully on disk —
    the snapshot-isolation contract.

    IMMUTABLE DATA FILES (ADVICE r7 #3): physical names embed the
    commit version (``{name}-v{version:020d}.parquet``), so a caller
    reusing a logical name across versions — the natural spelling of an
    UPDATE — can never overwrite bytes referenced by committed
    snapshots, and historical ``as_of_version`` reads stay valid. Data
    is only moved into place after a pre-flight version-conflict check
    (a lost optimistic-concurrency race leaves the table untouched, not
    clobbered), and landing onto an existing final path is refused
    loudly — the real protocol's immutable-object-store invariant.

    ``removes`` entries may be either exact physical paths from a prior
    snapshot or a logical name's file (``{name}.parquet``), which
    resolves to every live ``{name}-v*.parquet``."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    log_dir = os.path.join(table_dir, "_log")
    # pre-flight: the authoritative EEXIST check still happens inside
    # commit(); this early check keeps a doomed writer from publishing
    # any bytes at all (a racing duplicate leaves zero orphans)
    expected = latest_version(log_dir) + 1
    if version != expected:
        raise ValueError(
            f"commit conflict: version {version} but log is at "
            f"{expected - 1}"
        )
    live = set(snapshot(log_dir)) if expected > 0 else set()

    resolved_removes: list[str] = []
    for r in removes:
        if r in live:
            resolved_removes.append(r)
            continue
        stem = r[:-len(".parquet")] if r.endswith(".parquet") else r
        matches = [p for p in live
                   if p.startswith(f"{stem}-v") and p.endswith(".parquet")]
        if not matches:
            raise ValueError(
                f"remove {r!r} matches no live file (live: {sorted(live)})"
            )
        resolved_removes.extend(sorted(matches))

    actions: list[dict] = [{"remove": {"path": p}}
                           for p in resolved_removes]
    for name, df in df_by_name.items():
        tmp = os.path.join(table_dir, f"_tmp_{name}_{os.getpid()}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        rel = f"{name}-v{version:020d}.parquet"
        final = os.path.join(table_dir, rel)
        if os.path.exists(final):
            shutil.rmtree(tmp, ignore_errors=True)
            raise ValueError(
                f"refusing to overwrite existing data file {rel!r} "
                "(data files are immutable once published)"
            )
        os.replace(part, final)
        shutil.rmtree(tmp, ignore_errors=True)
        add = {"path": rel}
        if key_col is not None:
            stats = df.agg(
                F.min(key_col).alias("mn"), F.max(key_col).alias("mx"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            add.update(
                min_key=stats["mn"], max_key=stats["mx"],
                n_rows=int(stats["n"]),
            )
        actions.append({"add": add})
    # e.g. {"meta": {...}} txn markers — published ATOMICALLY with the
    # adds (exactly-once ingest depends on add+txn landing together)
    actions.extend(extra_actions)
    commit(log_dir, version, actions, checkpoint_interval)
