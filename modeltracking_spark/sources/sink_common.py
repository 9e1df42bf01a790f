"""Shared two-phase-commit machinery for the from-spec file sinks
(parquet_native / orc_native writer arms).

The protocol is the classic Hadoop output-committer shape in
miniature: every task encodes its partition with the repo's own
from-spec writer and lands the file under
``<path>/_temporary/<run-id>/`` keyed by task attempt; only the
driver's ``commit()`` renames temp files into place and stamps
``_SUCCESS``; ``abort()`` removes the temp dir and never touches
visible output — a failed or speculative task can never expose
partial bytes.  One output file per partition, zero driver
involvement in the data path: the exact shape of a 100 TB export,
where upstream partitioning (not the sink) sizes the files.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class SinkCommit(WriterCommitMessage):
    temp_path: str
    final_name: str
    rows: int


class _FileSinkTask:
    """Executor-side half shared by the batch and streaming sinks:
    subclasses set ``suffix`` and ``flush_rows`` and implement the
    three incremental hooks — ``begin_file(fh)``,
    ``append_rows(columns)`` (one row group / stripe), and
    ``end_file()`` — plus ``__init__`` fields ``self.path`` /
    ``self.schema`` (the from-spec writer's ``(name, type, nullable)``
    list).  A task's memory is bounded by ONE flush unit, never its
    whole partition: rows stream to the temp file as each unit
    fills."""

    suffix = ".bin"
    flush_rows = 1 << 20

    def __init__(self, path: str, schema: list[tuple],
                 overwrite: bool):
        import uuid

        if not path:
            raise ValueError("file sink requires .option('path', ...)")
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        self.run_id = uuid.uuid4().hex[:12]

    def begin_file(self, fh):
        raise NotImplementedError

    def append_rows(self, columns: dict):
        raise NotImplementedError

    def end_file(self):
        raise NotImplementedError

    def convert_value(self, typ: str, v):
        """Hook for per-type Python-value conversion (e.g. datetime ->
        epoch micros)."""
        return v

    # -- executors ---------------------------------------------------
    def write(self, iterator):
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        tmp_dir = os.path.join(self.path, "_temporary", self.run_id)
        os.makedirs(tmp_dir, exist_ok=True)
        final = f"part-{pid:05d}-{self.run_id}{self.suffix}"
        attempt = ctx.taskAttemptId() if ctx else 0
        tmp = os.path.join(tmp_dir, f"{final}.{attempt}.tmp")
        types = {name: t for name, t, _n in self.schema}
        cols = {name: [] for name in types}
        buffered = 0
        n = 0
        with open(tmp, "wb") as fh:
            self.begin_file(fh)
            for batch in iterator:
                d = batch.to_pydict()
                for name in cols:
                    conv = self.convert_value
                    cols[name].extend(
                        None if v is None else conv(types[name], v)
                        for v in d[name])
                buffered += batch.num_rows
                n += batch.num_rows
                while buffered >= self.flush_rows:
                    fr = self.flush_rows
                    self.append_rows(
                        {k: v[:fr] for k, v in cols.items()})
                    cols = {k: v[fr:] for k, v in cols.items()}
                    buffered -= fr
            if buffered:
                self.append_rows(cols)
            self.end_file()
        return SinkCommit(temp_path=tmp, final_name=final, rows=n)

    def _drop_temp(self):
        import contextlib
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_temporary", self.run_id),
                      ignore_errors=True)
        with contextlib.suppress(OSError):  # other runs may be live
            os.rmdir(os.path.join(self.path, "_temporary"))


class TwoPhaseFileSinkWriter(_FileSinkTask, DataSourceArrowWriter):
    """Batch sink: the classic job-level two-phase commit — rename on
    the driver, then stamp ``_SUCCESS``."""

    # -- driver ------------------------------------------------------
    def commit(self, messages):
        import os

        # DataSourceWriter.commit is typed List[Optional[...]]: a
        # failed task contributes None.  Filter BEFORE the overwrite
        # delete so a None can never strand the directory with neither
        # old data nor _SUCCESS.
        msgs = [m for m in messages if m is not None]
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(self.suffix) or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
        for m in msgs:
            os.replace(m.temp_path,
                       os.path.join(self.path, m.final_name))
        self._drop_temp()
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(f"{sum(m.rows for m in msgs)}\n")

    def abort(self, messages):
        # drop this run's temp dir; visible output is never touched
        self._drop_temp()


class TwoPhaseStreamFileSinkWriter(_FileSinkTask,
                                   DataSourceStreamArrowWriter):
    """Streaming sink: per-EPOCH two-phase commit with an idempotence
    log.  Each micro-batch's task files land under the run temp dir;
    ``commit(messages, batchId)`` renames them to deterministic
    ``part-<batchId>-<i>`` names and appends the batchId to the
    ``_epochs`` log ATOMICALLY (tmp + rename) — a REPLAYED epoch
    (same batchId after a restart) is detected in the log and its
    temp files are dropped without touching visible output, which is
    what makes the sink exactly-once end to end (the same
    idempotent-writer pattern as the repo's foreachBatch txlog
    sink)."""

    def _committed(self) -> set[int]:
        import os

        log = os.path.join(self.path, "_epochs")
        if not os.path.exists(log):
            return set()
        with open(log) as fh:
            return {int(x) for x in fh.read().split()}

    def commit(self, messages, batchId: int):
        import os

        done = self._committed()
        if batchId in done:
            for m in messages:  # replay: drop temps, keep output
                if m is not None and os.path.exists(m.temp_path):
                    os.remove(m.temp_path)
            return
        i = 0
        for m in messages:
            if m is None:
                continue
            os.replace(m.temp_path, os.path.join(
                self.path,
                f"part-{batchId:08d}-{i:05d}{self.suffix}"))
            i += 1
        log = os.path.join(self.path, "_epochs")
        tmp = f"{log}.{batchId}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            fh.write(" ".join(str(b) for b in sorted(done | {batchId})))
        os.replace(tmp, log)

    def abort(self, messages, batchId: int):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)
