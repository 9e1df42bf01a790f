"""Partition-width guard for CPU-heavy per-row kernels.

A narrow mapInPandas kernel inherits the scan's split count.  That is
the right default — no shuffle — but when the upstream source yielded
FEWER splits than the session's parallelism (a single local parquet
file, one fat .gz shard, a small slice read on a big cluster), the
whole decode tier serializes onto a handful of cores while the rest
idle.  ``widen_for_kernel`` repartitions round-robin up to the default
parallelism ONLY in that under-split case:

- at 100 TB the scan already carries orders of magnitude more splits
  than cores — the guard is a no-op and the kernel stays shuffle-free;
- on under-split inputs it pays one bounded exchange of exactly the
  kernel's input columns to unlock every core — the standard
  "repartition before expensive decode" move, made conditional so it
  never taxes the already-parallel case.

Plan posture is asserted in tests/test_scale_plans.py: kernels over
wide inputs show NO exchange; over under-split inputs exactly one
ROUND-ROBIN exchange and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_kernel(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session default parallelism when
    (and only when) the input is under-split. Streaming inputs pass
    through untouched (no .rdd on a streaming plan; micro-batch
    parallelism is the source's concern)."""
    if df.isStreaming:
        return df
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
    except Exception:  # pragma: no cover - exotic plans: keep the input
        pass
    return df
