"""Driver-facing query registry package.

Each sibling module registers (PySpark query, DuckDB oracle SQL) pairs via
the ``@query`` decorator in :mod:`modeltracking_spark.queries.common`.
``load_registries()`` imports every query module and returns the filled
``QUERIES`` / ``ORACLES`` dicts — the single entry point used by
``__spark_entry__.py``.
"""

from __future__ import annotations

import importlib
import sys

from modeltracking_spark.queries.common import ORACLES, QUERIES

#: every module that registers queries; imported lazily by load_registries
QUERY_MODULES = (
    "modeltracking_spark.queries.core",
    "modeltracking_spark.queries.timegeo",
    "modeltracking_spark.queries.joins_q",
    "modeltracking_spark.queries.aggs_q",
    "modeltracking_spark.queries.track_q",
    "modeltracking_spark.queries.dedup_q",
    "modeltracking_spark.queries.text_q",
    "modeltracking_spark.queries.sim_q",
    "modeltracking_spark.queries.stream_q",
    "modeltracking_spark.queries.multimodal_q",
    "modeltracking_spark.queries.extras_q",
)


def load_registries() -> tuple[dict, dict]:
    """Import all query modules (idempotent) and return (QUERIES, ORACLES).

    One broken module must not zero the whole registry (the round-2
    failure mode), so imports are individually guarded; failures are
    reported on stderr and the remaining modules still register.
    """
    for mod in QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as exc:  # pragma: no cover - defensive
            print(f"[queries] failed to import {mod}: {exc!r}", file=sys.stderr)
    return dict(QUERIES), dict(ORACLES)
