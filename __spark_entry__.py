"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``modeltracking_spark/queries/`` and register
themselves through the ``@query`` decorator; this module only forwards
the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the package lives next to this file; make the import robust to the
# driver invoking us from any working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from modeltracking_spark.queries import load_registries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The track-style temporal aggregate of SURVEY.md §7.1: ``events`` ->
    sentinel mask (P3) -> hours-since-2000 day bucket (F1) -> grouped
    min/max/avg/count (A1) per (day, event_type).
    """
    from modeltracking_spark.queries import core

    return core.flagship_events_daily(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    q, _ = load_registries()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query.

    Keys missing here (present in ``queries()``) are genuinely
    non-SQL-expressible ops; the driver records a rows-only check.
    """
    _, o = load_registries()
    return o
