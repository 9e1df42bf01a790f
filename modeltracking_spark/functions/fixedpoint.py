"""The repo's core engine-exactness primitive, in ONE place.

``e6_half_up`` is the half-up e6 fixed-point lift every scoring operator
relies on: ``floor(x*1e6 + 0.5)`` as BIGINT — identical in Spark and
DuckDB, unlike ``round()``, whose half-rule differs by engine for
negative values. Oracle twin: ``floor(x * 1e6 + 0.5::DOUBLE)::BIGINT``.

Previously copied privately into corpus/retrieval/classifier modules; a
drift in any copy would silently break hash-exactness for just that
module, so the copies now all alias this function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def e6_half_up(col: Column) -> Column:
    return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")
