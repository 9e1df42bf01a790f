"""Time-epoch conversions (SURVEY.md F1–F3, F9).

The reference's time currency is **integer hours since 2000-01-01 00:00
UTC** — HYCOM's time axis unit (``trackplot_hycom.py:137-141``), produced
by ``hurrtimeconv`` (``trackplot_hycom.py:150-156``) and inverted by
``ymdh`` (``trackplot_hycom.py:45-50``).

Timezone discipline: the hour-offset expressions are built on timestamp
*differences* / *additions*, which are invariant to the session timezone
(both operands shift together), so results match a tz-naive oracle
regardless of ``spark.sql.session.timeZone``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference epoch (trackplot_hycom.py:137-141)
EPOCH_2000 = "TIMESTAMP '2000-01-01 00:00:00'"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hours_since_2000(ts: Column | str) -> Column:
    """F1/F3: timestamp → integer hours since 2000-01-01 00:00 UTC.

    ``hurrtimeconv`` semantics (trackplot_hycom.py:150-156): elapsed whole
    hours. The anchor is an exact hour, so "complete hours" (Spark
    TIMESTAMPDIFF) equals "hour boundaries crossed" (the oracle's
    datediff) for all post-epoch inputs.
    """
    return F.timestamp_diff("HOUR", F.expr(EPOCH_2000), _col(ts))


def ts_from_hours_since_2000(hours: Column | str) -> Column:
    """F2 core: hours offset → timestamp (inverse of hours_since_2000)."""
    return F.timestamp_add("HOUR", _col(hours), F.expr(EPOCH_2000))


def parse_ymdh(s: Column | str) -> Column:
    """Parse the track files' ``yyyyMMddHH`` strings (F1 front half).

    e.g. ``'2016081718'`` (Hurricanefiles/al092016_track.csv:2, col 0).
    """
    return F.to_timestamp(_col(s), "yyyyMMddHH")


def format_ymdh(ts: Column | str) -> Column:
    """F2: timestamp → ``yyyyMMddHH`` string (ymdh, trackplot_hycom.py:45-50)."""
    return F.date_format(_col(ts), "yyyyMMddHH")
