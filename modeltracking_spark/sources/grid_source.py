"""Custom Spark 4 Python DataSource for the HYCOM-style grid (S6).

The reference reads the 4-D grid over OPeNDAP with server-side slicing
(``netCDF4.Dataset(url)``, ``trackplot_hycom.py:144``, ``:110``). The
engine's correctness tier uses the parquet-materialized/formula fixture;
this DataSource is the LIVE-source shape: a ``pyspark.sql.datasource``
implementation exposing the grid as a long DataFrame with one input
partition per time step — the unit a remote reader would fetch per DAP
request, and the unit Spark schedules across executors.

A real deployment would swap ``_partition_arrays`` for a pydap/netCDF4
slice fetch per partition (each task pulls ``var[t, :, :, :]``); the
partitioning, schema, and Arrow-batch emission stay identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from modeltracking_spark.fixtures import (
    GRID_DEPTH_STEP,
    GRID_LAT0,
    GRID_LAT_STEP,
    GRID_LON0,
    GRID_LON_STEP,
    GRID_N_DEPTH,
    GRID_N_LAT,
    GRID_N_LON,
    GRID_N_TIME,
    GRID_SENTINEL,
    GRID_TIME_STEP,
)

GRID_SCHEMA_DDL = (
    "time_hours bigint, depth_idx int, depth_m double, lat_idx int, "
    "lon_idx int, lat double, lon double, water_temp double, salinity double"
)


def _partition_arrays(ti: int):
    """One time step as numpy columns — byte-identical to the Spark/SQL
    fixture formulas (integer-derived doubles)."""
    import numpy as np

    d, la, lo = np.meshgrid(
        np.arange(GRID_N_DEPTH, dtype=np.int64),
        np.arange(GRID_N_LAT, dtype=np.int64),
        np.arange(GRID_N_LON, dtype=np.int64),
        indexing="ij",
    )
    d, la, lo = d.ravel(), la.ravel(), lo.ravel()
    temp = ((la * 7 + lo * 11 + d * 5 + ti * 3) % 200).astype(np.float64) * 0.1
    temp_sent = (la * 13 + lo * 7 + d * 3 + ti) % 37 == 0
    temp[temp_sent] = GRID_SENTINEL
    sal = 30.0 + ((la * 3 + lo * 5 + d * 7 + ti * 11) % 80).astype(np.float64) * 0.1
    sal_sent = (la * 11 + lo * 3 + d * 5 + ti) % 41 == 0
    sal[sal_sent] = GRID_SENTINEL
    return {
        "time_hours": np.full(d.shape, ti * GRID_TIME_STEP, dtype=np.int64),
        "depth_idx": d.astype(np.int32),
        "depth_m": d.astype(np.float64) * GRID_DEPTH_STEP,
        "lat_idx": la.astype(np.int32),
        "lon_idx": lo.astype(np.int32),
        "lat": GRID_LAT0 + la.astype(np.float64) * GRID_LAT_STEP,
        "lon": GRID_LON0 + lo.astype(np.float64) * GRID_LON_STEP,
        "water_temp": temp,
        "salinity": sal,
    }


#: comparison filters the reader can satisfy by time-step pruning
_TIME_FILTERS = (
    EqualTo,
    In,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
)


def _time_filter_match(f, th: int) -> bool:
    if isinstance(f, EqualTo):
        return th == f.value
    if isinstance(f, In):
        return th in f.values
    if isinstance(f, GreaterThan):
        return th > f.value
    if isinstance(f, GreaterThanOrEqual):
        return th >= f.value
    if isinstance(f, LessThan):
        return th < f.value
    return th <= f.value  # LessThanOrEqual


class HycomGridReader(DataSourceReader):
    def __init__(self, options):
        self.n_time = int(options.get("n_time", GRID_N_TIME))
        self._time_filters: list = []

    def partitions(self):
        # one partition per time step: the remote-fetch unit AND the
        # parallelism unit — 1000 executors each pull disjoint slices;
        # pushed time filters prune steps before any task launches
        keep = [
            t
            for t in range(self.n_time)
            if all(
                _time_filter_match(f, t * GRID_TIME_STEP)
                for f in self._time_filters
            )
        ]
        return [InputPartition(t) for t in keep]

    def read(self, partition):
        import pyarrow as pa

        cols = _partition_arrays(partition.value)
        yield pa.RecordBatch.from_pydict(cols)


class HycomGridPushdownReader(HycomGridReader):
    """Reader variant with filter pushdown (``.option("pushdown",
    "true")``; needs ``spark.sql.python.filterPushdown.enabled=true`` —
    a Spark session config, which is why it is opt-in: a reader that
    *declares* ``pushFilters`` fails outright in sessions without the
    flag, and the correctness-tier query must run under the driver's
    default session)."""

    def pushFilters(self, filters):
        """Partition pruning: comparison predicates on ``time_hours`` are
        absorbed (every row of a partition shares one time step, so
        pruning the step list satisfies them exactly); everything else is
        handed back for Spark to evaluate. This is the Python-DataSource
        analog of the reference's server-side DAP slicing
        (``trackplot_hycom.py:110`` ships index ranges to the THREDDS
        server) — at 100 TB it's the difference between scheduling
        n_time tasks and scheduling the probed few.
        """
        for f in filters:
            if isinstance(f, _TIME_FILTERS) and f.attribute == ("time_hours",):
                self._time_filters.append(f)
            else:
                yield f


class HycomGridDataSource(DataSource):
    """``spark.read.format("hycom_grid")`` after
    ``spark.dataSource.register(HycomGridDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "hycom_grid"

    def schema(self) -> str:
        return GRID_SCHEMA_DDL

    def reader(self, schema):
        if self.options.get("pushdown", "false").lower() == "true":
            return HycomGridPushdownReader(self.options)
        return HycomGridReader(self.options)
