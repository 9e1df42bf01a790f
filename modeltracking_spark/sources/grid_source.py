"""Custom Spark 4 Python DataSource for the HYCOM-style grid (S6).

The reference reads the 4-D grid over OPeNDAP with server-side slicing
(``netCDF4.Dataset(url)``, ``trackplot_hycom.py:144``, ``:110``). This
DataSource is the LIVE-source shape: a ``pyspark.sql.datasource``
implementation exposing the grid as a long DataFrame with one input
partition per time step — the unit a remote reader would fetch per DAP
request, and the unit Spark schedules across executors.

Two backends, chosen by the ``path`` option:

- no ``path`` (default): the deterministic formula fixture — the
  correctness tier's in-memory twin of the parquet fixture.
- ``.option("path", "/…/grid.nc")``: a REAL netCDF classic file read
  via ``sources/netcdf_classic.py``. Each partition seeks to its
  timestep's record byte range (``begin + t*recsize``) and reads ONLY
  that slice — the local-file analog of the reference's server-side DAP
  slicing (``trackplot_hycom.py:110`` ships index ranges to the THREDDS
  server). Time-filter pushdown prunes partitions before any task
  launches in both backends.
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


def _var_cf_attrs(nc, var: str) -> dict:
    """CF attributes of ``var`` from either reader: ``NcFile`` exposes
    ``nc.vars[v].attrs`` (an object attribute), ``DapDataset.vars[v]``
    is a (type, dims) tuple so its attrs come from the cached ``.das``
    fetch via ``var_attrs``. Before r8 the DAP arm was missing: a
    packed int16 dataset served over ``dap+http://`` silently decoded
    to raw packed values (ADVICE r7 #2)."""
    v = getattr(nc, "vars", {}).get(var)
    attrs = getattr(v, "attrs", None)
    if attrs is not None:
        return attrs
    getter = getattr(nc, "var_attrs", None)
    return getter(var) if getter is not None else {}


def _physics_slice(nc, var: str, ti: int):
    """One physics record, CF-unpacked when the variable is PACKED
    (int16 + scale/offset/missing attrs — how real HYCOM serves its
    hypercubes), over BOTH the file and the DAP reader; missing values
    come back as the pipeline's sentinel either way, so downstream code
    sees one schema regardless of on-disk packing or transport."""
    import numpy as np

    attrs = _var_cf_attrs(nc, var)
    if attrs and ("scale_factor" in attrs or "missing_value" in attrs
                  or "_FillValue" in attrs):
        a = nc.read_slice(var, ti, apply_cf=True)
        return np.where(np.isnan(a), GRID_SENTINEL, a)
    return nc.read_slice(var, ti)


def _partition_from_netcdf(path: str, ti: int, shared: dict | None = None):
    """One time step as numpy columns, read from a classic netCDF file —
    slice reads only (never the whole variable). The lat/lon/depth
    coordinate vectors are header-adjacent 1-D reads (KBs); the two
    physics hypercube vars are one record-range read each, CF-unpacked
    transparently when the file stores packed int16 (see
    :func:`_physics_slice`).

    ``shared`` (r16, guide §2.3/§4.5): the reader pre-fetches the
    per-dataset constants ONCE driver-side — the coordinate vectors,
    the time axis, and (for ``dap+http://`` backends) the parsed
    DDS/DAS client itself — and ships them in the pickled reader, so
    each task makes exactly the two physics-slice requests instead of
    seven round trips. With n_time concurrent tasks against one
    in-process DAP server this was the query's wall clock: every task
    queued on the server for metadata it already had."""
    import numpy as np

    from modeltracking_spark.sources.dap import open_nc_or_dap

    if shared is not None:
        nc = shared["ds"] if shared["ds"] is not None else open_nc_or_dap(path)
        t_hours = int(shared["time"][ti])
        depth_m = shared["depth"]
        lat_v = shared["lat"]
        lon_v = shared["lon"]
        temp = _physics_slice(nc, "water_temp", ti)  # (depth, lat, lon)
        sal = _physics_slice(nc, "salinity", ti)
        return _grid_cols(t_hours, depth_m, lat_v, lon_v, temp, sal)
    nc = open_nc_or_dap(path)
    t_hours = int(nc.read_slice("time", ti))
    depth_m = nc.read("depth")
    lat_v = nc.read("lat")
    lon_v = nc.read("lon")
    temp = _physics_slice(nc, "water_temp", ti)  # (depth, lat, lon)
    sal = _physics_slice(nc, "salinity", ti)
    return _grid_cols(t_hours, depth_m, lat_v, lon_v, temp, sal)


def _grid_cols(t_hours, depth_m, lat_v, lon_v, temp, sal):
    """Expand one (depth, lat, lon) time-step slice to long-form numpy
    columns — shared by the file/DAP and prefetched-reader paths."""
    import numpy as np

    nd, nla, nlo = temp.shape
    d, la, lo = np.meshgrid(
        np.arange(nd, dtype=np.int64),
        np.arange(nla, dtype=np.int64),
        np.arange(nlo, dtype=np.int64),
        indexing="ij",
    )
    d, la, lo = d.ravel(), la.ravel(), lo.ravel()
    return {
        "time_hours": np.full(d.shape, t_hours, dtype=np.int64),
        "depth_idx": d.astype(np.int32),
        "depth_m": depth_m[d],
        "lat_idx": la.astype(np.int32),
        "lon_idx": lo.astype(np.int32),
        "lat": lat_v[la],
        "lon": lon_v[lo],
        "water_temp": temp.ravel(),
        "salinity": sal.ravel(),
    }


def write_grid_netcdf(path: str, n_time: int = GRID_N_TIME) -> None:
    """Materialize the formula grid as a REAL classic netCDF file
    (time = unlimited record dim; per-record streaming write, so the
    full hypercube never exists in memory). Reading it back through the
    ``path`` backend reproduces the fixture byte-for-byte — which is how
    the netCDF pipeline gets an exact DuckDB oracle."""
    import numpy as np

    from modeltracking_spark.sources.netcdf_classic import write_classic

    # _partition_arrays materializes BOTH physics variables per call;
    # memoize the last record so the two record-var callbacks for the
    # same r share one formula evaluation instead of recomputing it
    last: dict = {}

    def rec(var):
        def f(r):
            if last.get("r") != r:
                last["r"], last["cols"] = r, _partition_arrays(r)
            return last["cols"][var].reshape(
                GRID_N_DEPTH, GRID_N_LAT, GRID_N_LON
            )

        return f

    write_classic(
        path,
        dims=[
            ("time", 0),
            ("depth", GRID_N_DEPTH),
            ("lat", GRID_N_LAT),
            ("lon", GRID_N_LON),
        ],
        variables=[
            (
                "time",
                ("time",),
                lambda r: np.array(r * GRID_TIME_STEP, dtype=np.int32),
            ),
            (
                "depth",
                ("depth",),
                np.arange(GRID_N_DEPTH, dtype=np.float64) * GRID_DEPTH_STEP,
            ),
            (
                "lat",
                ("lat",),
                GRID_LAT0 + np.arange(GRID_N_LAT, dtype=np.float64) * GRID_LAT_STEP,
            ),
            (
                "lon",
                ("lon",),
                GRID_LON0 + np.arange(GRID_N_LON, dtype=np.float64) * GRID_LON_STEP,
            ),
            ("water_temp", ("time", "depth", "lat", "lon"), rec("water_temp")),
            ("salinity", ("time", "depth", "lat", "lon"), rec("salinity")),
        ],
        record_dim="time",
        n_records=n_time,
    )


def write_grid_netcdf_packed(path: str, n_time: int = GRID_N_TIME) -> None:
    """The PACKED twin of :func:`write_grid_netcdf` — physics variables
    stored as int16 with CF ``scale_factor``/``add_offset``/
    ``missing_value`` attributes, which is how real HYCOM THREDDS serves
    its hypercubes (¼ the bytes of float64). The fixture formulas are
    exact multiples of 0.1, so packing is LOSSLESS here: unpacking
    ``p * 0.1 (+ 30.0)`` reproduces the float64 fixture bit-for-bit
    (IEEE multiply/add of the same operands), and the packed file scans
    to the SAME oracle-checked rows as the unpacked one."""
    import numpy as np

    from modeltracking_spark.sources.netcdf_classic import write_classic

    last: dict = {}

    def packed(var, offset):
        def f(r):
            if last.get("r") != r:
                last["r"], last["cols"] = r, _partition_arrays(r)
            v = last["cols"][var].reshape(GRID_N_DEPTH, GRID_N_LAT, GRID_N_LON)
            out = np.where(
                v <= -4.0,
                np.int16(-30000),
                np.round((v - offset) * 10.0).astype(np.int16),
            )
            return out.astype(np.int16)

        return f

    write_classic(
        path,
        dims=[
            ("time", 0),
            ("depth", GRID_N_DEPTH),
            ("lat", GRID_N_LAT),
            ("lon", GRID_N_LON),
        ],
        variables=[
            ("time", ("time",),
             lambda r: np.array(r * GRID_TIME_STEP, dtype=np.int32)),
            ("depth", ("depth",),
             np.arange(GRID_N_DEPTH, dtype=np.float64) * GRID_DEPTH_STEP),
            ("lat", ("lat",),
             GRID_LAT0 + np.arange(GRID_N_LAT, dtype=np.float64) * GRID_LAT_STEP),
            ("lon", ("lon",),
             GRID_LON0 + np.arange(GRID_N_LON, dtype=np.float64) * GRID_LON_STEP),
            ("water_temp", ("time", "depth", "lat", "lon"),
             packed("water_temp", 0.0),
             {"scale_factor": 0.1, "add_offset": 0.0,
              "missing_value": [-30000], "units": "degC"}),
            ("salinity", ("time", "depth", "lat", "lon"),
             packed("salinity", 30.0),
             {"scale_factor": 0.1, "add_offset": 30.0,
              "missing_value": [-30000], "units": "psu"}),
        ],
        record_dim="time",
        n_records=n_time,
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
        self.path = options.get("path")  # netCDF or dap+http backend
        if self.path:
            from modeltracking_spark.sources.dap import (
                DapDataset,
                open_nc_or_dap,
            )

            nc = open_nc_or_dap(self.path)
            default_n = nc.dim_size("time")
            # the coordinate var is KBs; reading it driver-side lets
            # pushed filters prune against the FILE's time axis, not a
            # formula assumption
            self._time_values = [int(v) for v in nc.read("time")]
            # prefetch the per-dataset constants once (r16): coordinate
            # vectors ride the pickled reader into every task, and for
            # a DAP backend the parsed client ships too with its DAS
            # cache warmed — each task then makes exactly the two
            # physics-slice requests (see _partition_from_netcdf)
            self._shared = {
                "time": self._time_values,
                "depth": nc.read("depth"),
                "lat": nc.read("lat"),
                "lon": nc.read("lon"),
                "ds": None,
            }
            if isinstance(nc, DapDataset):
                nc.var_attrs("water_temp")  # warm the .das cache
                self._shared["ds"] = nc
        else:
            default_n = GRID_N_TIME
            self._time_values = None
            self._shared = None
        self.n_time = int(options.get("n_time", default_n))
        self._time_filters: list = []

    def _time_hours_of(self, t: int) -> int:
        if self._time_values is not None:
            return self._time_values[t]
        return t * GRID_TIME_STEP

    def partitions(self):
        # one partition per time step: the remote-fetch unit AND the
        # parallelism unit — 1000 executors each pull disjoint slices;
        # pushed time filters prune steps before any task launches
        keep = [
            t
            for t in range(self.n_time)
            if all(
                _time_filter_match(f, self._time_hours_of(t))
                for f in self._time_filters
            )
        ]
        return [InputPartition(t) for t in keep]

    def read(self, partition):
        import pyarrow as pa

        cols = (
            _partition_from_netcdf(self.path, partition.value, self._shared)
            if self.path
            else _partition_arrays(partition.value)
        )
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
