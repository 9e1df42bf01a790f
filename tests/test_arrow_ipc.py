"""From-spec Arrow IPC reader (round 12): every fixture is written
by PYARROW ITSELF (the reference implementation) — streams and files,
multi-batch splits, all supported primitive widths, utf8/binary,
one-level lists, null profiles, and LZ4_FRAME / ZSTD body
compression (decoded via the repo's own lz4/zstd); plus typed
rejects and mutation fuzz over the flatbuffers walker."""

import io
import random

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from modeltracking_spark.operators.arrow_ipc import (
    ipc_read,
    parse_schema,
)


def _table(n=40, nullp=0.2, seed=5):
    rng = random.Random(seed)

    def mn(v):
        return None if rng.random() < nullp else v

    return pa.table({
        "i64": pa.array([mn(rng.randrange(-2**62, 2**62))
                         for _ in range(n)], pa.int64()),
        "i32": pa.array([mn(rng.randrange(-2**31, 2**31 - 1))
                         for _ in range(n)], pa.int32()),
        "i16": pa.array([mn(rng.randrange(-2**15, 2**15 - 1))
                         for _ in range(n)], pa.int16()),
        "i8": pa.array([mn(rng.randrange(-128, 128))
                        for _ in range(n)], pa.int8()),
        "u8": pa.array([mn(rng.randrange(256)) for _ in range(n)],
                       pa.uint8()),
        "u32": pa.array([mn(rng.randrange(2**32 - 1))
                         for _ in range(n)], pa.uint32()),
        "f64": pa.array([mn(rng.random() * 1e9) for _ in range(n)],
                        pa.float64()),
        "f32": pa.array([mn(rng.random()) for _ in range(n)],
                        pa.float32()),
        "b": pa.array([mn(rng.random() < 0.5) for _ in range(n)],
                      pa.bool_()),
        "s": pa.array([mn("väl-%d" % rng.randrange(50)
                          * rng.randrange(0, 3))
                       for _ in range(n)], pa.string()),
        "bin": pa.array([mn(bytes([rng.randrange(256)])
                            * rng.randrange(0, 6))
                         for _ in range(n)], pa.binary()),
        "ls": pa.array([mn([mn(rng.random()) for _ in
                            range(rng.randrange(0, 5))])
                        for _ in range(n)], pa.list_(pa.float64())),
        "li": pa.array([mn([mn(rng.randrange(1000)) for _ in
                            range(rng.randrange(0, 4))])
                        for _ in range(n)], pa.list_(pa.int64())),
    })


def _check(t, blob):
    got = ipc_read(blob)
    for name in t.column_names:
        assert got["columns"][name] == t.column(name).to_pylist(), \
            name
    return got


@pytest.mark.parametrize("comp", [None, "lz4", "zstd"])
def test_stream_and_file_vs_pyarrow(comp):
    t = _table()
    opts = ipc.IpcWriteOptions(compression=comp)
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema, options=opts) as w:
        w.write_table(t, max_chunksize=7)  # multi-batch
    got = _check(t, buf.getvalue())
    assert got["n_batches"] > 1
    buf2 = io.BytesIO()
    with ipc.new_file(buf2, t.schema, options=opts) as w:
        w.write_table(t, max_chunksize=11)
    _check(t, buf2.getvalue())


def test_all_null_and_no_null_extremes():
    for nullp in (0.0, 1.0):
        t = _table(25, nullp=nullp, seed=9)
        buf = io.BytesIO()
        with ipc.new_stream(buf, t.schema) as w:
            w.write_table(t)
        _check(t, buf.getvalue())


def test_typed_rejects():
    # dictionary-encoded columns are a documented reject
    t = pa.table({"d": pa.array(["a", "b", "a"]).dictionary_encode()})
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    with pytest.raises(NotImplementedError, match="dictionary"):
        ipc_read(buf.getvalue())
    # nested list-of-list is a documented reject
    t2 = pa.table({"ll": pa.array([[[1.0]]],
                                  pa.list_(pa.list_(pa.float64())))})
    buf2 = io.BytesIO()
    with ipc.new_stream(buf2, t2.schema) as w:
        w.write_table(t2)
    with pytest.raises(NotImplementedError, match="nested"):
        ipc_read(buf2.getvalue())
    # struct columns reject at the schema walk
    t3 = pa.table({"st": pa.array([{"a": 1}],
                                  pa.struct([("a", pa.int64())]))})
    buf3 = io.BytesIO()
    with ipc.new_stream(buf3, t3.schema) as w:
        w.write_table(t3)
    with pytest.raises(NotImplementedError):
        ipc_read(buf3.getvalue())
    with pytest.raises(ValueError, match="schema"):
        ipc_read(b"\xff\xff\xff\xff\x00\x00\x00\x00")


def test_date_and_timestamp_columns():
    import datetime as dt

    t = pa.table({
        "d": pa.array([dt.date(2022, 1, 8), None,
                       dt.date(1969, 12, 31)], pa.date32()),
        "ts": pa.array([dt.datetime(2001, 2, 3, 4, 5, 6, 789012),
                        None, dt.datetime(1970, 1, 1)],
                       pa.timestamp("us")),
    })
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    got = ipc_read(buf.getvalue())
    # surfaced at their physical grain: epoch days / epoch micros
    assert got["columns"]["d"] == [19000, None, -1]
    assert got["columns"]["ts"] == [981173106789012, None, 0]


def test_mutation_fuzz_typed_rejects():
    """The flatbuffers walker and buffer assembly under byte
    mutation: decode or the typed reject — never a leaked internal
    error (the _FB accessors bounds-check every read)."""
    t = _table(30, seed=11)
    buf = io.BytesIO()
    opts = ipc.IpcWriteOptions(compression="zstd")
    with ipc.new_stream(buf, t.schema, options=opts) as w:
        w.write_table(t, max_chunksize=9)
    base = buf.getvalue()
    rng = random.Random(715)
    for _ in range(400):
        b = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = (b[:i] + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 12)))
                 + b[i:])
        try:
            ipc_read(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_schema_field_specs():
    t = pa.table({"x": pa.array([1], pa.int16()),
                  "y": pa.array([[0.5]], pa.list_(pa.float32()))})
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    metas = []
    from modeltracking_spark.operators.arrow_ipc import ipc_messages

    for meta, _body in ipc_messages(buf.getvalue()):
        metas.append(meta)
    fields = parse_schema(metas[0])
    assert fields[0]["type"] == "Int" and fields[0]["bits"] == 16 \
        and fields[0]["signed"]
    assert fields[1]["type"] == "List"
    assert fields[1]["children"][0]["type"] == "FloatingPoint"
