"""Spark Python DataSource for Avro OCF shards —
``spark.read.format("avro_ocf").option("path", dir_or_file)``.

Spark's own Avro support lives in an external jar absent from this
environment, so this source IS the engine's Avro surface: the
from-spec OCF reader (``operators/avro_ocf.py``) behind the same
shard-per-InputPartition layout as the WARC source.  The Spark schema
is fixed by the caller via ``.option("ddl", ...)`` matching the files'
flat record schema (the Python DataSource API requires a static
schema; a mismatch fails loudly at decode time)."""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


def _shard_files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    return [path]


class AvroOcfReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError("avro_ocf source requires .option('path', ...)")
        self.files = _shard_files(path)
        self.field_names = [f.name for f in schema.fields]

    def partitions(self):
        return [InputPartition(f) for f in self.files]

    def read(self, partition):
        import pyarrow as pa

        from modeltracking_spark.operators.avro_ocf import avro_ocf_read

        with open(partition.value, "rb") as fh:
            _schema, records = avro_ocf_read(fh.read())
        cols = {
            name: [r.get(name) for r in records]
            for name in self.field_names
        }
        yield pa.RecordBatch.from_pydict(cols)


class AvroOcfDataSource(DataSource):
    """``spark.read.format("avro_ocf")`` after
    ``spark.dataSource.register(AvroOcfDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_ocf"

    def schema(self) -> str:
        return self.options.get(
            "ddl", "doc_id bigint, lang string, n_chars bigint, text string"
        )

    def reader(self, schema):
        return AvroOcfReader(self.options, schema)
