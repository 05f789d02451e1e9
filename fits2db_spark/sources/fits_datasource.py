"""FITS as a first-class Spark data source (Python DataSource API, Spark 4).

``spark.dataSource.register(FitsDataSource)`` makes
``spark.read.format("fits").option("hdu", "1").load(path)`` work like any
built-in format — schema inference from a header-only probe, one input
partition per file (the same per-file parallelism contract as the
binaryFile + mapInArrow path in :mod:`fits`), and Arrow RecordBatch
transfer from the Python reader into the JVM.

Why both paths exist: the mapInArrow reader (``sources/fits.py``) is
self-contained DataFrame code that works on any Spark; this DataSource is
the idiomatic Spark-4 integration — the format string composes with the
standard reader API (``.schema(...)``, options, SQL ``CREATE TABLE ...
USING fits``) and the engine owns partition scheduling. Both share every
byte of the decode machinery, so they cannot drift.

Scale: ``schema()`` and ``partitions()`` run driver-side but do
header-only probes (O(headers) seeks, never payload); each ``read()``
task decodes one file and streams Arrow batches. A survey of N files
fans out to N tasks exactly like the binaryFile path; within-file
row-range splitting would extend ``partitions()`` with the
``decode_bintable_range`` offsets (already implemented for the cutout
path).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


def _file_list(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".fits")
        )
    return [path]


def _hdu_opt(options) -> int | str:
    raw = options.get("hdu", "1")
    return int(raw) if str(raw).lstrip("-").isdigit() else str(raw)


class FitsReader(DataSourceReader):
    """One input partition per FITS file; each read() decodes its file with
    the shared BINTABLE machinery and yields Arrow RecordBatches."""

    def __init__(self, options, schema: StructType):
        self._paths = _file_list(options["path"])
        self._hdu = _hdu_opt(options)
        self._schema = schema

    def partitions(self):
        return [InputPartition(p) for p in self._paths]

    def read(self, partition: InputPartition):
        import pyarrow as pa

        from .fits import decode_bintable, to_arrow_columns

        with open(partition.value, "rb") as f:
            data = f.read()
        schema, out = decode_bintable(data, self._hdu)
        arrs = to_arrow_columns(schema, out)
        yield pa.RecordBatch.from_arrays(arrs, [f.name for f in schema.fields])


class FitsDataSource(DataSource):
    """``spark.read.format("fits")`` — BINTABLE HDUs as DataFrames."""

    @classmethod
    def name(cls) -> str:
        return "fits"

    def schema(self) -> StructType:
        from .fits import fits_spark_schema, parse_bintable_header_path

        first = _file_list(self.options["path"])[0]
        _, cols, _ = parse_bintable_header_path(first, _hdu_opt(self.options))
        return fits_spark_schema(cols)

    def reader(self, schema: StructType) -> FitsReader:
        return FitsReader(self.options, schema)
