"""Structured-Streaming *source* for engine-native Iceberg tables,
built on the PySpark 4 Python DataSource API
(``pyspark.sql.datasource`` — the idiomatic route for a pure-Python
source: offsets and planning on the driver, partition reads
Arrow-batched on executors).

    spark.dataSource.register(IcebergStreamSource)
    df = (spark.readStream.format("nil_iceberg")
          .option("path", table_dir).load())

Semantics (Iceberg's incremental append scan):
 * the stream offset is the table's ``last-sequence-number``; each
   micro-batch reads exactly the data files committed in
   ``(start_seq, end_seq]`` — planned from manifests, never by listing;
 * one :class:`InputPartition` per data file → parallelism follows the
   file count; ``read`` yields pyarrow RecordBatches (vectorized, no
   per-row Python);
 * append-only: *replace* (compaction) snapshots are skipped (their
   rows were already emitted), delete snapshots advance the offset
   without emitting (no retractions) — see
   :meth:`IcebergTable.incremental_files`;
 * identity-partition columns are re-attached as constant Arrow
   columns from the manifest's partition values.

Together with ``streaming/iceberg_sink.py`` this closes the loop:
transcripts stream INTO an Iceberg table (one snapshot per batch) and
the incremental index / dedup / quality pipelines stream OUT of it,
with the table as the replayable, time-travelable contract between
them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from .iceberg import IcebergTable


@dataclass
class _FilePartition(InputPartition):
    path: str
    part_values: tuple  # ((col, raw_string_value), ...) from the manifest


def _arrow_schema(schema: T.StructType):
    """Target Arrow schema for the batches handed back to Spark."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, schema: T.StructType):
        self._path = table_path
        self._schema = schema

    # ------------------------------------------------------------ offsets
    def initialOffset(self) -> dict:
        return {"seq": 0}  # start of table history: emit existing rows first

    def latestOffset(self) -> dict:
        try:
            md = IcebergTable(self._path).metadata()
        except FileNotFoundError:
            return {"seq": 0}  # table not created yet — empty batches
        return {"seq": md["last-sequence-number"]}

    # ---------------------------------------------------------- planning
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if end["seq"] <= start["seq"]:
            return [_FilePartition("", ())]
        files = IcebergTable(self._path).incremental_files(start["seq"], end["seq"])
        if not files:
            # offset advanced with no data files (delete-only snapshot)
            return [_FilePartition("", ())]
        return [
            _FilePartition(p, tuple(sorted(pv.items()))) for p, _seq, pv in files
        ]

    # ------------------------------------------------------------- read
    def read(self, partition: InputPartition) -> Iterator:
        if not partition.path:  # sentinel empty partition
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = _arrow_schema(self._schema)
        tbl = pq.read_table(partition.path)
        pv = dict(partition.part_values)
        cols = []
        for field in target:
            if field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                raw = pv.get(field.name)
                if raw is not None:
                    if pa.types.is_integer(field.type):
                        raw = int(raw)
                    elif pa.types.is_floating(field.type):
                        raw = float(raw)
                    elif pa.types.is_boolean(field.type):
                        raw = raw == "true"
                cols.append(
                    pa.array([raw] * len(tbl)).cast(field.type)
                    if len(tbl)
                    else pa.array([], type=field.type)
                )
        out = pa.Table.from_arrays(cols, schema=target)
        yield from out.to_batches(max_chunksize=65536)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class IcebergStreamSource(DataSource):
    """``format("nil_iceberg")`` — streaming reads of an engine-native
    Iceberg table.  Options: ``path`` (table directory, required)."""

    @classmethod
    def name(cls) -> str:
        return "nil_iceberg"

    def schema(self):
        return IcebergTable(self.options["path"]).schema()

    def streamReader(self, schema: T.StructType) -> IcebergStreamReader:
        return IcebergStreamReader(self.options["path"], schema)
