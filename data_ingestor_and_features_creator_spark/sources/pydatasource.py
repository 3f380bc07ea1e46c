"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API,
SURVEY.md §2.1): the engine's extension point for sources Spark has no
built-in reader for (instrument feeds, bespoke binary formats).

The demo source emits a deterministic integer grid so it is fully
SQL-oracle-checkable. Scale notes baked into the implementation:

- ``partitions()`` declares N independent splits → Spark schedules one
  task per split, exactly like parquet row-groups; a real feed would
  map splits to files/shards/offset ranges.
- ``read()`` yields ONE pyarrow RecordBatch per split (the vectorized
  fast path) rather than per-row tuples — per-row Python yield is the
  row-at-a-time slow path this engine bans everywhere else.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Span(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _GridReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.nparts = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, self.rows // self.nparts)
        return [_Span(s, min(s + step, self.rows))
                for s in range(0, self.rows, step)]

    def read(self, part: _Span):
        import pyarrow as pa

        i = list(range(part.start, part.end))
        yield pa.record_batch(
            {"i": pa.array(i, pa.int64()),
             "v": pa.array([(x * x) % 97 for x in i], pa.int64())})


class SynthGridDataSource(DataSource):
    """``spark.read.format("synthgrid").option("rows", n).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthgrid"

    def schema(self) -> str:
        return "i bigint, v bigint"

    def reader(self, schema) -> DataSourceReader:
        return _GridReader(self.options)
