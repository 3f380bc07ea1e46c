"""Typed readers for each supported source format.

The fixture-table catalog (catalog.py) and the query plans delegate
here; tests exercise each reader through its §2.1 scan query.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EVENTS_RAW, SCHEMAS, TABLE_NAMES


@functools.lru_cache(maxsize=None)
def events_ts_is_nanos(sf_dir: str) -> bool:
    """True if `events.ts` is physically TIMESTAMP(NANOS) in this
    fixture generation.

    The driver has shipped both encodings across rounds (ns in rounds
    1-2, µs in round 3), so the unit is detected from the parquet
    footer — a driver-side metadata read, not a data scan — instead of
    being hard-coded. Nanos need the legacy raw-int64 read + explicit
    ns→µs floor; micros are Spark's native unit and read directly.
    """
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        # Spark-written table: a directory of part files, one footer is
        # authoritative for all of them (single writer, one schema).
        parts = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))
        if not parts:
            return False
        path = os.path.join(path, parts[0])
    t = pq.read_schema(path).field("ts").type
    if getattr(t, "unit", None) != "ns":
        return False
    # INT96 (Spark's default timestamp encoding) also surfaces as ns in
    # pyarrow; only physical INT64 TIMESTAMP(NANOS) needs the legacy
    # raw-int64 read — INT96 reads natively.
    sch = pq.ParquetFile(path).schema
    idx = {sch.column(i).name: i for i in range(len(sch.names))}["ts"]
    return sch.column(idx).physical_type == "INT64"


def parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Typed parquet scan of one fixture table (§2.1 scan_parquet).

    When `events.ts` is parquet TIMESTAMP(NANOS) — which Spark's
    vectorized reader rejects — `spark.sql.legacy.parquet.nanosAsLong`
    reads the int64 raw and it is floored to µs here, the same
    truncation DuckDB applies casting ns → TIMESTAMP, so oracle
    comparisons agree. TIMESTAMP(MICROS) fixtures read natively.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events" and events_ts_is_nanos(sf_dir):
        raw = spark.read.schema(EVENTS_RAW).parquet(f"{sf_dir}/events.parquet")
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    # Hive-partitioned layouts (testdata_derived/sf1p: the fact tables
    # are month-partitioned directories, the realistic 100 TB landing
    # shape) surface the partition column even when the explicit schema
    # omits it — Spark appends discovered partition columns. Project
    # back to the declared schema so every plan sees one table shape
    # regardless of layout; queries that exploit the partition column
    # (join_dpp_partitioned) read the directory directly instead.
    declared = [f.name for f in SCHEMAS[name].fields]
    if df.columns != declared:
        df = df.select(*declared)
    return df


def csv_with_schema(spark: SparkSession, path: str, schema: T.StructType,
                    header: bool = True,
                    timestamp_format: str = "yyyy-MM-dd HH:mm:ss") -> DataFrame:
    """Delimited read with explicit schema (§2.1 scan_csv). No
    inferSchema — see package docstring."""
    return (spark.read.schema(schema)
                 .option("header", str(header).lower())
                 .option("timestampFormat", timestamp_format)
                 .csv(path))


def json_string_column(df: DataFrame, col: str | Column,
                       schema: str | T.StructType) -> Column:
    """Parse a JSON-in-string column against a declared schema (§2.1
    scan_json); returns the struct column."""
    return F.from_json(col, schema)


def binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """Opaque binary ingestion (§2.1 scan_binary): (path,
    modificationTime, length, content) with content as BinaryType —
    the multimodal-column base (operators/multimodal.py decodes)."""
    return spark.read.format("binaryFile").load(path)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as a file-source stream (§2.1 source_stream_events);
    same ts-unit handling as the batch reader so batch ≡ stream."""
    if events_ts_is_nanos(sf_dir):
        raw = (spark.readStream.schema(EVENTS_RAW)
                    .option("pathGlobFilter", "events.parquet")
                    .parquet(sf_dir))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (spark.readStream.schema(SCHEMAS["events"])
                 .option("pathGlobFilter", "events.parquet")
                 .parquet(sf_dir))
