"""Fixture-table catalog: typed readers + temp-view registration.

Reads always pass the declared schema (schemas.py) so the scan is a
straight columnar decode with no footer-driven inference surprises, and
column pruning / predicate pushdown operate against a stable schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import EVENTS_RAW, SCHEMAS, TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Typed parquet scan of one fixture table (SURVEY.md §2.1 scan_parquet)."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # ts on disk is TIMESTAMP(NANOS) → read as int64, floor to µs
        # (same truncation DuckDB applies casting ns → TIMESTAMP).
        raw = spark.read.schema(EVENTS_RAW).parquet(f"{sf_dir}/events.parquet")
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


class Tables:
    """Lazy dict-like access to all fixture tables for one sf_dir.

    ``t.lineitem`` / ``t["lineitem"]`` return the (cached-plan) DataFrame.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._dfs: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._dfs:
            self._dfs[name] = load_table(self.spark, self.sf_dir, name)
        return self._dfs[name]

    def register_views(self) -> None:
        """Register every table as a temp view for the SQL entry point."""
        for name in TABLE_NAMES:
            self[name].createOrReplaceTempView(name)
