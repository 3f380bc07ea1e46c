"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``data_ingestor_and_features_creator_spark.plans`` — the
operator registry. Each registered query id corresponds to a SURVEY.md
§2 inventory row; oracle SQL twins live next to the Spark code in the
same module (plans/q_*.py) so they evolve together.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestor_and_features_creator_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.queries()["flagship_event_features"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys ⊆ queries() keys (rows-only ops omitted)."""
    return plans.oracles()
