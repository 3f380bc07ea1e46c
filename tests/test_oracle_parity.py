"""Replicates the driver's DuckDB-oracle gate locally for every
SQL-checkable query in the registry (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from data_ingestor_and_features_creator_spark import plans

from .oracle_compare import assert_same_result

plans.load_all()
_ORACLES = plans.oracles()
_QUERIES = plans.queries()
SQL_IDS = sorted(_ORACLES)
ROWS_ONLY_IDS = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", SQL_IDS)
def test_sql_oracle_parity(name, spark, duck, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    cur = duck.execute(_ORACLES[name])
    duck_cols = [c[0] for c in cur.description]
    duck_rows = cur.fetchall()
    assert_same_result(name, df.columns, spark_rows, duck_cols, duck_rows)


@pytest.mark.parametrize("name", ROWS_ONLY_IDS)
def test_rows_only_runs(name, spark, sf_dir):
    """Rows-only ops must at least execute and return a stable schema."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
