"""Replicates the driver's DuckDB-oracle gate locally for every
SQL-checkable query in the registry (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from data_ingestor_and_features_creator_spark import plans

from .oracle_compare import assert_same_result, duck_fetch

plans.load_all()
_ORACLES = plans.oracles()
_QUERIES = plans.queries()
SQL_IDS = sorted(_ORACLES)
ROWS_ONLY_IDS = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", SQL_IDS)
def test_sql_oracle_parity(name, spark, duck, sf_dir):
    """Both results go through pandas — the driver's canonicalization
    path — so type-representation drift (e.g. DuckDB HUGEINT → float64
    vs Spark int64) fails HERE before the driver sees it."""
    df = _QUERIES[name](spark, sf_dir)
    spark_pdf = df.toPandas()
    spark_rows = list(spark_pdf.itertuples(index=False, name=None))
    duck_pdf = duck_fetch(duck, _ORACLES[name])
    duck_cols = list(duck_pdf.columns)
    duck_rows = list(duck_pdf.itertuples(index=False, name=None))
    assert_same_result(name, list(spark_pdf.columns), spark_rows,
                       duck_cols, duck_rows)


@pytest.mark.parametrize("name", ROWS_ONLY_IDS)
def test_rows_only_runs(name, spark, sf_dir):
    """Rows-only ops must at least execute and return a stable schema."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


def test_hll_sketch_estimate_accuracy_and_mergeability(spark, sf_dir):
    """Merged daily partials must estimate within HLL error of the exact
    per-month distinct count AND agree exactly with a sketch built in
    one pass over the month (merge ≡ rebuild is what makes daily
    precomputation sound)."""
    from pyspark.sql import functions as F
    from data_ingestor_and_features_creator_spark.catalog import load_table
    from data_ingestor_and_features_creator_spark.plans.q_aggregates import (
        agg_hll_sketch_merge)
    merged = {r["month"]: r["approx_custs"]
              for r in agg_hll_sketch_merge(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").alias("month")
    exact = {r["month"]: r["n"] for r in
             o.groupBy(month).agg(F.countDistinct("o_custkey").alias("n"))
              .collect()}
    onepass = {r["month"]: r["n"] for r in
               o.groupBy(month)
                .agg(F.hll_sketch_estimate(
                         F.hll_sketch_agg("o_custkey")).alias("n"))
                .collect()}
    assert merged.keys() == exact.keys()
    for m, est in merged.items():
        assert abs(est - exact[m]) / exact[m] < 0.05, (m, est, exact[m])
        assert est == onepass[m], (m, est, onepass[m])
