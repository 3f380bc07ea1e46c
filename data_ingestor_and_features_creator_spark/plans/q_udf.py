"""UDF / UDAF / UDTF surface (SURVEY.md §2.12): the engine's extension
points for user code, each demonstrated over the fixtures.

UDF policy (SURVEY.md §4): Python in the hot path only via
Arrow-vectorized pandas UDFs; the scalar example is deliberately one
where pandas and SQL produce bit-identical doubles (elementwise IEEE
division), so it gets a full SQL oracle. Per-group kernels whose float
*reductions* are order-sensitive (pandas pairwise summation vs SQL
streaming sums) are rows-only and pinned by numpy unit tests instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from .registry import query


# NOTE: pandas_udf() is applied inside each query function, not at
# module top level — the decorator resolves against the active session,
# and executors re-import this module while unpickling kernels.

def _ms_to_hr_fn(ms: pd.Series) -> pd.Series:
    """Vectorized unit conversion: interval (ms) → rate (1/min)."""
    return 60000.0 / ms


@query("udf_scalar_pandas", oracle="""
SELECT event_id, value, ROUND(60000.0 / value, 6) AS hr
FROM events
""")
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF. Elementwise double division is
    IEEE-identical to the SQL expression, so this one UDF query is
    fully oracle-checkable."""
    ms_to_hr = pandas_udf(_ms_to_hr_fn, "double")
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "value",
                     F.round(ms_to_hr("value"), 6).alias("hr"))


ZSCORE_SCHEMA = "event_id long, user_id long, value double, z double"


def _dec12_sum(vals) -> float:
    """See functions.exact.dec12_sum_py — the Python replica of the
    dsum decimal-exact summation contract."""
    from ..functions.exact import dec12_sum_py
    return dec12_sum_py(vals)


def _zscore_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group standardization — the grouped-map pattern the HRV
    kernels use, in its minimal form. Moments via decimal-exact sums
    (the dsum contract) so the per-row z is bit-identical to the SQL
    oracle's construction; the per-row arithmetic after the sums is
    IEEE, deterministic on both sides."""
    import math

    v = pdf["value"].to_numpy(dtype=np.float64)
    n = len(v)
    sx = _dec12_sum(v)
    sxx = _dec12_sum(v * v)
    m = sx / n
    var = (sxx - sx * sx / n) / (n - 1) if n > 1 else 0.0
    sd = math.sqrt(var) if var > 0 else 0.0
    z = (v - m) / sd if sd > 0 else np.zeros_like(v)
    return pd.DataFrame({"event_id": pdf["event_id"],
                         "user_id": pdf["user_id"],
                         "value": pdf["value"], "z": z})


@query("udf_grouped_map", oracle="""
WITH f AS (SELECT event_id, user_id, value FROM events
           WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
               AS sxx
      FROM f GROUP BY user_id),
st AS (SELECT user_id, sx / n AS m,
              CASE WHEN n > 1 AND (sxx - sx * sx / n) / (n - 1) > 0
                   THEN SQRT((sxx - sx * sx / n) / (n - 1)) END AS sd
       FROM s)
SELECT f.event_id, f.user_id, f.value,
       CASE WHEN sd IS NOT NULL AND sd > 0
            THEN (value - m) / sd ELSE 0.0 END AS z
FROM f JOIN st USING (user_id)
""")
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score of value within each user.
    Pre-select trims the Arrow payload to the 3 needed columns.
    Round-4 oracle upgrade (was rows-only "numpy reduction order ≠
    SQL's"): the kernel now builds its moments through the SAME
    decimal-exact sums as the SQL oracle (_dec12_sum replicates
    CAST-to-DECIMAL(38,12) summation in Python), so the z values are
    bit-identical and emitted UNROUNDED."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")).select(
        "event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        _zscore_kernel, schema=ZSCORE_SCHEMA)


def _trimmed_mean_fn(v: pd.Series) -> float:
    """10%-trimmed mean — a custom aggregate no builtin covers. The
    trimmed multiset is tie-invariant (dropping the k smallest/largest
    VALUES gives the same bag whatever order ties sort in), and the
    mean runs through the decimal-exact sum so the result matches the
    SQL oracle's construction bit-for-bit."""
    x = np.sort(v.to_numpy(dtype=np.float64))
    x = x[~np.isnan(x)]
    k = int(len(x) * 0.1)
    x = x[k:len(x) - k] if len(x) > 2 * k else x
    return _dec12_sum(x) / len(x)


@query("udaf_grouped_agg", oracle="""
WITH f AS (SELECT event_type, value FROM events
           WHERE value IS NOT NULL AND NOT isnan(value)),
r AS (SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n
      FROM f),
t AS (SELECT event_type, value FROM r
      WHERE n <= 2 * CAST(FLOOR(n * 0.1) AS BIGINT)
         OR (rn > CAST(FLOOR(n * 0.1) AS BIGINT)
             AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT)))
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
         AS trimmed_mean
FROM t GROUP BY event_type
""")
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (true custom UDAF): 10%-trimmed mean of
    value per event_type. Spark disallows mixing pandas and builtin
    aggregates in one agg, so the UDAF stands alone. Round-4 oracle
    upgrade (was rows-only "trimmed-mean reduction order"): the SQL
    twin reproduces the trim as a rank-window slice — valid because
    the trimmed BAG is tie-invariant — and both sides run the mean
    through decimal-exact sums, emitted unrounded."""
    trimmed_mean = pandas_udf(_trimmed_mean_fn, "double")
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    return (ev.groupBy("event_type")
              .agg(trimmed_mean("value").alias("trimmed_mean"))
              .orderBy("event_type"))


@query("udtf_expand", oracle="""
SELECT o_orderkey, g AS installment,
       CAST(date_trunc('month', o_orderdate) + to_months(CAST(g AS INT)) AS DATE) AS due_month
FROM orders, unnest(generate_series(0, 2)) AS t(g)
WHERE o_orderkey < 100
""")
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating expansion: 3 installment rows per order via
    explode(sequence(...)) — the codegen-friendly UDTF form (a
    row-at-a-time @udtf class covers the same surface ~100× slower;
    see tests/test_udf_surface.py for the API demonstration)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey", "o_orderdate",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("installment"),
    ).select(
        "o_orderkey", "installment",
        F.add_months(F.date_trunc("month", F.col("o_orderdate")),
                     F.col("installment")).cast("date").alias("due_month"),
    )


def _arrow_minmax_scale(it):
    """Raw-Arrow kernel: min-max scale value per RecordBatch using
    pyarrow.compute only — no pandas materialization at all."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        v = batch.column("value")
        scaled = pc.round(
            pc.divide(pc.subtract(v, pa.scalar(0.0)),
                      pa.scalar(100.0)), 6)
        yield pa.RecordBatch.from_arrays(
            [batch.column("event_id"), scaled],
            names=["event_id", "value_scaled"])


@query("udf_map_in_arrow", oracle="""
SELECT event_id, ROUND(value / 100.0, 6) AS value_scaled
FROM events WHERE value IS NOT NULL AND NOT isnan(value)
""")
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the RAW Arrow RecordBatch API, completing the
    §2.12 Python surface (scalar pandas_udf / applyInPandas /
    grouped-agg / @udtf / mapInPandas are all registered elsewhere):
    the kernel receives pyarrow RecordBatches and answers with
    pyarrow.compute calls only — zero pandas conversion, the lowest-
    overhead Python path Spark offers (what you use when the Python
    step is memory-bound: no per-column Series materialization).
    The fixed /100 scale is deliberately expression-simple so the
    DuckDB twin pins the numeric semantics of the Arrow path
    (divide + round on float64 is IEEE-exact cross-engine)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
              .select("event_id", "value")
              .mapInArrow(_arrow_minmax_scale,
                          "event_id long, value_scaled double"))
