"""Flagship pipeline query (SURVEY.md §7 minimum slice).

Per (event_type, day): event count, exact total value, mean, stddev,
and the RMSSD-style mean absolute successive difference of ``value``
over each user's time-ordered series — the engine's core shape:
  parquet scan → projection → per-key ordered window diff →
  groupBy aggregate → order.

This is the Spark-native form of the reference pipeline's inner loop
(ordered-series diff then windowed statistics — the `hrvanalysis`
time-domain pattern, SURVEY.md §2.9 [PK:high]), applied to the
driver's ``events`` stand-in series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (dmean, dmean_sql, dstd_samp, dstd_samp_sql,
                               dsum, dsum_sql, r6, r6_sql)
from .registry import query

_ORACLE = f"""
WITH d AS (
  SELECT event_type,
         CAST(ts AS DATE) AS day,
         value,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
  FROM events
)
SELECT event_type, day,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS total_value,
       {r6_sql(dmean_sql('value'))} AS avg_value,
       {r6_sql(dstd_samp_sql('value'))} AS std_value,
       {r6_sql(dmean_sql('ABS(dv)'))} AS mean_abs_diff
FROM d
GROUP BY event_type, day
ORDER BY event_type, day
"""


@query("flagship_event_features", oracle=_ORACLE)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Ordered-series primitive: per-user successive difference.
    # ts is µs-unique in the fixtures (measured), so the order is total.
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
    )
    return (
        d.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
            r6(dmean("value")).alias("avg_value"),
            r6(dstd_samp("value")).alias("std_value"),
            r6(dmean(F.abs("dv"))).alias("mean_abs_diff"),
        )
        .orderBy("event_type", "day")
    )
