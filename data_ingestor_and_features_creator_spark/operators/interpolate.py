"""Linear interpolation of missing values in an ordered series.

Spark-native equivalent of the reference's gap-fill step
(``hrvanalysis.interpolate_nan_values(method="linear")``, SURVEY.md
§2.2 [PK:high]): removed/missing beats are reconstructed by linear
blend between the nearest non-null neighbors on each side.

Implementation is pure window expressions — no UDF, no sort-collect:
four IGNORE NULLS window lookups (value+row-number of nearest non-null
on each side) and one arithmetic blend. At scale this is two window
passes over the same (partition, order) spec, so Catalyst plans a
single sort per partition; no extra shuffle beyond the partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def interpolate_nan_values(
    df: DataFrame,
    value_col: str,
    order_by: list[str | Column],
    partition_by: list[str | Column],
    out_col: str = "interp",
    method: str = "linear",
) -> DataFrame:
    """Add ``out_col``: value_col with nulls filled by ``method`` —
    the reference API's method-selection surface
    (``interpolate_nan_values(method=...)``):

    - ``linear``  — blend between nearest non-null neighbors (default);
    - ``nearest`` — copy the closer neighbor by row distance, previous
      wins ties (pandas 'nearest' convention);
    - ``locf``    — last observation carried forward (pandas 'ffill' /
      'pad'), with leading nulls backfilled from the first observation.

    All methods share the same two IGNORE NULLS window passes; only the
    final combine expression differs, so plan shape and cost are
    method-independent. Boundary policy for linear/nearest (edge hold):
    leading nulls take the first non-null, trailing nulls the last.
    """
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    before = w.rowsBetween(W.unboundedPreceding, 0)
    after = w.rowsBetween(0, W.unboundedFollowing)
    v = F.col(value_col)
    rn = F.row_number().over(w)
    rn_if_val = F.when(v.isNotNull(), rn)

    df = (
        df.withColumn("__rn", rn)
        .withColumn("__prev_v", F.last(v, ignorenulls=True).over(before))
        .withColumn("__next_v", F.first(v, ignorenulls=True).over(after))
        .withColumn("__prev_rn", F.last(rn_if_val, ignorenulls=True).over(before))
        .withColumn("__next_rn", F.first(rn_if_val, ignorenulls=True).over(after))
    )
    prev_v, next_v = F.col("__prev_v"), F.col("__next_v")
    prev_rn, next_rn = F.col("__prev_rn"), F.col("__next_rn")
    if method == "linear":
        frac = (F.col("__rn") - prev_rn) / (next_rn - prev_rn)
        fill = prev_v + (next_v - prev_v) * frac
    elif method == "nearest":
        fill = F.when(
            F.col("__rn") - prev_rn <= next_rn - F.col("__rn"), prev_v
        ).otherwise(next_v)
    elif method == "locf":
        fill = prev_v  # carried forward; head handled by the backfill arm
    else:
        raise ValueError(f"unknown interpolation method {method!r}")
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(fill)
    )
    return df.withColumn(out_col, interp).drop(
        "__rn", "__prev_v", "__next_v", "__prev_rn", "__next_rn"
    )
