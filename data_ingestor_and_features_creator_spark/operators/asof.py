"""As-of (nearest-preceding-event) join, SURVEY.md §2.3 ``join_asof``.

Spark has no native ASOF JOIN; the scalable DataFrame expression is the
union + ordered-window trick:

1. tag left rows (probe) and right rows (reference), union them on a
   common frame ``(keys..., __ts, __src, payload...)``;
2. one window per key ordered by ``(__ts, __src)`` — reference rows
   sort *before* probe rows on timestamp ties so an equal-timestamp
   reference matches (>= semantics, same as DuckDB ``ASOF JOIN ... ON
   l.ts >= r.ts``);
3. ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame carries the most recent reference payload forward;
4. keep probe rows only.

Cost model at 100 TB: one hash shuffle of (left ∪ right) on the key
plus a per-partition sort — the same cost class as a sort-merge join,
with no row explosion. A hot key concentrates one partition (window
functions bypass AQE skew splitting); pre-split hot keys by salting the
key AND replicating the reference side per salt if that bites.

Alternative considered and rejected: ``applyInPandas`` +
``pd.merge_asof`` per key — simpler but serializes every row through
Arrow/Python; built-in window functions stay in Tungsten codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (NULLs when no such row). Left columns pass through unchanged.
    """
    # left_ts travels as __ts (renamed back at the end), so exclude it here
    left_other = [c for c in left.columns if c not in on and c != left_ts]
    out_payloads = [p + suffix for p in payload_cols]

    lpart = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *[F.col(c) for c in left_other],
        *[F.lit(None).cast(right.schema[p].dataType).alias(o)
          for p, o in zip(payload_cols, out_payloads)],
    )
    rpart = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_other],
        *[F.col(p).alias(o) for p, o in zip(payload_cols, out_payloads)],
    )
    unioned = lpart.unionByName(rpart)
    w = (
        W.partitionBy(*on)
        .orderBy("__ts", "__src")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *on, "__ts", "__src", *left_other,
        *[F.last(o, ignorenulls=True).over(w).alias(o) for o in out_payloads],
    )
    return filled.filter(F.col("__src") == 1).drop("__src").withColumnRenamed(
        "__ts", left_ts
    )
