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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row
    within the same ``on`` key (NULLs when no such row). Left columns
    pass through unchanged.

    ``direction="backward"`` (default): greatest ``right_ts`` <=
    ``left_ts`` — last(ignorenulls) over the preceding frame.
    ``direction="forward"``: smallest ``right_ts`` >= ``left_ts`` —
    first(ignorenulls) over the following frame; the __src sort flag
    flips so an equal-timestamp reference still matches (ties are
    inclusive in both directions, matching DuckDB ASOF >= / <=).
    ``tolerance_us``: max |left_ts − right_ts| in µs (pandas
    merge_asof semantics) — matches farther away than the tolerance
    are masked back to NULL; the matched reference timestamp rides the
    same window fill, so this costs no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    backward = direction == "backward"
    # left_ts travels as __ts (renamed back at the end), so exclude it here
    left_other = [c for c in left.columns if c not in on and c != left_ts]
    out_payloads = [p + suffix for p in payload_cols]
    # reference sorts before probe on timestamp ties for backward
    # (so last() sees it), after probe for forward (so first() does)
    probe_flag, ref_flag = (1, 0) if backward else (0, 1)

    lpart = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(probe_flag).alias("__src"),
        *[F.col(c) for c in left_other],
        *[F.lit(None).cast(right.schema[p].dataType).alias(o)
          for p, o in zip(payload_cols, out_payloads)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__ref_ts"),
    )
    rpart = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(ref_flag).alias("__src"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_other],
        *[F.col(p).alias(o) for p, o in zip(payload_cols, out_payloads)],
        F.col(right_ts).alias("__ref_ts"),
    )
    unioned = lpart.unionByName(rpart)
    w = W.partitionBy(*on).orderBy("__ts", "__src")
    if backward:
        w = w.rowsBetween(W.unboundedPreceding, 0)
        fill = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = w.rowsBetween(0, W.unboundedFollowing)
        fill = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    filled = unioned.select(
        *on, "__ts", "__src", *left_other,
        *[fill(o).over(w).alias(o) for o in out_payloads],
        fill("__ref_ts").over(w).alias("__ref_ts"),
    )
    probes = filled.filter(F.col("__src") == F.lit(probe_flag)).drop("__src")
    if tolerance_us is not None:
        in_tol = (F.abs(F.unix_micros("__ts") - F.unix_micros("__ref_ts"))
                  <= tolerance_us)
        probes = probes.select(
            *on, "__ts", *left_other,
            *[F.when(in_tol, F.col(o)).alias(o) for o in out_payloads],
        )
    else:
        probes = probes.drop("__ref_ts")
    return probes.withColumnRenamed("__ts", left_ts)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_near",
) -> DataFrame:
    """``direction="nearest"`` (pandas merge_asof parity): attach the
    right row with the smallest |left_ts − right_ts| per key, ties
    going to the earlier (backward) side.

    ONE union + ONE sort computes BOTH candidates: the backward fill
    (last ignorenulls, preceding frame) and the forward fill (first
    ignorenulls, following frame) share the same partitioning and
    ordering, so Spark plans two Window nodes over a single exchange —
    nearest costs the same one shuffle as either direction alone. An
    equal-timestamp reference sorts before the probe and is therefore
    seen only by the backward frame at distance 0 — which the tie rule
    picks anyway, matching the two-ASOF-joins oracle exactly."""
    left_other = [c for c in left.columns if c not in on and c != left_ts]
    lpart = left.select(
        *on, F.col(left_ts).alias("__ts"), F.lit(1).alias("__src"),
        *left_other,
        *[F.lit(None).cast(right.schema[p].dataType).alias("__p_" + p)
          for p in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__ref_ts"),
    )
    rpart = right.select(
        *on, F.col(right_ts).alias("__ts"), F.lit(0).alias("__src"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_other],
        *[F.col(p).alias("__p_" + p) for p in payload_cols],
        F.col(right_ts).alias("__ref_ts"),
    )
    w = W.partitionBy(*on).orderBy("__ts", "__src")
    wb = w.rowsBetween(W.unboundedPreceding, 0)
    wf = w.rowsBetween(0, W.unboundedFollowing)
    filled = lpart.unionByName(rpart).select(
        *on, "__ts", "__src", *left_other,
        *[F.last("__p_" + p, ignorenulls=True).over(wb).alias("__b_" + p)
          for p in payload_cols],
        F.last("__ref_ts", ignorenulls=True).over(wb).alias("__b_ts"),
        *[F.first("__p_" + p, ignorenulls=True).over(wf).alias("__f_" + p)
          for p in payload_cols],
        F.first("__ref_ts", ignorenulls=True).over(wf).alias("__f_ts"),
    )
    probes = filled.filter(F.col("__src") == 1)
    bd = F.unix_micros("__ts") - F.unix_micros("__b_ts")
    fd = F.unix_micros("__f_ts") - F.unix_micros("__ts")
    pick_b = F.col("__f_ts").isNull() | (F.col("__b_ts").isNotNull()
                                         & (bd <= fd))
    sel = [*on, F.col("__ts").alias(left_ts), *left_other]
    for p in payload_cols:
        sel.append(F.when(pick_b, F.col("__b_" + p))
                    .otherwise(F.col("__f_" + p)).alias(p + suffix))
    return probes.select(*sel)
