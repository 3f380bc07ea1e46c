"""O(n) trailing-frame aggregates via prefix differences (round 12).

Spark's ``WindowExec`` recomputes a BOUNDED sliding aggregate frame
from scratch for every row (``SlidingWindowFunctionFrame`` has no
inverse/retract path), so a W-row trailing SUM/COUNT costs O(n·W) per
partition — measured 30.1 s for four decimal sums at W=100 over 400k
rows vs 2.55 s for the prefix form below (guide §1.2: fix the per-task
work). The same aggregate over the CUMULATIVE frame is maintained
incrementally in O(n), and in EXACT arithmetic the trailing-frame
value is the telescoping difference cum(i+end) − cum(i+start−1), i.e.
a pair of O(1) ``lag`` reads over the same sort.

ONLY exact aggregates may be routed through this: decimal-cast sums
and counts. A double-typed sum would change the fold order and drift
last-ulp against both the windowed form and the DuckDB oracle.

Null semantics match the windowed original EXACTLY:
- SUM skips NULLs and yields NULL on an all-NULL (or empty) frame —
  reproduced by guarding the difference with the frame's non-null
  count;
- COUNT(expr) counts non-NULL rows, COUNT(*) counts rows; both are 0
  (never NULL) on an empty frame.

Overflow bound: the windowed form only needs the FRAME sum to fit in
decimal(38,12); the prefix form needs the PARTITION-PREFIX sum to fit.
Headroom is 26 integer digits, so even 1e9 rows of |x| ≤ 1e16 (the
worst power sum any caller routes here) stays >10 digits clear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_PFX = "__rf_"


def trailing_agg(df: DataFrame, part_cols, order_cols,
                 frame: tuple[int, int],
                 sums: dict[str, Column] | None = None,
                 counts: dict[str, Column] | None = None,
                 count_star: str | None = None) -> DataFrame:
    """Append exact trailing-frame SUM/COUNT columns in O(n).

    ``frame`` is the ROWS frame as (start, end) row offsets with
    start <= end <= 0 — e.g. (-99, 0) for "99 PRECEDING AND CURRENT
    ROW", (-20, -1) for "20 PRECEDING AND 1 PRECEDING". ``sums`` maps
    output name -> the (decimal-cast, exact) expression to sum;
    ``counts`` maps output name -> the expression whose non-NULLs are
    counted; ``count_star`` names a COUNT(*) output. All other columns
    of ``df`` pass through unchanged. Both generated Window operators
    share the partitioning and sort of the frame they replace — no new
    exchange, no new sort.
    """
    sums = sums or {}
    counts = counts or {}
    start, end = frame
    assert start <= end <= 0, frame
    a, b = -end, -start + 1  # cum-lag offsets: frame sum = L_a − L_b
    cum = (W.partitionBy(*part_cols).orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    lagw = W.partitionBy(*part_cols).orderBy(*order_cols)

    # Subtracting two decimal(38,s) bumps the result precision to 39,
    # which Spark resolves by REDUCING THE SCALE to s−1 — silently
    # rounding the last decimal digit and breaking the exact-
    # telescoping argument (caught by the win_rolling_skew_kurt
    # oracle). Down-casting each cumulative sum to decimal(37,s)
    # first keeps the difference at (38,s), fully exact; the cast
    # itself is exact for any |cum| < 1e(37−s) (the overflow bound in
    # the module docstring).
    from pyspark.sql.types import DecimalType
    sum_types = dict(zip(sums, df.select(*sums.values()).schema.fields))

    def cum_sum(n: str, e: Column) -> Column:
        c = F.sum(e).over(cum)
        t = sum_types[n].dataType
        if isinstance(t, DecimalType) and t.precision >= 38:
            c = c.cast(DecimalType(37, t.scale))
        return c.alias(_PFX + "s_" + n)

    stage1 = [cum_sum(n, e) for n, e in sums.items()]
    stage1 += [F.count(e).over(cum).alias(_PFX + "k_" + n)
               for n, e in sums.items()]
    stage1 += [F.count(e).over(cum).alias(_PFX + "c_" + n)
               for n, e in counts.items()]
    if count_star:
        stage1.append(F.row_number().over(lagw)
                       .cast("long").alias(_PFX + "rn"))
    mid = df.select("*", *stage1)

    def lagged(col: Column, off: int) -> Column:
        return col if off == 0 else F.lag(col, off).over(lagw)

    def diff(name: str) -> Column:
        c = F.col(name)
        # L_b NULL = empty prefix before frame start → subtract 0;
        # L_a NULL = the frame ends before the partition starts
        # (possible when end < 0) → whole frame empty → NULL.
        return F.coalesce(lagged(c, a) - lagged(c, b), lagged(c, a))

    final = []
    for n in sums:
        cnt = F.coalesce(diff(_PFX + "k_" + n), F.lit(0))
        final.append(F.when(cnt > 0, diff(_PFX + "s_" + n)).alias(n))
    for n in counts:
        final.append(F.coalesce(diff(_PFX + "c_" + n), F.lit(0))
                      .cast("long").alias(n))
    if count_star:
        final.append(F.coalesce(diff(_PFX + "rn"), F.lit(0))
                      .cast("long").alias(count_star))
    keep = [c for c in mid.columns if not c.startswith(_PFX)]
    return mid.select(*keep, *final)
