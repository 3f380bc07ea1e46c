"""Window-function operators (SURVEY.md §2.5).

The per-record ordered window is the reference's core primitive
(``np.diff`` over the RR series, SURVEY.md §2.5 win_lag_diff
[PK:high]); here every variant is a Spark window spec. Sliding-frame
sums go through DECIMAL so DuckDB's segment-tree window accumulation
and Spark's running accumulation cannot diverge in the low bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (DEC, dsum, dsum_sql, nn, nn_sql, r6,
                               r6_sql)
from .registry import query


def _w(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev, W.partitionBy("user_id").orderBy("ts", "event_id")


@query("win_lag_diff", oracle="""
SELECT event_id, user_id,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv,
       lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value AS dv_next
FROM events
""")
def win_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive differences of the ordered series — diff_nni."""
    ev, w = _w(spark, sf_dir)
    return ev.select(
        "event_id", "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
        (F.lead("value").over(w) - F.col("value")).alias("dv_next"),
    )


@query("win_row_number", oracle="""
SELECT event_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS beat_idx
FROM events
""")
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, w = _w(spark, sf_dir)
    return ev.select("event_id", F.row_number().over(w).alias("beat_idx"))


@query("win_rank_dense", oracle=f"""
SELECT event_id,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       {r6_sql('percent_rank() OVER w')} AS prnk,
       {r6_sql('cume_dist() OVER w')} AS cdist,
       ntile(4) OVER w AS quartile
FROM events
WINDOW w AS (PARTITION BY event_type
             ORDER BY value NULLS FIRST, event_id)
""")
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        r6(F.percent_rank().over(w)).alias("prnk"),
        r6(F.cume_dist().over(w)).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query("win_running_agg", oracle=f"""
SELECT event_id,
       CAST(SUM(CAST(CASE WHEN NOT isnan(CAST((value) AS DOUBLE)) THEN (value) END AS DECIMAL(38,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM events
""")
def win_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum — the cumsum(rri) window-bucketing primitive
    (SURVEY.md §2.5 [PK:high])."""
    ev, w = _w(spark, sf_dir)
    frame = w.rowsBetween(W.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        F.sum(nn("value").cast(DEC)).over(frame).cast("double")
        .alias("running_total"),
    )


@query("win_sliding_rows", oracle=f"""
SELECT event_id,
  {r6_sql(f"CAST(SUM(CAST({nn_sql('value')} AS DECIMAL(38,6)))"
          f" OVER w AS DOUBLE)"
          f" / CAST(COUNT({nn_sql('value')}) OVER w AS DOUBLE)")}
  AS moving_avg_5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""")
def win_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, w = _w(spark, sf_dir)
    frame = w.rowsBetween(-4, 0)
    msum = F.sum(nn("value").cast(DEC)).over(frame).cast("double")
    return ev.select(
        "event_id",
        r6(msum / F.count(nn("value")).over(frame).cast("double"))
        .alias("moving_avg_5"),
    )


@query("win_sliding_range", oracle=f"""
SELECT event_id,
       CAST(SUM(CAST(CASE WHEN NOT isnan(CAST((value) AS DOUBLE)) THEN (value) END AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_1h,
       COUNT(*) OVER w AS n_1h
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""")
def win_sliding_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-interval window (the sliding HRV feature window,
    SURVEY.md §2.5 [PK:high]) — RANGE frame over integer epoch-µs, so
    the boundary is exact on both engines. At 100 TB this is the
    shuffle-free alternative to self-joining events against windows."""
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-3600000000, 0))
    return ev.select(
        "event_id",
        F.sum(nn("value").cast(DEC)).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query("win_first_last_value", oracle="""
SELECT event_id,
       first_value(value) OVER w AS first_v,
       last_value(value) OVER w AS last_v,
       nth_value(value, 3) OVER w AS third_v
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, w = _w(spark, sf_dir)
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.first("value").over(full).alias("first_v"),
        F.last("value").over(full).alias("last_v"),
        F.nth_value("value", 3).over(full).alias("third_v"),
    )


@query("topk_per_group", oracle="""
SELECT event_type, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 5
""")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per partition via row_number ≤ k — at scale Spark rewrites
    this to a per-partition bounded heap (WindowGroupLimit), so no full
    per-group sort materializes."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "value")
    )


MEDIAN_EXACT_MAX_FRAME = 512
"""Frames wider than this switch `sliding_median` to percentile_approx."""


def sliding_median(ev: DataFrame, half_width: int,
                   accuracy: int = 10000) -> DataFrame:
    """Rolling median of `value` over a centered ±half_width row frame.

    Two regimes, chosen by frame width:
    - frame ≤ MEDIAN_EXACT_MAX_FRAME: exact `percentile` — O(frame)
      recompute per row, fine for physiologic window sizes (~10²
      beats) and bit-identical to DuckDB's `quantile_cont`.
    - wider frames: `percentile_approx` (KLL-style sketch, ±ε rank
      error bounded by `accuracy`) — the per-row cost stops scaling
      with the frame, which is what survives a 100× frame widening.
    Both regimes keep the same output schema so callers switch by
    width alone."""
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-half_width, half_width))
    frame = 2 * half_width + 1
    nnv = "CASE WHEN isnan(value) THEN NULL ELSE value END"
    if frame <= MEDIAN_EXACT_MAX_FRAME:
        med = F.expr(f"percentile({nnv}, 0.5)").over(w)
    else:
        med = F.expr(f"percentile_approx({nnv}, 0.5, {accuracy})").over(w)
    # NaN readings: med ignores them (NaN≡missing); their own artifact
    # flag is pinned FALSE via coalesce (nullable-boolean house rule)
    return ev.select(
        "event_id", "user_id",
        r6(med).alias("med101"),
        F.coalesce(F.abs(nn("value") - med) > 0.2 * med,
                   F.lit(False)).alias("is_artifact"),
    )


@query("win_sliding_median", oracle=f"""
SELECT event_id, user_id,
       {r6_sql(f"quantile_cont({nn_sql('value')}, 0.5) OVER w")} AS med101,
       COALESCE(ABS(CASE WHEN NOT isnan(CAST((value) AS DOUBLE)) THEN (value) END - quantile_cont(CASE WHEN NOT isnan(CAST((value) AS DOUBLE)) THEN (value) END, 0.5) OVER w)
                > 0.2 * quantile_cont(CASE WHEN NOT isnan(CAST((value) AS DOUBLE)) THEN (value) END, 0.5) OVER w,
                FALSE) AS is_artifact
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 50 PRECEDING AND 50 FOLLOWING)
""")
def win_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-MEDIAN artifact filter: the robust centered statistic
    the quotient/moving-median RR-artifact rule is built on (a beat
    deviating > 20% from the local median is suspect) — mean-based
    rules break on the very artifacts being hunted. Spark's exact
    `percentile` and DuckDB's `quantile_cont` both linearly
    interpolate, so the 101-row frame medians match bit-for-bit.
    The 101-row frame stays on the exact path of `sliding_median`;
    frames wider than MEDIAN_EXACT_MAX_FRAME automatically take the
    percentile_approx sketch path (tested in tests/test_properties.py)
    so nobody widens the frame into an O(frame)-per-row trap."""
    ev = load_table(spark, sf_dir, "events")
    return sliding_median(ev, 50)


_Q15_US = 900_000_000


@query("time_bucket_gapfill", oracle=f"""
WITH b AS (
  SELECT user_id, (epoch_us(ts) // {_Q15_US}) * {_Q15_US} AS bucket_us, value
  FROM events),
a AS (
  SELECT user_id, bucket_us,
         {dsum_sql('value')} / CAST(COUNT(value) AS DOUBLE) AS v
  FROM b GROUP BY user_id, bucket_us),
g AS (
  SELECT user_id, unnest(generate_series(mn, mx, {_Q15_US})) AS bucket_us
  FROM (SELECT user_id, MIN(bucket_us) AS mn, MAX(bucket_us) AS mx
        FROM a GROUP BY user_id)),
j AS (
  SELECT g.user_id, g.bucket_us, a.v
  FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.bucket_us = a.bucket_us)
SELECT user_id, bucket_us,
       {r6_sql('''last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS v_filled,
       (v IS NULL) AS was_gap
FROM j
""")
def time_bucket_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-grid RESAMPLING with gap fill — TimescaleDB's
    `time_bucket_gapfill` shape, and the regularization step a
    frequency-domain pass needs (Welch wants an evenly-sampled
    series): bucket to a 15 min grid, average within buckets (exact
    sums), EXPLODE the per-user [min, max] bucket range to materialize
    missing grid rows, left-join observations back, LOCF-fill the
    holes. The grid explode is bounded by the observed span — the same
    bounded `explode(sequence)` fan-out idiom as the sliding-window
    HRV features, never a cartesian. First grid point is always
    observed (the range starts at the user's min bucket), so LOCF has
    no leading-NULL edge."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(f"(unix_micros(ts) div {_Q15_US}) * {_Q15_US}")
    a = (ev.select("user_id", bucket.alias("bucket_us"), "value")
           .groupBy("user_id", "bucket_us")
           .agg((dsum("value") / F.count("value").cast("double")).alias("v")))
    rng = a.groupBy("user_id").agg(F.min("bucket_us").alias("mn"),
                                   F.max("bucket_us").alias("mx"))
    grid = rng.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.lit(_Q15_US))).alias("bucket_us"))
    j = grid.join(a, ["user_id", "bucket_us"], "left")
    w = (W.partitionBy("user_id").orderBy("bucket_us")
          .rowsBetween(W.unboundedPreceding, 0))
    return j.select(
        "user_id", "bucket_us",
        r6(F.last("v", ignorenulls=True).over(w)).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@query("funnel_steps", oracle="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND us >= t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND us >= t2 GROUP BY e.user_id)
SELECT s1.user_id, t1, t2, t3,
       CASE WHEN t3 IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS stage
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
""")
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered FUNNEL progression (signup → first click AFTER signup →
    first purchase AFTER that click) — the event-analytics staple whose
    ORDER constraint a plain per-type min can't express. Each stage is
    a groupBy-min gated on the previous stage's timestamp; all three
    joins and aggregations key on user_id, so one hash partitioning
    serves the whole chain (a single exchange lineage at scale, same
    co-partitioning argument as hrv_pipeline_full). Timestamps compared
    as integer epoch-µs per the house rule."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    s1 = (ev.filter(F.col("event_type") == "signup")
            .groupBy("user_id").agg(F.min("us").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == "click").join(s1, "user_id")
            .filter(F.col("us") >= F.col("t1"))
            .groupBy("user_id").agg(F.min("us").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "purchase").join(s2, "user_id")
            .filter(F.col("us") >= F.col("t2"))
            .groupBy("user_id").agg(F.min("us").alias("t3")))
    stage = (F.when(F.col("t3").isNotNull(), 3)
              .when(F.col("t2").isNotNull(), 2).otherwise(1))
    return (s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
              .select("user_id", "t1", "t2", "t3", stage.alias("stage")))


@query("retention_cohort", oracle="""
WITH c AS (
  SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
a AS (
  SELECT e.user_id, c.cohort_week,
         CAST((epoch(CAST(date_trunc('week', e.ts) AS DATE))
               - epoch(c.cohort_week)) / 604800 AS BIGINT) AS week_offset
  FROM events e JOIN c USING (user_id)
  WHERE CAST(date_trunc('week', e.ts) AS DATE) >= c.cohort_week)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM a GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""")
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort RETENTION matrix — (signup week × weeks-since-signup →
    distinct active users), the second event-analytics staple next to
    funnel_steps. Cohort assignment is a per-user min, the matrix one
    distinct-count aggregate; both key on user_id so the join is
    co-partitioned with the cohort agg. Week offsets computed from
    DATE-truncated epochs (integer arithmetic — no timestamp-dialect
    drift); at 100 TB the distinct count swaps for an HLL sketch per
    cell (agg_hll_sketch_merge) and the matrix stays mergeable across
    partitions/days."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts").cast("date")
    c = (ev.filter(F.col("event_type") == "signup")
           .groupBy("user_id").agg(F.min(wk).alias("cohort_week")))
    a = (ev.select("user_id", wk.alias("act_week")).join(c, "user_id")
           .filter(F.col("act_week") >= F.col("cohort_week")))
    offset = ((F.unix_date("act_week") - F.unix_date("cohort_week")) / 7) \
        .cast("long")
    return (a.select("cohort_week", offset.alias("week_offset"), "user_id")
             .groupBy("cohort_week", "week_offset")
             .agg(F.countDistinct("user_id").alias("active_users"))
             .orderBy("cohort_week", "week_offset"))


@query("win_streaks_islands", oracle="""
WITH f AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
g AS (
  SELECT user_id, event_id, us, rn,
         rn - row_number() OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) AS island
  FROM f WHERE value > 60.0)
SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
       CAST(MAX(us) AS BIGINT) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_beats
FROM g GROUP BY user_id, island
HAVING COUNT(*) >= 3
ORDER BY user_id, start_us
""")
def win_streaks_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: maximal runs of CONSECUTIVE over-threshold
    beats (≥ 3 long) — the episode-detection shape (tachycardia run,
    artifact burst, sensor dropout). The classic rn − rn_filtered
    difference labels each island with a per-user constant, then one
    aggregate summarizes each episode; two window passes + one agg,
    all on the same user_id partitioning — no self-join, no
    explode, which is what makes episode detection tractable on an
    unbounded series."""
    ev = load_table(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    f = ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"),
                  "value", F.row_number().over(w_all).alias("rn"))
    w_flag = W.partitionBy("user_id").orderBy("us", "event_id")
    g = (f.filter(F.col("value") > 60.0)
          .withColumn("island",
                      F.col("rn") - F.row_number().over(w_flag)))
    return (g.groupBy("user_id", "island")
             .agg(F.min("us").alias("start_us"),
                  F.max("us").alias("end_us"),
                  F.count(F.lit(1)).alias("n_beats"))
             .filter(F.col("n_beats") >= 3)
             .select("user_id", "start_us", "end_us", "n_beats")
             .orderBy("user_id", "start_us"))


@query("scd2_history", oracle="""
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
k AS (
  SELECT user_id, event_id, us, event_type FROM c
  WHERE prev_type IS NULL OR event_type <> prev_type)
SELECT user_id, event_type, us AS valid_from_us,
       lead(us) OVER w AS valid_to_us,
       row_number() OVER w AS version,
       (lead(us) OVER w IS NULL) AS is_current
FROM k
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
""")
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLOWLY-CHANGING-DIMENSION TYPE 2 build from a change feed: the
    events stream is treated as an attribute change log (user_id ->
    event_type); consecutive duplicate states collapse, and each kept
    change becomes a versioned validity interval [valid_from,
    valid_to) with an is_current flag — the standard warehouse
    history-table shape.

    Two window passes on ONE user_id partitioning (lag to collapse
    runs, lead/row_number to close intervals) — Spark reuses the sort
    across both, so the whole build is a single shuffle regardless of
    history length. Timestamps emitted as epoch micros per the
    cross-engine house rule."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    c = ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"),
                  "event_type",
                  F.lag("event_type").over(w).alias("prev_type"))
    k = c.filter(F.col("prev_type").isNull()
                 | (F.col("event_type") != F.col("prev_type")))
    w2 = W.partitionBy("user_id").orderBy("us", "event_id")
    return k.select(
        "user_id", "event_type",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).alias("version"),
        F.lead("us").over(w2).isNull().alias("is_current"),
    )


_EWMA_K = 16          # bounded lookback
_EWMA_ALPHA = 0.5     # power-of-two weights: exactly representable


def _ewma_weights() -> list[float]:
    return [_EWMA_ALPHA ** (j + 1) for j in range(_EWMA_K)]


@query("win_ewma", oracle=f"""
SELECT event_id, user_id,
       {' + '.join(
           f"COALESCE(lag(value, {j}) OVER w * {w!r}, 0)"
           for j, w in enumerate(_ewma_weights()))} AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded exponentially-weighted moving average (alpha = 1/2,
    16-lag truncated kernel) — the streaming-friendly smoother for
    sensor series. The recursive EWMA definition is not a window
    aggregate; the truncated convolution IS: 16 lag() terms over ONE
    window spec (one sort, one pass). Exactness: the weights are
    powers of two (exact doubles), the 16-term sum is a FIXED
    left-associated scalar expression tree — identical IEEE fold on
    both engines, no aggregation order anywhere — and missing lags at
    series start coalesce to 0 (truncated, not renormalized; both
    engines agree by construction). EMITTED UNROUNDED: the power-of-
    two weights make sums land EXACTLY on .xxxxxx5 boundaries where
    half-up (Spark) and half-even (DuckDB) disagree — the raw doubles
    are bit-identical, the 6-dp rounds are not (observed). At 100 TB
    this is the same single user-partitioned shuffle every other
    window op rides."""
    ev, w = _w(spark, sf_dir)
    terms = [
        F.coalesce(F.lag("value", j).over(w) * F.lit(wt), F.lit(0.0))
        for j, wt in enumerate(_ewma_weights())
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return ev.select("event_id", "user_id", acc.alias("ewma"))


_Z_VAR = "((sxx - sx * sx / n) / (n - 1.0))"
_Z_EXPR = f"(value - sx / n) / SQRT({_Z_VAR})"
_Z_OK = f"n >= 8 AND {_Z_VAR} > 0"


@query("win_anomaly_zscore", oracle=f"""
WITH f AS (
  SELECT event_id, user_id, value,
         CAST(SUM(CAST(value AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(value * value AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sxx,
         CAST(COUNT(value) OVER w AS DOUBLE) AS n
  FROM events
  WHERE value IS NULL OR NOT isnan(value)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id,
       {r6_sql(f"CASE WHEN {_Z_OK} THEN {_Z_EXPR} END")} AS z,
       COALESCE(CASE WHEN {_Z_OK} THEN ABS({_Z_EXPR}) > 3.0 END,
                FALSE) AS is_anomaly
FROM f
""")
def win_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag — the online sensor-QC operator:
    each reading standardized against the TRAILING 20 readings
    EXCLUDING itself (a self-inclusive frame would let the outlier
    drag its own baseline), flagged at |z| > 3 with an 8-reading
    warm-up guard. One window frame carries exact DECIMAL(38,12)
    sums of x and x² — mean and sample variance assemble from them
    bit-identically cross-engine (the segment-tree vs running
    accumulation difference that motivates the module's DECIMAL
    rule), and sqrt is IEEE-correctly-rounded on both. Same single
    user-partitioned shuffle as every window op; at 100 TB this
    replaces a per-device self-join baseline pass.

    The flag is COALESCEd to false for warm-up/degenerate rows rather
    than left NULL: a nullable BOOLEAN renders differently through the
    two pandas canonicalization paths (Spark toPandas keeps None,
    DuckDB .df() turns it into float NaN — observed mismatch), and
    'not yet enough baseline' is honestly 'not an anomaly'."""
    ev, w = _w(spark, sf_dir)
    # NaN readings are unscoreable and must not poison neighbors'
    # baselines (round 6, nulls fixture); NULL rows keep their
    # original pass-through behavior. Identical filter in the oracle.
    ev = ev.filter(F.col("value").isNull() | ~F.isnan("value"))
    # Round 12: O(n·W) sliding decimal sums → O(n) prefix differences
    # (functions/rollfast.py; exact, incl. the exclude-current-row
    # frame — cum lags 1 and 21 — and NULL-value rows, which the
    # per-sum non-null count guard reproduces bit-for-bit).
    from ..functions.rollfast import trailing_agg
    val = F.col("value")
    ev = trailing_agg(ev, ["user_id"], ["ts", "event_id"], (-20, -1),
                      sums={"__sxd": val.cast(DEC),
                            "__sxxd": (val * val).cast(DEC)},
                      counts={"__nl": val})
    sx = F.col("__sxd").cast("double")
    sxx = F.col("__sxxd").cast("double")
    n = F.col("__nl").cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    ok = (n >= 8) & (var > 0)
    z = (F.col("value") - sx / n) / F.sqrt(var)
    return ev.select(
        "event_id", "user_id",
        r6(F.when(ok, z)).alias("z"),
        F.coalesce(F.when(ok, F.abs(z) > 3.0), F.lit(False))
         .alias("is_anomaly"),
    )


_TW_HOUR = 3_600_000_000


@query("agg_time_weighted_avg", oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
           - epoch_us(ts) AS dur
  FROM events),
w AS (
  SELECT user_id, (us // {_TW_HOUR}) * {_TW_HOUR} AS ws_us,
         CASE WHEN value IS NOT NULL THEN value * dur END AS vw,
         CASE WHEN value IS NOT NULL THEN dur END AS dw
  FROM e WHERE dur IS NOT NULL)
SELECT user_id, ws_us,
       {r6_sql(f"CASE WHEN {dsum_sql('dw')} > 0 THEN "
               f"{dsum_sql('vw')} / {dsum_sql('dw')} END")} AS twap,
       CAST(SUM(dw) AS BIGINT) AS covered_us
FROM w GROUP BY user_id, ws_us
""")
def agg_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average over the irregular sample series (the
    TimescaleDB `time_weight` shape): each reading holds until the
    next one (left-continuous step function), so its weight is the
    µs gap to the successor; per (user, hour-bucket of the interval
    START) the TWAP is Σ value·Δt / Σ Δt. The plain AVG over-weights
    burst periods — TWAP is what monitoring actually wants on
    event-driven sensors. Weights are exact integer µs, the weighted
    sums go through DECIMAL(38,12), NULL readings drop from both
    numerator and denominator, and each user's final open-ended
    reading is excluded (no successor to bound it). One window lead +
    one hash agg on the same user partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    e = ev.select("user_id", us.alias("us"), "value",
                  (F.lead(us).over(w) - us).alias("dur"))
    e = e.filter(F.col("dur").isNotNull())
    vw = F.when(F.col("value").isNotNull(), F.col("value") * F.col("dur"))
    dw = F.when(F.col("value").isNotNull(), F.col("dur"))
    g = (e.select("user_id",
                  F.expr(f"(us div {_TW_HOUR}) * {_TW_HOUR}").alias("ws_us"),
                  vw.alias("vw"), dw.alias("dw"))
          .groupBy("user_id", "ws_us")
          .agg(dsum("vw").alias("sv"), dsum("dw").alias("sd"),
               F.sum("dw").alias("covered")))
    return g.select(
        "user_id", "ws_us",
        r6(F.when(F.col("sd") > 0, F.col("sv") / F.col("sd"))).alias("twap"),
        F.col("covered").cast("long").alias("covered_us"),
    )
