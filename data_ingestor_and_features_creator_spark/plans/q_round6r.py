"""Round-6r operator additions: telemetry hygiene and arrival-process
statistics.

Debounce (the double-fire event filter every telemetry ingest runs),
inter-arrival burstiness (the Goh–Barabási arrival-process signature),
and per-day peak-to-average ratio (the capacity-planning load factor).
Integer epoch arithmetic, DECIMAL sums, discrete order statistics.

Provenance note (SURVEY.md §0 applies — empty reference checkout):
all public-API constructions ([SPARK]/[PK] — debouncing is
UI/telemetry canon; burstiness B = (σ−μ)/(σ+μ) is Goh & Barabási
2008; peak-to-average ratio is capacity-planning canon).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead
of these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (
    dsum_str,
    dsum_str_sql,
    r6,
    r6_sql,
    safe_sqrt,
    safe_sqrt_sql,
)
from .registry import query

_DEBOUNCE_US = 3_600_000_000  # 1-hour rapid-repeat window
# (real telemetry debounces at seconds; this fixture's per-(user, type)
#  streams are sparse — min gap 8.2 s, p01 ~47 min at sf0.01 — so the
#  window is set where the flag is NON-VACUOUS at every fixture: an
#  oracle that matches on an empty result proves nothing, the house
#  rule the verify recipe pins. The operator shape is threshold-
#  agnostic.)


# ---------------------------------------------------------------------------
# Telemetry debounce
# ---------------------------------------------------------------------------

_DEBOUNCE_SQL = f"""
WITH s AS (
  SELECT user_id, event_id, event_type, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, event_id, event_type,
       CAST(gap_us AS BIGINT) AS gap_us,
       COALESCE(gap_us < {_DEBOUNCE_US}, false) AS is_bounce
FROM s WHERE gap_us IS NOT NULL AND gap_us < {_DEBOUNCE_US}
ORDER BY user_id, event_id
"""


@query("dedup_telemetry_debounce", oracle=_DEBOUNCE_SQL)
def dedup_telemetry_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TELEMETRY DEBOUNCE [PK — the double-fire filter every event
    ingest runs: a retry, a double-click, or an at-least-once
    delivery lands the same logical event twice within seconds]:
    flag events whose PREVIOUS same-(user, type) event is less than
    the debounce window earlier — the lag-based (non-greedy) form, a pure
    window function and deterministic, where the greedy keep-chain
    variant is inherently iterative (that trade-off is the
    documented choice; at-least-once pipelines use exactly this
    form). Pure integer epoch-µs arithmetic. Distinct from
    dedup_exact (identical payloads) and stream_dedup (watermarked
    ids): this catches near-in-time REPEATS with distinct ids.
    Scale: one window over the (user, type) partitioning — the
    filter emits only the bounces."""
    ev = load_table(spark, sf_dir, "events")
    ws = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    s = ev.select("user_id", "event_id", "event_type",
                  (t - F.lag(t).over(ws)).alias("gap_us"))
    return (s.filter(F.col("gap_us").isNotNull()
                     & (F.col("gap_us") < _DEBOUNCE_US))
             .select("user_id", "event_id", "event_type",
                     F.col("gap_us").cast("long").alias("gap_us"),
                     F.coalesce(F.col("gap_us") < _DEBOUNCE_US,
                                F.lit(False)).alias("is_bounce"))
             .orderBy("user_id", "event_id"))


# ---------------------------------------------------------------------------
# Inter-arrival burstiness
# ---------------------------------------------------------------------------

_BURSTINESS_SQL = f"""
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
           / 1000000.0 AS gap_s
  FROM events),
s AS (
  SELECT user_id, CAST(COUNT(gap_s) AS DOUBLE) AS n,
         {dsum_str_sql('gap_s')} AS sx,
         {dsum_str_sql('gap_s * gap_s')} AS sxx
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
  HAVING COUNT(gap_s) >= 3)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       sx / n AS mean_gap_s,
       CASE WHEN ((sxx - sx * sx / n) / (n - 1.0)) >= 0 THEN SQRT((sxx - sx * sx / n) / (n - 1.0)) END AS sd_gap_s,
       (CASE WHEN ((sxx - sx * sx / n) / (n - 1.0)) >= 0 THEN SQRT((sxx - sx * sx / n) / (n - 1.0)) END - sx / n) / (CASE WHEN ((sxx - sx * sx / n) / (n - 1.0)) >= 0 THEN SQRT((sxx - sx * sx / n) / (n - 1.0)) END + sx / n) AS burstiness
FROM s ORDER BY user_id
"""


@query("agg_interarrival_burstiness", oracle=_BURSTINESS_SQL)
def agg_interarrival_burstiness(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """INTER-ARRIVAL BURSTINESS [PK — Goh & Barabási 2008]: B =
    (σ−μ)/(σ+μ) of each user's inter-event gaps — the arrival-
    process signature in one number: B→−1 periodic (sensors on a
    clock), B≈0 Poisson, B→+1 bursty (human sessions) — the
    statistic that tells an ingest planner whether load smooths or
    spikes at scale. Gaps are exact integer-µs differences scaled
    once by 10⁶ (a power-of-two-free but IDENTICAL division on both
    engines); μ and σ come from string-routed sums (σ² is the
    cancelling Σx²−(Σx)²/n); degenerate users (constant gaps → σ=0)
    give B=−1 exactly, never a fault. All three statistics are
    emitted UNROUNDED (the win_vwap convention): the mean is a ratio
    of SHORT-decimal rationals (integer-µs gaps /10⁶, summed, over a
    small n) that lands on ROUND's 7th-digit half-grid with real
    probability — observed at the 1M-row blow-up — while the
    string-routed sums make the doubles bit-identical cross-engine,
    so the exact passthrough is the stronger check. Scale: one lag
    window + one map-side-combined aggregate per user."""
    ev = load_table(spark, sf_dir, "events")
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    g = ev.select("user_id",
                  ((t - F.lag(t).over(ws)).cast("double") / 1000000.0)
                  .alias("gap_s"))
    x = F.col("gap_s")
    s = (g.filter(x.isNotNull())
          .groupBy("user_id")
          .agg(F.count(x).cast("double").alias("n"),
               dsum_str(x).alias("sx"), dsum_str(x * x).alias("sxx"))
          .filter(F.col("n") >= 3))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mu = sx / n
    sd = safe_sqrt((sxx - sx * sx / n) / (n - 1.0))
    return (s.select("user_id", n.cast("long").alias("n_gaps"),
                     mu.alias("mean_gap_s"), sd.alias("sd_gap_s"),
                     ((sd - mu) / (sd + mu)).alias("burstiness"))
             .orderBy("user_id"))


# ---------------------------------------------------------------------------
# Peak-to-average load ratio
# ---------------------------------------------------------------------------

_PAR_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS day,
         date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
d AS (
  SELECT day, CAST(MAX(c) AS BIGINT) AS peak_hourly,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS hours_active
  FROM h GROUP BY day)
SELECT day, peak_hourly, total, hours_active,
       ROUND(CAST(peak_hourly AS DOUBLE)
             / (CAST(total AS DOUBLE) / hours_active), 6)
         AS peak_to_avg
FROM d ORDER BY day
"""


@query("agg_peak_to_avg_ratio", oracle=_PAR_SQL)
def agg_peak_to_avg_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK-TO-AVERAGE load ratio per day [PK — capacity-planning
    canon: provision for the peak, bill for the average; the ratio
    IS the over-provisioning factor]: hourly event counts, then per
    day the peak hour over the mean active hour. Everything is an
    exact integer until the single final division of exact counts
    (identical IEEE both engines). Complements
    agg_interarrival_burstiness: burstiness is the per-user arrival
    signature, this the system-level aggregate load shape. Scale:
    two stacked hash aggregates — the shuffle carries (day, hour)
    cells, never events."""
    ev = load_table(spark, sf_dir, "events")
    h = (ev.groupBy(F.date_trunc("day", "ts").alias("day"),
                    F.date_trunc("hour", "ts").alias("hour"))
           .agg(F.count(F.lit(1)).alias("c")))
    d = h.groupBy("day").agg(F.max("c").alias("peak_hourly"),
                             F.sum("c").alias("total"),
                             F.count(F.lit(1)).alias("hours_active"))
    par = (F.col("peak_hourly").cast("double")
           / (F.col("total").cast("double") / F.col("hours_active")))
    return (d.select("day", "peak_hourly", "total", "hours_active",
                     r6(par).alias("peak_to_avg"))
             .orderBy("day"))
