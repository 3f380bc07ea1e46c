"""Round-6o operator additions: the ANOVA follow-up, experiment
planning, cross-sectional ranking, and temporal normalization.

Tukey–Kramer HSD (which arms differ, after stat_anova_oneway says
some do), the power/sample-size planner (the op that runs BEFORE the
experiment the rest of the ab_* family reads), cross-sectional
momentum ranks (ranking ACROSS entities at each time point — the
transposed window axis), and temporal coalesce (merging adjacent
same-value validity periods — SQL:2011 temporal normalization).

Provenance note (SURVEY.md §0 applies — empty reference checkout):
all public-API constructions ([SPARK]/[PK] — Tukey 1949 / Kramer
1956; power analysis is Cohen 1988 canon; cross-sectional momentum
is the Jegadeesh–Titman construction; temporal coalescing is the
SQL:2011 / Snodgrass temporal-database operation).

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

# (z_{alpha/2} + z_{beta})^2 at alpha=.05 two-sided, power=.80:
# (1.96 + 0.8416)^2 — pinned literal so neither engine derives it.
_POWER_K = "7.84896256"
# Studentized-range 5% critical value, k=3 groups, df=infinity.
_Q_CRIT = "3.314"


# ---------------------------------------------------------------------------
# Tukey–Kramer HSD post-hoc pairwise comparison
# ---------------------------------------------------------------------------

_TUKEY_SQL = f"""
WITH v AS (
  SELECT CASE (event_id % 1000003) * 2654435761 % 1000003 % 3
         WHEN 0 THEN 'A' WHEN 1 THEN 'B' ELSE 'C' END AS variant,
         value
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
g AS (
  SELECT variant, CAST(COUNT(*) AS DOUBLE) AS ni,
         {dsum_str_sql('value')} AS si, {dsum_str_sql('value * value')} AS qi
  FROM v GROUP BY variant),
t AS (
  SELECT CAST(SUM(CAST(ni AS BIGINT)) AS DOUBLE) AS n,
         CAST(COUNT(*) AS DOUBLE) AS k,
         {dsum_str_sql('qi')} AS q, {dsum_str_sql('si * si / ni')} AS sb
  FROM g),
p AS (
  SELECT a.variant AS v1, b.variant AS v2,
         a.si / a.ni - b.si / b.ni AS diff,
         {safe_sqrt_sql('((t.q - t.sb) / (t.n - t.k))'
                        ' / 2.0 * (1.0 / a.ni + 1.0 / b.ni)')} AS se
  FROM g a JOIN g b ON a.variant < b.variant, t)
SELECT v1, v2, {r6_sql('diff')} AS mean_diff, {r6_sql('se')} AS se,
       {r6_sql('abs(diff) / se')} AS q_stat,
       COALESCE(abs(diff) / se > {_Q_CRIT}, false) AS significant
FROM p ORDER BY v1, v2
"""


@query("stat_tukey_hsd", oracle=_TUKEY_SQL)
def stat_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY–KRAMER HSD post-hoc comparison [PK — Tukey 1949, Kramer
    1956 for unequal n]: AFTER stat_anova_oneway rejects 'all means
    equal', WHICH pairs differ — q = |ȳᵢ−ȳⱼ| / √(MSW/2·(1/nᵢ+1/nⱼ)),
    flagged at the studentized-range critical value 3.314 (k=3,
    df=∞, pinned literal), the family-wise-error-controlled answer a
    per-pair t-test inflates. Reuses the ANOVA decomposition's fully
    string-routed sums (MSW comes from the same cancelling q − sb
    difference); the pair table is a self-join of the 3-row group
    aggregate. Scale: two stacked aggregates + a 3-row self-join —
    constant at any SF."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    arm = (F.col("event_id") % 1000003) * F.lit(2654435761) % 1000003 % 3
    v = ev.select(
        F.when(arm == 0, "A").when(arm == 1, "B").otherwise("C")
         .alias("variant"), "value")
    x = F.col("value")
    g = v.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("ni"),
        dsum_str(x).alias("si"), dsum_str(x * x).alias("qi"))
    ni, si = F.col("ni"), F.col("si")
    t = g.agg(F.sum(ni.cast("long")).cast("double").alias("n"),
              F.count(F.lit(1)).cast("double").alias("k"),
              dsum_str(F.col("qi")).alias("q"),
              dsum_str(si * si / ni).alias("sb"))
    a = g.select(F.col("variant").alias("v1"), F.col("ni").alias("n1"),
                 F.col("si").alias("s1"))
    b = g.select(F.col("variant").alias("v2"), F.col("ni").alias("n2"),
                 F.col("si").alias("s2"))
    p = (a.join(b, F.col("v1") < F.col("v2"))
          .crossJoin(F.broadcast(t)))
    msw = (F.col("q") - F.col("sb")) / (F.col("n") - F.col("k"))
    diff = F.col("s1") / F.col("n1") - F.col("s2") / F.col("n2")
    se = safe_sqrt(msw / 2.0 * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    qs = F.abs(diff) / se
    return (p.select("v1", "v2", r6(diff).alias("mean_diff"),
                     r6(se).alias("se"), r6(qs).alias("q_stat"),
                     F.coalesce(qs > float(_Q_CRIT), F.lit(False))
                      .alias("significant"))
             .orderBy("v1", "v2"))


# ---------------------------------------------------------------------------
# A/B power / sample-size planner
# ---------------------------------------------------------------------------

_POWER_SQL = f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_str_sql('value')} AS sx,
         {dsum_str_sql('value * value')} AS sxx
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
m AS (
  SELECT sx / n AS mu, (sxx - sx * sx / n) / (n - 1.0) AS var FROM s),
mde AS (SELECT unnest([1, 5, 10]) AS mde_pct)
SELECT mde.mde_pct,
       {r6_sql('m.mu * mde.mde_pct / 100.0')} AS delta,
       CAST(CEIL(2.0 * m.var * {_POWER_K}
                 / ((m.mu * mde.mde_pct / 100.0)
                    * (m.mu * mde.mde_pct / 100.0))) AS BIGINT)
         AS n_per_arm
FROM m, mde ORDER BY mde.mde_pct
"""


@query("ab_power_sample_size", oracle=_POWER_SQL)
def ab_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B POWER / SAMPLE-SIZE planner [PK — Cohen 1988 two-sample
    normal approximation]: n per arm = 2σ²(z_{α/2}+z_β)²/δ² at 5%
    two-sided / 80% power for relative MDEs of 1/5/10% of the metric
    mean — the op an experimentation platform runs BEFORE assigning
    anyone (the rest of the ab_* family reads the experiment; this
    one plans it). The z-sum square 7.84896256 is a pinned literal;
    μ and σ² come from fully string-routed sums (the variance is the
    cancelling Σx²−(Σx)²/n); CEIL of an identical double is exact on
    both engines. Scale: ONE aggregate + a 3-row literal table —
    constant output."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    x = F.col("value")
    s = ev.agg(F.count(F.lit(1)).cast("double").alias("n"),
               dsum_str(x).alias("sx"), dsum_str(x * x).alias("sxx"))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    m = s.select((sx / n).alias("mu"),
                 ((sxx - sx * sx / n) / (n - 1.0)).alias("var"))
    mde = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(10))).alias("mde_pct"))
    p = m.crossJoin(F.broadcast(mde))
    delta = F.col("mu") * F.col("mde_pct") / 100.0
    n_req = F.ceil(2.0 * F.col("var") * float(_POWER_K) / (delta * delta))
    return (p.select("mde_pct", r6(delta).alias("delta"),
                     n_req.cast("long").alias("n_per_arm"))
             .orderBy("mde_pct"))


# ---------------------------------------------------------------------------
# Cross-sectional momentum rank
# ---------------------------------------------------------------------------

_XSECTION_SQL = """
WITH b AS (
  SELECT user_id, date_trunc('day', ts) AS day, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events WHERE value IS NOT NULL AND NOT isnan(value) AND value > 0),
daily AS (
  SELECT user_id, day, MAX(CASE WHEN rn_d = 1 THEN value END) AS close
  FROM b GROUP BY user_id, day),
r AS (
  SELECT user_id, day,
         ROUND(close / lag(close, 7) OVER (PARTITION BY user_id
                                           ORDER BY day) - 1.0, 6) AS ret7
  FROM daily)
SELECT day, user_id, ret7,
       CAST(row_number() OVER (PARTITION BY day
                               ORDER BY ret7 DESC, user_id) AS BIGINT)
         AS mom_rank
FROM r WHERE ret7 IS NOT NULL
ORDER BY day, mom_rank
"""


@query("win_cross_sectional_rank", oracle=_XSECTION_SQL)
def win_cross_sectional_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SECTIONAL momentum rank [PK — the Jegadeesh–Titman
    construction]: every TIME-SERIES window op in §2.5 partitions by
    entity and orders by time; this one TRANSPOSES the axes — at
    each day, rank all users by their trailing 7-bar return. That
    cross-sectional shape (rank across entities at fixed time) is
    what portfolio construction, leaderboards, and per-cohort
    percentiles need, and no amount of per-entity windowing
    expresses it. Returns are ROUNDED BEFORE ranking with a user_id
    tiebreak (post-round rank keys — the text_llr_keyness rule), so
    the rank permutation is identical cross-engine. Scale: the daily
    bar collapse first (events → user-days), then one exchange per
    axis — by user for the lag, by day for the rank."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
        & (F.col("value") > 0))
    day = F.date_trunc("day", F.col("ts"))
    wd = W.partitionBy("user_id", "day").orderBy(F.desc("ts"),
                                                 F.desc("event_id"))
    b = (ev.select("user_id", day.alias("day"), "value", "ts", "event_id")
           .withColumn("rn_d", F.row_number().over(wd)))
    daily = b.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"))
    wu = W.partitionBy("user_id").orderBy("day")
    ret7 = F.round(F.col("close") / F.lag("close", 7).over(wu) - 1.0, 6)
    r = daily.select("user_id", "day", ret7.alias("ret7"))
    wx = W.partitionBy("day").orderBy(F.desc("ret7"), "user_id")
    return (r.filter(F.col("ret7").isNotNull())
             .select("day", "user_id", "ret7",
                     F.row_number().over(wx).cast("long").alias("mom_rank"))
             .orderBy("day", "mom_rank"))


# ---------------------------------------------------------------------------
# Temporal coalesce (merge adjacent same-value periods)
# ---------------------------------------------------------------------------

_COALESCE_SQL = """
WITH daily AS (
  SELECT user_id, CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                       AS BIGINT) AS day_no,
         MAX(event_type) AS status
  FROM events GROUP BY user_id, date_trunc('day', ts)),
flagged AS (
  SELECT user_id, day_no, status,
         CASE WHEN lag(status) OVER w IS NULL
                   OR lag(status) OVER w <> status
                   OR lag(day_no) OVER w <> day_no - 1
              THEN 1 ELSE 0 END AS new_island
  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day_no)),
islands AS (
  SELECT user_id, day_no, status,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY day_no
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS island_id
  FROM flagged)
SELECT user_id, CAST(island_id AS BIGINT) AS island_id, status,
       CAST(MIN(day_no) AS BIGINT) AS start_day,
       CAST(MAX(day_no) AS BIGINT) AS end_day,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM islands GROUP BY user_id, island_id, status
ORDER BY user_id, island_id
"""


@query("join_temporal_coalesce", oracle=_COALESCE_SQL)
def join_temporal_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL COALESCE [PK — SQL:2011 / Snodgrass temporal-database
    normalization]: merge ADJACENT same-value validity periods into
    maximal intervals — the compaction every SCD2 pipeline needs
    after upstream systems emit one row per day even when nothing
    changed (scd2_history builds versions; this op normalizes them).
    Daily status per user (deterministic MAX — the registry's
    total-order rule on ties), islands break on status CHANGE or a
    calendar GAP (integer epoch-day arithmetic — day_no ≠ prev+1),
    island ids from the cumulative flag sum, one aggregate to the
    [start, end] form. All integers and strings — exact by
    construction. Scale: one (user, day) aggregate, two window
    passes on one per-user sort, one final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id",
                        F.expr("unix_micros(date_trunc('day', ts))"
                               " div 86400000000").alias("day_no"))
               .agg(F.max("event_type").alias("status")))
    ws = W.partitionBy("user_id").orderBy("day_no")
    prev_s = F.lag("status").over(ws)
    prev_d = F.lag("day_no").over(ws)
    flag = F.when(prev_s.isNull() | (prev_s != F.col("status"))
                  | (prev_d != F.col("day_no") - 1), 1).otherwise(0)
    flagged = daily.select("user_id", "day_no", "status",
                           flag.alias("new_island"))
    wc = ws.rowsBetween(W.unboundedPreceding, 0)
    islands = flagged.select(
        "user_id", "day_no", "status",
        F.sum("new_island").over(wc).cast("long").alias("island_id"))
    return (islands.groupBy("user_id", "island_id", "status")
                   .agg(F.min("day_no").alias("start_day"),
                        F.max("day_no").alias("end_day"),
                        F.count(F.lit(1)).alias("n_days"))
                   .orderBy("user_id", "island_id"))
