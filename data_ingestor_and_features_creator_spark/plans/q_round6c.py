"""Round-6c operator additions: robust statistics, survival analysis,
cross-dialect DISTINCT ON, grid resampling with linear interpolation,
and readability scoring.

Provenance note (SURVEY.md §0 applies — empty reference checkout):
all public-API constructions ([SPARK]/[PK]); no reference code exists
to cite. Robust statistics (trimmed mean, Theil-Sen) are textbook
[PK]; Kaplan-Meier is the standard product-limit estimator [PK];
DISTINCT ON is the PostgreSQL/DuckDB dialect form whose portable
Spark spelling is the row_number window [SPARK].

House rules throughout (plans/registry.py): no RNG, total orders
before any LIMIT, aliases identical on both engines, NaN routed to
NULL before ordered aggregates, normalized stats rounded 6 dp on both
sides.

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dmean, dmean_sql, r6, r6_sql
from .registry import query, scratch_dir


# ---------------------------------------------------------------------------
# Trimmed / winsorized mean per group (two-pass, broadcast fences)
# ---------------------------------------------------------------------------

@query("agg_trimmed_mean", oracle=f"""
WITH v AS (
  SELECT event_type, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
f AS (
  SELECT event_type,
         quantile_cont(value, 0.10) AS p10,
         quantile_cont(value, 0.90) AS p90
  FROM v GROUP BY event_type)
SELECT v.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {r6_sql(dmean_sql('CASE WHEN v.value >= f.p10 AND v.value <= f.p90 THEN v.value END'))}
         AS trimmed_mean,
       {r6_sql(dmean_sql('LEAST(GREATEST(v.value, f.p10), f.p90)'))}
         AS winsorized_mean,
       {r6_sql(dmean_sql('v.value'))} AS raw_mean
FROM v JOIN f ON v.event_type = f.event_type
GROUP BY v.event_type
""")
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% TRIMMED and WINSORIZED means per event_type — the robust
    location estimates that tame heavy tails without discarding the
    whole row like a hard outlier filter: trimming drops values
    outside [p10, p90], winsorizing clamps them to the fences
    (Tukey [PK]). Two-pass shape: pass 1 computes the exact decile
    fences per group (a per-group sort over bounded groups; at 100 TB
    swap quantile_cont for percentile_approx — the fences are the only
    thing that needs the sort), pass 2 re-aggregates with the TINY
    fence table broadcast back onto the rows — the corpus shuffles
    once on the group key and the fence join adds no exchange
    (broadcast, ≤ |event_type| rows). NaN/NULL rows excluded per the
    nulls-hardened semantics; all three means are assembled from
    DECIMAL(38,12) exact sums (dmean/dmean_sql — ADVICE r6: plain AVG
    over doubles is fold-order-dependent and diverges at the 6th dp
    cross-engine) then rounded 6 dp on both engines."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", "value"))
    fences = v.groupBy("event_type").agg(
        F.expr("percentile(value, 0.10)").alias("p10"),
        F.expr("percentile(value, 0.90)").alias("p90"))
    j = v.join(F.broadcast(fences), "event_type")
    clamped = F.least(F.greatest(F.col("value"), F.col("p10")),
                      F.col("p90"))
    inside = F.when((F.col("value") >= F.col("p10"))
                    & (F.col("value") <= F.col("p90")), F.col("value"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        r6(dmean(inside)).alias("trimmed_mean"),
        r6(dmean(clamped)).alias("winsorized_mean"),
        r6(dmean(F.col("value"))).alias("raw_mean"))


# ---------------------------------------------------------------------------
# Theil-Sen robust slope per key (median of pairwise slopes)
# ---------------------------------------------------------------------------

@query("win_theil_sen", oracle="""
WITH v AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (
  SELECT a.user_id,
         (b.value - a.value) / ((b.t - a.t) / 3600000000.0) AS slope
  FROM v a JOIN v b
    ON a.user_id = b.user_id AND a.t < b.t),
m AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
  FROM s GROUP BY user_id)
SELECT * FROM m
""")
def win_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend slope per user: the MEDIAN of all
    pairwise slopes (v_j - v_i) / (t_j - t_i) over the time-ordered
    series, in units per hour [PK]. Immune to outliers that wreck the
    OLS slope (agg_regression_trend): a single wild reading moves OLS
    arbitrarily but shifts at most half the pairwise slopes, and the
    median ignores them. Same-timestamp pairs are excluded (slope
    undefined); NaN/NULL rows excluded per the nulls-hardened
    semantics; the median slope is rounded 6 dp on both engines.

    Scale shape: pairs are generated per key by an equi-join on
    user_id (shuffle on the key, pairs only within a key), so cost is
    sum_k n_k^2 over BOUNDED per-key series — the grouped-series
    regime of win_mann_kendall, NOT an unbounded all-pairs join. For
    single keys with millions of rows, the published refinement is
    repeated-median / sampled-pairs (Siegel [PK]) — same registry
    shape, sampled generator."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("user_id", F.unix_micros("ts").alias("t"),
                   "event_id", "value"))
    a, b = v.alias("a"), v.alias("b")
    pairs = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.t") < F.col("b.t")))
              .select(F.col("a.user_id").alias("user_id"),
                      ((F.col("b.value") - F.col("a.value"))
                       / ((F.col("b.t") - F.col("a.t")) / F.lit(3.6e9)))
                      .alias("slope")))
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6)
         .alias("theil_sen_slope"))


# ---------------------------------------------------------------------------
# DISTINCT ON — the cross-dialect "latest row per key" pin
# ---------------------------------------------------------------------------

@query("sql_distinct_on", oracle="""
SELECT DISTINCT ON (user_id)
       user_id,
       epoch_us(ts) AS t,
       event_id, event_type, value
FROM events
ORDER BY user_id, ts DESC, event_id DESC
""")
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATEST ROW PER KEY — the query every CDC/state-snapshot read
    starts with, pinned across dialects: DuckDB/PostgreSQL spell it
    DISTINCT ON (key) ... ORDER BY key, ts DESC [PK]; Spark has no
    DISTINCT ON, and its portable spelling is the row_number()=1
    window [SPARK] — which is also the scalable one (a single
    hash-partitioned window on the key; with AQE the per-key top-1
    never materializes the full sort, Spark plans a WindowGroupLimit
    pushdown for rank<=k filters). The (ts DESC, event_id DESC)
    tiebreak makes the winner total-order deterministic — bare
    DISTINCT ON with a non-unique order is nondeterministic on BOTH
    engines and can never hash-match (house rule)."""
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id")
          .orderBy(F.col("ts").desc(), F.col("event_id").desc()))
    return (ev.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("user_id", F.unix_micros("ts").alias("t"),
                      "event_id", "event_type", "value"))


# ---------------------------------------------------------------------------
# Grid resampling with LINEAR interpolation (TimescaleDB interpolate analog)
# ---------------------------------------------------------------------------

@query("time_resample_linear", oracle="""
WITH v AS (
  SELECT user_id, epoch_us(ts) AS t, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND user_id <= 20),
b AS (
  SELECT user_id, MIN(t) AS lo, MAX(t) AS hi FROM v GROUP BY user_id),
grid AS (
  SELECT b.user_id, g.g AS t
  FROM b, LATERAL (
    SELECT unnest(generate_series(
      CAST(ceil(b.lo / 900000000.0) AS BIGINT) * 900000000,
      b.hi, 900000000)) AS g) g),
u AS (
  SELECT user_id, t, value, 0 AS is_grid FROM v
  UNION ALL
  SELECT user_id, t, NULL AS value, 1 AS is_grid FROM grid),
f AS (
  SELECT user_id, t, value, is_grid,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, is_grid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, is_grid
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM u)
SELECT user_id, t,
       ROUND(CASE WHEN pt = nt THEN pv
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (t - pt) / (nt - pt)
             END, 6) AS value_interp
FROM f WHERE is_grid = 1
""")
def time_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESAMPLE each user's irregular series onto a 15-minute grid
    with LINEAR interpolation between the bracketing readings — the
    TimescaleDB time_bucket_gapfill + interpolate() analog [PK], and
    the step every spectral/rolling analysis needs before assuming
    uniform spacing (the HRV frequency-domain family resamples RR the
    same way). Grid points at exact 900 s epoch multiples between each
    user's first and last reading; interpolation is the exact affine
    form pv + (nv-pv)*(t-pt)/(nt-pt), identical IEEE fold both
    engines, rounded 6 dp.

    Spark-first shape: generate the grid with sequence() per user
    (one row per key, exploded — no driver loop), UNION with the
    readings tagged is_grid, then ONE window pass per direction
    (last_value IGNORE NULLS forward, first_value IGNORE NULLS
    backward) gives the bracketing (t, value) pairs — no self-join,
    no per-grid-point range probe. Cost: one shuffle on user_id, two
    sorted window passes over (readings + grid) rows. Fixture scope:
    user_id <= 20 keeps the oracle's LATERAL unnest comparable; the
    Spark plan is unbounded."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value")
                   & (F.col("user_id") <= 20))
           .select("user_id", F.unix_micros("ts").alias("t"), "value"))
    step = 900_000_000
    bounds = v.groupBy("user_id").agg(F.min("t").alias("lo"),
                                      F.max("t").alias("hi"))
    # Guard (ADVICE r6): a user whose [lo, hi] span contains NO 900 s
    # grid multiple would make sequence(start, stop) throw
    # IllegalArgumentException (start > stop, positive step) and crash
    # the whole job, while DuckDB's generate_series just returns empty
    # — filter those users out BEFORE sequence so both engines agree
    # (no grid point → no resampled rows for that user).
    g0 = (F.ceil(F.col("lo") / F.lit(float(step))).cast("bigint")
          * F.lit(step))
    grid = (bounds.withColumn("g0", g0)
        .filter(F.col("g0") <= F.col("hi"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("g0"), F.col("hi"),
                                 F.lit(step))).alias("t"))
        .withColumn("value", F.lit(None).cast("double"))
        .withColumn("is_grid", F.lit(1)))
    u = (v.withColumn("is_grid", F.lit(0))
          .select("user_id", "t", "value", "is_grid")
          .unionByName(grid.select("user_id", "t", "value", "is_grid")))
    fwd = (W.partitionBy("user_id").orderBy("t", "is_grid")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    bwd = (W.partitionBy("user_id").orderBy("t", "is_grid")
            .rowsBetween(W.currentRow, W.unboundedFollowing))
    vt = F.when(F.col("value").isNotNull(), F.col("t"))
    f = (u.withColumn("pv", F.last("value", ignorenulls=True).over(fwd))
          .withColumn("pt", F.last(vt, ignorenulls=True).over(fwd))
          .withColumn("nv", F.first("value", ignorenulls=True).over(bwd))
          .withColumn("nt", F.first(vt, ignorenulls=True).over(bwd)))
    interp = (F.when(F.col("pt") == F.col("nt"), F.col("pv"))
               .when(F.col("pv").isNull(), F.col("nv"))
               .when(F.col("nv").isNull(), F.col("pv"))
               .otherwise(F.col("pv") + (F.col("nv") - F.col("pv"))
                          * (F.col("t") - F.col("pt"))
                          / (F.col("nt") - F.col("pt"))))
    return (f.filter(F.col("is_grid") == 1)
             .select("user_id", "t",
                     F.round(interp, 6).alias("value_interp")))


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (product-limit estimator) per cohort
# ---------------------------------------------------------------------------

@query("label_survival_km", oracle="""
WITH first_ev AS (
  SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id),
conv AS (
  SELECT e.user_id, MIN(e.ts) AS tc FROM events e
  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
last_ev AS (
  SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
subj AS (
  SELECT f.user_id,
         CAST(date_diff('day', f.t0,
              COALESCE(c.tc, l.tl)) AS BIGINT) AS dur,
         CASE WHEN c.tc IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM first_ev f
  LEFT JOIN conv c ON f.user_id = c.user_id
  JOIN last_ev l ON f.user_id = l.user_id),
agg AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM subj GROUP BY dur),
risk AS (
  SELECT dur, d, leaving,
         CAST(SUM(leaving) OVER (ORDER BY dur DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_risk
  FROM agg)
SELECT dur AS t_days, d AS events, n_risk,
       CASE WHEN MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
            THEN 0.0
            ELSE ROUND(exp(CAST(SUM(CAST(
                     CASE WHEN d > 0 AND d < n_risk
                          THEN ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
                          ELSE 0.0 END AS DECIMAL(38,12)))
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE)),
             6) END AS survival
FROM risk WHERE d > 0
""")
def label_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER product-limit survival curve for time-to-first-
    purchase [PK] — the censoring-aware answer to "how long until a
    user converts" that a naive avg(days-to-purchase) gets wrong (it
    silently drops never-converters; KM keeps them at risk until
    their last observed event, then censors). Duration = days from a
    user's first event to first purchase (event) or last event
    (censored). S(t) = prod_{t_i <= t} (1 - d_i / n_i) over distinct
    event days, computed as exp(cumsum(ln(1 - d/n))) on BOTH engines —
    each ln step PINNED to 9 dp and the cumsum routed through
    DECIMAL(38,12) (per-row libm ln drifts 1 ulp cross-engine and
    float window sums are fold-order-dependent — the q_round6d
    pinned-log discipline), rounded 6 dp. n_at_risk is the reverse cumulative count
    of subjects leaving — an exact integer window, no self-join.

    Scale shape: subjects reduce to ONE row per user (three partial
    aggregates over the events scan, joined on user_id), then the
    curve is a per-day rollup (bounded by the date span) and two
    ordered windows over that TINY table — the 100 TB cost is the
    user-level aggregate, everything after is dashboard-sized."""
    ev = load_table(spark, sf_dir, "events")
    first_ev = ev.groupBy("user_id").agg(F.min("ts").alias("t0"),
                                         F.max("ts").alias("tl"))
    conv = (ev.filter(F.col("event_type") == "purchase")
              .groupBy("user_id").agg(F.min("ts").alias("tc")))
    subj = (first_ev.join(conv, "user_id", "left")
            .select("user_id",
                    F.datediff(F.to_date(F.coalesce("tc", "tl")),
                               F.to_date("t0")).cast("bigint")
                    .alias("dur"),
                    F.when(F.col("tc").isNotNull(), 1).otherwise(0)
                    .alias("ev")))
    agg = subj.groupBy("dur").agg(F.sum("ev").alias("d"),
                                  F.count(F.lit(1)).alias("leaving"))
    w_desc = (W.orderBy(F.col("dur").desc())
               .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_asc = (W.orderBy("dur")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    risk = agg.withColumn("n_risk", F.sum("leaving").over(w_desc))
    # Each log step is PINNED to 9 dp and the cumulative sum runs
    # through DECIMAL(38,12) (ADVICE r6, q_round6d discipline):
    # per-row libm ln drifts 1 ulp cross-engine, and an unpinned float
    # window sum is fold-order-dependent — either can push the 6-dp
    # rounded survival across a boundary between engines.
    step = (F.when((F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
                   F.round(F.log(F.lit(1.0) - F.col("d").cast("double")
                                 / F.col("n_risk")), 9))
             .otherwise(F.lit(0.0)))
    hit_zero = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)).over(w_asc)
    cum = (F.sum(step.cast("decimal(38,12)")).over(w_asc)
            .cast("double"))
    surv = (F.when(hit_zero == 1, F.lit(0.0))
             .otherwise(F.round(F.exp(cum), 6)))
    return (risk.withColumn("survival", surv)
                .filter(F.col("d") > 0)
                .select(F.col("dur").alias("t_days"),
                        F.col("d").alias("events"), "n_risk", "survival"))


# ---------------------------------------------------------------------------
# Readability scoring (vowel-group syllable proxy, shared regex)
# ---------------------------------------------------------------------------

@query("text_readability", oracle="""
WITH s AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
           AS words,
         CAST(GREATEST(length(regexp_extract_all(text, '[.!?]+')), 1)
           AS BIGINT) AS sentences,
         CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
           AS BIGINT) AS syllables
  FROM documents),
f AS (SELECT * FROM s WHERE words > 0)
SELECT doc_id, words, sentences, syllables,
       ROUND(206.835
             - 1.015 * (CAST(words AS DOUBLE) / sentences)
             - 84.6 * (CAST(syllables AS DOUBLE) / words), 6)
         AS flesch_ease
FROM f
""")
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING-EASE per document with the classic vowel-group
    syllable proxy [PK]: words = runs of [A-Za-z], sentences = runs
    of terminal punctuation (floored at 1), syllables = runs of
    vowels in the lowercased text — all three are exact integers from
    the SAME regex on both engines (character-class-only patterns sit
    in the Java-regex/RE2 common subset, the data_url_canonicalize
    rule), so the only float work is the final linear combination,
    folded identically and rounded 6 dp. The quality-filter family's
    readability axis: Gopher-style pipelines (text_gopher_quality)
    gate on symbol/word ratios; Flesch adds the sentence-length and
    syllable-density axes that separate listy boilerplate from prose.

    Scale shape: embarrassingly parallel row-map over the documents
    scan (regexp_count is JVM codegen — no UDF), zero shuffles; the
    filter words > 0 prunes empty/whitespace docs (nulls-gate
    semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.regexp_count("text", F.lit(r"[A-Za-z]+")).cast("bigint")
    sents = F.greatest(
        F.regexp_count("text", F.lit(r"[.!?]+")).cast("bigint"),
        F.lit(1).cast("bigint"))
    syll = F.regexp_count(F.lower("text"),
                          F.lit(r"[aeiouy]+")).cast("bigint")
    s = docs.select("doc_id", words.alias("words"),
                    sents.alias("sentences"), syll.alias("syllables"))
    f = s.filter(F.col("words") > 0)
    ease = (F.lit(206.835)
            - F.lit(1.015) * (F.col("words").cast("double")
                              / F.col("sentences"))
            - F.lit(84.6) * (F.col("syllables").cast("double")
                             / F.col("words")))
    return f.withColumn("flesch_ease", F.round(ease, 6))


# ---------------------------------------------------------------------------
# Geometric mean per group (decimal-routed log sum)
# ---------------------------------------------------------------------------

@query("agg_geometric_mean", oracle="""
WITH v AS (
  SELECT event_type, ROUND(ln(value), 9) AS l, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND value > 0)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(exp(CAST(SUM(CAST(l AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*)), 6) AS geo_mean,
       ROUND(AVG(value), 6) AS arith_mean
FROM v GROUP BY event_type
""")
def agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRIC MEAN per event_type — the correct average for
    multiplicative quantities (growth factors, ratios, latency
    multipliers [PK]), completing the Pythagorean-means trio next to
    agg_basic (arithmetic) and agg_harmonic_mean. The libm discipline
    applied to an unavoidably-log op: ln is evaluated ONCE per row and
    immediately pinned to 9 dp (a 1-ulp cross-engine ln drift only
    matters if it straddles a 9-dp boundary — measure-zero), then the
    pinned values take the DECIMAL(38,12) exact-sum path, so the fold
    order can't drift and the single exp at the end sees bit-identical
    input on both engines. Positive values only (domain of ln);
    NULL/NaN excluded per the nulls-hardened semantics. One map-side-
    combined hash aggregate — the same scale shape as agg_basic."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value")
                   & (F.col("value") > 0))
           .select("event_type",
                   F.round(F.log("value"), 9).alias("l"), "value"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.exp(F.sum(F.col("l").cast("decimal(38,12)"))
                       .cast("double") / F.count(F.lit(1))), 6)
         .alias("geo_mean"),
        F.round(F.avg("value"), 6).alias("arith_mean"))


# ---------------------------------------------------------------------------
# DAU / trailing-28-day MAU / stickiness
# ---------------------------------------------------------------------------

@query("agg_dau_mau_stickiness", oracle="""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day),
span AS (
  SELECT du.user_id, du.day + CAST(o.o AS INTEGER) AS day
  FROM du, LATERAL (SELECT unnest(generate_series(0, 27)) AS o) o),
mau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM span GROUP BY day)
SELECT dau.day, dau.dau, mau.mau,
       ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
""")
def agg_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-28-day MAU / STICKINESS per day — the product-
    analytics headline ratio [PK]. The sliding distinct is computed
    WITHOUT a distinct-over-range window (Spark has none) and WITHOUT
    a range join: each distinct (day, user) pair is exploded to the 28
    future days it keeps the user "monthly active" for, turning the
    sliding-window distinct into a plain equi-groupBy distinct — the
    fan-out is exactly 28x the DISTINCT pair table (users x days, NOT
    raw events), every key is an equi-key (AQE-splittable), and no
    nested-loop join ever appears. Days with no activity are dropped
    by the inner join back to dau (stickiness is undefined there).
    At 100 TB the same shape holds, or swap the distinct for per-day
    HLL sketches union-merged over the 28-day window
    (agg_hll_sketch_merge is that primitive)."""
    ev = load_table(spark, sf_dir, "events")
    du = (ev.select(F.to_date("ts").alias("day"), "user_id").distinct())
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    span = (du.select("user_id",
                      F.explode(F.sequence(F.lit(0), F.lit(27))).alias("o"),
                      "day")
              .select("user_id", F.date_add("day", F.col("o")).alias("day")))
    mau = (span.groupBy("day")
               .agg(F.countDistinct("user_id").alias("mau")))
    return (dau.join(mau, "day")
               .select("day", "dau", "mau",
                       F.round(F.col("dau").cast("double") / F.col("mau"), 6)
                        .alias("stickiness")))


# ---------------------------------------------------------------------------
# RFM quintile scoring per customer
# ---------------------------------------------------------------------------

@query("feature_rfm_scores", oracle="""
WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
base AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                   (SELECT ref_day FROM ref)) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY o_custkey),
s AS (
  SELECT *,
         CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
              AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency ASC, o_custkey)
              AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary ASC, o_custkey)
              AS BIGINT) AS m_score
  FROM base)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, ROUND(monetary, 6) AS monetary,
       r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS rfm_segment
FROM s
""")
def feature_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) QUINTILE SCORING per
    customer — the classic segmentation feature block [PK] every CRM
    and churn model starts from. Recency = days from the customer's
    last order to the corpus frontier (max order date — never now():
    reproducible, backfill-meaningful, the audit_source_freshness
    rule); monetary runs through the DECIMAL exact-sum path. Scores
    are ntile(5) with the custkey tiebreak making every quintile
    boundary total-order deterministic (bare ntile over ties is
    partition-order-dependent and can never hash-match — the house
    rule applied to ranking features). Scale shape: one aggregate
    over orders (map-side partials), then three ntile windows over the
    CUSTOMER-grain table; a global ntile is a single-partition sort at
    extreme scale — the documented swap is percentile-fence bucketing
    (agg_percentile_exact_scalable's two-pass fences) which this
    op's output is pinned against."""
    od = load_table(spark, sf_dir, "orders")
    ref = od.agg(F.max(F.to_date("o_orderdate")).alias("ref_day"))
    base = (od.groupBy("o_custkey")
              .agg(F.max(F.to_date("o_orderdate")).alias("last_day"),
                   F.count(F.lit(1)).alias("frequency"),
                   F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
                    .cast("double").alias("monetary"))
              .crossJoin(F.broadcast(ref))
              .select("o_custkey",
                      F.datediff("ref_day", "last_day").cast("bigint")
                       .alias("recency_days"),
                      "frequency", "monetary"))
    r_w = W.orderBy(F.col("recency_days").desc(), "o_custkey")
    f_w = W.orderBy(F.col("frequency").asc(), "o_custkey")
    m_w = W.orderBy(F.col("monetary").asc(), "o_custkey")
    s = (base.withColumn("r_score", F.ntile(5).over(r_w).cast("bigint"))
             .withColumn("f_score", F.ntile(5).over(f_w).cast("bigint"))
             .withColumn("m_score", F.ntile(5).over(m_w).cast("bigint")))
    return s.select(
        "o_custkey", "recency_days", "frequency",
        F.round("monetary", 6).alias("monetary"),
        "r_score", "f_score", "m_score",
        F.concat(F.col("r_score").cast("string"),
                 F.col("f_score").cast("string"),
                 F.col("m_score").cast("string")).alias("rfm_segment"))


# ---------------------------------------------------------------------------
# Sorted-clustered sink (the write-side half of row-group pruning)
# ---------------------------------------------------------------------------

@query("sink_sorted_clustered", oracle="""
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE)
         AS total_price,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_key
FROM lineitem GROUP BY l_returnflag
""")
def sink_sorted_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORT-CLUSTERED WRITE — the write-side half of the row-group-
    pruning story scan_parquet_footer_stats audits from the read side:
    repartition(l_orderkey) then sortWithinPartitions(l_orderkey)
    before the parquet write, so every row group's (min, max) key
    range is TIGHT and a later key-range scan can skip most groups on
    footer stats alone [SPARK]. (cluster_zorder is the multi-column
    sibling; this is the single-key form every fact-table landing job
    should default to.) The read-back aggregate equals the source —
    the oracle proves the clustered round trip is lossless; the
    footer-monotonicity itself is asserted in tests/test_plan_shape
    (pyarrow row-group stats non-overlapping within each file)."""
    import os
    li = load_table(spark, sf_dir, "lineitem")
    out = os.path.join(scratch_dir("sink_sorted_clustered"), "lineitem")
    (li.repartition(4, "l_orderkey")
       .sortWithinPartitions("l_orderkey")
       .write.mode("overwrite").parquet(out))
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,12)"))
         .cast("double").alias("total_price"),
        F.min("l_orderkey").cast("bigint").alias("min_key"),
        F.max("l_orderkey").cast("bigint").alias("max_key"))


# ---------------------------------------------------------------------------
# Bollinger bands (rolling mean +/- 2 sigma, decimal frame sums)
# ---------------------------------------------------------------------------

_BOLL_FRAME = 19  # trailing rows -> 20-row frame


def _boll_sum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,12))) OVER w AS DOUBLE)"


@query("win_bollinger_bands", oracle=f"""
WITH v AS (
  SELECT event_id, user_id, ts, value AS x FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
q AS (
  SELECT event_id, user_id, x,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         {_boll_sum_sql('x')} AS s1,
         {_boll_sum_sql('x * x')} AS s2
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_BOLL_FRAME} PRECEDING AND CURRENT ROW)),
b AS (
  SELECT event_id, user_id, x, n,
         s1 / n AS mid,
         CASE WHEN n >= 2 AND (s2 - s1 * s1 / n) > 0
              THEN sqrt((s2 - s1 * s1 / n) / (n - 1)) END AS sd
  FROM q)
SELECT event_id, user_id,
       ROUND(mid, 6) AS mid,
       ROUND(mid + 2 * sd, 6) AS upper_band,
       ROUND(mid - 2 * sd, 6) AS lower_band,
       COALESCE(x > mid + 2 * sd, false) AS above,
       COALESCE(x < mid - 2 * sd, false) AS below
FROM b
""")
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOLLINGER BANDS per user — rolling mean ± 2σ over a trailing
    20-row frame with breakout flags [PK]: the variance-based band
    monitor completing the rolling family (win_rolling_envelope is
    the order-statistic Donchian band — forgets magnitude; this one
    weights it). Both frame sums (Σx, Σx²) run through DECIMAL in ONE
    window spec (the win_rolling_corr pattern), the band assembly is
    scalar IEEE + sqrt (exact), breach flags compare the UNROUNDED
    band (bit-identical cross-engine by construction) and are
    COALESCEd to false (nullable-boolean house rule); degenerate
    frames (n<2 or zero variance) emit NULL bands and false flags.
    One shuffle on user_id; both sums and the flags share the sort."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & ~F.isnan("value")))
    x = F.col("value")
    # Round 12: O(n·W) sliding decimal sums → O(n) prefix differences
    # (functions/rollfast.py; exact, oracle keeps the windowed SQL).
    from ..functions.rollfast import trailing_agg
    base = ev.select("event_id", "user_id", "ts", x.alias("x"))
    xx = F.col("x")
    qa = trailing_agg(base, ["user_id"], ["ts", "event_id"],
                      (-_BOLL_FRAME, 0),
                      sums={"s1d": xx.cast("decimal(38,12)"),
                            "s2d": (xx * xx).cast("decimal(38,12)")},
                      count_star="nl")
    q = qa.select("event_id", "user_id", "x",
                  F.col("nl").cast("double").alias("n"),
                  F.col("s1d").cast("double").alias("s1"),
                  F.col("s2d").cast("double").alias("s2"))
    mid = F.col("s1") / F.col("n")
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    sd = F.when((F.col("n") >= 2) & (var_num > 0),
                F.sqrt(var_num / (F.col("n") - 1)))
    b = q.select("event_id", "user_id", "x", mid.alias("mid"),
                 sd.alias("sd"))
    up = F.col("mid") + 2 * F.col("sd")
    lo = F.col("mid") - 2 * F.col("sd")
    return b.select(
        "event_id", "user_id",
        F.round("mid", 6).alias("mid"),
        F.round(up, 6).alias("upper_band"),
        F.round(lo, 6).alias("lower_band"),
        F.coalesce(F.col("x") > up, F.lit(False)).alias("above"),
        F.coalesce(F.col("x") < lo, F.lit(False)).alias("below"))
