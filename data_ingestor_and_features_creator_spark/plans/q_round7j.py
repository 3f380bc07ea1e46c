"""Round-7j operator additions: Nelson-Aalen cumulative hazard,
Hodges-Lehmann pseudo-median, balanced class weights, and the
Durbin-Watson residual-autocorrelation statistic.

Provenance (SURVEY.md §0 applies — empty reference checkout):
Nelson-Aalen is the standard counting-process hazard estimator [PK];
Hodges-Lehmann is the classic robust location estimator [PK];
balanced class weights n/(k·n_c) are the published scikit-learn
convention [PK]; Durbin-Watson is DW 1950 [PK].

Float discipline: the NA cumulative hazard is a cumsum of exact
rationals through string-routed DECIMAL; Hodges-Lehmann medians are
exact interpolated quantiles over exact .5-rational Walsh averages;
class weights and DW are exact-rational arithmetic emitted UNROUNDED
(win_vwap convention), with DW's residual sums fully string-routed
(cancellation class).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum_str, dsum_str_sql
from .registry import query

_DEC = "decimal(38,12)"


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (the KM sibling)
# ---------------------------------------------------------------------------

@query("label_cumhazard_nelson_aalen", oracle="""
WITH first_ev AS (
  SELECT user_id, MIN(ts) AS t0, MAX(ts) AS tl FROM events
  GROUP BY user_id),
conv AS (
  SELECT user_id, MIN(ts) AS tc FROM events
  WHERE event_type = 'purchase' GROUP BY user_id),
subj AS (
  SELECT f.user_id,
         CAST(date_diff('day', CAST(f.t0 AS DATE),
              CAST(COALESCE(c.tc, f.tl) AS DATE)) AS BIGINT) AS dur,
         CASE WHEN c.tc IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM first_ev f LEFT JOIN conv c ON f.user_id = c.user_id),
agg AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM subj GROUP BY dur),
risk AS (
  SELECT dur, d,
         CAST(SUM(leaving) OVER (ORDER BY dur DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_risk
  FROM agg)
SELECT dur AS t_days, d AS events, n_risk,
       CAST(SUM(CAST(CAST(CAST(d AS DOUBLE) / n_risk AS VARCHAR)
                AS DECIMAL(38,12)))
            OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cum_hazard
FROM risk WHERE d > 0
""")
def label_cumhazard_nelson_aalen(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative hazard [PK — the counting-process
    sibling of label_survival_km]: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over event
    days — the estimator whose INCREMENTS are interpretable as
    instantaneous conversion risk (and whose exp(−H) is the
    Fleming-Harrington survival curve, more stable than KM in small
    risk sets). Same subject construction as KM (first event →
    purchase-or-censor); the hazard increments dᵢ/nᵢ are exact
    rationals of integers (bit-identical cross-engine), and the
    cumulative sum runs through STRING-ROUTED DECIMAL (the
    fold-order rule for window sums of full-precision doubles),
    emitted UNROUNDED — NO libm anywhere, which is exactly the
    advantage over KM's log-space product here. Subjects reduce to
    one row per user; the curve is date-span-sized."""
    ev = load_table(spark, sf_dir, "events")
    first_ev = ev.groupBy("user_id").agg(F.min("ts").alias("t0"),
                                         F.max("ts").alias("tl"))
    conv = (ev.filter(F.col("event_type") == "purchase")
              .groupBy("user_id").agg(F.min("ts").alias("tc")))
    subj = (first_ev.join(conv, "user_id", "left")
            .select(F.datediff(F.to_date(F.coalesce("tc", "tl")),
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
    inc = F.col("d").cast("double") / F.col("n_risk")
    return (risk
            .withColumn("cum_hazard",
                        F.sum(inc.cast("string").cast(_DEC)).over(w_asc)
                        .cast("double"))
            .filter(F.col("d") > 0)
            .select(F.col("dur").alias("t_days"),
                    F.col("d").alias("events"), "n_risk", "cum_hazard"))


# ---------------------------------------------------------------------------
# Hodges-Lehmann pseudo-median per group
# ---------------------------------------------------------------------------

@query("agg_hodges_lehmann", oracle="""
WITH v AS (
  SELECT event_type, event_id, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND user_id <= 60),
walsh AS (
  SELECT a.event_type, (a.value + b.value) / 2.0 AS w
  FROM v a JOIN v b
    ON a.event_type = b.event_type AND a.event_id <= b.event_id)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       quantile_cont(w, 0.5) AS hodges_lehmann
FROM walsh GROUP BY event_type
""")
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HODGES-LEHMANN pseudo-median [PK — the location estimator of
    the Wilcoxon world]: the median of all pairwise WALSH AVERAGES
    (xᵢ+xⱼ)/2 over i ≤ j (event_id as the unique total order — a
    value-based tiebreak would double-count ties) — more efficient
    than the sample median under near-
    normality while keeping a 29% breakdown point, and the natural
    point estimate to report next to agg_mannwhitney_u /
    stat_rank_biserial. Walsh averages are exact half-sums of doubles
    (IEEE-identical), the median is the exact interpolated quantile
    (Spark percentile ≡ DuckDB quantile_cont), emitted UNROUNDED.
    Scale honesty: pairs are quadratic, so the op runs on a BOUNDED
    cohort (user_id ≤ 60 — identical filter text both engines), the
    grouped-pair-join regime win_theil_sen documents; the published
    large-n route is the Monahan selection algorithm or a
    sampled-pairs estimate — same registry shape, sampled generator."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value")
                   & (F.col("user_id") <= 60))
           .select("event_type", "event_id", "value"))
    a = v.select("event_type", F.col("event_id").alias("ea"),
                 F.col("value").alias("va"))
    b = v.select("event_type", F.col("event_id").alias("eb"),
                 F.col("value").alias("vb"))
    walsh = (a.join(b, "event_type")
             .filter(F.col("ea") <= F.col("eb"))
             .select("event_type",
                     ((F.col("va") + F.col("vb")) / 2.0).alias("w")))
    return (walsh.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.expr("percentile(w, 0.5)").alias("hodges_lehmann")))


# ---------------------------------------------------------------------------
# Balanced class weights (the imbalance corrector)
# ---------------------------------------------------------------------------

@query("data_class_weight_balanced", oracle="""
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_c
  FROM events GROUP BY event_type),
t AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k FROM c)
SELECT c.event_type, c.n_c,
       CAST(t.n AS DOUBLE) / (t.k * c.n_c) AS weight,
       CAST(c.n_c AS DOUBLE) * (CAST(t.n AS DOUBLE) / (t.k * c.n_c))
         AS effective_mass
FROM c, t
""")
def data_class_weight_balanced(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """BALANCED CLASS WEIGHTS [PK — the scikit-learn
    class_weight='balanced' convention]: w_c = n / (k·n_c), the
    inverse-frequency weights that make every class contribute equal
    total mass to a loss — emitted with the per-class effective mass
    (= n/k for every class, the built-in self-check that also pins
    the cross-engine arithmetic: if the two engines' weights diverged
    at all, the constant-mass column would diverge visibly). Exact
    integer counts; weights are exact-rational quotients computed
    with identical operation order, UNROUNDED. One aggregate + a
    broadcast scalar — the cheapest preprocessing op there is, and
    the one skipping which silently biases every imbalanced fixture
    trained at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_c"))
    t = c.agg(F.sum("n_c").alias("n"), F.count(F.lit(1)).alias("k"))
    j = c.crossJoin(F.broadcast(t))
    w = F.col("n").cast("double") / (F.col("k") * F.col("n_c"))
    return j.select("event_type", "n_c", w.alias("weight"),
                    (F.col("n_c").cast("double") * w)
                    .alias("effective_mass"))


# ---------------------------------------------------------------------------
# Durbin-Watson residual autocorrelation per user
# ---------------------------------------------------------------------------

@query("ts_durbin_watson", oracle=f"""
WITH v AS (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_str_sql('CAST(t AS DOUBLE)')} AS sx,
         {dsum_str_sql('value')} AS sy,
         {dsum_str_sql('CAST(t AS DOUBLE) * CAST(t AS DOUBLE)')} AS sxx,
         {dsum_str_sql('CAST(t AS DOUBLE) * value')} AS sxy
  FROM v GROUP BY user_id),
fit AS (
  SELECT user_id,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx / n
           AS a
  FROM s WHERE n >= 10 AND n * sxx - sx * sx > 0),
res AS (
  SELECT v.user_id, v.t,
         v.value - f.a - f.b * v.t AS e
  FROM v JOIN fit f ON v.user_id = f.user_id),
d AS (
  SELECT user_id, t, e,
         e - LAG(e) OVER (PARTITION BY user_id ORDER BY t) AS de
  FROM res)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CASE WHEN {dsum_str_sql('e * e')} > 0 THEN
         {dsum_str_sql('de * de')} / {dsum_str_sql('e * e')}
       END AS durbin_watson
FROM d GROUP BY user_id
""")
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DURBIN-WATSON statistic (DW 1950 [PK]) per user: DW =
    Σ(eₜ−eₜ₋₁)²/Σeₜ² over the residuals of the value-on-rank OLS
    detrend — ≈2 means white residuals, →0 positive autocorrelation,
    →4 negative. The diagnostic that tells you whether
    agg_regression_trend's OLS standard errors can be believed (they
    assume DW≈2) and whether ts_adf_stat needs augmentation lags.
    Construction is a three-pass window/aggregate composition sharing
    ONE user exchange: rank window → OLS coefficients from
    STRING-ROUTED decimal sums (the n·Σxy − ΣxΣy cancellation
    class) → residuals via the broadcast-back coefficient join →
    lagged-difference sums, again string-routed (Σde² − as a ratio
    against Σe² both full-precision). DW is a quotient of
    bit-identical doubles, UNROUNDED; short/degenerate series NULL
    out per the house policy."""
    ev = load_table(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("user_id", "value",
                   F.row_number().over(wo).alias("t")))
    td = F.col("t").cast("double")
    s = v.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum_str(td).alias("sx"), dsum_str("value").alias("sy"),
        dsum_str(td * td).alias("sxx"),
        dsum_str(td * F.col("value")).alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a_ = sy / n - b * sx / n
    fit = (s.filter((n >= 10) & (n * sxx - sx * sx > 0))
            .select("user_id", b.alias("b"), a_.alias("a")))
    res = (v.join(F.broadcast(fit), "user_id")
            .select("user_id", "t",
                    (F.col("value") - F.col("a")
                     - F.col("b") * F.col("t")).alias("e")))
    wlag = W.partitionBy("user_id").orderBy("t")
    d = res.select("user_id", "e",
                   (F.col("e") - F.lag("e").over(wlag)).alias("de"))
    dw = F.when(dsum_str(F.col("e") * F.col("e")) > 0,
                dsum_str(F.col("de") * F.col("de"))
                / dsum_str(F.col("e") * F.col("e")))
    return (d.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_obs"),
                 dw.alias("durbin_watson")))