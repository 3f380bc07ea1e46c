"""Round-11 operator batch R (SURVEY.md §2 growth): Engle-Granger
cointegration, DerSimonian-Laird meta-analysis, Cronbach's alpha,
and deterministic permutation feature importance.

Provenance ([PK], empty reference checkout — SURVEY §0): Engle &
Granger 1987 (two-step cointegration; Dickey-Fuller 1979 residual
test, zero-lag no-constant form); DerSimonian & Laird 1986
(random-effects meta-analysis); Cronbach 1951 (coefficient alpha);
Breiman 2001 (permutation importance — here a deterministic
hash-ordered within-bucket permutation instead of randomness).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query

# ---------------------------------------------------------------------------
# Engle-Granger two-step cointegration test
# ---------------------------------------------------------------------------

_EG_Y, _EG_X = "click", "view"

_EG_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
pair AS (
  SELECT a.d, a.x AS y, b.x AS x
  FROM daily a JOIN daily b USING (d)
  WHERE a.event_type = '{_EG_Y}' AND b.event_type = '{_EG_X}'),
ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * x')} AS sxx, {dsum_sql('x * y')} AS sxy
  FROM pair),
fit AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS a
  FROM ols),
resid AS (
  SELECT p.d, p.y - (fit.a + fit.b * p.x) AS e FROM pair p, fit),
lagged AS (
  SELECT e, LAG(e) OVER (ORDER BY d) AS e1 FROM resid),
adf AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         {dsum_sql('e1 * (e - e1)')} AS num,
         {dsum_sql('e1 * e1')} AS den,
         {dsum_sql('(e - e1) * (e - e1)')} AS sdd
  FROM lagged WHERE e1 IS NOT NULL),
st AS (
  SELECT m, num / den AS rho, den,
         (sdd - num * num / den) / (m - 1) AS s2
  FROM adf)
SELECT fit.n, {r6_sql('fit.a')} AS alpha, {r6_sql('fit.b')} AS beta,
       {r6_sql('st.rho')} AS rho,
       {r6_sql('st.rho / SQRT(st.s2 / st.den)')} AS adf_t
FROM fit, st
"""


@query("ts_cointegration_engle", oracle=_EG_SQL)
def ts_cointegration_engle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGLE-GRANGER TWO-STEP COINTEGRATION TEST [PK — Engle &
    Granger 1987]: do the 'click' and 'view' daily series share a
    common stochastic trend?  Step 1: the cointegrating OLS
    y = a + b·x in closed form; step 2: the zero-lag Dickey-Fuller
    regression Δe_t = ρ·e_{{t−1}} on the residuals — strongly negative
    t(ρ) = ρ/se(ρ) means the spread MEAN-REVERTS, the statistical
    basis of pairs monitoring, and the cross-series complement of
    ts_adf_stat (one series) and ts_kpss_stat (reversed null).  Every
    sum is DECIMAL-exact; the residual lag runs in a
    day-ordered window over the day-domain-bounded joined series.
    Scale: facts collapse to (type, day); one self-join on day, two
    aggregates, one bounded window."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("x")))
    a = daily.filter(F.col("event_type") == _EG_Y).select(
        "d", F.col("x").alias("y"))
    b = daily.filter(F.col("event_type") == _EG_X).select(
        "d", F.col("x").alias("x"))
    pair = a.join(b, "d")
    pair = pair.cache()
    ols = pair.agg(F.count(F.lit(1)).cast("long").alias("n"),
                   dsum("x").alias("sx"), dsum("y").alias("sy"),
                   dsum(F.col("x") * F.col("x")).alias("sxx"),
                   dsum(F.col("x") * F.col("y")).alias("sxy"))
    bb = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
          / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    aa = (F.col("sy") - bb * F.col("sx")) / F.col("n")
    fit = ols.select("n", bb.alias("b"), aa.alias("a"))
    resid = (pair.crossJoin(F.broadcast(fit))
                 .select("d", (F.col("y")
                               - (F.col("a") + F.col("b")
                                  * F.col("x"))).alias("e")))
    # Day-domain-bounded series: the single-partition window frame is
    # the joined calendar, not raw facts.
    wl = W.partitionBy(F.lit(1)).orderBy("d")
    lagged = resid.select("e", F.lag("e").over(wl).alias("e1"))
    adf = (lagged.filter(F.col("e1").isNotNull())
                 .agg(F.count(F.lit(1)).cast("long").alias("m"),
                      dsum(F.col("e1") * (F.col("e") - F.col("e1")))
                       .alias("num"),
                      dsum(F.col("e1") * F.col("e1")).alias("den"),
                      dsum((F.col("e") - F.col("e1"))
                           * (F.col("e") - F.col("e1"))).alias("sdd")))
    rho = F.col("num") / F.col("den")
    s2 = (F.col("sdd") - F.col("num") * F.col("num") / F.col("den")) \
        / (F.col("m") - 1)
    st = adf.select("m", rho.alias("rho"), F.col("den").alias("den"),
                    s2.alias("s2"))
    return (fit.crossJoin(F.broadcast(st))
               .select("n", r6(F.col("a")).alias("alpha"),
                       r6(F.col("b")).alias("beta"),
                       r6(F.col("rho")).alias("rho"),
                       r6(F.col("rho")
                          / F.sqrt(F.col("s2") / F.col("den")))
                       .alias("adf_t")))


# ---------------------------------------------------------------------------
# DerSimonian-Laird random-effects meta-analysis
# ---------------------------------------------------------------------------

_DL_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
halves AS (
  SELECT event_type,
         CASE WHEN EXTRACT(DAY FROM d) >= 16 THEN 1 ELSE 0 END AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS s1, {dsum_sql('x * x')} AS s2
  FROM daily GROUP BY 1, 2),
study AS (
  SELECT a.event_type,
         a.s1 / a.n - b.s1 / b.n AS theta,
         ((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1)) / a.n
           + ((b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1)) / b.n AS v
  FROM halves a JOIN halves b USING (event_type)
  WHERE a.h = 1 AND b.h = 0),
fixed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         {dsum_sql('theta / v')} AS swt,
         {dsum_sql('1.0 / v')} AS sw,
         {dsum_sql('1.0 / (v * v)')} AS sw2
  FROM study),
qstat AS (
  SELECT f.k, f.sw, f.sw2, f.swt / f.sw AS tf,
         (SELECT {dsum_sql('(s.theta - f2.swt / f2.sw)'
                           ' * (s.theta - f2.swt / f2.sw) / s.v')}
          FROM study s, fixed f2) AS q
  FROM fixed f),
tau AS (
  SELECT k, tf, sw, q,
         GREATEST(0.0, (q - (k - 1)) / (sw - sw2 / sw)) AS tau2
  FROM qstat),
rand AS (
  SELECT t.k, t.tf, t.sw, t.q, t.tau2,
         (SELECT {dsum_sql('s.theta / (s.v + t2.tau2)')}
          FROM study s, tau t2) AS swt_r,
         (SELECT {dsum_sql('1.0 / (s.v + t2.tau2)')}
          FROM study s, tau t2) AS sw_r
  FROM tau t)
SELECT k, {r6_sql('tf')} AS theta_fixed,
       {r6_sql('1.0 / SQRT(sw)')} AS se_fixed,
       {r6_sql('q')} AS q_stat, {r6_sql('tau2')} AS tau2,
       {r6_sql('swt_r / sw_r')} AS theta_random,
       {r6_sql('1.0 / SQRT(sw_r)')} AS se_random
FROM rand
"""


@query("stat_meta_dersimonian_laird", oracle=_DL_SQL)
def stat_meta_dersimonian_laird(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """DERSIMONIAN-LAIRD RANDOM-EFFECTS META-ANALYSIS [PK —
    DerSimonian & Laird 1986]: treat each event type as a 'study'
    whose effect is the late-month minus early-month mean shift
    (variance s₁²/n₁ + s₂²/n₂), then pool: the fixed-effect
    inverse-variance mean, Cochran's Q heterogeneity, the method-of-
    moments between-study variance τ² = max(0, (Q−(k−1))/(Σw −
    Σw²/Σw)), and the random-effects re-pooling with weights
    1/(v+τ²) — the standard machinery for combining per-segment A/B
    effects WITHOUT pretending segments share one true effect (what a
    naive pooled mean assumes; τ² quantifies how much they differ).
    All moments are DECIMAL-exact; the pooling is study-domain-
    bounded.  Scale: facts collapse to (type, day) then to 2k half
    rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("x")))
    halves = (daily.groupBy("event_type",
                            F.when(F.dayofmonth("d") >= 16, 1)
                             .otherwise(0).alias("h"))
                   .agg(F.count(F.lit(1)).cast("long").alias("n"),
                        dsum("x").alias("s1"),
                        dsum(F.col("x") * F.col("x")).alias("s2")))
    a = halves.filter(F.col("h") == 1).select(
        "event_type", F.col("n").alias("n1"), F.col("s1").alias("a1"),
        F.col("s2").alias("a2"))
    b = halves.filter(F.col("h") == 0).select(
        "event_type", F.col("n").alias("n0"), F.col("s1").alias("b1"),
        F.col("s2").alias("b2"))
    va = ((F.col("a2") - F.col("a1") * F.col("a1") / F.col("n1"))
          / (F.col("n1") - 1)) / F.col("n1")
    vb = ((F.col("b2") - F.col("b1") * F.col("b1") / F.col("n0"))
          / (F.col("n0") - 1)) / F.col("n0")
    study = (a.join(b, "event_type")
              .select("event_type",
                      (F.col("a1") / F.col("n1")
                       - F.col("b1") / F.col("n0")).alias("theta"),
                      (va + vb).alias("v")))
    study = study.cache()
    fixed = study.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        dsum(F.col("theta") / F.col("v")).alias("swt"),
        dsum(1.0 / F.col("v")).alias("sw"),
        dsum(1.0 / (F.col("v") * F.col("v"))).alias("sw2"))
    tf = F.col("swt") / F.col("sw")
    q = (study.crossJoin(F.broadcast(fixed))
              .agg(dsum((F.col("theta") - tf) * (F.col("theta") - tf)
                        / F.col("v")).alias("q")))
    base = fixed.crossJoin(F.broadcast(q))
    tau2 = F.greatest(
        F.lit(0.0),
        (F.col("q") - (F.col("k") - 1))
        / (F.col("sw") - F.col("sw2") / F.col("sw")))
    t = base.select("k", tf.alias("tf"), "sw", "q",
                    tau2.alias("tau2"))
    r = (study.crossJoin(F.broadcast(t))
              .agg(F.max("k").alias("k"), F.max("tf").alias("tf"),
                   F.max("sw").alias("sw"), F.max("q").alias("q"),
                   F.max("tau2").alias("tau2"),
                   dsum(F.col("theta") / (F.col("v") + F.col("tau2")))
                    .alias("swt_r"),
                   dsum(1.0 / (F.col("v") + F.col("tau2")))
                    .alias("sw_r")))
    return r.select(
        F.col("k").cast("long").alias("k"),
        r6(F.col("tf")).alias("theta_fixed"),
        r6(1.0 / F.sqrt("sw")).alias("se_fixed"),
        r6(F.col("q")).alias("q_stat"), r6(F.col("tau2")).alias("tau2"),
        r6(F.col("swt_r") / F.col("sw_r")).alias("theta_random"),
        r6(1.0 / F.sqrt("sw_r")).alias("se_random"))


# ---------------------------------------------------------------------------
# Cronbach's alpha
# ---------------------------------------------------------------------------

_CRON_SQL = f"""
WITH um AS (
  SELECT user_id, event_type,
         {dsum_sql('value')} / COUNT(value) AS mv
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id, event_type),
full_u AS (
  SELECT user_id FROM um GROUP BY user_id
  HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM um)),
base AS (SELECT um.* FROM um JOIN full_u USING (user_id)),
item_var AS (
  SELECT event_type,
         ({dsum_sql('mv * mv')} - {dsum_sql('mv')} * {dsum_sql('mv')}
            / COUNT(*)) / (COUNT(*) - 1) AS vi
  FROM base GROUP BY event_type),
totals AS (
  SELECT user_id, {dsum_sql('mv')} AS tot FROM base GROUP BY user_id),
tvar AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS b,
         ({dsum_sql('tot * tot')} - {dsum_sql('tot')} * {dsum_sql('tot')}
            / COUNT(*)) / (COUNT(*) - 1) AS vt
  FROM totals),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             {dsum_sql('vi')} AS svi
      FROM item_var)
SELECT tvar.b, k.k, {r6_sql('k.svi')} AS sum_item_var,
       {r6_sql('tvar.vt')} AS total_var,
       {r6_sql('CAST(k.k AS DOUBLE) / (k.k - 1)'
               ' * (1.0 - k.svi / tvar.vt)')} AS cronbach_alpha
FROM tvar, k
"""


@query("stat_cronbach_alpha", oracle=_CRON_SQL)
def stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRONBACH'S ALPHA [PK — Cronbach 1951]: internal consistency of
    the 'scale' whose items are the event types and whose subjects
    are complete-block users (each scored by their per-type mean
    value): α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total) — do the k per-type
    signals measure one underlying trait (α→1) or k unrelated ones
    (α→0)?  The reliability view of the same complete-block panel the
    Friedman/Page/Quade tests rank — psychometrics' most-quoted
    statistic, and a practical feature-redundancy screen.  Item and
    total variances come from DECIMAL-exact sums (the total-score sum
    per user is itself decimal-accumulated).  Scale: facts collapse
    at the first aggregate; everything after is user- or
    type-domain-bounded."""
    ev = load_table(spark, sf_dir, "events")
    um = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .groupBy("user_id", "event_type")
            .agg((dsum("value") / F.count("value")).alias("mv")))
    ktot = um.select("event_type").distinct().count()
    full_u = (um.groupBy("user_id").agg(F.count(F.lit(1)).alias("nk"))
                .filter(F.col("nk") == ktot).select("user_id"))
    base = um.join(full_u, "user_id").cache()
    n = F.count(F.lit(1))
    vi = ((dsum(F.col("mv") * F.col("mv"))
           - dsum("mv") * dsum("mv") / n) / (n - 1))
    item_var = base.groupBy("event_type").agg(vi.alias("vi"))
    totals = base.groupBy("user_id").agg(dsum("mv").alias("tot"))
    vt = ((dsum(F.col("tot") * F.col("tot"))
           - dsum("tot") * dsum("tot") / n) / (n - 1))
    tvar = totals.agg(F.count(F.lit(1)).cast("long").alias("b"),
                      vt.alias("vt"))
    kk = item_var.agg(F.count(F.lit(1)).cast("long").alias("k"),
                      dsum("vi").alias("svi"))
    alpha = (F.col("k").cast("double") / (F.col("k") - 1)
             * (1.0 - F.col("svi") / F.col("vt")))
    return (tvar.crossJoin(F.broadcast(kk))
                .select("b", "k", r6(F.col("svi")).alias("sum_item_var"),
                        r6(F.col("vt")).alias("total_var"),
                        r6(alpha).alias("cronbach_alpha")))


# ---------------------------------------------------------------------------
# Deterministic permutation feature importance
# ---------------------------------------------------------------------------

_PI_A = int(0.6180339887498949 * (1 << 26)) | 1
_PI_M = 1 << 26
_PI_BUCKETS = 64

_PI_SQL = f"""
WITH spend AS (
  SELECT c.c_custkey AS id, c.c_acctbal AS x,
         COALESCE(o.tot, 0.0) AS y,
         c.c_custkey % {_PI_BUCKETS} AS bk
  FROM customer c
  LEFT JOIN (SELECT o_custkey, {dsum_sql('o_totalprice')} AS tot
             FROM orders GROUP BY o_custkey) o
    ON o.o_custkey = c.c_custkey),
ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * x')} AS sxx, {dsum_sql('x * y')} AS sxy,
         {dsum_sql('y * y')} AS syy
  FROM spend),
fit AS (
  SELECT n, sy, syy,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS a,
         syy - sy * sy / n AS sst
  FROM ols),
ordered AS (
  SELECT bk, y,
         ROW_NUMBER() OVER (PARTITION BY bk ORDER BY id) AS rn
  FROM spend),
shuffled AS (
  SELECT bk, x,
         ROW_NUMBER() OVER (PARTITION BY bk
                            ORDER BY ((id % {_PI_M}) * {_PI_A})
                                     % {_PI_M}, id) AS rn
  FROM spend),
perm AS (
  SELECT o.y, s.x AS xp
  FROM ordered o JOIN shuffled s ON s.bk = o.bk AND s.rn = o.rn),
scores AS (
  SELECT (SELECT {dsum_sql('(p.y - f.a - f.b * p.xp)'
                           ' * (p.y - f.a - f.b * p.xp)')}
          FROM perm p, fit f) AS ssr_perm,
         (SELECT {dsum_sql('(s.y - f.a - f.b * s.x)'
                           ' * (s.y - f.a - f.b * s.x)')}
          FROM spend s, fit f) AS ssr_base)
SELECT fit.n, {r6_sql('1.0 - scores.ssr_base / fit.sst')} AS r2_base,
       {r6_sql('1.0 - scores.ssr_perm / fit.sst')} AS r2_perm,
       {r6_sql('(1.0 - scores.ssr_base / fit.sst)'
               ' - (1.0 - scores.ssr_perm / fit.sst)')} AS importance
FROM fit, scores
"""


@query("ml_permutation_importance", oracle=_PI_SQL)
def ml_permutation_importance(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """PERMUTATION FEATURE IMPORTANCE, deterministic [PK — Breiman
    2001; Fisher/Rudin/Dominici 2019's model-reliance framing]: fit
    spend ~ acctbal once, then re-score with the feature PERMUTED —
    the R² drop is the feature's importance, the model-agnostic
    answer to 'does this model actually use x?'.  Randomness is
    replaced by a deterministic within-bucket derangement: rows pair
    by (custkey % 64, rank-by-key) on one side and (bucket,
    rank-by-Knuth-multiplicative-hash) on the other — a reproducible
    permutation both engines construct bit-identically, with windows
    partitioned by bucket (never a raw-row global window).  SS terms
    run through DECIMAL(38,12); the 1000-unit residual-scale lesson
    from stat_breusch_pagan does not bite here (squared spend
    residuals stay under the 26-digit bound; no fourth powers).
    Scale: one aggregate, two bucket-partitioned rank windows, one
    co-bucketed join."""
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .groupBy("o_custkey").agg(dsum("o_totalprice").alias("tot")))
    spend = (c.join(o, c["c_custkey"] == o["o_custkey"], "left")
              .select(F.col("c_custkey").alias("id"),
                      F.col("c_acctbal").alias("x"),
                      F.coalesce(F.col("tot"), F.lit(0.0)).alias("y"),
                      (F.col("c_custkey") % _PI_BUCKETS).alias("bk")))
    spend = spend.cache()
    ols = spend.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    dsum("x").alias("sx"), dsum("y").alias("sy"),
                    dsum(F.col("x") * F.col("x")).alias("sxx"),
                    dsum(F.col("x") * F.col("y")).alias("sxy"),
                    dsum(F.col("y") * F.col("y")).alias("syy"))
    b = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    a = (F.col("sy") - b * F.col("sx")) / F.col("n")
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    fit = ols.select("n", b.alias("b"), a.alias("a"), sst.alias("sst"))
    wo = W.partitionBy("bk").orderBy("id")
    ws = W.partitionBy("bk").orderBy(
        F.pmod(F.pmod(F.col("id"), F.lit(_PI_M)) * F.lit(_PI_A),
               F.lit(_PI_M)), "id")
    ordered = spend.select("bk", "y",
                           F.row_number().over(wo).alias("rn"))
    shuffled = spend.select(F.col("bk").alias("bk2"),
                            F.col("x").alias("xp"),
                            F.row_number().over(ws).alias("rn2"))
    perm = ordered.join(shuffled,
                        (F.col("bk") == F.col("bk2"))
                        & (F.col("rn") == F.col("rn2")))
    e_perm = F.col("y") - F.col("a") - F.col("b") * F.col("xp")
    ssr_perm = (perm.crossJoin(F.broadcast(fit))
                    .agg(dsum(e_perm * e_perm).alias("ssr_perm")))
    e_base = F.col("y") - F.col("a") - F.col("b") * F.col("x")
    ssr_base = (spend.crossJoin(F.broadcast(fit))
                     .agg(dsum(e_base * e_base).alias("ssr_base")))
    r2b = 1.0 - F.col("ssr_base") / F.col("sst")
    r2p = 1.0 - F.col("ssr_perm") / F.col("sst")
    return (fit.crossJoin(F.broadcast(ssr_base))
               .crossJoin(F.broadcast(ssr_perm))
               .select("n", r6(r2b).alias("r2_base"),
                       r6(r2p).alias("r2_perm"),
                       r6(r2b - r2p).alias("importance")))
