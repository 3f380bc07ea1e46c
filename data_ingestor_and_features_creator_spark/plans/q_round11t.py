"""Round-11 operator batch T (SURVEY.md §2 growth): AR(1)
mean-reversion half-life, Bartlett's variance test, sample L-moments,
and a natural-spline basis expansion.

Provenance ([PK], empty reference checkout — SURVEY §0): Uhlenbeck &
Ornstein 1930 / the AR(1) half-life identity ln2/(−lnφ̂); Bartlett
1937; Hosking 1990 (sample L-moments via shifted-Legendre order-
statistic weights); de Boor 1978 / Hastie-Tibshirani practice
(truncated-power natural cubic spline basis).

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
# AR(1) mean-reversion half-life
# ---------------------------------------------------------------------------

_AR1_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
lagged AS (
  SELECT event_type, x,
         LAG(x) OVER (PARTITION BY event_type ORDER BY d) AS x1
  FROM daily),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x1')} AS sx, {dsum_sql('x')} AS sy,
         {dsum_sql('x1 * x1')} AS sxx, {dsum_sql('x1 * x')} AS sxy
  FROM lagged WHERE x1 IS NOT NULL GROUP BY event_type),
fit AS (
  SELECT event_type, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS phi
  FROM s)
SELECT event_type, n, {r6_sql('phi')} AS phi,
       CASE WHEN phi > 0 AND phi < 1 THEN
         {r6_sql('ROUND(LN(2.0), 9) / (-ROUND(LN(phi), 9))')}
       END AS half_life_days
FROM fit ORDER BY event_type
"""


@query("ts_ar1_halflife", oracle=_AR1_SQL)
def ts_ar1_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) MEAN-REVERSION HALF-LIFE [PK — the Ornstein-Uhlenbeck
    discretization identity: x_t = c + φx_{t−1} + ε ⇒ shocks decay
    with half-life ln2/(−lnφ)]: per event type's daily series, the
    closed-form OLS autoregression coefficient and the number of DAYS
    a perturbation needs to halve — the practical 'how long does a
    spike last?' number that turns ts_acf_multi_lag's correlations
    and ts_cointegration_engle's ρ into a business-readable unit.
    Non-mean-reverting fits (φ ∉ (0,1)) emit NULL by the safe rule.
    Both logs are pinned to 9 dp (q_round6d discipline); the OLS runs
    on DECIMAL-exact sums over the lag pairs.  Scale: facts collapse
    to (type, day); one bounded window + one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("x")))
    wl = W.partitionBy("event_type").orderBy("d")
    lagged = daily.select("event_type", "x",
                          F.lag("x").over(wl).alias("x1"))
    s = (lagged.filter(F.col("x1").isNotNull())
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    dsum("x1").alias("sx"), dsum("x").alias("sy"),
                    dsum(F.col("x1") * F.col("x1")).alias("sxx"),
                    dsum(F.col("x1") * F.col("x")).alias("sxy")))
    phi = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
           / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    fit = s.select("event_type", "n", phi.alias("phi"))
    hl = (F.round(F.log(F.lit(2.0)), 9)
          / (-F.round(F.log("phi"), 9)))
    return (fit.select("event_type", "n", r6(F.col("phi")).alias("phi"),
                       F.when((F.col("phi") > 0) & (F.col("phi") < 1),
                              r6(hl)).alias("half_life_days"))
               .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Bartlett's test for homogeneity of variances
# ---------------------------------------------------------------------------

_BART_SQL = f"""
WITH s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         ({dsum_sql('value * value')} - {dsum_sql('value')}
            * {dsum_sql('value')} / COUNT(*)) / (COUNT(*) - 1) AS v
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nt,
         {dsum_sql('(n - 1) * v')} AS pooled_num,
         {dsum_sql('(n - 1) * ROUND(LN(v), 9)')} AS slnv,
         {dsum_sql('1.0 / (n - 1)')} AS sinv
  FROM s),
st AS (
  SELECT k, nt,
         (nt - k) * ROUND(LN(pooled_num / (nt - k)), 9) - slnv AS num,
         1.0 + (sinv - 1.0 / (nt - k)) / (3.0 * (k - 1)) AS c
  FROM tot)
SELECT k, nt AS n, {r6_sql('num')} AS num, {r6_sql('c')} AS c_factor,
       {r6_sql('num / c')} AS bartlett_stat
FROM st
"""


@query("stat_bartlett_test", oracle=_BART_SQL)
def stat_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BARTLETT'S TEST FOR VARIANCE HOMOGENEITY [PK — Bartlett 1937]:
    B = ((N−k)·ln s²_p − Σ(n_i−1)ln s²_i) / C with the small-sample
    correction C = 1 + (Σ1/(n_i−1) − 1/(N−k))/(3(k−1)) ~ χ²_{k−1} —
    the PARAMETRIC member of the dispersion family, most powerful
    under normality where stat_levene_test (means), stat_fligner_
    killeen (normal scores) and stat_ansari_bradley (ranks) trade
    power for robustness; publishing all four is how an analyst shows
    the conclusion does not hinge on the variance test chosen.
    Variances come from DECIMAL-exact sums; each ln is pinned to 9 dp
    and the weighted ln-sum re-enters DECIMAL.  Scale: one hash
    aggregate + one k-row reduction."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    cnt = F.count(F.lit(1))
    v = ((dsum(F.col("value") * F.col("value"))
          - dsum("value") * dsum("value") / cnt) / (cnt - 1))
    s = x.groupBy("event_type").agg(
        cnt.cast("long").alias("n"), v.alias("v"))
    tot = s.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        dsum((F.col("n") - 1) * F.col("v")).alias("pooled_num"),
        dsum((F.col("n") - 1) * F.round(F.log("v"), 9)).alias("slnv"),
        dsum(1.0 / (F.col("n") - 1)).alias("sinv"))
    num = ((F.col("nt") - F.col("k"))
           * F.round(F.log(F.col("pooled_num")
                           / (F.col("nt") - F.col("k"))), 9)
           - F.col("slnv"))
    c = (1.0 + (F.col("sinv") - 1.0 / (F.col("nt") - F.col("k")))
         / (3.0 * (F.col("k") - 1)))
    st = tot.select("k", "nt", num.alias("num"), c.alias("c"))
    return st.select("k", F.col("nt").alias("n"),
                     r6(F.col("num")).alias("num"),
                     r6(F.col("c")).alias("c_factor"),
                     r6(F.col("num") / F.col("c"))
                     .alias("bartlett_stat"))


# ---------------------------------------------------------------------------
# Sample L-moments
# ---------------------------------------------------------------------------

_LMOM_SQL = f"""
WITH r AS (
  SELECT l_returnflag AS grp, l_extendedprice AS x,
         CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_extendedprice, l_orderkey,
                                          l_linenumber) AS DOUBLE)
           AS i,
         CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
           AS n
  FROM lineitem),
b AS (
  SELECT grp, MAX(n) AS n,
         {dsum_sql('x')} / MAX(n) AS b0,
         {dsum_sql('x * ((i - 1) / (n - 1.0))')} / MAX(n) AS b1,
         {dsum_sql('x * ((i - 1) / (n - 1.0))'
                   ' * ((i - 2) / (n - 2.0))')} / MAX(n) AS b2,
         {dsum_sql('x * ((i - 1) / (n - 1.0))'
                   ' * ((i - 2) / (n - 2.0))'
                   ' * ((i - 3) / (n - 3.0))')} / MAX(n) AS b3
  FROM r GROUP BY grp),
lm AS (
  SELECT grp, n, b0 AS l1, 2.0 * b1 - b0 AS l2,
         6.0 * b2 - 6.0 * b1 + b0 AS l3,
         20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0 AS l4
  FROM b)
SELECT grp, CAST(n AS BIGINT) AS n, {r6_sql('l1')} AS l1,
       {r6_sql('l2')} AS l2, {r6_sql('l3 / l2')} AS t3,
       {r6_sql('l4 / l2')} AS t4
FROM lm ORDER BY grp
"""


@query("agg_l_moments", oracle=_LMOM_SQL)
def agg_l_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE L-MOMENTS [PK — Hosking 1990]: per return flag, the
    order-statistic moments λ₁ (location), λ₂ (L-scale) and the
    ratios τ₃ = λ₃/λ₂ (L-skewness), τ₄ = λ₄/λ₂ (L-kurtosis) from the
    unbiased probability-weighted moments b_r = (1/n)Σ x₍ᵢ₎·
    (i−1)⋯(i−r)/((n−1)⋯(n−r)) (each ratio normalized PER ROW
    so the decimal path never overflows) — moments that EXIST whenever the mean
    does and resist outliers far better than agg_skew_kurt's cubed/
    fourth-power moments; the (τ₃, τ₄) pair is the L-moment-ratio
    diagram hydrology uses to pick a distribution family, closing the
    extreme-value toolchain with agg_gpd_pot_moments /
    agg_gumbel_block_maxima / agg_hill_tail_index.  The rank weights
    are identical double polynomials of the per-group rank under a
    total (value, orderkey, linenumber) order, DECIMAL-accumulated.
    Scale: one per-group rank window + one aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    wr = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber")
    wn = W.partitionBy("l_returnflag")
    r = li.select(F.col("l_returnflag").alias("grp"),
                  F.col("l_extendedprice").alias("x"),
                  F.row_number().over(wr).cast("double").alias("i"),
                  F.count(F.lit(1)).over(wn).cast("long").alias("n"))
    i, x = F.col("i"), F.col("x")
    # Normalize each rank weight PER ROW ((i−r)/(n−r) ≤ 1) so the
    # decimal accumulator never sees i³-scale products — the raw
    # x·(i−1)(i−2)(i−3) form overflows DECIMAL(38,12) at the 1.2M-row
    # blow-up group.
    w1 = (i - 1) / (F.col("n") - 1.0)
    w2 = (i - 2) / (F.col("n") - 2.0)
    w3 = (i - 3) / (F.col("n") - 3.0)
    nn = F.max("n")
    b = r.groupBy("grp").agg(
        nn.alias("n"),
        (dsum(x) / nn).alias("b0"),
        (dsum(x * w1) / nn).alias("b1"),
        (dsum(x * w1 * w2) / nn).alias("b2"),
        (dsum(x * w1 * w2 * w3) / nn).alias("b3"))
    l1 = F.col("b0")
    l2 = 2.0 * F.col("b1") - F.col("b0")
    l3 = 6.0 * F.col("b2") - 6.0 * F.col("b1") + F.col("b0")
    l4 = (20.0 * F.col("b3") - 30.0 * F.col("b2")
          + 12.0 * F.col("b1") - F.col("b0"))
    return (b.select("grp", F.col("n").cast("long").alias("n"),
                     r6(l1).alias("l1"), r6(l2).alias("l2"),
                     r6(l3 / l2).alias("t3"), r6(l4 / l2).alias("t4"))
             .orderBy("grp"))


# ---------------------------------------------------------------------------
# Natural cubic spline basis expansion
# ---------------------------------------------------------------------------

_SPL_KNOTS = (-3000.0, 0.0, 3000.0, 6000.0)


def _spl_terms_sql() -> list:
    ks = _SPL_KNOTS
    km = ks[-1]
    km1 = ks[-2]

    def dk(k: float) -> str:
        return (f"((GREATEST(x - {k!r}, 0.0) * GREATEST(x - {k!r}, 0.0)"
                f" * GREATEST(x - {k!r}, 0.0)"
                f" - GREATEST(x - {km!r}, 0.0) * GREATEST(x - {km!r}, 0.0)"
                f" * GREATEST(x - {km!r}, 0.0)) / ({km!r} - {k!r}))")

    return [f"({dk(ks[0])} - {dk(km1)})", f"({dk(ks[1])} - {dk(km1)})"]


_SPL_SQL = f"""
WITH c AS (
  SELECT c_custkey, c_acctbal AS x FROM customer),
basis AS (
  SELECT c_custkey, x,
         {_spl_terms_sql()[0]} AS n1,
         {_spl_terms_sql()[1]} AS n2
  FROM c)
SELECT c_custkey, {r6_sql('x')} AS x, {r6_sql('x')} AS b_lin,
       {r6_sql('n1 / 1000000.0')} AS b_n1,
       {r6_sql('n2 / 1000000.0')} AS b_n2
FROM basis ORDER BY c_custkey
"""


@query("feature_spline_basis", oracle=_SPL_SQL)
def feature_spline_basis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL CUBIC SPLINE BASIS [PK — de Boor 1978; the
    truncated-power natural basis of Hastie & Tibshirani]: expand
    account balance into the natural-spline features N_k(x) =
    d_k(x) − d_{{K−1}}(x) with d_k = ((x−κ_k)₊³ − (x−κ_K)₊³)/(κ_K−κ_k)
    over fixed knots (−3000, 0, 3000, 6000) — the basis that lets a
    LINEAR model (agg_ols_multivariate downstream) fit smooth
    nonlinear balance effects while staying linear BEYOND the
    boundary knots (the 'natural' constraint that kills cubic
    extrapolation blowup).  Pure (x−κ)₊³ arithmetic — GREATEST,
    multiply, subtract — is identical IEEE on both engines; the
    emitted features are scaled by 1e6 to keep magnitudes
    hash-friendly at 6 dp.  Scale: a stateless per-row projection in
    whole-stage codegen; no shuffle at all."""
    c = load_table(spark, sf_dir, "customer")
    ks = _SPL_KNOTS
    km, km1 = ks[-1], ks[-2]
    x = F.col("x")

    def pos3(k: float):
        g = F.greatest(x - F.lit(k), F.lit(0.0))
        return g * g * g

    def dk(k: float):
        return (pos3(k) - pos3(km)) / (km - k)

    basis = (c.select("c_custkey", F.col("c_acctbal").alias("x"))
              .select("c_custkey", "x",
                      (dk(ks[0]) - dk(km1)).alias("n1"),
                      (dk(ks[1]) - dk(km1)).alias("n2")))
    return (basis.select("c_custkey", r6(x).alias("x"),
                         r6(x).alias("b_lin"),
                         r6(F.col("n1") / 1000000.0).alias("b_n1"),
                         r6(F.col("n2") / 1000000.0).alias("b_n2"))
                 .orderBy("c_custkey"))
