"""Round-9f operator additions: cross-correlation at lags, the
Mantel-Haenszel pooled odds ratio, and Gumbel block-maxima EVT fitting.

Provenance (SURVEY.md §0 applies — empty reference checkout): the
sample cross-correlation function is textbook time-series analysis
[PK — Box & Jenkins]; Mantel-Haenszel 1959 [PK] is the classic
stratified 2×2 pooling; block-maxima EVT with the method-of-moments
Gumbel fit is Gumbel 1958 / Coles 2001 [PK].

Float discipline: counts are BIGINT; cross-products and moments route
through DECIMAL sums; the Euler-Mascheroni and π²/6 constants are
inlined as identical double literals on both engines (the
ab_sequential_sprt constant-pinning philosophy); every statistic is a
ratio/affine map of identically-assembled doubles emitted unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql
from .registry import query

_MAX_LAG = 5


# ---------------------------------------------------------------------------
# Cross-correlation function at lags −k..k (daily click vs purchase)
# ---------------------------------------------------------------------------

@query("ts_cross_correlation_lags", oracle=f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count_if(event_type = 'click') AS DOUBLE) AS x,
         CAST(count_if(event_type = 'purchase') AS DOUBLE) AS y
  FROM events GROUP BY 1),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} / COUNT(*) AS mx,
         {dsum_sql('y')} / COUNT(*) AS my,
         {dsum_sql('x*x')} AS sxx, {dsum_sql('y*y')} AS syy,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy
  FROM d),
lags AS (SELECT unnest(generate_series({-_MAX_LAG}, {_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         {dsum_sql('(a.x - m.mx) * (b.y - m.my)')} AS sxy
  FROM lags l, d a, d b, m
  WHERE b.day = a.day + CAST(l.lag AS INT)
  GROUP BY l.lag)
SELECT p.lag, p.n_pairs,
       p.sxy / SQRT((m.sxx - m.sx * m.sx / m.n)
                    * (m.syy - m.sy * m.sy / m.n)) AS ccf
FROM pairs p, m ORDER BY p.lag
""")
def ts_cross_correlation_lags(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """CROSS-CORRELATION FUNCTION [PK — Box & Jenkins]: r_xy(ℓ) for
    ℓ = −{k}..{k} between the daily CLICK and PURCHASE count series —
    the lead/lag scan run before any transfer-function or Granger
    model (ts_granger_lite tests ONE lag; the CCF profiles them all,
    and its asymmetry says who leads). Standard normalization: global
    means/variances (exact DECIMAL sums), covariance at each lag over
    the aligned pairs, denominator √(Sxx·Syy) — sqrt is IEEE-exact so
    both engines emit the identical unrounded double. The lag shift
    is a self-JOIN of the bounded day grid against an exploded lag
    spine (2k+1 rows broadcast) — never a window over raw events;
    day+lag equi-join keys, no inequality scan."""
    ev = load_table(spark, sf_dir, "events")
    d = (ev.groupBy(F.to_date("ts").alias("day"))
           .agg(F.count_if(F.col("event_type") == "click")
                 .cast("double").alias("x"),
                F.count_if(F.col("event_type") == "purchase")
                 .cast("double").alias("y")))
    m = d.agg(F.count(F.lit(1)).alias("n"),
              (dsum("x") / F.count(F.lit(1))).alias("mx"),
              (dsum("y") / F.count(F.lit(1))).alias("my"),
              dsum(F.col("x") * F.col("x")).alias("sxx"),
              dsum(F.col("y") * F.col("y")).alias("syy"),
              dsum("x").alias("sx"), dsum("y").alias("sy"))
    lags = spark.range(-_MAX_LAG, _MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag"))
    a = d.select(F.col("day").alias("aday"), F.col("x").alias("ax"))
    b = d.select(F.col("day").alias("bday"), F.col("y").alias("by"))
    pairs = (a.crossJoin(F.broadcast(lags))
              .join(b, F.col("bday")
                    == F.date_add(F.col("aday"), F.col("lag")))
              .crossJoin(F.broadcast(m))
              .groupBy("lag")
              .agg(F.count(F.lit(1)).alias("n_pairs"),
                   dsum((F.col("ax") - F.col("mx"))
                        * (F.col("by") - F.col("my"))).alias("sxy")))
    den = F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                 * (F.col("syy") - F.col("sy") * F.col("sy")
                    / F.col("n")))
    return (pairs.crossJoin(F.broadcast(m))
                 .select("lag", "n_pairs",
                         (F.col("sxy") / den).alias("ccf")))


# ---------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio across strata
# ---------------------------------------------------------------------------

@query("stat_odds_ratio_mh", oracle="""
WITH f AS (
  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) // 6 AS stratum,
         ((user_id % 1000003) * 2654435761) % 1000003 % 2 = 0 AS treat,
         event_type = 'purchase' AS hit
  FROM events WHERE user_id IS NOT NULL),
s AS (
  SELECT stratum,
         CAST(count_if(treat AND hit) AS BIGINT) AS a,
         CAST(count_if(treat AND NOT hit) AS BIGINT) AS b,
         CAST(count_if(NOT treat AND hit) AS BIGINT) AS c,
         CAST(count_if(NOT treat AND NOT hit) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM f GROUP BY stratum),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(a AS DOUBLE) * d / n) AS r,
         SUM(CAST(b AS DOUBLE) * c / n) AS s_
  FROM s)
SELECT k, r AS sum_ad_over_n, s_ AS sum_bc_over_n,
       r / s_ AS or_mh
FROM t
""")
def stat_odds_ratio_mh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANTEL-HAENSZEL POOLED ODDS RATIO [PK — Mantel & Haenszel
    1959]: the stratified 2×2 estimator OR_MH = Σ(aᵢdᵢ/nᵢ) /
    Σ(bᵢcᵢ/nᵢ) pooling the treatment→purchase association across
    hour-quarter strata — the confounding-robust ratio causal_
    iptw_subclass's mean-difference ATE can't give (odds ratios are
    the epidemiology/classification-side effect scale, stable when
    baseline rates differ per stratum). Cells are exact BIGINTs; each
    stratum's aᵢdᵢ/nᵢ is the same double on both engines (integer
    products exact in double far beyond fixture scale, one IEEE
    division), summed over the ≤4-row stratum table (plain SUM over
    identical addends in the same grouped order — k=4 bounded).
    Emitted unrounded. One conditional-count aggregate + 4-row
    algebra."""
    ev = load_table(spark, sf_dir, "events")
    f = (ev.filter(F.col("user_id").isNotNull())
           .select((F.hour("ts").cast("long") / 6).cast("long")
                   .alias("stratum"),
                   (((F.col("user_id") % 1000003) * F.lit(2654435761))
                    % 1000003 % 2 == 0).alias("treat"),
                   (F.col("event_type") == "purchase").alias("hit")))
    s = f.groupBy("stratum").agg(
        F.count_if(F.col("treat") & F.col("hit")).alias("a"),
        F.count_if(F.col("treat") & ~F.col("hit")).alias("b"),
        F.count_if(~F.col("treat") & F.col("hit")).alias("c"),
        F.count_if(~F.col("treat") & ~F.col("hit")).alias("d"),
        F.count(F.lit(1)).alias("n"))
    t = s.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("a").cast("double") * F.col("d") / F.col("n"))
         .alias("r"),
        F.sum(F.col("b").cast("double") * F.col("c") / F.col("n"))
         .alias("s_"))
    return t.select("k", F.col("r").alias("sum_ad_over_n"),
                    F.col("s_").alias("sum_bc_over_n"),
                    (F.col("r") / F.col("s_")).alias("or_mh"))


# ---------------------------------------------------------------------------
# Gumbel block maxima (EVT method-of-moments fit)
# ---------------------------------------------------------------------------

# Method-of-moments Gumbel constants, inlined as identical literals
# on both engines (9-dp-pinned — the SPRT constant philosophy):
# scale β = s·√6/π, location μ = x̄ − γ·β (γ = Euler-Mascheroni).
_SQRT6_OVER_PI = 0.779696801  # √6/π to 9 dp
_EULER_GAMMA = 0.577215665    # γ to 9 dp


@query("agg_gumbel_block_maxima", oracle=f"""
WITH bm AS (
  SELECT CAST(ts AS DATE) AS day, MAX(value) AS mx
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         {dsum_sql('mx')} AS sx
  FROM bm),
r AS (
  SELECT s.n_blocks, s.sx / s.n_blocks AS mean_max,
         {dsum_sql('POW(bm.mx - s.sx / s.n_blocks, 2)')} AS ss
  FROM bm, s GROUP BY s.n_blocks, s.sx)
SELECT n_blocks, mean_max,
       SQRT(ss / (n_blocks - 1)) AS sd_max,
       SQRT(ss / (n_blocks - 1)) * {_SQRT6_OVER_PI} AS gumbel_beta,
       mean_max - {_EULER_GAMMA}
         * (SQRT(ss / (n_blocks - 1)) * {_SQRT6_OVER_PI}) AS gumbel_mu
FROM r
""")
def agg_gumbel_block_maxima(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """GUMBEL BLOCK-MAXIMA FIT [PK — Gumbel 1958 / Coles 2001]:
    extreme-value analysis of the value series — take DAILY block
    maxima (the EVT block construction; maxima of light-tailed blocks
    converge to Gumbel), then the method-of-moments fit β = s·√6/π,
    μ = x̄ − γβ with the two constants inlined as identical 9-dp
    literals on both engines (no libm at query time — the SPRT
    pinning rule; the MLE needs iterative exp sums and is the
    consumer's refinement). The return-level question every capacity
    planner asks — 'what daily max should we expect once a year?' —
    is μ − β·ln(−ln(1−1/T)) over these two hash-checked parameters.
    Block means/SS through DECIMAL with an explicit residual pass
    (the ANOVA lesson); sd/β/μ are sqrt+affine maps of identical
    doubles, unrounded. One block aggregate + one 1-row reduction
    over the bounded day grid."""
    ev = load_table(spark, sf_dir, "events")
    bm = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.max("value").alias("mx")))
    s = bm.agg(F.count(F.lit(1)).alias("n_blocks"),
               dsum("mx").alias("sx"))
    r = (bm.crossJoin(F.broadcast(s))
           .groupBy("n_blocks", "sx")
           .agg(dsum(F.pow(F.col("mx") - F.col("sx") / F.col("n_blocks"),
                           F.lit(2))).alias("ss")))
    sd = F.sqrt(F.col("ss") / (F.col("n_blocks") - 1))
    beta = sd * _SQRT6_OVER_PI
    mean = F.col("sx") / F.col("n_blocks")
    return r.select("n_blocks", mean.alias("mean_max"),
                    sd.alias("sd_max"), beta.alias("gumbel_beta"),
                    (mean - _EULER_GAMMA * beta).alias("gumbel_mu"))
