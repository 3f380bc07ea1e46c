"""Round-11 operator batch E (SURVEY.md §2 growth): exact Shapley
funnel attribution, isotonic calibration via the exact minimax
formula, the 1-D Wasserstein distance and the tie-aware Cramér-von
Mises criterion (completing the EDF-distance trio next to
agg_ks_2sample / stat_anderson_darling_2samp), and split-conformal
prediction intervals with measured coverage.

Provenance ([PK], empty reference checkout — SURVEY §0): Shapley 1953
(+ the marketing "Shapley attribution" practitioner formulation);
Barlow et al. 1972 (isotonic regression, minimax characterization);
Vaserstein 1969 / the 1-D order-statistics identity; Anderson 1962
(two-sample Cramér-von Mises; here the tie-aware EDF-integral form);
Vovk et al. 2005 / Lei et al. 2018 (split conformal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql, safe_div
from .registry import query

# ---------------------------------------------------------------------------
# Exact Shapley funnel attribution
# ---------------------------------------------------------------------------

# Channel bits (alphabetical, purchase = the conversion event, not a
# channel). n = 4 channels → 16 coalitions, exact Shapley weights
# s!(n−1−s)!/n! = 1/4, 1/12, 1/12, 1/4 for |S| = 0..3.
_CH = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_W_SQL = ("CASE bit_count(s) WHEN 0 THEN 0.25 WHEN 1 THEN 1.0/12.0 "
          "WHEN 2 THEN 1.0/12.0 ELSE 0.25 END")

_J_SQL = """
j AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              + 2 * MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              + 8 * MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS INTEGER) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)),
vstat AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS nc
  FROM j GROUP BY mask),
v AS (
  SELECT CAST(g AS INTEGER) AS mask,
         COALESCE(CAST(s.nc AS DOUBLE) / s.n, 0.0) AS v
  FROM generate_series(0, 15) AS t(g)
  LEFT JOIN vstat s ON s.mask = g)
"""


@query("funnel_shapley_attribution", oracle=f"""
WITH {_J_SQL.strip()},
ch(name, bit) AS (VALUES ('click', 1), ('error', 2), ('signup', 4),
                         ('view', 8)),
contrib AS (
  SELECT ch.name,
         {_W_SQL.replace('s', 'sv.mask')} AS w,
         wv.v - sv.v AS dv
  FROM ch
  JOIN v sv ON (sv.mask & ch.bit) = 0
  JOIN v wv ON wv.mask = (sv.mask | ch.bit))
SELECT name AS channel, {r6_sql('SUM(w * dv)')} AS phi
FROM contrib GROUP BY name
""")
def funnel_shapley_attribution(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """EXACT SHAPLEY-VALUE CHANNEL ATTRIBUTION [PK — Shapley 1953;
    the data-driven attribution model practitioners run next to
    funnel_attribution's last-touch]: a journey is a (user, day); its
    coalition is the SET of non-conversion channels touched (4-bit
    mask over click/error/signup/view) and v(S) = the conversion rate
    (≥1 purchase) of journeys with coalition exactly S, 0 for
    unobserved coalitions. With n = 4 channels the 2⁴ coalition space
    is ENUMERATED, so the Shapley value φ_i =
    Σ_{{S∌i}} |S|!(n−|S|−1)!/n! · (v(S∪i) − v(S)) is computed
    EXACTLY — no sampling, no regression approximation. Scale: one
    journey aggregate over the fact table (map-side combinable), then
    constant-size algebra (16 coalitions × 4 channels); at any data
    volume the only scaling cost is the first groupBy. v ratios are
    exact small-int divisions; the ≤8-term weighted sum is r6-rounded
    (cross-engine fold order)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("d")
    touched = [
        (F.max(F.when(F.col("event_type") == nm, 1).otherwise(0))
         * F.lit(bit)) for nm, bit in _CH]
    mask_col = touched[0]
    for t in touched[1:]:
        mask_col = mask_col + t
    j = (ev.groupBy("user_id", day)
           .agg(mask_col.cast("int").alias("mask"),
                F.max(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0)).alias("conv")))
    vstat = j.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("nc"))
    allm = spark.range(16).select(F.col("id").cast("int").alias("mask"))
    v = (allm.join(vstat, "mask", "left")
             .select("mask",
                     F.coalesce(F.col("nc").cast("double") / F.col("n"),
                                F.lit(0.0)).alias("v")))
    ch = spark.createDataFrame(_CH, "name string, bit int")
    sv = v.select(F.col("mask").alias("s"), F.col("v").alias("vs"))
    wv = v.select(F.col("mask").alias("su"), F.col("v").alias("vsu"))
    w = (F.when(F.bit_count("s") == 0, F.lit(0.25))
          .when(F.bit_count("s") == 1, F.lit(1.0) / 12.0)
          .when(F.bit_count("s") == 2, F.lit(1.0) / 12.0)
          .otherwise(F.lit(0.25)))
    contrib = (ch.join(sv, F.expr("(s & bit) = 0"))
                 .join(wv, F.expr("su = (s | bit)"))
                 .select(F.col("name").alias("channel"),
                         (w * (F.col("vsu") - F.col("vs"))).alias("wd")))
    return contrib.groupBy("channel").agg(r6(F.sum("wd")).alias("phi"))


# ---------------------------------------------------------------------------
# Isotonic calibration via the exact minimax formula
# ---------------------------------------------------------------------------

_NB = 20  # score bins


@query("ml_isotonic_calibration", oracle=f"""
WITH scored AS (
  SELECT e.event_id,
         0.02 + 0.96 * (e.value - m.vmin) / (m.vmax - m.vmin) AS p,
         CASE WHEN e.event_type IN ('click', 'purchase')
              THEN 1 ELSE 0 END AS y
  FROM events e, (SELECT MIN(value) AS vmin, MAX(value) AS vmax
                  FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)) m
  WHERE e.value IS NOT NULL AND NOT isnan(e.value)),
bins AS (
  SELECT CAST(FLOOR(p * {_NB}) AS INTEGER) AS b,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS cy,
         {dsum_sql('p')} AS sp
  FROM scored GROUP BY 1),
pre AS (
  SELECT b, n, cy, sp,
         SUM(n) OVER (ORDER BY b) AS cw_k,
         SUM(cy) OVER (ORDER BY b) AS cy_k
  FROM bins),
amat AS (
  SELECT lo.b AS j, hi.b AS k,
         CAST(hi.cy_k - (lo.cy_k - lo.cy) AS DOUBLE)
           / (hi.cw_k - (lo.cw_k - lo.n)) AS a
  FROM pre lo JOIN pre hi ON lo.b <= hi.b),
inner_min AS (
  SELECT i.b AS i, a.j, MIN(a.a) AS m
  FROM pre i JOIN amat a ON a.j <= i.b AND a.k >= i.b
  GROUP BY i.b, a.j),
fit AS (
  SELECT i, MAX(m) AS iso FROM inner_min GROUP BY i)
SELECT p.b AS bin, p.n,
       {r6_sql('p.sp / p.n')} AS avg_score,
       {r6_sql('CAST(p.cy AS DOUBLE) / p.n')} AS raw_rate,
       {r6_sql('f.iso')} AS iso_rate
FROM pre p JOIN fit f ON f.i = p.b
""")
def ml_isotonic_calibration(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """ISOTONIC CALIBRATION via the EXACT MINIMAX characterization
    [PK — Barlow et al. 1972: the isotonic fit at bin i is
    max_{{j≤i}} min_{{k≥i}} weightedMean(y, bins j..k)] over the
    {_NB}-bin reliability table of the house score construction
    (q_round6j._scored): the monotone-nondecreasing calibrated rate a
    deployed classifier wants instead of the raw per-bin rate —
    identical to PAVA's output (pinned against a numpy PAVA in
    tests) but expressible as three bounded joins instead of a
    sequential pooling loop, i.e. Catalyst-plannable with an exact SQL
    oracle. The fact table collapses to ≤{_NB} bins FIRST; the
    minimax triple (j ≤ i ≤ k) is then ≤{_NB}³/6 constant-size rows.
    A(j,k) are exact integer ratios from prefix sums — identical
    doubles on both engines, so min/max pick identical values; only
    the final emission is rounded."""
    from .q_round6j import _scored
    sc = _scored(spark, sf_dir)
    bins = (sc.select(F.floor(F.col("p") * _NB).cast("int").alias("b"),
                      "y", "p")
              .groupBy("b")
              .agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.sum("y").cast("long").alias("cy"),
                   dsum("p").alias("sp")))
    wc = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    pre = bins.select(
        "b", "n", "cy", "sp",
        F.sum("n").over(wc).alias("cw_k"),
        F.sum("cy").over(wc).alias("cy_k"))
    lo = pre.select(F.col("b").alias("j"),
                    (F.col("cy_k") - F.col("cy")).alias("cy_j0"),
                    (F.col("cw_k") - F.col("n")).alias("cw_j0"))
    hi = pre.select(F.col("b").alias("k"), F.col("cy_k").alias("cy_hi"),
                    F.col("cw_k").alias("cw_hi"))
    amat = (lo.join(hi, F.col("j") <= F.col("k"))
              .select("j", "k",
                      ((F.col("cy_hi") - F.col("cy_j0")).cast("double")
                       / (F.col("cw_hi") - F.col("cw_j0"))).alias("a")))
    i = pre.select(F.col("b").alias("i"))
    inner = (i.join(amat, (F.col("j") <= F.col("i"))
                    & (F.col("k") >= F.col("i")))
              .groupBy("i", "j").agg(F.min("a").alias("m")))
    fit = inner.groupBy("i").agg(F.max("m").alias("iso"))
    return (pre.join(fit, pre.b == fit.i)
               .select(F.col("b").alias("bin"), "n",
                       r6(F.col("sp") / F.col("n")).alias("avg_score"),
                       r6(F.col("cy").cast("double") / F.col("n"))
                       .alias("raw_rate"),
                       r6(F.col("iso")).alias("iso_rate")))


# ---------------------------------------------------------------------------
# 1-D Wasserstein distance and Cramér-von Mises (EDF-distance trio)
# ---------------------------------------------------------------------------

_PV2_SQL = """
v AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp, value
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
pv AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(grp) AS BIGINT) AS c1
  FROM v GROUP BY value),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n0 FROM pv),
edf AS (
  SELECT value, c, c1,
         SUM(c1) OVER (ORDER BY value) AS k1,
         SUM(c - c1) OVER (ORDER BY value) AS k0,
         LEAD(value) OVER (ORDER BY value) AS nxt
  FROM pv)
"""


@query("stat_wasserstein_1d", oracle=f"""
WITH {_PV2_SQL.strip()}
SELECT n.n1, n.n0,
  {r6_sql(dsum_sql(
      "ABS(CAST(k1 AS DOUBLE) / n.n1 - CAST(k0 AS DOUBLE) / n.n0)"
      " * (nxt - value)"))} AS w1
FROM edf, n
WHERE nxt IS NOT NULL
GROUP BY n.n1, n.n0
""")
def stat_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D WASSERSTEIN (earth-mover) DISTANCE between the click and
    non-click value distributions [PK — Vaserstein 1969; in one
    dimension W₁ = ∫|F₁ − F₀| dx, the closed form every
    drift-monitoring stack uses]: the EDF gap integrated over the
    value axis, computed exactly on the distinct-value histogram as
    Σ_v |F₁(v) − F₀(v)| · (next(v) − v). Unlike KS (sup) and AD/CvM
    (probability-weighted), W₁ carries the UNITS of the metric —
    'how far mass must move' — which is why it's the drift metric of
    choice for feature monitoring. Same scale shape as the whole rank
    family: one per-value aggregate, one cumulative window above it,
    DECIMAL-exact final sum. EDF steps are exact integer ratios."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select(F.when(F.col("event_type") == "click", 1).otherwise(0)
                   .alias("grp"), "value"))
    pv = v.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("grp").cast("long").alias("c1"))
    wc = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    wl = W.orderBy("value")
    edf = pv.select(
        "value", "c", "c1",
        F.sum("c1").over(wc).alias("k1"),
        F.sum(F.col("c") - F.col("c1")).over(wc).alias("k0"),
        F.lead("value").over(wl).alias("nxt"))
    n = pv.agg(F.sum("c1").cast("long").alias("n1"),
               F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"))
    j = edf.filter(F.col("nxt").isNotNull()).crossJoin(F.broadcast(n))
    term = (F.abs(F.col("k1").cast("double") / F.col("n1")
                  - F.col("k0").cast("double") / F.col("n0"))
            * (F.col("nxt") - F.col("value")))
    return j.groupBy("n1", "n0").agg(r6(dsum(term)).alias("w1"))


@query("stat_cramer_von_mises_2samp", oracle=f"""
WITH {_PV2_SQL.strip()}
SELECT n.n1, n.n0,
  {r6_sql(dsum_sql(
      "(CAST(c AS DOUBLE) / (n.n1 + n.n0))"
      " * POWER(CAST(k1 AS DOUBLE) / n.n1"
      "         - CAST(k0 AS DOUBLE) / n.n0, 2)"))} AS omega2,
  {r6_sql("CAST(n.n1 AS DOUBLE) * n.n0 / (n.n1 + n.n0) * " + dsum_sql(
      "(CAST(c AS DOUBLE) / (n.n1 + n.n0))"
      " * POWER(CAST(k1 AS DOUBLE) / n.n1"
      "         - CAST(k0 AS DOUBLE) / n.n0, 2)"))} AS t_stat
FROM edf, n
GROUP BY n.n1, n.n0
""")
def stat_cramer_von_mises_2samp(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TWO-SAMPLE CRAMÉR-VON MISES, tie-aware EDF-integral form [PK —
    Anderson 1962; with ties, the criterion integrates against the
    POOLED EDF]: ω² = Σ_v (l_v/N)(F₁(v) − F₀(v))² and the scaled
    T = (n₁n₀/N)·ω² — the mean-square EDF distance completing the
    trio with agg_ks_2sample (sup norm) and
    stat_anderson_darling_2samp (tail-weighted); CvM weighs the BODY
    of the distribution, which makes it the robust default for
    central-shift detection. Right-continuous EDFs at the distinct
    values, multiplicity-weighted — the definition a numpy reference
    pins in tests. Same distinct-value-histogram scale shape as the
    whole family."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select(F.when(F.col("event_type") == "click", 1).otherwise(0)
                   .alias("grp"), "value"))
    pv = v.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("grp").cast("long").alias("c1"))
    wc = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    edf = pv.select(
        "c",
        F.sum("c1").over(wc).alias("k1"),
        F.sum(F.col("c") - F.col("c1")).over(wc).alias("k0"))
    n = pv.agg(F.sum("c1").cast("long").alias("n1"),
               F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"))
    j = edf.crossJoin(F.broadcast(n))
    nn = (F.col("n1") + F.col("n0")).cast("double")
    term = ((F.col("c").cast("double") / nn)
            * F.pow(F.col("k1").cast("double") / F.col("n1")
                    - F.col("k0").cast("double") / F.col("n0"),
                    F.lit(2.0)))
    out = j.groupBy("n1", "n0").agg(dsum(term).alias("o2"))
    return out.select(
        "n1", "n0", r6(F.col("o2")).alias("omega2"),
        r6(F.col("n1").cast("double") * F.col("n0")
           / (F.col("n1") + F.col("n0")) * F.col("o2")).alias("t_stat"))


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals
# ---------------------------------------------------------------------------

_SPLIT5 = "(event_id % 1000003) * 2654435761 % 1000003 % 5"
_ALPHA = 0.1


@query("ml_conformal_split_interval", oracle=f"""
WITH sp AS (
  SELECT event_type, value, event_id,
         {_SPLIT5} AS h
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
mu AS (
  SELECT event_type, {dsum_sql('value')} / COUNT(*) AS mu
  FROM sp WHERE h < 3 GROUP BY event_type),
cal AS (
  SELECT s.event_type, ABS(s.value - mu.mu) AS resid, s.event_id
  FROM sp s JOIN mu ON mu.event_type = s.event_type WHERE s.h = 3),
q AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
         MAX(CASE WHEN rn = kq THEN resid END) AS qa
  FROM (SELECT event_type, resid,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY resid, event_id) AS rn,
               LEAST(CAST(CEIL((COUNT(*) OVER (PARTITION BY event_type)
                                + 1) * {1 - _ALPHA}) AS BIGINT),
                     COUNT(*) OVER (PARTITION BY event_type)) AS kq
        FROM cal)
  GROUP BY event_type),
tst AS (
  SELECT s.event_type,
         CASE WHEN ABS(s.value - mu.mu) <= q.qa THEN 1 ELSE 0 END AS hit
  FROM sp s JOIN mu ON mu.event_type = s.event_type
            JOIN q ON q.event_type = s.event_type
  WHERE s.h = 4)
SELECT q.event_type, q.n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       {r6_sql('MAX(q.qa)')} AS q_alpha,
       CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS coverage
FROM tst JOIN q ON q.event_type = tst.event_type
GROUP BY q.event_type, q.n_cal
""")
def ml_conformal_split_interval(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVALS [PK — Vovk et al. 2005;
    Lei et al. 2018]: the distribution-free interval recipe — fit on
    train (60%, per-type mean), take the ⌈(n+1)(1−α)⌉-th smallest
    absolute calibration residual (20% split) as the half-width
    q_α, and MEASURE coverage on the held-out test split (20%); the
    conformal guarantee says test coverage ≥ 1−α in expectation, and
    a pytest asserts the fixture lands near it. α = {a}; the house
    deterministic hash split keys all three folds. The quantile is an
    EXACT ORDER STATISTIC (row_number under the (resid, event_id)
    total order — no interpolation, no float ambiguity), per-type
    windows only; coverage is a small-int ratio emitted unrounded.
    Scale: one train aggregate, one per-type partitioned sort of the
    CALIBRATION split only (1/5th of data), one test join — the
    model-agnostic wrapper any regression pipeline can afford."""
    ev = load_table(spark, sf_dir, "events")
    sp = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .select("event_type", "value", "event_id",
                    F.expr(_SPLIT5).alias("h")))
    mu = (sp.filter(F.col("h") < 3).groupBy("event_type")
            .agg((dsum("value") / F.count(F.lit(1))).alias("mu")))
    cal = (sp.filter(F.col("h") == 3).join(mu, "event_type")
             .select("event_type",
                     F.abs(F.col("value") - F.col("mu")).alias("resid"),
                     "event_id"))
    wt = W.partitionBy("event_type")
    ranked = cal.select(
        "event_type", "resid",
        F.row_number().over(wt.orderBy("resid", "event_id")).alias("rn"),
        F.least(F.ceil((F.count(F.lit(1)).over(wt) + 1)
                       * (1 - _ALPHA)).cast("long"),
                F.count(F.lit(1)).over(wt)).alias("kq"))
    q = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.max(F.when(F.col("rn") == F.col("kq"), F.col("resid")))
        .alias("qa"))
    tst = (sp.filter(F.col("h") == 4).join(mu, "event_type")
             .join(q, "event_type")
             .select("event_type", "n_cal", "qa",
                     F.when(F.abs(F.col("value") - F.col("mu"))
                            <= F.col("qa"), 1).otherwise(0).alias("hit")))
    return (tst.groupBy("event_type", "n_cal")
               .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
                    r6(F.max("qa")).alias("q_alpha"),
                    (F.sum("hit").cast("double") / F.count(F.lit(1)))
                    .alias("coverage"))
               .select("event_type", "n_cal", "n_test", "q_alpha",
                       "coverage"))


ml_conformal_split_interval.__doc__ = (
    ml_conformal_split_interval.__doc__.replace("{a}", str(_ALPHA)))
