"""Round-11 operator batch M (SURVEY.md §2 growth): Murphy's Brier
decomposition, the ADX directional-movement system, Cuzick's trend
test, and an event-study (dynamic DiD) estimator.

Provenance ([PK], empty reference checkout — SURVEY §0): Murphy 1973
(Brier reliability/resolution/uncertainty); Wilder 1978 (DMI/ADX;
Cutler-style SMA smoothing — the win_rsi precedent — keeps the
recursion-free, order-stable form); Cuzick 1985 (Wilcoxon-type trend
across ordered groups); Jacobson, LaLonde & Sullivan 1993 /
modern event-study practice (per-relative-period treatment effects).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .q_round6j import _SCORED_SQL, _scored
from .registry import query

# ---------------------------------------------------------------------------
# Murphy's Brier decomposition
# ---------------------------------------------------------------------------

_MURPHY_SQL = f"""
WITH {_SCORED_SQL},
b AS (
  SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS pos,
         {dsum_sql('p')} AS sp
  FROM scored GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_b) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS npos
  FROM b),
parts AS (
  SELECT {dsum_sql('n_b * (sp / n_b - CAST(pos AS DOUBLE) / n_b)'
                   ' * (sp / n_b - CAST(pos AS DOUBLE) / n_b)')}
           / MAX(tot.n) AS rel,
         {dsum_sql('n_b * (CAST(pos AS DOUBLE) / n_b'
                   ' - CAST(tot.npos AS DOUBLE) / tot.n)'
                   ' * (CAST(pos AS DOUBLE) / n_b'
                   ' - CAST(tot.npos AS DOUBLE) / tot.n)')}
           / MAX(tot.n) AS res,
         MAX(CAST(tot.npos AS DOUBLE) / tot.n
             * (1.0 - CAST(tot.npos AS DOUBLE) / tot.n)) AS unc
  FROM b, tot),
brier AS (
  SELECT {dsum_sql('(p - y) * (p - y)')}
           / CAST(COUNT(*) AS DOUBLE) AS bs
  FROM scored)
SELECT {r6_sql('parts.rel')} AS reliability,
       {r6_sql('parts.res')} AS resolution,
       {r6_sql('parts.unc')} AS uncertainty,
       {r6_sql('parts.rel - parts.res + parts.unc')} AS brier_binned,
       {r6_sql('brier.bs')} AS brier
FROM parts, brier
"""


@query("ml_brier_decomposition", oracle=_MURPHY_SQL)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MURPHY'S BRIER DECOMPOSITION [PK — Murphy 1973]: split the
    Brier score into RELIABILITY (calibration gap per forecast bin,
    lower better), RESOLUTION (how far bin outcome rates move from
    the base rate, higher better), and UNCERTAINTY (ō(1−ō), the
    irreducible term): BS ≈ REL − RES + UNC on the ECE fixed-width
    bins (exact when forecasts are bin-constant; the raw BS is
    emitted next to the binned identity so the discretization gap is
    visible).  This explains WHICH failure ml_brier_score's single
    number hides — a model can have identical BS from poor
    calibration or weak resolution.  Same score fixture and decile
    geometry as ml_ece_calibration; bin moments run through
    DECIMAL(38,12), assembled with identical double algebra.  Scale:
    one 10-group hash aggregate + one scan aggregate."""
    sc = _scored(spark, sf_dir)
    b = (sc.groupBy(F.least(F.floor(F.col("p") * 10).cast("long"),
                            F.lit(9).cast("long")).alias("bin"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_b"),
                F.sum("y").cast("long").alias("pos"),
                dsum("p").alias("sp")))
    tot = b.agg(F.sum("n_b").cast("long").alias("n"),
                F.sum("pos").cast("long").alias("npos"))
    pb = F.col("sp") / F.col("n_b")
    ob = F.col("pos").cast("double") / F.col("n_b")
    obar = F.col("npos").cast("double") / F.col("n")
    parts = (b.crossJoin(F.broadcast(tot))
              .agg((dsum(F.col("n_b") * (pb - ob) * (pb - ob))
                    / F.max("n")).alias("rel"),
                   (dsum(F.col("n_b") * (ob - obar) * (ob - obar))
                    / F.max("n")).alias("res"),
                   F.max(obar * (1.0 - obar)).alias("unc")))
    brier = sc.agg((dsum((F.col("p") - F.col("y"))
                         * (F.col("p") - F.col("y")))
                    / F.count(F.lit(1)).cast("double")).alias("bs"))
    return (parts.crossJoin(F.broadcast(brier))
                 .select(r6(F.col("rel")).alias("reliability"),
                         r6(F.col("res")).alias("resolution"),
                         r6(F.col("unc")).alias("uncertainty"),
                         r6(F.col("rel") - F.col("res") + F.col("unc"))
                          .alias("brier_binned"),
                         r6(F.col("bs")).alias("brier")))


# ---------------------------------------------------------------------------
# ADX / DMI (Cutler-style SMA smoothing, 14-day)
# ---------------------------------------------------------------------------

_ADX_N = 14

_ADX_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS d, ts, event_id, value
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
hl AS (
  SELECT event_type, d, MAX(value) AS hi, MIN(value) AS lo
  FROM ev GROUP BY 1, 2),
clq AS (
  SELECT event_type, d, value AS cl
  FROM (SELECT event_type, d, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, d
                                  ORDER BY ts DESC, event_id DESC)
                 AS rn
        FROM ev) WHERE rn = 1),
bars AS (
  SELECT hl.event_type, hl.d, hl.hi, hl.lo, clq.cl
  FROM hl JOIN clq USING (event_type, d)),
dm AS (
  SELECT event_type, d, hi, lo, cl,
         hi - LAG(hi) OVER w AS up,
         LAG(lo) OVER w - lo AS dn,
         GREATEST(hi - lo,
                  ABS(hi - LAG(cl) OVER w),
                  ABS(lo - LAG(cl) OVER w)) AS tr
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY d)),
dmv AS (
  SELECT event_type, d,
         CASE WHEN up > dn AND up > 0 THEN up ELSE 0.0 END AS pdm,
         CASE WHEN dn > up AND dn > 0 THEN dn ELSE 0.0 END AS ndm,
         tr
  FROM dm WHERE up IS NOT NULL),
sm AS (
  SELECT event_type, d,
         CAST(SUM(CAST(pdm AS DECIMAL(38,12))) OVER f AS DOUBLE) AS spdm,
         CAST(SUM(CAST(ndm AS DECIMAL(38,12))) OVER f AS DOUBLE) AS sndm,
         CAST(SUM(CAST(tr AS DECIMAL(38,12))) OVER f AS DOUBLE) AS str_,
         COUNT(*) OVER f AS nf
  FROM dmv
  WINDOW f AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN {_ADX_N - 1} PRECEDING AND CURRENT ROW)),
di AS (
  SELECT event_type, d,
         CASE WHEN str_ > 0 THEN 100.0 * spdm / str_ END AS pdi,
         CASE WHEN str_ > 0 THEN 100.0 * sndm / str_ END AS ndi
  FROM sm WHERE nf = {_ADX_N}),
dx AS (
  SELECT event_type, d, pdi, ndi,
         CASE WHEN pdi + ndi > 0
              THEN 100.0 * ABS(pdi - ndi) / (pdi + ndi) END AS dxv
  FROM di),
adx AS (
  SELECT event_type, d, pdi, ndi, dxv,
         CAST(SUM(CAST(dxv AS DECIMAL(38,12))) OVER f AS DOUBLE)
           / {_ADX_N} AS adxv,
         COUNT(dxv) OVER f AS nf2
  FROM dx
  WINDOW f AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN {_ADX_N - 1} PRECEDING AND CURRENT ROW))
SELECT event_type, d,
       {r6_sql('pdi')} AS plus_di, {r6_sql('ndi')} AS minus_di,
       {r6_sql('dxv')} AS dx, {r6_sql('adxv')} AS adx
FROM adx WHERE nf2 = {_ADX_N}
ORDER BY event_type, d
"""


@query("win_adx_dmi", oracle=_ADX_SQL)
def win_adx_dmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADX DIRECTIONAL-MOVEMENT SYSTEM [PK — Wilder 1978; Cutler-SMA
    smoothing per the win_rsi precedent — Wilder's own recursive EWMA
    depends on the series start, the SMA form is a pure sliding
    window]: from each event type's daily OHLC bars, +DM/−DM pick the
    dominant directional move, TR the true range (gap-aware); 14-day
    DECIMAL-summed sliding sums give ±DI = 100·ΣDM/ΣTR, DX =
    100·|+DI − −DI|/(+DI + −DI), and ADX = SMA₁₄(DX) — the trend-
    STRENGTH gauge that completes the indicator family (win_atr
    measures raw volatility, win_donchian_channel the envelope;
    ADX says whether a trend exists at all).  Zero-range and
    warm-up windows yield NULL by the safe-division house rule; rows
    emit only at full double-lookback (day 28+).  Scale: one daily
    aggregate collapses the facts, then three stacked windows over
    the SAME (type, day) partitioning — one exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    evd = ev.select("event_type", F.to_date("ts").alias("d"),
                    "ts", "event_id", "value")
    hl = (evd.groupBy("event_type", "d")
             .agg(F.max("value").alias("hi"),
                  F.min("value").alias("lo")))
    wcl = W.partitionBy("event_type", "d").orderBy(
        F.desc("ts"), F.desc("event_id"))
    clq = (evd.withColumn("rn", F.row_number().over(wcl))
              .filter(F.col("rn") == 1)
              .select("event_type", "d", F.col("value").alias("cl")))
    bars = hl.join(clq, ["event_type", "d"])
    ws = W.partitionBy("event_type").orderBy("d")
    dm = bars.select(
        "event_type", "d", "hi", "lo", "cl",
        (F.col("hi") - F.lag("hi").over(ws)).alias("up"),
        (F.lag("lo").over(ws) - F.col("lo")).alias("dn"),
        F.greatest(F.col("hi") - F.col("lo"),
                   F.abs(F.col("hi") - F.lag("cl").over(ws)),
                   F.abs(F.col("lo") - F.lag("cl").over(ws)))
         .alias("tr"))
    dmv = (dm.filter(F.col("up").isNotNull())
             .select("event_type", "d",
                     F.when((F.col("up") > F.col("dn"))
                            & (F.col("up") > 0), F.col("up"))
                      .otherwise(F.lit(0.0)).alias("pdm"),
                     F.when((F.col("dn") > F.col("up"))
                            & (F.col("dn") > 0), F.col("dn"))
                      .otherwise(F.lit(0.0)).alias("ndm"),
                     "tr"))
    dec = "decimal(38,12)"
    wf = ws.rowsBetween(-(_ADX_N - 1), 0)
    sm = dmv.select(
        "event_type", "d",
        F.sum(F.col("pdm").cast(dec)).over(wf).cast("double")
         .alias("spdm"),
        F.sum(F.col("ndm").cast(dec)).over(wf).cast("double")
         .alias("sndm"),
        F.sum(F.col("tr").cast(dec)).over(wf).cast("double")
         .alias("str_"),
        F.count(F.lit(1)).over(wf).alias("nf"))
    di = (sm.filter(F.col("nf") == _ADX_N)
            .select("event_type", "d",
                    F.when(F.col("str_") > 0,
                           100.0 * F.col("spdm") / F.col("str_"))
                     .alias("pdi"),
                    F.when(F.col("str_") > 0,
                           100.0 * F.col("sndm") / F.col("str_"))
                     .alias("ndi")))
    dx = di.select(
        "event_type", "d", "pdi", "ndi",
        F.when(F.col("pdi") + F.col("ndi") > 0,
               100.0 * F.abs(F.col("pdi") - F.col("ndi"))
               / (F.col("pdi") + F.col("ndi"))).alias("dxv"))
    adx = dx.select(
        "event_type", "d", "pdi", "ndi", "dxv",
        (F.sum(F.col("dxv").cast(dec)).over(wf).cast("double")
         / _ADX_N).alias("adxv"),
        F.count("dxv").over(wf).alias("nf2"))
    return (adx.filter(F.col("nf2") == _ADX_N)
               .select("event_type", "d",
                       r6(F.col("pdi")).alias("plus_di"),
                       r6(F.col("ndi")).alias("minus_di"),
                       r6(F.col("dxv")).alias("dx"),
                       r6(F.col("adxv")).alias("adx"))
               .orderBy("event_type", "d"))


# ---------------------------------------------------------------------------
# Cuzick's trend test
# ---------------------------------------------------------------------------

_CUZICK_SQL = f"""
WITH um AS (
  SELECT user_id, event_type,
         {dsum_sql('value')} / COUNT(value) AS mv
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id, event_type),
gmap AS (
  SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) AS z
  FROM (SELECT DISTINCT event_type FROM um)),
cells AS (
  SELECT um.mv, gmap.z, CAST(COUNT(*) AS BIGINT) AS c
  FROM um JOIN gmap USING (event_type) GROUP BY um.mv, gmap.z),
dv AS (
  SELECT mv, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY mv),
mr AS (
  SELECT mv,
         COALESCE(SUM(t) OVER (ORDER BY mv
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)
           + (t + 1) / 2.0 AS r
  FROM dv),
tt AS (
  SELECT {dsum_sql('cells.z * cells.c * mr.r')} AS t_stat
  FROM cells JOIN mr USING (mv)),
gs AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT z) AS BIGINT) AS k,
         CAST(SUM(z * c) AS BIGINT) AS sz1,
         CAST(SUM(z * z * c) AS BIGINT) AS sz2
  FROM cells)
SELECT gs.n, gs.k, {r6_sql('tt.t_stat')} AS t_stat,
  {r6_sql('(tt.t_stat'
          ' - (CAST(gs.n AS DOUBLE) + 1.0) / 2.0 * gs.sz1)'
          ' / SQRT((CAST(gs.n AS DOUBLE) + 1.0) / 12.0'
          ' * (CAST(gs.n AS DOUBLE) * gs.sz2 - CAST(gs.sz1 AS DOUBLE)'
          ' * gs.sz1))')} AS z
FROM tt, gs
"""


@query("stat_cuzick_trend", oracle=_CUZICK_SQL)
def stat_cuzick_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUZICK'S WILCOXON-TYPE TREND TEST [PK — Cuzick 1985]: rank all
    per-user-per-type means GLOBALLY (midranks), score each ordered
    group with z_j = its lexicographic index, and test T = Σ z_j·R_j
    against its permutation moments E[T] = (N+1)/2·Σn_j z_j and
    Var[T] = (N+1)/12·(N·Σn_j z_j² − (Σn_j z_j)²) — the rank-sum
    weighting of ordered-trend testing, next to
    stat_jonckheere_terpstra's pairwise-U weighting (the two can
    disagree on which monotone departures they flag; publishing both
    is standard epidemiology practice).  Global midranks use the
    distinct-value cells idiom; T runs through DECIMAL(38,12); the
    moments are exact integer algebra under one sqrt (variance is
    permutation-exact for distinct values; midranks keep ties fair in
    T).  Scale: fact volume collapses at the first aggregate; one
    cells-level cumulative window."""
    ev = load_table(spark, sf_dir, "events")
    um = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .groupBy("user_id", "event_type")
            .agg((dsum("value") / F.count("value")).alias("mv")))
    gmap = (um.select("event_type").distinct()
              .withColumn("z", F.row_number()
                          .over(W.orderBy("event_type"))))
    cells = (um.join(F.broadcast(gmap), "event_type")
               .groupBy("mv", "z")
               .agg(F.count(F.lit(1)).cast("long").alias("c")))
    cells = cells.cache()
    dv = cells.groupBy("mv").agg(F.sum("c").cast("long").alias("t"))
    wmr = W.orderBy("mv").rowsBetween(W.unboundedPreceding, -1)
    mr = dv.select(
        "mv", (F.coalesce(F.sum("t").over(wmr),
                          F.lit(0).cast("long"))
               + (F.col("t") + 1) / 2.0).alias("r"))
    tt = (cells.join(mr, "mv")
               .agg(dsum(F.col("z") * F.col("c") * F.col("r"))
                    .alias("t_stat")))
    gs = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.countDistinct("z").cast("long").alias("k"),
        F.sum(F.col("z") * F.col("c")).cast("long").alias("sz1"),
        F.sum(F.col("z") * F.col("z") * F.col("c")).cast("long")
         .alias("sz2"))
    nd = F.col("n").cast("double")
    et = (F.col("n") + 1) / 2.0 * F.col("sz1")
    vt = ((F.col("n") + 1.0) / 12.0
          * (nd * F.col("sz2")
             - F.col("sz1").cast("double") * F.col("sz1")))
    return (tt.crossJoin(F.broadcast(gs))
              .select("n", "k", r6(F.col("t_stat")).alias("t_stat"),
                      r6((F.col("t_stat") - et) / F.sqrt(vt))
                      .alias("z")))


# ---------------------------------------------------------------------------
# Event study (dynamic treatment effects around first signup)
# ---------------------------------------------------------------------------

_ES_WIN = 5

_ES_SQL = f"""
WITH uv AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS y
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
ycell AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM uv GROUP BY y),
ycum AS (
  SELECT y, CAST(SUM(c) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM ycell),
thr AS (
  SELECT MIN(y) AS q FROM ycum
  WHERE cum >= CAST(CEIL(0.9 * n) AS BIGINT)),
treat AS (
  SELECT user_id, MIN(d) AS d0
  FROM uv, thr WHERE uv.y > thr.q GROUP BY user_id),
ctrl AS (
  SELECT uv.d, {dsum_sql('uv.y')} / COUNT(*) AS ybar,
         CAST(COUNT(*) AS BIGINT) AS n_ctrl
  FROM uv LEFT JOIN treat ON uv.user_id = treat.user_id
  WHERE treat.d0 IS NULL OR treat.d0 > uv.d + {_ES_WIN}
  GROUP BY uv.d),
panel AS (
  SELECT CAST(uv.d - treat.d0 AS BIGINT) AS tau,
         uv.y - ctrl.ybar AS diff
  FROM uv JOIN treat ON uv.user_id = treat.user_id
  JOIN ctrl ON ctrl.d = uv.d
  WHERE CAST(uv.d - treat.d0 AS BIGINT)
          BETWEEN -{_ES_WIN} AND {_ES_WIN})
SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_obs,
       {r6_sql(f"{dsum_sql('diff')} / COUNT(*)")} AS effect
FROM panel GROUP BY tau ORDER BY tau
"""

@query("causal_event_study", oracle=_ES_SQL)
def causal_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-STUDY ESTIMATOR (dynamic DiD) [PK — Jacobson, LaLonde &
    Sullivan 1993 lineage]: treatment = a user's first SPIKE day (daily mean above the panel's exact 90th-percentile order statistic);
    for each relative day τ ∈ [−5, +5] the effect is the mean of
    (treated user's daily value − same-calendar-day mean over the
    CLEAN CONTROLS: never-treated users plus not-yet-treated users
    whose own signup is still > 5 days out — on an everyone-
    eventually-signs-up panel the never-treated set is empty, so the
    not-yet-treated form is the standard fix) — the per-period path whose
    pre-period (τ<0) values are the parallel-trends diagnostic that
    causal_did_estimator's single pre/post contrast cannot show (a
    flat pre-path supports the design; a sloped one indicts it).
    Calendar-day control means remove common shocks; both the daily
    panel and the control series come from one aggregate each, joined
    on the day key; all means are DECIMAL-exact.  Scale: facts
    collapse to (user, day) at step one; the control join is
    day-domain-bounded and broadcast-sized."""
    ev = load_table(spark, sf_dir, "events")
    good = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    uv = (good.groupBy("user_id", F.to_date("ts").alias("d"))
              .agg((dsum("value") / F.count("value")).alias("y")))
    uv = uv.cache()
    # Exact 90th-percentile order statistic WITHOUT a raw-row global
    # window: aggregate to distinct-value cells first (ml_auc_roc
    # idiom), cumulate over cells, take the first value whose
    # cumulative count reaches the rank.
    ycell = uv.groupBy("y").agg(F.count(F.lit(1)).cast("long")
                                 .alias("c"))
    wy = W.orderBy("y").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy(F.lit(1))
    ycum = ycell.select(
        "y", F.sum("c").over(wy).cast("long").alias("cum"),
        F.sum("c").over(wall).cast("long").alias("n"))
    thr = (ycum.filter(F.col("cum")
                       >= F.ceil(0.9 * F.col("n")).cast("long"))
               .agg(F.min("y").alias("q")))
    treat = (uv.crossJoin(thr)
               .filter(F.col("y") > F.col("q"))
               .groupBy("user_id").agg(F.min("d").alias("d0")))
    ctrl = (uv.join(treat, "user_id", "left")
              .filter(F.col("d0").isNull()
                      | (F.col("d0") > F.date_add("d", _ES_WIN)))
              .groupBy("d")
              .agg((dsum("y") / F.count(F.lit(1))).alias("ybar"),
                   F.count(F.lit(1)).cast("long").alias("n_ctrl")))
    panel = (uv.join(treat, "user_id")
               .join(F.broadcast(ctrl), "d")
               .select(F.datediff("d", "d0").cast("long").alias("tau"),
                       (F.col("y") - F.col("ybar")).alias("diff"))
               .filter(F.col("tau").between(-_ES_WIN, _ES_WIN)))
    return (panel.groupBy("tau")
                 .agg(F.count(F.lit(1)).cast("long").alias("n_obs"),
                      r6(dsum("diff") / F.count(F.lit(1)))
                      .alias("effect"))
                 .orderBy("tau"))
