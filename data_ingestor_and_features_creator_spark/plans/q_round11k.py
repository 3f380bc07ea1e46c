"""Round-11 operator batch K (SURVEY.md §2 growth): regression
discontinuity, t-closeness, KPSS stationarity, spectral entropy.

Provenance ([PK], empty reference checkout — SURVEY §0): Thistlethwaite
& Campbell 1960 / Imbens & Lemieux 2008 (RDD local-linear); Li, Li &
Venkatasubramanian 2007 (t-closeness, ordered-EMD form); Kwiatkowski,
Phillips, Schmidt & Shin 1992 (KPSS, Bartlett long-run variance);
Inouye et al. 1991 (spectral entropy of the normalized periodogram).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query

# ---------------------------------------------------------------------------
# Regression discontinuity (local linear, sharp design)
# ---------------------------------------------------------------------------

_RDD_BW = 3000.0

_RDD_SQL = f"""
WITH spend AS (
  SELECT c.c_custkey, c.c_acctbal AS x,
         COALESCE(o.tot, 0.0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, {dsum_sql('o_totalprice')} AS tot
             FROM orders GROUP BY o_custkey) o
    ON o.o_custkey = c.c_custkey
  WHERE ABS(c.c_acctbal) <= {_RDD_BW!r}),
sides AS (
  SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side,
         CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * x')} AS sxx, {dsum_sql('x * y')} AS sxy
  FROM spend GROUP BY 1),
fit AS (
  SELECT side, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS a
  FROM sides)
SELECT l.n AS n_l, r.n AS n_r,
       {r6_sql('l.a')} AS intercept_l, {r6_sql('r.a')} AS intercept_r,
       {r6_sql('l.b')} AS slope_l, {r6_sql('r.b')} AS slope_r,
       {r6_sql('r.a - l.a')} AS rdd_effect
FROM fit l, fit r
WHERE l.side = 0 AND r.side = 1
"""


@query("causal_rdd_local_linear", oracle=_RDD_SQL)
def causal_rdd_local_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARP REGRESSION DISCONTINUITY, LOCAL-LINEAR [PK —
    Thistlethwaite & Campbell 1960; Imbens & Lemieux 2008]: running
    variable = account balance, cutoff 0, bandwidth ±3000; outcome =
    the customer's total order spend (0 for never-ordered customers —
    kept, not dropped).  A separate closed-form OLS on each side gives
    the two boundary intercepts; τ̂ = a_R − a_L is the jump at the
    cutoff — the round's causal-family completion next to
    causal_did_estimator (time variation) and causal_iptw_subclass
    (propensity weighting): RDD needs neither a parallel-trends nor an
    unconfoundedness assumption inside the bandwidth.  All five OLS
    sums run through DECIMAL(38,12); slopes/intercepts are identical
    double algebra.  Scale: one aggregate-then-broadcast-join (orders
    pre-aggregated per customer), one 2-group aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .groupBy("o_custkey").agg(dsum("o_totalprice").alias("tot")))
    spend = (c.filter(F.abs("c_acctbal") <= _RDD_BW)
              .join(o, c["c_custkey"] == o["o_custkey"], "left")
              .select(F.col("c_acctbal").alias("x"),
                      F.coalesce(F.col("tot"), F.lit(0.0)).alias("y")))
    sides = (spend.groupBy(
                 F.when(F.col("x") >= 0, 1).otherwise(0).alias("side"))
                  .agg(F.count(F.lit(1)).cast("long").alias("n"),
                       dsum("x").alias("sx"), dsum("y").alias("sy"),
                       dsum(F.col("x") * F.col("x")).alias("sxx"),
                       dsum(F.col("x") * F.col("y")).alias("sxy")))
    b = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    a = (F.col("sy") - b * F.col("sx")) / F.col("n")
    fit = sides.select("side", "n", b.alias("b"), a.alias("a"))
    l = fit.filter(F.col("side") == 0).select(
        F.col("n").alias("n_l"), F.col("a").alias("al"),
        F.col("b").alias("bl"))
    r = fit.filter(F.col("side") == 1).select(
        F.col("n").alias("n_r"), F.col("a").alias("ar"),
        F.col("b").alias("br"))
    return (l.crossJoin(F.broadcast(r))
             .select("n_l", "n_r",
                     r6(F.col("al")).alias("intercept_l"),
                     r6(F.col("ar")).alias("intercept_r"),
                     r6(F.col("bl")).alias("slope_l"),
                     r6(F.col("br")).alias("slope_r"),
                     r6(F.col("ar") - F.col("al")).alias("rdd_effect")))


# ---------------------------------------------------------------------------
# t-closeness audit (ordered EMD)
# ---------------------------------------------------------------------------

_TCLOSE_T = 0.2

_TCLOSE_SQL = f"""
WITH base AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
  FROM customer),
bands AS (SELECT DISTINCT band FROM base),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM bands),
gdist AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS gc FROM base GROUP BY band),
nn AS (SELECT CAST(SUM(gc) AS BIGINT) AS n FROM gdist),
grp AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS ng
  FROM base GROUP BY 1, 2),
cell AS (
  SELECT c_nationkey, c_mktsegment, band, CAST(COUNT(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3),
full_grid AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.ng, b.band,
         COALESCE(cell.c, 0) AS c
  FROM grp g CROSS JOIN bands b
  LEFT JOIN cell ON cell.c_nationkey = g.c_nationkey
   AND cell.c_mktsegment = g.c_mktsegment AND cell.band = b.band),
cum AS (
  SELECT c_nationkey, c_mktsegment, ng, band,
         SUM(CAST(c AS DOUBLE) / ng
             - CAST(gdist.gc AS DOUBLE) / (SELECT n FROM nn))
           OVER (PARTITION BY c_nationkey, c_mktsegment
                 ORDER BY band
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cd,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey, c_mktsegment
                            ORDER BY band) AS rn
  FROM full_grid JOIN gdist USING (band)),
emd AS (
  SELECT c_nationkey, c_mktsegment, MAX(ng) AS n,
         {dsum_sql('ABS(cd)')} / ((SELECT m FROM nb) - 1) AS emd0
  FROM cum WHERE rn < (SELECT m FROM nb)
  GROUP BY 1, 2)
SELECT c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n,
       {r6_sql('emd0')} AS emd,
       COALESCE(emd0 <= CAST({_TCLOSE_T!r} AS DOUBLE), FALSE) AS t_ok
FROM emd
"""


@query("audit_t_closeness", oracle=_TCLOSE_SQL)
def audit_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS AUDIT [PK — Li, Li & Venkatasubramanian 2007],
    completing the release-gate privacy triple with audit_k_anonymity
    (group size) and audit_l_diversity (distinct sensitive values):
    even an l-diverse group leaks when its sensitive DISTRIBUTION
    skews far from the table's — t-closeness bounds the Earth Mover's
    Distance between each QI group's distribution of the ordered
    sensitive attribute (the same acctbal band as l-diversity) and the
    global one: EMD = Σ_{i<m} |cum(p−q)_i| / (m−1).  Every (group ×
    band) cell is materialized (zero-filled grid — the band domain is
    value-bounded, ~12 rows) so absent bands still move mass; the
    cumulative runs in a per-group window whose fixed order makes the
    double fold deterministic, and |cd| sums through DECIMAL(38,12).
    Emits EVERY group with its EMD and the t=0.2 verdict (COALESCEd
    boolean — house rule), not just violators.  Scale: two hash
    aggregates + a domain-bounded grid join; the window frame is the
    band domain."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select("c_nationkey", "c_mktsegment",
                    F.floor(F.col("c_acctbal") / 1000.0).cast("long")
                     .alias("band"))
    base = base.cache()
    bands = base.select("band").distinct()
    nb = bands.agg(F.count(F.lit(1)).cast("long").alias("m"))
    glob = base.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("gc"))
    nn = glob.agg(F.sum("gc").cast("long").alias("n"))
    grp = base.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("ng"))
    cell = base.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    full_grid = (grp.crossJoin(F.broadcast(bands))
                    .join(cell, ["c_nationkey", "c_mktsegment", "band"],
                          "left")
                    .select("c_nationkey", "c_mktsegment", "ng", "band",
                            F.coalesce(F.col("c"),
                                       F.lit(0).cast("long"))
                             .alias("c")))
    wg = W.partitionBy("c_nationkey", "c_mktsegment")
    wc = wg.orderBy("band").rowsBetween(W.unboundedPreceding, 0)
    cum = (full_grid.join(F.broadcast(glob), "band")
                    .crossJoin(F.broadcast(nn))
                    .withColumn("cd",
                                F.sum(F.col("c").cast("double")
                                      / F.col("ng")
                                      - F.col("gc").cast("double")
                                      / F.col("n")).over(wc))
                    .withColumn("rn",
                                F.row_number().over(wg.orderBy("band"))))
    emd = (cum.crossJoin(F.broadcast(nb))
              .filter(F.col("rn") < F.col("m"))
              .groupBy("c_nationkey", "c_mktsegment")
              .agg(F.max("ng").cast("long").alias("n"),
                   (dsum(F.abs("cd")) / (F.max("m") - 1)).alias("emd")))
    return emd.select("c_nationkey", "c_mktsegment", "n",
                      r6(F.col("emd")).alias("emd"),
                      F.coalesce(F.col("emd") <= _TCLOSE_T,
                                 F.lit(False)).alias("t_ok"))


# ---------------------------------------------------------------------------
# KPSS level-stationarity statistic
# ---------------------------------------------------------------------------

_KPSS_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
idx AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily),
mu AS (
  SELECT event_type, {dsum_sql('x')} / COUNT(*) AS m
  FROM idx GROUP BY event_type),
e AS (
  SELECT idx.event_type, idx.t, idx.n, idx.x - mu.m AS e
  FROM idx JOIN mu USING (event_type)),
s AS (
  SELECT event_type, t, n, e,
         SUM(e) OVER (PARTITION BY event_type ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS st
  FROM e),
eta AS (
  SELECT event_type, MAX(n) AS n,
         CAST(FLOOR(4.0 * SQRT(SQRT(MAX(n) / 100.0))) AS BIGINT) AS l,
         {dsum_sql('st * st')} / (CAST(MAX(n) AS DOUBLE) * MAX(n))
           AS eta
  FROM s GROUP BY event_type),
jt AS (
  SELECT eta.event_type, j.j, eta.l, eta.n
  FROM eta CROSS JOIN (SELECT UNNEST(generate_series(1, 20)) AS j) j
  WHERE j.j <= eta.l),
gam AS (
  SELECT a.event_type, jt.j,
         {dsum_sql('a.e * b.e')} / MAX(jt.n) AS g
  FROM jt JOIN e a ON a.event_type = jt.event_type
  JOIN e b ON b.event_type = a.event_type AND b.t = a.t - jt.j
  GROUP BY a.event_type, jt.j),
g0 AS (
  SELECT event_type, {dsum_sql('e * e')} / MAX(n) AS g0
  FROM e GROUP BY event_type),
wsum AS (
  SELECT gam.event_type,
         {dsum_sql('(1.0 - CAST(gam.j AS DOUBLE) / (eta.l + 1))'
                   ' * gam.g')} AS ws
  FROM gam JOIN eta ON eta.event_type = gam.event_type
  GROUP BY gam.event_type),
lrv AS (
  SELECT eta.event_type, eta.n, eta.l, eta.eta,
         g0.g0 + 2.0 * COALESCE(wsum.ws, 0.0) AS s2
  FROM eta JOIN g0 USING (event_type)
  LEFT JOIN wsum USING (event_type))
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(l AS BIGINT) AS l,
       {r6_sql('eta')} AS eta, {r6_sql('s2')} AS s2,
       {r6_sql('eta / s2')} AS kpss
FROM lrv ORDER BY event_type
"""


@query("ts_kpss_stat", oracle=_KPSS_SQL)
def ts_kpss_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS LEVEL-STATIONARITY STATISTIC [PK — Kwiatkowski, Phillips,
    Schmidt & Shin 1992]: the null-reversed companion to ts_adf_stat —
    ADF's null is a unit root, KPSS's null is stationarity, and the
    two together classify a series (reject both → neither model).
    Per event type's daily-mean series: η = n⁻²ΣS_t² over the partial
    sums of the demeaned series, divided by the Bartlett long-run
    variance s² = γ₀ + 2Σ_{j≤l}(1 − j/(l+1))γ_j with the standard
    bandwidth l = ⌊4(n/100)^¼⌋ — computed as SQRT(SQRT(·)), which is
    IEEE-exact on both engines (no transcendental drift in the floor).
    Lag covariances come from an equi-join of the series to itself at
    offset j (j ≤ l exploded from a bounded sequence); every sum runs
    through DECIMAL(38,12).  Scale: the fact table collapses to one
    row per (type, day) at step one; the lag join fans out only
    l ≈ 4-7 rows per point."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("x")))
    wt = W.partitionBy("event_type").orderBy("d")
    wn = W.partitionBy("event_type")
    idx = daily.select("event_type", "x",
                       F.row_number().over(wt).alias("t"),
                       F.count(F.lit(1)).over(wn).cast("long")
                        .alias("n"))
    mu = idx.groupBy("event_type").agg(
        (dsum("x") / F.count(F.lit(1))).alias("m"))
    e = (idx.join(F.broadcast(mu), "event_type")
            .select("event_type", "t", "n",
                    (F.col("x") - F.col("m")).alias("e")))
    e = e.cache()
    ws = W.partitionBy("event_type").orderBy("t").rowsBetween(
        W.unboundedPreceding, 0)
    s = e.withColumn("st", F.sum("e").over(ws))
    eta = s.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.floor(4.0 * F.sqrt(F.sqrt(F.max("n") / 100.0)))
         .cast("long").alias("l"),
        (dsum(F.col("st") * F.col("st"))
         / (F.max("n").cast("double") * F.max("n"))).alias("eta"))
    jt = (eta.select("event_type", "l", "n",
                     F.explode(F.sequence(F.lit(1), F.lit(20)))
                      .alias("j"))
             .filter(F.col("j") <= F.col("l")))
    a = e.select(F.col("event_type").alias("et"), F.col("t").alias("ta"),
                 F.col("e").alias("ea"))
    bb = e.select(F.col("event_type").alias("et2"),
                  F.col("t").alias("tb"), F.col("e").alias("eb"))
    gam = (jt.join(a, jt["event_type"] == a["et"])
             .join(bb, (F.col("et2") == F.col("et"))
                   & (F.col("tb") == F.col("ta") - F.col("j")))
             .groupBy("event_type", "j")
             .agg((dsum(F.col("ea") * F.col("eb")) / F.max("n"))
                  .alias("g")))
    g0 = e.groupBy("event_type").agg(
        (dsum(F.col("e") * F.col("e")) / F.max("n")).alias("g0"))
    wsum = (gam.join(F.broadcast(eta.select("event_type", "l")),
                     "event_type")
               .groupBy("event_type")
               .agg(dsum((1.0 - F.col("j").cast("double")
                          / (F.col("l") + 1)) * F.col("g"))
                    .alias("ws")))
    lrv = (eta.join(F.broadcast(g0), "event_type")
              .join(F.broadcast(wsum), "event_type", "left")
              .select("event_type", "n", "l", "eta",
                      (F.col("g0")
                       + 2.0 * F.coalesce(F.col("ws"), F.lit(0.0)))
                      .alias("s2")))
    return (lrv.select("event_type", F.col("n").cast("long").alias("n"),
                       F.col("l").cast("long").alias("l"),
                       r6(F.col("eta")).alias("eta"),
                       r6(F.col("s2")).alias("s2"),
                       r6(F.col("eta") / F.col("s2")).alias("kpss"))
               .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Spectral entropy of the daily series
# ---------------------------------------------------------------------------

_SPEC_K = 8
_TWO_PI = 2.0 * math.pi


_SPEC_SQL = f"""
WITH idx_src AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
idx AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM idx_src),
mu AS (
  SELECT event_type, {dsum_sql('x')} / COUNT(*) AS m
  FROM idx GROUP BY event_type),
e AS (
  SELECT idx.event_type, idx.t, idx.n, idx.x - mu.m AS e
  FROM idx JOIN mu USING (event_type)),
hk AS (
  SELECT e.event_type, k.k,
         {dsum_sql(f'e.e * ROUND(COS({_TWO_PI!r} * k.k * e.t / e.n), 9)')}
           AS a,
         {dsum_sql(f'e.e * ROUND(SIN({_TWO_PI!r} * k.k * e.t / e.n), 9)')}
           AS b
  FROM e, UNNEST(generate_series(1, {_SPEC_K})) AS k(k)
  GROUP BY e.event_type, k.k),
pw AS (
  SELECT event_type, k, a * a + b * b AS p FROM hk),
tot AS (
  SELECT event_type, {dsum_sql('p')} AS sp FROM pw
  GROUP BY event_type),
norm AS (
  SELECT pw.event_type, pw.k,
         CASE WHEN tot.sp > 0 THEN pw.p / tot.sp END AS pk
  FROM pw JOIN tot USING (event_type)),
ent AS (
  SELECT event_type,
         {dsum_sql('CASE WHEN pk IS NULL THEN NULL WHEN pk > 0'
                   ' THEN -pk * ROUND(LN(pk), 9) ELSE 0.0 END')} AS h
  FROM norm GROUP BY event_type),
peak AS (
  SELECT event_type, k AS peak_k
  FROM (SELECT event_type, k,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY p DESC, k) AS pr
        FROM pw)
  WHERE pr = 1)
SELECT ent.event_type, {r6_sql('ent.h')} AS spec_entropy,
       {r6_sql(f'ent.h / LN({_SPEC_K})')} AS spec_entropy_norm,
       CAST(peak.peak_k AS BIGINT) AS peak_k
FROM ent JOIN peak USING (event_type)
ORDER BY ent.event_type
"""


@query("ts_spectral_entropy", oracle=_SPEC_SQL)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL ENTROPY [PK — Inouye et al. 1991]: Shannon entropy of
    the normalized periodogram — low entropy = power concentrated in
    one frequency (a strongly periodic series), high = white-noise
    flat; the single-number periodicity detector that complements
    ts_seasonal_strength (one fixed period) by scanning the first
    K=8 harmonics of each event type's daily series.  Goertzel-style
    direct projection (Σe·cos, Σe·sin per harmonic) instead of an
    FFT — O(nK) with everything in one join-free aggregate per
    harmonic; each trig factor is pinned to 9 dp (agg_circular_mean
    precedent: libm sin/cos drift a ulp cross-engine), products run
    through DECIMAL(38,12), and ln(p_k) is pinned likewise.  Also
    emits the dominant harmonic (ties → lowest k).  Scale: fact rows
    collapse to (type, day) at step one; the harmonic fan-out is a
    constant K."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("x")))
    wt = W.partitionBy("event_type").orderBy("d")
    wn = W.partitionBy("event_type")
    idx = daily.select("event_type", "x",
                       F.row_number().over(wt).alias("t"),
                       F.count(F.lit(1)).over(wn).cast("long")
                        .alias("n"))
    mu = idx.groupBy("event_type").agg(
        (dsum("x") / F.count(F.lit(1))).alias("m"))
    e = (idx.join(F.broadcast(mu), "event_type")
            .select("event_type", "t", "n",
                    (F.col("x") - F.col("m")).alias("e")))
    arg = (F.lit(_TWO_PI) * F.col("k") * F.col("t") / F.col("n"))
    hk = (e.select("event_type", "t", "n", "e",
                   F.explode(F.sequence(F.lit(1), F.lit(_SPEC_K)))
                    .alias("k"))
           .groupBy("event_type", "k")
           .agg(dsum(F.col("e") * F.round(F.cos(arg), 9)).alias("a"),
                dsum(F.col("e") * F.round(F.sin(arg), 9)).alias("b")))
    pw = hk.select("event_type", "k",
                   (F.col("a") * F.col("a")
                    + F.col("b") * F.col("b")).alias("p"))
    pw = pw.cache()
    # A power-degenerate series (exactly periodic daily means leave
    # residual projections below the DECIMAL(38,12) quantum — observed
    # on the skew fixture) keeps its row with NULL entropy instead of
    # being dropped (vacuous-empty) or dividing by zero.
    tot = pw.groupBy("event_type").agg(dsum("p").alias("sp"))
    norm = (pw.join(F.broadcast(tot), "event_type")
              .select("event_type", "k",
                      F.when(F.col("sp") > 0,
                             F.col("p") / F.col("sp")).alias("pk")))
    ent = norm.groupBy("event_type").agg(
        dsum(F.when(F.col("pk").isNull(),
                    F.lit(None).cast("double"))
              .when(F.col("pk") > 0,
                    -F.col("pk") * F.round(F.log("pk"), 9))
              .otherwise(F.lit(0.0))).alias("h"))
    wpk = W.partitionBy("event_type").orderBy(F.desc("p"), "k")
    peak = (pw.withColumn("pr", F.row_number().over(wpk))
              .filter(F.col("pr") == 1)
              .select("event_type", F.col("k").cast("long")
                       .alias("peak_k")))
    return (ent.join(F.broadcast(peak), "event_type")
               .select("event_type", r6(F.col("h")).alias("spec_entropy"),
                       r6(F.col("h") / math.log(_SPEC_K))
                       .alias("spec_entropy_norm"), "peak_k")
               .orderBy("event_type"))
