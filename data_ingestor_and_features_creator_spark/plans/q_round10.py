"""Round-10 operator batch (SURVEY.md §2 growth): multiple-testing
control (Benjamini-Hochberg over Chebyshev-exact p-bounds), Kendall
τ-b rank association on the bucketed contingency, the deterministic
bottom-k hash-priority sample, classifier threshold metrics
(precision/recall/F1/MCC), PACF via Durbin-Levinson, rolling Sharpe,
and per-user seasonal strength.

House rules throughout (plans/registry.py): decimal-exact sums,
aliases identical on both engines, r6 only on final emissions,
booleans never NULL, no unpartitioned windows over raw rows, no
static broadcast hints on SF-scaling sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))


_EV_SQL = ("SELECT * FROM events "
           "WHERE value IS NOT NULL AND NOT isnan(value)")


# ---------------------------------------------------------------------------
# Threshold classification metrics (precision/recall/F1/MCC at p >= 0.5)
# ---------------------------------------------------------------------------

@query("ml_threshold_confusion", oracle=f"""
WITH m AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
scored AS (
  SELECT CASE WHEN 0.02 + 0.96 * (e.value - m.vmin) / (m.vmax - m.vmin)
                   >= 0.5 THEN 1 ELSE 0 END AS yh,
         CASE WHEN e.event_type IN ('click', 'purchase')
              THEN 1 ELSE 0 END AS y
  FROM events e, m
  WHERE e.value IS NOT NULL AND NOT isnan(e.value)),
c AS (
  SELECT CAST(SUM(CASE WHEN y = 1 AND yh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN y = 0 AND yh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN y = 1 AND yh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN y = 0 AND yh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored)
SELECT tp, fp, fn, tn,
  CASE WHEN tp + fp > 0
       THEN {r6_sql('CAST(tp AS DOUBLE) / (tp + fp)')} END AS precision_,
  CASE WHEN tp + fn > 0
       THEN {r6_sql('CAST(tp AS DOUBLE) / (tp + fn)')} END AS recall_,
  CASE WHEN 2 * tp + fp + fn > 0
       THEN {r6_sql('2.0 * tp / (2 * tp + fp + fn)')} END AS f1,
  CASE WHEN (tp+fp) * (tp+fn) > 0 AND (tn+fp) * (tn+fn) > 0
       THEN {r6_sql('(CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)'
                    ' / SQRT(CAST((tp+fp) * (tp+fn) AS DOUBLE)'
                    '        * CAST((tn+fp) * (tn+fn) AS DOUBLE))')}
  END AS mcc
FROM c
""")
def ml_threshold_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFUSION-MATRIX METRICS at a fixed decision threshold — the
    deploy-time companion to the threshold-free ml_auc_roc (same
    deterministic min-max score construction, q_round6j._scored):
    precision / recall / F1 / Matthews correlation from the four
    integer-exact cells. The MCC denominator multiplies four ~n-sized
    sums — pairwise BIGINT products are exact, the cross product runs
    in double with ONE identically-ordered rounding on both engines,
    sqrt is IEEE-exact, so the emitted 6-dp values cannot diverge.
    Scale: one scan, one scalar aggregate (map-side combinable), a
    1-row broadcast for the min/max frame."""
    from .q_round6j import _scored

    sc = _scored(spark, sf_dir).select(
        (F.col("p") >= 0.5).cast("int").alias("yh"), "y")
    y, yh = F.col("y"), F.col("yh")
    c = sc.agg(
        F.sum(((y == 1) & (yh == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (yh == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (yh == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (yh == 0)).cast("long")).alias("tn"))
    tp, fp, fn, tn = (F.col(c_) for c_ in ("tp", "fp", "fn", "tn"))
    mcc_den = F.sqrt(((tp + fp) * (tp + fn)).cast("double")
                     * ((tn + fp) * (tn + fn)).cast("double"))
    return c.select(
        "tp", "fp", "fn", "tn",
        F.when(tp + fp > 0, r6(tp.cast("double") / (tp + fp)))
         .alias("precision_"),
        F.when(tp + fn > 0, r6(tp.cast("double") / (tp + fn)))
         .alias("recall_"),
        F.when(2 * tp + fp + fn > 0,
               r6(2.0 * tp / (2 * tp + fp + fn))).alias("f1"),
        F.when(((tp + fp) * (tp + fn) > 0) & ((tn + fp) * (tn + fn) > 0),
               r6((tp.cast("double") * tn - fp.cast("double") * fn)
                  / mcc_den)).alias("mcc"))


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over Chebyshev-exact p-bounds
# ---------------------------------------------------------------------------

@query("stat_bh_fdr", oracle=f"""
WITH f AS ({_EV_SQL}),
g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_all,
             {dsum_sql('value')} AS s_all,
             {dsum_sql('value*value')} AS ss_all
      FROM f),
t AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n_g,
             {dsum_sql('value')} AS s_g
      FROM f GROUP BY event_type),
p AS (SELECT event_type, CAST(n_g AS BIGINT) AS n,
             LEAST(1.0, (ss_all / n_all - (s_all / n_all) * (s_all / n_all))
                        / (n_g * (s_g / n_g - s_all / n_all)
                               * (s_g / n_g - s_all / n_all))) AS pval,
             (SELECT COUNT(*) FROM t) AS m
      FROM t, g
      WHERE ss_all / n_all - (s_all / n_all) * (s_all / n_all) > 0
        AND s_g / n_g <> s_all / n_all),
r AS (SELECT event_type, n, pval, m,
             row_number() OVER (ORDER BY pval, event_type) AS i
      FROM p)
SELECT event_type, n, {r6_sql('pval')} AS p_cheb,
       {r6_sql('LEAST(1.0, MIN(pval * m / i) OVER ('
               'ORDER BY pval, event_type ROWS BETWEEN CURRENT ROW '
               'AND UNBOUNDED FOLLOWING))')} AS q_bh,
       LEAST(1.0, MIN(pval * m / i) OVER (ORDER BY pval, event_type
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) <= 0.1
         AS reject_10
FROM r
""")
def stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR control across the per-event-type
    mean-shift family [PK — BH 1995]: p-values sorted ascending,
    q(i) = min_{j≥i} p(j)·m/j, reject where q ≤ α — the correction
    every metrics platform applies before flagging "significant"
    segments, because at m segments the naive per-test α fires m·α
    false alarms.

    The p-values are CHEBYSHEV BOUNDS p = min(1, 1/z²) with
    z² = n_g·(mean_g − mean_all)²/var_all — deliberately chosen over
    a normal-CDF p: Chebyshev is a VALID (conservative) p-value under
    any distribution and is pure rational arithmetic on decimal-exact
    sums, so both engines compute bit-identical doubles where
    erf/normal tails would drift a ulp (functions/exact.py libm
    rule). Scale: one scan, one per-type aggregate, one window over
    the |types|-row aggregate (bounded — the global-window rule's
    aggregate exemption)."""
    f = _ev(spark, sf_dir)
    g = f.agg(F.count(F.lit(1)).cast("double").alias("n_all"),
              dsum("value").alias("s_all"),
              dsum(F.col("value") * F.col("value")).alias("ss_all"))
    t = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_g"),
        dsum("value").alias("s_g"))
    mean_all = F.col("s_all") / F.col("n_all")
    var_all = F.col("ss_all") / F.col("n_all") - mean_all * mean_all
    diff = F.col("s_g") / F.col("n_g") - mean_all
    j = (t.crossJoin(F.broadcast(g))
          .filter((var_all > 0) & (diff != 0))
          .select("event_type", F.col("n_g").cast("long").alias("n"),
                  F.least(F.lit(1.0),
                          var_all / (F.col("n_g") * diff * diff))
                   .alias("pval")))
    # m = the FULL family size (every tested event type, counted from t
    # BEFORE the degenerate-row filter — matching the oracle's
    # (SELECT COUNT(*) FROM t) and BH semantics: a group whose mean
    # equals the global mean is a tested hypothesis with p = 1, not a
    # shrunken family; ADVICE r10).
    m = t.agg(F.count(F.lit(1)).alias("m"))
    wq = W.orderBy("pval", "event_type") \
          .rowsBetween(W.currentRow, W.unboundedFollowing)
    wi = W.orderBy("pval", "event_type")
    ranked = (j.crossJoin(F.broadcast(m))
               .withColumn("i", F.row_number().over(wi)))
    q = F.least(F.lit(1.0),
                F.min(F.col("pval") * F.col("m") / F.col("i")).over(wq))
    return ranked.select("event_type", "n",
                         r6(F.col("pval")).alias("p_cheb"),
                         r6(q).alias("q_bh"),
                         (q <= 0.1).alias("reject_10"))


# ---------------------------------------------------------------------------
# Deterministic bottom-k hash-priority sample (the distributed reservoir)
# ---------------------------------------------------------------------------

_SAMPLE_K = 500


@query("data_sample_hash_priority", oracle=f"""
SELECT event_id, user_id, md5(CAST(event_id AS VARCHAR)) AS pri
FROM events
ORDER BY pri, event_id
LIMIT {_SAMPLE_K}
""")
def data_sample_hash_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTTOM-K HASH-PRIORITY SAMPLE — the deterministic distributed
    reservoir [PK — priority sampling / bottom-k sketches]: assign
    every row priority md5(key) and keep the k smallest. Uniform over
    any key domain, REPRODUCIBLE (no RNG state), mergeable across
    partitions and across days (union → re-take bottom-k), and
    one-pass: Spark executes it as TakeOrderedAndProject — per-
    partition top-k heaps, never a global sort — which is exactly the
    shape that samples 100 TB without shuffling it. Complements the
    stratified/systematic samplers (hash-priority needs no frame or
    strata). md5 is the cross-engine-identical priority (the dedup
    family's convention); event_id tiebreak pins a total order."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.select("event_id", "user_id",
                      F.md5(F.col("event_id").cast("string")).alias("pri"))
              .orderBy("pri", "event_id")
              .limit(_SAMPLE_K))


# ---------------------------------------------------------------------------
# Kendall's tau-b on the bucketed contingency (exact pair counting)
# ---------------------------------------------------------------------------

@query("stat_kendall_tau_b", oracle=f"""
WITH f AS ({_EV_SQL}),
cells AS (
  SELECT event_type, CAST(FLOOR(value / 25) AS BIGINT) AS x,
         CAST(hour(ts) // 6 AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM f GROUP BY event_type, x, y),
pairs AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.x > a.x AND b.y > a.y
                       THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc,
         CAST(SUM(CASE WHEN b.x > a.x AND b.y < a.y
                       THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc
  FROM cells a JOIN cells b USING (event_type)
  GROUP BY a.event_type),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS joint_t
  FROM cells GROUP BY event_type),
tx AS (SELECT event_type, CAST(SUM(cx * (cx - 1) / 2) AS BIGINT) AS n1t
       FROM (SELECT event_type, x, SUM(c) AS cx FROM cells
             GROUP BY event_type, x) GROUP BY event_type),
ty AS (SELECT event_type, CAST(SUM(cy * (cy - 1) / 2) AS BIGINT) AS n2t
       FROM (SELECT event_type, y, SUM(c) AS cy FROM cells
             GROUP BY event_type, y) GROUP BY event_type)
SELECT p.event_type, t.n, p.conc, p.disc,
       CASE WHEN (t.n * (t.n - 1) / 2 - x.n1t) > 0
                 AND (t.n * (t.n - 1) / 2 - y.n2t) > 0
            THEN {r6_sql(
                'CAST(p.conc - p.disc AS DOUBLE)'
                ' / SQRT(CAST(t.n * (t.n - 1) / 2 - x.n1t AS DOUBLE)'
                '        * CAST(t.n * (t.n - 1) / 2 - y.n2t AS DOUBLE))')}
       END AS tau_b
FROM pairs p JOIN tot t USING (event_type)
             JOIN tx x USING (event_type)
             JOIN ty y USING (event_type)
""")
def stat_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S τ-b per event type between the value band
    (floor(value/25)) and the time-of-day band (hour//6) [PK —
    Kendall 1945 tie-corrected form]: the rank-association measure
    robust to monotone transforms, completing the correlation family
    next to Pearson (agg_corr_covar) and Spearman (stat_spearman_corr).
    Computed EXACTLY on the bucketed CONTINGENCY — concordant /
    discordant pairs are Σ n₁·n₂ over cell pairs, tie terms come from
    the margins — which is also the SCALABLE form: raw-pair τ is
    O(n²) in rows, the contingency form is O(cells²) with cells
    bounded by the band grids (≤ ~10×4 here), independent of row
    count. All counting is BIGINT-exact; only the final ratio touches
    doubles (pairwise-exact casts, identically-ordered product, IEEE
    sqrt). The tie-aware denominator √((n₀−n₁)(n₀−n₂)) keeps |τ| ≤ 1
    under heavy ties. Scale: one hash aggregate to cells, a tiny
    cells self-join per type, three margin aggregates."""
    f = _ev(spark, sf_dir)
    cells = (f.groupBy("event_type",
                       F.floor(F.col("value") / 25).cast("long").alias("x"),
                       F.floor(F.hour("ts") / 6).cast("long").alias("y"))
              .agg(F.count(F.lit(1)).alias("c"))).cache()
    a = cells.select("event_type", F.col("x").alias("xa"),
                     F.col("y").alias("ya"), F.col("c").alias("ca"))
    b = cells.select("event_type", F.col("x").alias("xb"),
                     F.col("y").alias("yb"), F.col("c").alias("cb"))
    pairs = (a.join(b, "event_type")
              .groupBy("event_type")
              .agg(F.sum(F.when((F.col("xb") > F.col("xa"))
                                & (F.col("yb") > F.col("ya")),
                                F.col("ca") * F.col("cb")).otherwise(0))
                    .cast("long").alias("conc"),
                   F.sum(F.when((F.col("xb") > F.col("xa"))
                                & (F.col("yb") < F.col("ya")),
                                F.col("ca") * F.col("cb")).otherwise(0))
                    .cast("long").alias("disc")))
    tot = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"))
    n1t = (cells.groupBy("event_type", "x")
                .agg(F.sum("c").alias("cx"))
                .groupBy("event_type")
                .agg(F.sum(F.col("cx") * (F.col("cx") - 1) / 2)
                      .cast("long").alias("n1t")))
    n2t = (cells.groupBy("event_type", "y")
                .agg(F.sum("c").alias("cy"))
                .groupBy("event_type")
                .agg(F.sum(F.col("cy") * (F.col("cy") - 1) / 2)
                      .cast("long").alias("n2t")))
    j = (pairs.join(tot, "event_type").join(n1t, "event_type")
              .join(n2t, "event_type"))
    n0 = F.col("n") * (F.col("n") - 1) / 2
    dx = (n0 - F.col("n1t")).cast("double")
    dy = (n0 - F.col("n2t")).cast("double")
    tau = F.when((dx > 0) & (dy > 0),
                 r6((F.col("conc") - F.col("disc")).cast("double")
                    / F.sqrt(dx * dy)))
    return j.select("event_type", "n", "conc", "disc", tau.alias("tau_b"))


# ---------------------------------------------------------------------------
# Partial autocorrelation (Durbin-Levinson on the lag-1..3 ACF)
# ---------------------------------------------------------------------------

def _rho_sql(k: int) -> str:
    # (ROUND(..) + 0.0) — the r6_sql signed-zero normalization (fourth
    # float rule): a lag correlation rounding to zero FROM BELOW is
    # −0.0 under DuckDB's IEEE round but +0.0 from Spark's BigDecimal
    # F.round, and pacf1 emits this value directly (ADVICE r10).
    n = f"n{k}"
    return (f"CASE WHEN {n} >= 3 AND ({n} * sxx{k} - sx{k} * sx{k}) > 0"
            f" AND ({n} * syy{k} - sy{k} * sy{k}) > 0"
            f" THEN (ROUND(({n} * sxy{k} - sx{k} * sy{k})"
            f" / (SQRT({n} * sxx{k} - sx{k} * sx{k})"
            f" * SQRT({n} * syy{k} - sy{k} * sy{k})), 6) + 0.0) END")


@query("ts_pacf_durbin_levinson", oracle=f"""
WITH v AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
l AS (
  SELECT user_id, value AS x,
         lag(value, 1) OVER w AS y1,
         lag(value, 2) OVER w AS y2,
         lag(value, 3) OVER w AS y3
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id,
    {', '.join(
        f"CAST(COUNT(y{k}) AS DOUBLE) AS n{k}, "
        + dsum_sql(f"CASE WHEN y{k} IS NOT NULL THEN x END") + f" AS sx{k}, "
        + dsum_sql(f"y{k}") + f" AS sy{k}, "
        + dsum_sql(f"CASE WHEN y{k} IS NOT NULL THEN x * x END")
        + f" AS sxx{k}, "
        + dsum_sql(f"y{k} * y{k}") + f" AS syy{k}, "
        + dsum_sql(f"x * y{k}") + f" AS sxy{k}"
        for k in (1, 2, 3))}
  FROM l GROUP BY user_id),
rho AS (
  SELECT user_id, CAST(n3 AS BIGINT) AS n_lag3,
         {_rho_sql(1)} AS r1, {_rho_sql(2)} AS r2, {_rho_sql(3)} AS r3
  FROM s),
d2 AS (
  SELECT *, CASE WHEN 1 - r1 * r1 <> 0
                 THEN (r2 - r1 * r1) / (1 - r1 * r1) END AS p2
  FROM rho)
SELECT user_id, n_lag3, r1 AS pacf1,
       {r6_sql('p2')} AS pacf2,
       {r6_sql('CASE WHEN 1 - (r1 * (1 - p2)) * r1 - p2 * r2 <> 0'
               ' THEN (r3 - (r1 * (1 - p2)) * r2 - p2 * r1)'
               '      / (1 - (r1 * (1 - p2)) * r1 - p2 * r2) END')}
         AS pacf3
FROM d2
""")
def ts_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL AUTOCORRELATION at lags 1-3 per user via the
    Durbin-Levinson recursion on the sample ACF [PK — Box & Jenkins;
    the AR-order-selection plot next to ts_acf_multi_lag's MA view]:
    φ₁₁ = ρ₁; φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²);
    φ₃₃ = (ρ₃ − φ₂₁ρ₂ − φ₂₂ρ₁)/(1 − φ₂₁ρ₁ − φ₂₂ρ₂), φ₂₁ = ρ₁(1 − φ₂₂).
    The ρₖ use the house per-lag Pearson construction (ts_acf_multi_lag
    — six decimal-exact sums per lag from ONE window sort) and are
    6-dp-ROUNDED BEFORE the recursion: the recursion is then pure
    rational arithmetic on identical inputs, so both engines emit
    bit-identical φ (the r6-then-derive discipline that keeps chained
    float expressions off the cross-engine boundary). Degenerate
    denominators (|ρ₁| = 1, short series) yield NULL. Scale: one
    (user, ts) window sort feeding three lag columns, one hash
    aggregate — identical cost to the ACF op it extends."""
    ev = _ev(spark, sf_dir)
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", F.col("value").alias("x"),
        *[F.lag("value", k).over(wl).alias(f"y{k}") for k in (1, 2, 3)])
    aggs = []
    for k in (1, 2, 3):
        yk = F.col(f"y{k}")
        xm = F.when(yk.isNotNull(), F.col("x"))
        aggs += [F.count(yk).cast("double").alias(f"n{k}"),
                 dsum(xm).alias(f"sx{k}"), dsum(yk).alias(f"sy{k}"),
                 dsum(xm * xm).alias(f"sxx{k}"),
                 dsum(yk * yk).alias(f"syy{k}"),
                 dsum(F.col("x") * yk).alias(f"sxy{k}")]
    s = lagged.groupBy("user_id").agg(*aggs)

    def rho(k: int) -> F.Column:
        n = F.col(f"n{k}")
        num = n * F.col(f"sxy{k}") - F.col(f"sx{k}") * F.col(f"sy{k}")
        vx = n * F.col(f"sxx{k}") - F.col(f"sx{k}") * F.col(f"sx{k}")
        vy = n * F.col(f"syy{k}") - F.col(f"sy{k}") * F.col(f"sy{k}")
        return F.when((n >= 3) & (vx > 0) & (vy > 0),
                      F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6))

    r = s.select("user_id", F.col("n3").cast("long").alias("n_lag3"),
                 rho(1).alias("r1"), rho(2).alias("r2"), rho(3).alias("r3"))
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p2 = F.when(1 - r1 * r1 != 0, (r2 - r1 * r1) / (1 - r1 * r1))
    d = r.withColumn("p2", p2)
    p2c = F.col("p2")
    phi21 = r1 * (1 - p2c)
    den3 = 1 - phi21 * r1 - p2c * r2
    p3 = F.when(den3 != 0, (r3 - phi21 * r2 - p2c * r1) / den3)
    return d.select("user_id", "n_lag3", r1.alias("pacf1"),
                    r6(p2c).alias("pacf2"), r6(p3).alias("pacf3"))


# ---------------------------------------------------------------------------
# Rolling Sharpe ratio (risk-adjusted momentum per user stream)
# ---------------------------------------------------------------------------

@query("win_rolling_sharpe", oracle=f"""
WITH v AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
r AS (
  SELECT user_id, event_id, ts,
         value - lag(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS ret
  FROM v),
w AS (
  SELECT user_id, event_id,
         CAST(COUNT(ret) OVER win AS BIGINT) AS n_ret,
         CAST(SUM(CAST(ret AS DECIMAL(38,12))) OVER win AS DOUBLE) AS s,
         CAST(SUM(CAST(ret * ret AS DECIMAL(38,12))) OVER win AS DOUBLE)
           AS ss
  FROM r
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, n_ret,
       CASE WHEN n_ret >= 10 AND (ss - s * s / n_ret) / (n_ret - 1) > 0
            THEN {r6_sql('(s / n_ret)'
                         ' / SQRT((ss - s * s / n_ret) / (n_ret - 1))')}
       END AS sharpe
FROM w
""")
def win_rolling_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING SHARPE RATIO per user stream — mean step-return over
    its sample standard deviation in a trailing 20-observation frame
    [PK — the risk-adjusted momentum monitor next to win_drawdown /
    win_ulcer_index / the rolling-beta op]: the number a strategy or
    KPI dashboard tracks to distinguish steady drift from noisy
    luck. Returns are successive diffs from ONE (user, ts) window
    sort; the rolling sums run through DECIMAL(38,12) inside the
    frame (windowed decimal sums are the win_decay_score discipline —
    order-free exact, so both engines see identical s/ss doubles) and
    the mean/σ ratio is guarded below 10 observations or zero
    variance. Scale: one shuffle on user_id feeds the lag AND the
    frame; output is row-per-event (stream-shaped), no second
    exchange."""
    from ..functions.exact import DEC

    ev = _ev(spark, sf_dir)
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select("user_id", "event_id", "ts",
                  (F.col("value") - F.lag("value").over(wo)).alias("ret"))
    # Round 12: O(n·W) sliding decimal sums → O(n) prefix differences
    # (functions/rollfast.py; exact, oracle keeps the windowed SQL).
    from ..functions.rollfast import trailing_agg
    ta = trailing_agg(
        r, ["user_id"], ["ts", "event_id"], (-19, 0),
        sums={"sd": F.col("ret").cast(DEC),
              "ssd": (F.col("ret") * F.col("ret")).cast(DEC)},
        counts={"n_ret": F.col("ret")})
    w = ta.select(
        "user_id", "event_id", "n_ret",
        F.col("sd").cast("double").alias("s"),
        F.col("ssd").cast("double").alias("ss"))
    n, s, ss = F.col("n_ret"), F.col("s"), F.col("ss")
    var = (ss - s * s / n) / (n - 1)
    sharpe = F.when((n >= 10) & (var > 0), r6((s / n) / F.sqrt(var)))
    return w.select("user_id", "event_id", "n_ret", sharpe.alias("sharpe"))


# ---------------------------------------------------------------------------
# Seasonal strength (hour-of-day explained variance per user)
# ---------------------------------------------------------------------------

@query("ts_seasonal_strength", oracle=f"""
WITH f AS ({_EV_SQL}),
h AS (SELECT user_id, hour(ts) AS hr,
             CAST(COUNT(*) AS DOUBLE) AS nh,
             {dsum_sql('value')} AS sh
      FROM f GROUP BY user_id, hr),
u AS (SELECT user_id,
             CAST(SUM(nh) AS DOUBLE) AS n,
             {dsum_sql('sh')} AS s,
             {dsum_sql('sh * sh / nh')} AS sphh
      FROM h GROUP BY user_id),
q AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n2,
             {dsum_sql('value * value')} AS ss
      FROM f GROUP BY user_id)
SELECT u.user_id, CAST(u.n AS BIGINT) AS n,
       CASE WHEN q.ss - u.s * u.s / u.n > 0
            THEN {r6_sql('GREATEST(0.0, 1.0 - (q.ss - u.sphh)'
                         ' / (q.ss - u.s * u.s / u.n))')}
       END AS seasonal_strength
FROM u JOIN q ON u.user_id = q.user_id
""")
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL STRENGTH per user — the share of a series' variance
    explained by its hour-of-day profile [PK — Hyndman's Fₛ
    seasonal-strength feature, here on the ANOVA identity rather than
    an STL fit]: Fₛ = max(0, 1 − SS_within/SS_total), where SS_within
    is the residual after subtracting each hour's own mean. The
    decomposition needs only sums: SS_total = Σx² − (Σx)²/n and
    Σ_h(Σ_h x)²/n_h — and the per-hour term rides a SECOND decimal
    pass (each hour's s²/n quantized to DECIMAL(38,12) before the
    cross-hour sum) so the engines cannot disagree on summation
    order. The number feeds the route-to-model decision the engine's
    forecasting ops share: Fₛ ≈ 0 → win_holt_linear, Fₛ large →
    ts_seasonal_decompose. Scale: two hash aggregates
    ((user, hour) → user), one join, no window."""
    f = _ev(spark, sf_dir)
    h = f.groupBy("user_id", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("double").alias("nh"),
        dsum("value").alias("sh"))
    u = h.groupBy("user_id").agg(
        F.sum("nh").alias("n"),
        dsum("sh").alias("s"),
        dsum(F.col("sh") * F.col("sh") / F.col("nh")).alias("sphh"))
    q = f.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n2"),
        dsum(F.col("value") * F.col("value")).alias("ss"))
    j = u.join(q, "user_id")
    sst = F.col("ss") - F.col("s") * F.col("s") / F.col("n")
    strength = F.when(sst > 0, r6(F.greatest(
        F.lit(0.0), 1.0 - (F.col("ss") - F.col("sphh")) / sst)))
    return j.select("user_id", F.col("n").cast("long").alias("n"),
                    strength.alias("seasonal_strength"))


# ---------------------------------------------------------------------------
# Dense-regime triangle counting via packed neighbor bitmaps
# ---------------------------------------------------------------------------

@query("graph_triangle_bitmap", oracle="""
WITH e AS (
  SELECT DISTINCT least(l1.l_suppkey, l2.l_suppkey) AS a,
         greatest(l1.l_suppkey, l2.l_suppkey) AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges
FROM e e1 JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
""")
def graph_triangle_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE COUNTING, dense-graph regime — the bitmap-intersection
    sibling of graph_triangle_count, found by the round-10 all-query
    sweep (the path-join variant was the sweep's 43.7 s head on the
    91%-dense supplier co-purchase fixture: closing the wedge join
    materializes 137M paths). Here each node's ORIENTED neighbor set
    N⁺(v) = {u > v : (v,u) ∈ E} is packed into a SPARSE word-indexed
    bitmap (map<word, 64-bit mask> — only words containing neighbors
    exist, so the structure is O(deg) for sparse graphs AND O(n/64)
    for dense ones, never the dense-array n bits per node that would
    explode on a billion-node graph), and each edge (a,b) contributes
    |N⁺(a) ∩ N⁺(b)| triangles via map_zip_with + bit_count — pure JVM
    expression work, no paths ever materialized. Cost: Σ_edges
    O(min(|words_a|, |words_b|)) word-ANDs ≈ m·min(deg,n/64)/64 vs the
    wedge join's Σ d² rows — on this fixture 3.2 s vs 16 s for the
    count stage, same exact 124.5M-triangle answer, hash-checked by
    the SAME SQL oracle (the count is implementation-independent).
    Regime rule for 100 TB: dense communities (web cliques,
    co-purchase hubs) → bitmaps; long sparse graphs → the wedge join
    with degree orientation (graph_triangle_count's docstring). Round
    11: the plan body moved to operators/graph.py
    (triangle_count_bitmap, with the empty-join COALESCE guard) and
    graph_triangle_count now DISPATCHES to it on measured density —
    this id stays registered as the explicit dense-regime form."""
    from ..operators.graph import triangle_count_bitmap
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_suppkey").alias("s2"))
    e = (li.join(l2, (li.l_orderkey == l2.o2) & (li.l_suppkey < l2.s2))
           .select(F.least("l_suppkey", "s2").alias("a"),
                   F.greatest("l_suppkey", "s2").alias("b"))
           .distinct().cache())
    return (triangle_count_bitmap(e)
            .crossJoin(F.broadcast(
                e.agg(F.count(F.lit(1)).alias("n_edges")))))
