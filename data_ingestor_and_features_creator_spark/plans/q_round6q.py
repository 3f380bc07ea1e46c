"""Round-6q operator additions: agreement metrics and tail risk.

Matthews correlation (the balanced single-number classifier score),
Cohen's kappa (chance-corrected agreement between two deterministic
classifiers), and historical VaR/CVaR (the tail-risk pair the
volatility family feeds). Exact counts, discrete order statistics,
identical double expressions.

Provenance note (SURVEY.md §0 applies — empty reference checkout):
all public-API constructions ([SPARK]/[PK] — Matthews 1975; Cohen
1960; historical VaR/CVaR (expected shortfall) is risk-management
canon).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead
of these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql, safe_sqrt, \
    safe_sqrt_sql
from .q_round6j import _SCORED_SQL, _scored
from .registry import query


# ---------------------------------------------------------------------------
# Matthews correlation coefficient
# ---------------------------------------------------------------------------

_MCC_SQL = f"""
WITH {_SCORED_SQL},
c AS (
  SELECT CAST(SUM(CASE WHEN p >= 0.5 AND y = 1 THEN 1 ELSE 0 END)
              AS DOUBLE) AS tp,
         CAST(SUM(CASE WHEN p >= 0.5 AND y = 0 THEN 1 ELSE 0 END)
              AS DOUBLE) AS fp,
         CAST(SUM(CASE WHEN p < 0.5 AND y = 1 THEN 1 ELSE 0 END)
              AS DOUBLE) AS fn,
         CAST(SUM(CASE WHEN p < 0.5 AND y = 0 THEN 1 ELSE 0 END)
              AS DOUBLE) AS tn
  FROM scored)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       {r6_sql(f"(tp * tn - fp * fn) / ({safe_sqrt_sql('(tp + fp)')}"
               f" * {safe_sqrt_sql('(tp + fn)')}"
               f" * {safe_sqrt_sql('(tn + fp)')}"
               f" * {safe_sqrt_sql('(tn + fn)')})")} AS mcc
FROM c
"""


@query("ml_matthews_corr", oracle=_MCC_SQL)
def ml_matthews_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTHEWS CORRELATION COEFFICIENT [PK — Matthews 1975]: the
    single balanced classifier score (tp·tn − fp·fn)/√((tp+fp)(tp+fn)
    (tn+fp)(tn+fn)) — unlike accuracy or F1 it uses ALL FOUR
    confusion cells symmetrically, so a trivial majority classifier
    scores ~0 on imbalanced data instead of looking good. The sqrt is
    factored per marginal (four small roots instead of one product
    that overflows a double at ~10⁷⁷ row counts); every input is an
    exact count, division NULL on a degenerate marginal via the
    safe-sqrt rule. Scale: one conditional aggregate, scalar out."""
    sc = _scored(spark, sf_dir)
    p, y = F.col("p"), F.col("y")
    c = sc.agg(
        F.sum(F.when((p >= 0.5) & (y == 1), 1).otherwise(0))
         .cast("double").alias("tp"),
        F.sum(F.when((p >= 0.5) & (y == 0), 1).otherwise(0))
         .cast("double").alias("fp"),
        F.sum(F.when((p < 0.5) & (y == 1), 1).otherwise(0))
         .cast("double").alias("fn"),
        F.sum(F.when((p < 0.5) & (y == 0), 1).otherwise(0))
         .cast("double").alias("tn"))
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    mcc = (tp * tn - fp * fn) / (safe_sqrt(tp + fp) * safe_sqrt(tp + fn)
                                 * safe_sqrt(tn + fp) * safe_sqrt(tn + fn))
    return c.select(tp.cast("long").alias("tp"), fp.cast("long").alias("fp"),
                    fn.cast("long").alias("fn"), tn.cast("long").alias("tn"),
                    r6(mcc).alias("mcc"))


# ---------------------------------------------------------------------------
# Cohen's kappa between two deterministic classifiers
# ---------------------------------------------------------------------------

_KAPPA_SQL = f"""
WITH {_SCORED_SQL},
lab AS (
  SELECT CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS a,
         CASE WHEN (event_id %% 1000003) * 2654435761 %% 1000003
                   %% 100 < 45 THEN 1 ELSE 0 END AS b
  FROM scored),
c AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS DOUBLE) AS agree,
         CAST(SUM(a) AS DOUBLE) AS a1, CAST(SUM(b) AS DOUBLE) AS b1
  FROM lab)
SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
       {r6_sql('agree / n')} AS po,
       {r6_sql('(a1 / n) * (b1 / n)'
               ' + ((n - a1) / n) * ((n - b1) / n)')} AS pe,
       {r6_sql('(agree / n - ((a1 / n) * (b1 / n)'
               ' + ((n - a1) / n) * ((n - b1) / n)))'
               ' / (1.0 - ((a1 / n) * (b1 / n)'
               ' + ((n - a1) / n) * ((n - b1) / n)))')} AS kappa
FROM c
""".replace("%%", "%")


@query("ml_cohen_kappa", oracle=_KAPPA_SQL)
def ml_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA [PK — Cohen 1960]: chance-corrected agreement
    κ = (p_o − p_e)/(1 − p_e) between two deterministic raters — the
    score-threshold classifier and an independent hash-gated one
    (45% positive rate) — the statistic annotation pipelines report
    instead of raw agreement, which is inflated by marginal
    prevalence (two raters both saying 'negative' 90% of the time
    agree 81% by pure chance). Every probability is an exact count
    rational; κ is one identical double expression, 6 dp. Scale: one
    conditional aggregate over one scan, scalar out."""
    sc = _scored(spark, sf_dir)
    a = F.when(F.col("p") >= 0.5, 1).otherwise(0)
    gate = (F.col("event_id") % 1000003) * F.lit(2654435761) % 1000003 % 100
    b = F.when(gate < 45, 1).otherwise(0)
    lab = sc.select(a.alias("a"), b.alias("b"))
    c = lab.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
         .cast("double").alias("agree"),
        F.sum("a").cast("double").alias("a1"),
        F.sum("b").cast("double").alias("b1"))
    n, agree = F.col("n"), F.col("agree")
    a1, b1 = F.col("a1"), F.col("b1")
    po = agree / n
    pe = (a1 / n) * (b1 / n) + ((n - a1) / n) * ((n - b1) / n)
    kappa = (po - pe) / (1.0 - pe)
    return c.select(n.cast("long").alias("n"),
                    agree.cast("long").alias("n_agree"),
                    r6(po).alias("po"), r6(pe).alias("pe"),
                    r6(kappa).alias("kappa"))


# ---------------------------------------------------------------------------
# Historical VaR / CVaR (expected shortfall)
# ---------------------------------------------------------------------------

_VAR_SQL = f"""
WITH p AS (
  SELECT user_id, value,
         lag(value) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND value > 0),
r AS (
  SELECT user_id, ROUND(value / prev - 1.0, 9) AS ret
  FROM p WHERE prev IS NOT NULL),
rk AS (
  SELECT user_id, ret,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ret, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM r),
v AS (
  SELECT user_id, CAST(MAX(n) AS BIGINT) AS n,
         MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT)
                  THEN ret END) AS var_95
  FROM rk GROUP BY user_id),
es AS (
  SELECT rk.user_id,
         {dsum_sql('CASE WHEN rk.rn <= CAST(CEIL(0.05 * rk.n) AS BIGINT)'
                   ' THEN rk.ret END')} AS tail_sum,
         CAST(MAX(CEIL(0.05 * rk.n)) AS DOUBLE) AS k
  FROM rk GROUP BY rk.user_id)
SELECT v.user_id, v.n, {r6_sql('v.var_95')} AS var_95,
       {r6_sql('es.tail_sum / es.k')} AS cvar_95
FROM v JOIN es ON v.user_id = es.user_id
ORDER BY v.user_id
"""


@query("agg_var_cvar", oracle=_VAR_SQL)
def agg_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTORICAL VaR + CVaR (expected shortfall) at 95% [PK — risk-
    management canon; CVaR is the coherent tail measure VaR is not]:
    per user, the 5th-percentile return by the DISCRETE rank spelling
    (an actual observed return — no interpolation convention) and the
    DECIMAL-exact mean of the tail at or below that rank. Returns are
    pinned to 9 dp at birth (ratios of identical doubles — pre-pinned
    so the rank ORDER and the tail sum read the same quantity).
    Scale: one lag + one rank window sharing the per-user sort, two
    grouped aggregates — the tail mean never sorts globally."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
        & (F.col("value") > 0))
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select("user_id", "value",
                  F.lag("value").over(ws).alias("prev"))
    r = (p.filter(F.col("prev").isNotNull())
          .select("user_id",
                  F.round(F.col("value") / F.col("prev") - 1.0, 9)
                   .alias("ret")))
    wr = W.partitionBy("user_id").orderBy("ret", "user_id")
    rk = r.select("user_id", "ret",
                  F.row_number().over(wr).alias("rn"),
                  F.count(F.lit(1)).over(W.partitionBy("user_id"))
                   .alias("n"))
    rn, n = F.col("rn"), F.col("n")
    k = F.ceil(0.05 * n)
    v = rk.groupBy("user_id").agg(
        F.max(n).alias("n"),
        F.max(F.when(rn == k, F.col("ret"))).alias("var_95"))
    es = rk.groupBy("user_id").agg(
        dsum(F.when(rn <= k, F.col("ret"))).alias("tail_sum"),
        F.max(k).cast("double").alias("k"))
    return (v.join(es, "user_id")
             .select("user_id", "n", r6(F.col("var_95")).alias("var_95"),
                     r6(F.col("tail_sum") / F.col("k")).alias("cvar_95"))
             .orderBy("user_id"))