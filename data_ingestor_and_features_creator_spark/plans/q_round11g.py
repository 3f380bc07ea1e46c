"""Round-11 operator batch G (SURVEY.md §2 growth): the DeLong
confidence interval for AUC and Page's trend test for ordered
alternatives.

Provenance ([PK], empty reference checkout — SURVEY §0): DeLong,
DeLong & Clarke-Pearson 1988 (AUC variance via placement values);
Page 1963 (L trend test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql, safe_sqrt, \
    safe_sqrt_sql
from .registry import query

# ---------------------------------------------------------------------------
# DeLong confidence interval for AUC
# ---------------------------------------------------------------------------

_SCORED_SQL = """
scored AS (
  SELECT 0.02 + 0.96 * (e.value - m.vmin) / (m.vmax - m.vmin) AS p,
         CASE WHEN e.event_type IN ('click', 'purchase')
              THEN 1 ELSE 0 END AS y
  FROM events e, (SELECT MIN(value) AS vmin, MAX(value) AS vmax
                  FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)) m
  WHERE e.value IS NOT NULL AND NOT isnan(e.value))
"""


@query("ml_auc_delong_ci", oracle=f"""
WITH {_SCORED_SQL.strip()},
pv AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(y) AS BIGINT) AS c1
  FROM scored GROUP BY p),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n0 FROM pv),
cum AS (
  SELECT p, c, c1, c - c1 AS c0,
         COALESCE(SUM(c1) OVER (ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b1,
         COALESCE(SUM(c - c1) OVER (ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b0
  FROM pv),
plc AS (
  SELECT c1, c0,
         (b0 + c0 / 2.0) / n.n0 AS v10,
         (b1 + c1 / 2.0) / n.n1 AS v01,
         n.n1, n.n0
  FROM cum, n),
a AS (
  SELECT MAX(n1) AS n1, MAX(n0) AS n0,
         {dsum_sql('c1 * v10')} / MAX(n1) AS auc
  FROM plc),
s AS (
  SELECT a.n1, a.n0, a.auc,
         {dsum_sql('c1 * POWER(v10 - a.auc, 2)')} / (a.n1 - 1) AS s10,
         {dsum_sql('c0 * POWER(v01 - (1.0 - a.auc), 2)')} / (a.n0 - 1)
           AS s01
  FROM plc, a GROUP BY a.n1, a.n0, a.auc)
SELECT n1, n0, {r6_sql('auc')} AS auc,
  {r6_sql(safe_sqrt_sql('s10 / n1 + s01 / n0'))} AS se,
  {r6_sql(f"auc - 1.96 * {safe_sqrt_sql('s10 / n1 + s01 / n0')}")}
    AS lo95,
  {r6_sql(f"auc + 1.96 * {safe_sqrt_sql('s10 / n1 + s01 / n0')}")}
    AS hi95
FROM s
""")
def ml_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLONG CONFIDENCE INTERVAL for AUC [PK — DeLong et al. 1988]:
    the distribution-free SE every serious model report needs next to
    the point AUC (ml_auc_roc emits the same point value — pinned in
    tests): each positive's PLACEMENT v10 = F₀⁻(s) + ½·mass₀(s) and
    each negative's v01 mirror it; AUC = mean(v10), var(AUC) =
    S²(v10)/n1 + S²(v01)/n0, CI = AUC ± 1.96·SE. Placements collapse
    to the distinct-score histogram (every tied observation shares
    its placement), so the whole estimator is the familiar
    per-value-aggregate + one bounded cumulative window shape — no
    per-observation pass, which is what makes DeLong affordable at
    100 TB where the textbook jackknife is not. Variance sums run
    through DECIMAL(38,12); mean(v01) ≡ 1 − AUC is used exactly
    rather than recomputed (one fewer float path to drift)."""
    from .q_round6j import _scored
    sc = _scored(spark, sf_dir)
    pv = sc.groupBy("p").agg(F.count(F.lit(1)).alias("c"),
                             F.sum("y").cast("long").alias("c1"))
    n = pv.agg(F.sum("c1").cast("long").alias("n1"),
               F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"))
    wb = W.orderBy("p").rowsBetween(W.unboundedPreceding, -1)
    cum = pv.select(
        "p", "c", "c1", (F.col("c") - F.col("c1")).alias("c0"),
        F.coalesce(F.sum("c1").over(wb), F.lit(0)).alias("b1"),
        F.coalesce(F.sum(F.col("c") - F.col("c1")).over(wb), F.lit(0))
        .alias("b0"))
    plc = (cum.crossJoin(F.broadcast(n))
              .select("c1", "c0", "n1", "n0",
                      ((F.col("b0") + F.col("c0") / 2.0) / F.col("n0"))
                      .alias("v10"),
                      ((F.col("b1") + F.col("c1") / 2.0) / F.col("n1"))
                      .alias("v01")))
    a = plc.agg(F.max("n1").alias("n1"), F.max("n0").alias("n0"),
                (dsum(F.col("c1") * F.col("v10"))
                 / F.max("n1")).alias("auc"))
    s = (plc.crossJoin(F.broadcast(a.select("auc")))
            .groupBy()
            .agg(F.max("n1").alias("n1"), F.max("n0").alias("n0"),
                 F.max("auc").alias("auc"),
                 (dsum(F.col("c1")
                       * F.pow(F.col("v10") - F.col("auc"), F.lit(2.0)))
                  / (F.max("n1") - 1)).alias("s10"),
                 (dsum(F.col("c0")
                       * F.pow(F.col("v01") - (1.0 - F.col("auc")),
                               F.lit(2.0)))
                  / (F.max("n0") - 1)).alias("s01")))
    se = safe_sqrt(F.col("s10") / F.col("n1") + F.col("s01") / F.col("n0"))
    return s.select("n1", "n0", r6(F.col("auc")).alias("auc"),
                    r6(se).alias("se"),
                    r6(F.col("auc") - 1.96 * se).alias("lo95"),
                    r6(F.col("auc") + 1.96 * se).alias("hi95"))


# ---------------------------------------------------------------------------
# Page's trend test
# ---------------------------------------------------------------------------

@query("stat_page_trend_test", oracle=f"""
WITH um AS (
  SELECT user_id, event_type,
         {dsum_sql('value')} / COUNT(value) AS mv
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id, event_type),
full_u AS (
  SELECT user_id FROM um GROUP BY user_id
  HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM um)),
ranked AS (
  SELECT um.user_id, um.event_type,
         RANK() OVER (PARTITION BY um.user_id ORDER BY um.mv)
           + (COUNT(*) OVER (PARTITION BY um.user_id, um.mv) - 1) / 2.0
           AS r,
         DENSE_RANK() OVER (ORDER BY um.event_type) AS j
  FROM um JOIN full_u USING (user_id)),
l AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS b,
         CAST(MAX(j) AS BIGINT) AS k,
         {dsum_sql('CAST(j AS DOUBLE) * r')} AS lstat
  FROM ranked)
SELECT b, k, {r6_sql('lstat')} AS l_stat,
  {r6_sql('(lstat - b * k * (k + 1) * (k + 1) / 4.0)'
          ' / SQRT(CAST(b AS DOUBLE) * k * k * (k + 1) * (k * k - 1)'
          ' / 144.0)')} AS z
FROM l
""")
def stat_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE'S L TREND TEST [PK — Page 1963]: the ordered-alternatives
    refinement of the Friedman test — blocks are users (restricted to
    complete blocks: users observed in every event type), treatments
    are event types in their FIXED lexicographic order, and L =
    Σ_j j·R_j with R_j the within-block midrank sums; large |z| means
    per-user means trend monotonically ACROSS the ordered treatments,
    which Friedman's any-difference χ² cannot distinguish from
    unordered shuffling. Within-block midranks come from RANK +
    (ties−1)/2 inside user-partitioned windows (no global raw-row
    window); j·R products run through DECIMAL(38,12); the z
    standardization b·k(k+1)²/4 and b·k²(k+1)(k²−1)/144 is exact
    integer algebra under one sqrt. Scale: one per-(user, type)
    aggregate then user-partitioned windows — fact volume collapses
    at step one."""
    ev = load_table(spark, sf_dir, "events")
    um = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .groupBy("user_id", "event_type")
            .agg((dsum("value") / F.count("value")).alias("mv")))
    ktot = um.select("event_type").distinct().count()
    full_u = (um.groupBy("user_id").agg(F.count(F.lit(1)).alias("kk"))
                .filter(F.col("kk") == ktot).select("user_id"))
    base = um.join(full_u, "user_id")
    # j = the treatment's dense rank in the GLOBAL lexicographic type
    # order — computed on the DISTINCT type table (k rows, vocab-
    # bounded) and equi-joined back, NOT as an unpartitioned window
    # over the user×type aggregate: that aggregate scales with the
    # user count, so the global dense_rank was a one-task sort of the
    # whole block table at 100 TB (round-11 optimization fix; the
    # global-window gate flags it once a cached subtree hides the
    # Aggregate exemption). Same j values by definition of dense_rank.
    types = (um.select("event_type").distinct()
               .withColumn("j", F.dense_rank().over(W.orderBy("event_type"))))
    wr = W.partitionBy("user_id").orderBy("mv")
    wt = W.partitionBy("user_id", "mv")
    ranked = (base.join(types, "event_type")
                  .select("user_id",
                          (F.rank().over(wr)
                           + (F.count(F.lit(1)).over(wt) - 1) / 2.0)
                          .alias("r"),
                          "j"))
    l = ranked.agg(
        F.countDistinct("user_id").cast("long").alias("b"),
        F.max("j").cast("long").alias("k"),
        dsum(F.col("j").cast("double") * F.col("r")).alias("lstat"))
    b = F.col("b").cast("double")
    k = F.col("k").cast("double")
    mean_l = b * k * (k + 1) * (k + 1) / 4.0
    sd_l = F.sqrt(b * k * k * (k + 1) * (k * k - 1) / 144.0)
    return l.select("b", "k", r6(F.col("lstat")).alias("l_stat"),
                    r6((F.col("lstat") - mean_l) / sd_l).alias("z"))
