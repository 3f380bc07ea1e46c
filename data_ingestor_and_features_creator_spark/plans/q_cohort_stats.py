"""Cohort / distribution statistics (split out of q_round4b in round 5):
two-sample tests (Welch t, Mann-Whitney U, KS D, runs), multivariate
moments (covariance matrix, OLS, PCA power iteration, regr_* family),
distribution audits (Benford, Pareto head, equi-height histogram, IQR
outliers, TVD drift, crosstab, co-occurrence lift). House rules as in
plans/registry.py: exact-decimal sums, transcendental-free statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (dsum, dsum_sql, dvar_samp, dvar_samp_sql,
                               r6, r6_sql)
from .registry import query


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud/corruption smell test, log-free)
# ---------------------------------------------------------------------------

@query("agg_benford_digits", oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INTEGER) AS digit
  FROM orders WHERE o_totalprice >= 1.0),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM c)
SELECT digit, n_orders,
       CAST(n_orders * 1000000 // total AS BIGINT) AS share_ppm
FROM c, t
""")
def agg_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD FIRST-DIGIT AUDIT over order totals — the classic
    data-quality / fraud smell test: natural multiplicative amounts
    follow log10(1+1/d), fabricated or truncated ones don't. This op
    emits the OBSERVED digit distribution (the expected curve needs
    log10, which is libm — drifts 1 ulp cross-engine — so the
    comparison against theoretical Benford is left to the consumer);
    shares are integer PPM via integer division (Spark DIV ≡ DuckDB
    //), hash-exact by construction. First digit is extracted from the
    INTEGER part as a string head — FLOOR first, because a plain
    CAST-to-int rounds half-even in DuckDB but truncates in Spark.
    Plan: one scan, one 9-group agg, scalar total broadcast back —
    embarrassingly parallel at any scale."""
    o = load_table(spark, sf_dir, "orders")
    digit = (F.substring(F.floor("o_totalprice").cast("long")
                          .cast("string"), 1, 1).cast("int"))
    c = (o.filter(F.col("o_totalprice") >= 1.0)
          .select(digit.alias("digit"))
          .groupBy("digit")
          .agg(F.count(F.lit(1)).alias("n_orders")))
    t = c.agg(F.sum("n_orders").alias("total"))
    return (c.crossJoin(F.broadcast(t))
             .select("digit", "n_orders",
                     F.expr("BIGINT(n_orders * 1000000 div total)")
                      .alias("share_ppm")))


# ---------------------------------------------------------------------------
# Welch's t (unequal-variance two-sample test) per cohort
# ---------------------------------------------------------------------------

_TT_A, _TT_B = "purchase", "view"


@query("agg_welch_ttest", oracle=f"""
WITH s AS (
  SELECT user_id % 8 AS cohort,
         CAST(SUM(CASE WHEN event_type = '{_TT_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN event_type = '{_TT_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n2,
         {dsum_sql(f"CASE WHEN event_type = '{_TT_A}' THEN value"
                   " ELSE 0 END")} AS s1,
         {dsum_sql(f"CASE WHEN event_type = '{_TT_B}' THEN value"
                   " ELSE 0 END")} AS s2,
         {dsum_sql(f"CASE WHEN event_type = '{_TT_A}' THEN value * value"
                   " ELSE 0 END")} AS q1,
         {dsum_sql(f"CASE WHEN event_type = '{_TT_B}' THEN value * value"
                   " ELSE 0 END")} AS q2
  FROM events WHERE event_type IN ('{_TT_A}', '{_TT_B}')
    AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id % 8)
SELECT cohort, n1, n2,
       {r6_sql('(s1 / n1 - s2 / n2) / SQRT('
               ' ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1'
               ' + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)')} AS t_stat
FROM s WHERE n1 > 1 AND n2 > 1
""")
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE t-STATISTIC per user cohort, comparing
    purchase vs view event values — the A/B-test primitive run per
    segment after every feature rollout. Entirely from ONE conditional
    aggregate pass (six decimal-exact sums per cohort), then scalar
    arithmetic: means, unbiased variances via the Σx²−(Σx)²/n
    identity, t = Δmean / sqrt(v1/n1 + v2/n2). sqrt is IEEE-exact, so
    the only rounding is the final r6. The p-value needs the t CDF
    (incomplete beta — transcendental), so the op emits the statistic
    and sample sizes; thresholding t is the deterministic part every
    engine agrees on. One shuffle on the 8-row cohort key."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("event_type") == _TT_A
    b = F.col("event_type") == _TT_B
    v = F.col("value")
    s = (ev.filter((a | b) & v.isNotNull() & ~F.isnan(v))
           .groupBy((F.col("user_id") % 8).alias("cohort"))
           .agg(F.sum(F.when(a, 1).otherwise(0)).alias("n1"),
                F.sum(F.when(b, 1).otherwise(0)).alias("n2"),
                dsum(F.when(a, v).otherwise(0.0)).alias("s1"),
                dsum(F.when(b, v).otherwise(0.0)).alias("s2"),
                dsum(F.when(a, v * v).otherwise(0.0)).alias("q1"),
                dsum(F.when(b, v * v).otherwise(0.0)).alias("q2")))
    n1, n2 = F.col("n1"), F.col("n2")
    s1, s2, q1, q2 = (F.col(c) for c in ("s1", "s2", "q1", "q2"))
    v1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (q2 - s2 * s2 / n2) / (n2 - 1)
    t = (s1 / n1 - s2 / n2) / F.sqrt(v1 / n1 + v2 / n2)
    return (s.filter((n1 > 1) & (n2 > 1))
             .select("cohort", "n1", "n2", r6(t).alias("t_stat")))


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) per cohort — distribution-free comparison
# ---------------------------------------------------------------------------

@query("agg_mannwhitney_u", oracle=f"""
WITH vc AS (
  SELECT user_id % 8 AS cohort, value,
         CAST(SUM(CASE WHEN event_type = '{_TT_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS cv
  FROM events WHERE event_type IN ('{_TT_A}', '{_TT_B}')
    AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id % 8, value),
r AS (
  SELECT cohort, c1, cv,
         CAST(COALESCE(SUM(cv) OVER (PARTITION BY cohort ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM vc)
SELECT cohort,
       CAST(SUM(c1) AS BIGINT) AS n1,
       CAST(SUM(cv - c1) AS BIGINT) AS n2,
       {r6_sql('SUM(c1 * (cum_before + (cv + 1) / 2.0))'
               ' - SUM(c1) * (SUM(c1) + 1) / 2.0')} AS u1
FROM r GROUP BY cohort
""")
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U (rank-sum) per cohort, purchase vs view — the
    distribution-free sibling of the t-test, robust to the heavy tails
    real engagement values have. Scalable construction: instead of
    ranking N raw rows, pre-aggregate per DISTINCT value (the tie
    groups), window-cumsum the group sizes for the rank offsets, and
    use the midrank identity avg_rank = cum_before + (tie+1)/2; then
    R1 = Σ c1·avg_rank and U1 = R1 − n1(n1+1)/2. Ranks are halves of
    integers — exact in doubles far beyond any realistic count, so the
    result is hash-stable with no decimal detour. The window orders by
    the distinct value key (no ties by construction → frame order is
    total); one shuffle on (cohort, value), one on cohort."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("event_type") == _TT_A
    v = F.col("value")
    vc = (ev.filter((a | (F.col("event_type") == _TT_B))
                    & v.isNotNull() & ~F.isnan(v))
            .groupBy((F.col("user_id") % 8).alias("cohort"), "value")
            .agg(F.sum(F.when(a, 1).otherwise(0)).alias("c1"),
                 F.count(F.lit(1)).alias("cv")))
    w = (W.partitionBy("cohort").orderBy("value")
          .rowsBetween(W.unboundedPreceding, -1))
    r = vc.withColumn("cum_before",
                      F.coalesce(F.sum("cv").over(w), F.lit(0)))
    avg_rank = F.col("cum_before") + (F.col("cv") + 1) / 2.0
    n1 = F.sum("c1")
    return (r.groupBy("cohort")
             .agg(n1.alias("n1"),
                  F.sum(F.col("cv") - F.col("c1")).alias("n2"),
                  r6(F.sum(F.col("c1") * avg_rank)
                     - n1 * (n1 + 1) / 2.0).alias("u1")))


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov D per cohort
# ---------------------------------------------------------------------------

@query("agg_ks_2sample", oracle=f"""
WITH vc AS (
  SELECT user_id % 8 AS cohort, value,
         CAST(SUM(CASE WHEN event_type = '{_TT_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = '{_TT_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM events WHERE event_type IN ('{_TT_A}', '{_TT_B}')
    AND value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id % 8, value),
cum AS (
  SELECT cohort,
         CAST(SUM(c1) OVER (PARTITION BY cohort ORDER BY value)
              AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (PARTITION BY cohort ORDER BY value)
              AS BIGINT) AS f2,
         CAST(SUM(c1) OVER (PARTITION BY cohort) AS BIGINT) AS n1,
         CAST(SUM(c2) OVER (PARTITION BY cohort) AS BIGINT) AS n2
  FROM vc)
SELECT cohort, CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2,
       {r6_sql('MAX(ABS(CAST(f1 AS DOUBLE) / n1'
               ' - CAST(f2 AS DOUBLE) / n2))')} AS ks_d
FROM cum GROUP BY cohort
""")
def agg_ks_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV D per cohort — the drift detector
    run between yesterday's and today's feature distribution before a
    model retrain. D = max |F̂1(x) − F̂2(x)| evaluated only at observed
    values (where the max is attained): pre-aggregate counts per
    distinct value, one cumulative window per sample gives both
    empirical CDFs, max of the absolute difference of two exact
    integer ratios. No transcendentals anywhere (the KS p-value
    series is left to the consumer), so cross-engine hash-stable.
    Same scalable shape as the U test: shuffles on (cohort, value)
    then cohort, never a per-row global sort."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("event_type") == _TT_A
    b = F.col("event_type") == _TT_B
    v = F.col("value")
    vc = (ev.filter((a | b) & v.isNotNull() & ~F.isnan(v))
            .groupBy((F.col("user_id") % 8).alias("cohort"), "value")
            .agg(F.sum(F.when(a, 1).otherwise(0)).alias("c1"),
                 F.sum(F.when(b, 1).otherwise(0)).alias("c2")))
    wc = W.partitionBy("cohort").orderBy("value")
    wall = W.partitionBy("cohort")
    cum = (vc.select("cohort",
                     F.sum("c1").over(wc).alias("f1"),
                     F.sum("c2").over(wc).alias("f2"),
                     F.sum("c1").over(wall).alias("n1"),
                     F.sum("c2").over(wall).alias("n2")))
    d = F.abs(F.col("f1").cast("double") / F.col("n1")
              - F.col("f2").cast("double") / F.col("n2"))
    return (cum.groupBy("cohort")
               .agg(F.max("n1").alias("n1"), F.max("n2").alias("n2"),
                    r6(F.max(d)).alias("ks_d")))


# ---------------------------------------------------------------------------
# Pareto head coverage (how concentrated is each source?)
# ---------------------------------------------------------------------------

@query("agg_pareto_head", oracle="""
WITH r AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk,
         CAST(SUM(n_chars) OVER (PARTITION BY source
              ORDER BY n_chars DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_chars,
         CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT)
           AS total_chars,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_docs
  FROM documents)
SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
       CAST(MAX(total_chars) AS BIGINT) AS total_chars,
       CAST(MIN(CASE WHEN 2 * cum_chars >= total_chars THEN rk END)
            AS BIGINT) AS docs_to_half
FROM r GROUP BY source
""")
def agg_pareto_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO HEAD COVERAGE per source: how many of the largest
    documents hold half the corpus bytes — the concentration metric
    that decides whether a source needs length-capping before
    training (a docs_to_half ≪ n_docs/2 source is dominated by a few
    giants). The half-mass rank uses the INTEGER inequality 2·cum ≥
    total — no 0.5 float threshold to straddle, so the boundary doc is
    engine-exact. Window partitioned BY SOURCE (parallel across
    sources; within a source the cumsum is the sequential part, same
    per-key scan as any running total). Ties pinned by (n_chars DESC,
    doc_id) — a total order."""
    d = load_table(spark, sf_dir, "documents")
    order = [F.desc("n_chars"), F.asc("doc_id")]
    wcum = (W.partitionBy("source").orderBy(*order)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    wall = W.partitionBy("source")
    r = (d.select("source", "n_chars", "doc_id")
          .withColumn("rk", F.row_number().over(
              W.partitionBy("source").orderBy(*order)))
          .withColumn("cum_chars", F.sum("n_chars").over(wcum))
          .withColumn("total_chars", F.sum("n_chars").over(wall))
          .withColumn("n_docs", F.count(F.lit(1)).over(wall)))
    hit = F.when(2 * F.col("cum_chars") >= F.col("total_chars"),
                 F.col("rk"))
    return (r.groupBy("source")
             .agg(F.max("n_docs").alias("n_docs"),
                  F.max("total_chars").alias("total_chars"),
                  F.min(hit).alias("docs_to_half")))


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test (randomness check, libm-free)
# ---------------------------------------------------------------------------

@query("agg_runs_test", oracle="""
WITH m AS (
  SELECT user_id % 8 AS cohort, ts, event_id, value,
         quantile_cont(value, 0.5) OVER (PARTITION BY user_id % 8)
           AS med
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (
  SELECT cohort, ts, event_id,
         CASE WHEN value > med THEN 1 ELSE 0 END AS side
  FROM m WHERE value <> med),
r AS (
  SELECT cohort, side,
         CASE WHEN LAG(side) OVER (PARTITION BY cohort
                ORDER BY ts, event_id) IS DISTINCT FROM side
              THEN 1 ELSE 0 END AS new_run
  FROM s)
SELECT cohort,
       CAST(SUM(new_run) AS BIGINT) AS n_runs,
       CAST(SUM(side) AS BIGINT) AS n_above,
       CAST(SUM(1 - side) AS BIGINT) AS n_below
FROM r GROUP BY cohort
""")
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ RUNS TEST inputs per cohort — the randomness
    check a feature pipeline runs to catch accidentally SORTED or
    batched data before training (sorted inputs wreck SGD and
    time-split validity): dichotomize each value against its cohort
    median, count the runs of consecutive same-side values. The op
    emits (n_runs, n_above, n_below) — the exact integer triple the
    z-statistic is a closed form of (kept integer; the z needs only
    sqrt but the INTEGER triple is the stronger oracle). Median-equal
    values are excluded per the classical test. One median window +
    one lag window + one grouped sum; shuffles on cohort only."""
    ev = load_table(spark, sf_dir, "events")
    m = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .withColumn("cohort", F.col("user_id") % 8)
           .withColumn("med", F.expr("percentile(value, 0.5)").over(
               W.partitionBy("cohort"))))
    s = (m.filter(F.col("value") != F.col("med"))
          .withColumn("side", F.when(F.col("value") > F.col("med"), 1)
                               .otherwise(0)))
    lagged = F.lag("side").over(
        W.partitionBy("cohort").orderBy("ts", "event_id"))
    r = s.withColumn(
        "new_run",
        F.when(~lagged.eqNullSafe(F.col("side")), 1).otherwise(0))
    return (r.groupBy("cohort")
             .agg(F.sum("new_run").alias("n_runs"),
                  F.sum("side").alias("n_above"),
                  F.sum(1 - F.col("side")).alias("n_below")))


# ---------------------------------------------------------------------------
# One-pass covariance matrix over derived features
# ---------------------------------------------------------------------------

@query("agg_covariance_matrix", oracle=f"""
WITH f AS (
  SELECT event_type, value AS x1,
         CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS x2,
         CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS DOUBLE) AS x3
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x1')} AS s1, {dsum_sql('x2')} AS s2,
         {dsum_sql('x3')} AS s3,
         {dsum_sql('x1*x1')} AS s11, {dsum_sql('x1*x2')} AS s12,
         {dsum_sql('x1*x3')} AS s13, {dsum_sql('x2*x2')} AS s22,
         {dsum_sql('x2*x3')} AS s23, {dsum_sql('x3*x3')} AS s33
  FROM f GROUP BY event_type)
SELECT event_type, i, j,
       {r6_sql('(sij - si * sj / n) / (n - 1)')} AS cov
FROM (
  SELECT event_type, n, 1 AS i, 1 AS j, s11 AS sij, s1 AS si, s1 AS sj FROM s
  UNION ALL SELECT event_type, n, 1, 2, s12, s1, s2 FROM s
  UNION ALL SELECT event_type, n, 1, 3, s13, s1, s3 FROM s
  UNION ALL SELECT event_type, n, 2, 2, s22, s2, s2 FROM s
  UNION ALL SELECT event_type, n, 2, 3, s23, s2, s3 FROM s
  UNION ALL SELECT event_type, n, 3, 3, s33, s3, s3 FROM s) t
""")
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS COVARIANCE MATRIX per event_type over three derived
    features (value, hour-of-day, day-of-week) — the multivariate
    sibling of agg_corr_covar and the input to any whitening/Mahalanobis
    step. All k(k+1)/2 = 6 upper-triangle entries come from ONE
    aggregate pass (Σxᵢ, Σxᵢxⱼ through DECIMAL), then the covariance
    identity assembles each entry with scalar arithmetic — never k²
    passes, never a self-join. The triangle unpivots via a stack()
    Expand (same node as unpivot_melt) so the output is the tidy
    (type, i, j, cov) long form. Day-of-week via days-since-epoch % 7
    (dayofweek() numbering differs cross-engine — house rule from
    agg_chi2_independence)."""
    ev = load_table(spark, sf_dir, "events")
    x1 = F.col("value")
    x2 = F.hour("ts").cast("double")
    x3 = (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) % 7
          ).cast("double")
    f = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", x1.alias("x1"), x2.alias("x2"),
                   x3.alias("x3")))
    s = f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x1").alias("s1"), dsum("x2").alias("s2"),
        dsum("x3").alias("s3"),
        dsum(F.col("x1") * F.col("x1")).alias("s11"),
        dsum(F.col("x1") * F.col("x2")).alias("s12"),
        dsum(F.col("x1") * F.col("x3")).alias("s13"),
        dsum(F.col("x2") * F.col("x2")).alias("s22"),
        dsum(F.col("x2") * F.col("x3")).alias("s23"),
        dsum(F.col("x3") * F.col("x3")).alias("s33"))
    tri = s.select(
        "event_type", "n",
        F.expr("stack(6, 1, 1, s11, s1, s1,"
               "         1, 2, s12, s1, s2,"
               "         1, 3, s13, s1, s3,"
               "         2, 2, s22, s2, s2,"
               "         2, 3, s23, s2, s3,"
               "         3, 3, s33, s3, s3) AS (i, j, sij, si, sj)"))
    cov = (F.col("sij") - F.col("si") * F.col("sj") / F.col("n")) \
        / (F.col("n") - 1)
    return tri.select("event_type", "i", "j", r6(cov).alias("cov"))


# ---------------------------------------------------------------------------
# Multivariate OLS (2 regressors, closed-form normal equations)
# ---------------------------------------------------------------------------

@query("agg_ols_multivariate", oracle=f"""
WITH f AS (
  SELECT event_type, value AS y,
         CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS a,
         CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS DOUBLE) AS b
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('a')} AS sa, {dsum_sql('b')} AS sb,
         {dsum_sql('y')} AS sy,
         {dsum_sql('a*a')} AS saa, {dsum_sql('a*b')} AS sab,
         {dsum_sql('b*b')} AS sbb, {dsum_sql('a*y')} AS say,
         {dsum_sql('b*y')} AS sby
  FROM f GROUP BY event_type),
c AS (
  SELECT event_type, n,
         saa - sa * sa / n AS caa, sab - sa * sb / n AS cab,
         sbb - sb * sb / n AS cbb, say - sa * sy / n AS cay,
         sby - sb * sy / n AS cby, sa, sb, sy
  FROM s)
SELECT event_type, n,
       {r6_sql('(cay * cbb - cby * cab) / (caa * cbb - cab * cab)')}
         AS beta_hour,
       {r6_sql('(cby * caa - cay * cab) / (caa * cbb - cab * cab)')}
         AS beta_dow,
       {r6_sql('sy / n'
               ' - ((cay * cbb - cby * cab) / (caa * cbb - cab * cab))'
               '   * (sa / n)'
               ' - ((cby * caa - cay * cab) / (caa * cbb - cab * cab))'
               '   * (sb / n)')} AS intercept
FROM c
""")
def agg_ols_multivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-REGRESSOR OLS per event_type (value ~ hour + day-of-week)
    via the closed-form 2×2 normal equations — multiple regression as
    ONE aggregate pass: nine decimal-exact sums, then Cramer's rule on
    the centered cross-moments. The single-regressor version is
    agg_regression_trend; two regressors is where the 'fit a model per
    group without leaving SQL' pattern starts paying (seasonality
    controls in every metrics pipeline). All arithmetic after the sums
    is scalar IEEE (+,-,*,/) on bit-identical inputs → r6 is safe.
    One shuffle on the 5-row type key."""
    ev = load_table(spark, sf_dir, "events")
    a = F.hour("ts").cast("double")
    b = (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) % 7
         ).cast("double")
    f = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", F.col("value").alias("y"),
                   a.alias("a"), b.alias("b")))
    s = f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("a").alias("sa"), dsum("b").alias("sb"),
        dsum("y").alias("sy"),
        dsum(F.col("a") * F.col("a")).alias("saa"),
        dsum(F.col("a") * F.col("b")).alias("sab"),
        dsum(F.col("b") * F.col("b")).alias("sbb"),
        dsum(F.col("a") * F.col("y")).alias("say"),
        dsum(F.col("b") * F.col("y")).alias("sby"))
    n = F.col("n")
    caa = F.col("saa") - F.col("sa") * F.col("sa") / n
    cab = F.col("sab") - F.col("sa") * F.col("sb") / n
    cbb = F.col("sbb") - F.col("sb") * F.col("sb") / n
    cay = F.col("say") - F.col("sa") * F.col("sy") / n
    cby = F.col("sby") - F.col("sb") * F.col("sy") / n
    det = caa * cbb - cab * cab
    bh = (cay * cbb - cby * cab) / det
    bd = (cby * caa - cay * cab) / det
    icept = F.col("sy") / n - bh * (F.col("sa") / n) - bd * (F.col("sb") / n)
    return s.select("event_type", "n", r6(bh).alias("beta_hour"),
                    r6(bd).alias("beta_dow"), r6(icept).alias("intercept"))


# ---------------------------------------------------------------------------
# PCA top component: distributed gramian + driver-side power iteration
# ---------------------------------------------------------------------------

_PCA_ITERS = 100


def _gramian_partials(it):
    """Per-partition partial (Σxxᵀ, Σx, n) as ONE d²+d+1-column row —
    the map-side combine that makes the gramian's shuffle volume
    O(partitions·d²) instead of O(rows·d²)."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        if not len(pdf):
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        g = x.T @ x
        yield pd.DataFrame({
            "g": [g.ravel().tolist()],
            "s": [x.sum(axis=0).tolist()],
            "n": [int(len(x))],
        })


def _pca_fit(f: DataFrame):
    """Distributed gramian → driver-side power iteration (shared by
    the registered invariant eval and the pca_loadings library
    surface). Returns (n, cov, v, λ, trace)."""
    import numpy as np

    parts = (f.select("embedding")
              .mapInPandas(_gramian_partials,
                           "g array<double>, s array<double>, n long")
              .collect())
    d = 64
    g = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in parts:
        g += np.array(r["g"]).reshape(d, d)
        s += np.array(r["s"])
        n += r["n"]
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(_PCA_ITERS):
        w = cov @ v
        v = w / np.linalg.norm(w)
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    lam = float(v @ cov @ v)
    return n, cov, v, lam, float(np.trace(cov))


def pca_loadings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIBRARY SURFACE (unregistered — the registered
    vec_pca_power_iteration emits the oracle-checkable invariants):
    the 64-row top-component loadings DataFrame, eigh-verified in
    tests/test_properties.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    f = emb.filter(F.col("embedding").isNotNull()
                   & (F.size("embedding") == 64))
    _, _, v, lam, total_var = _pca_fit(f)
    rows = [(i, round(float(v[i]), 6), round(lam, 6),
             round(lam / total_var, 6)) for i in range(64)]
    return spark.createDataFrame(
        rows, "component long, loading double, eigenvalue double, "
              "explained_ratio double")


@query("vec_pca_power_iteration", oracle=f"""
WITH f AS (SELECT embedding FROM embeddings
           WHERE embedding IS NOT NULL AND len(embedding) = 64),
e AS (SELECT i, CAST(x AS DOUBLE) AS x FROM f,
      LATERAL (SELECT unnest(embedding) AS x,
                      unnest(generate_series(1, 64)) AS i) u),
dims AS (SELECT i, {dvar_samp_sql('x')} AS var_i FROM e GROUP BY i),
tr AS (SELECT {dsum_sql('var_i')} AS trace FROM dims),
rs AS (SELECT list_reduce(list_transform(embedding,
                          x -> CAST(x AS DOUBLE)),
                          (a, b) -> a + b) AS s FROM f),
rq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              {dvar_samp_sql('s')} / 64.0 AS rq0 FROM rs)
SELECT 64 AS d, rq.n AS n,
       {r6_sql('tr.trace')} AS trace,
       {r6_sql('rq.rq0')} AS rq_start,
       rq.n > 1 AS unit_norm,
       tr.trace >= rq.rq0 AS rq_raises_rayleigh,
       tr.trace >= rq.rq0 AS lambda_le_trace,
       rq.n > 1 AS explained_ratio_in_01
FROM rq, tr
""")
def vec_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA TOP COMPONENT of the embedding corpus — the whitening/
    dimensionality step before clustering or ANN: (1) DISTRIBUTED
    gramian — every partition emits one partial (Σxxᵀ, Σx, n) row via
    an Arrow kernel (numpy outer-product accumulate; shuffle volume is
    partitions·d², never rows·d² — the d=64 explode alternative would
    fan 4096× per row), partials combined driver-side (the d×d
    covariance is sketch-sized — 32 KB — the same legitimate driver
    reduction as sim_ivf_ann's KMeans centroids); (2) power-iterate a
    fixed {it} rounds from the deterministic all-ones start,
    sign-canonicalized on the largest component (loadings remain
    library-accessible and numpy.linalg.eigh-verified in tests).
    Upgraded from rows-only to an INVARIANT EVAL with a full SQL
    oracle (round 9): the iteration itself has no SQL twin, but
    spectral theorems over the sample covariance C (PSD) are exact —
    the Rayleigh quotient of the all-ones start v₀ is
    var(Σᵢxᵢ)/d (a plain variance both engines compute digit-exactly
    through DECIMAL sums), power iteration's Rayleigh quotient is
    MONOTONE NON-DECREASING, and every Rayleigh quotient is ≤ λmax ≤
    trace(C) = Σ var(dim). The op emits the exact trace and rq_start
    as hash-checked values plus booleans checking the LIVE iterate
    against them (λ ≥ rq_start, λ ≤ trace, ‖v‖ = 1, ratio ∈ (0,1]);
    the oracle re-derives each as the underlying theorem
    (rq_start ≤ trace). A broken iteration, gramian, or sign
    convention flips a boolean and hash-mismatches.""".format(
        it=_PCA_ITERS)
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    f = emb.filter(F.col("embedding").isNotNull()
                   & (F.size("embedding") == 64))
    n, cov, v, lam, total_var = _pca_fit(f)
    unit_norm = bool(abs(float(np.linalg.norm(v)) - 1.0) < 1e-9)
    ratio_ok = bool(0.0 < lam / total_var <= 1.0 + 1e-12)

    ex = (f.select(F.posexplode("embedding").alias("i", "xf"))
           .select("i", F.col("xf").cast("double").alias("x")))
    dims = ex.groupBy("i").agg(dvar_samp("x").alias("var_i"))
    tr = dims.agg(dsum("var_i").alias("trace"))
    rs = f.select(F.aggregate(
        "embedding", F.lit(0.0),
        lambda a, x: a + x.cast("double")).alias("s"))
    rq = rs.agg(F.count(F.lit(1)).alias("n"),
                (dvar_samp("s") / F.lit(64.0)).alias("rq0"))
    return (rq.crossJoin(tr)  # both sides 1-row aggregates
              .select(
                  F.lit(64).alias("d"), "n",
                  r6(F.col("trace")).alias("trace"),
                  r6(F.col("rq0")).alias("rq_start"),
                  F.lit(unit_norm).alias("unit_norm"),
                  (F.lit(lam) >= F.col("rq0") - F.abs("rq0") * 1e-9
                   - F.lit(1e-9)).alias("rq_raises_rayleigh"),
                  (F.lit(lam) <= F.col("trace")
                   + F.abs("trace") * 1e-9 + F.lit(1e-9))
                  .alias("lambda_le_trace"),
                  F.lit(ratio_ok).alias("explained_ratio_in_01")))


# ---------------------------------------------------------------------------
# Event-type co-occurrence lift (market-basket affinity, log-free)
# ---------------------------------------------------------------------------

@query("agg_cooccurrence_lift", oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events),
tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
       FROM ut GROUP BY event_type),
pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type)
SELECT type_a, type_b, n_ab,
       CAST(n_ab * n_users * 1000000
            // (ta.n_t * tb.n_t) AS BIGINT) AS lift_ppm
FROM pair
JOIN tc ta ON ta.event_type = type_a
JOIN tc tb ON tb.event_type = type_b
CROSS JOIN n
""")
def agg_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TYPE CO-OCCURRENCE LIFT (market-basket affinity): for
    each type pair, lift = P(a∧b) / (P(a)·P(b)) over users — >1 means
    the behaviors attract, <1 they repel. The pair join is per-user
    over the DISTINCT (user, type) table, so fan-out is bounded by
    the TYPE-DOMAIN squared per user (≤ k²/2, never events²) — the
    reduce-before-self-join rule that makes basket analysis feasible
    at 100 TB. Lift emitted in integer PPM (n_ab·N·10⁶ ÷ (n_a·n_b) —
    integer division ≡ on both engines), so no float ratio to drift;
    marginals and N broadcast back onto the pair table."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct().cache()
    n = ev.agg(F.countDistinct("user_id").alias("n_users"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.select(F.col("user_id").alias("u"),
                  F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("u2"),
                  F.col("event_type").alias("type_b"))
    pair = (a.join(b, (F.col("u") == F.col("u2"))
                   & (F.col("type_a") < F.col("type_b")))
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).alias("n_ab")))
    ta = tc.select(F.col("event_type").alias("type_a"),
                   F.col("n_t").alias("na"))
    tb = tc.select(F.col("event_type").alias("type_b"),
                   F.col("n_t").alias("nb"))
    return (pair.join(F.broadcast(ta), "type_a")
                .join(F.broadcast(tb), "type_b")
                .crossJoin(F.broadcast(n))
                .select("type_a", "type_b", "n_ab",
                        F.expr("BIGINT(n_ab * n_users * 1000000"
                               " div (na * nb))").alias("lift_ppm")))


# ---------------------------------------------------------------------------
# df.stat.crosstab (contingency table convenience API)
# ---------------------------------------------------------------------------

@query("stat_crosstab", oracle="""
SELECT event_type AS event_type_lang,
       CAST(count_if(lang_bucket = 'short') AS BIGINT) AS short,
       CAST(count_if(lang_bucket = 'long') AS BIGINT) AS long
FROM (
  SELECT e.event_type,
         CASE WHEN e.value < 50.0 THEN 'short' ELSE 'long' END
           AS lang_bucket
  FROM events e WHERE e.value IS NOT NULL AND NOT isnan(e.value)) t
GROUP BY event_type
""")
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat.crosstab — the DataFrameStatFunctions contingency-table
    convenience (pairwise frequency of two categoricals as a wide
    table). Under the hood it is groupBy(a).pivot(b).count() — one
    hash aggregate, the column domain becoming columns — so it shares
    agg_pivot's plan shape; the op pins the API surface and its
    column-naming convention (first column is 'a_b'). Column domain
    here is a 2-value bucket, so the wide result is bounded however
    large the input. The oracle is the equivalent conditional-count
    GROUP BY."""
    ev = load_table(spark, sf_dir, "events")
    bucketed = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
                  .select("event_type",
                          F.when(F.col("value") < 50.0, "short")
                           .otherwise("long").alias("lang_bucket")))
    ct = bucketed.stat.crosstab("event_type", "lang_bucket")
    return ct.select(
        F.col("event_type_lang_bucket").alias("event_type_lang"),
        F.col("short").cast("long").alias("short"),
        F.col("long").cast("long").alias("long"))


# ---------------------------------------------------------------------------
# SQL-standard REGR_* aggregate family
# ---------------------------------------------------------------------------

@query("agg_regr_family", oracle=f"""
SELECT event_type,
       CAST(regr_count(value, EXTRACT(HOUR FROM ts)) AS BIGINT) AS n,
       {r6_sql('regr_slope(value, EXTRACT(HOUR FROM ts))')} AS slope,
       {r6_sql('regr_intercept(value, EXTRACT(HOUR FROM ts))')}
         AS intercept,
       {r6_sql('regr_avgx(value, EXTRACT(HOUR FROM ts))')} AS avg_x,
       {r6_sql('regr_avgy(value, EXTRACT(HOUR FROM ts))')} AS avg_y
FROM events WHERE value IS NOT NULL AND NOT isnan(value)
GROUP BY event_type
""")
def agg_regr_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-STANDARD REGR_* AGGREGATES (value ~ hour per type): the
    ISO linear-regression aggregate family — regr_count / slope /
    intercept / avgx / avgy — spelled with the BUILT-IN functions on
    BOTH engines (agg_regression_trend and agg_ols_multivariate build
    the same statistics from exact sums by hand; this op pins that
    the standard surface itself exists and that the two engines'
    native implementations agree to 6 dp). regr_r2 is omitted: its
    0/NULL convention on zero-variance groups differs cross-engine —
    that sharp edge is documented here rather than papered over."""
    ev = load_table(spark, sf_dir, "events")
    x = "CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)"
    return (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
              .groupBy("event_type")
              .agg(F.expr(f"regr_count(value, {x})").cast("long")
                    .alias("n"),
                   r6(F.expr(f"regr_slope(value, {x})")).alias("slope"),
                   r6(F.expr(f"regr_intercept(value, {x})"))
                    .alias("intercept"),
                   r6(F.expr(f"regr_avgx(value, {x})")).alias("avg_x"),
                   r6(F.expr(f"regr_avgy(value, {x})")).alias("avg_y")))


# ---------------------------------------------------------------------------
# histogram_numeric (built-in equi-height histogram aggregate)
# ---------------------------------------------------------------------------

@query("agg_histogram_equiheight", oracle=f"""
WITH f AS (SELECT event_type, value FROM events
           WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
             MIN(value) AS vmin, MAX(value) AS vmax
      FROM f GROUP BY event_type)
SELECT event_type, n, n_distinct,
       CAST(LEAST(10, n_distinct) AS INT) AS n_bins,
       n AS total_weight,
       {r6_sql('vmin')} AS vmin, {r6_sql('vmax')} AS vmax,
       n_distinct >= 1 AS bins_ascending,
       vmin <= vmax AS centroids_in_range
FROM s
""")
def agg_histogram_equiheight(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """histogram_numeric — Spark's built-in EQUI-HEIGHT histogram
    aggregate (NumericHistogram, the Hive/Ben-Haim-Tom-Tov streaming
    algorithm [PK — Ben-Haim & Tom-Tov, JMLR 2010]): one pass, bounded
    memory, mergeable partials — the histogram you can afford at
    100 TB, vs agg_histogram_fixed_bins' exact equi-WIDTH counts.
    Upgraded from rows-only to an INVARIANT EVAL with a full SQL
    oracle (round 9): the greedy closest-pair bin merging makes the
    CENTROIDS approximation artifacts no SQL recomputes, but four
    properties of the algorithm are exact theorems the oracle
    re-derives from the data — bin count = min(10, distinct values)
    (no merge ever happens below capacity; above it the trim loop
    stops at exactly nb), Σweights = row count (every point lands in
    exactly one bin and merges add weights), centroids strictly
    ascending (each merge replaces an adjacent pair with a point
    strictly between them), and every centroid inside [min, max]
    (centroids are convex combinations of data points). The op runs
    the LIVE aggregate and emits those invariants as hash-checked
    cells; a NumericHistogram regression flips a boolean or a count
    and mismatches. Centroid placement quality stays pinned in
    tests (Σweights/order/range were previously test-only claims)."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    h = f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("value").alias("n_distinct"),
        r6(F.min("value")).alias("vmin_r"),
        r6(F.max("value")).alias("vmax_r"),
        F.min("value").alias("vmin"), F.max("value").alias("vmax"),
        F.expr("histogram_numeric(value, 10)").alias("h"))
    xs = F.transform("h", lambda b: b.getField("x"))
    ws = F.transform("h", lambda b: b.getField("y"))
    return h.select(
        "event_type", "n", "n_distinct",
        F.size("h").alias("n_bins"),
        F.aggregate(ws, F.lit(0.0), lambda a, y: a + y)
         .cast("long").alias("total_weight"),
        F.col("vmin_r").alias("vmin"), F.col("vmax_r").alias("vmax"),
        (F.size(F.filter(
            F.zip_with(xs, F.slice(xs, 2, 2_000_000),
                       lambda a, b: b <= a),
            lambda bad: bad)) == 0).alias("bins_ascending"),
        ((F.array_min(xs) >= F.col("vmin"))
         & (F.array_max(xs) <= F.col("vmax")))
        .alias("centroids_in_range"))


# ---------------------------------------------------------------------------
# IQR fence outlier counts (boxplot audit per group)
# ---------------------------------------------------------------------------

@query("agg_iqr_outlier_count", oracle=f"""
WITH f AS (SELECT event_type, value FROM events
           WHERE value IS NOT NULL AND NOT isnan(value)),
q AS (SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM f GROUP BY event_type)
SELECT f.event_type,
       {r6_sql('MAX(q.q1)')} AS q1, {r6_sql('MAX(q.q3)')} AS q3,
       CAST(count_if(f.value < q.q1 - 1.5 * (q.q3 - q.q1)) AS BIGINT)
         AS n_low,
       CAST(count_if(f.value > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
         AS n_high
FROM f JOIN q USING (event_type)
GROUP BY f.event_type
""")
def agg_iqr_outlier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR FENCE OUTLIER COUNTS — the boxplot audit (Tukey fences at
    1.5·IQR) every data-quality dashboard starts from, as a grouped
    operator: exact interpolated quartiles per group, broadcast back
    onto the rows, INTEGER counts beyond each fence. The counts are
    the robust part of the oracle (a row is either beyond the fence or
    not — the quartiles are bit-identical linear interpolations of the
    same sorted neighbors on both engines, so the fence comparison is
    deterministic). Two passes over the group (quantile, then count) —
    the same aggregate-then-rejoin shape as TPC-H Q17, with the
    quartile table broadcast."""
    ev = load_table(spark, sf_dir, "events")
    f = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", "value"))
    q = f.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"))
    iqr = F.col("q3") - F.col("q1")
    return (f.join(F.broadcast(q), "event_type")
             .groupBy("event_type")
             .agg(r6(F.max("q1")).alias("q1"),
                  r6(F.max("q3")).alias("q3"),
                  F.count_if(F.col("value")
                             < F.col("q1") - 1.5 * iqr).alias("n_low"),
                  F.count_if(F.col("value")
                             > F.col("q3") + 1.5 * iqr).alias("n_high")))


# ---------------------------------------------------------------------------
# Total-variation drift between adjacent weeks (libm-free PSI stand-in)
# ---------------------------------------------------------------------------

@query("agg_tvd_drift", oracle=f"""
WITH c AS (
  SELECT date_trunc('week', ts) AS week, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY week, event_type),
t AS (SELECT week, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY week),
p AS (SELECT c.week, c.event_type,
             CAST(c.n AS DOUBLE) / t.tot AS frac
      FROM c JOIN t USING (week)),
wk AS (SELECT DISTINCT week FROM p),
pairs AS (
  SELECT w1.week AS week_prev, w2.week AS week_cur
  FROM wk w1 JOIN wk w2 ON w2.week = w1.week + INTERVAL 7 DAY),
j AS (
  SELECT pr.week_cur,
         COALESCE(a.frac, 0.0) AS fa, COALESCE(b.frac, 0.0) AS fb
  FROM pairs pr
  JOIN (SELECT DISTINCT event_type FROM c) et ON true
  LEFT JOIN p a ON a.week = pr.week_prev
    AND a.event_type = et.event_type
  LEFT JOIN p b ON b.week = pr.week_cur
    AND b.event_type = et.event_type)
SELECT week_cur AS week, {r6_sql('0.5 * SUM(ABS(fa - fb))')} AS tvd
FROM j GROUP BY week_cur
""")
def agg_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOTAL-VARIATION DISTANCE between adjacent weeks' event-type
    mixes — the category-drift gate run before every retrain. PSI and
    KL need logarithms (libm → cross-engine drift, banned by the
    house rules) and blow up on empty cells; TVD = ½·Σ|p−q| is
    RATIONAL, bounded [0,1], and zero-cell-safe — the drift metric
    that survives both engines and sparse categories. Weekly mix
    tables are category-domain-sized, so the pair join is
    dim×dim-cheap at any event volume; missing categories COALESCE to
    0 on both sides. Fractions divide exact integer counts — IEEE
    deterministic; r6 on the final sum."""
    ev = load_table(spark, sf_dir, "events")
    c = (ev.groupBy(F.date_trunc("week", "ts").alias("week"),
                    "event_type")
           .agg(F.count(F.lit(1)).alias("n")))
    t = c.groupBy("week").agg(F.sum("n").alias("tot"))
    p = (c.join(t, "week")
          .select("week", "event_type",
                  (F.col("n").cast("double") / F.col("tot"))
                  .alias("frac")))
    wk = p.select("week").distinct()
    pairs = (wk.alias("w1")
               .join(wk.alias("w2"),
                     F.col("w2.week")
                     == F.col("w1.week") + F.expr("INTERVAL 7 DAYS"))
               .select(F.col("w1.week").alias("week_prev"),
                       F.col("w2.week").alias("week_cur")))
    et = c.select("event_type").distinct()
    a = p.select(F.col("week").alias("wa"),
                 F.col("event_type").alias("ea"),
                 F.col("frac").alias("fa"))
    b = p.select(F.col("week").alias("wb"),
                 F.col("event_type").alias("eb"),
                 F.col("frac").alias("fb"))
    j = (pairs.crossJoin(F.broadcast(et))
              .join(F.broadcast(a), (F.col("wa") == F.col("week_prev"))
                    & (F.col("ea") == F.col("event_type")), "left_outer")
              .join(F.broadcast(b), (F.col("wb") == F.col("week_cur"))
                    & (F.col("eb") == F.col("event_type")), "left_outer"))
    diff = F.abs(F.coalesce(F.col("fa"), F.lit(0.0))
                 - F.coalesce(F.col("fb"), F.lit(0.0)))
    return (j.groupBy(F.col("week_cur").alias("week"))
             .agg(r6(0.5 * F.sum(diff)).alias("tvd")))
