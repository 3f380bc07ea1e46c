"""Round-9b operator additions: Pettitt change-point detection,
variance-inflation factors, difference-in-differences, IPTW by
subclassification, the LTV cohort triangle, a Granger-style lagged-
regression F comparison, the Hampel rolling-MAD filter, and a
quarantine/dead-letter ingest audit.

Provenance (SURVEY.md §0 applies — empty reference checkout): the
Pettitt test is Pettitt 1979 [PK — rank-based CUSUM change point];
VIF is the textbook collinearity diagnostic [PK — e.g. Kutner et al.,
closed 3×3 inverse]; DiD is Card & Krueger-style 2×2 panel arithmetic
[PK]; subclassification/IPTW is Rosenbaum & Rubin 1983/1984 [PK];
cohort LTV triangles are standard growth accounting [PK]; the Granger
restricted-vs-full SSR comparison is Granger 1969 [PK]; the Hampel
identifier is Hampel 1974 / Pearson 2005 [PK]; quarantine tables /
dead-letter queues are standard ingest architecture [PK].

Float discipline (functions/exact.py house rules): money and counts
ride INTEGER CENTS / BIGINT end to end; ratio-of-sums statistics are
emitted UNROUNDED from decimal-exact (dsum) or integer sums — both
engines assemble the identical doubles from identical exact inputs —
and r6 is applied only to O(1) magnitudes that never sit on the
half-grid (VIF). Windows are per-group over raw rows or global over
POST-AGGREGATION bounded sets only (the round-9 plan-scan rule).

Registered at the TAIL of plans/__init__.py so the driver-budget
rotation keeps earlier never-sampled ids ahead of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql, safe_div
from .registry import query

# house Knuth multiplicative hash (data_split_hash's gate) on user_id
_KNUTH_SQL = "((user_id % 1000003) * 2654435761) % 1000003"


def _treat(col):
    return (((col % 1000003) * F.lit(2654435761)) % 1000003 % 2 == 0)


_OK = "value IS NOT NULL AND NOT isnan(value)"


# ---------------------------------------------------------------------------
# Pettitt change-point test (rank-based CUSUM, integer-exact)
# ---------------------------------------------------------------------------

@query("stat_changepoint_pettitt", oracle="""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type, CAST(ts AS DATE)),
r AS (
  SELECT event_type, day, x,
         RANK() OVER (PARTITION BY event_type ORDER BY x) AS rk,
         COUNT(*) OVER (PARTITION BY event_type, x) AS ties,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d),
u AS (
  SELECT event_type, day, CAST(n AS BIGINT) AS n,
         ABS(SUM(2 * rk + ties - 1) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - t * (n + 1)) AS abs_u
  FROM r),
m AS (SELECT event_type, MAX(abs_u) AS k FROM u GROUP BY event_type)
SELECT u.event_type, MAX(u.n) AS n_days,
       CAST(MAX(m.k) AS BIGINT) AS k_stat,
       MIN(u.day) AS cp_day
FROM u JOIN m ON u.event_type = m.event_type AND u.abs_u = m.k
GROUP BY u.event_type
""")
def stat_changepoint_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PETTITT CHANGE-POINT TEST [PK — Pettitt 1979] per event_type
    over the daily-revenue series: U_t = 2·Σ_{i≤t} r_i − t(n+1) with
    MIDRANKS (2·midrank = 2·rank + ties − 1 keeps everything INTEGER),
    K = max|U_t|, change point = earliest argmax day — the
    distribution-free drift monitor that needs no variance estimate.
    Integer-exact end to end: daily sums in cents, midrank arithmetic
    in BIGINT, deterministic earliest-day tiebreak. Scale: the series
    is the DAILY grid (bounded, post-aggregation) — windows never
    touch raw fact rows; the daily rollup is one hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("x")))
    byt = W.partitionBy("event_type")
    r = d.select(
        "event_type", "day", "x",
        F.rank().over(byt.orderBy("x")).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("event_type", "x"))
         .alias("ties"),
        F.row_number().over(byt.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(byt).alias("n"))
    cum = (F.sum(2 * F.col("rk") + F.col("ties") - 1)
            .over(byt.orderBy("day")
                     .rowsBetween(W.unboundedPreceding, W.currentRow)))
    u = r.select("event_type", "day", F.col("n").cast("long").alias("n"),
                 F.abs(cum - F.col("t") * (F.col("n") + 1)).alias("abs_u"))
    m = u.withColumn("k", F.max("abs_u").over(byt))
    return (m.filter(F.col("abs_u") == F.col("k"))
             .groupBy("event_type")
             .agg(F.max("n").alias("n_days"),
                  F.max("k").cast("long").alias("k_stat"),
                  F.min("day").alias("cp_day")))


# ---------------------------------------------------------------------------
# Variance inflation factors (closed-form 3×3, collinearity audit)
# ---------------------------------------------------------------------------

@query("feature_vif", oracle=f"""
WITH f AS (
  SELECT event_type, value AS x1,
         CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS x2,
         CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS DOUBLE) AS x3
  FROM events WHERE {_OK}),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x1')} AS s1, {dsum_sql('x2')} AS s2,
         {dsum_sql('x3')} AS s3,
         {dsum_sql('x1*x1')} AS s11, {dsum_sql('x1*x2')} AS s12,
         {dsum_sql('x1*x3')} AS s13, {dsum_sql('x2*x2')} AS s22,
         {dsum_sql('x2*x3')} AS s23, {dsum_sql('x3*x3')} AS s33
  FROM f GROUP BY event_type),
c AS (
  SELECT event_type, n,
         (s12 - s1*s2/n) / SQRT((s11 - s1*s1/n) * (s22 - s2*s2/n))
           AS r12,
         (s13 - s1*s3/n) / SQRT((s11 - s1*s1/n) * (s33 - s3*s3/n))
           AS r13,
         (s23 - s2*s3/n) / SQRT((s22 - s2*s2/n) * (s33 - s3*s3/n))
           AS r23
  FROM s),
d AS (
  SELECT event_type, n, r12, r13, r23,
         1 + 2*r12*r13*r23 - r12*r12 - r13*r13 - r23*r23 AS det
  FROM c)
SELECT event_type, n, feature,
       {r6_sql('vif')} AS vif
FROM (
  SELECT event_type, n, 'value' AS feature,
         (1 - r23*r23) / det AS vif FROM d
  UNION ALL SELECT event_type, n, 'hour', (1 - r13*r13) / det FROM d
  UNION ALL SELECT event_type, n, 'dow', (1 - r12*r12) / det FROM d) t
""")
def feature_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANCE INFLATION FACTORS [PK — textbook collinearity audit]
    for the house feature trio (value, hour-of-day, day-of-week) per
    event_type: VIF_i = 1/(1−R²_i) = (inverse correlation matrix)_ii,
    closed form for 3 features from the pairwise correlations —
    det = 1 + 2·r₁₂r₁₃r₂₃ − Σr², VIF₁ = (1−r₂₃²)/det (cyclic). The
    pre-training screen that flags redundant features before any model
    fit. One aggregate pass (DECIMAL-exact Σx, Σx² , Σxy — the
    agg_covariance_matrix machinery), scalar arithmetic after; sqrt is
    IEEE-exact so both engines assemble identical doubles; r6 at the
    boundary (VIF is O(1) by construction on near-orthogonal
    features). Long-form (type, feature, vif) via UNION/stack."""
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

    def sab(a, b):
        return (F.col(f"s{a}{b}")
                - F.col(f"s{a}") * F.col(f"s{b}") / F.col("n"))

    c = s.select(
        "event_type", "n",
        (sab(1, 2) / F.sqrt(sab(1, 1) * sab(2, 2))).alias("r12"),
        (sab(1, 3) / F.sqrt(sab(1, 1) * sab(3, 3))).alias("r13"),
        (sab(2, 3) / F.sqrt(sab(2, 2) * sab(3, 3))).alias("r23"))
    det = (1 + 2 * F.col("r12") * F.col("r13") * F.col("r23")
           - F.col("r12") ** 2 - F.col("r13") ** 2 - F.col("r23") ** 2)
    d = c.withColumn("det", det)
    tri = d.select(
        "event_type", "n",
        F.expr("stack(3, 'value', (1 - r23*r23) / det,"
               "         'hour',  (1 - r13*r13) / det,"
               "         'dow',   (1 - r12*r12) / det)"
               " AS (feature, vif)"))
    return tri.select("event_type", "n", "feature",
                      r6(F.col("vif")).alias("vif"))


# ---------------------------------------------------------------------------
# Difference-in-differences (2×2 exact panel arithmetic)
# ---------------------------------------------------------------------------

@query("causal_did_estimator", oracle=f"""
WITH f AS (
  SELECT CAST(ts AS DATE) AS day, value,
         ({_KNUTH_SQL}) % 2 = 0 AS treat
  FROM events WHERE {_OK} AND user_id IS NOT NULL),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM f),
g AS (
  SELECT treat, (f.day - span.d0) > (span.d1 - span.d0) // 2 AS post,
         CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('value')} AS s
  FROM f, span GROUP BY 1, 2)
SELECT
  MAX(CASE WHEN treat AND NOT post THEN n END) AS n_treat_pre,
  MAX(CASE WHEN treat AND post THEN n END) AS n_treat_post,
  MAX(CASE WHEN NOT treat AND NOT post THEN n END) AS n_ctrl_pre,
  MAX(CASE WHEN NOT treat AND post THEN n END) AS n_ctrl_post,
  MAX(CASE WHEN treat AND NOT post THEN s / n END) AS mean_treat_pre,
  MAX(CASE WHEN treat AND post THEN s / n END) AS mean_treat_post,
  MAX(CASE WHEN NOT treat AND NOT post THEN s / n END) AS mean_ctrl_pre,
  MAX(CASE WHEN NOT treat AND post THEN s / n END) AS mean_ctrl_post,
  (MAX(CASE WHEN treat AND post THEN s / n END)
   - MAX(CASE WHEN treat AND NOT post THEN s / n END))
  - (MAX(CASE WHEN NOT treat AND post THEN s / n END)
     - MAX(CASE WHEN NOT treat AND NOT post THEN s / n END))
    AS did_effect
FROM g
""")
def causal_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES [PK — the 2×2 panel estimator]:
    treatment = the house Knuth hash split on user_id (RNG-free, any
    engine recomputes the identical assignment — ab_srm_check's gate),
    period = first vs second half of the observed day span (scalar
    span row broadcast onto the facts), effect = (ȳ_T,post − ȳ_T,pre)
    − (ȳ_C,post − ȳ_C,pre). All four cell means are ratio-of-2dp-sums
    → emitted UNROUNDED from DECIMAL-exact sums (both engines divide
    identical doubles). One aggregate over one scan; the span lookup
    is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    f = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value")
                   & F.col("user_id").isNotNull())
           .select(F.to_date("ts").alias("day"), "value",
                   _treat(F.col("user_id")).alias("treat")))
    span = f.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    g = (f.crossJoin(F.broadcast(span))
          .withColumn("post",
                      F.datediff("day", "d0")
                      > F.floor(F.datediff("d1", "d0") / 2))
          .groupBy("treat", "post")
          .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("s")))

    def cell(tr, po, expr):
        cond = (F.col("treat") == tr) & (F.col("post") == po)
        return F.max(F.when(cond, expr))

    mean = F.col("s") / F.col("n")
    return g.agg(
        cell(True, False, F.col("n")).alias("n_treat_pre"),
        cell(True, True, F.col("n")).alias("n_treat_post"),
        cell(False, False, F.col("n")).alias("n_ctrl_pre"),
        cell(False, True, F.col("n")).alias("n_ctrl_post"),
        cell(True, False, mean).alias("mean_treat_pre"),
        cell(True, True, mean).alias("mean_treat_post"),
        cell(False, False, mean).alias("mean_ctrl_pre"),
        cell(False, True, mean).alias("mean_ctrl_post"),
        ((cell(True, True, mean) - cell(True, False, mean))
         - (cell(False, True, mean) - cell(False, False, mean)))
        .alias("did_effect"))


# ---------------------------------------------------------------------------
# IPTW / subclassification ATE (stratified propensity, exact rationals)
# ---------------------------------------------------------------------------

@query("causal_iptw_subclass", oracle=f"""
WITH f AS (
  SELECT CAST(EXTRACT(HOUR FROM ts) AS INT) // 6 AS stratum, value,
         ({_KNUTH_SQL}) % 2 = 0 AS treat
  FROM events WHERE {_OK} AND user_id IS NOT NULL),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS big_n FROM f),
s AS (
  SELECT stratum,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(count_if(treat) AS BIGINT) AS n_treat,
         CAST(count_if(NOT treat) AS BIGINT) AS n_ctrl,
         {dsum_sql('CASE WHEN treat THEN value END')} AS st,
         {dsum_sql('CASE WHEN NOT treat THEN value END')} AS sc
  FROM f GROUP BY stratum)
SELECT stratum, n, n_treat, n_ctrl,
       CAST(n_treat AS DOUBLE) / n AS p_treat,
       CASE WHEN n_treat > 0 THEN st / n_treat END AS mean_treated,
       CASE WHEN n_ctrl > 0 THEN sc / n_ctrl END AS mean_control,
       CASE WHEN n_treat > 0 AND n_ctrl > 0
            THEN (st / n_treat - sc / n_ctrl) * n / big_n
       END AS ate_contrib
FROM s, tot
""")
def causal_iptw_subclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATE BY SUBCLASSIFICATION [PK — Rosenbaum & Rubin 1983/84]: the
    non-parametric causal estimator that needs no fitted model —
    stratify on the confounder proxy (hour-of-day quarters), estimate
    the propensity INSIDE each stratum as the exact treated share,
    and weight each stratum's treated-vs-control mean difference by
    its population share: ATE = Σ_s (n_s/N)(ȳ_T,s − ȳ_C,s) —
    algebraically the IPTW estimator with the subclass-constant
    propensity. Treatment is the house Knuth split (RNG-free).
    Integer counts + DECIMAL-exact sums → unrounded identical ratios;
    empty arms degrade to NULL via guarded division (safe_div house
    rule). One aggregate pass + a 1-row broadcast total."""
    ev = load_table(spark, sf_dir, "events")
    f = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value")
                   & F.col("user_id").isNotNull())
           .select((F.hour("ts").cast("int") / 6).cast("int")
                   .alias("stratum"),
                   "value", _treat(F.col("user_id")).alias("treat")))
    tot = f.agg(F.count(F.lit(1)).alias("big_n"))
    s = f.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("treat")).alias("n_treat"),
        F.count_if(~F.col("treat")).alias("n_ctrl"),
        dsum(F.when(F.col("treat"), F.col("value"))).alias("st"),
        dsum(F.when(~F.col("treat"), F.col("value"))).alias("sc"))
    mt = safe_div(F.col("st"), F.col("n_treat"))
    mc = safe_div(F.col("sc"), F.col("n_ctrl"))
    return (s.crossJoin(F.broadcast(tot))
             .select("stratum", "n", "n_treat", "n_ctrl",
                     (F.col("n_treat").cast("double") / F.col("n"))
                     .alias("p_treat"),
                     mt.alias("mean_treated"),
                     mc.alias("mean_control"),
                     ((mt - mc) * F.col("n") / F.col("big_n"))
                     .alias("ate_contrib")))


# ---------------------------------------------------------------------------
# LTV cohort triangle (signup-cohort × age cumulative revenue, cents)
# ---------------------------------------------------------------------------

@query("ltv_cohort_triangle", oracle="""
WITH o AS (
  SELECT o_custkey,
         EXTRACT(YEAR FROM o_orderdate) * 12
           + EXTRACT(MONTH FROM o_orderdate) - 1 AS m,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
first AS (SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY o_custkey),
size_ AS (SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM first GROUP BY cohort_m),
j AS (
  SELECT f.cohort_m, o.m - f.cohort_m AS age, o.cents, o.o_custkey
  FROM o JOIN first f USING (o_custkey)),
g AS (
  SELECT cohort_m, CAST(age AS INT) AS age,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM j GROUP BY cohort_m, age)
SELECT CAST(MAKE_DATE(CAST(g.cohort_m // 12 AS INT),
                      CAST(g.cohort_m % 12 + 1 AS INT), 1) AS DATE)
         AS cohort,
       g.age, g.n_orders, g.active_customers, s.cohort_size,
       g.rev_cents,
       CAST(SUM(g.rev_cents) OVER (
              PARTITION BY g.cohort_m ORDER BY g.age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_rev_cents,
       CAST(SUM(g.rev_cents) OVER (
              PARTITION BY g.cohort_m ORDER BY g.age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100.0 / s.cohort_size AS ltv_per_customer
FROM g JOIN size_ s USING (cohort_m)
""")
def ltv_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV COHORT TRIANGLE [PK — standard growth accounting]: assign
    every customer to its FIRST-order month (the cohort), then roll
    revenue up by (cohort, months-since-first) and cumulate along age
    — the (cohort × age) triangle behind every retention-revenue
    dashboard, with exact per-customer lifetime value. Money rides
    INTEGER CENTS (the q1 path) so the cumulative sums are BIGINT-
    exact; month arithmetic is integer (y·12+m). The age cumsum is a
    window over the AGGREGATED triangle (cohorts×ages — bounded), and
    the per-customer LTV is an exact-integer ratio emitted unrounded.
    Scale: first-order lookup is a groupBy on the join key, so the
    fact join co-partitions (AQE broadcasts the build side only when
    it measures small); cohort_size is NOT a second orders scan — by
    construction every cohort customer has an order at age 0 (its
    first month), so cohort_size = active_customers at age 0, read
    off the bounded triangle with a window (the oracle independently
    recomputes it from the DEFINITION — min-month groupBy — so the
    theorem itself is hash-checked)."""
    o = (load_table(spark, sf_dir, "orders")
         .select("o_custkey",
                 (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
                 .alias("m"),
                 F.round(F.col("o_totalprice") * 100).cast("long")
                 .alias("cents")))
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    j = (o.join(first, "o_custkey")
          .select("cohort_m", (F.col("m") - F.col("cohort_m")).alias("age"),
                  "cents", "o_custkey"))
    g = (j.groupBy("cohort_m", F.col("age").cast("int").alias("age"))
          .agg(F.count(F.lit(1)).alias("n_orders"),
               F.countDistinct("o_custkey").alias("active_customers"),
               F.sum("cents").alias("rev_cents")))
    byc = W.partitionBy("cohort_m")
    cum = (F.sum("rev_cents")
            .over(byc.orderBy("age")
                     .rowsBetween(W.unboundedPreceding, W.currentRow)))
    size = F.max(F.when(F.col("age") == 0, F.col("active_customers"))
                 ).over(byc)
    return (g.withColumn("cohort_size", size)
             .select(
                 F.make_date((F.col("cohort_m") / 12).cast("int"),
                             (F.col("cohort_m") % 12 + 1).cast("int"),
                             F.lit(1)).alias("cohort"),
                 "age", "n_orders", "active_customers", "cohort_size",
                 "rev_cents",
                 cum.cast("long").alias("cum_rev_cents"),
                 (cum.cast("double") / 100.0 / F.col("cohort_size"))
                 .alias("ltv_per_customer")))


# ---------------------------------------------------------------------------
# Granger-style lagged regression comparison (restricted vs full SSR)
# ---------------------------------------------------------------------------

@query("ts_granger_lite", oracle=f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count_if(event_type = 'click') AS BIGINT) AS x,
         CAST(count_if(event_type = 'purchase') AS BIGINT) AS y
  FROM events GROUP BY 1),
l AS (
  SELECT day, CAST(y AS DOUBLE) AS y,
         CAST(LAG(y) OVER (ORDER BY day) AS DOUBLE) AS y1,
         CAST(LAG(x) OVER (ORDER BY day) AS DOUBLE) AS x1
  FROM d),
f AS (SELECT * FROM l WHERE y1 IS NOT NULL),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('y')} AS sy, {dsum_sql('y1')} AS sy1,
         {dsum_sql('x1')} AS sx1,
         {dsum_sql('y1*y1')} AS s11, {dsum_sql('y1*x1')} AS s12,
         {dsum_sql('x1*x1')} AS s22,
         {dsum_sql('y1*y')} AS s1y, {dsum_sql('x1*y')} AS s2y
  FROM f),
b AS (
  SELECT n,
         (s11 - sy1*sy1/n) AS c11, (s12 - sy1*sx1/n) AS c12,
         (s22 - sx1*sx1/n) AS c22,
         (s1y - sy1*sy/n) AS c1y, (s2y - sx1*sy/n) AS c2y,
         sy/n AS my, sy1/n AS my1, sx1/n AS mx1
  FROM s),
cf AS (
  SELECT n, my, my1, mx1,
         (c1y*c22 - c2y*c12) / (c11*c22 - c12*c12) AS b1,
         (c2y*c11 - c1y*c12) / (c11*c22 - c12*c12) AS b2,
         c1y / c11 AS br
  FROM b),
res AS (
  SELECT cf.n, cf.b2 AS beta_x_lag,
         {dsum_sql('POW(f.y - (cf.my - cf.b1*cf.my1 - cf.b2*cf.mx1) '
                    '- cf.b1*f.y1 - cf.b2*f.x1, 2)')} AS ssr_full,
         {dsum_sql('POW(f.y - (cf.my - cf.br*cf.my1) '
                    '- cf.br*f.y1, 2)')} AS ssr_restricted
  FROM f, cf GROUP BY cf.n, cf.b2)
SELECT n, beta_x_lag, ssr_full, ssr_restricted,
       (ssr_restricted - ssr_full) / (ssr_full / (n - 3)) AS f_stat
FROM res
""")
def ts_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRANGER-STYLE LAG COMPARISON [PK — Granger 1969]: does
    yesterday's CLICK volume improve the 1-lag autoregression of
    today's PURCHASE volume? Fit y_t ~ 1 + y_{t−1} (+ x_{t−1}) by
    closed-form normal equations over the DAILY series (bounded,
    post-aggregation — the lag window rides the day grid, never raw
    rows), then compare residual sums of squares:
    F = (SSR_r − SSR_f) / (SSR_f/(n−3)). Counts are BIGINT; the
    centered cross-products route through DECIMAL sums; the betas are
    identical doubles on both engines; SSRs are computed by an
    EXPLICIT residual pass (never the Syy − bᵀSxy identity — that is
    a cancelling difference of large terms, the ANOVA lesson) and
    string-routed. Everything emitted unrounded."""
    ev = load_table(spark, sf_dir, "events")
    d = (ev.groupBy(F.to_date("ts").alias("day"))
           .agg(F.count_if(F.col("event_type") == "click").alias("x"),
                F.count_if(F.col("event_type") == "purchase").alias("y")))
    wd = W.orderBy("day")  # day grid: bounded post-aggregation window
    l = d.select(
        "day", F.col("y").cast("double").alias("y"),
        F.lag(F.col("y").cast("double")).over(wd).alias("y1"),
        F.lag(F.col("x").cast("double")).over(wd).alias("x1"))
    f = l.filter(F.col("y1").isNotNull())
    s = f.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("y").alias("sy"), dsum("y1").alias("sy1"),
        dsum("x1").alias("sx1"),
        dsum(F.col("y1") * F.col("y1")).alias("s11"),
        dsum(F.col("y1") * F.col("x1")).alias("s12"),
        dsum(F.col("x1") * F.col("x1")).alias("s22"),
        dsum(F.col("y1") * F.col("y")).alias("s1y"),
        dsum(F.col("x1") * F.col("y")).alias("s2y"))
    n = F.col("n")
    b = s.select(
        "n",
        (F.col("s11") - F.col("sy1") * F.col("sy1") / n).alias("c11"),
        (F.col("s12") - F.col("sy1") * F.col("sx1") / n).alias("c12"),
        (F.col("s22") - F.col("sx1") * F.col("sx1") / n).alias("c22"),
        (F.col("s1y") - F.col("sy1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("sx1") * F.col("sy") / n).alias("c2y"),
        (F.col("sy") / n).alias("my"), (F.col("sy1") / n).alias("my1"),
        (F.col("sx1") / n).alias("mx1"))
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    cf = b.select(
        "n", "my", "my1", "mx1",
        ((F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det)
        .alias("b1"),
        ((F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det)
        .alias("b2"),
        (F.col("c1y") / F.col("c11")).alias("br"))
    rf = (f.crossJoin(F.broadcast(cf))  # 1-row coefficient broadcast
           .groupBy("n", "b2")
           .agg(dsum(F.pow(F.col("y")
                           - (F.col("my") - F.col("b1") * F.col("my1")
                              - F.col("b2") * F.col("mx1"))
                           - F.col("b1") * F.col("y1")
                           - F.col("b2") * F.col("x1"), F.lit(2)))
                 .alias("ssr_full"),
                dsum(F.pow(F.col("y")
                           - (F.col("my") - F.col("br") * F.col("my1"))
                           - F.col("br") * F.col("y1"), F.lit(2)))
                 .alias("ssr_restricted")))
    return rf.select(
        "n", F.col("b2").alias("beta_x_lag"), "ssr_full",
        "ssr_restricted",
        ((F.col("ssr_restricted") - F.col("ssr_full"))
         / (F.col("ssr_full") / (F.col("n") - 3))).alias("f_stat"))


# ---------------------------------------------------------------------------
# Hampel rolling-median/MAD outlier filter
# ---------------------------------------------------------------------------

@query("win_hampel_filter", oracle="""
WITH f AS (SELECT event_type, ts, event_id, value FROM events
           WHERE value IS NOT NULL AND NOT isnan(value)),
m AS (
  SELECT event_type, ts, event_id, value,
         quantile_cont(value, 0.5) OVER w AS med
  FROM f
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)),
dv AS (
  SELECT event_type, ts, event_id, ABS(value - med) AS dev
  FROM m),
md AS (
  SELECT event_type, dev,
         quantile_cont(dev, 0.5) OVER w AS mad
  FROM dv
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING))
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(count_if(dev > 3.0 * 1.4826 * mad) AS BIGINT) AS n_flagged,
       CAST(count_if(dev > 3.0 * 1.4826 * mad) * 1000000 // COUNT(*)
            AS BIGINT) AS flag_ppm
FROM md GROUP BY event_type
""")
def win_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMPEL IDENTIFIER [PK — Hampel 1974 / Pearson's MAD filter]:
    the robust rolling outlier detector — flag a point whose deviation
    from the ±5-row rolling MEDIAN exceeds 3·1.4826·rolling-MAD (MAD
    of the same frame; 1.4826 is the Gaussian consistency constant).
    Two stacked windows over the same deterministic (ts, event_id)
    frame — the rolling median of the values, then the rolling median
    of the absolute deviations — both interpolated identically by the
    two engines on identical frame contents, so the strict-inequality
    flags are exact and the output is INTEGER counts + PPM share per
    event_type. The z-score siblings (win_anomaly_zscore,
    win_rolling_iqr_anomaly) break on heavy tails; the Hampel filter
    is the production default for sensor despiking. Scale: windows
    partition by event_type over raw rows — same class as the
    existing rolling-anomaly ops; at wider keys the partition column
    absorbs the sort."""
    ev = load_table(spark, sf_dir, "events")
    f = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", "ts", "event_id", "value"))
    w = (W.partitionBy("event_type").orderBy("ts", "event_id")
          .rowsBetween(-5, 5))
    m = f.withColumn("med", F.expr("percentile(value, 0.5)").over(w))
    dv = m.select("event_type", "ts", "event_id",
                  F.abs(F.col("value") - F.col("med")).alias("dev"))
    md = dv.withColumn("mad", F.expr("percentile(dev, 0.5)").over(w))
    flagged = F.count_if(F.col("dev") > 3.0 * 1.4826 * F.col("mad"))
    return (md.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   flagged.alias("n_flagged"),
                   (flagged * 1000000 / F.count(F.lit(1)))
                   .cast("long").alias("flag_ppm")))


# ---------------------------------------------------------------------------
# Quarantine / dead-letter ingest audit
# ---------------------------------------------------------------------------

_DQ_RULES_SQL = """
  value IS NULL AS r_null_value,
  value IS NOT NULL AND isnan(value) AS r_nan_value,
  value IS NOT NULL AND NOT isnan(value)
    AND (value < 0 OR value > 100000) AS r_range_value,
  event_type IS NULL
    OR NOT regexp_matches(event_type, '^[a-z_]{2,20}$') AS r_bad_type,
  ts IS NULL OR ts < TIMESTAMP '1990-01-01'
    OR ts >= TIMESTAMP '2035-01-01' AS r_ts_bounds,
  user_id IS NULL AS r_null_user
"""


@query("dq_quarantine_dlq", oracle=f"""
WITH r AS (
  SELECT {_DQ_RULES_SQL}
  FROM events),
q AS (
  SELECT *, r_null_value OR r_nan_value OR r_range_value
            OR r_bad_type OR r_ts_bounds OR r_null_user AS quarantined
  FROM r),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(count_if(r_null_value) AS BIGINT) AS n_null_value,
         CAST(count_if(r_nan_value) AS BIGINT) AS n_nan_value,
         CAST(count_if(r_range_value) AS BIGINT) AS n_range_value,
         CAST(count_if(r_bad_type) AS BIGINT) AS n_bad_type,
         CAST(count_if(r_ts_bounds) AS BIGINT) AS n_ts_bounds,
         CAST(count_if(r_null_user) AS BIGINT) AS n_null_user,
         CAST(count_if(quarantined) AS BIGINT) AS n_quarantined,
         CAST(count_if(NOT quarantined) AS BIGINT) AS n_valid
  FROM q)
SELECT rule, n FROM (
  SELECT 'null_value' AS rule, n_null_value AS n, 1 AS o FROM c
  UNION ALL SELECT 'nan_value', n_nan_value, 2 FROM c
  UNION ALL SELECT 'range_value', n_range_value, 3 FROM c
  UNION ALL SELECT 'bad_type', n_bad_type, 4 FROM c
  UNION ALL SELECT 'ts_bounds', n_ts_bounds, 5 FROM c
  UNION ALL SELECT 'null_user', n_null_user, 6 FROM c
  UNION ALL SELECT '_quarantined', n_quarantined, 7 FROM c
  UNION ALL SELECT '_valid', n_valid, 8 FROM c
  UNION ALL SELECT '_total', total, 9 FROM c) t
ORDER BY o
""")
def dq_quarantine_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINE / DEAD-LETTER AUDIT [PK — standard ingest
    architecture]: evaluate every validation rule on every row in ONE
    pass (null key, NaN, range fence, type-format regex, timestamp
    bounds), split the batch into valid vs quarantined (any rule
    fires), and emit the per-rule violation counts plus the
    valid/quarantined/total triple — the report a DLQ-fronted ingest
    writes next to each batch. A row is quarantined ONCE no matter
    how many rules it breaks (the rule rows overlap; the _quarantined
    row is the deduplicated union — Σ rules ≥ _quarantined by
    design). All INTEGER counts; rule semantics identical cross-engine
    (rlike ↔ regexp_matches on an anchored class pattern, ANSI
    null-safe boolean composition). At 100 TB this is one codegen'd
    scan — the quarantine WRITE path is the same predicate reused as
    a filter (no second evaluation)."""
    ev = load_table(spark, sf_dir, "events")
    rules = {
        "null_value": F.col("value").isNull(),
        "nan_value": F.col("value").isNotNull() & F.isnan("value"),
        "range_value": (F.col("value").isNotNull() & ~F.isnan("value")
                        & ((F.col("value") < 0)
                           | (F.col("value") > 100000))),
        "bad_type": (F.col("event_type").isNull()
                     | ~F.col("event_type").rlike("^[a-z_]{2,20}$")),
        "ts_bounds": (F.col("ts").isNull()
                      | (F.col("ts") < F.lit("1990-01-01").cast("timestamp"))
                      | (F.col("ts") >= F.lit("2035-01-01")
                         .cast("timestamp"))),
        "null_user": F.col("user_id").isNull(),
    }
    quarantined = None
    for c in rules.values():
        quarantined = c if quarantined is None else (quarantined | c)
    aggs = [F.count(F.lit(1)).alias("total")]
    aggs += [F.count_if(c).alias(f"n_{k}") for k, c in rules.items()]
    aggs += [F.count_if(quarantined).alias("n_quarantined"),
             F.count_if(~quarantined).alias("n_valid")]
    c = ev.agg(*aggs)
    stack_args = ", ".join(
        [f"'{k}', n_{k}" for k in rules]
        + ["'_quarantined', n_quarantined", "'_valid', n_valid",
           "'_total', total"])
    return c.select(F.expr(
        f"stack({len(rules) + 3}, {stack_args}) AS (rule, n)"))
