"""Round-6h operator additions: the experimentation / effect-size family.

Spearman rank correlation, Cohen's d, Cramér's V, and the two A/B
platform primitives every experimentation system runs at warehouse
scale: the sample-ratio-mismatch (SRM) audit and CUPED variance
reduction. All built on the repo's exact-arithmetic toolkit
(functions/exact.py): midranks and counts are exact rationals,
products of identical doubles are IEEE-deterministic cross-engine,
sums run through DECIMAL(38,12), and only the final statistic is
assembled in double (identical expression text both sides) and
rounded to 6 dp.

Provenance note (SURVEY.md §0 applies — empty reference checkout):
all public-API constructions ([SPARK]/[PK] — textbook statistics:
Spearman 1904, Cohen 1988, Cramér 1946; CUPED is Deng et al., WSDM
2013 [PK]; SRM chi-square is the standard A/A gate).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead
of these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (
    dsum,
    dsum_sql,
    r6,
    r6_sql,
    safe_div,
    safe_sqrt,
    safe_sqrt_sql,
)
from .registry import query


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Spearman rank correlation (midranks for ties)
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = f"""
WITH r AS (
  SELECT l_returnflag,
         RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)
             / 2.0 AS rx,
         RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
              - 1) / 2.0 AS ry
  FROM lineitem),
s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql('rx')} AS sx, {dsum_sql('ry')} AS sy,
         {dsum_sql('rx * ry')} AS sxy,
         {dsum_sql('rx * rx')} AS sxx,
         {dsum_sql('ry * ry')} AS syy
  FROM r GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       {r6_sql(f"(n * sxy - sx * sy) / "
               f"({safe_sqrt_sql('n * sxx - sx * sx')}"
               f" * {safe_sqrt_sql('n * syy - sy * sy')})")} AS spearman_rho
FROM s ORDER BY l_returnflag
"""


@query("stat_spearman_corr", oracle=_SPEARMAN_SQL)
def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK CORRELATION per group [PK — Spearman 1904]: the
    robust monotone-association measure Pearson corr (agg_corr_covar)
    is not — outliers and nonlinear-but-monotone relations rank
    identically. Ties get MIDRANKS (the textbook treatment):
    RANK() + (|ties| − 1)/2, an exact .5-quantized rational from two
    window functions — no libm, no percent_rank float. Pearson on the
    midranks is then assembled from five DECIMAL(38,12)-exact sums;
    only the final ratio+sqrt runs in double (identical expression
    both engines) and rounds to 6 dp. Scale: two window passes over
    the SAME partition key then one hash aggregate — the rank windows
    sort within group partitions (Spark range-partitions each window;
    at 100 TB the per-group sort is the inherent cost of exact ranks,
    and groups parallelize independently). safe_sqrt guards the
    constant-column degenerate group (zero rank variance → NULL)."""
    li = load_table(spark, sf_dir, "lineitem")
    wq = W.partitionBy("l_returnflag").orderBy("l_quantity")
    wqt = W.partitionBy("l_returnflag", "l_quantity")
    we = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wet = W.partitionBy("l_returnflag", "l_extendedprice")
    r = li.select(
        "l_returnflag",
        (F.rank().over(wq) + (F.count("*").over(wqt) - 1) / 2.0).alias("rx"),
        (F.rank().over(we) + (F.count("*").over(wet) - 1) / 2.0).alias("ry"),
    )
    rx, ry = F.col("rx"), F.col("ry")
    s = r.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(rx).alias("sx"), dsum(ry).alias("sy"),
        dsum(rx * ry).alias("sxy"),
        dsum(rx * rx).alias("sxx"),
        dsum(ry * ry).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    rho = (n * sxy - sx * sy) / (safe_sqrt(n * sxx - sx * sx)
                                 * safe_sqrt(n * syy - sy * sy))
    return (s.select("l_returnflag", n.cast("long").alias("n"),
                     r6(rho).alias("spearman_rho"))
             .orderBy("l_returnflag"))


# ---------------------------------------------------------------------------
# Cohen's d effect size
# ---------------------------------------------------------------------------

_POOLED_SD_SQL = safe_sqrt_sql(
    "((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2)) / (n1 + n2 - 2.0)")

_COHENS_D_SQL = f"""
WITH s AS (
  SELECT user_id,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
              AS DOUBLE) AS n1,
         CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
              AS DOUBLE) AS n2,
         {dsum_sql("CASE WHEN event_type = 'purchase' THEN value END")}
           AS s1,
         {dsum_sql("CASE WHEN event_type = 'click' THEN value END")}
           AS s2,
         {dsum_sql("CASE WHEN event_type = 'purchase' "
                   "THEN value * value END")} AS ss1,
         {dsum_sql("CASE WHEN event_type = 'click' "
                   "THEN value * value END")} AS ss2
  FROM events GROUP BY user_id)
SELECT user_id, CAST(n1 AS BIGINT) AS n_purchase,
       CAST(n2 AS BIGINT) AS n_click,
       {r6_sql("(s1 / n1 - s2 / n2) / " + _POOLED_SD_SQL)} AS cohens_d
FROM s WHERE n1 >= 2 AND n2 >= 2 ORDER BY user_id
"""


@query("stat_cohens_d", oracle=_COHENS_D_SQL)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S D standardized effect size [PK — Cohen 1988] between
    two event populations per user: mean difference over the POOLED
    standard deviation sqrt(((n1−1)s1² + (n2−1)s2²)/(n1+n2−2)) —
    the metric that says whether a statistically-significant
    difference (agg_welch_ttest's job) is also practically large.
    Both populations' sums/sum-of-squares come from ONE conditional
    hash aggregate over one scan (the FILTER/CASE pattern — no
    self-join), exactly summed through DECIMAL(38,12); the pooled-sd
    expansion ((ss − s²/n) terms) is algebraically (n−1)s² so the
    pooled formula collapses to the sums directly. safe_sqrt guards
    constant-value degenerate users. Scale: one map-side-combined
    aggregate keyed by user — same cost as any groupBy, any SF."""
    ev = load_table(spark, sf_dir, "events")
    is1 = F.col("event_type") == "purchase"
    is2 = F.col("event_type") == "click"
    v = F.col("value")
    s = ev.groupBy("user_id").agg(
        F.count(F.when(is1, 1)).cast("double").alias("n1"),
        F.count(F.when(is2, 1)).cast("double").alias("n2"),
        dsum(F.when(is1, v)).alias("s1"),
        dsum(F.when(is2, v)).alias("s2"),
        dsum(F.when(is1, v * v)).alias("ss1"),
        dsum(F.when(is2, v * v)).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    s1, s2, ss1, ss2 = F.col("s1"), F.col("s2"), F.col("ss1"), F.col("ss2")
    pooled = safe_sqrt(((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2))
                       / (n1 + n2 - F.lit(2.0)))
    return (s.filter((n1 >= 2) & (n2 >= 2))
             .select("user_id", n1.cast("long").alias("n_purchase"),
                     n2.cast("long").alias("n_click"),
                     r6((s1 / n1 - s2 / n2) / pooled).alias("cohens_d"))
             .orderBy("user_id"))


# ---------------------------------------------------------------------------
# Cramér's V association strength
# ---------------------------------------------------------------------------

_CRAMERS_V_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(user_id % 4 AS BIGINT) AS cohort
  FROM events),
o AS (SELECT event_type, cohort, CAST(COUNT(*) AS BIGINT) AS obs
      FROM base GROUP BY event_type, cohort),
rt AS (SELECT event_type, CAST(SUM(obs) AS DOUBLE) AS row_tot
       FROM o GROUP BY event_type),
ct AS (SELECT cohort, CAST(SUM(obs) AS DOUBLE) AS col_tot
       FROM o GROUP BY cohort),
tot AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n,
               CAST(COUNT(DISTINCT event_type) AS DOUBLE) AS r,
               CAST(COUNT(DISTINCT cohort) AS DOUBLE) AS c
        FROM o),
chi AS (
  SELECT {dsum_sql('(o.obs - rt.row_tot * ct.col_tot / tot.n)'
                   ' * (o.obs - rt.row_tot * ct.col_tot / tot.n)'
                   ' / (rt.row_tot * ct.col_tot / tot.n)')} AS chi2,
         MIN(tot.n) AS n, MIN(tot.r) AS r, MIN(tot.c) AS c
  FROM o JOIN rt USING (event_type) JOIN ct USING (cohort)
       CROSS JOIN tot)
SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_rows,
       CAST(c AS BIGINT) AS n_cols, {r6_sql('chi2')} AS chi2,
       {r6_sql(safe_sqrt_sql(
           'chi2 / (n * (CASE WHEN r < c THEN r ELSE c END - 1.0))'))}
         AS cramers_v
FROM chi
"""


@query("stat_cramers_v", oracle=_CRAMERS_V_SQL)
def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V [PK — Cramér 1946]: chi-square association strength
    normalized to [0,1] by n·(min(r,c)−1), the scale-free companion
    to agg_chi2_independence (whose raw χ² grows with n and table
    size — V answers "how strong", not "how unlikely"). The
    contingency table is built as counts (exact BIGINT), expected
    cells are exact rationals row·col/n, and the χ² terms — identical
    double expressions both engines — are DECIMAL-summed. Broadcast
    structure: the cell table is tiny after the first aggregate, so
    the row/col/total joins are broadcast no-shuffle joins at any SF
    (the only full-data pass is the first groupBy count)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type",
                     (F.col("user_id") % 4).cast("long").alias("cohort"))
    o = base.groupBy("event_type", "cohort").agg(
        F.count("*").cast("long").alias("obs"))
    rt = o.groupBy("event_type").agg(
        F.sum("obs").cast("double").alias("row_tot"))
    ct = o.groupBy("cohort").agg(
        F.sum("obs").cast("double").alias("col_tot"))
    tot = o.agg(F.sum("obs").cast("double").alias("n"),
                F.countDistinct("event_type").cast("double").alias("r"),
                F.countDistinct("cohort").cast("double").alias("c"))
    j = (o.join(F.broadcast(rt), "event_type")
          .join(F.broadcast(ct), "cohort")
          .crossJoin(F.broadcast(tot)))
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi = j.agg(
        dsum((F.col("obs") - e) * (F.col("obs") - e) / e).alias("chi2"),
        F.min("n").alias("n"), F.min("r").alias("r"), F.min("c").alias("c"))
    n, r, c = F.col("n"), F.col("r"), F.col("c")
    v = safe_sqrt(F.col("chi2") / (n * (F.when(r < c, r).otherwise(c)
                                        - F.lit(1.0))))
    return chi.select(n.cast("long").alias("n"),
                      r.cast("long").alias("n_rows"),
                      c.cast("long").alias("n_cols"),
                      r6(F.col("chi2")).alias("chi2"),
                      r6(v).alias("cramers_v"))


# ---------------------------------------------------------------------------
# A/B sample-ratio-mismatch audit
# ---------------------------------------------------------------------------

_SRM_SQL = f"""
WITH assigned AS (
  SELECT CASE WHEN (event_id % 1000003) * 2654435761 % 1000003 % 100 < 50
              THEN 'A' ELSE 'B' END AS variant
  FROM events),
c AS (
  SELECT CAST(COUNT(CASE WHEN variant = 'A' THEN 1 END) AS BIGINT) AS n_a,
         CAST(COUNT(CASE WHEN variant = 'B' THEN 1 END) AS BIGINT) AS n_b
  FROM assigned)
SELECT n_a, n_b,
       {r6_sql('(n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)'
               ' / ((n_a + n_b) / 2.0)'
               ' + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)'
               ' / ((n_a + n_b) / 2.0)')} AS chi2,
       COALESCE((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
                  / ((n_a + n_b) / 2.0)
                + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
                  / ((n_a + n_b) / 2.0) > 3.841, false) AS srm_flag
FROM c
"""


@query("ab_srm_check", oracle=_SRM_SQL)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH audit [PK — standard A/B trust gate]:
    assign every unit to a variant with the repo's portable Knuth
    multiplicative hash (data_split_hash's gate — RNG-free, any
    engine/cluster recomputes the identical assignment), then test
    the observed split against the designed 50/50 with a 1-df
    chi-square; χ² > 3.841 (p < .05) flags a broken randomizer or a
    biased logging path — the first thing a real experimentation
    platform checks before reading any metric. Counts are exact
    BIGINTs; the χ² is one identical double expression per engine
    rounded to 6 dp; srm_flag is COALESCEd non-null (registry boolean
    rule). Scale: one conditional count aggregate over one scan —
    map-side combined, constant-size output at any SF."""
    ev = load_table(spark, sf_dir, "events")
    h = (F.col("event_id") % 1000003) * F.lit(2654435761) % 1000003 % 100
    assigned = ev.select(
        F.when(h < 50, "A").otherwise("B").alias("variant"))
    c = assigned.agg(
        F.count(F.when(F.col("variant") == "A", 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == "B", 1)).alias("n_b"))
    n_a, n_b = F.col("n_a"), F.col("n_b")
    exp = (n_a + n_b) / F.lit(2.0)
    chi2 = ((n_a - exp) * (n_a - exp) / exp
            + (n_b - exp) * (n_b - exp) / exp)
    return c.select(n_a.alias("n_a"), n_b.alias("n_b"),
                    r6(chi2).alias("chi2"),
                    F.coalesce(chi2 > 3.841, F.lit(False)).alias("srm_flag"))


# ---------------------------------------------------------------------------
# CUPED variance reduction
# ---------------------------------------------------------------------------

_CUPED_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (user_id % 1000003) * 2654435761 % 1000003 % 100 < 50
              THEN 'A' ELSE 'B' END AS variant,
         {dsum_sql("CASE WHEN ts < TIMESTAMP '2024-01-15' "
                   "THEN value ELSE 0.0 END")} AS x,
         {dsum_sql("CASE WHEN ts >= TIMESTAMP '2024-01-15' "
                   "THEN value ELSE 0.0 END")} AS y
  FROM events GROUP BY user_id),
g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * y')} AS sxy, {dsum_sql('x * x')} AS sxx
  FROM per_user),
theta AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS th,
         sx / n AS x_bar
  FROM g)
SELECT p.variant,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       {r6_sql(f"{dsum_sql('p.y')} / COUNT(*)")} AS raw_mean,
       {r6_sql(f"{dsum_sql('p.y - t.th * (p.x - t.x_bar)')} / COUNT(*)")}
         AS cuped_mean,
       {r6_sql('MIN(t.th)')} AS theta
FROM per_user p CROSS JOIN theta t
GROUP BY p.variant ORDER BY p.variant
"""


@query("ab_cuped_adjustment", oracle=_CUPED_SQL)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction [PK — Deng, Xu, Kohavi & Walker, WSDM
    2013]: adjust each unit's experiment-period metric y by its
    PRE-period covariate x — ŷ = y − θ(x − x̄), θ = cov(x,y)/var(x) —
    removing the between-user variance x explains (the standard ~40%
    CI-width win on revenue metrics). Pipeline: one conditional
    aggregate builds (x, y) per user from one scan (pre/post split on
    the timestamp), θ comes from the global exact-sum moments, and
    the per-variant means of raw vs adjusted y drop out of one more
    aggregate; the 1-row θ table rides a broadcast cross join, so the
    whole op is two hash aggregates + one broadcast at any SF.
    Variant assignment reuses the portable hash gate on user_id
    (assignment must key on the UNIT, not the event, or a user's
    events split across variants). All sums DECIMAL-exact; products
    of identical doubles are IEEE-deterministic; final stats round to
    6 dp."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    h = (F.col("user_id") % 1000003) * F.lit(2654435761) % 1000003 % 100
    per_user = ev.groupBy("user_id").agg(
        dsum(F.when(F.col("ts") < cutoff, F.col("value"))
              .otherwise(F.lit(0.0))).alias("x"),
        dsum(F.when(F.col("ts") >= cutoff, F.col("value"))
              .otherwise(F.lit(0.0))).alias("y"),
    ).withColumn("variant", F.when(h < 50, "A").otherwise("B"))
    x, y = F.col("x"), F.col("y")
    g = per_user.agg(F.count("*").cast("double").alias("n"),
                     dsum(x).alias("sx"), dsum(y).alias("sy"),
                     dsum(x * y).alias("sxy"), dsum(x * x).alias("sxx"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    theta = g.select(
        ((n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx))
        .alias("th"),
        (sx / n).alias("x_bar"))
    j = per_user.crossJoin(F.broadcast(theta))
    adj = F.col("y") - F.col("th") * (F.col("x") - F.col("x_bar"))
    return (j.groupBy("variant")
             .agg(F.count("*").alias("n_users"),
                  r6(dsum(F.col("y")) / F.count("*")).alias("raw_mean"),
                  r6(dsum(adj) / F.count("*")).alias("cuped_mean"),
                  r6(F.min("th")).alias("theta"))
             .orderBy("variant"))


# ---------------------------------------------------------------------------
# Cumulative VWAP
# ---------------------------------------------------------------------------

_VWAP_SQL = """
SELECT l_partkey, l_orderkey, l_linenumber,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice * l_quantity AS STRING)
                          AS DECIMAL(38,12))) OVER w AS STRING) AS DOUBLE)
       / CAST(CAST(SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(38,12)))
                   OVER w AS STRING) AS DOUBLE) AS vwap
FROM lineitem
WINDOW w AS (PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber,
                      l_extendedprice, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("win_vwap", oracle=_VWAP_SQL)
def win_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative VOLUME-WEIGHTED AVERAGE PRICE per part [PK — the
    execution-quality benchmark every trading/market system computes]:
    running Σ(price·qty)/Σ(qty) in ship order. Two DECIMAL(38,12)
    window sums share ONE frame over one sort (Catalyst evaluates
    same-window functions in a single Window operator — one partition
    sort, not two); the price·qty product of identical doubles is
    IEEE-deterministic cross-engine before the decimal cast. The
    ORDER BY tiebreaks down to the full value tuple (this fixture's
    (orderkey, linenumber) is NOT unique — observed — so a shorter
    tiebreak makes the running sums order-ambiguous). ALL FOUR cast
    boundaries are STRING-routed per functions/exact.py: both per-row
    double→decimal casts (engines quantize different expansions
    directly) AND both running-decimal→double casts (direct cast is
    not identically rounded — the round-5 rolling-skew finding). The
    quotient is emitted UNROUNDED: vwap is a ratio of SHORT-decimal
    rationals (4-dp Σpv / 2-dp Σqty), which lands on the 7th-digit
    half-grid with real probability (observed 4/60k rows at sf0.01)
    — exactly where Spark's HALF_UP-on-shortest-repr and DuckDB's
    round-on-exact-binary disagree about ROUND(x, 6). With every
    boundary string-routed the quotient is bit-identical IEEE on
    both engines, so the exact passthrough (the agg_percentile_disc
    convention) is the stronger check. Scale: per-part partitions
    sort independently — the canonical embarrassingly-parallel
    window."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (W.partitionBy("l_partkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber",
                   "l_extendedprice", "l_quantity")
          .rowsBetween(W.unboundedPreceding, 0))
    dec = "decimal(38,12)"
    pv = (F.sum((F.col("l_extendedprice") * F.col("l_quantity"))
                .cast("string").cast(dec)).over(w)
          .cast("string").cast("double"))
    qty = (F.sum(F.col("l_quantity").cast("string").cast(dec)).over(w)
           .cast("string").cast("double"))
    return li.select("l_partkey", "l_orderkey", "l_linenumber",
                     (pv / qty).alias("vwap"))


# ---------------------------------------------------------------------------
# RSI (simple-average, 14-row lookback)
# ---------------------------------------------------------------------------

_RSI_SQL = """
WITH d AS (
  SELECT user_id, event_id, ts,
         value - lag(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS diff
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
g AS (
  SELECT user_id, event_id,
         CAST(SUM(CAST(CASE WHEN diff > 0 THEN diff ELSE 0.0 END
                       AS DECIMAL(38,12))) OVER w AS DOUBLE) AS gains,
         CAST(SUM(CAST(CASE WHEN diff < 0 THEN -diff ELSE 0.0 END
                       AS DECIMAL(38,12))) OVER w AS DOUBLE) AS losses,
         COUNT(diff) OVER w AS n_diffs
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id,
       ROUND(CASE WHEN gains + losses > 0
                  THEN 100.0 * gains / (gains + losses) END, 6) AS rsi_14
FROM g WHERE n_diffs = 14 ORDER BY user_id, event_id
"""


@query("win_rsi", oracle=_RSI_SQL)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIVE STRENGTH INDEX (simple-average Cutler form) over a
    14-step lookback [PK — Wilder 1978; Cutler's SMA variant is the
    order-stable one: Wilder's own recursive EWMA depends on the
    series start, the SMA form is a pure sliding window]. RSI =
    100·gains/(gains+losses) on the last 14 deltas — algebraically
    100 − 100/(1+RS) without the RS=∞ pole; the zero-motion window
    (gains+losses = 0) yields NULL by the safe-division house rule.
    One lag window then two DECIMAL sums sharing one frame; rows
    emitted only at full lookback (n_diffs = 14) so partition heads
    don't leak partial windows. NaN/NULL values are filtered as
    missing up front (the nulls-fixture rule: an unguarded NaN diff
    meeting the DECIMAL cast faults DuckDB outright — caught by the
    adversarial fixture). Scale: per-user sort, two stacked
    Window operators over the SAME partitioning — one exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select("user_id", "event_id", "ts",
                  (F.col("value") - F.lag("value").over(ws)).alias("diff"))
    dec = "decimal(38,12)"
    diff = F.col("diff")
    # Round 12: O(n·W) sliding decimal sums → O(n) prefix differences
    # (functions/rollfast.py; exact, oracle keeps the windowed SQL).
    from ..functions.rollfast import trailing_agg
    ta = trailing_agg(
        d, ["user_id"], ["ts", "event_id"], (-13, 0),
        sums={"gd": (F.when(diff > 0, diff)
                      .otherwise(F.lit(0.0)).cast(dec)),
              "ld": (F.when(diff < 0, -diff)
                      .otherwise(F.lit(0.0)).cast(dec))},
        counts={"n_diffs": diff})
    g = ta.select("user_id", "event_id",
                  F.col("gd").cast("double").alias("gains"),
                  F.col("ld").cast("double").alias("losses"),
                  "n_diffs")
    rsi = F.when(F.col("gains") + F.col("losses") > 0,
                 100.0 * F.col("gains") / (F.col("gains") + F.col("losses")))
    return (g.filter(F.col("n_diffs") == 14)
             .select("user_id", "event_id", r6(rsi).alias("rsi_14"))
             .orderBy("user_id", "event_id"))


# ---------------------------------------------------------------------------
# Stochastic oscillator %K / %D
# ---------------------------------------------------------------------------

_STOCH_SQL = """
WITH k AS (
  SELECT user_id, event_id, ts,
         CASE WHEN MAX(value) OVER w - MIN(value) OVER w > 0
              THEN 100.0 * (value - MIN(value) OVER w)
                   / (MAX(value) OVER w - MIN(value) OVER w) END AS pct_k,
         COUNT(value) OVER w AS n_win
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, ROUND(pct_k, 6) AS pct_k,
       ROUND(CAST(SUM(CAST(pct_k AS DECIMAL(38,12)))
                  OVER d AS DOUBLE) / COUNT(pct_k) OVER d, 6) AS pct_d
FROM k WHERE n_win = 14
WINDOW d AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@query("win_stochastic_osc", oracle=_STOCH_SQL)
def win_stochastic_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STOCHASTIC OSCILLATOR %K/%D [PK — Lane 1950s]: %K locates the
    current value inside its 14-step min-max envelope (100·(v−min)/
    (max−min), NULL on a flat envelope per the safe-division rule),
    %D is the 3-step moving average of %K — the classic
    momentum/turning-point pair, and the normalized complement of
    win_rolling_envelope's absolute Donchian bands. min/max/count
    share one frame (one Window operator), the %D average runs
    DECIMAL-exact over the emitted %K doubles (identical on both
    engines since (v−min)/(max−min) is pure IEEE arithmetic of
    identical inputs). The %D window filters to full %K windows
    FIRST (n_win = 14) on both engines, so the 3-row average never
    mixes partial-lookback values. NaN/NULL filtered as missing up
    front (the nulls-fixture rule — an unguarded NaN %K meeting the
    DECIMAL cast faults DuckDB). Scale: both windows ride the same
    per-user sort — one exchange, two Window passes."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = ws.rowsBetween(-13, 0)
    v = F.col("value")
    vmin = F.min(v).over(wf)
    vmax = F.max(v).over(wf)
    pct_k = F.when(vmax - vmin > 0, 100.0 * (v - vmin) / (vmax - vmin))
    k = ev.select("user_id", "event_id", "ts", pct_k.alias("pct_k"),
                  F.count(v).over(wf).alias("n_win"))
    k = k.filter(F.col("n_win") == 14)
    wd = ws.rowsBetween(-2, 0)
    dec = "decimal(38,12)"
    pct_d = (F.sum(F.col("pct_k").cast(dec)).over(wd).cast("double")
             / F.count("pct_k").over(wd))
    return (k.select("user_id", "event_id", r6(F.col("pct_k")).alias("pct_k"),
                     r6(pct_d).alias("pct_d"))
             .orderBy("user_id", "event_id"))
