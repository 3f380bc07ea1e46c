"""Round-11 operator batch P (SURVEY.md §2 growth): Tweedie deviance,
Fieller's ratio CI, one-way ANCOVA adjusted means, rolling Sortino.

Provenance ([PK], empty reference checkout — SURVEY §0): Tweedie 1984
/ Jørgensen 1987 (compound-Poisson deviance; p=1.5 is sqrt-only —
IEEE-exact cross-engine); Fieller 1954 (ratio-of-means confidence
set); Fisher 1932-lineage one-way ANCOVA (pooled within-group slope,
adjusted means); Sortino & Price 1994 (downside-deviation ratio).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query

# ---------------------------------------------------------------------------
# Tweedie deviance (p = 1.5)
# ---------------------------------------------------------------------------

def _tw_unit_sql() -> str:
    # d(y, mu) at p = 1.5:
    #   2*( y^{0.5}/((1-p)(2-p)) - y*mu^{-0.5}/(1-p) + mu^{0.5}/(2-p) )
    # with (1-p) = -0.5, (2-p) = 0.5 — i.e.
    #   2*( -4*sqrt(y) + 2*y/sqrt(mu) + 2*sqrt(mu) )
    return ("2.0 * (-4.0 * SQRT(l.l_quantity)"
            " + 2.0 * l.l_quantity / SQRT(p.mu)"
            " + 2.0 * SQRT(p.mu))")


_TW_SQL = f"""
WITH pred AS (
  SELECT l_returnflag AS grp, {dsum_sql('l_quantity')} / COUNT(*) AS mu
  FROM lineitem GROUP BY l_returnflag),
dev AS (
  SELECT l.l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         MAX(p.mu) AS mu,
         {dsum_sql(_tw_unit_sql())} AS sdev
  FROM lineitem l JOIN pred p ON p.grp = l.l_returnflag
  GROUP BY l.l_returnflag)
SELECT grp, n, {r6_sql('mu')} AS mu_hat,
       {r6_sql('sdev / n')} AS mean_tweedie_deviance
FROM dev ORDER BY grp
"""


@query("ml_tweedie_deviance", oracle=_TW_SQL)
def ml_tweedie_deviance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN TWEEDIE DEVIANCE, power p = 1.5 [PK — Tweedie 1984 /
    Jørgensen 1987; the compound-Poisson loss insurance and demand
    models train on]: per return flag, score the constant-mean
    prediction μ̂_g against quantities with the unit deviance
    d(y,μ) = 2(y^{2−p}/((1−p)(2−p)) − y·μ^{1−p}/(1−p) + μ^{2−p}/(2−p))
    — at p=1.5 every fractional power is a SQRT, which is
    correctly-rounded IEEE on both engines, so the deviance is
    bit-exact cross-engine with NO transcendental pinning (the reason
    this power was chosen over p=1.3).  Extends the regression-metric
    family (ml_regression_metrics = squared error ≡ p=0,
    ml_pinball_loss = quantiles) toward skewed nonnegative targets.
    Deviances run through DECIMAL(38,12).  Scale: one aggregate for
    the prediction, one broadcast join + aggregate for the score."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = (li.groupBy(F.col("l_returnflag").alias("grp"))
              .agg((dsum("l_quantity") / F.count(F.lit(1)))
                   .alias("mu")))
    y = F.col("l_quantity")
    mu = F.col("mu")
    unit = 2.0 * (-4.0 * F.sqrt(y) + 2.0 * y / F.sqrt(mu)
                  + 2.0 * F.sqrt(mu))
    dev = (li.join(F.broadcast(pred),
                   li["l_returnflag"] == pred["grp"])
             .groupBy("grp")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.max("mu").alias("mu"),
                  dsum(unit).alias("sdev")))
    return (dev.select("grp", "n", r6(F.col("mu")).alias("mu_hat"),
                       r6(F.col("sdev") / F.col("n"))
                       .alias("mean_tweedie_deviance"))
               .orderBy("grp"))


# ---------------------------------------------------------------------------
# Fieller ratio-of-means confidence interval
# ---------------------------------------------------------------------------

_FIELLER_Z = 1.96
_ZD = f"CAST({_FIELLER_Z!r} AS DOUBLE)"

_FIELLER_SQL = f"""
WITH s AS (
  SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('l_extendedprice')} AS sy,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_extendedprice * l_extendedprice')} AS syy,
         {dsum_sql('l_quantity * l_quantity')} AS sxx,
         {dsum_sql('l_extendedprice * l_quantity')} AS sxy
  FROM lineitem GROUP BY l_returnflag),
m AS (
  SELECT grp, n, sy / n AS my, sx / n AS mx,
         (syy - sy * sy / n) / (n - 1) / n AS vy,
         (sxx - sx * sx / n) / (n - 1) / n AS vx,
         (sxy - sx * sy / n) / (n - 1) / n AS cxy
  FROM s),
f AS (
  SELECT grp, n, my / mx AS ratio,
         1.0 - {_ZD} * {_ZD} * vx / (mx * mx) AS g,
         my, mx, vy, vx, cxy
  FROM m)
SELECT grp, n, {r6_sql('ratio')} AS ratio, {r6_sql('g')} AS g,
  {r6_sql(f'(ratio - {_ZD} * {_ZD} * cxy'
          f' / (mx * mx) - ({_ZD} / (mx * mx))'
          ' * SQRT(vy * mx * mx - 2.0 * ratio * cxy * mx * mx'
          ' + ratio * ratio * vx * mx * mx'
          f' - {_ZD} * {_ZD}'
          ' * (vy * vx - cxy * cxy))) / g')} AS lo95,
  {r6_sql(f'(ratio - {_ZD} * {_ZD} * cxy'
          f' / (mx * mx) + ({_ZD} / (mx * mx))'
          ' * SQRT(vy * mx * mx - 2.0 * ratio * cxy * mx * mx'
          ' + ratio * ratio * vx * mx * mx'
          f' - {_ZD} * {_ZD}'
          ' * (vy * vx - cxy * cxy))) / g')} AS hi95
FROM f ORDER BY grp
"""


@query("agg_fieller_ratio_ci", oracle=_FIELLER_SQL)
def agg_fieller_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIELLER'S RATIO-OF-MEANS CONFIDENCE INTERVAL [PK — Fieller
    1954]: the EXACT confidence set for E[price]/E[qty] per return
    flag — unlike agg_ratio_delta_method's symmetric first-order
    interval, Fieller inverts the t-test on y − θx, stays valid when
    the denominator mean is noisy (g → 1 flags an unbounded set), and
    is asymmetric exactly when it should be.  Bounds:
    (θ̂ − z²c/m_x² ± (z/m_x²)·sqrt(...)) / g with g = 1 − z²v_x/m_x²,
    all from seven DECIMAL-exact sums and IEEE sqrt — no
    transcendental drift.  Scale: one map-side-combined aggregate per
    group."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("l_extendedprice").alias("sy"),
        dsum("l_quantity").alias("sx"),
        dsum(F.col("l_extendedprice") * F.col("l_extendedprice"))
         .alias("syy"),
        dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        dsum(F.col("l_extendedprice") * F.col("l_quantity"))
         .alias("sxy"))
    n = F.col("n")
    my = F.col("sy") / n
    mx = F.col("sx") / n
    vy = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1) / n
    vx = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1) / n
    cxy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1) / n
    m = s.select("grp", "n", my.alias("my"), mx.alias("mx"),
                 vy.alias("vy"), vx.alias("vx"), cxy.alias("cxy"))
    z = _FIELLER_Z
    ratio = F.col("my") / F.col("mx")
    g = 1.0 - z * z * F.col("vx") / (F.col("mx") * F.col("mx"))
    mx2 = F.col("mx") * F.col("mx")
    disc = F.sqrt(F.col("vy") * mx2
                  - 2.0 * ratio * F.col("cxy") * mx2
                  + ratio * ratio * F.col("vx") * mx2
                  - z * z * (F.col("vy") * F.col("vx")
                             - F.col("cxy") * F.col("cxy")))
    center = ratio - z * z * F.col("cxy") / mx2
    return (m.select("grp", "n", r6(ratio).alias("ratio"),
                     r6(g).alias("g"),
                     r6((center - (z / mx2) * disc) / g).alias("lo95"),
                     r6((center + (z / mx2) * disc) / g).alias("hi95"))
             .orderBy("grp"))


# ---------------------------------------------------------------------------
# One-way ANCOVA adjusted means
# ---------------------------------------------------------------------------

_ANCOVA_SQL = f"""
WITH base AS (
  SELECT o_orderpriority AS grp, c.c_acctbal AS x, o.o_totalprice AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * x')} AS sxx, {dsum_sql('x * y')} AS sxy
  FROM base GROUP BY grp),
w AS (
  SELECT {dsum_sql('sxy - sx * sy / n')} AS wxy,
         {dsum_sql('sxx - sx * sx / n')} AS wxx,
         CAST(SUM(n) AS BIGINT) AS nt,
         {dsum_sql('sx')} AS sxt
  FROM g),
bw AS (SELECT wxy / wxx AS b, nt, sxt / nt AS xbar FROM w)
SELECT g.grp, g.n, {r6_sql('g.sy / g.n')} AS raw_mean,
       {r6_sql('bw.b')} AS common_slope,
       {r6_sql('g.sy / g.n - bw.b * (g.sx / g.n - bw.xbar)')}
         AS adjusted_mean
FROM g, bw ORDER BY g.grp
"""


@query("stat_ancova_adjusted_means", oracle=_ANCOVA_SQL)
def stat_ancova_adjusted_means(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """ONE-WAY ANCOVA ADJUSTED MEANS [PK — Fisher-lineage analysis of
    covariance]: compare order revenue across priorities AFTER
    removing the customer-wealth covariate — the pooled WITHIN-group
    slope b_w = ΣSxy_g/ΣSxx_g (immune to between-group confounding,
    the whole point vs a naive global regression) shifts each group
    mean to the common covariate value: ȳ_g − b_w(x̄_g − x̄).  What
    stat_anova_oneway's raw means cannot say: is priority P1 really
    richer, or do richer customers just pick P1?  All moments are
    DECIMAL-exact partial sums; the within-group corrected sums are
    DECIMAL-summed ACROSS groups too (group-domain-bounded).  Scale:
    one join (orders→customer, key-partitioned), two aggregates."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = (o.join(c, o["o_custkey"] == c["c_custkey"])
             .select(F.col("o_orderpriority").alias("grp"),
                     F.col("c_acctbal").alias("x"),
                     F.col("o_totalprice").alias("y")))
    g = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("x").alias("sx"), dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"))
    g = g.cache()
    w = g.agg(
        dsum(F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
         .alias("wxy"),
        dsum(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
         .alias("wxx"),
        F.sum("n").cast("long").alias("nt"),
        dsum("sx").alias("sxt"))
    bw = w.select((F.col("wxy") / F.col("wxx")).alias("b"),
                  (F.col("sxt") / F.col("nt")).alias("xbar"))
    return (g.crossJoin(F.broadcast(bw))
             .select("grp", "n",
                     r6(F.col("sy") / F.col("n")).alias("raw_mean"),
                     r6(F.col("b")).alias("common_slope"),
                     r6(F.col("sy") / F.col("n")
                        - F.col("b") * (F.col("sx") / F.col("n")
                                        - F.col("xbar")))
                     .alias("adjusted_mean"))
             .orderBy("grp"))


# ---------------------------------------------------------------------------
# Rolling Sortino ratio
# ---------------------------------------------------------------------------

_SORT_N = 20

_SORT_SQL = f"""
WITH r AS (
  SELECT user_id, event_id, ts,
         value - LAG(value) OVER w AS ret
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id,
         CAST(SUM(CAST(ret AS DECIMAL(38,12))) OVER f AS DOUBLE)
           / {_SORT_N} AS mean_ret,
         CAST(SUM(CAST(CASE WHEN ret < 0 THEN ret * ret ELSE 0.0 END
                       AS DECIMAL(38,12))) OVER f AS DOUBLE)
           / {_SORT_N} AS dvar,
         COUNT(ret) OVER f AS nf
  FROM r WHERE ret IS NOT NULL
  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_SORT_N - 1} PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, {r6_sql('mean_ret')} AS mean_ret,
       {r6_sql('SQRT(dvar)')} AS downside_dev,
       CASE WHEN dvar > 0
            THEN {r6_sql('mean_ret / SQRT(dvar)')} END AS sortino
FROM s WHERE nf = {_SORT_N}
ORDER BY user_id, event_id
"""


@query("win_rolling_sortino", oracle=_SORT_SQL)
def win_rolling_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING SORTINO RATIO [PK — Sortino & Price 1994]: mean return
    over DOWNSIDE deviation (root-mean-square of negative returns
    only, target 0) in a 20-step window per user — the risk-adjusted
    score that, unlike win_rolling_sharpe, does not punish upside
    volatility; the pair quantifies skew preference.  Zero-downside
    windows yield NULL by the safe-division rule (a window with no
    losses has no downside risk to normalize by).  Both window sums
    run through DECIMAL inside ONE frame over one exchange
    (win_rsi precedent); rows emit at full lookback only.  Scale:
    per-user sort, two stacked windows, one exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select("user_id", "event_id", "ts",
                  (F.col("value") - F.lag("value").over(ws))
                  .alias("ret"))
    dec = "decimal(38,12)"
    # Round 12: O(n·W) sliding decimal sums → O(n) prefix differences
    # (functions/rollfast.py; exact, oracle keeps the windowed SQL).
    from ..functions.rollfast import trailing_agg
    ret = F.col("ret")
    ta = trailing_agg(
        r.filter(ret.isNotNull()),
        ["user_id"], ["ts", "event_id"], (-(_SORT_N - 1), 0),
        sums={"srd": ret.cast(dec),
              "dvd": (F.when(ret < 0, ret * ret)
                       .otherwise(F.lit(0.0)).cast(dec))},
        counts={"nf": ret})
    s = ta.select("user_id", "event_id",
                  (F.col("srd").cast("double") / _SORT_N)
                  .alias("mean_ret"),
                  (F.col("dvd").cast("double") / _SORT_N).alias("dvar"),
                  "nf")
    return (s.filter(F.col("nf") == _SORT_N)
             .select("user_id", "event_id",
                     r6(F.col("mean_ret")).alias("mean_ret"),
                     r6(F.sqrt("dvar")).alias("downside_dev"),
                     F.when(F.col("dvar") > 0,
                            r6(F.col("mean_ret") / F.sqrt("dvar")))
                      .alias("sortino"))
             .orderBy("user_id", "event_id"))
