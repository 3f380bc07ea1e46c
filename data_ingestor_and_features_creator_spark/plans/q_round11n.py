"""Round-11 operator batch N (SURVEY.md §2 growth): regression
diagnostics (Breusch-Pagan, Chow), ordinal agreement (weighted
kappa), and closed-form jackknife variance for ratio estimators.

Provenance ([PK], empty reference checkout — SURVEY §0): Breusch &
Pagan 1979 (LM het-test, Koenker's studentized form); Chow 1960
(structural-break F); Cohen 1968 (weighted kappa, quadratic weights);
Quenouille 1956 / Tukey 1958 (delete-1 jackknife; the ratio-estimator
closed form).

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
# Breusch-Pagan (Koenker) heteroskedasticity test
# ---------------------------------------------------------------------------

# Regression fixture: y = customer total spend, x = account balance
# (the global version of causal_rdd_local_linear's local fit).
_BP_BASE_SQL = f"""
spend AS (
  SELECT c.c_custkey, c.c_acctbal AS x, COALESCE(o.tot, 0.0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, {dsum_sql('o_totalprice')} AS tot
             FROM orders GROUP BY o_custkey) o
    ON o.o_custkey = c.c_custkey),
ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * x')} AS sxx, {dsum_sql('x * y')} AS sxy
  FROM spend),
fit AS (
  SELECT n, sx, sxx,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS a
  FROM ols),
resid AS (
  SELECT s.x, s.y - (fit.a + fit.b * s.x) AS e
  FROM spend s, fit)
"""

_BP_SQL = f"""
WITH {_BP_BASE_SQL.strip()},
aux AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('x')} AS sx,
         {dsum_sql('(e / 1000.0) * (e / 1000.0)')} AS su,
         {dsum_sql('x * x')} AS sxx,
         {dsum_sql('x * (e / 1000.0) * (e / 1000.0)')} AS sxu,
         {dsum_sql('(e / 1000.0) * (e / 1000.0)'
                   ' * (e / 1000.0) * (e / 1000.0)')} AS suu
  FROM resid),
stat AS (
  SELECT n,
         ((n * sxu - sx * su) * (n * sxu - sx * su))
           / ((n * sxx - sx * sx) * (n * suu - su * su)) AS r2
  FROM aux)
SELECT n, {r6_sql('r2')} AS aux_r2, {r6_sql('n * r2')} AS bp_lm
FROM stat
"""


@query("stat_breusch_pagan", oracle=_BP_SQL)
def stat_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BREUSCH-PAGAN HETEROSKEDASTICITY TEST, Koenker's studentized
    form [PK — Breusch & Pagan 1979; Koenker 1981]: after fitting
    spend ~ acctbal by closed-form OLS, regress the SQUARED (1000-scaled — R² is scale-invariant,
    the DECIMAL path is not overflow-proof at e⁴) residuals
    on the regressor; LM = n·R² of that auxiliary regression ~ χ²₁
    under homoskedasticity — the standard 'can I trust these OLS
    standard errors?' diagnostic that complements agg_ols_multivariate
    / agg_regression_trend (they give the fit, this audits its error
    model).  The auxiliary R² for a single regressor is the squared
    Pearson correlation, assembled from six DECIMAL-exact sums in one
    identical double expression — no second pass over residuals
    beyond one aggregate.  Scale: two scan aggregates + a broadcast
    scalar join."""
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .groupBy("o_custkey").agg(dsum("o_totalprice").alias("tot")))
    spend = (c.join(o, c["c_custkey"] == o["o_custkey"], "left")
              .select(F.col("c_acctbal").alias("x"),
                      F.coalesce(F.col("tot"), F.lit(0.0)).alias("y")))
    spend = spend.cache()
    ols = spend.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    dsum("x").alias("sx"), dsum("y").alias("sy"),
                    dsum(F.col("x") * F.col("x")).alias("sxx"),
                    dsum(F.col("x") * F.col("y")).alias("sxy"))
    b = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    a = (F.col("sy") - b * F.col("sx")) / F.col("n")
    fit = ols.select("n", b.alias("b"), a.alias("a"))
    resid = (spend.crossJoin(F.broadcast(fit))
                  .select("x", (F.col("y")
                                - (F.col("a") + F.col("b")
                                   * F.col("x"))).alias("e")))
    # R² is invariant to scaling the squared residual, so u = (e/1000)²
    # keeps u² inside DECIMAL(38,12)'s 26 integer digits (raw e⁴ of a
    # ~1e6 spend residual overflows it) — both engines scale the same.
    u = (F.col("e") / 1000.0) * (F.col("e") / 1000.0)
    aux = resid.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    dsum("x").alias("sx"), dsum(u).alias("su"),
                    dsum(F.col("x") * F.col("x")).alias("sxx"),
                    dsum(F.col("x") * u).alias("sxu"),
                    dsum(u * u).alias("suu"))
    num = (F.col("n") * F.col("sxu") - F.col("sx") * F.col("su"))
    r2 = (num * num
          / ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
             * (F.col("n") * F.col("suu") - F.col("su") * F.col("su"))))
    return aux.select("n", r6(r2).alias("aux_r2"),
                      r6(F.col("n") * r2).alias("bp_lm"))


# ---------------------------------------------------------------------------
# Chow structural-break test
# ---------------------------------------------------------------------------

_CHOW_BREAK = "DATE '2024-01-16'"

_CHOW_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS y
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
idx AS (
  SELECT event_type, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
              AS DOUBLE) AS t,
         CASE WHEN d < {_CHOW_BREAK} THEN 0 ELSE 1 END AS seg
  FROM daily),
s AS (
  SELECT event_type, seg, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('t')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('t * t')} AS sxx, {dsum_sql('t * y')} AS sxy,
         {dsum_sql('y * y')} AS syy
  FROM idx GROUP BY event_type, seg),
ssr AS (
  SELECT event_type, seg, n,
         syy - sy * sy / n
           - ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / (n * (n * sxx - sx * sx)) AS rss
  FROM s),
pooled AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('t')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('t * t')} AS sxx, {dsum_sql('t * y')} AS sxy,
         {dsum_sql('y * y')} AS syy
  FROM idx GROUP BY event_type),
prss AS (
  SELECT event_type, n,
         syy - sy * sy / n
           - ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / (n * (n * sxx - sx * sx)) AS rss_p
  FROM pooled),
split_ AS (
  SELECT event_type,
         {dsum_sql('rss')} AS rss_12,
         CAST(SUM(n) AS BIGINT) AS n
  FROM ssr GROUP BY event_type)
SELECT p.event_type, s.n,
       {r6_sql('p.rss_p')} AS rss_pooled,
       {r6_sql('s.rss_12')} AS rss_split,
       {r6_sql('((p.rss_p - s.rss_12) / 2.0)'
               ' / (s.rss_12 / (s.n - 4))')} AS chow_f
FROM prss p JOIN split_ s USING (event_type)
ORDER BY p.event_type
"""


@query("stat_chow_test", oracle=_CHOW_SQL)
def stat_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHOW STRUCTURAL-BREAK TEST [PK — Chow 1960]: does the linear
    trend of each event type's daily series CHANGE at a known break
    date (mid-month)?  F = ((RSS_pooled − RSS₁ − RSS₂)/k) /
    ((RSS₁+RSS₂)/(n−2k)) with k=2 (intercept+slope) — the
    known-breakpoint regression complement to stat_changepoint_pettitt
    (which SEARCHES for an unknown break in levels; Chow TESTS a
    hypothesized break in a trend).  Every RSS comes from the
    closed-form OLS identity RSS = Syy − S²y/n − (nSxy−SxSy)²/(n(nSxx
    −Sx²)) over DECIMAL-exact sums — one aggregate per segment, one
    pooled, no residual materialization.  Scale: facts collapse to
    (type, day); three hash aggregates."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("y")))
    wt = W.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type", "y",
        F.row_number().over(wt).cast("double").alias("t"),
        F.when(F.col("d") < F.lit("2024-01-16").cast("date"), 0)
         .otherwise(1).alias("seg"))
    idx = idx.cache()

    def _rss(df: DataFrame, keys: list) -> DataFrame:
        s = df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            dsum("t").alias("sx"), dsum("y").alias("sy"),
            dsum(F.col("t") * F.col("t")).alias("sxx"),
            dsum(F.col("t") * F.col("y")).alias("sxy"),
            dsum(F.col("y") * F.col("y")).alias("syy"))
        num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        rss = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
               - num * num
               / (F.col("n")
                  * (F.col("n") * F.col("sxx")
                     - F.col("sx") * F.col("sx"))))
        return s.select(*keys, F.col("n").alias("n"), rss.alias("rss"))

    seg_rss = _rss(idx, ["event_type", "seg"])
    split = seg_rss.groupBy("event_type").agg(
        dsum("rss").alias("rss_12"),
        F.sum("n").cast("long").alias("n"))
    pooled = (_rss(idx, ["event_type"])
              .select("event_type", F.col("rss").alias("rss_p")))
    f = (((F.col("rss_p") - F.col("rss_12")) / 2.0)
         / (F.col("rss_12") / (F.col("n") - 4)))
    return (pooled.join(split, "event_type")
                  .select("event_type", "n",
                          r6(F.col("rss_p")).alias("rss_pooled"),
                          r6(F.col("rss_12")).alias("rss_split"),
                          r6(f).alias("chow_f"))
                  .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Quadratic-weighted Cohen's kappa
# ---------------------------------------------------------------------------

_WK_SQL = f"""
WITH pair AS (
  SELECT l_orderkey AS item,
         MAX(CASE WHEN rn = 1 THEN cat END) AS c1,
         MAX(CASE WHEN rn = 2 THEN cat END) AS c2
  FROM (SELECT l_orderkey, l_returnflag AS cat,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_partkey,
                                           l_suppkey, l_extendedprice,
                                           l_returnflag) AS rn
        FROM lineitem)
  WHERE rn <= 2 GROUP BY l_orderkey HAVING COUNT(*) = 2),
cmap AS (
  SELECT cat, ROW_NUMBER() OVER (ORDER BY cat) - 1 AS ci
  FROM (SELECT DISTINCT c1 AS cat FROM pair
        UNION SELECT DISTINCT c2 FROM pair)),
coded AS (
  SELECT m1.ci AS i, m2.ci AS j
  FROM pair JOIN cmap m1 ON m1.cat = pair.c1
  JOIN cmap m2 ON m2.cat = pair.c2),
kk AS (SELECT CAST(MAX(ci) AS BIGINT) + 1 AS k FROM cmap),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM coded),
obs AS (
  SELECT {dsum_sql('CAST((i - j) * (i - j) AS DOUBLE)'
                   ' / ((kk.k - 1.0) * (kk.k - 1.0))')}
           / MAX(nn.n) AS d_o
  FROM coded, kk, nn),
m1 AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS a FROM coded GROUP BY i),
m2 AS (SELECT j, CAST(COUNT(*) AS BIGINT) AS b FROM coded GROUP BY j),
exp_ AS (
  SELECT {dsum_sql('(CAST(m1.a AS DOUBLE) * m2.b)'
                   ' * CAST((m1.i - m2.j) * (m1.i - m2.j) AS DOUBLE)'
                   ' / ((kk.k - 1.0) * (kk.k - 1.0))')}
           / (MAX(CAST(nn.n AS DOUBLE)) * MAX(nn.n)) AS d_e
  FROM m1, m2, kk, nn)
SELECT nn.n, kk.k, {r6_sql('obs.d_o')} AS d_o,
       {r6_sql('exp_.d_e')} AS d_e,
       {r6_sql('1.0 - obs.d_o / exp_.d_e')} AS kappa_w
FROM obs, exp_, nn, kk
"""


@query("ml_weighted_kappa", oracle=_WK_SQL)
def ml_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUADRATIC-WEIGHTED COHEN'S KAPPA [PK — Cohen 1968]: two-rater
    agreement where disagreement cost grows with the squared ORDINAL
    distance between categories, κ_w = 1 − Σw_ij O_ij / Σw_ij E_ij
    with w_ij = (i−j)²/(k−1)² — the standard metric for ordinal
    labels (severity grades, star ratings) where plain
    ml_cohen_kappa's all-or-nothing disagreement is wrong.  Raters =
    the first TWO lineitems of each multi-line order under the
    deterministic panel key (ml_fleiss_kappa precedent); categories =
    return flags in lexicographic ordinal order.  O from the coded
    pairs directly, E from the two marginals' cross product
    (category-domain-bounded, exact integer counts; weights are small
    integer ratios).  Scale: one bounded window + category-bounded
    joins."""
    li = load_table(spark, sf_dir, "lineitem")
    wv = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_returnflag")
    votes = (li.select(F.col("l_orderkey").alias("item"),
                       F.col("l_returnflag").alias("cat"),
                       F.row_number().over(wv).alias("rn"))
               .filter(F.col("rn") <= 2))
    # Cached (round-11 optimization): pair feeds the category map
    # (c1/c2 branches), the coded join, AND kk's lineage — uncached,
    # the per-order rank window over the full lineitem scan executed
    # ~5× (once per branch; measured 3.6 s → 2.4 s warm at sf0.1).
    # One row per multi-line order — order-domain-bounded.
    pair = (votes.groupBy("item")
                 .agg(F.max(F.when(F.col("rn") == 1, F.col("cat")))
                       .alias("c1"),
                      F.max(F.when(F.col("rn") == 2, F.col("cat")))
                       .alias("c2"),
                      F.count(F.lit(1)).alias("nv"))
                 .filter(F.col("nv") == 2)).cache()
    cats = (pair.select(F.col("c1").alias("cat"))
                .union(pair.select("c2")).distinct())
    cmap = cats.withColumn(
        "ci", F.row_number().over(W.orderBy("cat")) - 1)
    coded = (pair.join(F.broadcast(cmap.withColumnRenamed("cat", "c1")
                                       .withColumnRenamed("ci", "i")),
                       "c1")
                 .join(F.broadcast(cmap.withColumnRenamed("cat", "c2")
                                       .withColumnRenamed("ci", "j")),
                       "c2")
                 .select("i", "j"))
    coded = coded.cache()
    kk = cmap.agg((F.max("ci").cast("long") + 1).alias("k"))
    nn = coded.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (((F.col("i") - F.col("j")) * (F.col("i") - F.col("j")))
         .cast("double")
         / ((F.col("k") - 1.0) * (F.col("k") - 1.0)))
    obs = (coded.crossJoin(F.broadcast(kk)).crossJoin(F.broadcast(nn))
                .agg((dsum(w) / F.max("n")).alias("d_o")))
    m1 = coded.groupBy("i").agg(F.count(F.lit(1)).cast("long")
                                 .alias("a"))
    m2 = coded.groupBy("j").agg(F.count(F.lit(1)).cast("long")
                                 .alias("b"))
    we = ((F.col("a").cast("double") * F.col("b"))
          * ((F.col("i") - F.col("j")) * (F.col("i") - F.col("j")))
            .cast("double")
          / ((F.col("k") - 1.0) * (F.col("k") - 1.0)))
    exp_ = (m1.crossJoin(m2).crossJoin(F.broadcast(kk))
              .crossJoin(F.broadcast(nn))
              .agg((dsum(we)
                    / (F.max(F.col("n").cast("double")) * F.max("n")))
                   .alias("d_e")))
    return (obs.crossJoin(F.broadcast(exp_))
               .crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(kk))
               .select("n", "k", r6(F.col("d_o")).alias("d_o"),
                       r6(F.col("d_e")).alias("d_e"),
                       r6(1.0 - F.col("d_o") / F.col("d_e"))
                       .alias("kappa_w")))


# ---------------------------------------------------------------------------
# Jackknife variance of the ratio estimator
# ---------------------------------------------------------------------------

_JACK_SQL = f"""
WITH base AS (
  SELECT l_returnflag AS grp, l_extendedprice AS y, l_quantity AS x
  FROM lineitem),
tot AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('y')} AS sy, {dsum_sql('x')} AS sx
  FROM base GROUP BY grp),
leave1 AS (
  SELECT b.grp, t.n,
         (t.sy - b.y) / (t.sx - b.x) AS theta_i
  FROM base b JOIN tot t USING (grp)),
jm AS (
  SELECT grp, MAX(n) AS n, {dsum_sql('theta_i')} / MAX(n) AS tbar
  FROM leave1 GROUP BY grp),
jv AS (
  SELECT l.grp, jm.n,
         {dsum_sql('(l.theta_i - jm.tbar) * (l.theta_i - jm.tbar)')}
           * (jm.n - 1.0) / jm.n AS var_jack
  FROM leave1 l JOIN jm USING (grp)
  GROUP BY l.grp, jm.n)
SELECT t.grp, CAST(t.n AS BIGINT) AS n,
       {r6_sql('t.sy / t.sx')} AS ratio,
       {r6_sql('jv.var_jack')} AS var_jack,
       {r6_sql('SQRT(jv.var_jack)')} AS se_jack
FROM tot t JOIN jv ON jv.grp = t.grp
ORDER BY t.grp
"""


@query("agg_jackknife_ratio_variance", oracle=_JACK_SQL)
def agg_jackknife_ratio_variance(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """DELETE-1 JACKKNIFE VARIANCE OF THE RATIO ESTIMATOR [PK —
    Quenouille 1956 / Tukey 1958]: the price-per-unit ratio
    θ = Σprice/Σqty per return flag, with its jackknife variance
    computed in CLOSED FORM — each leave-one-out replicate is
    θ_(i) = (Sy−y_i)/(Sx−x_i) from the group totals, so the 'n
    refits' collapse to one broadcast join + one aggregate (no
    resampling loop): Var = (n−1)/n · Σ(θ_(i) − θ̄)².  The
    deterministic complement to stat_bootstrap_ci_hash for the
    smooth-statistic case — a ratio's nonlinearity makes naive
    var(y)/Σx² wrong, and the jackknife is the classical fix.  Totals
    and replicate moments run through DECIMAL(38,12); θ_(i) is
    identical double algebra per row.  Scale: one aggregate, one
    broadcast join back over the scan, one final aggregate — all
    map-side-combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(F.col("l_returnflag").alias("grp"),
                     F.col("l_extendedprice").alias("y"),
                     F.col("l_quantity").alias("x"))
    tot = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("y").alias("sy"), dsum("x").alias("sx"))
    leave1 = (base.join(F.broadcast(tot), "grp")
                  .select("grp", "n",
                          ((F.col("sy") - F.col("y"))
                           / (F.col("sx") - F.col("x")))
                          .alias("theta_i")))
    jm = leave1.groupBy("grp").agg(
        F.max("n").alias("n"),
        (dsum("theta_i") / F.max("n")).alias("tbar"))
    jv = (leave1.drop("n").join(F.broadcast(jm), "grp")
                .groupBy("grp", "n")
                .agg((dsum((F.col("theta_i") - F.col("tbar"))
                           * (F.col("theta_i") - F.col("tbar")))
                      * (F.col("n") - 1.0) / F.col("n"))
                     .alias("var_jack")))
    return (tot.join(jv.select("grp", "var_jack"), "grp")
               .select("grp", F.col("n").cast("long").alias("n"),
                       r6(F.col("sy") / F.col("sx")).alias("ratio"),
                       r6(F.col("var_jack")).alias("var_jack"),
                       r6(F.sqrt("var_jack")).alias("se_jack"))
               .orderBy("grp"))
