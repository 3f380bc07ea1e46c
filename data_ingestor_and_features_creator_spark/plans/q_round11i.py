"""Round-11 operator batch I (SURVEY.md §2 growth): ordered-alternative
and scale rank tests plus extreme-value tail estimators.

- stat_jonckheere_terpstra — ordered-alternative trend across
  INDEPENDENT groups (the unblocked sibling of Page's L).
- stat_fligner_killeen — rank-based scale homogeneity via normal
  scores (completes the Levene / Ansari-Bradley dispersion family).
- agg_hill_tail_index — Hill estimator of the Pareto tail exponent.
- agg_gpd_pot_moments — peaks-over-threshold GPD fit by method of
  moments (the threshold-excess companion to agg_gumbel_block_maxima).

Provenance ([PK], empty reference checkout — SURVEY §0): Jonckheere
1954 / Terpstra 1952; Fligner & Killeen 1976 (normal-scores variant per
Conover, Johnson & Johnson 1981); Hill 1975; Hosking & Wallis 1987
(GPD method-of-moments); Acklam 2003 (rational inverse-normal-CDF
approximation, relative error < 1.15e-9).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query

# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative test
# ---------------------------------------------------------------------------

_JT_SQL = f"""
WITH um AS (
  SELECT user_id, event_type,
         {dsum_sql('value')} / COUNT(value) AS mv
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id, event_type),
gmap AS (
  SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) AS g
  FROM (SELECT DISTINCT event_type FROM um)),
cells AS (
  SELECT um.mv, gmap.g, CAST(COUNT(*) AS BIGINT) AS c
  FROM um JOIN gmap USING (event_type) GROUP BY um.mv, gmap.g),
p AS (
  SELECT mv, g, c,
         COALESCE(SUM(c) OVER (PARTITION BY mv ORDER BY g
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS pg
  FROM cells),
merged AS (
  SELECT mv, g AS part, 0 AS tag, c AS cd,
         CAST(NULL AS DOUBLE) AS qmv, CAST(NULL AS BIGINT) AS qg,
         CAST(NULL AS BIGINT) AS qc
  FROM cells
  UNION ALL
  SELECT cells.mv, gm.g AS part, 1 AS tag, CAST(0 AS BIGINT) AS cd,
         cells.mv AS qmv, cells.g AS qg, cells.c AS qc
  FROM cells JOIN gmap gm ON gm.g < cells.g),
cum AS (
  SELECT part, tag, qmv, qg, qc,
         COALESCE(SUM(cd) OVER (PARTITION BY part
                                ORDER BY mv, tag DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW), 0) AS below
  FROM merged),
l AS (
  SELECT qmv AS mv, qg AS g, MAX(qc) AS c,
         CAST(SUM(below) AS BIGINT) AS lg
  FROM cum WHERE tag = 1 GROUP BY qmv, qg),
agg AS (
  SELECT (SELECT COALESCE(CAST(SUM(c * lg) AS BIGINT), 0) FROM l)
           AS j2,
         (SELECT COALESCE(CAST(SUM(c * pg) AS BIGINT), 0) FROM p)
           AS jt,
         (SELECT CAST(SUM(c) AS BIGINT) FROM cells) AS n),
gs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ni * ni) AS BIGINT) AS sq2,
         CAST(SUM(CAST(ni AS BIGINT) * ni * (2 * ni + 3)) AS BIGINT) AS sq3
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS ni FROM um
        GROUP BY event_type))
SELECT n, k,
  {r6_sql('CAST(j2 AS DOUBLE) + 0.5 * CAST(jt AS DOUBLE)')} AS j_stat,
  {r6_sql('(CAST(j2 AS DOUBLE) + 0.5 * CAST(jt AS DOUBLE)'
          ' - (CAST(n AS DOUBLE) * n - sq2) / 4.0)'
          ' / SQRT((CAST(n AS DOUBLE) * n * (2 * n + 3) - sq3) / 72.0)')}
    AS z
FROM agg, gs
"""


@query("stat_jonckheere_terpstra", oracle=_JT_SQL)
def stat_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JONCKHEERE-TERPSTRA ORDERED-ALTERNATIVE TEST [PK — Jonckheere
    1954 / Terpstra 1952]: does the per-user mean event value trend
    monotonically across event types in their FIXED lexicographic
    order?  J = Σ_{i<j} U_ij over all ordered group pairs — strictly
    more powerful than Kruskal-Wallis against monotone shifts, and the
    INDEPENDENT-groups sibling of stat_page_trend_test (which needs
    complete blocks).  Instead of the textbook pairwise Mann-Whitney
    sweep (quadratic in groups AND samples), the plan aggregates to
    distinct (value, group) CELLS and reads J off two windows: the
    ties term pg = within-value prefix count over earlier groups, and
    the strict term lg = Σ_{g'<g} cnt_{g'}(< v) via a merged
    data/query dominance pass — every cell is replicated as a QUERY
    row into each EARLIER group's partition, one per-group cumulative
    (ordered value with queries-first-at-ties, so equal values never
    leak into the strict count) reads the below-count at the query
    row, and the replica sum is lg.
    J = Σ c·lg + ½·Σ c·pg, all exact BIGINT until the final ½.  The z
    uses the tie-less null moments E[J] = (n² − Σn_i²)/4 and
    Var[J] = (n²(2n+3) − Σn_i²(2n_i+3))/72 — exact integer algebra
    under one sqrt.  Scale: fact volume collapses at the first
    aggregate; the windows run over distinct cells partitioned by
    value / by group (k groups bound the pg frame)."""
    ev = load_table(spark, sf_dir, "events")
    um = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .groupBy("user_id", "event_type")
            .agg((dsum("value") / F.count("value")).alias("mv")))
    gmap = (um.select("event_type").distinct()
              .withColumn("g", F.row_number()
                          .over(W.orderBy("event_type"))))
    cells = (um.join(F.broadcast(gmap), "event_type")
               .groupBy("mv", "g")
               .agg(F.count(F.lit(1)).cast("long").alias("c")))
    cells = cells.cache()
    wp = (W.partitionBy("mv").orderBy("g")
           .rowsBetween(W.unboundedPreceding, -1))
    p = cells.withColumn(
        "pg", F.coalesce(F.sum("c").over(wp), F.lit(0).cast("long")))
    # Strict part: a 2-D dominance sum.  Merge DATA rows (each cell in
    # its own group's partition) with QUERY replicas (each cell
    # replicated into every EARLIER group's partition); one per-group
    # cumulative ordered (value, queries-first-at-ties) then reads
    # "count strictly below v in group g'" at each query row, and the
    # per-(cell) sum over its replicas is lg = Σ_{g'<g} cnt_{g'}(<v).
    data = cells.select(
        "mv", F.col("g").alias("part"), F.lit(0).alias("tag"),
        F.col("c").alias("cd"),
        F.lit(None).cast("double").alias("qmv"),
        F.lit(None).cast("long").alias("qg"),
        F.lit(None).cast("long").alias("qc"))
    qry = (cells.join(F.broadcast(gmap.select(F.col("g").alias("part"))),
                      F.col("part") < F.col("g"))
                .select("mv", "part", F.lit(1).alias("tag"),
                        F.lit(0).cast("long").alias("cd"),
                        F.col("mv").alias("qmv"),
                        F.col("g").alias("qg"),
                        F.col("c").alias("qc")))
    wcum = (W.partitionBy("part").orderBy("mv", F.desc("tag"))
             .rowsBetween(W.unboundedPreceding, 0))
    cum = (data.unionByName(qry)
               .withColumn("below",
                           F.coalesce(F.sum("cd").over(wcum),
                                      F.lit(0).cast("long"))))
    l = (cum.filter(F.col("tag") == 1)
            .groupBy("qmv", "qg")
            .agg(F.max("qc").alias("c"),
                 F.sum("below").cast("long").alias("lg")))
    j2a = l.agg(F.coalesce(
        F.sum(F.col("c") * F.col("lg")).cast("long"),
        F.lit(0).cast("long")).alias("j2"))
    jta = p.agg(F.coalesce(
        F.sum(F.col("c") * F.col("pg")).cast("long"),
        F.lit(0).cast("long")).alias("jt"))
    na = cells.agg(F.sum("c").cast("long").alias("n"))
    agg = (j2a.crossJoin(F.broadcast(jta))
              .crossJoin(F.broadcast(na)))
    gs = (um.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("ni"))
            .agg(F.count(F.lit(1)).cast("long").alias("k"),
                 F.sum(F.col("ni") * F.col("ni")).cast("long")
                  .alias("sq2"),
                 F.sum(F.col("ni") * F.col("ni")
                       * (2 * F.col("ni") + 3)).cast("long")
                  .alias("sq3")))
    j = F.col("j2") + 0.5 * F.col("jt")
    nd = F.col("n").cast("double")
    mean_j = (nd * nd - F.col("sq2")) / 4.0
    var_j = (nd * nd * (2 * F.col("n") + 3) - F.col("sq3")) / 72.0
    return (agg.crossJoin(F.broadcast(gs))
               .select("n", "k", r6(j).alias("j_stat"),
                       r6((j - mean_j) / F.sqrt(var_j)).alias("z")))


# ---------------------------------------------------------------------------
# Fligner-Killeen normal-scores scale test
# ---------------------------------------------------------------------------

# Acklam 2003 rational approximation of the standard normal quantile.
# Every transcendental input (ln) is pinned to 9 dp before use and the
# result is pinned to 9 dp (the q_round6d / agg_circular_mean
# discipline), so both engines evaluate the IDENTICAL pure-IEEE
# polynomial on identical inputs — bit-equal normal scores.
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
_ACK_PLOW = 0.02425


def _qnorm(p: Column) -> Column:
    """Φ⁻¹(p) for p ∈ (0,1), Acklam's three-branch rational form."""
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D

    def _tail(q: Column) -> Column:
        num = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
               * q + c[5])
        den = ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
        return num / den

    ql = F.sqrt(F.round(-2.0 * F.log(p), 9))
    qh = F.sqrt(F.round(-2.0 * F.log(1.0 - p), 9))
    qc = p - 0.5
    rc = qc * qc
    num_c = ((((((a[0] * rc + a[1]) * rc + a[2]) * rc + a[3]) * rc
               + a[4]) * rc + a[5]) * qc)
    den_c = (((((b[0] * rc + b[1]) * rc + b[2]) * rc + b[3]) * rc
              + b[4]) * rc + 1.0)
    x = (F.when(p < _ACK_PLOW, _tail(ql))
          .when(p > 1.0 - _ACK_PLOW, -_tail(qh))
          .otherwise(num_c / den_c))
    return F.round(x, 9)


def _qnorm_sql(p: str) -> str:
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D

    def _tail(q: str) -> str:
        num = (f"((((({c[0]!r} * {q} + {c[1]!r}) * {q} + {c[2]!r})"
               f" * {q} + {c[3]!r}) * {q} + {c[4]!r}) * {q} + {c[5]!r})")
        den = (f"(((({d[0]!r} * {q} + {d[1]!r}) * {q} + {d[2]!r})"
               f" * {q} + {d[3]!r}) * {q} + 1.0)")
        return f"({num} / {den})"

    ql = f"SQRT(ROUND(-2.0 * LN({p}), 9))"
    qh = f"SQRT(ROUND(-2.0 * LN(1.0 - ({p})), 9))"
    qc = f"(({p}) - 0.5)"
    rc = f"({qc} * {qc})"
    num_c = (f"(((((({a[0]!r} * {rc} + {a[1]!r}) * {rc} + {a[2]!r})"
             f" * {rc} + {a[3]!r}) * {rc} + {a[4]!r}) * {rc} + {a[5]!r})"
             f" * {qc})")
    den_c = (f"((((({b[0]!r} * {rc} + {b[1]!r}) * {rc} + {b[2]!r})"
             f" * {rc} + {b[3]!r}) * {rc} + {b[4]!r}) * {rc} + 1.0)")
    return (f"ROUND(CASE WHEN ({p}) < {_ACK_PLOW!r} THEN {_tail(ql)}"
            f" WHEN ({p}) > 1.0 - {_ACK_PLOW!r} THEN -{_tail(qh)}"
            f" ELSE {num_c} / {den_c} END, 9)")


_FK_SQL = f"""
WITH x AS (
  SELECT event_type AS g, value AS v, event_id
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
med AS (
  SELECT g, v AS m
  FROM (SELECT g, v,
               ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY v, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS ng
        FROM x)
  WHERE rn = CAST(CEIL(ng / 2.0) AS BIGINT)),
cells AS (
  SELECT ABS(x.v - med.m) AS av, x.g, CAST(COUNT(*) AS BIGINT) AS c
  FROM x JOIN med USING (g) GROUP BY 1, 2),
dv AS (
  SELECT av, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY av),
mr AS (
  SELECT av,
         COALESCE(SUM(t) OVER (ORDER BY av
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)
           + (t + 1) / 2.0 AS r
  FROM dv),
sc AS (
  SELECT cells.g, cells.c,
         {_qnorm_sql('0.5 + mr.r / (2.0 * (nn.n + 1))')} AS a
  FROM cells JOIN mr USING (av),
       (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells) nn),
ga AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS ng, {dsum_sql('c * a')} AS sa
  FROM sc GROUP BY g),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, {dsum_sql('c * a')} AS sa,
         {dsum_sql('c * a * a')} AS saa,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS k
  FROM sc),
ssg AS (SELECT {dsum_sql('ga.sa * ga.sa / ga.ng')} AS v FROM ga)
SELECT tot.n, tot.k,
  {r6_sql(r6_sql('ssg.v - tot.sa * tot.sa / tot.n')
          + ' / '
          + r6_sql('(tot.saa - tot.sa * tot.sa / tot.n)'
                   ' / (tot.n - 1)'))} AS fk_stat
FROM tot, ssg
"""


@query("stat_fligner_killeen", oracle=_FK_SQL)
def stat_fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLIGNER-KILLEEN SCALE TEST [PK — Fligner & Killeen 1976,
    normal-scores form per Conover, Johnson & Johnson 1981 — the most
    robust-to-non-normality of the classical variance-homogeneity
    tests, completing the Levene (mean-based) / Ansari-Bradley
    (rank-sum) dispersion family]: per event type, center values by
    the GROUP MEDIAN (deterministic lower median — the order statistic
    at ceil(n/2) under a (value, event_id) total order), midrank the
    absolute deviations GLOBALLY, map ranks to normal scores
    a = Φ⁻¹(½ + r/(2(N+1))), and form the χ²_{k−1} statistic
    Σ n_g(ā_g − ā)² / s².  Φ⁻¹ is Acklam's rational approximation
    (rel. err < 1.15e-9, far inside the 6-dp output round) with every
    LN pinned to 9 dp and the score pinned to 9 dp — both engines
    evaluate the identical pure-IEEE polynomial, so the scores are
    bit-equal and the DECIMAL-accumulated sums match exactly.
    Midranks use the distinct-value cumulative idiom (ml_auc_roc
    precedent): aggregate to distinct |deviation| cells first, window
    over cells only.  Scale: two hash aggregates + one cells-level
    window; no raw-row global window."""
    ev = load_table(spark, sf_dir, "events")
    x = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select(F.col("event_type").alias("g"),
                   F.col("value").alias("v"), "event_id"))
    wrn = W.partitionBy("g").orderBy("v", "event_id")
    wng = W.partitionBy("g")
    med = (x.select("g", "v", F.row_number().over(wrn).alias("rn"),
                    F.count(F.lit(1)).over(wng).alias("ng"))
            .filter(F.col("rn")
                    == F.ceil(F.col("ng") / 2.0).cast("long"))
            .select("g", F.col("v").alias("m")))
    cells = (x.join(med, "g")
              .groupBy(F.abs(F.col("v") - F.col("m")).alias("av"), "g")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    cells = cells.cache()
    dv = cells.groupBy("av").agg(F.sum("c").cast("long").alias("t"))
    wmr = W.orderBy("av").rowsBetween(W.unboundedPreceding, -1)
    mr = dv.select(
        "av",
        (F.coalesce(F.sum("t").over(wmr), F.lit(0).cast("long"))
         + (F.col("t") + 1) / 2.0).alias("r"))
    nn = cells.agg(F.sum("c").cast("long").alias("n"))
    sc = (cells.join(mr, "av").crossJoin(F.broadcast(nn))
               .select("g", "c",
                       _qnorm(0.5 + F.col("r")
                              / (2.0 * (F.col("n") + 1))).alias("a")))
    sc = sc.cache()
    ga = sc.groupBy("g").agg(
        F.sum("c").cast("long").alias("ng"),
        dsum(F.col("c") * F.col("a")).alias("sa"))
    num_g = ga.agg(
        dsum(F.col("sa") * F.col("sa") / F.col("ng")).alias("ssg"))
    tot = sc.agg(
        F.sum("c").cast("long").alias("n"),
        dsum(F.col("c") * F.col("a")).alias("sa"),
        dsum(F.col("c") * F.col("a") * F.col("a")).alias("saa"),
        F.countDistinct("g").cast("long").alias("k"))
    num = r6(F.col("ssg") - F.col("sa") * F.col("sa") / F.col("n"))
    den = r6((F.col("saa") - F.col("sa") * F.col("sa") / F.col("n"))
             / (F.col("n") - 1))
    return (tot.crossJoin(F.broadcast(num_g))
               .select("n", "k", r6(num / den).alias("fk_stat")))


# ---------------------------------------------------------------------------
# Hill tail-index estimator
# ---------------------------------------------------------------------------

_HILL_SQL = f"""
WITH r AS (
  SELECT o_orderpriority AS grp, o_totalprice AS x,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey)
           AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders),
kk AS (
  SELECT grp, n,
         GREATEST(10, CAST(FLOOR(0.05 * n) AS BIGINT)) AS k
  FROM r WHERE rk = 1),
thr AS (
  SELECT r.grp, r.x AS xk
  FROM r JOIN kk ON r.grp = kk.grp AND r.rk = kk.k + 1),
s AS (
  SELECT r.grp, kk.n, kk.k,
         {dsum_sql('ROUND(LN(r.x / thr.xk), 9)')} AS slog
  FROM r JOIN kk ON r.grp = kk.grp
         JOIN thr ON r.grp = thr.grp
  WHERE r.rk <= kk.k
  GROUP BY r.grp, kk.n, kk.k)
SELECT grp, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       {r6_sql('slog / k')} AS inv_alpha,
       {r6_sql('k / slog')} AS hill_alpha
FROM s ORDER BY grp
"""


@query("agg_hill_tail_index", oracle=_HILL_SQL)
def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILL TAIL-INDEX ESTIMATOR [PK — Hill 1975]: per order priority,
    the canonical heavy-tail exponent α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1))
    over the top k = max(10, ⌊0.05·n⌋) order statistics — the
    workhorse diagnostic for 'does this revenue/latency distribution
    have a finite variance?', complementing agg_gumbel_block_maxima
    (block maxima) and agg_gpd_pot_moments (threshold excesses).
    Order statistics come from one per-group window under a total
    (value DESC, key) order; each ln ratio is pinned to 9 dp before
    DECIMAL accumulation; the final α is one identical double
    division.  Scale: one window + one aggregate, both partitioned by
    the group key; the top-k filter prunes before the log-sum."""
    o = load_table(spark, sf_dir, "orders")
    wr = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey")
    wn = W.partitionBy("o_orderpriority")
    r = o.select(F.col("o_orderpriority").alias("grp"),
                 F.col("o_totalprice").alias("x"),
                 F.row_number().over(wr).alias("rk"),
                 F.count(F.lit(1)).over(wn).alias("n"))
    r = r.cache()
    kk = (r.filter(F.col("rk") == 1)
           .select("grp", "n",
                   F.greatest(F.lit(10).cast("long"),
                              F.floor(0.05 * F.col("n")))
                    .alias("k")))
    thr = (r.join(kk.select("grp", "k"), "grp")
            .filter(F.col("rk") == F.col("k") + 1)
            .select("grp", F.col("x").alias("xk")))
    s = (r.join(kk.select("grp", "k"), "grp")
          .join(thr, "grp")
          .filter(F.col("rk") <= F.col("k"))
          .groupBy("grp", "n", "k")
          .agg(dsum(F.round(F.log(F.col("x") / F.col("xk")), 9))
               .alias("slog")))
    return (s.select("grp", F.col("n").cast("long").alias("n"),
                     F.col("k").cast("long").alias("k"),
                     r6(F.col("slog") / F.col("k")).alias("inv_alpha"),
                     r6(F.col("k") / F.col("slog")).alias("hill_alpha"))
             .orderBy("grp"))


# ---------------------------------------------------------------------------
# GPD peaks-over-threshold (method of moments)
# ---------------------------------------------------------------------------

_GPD_SQL = f"""
WITH r AS (
  SELECT l_returnflag AS grp, l_extendedprice AS x,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem),
u AS (
  SELECT grp, x AS thr, n
  FROM r WHERE rk = CAST(CEIL(0.95 * n) AS BIGINT)),
exc AS (
  SELECT r.grp, u.n, u.thr, r.x - u.thr AS y
  FROM r JOIN u ON r.grp = u.grp
  WHERE r.x > u.thr),
s AS (
  SELECT grp, n, thr, CAST(COUNT(*) AS BIGINT) AS n_exc,
         {dsum_sql('y')} AS sy, {dsum_sql('y * y')} AS syy
  FROM exc GROUP BY grp, n, thr),
mm AS (
  SELECT grp, CAST(n AS BIGINT) AS n, thr, n_exc,
         sy / n_exc AS m,
         (syy - sy * sy / n_exc) / (n_exc - 1) AS v
  FROM s)
SELECT grp, n, n_exc, {r6_sql('thr')} AS u,
       {r6_sql('m')} AS mean_exc,
       {r6_sql('0.5 * (1.0 - m * m / v)')} AS xi,
       {r6_sql('0.5 * m * (m * m / v + 1.0)')} AS beta
FROM mm ORDER BY grp
"""


@query("agg_gpd_pot_moments", oracle=_GPD_SQL)
def agg_gpd_pot_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERALIZED-PARETO PEAKS-OVER-THRESHOLD FIT [PK — Pickands
    1975; Hosking & Wallis 1987 method-of-moments: ξ̂ = ½(1 − m²/s²),
    β̂ = ½m(m²/s² + 1)]: per return flag, take the exceedances of
    l_extendedprice over the in-group 95th-percentile threshold (the
    deterministic order statistic at ⌈0.95n⌉ — no interpolation
    convention to disagree on) and fit the GPD to the excesses — the
    threshold-based extreme-value view that complements
    agg_gumbel_block_maxima (block maxima) and agg_var_cvar (empirical
    tail).  Moments run through DECIMAL(38,12); ξ/β are identical
    double algebra rounded 6 dp.  Scale: one per-group window to rank,
    one filtered aggregate over the ~5% tail."""
    li = load_table(spark, sf_dir, "lineitem")
    wr = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = W.partitionBy("l_returnflag")
    r = li.select(F.col("l_returnflag").alias("grp"),
                  F.col("l_extendedprice").alias("x"),
                  F.row_number().over(wr).alias("rk"),
                  F.count(F.lit(1)).over(wn).alias("n"))
    u = (r.filter(F.col("rk")
                  == F.ceil(0.95 * F.col("n")).cast("long"))
          .select("grp", F.col("x").alias("thr"), "n"))
    exc = (r.join(u.drop("n"), "grp")
            .filter(F.col("x") > F.col("thr"))
            .select("grp", "thr", (F.col("x") - F.col("thr")).alias("y")))
    s = (exc.groupBy("grp", "thr")
            .agg(F.count(F.lit(1)).cast("long").alias("n_exc"),
                 dsum("y").alias("sy"),
                 dsum(F.col("y") * F.col("y")).alias("syy")))
    m = F.col("sy") / F.col("n_exc")
    v = ((F.col("syy") - F.col("sy") * F.col("sy") / F.col("n_exc"))
         / (F.col("n_exc") - 1))
    mm = s.join(u.select("grp", "n"), "grp").select(
        "grp", F.col("n").cast("long").alias("n"), "n_exc",
        r6(F.col("thr")).alias("u"),
        r6(m).alias("mean_exc"),
        r6(0.5 * (1.0 - m * m / v)).alias("xi"),
        r6(0.5 * m * (m * m / v + 1.0)).alias("beta"))
    return mm.orderBy("grp")
