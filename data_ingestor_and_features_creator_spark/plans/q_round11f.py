"""Round-11 operator batch F (SURVEY.md §2 growth): Local Outlier
Factor over the daily activity grid, Mood's median test, the
Ansari-Bradley scale test (tie-exact block scoring), and Newman degree
assortativity on the sparse co-purchase graph.

Provenance ([PK], empty reference checkout — SURVEY §0): Breunig et
al. 2000 (LOF); Mood 1950 (median test); Ansari & Bradley 1960;
Newman 2002 (assortativity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, dstd_samp, dstd_samp_sql, \
    dmean, dmean_sql, r6, r6_sql, safe_div, safe_div_sql
from .registry import query

# ---------------------------------------------------------------------------
# Local Outlier Factor on the (daily mean, daily count) grid
# ---------------------------------------------------------------------------

_LOF_K = 5

_PTS_SQL = f"""
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS mv,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)),
gl AS (
  SELECT {dmean_sql('mv')} AS m1, {dstd_samp_sql('mv')} AS s1,
         {dmean_sql('CAST(cnt AS DOUBLE)')} AS m2,
         {dstd_samp_sql('CAST(cnt AS DOUBLE)')} AS s2
  FROM daily),
pts AS (
  SELECT event_type, d,
         (mv - gl.m1) / gl.s1 AS z1,
         (CAST(cnt AS DOUBLE) - gl.m2) / gl.s2 AS z2
  FROM daily, gl)
"""


@query("ml_lof_daily", oracle=f"""
WITH {_PTS_SQL.strip()},
dist AS (
  SELECT a.event_type, a.d AS p, b.d AS o,
         SQRT(POWER(a.z1 - b.z1, 2) + POWER(a.z2 - b.z2, 2)) AS dd
  FROM pts a JOIN pts b
    ON a.event_type = b.event_type AND a.d <> b.d),
knn AS (
  SELECT event_type, p, o, dd,
         ROW_NUMBER() OVER (PARTITION BY event_type, p
                            ORDER BY dd, o) AS rk
  FROM dist),
kdist AS (
  SELECT event_type, p, MAX(dd) AS kd
  FROM knn WHERE rk <= {_LOF_K} GROUP BY event_type, p),
reach AS (
  SELECT k.event_type, k.p, k.o,
         GREATEST(ko.kd, k.dd) AS rd
  FROM knn k JOIN kdist ko
    ON ko.event_type = k.event_type AND ko.p = k.o
  WHERE k.rk <= {_LOF_K}),
lrd AS (
  SELECT event_type, p,
         {_LOF_K}.0 / ({dsum_sql('rd')} + 1e-10) AS lrd
  FROM reach GROUP BY event_type, p),
lof AS (
  SELECT k.event_type, k.p,
         {safe_div_sql(dsum_sql('lo.lrd'),
                       f'{_LOF_K}.0 * MAX(lp.lrd)')} AS lof
  FROM knn k
  JOIN lrd lo ON lo.event_type = k.event_type AND lo.p = k.o
  JOIN lrd lp ON lp.event_type = k.event_type AND lp.p = k.p
  WHERE k.rk <= {_LOF_K}
  GROUP BY k.event_type, k.p)
SELECT event_type, p AS day, {r6_sql('lof')} AS lof
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY {r6_sql('lof')} DESC,
                                   event_type, p) AS r
      FROM lof WHERE lof IS NOT NULL)
WHERE r <= 15
""")
def ml_lof_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL OUTLIER FACTOR [PK — Breunig et al. 2000], k=5, over the
    per-type DAILY activity grid (globally z-scored daily mean value ×
    daily event count): LOF(p) = mean_o∈kNN(p) lrd(o) / lrd(p) with
    lrd = k / Σ reach-dist and reach-dist(p,o) = max(kdist(o),
    d(p,o)) — the density-relative anomaly score that flags days
    anomalous FOR THEIR NEIGHBORHOOD, where a global z-score
    (win_anomaly_zscore) misses local-density outliers. Emits the
    top-15 under (rounded lof DESC, type, day). Determinism: kNN is
    exactly k neighbors under the (distance, neighbor-day) total
    order (the classical ties-included variant is documented
    non-deterministic across engines); duplicate-point clusters
    (Σ reach-dist = 0 — the skew/sf1ish fixtures replicate every
    daily point 10×) take the sklearn-style +1e-10 regularizer in
    lrd's denominator, so maximally-dense duplicates score LOF = 1
    ("not an outlier") instead of degenerating to NULL — a vacuous
    empty result on exactly the fixtures that stress it. Scale: the
    O(n²) pair space is per
    (type, DAY) — calendar-bounded like ts_matrix_profile_discord,
    collapsed from raw volume by the first aggregate; windows are all
    (type, point)-partitioned. At metric scale the bucketed-LSH kNN
    (sim_lsh_ann's plan) replaces the exact pair join — same
    downstream lrd/LOF algebra."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("mv"),
                    F.count(F.lit(1)).cast("long").alias("cnt")))
    gl = daily.agg(dmean("mv").alias("m1"), dstd_samp("mv").alias("s1"),
                   dmean(F.col("cnt").cast("double")).alias("m2"),
                   dstd_samp(F.col("cnt").cast("double")).alias("s2"))
    pts = (daily.crossJoin(F.broadcast(gl))
                .select("event_type", "d",
                        ((F.col("mv") - F.col("m1")) / F.col("s1"))
                        .alias("z1"),
                        ((F.col("cnt").cast("double") - F.col("m2"))
                         / F.col("s2")).alias("z2")))
    b = pts.select(F.col("event_type").alias("et2"),
                   F.col("d").alias("o"), F.col("z1").alias("w1"),
                   F.col("z2").alias("w2"))
    dist = (pts.join(b, (pts.event_type == b.et2) & (pts.d != b.o))
               .select("event_type", F.col("d").alias("p"), "o",
                       F.sqrt(F.pow(F.col("z1") - F.col("w1"), F.lit(2.0))
                              + F.pow(F.col("z2") - F.col("w2"),
                                      F.lit(2.0))).alias("dd")))
    wk = W.partitionBy("event_type", "p").orderBy("dd", "o")
    knn = (dist.withColumn("rk", F.row_number().over(wk))
               .filter(F.col("rk") <= _LOF_K))
    kdist = knn.groupBy("event_type", "p").agg(F.max("dd").alias("kd"))
    reach = (knn.join(kdist.select(F.col("event_type").alias("et3"),
                                   F.col("p").alias("o2"),
                                   F.col("kd")),
                      (knn.event_type == F.col("et3"))
                      & (knn.o == F.col("o2")))
                .select("event_type", "p", "o",
                        F.greatest("kd", "dd").alias("rd")))
    lrd = reach.groupBy("event_type", "p").agg(
        (F.lit(float(_LOF_K)) / (dsum("rd") + F.lit(1e-10))).alias("lrd"))
    lo = lrd.select(F.col("event_type").alias("et4"),
                    F.col("p").alias("o3"), F.col("lrd").alias("lrd_o"))
    lp = lrd.select(F.col("event_type").alias("et5"),
                    F.col("p").alias("p2"), F.col("lrd").alias("lrd_p"))
    lof = (knn.join(lo, (knn.event_type == F.col("et4"))
                    & (knn.o == F.col("o3")))
              .join(lp, (knn.event_type == F.col("et5"))
                    & (knn.p == F.col("p2")))
              .groupBy("event_type", "p")
              .agg(safe_div(dsum("lrd_o"),
                            F.lit(float(_LOF_K)) * F.max("lrd_p"))
                   .alias("lof")))
    wr = W.orderBy(F.desc(r6(F.col("lof"))), "event_type", "p")
    return (lof.filter(F.col("lof").isNotNull())
               .withColumn("r", F.row_number().over(wr))
               .filter(F.col("r") <= 15)
               .select("event_type", F.col("p").alias("day"),
                       r6(F.col("lof")).alias("lof")))


# ---------------------------------------------------------------------------
# Mood's median test
# ---------------------------------------------------------------------------

@query("stat_mood_median_test", oracle=f"""
WITH v AS (
  SELECT event_type, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
pv AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY value),
med AS (
  SELECT MIN(value) AS md FROM (
    SELECT value, SUM(c) OVER (ORDER BY value) AS cum,
           (SELECT SUM(c) FROM pv) AS n
    FROM pv) WHERE cum * 2 >= n),
g AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN value > med.md THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN value <= med.md THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM v, med GROUP BY event_type),
t AS (SELECT CAST(SUM(a) AS DOUBLE) AS ta, CAST(SUM(b) AS DOUBLE) AS tb,
             CAST(SUM(a + b) AS DOUBLE) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g)
SELECT t.k, CAST(t.n AS BIGINT) AS n,
  {r6_sql(dsum_sql(
      'POWER(a - (a + b) * t.ta / t.n, 2) / ((a + b) * t.ta / t.n)'
      ' + POWER(b - (a + b) * t.tb / t.n, 2) / ((a + b) * t.tb / t.n)'
  ))} AS chi2
FROM g, t GROUP BY t.k, t.n
""")
def stat_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOOD'S MEDIAN TEST [PK — Mood 1950]: do the k event types share
    a common median? Count per group above vs at-or-below the GRAND
    median and test the 2×k contingency with the χ² statistic
    Σ (O − E)²/E — the maximally-robust (if low-power) k-sample
    location test, the sanity check next to Kruskal-Wallis when heavy
    tails make even ranks suspect. The grand median is an exact order
    statistic off the distinct-value histogram (first value whose
    doubled cumulative count reaches n — integer comparisons only, no
    interpolated quantile to drift); the χ² sum runs the 2k exact
    integer cells through one identical double expression under r6.
    Scale: one per-value aggregate + one per-group aggregate; the only
    unpartitioned window is over the distinct-value table."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", "value"))
    pv = v.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    wc = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    tot = pv.agg(F.sum("c").alias("n"))
    med = (pv.select("value", F.sum("c").over(wc).alias("cum"))
             .crossJoin(F.broadcast(tot))
             .filter(F.col("cum") * 2 >= F.col("n"))
             .agg(F.min("value").alias("md")))
    g = (v.crossJoin(F.broadcast(med))
          .groupBy("event_type")
          .agg(F.sum(F.when(F.col("value") > F.col("md"), 1).otherwise(0))
               .cast("long").alias("a"),
               F.sum(F.when(F.col("value") <= F.col("md"), 1).otherwise(0))
               .cast("long").alias("b")))
    t = g.agg(F.sum("a").cast("double").alias("ta"),
              F.sum("b").cast("double").alias("tb"),
              F.sum(F.col("a") + F.col("b")).cast("double").alias("n"),
              F.count(F.lit(1)).alias("k"))
    j = g.crossJoin(F.broadcast(t))
    ea = (F.col("a") + F.col("b")) * F.col("ta") / F.col("n")
    eb = (F.col("a") + F.col("b")) * F.col("tb") / F.col("n")
    term = (F.pow(F.col("a") - ea, F.lit(2.0)) / ea
            + F.pow(F.col("b") - eb, F.lit(2.0)) / eb)
    return (j.groupBy("k", "n")
             .agg(r6(dsum(term)).alias("chi2"))
             .select("k", F.col("n").cast("long").alias("n"), "chi2"))


# ---------------------------------------------------------------------------
# Ansari-Bradley scale test (tie-exact block scores)
# ---------------------------------------------------------------------------

# Σ_{r=p..q} min(2r, 2(N+1)-2r): integer closed form, split at the
# fold point 2r <= N+1. DOUBLED scores keep everything in BIGINT.
_AB_BLOCK = """
CASE WHEN 2 * q <= nn + 1
     THEN (p + q) * (q - p + 1)
     WHEN 2 * p >= nn + 1
     THEN (2 * (nn + 1) - p - q) * (q - p + 1)
     ELSE (p + fold) * (fold - p + 1)
          + (2 * (nn + 1) - fold - 1 - q) * (q - fold)
END
"""


@query("stat_ansari_bradley", oracle=f"""
WITH v AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp, value
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
pv AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(grp) AS BIGINT) AS c1
  FROM v GROUP BY value),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n0,
             CAST(SUM(c) AS BIGINT) AS nn FROM pv),
blocks AS (
  SELECT c, c1,
         SUM(c) OVER (ORDER BY value) - c + 1 AS p,
         SUM(c) OVER (ORDER BY value) AS q,
         n.nn, (n.nn + 1) // 2 AS fold
  FROM pv, n),
scored AS (
  SELECT c1, c, ({_AB_BLOCK.strip()}) AS bs2
  FROM blocks)
SELECT n.n1, n.n0,
  {r6_sql(dsum_sql('CAST(c1 AS DOUBLE) * bs2 / (2.0 * c)'))} AS ab_stat,
  {r6_sql(dsum_sql('CAST(c1 AS DOUBLE) * bs2 / (2.0 * c)') + ' / n.n1')}
    AS ab_mean_score
FROM scored, n GROUP BY n.n1, n.n0
""")
def stat_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSARI-BRADLEY SCALE TEST [PK — Ansari & Bradley 1960]: ranks
    folded toward the center — score(r) = min(r, N+1−r) — so a sample
    with SMALLER dispersion concentrates at high scores; the
    rank-based two-sample test of equal SCALE that needs no normality
    (the dispersion companion to stat_brunner_munzel's location
    test). TIE-EXACT: a tied block occupying positions p..q
    contributes the exact integer Σ_{{r=p..q}} min(2r, 2(N+1)−2r)
    (doubled scores stay in BIGINT; the closed form splits the range
    at the fold point), and each of the block's c observations gets
    the block average — so group 1's statistic is
    Σ_v c1_v · blockSum_v / (2c_v), one exact-rational sum per
    distinct value with NO per-position expansion. Same
    distinct-value-histogram scale shape as the rank family; emits
    the statistic and its per-observation mean."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select(F.when(F.col("event_type") == "click", 1).otherwise(0)
                   .alias("grp"), "value"))
    pv = v.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("grp").cast("long").alias("c1"))
    n = pv.agg(F.sum("c1").cast("long").alias("n1"),
               F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"),
               F.sum("c").cast("long").alias("nn"))
    wc = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    blocks = (pv.select("c", "c1",
                        (F.sum("c").over(wc) - F.col("c") + 1).alias("p"),
                        F.sum("c").over(wc).alias("q"))
                .crossJoin(F.broadcast(n))
                .withColumn("fold", F.expr("(nn + 1) DIV 2")))
    p, q, nn, fold = (F.col("p"), F.col("q"), F.col("nn"), F.col("fold"))
    bs2 = (F.when(2 * q <= nn + 1, (p + q) * (q - p + 1))
            .when(2 * p >= nn + 1,
                  (2 * (nn + 1) - p - q) * (q - p + 1))
            .otherwise((p + fold) * (fold - p + 1)
                       + (2 * (nn + 1) - fold - 1 - q) * (q - fold)))
    scored = blocks.select("c", "c1", "n1", "n0", bs2.alias("bs2"))
    term = F.col("c1").cast("double") * F.col("bs2") / (2.0 * F.col("c"))
    return (scored.groupBy("n1", "n0")
                  .agg(r6(dsum(term)).alias("ab_stat"),
                       r6(dsum(term) / F.col("n1")).alias("ab_mean_score")))


# ---------------------------------------------------------------------------
# Degree assortativity (Newman 2002)
# ---------------------------------------------------------------------------

@query("graph_assortativity", oracle="""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
pb AS (SELECT p_partkey, p_brand FROM part),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(l1.l_partkey, l2.l_partkey) AS a,
         GREATEST(l1.l_partkey, l2.l_partkey) AS b
  FROM li l1 JOIN li l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  JOIN pb p1 ON p1.p_partkey = l1.l_partkey
  JOIN pb p2 ON p2.p_partkey = l2.l_partkey
  WHERE p1.p_brand = p2.p_brand),
sym AS MATERIALIZED (
  SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u),
ed AS (
  SELECT da.d AS j, db.d AS k
  FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(j * k) AS BIGINT) AS sjk,
         CAST(SUM(j + k) AS BIGINT) AS sj,
         CAST(SUM(j * j + k * k) AS BIGINT) AS sq
  FROM ed)
SELECT m,
  (CAST(sjk AS DOUBLE) / m - POWER(0.5 * sj / m, 2))
  / NULLIF(0.5 * sq / m - POWER(0.5 * sj / m, 2), 0.0) AS assortativity
FROM s
""")
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY [PK — Newman 2002]: the Pearson
    correlation of endpoint degrees across edges, r = [M⁻¹Σjk −
    (M⁻¹Σ½(j+k))²] / [M⁻¹Σ½(j²+k²) − (M⁻¹Σ½(j+k))²] — positive means
    hubs attach to hubs (social-network-like), negative means
    hub-and-spoke (technological/dependency-like); the one-number
    mixing diagnostic that tells you whether degree-based
    partitioning will skew. All three sums are exact BIGINT over the
    edge list (degrees joined in from one aggregate), the final ratio
    is ONE identical double expression per engine — emitted UNROUNDED
    (quotients of exact integers, win_vwap convention), NULL for the
    degenerate regular graph (zero variance). Scale: one degree
    aggregate + two broadcast-able joins keyed on the edge endpoints;
    output is one row."""
    from .q_round11b import _copurchase_edges, _sym
    e = _copurchase_edges(spark, sf_dir).cache()
    deg = _sym(e).groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    ed = (e.join(deg.select(F.col("u").alias("a"), F.col("d").alias("j")),
                 "a")
           .join(deg.select(F.col("u").alias("b"), F.col("d").alias("k")),
                 "b"))
    s = ed.agg(F.count(F.lit(1)).cast("long").alias("m"),
               F.sum(F.col("j") * F.col("k")).cast("long").alias("sjk"),
               F.sum(F.col("j") + F.col("k")).cast("long").alias("sj"),
               F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k"))
               .cast("long").alias("sq"))
    md = F.col("m").cast("double")
    mean_half = 0.5 * F.col("sj") / md
    num = F.col("sjk").cast("double") / md - F.pow(mean_half, F.lit(2.0))
    den = 0.5 * F.col("sq") / md - F.pow(mean_half, F.lit(2.0))
    return s.select("m", F.when(den != 0, num / den)
                    .alias("assortativity"))
