"""Round-11 operator batch Q (SURVEY.md §2 growth): 2-D skyline
(Pareto frontier), corpus source-overlap matrix, hash-uniformity KS
audit, CUSUM mean-shift changepoint.

Provenance ([PK], empty reference checkout — SURVEY §0): Börzsönyi,
Kossmann & Stocker 2001 (the skyline operator; the sorted running-max
algorithm for 2-D); n-gram containment overlap as in Broder 1997 /
the Dolma & RedPajama corpus-audit practice; Kolmogorov 1933 (1-sample
KS); Page 1954 / Hinkley 1970 (CUSUM mean-shift changepoint, the
max-|standardized partial sum| estimator).

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
# 2-D skyline (Pareto frontier)
# ---------------------------------------------------------------------------

_SKY_SQL = """
WITH pts AS (
  SELECT p_brand, p_partkey, p_retailprice AS price, p_size AS psize
  FROM part),
ranked AS (
  SELECT p_brand, p_partkey, price, psize,
         MAX(psize) OVER (PARTITION BY p_brand
                          ORDER BY price, p_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS best_before
  FROM pts)
SELECT p_brand, p_partkey, price, CAST(psize AS BIGINT) AS psize
FROM ranked
WHERE best_before IS NULL OR psize > best_before
ORDER BY p_brand, price, p_partkey
"""


@query("sort_skyline_pareto", oracle=_SKY_SQL)
def sort_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE / PARETO FRONTIER [PK — Börzsönyi, Kossmann &
    Stocker 2001, the operator that launched the skyline literature]:
    per brand, the parts no other same-brand part dominates on
    (cheaper price, larger size) — a row survives iff no earlier row in (price, partkey)
    order has size ≥ its size, which in 2-D reduces to ONE running-max
    window: keep the point iff its size exceeds the best size seen at
    any cheaper price.  Strict dominance with the deterministic
    (price, partkey) tiebreak: an equal-price-equal-size twin keeps
    the lower key, matching the window's strict `>` against the
    prefix max.  The frontier members of a catalog/price table are
    the 'efficient' choices every recommendation layer wants.  Scale:
    in 2-D the skyline is a sort + one prefix-max window — no
    pairwise dominance join; partitioning by brand keeps every window
    frame key-bounded (a WHOLE-table 2-D skyline would need the
    two-pass range-partitioned construction instead; k-D skylines the
    block-nested-loop form)."""
    p = load_table(spark, sf_dir, "part")
    wr = (W.partitionBy("p_brand").orderBy("price", "p_partkey")
           .rowsBetween(W.unboundedPreceding, -1))
    ranked = (p.select("p_brand", "p_partkey",
                       F.col("p_retailprice").alias("price"),
                       F.col("p_size").alias("psize"))
               .withColumn("best_before", F.max("psize").over(wr)))
    return (ranked.filter(F.col("best_before").isNull()
                          | (F.col("psize") > F.col("best_before")))
                  .select("p_brand", "p_partkey", "price",
                          F.col("psize").cast("long").alias("psize"))
                  .orderBy("p_brand", "price", "p_partkey"))


# ---------------------------------------------------------------------------
# Corpus source-overlap matrix (5-gram containment)
# ---------------------------------------------------------------------------

_OVL_N = 5

_OVL_SQL = f"""
WITH t AS (
  SELECT source,
         list_filter(regexp_split_to_array(text, '[ \t\r\n]+'),
                     x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT DISTINCT source,
         array_to_string(toks[i:i + {_OVL_N} - 1], ' ') AS gram
  FROM (SELECT source, toks,
               UNNEST(generate_series(1, len(toks) - {_OVL_N} + 1))
                 AS i
        FROM t WHERE len(toks) >= {_OVL_N})),
sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM g GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT p.src_a, p.src_b, sa.n_grams AS grams_a, sb.n_grams AS grams_b,
       p.n_common,
       {r6_sql('CAST(p.n_common AS DOUBLE)'
               ' / LEAST(sa.n_grams, sb.n_grams)')} AS containment,
       {r6_sql('CAST(p.n_common AS DOUBLE)'
               ' / (sa.n_grams + sb.n_grams - p.n_common)')} AS jaccard
FROM pairs p
JOIN sizes sa ON sa.source = p.src_a
JOIN sizes sb ON sb.source = p.src_b
ORDER BY p.src_a, p.src_b
"""


@query("data_source_overlap_matrix", oracle=_OVL_SQL)
def data_source_overlap_matrix(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """SOURCE-OVERLAP MATRIX, exact 5-gram containment [PK — Broder
    1997 containment; the corpus-audit practice of the Dolma /
    RedPajama reports]: for every pair of sources, the exact Jaccard
    and containment (|∩|/min) of their distinct 5-gram sets — the
    diagnostic that decides whether two crawls are near-copies BEFORE
    anyone spends a dedup pass on them, and the exact ground truth
    the MinHash estimators (dedup_fuzzy_minhash) approximate.  Grams
    dedupe per source first (DISTINCT), the pair join runs
    gram-keyed (shuffle on gram, never all-pairs docs), and the
    source<source guard emits each unordered pair once.  Scale: gram
    vocabulary bounds everything after the explode; |sources|² output
    is domain-bounded."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"[ \t\r\n]+"),
                    lambda t: t != F.lit(""))
    t = d.select("source", toks.alias("toks"))
    n = F.size("toks")
    gram = F.array_join(F.slice("toks", F.col("i"), _OVL_N), " ")
    g = (t.filter(n >= _OVL_N)
          .select("source",
                  F.explode(F.sequence(F.lit(1), n - _OVL_N + 1))
                   .alias("i"), "toks")
          .select("source", gram.alias("gram"))
          .distinct())
    g = g.cache()
    sizes = g.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"))
    a = g.select(F.col("source").alias("src_a"), "gram")
    b = g.select(F.col("source").alias("src_b"),
                 F.col("gram").alias("gram_b"))
    pairs = (a.join(b, (F.col("gram") == F.col("gram_b"))
                    & (F.col("src_a") < F.col("src_b")))
              .groupBy("src_a", "src_b")
              .agg(F.count(F.lit(1)).cast("long").alias("n_common")))
    sa = sizes.select(F.col("source").alias("src_a"),
                      F.col("n_grams").alias("grams_a"))
    sb = sizes.select(F.col("source").alias("src_b"),
                      F.col("n_grams").alias("grams_b"))
    return (pairs.join(F.broadcast(sa), "src_a")
                 .join(F.broadcast(sb), "src_b")
                 .select("src_a", "src_b", "grams_a", "grams_b",
                         "n_common",
                         r6(F.col("n_common").cast("double")
                            / F.least("grams_a", "grams_b"))
                          .alias("containment"),
                         r6(F.col("n_common").cast("double")
                            / (F.col("grams_a") + F.col("grams_b")
                               - F.col("n_common"))).alias("jaccard"))
                 .orderBy("src_a", "src_b"))


# ---------------------------------------------------------------------------
# Hash-uniformity KS audit
# ---------------------------------------------------------------------------

_KSU_A = int(0.6180339887498949 * (1 << 26)) | 1
_KSU_M = 1 << 26

_KSU_SQL = f"""
WITH h AS (
  SELECT CAST(((event_id % {_KSU_M}) * {_KSU_A}) % {_KSU_M} AS DOUBLE)
           / {_KSU_M} AS u
  FROM events),
cells AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY u),
cum AS (
  SELECT u,
         CAST(SUM(c) OVER (ORDER BY u
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM cells),
d AS (
  SELECT MAX(GREATEST(ABS(CAST(cum AS DOUBLE) / n - u),
                      ABS(u - (CAST(cum AS DOUBLE) - 1) / n))) AS ks,
         MAX(n) AS n
  FROM cum)
SELECT CAST(n AS BIGINT) AS n, ROUND(ks, 6) + 0.0 AS ks_d,
       ROUND(SQRT(CAST(n AS DOUBLE)) * ks, 6) + 0.0 AS ks_stat
FROM d
"""


@query("audit_hash_uniformity_ks", oracle=_KSU_SQL)
def audit_hash_uniformity_ks(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """HASH-UNIFORMITY KS AUDIT [PK — Kolmogorov 1933 one-sample
    test; Knuth TAOCP vol. 3 multiplicative hashing]: are the [0,1)
    values a deterministic key hash assigns to event ids uniform?
    Every hash-based splitter in the registry (data_split_hash,
    data_sample_hash_priority, stat_bootstrap_ci_hash) leans on such
    uniformity, so the audit belongs in the same suite: D = sup|ECDF
    − u| via the two-sided step bounds max(|i/n − u_i|, |u_i −
    (i−1)/n|), computed over distinct-value cells (ml_auc_roc idiom —
    no raw-row global window); √n·D ≲ 1.36 accepts uniformity at 5%.
    The hash under audit is Knuth's multiplicative scheme on the low
    26 key bits, u = ((id mod 2²⁶)·A mod 2²⁶)/2²⁶ with A = ⌊φ·2²⁶⌋|1
    — chosen over the engines' native hash functions (xxhash64 vs
    DuckDB's) because the CONTRACT must be engine-identical: the
    26-bit split keeps every product under 2⁵³, exact BIGINT modular
    arithmetic on both engines.  Scale: one scan projection + cells
    aggregate + one cells-level cumulative window."""
    ev = load_table(spark, sf_dir, "events")
    u = (F.pmod(F.pmod(F.col("event_id"), F.lit(_KSU_M))
                * F.lit(_KSU_A), F.lit(_KSU_M))
         .cast("double") / float(_KSU_M))
    h = ev.select(u.alias("u"))
    cells = h.groupBy("u").agg(F.count(F.lit(1)).cast("long")
                                .alias("c"))
    wy = W.orderBy("u").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy(F.lit(1))
    cum = cells.select(
        "u", F.sum("c").over(wy).cast("long").alias("cum"),
        F.sum("c").over(wall).cast("long").alias("n"))
    dplus = F.abs(F.col("cum").cast("double") / F.col("n")
                  - F.col("u"))
    dminus = F.abs(F.col("u")
                   - (F.col("cum").cast("double") - 1) / F.col("n"))
    d = cum.agg(F.max(F.greatest(dplus, dminus)).alias("ks"),
                F.max("n").alias("n"))
    return d.select(F.col("n").cast("long").alias("n"),
                    r6(F.col("ks")).alias("ks_d"),
                    r6(F.sqrt(F.col("n").cast("double"))
                       * F.col("ks")).alias("ks_stat"))


# ---------------------------------------------------------------------------
# CUSUM mean-shift changepoint
# ---------------------------------------------------------------------------

_CUSUM_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
idx AS (
  SELECT event_type, d, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily),
mu AS (
  SELECT event_type, {dsum_sql('x')} / COUNT(*) AS m,
         {dsum_sql('x * x')} / COUNT(*) AS m2
  FROM idx GROUP BY event_type),
s AS (
  SELECT idx.event_type, idx.d, idx.t, idx.n,
         SUM(idx.x - mu.m) OVER (PARTITION BY idx.event_type
                                 ORDER BY idx.t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS st,
         SQRT(mu.m2 - mu.m * mu.m) AS sd
  FROM idx JOIN mu USING (event_type)),
scored AS (
  SELECT event_type, d, t, n,
         ABS(st) / (sd * SQRT(CAST(n AS DOUBLE))) AS q
  FROM s WHERE t < n),
best AS (
  SELECT event_type, d, t, n, q,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY q DESC, t) AS pr
  FROM scored)
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS t_hat,
       d AS change_day, {r6_sql('q')} AS cusum_stat
FROM best WHERE pr = 1 ORDER BY event_type
"""


@query("stat_changepoint_cusum_mean", oracle=_CUSUM_SQL)
def stat_changepoint_cusum_mean(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """CUSUM MEAN-SHIFT CHANGEPOINT [PK — Page 1954; Hinkley 1970:
    t̂ = argmax_t |S_t| of the demeaned partial sums, standardized by
    σ̂√n]: the parametric mean-shift companion to
    stat_changepoint_pettitt (rank-based) and agg_page_hinkley_drift
    (online) — CUSUM is the likelihood-ratio estimator under a
    Gaussian single-shift model and pins WHERE the level moved, per
    event type's daily series.  Partial sums run in the per-type
    window with a fixed fold order; the argmax is a 1-row-per-type
    rank with deterministic (q DESC, t) tiebreak; interior points
    only (t < n — |S_n| ≡ 0).  Scale: facts collapse to (type, day);
    one window + one per-type top-1."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("x")))
    wt = W.partitionBy("event_type").orderBy("d")
    wn = W.partitionBy("event_type")
    idx = daily.select("event_type", "d", "x",
                       F.row_number().over(wt).alias("t"),
                       F.count(F.lit(1)).over(wn).cast("long")
                        .alias("n"))
    mu = idx.groupBy("event_type").agg(
        (dsum("x") / F.count(F.lit(1))).alias("m"),
        (dsum(F.col("x") * F.col("x")) / F.count(F.lit(1)))
         .alias("m2"))
    ws = (W.partitionBy("event_type").orderBy("t")
           .rowsBetween(W.unboundedPreceding, 0))
    s = (idx.join(F.broadcast(mu), "event_type")
            .select("event_type", "d", "t", "n",
                    F.sum(F.col("x") - F.col("m")).over(ws)
                     .alias("st"),
                    F.sqrt(F.col("m2") - F.col("m") * F.col("m"))
                     .alias("sd")))
    scored = (s.filter(F.col("t") < F.col("n"))
               .select("event_type", "d", "t", "n",
                       (F.abs("st")
                        / (F.col("sd")
                           * F.sqrt(F.col("n").cast("double"))))
                       .alias("q")))
    wb = W.partitionBy("event_type").orderBy(F.desc("q"), "t")
    return (scored.withColumn("pr", F.row_number().over(wb))
                  .filter(F.col("pr") == 1)
                  .select("event_type",
                          F.col("n").cast("long").alias("n"),
                          F.col("t").cast("long").alias("t_hat"),
                          F.col("d").alias("change_day"),
                          r6(F.col("q")).alias("cusum_stat"))
                  .orderBy("event_type"))
