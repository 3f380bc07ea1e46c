"""Round-8b operator additions: classifier-separation and fairness
audits, the median-of-means robust estimator, and a lakehouse
clustering-depth audit.

Provenance (SURVEY.md §0 applies — empty reference checkout): all
public constructions — the two-sample KS classifier-separation
statistic is credit-scoring canon [PK]; demographic-parity /
equalized-odds gaps are the fairness-audit canon (Hardt et al. 2016
[PK]); median-of-means is the Nemirovsky–Yudin robust mean estimator
[PK]; clustering/overlap depth is the metric Delta OPTIMIZE ZORDER
and Iceberg's rewrite planners audit [PK].

House rules throughout (plans/registry.py): exact integer cores where
possible (the KS statistic ships as an INTEGER numerator), dsum/
dsum_str decimal routing for float sums, unrounded emit only for
IEEE-exact-on-identical-inputs expressions, identical aliases,
non-nullable booleans, no decimals/arrays at the boundary.

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dmean, dmean_sql, safe_div
from .registry import query, scratch_dir

# Score/label staging shared with the q_round6j model-eval family —
# same deterministic pseudo-probability, plus the user_id kept for the
# fairness grouping (q_round6j._SCORED_SQL drops it).
_SCORED_G_SQL = """
scored AS (
  SELECT e.event_id, e.user_id % 3 AS grp,
         0.02 + 0.96 * (e.value - m.vmin) / (m.vmax - m.vmin) AS p,
         CASE WHEN e.event_type IN ('click', 'purchase')
              THEN 1 ELSE 0 END AS y
  FROM events e, (SELECT MIN(value) AS vmin, MAX(value) AS vmax
                  FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)) m
  WHERE e.value IS NOT NULL AND NOT isnan(e.value))
"""


def _scored_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    m = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    p = (0.02 + 0.96 * (F.col("value") - F.col("vmin"))
         / (F.col("vmax") - F.col("vmin")))
    y = F.when(F.col("event_type").isin("click", "purchase"), 1).otherwise(0)
    return (ev.crossJoin(F.broadcast(m))
              .select("event_id", (F.col("user_id") % 3).alias("grp"),
                      p.alias("p"), y.alias("y")))


# ---------------------------------------------------------------------------
# Classifier KS separation (integer-exact numerator)
# ---------------------------------------------------------------------------

@query("ml_ks_separation", oracle=f"""
WITH {_SCORED_G_SQL},
d AS (
  SELECT p, CAST(SUM(y) AS BIGINT) AS pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
  FROM scored GROUP BY p),
c AS (
  SELECT p,
         SUM(pos) OVER w AS cpos, SUM(neg) OVER w AS cneg,
         SUM(pos) OVER () AS np,  SUM(neg) OVER () AS nn
  FROM d
  WINDOW w AS (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
g AS (
  SELECT p, ABS(cpos * nn - cneg * np) AS gap_int, np, nn FROM c),
mx AS (SELECT MAX(gap_int) AS gmax FROM g)
SELECT CAST(g.np AS BIGINT) AS n_pos, CAST(g.nn AS BIGINT) AS n_neg,
       CAST(mx.gmax AS BIGINT) AS ks_numerator,
       CAST(mx.gmax AS DOUBLE) / (g.np * g.nn) AS ks_stat,
       MIN(g.p) AS ks_threshold
FROM g, mx WHERE g.gap_int = mx.gmax
GROUP BY ALL
""")
def ml_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSIFIER KS SEPARATION [PK — the credit-scoring canon's
    two-sample Kolmogorov–Smirnov distance between the score CDFs of
    positives and negatives; the single-number discrimination metric
    scorecards report next to AUC]: KS = max_t |F₊(t) − F₋(t)|. The
    core is INTEGER-EXACT — the max runs over
    |cumpos·n₋ − cumneg·n₊| (bigint products, ~1e9 at fixture scale,
    far inside int64), so the argmax and the shipped ``ks_numerator``
    have nothing for the engines to disagree on; ``ks_stat`` is ONE
    IEEE division of exact integers (correctly rounded identically —
    emitted unrounded), and the achieving threshold ships with a MIN
    tiebreak in case two thresholds tie the max exactly. Scale: one
    hash agg on distinct scores, one tiny unpartitioned window over
    |distinct scores| (the ml_auc_roc shape), two scalars + one
    threshold out."""
    sc = _scored_g(spark, sf_dir)
    d = sc.groupBy("p").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"))
    wc = W.orderBy("p").rowsBetween(W.unboundedPreceding, 0)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = d.select(
        "p",
        F.sum("pos").over(wc).alias("cpos"),
        F.sum("neg").over(wc).alias("cneg"),
        F.sum("pos").over(wall).alias("np"),
        F.sum("neg").over(wall).alias("nn"))
    g = c.select(
        "p", "np", "nn",
        F.abs(F.col("cpos") * F.col("nn")
              - F.col("cneg") * F.col("np")).alias("gap_int"))
    mx = g.agg(F.max("gap_int").alias("gmax"))
    return (g.crossJoin(F.broadcast(mx))
             .filter(F.col("gap_int") == F.col("gmax"))
             .groupBy("np", "nn", "gmax")
             .agg(F.min("p").alias("ks_threshold"))
             .select(F.col("np").cast("long").alias("n_pos"),
                     F.col("nn").cast("long").alias("n_neg"),
                     F.col("gmax").cast("long").alias("ks_numerator"),
                     (F.col("gmax").cast("double")
                      / (F.col("np") * F.col("nn"))).alias("ks_stat"),
                     "ks_threshold"))


# ---------------------------------------------------------------------------
# Fairness audit: demographic parity + equalized odds per group
# ---------------------------------------------------------------------------

@query("ml_fairness_parity", oracle=f"""
WITH {_SCORED_G_SQL},
c AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
           AS pred_pos,
         CAST(SUM(CASE WHEN p >= 0.5 AND y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN p >= 0.5 AND y = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM scored GROUP BY grp)
SELECT grp, n, pred_pos, tp, fp,
       CAST(pred_pos AS DOUBLE) / n AS sel_rate,
       CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE) / pos END AS tpr,
       CASE WHEN n - pos > 0 THEN CAST(fp AS DOUBLE) / (n - pos) END
         AS fpr,
       CAST(pred_pos AS DOUBLE) / n
         - MIN(CAST(pred_pos AS DOUBLE) / n) OVER () AS parity_gap
FROM c
""")
def ml_fairness_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAIRNESS AUDIT per protected group [PK — demographic parity and
    the equalized-odds rates of Hardt et al. 2016; the per-slice table
    a model-governance pipeline recomputes on every eval shard]:
    groups = user_id % 3, decision = p ≥ 0.5. Per group: selection
    rate (demographic parity), TPR/FPR (equalized odds), and each
    group's parity gap vs the least-selected group — gap 0 marks the
    reference group, so the column doubles as the disparate-impact
    ranking. All counts exact bigints; every rate is ONE IEEE division
    of exact integers (correctly rounded identically cross-engine —
    emitted unrounded). Scale: one map-side-combinable hash agg on a
    3-row output plus a 3-row window; nothing is fact-sized after the
    agg."""
    sc = _scored_g(spark, sf_dir)
    pred = (F.col("p") >= 0.5).cast("int")
    c = sc.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pred).cast("long").alias("pred_pos"),
        F.sum(pred * F.col("y")).cast("long").alias("tp"),
        F.sum(pred * (1 - F.col("y"))).cast("long").alias("fp"),
        F.sum("y").cast("long").alias("pos"))
    sel = F.col("pred_pos").cast("double") / F.col("n")
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    # safe_div: an all-negative (or all-positive) group must yield a
    # NULL rate, not fault the job (ANSI x/0) — same policy both sides.
    return c.select(
        "grp", "n", "pred_pos", "tp", "fp",
        sel.alias("sel_rate"),
        safe_div(F.col("tp").cast("double"), F.col("pos")).alias("tpr"),
        safe_div(F.col("fp").cast("double"),
                 F.col("n") - F.col("pos")).alias("fpr"),
        (sel - F.min(sel).over(wall)).alias("parity_gap"))


# ---------------------------------------------------------------------------
# Median-of-means robust mean estimator
# ---------------------------------------------------------------------------

_MOM_K = 16


@query("agg_median_of_means", oracle=f"""
WITH b AS (
  SELECT event_type, event_id % {_MOM_K} AS bucket,
         {dmean_sql('value')} AS bmean
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type, bucket)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       quantile_cont(bmean, 0.5) AS mom_mean,
       {dmean_sql('bmean')} AS mean_of_means
FROM b GROUP BY event_type
""")
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN-OF-MEANS robust mean estimator [PK — Nemirovsky–Yudin;
    the heavy-tail-safe mean with exponential concentration that a
    plain average lacks — one corrupted sensor shard moves the mean
    arbitrarily, but at most one of the {_MOM_K} bucket means, which
    the median then ignores]: rows hash into {_MOM_K} deterministic
    buckets (event_id mod {_MOM_K} — at 100 TB any uniform key hash),
    each bucket's mean comes off the exact-decimal sum path (dmean ≡
    dmean_sql: bit-identical doubles), and the estimate is the exact
    interpolated median of the {_MOM_K} means (Spark percentile ≡
    DuckDB quantile_cont on identical inputs — both emitted
    UNROUNDED, every step IEEE-exact on identical operands).
    mean_of_means rides along: the MoM-vs-mean spread IS the
    heavy-tail diagnostic. Scale: ONE map-side-combinable two-level
    hash agg (|types|·{_MOM_K} partials), then a {_MOM_K}-row median
    per type — no row-level sort anywhere."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & ~F.isnan("value")))
    b = (ev.groupBy("event_type",
                    (F.col("event_id") % _MOM_K).alias("bucket"))
           .agg(dmean("value").alias("bmean")))
    return (b.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_buckets"),
                  F.expr("percentile(bmean, 0.5)").alias("mom_mean"),
                  dmean("bmean").alias("mean_of_means")))


# ---------------------------------------------------------------------------
# Lakehouse clustering-depth audit (physical layout vs logical buckets)
# ---------------------------------------------------------------------------

_CLUST_K = 16


@query("maintain_clustering_depth", oracle=f"""
WITH m AS (SELECT MAX(o_orderkey) + 1 AS mx,
                  (MAX(o_orderkey) + {_CLUST_K}) // {_CLUST_K} AS span
           FROM orders),
f AS (
  SELECT 'clustered' AS layout, o_orderkey // m.span AS bucket,
         MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
  FROM orders, m GROUP BY layout, bucket
  UNION ALL
  SELECT 'scattered' AS layout,
         (o_orderkey * 2654435761) % {_CLUST_K} AS bucket,
         MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
  FROM orders, m GROUP BY layout, bucket),
d AS (
  SELECT a.layout, a.bucket,
         CAST(COUNT(*) AS BIGINT) AS depth
  FROM f a JOIN f b ON a.layout = b.layout
                    AND a.lo <= b.hi AND b.lo <= a.hi
  GROUP BY a.layout, a.bucket)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(depth) AS BIGINT) AS total_overlaps,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(SUM(depth) AS DOUBLE) / COUNT(*) AS avg_depth
FROM d GROUP BY layout
""")
def maintain_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING-DEPTH AUDIT — the metric behind OPTIMIZE/ZORDER
    decisions [PK — Delta/Iceberg rewrite planners]: for each data
    file, how many files' key ranges overlap its own (depth 1 = a
    perfectly clustered, prunable layout; depth ≈ n_files = every scan
    of a key range touches every file). The op WRITES the same orders
    twice into scratch — key-range-bucketed ('clustered') and
    multiplicative-hash-bucketed ('scattered', the landing shape) —
    then audits the PHYSICAL files: per-file min/max of o_orderkey
    read back per input file, pairwise interval-overlap counts, and
    avg/max depth per layout. The oracle derives the identical numbers
    from the LOGICAL bucket expressions alone — a hash match proves
    the physical layout places exactly the keys the bucketing promises
    (each bucket in one file: repartition(k, bucket) before
    partitionBy pins one task per bucket). Integer-exact except
    avg_depth, one IEEE division of exact ints. At 100 TB the audit
    reads footers, not data — the same min/max the parquet pruner
    trusts; here the read-back is the data scan for oracle parity."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    mx = o.agg(F.max("o_orderkey").alias("mx")).first()["mx"]
    span = (mx + _CLUST_K) // _CLUST_K
    base = os.path.join(scratch_dir("clust_depth"), "orders_layouts")
    # DIV, not `/`-then-cast: the bigint `/` is double division and can
    # floor differently than the oracle's exact `//` near an integer
    # quotient (the data_token_budget_allocate lesson, ADVICE r7).
    layouts = {
        "clustered": F.expr(f"o_orderkey DIV {span}"),
        "scattered": (F.col("o_orderkey") * 2654435761) % _CLUST_K,
    }
    frames = []
    for name, bucket in layouts.items():
        d = os.path.join(base, name)
        (o.withColumn("bucket", bucket)
          .repartition(_CLUST_K, "bucket")
          .write.partitionBy("bucket").mode("overwrite").parquet(d))
        frames.append(
            spark.read.parquet(d)
            .select("o_orderkey",
                    F.lit(name).alias("layout"),
                    F.col("_metadata.file_path").alias("file")))
    per_file = (frames[0].unionByName(frames[1])
                .groupBy("layout", "file")
                .agg(F.min("o_orderkey").alias("lo"),
                     F.max("o_orderkey").alias("hi")))
    a, b = per_file.alias("a"), per_file.alias("b")
    d = (a.join(b, (F.col("a.layout") == F.col("b.layout"))
                & (F.col("a.lo") <= F.col("b.hi"))
                & (F.col("b.lo") <= F.col("a.hi")))
          .groupBy(F.col("a.layout").alias("layout"),
                   F.col("a.file").alias("file"))
          .agg(F.count(F.lit(1)).alias("depth")))
    return (d.groupBy("layout")
             .agg(F.count(F.lit(1)).alias("n_files"),
                  F.sum("depth").cast("long").alias("total_overlaps"),
                  F.max("depth").cast("long").alias("max_depth"),
                  (F.sum("depth").cast("double")
                   / F.count(F.lit(1))).alias("avg_depth")))
