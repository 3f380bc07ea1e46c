"""Round-4 batch B: distribution statistics + corpus-ops additions.

Provenance (SURVEY.md §0 applies — empty reference checkout): these
extend the analytics surface along two driver-north-star axes —
statistical comparison operators a feature-QA pipeline runs per cohort
(Welch t, Mann-Whitney U, two-sample KS, Benford digit audit) and
corpus-management ops for training-data pipelines (shard-balance
audit, prefix-duplicate families, Pareto head-coverage).

House determinism rules, applied throughout: NO libm transcendentals
(ln/exp/log10 drift 1 ulp cross-engine — every statistic here is built
from counts, rational arithmetic, and sqrt, which are IEEE-exact);
integer shares in PPM via integer division (Spark DIV ≡ DuckDB //);
decimal-exact sums for any float aggregation; r6 only on values whose
inputs are already bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query


# ---------------------------------------------------------------------------
# Prefix-duplicate families (cheap near-dup signal)
# ---------------------------------------------------------------------------

_PFX_TOKENS = 10


@query("text_prefix_dup", oracle=f"""
WITH p AS (
  SELECT doc_id,
         md5(array_to_string(string_split(text, ' ')[1:{_PFX_TOKENS}],
             ' ')) AS pfx
  FROM documents),
g AS (SELECT pfx, CAST(COUNT(*) AS BIGINT) AS n_peers,
             CAST(MIN(doc_id) AS BIGINT) AS keeper
      FROM p GROUP BY pfx)
SELECT doc_id, n_peers,
       CAST(doc_id = keeper AS BOOLEAN) AS keep
FROM p JOIN g USING (pfx)
""")
def text_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-DUPLICATE FAMILIES: documents sharing their first 10
    tokens — the cheapest near-dup signal in a crawl pipeline (mirrors
    and templated pages copy openings verbatim long before MinHash
    gets involved; run THIS first, it is one hash per doc). Every doc
    is emitted with its family size and a deterministic keep flag
    (min doc_id wins), so the oracle bites on real data even when the
    fixture plants no prefix dups. The digest keys the shuffle — md5
    is uniform, unskewable; family agg + join-back is the same
    digest-keyed shape as dedup_exact. At 100 TB: one scan, one
    shuffle on a 16-byte key."""
    d = load_table(spark, sf_dir, "documents")
    pfx = F.md5(F.concat_ws(" ", F.slice(F.split("text", " "),
                                         1, _PFX_TOKENS)))
    p = d.select("doc_id", pfx.alias("pfx"))
    g = (p.groupBy("pfx")
          .agg(F.count(F.lit(1)).alias("n_peers"),
               F.min("doc_id").alias("keeper")))
    return (p.join(g, "pfx")
             .select("doc_id", "n_peers",
                     (F.col("doc_id") == F.col("keeper")).alias("keep")))


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing (double exponential; Arrow kernel)
# ---------------------------------------------------------------------------

_HOLT_ALPHA, _HOLT_BETA = 0.3, 0.1


def _holt_kernel(pdf):
    """Per-user Holt recursion: l_t = a·x + (1-a)(l+b); b_t =
    β(l_t−l_{t−1}) + (1−β)b. Sequential by nature — runs as a python
    loop over the group's numpy arrays inside one Arrow batch."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"])
    x = pdf["value"].to_numpy()
    lvl = np.empty(len(x))
    trd = np.empty(len(x))
    if len(x):
        lvl[0], trd[0] = x[0], 0.0
        for i in range(1, len(x)):
            prev = lvl[i - 1] + trd[i - 1]
            lvl[i] = _HOLT_ALPHA * x[i] + (1 - _HOLT_ALPHA) * prev
            trd[i] = (_HOLT_BETA * (lvl[i] - lvl[i - 1])
                      + (1 - _HOLT_BETA) * trd[i - 1])
    # emitted UNROUNDED: the recursion order is fixed, so both engines
    # produce bit-identical doubles — rounding would ADD a half-even vs
    # half-away boundary hazard at the 6th dp (observed: one row in
    # 10,000 at sf0.01), the exact trap the house rules warn about.
    return pd.DataFrame({
        "user_id": pdf["user_id"].to_numpy(),
        "event_id": pdf["event_id"].to_numpy(),
        "level": lvl,
        "trend": trd,
    })


_HOLT_ORACLE = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
h AS (
  SELECT user_id, event_id, rn, value AS lvl, CAST(0.0 AS DOUBLE) AS trd
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.rn,
         0.3 * b.value + 0.7 * (h.lvl + h.trd) AS lvl,
         0.1 * ((0.3 * b.value + 0.7 * (h.lvl + h.trd)) - h.lvl)
           + 0.9 * h.trd AS trd
  FROM h JOIN base b ON b.user_id = h.user_id AND b.rn = h.rn + 1)
SELECT user_id, event_id, lvl AS level, trd AS trend
FROM h
"""


@query("win_holt_linear", oracle=_HOLT_ORACLE)
def win_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT LINEAR-TREND smoothing (double exponential) per user over
    event values — the trend-aware sibling of win_ewma. EWMA has a
    closed weighted-sum form (win_ewma exploits it in pure SQL); the
    Holt level/trend pair is a coupled recursion with no closed form,
    so this is the honest Arrow-kernel case (§2.12 house rules:
    pre-selected 4 columns only, one applyInPandas per user group —
    each group one task, bounded by per-user event counts). Verified
    against a direct driver-side recursion in tests; rows-only for
    the driver (recursion isn't SQL-expressible)."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & ~F.isnan("value")))
    return (ev.select("user_id", "event_id", "ts", "value")
              .groupBy("user_id")
              .applyInPandas(_holt_kernel,
                             "user_id long, event_id long, "
                             "level double, trend double"))


# ---------------------------------------------------------------------------
# Maximum drawdown per user (running-peak shortfall)
# ---------------------------------------------------------------------------

@query("win_drawdown", oracle=f"""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(CAST(value AS DECIMAL(38,12))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS cum
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
d AS (
  SELECT user_id, cum,
         MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM c)
SELECT user_id,
       {r6_sql('MAX(peak - cum)')} AS max_drawdown,
       {r6_sql('MAX(cum)')} AS final_peak
FROM d GROUP BY user_id
""")
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN per user over the cumulative value series —
    the risk metric every portfolio/engagement dashboard carries:
    largest peak-to-trough drop of the running total. Two stacked
    windows sharing ONE (user, time) sort — cumulative sum, then
    running max of it — and a grouped max of the shortfall; Spark
    plans a single Exchange + Sort for both frames. The cumsum runs
    through DECIMAL (order-fixed by the total ORDER, but decimal makes
    the prefix sums bit-identical cross-engine); peak − cum is then a
    deterministic double difference. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    wrun = (W.partitionBy("user_id").orderBy(*order)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (F.sum(F.col("value").cast("decimal(38,12)")).over(wrun)
            .cast("double"))
    d = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .withColumn("cum", cum)
           .withColumn("peak", F.max("cum").over(wrun)))
    return (d.groupBy("user_id")
             .agg(r6(F.max(F.col("peak") - F.col("cum")))
                  .alias("max_drawdown"),
                  r6(F.max("cum")).alias("final_peak")))


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate against an induced top-k vocabulary
# ---------------------------------------------------------------------------

_OOV_VOCAB_K = 50


@query("text_oov_rate", oracle=f"""
WITH tok AS (
  SELECT doc_id, u.t AS term
  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
  WHERE u.t <> ''),
df_ AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        GROUP BY term),
vocab AS (SELECT term FROM df_
          ORDER BY tf DESC, term LIMIT {_OOV_VOCAB_K}),
j AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_oov
  FROM tok t LEFT JOIN vocab v ON t.term = v.term
  GROUP BY t.doc_id)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
FROM j
""")
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-VOCABULARY RATE per document against a corpus-induced
    top-{k} term vocabulary — the coverage check run before committing
    a tokenizer/vocab: docs with high OOV either need the vocab grown
    or are noise. Tokenize ONCE (cached diamond top: the token table
    feeds both the vocab induction and the per-doc join), induce the
    vocab by (tf DESC, term) — a total order so the cut is
    deterministic — broadcast it (vocab is k rows at any corpus
    size), LEFT join + null-count, integer-PPM rate. The corpus
    never shuffles for the vocab membership test — only for its own
    term count.""".format(k=_OOV_VOCAB_K)
    d = load_table(spark, sf_dir, "documents")
    tok = (d.select("doc_id",
                    F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term") != "")
            .cache())
    vocab = (tok.groupBy("term")
                .agg(F.count(F.lit(1)).alias("tf"))
                .orderBy(F.desc("tf"), "term")
                .limit(_OOV_VOCAB_K)
                .select("term", F.lit(1).alias("in_vocab")))
    j = (tok.join(F.broadcast(vocab), "term", "left_outer")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.when(F.col("in_vocab").isNull(), 1)
                        .otherwise(0)).alias("n_oov")))
    return j.select("doc_id", "n_tokens", "n_oov",
                    F.expr("BIGINT(n_oov * 1000000 div n_tokens)")
                     .alias("oov_ppm"))


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (MAPE per event type)
# ---------------------------------------------------------------------------

@query("win_forecast_snaive_backtest", oracle=f"""
WITH g AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         {dsum_sql('value')} / COUNT(*) AS y
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type, date_trunc('hour', ts)),
f AS (
  SELECT event_type, h, y,
         LAG(y, 24) OVER (PARTITION BY event_type ORDER BY h) AS yhat
  FROM g)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       {r6_sql(dsum_sql('ABS(y - yhat) / ABS(y)') + ' / COUNT(*)')}
         AS mape
FROM f WHERE yhat IS NOT NULL AND y <> 0.0
GROUP BY event_type
""")
def win_forecast_snaive_backtest(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SEASONAL-NAIVE FORECAST BACKTEST per event type: bucket the
    stream to an hourly series (mean value), forecast each hour with
    the value 24 hours earlier (the no-model baseline every real
    forecaster must beat), score with MAPE. This is the backtest
    harness shape — grid → lag-k forecast → masked error mean — with
    the forecast horizon as ONE window lag, so swapping in any other
    lag/combination forecast keeps the plan. The per-hour mean and
    the APE mean both run through decimal sums; APE itself is a
    deterministic |diff|/|y| of bit-identical doubles. Shuffles: one
    on (type, hour) for the grid, one on type for the score."""
    ev = load_table(spark, sf_dir, "events")
    g = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .groupBy("event_type",
                    F.date_trunc("hour", "ts").alias("h"))
           .agg((dsum("value") / F.count(F.lit(1))).alias("y")))
    w = W.partitionBy("event_type").orderBy("h")
    f = g.withColumn("yhat", F.lag("y", 24).over(w))
    ape = F.abs(F.col("y") - F.col("yhat")) / F.abs(F.col("y"))
    return (f.filter(F.col("yhat").isNotNull() & (F.col("y") != 0.0))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_scored"),
                  r6(dsum(ape) / F.count(F.lit(1))).alias("mape")))


# ---------------------------------------------------------------------------
# Duplicate-family size histogram (how duplicated is the corpus?)
# ---------------------------------------------------------------------------

@query("dedup_family_size_histogram", oracle="""
WITH fam AS (
  SELECT md5(text) AS k, CAST(COUNT(*) AS BIGINT) AS family_size
  FROM documents GROUP BY md5(text))
SELECT family_size, CAST(COUNT(*) AS BIGINT) AS n_families,
       CAST(family_size * COUNT(*) AS BIGINT) AS n_docs
FROM fam GROUP BY family_size
""")
def dedup_family_size_histogram(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """DUPLICATE-FAMILY SIZE HISTOGRAM — the corpus-duplication
    profile read BEFORE choosing a dedup strategy: a corpus whose
    histogram is all 1s needs no dedup pass; a heavy tail says
    keep-policy choice matters. Two-level aggregate (digest → family
    size → histogram of sizes), the same histogram-of-a-histogram
    shape as TPC-H Q13; the first shuffle is digest-keyed (uniform),
    the second is size-keyed (tiny domain). n_docs = size×families
    cross-checks against the corpus row count by construction."""
    d = load_table(spark, sf_dir, "documents")
    fam = (d.groupBy(F.md5("text").alias("k"))
             .agg(F.count(F.lit(1)).alias("family_size")))
    return (fam.groupBy("family_size")
               .agg(F.count(F.lit(1)).alias("n_families"))
               .select("family_size", "n_families",
                       (F.col("family_size") * F.col("n_families"))
                       .alias("n_docs")))


# ---------------------------------------------------------------------------
# Inverted index build (posting lists with df cap)
# ---------------------------------------------------------------------------

_IDX_MAX_DF = 390


@query("text_inverted_index", oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, u.t AS term
  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
  WHERE u.t <> ''),
df_ AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tok
        GROUP BY term)
SELECT t.term, d.df,
       string_agg(CAST(t.doc_id AS VARCHAR), ',' ORDER BY t.doc_id)
         AS postings
FROM tok t JOIN df_ d USING (term)
WHERE d.df <= {_IDX_MAX_DF}
GROUP BY t.term, d.df
""")
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INVERTED-INDEX BUILD: term → sorted posting list of doc_ids —
    the construction step behind BM25/boolean retrieval (text_bm25
    consumes these statistics; this op materializes the index
    itself). Stop-terms are dropped by a df cap BEFORE the posting
    aggregation — at web scale the 'the'-posting-list is the classic
    single-reducer killer, the same hot-key valve as the Jaccard
    stop-shingle cap. Postings serialize as an ORDERED comma string
    (listagg house rule: unordered concatenation can never
    hash-match); real deployments keep array<long> + delta encoding,
    same plan shape. Distinct (doc, term) first so a repeated term
    contributes one posting. One term-keyed shuffle."""
    d = load_table(spark, sf_dir, "documents")
    tok = (d.select("doc_id",
                    F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term") != "")
            .distinct()
            .cache())
    dfreq = (tok.groupBy("term")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= _IDX_MAX_DF))
    return (tok.join(F.broadcast(dfreq), "term")
               .groupBy("term", "df")
               .agg(F.expr(
                   "listagg(CAST(doc_id AS STRING), ',')"
                   " WITHIN GROUP (ORDER BY doc_id)")
                   .alias("postings")))


# ---------------------------------------------------------------------------
# Theta sketches: set algebra over distinct counts (Spark 4.1)
# ---------------------------------------------------------------------------

@query("agg_theta_sketch_setops", oracle="""
WITH p AS (SELECT DISTINCT date_trunc('week', ts) AS week, user_id
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT DISTINCT date_trunc('week', ts) AS week, user_id
      FROM events WHERE event_type = 'click'),
m AS (SELECT DISTINCT week FROM (SELECT week FROM p
                                 UNION ALL SELECT week FROM c) u)
SELECT m.week,
       CAST((SELECT COUNT(*) FROM p WHERE p.week = m.week) AS BIGINT)
         AS n_purchase,
       CAST((SELECT COUNT(*) FROM c WHERE c.week = m.week) AS BIGINT)
         AS n_click,
       CAST((SELECT COUNT(*) FROM p JOIN c ON p.user_id = c.user_id
             AND p.week = m.week AND c.week = m.week) AS BIGINT)
         AS n_both,
       CAST((SELECT COUNT(*) FROM p WHERE p.week = m.week
             AND NOT EXISTS (SELECT 1 FROM c WHERE c.week = m.week
                             AND c.user_id = p.user_id)) AS BIGINT)
         AS n_only_purchase
FROM m
""")
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA SKETCHES (Datasketches, Spark 4.1): SET ALGEBRA over
    distinct counts — the capability HLL fundamentally lacks: HLL
    merges are UNION-only, theta supports INTERSECTION and DIFFERENCE
    ("users who purchased AND clicked this week") on mergeable
    pre-aggregated state. One sketch per (week, type), then
    theta_intersection / theta_difference between the pair — the
    nightly-rollup answer to audience-overlap questions that would
    otherwise need a re-shuffle of raw events. At fixture scale the
    sketches sit below their k=4096 sampling threshold, so estimates
    are EXACT integers and the op carries a full SQL oracle; beyond
    the threshold the same plan returns ±2% estimates (the 100 TB
    trade, documented not hidden)."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts").alias("week")
    sk = (ev.filter(F.col("event_type").isin("purchase", "click"))
            .groupBy(week, "event_type")
            .agg(F.expr("theta_sketch_agg(user_id)").alias("s")))
    p = sk.filter(F.col("event_type") == "purchase") \
          .select(F.col("week").alias("wp"), F.col("s").alias("sp"))
    c = sk.filter(F.col("event_type") == "click") \
          .select(F.col("week").alias("wc"), F.col("s").alias("sc"))
    j = p.join(c, p.wp == c.wc, "full_outer")
    est = lambda e: F.round(e).cast("long")  # noqa: E731
    return j.select(
        F.coalesce("wp", "wc").alias("week"),
        F.coalesce(est(F.expr("theta_sketch_estimate(sp)")), F.lit(0))
         .alias("n_purchase"),
        F.coalesce(est(F.expr("theta_sketch_estimate(sc)")), F.lit(0))
         .alias("n_click"),
        F.coalesce(est(F.expr(
            "theta_sketch_estimate(theta_intersection(sp, sc))")),
            F.lit(0)).alias("n_both"),
        F.coalesce(est(F.expr(
            "theta_sketch_estimate(theta_difference(sp, sc))")),
            est(F.expr("theta_sketch_estimate(sp)")), F.lit(0))
         .alias("n_only_purchase"))


# ---------------------------------------------------------------------------
# KLL quantile sketches: daily partials → monthly merged percentiles
# ---------------------------------------------------------------------------

def kll_weekly_estimates(f: DataFrame) -> DataFrame:
    """LIBRARY SURFACE: daily KLL sketches merged per week → raw
    (week, n_days, p50_est, p90_est, sk_n). The registered
    rollup_kll_quantile_merge wraps this in the oracle-checkable
    bound eval; tests read the estimates directly."""
    daily = (f.groupBy(F.date_trunc("day", "ts").alias("day"))
              .agg(F.expr("kll_sketch_agg_double(value)").alias("sk"))
              .withColumn("week", F.date_trunc("week", "day")))
    return (daily.groupBy("week")
                 .agg(F.expr("kll_merge_agg_double(sk)").alias("msk"),
                      F.count(F.lit(1)).alias("n_days"))
                 .select(
                     "week", "n_days",
                     F.expr("kll_sketch_get_quantile_double(msk, 0.5)")
                      .alias("p50_est"),
                     F.expr("kll_sketch_get_quantile_double(msk, 0.9)")
                      .alias("p90_est"),
                     F.expr("kll_sketch_get_n_double(msk)")
                      .cast("long").alias("sk_n")))


@query("rollup_kll_quantile_merge", oracle="""
WITH f AS (
  SELECT date_trunc('week', date_trunc('day', ts)) AS week, value
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
d AS (
  SELECT date_trunc('week', date_trunc('day', ts)) AS week,
         CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1),
h AS (SELECT week, value, CAST(COUNT(*) AS BIGINT) AS c
      FROM f GROUP BY week, value),
r AS (SELECT week, value,
             SUM(c) OVER (PARTITION BY week ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             SUM(c) OVER (PARTITION BY week) AS n
      FROM h),
k AS (SELECT week, value, CAST(cum AS BIGINT) AS cum,
             CAST(n AS BIGINT) AS n,
             GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT)
                          - CAST(CEIL(0.05 * n) AS BIGINT) - 3) AS k50l,
             LEAST(n, CAST(CEIL(0.5 * n) AS BIGINT)
                       + CAST(CEIL(0.05 * n) AS BIGINT) + 3) AS k50h,
             GREATEST(1, CAST(CEIL(0.9 * n) AS BIGINT)
                          - CAST(CEIL(0.05 * n) AS BIGINT) - 3) AS k90l,
             LEAST(n, CAST(CEIL(0.9 * n) AS BIGINT)
                       + CAST(CEIL(0.05 * n) AS BIGINT) + 3) AS k90h
      FROM r),
w AS (
  SELECT week, MAX(n) AS n_values,
         MIN(CASE WHEN cum >= k50l THEN value END) AS p50_lo,
         MIN(CASE WHEN cum >= k50h THEN value END) AS p50_hi,
         MIN(CASE WHEN cum >= k90l THEN value END) AS p90_lo,
         MIN(CASE WHEN cum >= k90h THEN value END) AS p90_hi
  FROM k GROUP BY week)
SELECT CAST(w.week AS TIMESTAMP) AS week, d.n_days, w.n_values,
       w.p50_lo, w.p50_hi, w.p90_lo, w.p90_hi,
       w.p50_lo <= w.p50_hi AS p50_within_bound,
       w.p90_lo <= w.p90_hi AS p90_within_bound,
       TRUE AS sketch_n_exact
FROM w JOIN d USING (week)
""")
def rollup_kll_quantile_merge(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """KLL QUANTILE SKETCHES (Datasketches, Spark 4.1): build one
    sketch per DAY, merge the daily partials per WEEK, read p50/p90
    off the merged sketch — the mergeable-percentile contract that
    makes daily precomputation of latency/value distributions sound
    (exact percentiles cannot be merged; t-digest/KLL exist precisely
    for this). Same precompute-once/roll-up-anywhere family as
    agg_hll_sketch_merge (distinct counts) and
    agg_incremental_state_merge (moments) — KLL completes the trio
    with QUANTILES. Upgraded from rows-only to a BOUND EVAL with a
    full SQL oracle (round 9, agg_percentile_approx pattern): the
    sketch ESTIMATES carry sampled-compaction rank error (nominal
    ~1.65% at k=200, 99% confidence [PK — Karnin-Lang-Liberty 2016])
    so no SQL recomputes them, but three claims are hash-checkable —
    the merged sketch's n is EXACTLY the week's row count (KLL counts
    every update; merging adds counts), and each estimate is a value
    whose rank error stays within a 5% window (3× the nominal 99%
    bound — the sub-gaussian tail puts a violation at ≈0 probability;
    slack +3 ranks covers the discrete edge). The oracle re-derives
    the rank-window edges as exact order statistics (unrounded element
    picks, both engines identical) and the booleans as the same claims
    applied to the windows themselves. Merge-vs-rebuild agreement and
    point accuracy stay pinned in tests."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    merged = kll_weekly_estimates(f)
    wk = W.partitionBy("week")
    h = (f.select(
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week"),
            "value")
          .groupBy("week", "value").agg(F.count(F.lit(1)).alias("c")))
    # exact order statistics off the per-VALUE histogram (2-dp values
    # → bounded distinct set) — no raw-row sort, round-9 rank trick
    r = h.select(
        "week", "value",
        F.sum("c").over(wk.orderBy("value")
                          .rowsBetween(W.unboundedPreceding,
                                       W.currentRow)).alias("cum"),
        F.sum("c").over(wk).alias("n"))
    slack = F.ceil(0.05 * F.col("n")) + 3

    def pick(p: float, lo: bool, name: str):
        kk = F.ceil(F.lit(p) * F.col("n")) + (-slack if lo else slack)
        kk = F.greatest(F.lit(1).cast("long"),
                        F.least(F.col("n"), kk))
        return F.min(F.when(F.col("cum") >= kk, F.col("value"))) \
            .alias(name)

    bounds = r.groupBy("week").agg(
        F.max("n").alias("n_values"),
        pick(0.5, True, "p50_lo"), pick(0.5, False, "p50_hi"),
        pick(0.9, True, "p90_lo"), pick(0.9, False, "p90_hi"))
    return (bounds.join(F.broadcast(merged), "week")
            .select(
                "week", "n_days", "n_values",
                "p50_lo", "p50_hi", "p90_lo", "p90_hi",
                ((F.col("p50_est") >= F.col("p50_lo"))
                 & (F.col("p50_est") <= F.col("p50_hi")))
                .alias("p50_within_bound"),
                ((F.col("p90_est") >= F.col("p90_lo"))
                 & (F.col("p90_est") <= F.col("p90_hi")))
                .alias("p90_within_bound"),
                (F.col("sk_n") == F.col("n_values"))
                .alias("sketch_n_exact")))


# ---------------------------------------------------------------------------
# End-to-end events analytics composite (the analytics-side flagship)
# ---------------------------------------------------------------------------

_AP_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@query("analytics_pipeline_full", oracle=f"""
WITH clean AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
flagged AS (
  SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                   OR us - LAG(us) OVER w > {_AP_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM clean
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
              ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id,
         CAST(date_trunc('day', MIN(ts)) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM sess GROUP BY user_id, session_id)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT)
         AS conversion_ppm,
       CAST(quantile_disc(duration_us, 0.9) AS BIGINT) AS p90_duration_us
FROM per_session GROUP BY day
""")
def analytics_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END EVENTS ANALYTICS COMPOSITE — the analytics-side
    flagship next to hrv_pipeline_full (signals) and
    llm_prep_pipeline_full (corpus): clean → sessionize (lag→flag→
    cumsum, 30-min gap) → per-session stats with a conversion flag →
    per-DAY dashboard KPIs (sessions, uniques, events, conversions,
    conversion rate in integer PPM, p90 session duration) in ONE
    plan. Stage sharing is the point at 100 TB: both windows and the
    session aggregate share the single user_id partitioning (one
    exchange for three stages — the sessionize_timeout plan shape),
    and only the final day rollup re-shuffles, on a key with ~365
    groups/year. Time arithmetic in integer µs; the exact p90 uses
    percentile_disc (a VALUE from the data, hash-exact) not _cont
    interpolation."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    clean = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .select("user_id", "ts", "event_id", "event_type",
                       us.alias("us")))
    flagged = clean.withColumn(
        "new_s",
        F.when(F.lag("us").over(w).isNull()
               | ((F.col("us") - F.lag("us").over(w)) > _AP_GAP_US), 1)
         .otherwise(0))
    wc = (W.partitionBy("user_id").orderBy("us", "event_id")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    sess = flagged.withColumn(
        "session_id", F.sum("new_s").over(wc).cast("long"))
    per_session = (sess.groupBy("user_id", "session_id")
                       .agg(F.date_trunc("day", F.min("ts")).cast("date")
                             .alias("day"),
                            F.count(F.lit(1)).alias("n_events"),
                            (F.max("us") - F.min("us"))
                             .alias("duration_us"),
                            F.max(F.when(
                                F.col("event_type") == "purchase", 1)
                                .otherwise(0)).alias("converted")))
    return (per_session.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum("n_events").alias("n_events"),
                 F.sum("converted").alias("n_converted"),
                 F.expr("BIGINT(SUM(converted) * 1000000 div COUNT(*))")
                  .alias("conversion_ppm"),
                 F.expr("percentile_disc(0.9) WITHIN GROUP"
                        " (ORDER BY duration_us)").cast("long")
                  .alias("p90_duration_us")))


# ---------------------------------------------------------------------------
# Rolling min/max envelope + breakout flags (Donchian channel)
# ---------------------------------------------------------------------------

@query("win_rolling_envelope", oracle="""
WITH e AS (
  SELECT event_id, user_id, value, ts
  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
SELECT event_id,
       MIN(value) OVER w AS env_lo,
       MAX(value) OVER w AS env_hi,
       COALESCE(CAST(value > MAX(value) OVER w AS BOOLEAN), false)
         AS breakout_hi,
       COALESCE(CAST(value < MIN(value) OVER w AS BOOLEAN), false)
         AS breakout_lo
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
""")
def win_rolling_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING MIN/MAX ENVELOPE with breakout flags (the Donchian
    channel / new-high detector): per event, the 50-observation PRIOR
    envelope and whether the current value breaks it. The frame ends
    at 1 PRECEDING — the current value must not be inside its own
    envelope or every point trivially 'touches' the band (the same
    strictly-prior discipline as the label family's leakage frames).
    min/max are order-statistics — no float accumulation at all, so
    the envelope is hash-exact; first rows have NULL envelopes (no
    history yet) and their flags COALESCE to false (the registry's
    nullable-boolean house rule — Spark None vs DuckDB NaN
    canonicalize differently). Contrast with
    win_drawdown's unbounded running peak: this one FORGETS, which is
    what makes it a regime detector. One user shuffle."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-50, -1))
    lo, hi = F.min("value").over(w), F.max("value").over(w)
    return e.select(
        "event_id", lo.alias("env_lo"), hi.alias("env_hi"),
        F.coalesce(F.col("value") > hi, F.lit(False))
         .alias("breakout_hi"),
        F.coalesce(F.col("value") < lo, F.lit(False))
         .alias("breakout_lo"))


# ---------------------------------------------------------------------------
# Within-document segment dedup (page-local boilerplate removal)
# ---------------------------------------------------------------------------

@query("dedup_segments_within_doc", oracle=f"""
WITH segs AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS seg_idx,
         array_to_string(string_split(text, ' ')
           [u.i * 20 + 1 : u.i * 20 + 20], ' ') AS seg
  FROM documents,
       UNNEST(generate_series(0,
         CAST(CEIL(len(string_split(text, ' ')) / 20.0) AS INT) - 1))
         AS u(i)),
first_occ AS (
  SELECT doc_id, seg_idx, seg,
         ROW_NUMBER() OVER (PARTITION BY doc_id, seg
                            ORDER BY seg_idx) AS occ
  FROM segs WHERE seg <> '')
SELECT doc_id,
       string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM first_occ WHERE occ = 1
GROUP BY doc_id
""")
def dedup_segments_within_doc(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """WITHIN-DOCUMENT segment dedup — the page-LOCAL cleaning step
    (repeated nav blocks, duplicated paragraphs inside one page) that
    text_segment_dedup's corpus-wide pass deliberately does not do:
    split into 20-token segments, keep each segment's FIRST occurrence
    within its own document, reassemble in original order. All
    grouping keys carry doc_id, so the shuffle is (doc, segment) —
    embarrassingly parallel across documents, no cross-document state
    at any scale. Reassembly via ordered listagg (the house ordered-
    aggregation rule); n_kept vs original segment count measures the
    within-page redundancy."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    nseg = F.ceil(F.size(toks) / F.lit(20.0)).cast("int")
    segs = (d.select("doc_id", toks.alias("toks"), nseg.alias("n"))
             .select("doc_id",
                     F.explode(F.sequence(F.lit(0), F.col("n") - 1))
                      .alias("seg_idx"))
             .join(d.select("doc_id", toks.alias("toks")), "doc_id")
             .select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"),
                     F.concat_ws(" ", F.slice(
                         "toks", F.col("seg_idx") * 20 + 1, 20))
                      .alias("seg"))
             .filter(F.col("seg") != ""))
    w = W.partitionBy("doc_id", "seg").orderBy("seg_idx")
    first = (segs.withColumn("occ", F.row_number().over(w))
                 .filter(F.col("occ") == 1))
    return (first.groupBy("doc_id")
                 .agg(F.expr("listagg(seg, ' ') WITHIN GROUP"
                             " (ORDER BY seg_idx)").alias("dedup_text"),
                      F.count(F.lit(1)).alias("n_kept")))
