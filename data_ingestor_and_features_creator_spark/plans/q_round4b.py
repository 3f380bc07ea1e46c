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
# Shard-balance audit (hash sharding + skew report)
# ---------------------------------------------------------------------------

_N_SHARDS = 8


@query("data_shard_balance_audit", oracle=f"""
WITH sh AS (
  SELECT (doc_id * 2654435761 % 4294967296) % {_N_SHARDS} AS shard,
         n_chars
  FROM documents)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM sh GROUP BY shard
""")
def data_shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARD-BALANCE AUDIT: assign documents to training shards by the
    portable Knuth-multiplicative hash (the same RNG-free gate family
    as data_split_hash — scan-parallel, no global sort, reproducible
    across engines and runs) and report per-shard document and
    character totals — the job you run at 100 TB BEFORE kicking off a
    1000-GPU read to know no shard is a straggler. Hash sharding makes
    size balance statistical rather than exact (a size-rank round-robin
    would balance exactly but needs a global row_number — a single
    partition bottleneck); the audit quantifies the spread so the
    trade-off is measured, not assumed. One scan, one 8-group agg."""
    d = load_table(spark, sf_dir, "documents")
    shard = ((F.col("doc_id") * F.lit(2654435761).cast("long"))
             % F.lit(4294967296).cast("long")) % _N_SHARDS
    return (d.select(shard.alias("shard"), "n_chars")
             .groupBy("shard")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("total_chars"),
                  F.min("n_chars").alias("min_chars"),
                  F.max("n_chars").alias("max_chars")))


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
# Text-lines source (spark.read.text)
# ---------------------------------------------------------------------------

import os as _os

_DERIVED = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))),
    "testdata_derived",
)
_DOCS_TXT = _os.path.join(_DERIVED, "docs_sample.txt")


@query("scan_text_lines", oracle=f"""
SELECT doc_id, text, CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM read_csv('{_DOCS_TXT}', delim=chr(9), header=false, quote='',
              columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR'}})
""")
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXT-LINES source (§2.1 family, completing the format set next
    to parquet/csv/json/orc/xml/binary): `spark.read.text` — the
    line-per-record reader every crawl/log pipeline starts from —
    with record parsing (id TAB text) done as codegen expressions
    AFTER the scan, the split-the-line-yourself contract raw text
    implies. At 100 TB text files split by line ranges across tasks
    exactly like any other splittable source. The committed
    tab-separated sample mirrors the sf0.001 documents table.
    Malformed-line behavior: a line with no TAB is DROPPED (the
    instr guard below), and the id parse is try_cast so a non-numeric
    head yields NULL instead of an ANSI fault — raw crawl text always
    contains garbage lines and a scan op must not abort on them."""
    lines = spark.read.text(_DOCS_TXT)
    tab = F.instr("value", "\t")
    return (lines.filter(tab > 0)
        .select(
            F.expr("try_cast(substring_index(value, '\t', 1) AS LONG)")
             .alias("doc_id"),
            F.expr("substring(value, instr(value, '\t') + 1)")
             .alias("text"))
        .withColumn("n_chars", F.length("text").cast("long")))


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
    ev = load_table(spark, sf_dir, "events")
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


@query("vec_pca_power_iteration")  # rows-only: iterative, no SQL twin
def vec_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA TOP COMPONENT of the embedding corpus — the whitening/
    dimensionality step before clustering or ANN: (1) DISTRIBUTED
    gramian — every partition emits one partial (Σxxᵀ, Σx, n) row via
    an Arrow kernel (numpy outer-product accumulate; shuffle volume is
    partitions·d², never rows·d² — the d=64 explode alternative would
    fan 4096× per row), partials combined by a d²-group sum; (2) the
    d×d covariance is assembled DRIVER-SIDE (it is sketch-sized — 32
    KB — the same legitimate driver reduction as sim_ivf_ann's KMeans
    centroids) and power-iterated a fixed {it} rounds from the
    deterministic all-ones start, sign-canonicalized on the largest
    component; (3) the loadings return as a 64-row DataFrame. Verified
    against numpy.linalg.eigh in tests; rows-only for the driver
    (fixed-point iteration has no SQL twin).""".format(it=_PCA_ITERS)
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    parts = (emb.select("embedding")
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
    total_var = float(np.trace(cov))
    rows = [(i, round(float(v[i]), 6), round(lam, 6),
             round(lam / total_var, 6)) for i in range(d)]
    return spark.createDataFrame(
        rows, "component long, loading double, eigenvalue double, "
              "explained_ratio double")


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
# Join-key skew pre-flight audit
# ---------------------------------------------------------------------------

@query("audit_join_key_skew", oracle="""
WITH kc AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey),
st AS (
  SELECT CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         CAST(quantile_disc(cnt, 0.5) AS BIGINT) AS median_cnt,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM kc),
top AS (
  SELECT k, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, k) AS rk
  FROM kc)
SELECT t.rk, t.k AS hot_key, t.cnt, s.max_cnt, s.median_cnt,
       s.n_keys, s.n_rows
FROM top t, st s WHERE t.rk <= 5
""")
def audit_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW PRE-FLIGHT AUDIT: before shuffling 100 TB on a
    key, measure its distribution — the top-5 hottest keys plus
    (max, median, #keys, #rows) — the numbers that decide between a
    plain shuffle join, AQE skew split, salting (join_salted_skew),
    or a broadcast. 'Measure, don't guess' as an operator: one
    groupBy on the candidate key (the same shuffle the join would do,
    but emitting counts not payloads — ~key-cardinality output), a
    1-row stats aggregate broadcast back, and the top-5 via
    TakeOrderedAndProject (orderBy+limit — distributed partial top-k
    per partition, never a full single-partition sort of the key
    table; the rank window then runs over 5 rows). Median via
    quantile_disc/percentile on the COUNT table (tiny), never the
    raw rows."""
    o = load_table(spark, sf_dir, "orders")
    kc = (o.groupBy(F.col("o_custkey").alias("k"))
           .agg(F.count(F.lit(1)).alias("cnt"))
           .cache())
    st = kc.agg(F.max("cnt").alias("max_cnt"),
                F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)")
                 .cast("long").alias("median_cnt"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("cnt").alias("n_rows"))
    top5 = kc.orderBy(F.desc("cnt"), "k").limit(5)
    top = top5.withColumn("rk", F.row_number().over(
        W.orderBy(F.desc("cnt"), "k")))
    return (top.crossJoin(F.broadcast(st))
               .select("rk", F.col("k").alias("hot_key"), "cnt",
                       "max_cnt", "median_cnt", "n_keys", "n_rows"))


# ---------------------------------------------------------------------------
# Timezone-aware day bucketing (UTC vs local-civil-day divergence)
# ---------------------------------------------------------------------------

_TZ = "America/New_York"


@query("date_tz_bucket", oracle=f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS utc_day,
       CAST(CAST(timezone('{_TZ}', timezone('UTC', ts)) AS DATE) AS VARCHAR) AS local_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN CAST(ts AS DATE)
                      <> CAST(timezone('{_TZ}', timezone('UTC', ts)) AS DATE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_shifted
FROM events
GROUP BY 1, 2
""")
def date_tz_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMEZONE-AWARE DAY BUCKETING: the same instants bucketed by UTC
    calendar day AND by {tz} civil day, with the count of events whose
    day label DIFFERS — the late-evening rows every UTC-bucketed
    dashboard silently misfiles (and the DST boundary moves twice a
    year). Spark: `convert_timezone` (session tz is pinned UTC by
    session.py, so naive ts ≡ UTC instant); DuckDB: the double
    conversion `timezone(tz, timezone('UTC', ts))` — naive-as-UTC →
    instant → tz-local — which is session-TimeZone independent
    (single-argument timezone() goes the OTHER direction). Both resolve through the IANA tzdata — the oracle proves
    the two engines' tz databases agree on every fixture instant,
    which is exactly the review question this op exists to answer.
    One scan, one grouped agg; the tz conversion is a pure per-row
    expression (no shuffle implications at any scale).""".format(tz=_TZ)
    ev = load_table(spark, sf_dir, "events")
    local = F.convert_timezone(F.lit("UTC"), F.lit(_TZ), F.col("ts"))
    utc_day = F.col("ts").cast("date")
    local_day = local.cast("date")
    return (ev.groupBy(utc_day.cast("string").alias("utc_day"),
                       local_day.cast("string").alias("local_day"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.when(utc_day != local_day, 1).otherwise(0))
                    .alias("n_shifted")))


# ---------------------------------------------------------------------------
# JSONL source with corrupt-record tolerance (PERMISSIVE mode)
# ---------------------------------------------------------------------------

_EVENTS_JSONL = _os.path.join(_DERIVED, "events_sample.jsonl")


@query("scan_jsonl_corrupt", oracle=f"""
WITH raw AS (
  SELECT * FROM read_json('{_EVENTS_JSONL}',
    format='newline_delimited', ignore_errors=true,
    columns={{'event_id': 'BIGINT', 'user_id': 'BIGINT',
              'event_type': 'VARCHAR', 'value': 'DOUBLE'}})),
parsed AS (SELECT * FROM raw WHERE event_type IS NOT NULL)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_ok,
       CAST((SELECT COUNT(*) FROM raw)
            - (SELECT COUNT(*) FROM parsed) AS BIGINT) AS n_corrupt
FROM parsed GROUP BY event_type
""")
def scan_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL SOURCE WITH CORRUPT-RECORD TOLERANCE: real feeds carry
    malformed lines, and the production posture is PERMISSIVE — parse
    what parses, ROUTE the rest to `_corrupt_record`, and ACCOUNT for
    it (silently dropping is how pipelines lose data without noticing;
    DROPMALFORMED is exactly that). The committed fixture plants 4
    corrupt lines in 200; the op emits per-type counts of good rows
    plus the corrupt total carried on every row — the oracle twin
    derives the same count from DuckDB's ignore_errors behavior
    (NULL-filled salvage rows — no corrupt-record column there, which
    is the point: the number is engine-independent). At scale the JSON parse is per-line
    splittable like any text source."""
    schema = ("event_id long, user_id long, event_type string, "
              "value double, _corrupt_record string")
    raw = (spark.read.schema(schema)
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt_record")
                .json(_EVENTS_JSONL)
                .cache())
    bad = raw.filter(F.col("_corrupt_record").isNotNull()) \
             .agg(F.count(F.lit(1)).alias("n_corrupt"))
    ok = (raw.filter(F.col("_corrupt_record").isNull())
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_ok")))
    return (ok.crossJoin(F.broadcast(bad))
              .select("event_type", "n_ok", "n_corrupt"))


# ---------------------------------------------------------------------------
# Boolean aggregate family (every / any / count_if)
# ---------------------------------------------------------------------------

@query("agg_boolean_funcs", oracle="""
SELECT event_type,
       COALESCE(bool_and(value > 10.0), false) AS all_over_10,
       COALESCE(bool_or(value > 400.0), false) AS any_over_400,
       CAST(count_if(value > 100.0) AS BIGINT) AS n_over_100,
       CAST(count_if(value IS NULL OR isnan(value)) AS BIGINT) AS n_missing
FROM events GROUP BY event_type
""")
def agg_boolean_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOLEAN AGGREGATE family — every/bool_and, any/bool_or,
    count_if — completing §2.4 next to the numeric aggregates: the
    assertion-style rollups data-quality checks are written in
    ("every reading positive?", "any outlier?", "how many missing?").
    NULL semantics pinned: bool_and/bool_or over an all-NULL group
    yields NULL on both engines → COALESCE false (registry house rule
    for nullable booleans); NaN counts as missing explicitly since
    NaN > x is false, not NULL, in both engines. Single hash
    aggregate, map-side partials, JVM-only."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return (ev.groupBy("event_type")
              .agg(F.coalesce(F.every(v > 10.0), F.lit(False))
                    .alias("all_over_10"),
                   F.coalesce(F.some(v > 400.0), F.lit(False))
                    .alias("any_over_400"),
                   F.count_if(v > 100.0).alias("n_over_100"),
                   F.count_if(v.isNull() | F.isnan(v)).alias("n_missing")))


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
# One-row corpus quality scorecard
# ---------------------------------------------------------------------------

@query("data_quality_scorecard", oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       {dsum_sql('CAST(n_chars AS DOUBLE)')} AS total_chars,
       CAST(count_if(n_chars < 100) AS BIGINT) AS n_short,
       CAST(count_if(length(text) <> n_chars) AS BIGINT)
         AS n_len_mismatch,
       CAST(count_if(text LIKE '% % % %') AS BIGINT) AS n_multiword
FROM documents
""")
def data_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW CORPUS SCORECARD — the first query run on any new data
    drop: row/source/language counts, length extremes and total, the
    short-doc count, an INTERNAL-CONSISTENCY check (does the recorded
    n_chars match length(text)? — metadata drift is how stale
    re-crawls sneak in), and a structural sanity count. ONE aggregate
    pass, map-side partials for everything except the two exact
    distincts (which Spark expands to partial-distinct aggregates —
    still one logical pass, no window, no join). The profile_table op
    is the per-column generalization; this is the per-corpus gate."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        dsum(F.col("n_chars").cast("double")).alias("total_chars"),
        F.count_if(F.col("n_chars") < 100).alias("n_short"),
        F.count_if(F.length("text") != F.col("n_chars"))
         .alias("n_len_mismatch"),
        F.count_if(F.col("text").like("% % % %")).alias("n_multiword"))


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
# SQL DML surface: CREATE TABLE / INSERT INTO / INSERT OVERWRITE
# ---------------------------------------------------------------------------

from .registry import scratch_dir as _scratch_dir


@query("sql_insert_dml", oracle=f"""
WITH base AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('value')} AS total
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type),
extra AS (
  SELECT 'synthetic' AS event_type, CAST(1 AS BIGINT) AS n,
         CAST(42.5 AS DOUBLE) AS total)
SELECT * FROM base UNION ALL SELECT * FROM extra
""")
def sql_insert_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML ROUND TRIP — CREATE TABLE (parquet, external location)
    → INSERT INTO … SELECT (the aggregate) → a second INSERT INTO
    (literal VALUES row) → read back: the statement surface an
    engine's SQL users actually type, distinct from the DataFrame
    writer API the sink_* ops exercise. INSERT INTO appends files
    atomically per statement; the oracle reproduces the final table
    state as agg UNION literal. The scratch location is session-
    scoped (house rule from the round-3 tmp-leak fix); the table is
    DROPped and re-CREATEd per invocation so reruns are idempotent."""
    loc = _scratch_dir("sql_dml_tbl")
    spark.sql("DROP TABLE IF EXISTS dml_event_stats")
    spark.sql(f"""
        CREATE TABLE dml_event_stats
        (event_type STRING, n BIGINT, total DOUBLE)
        USING parquet LOCATION '{loc}'""")
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__dml_events")
    spark.sql(f"""
        INSERT INTO dml_event_stats
        SELECT event_type, COUNT(*) AS n,
               {{dsum}} AS total
        FROM __dml_events
        WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY event_type""".format(
        dsum="CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE)"))
    spark.sql("INSERT INTO dml_event_stats "
              "VALUES ('synthetic', 1, 42.5)")
    return spark.table("dml_event_stats")


# ---------------------------------------------------------------------------
# SQL join hints (BROADCAST / MERGE) honored by the planner
# ---------------------------------------------------------------------------

@query("sql_join_hints", oracle=f"""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
       {dsum_sql('c_acctbal')} AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL JOIN HINTS: the /*+ BROADCAST(dim) */ hint spelled in SQL
    text — the tuning surface SQL users reach for when the planner's
    statistics mis-size a side (DataFrame users call F.broadcast; both
    land on the same ResolvedHint node). The hint is semantically
    neutral — the oracle is the plain join — and the plan-shape test
    asserts the hint actually produced a BroadcastHashJoin, which is
    the point: hints must be HONORED, not parsed and dropped."""
    load_table(spark, sf_dir, "customer") \
        .createOrReplaceTempView("__hint_customer")
    load_table(spark, sf_dir, "nation") \
        .createOrReplaceTempView("__hint_nation")
    return spark.sql("""
        SELECT /*+ BROADCAST(n) */ n_name,
               COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,12))) AS DOUBLE)
                 AS total_bal
        FROM __hint_customer c JOIN __hint_nation n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY n_name""")


# ---------------------------------------------------------------------------
# SQL-standard LISTAGG (ordered string aggregation) + GROUP BY ALL
# ---------------------------------------------------------------------------

@query("agg_listagg_ordered", oracle="""
SELECT event_type,
       string_agg(DISTINCT CAST(user_id % 10 AS VARCHAR), ','
                  ORDER BY CAST(user_id % 10 AS VARCHAR)) AS cohorts,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""")
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard LISTAGG WITHIN GROUP (ORDER BY …) — ordered,
    DISTINCT string aggregation (Spark 4's listagg ≡ DuckDB's
    string_agg ORDER BY): the report-formatting aggregate analysts
    reach for constantly, and a determinism trap — WITHOUT the WITHIN
    GROUP order the concatenation is partition-order-dependent and
    can never hash-match, which is why the house rule is 'no unordered
    listagg, ever' (agg_collect pins the same rule for array_agg).
    Also exercises GROUP BY ALL, the Spark-4 dialect sugar. The
    DISTINCT cohort domain is 10 strings/group — the result stays
    row-sized however large the input."""
    load_table(spark, sf_dir, "events") \
        .createOrReplaceTempView("__listagg_events")
    return spark.sql("""
        SELECT event_type,
               listagg(DISTINCT CAST(user_id % 10 AS STRING), ',')
                 WITHIN GROUP (ORDER BY CAST(user_id % 10 AS STRING))
                 AS cohorts,
               COUNT(*) AS n
        FROM __listagg_events GROUP BY ALL""")


# ---------------------------------------------------------------------------
# SQL PIVOT / UNPIVOT dialect round trip
# ---------------------------------------------------------------------------

@query("sql_pivot_unpivot", oracle=f"""
WITH base AS (
  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS INTEGER) % 4
           AS hour_band, value
  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
SELECT event_type,
       CAST(hour_band AS INTEGER) AS hour_band,
       {dsum_sql('value')} AS total
FROM base
WHERE hour_band IN (0, 1, 2, 3)
GROUP BY event_type, hour_band
""")
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT → UNPIVOT ROUND TRIP — the DIALECT forms (distinct
    from the DataFrame API ops agg_pivot / unpivot_melt): PIVOT turns
    the hour-band dimension into 4 columns (one hash aggregate with
    the pivot values compiled into conditional aggregates — no extra
    shuffle vs GROUP BY), UNPIVOT folds them back to long form via an
    Expand node. The round trip must land exactly on the plain
    GROUP BY result — which is the oracle — proving the two dialect
    constructs are lossless inverses (NULL cells from empty
    combinations are dropped by UNPIVOT's default INCLUDE NULLS=off,
    matching the GROUP BY's absent groups)."""
    load_table(spark, sf_dir, "events") \
        .createOrReplaceTempView("__pivot_events")
    return spark.sql("""
        WITH base AS (
          SELECT event_type, CAST(hour(ts) AS INT) % 4 AS hour_band,
                 value
          FROM __pivot_events
          WHERE value IS NOT NULL AND NOT isnan(value)),
        p AS (
          SELECT * FROM base
          PIVOT (CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
                 FOR hour_band IN (0 AS h0, 1 AS h1, 2 AS h2, 3 AS h3))),
        u AS (
          SELECT event_type, band, total
          FROM p UNPIVOT (total FOR band IN (h0, h1, h2, h3)))
        SELECT event_type,
               CAST(substring(band, 2) AS INT) AS hour_band, total
        FROM u""")


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

@query("rollup_kll_quantile_merge")  # rows-only: sketch estimates
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
    with QUANTILES. Rows-only: KLL compaction is sampled, so
    estimates carry rank error (bounded ~1.65% at k=200) — accuracy
    and merge-vs-rebuild agreement are pinned in tests, not by the
    hash oracle."""
    ev = load_table(spark, sf_dir, "events")
    ok = F.col("value").isNotNull() & ~F.isnan("value")
    daily = (ev.filter(ok)
               .groupBy(F.date_trunc("day", "ts").alias("day"))
               .agg(F.expr("kll_sketch_agg_double(value)").alias("sk"))
               .withColumn("week", F.date_trunc("week", "day")))
    return (daily.groupBy("week")
                 .agg(F.expr("kll_merge_agg_double(sk)").alias("msk"),
                      F.count(F.lit(1)).alias("n_days"))
                 .select(
                     "week", "n_days",
                     F.round(F.expr(
                         "kll_sketch_get_quantile_double(msk, 0.5)"), 6)
                      .alias("p50"),
                     F.round(F.expr(
                         "kll_sketch_get_quantile_double(msk, 0.9)"), 6)
                      .alias("p90"),
                     F.expr("kll_sketch_get_n_double(msk)")
                      .cast("long").alias("n_values")))


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
# AES column encryption round trip (governance surface)
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"  # demo key: 16-byte AES-128


@query("crypto_aes_roundtrip", oracle="""
SELECT event_id, CAST(user_id AS VARCHAR) AS plain
FROM events WHERE event_id < 1000
""")
def crypto_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES COLUMN ENCRYPTION round trip — the governance surface for
    at-rest column protection: aes_encrypt the user id (ECB mode —
    chosen here because it is DETERMINISTIC, which is what makes the
    round trip oracle-checkable; production uses GCM, whose random IV
    is exactly why ciphertext columns can never be hash-compared),
    then aes_decrypt back and return the plaintext. The oracle is the
    identity projection — decrypt(encrypt(x)) ≡ x is the whole
    contract. DuckDB has no AES, which is fine: the ciphertext never
    appears in a compared column."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    enc = F.expr(f"aes_encrypt(CAST(user_id AS STRING), '{_AES_KEY}', 'ECB')")
    dec = F.expr(f"CAST(aes_decrypt(cipher, '{_AES_KEY}', 'ECB') AS STRING)")
    return (ev.select("event_id", enc.alias("cipher"))
              .select("event_id", dec.alias("plain")))


# ---------------------------------------------------------------------------
# Bitwise aggregate family
# ---------------------------------------------------------------------------

@query("agg_bitwise_funcs", oracle="""
SELECT event_type,
       CAST(bit_and(user_id) AS BIGINT) AS band,
       CAST(bit_or(user_id) AS BIGINT) AS bor,
       CAST(bit_xor(user_id) AS BIGINT) AS bxor
FROM events GROUP BY event_type
""")
def agg_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITWISE AGGREGATES (bit_and / bit_or / bit_xor) per group —
    integer-exact, order-independent reductions (each is a
    commutative monoid, so map-side partials are trivially correct):
    the flag-mask rollups permission and feature-flag systems run,
    and the parity check (bit_xor) that detects single-row
    divergence between replicas. Completes §2.4's integer-exact
    corner next to the bitmap distinct ops."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
              .agg(F.bit_and("user_id").alias("band"),
                   F.bit_or("user_id").alias("bor"),
                   F.bit_xor("user_id").alias("bxor")))


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-dedup pre-step; parse_url surface)
# ---------------------------------------------------------------------------

@query("data_url_canonicalize", oracle="""
SELECT doc_id,
       'https://' || LOWER(source) || '.example.com/docs/'
         || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS canonical_url,
       LOWER(source) || '.example.com' AS host
FROM documents
""")
def data_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL CANONICALIZATION — the crawl-dedup pre-step that collapses
    trivially-distinct URLs before any content hashing (mixed-case
    hosts, default ports, fragments, unordered query params account
    for a large share of crawl 'duplicates'): parse_url extracts
    HOST/PATH/QUERY, then lowercase host, drop the :443 default port
    and the fragment, and REORDER query params by key (split →
    array_sort → rejoin — params are semantically a set). Input URLs
    are synthesized from document metadata (the fixture has no URL
    column), which makes the expected canonical form closed-form for
    the oracle. Pure codegen expressions; at scale this is a per-row
    map with zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.upper("source"),
                   F.lit(".Example.COM:443/docs/"),
                   F.col("doc_id").cast("string"),
                   F.lit("?b=2&a=1#frag"))
    u = d.select("doc_id", url.alias("url"))
    host = F.lower(F.regexp_replace(
        F.expr("parse_url(url, 'HOST')"), ":443$", ""))
    path = F.expr("parse_url(url, 'PATH')")
    query = F.expr("parse_url(url, 'QUERY')")
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return u.select(
        "doc_id",
        F.concat(F.lit("https://"), host, path, F.lit("?"), sorted_q)
         .alias("canonical_url"),
        host.alias("host"))


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
# Scalable global index assignment (range partitions + offset broadcast)
# ---------------------------------------------------------------------------

@query("data_global_index", oracle="""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT)
         AS global_idx
FROM documents
""")
def data_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALABLE GLOBAL INDEX ASSIGNMENT — contiguous 0..N-1 ids in
    doc_id order WITHOUT a single-partition window (the naive
    `row_number() OVER (ORDER BY …)` moves the entire table through
    one task — the classic 100 TB faceplant): (1) repartitionByRange
    on the order key (a distributed sort — ranges are ordered ACROSS
    partitions), (2) per-partition counts → a 32-row offset table via
    prefix sum, broadcast back, (3) intra-partition rank + offset =
    global rank. The result is independent of WHERE the range
    boundaries land (sampling jitter moves rows between partitions
    but never changes any row's global rank), which is what makes the
    two-pass construction deterministic and the exact equivalent of
    the oracle's global window. monotonically_increasing_id is the
    non-contiguous fast path; THIS is the contiguous one."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    r = (d.repartitionByRange(n_parts, "doc_id")
          .withColumn("pid", F.spark_partition_id())
          .cache())
    counts = r.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (W.orderBy("pid")
              .rowsBetween(W.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
    w_in = W.partitionBy("pid").orderBy("doc_id")
    return (r.join(F.broadcast(offsets.select("pid", "offset")), "pid")
             .select("doc_id",
                     (F.col("offset") + F.row_number().over(w_in) - 1)
                     .cast("long").alias("global_idx")))


# ---------------------------------------------------------------------------
# Source freshness audit (staleness vs the corpus frontier)
# ---------------------------------------------------------------------------

@query("audit_source_freshness", oracle="""
WITH g AS (SELECT MAX(ts) AS frontier FROM events),
s AS (
  SELECT (user_id % 4) AS feed,
         MAX(ts) AS latest,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY user_id % 4)
SELECT CAST(feed AS BIGINT) AS feed, latest,
       CAST((epoch_us(frontier) - epoch_us(latest)) // 3600000000
            AS BIGINT) AS hours_behind,
       n_rows
FROM s, g
""")
def audit_source_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE FRESHNESS AUDIT — per-feed staleness relative to the
    corpus FRONTIER (the max timestamp anywhere), the first page of
    every ingestion-ops dashboard: a feed whose latest row trails the
    frontier by hours is stuck, and catching it from the DATA beats
    waiting for the pipeline's own alerting. Frontier = 1-row global
    max, broadcast onto the per-feed aggregates (never `now()` — wall
    clock makes results unreproducible and is banned by the house
    determinism rules; lag-vs-frontier is also the metric that stays
    meaningful for backfills). Feeds proxied by user_id % 4 — the
    fixture has one events table; in production this key is the
    ingestion source. Integer hour arithmetic, one scan."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("frontier"))
    s = (ev.groupBy((F.col("user_id") % 4).alias("feed"))
           .agg(F.max("ts").alias("latest"),
                F.count(F.lit(1)).alias("n_rows")))
    hours = (F.unix_micros("frontier") - F.unix_micros("latest")) \
        / F.lit(3_600_000_000)
    return (s.crossJoin(F.broadcast(g))
             .select("feed", "latest",
                     F.floor(hours).cast("long").alias("hours_behind"),
                     "n_rows"))


# ---------------------------------------------------------------------------
# Date-part scalar completion (quarter/week/daynames/make_date)
# ---------------------------------------------------------------------------

@query("date_parts_funcs", oracle="""
SELECT event_id,
       CAST(quarter(ts) AS INTEGER) AS q,
       CAST(weekofyear(ts) AS INTEGER) AS iso_week,
       CAST(dayofyear(ts) AS INTEGER) AS doy,
       substr(dayname(ts), 1, 3) AS day_abbrev,
       substr(monthname(ts), 1, 3) AS month_abbrev,
       CAST(make_date(CAST(EXTRACT(YEAR FROM ts) AS INTEGER),
                      CAST(EXTRACT(MONTH FROM ts) AS INTEGER),
                      CAST(EXTRACT(DAY FROM ts) AS INTEGER)) AS DATE)
         AS rebuilt_date
FROM events WHERE event_id < 2000
""")
def date_parts_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE-PART scalar completion next to date_funcs: quarter,
    ISO weekofyear, dayofyear, day/month names, and a
    make_date(extract…) rebuild proving constructor/extractor are
    inverses. Cross-engine naming pinned the cheap way: Spark's
    dayname/monthname return 3-letter abbreviations, DuckDB full
    names — the oracle takes substr(…, 1, 3), which is the honest
    note that LOCALE-DEPENDENT name functions need normalization
    before any cross-system comparison (same class of trap as
    dayofweek numbering, handled in agg_chi2_independence). Pure
    per-row expressions."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofyear("ts").alias("doy"),
        F.expr("dayname(ts)").alias("day_abbrev"),
        F.expr("monthname(ts)").alias("month_abbrev"),
        F.make_date(F.year("ts"), F.month("ts"), F.dayofmonth("ts"))
         .alias("rebuilt_date"))


# ---------------------------------------------------------------------------
# String pad/format scalar completion
# ---------------------------------------------------------------------------

@query("str_pad_format_funcs", oracle="""
SELECT doc_id,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
       printf('%s|%04d|%s', source, CAST(doc_id AS INTEGER),
              lang) AS record_key,
       repeat(lang, 2) AS lang2,
       reverse(source) AS rsource,
       left(text, 5) AS head5,
       right(text, 5) AS tail5,
       translate(lang, 'en', 'EN') AS lang_up
FROM documents
""")
def str_pad_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING PAD/FORMAT scalar completion next to str_funcs:
    lpad-zero-fill (the fixed-width key every legacy interchange
    format wants), printf-style format_string (Spark) ≡ printf
    (DuckDB) composite keys, repeat/reverse, left/right head-tail
    slicing, and translate character mapping. All pure codegen
    per-row expressions; the printf twin pins that %04d zero-padding
    semantics agree cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.format_string("%s|%04d|%s", F.col("source"),
                        F.col("doc_id").cast("int"), F.col("lang"))
         .alias("record_key"),
        F.repeat("lang", 2).alias("lang2"),
        F.reverse("source").alias("rsource"),
        F.expr("left(text, 5)").alias("head5"),
        F.expr("right(text, 5)").alias("tail5"),
        F.translate("lang", "en", "EN").alias("lang_up"))


# ---------------------------------------------------------------------------
# Array set-operation scalar family
# ---------------------------------------------------------------------------

@query("array_set_funcs", oracle="""
WITH t AS (
  SELECT event_id,
         list_transform(generate_series(1, 1 + CAST(user_id % 4 AS INT)),
                        x -> CAST(x AS BIGINT)) AS a,
         list_transform(generate_series(CAST(user_id % 3 AS INT), 4),
                        x -> CAST(x AS BIGINT)) AS b
  FROM events WHERE event_id < 3000)
SELECT event_id,
       list_sort(list_distinct(list_filter(a,
           x -> list_contains(b, x)))) AS inter,
       list_sort(list_distinct(list_concat(a, b))) AS uni,
       list_sort(list_distinct(list_filter(a,
           x -> NOT list_contains(b, x)))) AS diff,
       list_has_any(a, b) AS overlaps,
       CAST(COALESCE(list_position(b, 2), 0) AS INTEGER) AS pos2
FROM t
""")
def array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY SET-OPERATION family — array_intersect / union / except,
    arrays_overlap, array_position — completing §2.8's array corner
    (array_funcs covers construction/slicing, array_higher_order the
    lambdas). The cross-engine trap this op pins: Spark's set ops
    preserve FIRST-ARRAY encounter order while DuckDB's list_intersect
    returns arbitrary order — any cross-system comparison (and any
    deterministic downstream consumer) must SORT set-semantic results,
    so both sides emit sorted+distinct arrays, and the oracle builds
    the set ops from list_filter/list_contains primitives. Position is
    1-based on both engines (0 = absent via COALESCE)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    a = F.sequence(F.lit(1).cast("long"),
                   (1 + F.col("user_id") % 4).cast("long"))
    b = F.sequence((F.col("user_id") % 3).cast("long"),
                   F.lit(4).cast("long"))
    t = ev.select("event_id", a.alias("a"), b.alias("b"))
    return t.select(
        "event_id",
        F.sort_array(F.array_distinct(F.array_intersect("a", "b")))
         .alias("inter"),
        F.sort_array(F.array_distinct(F.array_union("a", "b")))
         .alias("uni"),
        F.sort_array(F.array_distinct(F.array_except("a", "b")))
         .alias("diff"),
        F.arrays_overlap("a", "b").alias("overlaps"),
        F.coalesce(F.array_position("b", 2), F.lit(0)).cast("int")
         .alias("pos2"))


# ---------------------------------------------------------------------------
# explode_outer / posexplode_outer NULL semantics
# ---------------------------------------------------------------------------

@query("explode_outer_semantics", oracle="""
WITH t AS (
  SELECT event_id,
         CASE WHEN user_id % 3 = 0 THEN NULL
              WHEN user_id % 3 = 1 THEN []
              ELSE [CAST(user_id AS BIGINT), CAST(user_id + 1 AS BIGINT)]
         END AS xs
  FROM events WHERE event_id < 2000),
expl AS (
  SELECT event_id,
         CAST(unnest(generate_series(0, len(xs) - 1)) AS INTEGER) AS pos,
         xs
  FROM t),
kept AS (
  SELECT event_id, CAST(NULL AS INTEGER) AS pos,
         CAST(NULL AS BIGINT) AS val
  FROM t WHERE xs IS NULL OR len(xs) = 0)
SELECT event_id, pos, CAST(xs[pos + 1] AS BIGINT) AS val FROM expl
UNION ALL SELECT * FROM kept
""")
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer / posexplode_outer NULL SEMANTICS — the corner
    that silently loses rows in ETL: plain explode DROPS records whose
    array is NULL or EMPTY, outer explode keeps them with NULL
    element/position. The fixture mixes all three shapes (null / [] /
    2 elements by user cohort); the oracle reproduces the contract
    as exploded-rows UNION the kept null/empty records (DuckDB has no
    outer unnest — the union IS its definition). Row count = kept-null rows + Σ array sizes,
    which only the OUTER variant gets right."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    xs = (F.when(F.col("user_id") % 3 == 0, F.lit(None))
           .when(F.col("user_id") % 3 == 1,
                 F.array().cast("array<long>"))
           .otherwise(F.array(F.col("user_id"),
                              F.col("user_id") + 1)))
    t = ev.select("event_id", xs.alias("xs"))
    return t.select("event_id",
                    F.posexplode_outer("xs").alias("pos", "val"))


# ---------------------------------------------------------------------------
# histogram_numeric (built-in equi-height histogram aggregate)
# ---------------------------------------------------------------------------

@query("agg_histogram_equiheight")  # rows-only: greedy bin merge is
# input-order sensitive in general (deterministic here, but the bin
# CENTROIDS are approximation artifacts with no SQL twin)
def agg_histogram_equiheight(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """histogram_numeric — Spark's built-in EQUI-HEIGHT histogram
    aggregate (NumericHistogram, the Hive/Ben-Haim-Tom-Tov streaming
    algorithm): one pass, bounded memory, mergeable partials — the
    histogram you can afford at 100 TB, vs agg_histogram_fixed_bins'
    exact equi-WIDTH counts. Emits (bin centroid x, weight y) per
    event_type with 10 bins. Rows-only by honest classification: the
    greedy closest-pair bin merging makes centroids approximation
    artifacts (the same class as KLL quantile estimates); the tests
    pin the invariants that ARE exact — Σweights = row count, bins
    ordered, centroids inside [min, max]."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
              .groupBy("event_type")
              .agg(F.expr("histogram_numeric(value, 10)").alias("h"))
              .select("event_type",
                      F.posexplode("h").alias("bin_idx", "bin"))
              .select("event_type", "bin_idx",
                      F.round(F.col("bin.x"), 6).alias("centroid"),
                      F.col("bin.y").cast("double").alias("weight")))


# ---------------------------------------------------------------------------
# String record parsing: from_csv + str_to_map
# ---------------------------------------------------------------------------

@query("str_parse_record_funcs", oracle="""
SELECT event_id,
       user_id AS csv_uid,
       event_type AS csv_type,
       CAST(user_id AS VARCHAR) AS m_uid,
       event_type AS m_type
FROM events WHERE event_id < 2000
""")
def str_parse_record_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING RECORD PARSING — from_csv (typed CSV-in-a-string, the
    schema-on-read path for delimited log LINES inside a column,
    sibling of scan_json's from_json) and str_to_map (the 'k:v|k:v'
    config/tag blob every legacy event pipeline carries). The records
    are synthesized from typed columns and parsed BACK — identity
    round trips, so the oracle is the plain projection and any parser
    asymmetry (quoting, type coercion, delimiter handling) breaks the
    hash. Both parsers are codegen expressions — schema-on-read
    without leaving the JVM."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    csv_rec = F.concat_ws(",", F.col("user_id").cast("string"),
                          F.col("event_type"))
    map_rec = F.concat(F.lit("uid:"), F.col("user_id").cast("string"),
                       F.lit("|type:"), F.col("event_type"))
    t = ev.select("event_id", csv_rec.alias("csv_rec"),
                  map_rec.alias("map_rec"))
    parsed = t.select(
        "event_id",
        F.from_csv("csv_rec", F.lit("uid BIGINT, et STRING"))
         .alias("c"),
        F.expr("str_to_map(map_rec, '\\\\|', ':')").alias("m"))
    return parsed.select(
        "event_id",
        F.col("c.uid").alias("csv_uid"),
        F.col("c.et").alias("csv_type"),
        F.element_at("m", "uid").alias("m_uid"),
        F.element_at("m", "type").alias("m_type"))


# ---------------------------------------------------------------------------
# Rounding-convention semantics (ROUND half-away vs BROUND half-even)
# ---------------------------------------------------------------------------

@query("scalar_rounding_conventions", oracle="""
WITH t AS (
  SELECT event_id,
         CAST(user_id % 19 AS DOUBLE) - 9.0 + 0.5 AS x
  FROM events WHERE event_id < 2000)
SELECT event_id, x,
       round(x) AS half_away,
       CASE WHEN x - floor(x) = 0.5 THEN 2.0 * round(x / 2.0)
            ELSE round(x) END AS half_even
FROM t
""")
def scalar_rounding_conventions(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """ROUNDING CONVENTIONS pinned as an operator: every value here is
    an exact half-integer — the worst case the house rules exist for —
    and the op emits BOTH conventions side by side: ROUND (HALF_UP,
    away from zero — identical in Spark and DuckDB for doubles) and
    BROUND (banker's HALF_EVEN — no DuckDB builtin, emulated in the
    oracle as 2·round(x/2) on exact halves, which lands on the nearest
    EVEN integer). This is the executable documentation of why r6
    exists and why fixed-fold-order results are emitted unrounded:
    on a .5 boundary the two conventions differ by a full unit."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    x = (F.col("user_id") % 19).cast("double") - 9.0 + 0.5
    t = ev.select("event_id", x.alias("x"))
    return t.select("event_id", "x",
                    F.round("x").alias("half_away"),
                    F.bround("x").alias("half_even"))


# ---------------------------------------------------------------------------
# NaN semantics (ordering, aggregation, nanvl escape)
# ---------------------------------------------------------------------------

@query("scalar_nan_semantics", oracle="""
SELECT event_type,
       CAST(count_if(isnan(value)) AS BIGINT) AS n_nan,
       CAST(isnan(MAX(value)) AS BOOLEAN) AS max_is_nan,
       MAX(CASE WHEN isnan(value) THEN NULL ELSE value END)
         AS max_clean,
       MIN(value) AS min_plain
FROM events WHERE value IS NOT NULL
GROUP BY event_type
""")
def scalar_nan_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN SEMANTICS pinned as an operator — the float edge that
    silently corrupts extremes: BOTH engines order NaN GREATER than
    every number (so a single NaN poisons MAX, proven by the
    max_is_nan flag being true wherever the group has one), while MIN
    stays clean; the escape hatch is nanvl→NULL (aggregates skip
    NULL, never NaN) — Spark's nanvl(value, NULL) ≡ the oracle's CASE
    isnan. The op is why every float aggregate in this repo filters
    `~isnan` explicitly rather than trusting the aggregate to cope."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    return (ev.groupBy("event_type")
              .agg(F.count_if(F.isnan("value")).alias("n_nan"),
                   F.isnan(F.max("value")).alias("max_is_nan"),
                   F.max(F.nanvl("value", F.lit(None).cast("double")))
                    .alias("max_clean"),
                   F.min("value").alias("min_plain")))


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
# Time-bounded funnel (conversion within a window of the trigger)
# ---------------------------------------------------------------------------

_FUNNEL_WIN_US = 3_600_000_000  # 1 hour


@query("funnel_within_window", oracle=f"""
WITH p AS (SELECT user_id, epoch_us(ts) AS pus,
                  CAST(ts AS DATE) AS day, event_id
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'click')
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(count_if(EXISTS (
         SELECT 1 FROM c WHERE c.user_id = p.user_id
           AND c.cus >= p.pus - {_FUNNEL_WIN_US} AND c.cus < p.pus))
         AS BIGINT) AS n_converted_from_click
FROM p GROUP BY day
""")
def funnel_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED FUNNEL: purchases preceded by a click WITHIN ONE
    HOUR — the attribution-window semantics real marketing funnels
    use (funnel_steps is the unconstrained ordered variant; the bound
    changes the algebra from a window scan to an INTERVAL SEMI JOIN).
    Implemented per the house band-join recipe on TIME: click hours
    bucket by the window width, purchases probe bucket and bucket−1
    (any in-window click lands in one of the two), exact time filter
    after the equi join, semi semantics via max-flag per purchase —
    never a per-user cross of full histories. One (user, bucket)
    shuffle; daily rollup after."""
    ev = load_table(spark, sf_dir, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", "event_id",
                   F.unix_micros("ts").alias("pus"),
                   F.col("ts").cast("date").alias("day")))
    c = (ev.filter(F.col("event_type") == "click")
           .select(F.col("user_id").alias("cu"),
                   F.unix_micros("ts").alias("cus")))
    bk = lambda col: (F.col(col) / _FUNNEL_WIN_US).cast("long")  # noqa: E731
    pb = p.withColumn("bk", F.explode(F.array(bk("pus") - 1, bk("pus"))))
    cb = c.withColumn("bk", bk("cus"))
    hit = (pb.join(cb, (pb.bk == cb.bk) & (pb.user_id == cb.cu)
                   & (cb.cus >= pb.pus - _FUNNEL_WIN_US)
                   & (cb.cus < pb.pus), "left_outer")
             .groupBy("event_id", "day")
             .agg(F.max(cb.cus.isNotNull().cast("int")).alias("hit")))
    return (hit.groupBy("day")
               .agg(F.count(F.lit(1)).alias("n_purchases"),
                    F.sum("hit").cast("long")
                     .alias("n_converted_from_click")))


# ---------------------------------------------------------------------------
# Basket pair support (order-level market basket)
# ---------------------------------------------------------------------------

@query("basket_pair_support", oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey)
SELECT part_a, part_b, support FROM pairs
ORDER BY support DESC, part_a, part_b
LIMIT 20
""")
def basket_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASKET PAIR SUPPORT — the order-level market-basket sibling of
    agg_cooccurrence_lift (which works at user level): top-20 part
    pairs by the number of ORDERS containing both. The self-join is
    per ORDER over the DISTINCT (order, part) table, so fan-out is
    bounded by lines-per-order squared (~4² here, spec ~7²), never
    lineitem² — the same reduce-before-self-join rule as the
    co-purchase graph build. Support counts are integers; the top-20
    cut rides a TOTAL order (support DESC, part_a, part_b) through
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    b = op.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("part_b"))
    pairs = (op.join(b, (op.l_orderkey == b.ok)
                     & (op.l_partkey < b.part_b))
               .groupBy(F.col("l_partkey").alias("part_a"), "part_b")
               .agg(F.count(F.lit(1)).alias("support")))
    return (pairs.orderBy(F.desc("support"), "part_a", "part_b")
                 .limit(20))


# ---------------------------------------------------------------------------
# Supervised label generation: time-to-event
# ---------------------------------------------------------------------------

@query("label_time_to_event", oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
  FROM events),
lab AS (
  SELECT event_id, user_id, event_type, us,
         MIN(CASE WHEN event_type = 'purchase' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_purchase_us
  FROM e)
SELECT event_id,
       CAST(next_purchase_us - us AS BIGINT) AS us_to_purchase,
       CAST(next_purchase_us IS NOT NULL AS BOOLEAN) AS has_label
FROM lab
""")
def label_time_to_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-EVENT LABEL GENERATION — for every event, microseconds
    until the user's NEXT purchase (NULL → censored): the target
    column every survival/propensity model trains on, built as ONE
    forward-looking conditional window (MIN of purchase timestamps
    over the 1-FOLLOWING→∞ frame) — no self-join, no per-user
    collect, and the strictly-forward frame can never leak the
    current event into its own label (the classic target-leakage
    bug, prevented structurally). One shuffle on user_id; integer-µs
    labels are hash-exact."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("us"))
    w = (W.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(1, W.unboundedFollowing))
    nxt = F.min(F.when(F.col("event_type") == "purchase",
                       F.col("us"))).over(w)
    return (e.withColumn("next_purchase_us", nxt)
             .select("event_id",
                     (F.col("next_purchase_us") - F.col("us"))
                     .cast("long").alias("us_to_purchase"),
                     F.col("next_purchase_us").isNotNull()
                      .alias("has_label")))


# ---------------------------------------------------------------------------
# Supervised label generation: future-window conversion flag
# ---------------------------------------------------------------------------

_LABEL_WIN_US = 7 * 24 * 3_600_000_000  # 7 days


@query("label_future_conversion", oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
  FROM events)
SELECT event_id,
       COALESCE(CAST(MAX(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 1 FOLLOWING AND {_LABEL_WIN_US} FOLLOWING)
         AS BIGINT), 0) AS converts_within_7d
FROM e
""")
def label_future_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUTURE-WINDOW CONVERSION LABEL — for every event, does the user
    purchase within the NEXT 7 DAYS: the binary churn/propensity
    target, built as a RANGE-framed window over integer microseconds
    (1 FOLLOWING → 7d FOLLOWING — the range frame is what bounds the
    look-ahead in TIME, not rows, and the 1-µs start excludes the
    current instant: structural leakage prevention again). Events at
    the stream's tail are labeled with whatever horizon remains —
    the honest-censoring caveat every label pipeline must document —
    here every label is deterministic so the oracle pins the whole
    column. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("us"))
    w = (W.partitionBy("user_id").orderBy("us")
          .rangeBetween(1, _LABEL_WIN_US))
    flag = F.max(F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0)).over(w)
    return e.select("event_id",
                    F.coalesce(flag.cast("long"), F.lit(0))
                     .alias("converts_within_7d"))


# ---------------------------------------------------------------------------
# Training-set builder composite (backward features + forward labels)
# ---------------------------------------------------------------------------

_D7_US = 7 * 24 * 3_600_000_000


@query("ml_training_set_build", oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us
  FROM events),
rowsx AS (
  SELECT event_id, user_id, event_type, us,
         CAST(COUNT(*) OVER past AS BIGINT) AS n_events_7d,
         CAST(SUM(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                       THEN CAST(value AS DECIMAL(38,12))
                       ELSE CAST(0 AS DECIMAL(38,12)) END)
              OVER past AS DOUBLE) AS value_sum_7d,
         COALESCE(CAST(MAX(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END)
              OVER fut AS BIGINT), 0) AS label_converts_7d
  FROM e
  WINDOW past AS (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN {_D7_US} PRECEDING AND 1 PRECEDING),
         fut AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 1 FOLLOWING AND {_D7_US} FOLLOWING))
SELECT event_id, n_events_7d, value_sum_7d, label_converts_7d
FROM rowsx WHERE event_type = 'click'
""")
def ml_training_set_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-SET BUILDER — the leakage-safe composite the label
    family exists for: at every CLICK decision point, BACKWARD 7-day
    features (event count, decimal-exact value sum over the RANGE
    frame [-7d, -1µs]) and the FORWARD 7-day conversion label
    ([+1µs, +7d]) in ONE plan. The two frames share one (user, time)
    sort — a single Exchange feeds features AND labels — and the
    1-µs exclusions on BOTH sides mean the current instant can leak
    into neither direction: point-in-time correctness enforced by
    frame boundaries instead of by review. This is the batch shape a
    feature store materializes nightly; swap the feature expressions
    freely, the frames do the correctness."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type", "value",
                  F.unix_micros("ts").alias("us"))
    past = (W.partitionBy("user_id").orderBy("us")
             .rangeBetween(-_D7_US, -1))
    fut = (W.partitionBy("user_id").orderBy("us")
            .rangeBetween(1, _D7_US))
    ok = F.col("value").isNotNull() & ~F.isnan("value")
    vdec = (F.when(ok, F.col("value")).otherwise(0.0)
             .cast("decimal(38,12)"))
    out = (e.withColumn("n_events_7d",
                        F.count(F.lit(1)).over(past))
            .withColumn("value_sum_7d",
                        F.sum(vdec).over(past).cast("double"))
            .withColumn("label_converts_7d",
                        F.coalesce(
                            F.max(F.when(F.col("event_type") == "purchase",
                                         1).otherwise(0)).over(fut)
                             .cast("long"),
                            F.lit(0))))
    return (out.filter(F.col("event_type") == "click")
               .select("event_id", "n_events_7d", "value_sum_7d",
                       "label_converts_7d"))


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (leakage-corrected categorical feature)
# ---------------------------------------------------------------------------

@query("feature_target_encoding_loo", oracle=f"""
WITH e AS (
  SELECT event_id, user_id % 16 AS cat,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
g AS (SELECT cat, CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY cat)
SELECT e.event_id, e.cat, e.y,
       {r6_sql('CAST(g.sum_y - e.y AS DOUBLE) / (g.n - 1)')}
         AS te_loo,
       {r6_sql('CAST(g.sum_y AS DOUBLE) / g.n')} AS te_naive
FROM e JOIN g USING (cat)
""")
def feature_target_encoding_loo(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT TARGET ENCODING — the categorical feature that
    tops every tabular-ML recipe AND its most famous leakage trap:
    the naive per-category label mean INCLUDES each row's own label
    (emitted here as te_naive so the difference is visible); the LOO
    form subtracts it — (Σy − y)/(n−1) — from the SAME one-pass
    group sums, broadcast back onto the rows. Integer label sums make
    both encodings exact-rational; no per-row regrouping, no k-fold
    re-aggregation (data_kfold_split composes on top when out-of-fold
    encoding is wanted). One shuffle on the category key."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", (F.col("user_id") % 16).alias("cat"),
                  F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0).alias("y"))
    g = e.groupBy("cat").agg(F.sum("y").alias("sum_y"),
                             F.count(F.lit(1)).alias("n"))
    return (e.join(F.broadcast(g), "cat")
             .select("event_id", "cat", "y",
                     r6((F.col("sum_y") - F.col("y")).cast("double")
                        / (F.col("n") - 1)).alias("te_loo"),
                     r6(F.col("sum_y").cast("double") / F.col("n"))
                      .alias("te_naive")))


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
