"""Round-6p operator additions: whiteness testing, recsys negative
sampling, and drawdown duration.

Ljung–Box (is a series white noise, or did the smoother leave
structure behind), RNG-free negative sampling (the recsys training
staple), and longest-underwater-spell duration (the time axis of
drawdown risk).

Provenance note (SURVEY.md §0 applies — empty reference checkout):
all public-API constructions ([SPARK]/[PK] — Ljung & Box 1978;
negative sampling is word2vec/recsys canon (Mikolov 2013 lineage);
underwater duration is drawdown-analysis canon).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead
of these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum_str, dsum_str_sql, r6, r6_sql
from .registry import query

_LB_LAGS = (1, 2, 3, 4, 5)
_CHI2_5_CRIT = "11.070"  # chi-square(5) 5% critical value, pinned


def _lb_branch_sql(k: int) -> str:
    return f"""
  SELECT user_id, {k} AS lag, value AS x,
         lag(value, {k}) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS y
  FROM v"""


# ---------------------------------------------------------------------------
# Ljung–Box whiteness test
# ---------------------------------------------------------------------------

_LB_SQL = f"""
WITH v AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
nn AS (
  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n FROM v GROUP BY user_id),
pairs AS ({' UNION ALL '.join(_lb_branch_sql(k) for k in _LB_LAGS)}),
s AS (
  SELECT user_id, lag,
         CAST(COUNT(y) AS DOUBLE) AS np,
         {dsum_str_sql('CASE WHEN y IS NOT NULL THEN x END')} AS sx,
         {dsum_str_sql('y')} AS sy,
         {dsum_str_sql('CASE WHEN y IS NOT NULL THEN x * x END')} AS sxx,
         {dsum_str_sql('y * y')} AS syy,
         {dsum_str_sql('x * y')} AS sxy
  FROM pairs GROUP BY user_id, lag),
rho AS (
  SELECT user_id, lag,
         CASE WHEN np >= 3 AND (np * sxx - sx * sx) > 0
                   AND (np * syy - sy * sy) > 0
              THEN ROUND((np * sxy - sx * sy)
                         / (sqrt(np * sxx - sx * sx)
                            * sqrt(np * syy - sy * sy)), 9)
              ELSE 0.0 END AS r
  FROM s),
q AS (
  SELECT rho.user_id, nn.n,
         {dsum_str_sql('r * r / (nn.n - rho.lag)')} AS term
  FROM rho JOIN nn ON rho.user_id = nn.user_id
  GROUP BY rho.user_id, nn.n)
SELECT user_id, CAST(n AS BIGINT) AS n,
       {r6_sql('n * (n + 2.0) * term')} AS lb_stat,
       COALESCE(n * (n + 2.0) * term > {_CHI2_5_CRIT}, false)
         AS reject_white
FROM q ORDER BY user_id
"""


@query("ts_ljung_box", oracle=_LB_SQL)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LJUNG–BOX whiteness test [PK — Ljung & Box 1978]: Q = n(n+2)·
    Σₖ ρₖ²/(n−k) over lags 1..5, flagged at the pinned χ²(5) 5%
    critical value — the residual-diagnostic every smoother/forecast
    op here (EWMA, Holt, Kalman, seasonal decompose) should be
    audited with: reject_white on the residuals means the model left
    structure behind. ρₖ is the per-lag Pearson of the ts_acf_multi_
    lag construction (one window sort, 5 lag columns, unpivot,
    string-routed sums — the n·Σxx − (Σx)² terms are cancelling),
    each pinned to 9 dp BEFORE the ρ² sum so Q assembles from
    identical doubles. Degenerate lags contribute exactly 0. Scale:
    one per-user sort + two map-side-combined aggregates; constant
    rows per user."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", F.col("value").alias("x"),
        *[F.lag("value", k).over(wl).alias(f"y{k}") for k in _LB_LAGS])
    pairs = lagged.select(
        "user_id",
        F.expr("stack(" + str(len(_LB_LAGS)) + ", "
               + ", ".join(f"{k}, x, y{k}" for k in _LB_LAGS)
               + ") AS (lag, x, y)"))
    x, y = F.col("x"), F.col("y")
    s = pairs.groupBy("user_id", "lag").agg(
        F.count(y).cast("double").alias("np"),
        dsum_str(F.when(y.isNotNull(), x)).alias("sx"),
        dsum_str(y).alias("sy"),
        dsum_str(F.when(y.isNotNull(), x * x)).alias("sxx"),
        dsum_str(y * y).alias("syy"),
        dsum_str(x * y).alias("sxy"))
    np_, sx, sy = F.col("np"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    r_ = F.when((np_ >= 3) & (np_ * sxx - sx * sx > 0)
                & (np_ * syy - sy * sy > 0),
                F.round((np_ * sxy - sx * sy)
                        / (F.sqrt(np_ * sxx - sx * sx)
                           * F.sqrt(np_ * syy - sy * sy)), 9)).otherwise(0.0)
    rho = s.select("user_id", "lag", r_.alias("r"))
    nn = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("double")
                                    .alias("n"))
    q = (rho.join(nn, "user_id")
            .groupBy("user_id", "n")
            .agg(dsum_str(F.col("r") * F.col("r")
                          / (F.col("n") - F.col("lag"))).alias("term")))
    n = F.col("n")
    lb = n * (n + 2.0) * F.col("term")
    return (q.select("user_id", n.cast("long").alias("n"),
                     r6(lb).alias("lb_stat"),
                     F.coalesce(lb > float(_CHI2_5_CRIT), F.lit(False))
                      .alias("reject_white"))
             .orderBy("user_id"))


# ---------------------------------------------------------------------------
# RNG-free negative sampling
# ---------------------------------------------------------------------------

_NEGSAMPLE_SQL = """
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
users AS (SELECT DISTINCT user_id FROM pos),
cand AS (
  SELECT u.user_id, p.p_partkey AS item_id,
         (u.user_id * 7919 + p.p_partkey) % 1000003 * 2654435761
           % 1000003 AS h
  FROM users u, part p
  WHERE (u.user_id * 7919 + p.p_partkey) % 1000003 * 2654435761
          % 1000003 % 50 = 0),
neg AS (
  SELECT c.user_id, c.item_id, c.h
  FROM cand c LEFT JOIN pos ON c.user_id = pos.user_id
                           AND c.item_id = pos.item_id
  WHERE pos.user_id IS NULL),
ranked AS (
  SELECT user_id, item_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY h, item_id) AS rnk
  FROM neg)
SELECT user_id, item_id, CAST(rnk AS BIGINT) AS neg_rank
FROM ranked WHERE rnk <= 5
ORDER BY user_id, neg_rank
"""


@query("data_negative_sampling", oracle=_NEGSAMPLE_SQL)
def data_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RNG-FREE NEGATIVE SAMPLING [PK — the word2vec/recsys training
    staple (Mikolov 2013 lineage): k non-interacted items per user]:
    5 negatives per customer from the part catalog, reproducible on
    any engine — candidates are HASH-GATED to ~1/50 of the catalog
    BEFORE the anti-join (the portable Knuth gate keyed on the
    (user, item) pair, so each user gets an independent 2% slice —
    the fan-out is |users|·|parts|/50, tunable, never the full cross
    product), positives removed by anti-join, the k kept by hash
    rank with an item tiebreak. A rand()-seeded sampler could never
    be hash-checked and resamples differently per run/partitioning.
    Scale: gated cross join (bounded fan-out) + broadcast-able
    positives anti-join + per-user top-k window."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pos = (o.join(li, o.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("user_id"),
                     F.col("l_partkey").alias("item_id"))
             .distinct())
    users = pos.select("user_id").distinct()
    h = ((F.col("user_id") * 7919 + F.col("p_partkey")) % 1000003
         * F.lit(2654435761) % 1000003)
    cand = (users.crossJoin(part.select("p_partkey"))
                 .filter(h % 50 == 0)
                 .select("user_id", F.col("p_partkey").alias("item_id"),
                         h.alias("h")))
    neg = cand.join(pos, ["user_id", "item_id"], "left_anti")
    wr = W.partitionBy("user_id").orderBy("h", "item_id")
    return (neg.select("user_id", "item_id",
                       F.row_number().over(wr).cast("long")
                        .alias("neg_rank"))
               .filter(F.col("neg_rank") <= 5)
               .orderBy("user_id", "neg_rank"))


# ---------------------------------------------------------------------------
# Longest underwater spell
# ---------------------------------------------------------------------------

_UNDERWATER_SQL = """
WITH r AS (
  SELECT user_id, ts, event_id, value,
         MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS run_max
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value < run_max THEN 1 ELSE 0 END AS under,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM r),
g AS (
  SELECT user_id, under, rn,
         rn - row_number() OVER (PARTITION BY user_id, under
                                 ORDER BY rn) AS grp
  FROM f),
spells AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
  FROM g WHERE under = 1 GROUP BY user_id, grp)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_spells,
       CAST(MAX(len) AS BIGINT) AS max_underwater_len,
       CAST(SUM(len) AS BIGINT) AS total_underwater_rows
FROM spells GROUP BY user_id ORDER BY user_id
"""


@query("win_underwater_duration", oracle=_UNDERWATER_SQL)
def win_underwater_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNDERWATER DURATION [PK — drawdown-analysis canon: how LONG
    below the peak, where win_drawdown says how DEEP and
    win_ulcer_index integrates both]: maximal runs of consecutive
    rows strictly below the running maximum, per user — spell count,
    longest spell, total underwater rows. Spells come from the
    gaps-and-islands rn − rn' difference (the win_streaks_islands
    construction) on the under/recovered flag; everything is integer
    or an exact comparison of passthrough doubles. Scale: three
    window passes — two on the same (user; ts, id) sort, the island
    one on (user, under) — then one aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    run_max = F.max("value").over(ws.rowsBetween(W.unboundedPreceding, 0))
    r = ev.select("user_id", "ts", "event_id", "value",
                  run_max.alias("run_max"))
    f_ = r.select("user_id", "ts", "event_id",
                  F.when(F.col("value") < F.col("run_max"), 1).otherwise(0)
                   .alias("under"),
                  F.row_number().over(ws).alias("rn"))
    wg = W.partitionBy("user_id", "under").orderBy("rn")
    g = f_.select("user_id", "under", "rn",
                  (F.col("rn") - F.row_number().over(wg)).alias("grp"))
    spells = (g.filter(F.col("under") == 1)
               .groupBy("user_id", "grp")
               .agg(F.count(F.lit(1)).alias("len")))
    return (spells.groupBy("user_id")
                  .agg(F.count(F.lit(1)).alias("n_spells"),
                       F.max("len").alias("max_underwater_len"),
                       F.sum("len").alias("total_underwater_rows"))
                  .orderBy("user_id"))
