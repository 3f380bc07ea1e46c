"""Training-set construction, labels, and pipeline audits (split out of
q_round4b in round 5): leakage-safe label ops (time-to-event, future
conversion, LOO target encoding, the full training-set builder),
funnel/basket analyses, and the data-ops audit family (shard balance,
join-key skew, freshness, quality scorecard, URL canonicalization,
scalable global index)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query


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
