"""Round-4 operator additions (beyond the SURVEY.md §2 round-3 close).

Provenance note (SURVEY.md §0 applies): the reference checkout is
empty, so these rows extend the engine along the driver's north star —
SQL-surface credibility (more TPC-H), LLM-training-data pipeline
primitives (segment-granularity boilerplate dedup, k-fold splits,
deterministic reservoir sampling, curriculum ordering, repetition
quality gates, int8 embedding quantization), and the event-analytics
staple (first/last-touch attribution). Every op keeps the house rules:
portable integer hashes instead of RNG, decimal-exact float sums,
total orders before any LIMIT, aliases identical on both engines.

Registered AFTER q_round3 so the driver-budget rotation
(plans/__init__.py) keeps the round-3 never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query


# ---------------------------------------------------------------------------
# TPC-H Q6 — the predicate-pushdown poster child
# ---------------------------------------------------------------------------

@query("sql_tpch_q6", oracle=f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
""")
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): a pure filter + 1-row
    aggregate — the query whose entire cost is the scan, which makes it
    the canonical predicate-pushdown/column-pruning check: all three
    predicates and the 3-column ReadSchema must reach the parquet
    reader (PushedFilters in .explain), so at 100 TB the scan reads
    row groups whose min/max stats overlap [1996, 1997) only. The
    per-row product stays double (deterministic); the sum runs through
    DECIMAL(38,12) on both engines (exact, order-independent)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1997-01-01")
                      & (F.col("l_discount") >= 0.03)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
              .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"))
                   .alias("revenue"),
                   F.count(F.lit(1)).alias("n_items")))


# ---------------------------------------------------------------------------
# TPC-H Q5 — local-supplier volume (6-way join, broadcast dims)
# ---------------------------------------------------------------------------

@query("sql_tpch_q5", oracle=f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""")
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): the 6-way star-with-a-twist —
    the c_nationkey = s_nationkey equality turns the snowflake into a
    cycle, so the supplier join carries TWO keys. Plan shape for
    100 TB: lineitem is the only large table; nation/region carry
    static broadcast hints (bounded 25/5-row domains at ANY SF), while
    customer and supplier SCALE with SF and so EARN their broadcasts
    at runtime from actual bytes via AQE (round 10: static hints on
    SF-scaling sides demoted — a forced broadcast of a grown dim OOMs
    the driver at cluster scale; the two-threshold session posture
    still converts these joins to broadcasts wherever the side is
    genuinely small). orders carries its date filter down to the scan;
    the one unavoidable shuffle is lineitem↔orders on orderkey.
    Revenue through DECIMAL(38,12); group key is the 5-row nation
    name."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = o.filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1998-01-01"))
    r = r.filter(F.col("r_name") == "ASIA")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(s, (li.l_suppkey == s.s_suppkey)
                    & (c.c_nationkey == s.s_nationkey))
              .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .groupBy("n_name")
              .agg(dsum(F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))).alias("revenue")))


# ---------------------------------------------------------------------------
# Segment-granularity boilerplate dedup (paragraph dedup for flat text)
# ---------------------------------------------------------------------------

_SEG_TOKENS = 20


@query("text_segment_dedup", oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS seg_idx,
         array_to_string(toks[u.i * {_SEG_TOKENS} + 1 :
                              u.i * {_SEG_TOKENS} + {_SEG_TOKENS}], ' ')
           AS seg
  FROM t, UNNEST(range(CAST(ceil(len(toks) / {_SEG_TOKENS}.0) AS BIGINT)))
            AS u(i)),
r AS (
  SELECT doc_id, seg_idx,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx)
           AS rn
  FROM s)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM r GROUP BY doc_id
""")
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT-granularity dedup — paragraph dedup for corpora whose
    documents are flat token streams: fixed 20-token segments stand in
    for paragraphs, and a segment that already appeared anywhere
    earlier in the corpus (first occurrence = smallest (doc_id,
    seg_idx) — a total order) is dropped as boilerplate. This is the
    WITHIN-corpus sibling of doc-level dedup: headers/footers/injected
    templates dedup at segment scope while the documents stay distinct.
    Scale shape: the segment explode is bounded by token count / 20;
    the keep-first rule is ONE window over the segment-string shuffle
    key (uniform — no hot key can exceed corpus frequency of one
    template); per-doc stats restore the doc grain. All codegen: split
    + transform + posexplode, no Python."""
    d = load_table(spark, sf_dir, "documents")
    segs = F.expr(
        f"transform(sequence(0, int(ceil(size(toks) / {_SEG_TOKENS}.0)) - 1),"
        f" i -> array_join(slice(toks, i * {_SEG_TOKENS} + 1,"
        f" {_SEG_TOKENS}), ' '))")
    e = (d.select("doc_id", F.split("text", " ").alias("toks"))
          .select("doc_id", F.posexplode(segs).alias("seg_idx", "seg"))
          .withColumn("seg_idx", F.col("seg_idx").cast("long")))
    w = W.partitionBy("seg").orderBy("doc_id", "seg_idx")
    return (e.withColumn("rn", F.row_number().over(w))
             .groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_segments"),
                  F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                   .alias("n_kept")))


# ---------------------------------------------------------------------------
# k-fold split (portable hash, no RNG)
# ---------------------------------------------------------------------------

_K_FOLDS = 5


@query("data_kfold_split", oracle=f"""
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM (
  SELECT doc_id, n_chars,
         CAST(((doc_id % 1000003) * 2654435761) % 1000003 % {_K_FOLDS}
              AS BIGINT) AS fold
  FROM documents)
GROUP BY fold ORDER BY fold
""")
def data_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-FOLD assignment — cross-validation splits at
    corpus scale by the same portable Knuth hash as data_split_hash:
    fold(k) is a pure function of doc_id, so any engine (and any
    epoch) recomputes identical folds with zero shuffle — the split is
    a scan-level predicate (`fold != i` trains, `fold = i` validates),
    never a materialized copy. The pre-mod keeps intermediates < 2^52
    for DuckDB's overflow-checked BIGINT."""
    d = load_table(spark, sf_dir, "documents")
    fold = (((F.col("doc_id") % 1000003) * F.lit(2654435761))
            % 1000003 % _K_FOLDS).cast("long")
    return (d.select(fold.alias("fold"), "n_chars", "doc_id")
             .groupBy("fold")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("chars"),
                  F.min("doc_id").alias("first_doc"))
             .orderBy("fold"))


# ---------------------------------------------------------------------------
# Deterministic reservoir sample (hash-rank top-k per group)
# ---------------------------------------------------------------------------

_RESERVOIR_K = 10


@query("agg_reservoir_sample", oracle=f"""
SELECT event_type, event_id, rn
FROM (
  SELECT event_type, event_id,
         CAST(row_number() OVER (
             PARTITION BY event_type
             ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
           AS BIGINT) AS rn
  FROM events)
WHERE rn <= {_RESERVOIR_K}
""")
def agg_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RESERVOIR SAMPLE per group — k uniform
    representatives per event_type with no RNG and no reservoir state:
    rank rows by the md5 of their key (a uniform permutation of the
    group) and keep the first k. Equivalent in distribution to
    Vitter's reservoir but embarrassingly parallel and re-runnable:
    partial top-k per partition merges to global top-k (Spark rewrites
    the rn<=k window to a per-partition bounded heap — same
    WindowGroupLimit shape as topk_per_group), so the full group never
    materializes on one task. md5-hex ordering is engine-portable
    (both engines emit lowercase hex, compared as strings); event_id
    tiebreak pins a total order."""
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("event_type")
          .orderBy(F.md5(F.col("event_id").cast("string")), "event_id"))
    return (ev.select("event_type", "event_id",
                      F.row_number().over(w).cast("long").alias("rn"))
              .filter(F.col("rn") <= _RESERVOIR_K))


# ---------------------------------------------------------------------------
# Curriculum ordering (stage by fixed length bins, hash-shuffled within)
# ---------------------------------------------------------------------------

@query("data_curriculum_order", oracle="""
WITH s AS (
  SELECT doc_id,
         CASE WHEN n_chars < 256 THEN 0 WHEN n_chars < 384 THEN 1
              WHEN n_chars < 512 THEN 2 ELSE 3 END AS stage,
         ((doc_id % 1000003) * 2654435761) % 1000003 AS h
  FROM documents)
SELECT stage, doc_id,
       CAST(row_number() OVER (PARTITION BY stage ORDER BY h, doc_id)
            AS BIGINT) AS position
FROM s
""")
def data_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM ORDERING — easy-to-hard training schedules: stage by
    FIXED length thresholds (a scan-level CASE — never ntile, whose
    global sort is pointless at 100 TB when the curriculum designer
    picks the boundaries anyway), then hash-shuffle within each stage
    with the portable Knuth hash so intra-stage order is reproducible
    and RNG-free (same contract as data_epoch_shuffle). The
    within-stage position is a per-stage sort — range-partitioned at
    scale, or skipped by bucketing on hash ranges; consumers stream
    stages in order."""
    d = load_table(spark, sf_dir, "documents")
    stage = (F.when(F.col("n_chars") < 256, 0)
              .when(F.col("n_chars") < 384, 1)
              .when(F.col("n_chars") < 512, 2).otherwise(3))
    h = ((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 1000003
    w = W.partitionBy("stage").orderBy("h", "doc_id")
    return (d.select(stage.alias("stage"), "doc_id", h.alias("h"))
             .withColumn("position", F.row_number().over(w).cast("long"))
             .select("stage", "doc_id", "position"))


# ---------------------------------------------------------------------------
# Repetition quality gate (top-bigram fraction)
# ---------------------------------------------------------------------------

@query("text_repetition_filter", oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT doc_id, toks[u.i] || ' ' || toks[u.i + 1] AS bigram
  FROM t, UNNEST(range(1, len(toks))) AS u(i)),
c AS (
  SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY doc_id, bigram),
m AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         CAST(MAX(cnt) AS BIGINT) AS top_count
  FROM c GROUP BY doc_id)
SELECT doc_id, n_bigrams, top_count,
       {r6_sql('CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE)')}
         AS rep_ratio,
       COALESCE(CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                > 0.1, false) AS is_repetitive
FROM m
""")
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPETITION quality gate — the Gopher-family "top n-gram
    fraction" rule: a document whose single most frequent word-bigram
    covers > 10% of all its bigrams is template/spam-shaped and gets
    flagged (looping generations, keyword stuffing, boilerplate).
    Bigrams come straight off the token array (transform over an index
    sequence — codegen, no self-join, no Python); two hash aggregates
    per doc. The ratio is an integer-over-integer double (exact,
    engine-portable); the boolean is COALESCEd non-nullable per house
    rule."""
    d = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")
    b = (d.select("doc_id", F.split("text", " ").alias("toks"))
          # 0/1-token docs emit no bigrams (Spark sequence(1, 0) is a
          # DESCENDING ramp -> out-of-bounds element_at; DuckDB range
          # is empty) — filter pins identical absence on both engines
          .filter(F.size("toks") >= 2)
          .select("doc_id", F.explode(bigrams).alias("bigram")))
    c = b.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    m = (c.groupBy("doc_id")
          .agg(F.sum("cnt").alias("n_bigrams"),
               F.max("cnt").alias("top_count")))
    ratio = (F.col("top_count").cast("double")
             / F.col("n_bigrams").cast("double"))
    return m.select(
        "doc_id", "n_bigrams", "top_count",
        r6(ratio).alias("rep_ratio"),
        F.coalesce(ratio > 0.1, F.lit(False)).alias("is_repetitive"))


# ---------------------------------------------------------------------------
# int8 embedding quantization (symmetric, per-vector scale)
# ---------------------------------------------------------------------------

@query("vec_quantize_int8", oracle="""
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(x))) / 127.0
           AS scale,
         embedding
  FROM embeddings),
z AS (
  SELECT vec_id, scale,
         list_transform(embedding,
             x -> greatest(-127, least(127,
                  CAST(floor(x / scale + 0.5) AS BIGINT)))) AS qv
  FROM q WHERE scale > 0)
SELECT vec_id, scale,
       CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT)
         AS n_saturated,
       CAST(len(list_filter(qv, v -> v = 0)) AS BIGINT) AS n_zero,
       CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT)
         AS sum_abs_q
FROM z
""")
def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 embedding quantization — the 4× memory/bandwidth lever for
    vector search at scale: symmetric per-vector scale (max|x|/127),
    round-half-up via floor(x/scale + 0.5) — written out EXPLICITLY
    because round() half-up (Spark) vs half-even (DuckDB) would drift
    on exact .5 boundaries — then clamp to [-127, 127]. Outputs are
    engine-exact by construction: the scale is one IEEE division of a
    float-exact max (deterministic), and the quantized stats are pure
    integers (saturation count, zero count, Σ|q|), so no float
    tolerance anywhere. All array lambdas are codegen'd higher-order
    functions — the corpus never leaves the JVM."""
    e = load_table(spark, sf_dir, "embeddings")
    scale = (F.array_max(F.transform("embedding", lambda x: F.abs(x)))
             .cast("double") / F.lit(127.0))
    q = F.expr(
        "transform(embedding, x -> greatest(-127L, least(127L,"
        " CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))))")
    z = (e.select("vec_id", scale.alias("scale"), "embedding")
          .filter(F.col("scale") > 0)
          .withColumn("qv", q))
    return z.select(
        "vec_id", "scale",
        F.size(F.filter("qv", lambda v: F.abs(v) == 127)).cast("long")
         .alias("n_saturated"),
        F.size(F.filter("qv", lambda v: v == 0)).cast("long")
         .alias("n_zero"),
        F.aggregate("qv", F.lit(0).cast("long"),
                    lambda acc, v: acc + F.abs(v)).alias("sum_abs_q"))


# ---------------------------------------------------------------------------
# First/last-touch attribution (event analytics)
# ---------------------------------------------------------------------------

@query("funnel_attribution", oracle="""
WITH o AS (
  SELECT user_id, event_id, event_type, value, ts,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_id,
         first_value(CASE WHEN event_type = 'click' THEN event_id END
                     IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS first_click_id
  FROM events)
SELECT event_id, user_id, value, first_click_id, last_click_id,
       COALESCE(first_click_id IS NOT NULL, false) AS attributed
FROM o WHERE event_type = 'purchase'
""")
def funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST-TOUCH ATTRIBUTION — for every purchase, the click
    that gets the credit: the user's first-ever preceding click
    (first-touch) and most recent preceding click (last-touch), via
    two IGNORE NULLS window passes over ONE (user, time) partitioning
    — the strictly-preceding frame (… AND 1 PRECEDING) keeps a
    same-timestamp click from attributing its own purchase. No
    self-join, no per-user collect: at 100 TB this is one shuffle on
    user_id and two frame passes that share the sort. The attribution
    flag is COALESCEd non-nullable (house rule)."""
    ev = load_table(spark, sf_dir, "events")
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    wp = (W.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(W.unboundedPreceding, -1))
    o = ev.select(
        "event_id", "user_id", "event_type", "value",
        F.last(click_id, ignorenulls=True).over(wp).alias("last_click_id"),
        F.first(click_id, ignorenulls=True).over(wp).alias("first_click_id"))
    return (o.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "value",
                     "first_click_id", "last_click_id",
                     F.coalesce(F.col("first_click_id").isNotNull(),
                                F.lit(False)).alias("attributed")))


# ---------------------------------------------------------------------------
# TPC-H Q10 — returned-item top customers (join + group + total-order top-k)
# ---------------------------------------------------------------------------

@query("sql_tpch_q10", oracle=f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): which customers returned
    the most revenue in a window — join-filter-group-rank in one plan.
    Plan shape: the returnflag filter reaches the lineitem scan, the
    date filter the orders scan; nation is statically hinted (bounded
    domain), customer earns its broadcast from runtime bytes via AQE
    (it scales with SF — round-10 hint demotion); the top-20
    is a TakeOrderedAndProject over a TOTAL order (exact decimal
    revenue is bit-identical cross-engine, so revenue DESC +
    c_custkey tiebreak is hash-safe)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (li.filter(F.col("l_returnflag") == "R")
              .join(o.filter((F.col("o_orderdate") >= "1996-01-01")
                             & (F.col("o_orderdate") < "1997-01-01")),
                    li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .groupBy("c_custkey", "c_name", "n_name")
              .agg(dsum(F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))).alias("revenue"))
              .orderBy(F.desc("revenue"), "c_custkey")
              .limit(20))


# ---------------------------------------------------------------------------
# TPC-H Q14 — promo revenue share (conditional aggregate ratio)
# ---------------------------------------------------------------------------

@query("sql_tpch_q14", oracle=f"""
SELECT {r6_sql(
    "100.0 * "
    + dsum_sql("CASE WHEN p_type = 'ECONOMY' "
               "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")
    + " / " + dsum_sql("l_extendedprice * (1 - l_discount)"))}
         AS promo_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
""")
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue share, p_type='ECONOMY' standing in
    for the PROMO% predicate of the spec against the fixture's type
    domain): conditional-aggregate ratio over a month window — the
    SUM(CASE)/SUM pattern every KPI dashboard runs. part earns its
    broadcast from the size thresholds (round-10 hint demotion: part
    scales with SF — 1:30 vs lineitem at spec ratios, far past any
    static-hint budget at cluster scale); both sums run
    through DECIMAL so the ratio divides two bit-identical doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0)
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1996-04-01"))
              .join(p, li.l_partkey == p.p_partkey)
              .agg(r6(F.lit(100.0) * dsum(promo) / dsum(rev))
                   .alias("promo_pct"),
                   F.count(F.lit(1)).alias("n_items")))


# ---------------------------------------------------------------------------
# CUSUM drift detection (closed-form: cumsum minus running min)
# ---------------------------------------------------------------------------

_CUSUM_K = 60.0   # target + slack (value mean ≈ 50)
_CUSUM_H = 500.0  # alarm threshold


@query("win_cusum_drift", oracle=f"""
WITH s AS (
  SELECT event_id, user_id,
         SUM(CAST(value - {_CUSUM_K} AS DECIMAL(38,12))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t
  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
SELECT event_id, user_id,
       CAST(s_t - LEAST(MIN(s_t) OVER (
           PARTITION BY user_id ORDER BY s_t IS NOT NULL, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           CAST(0 AS DECIMAL(38,12))) AS DOUBLE)
         AS cusum_pos,
       COALESCE(CAST(s_t - LEAST(MIN(s_t) OVER (
           PARTITION BY user_id ORDER BY s_t IS NOT NULL, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           CAST(0 AS DECIMAL(38,12))) AS DOUBLE)
           > {_CUSUM_H}, false) AS drift_alarm
FROM s
""")
def win_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift/changepoint detection in CLOSED FORM: the textbook
    recursion C⁺_t = max(0, C⁺_{t-1} + (x_t − k)) is not a plain
    window — but it equals S_t − min_{i≤t} S_i for the running sum
    S of (x − k) with the virtual S₀ = 0 included in the min, so TWO
    stacked cumulative windows over ONE (user, time) sort compute it
    exactly (the same trick that turns max-drawdown into
    cummax − cum); equivalence with the recursion is pinned in
    tests/test_properties.py. Sums stay in DECIMAL until the
    final subtraction, so the alarm threshold compares bit-identical
    doubles cross-engine. The monitoring primitive for sensor/metric
    drift at scale: one shuffle, no recursion, no UDF.

    Oracle note: the second window must order by a column, and
    ordering by the DECIMAL S_t itself would reorder ties differently
    than Spark — both engines order the min-window by event_id (the
    outer ordering is already (ts, event_id)-sorted per user, and
    running-min over the SAME row order is order-identical)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    wcum = (W.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(W.unboundedPreceding, 0))
    s = ev.select(
        "event_id", "user_id", "ts",
        F.sum((F.col("value") - _CUSUM_K).cast("decimal(38,12)"))
         .over(wcum).alias("s_t"))
    wmin = (W.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(W.unboundedPreceding, 0))
    # the running min must include the virtual S_0 = 0 (empty prefix):
    # C+_t = S_t - min_{0<=i<=t} S_i — without it a series that never
    # dips below zero anchors to S_1 instead of 0
    zero = F.lit(0).cast("decimal(38,12)")
    cusum = (F.col("s_t")
             - F.least(F.min("s_t").over(wmin), zero)).cast("double")
    return (s.select("event_id", "user_id",
                     cusum.alias("cusum_pos"),
                     F.coalesce(cusum > _CUSUM_H, F.lit(False))
                      .alias("drift_alarm")))


# ---------------------------------------------------------------------------
# Chi-squared independence (event_type × day-of-week)
# ---------------------------------------------------------------------------

@query("agg_chi2_independence", oracle=f"""
WITH o AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', ts) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2),
rt AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_tot
       FROM o GROUP BY 1),
ct AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS col_tot FROM o GROUP BY 1),
n AS (SELECT CAST(SUM(obs) AS BIGINT) AS tot FROM o)
SELECT {r6_sql(dsum_sql(
    "(CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)"
    " / CAST(tot AS DOUBLE)) * "
    "(CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)"
    " / CAST(tot AS DOUBLE)) / "
    "(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)"
    " / CAST(tot AS DOUBLE))"))} AS chi2,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
""")
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARED independence test statistic between event_type and
    day-of-week — the drift/data-quality check for "did the category
    mix change by weekday": Σ (O−E)²/E over the contingency table,
    E = row·col/N. The contingency table is one hash aggregate; row
    and column marginals are tiny re-aggregations broadcast back onto
    it; the cell statistic is pure IEEE arithmetic on integer-derived
    doubles (bit-identical cross-engine) and the final Σ runs through
    DECIMAL. Day-of-week via integer days-since-epoch % 7 — NOT
    dayofweek(), whose weekday numbering differs between engines. At
    100 TB only the first aggregate sees the data; everything after is
    domain-sized (|types| × 7 cells)."""
    ev = load_table(spark, sf_dir, "events")
    o = (ev.select("event_type",
                   (F.datediff(F.col("ts"), F.lit("1970-01-01")) % 7)
                   .alias("dow"))
           .groupBy("event_type", "dow")
           .agg(F.count(F.lit(1)).alias("obs")))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    ct = o.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    n = o.agg(F.sum("obs").alias("tot"))
    e = (F.col("row_tot").cast("double") * F.col("col_tot").cast("double")
         / F.col("tot").cast("double"))
    cell = (F.col("obs").cast("double") - e) * (F.col("obs").cast("double")
                                                - e) / e
    return (o.join(F.broadcast(rt), "event_type")
              .join(F.broadcast(ct), "dow")
              .crossJoin(F.broadcast(n))
              .agg(r6(dsum(cell)).alias("chi2"),
                   F.count(F.lit(1)).alias("n_cells")))


# ---------------------------------------------------------------------------
# Rolling correlation (50-row frame, decimal-exact sums)
# ---------------------------------------------------------------------------

_CORR_FRAME = 49  # trailing rows → 50-row frame


def _dsum_over_sql(expr: str) -> str:
    return (f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,12))) OVER w AS DOUBLE)")


@query("win_rolling_corr", oracle=f"""
WITH p AS (
  SELECT event_id, user_id, ts, value AS x,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
q AS (
  SELECT event_id, user_id,
         CAST(COUNT(y) OVER w AS DOUBLE) AS n,
         {_dsum_over_sql('CASE WHEN y IS NOT NULL THEN x END')} AS sx,
         {_dsum_over_sql('y')} AS sy,
         {_dsum_over_sql('CASE WHEN y IS NOT NULL THEN x * x END')} AS sxx,
         {_dsum_over_sql('y * y')} AS syy,
         {_dsum_over_sql('x * y')} AS sxy
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_CORR_FRAME} PRECEDING AND CURRENT ROW))
SELECT event_id, user_id,
       CASE WHEN n >= 3
                 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN {r6_sql('(n * sxy - sx * sy) / '
                         '(sqrt(n * sxx - sx * sx)'
                         ' * sqrt(n * syy - sy * sy))')}
            END AS lag1_corr
FROM q
""")
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING CORRELATION of the series with its own lag-1 (local
    autocorrelation — the regularity/periodicity monitor a streaming
    HRV or metrics pipeline tracks): all five frame sums run through
    DECIMAL over ONE 50-row trailing window, the Pearson assembly is
    scalar IEEE arithmetic (+ sqrt — IEEE-exact, unlike ln/exp), and
    degenerate frames (n < 3 or zero variance) emit NULL on both
    engines. One shuffle on user_id; window and lag share the sort."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value"))
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select("event_id", "user_id", "ts",
                  F.col("value").alias("x"),
                  F.lag("value").over(wl).alias("y"))
    w = wl.rowsBetween(-_CORR_FRAME, 0)

    def ds(c):
        return F.sum(c.cast("decimal(38,12)")).over(w).cast("double")

    xm = F.when(F.col("y").isNotNull(), F.col("x"))
    q = p.select(
        "event_id", "user_id",
        F.count("y").over(w).cast("double").alias("n"),
        ds(xm).alias("sx"), ds(F.col("y")).alias("sy"),
        ds(xm * xm).alias("sxx"), ds(F.col("y") * F.col("y")).alias("syy"),
        ds(F.col("x") * F.col("y")).alias("sxy"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when((F.col("n") >= 3) & (vx > 0) & (vy > 0),
                  r6(num / (F.sqrt(vx) * F.sqrt(vy))))
    return q.select("event_id", "user_id", corr.alias("lag1_corr"))


# ---------------------------------------------------------------------------
# TPC-H Q18 — large-volume customers (agg → HAVING → join back)
# ---------------------------------------------------------------------------

# 300 is the TPC-H spec's substitution range (300..315): it passes
# ~0.3% of orders on this fixture family at every scale (5 / 46 / 473
# qualifying orders at sf0.001/0.01/0.1), which is what makes q18's
# aggregate-before-join shape work — the round-5 value of 150 passed
# ~20% of orders (2.9M at the 100x blow-up), quietly turning the
# "filtered keys" side into a second fact table.
_Q18_QTY = 300.0


@query("sql_tpch_q18", oracle=f"""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {_Q18_QTY})
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""")
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): aggregate the big table
    FIRST (lineitem → per-order quantity, map-side partials), filter
    with HAVING, and only the surviving order keys join back to
    orders/customer — the aggregate-before-join shape that at 100 TB
    turns a lineitem-sized join into a filtered-keys join. Round-6
    plan pass (found at the 100x blow-up, 28.9 s → see BASELINE.md):
    (1) quantity sums are PLAIN double — l_quantity is integer-valued
    1..50 by the TPC-H spec (verified: zero fractional values at any
    fixture scale), and sums of integer-valued doubles are exact below
    2^53, bit-identical cross-engine, so the decimal detour was pure
    cost on the 15M-group rollup; (2) the HAVING side is explicitly
    broadcast — the static planner cannot estimate a post-aggregate
    size, and at the blow-up its pruned-column estimate of ORDERS
    (15M rows) slipped under autoBroadcastJoinThreshold, making the
    driver build a 15M-row hash relation; declaring the selective side
    keeps orders/lineitem un-shuffled at every scale. customer, by
    contrast, SCALES with SF, so its former static hint is demoted
    (round 10) — it earns a broadcast from actual bytes via AQE when
    genuinely small. Top-10 over (o_totalprice DESC, o_orderkey) — a
    total order on scan-native values, hash-safe."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = F.broadcast(
        li.groupBy("l_orderkey")
          .agg(F.sum("l_quantity").alias("sum_qty"))
          .filter(F.col("sum_qty") > _Q18_QTY))
    return (big.join(o, big.l_orderkey == o.o_orderkey)
               .join(c, o.o_custkey == c.c_custkey)
               .select("c_custkey", "c_name", "o_orderkey",
                       "o_totalprice", "sum_qty")
               .orderBy(F.desc("o_totalprice"), "o_orderkey")
               .limit(10))


# ---------------------------------------------------------------------------
# Triangle counting (supplier co-purchase graph)
# ---------------------------------------------------------------------------

@query("graph_triangle_count", oracle="""
WITH e AS (
  SELECT DISTINCT least(l1.l_suppkey, l2.l_suppkey) AS a,
         greatest(l1.l_suppkey, l2.l_suppkey) AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges
FROM e e1 JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
""")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE COUNTING over the supplier co-purchase graph (suppliers
    sharing an order are connected) — the clustering-coefficient /
    community-density primitive next to PageRank and CC, REGIME-
    DISPATCHED (round 11, VERDICT r10 ask 1): a one-aggregate density
    probe over the cached oriented edge set (m edges, n endpoint ids →
    δ = 2m/(n(n−1))) chooses between
      - the SPARSE wedge join (orient low→high, count closing paths
        a→b→c — Suri & Vassilvitskii; join fan-out Σ C(d⁺,2)), and
      - the DENSE packed-neighbor-bitmap intersection
        (graph_triangle_bitmap's plan, operators/graph.py) — on this
        91%-dense fixture 5-6× faster because the wedge join would
        materialize 137M path rows the bitmaps never build.
    Both plans count each triangle exactly once and the SQL oracle is
    implementation-independent, so the dispatch cannot change the
    answer — only the cost. The probe's two driver scalars follow the
    graph_pagerank / dedup-CC precedent (bounded fixpoint/size probes
    are the sanctioned collect sites). At web scale the orientation is
    by DEGREE; id-orientation is the deterministic fixture-scale
    stand-in with identical plan shape. Edge building never leaves the
    JVM."""
    from ..operators.graph import triangle_count_auto
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_suppkey").alias("s2"))
    e = (li.join(l2, (li.l_orderkey == l2.o2) & (li.l_suppkey < l2.s2))
           .select(F.least("l_suppkey", "s2").alias("a"),
                   F.greatest("l_suppkey", "s2").alias("b"))
           .distinct().cache())
    tri, _regime, m_edges = triangle_count_auto(e)
    return tri.withColumn("n_edges", F.lit(m_edges).cast("long"))


# ---------------------------------------------------------------------------
# transformWithState MAP STATE (running distinct count per key)
# ---------------------------------------------------------------------------

def _have_protobuf_r4() -> bool:
    from ..pbcompat import ensure_protobuf
    if not ensure_protobuf():
        return False
    try:
        import google.protobuf.descriptor  # noqa: F401
        return True
    except ImportError:
        return False


_TWS_DISTINCT_ORACLE = """
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
"""


def stream_tws_map_state_distinct(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """transformWithStateInPandas with MAP STATE: per-user running
    DISTINCT event_type count across 4 replayed micro-batches — the
    state-variable family beyond stream_transform_with_state's
    ValueState: one RocksDB map entry per (user, type), so state size
    tracks the distinct DOMAIN (bounded), not the stream length. The
    registered result keeps each user's LAST emission (n_types is
    monotone), which must equal the batch COUNT(DISTINCT) — the merge
    ≡ rebuild contract, proven by the SQL oracle. Same protobuf gate
    as stream_transform_with_state (pbcompat)."""
    from ..streaming import runner
    ev = load_table(spark, sf_dir, "events")
    out = runner.run_tws_distinct_types(spark, ev)
    w = W.partitionBy("user_id").orderBy(F.desc("n_types"))
    return (out.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("user_id", "n_types"))


if _have_protobuf_r4():
    stream_tws_map_state_distinct = query(
        "stream_tws_map_state_distinct",
        oracle=_TWS_DISTINCT_ORACLE)(stream_tws_map_state_distinct)
