"""Join operators (SURVEY.md §2.3): equi (inner/outer/semi/anti),
broadcast, cross, range-interval, as-of, and multi-table star joins.

Scale notes per query in docstrings; dims (region/nation/supplier) are
always broadcast — never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql
from ..operators.asof import asof_join, asof_join_nearest
from .registry import query


@query("join_inner_hash", oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
       l.l_extendedprice * (1 - l.l_discount) AS net_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
""")
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst picks broadcast vs shuffle by size, AQE
    can demote a planned SMJ to broadcast at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderstatus",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@query("join_broadcast", oracle="""
SELECT l.l_orderkey, l.l_linenumber, s.s_name, n.n_name
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
""")
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim joins that must execute as broadcasts: zero shuffle of the
    fact table — mandatory shape at 100 TB. nation carries a static
    hint (25-row bounded domain at ANY scale factor); supplier SCALES
    with SF, so it EARNS its broadcast at runtime from actual shuffle
    bytes via the session's AQE threshold (session.py two-threshold
    posture, round 10) — a static hint would OOM the driver when
    supplier reaches cluster scale."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_orderkey", "l_linenumber", "s_name", "n_name")
    )


@query("join_left_outer", oracle="""
SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
""")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "P")
    return c.join(o, cond, "left").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@query("join_full_outer", oracle="""
WITH hi AS (
  SELECT user_id, COUNT(*) AS n_hi FROM events
  WHERE event_type = 'purchase' AND value > 300 GROUP BY user_id
), lo AS (
  SELECT user_id, COUNT(*) AS n_lo FROM events
  WHERE event_type = 'error' AND value < 1 GROUP BY user_id
)
SELECT COALESCE(hi.user_id, lo.user_id) AS user_id, hi.n_hi, lo.n_lo
FROM hi FULL OUTER JOIN lo ON hi.user_id = lo.user_id
""")
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hi = (ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 300))
          .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_hi")))
    lo = (ev.filter((F.col("event_type") == "error") & (F.col("value") < 1))
          .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_lo")))
    # join on the column list → Spark emits a single coalesced user_id
    return hi.join(lo, ["user_id"], "full")


@query("join_semi", oracle="""
SELECT o_orderkey, o_totalprice FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
""")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter: no row multiplication, right side reduced to a
    distinct key set during the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@query("join_anti", oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query("join_cross", oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""")
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane when one side is tiny (it
    broadcasts); the pairwise-similarity ops build on this shape."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query("join_range_interval", oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.us >= p.us AND c.us < p.us + 3600000000
""")
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval theta join (annotation labeling analog,
    SURVEY.md §2.3): clicks within 1 h after a purchase by the same
    user. The equi key (user_id) drives the join; the range predicate
    is a post-join filter, so no cartesian blow-up. Timestamps compared
    as integer epoch-µs — exact under the ns→µs truncation on both
    engines. At scale with NO equi key, bucketize time into
    interval-sized buckets and equi-join on (key, bucket)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"), us.alias("p_us")))
    c = (ev.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id").alias("c_user"), us.alias("c_us")))
    return (
        p.join(c, (F.col("p_user") == F.col("c_user"))
               & (F.col("c_us") >= F.col("p_us"))
               & (F.col("c_us") < F.col("p_us") + 3600000000))
        .select("purchase_id", "click_id")
    )


@query("join_asof", oracle="""
SELECT e.event_id, e.user_id,
       s.event_id AS signup_id_asof,
       epoch_us(e.ts) - epoch_us(s.ts) AS lag_us
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-preceding-event join via operators/asof.py (union +
    IGNORE NULLS window): each event gets the latest same-user signup
    at-or-before it. Oracle uses DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        signups,
        on=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["signup_id", "ts"],
    )
    return joined.select(
        "event_id", "user_id",
        F.col("signup_id_asof"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("lag_us"),
    )


@query("join_asof_forward", oracle="""
SELECT e.event_id, e.user_id,
       s.event_id AS next_signup_id,
       epoch_us(s.ts) - epoch_us(e.ts) AS lead_us
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts <= s.ts
""")
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each event gets the EARLIEST same-user signup
    at-or-after it (merge_asof direction='forward') — same union +
    window machinery as the backward join with the frame flipped to
    first(ignorenulls) over the following rows. Oracle is DuckDB ASOF
    with the inequality reversed."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id"))
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"), signups,
        on=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["signup_id", "ts"], direction="forward")
    return joined.select(
        "event_id", "user_id",
        F.col("signup_id_asof").alias("next_signup_id"),
        (F.unix_micros("ts_asof") - F.unix_micros("ts")).alias("lead_us"))


@query("join_asof_tolerance", oracle="""
SELECT e.event_id, e.user_id,
       CASE WHEN epoch_us(e.ts) - epoch_us(s.ts) <= 86400000000
            THEN s.event_id END AS signup_id_tol
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""")
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 24 h TOLERANCE (merge_asof tolerance=...): a match
    farther back than the tolerance is masked to NULL — 'attach the
    latest calibration, but only if it's recent enough'. The matched
    reference timestamp rides the same window fill, so the mask costs
    no extra shuffle (operators/asof.py)."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id"))
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"), signups,
        on=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["signup_id"], tolerance_us=86_400_000_000)
    return joined.select(
        "event_id", "user_id",
        F.col("signup_id_asof").alias("signup_id_tol"))


@query("join_star_multi", oracle="""
SELECT r.r_name, o.o_orderpriority,
       COUNT(*) AS n_items,
       CAST(CAST(SUM(CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(ROUND(l.l_discount * 100)
                                        AS BIGINT)) AS DECIMAL(30,0)))
                 * 0.0001 AS DECIMAL(38,12)) AS VARCHAR) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r.r_name, o.o_orderpriority
""")
def join_star_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-style star join: one fact shuffle (lineitem⋈orders), every
    dim broadcast; AQE free to reorder. Revenue per region/priority.
    Revenue is INTEGER-CENTS EXACT (round 8, the sql_tpch_q1 path):
    price and discount are exact 2-dp values (pinned by
    tests/test_decimal_path.py), so ROUND(x·100)→BIGINT recovers
    exact cents, the product is exact integer arithmetic, and the
    DECIMAL(30,0) sum is exact at ANY magnitude — emitted as the
    DECIMAL(38,12) FIXED-POINT STRING, which is digit-exact where the
    old double-typed form diverged at the last ulp (6M-row blow-up)
    AND hash-stable where DecimalType output broke the driver (the
    round-7 red). Pure codegen integer math — no per-row string
    round-trip (which cost 178 s / GC-bound variance on q1 at the
    60M-row blow-up)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(
                "CAST(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100)"
                " AS BIGINT) * (100 - CAST(ROUND(l_discount * 100)"
                " AS BIGINT)) AS DECIMAL(30,0))) * 0.0001"
                " AS DECIMAL(38,12)) AS STRING)").alias("revenue"),
        )
    )


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders/customer bucketed+sorted by the join key into the
    session warehouse once per sf_dir; return the table names. The
    write is the amortized cost — every subsequent co-located join
    reads the bucketed layout and skips its shuffle entirely."""
    import re
    import shutil
    from pathlib import Path

    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    to_name, tc_name = f"b_orders_{tag}", f"b_customer_{tag}"
    if not spark.catalog.tableExists(to_name):
        # A fresh session gets a fresh in-memory metastore, but managed-
        # table directories persist in spark-warehouse/ — drop both the
        # catalog entry AND any stale location, or saveAsTable throws
        # LOCATION_ALREADY_EXISTS on the second session.
        warehouse = Path(spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:"))
        for name in (to_name, tc_name):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            stale = warehouse / name
            if stale.exists():
                shutil.rmtree(stale)
        (load_table(spark, sf_dir, "orders").write
            .bucketBy(8, "o_custkey").sortBy("o_custkey")
            .mode("overwrite").saveAsTable(to_name))
        (load_table(spark, sf_dir, "customer").write
            .bucketBy(8, "c_custkey").sortBy("c_custkey")
            .mode("overwrite").saveAsTable(tc_name))
    return to_name, tc_name


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw co-located join (exposed for plan-shape tests)."""
    to_name, tc_name = _bucketed_tables(spark, sf_dir)
    o, c = spark.table(to_name), spark.table(tc_name)
    # merge hint: with both sides bucketed on the key into the same
    # bucket count, SMJ needs NO Exchange on either side (asserted in
    # tests/test_plan_shape.py); broadcast would hide the point here
    return o.hint("merge").join(c, o.o_custkey == c.c_custkey)


@query("upsert_merge", oracle="""
WITH upd AS (
  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 0),
ins AS (
  SELECT o_orderkey + 100000000 AS o_orderkey,
         o_totalprice / 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 1000 = 0),
delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT COALESCE(d.o_orderkey, b.o_orderkey) AS o_orderkey,
       COALESCE(d.o_totalprice, b.o_totalprice) AS o_totalprice,
       CASE WHEN d.o_orderkey IS NULL THEN 'kept'
            WHEN b.o_orderkey IS NULL THEN 'inserted'
            ELSE 'updated' END AS action
FROM orders b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
""")
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics at the engine level (update-matched +
    insert-unmatched in one pass): base FULL OUTER delta on the key,
    COALESCE picks the delta's value where present, and the action
    column records matched/unmatched provenance. The delta here is
    derived deterministically from the base (10% updates, 0.1%
    inserts) with boundary-safe arithmetic (+1000, /2 — bit-identical
    doubles on both engines; ROUND(x*1.1, 2) was observed to straddle
    half-cent HALF_UP/HALF_EVEN boundaries) so the oracle is pure SQL. At scale this is ONE shuffle
    of each side on the merge key — with the base table bucketed on
    the key (see join_bucketed_colocated) the base side's shuffle
    disappears, which is exactly how table formats (Delta/Iceberg)
    execute MERGE; file rewrite/commit is the format's job, the join
    is the engine's."""
    base = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                      "o_totalprice")
    upd = (base.filter(F.col("o_orderkey") % 10 == 0)
               .select("o_orderkey",
                       (F.col("o_totalprice") + 1000.0)
                        .alias("o_totalprice")))
    ins = (base.filter(F.col("o_orderkey") % 1000 == 0)
               .select((F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                       (F.col("o_totalprice") / 2)
                        .alias("o_totalprice")))
    delta = upd.unionAll(ins)
    b, d = base.alias("b"), delta.alias("d")
    joined = b.join(d, F.col("b.o_orderkey") == F.col("d.o_orderkey"),
                    "full_outer")
    return joined.select(
        F.coalesce("d.o_orderkey", "b.o_orderkey").alias("o_orderkey"),
        F.coalesce("d.o_totalprice", "b.o_totalprice")
         .alias("o_totalprice"),
        F.when(F.col("d.o_orderkey").isNull(), "kept")
         .when(F.col("b.o_orderkey").isNull(), "inserted")
         .otherwise("updated").alias("action"),
    )


@query("join_salted_skew", oracle=f"""
WITH dim AS (
  SELECT event_type,
         ({dsum_sql('value')} / CAST(COUNT(*) AS DOUBLE)) AS ev_avg
  FROM events GROUP BY event_type)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('ABS(e.value - d.ev_avg)')} AS total_abs_dev
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type ORDER BY e.event_type
""")
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED join for a skewed fact key — the join-side twin of
    agg_salted_skew (SURVEY.md §4). `events.event_type` has ~6 values
    over the whole fact table: a shuffled join on it lands each key on
    ONE reducer. Salting spreads it: the fact side gets a deterministic
    salt = hash(event_id) % 16, the dim side is exploded ×16 (dim rows
    replicate — cheap, dims are small even when too big to broadcast),
    and the join key becomes (event_type, salt) → 16 reducers per hot
    key. Result ≡ the unsalted join (the oracle is plain SQL): salting
    changes the shuffle shape, never the answer. AQE's skew-join split
    handles most cases at runtime; explicit salting is the tool when
    the skew is known and you want the plan pinned (or the build is a
    stateful/streaming join AQE can't touch). The merge hint forces the
    shuffle path — broadcast would hide the demonstrated mechanics."""
    ev = load_table(spark, sf_dir, "events")
    dim = (ev.groupBy("event_type")
             .agg((dsum("value") / F.count(F.lit(1))).alias("ev_avg")))
    n_salt = 16
    fact = ev.withColumn("__salt",
                         F.pmod(F.xxhash64("event_id"), F.lit(n_salt)))
    dim_x = dim.withColumn("__salt",
                           F.explode(F.sequence(F.lit(0),
                                                F.lit(n_salt - 1))
                                      .cast("array<long>")))
    joined = fact.hint("merge").join(dim_x, ["event_type", "__salt"])
    return (joined.groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("n"),
                       dsum(F.abs(F.col("value") - F.col("ev_avg")))
                           .alias("total_abs_dev"))
                  .orderBy("event_type"))


@query("join_bucketed_colocated", oracle=f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""")
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈dim join via BUCKETING — the design for joins
    too big to broadcast at 100 TB: pre-bucket both tables on the join
    key (same bucket count), and the sort-merge join reads co-located
    buckets with zero Exchange on either side. Bucket count is the
    parallelism unit; at cluster scale pick it for ~128-512 MB per
    bucket per table."""
    joined = bucketed_join(spark, sf_dir)
    return (joined.groupBy("c_mktsegment")
                  .agg(F.count(F.lit(1)).alias("n_orders"),
                       dsum("o_totalprice").alias("total_price"))
                  .orderBy("c_mktsegment"))


@query("join_asof_nearest", oracle="""
WITH s AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'signup'),
b AS (SELECT e.event_id, e.user_id, e.ts, s.event_id AS b_id, s.ts AS b_ts
      FROM events e
      ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts),
f AS (SELECT e.event_id, s.event_id AS f_id, s.ts AS f_ts
      FROM events e
      ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts <= s.ts)
SELECT b.event_id, b.user_id,
       CASE WHEN f_id IS NULL THEN b_id
            WHEN b_id IS NULL THEN f_id
            WHEN epoch_us(b.ts) - epoch_us(b_ts)
                 <= epoch_us(f_ts) - epoch_us(b.ts)
            THEN b_id ELSE f_id END AS nearest_signup_id
FROM b JOIN f ON b.event_id = f.event_id
""")
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of (merge_asof direction='nearest', completing the
    backward/forward/tolerance/nearest family): each event gets the
    same-user signup with the smallest |Δt|, ties to the earlier side.
    One union + one sort yields BOTH directional candidates via two
    frames over the same window ordering — nearest costs the same
    single shuffle as either direction (operators/asof.py,
    asof_join_nearest). The oracle composes DuckDB's two native ASOF
    directions with the identical tie rule."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id"))
    joined = asof_join_nearest(
        ev.select("event_id", "user_id", "ts"), signups,
        on=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["signup_id"])
    return joined.select(
        "event_id", "user_id",
        F.col("signup_id_near").alias("nearest_signup_id"))


@query("join_interval_overlap", oracle="""
WITH iv AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
  FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE))
SELECT a.day, a.user_id AS user_a, b.user_id AS user_b,
       LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS overlap_us
FROM iv a JOIN iv b
  ON a.day = b.day AND a.user_id < b.user_id
 AND a.s_us <= b.e_us AND b.s_us <= a.e_us
""")
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join (Allen 'overlaps' family, beyond the
    point-in-interval join_range_interval): per-(user, day) activity
    intervals, emit every same-day pair whose intervals intersect with
    the exact overlap length. The day block is the scale control: an
    unblocked interval self-join is quadratic, while blocking by a
    coarse time bucket bounds each join partition — the same strategy
    Spark's own range-join hints implement with bin packing. Interval
    ends are exact integer µs so LEAST/GREATEST arithmetic is
    bit-stable."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    iv = (ev.groupBy("user_id",
                     F.to_date(F.date_trunc("day", "ts")).alias("day"))
            .agg(F.min(us).alias("s_us"), F.max(us).alias("e_us")))
    a = iv.select(F.col("user_id").alias("user_a"), "day",
                  F.col("s_us").alias("a_s"), F.col("e_us").alias("a_e"))
    b = iv.select(F.col("user_id").alias("user_b"), F.col("day").alias("d2"),
                  F.col("s_us").alias("b_s"), F.col("e_us").alias("b_e"))
    j = a.join(b, (F.col("day") == F.col("d2"))
               & (F.col("user_a") < F.col("user_b"))
               & (F.col("a_s") <= F.col("b_e"))
               & (F.col("b_s") <= F.col("a_e")))
    return j.select(
        "day", "user_a", "user_b",
        (F.least("a_e", "b_e") - F.greatest("a_s", "b_s"))
        .alias("overlap_us"))


_BAND = 5.0  # |value_a - value_b| tolerance


@query("join_theta_band_bucketed", oracle=f"""
WITH p AS (SELECT event_id AS a_id, value AS a_v FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND NOT isnan(value)),
c AS (SELECT event_id AS b_id, value AS b_v FROM events
      WHERE event_type = 'click' AND value IS NOT NULL
        AND NOT isnan(value))
SELECT a_id, b_id, ROUND(ABS(a_v - b_v), 6) AS dv
FROM p JOIN c ON ABS(a_v - b_v) <= {_BAND}
""")
def join_theta_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAND theta join WITHOUT an equi key (|value_a − value_b| ≤ 5
    between purchases and clicks) executed as an EQUI join via bucket
    blocking: one side buckets by floor(value/band), the other side
    explodes into its bucket ±1 (any in-band partner must land in one
    of those three buckets), equi-join on the bucket id, then the
    exact band filter. This turns what Spark would otherwise plan as
    a broadcast-nested-loop O(n·m) scan into a hash join whose cost
    follows the band selectivity — the same binning trick Spark's
    range-join hints and every interval-join engine use. The 3×
    explode is the bounded fan-out pattern (§4); the oracle is the
    plain theta join, proving the blocking loses no pairs.

    OUTPUT-FAN-OUT lesson (measured at sf0.1, where the band emits
    ~38M pairs from 20k×20k inputs): a plain shuffle equi-join here
    is INPUT-tiny, so AQE coalesces it to ~1 post-shuffle partition
    and a single task produces all 38M rows (15-20 s). Input-based
    sizing — AQE's and any static shuffle-partition count's — cannot
    see fan-out. Fix: round-robin `repartition` the probe side so
    every core streams an even share of the output, and let the
    bucketed build side EARN its broadcast from runtime/static bytes
    (round 10: the former static hint demoted — the click side scales
    with SF, so forcing its broadcast is a driver OOM at cluster
    scale; under the thresholds the executed join is the same
    broadcast that measured 1.2 s warm, 12× over the coalesced
    shuffle join). When BOTH sides are fact-sized the bucket
    equi-join returns — with the probe side repartitioned the same
    way, since the fan-out blindness applies to any input-sized
    planner."""
    ev = load_table(spark, sf_dir, "events")
    ok = F.col("value").isNotNull() & ~F.isnan("value")
    p = (ev.filter((F.col("event_type") == "purchase") & ok)
           .select(F.col("event_id").alias("a_id"),
                   F.col("value").alias("a_v")))
    c = (ev.filter((F.col("event_type") == "click") & ok)
           .select(F.col("event_id").alias("b_id"),
                   F.col("value").alias("b_v")))
    bucket = lambda v: F.floor(F.col(v) / _BAND).cast("long")  # noqa: E731
    pb = p.withColumn("bk", F.explode(F.array(
        bucket("a_v") - 1, bucket("a_v"), bucket("a_v") + 1)))
    pb = pb.repartition(int(spark.conf.get("spark.sql.shuffle.partitions",
                                           "32")))
    cb = c.withColumn("bk", bucket("b_v"))
    j = (pb.join(cb, "bk")
           .filter(F.abs(F.col("a_v") - F.col("b_v")) <= _BAND))
    return j.select("a_id", "b_id",
                    F.round(F.abs(F.col("a_v") - F.col("b_v")), 6)
                     .alias("dv"))
