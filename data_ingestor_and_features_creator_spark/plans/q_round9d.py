"""Round-9d operator additions: streaming M4 downsampling (shared
batch≡stream transform), the EXCEPT/INTERSECT [ALL] SQL surface,
ANALYZE-style partition statistics collection, and funnel
time-to-convert percentiles.

Provenance (SURVEY.md §0 applies — empty reference checkout): M4 is
Jugel et al., VLDB 2014 [PK]; EXCEPT/INTERSECT [ALL] are ANSI SQL
set operations [SPARK/PK]; ANALYZE-style column statistics (NDV,
null fraction, min/max) are the standard CBO inputs [PK]; funnel
latency percentiles are standard product analytics [PK].

Float discipline: element picks and counts only — everything here is
integer-exact or an exact element pick emitted unrounded; the one
approximate cell (HLL NDV) is emitted as a bound-check boolean, not a
value (the agg_percentile_approx round-9 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql
from ..streaming import transforms
from .registry import query

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# Streaming M4 (batch twin registered; stream equality in tests)
# ---------------------------------------------------------------------------

@query("stream_m4_downsample", oracle=f"""
WITH f AS (
  SELECT event_type, value, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS us,
         (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS ws_us
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, ws_us
                       ORDER BY us, event_id) AS rf,
    row_number() OVER (PARTITION BY event_type, ws_us
                       ORDER BY us DESC, event_id DESC) AS rl,
    row_number() OVER (PARTITION BY event_type, ws_us
                       ORDER BY value, us, event_id) AS rmn,
    row_number() OVER (PARTITION BY event_type, ws_us
                       ORDER BY value DESC, us DESC, event_id DESC) AS rmx,
    COUNT(*) OVER (PARTITION BY event_type, ws_us) AS n
  FROM f)
SELECT ws_us, event_type, CAST(MAX(n) AS BIGINT) AS n,
       MAX(CASE WHEN rf = 1 THEN value END) AS v_first,
       MAX(CASE WHEN rl = 1 THEN value END) AS v_last,
       MAX(CASE WHEN rmn = 1 THEN value END) AS v_min,
       MAX(CASE WHEN rmx = 1 THEN value END) AS v_max
FROM r GROUP BY ws_us, event_type
""")
def stream_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING M4 [PK — Jugel et al., VLDB 2014 + the §2.10
    batch≡stream strategy]: the time_downsample_m4 reduction computed
    ON the stream — per (event_type, 1 h tumbling window) exact
    first/last/min/max picks through struct-ordered aggregates, which
    run unchanged as a streaming windowed aggregation (state store;
    the per-window state is four structs + a count, O(1) per open
    window) and as a batch hash aggregate. This is how a dashboard
    gets pixel-exact live tiles without landing raw events first.
    Registered path = batch; tests/test_streaming.py re-runs the
    IDENTICAL transform under availableNow and asserts equality, so
    the DuckDB oracle transfers to the stream."""
    return transforms.m4_windowed(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# EXCEPT / INTERSECT [ALL] SQL surface
# ---------------------------------------------------------------------------

@query("sql_except_intersect", oracle="""
WITH open_c AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
big_c AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
x AS (
  SELECT 'except' AS op, o_custkey FROM
    (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM big_c)
  UNION ALL
  SELECT 'intersect', o_custkey FROM
    (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM big_c)
  UNION ALL
  SELECT 'except_all', o_custkey FROM
    (SELECT o_custkey FROM open_c EXCEPT ALL SELECT o_custkey FROM big_c)
  UNION ALL
  SELECT 'intersect_all', o_custkey FROM
    (SELECT o_custkey FROM open_c INTERSECT ALL
     SELECT o_custkey FROM big_c))
SELECT op, o_custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
FROM x GROUP BY op, o_custkey
""")
def sql_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT and their ALL (multiset) variants [SPARK —
    ANSI set operations]: customers with open orders vs customers
    with >200k orders, through all four operators in one result
    (tagged long form, *_ALL multiplicities preserved via the final
    count). The ALL variants are the semantically sharp ones — bag
    difference subtracts MULTIPLICITIES (a customer with three open
    orders and one big order keeps two rows), which no DISTINCT-based
    rewrite reproduces — and both engines implement the identical
    ANSI semantics the oracle re-derives. Set ops plan as hash
    aggregates/joins on the compared columns — same shuffle economics
    as a groupBy at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    open_c = (o.filter(F.col("o_orderstatus") == "O")
               .select("o_custkey"))
    big_c = (o.filter(F.col("o_totalprice") > 200000)
              .select("o_custkey"))
    parts = [
        open_c.subtract(big_c).withColumn("op", F.lit("except")),
        open_c.intersect(big_c).withColumn("op", F.lit("intersect")),
        open_c.exceptAll(big_c).withColumn("op", F.lit("except_all")),
        open_c.intersectAll(big_c)
              .withColumn("op", F.lit("intersect_all")),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy("op", "o_custkey")
             .agg(F.count(F.lit(1)).alias("multiplicity")))


# ---------------------------------------------------------------------------
# ANALYZE-style partition statistics (CBO inputs)
# ---------------------------------------------------------------------------

@query("maintain_analyze_stats", oracle="""
WITH p AS (
  SELECT CAST(ts AS DATE) AS day, user_id, event_type, value
  FROM events),
s AS (
  SELECT day,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_users,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv_types,
         CAST(count_if(value IS NULL OR isnan(value)) AS BIGINT)
           AS n_missing,
         MIN(CASE WHEN NOT isnan(value) THEN value END) AS vmin,
         MAX(CASE WHEN NOT isnan(value) THEN value END) AS vmax,
         CAST(SUM(length(event_type)) AS BIGINT) AS type_bytes
  FROM p GROUP BY day)
SELECT day, n_rows, ndv_users, ndv_types,
       CAST(n_missing * 1000000 // n_rows AS BIGINT) AS missing_ppm,
       vmin, vmax,
       CAST(type_bytes * 1000 // n_rows AS BIGINT) AS avg_type_milli_len,
       ndv_users >= 1 AS approx_ndv_within_5pct
FROM s
""")
def maintain_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-STYLE PARTITION STATISTICS [PK — the standard CBO
    inputs: row count, NDV, null fraction, min/max, average width]
    per day partition — the maintenance job a lakehouse runs after
    ingest so join reordering and broadcast decisions see real
    cardinalities. Exact NDV (count distinct), missing-value PPM
    (integer), min/max with the NaN≡missing house semantic, and
    average event_type width in milli-chars (integer PPM-style). The
    one approximate cell — approx_count_distinct's HLL NDV, the 100
    TB path where exact distinct would dominate — is emitted as a
    BOUND BOOLEAN (|approx − exact| ≤ 5% · exact; HLL at rsd=0.02 is
    ~2.5σ inside that) per the agg_percentile_approx round-9 eval
    pattern: the oracle re-derives the claim's well-formedness and a
    sketch regression flips the Spark side. One hash aggregate per
    partition; Spark plans the multi-distinct via Expand in a single
    pass."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(F.to_date("ts").alias("day"), "user_id",
                  "event_type", "value")
    nn = F.when(~F.isnan("value"), F.col("value"))
    s = p.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("ndv_users"),
        F.approx_count_distinct("user_id", 0.02).alias("ndv_approx"),
        F.countDistinct("event_type").alias("ndv_types"),
        F.count_if(F.col("value").isNull() | F.isnan("value"))
         .alias("n_missing"),
        F.min(nn).alias("vmin"), F.max(nn).alias("vmax"),
        F.sum(F.length("event_type")).alias("type_bytes"))
    return s.select(
        "day", "n_rows", "ndv_users", "ndv_types",
        (F.col("n_missing") * 1000000 / F.col("n_rows"))
        .cast("long").alias("missing_ppm"),
        "vmin", "vmax",
        (F.col("type_bytes") * 1000 / F.col("n_rows"))
        .cast("long").alias("avg_type_milli_len"),
        (F.abs(F.col("ndv_approx") - F.col("ndv_users")) * 20
         <= F.col("ndv_users")).alias("approx_ndv_within_5pct"))


# ---------------------------------------------------------------------------
# Funnel time-to-convert percentiles
# ---------------------------------------------------------------------------

@query("funnel_time_to_convert", oracle="""
WITH su AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL
  GROUP BY user_id),
conv AS (
  SELECT su.user_id,
         MIN(epoch_us(e.ts)) - MAX(su.s_us) AS delay_us
  FROM su JOIN events e
    ON e.user_id = su.user_id AND e.event_type = 'purchase'
   AND epoch_us(e.ts) >= su.s_us
  GROUP BY su.user_id),
r AS (
  SELECT delay_us,
         ROW_NUMBER() OVER (ORDER BY delay_us) AS rn,
         COUNT(*) OVER () AS n
  FROM conv)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM su) AS n_signup_users,
       CAST(MAX(n) AS BIGINT) AS n_converted,
       MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                THEN delay_us END) AS p50_delay_us,
       MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                THEN delay_us END) AS p90_delay_us
FROM r
""")
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNNEL TIME-TO-CONVERT [PK — standard product analytics]: per
    user, the delay from FIRST signup to the first purchase AT OR
    AFTER it; aggregated to conversion count and exact p50/p90 delay
    (discrete rank picks — integer µs, no interpolation, the
    agg_percentile_approx rank convention). The ordered-constraint
    join is the funnel_steps shape (groupBy-min gated on the prior
    stage's timestamp, shuffles on user_id); the percentile rank
    window runs over the CONVERTED-USERS table — one row per user,
    orders of magnitude below the fact table, and the rank pick is a
    single bounded sort (post-aggregation; the unpartitioned-window
    rule's sanctioned class)."""
    ev = load_table(spark, sf_dir, "events")
    su = (ev.filter((F.col("event_type") == "signup")
                    & F.col("user_id").isNotNull())
            .groupBy("user_id")
            .agg(F.min(F.unix_micros("ts")).alias("s_us")))
    pu = (ev.filter(F.col("event_type") == "purchase")
            .select("user_id", F.unix_micros("ts").alias("p_us")))
    conv = (su.join(pu, "user_id")
              .filter(F.col("p_us") >= F.col("s_us"))
              .groupBy("user_id")
              .agg((F.min("p_us") - F.max("s_us")).alias("delay_us")))
    wd = W.orderBy("delay_us")  # converted-users table: bounded
    r = conv.select(
        "delay_us",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"))
    pick = lambda p: F.max(F.when(  # noqa: E731
        F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("delay_us")))
    agg = r.agg(F.max("n").cast("long").alias("n_converted"),
                pick(0.5).alias("p50_delay_us"),
                pick(0.9).alias("p90_delay_us"))
    n_su = su.agg(F.count(F.lit(1)).alias("n_signup_users"))
    return (n_su.crossJoin(F.broadcast(agg))  # two scalar aggregates
                .select("n_signup_users", "n_converted",
                        "p50_delay_us", "p90_delay_us"))


# ---------------------------------------------------------------------------
# Snapshot refs (tags / branches) + rollback
# ---------------------------------------------------------------------------

@query("snapshot_refs_rollback", oracle=f"""
WITH ab AS (
  SELECT value FROM events WHERE event_id % 3 IN (0, 1)),
allr AS (SELECT value FROM events)
SELECT 'tag_release' AS label, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value FROM ab
UNION ALL
SELECT 'branch_main', CAST(COUNT(*) AS BIGINT),
       {dsum_sql('value')} FROM ab
UNION ALL
SELECT 'rollback_head', CAST(COUNT(*) AS BIGINT),
       {dsum_sql('value')} FROM ab
UNION ALL
SELECT 'pre_rollback_v3', CAST(COUNT(*) AS BIGINT),
       {dsum_sql('value')} FROM allr
""")
def snapshot_refs_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAMED REFS + ROLLBACK on the snapshot layer [PK — the Iceberg
    tag/branch/rollback surface, re-expressed on the repo's manifest
    protocol]: commit v1 (ids ≡ 0 mod 3), append v2 (≡ 1), TAG
    'release' at v2 (immutable — the citation form a training run
    records), append v3 (≡ 2), then ROLLBACK to v2 — a NEW commit v4
    whose manifest copies v2's file list, so the bad v3 stays
    time-travelable while the head reads as v2; finally point branch
    'main' at the restored head. The query reads the table FOUR ways
    (tag, branch, head-after-rollback, and explicit v3) and emits each
    read's row count + exact value total: tag/branch/head must equal
    the oracle's direct A∪B derivation, v3 the full set — proving
    tags never move, rollback is O(manifest) state restoration (zero
    data files touched — asserted here), and history survives.
    Concurrency: tag creation and rollback publish through the same
    put-if-absent CAS as commits; branch moves are atomic replaces."""
    import os as _os

    from ..operators import snapshots
    from .registry import scratch_dir
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "event_type", "value"))
    tdir = _os.path.join(scratch_dir("snapshot_refs"), "events_refs")
    snapshots.commit_snapshot(
        ev.filter(F.col("event_id") % 3 == 0).repartition(2, "event_id"),
        tdir, mode="overwrite")
    v2 = snapshots.commit_snapshot(
        ev.filter(F.col("event_id") % 3 == 1).repartition(2, "event_id"),
        tdir, mode="append")
    snapshots.create_tag(tdir, "release", v2)
    v3 = snapshots.commit_snapshot(
        ev.filter(F.col("event_id") % 3 == 2).repartition(2, "event_id"),
        tdir, mode="append")
    files_before = set(snapshots.list_data_files(tdir))
    v4 = snapshots.rollback(tdir, v2)
    if set(snapshots.list_data_files(tdir)) != files_before:
        raise AssertionError("rollback touched data files")
    if v4 != v3 + 1:
        raise AssertionError(f"rollback committed {v4}, expected {v3 + 1}")
    snapshots.set_branch(tdir, "main")

    def agg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.lit(label).alias("label"),
                      F.count(F.lit(1)).alias("n"),
                      dsum("value").alias("total_value"))

    out = agg(snapshots.read_ref(spark, tdir, "tag:release"),
              "tag_release")
    out = out.unionByName(
        agg(snapshots.read_ref(spark, tdir, "branch:main"),
            "branch_main"))
    out = out.unionByName(
        agg(snapshots.read_snapshot(spark, tdir), "rollback_head"))
    out = out.unionByName(
        agg(snapshots.read_snapshot(spark, tdir, version=v3),
            "pre_rollback_v3"))
    return out
