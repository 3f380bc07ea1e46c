"""Round-6g operator additions: SQL-surface completions and traps.

The FILTER clause, the VALUES table constructor, EXCEPT ALL bag
semantics, and the NULL-ordering default divergence — each either a
same-text dialect pin (identical ANSI on both engines) or an
executable documentation of a cross-engine trap.

Provenance note (SURVEY.md §0 applies — empty reference checkout):
all public-API constructions ([SPARK]/[PK] — ANSI SQL surface).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead
of these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum_str, dsum_str_sql
from .registry import query


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# SQL-standard FILTER clause
# ---------------------------------------------------------------------------

_FILTER_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT)
         AS n_big,
       CAST(COUNT(*) FILTER (WHERE l_discount = 0) AS BIGINT)
         AS n_nodiscount,
       CAST(SUM(CAST(l_quantity AS BIGINT))
            FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


@query("sql_filter_clause", oracle=_FILTER_SQL)
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard aggregate FILTER clause [PK — SQL:2003], ONE
    identical ANSI text on both engines (the q1 dialect-pin pattern):
    `agg(x) FILTER (WHERE p)` is the declarative spelling of
    agg_conditional's CASE-WHEN form — several differently-filtered
    aggregates share ONE scan and ONE hash aggregate (each filter is
    evaluated per-row inside the aggregate, never as separate
    queries). l_quantity is integer-valued (TPC-H spec), so the
    filtered SUM is BIGINT-exact. Scale: one map-side-combined
    aggregate regardless of how many FILTER variants ride it — the
    whole point vs N self-joined subqueries."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_FILTER_SQL)


# ---------------------------------------------------------------------------
# VALUES table constructor
# ---------------------------------------------------------------------------

_VALUES_SQL = """
WITH rates(currency, rate_ppm) AS (
  VALUES ('USD', CAST(1000000 AS BIGINT)),
         ('EUR', CAST(1080000 AS BIGINT)),
         ('GBP', CAST(1260000 AS BIGINT)),
         ('JPY', CAST(6700 AS BIGINT))),
tagged AS (
  SELECT o_orderkey, o_totalprice,
         CASE CAST(o_orderkey % 4 AS INTEGER)
              WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR'
              WHEN 2 THEN 'GBP' ELSE 'JPY' END AS currency
  FROM orders)
SELECT t.currency, r.rate_ppm,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(t.o_totalprice AS DECIMAL(38,12)))
            * r.rate_ppm / 1000000 AS DOUBLE) AS local_total
FROM tagged t JOIN rates r ON t.currency = r.currency
GROUP BY t.currency, r.rate_ppm
"""


@query("sql_values_table", oracle=_VALUES_SQL)
def sql_values_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES TABLE CONSTRUCTOR [PK — ANSI]: the inline literal table
    (here a currency-rate lookup) joined against a real table — ONE
    identical text on both engines, pinning that a CTE-named VALUES
    list with explicit column names and typed literals parses and
    joins identically. This is the canonical shape for small
    reference data embedded in a query (rates, status code maps,
    enum orderings) — at scale the planner folds it into a broadcast
    relation (a VALUES list IS LocalRelation; no scan, no shuffle on
    that side). Rates in integer PPM; the converted total runs the
    DECIMAL path with the PPM division exact (decimal × int /
    1000000)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_VALUES_SQL)


# ---------------------------------------------------------------------------
# EXCEPT ALL bag semantics
# ---------------------------------------------------------------------------

_EXCEPT_ALL_SQL = """
SELECT event_type,
       CAST(FLOOR(CASE WHEN value IS NULL OR isnan(value) THEN -1
                       ELSE value END / 100) AS BIGINT) AS bucket
FROM events WHERE user_id % 3 <> 0
EXCEPT ALL
SELECT event_type,
       CAST(FLOOR(CASE WHEN value IS NULL OR isnan(value) THEN -1
                       ELSE value END / 100) AS BIGINT) AS bucket
FROM events WHERE user_id % 2 = 0
"""


@query("set_except_all", oracle=_EXCEPT_ALL_SQL)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with MULTIPLICITY [PK — ANSI]:
    each row appears max(m−n, 0) times, where set_except's DISTINCT
    form collapses to 0/1 — the completion of the set-op family's
    ALL column (union: both, intersect: both, except: this was the
    gap). One identical text on both engines over overlapping user
    slices (user%3≠0 minus user%2=0 — genuinely intersecting bags,
    so multiplicities matter: a (type, bucket) pair occurring 40 vs
    25 times survives 15 times). Spark plans EXCEPT ALL as a
    generate-count + sum trick (replicate rows by multiplicity
    difference) — one shuffle on the full row key, the same cost
    class as the distinct form."""
    _views(spark, sf_dir, "events")
    return spark.sql(_EXCEPT_ALL_SQL)


# ---------------------------------------------------------------------------
# NULL ordering: the cross-engine DEFAULT divergence, pinned
# ---------------------------------------------------------------------------

@query("sort_nulls_placement", oracle="""
WITH v AS (
  SELECT event_id,
         CASE WHEN isnan(value) THEN NULL ELSE value END AS value
  FROM events WHERE user_id = 1),
marked AS (
  SELECT event_id, value,
         row_number() OVER (ORDER BY value ASC NULLS FIRST, event_id)
           AS rn_nf,
         row_number() OVER (ORDER BY value ASC NULLS LAST, event_id)
           AS rn_nl
  FROM v)
SELECT event_id, value, rn_nf, rn_nl, value IS NULL AS is_null
FROM marked
""")
def sort_nulls_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL ORDERING pinned EXPLICITLY on every sort [PK — ANSI
    leaves it implementation-defined, and the engines chose
    DIFFERENTLY: Spark defaults ASC→NULLS FIRST, DuckDB/Postgres
    ASC→NULLS LAST — the silent divergence that breaks any
    cross-engine rank/top-k the moment a NULL appears]. Both rank
    columns here spell the placement out (NULLS FIRST and NULLS
    LAST side by side over the same nullable column, NaN routed to
    NULL first per the nulls-hardened semantics), so the op is both
    the executable documentation of the trap and the proof that the
    EXPLICIT forms agree exactly. House rule across the registry:
    no ORDER BY on a nullable key without a NULLS clause — this op
    is why. Zero shuffles beyond the single-user window; the rank
    windows PARTITION BY user_id (round 9) — with the filter pinning
    one user the ranks are identical, and per-key ranking is the
    shape that scales when the filter widens."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("user_id") == 1)
           .select("event_id", "user_id",
                   F.when(F.isnan("value"), None)
                    .otherwise(F.col("value")).alias("value")))
    from pyspark.sql import Window as W
    nf = W.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_first(), "event_id")
    nl = W.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_last(), "event_id")
    return (v.withColumn("rn_nf", F.row_number().over(nf))
             .withColumn("rn_nl", F.row_number().over(nl))
             .select("event_id", "value", "rn_nf", "rn_nl",
                     F.col("value").isNull().alias("is_null")))


# ---------------------------------------------------------------------------
# Haversine trip distances (pinned-trig great circles)
# ---------------------------------------------------------------------------

@query("geo_haversine_trips", oracle=f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         (CAST((event_id * 37) % 18000 AS DOUBLE) / 100.0) - 90.0
           AS lat,
         (CAST((event_id * 91) % 36000 AS DOUBLE) / 100.0) - 180.0
           AS lon
  FROM events),
legs AS (
  SELECT user_id, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
d AS (
  SELECT user_id,
         ROUND(12742.0 * asin(sqrt(
             sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
             + cos(radians(plat)) * cos(radians(lat))
               * sin(radians(lon - plon) / 2)
               * sin(radians(lon - plon) / 2))), 9) AS leg_km
  FROM legs WHERE plat IS NOT NULL)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_legs,
       {dsum_str_sql('leg_km')} AS total_km,
       MAX(leg_km) AS longest_leg_km
FROM d GROUP BY user_id
""")
def geo_haversine_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVERSINE TRIP DISTANCES per user [PK — great-circle formula]:
    consecutive-event leg lengths on the sphere, summed to a total
    travel distance — the geo-telemetry staple (fleet mileage,
    mobility radius). Coordinates derive deterministically from
    event ids (the join_spatial_grid convention — the fixture has no
    geo columns; a real deployment maps its lat/lon straight in).
    The pinned-log discipline extended to TRIG: each leg's full
    haversine (4 sin/cos + asin + sqrt) is computed per row and
    pinned to 9 dp BEFORE the DECIMAL sum — per-row 1-ulp libm
    drift cannot accumulate across a user's thousands of legs. The
    totals ship UNROUNDED through dsum_str (round 8, caught by the
    sf1ish sweep of never-driver-sampled ids): the old 6-dp ROUND of
    a sum of 9-dp-PINNED terms is the win_decay_score half-grid class
    — at 1M rows a user's exact 1e-9-grid sum lands on ...5 at the
    7th digit, where Spark HALF_UP (shortest repr) and DuckDB
    HALF_EVEN (exact expansion) split — and legs reach 2e4 km, where
    even the DIRECT double→decimal cast's half-ulp (9e-13 at that
    magnitude) can cross the 1e-12 quantize boundary, so the per-row
    cast routes through STRING too. MAX of bit-identical pinned legs
    is bit-identical — also unrounded. One lag window + one aggregate
    sharing the user_id sort."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W
    pts = ev.select(
        "user_id", "ts", "event_id",
        ((F.col("event_id") * 37 % 18000).cast("double") / 100.0 - 90.0)
        .alias("lat"),
        ((F.col("event_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
        .alias("lon"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    legs = (pts.withColumn("plat", F.lag("lat").over(w))
               .withColumn("plon", F.lag("lon").over(w))
               .filter(F.col("plat").isNotNull()))
    dphi = F.radians(F.col("lat") - F.col("plat")) / 2
    dlam = F.radians(F.col("lon") - F.col("plon")) / 2
    a = (F.sin(dphi) * F.sin(dphi)
         + F.cos(F.radians("plat")) * F.cos(F.radians("lat"))
         * F.sin(dlam) * F.sin(dlam))
    leg = F.round(F.lit(12742.0) * F.asin(F.sqrt(a)), 9)
    d = legs.select("user_id", leg.alias("leg_km"))
    return (d.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_legs"),
                  dsum_str("leg_km").alias("total_km"),
                  F.max("leg_km").alias("longest_leg_km")))


# ---------------------------------------------------------------------------
# Circular mean (the correct average for time-of-day)
# ---------------------------------------------------------------------------

@query("agg_circular_mean", oracle="""
WITH v AS (
  SELECT event_type,
         CAST(epoch_us(ts) % 86400000000 AS DOUBLE)
           / 86400000000.0 * 2 * pi() AS theta
  FROM events),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(sin(theta), 9) AS DECIMAL(38,12)))
              AS DOUBLE) AS ss,
         CAST(SUM(CAST(ROUND(cos(theta), 9) AS DECIMAL(38,12)))
              AS DOUBLE) AS sc
  FROM v GROUP BY event_type)
SELECT event_type, n,
       ROUND((atan2(ss, sc) / (2 * pi()) * 24.0 + 24.0)
             % 24.0, 6) AS mean_hour,
       ROUND(sqrt(ss * ss + sc * sc) / n, 6) AS concentration
FROM s
""")
def agg_circular_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIRCULAR MEAN time-of-day per event_type [PK — directional
    statistics]: the linear average of 23:00 and 01:00 is the absurd
    12:00; the circular mean (atan2 of the summed unit vectors) is
    the correct 00:00 — the statistic behind "when does this
    activity peak". Also emits the resultant length R = |Σe^iθ|/n,
    the concentration measure (1 = all events at the same instant,
    0 = uniform around the clock) — the circular analog of
    1−variance. Per-row sin/cos are pinned 9 dp then DECIMAL-summed
    (the pinned-trig discipline of geo_haversine_trips); atan2/sqrt
    run once per GROUP on bit-identical sums. Time-of-day comes
    from epoch-µs mod 86400e6 — pure integer arithmetic, no
    timezone/dayofweek convention in sight. One map-side-combined
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    theta = ((F.unix_micros("ts") % 86_400_000_000).cast("double")
             / F.lit(86_400_000_000.0) * 2 * F.lit(3.141592653589793))
    v = ev.select("event_type", theta.alias("theta"))
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.sin("theta"), 9).cast("decimal(38,12)"))
         .cast("double").alias("ss"),
        F.sum(F.round(F.cos("theta"), 9).cast("decimal(38,12)"))
         .cast("double").alias("sc"))
    two_pi = F.lit(2 * 3.141592653589793)
    mean_hour = ((F.atan2(F.col("ss"), F.col("sc")) / two_pi * 24.0
                  + 24.0) % 24.0)
    conc = (F.sqrt(F.col("ss") * F.col("ss") + F.col("sc") * F.col("sc"))
            / F.col("n"))
    return s.select("event_type", "n",
                    F.round(mean_hour, 6).alias("mean_hour"),
                    F.round(conc, 6).alias("concentration"))
