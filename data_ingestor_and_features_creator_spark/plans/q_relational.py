"""Core relational operators: scans/sinks (§2.1), projections/filters
(§2.2), sorts/limits (§2.6), set operations (§2.7).

Each query is the minimal plan that makes the operator's semantics
observable to the oracle. Scan queries keep filters/projections as
Column expressions so Catalyst pushes them into the parquet scan
(verified in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .. import schemas
from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from ..operators.interpolate import interpolate_nan_values
from .registry import query, scratch_dir

_DERIVED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "testdata_derived",
)
_ORDERS_CSV = os.path.join(_DERIVED, "orders_sample.csv")
_BLOBS = os.path.join(_DERIVED, "blobs")

# ---------------------------------------------------------------- §2.1 scans

@query("scan_parquet", oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity >= 45.0
""")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed columnar scan; filter + projection reach the parquet reader."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query("scan_csv", oracle=f"""
SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS order_day,
       o_totalprice
FROM read_csv('{_ORDERS_CSV}', header=true, columns={{
  'o_orderkey':'BIGINT','o_custkey':'BIGINT','o_orderstatus':'VARCHAR',
  'o_totalprice':'DOUBLE','o_orderdate':'TIMESTAMP','o_orderpriority':'VARCHAR'}})
""")
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited read with explicit schema + header + timestamp parsing
    (reference ingests CSV annotation/interval files, SURVEY.md §2.1)."""
    return (
        spark.read.schema(schemas.ORDERS)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(_ORDERS_CSV)
        .select(
            "o_orderkey", "o_orderstatus",
            F.to_date("o_orderdate").alias("order_day"),
            "o_totalprice",
        )
    )


@query("scan_json", oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
""")
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured JSON parse of a string column (events.props)."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.from_json("props", "k INT").alias("p"))
        .select("event_id", F.col("p.k").alias("k"))
    )


@query("scan_binary", oracle=f"""
SELECT CAST(regexp_extract(filename, 'doc_(\\d+)\\.bin', 1) AS BIGINT)
         AS doc_id,
       CAST(size AS BIGINT) AS length,
       sha256(CAST(content AS VARCHAR)) AS content_sha256
FROM read_blob('{_BLOBS}/*.bin')
""")
def scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary ingestion (EDF-recording / multimodal-column analog,
    SURVEY.md §2.1): content stays BinaryType, metadata is typed columns.
    Round-4 oracle upgrade: DuckDB's read_blob reads the same files, and
    sha256-over-VARCHAR equals Spark's sha2-over-binary because these
    blobs are UTF-8 bytes — so the binary source is now hash-checked
    end-to-end (content digest, size, and path-derived id), not just
    executed."""
    return (
        spark.read.format("binaryFile").load(_BLOBS)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
            .cast("long").alias("doc_id"),
            F.col("length"),
            F.sha2(F.col("content"), 256).alias("content_sha256"),
        )
        .orderBy("doc_id")
    )


@query("sink_parquet", oracle=f"""
SELECT event_type, COUNT(*) AS n, {dsum_sql('value')} AS total_value
FROM events GROUP BY event_type
""")
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned columnar write + read-back: per-partition-value counts
    must equal the source, proving the round trip is lossless."""
    out = os.path.join(scratch_dir("sink_parquet"), "events")
    load_table(spark, sf_dir, "events").write.mode("overwrite") \
        .partitionBy("event_type").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    )

@query("sink_csv_json", oracle=f"""
SELECT event_type, COUNT(*) AS n, {dsum_sql('value')} AS total_value
FROM events GROUP BY event_type
""")
def sink_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV and JSON sink round trips (§2.1 sink family): write events
    through both text formats with explicit schema+timestamp options,
    read each back, union, and aggregate halves — equality with the
    parquet-sourced oracle proves BOTH text round trips are lossless
    and type-faithful (each half carries every event exactly once,
    so the union doubles n and total; halved again below)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type",
                                                    "value")
    base = scratch_dir("sink_text")
    csv_out, json_out = os.path.join(base, "csv"), os.path.join(base, "json")
    ev.write.mode("overwrite").option("header", True).csv(csv_out)
    ev.write.mode("overwrite").json(json_out)
    back = (
        spark.read.schema(ev.schema).option("header", True).csv(csv_out)
        .unionAll(spark.read.schema(ev.schema).json(json_out))
    )
    return (back.groupBy("event_type")
            .agg((F.count(F.lit(1)) / 2).cast("long").alias("n"),
                 (dsum("value") / F.lit(2.0)).alias("total_value")))


@query("sink_dynamic_overwrite", oracle=f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql("CASE WHEN event_type = 'click' THEN value * 2 ELSE value END")}
         AS total_value
FROM events GROUP BY event_type
""")
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite — the idempotent-backfill primitive:
    rewriting one day/partition must not clobber its siblings. Write
    the full table hive-partitioned, then overwrite ONLY the 'click'
    partition (values doubled) with partitionOverwriteMode=dynamic;
    the oracle describes the expected merged state, so a static-mode
    regression (which would truncate every other partition) fails the
    row counts immediately. At 100 TB this is how daily reruns land:
    recompute one partition, swap it atomically, leave the rest."""
    out = os.path.join(scratch_dir("sink_dynover"), "events")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type",
                                                    "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    clicks2 = (ev.filter(F.col("event_type") == "click")
                 .withColumn("value", F.col("value") * 2))
    (clicks2.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_type").parquet(out))
    return (spark.read.parquet(out)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value").alias("total_value")))


@query("sink_orc", oracle=f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value
FROM events GROUP BY event_type
""")
def sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/scan round trip — the second columnar format Spark
    ships natively (vectorized reader, predicate pushdown, same
    partitionBy/bucketBy surface as parquet). Equality with the
    parquet-sourced oracle proves the round trip is lossless and
    type-faithful."""
    out = os.path.join(scratch_dir("sink_orc"), "events")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type",
                                                    "value")
    ev.write.mode("overwrite").orc(out)
    return (spark.read.orc(out)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value")))


# ------------------------------------------------- §2.2 projections/filters

@query("project_select", oracle="""
SELECT l_orderkey, l_linenumber,
       l_quantity AS qty,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
""")
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@query("filter_compare", oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_tax
FROM lineitem
WHERE (l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05 AND l_returnflag <> 'R')
   OR (l_tax <= 0.01 AND l_linestatus = 'F')
""")
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity").between(10, 20))
        & (F.col("l_discount") > 0.05)
        & (F.col("l_returnflag") != "R")
    ) | ((F.col("l_tax") <= 0.01) & (F.col("l_linestatus") == "F"))
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")


@query("filter_range_outlier", oracle="""
SELECT event_id, value,
       CASE WHEN value BETWEEN 1.0 AND 250.0 THEN value END AS value_clean
FROM events
""")
def filter_range_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hrvanalysis.remove_outliers semantics (SURVEY.md §2.2 [PK:high]):
    out-of-physiological-range samples become NULL (for later
    interpolation) rather than dropping rows."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "value",
        F.when(F.col("value").between(1.0, 250.0), F.col("value")).alias("value_clean"),
    )


@query("filter_ectopic", oracle="""
WITH d AS (
  SELECT event_id, user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_id, user_id, value FROM d
WHERE prev IS NULL OR ABS(value - prev) <= 0.2 * prev
""")
def filter_ectopic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hrvanalysis.remove_ectopic_beats(method="malik") semantics
    (SURVEY.md §2.2 [PK:high]): drop samples deviating >20% from the
    previous value in the per-record ordered series."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNull()
                | (F.abs(F.col("value") - F.col("prev")) <= 0.2 * F.col("prev")))
        .select("event_id", "user_id", "value")
    )


def _ectopic_filtered(spark: SparkSession, sf_dir: str, method: str,
                      custom_rule: float = 0.2) -> DataFrame:
    """remove_ectopic_beats(method=...) — the public hrvanalysis method
    family [PK:high], stationary interpretation (each beat compared to
    its raw neighbors, same as the malik plan above):

    - malik/custom: |rri − prev| ≤ rule·prev (malik rule = 0.2);
    - kamath: keep if 0 ≤ rri − prev ≤ 0.325·prev (rise) or
      0 ≤ prev − rri ≤ 0.245·prev (drop);
    - karlsson: |mean(prev, next) − rri| < 0.2·mean(prev, next).

    Boundary beats with no neighbor to test against are kept."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    v, prev, nxt = F.col("value"), F.col("prev"), F.col("next")
    d = ev.withColumn("prev", F.lag("value").over(w))
    if method == "kamath":
        keep = prev.isNull() | ((v - prev).between(0, 0.325 * prev)
                                | (prev - v).between(0, 0.245 * prev))
    elif method == "karlsson":
        d = d.withColumn("next", F.lead("value").over(w))
        m = (prev + nxt) / 2
        keep = prev.isNull() | nxt.isNull() | (F.abs(m - v) < 0.2 * m)
    else:  # malik family with a custom threshold
        keep = prev.isNull() | (F.abs(v - prev) <= custom_rule * prev)
    return d.filter(keep).select("event_id", "user_id", "value")


@query("filter_ectopic_kamath", oracle="""
WITH d AS (
  SELECT event_id, user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_id, user_id, value FROM d
WHERE prev IS NULL
   OR (value - prev BETWEEN 0 AND 0.325 * prev)
   OR (prev - value BETWEEN 0 AND 0.245 * prev)
""")
def filter_ectopic_kamath(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ectopic_filtered(spark, sf_dir, "kamath")


@query("filter_ectopic_karlsson", oracle="""
WITH d AS (
  SELECT event_id, user_id, value,
         lag(value)  OVER w AS prev,
         lead(value) OVER w AS next
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, value FROM d
WHERE prev IS NULL OR next IS NULL
   OR ABS((prev + next) / 2 - value) < 0.2 * ((prev + next) / 2)
""")
def filter_ectopic_karlsson(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ectopic_filtered(spark, sf_dir, "karlsson")


@query("filter_ectopic_custom", oracle="""
WITH d AS (
  SELECT event_id, user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_id, user_id, value FROM d
WHERE prev IS NULL OR ABS(value - prev) <= 0.35 * prev
""")
def filter_ectopic_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """custom_removing_rule=0.35 — the malik comparison with a caller-
    chosen threshold (the reference API's escape hatch)."""
    return _ectopic_filtered(spark, sf_dir, "custom", custom_rule=0.35)


@query("filter_null", oracle=f"""
WITH d AS (
  SELECT user_id, value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_rows,
       COUNT(dv) AS n_diff,
       CAST(SUM(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       {dsum_sql('COALESCE(dv, 0.0)')} AS sum_filled
FROM d GROUP BY user_id
""")
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select("user_id", (F.col("value") - F.lag("value").over(w)).alias("dv"))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("dv").alias("n_diff"),
        F.sum(F.when(F.col("dv").isNull(), 1).otherwise(0)).alias("n_null"),
        dsum(F.coalesce("dv", F.lit(0.0))).alias("sum_filled"),
    )


@query("interpolate_nan", oracle=f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN value <= 200.0 THEN value END AS v,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), f AS (
  SELECT event_id, user_id, v, rn,
    last_value(v IGNORE NULLS) OVER wb AS prev_v,
    first_value(v IGNORE NULLS) OVER wa AS next_v,
    last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS prev_rn,
    first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wa AS next_rn
  FROM g
  WINDOW
    wb AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wa AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id,
  {r6_sql("CASE WHEN v IS NOT NULL THEN v "
          "WHEN prev_v IS NULL THEN next_v "
          "WHEN next_v IS NULL THEN prev_v "
          "ELSE prev_v + (next_v - prev_v) * (rn - prev_rn) / (next_rn - prev_rn) END")} AS interp
FROM f
""")
def interpolate_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap-fill of an ordered series (operators/interpolate.py).
    Gaps are injected deterministically (value > 200 → NULL)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("value") <= 200.0, F.col("value"))
    )
    out = interpolate_nan_values(
        ev, "v", order_by=["ts", "event_id"], partition_by=["user_id"], out_col="interp_raw"
    )
    return out.select("event_id", r6(F.col("interp_raw")).alias("interp"))


_INTERP_CTE = """
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN value <= 200.0 THEN value END AS v,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), f AS (
  SELECT event_id, user_id, v, rn,
    last_value(v IGNORE NULLS) OVER wb AS prev_v,
    first_value(v IGNORE NULLS) OVER wa AS next_v,
    last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS prev_rn,
    first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wa AS next_rn
  FROM g
  WINDOW
    wb AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wa AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
"""


@query("interpolate_nearest", oracle=f"""{_INTERP_CTE}
SELECT event_id,
  CASE WHEN v IS NOT NULL THEN v
       WHEN prev_v IS NULL THEN next_v
       WHEN next_v IS NULL THEN prev_v
       WHEN rn - prev_rn <= next_rn - rn THEN prev_v
       ELSE next_v END AS interp_nearest
FROM f
""")
def interpolate_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor gap-fill (method='nearest'): copy the closer
    non-null neighbor, previous wins ties. Pure value copies — no
    arithmetic, so no rounding guard needed."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("value") <= 200.0, F.col("value"))
    )
    out = interpolate_nan_values(
        ev, "v", order_by=["ts", "event_id"], partition_by=["user_id"],
        out_col="interp_nearest", method="nearest",
    )
    return out.select("event_id", "interp_nearest")


@query("interpolate_locf", oracle=f"""{_INTERP_CTE}
SELECT event_id,
  CASE WHEN v IS NOT NULL THEN v
       WHEN prev_v IS NULL THEN next_v
       ELSE prev_v END AS interp_locf
FROM f
""")
def interpolate_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap-fill (method='locf' /
    pandas ffill), leading nulls backfilled from the first value."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("value") <= 200.0, F.col("value"))
    )
    out = interpolate_nan_values(
        ev, "v", order_by=["ts", "event_id"], partition_by=["user_id"],
        out_col="interp_locf", method="locf",
    )
    return out.select("event_id", "interp_locf")


@query("case_when", oracle="""
SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
            WHEN o_totalprice < 300000 THEN 'mid'
            ELSE 'high' END AS tier,
       o_orderpriority,
       COUNT(*) AS n
FROM orders GROUP BY tier, o_orderpriority
""")
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return (
        o.select(tier.alias("tier"), "o_orderpriority")
        .groupBy("tier", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("cast_types", oracle="""
SELECT CAST(l_linenumber AS BIGINT) AS ln_big,
       CAST(l_orderkey AS VARCHAR) AS ok_str,
       CAST(l_shipdate AS DATE) AS ship_day,
       CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int
FROM lineitem
""")
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_linenumber").cast("bigint").alias("ln_big"),
        F.col("l_orderkey").cast("string").alias("ok_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
    )

# ------------------------------------------------------ §2.6 sorts / limits

@query("sort_multikey", oracle="""
WITH d AS (
  SELECT event_id, value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
  FROM events
)
SELECT event_id, dv,
       row_number() OVER (ORDER BY dv DESC NULLS LAST, event_id) AS rn
FROM d
""")
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement; a global row number
    makes the order observable to the order-insensitive oracle hash.

    The global rank uses the TWO-PASS range-partitioned construction
    (data_global_index pattern, round 9: a naive global row_number
    window moves the whole table through ONE task — the 100 TB
    faceplant this registry bans): repartitionByRange on the sort key
    distributes the sort, per-partition counts prefix-sum into a
    32-row broadcast offset table, and intra-partition rank + offset
    is the exact global rank regardless of where the range boundaries
    land."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select("event_id",
                  (F.col("value") - F.lag("value").over(w)).alias("dv"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    r = (d.repartitionByRange(n_parts, F.col("dv").desc_nulls_last(),
                              F.col("event_id"))
          .withColumn("pid", F.spark_partition_id())
          .cache())
    counts = r.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
    w_in = W.partitionBy("pid").orderBy(F.col("dv").desc_nulls_last(),
                                        F.col("event_id"))
    return (r.join(F.broadcast(offsets.select("pid", "offset")), "pid")
             .select("event_id", "dv",
                     (F.col("offset") + F.row_number().over(w_in))
                     .cast("int").alias("rn")))


@query("limit_n", oracle="""
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100
""")
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


@query("topk_global", oracle="""
SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 50
""")
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k: Spark plans TakeOrderedAndProject — a per-
    partition top-k then a k-row merge, no global sort (scale-safe)."""
    return (
        load_table(spark, sf_dir, "events")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(50)
        .select("event_id", "value")
    )

# --------------------------------------------------------- §2.7 set ops

@query("set_union_all", oracle="""
SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
""")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.filter(F.col("event_type") == "purchase").unionByName(
        ev.filter(F.col("event_type") == "error")
    )


@query("set_union_distinct", oracle="""
SELECT user_id, event_type FROM events WHERE value > 100
UNION
SELECT user_id, event_type FROM events WHERE value < 10
""")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    a = ev.filter(F.col("value") > 100).select("user_id", "event_type")
    b = ev.filter(F.col("value") < 10).select("user_id", "event_type")
    return a.union(b).distinct()


@query("set_intersect", oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
""")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@query("set_except", oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'purchase'
""")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (exceptAll): per-user click surplus over
    purchases survives with multiplicity."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.exceptAll(b)
