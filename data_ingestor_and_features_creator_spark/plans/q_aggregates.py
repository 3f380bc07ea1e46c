"""Aggregation operators (SURVEY.md §2.4).

Every moment-based statistic (avg/var/skew/kurt/corr/covar) is
assembled from decimal-exact sums (functions/exact.py) so Spark and
DuckDB agree bit-for-bit before the final 6-dp round — their built-in
aggregate kernels use different accumulation algorithms (e.g. Welford
vs naive, and sample-corrected skewness in DuckDB vs population in
Spark), so built-ins are deliberately NOT compared against built-ins.
Higher moments are defined here as population moments: m_k = Σ(x-μ)^k/n,
skew = m3/m2^1.5, kurtosis = m4/m2² − 3 (excess).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (DEC, dcount, dcount_sql, dmean, dmean_sql,
                               dstd_samp, dstd_samp_sql, dsum, dsum_sql,
                               dvar_samp, dvar_samp_sql, r6, r6_sql)
from .registry import query


@query("agg_basic", oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       {dsum_sql('l_quantity')} AS sum_qty,
       {r6_sql(dmean_sql('l_quantity'))} AS avg_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with automatic map-side partial aggregation —
    the shuffle carries one row per (group × partition), not per row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        r6(dmean("l_quantity")).alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query("agg_stddev_var", oracle=f"""
SELECT event_type,
       {r6_sql(dstd_samp_sql('value'))} AS std_value,
       {r6_sql(dvar_samp_sql('value'))} AS var_value
FROM events GROUP BY event_type
""")
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r6(dstd_samp("value")).alias("std_value"),
        r6(dvar_samp("value")).alias("var_value"),
    )


@query("agg_count_distinct", oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag
""")
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct: Spark expands to a two-level aggregate
    (partial distinct per partition, then merge)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("agg_approx_distinct", oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       true AS within_5rsd
FROM lineitem GROUP BY l_returnflag
""")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=2%): the 100 TB path
    where exact distinct's shuffle would dominate. The raw estimate is
    deterministic for a fixed input but engine-specific, so it cannot
    be hash-compared; instead the query emits a BOUNDS CHECK the
    oracle recomputes exactly (the dedup_lsh_recall_eval pattern,
    VERDICT r7 ask #4): |estimate − exact| ≤ 5·rsd·exact, a bound the
    HLL++ guarantee puts ~5 sigma out — the oracle recomputes the
    exact distinct and pins the boolean true, so a broken sketch
    (estimate drifting past 10% of truth) hash-mismatches. Estimate
    TIGHTNESS (the eyeball value) stays pinned by
    tests/test_oracle_parity.py::test_approx_distinct_estimate_quality.
    The boolean is COALESCE-guarded non-null (house rule) and
    non-vacuous by construction: exact_parts ≥ 1 per flag in every
    fixture, so the bound genuinely constrains."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", 0.02)
                  .alias("approx_parts"),
                 F.countDistinct("l_partkey").alias("exact_parts"))
            .select("l_returnflag", "exact_parts",
                    F.coalesce(
                        F.abs(F.col("approx_parts") - F.col("exact_parts"))
                        <= 0.10 * F.col("exact_parts"),
                        F.lit(False)).alias("within_5rsd")))


@query("agg_percentile", oracle=f"""
SELECT event_type,
       {r6_sql('quantile_cont(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.25)')} AS p25,
       {r6_sql('quantile_cont(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.50)')} AS p50,
       {r6_sql('quantile_cont(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.75)')} AS p75
FROM events GROUP BY event_type
""")
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (median_nni analog). NaN is
    mapped to NULL inside the quantile argument (round 6, nulls
    fixture): the engines ORDER NaN differently (Spark sorts it
    greatest, DuckDB's quantile_cont propagates it), while both skip
    NULLs identically — and the group row survives even if every value
    is NaN. At 100 TB use percentile_approx (t-digest) instead — exact
    percentile needs a per-group sort; the approx form is single-pass
    mergeable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r6(F.expr("percentile(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.25)")).alias("p25"),
        r6(F.expr("percentile(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.50)")).alias("p50"),
        r6(F.expr("percentile(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.75)")).alias("p75"),
    )


def _moments(x: Column) -> dict[str, Column]:
    n = dcount(x).cast("double")
    s1, s2 = dsum(x), dsum(x * x)
    s3, s4 = dsum(x * x * x), dsum(x * x * x * x)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu
    m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu * mu * mu * mu
    return {"m2": m2, "m3": m3, "m4": m4}


def _moments_sql(x: str) -> dict[str, str]:
    n = f"CAST({dcount_sql(x)} AS DOUBLE)"
    s1, s2 = dsum_sql(x), dsum_sql(f"({x})*({x})")
    s3 = dsum_sql(f"({x})*({x})*({x})")
    s4 = dsum_sql(f"({x})*({x})*({x})*({x})")
    mu = f"({s1} / {n})"
    m2 = f"({s2} / {n} - {mu} * {mu})"
    m3 = f"({s3} / {n} - 3 * {mu} * {s2} / {n} + 2 * {mu} * {mu} * {mu})"
    m4 = (f"({s4} / {n} - 4 * {mu} * {s3} / {n} + 6 * {mu} * {mu} * {s2} / {n}"
          f" - 3 * {mu} * {mu} * {mu} * {mu})")
    return {"m2": m2, "m3": m3, "m4": m4}


_M = _moments_sql("value")

@query("agg_skew_kurt", oracle=f"""
SELECT event_type,
       {r6_sql(f"{_M['m3']} / POW({_M['m2']}, 1.5)")} AS skew_pop,
       {r6_sql(f"{_M['m4']} / ({_M['m2']} * {_M['m2']}) - 3.0")} AS kurt_excess
FROM events GROUP BY event_type
""")
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = _moments(F.col("value"))
    return ev.groupBy("event_type").agg(
        r6(m["m3"] / F.pow(m["m2"], 1.5)).alias("skew_pop"),
        r6(m["m4"] / (m["m2"] * m["m2"]) - 3.0).alias("kurt_excess"),
    )


@query("agg_minmax_range", oracle="""
SELECT user_id, MAX(value) - MIN(value) AS value_range,
       MIN(value) AS vmin, MAX(value) AS vmax
FROM events GROUP BY user_id
""")
def agg_minmax_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range_nni analog (SURVEY.md §2.9 [PK:high]): max − min is exact
    in doubles — no rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        (F.max("value") - F.min("value")).alias("value_range"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


@query("agg_first_last", oracle="""
SELECT user_id,
       arg_min(value, ts) AS first_value_by_ts,
       arg_max(value, ts) AS last_value_by_ts
FROM events WHERE value IS NOT NULL AND NOT isnan(value)
GROUP BY user_id
""")
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-aware first/last via min_by/max_by — NOT bare groupBy
    first()/last(), which are partition-order-nondeterministic
    (SURVEY.md §2.4 house rule). Semantics pinned to 'first/last
    NON-MISSING reading' (round-9 full-nulls sweep): Spark's min_by
    RETURNS a NULL payload sitting at the extreme timestamp while
    DuckDB's arg_min SKIPS it — the only shared spelling is the
    explicit missing-row filter, which is also the semantic a
    feature pipeline wants."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    return f.groupBy("user_id").agg(
        F.min_by("value", "ts").alias("first_value_by_ts"),
        F.max_by("value", "ts").alias("last_value_by_ts"),
    )


@query("agg_collect", oracle="""
SELECT user_id,
       array_to_string(
         list(CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR) ORDER BY ts, value),
         ',') AS values_by_ts
FROM events
WHERE event_type = 'purchase' AND value IS NOT NULL AND NOT isnan(value)
GROUP BY user_id
""")
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-group gather — the handoff shape for UDF kernels that
    need the whole window series (SURVEY.md §2.9). Order is pinned by
    sorting (ts, value) structs, never by arrival order.

    Joined to a scalar via array_join so the driver canonicalizer can
    hash the result (raw array columns are unhashable in pandas)."""
    ev = (load_table(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase")
                  # missing readings excluded (round-9 nulls sweep):
                  # NaN→DECIMAL faults DuckDB, NULL sorts differently
                  # inside the struct order — NaN≡missing house rule
                  & F.col("value").isNotNull() & ~F.isnan("value")))
    gathered = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "value"))).alias("tv")
    )
    return gathered.select(
        "user_id",
        F.array_join(
            F.transform("tv", lambda x: x.value.cast("decimal(18,6)").cast("string")),
            ",",
        ).alias("values_by_ts"),
    )


_MX = _moments_sql("value")
_CORR_N = "CAST(COUNT(*) AS DOUBLE)"

@query("agg_corr_covar", oracle=f"""
WITH j0 AS (
  SELECT event_type, value,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
  FROM events
),
j AS (
  SELECT * FROM j0
  WHERE value IS NOT NULL AND k IS NOT NULL
    AND NOT isnan(value) AND NOT isnan(k)
)
SELECT event_type,
  {r6_sql(f"(({dsum_sql('value * k')} - {dsum_sql('value')} * {dsum_sql('k')} / {_CORR_N})"
          f" / ({_CORR_N} - 1.0))")} AS covar_vk,
  {r6_sql(f"(({dsum_sql('value * k')} / {_CORR_N} - {dmean_sql('value')} * {dmean_sql('k')})"
          f" / (SQRT({_moments_sql('value')['m2']}) * SQRT({_moments_sql('k')['m2']})))")} AS corr_vk
FROM j GROUP BY event_type
""")
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation / sample covariance (Poincaré-geometry
    dependency, SURVEY.md §2.4) from exact sums. PAIRWISE-COMPLETE
    semantics (round 6, nulls fixture): a row enters the statistics
    only when BOTH coordinates are present and finite — the mixed
    regime (NaN v against a counted k) made the marginal sums and the
    shared n inconsistent between engines. Identical filter text in
    the oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value",
        F.get_json_object("props", "$.k").cast("double").alias("k"),
    )
    v, k = F.col("value"), F.col("k")
    ev = ev.filter(v.isNotNull() & k.isNotNull()
                   & ~F.isnan(v) & ~F.isnan(k))
    n = F.count(F.lit(1)).cast("double")
    sv, sk, svk = dsum("value"), dsum("k"), dsum(F.col("value") * F.col("k"))
    mv = _moments(F.col("value"))["m2"]
    mk = _moments(F.col("k"))["m2"]
    covar = (svk - sv * sk / n) / (n - 1.0)
    corr = (svk / n - (sv / n) * (sk / n)) / (F.sqrt(mv) * F.sqrt(mk))
    return ev.groupBy("event_type").agg(
        r6(covar).alias("covar_vk"), r6(corr).alias("corr_vk")
    )


@query("agg_grouping_sets", oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: subtotals + grand total in one pass (Expand operator —
    each input row fans out once per grouping set before the agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query("agg_having", oracle=f"""
SELECT user_id, COUNT(*) AS n, {r6_sql(dmean_sql('value'))} AS avg_value
FROM events GROUP BY user_id HAVING COUNT(*) >= 50
""")
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter — the min-beats-per-window guard shape
    (SURVEY.md §2.4 [PK:med])."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), r6(dmean("value")).alias("avg_value"))
        .filter(F.col("n") >= 50)
    )


@query("agg_conditional", oracle=f"""
WITH d AS (
  SELECT event_type,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN ABS(dv) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS nni_50_analog,
       {r6_sql("100.0 * SUM(CASE WHEN ABS(dv) > 50 THEN 1 ELSE 0 END)"
               " / CAST(COUNT(dv) AS DOUBLE)")} AS pnni_50_analog
FROM d GROUP BY event_type
""")
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count-if / sum-if — the nni_50/pnni_50 feature shape
    (SURVEY.md §2.4 [PK:high]) on the events stand-in series."""
    from pyspark.sql import Window as W
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select("event_type", (F.col("value") - F.lag("value").over(w)).alias("dv"))
    nni = F.sum(F.when(F.abs("dv") > 50, 1).otherwise(0))
    return d.groupBy("event_type").agg(
        nni.alias("nni_50_analog"),
        r6(100.0 * nni / F.count("dv").cast("double")).alias("pnni_50_analog"),
    )


@query("agg_salted_skew", oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value
FROM events GROUP BY event_type
""")
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation for skewed keys (SURVEY.md §4; the
    100 TB skew valve next to AQE skew-join): phase 1 aggregates on
    (key, salt=hash%16) so one hot key spreads over 16 reducers; phase
    2 combines the partials per key. The result is EXACTLY the plain
    groupBy (the oracle is the unsalted SQL) because count and
    decimal-exact sums are associative — which is the point: salting
    changes the shuffle shape, never the answer. AQE's skew handling
    covers joins; manual salting remains the tool for skewed
    AGGREGATION keys when partial aggregation alone can't keep up
    (e.g. high-cardinality payloads per hot key)."""
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("__salt")
    phase1 = (ev.withColumn("__salt", salt)
                .groupBy("event_type", "__salt")
                .agg(F.count(F.lit(1)).alias("pn"),
                     F.sum(F.col("value").cast(DEC)).alias("pv")))
    return (phase1.groupBy("event_type")
                  .agg(F.sum("pn").alias("n"),
                       F.sum("pv").cast("double").alias("total_value")))


@query("agg_pivot", oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_n,
       CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_n,
       CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_n,
       {dsum_sql('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'F'")} AS f_total,
       {dsum_sql('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'O'")} AS o_total,
       {dsum_sql('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'P'")} AS p_total
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long→wide reshape, one column pair per status value. The
    pivot values are declared explicitly — at scale an undeclared pivot
    adds a whole distinct-scan job just to discover the columns, and
    nondeterministic column order breaks downstream schemas."""
    o = load_table(spark, sf_dir, "orders")
    piv = (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice").alias("total")))
    return (piv.select(
                "o_orderpriority",
                F.col("F_n").alias("f_n"), F.col("O_n").alias("o_n"),
                F.col("P_n").alias("p_n"),
                F.col("F_total").alias("f_total"),
                F.col("O_total").alias("o_total"),
                F.col("P_total").alias("p_total"))
               .na.fill(0, ["f_n", "o_n", "p_n"])
               .orderBy("o_orderpriority"))


@query("unpivot_melt", oracle=f"""
SELECT metric, {dsum_sql('v')} AS total, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem
    UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL SELECT 'discount', l_discount FROM lineitem)
GROUP BY metric ORDER BY metric
""")
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide→long without reading the table once per
    measure — Spark's Expand node emits all three (metric, value) rows
    per input row in one scan, vs the oracle's 3-scan UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric", valueColumnName="v")
    metric = F.regexp_replace("metric", "^l_", "")
    return (long.select(metric.alias("metric"), "v")
                .groupBy("metric")
                .agg(dsum("v").alias("total"),
                     F.count(F.lit(1)).alias("n"))
                .orderBy("metric"))


@query("agg_hll_sketch_merge", oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COUNT(DISTINCT o_custkey) AS exact_custs,
       true AS within_bounds,
       true AS merge_consistent
FROM orders GROUP BY month
""")
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pattern for 100 TB distinct counts: build one
    HLL sketch per day partition (Datasketches binary, `hll_sketch_agg`),
    then `hll_union_agg` merges the partials into per-month estimates —
    the shape that lets daily jobs precompute sketches and any rollup
    combine them without re-scanning raw data. The binary sketch and
    its estimate are engine-specific, so the query emits the TWO
    INVARIANTS that make the pattern sound, both SQL-oracle-able
    (VERDICT r7 ask #4, the dedup_lsh_recall_eval shape):
    `within_bounds` — the merged estimate is within 10% of the exact
    per-month distinct (Datasketches lgK=12 ⇒ rsd ≈ 1.6%, so the bound
    sits ~6 sigma out; a broken union drifts far past it);
    `merge_consistent` — merging daily partials equals building ONE
    sketch over the whole month (merge ≡ rebuild is what licenses
    daily precomputation; both sides computed in-Spark, compared
    exactly). The oracle recomputes the exact distinct and pins both
    booleans true. Month leaves as DATE (house rule: no raw
    timestamps). Estimate tightness stays pinned by
    tests/test_oracle_parity.py."""
    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"),
                       F.date_trunc("day", "o_orderdate").alias("day"))
              .agg(F.hll_sketch_agg("o_custkey").alias("sk")))
    merged = (daily.groupBy("month")
                   .agg(F.hll_sketch_estimate(
                            F.hll_union_agg("sk")).alias("approx_custs")))
    onepass = (o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
                .agg(F.countDistinct("o_custkey").alias("exact_custs"),
                     F.hll_sketch_estimate(
                         F.hll_sketch_agg("o_custkey")).alias("onepass")))
    return (merged.join(onepass, "month")
            .select(F.col("month").cast("date").alias("month"),
                    "exact_custs",
                    F.coalesce(
                        F.abs(F.col("approx_custs") - F.col("exact_custs"))
                        <= 0.10 * F.col("exact_custs"),
                        F.lit(False)).alias("within_bounds"),
                    F.coalesce(F.col("approx_custs") == F.col("onepass"),
                               F.lit(False)).alias("merge_consistent")))


@query("rollup_time_hierarchy", oracle=f"""
SELECT COALESCE(y, DATE '1900-01-01') AS y,
       COALESCE(m, DATE '1900-01-01') AS m,
       COALESCE(d, DATE '1900-01-01') AS d,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value
FROM (SELECT CAST(date_trunc('year', ts) AS DATE) AS y,
             CAST(date_trunc('month', ts) AS DATE) AS m,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             value
      FROM events)
GROUP BY ROLLUP (y, m, d)
""")
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: day/month/year subtotals + grand
    total in ONE scan via ROLLUP (Expand: each row fans into 4 grouping
    sets before the agg). This is the materialized-rollup shape for
    time-series dashboards at 100 TB — the alternative is 4 scans.

    Subtotal rows' NULL keys are coalesced to a 1900-01-01 sentinel:
    NULL dates canonicalize as NaT on the DuckDB→pandas path but None
    on Spark's, which would hash-mismatch rows that are identical."""
    ev = load_table(spark, sf_dir, "events")
    sentinel = F.lit("1900-01-01").cast("date")
    rolled = (ev.select(F.date_trunc("year", "ts").cast("date").alias("y"),
                        F.date_trunc("month", "ts").cast("date").alias("m"),
                        F.date_trunc("day", "ts").cast("date").alias("d"),
                        "value")
                .rollup("y", "m", "d")
                .agg(F.count(F.lit(1)).alias("n"),
                     dsum("value").alias("total_value")))
    return rolled.select(
        F.coalesce("y", sentinel).alias("y"),
        F.coalesce("m", sentinel).alias("m"),
        F.coalesce("d", sentinel).alias("d"),
        "n", "total_value")


@query("agg_percentile_approx", oracle="""
WITH f AS (SELECT event_type, value FROM events
           WHERE value IS NOT NULL AND NOT isnan(value)),
h AS (SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS c
      FROM f GROUP BY event_type, value),
r AS (SELECT event_type, value,
             SUM(c) OVER (PARTITION BY event_type ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h),
k AS (SELECT event_type, value, CAST(cum AS BIGINT) AS cum,
             CAST(n AS BIGINT) AS n,
             GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT)
                          - CAST(CEIL(0.001 * n) AS BIGINT) - 3) AS k_lo,
             CAST(CEIL(0.5 * n) AS BIGINT) AS k_med,
             LEAST(n, CAST(CEIL(0.5 * n) AS BIGINT)
                       + CAST(CEIL(0.001 * n) AS BIGINT) + 3) AS k_hi
      FROM r)
SELECT event_type, MAX(n) AS n,
       MIN(CASE WHEN cum >= k_med THEN value END) AS p50_disc,
       MIN(CASE WHEN cum >= k_lo THEN value END) AS rank_lo,
       MIN(CASE WHEN cum >= k_hi THEN value END) AS rank_hi,
       MIN(CASE WHEN cum >= k_med THEN value END)
         >= MIN(CASE WHEN cum >= k_lo THEN value END)
       AND MIN(CASE WHEN cum >= k_med THEN value END)
         <= MIN(CASE WHEN cum >= k_hi THEN value END)
         AS approx_within_bound
FROM k GROUP BY event_type
""")
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx — the single-pass mergeable quantile sketch
    (Greenwald-Khanna [PK], accuracy=1000 → rank error ≤ n/1000) that
    replaces exact percentile (per-group sort) at 100 TB. Upgraded
    from rows-only to a BOUND EVAL with a full SQL oracle (round 9,
    dedup_lsh_recall_eval precedent): the sketch estimate itself is an
    engine-specific artifact no SQL recomputes, but the GK guarantee —
    the returned value is an ACTUAL ELEMENT whose rank is within ±εn
    of the target — IS deterministic. The op emits the exact order
    statistics at ranks ⌈n/2⌉ and ⌈n/2⌉ ∓ (⌈εn⌉+3) (rank selection,
    not interpolation — both engines pick the same element, so the
    values hash unrounded) plus `approx_within_bound`: Spark checks
    the LIVE sketch value against the rank window; the oracle
    re-derives the same claim for the exact median (true exactly when
    the rank window is well-formed — a sketch regression flips the
    Spark side false and hash-mismatches). Point accuracy stays pinned
    in tests/test_properties.py. Scale note: the exact order
    statistics come from the PER-VALUE HISTOGRAM (2-dp values →
    bounded distinct set; value at rank k = min value whose cumulative
    count ≥ k — the stat_rank_biserial trick), so the eval never
    sorts raw rows: one hash aggregate + a distinct-value cumulative
    window. The production artifact under test remains the single-pass
    mergeable sketch."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    h = f.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("event_type")
    r = h.select(
        "event_type", "value",
        F.sum("c").over(w.orderBy("value")
                         .rowsBetween(W.unboundedPreceding, W.currentRow))
         .alias("cum"),
        F.sum("c").over(w).alias("n"))
    k_med = F.ceil(0.5 * F.col("n"))
    slack = F.ceil(0.001 * F.col("n")) + 3
    k = r.select(
        "event_type", "value", "cum", "n",
        F.greatest(F.lit(1).cast("long"), k_med - slack).alias("k_lo"),
        k_med.alias("k_med"),
        F.least(F.col("n"), k_med + slack).alias("k_hi"))
    picked = lambda kk: F.min(F.when(F.col("cum") >= F.col(kk), F.col("value")))  # noqa: E731
    sk = f.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("p50_approx"))
    agg = k.groupBy("event_type").agg(
        F.max("n").alias("n"),
        picked("k_med").alias("p50_disc"),
        picked("k_lo").alias("rank_lo"),
        picked("k_hi").alias("rank_hi"))
    return (agg.join(F.broadcast(sk), "event_type")
               .select("event_type", "n", "p50_disc", "rank_lo", "rank_hi",
                       ((F.col("p50_approx") >= F.col("rank_lo"))
                        & (F.col("p50_approx") <= F.col("rank_hi")))
                       .alias("approx_within_bound")))


@query("profile_table", oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(value) AS BIGINT) AS value_nulls,
       {r6_sql('MIN(value)')} AS value_min,
       {r6_sql('MAX(value)')} AS value_max,
       {dsum_sql('value')} AS value_sum,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_distinct,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS type_distinct,
       CAST(MIN(ts) AS DATE) AS ts_min_day,
       CAST(MAX(ts) AS DATE) AS ts_max_day
FROM events
""")
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile — the one-pass report every ingest runs
    before training: row/null counts, numeric range + exact sum,
    distinct key cardinalities, time coverage. All in ONE aggregate
    over one scan (Spark plans multi-distinct via Expand, still a
    single pass of the input); at 100 TB swap the exact distincts for
    approx_count_distinct (see agg_approx_distinct) — the report shape
    stays identical."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("value")).alias("value_nulls"),
        r6(F.min("value")).alias("value_min"),
        r6(F.max("value")).alias("value_max"),
        dsum("value").alias("value_sum"),
        F.countDistinct("user_id").alias("user_distinct"),
        F.countDistinct("event_type").alias("type_distinct"),
        F.to_date(F.min("ts")).alias("ts_min_day"),
        F.to_date(F.max("ts")).alias("ts_max_day"),
    )


@query("agg_incremental_state_merge", oracle=f"""
SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS month,
       CAST(COUNT(value) AS BIGINT) AS n_rows,
       {r6_sql(dsum_sql('value'))} AS sum_value,
       {r6_sql(f"({dsum_sql('value')} / COUNT(value))")} AS mean_value,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value
FROM events WHERE value IS NOT NULL
GROUP BY user_id, CAST(date_trunc('month', ts) AS DATE)
""")
def agg_incremental_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL AGGREGATION via mergeable partial states — the
    materialized-rollup maintenance pattern: per-(user, day) partial
    states (count, DECIMAL-exact sum, min, max) are computed first,
    then MERGED into the monthly rollup without touching raw rows
    again. The oracle computes the monthly answer DIRECTLY from raw
    events, so a hash match proves merge ≡ rebuild cross-engine — the
    property that lets a 100 TB pipeline maintain daily states and
    re-aggregate to any coarser grain (week/month/all-time) at state
    cost, not scan cost. The sum state stays DECIMAL(38,12) through
    BOTH levels (associative, order-free); only the published columns
    round. Same precompute contract as agg_hll_sketch_merge, for the
    plain-aggregate family."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (ev.groupBy("user_id", F.to_date("ts").alias("day"))
               .agg(F.count("value").alias("n"),
                    F.sum(F.col("value").cast(DEC)).alias("s"),
                    F.min("value").alias("mn"),
                    F.max("value").alias("mx")))
    monthly = (daily.groupBy("user_id",
                             F.trunc("day", "month").alias("month"))
                    .agg(F.sum("n").alias("n_rows"),
                         F.sum("s").alias("s"),
                         F.min("mn").alias("mn"),
                         F.max("mx").alias("mx")))
    s_dbl = F.col("s").cast("double")
    return monthly.select(
        "user_id", "month",
        F.col("n_rows").cast("long").alias("n_rows"),
        r6(s_dbl).alias("sum_value"),
        r6(s_dbl / F.col("n_rows")).alias("mean_value"),
        r6(F.col("mn")).alias("min_value"),
        r6(F.col("mx")).alias("max_value"),
    )


_HIST_W = 50  # bin width over `value`


@query("agg_histogram_fixed_bins", oracle=f"""
SELECT event_type,
       CAST(FLOOR(value / {_HIST_W}) AS BIGINT) * {_HIST_W} AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM events
WHERE value IS NOT NULL AND NOT isnan(value)
GROUP BY event_type, CAST(FLOOR(value / {_HIST_W}) AS BIGINT) * {_HIST_W}
""")
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event_type — the distribution-profile
    primitive (and the binning step under the HRV triangular index):
    FLOOR(value/width) is exact for doubles on both engines, NaNs are
    excluded explicitly (FLOOR(NaN) casts differently per engine), and
    the output is pure integers. One hash aggregate; at 100 TB the
    per-(type, bin) cardinality is tiny regardless of input size —
    histograms are the canonical map-side-combine win."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
    bin_lo = (F.floor(F.col("value") / _HIST_W).cast("long") * _HIST_W)
    return (ev.groupBy("event_type", bin_lo.alias("bin_lo"))
              .agg(F.count(F.lit(1)).alias("cnt")))
