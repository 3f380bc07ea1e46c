"""Streaming transforms (SURVEY.md §2.10), written once as pure
DataFrame→DataFrame functions and applied to BOTH `spark.read` and
`spark.readStream` inputs — the batch≡stream equivalence strategy:
the driver's DuckDB oracle checks the batch path, and the streaming
tests (tests/test_streaming.py) re-run the identical transform under
`trigger(availableNow=True)` and assert the results match.

Window starts leave every query as integer epoch-µs (`unix_micros`),
matching the engine-wide timestamp house rule, and making the oracle
twin pure integer arithmetic (`epoch_us // width * width`).

Scale notes: windowed/session aggregations shuffle on (key, window) —
Spark inserts the state store in streaming mode and a plain hash agg in
batch mode from the same code; watermarks bound state (SURVEY.md §3.2
E3). The static-join broadcast hint keeps stream enrichment
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000
Q15_US = 900_000_000
GAP_US = 1_800_000_000  # 30 min session gap


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Per event_type counts in 1 h tumbling windows."""
    w = F.window("ts", "1 hour")
    return (events.groupBy(w, "event_type")
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .select(F.unix_micros(F.col("window.start")).alias("ws_us"),
                          "event_type", "cnt"))


def sliding_counts(events: DataFrame) -> DataFrame:
    """1 h windows sliding every 15 min (each event lands in 4)."""
    w = F.window("ts", "1 hour", "15 minutes")
    return (events.groupBy(w, "event_type")
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .select(F.unix_micros(F.col("window.start")).alias("ws_us"),
                          "event_type", "cnt"))


def session_counts(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 30 min inactivity gap.
    `session_window` runs in batch and streaming alike; end = last
    event + gap."""
    w = F.session_window("ts", "30 minutes")
    return (events.groupBy(w, "user_id")
                  .agg(F.count(F.lit(1)).alias("n_events"))
                  .select("user_id",
                          F.unix_micros(F.col("session_window.start"))
                           .alias("session_start_us"),
                          F.unix_micros(F.col("session_window.end"))
                           .alias("session_end_us"),
                          "n_events"))


def dedup_first_per_key(events: DataFrame) -> DataFrame:
    """First event per (user, type, day) — deterministic batch form of
    streaming dropDuplicates (which keeps an arbitrary row; here the
    earliest by (ts, event_id) so the oracle is total-ordered)."""
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    w = W.partitionBy("user_id", "event_type", "day").orderBy("ts", "event_id")
    return (events.select("event_id", "ts", "user_id", "event_type", "value",
                          day)
                  .withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .select("event_id", F.unix_micros("ts").alias("ts_us"),
                          "user_id", "event_type", "day"))


def static_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream↔static dim join: the dim side should broadcast so stream
    enrichment never shuffles the stream side — but customer SCALES
    with SF, so it earns that broadcast from the planner's size
    thresholds rather than a static hint (round-10 demotion: a forced
    broadcast of a grown dim OOMs the driver at cluster scale; when
    the dim genuinely outgrows memory, the scale answer is a
    pre-bucketed static side or a state-store lookup, not a hint)."""
    dim = customer.select(F.col("c_custkey").alias("user_id"),
                          "c_name", "c_nationkey")
    return (events.join(dim, "user_id")
                  .select("event_id", "user_id", "c_name", "c_nationkey",
                          "event_type", "value"))


def stream_stream_purchase_click(events: DataFrame,
                                 events_b: DataFrame | None = None) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding 30 minutes. In streaming mode both
    sides buffer in the state store and the time-bound condition lets
    Spark evict rows older than the interval (with watermarks on both
    sides); in batch mode the identical condition is a plain range
    join. ``events_b`` lets the streaming test pass a second readStream
    of the same source (self-joins of one stream handle require two
    logical sources)."""
    right = events_b if events_b is not None else events
    p = (events.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id"),
                 F.col("ts").alias("p_ts")))
    c = (right.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts")))
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.c_ts < p.p_ts),
    )
    return joined.select(
        "purchase_id", "user_id", "click_id",
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("c_ts").alias("c_ts_us"),
    )


def hrv_windowed_features(events: DataFrame) -> DataFrame:
    """Streaming HRV features — the reference's PRODUCT shape run
    incrementally: per (record, 1 h tumbling window), the lag-free
    subset of the time-domain feature set (mean_nni, sdnn, mean_hr,
    n_beats). These are closed-form distributive/algebraic aggregates
    (exact sums + count), so the state store holds one partial per
    open window and the identical code runs batch and stream.
    rmssd/sdsd need successive-diff state → that's the
    applyInPandasWithState path (stream_stateful), not a window agg.
    Exact-sum + assemble-in-double math per functions/exact.py house
    rules, so the batch path is bit-stable against the DuckDB oracle."""
    from ..functions.exact import DEC, r6, safe_div, safe_sqrt

    rr = events.filter(F.col("value") > 0)
    w = F.window("ts", "1 hour")
    n = F.count("value").cast("double")
    sx = F.sum(F.col("value").cast(DEC)).cast("double")
    sxx = F.sum((F.col("value") * F.col("value")).cast(DEC)).cast("double")
    shr = F.sum((F.lit(60000.0) / F.col("value")).cast(DEC)).cast("double")
    agg = rr.groupBy(w, "user_id").agg(
        n.alias("n"), sx.alias("sx"), sxx.alias("sxx"), shr.alias("shr"))
    var = safe_div(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
                   F.col("n") - 1.0)
    return agg.select(
        F.unix_micros(F.col("window.start")).alias("ws_us"),
        F.col("user_id").alias("record_id"),
        F.col("n").cast("long").alias("n_beats"),
        r6(F.col("sx") / F.col("n")).alias("mean_nni"),
        r6(safe_sqrt(var)).alias("sdnn"),
        r6(F.col("shr") / F.col("n")).alias("mean_hr"),
    )


def stream_stream_purchase_click_outer(events: DataFrame,
                                       events_b: DataFrame | None = None
                                       ) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits —
    with its matching prior-30-min clicks when they exist, or once with
    NULL click columns when none do. In streaming mode the outer side
    is the semantically hard part: an unmatched purchase can only be
    emitted once the watermark proves no matching click can still
    arrive (state eviction doubles as the no-match decision); in batch
    the identical condition is a plain left outer range join, which is
    what the oracle checks."""
    right = events_b if events_b is not None else events
    p = (events.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id"),
                 F.col("ts").alias("p_ts")))
    c = (right.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts")))
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.c_ts < p.p_ts),
        "left_outer",
    )
    return joined.select(
        "purchase_id", "user_id", "click_id",
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("c_ts").alias("c_ts_us"),
    )


def m4_windowed(events: DataFrame) -> DataFrame:
    """M4 downsampling per (event_type, 1 h tumbling window): exact
    FIRST/LAST/MIN/MAX picks via struct-ordered aggregates (value
    ties → earliest min / latest max; the time_downsample_m4
    total-order rule). Plain aggregates, so the identical code runs
    as a streaming windowed aggregation (state store) and a batch
    hash aggregate — the dashboard-tile reduction computed ON the
    stream instead of after landing."""
    ok = F.col("value").isNotNull() & ~F.isnan("value")
    e = (events.filter(ok)
               .withColumn("us", F.unix_micros("ts")))
    w = F.window("ts", "1 hour")
    return (e.groupBy(w, "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min(F.struct("us", "event_id", "value")).alias("pf"),
                  F.max(F.struct("us", "event_id", "value")).alias("pl"),
                  F.min(F.struct("value", "us", "event_id")).alias("pmn"),
                  F.max(F.struct("value", "us", "event_id")).alias("pmx"))
             .select(F.unix_micros(F.col("window.start")).alias("ws_us"),
                     "event_type", "n",
                     F.col("pf.value").alias("v_first"),
                     F.col("pl.value").alias("v_last"),
                     F.col("pmn.value").alias("v_min"),
                     F.col("pmx.value").alias("v_max")))
