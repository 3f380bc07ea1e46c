"""Streaming operators (SURVEY.md §2.10) over the `events` stream
table.

Registration strategy (SURVEY.md §2.10 "batch-equivalence"): the
window/session/dedup/join transforms are pure functions
(streaming/transforms.py) registered here on their BATCH path — which
the DuckDB oracle can check exactly — while tests/test_streaming.py
re-runs the same functions under ``trigger(availableNow=True)`` and
asserts batch ≡ stream. The ops that only exist in streaming mode
(source replay, watermark, arbitrary state, foreachBatch sink) run a
REAL micro-batch query inside the registered callable and return the
drained sink table.

Oracle twins use pure integer epoch-µs arithmetic for window starts
(`epoch_us // width * width`) — no timestamp-dialect drift possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum_sql, r6_sql, safe_sqrt_sql
from ..streaming import runner, transforms
from .registry import query

_HOUR = 3_600_000_000
_Q15 = 900_000_000
_GAP = 1_800_000_000


@query("source_stream_events", oracle="""
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
FROM events
""")
def source_stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of `events` through a real availableNow
    micro-batch into a memory sink — the streaming scan itself. The
    oracle proves replay is lossless and type-faithful."""
    stream = runner.read_events_stream(spark, sf_dir)
    out = runner.run_available_now(stream)
    return out.select("event_id", F.unix_micros("ts").alias("ts_us"),
                      "user_id", "event_type", "value", "props")


@query("stream_tumbling", oracle=f"""
SELECT (epoch_us(ts) // {_HOUR}) * {_HOUR} AS ws_us,
       event_type, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events GROUP BY ws_us, event_type
""")
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 h tumbling counts per type — batch path of the shared
    transform (stream twin asserted equal in tests)."""
    return transforms.tumbling_counts(load_table(spark, sf_dir, "events"))


@query("stream_sliding", oracle=f"""
SELECT (epoch_us(ts) // {_Q15}) * {_Q15} - g * {_Q15} AS ws_us,
       event_type, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events, unnest(generate_series(0, 3)) AS t(g)
GROUP BY ws_us, event_type
""")
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 h windows sliding 15 min: each event fans out into exactly 4
    windows — the oracle makes that fan-out explicit via
    generate_series, mirroring §4's bounded-fan-out strategy."""
    return transforms.sliding_counts(load_table(spark, sf_dir, "events"))


@query("stream_session", oracle=f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
     m AS (SELECT user_id, us,
                  CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >= {_GAP} THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
     s AS (SELECT user_id, us,
                  SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) AS sid
           FROM m)
SELECT user_id, MIN(us) AS session_start_us,
       MAX(us) + {_GAP} AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
""")
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 min gap session windows per user via `session_window`; the
    oracle is the classic lag-gap → cumulative-session-id rewrite,
    independently pinning the merge semantics (new session at gap ≥
    30 min; end = last event + gap)."""
    return transforms.session_counts(load_table(spark, sf_dir, "events"))


@query("stream_dedup", oracle="""
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type, date_trunc('day', ts)
    ORDER BY ts, event_id) = 1
""")
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type, day) — the deterministic batch twin
    of streaming dropDuplicatesWithinWatermark (tests compare)."""
    return transforms.dedup_first_per_key(load_table(spark, sf_dir, "events"))


@query("stream_static_join", oracle="""
SELECT event_id, user_id, c_name, c_nationkey, event_type, value
FROM events JOIN customer ON user_id = c_custkey
""")
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side enrichment against a broadcast static dim."""
    return transforms.static_enrich(load_table(spark, sf_dir, "events"),
                                    load_table(spark, sf_dir, "customer"))


@query("stream_stream_join", oracle="""
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
       epoch_us(p.ts) AS p_ts_us, epoch_us(c.ts) AS c_ts_us
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
""")
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase ⋈ same-user clicks in the
    preceding 30 min) — batch path of the shared transform; the
    watermarked streaming twin is asserted equal in tests. The
    interval bound is what makes this viable in streaming mode: state
    for either side is evictable once the watermark passes the bound."""
    ev = load_table(spark, sf_dir, "events")
    return transforms.stream_stream_purchase_click(ev)


@query("stream_watermark", oracle=f"""
SELECT (epoch_us(ts) // {_HOUR}) * {_HOUR} AS ws_us,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM events GROUP BY ws_us
""")
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real windowed streaming aggregation with a 2 h watermark.
    Complete output mode keeps every window for the finite replay so
    the oracle is exact; in production append mode + this watermark
    evicts window state 2 h behind the max event time (§3.2 E3)."""
    stream = runner.read_events_stream(spark, sf_dir)
    agg = (stream.withWatermark("ts", "2 hours")
                 .groupBy(F.window("ts", "1 hour"))
                 .agg(F.count(F.lit(1)).alias("cnt"))
                 .select(F.unix_micros(F.col("window.start")).alias("ws_us"),
                         "cnt"))
    return runner.run_available_now(agg, output_mode="complete")


_SHRV_N = "CAST(COUNT(*) AS DOUBLE)"
_SHRV_VAR = (f"CASE WHEN ({_SHRV_N} - 1.0) <> 0 THEN "
             f"(({dsum_sql('value*value')} - {dsum_sql('value')} * "
             f"{dsum_sql('value')} / {_SHRV_N}) / ({_SHRV_N} - 1.0)) END")


@query("stream_hrv_features", oracle=f"""
SELECT (epoch_us(ts) // {_HOUR}) * {_HOUR} AS ws_us,
       user_id AS record_id,
       CAST(COUNT(*) AS BIGINT) AS n_beats,
       {r6_sql(f"{dsum_sql('value')} / {_SHRV_N}")} AS mean_nni,
       {r6_sql(safe_sqrt_sql(_SHRV_VAR))} AS sdnn,
       {r6_sql(f"{dsum_sql('60000.0/value')} / {_SHRV_N}")} AS mean_hr
FROM events WHERE value > 0
GROUP BY ws_us, record_id
""")
def stream_hrv_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental HRV features — the reference's product computed as
    a STREAM: per (record, 1 h tumbling window), the lag-free subset
    of the time-domain set (mean_nni, sdnn, mean_hr) as exact-sum
    algebraic aggregates the state store can hold as one partial per
    open window. Batch path registered (oracle-checkable); the stream
    twin under availableNow is asserted equal in tests/
    test_streaming.py. rmssd/sdsd need successive-diff state — that's
    stream_stateful's applyInPandasWithState territory."""
    return transforms.hrv_windowed_features(
        load_table(spark, sf_dir, "events"))


@query("stream_stateful", oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                     THEN CAST(value AS DECIMAL(38,12))
                     ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE)
         AS total_value
FROM events GROUP BY user_id
""")
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing (`applyInPandasWithState`):
    per-user running totals carried in GroupState across micro-batches.
    Equality with batch groupBy is asserted in tests. Round-4 oracle
    upgrade (was rows-only): the state kernel accumulates through the
    decimal-exact Python sum (functions.exact.dec12_sum_py), and the
    feed replays as ONE availableNow batch, so the emitted totals are
    bit-identical to the oracle's dsum over the whole table; count
    includes NaN rows (they arrive), the value sum excludes them
    (dropna), both mirrored in the SQL."""
    stream = runner.read_events_stream(spark, sf_dir)
    out = runner.run_available_now(runner.running_totals_stateful(stream),
                                   output_mode="update")
    return out.orderBy("user_id")


@query("stream_sink", oracle="""
SELECT event_id, user_id, event_type, value,
       CAST(0 AS BIGINT) AS batch_id
FROM events
""")
def stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch → partitioned parquet sink, read back. The write
    path is the §2.1 sink (partitionBy event_type) applied per
    micro-batch. Round-4 oracle upgrade (was rows-only "filesystem
    side-effect"): the sink round trip is LOSSLESS and the feed is one
    parquet file consumed by a single availableNow batch, so batch_id
    is deterministically 0 and the read-back must hash-equal the
    source rows — the sink's end-to-end fidelity is now the checked
    contract, not just its execution."""
    stream = runner.read_events_stream(spark, sf_dir)
    out = runner.run_foreach_batch_parquet(
        stream.select("event_id", "user_id", "event_type", "value"))
    return out.select("event_id", "user_id", "event_type", "value",
                      "batch_id").orderBy("event_id")


@query("stream_cdc_apply", oracle="""
SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""")
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply — the streaming twin of upsert_merge: the event feed
    replays as 4 sequential micro-batches, each merged into a
    versioned keyed state table inside foreachBatch (newest
    (ts, event_id) per user wins; see runner.run_cdc_apply for why the
    merge is batch-boundary-independent). The oracle computes
    last-row-per-key directly over the whole feed, so a hash match
    proves the incremental apply converges to the batch answer."""
    return runner.run_cdc_apply(spark, load_table(spark, sf_dir, "events"))


@query("stream_windowed_topk", oracle=f"""
WITH c AS (
  SELECT (epoch_us(ts) // {_HOUR}) * {_HOUR} AS ws_us, event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY ws_us, event_type)
SELECT ws_us, event_type, cnt, rnk FROM (
  SELECT ws_us, event_type, cnt,
         row_number() OVER (PARTITION BY ws_us
                            ORDER BY cnt DESC, event_type) AS rnk
  FROM c)
WHERE rnk <= 3
""")
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour — the windowed-ranking
    dashboard shape (trending items per window). Registered on the
    batch path like the other window transforms; in streaming mode
    this is the classic two-stage pattern: the windowed count is an
    incremental streaming agg, the per-window ranking runs in the
    foreachBatch sink (ranking needs the window CLOSED — a watermark
    decides when). Count-then-rank means the rank stage sees one row
    per (window, type), never raw events."""
    ev = load_table(spark, sf_dir, "events")
    ws = F.expr(f"(unix_micros(ts) div {_HOUR}) * {_HOUR}")
    c = (ev.groupBy(ws.alias("ws_us"), "event_type")
           .agg(F.count(F.lit(1)).alias("cnt")))
    from pyspark.sql import Window as W
    w = W.partitionBy("ws_us").orderBy(F.desc("cnt"), "event_type")
    return (c.withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= 3)
             .select("ws_us", "event_type", "cnt", "rnk"))
