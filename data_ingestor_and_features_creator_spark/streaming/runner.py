"""Structured-Streaming execution helpers: the `events` fixture
replayed as a file stream, micro-batch runs under
``trigger(availableNow=True)``, and the stateful/sink stages that only
exist in streaming mode (SURVEY.md §2.10, §3.2 E3).

Every run here is a REAL IncrementalExecution — state store,
watermarks, checkpoints — just driven to completion on the static
fixture, so results are comparable with the batch twin.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec12_sum_py
from ..scratch import scratch_dir
from ..sources import events_stream

_run_counter = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as a file-source stream (same ns→µs conversion as the
    batch catalog; one file ⇒ one availableNow micro-batch). Reader
    lives in sources/readers.py."""
    return events_stream(spark, sf_dir)


def run_available_now(sdf: DataFrame, output_mode: str = "append") -> DataFrame:
    """Drain a streaming DataFrame into a memory sink and return the
    materialized result table."""
    name = f"__stream_out_{next(_run_counter)}_{os.getpid()}"
    q = (sdf.writeStream.format("memory").queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True).start())
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def run_foreach_batch_parquet(sdf: DataFrame) -> DataFrame:
    """`foreachBatch` → partitioned parquet upsert (the §2.1
    sink_parquet path reused per micro-batch); returns the files read
    back. Idempotence at scale comes from partition-overwrite by
    batch_id — here one availableNow batch appends once."""
    out_dir = scratch_dir("stream_sink")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
                 .write.mode("append").partitionBy("event_type")
                 .parquet(out_dir))

    q = (sdf.writeStream.foreachBatch(write_batch)
            .trigger(availableNow=True).start())
    q.awaitTermination()
    return sdf.sparkSession.read.parquet(out_dir)


def run_cdc_apply(spark: SparkSession, events: DataFrame) -> DataFrame:
    """CDC APPLY loop: the keyed change feed is replayed as several
    sequential micro-batches (`maxFilesPerTrigger=1` over a 4-file
    re-split), and `foreachBatch` merges each batch into a versioned
    keyed state table — reduce the batch to newest-per-key, union with
    the previous state version, keep the lexicographically greatest
    (ts, event_id) per key, write state v{batch_id}. The merge is
    associative and order-independent (newest (ts, event_id) wins
    regardless of which batch delivered it), so the final state equals
    the batch last-row-per-key — which is exactly what the SQL oracle
    checks. At scale the state write is the partitioned/bucketed table
    the next batch joins against; no driver-side state anywhere."""
    feed_dir = scratch_dir("cdc_feed")
    state_root = scratch_dir("cdc_state")
    ev = events.select("event_id", "user_id", "ts", "value")
    ev.repartition(4, "event_id").write.mode("overwrite").parquet(feed_dir)

    stream = (spark.readStream.schema(ev.schema)
                   .option("maxFilesPerTrigger", 1)
                   .option("pathGlobFilter", "*.parquet")
                   .parquet(feed_dir))
    holder: dict[str, str | None] = {"prev": None}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = (batch_df.groupBy("user_id")
                     .agg(F.max(F.struct("ts", "event_id", "value"))
                           .alias("m")))
        if holder["prev"] is not None:
            prev = spark.read.parquet(holder["prev"])
            b = (prev.unionByName(b)
                     .groupBy("user_id").agg(F.max("m").alias("m")))
        path = os.path.join(state_root, f"v{batch_id}")
        b.write.mode("overwrite").parquet(path)
        holder["prev"] = path

    q = (stream.writeStream.foreachBatch(apply_batch)
               .trigger(availableNow=True).start())
    q.awaitTermination()
    assert holder["prev"] is not None
    return spark.read.parquet(holder["prev"]).select(
        "user_id",
        F.unix_micros("m.ts").alias("ts_us"),
        F.col("m.event_id").alias("event_id"),
        F.col("m.value").alias("value"),
    )


RUNNING_TOTAL_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _running_total_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                      state: Any) -> Iterator[pd.DataFrame]:
    """Arbitrary stateful aggregation: per-user running (count, sum)
    carried in GroupState across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        # dropna removes NaN too (pandas treats NaN as NA for floats);
        # decimal-exact batch sum so the emitted total matches the SQL
        # oracle's dsum construction bit-for-bit (single-batch replay —
        # cross-batch float re-accumulation would reintroduce ulp drift,
        # documented on the query). The exact path costs ~6 s over the
        # 1M-row sf0.1 sweep vs a plain float sum — the price of a
        # hash-checkable stateful stream; at production scale keep the
        # double sum and verify with the batch-equality test instead.
        total += dec12_sum_py(pdf["value"].dropna().tolist())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total]})


def running_totals_stateful(events_stream: DataFrame) -> DataFrame:
    """`applyInPandasWithState` over the event stream: emits each
    user's running totals at every micro-batch. Watermark bounds how
    long idle-user state survives at scale (NoTimeout here: the
    fixture replay is finite)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    return (events_stream
            .select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _running_total_fn,
                outputStructType=RUNNING_TOTAL_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


# --- transformWithState (Spark 4 arbitrary-state API) ----------------------

TWS_SCHEMA = "user_id long, n_events long, max_value double"


def _make_running_max_processor():
    """Per-user running (count, max) as a Spark-4 StatefulProcessor.

    transformWithStateInPandas is the successor of
    applyInPandasWithState: named state variables on a typed handle,
    timers, and RocksDB-backed stores. State here is one ValueState
    tuple per user; each micro-batch emits the user's updated running
    aggregate, so the LAST emission per user equals the batch answer —
    the equivalence the SQL oracle checks."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "n long, mx double")

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, mx = self._state.get()
            else:
                n, mx = 0, None
            for pdf in rows:
                n += len(pdf)
                vals = pdf["value"].dropna()
                if len(vals):
                    m = float(vals.max())
                    mx = m if mx is None or m > mx else mx
            self._state.update((n, mx))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "max_value": [mx]})

        def close(self) -> None:
            pass

    return RunningMax()


def _make_distinct_types_processor():
    """Per-user running DISTINCT event_type count via MAP STATE — the
    state variable family beyond ValueState: one RocksDB map entry per
    (user, type), so state size tracks the DISTINCT domain (bounded)
    rather than the stream length, exactly how a 100 TB deployment
    keeps per-key cardinality state. Emits the running distinct count
    each batch; the LAST emission equals the batch COUNT(DISTINCT)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class DistinctTypes(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getMapState("seen", "t string", "one long")

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for t in pdf["event_type"].dropna().unique():
                    self._seen.updateValue((str(t),), (1,))
            n = sum(1 for _ in self._seen.keys())
            yield pd.DataFrame({"user_id": [key[0]], "n_types": [n]})

        def close(self) -> None:
            pass

    return DistinctTypes()


def _run_tws(spark: SparkSession, feed: DataFrame, tag: str,
             processor, out_schema: str, n_files: int = 4) -> DataFrame:
    """Replay `feed` as `n_files` micro-batches through
    transformWithStateInPandas (RocksDB state store — required by the
    API and the production-scale choice: state lives off-heap/on-disk
    per executor, not in JVM heap) and return every per-batch
    emission. `n_files` > 4 is the rate-limited soak regime (round 6):
    state survives many more store commits/restores per run."""
    feed_dir = scratch_dir(tag)
    (feed.repartition(n_files, "user_id")
         .write.mode("overwrite").parquet(feed_dir))
    stream = (spark.readStream.schema(feed.schema)
                   .option("maxFilesPerTrigger", 1)
                   .option("pathGlobFilter", "*.parquet")
                   .parquet(feed_dir))
    # The TWS python runners inherit env from the FUNCTION's envVars
    # (sc.environment), not the driver process env — propagate the
    # pbcompat worker shim path or the runner crashes importing
    # StateMessage_pb2 wherever protobuf only exists via the shim.
    from ..pbcompat import ensure_protobuf
    if ensure_protobuf():
        pp = os.environ.get("PYTHONPATH", "")
        if pp and spark.sparkContext.environment.get("PYTHONPATH") != pp:
            spark.sparkContext.environment["PYTHONPATH"] = pp
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        out = (stream.groupBy("user_id")
                     .transformWithStateInPandas(
                         statefulProcessor=processor,
                         outputStructType=out_schema,
                         outputMode="Update",
                         timeMode="None"))
        return run_available_now(out, output_mode="update")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def run_transform_with_state(spark: SparkSession, events: DataFrame,
                             n_files: int = 4) -> DataFrame:
    """ValueState running (count, max) — see _run_tws."""
    return _run_tws(spark, events.select("user_id", "value"), "tws_feed",
                    _make_running_max_processor(), TWS_SCHEMA,
                    n_files=n_files)


def run_tws_distinct_types(spark: SparkSession, events: DataFrame,
                           n_files: int = 4) -> DataFrame:
    """MapState running distinct-type count — see _run_tws."""
    return _run_tws(spark, events.select("user_id", "event_type"),
                    "tws_feed_distinct", _make_distinct_types_processor(),
                    "user_id long, n_types long", n_files=n_files)


def run_tws_soak(spark: SparkSession, events: DataFrame,
                 cycles: int = 4) -> list[dict]:
    """SOAK: N kill/resume cycles over the RocksDB transformWithState
    path — the least-exercised scale surface (VERDICT r4 item 7).

    Each cycle appends one slice of the feed, then starts a FRESH
    streaming query object (a restart: nothing from the previous
    query survives in memory) against the SAME checkpointLocation.
    Exactly-once across restarts requires two recoveries to compose:
    the commit log must skip every already-processed file, and the
    RocksDB snapshot must restore each user's ValueState so running
    aggregates CONTINUE rather than restart from zero (undercount) or
    re-absorb old batches (overcount). The caller asserts the latest
    per-user emission after every cycle equals the batch answer over
    everything fed so far — that equality is violated by either
    failure mode.

    Returns one dict per cycle: rows fed so far, latest per-user
    snapshot rows, and the on-disk RocksDB checkpoint size (logged so
    state growth across cycles is visible — bounded state is the
    100 TB deployability criterion)."""
    feed = events.select("user_id", "value", "event_id")
    base = scratch_dir("tws_soak")
    feed_dir = os.path.join(base, "feed")
    ckpt = os.path.join(base, "ckpt")
    sink = os.path.join(base, "sink")

    from ..pbcompat import ensure_protobuf
    if ensure_protobuf():
        pp = os.environ.get("PYTHONPATH", "")
        if pp and spark.sparkContext.environment.get("PYTHONPATH") != pp:
            spark.sparkContext.environment["PYTHONPATH"] = pp
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    out: list[dict] = []
    try:
        for cycle in range(cycles):
            (feed.filter(F.col("event_id") % cycles == cycle)
                 .drop("event_id").coalesce(1)
                 .write.mode("append").parquet(feed_dir))
            stream = (spark.readStream
                           .schema("user_id long, value double")
                           .option("maxFilesPerTrigger", 1)
                           .option("pathGlobFilter", "*.parquet")
                           .parquet(feed_dir))
            tws = (stream.groupBy("user_id")
                         .transformWithStateInPandas(
                             statefulProcessor=_make_running_max_processor(),
                             outputStructType=TWS_SCHEMA,
                             outputMode="Update",
                             timeMode="None"))

            def write_batch(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.write.mode("append").parquet(sink)

            q = (tws.writeStream.foreachBatch(write_batch)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True).start())
            q.awaitTermination()

            from pyspark.sql import Window as W
            w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
            latest = (spark.read.parquet(sink)
                      .withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") == 1)
                      .select("user_id", "n_events", "max_value").collect())
            state_bytes = 0
            state_dir = os.path.join(ckpt, "state")
            for root, _dirs, files in os.walk(state_dir):
                for f in files:
                    try:
                        state_bytes += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            out.append({
                "cycle": cycle,
                "rows_fed": int(feed.filter(
                    F.col("event_id") % cycles <= cycle).count()),
                "latest": latest,
                "state_bytes": state_bytes,
            })
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
    return out


# --- rate-limited multi-trigger replay (round 6, VERDICT r5 item 7) --------
#
# The availableNow replays above process the fixture in FEW large
# micro-batches (one per feed file). Production streams instead see
# MANY small triggers with the watermark advancing between them — and
# late data arriving after the watermark passed is DROPPED, a loss
# that must be accounted, never silent. The helpers below replay the
# events fixture as n time-ordered files under maxFilesPerTrigger=1
# (one trigger per file), inject genuinely-late rows, and read the
# per-trigger `numRowsDroppedByWatermark` counters so the caller can
# assert the exact conservation law:
#
#     rows_in == rows_aggregated_out + rows_dropped_by_watermark

_LATE_MOD = 97  # deterministic modular gate: ~1% of first-half rows


def _late_flag(late_mod: int = _LATE_MOD):
    """Deterministic late-row predicate PIECE (needs mid_us bound):
    a row is displaced iff it sits in the first half of the timeline
    AND its event_id falls in the 1/late_mod modular gate. RNG-free
    AND plain-SQL-expressible (`event_id % 97 = 0` — no hash function
    needed), so both the batch expectation in tests and the DuckDB
    oracle of the registered op can re-derive the exact same set."""
    return F.pmod(F.col("event_id"), F.lit(late_mod)) == 0


def _move_single_file(tmp_dir: str, feed_dir: str, idx: int,
                      mtime: int) -> None:
    """Move the single part file of a coalesce(1) write into the feed
    dir under a sortable name with a strictly increasing mtime — the
    file source orders pending files by modification time, so mtime IS
    the arrival order."""
    import glob
    import shutil
    part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))
    assert len(part) == 1, part
    dst = os.path.join(feed_dir, f"slice_{idx:04d}.parquet")
    shutil.move(part[0], dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp_dir, ignore_errors=True)


def write_time_sliced_feed(spark: SparkSession, events: DataFrame,
                           tag: str, n_files: int,
                           inject_late: bool) -> tuple[str, dict]:
    """Write `events` as `n_files` contiguous time-range slices (file i
    holds rows in the i-th fraction of [min_ts, max_ts] — range split,
    no global sort), optionally displacing the deterministic ~1%
    late-gate rows of the first half into a final late-arrival file,
    plus a single far-future sentinel row whose trigger pushes the
    watermark past every real window (so append-mode output is
    complete over the real data; the sentinel's own window stays in
    state by design). Returns (feed_dir, stats)."""
    feed_dir = scratch_dir(tag)
    ev = events.select("event_id", "user_id", "event_type", "ts", "value")
    lo_us, hi_us = ev.agg(
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))).first()
    mid_us = lo_us + (hi_us - lo_us) // 2
    is_late = (F.unix_micros("ts") < mid_us) & _late_flag()
    on_time = ev.filter(~is_late) if inject_late else ev
    late = ev.filter(is_late) if inject_late else None

    base_mt = 1_000_000_000  # any fixed epoch; only the ORDER matters
    span = (hi_us - lo_us) // n_files + 1
    for i in range(n_files):
        s, e = lo_us + i * span, lo_us + (i + 1) * span
        tmp = scratch_dir(f"{tag}_tmp")
        (on_time.filter((F.unix_micros("ts") >= s)
                        & (F.unix_micros("ts") < e))
                .coalesce(1).write.mode("overwrite").parquet(tmp))
        _move_single_file(tmp, feed_dir, i, base_mt + i)
    idx = n_files
    n_late = 0
    if late is not None:
        n_late = late.count()
        tmp = scratch_dir(f"{tag}_tmp")
        late.coalesce(1).write.mode("overwrite").parquet(tmp)
        _move_single_file(tmp, feed_dir, idx, base_mt + idx)
        idx += 1
    # sentinel: one row 30 days past the end, on its own trigger
    tmp = scratch_dir(f"{tag}_tmp")
    (spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("__sentinel__").alias("event_type"),
        F.timestamp_micros(F.lit(hi_us + 30 * 86_400_000_000)).alias("ts"),
        F.lit(0.0).alias("value"))
     .coalesce(1).write.mode("overwrite").parquet(tmp))
    _move_single_file(tmp, feed_dir, idx, base_mt + idx)
    return feed_dir, {
        "n_rows": ev.count(), "n_late": n_late, "n_files": idx + 1,
        "mid_us": mid_us,
    }


def run_watermark_drop_accounting(spark: SparkSession, events: DataFrame,
                                  n_files: int = 8) -> dict:
    """MANY-trigger watermarked windowed aggregation with late-data
    injection: replay the time-sliced feed one file per trigger
    (maxFilesPerTrigger=1 under availableNow — the rate limit is
    honored, one micro-batch per file), aggregate 1 h tumbling counts
    under a 2 h watermark in APPEND mode, and account every input row.
    The displaced ~1% rows arrive ~half a timeline late — far beyond
    the watermark — so the state store refuses them and the per-trigger
    `numRowsDroppedByWatermark` counters must sum to EXACTLY the
    injected count; every surviving row must land in an emitted window.

    GRAIN: the stateful key is (window, event_id) — i.e. the streaming
    ingest-audit/dedup grain — NOT the bare window. The reason is what
    makes the counter trustworthy: Spark partial-aggregates each
    micro-batch BEFORE the state operator, so with window-only keys a
    late file's rows collapse into one partial per window and
    `numRowsDroppedByWatermark` counts those PARTIALS (found at the
    1M-row soak: 5,017 late rows → 2,711 counted). With the event-grain
    key every input row is its own group, partial aggregation cannot
    collapse anything, and the counter is exact per input row. The
    per-window counts the caller compares are then derived by a batch
    re-aggregation of the emitted audit rows — same numbers, exact
    accounting. Returns {result rows (ws_us, cnt), out_rows, dropped,
    n_triggers, stats} for the caller's conservation asserts."""
    feed_dir, stats = write_time_sliced_feed(
        spark, events, "wm_acct", n_files, inject_late=True)
    schema = "event_id long, user_id long, event_type string, " \
             "ts timestamp, value double"
    stream = (spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", 1)
                   .option("pathGlobFilter", "*.parquet")
                   .parquet(feed_dir))
    audit = (stream.withWatermark("ts", "2 hours")
                   .groupBy(F.window("ts", "1 hour"), "event_id")
                   .agg(F.count(F.lit(1)).alias("n"))
                   .select(F.unix_micros(F.col("window.start"))
                            .alias("ws_us"), "event_id"))
    name = f"__wm_acct_{next(_run_counter)}_{os.getpid()}"
    q = (audit.writeStream.format("memory").queryName(name)
              .outputMode("append")
              .trigger(availableNow=True).start())
    q.awaitTermination()
    import json as _json
    progresses = [p if isinstance(p, dict) else _json.loads(p.json)
                  for p in q.recentProgress if p is not None]
    dropped = 0
    for p in progresses:
        for so in p.get("stateOperators", []):
            dropped += so.get("numRowsDroppedByWatermark", 0)
    sink = spark.table(name)
    out_rows = sink.count()
    result = (sink.groupBy("ws_us").agg(F.count(F.lit(1)).alias("cnt"))
                  .collect())
    return {
        "result": result,
        "out_rows": out_rows,
        "dropped": dropped,
        "n_triggers": sum(1 for p in progresses
                          if p.get("numInputRows", 0) > 0),
        "stats": stats,
    }


def run_stream_stream_rate_limited(spark: SparkSession,
                                   events: DataFrame,
                                   n_files: int = 8,
                                   outer: bool = False) -> DataFrame:
    """The purchase⋈click interval join replayed under
    maxFilesPerTrigger=1 on BOTH sides (two independent readStream
    handles over one time-sliced feed): state for each side builds and
    EVICTS as the watermark advances trigger-by-trigger — the
    steady-state regime a few big availableNow batches never reach.
    In-order arrival means nothing is late, so the inner join must
    equal the batch range join EXACTLY; the LEFT OUTER variant
    (outer=True) must match on every pair and emit null-extended rows
    only for genuine batch no-matches (the watermark-proved-absent
    contract)."""
    from . import transforms
    feed_dir, _stats = write_time_sliced_feed(
        spark, events, "ss_rate", n_files, inject_late=False)
    schema = "event_id long, user_id long, event_type string, " \
             "ts timestamp, value double"

    def side() -> DataFrame:
        return (spark.readStream.schema(schema)
                     .option("maxFilesPerTrigger", 1)
                     .option("pathGlobFilter", "*.parquet")
                     .parquet(feed_dir)
                     .withWatermark("ts", "2 hours"))

    fn = (transforms.stream_stream_purchase_click_outer if outer
          else transforms.stream_stream_purchase_click)
    return run_available_now(fn(side(), side()))


def run_incremental_mv(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """STREAMING INCREMENTAL MATERIALIZED-VIEW MAINTENANCE — the
    streaming twin of plans.q_round5.maintain_incremental_agg: the
    orders feed replays as 4 sequential micro-batches
    (maxFilesPerTrigger=1) and foreachBatch merges each batch's
    per-customer partials (count + DECIMAL(38,12) sum) into a
    versioned state table — prev state ∪ batch partials → re-agg.
    Decimal partials round-trip through parquet between batches, so
    no float re-accumulation ever happens: after the last batch the
    state equals the one-shot batch aggregate EXACTLY (the SQL oracle
    checks the same full recompute). At scale the state table is
    ~|keys| rows re-aggregated per batch — the rolling-rollup shape
    with streaming progress tracking and restart-offset bookkeeping
    for free."""
    feed_dir = scratch_dir("mv_feed")
    state_root = scratch_dir("mv_state")
    o = orders.select("o_custkey", "o_totalprice")
    o.repartition(4, "o_custkey").write.mode("overwrite").parquet(feed_dir)
    stream = (spark.readStream.schema(o.schema)
                   .option("maxFilesPerTrigger", 1)
                   .option("pathGlobFilter", "*.parquet")
                   .parquet(feed_dir))
    holder: dict[str, str | None] = {"prev": None}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = (batch_df.groupBy("o_custkey")
                     .agg(F.count(F.lit(1)).alias("pn"),
                          F.sum(F.col("o_totalprice")
                                 .cast("decimal(38,12)")).alias("ps")))
        if holder["prev"] is not None:
            prev = spark.read.parquet(holder["prev"])
            b = (prev.unionByName(b)
                     .groupBy("o_custkey")
                     .agg(F.sum("pn").alias("pn"),
                          F.sum("ps").cast("decimal(38,12)").alias("ps")))
        path = os.path.join(state_root, f"v{batch_id}")
        b.write.mode("overwrite").parquet(path)
        holder["prev"] = path

    q = (stream.writeStream.foreachBatch(apply_batch)
               .trigger(availableNow=True).start())
    q.awaitTermination()
    assert holder["prev"] is not None
    return (spark.read.parquet(holder["prev"])
            .select("o_custkey",
                    F.col("pn").alias("n_orders"),
                    F.col("ps").cast("double").alias("total_price")))
