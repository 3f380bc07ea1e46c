"""Batch ≡ stream equivalence (SURVEY.md §5 item 3): every shared
transform must produce identical results via `spark.read` and via
`spark.readStream` + availableNow — this is what makes the DuckDB
check of the batch path transfer to the streaming path.

Plus streaming-only semantics: dropDuplicatesWithinWatermark, stateful
running totals vs batch aggregation, watermark presence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark.catalog import load_table
from data_ingestor_and_features_creator_spark.streaming import (runner,
                                                                transforms)


@pytest.fixture(autouse=True)
def _few_parts(few_shuffle_partitions):
    """Every streaming test runs with 4 state/shuffle partitions —
    see conftest.few_shuffle_partitions (round 12: state-store
    machinery is per-partition-per-trigger and dominated this module's
    224 s wall at the session's 32)."""
    yield


def _rows(df, *key):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def ev_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture()
def ev_stream(spark, sf_dir):
    return runner.read_events_stream(spark, sf_dir)


def test_tumbling_batch_equals_stream(spark, sf_dir, ev_batch, ev_stream):
    batch = _rows(transforms.tumbling_counts(ev_batch))
    stream = _rows(runner.run_available_now(
        transforms.tumbling_counts(ev_stream), output_mode="complete"))
    assert batch == stream


def test_sliding_batch_equals_stream(spark, sf_dir, ev_batch, ev_stream):
    batch = _rows(transforms.sliding_counts(ev_batch))
    stream = _rows(runner.run_available_now(
        transforms.sliding_counts(ev_stream), output_mode="complete"))
    assert batch == stream


def test_session_batch_equals_stream(spark, sf_dir, ev_batch, ev_stream):
    batch = _rows(transforms.session_counts(ev_batch))
    stream = _rows(runner.run_available_now(
        transforms.session_counts(ev_stream), output_mode="complete"))
    assert batch == stream


def test_static_join_batch_equals_stream(spark, sf_dir, ev_batch, ev_stream):
    cust = load_table(spark, sf_dir, "customer")
    batch = _rows(transforms.static_enrich(ev_batch, cust))
    stream = _rows(runner.run_available_now(
        transforms.static_enrich(ev_stream, cust)))
    assert batch == stream


def test_stream_dedup_within_watermark_matches_batch_keys(
        spark, sf_dir, ev_batch, ev_stream):
    """Streaming dedup keeps an arbitrary row per key; the batch twin
    keeps the earliest — key SETS must agree."""
    keyed = (ev_stream
             .withColumn("day", F.date_trunc("day", "ts").cast("date"))
             .withWatermark("ts", "1 day")
             .dropDuplicatesWithinWatermark(["user_id", "event_type", "day"]))
    stream_keys = sorted((r["user_id"], r["event_type"], r["day"]) for r in
                         runner.run_available_now(keyed).collect())
    batch_keys = sorted((r["user_id"], r["event_type"], r["day"]) for r in
                        transforms.dedup_first_per_key(ev_batch).collect())
    assert stream_keys == batch_keys


def test_stateful_running_totals_match_batch_agg(spark, sf_dir, ev_batch,
                                                 ev_stream):
    out = runner.run_available_now(
        runner.running_totals_stateful(ev_stream), output_mode="update")
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in out.collect()}
    expect = {r["user_id"]: (r["n"], r["s"]) for r in
              ev_batch.groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum("value").alias("s")).collect()}
    assert got.keys() == expect.keys()
    for u, (n, s) in expect.items():
        assert got[u][0] == n
        assert got[u][1] == pytest.approx(s, rel=1e-9)


def test_foreach_batch_sink_roundtrip(spark, sf_dir, ev_stream):
    out = runner.run_foreach_batch_parquet(
        ev_stream.select("event_id", "user_id", "event_type", "value"))
    n_src = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_src
    assert out.select("event_id").distinct().count() == n_src
    assert set(out.columns) == {"event_id", "user_id", "event_type",
                                "value", "batch_id"}


def test_stream_stream_join_batch_equals_stream(spark, sf_dir, ev_batch):
    """Stream-stream interval join with watermarks on both sides must
    reproduce the batch range join exactly under availableNow."""
    left = runner.read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    right = runner.read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    stream = _rows(runner.run_available_now(
        transforms.stream_stream_purchase_click(left, right)))
    batch = _rows(transforms.stream_stream_purchase_click(ev_batch))
    assert stream == batch


def test_hrv_features_batch_equals_stream(spark, sf_dir, ev_batch, ev_stream):
    batch = _rows(transforms.hrv_windowed_features(ev_batch))
    stream = _rows(runner.run_available_now(
        transforms.hrv_windowed_features(ev_stream), output_mode="complete"))
    assert batch == stream


def test_stream_stream_left_outer_stream_subset_of_batch(spark, sf_dir,
                                                         ev_batch):
    """LEFT OUTER stream-stream join under availableNow: every matched
    pair must equal the batch join, and every unmatched emission must
    be a genuine batch-side no-match. The streamed result may lack the
    LAST unmatched purchases (the final watermark never advances past
    them to prove no click can come), so the assertion is
    matched-exact + unmatched-subset — exactly the semantics the
    watermark contract promises on a finite replay."""
    left = runner.read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    right = runner.read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    stream = _rows(runner.run_available_now(
        transforms.stream_stream_purchase_click_outer(left, right)))
    batch = _rows(transforms.stream_stream_purchase_click_outer(ev_batch))
    s_matched = {r for r in stream if r[2] is not None}
    b_matched = {r for r in batch if r[2] is not None}
    assert s_matched == b_matched
    b_unmatched = {r for r in batch if r[2] is None}
    s_unmatched = {r for r in stream if r[2] is None}
    assert s_unmatched <= b_unmatched


def test_transform_with_state_equals_batch_aggregate(spark, sf_dir):
    """transformWithStateInPandas (4 replayed micro-batches, RocksDB
    state store) must converge to the batch GROUP BY answer: each
    user's final emission carries the full (count, max). Auto-skips
    where no usable google.protobuf runtime exists (pbcompat found
    none) — the implementation stays exercised wherever the dependency
    does exist."""
    from data_ingestor_and_features_creator_spark.pbcompat import (
        ensure_protobuf)
    if not ensure_protobuf():
        pytest.skip("no usable google.protobuf runtime on this machine")
    from pyspark.sql import Window as W
    ev = load_table(spark, sf_dir, "events")
    out = runner.run_transform_with_state(spark, ev)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = {(r["user_id"], r["n_events"], r["max_value"])
             for r in out.withColumn("rn", F.row_number().over(w))
                         .filter(F.col("rn") == 1).collect()}
    batch = {(r["user_id"], r["n"], r["mx"])
             for r in ev.groupBy("user_id")
                        .agg(F.count(F.lit(1)).alias("n"),
                             F.max("value").alias("mx")).collect()}
    assert final == batch


def test_tws_map_state_distinct_equals_batch(spark, sf_dir):
    """MapState running distinct-count must converge to the batch
    COUNT(DISTINCT). Auto-skips without a usable protobuf runtime."""
    from data_ingestor_and_features_creator_spark.pbcompat import (
        ensure_protobuf)
    if not ensure_protobuf():
        pytest.skip("no usable google.protobuf runtime on this machine")
    ev = load_table(spark, sf_dir, "events")
    out = runner.run_tws_distinct_types(spark, ev)
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy(F.desc("n_types"))
    final = {(r["user_id"], r["n_types"])
             for r in out.withColumn("rn", F.row_number().over(w))
                         .filter(F.col("rn") == 1).collect()}
    batch = {(r["user_id"], r["n"])
             for r in ev.groupBy("user_id")
                        .agg(F.countDistinct("event_type").alias("n"))
                        .collect()}
    assert final == batch


def test_checkpoint_resume_no_reprocessing(spark, sf_dir):
    """EXACTLY-ONCE RESUME: drain a file stream with a checkpoint,
    append NEW files, restart the SAME query against the SAME
    checkpoint — the second run must emit only the new files' rows
    (the committed offsets survive the restart), and a fresh
    checkpoint over the full feed must see everything. This is the
    recovery contract a 100 TB deployment leans on after every
    executor/driver loss."""
    import os

    from pyspark.sql import functions as F

    from data_ingestor_and_features_creator_spark.catalog import load_table
    from data_ingestor_and_features_creator_spark.scratch import scratch_dir

    base = scratch_dir("ckpt_resume")
    feed = os.path.join(base, "feed")
    ckpt = os.path.join(base, "ckpt")
    sink = os.path.join(base, "sink")
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id", "value"))
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(feed)

    def drain():
        q = (spark.readStream.schema(ev.schema).parquet(feed)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(sink).count()
    assert n_first == first.count()
    second.coalesce(1).write.mode("append").parquet(feed)
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == ev.count()  # no duplicates from re-run
    assert (out.select(F.sum("event_id")).first()[0]
            == ev.select(F.sum("event_id")).first()[0])


def test_tws_soak_kill_resume_cycles(spark, sf_dir):
    """N=4 kill/resume cycles over the RocksDB transformWithState path
    (VERDICT r4 item 7): every cycle appends a feed slice, restarts a
    FRESH query on the SAME checkpoint, and the latest per-user
    emission must equal the batch (count, max) over everything fed so
    far — re-processing a committed file overcounts, losing the
    RocksDB snapshot undercounts; equality rules out both each cycle.
    Cycle row counts and state sizes are printed for the soak log.
    Auto-skips without a usable protobuf runtime."""
    from data_ingestor_and_features_creator_spark.pbcompat import (
        ensure_protobuf)
    if not ensure_protobuf():
        pytest.skip("no usable google.protobuf runtime on this machine")
    cycles = 4
    ev = load_table(spark, sf_dir, "events")
    report = runner.run_tws_soak(spark, ev, cycles=cycles)
    assert len(report) == cycles
    for entry in report:
        cycle = entry["cycle"]
        got = {(r["user_id"], r["n_events"], r["max_value"])
               for r in entry["latest"]}
        fed = ev.filter(F.col("event_id") % cycles <= cycle)
        exp = {(r["user_id"], r["n"], r["mx"])
               for r in fed.groupBy("user_id")
                           .agg(F.count(F.lit(1)).alias("n"),
                                F.max("value").alias("mx")).collect()}
        assert got == exp, f"cycle {cycle}: resume broke exactly-once"
        assert entry["state_bytes"] > 0, "no RocksDB state on disk"
        print(f"soak cycle {cycle}: rows_fed={entry['rows_fed']} "
              f"users={len(got)} state_bytes={entry['state_bytes']}")
    # State must stay bounded by the user domain, not stream length:
    # the store holds ONE value per user, so byte growth cycle-over-
    # cycle stays within a small multiple of the first snapshot.
    sizes = [e["state_bytes"] for e in report]
    assert sizes[-1] < 10 * max(sizes[0], 1)


# --- rate-limited multi-trigger replay (round 6, VERDICT r5 item 7) --------


def test_watermark_drops_are_accounted_not_silent(spark, sf_dir, ev_batch):
    """MANY-trigger replay (maxFilesPerTrigger=1 over time-ordered
    slices) with genuinely-late rows injected: the deterministic ~1%
    late-gate subset of the first-half rows arrives AFTER the watermark
    passed half a timeline ago, so the windowed aggregate must drop
    every one of them — and the per-trigger
    `numRowsDroppedByWatermark` counters must account the loss exactly:

        rows_in == sum(window counts out) + dropped    (conservation)
        dropped == n_injected                          (only they drop)

    plus the emitted windows must equal the batch aggregate over the
    surviving rows window-for-window, and there must be one trigger per
    feed file (the rate limit is real, not one big batch)."""
    rep = runner.run_watermark_drop_accounting(spark, ev_batch, n_files=8)
    stats = rep["stats"]
    assert stats["n_late"] > 0, "fixture produced no late-gate rows"
    # the rate limit produced one micro-batch per file
    assert rep["n_triggers"] >= stats["n_files"]
    # conservation: every input row is either aggregated or accounted
    out_total = sum(r["cnt"] for r in rep["result"])
    assert out_total + rep["dropped"] == stats["n_rows"]
    # exactly the injected rows were dropped
    assert rep["dropped"] == stats["n_late"]
    # window-for-window equality against the batch agg over survivors
    mid_us = stats["mid_us"]
    surviving = ev_batch.filter(
        ~((F.unix_micros("ts") < mid_us)
          & (F.pmod(F.col("event_id"), F.lit(97)) == 0)))
    exp = {(r["ws_us"], r["cnt"]) for r in
           (surviving.groupBy(F.window("ts", "1 hour"))
                     .agg(F.count(F.lit(1)).alias("cnt"))
                     .select(F.unix_micros(F.col("window.start"))
                              .alias("ws_us"), "cnt")).collect()}
    got = {(r["ws_us"], r["cnt"]) for r in rep["result"]}
    assert got == exp


def test_stream_stream_join_rate_limited_many_triggers(spark, sf_dir,
                                                       ev_batch):
    """The purchase⋈click interval join under maxFilesPerTrigger=1 on
    BOTH sides: join state builds and evicts trigger-by-trigger as the
    watermark advances, and the in-order replay must still reproduce
    the batch range join exactly."""
    stream = _rows(runner.run_stream_stream_rate_limited(
        spark, ev_batch, n_files=8))
    batch = _rows(transforms.stream_stream_purchase_click(ev_batch))
    assert stream == batch


def test_tws_rate_limited_many_triggers(spark, sf_dir, ev_batch):
    """ValueState + MapState transformWithState under a 12-file
    rate-limited replay (3x the default trigger count): the final
    per-user emission must equal the batch answer — state must survive
    12 RocksDB commit/restore rounds, not 4. Auto-skips without a
    usable protobuf runtime."""
    from data_ingestor_and_features_creator_spark.pbcompat import (
        ensure_protobuf)
    if not ensure_protobuf():
        pytest.skip("no usable google.protobuf runtime on this machine")
    from pyspark.sql import Window as W
    out = runner.run_transform_with_state(spark, ev_batch, n_files=12)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    latest = (out.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") == 1)
                 .select("user_id", "n_events", "max_value"))
    got = {tuple(r) for r in latest.collect()}
    exp = {tuple(r) for r in
           ev_batch.groupBy("user_id")
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.max("value").alias("mx")).collect()}
    assert got == exp

    out2 = runner.run_tws_distinct_types(spark, ev_batch, n_files=12)
    w2 = W.partitionBy("user_id").orderBy(F.desc("n_types"))
    latest2 = (out2.withColumn("rn", F.row_number().over(w2))
                   .filter(F.col("rn") == 1)
                   .select("user_id", "n_types"))
    got2 = {tuple(r) for r in latest2.collect()}
    exp2 = {tuple(r) for r in
            ev_batch.groupBy("user_id")
                    .agg(F.count_distinct("event_type").alias("n"))
                    .collect()}
    assert got2 == exp2


def test_pbcompat_gate_status_is_explicit(spark):
    """VERDICT r5 carry-forward risk 1 / ask 8: the transformWithState
    trio's protobuf runtime comes from a machine-local SDK path outside
    the repo's control, and a vanished SDK must surface as a VISIBLE
    status change in pytest output — never as silently-absent registry
    ids. Gate ON: both TWS ids must be registered (de-registration
    with a live runtime is a bug). Gate OFF: skip loudly, naming the
    de-registered ids, so the skip-count delta is the signal."""
    from data_ingestor_and_features_creator_spark import plans
    from data_ingestor_and_features_creator_spark.pbcompat import (
        SDK_GAE, ensure_protobuf)
    gated = ("stream_transform_with_state", "stream_tws_map_state_distinct")
    registered = plans.queries().keys()
    if ensure_protobuf():
        missing = [i for i in gated if i not in registered]
        assert not missing, \
            f"protobuf runtime live but gated ids absent: {missing}"
        print(f"pbcompat gate ON (runtime at {SDK_GAE}): "
              f"{', '.join(gated)} registered")
    else:
        absent = [i for i in gated if i in registered]
        assert not absent, \
            f"no protobuf runtime but gated ids registered: {absent}"
        pytest.skip(
            "pbcompat gate OFF — google.protobuf runtime vanished from "
            f"{SDK_GAE}; de-registered ids: {', '.join(gated)} "
            "(coverage drop is THIS skip, not a silent absence)")


# --- offset-resumable custom stream source (round 7, VERDICT r6 ask 6) -----


def test_eventlog_source_kill_resume_offset_recovery(spark, sf_dir,
                                                     tmp_path):
    """Offset recovery across query restarts for the custom
    partitioned stream source (sources/pydatasource.py): replay a
    4-partition offset log under a rate limit, killing the query
    (fresh start on the same checkpoint) between micro-batches. The
    committed frontier must advance monotonically, the first restart
    must NOT re-deliver committed offsets, and the fully-drained sink
    must hold each (part, offset) exactly once — at-least-once
    delivery would duplicate, offset loss would leave holes."""
    import json
    import os

    from data_ingestor_and_features_creator_spark.plans.q_round7 import (
        _drain_event_log)
    from data_ingestor_and_features_creator_spark.sources.pydatasource import (
        progress_path, write_event_log)

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 3000)
          .select("event_id", "user_id", "value"))
    log_dir = str(tmp_path / "log")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    sizes = write_event_log(ev, log_dir, n_parts=4)
    total = sum(sizes.values())
    per_trigger = max(50, max(sizes.values()) // 5)

    starts = _drain_event_log(spark, log_dir, sink, ckpt, per_trigger)
    assert starts > 1, "rate limit never forced a restart — test vacuous"

    # the frontier file is scoped per query by its checkpoint location
    # (ADVICE r8) — a concurrent query on the same log keeps its own
    with open(progress_path(log_dir, ckpt)) as fh:
        frontier = json.load(fh)
    assert {k: int(v) for k, v in frontier.items()} == sizes

    out = spark.read.parquet(sink)
    assert out.count() == total
    # exactly-once at (part, offset) grain: no dups, no holes
    assert out.select("part", "log_offset").distinct().count() == total
    per_part = {r["part"]: (r["n"], r["mx"])
                for r in out.groupBy("part")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.max("log_offset").alias("mx")).collect()}
    for pid, n in sizes.items():
        assert per_part[int(pid)] == (n, n - 1)
    # content equality with the batch source
    assert (sorted(tuple(r) for r in
                   out.select("event_id", "user_id").collect())
            == sorted(tuple(r) for r in
                      ev.select("event_id", "user_id").collect()))


# --- round 9: mid-stream kill/resume of the MOR CDC sink (VERDICT r8
# ask 3) --------------------------------------------------------------------


def test_stream_mor_upsert_kill_resume_on_checkpoint(spark, sf_dir,
                                                     tmp_path):
    """Kill the stream_mor_upsert_sink composition AFTER its first
    micro-batch's MOR commit and resume a fresh query on the SAME
    checkpoint: the resumed query must apply ONLY the unprocessed
    batch (no double-applied DV commit for batch 0), the final
    DV-applied read must equal the direct upsert algebra, and the v1
    data files must survive the whole kill/resume unrewritten."""
    import os

    from pyspark.sql.utils import StreamingQueryException

    from data_ingestor_and_features_creator_spark.operators import snapshots

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 2000)
          .select("event_id", "event_type", "value"))
    tdir = str(tmp_path / "table")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    kill_flag = str(tmp_path / "killed_once")
    snapshots.commit_snapshot(ev.repartition(4, "event_id"), tdir,
                              mode="overwrite")
    v1_files = set(snapshots.read_manifest(tdir, 1)["files"])

    u1 = (ev.filter(F.col("event_id") % 25 == 0)
            .withColumn("value", F.col("value") + 1000.0))
    u2 = (ev.filter(F.col("event_id") % 25 == 7)
            .withColumn("value", F.col("value") + 2000.0))
    for i, batch in enumerate((u1, u2)):
        out = os.path.join(feed, f"b{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_000_000 + i,) * 2)

    def apply_batch(bdf, batch_id):
        if bdf.isEmpty():
            return
        # crash point: AFTER batch 0's commit, BEFORE batch 1's merge —
        # the writer dies with its checkpoint holding batch 0 only
        if batch_id >= 1 and not os.path.exists(kill_flag):
            open(kill_flag, "w").close()
            raise RuntimeError("injected mid-stream writer kill")
        snapshots.merge_mor(bdf.sparkSession, tdir,
                            bdf.select("event_id", "event_type", "value"),
                            "event_id")

    def run():
        q = (spark.readStream.schema(u1.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(feed, "*"))
             .writeStream.foreachBatch(apply_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        run()  # dies mid-stream with exactly one MOR commit landed
    assert os.path.exists(kill_flag)
    assert snapshots.snapshot_versions(tdir) == [1, 2]

    run()  # resume on the same checkpoint: batch 1 only

    # exactly one more DV commit — batch 0 was NOT re-applied
    assert snapshots.snapshot_versions(tdir) == [1, 2, 3]
    head = snapshots.read_manifest(tdir, 3)
    assert len(head.get("dvs", [])) == 2
    assert v1_files <= set(head["files"])  # zero rewrites throughout

    got = {(r["event_id"]): r["value"]
           for r in snapshots.read_snapshot(spark, tdir).collect()}
    want = {r["event_id"]: r["value"] for r in ev.collect()}
    for eid in list(want):
        if eid % 25 == 0:
            want[eid] += 1000.0
        elif eid % 25 == 7:
            want[eid] += 2000.0
    assert got == want


def test_m4_windowed_batch_equals_stream(spark, sf_dir, ev_batch,
                                         ev_stream):
    """Round-9d: the M4 windowed reduction must be identical via
    spark.read and readStream + availableNow (complete mode — plain
    windowed aggregation, no watermark needed for the bounded
    replay), transferring the DuckDB oracle to the stream path."""
    batch = _rows(transforms.m4_windowed(ev_batch))
    stream = _rows(runner.run_available_now(
        transforms.m4_windowed(ev_stream), output_mode="complete"))
    assert batch == stream


def test_eventlog_availablenow_fallback_full_feed_one_batch(spark, sf_dir,
                                                            tmp_path):
    """PIN the availableNow fallback semantics (round 10, VERDICT r9
    ask 7): Python DataSource streams don't implement
    Trigger.AvailableNow, so Spark logs 'PythonMicroBatchStream ...
    does not support Trigger.AvailableNow. Falling back to single
    batch' and runs ONE batch bounded by the first latestOffset()
    call. For a static feed with the rate cap at/above the log size,
    that single batch ≡ availableNow: the WHOLE feed, exactly once,
    in exactly one micro-batch. A Spark upgrade that changes the
    fallback (multiple batches, or honoring AvailableNow with
    different boundary semantics) must surface HERE, not as a silent
    semantics drift in the gate logs."""
    from data_ingestor_and_features_creator_spark.sources.pydatasource import (
        EventLogStreamSource, write_event_log)

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 1500)
          .select("event_id", "user_id", "value"))
    log_dir, sink, ckpt = (str(tmp_path / d) for d in ("log", "sink", "ck"))
    sizes = write_event_log(ev, log_dir, n_parts=4)
    total = sum(sizes.values())
    spark.dataSource.register(EventLogStreamSource)
    q = (spark.readStream.format("eventlog")
         .option("path", log_dir)
         .option("maxRowsPerTrigger", total)  # cap ≥ feed → one batch
         .option("progressScope", ckpt)
         .load()
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # exactly ONE micro-batch carried data (the single-batch fallback)
    data_batches = [p for p in q.recentProgress
                    if p and p["numInputRows"] > 0]
    assert len(data_batches) == 1, [p["batchId"] for p in data_batches]
    assert data_batches[0]["numInputRows"] == total
    out = spark.read.parquet(sink)
    # the full feed, exactly once, no holes
    assert out.count() == total
    assert out.select("part", "log_offset").distinct().count() == total
    for r in (out.groupBy("part")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.max("log_offset").alias("mx")).collect()):
        assert (r["n"], r["mx"]) == (sizes[str(r["part"])],
                                     sizes[str(r["part"])] - 1)
