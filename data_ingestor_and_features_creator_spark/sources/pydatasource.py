"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API,
SURVEY.md §2.1): the engine's extension point for sources Spark has no
built-in reader for (instrument feeds, bespoke binary formats).

The demo source emits a deterministic integer grid so it is fully
SQL-oracle-checkable. Scale notes baked into the implementation:

- ``partitions()`` declares N independent splits → Spark schedules one
  task per split, exactly like parquet row-groups; a real feed would
  map splits to files/shards/offset ranges.
- ``read()`` yields ONE pyarrow RecordBatch per split (the vectorized
  fast path) rather than per-row tuples — per-row Python yield is the
  row-at-a-time slow path this engine bans everywhere else.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Span(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _GridReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.nparts = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, self.rows // self.nparts)
        return [_Span(s, min(s + step, self.rows))
                for s in range(0, self.rows, step)]

    def read(self, part: _Span):
        import pyarrow as pa

        i = list(range(part.start, part.end))
        yield pa.record_batch(
            {"i": pa.array(i, pa.int64()),
             "v": pa.array([(x * x) % 97 for x in i], pa.int64())})


class SynthGridDataSource(DataSource):
    """``spark.read.format("synthgrid").option("rows", n).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthgrid"

    def schema(self) -> str:
        return "i bigint, v bigint"

    def reader(self, schema) -> DataSourceReader:
        return _GridReader(self.options)


# ---------------------------------------------------------------------------
# Offset-resumable partitioned STREAM source (VERDICT r6 ask 6)
# ---------------------------------------------------------------------------
#
# Kafka-shaped replay log: a directory with one parquet file per
# partition (``p{N}.parquet``), each sorted by a dense 0-based
# ``offset`` column, plus ``_meta.json`` recording the per-partition
# record counts. The stream reader exposes the standard offset
# lifecycle (``pyspark.sql.datasource.DataSourceStreamReader``
# [SPARK]):
#
# - offsets are dicts ``{"0": n0, "1": n1, ...}`` — records consumed
#   per partition (exclusive upper bound), monotonically increasing;
# - ``latestOffset`` self-limits to ``maxRowsPerTrigger`` NEW rows per
#   partition per micro-batch (the maxFilesPerTrigger analog — Python
#   stream sources get no JVM ReadLimit, so the cap lives here), and
#   PERSISTS the advanced frontier to the log's own ``_progress.json``
#   (atomic rename) at that moment. Persisting at latestOffset — not
#   commit — time matters: under trigger(availableNow) Spark fixes the
#   end boundary with ONE latestOffset call per query start and
#   terminates after that batch WITHOUT calling commit, so a
#   commit-time frontier would never advance and every restart would
#   re-plan the same capped range forever (observed). This is Spark's
#   DOCUMENTED-IN-LOGS fallback ("PythonMicroBatchStream ... does not
#   support Trigger.AvailableNow. Falling back to single batch"):
#   single batch ≡ availableNow for a static feed, and that semantic
#   is PINNED by tests/test_streaming.py::
#   test_eventlog_availablenow_fallback_full_feed_one_batch (full
#   feed, exactly once, exactly one data batch) so a Spark upgrade
#   cannot change it silently. The SPARK
#   checkpoint remains the source of truth for delivery —
#   ``partitions(start, end)`` always serves the checkpointed range,
#   so a crash between the frontier persist and the batch commit just
#   means the restarted query's first batch covers both ranges (the
#   cap is best-effort across crashes, exactness is not);
# - ``commit(end)`` additionally folds Spark's committed frontier into
#   the same file (max-merge) when the engine does call it.
#
# ``read`` slices the partition file with pyarrow and yields ONE
# RecordBatch (vectorized path). At real scale the slice would prune
# parquet row groups by the offset column's min/max stats instead of
# reading the file — same interface, bigger files.


def progress_path(log_dir: str, scope: str = "") -> str:
    """Filesystem path of the persisted rate-limit frontier for a
    given ``progressScope`` — the one spelling shared by the reader
    and by callers that poll drain progress (q_round7._drain_event_log,
    tests). Scope '' is the legacy shared file."""
    import hashlib
    import os

    tag = "-" + hashlib.md5(scope.encode()).hexdigest()[:8] if scope else ""
    return os.path.join(log_dir, f"_progress{tag}.json")


class _OffsetSpan(InputPartition):
    def __init__(self, path: str, pid: int, start: int, end: int):
        self.path, self.pid, self.start, self.end = path, pid, start, end


class EventLogStreamReader:
    # Duck-typed DataSourceStreamReader (imported lazily in
    # streamReader() so batch-only use never touches streaming paths).

    def __init__(self, options: dict):
        import json
        import os

        self.path = options["path"]
        self.per_trigger = int(options.get("maxRowsPerTrigger", 1000))
        # ADVICE r7: an UNscoped progress file is shared by every query
        # that ever read this log — a stale frontier from a previous
        # query makes a fresh query's first capped batch silently cover
        # [0, stale frontier + cap]. Callers that run multiple queries
        # over one log pass progressScope (e.g. the checkpoint path);
        # its hash lands in the filename so each scope rate-limits
        # independently. initialOffset() additionally RESETS the scoped
        # frontier (it only fires on a fresh checkpoint), so even a
        # reused scope can't leak a stale frontier into a new query.
        self._scope = options.get("progressScope", "")
        with open(os.path.join(self.path, "_meta.json")) as fh:
            meta = json.load(fh)
        self.sizes = {str(k): int(v) for k, v in meta["sizes"].items()}
        self._frontier = self._load_progress()

    # -- self-managed committed frontier (restart-safe rate limiting) --
    def _progress_path(self) -> str:
        return progress_path(self.path, self._scope)

    def _load_progress(self) -> dict:
        import json
        import os
        try:
            with open(self._progress_path()) as fh:
                got = json.load(fh)
            return {k: int(got.get(k, 0)) for k in self.sizes}
        except (OSError, ValueError):
            return {k: 0 for k in self.sizes}

    def initialOffset(self) -> dict:
        # Spark asks for the initial offset ONLY when the checkpoint is
        # fresh — the query genuinely starts at 0, so any persisted
        # frontier is a LEFTOVER from a previous query against this
        # SCOPE (ADVICE r7: trusting it made the first micro-batch
        # cover [0, stale frontier + cap], silently defeating the
        # per-trigger cap). Reset it; checkpointed restarts never land
        # here and keep their rate-limit continuity.
        #
        # The file reset happens ONLY for a scoped reader (ADVICE r8):
        # pass progressScope=<checkpoint location> so the reset touches
        # this query's own file. With the legacy UNscoped shared file,
        # zeroing it here would actively reset a concurrently running
        # query's rate-limit state at new-query start (its restart
        # would read frontier 0 and emit empty batches until the cap
        # re-advanced past its checkpointed offset) — so the unscoped
        # reset is in-memory only, which still fixes the r7 stale-
        # frontier bug for THIS query without touching neighbors.
        self._frontier = {k: 0 for k in self.sizes}
        if self._scope:
            self._persist(self._frontier)
        return {k: 0 for k in self.sizes}

    def _persist(self, frontier: dict) -> None:
        import json
        import os

        tmp = self._progress_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(frontier, fh)
            # fsync BEFORE rename (ADVICE r7): rename-without-sync can
            # leave a zero-length/torn file after a crash — readable as
            # "no progress" (cap resets), but the window is avoidable.
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._progress_path())

    def latestOffset(self) -> dict:
        self._frontier = {
            k: min(self.sizes[k], self._frontier[k] + self.per_trigger)
            for k in self.sizes}
        self._persist(self._frontier)
        return dict(self._frontier)

    def partitions(self, start: dict, end: dict):
        import os
        out = []
        for k in sorted(self.sizes, key=int):
            lo, hi = int(start.get(k, 0)), int(end.get(k, 0))
            if hi > lo:
                out.append(_OffsetSpan(
                    os.path.join(self.path, f"p{k}.parquet"),
                    int(k), lo, hi))
        return out

    def read(self, part: _OffsetSpan):
        import pyarrow.parquet as pq

        tbl = pq.read_table(part.path)
        yield from (tbl.slice(part.start, part.end - part.start)
                    .combine_chunks().to_batches())

    def commit(self, end: dict) -> None:
        self._frontier = {k: max(self._frontier.get(k, 0),
                                 int(end.get(k, 0)))
                          for k in self.sizes}
        self._persist(self._frontier)

    def stop(self) -> None:
        pass


class EventLogStreamSource(DataSource):
    """``spark.readStream.format("eventlog").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "eventlog"

    def schema(self) -> str:
        return ("part int, log_offset bigint, event_id bigint, "
                "user_id bigint, value double")

    def streamReader(self, schema):
        from pyspark.sql.datasource import DataSourceStreamReader

        class _R(EventLogStreamReader, DataSourceStreamReader):
            pass

        return _R(self.options)


def write_event_log(df, log_dir: str, n_parts: int = 4) -> dict:
    """Materialize a DataFrame as an offset-ordered replay log:
    partition = ``user_id % n_parts`` (the Kafka key-hash analog),
    offset = dense 0-based rank within the partition ordered by
    (event_id) — deterministic, so replays are reproducible. One
    parquet file per partition via pyarrow (the log is a FIXTURE
    artifact; the scalable path would be Spark partitionBy with
    per-partition sorted row groups)."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(log_dir, exist_ok=True)
    pdf = df.toPandas().sort_values("event_id").reset_index(drop=True)
    pdf["part"] = (pdf["user_id"] % n_parts).astype("int32")
    sizes = {}
    for pid in range(n_parts):
        sub = pdf[pdf["part"] == pid].reset_index(drop=True)
        sub["log_offset"] = sub.index.astype("int64")
        sub = sub[["part", "log_offset", "event_id", "user_id", "value"]]
        pq.write_table(pa.Table.from_pandas(sub, preserve_index=False),
                       os.path.join(log_dir, f"p{pid}.parquet"))
        sizes[str(pid)] = len(sub)
    with open(os.path.join(log_dir, "_meta.json"), "w") as fh:
        json.dump({"sizes": sizes}, fh)
    return sizes
