"""Round-7b operator additions: the rest of the lakehouse surface on
the copy-on-write snapshot layer (schema evolution, incremental/CDC
reads, vacuum, concurrent writers) plus small-file compaction planning.

Provenance (SURVEY.md §0 applies — empty reference checkout): the
snapshot mechanics are the published Delta/Iceberg patterns [PK]
implemented from scratch in operators/snapshots.py; compaction
planning is the standard streaming next-fit offset assignment [PK].

House rules throughout (plans/registry.py): exact DECIMAL(38,12) sums
for float totals, identical aliases, no raw arrays, non-nullable
booleans, integer counts CAST BIGINT in DuckDB.

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql
from ..operators import snapshots
from .registry import query, scratch_dir


# ---------------------------------------------------------------------------
# Additive schema evolution across snapshot versions
# ---------------------------------------------------------------------------

@query("snapshot_schema_evolution_cow", oracle=f"""
WITH m AS (SELECT (MAX(event_id) + 1) // 2 AS h FROM events),
u AS (
  SELECT CASE WHEN event_id < m.h THEN 'legacy' ELSE event_type END
           AS src_flag,
         value
  FROM events, m)
SELECT src_flag, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value
FROM u GROUP BY src_flag
""")
def snapshot_schema_evolution_cow(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """ADDITIVE SCHEMA EVOLUTION on the copy-on-write table: v1 is
    committed WITHOUT the ``src_flag`` column, v2 appends rows that
    carry it; reading the latest snapshot with mergeSchema unions the
    file schemas and NULL-fills the new column in v1's files — the
    additive-evolution contract every long-lived table needs (old
    files are immutable; a rewrite-the-history 'migration' at 100 TB
    is exactly what the format exists to avoid). The NULL-fill is made
    observable by coalescing to 'legacy': the oracle's CASE over raw
    events states the expected merged view. Columns may be ADDED this
    way; renames/type-changes need a rewrite — same rule as the
    public formats [PK]."""
    ev = load_table(spark, sf_dir, "events")
    tdir = os.path.join(scratch_dir("snapshot_schevo"), "events_cow")
    # Data-relative bounds so every fixture commits non-empty versions
    # (fixed literals made this vacuous at sf0.001 — memory pitfall).
    half = (ev.agg(F.max("event_id")).first()[0] + 1) // 2
    v1 = (ev.filter(F.col("event_id") < half)
            .select("event_id", "value").repartition(4, "event_id"))
    snapshots.commit_snapshot(v1, tdir, mode="overwrite")
    v2 = (ev.filter(F.col("event_id") >= half)
            .select("event_id", "value",
                    F.col("event_type").alias("src_flag"))
            .repartition(4, "event_id"))
    snapshots.commit_snapshot(v2, tdir, mode="append")
    latest = snapshots.read_snapshot(spark, tdir, merge_schema=True)
    return (latest
            .select(F.coalesce("src_flag", F.lit("legacy"))
                    .alias("src_flag"), "value")
            .groupBy("src_flag")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value").alias("total_value")))


# ---------------------------------------------------------------------------
# Incremental (CDC-style) version-diff reads
# ---------------------------------------------------------------------------

@query("snapshot_incremental_diff", oracle=f"""
WITH m AS (SELECT (MAX(event_id) + 1) // 4 AS q FROM events),
s2 AS (
  SELECT value FROM events, m
  WHERE event_id >= 2 * m.q AND event_id < 3 * m.q),
s3 AS (
  SELECT value FROM events, m WHERE event_id >= 3 * m.q)
SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value FROM s2
UNION ALL
SELECT 3 AS version, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value FROM s3
""")
def snapshot_incremental_diff(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """INCREMENTAL READ between snapshot versions — the consumer side
    of incremental pipelines: each downstream run processes exactly
    the files the new version ADDED (manifest set-difference), never
    rescanning the table. Three commits (base, two appends); the
    version-2 and version-3 diffs must equal the appended batches
    row-for-row, proving (a) append commits carry old files by
    reference so the diff is clean, (b) a downstream consumer keyed
    on versions gets exactly-once batch delivery without any
    bookkeeping beyond the last version it processed. At 100 TB this
    is how hourly feature jobs chase a continuously-landing fact
    table — O(new data), not O(table)."""
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "value"))
    tdir = os.path.join(scratch_dir("snapshot_incr"), "events_cow")
    # Data-relative quartile bounds (see snapshot_schema_evolution_cow).
    q = (ev.agg(F.max("event_id")).first()[0] + 1) // 4
    snapshots.commit_snapshot(
        ev.filter(F.col("event_id") < 2 * q).repartition(4, "event_id"),
        tdir, mode="overwrite")
    snapshots.commit_snapshot(
        ev.filter((F.col("event_id") >= 2 * q) & (F.col("event_id") < 3 * q))
          .repartition(4, "event_id"), tdir, mode="append")
    snapshots.commit_snapshot(
        ev.filter(F.col("event_id") >= 3 * q)
          .repartition(4, "event_id"), tdir, mode="append")
    outs = []
    for v in (2, 3):
        outs.append(snapshots.read_version_diff(spark, tdir, v)
                    .agg(F.lit(v).alias("version"),
                         F.count(F.lit(1)).alias("n"),
                         dsum("value").alias("total_value")))
    return outs[0].unionByName(outs[1])


# ---------------------------------------------------------------------------
# Vacuum: GC of unreferenced (orphaned) data files
# ---------------------------------------------------------------------------

@query("snapshot_vacuum_orphans", oracle=f"""
WITH m AS (SELECT (MAX(event_id) + 1) // 4 AS q FROM events),
v1 AS (SELECT value FROM events, m WHERE event_id < m.q),
v2 AS (SELECT value FROM events, m
       WHERE event_id >= 2 * m.q AND event_id < 3 * m.q)
SELECT CAST(4 AS BIGINT) AS n_orphans,
       CAST(8 AS BIGINT) AS n_live_files,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v1) AS v1_n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v1)
         + (SELECT CAST(COUNT(*) AS BIGINT) FROM v2) AS v2_n,
       (SELECT {dsum_sql('value')} FROM v2) AS appended_value
""")
def snapshot_vacuum_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM — GC of data files referenced by NO manifest: a crashed
    writer's step-1 files (written, never committed) are invisible to
    every reader but burn storage forever unless collected. The op
    stages exactly that: v1 commit (4 files), a CRASHED append (4
    part files, no manifest), then a successful append (v2). Vacuum
    must report exactly the 4 orphans, delete only them, and BOTH
    committed versions must read back intact afterwards — vacuum can
    never break time travel because every manifest keeps its full
    file list and vacuum touches only what no manifest names. The
    file counts are deterministic (repartition(4, key) on thousands
    of rows never leaves a hash partition empty). At 100 TB, vacuum
    is the storage-cost control loop; the public formats gate it with
    a retention window for in-flight readers — same mechanics [PK]."""
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "value"))
    tdir = os.path.join(scratch_dir("snapshot_vac"), "events_cow")
    # Data-relative quartile bounds (see snapshot_schema_evolution_cow).
    q = (ev.agg(F.max("event_id")).first()[0] + 1) // 4
    snapshots.commit_snapshot(
        ev.filter(F.col("event_id") < q).repartition(4, "event_id"),
        tdir, mode="overwrite")
    # crashed writer: files land, manifest never publishes
    snapshots._write_data_files(
        ev.filter((F.col("event_id") >= q) & (F.col("event_id") < 2 * q))
          .repartition(4, "event_id"), tdir, version=2, token="crashed")
    snapshots.commit_snapshot(
        ev.filter((F.col("event_id") >= 2 * q) & (F.col("event_id") < 3 * q))
          .repartition(4, "event_id"), tdir, mode="append")
    # retain_seconds=0: this op IS the exclusive writer (the staged
    # "crash" just happened, seconds ago) — the default 24 h retention
    # window exists to protect OTHER writers' in-flight step-1 files.
    orphans = snapshots.vacuum(tdir, dry_run=True, retain_seconds=0)
    deleted = snapshots.vacuum(tdir, retain_seconds=0)
    assert sorted(orphans) == sorted(deleted)
    v1 = snapshots.read_snapshot(spark, tdir, version=1)
    v2 = snapshots.read_snapshot(spark, tdir, version=2)
    appended = snapshots.read_version_diff(spark, tdir, 2)
    return (v1.agg(F.count(F.lit(1)).alias("v1_n"))
            .crossJoin(v2.agg(F.count(F.lit(1)).alias("v2_n")))
            .crossJoin(appended.agg(dsum("value").alias("appended_value")))
            .select(F.lit(len(orphans)).cast("long").alias("n_orphans"),
                    F.lit(len(snapshots.list_data_files(tdir)))
                     .cast("long").alias("n_live_files"),
                    "v1_n", "v2_n", "appended_value"))


# ---------------------------------------------------------------------------
# Concurrent writers: optimistic concurrency, exactly one wins per slot
# ---------------------------------------------------------------------------

@query("snapshot_concurrent_writers", oracle=f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value,
       CAST(3 AS INT) AS head_version
FROM events GROUP BY event_type
""")
def snapshot_concurrent_writers(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """CONCURRENT WRITERS under optimistic concurrency: writers A and
    B both prepare an append against head v1 and both try to commit
    v2. The manifest publish is put-if-absent (os.link EEXIST — the
    Delta _delta_log CAS pattern [PK]), so exactly ONE wins v2; the
    loser gets VersionConflict, REBASES on the winner's manifest (its
    data files need no rewrite — they are version-agnostic), and
    lands v3. The final table must contain base + A + B exactly once
    each and the head must be version 3 — lost-update (B clobbering
    A) would drop A's rows from the type totals, double-commit would
    inflate them. This is the property that makes multiple pipelines
    safe to land in one table without a coordinator at 100 TB."""
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "event_type", "value"))
    tdir = os.path.join(scratch_dir("snapshot_conc"), "events_cow")
    # Data-relative quartile bounds (see snapshot_schema_evolution_cow);
    # the three slices cover ALL events, so the oracle needs no bound.
    q = (ev.agg(F.max("event_id")).first()[0] + 1) // 4
    snapshots.commit_snapshot(
        ev.filter(F.col("event_id") < 2 * q).repartition(4, "event_id"),
        tdir, mode="overwrite")
    files_a = snapshots._write_data_files(
        ev.filter((F.col("event_id") >= 2 * q) & (F.col("event_id") < 3 * q))
          .repartition(4, "event_id"), tdir, version=2, token="a")
    files_b = snapshots._write_data_files(
        ev.filter(F.col("event_id") >= 3 * q)
          .repartition(4, "event_id"), tdir, version=2, token="b")
    # A wins the v2 slot; B's raw publish of v2 must CONFLICT, then
    # B's rebase loop lands v3 on top of A's manifest.
    va = snapshots.commit_files(tdir, files_a, mode="append")
    assert va == 2, va
    try:
        snapshots._publish_manifest(tdir, 2, files_b)
        raise AssertionError("CAS failed: two writers committed v2")
    except snapshots.VersionConflict:
        pass
    vb = snapshots.commit_files(tdir, files_b, mode="append")
    assert vb == 3, vb
    head = snapshots.snapshot_versions(tdir)[-1]
    return (snapshots.read_snapshot(spark, tdir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value").alias("total_value"))
            .withColumn("head_version", F.lit(head).cast("int")))


# ---------------------------------------------------------------------------
# Small-file compaction planning (streaming next-fit by offset)
# ---------------------------------------------------------------------------

_BIN_TARGET = 50_000  # chars per compacted output (the 128 MB analog)


@query("maintain_small_file_binpack", oracle=f"""
WITH inv AS (
  SELECT CAST(doc_id // 100 AS BIGINT) AS shard,
         CAST(SUM(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY shard),
plan AS (
  SELECT shard, bytes,
         CAST((SUM(bytes) OVER (ORDER BY shard
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - bytes) // {_BIN_TARGET} AS BIGINT) AS bin
  FROM inv)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_inputs,
       CAST(SUM(bytes) AS BIGINT) AS out_bytes,
       CAST(MIN(shard) AS BIGINT) AS first_shard,
       CAST(MAX(shard) AS BIGINT) AS last_shard
FROM plan GROUP BY bin
""")
def maintain_small_file_binpack(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION PLAN — the maintenance job that rescues
    streaming-landed tables from thousand-file partitions: group the
    input-file inventory (here the shard inventory from documents,
    byte-proxied by n_chars) into ~target-sized outputs. Assignment
    is the STREAMING NEXT-FIT rule: walk inputs in shard order, bin =
    floor(preceding-bytes / target) — one window cumsum, fully
    deterministic, order-stable, and each bin lands within one input
    of the target [PK]. That determinism is the point at 100 TB: the
    same inventory always yields the same plan, so a re-run of a
    crashed compaction rewrites the same outputs (idempotent), unlike
    best-fit-decreasing whose plan churns with any size jitter. The
    plan integrates with the snapshot layer: execute = read each
    bin's inputs, write one file, commit_files(replaced → new) as one
    version. Integer-exact throughout."""
    docs = load_table(spark, sf_dir, "documents")
    inv = (docs.groupBy((F.col("doc_id") / 100).cast("long")
                        .alias("shard"))
               .agg(F.sum("n_chars").cast("long").alias("bytes")))
    from pyspark.sql import Window as W
    w = W.orderBy("shard").rowsBetween(W.unboundedPreceding, W.currentRow)
    plan = inv.withColumn(
        "bin", ((F.sum("bytes").over(w) - F.col("bytes"))
                / _BIN_TARGET).cast("long"))
    return (plan.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_inputs"),
                 F.sum("bytes").cast("long").alias("out_bytes"),
                 F.min("shard").alias("first_shard"),
                 F.max("shard").alias("last_shard")))
