"""Round-8 operator additions: MERGE-ON-READ for the lakehouse layer
(VERDICT r7 ask #5) — positional deletion-vector commits, the DV-applied
read path, and DV compaction.

Provenance (SURVEY.md §0 applies — empty reference checkout): the
positional-delete / deletion-vector protocol is the published Apache
Iceberg v2 / Delta Lake DV design [PK], re-implemented from scratch on
plain Spark + parquet (``_metadata.file_path`` / ``row_index``) in
operators/snapshots.py (merge_mor / compact_dvs / the read_snapshot DV
anti-join); no reference code exists to cite.

Why it exists at 100 TB: copy-on-write MERGE rewrites every data file
that contains a matched key — the right trade for RANGE-LOCAL CDC
batches, but the SCATTERED batch (a few rows in every file — the
BASELINE round-7 worst-case throughput row, where 62k scattered rows
rewrote all 32 files) degenerates to a full table rewrite. MOR commits
O(batch) bytes regardless of scatter: one DV sidecar of (file, pos)
tombstones plus one insert file, all data files carried by reference.
Readers pay one runtime-broadcast anti-join until ``compact_dvs``
folds the debt back into data files (the deferred, batched COW
rewrite).

House rules throughout (plans/registry.py): dsum/dsum_sql totals,
identical aliases, non-nullable booleans, no decimals/arrays at the
boundary.

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


def _stage_scattered_cdc(spark: SparkSession, sf_dir: str, tag: str):
    """Shared staging for the MOR ops: target = first two event-id
    quartiles of events hash-split into 8 files; source = the
    SCATTERED batch (every 25th id → a few matched rows in every hash
    file — COW's documented worst case) plus an insert tail (the next
    fifth-of-a-quartile of ids), both value-shifted +1000. Bounds are
    DATA-RELATIVE (max(event_id)+1)//4 so the op can never go vacuous
    on a differently-sized fixture (workflow rule 4a)."""
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "event_type", "value"))
    tdir = os.path.join(scratch_dir(tag), "events_mor")
    q = (ev.agg(F.max("event_id")).first()[0] + 1) // 4
    tgt = ev.filter(F.col("event_id") < 2 * q).repartition(8, "event_id")
    snapshots.commit_snapshot(tgt, tdir, mode="overwrite")
    src = (ev.filter(
               ((F.col("event_id") % 25 == 0) & (F.col("event_id") < 2 * q))
               | ((F.col("event_id") >= 2 * q)
                  & (F.col("event_id") < 2 * q + q // 5)))
             .withColumn("value", F.col("value") + 1000.0))
    return tdir, src


_MOR_ORACLE_MERGED = """
WITH m AS (SELECT (MAX(event_id) + 1) // 4 AS q FROM events),
tgt AS (
  SELECT event_id, event_type, value FROM events, m
  WHERE event_id < 2 * m.q),
src AS (
  SELECT event_id, event_type, value + 1000.0 AS value
  FROM events, m
  WHERE (event_id % 25 = 0 AND event_id < 2 * m.q)
     OR (event_id >= 2 * m.q AND event_id < 2 * m.q + m.q // 5)),
merged AS (
  SELECT * FROM tgt
  WHERE event_id NOT IN (SELECT event_id FROM src)
  UNION ALL SELECT * FROM src)
"""


@query("snapshot_mor_read", oracle=f"""
{_MOR_ORACLE_MERGED}
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value,
       true AS all_files_carried,
       true AS has_dv
FROM merged GROUP BY event_type
""")
def snapshot_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ commit + DV-applied read: the scattered CDC batch
    (every 25th key — one-plus matched rows in EVERY hash file, the
    shape that forces copy-on-write to rewrite all files) lands as a
    positional deletion-vector sidecar plus one insert file via
    operators/snapshots.merge_mor; read_snapshot applies the DVs with
    an anti-join on (_metadata.file_path, _metadata.row_index), the
    Iceberg-v2 positional-delete read path [PK]. The oracle states
    MERGE semantics directly on raw events; two structural invariants
    travel as hash-checked booleans — ``all_files_carried`` (every v1
    data file is in the v2 manifest BY REFERENCE: zero rewrites, the
    whole point vs COW) and ``has_dv`` (the manifest really carries a
    DV — the read exercised the MOR path, not a degenerate no-delete
    commit). At 100 TB: write cost O(batch) instead of O(table);
    read debt = one runtime-broadcast anti-join until compaction."""
    tdir, src = _stage_scattered_cdc(spark, sf_dir, "snapshot_mor")
    v1_files = set(snapshots.read_manifest(tdir, 1)["files"])
    snapshots.merge_mor(spark, tdir, src, "event_id")
    m2 = snapshots.read_manifest(tdir, 2)
    carried = v1_files <= set(m2["files"])
    has_dv = bool(m2.get("dvs"))
    return (snapshots.read_snapshot(spark, tdir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value").alias("total_value"))
            .withColumn("all_files_carried", F.lit(carried))
            .withColumn("has_dv", F.lit(has_dv)))


@query("snapshot_mor_compact", oracle=f"""
{_MOR_ORACLE_MERGED}
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total_value,
       true AS dvs_cleared,
       true AS only_dirty_rewritten
FROM merged GROUP BY event_type
""")
def snapshot_mor_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV COMPACTION: after the scattered-CDC merge_mor, compact_dvs
    folds the tombstones back into rewritten data files and publishes
    a DV-free manifest — read debt returns to zero while pre-
    compaction versions stay time-travelable (manifests are
    immutable). The aggregate must be IDENTICAL to the MOR read
    (compaction is a physical reorganization, never a logical change);
    two invariants travel as hash-checked booleans — ``dvs_cleared``
    (the head manifest carries no DVs) and ``only_dirty_rewritten``
    (files the DV never touched are carried by reference: compaction
    cost scales with the delete debt, not the table — here the insert
    file from the merge is clean and must survive as-is). The rewrite
    set is discovered FROM the DV's distinct file list (CDC-bounded
    collect), not by scanning the table."""
    tdir, src = _stage_scattered_cdc(spark, sf_dir, "snapshot_mor_c")
    snapshots.merge_mor(spark, tdir, src, "event_id")
    m2 = snapshots.read_manifest(tdir, 2)
    dirty = {r["_file"] for r in
             spark.read.parquet(
                 *[os.path.join(tdir, f) for f in m2["dvs"]])
             .select("_file").distinct().collect()}
    clean_before = [f for f in m2["files"] if f not in dirty]
    v = snapshots.compact_dvs(spark, tdir)
    m3 = snapshots.read_manifest(tdir, v)
    cleared = not m3.get("dvs")
    only_dirty = set(clean_before) <= set(m3["files"])
    return (snapshots.read_snapshot(spark, tdir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value").alias("total_value"))
            .withColumn("dvs_cleared", F.lit(cleared))
            .withColumn("only_dirty_rewritten", F.lit(only_dirty)))
