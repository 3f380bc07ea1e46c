"""Copy-on-write snapshot layer over plain parquet (manifest commits).

Public design pattern (the published Delta Lake / Apache Iceberg
transaction-log idea, re-expressed with zero dependencies): a table is
a directory of IMMUTABLE parquet data files plus a ``_manifests/`` log;
version vN is ONE manifest file listing exactly the data files live at
that version. A writer:

1. writes NEW part files under ``data/v{N}/`` — existing files are
   never modified or deleted;
2. publishes ``_manifests/v{N}.json`` by write-to-temp + ``os.rename``
   (atomic within a filesystem).

Readers resolve the HIGHEST committed manifest and read exactly its
file list. A crash between step 1 and step 2 leaves orphan part files
but never a torn table: the manifest either exists completely or not
at all, so concurrent/subsequent readers keep seeing v{N-1} until vN
is fully durable (pinned by tests/test_snapshots.py). Time travel =
read an older manifest; vacuuming orphans is a separate GC concern
(files referenced by NO manifest can be deleted safely).

MERGE here is true copy-on-write at FILE granularity: only data files
that contain a matched key are rewritten; untouched files are carried
into the new manifest by reference. At 100 TB that is the difference
between rewriting a partition and rewriting the table — the source
keys are broadcast to locate affected files (one scan), then only
those files' rows are shuffled through the rewrite.

[PK] Delta/Iceberg papers & docs describe this protocol publicly;
implementation below is from scratch on the Spark DataFrame API.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"


class VersionConflict(Exception):
    """Another writer committed this version first (optimistic
    concurrency: the manifest name is the CAS slot)."""


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version}.json")


def snapshot_versions(table_dir: str) -> list[int]:
    """All committed versions, ascending. Only fully-renamed manifests
    count — a crashed writer's ``.tmp`` is invisible by construction."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def _write_data_files(df: DataFrame, table_dir: str, version: int,
                      token: str = "") -> list[str]:
    """Step 1 of a commit: write NEW immutable part files for
    ``version`` and return their table-relative paths. Does NOT
    publish a manifest — a crash after this step leaves the table
    readable at the previous version. ``token`` namespaces the data
    directory per WRITER so concurrent committers aiming at the same
    version never clobber each other's files (the manifest CAS, not
    the directory, decides who wins)."""
    rel_dir = os.path.join("data", f"v{version}{token and '-' + token}")
    out = os.path.join(table_dir, rel_dir)
    df.write.mode("overwrite").parquet(out)
    return sorted(
        os.path.join(rel_dir, f) for f in os.listdir(out)
        if f.endswith(".parquet"))


def _publish_manifest(table_dir: str, version: int,
                      files: list[str]) -> None:
    """Step 2 of a commit: atomically publish the manifest via
    ``os.link`` — link is BOTH atomic (readers never observe a partial
    file list) AND exclusive (EEXIST if another writer won the race
    for this version, unlike rename's silent replace), so the manifest
    name doubles as the optimistic-concurrency CAS slot the way
    Delta's ``_delta_log/N.json`` put-if-absent does [PK]."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".v{version}.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": sorted(files)}, fh,
                  indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, _manifest_path(table_dir, version))
    except FileExistsError:
        raise VersionConflict(
            f"version {version} of {table_dir} already committed")
    finally:
        os.unlink(tmp)


def commit_snapshot(df: DataFrame, table_dir: str,
                    mode: str = "append", max_retries: int = 5) -> int:
    """Commit ``df`` as a new version. ``overwrite`` replaces the live
    file set; ``append`` adds the new files to the previous version's
    list (logical UNION ALL — no existing file is touched either way).

    Optimistic concurrency: if another writer claims the version first
    (VersionConflict from the put-if-absent publish), re-resolve the
    head, rebase the file list on the WINNER's manifest, and retry on
    the next version — the data files were written once and are
    version-agnostic, so only the manifest step repeats. An
    ``overwrite`` rebase is trivial (ours replaces everything); an
    ``append`` rebase re-reads the new head's file list."""
    assert mode in ("append", "overwrite"), mode
    versions = snapshot_versions(table_dir)
    version = (versions[-1] + 1) if versions else 1
    new_files = _write_data_files(df, table_dir, version)
    return commit_files(table_dir, new_files, mode=mode,
                        max_retries=max_retries)


def commit_files(table_dir: str, new_files: list[str],
                 mode: str = "append", max_retries: int = 5) -> int:
    """Publish already-written data files as the next version, with
    the optimistic-concurrency rebase loop (see commit_snapshot)."""
    assert mode in ("append", "overwrite"), mode
    version = 0
    for _ in range(max_retries + 1):
        head = snapshot_versions(table_dir)
        version = max(version + 1, (head[-1] + 1) if head else 1)
        files = new_files
        if mode == "append" and head:
            files = read_manifest(table_dir, head[-1])["files"] + new_files
        try:
            _publish_manifest(table_dir, version, files)
            return version
        except VersionConflict:
            continue
    raise VersionConflict(
        f"gave up after {max_retries} rebases on {table_dir}")


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None,
                  merge_schema: bool = False) -> DataFrame:
    """Read the table at ``version`` (default: latest committed).
    ``merge_schema`` unions the file schemas (parquet mergeSchema):
    columns added by later commits null-fill in older files — the
    additive schema-evolution contract."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    v = versions[-1] if version is None else version
    files = read_manifest(table_dir, v)["files"]
    if not files:
        raise ValueError(f"version {v} of {table_dir} lists no files")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(
        *[os.path.join(table_dir, f) for f in files])


def read_version_diff(spark: SparkSession, table_dir: str,
                      version: int) -> DataFrame:
    """Incremental (CDC-style) read: ONLY the rows in data files that
    ``version`` added relative to ``version - 1`` — an append commit's
    diff is exactly the appended batch, read without touching any
    pre-existing file. This is the consumer side of incremental
    pipelines: each downstream run processes manifest-diff files, not
    the table."""
    prev = (set(read_manifest(table_dir, version - 1)["files"])
            if version > 1 else set())
    added = [f for f in read_manifest(table_dir, version)["files"]
             if f not in prev]
    if not added:
        raise ValueError(f"version {version} added no files")
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in added])


def list_data_files(table_dir: str) -> list[str]:
    """Every data file physically present, referenced or not."""
    out = []
    droot = os.path.join(table_dir, "data")
    for dirpath, _dirs, files in os.walk(droot):
        for f in files:
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, f), table_dir)
                out.append(rel.replace(os.sep, "/"))
    return sorted(out)


def vacuum(table_dir: str, dry_run: bool = False) -> list[str]:
    """GC files referenced by NO manifest (crashed writers' orphans,
    compacted-away files). Safe by construction: every committed
    version keeps its full file list, so vacuum never breaks time
    travel — it removes only what NO version can read. Returns the
    orphan list (and deletes it unless ``dry_run``)."""
    live: set[str] = set()
    for v in snapshot_versions(table_dir):
        live.update(read_manifest(table_dir, v)["files"])
    orphans = [f for f in list_data_files(table_dir) if f not in live]
    if not dry_run:
        for f in orphans:
            os.unlink(os.path.join(table_dir, f))
    return orphans


def merge_cow(spark: SparkSession, table_dir: str, source: DataFrame,
              key: str) -> int:
    """MERGE (upsert) with file-granular copy-on-write: target rows
    whose ``key`` appears in ``source`` are replaced by the source row,
    source rows with new keys are inserted, and — the COW part — data
    files containing NO matched key are carried into the new manifest
    untouched. Returns the committed version.

    Plan shape: one scan of the live files tagged with
    ``input_file_name()`` + a broadcast semi-join against the (small)
    source key set locates the affected files; only their rows are
    rewritten (anti-join drops the replaced ones, union inserts the
    source). The broadcast assumption is the MERGE norm — a CDC batch
    is small next to the table; for a giant source, swap the broadcast
    for a shuffle join, same protocol."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    prev = versions[-1]
    live = read_manifest(table_dir, prev)["files"]
    version = prev + 1

    cur = (spark.read.parquet(*[os.path.join(table_dir, f) for f in live])
           .withColumn("_file", F.input_file_name()))
    keys = source.select(key).distinct()
    touched_abs = {
        r["_file"] for r in
        (cur.join(F.broadcast(keys), key, "left_semi")
            .select("_file").distinct().collect())}
    # input_file_name() returns a URI; match manifest entries by suffix.
    untouched = [f for f in live
                 if not any(t.endswith(f.replace(os.sep, "/"))
                            for t in touched_abs)]
    touched = [f for f in live if f not in set(untouched)]
    if touched:
        kept = (spark.read.parquet(
                    *[os.path.join(table_dir, f) for f in touched])
                .join(F.broadcast(keys), key, "left_anti"))
        rewritten = kept.unionByName(source)
    else:
        rewritten = source
    new_files = _write_data_files(rewritten, table_dir, version)
    _publish_manifest(table_dir, version, untouched + new_files)
    return version
