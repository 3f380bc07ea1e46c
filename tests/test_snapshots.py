"""Copy-on-write snapshot layer: commit atomicity, time travel, and
file-granular MERGE (VERDICT r6 ask 5).

The load-bearing property is the torn-commit one: a writer that dies
AFTER writing new part files but BEFORE publishing the manifest must
leave readers on the previous version exactly — no partial state is
ever visible, because the manifest is the only commit point and it
appears atomically (write-temp + rename)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark.operators import snapshots


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "cow_table")


def _mk(spark, lo, hi, shift=0.0):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("k"),
                    (F.col("id").cast("double") + shift).alias("v")))


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_commit_and_read_roundtrip(spark, tdir):
    v = snapshots.commit_snapshot(_mk(spark, 0, 100), tdir,
                                  mode="overwrite")
    assert v == 1
    assert snapshots.snapshot_versions(tdir) == [1]
    assert _rows(snapshots.read_snapshot(spark, tdir)) == _rows(
        _mk(spark, 0, 100))


def test_crash_between_part_files_and_manifest_is_invisible(spark, tdir):
    """Simulate the writer dying between step 1 (part files) and
    step 2 (manifest): readers must keep seeing v1 exactly."""
    snapshots.commit_snapshot(_mk(spark, 0, 50), tdir, mode="overwrite")
    # step 1 of a v2 append happens... and the writer dies here.
    snapshots._write_data_files(_mk(spark, 50, 100), tdir, version=2)
    assert snapshots.snapshot_versions(tdir) == [1]
    assert _rows(snapshots.read_snapshot(spark, tdir)) == _rows(
        _mk(spark, 0, 50))
    # recovery: a later writer allocates v2 again and commits fully —
    # the orphaned files are simply superseded (GC'able, never read).
    v = snapshots.commit_snapshot(_mk(spark, 50, 100), tdir,
                                  mode="append")
    assert v == 2
    assert _rows(snapshots.read_snapshot(spark, tdir)) == _rows(
        _mk(spark, 0, 100))


def test_crash_mid_manifest_write_is_invisible(spark, tdir):
    """A partially-written manifest temp file is never resolved: only
    the atomic rename makes a version exist."""
    snapshots.commit_snapshot(_mk(spark, 0, 50), tdir, mode="overwrite")
    tmp = os.path.join(tdir, "_manifests", ".v2.json.tmp")
    with open(tmp, "w") as fh:
        fh.write('{"version": 2, "files": ["data/v2/part-')  # torn JSON
    assert snapshots.snapshot_versions(tdir) == [1]
    assert len(_rows(snapshots.read_snapshot(spark, tdir))) == 50


def test_append_does_not_rewrite_history(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 50), tdir, mode="overwrite")
    v1_files = set(snapshots.read_manifest(tdir, 1)["files"])
    snapshots.commit_snapshot(_mk(spark, 50, 80), tdir, mode="append")
    v2_files = set(snapshots.read_manifest(tdir, 2)["files"])
    assert v1_files < v2_files  # strict superset: old files by reference
    assert len(_rows(snapshots.read_snapshot(spark, tdir, version=1))) == 50
    assert len(_rows(snapshots.read_snapshot(spark, tdir, version=2))) == 80


def test_time_travel_immutability_through_merge(spark, tdir):
    base = _mk(spark, 0, 100)
    snapshots.commit_snapshot(base, tdir, mode="overwrite")
    src = _mk(spark, 90, 120, shift=1000.0)
    snapshots.merge_cow(spark, tdir, src, "k")
    # latest: keys 90-99 replaced, 100-119 inserted
    latest = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert len(latest) == 120
    assert latest[10] == 10.0
    assert latest[95] == 1095.0 and latest[110] == 1110.0
    # v1 unchanged after the merge
    assert _rows(snapshots.read_snapshot(spark, tdir, version=1)) == _rows(
        base)


def test_merge_cow_is_file_granular(spark, tdir):
    """Files containing no matched key must be carried into the new
    manifest BY REFERENCE (same path), not rewritten — the property
    that makes MERGE affordable at 100 TB. Range-partitioned base so
    the matched keys (900+) land in a known file subset."""
    base = (_mk(spark, 0, 1000).repartitionByRange(8, "k"))
    snapshots.commit_snapshot(base, tdir, mode="overwrite")
    v1_files = set(snapshots.read_manifest(tdir, 1)["files"])
    assert len(v1_files) == 8
    src = _mk(spark, 900, 950, shift=5000.0)
    snapshots.merge_cow(spark, tdir, src, "k")
    v2_files = set(snapshots.read_manifest(tdir, 2)["files"])
    carried = v1_files & v2_files
    rewritten = v1_files - v2_files
    # most range files contain no key >= 900 → carried untouched
    assert len(carried) >= 5, (len(carried), len(v1_files))
    assert rewritten, "at least the file(s) holding 900-949 rewritten"
    latest = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert len(latest) == 1000
    assert latest[925] == 5925.0 and latest[0] == 0.0


def test_manifest_is_sorted_json(tdir, spark):
    snapshots.commit_snapshot(_mk(spark, 0, 10), tdir, mode="overwrite")
    m = json.load(open(os.path.join(tdir, "_manifests", "v1.json")))
    assert m["version"] == 1
    assert m["files"] == sorted(m["files"])


def test_concurrent_writers_cas_exactly_one_wins(spark, tdir):
    """Two writers race for the same version: the put-if-absent
    manifest publish lets exactly one win; the loser's rebase keeps
    BOTH writers' rows (no lost update)."""
    snapshots.commit_snapshot(_mk(spark, 0, 40), tdir, mode="overwrite")
    fa = snapshots._write_data_files(_mk(spark, 40, 60), tdir, 2, "a")
    fb = snapshots._write_data_files(_mk(spark, 60, 90), tdir, 2, "b")
    assert snapshots.commit_files(tdir, fa, mode="append") == 2
    with pytest.raises(snapshots.VersionConflict):
        snapshots._publish_manifest(tdir, 2, fb)
    assert snapshots.commit_files(tdir, fb, mode="append") == 3
    assert len(_rows(snapshots.read_snapshot(spark, tdir))) == 90
    # no lost update: A's rows survived B's rebased commit
    assert dict(_rows(snapshots.read_snapshot(spark, tdir)))[45] == 45.0


def test_vacuum_removes_only_unreferenced(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 50), tdir, mode="overwrite")
    snapshots._write_data_files(_mk(spark, 50, 80), tdir, 2, "crashed")
    snapshots.commit_snapshot(_mk(spark, 80, 100), tdir, mode="append")
    # Retention window (ADVICE r7): the just-written orphans are
    # younger than the default 24 h window, so a DEFAULT vacuum must
    # keep them — they are indistinguishable from an in-flight
    # writer's step-1 files.
    assert snapshots.vacuum(tdir, dry_run=True) == []
    orphans = snapshots.vacuum(tdir, dry_run=True, retain_seconds=0)
    assert orphans and all("crashed" in f for f in orphans)
    before = set(snapshots.list_data_files(tdir))
    removed = snapshots.vacuum(tdir, retain_seconds=0)
    assert set(removed) == set(orphans)
    assert set(snapshots.list_data_files(tdir)) == before - set(orphans)
    # every committed version still reads after vacuum
    assert len(_rows(snapshots.read_snapshot(spark, tdir, version=1))) == 50
    assert len(_rows(snapshots.read_snapshot(spark, tdir, version=2))) == 70


def test_schema_evolution_null_fills_old_files(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 30), tdir, mode="overwrite")
    v2 = _mk(spark, 30, 50).withColumn("tag", F.lit("new"))
    snapshots.commit_snapshot(v2, tdir, mode="append")
    got = snapshots.read_snapshot(spark, tdir, merge_schema=True)
    assert set(got.columns) == {"k", "v", "tag"}
    by_tag = {r["tag"]: r["n"] for r in
              got.groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert by_tag == {None: 30, "new": 20}


def test_merge_mor_rewrites_nothing(spark, tdir):
    """The scattered-CDC shape (a few keys in EVERY file — the COW
    worst case where file-granular MERGE rewrites the whole table):
    merge_mor must carry every v1 data file BY REFERENCE, add exactly
    one insert file plus a DV sidecar, and the read must apply the
    upsert exactly."""
    base = _mk(spark, 0, 1000).repartitionByRange(8, "k")
    snapshots.commit_snapshot(base, tdir, mode="overwrite")
    v1_files = set(snapshots.read_manifest(tdir, 1)["files"])
    assert len(v1_files) == 8
    # every 100th key → one matched row in each range file
    src = (_mk(spark, 0, 1000, shift=9000.0)
           .filter(F.col("k") % 100 == 0)
           .unionByName(_mk(spark, 1000, 1010, shift=9000.0)))
    v = snapshots.merge_mor(spark, tdir, src, "k")
    assert v == 2
    m2 = snapshots.read_manifest(tdir, 2)
    assert v1_files < set(m2["files"])  # all carried by reference
    assert len(set(m2["files"]) - v1_files) >= 1  # insert file(s)
    assert m2["dvs"], "a DV sidecar must be referenced"
    latest = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert len(latest) == 1010
    assert latest[300] == 9300.0 and latest[1005] == 10005.0
    assert latest[7] == 7.0  # unmatched rows untouched
    # time travel: v1 reads WITHOUT the DVs
    assert dict(_rows(snapshots.read_snapshot(spark, tdir, 1)))[300] == 300.0


def test_merge_mor_stacks_and_compacts(spark, tdir):
    """Two stacked MOR merges (the second re-updating a key the first
    inserted) must read correctly; compact_dvs must then fold the debt
    into rewritten files, clear the manifest's DVs, preserve the
    values, and leave pre-compaction versions time-travelable."""
    snapshots.commit_snapshot(_mk(spark, 0, 400).repartitionByRange(4, "k"),
                              tdir, mode="overwrite")
    snapshots.merge_mor(spark, tdir, _mk(spark, 100, 110, shift=1000.0), "k")
    snapshots.merge_mor(spark, tdir, _mk(spark, 105, 115, shift=2000.0), "k")
    latest = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert latest[102] == 1102.0        # first merge survives
    assert latest[107] == 2107.0        # second overrides the first
    assert latest[112] == 2112.0        # second-insert
    assert len(latest) == 400
    v = snapshots.compact_dvs(spark, tdir)
    assert v == 4
    m = snapshots.read_manifest(tdir, v)
    assert "dvs" not in m
    compacted = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert compacted == latest
    # idempotent: no DVs → no-op
    assert snapshots.compact_dvs(spark, tdir) == v
    # pre-compaction version still reads with its DVs applied
    v3 = dict(_rows(snapshots.read_snapshot(spark, tdir, 3)))
    assert v3 == latest


def test_merge_cow_refuses_dv_head(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 100), tdir, mode="overwrite")
    snapshots.merge_mor(spark, tdir, _mk(spark, 0, 5, shift=50.0), "k")
    with pytest.raises(ValueError, match="compact_dvs"):
        snapshots.merge_cow(spark, tdir, _mk(spark, 5, 9), "k")


def test_append_after_mor_carries_dvs(spark, tdir):
    """An append commit on a DV-carrying head must keep the DVs (they
    tombstone positions in files that remain live) — dropping them
    would resurrect deleted rows."""
    snapshots.commit_snapshot(_mk(spark, 0, 100), tdir, mode="overwrite")
    snapshots.merge_mor(spark, tdir, _mk(spark, 10, 20, shift=700.0), "k")
    snapshots.commit_snapshot(_mk(spark, 100, 120), tdir, mode="append")
    m = snapshots.read_manifest(tdir, 3)
    assert m.get("dvs"), "append must carry the head's deletion vectors"
    latest = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert len(latest) == 120
    assert latest[15] == 715.0 and latest[110] == 110.0


def test_concurrent_commit_snapshot_data_dirs_never_clobber(spark, tdir):
    """ADVICE r7 (medium): two commit_snapshot callers that both
    compute the same next version must land their part files in
    DISTINCT (token-namespaced) directories, so the CAS loser's
    rebased commit still references intact files."""
    snapshots.commit_snapshot(_mk(spark, 0, 10), tdir, mode="overwrite")
    # simulate the race: both writers compute version=2 and write
    # their data before either publishes (commit_snapshot's uuid token
    # namespaces each); then both publish through the rebase loop.
    fa = snapshots._write_data_files(
        _mk(spark, 10, 20), tdir, 2, token="w" + os.urandom(4).hex())
    v_b = snapshots.commit_snapshot(_mk(spark, 20, 30), tdir, mode="append")
    assert v_b == 2
    # A's files survived B's v2 write (distinct dirs) → A commits as v3
    assert snapshots.commit_files(tdir, fa, mode="append") == 3
    assert len(_rows(snapshots.read_snapshot(spark, tdir))) == 30


def test_version_diff_reads_only_new_files(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 60), tdir, mode="overwrite")
    snapshots.commit_snapshot(_mk(spark, 60, 75), tdir, mode="append")
    diff = snapshots.read_version_diff(spark, tdir, 2)
    assert _rows(diff) == _rows(_mk(spark, 60, 75))


# --- round 9: MOR commit-protocol crash injection (VERDICT r8 ask 3) ------


def test_mor_crash_between_dv_write_and_publish_is_invisible(
        spark, tdir, monkeypatch):
    """Kill the MOR writer BETWEEN the DV-sidecar write and the
    manifest publish: readers of the old head must never see the
    orphaned DV (no row disappears), and vacuum(retain=0) must reclaim
    exactly the orphaned sidecar + insert files."""
    snapshots.commit_snapshot(
        _mk(spark, 0, 100).repartition(4, "k"), tdir, mode="overwrite")
    before = _rows(snapshots.read_snapshot(spark, tdir))
    src = _mk(spark, 50, 60, shift=100.0)

    real = snapshots._publish_manifest

    def die(*a, **kw):
        raise RuntimeError("writer killed before manifest publish")

    monkeypatch.setattr(snapshots, "_publish_manifest", die)
    with pytest.raises(RuntimeError):
        snapshots.merge_mor(spark, tdir, src, "k")
    monkeypatch.setattr(snapshots, "_publish_manifest", real)

    # the manifest is the only commit point: head unchanged, old read
    # exact — the orphaned DV is invisible (no tombstone applied)
    assert snapshots.snapshot_versions(tdir) == [1]
    assert _rows(snapshots.read_snapshot(spark, tdir)) == before

    # the sidecar and insert files ARE on disk, unreferenced...
    orphans = snapshots.vacuum(tdir, dry_run=True, retain_seconds=0.0)
    assert any("-dv/" in f for f in orphans), orphans
    assert any("-dv/" not in f for f in orphans), orphans
    # ...and vacuum reclaims exactly them, after which the table is
    # byte-identical in behavior and a rerun merge commits cleanly
    assert snapshots.vacuum(tdir, retain_seconds=0.0) == orphans
    assert snapshots.vacuum(tdir, dry_run=True, retain_seconds=0.0) == []
    assert _rows(snapshots.read_snapshot(spark, tdir)) == before
    v = snapshots.merge_mor(spark, tdir, src, "k")
    assert v == 2
    got = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert all(got[k] == k + 100.0 for k in range(50, 60))
    assert all(got[k] == float(k) for k in range(0, 50))


def test_mor_crash_between_dv_and_insert_write_is_invisible(
        spark, tdir, monkeypatch):
    """Same protocol, earlier crash point: the writer dies after the
    DV sidecar but BEFORE the insert files (step 1 incomplete)."""
    snapshots.commit_snapshot(_mk(spark, 0, 40), tdir, mode="overwrite")
    before = _rows(snapshots.read_snapshot(spark, tdir))

    real = snapshots._write_data_files

    def die(*a, **kw):
        raise RuntimeError("writer killed before insert-file write")

    monkeypatch.setattr(snapshots, "_write_data_files", die)
    with pytest.raises(RuntimeError):
        snapshots.merge_mor(spark, tdir, _mk(spark, 0, 5, shift=7.0), "k")
    monkeypatch.setattr(snapshots, "_write_data_files", real)

    assert snapshots.snapshot_versions(tdir) == [1]
    assert _rows(snapshots.read_snapshot(spark, tdir)) == before
    orphans = snapshots.vacuum(tdir, retain_seconds=0.0)
    assert orphans and all("-dv/" in f for f in orphans), orphans
    assert _rows(snapshots.read_snapshot(spark, tdir)) == before


def test_mor_append_rebase_on_concurrent_append(spark, tdir, monkeypatch):
    """ADVICE r8: a concurrent PURE APPEND winning the version CAS is
    rebased over (appended files cannot be referenced by our DV), so
    the merge commits on the next version instead of failing."""
    snapshots.commit_snapshot(_mk(spark, 0, 100), tdir, mode="overwrite")
    src = _mk(spark, 0, 10, shift=100.0)

    real = snapshots._publish_manifest
    state = {"raced": False}

    def racing(table_dir, version, files, dvs=None):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent append claims this version first
            snapshots.commit_snapshot(_mk(spark, 200, 210), tdir,
                                      mode="append")
        return real(table_dir, version, files, dvs=dvs)

    monkeypatch.setattr(snapshots, "_publish_manifest", racing)
    v = snapshots.merge_mor(spark, tdir, src, "k")
    assert v == 3  # append took v2; the merge rebased onto it
    got = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert all(got[k] == k + 100.0 for k in range(0, 10))   # upserted
    assert all(got[k] == float(k) for k in range(10, 100))  # untouched
    assert all(got[k] == float(k) for k in range(200, 210))  # appended


def test_mor_conflict_with_concurrent_merge_still_raises(
        spark, tdir, monkeypatch):
    """The rebase is APPEND-only: losing the CAS to another MOR merge
    (head gained DVs — our position scan is stale) must still raise,
    and the loser's files must be vacuum-reclaimable."""
    snapshots.commit_snapshot(
        _mk(spark, 0, 100).repartition(4, "k"), tdir, mode="overwrite")

    real = snapshots._publish_manifest
    state = {"raced": False}

    def racing(table_dir, version, files, dvs=None):
        if not state["raced"]:
            state["raced"] = True
            snapshots.merge_mor(spark, tdir,
                                _mk(spark, 90, 95, shift=500.0), "k")
        return real(table_dir, version, files, dvs=dvs)

    monkeypatch.setattr(snapshots, "_publish_manifest", racing)
    with pytest.raises(snapshots.VersionConflict):
        snapshots.merge_mor(spark, tdir, _mk(spark, 0, 5, shift=9.0), "k")
    monkeypatch.setattr(snapshots, "_publish_manifest", real)

    # the WINNER's merge is intact; the loser left only orphans
    got = dict(_rows(snapshots.read_snapshot(spark, tdir)))
    assert all(got[k] == k + 500.0 for k in range(90, 95))
    assert all(got[k] == float(k) for k in range(0, 90))
    orphans = snapshots.vacuum(tdir, retain_seconds=0.0)
    assert orphans
    assert dict(_rows(snapshots.read_snapshot(spark, tdir))) == got


# --- round 9: ADVICE r8 fixes (schema evolution, reserved columns) --------


def test_compact_dvs_merge_schema_preserves_evolved_columns(spark, tdir):
    """ADVICE r8 (medium): compacting a table whose touched files have
    heterogeneous (additively evolved) schemas must not drop the
    late-added column from the rewritten files."""
    old = _mk(spark, 0, 50)
    new = _mk(spark, 50, 100).withColumn(
        "w", (F.col("k") * 2).cast("double"))
    snapshots.commit_snapshot(old, tdir, mode="overwrite")
    snapshots.commit_snapshot(new, tdir, mode="append")
    # tombstone one key in EACH schema generation → both files dirty
    snapshots.merge_mor(spark, tdir,
                        _mk(spark, 10, 11).unionByName(_mk(spark, 60, 61)),
                        "k")
    v = snapshots.compact_dvs(spark, tdir)
    out = snapshots.read_snapshot(spark, tdir, version=v,
                                  merge_schema=True)
    assert "w" in out.columns
    got = {r["k"]: r["w"] for r in out.collect()}
    assert len(got) == 100  # 98 survivors + 2 re-inserted by the merge
    for k in range(50, 100):
        if k == 60:
            # upserted by a source WITHOUT w → null-filled, by design
            assert got[k] is None
        else:
            assert got[k] == 2.0 * k, f"evolved column lost at k={k}"
    for k in range(0, 50):
        assert got[k] is None


def test_user_file_pos_columns_survive_mor_read(spark, tdir):
    """ADVICE r8: a table whose SCHEMA contains `_file`/`_pos` must
    round-trip through merge_mor + the DV anti-join untouched — the
    working columns now use reserved internal names."""
    df = (_mk(spark, 0, 30)
          .withColumn("_file", F.concat(F.lit("user-"), F.col("k")))
          .withColumn("_pos", (F.col("k") * 10).cast("long")))
    snapshots.commit_snapshot(df, tdir, mode="overwrite")
    src = (_mk(spark, 5, 8, shift=100.0)
           .withColumn("_file", F.lit("upserted"))
           .withColumn("_pos", F.lit(-1).cast("long")))
    snapshots.merge_mor(spark, tdir, src, "k")
    out = snapshots.read_snapshot(spark, tdir)
    got = {r["k"]: (r["v"], r["_file"], r["_pos"]) for r in out.collect()}
    assert len(got) == 30
    for k in range(5, 8):
        assert got[k] == (k + 100.0, "upserted", -1)
    for k in list(range(0, 5)) + list(range(8, 30)):
        assert got[k] == (float(k), f"user-{k}", k * 10)


def test_reserved_internal_colname_raises(spark, tdir):
    df = _mk(spark, 0, 10).withColumn(
        "__snapshot_dv_file__", F.lit("x"))
    snapshots.commit_snapshot(df, tdir, mode="overwrite")
    snapshots.merge_mor(spark, tdir,
                        _mk(spark, 0, 2).withColumn(
                            "__snapshot_dv_file__", F.lit("y")), "k")
    with pytest.raises(ValueError, match="reserved internal"):
        snapshots.read_snapshot(spark, tdir)


def test_merge_cow_merge_schema_preserves_evolved_columns(spark, tdir):
    """ADVICE r8 (latent twin of the compact_dvs issue): a COW merge
    whose touched files span schema generations must keep the evolved
    column in the rewrite."""
    snapshots.commit_snapshot(_mk(spark, 0, 50), tdir, mode="overwrite")
    snapshots.commit_snapshot(
        _mk(spark, 50, 100).withColumn("w", (F.col("k") * 3).cast("double")),
        tdir, mode="append")
    # source touches keys in BOTH generations; no `w` column on purpose
    snapshots.merge_cow(spark, tdir,
                        _mk(spark, 10, 11, shift=100.0).unionByName(
                            _mk(spark, 60, 61, shift=100.0)), "k")
    out = snapshots.read_snapshot(spark, tdir, merge_schema=True)
    got = {r["k"]: (r["v"], r["w"]) for r in out.collect()}
    assert len(got) == 100
    assert got[10] == (110.0, None) and got[60] == (160.0, None)
    for k in range(50, 100):
        if k != 60:
            assert got[k] == (float(k), 3.0 * k), f"evolved col lost k={k}"


def test_should_compact_threshold_counts_dv_sidecars(spark, tdir):
    """The committed compaction policy (tools/mor_read_amp.py curve):
    one DV sidecar per merge_mor commit, carried through appends,
    cleared by compact_dvs."""
    assert snapshots.should_compact(tdir) is False  # no table yet
    snapshots.commit_snapshot(_mk(spark, 0, 40), tdir, mode="overwrite")
    assert snapshots.should_compact(tdir) is False
    for i in range(3):
        snapshots.merge_mor(spark, tdir,
                            _mk(spark, i, i + 1, shift=50.0), "k")
    assert snapshots.should_compact(tdir, max_dv_commits=3)
    assert not snapshots.should_compact(tdir)  # default 16 not reached
    # appends carry the debt without adding to it
    snapshots.commit_snapshot(_mk(spark, 40, 45), tdir, mode="append")
    assert snapshots.should_compact(tdir, max_dv_commits=3)
    snapshots.compact_dvs(spark, tdir)
    assert not snapshots.should_compact(tdir, max_dv_commits=1)


# --- round 9: named refs (tags/branches) + rollback ------------------------

def test_tag_is_immutable_and_branch_moves(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 10), tdir, mode="overwrite")
    v2 = snapshots.commit_snapshot(_mk(spark, 10, 20), tdir,
                                   mode="append")
    assert snapshots.create_tag(tdir, "rel", 1) == 1
    with pytest.raises(snapshots.RefExists):
        snapshots.create_tag(tdir, "rel", v2)
    assert snapshots.resolve_ref(tdir, "tag:rel") == 1
    # branch points at head, then moves back; tag stays put
    assert snapshots.set_branch(tdir, "main") == v2
    assert snapshots.resolve_ref(tdir, "branch:main") == v2
    snapshots.set_branch(tdir, "main", 1)
    assert snapshots.resolve_ref(tdir, "branch:main") == 1
    assert snapshots.resolve_ref(tdir, "rel") == 1
    assert _rows(snapshots.read_ref(spark, tdir, "tag:rel")) == _rows(
        _mk(spark, 0, 10))


def test_rollback_preserves_history_and_touches_no_data(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 10), tdir, mode="overwrite")
    v2 = snapshots.commit_snapshot(_mk(spark, 10, 20), tdir,
                                   mode="append")
    v3 = snapshots.commit_snapshot(_mk(spark, 20, 30), tdir,
                                   mode="append")
    before = set(snapshots.list_data_files(tdir))
    v4 = snapshots.rollback(tdir, v2)
    assert v4 == v3 + 1
    assert set(snapshots.list_data_files(tdir)) == before
    # head reads as v2; v3 stays time-travelable
    assert _rows(snapshots.read_snapshot(spark, tdir)) == _rows(
        _mk(spark, 0, 20))
    assert _rows(snapshots.read_snapshot(spark, tdir, version=v3)) == \
        _rows(_mk(spark, 0, 30))
    # a rolled-back table accepts new commits on the restored lineage
    v5 = snapshots.commit_snapshot(_mk(spark, 30, 35), tdir,
                                   mode="append")
    assert v5 == v4 + 1
    assert _rows(snapshots.read_snapshot(spark, tdir)) == _rows(
        _mk(spark, 0, 20).unionByName(_mk(spark, 30, 35)))


def test_rollback_carries_dvs(spark, tdir):
    """Rolling back to a MOR version must restore its deletion
    vectors too — the manifest copy includes the dvs key."""
    snapshots.commit_snapshot(_mk(spark, 0, 20), tdir, mode="overwrite")
    src = (_mk(spark, 5, 8, shift=100.0)
           .withColumn("__deleted__", F.lit(False)))
    v2 = snapshots.merge_mor(spark, tdir, src.drop("__deleted__"), "k")
    want = _rows(snapshots.read_snapshot(spark, tdir))
    snapshots.commit_snapshot(_mk(spark, 50, 60), tdir, mode="append")
    v4 = snapshots.rollback(tdir, v2)
    assert v4 > v2
    assert _rows(snapshots.read_snapshot(spark, tdir)) == want


def test_bad_ref_names_and_missing_refs(spark, tdir):
    snapshots.commit_snapshot(_mk(spark, 0, 5), tdir, mode="overwrite")
    with pytest.raises(ValueError):
        snapshots.create_tag(tdir, "a/b", 1)
    with pytest.raises(ValueError):
        snapshots.create_tag(tdir, "x", 99)
    with pytest.raises(FileNotFoundError):
        snapshots.resolve_ref(tdir, "nope")
