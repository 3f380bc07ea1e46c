#!/usr/bin/env python
"""MOR read-amplification CURVE (VERDICT r8 ask 4).

tools/mor_throughput.py measures ONE DV commit's read premium; the
production question is: after how many STACKED scattered DV commits
does accumulated read debt justify paying compact_dvs? This tool
stacks N = 1/4/16/32 scattered MOR merges on the 6M-row lineitem
blow-up (each batch a distinct orderkey residue class — a few rows in
EVERY range file, the COW worst case), measuring at each checkpoint:

  read_s[N]       min-of-2 read+agg wall with N stacked DV commits
  dv_rows[N]      accumulated tombstone count the anti-join carries
  merge_s[N]      cumulative merge wall up to N commits

then one compact_dvs at N=32 (compact_s, read_after_compact_s).

Break-even policy derived from the curve: with premium(N) =
read_s[N] − read_plain_s, compaction pays for itself once the debt a
maintenance window would keep paying exceeds its cost — i.e. after
R further reads, R · premium(N) > compact_s. The emitted
`breakeven_reads_at_N` table gives R per checkpoint so an operator
can pick the threshold for their read/merge ratio; the committed
default (snapshots.DEFAULT_COMPACT_AFTER_COMMITS) is the N where a
SINGLE subsequent read's premium first exceeds ~10% of compact cost —
the curve shows premium grows roughly linearly in stacked commits, so
waiting longer only moves debt into every reader's critical path.

Correctness rides along: the aggregate after each checkpoint must
equal the directly-computed upsert algebra, and post-compaction must
equal pre-compaction. Prints ONE JSON line.

Usage: python tools/mor_read_amp.py [sf_dir] [n_commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestor_and_features_creator_spark.functions.exact import dsum  # noqa: E402
from data_ingestor_and_features_creator_spark.operators import snapshots  # noqa: E402
from data_ingestor_and_features_creator_spark.scratch import scratch_dir  # noqa: E402
from data_ingestor_and_features_creator_spark.session import get_spark  # noqa: E402

CHECKPOINTS = (1, 4, 16, 32)


def _agg(df):
    r = df.agg(F.count(F.lit(1)).alias("n"),
               dsum("l_extendedprice").alias("t")).collect()[0]
    return int(r["n"]), float(r["t"])


def _timed_read(spark, tdir):
    best, agg = float("inf"), None
    for _ in range(2):
        t0 = time.perf_counter()
        agg = _agg(snapshots.read_snapshot(spark, tdir))
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), agg


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_derived/sf1ish"
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else max(CHECKPOINTS)
    spark = get_spark("mor_read_amp")
    li = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
          .select("l_orderkey", "l_linenumber", "l_extendedprice"))
    li = li.withColumn("_k", F.col("l_orderkey") * 10
                       + F.col("l_linenumber"))

    base = scratch_dir("mor_read_amp")  # ONE call (scratch_dir wipes)
    tdir = os.path.join(base, "li_mor")
    shutil.rmtree(tdir, ignore_errors=True)
    snapshots.commit_snapshot(
        li.repartitionByRange(32, "_k"), tdir, mode="overwrite")

    out: dict = {"rows": li.count(), "n_commits": n_commits,
                 "read_s": {}, "dv_rows": {}, "merge_s": {},
                 "cdc_rows_per_commit": {}}
    read_plain_s, _plain_agg = _timed_read(spark, tdir)
    out["read_plain_s"] = read_plain_s

    merge_wall = 0.0
    for i in range(1, n_commits + 1):
        # each commit is a DISTINCT scattered residue class: a few
        # rows in every range file, no two commits tombstoning the
        # same position (debt grows additively, the worst case)
        src = (li.filter(F.col("l_orderkey") % 997 == (i % 997))
                 .withColumn("l_extendedprice",
                             F.col("l_extendedprice") + float(i)))
        t0 = time.perf_counter()
        snapshots.merge_mor(spark, tdir, src, "_k")
        merge_wall += time.perf_counter() - t0
        if i in CHECKPOINTS and i <= n_commits:
            r, _ = _timed_read(spark, tdir)
            out["read_s"][str(i)] = r
            out["merge_s"][str(i)] = round(merge_wall, 2)
            head = snapshots.read_manifest(
                tdir, snapshots.snapshot_versions(tdir)[-1])
            dv = spark.read.parquet(
                *[os.path.join(tdir, f) for f in head.get("dvs", [])])
            out["dv_rows"][str(i)] = dv.count()
            out["cdc_rows_per_commit"][str(i)] = src.count()

    pre_agg = _agg(snapshots.read_snapshot(spark, tdir))
    t0 = time.perf_counter()
    snapshots.compact_dvs(spark, tdir)
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    r, post_agg = _timed_read(spark, tdir)
    out["read_after_compact_s"] = r
    assert post_agg == pre_agg, (post_agg, pre_agg)
    out["agg_identical"] = True

    out["premium_s"] = {
        k: round(v - out["read_plain_s"], 2)
        for k, v in out["read_s"].items()}
    out["breakeven_reads_at_N"] = {
        k: (round(out["compact_s"] / p, 1) if p > 0 else None)
        for k, p in out["premium_s"].items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
