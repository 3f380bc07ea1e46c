#!/usr/bin/env python
"""MOR vs COW merge throughput on the SCATTERED-CDC worst case.

Stages the 6M-row lineitem blow-up (testdata_derived/sf1ish by default)
as a 32-range-file snapshot table TWICE (one table per strategy), then
times, for the SAME scattered CDC batch (every 97th orderkey → matched
rows in every range file — the shape where file-granular copy-on-write
degenerates to a full table rewrite, BASELINE round-7 row):

  cow_merge_s        merge_cow: every file rewritten
  mor_merge_s        merge_mor: DV sidecar + 1 insert file, 0 rewrites
  read_plain_s       post-COW read+agg (no DV debt)
  read_mor_s         post-MOR read+agg (DV anti-join applied)
  compact_s          compact_dvs folding the DV debt back
  read_compacted_s   post-compaction read+agg (debt back to zero)

Correctness rides along: both strategies' post-merge aggregates must be
IDENTICAL (row count + decimal-exact value total), and post-compaction
must equal post-MOR. Prints ONE JSON line.

Usage: python tools/mor_throughput.py [sf_dir]
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


def _agg(df):
    r = df.agg(F.count(F.lit(1)).alias("n"),
               dsum("l_extendedprice").alias("t")).collect()[0]
    return int(r["n"]), float(r["t"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_derived/sf1ish"
    spark = get_spark("mor_throughput")
    li = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
          .select("l_orderkey", "l_linenumber", "l_extendedprice",
                  "l_shipdate"))
    li = li.withColumn("_k", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
    src = (li.filter(F.col("l_orderkey") % 97 == 0)
             .withColumn("l_extendedprice", F.col("l_extendedprice") + 1.0)
             .cache())
    n_src = src.count()

    out = {"rows": li.count(), "cdc_rows": n_src}
    base = scratch_dir("mor_bench")  # ONE call: scratch_dir wipes per call
    tables = {}
    for tag in ("cow", "mor"):
        tdir = os.path.join(base, f"li_{tag}")
        shutil.rmtree(tdir, ignore_errors=True)
        snapshots.commit_snapshot(
            li.repartitionByRange(32, "_k"), tdir, mode="overwrite")
        tables[tag] = tdir

    t0 = time.perf_counter()
    snapshots.merge_cow(spark, tables["cow"], src, "_k")
    out["cow_merge_s"] = round(time.perf_counter() - t0, 2)
    m = snapshots.read_manifest(tables["cow"], 2)
    v1 = set(snapshots.read_manifest(tables["cow"], 1)["files"])
    out["cow_files_rewritten"] = len(v1 - set(m["files"]))

    t0 = time.perf_counter()
    snapshots.merge_mor(spark, tables["mor"], src, "_k")
    out["mor_merge_s"] = round(time.perf_counter() - t0, 2)
    m = snapshots.read_manifest(tables["mor"], 2)
    v1 = set(snapshots.read_manifest(tables["mor"], 1)["files"])
    out["mor_files_rewritten"] = len(v1 - set(m["files"]))

    t0 = time.perf_counter()
    cow_agg = _agg(snapshots.read_snapshot(spark, tables["cow"]))
    out["read_plain_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    mor_agg = _agg(snapshots.read_snapshot(spark, tables["mor"]))
    out["read_mor_s"] = round(time.perf_counter() - t0, 2)
    assert cow_agg == mor_agg, (cow_agg, mor_agg)

    t0 = time.perf_counter()
    snapshots.compact_dvs(spark, tables["mor"])
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    comp_agg = _agg(snapshots.read_snapshot(spark, tables["mor"]))
    out["read_compacted_s"] = round(time.perf_counter() - t0, 2)
    assert comp_agg == mor_agg, (comp_agg, mor_agg)
    assert not snapshots.read_manifest(
        tables["mor"], snapshots.snapshot_versions(tables["mor"])[-1]
    ).get("dvs")
    out["agg_identical"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
