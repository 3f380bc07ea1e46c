#!/usr/bin/env python
"""Driver-style oracle check for a subset of query ids (fast iteration).

Usage: python tools/check_subset.py [--digest] [sf_dir] id1 id2 ...
       python tools/check_subset.py /root/testdata/sf0.01 agg_bitmap_distinct
If the first arg is not a path, sf_dir defaults to /root/testdata/sf0.001.

--digest switches to the UNBOUNDED in-engine compare (tests/
oracle_compare.py assert_same_digest): each engine reduces its result to
(row count, order-insensitive md5-lo64 sum) and only those scalars reach
the driver — nothing scales with result size, so a 125.8M-row grid
(time_bucket_gapfill at the 30x blow-up) checks without touching
spark.driver.maxResultSize. The default pandas path stays the
driver-faithful one (it exercises the same .df() degradations the driver
sees); --digest is for results too large to collect.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as e
from data_ingestor_and_features_creator_spark.session import get_spark
from tests.oracle_compare import (assert_same_digest, assert_same_result,
                                  duck_fetch)


def main() -> int:
    args = sys.argv[1:]
    digest = "--digest" in args
    args = [a for a in args if a != "--digest"]
    sf = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf, args = args[0], args[1:]
    spark = get_spark("check_subset", cpus=16)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            # Hive-partitioned directory layout (sf1p): glob the part
            # files WITHOUT hive column synthesis, so the oracle sees
            # the same declared table shape Spark's parquet_table
            # projects (partition values are redundant with the source
            # date columns kept in the files).
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{path}/**/*.parquet', hive_partitioning=false)")
        elif os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        # else: fixture lacks this table (e.g. sf1ish has no events) —
        # ids that need it fail loudly at query time, others check fine
    qs, os_ = e.queries(), e.oracle_sql()
    fails = []
    for name in args or qs:
        if name not in qs:
            print(name, "UNKNOWN"); fails.append(name); continue
        try:
            sdf = qs[name](spark, sf)
            if digest:
                if name in os_:
                    n = assert_same_digest(name, sdf, con, os_[name])
                    print(name, "DIGEST MATCH", n)
                else:
                    print(name, "rows-only", sdf.count())
                continue
            spdf = sdf.toPandas()
            srows = list(spdf.itertuples(index=False, name=None))
            if name in os_:
                # duck_fetch = .df() (pandas), NOT fetchall(): the driver
                # canonicalizes through pandas, where DuckDB HUGEINT becomes
                # float64 — fetchall masks that drift (bitten twice: round-1
                # SUM(CASE), round-3 windowed SUM island ids). Decimal-typed
                # oracle columns alone route through Arrow to stay exact.
                dpdf = duck_fetch(con, os_[name])
                assert_same_result(name, list(spdf.columns), srows,
                                   list(dpdf.columns),
                                   list(dpdf.itertuples(index=False,
                                                        name=None)))
                print(name, "ORACLE MATCH", len(srows))
            else:
                print(name, "rows-only", len(srows))
        except Exception as ex:
            fails.append(name)
            print(name, "FAIL", str(ex)[:800])
        finally:
            # Cache lifecycle (round 12): queries cache intra-query
            # diamonds and cannot unpersist before the caller
            # materializes — release between ids so a full-registry
            # gate doesn't accumulate 600+ queries of pinned blocks
            # (the r11 sweep measured 3-6x late-id inflation).
            spark.catalog.clearCache()
    print("DONE fails:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
