#!/usr/bin/env python
"""Time EVERY registered query once (warm-ish: one session) at a given
sf_dir and print the slowest ones — the outlier hunt the per-round
bench's 16-query headline set can't see.

Usage: python tools/time_all.py [sf_dir] [top_n] [--no-isolate]

By default each query runs ISOLATED: spark.catalog.clearCache() between
ids. Round-11 finding: without it the sweep accumulates every query's
caches across 600+ ids (queries cache diamond tops and never
unpersist — correct within one query, poisonous across hundreds), and
late ids read 3-6× their isolated cost from storage-memory pressure
(stat_ancova 45.9 s in-sweep vs 1.2 s warm isolated; win_theil_sen
27.7 s vs 2.7 s). --no-isolate restores the legacy shared-session
behavior for comparison against older sweep artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestor_and_features_creator_spark import plans
from data_ingestor_and_features_creator_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    isolate = "--no-isolate" not in args
    args = [a for a in args if a != "--no-isolate"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.1"
    top_n = int(args[-1]) if args and args[-1].isdigit() else 25
    spark = get_spark("time_all")
    qs = plans.queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            failures[name] = str(ex)[:200]
        print(f"{name}: {timings.get(name, 'FAIL')}", flush=True)
        if isolate:
            spark.catalog.clearCache()
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    print(json.dumps({
        "sf_dir": sf_dir,
        "isolated": isolate,
        "total_sec": round(sum(timings.values()), 1),
        "n_queries": len(timings),
        "slowest": dict(ranked[:top_n]),
        "failures": failures,
    }, indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
