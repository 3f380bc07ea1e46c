#!/usr/bin/env python
"""TPC-H power run: execute all 22 sql_tpch_q* queries sequentially at
a given sf_dir (default sf0.1) and print one JSON line with per-query
wall seconds and the total — the classic single-stream metric for the
SQL surface. Results go to a no-op sink (full execution, no driver
materialization cost).

Usage: python tools/tpch_power.py [sf_dir] [n_repeats]
With n_repeats > 1, per-query MINIMUM across repeats is reported
(machine-noise floor, matching BASELINE.md methodology).
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
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.1"
    repeats = int(args[-1]) if args and args[-1].isdigit() else 1
    spark = get_spark("tpch_power")
    qs = plans.queries()
    ids = sorted((n for n in qs if n.startswith("sql_tpch_q")),
                 key=lambda n: int(n.rsplit("q", 1)[1]))
    # One untimed warmup so the first measured query isn't charged the
    # session's codegen/scan cold-start (~5-7 s, observed on q1).
    qs[ids[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for _ in range(repeats):
        for name in ids:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps({
        "metric": "tpch_power_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf_dir": sf_dir,
        "n_queries": len(ids),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
