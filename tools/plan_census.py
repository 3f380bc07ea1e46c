#!/usr/bin/env python
"""Plan-shape census over EVERY registered query id (guide §1/§7.2):
capture .explain("formatted") per id at a given sf_dir and summarize the
physical-plan shape — Exchange count, join strategies, Python-boundary
nodes (BatchEvalPython / ArrowEvalPython / MapInPandas / MapInArrow /
FlatMapGroupsInPandas), window nodes, cartesian products, and whether
parquet scans carry PushedFilters. Planning only — nothing executes
(ids whose BUILD stages fixtures do run that staging once).

Usage: python tools/plan_census.py [sf_dir] [out.json] [--dump DIR]
       --dump also writes each id's full formatted plan to DIR/<id>.txt
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestor_and_features_creator_spark import plans
from data_ingestor_and_features_creator_spark.session import get_spark

_MARKERS = [
    "Exchange", "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct", "BatchEvalPython",
    "ArrowEvalPython", "MapInPandas", "MapInArrow",
    "FlatMapGroupsInPandas", "Window", "Sort", "HashAggregate",
    "SortAggregate", "ObjectHashAggregate",
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(txt: str) -> dict:
    # Count operator headers only (the numbered "(n) Op" list), not
    # mentions inside the details section.
    ops = re.findall(r"^\(\d+\)\s+([A-Za-z]+)", txt, re.M)
    s = {m: 0 for m in _MARKERS}
    for o in ops:
        if o in s:
            s[o] += 1
    s["n_ops"] = len(ops)
    s["scans"] = len(re.findall(r"^\(\d+\)\s+Scan parquet", txt, re.M))
    s["pushed_filters"] = len(
        re.findall(r"PushedFilters: \[[^\]]", txt))
    return {k: v for k, v in s.items() if v}


def main() -> int:
    args = sys.argv[1:]
    dump = None
    if "--dump" in args:
        i = args.index("--dump")
        dump = args[i + 1]
        args = args[:i] + args[i + 2:]
        os.makedirs(dump, exist_ok=True)
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.1"
    out_path = args[1] if len(args) > 1 else "plan_census.json"
    spark = get_spark("plan_census")
    qs = plans.queries()
    census: dict[str, dict] = {}
    fails: dict[str, str] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            txt = plan_text(fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001
            fails[name] = str(ex)[:200]
            print(f"{name}: FAIL", flush=True)
            continue
        census[name] = summarize(txt)
        census[name]["plan_ms"] = round(
            1000 * (time.perf_counter() - t0))
        if dump:
            with open(os.path.join(dump, f"{name}.txt"), "w") as fh:
                fh.write(txt)
        print(f"{name}: {census[name]}", flush=True)
    totals = {
        "n_ids": len(census),
        "row_at_a_time_python": sorted(
            n for n, c in census.items() if c.get("BatchEvalPython")),
        "cartesian": sorted(
            n for n, c in census.items()
            if c.get("CartesianProduct") or c.get("BroadcastNestedLoopJoin")),
        "failures": fails,
    }
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "census": census,
                   "totals": totals}, fh, indent=1)
    print(json.dumps(totals, indent=1))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
