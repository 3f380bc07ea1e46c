#!/usr/bin/env python
"""Rate-limited MULTI-TRIGGER streaming soak at blow-up scale
(round 6, VERDICT r5 item 7).

The pytest gate (tests/test_streaming.py rate-limited block) proves the
semantics at the suite fixture; this tool replays the SAME code paths
over the 1M-row events blow-up (`testdata_derived/sf1ish`) so the
BASELINE.md row records production-shaped evidence:

1. watermark-drop accounting — 24 time-ordered files, one trigger
   each, ~1% genuinely-late rows injected; asserts the conservation
   law rows_in == rows_out + numRowsDroppedByWatermark and that
   dropped == injected exactly (accounted loss, never silent).
2. stream-stream interval joins (inner + left outer) under
   maxFilesPerTrigger=1 on both sides — state builds/evicts across
   ~17 triggers per side; inner must equal the batch range join.
3. the transformWithState pair (ValueState running max, MapState
   distinct count) at 12 micro-batches — 3x the default commit/restore
   rounds on RocksDB, final snapshot must equal the batch answer.

Usage: python tools/stream_soak.py [sf_dir]
Prints one JSON line per stage plus a total; non-zero exit on any
failed assertion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark.catalog import load_table
from data_ingestor_and_features_creator_spark.session import get_spark
from data_ingestor_and_features_creator_spark.streaming import (runner,
                                                                transforms)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "testdata_derived/sf1ish"
    spark = get_spark("stream_soak")
    ev = load_table(spark, sf_dir, "events")
    n_rows = ev.count()
    report: dict[str, dict] = {}

    # 1. watermark-drop accounting ---------------------------------------
    t0 = time.time()
    rep = runner.run_watermark_drop_accounting(spark, ev, n_files=24)
    out_total = sum(r["cnt"] for r in rep["result"])
    stats = rep["stats"]
    assert stats["n_late"] > 0
    assert out_total + rep["dropped"] == stats["n_rows"], \
        (out_total, rep["dropped"], stats)
    assert rep["dropped"] == stats["n_late"], (rep["dropped"], stats)
    assert rep["n_triggers"] >= stats["n_files"]
    report["watermark_accounting"] = {
        "rows": stats["n_rows"], "late_injected": stats["n_late"],
        "dropped_by_watermark": rep["dropped"],
        "windows_out": len(rep["result"]), "rows_aggregated": out_total,
        "triggers": rep["n_triggers"], "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps({"stage": "watermark_accounting",
                      **report["watermark_accounting"]}), flush=True)

    # 2. stream-stream joins, rate-limited -------------------------------
    t0 = time.time()
    inner = runner.run_stream_stream_rate_limited(spark, ev, n_files=16)
    got = {tuple(r) for r in inner.collect()}
    exp = {tuple(r) for r in
           transforms.stream_stream_purchase_click(ev).collect()}
    assert got == exp, (len(got), len(exp))
    report["stream_stream_inner"] = {
        "pairs": len(got), "wall_sec": round(time.time() - t0, 2)}
    print(json.dumps({"stage": "stream_stream_inner",
                      **report["stream_stream_inner"]}), flush=True)

    t0 = time.time()
    outer = runner.run_stream_stream_rate_limited(spark, ev, n_files=16,
                                                  outer=True)
    s_rows = {tuple(r) for r in outer.collect()}
    b_rows = {tuple(r) for r in
              transforms.stream_stream_purchase_click_outer(ev).collect()}
    s_matched = {r for r in s_rows if r[2] is not None}
    b_matched = {r for r in b_rows if r[2] is not None}
    assert s_matched == b_matched
    assert {r for r in s_rows if r[2] is None} <= \
           {r for r in b_rows if r[2] is None}
    report["stream_stream_left_outer"] = {
        "matched": len(s_matched),
        "null_extended": len(s_rows) - len(s_matched),
        "wall_sec": round(time.time() - t0, 2)}
    print(json.dumps({"stage": "stream_stream_left_outer",
                      **report["stream_stream_left_outer"]}), flush=True)

    # 3. transformWithState pair at 12 micro-batches ---------------------
    from data_ingestor_and_features_creator_spark.pbcompat import (
        ensure_protobuf)
    if ensure_protobuf():
        from pyspark.sql import Window as W
        t0 = time.time()
        out = runner.run_transform_with_state(spark, ev, n_files=12)
        w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
        latest = (out.withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") == 1)
                     .select("user_id", "n_events", "max_value"))
        got = {tuple(r) for r in latest.collect()}
        exp = {tuple(r) for r in
               ev.groupBy("user_id")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.max("value").alias("mx")).collect()}
        assert got == exp
        report["tws_value_state"] = {
            "users": len(got), "micro_batches": 12,
            "wall_sec": round(time.time() - t0, 2)}
        print(json.dumps({"stage": "tws_value_state",
                          **report["tws_value_state"]}), flush=True)

        t0 = time.time()
        out2 = runner.run_tws_distinct_types(spark, ev, n_files=12)
        w2 = W.partitionBy("user_id").orderBy(F.desc("n_types"))
        latest2 = (out2.withColumn("rn", F.row_number().over(w2))
                       .filter(F.col("rn") == 1)
                       .select("user_id", "n_types"))
        got2 = {tuple(r) for r in latest2.collect()}
        exp2 = {tuple(r) for r in
                ev.groupBy("user_id")
                  .agg(F.count_distinct("event_type").alias("n")).collect()}
        assert got2 == exp2
        report["tws_map_state"] = {
            "users": len(got2), "micro_batches": 12,
            "wall_sec": round(time.time() - t0, 2)}
        print(json.dumps({"stage": "tws_map_state",
                          **report["tws_map_state"]}), flush=True)
    else:
        print(json.dumps({"stage": "tws", "skipped":
                          "no usable google.protobuf runtime"}), flush=True)

    print(json.dumps({"stage": "TOTAL", "sf_dir": sf_dir, "rows": n_rows,
                      "stages_green": len(report)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
