#!/usr/bin/env python
"""Targeted 10x scale probe for the r12 optimization-round plan changes
(q1 wide fixed-point, q18/q3 bounded fixed-point, q5 fact-streamed
spine, q6 wide, gapfill literal bounds): time each changed entry at
sf0.1 and at the synthesized ~sf1 dir (scripts/make_scale10x.py) under
the bench session, min-of-3, and report the ratio — the full-registry
sweep (scale_sweep.json) predates these plans, so this records that the
NEW plans still scale ~linearly on fixed cores.

Usage: python scripts/scale_probe_r12_fixedpoint.py [sf1_dir]
Writes scale_probe_r12_fixedpoint.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sparkgraft-sf1.0"

ENTRIES = [
    "q1_pricing_summary",
    "q1_pricing_summary_decimal",
    "q1_pricing_summary_production",
    "q18_large_volume_customer",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "events_gapfill_locf",
]


def main() -> None:
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run scripts/make_scale10x.py first")
    import bench

    from similarity_search_with_hadoop_mapreduce_spark.registry import QUERIES

    spark = bench._bench_session()
    out: dict = {}
    for name in ENTRIES:
        rec = {}
        for label, sf_dir in (("sf01", SF01), ("sf1", SF1)):
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            rec[label] = round(best, 3)
        rec["ratio"] = round(rec["sf1"] / rec["sf01"], 1) if rec["sf01"] else None
        out[name] = rec
        print(name, rec, flush=True)
    out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    with open(os.path.join(HERE, "scale_probe_r12_fixedpoint.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
