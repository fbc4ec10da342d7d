#!/usr/bin/env python
"""Targeted 10x scale probe for the r13 optimization-round changes (the
13 fixed-point conversions + the count-guarded HEADLINE fixed-point
entries + the session-zone-safe gapfill literals): time each entry at
sf0.1 and at the synthesized ~sf1 dir (scripts/make_scale10x.py) under
the bench session, min-of-3, report the ratio. Fixed cores, 10x rows —
a ~10x ratio is linear; the committed record is
scale_probe_r13_fixedpoint.json.

Usage: python scripts/scale_probe_r13.py [sf1_dir]
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
    # r13 conversions
    "agg_rollup",
    "agg_pivot",
    "join_broadcast_chain",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    # guard-touched HEADLINE entries + the r12 watch item (verdict #3)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
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
        print(json.dumps({name: rec}))
    out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    with open(os.path.join(HERE, "scale_probe_r13_fixedpoint.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
