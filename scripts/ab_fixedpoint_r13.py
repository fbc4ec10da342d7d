#!/usr/bin/env python
"""Interleaved A/B of the r13 fixed-point conversions vs their decimal
predecessors, in ONE bench-session process so ambient host load cancels
(guide §1: compare within the same window).

The decimal predecessor of each converted entry is the ENTRY ITSELF
built with the accumulator helpers monkeypatched back to ``_dsum`` —
registry functions resolve ``_fixed_sum_wide``/``_fixed_sum`` from
module globals at call time, so the patched build is exactly the r12
formulation (same joins, same shapes, BigDecimal buffers), with zero
code duplication. DataFrames capture their plans at build time, so the
patch window only covers plan construction.

Protocol: per entry 1 untimed warm pass per variant, then N rounds of
fixed,decimal alternating, noop sink, min + median + median task-compute
reported. ``--check`` additionally asserts sorted-rows equality between
the variants (belt on top of the shared DuckDB oracle).

Usage: python scripts/ab_fixedpoint_r13.py [entry ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))

ENTRIES = [
    "q9_product_type_profit",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q14_promo_revenue",
    "q11_important_stock",
    "q22_global_sales_opportunity",
    "join_broadcast_chain",
    "agg_rollup",
    "agg_pivot",
]


def _build_variants(spark, names):
    import similarity_search_with_hadoop_mapreduce_spark.registry.relational as R
    import similarity_search_with_hadoop_mapreduce_spark.registry.tpch_partsupp as TP
    from similarity_search_with_hadoop_mapreduce_spark.registry import QUERIES

    pairs = []
    for name in names:
        pairs.append((f"{name}::fixed", QUERIES[name](spark, SF_DIR)))
    # decimal predecessors: swap the accumulators for _dsum during build
    saved = (R._fixed_sum_wide, R._fixed_sum, TP._fixed_sum_wide)

    def dsum_like(expr, scale, what="", signed=False):
        return R._dsum(expr)

    R._fixed_sum_wide = dsum_like
    R._fixed_sum = dsum_like
    TP._fixed_sum_wide = dsum_like
    try:
        for name in names:
            pairs.append((f"{name}::decimal", QUERIES[name](spark, SF_DIR)))
    finally:
        R._fixed_sum_wide, R._fixed_sum, TP._fixed_sum_wide = saved
    return pairs


def main() -> None:
    import bench

    names = [a for a in sys.argv[1:] if not a.startswith("-")] or ENTRIES
    check = "--check" in sys.argv
    spark = bench._bench_session()
    sc = spark.sparkContext

    def total_task_ms() -> int:
        store = sc._jsc.sc().statusStore()
        seq = store.stageList(
            sc._jvm.java.util.ArrayList(), False, False,
            sc._gateway.new_array(sc._jvm.double, 0),
            sc._jvm.java.util.ArrayList(),
        )
        it = seq.iterator()
        total = 0
        while it.hasNext():
            total += it.next().executorRunTime()
        return total

    built = dict(_build_variants(spark, names))
    if check:
        for name in names:
            a = sorted(map(str, built[f"{name}::fixed"].collect()))
            b = sorted(map(str, built[f"{name}::decimal"].collect()))
            assert a == b, f"{name}: variant results differ"
        print(json.dumps({"check": "sorted-rows equal", "entries": names}))
    for df in built.values():
        df.write.format("noop").mode("overwrite").save()  # warm
    walls: dict[str, list[float]] = {k: [] for k in built}
    compute: dict[str, list[float]] = {k: [] for k in built}
    order = ("decimal", "fixed") if os.environ.get("AB_ORDER") == "swap" else (
        "fixed", "decimal"
    )
    for _ in range(ROUNDS):
        for name in names:
            for variant in order:
                key = f"{name}::{variant}"
                c0 = total_task_ms()
                t0 = time.perf_counter()
                built[key].write.format("noop").mode("overwrite").save()
                walls[key].append(time.perf_counter() - t0)
                compute[key].append(max(0, total_task_ms() - c0) / 1000.0)
    out = {
        key: {
            "min": round(min(w), 3),
            "median": round(statistics.median(w), 3),
            "task_compute_med": round(statistics.median(compute[key]), 3),
        }
        for key, w in walls.items()
    }
    out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
