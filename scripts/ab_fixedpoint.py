#!/usr/bin/env python
"""Interleaved A/B of the r12 fixed-point accumulator changes vs their
decimal predecessors, in ONE bench-session process so ambient host load
cancels (guide §1: always compare within the same window).

Pairs:
  q1  : q1_pricing_summary (r12 wide fixed-point) vs q1_pricing_summary_decimal (r1-r11 plan)
  q18 : q18_large_volume_customer (r12) vs inline decimal predecessor
  q3  : q3_shipping_priority (r12) vs inline decimal predecessor

Protocol: 1 untimed warm pass per variant, then N rounds of
A,B (alternating), noop sink, min + median reported, with per-query
task-compute from the status store.
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


def _variants(spark):
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.registry import QUERIES
    from similarity_search_with_hadoop_mapreduce_spark.registry.base import table
    from similarity_search_with_hadoop_mapreduce_spark.registry.relational import (
        _dsum,
    )

    def q18_decimal(spark, sf_dir):
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders")
        c = table(spark, sf_dir, "customer")
        big = (
            li.groupBy("l_orderkey")
            .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
            .filter(F.col("total_qty") > 300)
        )
        return (
            o.join(big, o.o_orderkey == big.l_orderkey)
            .join(c, c.c_custkey == o.o_custkey)
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice", "total_qty")
        )

    def q3_decimal(spark, sf_dir):
        c = table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        li = table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        return (
            c.join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                       ).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10)
        )

    return [
        ("q1_wide", QUERIES["q1_pricing_summary"]),
        ("q1_decimal", QUERIES["q1_pricing_summary_decimal"]),
        ("q18_fixed", QUERIES["q18_large_volume_customer"]),
        ("q18_decimal", q18_decimal),
        ("q3_fixed", QUERIES["q3_shipping_priority"]),
        ("q3_decimal", q3_decimal),
    ]


def main() -> None:
    import bench

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

    pairs = _variants(spark)
    dfs = {}
    for name, fn in pairs:
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm
        dfs[name] = df
    walls: dict[str, list[float]] = {n: [] for n, _ in pairs}
    compute: dict[str, list[float]] = {n: [] for n, _ in pairs}
    for _ in range(ROUNDS):
        for name, _fn in pairs:
            c0 = total_task_ms()
            t0 = time.perf_counter()
            dfs[name].write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
            compute[name].append(max(0, total_task_ms() - c0) / 1000.0)
    out = {
        name: {
            "min": round(min(w), 3),
            "median": round(statistics.median(w), 3),
            "task_compute_med": round(statistics.median(compute[name]), 3),
        }
        for name, w in walls.items()
    }
    out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
