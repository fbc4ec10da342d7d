#!/usr/bin/env python
"""Interleaved A/B of the r13 dim-composite join spines (q7/q8/q9 —
r12 verdict #8) vs their committed predecessors, in ONE bench-session
process so ambient host load cancels (guide §1).

The OLD variants are the pre-spine formulations copied verbatim from
the r13 _dsum-conversion commit (1a50202) — same accumulators, same
filters, only the join spine differs — so the A/B isolates exactly the
spine change. ``--check`` asserts sorted-rows equality between the
variants on top of the shared DuckDB oracle.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_spine_r13.py [--check]
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


def _old_variants(spark):
    """The committed pre-spine q7/q8/q9 (verbatim from 1a50202, minus
    the register decorators)."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.registry.relational import (
        _fixed_sum_wide,
    )
    from similarity_search_with_hadoop_mapreduce_spark.registry.tpch_partsupp import (
        partsupp,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table as table,
    )

    def old_q7(spark, sf_dir):
        s = table(spark, sf_dir, "supplier")
        li = table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        o = table(spark, sf_dir, "orders")
        c = table(spark, sf_dir, "customer")
        n1 = F.broadcast(
            table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("n1_key"),
                F.col("n_name").alias("supp_nation"),
            )
        )
        n2 = F.broadcast(
            table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("n2_key"),
                F.col("n_name").alias("cust_nation"),
            )
        )
        pair = (
            (F.col("supp_nation") == "NATION_1")
            & (F.col("cust_nation") == "NATION_2")
        ) | (
            (F.col("supp_nation") == "NATION_2")
            & (F.col("cust_nation") == "NATION_1")
        )
        return (
            s.join(li, s.s_suppkey == li.l_suppkey)
            .join(o, o.o_orderkey == li.l_orderkey)
            .join(c, c.c_custkey == o.o_custkey)
            .join(n1, s.s_nationkey == F.col("n1_key"))
            .join(n2, c.c_nationkey == F.col("n2_key"))
            .filter(pair)
            .groupBy(
                "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
            )
            .agg(
                _fixed_sum_wide(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "q7"
                ).alias("revenue")
            )
        )

    def old_q8(spark, sf_dir):
        p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
        li = table(spark, sf_dir, "lineitem")
        s = table(spark, sf_dir, "supplier")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        c = table(spark, sf_dir, "customer")
        n1 = F.broadcast(
            table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("n1_key"),
                F.col("n_regionkey").alias("n1_reg"),
            )
        )
        r = F.broadcast(
            table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        )
        n2 = F.broadcast(
            table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("n2_key"),
                F.col("n_name").alias("supp_nation"),
            )
        )
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        nat = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
        return (
            p.join(li, p.p_partkey == li.l_partkey)
            .join(s, s.s_suppkey == li.l_suppkey)
            .join(o, o.o_orderkey == li.l_orderkey)
            .join(c, c.c_custkey == o.o_custkey)
            .join(n1, c.c_nationkey == F.col("n1_key"))
            .join(r, F.col("n1_reg") == r.r_regionkey)
            .join(n2, s.s_nationkey == F.col("n2_key"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(
                (
                    _fixed_sum_wide(nat, 4, "q8") / _fixed_sum_wide(rev, 4, "q8")
                ).alias("mkt_share")
            )
        )

    def old_q9(spark, sf_dir):
        ps = partsupp(spark, sf_dir)
        l = table(spark, sf_dir, "lineitem")
        p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
        s = table(spark, sf_dir, "supplier")
        o = table(spark, sf_dir, "orders")
        n = table(spark, sf_dir, "nation")
        amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
            "ps_supplycost"
        ) * F.col("l_quantity")
        return (
            l.join(p, l.l_partkey == p.p_partkey)
            .join(
                ps,
                (l.l_suppkey == ps.ps_suppkey) & (l.l_partkey == ps.ps_partkey),
            )
            .join(s, l.l_suppkey == s.s_suppkey)
            .join(o, l.l_orderkey == o.o_orderkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .groupBy(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").alias("o_year"),
            )
            .agg(
                _fixed_sum_wide(amount, 4, "q9", signed=True).alias("sum_profit")
            )
        )

    return {
        "q7_volume_shipping": old_q7,
        "q8_market_share": old_q8,
        "q9_product_type_profit": old_q9,
    }


def main() -> None:
    import bench

    from similarity_search_with_hadoop_mapreduce_spark.registry import QUERIES

    check = "--check" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_type_profit",
    ]
    spark = bench._bench_session()
    old = _old_variants(spark)
    pairs = []
    for name in names:
        pairs.append((f"{name}::spine", QUERIES[name](spark, SF_DIR)))
        pairs.append((f"{name}::old", old[name](spark, SF_DIR)))

    if check:
        for name in names:
            a = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
            b = sorted(map(tuple, old[name](spark, SF_DIR).collect()))
            assert a == b, f"{name}: spine and old variants disagree"
            print(f"{name}: sorted-rows equal ({len(a)} rows)", flush=True)

    for _, df in pairs:  # untimed warm pass: JIT + codegen + footers
        df.write.format("noop").mode("overwrite").save()
    walls: dict[str, list[float]] = {k: [] for k, _ in pairs}
    for _ in range(ROUNDS):
        for key, df in pairs:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls[key].append(time.perf_counter() - t0)
    out = {
        key: {
            "min": round(min(w), 3),
            "med": round(statistics.median(w), 3),
        }
        for key, w in walls.items()
    }
    print(json.dumps({"sf_dir": SF_DIR, "rounds": ROUNDS, "walls": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
