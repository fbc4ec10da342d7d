"""r12 optimization-round pins: q18/q3 moved their per-ORDER money sums
from decimal(25,6) BigDecimal accumulators to overflow-checked long
fixed-point (`_fixed_sum`) — bit-identical results required (they share
their oracles, and the group sums are bounded by ORDER size, not corpus
size, so unlike q1 no capacity regime exists at any SF)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.registry import QUERIES
from similarity_search_with_hadoop_mapreduce_spark.registry.base import table
from similarity_search_with_hadoop_mapreduce_spark.registry.relational import (
    _dsum,
)

SF = "/root/testdata/sf0.001"


def _bits(v):
    return struct.pack("<d", v) if isinstance(v, float) else v


def test_q18_fixed_point_matches_decimal_formulation(spark):
    got = {
        r.o_orderkey: [_bits(v) for v in r]
        for r in QUERIES["q18_large_volume_customer"](spark, SF).collect()
    }
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders")
    c = table(spark, SF, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    dec = (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
    )
    want = {r.o_orderkey: [_bits(v) for v in r] for r in dec.collect()}
    assert got == want
    assert len(got) > 0


def test_q3_fixed_point_matches_decimal_formulation(spark):
    got = {
        r.l_orderkey: [_bits(v) for v in r]
        for r in QUERIES["q3_shipping_priority"](spark, SF).collect()
    }
    c = table(spark, SF, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, SF, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, SF, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    dec = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    want = {r.l_orderkey: [_bits(v) for v in r] for r in dec.collect()}
    assert got == want
    assert len(got) > 0
