"""Approximate aggregates: sketch outputs are engine-specific (HLL++ here,
different sketches in DuckDB) so they can't be value-oracled — instead pin
the error bound against the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).collect()[0].n
    approx = (
        o.select(F.approx_count_distinct("o_custkey", rsd=0.02).alias("n"))
        .collect()[0]
        .n
    )
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_brackets_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    approx = li.select(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias(
            "p"
        )
    ).collect()[0].p
    exact = li.approxQuantile("l_extendedprice", [0.25, 0.5, 0.75], 0.0)
    for a, e in zip(approx, exact):
        assert abs(a - e) / e < 0.02
