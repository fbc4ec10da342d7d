"""Skew/bucketing utilities: result parity and shuffle-topology proofs."""

from __future__ import annotations

from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators.skew import (
    salted_join,
    write_bucketed,
)
from similarity_search_with_hadoop_mapreduce_spark.plans import (
    shuffle_exchange_count,
)


def _skewed(spark):
    # 90% of rows share key "hot"
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)],
        "id long, key string",
    )
    # covers only every other cold key: k10, k30, ... stay unmatched
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i * 20}", float(i)) for i in range(50)],
        "key string, weight double",
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed(spark)
    plain = sorted(
        (r.id, r.key, r.weight)
        for r in big.join(small, "key").select("id", "key", "weight").collect()
    )
    salted = sorted(
        (r.id, r.key, r.weight)
        for r in salted_join(big, small, "key", n_salts=4)
        .select("id", "key", "weight")
        .collect()
    )
    assert plain == salted
    assert len(plain) > 900  # the hot key really dominated


def test_salted_left_join_preserves_unmatched(spark):
    big, small = _skewed(spark)
    missing = big.filter(F.col("key") == "k10")  # k10 not in small
    assert missing.count() == 1
    out = salted_join(big, small, "key", n_salts=4, how="left")
    row = [r for r in out.collect() if r.key == "k10"]
    assert len(row) == 1 and row[0].weight is None


def test_bucketed_join_has_zero_shuffles(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b",
        "o_custkey",
        n_buckets=4,
    )
    write_bucketed(
        customer.select("c_custkey", "c_name"),
        "customer_b",
        "c_custkey",
        n_buckets=4,
    )
    ob = spark.table("orders_b")
    cb = spark.table("customer_b")
    # disable broadcast so the join must pick sort-merge on the bucketed key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ob.join(cb, ob.o_custkey == cb.c_custkey)
        assert shuffle_exchange_count(j) == 0  # bucketing pre-paid the shuffle
        assert j.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
