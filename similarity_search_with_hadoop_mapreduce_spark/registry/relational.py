"""Relational surface: the SURVEY.md §2.4 category checklist demonstrated on
the TPC-H-ish fixtures, every entry oracle-checked against DuckDB.

The reference exposes only a degenerate slice of this surface (one
broadcast left-semi join in disguise at ``BookQuery.java:77``, two
count-style aggregations, one HAVING-like group filter) — everything else
here is the engine surface a user of a general analytics system needs, all
native Catalyst-planned DataFrame/SQL with zero Python UDFs.

Cross-engine determinism notes:

- Double sums are order-dependent (Spark combines per-partition partials;
  DuckDB sums sequentially), so every SUM over doubles goes through an
  exact DECIMAL(25,6) cast and back to double — bit-identical in any
  execution order. Per-row double arithmetic (IEEE) is identical engine to
  engine and needs no such care.
- DuckDB ``year()``/``count()`` return BIGINT/HUGEINT where Spark returns
  int/bigint; oracle SQL casts to Spark's types.
- Every ORDER BY ... LIMIT carries a unique tie-break column so both
  engines pick the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table


def _dsum(expr: Column) -> Column:
    """Order-independent exact sum of a double expression (see module doc)."""
    return F.sum(expr.cast("decimal(25,6)")).cast("double")


def _osum(expr: str) -> str:
    """Oracle-side twin of :func:`_dsum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_osum('l_quantity')} AS sum_qty,
       {_osum('l_extendedprice')} AS sum_base_price,
       {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_osum('l_quantity')} / count(*) AS avg_qty,
       {_osum('l_extendedprice')} / count(*) AS avg_price,
       {_osum('l_discount')} / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with partial (map-side)
    aggregation; the filter and 7-column projection push into the parquet
    scan. Reference analog: U4's count agg (BookQuery.java:154-158).

    r12 (optimization round, guide §1.2 "per-task work"): the
    ``decimal(25,6)`` accumulators are replaced by
    :func:`_fixed_sum_wide` chunked long accumulators — bit-identical
    on these money columns (shared oracle + property test + 3-SF
    certification), exact under ANY grouping up to ~8.8e12 rows per
    group (≈1 EB per group; two orders of magnitude past the 100 TB
    target), loud ``try_sum`` overflow guards beyond. This retires the
    "decimal is the only accumulator safe at scale" premise the entry
    carried since r1: the wide accumulator has no overflow regime below
    absurd group sizes AND codegens. The historical decimal plan stays
    registered as :func:`q1_pricing_summary_decimal` (the BigDecimal
    reference implementation, still certified, still the cross-check).

    fan_out dropped with the BigDecimal cost (same reasoning measured
    for the r11 production twin): the aggregation is scan-bound again,
    partial aggregation stays inside the scan task, and the round-robin
    exchange that paid for itself by spreading decimal CPU (~1.7x
    there) would now cost more than the whole aggregation."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    w = _fixed_sum_wide
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            w(F.col("l_quantity"), 0, "q1").alias("sum_qty"),
            w(F.col("l_extendedprice"), 2, "q1").alias("sum_base_price"),
            w(disc_price, 4, "q1").alias("sum_disc_price"),
            w(charge, 6, "q1").alias("sum_charge"),
            (w(F.col("l_quantity"), 0, "q1") / cnt).alias("avg_qty"),
            (w(F.col("l_extendedprice"), 2, "q1") / cnt).alias("avg_price"),
            (w(F.col("l_discount"), 2, "q1") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q1_pricing_summary_decimal",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_osum('l_quantity')} AS sum_qty,
       {_osum('l_extendedprice')} AS sum_base_price,
       {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_osum('l_quantity')} / count(*) AS avg_qty,
       {_osum('l_extendedprice')} / count(*) AS avg_price,
       {_osum('l_discount')} / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r1-r11 plan of :func:`q1_pricing_summary`, preserved verbatim
    when the main entry moved to :func:`_fixed_sum_wide` accumulators
    (r12): ``decimal(25,6)`` BigDecimal sums + ``fan_out`` to spread
    their per-row CPU across an under-split scan. Kept registered (same
    oracle, bit-identical results) as the reference implementation the
    fixed-point plans are certified against, and as the measured
    BigDecimal cost baseline (OPTIMIZATION_r12.md)."""
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import fan_out

    li = fan_out(table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (_dsum(F.col("l_discount")) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


def _scaled_long(
    expr: Column, scale: int, what: str, signed: bool = False
) -> Column:
    """Per-row fixed-point scaling shared by :func:`_fixed_sum` and
    :func:`_fixed_sum_wide`: round ``expr`` at ``scale`` decimals
    (``+0.5 → try_cast(long)`` — HALF_UP for the all-positive money
    columns these sums run over; NULL input stays NULL; an
    unrepresentable row RAISES regardless of ``spark.sql.ansi.enabled``
    — ADVICE r11). Bit-equality with the ``decimal(25,6)`` cast is
    property-tested for 2-decimal money values and their discount/tax
    products (tests/test_plans.py); arbitrary-precision doubles (e.g.
    sensor values) are NOT eligible — double×10^scale+0.5 truncation
    can round a 1-ulp-under value differently than the decimal cast's
    shortest-representation HALF_UP.

    ``signed`` (r13): the default ``+0.5 → truncate-toward-zero``
    rounding is HALF_UP only for non-negative values; for a negative
    money value the double→long cast truncates TOWARD zero where
    BigDecimal HALF_UP rounds AWAY (``trunc(-123.45·100 + 0.5) =
    -12344`` but ``cast(-123.45 as decimal(25,6)) = -123.450000``).
    Columns that can go negative (acctbal balances, q9's
    revenue-minus-cost profit) pass ``signed=True``: the MAGNITUDE is
    rounded HALF_UP and the sign reapplied afterwards — exactly
    BigDecimal's ROUND_HALF_UP (away from zero on ties), one extra
    codegen'd comparison+negate per row. Property-tested against the
    decimal cast on signed money shapes (tests/test_plans.py). The
    all-positive entries keep the branch-free default so their r12
    certified plans stay byte-identical."""
    if signed:
        mag = F.abs(expr) * F.lit(float(10**scale)) + F.lit(0.5)
        checked = F.coalesce(
            mag.try_cast("long"),
            F.raise_error(
                F.lit(
                    f"{what} per-row value unrepresentable at scale "
                    f"{scale} — use the decimal entry"
                )
            ).cast("long"),
        )
        return F.when(
            expr.isNotNull(),
            F.when(expr < F.lit(0.0), -checked).otherwise(checked),
        )
    scaled_d = expr * F.lit(float(10**scale)) + F.lit(0.5)
    return F.when(
        scaled_d.isNotNull(),
        F.coalesce(
            scaled_d.try_cast("long"),
            F.raise_error(
                F.lit(
                    f"{what} per-row value unrepresentable at scale "
                    f"{scale} — use the decimal entry"
                )
            ).cast("long"),
        ),
    )


def _fixed_sum(
    expr: Column, scale: int, what: str = "q1", signed: bool = False
) -> Column:
    """Exact money sum on overflow-checked LONG accumulators: round the
    expression at ``scale`` decimals (``+0.5 → cast(long)`` — HALF_UP for
    the all-positive money columns, no per-row BigDecimal), accumulate
    with ``try_sum`` (NULL on long overflow), raise loudly instead of
    wrapping, then rescale through decimal so the final double is
    correctly rounded at any magnitude (a direct long→double cast loses
    exactness past 2^53).

    vs :func:`_dsum`: bit-identical results wherever the scaled sum fits
    a long (pinned in tests/test_relational_extra.py and by sharing q1's
    decimal oracle), ~6x cheaper per row (codegen'd multiply+add vs
    BigDecimal), but capacity-bounded: a group's sum must stay under
    2^63/10^scale (9.2e12 at scale 6). TPC-H Q1 at ~sf30k crosses that
    for sum_charge — at the 100 TB target, either shard the window
    (per-epoch partials, then one exact decimal merge of O(groups) rows)
    or fall back to the decimal entry; the overflow check makes the
    wrong choice loud, never silent.

    "Never silent" covers BOTH overflow sites (ADVICE r11): the
    accumulator (``try_sum`` → NULL → ``raise_error``) and the per-row
    scaled value, which uses ``try_cast`` — ANSI cast semantics
    regardless of ``spark.sql.ansi.enabled``, NULL on overflow/NaN —
    gated behind an ``isNotNull`` check so a NULL input row stays a
    NULL (sum ignores it) while an unrepresentable one raises. A plain
    ``cast('long')`` relied on the session being ANSI; non-ANSI it
    clamps to Long.MaxValue silently.

    ``what`` labels the raise messages with the calling query (r12: the
    accumulator is no longer q1-only).

    r13 (ADVICE r12): ``try_sum`` also returns NULL for an EMPTY or
    all-NULL group, which the overflow ``coalesce`` could not tell from
    a wrap — such a group used to raise spuriously. A ``count(expr)``
    gate (one extra codegen'd long accumulator) returns NULL for those
    groups instead, exactly what the decimal ``sum`` returns; the
    ``CaseWhen`` evaluates lazily, so the raise branch is never touched
    when the count is zero."""
    scaled = _scaled_long(expr, scale, what, signed)
    checked = F.coalesce(
        F.try_sum(scaled),
        F.raise_error(
            F.lit(f"{what} long accumulator overflow at scale {scale} — "
                  "use the decimal entry or shard the window")
        ).cast("long"),
    )
    total = (
        checked.cast("decimal(25,0)") / F.lit(10**scale).cast("decimal(12,0)")
    ).cast("double")
    return F.when(
        F.count(expr) == F.lit(0), F.lit(None).cast("double")
    ).otherwise(total)


def _fixed_sum_wide(
    expr: Column, scale: int, what: str = "sum", signed: bool = False
) -> Column:
    """Exact fixed-point sum with NO practical group-size bound — the
    r12 replacement for ``decimal(25,6)`` accumulators on money-shaped
    columns (guide §2.3 "narrower types" + §1.2 "per-task work").

    :func:`_fixed_sum` is capacity-bounded: one long accumulator
    overflows when a group's scaled sum passes 2^63 (~sf30k for q1's
    sum_charge). This variant decomposes each scaled row into three
    base-2^20 digits — exact long bit-ops, no division anywhere::

        v       = (v>>40)·2^40 + ((v>>20)&m)·2^20 + (v&m),  m = 2^20-1
        sum(v)  = Σhi·2^40    + Σmid·2^20          + Σlo    (any grouping)

    (the two's-complement identity ``x = (x>>k)·2^k + (x & (2^k-1))``
    holds for every long — digits lo/mid land in ``[0, 2^20)``, the
    sign rides ``hi`` — though eligibility is the same all-positive
    money-column contract as :func:`_fixed_sum`, because the PER-ROW
    ``+0.5`` rounding in :func:`_scaled_long` is HALF_UP only for
    positives), recombined in wide DECIMAL and rescaled. Exactness does not depend on grouping or
    partial-aggregation order (each digit sum is an exact integer sum),
    so the result is bit-identical to the decimal accumulator wherever
    per-row rounding matches (same money-value condition as
    :func:`_fixed_sum`, see :func:`_scaled_long`; property-tested in
    tests/test_plans.py).

    Capacity: ``lo, mid < 2^20`` ⇒ their long sums overflow only past
    ~8.8e12 rows **per group** (≈1 EB of lineitem in one group — two
    orders of magnitude past the 100 TB target); ``Σhi`` overflows only
    when the true sum would overflow decimal(25,6) itself. All three
    accumulators are ``try_sum`` + ``raise_error``, so even that absurd
    regime fails LOUD, never silent — the documented escape (shard the
    window, merge exact per-shard partials) is unchanged.

    Cost model: 3 codegen'd long sums + 2 shifts + 2 masks per row, vs
    one BigDecimal add per row for decimal(25,6) — see
    OPTIMIZATION_r12.md for the q1 before/after. Plan shape is
    IDENTICAL to the decimal plan (same partial/final hash aggregate,
    same single exchange); only the aggregate buffer narrows from
    BigDecimal to 3 longs."""
    if not 0 <= scale <= 6:
        # the final decimal division is guaranteed exact only down to
        # 6 fractional digits (Spark's minimum division result scale
        # under precision loss)
        raise ValueError(f"_fixed_sum_wide scale must be in [0, 6], got {scale}")
    scaled = _scaled_long(expr, scale, what, signed)
    mask = F.lit((1 << 20) - 1).cast("long")
    digits = {
        "lo": scaled.bitwiseAND(mask),
        "mid": F.shiftright(scaled, 20).bitwiseAND(mask),
        "hi": F.shiftright(scaled, 40),
    }
    sums = {
        name: F.coalesce(
            F.try_sum(d),
            F.raise_error(
                F.lit(
                    f"{what} wide accumulator ({name}) overflow at scale "
                    f"{scale} — shard the window and merge exact partials"
                )
            ).cast("long"),
        )
        for name, d in digits.items()
    }
    total = (
        sums["hi"].cast("decimal(38,0)") * F.lit(1 << 40).cast("decimal(13,0)")
        + sums["mid"].cast("decimal(38,0)") * F.lit(1 << 20).cast("decimal(7,0)")
        + sums["lo"].cast("decimal(38,0)")
    )
    result = (
        total.cast("decimal(38,0)") / F.lit(10**scale).cast("decimal(12,0)")
    ).cast("double")
    # r13 (ADVICE r12): an empty/all-NULL group must return NULL like
    # the decimal sum, not trip the overflow raise — one count(expr)
    # gate covers all three digit sums (they are NULL together). The
    # CaseWhen is lazy, so the raise branch is untouched at count 0.
    # This also makes the accumulator safe under pivot, whose rewrite
    # feeds every non-matching row as NULL (an empty cell used to
    # raise).
    return F.when(
        F.count(expr) == F.lit(0), F.lit(None).cast("double")
    ).otherwise(result)


@register(
    "q1_pricing_summary_production",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_osum('l_quantity')} AS sum_qty,
       {_osum('l_extendedprice')} AS sum_base_price,
       {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_osum('l_quantity')} / count(*) AS avg_qty,
       {_osum('l_extendedprice')} / count(*) AS avg_price,
       {_osum('l_discount')} / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of :func:`q1_pricing_summary` (r11, retiring the
    standing decimal perf-weak): same oracle, same results bit-for-bit —
    the only changes are physical. (1) :func:`_fixed_sum` long
    accumulators replace ``decimal(25,6)`` sums: each money column has a
    fixed decimal scale (qty integer, price 2, disc_price 4, charge 6),
    so the sum is exact fixed-point arithmetic, order-independent like
    decimal but codegen'd. (2) NO ``fan_out``: with the BigDecimal
    per-row cost gone, q1 is scan-bound, and the round-robin exchange
    that paid for itself by spreading decimal CPU (~1.7x there) now
    costs more than the whole aggregation — partial aggregation stays
    inside the scan task and the exchange moves ≤ a few rows per group.
    Measured at sf0.1: 0.88 s (decimal, no fan_out) / 0.65 s (decimal +
    fan_out, the gated entry) / 0.24 s (this plan) vs DuckDB 0.10 s.
    The same accumulator-cost-decides-the-plan rule holds on a cluster:
    cheap accumulators keep q1 a map-side-combined scan at any SF."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _fixed_sum(F.col("l_quantity"), 0).alias("sum_qty"),
            _fixed_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _fixed_sum(disc_price, 4).alias("sum_disc_price"),
            _fixed_sum(charge, 6).alias("sum_charge"),
            (_fixed_sum(F.col("l_quantity"), 0) / cnt).alias("avg_qty"),
            (_fixed_sum(F.col("l_extendedprice"), 2) / cnt).alias("avg_price"),
            (_fixed_sum(F.col("l_discount"), 2) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {_osum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.09
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: multi-predicate scan + global agg; all four
    predicates reach the parquet reader as PushedFilters."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.09))
            & (F.col("l_quantity") < 24)
        )
        # r12: wide fixed-point (global group grows with the corpus →
        # the unbounded-capacity accumulator; extprice 2dp × discount
        # 2dp = exact 4dp, the property-tested money shape)
        .agg(
            _fixed_sum_wide(
                F.col("l_extendedprice") * F.col("l_discount"), 4, "q6"
            ).alias("revenue")
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent from the reference, §2.4): Spark plans
    a two-phase expand + partial agg."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (category absent from reference, §2.4).

    r13 (guide §1.2): quantity sum on :func:`_fixed_sum_wide` chunked
    long accumulators instead of ``decimal(25,6)`` BigDecimal — the
    rollup's grand-total group grows with the corpus, so the unbounded-
    capacity wide form (not the bounded single long). Bit-identical via
    the unchanged oracle (3-SF re-proof, r13)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _fixed_sum_wide(F.col("l_quantity"), 0, "rollup").alias("qty"),
        )
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_having",
    oracle="""
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_custkey HAVING count(*) >= 3
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group filter on aggregate — the Spark form of the reference's
    Reducer1 posting-list prune (T10, BookQuery.java:102-105)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (l_linestatus = 'O') AS DOUBLE) AS "O",
       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (l_linestatus = 'F') AS DOUBLE) AS "F"
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation); DuckDB oracle uses FILTER clauses so the
    output column names match Spark's pivot values exactly.

    r13 (guide §1.2): per-cell quantity sums on the wide fixed-point
    accumulator (cells grow with the corpus). The pivot rewrite feeds
    non-matching rows as NULLs into each cell's aggregate; the
    accumulator's count gate returns NULL for an empty cell exactly
    like the decimal sum did (pinned in tests/test_fixedpoint_r13.py).
    Bit-identical via the unchanged FILTER-clause oracle (3-SF
    re-proof, r13)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_fixed_sum_wide(F.col("l_quantity"), 0, "pivot"))
    )


# ---------------------------------------------------------------------------
# Joins — full surface (reference has only the disguised broadcast semi-join)
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'O'
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; customer is broadcast under the 64 MB threshold so
    no shuffle of the big side."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON clause —
    semantics differ from a WHERE, which both engines must agree on)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "P"), "left"
    ).select("c_custkey", "c_name", "o_orderkey")


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — the reference's T5 `retainAll` is exactly
    this, on shingle sets (BookQuery.java:77)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — absent from the reference (§2.4)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast_chain",
    oracle="""
SELECT r.r_name, n.n_name, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema chain: two explicit broadcast hints — the dims ship to
    every executor; the fact table never shuffles before the aggregate.
    Spark-native form of the reference's Configuration-shipped side data
    (T1/O3, BookQuery.java:205,214).

    r13 (guide §1.2): acctbal sum on the wide fixed-point accumulator,
    ``signed=True`` — balances go NEGATIVE (fixture min ≈ -999.85), so
    the sign-aware HALF_UP rounding is required for bit-equality with
    the decimal cast (see :func:`_scaled_long`). Nation groups grow
    with the corpus → wide form. 3-SF re-proof r13."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _fixed_sum_wide(
                F.col("c_acctbal"), 2, "bchain", signed=True
            ).alias("total_acctbal"),
        )
    )


@register(
    "join_theta_range",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
FROM lineitem l JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join + range (theta) residual: ships >90 days after order.
    The equi key still drives the exchange; the range predicate is a
    post-join filter — no nested-loop blowup."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .select("l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    Catalyst reorders so the filtered customer side broadcasts.

    r12: revenue via :func:`_fixed_sum` (scale 4 — extprice 2dp ×
    discount 2dp, the property-tested disc_price shape) instead of
    ``decimal(25,6)``. Like q18, the group is one ORDER, so the scaled
    sum is bounded by lines-per-order × max line revenue (~7 × 1.05e5
    → ~7e9 scaled) at ANY corpus scale — no capacity boundary exists;
    the ``try_sum`` raise guard stays as the loud backstop.
    Bit-identical via the shared oracle (3-SF certification)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _fixed_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "q3"
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name, {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a compound join condition
    (supplier and customer in the same nation).

    r12 (guide §3.1 build side / §3.2 pre-filter the big side): the
    join spine is now LINEITEM — the fact table streams and only
    dimensions build. The r1-r11 customer-first formulation made
    Catalyst stream ORDERS and *broadcast lineitem* (the largest
    relation: a 600k-row hash-relation build, ~0.5 s serial, the
    single biggest slice of the query's wall — stage profile in
    OPTIMIZATION_r12.md). Joining the region-filtered
    supplier⋈nation⋈region dim FIRST also drops ~4/5 of lineitem
    before the orders/customer joins (ASIA suppliers only), which at
    100 TB is exactly the §3.2 shuffle-bytes win: the orderkey
    join/exchange sees 1/5 of lineitem instead of all of it, at any
    scale. Results proven identical (same oracle, 3-SF value-hash;
    in-session sorted-rows equality in the A/B). Revenue sums use
    :func:`_fixed_sum_wide` (nation-level groups grow with the corpus,
    so the bounded single-long accumulator would not do — the wide one
    is exact to ~8.8e12 rows/group with loud guards)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    # Catalyst's stat-less size estimate for this composite of tiny
    # tables multiplies input sizes and comes out LARGER than lineitem,
    # flipping the build side onto the 600k-row fact table (measured:
    # the bc(lineitem) build was the biggest slice of q5's wall). Hint
    # the dim broadcast only when the supplier base table is PROVABLY
    # small (parquet-footer row count, driver-side, no job): ≤2M
    # suppliers ≈ ≤50 MB hash relation. At real scale the probe reports
    # a large count, no hint is emitted, and the planner's own SMJ/SHJ
    # choice stands.
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        table_rows,
    )

    if table_rows(sf_dir, "supplier") <= 2_000_000:
        sn = F.broadcast(sn)
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == sn.s_nationkey))
        .groupBy("n_name")
        .agg(
            _fixed_sum_wide(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "q5"
            ).alias("revenue")
        )
    )


@register(
    "scalar_subquery",
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
""",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery via the SQL surface."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


# ---------------------------------------------------------------------------
# Window functions (absent from the reference, §2.4)
# ---------------------------------------------------------------------------


@register(
    "window_row_number_topn",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
  FROM orders
) WHERE rn <= 2
""",
)
def window_row_number_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via row_number — the standard distributed top-k
    per key pattern (one shuffle on the partition key)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
    )


@register(
    "window_rank_dense",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
FROM orders
""",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative ROWS frame; decimal accumulator for cross-engine
    bit-identical totals."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w).cast("double").alias("running_total"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                           RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT)
         AS n_similar_priced
FROM orders
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (±1000 around each order's price)."""
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 1000)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_priced"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cum_dist,
       first_value(o_totalprice) OVER w AS cheapest,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS priciest
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: ntile / percent_rank / cume_dist plus
    first_value/last_value. The ORDER BY includes the unique o_orderkey
    because ntile buckets by row position — without a total order, tied
    prices would land in engine-dependent buckets. last_value gets an
    explicit unbounded ROWS frame (the default frame stops at CURRENT
    ROW, which would make it the row's own value in both engines)."""
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.first("o_totalprice").over(w).alias("cheapest"),
        F.last("o_totalprice").over(w_full).alias("priciest"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops
# ---------------------------------------------------------------------------


@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps, no full sort. The reference never ranks (quirk Q7)."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level set ops — the reference has them only on shingle sets
    (array_intersect etc., BookQuery.java:77)."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.subtract(b)  # set-semantics EXCEPT (deduplicates)


# ---------------------------------------------------------------------------
# Scalar function surface: string / date / math / array / json / conditional
# ---------------------------------------------------------------------------


@register(
    "string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up,
       lower(p_brand) AS lo,
       CAST(length(p_name) AS INTEGER) AS name_len,
       substring(p_name, 1, 4) AS prefix,
       replace(p_name, ' ', '_') AS snake,
       concat_ws('|', p_brand, p_type) AS joined,
       regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
       CAST(strpos(p_name, 'widget') AS INTEGER) AS widget_pos,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
       trim('  ' || p_type || ' ') AS trimmed
FROM part
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (reference: regex split T2, concat T12/U7,
    delimiter parses U1/U5 — BookQuery.java:35,82,111,138,161)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface (absent from the reference, §2.4)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_d,
       CAST(ceil(l_extendedprice) AS DOUBLE) AS ceil_p,
       CAST(floor(l_extendedprice) AS DOUBLE) AS floor_p,
       round(l_extendedprice * l_tax, 4) AS tax_amt,
       round(sqrt(l_quantity), 6) AS sqrt_q,
       round(ln(l_extendedprice), 6) AS ln_p,
       round(power(1 + l_discount, 2), 10) AS disc_sq,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn
FROM lineitem
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface; transcendentals (sqrt/ln/pow) rounded to absorb
    possible 1-ulp libm differences between the JVM and DuckDB."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_extendedprice").cast("double").alias("ceil_p"),
        F.floor("l_extendedprice").cast("double").alias("floor_p"),
        # 4 decimals: the product of two 2-decimal values has at most 4, so
        # no .5 rounding tie can arise (Spark HALF_UP vs DuckDB differ on ties)
        F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("tax_amt"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 10).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
    )


@register(
    "conditional_funcs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 150000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS bucket,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
       CAST(o_orderstatus = 'O' AS BOOLEAN) AS is_open
FROM orders
""",
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN + coalesce/nullif — the reference's only conditional is
    the dead-code score guard (U6, BookQuery.java:166)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        (F.col("o_orderstatus") == "O").alias("is_open"),
    )


@register(
    "array_funcs",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       CAST(len(words) AS INTEGER) AS n_words,
       CAST(len(list_distinct(words)) AS INTEGER) AS n_distinct_words,
       words[1] AS first_word,
       words[-1] AS last_word,
       array_to_string(list_sort(list_distinct(words))[1:5], ',') AS first5_sorted,
       CAST(list_contains(words, 'the') AS BOOLEAN) AS has_the
FROM w
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order surface (reference analog: shingle sets and
    posting lists, T4/T9/T11)."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(words)), 1, 5), ","
        ).alias("first5_sorted"),
        F.array_contains(words, "the").alias("has_the"),
    )


@register(
    "json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       event_type
FROM events
""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events props column (§2.4: absent from
    the reference)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        "event_type",
    )


# ---------------------------------------------------------------------------
# Round-1 widening: map type, remaining join kinds, statistical aggregates,
# correlated subqueries
# ---------------------------------------------------------------------------


@register(
    "map_funcs",
    oracle="""
SELECT p_partkey, 'brand' AS key, p_brand AS value FROM part
UNION ALL
SELECT p_partkey, 'name' AS key, p_name AS value FROM part
UNION ALL
SELECT p_partkey, 'type' AS key, p_type AS value FROM part
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map per row, explode it back to typed
    entries (maps themselves are not hash-comparable across engines, so
    the query output is the exploded entry set)."""
    p = table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("name"), F.col("p_name"),
        F.lit("type"), F.col("p_type"),
    )
    return p.select("p_partkey", F.explode(m).alias("key", "value"))


@register(
    "join_full_outer",
    oracle="""
WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, oc.o_custkey, oc.n_orders
FROM customer c FULL OUTER JOIN oc ON c.c_custkey = oc.o_custkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join: null-extended rows on both sides."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    oc = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(oc, c.c_custkey == oc.o_custkey, "full_outer")


@register(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (both sides tiny — planned as a
    broadcast nested loop, no shuffle)."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(min(l_quantity), 6) AS min_qty,
       round(max(l_quantity), 6) AS max_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation) — rounded to 6
    decimals to absorb partial-aggregation fold-order differences."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.min("l_quantity"), 6).alias("min_qty"),
        F.round(F.max("l_quantity"), 6).alias("max_qty"),
    )


@register(
    "subquery_exists",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL surface (Catalyst rewrites it to
    the same left-semi join the DataFrame API would plan)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        """
    )


@register(
    "q12_priority_shipping",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional (CASE) aggregation."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT 100.0 * {_osum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
         / {_osum('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + conditional revenue share.

    r13 (guide §1.2): both revenue sums on the wide fixed-point
    accumulator (global group → corpus-growing; disc_price is the
    property-tested exact-4dp shape, the PROMO branch is the same value
    or an exact 0.0). The final ``100 * a / b`` double arithmetic is
    unchanged — identical inputs give identical bits. 3-SF re-proof
    r13."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * _fixed_sum_wide(promo, 4, "q14")
                / _fixed_sum_wide(rev, 4, "q14")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated non-equi residual (ship
    >60 days after order; fixtures lack commit/receipt dates) planned as a
    left-semi join on the order key, then a group count."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filters → 4-way join (nation
    broadcast) → agg → global top-20 (TakeOrderedAndProject).

    r13 (guide §1.2): revenue on the wide fixed-point accumulator — a
    customer's returned-item volume grows with the corpus (orders per
    customer is not bounded by the schema), so the unbounded wide form,
    not the per-order bounded single long. 3-SF re-proof r13."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _fixed_sum_wide(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "q10"
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an ON-clause predicate, count that
    must treat null-extended rows as 0, then a second aggregation over the
    first's result (two chained exchanges)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_osum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-defined view joined against its own MAX
    (uncorrelated scalar subquery over an aggregate). The exact
    (formerly decimal, r13: wide fixed-point — bit-identical) revenue
    sum makes the equality comparison engine-stable; both sides of the
    ``= max`` comparison come from the same plan, so the comparison
    semantics are unchanged by construction. Per-supplier volume grows
    with the corpus → wide form (guide §1.2). 3-SF re-proof r13."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _fixed_sum_wide(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "q15"
        ).alias("total_revenue")
    )
    revenue.createOrReplaceTempView("revenue_v")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue_v r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue_v)
        """
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
SELECT {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 40)
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicates spanning both
    join sides — the equi key still drives the join; the disjunction stays
    a residual filter, not a nested loop."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 40)
    )
    # r13 (guide §1.2): global revenue sum on the wide fixed-point
    # accumulator (corpus-growing group). 3-SF re-proof r13.
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond1 | cond2)
        .agg(
            _fixed_sum_wide(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "q19"
            ).alias("revenue")
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
WITH rich AS (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                            / count(*)
                     FROM customer WHERE c_acctbal > 0)
)
SELECT CAST(count(*) AS BIGINT) AS numcust, {_osum('c_acctbal')} AS totacctbal
FROM rich c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar average subquery as a filter + NOT EXISTS
    anti join (customers above the positive-balance mean with no orders).
    The mean is computed as exact sum / count so the boundary
    comparison can't flip between engines.

    r13 (guide §1.2): both acctbal sums on the wide fixed-point
    accumulator, UNSIGNED safely — the mean sums only ``c_acctbal > 0``
    rows, and every "rich" row satisfies ``c_acctbal > mean > 0``, so
    no negative value ever reaches either accumulator (unlike
    :func:`join_broadcast_chain`, which needs ``signed=True``).
    Identical sum bits → identical double mean → identical filter
    boundary. 3-SF re-proof r13."""
    c = table(spark, sf_dir, "customer")
    mean_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                _fixed_sum_wide(F.col("c_acctbal"), 2, "q22")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()[0]["m"]
    )
    o = table(spark, sf_dir, "orders")
    return (
        c.filter(F.col("c_acctbal") > mean_bal)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _fixed_sum_wide(F.col("c_acctbal"), 2, "q22").alias("totacctbal"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered semi-join back into a multi-way
    join (the reference's T10 group-filter generalized to real analytics).

    The textbook formulation (the oracle keeps it) re-joins lineitem and
    re-aggregates after the HAVING filter; since orders is unique on
    o_orderkey and customer on c_custkey, the per-order quantity sum from
    the HAVING step IS total_qty — so lineitem is scanned, shuffled, and
    aggregated exactly once and the big table never appears in the join
    a second time. Result-identical (oracle-checked).

    r12 (guide §1.2 "per-task work"): the quantity sum uses
    :func:`_fixed_sum` long accumulators instead of ``decimal(25,6)``
    — bit-identical (quantities are integral money-grade values;
    shared-oracle-certified at all three SFs), and here — unlike q1 —
    there is NO capacity boundary at ANY corpus scale: the group is one
    ORDER, so the scaled sum is bounded by lines-per-order × max
    quantity (≤ a few hundred), not by the corpus. The ``try_sum``
    raise guard stays as the loud backstop. Before: the decimal partial
    aggregate was ~1.2 core-s fused into a single-split scan task —
    most of the query's wall (OPTIMIZATION_r12.md)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_fixed_sum(F.col("l_quantity"), 0, "q18").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
    )


# ---------------------------------------------------------------------------
# Round-1 widening (cont.): remaining TPC-H shapes expressible on the
# fixtures (Q2/Q9/Q11/Q16/Q20 need the absent partsupp table)
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of the same dim table (nation joined once
    through supplier, once through customer) with a symmetric disjunctive
    pair filter, grouped by ship year.

    r13 (r12 verdict #8; guide §3.2 pre-filter the big side, §2.3
    shuffle fewer bytes): q5's dim-composite spine transfers. The old
    order joined the FULL supplier table onto lineitem first and only
    dropped non-{NATION_1,NATION_2} rows five joins later at the nation
    broadcasts (Catalyst pushes the disjunction's nation-name IN-filter
    to both nation scans, but never re-orders the pair filter below the
    orders/customer joins) — 100% of the date-filtered lineitem flowed
    through the orderkey and custkey joins. Now each nation role is
    pre-joined into its dim composite (supplier⋈nation→{suppkey,
    supp_nation}, customer⋈nation→{custkey, cust_nation}, both filtered
    to the two pair nations, which the pair disjunction implies), so
    the suppkey join drops ~23/25 of lineitem BEFORE the orderkey join
    at any scale, and the custkey join streams a customer composite
    already cut to 2 nations. Two broadcast builds instead of four; at
    real scale the composites exit the broadcast regime (same
    footer-count gate as q5) and the SMJ shuffles carry 2/25 of
    supplier/customer and ~8% of lineitem instead of all of it. The
    symmetric pair filter (which also excludes N1–N1/N2–N2) runs where
    it always did, after both roles are attached. Same rows, same
    oracle — 3-SF value-hash re-proof r13."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = table(spark, sf_dir, "orders")
    pair_nations = ["NATION_1", "NATION_2"]
    n1 = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(pair_nations)
    )
    n2 = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(pair_nations)
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .join(n1, F.col("s_nationkey") == n1.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = (
        table(spark, sf_dir, "customer")
        .join(n2, F.col("c_nationkey") == n2.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    # Stat-less size estimates for a composite of joined dims multiply
    # and come out LARGER than the fact table, flipping the build side
    # onto lineitem (the q5 lesson, OPTIMIZATION_r12.md). Hint the
    # composite broadcasts only while the base dims are PROVABLY small
    # (parquet-footer row count, driver-side, no job); at real scale no
    # hint is emitted and the planner's SMJ/SHJ choice stands on the
    # pre-filtered composites.
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        table_rows,
    )

    if table_rows(sf_dir, "supplier") <= 2_000_000:
        sn = F.broadcast(sn)
    if table_rows(sf_dir, "customer") <= 2_000_000:
        cn = F.broadcast(cn)
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(cn, cn.c_custkey == o.o_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        # r13 (guide §1.2): wide fixed-point revenue (nation-pair/year
        # groups grow with the corpus). 3-SF re-proof r13.
        .agg(
            _fixed_sum_wide(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "q7"
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       {_osum("CASE WHEN n2.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
         / {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS mkt_share
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY year(o.o_orderdate)
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per year —
    an 8-way join where the share is a conditional-sum / total-sum ratio.
    Both sums are exact decimal, so the final double divide is the only
    float op and is bit-identical across engines."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    # r13 (r12 verdict #8; guide §3.2/§2.3): both dim roles pre-joined
    # into composites, as in q5/q7. supplier⋈nation → {suppkey,
    # supp_nation} (one build instead of two); customer⋈nation⋈region
    # (ASIA) → {custkey} — the region cut now lands AT the custkey join
    # instead of two joins later, so at real scale the custkey
    # join/exchange carries ~1/5 of customers and drops non-ASIA rows
    # before they exist in the stream. Broadcast hints footer-gated
    # like q5 (stat-less composite estimates flip the build side onto
    # the fact table otherwise); at real scale no hint is emitted.
    sn = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    crn = (
        table(spark, sf_dir, "customer")
        .join(
            table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        table_rows,
    )

    if table_rows(sf_dir, "supplier") <= 2_000_000:
        sn = F.broadcast(sn)
    if table_rows(sf_dir, "customer") <= 2_000_000:
        crn = F.broadcast(crn)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(sn, sn.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(crn, crn.c_custkey == o.o_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        # r13 (guide §1.2): both sums wide fixed-point (per-year groups
        # grow with the corpus; nat is rev-or-exact-0.0, non-negative).
        # The final double divide is unchanged. 3-SF re-proof r13.
        .agg(
            (
                _fixed_sum_wide(nat, 4, "q8") / _fixed_sum_wide(rev, 4, "q8")
            ).alias("mkt_share")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                / count(*)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT {_osum('l.l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average subquery (quantity
    below 20% of the part's mean) expressed as a self-aggregate join —
    lineitem is scanned twice but the per-part agg side collapses to one
    row per key before the join. The mean is exact-decimal sum / count so
    the strict-inequality boundary can't flip between engines.

    r13 (guide §1.2): both sums wide fixed-point — per-part quantity
    (scale 0) and the global extendedprice (scale 2); identical sum
    bits keep the 0.2×mean boundary identical. Per-part lineitem volume
    grows with the corpus → wide form. 3-SF re-proof r13."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (_fixed_sum_wide(F.col("l_quantity"), 0, "q17") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(part_avg, F.col("pk") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                _fixed_sum_wide(F.col("l_extendedprice"), 2, "q17") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "q21_suppliers_who_kept_orders_waiting",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_0'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name LIMIT 100
""",
)
def q21_suppliers_who_kept_orders_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape: the sole-late-supplier-on-a-multi-supplier-order
    pattern — an EXISTS (semi join, other supplier present) stacked on a
    NOT EXISTS (anti join, no other LATE supplier), both correlated with a
    key-inequality residual. "Late" is adapted to ship-lag > 90 days
    (fixtures lack commit/receipt dates, as in q4_order_priority)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(
            o,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .select("l_orderkey", "l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    )
    l1 = (
        late.join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("s_name", "l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            l2,
            (F.col("ok2") == F.col("l_orderkey"))
            & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("ok3") == F.col("l_orderkey"))
            & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "join_skew_salted",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, s.s_name
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the big side is split into 8 deterministic
    sub-keys and the small side replicated across them, so one power-law
    hot key spreads over 8 reducers instead of flooding one task. The
    oracle is the PLAIN join — salting must be result-identical, which is
    the whole point of checking it here. (AQE's skew split handles
    moderate skew; salting is the fallback when a single post-split
    partition is still one key.)"""
    from similarity_search_with_hadoop_mapreduce_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_orderkey", "l_linenumber"
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    return salted_join(li, s, "suppkey", n_salts=8).select(
        "l_orderkey", "l_linenumber", "s_name"
    )


@register(
    "agg_percentile",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90
FROM orders GROUP BY o_orderpriority
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) per group — Spark's ``percentile``
    and DuckDB's ``quantile_cont`` share linear interpolation, so the
    oracle is full-value. (The approximate sketch path —
    ``approx_percentile`` / t-digest — is the 100 TB variant and is
    exercised in tests/test_approx.py; sketches are engine-specific, so
    they get property bounds rather than a cross-engine hash.)"""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
    )


@register(
    "join_lateral_topk",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
""",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) through the
    SQL surface. Catalyst decorrelates it into the same one-exchange
    window/rank plan a hand-written row_number query gets — per-customer
    LIMIT never executes as a per-row re-scan."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


@register(
    "posexplode_ordinality",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
e AS (SELECT doc_id,
             unnest([struct_pack(pos := i - 1, word := words[i])
                     for i in generate_series(1, len(words))]) AS t
      FROM w)
SELECT doc_id, CAST(t.pos AS INTEGER) AS pos, t.word FROM e
""",
)
def posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style ordinal explode (``posexplode``) — the generator runs
    inside the scan's codegen stage, no shuffle; the reference's T7
    KV-emit (BookQuery.java:81-83) is this without the ordinal."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )


@register(
    "null_safe_equality",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status
  FROM orders
)
SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b
FROM o a JOIN o b
  ON a.status IS NOT DISTINCT FROM b.status
 AND a.o_orderkey + 1 = b.o_orderkey
""",
)
def null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other — unlike plain ``=``, which drops them. The null-safe
    operator stays a hash-join key (no nested loop), which matters when
    the null bucket is large."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
    )
    a = o.select(F.col("o_orderkey").alias("key_a"), F.col("status").alias("s_a"))
    b = o.select(F.col("o_orderkey").alias("key_b"), F.col("status").alias("s_b"))
    return (
        a.join(
            b,
            (F.col("s_a").eqNullSafe(F.col("s_b")))
            & (F.col("key_a") + 1 == F.col("key_b")),
        )
        .select("key_a", "key_b")
    )


@register(
    "unpivot_long_form",
    oracle="""
SELECT o_orderkey, name, CAST(value AS DOUBLE) AS value FROM (
  UNPIVOT (SELECT o_orderkey, o_totalprice AS price,
                  CAST(o_custkey AS DOUBLE) AS cust
           FROM orders)
  ON price, cust INTO NAME name VALUE value)
""",
)
def unpivot_long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (inverse of agg_pivot): map-only row expansion,
    no shuffle."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_custkey").cast("double").alias("cust"),
    )
    return o.unpivot("o_orderkey", ["price", "cust"], "name", "value")


@register(
    "set_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT ALL
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two sides) —
    the multiset counterpart of set_intersect."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity = left minus right, floored
    at zero) — the multiset counterpart of set_except."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.exceptAll(b)


@register(
    "events_props_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
       CAST(json_extract_string(props, '$.k') IS NOT NULL AS BOOLEAN) AS has_k
FROM events
""",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface via Spark 4's VARIANT type: parse_json once,
    typed variant_get extraction — the open-schema path for property bags
    (binary variant encoding decodes ~an order of magnitude faster than
    re-parsing JSON strings per access, and pushes into shredded columns
    on modern table formats). Oracle = DuckDB JSON extraction."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_value"),
        F.variant_get(v, "$.k", "string").isNotNull().alias("has_k"),
    )


@register(
    "agg_argmax",
    oracle="""
SELECT c_nationkey,
       (max(struct_pack(b := c_acctbal, k := c_custkey, n := c_name))).k
         AS top_custkey,
       (max(struct_pack(b := c_acctbal, k := c_custkey, n := c_name))).n
         AS top_name,
       (max(struct_pack(b := c_acctbal, k := c_custkey, n := c_name))).b
         AS top_acctbal
FROM customer
GROUP BY c_nationkey
""",
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise argmax without a window: one hash aggregate carrying a
    lexicographically-ordered struct (value, tiebreak, payload) — half
    the cost of the row_number() plan (no sort, partial agg map-side)
    and fully deterministic because the tiebreak key is unique."""
    c = table(spark, sf_dir, "customer")
    m = F.max(
        F.struct(
            F.col("c_acctbal").alias("b"),
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("n"),
        )
    )
    return c.groupBy("c_nationkey").agg(m.alias("m")).select(
        "c_nationkey",
        F.col("m.k").alias("top_custkey"),
        F.col("m.n").alias("top_name"),
        F.col("m.b").alias("top_acctbal"),
    )


@register(
    "events_value_histogram",
    oracle="""
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT CAST(least(15, floor(((value - lo) / (hi - lo)) * 16)) AS INTEGER)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_events
FROM events, bounds
GROUP BY 1
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 16-bucket histogram of the event value distribution —
    data-dependent bounds from one scalar agg (broadcast into the
    bucketing projection), then a single group-by; identical IEEE double
    arithmetic on both engines keeps bucket edges bit-stable."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.least(
        F.lit(15),
        F.floor(((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))) * 16),
    ).cast("int")
    return (
        e.join(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Sketch-entry dials (ADVICE r9). The oracle sides below pin hll_ok /
# theta_ok / merged_ok / rank_ok / cm_tol_ok as TRUE literals. Those pins
# are EMPIRICAL, not guaranteed: HLL at lgk=12 has ~1.6% RSE and KLL
# ~1.65% rank eps, so the 5% tolerance holds with high probability on any
# given dataset — and DETERMINISTICALLY on a fixed one (the sketches are
# hash-based, no RNG), which is what makes the pin replay-stable across
# certification runs at sf0.001/0.01/0.1 (CERTIFY_r*.json). A future
# dataset or SF where an estimate lands outside tolerance fails loudly at
# certification; the deliberate re-pin is these dials (raise the
# tolerance, or SKETCH_LGK / CM width for more precision), not a silent
# oracle edit. cm_ge_exact is the exception: a HARD guarantee (CM only
# ever overestimates), TRUE by construction on every dataset.
# ---------------------------------------------------------------------------
SKETCH_REL_TOL = 0.05  # HLL/theta/merged relative tolerance vs exact
SKETCH_RANK_TOL = 0.05  # KLL rank tolerance around the target quantile
SKETCH_LGK = 12  # HLL/theta precision (operators/sketches._LGK)
CM_WIDTH = 1024  # count-min width: error bound e/width of stream size
CM_DEPTH = 4  # count-min depth: bound-failure probability ~e^-depth


@register(
    "agg_sketch_distinct",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS hll_ok,
       TRUE AS theta_ok
FROM events
GROUP BY event_type
""",
)
def agg_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting (operators/sketches.py): per
    event_type, the exact count plus HLL and theta within-5%% flags —
    a DataSketches sketch is a deterministic function of the input
    multiset, so the tolerance booleans are replay-stable while the
    estimates themselves stay engine-side (DuckDB cannot reproduce
    DataSketches internals; it pins the exact count and the TRUE
    contracts). At 100 TB the exact column is dropped and the sketch is
    the answer: map-only mergeable O(2^lgk)-byte state, no Expand plan,
    no re-scan to extend a window."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        distinct_count_report,
    )

    return distinct_count_report(
        table(spark, sf_dir, "events"), ["event_type"], "user_id",
        rel_tol=SKETCH_REL_TOL, lgk=SKETCH_LGK,
    ).select("event_type", "n_exact", "hll_ok", "theta_ok")


@register(
    "agg_sketch_merge",
    oracle="""
SELECT count(DISTINCT user_id) AS n_exact,
       count(*) AS n_rows,
       count(DISTINCT CAST(ts AS DATE)) AS n_epochs,
       TRUE AS merged_ok
FROM events
""",
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch LIFECYCLE pin: per-day HLL partials (the storable
    epoch table) unioned to one global estimate, within 5%% of the exact
    global distinct. This is the design that answers "distinct users
    this quarter" from O(epochs) kilobyte rows instead of a corpus
    rescan — the aggregation-tier sibling of the stored dedup index and
    term profile. The 1-row exact/merged cross join is the documented
    driver-held-scalar pattern."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        epoch_sketches,
        merged_distinct_estimate,
    )

    ev = table(spark, sf_dir, "events")
    merged = merged_distinct_estimate(
        epoch_sketches(ev, F.to_date("ts"), "user_id")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.crossJoin(merged).select(
        "n_exact",
        "n_rows",
        F.col("n_epochs").cast("long").alias("n_epochs"),
        (
            F.abs(F.col("est").cast("double") - F.col("n_exact").cast("double"))
            <= F.lit(SKETCH_REL_TOL) * F.col("n_exact").cast("double")
        ).alias("merged_ok"),
    )


@register(
    "agg_sketch_quantile",
    oracle="""
SELECT event_type,
       count(value) AS n_rows,
       TRUE AS kll_n_ok,
       TRUE AS rank_ok
FROM events
GROUP BY event_type
""",
)
def agg_sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL median sketch per event_type, pinned by the sketch's ACTUAL
    guarantee: the estimate's exact rank within q +/- 5%% (KLL bounds
    RANK error, ~1.65%% at the default k — value error is unbounded on
    skewed data, and the sketch is not partitioning-deterministic, so
    neither the value nor a value tolerance is replay-stable; the rank
    check is distribution-free) plus kll_n == exact count (ingestion
    counted every row). The estimate column itself is engine-side; the
    oracle pins the exact count and the TRUE contracts."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        quantile_report,
    )

    return quantile_report(
        table(spark, sf_dir, "events"), ["event_type"], "value", q=0.5,
        rank_tol=SKETCH_RANK_TOL,
    ).select("event_type", "n_rows", "kll_n_ok", "rank_ok")


_CM_FREQ_TOP_K = 20


def _cm_frequency_oracle(top_k: int = _CM_FREQ_TOP_K) -> str:
    from similarity_search_with_hadoop_mapreduce_spark.registry.sim import (
        TOKENS_CTE,
    )

    return (
        "WITH "
        + TOKENS_CTE
        + f""",
t AS (
  SELECT term FROM (SELECT unnest(tok) AS term FROM tokens)
  WHERE length(term) > 0
)
SELECT term, n_exact,
       TRUE AS cm_ge_exact,
       TRUE AS cm_tol_ok,
       TRUE AS merged_eq
FROM (
  SELECT term, CAST(count(*) AS BIGINT) AS n_exact
  FROM t GROUP BY term
  ORDER BY n_exact DESC, term
  LIMIT {top_k}
)
"""
    )


@register("agg_sketch_frequency", oracle=_cm_frequency_oracle())
def agg_sketch_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters over the documents token stream — the
    frequency member that completes the mergeable-sketch family
    (HLL/theta = distinct, KLL = quantiles, CM = per-item counts; it
    pairs with vocab_coverage's exact head as the sketch-side serving
    path). The exact top-20 terms (count desc, term asc — a TakeOrdered)
    grade the sketch per item:

    - ``cm_ge_exact`` — CM's HARD overestimate-only guarantee, TRUE by
      construction on any dataset;
    - ``cm_tol_ok`` — estimate within the classic e/width bound of the
      stream size (empirical pin; CM_WIDTH/CM_DEPTH are the re-pin
      dials, see the sketch-dial block above);
    - ``merged_eq`` — the LIFECYCLE hard pin: the estimate served from
      per-epoch stored partials merged by groupBy-SUM is bit-identical
      to the direct sketch's (CM merge is exact addition — unlike HLL
      union), so "term frequency this quarter" really is a merge over
      O(epochs · d · w) counter rows, never a corpus rescan.

    The estimates themselves stay engine-side (xxhash64 cells); the
    oracle pins the exact counts and the contracts, like the rest of
    the sketch tier."""
    from similarity_search_with_hadoop_mapreduce_spark.functions.text import (
        java_split_tokens_sql,
    )
    from similarity_search_with_hadoop_mapreduce_spark.operators import (
        sketches as SK,
    )

    terms = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.expr(java_split_tokens_sql("text"))).alias("term"),
        )
        .filter(F.length("term") > 0)
    )
    rep = SK.frequency_report(
        terms, "term", top_k=_CM_FREQ_TOP_K, width=CM_WIDTH, depth=CM_DEPTH
    )
    merged = SK.merge_cm_sketches(
        SK.epoch_cm_sketches(
            terms, F.pmod(F.col("doc_id"), F.lit(4)), "term",
            width=CM_WIDTH, depth=CM_DEPTH,
        )
    )
    from_merged = SK.cm_estimate(
        merged, rep.select("term"), "term", width=CM_WIDTH, depth=CM_DEPTH
    ).withColumnRenamed("cm_est", "cm_est_merged")
    return rep.join(from_merged, "term").select(
        "term",
        "n_exact",
        "cm_ge_exact",
        "cm_tol_ok",
        (F.col("cm_est") == F.col("cm_est_merged")).alias("merged_eq"),
    )


@register(
    "agg_sketch_theta_ops",
    oracle="""
WITH t AS (
  SELECT user_id, day(ts) <= 15 AS a, day(ts) > 15 AS b FROM events
),
per AS (
  SELECT user_id, bool_or(a) AS ia, bool_or(b) AS ib
  FROM t GROUP BY user_id
)
SELECT
  CAST((SELECT count(*) FROM per WHERE ia) AS BIGINT) AS n_a,
  CAST((SELECT count(*) FROM per WHERE ib) AS BIGINT) AS n_b,
  CAST((SELECT count(*) FROM per) AS BIGINT) AS n_union,
  CAST((SELECT count(*) FROM per WHERE ia AND ib) AS BIGINT) AS n_both,
  CAST((SELECT count(*) FROM per WHERE ia AND NOT ib) AS BIGINT)
    AS n_a_only,
  TRUE AS n_a_ok, TRUE AS n_b_ok, TRUE AS n_union_ok,
  TRUE AS n_both_ok, TRUE AS n_a_only_ok
""",
)
def agg_sketch_theta_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA (r10) — the retention/churn primitive no
    HLL partial can serve: distinct users active in the first half of
    the month vs the second, with the sketch intersection (retention)
    and difference (churn) next to exact baselines, each flagged within
    5% OF THE UNION (set-op noise is union-scale — a tolerance relative
    to a near-empty difference would be vacuous). Below 2^lgk distinct
    values a theta sketch holds every hash and the set ops are EXACT
    (the certified SFs run in that regime); past it they degrade to
    ~1.6% RSE. The 100-TB serving path is ``theta_epoch_ops`` over
    stored per-epoch partials (operators/sketches.py) — same estimates,
    O(epochs) kilobyte rows, corpus never rescanned (pytest-pinned
    equal to this inline computation)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        distinct_set_report,
    )

    ev = table(spark, sf_dir, "events")
    return distinct_set_report(
        ev,
        "user_id",
        F.dayofmonth("ts") <= 15,
        F.dayofmonth("ts") > 15,
        rel_tol=SKETCH_REL_TOL,
        lgk=SKETCH_LGK,
    )


@register(
    "agg_sketch_theta_ops_estimated",
    oracle="""
WITH t AS (
  SELECT l_partkey,
         year(l_shipdate) = 1996 AS a, year(l_shipdate) = 1997 AS b
  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
),
per AS (
  SELECT l_partkey, bool_or(a) AS ia, bool_or(b) AS ib
  FROM t GROUP BY l_partkey
)
SELECT
  CAST((SELECT count(*) FROM per WHERE ia) AS BIGINT) AS n_a,
  CAST((SELECT count(*) FROM per WHERE ib) AS BIGINT) AS n_b,
  CAST((SELECT count(*) FROM per) AS BIGINT) AS n_union,
  CAST((SELECT count(*) FROM per WHERE ia AND ib) AS BIGINT) AS n_both,
  CAST((SELECT count(*) FROM per WHERE ia AND NOT ib) AS BIGINT)
    AS n_a_only,
  TRUE AS n_a_ok, TRUE AS n_b_ok, TRUE AS n_union_ok,
  TRUE AS n_both_ok, TRUE AS n_a_only_ok
""",
)
def agg_sketch_theta_ops_estimated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta set algebra in the ESTIMATION regime (r11, r10 verdict #5):
    ``agg_sketch_theta_ops`` certifies below 2^lgk distinct, where the
    set ops are exact by construction — this twin pushes past capacity
    where estimation actually happens. Key = ``l_partkey`` across ship
    years 1996 vs 1997 ("parts active in both years" retention, the
    real intersection/difference shapes): ~20k distinct at sf0.1, ~5x
    over the 2^12 nominal entries, so every certified sf0.1 run
    exercises the ~1.6% RSE degradation path and the union-relative
    tolerance flags are live contracts, not vacuous exact equalities
    (sf0.001/0.01 stay below capacity — the same entry certifies both
    regimes). Deterministic on a fixed dataset (hash-based, no RNG); a
    dataset where a flag fails re-pins via SKETCH_LGK / SKETCH_REL_TOL
    (the dial discipline above), never a silent oracle edit."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        distinct_set_report,
    )

    li = table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1996, 1997)
    )
    return distinct_set_report(
        li,
        "l_partkey",
        F.year("l_shipdate") == 1996,
        F.year("l_shipdate") == 1997,
        rel_tol=SKETCH_REL_TOL,
        lgk=SKETCH_LGK,
    )


def _bloom_oracle_sql(m_bits: int, k: int) -> str:
    """DuckDB twin of the md5-mode bloom build+probe: same md5-derived
    affine constants (embedded as literals), same 63-bit word packing,
    same positions — every per-order flag, INCLUDING which non-members
    false-positive, is engine-independent and value-hashed."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        _MERSENNE31,
        _affine_params,
    )

    ab = ", ".join(f"({a}, {b})" for a, b in _affine_params(k))
    h = (
        "((('0x' || substr(md5(CAST({v} AS VARCHAR)), 1, 15))::BIGINT)"
        " & 2147483647)"
    )
    return f"""
WITH ab(a, b) AS (VALUES {ab}),
wl AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
pos AS (
  SELECT ((ab.a * {h.format(v='wl.c_custkey')} + ab.b) % {_MERSENNE31})
           % {m_bits} AS p
  FROM wl, ab
),
sparse AS (
  SELECT p // 63 AS wi, bit_or(1::BIGINT << (p % 63)::INT) AS w
  FROM pos GROUP BY 1
),
probe AS (
  SELECT o.o_orderkey, o.o_custkey,
         ((ab.a * {h.format(v='o.o_custkey')} + ab.b) % {_MERSENNE31})
           % {m_bits} AS p
  FROM orders o, ab
)
SELECT probe.o_orderkey,
       bool_and(((coalesce(sparse.w, 0) >> (probe.p % 63)::INT) & 1) = 1)
         AS bloom_hit,
       bool_and(probe.o_custkey IN (SELECT c_custkey FROM wl)) AS is_member
FROM probe LEFT JOIN sparse ON sparse.wi = probe.p // 63
GROUP BY probe.o_orderkey
"""


@register("agg_sketch_bloom_membership", oracle=_bloom_oracle_sql(1 << 14, 5))
def agg_sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter MEMBERSHIP (r11) — the member completing the
    mergeable-sketch family (HLL distinct / KLL quantile / CM frequency /
    theta set algebra / bloom membership). Watchlist = customers with
    negative account balance (~9%); every order is flagged map-side
    against the 2 KB broadcast bitmap — the semi-join pre-filter shape
    Spark's runtime bloom pruning uses, surfaced as an operator: the
    orders side NEVER shuffles (plan-pinned in tests/test_sketches.py).

    Strongest oracle in the sketch tier: because the bitmap is built
    relationally from md5-derived positions (operators/sketches.py
    bloom section), DuckDB reproduces it bit-for-bit and the FULL
    per-order flag vector — including exactly which non-member orders
    false-positive (the sf0.1 regime: m/n ≈ 12, FPR ≈ 0.4%) — is
    value-hashed, not pinned as TRUE literals. ``is_member`` is the
    exact baseline; no-false-negatives (is_member → bloom_hit) is the
    hard guarantee, unit- and property-tested. Production mode is
    ``base_hash='xxhash64'`` (codegen'd, no hex round trip), the
    md5/xxhash64 twin pattern of the MinHash family."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    cust = table(spark, sf_dir, "customer")
    wl = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    bloom = bloom_build(wl, "c_custkey", base_hash="md5")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    hit = bloom_probe(orders, bloom, "o_custkey", base_hash="md5")
    return (
        hit.join(
            wl.withColumnRenamed("c_custkey", "o_custkey").withColumn(
                "_m", F.lit(True)
            ),
            "o_custkey",
            "left",
        )
        .select(
            "o_orderkey",
            "bloom_hit",
            F.coalesce(F.col("_m"), F.lit(False)).alias("is_member"),
        )
    )


@register(
    "agg_sketch_quantile_merged",
    oracle="""
SELECT CAST(count(value) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_epochs,
       TRUE AS kll_n_ok,
       TRUE AS rank_ok
FROM events
""",
)
def agg_sketch_quantile_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-partials QUANTILE lifecycle (r10): per-day KLL sketches
    merged losslessly (``kll_merge_agg_double`` — the rank guarantee
    composes through the merge), the merged median then graded by KLL's
    ACTUAL contract: its exact rank within 0.5 ± 5% (value error is
    unbounded on skew and KLL state is not partitioning-deterministic,
    so the booleans — not the estimate — are the replay-stable pin,
    exactly as agg_sketch_quantile) plus ``kll_n`` == exact row count
    (every stored row reached the merged sketch). This is "p99 latency
    this quarter from O(epochs) kilobyte rows" — the quantile member of
    the stored-partials family (``save_epoch_quantile_sketches`` /
    ``quantile_from_stored_sketches``, disk path pytest-pinned equal to
    this in-memory merge)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        epoch_quantile_sketches,
    )

    ev = table(spark, sf_dir, "events")
    merged = epoch_quantile_sketches(ev, F.to_date("ts"), "value").agg(
        F.kll_merge_agg_double("sketch").alias("_m"),
        F.sum("n_rows").alias("_part_n"),
        F.count(F.lit(1)).alias("n_epochs"),
    ).select(
        F.kll_sketch_get_quantile_double("_m", F.lit(0.5)).alias("est"),
        F.kll_sketch_get_n_double("_m").alias("kll_n"),
        F.col("n_epochs").cast("long").alias("n_epochs"),
    )
    exact = ev.agg(F.count("value").alias("n_rows"))
    ranked = (
        ev.crossJoin(F.broadcast(merged))
        .agg(
            F.first("est").alias("est"),
            F.first("kll_n").alias("kll_n"),
            F.first("n_epochs").alias("n_epochs"),
            F.sum(
                F.when(F.col("value").cast("double") <= F.col("est"), 1)
                .otherwise(0)
            ).alias("_rank"),
        )
        .crossJoin(F.broadcast(exact))
    )
    lo, hi = 0.5 - SKETCH_RANK_TOL, 0.5 + SKETCH_RANK_TOL
    return ranked.select(
        "n_rows",
        "n_epochs",
        (F.col("kll_n") == F.col("n_rows")).alias("kll_n_ok"),
        (
            (F.col("_rank") >= F.lit(lo) * F.col("n_rows"))
            & (F.col("_rank") <= F.ceil(F.lit(hi) * F.col("n_rows")))
        ).alias("rank_ok"),
    )
