"""Data-quality validation entries: the ingest gate a 100-TB pipeline
runs before dedup/scoring/packing ever see a row. Every entry is a
full-value DuckDB oracle; the deliberately-tight rules guarantee
NONZERO violation counts so the hash pins the counting semantics, not
just a row of zeros, and one rule routes through a genuine NULL so the
three-valued "NOT TRUE = violation" contract is value-pinned too
(see operators/validate.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators.validate import (
    check_rules,
    check_unique,
    column_profile,
    fk_orphans,
    null_profile,
)
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table

# Each rule: (name, boolean SQL that must be TRUE for a conforming row).
# Mix of real contracts (0 violations on the TPC-H-ish data — pins that
# clean data passes), tight probes (nonzero counts — pins the counter),
# and one NULL-routed rule (pins NOT-TRUE semantics).
_LINEITEM_RULES: list[tuple[str, str]] = [
    ("qty_range", "l_quantity BETWEEN 1 AND 50"),
    ("discount_contract", "l_discount BETWEEN 0 AND 0.1"),
    ("discount_tight", "l_discount <= 0.05"),
    ("returnflag_domain", "l_returnflag IN ('R', 'A', 'N')"),
    ("linestatus_domain", "l_linestatus IN ('O', 'F')"),
    ("price_positive", "l_extendedprice > 0"),
    # nullif sends l_returnflag='N' rows through NULL IN (...) -> NULL
    # -> NOT TRUE -> violation: the NULL path carries real weight.
    ("null_routed_flag", "nullif(l_returnflag, 'N') IN ('R', 'A')"),
]


def _rules_oracle() -> str:
    return "\nUNION ALL\n".join(
        "SELECT "
        f"'{name}' AS check, "
        f"count(*) FILTER (WHERE ({expr}) IS NOT TRUE) AS violations, "
        "count(*) AS n_rows, "
        f"(count(*) FILTER (WHERE ({expr}) IS NOT TRUE)) = 0 AS passed "
        "FROM lineitem"
        for name, expr in _LINEITEM_RULES
    )


@register("validate_rules", oracle=_rules_oracle())
def validate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-rule gate over lineitem: 7 boolean contracts counted in ONE
    map-only scan (one conditional counter per rule inside a single agg
    — partial aggregation ships a handful of longs per task). A rule is
    violated when its expression is NOT TRUE, so NULLs never pass a
    gate; `null_routed_flag` pins that path with real counts."""
    return check_rules(table(spark, sf_dir, "lineitem"), _LINEITEM_RULES)


# Profile a frame with REAL nulls: nullif() injects them as a pure
# function of the data, identically on both engines, so the census has
# nonzero n_null without synthesizing a side table.
_NULLPROF_SQL = """
SELECT doc_id,
       nullif(lang, 'en') AS lang_nn,
       nullif(source, 'web') AS source_nw,
       text
FROM documents
"""


def _null_profile_oracle() -> str:
    cols = ["doc_id", "lang_nn", "source_nw", "text"]
    selects = "\nUNION ALL\n".join(
        "SELECT "
        f"'{c}' AS \"column\", "
        "count(*) AS n_rows, "
        f"count(*) FILTER (WHERE {c} IS NULL) AS n_null "
        f"FROM probe"
        for c in cols
    )
    return (
        f"WITH probe AS (\n{_NULLPROF_SQL}\n)\n"
        f'SELECT "column", n_rows, n_null,\n'
        f"       ((n_null * 1000000) // n_rows) / 1000000.0 AS null_frac\n"
        f"FROM (\n{selects}\n) u"
    )


@register("validate_null_profile", oracle=_null_profile_oracle())
def validate_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null census of a documents projection in ONE scan —
    all counters live in a single agg; the wide one-row result is
    unpivoted with `stack` (no shuffle, no Python). nullif() derives
    real NULLs from the data so the counts are nonzero and the
    midpoint-free null_frac quantization is value-pinned."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("nullif(lang, 'en')").alias("lang_nn"),
        F.expr("nullif(source, 'web')").alias("source_nw"),
        "text",
    )
    return null_profile(docs, ["doc_id", "lang_nn", "source_nw", "text"])


def _unique_fk_oracle() -> str:
    return """
SELECT 'unique:o_orderkey' AS check,
       count(DISTINCT o_orderkey) AS n_keys,
       count(*) FILTER (WHERE cnt > 1) AS dup_keys,
       coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0) AS violations,
       count(*) FILTER (WHERE cnt > 1) = 0 AS passed
FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY 1) k
UNION ALL
SELECT 'unique:l_orderkey,l_linenumber',
       count(*),
       count(*) FILTER (WHERE cnt > 1),
       coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0),
       count(*) FILTER (WHERE cnt > 1) = 0
FROM (SELECT l_orderkey, l_linenumber, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2) k
UNION ALL
SELECT 'unique:l_orderkey',
       count(*),
       count(*) FILTER (WHERE cnt > 1),
       coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0),
       count(*) FILTER (WHERE cnt > 1) = 0
FROM (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1) k
UNION ALL
SELECT 'fk:orders.o_custkey->customer',
       count(*),
       count(*),
       coalesce(sum(n_rows), 0),
       count(*) = 0
FROM (SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY 1) c
WHERE o_custkey IS NULL
   OR o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'fk:lineitem.l_partkey->part_half',
       count(*),
       count(*),
       coalesce(sum(n_rows), 0),
       count(*) = 0
FROM (SELECT l_partkey, count(*) AS n_rows FROM lineitem GROUP BY 1) c
WHERE l_partkey IS NULL
   OR l_partkey NOT IN (SELECT p_partkey FROM part
                        WHERE p_partkey % 2 = 0)
"""


@register("validate_unique_fk", oracle=_unique_fk_oracle())
def validate_unique_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-uniqueness + referential-integrity report as one tidy frame:
    (check, n_keys, dup_keys, violations, passed).

    Three uniqueness rollups (the true PKs pass; bare l_orderkey is a
    deliberate dup-heavy probe so the dup counters carry weight) and two
    FK anti-join probes (orders->customer is clean; lineitem->half-of-
    part is deliberately orphaned). Each uniqueness check is one
    map-combined hash-aggregate; each FK probe pre-aggregates the child
    to distinct keys FIRST (the anti-join then moves keys, not rows) and
    Catalyst broadcasts the dimension side. Nothing reaches the driver —
    the report rows are O(#checks)."""
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    customer = table(spark, sf_dir, "customer")
    part_half = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 2 == 0)

    def _uni(df: DataFrame, keys: list[str]) -> DataFrame:
        return check_unique(df, keys, check="unique:" + ",".join(keys)).select(
            "check",
            "n_keys",
            "dup_keys",
            F.col("dup_rows").alias("violations"),
            "passed",
        )

    def _fk(name: str, child: DataFrame, ck: str, parent: DataFrame,
            pk: str) -> DataFrame:
        return fk_orphans(child, parent, ck, pk).agg(
            F.lit(name).alias("check"),
            F.count(F.lit(1)).alias("n_keys"),
            F.count(F.lit(1)).alias("dup_keys"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("violations"),
        ).select(
            "check", "n_keys", "dup_keys", "violations",
            (F.col("n_keys") == 0).alias("passed"),
        )

    out = _uni(orders, ["o_orderkey"])
    out = out.unionByName(_uni(lineitem, ["l_orderkey", "l_linenumber"]))
    out = out.unionByName(_uni(lineitem, ["l_orderkey"]))
    out = out.unionByName(
        _fk("fk:orders.o_custkey->customer", orders, "o_custkey",
            customer, "c_custkey")
    )
    out = out.unionByName(
        _fk("fk:lineitem.l_partkey->part_half", lineitem, "l_partkey",
            part_half, "p_partkey")
    )
    return out


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _column_profile_oracle() -> str:
    return "\nUNION ALL\n".join(
        "SELECT "
        f"'{c}' AS column, "
        "count(*) AS n_rows, "
        f"count(*) FILTER (WHERE {c} IS NULL) AS n_null, "
        f"count(DISTINCT {c}) AS n_distinct, "
        f"CAST(min({c}) AS DOUBLE) AS min_v, "
        f"CAST(max({c}) AS DOUBLE) AS max_v, "
        f"CAST(sum(CAST({c} AS DECIMAL(25,6))) AS DOUBLE) AS sum_v "
        "FROM lineitem"
        for c in _PROFILE_COLS
    )


@register("validate_column_profile", oracle=_column_profile_oracle())
def validate_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric column profile of lineitem: min/max/exact-distinct/
    exact-decimal-sum for 4 columns in ONE agg (Spark plans the
    multi-distinct via Expand — one shuffle total). Sums accumulate as
    DECIMAL(25,6) per the engine-wide money contract (bit-stable under
    partial-agg order, overflow-safe at 100 TB); production flips
    approx=True for HLL distinct counts (map-only mergeable state, no
    Expand) — the exact path here IS the oracle baseline."""
    return column_profile(table(spark, sf_dir, "lineitem"), _PROFILE_COLS)
