"""Unit tests for operators/validate.py — the data-quality gate.

The semantics pinned here (small in-memory frames, exact expected
values):
- a rule violation is "expression NOT TRUE" — false AND NULL both count;
- uniqueness groups NULL key components together (null-keyed rows
  surface as duplicates rather than vanishing);
- fk_orphans reports NULL child keys (an anti-join alone would drop
  them) and counts multiplicities;
- null_frac follows the midpoint-free integer-div quantization;
- everything is one scan / one report, nothing collected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators.validate import (
    check_rules,
    check_unique,
    column_profile,
    duplicate_keys,
    fk_orphans,
    null_profile,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -5.0),
        (3, None, 7.0),
        (4, "a", None),
        (4, "a", 2.0),  # duplicate id
    ]
    return spark.createDataFrame(rows, "id bigint, tag string, v double")


def test_check_rules_not_true_semantics(frame):
    rep = {
        r["check"]: r.asDict()
        for r in check_rules(
            frame,
            [
                ("v_positive", "v > 0"),  # -5 false, NULL null -> 2
                ("tag_known", "tag IN ('a','b')"),  # NULL tag -> 1
                ("id_positive", "id > 0"),  # all pass
            ],
        ).collect()
    }
    assert rep["v_positive"]["violations"] == 2
    assert rep["v_positive"]["n_rows"] == 5
    assert rep["v_positive"]["passed"] is False
    assert rep["tag_known"]["violations"] == 1
    assert rep["id_positive"]["violations"] == 0
    assert rep["id_positive"]["passed"] is True


def test_check_unique_counts_and_null_keys(spark, frame):
    row = check_unique(frame, ["id"]).collect()[0]
    assert row["check"] == "unique:id"
    assert row["n_keys"] == 4
    assert row["dup_keys"] == 1
    assert row["dup_rows"] == 2
    assert row["passed"] is False

    # NULL key components group together -> surface as a duplicate key
    nulled = spark.createDataFrame(
        [(None, 1), (None, 2), (3, 3)], "k bigint, x bigint"
    )
    row = check_unique(nulled, ["k"]).collect()[0]
    assert row["n_keys"] == 2
    assert row["dup_keys"] == 1
    assert row["dup_rows"] == 2


def test_duplicate_keys_report(frame):
    rows = duplicate_keys(frame, ["id"], limit=10).collect()
    assert [(r["id"], r["n_rows"]) for r in rows] == [(4, 2)]


def test_fk_orphans_counts_and_null_bucket(spark):
    child = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "z"), (99, "w"), (None, "n"), (None, "m")],
        "fk bigint, payload string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    rows = {
        (r["orphan_key"],): r["n_rows"]
        for r in fk_orphans(child, parent, "fk", "pk").collect()
    }
    assert rows == {(99,): 1, (None,): 2}


def test_null_profile_quantization(spark):
    # 1 null of 3 rows -> floor(1e6/3)/1e6 = 0.333333 exactly
    df = spark.createDataFrame([("a",), (None,), ("b",)], "s string")
    row = null_profile(df, ["s"]).collect()[0]
    assert row["column"] == "s"
    assert row["n_rows"] == 3
    assert row["n_null"] == 1
    assert row["null_frac"] == 0.333333


def test_column_profile_exact(spark):
    df = spark.createDataFrame(
        [(1.5,), (2.5,), (2.5,), (None,)], "v double"
    )
    row = column_profile(df, ["v"]).collect()[0]
    assert row["column"] == "v"
    assert row["n_rows"] == 4
    assert row["n_null"] == 1
    assert row["n_distinct"] == 2
    assert row["min_v"] == 1.5
    assert row["max_v"] == 2.5
    assert row["sum_v"] == 6.5


def test_column_profile_approx_mode(spark):
    # approx=True swaps exact countDistinct for HLL; on tiny cardinality
    # the sketch is exact, and the rest of the profile is unchanged.
    df = spark.createDataFrame([(float(i % 3),) for i in range(30)], "v double")
    exact = column_profile(df, ["v"]).collect()[0]
    approx = column_profile(df, ["v"], approx=True).collect()[0]
    assert approx["n_distinct"] == exact["n_distinct"] == 3
    assert approx["sum_v"] == exact["sum_v"]


def test_single_scan_plans(frame):
    """check_rules / null_profile stay map-only single-aggregate plans:
    no join, no generate-explode, exactly one aggregate subtree pair
    (partial+final) over one scan."""
    for rep in (
        check_rules(frame, [("a", "v > 0"), ("b", "id > 1")]),
        null_profile(frame),
    ):
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        # one scan of the input relation
        assert plan.count("Scan ExistingRDD") <= 1


def test_fk_orphans_moves_keys_not_rows(spark):
    """The child side is pre-aggregated to distinct keys BEFORE the
    anti-join: the join's left input carries (key, count), never the
    child's payload columns."""
    child = spark.createDataFrame([(1, "p" * 10)], "fk bigint, payload string")
    parent = spark.createDataFrame([(1,)], "pk bigint")
    plan = (
        fk_orphans(child, parent, "fk", "pk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # payload may appear in the Scan node text (in-memory scans print
    # every column), but no operator above the scan may carry it: the
    # Project that feeds the aggregate drops it before any exchange.
    carried = [
        ln for ln in plan.splitlines()
        if "payload" in ln and "Scan ExistingRDD" not in ln
    ]
    assert carried == [], carried
    assert "LeftAnti" in plan


def test_rule_names_with_quotes_are_escaped(spark):
    """ADVICE r9: caller-supplied check/rule names are interpolated into
    the stack() SQL as string literals — a quote or backslash must come
    back verbatim in the report, not parse-error or splice into the
    generated expression."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.validate import (
        check_rules,
        null_profile,
    )

    df = spark.createDataFrame([(1,), (None,)], "v int")
    weird = "o'brien's \\ rule `x`"
    rows = {r.check: r.violations
            for r in check_rules(df, [(weird, "v > 0")]).collect()}
    assert rows == {weird: 1}  # NULL v violates; name round-trips exactly

    # null_profile interpolates COLUMN names as literals the same way
    df2 = spark.range(3).select(F.col("id").alias("a"))
    out = null_profile(df2, ["a"]).collect()
    assert out[0].column == "a" and out[0].n_null == 0
