"""Data-quality validation: one-pass constraint reports for ingest gates.

A 100-TB training-data pipeline runs validation as a *gate* between
ingest and every downstream stage (dedup, scoring, packing): nulls where
the schema says none, keys that stopped being unique, facts pointing at
dimension rows that do not exist, values outside contract bounds. The
reference engine has no such stage (its one job trusts its inputs,
``BookQuery.java:181-189`` just exits on arity); this module is part of
the extension tier that makes the engine usable as a pipeline.

Design for scale (the whole point of each shape):

- :func:`check_rules` and :func:`null_profile` are **single-scan,
  map-only aggregations** — every rule/column becomes one conditional
  counter in ONE ``agg`` over the table, so N rules cost one pass, not
  N. Partial aggregation means each task ships a handful of longs; the
  final exchange moves O(1) rows. The wide one-row aggregate is then
  unpivoted driver-free with ``stack`` into the tidy report.
- :func:`check_unique` is one hash-aggregate on the key (map-side
  partial combine collapses each task's slice first); the report is the
  O(1) rollup, not the duplicate rows themselves —
  :func:`duplicate_keys` returns those separately when a caller wants
  to inspect, bounded by an explicit ``limit``.
- :func:`fk_orphans` is a **left-anti join**: broadcast when the parent
  is a dimension under the session threshold, shuffle-copartitioned
  otherwise — Catalyst/AQE pick per stats, nothing is collected.
- :func:`column_profile` puts min/max/exact-distinct/exact-decimal-sum
  in one ``agg``; Spark plans multi-distinct via Expand (one shuffle).
  At 100 TB the production dial is ``approx_count_distinct`` (HLL,
  no Expand blowup) — exposed via ``approx=True``; the exact path is
  the oracle baseline. Sums go through DECIMAL(25,6) like every money
  accumulator in the engine (bit-stable under partial-agg order,
  overflow-safe past sf10 — see registry/relational.py).

Null semantics contract (pinned in the oracle and tests): a rule is a
boolean SQL expression; a row **violates** the rule when the expression
is NOT TRUE (false *or* NULL) — i.e. three-valued logic never lets a
NULL slip through a gate. DuckDB spells it ``expr IS NOT TRUE``; the
Spark side counts ``when(expr, 0).otherwise(1)`` whose ``otherwise``
catches NULL the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "null_profile",
    "check_rules",
    "check_unique",
    "duplicate_keys",
    "fk_orphans",
    "column_profile",
]


def _stack_report(one_row: DataFrame, names: list[str], cols: list[str],
                  out: list[str]) -> DataFrame:
    """Unpivot a one-row wide aggregate into (name, *out) tidy rows.

    ``stack`` is a plain generator expression — no shuffle, no Python;
    the input is literally one row so this is driver-negligible work
    that keeps the report schema stable no matter how many checks ran.

    ``names`` are caller-supplied (rule/column names) and are
    interpolated as SQL string literals, so they are escaped here —
    a quote or backslash in a check name must surface verbatim in the
    report, not parse-error or splice into the generated expression
    (ADVICE r9). The backtick-quoted identifiers are module-internal
    (``{col}_{i}`` over fixed col lists), never caller input.
    """
    n = len(names)

    def lit(s: str) -> str:
        # Spark SQL string literal: backslash is the escape char and
        # single quote ends the literal — escape both.
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    cells = ", ".join(
        ", ".join([lit(names[i])] + [f"`{c}_{i}`" for c in cols])
        for i in range(n)
    )
    alias = ", ".join(["check"] + out)
    return one_row.selectExpr(f"stack({n}, {cells}) AS ({alias})")


def null_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column null census in ONE scan.

    Returns ``(column, n_rows, n_null, null_frac)`` — one row per
    profiled column. ``null_frac`` follows the engine-wide midpoint-free
    quantization contract (SCALE.md): exact integer division
    ``(n_null * 10^6) div n_rows`` then one exact double divide by 10^6
    — never ``round(double, 6)``, whose half-way behavior differs across
    engines.
    """
    cols = cols or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{i}")
        )
    wide = df.agg(*aggs)
    # ride n_rows alongside each column's counter so stack emits it per row
    wide = wide.select(
        "*", *[F.col("n_rows").alias(f"n_rows_{i}") for i in range(len(cols))]
    )
    rep = _stack_report(wide, cols, ["n_rows", "n_null"], ["n_rows", "n_null"])
    return rep.select(
        F.col("check").alias("column"),
        "n_rows",
        "n_null",
        (F.expr("(n_null * 1000000) div n_rows") / F.lit(1000000.0)).alias(
            "null_frac"
        ),
    )


def check_rules(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Evaluate boolean-SQL row rules in ONE scan.

    ``rules`` is ``[(name, sql_bool_expr), ...]``; a row violates a rule
    when the expression is NOT TRUE (false or NULL — see module
    docstring). Returns ``(check, violations, n_rows, passed)``.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    names = []
    for i, (name, expr) in enumerate(rules):
        names.append(name)
        aggs.append(
            F.sum(F.when(F.expr(expr), 0).otherwise(1)).alias(f"violations_{i}")
        )
    wide = df.agg(*aggs)
    wide = wide.select(
        "*", *[F.col("n_rows").alias(f"n_rows_{i}") for i in range(len(names))]
    )
    rep = _stack_report(
        wide, names, ["violations", "n_rows"], ["violations", "n_rows"]
    )
    return rep.select(
        "check",
        "violations",
        "n_rows",
        (F.col("violations") == 0).alias("passed"),
    )


def check_unique(df: DataFrame, keys: list[str], check: str | None = None) -> DataFrame:
    """Key-uniqueness rollup: ONE hash-aggregate on ``keys`` then an O(1)
    summary — ``(check, n_keys, dup_keys, dup_rows, passed)``.

    Map-side partial combine collapses each task's slice before the key
    exchange; the second aggregate sees one row per distinct key. Null
    key components group together (standard GROUP BY), so null-keyed
    rows surface as duplicates rather than vanishing.
    """
    name = check or ("unique:" + ",".join(keys))
    per_key = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_key.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("dup_keys"),
        F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)).alias("dup_rows"),
    ).select(
        "check", "n_keys", "dup_keys", "dup_rows",
        (F.col("dup_keys") == 0).alias("passed"),
    )


def duplicate_keys(df: DataFrame, keys: list[str], limit: int = 100) -> DataFrame:
    """The inspection companion to :func:`check_unique`: the duplicated
    key tuples themselves with their multiplicities, largest first,
    bounded by ``limit`` (a TakeOrdered — never an unbounded collect)."""
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
        .orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
        .limit(limit)
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    limit: int | None = None,
) -> DataFrame:
    """Referential-integrity probe: distinct child keys with no parent.

    A left-anti join — Catalyst broadcasts the parent when it is a
    dimension under the session auto-broadcast threshold, otherwise AQE
    shuffles both sides co-partitioned on the key; either way nothing
    reaches the driver. NULL child keys are reported (they reference
    nothing) — an anti-join would drop them since ``NULL = x`` is never
    true, so they are counted via a union'd null bucket.

    Returns ``(orphan_key, n_rows)`` distinct orphan keys with their
    row multiplicity, ordered by multiplicity then key when ``limit``
    is set (otherwise unordered, for full-report aggregation upstream).
    """
    per_key = child.groupBy(F.col(child_key).alias("orphan_key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    nulls = per_key.filter(F.col("orphan_key").isNull())
    orphans = per_key.filter(F.col("orphan_key").isNotNull()).join(
        parent.select(F.col(parent_key).alias("orphan_key")).distinct(),
        "orphan_key",
        "left_anti",
    )
    out = orphans.unionByName(nulls)
    if limit is not None:
        out = out.orderBy(F.col("n_rows").desc(), "orphan_key").limit(limit)
    return out


def column_profile(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Numeric column profile in ONE agg: ``(column, n_rows, n_null,
    n_distinct, min_v, max_v, sum_v)``.

    min/max/sum are emitted as DOUBLE after exact DECIMAL(25,6)
    accumulation of the sum (bit-stable under partial-agg order — the
    engine-wide money contract). Exact multi-column countDistinct plans
    via Expand (input replicated once per distinct agg, one shuffle) —
    fine for a profile pass; at 100 TB set ``approx=True`` for HLL
    sketches (``approx_count_distinct``, map-only mergeable state, no
    Expand) at ~2% relative error. The exact path is the oracle
    baseline; the approx path is the production dial.
    """
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"n_null_{i}"),
            distinct(col).alias(f"n_distinct_{i}"),
            F.min(col).cast("double").alias(f"min_v_{i}"),
            F.max(col).cast("double").alias(f"max_v_{i}"),
            F.sum(col.cast("decimal(25,6)")).cast("double").alias(f"sum_v_{i}"),
        ]
    wide = df.agg(*aggs)
    wide = wide.select(
        "*", *[F.col("n_rows").alias(f"n_rows_{i}") for i in range(len(cols))]
    )
    rep = _stack_report(
        wide,
        cols,
        ["n_rows", "n_null", "n_distinct", "min_v", "max_v", "sum_v"],
        ["n_rows", "n_null", "n_distinct", "min_v", "max_v", "sum_v"],
    )
    return rep.withColumnRenamed("check", "column")
