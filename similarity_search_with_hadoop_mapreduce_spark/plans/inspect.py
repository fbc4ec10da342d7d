"""Physical-plan introspection — the feedback loop for scale design.

The reference hand-fused its plan in Java, so its "optimizations" were
frozen at authoring time (SURVEY §4.1). Here the optimizer owns the plan,
and these helpers turn `.explain` output into assertable facts: how many
shuffle exchanges a query pays, whether the small side broadcast, whether
filters and projections reached the parquet scan. tests/test_plans.py
pins those facts so a refactor that silently adds a shuffle or breaks
pushdown fails CI — plan quality as a regression test, not a hope.

There are deliberately no custom Catalyst rules or strategies anywhere in
this engine: nothing in the reference's surface needs them (SURVEY §4.3);
declarative DataFrame plans + AQE cover it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The string ``df.explain(mode)`` would print."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (hash/range/single-partition/
    round-robin) in the physical plan — each is a full network/disk
    barrier, the unit of cost that matters first at 100 TB."""
    plan = explain_string(df, "simple")
    # standalone "Exchange <partitioning>" nodes; \b does not split the
    # contiguous word "BroadcastExchange", so those are excluded naturally
    return len(
        re.findall(
            r"\bExchange (?:hash|range|SinglePartition|RoundRobin)", plan
        )
    )


def broadcast_exchange_count(df: DataFrame) -> int:
    """Broadcast exchanges — small sides shipped to every executor
    instead of shuffling the big side."""
    return len(re.findall(r"BroadcastExchange", explain_string(df, "simple")))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans; wider/fewer is better (more of
    the plan fused into generated JVM loops)."""
    ids = set(
        re.findall(r"codegen id : (\d+)", explain_string(df, "formatted"))
    )
    return len(ids)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` entry reaching a datasource scan."""
    out: list[str] = []
    for m in re.finditer(
        r"PushedFilters: \[([^\]]*)\]", explain_string(df, "formatted")
    ):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The ``ReadSchema`` of each scan — what column pruning actually
    reads off disk (a 2-column projection must not scan 16 columns)."""
    return re.findall(r"ReadSchema: (\S+)", explain_string(df, "formatted"))


# ---------------------------------------------------------------------------
# Scale audit: the 100-TB checklist as a runnable lint. The shapes below
# are exactly the ones that pass a 60k-row test and die on a cluster —
# auditing the physical plan catches them at review time, executing at
# small SF never will.
# ---------------------------------------------------------------------------

_AUDIT_RULES: list[tuple[str, str, str, str]] = [
    # (code, severity, plan-substring regex, what it means at scale)
    (
        "cartesian_product",
        "fatal",
        r"CartesianProduct",
        "all-pairs join: O(|L|x|R|) rows — never survives a scale-up",
    ),
    (
        "nested_loop_join",
        "warn",
        r"BroadcastNestedLoopJoin",
        "non-equi join evaluated row-by-row against a broadcast side: "
        "O(|stream| x |broadcast|) — fatal when the broadcast side is "
        "data-sized (rewrite as an equi/range join, the bucketed "
        "theta-join pattern); linear and fine when it is a one-row / "
        "scalar side (the single-query top-k pattern)",
    ),
    (
        "python_row_udf",
        "fatal",
        r"BatchEvalPython",
        "row-at-a-time Python UDF on the data path — 10-100x slower than "
        "built-ins or Arrow (ArrowEvalPython / mapInPandas are exempt)",
    ),
    (
        "single_partition_exchange",
        "warn",
        r"Exchange SinglePartition",
        "the whole stream funnels through ONE task (global sort / window "
        "without partitionBy / coalesce(1)); fine on a scalar or "
        "pre-aggregated stream, fatal on data-sized input — check which "
        "this is",
    ),
    (
        "global_sort",
        "warn",
        r"Exchange rangepartitioning",
        "global range sort: a full shuffle whose only consumers should "
        "be ordered sinks or top-k (TakeOrderedAndProject needs no "
        "global sort) — drop the orderBy if downstream re-shuffles "
        "anyway",
    ),
]


def _non_scalar_single_partition_count(plan: str) -> int:
    """``Exchange SinglePartition`` nodes whose consumer is NOT a no-keys
    (scalar) aggregate. A scalar aggregate's final step is definitionally
    one row per upstream partition funneling into one task — the pattern
    every global count/sum compiles to and never a scale problem. A
    single-partition exchange under a Sort / Window / anything else means
    the actual data stream serializes through one task — that is the
    finding. The consumer is the nearest preceding tree line with
    shallower indentation (simple-mode explain prints parents above
    children; the indent strip set must include the ``:`` / ``|``
    continuation rails a multi-child subtree draws, or every node under
    such a rail reads as the same depth and the true parent is skipped)."""
    lines = plan.splitlines()
    tree_depth = lambda s: len(s) - len(s.lstrip(" :|+-*"))
    n = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        indent = tree_depth(line)
        parent = None
        for j in range(i - 1, -1, -1):
            pj = lines[j]
            if not pj.strip():
                continue
            if tree_depth(pj) < indent:
                parent = pj
                break
        if parent is not None and re.search(
            r"Aggregate\w*\(keys=\[\]", parent
        ):
            continue  # scalar aggregate: fine by construction
        n += 1
    return n


def scale_audit(df: DataFrame) -> list[dict]:
    """Lint a query's physical plan for shapes that work at test SF and
    fail at 100 TB. Returns one finding per matched rule:
    ``{"code", "severity", "count", "detail"}`` — ``fatal`` findings are
    scale-killers by construction; ``warn`` findings are legitimate on
    small/pre-aggregated streams and must be justified, which is why the
    audit reports instead of guessing. Pure plan inspection: nothing is
    executed."""
    plan = explain_string(df, "simple")
    findings = []
    for code, severity, pattern, detail in _AUDIT_RULES:
        if code == "single_partition_exchange":
            n = _non_scalar_single_partition_count(plan)
        else:
            n = len(re.findall(pattern, plan))
        if n:
            findings.append(
                {
                    "code": code,
                    "severity": severity,
                    "count": n,
                    "detail": detail,
                }
            )
    return findings


def assert_scalable(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise ``AssertionError`` listing every :func:`scale_audit` finding
    not named in ``allow`` — the CI form of the audit (warn findings an
    operator intends, e.g. a documented global sort in an ordered sink,
    are allow-listed at the call site, which doubles as documentation)."""
    findings = [f for f in scale_audit(df) if f["code"] not in allow]
    if findings:
        lines = [
            f"[{f['severity']}] {f['code']} x{f['count']}: {f['detail']}"
            for f in findings
        ]
        raise AssertionError(
            "plan fails the scale audit:\n  " + "\n  ".join(lines)
        )
