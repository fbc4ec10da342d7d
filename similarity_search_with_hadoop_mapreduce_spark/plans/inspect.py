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
