"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``similarity_search_with_hadoop_mapreduce_spark/``;
this module only assembles the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from similarity_search_with_hadoop_mapreduce_spark.registry import (
    CURATED_ORACLES,
    CURATED_QUERIES,
    flagship,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: trigram containment similarity of every document
    against the query document (doc_id=0), reference-parity semantics,
    ranked by score. See operators/similarity.py for the 2-shuffle plan.
    """
    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The curated ≤50-entry surface covering every implemented operator
    from SURVEY.md §2 (+ extensions): fine-grained micro-operators are
    folded into tagged-union / wide-merge entries that pin the same values
    (registry/folds.py; member map in COVERAGE.md), so the driver's
    ~50-row correctness artifact verifies the whole surface.

    Each callable takes (spark, sf_dir) and returns a DataFrame; computed
    columns are aliased identically in the Spark code and the oracle SQL.
    """
    return dict(CURATED_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each key in ``queries()``.

    Keys absent here (non-SQL-expressible ops) get the driver's weaker
    rows-only check. (Round 2+: every curated key carries an oracle.)
    """
    return dict(CURATED_ORACLES)
