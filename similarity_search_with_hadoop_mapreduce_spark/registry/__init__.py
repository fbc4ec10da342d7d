"""Query registry: every implemented operator gets a named ``queries()``
entry (a ``(spark, sf_dir) -> DataFrame`` callable) and, where ANSI-SQL
expressible, a DuckDB ``oracle_sql()`` string computing the same result on
the same parquet tables.

Column-name discipline: every computed column is aliased identically on
both sides — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from similarity_search_with_hadoop_mapreduce_spark.registry.base import (
    ORACLES,
    QUERIES,
    register,
)

# Importing the domain modules populates QUERIES / ORACLES.
from similarity_search_with_hadoop_mapreduce_spark.registry import sim  # noqa: E402,F401
from similarity_search_with_hadoop_mapreduce_spark.registry.sim import flagship  # noqa: E402

__all__ = ["QUERIES", "ORACLES", "register", "flagship"]


for _mod in (
    "relational",
    "dedup",
    "ann",
    "textstats",
    "multimodal",
    "streaming_q",
    "curation",
    "tpch_partsupp",
):
    __import__(f"similarity_search_with_hadoop_mapreduce_spark.registry.{_mod}")
