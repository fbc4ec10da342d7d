"""Sinks: the reference's output contract, plus general writers.

The reference's only sink is Hadoop ``TextOutputFormat`` — ``key\\tvalue``
text lines — written by both jobs (``BookQuery.java:234-240,251-255``);
Job 2's key is the packed pair string ``"doc - query"``
(``BookQuery.java:167``). Queries in this engine return DataFrames and
leave persistence to the caller (SURVEY §2.2 S7); these helpers cover the
byte-level parity case and the common columnar case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_output_format(
    scores: DataFrame, query_id: str = "query"
) -> DataFrame:
    """``(pair, score)`` rows matching the reference's Job-2 output: pair
    is ``"<doc_id> - <query_id>"`` (``BookQuery.java:167``). The score
    stays a typed double — the tab-joined text rendering happens in
    :func:`write_reference_output`, where Spark's double→string cast uses
    Java ``Double.toString`` exactly like the reference's ``Text`` output.
    """
    return scores.select(
        F.concat_ws(
            " - ", F.col("doc_id").cast("string"), F.col("query_id")
        ).alias("pair"),
        F.col("score"),
    )


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: tab-separated text files, one line per row, no header — the
    ``TextOutputFormat`` wire format."""
    df.select(
        [F.col(c).cast("string").alias(c) for c in df.columns]
    ).write.option("sep", "\t").option("header", "false").mode(mode).csv(path)


def write_reference_output(
    scores: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """End-to-end parity sink: ``doc - query\\tscore`` text lines, the
    reference's final on-disk artifact."""
    write_tsv(reference_output_format(scores), path, mode=mode)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """The production sink: columnar, splittable, predicate-pushdown-able.
    ``partition_by`` is the 100 TB lever — e.g. partition embeddings by
    LSH bucket so similarity search prunes to one partition."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """Interchange sink: splittable plain CSV (one file per partition)."""
    df.write.option("header", str(header).lower()).mode(mode).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the lingua franca for downstream non-JVM
    consumers; one object per line keeps the output splittable."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib-compressed by default) — same columnar guarantees
    as :func:`write_parquet` (splittable files, min/max stripe stats for
    reader-side skipping) for Hive-era consumers."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_range_partitioned(
    df: DataFrame,
    path: str,
    key: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Layout sink for scan pruning: range-repartition on ``key`` and sort
    within each partition before writing parquet.

    The output files cover disjoint key ranges and every row group's
    min/max stats are tight, so any reader (Spark, DuckDB, Trino — the
    stats are in the format) skips whole files/row groups on a range or
    point predicate over ``key``. At 100 TB this is the cheapest pruning
    there is: it costs one sort at write time and nothing at read time.
    (``write_bucketed`` in operators/skew.py is the hash analog for equi
    joins; this is the ordered analog for ranges and time.)
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode(mode)
        .parquet(path)
    )
