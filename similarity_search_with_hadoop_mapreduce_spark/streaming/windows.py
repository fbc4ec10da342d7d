"""Event-time windowed aggregation — batch and Structured Streaming.

The reference is strictly batch (two blocking MR jobs,
``BookQuery.java:242,257``); this is the extension surface
(SURVEY.md §7.4). The window functions below are *shared* between batch
and streaming: ``F.window`` / ``F.session_window`` have identical
semantics in both modes, so the oracle-checked batch queries certify the
same logic the streaming pipeline runs.

Streaming design points demonstrated in :func:`streaming_tumbling_demo`:

- file source with an explicit schema (streaming readers never infer);
  :func:`events_stream` normalizes the fixture's ``ts`` (TIMESTAMP(NANOS)
  raw longs or TIMESTAMP(MICROS) NTZ, depending on fixture vintage) to a
  session-tz timestamp in the plan
- ``withWatermark`` bounds state: windows older than the watermark are
  finalized and evicted — on an unbounded 100 TB/day stream this is what
  keeps the state store finite
- ``trigger(availableNow=True)`` drains the backlog incrementally and
  stops — the batch-backfill pattern
- append output mode: only finalized (watermark-expired) windows emit,
  so downstream sinks see each window exactly once
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _events_schema(ts_field: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming reader for the events fixture with an explicit schema
    (streaming readers never infer), normalizing ``ts`` to a session-tz
    (UTC) timestamp.

    Dtype-aware like the batch ``load_table``: a TIMESTAMP(NANOS) fixture
    arrives as raw longs (``nanosAsLong``) and is rebuilt to microseconds;
    a TIMESTAMP(MICROS) fixture arrives as TIMESTAMP_NTZ and is cast.
    File stream sources require a *directory*, so the scan glob-filters
    ``sf_dir`` down to the one table file.
    """
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        events_ts_type,
    )

    ts_t = events_ts_type(sf_dir)
    if ts_t == "timestamp[us]":
        ts_field, conv = T.TimestampNTZType(), F.col("ts").cast("timestamp")
    elif ts_t.startswith("timestamp[us"):
        ts_field, conv = T.TimestampType(), F.col("ts")
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ts_field, conv = T.LongType(), F.expr("timestamp_micros(ts div 1000)")
    return (
        spark.readStream.schema(_events_schema(ts_field))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", conv)
    )


def _dsum(col):
    return F.sum(F.col(col).cast("decimal(25,6)")).cast("double")


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event type: count + value sum."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows (width > slide ⇒ each event lands in
    width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows: a session closes after ``gap`` of
    inactivity; window end = last event + gap (Spark session semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_tumbling_demo(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
    width: str = "1 hour",
) -> DataFrame:
    """Run the tumbling aggregation as a real Structured Streaming query
    over the events parquet (availableNow backfill → memory sink) and
    return the materialized result.

    Append mode + watermark means the last (never-expired) windows are
    withheld — exactly the at-most-once-per-window contract a production
    sink wants; completeness comes from the next arriving batch advancing
    the watermark.
    """
    raw = events_stream(spark, sf_dir)
    agg = tumbling_agg(raw.withWatermark("ts", watermark), width=width)
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def interval_join(
    left: DataFrame, right: DataFrame, within: str = "30 minutes"
) -> DataFrame:
    """Per-user click→purchase conversion pairs: every purchase within
    ``within`` after a click by the same user.

    Shared batch/streaming logic — in streaming, the equi key (user_id)
    drives the state partitioning and the time-range condition bounds how
    long each side's rows stay in the join state (with watermarks set by
    the caller). In batch, Catalyst plans the same thing as an equi join
    with a range residual — no nested loop.
    """
    a = left.select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    b = right.select(
        F.col("user_id").alias("purchase_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        a.join(
            b,
            (F.col("click_user") == F.col("purchase_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        )
        .select(
            F.col("click_user").alias("user_id"),
            "click_id",
            "purchase_id",
            "click_ts",
            "purchase_ts",
            "purchase_value",
        )
    )


def streaming_interval_join_demo(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
    within: str = "30 minutes",
) -> DataFrame:
    """True stream-stream inner join (clicks ⋈ purchases per user within
    a time bound), availableNow → memory sink.

    Both sides carry a watermark and the join condition bounds event time
    in both directions, so Spark can size the join state finitely and
    evict rows the watermark has passed — the requirement for unbounded
    stream-stream joins. Inner-join output emits as matches arrive, so
    (unlike append-mode aggregation) the availableNow backfill emits every
    match, and the batch interval_join is a full-value oracle for it.
    """
    raw = events_stream(spark, sf_dir)
    clicks = raw.filter(F.col("event_type") == "click").withWatermark(
        "ts", watermark
    )
    purchases = raw.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    joined = interval_join(clicks, purchases, within=within)
    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_static_enrich_demo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static join: the events stream enriched with the customer
    dim (user_id = c_custkey), availableNow → memory sink.

    The static side needs no watermark and keeps no join state — each
    micro-batch plans a fresh broadcast join against the (small) dim, so
    dim updates between batches are picked up automatically. This is the
    standard streaming-enrichment topology; state cost is zero on both
    sides, unlike the stream-stream interval join.
    """
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import load_table

    raw = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    enriched = raw.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "value", "c_name", "c_mktsegment"
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_foreach_batch_demo(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """``foreachBatch`` sink: stream events into a parquet directory via a
    per-micro-batch batch write — the production escape hatch for sinks
    Structured Streaming has no native connector for (JDBC upserts, MERGE
    into a table format, multi-sink fan-out).

    Exactly-once comes from idempotence, not the sink: each micro-batch
    lands in a ``batch_id=<epoch>`` partition with ``overwrite`` of that
    partition only (dynamic partitionOverwriteMode), so a replayed epoch
    after a crash overwrites its own output instead of duplicating it.
    The checkpoint dir tracks which epochs are committed.
    """
    raw = events_stream(spark, sf_dir)

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    q = (
        raw.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", f"{out_path}_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
