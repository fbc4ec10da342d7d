"""Windowed event-time queries, oracle-checked in batch mode.

``F.window``/``F.session_window`` behave identically in batch and
streaming, so these oracles certify the exact logic
``streaming/windows.py`` runs under Structured Streaming (the true
streaming execution — watermark, availableNow, append mode — is
exercised in tests/test_streaming.py). The stateful running-totals entry
uses an order-independent integer accumulator so even that streaming run
carries a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table
from similarity_search_with_hadoop_mapreduce_spark.streaming import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

_VSUM = "CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)"


@register(
    "events_tumbling_window",
    oracle=f"""
SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
       CAST(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {_VSUM} AS total_value
FROM events
GROUP BY 1, 2, 3
""",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event type."""
    return tumbling_agg(table(spark, sf_dir, "events"))


@register(
    "events_ohlc",
    oracle="""
WITH b AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT event_type, bucket_start,
       max(CASE WHEN ra = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rd = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_events
FROM b GROUP BY 1, 2
""",
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling per (event_type, hour) — the classic
    hypertable resample: one aggregation exchange, open/close via
    min_by/max_by on the (ts, event_id) struct so same-timestamp ties
    break deterministically (the oracle replays the tie rule with
    dual row_number ranks)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        ohlc_downsample,
    )

    return ohlc_downsample(table(spark, sf_dir, "events"))


@register(
    "events_sliding_window",
    oracle=f"""
WITH assigned AS (
  SELECT unnest([CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP),
                 CAST(time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS TIMESTAMP)])
           AS window_start,
         value
  FROM events
)
SELECT window_start,
       CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
       CAST(count(*) AS BIGINT) AS n_events,
       {_VSUM} AS total_value
FROM assigned
GROUP BY 1, 2
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows);
    the oracle assigns both windows per event explicitly."""
    return sliding_agg(table(spark, sf_dir, "events"))


@register(
    "events_session_window",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) + INTERVAL 10 MINUTE AS TIMESTAMP) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       {_VSUM} AS total_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (10-minute inactivity gap); the oracle is
    the classic gaps-and-islands rewrite, certifying Spark's
    session_window semantics (end = last event + gap)."""
    return session_agg(table(spark, sf_dir, "events"))


@register(
    "streaming_dedup",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
       value, props
FROM events
""",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming execution: dropDuplicatesWithinWatermark over a
    readStream file source (availableNow). Fixture event ids are unique,
    so the streamed, state-deduped output must equal the full table —
    giving even this streaming *run* a full-value oracle."""
    from similarity_search_with_hadoop_mapreduce_spark.streaming.stateful import (
        streaming_dedup_demo,
    )

    return streaming_dedup_demo(spark, sf_dir)


@register(
    "streaming_user_running_totals",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY user_id
""",
)
def streaming_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, integer-cent sum) folded across micro-batches, run as a real
    availableNow stream. The *final* state per user is order-independent
    (integer accumulator), so the last update-mode emit per user equals the
    batch aggregate exactly — giving this stateful streaming run a full
    value-hash oracle."""
    from similarity_search_with_hadoop_mapreduce_spark.streaming.stateful import (
        streaming_user_totals_demo,
    )

    return streaming_user_totals_demo(spark, sf_dir)


@register(
    "events_interval_join",
    oracle="""
SELECT a.user_id,
       a.event_id AS click_id,
       b.event_id AS purchase_id,
       CAST(a.ts AS TIMESTAMP) AS click_ts,
       CAST(b.ts AS TIMESTAMP) AS purchase_ts,
       b.value AS purchase_value
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
""",
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (click→purchase within 30 min per user),
    batch-certified; the identical logic runs as a true stream-stream
    join with two watermarks in tests/test_streaming.py."""
    from similarity_search_with_hadoop_mapreduce_spark.streaming.windows import (
        interval_join,
    )

    e = table(spark, sf_dir, "events")
    return interval_join(
        e.filter("event_type = 'click'"),
        e.filter("event_type = 'purchase'"),
    )


@register(
    "events_gaps_and_islands",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
labeled AS (
  SELECT user_id, event_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end
FROM labeled
GROUP BY user_id, session_id
""",
)
def events_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: lag to mark gap starts, a
    conditional running sum to label islands, then a per-island rollup —
    the windowed formulation of what ``session_window`` computes natively
    (events_session_window), exposed because the technique generalizes to
    any island predicate (price regimes, sensor dropouts), not just time
    gaps. One exchange on user_id; both windows and the final aggregate
    reuse that partitioning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(prev)
            > 30 * 60 * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
