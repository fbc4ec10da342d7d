"""True Structured Streaming execution (readStream → watermark → window →
availableNow → memory sink) vs the identical batch aggregation.

Append mode only emits windows the final watermark has passed, so the
streaming result must equal the batch result restricted to windows with
``window_end <= max(ts) - watermark``."""

from __future__ import annotations

from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.sources.tables import load_table
from similarity_search_with_hadoop_mapreduce_spark.streaming.windows import (
    streaming_tumbling_demo,
    tumbling_agg,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_matches_batch_for_closed_windows(spark):
    got = streaming_tumbling_demo(spark, SF_DIR, watermark="2 hours")
    events = load_table(spark, SF_DIR, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = tumbling_agg(events)
    closed = batch.filter(
        F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    key = lambda r: (r.window_start, r.event_type)
    want = {key(r): (r.n_events, r.total_value) for r in closed.collect()}
    have = {key(r): (r.n_events, r.total_value) for r in got.collect()}
    assert want == have
    assert len(have) > 0
