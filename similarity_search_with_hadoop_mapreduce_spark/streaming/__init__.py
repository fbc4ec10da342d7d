from similarity_search_with_hadoop_mapreduce_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    streaming_tumbling_demo,
    tumbling_agg,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "streaming_tumbling_demo",
]
