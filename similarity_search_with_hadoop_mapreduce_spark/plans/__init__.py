from similarity_search_with_hadoop_mapreduce_spark.plans.inspect import (
    assert_scalable,
    broadcast_exchange_count,
    codegen_stage_count,
    explain_string,
    pushed_filters,
    read_schemas,
    scale_audit,
    shuffle_exchange_count,
)

__all__ = [
    "explain_string",
    "shuffle_exchange_count",
    "broadcast_exchange_count",
    "codegen_stage_count",
    "pushed_filters",
    "read_schemas",
    "scale_audit",
    "assert_scalable",
]
