from similarity_search_with_hadoop_mapreduce_spark.functions.text import (
    java_split_tokens,
    shingles,
    trigrams,
)
from similarity_search_with_hadoop_mapreduce_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "java_split_tokens",
    "trigrams",
    "shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
