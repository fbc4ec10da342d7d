"""PySpark-native analytics engine with the query/data-processing surface of
the reference `Trung2204/Similarity-Search-with-Hadoop-MapReduce` repo
(a 2-job Hadoop MapReduce trigram-containment similarity pipeline,
``BookQuery/src/main/java/BookQuery.java``), rebuilt Spark-first:

- DataFrame/SQL logical plans, Catalyst/Tungsten physical execution
- zero Python UDFs on the hot path (all native expressions)
- the reference's two HDFS-materialized jobs collapse into one lazy DAG
  with exactly two shuffle exchanges (term group-by, doc-pair group-by)

Plus the extension surface a 100 TB training-data pipeline needs:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis,
multimodal binary-column plumbing, and Structured Streaming.
"""

from similarity_search_with_hadoop_mapreduce_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
