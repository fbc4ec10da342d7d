"""Training-data curation queries: as-of join, deterministic splits,
stratified sampling. All full-value oracle-checked (DuckDB has native
ASOF JOIN, which certifies the union+running-last plan in
operators/temporal.py against an independent implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
    stratified_sample,
    train_val_test_split,
)
from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import asof_join
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table

_BUCKET = "((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT & 2147483647) % 10000)"


@register(
    "join_asof",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, max(value) AS last_purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, l.ts, r.last_purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the most recent prior purchase value of
    the same user. Engine plan is union + running last (one shuffle on
    user_id, linear); the oracle is DuckDB's native ASOF LEFT JOIN — an
    independent implementation of the same semantics."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    return asof_join(
        clicks, purchases, on="ts", by=["user_id"], values=["last_purchase_value"]
    )


@register(
    "sample_hash_split",
    oracle=f"""
SELECT doc_id,
       CASE WHEN {_BUCKET} < 8000 THEN 'train'
            WHEN {_BUCKET} < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment — a pure function
    of doc_id (stable under repartitioning, retries, and corpus growth)."""
    return train_val_test_split(
        table(spark, sf_dir, "documents"), id_col="doc_id"
    ).select("doc_id", "split")


@register(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {_BUCKET} < CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified deterministic downsample (en 50%, others 20%) —
    the rebalancing step of a multilingual training mix, as a map-only
    hash filter."""
    return stratified_sample(
        table(spark, sf_dir, "documents"),
        rates={"en": 0.5},
        default_rate=0.2,
        id_col="doc_id",
        strata_col="lang",
    ).select("doc_id", "lang")
