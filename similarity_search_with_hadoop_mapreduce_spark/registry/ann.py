"""Similarity-search queries with DuckDB oracles.

The LSH oracle embeds the same ±1 hyperplane literals the Spark operator
builds (both generated from md5 parity in Python), so bucket assignments
are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators import ann as A
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table

_DIM = 64
_PLANES = 4
_K = 10

_NORM = (
    "sqrt(list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_NORM} AS nrm FROM embeddings),
q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM n WHERE vec_id = 0)
SELECT n.vec_id,
       round(list_sum(list_transform(range(1, {_DIM} + 1),
             i -> CAST(n.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
             / (n.nrm * q.q_nrm), 6) AS cosine
FROM n, q
WHERE n.vec_id != 0
ORDER BY cosine DESC, n.vec_id
LIMIT {_K}
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for query vector 0: broadcast
    1-row query side, codegen'd map stage, TakeOrderedAndProject."""
    return A.cosine_topk(table(spark, sf_dir, "embeddings"), 0, k=_K)


def _lsh_oracle() -> str:
    planes = A.hyperplane_signs(_PLANES, _DIM)
    bucket_terms = []
    for p, w in enumerate(planes):
        lit = "[" + ", ".join(str(x) for x in w) + "]"
        proj = (
            f"list_sum(list_transform(range(1, {_DIM} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit}::DOUBLE[])[i]))"
        )
        bucket_terms.append(f"(CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {_NORM} AS nrm,
         CAST({bucket} AS INTEGER) AS bucket
  FROM embeddings
),
q AS (SELECT embedding AS q_emb, nrm AS q_nrm, bucket AS q_bucket FROM b WHERE vec_id = 0)
SELECT b.vec_id, b.bucket,
       round(list_sum(list_transform(range(1, {_DIM} + 1),
             i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
             / (b.nrm * q.q_nrm), 6) AS cosine
FROM b, q
WHERE b.vec_id != 0 AND b.bucket = q.q_bucket
ORDER BY cosine DESC, b.vec_id
LIMIT {_K}
"""


@register("ann_lsh_bucketed_topk", oracle=_lsh_oracle())
def ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10: exact cosine restricted to the query's
    random-hyperplane LSH bucket (the partition-pruning scale path)."""
    return A.lsh_bucketed_topk(
        table(spark, sf_dir, "embeddings"), 0, k=_K, n_planes=_PLANES, dim=_DIM
    )


_N_CENTROIDS = 8
_NPROBE = 2

_DOT_AQ = (
    f"list_sum(list_transform(range(1, {_DIM} + 1), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))"
)
_DOT_NC = (
    f"list_sum(list_transform(range(1, {_DIM} + 1), "
    "i -> CAST(nv.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))"
)
_DOT_CQ = (
    f"list_sum(list_transform(range(1, {_DIM} + 1), "
    "i -> CAST(c.c_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))"
)


@register(
    "ann_ivf_topk",
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_NORM} AS nrm FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb, nrm AS c_nrm
  FROM n WHERE vec_id < {_N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, embedding, nrm, centroid_id FROM (
    SELECT nv.vec_id, nv.embedding, nv.nrm, c.centroid_id,
           row_number() OVER (
             PARTITION BY nv.vec_id
             ORDER BY round({_DOT_NC} / (nv.nrm * c.c_nrm), 6) DESC,
                      c.centroid_id
           ) AS rn
    FROM n nv CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM n WHERE vec_id = 0),
probed AS (
  SELECT c.centroid_id FROM cents c, q
  ORDER BY round({_DOT_CQ} / (c.c_nrm * q.q_nrm), 6) DESC, c.centroid_id
  LIMIT {_NPROBE}
)
SELECT a.vec_id, a.centroid_id,
       round({_DOT_AQ} / (a.nrm * q.q_nrm), 6) AS cosine
FROM assigned a JOIN probed USING (centroid_id), q
WHERE a.vec_id != 0
ORDER BY cosine DESC, a.vec_id
LIMIT {_K}
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: coarse-quantize to 8 centroids, probe the
    query's 2 nearest inverted lists only — the partition-pruned ANN
    topology (centroid_id = storage partition key at scale)."""
    return A.ivf_topk(
        table(spark, sf_dir, "embeddings"),
        0,
        k=_K,
        n_centroids=_N_CENTROIDS,
        nprobe=_NPROBE,
    )


_DOT_NQ = (
    f"list_sum(list_transform(range(1, {_DIM} + 1), "
    "i -> CAST(n.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))"
)


@register(
    "ann_ivf_recall",
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_NORM} AS nrm FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb, nrm AS c_nrm
  FROM n WHERE vec_id < {_N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT nv.vec_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY nv.vec_id
             ORDER BY round({_DOT_NC} / (nv.nrm * c.c_nrm), 6) DESC,
                      c.centroid_id
           ) AS rn
    FROM n nv CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM n WHERE vec_id = 0),
probed AS (
  SELECT c.centroid_id FROM cents c, q
  ORDER BY round({_DOT_CQ} / (c.c_nrm * q.q_nrm), 6) DESC, c.centroid_id
  LIMIT {_NPROBE}
),
ivf AS (
  SELECT nv.vec_id
  FROM assigned a JOIN probed USING (centroid_id)
       JOIN n nv ON nv.vec_id = a.vec_id, q
  WHERE nv.vec_id != 0
  ORDER BY round({_DOT_NQ.replace('n.', 'nv.')} / (nv.nrm * q.q_nrm), 6) DESC,
           nv.vec_id
  LIMIT {_K}
),
exact AS (
  SELECT n.vec_id
  FROM n, q
  WHERE n.vec_id != 0
  ORDER BY round({_DOT_NQ} / (n.nrm * q.q_nrm), 6) DESC, n.vec_id
  LIMIT {_K}
)
SELECT CAST((SELECT count(*) FROM ivf JOIN exact USING (vec_id)) AS DOUBLE)
         / {_K} AS recall_at_k,
       CAST({_K} AS INTEGER) AS k
""",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality metric: recall@10 of the IVF probe against the exact
    brute-force top-10 — the number a similarity-search deployment tunes
    nprobe/centroid-count against. Composes the two existing pipelines
    and reduces to one row, so it stays cheap at any corpus size (both
    sides end in TakeOrderedAndProject before the tiny join)."""
    ivf = A.ivf_topk(
        table(spark, sf_dir, "embeddings"),
        0,
        k=_K,
        n_centroids=_N_CENTROIDS,
        nprobe=_NPROBE,
    ).select("vec_id")
    exact = A.cosine_topk(table(spark, sf_dir, "embeddings"), 0, k=_K).select(
        "vec_id"
    )
    return ivf.join(exact, "vec_id").agg(
        (F.count(F.lit(1)).cast("double") / F.lit(float(_K))).alias("recall_at_k"),
        F.lit(_K).cast("int").alias("k"),
    )
