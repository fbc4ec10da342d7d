"""Similarity search over dense embedding columns.

Two tiers, mirroring how the reference's one-query-vs-corpus text search
(``BookQuery.java``) generalizes to vectors:

- :func:`cosine_topk` — brute-force exact scan: broadcast the query
  vector, one codegen'd map stage computing cosine per row, then a
  ``TakeOrderedAndProject`` top-k (per-partition heaps, no global sort).
  Linear in corpus size; the right baseline, and often the right answer
  even at scale because it is one pass with no index build.

- :func:`lsh_bucketed_topk` — random-hyperplane LSH: a deterministic
  ±1 hyperplane family (md5 parity over (plane, dim), so any engine
  reproduces it) maps each vector to a small integer bucket; search
  touches only the query's bucket. At 100 TB the bucket id becomes the
  partition/clustering key so a query reads a single partition instead
  of the full corpus; recall is traded via the number of planes.

All vector math is JVM-side higher-order functions (``zip_with`` +
``aggregate``) — no Python boundary anywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.functions.vector import (
    cosine_similarity,
)


def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights: sign of md5 parity of
    ``"{plane}:{dim}"``. Pure public hashing — reproducible in SQL or any
    other engine byte for byte."""
    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _projection(emb: Column, weights: list[float]) -> Column:
    """Sequential left-fold dot product with a literal ±1 weight vector."""
    w = F.array(*[F.lit(x) for x in weights])
    return F.aggregate(
        F.zip_with(w, emb, lambda a, b: a * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Integer LSH bucket: bit p set iff the projection onto plane p is
    positive. ``n_planes`` bits ⇒ 2**n_planes buckets."""
    bucket = F.lit(0)
    for p, w in enumerate(planes):
        bucket = bucket + F.when(_projection(emb, w) > 0, F.lit(2**p)).otherwise(
            F.lit(0)
        )
    return bucket.cast("int")


def cosine_topk(
    embeddings: DataFrame, query_vec_id=0, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine similarity to the query vector.

    The 1-row query side is broadcast (same pattern as the flagship text
    query's broadcast shingle set); scores are rounded to 6 decimals so
    ranking ties are engine-stable, with vec_id as the final tiebreak.
    """
    q = F.broadcast(
        embeddings.filter(F.col(id_col) == F.lit(query_vec_id)).select(
            F.col("embedding").alias("q_emb")
        )
    )
    cos = F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 6)
    return (
        embeddings.join(q)
        .filter(F.col(id_col) != F.lit(query_vec_id))
        .select(F.col(id_col).alias("vec_id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def assign_ivf_centroids(
    embeddings: DataFrame, n_centroids: int = 8, id_col: str = "vec_id"
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its max-cosine
    centroid. Centroids are the first ``n_centroids`` vectors by id — a
    deterministic, training-free stand-in for a k-means codebook (swap in
    ``pyspark.ml.clustering.KMeans`` centers in production; the topology
    downstream is identical).

    The centroid side is a broadcast cross join (``n_centroids`` rows);
    the argmax is a per-vector window. At 100 TB, ``centroid_id`` becomes
    the partition key of the stored table, so a query scans only the
    probed partitions.
    """
    from pyspark.sql import Window

    cents = F.broadcast(
        embeddings.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
    )
    scored = embeddings.join(cents).select(
        F.col(id_col).alias("vec_id"),
        "embedding",
        "centroid_id",
        F.round(cosine_similarity(F.col("embedding"), F.col("c_emb")), 6).alias(
            "c_cos"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_cos"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose centroid is among
    the query's ``nprobe`` closest centroids.

    Recall/speed dial: ``nprobe == n_centroids`` degenerates to exact
    brute force; ``nprobe = 1`` reads a single inverted list. Returns
    (vec_id, centroid_id, cosine).
    """
    assigned = assign_ivf_centroids(embeddings, n_centroids, id_col=id_col)
    q = F.broadcast(
        embeddings.filter(F.col(id_col) == F.lit(query_vec_id)).select(
            F.col("embedding").alias("q_emb")
        )
    )
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    probed = F.broadcast(
        cents.join(q)
        .select(
            "centroid_id",
            F.round(cosine_similarity(F.col("c_emb"), F.col("q_emb")), 6).alias(
                "qc_cos"
            ),
        )
        .orderBy(F.desc("qc_cos"), F.asc("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    cos = F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 6)
    return (
        assigned.join(probed, "centroid_id")
        .join(q)
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select("vec_id", "centroid_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only over vectors sharing the
    query's LSH bucket.

    The bucket column is what you'd persist/partition by at scale
    (``df.write.partitionBy("bucket")`` or a bucketed table): the search
    becomes a single-partition scan + top-k. With 4 planes the corpus
    splits ~16 ways; recall rises with fewer planes, speed with more.
    """
    planes = hyperplane_signs(n_planes, dim)
    with_bucket = embeddings.withColumn(
        "bucket", lsh_bucket(F.col("embedding"), planes)
    )
    q = F.broadcast(
        with_bucket.filter(F.col(id_col) == F.lit(query_vec_id)).select(
            F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
        )
    )
    cos = F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 6)
    return (
        with_bucket.join(q, F.col("bucket") == F.col("q_bucket"))
        .filter(F.col(id_col) != F.lit(query_vec_id))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col("bucket"),
            cos.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
