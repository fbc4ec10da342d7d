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

On top of those, the trained-quantizer matrix IVF × {raw, PQ,
residual-PQ (IVFADC), SQ8}: Lloyd-trained coarse centroids partition
the stored corpus so a query reads ``nprobe`` inverted lists
(:func:`ivf_topk`, layouts via :func:`write_ivf_layout`); PQ
(:func:`pq_topk`, ~60× compression), residual PQ
(:func:`ivfpq_residual_topk`) and 8-bit scalar quantization
(:func:`sq_topk` / :func:`ivfsq_topk`, 4× compression, r7) price the
survivors from compressed codes only; two-stage exact rerank
(:func:`ivfpq_topk_refined`) recovers quantization error; recall@k
metrics (probe / quantization / serving, hash-sampled mode) are the
tuning dials; every stored layout has the append / compact / stats
maintenance lifecycle with epoch-idempotent crash replay.

All vector math is JVM-side higher-order functions (``zip_with`` +
``aggregate``) — no Python boundary anywhere; every training is
deterministic and SQL-replayed by the registry oracles.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.functions.vector import (
    dot,
    l2_norm,
)
from similarity_search_with_hadoop_mapreduce_spark.sources.tables import fan_out


def _round6(x: float) -> float:
    """Python twin of ``F.round(col, 6)``: HALF_UP on the exact binary
    expansion (BigDecimal semantics), not Python's banker's rounding."""
    return float(
        Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _pydot(a: list[float], b: list[float]) -> float:
    """Sequential left-fold dot product — the Python twin of the JVM
    ``aggregate(zip_with(...))`` fold, shared by every coordinator-side
    scoring path so fold semantics have exactly one definition."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


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
            F.col("embedding").alias("q_emb"),
            l2_norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    # query norm computed once on the broadcast side, corpus norm once per
    # row — the cosine inside the scan is then a single dot fold
    cos = F.round(
        F.coalesce(
            dot(F.col("embedding"), F.col("q_emb"))
            / F.nullif(l2_norm(F.col("embedding")) * F.col("q_nrm"), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )
    return (
        fan_out(embeddings).join(q)
        .filter(F.col(id_col) != F.lit(query_vec_id))
        .select(F.col(id_col).alias("vec_id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _codebook(
    embeddings: DataFrame, n_centroids: int, id_col: str
) -> list[tuple[int, list[float], float]]:
    """Collect the tiny centroid codebook driver-side: (id, vector, norm).

    This is the reference's own broadcast-side-state pattern (the query
    string collected by the driver and shipped to every task,
    BookQuery.java:194-205) applied to IVF: a codebook is a small
    coordinator artifact, not a distributed dataset. The Python norm fold
    is the same sequential left fold the JVM ``aggregate`` performs, so
    the literals are bit-identical to what a join-based plan computes.
    """
    rows = (
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cid"), "embedding")
        .collect()
    )
    book = []
    for r in sorted(rows, key=lambda r: r["cid"]):
        v = [float(x) for x in r["embedding"]]
        norm = 0.0
        for x in v:
            norm += x * x
        book.append((r["cid"], v, math.sqrt(norm)))
    return book


def _lit_f(x: float) -> str:
    """SQL literal for one double, finiteness-guarded. Every driver-side
    float that reaches generated SQL goes through here (or the array
    variants below): a NaN/inf — e.g. from a NaN embedding propagating
    through a Lloyd mean — would otherwise render as ``nanD`` and fail
    parsing with an opaque error, or silently propagate inf (ADVICE r3).
    """
    if not math.isfinite(x):
        raise ValueError(f"literal scalar must be finite, got {x!r}")
    return f"{x!r}D"


def _dot_sql(col: str, v: list[float]) -> str:
    """SQL text for the sequential-fold dot product of ``col`` with a
    literal vector — textually identical fold semantics to
    :func:`functions.vector.dot` (zip_with then left-fold add)."""
    for x in v:
        if not math.isfinite(x):
            raise ValueError("literal vector must be finite")
    arr = "array(" + ",".join(f"{x!r}D" for x in v) + ")"
    return (
        f"aggregate(zip_with({col}, {arr}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def _lit_vec(v: list[float]) -> Column:
    """Literal double array in ONE Py4J call: ``F.array(*[F.lit(x)...])``
    costs a JVM round trip per element (~0.8 s of pure driver time for an
    8x64 codebook, measured); a single ``expr`` parse is ~100x cheaper.
    ``repr`` round-trips doubles exactly and the ``D`` suffix keeps the
    parser from inferring DECIMAL."""
    for x in v:
        if not math.isfinite(x):
            raise ValueError("literal vector must be finite")
    return F.expr("array(" + ",".join(f"{x!r}D" for x in v) + ")")


def kmeans_codebook(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
) -> list[tuple[int, list[float], float]]:
    """Deterministic Lloyd-trained IVF codebook: (id, vector, norm) list.

    Spherical k-means with every source of cross-engine nondeterminism
    removed, so a SQL engine can replay the training bit for bit:

    - **init**: the first ``n_centroids`` vectors by id (no RNG);
    - **assign**: max *rounded-to-6-decimals* cosine, ties to the smallest
      centroid id (the same comparator every probe uses);
    - **update**: per-dimension mean computed as a sum of
      ``floor(component * 1e6)`` BIGINTs divided by the count — integer
      addition is order-independent, so the mean is identical under any
      partitioning, any engine;
    - **empty clusters** keep their previous centroid.

    Each iteration is one distributed assignment + one (centroid, dim)
    aggregate; only the O(centroids x dim) component table is collected
    (the codebook is a coordinator artifact, like the reference's
    driver-held query string, BookQuery.java:194-205). The oracle unrolls
    the same iterations in SQL (registry/ann.py), which is the point: a
    trained index whose training itself is value-checked cross-engine.
    """
    book = _codebook(embeddings, n_centroids, id_col)
    dim_count = len(book[0][1]) if book else 0
    for _ in range(iters):
        assigned = assign_ivf_centroids(
            embeddings, n_centroids, id_col=id_col, book=book
        )
        comp_rows = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("dim", "comp")
            )
            .groupBy("centroid_id", "dim")
            .agg(
                F.sum(
                    F.floor(F.col("comp").cast("double") * F.lit(1000000.0)).cast(
                        "bigint"
                    )
                ).alias("sq"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        )
        means: dict[int, list[float]] = {}
        for r in comp_rows:
            means.setdefault(r["centroid_id"], [0.0] * dim_count)[r["dim"]] = (
                float(r["sq"]) / float(r["cnt"])
            ) / 1000000.0
        new_book = []
        for cid, old_v, _old_n in book:
            v = means.get(cid, old_v)
            n = 0.0
            for x in v:
                n += x * x
            new_book.append((cid, v, math.sqrt(n)))
        book = new_book
    return book


def assign_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    book: list[tuple[int, list[float], float]] | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its max-cosine
    centroid. Centroids are the first ``n_centroids`` vectors by id — a
    deterministic, training-free stand-in for a k-means codebook (swap in
    ``pyspark.ml.clustering.KMeans`` centers in production; the topology
    downstream is identical).

    Map-only: the codebook is collected driver-side (it is O(centroids),
    not O(data)) and inlined as literals, the per-row norm fold is shared
    across all centroid scores, and the argmax is ``greatest`` over
    (score, -id, id) structs — no join, no window, no exchange. At
    100 TB, ``centroid_id`` becomes the partition key of the stored
    table, so a query scans only the probed partitions.

    Ties break to the smallest centroid id, matching the window
    formulation ``ORDER BY c_cos DESC, centroid_id``.
    """
    if book is None:
        book = _codebook(embeddings, n_centroids, id_col)
    e = F.col("embedding")
    # interpreted dot folds are CPU-bound: spread an under-split scan
    base = fan_out(embeddings).select(
        F.col(id_col).alias("vec_id"), "embedding", l2_norm(e).alias("_nrm")
    )
    # the whole argmax is ONE sql-parsed expression: building it from
    # F.zip_with/F.aggregate per centroid costs a Py4J round trip per
    # node (~0.7 s of driver time per query for 8 centroids, measured)
    cands = [
        "named_struct("
        f"'c_cos', round(coalesce({_dot_sql('embedding', v)}"
        f" / nullif(_nrm * {_lit_f(cn)}, 0.0D), 0.0D), 6), "
        f"'neg_id', {-cid}, 'centroid_id', {cid})"
        for cid, v, cn in book
    ]
    best = (
        F.expr(f"greatest({', '.join(cands)})") if len(cands) > 1 else F.expr(cands[0])
    )
    return base.select(
        "vec_id", "embedding", best["centroid_id"].alias("centroid_id")
    )


def _ivf_probe_state(
    embeddings: DataFrame,
    query_vec_id,
    n_centroids: int,
    nprobe: int,
    id_col: str,
    book: list[tuple[int, list[float], float]] | None = None,
):
    """(query vector, its norm, probed centroid ids, codebook) — the
    coordinator-side state of an IVF probe. One driver collect fetches
    codebook + query row together (query row only when a trained ``book``
    is supplied); probe selection ranks nprobe of n_centroids rows in
    Python with the same fold order and HALF_UP rounding as the JVM
    expressions, so it is bit-compatible with a dataframe formulation of
    the same ranking."""
    want_book = book is None
    cond = F.col(id_col) == F.lit(query_vec_id)
    if want_book:
        cond = cond | (F.col(id_col) < n_centroids)
    rows = (
        embeddings.filter(cond)
        .select(F.col(id_col).alias("cid"), "embedding")
        .collect()
    )
    if want_book:
        book = []
    q = None
    for r in sorted(rows, key=lambda r: r["cid"]):
        v = [float(x) for x in r["embedding"]]
        if r["cid"] == query_vec_id:
            q = v
        if want_book and r["cid"] < n_centroids:
            n = 0.0
            for x in v:
                n += x * x
            book.append((r["cid"], v, math.sqrt(n)))
    if q is None:
        raise KeyError(f"query vector {query_vec_id!r} not found in {id_col}")
    qn = math.sqrt(_pydot(q, q))
    ranked = sorted(
        (
            (_round6(_pydot(v, q) / (cn * qn)) if cn * qn != 0.0 else 0.0, cid)
            for cid, v, cn in book
        ),
        key=lambda t: (-t[0], t[1]),
    )
    return q, qn, [cid for _, cid in ranked[:nprobe]], book


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    book: list[tuple[int, list[float], float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose centroid is among
    the query's ``nprobe`` closest centroids.

    ``book`` is the codebook to probe — pass :func:`kmeans_codebook` output
    for a trained index (what the registry entries and a production
    deployment use; train once, probe many); default None falls back to
    the untrained first-N-ids codebook.

    Recall/speed dial: ``nprobe == n_centroids`` degenerates to exact
    brute force; ``nprobe = 1`` reads a single inverted list. Returns
    (vec_id, centroid_id, cosine).
    """
    q, qn, probe_ids, book = _ivf_probe_state(
        embeddings, query_vec_id, n_centroids, nprobe, id_col, book=book
    )
    assigned = assign_ivf_centroids(embeddings, n_centroids, id_col=id_col, book=book)
    return ivf_probe_topk(assigned, q, qn, probe_ids, query_vec_id, k=k)


def ivf_probe_topk(
    assigned: DataFrame,
    q: list[float],
    qn: float,
    probe_ids: list[int],
    query_vec_id=0,
    k: int = 10,
) -> DataFrame:
    """The serving half of an IVF query: score only the probed inverted
    lists of a PREBUILT assignment (``assign_ivf_centroids`` output —
    materialized at index-build time in production; ``centroid_id`` is the
    storage partition key at scale). Map-only probe filter + per-partition
    top-k heaps (TakeOrderedAndProject): the single-partition-scan ANN
    topology."""
    e = F.col("embedding")
    cos = F.round(
        F.coalesce(
            dot(e, _lit_vec(q)) / F.nullif(l2_norm(e) * F.lit(qn), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select("vec_id", "centroid_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization — the compressed-index ANN topology
# ---------------------------------------------------------------------------


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
) -> list[list[tuple[int, list[float], float]]]:
    """Per-subspace Lloyd-trained PQ codebooks: the embedding splits into
    ``m`` contiguous ``sub_dim``-wide subvectors and each subspace trains
    its own deterministic :func:`kmeans_codebook` (same init/assign/update
    rules, so the registry oracle replays every subspace in SQL exactly
    like the IVF book). Returns ``m`` codebooks of ``k_sub`` centroids.

    Requires centroid ids 0..k_sub-1 (the first-ids init on a dense-id
    corpus) — :func:`pq_topk` indexes its lookup tables by code."""
    books = []
    for mi in range(m):
        sub = embeddings.select(
            F.col(id_col).alias(id_col),
            F.slice("embedding", mi * sub_dim + 1, sub_dim).alias("embedding"),
        )
        book = kmeans_codebook(
            sub, n_centroids=k_sub, iters=iters, id_col=id_col
        )
        if [cid for cid, _, _ in book] != list(range(len(book))):
            raise ValueError(
                "pq_codebooks requires dense vector ids 0..k_sub-1 for the "
                f"first-ids init; got {[c for c, _, _ in book]}"
            )
        if book and len(book[0][1]) != sub_dim:
            raise ValueError(
                f"subspace {mi} sliced to {len(book[0][1])} dims, expected "
                f"{sub_dim}: m*sub_dim overruns the embedding dimension"
            )
        books.append(book)
    return books


def pq_encode(
    embeddings: DataFrame,
    books: list[list[tuple[int, list[float], float]]],
    sub_dim: int = 16,
    id_col: str = "vec_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Compress every vector to ``(vec_id, code ARRAY<INT>, nrm)`` — the
    PQ index: ``code[mi]`` is the max-cosine centroid of subspace ``mi``
    (round-6, ties to the smallest id — identical comparator to the IVF
    assignment, SQL-replayable), ``nrm`` the FULL-vector norm kept for
    cosine reconstruction. m×log2(k) bits replace the raw vector: at 64
    dims × float32 → 4 codes of 3 bits + one float norm, a ~60× shrink.

    Map-only, zero shuffles; two staged projections keep the slices and
    sub-norms evaluated once each (interpreted HOF folds get no codegen
    subexpression elimination — the same staging rule as the text
    metrics)."""
    m = len(books)
    staged = fan_out(embeddings).select(
        F.col(id_col).alias("vec_id"),
        *keep,
        l2_norm(F.col("embedding")).alias("nrm"),
        *[
            F.slice("embedding", mi * sub_dim + 1, sub_dim).alias(f"_s{mi}")
            for mi in range(m)
        ],
    )
    staged2 = staged.select(
        "vec_id",
        *keep,
        "nrm",
        *[F.col(f"_s{mi}") for mi in range(m)],
        *[l2_norm(F.col(f"_s{mi}")).alias(f"_sn{mi}") for mi in range(m)],
    )
    code_cols = []
    for mi, book in enumerate(books):
        cands = [
            "named_struct("
            f"'c_cos', round(coalesce({_dot_sql(f'_s{mi}', v)}"
            f" / nullif(_sn{mi} * {_lit_f(cn)}, 0.0D), 0.0D), 6), "
            f"'neg_id', {-cid}, 'centroid_id', {cid})"
            for cid, v, cn in book
        ]
        best = (
            F.expr(f"greatest({', '.join(cands)})")
            if len(cands) > 1
            else F.expr(cands[0])
        )
        code_cols.append(best["centroid_id"].alias(f"_c{mi}"))
    coded = staged2.select("vec_id", *keep, "nrm", *code_cols)
    return coded.select(
        "vec_id",
        *keep,
        F.array(*[F.col(f"_c{mi}") for mi in range(m)]).alias("code"),
        "nrm",
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 8,
    iters: int = 2,
    books: list | None = None,
    codes: DataFrame | None = None,
    id_col: str = "vec_id",
    query_state: tuple[list[float], float] | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    the PQ index: ``score ≈ cosine = Σ_mi LUT_mi[code_mi] / (|x|·|q|)``
    where ``LUT_mi[j] = ⟨q_mi, centroid_{mi,j}⟩`` — m×k_sub dot products
    computed ONCE driver-side per query and inlined as literal arrays, so
    scoring a vector is m array lookups + one divide instead of a
    ``dim``-element fold. This is the memory-bound billion-scale serving
    topology (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): the scan touches only the compressed
    (vec_id, code, nrm) table, never the raw vectors.

    Returns ``(vec_id, code_packed, pq_score)``; ``code_packed`` is the
    base-k_sub packing of the code word (pins the encoding itself in the
    value-hash gate). Plan: map-only scoring + TakeOrderedAndProject.
    """
    if books is None:
        if codes is not None:
            # mirror ivfpq_topk_from_layout's guard: freshly trained books
            # would index ADC lookup tables by code words from a possibly
            # different book — silently wrong scores (ADVICE r3)
            raise ValueError(
                "codes provided without the books they were encoded with "
                "(codes are meaningless under a different book); pass both"
            )
        books = pq_codebooks(
            embeddings, m=m, sub_dim=sub_dim, k_sub=k_sub, iters=iters,
            id_col=id_col,
        )
    if codes is None:
        codes = pq_encode(embeddings, books, sub_dim=sub_dim, id_col=id_col)
    if query_state is not None:
        q, qn = query_state
    else:
        rows = (
            embeddings.filter(F.col(id_col) == F.lit(query_vec_id))
            .select("embedding")
            .collect()
        )
        if not rows:
            raise KeyError(
                f"query vector {query_vec_id!r} not found in {id_col}"
            )
        q = [float(x) for x in rows[0]["embedding"]]
        qn = math.sqrt(_pydot(q, q))
    if len(q) != m * sub_dim:
        raise ValueError(
            f"m*sub_dim = {m * sub_dim} must cover the full embedding "
            f"dimension ({len(q)}): uncovered dims would silently deflate "
            "every ADC score (the norm is full-vector)"
        )
    score, packed = _adc_exprs(books, q, qn, sub_dim, k_sub)
    return (
        codes.filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            packed.alias("code_packed"),
            score.alias("pq_score"),
        )
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(k)
    )


def _recall_sample_filter(id_col: str, sample_fraction: float | None):
    """Deterministic hash-sample predicate for recall ground truth, or
    None for the full corpus. At 100 TB the exact side of a recall
    metric is the bottleneck (it brute-forces corpus x queries); both
    the exact and the index side restrict to the SAME md5-hash sample
    of vec_ids (the :mod:`operators.sampling` machinery), so the metric
    stays a true subset ratio on the sampled sub-corpus and is an
    unbiased estimate of full recall — pytest pins sampled ~= full on
    the fixture. Engine-independent (pure md5 arithmetic), so an oracle
    can replay the sample."""
    if sample_fraction is None:
        return None
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        hash_bucket,
    )

    buckets = 10000
    return hash_bucket(F.col(id_col), buckets) < int(
        round(sample_fraction * buckets)
    )


def _query_battery(
    embeddings: DataFrame, n_queries: int, id_col: str
) -> list[tuple[int, list[float], float]]:
    """Collect the first ``n_queries`` vectors driver-side as sorted
    ``(qid, vector, norm)`` — the shared front half of every recall
    metric (queries are coordinator state, like the reference's
    driver-held query)."""
    rows = (
        embeddings.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), "embedding")
        .collect()
    )
    out = []
    for r in sorted(rows, key=lambda r: r["qid"]):
        qv = [float(x) for x in r["embedding"]]
        out.append((int(r["qid"]), qv, math.sqrt(_pydot(qv, qv))))
    return out


def _recall_cos_expr():
    """Round-6 cosine of (embedding, q_emb/q_nrm) — the exact-side score
    every recall metric shares."""
    return F.round(
        F.coalesce(
            dot(F.col("embedding"), F.col("q_emb"))
            / F.nullif(l2_norm(F.col("embedding")) * F.col("q_nrm"), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )


def _exact_topk_per_query(
    embeddings: DataFrame,
    q_df,
    w,
    k: int,
    id_col: str,
    sample_fraction: float | None,
) -> DataFrame:
    """(qid, vec_id) exact brute-force top-k per query — the shared
    ground-truth side (optionally hash-sampled; callers filter their
    approximate side with the SAME predicate)."""
    samp = _recall_sample_filter(id_col, sample_fraction)
    base = embeddings if samp is None else embeddings.filter(samp)
    return (
        fan_out(base)
        .select(F.col(id_col).alias("vec_id"), "embedding")
        .join(q_df)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _recall_cos_expr().alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )


def _recall_reduce(
    approx: DataFrame, exact: DataFrame, k: int, n_queries: int
) -> DataFrame:
    """One-row ``(recall_at_k, k, n_queries)`` reduction shared by every
    recall metric (both sides are (qid, vec_id) top-k sets).

    The denominator is the EXACT side's row count — i.e. per query,
    min(k, exact candidates available) — not ``k * n_queries``: under
    ``sample_fraction`` a query whose hash sample leaves fewer than k
    candidates would otherwise deflate recall below 1.0 for a perfect
    index (a systematic bias, not sampling noise; review r4). On a full
    corpus with >= k+1 vectors the two denominators coincide, so the
    unsampled metrics are unchanged."""
    hits = approx.join(exact, ["qid", "vec_id"]).agg(
        F.count(F.lit(1)).cast("double").alias("_n_hit")
    )
    denom = exact.agg(F.count(F.lit(1)).cast("double").alias("_n_exact"))
    return hits.join(denom).select(
        (
            F.col("_n_hit") / F.nullif(F.col("_n_exact"), F.lit(0.0))
        ).alias("recall_at_k"),
        F.lit(k).cast("int").alias("k"),
        F.lit(n_queries).cast("int").alias("n_queries"),
    )


def pq_recall_multi(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 8,
    iters: int = 2,
    books: list | None = None,
    codes: DataFrame | None = None,
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Mean recall@k of PQ ADC ranking against the exact brute-force
    top-k, averaged over the first ``n_queries`` vectors — the number a
    deployment tunes m / k_sub / training iterations against (the
    quantization-error analog of :func:`ivf_recall_multi`'s probe
    recall). ``sample_fraction`` restricts BOTH sides' candidate corpus
    to a deterministic hash sample (see :func:`_recall_sample_filter`)
    so the metric stays runnable when the corpus won't brute-force.

    One DAG for all queries: the query table carries each query's
    driver-computed lookup tables as array columns (O(n_queries·m·k_sub)
    doubles, broadcast), the ADC and exact candidate sets are ranked
    with one window each partitioned by query id, and the result reduces
    to a single row."""
    from pyspark.sql import Window

    if books is None:
        if codes is not None:
            # mirror ivfpq_topk_from_layout's guard: freshly trained books
            # would index ADC lookup tables by code words from a possibly
            # different book — silently wrong scores (ADVICE r3)
            raise ValueError(
                "codes provided without the books they were encoded with "
                "(codes are meaningless under a different book); pass both"
            )
        books = pq_codebooks(
            embeddings, m=m, sub_dim=sub_dim, k_sub=k_sub, iters=iters,
            id_col=id_col,
        )
    if codes is None:
        codes = pq_encode(embeddings, books, sub_dim=sub_dim, id_col=id_col)
    q_rows = []
    for qid, qv, qn in _query_battery(embeddings, n_queries, id_col):
        luts = [
            [_pydot(v, qv[mi * sub_dim : (mi + 1) * sub_dim]) for _c, v, _n in book]
            for mi, book in enumerate(books)
        ]
        q_rows.append((qid, qv, qn, *luts))
    spark = embeddings.sparkSession
    lut_cols = ", ".join(f"lut{mi} ARRAY<DOUBLE>" for mi in range(m))
    q_df = F.broadcast(
        spark.createDataFrame(
            q_rows, f"qid BIGINT, q_emb ARRAY<DOUBLE>, q_nrm DOUBLE, {lut_cols}"
        )
    )
    adc_terms = " + ".join(
        f"element_at(lut{mi}, code[{mi}] + 1)" for mi in range(m)
    )
    adc_score = F.expr(
        f"round(coalesce(({adc_terms}) / nullif(nrm * q_nrm, 0.0D), 0.0D), 6)"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    samp = _recall_sample_filter("vec_id", sample_fraction)
    codes_side = codes if samp is None else codes.filter(samp)
    adc = (
        codes_side.join(q_df)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", adc_score.alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    exact = _exact_topk_per_query(
        embeddings, q_df, w, k, id_col, sample_fraction
    )
    return _recall_reduce(adc, exact, k, n_queries)


def sq_bounds(
    embeddings: DataFrame, id_col: str = "vec_id"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) training pass for the 8-bit scalar
    quantizer (FAISS ``SQ8``): one ``posexplode`` + ``groupBy(pos)``
    aggregation over the corpus, O(dim) driver state — the same
    coordinator-state contract as the Lloyd codebooks. min/max are
    exact order statistics (no floating-point arithmetic), so Spark and
    the SQL oracle agree on the bounds bit for bit."""
    rows = (
        fan_out(embeddings)
        .select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .collect()
    )
    out = sorted((int(r.pos), float(r.mn), float(r.mx)) for r in rows)
    return [(mn, mx) for _pos, mn, mx in out]


def _sq_scales(
    bounds: list[tuple[float, float]]
) -> tuple[list[float], list[float], list[float]]:
    """(mins, fwd scale 255/range, inverse step range/255); degenerate
    dimensions (mx == mn) get scale 0 → code 0 → reconstruct mn."""
    mins = [mn for mn, _mx in bounds]
    fwd = [255.0 / (mx - mn) if mx > mn else 0.0 for mn, mx in bounds]
    inv = [(mx - mn) / 255.0 for mn, mx in bounds]
    return mins, fwd, inv


def sq_encode(
    embeddings: DataFrame,
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Compress every vector to ``(vec_id, qcode ARRAY<INT>, nrm)`` —
    8-bit scalar quantization: ``code_d = clamp(floor(round((x_d − mn_d)
    · 255/(mx_d − mn_d), 6)), 0, 255)`` per dimension (round-6 before
    floor kills cross-engine last-bit jitter at bin boundaries — the
    same quantization discipline as every score in this module); the
    true full-vector norm rides along for cosine serving. Map-only,
    zero shuffles. 64 float32 dims → 64 bytes + one double: exactly 4×
    compression at far higher fidelity than PQ's ~60× — SQ8 is the
    high-recall, low-compression point on the same serving curve, the
    standard first step before PQ when memory allows (Jégou et al. 2011
    §2 discusses exactly this trade)."""
    dim = len(bounds)
    mins, fwd, _inv = _sq_scales(bounds)
    mn_arr = "array(" + ",".join(_lit_f(x) for x in mins) + ")"
    sc_arr = "array(" + ",".join(_lit_f(x) for x in fwd) + ")"
    code_expr = (
        f"transform(sequence(1, {dim}), i -> "
        f"least(255, greatest(0, CAST(floor(round("
        f"(CAST(element_at(embedding, i) AS DOUBLE) - "
        f"element_at({mn_arr}, i)) * element_at({sc_arr}, i), 6)) "
        f"AS INT))))"
    )
    return fan_out(embeddings).select(
        F.col(id_col).alias("vec_id"),
        *keep,
        F.expr(code_expr).alias("qcode"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )


def _sq_score_terms(
    bounds: list[tuple[float, float]], q: list[float]
) -> tuple[float, list[float]]:
    """Fold the reconstruction algebra driver-side: with ``x̂_d = mn_d +
    (code_d + 0.5)·Δ_d`` (midpoint reconstruction, Δ = range/255),
    ``dot(q, x̂) = C + Σ w_d·code_d`` where ``w_d = q_d·Δ_d`` and
    ``C = Σ q_d·(mn_d + Δ_d/2)`` — so scoring a stored vector is ONE
    integer-array fold plus a divide, never a dim-element reconstruct."""
    mins, _fwd, inv = _sq_scales(bounds)
    w = [qd * dd for qd, dd in zip(q, inv)]
    c0 = sum(qd * (mn + dd / 2.0) for qd, mn, dd in zip(q, mins, inv))
    return c0, w


def sq_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    bounds: list[tuple[float, float]] | None = None,
    codes: DataFrame | None = None,
    id_col: str = "vec_id",
    query_state: tuple[list[float], float] | None = None,
) -> DataFrame:
    """Approximate top-k over the SQ8 index: asymmetric scoring against
    the compressed codes only — ``score ≈ cosine = (C + Σ w_d·code_d) /
    (|x|·|q|)`` with the per-query constants folded driver-side
    (:func:`_sq_score_terms`). The scan touches (vec_id, qcode, nrm),
    never the raw vectors — the same serving contract as :func:`pq_topk`
    with a finer quantizer. Returns ``(vec_id, code_check, sq_score)``;
    ``code_check = Σ (d+1)·code_d`` is an order-sensitive checksum that
    pins the per-dimension encoding itself in the value-hash gate (the
    full 64-byte word doesn't fit a scalar slot).

    Plan: map-only scoring + TakeOrderedAndProject; like every serving
    entry the stored code table would be the persisted layout at scale.
    """
    if bounds is None:
        if codes is not None:
            # codes encoded under different bounds score silently wrong —
            # the same pairing guard as pq_topk/ivfpq_topk_from_layout
            raise ValueError(
                "codes provided without the bounds they were encoded "
                "with (codes are meaningless under different bounds); "
                "pass both"
            )
        bounds = sq_bounds(embeddings, id_col=id_col)
    if codes is None:
        codes = sq_encode(embeddings, bounds, id_col=id_col)
    if query_state is not None:
        q, qn = query_state
    else:
        rows = (
            embeddings.filter(F.col(id_col) == F.lit(query_vec_id))
            .select("embedding")
            .collect()
        )
        if not rows:
            raise KeyError(
                f"query vector {query_vec_id!r} not found in {id_col}"
            )
        q = [float(x) for x in rows[0]["embedding"]]
        qn = math.sqrt(_pydot(q, q))
    if len(q) != len(bounds):
        raise ValueError(
            f"query has {len(q)} dims but bounds cover {len(bounds)}: "
            "mismatched training would silently mis-scale every score"
        )
    c0, w = _sq_score_terms(bounds, q)
    dim = len(bounds)
    score = F.expr(
        f"round(coalesce(({_lit_f(c0)} + {_dot_sql('qcode', w)}) "
        f"/ nullif(nrm * {_lit_f(qn)}, 0.0D), 0.0D), 6)"
    )
    check = F.expr(
        f"aggregate(zip_with(qcode, sequence(1, {dim}), "
        "(c, i) -> CAST(c AS BIGINT) * CAST(i AS BIGINT)), "
        "0L, (acc, v) -> acc + v)"
    )
    return (
        codes.filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            check.alias("code_check"),
            score.alias("sq_score"),
        )
        .orderBy(F.desc("sq_score"), F.asc("vec_id"))
        .limit(k)
    )


def sq_recall_multi(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    bounds: list[tuple[float, float]] | None = None,
    codes: DataFrame | None = None,
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Mean recall@k of SQ8 ADC ranking against the exact brute-force
    top-k over the same query battery as :func:`pq_recall_multi` — the
    number that justifies (or not) spending 16× more index memory than
    PQ for the finer quantizer. One DAG for all queries: each query's
    driver-folded (C, w) terms ride the broadcast query table as a
    scalar + an array column, both sides rank with one window each."""
    from pyspark.sql import Window

    if bounds is None:
        if codes is not None:
            raise ValueError(
                "codes provided without the bounds they were encoded "
                "with (codes are meaningless under different bounds); "
                "pass both"
            )
        bounds = sq_bounds(embeddings, id_col=id_col)
    if codes is None:
        codes = sq_encode(embeddings, bounds, id_col=id_col)
    q_rows = []
    for qid, qv, qn in _query_battery(embeddings, n_queries, id_col):
        c0, w = _sq_score_terms(bounds, qv)
        q_rows.append((qid, qv, qn, c0, w))
    spark = embeddings.sparkSession
    q_df = F.broadcast(
        spark.createDataFrame(
            q_rows,
            "qid BIGINT, q_emb ARRAY<DOUBLE>, q_nrm DOUBLE, "
            "c0 DOUBLE, w ARRAY<DOUBLE>",
        )
    )
    adc_score = F.expr(
        "round(coalesce((c0 + aggregate(zip_with(qcode, w, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)) / nullif(nrm * q_nrm, 0.0D), "
        "0.0D), 6)"
    )
    w_rank = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    samp = _recall_sample_filter("vec_id", sample_fraction)
    codes_side = codes if samp is None else codes.filter(samp)
    adc = (
        codes_side.join(q_df)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", adc_score.alias("c"))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    exact = _exact_topk_per_query(
        embeddings, q_df, w_rank, k, id_col, sample_fraction
    )
    return _recall_reduce(adc, exact, k, n_queries)


def ivfsq_index(
    embeddings: DataFrame,
    coarse_book: list[tuple[int, list[float], float]],
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVF-SQ8 stored index (FAISS ``IVF,SQ8``): ``(vec_id,
    centroid_id, qcode, nrm)`` — coarse assignment for partition pruning
    plus the scalar-quantized codes for compressed scoring, built in ONE
    map-only pass exactly like :func:`ivfpq_index` (the assignment rides
    through the encode projection; no join). At 100 TB this table is
    written partitioned by ``centroid_id`` and a query reads ``nprobe``
    partitions of 64 uint8 codes + one norm per vector."""
    assigned = assign_ivf_centroids(
        embeddings, len(coarse_book), id_col=id_col, book=coarse_book
    )
    return sq_encode(
        assigned, bounds, id_col="vec_id", keep=("centroid_id",)
    )


def ivfsq_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    coarse_book: list | None = None,
    bounds: list[tuple[float, float]] | None = None,
    index: DataFrame | None = None,
    id_col: str = "vec_id",
    probe_state: tuple[list[float], float, list[int]] | None = None,
) -> DataFrame:
    """IVF-SQ8: the coarse quantizer prunes the scan to ``nprobe``
    inverted lists and the SQ8 codes price each survivor with one
    integer-array fold (driver-folded per-query constants, see
    :func:`sq_topk`) — the high-recall sibling of :func:`ivfpq_topk` at
    4× compression instead of ~60×, completing the quantizer matrix
    (IVF × {raw, PQ, residual-PQ, SQ8}). One bounds table serves every
    inverted list (like the raw-space PQ variant, which keeps the oracle
    replayable; per-list residual bounds are the production refinement).

    Returns ``(vec_id, centroid_id, code_check, sq_score)``."""
    if index is not None and (bounds is None or coarse_book is None):
        raise ValueError(
            "index provided without the bounds/coarse book it was built "
            "with (codes are meaningless under different bounds; probes "
            "under a different coarse book scan the wrong lists); pass "
            "all three"
        )
    if coarse_book is None:
        coarse_book = kmeans_codebook(
            embeddings, n_centroids=n_centroids, iters=iters, id_col=id_col
        )
    if bounds is None:
        bounds = sq_bounds(embeddings, id_col=id_col)
    if index is None:
        index = ivfsq_index(embeddings, coarse_book, bounds, id_col=id_col)
    if probe_state is not None:
        q, qn, probe_ids = probe_state
    else:
        q, qn, probe_ids, _ = _ivf_probe_state(
            embeddings, query_vec_id, n_centroids, nprobe, id_col,
            book=coarse_book,
        )
    if len(q) != len(bounds):
        raise ValueError(
            f"query has {len(q)} dims but bounds cover {len(bounds)}"
        )
    c0, w = _sq_score_terms(bounds, q)
    dim = len(bounds)
    score = F.expr(
        f"round(coalesce(({_lit_f(c0)} + {_dot_sql('qcode', w)}) "
        f"/ nullif(nrm * {_lit_f(qn)}, 0.0D), 0.0D), 6)"
    )
    check = F.expr(
        f"aggregate(zip_with(qcode, sequence(1, {dim}), "
        "(c, i) -> CAST(c AS BIGINT) * CAST(i AS BIGINT)), "
        "0L, (acc, v) -> acc + v)"
    )
    return (
        index.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            "centroid_id",
            check.alias("code_check"),
            score.alias("sq_score"),
        )
        .orderBy(F.desc("sq_score"), F.asc("vec_id"))
        .limit(k)
    )


def ivfsq_recall_multi(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    coarse_book: list | None = None,
    bounds: list[tuple[float, float]] | None = None,
    index: DataFrame | None = None,
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
    refine_factor: int | None = None,
) -> DataFrame:
    """Mean serving recall@k of the composed IVF-SQ8 rank (probe pruning
    + SQ8 ADC scoring) against the exact brute-force top-k — the
    end-to-end number that folds probe loss AND quantization loss for
    the scalar-quantized deployment, the :func:`ivfpq_recall_multi`
    sibling. One DAG for the whole battery: per-query probes and the
    driver-folded (C, w) terms ride broadcast tables.

    ``refine_factor`` switches the measured deployment to the two-stage
    mode (:func:`ivfsq_topk_refined`): SQ8 shortlist of
    ``refine_factor*k`` per query, exact-cosine rerank of only those
    raw vectors — within the probed lists the rerank recovers the
    (already small) SQ8 quantization error exactly."""
    from pyspark.sql import Window

    if index is not None and (bounds is None or coarse_book is None):
        raise ValueError(
            "index provided without the bounds/coarse book it was built "
            "with; pass all three"
        )
    if coarse_book is None:
        coarse_book = kmeans_codebook(
            embeddings, n_centroids=n_centroids, iters=iters, id_col=id_col
        )
    if bounds is None:
        bounds = sq_bounds(embeddings, id_col=id_col)
    if index is None:
        index = ivfsq_index(embeddings, coarse_book, bounds, id_col=id_col)
    q_rows, probe_rows = [], []
    for qid, qv, qn in _query_battery(embeddings, n_queries, id_col):
        ranked = sorted(
            (
                (_round6(_pydot(v, qv) / (cn * qn)) if cn * qn != 0.0 else 0.0, cid)
                for cid, v, cn in coarse_book
            ),
            key=lambda t: (-t[0], t[1]),
        )
        probe_rows.extend((qid, cid) for _, cid in ranked[:nprobe])
        c0, w = _sq_score_terms(bounds, qv)
        q_rows.append((qid, qv, qn, c0, w))
    spark = embeddings.sparkSession
    q_df = F.broadcast(
        spark.createDataFrame(
            q_rows,
            "qid BIGINT, q_emb ARRAY<DOUBLE>, q_nrm DOUBLE, "
            "c0 DOUBLE, w ARRAY<DOUBLE>",
        )
    )
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "qid BIGINT, centroid_id INT")
    )
    adc_score = F.expr(
        "round(coalesce((c0 + aggregate(zip_with(qcode, w, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)) / nullif(nrm * q_nrm, 0.0D), "
        "0.0D), 6)"
    )
    w_rank = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    samp = _recall_sample_filter("vec_id", sample_fraction)
    idx_side = index if samp is None else index.filter(samp)
    sq_ranked = (
        idx_side.join(probes, ["centroid_id"])
        .join(q_df, ["qid"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", adc_score.alias("c"))
        .withColumn("rn", F.row_number().over(w_rank))
    )
    if refine_factor is None:
        approx = sq_ranked.filter(F.col("rn") <= k).select("qid", "vec_id")
    else:
        if refine_factor < 1:
            raise ValueError(
                f"refine_factor must be >= 1, got {refine_factor}"
            )
        shortlist = sq_ranked.filter(
            F.col("rn") <= k * refine_factor
        ).select("qid", "vec_id")
        approx = (
            shortlist.join(
                embeddings.select(F.col(id_col).alias("vec_id"), "embedding"),
                ["vec_id"],
            )
            .join(q_df.select("qid", "q_emb", "q_nrm"), ["qid"])
            .select("qid", "vec_id", _recall_cos_expr().alias("c"))
            .withColumn("rn", F.row_number().over(w_rank))
            .filter(F.col("rn") <= k)
            .select("qid", "vec_id")
        )
    exact = _exact_topk_per_query(
        embeddings, q_df, w_rank, k, id_col, sample_fraction
    )
    return _recall_reduce(approx, exact, k, n_queries)


def ivfsq_topk_refined(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    **ivfsq_kwargs,
) -> DataFrame:
    """Two-stage IVF-SQ8 retrieval: SQ8 shortlist, exact rerank — the
    :func:`ivfpq_topk_refined` sibling completing the serving matrix
    ({PQ, SQ8} × {unrefined, refined}): the scalar-quantized index
    prices ``refine_factor·k`` candidates with the driver-folded
    (C, w) integer fold, then ONLY those candidates' raw vectors are
    fetched and scored with the exact cosine, and the top ``k`` by
    exact score are returned. SQ8's quantization error is already small
    (4× compression), so the rerank mostly re-breaks rounding ties —
    recall ≥ the unrefined mode is pytest-pinned. Cost:
    ``refine_factor·k`` raw-vector reads per query, independent of
    corpus size.

    Plan shape: the shortlist (tiny by construction) broadcasts into a
    hash join against the raw table — no shuffle of the corpus. Returns
    ``(vec_id, sq_score, cosine)`` so the pinned values witness BOTH
    stages."""
    if refine_factor < 1:
        raise ValueError(
            f"refine_factor must be >= 1, got {refine_factor}"
        )
    shortlist = ivfsq_topk(
        embeddings, query_vec_id, k=k * refine_factor, id_col=id_col,
        **ivfsq_kwargs,
    ).select("vec_id", "sq_score")
    return _exact_rerank(
        shortlist, embeddings, query_vec_id, k, "sq_score", id_col
    )


def ivfpq_index(
    embeddings: DataFrame,
    coarse_book: list[tuple[int, list[float], float]],
    pq_books: list[list[tuple[int, list[float], float]]],
    sub_dim: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVF-PQ stored index: ``(vec_id, centroid_id, code, nrm)`` —
    coarse assignment for partition pruning plus the PQ code word for
    compressed scoring, built in ONE map-only pass (the assignment rides
    through the encode projection; no join). At 100 TB this table is
    written partitioned by ``centroid_id`` and is all a query ever
    reads."""
    assigned = assign_ivf_centroids(
        embeddings, len(coarse_book), id_col=id_col, book=coarse_book
    )
    return pq_encode(
        assigned, pq_books, sub_dim=sub_dim, id_col="vec_id",
        keep=("centroid_id",),
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 8,
    iters: int = 2,
    coarse_book: list | None = None,
    pq_books: list | None = None,
    index: DataFrame | None = None,
    id_col: str = "vec_id",
    probe_state: tuple[list[float], float, list[int]] | None = None,
) -> DataFrame:
    """IVF-PQ: the composed billion-scale serving topology — the coarse
    quantizer prunes the scan to ``nprobe`` inverted lists (storage
    partitions at scale) and the PQ code word prices each surviving
    vector with m lookup-table reads (ADC). This variant scores raw-space
    codes (IVFFlat-style PQ, no residual re-encoding): one code book
    serves every inverted list, which keeps the oracle replayable and the
    index one map-only pass; residual PQ is the accuracy refinement a
    production tuner would add per-list.

    Returns ``(vec_id, centroid_id, code_packed, pq_score)``."""
    if index is not None and (pq_books is None or coarse_book is None):
        raise ValueError(
            "index provided without the books it was built with (codes "
            "are meaningless under a different book; probes under a "
            "different coarse book scan the wrong lists); pass both"
        )
    if coarse_book is None:
        coarse_book = kmeans_codebook(
            embeddings, n_centroids=n_centroids, iters=iters, id_col=id_col
        )
    if pq_books is None:
        pq_books = pq_codebooks(
            embeddings, m=m, sub_dim=sub_dim, k_sub=k_sub, iters=iters,
            id_col=id_col,
        )
    if index is None:
        index = ivfpq_index(
            embeddings, coarse_book, pq_books, sub_dim=sub_dim, id_col=id_col
        )
    if probe_state is not None:
        q, qn, probe_ids = probe_state
    else:
        q, qn, probe_ids, _ = _ivf_probe_state(
            embeddings, query_vec_id, n_centroids, nprobe, id_col,
            book=coarse_book,
        )
    if len(q) != m * sub_dim:
        raise ValueError(
            f"m*sub_dim = {m * sub_dim} must cover the full embedding "
            f"dimension ({len(q)})"
        )
    score, packed = _adc_exprs(pq_books, q, qn, sub_dim, k_sub)
    return (
        index.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            "centroid_id",
            packed.alias("code_packed"),
            score.alias("pq_score"),
        )
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(k)
    )


def ivfpq_topk_refined(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    **ivfpq_kwargs,
) -> DataFrame:
    """Two-stage retrieval: ADC shortlist, exact rerank — the standard
    IVF-PQ serving refinement (Jegou et al. 2011 §V): the compressed
    index prices ``refine_factor·k`` candidates with lookup tables,
    then ONLY those candidates' raw vectors are fetched and scored with
    the exact cosine, and the top ``k`` by exact score are returned.
    Recovers most of the quantization error at the cost of
    ``refine_factor·k`` raw-vector reads per query — independent of
    corpus size, so the refine stage stays O(k) at 100 TB.

    Plan shape: the shortlist (tiny by construction) broadcasts into a
    hash join against the raw table — no shuffle of the corpus; the
    exact cosine reuses the broadcast 1-row query side of
    :func:`cosine_topk`. Returns ``(vec_id, pq_score, cosine)`` so the
    pinned values witness BOTH stages.
    """
    if refine_factor < 1:
        raise ValueError(
            f"refine_factor must be >= 1, got {refine_factor}"
        )
    shortlist = ivfpq_topk(
        embeddings, query_vec_id, k=k * refine_factor, id_col=id_col,
        **ivfpq_kwargs,
    ).select("vec_id", "pq_score")
    return _exact_rerank(
        shortlist, embeddings, query_vec_id, k, "pq_score", id_col
    )


def _exact_rerank(
    shortlist: DataFrame,
    embeddings: DataFrame,
    query_vec_id,
    k: int,
    score_col: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """The shared second stage of every refined serving mode: broadcast
    the tiny ``(vec_id, <approx score>)`` shortlist into a hash join
    against the raw table (no corpus shuffle, O(shortlist) raw reads),
    score the exact cosine against the broadcast 1-row query side, and
    return the top ``k`` by exact score as ``(vec_id, <score_col>,
    cosine)`` — both stages' values in the output."""
    if id_col != "vec_id":
        shortlist = shortlist.withColumnRenamed("vec_id", id_col)
    q = F.broadcast(
        embeddings.filter(F.col(id_col) == F.lit(query_vec_id)).select(
            F.col("embedding").alias("q_emb"),
            l2_norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    cos = F.round(
        F.coalesce(
            dot(F.col("embedding"), F.col("q_emb"))
            / F.nullif(l2_norm(F.col("embedding")) * F.col("q_nrm"), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )
    return (
        embeddings.join(F.broadcast(shortlist), id_col)
        .join(q)
        .select(
            F.col(id_col).alias("vec_id"),
            score_col,
            cos.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _adc_exprs(
    pq_books: list,
    q: list[float],
    qn: float,
    sub_dim: int,
    k_sub: int,
    bias_sql: str | None = None,
) -> tuple:
    """(score, code_packed) Columns for ADC scoring a ``(code, nrm)``
    relation: lookup tables are computed here, driver-side, and inlined
    as literal arrays (O(m·k_sub) doubles — coordinator state, like the
    IVF codebook). ``bias_sql`` adds a per-row SQL term inside the sum —
    the residual variant passes the coarse centroid·query dot, since a
    residual code reconstructs ``x ≈ c + r̂`` and so
    ``x·q ≈ c·q + Σ LUT``."""
    m = len(pq_books)
    # validate the BOOKS actually used, not just the caller's m/sub_dim
    # parameters: books with a different geometry would zip-truncate the
    # LUT dots and silently zero half the terms (review r4)
    if m * sub_dim != len(q):
        raise ValueError(
            f"{m} books x sub_dim {sub_dim} must cover the query dimension "
            f"({len(q)}); pass the m/sub_dim the books were trained with"
        )
    terms = []
    for mi, book in enumerate(pq_books):
        if book and len(book[0][1]) != sub_dim:
            raise ValueError(
                f"subspace {mi} book has {len(book[0][1])}-dim centroids, "
                f"expected sub_dim={sub_dim} — books/geometry mismatch"
            )
        sub_q = q[mi * sub_dim : (mi + 1) * sub_dim]
        lut = [_pydot(v, sub_q) for _cid, v, _cn in book]
        arr = "array(" + ",".join(_lit_f(x) for x in lut) + ")"
        terms.append(f"element_at({arr}, code[{mi}] + 1)")
    if bias_sql is not None:
        terms = [bias_sql] + terms
    score = F.expr(
        f"round(coalesce(({' + '.join(terms)})"
        f" / nullif(nrm * {_lit_f(qn)}, 0.0D), 0.0D), 6)"
    )
    packed = F.expr(
        " + ".join(
            f"CAST(code[{mi}] AS BIGINT) * {k_sub ** (m - 1 - mi)}"
            for mi in range(m)
        )
    )
    return score, packed


def _cents_array_sql(book: list[tuple[int, list[float], float]]) -> str:
    """Literal array-of-arrays of the codebook's centroid vectors,
    indexable by ``centroid_id + 1`` — requires dense ids 0..n-1 (the
    first-ids init guarantees this; guarded)."""
    if [cid for cid, _, _ in book] != list(range(len(book))):
        raise ValueError(
            f"dense centroid ids 0..{len(book) - 1} required, got "
            f"{[c for c, _, _ in book]}"
        )
    return (
        "array("
        + ",".join(
            "array(" + ",".join(_lit_f(x) for x in v) + ")" for _c, v, _n in book
        )
        + ")"
    )


def ivf_residuals(
    embeddings: DataFrame,
    coarse_book: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector coarse residual ``r = x − c(x)`` with the raw-vector
    norm carried: ``(vec_id, embedding=residual, centroid_id, nrm_x)``.

    Map-only: the coarse assignment inlines the codebook (no join), and
    the residual subtracts the assigned centroid via one
    ``element_at(literal centroids, centroid_id + 1)`` lookup. This is
    the residual-encoding front half of IVFADC (Jégou et al. 2011): the
    product quantizer trains on and encodes residuals, which are
    smaller-magnitude and better centered than raw vectors, so the same
    code budget spends on finer quantization cells."""
    assigned = assign_ivf_centroids(
        embeddings, len(coarse_book), id_col=id_col, book=coarse_book
    )
    cents = _cents_array_sql(coarse_book)
    residual = F.expr(
        f"zip_with(embedding, element_at({cents}, centroid_id + 1), "
        "(x, c) -> CAST(x AS DOUBLE) - c)"
    )
    return assigned.select(
        "vec_id",
        "centroid_id",
        l2_norm(F.col("embedding")).alias("nrm_x"),
        residual.alias("embedding"),
    )


def residual_pq_codebooks(
    embeddings: DataFrame,
    coarse_book: list[tuple[int, list[float], float]],
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
) -> list[list[tuple[int, list[float], float]]]:
    """PQ codebooks trained on coarse RESIDUALS — same deterministic
    per-subspace Lloyd as :func:`pq_codebooks` (the oracle replays it
    from the residual relation), trained once globally across lists
    (IVFADC's shared residual quantizer, not per-list books)."""
    return pq_codebooks(
        ivf_residuals(embeddings, coarse_book, id_col=id_col),
        m=m, sub_dim=sub_dim, k_sub=k_sub, iters=iters, id_col="vec_id",
    )


def ivfpq_residual_index(
    embeddings: DataFrame,
    coarse_book: list[tuple[int, list[float], float]],
    pq_books: list[list[tuple[int, list[float], float]]],
    sub_dim: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual IVF-PQ stored index: ``(vec_id, centroid_id, code,
    nrm)`` where ``code`` quantizes the residual ``x − c(x)`` under
    residual-trained books and ``nrm`` is the RAW vector norm (cosine
    reconstruction needs |x|, not |r|). Same one-pass map-only build and
    the same ~60x footprint as the raw-space index."""
    res = ivf_residuals(embeddings, coarse_book, id_col=id_col)
    return pq_encode(
        res, pq_books, sub_dim=sub_dim, id_col="vec_id",
        keep=("centroid_id", "nrm_x"),
    ).select("vec_id", "centroid_id", "code", F.col("nrm_x").alias("nrm"))


def ivfpq_residual_topk(
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 8,
    iters: int = 2,
    coarse_book: list | None = None,
    pq_books: list | None = None,
    index: DataFrame | None = None,
    id_col: str = "vec_id",
    probe_state: tuple[list[float], float, list[int]] | None = None,
) -> DataFrame:
    """Residual IVF-PQ top-k — IVFADC proper: probed lists are scored
    ``(c·q + Σ LUT_mi[code_mi]) / (|x|·|q|)`` where the lookup tables
    index residual-space centroids and ``c·q`` is the probed list's
    coarse dot (one driver-side double per probed list, inlined). The
    accuracy refinement over :func:`ivfpq_topk`'s raw-space codes:
    residuals are smaller-magnitude, so quantization cells are finer at
    the same code budget (recall gain pinned by
    :func:`ivfpq_recall_multi` in tests and the registry).

    Returns ``(vec_id, centroid_id, code_packed, pq_score)``."""
    if index is not None and (pq_books is None or coarse_book is None):
        raise ValueError(
            "index provided without the books it was built with (codes "
            "are meaningless under a different book; probes under a "
            "different coarse book scan the wrong lists); pass both"
        )
    if coarse_book is None:
        coarse_book = kmeans_codebook(
            embeddings, n_centroids=n_centroids, iters=iters, id_col=id_col
        )
    if pq_books is None:
        pq_books = residual_pq_codebooks(
            embeddings, coarse_book, m=m, sub_dim=sub_dim, k_sub=k_sub,
            iters=iters, id_col=id_col,
        )
    if index is None:
        index = ivfpq_residual_index(
            embeddings, coarse_book, pq_books, sub_dim=sub_dim, id_col=id_col
        )
    if probe_state is not None:
        q, qn, probe_ids = probe_state
    else:
        q, qn, probe_ids, _ = _ivf_probe_state(
            embeddings, query_vec_id, n_centroids, nprobe, id_col,
            book=coarse_book,
        )
    if len(q) != m * sub_dim:
        raise ValueError(
            f"m*sub_dim = {m * sub_dim} must cover the full embedding "
            f"dimension ({len(q)})"
        )
    cq = [_pydot(v, q) for _c, v, _n in coarse_book]
    cq_arr = "array(" + ",".join(_lit_f(x) for x in cq) + ")"
    score, packed = _adc_exprs(
        pq_books, q, qn, sub_dim, k_sub,
        bias_sql=f"element_at({cq_arr}, centroid_id + 1)",
    )
    return (
        index.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            "centroid_id",
            packed.alias("code_packed"),
            score.alias("pq_score"),
        )
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(k)
    )


def ivfpq_recall_multi(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 8,
    iters: int = 2,
    residual: bool = False,
    coarse_book: list | None = None,
    pq_books: list | None = None,
    index: DataFrame | None = None,
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
    refine_factor: int | None = None,
) -> DataFrame:
    """Mean serving recall@k of the composed IVF-PQ rank (probe pruning
    + ADC scoring, raw-space or residual) against the exact brute-force
    top-k — the end-to-end number that folds probe loss AND quantization
    loss, i.e. what a deployment actually serves. One DAG for the whole
    query battery, same shape as :func:`pq_recall_multi`; the residual
    variant's per-query coarse dots ride the query table as one more
    broadcast array column."""
    from pyspark.sql import Window

    if index is not None and (pq_books is None or coarse_book is None):
        raise ValueError(
            "index provided without the books it was built with; pass both"
        )
    if coarse_book is None:
        coarse_book = kmeans_codebook(
            embeddings, n_centroids=n_centroids, iters=iters, id_col=id_col
        )
    if pq_books is None:
        pq_books = (
            residual_pq_codebooks(
                embeddings, coarse_book, m=m, sub_dim=sub_dim, k_sub=k_sub,
                iters=iters, id_col=id_col,
            )
            if residual
            else pq_codebooks(
                embeddings, m=m, sub_dim=sub_dim, k_sub=k_sub, iters=iters,
                id_col=id_col,
            )
        )
    if index is None:
        index = (
            ivfpq_residual_index(
                embeddings, coarse_book, pq_books, sub_dim=sub_dim,
                id_col=id_col,
            )
            if residual
            else ivfpq_index(
                embeddings, coarse_book, pq_books, sub_dim=sub_dim,
                id_col=id_col,
            )
        )
    q_rows, probe_rows = [], []
    for qid, qv, qn in _query_battery(embeddings, n_queries, id_col):
        ranked = sorted(
            (
                (_round6(_pydot(v, qv) / (cn * qn)) if cn * qn != 0.0 else 0.0, cid)
                for cid, v, cn in coarse_book
            ),
            key=lambda t: (-t[0], t[1]),
        )
        probe_rows.extend((qid, cid) for _, cid in ranked[:nprobe])
        luts = [
            [_pydot(v, qv[mi * sub_dim : (mi + 1) * sub_dim]) for _c, v, _n in book]
            for mi, book in enumerate(pq_books)
        ]
        cq = [_pydot(v, qv) for _c, v, _n in coarse_book]
        q_rows.append((qid, qv, qn, *luts, cq))
    spark = embeddings.sparkSession
    lut_cols = ", ".join(f"lut{mi} ARRAY<DOUBLE>" for mi in range(m))
    q_df = F.broadcast(
        spark.createDataFrame(
            q_rows,
            f"qid BIGINT, q_emb ARRAY<DOUBLE>, q_nrm DOUBLE, {lut_cols}, "
            "cq ARRAY<DOUBLE>",
        )
    )
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "qid BIGINT, centroid_id INT")
    )
    adc_terms = " + ".join(
        f"element_at(lut{mi}, code[{mi}] + 1)" for mi in range(m)
    )
    if residual:
        adc_terms = f"element_at(cq, centroid_id + 1) + {adc_terms}"
    adc_score = F.expr(
        f"round(coalesce(({adc_terms}) / nullif(nrm * q_nrm, 0.0D), 0.0D), 6)"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    samp = _recall_sample_filter("vec_id", sample_fraction)
    idx_side = index if samp is None else index.filter(samp)
    adc_ranked = (
        idx_side.join(probes, ["centroid_id"])
        .join(q_df, ["qid"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", adc_score.alias("c"))
        .withColumn("rn", F.row_number().over(w))
    )
    if refine_factor is None:
        approx = adc_ranked.filter(F.col("rn") <= k).select("qid", "vec_id")
    else:
        # two-stage serving (ivfpq_topk_refined): ADC shortlist of
        # refine_factor*k per query, exact-cosine rerank of only those
        # raw vectors, top-k by exact score — so this metric measures
        # what the REFINED deployment serves
        if refine_factor < 1:
            raise ValueError(
                f"refine_factor must be >= 1, got {refine_factor}"
            )
        shortlist = adc_ranked.filter(
            F.col("rn") <= k * refine_factor
        ).select("qid", "vec_id")
        approx = (
            shortlist.join(
                embeddings.select(F.col(id_col).alias("vec_id"), "embedding"),
                ["vec_id"],
            )
            .join(q_df.select("qid", "q_emb", "q_nrm"), ["qid"])
            .select("qid", "vec_id", _recall_cos_expr().alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("qid", "vec_id")
        )
    exact = _exact_topk_per_query(
        embeddings, q_df, w, k, id_col, sample_fraction
    )
    return _recall_reduce(approx, exact, k, n_queries)


def ivf_recall_multi(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    book: list[tuple[int, list[float], float]] | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Mean recall@k of the IVF probe over the first ``n_queries`` vectors
    — the index-quality number a deployment tunes nprobe / centroid count
    / training against (a single query's recall is noise).
    ``sample_fraction`` restricts BOTH sides' candidate corpus to a
    deterministic hash sample (see :func:`_recall_sample_filter`) so the
    metric stays runnable when the corpus won't brute-force.

    One DAG for all queries: the query table and the per-query probed
    centroid pairs are tiny driver-side artifacts (broadcast), the IVF and
    exact candidate sets are ranked with one window each partitioned by
    query id, and the result reduces to a single row.
    """
    from pyspark.sql import Window

    if book is None:
        book = _codebook(embeddings, n_centroids, id_col)
    q_rows, probe_rows = [], []
    for qid, qv, qn in _query_battery(embeddings, n_queries, id_col):
        ranked = sorted(
            (
                (_round6(_pydot(v, qv) / (cn * qn)) if cn * qn != 0.0 else 0.0, cid)
                for cid, v, cn in book
            ),
            key=lambda t: (-t[0], t[1]),
        )
        q_rows.append((qid, qv, qn))
        probe_rows.extend((qid, cid) for _, cid in ranked[:nprobe])

    spark = embeddings.sparkSession
    q_df = F.broadcast(
        spark.createDataFrame(q_rows, "qid BIGINT, q_emb ARRAY<DOUBLE>, q_nrm DOUBLE")
    )
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "qid BIGINT, centroid_id BIGINT")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    samp = _recall_sample_filter("vec_id", sample_fraction)
    assigned = assign_ivf_centroids(
        embeddings, n_centroids, id_col=id_col, book=book
    ).withColumn("centroid_id", F.col("centroid_id").cast("bigint"))
    if samp is not None:
        assigned = assigned.filter(samp)
    ivf = (
        assigned.join(probes, ["centroid_id"])
        .join(q_df, ["qid"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _recall_cos_expr().alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    exact = _exact_topk_per_query(
        embeddings, q_df, w, k, id_col, sample_fraction
    )
    return _recall_reduce(ivf, exact, k, n_queries)


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
    with_bucket = fan_out(embeddings).withColumn(
        "bucket", lsh_bucket(F.col("embedding"), planes)
    )
    q = F.broadcast(
        with_bucket.filter(F.col(id_col) == F.lit(query_vec_id)).select(
            F.col("embedding").alias("q_emb"),
            F.col("bucket").alias("q_bucket"),
            l2_norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    cos = F.round(
        F.coalesce(
            dot(F.col("embedding"), F.col("q_emb"))
            / F.nullif(l2_norm(F.col("embedding")) * F.col("q_nrm"), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )
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


def _layout_epoch_scheme(spark, path: str) -> bool | None:
    """Partition-scheme probe of a stored layout: True if the tree
    carries the ``epoch`` partition level, False if not, None if the
    path doesn't exist or is empty (fresh write — no constraint).
    Reading BEFORE appending is exactly when the tree is still
    consistent, so partition discovery is reliable here."""
    try:
        return "epoch" in spark.read.parquet(path).columns
    except Exception:
        return None


def _require_epoch_scheme_match(
    spark, path: str, epoch_id: int | None, fn: str
) -> None:
    """Appending with ``epoch_id`` into a base written WITHOUT the epoch
    partition level (or plainly into an epoch-partitioned base) writes a
    mixed-depth parquet tree that only fails at read time, after the
    on-disk layout is already corrupted (ADVICE r5) — fail loudly at
    write time instead, mirroring the ``book=None`` guard."""
    has = _layout_epoch_scheme(spark, path)
    if has is True and epoch_id is None:
        raise ValueError(
            f"{fn}: layout at {path!r} is epoch-partitioned; pass "
            "epoch_id so the append lands as an idempotent per-epoch "
            "overwrite (a plain append would corrupt the partition tree)"
        )
    if has is False and epoch_id is not None:
        raise ValueError(
            f"{fn}: layout at {path!r} has no epoch partition level; "
            "rebuild the base with epoch=-1 (write_*_layout(..., "
            "epoch=-1)) before epoch-stamped appends"
        )


def write_ivf_layout(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    book: list[tuple[int, list[float], float]] | None = None,
    epoch: int | None = None,
) -> None:
    """Persist the corpus in IVF storage layout: parquet partitioned by
    ``centroid_id`` (one directory per inverted list). The index-build
    half of ANN at 100 TB — assignment runs once at write time; every
    query after that scans only its probed partitions. Pass the same
    (trained) ``book`` to :func:`ivf_topk_from_layout` so probes rank the
    centroids the layout was built with. ``epoch`` (e.g. ``-1`` for the
    base build) adds the idempotent-append partition level (see
    :func:`write_ivfpq_layout`)."""
    assigned = assign_ivf_centroids(
        embeddings, n_centroids, id_col=id_col, book=book
    )
    if epoch is not None:
        (
            assigned.withColumn("epoch", F.lit(int(epoch)).cast("long"))
            .write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .parquet(path)
        )
    else:
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
            path
        )


def append_ivf_layout(
    new_vectors: DataFrame,
    path: str,
    book: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    epoch_id: int | None = None,
) -> None:
    """Append a batch of new vectors to a STORED plain-IVF layout
    without rebuilding — the maintenance counterpart
    :func:`append_ivfpq_layout` gave the PQ topology (r4 verdict item
    #5): the batch is coarse-assigned with the SAME frozen ``book`` the
    layout was built with and appended into the existing
    ``centroid_id`` partition directories. Per-batch cost is O(batch),
    the resident lists never rewrite, and probes see the new vectors as
    soon as the append commits. Result-equal to a full rebuild over the
    union corpus (pytest-pinned): assignment is a pure per-row function
    of (vector, book). ``book`` is required — assignment under a
    retrained book would scatter the batch across DIFFERENT lists than
    the resident corpus, silently corrupting probe recall.

    ``epoch_id`` (r5 verdict item #3): without it the append is plain
    ``mode("append")`` — at-least-once under streaming replay, and
    duplicated vectors CHANGE top-k. With it, the batch lands as a
    writer-scoped dynamic overwrite of its own ``(centroid_id, epoch)``
    partitions, so a replayed epoch overwrites itself (requires a base
    written with ``epoch=-1``; scheme mismatch fails loudly here, not
    at some later read)."""
    if book is None:
        raise ValueError(
            "append_ivf_layout requires the book the layout was "
            "partitioned with (appending under a different book files "
            "vectors into the wrong inverted lists)"
        )
    _require_epoch_scheme_match(
        new_vectors.sparkSession, path, epoch_id, "append_ivf_layout"
    )
    assigned = assign_ivf_centroids(
        new_vectors, len(book), id_col=id_col, book=book
    )
    if epoch_id is not None:
        (
            assigned.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid_id", "epoch")
            .parquet(path)
        )
    else:
        assigned.write.mode("append").partitionBy("centroid_id").parquet(path)


def append_lsh_layout(
    new_vectors: DataFrame,
    path: str,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    epoch_id: int | None = None,
) -> None:
    """Append a batch of new vectors to a STORED LSH layout without
    rebuilding (r4 verdict item #5, the hash-family twin of
    :func:`append_ivf_layout`): the batch is bucketed with the same
    deterministic hyperplane family (:func:`hyperplane_signs` is a pure
    function of ``(n_planes, dim)`` — the planes are frozen by
    construction, no persisted artifact needed) and appended into the
    existing ``bucket`` partition directories. Result-equal to a full
    rebuild over the union corpus (pytest-pinned); pass the SAME
    ``n_planes``/``dim`` the layout was written with — a different
    geometry would bucket the batch under a different family than the
    resident corpus. ``epoch_id``: same idempotent per-epoch dynamic
    overwrite (and the same write-time scheme guard) as
    :func:`append_ivf_layout`."""
    _require_epoch_scheme_match(
        new_vectors.sparkSession, path, epoch_id, "append_lsh_layout"
    )
    planes = hyperplane_signs(n_planes, dim)
    bucketed = fan_out(new_vectors).withColumn(
        "bucket", lsh_bucket(F.col("embedding"), planes)
    )
    if epoch_id is not None:
        (
            bucketed.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "epoch")
            .parquet(path)
        )
    else:
        bucketed.write.mode("append").partitionBy("bucket").parquet(path)


def _layout_list_key(cols: list[str]) -> str:
    """The inverted-list partition key of a stored ANN layout — the
    IVF families partition by ``centroid_id``, the LSH family by
    ``bucket``; anything else is not a layout this maintenance pair
    understands."""
    if "centroid_id" in cols:
        return "centroid_id"
    if "bucket" in cols:
        return "bucket"
    raise ValueError(
        "not an ANN layout: expected a centroid_id or bucket partition "
        f"column, found {cols!r}"
    )


# Test-only fault-injection point: called between compact_ann_layout's
# two directory renames (layout parked, replacement not yet in place) so
# the heal-on-rerun recovery is pinned by an actually interrupted run.
_between_layout_renames_hook = None


def compact_ann_layout(
    spark, path: str, upto_epoch: int | None = None
) -> None:
    """Compact a stored ANN layout grown by per-epoch appends — the
    ANN twin of :func:`operators.dedup.compact_dedup_index` (r5 verdict
    item #4): continuous ingest accumulates one file-set per epoch per
    inverted-list directory, and the r5 scale probe measured the same
    small-file accumulation costing +42% probe wall on the dedup index.
    Epochs at or below ``upto_epoch`` (default: ALL epochs) fold into
    the baseline ``epoch = -1`` partition and every directory is
    rewritten as ONE file (a repartition on the partition keys routes
    each directory's rows to a single task), so listing and scan costs
    return to base-build shape. Works on any layout family
    (IVF / IVF-PQ / residual / LSH — the partition key is discovered
    from the tree) and is a no-op semantically: probes read named
    columns under partition filters, so fold + rewrite is
    result-invariant (pytest-pinned probe equality).

    **Replay caveat (the log-compaction rule)**: folding epoch N into
    the baseline forfeits the per-epoch overwrite idempotency for N —
    a LATER replay of epoch N would re-add its vectors alongside the
    folded copies. Only compact epochs your streaming checkpoint has
    committed (they can never re-fire); under availableNow/sequential
    epochs that is every epoch once the query terminates. Layouts
    without an epoch level just get the file rewrite.

    **Crash contract — heal by re-running** (the
    :func:`operators.dedup.compact_dedup_index` contract, via a staged
    side-write): the compacted tree is written NEXT TO the layout
    (``<path>__compacting``) while the original keeps serving, then
    swapped in with two directory renames — the layout is never the
    write target of a long job, so a crash during the data pass leaves
    it untouched. The only unguarded instant is between the two
    renames (layout absent, original parked at ``<path>__precompact``),
    and re-running compaction detects and heals exactly that state
    before doing anything else (fault-injection pytest). Renames go
    through the path's Hadoop ``FileSystem``, so the same swap works on
    HDFS/S3A-committer-style stores, not just local disk."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    jpath, stage, parked = (
        HPath(path),
        HPath(path + "__compacting"),
        HPath(path + "__precompact"),
    )
    fs = jpath.getFileSystem(hconf)
    # heal a previous run that died between its two renames
    if not fs.exists(jpath) and fs.exists(parked):
        fs.rename(parked, jpath)
    if fs.exists(stage):
        fs.delete(stage, True)  # stale partial stage from a dead run
    df = spark.read.parquet(path)
    key = _layout_list_key(df.columns)
    has_epoch = "epoch" in df.columns
    part_cols = [key, "epoch"] if has_epoch else [key]
    if has_epoch:
        fold = (
            F.col("epoch") <= F.lit(int(upto_epoch))
            if upto_epoch is not None
            else F.lit(True)
        )
        df = df.withColumn(
            "epoch",
            F.when(fold, F.lit(-1).cast("long")).otherwise(F.col("epoch")),
        )
    (
        df.repartition(*[F.col(c) for c in part_cols])
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(path + "__compacting")
    )
    if fs.exists(parked):
        fs.delete(parked, True)
    fs.rename(jpath, parked)
    if _between_layout_renames_hook is not None:
        _between_layout_renames_hook()
    fs.rename(stage, jpath)
    fs.delete(parked, True)


def layout_stats(spark, path: str) -> DataFrame:
    """One-row health summary of a stored ANN layout — the
    observability twin of :func:`operators.dedup.dedup_index_stats`:
    ``n_files / n_lists`` is the small-file dial (it grows by ~1 per
    append per touched directory and returns to ~1.0 after
    :func:`compact_ann_layout`); ``n_epochs`` counts distinct epoch
    partitions still unfolded (0 = the layout has no epoch level).
    Columns: ``(n_rows, n_lists, n_epochs, n_files,
    avg_rows_per_file)``. One scan, one scalar aggregation — a
    maintenance probe, not a serving query."""
    df = spark.read.parquet(path)
    key = _layout_list_key(df.columns)
    has_epoch = "epoch" in df.columns
    # input_file_name() is non-deterministic, so it must be projected to
    # a plain column before the distinct aggregate may touch it
    df = df.withColumn("_file", F.input_file_name())
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(key).alias("n_lists"),
        (
            F.countDistinct("epoch")
            if has_epoch
            else F.lit(0).cast("long")
        ).alias("n_epochs"),
        F.countDistinct("_file").alias("n_files"),
    ).select(
        "n_rows",
        "n_lists",
        "n_epochs",
        "n_files",
        F.round(F.col("n_rows") / F.col("n_files"), 1).alias(
            "avg_rows_per_file"
        ),
    )


def ivf_topk_from_layout(
    spark,
    layout_path: str,
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    book: list[tuple[int, list[float], float]] | None = None,
) -> DataFrame:
    """IVF top-k against the stored layout written by
    :func:`write_ivf_layout`: the ``centroid_id IN (probes)`` filter is a
    *partition* filter on the layout's directory key, so the scan lists
    and reads only ``nprobe`` of ``n_centroids`` partitions — the corpus
    is never re-assigned, and the unprobed inverted lists cost zero I/O
    (assert via PushedFilters/PartitionFilters in the plan).

    Same results as :func:`ivf_topk` with the same parameters (pass the
    ``book`` the layout was written with).
    """
    q, qn, probe_ids, _ = _ivf_probe_state(
        embeddings, query_vec_id, n_centroids, nprobe, id_col, book=book
    )
    stored = spark.read.parquet(layout_path)
    e = F.col("embedding")
    cos = F.round(
        F.coalesce(
            dot(e, _lit_vec(q)) / F.nullif(l2_norm(e) * F.lit(qn), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )
    return (
        stored.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col(id_col) != F.lit(query_vec_id))
        .select(F.col(id_col).alias("vec_id"), "centroid_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def save_books(path: str, **books) -> None:
    """Persist codebooks as a JSON artifact next to a stored layout —
    the index-metadata half of the lifecycle (`write_*_layout` stores
    the data half). A probe MUST rank with the books the layout was
    built with (codes are meaningless under a different book), so a
    deployment ships them together; JSON keeps the artifact
    human-auditable and engine-independent. Accepts any mix of
    ``coarse_book=[(cid, vec, norm), ...]``,
    ``pq_books=[[(cid, vec, norm), ...], ...]``, and SQ8
    ``bounds=[(mn, mx), ...]`` keyword entries (r7 — the scalar
    quantizer's training artifact ships under the same contract)."""
    import json

    def enc(b):
        if b and isinstance(b[0], list):  # list of books (PQ)
            return [enc(sub) for sub in b]
        if b and len(b[0]) == 2:  # SQ8 per-dimension (min, max) bounds
            return [{"mn": float(mn), "mx": float(mx)} for mn, mx in b]
        return [
            {"cid": int(c), "vec": [float(x) for x in v], "norm": float(n)}
            for c, v, n in b
        ]

    with open(path, "w") as f:
        # allow_nan=False: a NaN/inf component (e.g. from a NaN embedding
        # propagating through a Lloyd mean) must fail loudly HERE, not
        # produce a non-standard token no strict parser reads (review r4)
        json.dump({k: enc(v) for k, v in books.items()}, f, allow_nan=False)


def load_books(path: str) -> dict:
    """Load codebooks saved by :func:`save_books`; tuples round-trip
    exactly (JSON doubles are IEEE-754, same as the literals the probes
    inline)."""
    import json

    def dec(b):
        if b and isinstance(b[0], list):
            return [dec(sub) for sub in b]
        if b and "mn" in b[0]:  # SQ8 bounds
            return [(e["mn"], e["mx"]) for e in b]
        return [(e["cid"], e["vec"], e["norm"]) for e in b]

    with open(path) as f:
        return {k: dec(v) for k, v in json.load(f).items()}


def append_ivfpq_layout(
    new_vectors: DataFrame,
    path: str,
    coarse_book: list[tuple[int, list[float], float]],
    pq_books: list[list[tuple[int, list[float], float]]],
    sub_dim: int = 16,
    id_col: str = "vec_id",
    residual: bool = False,
    epoch_id: int | None = None,
) -> None:
    """Append a batch of new vectors to a STORED IVF-PQ layout without
    rebuilding — continuous ingestion for the ANN family (the analog of
    :func:`operators.dedup.incremental_dedup_probe`'s stored-index
    topology): the batch is coarse-assigned and PQ-encoded with the
    SAME persisted books the layout was built with (load them via
    :func:`load_books`), then appended into the existing
    ``centroid_id`` partition directories — per-batch cost is O(batch),
    the resident index never rewrites, and probes see the new vectors
    with zero index downtime. Result-equal to a full rebuild over the
    union corpus (pytest-pinned): encoding is a pure per-row function
    of (vector, books).

    Quantization drift is the documented trade: books stay frozen
    between retrainings, so a batch from a shifted distribution encodes
    with yesterday's centroids — monitor via the recall entries
    (:func:`ivfpq_recall_multi` on a hash sample) and retrain + rewrite
    when recall decays, exactly like any production IVF deployment.

    **Replay safety** (``epoch_id``): a plain append is at-least-once —
    a crash between the parquet commit and a streaming checkpoint
    commit re-fires the epoch and duplicates its vectors, and unlike
    the dedup index (where re-appended rows are benign) duplicated
    vectors CHANGE top-k and recall results (ADVICE r4). With
    ``epoch_id`` set, the batch lands as a writer-scoped DYNAMIC
    OVERWRITE of its own ``(centroid_id, epoch)`` partitions — a
    replayed epoch deterministically re-encodes the same rows and
    overwrites itself, making the append idempotent. Requires a layout
    whose base was written with an ``epoch`` partition level
    (``write_ivfpq_layout(..., epoch=-1)``): parquet partition
    discovery rejects trees that mix partitioned depths — and the
    mismatch is checked at WRITE time (either direction), not left to
    corrupt the tree and fail at some later read (ADVICE r5)."""
    _require_epoch_scheme_match(
        new_vectors.sparkSession, path, epoch_id, "append_ivfpq_layout"
    )
    index = (
        ivfpq_residual_index(
            new_vectors, coarse_book, pq_books, sub_dim=sub_dim,
            id_col=id_col,
        )
        if residual
        else ivfpq_index(
            new_vectors, coarse_book, pq_books, sub_dim=sub_dim,
            id_col=id_col,
        )
    )
    if epoch_id is not None:
        (
            index.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            # writer-scoped, NOT spark.conf.set (same rationale as the
            # streaming probe demo: a session-global dynamic mode would
            # leak into the caller's later partitioned overwrites)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid_id", "epoch")
            .parquet(path)
        )
    else:
        index.write.mode("append").partitionBy("centroid_id").parquet(path)


def append_ivfsq_layout(
    new_vectors: DataFrame,
    path: str,
    coarse_book: list[tuple[int, list[float], float]],
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    epoch_id: int | None = None,
) -> None:
    """Append a batch of new vectors to a STORED IVF-SQ8 layout without
    rebuilding — the same continuous-ingestion contract as
    :func:`append_ivfpq_layout` with the scalar quantizer: the batch is
    coarse-assigned and SQ8-encoded with the SAME frozen coarse book and
    bounds the layout was built with, then appended into the existing
    ``centroid_id`` partitions (O(batch) per epoch, resident lists never
    rewrite). Result-equal to a full rebuild over the union corpus:
    encoding is a pure per-row function of (vector, bounds).

    Quantization drift is the trade here too — and SQ8 adds a specific
    failure mode: a batch value OUTSIDE yesterday's per-dim [min, max]
    clamps to 0/255 (the encoder's clamp), so out-of-range drift
    saturates codes rather than erroring. Monitor with
    :func:`sq_recall_multi` on a hash sample and retrain + rewrite when
    recall decays. ``epoch_id`` gives the same writer-scoped
    dynamic-overwrite idempotency (replayed epochs overwrite themselves)
    and the same write-time partition-scheme guard as every other
    family."""
    _require_epoch_scheme_match(
        new_vectors.sparkSession, path, epoch_id, "append_ivfsq_layout"
    )
    index = ivfsq_index(new_vectors, coarse_book, bounds, id_col=id_col)
    if epoch_id is not None:
        (
            index.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid_id", "epoch")
            .parquet(path)
        )
    else:
        index.write.mode("append").partitionBy("centroid_id").parquet(path)


def write_ivfpq_residual_layout(
    embeddings: DataFrame,
    path: str,
    coarse_book: list[tuple[int, list[float], float]],
    pq_books: list[list[tuple[int, list[float], float]]],
    sub_dim: int = 16,
    id_col: str = "vec_id",
    epoch: int | None = None,
) -> None:
    """Persist the RESIDUAL IVF-PQ index (IVFADC) in storage layout:
    parquet partitioned by ``centroid_id``, each inverted-list directory
    holding only ``(vec_id, code, nrm)`` where ``code`` quantizes the
    residual and ``nrm`` is the raw-vector norm. Same ~60x footprint and
    partition-pruned probes as the raw-space layout; pass the
    residual-trained books the layout was encoded with. ``epoch`` adds
    the idempotent-append partition level (see
    :func:`write_ivfpq_layout`)."""
    idx = ivfpq_residual_index(
        embeddings, coarse_book, pq_books, sub_dim=sub_dim, id_col=id_col
    )
    if epoch is not None:
        (
            idx.withColumn("epoch", F.lit(int(epoch)).cast("long"))
            .write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .parquet(path)
        )
    else:
        idx.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivfpq_residual_topk_from_layout(
    spark,
    layout_path: str,
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    sub_dim: int = 16,
    k_sub: int = 8,
    coarse_book: list | None = None,
    pq_books: list | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual IVF-PQ top-k against the stored layout written by
    :func:`write_ivfpq_residual_layout`: partition-pruned probed scan of
    compressed residual codes, scored with the coarse ``c·q`` bias —
    result-equal to :func:`ivfpq_residual_topk` on the same books
    (pytest-pinned). Both books are required (codes are meaningless
    under a different book; probes under a different coarse book scan
    the wrong lists)."""
    if pq_books is None or coarse_book is None:
        raise ValueError(
            "ivfpq_residual_topk_from_layout requires the coarse_book and "
            "pq_books the layout was built with"
        )
    q, qn, probe_ids, _ = _ivf_probe_state(
        embeddings, query_vec_id, n_centroids, nprobe, id_col,
        book=coarse_book,
    )
    cq = [_pydot(v, q) for _c, v, _n in coarse_book]
    cq_arr = "array(" + ",".join(_lit_f(x) for x in cq) + ")"
    score, packed = _adc_exprs(
        pq_books, q, qn, sub_dim, k_sub,
        bias_sql=f"element_at({cq_arr}, centroid_id + 1)",
    )
    stored = spark.read.parquet(layout_path)
    return (
        stored.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            "centroid_id",
            packed.alias("code_packed"),
            score.alias("pq_score"),
        )
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(k)
    )


def write_ivfpq_layout(
    embeddings: DataFrame,
    path: str,
    coarse_book: list[tuple[int, list[float], float]],
    pq_books: list[list[tuple[int, list[float], float]]],
    sub_dim: int = 16,
    id_col: str = "vec_id",
    epoch: int | None = None,
) -> None:
    """Persist the IVF-PQ index in storage layout: parquet partitioned by
    ``centroid_id``, each inverted-list directory holding only the
    compressed ``(vec_id, code, nrm)`` payload — raw embeddings never
    leave the build job, so the at-rest index is ~60× smaller than the
    corpus AND partition-pruned per query. Books are required (not
    retrained) so probes rank exactly the centroids the layout encodes.

    ``epoch`` (e.g. ``-1`` for the base build) adds a second partition
    level so :func:`append_ivfpq_layout` can land later batches as
    idempotent per-epoch dynamic overwrites — the convention the
    streaming ingest demo requires; probes are unaffected (they filter
    on ``centroid_id`` and select named columns)."""
    idx = ivfpq_index(
        embeddings, coarse_book, pq_books, sub_dim=sub_dim, id_col=id_col
    )
    if epoch is not None:
        (
            idx.withColumn("epoch", F.lit(int(epoch)).cast("long"))
            .write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .parquet(path)
        )
    else:
        idx.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivfpq_topk_from_layout(
    spark,
    layout_path: str,
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    sub_dim: int = 16,
    k_sub: int = 8,
    coarse_book: list | None = None,
    pq_books: list | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ top-k against the stored layout written by
    :func:`write_ivfpq_layout`: ``centroid_id IN (probes)`` is a
    *partition* filter on the layout's directory key, so the scan lists
    and reads only ``nprobe`` inverted-list directories of compressed
    codes — zero I/O for unprobed lists, ~4 bytes/vector for probed ones
    (assert via PartitionFilters in the plan). Pass the books the layout
    was written with; result-equal to :func:`ivfpq_topk` on the same
    books (pytest-pinned)."""
    if pq_books is None:
        raise ValueError(
            "ivfpq_topk_from_layout requires the pq_books the layout was "
            "encoded with (codes are meaningless under a different book)"
        )
    if coarse_book is None:
        raise ValueError(
            "ivfpq_topk_from_layout requires the coarse_book the layout "
            "was partitioned with (an untrained fallback would probe the "
            "wrong inverted lists, silently degrading results)"
        )
    q, qn, probe_ids, _ = _ivf_probe_state(
        embeddings, query_vec_id, n_centroids, nprobe, id_col,
        book=coarse_book,
    )
    score, packed = _adc_exprs(pq_books, q, qn, sub_dim, k_sub)
    stored = spark.read.parquet(layout_path)
    return (
        stored.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            "centroid_id",
            packed.alias("code_packed"),
            score.alias("pq_score"),
        )
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(k)
    )


def ivfpq_topk_refined_from_layout(
    spark,
    layout_path: str,
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    **layout_kwargs,
) -> DataFrame:
    """Two-stage serving off the STORED layout — the actual 100-TB
    production read path: the partition-pruned compressed scan
    (:func:`ivfpq_topk_from_layout`, nprobe directories of ~4-byte
    codes) prices ``refine_factor·k`` candidates, then ONLY those raw
    vectors are fetched from the corpus table via a broadcast hash join
    and reranked by exact cosine. Total I/O per query: nprobe compressed
    partitions + refine_factor·k raw rows — independent of corpus size.
    Result-equal to :func:`ivfpq_topk_refined` on the same books
    (pytest-pinned)."""
    if refine_factor < 1:
        raise ValueError(
            f"refine_factor must be >= 1, got {refine_factor}"
        )
    shortlist = ivfpq_topk_from_layout(
        spark, layout_path, embeddings, query_vec_id,
        k=k * refine_factor, id_col=id_col, **layout_kwargs,
    ).select("vec_id", "pq_score")
    return _exact_rerank(
        shortlist, embeddings, query_vec_id, k, "pq_score", id_col
    )


def write_ivfsq_layout(
    embeddings: DataFrame,
    path: str,
    coarse_book: list[tuple[int, list[float], float]],
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    epoch: int | None = None,
) -> None:
    """Persist the IVF-SQ8 index in storage layout: parquet partitioned
    by ``centroid_id``, each inverted-list directory holding only the
    ``(vec_id, qcode, nrm)`` payload — the SQ8 sibling of
    :func:`write_ivfpq_layout` (4× smaller at rest instead of ~60×, far
    finer scores). Coarse book AND bounds are required (not retrained)
    so probes rank exactly the lists the layout encodes. ``epoch`` adds
    the idempotent-append partition level under the same convention as
    the other families."""
    idx = ivfsq_index(embeddings, coarse_book, bounds, id_col=id_col)
    if epoch is not None:
        (
            idx.withColumn("epoch", F.lit(int(epoch)).cast("long"))
            .write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .parquet(path)
        )
    else:
        idx.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivfsq_topk_from_layout(
    spark,
    layout_path: str,
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    coarse_book: list | None = None,
    bounds: list[tuple[float, float]] | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-SQ8 top-k against the stored layout written by
    :func:`write_ivfsq_layout`: ``centroid_id IN (probes)`` is a
    *partition* filter on the layout's directory key — zero I/O for
    unprobed lists, 64 uint8 codes + one norm per probed vector (assert
    via PartitionFilters in the plan). Pass the coarse book and bounds
    the layout was written with; result-equal to :func:`ivfsq_topk` on
    the same training (pytest-pinned)."""
    if bounds is None:
        raise ValueError(
            "ivfsq_topk_from_layout requires the bounds the layout was "
            "encoded with (codes are meaningless under different bounds)"
        )
    if coarse_book is None:
        raise ValueError(
            "ivfsq_topk_from_layout requires the coarse_book the layout "
            "was partitioned with (an untrained fallback would probe the "
            "wrong inverted lists, silently degrading results)"
        )
    q, qn, probe_ids, _ = _ivf_probe_state(
        embeddings, query_vec_id, n_centroids, nprobe, id_col,
        book=coarse_book,
    )
    c0, w = _sq_score_terms(bounds, q)
    dim = len(bounds)
    score = F.expr(
        f"round(coalesce(({_lit_f(c0)} + {_dot_sql('qcode', w)}) "
        f"/ nullif(nrm * {_lit_f(qn)}, 0.0D), 0.0D), 6)"
    )
    check = F.expr(
        f"aggregate(zip_with(qcode, sequence(1, {dim}), "
        "(c, i) -> CAST(c AS BIGINT) * CAST(i AS BIGINT)), "
        "0L, (acc, v) -> acc + v)"
    )
    stored = spark.read.parquet(layout_path)
    return (
        stored.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != F.lit(query_vec_id))
        .select(
            "vec_id",
            "centroid_id",
            check.alias("code_check"),
            score.alias("sq_score"),
        )
        .orderBy(F.desc("sq_score"), F.asc("vec_id"))
        .limit(k)
    )


def ivfsq_topk_refined_from_layout(
    spark,
    layout_path: str,
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    **layout_kwargs,
) -> DataFrame:
    """Two-stage IVF-SQ8 serving off the STORED layout — the SQ8
    sibling of :func:`ivfpq_topk_refined_from_layout`, completing the
    stored-serving matrix ({PQ, SQ8} × {unrefined, refined} × {index
    DF, partition-pruned layout}): nprobe directories of uint8 codes
    price the shortlist, refine_factor·k raw rows rerank exactly.
    Result-equal to :func:`ivfsq_topk_refined` on the same training
    (pytest-pinned)."""
    if refine_factor < 1:
        raise ValueError(
            f"refine_factor must be >= 1, got {refine_factor}"
        )
    shortlist = ivfsq_topk_from_layout(
        spark, layout_path, embeddings, query_vec_id,
        k=k * refine_factor, id_col=id_col, **layout_kwargs,
    ).select("vec_id", "sq_score")
    return _exact_rerank(
        shortlist, embeddings, query_vec_id, k, "sq_score", id_col
    )


def write_lsh_layout(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    epoch: int | None = None,
) -> None:
    """Persist the corpus in LSH storage layout: parquet partitioned by
    the hyperplane ``bucket`` — the hash-family counterpart of
    :func:`write_ivf_layout` (same one-directory-per-list topology,
    2**n_planes lists). ``epoch`` (e.g. ``-1`` for the base build) adds
    the idempotent-append partition level (see
    :func:`write_ivfpq_layout`)."""
    planes = hyperplane_signs(n_planes, dim)
    bucketed = fan_out(embeddings).withColumn(
        "bucket", lsh_bucket(F.col("embedding"), planes)
    )
    if epoch is not None:
        (
            bucketed.withColumn("epoch", F.lit(int(epoch)).cast("long"))
            .write.mode("overwrite")
            .partitionBy("bucket", "epoch")
            .parquet(path)
        )
    else:
        bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_topk_from_layout(
    spark,
    layout_path: str,
    embeddings: DataFrame,
    query_vec_id=0,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH top-k against the stored layout: the query's bucket is computed
    driver-side from the same deterministic hyperplane family, then the
    scan reads exactly ONE partition directory (PartitionFilters); same
    results as :func:`lsh_bucketed_topk`."""
    planes = hyperplane_signs(n_planes, dim)
    qrow = (
        embeddings.filter(F.col(id_col) == F.lit(query_vec_id))
        .select(
            "embedding",
            lsh_bucket(F.col("embedding"), planes).alias("bucket"),
            l2_norm(F.col("embedding")).alias("nrm"),
        )
        .collect()
    )
    if not qrow:
        raise KeyError(f"query vector {query_vec_id!r} not found in {id_col}")
    q_emb = [float(x) for x in qrow[0]["embedding"]]
    q_bucket, q_nrm = qrow[0]["bucket"], float(qrow[0]["nrm"])
    stored = spark.read.parquet(layout_path)
    e = F.col("embedding")
    cos = F.round(
        F.coalesce(
            dot(e, _lit_vec(q_emb)) / F.nullif(l2_norm(e) * F.lit(q_nrm), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )
    return (
        stored.filter(F.col("bucket") == F.lit(q_bucket))
        .filter(F.col(id_col) != F.lit(query_vec_id))
        .select(
            F.col(id_col).alias("vec_id"), "bucket", cos.alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
