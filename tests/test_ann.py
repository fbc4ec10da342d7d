"""ANN operators: brute-force exactness, LSH bucket pruning semantics."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators import ann as A


def _emb_df(spark, n=50, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype("float32")
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ), vecs


def test_cosine_topk_matches_numpy(spark):
    df, vecs = _emb_df(spark)
    got = A.cosine_topk(df, query_vec_id=0, k=5).collect()
    q = vecs[0]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = sorted(
        ((round(float(c), 6), i) for i, c in enumerate(cos) if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r.vec_id, r.cosine) for r in got] == [
        (i, c) for c, i in order
    ]


def test_lsh_bucketed_topk_subset_of_bucket(spark):
    df, vecs = _emb_df(spark, dim=8)
    rows = A.lsh_bucketed_topk(df, query_vec_id=0, k=10, n_planes=2, dim=8).collect()
    planes = A.hyperplane_signs(2, 8)
    def bucket(v):
        return sum(
            (1 << p) for p, w in enumerate(planes) if float(np.dot(w, v)) > 0
        )
    qb = bucket(vecs[0])
    assert rows  # the bucket contains at least one neighbor at n=50
    for r in rows:
        assert r.bucket == qb
        assert bucket(vecs[r.vec_id]) == qb
        # reported cosine is the true cosine
        v, q = vecs[r.vec_id], vecs[0]
        true = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert math.isclose(r.cosine, round(true, 6), abs_tol=2e-6)


def test_ivf_topk_matches_numpy_replication(spark):
    df, vecs = _emb_df(spark, n=60, dim=8)
    got = A.ivf_topk(df, 0, k=10, n_centroids=4, nprobe=2).collect()

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    cents = vecs[:4]
    assign = {
        i: min(range(4), key=lambda c: (-cos(vecs[i], cents[c]), c))
        for i in range(60)
    }
    probed = sorted(range(4), key=lambda c: (-cos(cents[c], vecs[0]), c))[:2]
    cand = [i for i in range(60) if assign[i] in probed and i != 0]
    want = sorted(
        ((cos(vecs[i], vecs[0]), i) for i in cand), key=lambda t: (-t[0], t[1])
    )[:10]
    assert [(r.vec_id, r.cosine) for r in got] == [(i, c) for c, i in want]
    for r in got:
        assert r.centroid_id in probed


def test_hyperplanes_deterministic():
    assert A.hyperplane_signs(2, 4) == A.hyperplane_signs(2, 4)
    assert all(x in (1.0, -1.0) for row in A.hyperplane_signs(3, 16) for x in row)


def test_ivf_layout_probe_matches_inline_and_prunes_partitions(spark, tmp_path):
    """The stored IVF layout must return exactly the inline ivf_topk
    result while scanning only the probed centroid partitions."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        ivf_topk,
        ivf_topk_from_layout,
        write_ivf_layout,
    )
    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_layout")
    write_ivf_layout(emb, path, n_centroids=8)
    probe = ivf_topk_from_layout(spark, path, emb, 0, k=10, n_centroids=8, nprobe=2)
    inline = ivf_topk(emb, 0, k=10, n_centroids=8, nprobe=2)
    key = lambda r: (r.vec_id, r.centroid_id, r.cosine)
    assert [key(r) for r in probe.collect()] == [key(r) for r in inline.collect()]
    plan = explain_string(probe, "formatted")
    # the centroid IN-list must reach the scan as a partition filter,
    # i.e. unprobed inverted lists are skipped at file-listing time
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]


def test_lsh_layout_probe_matches_inline_and_prunes_to_one_partition(
    spark, tmp_path
):
    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        lsh_bucketed_topk,
        lsh_topk_from_layout,
        write_lsh_layout,
    )
    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "lsh_layout")
    write_lsh_layout(emb, path, n_planes=4)
    probe = lsh_topk_from_layout(spark, path, emb, 0, k=10, n_planes=4)
    inline = lsh_bucketed_topk(emb, 0, k=10, n_planes=4)
    got = [(r.vec_id, r.bucket, r.cosine) for r in probe.collect()]
    want = [(r.vec_id, r.bucket, r.cosine) for r in inline.collect()]
    assert got == want and len(got) > 0
    plan = explain_string(probe, "formatted")
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]


def test_kmeans_codebook_deterministic_and_improves_recall(spark):
    df, vecs = _emb_df(spark, n=120, dim=8)
    b1 = A.kmeans_codebook(df, n_centroids=4, iters=2)
    b2 = A.kmeans_codebook(df, n_centroids=4, iters=2)
    assert b1 == b2  # bit-identical across runs (no RNG, exact int sums)
    assert len(b1) == 4 and all(len(v) == 8 for _, v, _ in b1)
    # every centroid norm is consistent with its vector
    for cid, v, nrm in b1:
        assert math.isclose(nrm, math.sqrt(sum(x * x for x in v)), rel_tol=0)
    # recall metric: trained codebook >= untrained first-N codebook
    untrained = A.ivf_recall_multi(
        df, n_queries=8, k=5, n_centroids=4, nprobe=1
    ).collect()[0]
    trained = A.ivf_recall_multi(
        df, n_queries=8, k=5, n_centroids=4, nprobe=1, book=b1
    ).collect()[0]
    assert 0.0 <= untrained.recall_at_k <= 1.0
    assert trained.recall_at_k >= untrained.recall_at_k
    # probing every list is exact: recall must be 1.0
    full = A.ivf_recall_multi(
        df, n_queries=8, k=5, n_centroids=4, nprobe=4, book=b1
    ).collect()[0]
    assert full.recall_at_k == 1.0


def test_pq_encode_codes_valid_and_deterministic(spark):
    df, _ = _emb_df(spark, n=60, dim=8)
    books = A.pq_codebooks(df, m=2, sub_dim=4, k_sub=4, iters=1)
    codes = A.pq_encode(df, books, sub_dim=4).collect()
    assert len(codes) == 60
    for r in codes:
        assert len(r.code) == 2
        assert all(0 <= c < 4 for c in r.code)
        assert r.nrm > 0
    again = A.pq_encode(df, books, sub_dim=4).collect()
    assert sorted(map(tuple, codes)) == sorted(map(tuple, again))


def test_pq_topk_matches_python_adc(spark):
    """pq_topk's ADC ranking must equal a Python recomputation from the
    same books and codes (scores rounded to 6dp, ties to smaller id)."""
    df, vecs = _emb_df(spark, n=40, dim=8)
    m, w, k_sub = 2, 4, 4
    books = A.pq_codebooks(df, m=m, sub_dim=w, k_sub=k_sub, iters=1)
    codes = {r.vec_id: (list(r.code), r.nrm)
             for r in A.pq_encode(df, books, sub_dim=w).collect()}
    got = A.pq_topk(df, 0, k=5, m=m, sub_dim=w, k_sub=k_sub, books=books).collect()

    q = [float(x) for x in vecs[0]]
    qn = math.sqrt(sum(x * x for x in q))
    want = []
    for vid, (code, nrm) in codes.items():
        if vid == 0:
            continue
        s = 0.0
        for mi in range(m):
            sub_q = q[mi * w:(mi + 1) * w]
            cv = books[mi][code[mi]][1]
            s += sum(a * b for a, b in zip(cv, sub_q))
        denom = nrm * qn
        score = round(s / denom, 6) if denom else 0.0
        packed = code[0] * k_sub + code[1]
        want.append((score, vid, packed))
    want.sort(key=lambda t: (-t[0], t[1]))
    assert [(r.vec_id, r.code_packed, r.pq_score) for r in got] == [
        (vid, packed, score) for score, vid, packed in want[:5]
    ]


def test_pq_identical_vector_gets_top_score(spark):
    """A duplicate of the query vector shares its codes and norm, so its
    ADC score is the maximum achievable for that code word — it must
    rank at the top."""
    from pyspark.sql import functions as F

    df, vecs = _emb_df(spark, n=30, dim=8)
    dup = df.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    both = df.unionByName(dup)
    books = A.pq_codebooks(both, m=2, sub_dim=4, k_sub=4, iters=1)
    got = A.pq_topk(both, 0, k=1, m=2, sub_dim=4, k_sub=4, books=books).collect()
    assert got[0].vec_id == 1000


def test_ivfpq_topk_is_pq_restricted_to_probed_lists(spark):
    """IVF-PQ = PQ scoring restricted to the probed inverted lists: every
    result must (a) come from a probed centroid and (b) carry exactly the
    score the unrestricted PQ ADC assigns that vector."""
    df, _ = _emb_df(spark, n=60, dim=8)
    m, w, k_sub, nc, nprobe = 2, 4, 4, 4, 2
    coarse = A.kmeans_codebook(df, n_centroids=nc, iters=1)
    pq_books = A.pq_codebooks(df, m=m, sub_dim=w, k_sub=k_sub, iters=1)
    got = A.ivfpq_topk(
        df, 0, k=5, n_centroids=nc, nprobe=nprobe, m=m, sub_dim=w,
        k_sub=k_sub, coarse_book=coarse, pq_books=pq_books,
    ).collect()
    assert len(got) == 5
    _q, _qn, probe_ids, _ = A._ivf_probe_state(df, 0, nc, nprobe, "vec_id", book=coarse)
    assert all(r.centroid_id in probe_ids for r in got)
    full_pq = {
        r.vec_id: (r.code_packed, r.pq_score)
        for r in A.pq_topk(df, 0, k=60, m=m, sub_dim=w, k_sub=k_sub,
                           books=pq_books).collect()
    }
    for r in got:
        assert full_pq[r.vec_id] == (r.code_packed, r.pq_score)


def test_ivfpq_layout_probe_matches_inline_and_prunes_partitions(spark, tmp_path):
    """The stored IVF-PQ layout must return exactly the inline ivfpq_topk
    result while scanning only the probed inverted-list partitions of
    compressed codes."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        ivfpq_topk,
        ivfpq_topk_from_layout,
        kmeans_codebook,
        pq_codebooks,
        write_ivfpq_layout,
    )
    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse = kmeans_codebook(emb, n_centroids=8, iters=1)
    pq_books = pq_codebooks(emb, m=4, sub_dim=16, k_sub=8, iters=1)
    path = str(tmp_path / "ivfpq_layout")
    write_ivfpq_layout(emb, path, coarse, pq_books)
    probe = ivfpq_topk_from_layout(
        spark, path, emb, 0, k=10, n_centroids=8, nprobe=2,
        coarse_book=coarse, pq_books=pq_books,
    )
    inline = ivfpq_topk(
        emb, 0, k=10, n_centroids=8, nprobe=2,
        coarse_book=coarse, pq_books=pq_books,
    )
    key = lambda r: (r.vec_id, r.centroid_id, r.code_packed, r.pq_score)
    assert [key(r) for r in probe.collect()] == [key(r) for r in inline.collect()]
    plan = explain_string(probe, "formatted")
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]
    # the layout stores codes, not vectors: the probed scan must not
    # read an embedding column at all
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas and all("embedding" not in ln for ln in schemas)


def test_recall_sampled_ground_truth_close_to_full(spark):
    """The hash-sampled recall mode (the 100-TB way to keep the metric
    runnable — the exact side is O(corpus x queries)): sampled and full
    recall must agree within tolerance on the fixture, the sample must
    actually shrink the exact side, and the predicate is deterministic
    (same sample both runs)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators import ann as A

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    book = A.kmeans_codebook(emb, n_centroids=8, iters=2)
    full = A.ivf_recall_multi(emb, book=book).collect()[0].recall_at_k
    s1 = A.ivf_recall_multi(emb, book=book, sample_fraction=0.5).collect()[0]
    s2 = A.ivf_recall_multi(emb, book=book, sample_fraction=0.5).collect()[0]
    assert s1.recall_at_k == s2.recall_at_k  # deterministic sample
    assert abs(s1.recall_at_k - full) <= 0.2
    books = A.pq_codebooks(emb, m=4, sub_dim=16, k_sub=8, iters=2)
    pq_full = A.pq_recall_multi(emb, books=books).collect()[0].recall_at_k
    pq_s = A.pq_recall_multi(
        emb, books=books, sample_fraction=0.5
    ).collect()[0].recall_at_k
    assert abs(pq_s - pq_full) <= 0.2
    # the sampled corpus is a genuine subset (~half)
    n = emb.count()
    ns = emb.filter(A._recall_sample_filter("vec_id", 0.5)).count()
    assert 0.3 * n < ns < 0.7 * n
    import pytest

    with pytest.raises(ValueError, match="sample_fraction"):
        A.ivf_recall_multi(emb, book=book, sample_fraction=1.5)


def test_residual_ivfpq_improves_recall_and_matches_python(spark):
    """IVFADC residual encoding: (a) serving recall@k with residual
    codes beats raw-space codes on the same probes (the accuracy gain
    that justifies the refinement), and (b) the residual relation is
    exactly x - c(x) under the assigned centroid."""
    from similarity_search_with_hadoop_mapreduce_spark.operators import ann as A

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    book = A.kmeans_codebook(emb, n_centroids=8, iters=2)
    raw = A.ivfpq_recall_multi(
        emb, coarse_book=book, residual=False
    ).collect()[0].recall_at_k
    res = A.ivfpq_recall_multi(
        emb, coarse_book=book, residual=True
    ).collect()[0].recall_at_k
    assert res > raw, (res, raw)
    # residual vectors: spot-check x - c(x) for a few rows
    rows = (
        A.ivf_residuals(emb, book)
        .filter(F.col("vec_id") < 3)
        .collect()
    )
    raw_rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    cents = {cid: v for cid, v, _n in book}
    for r in rows:
        expect = [
            x - c for x, c in zip(raw_rows[r.vec_id], cents[r.centroid_id])
        ]
        got = [float(x) for x in r.embedding]
        assert max(abs(a - b) for a, b in zip(got, expect)) < 1e-12


def test_residual_index_guard_and_shape(spark):
    from similarity_search_with_hadoop_mapreduce_spark.operators import ann as A
    import pytest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="index provided without"):
        A.ivfpq_residual_topk(emb, 0, index=spark.range(1))
    book = A.kmeans_codebook(emb, n_centroids=8, iters=1)
    books = A.residual_pq_codebooks(emb, book, iters=1)
    idx = A.ivfpq_residual_index(emb, book, books)
    assert idx.columns == ["vec_id", "centroid_id", "code", "nrm"]
    row = idx.filter(F.col("vec_id") == 42).collect()[0]
    # nrm is the RAW vector norm, not the residual norm
    import math
    raw = [float(x) for x in emb.filter(F.col("vec_id") == 42).collect()[0]["embedding"]]
    assert abs(row.nrm - math.sqrt(sum(x * x for x in raw))) < 1e-9


def test_ivfpq_residual_layout_probe_matches_inline_and_prunes(spark, tmp_path):
    """Residual layout lifecycle parity with the raw-space one: stored
    probe result-equal to inline, partition-pruned, embedding-free."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        ivfpq_residual_topk,
        ivfpq_residual_topk_from_layout,
        kmeans_codebook,
        residual_pq_codebooks,
        write_ivfpq_residual_layout,
    )
    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string
    import pytest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse = kmeans_codebook(emb, n_centroids=8, iters=1)
    books = residual_pq_codebooks(emb, coarse, iters=1)
    path = str(tmp_path / "ivfpq_res_layout")
    write_ivfpq_residual_layout(emb, path, coarse, books)
    probe = ivfpq_residual_topk_from_layout(
        spark, path, emb, 0, k=10, n_centroids=8, nprobe=2,
        coarse_book=coarse, pq_books=books,
    )
    inline = ivfpq_residual_topk(
        emb, 0, k=10, n_centroids=8, nprobe=2,
        coarse_book=coarse, pq_books=books,
    )
    key = lambda r: (r.vec_id, r.centroid_id, r.code_packed, r.pq_score)
    assert [key(r) for r in probe.collect()] == [key(r) for r in inline.collect()]
    plan = explain_string(probe, "formatted")
    assert "PartitionFilters" in plan
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas and all("embedding" not in ln for ln in schemas)
    with pytest.raises(ValueError, match="requires the coarse_book"):
        ivfpq_residual_topk_from_layout(spark, path, emb, 0)


def test_books_json_roundtrip_serves_layout(tmp_path, spark):
    """Codebooks persisted as the JSON metadata artifact round-trip
    exactly and serve a stored layout identically to the in-memory
    books — the full index lifecycle (build -> persist layout + books ->
    reload -> probe) with no retraining."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        ivfpq_residual_topk_from_layout,
        kmeans_codebook,
        load_books,
        residual_pq_codebooks,
        save_books,
        write_ivfpq_residual_layout,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse = kmeans_codebook(emb, n_centroids=8, iters=1)
    books = residual_pq_codebooks(emb, coarse, iters=1)
    meta = str(tmp_path / "books.json")
    save_books(meta, coarse_book=coarse, pq_books=books)
    loaded = load_books(meta)
    assert loaded["coarse_book"] == coarse  # exact float round-trip
    assert loaded["pq_books"] == books
    layout = str(tmp_path / "layout")
    write_ivfpq_residual_layout(emb, layout, coarse, books)
    a = ivfpq_residual_topk_from_layout(
        spark, layout, emb, 0, coarse_book=coarse, pq_books=books
    ).collect()
    b = ivfpq_residual_topk_from_layout(
        spark, layout, emb, 0,
        coarse_book=loaded["coarse_book"], pq_books=loaded["pq_books"],
    ).collect()
    assert a == b and len(a) == 10


def test_append_ivfpq_layout_equals_full_rebuild(spark, tmp_path):
    """Continuous ingestion for the stored ANN index: build the layout
    on half the corpus, append the other half with the SAME persisted
    books — probes must return exactly what a full rebuild over the
    union returns (encoding is a pure per-row function of vector and
    books), for both the raw-space and residual layouts."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        append_ivfpq_layout,
        ivfpq_residual_topk_from_layout,
        ivfpq_topk_from_layout,
        kmeans_codebook,
        pq_codebooks,
        residual_pq_codebooks,
        write_ivfpq_layout,
        write_ivfpq_residual_layout,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    coarse = kmeans_codebook(emb, n_centroids=8, iters=1)
    key = lambda r: (r.vec_id, r.centroid_id, r.code_packed, r.pq_score)

    # raw-space layout
    books = pq_codebooks(emb, m=4, sub_dim=16, k_sub=8, iters=1)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    write_ivfpq_layout(half_a, inc, coarse, books)
    append_ivfpq_layout(half_b, inc, coarse, books)
    write_ivfpq_layout(emb, full, coarse, books)
    got = ivfpq_topk_from_layout(
        spark, inc, emb, 0, coarse_book=coarse, pq_books=books
    ).collect()
    want = ivfpq_topk_from_layout(
        spark, full, emb, 0, coarse_book=coarse, pq_books=books
    ).collect()
    assert [key(r) for r in got] == [key(r) for r in want] and len(got) == 10

    # residual (IVFADC) layout
    rbooks = residual_pq_codebooks(emb, coarse, iters=1)
    rinc, rfull = str(tmp_path / "rinc"), str(tmp_path / "rfull")
    write_ivfpq_residual_layout(half_a, rinc, coarse, rbooks)
    append_ivfpq_layout(half_b, rinc, coarse, rbooks, residual=True)
    write_ivfpq_residual_layout(emb, rfull, coarse, rbooks)
    rgot = ivfpq_residual_topk_from_layout(
        spark, rinc, emb, 0, coarse_book=coarse, pq_books=rbooks
    ).collect()
    rwant = ivfpq_residual_topk_from_layout(
        spark, rfull, emb, 0, coarse_book=coarse, pq_books=rbooks
    ).collect()
    assert [key(r) for r in rgot] == [key(r) for r in rwant] and len(rgot) == 10


def test_append_ivf_and_lsh_layouts_equal_full_rebuild(spark, tmp_path):
    """r4 verdict #5: the plain-IVF and LSH stored layouts get the same
    append maintenance the IVF-PQ layout has — build on half the corpus,
    append the other half under the frozen book / plane family, and the
    probe must equal a full rebuild over the union (assignment and
    bucketing are pure per-row functions)."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        append_ivf_layout,
        append_lsh_layout,
        ivf_topk_from_layout,
        kmeans_codebook,
        lsh_topk_from_layout,
        write_ivf_layout,
        write_lsh_layout,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    # plain IVF: frozen trained book shared by build, append, and probes
    book = kmeans_codebook(emb, n_centroids=8, iters=1)
    inc, full = str(tmp_path / "ivf_inc"), str(tmp_path / "ivf_full")
    write_ivf_layout(half_a, inc, n_centroids=8, book=book)
    append_ivf_layout(half_b, inc, book=book)
    write_ivf_layout(emb, full, n_centroids=8, book=book)
    key = lambda r: (r.vec_id, r.centroid_id, r.cosine)
    got = ivf_topk_from_layout(
        spark, inc, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()
    want = ivf_topk_from_layout(
        spark, full, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()
    assert [key(r) for r in got] == [key(r) for r in want] and len(got) == 10
    import pytest
    with pytest.raises(ValueError, match="requires the book"):
        append_ivf_layout(half_b, inc, book=None)

    # LSH: the plane family is a pure function of (n_planes, dim) —
    # frozen by construction; same geometry must reproduce the rebuild
    linc, lfull = str(tmp_path / "lsh_inc"), str(tmp_path / "lsh_full")
    write_lsh_layout(half_a, linc, n_planes=4)
    append_lsh_layout(half_b, linc, n_planes=4)
    write_lsh_layout(emb, lfull, n_planes=4)
    lkey = lambda r: (r.vec_id, r.bucket, r.cosine)
    lgot = lsh_topk_from_layout(spark, linc, emb, 0, k=10, n_planes=4).collect()
    lwant = lsh_topk_from_layout(spark, lfull, emb, 0, k=10, n_planes=4).collect()
    assert [lkey(r) for r in lgot] == [lkey(r) for r in lwant]
    assert len(lgot) > 0


def test_append_ivf_and_lsh_layouts_epoch_idempotent_replay(spark, tmp_path):
    """r5 verdict #3: the plain-IVF and LSH layout appends get the same
    epoch-partitioned dynamic-overwrite idempotency the IVF-PQ append
    has — a replayed epoch (crash-replay semantics: same epoch_id, same
    batch) overwrites itself instead of duplicating vectors (duplicates
    would change top-k), probes equal a full rebuild, and partition-
    scheme mismatches fail at WRITE time (ADVICE r5), not as a
    corrupted tree at a later read."""
    import pytest
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        append_ivf_layout,
        append_lsh_layout,
        ivf_topk_from_layout,
        kmeans_codebook,
        lsh_topk_from_layout,
        write_ivf_layout,
        write_lsh_layout,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    # plain IVF
    book = kmeans_codebook(emb, n_centroids=8, iters=1)
    inc, full = str(tmp_path / "ivf_inc"), str(tmp_path / "ivf_full")
    write_ivf_layout(half_a, inc, n_centroids=8, book=book, epoch=-1)
    append_ivf_layout(half_b, inc, book=book, epoch_id=1)
    n = spark.read.parquet(inc).count()
    append_ivf_layout(half_b, inc, book=book, epoch_id=1)  # the replay
    assert spark.read.parquet(inc).count() == n == emb.count()
    write_ivf_layout(emb, full, n_centroids=8, book=book)
    key = lambda r: (r.vec_id, r.centroid_id, r.cosine)
    got = ivf_topk_from_layout(
        spark, inc, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()
    want = ivf_topk_from_layout(
        spark, full, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()
    assert [key(r) for r in got] == [key(r) for r in want] and len(got) == 10
    # scheme guards, both directions
    with pytest.raises(ValueError, match="no epoch partition level"):
        append_ivf_layout(half_b, full, book=book, epoch_id=2)
    with pytest.raises(ValueError, match="is epoch-partitioned"):
        append_ivf_layout(half_b, inc, book=book)

    # LSH
    linc, lfull = str(tmp_path / "lsh_inc"), str(tmp_path / "lsh_full")
    write_lsh_layout(half_a, linc, n_planes=4, epoch=-1)
    append_lsh_layout(half_b, linc, n_planes=4, epoch_id=1)
    ln = spark.read.parquet(linc).count()
    append_lsh_layout(half_b, linc, n_planes=4, epoch_id=1)  # the replay
    assert spark.read.parquet(linc).count() == ln == emb.count()
    write_lsh_layout(emb, lfull, n_planes=4)
    lkey = lambda r: (r.vec_id, r.bucket, r.cosine)
    lgot = lsh_topk_from_layout(spark, linc, emb, 0, k=10, n_planes=4).collect()
    lwant = lsh_topk_from_layout(spark, lfull, emb, 0, k=10, n_planes=4).collect()
    assert [lkey(r) for r in lgot] == [lkey(r) for r in lwant] and lgot
    with pytest.raises(ValueError, match="is epoch-partitioned"):
        append_lsh_layout(half_b, linc, n_planes=4)


def test_compact_ann_layout_folds_epochs_and_rewrites_files(spark, tmp_path):
    """r5 verdict #4: continuous ingest accumulates one file-set per
    epoch per inverted-list directory; compact_ann_layout folds
    committed epochs into the baseline and rewrites each directory as
    ONE file — layout_stats shows the dial moving (n_epochs collapses,
    n_files returns to one per list), row count and probe results are
    unchanged, and an upto_epoch horizon preserves newer epochs for
    replay safety."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        append_ivf_layout,
        compact_ann_layout,
        ivf_topk_from_layout,
        kmeans_codebook,
        layout_stats,
        write_ivf_layout,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    thirds = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    book = kmeans_codebook(emb, n_centroids=8, iters=1)
    path = str(tmp_path / "layout")
    write_ivf_layout(thirds[0], path, n_centroids=8, book=book, epoch=-1)
    append_ivf_layout(thirds[1], path, book=book, epoch_id=1)
    append_ivf_layout(thirds[2], path, book=book, epoch_id=2)

    key = lambda r: (r.vec_id, r.centroid_id, r.cosine)
    before = layout_stats(spark, path).first()
    want = [key(r) for r in ivf_topk_from_layout(
        spark, path, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()]
    assert before.n_epochs == 3 and before.n_rows == emb.count()

    # horizon compaction: epoch 2 stays replayable
    compact_ann_layout(spark, path, upto_epoch=1)
    mid = layout_stats(spark, path).first()
    assert mid.n_epochs == 2 and mid.n_rows == before.n_rows
    epochs = {r.epoch for r in spark.read.parquet(path)
              .select("epoch").distinct().collect()}
    assert epochs == {-1, 2}

    # full compaction: every directory one file
    compact_ann_layout(spark, path)
    after = layout_stats(spark, path).first()
    assert after.n_epochs == 1 and after.n_rows == before.n_rows
    assert after.n_files == after.n_lists < before.n_files
    got = [key(r) for r in ivf_topk_from_layout(
        spark, path, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()]
    assert got == want and len(got) == 10


def test_compact_ann_layout_crash_between_renames_heals(spark, tmp_path, monkeypatch):
    """Kill compaction at its only unguarded instant — between parking
    the original tree and swapping in the compacted one (the layout
    path is briefly absent) — and verify a plain re-run detects the
    parked tree, restores it, and completes the compaction with probe
    results unchanged. Also pins that a crash DURING the data pass
    never touches the serving layout (the stage dir is a side-write)."""
    import pytest
    from pyspark.sql import functions as F

    import similarity_search_with_hadoop_mapreduce_spark.operators.ann as A

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    book = A.kmeans_codebook(emb, n_centroids=8, iters=1)
    path = str(tmp_path / "layout")
    A.write_ivf_layout(
        emb.filter(F.col("vec_id") % 2 == 0), path, n_centroids=8,
        book=book, epoch=-1,
    )
    A.append_ivf_layout(
        emb.filter(F.col("vec_id") % 2 == 1), path, book=book, epoch_id=1
    )
    key = lambda r: (r.vec_id, r.centroid_id, r.cosine)
    want = [key(r) for r in A.ivf_topk_from_layout(
        spark, path, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()]

    def boom():
        raise RuntimeError("injected crash between layout renames")

    monkeypatch.setattr(A, "_between_layout_renames_hook", boom)
    with pytest.raises(RuntimeError, match="between layout renames"):
        A.compact_ann_layout(spark, path)
    import os
    assert not os.path.exists(path)            # the unguarded instant
    assert os.path.exists(path + "__precompact")

    monkeypatch.setattr(A, "_between_layout_renames_hook", None)
    A.compact_ann_layout(spark, path)          # heal + complete
    assert os.path.exists(path)
    assert not os.path.exists(path + "__precompact")
    assert not os.path.exists(path + "__compacting")
    got = [key(r) for r in A.ivf_topk_from_layout(
        spark, path, emb, 0, k=10, n_centroids=8, nprobe=2, book=book
    ).collect()]
    assert got == want
    st = A.layout_stats(spark, path).first()
    assert st.n_epochs == 1 and st.n_files == st.n_lists


def test_knn_graph_exact_neighbors(spark):
    """Hand-built 2-D vectors: neighbor lists follow exact cosine order
    with the (cosine desc, neighbor asc) tie rule."""
    import math

    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import knn_graph

    # angles 0, 30, 60, 90 degrees: cos between i and j = cos(|i-j|*30deg)

    vecs = [
        (i, [float(math.cos(math.radians(30 * i))),
             float(math.sin(math.radians(30 * i)))])
        for i in range(4)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = knn_graph(df, k=2)
    rows = sorted(
        ((r.vec_id, r.rank, r.neighbor_id, r.cosine) for r in out.collect())
    )
    by_src = {}
    for vid, rank, nid, cos in rows:
        by_src.setdefault(vid, []).append((rank, nid))
    # each vector's nearest is its angular neighbor; 30-deg beats 60-deg
    assert by_src[0] == [(1, 1), (2, 2)]
    assert by_src[3] == [(1, 2), (2, 1)]
    # middle vectors tie at 30 deg on both sides -> neighbor id asc breaks it
    assert by_src[1] == [(1, 0), (2, 2)]
    assert by_src[2] == [(1, 1), (2, 3)]


def test_knn_graph_lsh_is_candidate_bounded_and_no_cartesian(spark):
    """Every LSH-kNN edge carries the exact cosine of the brute graph's
    full pair table, the per-source best LSH neighbor never beats the
    exact best, and the plan has no all-pairs join."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        knn_graph,
        knn_graph_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = knn_graph(emb, k=3)
    approx = knn_graph_lsh(emb, k=3)
    ex = {(r.vec_id, r.neighbor_id): r.cosine for r in exact.collect()}
    ex_best = {}
    for (vid, _), cos in ex.items():
        ex_best[vid] = max(ex_best.get(vid, -2.0), cos)
    ap = [(r.vec_id, r.neighbor_id, r.cosine, r.rank) for r in approx.collect()]
    assert ap  # candidates exist at this sf
    per_src = {}
    for vid, nid, cos, rank in ap:
        per_src.setdefault(vid, []).append((rank, cos))
        if (vid, nid) in ex:  # shared edge -> identical rounded cosine
            assert ex[(vid, nid)] == cos
    for vid, lst in per_src.items():
        lst.sort()
        assert [r for r, _ in lst] == list(range(1, len(lst) + 1))  # dense ranks
        assert len(lst) <= 3
        assert lst[0][1] <= ex_best[vid] + 1e-12  # cannot beat exact best
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfpq_refined_reranks_shortlist_with_exact_cosine(spark):
    """The refined result must (a) be a subset of the ADC shortlist,
    (b) carry the EXACT cosine for every returned vector (numpy check),
    (c) order by exact cosine — and its exact-score quality must be at
    least the plain ivfpq top-k's (rerank can only improve the served
    neighbors within the shortlist)."""
    import pytest

    df, vecs = _emb_df(spark, n=60, dim=8)
    m, w, k_sub, nc, nprobe, k, rf = 2, 4, 4, 4, 2, 5, 3
    coarse = A.kmeans_codebook(df, n_centroids=nc, iters=1)
    pq_books = A.pq_codebooks(df, m=m, sub_dim=w, k_sub=k_sub, iters=1)
    kw = dict(n_centroids=nc, nprobe=nprobe, m=m, sub_dim=w, k_sub=k_sub,
              coarse_book=coarse, pq_books=pq_books)
    shortlist = {
        r.vec_id
        for r in A.ivfpq_topk(df, 0, k=k * rf, **kw).collect()
    }
    got = A.ivfpq_topk_refined(df, 0, k=k, refine_factor=rf, **kw).collect()
    assert len(got) == k
    assert {r.vec_id for r in got} <= shortlist
    q = vecs[0]

    def exact(i):
        v = vecs[i]
        return round(float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))), 6)

    for r in got:
        assert r.cosine == pytest.approx(exact(r.vec_id), abs=2e-6)
    cos_list = [r.cosine for r in got]
    assert cos_list == sorted(cos_list, reverse=True)
    # rerank quality: the refined set's exact-cosine sum >= plain ivfpq's
    plain = [exact(r.vec_id) for r in A.ivfpq_topk(df, 0, k=k, **kw).collect()]
    assert sum(cos_list) >= sum(plain) - 1e-9
    with pytest.raises(ValueError):
        A.ivfpq_topk_refined(df, 0, k=k, refine_factor=0, **kw)


def test_refined_recall_at_least_plain_ivfpq(spark):
    """The two-stage serving recall must dominate plain ADC serving on
    the same probes — the rerank can only improve which of the probed
    candidates get served; with a shortlist covering the whole probed
    set it equals the probe-pruning ceiling."""
    df, _ = _emb_df(spark, n=60, dim=8)
    m, w, k_sub, nc, nprobe = 2, 4, 4, 4, 2
    coarse = A.kmeans_codebook(df, n_centroids=nc, iters=1)
    pq_books = A.pq_codebooks(df, m=m, sub_dim=w, k_sub=k_sub, iters=1)
    kw = dict(n_queries=5, k=5, n_centroids=nc, nprobe=nprobe, m=m,
              sub_dim=w, k_sub=k_sub, coarse_book=coarse, pq_books=pq_books)
    plain = A.ivfpq_recall_multi(df, **kw).collect()[0].recall_at_k
    refined = A.ivfpq_recall_multi(df, refine_factor=3, **kw).collect()[0].recall_at_k
    assert refined >= plain - 1e-9
    # shortlist covering every probed vector: recall == probe ceiling ==
    # recall of IVF with exact scoring at the same nprobe
    refined_all = A.ivfpq_recall_multi(
        df, refine_factor=12, **kw
    ).collect()[0].recall_at_k
    ivf_exact = A.ivf_recall_multi(
        df, n_queries=5, k=5, n_centroids=nc, nprobe=nprobe, book=coarse
    ).collect()[0].recall_at_k
    assert refined_all == ivf_exact


def test_sq8_encode_codes_valid_and_python_parity(spark):
    """SQ8 codes are in [0, 255], the corpus min/max hit 0 and (near)
    255, a degenerate dimension encodes 0, and every code matches the
    Python replay of the same quantization rule."""
    import pytest

    df, vecs = _emb_df(spark, n=40, dim=6)
    # plant a degenerate dimension: constant value across the corpus
    const = spark.createDataFrame(
        [(i, [float(vecs[i][d]) for d in range(5)] + [1.5]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    bounds = A.sq_bounds(const)
    assert len(bounds) == 6
    assert bounds[5] == (1.5, 1.5)
    rows = {r.vec_id: r for r in A.sq_encode(const, bounds).collect()}
    mins, fwd, _inv = A._sq_scales(bounds)
    for i in range(40):
        code = rows[i].qcode
        assert all(0 <= c <= 255 for c in code)
        assert code[5] == 0  # degenerate dim -> scale 0 -> code 0
        for d in range(5):
            x = float(np.float32(vecs[i][d]))
            want = min(255, max(0, int(math.floor(round(
                (x - mins[d]) * fwd[d], 6)))))
            assert code[d] == want, (i, d)
        # true norm rides along
        v = [float(np.float32(x)) for x in vecs[i][:5]] + [1.5]
        assert rows[i].nrm == pytest.approx(
            math.sqrt(sum(x * x for x in v)), rel=1e-9
        )
    # per-dimension extremes: some vector hits code 0 and some hits >= 254
    for d in range(5):
        col = [rows[i].qcode[d] for i in range(40)]
        assert min(col) == 0
        assert max(col) >= 254


def test_sq8_topk_matches_python_adc_and_guards(spark):
    """sq_topk equals the pure-Python ADC replay (driver-folded C + w
    terms included), and the bounds/codes pairing guard trips."""
    import pytest

    df, vecs = _emb_df(spark, n=50, dim=8)
    bounds = A.sq_bounds(df)
    codes = {r.vec_id: (list(r.qcode), float(r.nrm))
             for r in A.sq_encode(df, bounds).collect()}
    got = A.sq_topk(df, 0, k=6, bounds=bounds).collect()
    q = [float(np.float32(x)) for x in vecs[0]]
    qn = math.sqrt(sum(x * x for x in q))
    c0, w = A._sq_score_terms(bounds, q)
    scored = []
    for vid, (code, nrm) in codes.items():
        if vid == 0:
            continue
        s = c0
        for cd, wd in zip(code, w):
            s += float(cd) * wd
        scored.append((round(s / (nrm * qn), 6), vid))
    want = sorted(scored, key=lambda t: (-t[0], t[1]))[:6]
    assert [(r.sq_score, r.vec_id) for r in got] == want
    # checksum pins per-position codes
    for r in got:
        code, _ = codes[r.vec_id]
        assert r.code_check == sum((d + 1) * c for d, c in enumerate(code))
    with pytest.raises(ValueError, match="bounds"):
        A.sq_topk(df, 0, codes=A.sq_encode(df, bounds))
    with pytest.raises(ValueError, match="dims"):
        A.sq_topk(df, 0, bounds=bounds[:4])


def test_sq8_recall_dominates_pq_on_same_battery(spark):
    """The finer quantizer must buy recall: SQ8 (8 bits/dim) >= PQ
    (m=2 subspaces over the same vectors) on the identical query
    battery, and SQ8 recall is high in absolute terms on a small
    corpus."""
    df, _ = _emb_df(spark, n=60, dim=8)
    bounds = A.sq_bounds(df)
    sq = A.sq_recall_multi(df, n_queries=5, k=5, bounds=bounds)
    sq_r = sq.collect()[0].recall_at_k
    pq_books = A.pq_codebooks(df, m=2, sub_dim=4, k_sub=4, iters=1)
    pq_r = A.pq_recall_multi(
        df, n_queries=5, k=5, m=2, sub_dim=4, k_sub=4, books=pq_books
    ).collect()[0].recall_at_k
    assert sq_r >= pq_r - 1e-9
    assert sq_r >= 0.8


def test_ivfsq_topk_is_sq8_restricted_to_probed_lists(spark):
    """IVF-SQ8 = SQ8 scoring restricted to the probed inverted lists:
    every result must (a) come from a probed centroid and (b) carry
    exactly the score and checksum the unrestricted SQ8 ADC assigns that
    vector; the pairing guard trips on an index without its bounds."""
    import pytest

    df, _ = _emb_df(spark, n=60, dim=8)
    nc, nprobe = 4, 2
    coarse = A.kmeans_codebook(df, n_centroids=nc, iters=1)
    bounds = A.sq_bounds(df)
    got = A.ivfsq_topk(
        df, 0, k=5, n_centroids=nc, nprobe=nprobe,
        coarse_book=coarse, bounds=bounds,
    ).collect()
    assert len(got) == 5
    _q, _qn, probe_ids, _ = A._ivf_probe_state(
        df, 0, nc, nprobe, "vec_id", book=coarse
    )
    assert all(r.centroid_id in probe_ids for r in got)
    full_sq = {
        r.vec_id: (r.code_check, r.sq_score)
        for r in A.sq_topk(df, 0, k=60, bounds=bounds).collect()
    }
    for r in got:
        assert full_sq[r.vec_id] == (r.code_check, r.sq_score)
    with pytest.raises(ValueError, match="bounds"):
        A.ivfsq_topk(df, 0, index=A.ivfsq_index(df, coarse, bounds))


def test_ivfsq_layout_probe_matches_inline_and_prunes_partitions(
    spark, tmp_path
):
    """The stored IVF-SQ8 layout must return exactly the inline
    ivfsq_topk result while scanning only the probed inverted-list
    partitions of uint8 codes (never the raw embeddings)."""
    import pytest

    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse = A.kmeans_codebook(emb, n_centroids=8, iters=1)
    bounds = A.sq_bounds(emb)
    path = str(tmp_path / "ivfsq_layout")
    A.write_ivfsq_layout(emb, path, coarse, bounds)
    probe = A.ivfsq_topk_from_layout(
        spark, path, emb, 0, k=10, n_centroids=8, nprobe=2,
        coarse_book=coarse, bounds=bounds,
    )
    inline = A.ivfsq_topk(
        emb, 0, k=10, n_centroids=8, nprobe=2,
        coarse_book=coarse, bounds=bounds,
    )
    key = lambda r: (r.vec_id, r.centroid_id, r.code_check, r.sq_score)
    assert [key(r) for r in probe.collect()] == [
        key(r) for r in inline.collect()
    ]
    plan = explain_string(probe, "formatted")
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]
    # the layout stores codes, not vectors: the probed scan must not
    # read an embedding column at all
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas and all("embedding" not in ln for ln in schemas)
    # training-pairing guards
    with pytest.raises(ValueError, match="bounds"):
        A.ivfsq_topk_from_layout(spark, path, emb, 0, coarse_book=coarse)
    with pytest.raises(ValueError, match="coarse_book"):
        A.ivfsq_topk_from_layout(spark, path, emb, 0, bounds=bounds)


def test_append_ivfsq_layout_equals_rebuild_and_replays_idempotently(
    spark, tmp_path
):
    """Appending a batch with the frozen coarse book + bounds equals a
    full rebuild over the union corpus; a replayed epoch overwrites
    itself (idempotent); appending an epoch batch into a plain layout is
    rejected at write time."""
    import pytest

    df, _ = _emb_df(spark, n=60, dim=8)
    base = df.filter(F.col("vec_id") < 40)
    batch = df.filter(F.col("vec_id") >= 40)
    coarse = A.kmeans_codebook(base, n_centroids=4, iters=1)
    bounds = A.sq_bounds(base)
    path = str(tmp_path / "ivfsq_epochs")
    A.write_ivfsq_layout(base, path, coarse, bounds, epoch=-1)
    A.append_ivfsq_layout(batch, path, coarse, bounds, epoch_id=7)
    kw = dict(n_centroids=4, nprobe=2, coarse_book=coarse, bounds=bounds)
    got = A.ivfsq_topk_from_layout(spark, path, df, 0, k=8, **kw).collect()
    # full rebuild over the union with the SAME training
    path2 = str(tmp_path / "ivfsq_full")
    A.write_ivfsq_layout(df, path2, coarse, bounds)
    want = A.ivfsq_topk_from_layout(
        spark, path2, df, 0, k=8, **kw
    ).collect()
    key = lambda r: (r.vec_id, r.centroid_id, r.code_check, r.sq_score)
    assert [key(r) for r in got] == [key(r) for r in want]
    # crash-replay: the same epoch lands again, results unchanged
    A.append_ivfsq_layout(batch, path, coarse, bounds, epoch_id=7)
    again = A.ivfsq_topk_from_layout(spark, path, df, 0, k=8, **kw).collect()
    assert [key(r) for r in again] == [key(r) for r in want]
    n_rows = spark.read.parquet(path).count()
    assert n_rows == 60  # no duplicated epoch rows
    # scheme guard: plain layout rejects an epoch append (and vice versa)
    path3 = str(tmp_path / "ivfsq_plain")
    A.write_ivfsq_layout(base, path3, coarse, bounds)
    with pytest.raises(ValueError, match="epoch"):
        A.append_ivfsq_layout(batch, path3, coarse, bounds, epoch_id=1)
    with pytest.raises(ValueError, match="epoch"):
        A.append_ivfsq_layout(batch, path, coarse, bounds)  # no epoch_id


def test_books_json_roundtrips_sq8_bounds(tmp_path, spark):
    """SQ8 bounds ship in the same JSON artifact as codebooks and
    round-trip exactly; the loaded bounds serve a stored layout with
    results identical to the in-memory training."""
    df, _ = _emb_df(spark, n=50, dim=8)
    coarse = A.kmeans_codebook(df, n_centroids=4, iters=1)
    bounds = A.sq_bounds(df)
    meta = str(tmp_path / "books.json")
    A.save_books(meta, coarse_book=coarse, bounds=bounds)
    loaded = A.load_books(meta)
    assert loaded["bounds"] == bounds  # exact float round-trip
    assert loaded["coarse_book"] == [
        (c, list(v), n) for c, v, n in coarse
    ] or loaded["coarse_book"] == coarse
    path = str(tmp_path / "ivfsq")
    A.write_ivfsq_layout(df, path, coarse, bounds)
    got = A.ivfsq_topk_from_layout(
        spark, path, df, 0, k=6, n_centroids=4, nprobe=2,
        coarse_book=loaded["coarse_book"], bounds=loaded["bounds"],
    ).collect()
    want = A.ivfsq_topk(
        df, 0, k=6, n_centroids=4, nprobe=2,
        coarse_book=coarse, bounds=bounds,
    ).collect()
    key = lambda r: (r.vec_id, r.centroid_id, r.code_check, r.sq_score)
    assert [key(r) for r in got] == [key(r) for r in want]


def test_sq8_quantization_properties_random_vectors(spark):
    """Hypothesis over random vector sets: codes stay in [0, 255], the
    quantizer is monotone per dimension (x <= y never encodes higher),
    and midpoint reconstruction lands within one quantization step of
    the source on non-degenerate dimensions."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vecs=st.lists(
            st.lists(
                st.floats(-10, 10, allow_nan=False, width=32),
                min_size=4,
                max_size=4,
            ),
            min_size=3,
            max_size=12,
        )
    )
    def inner(vecs):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        bounds = A.sq_bounds(df)
        mins, fwd, inv = A._sq_scales(bounds)
        rows = {r.vec_id: list(r.qcode) for r in A.sq_encode(df, bounds).collect()}
        import numpy as np

        f32 = [[float(np.float32(x)) for x in v] for v in vecs]
        for i, v in enumerate(f32):
            code = rows[i]
            for d in range(4):
                assert 0 <= code[d] <= 255
                mn, mx = bounds[d]
                if mx > mn:
                    # reconstruction error bounded by one step
                    xhat = mins[d] + (code[d] + 0.5) * inv[d]
                    assert abs(xhat - v[d]) <= inv[d] * 1.0000001
                else:
                    assert code[d] == 0
        # per-dimension monotonicity across the corpus
        for d in range(4):
            order = sorted(range(len(f32)), key=lambda i: f32[i][d])
            codes_sorted = [rows[i][d] for i in order]
            assert codes_sorted == sorted(codes_sorted)

    inner()


def test_ivfsq_refined_reranks_shortlist_with_exact_cosine(spark):
    """ivfsq_topk_refined mirrors the PQ refined contract: (a) subset of
    the SQ8 shortlist, (b) exact cosine on every returned vector (numpy
    check), (c) ordered by exact cosine, (d) exact-score quality >= the
    unrefined ivfsq top-k's."""
    import pytest

    df, vecs = _emb_df(spark, n=60, dim=8)
    nc, nprobe, k, rf = 4, 2, 5, 3
    coarse = A.kmeans_codebook(df, n_centroids=nc, iters=1)
    bounds = A.sq_bounds(df)
    kw = dict(n_centroids=nc, nprobe=nprobe, coarse_book=coarse,
              bounds=bounds)
    shortlist = {
        r.vec_id for r in A.ivfsq_topk(df, 0, k=k * rf, **kw).collect()
    }
    got = A.ivfsq_topk_refined(df, 0, k=k, refine_factor=rf, **kw).collect()
    assert len(got) == k
    assert {r.vec_id for r in got} <= shortlist
    q = vecs[0]

    def exact(i):
        v = vecs[i]
        return round(
            float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))), 6
        )

    for r in got:
        assert r.cosine == pytest.approx(exact(r.vec_id), abs=2e-6)
    cos_list = [r.cosine for r in got]
    assert cos_list == sorted(cos_list, reverse=True)
    plain = [exact(r.vec_id) for r in A.ivfsq_topk(df, 0, k=k, **kw).collect()]
    assert sum(cos_list) >= sum(plain) - 1e-9
    with pytest.raises(ValueError):
        A.ivfsq_topk_refined(df, 0, k=k, refine_factor=0, **kw)


def test_ivfsq_refined_recall_at_least_plain(spark):
    """Two-stage IVF-SQ8 serving recall >= unrefined SQ8 serving on the
    same probes; with a shortlist covering the whole probed set it
    equals the probe-pruning ceiling (IVF with exact scoring)."""
    df, _ = _emb_df(spark, n=60, dim=8)
    nc, nprobe = 4, 2
    coarse = A.kmeans_codebook(df, n_centroids=nc, iters=1)
    bounds = A.sq_bounds(df)
    kw = dict(n_queries=5, k=5, n_centroids=nc, nprobe=nprobe,
              coarse_book=coarse, bounds=bounds)
    plain = A.ivfsq_recall_multi(df, **kw).collect()[0].recall_at_k
    refined = A.ivfsq_recall_multi(
        df, refine_factor=3, **kw
    ).collect()[0].recall_at_k
    assert refined >= plain - 1e-9
    refined_all = A.ivfsq_recall_multi(
        df, refine_factor=12, **kw
    ).collect()[0].recall_at_k
    ivf_exact = A.ivf_recall_multi(
        df, n_queries=5, k=5, n_centroids=nc, nprobe=nprobe, book=coarse
    ).collect()[0].recall_at_k
    assert refined_all == ivf_exact


def test_refined_from_layout_matches_inline_both_families(spark, tmp_path):
    """Two-stage serving off the STORED layouts (r8): for both quantizer
    families, the refined-from-layout result equals the in-memory
    refined result, the shortlist scan partition-prunes to the probed
    lists without reading embeddings, and the rerank fetches raw rows
    via broadcast join (no corpus shuffle)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        ivfpq_topk_refined,
        ivfpq_topk_refined_from_layout,
        ivfsq_topk_refined,
        ivfsq_topk_refined_from_layout,
        kmeans_codebook,
        pq_codebooks,
        sq_bounds,
        write_ivfpq_layout,
        write_ivfsq_layout,
    )
    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse = kmeans_codebook(emb, n_centroids=8, iters=1)
    pq_books = pq_codebooks(emb, m=4, sub_dim=16, k_sub=8, iters=1)
    bounds = sq_bounds(emb)
    pq_path = str(tmp_path / "pq")
    sq_path = str(tmp_path / "sq")
    write_ivfpq_layout(emb, pq_path, coarse, pq_books)
    write_ivfsq_layout(emb, sq_path, coarse, bounds)

    cases = [
        (
            ivfpq_topk_refined_from_layout(
                spark, pq_path, emb, 0, k=5, refine_factor=3,
                n_centroids=8, nprobe=2, coarse_book=coarse,
                pq_books=pq_books,
            ),
            ivfpq_topk_refined(
                emb, 0, k=5, refine_factor=3, n_centroids=8, nprobe=2,
                coarse_book=coarse, pq_books=pq_books,
            ),
            "pq_score",
        ),
        (
            ivfsq_topk_refined_from_layout(
                spark, sq_path, emb, 0, k=5, refine_factor=3,
                n_centroids=8, nprobe=2, coarse_book=coarse,
                bounds=bounds,
            ),
            ivfsq_topk_refined(
                emb, 0, k=5, refine_factor=3, n_centroids=8, nprobe=2,
                coarse_book=coarse, bounds=bounds,
            ),
            "sq_score",
        ),
    ]
    for stored, inline, score_col in cases:
        key = lambda r: (r.vec_id, r[score_col], r.cosine)
        assert [key(r) for r in stored.collect()] == [
            key(r) for r in inline.collect()
        ], score_col
        plan = explain_string(stored, "formatted")
        # shortlist stage: partition-pruned, embedding-free scan of the
        # stored codes
        assert "PartitionFilters" in plan and "centroid_id" in plan.split(
            "PartitionFilters"
        )[1].split("\n")[0], score_col
        # rerank stage: broadcast join against the raw table — the
        # corpus is never shuffled
        assert "BroadcastHashJoin" in plan, score_col
        assert "Exchange hashpartitioning" not in plan, score_col


def test_knn_graph_lsh_capped_rank_window_bound_and_recall(spark):
    """r9: the capped kNN graph bounds candidate generation per bucket
    with a rank window (NOT a star — every source keeps a per-source
    neighbor list): (a) per-bucket candidate volume is O(B·cand) — a
    mass-duplicate bucket of B vectors yields ≤ B·cand pairs, not B²;
    (b) with cand >= bucket size it reproduces knn_graph_lsh exactly;
    (c) knn_graph_lsh_recall reports both dials with capped <= lsh on
    this fixture and both within (0, 1]."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        knn_graph_lsh,
        knn_graph_lsh_capped,
        knn_graph_lsh_recall,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    k = 3
    # (b) wide window == uncapped (every bucket smaller than cand)
    wide = {
        (r.vec_id, r.neighbor_id, r.cosine, r.rank)
        for r in knn_graph_lsh_capped(emb, k=k, cand_per_bucket=10**6).collect()
    }
    unc = {
        (r.vec_id, r.neighbor_id, r.cosine, r.rank)
        # r10: uncapped is now the explicit opt-out, not the default
        for r in knn_graph_lsh(emb, k=k, cand_per_bucket=None).collect()
    }
    assert wide == unc
    # (a) mass-duplicate bucket: B clones, narrow window -> each source
    # pairs only with the next `cand` ranks, so every source still HAS
    # neighbors (no star collapse) and the candidate count is linear
    B, cand, dim = 40, 2, 8
    clones = [(i, [1.0] * dim) for i in range(B)]
    cdf = spark.createDataFrame(clones, "vec_id long, embedding array<float>")
    got = knn_graph_lsh_capped(
        cdf, k=2, bands=2, rows_per_band=2, dim=dim, cand_per_bucket=cand
    ).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r.vec_id, []).append(r.neighbor_id)
    # EVERY clone keeps a neighbor list (a star cap would leave only
    # rep-anchored lists)
    assert set(per_src) == set(range(B))
    # rank-window adjacency: neighbors are within `cand` rank positions
    for vid, nbrs in per_src.items():
        for n in nbrs:
            assert abs(n - vid) <= cand
    # (c) the recall dial
    row = knn_graph_lsh_recall(emb, k=k).collect()[0]
    assert row.n_exact > 0
    assert 0.0 < row.recall_capped <= row.recall_lsh <= 1.0


def test_knn_graph_lsh_front_door_is_bounded_by_default(spark):
    """r10 routing pin: the primary-named APIs serve the rank-window
    bounded plan by default; cand_per_bucket=None is the explicit
    uncapped opt-out (the r9 verdict's naming-footgun fix)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        knn_graph,
        knn_graph_lsh,
        knn_graph_lsh_capped,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    key = lambda df: sorted(  # noqa: E731
        (r.vec_id, r.neighbor_id, r.rank, r.cosine) for r in df.collect()
    )
    default = key(knn_graph_lsh(emb, k=3))
    assert default == key(knn_graph_lsh_capped(emb, k=3))
    assert default == key(knn_graph(emb, k=3, method="lsh"))
    # explicit opt-out reaches the uncapped candidate generator: its plan
    # has no rank-window join condition (r-range predicate), the
    # default's does
    capped_plan = knn_graph_lsh(emb, k=3)._jdf.queryExecution() \
        .optimizedPlan().toString()
    uncapped_plan = knn_graph_lsh(emb, k=3, cand_per_bucket=None) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "rb" in capped_plan
    assert "rb" not in uncapped_plan
    import pytest
    with pytest.raises(ValueError, match="method"):
        knn_graph(emb, method="cosine")
    with pytest.raises(TypeError, match="unexpected kwargs"):
        knn_graph(emb, method="exact", bands=3)
