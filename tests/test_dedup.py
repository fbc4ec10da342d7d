"""Dedup operators on hand-built corpora with known answers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators import dedup as D
from tests.reference_sim import shingle_set

CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
    3: "the quick brown fox jumps over the lazy cat today",  # near dup
    4: "completely unrelated text about engines and data",
    5: "another unrelated document with different words entirely",
}


def _docs(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], "doc_id long, text string"
    )


def test_exact_duplicates(spark):
    rows = {r.text_hash: r for r in D.exact_duplicates(_docs(spark)).collect()}
    groups = {(r.keeper_doc_id, r.n_copies) for r in rows.values()}
    assert (1, 2) in groups  # docs 1+2 collapse, keeper = min id
    assert sum(r.n_copies for r in rows.values()) == len(CORPUS)


def _true_jaccard(a: int, b: int) -> float:
    sa, sb = shingle_set(CORPUS[a]), shingle_set(CORPUS[b])
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_pairs_exact_values(spark):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    for (a, b), j in got.items():
        assert math.isclose(j, _true_jaccard(a, b), rel_tol=1e-12)


def test_ngram_jaccard_max_df_prunes_hot_terms(spark):
    # "shared hot trigram" and "tail words here" appear in all 5 docs
    # (df=5 > max_df=3) so they are dropped from the co-count: the
    # identical pair (0,9) shares only its 3 unique{0} trigrams of its 5
    # total -> jaccard = 3/(5+5-3) = 3/7, below any high threshold.
    docs = spark.createDataFrame(
        [(i, f"shared hot trigram unique{i} tail words here") for i in range(4)]
        + [(9, "shared hot trigram unique0 tail words here")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.4, max_df=3).collect()
    }
    assert set(got) == {(0, 9)}
    assert math.isclose(got[(0, 9)], 3 / 7, rel_tol=1e-12)
    # without the cap the identical pair scores 1.0
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert math.isclose(full[(0, 9)], 1.0)


def test_prefix_filter_equals_inverted_index(spark):
    # prefix filtering is an exact optimization: identical result set
    docs = _docs(spark)
    for t in (0.2, 0.35, 0.6, 0.9):
        brute = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        pref = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.ngram_jaccard_pairs_prefix(docs, threshold=t).collect()
        }
        assert brute == pref


def test_minhash_lsh_finds_near_dups_with_exact_verify(spark):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(_docs(spark), threshold=0.3).collect()
    }
    # identical docs always collide in every band and verify at 1.0
    assert math.isclose(got[(1, 2)], 1.0)
    # verification step reports *exact* jaccard for whatever was found
    for (a, b), j in got.items():
        assert math.isclose(j, _true_jaccard(a, b), rel_tol=1e-12)
    assert (1, 4) not in got and (4, 5) not in got


def test_simhash_identical_docs_equal_fingerprints(spark):
    fp = {r.doc_id: r.simhash for r in D.simhash(_docs(spark)).collect()}
    assert fp[1] == fp[2]
    assert 0 <= fp[1] < 2**16


def test_simhash_pairs_hamming(spark):
    got = {(r.doc_a, r.doc_b): r.hamming for r in
           D.simhash_dup_pairs(_docs(spark), max_hamming=2).collect()}
    assert got[(1, 2)] == 0
    for (a, b), h in got.items():
        assert h <= 2


def test_embedding_dup_pairs(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.01, 0.0]),   # ~same direction as 1
            (3, [0.0, 1.0, 0.0]),    # orthogonal
            (4, [-1.0, 0.0, 0.0]),   # opposite
        ],
        "vec_id long, embedding array<float>",
    )
    got = {(r.vec_a, r.vec_b): r.cosine for r in
           D.embedding_dup_pairs(emb, threshold=0.95).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] > 0.999


def test_incremental_dedup_probes_existing_corpus(spark):
    existing = spark.createDataFrame(
        [
            (10, CORPUS[1]),
            (20, CORPUS[4]),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (31, CORPUS[1]),  # exact copy of 10
            # same token stream as 10 (identical shingles -> every band
            # collides, guaranteed) but different bytes -> not exact
            (32, "the quick  brown fox, jumps over the lazy dog!"),
            (33, CORPUS[5]),  # novel
            (34, "xy"),       # <3 tokens: invisible to LSH, no digest match
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.dup_of): (r.kind, r.jaccard)
        for r in D.incremental_dedup(existing, incoming, threshold=0.3).collect()
    }
    assert set(got) == {(31, 10), (32, 10)}
    assert got[(31, 10)] == ("exact", 1.0)
    kind, jac = got[(32, 10)]
    assert kind == "near"
    assert math.isclose(jac, 1.0, rel_tol=1e-12)


def test_incremental_dedup_within_batch_dups_are_not_flagged(spark):
    # the operator's contract is batch-vs-corpus; two copies arriving in
    # the same batch dedup against each other via the normal all-pairs op
    existing = spark.createDataFrame([(1, CORPUS[4])], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(2, CORPUS[1]), (3, CORPUS[1])], "doc_id long, text string"
    )
    assert D.incremental_dedup(existing, incoming, threshold=0.3).count() == 0


def test_incremental_probe_matches_inline_and_never_shuffles_corpus(spark):
    """build_dedup_index + incremental_dedup_probe must produce exactly
    the inline incremental_dedup relations, with both stored index scans
    bucketed so the corpus side joins shuffle-free."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_probe,
    )
    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta doc 3"),  # exact dup
            (101, "alpha beta gamma delta epsilon zeta doc other"),  # near dup
            (102, "totally unrelated words that have no overlap whatsoever"),
        ],
        "doc_id long, text string",
    )
    build_dedup_index(corpus, prefix="t_didx", n_buckets=4)
    probe = incremental_dedup_probe(spark, batch, prefix="t_didx")
    inline = incremental_dedup(corpus, batch)
    key = lambda r: (r.doc_id, r.dup_of, r.kind, round(r.jaccard, 9))
    assert sorted(map(key, probe.collect())) == sorted(map(key, inline.collect()))
    plan = explain_string(probe, "formatted")
    assert plan.count("Bucketed: true") == 2  # both index scans stay bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_string(incremental_dedup_probe(spark, batch, prefix="t_didx"), "formatted")
        # with broadcast off, every probe join is SMJ/shuffle-hash; the
        # bucketed sides still must not re-shuffle: no Exchange directly
        # above a bucketed scan subtree
        assert plan.count("Bucketed: true") == 2
        import re
        # each bucketed scan feeds a Sort/Join without an intervening Exchange
        assert not re.search(r"Exchange hashpartitioning\((digest|bh)#", plan)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_base_hash_modes_share_verified_semantics(spark):
    # Both hash families go through the same exact-Jaccard verification, so
    # every emitted pair is a true near-dup in either mode, and the exact
    # duplicates seeded in the fixture collide in every band family.
    docs = _docs(spark)
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        exact_duplicates,
    )

    exact_pairs = set()
    for r in exact_duplicates(docs).filter("n_copies > 1").collect():
        group = sorted(
            x.doc_id
            for x in docs.filter(f"md5(text) = '{r.text_hash}'")
            .select("doc_id")
            .collect()
        )
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                exact_pairs.add((group[i], group[j]))
    for mode in ("md5", "xxhash64"):
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.minhash_lsh_pairs(
                docs, threshold=0.3, base_hash=mode
            ).collect()
        }
        assert all(j >= 0.3 for j in got.values()), mode
        missing = exact_pairs - set(got)
        assert not missing, (mode, missing)
        assert all(got[p] == 1.0 for p in exact_pairs), mode


def _mass_dup_docs(spark, n, extra=()):
    return spark.createDataFrame(
        [(i, "mass duplicated body text repeated verbatim in every doc")
         for i in range(n)]
        + list(extra),
        "doc_id long, text string",
    )


def test_lsh_hot_bucket_star_overflow(spark):
    """Mass-duplicate corpus, star mode (default): each hot-bucket member
    pairs with the bucket's min-id representative (O(B) star pairs, not
    O(B^2)), no aggregated row exceeds the cap, small groups unaffected,
    and the census piggybacks on the action — no eager job at build."""
    n = 5000
    docs = _mass_dup_docs(
        spark, n, [(n + 1, CORPUS[1]), (n + 2, CORPUS[1]), (n + 3, CORPUS[4])]
    )
    sc = spark.sparkContext
    jobs_before = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
    stats = {}
    pairs = D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=100, stats=stats)
    # building the plan with stats must NOT launch a census job (r3 did)
    assert len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None)) == jobs_before
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (n + 1, n + 2) in got          # small bucket unaffected
    hot = {(a, b) for a, b in got if a < n and b < n}
    assert hot == {(0, j) for j in range(1, n)}  # exactly the rep star
    census = D.overflow_census(stats)
    assert census["overflow_buckets"] == 4  # the mass-dup bucket, once per band
    assert census["overflow_docs"] == 4 * n
    # bounded BY CONSTRUCTION: no materialized bucket row exceeds the cap
    banded = D._banded_shingles(docs, k=16, bands=4)
    buckets = D._bounded_buckets(banded, "bh", ["doc_id", "s"], 100)
    assert buckets.agg(F.max(F.size("members"))).first()[0] <= 100


def test_lsh_hot_bucket_drop_overflow(spark):
    """overflow='drop' keeps the round-3 contract: over-cap buckets emit
    nothing; the census still rides the main action."""
    n = 2000
    docs = _mass_dup_docs(spark, n, [(n + 1, CORPUS[1]), (n + 2, CORPUS[1])])
    stats = {}
    got = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(
            docs, threshold=0.3, max_bucket=100, stats=stats, overflow="drop"
        ).collect()
    }
    assert (n + 1, n + 2) in got
    assert not any(a < n and b < n for a, b in got)
    census = D.overflow_census(stats)
    assert census["overflow_buckets"] == 4
    assert census["overflow_docs"] == 4 * n


def test_simhash_hot_bucket_star_overflow(spark):
    n = 3000
    docs = _mass_dup_docs(spark, n, [(n + 1, CORPUS[1]), (n + 2, CORPUS[1])])
    stats = {}
    got = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_dup_pairs(docs, max_bucket=50, stats=stats).collect()
    }
    assert (n + 1, n + 2) in got
    hot = {(a, b) for a, b in got if a < n and b < n}
    assert hot == {(0, j) for j in range(1, n)}  # star around the rep
    census = D.overflow_census(stats)
    # identical fingerprints -> one hot bucket per band (3 bands at hd<=2),
    # plus any band value the identical-pair fingerprint happens to share
    assert census["overflow_buckets"] >= 3
    assert census["overflow_docs"] >= 3 * n


def test_star_overflow_cluster_recall(spark):
    """THE point of star mode: on a mass-NEAR-duplicate corpus (no two
    texts identical, so the exact layer upstream cannot catch it), the
    capped star plan yields the SAME duplicate clusters as the uncapped
    all-pairs plan — the cap costs pair-level recall but zero
    cluster-level recall; drop mode loses the whole hot cluster."""
    n = 400
    base = "shared near duplicate body text repeated with a tiny suffix"
    docs = spark.createDataFrame(
        [(i, f"{base} variant") for i in range(n)]      # near-identical
        + [(n + 1, CORPUS[4]), (n + 2, CORPUS[5])],     # unrelated
        "doc_id long, text string",
    )

    def clusters(pairs_df):
        return {
            r.doc_id: r.cluster_id
            for r in D.duplicate_clusters(docs, pairs=pairs_df).collect()
        }

    uncapped = clusters(
        D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=None)
    )
    starred = clusters(
        D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=20)
    )
    dropped = clusters(
        D.minhash_lsh_pairs(
            docs, threshold=0.3, max_bucket=20, overflow="drop"
        )
    )
    assert uncapped[0] == uncapped[n - 1] == 0  # one hot cluster exists
    assert starred == uncapped                  # star: full cluster recall
    assert dropped != uncapped                  # drop: hot cluster shattered
    assert dropped[n - 1] == n - 1              # ...members left singleton


def test_lsh_cap_is_exact_below_threshold(spark):
    """With every bucket under the cap, capped and uncapped plans are
    result-identical — the bound only changes behavior on hot buckets."""
    docs = _docs(spark)
    key = lambda r: (r.doc_a, r.doc_b, round(r.jaccard, 12))
    base = sorted(
        map(key, D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=None).collect())
    )
    capped = sorted(
        map(key, D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=10).collect())
    )
    assert base == capped and base
    sh_key = lambda r: (r.doc_a, r.doc_b, r.hamming)
    sh_base = sorted(
        map(sh_key, D.simhash_dup_pairs(docs, max_bucket=None).collect())
    )
    sh_capped = sorted(
        map(sh_key, D.simhash_dup_pairs(docs, max_bucket=10).collect())
    )
    assert sh_base == sh_capped and sh_base


def test_cluster_rounds_logarithmic_on_chain(spark):
    # 500-node path graph: plain min propagation needs diameter rounds
    # (499); pointer jumping must land under ceil(log2(diameter)) + 1.
    import math

    n = 500
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats = {}
    labels = {
        r.doc_id: r.cluster_id
        for r in D.duplicate_clusters(docs, pairs=pairs, stats=stats).collect()
    }
    assert labels == {i: 0 for i in range(n)}
    # +1 for the convergence-detection round (signature-equal pass)
    assert stats["rounds"] <= math.ceil(math.log2(n - 1)) + 1, stats


def test_cluster_rounds_logarithmic_on_star_of_chains(spark):
    """Adversarial 2-level topology: 8 chains of length 64 hanging off one
    center, global min label at the far END of one chain (diameter 128 —
    the label must cross the full diameter). Pointer jumping must stay
    within ceil(log2(diameter)) + 1 rounds; plain propagation would need
    ~diameter rounds."""
    import math

    center = 999_999
    chains, length = 8, 64
    nodes = [center]
    edges = []
    for j in range(chains):
        prev = center
        for i in range(1, length + 1):
            node = 0 if (j == 0 and i == length) else (j + 1) * 10_000 + i
            nodes.append(node)
            edges.append((min(prev, node), max(prev, node)))
            prev = node
    docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    stats = {}
    labels = {
        r.doc_id: r.cluster_id
        for r in D.duplicate_clusters(docs, pairs=pairs, stats=stats).collect()
    }
    assert set(labels.values()) == {0}
    assert len(labels) == chains * length + 1
    diameter = 2 * length
    assert stats["rounds"] <= math.ceil(math.log2(diameter)) + 1, stats


def test_cluster_raises_when_rounds_exhausted(spark):
    """Non-convergence must raise, not silently emit duplicate doc_id
    rows with conflicting cluster ids (the final join assumes a star)."""
    import pytest

    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        duplicate_clusters,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(docs, pairs=pairs, max_iter=1)
    # and enough rounds converges fine on the same chain
    out = duplicate_clusters(docs, pairs=pairs, max_iter=20)
    rows = out.collect()
    assert len(rows) == 40
    assert {r.cluster_id for r in rows} == {0}


def test_embedding_lsh_pairs_subset_of_brute_force(spark):
    """LSH-bucketed embedding pairs = the brute-force pairs restricted to
    bucket-mates: a subset at the same threshold, with every reported
    pair's cosine identical to the exact computation, and a duplicated
    vector (same bucket by construction) always found."""
    import numpy as np

    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 64)).astype("float32")
    vecs[7] = vecs[3]  # exact duplicate pair (3, 7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    t = 0.3
    exact = {(r.vec_a, r.vec_b): r.cosine
             for r in embedding_dup_pairs(df, threshold=t).collect()}
    lsh = {(r.vec_a, r.vec_b): r.cosine
           for r in embedding_dup_pairs_lsh(df, threshold=t).collect()}
    assert set(lsh) <= set(exact)
    for pair, cos in lsh.items():
        assert exact[pair] == cos
    assert (3, 7) in lsh and lsh[(3, 7)] == 1.0


def test_embedding_multiband_superset_and_recall(spark):
    """Multi-band hyperplane LSH: band 0 reproduces the single-band
    bucketing exactly, so multi-band pairs are a superset; on the
    fixture corpus the extra bands recover pairs band 0 split, so
    recall_multi is STRICTLY greater; and every recovered pair is
    exact-cosine verified (subset of the brute-force pair set)."""
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    t = 0.25
    exact = {
        (r.vec_a, r.vec_b)
        for r in D.embedding_dup_pairs(emb, threshold=t).collect()
    }
    single = {
        (r.vec_a, r.vec_b)
        for r in D.embedding_dup_pairs_lsh(emb, threshold=t, n_planes=4).collect()
    }
    multi = {
        (r.vec_a, r.vec_b)
        for r in D.embedding_dup_pairs_lsh_multiband(
            emb, threshold=t, bands=3, rows_per_band=4
        ).collect()
    }
    assert single <= multi <= exact
    assert len(multi) > len(single)  # extra bands genuinely recover pairs
    row = D.embedding_lsh_recall(
        emb, threshold=t, bands=3, rows_per_band=4
    ).collect()[0]
    assert row.n_exact == len(exact)
    assert row.n_single == len(single)
    assert row.n_multi == len(multi)
    assert row.recall_multi > row.recall_single


def test_incremental_probe_hot_index_bucket_star(spark):
    """Hot INDEX buckets under the probe's star contract: an incoming
    doc hitting an over-cap (band, bh) bucket joins only the bucket's
    representative row (dup_of = min corpus doc id) instead of the whole
    bucket — the per-epoch join output is bounded at build-time-computed
    sizes; uncapped probing still returns the full match set."""
    n = 200
    corpus = spark.createDataFrame(
        [(i, "hot near duplicated corpus body text repeated verbatim")
         for i in range(n)]
        + [(n + 1, CORPUS[4])],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        # near (not exact) duplicate of the hot content: digest differs,
        # so only the band layer can see it
        [(9000, "hot near duplicated corpus body text repeated verbatim today"),
         (9001, CORPUS[5])],
        "doc_id long, text string",
    )
    D.build_dedup_index(corpus, prefix="hot_probe_idx")
    capped = D.incremental_dedup_probe(
        spark, incoming, prefix="hot_probe_idx", threshold=0.5, max_bucket=10
    ).collect()
    assert {(r.doc_id, r.dup_of, r.kind) for r in capped} == {
        (9000, 0, "near")  # only the hot bucket's representative
    }
    full = D.incremental_dedup_probe(
        spark, incoming, prefix="hot_probe_idx", threshold=0.5,
        max_bucket=None,
    ).collect()
    near_full = {(r.doc_id, r.dup_of) for r in full if r.kind == "near"}
    assert near_full == {(9000, i) for i in range(n)}


def test_bloom_gated_probe_matches_ungated_and_gates_map_side(spark):
    """r12 (the membership sketch's second in-pipeline consumer — the
    stored-index probe gate the r11 verdict named): ``bloom_gate=True``
    builds kilobyte bitmaps over the BATCH's digests and band hashes
    and gates the STORED index scans map-side, so the probe joins
    sort/hash only might-match stored rows instead of the whole index.
    Purely physical: row-identical to the ungated probe under an honest
    AND a deliberately saturated 64-bit bitmap (forced false positives
    must die in the exact joins); the stored sides still never
    exchange; and the gate composes with ``exclude_epoch``."""
    import re

    from similarity_search_with_hadoop_mapreduce_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )
    from similarity_search_with_hadoop_mapreduce_spark.plans import explain_string

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i % 7}")
         for i in range(40)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta doc 3"),       # exact
         (101, "alpha beta gamma delta epsilon zeta doc other"),   # near
         (102, "totally unrelated words that have no overlap whatsoever")],
        "doc_id long, text string",
    )
    D.build_dedup_index(corpus, prefix="bloomgate_idx", n_buckets=4)
    key = lambda r: (r.doc_id, r.dup_of, r.kind, round(r.jaccard, 9))
    ungated = sorted(map(key, D.incremental_dedup_probe(
        spark, batch, prefix="bloomgate_idx").collect()))
    gated = sorted(map(key, D.incremental_dedup_probe(
        spark, batch, prefix="bloomgate_idx", bloom_gate=True).collect()))
    assert gated == ungated and len(ungated) > 0
    sat = sorted(map(key, D.incremental_dedup_probe(
        spark, batch, prefix="bloomgate_idx", bloom_gate=True,
        bloom_m_bits=64).collect()))
    assert sat == ungated
    # plan: bit tests land on the gated stored occurrences (digest +
    # band), stored scans stay bucketed, and the gate adds NO exchange
    # on the stored join keys even with broadcast disabled
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_string(D.incremental_dedup_probe(
            spark, batch, prefix="bloomgate_idx", bloom_gate=True),
            "formatted")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert plan.count("shiftright(") >= 2
    assert "Bucketed: true" in plan
    assert not re.search(r"Exchange hashpartitioning\((digest|bh)#", plan)
    # prune evidence, measured at the gate itself: a batch disjoint from
    # the corpus lights no bit pattern any stored digest passes
    # (m=2^20, one key -> FP ~ 2^-something large), so the gated stored
    # side is EMPTY where the ungated side is the whole index
    stored = spark.table("bloomgate_idx_digest")
    disjoint = spark.createDataFrame(
        [(7, "nothing in common with anything stored here")],
        "doc_id long, text string",
    )
    bl = bloom_build(
        disjoint.select(F.md5("text").alias("digest")), "digest",
        m_bits=1 << 20, with_count=False,
    )
    survivors = bloom_probe(
        stored, bl, "digest", m_bits=1 << 20
    ).filter("bloom_hit").count()
    assert survivors == 0 and stored.count() == 40
    # exclude_epoch composes below the gate: append an epoch, then a
    # replay-style probe excluding it is gated/ungated-identical too
    D.append_dedup_index(batch.filter("doc_id = 102"),
                         prefix="bloomgate_idx", epoch_id=5, n_buckets=4)
    probe2 = spark.createDataFrame(
        [(300, "totally unrelated words that have no overlap whatsoever"),
         (301, "alpha beta gamma delta epsilon zeta doc 3")],
        "doc_id long, text string",
    )
    for excl in (None, 5):
        u = sorted(map(key, D.incremental_dedup_probe(
            spark, probe2, prefix="bloomgate_idx",
            exclude_epoch=excl).collect()))
        g = sorted(map(key, D.incremental_dedup_probe(
            spark, probe2, prefix="bloomgate_idx", exclude_epoch=excl,
            bloom_gate=True).collect()))
        assert g == u
    # the excluded-epoch run must not see doc 102's appended digest
    assert not any(d == 300 for d, *_ in sorted(map(key, D.incremental_dedup_probe(
        spark, probe2, prefix="bloomgate_idx", exclude_epoch=5,
        bloom_gate=True).collect())))


def test_embedding_lsh_recall_sampled_mode(spark):
    """The hash-sampled mode restricts all three sides to the SAME
    deterministic sub-corpus, so the counts stay a subset chain and the
    metric is runnable when the O(n^2) exact side won't brute-force."""
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    full = D.embedding_lsh_recall(emb, threshold=0.25).collect()[0]
    s1 = D.embedding_lsh_recall(emb, threshold=0.25, sample_fraction=0.5).collect()[0]
    s2 = D.embedding_lsh_recall(emb, threshold=0.25, sample_fraction=0.5).collect()[0]
    assert tuple(s1) == tuple(s2)            # deterministic sample
    assert s1.n_exact < full.n_exact         # genuinely smaller exact side
    assert s1.n_single <= s1.n_multi <= s1.n_exact


def test_property_star_pairs_subset_of_uncapped(spark):
    """Structural invariants of the star contract on random corpora:
    every capped-star pair is also an uncapped pair (a star pair shares
    the over-cap bucket, so it IS an uncapped candidate, and both verify
    with the same exact Jaccard), and all-pairs of under-cap buckets
    survive unchanged."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "pi"]

    @st.composite
    def corpora(draw):
        n = draw(st.integers(min_value=4, max_value=14))
        return [
            (i, " ".join(draw(st.lists(st.sampled_from(words), min_size=3,
                                       max_size=8))))
            for i in range(n)
        ]

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(corpora(), st.integers(min_value=2, max_value=4))
    def check(corpus, cap):
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        key = lambda r: (r.doc_a, r.doc_b, round(r.jaccard, 12))
        uncapped = {key(r) for r in D.minhash_lsh_pairs(
            docs, threshold=0.2, max_bucket=None).collect()}
        starred = {key(r) for r in D.minhash_lsh_pairs(
            docs, threshold=0.2, max_bucket=cap).collect()}
        assert starred <= uncapped
        # idempotence: star mode is deterministic
        starred2 = {key(r) for r in D.minhash_lsh_pairs(
            docs, threshold=0.2, max_bucket=cap).collect()}
        assert starred2 == starred

    check()


def test_append_dedup_index_continuous_loop(spark):
    """The continuous-curation write half: accepted docs append to the
    stored indexes, so a LATER batch's duplicates of epoch-1 arrivals
    are flagged — and the probe result equals an index built from the
    full accepted corpus in one shot."""
    corpus = _docs(spark)
    D.build_dedup_index(corpus, prefix="loop_idx")
    epoch1 = spark.createDataFrame(
        [(100, "a brand new document about rivers and mountain lakes today")],
        "doc_id long, text string",
    )
    # epoch 1: no duplicates -> accepted and appended
    assert D.incremental_dedup_probe(spark, epoch1, prefix="loop_idx").count() == 0
    D.append_dedup_index(epoch1, prefix="loop_idx")
    epoch2 = spark.createDataFrame(
        [(200, "a brand new document about rivers and mountain lakes today"),
         (201, "wholly original content with no relatives anywhere at all")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.dup_of, r.kind)
        for r in D.incremental_dedup_probe(spark, epoch2, prefix="loop_idx").collect()
    }
    assert (200, 100, "exact") in got       # flagged against the APPENDED doc
    assert not any(d == 201 for d, _, _ in got)
    # one-shot rebuild over corpus+epoch1 gives the same epoch-2 verdicts
    D.build_dedup_index(corpus.unionByName(epoch1), prefix="loop_idx_full")
    want = {
        (r.doc_id, r.dup_of, r.kind)
        for r in D.incremental_dedup_probe(
            spark, epoch2, prefix="loop_idx_full"
        ).collect()
    }
    assert got == want


def test_append_dedup_index_replay_safe(spark):
    """Crash-replay contract (r4 verdict #1): re-running an epoch's
    index append is a no-op once its rows landed, and a crash BETWEEN
    the digest and band appends replays to exactly the missing half —
    index row counts and probe results end identical to a single clean
    append."""
    corpus = _docs(spark)
    D.build_dedup_index(corpus, prefix="replay_idx")
    epoch3 = spark.createDataFrame(
        [(300, "replay-safe arrival about glaciers and winter storms")],
        "doc_id long, text string",
    )
    D.append_dedup_index(epoch3, prefix="replay_idx", epoch_id=3)
    dig_n = spark.table("replay_idx_digest").count()
    band_n = spark.table("replay_idx_bands").count()
    probe_batch = spark.createDataFrame(
        [(900, "replay-safe arrival about glaciers and winter storms")],
        "doc_id long, text string",
    )
    key = lambda r: (r.doc_id, r.dup_of, r.kind, round(r.jaccard, 9))
    want = sorted(
        key(r)
        for r in D.incremental_dedup_probe(
            spark, probe_batch, prefix="replay_idx"
        ).collect()
    )
    assert any(d == 900 and o == 300 for d, o, _, _ in want)
    # full replay of the committed epoch: both appends skipped
    D.append_dedup_index(epoch3, prefix="replay_idx", epoch_id=3)
    assert spark.table("replay_idx_digest").count() == dig_n
    assert spark.table("replay_idx_bands").count() == band_n
    # crash between the two writes: digest commits, bands raises
    epoch4 = spark.createDataFrame(
        [(400, "a second replay arrival about canyons and desert winds")],
        "doc_id long, text string",
    )
    real_banded = D._banded_shingles
    import pytest

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before the band append")

    D._banded_shingles = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            D.append_dedup_index(epoch4, prefix="replay_idx", epoch_id=4)
    finally:
        D._banded_shingles = real_banded
    assert spark.table("replay_idx_digest").count() == dig_n + 1  # committed
    assert spark.table("replay_idx_bands").count() == band_n      # not yet
    # replay after the crash: digest skipped, bands completed — end
    # state equals one clean append
    D.append_dedup_index(epoch4, prefix="replay_idx", epoch_id=4)
    assert spark.table("replay_idx_digest").count() == dig_n + 1
    band_after = spark.table("replay_idx_bands").count()
    assert band_after > band_n
    # and a third replay is a full no-op, with probe results stable
    D.append_dedup_index(epoch4, prefix="replay_idx", epoch_id=4)
    assert spark.table("replay_idx_digest").count() == dig_n + 1
    assert spark.table("replay_idx_bands").count() == band_after
    again = sorted(
        key(r)
        for r in D.incremental_dedup_probe(
            spark, probe_batch, prefix="replay_idx"
        ).collect()
    )
    assert again == want


def test_intra_batch_dedup_flags_same_batch_duplicates(spark):
    """intra_batch_dedup: duplicates arriving in the SAME batch are
    flagged against the smallest-id member (keep-min), novel docs are
    untouched, and the min member itself is never flagged."""
    batch = spark.createDataFrame(
        [
            (10, "identical payload about tides and harbors tonight"),
            (11, "identical payload about tides and harbors tonight"),
            (12, "identical payload about tides and harbors tonight"),
            (13, "wholly unrelated content regarding alpine railways"),
        ],
        "doc_id long, text string",
    )
    rel = D.intra_batch_dedup(batch)
    got = {(r.doc_id, r.dup_of, r.kind) for r in rel.collect()}
    flagged = {d for d, _, _ in got}
    assert (11, 10, "exact") in got and (12, 10, "exact") in got
    assert 10 not in flagged and 13 not in flagged


def test_intra_batch_dedup_mass_dup_epoch_linear(spark):
    """A mass-duplicate flood — THE adversarial input of an ingest gate
    — costs exactly g-1 relations for g copies: the exact layer is a
    digest groupBy joined back (no self-join), and identical texts
    collapse to ONE banding representative so the near layer never sees
    the mass at all. 10x the flood = 10x the rows (the r5 self-join
    design emitted O(g^2) rows here; r5 verdict item #1)."""
    counts = {}
    for g in (200, 2000):
        batch = _mass_dup_docs(spark, g, [(g + 1, CORPUS[4])])
        rel = D.intra_batch_dedup(batch).collect()
        counts[g] = len(rel)
        assert all(r.kind == "exact" and r.dup_of == 0 for r in rel)
        assert {r.doc_id for r in rel} == set(range(1, g))
    assert counts[2000] == 10 * counts[200] + 9  # linear: g-1 each


def test_intra_batch_dedup_flagged_set_matches_all_pairs(spark):
    """The r6 bounding drops only REDUNDANT relations: the flagged set
    (docs with >=1 relation — all any caller consumes) equals the r5
    all-pairs semantics (incremental_dedup(batch, batch), keep-min) on
    a mixed batch of exact groups, near dups and novel docs; every
    relation still points at a strictly smaller doc_id."""
    rows = [(k, v) for k, v in CORPUS.items()] + [
        (6, CORPUS[1]),  # third member of the exact group {1, 2}
        (7, "the quick brown fox jumps over the lazy cat tomorrow"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    new = D.intra_batch_dedup(batch, threshold=0.3, max_bucket=None)
    old = D.incremental_dedup(batch, batch, threshold=0.3).filter(
        "dup_of < doc_id"
    )
    assert {r.doc_id for r in new.collect()} == {
        r.doc_id for r in old.collect()
    }
    assert new.filter("dup_of >= doc_id").count() == 0


def test_intra_batch_dedup_star_cap_subset_and_exact_unchanged(spark):
    """The near-layer star cap never invents relations (capped near
    pairs are a subset of the uncapped ones) and never touches the
    exact layer; with max_bucket=1 every multi-member rep bucket runs
    in pure star mode, so this pins the degradation path itself."""
    rows = [(k, v) for k, v in CORPUS.items()] + [
        (6, "the quick brown fox jumps over the lazy cat tonight"),
        (7, "the quick brown fox jumps over the lazy cat sometimes"),
        (8, "the quick brown fox jumps over the lazy dog quietly"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    def rels(max_bucket):
        out = D.intra_batch_dedup(
            batch, threshold=0.3, max_bucket=max_bucket
        ).collect()
        return (
            {(r.doc_id, r.dup_of) for r in out if r.kind == "exact"},
            {(r.doc_id, r.dup_of) for r in out if r.kind == "near"},
        )
    exact_un, near_un = rels(None)
    exact_cap, near_cap = rels(1)
    assert exact_cap == exact_un == {(2, 1)}
    assert near_cap <= near_un
    assert len(near_un) > 0  # the fixture's near dups actually fire


def test_compact_dedup_index_restores_star_cap(spark):
    """r4 verdict #2: a bucket grown hot purely via APPENDS carries
    bucket_n=1 per appended row, so the probe's star cap cannot see it
    (every incoming doc joins the whole bucket). compact_dedup_index
    recomputes bucket_n/is_rep over the full population: the hot bucket
    star-degrades again, the capped probe equals a fresh rebuild over
    the union corpus, membership (uncapped probe) is unchanged, and
    epoch stamps survive for the crash-replay skip."""
    n = 200
    corpus = spark.createDataFrame(
        [(n + 1, CORPUS[4])], "doc_id long, text string"
    )
    D.build_dedup_index(corpus, prefix="cmp_idx")
    hot = spark.createDataFrame(
        [(i, "hot near duplicated corpus body text repeated verbatim")
         for i in range(n)],
        "doc_id long, text string",
    )
    D.append_dedup_index(hot, prefix="cmp_idx", epoch_id=1)
    incoming = spark.createDataFrame(
        [(9000, "hot near duplicated corpus body text repeated verbatim today")],
        "doc_id long, text string",
    )
    key = lambda r: (r.doc_id, r.dup_of, r.kind)
    # pre-compaction: the cap is blind (appended rows say bucket_n=1)
    pre = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="cmp_idx", threshold=0.5, max_bucket=10
    ).collect()}
    assert pre == {(9000, i, "near") for i in range(n)}
    full_pre = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="cmp_idx", threshold=0.5, max_bucket=None
    ).collect()}
    D.compact_dedup_index(spark, prefix="cmp_idx")
    # post-compaction: the hot bucket exposes only its representative
    post = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="cmp_idx", threshold=0.5, max_bucket=10
    ).collect()}
    assert post == {(9000, 0, "near")}
    # capped probe equals a fresh one-shot rebuild over the union corpus
    D.build_dedup_index(corpus.unionByName(hot), prefix="cmp_idx_fresh")
    fresh = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="cmp_idx_fresh", threshold=0.5, max_bucket=10
    ).collect()}
    assert post == fresh
    # membership unchanged: uncapped probe identical across compaction
    full_post = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="cmp_idx", threshold=0.5, max_bucket=None
    ).collect()}
    assert full_post == full_pre
    # epoch stamps preserved -> replay skip still works post-compaction
    epochs = {r.epoch for r in spark.table("cmp_idx_digest")
              .select("epoch").distinct().collect()}
    assert epochs == {-1, 1}
    assert D._epoch_already_appended(spark, "cmp_idx_bands", 1)


def test_dedup_index_stats_surfaces_stale_caps(spark):
    """dedup_index_stats is the compaction dial: after appends grow a
    bucket past the cap, stale_cap_rows flags the rows whose stored
    bucket_n understates the live population; compaction zeroes it
    (the stored statistic catches up and the probe's star filter sees
    the bucket again)."""
    corpus = spark.createDataFrame(
        [(1000, CORPUS[4])], "doc_id long, text string"
    )
    D.build_dedup_index(corpus, prefix="stats_idx")
    hot = spark.createDataFrame(
        [(i, "statistics probe corpus body text repeated verbatim")
         for i in range(40)],
        "doc_id long, text string",
    )
    D.append_dedup_index(hot, prefix="stats_idx", epoch_id=1)
    pre = D.dedup_index_stats(spark, prefix="stats_idx", cap=10).collect()[0]
    assert pre.max_bucket_n_stored == 1          # appends never refresh it
    assert pre.max_bucket_n_actual >= 40         # the live population
    assert pre.over_cap_buckets > 0
    assert pre.stale_cap_rows > 0                # the alert condition
    assert pre.n_epochs == 2                     # base (-1) + epoch 1
    D.compact_dedup_index(spark, prefix="stats_idx")
    post = D.dedup_index_stats(spark, prefix="stats_idx", cap=10).collect()[0]
    assert post.stale_cap_rows == 0
    assert post.max_bucket_n_stored == post.max_bucket_n_actual
    assert post.over_cap_buckets == pre.over_cap_buckets
    assert post.n_epochs == 2                    # epoch stamps preserved


def test_append_dedup_index_snapshots_probe_derived_input(spark):
    """Regression (r5 scale probe): an UNPERSISTED input whose lineage
    reads the index tables (the canonical accepted = batch ANTI-JOIN
    probe shape) must append consistently to BOTH tables. Without the
    operator's internal snapshot, the digest append changes the probe's
    input, the band write re-evaluates the anti-join to empty, and the
    band table silently never grows."""
    base = spark.createDataFrame(
        [(i, f"seed document number {i} about harbor logistics") for i in range(20)],
        "doc_id long, text string",
    )
    D.build_dedup_index(base, prefix="snap_idx")
    batch = spark.createDataFrame(
        [(100 + i, f"novel arrival {i} regarding alpine meteorology data")
         for i in range(10)],
        "doc_id long, text string",
    )
    dups = D.incremental_dedup_probe(spark, batch, prefix="snap_idx")
    accepted = batch.join(
        dups.select("doc_id").distinct(), "doc_id", "left_anti"
    )  # NOT persisted — lineage reads snap_idx_digest / snap_idx_bands
    dig0 = spark.table("snap_idx_digest").count()
    band0 = spark.table("snap_idx_bands").count()
    D.append_dedup_index(accepted, prefix="snap_idx", epoch_id=0)
    assert spark.table("snap_idx_digest").count() == dig0 + 10
    assert spark.table("snap_idx_bands").count() == band0 + 40  # 4 bands/doc


def test_compact_dedup_index_crash_heals_by_rerun(spark, monkeypatch):
    """Interrupt compaction BETWEEN the digest overwrite and the bands
    overwrite: the tables sit at different statistics generations
    (digest refreshed, bands stale — probes still correct row-wise),
    and simply RE-RUNNING compaction converges both; the healed capped
    probe equals a fresh rebuild over the union corpus."""
    import pytest

    n = 60
    corpus = spark.createDataFrame(
        [(n + 1, CORPUS[4])], "doc_id long, text string"
    )
    D.build_dedup_index(corpus, prefix="heal_idx")
    hot = spark.createDataFrame(
        [(i, "hot near duplicated corpus body text repeated verbatim")
         for i in range(n)],
        "doc_id long, text string",
    )
    D.append_dedup_index(hot, prefix="heal_idx", epoch_id=1)

    def boom():
        raise RuntimeError("injected crash between compaction overwrites")

    monkeypatch.setattr(D, "_between_compaction_overwrites_hook", boom)
    with pytest.raises(RuntimeError, match="between compaction"):
        D.compact_dedup_index(spark, prefix="heal_idx")
    # intermediate state: digest refreshed, bands still append-stale
    assert spark.table("heal_idx_bands").filter("bucket_n = 1").count() > 0
    # ...and still row-correct for probes (statistics only gate the cap)
    incoming = spark.createDataFrame(
        [(9000, "hot near duplicated corpus body text repeated verbatim today")],
        "doc_id long, text string",
    )
    key = lambda r: (r.doc_id, r.dup_of, r.kind)
    mid = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="heal_idx", threshold=0.5, max_bucket=None
    ).collect()}
    assert mid == {(9000, i, "near") for i in range(n)}

    monkeypatch.setattr(D, "_between_compaction_overwrites_hook", None)
    D.compact_dedup_index(spark, prefix="heal_idx")
    post = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="heal_idx", threshold=0.5, max_bucket=10
    ).collect()}
    D.build_dedup_index(corpus.unionByName(hot), prefix="heal_idx_fresh")
    fresh = {key(r) for r in D.incremental_dedup_probe(
        spark, incoming, prefix="heal_idx_fresh", threshold=0.5, max_bucket=10
    ).collect()}
    assert post == fresh == {(9000, 0, "near")}
    # epoch stamps survived both the crash and the healing rerun
    assert D._epoch_already_appended(spark, "heal_idx_bands", 1)
    assert D._epoch_already_appended(spark, "heal_idx_digest", 1)


def test_ngram_containment_catches_embedded_doc(spark):
    """A short doc verbatim-embedded in a long one scores containment
    1.0 while its Jaccard stays below any useful threshold — the case
    this metric exists for."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = (
        short
        + " unrelated filler words continue for quite a while now "
        + "more and more filler tokens keep arriving here endlessly "
        + "until the embedded fragment is a small fraction of the whole"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different content everywhere")],
        "doc_id long, text string",
    )
    cont = ngram_containment_pairs(docs, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in cont] == [(1, 2, 1.0)]
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == []  # Jaccard misses the embedding entirely


def test_corpus_snapshot_diff_statuses(spark):
    """All four statuses on a hand-built pair of snapshots; the
    include_unchanged=False mode drops exactly the unchanged mass."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        corpus_snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed"), (4, "brand new")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in corpus_snapshot_diff(old, new).collect()}
    assert rows[1].status == "unchanged"
    assert rows[2].status == "changed"
    assert rows[3].status == "removed" and rows[3].new_digest is None
    assert rows[4].status == "added" and rows[4].old_digest is None
    assert rows[2].old_digest != rows[2].new_digest
    filtered = corpus_snapshot_diff(old, new, include_unchanged=False)
    assert {r.doc_id for r in filtered.collect()} == {2, 3, 4}


def test_incremental_refresh_equals_full_and_touches_only_churn(spark):
    """The churn-only refresh is row-identical to a full recompute of
    the derived table on the new corpus, and derive() is fed EXACTLY
    the added+changed documents — never the unchanged mass."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        incremental_refresh,
    )
    from similarity_search_with_hadoop_mapreduce_spark.operators.textstats import (
        token_counts,
    )

    old = spark.createDataFrame(
        [(1, "stays the same"), (2, "will be rewritten"), (3, "is removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "stays the same"), (2, "rewritten now"), (4, "fresh arrival")],
        "doc_id long, text string",
    )
    seen: list[set] = []

    def derive(df):
        seen.append({r.doc_id for r in df.select("doc_id").collect()})
        return token_counts(df)

    got = incremental_refresh(old, new, token_counts(old), derive)
    want = token_counts(new)
    key = lambda r: r.doc_id
    assert sorted(map(tuple, got.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, want.collect()), key=lambda t: t[0]
    )
    assert seen == [{2, 4}]  # changed + added only; 1 reused, 3 evicted


def test_incremental_refresh_custom_id_column(spark):
    """A non-default id column keeps its name end to end: derive() sees
    the caller's key, the derived-union schema lines up, and the stale
    eviction matches on the right rows."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        incremental_refresh,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "old text")], "item_id long, body string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "new text"), (3, "added")],
        "item_id long, body string",
    )

    def derive(df):
        assert "item_id" in df.columns  # key name preserved for derive
        return df.select("item_id", F.length("body").alias("n_chars"))

    got = {
        r.item_id: r.n_chars
        for r in incremental_refresh(
            old, new, derive(old), derive, text_col="body", id_col="item_id"
        ).collect()
    }
    assert got == {1: 4, 2: 8, 3: 5}


def test_embedding_lsh_star_cap_bounds_and_preserves_clusters(spark):
    """max_bucket on the embedding LSH pair generators (r8): a mass-dup
    bucket of g identical vectors emits the g-1 rep-anchored star
    instead of g(g-1)/2 pairs; connectivity equals the uncapped
    clusters; cap=None unchanged; the multiband variant caps per band."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        embedding_dup_pairs_lsh,
        embedding_dup_pairs_lsh_multiband,
    )

    g, dim = 10, 8
    rows = [(i, [float(j + 1) for j in range(dim)]) for i in range(g)]
    rows += [(100, [1.0] + [0.0] * (dim - 1)), (101, [1.0] + [0.0] * (dim - 1))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for fn, kw in [
        (embedding_dup_pairs_lsh, dict(n_planes=3, dim=dim)),
        (embedding_dup_pairs_lsh_multiband,
         dict(bands=2, rows_per_band=2, dim=dim)),
    ]:
        full = {(r.vec_a, r.vec_b) for r in fn(df, threshold=0.9, **kw).collect()}
        capped = {
            (r.vec_a, r.vec_b)
            for r in fn(df, threshold=0.9, max_bucket=4, **kw).collect()
        }
        assert capped <= full
        big_full = {p for p in full if p[0] < g}
        big_cap = {p for p in capped if p[0] < g}
        assert len(big_full) == g * (g - 1) // 2
        assert big_cap == {(0, i) for i in range(1, g)}
        if (100, 101) in full:  # small bucket survives untouched
            assert (100, 101) in capped
        # None = identical
        none_cap = {
            (r.vec_a, r.vec_b)
            for r in fn(df, threshold=0.9, max_bucket=None, **kw).collect()
        }
        assert none_cap == full
    import pytest

    with pytest.raises(ValueError, match="max_bucket"):
        embedding_dup_pairs_lsh(df, max_bucket=1).collect()


def test_embedding_lsh_star_cap_census_and_default(spark):
    """r9: (a) the embedding pair families default to max_bucket=1000
    (the scale-safe plan is the library default; None is the explicit
    opt-out), and (b) the star cap's overflow census rides the main
    action via stats — same contract as the text families'
    overflow_census."""
    import inspect

    from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import (
        embedding_dup_pairs_lsh,
        embedding_dup_pairs_lsh_multiband,
    )

    for fn in (embedding_dup_pairs_lsh, embedding_dup_pairs_lsh_multiband):
        assert inspect.signature(fn).parameters["max_bucket"].default == 1000

    g, dim = 10, 8
    rows = [(i, [float(j + 1) for j in range(dim)]) for i in range(g)]
    rows += [(100, [1.0] + [0.0] * (dim - 1)), (101, [1.0] + [0.0] * (dim - 1))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = {}
    capped = embedding_dup_pairs_lsh(
        df, threshold=0.9, n_planes=3, dim=dim, max_bucket=4, stats=stats
    )
    got = {(r.vec_a, r.vec_b) for r in capped.collect()}
    assert got >= {(0, i) for i in range(1, g)}
    census = D.overflow_census(stats)
    # the g identical vectors share one hyperplane bucket -> 1 over-cap
    # bucket holding all g rows (the 2-vector bucket is under cap)
    assert census["overflow_buckets"] == 1
    assert census["overflow_docs"] == g
    # multiband: the clone bucket overflows once PER band
    stats_mb = {}
    capped_mb = embedding_dup_pairs_lsh_multiband(
        df, threshold=0.9, bands=2, rows_per_band=2, dim=dim,
        max_bucket=4, stats=stats_mb,
    )
    capped_mb.collect()
    census_mb = D.overflow_census(stats_mb)
    assert census_mb["overflow_buckets"] == 2
    assert census_mb["overflow_docs"] == 2 * g
