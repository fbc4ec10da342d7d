"""Unit tests for curation operators: as-of join, deterministic sampling,
duplicate clustering. Oracle parity is covered by the registry entries;
these pin the edge-case semantics on hand-built frames."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators.dedup import duplicate_clusters
from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
    stratified_sample,
    train_val_test_split,
)
from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import asof_join


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_basic_tie_and_miss(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(10)), (3, "u", _ts(2)), (4, "v", _ts(9))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(3), 30.0), ("u", _ts(10), 100.0), ("v", _ts(11), 7.0)],
        "k string, ts timestamp, val double",
    )
    out = {
        r["id"]: r["val"]
        for r in asof_join(left, right, on="ts", by=["k"], values=["val"]).collect()
    }
    assert out[1] == 30.0  # most recent at-or-before 5 is ts=3
    assert out[2] == 100.0  # exact tie counts (<=)
    assert out[3] is None  # nothing at-or-before 2 -> left-outer NULL
    assert out[4] is None  # v's only right row is later


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(12))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(3), 30.0), ("u", _ts(10), 100.0)],
        "k string, ts timestamp, val double",
    )
    out = {
        r["id"]: r["val"]
        for r in asof_join(
            left, right, on="ts", by=["k"], values=["val"], direction="forward"
        ).collect()
    }
    assert out[1] == 100.0  # earliest at-or-after 5
    assert out[2] is None


def test_split_deterministic_under_repartition(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in train_val_test_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(df.repartition(7)).collect()
    }
    assert a == b
    counts = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val", "test")}
    # 80/10/10 within loose tolerance on 500 ids
    assert 350 < counts["train"] < 450 and counts["val"] > 20 and counts["test"] > 20


def test_stratified_sample_superset_across_rates(spark):
    df = (
        spark.range(0, 400)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de"))
    )
    lo = {
        r["doc_id"]
        for r in stratified_sample(df, rates={"en": 0.2}, default_rate=0.1).collect()
    }
    hi = {
        r["doc_id"]
        for r in stratified_sample(df, rates={"en": 0.6}, default_rate=0.3).collect()
    }
    assert lo <= hi  # raising rates only adds documents
    assert len(lo) < len(hi)


def test_duplicate_clusters_transitive_closure(spark):
    docs = spark.createDataFrame([(i, "t") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(docs, pairs=pairs).collect()
    }
    # chain 0-1-2 collapses transitively; 3-4 pairs; 5 is a singleton
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_ohlc_tie_determinism(spark):
    """Same-timestamp ties: open/close pick the row with the smaller /
    larger event_id — the struct-ordered min_by/max_by contract."""
    import datetime as dt

    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        ohlc_downsample,
    )

    t = dt.datetime(2024, 1, 1, 10, 30)
    rows = [
        (1, t, "a", 5.0),
        (2, t, "a", 9.0),   # same ts as event 1: close must be id-ordered
        (3, t.replace(minute=40), "a", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    bar = ohlc_downsample(df).collect()[0]
    assert (bar.open, bar.high, bar.low, bar.close, bar.n_events) == (
        5.0, 9.0, 5.0, 7.0, 3
    )
    two = ohlc_downsample(df.filter(F.col("event_id") <= 2)).collect()[0]
    assert (two.open, two.close) == (5.0, 9.0)  # id breaks the tie


def test_weighted_sample_deterministic_and_monotone(spark):
    """weighted_sample keeps each row iff bucket(id) < w*buckets: the
    decision is deterministic, weight-monotone per row (kept at w stays
    kept at any w' >= w), and hits the extremes exactly (0 -> nothing,
    1 -> everything)."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    for w, lo, hi in ((0.0, 0, 0), (1.0, 500, 500), (0.3, 100, 200)):
        got = weighted_sample(
            df.withColumn("w", F.lit(w)), "w"
        ).count()
        assert lo <= got <= hi, (w, got)
    kept_03 = {r.doc_id for r in weighted_sample(
        df.withColumn("w", F.lit(0.3)), "w").collect()}
    kept_06 = {r.doc_id for r in weighted_sample(
        df.withColumn("w", F.lit(0.6)), "w").collect()}
    assert kept_03 <= kept_06  # monotone in the weight
    again = {r.doc_id for r in weighted_sample(
        df.withColumn("w", F.lit(0.3)), "w").collect()}
    assert again == kept_03   # deterministic


def test_weighted_sample_rejects_invalid_weights(spark):
    """Out-of-domain weights fail loudly at execution instead of the old
    silent degeneracies (NaN/negative compared false -> keep-none;
    w > 1 saturated to keep-all; NULL dropped the row) — the same
    fail-loudly contract as the ANN recall fraction guard."""
    import pytest
    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    for bad in (
        F.lit(-0.1),
        F.lit(1.5),
        F.lit(float("nan")),
        F.lit(None).cast("double"),
    ):
        with pytest.raises(Exception) as ei:
            weighted_sample(df.withColumn("w", bad), "w").count()
        assert "weight must be finite in [0, 1]" in str(ei.value)
    # boundary values stay valid: 0 keeps nothing, 1 keeps everything
    assert weighted_sample(df.withColumn("w", F.lit(0.0)), "w").count() == 0
    assert weighted_sample(df.withColumn("w", F.lit(1.0)), "w").count() == 10


def test_pack_sequences_layout_and_locality(spark):
    """Pack-then-chunk layout: per-shard running token sums chunked into
    max_tokens windows — exact bin/offset math on a hand corpus, and the
    incremental-repack locality contract: adding a document renumbers
    only LATER docs of its own shard, never other shards."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        hash_bucket,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(7))) for i in range(40)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, max_tokens=10, n_shards=4).collect()
    rows = {r.doc_id: r for r in out}
    assert len(rows) == 40 and all(r.n_tokens == 7 for r in out)
    # replay the contract per shard: running sum of 7-token docs in id
    # order, chunked at 10
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, members in by_shard.items():
        before = 0
        for r in members:
            assert (r.bin_id, r.bin_offset) == (before // 10, before % 10)
            before += r.n_tokens
    # locality: dropping one shard's docs leaves every other shard's
    # assignment bit-identical
    sh0 = [r.shard for r in out if r.doc_id == 0][0]
    pruned = docs.join(
        docs.select("doc_id").where(
            hash_bucket(F.col("doc_id")) % 4 == sh0
        ),
        "doc_id",
        "left_anti",
    )
    out2 = pack_sequences(pruned, max_tokens=10, n_shards=4).collect()
    want = {
        d: (r.shard, r.bin_id, r.bin_offset)
        for d, r in rows.items()
        if r.shard != sh0
    }
    got = {r.doc_id: (r.shard, r.bin_id, r.bin_offset) for r in out2}
    assert got == want


def test_mixture_sample_proportions_and_determinism(spark):
    """mixture_sample hits the target recipe downsample-only: the
    limiting stratum keeps every row, other strata thin to
    floor(rate*buckets) md5 buckets, unlisted strata drop, and the
    result is invariant under repartitioning."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 6, "en")
        .when(F.col("id") % 10 < 8, "fr")
        .when(F.col("id") % 10 < 9, "de")
        .otherwise("xx")
        .alias("lang"),
    )
    # n: en=600 fr=200 de=100 xx=100; targets 1:1:2 over en/fr/de
    # scale S = min(600/1, 200/1, 100/2) = 50 -> de keeps all 100,
    # en rate 50/600, fr rate 50/200.
    targets = {"en": 1.0, "fr": 1.0, "de": 2.0}
    out = mixture_sample(df, targets, strata_col="lang", id_col="doc_id")
    rows = {(r.doc_id, r.lang) for r in out.collect()}
    by_lang = {}
    for _, lang in rows:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    assert "xx" not in by_lang  # unlisted stratum dropped
    assert by_lang["de"] == 100  # limiting stratum keeps all
    # hash thinning approximates the 50-row target per unit weight
    assert 35 <= by_lang["en"] <= 65
    assert 35 <= by_lang["fr"] <= 65
    again = {
        (r.doc_id, r.lang)
        for r in mixture_sample(
            df.repartition(13, "doc_id"), targets, strata_col="lang"
        ).collect()
    }
    assert again == rows


def test_mixture_sample_broadcasts_rates_and_validates(spark):
    """The rate table comes back as a broadcast join (no SortMergeJoin
    of the corpus), and non-finite / non-positive targets fail loudly."""
    import pytest as _pytest

    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    plan = (
        mixture_sample(df, {"en": 1.0, "fr": 1.0})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for bad in ({"en": 0.0}, {"en": float("nan")}, {"en": float("inf")}, {}):
        with _pytest.raises(ValueError):
            mixture_sample(df, bad)


def test_mixture_sample_token_mass_mode(spark):
    """weight_col switches the census to integer mass: equal doc counts
    but unequal token masses flip which stratum limits the recipe, and
    NULL / negative weights fail loudly."""
    import pytest as _pytest

    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        mixture_sample,
    )

    # 100 docs per stratum; en docs carry 10 tokens, fr docs 1.
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
        F.when(F.col("id") % 2 == 0, 10).otherwise(1).alias("n_tokens"),
    )
    targets = {"en": 1.0, "fr": 1.0}
    by_count = mixture_sample(df, targets, strata_col="lang")
    by_mass = mixture_sample(df, targets, strata_col="lang", weight_col="n_tokens")

    def census(out):
        c = {}
        for r in out.collect():
            c[r.lang] = c.get(r.lang, 0) + 1
        return c
    cc = census(by_count)
    cm = census(by_mass)
    # doc-count mode: equal counts -> both strata keep everything
    assert cc == {"en": 100, "fr": 100}
    # token-mass mode: fr (mass 100) limits; en (mass 1000) thins to
    # threshold floor(100/1000 * 10000) = 1000 buckets (~10 docs)
    assert cm["fr"] == 100
    assert 3 <= cm["en"] <= 25
    bad = df.withColumn(
        "n_tokens", F.when(F.col("doc_id") == 7, -1).otherwise(F.col("n_tokens"))
    )
    with _pytest.raises(Exception, match="non-negative"):
        mixture_sample(bad, targets, strata_col="lang", weight_col="n_tokens").collect()


def test_cluster_safe_split_no_leakage(spark):
    """Every member of a duplicate cluster gets the SAME split — including
    a planted cluster whose members' raw doc-id hashes would straddle
    splits (the leakage the naive per-doc split commits); singleton docs
    follow their own id exactly like train_val_test_split."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        cluster_safe_split,
        train_val_test_split,
    )

    # synthetic cluster map: docs 0..199; docs 0..49 form one big cluster
    # (cluster_id 0), the rest are singletons
    rows = [(i, 0 if i < 50 else i) for i in range(200)]
    clusters = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = cluster_safe_split(clusters).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(v) == 1 for v in by_cluster.values()), by_cluster
    # the naive split WOULD have leaked the big cluster across splits
    naive = train_val_test_split(
        clusters.filter("cluster_id = 0"), id_col="doc_id"
    ).collect()
    assert len({r.split for r in naive}) > 1
    # singletons: cluster hash == id hash -> identical to the naive split
    singles = {r.doc_id: r.split for r in out if r.cluster_id >= 50}
    naive_all = {
        r.doc_id: r.split
        for r in train_val_test_split(clusters, id_col="doc_id").collect()
    }
    assert all(naive_all[d] == s for d, s in singles.items())
