"""Fixture-schema sentinels: the driver regenerates the testdata between
rounds and has changed physical types before (events.ts shipped as
TIMESTAMP(NANOS), later as TIMESTAMP(MICROS)). These assertions fail with
a readable message the moment a fixture no longer carries what the engine
depends on, instead of surfacing as an AnalysisException deep inside a
query plan."""

from __future__ import annotations

from similarity_search_with_hadoop_mapreduce_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

EXPECTED = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text"},
    "embeddings": {"vec_id", "embedding"},
}


def test_fixture_tables_carry_expected_columns(spark):
    for name, want in EXPECTED.items():
        cols = set(load_table(spark, SF, name).columns)
        missing = want - cols
        assert not missing, (
            f"fixture table {name!r} lost columns {sorted(missing)} "
            f"(has {sorted(cols)}) — driver testdata schema changed; "
            "audit every query touching it"
        )


def test_events_ts_normalizes_to_session_timestamp(spark):
    # regardless of the parquet vintage (nanos longs vs micros), the
    # loaded ts must be a session-tz timestamp usable in window exprs
    t = dict(load_table(spark, SF, "events").dtypes)["ts"]
    assert t == "timestamp", t


def test_embeddings_are_float_arrays(spark):
    t = dict(load_table(spark, SF, "embeddings").dtypes)["embedding"]
    assert t.startswith("array<"), t


def test_zipf_fixture_deterministic_and_skewed():
    """r12 (r11 verdict #4): the Zipf corpus generator is byte-
    deterministic (same seed -> identical rows) and actually produces
    the long-tail trigram df distribution the skew machinery needs —
    most trigrams once-only (rare prefixes), a hot head carrying real
    O(df²) join mass (the max_df target), and a near-dup pair
    population above the registry Jaccard threshold."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from collections import Counter

    from make_zipf_corpus import make_documents

    a = make_documents(400, seed=20260816)
    b = make_documents(400, seed=20260816)
    assert a.equals(b)  # byte-deterministic
    c = make_documents(400, seed=7)
    assert not a.equals(c)  # and the seed is actually used

    texts = a.column("text").to_pylist()
    df = Counter()
    for t in texts:
        w = t.split(" ")
        df.update({" ".join(w[i:i + 3]) for i in range(len(w) - 2)})
    counts = sorted(df.values(), reverse=True)
    once = sum(1 for v in counts if v == 1)
    assert once / len(counts) > 0.75  # long tail: most trigrams unique
    assert counts[0] >= 20  # hot head exists
    # near-dups: >= 2% of docs share >= 50% trigram Jaccard with another
    sets = []
    for t in texts:
        w = t.split(" ")
        sets.append({" ".join(w[i:i + 3]) for i in range(len(w) - 2)})
    dup_docs = 0
    for i in range(1, len(sets)):
        for j in range(i):
            inter = len(sets[i] & sets[j])
            if inter and inter / len(sets[i] | sets[j]) >= 0.5:
                dup_docs += 1
                break
    assert dup_docs >= 0.02 * len(sets), dup_docs
