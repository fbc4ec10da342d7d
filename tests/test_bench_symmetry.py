"""The DuckDB bench's materialized-codebook ann_ivf_topk variant must be
result-identical to the registered oracle (it only moves the Lloyd
training out of the timed region), and the gated bench must not apply
hash-mode overrides (ADVICE r2: both engines time the same md5-mode
workload; xxhash64 production timings are reported separately)."""

from __future__ import annotations

import duckdb

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_ivf_materialized_oracle_matches_registered():
    from similarity_search_with_hadoop_mapreduce_spark.registry import ORACLES
    from similarity_search_with_hadoop_mapreduce_spark.registry.ann import (
        ivf_assigned_materialize_sql,
        ivf_cents_materialize_sql,
        ivf_topk_oracle_materialized,
        ivf_topk_oracle_prebuilt,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    inline = con.execute(ORACLES["ann_ivf_topk"]).fetchall()
    con.execute("CREATE TEMP TABLE cents_mat AS " + ivf_cents_materialize_sql())
    mat = con.execute(ivf_topk_oracle_materialized("cents_mat")).fetchall()
    con.execute(
        "CREATE TEMP TABLE assigned_mat AS " + ivf_assigned_materialize_sql()
    )
    pre = con.execute(
        ivf_topk_oracle_prebuilt("assigned_mat", "cents_mat")
    ).fetchall()
    assert inline == mat == pre
    assert len(mat) > 0


def test_gated_bench_runs_registry_entries_only():
    # The timed gated loop must source every HEADLINE query from the md5-mode
    # registry; production (xxhash64) impls live in a separate reported dict.
    import bench

    from similarity_search_with_hadoop_mapreduce_spark.registry import (
        ORACLES,
        QUERIES,
    )

    for name in bench.HEADLINE:
        assert name in QUERIES
        assert ORACLES.get(name) is not None, f"{name} has no oracle"
    prod = bench._production_impls()
    # r12 (BASELINE.md): BOTH q1 entries hold HEADLINE slots (the bench
    # contract adds, never removes); the production side series' q1 key
    # carries the fixed-point twin exactly as in r10/r11.
    assert set(prod) <= set(bench.HEADLINE) | {"q1_pricing_summary"}
    for name in prod:
        assert name in QUERIES and name in ORACLES, name
