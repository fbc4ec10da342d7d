#!/usr/bin/env python
"""DuckDB side of the headline benchmark: runs the same oracle SQL the
driver uses for correctness, on the same parquet, min-of-3, and prints one
JSON line — the comparison target for bench.py (BASELINE.md perf gate:
Spark suite wall ≤ 2× this).

Queries with no oracle (rows-only ops) are skipped; bench.py's HEADLINE
list contains none of those.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE, SF_DIR, CPUS

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def run_suite(
    sf_dir: str = SF_DIR,
    cpus: int | str = CPUS,
    names: list[str] | None = None,
    iterations: int = 3,
) -> dict[str, float]:
    """Per-query min-of-``iterations`` DuckDB walls for ``names``
    (default: bench.py's HEADLINE). Also importable by bench.py
    (``--with-duckdb``, r11) so the per-round BENCH artifact carries the
    gate's denominator from the SAME window as the Spark numbers."""
    from similarity_search_with_hadoop_mapreduce_spark.registry import ORACLES
    from similarity_search_with_hadoop_mapreduce_spark.registry.ann import (
        ivf_assigned_materialize_sql,
        ivf_cents_materialize_sql,
        ivf_topk_oracle_prebuilt,
    )

    con = duckdb.connect()
    con.execute(f"SET threads TO {int(cpus)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # Untimed, like the Spark side's build-time index: materialize the
    # Lloyd-trained centroids AND the full inverted-list assignment once
    # so the timed ann_ivf_topk run is probe+score only on BOTH engines
    # (ADVICE r2 symmetry fix — previously DuckDB re-ran the training CTE
    # inside every timed iteration while Spark served a cached book; the
    # Spark side now likewise serves a persisted prebuilt assignment).
    con.execute("CREATE TEMP TABLE cents_mat AS " + ivf_cents_materialize_sql())
    con.execute(
        "CREATE TEMP TABLE assigned_mat AS " + ivf_assigned_materialize_sql()
    )
    overrides = {
        "ann_ivf_topk": ivf_topk_oracle_prebuilt("assigned_mat", "cents_mat")
    }

    timings: dict[str, float] = {}
    for _ in range(iterations):
        for name in names if names is not None else HEADLINE:
            sql = overrides.get(name) or ORACLES.get(name)
            if sql is None:
                continue
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    con.close()
    return timings


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings = run_suite()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
